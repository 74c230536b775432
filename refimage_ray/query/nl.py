"""Natural-language → DSL conversion through a pluggable provider layer.

Mirrors the reference's LLM module end to end
(``/root/reference/src/refimage/llm.py``): a provider ABC
(``BaseLLMProvider.generate``, ``llm.py:47-66``), a manager with a
provider registry and runtime switching (``LLMManager``,
``llm.py:310-395``), and the text→DSL prompt contract
(``TEXT_TO_DSL_SYSTEM_PROMPT`` + examples, ``llm.py:396-460``) whose
output grammar — ``TEXT()/AND()/OR()/EXCLUDE()/WEIGHT()`` — is parsed
by :class:`refimage_ray.query.dsl.DSLParser`'s function-style grammar.

No network exists in this environment, so the bundled providers are:

- :class:`RuleBasedProvider` — a DETERMINISTIC pattern-matching
  converter covering the reference's documented example shapes
  (importance markers → WEIGHT, "without/except" → EXCLUDE,
  "or" → OR, "and" → AND, else TEXT).  It is an honest stand-in,
  not an LLM; a real provider implements the same two methods.
- :class:`EchoProvider` — passes already-valid DSL through unchanged
  (useful as a fallback and in tests).

Every conversion is validated by round-tripping through
:class:`DSLParser` before it is returned — an unparseable provider
output raises, mirroring the reference's convert-then-validate
endpoint flow (``api.py:273-348``).
"""

from __future__ import annotations

import re
import time
from abc import ABC, abstractmethod
from dataclasses import dataclass, field

from refimage_ray.query.dsl import DSLParseError, DSLParser


@dataclass
class Message:
    role: str  # "system" | "user" | "assistant"
    content: str


@dataclass
class ProviderResponse:
    content: str
    provider: str
    model: str
    processing_time_ms: int = 0
    tokens_used: int | None = None


class ProviderError(RuntimeError):
    pass


class BaseProvider(ABC):
    """Provider ABC — the ``BaseLLMProvider`` analog (``llm.py:47-66``).

    ``generate`` is synchronous here (the engine is a batch library,
    not an async HTTP service); the contract is otherwise identical:
    messages in, a :class:`ProviderResponse` out."""

    name: str = "base"

    def __init__(self, config: dict | None = None) -> None:
        self.config = config or {}

    @abstractmethod
    def generate(self, messages: list[Message], **kwargs) -> ProviderResponse: ...

    @abstractmethod
    def get_model_name(self) -> str: ...


PROVIDERS: dict[str, type[BaseProvider]] = {}


def register_provider(cls: type[BaseProvider]) -> type[BaseProvider]:
    PROVIDERS[cls.name] = cls
    return cls


# ---------------------------------------------------------------------------
# prompt contract (the analog of TEXT_TO_DSL_SYSTEM_PROMPT, llm.py:396-425)
# ---------------------------------------------------------------------------

TEXT_TO_DSL_SYSTEM_PROMPT = """You convert natural-language search queries \
into a DSL with these operations:
- TEXT("query"): basic text search
- AND(q1, q2): both must match
- OR(q1, q2): either matches
- EXCLUDE(base, excluded): base results minus excluded
- WEIGHT(q, w): importance weight (0.0-2.0)
Return ONLY the DSL expression."""


def _last_user_content(messages: list[Message]) -> str:
    for m in reversed(messages):
        if m.role == "user":
            return m.content
    raise ProviderError("no user message to convert")


def _quote(s: str) -> str:
    return '"' + s.replace('"', " ").strip() + '"'


_WEIGHT_WORDS = [
    # (marker regex, weight) — first match wins; deterministic table
    (re.compile(r"\bvery important\b", re.I), 1.8),
    (re.compile(r"\bimportant\b", re.I), 1.5),
    (re.compile(r"\b(somewhat|less) important\b", re.I), 0.8),
]

_PHRASE_SPAN_RE = re.compile(r'"([^"]+)"')
_NEAR_RE = re.compile(r"\bwithin\s+(\d+)\s+words?\b", re.I)
_ANY_ORDER_RE = re.compile(
    r"\b(in\s+any\s+order|near\s+each\s+other|close\s+together)\b", re.I
)
_EXCLUDE_RE = re.compile(r"\b(without|except|but not)\b", re.I)
_OR_RE = re.compile(r"\bor\b", re.I)
_AND_RE = re.compile(r"\band\b", re.I)
_IMPORTANCE_SEG_RE = re.compile(
    r"(?P<marker>(?:very |somewhat |less )?important)\s*:\s*(?P<body>[^,;]+)", re.I
)


@register_provider
class RuleBasedProvider(BaseProvider):
    """Deterministic NL→DSL pattern rules (stand-in for an LLM).

    Precedence mirrors the reference prompt's rules (llm.py:416-425):
    importance markers, then EXCLUDE ("without"/"except"/"but not"),
    then OR, then AND, else plain TEXT."""

    name = "rules"

    def generate(self, messages: list[Message], **kwargs) -> ProviderResponse:
        t0 = time.perf_counter()
        nl = _last_user_content(messages).strip()
        dsl = self._convert(nl)
        return ProviderResponse(
            content=dsl,
            provider=self.name,
            model=self.get_model_name(),
            processing_time_ms=int((time.perf_counter() - t0) * 1000),
        )

    def get_model_name(self) -> str:
        return "pattern-rules-v1"

    def _convert(self, nl: str) -> str:
        # quoted span = the user dictating exact wording → PHRASE;
        # "within N words" turns it into the proximity form.  Highest
        # precedence: explicit quoting beats every looser marker.
        pm = _PHRASE_SPAN_RE.search(nl)
        if pm:
            nm = _NEAR_RE.search(nl)
            um = _ANY_ORDER_RE.search(nl)
            if nm and um:
                # "within N words in any order" → unordered proximity
                return f"NEAR({_quote(pm.group(1))}, {int(nm.group(1))})"
            if um:
                return f"NEAR({_quote(pm.group(1))})"
            if nm:
                return f"PHRASE({_quote(pm.group(1))}, {int(nm.group(1))})"
            return f"PHRASE({_quote(pm.group(1))})"
        segs = list(_IMPORTANCE_SEG_RE.finditer(nl))
        if segs:
            parts = []
            for m in segs:
                marker = m.group("marker").lower()
                if marker.startswith(("somewhat", "less")):
                    w = 0.8
                elif marker.startswith("very"):
                    w = 1.8
                else:
                    w = 1.5
                parts.append(
                    f"WEIGHT(TEXT({_quote(m.group('body'))}), {w})"
                )
            if len(parts) == 1:
                return parts[0]
            return f"AND({', '.join(parts)})"
        m = _EXCLUDE_RE.search(nl)
        if m:
            base, excl = nl[: m.start()], nl[m.end():]
            return (
                f"EXCLUDE(TEXT({_quote(base)}), TEXT({_quote(excl)}))"
            )
        if _OR_RE.search(nl):
            parts = [p for p in _OR_RE.split(nl) if p.strip()]
            if len(parts) >= 2:
                inner = ", ".join(f"TEXT({_quote(p)})" for p in parts)
                return f"OR({inner})"
        if _AND_RE.search(nl):
            parts = [p for p in _AND_RE.split(nl) if p.strip()]
            if len(parts) >= 2:
                inner = ", ".join(f"TEXT({_quote(p)})" for p in parts)
                return f"AND({inner})"
        return f"TEXT({_quote(nl)})"


@register_provider
class EchoProvider(BaseProvider):
    """Returns the user content verbatim — for inputs that are already
    DSL, and as the deterministic test double."""

    name = "echo"

    def generate(self, messages: list[Message], **kwargs) -> ProviderResponse:
        return ProviderResponse(
            content=_last_user_content(messages),
            provider=self.name,
            model=self.get_model_name(),
        )

    def get_model_name(self) -> str:
        return "echo"


def _urllib_transport(url: str, headers: dict, payload: dict,
                      timeout: float) -> dict:
    """Default HTTP transport: one stdlib JSON POST (no third-party
    HTTP client in this environment).  Injectable — tests swap in a
    mock; a deployment can swap in a pooled client."""
    import json
    import urllib.request

    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), headers=headers,
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
        return json.loads(resp.read().decode())


@register_provider
class HTTPProvider(BaseProvider):
    """Generic HTTP chat endpoint provider — the structural analog of
    the reference's httpx providers (``llm.py:69-307``: OpenAI, Claude
    and local/ollama clients share the shape POST json → pick content
    out of the response) with the network boundary INJECTABLE.

    config keys: ``base_url`` (required — absent means the provider is
    simply unavailable, like a missing API key in the reference),
    ``endpoint`` (default ``/chat/completions``), ``api_key`` (sent as
    a Bearer token when present), ``model``, ``timeout_sec``, and
    ``transport`` — a ``(url, headers, payload, timeout) -> dict``
    callable defaulting to a stdlib ``urllib`` JSON POST.

    Accepted response shapes: OpenAI-style
    ``{"choices": [{"message": {"content": ...}}], "usage": {...}}``
    and the reference LocalProvider/ollama style ``{"response": ...}``
    (``llm.py:145-170``)."""

    name = "http"

    def __init__(self, config: dict | None = None) -> None:
        super().__init__(config)
        base = self.config.get("base_url")
        if not base:
            raise ProviderError("http provider requires base_url")
        self.base_url = str(base).rstrip("/")
        self.endpoint = self.config.get("endpoint", "/chat/completions")
        self.api_key = self.config.get("api_key")
        self.model = self.config.get("model", "default")
        self.timeout = float(self.config.get("timeout_sec", 30.0))
        self._transport = self.config.get("transport") or _urllib_transport

    def generate(self, messages: list[Message], **kwargs) -> ProviderResponse:
        start = time.time()
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        payload: dict = {
            "model": self.model,
            "messages": [
                {"role": m.role, "content": m.content} for m in messages
            ],
            "temperature": float(kwargs.get("temperature", 0.0)),
        }
        if kwargs.get("max_tokens"):
            payload["max_tokens"] = int(kwargs["max_tokens"])
        try:
            data = self._transport(
                self.base_url + self.endpoint, headers, payload,
                self.timeout,
            )
        except ProviderError:
            raise
        except Exception as e:
            raise ProviderError(f"http provider request failed: {e}") from e
        content = None
        try:
            if isinstance(data, dict):
                choices = data.get("choices")
                if isinstance(choices, list) and choices:
                    msg = choices[0].get("message")
                    content = msg.get("content") if isinstance(
                        msg, dict) else None
                elif "response" in data:
                    content = data["response"]
        except (AttributeError, TypeError, KeyError, IndexError):
            content = None  # structurally unexpected → ProviderError
        if not isinstance(content, str) or not content.strip():
            raise ProviderError(
                "http provider returned no usable content")
        usage = data.get("usage") if isinstance(
            data.get("usage"), dict) else {}
        return ProviderResponse(
            content=content.strip(),
            provider=self.name,
            model=self.model,
            processing_time_ms=int((time.time() - start) * 1000),
            tokens_used=usage.get("total_tokens"),
        )

    def get_model_name(self) -> str:
        return self.model


class ProviderManager:
    """``LLMManager`` analog (``llm.py:310-395``): instantiates the
    registered providers, tracks a current one, switches at runtime.

    Like the reference's ``_initialize_providers`` (``llm.py:320-362``)
    a provider whose construction fails (e.g. :class:`HTTPProvider`
    without a ``base_url``) is skipped, not fatal — it just doesn't
    appear in ``get_available_providers``.  Per-provider config nests
    under the provider name (``{"http": {"base_url": ...}}``); a flat
    dict is passed through unchanged."""

    def __init__(self, default: str = "rules", config: dict | None = None) -> None:
        self.providers: dict[str, BaseProvider] = {}
        for name, cls in PROVIDERS.items():
            sub = (config or {}).get(name)
            try:
                self.providers[name] = cls(
                    sub if isinstance(sub, dict) else config
                )
            except Exception:
                continue  # unavailable (missing config) — mirror llm.py
        if default not in self.providers:
            raise ProviderError(f"provider {default!r} not available")
        self.current_provider = default

    def generate(
        self, messages: list[Message], provider: str | None = None, **kwargs
    ) -> ProviderResponse:
        name = provider or self.current_provider
        if name not in self.providers:
            raise ProviderError(f"provider {name!r} not available")
        return self.providers[name].generate(messages, **kwargs)

    def switch_provider(self, provider: str) -> None:
        if provider not in self.providers:
            raise ProviderError(f"provider {provider!r} not available")
        self.current_provider = provider

    def get_available_providers(self) -> list[str]:
        return sorted(self.providers)

    def get_current_provider(self) -> str:
        return self.current_provider


def text_to_dsl(
    nl: str, manager: ProviderManager | None = None, provider: str | None = None
) -> str:
    """NL query → validated DSL string (the ``api.py:273-348`` flow):
    build the prompt, call the provider, then round-trip the output
    through :class:`DSLParser` — an unparseable conversion raises
    :class:`DSLParseError` instead of reaching the engine."""
    mgr = manager or ProviderManager()
    resp = mgr.generate(
        [Message("system", TEXT_TO_DSL_SYSTEM_PROMPT), Message("user", nl)],
        provider=provider,
    )
    DSLParser().parse(resp.content)  # validate; raises DSLParseError
    return resp.content
