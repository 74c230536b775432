"""Text normalization / tokenization — the pure-Python reference path.

The single source of truth for token semantics: lowercase, then extract
``[a-z0-9]+`` runs.  The vectorized Arrow implementation in
``stages/tokenize.py`` and the SQL oracles
(``regexp_extract_all(lower(text), '[a-z0-9]+')``) must agree with
this function token-for-token; unit tests enforce it.

Reference analog: normalization applied identically at store and query
time (``/root/reference/src/refimage/dsl.py:117``,
``models/schemas.py:28-34``) — index/query asymmetry is the classic
full-text bug, so there is exactly one definition.
"""

from __future__ import annotations

import re
from collections import Counter

_TOKEN_RE = re.compile(r"[a-z0-9]+")


from functools import lru_cache


@lru_cache(maxsize=16)
def _compiled(pattern: str) -> "re.Pattern[str]":
    return re.compile(pattern)


def tokenize(text: str, pattern: str | None = None) -> list[str]:
    """Normalize + tokenize one string (driver/oracle/query-side).

    ``pattern`` overrides the default token regex — searchers pass the
    ``token_pattern`` recorded in the index manifest so an index built
    with a custom pattern is queried with the SAME tokenizer
    (index/query symmetry must hold per-artifact, not just for the
    default config)."""
    rx = _TOKEN_RE if pattern is None else _compiled(pattern)
    return rx.findall(text.lower())


def term_counts(text: str) -> Counter:
    """Per-document term frequencies (the tokenizer's pre-aggregation)."""
    return Counter(tokenize(text))


def is_blank(text: str | None) -> bool:
    """Reject empty/whitespace-only input (reference:
    ``schemas.py:28-34``, ``clip_model.py:157-159``)."""
    return text is None or not text.strip()
