"""Text extraction stage — stateful actor-pool ``map_batches``.

Reference analog: the CLIP encoder, a parser/model loaded ONCE per
process and reused for every request
(``/root/reference/src/refimage/models/clip_model.py:36-83``; the spec
requires "loaded once and reused",
``/root/reference/docs/requirements-spec.md:31``).  Here the
load-once state is the compiled tag/entity machinery; the per-row
invariant (``input_hint``) is byte-identical extracted text per url.

Usage::

    pages.map_batches(ExtractText, batch_format="pyarrow",
                      concurrency=8, batch_size=512)

The output drops the wide ``html`` column immediately (projection
early — SURVEY.md §4.2: binary html dominates block size).
"""

from __future__ import annotations

import html as _html
import re

import pyarrow as pa


class ExtractText:
    """html → text extractor.  Per-row parse is inherently scalar work
    (like any HTML parser); state (compiled regexes) is built once per
    actor, batches stream through ``__call__``."""

    def __init__(self) -> None:
        self._body = re.compile(rb"<body[^>]*>(.*)</body>", re.S | re.I)
        self._para = re.compile(r"<p[^>]*>(.*?)</p>", re.S | re.I)
        self._tag = re.compile(r"<[^>]+>")

    def extract_one(self, raw: bytes) -> str:
        m = self._body.search(raw)
        body = (m.group(1) if m else raw).decode("utf-8", errors="replace")
        paras = self._para.findall(body)
        if paras:
            parts = [self._tag.sub("", p) for p in paras]
        else:
            parts = [self._tag.sub(" ", body).strip()]
        joined = "\n\n".join(parts)
        # unescape is identity without '&' — skipping it is byte-safe
        # and avoids the dominant per-row cost on entity-free pages
        return _html.unescape(joined) if "&" in joined else joined

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        html_col = batch["html"]
        # --- vectorized fast path: exactly one <p>…</p>, no entities ---
        # (the overwhelmingly common page shape; byte-identical to the
        # general path because single-paragraph extraction is just the
        # <p> body, and unescape is identity without '&')
        try:
            as_str = pc.cast(html_col, pa.string())
        except pa.ArrowInvalid:
            # invalid UTF-8 somewhere in the batch: the vectorized cast
            # refuses, but the scalar path tolerates bad bytes via
            # errors='replace' — route the whole batch through it
            texts = [self.extract_one(raw) for raw in html_col.to_pylist()]
            keep = [n for n in batch.column_names if n not in ("html", "text")]
            return batch.select(keep).append_column(
                "text", pa.array(texts, pa.string())
            )
        # mirror the scalar flow exactly: restrict to the <body> region
        # first (case-insensitive, like the scalar parser), THEN require
        # exactly one case-insensitive <p inside it — otherwise a page
        # with a <p> outside <body>, or a <P> variant, would extract
        # different text depending on which path its batch took
        body_sub = pc.extract_regex(
            as_str, pattern=r"(?is)<body[^>]*>(?P<b>.*)</body>"
        )
        body_str = pc.if_else(
            pc.is_valid(body_sub), pc.struct_field(body_sub, "b"), as_str
        )
        n_p = pc.count_substring(
            body_str, pattern="<p", ignore_case=True
        ).to_numpy(zero_copy_only=False)
        has_amp = pc.greater(
            pc.count_substring(as_str, pattern="&"), 0
        ).to_numpy(zero_copy_only=False)
        has_nl = pc.greater(
            pc.count_substring(as_str, pattern="\n"), 0
        ).to_numpy(zero_copy_only=False)
        fast = (n_p == 1) & ~has_amp & ~has_nl
        texts: list = [None] * batch.num_rows
        slow_mask = ~fast
        if fast.any():
            sub = pc.extract_regex(
                pc.filter(body_str, pa.array(fast)),
                pattern=r"(?is)<p[^>]*>(?P<body>.*?)</p>",
            )
            bodies = pc.struct_field(sub, "body").to_pylist()
            fi = 0
            for i in np.flatnonzero(fast):
                body = bodies[fi]
                fi += 1
                if body is None or "<" in body:
                    slow_mask[i] = True  # nested markup → general parser
                else:
                    texts[i] = body
        slow_idx = np.flatnonzero(slow_mask)
        if len(slow_idx):
            raws = html_col.take(pa.array(slow_idx)).to_pylist()
            for i, raw in zip(slow_idx, raws):
                texts[i] = self.extract_one(raw)
        keep = [n for n in batch.column_names if n not in ("html", "text")]
        out = batch.select(keep)
        return out.append_column("text", pa.array(texts, pa.string()))


_CACHED_EXTRACTOR: ExtractText | None = None


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """Task-pool flavor of :class:`ExtractText` — same bytes out.

    The extractor's state is three compiled regexes (~µs to build), so
    an actor pool buys nothing and costs actor-startup ramp on a short
    stage (measured: the pool ramp was a large fraction of a ~6 s
    docs_write at 32 cpus).  A plain function in a TASK-pool
    ``map_batches`` reuses Ray's already-warm worker processes from the
    read stage — zero ramp — and caches the compiled state once per
    worker process in a module global.  Reserve the actor-pool class
    for genuinely expensive state (model weights, big lookup tables).
    """
    global _CACHED_EXTRACTOR
    if _CACHED_EXTRACTOR is None:
        _CACHED_EXTRACTOR = ExtractText()
    return _CACHED_EXTRACTOR(batch)
