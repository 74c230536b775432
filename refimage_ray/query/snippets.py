"""Result snippets: the best query-term window of each hit's text.

The search-UI staple the reference serves images for and a text engine
serves highlights for (reference analog: the metadata+thumbnail payload
of ``GET /search`` — ``/root/reference/src/refimage/api.py:380-431`` —
is the reference's "show the user why this hit matched"; for text that
is a term-highlighted snippet).

Scope note: snippets run over the TOP-K hit texts only (k ≈ 10), after
scoring — a per-doc Python pass here is bounded by k, never by corpus
size, so this is deliberately driver-side and NOT a Dataset stage.
"""

from __future__ import annotations

import re

from refimage_ray.config import DEFAULT_CONFIG

_WORD_RE = re.compile(DEFAULT_CONFIG.token_pattern)
# matching runs on the ORIGINAL text with IGNORECASE rather than on
# text.lower(): str.lower() can change string length (e.g. 'İ' → 'i̇'),
# which would shift every span after such a character and misplace the
# marks.  Offsets from this regex are always valid into `text`.
_WORD_RE_CI = re.compile(DEFAULT_CONFIG.token_pattern, re.IGNORECASE)


def best_snippet(
    text: str,
    terms: list[str],
    width: int = 160,
    mark: tuple[str, str] | None = ("[", "]"),
) -> dict:
    """The ``width``-char window of ``text`` covering the most distinct
    query terms (ties: most total matches, then earliest start), cut at
    token boundaries, with matches optionally bracketed.

    Matching uses the engine's own token pattern (case-insensitive,
    whole-token), so a snippet's marks agree exactly with what the
    index matched.  Deterministic; returns
    ``{"snippet", "n_matches", "n_distinct"}``.
    """
    want = {t.lower() for t in terms if t}
    spans: list[tuple[int, int, str]] = []
    for m in _WORD_RE_CI.finditer(text):
        if m.group(0).lower() in want:
            spans.append((m.start(), m.end(), m.group(0).lower()))
    if not spans:
        head = text[:width]
        return {"snippet": head, "n_matches": 0, "n_distinct": 0}

    # two-pointer sweep over match spans: for each left match, extend
    # right while the window fits in `width`
    best = (-1, -1, 0)  # (n_distinct, n_matches, -start) maximized
    best_range = (0, 0)
    j = 0
    from collections import Counter

    counts: Counter = Counter()
    for i in range(len(spans)):
        if j < i:
            j = i
            counts = Counter()
        while j < len(spans) and spans[j][1] - spans[i][0] <= width:
            counts[spans[j][2]] += 1
            j += 1
        cand = (len(counts), sum(counts.values()), -spans[i][0])
        if cand > best:
            best = cand
            best_range = (i, j)
        if j > i:  # spans[i] was counted only if the window held it
            counts[spans[i][2]] -= 1
            if not counts[spans[i][2]]:
                del counts[spans[i][2]]

    i, j = best_range
    lo = spans[i][0]
    # j == i: no whole match fits in `width` (every matched token is
    # longer than the window) — show the first match truncated to
    # `width`; counts stay 0 because no FULL match is inside the window
    hi = spans[j - 1][1] if j > i else min(spans[i][1], lo + width)
    pad = max(0, (width - (hi - lo)) // 2)
    start = max(0, lo - pad)
    end = min(len(text), start + width)
    # cut at token boundaries (don't split a word at either edge)
    if start > 0:
        # if `start` lands mid-word (preceding char is part of a
        # token), skip forward past the fragment, then any separators
        if _WORD_RE_CI.match(text[start - 1]):
            while start < lo and _WORD_RE_CI.match(text[start]):
                start += 1
        while start < lo and not _WORD_RE_CI.match(text[start]):
            start += 1
    if end < len(text):
        # if `end` splits a token, trim back to that token's start
        for m in _WORD_RE_CI.finditer(text, start, min(len(text), end + 1)):
            if m.start() < end < m.end():
                end = m.start()
                break
        end = max(end, hi)

    piece = text[start:end]
    n_matches = 0
    if mark is not None:
        lo_mark, hi_mark = mark
        out = []
        prev = 0
        for s, e, _t in spans:
            if s < start or e > end:
                continue
            out.append(piece[prev:s - start])
            out.append(lo_mark + piece[s - start:e - start] + hi_mark)
            prev = e - start
            n_matches += 1
        out.append(piece[prev:])
        piece = "".join(out)
    else:
        n_matches = sum(1 for s, e, _ in spans if s >= start and e <= end)
    return {
        "snippet": piece,
        "n_matches": n_matches,
        "n_distinct": best[0],
    }


def snippets_for_hits(
    index_dir: str,
    hits: list[tuple[int, float]],
    query: str,
    width: int = 160,
) -> list[dict]:
    """Snippet per (doc_id, score) hit — one pruned point lookup for
    the k texts, then :func:`best_snippet` each."""
    from refimage_ray.functions.text import tokenize
    from refimage_ray.query.engine import lookup_docs

    ids = [d for d, _ in hits]
    texts = {
        r["doc_id"]: r["text"]
        for r in lookup_docs(
            index_dir, ids, columns=["doc_id", "text"]
        ).to_pylist()
    }
    terms = tokenize(query)
    out = []
    for doc_id, score in hits:
        sn = best_snippet(texts.get(doc_id, ""), terms, width=width)
        sn.update({"doc_id": doc_id, "score": score})
        out.append(sn)
    return out
