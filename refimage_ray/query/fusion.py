"""Reciprocal-rank fusion — the hybrid lexical ⊕ vector retrieval
bridge.

The reference engine's semantic store is CLIP+FAISS (vector-only:
``/root/reference/src/refimage/search/__init__.py``); this repo's
from-scratch path is the inverted-index BM25 engine.  RRF (Cormack,
Clarke & Buettcher, SIGIR 2009 — public) fuses the two without score
calibration: each ranking contributes ``1 / (rrf_k + rank)`` per
document, so only RANKS cross the fusion boundary and the BM25/cosine
score scales never have to be commensurable.

Scale note: fusion consumes top-N lists (N = ``n_each``, user-sized),
never corpora — the inputs are already the outputs of distributed
top-k operators (BM25 searcher, ``ann.brute_force_topk``), so the
driver-side dict here is O(Σ N), bytes not gigabytes, by construction.
"""

from __future__ import annotations


def rrf_fuse(
    rankings: "list[list[int]]", k: int, rrf_k: int = 60
) -> list[tuple[int, float]]:
    """Fuse ordered id lists (best first) by reciprocal-rank fusion.

    ``score(d) = Σ_r 1 / (rrf_k + rank_r(d))`` with 1-based ranks; a
    list that doesn't contain ``d`` contributes nothing (the standard
    RRF convention).  Returns ``[(id, score)]`` sorted by
    (score desc, id asc) — the same total-order contract as every
    search surface in this engine — truncated to ``k``.

    Determinism: each contribution is ``1.0 / (rrf_k + rank)`` in
    float64 and lists are summed in the order given, so the result is
    bit-reproducible and matches a SQL oracle computing the same
    COALESCE-sum (float64 addition of identical operands in identical
    order).
    """
    if rrf_k < 1:
        raise ValueError(f"rrf_k must be >= 1, got {rrf_k}")
    scores: dict[int, float] = {}
    for ranking in rankings:
        for rank, did in enumerate(ranking, start=1):
            scores[did] = scores.get(did, 0.0) + 1.0 / (rrf_k + rank)
    out = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return out[:k]
