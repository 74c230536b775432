"""Benchmark decontamination — n-gram overlap against a broadcast set.

The standard pre-training hygiene pass (GPT-3 appendix C / PaLM /
Llama: drop or flag training docs sharing any length-N token n-gram
with an evaluation benchmark).  Dataflow shape at 100 TB:

- the benchmark side is SMALL by definition (eval sets are thousands
  of docs) → tokenize it once, hash its n-grams into one uint64 array,
  ``ray.put`` it ONCE, and probe it inside every ``map_batches`` task
  (broadcast semi-join — never a shuffle);
- the corpus side streams: per batch, emit token n-grams vectorized
  (one rolling-hash pass over the flat token array), membership-test
  against the broadcast set with a sorted ``searchsorted`` probe, and
  aggregate hits per doc with ``np.bincount``.

N-gram identity is by 64-bit rolling hash of the *token strings* (not
raw bytes), so tokenization differences (case, punctuation) don't
produce false negatives.  Reference analog: duplicate-content
rejection at ingest (``/root/reference/src/refimage/api.py:866-877``)
— the same "is this content already in a set we care about" shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from refimage_ray.config import DEFAULT_CONFIG, EngineConfig
from refimage_ray.functions.hashing import hash_string_array
from refimage_ray.stages.tokenize import _flat_tokens

_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


def _ngram_hashes(
    text: pa.ChunkedArray | pa.Array, n: int, cfg: EngineConfig
) -> tuple[np.ndarray, np.ndarray]:
    """text column → (uint64 n-gram hashes, parent row index per gram).

    One vectorized pass: flat token hash array → stacked shifted
    slices combined with a positional mix (order-sensitive, unlike a
    plain xor) → grams whose tokens span two docs are masked out.
    """
    flat, parent = _flat_tokens(text, cfg)
    if len(flat) < n:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    h = hash_string_array(flat).astype(np.uint64)
    m = len(h) - n + 1
    acc = np.zeros(m, np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n):
            acc = acc * _MIX + h[j : j + m]
    # a gram is valid only when all n tokens share one parent doc
    ok = parent[: m] == parent[n - 1 :]
    return acc[ok], parent[:m][ok]


def benchmark_gram_set(
    texts: pa.ChunkedArray | pa.Array, n: int = 8, cfg: EngineConfig = DEFAULT_CONFIG
) -> np.ndarray:
    """Benchmark texts → SORTED unique uint64 n-gram hash array (the
    broadcast side; ``np.searchsorted``-probe-ready)."""
    grams, _ = _ngram_hashes(texts, n, cfg)
    return np.unique(grams)


def contamination_counts(
    batch: pa.Table,
    gram_set: np.ndarray,
    n: int = 8,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> pa.Table:
    """docs batch → (doc_id, n_hit_grams) for docs sharing ≥1 n-gram
    with the benchmark set (vectorized probe, no Python loop)."""
    grams, parent = _ngram_hashes(batch["text"], n, cfg)
    if len(grams) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_hit_grams": pa.array([], pa.int64()),
            }
        )
    from refimage_ray.functions.arrays import sorted_membership

    hit = sorted_membership(gram_set, grams)
    counts = np.bincount(parent[hit], minlength=batch.num_rows)
    rows = np.flatnonzero(counts)
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(ids[rows], pa.int64()),
            "n_hit_grams": pa.array(counts[rows].astype(np.int64), pa.int64()),
        }
    )
