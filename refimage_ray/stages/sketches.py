"""Mergeable sketch summaries (Misra–Gries, HyperLogLog).

At 100 TB the full term-frequency table is itself huge; aggregates
that only need the *heavy* part of the distribution (stopword
discovery, hot-term planning, vocabulary pruning) should not pay a
full vocab-size shuffle.  Two classic mergeable summaries cover this:

- **Misra–Gries** heavy hitters: each batch compresses its exact term
  counts to ``capacity`` weighted rows; summaries merge by weight
  addition and the total under-count across the whole corpus is
  bounded by ``N / (capacity + 1)`` (Agarwal et al., "Mergeable
  Summaries", PODS 2012).  A second exact pass over the *candidate
  set only* (broadcast once via ``ray.put``) turns the sketch into an
  exact answer with a correctness guarantee — so the contract query
  has a full SQL value oracle despite the sketch in the middle.

- **HyperLogLog** (p-bit register file): per-batch registers merge by
  elementwise max; the estimate is deterministic because the token
  hash is the md5-prefix u64 (``functions/hashing.py``), not a seeded
  runtime hash.

Reference analog: the reference computes term statistics by full
SQLite scans (/root/reference/src/refimage/storage.py:714-745); it has
no sketch layer — this is part of the scale story the reference
cannot express.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from refimage_ray.config import DEFAULT_CONFIG, EngineConfig
from refimage_ray.functions.hashing import md5_u64_string_array

# ---------------------------------------------------------------------------
# Misra–Gries
# ---------------------------------------------------------------------------

#: sentinel term for the per-batch bookkeeping row ("" can never be a
#: real token: the tokenizer only emits non-empty [a-z0-9]+ matches).
MG_SENTINEL = ""

MG_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("w", pa.int64()),        # MG weight (under-estimate of count)
        ("decr", pa.int64()),     # decrement charged by this batch (sentinel row)
        ("n_tokens", pa.int64()), # tokens seen by this batch (sentinel row)
    ]
)


def mg_compress(
    terms: np.ndarray, counts: np.ndarray, capacity: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """Compress exact ``(term, count)`` pairs to ≤ ``capacity`` rows.

    Vectorized equivalent of the classic counter-decrement loop: find
    the smallest ``d`` such that at most ``capacity`` counters exceed
    ``d`` (the ``capacity+1``-th largest count), subtract it from all
    counters and drop the non-positive ones.  Returns
    ``(terms, weights, d)``; every surviving weight under-estimates
    the true count by exactly ``d``, every dropped term had count
    ≤ ``d``, and ``d ≤ sum(counts) / (capacity + 1)``.
    """
    if len(terms) <= capacity:
        return terms, counts, 0
    # (capacity+1)-th largest value == element at index `capacity` of
    # the descending order; via np.partition on the negated array.
    kth = int(-np.partition(-counts, capacity)[capacity])
    keep = counts > kth
    return terms[keep], counts[keep] - kth, kth


def mg_partials_batch(
    batch: pa.Table, capacity: int, cfg: EngineConfig = DEFAULT_CONFIG
) -> pa.Table:
    """documents batch → MG summary rows + one sentinel bookkeeping row.

    The sentinel row (term ``""``) carries this batch's decrement and
    token count so a single narrow ``groupby("term").sum`` yields both
    the merged summary and the global error/total in one pass.
    """
    import pyarrow.compute as pc

    from refimage_ray.stages.tokenize import _flat_tokens

    flat, _parent = _flat_tokens(batch["text"], cfg)
    n_tok = len(flat)
    if n_tok == 0:
        terms = np.zeros(0, dtype=object)
        w = np.zeros(0, dtype=np.int64)
        d = 0
    else:
        g = (
            pa.table({"term": flat})
            .group_by("term")
            .aggregate([([], "count_all")])
        )
        terms = np.asarray(g["term"].to_pylist(), dtype=object)
        w = g["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        terms, w, d = mg_compress(terms, w, capacity)
    return pa.table(
        {
            "term": pa.array(list(terms) + [MG_SENTINEL], pa.string()),
            "w": pa.array(np.append(w, 0), pa.int64()),
            "decr": pa.array([0] * len(terms) + [int(d)], pa.int64()),
            "n_tokens": pa.array([0] * len(terms) + [int(n_tok)], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def _leading_rank(w: np.ndarray, bits: int) -> np.ndarray:
    """HLL rank = position of the first 1-bit of ``w`` (a ``bits``-wide
    value stored in uint64), counting from 1; ``bits + 1`` if zero.

    Computed from the bit length via exact float log2 on 32-bit
    halves (every uint32 is exactly representable in float64, and
    ``floor(log2)`` of a non-power-of-two cannot round up across an
    integer boundary at this precision; property-tested against
    ``int.bit_length``).
    """
    w = w.astype(np.uint64)
    hi = (w >> np.uint64(32)).astype(np.uint32)
    lo = (w & np.uint64(0xFFFFFFFF)).astype(np.uint32)

    def _bl32(x: np.ndarray) -> np.ndarray:
        out = np.zeros(len(x), dtype=np.int64)
        nz = x > 0
        out[nz] = np.floor(np.log2(x[nz].astype(np.float64))).astype(np.int64) + 1
        return out

    bitlen = np.where(hi > 0, _bl32(hi) + 32, _bl32(lo))
    return np.where(bitlen == 0, bits + 1, bits - bitlen + 1).astype(np.uint8)


def hll_from_hashes(hashes: np.ndarray, p: int = 12) -> np.ndarray:
    """uint64 hashes → HLL register file (uint8[2**p]).

    Register index = top ``p`` hash bits; rank = first-1-bit position
    of the remaining ``64 - p`` bits.
    """
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(hashes) == 0:
        return regs
    h = hashes.astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & ((np.uint64(1) << np.uint64(64 - p)) - np.uint64(1))
    rank = _leading_rank(w, 64 - p)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(register_files: list[np.ndarray]) -> np.ndarray:
    """Elementwise max — the HLL union law."""
    if not register_files:
        raise ValueError("hll_merge needs at least one register file")
    out = register_files[0].copy()
    for r in register_files[1:]:
        np.maximum(out, r, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    """Deterministic cardinality estimate (64-bit-hash HLL).

    Standard bias-corrected estimator with the small-range linear
    counting switch; no 32-bit large-range correction is needed for a
    64-bit hash.
    """
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


def hll_registers_batch(
    batch: pa.Table, p: int = 12, cfg: EngineConfig = DEFAULT_CONFIG
) -> pa.Table:
    """documents batch → ONE row holding this batch's register file.

    Rows are tiny (``2**p`` bytes) regardless of batch size, so the
    "shuffle" that merges them is a few KB per block — the whole point
    of sketching distinct counts at 100 TB.
    """
    from refimage_ray.stages.tokenize import _flat_tokens

    flat, _parent = _flat_tokens(batch["text"], cfg)
    h = (
        md5_u64_string_array(flat)
        if len(flat)
        else np.zeros(0, dtype=np.uint64)
    )
    regs = hll_from_hashes(h, p=p)
    return pa.table({"regs": pa.array([regs.tolist()], pa.list_(pa.uint8()))})


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------

#: fixed odd multipliers for multiply-shift row hashing (deterministic —
#: sketches must be reproducible and mergeable across runs/workers)
_CMS_SALTS = np.array([
    0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
    0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63, 0xFF51AFD7ED558CCD,
    0xC4CEB9FE1A85EC53, 0x2545F4914F6CDD1D,
], dtype=np.uint64)


def cms_rows(hashes: np.ndarray, width: int, depth: int) -> np.ndarray:
    """(depth, n) row-bucket indices via multiply-shift hashing."""
    if depth > len(_CMS_SALTS):
        raise ValueError(f"depth must be <= {len(_CMS_SALTS)}")
    h = hashes.astype(np.uint64)
    with np.errstate(over="ignore"):
        mixed = h[None, :] * _CMS_SALTS[:depth, None]  # wrapping u64 mul
    return ((mixed >> np.uint64(33)) % np.uint64(width)).astype(np.int64)


def cms_from_counts(
    hashes: np.ndarray, counts: np.ndarray, width: int, depth: int
) -> np.ndarray:
    """Weighted items → (depth, width) int64 Count-Min table."""
    cms = np.zeros((depth, width), dtype=np.int64)
    if len(hashes):
        idx = cms_rows(hashes, width, depth)
        for j in range(depth):
            np.add.at(cms[j], idx[j], counts.astype(np.int64))
    return cms


def cms_merge(tables: list[np.ndarray]) -> np.ndarray:
    """Elementwise sum — CMS is a linear sketch, so merge == add."""
    if not tables:
        raise ValueError("cms_merge needs at least one table")
    out = tables[0].copy()
    for t in tables[1:]:
        out += t
    return out


def cms_query(cms: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Point estimates: min over rows.  NEVER undercounts (every row
    holds true_count + collisions ≥ true_count); the classic bound is
    overcount ≤ e/width · N with prob 1 - e^-depth per query."""
    depth, width = cms.shape
    idx = cms_rows(hashes, width, depth)
    return np.min(
        np.stack([cms[j, idx[j]] for j in range(depth)]), axis=0
    )


def cms_batch(
    batch: pa.Table, width: int = 4096, depth: int = 4,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> pa.Table:
    """documents batch → ONE row holding this batch's CMS (flattened).

    Same shape as ``hll_registers_batch``: the merge exchange carries
    ``depth·width`` int64 per BLOCK, independent of corpus size."""
    from refimage_ray.stages.tokenize import _flat_tokens

    flat, _parent = _flat_tokens(batch["text"], cfg)
    if len(flat):
        tbl = pa.table({"t": flat}).group_by("t").aggregate([([], "count_all")])
        h = md5_u64_string_array(tbl["t"].combine_chunks())
        c = tbl["count_all"].to_numpy(zero_copy_only=False)
    else:
        h = np.zeros(0, np.uint64)
        c = np.zeros(0, np.int64)
    cms = cms_from_counts(h, c, width, depth)
    return pa.table({"cms": pa.array([cms.ravel().tolist()],
                                     pa.list_(pa.int64()))})
