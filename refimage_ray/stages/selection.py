"""Exact distributed order statistics (k-th smallest / quantiles) over
an arbitrary double column.

``doc_len_quantiles`` gets exact quantiles from a bounded-int
histogram; this module covers the general case — unbounded doubles —
with the classic **iterative histogram bisection** (a.k.a. distributed
quickselect): each round is ONE streaming pass emitting a B-bucket
(count, min, max) row per block (the exchange is ~3·B values per
block, corpus-size independent), the driver narrows to the bucket
containing the target rank, and when the surviving bucket is small
enough one filter pass collects it exactly.

Two details make this robust where the naive version is not (both
found by the hypothesis property suite):

- the next interval is the chosen bucket's observed **data min/max**,
  not its edge bounds — so the interval always lands on actual values
  and every round that doesn't finish strictly removes at least one
  distinct value (the bucket extremes split into different buckets
  next round), guaranteeing termination;
- an all-equal bucket (``min == max``) returns immediately — a
  duplicate spike (e.g. millions of exact 0.0s) would otherwise take
  hundreds of rounds to shrink the interval to one ULP of 0.

The result is EXACT (the k-th smallest element, 1-indexed), so the
contract query has a full SQL value oracle (``row_number() OVER
(ORDER BY value)``) despite being computed by an iterative distributed
algorithm — same spirit as the Misra–Gries exact-after-sketch pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def local_histogram_pass(
    x: np.ndarray, lo: float, hi: float, buckets: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """One block's contribution: per-bucket (count, data-min, data-max)
    of the values in the CLOSED interval [lo, hi].  Pure function —
    shared by the distributed pass and the property-test driver."""
    edges = np.linspace(lo, hi, buckets + 1)
    inner = edges[1:-1]
    x = x[(x >= lo) & (x <= hi)]
    idx = np.searchsorted(inner, x, side="right")
    counts = np.bincount(idx, minlength=buckets).astype(np.int64)
    bmin = np.full(buckets, np.inf)
    bmax = np.full(buckets, -np.inf)
    if len(x):
        np.minimum.at(bmin, idx, x)
        np.maximum.at(bmax, idx, x)
    return edges, counts, bmin, bmax


def local_collect_pass(
    x: np.ndarray, lo: float, hi: float, buckets: int, j: int
) -> np.ndarray:
    """Values of bucket ``j`` — the SAME membership rule as the
    counting pass (identical edges + searchsorted)."""
    edges = np.linspace(lo, hi, buckets + 1)
    inner = edges[1:-1]
    x = x[(x >= lo) & (x <= hi)]
    return x[np.searchsorted(inner, x, side="right") == j]


def select_core(
    count_pass,
    collect_pass,
    k: int,
    lo: float,
    hi: float,
    *,
    buckets: int = 1024,
    collect_cap: int = 65536,
    max_rounds: int = 64,
) -> float:
    """Driver loop shared by the distributed and in-memory variants.

    ``count_pass(lo, hi) -> (counts, bmin, bmax)`` aggregated over all
    data; ``collect_pass(lo, hi, j) -> sorted ndarray`` of bucket j's
    values."""
    rank = k
    for _ in range(max_rounds):
        if lo == hi:
            return float(lo)
        counts, bmin, bmax = count_pass(lo, hi)
        cum = np.cumsum(counts)
        j = int(np.searchsorted(cum, rank))
        rank -= int(cum[j - 1]) if j else 0
        if bmin[j] == bmax[j]:  # all-equal bucket: done, whatever rank
            return float(bmin[j])
        if counts[j] <= collect_cap:
            vals = collect_pass(lo, hi, j)
            if len(vals) != counts[j]:
                raise RuntimeError(
                    f"selection collect drift: {len(vals)} != {counts[j]}"
                )
            return float(np.sort(vals)[rank - 1])
        # data bounds, not edge bounds: strictly removes the bucket's
        # extremes from co-residence next round → guaranteed progress
        lo, hi = float(bmin[j]), float(bmax[j])
    raise RuntimeError("kth_smallest failed to converge")


def kth_smallest(
    ds,
    col: str,
    k: int,
    *,
    buckets: int = 1024,
    collect_cap: int = 65536,
    max_rounds: int = 64,
) -> float:
    """Exact k-th smallest (1-indexed) of ``ds[col]`` — distributed.

    Nulls and NaNs are EXCLUDED (SQL ORDER BY semantics); ranks are
    over the valid values only.  (``Count(col)`` counts null rows and
    ``Max`` propagates NaN, so the bounds come from an explicit
    valid-only pass.)"""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def valid_stats(batch: pa.Table) -> pa.Table:
        x = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[np.isfinite(x)]  # drops null→NaN and ±inf alike
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "mn": pa.array([float(x.min()) if len(x) else np.inf],
                           pa.float64()),
            "mx": pa.array([float(x.max()) if len(x) else -np.inf],
                           pa.float64()),
        })

    rows = ds.map_batches(valid_stats, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in rows)
    if k > n:
        raise ValueError(f"k={k} > n={n}")

    def count_pass(lo: float, hi: float):
        def partial(batch: pa.Table) -> pa.Table:
            x = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
            _, c, mn, mx = local_histogram_pass(x, lo, hi, buckets)
            return pa.table({
                "c": pa.array([c.tolist()], pa.list_(pa.int64())),
                "mn": pa.array([mn.tolist()], pa.list_(pa.float64())),
                "mx": pa.array([mx.tolist()], pa.list_(pa.float64())),
            })

        rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
        counts = np.zeros(buckets, np.int64)
        bmin = np.full(buckets, np.inf)
        bmax = np.full(buckets, -np.inf)
        for r in rows:
            counts += np.asarray(r["c"], np.int64)
            np.minimum(bmin, np.asarray(r["mn"], np.float64), out=bmin)
            np.maximum(bmax, np.asarray(r["mx"], np.float64), out=bmax)
        return counts, bmin, bmax

    def collect_pass(lo: float, hi: float, j: int) -> np.ndarray:
        def keep(batch: pa.Table) -> pa.Table:
            x = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
            return pa.table({
                "v": pa.array(local_collect_pass(x, lo, hi, buckets, j),
                              pa.float64()),
            })

        parts = [
            np.asarray(b["v"], np.float64)
            for b in ds.map_batches(keep, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow", batch_size=None)
        ]
        return np.concatenate(parts or [np.zeros(0)])

    return select_core(
        count_pass, collect_pass, k,
        min(r["mn"] for r in rows), max(r["mx"] for r in rows),
        buckets=buckets, collect_cap=collect_cap, max_rounds=max_rounds,
    )


def quantiles_exact(
    ds, col: str, qs: "tuple[float, ...]" = (0.5, 0.9, 0.99), **kw
) -> pa.Table:
    """Exact discrete quantiles: value at rank ``ceil(q·n)`` where n
    counts only VALID (non-null, finite) values — SQL ORDER BY drops
    nulls the same way."""

    def valid_count(batch: pa.Table) -> pa.Table:
        x = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"n": pa.array([int(np.isfinite(x).sum())],
                                       pa.int64())})

    n = sum(r["n"] for r in
            ds.map_batches(valid_count, batch_format="pyarrow").take_all())
    out_q, out_v = [], []
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantile must be in (0, 1], got {q}")
        k = max(1, int(np.ceil(q * n)))
        out_q.append(float(q))
        out_v.append(kth_smallest(ds, col, k, **kw))
    return pa.table({
        "q": pa.array(out_q, pa.float64()),
        "value": pa.array(out_v, pa.float64()),
    })
