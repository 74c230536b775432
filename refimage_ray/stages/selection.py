"""Exact distributed order statistics (k-th smallest / quantiles) over
an arbitrary double column.

``doc_len_quantiles`` gets exact quantiles from a bounded-int
histogram; this module covers the general case — unbounded doubles —
with the classic **iterative histogram bisection** (a.k.a. distributed
quickselect): each round is ONE streaming pass emitting a B-bucket
count row per block (the exchange is B int64 per block, corpus-size
independent), the driver narrows to the bucket containing the target
rank, and when the surviving bucket is small enough one filter pass
collects it exactly.  With B=1024 buckets the interval shrinks 1024×
per round, so even pathological ranges converge in a handful of
passes; ties and duplicate-heavy columns are handled by the equal-
value early exit.

The result is EXACT (the k-th smallest element, 1-indexed), so the
contract query has a full SQL value oracle (``ORDER BY … LIMIT 1
OFFSET k-1``) despite being computed by an iterative distributed
algorithm — same spirit as the Misra–Gries exact-after-sketch pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _pass_counts(ds, col: str, lo: float, hi: float, buckets: int):
    """One streaming pass: per-block histogram of values in [lo, hi]."""
    edges = np.linspace(lo, hi, buckets + 1)
    inner = edges[1:-1]

    def partial(batch: pa.Table) -> pa.Table:
        x = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[(x >= lo) & (x <= hi)]
        idx = np.searchsorted(inner, x, side="right")
        counts = np.bincount(idx, minlength=buckets).astype(np.int64)
        return pa.table({"c": pa.array([counts.tolist()],
                                       pa.list_(pa.int64()))})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    total = np.zeros(buckets, dtype=np.int64)
    for r in rows:
        total += np.asarray(r["c"], np.int64)
    return edges, total


def kth_smallest(
    ds,
    col: str,
    k: int,
    *,
    buckets: int = 1024,
    collect_cap: int = 65536,
    max_rounds: int = 64,
) -> float:
    """Exact k-th smallest (1-indexed) of ``ds[col]``.

    Requires ``1 <= k <= n``.  Narrows [lo, hi] by one histogram pass
    per round; collects the final bucket exactly once it fits
    ``collect_cap`` values."""
    import pyarrow.compute as pc

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    stats = ds.aggregate(
        *(agg(col) for agg in _min_max_count())
    )
    n = int(stats[f"count({col})"])
    if k > n:
        raise ValueError(f"k={k} > n={n}")
    lo = float(stats[f"min({col})"])
    hi = float(stats[f"max({col})"])
    rank = k
    for _ in range(max_rounds):
        if lo == hi:
            return lo
        edges, counts = _pass_counts(ds, col, lo, hi, buckets)
        cum = np.cumsum(counts)
        j = int(np.searchsorted(cum, rank))
        rank -= int(cum[j - 1]) if j else 0
        lo_j = float(edges[j])
        hi_j = float(edges[j + 1]) if j + 1 < len(edges) else hi
        if counts[j] <= collect_cap or lo_j == hi_j or (
            np.nextafter(lo_j, hi_j) >= hi_j
        ):
            # collect the bucket exactly — same membership rule as the
            # counting pass (searchsorted over the SAME inner edges)
            inner = edges[1:-1]

            def keep(batch: pa.Table, _j=j) -> pa.Table:
                x = batch[col].to_numpy(zero_copy_only=False).astype(
                    np.float64
                )
                m = (x >= lo) & (x <= hi)
                xm = x[m]
                sel = xm[np.searchsorted(inner, xm, side="right") == _j]
                return pa.table({"v": pa.array(sel, pa.float64())})

            vals = np.sort(np.concatenate([
                np.asarray(b["v"], np.float64)
                for b in ds.map_batches(
                    keep, batch_format="pyarrow"
                ).iter_batches(batch_format="pyarrow", batch_size=None)
            ] or [np.zeros(0)]))
            if len(vals) != counts[j]:
                raise RuntimeError(
                    f"selection collect drift: {len(vals)} != {counts[j]}"
                )
            return float(vals[rank - 1])
        lo, hi = lo_j, hi_j
    raise RuntimeError("kth_smallest failed to converge")


def quantiles_exact(
    ds, col: str, qs: "tuple[float, ...]" = (0.5, 0.9, 0.99), **kw
) -> pa.Table:
    """Exact discrete quantiles: value at rank ``ceil(q·n)``."""
    n = int(ds.count())
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


def _min_max_count():
    from ray.data.aggregate import Count, Max, Min

    return (
        lambda c: Min(c),
        lambda c: Max(c),
        lambda c: Count(c),
    )
