"""Distributed joins for two LARGE sides — explicit bucketed hash join.

The reference only ever joins a tiny top-k result against metadata
(broadcast/map-side, ``query/engine.lookup_docs``).  For two large
relations the portable Ray Data pattern (ray_guide "Joins and
lookups") is an explicit partitioned hash join:

    tag each side (side=0/1) → union → add ``bucket = key_hash % B``
    → groupby(bucket) → per bucket: pandas merge of the two sides

One all-to-all on the bucket key; B sized ≈ 4× cores; skewed hot keys
should be salted like hot terms (same machinery as the index build).
Ray 2.49 also ships a native ``Dataset.join`` — we keep the explicit
version as the documented, tunable path (and it works on any Ray
version with groupby).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def bucket_of(arr: "pa.Array | pa.ChunkedArray", buckets: int) -> np.ndarray:
    """Deterministic bucket assignment for join/exchange keys — int64
    multiplicative hash for integer keys, ``pd.util.hash_array`` for
    string (or other) keys.  ONE function shared by every bucketed
    exchange (hash_join sides, graph fused-update) so co-bucketing
    always holds across call sites."""
    if pa.types.is_integer(arr.type):
        k = arr.to_numpy(zero_copy_only=False).astype(np.int64)
        return np.abs((k * np.int64(2654435761)) % np.int64(buckets))
    h = pd.util.hash_array(
        arr.to_numpy(zero_copy_only=False)
    ).view(np.int64)
    return np.abs(h % np.int64(buckets))


def _with_bucket_and_side(
    ds: "ray.data.Dataset",
    key: str,
    side: int,
    buckets: int,
    keep: list[str],
    unified: pa.Schema,
) -> "ray.data.Dataset":
    def tag(b: pa.Table) -> pa.Table:
        cols = {}
        n = b.num_rows
        for field in unified:
            if field.name in keep and field.name in b.column_names:
                cols[field.name] = b[field.name]
            else:
                cols[field.name] = pa.nulls(n, field.type)
        out = pa.table(cols)
        bucket = bucket_of(b[key], buckets)
        return out.append_column(
            "join_bucket", pa.array(bucket, pa.int64())
        ).append_column("join_side", pa.array(np.full(n, side, np.int8)))

    return ds.map_batches(tag, batch_format="pyarrow")


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    left_on: str,
    right_on: str,
    left_cols: list[str],
    right_cols: list[str],
    buckets: int = 64,
    how: str = "inner",
) -> "ray.data.Dataset":
    """Bucketed hash join of two large Datasets → joined Dataset.

    Column sets must be disjoint apart from the keys (pandas suffixes
    are deliberately not supported — name columns explicitly).
    """
    def _fields(ds) -> list[pa.Field]:
        sch = ds.schema()  # ray Schema wrapper: .names / .types
        out = []
        for name, typ in zip(sch.names, sch.types):
            if not isinstance(typ, pa.DataType):
                dt = np.dtype(typ)  # pandas-block schema
                typ = pa.string() if dt == np.dtype(object) else pa.from_numpy_dtype(dt)
            out.append(pa.field(name, typ))
        return out

    fields = []
    seen = set()
    for fs, cols in ((_fields(left), left_cols), (_fields(right), right_cols)):
        for f in fs:
            if f.name in cols and f.name not in seen:
                fields.append(f)
                seen.add(f.name)
    unified = pa.schema(fields)
    lt = _with_bucket_and_side(left, left_on, 0, buckets, left_cols, unified)
    rt = _with_bucket_and_side(right, right_on, 1, buckets, right_cols, unified)
    both = lt.union(rt)
    l_cols, r_cols = list(left_cols), list(right_cols)

    def merge_bucket(g: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        # split sides in Arrow so column types survive (the union's
        # cross-side nulls would coerce ints to float in pandas)
        lg = g.filter(pc.equal(g["join_side"], 0)).select(l_cols).to_pandas()
        rg = g.filter(pc.equal(g["join_side"], 1)).select(r_cols).to_pandas()
        return lg.merge(rg, left_on=left_on, right_on=right_on, how=how)

    return both.groupby("join_bucket").map_groups(merge_bucket, batch_format="pyarrow")


def native_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    left_on: str,
    right_on: str,
    num_partitions: int = 32,
    how: str = "inner",
) -> "ray.data.Dataset":
    """Ray 2.49's built-in hash-join operator — the A/B counterpart to
    :func:`hash_join`.

    The native operator runs dedicated aggregator actors (its own
    partitioning machinery) where `hash_join` expresses the join as a
    plain groupby — measured on this box the explicit version wins at
    small scale (actor pool startup dominates) while the native one
    avoids the union's schema-widening; keep both, pick per workload.
    """
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions,
        on=(left_on,),
        right_on=(right_on,),
    )


def asof_join_prior(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    key: str,
    on: str,
    left_cols: list[str],
    right_cols: list[str],
    allow_exact: bool = False,
) -> "ray.data.Dataset":
    """Two-table AS-OF join: for every left row, the latest right row
    of the same ``key`` with ``right.on < left.on`` (``<=`` when
    ``allow_exact``) — the semantics of ``pandas.merge_asof(by=key,
    direction='backward')``, which is the test oracle.

    ``left_cols`` / ``right_cols`` are VALUE columns (key/on are
    implicit and always carried); right values come back as
    ``right_<col>``, null when no prior right row exists.

    Shape: tag sides → union → ONE ``groupby(key)`` → per group a
    vectorized positional carry (stable lexsort by (on, side-order),
    ``np.maximum.accumulate`` over right positions) — no per-row
    Python and no global sort of either table.  Partitioning
    assumption: one key's rows fit one group (the sessionize
    contract); salt pathological hot keys upstream.
    """
    import pyarrow.compute as pc

    bad = {key, on} & (set(left_cols) | set(right_cols))
    if bad:
        raise ValueError(f"key/on are implicit, remove {sorted(bad)}")
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(
            f"left/right value columns must be disjoint, both have {sorted(overlap)}"
        )

    def _types(ds, keep):
        sch = ds.schema()
        return {n_: t for n_, t in zip(sch.names, sch.types) if n_ in keep}

    types = {**_types(left, left_cols), **_types(right, right_cols)}
    all_vals = list(left_cols) + list(right_cols)

    def tag(side: int, keep: list[str]):
        def fn(b: pa.Table) -> pa.Table:
            n = b.num_rows
            cols = {key: b[key], on: b[on]}
            for c in all_vals:
                cols[c] = b[c] if c in keep else pa.nulls(n, types[c])
            return pa.table(cols).append_column(
                "asof_side", pa.array(np.full(n, side, np.int8))
            )
        return fn

    both = left.map_batches(tag(0, left_cols), batch_format="pyarrow").union(
        right.map_batches(tag(1, right_cols), batch_format="pyarrow")
    )

    def per_key(g: pa.Table) -> pa.Table:
        side = g["asof_side"].to_numpy(zero_copy_only=False)
        t = g[on].to_numpy(zero_copy_only=False)
        # tie rule at equal `on`: allow_exact → right sorts BEFORE left
        # (a simultaneous right row is visible); strict → after
        side_order = (1 - side) if allow_exact else side
        order = np.lexsort((side_order, t))
        side_s = side[order]
        n = len(side_s)
        is_r = side_s == 1
        carry = np.maximum.accumulate(np.where(is_r, np.arange(n), -1))
        left_pos = np.flatnonzero(~is_r)
        src = carry[left_pos]
        has = src >= 0
        gs = g.take(pa.array(order))
        out = {
            key: gs[key].take(pa.array(left_pos)),
            on: gs[on].take(pa.array(left_pos)),
        }
        for c in left_cols:
            out[c] = gs[c].take(pa.array(left_pos))
        r_idx = np.where(has, src, 0)
        for c in right_cols:
            vals = gs[c].take(pa.array(r_idx))
            if not has.all():
                vals = pc.if_else(
                    pa.array(~has), pa.nulls(len(left_pos), types[c]), vals
                )
            out[f"right_{c}"] = vals
        return pa.table(out)

    return both.groupby(key).map_groups(per_key, batch_format="pyarrow")
