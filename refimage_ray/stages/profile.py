"""Table profiling — per-column data-quality statistics (Deequ /
Great-Expectations shape): row count, null count, exact distinct
count, numeric min/max/mean.

Two narrow passes, neither ships table payloads twice:

- **stats pass** — one partial row per (column, block): counts, null
  counts, numeric min/max/sum.  The driver folds the tiny partial
  table (blocks × columns rows).
- **distinct pass** — per-batch ``np.unique`` emits each block's
  unique 64-bit value keys per column (floats by bit pattern, ints by
  value, strings by md5), then two narrow groupbys count exact global
  distincts.  The exchange is per-block-unique keys, not rows — the
  same pre-aggregation discipline as ``term_df``.

Reference analog: the storage stats rollup
(``/root/reference/src/refimage/storage.py:714-745``), generalized to
arbitrary columns of arbitrary tables.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from refimage_ray.functions.hashing import md5_halves_string_array


def _value_keys(
    col: pa.ChunkedArray | pa.Array,
) -> tuple[np.ndarray, np.ndarray]:
    """128-bit equality keys (hi, lo u64 halves) of the non-null values
    of a column.  Numerics key by canonicalized value bits with lo=0
    (-0.0 folds to 0.0 and every NaN payload to one NaN, matching SQL
    DISTINCT); strings carry BOTH md5 halves — the repo-wide 128-bit
    discipline, since a 64-bit key undercounts ~10^9-distinct string
    columns via birthday collisions."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.drop_null()
    zero = np.zeros(len(col), dtype=np.uint64)
    if len(col) == 0:
        return zero, zero
    t = col.type
    if pa.types.is_integer(t):
        hi = col.to_numpy(zero_copy_only=False).astype(np.int64).view(
            np.uint64
        )
        return hi, zero
    if pa.types.is_floating(t):
        v = col.to_numpy(zero_copy_only=False).astype(np.float64).copy()
        v[v == 0.0] = 0.0  # -0.0 == 0.0 → one canonical bit pattern
        v[np.isnan(v)] = np.nan  # one canonical NaN payload
        return v.view(np.uint64), zero
    if pa.types.is_timestamp(t):
        hi = col.cast(pa.int64()).to_numpy(zero_copy_only=False).view(
            np.uint64
        )
        return hi, zero
    h, l = md5_halves_string_array(col.cast(pa.string()))
    return np.asarray(h, dtype=np.uint64), np.asarray(l, dtype=np.uint64)


def profile_table(ds, columns: list[str]) -> pa.Table:
    """Profile ``columns`` of a Dataset: one output row per column with
    ``(column, n_rows, n_null, n_distinct, min_num, max_num, mean)``;
    the numeric stats are null for non-numeric columns.  ``mean`` is
    rounded to 6 decimals (SQL-oracle float discipline)."""
    from ray.data.aggregate import Count

    cols = list(columns)

    def stats_partials(b: pa.Table) -> pa.Table:
        rows = {
            "column": [], "n": [], "n_null": [],
            "min_num": [], "max_num": [], "sum_num": [],
        }
        for c in cols:
            col = b[c]
            rows["column"].append(c)
            rows["n"].append(b.num_rows)
            rows["n_null"].append(col.null_count)
            t = col.type
            numeric = (
                pa.types.is_integer(t)
                or pa.types.is_floating(t)
            )
            if numeric and b.num_rows > col.null_count:
                v = col.combine_chunks().drop_null().to_numpy(
                    zero_copy_only=False
                ).astype(np.float64)
                rows["min_num"].append(float(v.min()))
                rows["max_num"].append(float(v.max()))
                rows["sum_num"].append(float(v.sum()))
            else:
                rows["min_num"].append(None)
                rows["max_num"].append(None)
                rows["sum_num"].append(None)
        return pa.table(
            {
                "column": pa.array(rows["column"], pa.string()),
                "n": pa.array(rows["n"], pa.int64()),
                "n_null": pa.array(rows["n_null"], pa.int64()),
                "min_num": pa.array(rows["min_num"], pa.float64()),
                "max_num": pa.array(rows["max_num"], pa.float64()),
                "sum_num": pa.array(rows["sum_num"], pa.float64()),
            }
        )

    part = ds.map_batches(stats_partials, batch_format="pyarrow").to_pandas()
    # canonical content order before the float fold — block arrival
    # order must not change the mean's summation order
    part = part.sort_values(
        ["column", "n", "n_null", "min_num", "max_num", "sum_num"],
        kind="mergesort",
    )

    def uniq_partials(b: pa.Table) -> pa.Table:
        ks_hi, ks_lo, cs = [], [], []
        for ci, c in enumerate(cols):
            hi, lo = _value_keys(b[c])
            pairs = np.unique(np.stack([hi, lo], axis=1), axis=0)
            ks_hi.append(pairs[:, 0])
            ks_lo.append(pairs[:, 1])
            cs.append(np.full(len(pairs), ci, dtype=np.int64))
        hi = np.concatenate(ks_hi) if ks_hi else np.zeros(0, np.uint64)
        lo = np.concatenate(ks_lo) if ks_lo else np.zeros(0, np.uint64)
        return pa.table(
            {
                "col_id": pa.array(
                    np.concatenate(cs) if cs else np.zeros(0, np.int64),
                    pa.int64(),
                ),
                "vkey_hi": pa.array(hi.view(np.int64), pa.int64()),
                "vkey_lo": pa.array(lo.view(np.int64), pa.int64()),
            }
        )

    dcount = (
        ds.map_batches(uniq_partials, batch_format="pyarrow")
        .groupby(["col_id", "vkey_hi", "vkey_lo"])
        .aggregate(Count(alias_name="_k"))
        .groupby("col_id")
        .aggregate(Count(alias_name="n_distinct"))
        .to_pandas()
    )
    distinct = dict(
        zip(dcount["col_id"].astype(int), dcount["n_distinct"].astype(int))
    )

    g = part.groupby("column", sort=False)
    agg = g.agg(
        n=("n", "sum"),
        n_null=("n_null", "sum"),
        min_num=("min_num", "min"),
        max_num=("max_num", "max"),
        sum_num=("sum_num", "sum"),
    )
    all_null = g["min_num"].apply(lambda s: s.isna().all())
    out = {
        "column": [], "n_rows": [], "n_null": [], "n_distinct": [],
        "min_num": [], "max_num": [], "mean": [],
    }
    for ci, c in enumerate(cols):
        r = agg.loc[c]
        out["column"].append(c)
        out["n_rows"].append(int(r["n"]))
        out["n_null"].append(int(r["n_null"]))
        out["n_distinct"].append(distinct.get(ci, 0))
        if all_null.loc[c]:
            out["min_num"].append(None)
            out["max_num"].append(None)
            out["mean"].append(None)
        else:
            nv = int(r["n"]) - int(r["n_null"])
            out["min_num"].append(float(r["min_num"]))
            out["max_num"].append(float(r["max_num"]))
            out["mean"].append(round(float(r["sum_num"]) / nv, 6))
    return pa.table(
        {
            "column": pa.array(out["column"], pa.string()),
            "n_rows": pa.array(out["n_rows"], pa.int64()),
            "n_null": pa.array(out["n_null"], pa.int64()),
            "n_distinct": pa.array(out["n_distinct"], pa.int64()),
            "min_num": pa.array(out["min_num"], pa.float64()),
            "max_num": pa.array(out["max_num"], pa.float64()),
            "mean": pa.array(out["mean"], pa.float64()),
        }
    )
