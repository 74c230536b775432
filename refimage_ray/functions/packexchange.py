"""Packed-exchange helpers — the repo-wide remedy for row-granular
groupby exchanges.

A ``groupby(key)`` over millions of tiny fixed-width rows spends its
wall time in the exchange's per-row sort machinery, not in compute
(measured: 27× on the dup-gram pass, 45× on the MinHash LSH join).
The discipline, first built for the index shuffle (``index/pack.py``):

1. map side — each batch groups its rows by a coarse hash bucket and
   emits ONE row per bucket, with every numeric column packed into a
   raw little-endian byte string (``ndarray.tobytes()``);
2. the exchange moves ~``buckets`` fat rows per batch instead of one
   row per record;
3. reduce side — the per-bucket group concatenates and decodes each
   column with ``np.frombuffer`` (zero-copy) and aggregates with
   numpy (lexsort + reduceat, boundary masks …).

Used by ``stages/spans.py`` (dup-gram discovery), ``stages/
dedup_near.py`` (LSH band join + pair dedup), ``stages/lines.py``
(segment frequency).  Columns must be fixed-width numerics; callers
pass the dtype per column (uint64 hash halves travel as their own
bytes and come back bit-identical).

This module also hosts the repo's SMALL-RESULT collection helpers
(:func:`collect_small` / :func:`collect_small_pandas`): this Ray
version's ``Dataset.to_pandas()`` returns a ZERO-COLUMN frame for a
fully-empty Dataset (it loses the schema), so every collector of a
possibly-empty reduced result must rebuild the expected columns from a
caller-supplied Arrow schema.  New call sites must use these helpers
instead of hand-rolling the empty branch (a lint test enforces it).
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa

# Packed rows ship raw ``ndarray.tobytes()`` across nodes and decode
# with native-order ``np.frombuffer``; a mixed-endianness cluster would
# silently corrupt every packed stage, so fail loudly at import.
if sys.byteorder != "little":  # pragma: no cover - x86/arm64 are little
    raise ImportError(
        "packed exchanges assume little-endian hosts; this host is "
        f"{sys.byteorder}-endian — packing/unpacking would corrupt data"
    )


def pack_by_bucket(
    bucket: np.ndarray,
    cols: "dict[str, np.ndarray]",
    *,
    bucket_col: str = "bucket",
) -> pa.Table:
    """Group fixed-width numeric columns by ``bucket`` and emit one
    packed binary row per distinct bucket value present.

    One stable argsort + run-boundary split (O(n log n + n·cols)),
    NOT a per-bucket boolean mask scan — this runs on the map-side
    hot path of every packed exchange."""
    order = np.argsort(bucket, kind="stable")
    sb = bucket[order]
    n = len(sb)
    if n == 0:
        return packed_empty(list(cols), bucket_col=bucket_col)
    change = np.ones(n, dtype=bool)
    change[1:] = sb[1:] != sb[:-1]
    bounds = np.flatnonzero(change)
    ends = np.append(bounds[1:], n)
    gathered = {c: arr[order] for c, arr in cols.items()}
    return pa.table({
        bucket_col: pa.array([int(v) for v in sb[bounds]], pa.int64()),
        **{
            c: pa.array(
                [g[lo:hi].tobytes() for lo, hi in zip(bounds, ends)],
                pa.binary(),
            )
            for c, g in gathered.items()
        },
    })


def packed_empty(cols: "list[str]", *, bucket_col: str = "bucket") -> pa.Table:
    """Typed empty table matching :func:`pack_by_bucket`'s layout —
    the empty-batch branch every packed map fn must return (mixed
    block schemas break the downstream groupby)."""
    return pa.schema(
        [(bucket_col, pa.int64())] + [(c, pa.binary()) for c in cols]
    ).empty_table()


def unpack_group(
    g: pa.Table, dtypes: "dict[str, np.dtype | type]"
) -> "dict[str, np.ndarray]":
    """Concatenate and decode one reduce group's packed columns."""
    return {
        c: np.frombuffer(b"".join(g[c].to_pylist()), dtype=dt)
        for c, dt in dtypes.items()
    }


def collect_small(ds, schema: pa.Schema) -> pa.Table:
    """Materialize a SMALL result Dataset into one Arrow table with
    ``schema`` — including when the Dataset is fully empty (where
    ``to_pandas()`` would lose the schema).

    Deliberately avoids ``Dataset.to_pandas`` so pipelines can assert
    (by poisoning ``to_pandas`` in tests) that no stage materializes a
    LARGE dataset on the driver — only final, already-reduced results
    pass through here."""
    import pandas as pd
    import ray as _ray

    blocks = _ray.get(ds.to_arrow_refs())
    tables = []
    for t in blocks:
        # to_arrow_refs hands back raw blocks: pandas-backed ones
        # arrive as DataFrames
        if isinstance(t, pd.DataFrame):
            t = pa.Table.from_pandas(t, preserve_index=False)
        if t.num_rows:
            tables.append(t)
    if not tables:
        return schema.empty_table()
    return pa.concat_tables(
        [t.select(schema.names).cast(schema) for t in tables]
    ).combine_chunks()


def collect_small_pandas(ds, schema: pa.Schema):
    """:func:`collect_small` as a typed pandas frame (columns present
    and correctly dtyped even for a fully-empty result)."""
    return collect_small(ds, schema).to_pandas()


_GOLD = np.uint64(0x9E3779B97F4A7C15)


def pack_pairs_distinct(
    a: np.ndarray,
    b: np.ndarray,
    extra: "dict[str, np.ndarray] | None" = None,
    *,
    buckets: int,
) -> pa.Table:
    """Within-task distinct (a, b) pairs → packed rows keyed by a
    pair-hash bucket.

    The shared tail of every packed candidate-pair stage (MinHash LSH,
    SimHash): a pair recurs across a task's key runs, so dedup locally
    first (keeping the FIRST occurrence's ``extra`` values — callers
    pass only pure functions of the pair, e.g. hamming distance), then
    pack per ``hash(a, b) % buckets`` so cross-task duplicates of the
    same pair still co-locate in the next exchange."""
    extra = extra or {}
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    extra = {c: v[order] for c, v in extra.items()}
    keep = np.ones(len(a), dtype=bool)
    keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    a, b = a[keep], b[keep]
    extra = {c: v[keep] for c, v in extra.items()}
    pb = ((a.view(np.uint64) * _GOLD) ^ b.view(np.uint64)) % np.uint64(buckets)
    return pack_by_bucket(
        pb.astype(np.int64), {"a": a, "b": b, **extra},
        bucket_col="pair_bucket",
    )


def unpack_pairs_distinct(
    g: pa.Table, extra_dtypes: "dict | None" = None
) -> "dict[str, np.ndarray]":
    """Per-bucket reducer half of :func:`pack_pairs_distinct`: decode,
    globally distinct on (a, b) keeping first occurrence."""
    dtypes = {"a": np.int64, "b": np.int64, **(extra_dtypes or {})}
    arrs = unpack_group(g, dtypes)
    a, b = arrs["a"], arrs["b"]
    order = np.lexsort((b, a))
    keep = np.ones(len(a), dtype=bool)
    sa, sb = a[order], b[order]
    keep[1:] = (sa[1:] != sa[:-1]) | (sb[1:] != sb[:-1])
    return {c: v[order][keep] for c, v in arrs.items()}
