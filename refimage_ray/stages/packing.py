"""Sequence packing — assign every document a position in a stream of
fixed token-budget training sequences (context windows).

The operator is a **distributed prefix-sum (scan)**: each doc's global
start offset is the sum of the token lengths of all docs before it in
``doc_id`` order; its containing sequence is ``start // budget``.  The
classic two-pass scan shape keeps it one narrow shuffle at any scale:

1. *Partial pass* — per-batch combiner sums token lengths into K
   order-preserving ``doc_id``-range buckets; a ``groupby(bucket)``
   reduces those partials to K rows, which come to the driver (K is
   chosen, not data-sized — 64 rows for a 10^12-doc corpus is fine).
2. *Offset pass* — exclusive prefix over the K bucket sums gives each
   bucket's global start offset (broadcast via closure capture — K
   ints); ``groupby(bucket).map_groups`` then sorts *within* a bucket
   and cumsums locally, adding the bucket offset.

Partitioning assumption (documented per the build-plan contract): a
bucket is a ``doc_id`` range, so its row count is bounded by the id
density × span — choose ``n_buckets`` ≈ corpus_rows / target_rows to
keep each ``map_groups`` group in worker memory.  Only (doc_id, dl)
pairs — 16 B/row — ever move; the text column never enters the scan.

No reference analog (the reference serves images, not LM training
windows); this is a training-data extension (prompt: "operations a
large-scale training-data pipeline would need").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Max, Min, Sum


def pack_offsets(
    dl_ds: "rd.Dataset",
    budget: int,
    n_buckets: int = 32,
) -> "rd.Dataset":
    """(doc_id:int64, dl:int64) → (doc_id, seq_id, begin_offset,
    n_crossings).

    ``seq_id``       — index of the training sequence holding the
                       doc's FIRST token (``start // budget``).
    ``begin_offset`` — the doc's offset inside that sequence.
    ``n_crossings``  — how many sequence boundaries the doc spans
                       (0 for docs that fit; empty docs cross none).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    # narrow table is consumed twice (bucket sums, then the offset
    # pass) — materialize so upstream tokenize runs once
    dl_ds = dl_ds.materialize()

    bounds = dl_ds.aggregate(Min("doc_id"), Max("doc_id"))
    lo = int(bounds["min(doc_id)"])
    hi = int(bounds["max(doc_id)"])
    span = hi - lo + 1
    nb = max(1, min(int(n_buckets), span))

    def add_bucket(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # order-preserving range bucket; int64-safe for 63-bit ids
        # (divide FIRST — the build's salting overflow lesson)
        bucket = ((ids - lo) // -(-span // nb)).astype(np.int64)
        return b.append_column("bucket", pa.array(bucket, pa.int64()))

    with_bucket = dl_ds.map_batches(add_bucket, batch_format="pyarrow")

    # pass 1: K-row reduction of per-bucket token sums
    sums_tbl = (
        with_bucket.select_columns(["bucket", "dl"])
        .groupby("bucket")
        .aggregate(Sum("dl", alias_name="bucket_tokens"))
        .take_all()
    )
    per_bucket = np.zeros(nb, np.int64)
    for row in sums_tbl:
        per_bucket[int(row["bucket"])] = int(row["bucket_tokens"])
    # exclusive prefix → each bucket's global start offset (K ints,
    # captured by closure — broadcast once with the task definition)
    bucket_start = np.concatenate(([0], np.cumsum(per_bucket)[:-1]))

    def scan_group(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dl = g["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids, dl = ids[order], dl[order]
        bkt = int(g["bucket"][0].as_py())
        start = bucket_start[bkt] + np.concatenate(([0], np.cumsum(dl)[:-1]))
        seq_id = start // budget
        begin = start - seq_id * budget
        last = np.where(dl > 0, (start + dl - 1) // budget, seq_id)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "seq_id": pa.array(seq_id, pa.int64()),
                "begin_offset": pa.array(begin, pa.int64()),
                "n_crossings": pa.array(last - seq_id, pa.int64()),
            }
        )

    return with_bucket.groupby("bucket").map_groups(
        scan_group, batch_format="pyarrow"
    )
