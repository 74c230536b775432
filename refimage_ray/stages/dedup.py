"""Exact deduplication — hash-partition + per-group first.

Reference analog: the ``file_hash TEXT UNIQUE`` constraint; a duplicate
upload raises IntegrityError → HTTP 409 "Duplicate image detected"
(``/root/reference/src/refimage/storage.py:89,278-281``,
``api.py:866-877``).  Distributed re-expression: no shared mutable
uniqueness index — a ``groupby(content_hash)`` hash shuffle co-locates
duplicates, and each group keeps its first row by a deterministic
order.  SURVEY.md §2.7 D1.

SQL oracle shape (DuckDB)::

    SELECT ... QUALIFY row_number() OVER
        (PARTITION BY md5(text) ORDER BY <order_col>) = 1
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data

from refimage_ray.functions.hashing import md5_string_array


def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized md5 content hash (matches DuckDB ``md5()``)."""
    if "content_hash" in batch.column_names:
        return batch
    return batch.append_column("content_hash", md5_string_array(batch[text_col]))


def exact_dedup(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    order_col: str = "url",
    keep_hash: bool = True,
) -> "ray.data.Dataset":
    """Collapse rows with identical ``text_col`` to the first by ``order_col``.

    One all-to-all shuffle on the content hash; group sizes are tiny
    (dup cardinality), so no skew handling is needed here.
    """
    hashed = ds.map_batches(
        lambda b: add_content_hash(b, text_col), batch_format="pyarrow"
    )

    def first_row(group: pd.DataFrame) -> pd.DataFrame:
        out = group.sort_values(order_col, kind="mergesort").head(1)
        return out if keep_hash else out.drop(columns=["content_hash"])

    return hashed.groupby("content_hash").map_groups(first_row, batch_format="pandas")
