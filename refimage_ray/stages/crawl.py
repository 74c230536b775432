"""Crawl-snapshot delta: diff two crawls of the same key space.

Incremental web pipelines need to know, between crawl N and crawl N+1,
which pages appeared, vanished, or changed content — that drives
incremental index adds (``lifecycle.add_documents`` /
``dedup_against_index``), retention deletes, and re-embedding queues.

Distributed shape: each side is reduced to (key, md5-halves, side) —
16 B of content fingerprint per row, the page text never shuffles —
then ONE narrow bucketed groupby adjudicates each key:

  - ``added``     — key only in the new crawl
  - ``removed``   — key only in the old crawl
  - ``changed``   — key in both, content fingerprint differs
  - ``unchanged`` — key in both, fingerprint equal (full 128-bit)

Keys must be unique within each snapshot (run
``training.url_latest_snapshot`` first when a crawl carries multiple
fetches of one url).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from refimage_ray.functions.hashing import (
    md5_halves_string_array,
    md5_u64_string_array,
)

STATUSES = ("added", "changed", "removed", "unchanged")


def _key_bucket(key: pa.Array | pa.ChunkedArray, buckets: int) -> np.ndarray:
    """Shuffle bucket of a key column — direct modulo for integer keys,
    md5-u64 for strings (both deterministic across runs/layouts)."""
    if pa.types.is_integer(key.type):
        k = key.to_numpy(zero_copy_only=False).astype(np.int64)
        return np.abs(k) % buckets
    return (md5_u64_string_array(key) % np.uint64(buckets)).astype(np.int64)


def crawl_delta(
    old_ds,
    new_ds,
    *,
    key_col: str = "url",
    content_col: str = "text",
    buckets: int = 64,
):
    """Per-key snapshot diff: Dataset of ``(key, status)`` rows."""

    def to_keys(side: int):
        def fn(b: pa.Table) -> pa.Table:
            hi, lo = md5_halves_string_array(
                pc.fill_null(b[content_col], "")
            )
            return pa.table(
                {
                    key_col: b[key_col],
                    "chash_hi": pa.array(hi.view(np.int64), pa.int64()),
                    "chash_lo": pa.array(lo.view(np.int64), pa.int64()),
                    "side": pa.array(
                        np.full(b.num_rows, side, dtype=np.int64), pa.int64()
                    ),
                    "delta_bucket": pa.array(
                        _key_bucket(b[key_col], buckets), pa.int64()
                    ),
                }
            )

        return fn

    tagged = old_ds.map_batches(
        to_keys(0), batch_format="pyarrow"
    ).union(new_ds.map_batches(to_keys(1), batch_format="pyarrow"))

    def adjudicate(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0]
        n = g[g["side"] == 1]
        m = o.merge(
            n, on=key_col, how="outer", suffixes=("_o", "_n"),
            indicator=True,
        )
        status = np.select(
            [
                m["_merge"] == "left_only",
                m["_merge"] == "right_only",
                (m["chash_hi_o"] == m["chash_hi_n"])
                & (m["chash_lo_o"] == m["chash_lo_n"]),
            ],
            ["removed", "added", "unchanged"],
            default="changed",
        )
        return pd.DataFrame({key_col: m[key_col], "status": status})

    return (
        tagged.groupby("delta_bucket")
        .map_groups(adjudicate, batch_format="pandas")
    )


def crawl_delta_stats(old_ds, new_ds, **kwargs) -> pa.Table:
    """Summary counts per status (all four statuses present, zeros
    included — a stable 4-row schema for dashboards/oracles)."""
    from ray.data.aggregate import Count

    delta = crawl_delta(old_ds, new_ds, **kwargs)
    agg = delta.groupby("status").aggregate(Count(alias_name="n")).to_pandas()
    counts = dict(zip(agg["status"], agg["n"].astype(int)))
    return pa.table(
        {
            "status": pa.array(list(STATUSES), pa.string()),
            "n": pa.array([counts.get(s, 0) for s in STATUSES], pa.int64()),
        }
    )
