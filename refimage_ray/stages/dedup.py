"""Exact deduplication — hash-bucket partition + vectorized keep-first.

Reference analog: the ``file_hash TEXT UNIQUE`` constraint; a duplicate
upload raises IntegrityError → HTTP 409 "Duplicate image detected"
(``/root/reference/src/refimage/storage.py:89,278-281``,
``api.py:866-877``).  Distributed re-expression: no shared mutable
uniqueness index — a shuffle on ``bucket = blake2b64(content_hash) % B``
co-locates duplicates (equal hashes share a bucket), and each bucket
drops duplicates **vectorized** (one pandas ``drop_duplicates`` per
bucket, NOT one Python call per group — with n_docs groups that
per-group overhead dominated the whole build).  SURVEY.md §2.7 D1.

SQL oracle shape (DuckDB)::

    SELECT ... QUALIFY row_number() OVER
        (PARTITION BY md5(text) ORDER BY <order_col>) = 1
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from refimage_ray.functions.hashing import hash_string_array, md5_string_array


def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized md5 content hash (matches DuckDB ``md5()``) plus BOTH
    64-bit numeric halves ``content_key``/``content_key2`` — staged so
    the dedup loser scan later reads 24 bytes of numerics per row
    instead of parsing hex strings, while still comparing the FULL
    128-bit digest (prefix-only comparison would merge distinct texts
    colliding in the first 16 hex chars)."""
    from refimage_ray.functions.hashing import hex_prefix_u64, hex_suffix_u64

    if "content_hash" not in batch.column_names:
        batch = batch.append_column(
            "content_hash", md5_string_array(batch[text_col])
        )
    if "content_key" not in batch.column_names:
        batch = batch.append_column(
            "content_key",
            pa.array(hex_prefix_u64(batch["content_hash"]), pa.uint64()),
        )
    if "content_key2" not in batch.column_names:
        batch = batch.append_column(
            "content_key2",
            pa.array(hex_suffix_u64(batch["content_hash"]), pa.uint64()),
        )
    return batch


def _add_bucket(batch: pa.Table, text_col: str, buckets: int) -> pa.Table:
    b = add_content_hash(batch, text_col)
    bucket = (hash_string_array(b["content_hash"]) % np.uint64(buckets)).astype(
        np.int64
    )
    return b.append_column("dedup_bucket", pa.array(bucket, pa.int64()))


def exact_dedup(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    order_col: str = "url",
    keep_hash: bool = True,
    buckets: int = 64,
) -> "ray.data.Dataset":
    """Collapse rows with identical ``text_col`` to the first by
    ``order_col``.  One shuffle on the hash bucket; ``B`` vectorized
    reducers (size B ≈ 4× cores at scale)."""
    bucketed = ds.map_batches(
        lambda b: _add_bucket(b, text_col, buckets), batch_format="pyarrow"
    )

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["content_hash", order_col], kind="mergesort")
        g = g.drop_duplicates("content_hash", keep="first")
        drop = ["dedup_bucket"] + ([] if keep_hash else ["content_hash"])
        return g.drop(columns=drop)

    return bucketed.groupby("dedup_bucket").map_groups(
        dedup_bucket, batch_format="pandas"
    )


def find_dup_losers(
    docs_dir: str,
    buckets: int = 64,
    order_col: str = "url",
) -> np.ndarray:
    """Exact-dedup via SMALL-COLUMN shuffle: return the doc_ids to DROP.

    Reads only ``(doc_id, content_hash)`` from the staged docs parquet
    (columnar prune — the text never moves), buckets by a vectorized
    64-bit content key, and per bucket keeps the min-``doc_id`` row of
    each key group; every other row is a "loser".  Downstream passes
    exclude losers with a broadcast ``np.isin`` filter — so exact
    dedup costs one narrow shuffle + a broadcast set instead of an
    all-to-all exchange of the full corpus.

    Scale note: the loser set is ~(dup_rate · N) ids.  For high-dup
    web corpora where that outgrows a broadcast array, swap the exact
    set for a Bloom filter (false positives drop extra docs —
    acceptable for dedup) or fall back to
    :func:`dedup_and_assign_ids` (full shuffle, exact).
    """
    import pyarrow.parquet as _pq

    import ray.data as rd

    from refimage_ray.functions.hashing import hex_prefix_u64, hex_suffix_u64

    schema_names = _pq.ParquetDataset(docs_dir).schema.names
    has_keys = "content_key" in schema_names and "content_key2" in schema_names
    cols = (
        ["doc_id", "content_key", "content_key2"]
        if has_keys
        else ["doc_id", "content_hash"]
    )

    def to_keys(b: pa.Table) -> pa.Table:
        # winner = min doc_id per FULL 128-bit content key, carried as
        # two u64 halves (numeric, deterministic) — comparing the
        # prefix alone would silently merge distinct texts that collide
        # in the first 16 hex chars.  Reads the staged numeric halves
        # when present (24 B/row) instead of hex strings.
        from refimage_ray.functions.packexchange import pack_by_bucket

        if has_keys:
            key = b["content_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
            key2 = b["content_key2"].to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            key = hex_prefix_u64(b["content_hash"])
            key2 = hex_suffix_u64(b["content_hash"])
        # packed exchange (functions/packexchange.py): one binary row
        # per (batch, bucket) — the groupby otherwise sorts one tiny
        # row per DOC, which dominates the narrow dedup pass at scale
        return pack_by_bucket(
            (key % np.uint64(buckets)).astype(np.int64),
            {
                "doc_id": b["doc_id"].to_numpy(
                    zero_copy_only=False).astype(np.int64),
                "ckey": key,
                "ckey2": key2,
            },
            bucket_col="dedup_bucket",
        )

    pairs = rd.read_parquet(docs_dir, columns=cols).map_batches(
        to_keys, batch_format="pyarrow"
    )

    def losers(g: pa.Table) -> pa.Table:
        from refimage_ray.functions.packexchange import unpack_group

        if g.num_rows == 0:
            return pa.schema([("doc_id", pa.int64())]).empty_table()
        a = unpack_group(
            g, {"doc_id": np.int64, "ckey": np.uint64, "ckey2": np.uint64}
        )
        ids, keys, keys2 = a["doc_id"], a["ckey"], a["ckey2"]
        order = np.lexsort((ids, keys2, keys))
        dup = np.zeros(len(ids), dtype=bool)
        dup[1:] = (keys[order][1:] == keys[order][:-1]) & (
            keys2[order][1:] == keys2[order][:-1]
        )
        return pa.table({"doc_id": pa.array(ids[order][dup], pa.int64())})

    out = pairs.groupby("dedup_bucket").map_groups(losers, batch_format="pyarrow")
    from refimage_ray.stages.dedup_near import collect_small

    tbl = collect_small(out, pa.schema([("doc_id", pa.int64())]))
    ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
    return np.sort(ids.astype(np.int64))


class BloomFilter:
    """Vectorized Bloom filter over int64 ids — the broadcast loser set
    for HIGH-dup corpora where the exact sorted array outgrows a
    broadcast (``find_dup_losers`` scale note).

    Deterministic (fixed double-hashing constants), no false negatives
    (every true loser is dropped); false positives drop extra docs at
    rate ``fp_rate`` — acceptable for dedup, never for joins.  Probe
    and build are fully vectorized (k ≤ ~10 numpy passes).
    """

    _A = np.uint64(0x9E3779B97F4A7C15)
    _B = np.uint64(0xC2B2AE3D27D4EB4F)

    def __init__(self, n_items: int, fp_rate: float = 1e-4) -> None:
        import math

        n = max(1, int(n_items))
        m = int(math.ceil(-n * math.log(fp_rate) / (math.log(2.0) ** 2)))
        self.m = max(64, (m + 63) // 64 * 64)  # round to u64 words
        self.k = max(1, int(round(self.m / n * math.log(2.0))))
        self.bits = np.zeros(self.m // 64, dtype=np.uint64)

    def _idx(self, ids: np.ndarray, i: int) -> np.ndarray:
        x = ids.astype(np.uint64)
        h1 = x * self._A
        h2 = (x * self._B) | np.uint64(1)
        return (h1 + np.uint64(i) * h2) % np.uint64(self.m)

    def add_many(self, ids: np.ndarray) -> None:
        for i in range(self.k):
            pos = self._idx(ids, i)
            np.bitwise_or.at(
                self.bits, (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )

    def contains_many(self, ids: np.ndarray) -> np.ndarray:
        out = np.ones(len(ids), dtype=bool)
        for i in range(self.k):
            pos = self._idx(ids, i)
            word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
            out &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
        return out

    @classmethod
    def from_array(cls, ids: np.ndarray, fp_rate: float = 1e-4) -> "BloomFilter":
        bf = cls(len(ids), fp_rate)
        bf.add_many(np.asarray(ids, dtype=np.int64))
        return bf


def dedup_and_assign_ids(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    order_col: str = "url",
    *,
    buckets: int = 64,
    stride: int = 1 << 32,
) -> "ray.data.Dataset":
    """Fused exact-dedup + deterministic doc_id assignment — ONE shuffle.

    Partition on ``blake2b64(content_hash) % B`` (duplicates co-locate),
    then per bucket: vectorized keep-first-by-``order_col``, sort by
    ``order_col``, assign ``doc_id = bucket * stride + local_rank``.
    Deterministic because the partition function, the dedup winner and
    the within-bucket order are all pure functions of row content.
    Strided-dense ids (dense within bucket) keep posting-list deltas
    small; documented assumption: ≤ ``stride`` docs per bucket.
    """
    bucketed = ds.map_batches(
        lambda b: _add_bucket(b, text_col, buckets), batch_format="pyarrow"
    )

    def dedup_enumerate(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["content_hash", order_col], kind="mergesort")
        g = g.drop_duplicates("content_hash", keep="first")
        # content_hash as tiebreak: two DIFFERENT texts under one url
        # must still rank deterministically (arrival order is not)
        g = g.sort_values([order_col, "content_hash"],
                          kind="mergesort").reset_index(drop=True)
        base = int(g["dedup_bucket"].iloc[0]) * stride
        g.insert(0, "doc_id", base + np.arange(len(g), dtype=np.int64))
        return g.drop(columns=["dedup_bucket"])

    return bucketed.groupby("dedup_bucket").map_groups(
        dedup_enumerate, batch_format="pandas"
    )


def dedup_against_index(
    new_docs_ds: "ray.data.Dataset",
    index_dir: str,
    *,
    method: str = "exact",
    text_col: str = "text",
    order_col: str = "doc_id",
    fp_rate: float = 1e-4,
) -> "ray.data.Dataset":
    """Cross-crawl exact dedup — the incremental-ingest companion of
    ``lifecycle.add_documents``: drop delta docs whose content already
    exists among the artifact's LIVE docs ("existing corpus wins"),
    then exact-dedup within the delta itself.

    The existing side never rescans text: ``docs/`` already stages the
    md5 halves (``content_key``/``content_key2``), so only 16 B/doc of
    numerics leave storage — the same narrow side-pass class as the
    loser scan.  Dead ids (tombstones ∪ losers) are excluded from the
    basis, but note dropping losers cannot lose hashes (each loser's
    winner carries the same content).  The hash set broadcasts once
    (``ray.put``); the delta filter is a vectorized double binary
    search per batch against the (hi, lo)-lexsorted halves.

    ``method="bloom"`` swaps the broadcast array for a Bloom filter
    over the xor-combined halves (no false negatives — a true dup has
    the same xor; false positives drop extra delta docs at
    ``fp_rate``) — the >broadcast-budget path for multi-billion-doc
    bases.
    """
    import pyarrow.parquet as _pq
    import ray

    from refimage_ray.functions.arrays import sorted_membership
    from refimage_ray.index.lifecycle import _dead_ids

    if method not in ("exact", "bloom"):
        raise ValueError(f"method must be 'exact' or 'bloom', got {method!r}")
    docs_dir = os.path.join(index_dir, "docs")
    from refimage_ray.functions.hashing import hex_prefix_u64, hex_suffix_u64

    staged = set(_pq.ParquetDataset(docs_dir).schema.names)
    if {"content_key", "content_key2"} <= staged:
        t = _pq.read_table(
            docs_dir, columns=["doc_id", "content_key", "content_key2"]
        )
        hi = t["content_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        lo = t["content_key2"].to_numpy(zero_copy_only=False).astype(np.uint64)
    elif "content_hash" in staged:
        t = _pq.read_table(docs_dir, columns=["doc_id", "content_hash"])
        hi = hex_prefix_u64(t["content_hash"])
        lo = hex_suffix_u64(t["content_hash"])
    else:
        # legacy artifact without staged hashes: one text read (build
        # with dedup_exact=True to stage the 16 B/doc halves instead)
        t = _pq.read_table(docs_dir, columns=["doc_id", text_col])
        h = md5_string_array(t[text_col])
        hi, lo = hex_prefix_u64(h), hex_suffix_u64(h)
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    dead = _dead_ids(index_dir)
    if len(dead):
        live = ~sorted_membership(dead, ids)
        hi, lo = hi[live], lo[live]

    if method == "bloom":
        bloom = BloomFilter.from_array(
            (hi ^ lo).view(np.int64), fp_rate=fp_rate
        )
        probe_ref = ray.put(bloom)

        def cross_filter(b: pa.Table) -> pa.Table:
            b = add_content_hash(b, text_col)
            bh = b["content_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
            bl = b["content_key2"].to_numpy(zero_copy_only=False).astype(np.uint64)
            seen = ray.get(probe_ref).contains_many((bh ^ bl).view(np.int64))
            return b.filter(pa.array(~seen))
    else:
        from refimage_ray.functions.arrays import sorted_pair_membership

        order = np.lexsort((lo, hi))
        ehi_ref = ray.put(hi[order])
        elo_ref = ray.put(lo[order])

        def cross_filter(b: pa.Table) -> pa.Table:
            b = add_content_hash(b, text_col)
            ehi, elo = ray.get(ehi_ref), ray.get(elo_ref)
            bh = b["content_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
            bl = b["content_key2"].to_numpy(zero_copy_only=False).astype(np.uint64)
            member = sorted_pair_membership(ehi, elo, bh, bl)
            return b.filter(pa.array(~member))

    survivors = new_docs_ds.map_batches(cross_filter, batch_format="pyarrow")
    return exact_dedup(survivors, text_col=text_col, order_col=order_col)
