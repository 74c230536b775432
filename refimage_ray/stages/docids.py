"""Deterministic doc_id assignment.

Reference analog: ``uuid4()`` primary keys
(``/root/reference/src/refimage/storage.py:211-214``) — which we must
NOT copy: random ids would break resumability and rank-identity
(SURVEY.md §2.8 F7).  Instead: **strided-dense deterministic ids** —

    part     = blake2b64(url) % D
    doc_id   = part * stride + rank(url within part)

One hash shuffle on ``url``; no global barrier, no driver-side
enumeration.  Ids are dense within each partition and strictly
increasing with (part, url), so posting-list delta encoding stays
small (runs of consecutive ids) while the assignment is reproducible
row-for-row across reruns, resumes and cluster sizes.  A globally
dense assignment would need a second (tiny) pass to exchange partition
counts; the stride variant trades ~32 wasted id bits for one fewer
barrier — documented partitioning assumption: at most ``stride`` docs
per url-partition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from refimage_ray.config import DEFAULT_CONFIG, EngineConfig
from refimage_ray.functions.hashing import hash_string_array


def add_url_hash_ids(batch: pa.Table, key_col: str = "url") -> pa.Table:
    """Pure-function doc ids: ``doc_id = blake2b64(url) >> 1`` (63-bit).

    Zero-shuffle assignment — the id is computable anywhere from the
    row itself, which is what lets exact dedup run as a small-column
    side pass (see ``stages/dedup.find_dup_losers``) instead of a
    full-corpus exchange.  Trade-off vs strided-dense ids
    (:func:`assign_doc_ids`): posting-list deltas average
    ``2^63 / N`` (≈4 varbyte bytes at 10^12 docs) instead of ~1-2, and
    collisions are theoretically possible (expected ~50 at 10^12 docs;
    negligible below 10^9 — verify with a count-distinct when it
    matters).
    """
    ids = (hash_string_array(batch[key_col]) >> np.uint64(1)).astype(np.int64)
    if "doc_id" in batch.column_names:
        batch = batch.drop_columns(["doc_id"])
    return batch.append_column("doc_id", pa.array(ids, pa.int64()))


def _add_part(batch: pa.Table, key_col: str, d: int) -> pa.Table:
    part = (hash_string_array(batch[key_col]) % np.uint64(d)).astype(np.int64)
    return batch.append_column("docid_part", pa.array(part, pa.int64()))


def assign_doc_ids(
    ds: "ray.data.Dataset",
    key_col: str = "url",
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> "ray.data.Dataset":
    """Attach a deterministic ``doc_id`` column (drops helper columns)."""
    d, stride = cfg.docid_partitions, cfg.docid_stride

    withpart = ds.map_batches(
        lambda b: _add_part(b, key_col, d), batch_format="pyarrow"
    )

    def enumerate_group(group: pd.DataFrame) -> pd.DataFrame:
        # rows sharing a url (re-crawls of the same page) need a
        # DETERMINISTIC tiebreak — mergesort alone would preserve Ray's
        # nondeterministic block-arrival order, so a rerun could swap
        # their ids and break the reproducible-row-for-row contract
        keys = [key_col]
        if group[key_col].duplicated().any():
            for extra in ("content_hash", "warc_ts", "text"):
                if extra in group.columns:
                    group["_docid_tiebreak"] = group[extra].astype(str)
                    keys.append("_docid_tiebreak")
                    break
        group = group.sort_values(keys, kind="mergesort").reset_index(drop=True)
        if "_docid_tiebreak" in group.columns:
            group = group.drop(columns=["_docid_tiebreak"])
        base = int(group["docid_part"].iloc[0]) * stride
        group.insert(0, "doc_id", base + np.arange(len(group), dtype=np.int64))
        return group.drop(columns=["docid_part"])

    return withpart.groupby("docid_part").map_groups(
        enumerate_group, batch_format="pandas"
    )
