"""Tokenizer stage — vectorized exploding flat-map with per-doc tf
pre-aggregation.

Reference analog: ``clip.tokenize`` inside the text encoder
(``/root/reference/src/refimage/models/clip_model.py:163-164``) — the
step that turns a document into index-able features.  SURVEY.md §2.2 M8.

One input row (doc) → many output rows ``(term, term_hash, doc_id,
tf, dl)``.  ``tf`` is aggregated *inside the batch* (partial/combiner
aggregation before the wide shuffle — SURVEY.md §2.5 A5), and ``dl``
(doc length) is denormalized onto every posting row so the reducer can
compute BM25 weights without a doc-length join at query time
(precomputed-impact style).

All hot-path work is Arrow C++ kernels: ``utf8_lower`` →
``split_pattern_regex`` → ``list_flatten`` / ``list_parent_indices`` →
``Table.group_by`` (Acero hash aggregation).  The only Python loop is
over *unique terms* per batch for the stable 64-bit hash.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from refimage_ray.config import DEFAULT_CONFIG, EngineConfig
from refimage_ray.functions.hashing import hash_string_array

POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("term_hash", pa.uint64()),
        ("doc_id", pa.int64()),
        ("tf", pa.int32()),
        ("dl", pa.int32()),
    ]
)


def _flat_tokens(
    text: pa.ChunkedArray | pa.Array, cfg: EngineConfig
) -> tuple[pa.Array, np.ndarray]:
    """text column → (flat term array, parent row indices), empties removed."""
    low = pc.utf8_lower(text)
    toks = pc.split_pattern_regex(low, pattern=cfg.split_pattern)
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks)
    nonempty = pc.not_equal(flat, "")
    flat = pc.filter(flat, nonempty)
    parent = pc.filter(parent, nonempty)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if cfg.term_filter != "none":
        # analysis chain (e.g. S-stemmer): O(unique terms) Python per
        # batch via dictionary encode — token COUNT is invariant (a
        # filter maps token -> non-empty token), so doc_len stays the
        # cheap count_substring_regex pass
        from refimage_ray.functions.text import apply_term_filter_array

        flat = apply_term_filter_array(flat, cfg.term_filter)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
    return flat, parent.to_numpy(zero_copy_only=False).astype(np.int64)


def doc_lengths(text: pa.ChunkedArray | pa.Array, cfg: EngineConfig = DEFAULT_CONFIG) -> np.ndarray:
    """Token count per row (int32) — the ``doc_len`` column.

    Uses ``count_substring_regex`` (one C++ pass) instead of a full
    split+flatten, so the doc-stats pass is much cheaper than the
    postings pass.
    """
    counts = pc.count_substring_regex(pc.utf8_lower(text), pattern=cfg.token_pattern)
    return counts.to_numpy(zero_copy_only=False).astype(np.int32)


def tokenize_batch(batch: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    """pages/docs batch (needs ``doc_id``, ``text``) → postings batch."""
    flat, parent = _flat_tokens(batch["text"], cfg)
    n_rows = batch.num_rows
    dl = np.bincount(parent, minlength=n_rows).astype(np.int32)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)

    if len(flat) == 0:
        # schema must be uniform across blocks: with store_positions a
        # token-less block still needs the 'pos' column, or Ray's
        # block-schema unification fails mid-build
        if cfg.store_positions:
            return POSTINGS_SCHEMA.append(
                pa.field("pos", pa.list_(pa.int32()))
            ).empty_table()
        return POSTINGS_SCHEMA.empty_table()

    # per-(doc, term) tf via Acero hash aggregation (the partial agg)
    pairs_cols = {"row": pa.array(parent, pa.int64()), "term": flat}
    aggs = [([], "count_all")]
    if cfg.store_positions:
        # token position within its doc (phrase scale path); Acero's
        # "list" aggregation preserves scan order → ascending positions
        starts = np.zeros(n_rows, dtype=np.int64)
        np.cumsum(np.bincount(parent, minlength=n_rows)[:-1], out=starts[1:])
        pos = (np.arange(len(parent), dtype=np.int64) - starts[parent]).astype(
            np.int32
        )
        pairs_cols["pos"] = pa.array(pos, pa.int32())
        aggs.append(("pos", "list"))
    pairs = pa.table(pairs_cols)
    grouped = pairs.group_by(["row", "term"]).aggregate(aggs)
    rows = grouped["row"].to_numpy(zero_copy_only=False).astype(np.int64)
    terms = grouped["term"]
    tfs = grouped["count_all"].to_numpy(zero_copy_only=False).astype(np.int32)

    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    out = {
        "term": terms,
        "term_hash": pa.array(hash_string_array(terms), pa.uint64()),
        "doc_id": pa.array(doc_ids[rows], pa.int64()),
        "tf": pa.array(tfs, pa.int32()),
        "dl": pa.array(dl[rows], pa.int32()),
    }
    if cfg.store_positions:
        out["pos"] = grouped["pos_list"]
    return pa.table(out)


def doc_stats_batch(batch: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    """docs batch → per-doc stats ``(doc_id, doc_len, n_chars)``.

    Feeds the global N / avgdl aggregate (reference analog: COUNT/SUM
    storage stats, ``/root/reference/src/refimage/storage.py:714-745``).
    """
    dl = doc_lengths(batch["text"], cfg)
    n_chars = pc.utf8_length(batch["text"])
    out = {
        "doc_id": batch["doc_id"],
        "doc_len": pa.array(dl, pa.int32()),
        "n_chars": pc.cast(n_chars, pa.int64()),
    }
    if "lang" in batch.column_names:
        out["lang"] = batch["lang"]
    if "url" in batch.column_names:
        out["url"] = batch["url"]
    return pa.table(out)
