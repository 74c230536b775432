"""Map-side combiner for the index shuffle — packed posting blocks.

The naive wide step ships one row per (term, doc) posting through the
all-to-all exchange; at N docs that is ~100·N tiny rows and the sort
machinery dominates.  This module packs each map batch's postings into
ONE row per gkey:

    (gkey, n, th: binary, doc: binary, tf: binary, dl: binary,
     dict_hash: binary, dict_terms: string)

— numpy buffers for the numeric columns plus a per-pack term
dictionary (hash → string, needed to recover term text after the
numeric shuffle).  Rows through the shuffle drop from O(postings) to
O(batches · live-gkeys-per-batch); bytes stay the same but the sort
cost collapses.  The reducer concatenates buffers, lexsorts
(term_hash, doc_id) once, and encodes exactly the same artifact as the
row-wise reducer (asserted byte-identical in tests).

This is the Ray Data expression of a sort-shuffle map-side combine
(what Spark/MapReduce call a combiner + spill file).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from refimage_ray.config import EngineConfig
from refimage_ray.stages.tokenize import tokenize_batch

def ragged_take(flat: np.ndarray, lens: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Gather ragged segments: concatenate segments ``idx`` of a flat
    array partitioned by ``lens`` — fully vectorized (repeat+arange)."""
    if len(idx) == 0 or len(flat) == 0:
        return flat[:0]
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    sel_lens = lens[idx]
    total = int(sel_lens.sum())
    if total == 0:
        return flat[:0]
    out_off = np.concatenate(([0], np.cumsum(sel_lens)[:-1]))
    base = np.repeat(starts[idx], sel_lens)
    within = np.arange(total, dtype=np.int64) - np.repeat(out_off, sel_lens)
    return flat[base + within]


PACK_SCHEMA = pa.schema(
    [
        ("gkey", pa.int64()),
        ("n", pa.int32()),
        ("th", pa.binary()),
        ("doc", pa.binary()),
        ("tf", pa.binary()),
        ("dl", pa.binary()),
        ("dict_hash", pa.binary()),
        ("dict_terms", pa.string()),
    ]
)


def assign_gkeys(
    th: np.ndarray,
    doc_ids: np.ndarray,
    is_hot: np.ndarray,
    num_shards: int,
    salt_buckets: int,
    doc_span: int,
) -> np.ndarray:
    """gkey = (term_hash % P) · S + salt; salt = doc-range bucket for
    hot terms (the skew split), else 0."""
    shard = (th % np.uint64(num_shards)).astype(np.int64)
    salt = np.zeros(len(th), dtype=np.int64)
    if is_hot.any():
        salt[is_hot] = doc_ids[is_hot] * salt_buckets // doc_span
    return shard * salt_buckets + salt


def pack_batch(
    batch: pa.Table,
    cfg: EngineConfig,
    hot_arr: pa.Array,
    doc_span: int,
    done_gkeys: np.ndarray,
) -> pa.Table:
    """docs batch → packed posting rows (one per live gkey)."""
    import pyarrow.compute as pc

    toks = tokenize_batch(batch, cfg)
    with_pos = "pos" in toks.column_names
    if toks.num_rows == 0:
        if with_pos:
            return PACK_SCHEMA.append(pa.field("posb", pa.binary())).empty_table()
        return PACK_SCHEMA.empty_table()
    th = toks["term_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    doc = toks["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    tf = toks["tf"].to_numpy(zero_copy_only=False).astype(np.int32)
    dl = toks["dl"].to_numpy(zero_copy_only=False).astype(np.int32)
    if len(hot_arr):
        is_hot = pc.is_in(toks["term"], value_set=hot_arr).to_numpy(
            zero_copy_only=False
        )
    else:
        is_hot = np.zeros(len(th), dtype=bool)
    gkey = assign_gkeys(th, doc, is_hot, cfg.num_shards, cfg.salt_buckets, doc_span)

    order = np.lexsort((doc, th, gkey))
    gs, ths, docs_, tfs, dls = gkey[order], th[order], doc[order], tf[order], dl[order]
    pos_perm = None
    pos_offsets = None
    if with_pos:
        pos_col = toks["pos"].combine_chunks()
        pos_flat = pc.list_flatten(pos_col).to_numpy(zero_copy_only=False).astype(
            np.int32
        )
        pos_perm = ragged_take(pos_flat, tf.astype(np.int64), order)
        pos_offsets = np.concatenate(([0], np.cumsum(tfs.astype(np.int64))))

    # per-pack term dictionary: first row index of each distinct hash
    # (within the batch) → its term string
    terms = toks["term"].combine_chunks()

    changes = np.flatnonzero(gs[1:] != gs[:-1]) + 1
    starts = np.concatenate(([0], changes))
    ends = np.concatenate((changes, [len(gs)]))

    col_names = ["gkey", "n", "th", "doc", "tf", "dl", "dict_hash", "dict_terms"]
    if with_pos:
        col_names.append("posb")
    cols: dict[str, list] = {k: [] for k in col_names}
    done = done_gkeys
    for s, e in zip(starts, ends):
        g = int(gs[s])
        if len(done):
            pos = np.searchsorted(done, g)
            if pos < len(done) and done[pos] == g:
                continue  # resume: partition already checkpointed
        run_th = ths[s:e]
        hchan = np.flatnonzero(run_th[1:] != run_th[:-1]) + 1
        hstarts = np.concatenate(([0], hchan))
        dict_hash = run_th[hstarts]
        dict_idx = order[s:e][hstarts]
        dict_terms = pc.take(terms, pa.array(dict_idx, pa.int64())).to_pylist()
        cols["gkey"].append(g)
        cols["n"].append(int(e - s))
        cols["th"].append(run_th.tobytes())
        cols["doc"].append(docs_[s:e].tobytes())
        cols["tf"].append(tfs[s:e].tobytes())
        cols["dl"].append(dls[s:e].tobytes())
        cols["dict_hash"].append(dict_hash.tobytes())
        cols["dict_terms"].append("\n".join(dict_terms))
        if with_pos:
            cols["posb"].append(
                pos_perm[pos_offsets[s]:pos_offsets[e]].tobytes()
            )
    out = {
        "gkey": pa.array(cols["gkey"], pa.int64()),
        "n": pa.array(cols["n"], pa.int32()),
        "th": pa.array(cols["th"], pa.binary()),
        "doc": pa.array(cols["doc"], pa.binary()),
        "tf": pa.array(cols["tf"], pa.binary()),
        "dl": pa.array(cols["dl"], pa.binary()),
        "dict_hash": pa.array(cols["dict_hash"], pa.binary()),
        "dict_terms": pa.array(cols["dict_terms"], pa.string()),
    }
    if with_pos:
        out["posb"] = pa.array(cols["posb"], pa.binary())
    return pa.table(out)


def unpack_group(
    group: pa.Table,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, dict, "np.ndarray | None"]:
    """Packed rows of one gkey → concatenated, (hash, doc)-sorted
    posting arrays + hash→term lookup (+ flat positions when stored)."""
    th = np.concatenate(
        [np.frombuffer(b, dtype=np.uint64) for b in group["th"].to_pylist()]
    )
    doc = np.concatenate(
        [np.frombuffer(b, dtype=np.int64) for b in group["doc"].to_pylist()]
    )
    tf = np.concatenate(
        [np.frombuffer(b, dtype=np.int32) for b in group["tf"].to_pylist()]
    )
    dl = np.concatenate(
        [np.frombuffer(b, dtype=np.int32) for b in group["dl"].to_pylist()]
    )
    lookup: dict[int, str] = {}
    for hb, ts in zip(group["dict_hash"].to_pylist(), group["dict_terms"].to_pylist()):
        hashes = np.frombuffer(hb, dtype=np.uint64)
        names = ts.split("\n") if ts else []
        for h, name in zip(hashes, names):
            lookup.setdefault(int(h), name)
    order = np.lexsort((doc, th))
    pos_sorted = None
    if "posb" in group.column_names:
        pos_flat = np.concatenate(
            [np.frombuffer(b, dtype=np.int32) for b in group["posb"].to_pylist()]
        )
        pos_sorted = ragged_take(pos_flat, tf.astype(np.int64), order)
    return th[order], doc[order], tf[order], dl[order], lookup, pos_sorted
