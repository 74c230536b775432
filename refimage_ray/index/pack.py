"""Map-side combiner for the index shuffle — packed posting blocks.

The naive wide step ships one row per (term, doc) posting through the
all-to-all exchange; at N docs that is ~100·N tiny rows and the sort
machinery dominates.  This module packs each map batch's postings into
ONE row per gkey, COMPRESSED:

    (gkey, n, rlen: varbyte run lengths, docd: varbyte doc deltas,
     tf: varbyte, dl: varbyte, dict_hash: binary u64, dict_terms: str)

The pack is (term_hash, doc_id)-sorted, so term hashes form runs:
``dict_hash`` holds one u64 per run (it doubles as the hash→term
dictionary key array) and ``rlen`` the run lengths — ~0.1 B/posting
instead of 8.  Doc ids are ascending within each run → delta+varbyte
(absolute at run starts); tf/dl varbyte.  ~24 B/posting raw drops to
~5-7 B through the exchange; the added encode/decode is vectorized
numpy CPU work, which scales with cores — unlike the object-store
memcpy bandwidth it displaces (the single-box scaling ceiling measured
in BENCH/BASELINE.md).

The reducer decodes, concatenates, lexsorts (term_hash, doc_id) once,
and encodes exactly the same artifact as the row-wise reducer
(asserted byte-identical in tests).  This is the Ray Data expression
of a sort-shuffle map-side combine with spill compression (Spark's
combiner + shuffle codec).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from refimage_ray.config import EngineConfig
from refimage_ray.functions.codec import (
    slice_varbyte,
    varbyte_decode,
    varbyte_encode,
    varbyte_encode_with_offsets,
)
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
        ("rlen", pa.binary()),
        ("docd", pa.binary()),
        ("tf", pa.binary()),
        ("dl", pa.binary()),
        ("dict_hash", pa.binary()),
        ("dict_terms", pa.string()),
    ]
)


def doc_range_salts(
    doc_ids: np.ndarray, salt_buckets: int, doc_span: int
) -> np.ndarray:
    """Doc-range salt bucket for hot terms — division FIRST.

    The naive ``doc_id * S // doc_span`` overflows int64 for 63-bit
    hash doc ids (doc_id·8 > 2^63), silently producing salts of 0/-1;
    a salt of -1 folds into the PREVIOUS shard's gkey, so a hot term's
    postings landed in a file the term's shard routing never reads —
    a distributed-serving correctness bug at hash-id scale and the
    dominant partition skew in the 4M-doc bench (one 4.6M-posting
    reducer).  ``doc_id // ceil(span/S)`` cannot overflow and yields
    the same disjoint, monotone doc ranges."""
    width = (int(doc_span) + salt_buckets - 1) // salt_buckets
    return np.minimum(doc_ids // max(width, 1), salt_buckets - 1).astype(np.int64)


def cold_salts(th: np.ndarray, num_shards: int, salt_buckets: int) -> np.ndarray:
    """Salt bucket for non-hot terms: a term-hash spread (quotient bits,
    independent of the shard's modulus bits).  Pure function of the
    term, so query routing is unaffected — a cold term still lives
    whole in exactly one (shard, salt) file; this only stops every cold
    term of a shard from piling into the same reducer (measured 6.2×
    partition skew with all-cold-at-salt-0 at 4M docs)."""
    return ((th // np.uint64(num_shards)) % np.uint64(salt_buckets)).astype(
        np.int64
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
    hot terms (the skew split), else a term-hash spread bucket."""
    shard = (th % np.uint64(num_shards)).astype(np.int64)
    salt = cold_salts(th, num_shards, salt_buckets)
    if is_hot.any():
        salt[is_hot] = doc_range_salts(doc_ids[is_hot], salt_buckets, doc_span)
    return shard * salt_buckets + salt


def pack_batch(
    batch: pa.Table,
    cfg: EngineConfig,
    hot_arr: pa.Array,
    doc_span: int,
    done_gkeys: np.ndarray,
    rank_ids: "np.ndarray | None" = None,
) -> pa.Table:
    """docs batch → packed posting rows (one per live gkey).

    With ``rank_ids`` (the sorted corpus doc-id universe, broadcast via
    ``ray.put``), doc ids travel as universe RANKS: rank deltas within
    a term run are ~n_docs / batch_size (≈2 varbyte bytes) instead of
    ~2^63 / n_docs for hash ids (6-8 bytes), and the ``dl`` column is
    dropped entirely — the reducer recovers both by indexing the same
    broadcast.  Gated on the universe fitting a broadcast (the
    NARROW_LOCAL_ROWS planning class); beyond it the absolute-id pack
    below is the fallback, and strided-dense doc ids are the
    scale-path equivalent (small deltas by construction)."""
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
    if rank_ids is not None:
        # rank order == doc order, so the (gkey, th, doc) sort above is
        # also the (gkey, th, rank) sort; encode ranks as the "doc" ints
        ranks = np.searchsorted(rank_ids, docs_)
        if len(ranks) and (
            ranks.max() >= len(rank_ids)
            or not np.array_equal(rank_ids[ranks], docs_)
        ):
            raise ValueError("doc_id absent from broadcast universe")
        docs_ = ranks.astype(np.int64)
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

    # doc deltas over the WHOLE sorted batch (reset to absolute at each
    # (gkey, th)-run start) — every varbyte column is encoded ONCE per
    # batch and byte-SLICED per gkey (varbyte is per-value independent,
    # so a slice of the full encoding equals encoding the slice)
    run_start_mask = np.zeros(len(gs), dtype=bool)
    run_start_mask[0] = True
    run_start_mask[1:] = (ths[1:] != ths[:-1]) | (gs[1:] != gs[:-1])
    doc_delta = docs_.copy()
    doc_delta[1:] -= docs_[:-1]
    doc_delta[run_start_mask] = docs_[run_start_mask]

    run_starts_idx = np.flatnonzero(run_start_mask)
    run_lens_all = np.diff(np.concatenate((run_starts_idx, [len(gs)])))
    docd_buf, docd_ends = varbyte_encode_with_offsets(doc_delta.astype(np.uint64))
    tf_buf, tf_ends = varbyte_encode_with_offsets(tfs.astype(np.uint64))
    if rank_ids is None:
        dl_buf, dl_ends = varbyte_encode_with_offsets(dls.astype(np.uint64))
    rl_buf, rl_ends = varbyte_encode_with_offsets(run_lens_all.astype(np.uint64))

    col_names = ["gkey", "n", "rlen", "docd", "tf", "dl", "dict_hash", "dict_terms"]
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
        r0 = int(np.searchsorted(run_starts_idx, s))
        r1 = int(np.searchsorted(run_starts_idx, e))
        dict_hash = ths[run_starts_idx[r0:r1]]
        dict_idx = order[run_starts_idx[r0:r1]]
        dict_terms = pc.take(terms, pa.array(dict_idx, pa.int64())).to_pylist()
        cols["gkey"].append(g)
        cols["n"].append(int(e - s))
        cols["rlen"].append(slice_varbyte(rl_buf, rl_ends, r0, r1))
        cols["docd"].append(slice_varbyte(docd_buf, docd_ends, s, e))
        cols["tf"].append(slice_varbyte(tf_buf, tf_ends, s, e))
        cols["dl"].append(
            b"" if rank_ids is not None else slice_varbyte(dl_buf, dl_ends, s, e)
        )
        cols["dict_hash"].append(dict_hash.tobytes())
        cols["dict_terms"].append("\n".join(dict_terms))
        if with_pos:
            cols["posb"].append(
                pos_perm[pos_offsets[s]:pos_offsets[e]].tobytes()
            )
    out = {
        "gkey": pa.array(cols["gkey"], pa.int64()),
        "n": pa.array(cols["n"], pa.int32()),
        "rlen": pa.array(cols["rlen"], pa.binary()),
        "docd": pa.array(cols["docd"], pa.binary()),
        "tf": pa.array(cols["tf"], pa.binary()),
        "dl": pa.array(cols["dl"], pa.binary()),
        "dict_hash": pa.array(cols["dict_hash"], pa.binary()),
        "dict_terms": pa.array(cols["dict_terms"], pa.string()),
    }
    if with_pos:
        out["posb"] = pa.array(cols["posb"], pa.binary())
    return pa.table(out)


def _decode_pack_row(
    rlen_b: bytes, docd_b: bytes, hash_b: bytes
) -> tuple[np.ndarray, np.ndarray]:
    """One pack row's (rlen, docd, dict_hash) → (th, doc) arrays."""
    rlen = varbyte_decode(rlen_b).astype(np.int64)
    hashes = np.frombuffer(hash_b, dtype=np.uint64)
    th = np.repeat(hashes, rlen)
    deltas = varbyte_decode(docd_b).astype(np.int64)
    # prefix-sum with reset at run starts: doc[i] = Σ deltas[start..i]
    cs = np.cumsum(deltas)
    starts = np.concatenate(([0], np.cumsum(rlen)[:-1]))
    base = cs[starts] - deltas[starts]
    doc = cs - np.repeat(base, rlen)
    return th, doc


def unpack_group(
    group: pa.Table,
    universe: "tuple[np.ndarray, np.ndarray] | None" = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, dict, "np.ndarray | None"]:
    """Packed rows of one gkey → concatenated, (hash, doc)-sorted
    posting arrays + hash→term lookup (+ flat positions when stored)."""
    ths, docs = [], []
    for rlen_b, docd_b, hash_b in zip(
        group["rlen"].to_pylist(),
        group["docd"].to_pylist(),
        group["dict_hash"].to_pylist(),
    ):
        t, d = _decode_pack_row(rlen_b, docd_b, hash_b)
        ths.append(t)
        docs.append(d)
    th = np.concatenate(ths) if ths else np.zeros(0, np.uint64)
    doc = np.concatenate(docs) if docs else np.zeros(0, np.int64)
    tf = np.concatenate(
        [varbyte_decode(b).astype(np.int32) for b in group["tf"].to_pylist()]
    ) if group.num_rows else np.zeros(0, np.int32)
    if universe is not None:
        # rank-packed exchange: "doc" ints are universe ranks; recover
        # real doc ids and per-posting doc lengths from the broadcast
        u_ids, u_dls = universe
        dl = u_dls[doc].astype(np.int32)
        doc = u_ids[doc].astype(np.int64)
    else:
        dl = np.concatenate(
            [varbyte_decode(b).astype(np.int32) for b in group["dl"].to_pylist()]
        ) if group.num_rows else np.zeros(0, np.int32)
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
