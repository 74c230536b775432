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

# pa.ListArray offsets are int32 — one bucket's simple-path token count
# must stay below this per emitted chunk (tests shrink it to exercise
# the segmented path)
_LIST_OFFSET_CAP = (1 << 31) - 1


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


def build_vocab(
    docs_ds: "rd.Dataset",
    min_df: int | None = None,
    max_terms: int | None = 131072,
) -> list[str]:
    """Corpus terms, sorted — the id map for token-id sequences
    (id = list index).

    The default is FREQUENCY-CAPPED: terms rank by document frequency
    (ties term-asc) and only the top ``max_terms`` (2^17 — the scale
    of a real tokenizer vocab) survive; ``min_df`` additionally drops
    the Heaps-law singleton tail before the cut.  A raw *word* vocab
    over noisy web text is otherwise unbounded (10^8+ distinct tokens
    at 100 TB) and this function would ship it all to the driver.
    Out-of-vocab tokens downstream map to id −1, same as the
    external-BPE unknown path.  Pass ``max_terms=None`` (and leave
    ``min_df`` unset) to opt into the uncapped distinct set.

    Shape: per-batch per-doc-distinct combiner → one df groupby; the
    capped path then takes the top slice via a distributed
    sort+limit, so the driver never holds more than ``max_terms``
    rows; the uncapped path collects the full distinct set (bounded
    corpora only)."""
    import pyarrow.compute as pc

    from refimage_ray.config import DEFAULT_CONFIG
    from refimage_ray.stages.tokenize import _flat_tokens

    def df_partial(b: pa.Table) -> pa.Table:
        flat, parent = _flat_tokens(b["text"], DEFAULT_CONFIG)
        pairs = (
            pa.table({"d": pa.array(parent, pa.int64()), "term": flat})
            .group_by(["d", "term"]).aggregate([])
        )
        g = pairs.group_by("term").aggregate([([], "count_all")])
        return pa.table({"term": g["term"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    dfreq = (
        docs_ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
    )
    if min_df is not None:
        dfreq = dfreq.filter(expr=f"n >= {int(min_df)}")
    if max_terms is not None:
        # over-fetch one row so actual truncation is detected exactly
        # (a silent cut changes the id map vs a pre-cap build — token
        # artifacts built across the two would not be comparable)
        rows = (
            dfreq.sort(["n", "term"], descending=[True, False])
            .limit(int(max_terms) + 1)
            .take_all()
        )
        if len(rows) > int(max_terms):
            import warnings

            warnings.warn(
                f"build_vocab: corpus has more than max_terms="
                f"{int(max_terms)} distinct terms; the vocabulary is "
                "frequency-truncated and out-of-vocab tokens will map "
                "to id -1. Pass max_terms=None for the uncapped "
                "distinct set (bounded corpora only) if you need id "
                "maps compatible with a pre-cap artifact.",
                stacklevel=2,
            )
            rows = rows[: int(max_terms)]
    else:
        rows = dfreq.take_all()
    return sorted(r["term"] for r in rows)


def write_packed_sequences(
    docs_ds: "rd.Dataset",
    out_dir: str,
    budget: int,
    n_buckets: int = 32,
    vocab: list[str] | None = None,
    seqs_per_file: int = 4096,
    resume: bool = True,
    order: str = "stream",
    seed: int = 0,
) -> dict:
    """Resumable partitioned sink for the training product: the packed
    sequences land as ``seqs-{file:05d}.parquet`` (one file per
    ``seqs_per_file`` range of seq_ids), each written atomically
    (tmp + rename), with a ``manifest.json`` recording vocab size,
    budget, and completed files.  A re-run SKIPS files already on disk
    (``resume=False`` forces rewrite) — the artifact is deterministic,
    so resumed output is byte-identical to a single run.

    ``order="stream"`` (default): file key is
    ``seq_id // seqs_per_file`` — a pure function of the
    (deterministic) scan, so a crashed run's completed ranges are
    valid without any coordination state beyond the filesystem.

    ``order="shuffled"``: the GLOBAL training shuffle, at the same
    cost as the stream write.  Files are range buckets of the
    ``shuffle_key_of(seq_id, seed)`` domain, rows within a file sorted
    by (key, seq_id) — so reading the files in name order replays
    EXACTLY the :func:`shuffle_ranks` permutation without computing a
    single global rank (the key range IS the order).  Still
    deterministic, seedable, resumable; file sizes are ≈seqs_per_file
    (multiplicative-hash uniformity) rather than exact.
    """
    import json
    import os

    import pyarrow.parquet as pq

    from refimage_ray.index.manifest import atomic_write_bytes

    if order not in ("stream", "shuffled"):
        raise ValueError(f"order must be 'stream' or 'shuffled', got {order!r}")
    os.makedirs(out_dir, exist_ok=True)
    # resume safety: skipping existing files is only sound if the prior
    # run used the SAME packing geometry — otherwise the artifact would
    # silently mix two budgets/orders/seeds
    man_path = os.path.join(out_dir, "manifest.json")
    if resume and os.path.exists(man_path):
        with open(man_path) as f:
            prior = json.load(f)
        want = {"budget": budget, "seqs_per_file": seqs_per_file,
                "order": order, "seed": seed if order == "shuffled" else None}
        got = {k: prior.get(k) for k in want}
        if got != want:
            raise ValueError(
                "resume=True but the existing manifest.json records "
                f"different packing geometry ({got} != {want}); pass "
                "resume=False to rewrite, or use a fresh out_dir"
            )
    seqs = pack_token_sequences(
        docs_ds, budget=budget, n_buckets=n_buckets, vocab=vocab
    )

    n_files = 0
    if order == "shuffled":
        # file count up front from a NARROW token-count pass (no list
        # columns, no shuffle) — the bucket count must be a constant of
        # the dataset for the key-range → file mapping to be stable
        from refimage_ray.stages.tokenize import doc_lengths

        total = docs_ds.map_batches(
            lambda b: pa.table({"dl": doc_lengths(b["text"])}),
            batch_format="pyarrow",
        ).aggregate(Sum("dl", alias_name="s"))["s"] or 0
        total_seqs = -(-int(total) // budget)
        n_files = max(1, -(-total_seqs // seqs_per_file))

    def add_key(b: pa.Table) -> pa.Table:
        sid = b["seq_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if order == "stream":
            fk = sid // seqs_per_file
            return b.append_column("file_key", pa.array(fk, pa.int64()))
        key = shuffle_key_of(sid, seed)
        fk = ((key * np.uint64(n_files)) >> np.uint64(32)).astype(np.int64)
        return b.append_column(
            "file_key", pa.array(fk, pa.int64())
        ).append_column("shuffle_key", pa.array(key.astype(np.int64)))

    def write_file(g: pa.Table) -> pa.Table:
        import io

        fk = int(g["file_key"][0].as_py())
        fname = f"seqs-{fk:05d}.parquet"
        path = os.path.join(out_dir, fname)
        if resume and os.path.exists(path):
            return pa.table(
                {"file": pa.array([fname]), "n_seqs": pa.array([-1], pa.int64())}
            )
        if order == "stream":
            srt = np.argsort(
                g["seq_id"].to_numpy(zero_copy_only=False), kind="stable"
            )
            t = g.take(pa.array(srt)).drop_columns(["file_key"])
        else:
            srt = np.lexsort((
                g["seq_id"].to_numpy(zero_copy_only=False),
                g["shuffle_key"].to_numpy(zero_copy_only=False),
            ))
            t = g.take(pa.array(srt)).drop_columns(["file_key", "shuffle_key"])
        buf = io.BytesIO()
        pq.write_table(t, buf)
        atomic_write_bytes(path, buf.getvalue())
        return pa.table(
            {"file": pa.array([fname]), "n_seqs": pa.array([t.num_rows], pa.int64())}
        )

    rows = (
        seqs.map_batches(add_key, batch_format="pyarrow")
        .groupby("file_key")
        .map_groups(write_file, batch_format="pyarrow")
        .take_all()
    )
    written = sorted(r["file"] for r in rows)
    manifest = {
        "kind": "packed-sequences",
        "budget": budget,
        "seqs_per_file": seqs_per_file,
        "order": order,
        "seed": seed if order == "shuffled" else None,
        "n_files": n_files if order == "shuffled" else len(written),
        "files": written,
        "skipped_existing": sorted(r["file"] for r in rows if r["n_seqs"] < 0),
    }
    atomic_write_bytes(
        os.path.join(out_dir, "manifest.json"),
        json.dumps(manifest, indent=1, sort_keys=True).encode(),
    )
    return manifest


def vocab_from_index(index_dir: str) -> list[str]:
    """Vocab straight from the index artifact — the postings already
    enumerate every (post-dedup) corpus term, so a column-pruned read
    of the partition files replaces a full corpus re-tokenize.

    This is the UNCAPPED term set: identical to
    ``build_vocab(docs, max_terms=None)`` over the staged live docs.
    ``build_vocab``'s *default* frequency cap (top 2^17 by df) only
    coincides when the corpus vocabulary fits the cap — on larger
    corpora the two id maps diverge (tail terms here vs −1 unknowns
    there), so pick ONE source per training corpus and reuse it."""
    import os

    import pyarrow.dataset as pads

    files = [
        os.path.join(index_dir, f)
        for f in os.listdir(index_dir)
        if f.startswith("part-") and f.endswith(".parquet")
    ]
    if not files:
        return []
    import pyarrow.compute as pc

    t = pads.dataset(files).to_table(columns=["term"])
    return sorted(set(pc.unique(t["term"]).to_pylist()))


def pack_token_sequences(
    docs_ds: "rd.Dataset",
    budget: int,
    n_buckets: int = 32,
    vocab: list[str] | None = None,
) -> "rd.Dataset":
    """Corpus → fixed-length token-id training sequences.

    The end product of the prep pipeline: documents are concatenated
    in ``doc_id`` order and cut into ``budget``-token sequences, each
    row ``(seq_id, token_ids: list<int32>, n_tokens)``.  Docs may span
    sequence boundaries (standard LM packing).  Every sequence is full
    except the last.

    Distributed shape (two shuffles, no driver materialization):

    1. narrow scan pass — per-bucket token sums → K-row driver prefix
       (same machinery as :func:`pack_offsets`);
    2. ``groupby(bucket).map_groups`` — tokenize the bucket's docs
       (one vectorized ``_flat_tokens`` + ``index_in`` against the
       broadcast vocab), compute each doc's global start offset, and
       emit per-(doc × sequence) PIECES ``(seq_id, pos, ids)``;
    3. ``groupby(seq_id).map_groups`` — order a sequence's pieces by
       position and concatenate.

    ``vocab`` defaults to :func:`build_vocab` over the same corpus;
    pass a fixed list to share ids across corpora.
    """
    import ray
    import pyarrow.compute as pc

    from refimage_ray.config import DEFAULT_CONFIG
    from refimage_ray.stages.tokenize import _flat_tokens, doc_lengths

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    # the corpus is consumed up to three times (vocab, narrow scan,
    # piece emission) but NOT materialized: the text column at corpus
    # scale must stream from the (deterministic, re-executable) source
    # each pass — re-reading parquet is cheaper than pinning 100 TB in
    # the object store.  Only the K-row bucket sums hit the driver.
    if vocab is None:
        vocab = build_vocab(docs_ds)
    vocab_ref = ray.put(pa.array(vocab, pa.string()))

    def narrow(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "dl": pa.array(
                    doc_lengths(b["text"]).astype(np.int64), pa.int64()
                ),
            }
        )

    nrw = docs_ds.map_batches(narrow, batch_format="pyarrow")
    bounds = nrw.aggregate(Min("doc_id"), Max("doc_id"))
    lo, hi = int(bounds["min(doc_id)"]), int(bounds["max(doc_id)"])
    span = hi - lo + 1
    nb = max(1, min(int(n_buckets), span))
    width = -(-span // nb)

    sums_tbl = (
        nrw.map_batches(
            lambda b: pa.table(
                {
                    "bucket": pc.cast(
                        pc.divide(pc.subtract(b["doc_id"], lo), width),
                        pa.int64(),
                    ),
                    "dl": b["dl"],
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("bucket")
        .aggregate(Sum("dl", alias_name="bucket_tokens"))
        .take_all()
    )
    per_bucket = np.zeros(nb, np.int64)
    for row in sums_tbl:
        per_bucket[int(row["bucket"])] = int(row["bucket_tokens"])
    bucket_start = np.concatenate(([0], np.cumsum(per_bucket)[:-1]))

    def add_bucket(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            "bucket", pa.array((ids - lo) // width, pa.int64())
        )

    def emit_pieces(g: pa.Table) -> pa.Table:
        voc = ray.get(vocab_ref)
        ids = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        g = g.take(pa.array(order))
        flat, parent = _flat_tokens(g["text"], DEFAULT_CONFIG)
        # unknown-vocab tokens (external vocab case) map to -1
        tok = pc.fill_null(pc.index_in(flat, value_set=voc), -1)
        tok = tok.to_numpy(zero_copy_only=False).astype(np.int32)
        # per-doc slices of the flat array
        dl = np.bincount(parent, minlength=g.num_rows).astype(np.int64)
        doc_off = np.concatenate(([0], np.cumsum(dl)[:-1]))
        bkt = int(g["bucket"][0].as_py())
        start = bucket_start[bkt] + np.concatenate(([0], np.cumsum(dl)[:-1]))
        # vectorized fast path: docs that do NOT cross a sequence
        # boundary (the overwhelming majority when budget >> avg dl)
        # become one piece each — a zero-Python-loop ListArray built
        # from a token keep-mask + cumsum offsets
        first_seq = start // budget
        last_seq = np.where(dl > 0, (start + dl - 1) // budget, first_seq)
        simple = (first_seq == last_seq) & (dl > 0)
        tok_keep = simple[parent] if len(parent) else np.zeros(0, bool)
        s_vals = tok[tok_keep]
        s_dl = dl[simple]
        s_seq = first_seq[simple]
        s_pos = start[simple] - first_seq[simple] * budget
        # ListArray offsets are int32: a bucket holding >2^31 tokens
        # would silently wrap the cumsum — emit the simple-path rows in
        # segments that each stay under the cap (chunked table concat;
        # downstream sees the same logical rows)
        simple_parts = []
        cum = np.cumsum(s_dl) if len(s_dl) else np.zeros(0, np.int64)
        seg_start, tok_start = 0, 0
        while seg_start < len(s_dl):
            seg_end = int(
                np.searchsorted(cum, tok_start + _LIST_OFFSET_CAP, side="right")
            )
            seg_end = max(seg_end, seg_start + 1)
            dl_seg = s_dl[seg_start:seg_end]
            n_tok = int(dl_seg.sum())
            offs = np.concatenate(([0], np.cumsum(dl_seg))).astype(np.int32)
            simple_parts.append(pa.table(
                {
                    "seq_id": pa.array(s_seq[seg_start:seg_end], pa.int64()),
                    "pos": pa.array(s_pos[seg_start:seg_end], pa.int64()),
                    "ids": pa.ListArray.from_arrays(
                        pa.array(offs),
                        pa.array(s_vals[tok_start:tok_start + n_tok],
                                 pa.int32()),
                    ),
                }
            ))
            seg_start, tok_start = seg_end, tok_start + n_tok
        if simple_parts:
            simple_tbl = pa.concat_tables(simple_parts)
        else:
            simple_tbl = pa.table(
                {
                    "seq_id": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                    "ids": pa.array([], pa.list_(pa.int32())),
                }
            )
        # slow path: boundary-crossing docs (few) — per-piece loop
        seq_ids, poss, pieces = [], [], []
        for d in np.flatnonzero(~simple & (dl > 0)):
            st, n = int(start[d]), int(dl[d])
            j = 0
            while j < n:
                s = (st + j) // budget
                take = min(n - j, (s + 1) * budget - (st + j))
                seq_ids.append(s)
                poss.append((st + j) % budget)
                pieces.append(tok[doc_off[d] + j : doc_off[d] + j + take])
                j += take
        cross_tbl = pa.table(
            {
                "seq_id": pa.array(seq_ids, pa.int64()),
                "pos": pa.array(poss, pa.int64()),
                "ids": pa.array(
                    [p.tolist() for p in pieces], pa.list_(pa.int32())
                ),
            }
        )
        return pa.concat_tables([simple_tbl, cross_tbl]).combine_chunks()

    def assemble(g: pa.Table) -> pa.Table:
        order = np.argsort(
            g["pos"].to_numpy(zero_copy_only=False), kind="stable"
        )
        g = g.take(pa.array(order))
        flat = pc.list_flatten(g["ids"])
        return pa.table(
            {
                "seq_id": pa.array([int(g["seq_id"][0].as_py())], pa.int64()),
                "token_ids": pa.array(
                    [flat.to_pylist()], pa.list_(pa.int32())
                ),
                "n_tokens": pa.array([len(flat)], pa.int64()),
            }
        )

    return (
        docs_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(emit_pieces, batch_format="pyarrow")
        .groupby("seq_id")
        .map_groups(assemble, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# deterministic global shuffle (hash-rank permutation)
# ---------------------------------------------------------------------------

#: Knuth multiplicative constant — the same family the mixture sampler
#: uses; the permutation is a pure function of (id, seed), so a resumed
#: or re-run job reproduces the identical order byte-for-byte.
_SHUFFLE_MUL = np.uint64(2654435761)
_SHUFFLE_DOMAIN = np.uint64(1) << np.uint64(32)


def shuffle_key_of(ids: np.ndarray, seed: int = 0) -> np.ndarray:
    """Deterministic pseudo-random sort key in [0, 2^32) per id."""
    h = (ids.astype(np.uint64) + np.uint64(seed)) * _SHUFFLE_MUL
    return h % _SHUFFLE_DOMAIN


def shuffle_ranks(
    ids_ds: "rd.Dataset",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    seed: int = 0,
) -> "rd.Dataset":
    """(id) → (id, shuffle_key, shuffle_pos): a deterministic GLOBAL
    shuffle expressed as a rank — ``shuffle_pos`` is the row's position
    in the permutation ordered by ``(shuffle_key, id)``.

    Every LM training-data pipeline globally shuffles its sequences
    before writing; ``random_shuffle()`` does that too, but its order
    is neither seedable-stable across resumes nor verifiable.  This is
    the scan shape again (the same two passes as :func:`pack_offsets`,
    counting rows instead of tokens): only the id column moves, the
    bucket table is K rows on the driver, and the within-bucket sort
    is bounded by the bucket's key range — no full-dataset sort, no
    driver materialization, byte-stable across runs/resumes/cluster
    sizes.

    Partitioning assumption: buckets are ranges of the 32-bit key
    domain and the multiplicative hash spreads ids uniformly, so each
    of the K groups holds ≈ n/K rows — choose ``n_buckets`` ≈
    corpus_rows / target_rows as with packing buckets.
    """
    nb = max(1, int(n_buckets))

    def add_key(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        key = shuffle_key_of(ids, seed)
        # order-preserving range partition of the key domain
        bucket = (key * np.uint64(nb)) >> np.uint64(32)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "shuffle_key": pa.array(key.astype(np.int64), pa.int64()),
                "bucket": pa.array(bucket.astype(np.int64), pa.int64()),
            }
        )

    keyed = ids_ds.map_batches(add_key, batch_format="pyarrow")

    # pass 1: K-row reduction of per-bucket row counts
    from ray.data.aggregate import Count

    counts_tbl = (
        keyed.select_columns(["bucket"])
        .groupby("bucket")
        .aggregate(Count(alias_name="n"))
        .take_all()
    )
    per_bucket = np.zeros(nb, np.int64)
    for row in counts_tbl:
        per_bucket[int(row["bucket"])] = int(row["n"])
    bucket_start = np.concatenate(([0], np.cumsum(per_bucket)[:-1]))

    # pass 2: within-bucket sort by (key, id) + local arange + offset
    def rank_group(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        key = g["shuffle_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, key))
        bkt = int(g["bucket"][0].as_py())
        pos = np.empty(len(ids), np.int64)
        pos[order] = bucket_start[bkt] + np.arange(len(ids), dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "shuffle_key": pa.array(key, pa.int64()),
                "shuffle_pos": pa.array(pos, pa.int64()),
            }
        )

    return keyed.groupby("bucket").map_groups(
        rank_group, batch_format="pyarrow"
    )
