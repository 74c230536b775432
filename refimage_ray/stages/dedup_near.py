"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.

The reference implements only exact dedup (``file_hash UNIQUE``,
``/root/reference/src/refimage/storage.py:89``); near-dup operators are
the training-data-pipeline extension this engine adds (standard
constructions: Broder MinHash/LSH, Charikar SimHash).

Dataflow shapes (Ray-Data-first):

    docs ─ map_batches(minhash: shingle → H permutations → band keys)
         ─ (doc_id, band, band_hash) rows
         ─ groupby(band, band_hash).map_groups(emit pairs)   # the LSH join
         ─ groupby(doc_a, doc_b) dedup
         ─ [verify] exact shingle-Jaccard on the (small) candidate set

Everything is deterministic: permutation parameters come from a fixed
seed; shingle hashes are md5-prefix-u64 token hashes (the same
SQL-reproducible scheme SimHash uses — DuckDB's
``('0x' || substr(md5(t), 1, 16))::UBIGINT``) combined with uint64
wraparound polynomials, so the whole MinHash banding + verify path has
an exact DuckDB value oracle (see ``__ray_entry__.oracle_sql``).

Token-less documents (texts whose tokenization is empty): MinHash and
n-gram Jaccard emit no shingle/anchor rows for them, so two empty docs
are never paired by those operators — by convention, a doc with no
tokens has no near-duplicates under token-set similarity (even though
``exact_jaccard`` defines both-empty as 1.0).  SimHash pairs them
(hash 0 vs hash 0 at hamming 0), and EXACT dedup catches byte-equal
empty texts; route empty-doc dedup through those two.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from refimage_ray.config import DEFAULT_CONFIG, EngineConfig
from refimage_ray.functions.hashing import md5_u64_string_array
from refimage_ray.functions.packexchange import collect_small  # noqa: F401
from refimage_ray.functions.text import tokenize
from refimage_ray.stages.tokenize import _flat_tokens

_B = np.uint64(1099511628211)


def _minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=num_perm, dtype=np.uint64) | np.uint64(1)  # odd
    b = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64)
    return a, b


def _batch_shingles(
    batch: pa.Table, cfg: EngineConfig, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized shingling → (shingle_hashes, shingle_parent, doc_ids).

    Window combine is k−1 vectorized passes over the flat token-hash
    array; windows spanning doc boundaries are masked out; short docs
    (< k tokens) contribute their unigram hashes.
    """
    flat, parent = _flat_tokens(batch["text"], cfg)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    th = md5_u64_string_array(flat) if len(flat) else np.zeros(0, np.uint64)
    n = len(th)
    if n == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64), doc_ids
    if n >= k:
        valid = parent[: n - k + 1] == parent[k - 1 :]
        sh = th[: n - k + 1].copy()
        for j in range(1, k):
            sh = sh * _B + th[j : n - k + 1 + j]
        sh_parent = parent[: n - k + 1]
        sh, sh_parent = sh[valid], sh_parent[valid]
    else:
        sh = np.zeros(0, np.uint64)
        sh_parent = np.zeros(0, np.int64)
    # short docs: unigram fallback
    lengths = np.bincount(parent, minlength=batch.num_rows)
    short = np.flatnonzero((lengths > 0) & (lengths < k))
    if len(short):
        mask = np.isin(parent, short)
        sh = np.concatenate([sh, th[mask]])
        sh_parent = np.concatenate([sh_parent, parent[mask]])
        order = np.argsort(sh_parent, kind="stable")
        sh, sh_parent = sh[order], sh_parent[order]
    return sh, sh_parent, doc_ids


def minhash_band_rows(
    batch: pa.Table,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 42,
) -> pa.Table:
    """docs batch → (doc_id, band, band_hash) LSH rows (the shuffle input)."""
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    a, b = _minhash_params(num_perm, seed)
    sh, sh_parent, doc_ids = _batch_shingles(batch, cfg, shingle_k)
    n_docs = batch.num_rows
    if len(sh) == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "band": pa.array([], pa.int32()),
             "band_hash": pa.array([], pa.uint64())}
        )
    present = np.unique(sh_parent)
    starts = np.searchsorted(sh_parent, present)
    sig = np.empty((len(present), num_perm), dtype=np.uint64)
    for h in range(num_perm):  # H vectorized passes, no per-doc Python
        phi = a[h] * sh + b[h]
        sig[:, h] = np.minimum.reduceat(phi, starts)
    # band hash = wraparound polynomial over the band's signature rows
    out_doc, out_band, out_hash = [], [], []
    for bi in range(bands):
        chunk = sig[:, bi * rows_per_band : (bi + 1) * rows_per_band]
        bh = chunk[:, 0].copy()
        for j in range(1, rows_per_band):
            bh = bh * _B + chunk[:, j]
        out_doc.append(doc_ids[present])
        out_band.append(np.full(len(present), bi, dtype=np.int32))
        out_hash.append(bh)
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate(out_doc), pa.int64()),
            "band": pa.array(np.concatenate(out_band), pa.int32()),
            "band_hash": pa.array(np.concatenate(out_hash), pa.uint64()),
        }
    )


def shingle_anchor_rows(
    batch: pa.Table,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    shingle_k: int = 3,
    anchor_rate: float = 1.0,
) -> pa.Table:
    """docs batch → (doc_id, band=0, band_hash=shingle_hash) anchor rows
    for n-gram-Jaccard blocking: two docs sharing ANY k-shingle become
    a candidate pair (recall 1.0 for any Jaccard > 0 at rate 1.0),
    exact Jaccard verification decides.  ``anchor_rate`` deterministically
    subsamples the shingle space (multiplicative hash) for scale — at
    rate r, a pair sharing m shingles is missed with prob (1−r)^m.
    Reuses the LSH pair machinery (same row shape)."""
    sh, parent, doc_ids = _batch_shingles(batch, cfg, shingle_k)
    if len(sh):
        order = np.lexsort((sh, parent))
        p, s = parent[order], sh[order]
        keep = np.ones(len(s), dtype=bool)  # unique shingles per doc
        keep[1:] = (p[1:] != p[:-1]) | (s[1:] != s[:-1])
        p, s = p[keep], s[keep]
        if anchor_rate < 1.0:
            m = (s * np.uint64(0x9E3779B97F4A7C15)) < np.uint64(
                int(anchor_rate * 2**64)
            )
            p, s = p[m], s[m]
    else:
        p = np.zeros(0, np.int64)
        s = np.zeros(0, np.uint64)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[p], pa.int64()),
            "band": pa.array(np.zeros(len(p), np.int32), pa.int32()),
            "band_hash": pa.array(s, pa.uint64()),
        }
    )


def lsh_candidate_pairs(
    band_ds: "ray.data.Dataset",
    *,
    coarse_buckets: int = 256,
    max_run: int | None = None,
) -> "ray.data.Dataset":
    """(doc_id, band, band_hash) → distinct candidate (doc_a, doc_b) pairs.

    The LSH "join" groups equal (band, band_hash) rows — but grouping
    on the raw key would invoke the reducer once per (mostly singleton)
    group, so the shuffle key is a COARSE hash bucket and each reducer
    resolves its sub-buckets vectorized (lexsort + run boundaries +
    triu per run — only runs of ≥2 rows, i.e. real collisions, cost
    anything).  Pairs found by multiple bands are deduped by a second
    PACKED exchange keyed by a pair-hash bucket (within-task distinct
    first, then a per-bucket vectorized distinct — see ``dedup_pairs``
    below).  Pathological buckets (many docs sharing a band
    hash) emit O(m²) pairs by the op's semantics; salt upstream if a
    key class explodes.
    """

    # PACKED exchange (the pack.py / spans.py discipline): the band
    # rows are docs × bands tiny rows; shipping them row-granular
    # through the groupby makes the sort machinery the cost.  Each
    # batch instead packs its per-coarse-bucket arrays into ONE binary
    # row (raw little-endian bytes), so the exchange moves ~buckets
    # rows per batch and the reducer decodes with np.frombuffer.
    def pack_bands(b: pa.Table) -> pa.Table:
        from refimage_ray.functions.packexchange import pack_by_bucket

        bh = b["band_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        band = b["band"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mixed = (bh ^ (band.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)))
        coarse = (mixed % np.uint64(coarse_buckets)).astype(np.int64)
        return pack_by_bucket(
            coarse, {"ids": ids, "band": band, "bh": bh},
            bucket_col="lsh_bucket",
        )

    from refimage_ray.functions.packexchange import packed_empty

    _PAIR_SCHEMA = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
    _PACKED_PAIR_EMPTY = packed_empty(["a", "b"], bucket_col="pair_bucket")

    def bucket_pairs(g: pa.Table) -> pa.Table:
        from refimage_ray.functions.packexchange import unpack_group

        if g.num_rows == 0:
            # NB: this stage EMITS packed pair rows — the empty branch
            # must match that schema, not the final (doc_a, doc_b) one
            return _PACKED_PAIR_EMPTY
        arrs = unpack_group(
            g, {"ids": np.int64, "band": np.int64, "bh": np.uint64}
        )
        ids, band, bh = arrs["ids"], arrs["band"], arrs["bh"]
        order = np.lexsort((ids, bh, band))
        ids, band, bh = ids[order], band[order], bh[order]
        new_run = np.zeros(len(ids), dtype=bool)
        new_run[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
        bounds = np.flatnonzero(new_run)
        out_a, out_b = [], []
        for lo, hi in zip(np.concatenate(([0], bounds)),
                          np.concatenate((bounds, [len(ids)]))):
            m = hi - lo
            if m < 2:
                continue
            if max_run is not None and m > max_run:
                # stop-shingle / mega-bucket guard: a key shared by m
                # docs emits O(m²) pairs — skip it (near-dup pairs
                # almost always also share a rarer key; recall note in
                # the caller docstrings)
                continue
            ia, ib = np.triu_indices(m, k=1)
            out_a.append(ids[lo:hi][ia])
            out_b.append(ids[lo:hi][ib])
        if not out_a:
            return _PACKED_PAIR_EMPTY
        # within-task dedup + pack per pair-hash bucket (shared
        # kernel): a pair found by several bands lands in DIFFERENT
        # lsh_buckets, so the global dedup still needs an exchange,
        # but it moves one binary row per (task, pair_bucket) instead
        # of one row per (pair, band)
        from refimage_ray.functions.packexchange import pack_pairs_distinct

        return pack_pairs_distinct(
            np.concatenate(out_a), np.concatenate(out_b),
            buckets=coarse_buckets,
        )

    def dedup_pairs(g: pa.Table) -> pa.Table:
        from refimage_ray.functions.packexchange import unpack_pairs_distinct

        if g.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        arrs = unpack_pairs_distinct(g)
        return pa.table({
            "doc_a": pa.array(arrs["a"], pa.int64()),
            "doc_b": pa.array(arrs["b"], pa.int64()),
        })

    return (
        band_ds.map_batches(pack_bands, batch_format="pyarrow")
        .groupby("lsh_bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby("pair_bucket")
        .map_groups(dedup_pairs, batch_format="pyarrow")
    )


def exact_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact k-gram (token shingle) Jaccard — the verify step and the
    standalone n-gram-Jaccard dedup primitive (pure, deterministic)."""
    sa = _shingle_set(tokenize(text_a), k)
    sb = _shingle_set(tokenize(text_b), k)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def _shingle_set(tokens: list[str], k: int) -> set[tuple[str, ...]]:
    if len(tokens) == 0:
        return set()
    if len(tokens) < k:
        return {(t,) for t in tokens}
    return {tuple(tokens[i : i + k]) for i in range(len(tokens) - k + 1)}


def _shingle_bounds(
    col: pa.ChunkedArray | pa.Array, n_rows: int, cfg: EngineConfig, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """text column → (shingle_hashes, row_starts, row_ends): per-row
    slices of the flat (parent-sorted) shingle-hash array."""
    tbl = pa.table(
        {"doc_id": pa.array(np.arange(n_rows), pa.int64()), "text": col}
    )
    sh, parent, _ = _batch_shingles(tbl, cfg, k)
    starts = np.searchsorted(parent, np.arange(n_rows))
    ends = np.searchsorted(parent, np.arange(n_rows) + 1)
    return sh, starts, ends


def jaccard_batch(
    text_a: pa.ChunkedArray | pa.Array,
    text_b: pa.ChunkedArray | pa.Array,
    cfg: EngineConfig = DEFAULT_CONFIG,
    k: int = 3,
) -> np.ndarray:
    """Row-wise k-shingle Jaccard of two text columns.

    Shingling is vectorized across the whole batch (one `_batch_shingles`
    pass per column); the per-row set ops run on precomputed uint64
    arrays.  Hash-based: equal to the exact tuple-set Jaccard absent
    64-bit shingle-hash collisions.  Matches `exact_jaccard` edge
    cases: both-empty → 1.0, one-empty → 0.0."""
    n = len(text_a)
    sa, astart, aend = _shingle_bounds(text_a, n, cfg, k)
    sb, bstart, bend = _shingle_bounds(text_b, n, cfg, k)
    out = np.empty(n, dtype=np.float64)
    for i in range(n):
        a = np.unique(sa[astart[i] : aend[i]])
        b = np.unique(sb[bstart[i] : bend[i]])
        if not len(a) and not len(b):
            out[i] = 1.0
        elif not len(a) or not len(b):
            out[i] = 0.0
        else:
            inter = np.intersect1d(a, b, assume_unique=True).size
            out[i] = inter / (len(a) + len(b) - inter)
    return out


PAIR_SCHEMA_J = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("jaccard", pa.float64())]
)


def minhash_near_dup_pairs(
    docs_ds: "ray.data.Dataset",
    *,
    threshold: float = 0.8,
    cfg: EngineConfig = DEFAULT_CONFIG,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    join_buckets: int = 32,
) -> pa.Table:
    """Full MinHash-LSH near-dup pipeline → verified pairs table.

    Fully distributed: banding + LSH groupby produce the candidate
    pairs; the verify step joins the pairs back to the docs' texts with
    the bucketed `hash_join` (twice — once per pair side) and computes
    the exact shingle-Jaccard per batch, vectorized.  Nothing larger
    than the final verified pair set reaches the driver."""
    band_ds = docs_ds.map_batches(
        lambda b: minhash_band_rows(b, cfg, num_perm=num_perm, bands=bands,
                                    shingle_k=shingle_k),
        batch_format="pyarrow",
    )
    cand = lsh_candidate_pairs(band_ds)
    return _verify_pairs_jaccard(
        cand, docs_ds, threshold, cfg, shingle_k, join_buckets
    )


def ngram_jaccard_near_dup_pairs(
    docs_ds: "ray.data.Dataset",
    *,
    threshold: float = 0.8,
    cfg: EngineConfig = DEFAULT_CONFIG,
    shingle_k: int = 3,
    anchor_rate: float = 1.0,
    max_anchor_df: int | None = None,
    join_buckets: int = 32,
) -> pa.Table:
    """Exact n-gram-Jaccard near-dup pairs via shingle-anchor blocking.

    The non-probabilistic sibling of :func:`minhash_near_dup_pairs`:
    candidates are pairs sharing ≥1 k-shingle (an inverted index on
    shingle hashes, grouped distributed), then exact shingle-Jaccard ≥
    ``threshold`` decides.  Defaults are EXACT — recall 1.0 (any pair
    with J > 0 shares a shingle; asserted vs brute force in tests).
    The two scale knobs trade recall for cost: ``anchor_rate``
    subsamples the shingle space, and ``max_anchor_df`` skips anchors
    shared by more than that many docs.  CAUTION with ``max_anchor_df``:
    a duplicate FAMILY larger than the cap shares every anchor at
    df ≥ family size, so the whole family is skipped — cap-based
    pruning suits boilerplate-shingle suppression, not corpora whose
    duplication itself exceeds the cap (use minhash banding there,
    whose bucket sizes stay O(family) not O(shingles×family))."""
    anchor_ds = docs_ds.map_batches(
        lambda b: shingle_anchor_rows(
            b, cfg, shingle_k=shingle_k, anchor_rate=anchor_rate
        ),
        batch_format="pyarrow",
    )
    cand = lsh_candidate_pairs(anchor_ds, max_run=max_anchor_df)
    return _verify_pairs_jaccard(
        cand, docs_ds, threshold, cfg, shingle_k, join_buckets
    )


def _verify_pairs_jaccard(
    cand: "ray.data.Dataset",
    docs_ds: "ray.data.Dataset",
    threshold: float,
    cfg: EngineConfig,
    shingle_k: int,
    join_buckets: int,
    broadcast_pairs_cap: int | None = None,
) -> pa.Table:
    """Candidate (doc_a, doc_b) pairs → exact-Jaccard-verified pairs.

    Size-based physical planning.  Candidate pair sets are tiny
    relative to the corpus (only docs sharing a band/anchor), so the
    default path broadcasts the texts of JUST the candidate doc ids —
    one semi-join filter pass over the corpus, one ``ray.put``, then a
    distributed vectorized verify over the pair batches.  Above
    ``broadcast_pairs_cap`` pairs (env ``REFIMAGE_VERIFY_BROADCAST``)
    it falls back to two corpus-scale bucketed hash joins, which never
    hold more than a bucket on any worker."""
    import os as _os

    import ray as _ray

    from refimage_ray.stages.joins import hash_join

    if broadcast_pairs_cap is None:
        broadcast_pairs_cap = int(
            _os.environ.get("REFIMAGE_VERIFY_BROADCAST", "250000")
        )
    # the candidate DAG ends in an all-to-all; materialize so the two
    # consumers below (count + join/verify) don't re-run it, and so the
    # verify job starts from in-store pair blocks
    cand = cand.materialize()
    n_pairs = cand.count()

    if n_pairs <= broadcast_pairs_cap:
        pair_tbl = collect_small(
            cand,
            pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())]),
        )
        ids = np.unique(
            np.concatenate(
                [
                    pair_tbl["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64),
                    pair_tbl["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64),
                ]
            )
        )
        ids_ref = _ray.put(ids)

        def pick(batch: pa.Table) -> pa.Table:
            from refimage_ray.functions.arrays import sorted_membership

            want = _ray.get(ids_ref)
            bids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            return batch.filter(pa.array(sorted_membership(want, bids)))

        texts_tbl = collect_small(
            docs_ds.select_columns(["doc_id", "text"]).map_batches(
                pick, batch_format="pyarrow"
            ),
            pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
        ).sort_by("doc_id")
        texts_ref = _ray.put(texts_tbl)

        def verify_bcast(batch: pa.Table) -> pa.Table:
            t = _ray.get(texts_ref)
            tid = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            a = batch["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
            b = batch["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
            ia = np.searchsorted(tid, a)
            ib = np.searchsorted(tid, b)
            # candidate ids all come from docs_ds itself
            assert (tid[ia] == a).all() and (tid[ib] == b).all()
            text_a = t["text"].take(pa.array(ia, pa.int64()))
            text_b = t["text"].take(pa.array(ib, pa.int64()))
            j = jaccard_batch(text_a, text_b, cfg, shingle_k)
            keep = j >= threshold
            return pa.table(
                {
                    "doc_a": pa.array(a[keep], pa.int64()),
                    "doc_b": pa.array(b[keep], pa.int64()),
                    "jaccard": pa.array(j[keep], pa.float64()),
                }
            )

        out = collect_small(
            cand.map_batches(verify_bcast, batch_format="pyarrow"),
            PAIR_SCHEMA_J,
        )
        return out.sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])

    texts = docs_ds.select_columns(["doc_id", "text"])

    with_a = hash_join(
        cand, texts, left_on="doc_a", right_on="doc_id",
        left_cols=["doc_a", "doc_b"], right_cols=["doc_id", "text"],
        buckets=join_buckets,
    ).map_batches(
        lambda b: b.drop_columns(["doc_id"]).rename_columns(
            ["doc_a", "doc_b", "text_a"]
        ),
        batch_format="pyarrow",
    )
    with_b = hash_join(
        with_a, texts, left_on="doc_b", right_on="doc_id",
        left_cols=["doc_a", "doc_b", "text_a"], right_cols=["doc_id", "text"],
        buckets=join_buckets,
    ).map_batches(
        lambda b: b.drop_columns(["doc_id"]).rename_columns(
            ["doc_a", "doc_b", "text_a", "text_b"]
        ),
        batch_format="pyarrow",
    )

    def verify(batch: pa.Table) -> pa.Table:
        j = jaccard_batch(batch["text_a"], batch["text_b"], cfg, shingle_k)
        keep = j >= threshold
        return pa.table(
            {
                "doc_a": batch["doc_a"].filter(pa.array(keep)),
                "doc_b": batch["doc_b"].filter(pa.array(keep)),
                "jaccard": pa.array(j[keep], pa.float64()),
            }
        )

    out = collect_small(
        with_b.map_batches(verify, batch_format="pyarrow"), PAIR_SCHEMA_J
    )
    return out.sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])


def dup_clusters(pairs: pa.Table, *, distributed_over: int = 1_000_000) -> pa.Table:
    """Near-dup pairs → connected components: (doc_id, cluster_id)
    with ``cluster_id = min doc_id of the component``.

    Size-based physical planning: driver-side union-find while the
    pair set fits one machine (LSH pair sets are tiny relative to the
    corpus — only near-dups), switching to the distributed
    min-label-propagation rounds of :func:`dup_clusters_distributed`
    above ``distributed_over`` rows.  Both produce identical output
    (cluster_id = component min) by construction.
    """
    if pairs.num_rows > distributed_over:
        import ray.data as rd

        return dup_clusters_distributed(rd.from_arrow(pairs))
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    for a, b in zip(pairs["doc_a"].to_pylist(), pairs["doc_b"].to_pylist()):
        parent.setdefault(int(a), int(a))
        parent.setdefault(int(b), int(b))
        union(int(a), int(b))
    members = sorted(parent)
    return pa.table(
        {
            "doc_id": pa.array(members, pa.int64()),
            "cluster_id": pa.array([find(m) for m in members], pa.int64()),
        }
    )


def dup_clusters_distributed(
    pairs_ds: "ray.data.Dataset",
    *,
    max_rounds: int = 64,
    buckets: int = 64,
) -> pa.Table:
    """Distributed connected components over a near-dup pair set:
    min-label propagation with pointer shortcutting, expressed as two
    PACKED message-passing exchanges per round (no joins).

    Round structure:

    1. **mailbox** — three row kinds keyed by the node whose label is
       needed: label rows ``(key=v, val=label)``, edge rows
       ``(key=src, val=dst)`` ("send me your label"), and shortcut
       queries ``(key=label(v), val=v)`` ("what is label(label(v))?").
       Each map task packs its rows into ONE binary row per coarse
       hash bucket of the key (``functions/packexchange.py`` — edge
       rows are packed ONCE, outside the loop, and reused every
       round); the per-bucket reducer decodes with ``np.frombuffer``
       and resolves every query with a vectorized searchsorted.
    2. **min-combine** — the reducer pre-combines its messages to one
       ``(node, min offered)`` row per node, packs them by a node
       bucket, and a second packed groupby takes the global per-node
       min — the new labels, in at most ``buckets`` blocks.

    The previous row-granular version (plain groupby over one 17-byte
    row per message + a native groupby-Min) spent >20 s PER ROUND on a
    127k-pair graph — the exchange sort machinery, not compute
    (measured 2026-08-20; see BENCH/BASELINE.md).  Packing is the
    repo-wide remedy (27× spans, 45× MinHash LSH).

    Shortcutting gives O(log diameter) rounds on chains.  Labels are
    per-node monotone non-increasing, so an unchanged ``Σ label`` is a
    sound fixpoint witness.  Per-round state is one small
    ``(node, label)`` dataset — never the corpus — and its block count
    is capped at ``buckets`` (the old version grew blocks per round).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from refimage_ray.functions.packexchange import (
        pack_by_bucket,
        packed_empty,
        unpack_group,
    )

    _LABELS_SCHEMA = pa.schema([("node", pa.int64()), ("label", pa.int64())])
    _MSG_DTYPES = {"tag": np.int8, "key": np.int64, "val": np.int64}

    def _bkt(k: np.ndarray) -> np.ndarray:
        return (np.abs(k * np.int64(2654435761)) % np.int64(buckets)).astype(
            np.int64
        )

    def to_edges_packed(b: pa.Table) -> pa.Table:
        a = b["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        bb = b["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.concatenate([a, bb])
        val = np.concatenate([bb, a])
        return pack_by_bucket(
            _bkt(key),
            {"tag": np.ones(len(key), np.int8), "key": key, "val": val},
            bucket_col="mbox",
        )

    edge_rows = pairs_ds.map_batches(
        to_edges_packed, batch_format="pyarrow"
    ).materialize()
    if edge_rows.count() == 0:
        return pa.schema(
            [("doc_id", pa.int64()), ("cluster_id", pa.int64())]
        ).empty_table()

    # init: label(v) = min(v, min neighbor) — one packed exchange
    def init_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _LABELS_SCHEMA.empty_table()
        a = unpack_group(g, _MSG_DTYPES)
        k, v = a["key"], a["val"]
        o = np.lexsort((v, k))
        k, v = k[o], v[o]
        first = np.ones(len(k), dtype=bool)
        first[1:] = k[1:] != k[:-1]
        node = k[first]
        return pa.table({
            "node": pa.array(node, pa.int64()),
            # sorted (k, v): the first row of each key run carries the
            # min neighbor
            "label": pa.array(np.minimum(node, v[first]), pa.int64()),
        })

    labels = (
        edge_rows.groupby("mbox")
        .map_groups(init_bucket, batch_format="pyarrow")
        .materialize()
    )
    prev_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]

    def label_query_packed(b: pa.Table) -> pa.Table:
        node = b["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = lab != node  # only non-root nodes need a shortcut answer
        key = np.concatenate([node, lab[q]])
        tag = np.concatenate(
            [np.zeros(len(node), np.int8), np.full(int(q.sum()), 2, np.int8)]
        )
        val = np.concatenate([lab, node[q]])
        return pack_by_bucket(
            _bkt(key), {"tag": tag, "key": key, "val": val},
            bucket_col="mbox",
        )

    def resolve_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return packed_empty(["node", "label"], bucket_col="nbkt")
        a = unpack_group(g, _MSG_DTYPES)
        tag, key, val = a["tag"], a["key"], a["val"]
        is_lab = tag == 0
        lkey, lval = key[is_lab], val[is_lab]
        order = np.argsort(lkey, kind="stable")
        lkey, lval = lkey[order], lval[order]
        ask = ~is_lab
        # every queried key has a label row by construction (labels
        # are always node ids, and every node has a label row here)
        pos = np.searchsorted(lkey, key[ask])
        node = np.concatenate([val[ask], lkey])
        offered = np.concatenate([lval[pos], lval])
        # pre-combine: one (node, min offered) per node BEFORE the
        # second exchange — the messages' duplication never ships
        o2 = np.lexsort((offered, node))
        node, offered = node[o2], offered[o2]
        first = np.ones(len(node), dtype=bool)
        first[1:] = node[1:] != node[:-1]
        node, offered = node[first], offered[first]
        return pack_by_bucket(
            _bkt(node), {"node": node, "label": offered}, bucket_col="nbkt"
        )

    def min_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _LABELS_SCHEMA.empty_table()
        a = unpack_group(g, {"node": np.int64, "label": np.int64})
        n, lab = a["node"], a["label"]
        o = np.lexsort((lab, n))
        n, lab = n[o], lab[o]
        first = np.ones(len(n), dtype=bool)
        first[1:] = n[1:] != n[:-1]
        return pa.table({
            "node": pa.array(n[first], pa.int64()),
            "label": pa.array(lab[first], pa.int64()),
        })

    for _ in range(max_rounds):
        mailbox = labels.map_batches(
            label_query_packed, batch_format="pyarrow"
        ).union(edge_rows)
        labels = (
            mailbox.groupby("mbox")
            .map_groups(resolve_bucket, batch_format="pyarrow")
            .groupby("nbkt")
            .map_groups(min_bucket, batch_format="pyarrow")
            .materialize()
        )
        # rebase onto the materialized block refs: the per-round
        # union/groupby lineage otherwise grows one link per round and
        # the recursive stats summary overflows the stack near the
        # max_rounds horizon (the pagerank loop's discipline)
        labels = rd.from_arrow_refs(labels.to_arrow_refs())
        cur_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    out = collect_small(
        labels.map_batches(
            lambda b: pa.table({"doc_id": b["node"], "cluster_id": b["label"]}),
            batch_format="pyarrow",
        ),
        pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())]),
    )
    return out.sort_by([("doc_id", "ascending")])


def simhash_batch(batch: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    """64-bit SimHash per doc (Charikar): sign of per-bit ±1 sums over
    token-occurrence hashes.  Vectorized via bit unpacking + add.at.

    The token hash is the md5-prefix u64 (``md5_u64_string_array``) —
    any fixed 64-bit hash gives valid SimHash semantics, and this one
    is reproducible in DuckDB SQL, so ``simhash_values`` and
    ``simhash_near_dups`` carry full value oracles instead of
    rows-only checks."""
    from refimage_ray.functions.hashing import md5_u64_string_array

    n = batch.num_rows
    flat, parent = _flat_tokens(batch["text"], cfg)
    out = np.zeros(n, dtype=np.uint64)
    if len(flat):
        th = md5_u64_string_array(flat)
        bits = np.unpackbits(th.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
        contrib = bits.astype(np.int32) * 2 - 1  # (n_tok, 64) of ±1
        acc = np.zeros((n, 64), dtype=np.int64)
        np.add.at(acc, parent, contrib)
        outbits = (acc > 0).astype(np.uint8)
        out = np.packbits(outbits, axis=1, bitorder="little").view(np.uint64).ravel()
        # docs with no tokens → 0
        empty = np.bincount(parent, minlength=n) == 0
        out[empty] = 0
    return pa.table(
        {"doc_id": batch["doc_id"], "simhash": pa.array(out, pa.uint64())}
    )


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount of XOR (uint64 arrays)."""
    x = np.bitwise_xor(a, b)
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)


def simhash_chunk_rows(
    batch: pa.Table,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    coarse_buckets: int = 256,
) -> pa.Table:
    """docs batch → 4 banding rows per doc: ``(coarse, ckey, doc_id,
    simhash)`` where ``ckey = chunk·2¹⁶ + the chunk's 16-bit value``
    (pigeonhole band key) and ``coarse = hash(ckey) % B`` bounds the
    number of shuffle groups (many tiny ckey groups per reducer call
    would pay per-group overhead — memory: bucket first)."""
    t = simhash_batch(batch, cfg)
    sh = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    keys, docs, hashes = [], [], []
    for chunk in range(4):
        val = ((sh >> np.uint64(16 * chunk)) & np.uint64(0xFFFF)).astype(np.int64)
        keys.append(val + (chunk << 16))
        docs.append(ids)
        hashes.append(sh)
    ckey = np.concatenate(keys)
    coarse = (ckey * np.int64(2654435761)) % np.int64(coarse_buckets)
    return pa.table(
        {
            "coarse": pa.array(np.abs(coarse), pa.int64()),
            "ckey": pa.array(ckey, pa.int64()),
            "doc_id": pa.array(np.concatenate(docs), pa.int64()),
            "simhash": pa.array(np.concatenate(hashes), pa.uint64()),
        }
    )


PAIR_SCHEMA_H = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("hamming", pa.int64())]
)


def simhash_near_dup_pairs(
    docs_ds: "ray.data.Dataset",
    *,
    max_hamming: int = 3,
    cfg: EngineConfig = DEFAULT_CONFIG,
    coarse_buckets: int = 256,
) -> pa.Table:
    """SimHash near-dup: band on 4×16-bit chunks (any doc pair within
    hamming ≤ 3 of a 64-bit hash shares at least one exact 16-bit
    chunk — pigeonhole), then exact hamming verify per bucket.

    Fully distributed: one shuffle co-locates same-chunk-value rows
    (coarse-bucketed so reducer calls are bounded), each reducer emits
    its verified pairs with a vectorized triu+popcount, and a native
    grouped aggregate dedups pairs found via multiple chunks.  Only
    the final pair set reaches the driver.

    Skew note: a run of m identical simhashes (e.g. empty docs) emits
    m·(m−1)/2 pairs by the op's own semantics — cap such classes
    upstream (drop empty docs) when m² is a problem.
    """
    from refimage_ray.functions.packexchange import (
        pack_by_bucket,
        packed_empty,
        unpack_group,
    )

    _PACKED_CHUNK_EMPTY = packed_empty(
        ["doc_id", "simhash", "ckey"], bucket_col="coarse")
    _PACKED_PAIR_H_EMPTY = packed_empty(
        ["a", "b", "d"], bucket_col="pair_bucket")

    # both exchanges packed (functions/packexchange.py): chunk rows are
    # docs × 4 tiny rows, pair rows one per (pair, chunk) — row-granular
    # sort cost dominated both before
    def pack_chunks(b: pa.Table) -> pa.Table:
        rows = simhash_chunk_rows(b, cfg, coarse_buckets=coarse_buckets)
        if rows.num_rows == 0:
            return _PACKED_CHUNK_EMPTY
        return pack_by_bucket(
            rows["coarse"].to_numpy(zero_copy_only=False).astype(np.int64),
            {
                "doc_id": rows["doc_id"].to_numpy(
                    zero_copy_only=False).astype(np.int64),
                "simhash": rows["simhash"].to_numpy(
                    zero_copy_only=False).astype(np.uint64),
                "ckey": rows["ckey"].to_numpy(
                    zero_copy_only=False).astype(np.int64),
            },
            bucket_col="coarse",
        )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PACKED_PAIR_H_EMPTY
        arrs = unpack_group(
            g, {"doc_id": np.int64, "simhash": np.uint64, "ckey": np.int64}
        )
        ids, sh, ck = arrs["doc_id"], arrs["simhash"], arrs["ckey"]
        order = np.lexsort((ids, ck))
        ids, sh, ck = ids[order], sh[order], ck[order]
        bounds = np.flatnonzero(np.diff(ck)) + 1
        out_a, out_b, out_d = [], [], []
        for lo, hi in zip(np.concatenate(([0], bounds)),
                          np.concatenate((bounds, [len(ck)]))):
            m = hi - lo
            if m < 2:
                continue
            ia, ib = np.triu_indices(m, k=1)
            d = hamming_distance(sh[lo:hi][ia], sh[lo:hi][ib])
            keep = d <= max_hamming
            out_a.append(ids[lo:hi][ia[keep]])
            out_b.append(ids[lo:hi][ib[keep]])
            out_d.append(d[keep].astype(np.int64))
        if not out_a:
            return _PACKED_PAIR_H_EMPTY
        # within-task distinct via the shared kernel (hamming is a
        # pure function of the pair, so any occurrence carries THE
        # value — first-kept is correct)
        from refimage_ray.functions.packexchange import pack_pairs_distinct

        return pack_pairs_distinct(
            np.concatenate(out_a), np.concatenate(out_b),
            {"d": np.concatenate(out_d)}, buckets=coarse_buckets,
        )

    def dedup_pairs(g: pa.Table) -> pa.Table:
        from refimage_ray.functions.packexchange import unpack_pairs_distinct

        if g.num_rows == 0:
            return PAIR_SCHEMA_H.empty_table()
        arrs = unpack_pairs_distinct(g, {"d": np.int64})
        return pa.table({
            "doc_a": pa.array(arrs["a"], pa.int64()),
            "doc_b": pa.array(arrs["b"], pa.int64()),
            "hamming": pa.array(arrs["d"], pa.int64()),
        })

    distinct = (
        docs_ds.map_batches(pack_chunks, batch_format="pyarrow")
        .groupby("coarse")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby("pair_bucket")
        .map_groups(dedup_pairs, batch_format="pyarrow")
    )
    out = collect_small(distinct, PAIR_SCHEMA_H)
    return out.sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])
