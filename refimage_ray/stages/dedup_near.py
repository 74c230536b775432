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
seed; shingle hashes are blake2b-based token hashes combined with
uint64 wraparound polynomials.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from refimage_ray.config import DEFAULT_CONFIG, EngineConfig
from refimage_ray.functions.hashing import hash_string_array
from refimage_ray.functions.text import tokenize
from refimage_ray.stages.tokenize import _flat_tokens

_B = np.uint64(1099511628211)


def _minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=num_perm, dtype=np.uint64) | np.uint64(1)  # odd
    b = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64)
    return a, b


def _doc_shingles(th: np.ndarray, k: int) -> np.ndarray:
    """Shingle hashes of ONE doc's token-hash sequence (k-gram windows;
    falls back to unigrams when the doc is shorter than k)."""
    n = len(th)
    if n == 0:
        return np.zeros(0, np.uint64)
    if n < k:
        return np.unique(th)
    sh = th[: n - k + 1].copy()
    for j in range(1, k):
        sh = sh * _B + th[j : n - k + 1 + j]
    return np.unique(sh)


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
    th = hash_string_array(flat) if len(flat) else np.zeros(0, np.uint64)
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


def lsh_candidate_pairs(band_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, band, band_hash) → distinct candidate (doc_a, doc_b) pairs.

    groupby (band, band_hash) is the LSH "join"; each bucket emits its
    pairs; a second groupby dedups pairs found by multiple bands.
    Bucket sizes are bounded in practice (docs sharing a band hash are
    near-dups); pathological buckets should be salted like hot terms.
    """

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype(np.int64)
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})

    pairs = band_ds.groupby(["band", "band_hash"]).map_groups(
        emit_pairs, batch_format="pandas"
    )

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return pairs.groupby(["doc_a", "doc_b"]).map_groups(first, batch_format="pandas")


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


def minhash_near_dup_pairs(
    docs_ds: "ray.data.Dataset",
    texts_lookup,
    *,
    threshold: float = 0.8,
    cfg: EngineConfig = DEFAULT_CONFIG,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> pa.Table:
    """Full MinHash-LSH near-dup pipeline → verified pairs table.

    ``texts_lookup(doc_ids) -> dict[int, str]`` supplies candidate
    texts for exact-Jaccard verification (candidates are few; at scale
    this becomes a broadcast join against the docs artifact).
    """
    band_ds = docs_ds.map_batches(
        lambda b: minhash_band_rows(b, cfg, num_perm=num_perm, bands=bands,
                                    shingle_k=shingle_k),
        batch_format="pyarrow",
    )
    cand = lsh_candidate_pairs(band_ds).to_pandas()
    if len(cand) == 0:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    ids = sorted(set(cand["doc_a"]) | set(cand["doc_b"]))
    texts = texts_lookup(ids)
    rows = []
    for da, db in zip(cand["doc_a"], cand["doc_b"]):
        j = exact_jaccard(texts[int(da)], texts[int(db)], shingle_k)
        if j >= threshold:
            rows.append((int(da), int(db), j))
    rows.sort()
    return pa.table(
        {
            "doc_a": pa.array([r[0] for r in rows], pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], pa.int64()),
            "jaccard": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


def dup_clusters(pairs: pa.Table) -> pa.Table:
    """Near-dup pairs → connected components: (doc_id, cluster_id)
    with ``cluster_id = min doc_id of the component``.

    Driver-side union-find over the candidate-pair set — valid because
    LSH pair sets are tiny relative to the corpus (only near-dups).
    Scale path (documented): iterate min-label propagation as
    ``groupby(doc).aggregate(Min(label))`` rounds until fixpoint when
    the pair set itself outgrows one machine.
    """
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


def simhash_batch(batch: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    """64-bit SimHash per doc (Charikar): sign of per-bit ±1 sums over
    token-occurrence hashes.  Vectorized via bit unpacking + add.at."""
    n = batch.num_rows
    flat, parent = _flat_tokens(batch["text"], cfg)
    out = np.zeros(n, dtype=np.uint64)
    if len(flat):
        th = hash_string_array(flat)
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


def simhash_near_dup_pairs(
    docs_ds: "ray.data.Dataset",
    *,
    max_hamming: int = 3,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> pa.Table:
    """SimHash near-dup: band on 4×16-bit chunks (any doc pair within
    hamming ≤ 3 of a 64-bit hash shares at least one exact 16-bit
    chunk — pigeonhole), then exact hamming verify per bucket."""
    sims = docs_ds.map_batches(
        lambda b: simhash_batch(b, cfg), batch_format="pyarrow"
    ).to_pandas()
    sh = sims["simhash"].to_numpy().astype(np.uint64)
    ids = sims["doc_id"].to_numpy().astype(np.int64)
    seen: set[tuple[int, int]] = set()
    rows = []
    for chunk in range(4):
        key = (sh >> np.uint64(16 * chunk)) & np.uint64(0xFFFF)
        order = np.argsort(key, kind="stable")
        ks = key[order]
        bounds = np.flatnonzero(np.diff(ks)) + 1
        for lo, hi in zip(np.concatenate(([0], bounds)),
                          np.concatenate((bounds, [len(ks)]))):
            if hi - lo < 2:
                continue
            bucket = order[lo:hi]
            for i in range(len(bucket)):
                for j in range(i + 1, len(bucket)):
                    a, b = int(ids[bucket[i]]), int(ids[bucket[j]])
                    if a > b:
                        a, b = b, a
                    if (a, b) in seen:
                        continue
                    seen.add((a, b))
                    d = int(
                        hamming_distance(
                            sh[bucket[i] : bucket[i] + 1], sh[bucket[j] : bucket[j] + 1]
                        )[0]
                    )
                    if d <= max_hamming:
                        rows.append((a, b, d))
    rows.sort()
    return pa.table(
        {
            "doc_a": pa.array([r[0] for r in rows], pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], pa.int64()),
            "hamming": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
