"""Embedding pipelines over ``{sf_dir}/embeddings.parquet`` —
the direct analog of the reference's vector-search surface
(``/root/reference/src/refimage/search/__init__.py``)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd
from ray.data.aggregate import Count, Sum

from refimage_ray.stages.ann import (
    brute_force_topk,
    embedding_near_dup_pairs,
    ivf_topk,
    lsh_bucketed_topk,
)


def _emb(sf_dir: str) -> "rd.Dataset":
    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _query_vectors(sf_dir: str, vec_ids: list[int]) -> np.ndarray:
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    want = {v: i for i, v in enumerate(vec_ids)}
    rows = t.filter(pc.is_in(t["vec_id"], value_set=pa.array(vec_ids)))
    out = np.zeros((len(vec_ids), len(rows["embedding"][0])), dtype=np.float64)
    for vid, emb in zip(rows["vec_id"].to_pylist(), rows["embedding"].to_pylist()):
        out[want[vid]] = emb
    return out


def knn_cosine(sf_dir: str, query_vec_ids: list[int] = (0, 1), k: int = 10) -> pa.Table:
    """Exact cosine top-k for stored query vectors (reference: FAISS
    IndexFlatIP exact search; self-match at rank 1 expected)."""
    q = _query_vectors(sf_dir, list(query_vec_ids))
    t = brute_force_topk(_emb(sf_dir), q, k=k)
    qid = pa.array(
        [int(query_vec_ids[i]) for i in t["query_id"].to_pylist()], pa.int64()
    )
    return pa.table(
        {
            "query_id": qid,
            "vec_id": t["vec_id"],
            "score": pc.round(t["score"], ndigits=4),
        }
    )


def knn_cosine_filtered(
    sf_dir: str, query_vec_ids: list[int] = (0, 1), k: int = 10,
    labels: tuple = (1, 2),
) -> pa.Table:
    """Filtered vector search (the vector-store "metadata filter + ANN"
    shape): the label predicate applies as a vectorized in-stage mask
    BEFORE the matmul — pre-filtering, so top-k is exact over the
    allowed subset (post-filtering an unfiltered top-k can return
    <k or miss allowed vectors; documented trade-off)."""
    q = _query_vectors(sf_dir, list(query_vec_ids))
    allowed = pa.array(list(labels), pa.int32())

    def gate(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["label"], value_set=allowed))

    t = brute_force_topk(
        _emb(sf_dir).map_batches(gate, batch_format="pyarrow"), q, k=k
    )
    qid = pa.array(
        [int(query_vec_ids[i]) for i in t["query_id"].to_pylist()], pa.int64()
    )
    return pa.table({
        "query_id": qid,
        "vec_id": t["vec_id"],
        "score": pc.round(t["score"], ndigits=4),
    })


def knn_cosine_lsh(sf_dir: str, query_vec_ids: list[int] = (0, 1), k: int = 10) -> pa.Table:
    """Approximate (LSH-bucketed) variant.  VALUE-oracled: the probe
    is deterministic (seeded hyperplanes embed as SQL literals in
    ``__ray_entry__._knn_lsh_sql``), so "approximate vs exact knn"
    does not mean unverifiable — the bucketed candidate set and the
    cosine top-k over it hash-match DuckDB exactly."""
    q = _query_vectors(sf_dir, list(query_vec_ids))
    t = lsh_bucketed_topk(_emb(sf_dir), q, k=k, n_planes=8, multiprobe=1)
    qid = pa.array(
        [int(query_vec_ids[i]) for i in t["query_id"].to_pylist()], pa.int64()
    )
    return pa.table(
        {
            "query_id": qid,
            "vec_id": t["vec_id"],
            "score": pc.round(t["score"], ndigits=4),
        }
    )


def ivf_seeded_centroids(n_centroids: int = 16, dim: int = 64,
                         seed: int = 7) -> np.ndarray:
    """The fixed IVF coarse quantizer for the value-oracled catalogue
    entry: seeded Gaussian centroids that embed verbatim as SQL VALUES
    literals (``__ray_entry__._ivf_sql``), the same determinism trick
    as the LSH hyperplanes."""
    return np.random.default_rng(seed).standard_normal((n_centroids, dim))


def knn_cosine_ivf(sf_dir: str, query_vec_ids: list[int] = (0, 1), k: int = 10) -> pa.Table:
    """IVF-style approximate variant.  VALUE-oracled: the coarse
    quantizer is a seeded-literal centroid set
    (:func:`ivf_seeded_centroids`), so assignment (argmax cosine over
    literal centroids), each query's nprobe probe lists, and the exact
    cosine top-k over the probed candidates are all SQL-expressible —
    "approximate" never meant "unverifiable".  The sample-trained
    quantizer path of ``stages/ann.ivf_topk`` stays recall-tested in
    pytest."""
    q = _query_vectors(sf_dir, list(query_vec_ids))
    t = ivf_topk(
        _emb(sf_dir), q, k=k, n_centroids=16, nprobe=4,
        centroids=ivf_seeded_centroids(16, q.shape[1]),
    )
    qid = pa.array(
        [int(query_vec_ids[i]) for i in t["query_id"].to_pylist()], pa.int64()
    )
    return pa.table(
        {
            "query_id": qid,
            "vec_id": t["vec_id"],
            "score": pc.round(t["score"], ndigits=4),
        }
    )


def hybrid_rrf_topk(
    sf_dir: str,
    query: str = "spark join",
    query_vec_id: int = 0,
    k: int = 10,
    n_each: int = 50,
    rrf_k: int = 60,
) -> pa.Table:
    """Hybrid retrieval: BM25 top-``n_each`` over the inverted index
    ⊕ exact cosine top-``n_each`` over the embeddings table
    (doc_id = vec_id, the corpus convention), fused by reciprocal-rank
    fusion (``query/fusion.py``).

    This is the bridge between the reference's CLIP+FAISS semantic
    search (``/root/reference/src/refimage/search/__init__.py``) and
    this repo's from-scratch BM25 path: both sides stay fully
    distributed top-k operators; only the two rank lists (≤ n_each
    ids each) meet on the driver.
    """
    from refimage_ray.pipelines.search import searcher_for
    from refimage_ray.query.fusion import rrf_fuse

    lex_ids = [d for d, _ in searcher_for(sf_dir).search(query, k=n_each, mode="or")]

    q = _query_vectors(sf_dir, [int(query_vec_id)])
    t = brute_force_topk(_emb(sf_dir), q, k=n_each)
    vec_rows = sorted(
        zip(t["vec_id"].to_pylist(), t["score"].to_pylist()),
        key=lambda x: (-x[1], x[0]),
    )
    vec_ids = [v for v, _ in vec_rows]

    fused = rrf_fuse([lex_ids, vec_ids], k=k, rrf_k=rrf_k)
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in fused], pa.int64()),
            "rrf_score": pa.array([round(s, 6) for _, s in fused], pa.float64()),
        }
    )


def embedding_norm_by_label(sf_dir: str) -> pa.Table:
    """Mean L2 norm per label (vectorized per-batch norms → grouped sums)."""

    def norms(b: pa.Table) -> pa.Table:
        from refimage_ray.stages.ann import _to_matrix

        m = _to_matrix(b["embedding"])
        return pa.table(
            {
                "label": b["label"],
                "norm": pa.array(np.linalg.norm(m, axis=1), pa.float64()),
            }
        )

    out = (
        _emb(sf_dir)
        .map_batches(norms, batch_format="pyarrow")
        .groupby("label")
        .aggregate(Count(alias_name="n_vecs"), Sum("norm", alias_name="sum_norm"))
        .to_pandas()
    )
    out["avg_norm"] = (out["sum_norm"] / out["n_vecs"]).round(4)
    out = out.drop(columns=["sum_norm"]).sort_values("label")
    return pa.Table.from_pandas(out, preserve_index=False)


def lang_embedding_stats(sf_dir: str) -> pa.Table:
    """Cross-table join: document metadata (lang) × embeddings (norm)
    keyed on doc_id = vec_id — the multimodal metadata-join shape
    (reference: vector search results joined back to stored metadata,
    ``/root/reference/src/refimage/api.py:461-474``).  Both sides are
    corpus-sized, so the join is the bucketed ``hash_join`` (no
    broadcast); per-batch norms are computed before the join so only
    (vec_id, norm) — 16 B/row — enters the exchange."""
    from refimage_ray.stages.ann import _to_matrix
    from refimage_ray.stages.joins import hash_join

    def norms(b: pa.Table) -> pa.Table:
        m = _to_matrix(b["embedding"])
        return pa.table(
            {
                "vec_id": b["vec_id"],
                "norm": pa.array(np.linalg.norm(m, axis=1), pa.float64()),
            }
        )

    emb = _emb(sf_dir).map_batches(norms, batch_format="pyarrow")
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"]
    )
    joined = hash_join(
        emb, docs,
        left_on="vec_id", right_on="doc_id",
        left_cols=["vec_id", "norm"], right_cols=["doc_id", "lang"],
        buckets=16,
    )
    out = (
        joined.groupby("lang")
        .aggregate(Count(alias_name="n_vecs"), Sum("norm", alias_name="sum_norm"))
        .to_pandas()
    )
    out["avg_norm"] = (out["sum_norm"] / out["n_vecs"]).round(4)
    out = out.drop(columns=["sum_norm"]).sort_values("lang")
    return pa.Table.from_pandas(out, preserve_index=False)


def embedding_near_dups(sf_dir: str, tau: float = 0.45) -> pa.Table:
    """Exact distributed block-pair cosine near-dup (tau low enough
    that the synthetic embeddings yield real pairs — the oracle has
    teeth at every sf)."""
    pairs = embedding_near_dup_pairs(_emb(sf_dir), tau=tau, method="block")
    return pa.table(
        {
            "vec_a": pairs["vec_a"],
            "vec_b": pairs["vec_b"],
            "cosine": pc.round(pairs["cosine"], ndigits=4),
        }
    )


def embedding_near_dups_lsh(sf_dir: str, tau: float = 0.45) -> pa.Table:
    """Approximate LSH-bucketed variant (recall < 1 vs the exact
    block method — the scale path when n² is off the table).
    VALUE-oracled: the ±1-bit multiprobe emission pairs two vectors
    iff their sign codes differ in ≤ 2 bits, which SQL expresses as
    ``bit_count(xor(b_a, b_b)) <= 2`` over literal-plane buckets
    (``__ray_entry__._lsh_neardup_sql``)."""
    pairs = embedding_near_dup_pairs(_emb(sf_dir), tau=tau, method="lsh")
    return pa.table(
        {
            "vec_a": pairs["vec_a"],
            "vec_b": pairs["vec_b"],
            "cosine": pc.round(pairs["cosine"], ndigits=4),
        }
    )


def knn_cosine_pq(sf_dir: str, query_vec_ids: list[int] = (0, 1), k: int = 10) -> pa.Table:
    """Product-quantized ANN (8×16 codebooks, ADC candidate pool +
    exact re-rank, ``stages/pq.py``).  VALUE-oracled: the codebooks are
    seeded literals (``pq_seeded_codebooks``), so per-subspace
    assignment, the ADC tables, the global ``pool_factor × k``
    candidate pool and the exact-cosine re-rank are all SQL-expressible
    (``__ray_entry__._pq_sql`` — the literal-geometry trick, third
    instance after LSH planes and IVF/k-means centroids).  The
    sample-TRAINED quantizer path stays recall-tested in pytest."""
    from refimage_ray.stages.ann import pq_topk
    from refimage_ray.stages.pq import pq_seeded_codebooks

    q = _query_vectors(sf_dir, list(query_vec_ids))
    m = 8
    t = pq_topk(
        _emb(sf_dir), q, k=k, m=m,
        codebooks=pq_seeded_codebooks(m=m, k=16, dsub=q.shape[1] // m),
    )
    qid = pa.array(
        [int(query_vec_ids[i]) for i in t["query_id"].to_pylist()], pa.int64()
    )
    return pa.table(
        {
            "query_id": qid,
            "vec_id": t["vec_id"],
            "score": pc.round(t["score"], ndigits=4),
        }
    )


def kmeans_seeded_centroids(k: int = 8, dim: int = 64,
                            seed: int = 3) -> np.ndarray:
    """Fixed centroids for the value-oracled assignment histogram —
    seeded Gaussian rows scaled to ``1/√dim`` (the stored embeddings
    are unit-norm, so unscaled Gaussian centroids would capture the
    whole corpus in 1-2 cells and leave the oracle toothless; at this
    scale every cell is populated at every sf) that embed as SQL
    VALUES literals (``__ray_entry__._kmeans_sizes_sql``)."""
    return (np.random.default_rng(seed).standard_normal((k, dim))
            / np.sqrt(dim))


def _seeded_assign_fn(sf_dir: str, k: int):
    """ONE engine-side definition of assignment under the seeded
    literal centroids: argmax of ``2·x·c − |c|²`` with ``|c|²`` from
    the same numpy reduction ``__ray_entry__._centroid_values`` embeds
    as SQL literals.  Shared by :func:`kmeans_cluster_sizes` and
    :func:`semdedup_losers_fixed` so the oracle-critical float form
    cannot silently diverge between the two queries.  Returns a
    ``(n, d) float64 matrix → (n,) int64 cluster ids`` callable (safe
    to close over in ``map_batches`` — state rides one ``ray.put``)."""
    import ray

    first = next(pq.ParquetFile(
        os.path.join(sf_dir, "embeddings.parquet")
    ).iter_batches(batch_size=1, columns=["embedding"]))
    dim = len(first["embedding"][0])  # one-row dim probe
    cents = kmeans_seeded_centroids(k, dim)
    c2 = (cents * cents).sum(axis=1)  # the oracle's literal, same op
    cref = ray.put((cents, c2))

    def assign(mat: np.ndarray) -> np.ndarray:
        c, n2 = ray.get(cref)
        score = 2.0 * (mat @ c.T) - n2[None, :]
        return score.argmax(axis=1).astype(np.int64)

    return assign


def kmeans_cluster_sizes(sf_dir: str, k: int = 8) -> pa.Table:
    """Cluster-size histogram of the distributed k-means ASSIGNMENT
    step (one centroid broadcast + one narrow map + a count groupby)
    under seeded-literal centroids.  VALUE-oracled: with fixed
    centroids, per-vector argmin-L2 reduces to argmax of
    ``2·x·c − |c|²`` (``|x|²`` is constant per row) — computed HERE in
    exactly that form, with ``|c|²`` from the same numpy reduction the
    oracle embeds as literals, so the engine and DuckDB compare the
    SAME floats (the ``|x|² − 2x·c + |c|²`` expansion would add a
    per-row term the SQL lacks and could flip near-tie vectors).
    Lloyd TRAINING (``kmeans_fit``/``kmeans_assign``) stays
    pytest-verified (SSE monotone, blob recovery, numpy-argmin
    identity) and is exercised end-to-end by ``semdedup_losers``."""
    from ray.data.aggregate import Count

    from refimage_ray.stages.ann import _to_matrix

    emb = _emb(sf_dir)
    assign_ids = _seeded_assign_fn(sf_dir, k)

    def assign(b: pa.Table) -> pa.Table:
        mat = _to_matrix(b["embedding"]).astype(np.float64)
        if mat.shape[0] == 0:
            return pa.table({"cluster": pa.array([], pa.int64())})
        return pa.table({"cluster": pa.array(assign_ids(mat))})

    out = (
        emb.select_columns(["embedding"])
        .map_batches(assign, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values("cluster")
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def semdedup_losers(
    sf_dir: str, k: int = 8, tau: float = 0.45, n_iter: int = 5
) -> pa.Table:
    """SemDeDup (Abbas et al. 2023): semantic dedup of an embedding
    corpus by (1) distributed k-means clustering, (2) exact cosine
    pairs WITHIN each cluster only — the cluster is the blocking key,
    so the pairwise work is O(Σ|cluster|²) instead of O(n²) — and
    (3) connected components keeping the minimum id per component.
    Returns the losers: ``(vec_id, keep_id)`` rows for every vector
    that would be dropped.  Rows-only (clustering is iterative); the
    composition reuses three independently-verified operators
    (kmeans laws, block-pair == LSH-free exact oracle pairs,
    union-find == min-label propagation).

    Scale note: with k sized so clusters fit a reducer, step 2 is one
    shuffle; SemDeDup's published recipe accepts the cross-cluster
    miss (two near-dups split by the quantizer are not compared) —
    that approximation is inherent to the method, not this
    implementation."""
    import ray

    from refimage_ray.stages.ann import embedding_near_dup_pairs
    from refimage_ray.stages.dedup_near import dup_clusters
    from refimage_ray.stages.kmeans import kmeans_fit

    emb = _emb(sf_dir)
    cents, _ = kmeans_fit(emb, k, n_iter=n_iter)
    cref = ray.put(cents)

    def add_cluster(b: pa.Table) -> pa.Table:
        from refimage_ray.stages.ann import _to_matrix

        c = ray.get(cref)
        mat = _to_matrix(b["embedding"]).astype(np.float64)
        if mat.shape[0] == 0:
            return b.append_column("cluster", pa.array([], pa.int64()))
        d2 = ((mat * mat).sum(axis=1)[:, None] - 2.0 * (mat @ c.T)
              + (c * c).sum(axis=1)[None, :])
        return b.append_column(
            "cluster", pa.array(d2.argmin(axis=1).astype(np.int64))
        )

    clustered = emb.map_batches(add_cluster, batch_format="pyarrow")
    pairs = embedding_near_dup_pairs(clustered, tau=tau, group_col="cluster")
    comp = dup_clusters(pa.table({
        "doc_a": pairs["vec_a"], "doc_b": pairs["vec_b"],
    }))
    losers = comp.filter(
        pc.not_equal(comp["doc_id"], comp["cluster_id"])
    )
    return pa.table({
        "vec_id": losers["doc_id"],
        "keep_id": losers["cluster_id"],
    })


def semdedup_losers_fixed(sf_dir: str, k: int = 8, tau: float = 0.45) -> pa.Table:
    """SemDeDup over SEEDED LITERAL centroids — the value-oracle
    variant of :func:`semdedup_losers`: the same blocking → within-
    cluster exact cosine pairs → connected-components composition,
    with the trained quantizer swapped for
    :func:`kmeans_seeded_centroids` (assignment computed as
    ``argmax(2·x·c − |c|²)``, the exact form the SQL compares), so
    every step is SQL-expressible (``__ray_entry__._semdedup_fixed_sql``
    — literal centroids + join-blocked pairs + a recursive
    reachability CTE).  ``semdedup_losers`` (Lloyd-TRAINED blocking)
    stays rows-only and keeps exercising ``kmeans_fit`` end-to-end.

    Note the two variants legitimately differ in OUTPUT (different
    quantizers miss different cross-cluster pairs); both implement the
    published SemDeDup recipe, which accepts the quantizer-dependent
    miss."""
    from refimage_ray.stages.ann import _to_matrix, embedding_near_dup_pairs
    from refimage_ray.stages.dedup_near import dup_clusters

    emb = _emb(sf_dir)
    assign_ids = _seeded_assign_fn(sf_dir, k)

    def add_cluster(b: pa.Table) -> pa.Table:
        mat = _to_matrix(b["embedding"]).astype(np.float64)
        if mat.shape[0] == 0:
            return b.append_column("cluster", pa.array([], pa.int64()))
        return b.append_column("cluster", pa.array(assign_ids(mat)))

    clustered = emb.map_batches(add_cluster, batch_format="pyarrow")
    pairs = embedding_near_dup_pairs(clustered, tau=tau, group_col="cluster")
    comp = dup_clusters(pa.table({
        "doc_a": pairs["vec_a"], "doc_b": pairs["vec_b"],
    }))
    losers = comp.filter(
        pc.not_equal(comp["doc_id"], comp["cluster_id"])
    )
    return pa.table({
        "vec_id": losers["doc_id"],
        "keep_id": losers["cluster_id"],
    })


def embedding_pca_stats(sf_dir: str, top: int = 8) -> pa.Table:
    """Distributed PCA spectrum: per-batch (n, Σx, XᵀX) partials — one
    (1 + d + d²)-float row per block regardless of batch size — are
    the WHOLE exchange; the d×d eigenproblem is driver-side (d is
    model-dimension small).  Returns the top eigenvalues and explained
    variance ratios (rows-only: no SQL eigensolver exists; the math is
    pytest-verified against numpy.cov/eigh on the gathered matrix).
    """

    def partials(b: pa.Table) -> pa.Table:
        from refimage_ray.stages.ann import _to_matrix

        mat = _to_matrix(b["embedding"])
        n, d = mat.shape
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "sum": pa.array([mat.sum(axis=0).tolist()],
                                pa.list_(pa.float64())),
                "xtx": pa.array([(mat.T @ mat).ravel().tolist()],
                                pa.list_(pa.float64())),
            }
        )

    # deterministic reduce: sum partials in a canonical order (blocks
    # arrive in nondeterministic order; float addition isn't
    # associative).  Full-content key — first-element-only keys would
    # leave tied rows in arrival order.  Content-bucketed tree reduce
    # above the driver cap (the >10^5-block path).
    from refimage_ray.functions.arrays import canonical_tree_sum

    agg = canonical_tree_sum(
        _emb(sf_dir).select_columns(["embedding"])
        .map_batches(partials, batch_format="pyarrow"),
        key_fn=lambda r: (r["n"], r["sum"], r["xtx"]),
    )
    n = agg["n"]
    d = len(agg["sum"])
    s = np.asarray(agg["sum"])
    xtx = np.asarray(agg["xtx"])
    xtx = xtx.reshape(d, d)
    mean = s / n
    cov = (xtx - n * np.outer(mean, mean)) / (n - 1)
    evals = np.linalg.eigvalsh(cov)[::-1]  # descending
    total = float(evals.sum())
    top = min(top, d)
    return pa.table(
        {
            "component": pa.array(range(1, top + 1), pa.int64()),
            "eigenvalue": pa.array(np.round(evals[:top], 6), pa.float64()),
            "explained_ratio": pa.array(
                np.round(evals[:top] / total, 6), pa.float64()
            ),
        }
    )
