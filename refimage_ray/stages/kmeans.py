"""Distributed Lloyd k-means over an embedding column.

The canonical Ray-Data shape for iterative centroid refinement (the
full-corpus upgrade of the sample-based ``_kmeans_lite`` coarse
quantizer used by IVF/PQ):

- centroids are broadcast ONCE per iteration via ``ray.put`` — never
  re-shipped per batch;
- each batch emits ONE partial row (per-cluster counts, per-cluster
  vector sums flattened to k·d floats, total SSE) — the whole exchange
  per iteration is ``num_blocks`` rows of k·d+k+1 floats, the same
  sufficient-statistics trick as ``vectors.embedding_pca_stats``;
- the driver reduces the tiny partial table in a canonical order
  (float addition is not associative; block arrival order is not
  deterministic) and recomputes centroids.

Empty clusters are re-seeded deterministically from the centroid with
the largest count (split heuristic), keeping k stable.  Convergence is
the standard Lloyd guarantee: SSE is non-increasing per iteration
(asserted in tests/test_kmeans.py).

At 10^12-vector scale each iteration is one streaming pass; the k·d
driver state is MBs.  No shuffle at any point.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _to_matrix(col) -> np.ndarray:
    from refimage_ray.stages.ann import _to_matrix as _tm

    return _tm(col)


def _init_centroids(emb_ds, k: int, emb_col: str, sample_rows: int) -> np.ndarray:
    """Deterministic init: first ``sample_rows`` vectors in stored order,
    then greedy farthest-point (k-means++ without randomness)."""
    head = emb_ds.limit(sample_rows).to_pandas()
    mat = np.stack(head[emb_col].to_numpy()).astype(np.float64)
    if len(mat) < k:
        raise ValueError(f"need >= {k} vectors to init, got {len(mat)}")
    chosen = [0]
    d2 = ((mat - mat[0]) ** 2).sum(axis=1)
    for _ in range(k - 1):
        nxt = int(np.argmax(d2))
        chosen.append(nxt)
        d2 = np.minimum(d2, ((mat - mat[nxt]) ** 2).sum(axis=1))
    return mat[chosen].copy()


def kmeans_fit(
    emb_ds,
    k: int,
    *,
    n_iter: int = 10,
    tol: float = 1e-6,
    emb_col: str = "embedding",
    sample_rows: int = 4096,
) -> tuple[np.ndarray, list[float]]:
    """Lloyd iterations over the full Dataset.

    Returns ``(centroids (k, d) float64, sse_history)`` where
    ``sse_history[i]`` is the total squared error measured with the
    centroids of iteration ``i`` (non-increasing)."""
    import ray

    cents = _init_centroids(emb_ds, k, emb_col, sample_rows)
    ds = emb_ds.select_columns([emb_col])
    history: list[float] = []
    for _ in range(n_iter):
        cref = ray.put(cents)

        def partial(batch: pa.Table, _cref=cref) -> pa.Table:
            c = ray.get(_cref)
            kk, d = c.shape
            mat = _to_matrix(batch[emb_col])
            if mat.shape[0] == 0:
                return pa.table({
                    "n": pa.array([], pa.list_(pa.int64())),
                    "sums": pa.array([], pa.list_(pa.float64())),
                    "sse": pa.array([], pa.float64()),
                })
            mat = mat.astype(np.float64)
            # ||x-c||² = ||x||² - 2x·c + ||c||²; argmin over c
            d2 = (
                (mat * mat).sum(axis=1)[:, None]
                - 2.0 * (mat @ c.T)
                + (c * c).sum(axis=1)[None, :]
            )
            assign = np.argmin(d2, axis=1)
            sse = float(d2[np.arange(len(mat)), assign].sum())
            counts = np.bincount(assign, minlength=kk).astype(np.int64)
            sums = np.zeros((kk, d))
            np.add.at(sums, assign, mat)
            return pa.table({
                "n": pa.array([counts.tolist()], pa.list_(pa.int64())),
                "sums": pa.array([sums.ravel().tolist()],
                                 pa.list_(pa.float64())),
                "sse": pa.array([sse], pa.float64()),
            })

        # canonical reduce — key includes the sums so even blocks with
        # identical (sse, counts) order deterministically; above the
        # driver cap the same key drives a content-bucketed tree reduce
        # (the >10^5-block path), bit-identical below it
        from refimage_ray.functions.arrays import canonical_tree_sum

        agg = canonical_tree_sum(
            ds.map_batches(partial, batch_format="pyarrow"),
            key_fn=lambda r: (r["sse"], r["n"], r["sums"]),
        )
        counts = np.asarray(agg["n"])
        sums = np.asarray(agg["sums"]).reshape(k, -1)
        history.append(float(agg["sse"]))
        new = cents.copy()
        nonempty = counts > 0
        new[nonempty] = sums[nonempty] / counts[nonempty, None]
        for j in np.flatnonzero(~nonempty):
            # re-seed deterministically: nudge off the heaviest centroid
            # (affine, not multiplicative — a zero-vector centroid would
            # otherwise nudge to itself and stay duplicated forever)
            heavy = int(np.argmax(counts))
            eps = 1e-4 * (j + 1)
            new[j] = new[heavy] * (1.0 + eps) + eps
        shift = float(np.abs(new - cents).max())
        cents = new
        if shift <= tol:
            break
    return cents, history


def kmeans_assign(emb_ds, centroids: np.ndarray, *,
                  id_col: str = "vec_id", emb_col: str = "embedding"):
    """(vec_id, cluster, dist2): one broadcast, one narrow map."""
    import ray

    cref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        mat = _to_matrix(batch[emb_col]).astype(np.float64)
        if mat.shape[0] == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "cluster": pa.array([], pa.int64()),
                "dist2": pa.array([], pa.float64()),
            })
        d2 = (
            (mat * mat).sum(axis=1)[:, None]
            - 2.0 * (mat @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        a = np.argmin(d2, axis=1)
        return pa.table({
            id_col: batch[id_col],
            "cluster": pa.array(a.astype(np.int64)),
            "dist2": pa.array(np.maximum(d2[np.arange(len(mat)), a], 0.0)),
        })

    return emb_ds.select_columns([id_col, emb_col]).map_batches(
        assign, batch_format="pyarrow"
    )
