"""Distributed Lloyd k-means laws: blob recovery, SSE monotonicity,
assign == numpy argmin, determinism, empty-cluster re-seeding."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from refimage_ray.stages.kmeans import kmeans_assign, kmeans_fit

RNG = np.random.default_rng(7)
CENTERS = np.array([[10.0, 0.0], [-10.0, 0.0], [0.0, 15.0]])


def _blobs(n_per: int = 60) -> pa.Table:
    pts = np.concatenate(
        [c + RNG.normal(0, 0.5, size=(n_per, 2)) for c in CENTERS]
    )
    return pa.table({
        "vec_id": pa.array(range(len(pts)), pa.int64()),
        "embedding": pa.array([row.tolist() for row in pts],
                              pa.list_(pa.float32())),
    })


@pytest.fixture(scope="module")
def blobs(ray_session):
    tbl = _blobs()
    return tbl, rd.from_arrow(tbl)


def test_recovers_blob_partition(blobs):
    tbl, ds = blobs
    cents, hist = kmeans_fit(ds, 3, n_iter=10)
    # each true center has a learned centroid within the blob radius
    for c in CENTERS:
        assert np.min(np.linalg.norm(cents - c, axis=1)) < 1.0
    labels = kmeans_assign(ds, cents).to_pandas().sort_values("vec_id")
    # all points of one blob share a cluster, blobs get distinct clusters
    lab = labels["cluster"].to_numpy()
    blocks = [set(lab[i * 60:(i + 1) * 60]) for i in range(3)]
    assert all(len(b) == 1 for b in blocks)
    assert len(set().union(*blocks)) == 3


def test_sse_monotone_nonincreasing(blobs):
    _, ds = blobs
    _, hist = kmeans_fit(ds, 3, n_iter=8, tol=0.0)
    assert all(b <= a + 1e-9 for a, b in zip(hist, hist[1:])), hist


def test_assign_matches_numpy(blobs):
    tbl, ds = blobs
    cents, _ = kmeans_fit(ds, 3, n_iter=5)
    got = kmeans_assign(ds, cents).to_pandas().sort_values("vec_id")
    mat = np.stack(tbl["embedding"].to_pandas().to_numpy()).astype(np.float64)
    d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assert (got["cluster"].to_numpy() == d2.argmin(axis=1)).all()
    np.testing.assert_allclose(
        got["dist2"].to_numpy(), d2.min(axis=1), rtol=1e-9, atol=1e-9
    )


def test_deterministic(blobs):
    _, ds = blobs
    a, ha = kmeans_fit(ds, 3, n_iter=4)
    b, hb = kmeans_fit(ds, 3, n_iter=4)
    np.testing.assert_array_equal(a, b)
    assert ha == hb


def test_empty_cluster_reseeded(ray_session):
    # 2 identical points, k=2: one cluster must go empty and re-seed
    tbl = pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([[0.0, 0.0], [0.0, 0.0], [5.0, 5.0]],
                              pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl)
    cents, hist = kmeans_fit(ds, 2, n_iter=6)
    assert np.isfinite(cents).all() and len(cents) == 2
    # both real locations found
    assert np.min(np.linalg.norm(cents - np.array([0.0, 0.0]), axis=1)) < 1e-6
    assert np.min(np.linalg.norm(cents - np.array([5.0, 5.0]), axis=1)) < 1e-6


def test_requires_enough_vectors(ray_session):
    tbl = pa.table({
        "vec_id": pa.array([0], pa.int64()),
        "embedding": pa.array([[1.0, 2.0]], pa.list_(pa.float32())),
    })
    with pytest.raises(ValueError, match="init"):
        kmeans_fit(rd.from_arrow(tbl), 3)


def test_empty_cluster_reseeds_off_origin(ray_session):
    """Regression: a zero-vector heavy centroid must still produce a
    DISTINCT re-seed (multiplicative nudge alone maps 0 → 0)."""
    tbl = pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array(
            [[0.0, 0.0], [0.0, 0.0], [0.0, 0.0], [9.0, 0.0]],
            pa.list_(pa.float32())),
    })
    cents, _ = kmeans_fit(rd.from_arrow(tbl), 2, n_iter=8)
    # both true locations recovered despite the origin-heavy start
    assert np.min(np.linalg.norm(cents - np.array([0.0, 0.0]), axis=1)) < 1e-6
    assert np.min(np.linalg.norm(cents - np.array([9.0, 0.0]), axis=1)) < 1e-6
