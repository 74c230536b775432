"""SemDeDup composition: on blob-separated data the cluster blocking is
lossless, so losers == the unclustered exact all-pairs result."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

import refimage_ray.pipelines.vectors as V


@pytest.fixture()
def blob_sf(ray_session, tmp_path, monkeypatch):
    """Fake sf_dir whose embeddings are 2 far blobs, each containing an
    exact-duplicate group (ids 0=1=2 and 10=11) plus singletons."""
    rng = np.random.default_rng(3)
    a = np.array([5.0, 0.0, 0.0])
    b = np.array([-5.0, 0.0, 0.0])
    rows = []
    rows += [(0, a), (1, a), (2, a)]  # dup trio in blob A
    rows += [(3, a + [0.0, 3.0, 0.0])]  # distinct member of blob A
    rows += [(10, b), (11, b)]  # dup pair in blob B
    rows += [(12, b + [0.0, 0.0, 3.0])]
    for i in range(20, 30):  # wide-angle noise members of each blob
        c = a if i % 2 else b
        rows.append((i, c + rng.normal(0, 2.0, 3)))
    tbl = pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([np.asarray(r[1], np.float32).tolist()
                               for r in rows], pa.list_(pa.float32())),
        "label": pa.array([0] * len(rows), pa.int32()),
    })
    import pyarrow.parquet as pq

    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_semdedup_equals_exact_on_separated_blobs(blob_sf):
    got = V.semdedup_losers(blob_sf, k=2, tau=0.999, n_iter=6)
    losers = dict(zip(got["vec_id"].to_pylist(), got["keep_id"].to_pylist()))
    # the planted exact-dup groups must be found (extras may join if a
    # noise point lands nearly collinear — the equality below is the
    # authoritative check)
    assert {k: losers[k] for k in (1, 2, 11)} == {1: 0, 2: 0, 11: 10}

    # cross-check against the unclustered exact pair path
    from refimage_ray.stages.ann import embedding_near_dup_pairs
    from refimage_ray.stages.dedup_near import dup_clusters

    pairs = embedding_near_dup_pairs(
        rd.read_parquet(blob_sf + "/embeddings.parquet"),
        tau=0.999, method="block",
    )
    comp = dup_clusters(pa.table({"doc_a": pairs["vec_a"],
                                  "doc_b": pairs["vec_b"]}))
    exact = {
        d: c for d, c in zip(comp["doc_id"].to_pylist(),
                             comp["cluster_id"].to_pylist()) if d != c
    }
    assert losers == exact


def test_semdedup_no_dups_returns_empty(ray_session, tmp_path):
    import pyarrow.parquet as pq

    pts = np.eye(4, dtype=np.float32) * 7.0
    tbl = pa.table({
        "vec_id": pa.array(range(4), pa.int64()),
        "embedding": pa.array([p.tolist() for p in pts],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * 4, pa.int32()),
    })
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    got = V.semdedup_losers(str(tmp_path), k=2, tau=0.99, n_iter=3)
    assert got.num_rows == 0


def test_semdedup_fixed_losers_point_to_component_min(ray_session, tmp_path):
    """The literal-centroid variant: every loser's keep_id is a smaller
    id that shares its near-dup component; deterministic across runs;
    empty on an all-distinct corpus."""
    import pyarrow.parquet as pq

    rng = np.random.default_rng(4)
    base = rng.standard_normal((6, 64))
    # 3 near-dup pairs (tiny perturbations) + 6 distinct vectors
    pts = np.vstack([base, base[:3] + 1e-3 * rng.standard_normal((3, 64))])
    pts = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    tbl = pa.table({
        "vec_id": pa.array(range(len(pts)), pa.int64()),
        "embedding": pa.array([p.astype(np.float32).tolist() for p in pts],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * len(pts), pa.int32()),
    })
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    got = V.semdedup_losers_fixed(str(tmp_path), k=4, tau=0.98)
    got2 = V.semdedup_losers_fixed(str(tmp_path), k=4, tau=0.98)
    assert got.to_pylist() == got2.to_pylist()  # deterministic
    losers = dict(zip(got["vec_id"].to_pylist(), got["keep_id"].to_pylist()))
    # the 3 perturbed copies (ids 6,7,8) lose to their originals
    # (0,1,2) — UNLESS the fixed quantizer split a pair across cells
    # (allowed by the SemDeDup recipe); every reported loser must
    # point at its smaller near-dup partner
    for v, kkeep in losers.items():
        assert kkeep < v and v >= 6 and kkeep == v - 6
    assert len(losers) >= 1  # the probe has teeth on this data
