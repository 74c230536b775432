"""Distributed PageRank (stages/graph.py) vs numpy power iteration."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from refimage_ray.stages.graph import pagerank


def _numpy_pagerank(edges, iters=20, d=0.85):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for a, _ in edges:
        outdeg[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[outdeg == 0].sum()
        incoming = np.zeros(n)
        for a, b in edges:
            incoming[idx[b]] += r[idx[a]] / outdeg[idx[a]]
        r = (1 - d) / n + d * (incoming + dangling / n)
    return dict(zip(nodes, r))


def _edges_ds(edges):
    return rd.from_arrow(pa.table(
        {"src": pa.array([a for a, _ in edges], pa.string()),
         "dst": pa.array([b for _, b in edges], pa.string())}))


def test_pagerank_matches_numpy(ray_session):
    rng = np.random.default_rng(9)
    nodes = [f"n{i}" for i in range(40)]
    edges = [(nodes[rng.integers(40)], nodes[rng.integers(40)])
             for _ in range(400)]
    got = {r["node"]: r["rank"] for r in pagerank(_edges_ds(edges)).to_pylist()}
    want = _numpy_pagerank(edges)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_dangling_and_multiplicity(ray_session):
    # b is a sink (dangling); a->c twice must weigh twice a->b once
    edges = [("a", "b"), ("a", "c"), ("a", "c"), ("c", "a")]
    got = {r["node"]: r["rank"] for r in pagerank(_edges_ds(edges)).to_pylist()}
    want = _numpy_pagerank(edges)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)
    assert got["c"] > got["b"]  # 2/3 of a's mass vs 1/3


def test_pagerank_empty(ray_session):
    assert pagerank(_edges_ds([])).num_rows == 0


def test_event_transition_pagerank_vs_local(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from refimage_ray.pipelines.relational import event_transition_pagerank

    rng = np.random.default_rng(21)
    n = 2000
    t = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                1_600_000_000_000_000 + rng.integers(0, 10**9, n),
                pa.timestamp("us"),
            ),
            "user_id": pa.array(rng.integers(0, 40, n), pa.int64()),
            "event_type": pa.array(rng.choice(["a", "b", "c", "d"], n)),
            "value": pa.array(rng.random(n), pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = {r["node"]: r["rank"]
           for r in event_transition_pagerank(str(tmp_path)).to_pylist()}
    # local edge derivation
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    edges = []
    for _, g in df.groupby("user_id"):
        ty = g["event_type"].to_numpy()
        edges.extend(zip(ty[:-1], ty[1:]))
    want = _numpy_pagerank(edges)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)
