"""Similarity search: brute-force exact top-k (vs naive numpy oracle),
LSH recall, embedding near-dup."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from refimage_ray.stages.ann import (
    _normalize,
    brute_force_topk,
    embedding_near_dup_pairs,
    lsh_bucketed_topk,
)


@pytest.fixture(scope="module")
def emb_table():
    rng = np.random.default_rng(7)
    m = rng.standard_normal((400, 16))
    m[37] = m[11] * 1.001 + 0.0001  # planted near-dup pair
    return pa.table(
        {
            "vec_id": pa.array(range(400), pa.int64()),
            "embedding": pa.array([row.tolist() for row in m],
                                  pa.list_(pa.float32())),
        }
    ), m.astype(np.float32).astype(np.float64)


def _naive_topk(m, q, k):
    mn = _normalize(m)
    qn = _normalize(np.atleast_2d(q))
    out = []
    for qi in range(qn.shape[0]):
        s = mn @ qn[qi]
        order = np.lexsort((np.arange(len(s)), -s))[:k]
        out.append([(int(i), float(s[i])) for i in order])
    return out


def test_brute_force_matches_naive(ray_session, emb_table):
    table, m = emb_table
    rng = np.random.default_rng(3)
    q = rng.standard_normal((3, 16))
    got = brute_force_topk(rd.from_arrow(table), q, k=10).to_pandas()
    exp = _naive_topk(m, q, 10)
    for qi in range(3):
        sub = got[got.query_id == qi]
        assert [(int(v), pytest.approx(s)) for v, s in zip(sub.vec_id, sub.score)] == [
            (v, pytest.approx(s)) for v, s in exp[qi]
        ]


def test_brute_force_self_query_rank1(ray_session, emb_table):
    """Query with a stored vector → itself at rank 1, score ≈ 1
    (analog of /root/reference/tests/test_driver_real.py:139-144)."""
    table, m = emb_table
    got = brute_force_topk(rd.from_arrow(table), m[42], k=3).to_pandas()
    assert int(got.iloc[0].vec_id) == 42
    assert got.iloc[0].score == pytest.approx(1.0, abs=1e-9)


def test_lsh_recall_reasonable(ray_session, emb_table):
    table, m = emb_table
    q = m[100]
    exact = {v for v, _ in _naive_topk(m, q, 10)[0]}
    approx = lsh_bucketed_topk(rd.from_arrow(table), q, k=10, n_planes=6,
                               multiprobe=1).to_pandas()
    got = set(approx.vec_id.astype(int))
    assert 100 in got                      # self always in its own bucket
    assert len(exact & got) >= 3           # reasonable recall with multiprobe


def test_embedding_near_dup(ray_session, emb_table):
    table, _ = emb_table
    pairs = embedding_near_dup_pairs(rd.from_arrow(table), tau=0.999).to_pandas()
    assert (11, 37) in set(zip(pairs.vec_a, pairs.vec_b))


def test_near_dup_respects_groups(ray_session, emb_table):
    table, _ = emb_table
    with_label = table.append_column(
        "label", pa.array([i % 2 for i in range(table.num_rows)], pa.int32())
    )
    pairs = embedding_near_dup_pairs(
        rd.from_arrow(with_label), tau=0.999, group_col="label"
    ).to_pandas()
    # 11 and 37 share label (both odd)
    assert (11, 37) in set(zip(pairs.vec_a, pairs.vec_b))


def test_ivf_recall_and_self_match(ray_session, emb_table):
    from refimage_ray.stages.ann import ivf_topk

    table, m = emb_table
    q = m[7]
    exact = {v for v, _ in _naive_topk(m, q, 10)[0]}
    approx = ivf_topk(rd.from_arrow(table), q, k=10, n_centroids=8,
                      nprobe=4).to_pandas()
    got = set(approx.vec_id.astype(int))
    assert 7 in got                       # self lands in its own cell
    assert len(exact & got) >= 4          # decent recall at nprobe=4
    # deterministic across invocations
    again = ivf_topk(rd.from_arrow(table), q, k=10, n_centroids=8,
                     nprobe=4).to_pandas()
    assert approx.equals(again)


def _naive_near_dups(ids, m, tau):
    from refimage_ray.stages.ann import _normalize

    mn = _normalize(m.astype(np.float64))
    sims = mn @ mn.T
    rows = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if sims[i, j] >= tau:
                rows.append((int(ids[i]), int(ids[j]), sims[i, j]))
    rows.sort()
    return rows


def test_block_near_dup_exact_vs_naive(ray_session, emb_table):
    """The distributed block-pair method must be EXACT: identical pair
    set and cosines to the naive all-pairs loop, at a tau that yields
    real pairs — and without any driver-side Dataset.to_pandas."""
    import ray.data

    table, m = emb_table
    ids = table["vec_id"].to_numpy()
    want = _naive_near_dups(ids, m, 0.6)
    assert len(want) >= 1  # fixture must have teeth

    orig = ray.data.Dataset.to_pandas
    try:
        def boom(self, *a, **k):
            raise AssertionError("driver-side to_pandas in block near-dup")
        ray.data.Dataset.to_pandas = boom
        got_t = embedding_near_dup_pairs(
            rd.from_arrow(table), tau=0.6, method="block", blocks=4
        )
    finally:
        ray.data.Dataset.to_pandas = orig
    got = list(
        zip(
            got_t["vec_a"].to_pylist(),
            got_t["vec_b"].to_pylist(),
            got_t["cosine"].to_pylist(),
        )
    )
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want]
    for (_, _, g), (_, _, w) in zip(got, want):
        assert g == pytest.approx(w, abs=1e-12)


def test_lsh_near_dup_finds_close_pairs(ray_session, emb_table):
    table, _ = emb_table
    pairs = embedding_near_dup_pairs(
        rd.from_arrow(table), tau=0.999, method="lsh", n_planes=6
    ).to_pandas()
    # 11/37 are near-identical -> same bucket w.h.p. under multiprobe
    assert (11, 37) in set(zip(pairs.vec_a, pairs.vec_b))
    exact = embedding_near_dup_pairs(
        rd.from_arrow(table), tau=0.999, method="block"
    ).to_pandas()
    # LSH pairs are a subset of the exact pairs
    assert set(zip(pairs.vec_a, pairs.vec_b)) <= set(zip(exact.vec_a, exact.vec_b))


def test_brute_force_boundary_ties_keep_smallest_ids(ray_session):
    """Regression: the per-batch argpartition dropped tied lower
    vec_ids at the k boundary; duplicate embeddings must resolve by
    vec_id asc exactly like the SQL oracle's ORDER BY."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from refimage_ray.stages.ann import brute_force_topk

    # 8 identical vectors (all tie at cosine 1.0) + 4 orthogonal ones
    emb = [[1.0, 0.0]] * 8 + [[0.0, 1.0]] * 4
    ids = [50, 40, 30, 20, 10, 60, 70, 80, 1, 2, 3, 4]
    ds = rd.from_arrow(pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(emb, pa.list_(pa.float64())),
        }
    )).repartition(4)  # ties split across batches
    out = brute_force_topk(ds, np.array([[1.0, 0.0]]), k=3)
    assert out["vec_id"].to_pylist() == [10, 20, 30]  # smallest tied ids
    assert all(abs(s - 1.0) < 1e-12 for s in out["score"].to_pylist())


def test_ann_empty_block_passthrough(ray_session):
    """Regression: an all-filtered (zero-row) block crashed
    _to_matrix's reshape inside the partial top-k."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from refimage_ray.stages.ann import brute_force_topk

    t = pa.table(
        {
            "vec_id": pa.array([1, 2], pa.int64()),
            "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]],
                                  pa.list_(pa.float64())),
        }
    )
    ds = rd.from_arrow(t).filter(lambda r: r["vec_id"] < 100)  # no-op filter
    empty = rd.from_arrow(t.slice(0, 0))
    out = brute_force_topk(ds.union(empty), np.array([[1.0, 0.0]]), k=2)
    assert out["vec_id"].to_pylist() == [1, 2]


def test_reduce_topk_schema_stable_on_empty_blocks(ray_session):
    """The tree reduce must keep the typed (query_id, vec_id, score)
    schema on every intermediate block — including when most exchange
    partitions are empty — and return a typed empty table for an
    all-empty input (the map_groups path lost schema here, firing
    Ray's RefBundle schema-drift warning; see _reduce_topk)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from refimage_ray.stages.ann import _TOPK_SCHEMA, _reduce_topk

    def partial(i):
        return pa.table(
            {
                "query_id": pa.array([0, 1], pa.int64()),
                "vec_id": pa.array([i, 1000 + i], pa.int64()),
                "score": pa.array([float(i % 7), float(i % 5)], pa.float64()),
            }
        )

    tables = [partial(i) if i % 3 == 0 else _TOPK_SCHEMA.empty_table()
              for i in range(30)]
    partials = rd.from_arrow(tables)
    out = _reduce_topk(partials, 3, 2)
    assert out.schema == _TOPK_SCHEMA
    # query 0: scores are i % 7 for i in 0,3,...,27 → 6.0 at i=6,27
    q0 = out.filter(pa.compute.equal(out["query_id"], 0))
    assert q0["score"].to_pylist() == [6.0, 6.0, 5.0]
    assert q0["vec_id"].to_pylist() == [6, 27, 12]  # ties → vec_id asc

    # all-empty input: typed empty result, not a schema-less frame
    empty = rd.from_arrow([_TOPK_SCHEMA.empty_table()] * 4)
    out2 = _reduce_topk(empty, 3, 2)
    assert out2.num_rows == 0
    assert out2.schema == _TOPK_SCHEMA


def test_brute_force_topk_empty_dataset(ray_session):
    """A fully-empty embeddings dataset returns a typed empty top-k."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from refimage_ray.stages.ann import _TOPK_SCHEMA, brute_force_topk

    t = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float64())),
        }
    )
    out = brute_force_topk(rd.from_arrow(t), np.array([[1.0, 0.0]]), k=2)
    assert out.num_rows == 0
    assert out.schema == _TOPK_SCHEMA
