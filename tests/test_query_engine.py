"""Query serving: distributed == local == oracle; threshold; join."""

import pytest

from refimage_ray.query.engine import (
    DistributedSearcher,
    LocalSearcher,
    lookup_docs,
)
from tests.conftest import FIXTURE_QUERIES


@pytest.fixture(scope="module")
def local(built_index):
    return LocalSearcher(built_index[0])


def test_distributed_matches_local(ray_session, built_index, local):
    d = DistributedSearcher(built_index[0], num_actors=3)
    for q in FIXTURE_QUERIES:
        for mode in ("or", "and"):
            assert d.search(q, k=10, mode=mode) == local.search(q, k=10, mode=mode), q


def test_threshold_filters(local, oracle):
    full = local.search("the data join", k=250, threshold=0.0)
    assert full
    cut = sorted(s for _, s in full)[len(full) // 2]
    got = local.search("the data join", k=250, threshold=cut)
    assert got == [(d, s) for d, s in full if s >= cut]


def test_k_bounds_results(local):
    assert len(local.search("the", k=3)) == 3
    assert len(local.search("qqqqzz", k=3)) == 0  # unknown term


def test_tie_break_by_doc_id(local):
    hits = local.search("the a data", k=200)
    for (d1, s1), (d2, s2) in zip(hits, hits[1:]):
        assert s1 > s2 or (s1 == s2 and d1 < d2)


def test_metadata_join_drops_missing(built_index, local):
    index_dir, _, _ = built_index
    ids = [d for d, _ in local.search("spark", k=5)]
    t = lookup_docs(index_dir, ids + [999999999])  # unknown id dropped (J1)
    assert set(t["doc_id"].to_pylist()) == set(ids)
    assert "url" in t.column_names and "text" not in t.column_names


def test_pruned_equals_full(local, oracle):
    """MaxScore-pruned top-k must be bit-identical to full scoring."""
    for q in FIXTURE_QUERIES + ["the", "the a w050", "spark the merge a"]:
        for k in (1, 3, 10, 50):
            for th in (0.0, 0.3, 1.0):
                full = local.search(q, k=k, threshold=th, prune=False)
                pruned = local.search(q, k=k, threshold=th, prune=True)
                assert pruned == full, (q, k, th)


def test_dsl_over_distributed_searcher(ray_session, built_index):
    """The DSL executor runs unchanged over the actor-pool searcher."""
    from refimage_ray.query.dsl import DSLExecutor

    local = DSLExecutor(LocalSearcher(built_index[0]))
    dist = DSLExecutor(DistributedSearcher(built_index[0], num_actors=2))
    for q in ("merge AND sort", "spark OR vector #en", "the NOT spark"):
        assert dist.execute_query(q, limit=50) == local.execute_query(q, limit=50)
