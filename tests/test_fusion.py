"""Reciprocal-rank fusion: unit laws + the hybrid pipeline end-to-end."""

from __future__ import annotations

import pytest

from refimage_ray.query.fusion import rrf_fuse


def test_rrf_hand_computed():
    # doc 1: rank 1 in A, rank 2 in B; doc 2: rank 2 in A only;
    # doc 3: rank 1 in B only
    out = rrf_fuse([[1, 2], [3, 1]], k=10, rrf_k=60)
    scores = dict(out)
    assert scores[1] == pytest.approx(1 / 61 + 1 / 62, abs=0)
    assert scores[2] == pytest.approx(1 / 62, abs=0)
    assert scores[3] == pytest.approx(1 / 61, abs=0)
    # doc in both lists beats any single-list doc here
    assert out[0][0] == 1


def test_rrf_tie_breaks_by_id_and_truncates():
    # two docs each rank-1 in exactly one list → equal scores → id asc
    out = rrf_fuse([[7], [3]], k=10)
    assert [d for d, _ in out] == [3, 7]
    assert len(rrf_fuse([[1, 2, 3], [4, 5]], k=2)) == 2


def test_rrf_empty_and_validation():
    assert rrf_fuse([], k=5) == []
    assert rrf_fuse([[], []], k=5) == []
    with pytest.raises(ValueError):
        rrf_fuse([[1]], k=5, rrf_k=0)


def test_hybrid_pipeline_fuses_both_sides(ray_session):
    """hybrid_rrf_topk on the sf0.001 tables: the fused list must
    contain the lexical #1 and the vector #1 (self-match of the query
    vector), and scores must equal rrf_fuse of the two rank lists."""
    from refimage_ray.pipelines.search import searcher_for
    from refimage_ray.pipelines.vectors import (
        _emb,
        _query_vectors,
        hybrid_rrf_topk,
    )
    from refimage_ray.stages.ann import brute_force_topk

    sf = "/root/testdata/sf0.001"
    out = hybrid_rrf_topk(sf, query="spark join", query_vec_id=0, k=10)
    got = dict(zip(out["doc_id"].to_pylist(), out["rrf_score"].to_pylist()))

    lex = [d for d, _ in searcher_for(sf).search("spark join", k=50, mode="or")]
    q = _query_vectors(sf, [0])
    t = brute_force_topk(_emb(sf), q, k=50)
    vec = [
        v for v, _ in sorted(
            zip(t["vec_id"].to_pylist(), t["score"].to_pylist()),
            key=lambda x: (-x[1], x[0]),
        )
    ]
    assert vec[0] == 0  # self-match at rank 1
    expect = {d: round(s, 6) for d, s in rrf_fuse([lex, vec], k=10)}
    assert got == expect
    assert lex[0] in got or vec[0] in got
