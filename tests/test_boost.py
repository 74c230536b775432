"""Decay function scoring (query/boost.py): boosted search ≡ re-scoring
the full unboosted result list; ES decay contracts f(0)=1, f(scale)=decay;
composition with where/min_match/offset; distributed ≡ local; docpart.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from refimage_ray.query.boost import DecaySpec
from refimage_ray.query.engine import DistributedSearcher, LocalSearcher


@pytest.fixture(scope="module")
def searcher(built_index):
    index_dir, _, _ = built_index
    return LocalSearcher(index_dir)


def _factor(spec: DecaySpec, x: float) -> float:
    d = abs(x - spec.origin)
    if spec.kind == "exp":
        return float(np.exp(np.log(spec.decay) / spec.scale * d))
    if spec.kind == "gauss":
        return float(np.exp(np.log(spec.decay) * d * d / (spec.scale**2)))
    s = spec.scale / (1 - spec.decay)
    return max(0.0, (s - d) / s)


def _meta(searcher):
    import os

    import pyarrow.dataset as pads

    t = pads.dataset(os.path.join(searcher.index_dir, "docs")).to_table(
        columns=["doc_id", "n_chars", "lang"]
    )
    return {r["doc_id"]: r for r in t.to_pylist()}


def _rescore(full, meta, spec, k):
    boosted = [(d, s * _factor(spec, meta[d]["n_chars"])) for d, s in full]
    boosted.sort(key=lambda h: (-h[1], h[0]))
    return boosted[:k]


SPECS = [
    DecaySpec("n_chars", origin=0.0, scale=500.0, decay=0.5, kind="exp"),
    DecaySpec("n_chars", origin=300.0, scale=200.0, decay=0.5, kind="gauss"),
    DecaySpec("n_chars", origin=400.0, scale=800.0, decay=0.3, kind="linear"),
]


def test_decay_contract_points():
    """f(origin)=1 and f(origin±scale)=decay for every kind."""

    class Col:
        values = np.array([0.0])
        null = None
        is_categorical = False

    for spec in SPECS:
        c = Col()
        c.values = np.array([spec.origin, spec.origin + spec.scale,
                             spec.origin - spec.scale])
        f = spec.factors(c, np.arange(3))
        assert f[0] == pytest.approx(1.0)
        assert f[1] == pytest.approx(spec.decay)
        assert f[2] == pytest.approx(spec.decay)


def test_boosted_equals_rescored_full(searcher):
    meta = _meta(searcher)
    for q in ["the data join", "spark query", "stream"]:
        full = searcher.search(q, k=10**9)
        for spec in SPECS:
            got = searcher.search(q, k=10, boost=spec)
            want = _rescore(full, meta, spec, 10)
            assert [d for d, _ in got] == [d for d, _ in want], (q, spec.kind)
            np.testing.assert_allclose(
                [s for _, s in got], [s for _, s in want], rtol=1e-12
            )


def test_boost_composes_with_where(searcher):
    meta = _meta(searcher)
    spec = SPECS[0]
    full = searcher.search("data join", k=10**9)
    filtered = [(d, s) for d, s in full if meta[d]["lang"] == "en"]
    want = _rescore(filtered, meta, spec, 10)
    got = searcher.search("data join", k=10, boost=spec,
                          where=[("lang", "=", "en")])
    assert [d for d, _ in got] == [d for d, _ in want]


def test_boost_composes_with_min_match_and_offset(searcher):
    meta = _meta(searcher)
    spec = SPECS[1]
    q = "the data join stream"
    base = searcher.search(q, k=10**9, min_match=2)
    want = _rescore(base, meta, spec, 13)[3:]
    got = searcher.search(q, k=10, min_match=2, boost=spec, offset=3)
    assert [d for d, _ in got] == [d for d, _ in want]


def test_boost_threshold_gates_boosted_score(searcher):
    spec = SPECS[0]
    got = searcher.search("data join", k=10**9, boost=spec, threshold=0.05)
    assert got and all(s >= 0.05 for _, s in got)
    unthresh = searcher.search("data join", k=10**9, boost=spec)
    assert got == [(d, s) for d, s in unthresh if s >= 0.05]


def test_boost_distributed_matches_local(built_index):
    index_dir, _, _ = built_index
    loc = LocalSearcher(index_dir)
    dist = DistributedSearcher(index_dir, num_actors=3)
    dist.wait_ready()
    for spec in SPECS:
        for q in ["data join", "spark query"]:
            assert dist.search(q, k=10, boost=spec) == loc.search(
                q, k=10, boost=spec
            )


def test_boost_docpart_matches_flat(built_index, tiny_docs, tmp_path):
    import pyarrow.compute as pc
    import ray.data as rd

    from refimage_ray.index.docpart import (
        DocPartSearcher,
        build_doc_partitioned,
    )

    index_dir, cfg, _ = built_index
    # docpart value columns come from the input table (the flat build
    # computes n_chars itself) — attach it the same way here
    docs_table = tiny_docs.append_column(
        "n_chars", pc.cast(pc.utf8_length(tiny_docs["text"]), pa.int64())
    )
    doc_dir = str(tmp_path / "docpart")
    build_doc_partitioned(
        rd.from_arrow(docs_table), doc_dir, cfg, num_doc_shards=4,
        value_columns=["lang", "n_chars"],
    )
    flat = LocalSearcher(index_dir)
    dp = DocPartSearcher(doc_dir)
    spec = SPECS[0]
    for q in ["data join", "spark query"]:
        assert dp.search(q, k=10, boost=spec) == flat.search(q, k=10, boost=spec)


def test_decay_spec_validation():
    with pytest.raises(ValueError):
        DecaySpec("n_chars", 0, -1.0)
    with pytest.raises(ValueError):
        DecaySpec("n_chars", 0, 1.0, decay=1.5)
    with pytest.raises(ValueError):
        DecaySpec("n_chars", 0, 1.0, kind="step")


def test_decay_rejects_categorical(searcher):
    with pytest.raises(ValueError, match="categorical"):
        searcher.search("data", k=5, boost=DecaySpec("lang", 0, 10.0))
