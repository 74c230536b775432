"""Two-phase rescoring (ES rescore window): proximity-boosted
re-ranking of the BM25 top-window, positional + text-fallback parity,
naive-reference identity."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from refimage_ray.config import EngineConfig
from refimage_ray.functions.text import tokenize
from refimage_ray.index.build import build_index
from refimage_ray.query.engine import LocalSearcher
from refimage_ray.query.scorer import query_terms

POS_CFG = EngineConfig(num_shards=4, salt_buckets=2, store_positions=True)
PLAIN_CFG = EngineConfig(num_shards=4, salt_buckets=2)


@pytest.fixture(scope="module")
def rescore_indexes(ray_session, tiny_docs, tmp_path_factory):
    root = tmp_path_factory.mktemp("rescoreidx")
    dp, dn = str(root / "pos"), str(root / "plain")
    build_index(rd.from_arrow(tiny_docs), dp, POS_CFG)
    build_index(rd.from_arrow(tiny_docs), dn, PLAIN_CFG)
    return dp, dn


def _naive_rescore(texts, base, terms, k, qw, rw):
    """base: list[(doc, score)] — reference combined ranking."""
    out = []
    tset = sorted(set(terms))
    for d, s in base:
        toks = tokenize(texts[d])
        occ = [
            [i for i, t in enumerate(toks) if t == q] for q in tset
        ]
        best = float("inf")
        for i in range(len(occ)):
            for j in range(i + 1, len(occ)):
                for a in occ[i]:
                    for b in occ[j]:
                        best = min(best, abs(a - b))
        prox = 0.0 if best == float("inf") else 1.0 / (1.0 + best)
        out.append((d, qw * s + rw * prox))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


@pytest.mark.parametrize("which", ["pos", "plain"])
def test_rescore_matches_naive(rescore_indexes, tiny_docs, which):
    dp, dn = rescore_indexes
    s = LocalSearcher(dp if which == "pos" else dn)
    texts = dict(
        zip(tiny_docs["doc_id"].to_pylist(), tiny_docs["text"].to_pylist())
    )
    for q in ("table scan", "spark join query", "data merge"):
        base = s.search(q, k=30)
        terms = query_terms(tokenize(q))
        want = _naive_rescore(texts, base, terms, 10, 1.0, 2.0)
        got = s.search_rescore(q, k=10, window=30, rescore_weight=2.0)
        assert [d for d, _ in got] == [d for d, _ in want], q
        np.testing.assert_allclose(
            [sc for _, sc in got], [sc for _, sc in want], rtol=1e-12
        )


def test_rescore_positional_equals_text_fallback(rescore_indexes):
    dp, dn = rescore_indexes
    sp, sn = LocalSearcher(dp), LocalSearcher(dn)
    for q in ("table scan", "sort merge", "query join data"):
        assert sp.search_rescore(q, k=10, window=40) == sn.search_rescore(
            q, k=10, window=40
        ), q


def test_rescore_changes_ranking(rescore_indexes, tiny_docs):
    """The proximity term must actually matter: with a large rescore
    weight, adjacent-term docs outrank higher-tf-but-spread docs."""
    dp, _ = rescore_indexes
    s = LocalSearcher(dp)
    q = "table scan"
    base = s.search(q, k=30)
    heavy = s.search_rescore(q, k=30, window=30, rescore_weight=50.0)
    assert [d for d, _ in base] != [d for d, _ in heavy]
    # top heavy-rescore doc must contain the two terms closer together
    # than (or as close as) any other window doc
    texts = dict(
        zip(tiny_docs["doc_id"].to_pylist(), tiny_docs["text"].to_pylist())
    )

    def gap(d):
        toks = tokenize(texts[d])
        pa_ = [i for i, t in enumerate(toks) if t == "table"]
        pb = [i for i, t in enumerate(toks) if t == "scan"]
        return min(
            (abs(a - b) for a in pa_ for b in pb), default=float("inf")
        )

    gaps = [gap(d) for d, _ in base]
    assert gap(heavy[0][0]) == min(gaps)


def test_rescore_single_term_is_base(rescore_indexes):
    """<2 distinct terms → prox 0 everywhere → pure base ranking."""
    dp, _ = rescore_indexes
    s = LocalSearcher(dp)
    base = s.search("spark", k=10)
    got = s.search_rescore("spark", k=10, window=25)
    assert got == base


def test_rescore_k_gt_window_raises(rescore_indexes):
    dp, _ = rescore_indexes
    with pytest.raises(ValueError):
        LocalSearcher(dp).search_rescore("table scan", k=20, window=10)


def test_docpart_rescore_matches_term_layout(ray_session, tiny_docs,
                                             tmp_path):
    """DocPartSearcher.search_rescore == the term layout on the same
    corpus: global window via the exact scatter, per-shard proximity
    gaps combined by min.  Position-free artifacts refuse loudly."""
    from refimage_ray.index.docpart import (
        DocPartSearcher,
        build_doc_partitioned,
    )

    dt = str(tmp_path / "term")
    dd = str(tmp_path / "doc")
    dplain = str(tmp_path / "plain")
    build_index(rd.from_arrow(tiny_docs), dt, POS_CFG)
    build_doc_partitioned(rd.from_arrow(tiny_docs), dd, POS_CFG,
                          num_doc_shards=4)
    build_doc_partitioned(rd.from_arrow(tiny_docs), dplain, PLAIN_CFG,
                          num_doc_shards=4)
    st, sd = LocalSearcher(dt), DocPartSearcher(dd)
    for q, w, rw in [("data table", 30, 1.0), ("the data scan", 25, 2.0),
                     ("spark", 20, 1.0)]:
        assert sd.search_rescore(q, k=10, window=w, rescore_weight=rw) == \
            st.search_rescore(q, k=10, window=w, rescore_weight=rw), q
    with pytest.raises(ValueError, match="store_positions"):
        DocPartSearcher(dplain).search_rescore("data table", k=5, window=10)
    with pytest.raises(ValueError, match="window"):
        sd.search_rescore("data", k=30, window=10)
