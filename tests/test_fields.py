"""BM25F multi-field scoring (query/fields.py): naive reference
identity, single-field reduction to plain BM25, title-boost
monotonicity."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from refimage_ray.config import EngineConfig
from refimage_ray.functions.text import tokenize
from refimage_ray.index.build import build_index
from refimage_ray.query.engine import LocalSearcher
from refimage_ray.query.fields import bm25f_search

CFG = EngineConfig(num_shards=4, salt_buckets=2)


@pytest.fixture(scope="module")
def field_indexes(ray_session, tiny_docs, tmp_path_factory):
    root = tmp_path_factory.mktemp("bm25f")
    body_dir, title_dir = str(root / "body"), str(root / "title")
    docs = tiny_docs.select(["doc_id", "text"])
    titles = pa.table(
        {
            "doc_id": docs["doc_id"],
            "text": pa.array(
                [" ".join(t.split(" ")[:8]) for t in docs["text"].to_pylist()]
            ),
        }
    )
    build_index(rd.from_arrow(docs), body_dir, CFG)
    build_index(rd.from_arrow(titles), title_dir, CFG)
    return body_dir, title_dir, docs, titles


def _naive_bm25f(field_tables, weights, query, k, idf_field,
                 k1=1.2, b=0.75):
    terms = sorted(set(tokenize(query)))
    stats = {}
    for f, tbl in field_tables.items():
        toks = {d: tokenize(t) for d, t in
                zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())}
        n = len(toks)
        avgdl = sum(len(v) for v in toks.values()) / n
        stats[f] = (toks, avgdl)
    body_toks, _ = stats[idf_field]
    n_docs = len(body_toks)
    scores = {}
    for t in terms:
        df = sum(1 for v in body_toks.values() if t in v)
        if df == 0:
            continue
        idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        wtf = {}
        for f, (toks, avgdl) in stats.items():
            w = weights[f]
            for d, v in toks.items():
                tf = v.count(t)
                if tf:
                    norm = 1.0 - b + b * len(v) / avgdl
                    wtf[d] = wtf.get(d, 0.0) + w * tf / norm
        for d, x in wtf.items():
            scores[d] = scores.get(d, 0.0) + idf * x / (k1 + x)
    out = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return out[:k]


def test_bm25f_matches_naive(field_indexes):
    body_dir, title_dir, docs, titles = field_indexes
    sb, st = LocalSearcher(body_dir), LocalSearcher(title_dir)
    for q in ("spark join", "table scan data", "the merge"):
        got = bm25f_search(
            {"body": (sb, 1.0), "title": (st, 3.0)}, q, k=10,
            idf_field="body",
        )
        want = _naive_bm25f(
            {"body": docs, "title": titles},
            {"body": 1.0, "title": 3.0}, q, 10, "body",
        )
        assert [d for d, _ in got] == [d for d, _ in want], q
        np.testing.assert_allclose(
            [s for _, s in got], [s for _, s in want], rtol=1e-10
        )


def test_single_field_reduces_to_bm25(field_indexes):
    """BM25F over one field with weight 1 IS BM25:
    tf/(tf+k1·norm) == (tf/norm)/(k1 + tf/norm)."""
    body_dir, _, _, _ = field_indexes
    s = LocalSearcher(body_dir)
    for q in ("spark join", "data"):
        plain = s.search(q, k=10)
        f = bm25f_search({"body": (s, 1.0)}, q, k=10)
        assert [d for d, _ in f] == [d for d, _ in plain]
        np.testing.assert_allclose(
            [x for _, x in f], [x for _, x in plain], rtol=1e-12
        )


def test_title_boost_monotone(field_indexes):
    """Raising the title weight must not hurt a title-hit doc's rank."""
    body_dir, title_dir, docs, titles = field_indexes
    sb, st = LocalSearcher(body_dir), LocalSearcher(title_dir)
    q = "spark"
    title_hits = {
        d for d, t in zip(titles["doc_id"].to_pylist(),
                          titles["text"].to_pylist())
        if "spark" in tokenize(t)
    }
    lo = bm25f_search({"body": (sb, 1.0), "title": (st, 0.5)}, q, k=50)
    hi = bm25f_search({"body": (sb, 1.0), "title": (st, 10.0)}, q, k=50)
    rank_lo = {d: i for i, (d, _) in enumerate(lo)}
    rank_hi = {d: i for i, (d, _) in enumerate(hi)}
    for d in title_hits:
        if d in rank_lo and d in rank_hi:
            assert rank_hi[d] <= rank_lo[d], d


def test_bm25f_validation(field_indexes):
    body_dir, _, _, _ = field_indexes
    s = LocalSearcher(body_dir)
    with pytest.raises(ValueError):
        bm25f_search({}, "x")
    with pytest.raises(ValueError):
        bm25f_search({"body": (s, 1.0)}, "x", idf_field="nope")
