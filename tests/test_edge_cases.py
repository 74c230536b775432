"""Edge cases: empty corpus, unicode, single doc, degenerate configs."""

import pyarrow as pa
import pytest

import ray.data as rd

from refimage_ray.config import EngineConfig
from refimage_ray.functions.text import tokenize
from refimage_ray.index.build import build_index
from refimage_ray.query.engine import LocalSearcher
from refimage_ray.query.oracle import BM25Oracle

CFG = EngineConfig(num_shards=2, salt_buckets=2)


def _docs(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_empty_corpus(ray_session, tmp_path):
    d = str(tmp_path / "empty")
    res = build_index(rd.from_arrow(_docs([])), d, CFG)
    assert res.metrics["n_docs"] == 0
    s = LocalSearcher(d)
    assert s.search("anything", k=5) == []


def test_single_doc(ray_session, tmp_path):
    d = str(tmp_path / "one")
    build_index(rd.from_arrow(_docs(["hello world hello"])), d, CFG)
    s = LocalSearcher(d)
    hits = s.search("hello", k=5)
    assert len(hits) == 1 and hits[0][0] == 0


def test_unicode_text(ray_session, tmp_path):
    texts = ["héllo wörld naïve", "日本語 text mixed ascii here", "résumé café 42"]
    # tokenizer is [a-z0-9]+ over lowercased text: accents/CJK split tokens
    assert tokenize(texts[0]) == ["h", "llo", "w", "rld", "na", "ve"]
    d = str(tmp_path / "uni")
    build_index(rd.from_arrow(_docs(texts)), d, CFG)
    s = LocalSearcher(d)
    oracle = BM25Oracle(list(enumerate(texts)), CFG)
    for q in ["llo", "text mixed", "caf 42", "日本語"]:
        assert s.search(q, k=5) == oracle.search(q, k=5), q


def test_blank_docs_excluded_from_postings(ray_session, tmp_path):
    d = str(tmp_path / "blank")
    res = build_index(rd.from_arrow(_docs(["", "   ", "real words here"])), d, CFG)
    assert res.metrics["n_docs"] == 3  # docs exist...
    s = LocalSearcher(d)
    assert {doc for doc, _ in s.search("real words", k=5)} == {2}  # ...but no postings


def test_rank_identity_uniform_vocab(ray_session, tmp_path):
    """Second corpus distribution: uniform vocab (mostly rare terms —
    exercises the non-hot/non-salted path), dup texts, empty docs."""
    import numpy as np

    rng = np.random.default_rng(11)
    vocab = [f"t{i:04d}" for i in range(3000)]
    texts = []
    for i in range(300):
        n = int(rng.integers(0, 60))
        texts.append(" ".join(rng.choice(vocab, size=n)))
    texts[250] = texts[10]  # exact dup
    d = str(tmp_path / "uni")
    build_index(rd.from_arrow(_docs(texts)), d, CFG)
    s = LocalSearcher(d)
    oracle = BM25Oracle(list(enumerate(texts)), CFG)
    queries = [" ".join(np.random.default_rng(i).choice(vocab, size=3)) for i in range(12)]
    for q in queries + [texts[5][:50], "t0001 t0002"]:
        for mode in ("or", "and"):
            assert s.search(q, k=10, mode=mode) == oracle.search(q, k=10, mode=mode), (q, mode)
