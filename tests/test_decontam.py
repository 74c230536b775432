"""Decontamination + repetition signals vs naive Python references."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from refimage_ray.config import DEFAULT_CONFIG
from refimage_ray.stages.decontam import benchmark_gram_set, contamination_counts

TOKEN_RE = re.compile(r"[a-z0-9]+")


def _toks(s: str) -> list[str]:
    return TOKEN_RE.findall(s.lower())


def _naive_grams(s: str, n: int) -> list[tuple[str, ...]]:
    t = _toks(s)
    return [tuple(t[i : i + n]) for i in range(len(t) - n + 1)]


def test_contamination_counts_match_naive():
    bench_texts = ["the quick brown fox jumps over the lazy dog tonight"]
    docs = [
        # shares the full 8-gram window twice (overlapping windows)
        "x the quick brown fox jumps over the lazy dog tonight y",
        # shares only a 7-gram → no hit at n=8
        "quick brown fox jumps over the lazy cat",
        # exact copy → every window hits
        bench_texts[0],
        "completely unrelated words here nothing shared at all ok",
    ]
    n = 8
    gs = benchmark_gram_set(pa.array(bench_texts, pa.string()), n)
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    got = contamination_counts(batch, gs, n)
    got_map = dict(zip(got["doc_id"].to_pylist(), got["n_hit_grams"].to_pylist()))

    bench_set = set(_naive_grams(bench_texts[0], n))
    want = {
        i: sum(g in bench_set for g in _naive_grams(d, n))
        for i, d in enumerate(docs)
    }
    want = {i: c for i, c in want.items() if c > 0}
    assert got_map == want
    assert 1 not in got_map  # the 7-gram doc must NOT hit


def test_ngram_hash_does_not_cross_doc_boundary():
    """Adjacent docs whose concatenated tokens form a bench gram must
    not produce a false hit (the parent-span mask)."""
    bench = ["a b c d e f g h"]
    gs = benchmark_gram_set(pa.array(bench, pa.string()), 8)
    batch = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a b c d", "e f g h"], pa.string()),
        }
    )
    got = contamination_counts(batch, gs, 8)
    assert got.num_rows == 0


def test_repetition_stats_match_naive(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from refimage_ray.pipelines.corpus import repetition_stats

    texts = [
        "spam spam spam spam eggs",          # word 4/5, bigram "spam spam" 3/4
        "a b a b a b",                        # word 3/6, bigram "a b" 3/5
        "one two three four five",            # all unique: 1/5, 1/4
        "solo",                               # single token: 1/1, no bigrams → 0
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    sf = str(tmp_path)
    pq.write_table(tbl, f"{sf}/documents.parquet")
    got = repetition_stats(sf).to_pandas().sort_values("doc_id")
    np.testing.assert_allclose(
        got["top_word_frac"].to_numpy(),
        [4 / 5, 3 / 6, 1 / 5, 1.0],
        atol=1e-6,
    )
    np.testing.assert_allclose(
        got["top_bigram_frac"].to_numpy(),
        [3 / 4, 3 / 5, 1 / 4, 0.0],
        atol=1e-6,
    )


def test_dup_span_stats_matches_naive(ray_session, tmp_path):
    """Planted duplicated spans: engine counts == naive python count."""
    import pyarrow.parquet as pq

    from refimage_ray.functions.text import tokenize
    from refimage_ray.pipelines.corpus import dup_span_stats

    texts = [
        "alpha beta gamma delta epsilon",      # shares 'alpha beta gamma delta' w/ 1
        "zzz alpha beta gamma delta yyy",
        "one two three four five six",         # unique
        "one two three foo bar baz",           # shares 'one two three' w/ 2
        "solo words only here now",            # unique
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    n = 3
    grams = [
        [tuple(tokenize(t)[i:i + n]) for i in range(len(tokenize(t)) - n + 1)]
        for t in texts
    ]
    from collections import Counter

    docs_of = {}
    for d, gs in enumerate(grams):
        for g in set(gs):
            docs_of.setdefault(g, set()).add(d)
    want = {
        d: sum(1 for g in gs if len(docs_of[g]) >= 2)
        for d, gs in enumerate(grams)
    }
    want = {d: c for d, c in want.items() if c > 0}
    got = {
        r["doc_id"]: r["n_dup_positions"]
        for r in dup_span_stats(str(tmp_path), n=n).take_all()
    }
    assert got == want
