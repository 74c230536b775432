"""Mergeable-sketch tests: Misra–Gries guarantees, HLL laws + bounds,
and the exact two-pass heavy-hitters pipeline vs a brute-force count.
"""

from __future__ import annotations

import collections
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from refimage_ray.stages.sketches import (
    MG_SENTINEL,
    hll_estimate,
    hll_from_hashes,
    hll_merge,
    mg_compress,
    mg_partials_batch,
)

RNG = np.random.default_rng(7)


def _zipf_terms(n: int, vocab: int) -> np.ndarray:
    """Zipf-ish draw over a synthetic vocabulary (deterministic)."""
    ranks = RNG.zipf(1.3, size=n).clip(1, vocab)
    return np.array([f"t{r:05d}" for r in ranks], dtype=object)


# ---------------------------------------------------------------------------
# Misra–Gries
# ---------------------------------------------------------------------------


def test_mg_compress_noop_under_capacity():
    terms = np.array(["a", "b"], dtype=object)
    counts = np.array([5, 3], dtype=np.int64)
    t, w, d = mg_compress(terms, counts, capacity=8)
    assert d == 0 and list(t) == ["a", "b"] and list(w) == [5, 3]


def test_mg_compress_guarantee():
    """Every term with count > N/(cap+1) survives; weights
    under-estimate by exactly the decrement; ≤ cap rows remain."""
    toks = _zipf_terms(50_000, vocab=5_000)
    exact = collections.Counter(toks)
    terms = np.array(list(exact.keys()), dtype=object)
    counts = np.array(list(exact.values()), dtype=np.int64)
    cap = 64
    t, w, d = mg_compress(terms, counts, cap)
    assert len(t) <= cap
    n = counts.sum()
    assert d <= n / (cap + 1)
    surviving = dict(zip(t, w))
    for term, c in exact.items():
        if c > d:
            assert surviving[term] == c - d
        else:
            assert term not in surviving


def test_mg_partials_batch_sentinel_bookkeeping():
    batch = pa.table({"text": pa.array(["alpha beta beta", "alpha gamma"])})
    out = mg_partials_batch(batch, capacity=10)
    rows = {r["term"]: r for r in out.to_pylist()}
    assert rows[MG_SENTINEL]["n_tokens"] == 5
    assert rows[MG_SENTINEL]["decr"] == 0  # no compression needed
    assert rows["alpha"]["w"] == 2 and rows["beta"]["w"] == 2


def test_mg_merged_summaries_superset_property():
    """Summing per-batch MG summaries keeps every globally-heavy term:
    w_merged + Σ decrements ≥ true count (the candidate-superset
    invariant heavy_hitters relies on)."""
    toks = _zipf_terms(30_000, vocab=3_000)
    exact = collections.Counter(toks)
    cap = 32
    merged: collections.Counter = collections.Counter()
    total_d = 0
    for part in np.array_split(toks, 7):
        c = collections.Counter(part)
        t, w, d = mg_compress(
            np.array(list(c.keys()), dtype=object),
            np.array(list(c.values()), dtype=np.int64),
            cap,
        )
        total_d += d
        for term, weight in zip(t, w):
            merged[term] += int(weight)
    for term, c in exact.items():
        assert merged.get(term, 0) + total_d >= c


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def test_hll_rank_matches_bit_length():
    """_leading_rank's float-log2 bit length == int.bit_length."""
    from refimage_ray.stages.sketches import _leading_rank

    vals = np.concatenate(
        [
            RNG.integers(0, 1 << 52, size=500, dtype=np.uint64),
            np.array(
                [0, 1, 2, 3, (1 << 52) - 1, 1 << 52, (1 << 52) + 1],
                dtype=np.uint64,
            ),
            (np.uint64(1) << RNG.integers(0, 52, size=100).astype(np.uint64)),
        ]
    )
    bits = 52
    got = _leading_rank(vals, bits)
    want = np.array(
        [bits - int(v).bit_length() + 1 if v else bits + 1 for v in vals]
    )
    assert (got == want).all()


def test_hll_merge_law():
    """registers(A ∪ B) == max(registers(A), registers(B)) — the merge
    is exact regardless of how the stream is split."""
    h = RNG.integers(0, np.iinfo(np.uint64).max, size=20_000, dtype=np.uint64)
    whole = hll_from_hashes(h, p=10)
    parts = [hll_from_hashes(c, p=10) for c in np.array_split(h, 5)]
    assert (hll_merge(parts) == whole).all()


def test_hll_estimate_error_bound():
    """p=12 → σ ≈ 1.04/64 ≈ 1.6%; assert within 5% (≈3σ) on 100k."""
    n = 100_000
    h = RNG.integers(0, np.iinfo(np.uint64).max, size=n, dtype=np.uint64)
    est = hll_estimate(hll_from_hashes(np.unique(h), p=12))
    assert abs(est - n) / n < 0.05


def test_hll_small_range_linear_counting():
    h = RNG.integers(0, np.iinfo(np.uint64).max, size=40, dtype=np.uint64)
    est = hll_estimate(hll_from_hashes(h, p=12))
    assert abs(est - 40) < 4


def test_hll_empty():
    assert hll_estimate(hll_from_hashes(np.zeros(0, np.uint64), p=12)) == 0.0


# ---------------------------------------------------------------------------
# heavy_hitters end-to-end (needs Ray)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def zipf_corpus_dir(tmp_path_factory):
    """A documents.parquet whose vocab (3k) far exceeds the sketch
    capacity used in the test, so MG compression actually engages."""
    out = tmp_path_factory.mktemp("zipfsf")
    toks = _zipf_terms(60_000, vocab=3_000)
    docs = [" ".join(d) for d in np.array_split(toks, 400)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
                "lang": pa.array(["en"] * len(docs), pa.string()),
            }
        ),
        os.path.join(str(out), "documents.parquet"),
    )
    return str(out), collections.Counter(toks)


def test_heavy_hitters_exact_vs_bruteforce(ray_session, zipf_corpus_dir):
    from refimage_ray.pipelines.corpus import heavy_hitters

    sf_dir, exact = zipf_corpus_dir
    total = sum(exact.values())
    frac = 0.002
    threshold = int(np.ceil(frac * total))
    got = heavy_hitters(sf_dir, threshold_frac=frac, capacity=512)
    want = sorted(
        ((t, c) for t, c in exact.items() if c >= threshold),
        key=lambda r: (-r[1], r[0]),
    )
    assert got.to_pylist() == [{"term": t, "cnt": c} for t, c in want]
    assert len(want) > 0  # the test has teeth


def test_heavy_hitters_fallback_path(ray_session, zipf_corpus_dir):
    """Tiny capacity + tiny threshold → guard trips → exact fallback
    still returns the right answer."""
    from refimage_ray.pipelines.corpus import heavy_hitters

    sf_dir, exact = zipf_corpus_dir
    total = sum(exact.values())
    frac = 1.0 / total  # threshold = 1: every term qualifies
    got = heavy_hitters(sf_dir, threshold_frac=frac, capacity=4)
    want = sorted(exact.items(), key=lambda r: (-r[1], r[0]))
    assert got.to_pylist() == [{"term": t, "cnt": c} for t, c in want]


def test_distinct_counts_and_hll_pipeline(ray_session, zipf_corpus_dir):
    from refimage_ray.pipelines.corpus import distinct_counts, distinct_terms_hll

    sf_dir, exact = zipf_corpus_dir
    dc = distinct_counts(sf_dir).to_pylist()[0]
    assert dc["distinct_terms"] == len(exact)
    assert dc["distinct_langs"] == 1
    est = distinct_terms_hll(sf_dir).to_pylist()[0]["estimate"]
    assert abs(est - len(exact)) / len(exact) < 0.05


def test_bigram_pmi_vs_bruteforce(ray_session, zipf_corpus_dir):
    """PMI pipeline == a Counter-based brute force on the same corpus."""
    from refimage_ray.pipelines.corpus import bigram_pmi

    sf_dir, _ = zipf_corpus_dir
    import pyarrow.parquet as _pq

    texts = _pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )["text"].to_pylist()
    uni: collections.Counter = collections.Counter()
    bi: collections.Counter = collections.Counter()
    n_uni = n_bi = 0
    for t in texts:
        toks = t.split()
        uni.update(toks)
        n_uni += len(toks)
        pairs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        bi.update(pairs)
        n_bi += len(pairs)
    want = {
        bg: (
            c,
            round(
                float(
                    np.log((c * float(n_uni) * float(n_uni))
                           / (float(n_bi) * uni[bg.split()[0]] * uni[bg.split()[1]]))
                ),
                6,
            ),
        )
        for bg, c in bi.items()
        if c >= 5
    }
    got = {
        r["bigram"]: (r["n"], r["pmi"])
        for r in bigram_pmi(sf_dir, min_count=5).take_all()
    }
    assert got == want and len(want) > 10


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------

def test_cms_never_undercounts():
    from refimage_ray.functions.hashing import md5_u64_string_array
    from refimage_ray.stages.sketches import cms_from_counts, cms_query

    import pyarrow as pa

    terms = [f"t{i}" for i in range(500)]
    counts = np.arange(1, 501, dtype=np.int64)
    h = md5_u64_string_array(pa.array(terms, pa.string()))
    cms = cms_from_counts(h, counts, width=64, depth=4)  # heavy collisions
    est = cms_query(cms, h)
    assert (est >= counts).all()
    # total overcount bounded in aggregate: each row sums to N
    assert cms.sum(axis=1).tolist() == [int(counts.sum())] * 4


def test_cms_exact_when_wide():
    from refimage_ray.functions.hashing import md5_u64_string_array
    from refimage_ray.stages.sketches import cms_from_counts, cms_query

    import pyarrow as pa

    terms = [f"w{i}" for i in range(20)]
    counts = np.arange(5, 25, dtype=np.int64)
    h = md5_u64_string_array(pa.array(terms, pa.string()))
    cms = cms_from_counts(h, counts, width=1 << 16, depth=4)
    est = cms_query(cms, h)
    assert (est == counts).all()  # no collisions at this width
    absent = md5_u64_string_array(pa.array(["nope"], pa.string()))
    assert cms_query(cms, absent)[0] == 0


def test_cms_merge_linearity():
    """CMS(a ∪ b) == CMS(a) + CMS(b) — the mergeable-summary law."""
    from refimage_ray.functions.hashing import md5_u64_string_array
    from refimage_ray.stages.sketches import cms_from_counts, cms_merge

    import pyarrow as pa

    terms = [f"m{i}" for i in range(100)]
    h = md5_u64_string_array(pa.array(terms, pa.string()))
    c1 = np.arange(1, 101, dtype=np.int64)
    c2 = np.arange(100, 0, -1, dtype=np.int64)
    whole = cms_from_counts(np.concatenate([h, h]),
                            np.concatenate([c1, c2]), width=256, depth=3)
    merged = cms_merge([
        cms_from_counts(h, c1, width=256, depth=3),
        cms_from_counts(h, c2, width=256, depth=3),
    ])
    np.testing.assert_array_equal(whole, merged)


def test_cms_pipeline_upper_bounds_exact(ray_session, tiny_docs):
    """Distributed CMS estimates >= exact term counts on the fixture."""
    import pyarrow as pa
    import ray.data as rd

    from refimage_ray.config import DEFAULT_CONFIG
    from refimage_ray.functions.hashing import md5_u64_string_array
    from refimage_ray.stages.sketches import cms_batch, cms_merge, cms_query
    from refimage_ray.stages.tokenize import _flat_tokens

    width, depth = 2048, 4
    rows = (
        rd.from_arrow(tiny_docs)
        .map_batches(lambda b: cms_batch(b, width, depth),
                     batch_format="pyarrow")
        .take_all()
    )
    cms = cms_merge([np.asarray(r["cms"], np.int64).reshape(depth, width)
                     for r in rows])
    flat, _ = _flat_tokens(tiny_docs["text"], DEFAULT_CONFIG)
    exact_tbl = pa.table({"t": flat}).group_by("t").aggregate(
        [([], "count_all")]
    )
    h = md5_u64_string_array(exact_tbl["t"].combine_chunks())
    exact = exact_tbl["count_all"].to_numpy(zero_copy_only=False)
    est = cms_query(cms, h)
    assert (est >= exact).all()
    assert cms[0].sum() == exact.sum()
