"""Property tests for the round-2 data-prep operators — pure-function
laws only (no Ray needed): selection vs numpy, CMS never-undercounts,
BPE losslessness, bigram-LM probability laws."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from refimage_ray.functions.hashing import md5_u64_string_array
from refimage_ray.stages.bpe import END, encode_word, learn_bpe
from refimage_ray.stages.lm import BigramLM
from refimage_ray.stages.sketches import (
    cms_from_counts,
    cms_merge,
    cms_query,
)

WORD = st.text(alphabet="abcd", min_size=1, max_size=8)


@given(
    st.lists(st.tuples(WORD, st.integers(1, 50)), min_size=1, max_size=20),
    st.integers(0, 12),
)
@settings(max_examples=60, deadline=None)
def test_bpe_lossless_and_merge_prefix_consistent(items, m):
    hist = list({w: c for w, c in items}.items())
    merges = learn_bpe(hist, m)
    ranks = {p: r for r, p in enumerate(merges)}
    for w, _ in hist:
        pieces = encode_word(w, ranks)
        assert "".join(pieces) == w + END
        # fewer merges can never produce fewer pieces
        shorter = encode_word(w, {p: r for r, p in enumerate(merges[: m // 2])})
        assert len(pieces) <= len(shorter)


@given(
    st.lists(st.tuples(WORD, st.integers(1, 100)), min_size=1, max_size=40),
    st.integers(4, 64),
    st.integers(1, 4),
)
@settings(max_examples=60, deadline=None)
def test_cms_laws(items, width, depth):
    uniq = {}
    for w, c in items:
        uniq[w] = uniq.get(w, 0) + c
    terms = list(uniq)
    counts = np.array([uniq[t] for t in terms], np.int64)
    h = md5_u64_string_array(pa.array(terms, pa.string()))
    cms = cms_from_counts(h, counts, width, depth)
    est = cms_query(cms, h)
    assert (est >= counts).all()
    assert (cms.sum(axis=1) == counts.sum()).all()
    # linearity: two halves merge to the whole
    half = len(terms) // 2 or 1
    merged = cms_merge([
        cms_from_counts(h[:half], counts[:half], width, depth),
        cms_from_counts(h[half:], counts[half:], width, depth),
    ])
    np.testing.assert_array_equal(cms, merged)


def _select_local(arr: np.ndarray, k: int, *, buckets: int = 8,
                  collect_cap: int = 4) -> float:
    """Drive the REAL select_core with in-memory passes (tiny buckets
    and cap to force many rounds)."""
    from refimage_ray.stages.selection import (
        local_collect_pass,
        local_histogram_pass,
        select_core,
    )

    def count_pass(lo, hi):
        _, c, mn, mx = local_histogram_pass(arr, lo, hi, buckets)
        return c, mn, mx

    def collect_pass(lo, hi, j):
        return local_collect_pass(arr, lo, hi, buckets, j)

    return select_core(count_pass, collect_pass, k,
                       float(arr.min()), float(arr.max()),
                       buckets=buckets, collect_cap=collect_cap)


@given(st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1,
                max_size=300),
       st.data())
@settings(max_examples=60, deadline=None)
def test_selection_core_matches_numpy(vals, data):
    arr = np.asarray(vals, np.float64)
    k = data.draw(st.integers(1, len(arr)))
    assert _select_local(arr, k) == np.sort(arr)[k - 1]


def test_selection_zero_spike_regression():
    """Found by hypothesis: a duplicate spike of exact 0.0 larger than
    collect_cap used to loop forever (the interval cannot shrink to one
    ULP of 0 in bounded rounds); the all-equal-bucket early exit fixes
    it."""
    arr = np.array([0.0] * 50 + [1.0])
    for k in (1, 25, 50, 51):
        assert _select_local(arr, k) == np.sort(arr)[k - 1]
    # denormal-adjacent variant
    arr2 = np.array([5e-324] * 40 + [0.0] * 40 + [2.0])
    for k in (1, 41, 80, 81):
        assert _select_local(arr2, k) == np.sort(arr2)[k - 1]


@given(st.lists(st.sampled_from(["a", "b", "c"]), min_size=2, max_size=30))
@settings(max_examples=60, deadline=None)
def test_lm_probabilities_are_proper(seq):
    """Smoothed transition probs are in (0,1); perplexity >= 1."""
    toks = np.asarray(seq)
    prev, cur = toks[:-1], toks[1:]
    uniq, cnt = np.unique(toks, return_counts=True)
    order = np.argsort(uniq)
    vocab = uniq[order]
    ucnt = cnt[order].astype(np.int64)
    pairs = {}
    for a, b in zip(prev, cur):
        pairs[(a, b)] = pairs.get((a, b), 0) + 1
    V = len(vocab)
    pid = {t: i + 1 for i, t in enumerate(vocab)}
    keys = np.array(sorted(pid[a] * (V + 1) + pid[b] for a, b in pairs),
                    np.int64)
    kcnt = np.array([pairs[k] for k in sorted(
        pairs, key=lambda ab: pid[ab[0]] * (V + 1) + pid[ab[1]])], np.int64)
    lm = BigramLM(vocab.astype(str), ucnt, keys, kcnt, k=1.0)
    lp = lm.transition_logprobs(prev.astype(str), cur.astype(str))
    assert (lp < 0).all() or math.isclose(float(np.max(lp)), 0.0)
    ppl = math.exp(-float(lp.mean()))
    assert ppl >= 1.0 - 1e-12
    # probabilities over a fixed prev sum to <= 1 (add-k leaves OOV mass)
    a = prev[0]
    total = sum(
        math.exp(float(lm.transition_logprobs(
            np.array([a]), np.array([b]))[0]))
        for b in vocab
    )
    assert total <= 1.0 + 1e-9


@given(
    st.floats(0, 1e6, allow_nan=False),
    st.dictionaries(st.sampled_from(["a", "b", "c", "d", "e"]),
                    st.floats(0, 1e5, allow_nan=False),
                    min_size=1, max_size=5),
    st.floats(0.1, 2.0),
    st.floats(1.0, 8.0),
)
@settings(max_examples=80, deadline=None)
def test_plan_mixture_invariants(budget, domains, alpha, max_epochs):
    from refimage_ray.planner import plan_mixture

    r = plan_mixture(budget, domains, max_epochs=max_epochs, alpha=alpha)
    placed = sum(v["tokens"] for v in r["domains"].values())
    # conservation: placed + shortfall == budget (to rounding)
    assert abs(placed + r["shortfall"] - budget) < 1e-2 + budget * 1e-9
    for d, v in r["domains"].items():
        cap = max_epochs * domains[d]
        assert v["tokens"] <= cap + 1e-6  # never exceeds the epoch cap
        assert v["tokens"] >= 0
        if domains[d] == 0:
            assert v["tokens"] == 0


_VOCAB = ["aa", "bb", "cc", "dd", "ee"]


@given(
    st.lists(
        st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=12),
        min_size=2, max_size=12,
    ),
    st.sampled_from(["drop_all", "keep_first"]),
)
@settings(max_examples=30, deadline=None)
def test_scrub_dup_spans_matches_brute(ray_session, doc_tokens, mode):
    """Random tiny-vocab corpora: scrub == the exhaustive Python
    oracle in both modes (overlaps, intra-doc repeats, short docs,
    empty docs all arise naturally)."""
    import pyarrow as pa
    import ray.data as rd

    from refimage_ray.stages.spans import scrub_dup_spans
    from tests.test_spans import _brute

    docs = [(i, " ".join(t)) for i, t in enumerate(doc_tokens)]
    tbl = pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string()),
    })
    got = {
        r["doc_id"]: r
        for r in scrub_dup_spans(rd.from_arrow(tbl), n=3,
                                 mode=mode).take_all()
    }
    want = _brute(docs, 3, mode)
    assert {d: (g["n_tokens"], g["n_removed"], g["text"])
            for d, g in got.items()} == \
        {d: (w["n_tokens"], w["n_removed"], w["text"])
         for d, w in want.items()}


@given(
    st.lists(
        st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=14),
        min_size=1, max_size=10,
    ),
    st.integers(min_value=0, max_value=6),
)
@settings(max_examples=30, deadline=None)
def test_contains_near_matches_exhaustive(doc_tokens, window):
    """_contains_near (the text-fallback twin the positional verify is
    tested against) == exhaustive position-combination check."""
    import itertools

    from refimage_ray.query.engine import _contains_near

    terms = ["aa", "bb"]
    for toks in doc_tokens:
        occ = {t: [i for i, w in enumerate(toks) if w == t] for t in terms}
        if any(not v for v in occ.values()):
            want = False
        else:
            want = any(
                max(c) - min(c) <= window
                for c in itertools.product(*occ.values())
            )
        assert _contains_near(toks, terms, window) == want, (toks, window)
