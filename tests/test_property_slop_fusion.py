"""Property tests: ordered-proximity phrase semantics and RRF laws.

The positional chain verifier and the text fallback must agree with a
brute-force "exists an increasing chain with bounded gaps" oracle on
arbitrary token sequences; rrf_fuse must match its naive definition on
arbitrary rankings."""

from __future__ import annotations

from itertools import product

from hypothesis import given, settings
from hypothesis import strategies as st

from refimage_ray.query.engine import _contains_phrase
from refimage_ray.query.fusion import rrf_fuse

TOK = st.sampled_from(["a", "b", "c", "d"])


def _brute_chain(tokens: list[str], phrase: list[str], slop: int) -> bool:
    """Exponential-but-tiny oracle: any position assignment whose
    consecutive gaps are all in [1, slop+1]."""
    occ = [[i for i, t in enumerate(tokens) if t == p] for p in phrase]
    if any(not o for o in occ):
        return False
    for combo in product(*occ):
        if all(1 <= b - a <= slop + 1 for a, b in zip(combo, combo[1:])):
            return True
    return False


@settings(max_examples=300, deadline=None)
@given(
    tokens=st.lists(TOK, min_size=0, max_size=12),
    phrase=st.lists(TOK, min_size=1, max_size=3),
    slop=st.integers(min_value=0, max_value=3),
)
def test_contains_phrase_matches_brute_force(tokens, phrase, slop):
    assert _contains_phrase(tokens, phrase, slop) == _brute_chain(
        tokens, phrase, slop
    )


@settings(max_examples=200, deadline=None)
@given(
    rankings=st.lists(
        st.lists(st.integers(min_value=0, max_value=30), max_size=8,
                 unique=True),
        max_size=4,
    ),
    k=st.integers(min_value=1, max_value=10),
    rrf_k=st.integers(min_value=1, max_value=100),
)
def test_rrf_fuse_matches_naive(rankings, k, rrf_k):
    naive: dict[int, float] = {}
    for ranking in rankings:
        for r, d in enumerate(ranking, start=1):
            naive[d] = naive.get(d, 0.0) + 1.0 / (rrf_k + r)
    want = sorted(naive.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert rrf_fuse(rankings, k=k, rrf_k=rrf_k) == want


def test_positional_verify_matches_text_verify_randomized(ray_session, tmp_path):
    """The vectorized positional chain == the text fallback on a
    deterministic pseudo-random corpus, across phrases and slops."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from refimage_ray.config import EngineConfig
    from refimage_ray.index.build import build_index
    from refimage_ray.query.engine import LocalSearcher

    rng = np.random.default_rng(1234)
    vocab = ["a", "b", "c", "d", "e"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 30)))
        for _ in range(120)
    ]
    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    dp = str(tmp_path / "pos")
    dn = str(tmp_path / "plain")
    build_index(rd.from_arrow(docs), dp,
                EngineConfig(num_shards=2, salt_buckets=1,
                             store_positions=True))
    build_index(rd.from_arrow(docs), dn,
                EngineConfig(num_shards=2, salt_buckets=1))
    sp, sn = LocalSearcher(dp), LocalSearcher(dn)
    for phrase in ["a b", "b a c", "c c", "a e d", "e e e"]:
        for slop in (0, 1, 2):
            got = sp.search_phrase(phrase, k=1000, slop=slop)
            want = sn.search_phrase(phrase, k=1000, slop=slop)
            assert got == want, (phrase, slop)
