"""NRT delta search (query/nrt.py): DeltaSearcher(base).add(B) must be
BIT-identical to a full rebuild over A ∪ B — same doc ids AND the same
float64 scores — across or/and/min_match/after/prefix/fuzzy paths.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from refimage_ray.config import EngineConfig
from refimage_ray.index.build import build_index
from refimage_ray.query.engine import LocalSearcher
from refimage_ray.query.nrt import DeltaSearcher

CFG = EngineConfig(num_shards=4, salt_buckets=2)

QUERIES = ["the data join", "spark query", "stream merge", "zzz missing"]


def _split(tiny_docs, n_base=180):
    a = tiny_docs.slice(0, n_base)
    b = tiny_docs.slice(n_base)
    return a, b


@pytest.fixture(scope="module")
def nrt_setup(ray_session, tiny_docs, tmp_path_factory):
    root = tmp_path_factory.mktemp("nrt")
    a, b = _split(tiny_docs)
    base_dir = str(root / "base")
    full_dir = str(root / "full")
    build_index(rd.from_arrow(a), base_dir, CFG)
    build_index(rd.from_arrow(tiny_docs), full_dir, CFG)
    return base_dir, full_dir, a, b


def test_nrt_bit_identical_to_rebuild(nrt_setup):
    base_dir, full_dir, a, b = nrt_setup
    delta = DeltaSearcher(base_dir)
    delta.add(b)
    full = LocalSearcher(full_dir)
    assert delta.n_docs == full.n_docs
    assert delta.avgdl == pytest.approx(full.avgdl, rel=0, abs=0)
    for q in QUERIES:
        for mode in ("or", "and"):
            got = delta.search(q, k=25, mode=mode)
            want = full.search(q, k=25, mode=mode)
            assert got == want, (q, mode)  # exact float equality


def test_nrt_incremental_adds_match_single_add(nrt_setup):
    base_dir, full_dir, a, b = nrt_setup
    one = DeltaSearcher(base_dir)
    one.add(b)
    many = DeltaSearcher(base_dir)
    for i in range(0, b.num_rows, 17):
        many.add(b.slice(i, 17))
    for q in QUERIES:
        assert many.search(q, k=25) == one.search(q, k=25)
    assert many.buffered == one.buffered == b.num_rows


def test_nrt_min_match_and_after(nrt_setup):
    base_dir, full_dir, _, b = nrt_setup
    delta = DeltaSearcher(base_dir)
    delta.add(b)
    full = LocalSearcher(full_dir)
    q = "the data join stream"
    assert delta.search(q, k=15, min_match=2) == full.search(q, k=15, min_match=2)
    page1 = full.search(q, k=5)
    assert delta.search(q, k=5, after=page1[-1]) == full.search(
        q, k=5, after=page1[-1]
    )


def test_nrt_expansion_sees_buffer(nrt_setup):
    base_dir, full_dir, _, b = nrt_setup
    delta = DeltaSearcher(base_dir)
    delta.add(b)
    full = LocalSearcher(full_dir)
    assert delta.search_prefix("s", k=15) == full.search_prefix("s", k=15)
    assert delta.search_fuzzy("spark", k=10) == full.search_fuzzy("spark", k=10)


def test_nrt_count(nrt_setup):
    base_dir, full_dir, _, b = nrt_setup
    delta = DeltaSearcher(base_dir)
    delta.add(b)
    full = LocalSearcher(full_dir)
    for q in QUERIES:
        assert delta.count(q) == full.count(q)


def test_nrt_rejects_duplicate_ids(nrt_setup):
    base_dir, _, a, b = nrt_setup
    delta = DeltaSearcher(base_dir)
    with pytest.raises(ValueError, match="already indexed"):
        delta.add(a.slice(0, 3))  # base docs
    delta.add(b.slice(0, 5))
    with pytest.raises(ValueError, match="already indexed"):
        delta.add(b.slice(0, 5))  # buffered docs
    dup = pa.table(
        {"doc_id": pa.array([10**9, 10**9], pa.int64()),
         "text": pa.array(["x y", "y z"])}
    )
    with pytest.raises(ValueError, match="duplicate"):
        delta.add(dup)


def test_nrt_flush_then_reload_matches(nrt_setup, tmp_path):
    base_dir, full_dir, _, b = nrt_setup
    delta = DeltaSearcher(base_dir)
    delta.add(b)
    before = {q: delta.search(q, k=20) for q in QUERIES}
    out = delta.flush(str(tmp_path / "flushed"), CFG)
    assert delta.buffered == 0
    re = DeltaSearcher(out)
    full = LocalSearcher(full_dir)
    for q in QUERIES:
        got = re.search(q, k=20)
        # flushed artifact == rebuild (ids; scores equal to full rebuild)
        assert [d for d, _ in got] == [d for d, _ in full.search(q, k=20)]
        assert [d for d, _ in got] == [d for d, _ in before[q]]


def test_nrt_empty_buffer_is_plain_base(nrt_setup):
    base_dir, _, a, _ = nrt_setup
    delta = DeltaSearcher(base_dir)
    base = LocalSearcher(base_dir)
    for q in QUERIES:
        assert delta.search(q, k=10) == base.search(q, k=10)


def test_nrt_cache_and_dense_invariants(nrt_setup):
    """The per-generation term-map memo + merged rank universe must be
    invisible semantically: repeat queries return identical results,
    an add() invalidates the cache (fresh docs appear), the merged
    universe is sorted and rank-attached, and doc-value filters still
    refuse loudly (base-aligned values would misalign)."""
    base_dir, full_dir, a, b = nrt_setup
    d = DeltaSearcher(base_dir)
    d.add(b)
    full = LocalSearcher(full_dir)
    q = "the data join"
    first = d.search(q, k=25)
    assert first == d.search(q, k=25) == full.search(q, k=25)
    # universe: sorted superset of both sides, ranks attached + dense
    assert d.all_ids is not None
    assert np.all(np.diff(d.all_ids) > 0)
    tm = d._term_map(["data"])
    assert tm["data"].ranks is not None
    assert np.array_equal(d.all_ids[tm["data"].ranks], tm["data"].doc_ids)
    # add invalidates: a fresh doc with a cached term is found
    extra = pa.table({
        "doc_id": pa.array([10**12], pa.int64()),
        "text": pa.array(["data data data data data data data data"]),
    })
    d.add(extra)
    assert 10**12 in {i for i, _ in d.search("data", k=10**6)}
    with pytest.raises(ValueError, match="flush"):
        d.search("data", k=5, where=[("lang", "=", "en")])
