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


# ---------------------------------------------------------------------------
# DocPartDeltaSearcher — NRT over the doc-partitioned serving layout
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def docpart_nrt_setup(ray_session, tiny_docs, tmp_path_factory):
    from refimage_ray.index.docpart import build_doc_partitioned

    root = tmp_path_factory.mktemp("dpnrt")
    a, b = _split(tiny_docs)
    base_dir = str(root / "base")
    full_dir = str(root / "full")
    tbase_dir = str(root / "tbase")
    build_doc_partitioned(rd.from_arrow(a), base_dir, CFG,
                          num_doc_shards=4)
    build_doc_partitioned(rd.from_arrow(tiny_docs), full_dir, CFG,
                          num_doc_shards=4)
    build_index(rd.from_arrow(a), tbase_dir, CFG)
    return base_dir, full_dir, tbase_dir, a, b


def test_docpart_nrt_bit_identical_to_rebuild_and_term_delta(
    docpart_nrt_setup,
):
    """DocPartDeltaSearcher(base).add(B) == a full docpart rebuild over
    A∪B == the TERM layout's DeltaSearcher on the same corpora — same
    ids AND the same float64 scores."""
    from refimage_ray.index.docpart import DocPartSearcher
    from refimage_ray.query.nrt import DocPartDeltaSearcher

    base_dir, full_dir, tbase_dir, a, b = docpart_nrt_setup
    d = DocPartDeltaSearcher(base_dir)
    assert d.add(b) == b.num_rows
    full = DocPartSearcher(full_dir)
    tdelta = DeltaSearcher(tbase_dir)
    tdelta.add(b)
    for q in QUERIES:
        for mode in ("or", "and"):
            want = full.search(q, k=50, mode=mode)
            assert d.search(q, k=50, mode=mode) == want, (q, mode)
            assert tdelta.search(q, k=50, mode=mode) == want, (q, mode)
        assert d.count(q) == full.count(q), q
    # repeat query == cached query (memo is semantically invisible)
    q = QUERIES[0]
    assert d.search(q, k=25) == d.search(q, k=25)
    # buffered metadata lookup
    some = b["doc_id"][0].as_py()
    assert d.lookup_buffered([some])[0]["doc_id"] == some


def test_docpart_nrt_guards(docpart_nrt_setup):
    from refimage_ray.query.nrt import DocPartDeltaSearcher

    base_dir, _, _, a, b = docpart_nrt_setup
    d = DocPartDeltaSearcher(base_dir)
    d.add(b)
    with pytest.raises(ValueError, match="buffered"):
        d.add(b)  # duplicate ids
    with pytest.raises(ValueError, match="flush"):
        d.search("data", k=5, order_by=("doc_len", "asc"))
    with pytest.raises(ValueError, match="flush"):
        d.search("data", k=5, where=[("lang", "=", "en")])


def test_docpart_nrt_flush_then_reload_matches(docpart_nrt_setup,
                                               tmp_path):
    from refimage_ray.index.docpart import DocPartSearcher
    from refimage_ray.query.nrt import DocPartDeltaSearcher

    base_dir, full_dir, _, a, b = docpart_nrt_setup
    d = DocPartDeltaSearcher(base_dir)
    d.add(b)
    out = str(tmp_path / "flushed")
    pre = {q: d.search(q, k=30) for q in QUERIES}
    d.flush(out)
    assert d.buffered == 0
    s2 = DocPartSearcher(out)
    for q in QUERIES:
        assert s2.search(q, k=30) == pre[q], q


def test_docpart_nrt_rare_term_cross_shard_df(ray_session, tmp_path):
    """idf basis regression: a buffered doc whose term has base
    postings only in OTHER shards must still score with the
    union-global df — checked bit-identical against a full docpart
    rebuild on a corpus engineered so the rare term's base docs hash
    away from the buffered doc's shard."""
    from refimage_ray.index.docpart import (
        DocPartSearcher,
        _doc_shard_of,
        build_doc_partitioned,
    )
    from refimage_ray.query.nrt import DocPartDeltaSearcher

    # one base doc holds the rare term; pick a buffered doc_id that
    # hashes to a DIFFERENT shard than the base doc
    base_rows = {
        "doc_id": [0, 1, 2, 3],
        "text": ["rareword data table", "data table scan",
                 "join merge stream", "query filter sort"],
    }
    base = pa.table({
        "doc_id": pa.array(base_rows["doc_id"], pa.int64()),
        "text": pa.array(base_rows["text"]),
    })
    base_shard = int(_doc_shard_of(np.array([0], np.int64), 4)[0])
    buf_id = next(
        i for i in range(100, 200)
        if int(_doc_shard_of(np.array([i], np.int64), 4)[0]) != base_shard
    )
    buf = pa.table({
        "doc_id": pa.array([buf_id], pa.int64()),
        "text": pa.array(["rareword alone here"]),
    })
    d_base = str(tmp_path / "b")
    d_full = str(tmp_path / "f")
    build_doc_partitioned(rd.from_arrow(base), d_base, CFG,
                          num_doc_shards=4)
    build_doc_partitioned(
        rd.from_arrow(pa.concat_tables([base, buf])), d_full, CFG,
        num_doc_shards=4)
    d = DocPartDeltaSearcher(d_base)
    d.add(buf)
    want = DocPartSearcher(d_full).search("rareword", k=10)
    assert d.search("rareword", k=10) == want


def test_docpart_nrt_rejects_base_duplicate_ids(docpart_nrt_setup):
    """A buffered doc_id already present in the BASE artifact must be
    rejected (a duplicate would collide the disjoint-merge's output
    slots → duplicate hits with garbage scores)."""
    from refimage_ray.query.nrt import DocPartDeltaSearcher

    base_dir, _, _, a, b = docpart_nrt_setup
    d = DocPartDeltaSearcher(base_dir)
    dup = a.slice(1, 1).select(["doc_id", "text"])
    with pytest.raises(ValueError, match="already indexed"):
        d.add(dup)
    # nothing was buffered by the failed add
    assert d.buffered == 0
    assert d.n_docs == DocPartDeltaSearcher(base_dir).n_docs


def test_nrt_term_memo_eviction_is_pure(nrt_setup):
    """The per-generation term memo is LRU-bounded; with a cap smaller
    than the query vocabulary, evicted terms rebuild on re-query and
    results stay bit-identical to the unbounded searcher."""
    from refimage_ray.query.nrt import _LRUTermMemo

    base_dir, full_dir, a, b = nrt_setup
    capped = DeltaSearcher(base_dir)
    capped._tm_cache = _LRUTermMemo(cap=2)
    capped.add(b)
    free = DeltaSearcher(base_dir)
    free.add(b)
    full = LocalSearcher(full_dir)
    # interleave queries so hot terms churn through the tiny memo
    for _ in range(3):
        for q in QUERIES:
            got = capped.search(q, k=25)
            assert got == free.search(q, k=25), q
            assert got == full.search(q, k=25), q
    assert len(capped._tm_cache) <= 2


def test_lru_term_memo_semantics():
    from refimage_ray.query.nrt import _LRUTermMemo

    m = _LRUTermMemo(cap=2)
    m["a"] = 1
    m["b"] = 2
    assert m.get("a") == 1       # touch → "a" becomes most-recent
    m["c"] = 3                   # evicts "b" (least recent)
    assert m.get("b") is None
    assert m.get("a") == 1 and m.get("c") == 3
    m.clear()
    assert len(m) == 0 and m.get("a") is None


def test_lru_term_memo_thread_safety():
    """Hammer the capped memo from several threads (get + insert +
    clear): the unguarded get()'s get/move_to_end pair raced concurrent
    evictions and clear()s into KeyError 500s on shared searchers —
    the lock must make every interleaving safe."""
    import threading

    from refimage_ray.query.nrt import _LRUTermMemo

    memo = _LRUTermMemo(cap=8)
    errors = []
    stop = threading.Event()

    def worker(seed):
        i = 0
        while not stop.is_set():
            k = f"t{(seed * 7 + i) % 24}"
            try:
                memo[k] = i
                memo.get(k)
                memo.get(f"t{i % 24}")
                if i % 97 == 0:
                    memo.clear()
                len(memo)
            except Exception as err:  # noqa: BLE001 — the bug under test
                errors.append(err)
                break
            i += 1

    threads = [threading.Thread(target=worker, args=(s,)) for s in range(6)]
    for t in threads:
        t.start()
    import time

    time.sleep(1.0)
    stop.set()
    for t in threads:
        t.join()
    assert not errors
