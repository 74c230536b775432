"""Doc-partitioned lifecycle: delete / compact / add.

Strong contracts: compaction ≡ fresh build over the live corpus;
incremental add ≡ monolithic build over the union corpus — both
asserted bit-identical through the search path (same scores), incl.
phrase over positional shards."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray.data as rd

from refimage_ray.config import EngineConfig
from refimage_ray.index.docpart import DocPartSearcher, build_doc_partitioned
from refimage_ray.index.docpart_lifecycle import (
    add_documents_docpart,
    compact_docpart,
    merge_docpart_indexes,
)
from refimage_ray.index.lifecycle import delete_docs
from tests.conftest import FIXTURE_QUERIES

CFG = EngineConfig(num_shards=4, salt_buckets=2, store_positions=True)


def _split(docs: pa.Table, cut: int) -> tuple[pa.Table, pa.Table]:
    ids = docs["doc_id"].to_numpy(zero_copy_only=False)
    m = pa.array(ids < cut)
    return docs.filter(m), docs.filter(pc.invert(m))


@pytest.fixture(scope="module")
def base(ray_session, tiny_docs, tmp_path_factory):
    root = tmp_path_factory.mktemp("dplc")
    d = str(root / "base")
    build_doc_partitioned(rd.from_arrow(tiny_docs), d, CFG,
                          num_doc_shards=4, value_columns=["lang"])
    return d, tiny_docs, root


def test_delete_filters_immediately(base):
    d, docs, root = base
    s0 = DocPartSearcher(d)
    full = s0.search("the data join", k=10**9, threshold=0.0)
    victims = [did for did, _ in full[:3]]
    import shutil

    dd = str(root / "del")
    shutil.copytree(d, dd)
    delete_docs(dd, victims)
    s1 = DocPartSearcher(dd)
    got = s1.search("the data join", k=10**9, threshold=0.0)
    # dead docs gone, survivors keep their PRE-delete scores (stale
    # stats until compact — Lucene deleted-docs semantics)
    assert got == [(did, sc) for did, sc in full if did not in set(victims)]
    assert s1.count("the data join") == s0.count("the data join") - 3
    # facets over the filtered membership
    f0 = s0.facets("the data join", by=["lang"])
    f1 = s1.facets("the data join", by=["lang"])
    assert f1["total"] == f0["total"] - 3
    # phrase path filters too (positional artifact)
    ph0 = s0.search_phrase("data join", k=10**9)
    ph1 = s1.search_phrase("data join", k=10**9)
    assert ph1 == [(did, sc) for did, sc in ph0 if did not in set(victims)]


def test_compact_equals_fresh_build(base, tmp_path):
    d, docs, root = base
    import shutil

    dd = str(tmp_path / "tomb")
    shutil.copytree(d, dd)
    ids = docs["doc_id"].to_pylist()
    victims = sorted(ids)[::7]  # every 7th doc
    delete_docs(dd, victims)
    out = str(tmp_path / "compacted")
    man = compact_docpart(dd, out)
    assert man["stats"]["n_docs"] == len(ids) - len(victims)

    live = docs.filter(
        pc.invert(pc.is_in(docs["doc_id"], value_set=pa.array(victims)))
    )
    fresh = str(tmp_path / "fresh")
    build_doc_partitioned(rd.from_arrow(live), fresh, CFG,
                          num_doc_shards=4, value_columns=["lang"])
    a, b = DocPartSearcher(out), DocPartSearcher(fresh)
    for q in FIXTURE_QUERIES:
        for mode in ("or", "and"):
            assert a.search(q, k=10**9, threshold=0.0, mode=mode) == \
                   b.search(q, k=10**9, threshold=0.0, mode=mode), (q, mode)
    assert a.search_phrase("data join", k=100, slop=1) == \
           b.search_phrase("data join", k=100, slop=1)
    assert a.facets("data", by=["lang"]) == b.facets("data", by=["lang"])


def test_add_equals_monolithic_build(base, tmp_path):
    d, docs, root = base
    cut = int(np.median(docs["doc_id"].to_numpy(zero_copy_only=False)))
    first, rest = _split(docs, cut)
    assert first.num_rows and rest.num_rows

    base1 = str(tmp_path / "b1")
    build_doc_partitioned(rd.from_arrow(first), base1, CFG,
                          num_doc_shards=4, value_columns=["lang"])
    out = str(tmp_path / "added")
    man = add_documents_docpart(base1, rd.from_arrow(rest), out, CFG)
    assert man["stats"]["n_docs"] == docs.num_rows

    mono = str(tmp_path / "mono")
    build_doc_partitioned(rd.from_arrow(docs), mono, CFG,
                          num_doc_shards=4, value_columns=["lang"])
    a, b = DocPartSearcher(out), DocPartSearcher(mono)
    for q in FIXTURE_QUERIES:
        assert a.search(q, k=10**9, threshold=0.0) == \
               b.search(q, k=10**9, threshold=0.0), q
    assert a.search_phrase("data join", k=100, slop=2) == \
           b.search_phrase("data join", k=100, slop=2)
    assert a.count("the data") == b.count("the data")
    w = [("lang", "=", "en")]
    assert a.search("data join", k=10, where=w) == b.search(
        "data join", k=10, where=w
    )


def test_merge_geometry_validation(base, tmp_path):
    d, docs, root = base
    other = str(tmp_path / "othergeom")
    build_doc_partitioned(rd.from_arrow(docs), other, CFG, num_doc_shards=2)
    with pytest.raises(ValueError, match="num_doc_shards"):
        merge_docpart_indexes([d, other], str(tmp_path / "x"))
    nopos = str(tmp_path / "nopos")
    build_doc_partitioned(
        rd.from_arrow(docs), nopos,
        EngineConfig(num_shards=4, salt_buckets=2), num_doc_shards=4,
    )
    with pytest.raises(ValueError, match="store_positions"):
        merge_docpart_indexes([d, nopos], str(tmp_path / "y"))


def test_update_doc_values(base, tmp_path):
    import shutil

    from refimage_ray.index.docpart_lifecycle import update_doc_values_docpart

    d, docs, root = base
    dd = str(tmp_path / "upd")
    shutil.copytree(d, dd)
    s0 = DocPartSearcher(dd)
    hits = s0.search("data join", k=5)
    assert hits
    target = hits[0][0]
    n = update_doc_values_docpart(dd, {target: {"lang": "xx"}})
    assert n == 1
    s1 = DocPartSearcher(dd)  # reload (load-once residency)
    assert s1.count("data join", where=[("lang", "=", "xx")]) >= 1
    got = s1.search("data join", k=100, where=[("lang", "=", "xx")])
    assert target in [d_ for d_, _ in got]
    # 404 atomicity: unknown id fails before any write
    with pytest.raises(KeyError):
        update_doc_values_docpart(dd, {target: {"lang": "yy"},
                                       10**15 + 7: {"lang": "zz"}})
    s2 = DocPartSearcher(dd)
    assert s2.count("data join", where=[("lang", "=", "yy")]) == 0
    # immutable / unknown column
    with pytest.raises(ValueError):
        update_doc_values_docpart(dd, {target: {"text": "nope"}})


def test_count_works_without_value_columns(ray_session, tiny_docs, tmp_path):
    """Plain counts must not require a resident doc-value universe."""
    d = str(tmp_path / "novals")
    build_doc_partitioned(rd.from_arrow(tiny_docs), d, CFG, num_doc_shards=4)
    s = DocPartSearcher(d)
    full = s.search("the data join", k=10**9, threshold=0.0)
    assert s.count("the data join") == len(full)
    assert s.count("the data join", mode="and") == len(
        s.search("the data join", k=10**9, threshold=0.0, mode="and")
    )
    assert s.count("the data join", min_match=2) == len(
        s.search("the data join", k=10**9, threshold=0.0, min_match=2)
    )


def test_merge_value_columns_validation(base, tmp_path):
    d, docs, root = base  # base has value_columns=["lang"]
    novals = str(tmp_path / "nv")
    build_doc_partitioned(rd.from_arrow(docs), novals, CFG, num_doc_shards=4)
    with pytest.raises(ValueError, match="value_columns"):
        merge_docpart_indexes([d, novals], str(tmp_path / "z"))
