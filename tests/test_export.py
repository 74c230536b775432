"""Match-set export as a Dataset: membership semantics, dead-doc
filtering, payload join."""

from __future__ import annotations

import shutil

import pytest

from refimage_ray.pipelines.export import matches_dataset, matches_table
from refimage_ray.query.engine import LocalSearcher


def _ids(index_dir, q, **kw) -> list[int]:
    return sorted(matches_table(index_dir, q, **kw)["doc_id"].to_pylist())


def test_export_equals_search_membership(built_index):
    index_dir, _, _ = built_index
    s = LocalSearcher(index_dir)
    for q, mode in [("the data join", "or"), ("the data join", "and"),
                    ("zzz missing", "or")]:
        want = sorted(
            d for d, _ in s.search(q, k=10**9, threshold=0.0, mode=mode)
        )
        got = _ids(index_dir, q, mode=mode)
        assert got == want, (q, mode)
        assert len(got) == s.count(q, mode=mode)


def test_export_min_match_and_columns(built_index):
    index_dir, _, _ = built_index
    s = LocalSearcher(index_dir)
    q = "the data join"
    df = matches_table(index_dir, q, min_match=2, columns=["lang"]).to_pandas()
    assert sorted(df["doc_id"].tolist()) == sorted(
        d for d, _ in s.search(q, k=10**9, threshold=0.0, min_match=2)
    )
    assert set(df.columns) == {"doc_id", "n_terms", "lang"}
    assert (df["n_terms"] >= 2).all()
    with pytest.raises(ValueError):
        matches_dataset(index_dir, q, mode="and", min_match=1)


def test_export_excludes_tombstones(built_index, tmp_path):
    from refimage_ray.index.lifecycle import delete_docs

    index_dir, _, _ = built_index
    d = str(tmp_path / "tomb")
    shutil.copytree(index_dir, d)
    before = _ids(d, "the data")
    victims = before[:5]
    delete_docs(d, victims)
    after = _ids(d, "the data")
    assert after == [x for x in before if x not in set(victims)]


def test_export_empty_keeps_schema(built_index):
    index_dir, _, _ = built_index
    t = matches_table(index_dir, "zzz missing qqq", columns=["lang"])
    assert t.num_rows == 0
    assert t.schema.names == ["doc_id", "n_terms", "lang"]
