"""Exact dedup (reference 409-duplicate analog) + deterministic doc ids."""

import pyarrow as pa
import pytest

import ray.data as rd

from refimage_ray.config import EngineConfig
from refimage_ray.stages.dedup import add_content_hash, exact_dedup
from refimage_ray.stages.docids import assign_doc_ids


@pytest.fixture
def dup_table():
    return pa.table(
        {
            "url": pa.array([f"https://e/{i}" for i in range(6)]),
            "text": pa.array(["aa", "bb", "aa", "cc", "bb", "aa"]),
            "lang": pa.array(["en"] * 6),
        }
    )


def test_content_hash_matches_duckdb(dup_table):
    import duckdb

    hashed = add_content_hash(dup_table)
    exp = [
        duckdb.sql(f"select md5('{t}')").fetchone()[0]
        for t in dup_table["text"].to_pylist()
    ]
    assert hashed["content_hash"].to_pylist() == exp


def test_exact_dedup_keeps_first_by_url(ray_session, dup_table):
    out = exact_dedup(rd.from_arrow(dup_table), order_col="url").to_pandas()
    assert sorted(out["text"]) == ["aa", "bb", "cc"]
    kept = dict(zip(out["text"], out["url"]))
    assert kept["aa"] == "https://e/0"
    assert kept["bb"] == "https://e/1"
    assert kept["cc"] == "https://e/3"


def test_assign_doc_ids_deterministic(ray_session, tiny_pages):
    cfg = EngineConfig(docid_partitions=8)
    base = tiny_pages.select(["url", "lang", "text"])
    a = assign_doc_ids(rd.from_arrow(base), cfg=cfg).to_pandas()
    b = assign_doc_ids(rd.from_arrow(base), cfg=cfg).to_pandas()
    a = a.sort_values("url").reset_index(drop=True)
    b = b.sort_values("url").reset_index(drop=True)
    assert (a["doc_id"] == b["doc_id"]).all()
    # unique, and increasing with url within each partition stride
    assert a["doc_id"].is_unique
    part = a["doc_id"] // cfg.docid_stride
    for p, grp in a.assign(part=part).groupby("part"):
        g = grp.sort_values("url")
        assert g["doc_id"].is_monotonic_increasing


def test_assign_doc_ids_dense_within_partition(ray_session):
    cfg = EngineConfig(docid_partitions=2)
    t = pa.table({"url": pa.array([f"u{i}" for i in range(20)]),
                  "text": pa.array(["x"] * 20)})
    out = assign_doc_ids(rd.from_arrow(t), cfg=cfg).to_pandas()
    part = out["doc_id"] // cfg.docid_stride
    for p, grp in out.assign(part=part).groupby("part"):
        local = sorted(grp["doc_id"] % cfg.docid_stride)
        assert local == list(range(len(grp)))  # dense 0..n-1 per partition
