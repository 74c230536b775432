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


def test_prefix_collision_not_deduped(ray_session, tmp_path):
    """Regression (ADVICE r1): distinct texts whose md5 hex digests
    share the first 16 chars must NOT be merged — the loser scan now
    compares the full 128-bit hash as two u64 halves."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from refimage_ray.stages.dedup import find_dup_losers

    # synthetic digests: rows 0/1 collide in the prefix only; rows 2/3
    # are a genuine full-hash duplicate
    hashes = [
        "aaaaaaaaaaaaaaaa" + "0" * 16,
        "aaaaaaaaaaaaaaaa" + "f" * 16,
        "bbbbbbbbbbbbbbbb" + "1" * 16,
        "bbbbbbbbbbbbbbbb" + "1" * 16,
    ]
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "content_hash": pa.array(hashes, pa.string()),
        }
    )
    d = str(tmp_path / "docs")
    import os

    os.makedirs(d)
    pq.write_table(t, os.path.join(d, "part-0.parquet"))
    losers = find_dup_losers(d)
    assert list(losers) == [3], losers


def test_hex_suffix_u64():
    import numpy as np
    import pyarrow as pa

    from refimage_ray.functions.hashing import hex_prefix_u64, hex_suffix_u64

    h = "0123456789abcdef" + "fedcba9876543210"
    arr = pa.array([h], pa.string())
    assert hex_prefix_u64(arr)[0] == np.uint64(int(h[:16], 16))
    assert hex_suffix_u64(arr)[0] == np.uint64(int(h[16:], 16))


def test_bloom_filter_no_false_negatives_and_low_fp():
    import numpy as np

    from refimage_ray.stages.dedup import BloomFilter

    rng = np.random.default_rng(3)
    members = rng.choice(10**9, size=50000, replace=False).astype(np.int64)
    bf = BloomFilter.from_array(members, fp_rate=1e-4)
    assert bf.contains_many(members).all()  # no false negatives, ever
    probe = rng.choice(10**9, size=100000, replace=False).astype(np.int64)
    outside = probe[~np.isin(probe, members)]
    fp = bf.contains_many(outside).mean()
    assert fp < 1e-3, fp
    # deterministic across constructions
    bf2 = BloomFilter.from_array(members, fp_rate=1e-4)
    assert (bf.bits == bf2.bits).all()


def test_build_with_bloom_loser_set(ray_session, tmp_path, monkeypatch):
    """Force the bloom path (threshold 0 + distributed planning): all
    true duplicate losers must be dropped; stats stay consistent."""
    import pyarrow as pa

    import ray.data as rd

    from refimage_ray.config import EngineConfig
    from refimage_ray.index import build as build_mod
    from refimage_ray.index.build import build_index
    from refimage_ray.sources.pages import synthesize_pages
    from refimage_ray.stages.dedup import add_content_hash

    tp = synthesize_pages(120, seed=7)
    base = pa.table(
        {
            "doc_id": pa.array(range(tp.num_rows), pa.int64()),
            "text": tp["text"],
            "url": tp["url"],
        }
    )
    dup = base.slice(0, 30).set_column(
        0, "doc_id", pa.array(range(1000, 1030), pa.int64())
    )
    docs = add_content_hash(pa.concat_tables([base, dup]))
    cfg = EngineConfig(num_shards=4, salt_buckets=2)

    monkeypatch.setattr(build_mod, "DRIVER_LOCAL_ROWS", 0)
    monkeypatch.setattr(build_mod, "NARROW_LOCAL_ROWS", 0)
    monkeypatch.setenv("REFIMAGE_BLOOM_LOSERS", "0")
    d_bloom = str(tmp_path / "bloom")
    res_b = build_index(rd.from_arrow(docs), d_bloom, cfg, dedup_exact=True)
    assert res_b.metrics["loser_set"] == "bloom"

    monkeypatch.setenv("REFIMAGE_BLOOM_LOSERS", "99999999")
    d_exact = str(tmp_path / "exact")
    res_e = build_index(rd.from_arrow(docs), d_exact, cfg, dedup_exact=True)
    assert res_e.metrics["loser_set"] == "exact"

    # no false negatives: bloom n_docs <= exact n_docs; tiny corpus at
    # fp=1e-4 -> equality expected (and deterministic)
    assert res_b.metrics["n_docs"] == res_e.metrics["n_docs"]
    assert res_b.metrics["n_dup_losers"] == 30 + res_e.metrics["n_dup_losers"] - 30


def test_dedup_against_index_matches_full_rebuild(ray_session, tmp_path):
    """Cross-crawl dedup == the delta slice of a full-corpus dedup when
    delta ids are larger (existing corpus wins, then first-id wins)."""
    import pyarrow as pa
    import ray.data as rd

    from refimage_ray.config import EngineConfig
    from refimage_ray.index.build import build_index
    from refimage_ray.stages.dedup import add_content_hash, dedup_against_index

    old_texts = [f"old doc {i % 7}" for i in range(20)]      # dups inside
    delta_texts = (
        ["old doc 3", "old doc 5"]                           # cross dups
        + [f"new doc {i % 4}" for i in range(10)]            # delta dups
    )
    old = pa.table({
        "doc_id": pa.array(range(20), pa.int64()),
        "text": pa.array(old_texts),
    })
    delta = pa.table({
        "doc_id": pa.array(range(100, 100 + len(delta_texts)), pa.int64()),
        "text": pa.array(delta_texts),
    })
    idx = str(tmp_path / "old_idx")
    cfg = EngineConfig(num_shards=4, salt_buckets=2)
    build_index(
        rd.from_arrow(add_content_hash(old)), idx, cfg, dedup_exact=True
    )
    got = sorted(
        r["doc_id"]
        for r in dedup_against_index(rd.from_arrow(delta), idx)
        .select_columns(["doc_id"]).take_all()
    )
    # brute force over the union, first-id-wins, then restrict to delta
    seen: dict[str, int] = {}
    for i, txt in list(enumerate(old_texts)) + [
        (100 + j, t) for j, t in enumerate(delta_texts)
    ]:
        seen.setdefault(txt, i)
    want = sorted(i for i in seen.values() if i >= 100)
    assert got == want
    # bloom mode: no false negatives (at this size, exact too)
    got_bloom = sorted(
        r["doc_id"]
        for r in dedup_against_index(rd.from_arrow(delta), idx,
                                     method="bloom")
        .select_columns(["doc_id"]).take_all()
    )
    assert got_bloom == want


def test_dedup_against_index_excludes_dead_docs(ray_session, tmp_path):
    """Tombstoned content is re-ingestable: the live basis excludes
    dead ids, so a deleted doc's text survives the delta filter."""
    import pyarrow as pa
    import ray.data as rd

    from refimage_ray.config import EngineConfig
    from refimage_ray.index.build import build_index
    from refimage_ray.index.lifecycle import delete_docs
    from refimage_ray.stages.dedup import add_content_hash, dedup_against_index

    old = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array([f"unique text {i}" for i in range(6)]),
    })
    idx = str(tmp_path / "idx")
    cfg = EngineConfig(num_shards=4, salt_buckets=2)
    build_index(
        rd.from_arrow(add_content_hash(old)), idx, cfg, dedup_exact=True
    )
    delete_docs(idx, [2])
    delta = pa.table({
        "doc_id": pa.array([200, 201], pa.int64()),
        "text": pa.array(["unique text 2", "unique text 3"]),
    })
    got = sorted(
        r["doc_id"]
        for r in dedup_against_index(rd.from_arrow(delta), idx)
        .select_columns(["doc_id"]).take_all()
    )
    assert got == [200]  # deleted content re-ingestable; live content not
