"""Artifact fsck: clean index passes shallow+deep; injected damage
(missing file, size mismatch, foreign-shard row, stale manifest count)
is reported, never raised."""

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from refimage_ray.index.fsck import verify_index


def _copy_index(src: str, dst: str) -> str:
    shutil.copytree(src, dst)
    return dst


def test_clean_index_passes_deep(ray_session, built_index):
    rep = verify_index(built_index[0], deep=True)
    assert rep["ok"], rep["problems"]
    assert rep["checked_partitions"] > 0


def test_missing_partition_detected(built_index, tmp_path):
    d = _copy_index(built_index[0], str(tmp_path / "idx"))
    man = json.load(open(os.path.join(d, "manifest.json")))
    victim = man["partitions"][0]["path"]
    os.remove(os.path.join(d, victim))
    rep = verify_index(d)
    assert not rep["ok"]
    assert any(victim in p and "missing" in p for p in rep["problems"])


def test_torn_partition_detected(built_index, tmp_path):
    d = _copy_index(built_index[0], str(tmp_path / "idx"))
    man = json.load(open(os.path.join(d, "manifest.json")))
    victim = os.path.join(d, man["partitions"][0]["path"])
    with open(victim, "ab") as f:
        f.write(b"x")  # simulated torn/foreign write
    rep = verify_index(d)
    assert not rep["ok"]
    assert any("size" in p for p in rep["problems"])


def test_missing_docs_success_detected(built_index, tmp_path):
    d = _copy_index(built_index[0], str(tmp_path / "idx"))
    os.remove(os.path.join(d, "docs", "_SUCCESS"))
    rep = verify_index(d)
    assert not rep["ok"]
    assert any("_SUCCESS" in p for p in rep["problems"])


def test_deep_catches_manifest_count_drift(ray_session, built_index, tmp_path):
    """Rewrite one partition with a dropped term but keep the manifest
    (and file_bytes) in sync shallow-ly — only the deep decode notices."""
    d = _copy_index(built_index[0], str(tmp_path / "idx"))
    man = json.load(open(os.path.join(d, "manifest.json")))
    part = max(man["partitions"], key=lambda p: p["n_terms"])
    fp = os.path.join(d, part["path"])
    t = pq.read_table(fp)
    assert t.num_rows >= 2
    pq.write_table(t.slice(1), fp)  # drop a whole term silently
    part["file_bytes"] = os.path.getsize(fp)  # shallow check stays green
    json.dump(man, open(os.path.join(d, "manifest.json"), "w"))
    assert verify_index(d)["ok"]  # shallow misses it by design
    rep = verify_index(d, deep=True)
    assert not rep["ok"]
    assert any("n_terms" in p or "n_postings" in p for p in rep["problems"])


def test_missing_manifest(tmp_path):
    rep = verify_index(str(tmp_path))
    assert not rep["ok"]


def test_docpart_fsck_clean_and_df_drift(ray_session, built_index, tmp_path):
    """Doc-partitioned layout: clean pass; then a silently-corrupted
    global terms/ df table is caught by the deep re-aggregation."""
    import pyarrow as pa

    from refimage_ray.config import EngineConfig
    from refimage_ray.index.docpart import build_doc_partitioned
    from refimage_ray.index.reader import staged_docs

    d = str(tmp_path / "dp")
    cfg = EngineConfig(num_shards=8, salt_buckets=4, hot_df_fraction=0.05)
    build_doc_partitioned(
        staged_docs(built_index[0], columns=["doc_id", "text"]),
        d, cfg, num_doc_shards=4,
    )
    rep = verify_index(d, deep=True)
    assert rep["ok"] and rep["layout"] == "doc-partitioned", rep["problems"]

    # corrupt one df in terms/ (shallow-invisible)
    tdir = os.path.join(d, "terms")
    f = next(x for x in sorted(os.listdir(tdir)) if x.endswith(".parquet"))
    t = pq.read_table(os.path.join(tdir, f))
    if t.num_rows:
        dfs = t["df"].to_pylist()
        dfs[0] += 7
        t = t.set_column(t.schema.get_field_index("df"), "df",
                         pa.array(dfs, t["df"].type))
        pq.write_table(t, os.path.join(tdir, f))
        assert verify_index(d)["ok"]  # shallow can't see it
        rep = verify_index(d, deep=True)
        assert not rep["ok"] and any("df drift" in p for p in rep["problems"])


def test_docpart_fsck_tolerates_empty_shards_flags_stale(
    ray_session, built_index, tmp_path
):
    """A hash can leave doc-shard buckets empty on a small corpus —
    fewer files than num_doc_shards is HEALTHY (presence is checked
    against the manifest's recorded file set), while a stale file from
    a prior run is flagged."""
    import shutil

    import pyarrow as pa
    import ray.data as rd

    from refimage_ray.config import EngineConfig
    from refimage_ray.index.docpart import build_doc_partitioned

    d = str(tmp_path / "dp3")
    cfg = EngineConfig(num_shards=8, salt_buckets=4, hot_df_fraction=0.05)
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "text": pa.array([f"the data doc {i} scan join" for i in range(6)]),
    })
    # 16 buckets over a 6-doc corpus: most buckets are empty
    build_doc_partitioned(rd.from_arrow(docs), d, cfg, num_doc_shards=16)
    n_files = len([f for f in os.listdir(d) if f.startswith("docshard-")])
    assert n_files < 16  # the premise: some buckets WERE empty
    rep = verify_index(d, deep=True)
    assert rep["ok"], rep["problems"]

    # a leftover file from a prior/foreign run is a problem
    present = {f for f in os.listdir(d) if f.startswith("docshard-")}
    src = sorted(present)[0]
    free = next(
        f"docshard-{i:05d}.parquet" for i in range(16)
        if f"docshard-{i:05d}.parquet" not in present
    )
    shutil.copy(os.path.join(d, src), os.path.join(d, free))
    rep = verify_index(d)
    assert not rep["ok"] and any("stale" in p for p in rep["problems"])


def test_docpart_fsck_missing_shard(ray_session, built_index, tmp_path):
    from refimage_ray.config import EngineConfig
    from refimage_ray.index.docpart import build_doc_partitioned
    from refimage_ray.index.reader import staged_docs

    d = str(tmp_path / "dp2")
    cfg = EngineConfig(num_shards=8, salt_buckets=4, hot_df_fraction=0.05)
    build_doc_partitioned(
        staged_docs(built_index[0], columns=["doc_id", "text"]),
        d, cfg, num_doc_shards=4,
    )
    os.remove(os.path.join(d, "docshard-00002.parquet"))
    rep = verify_index(d)
    assert not rep["ok"]


def test_fsck_docpart_docvalues(ray_session, tiny_docs, tmp_path):
    """fsck covers the docvalues files: green on a values-built
    artifact (deep incl. posting-coverage), red on a missing sibling
    and on a truncated universe."""
    import ray.data as rd

    from refimage_ray.config import EngineConfig
    from refimage_ray.index.docpart import build_doc_partitioned

    doc_dir = str(tmp_path / "dv")
    build_doc_partitioned(
        rd.from_arrow(tiny_docs), doc_dir,
        EngineConfig(num_shards=4, salt_buckets=2),
        num_doc_shards=4, value_columns=["lang"],
    )
    res = verify_index(doc_dir, deep=True)
    assert res["ok"], res["problems"]

    d = str(tmp_path / "missing")
    shutil.copytree(doc_dir, d)
    vf = sorted(f for f in os.listdir(d) if f.startswith("docvalues-"))[0]
    os.remove(os.path.join(d, vf))
    res = verify_index(d)
    assert not res["ok"] and any("missing" in p for p in res["problems"])

    d2 = str(tmp_path / "truncated")
    shutil.copytree(doc_dir, d2)
    p = os.path.join(d2, vf)
    t = pq.read_table(p)
    pq.write_table(t.slice(0, t.num_rows // 2), p)
    res = verify_index(d2, deep=True)
    assert not res["ok"] and any("universe" in p for p in res["problems"])


def test_fsck_docpart_zero_row_values_file(ray_session, tiny_docs, tmp_path):
    """A docvalues file truncated to ZERO rows must be a reported
    problem, not an IndexError crashing fsck."""
    import ray.data as rd

    from refimage_ray.config import EngineConfig
    from refimage_ray.index.docpart import build_doc_partitioned

    doc_dir = str(tmp_path / "dv0")
    build_doc_partitioned(
        rd.from_arrow(tiny_docs), doc_dir,
        EngineConfig(num_shards=4, salt_buckets=2),
        num_doc_shards=4, value_columns=["lang"],
    )
    vf = sorted(f for f in os.listdir(doc_dir)
                if f.startswith("docvalues-"))[0]
    p = os.path.join(doc_dir, vf)
    t = pq.read_table(p)
    pq.write_table(t.slice(0, 0), p)
    res = verify_index(doc_dir, deep=True)
    assert not res["ok"]
    assert any("0 rows" in x for x in res["problems"]), res["problems"]


def test_fsck_deep_verifies_positions(ray_session, tiny_docs, tmp_path):
    """Deep fsck on positional artifacts (both layouts): clean passes;
    a corrupted positions blob is caught."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data as rd

    from refimage_ray.config import EngineConfig
    from refimage_ray.index.build import build_index
    from refimage_ray.index.docpart import build_doc_partitioned
    from refimage_ray.index.fsck import verify_docpart_index, verify_index

    cfg = EngineConfig(num_shards=4, salt_buckets=2, store_positions=True)
    dt, dd = str(tmp_path / "t"), str(tmp_path / "d")
    build_index(rd.from_arrow(tiny_docs), dt, cfg)
    build_doc_partitioned(rd.from_arrow(tiny_docs), dd, cfg, num_doc_shards=2)
    assert verify_index(dt, deep=True)["ok"]
    assert verify_docpart_index(dd, deep=True)["ok"]

    # corrupt one positions blob in one docpart shard file
    import glob

    f = sorted(glob.glob(os.path.join(dd, "docshard-*.parquet")))[0]
    t = pq.read_table(f)
    from refimage_ray.functions.codec import varbyte_encode
    import numpy as np

    bad = t.set_column(
        t.schema.get_field_index("positions"), "positions",
        pa.array(
            [varbyte_encode(np.array([1], np.uint64))] * t.num_rows,
            pa.binary(),
        ),
    )
    pq.write_table(bad, f)
    rep = verify_docpart_index(dd, deep=True)
    assert not rep["ok"] and any("positions" in p for p in rep["problems"])


def test_fsck_checks_lm_artifact(ray_session, built_index, tiny_docs):
    import json
    import os

    import ray.data as rd

    from refimage_ray.index.fsck import verify_index
    from refimage_ray.stages.lm import save_bigram_lm, train_bigram_lm

    index_dir, _, _ = built_index
    lm_dir = os.path.join(index_dir, "lm")
    try:
        save_bigram_lm(train_bigram_lm(rd.from_arrow(tiny_docs)), lm_dir)
        assert verify_index(index_dir)["ok"]
        meta = json.load(open(os.path.join(lm_dir, "lm.json")))
        meta["n_bigrams"] += 1
        json.dump(meta, open(os.path.join(lm_dir, "lm.json"), "w"))
        rep = verify_index(index_dir)
        assert not rep["ok"]
        assert any("lm/bigrams" in p for p in rep["problems"])
    finally:
        import shutil

        shutil.rmtree(lm_dir, ignore_errors=True)
