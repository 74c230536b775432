"""Snapshot/restore (index/snapshot.py): checksummed copies, damage
detection, resume-skip, restored artifact answers identically."""

from __future__ import annotations

import json
import os

import pytest

from refimage_ray.index.snapshot import (
    SNAP_MANIFEST,
    restore_index,
    snapshot_index,
    verify_snapshot,
)
from refimage_ray.query.engine import LocalSearcher


@pytest.fixture()
def snap(built_index, tmp_path):
    index_dir, _, _ = built_index
    snap_dir = str(tmp_path / "snap")
    man = snapshot_index(index_dir, snap_dir)
    return index_dir, snap_dir, man


def test_snapshot_verifies_and_restores_identically(snap, tmp_path):
    index_dir, snap_dir, man = snap
    assert len(man["files"]) > 10
    assert verify_snapshot(snap_dir)["ok"]
    out = str(tmp_path / "restored")
    assert restore_index(snap_dir, out)["ok"]
    a = LocalSearcher(index_dir)
    b = LocalSearcher(out)
    for q in ["the data join", "spark query", "merge sort"]:
        assert a.search(q, k=10) == b.search(q, k=10)


def test_snapshot_detects_damage(snap):
    _, snap_dir, man = snap
    victim = os.path.join(
        snap_dir, next(f["path"] for f in man["files"] if "part-" in f["path"])
    )
    with open(victim, "r+b") as f:
        f.seek(10)
        f.write(b"\x00\x00\x00")
    res = verify_snapshot(snap_dir)
    assert not res["ok"] and "checksum mismatch" in res["errors"][0]
    with pytest.raises(IOError, match="damaged"):
        restore_index(snap_dir, snap_dir + "-x")


def test_snapshot_missing_manifest_is_invalid(snap):
    _, snap_dir, _ = snap
    os.remove(os.path.join(snap_dir, SNAP_MANIFEST))
    assert not verify_snapshot(snap_dir)["ok"]


def test_snapshot_resume_skips_copied_files(snap):
    index_dir, snap_dir, man = snap
    # drop one file + the manifest (as if interrupted), re-snapshot:
    # the rest must be skipped (mtimes untouched), the hole refilled
    victim = man["files"][0]["path"]
    os.remove(os.path.join(snap_dir, victim))
    os.remove(os.path.join(snap_dir, SNAP_MANIFEST))
    other = man["files"][-1]["path"]
    before = os.path.getmtime(os.path.join(snap_dir, other))
    man2 = snapshot_index(index_dir, snap_dir)
    assert verify_snapshot(snap_dir)["ok"]
    assert os.path.getmtime(os.path.join(snap_dir, other)) == before
    assert {f["path"] for f in man2["files"]} == {f["path"] for f in man["files"]}


def test_restore_refuses_overwrite_without_force(snap, tmp_path):
    index_dir, snap_dir, _ = snap
    with pytest.raises(FileExistsError):
        restore_index(snap_dir, index_dir)
    out = str(tmp_path / "forced")
    restore_index(snap_dir, out)
    assert restore_index(snap_dir, out, force=True)["ok"]


def test_stale_tmp_files_excluded(built_index, tmp_path):
    index_dir, _, _ = built_index
    stale = os.path.join(index_dir, "docs", "stale.parquet.tmp")
    with open(stale, "w") as f:
        f.write("junk")
    try:
        snap_dir = str(tmp_path / "snap2")
        man = snapshot_index(index_dir, snap_dir)
        assert all(not f["path"].endswith(".tmp") for f in man["files"])
    finally:
        os.remove(stale)
