"""Index snapshot / restore — checksummed, resumable artifact copies.

Completes the artifact lifecycle CRUD set (build / add / merge /
compact / delete / **snapshot / restore**).  Reference analog: the
reference's persistence story is "the SQLite file and the FAISS blob
ARE the backup" (/root/reference/src/refimage/storage.py:66-70 — a
single on-disk database); at 100 TB a snapshot must instead be a
partition-parallel copy with per-file integrity evidence, which is
what this module does:

- the file list comes from the MANIFEST (plus the fixed side files),
  never from a directory walk — stray temp files don't leak into
  snapshots;
- each file is copied by a Ray task (``rd.from_items(files)`` →
  ``map_batches``) and its md5 recorded; on an object store the same
  pipeline shape is a server-side copy per partition;
- ``snapshot_manifest.json`` (checksums + sizes) is written LAST and
  atomically — a snapshot without it is garbage by definition, which
  makes interrupted snapshots self-invalidating and re-runs skip
  files already copied with matching size+hash (resumability);
- ``restore`` re-verifies every checksum before declaring success and
  refuses to clobber an existing artifact unless told to.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import pyarrow as pa

from refimage_ray.index.manifest import load_manifest

SNAP_MANIFEST = "snapshot_manifest.json"

#: artifact side files / dirs not listed in manifest["partitions"]
_SIDE_FILES = ("manifest.json", "metrics.json", "losers.parquet",
               "tombstones.parquet")
_SIDE_DIRS = ("docs", "hot_sample", "side", "terms")


def _md5_file(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def _artifact_files(index_dir: str) -> list[str]:
    """Relative paths of every file belonging to the artifact."""
    man = load_manifest(index_dir)
    if man is None:
        raise FileNotFoundError(f"no manifest.json under {index_dir}")
    rels = [p["path"] for p in man["partitions"]]
    for f in _SIDE_FILES:
        if os.path.exists(os.path.join(index_dir, f)):
            rels.append(f)
    for d in _SIDE_DIRS:
        root = os.path.join(index_dir, d)
        if os.path.isdir(root):
            for dirpath, _dirs, files in os.walk(root):
                for f in sorted(files):
                    if f.endswith(".tmp"):
                        continue  # stale partials never enter a snapshot
                    rels.append(
                        os.path.relpath(os.path.join(dirpath, f), index_dir)
                    )
    return sorted(set(rels))


def _copy_batch(batch: pa.Table) -> pa.Table:
    """Ray task body: copy + hash a slice of the file list."""
    out_rows = {"path": [], "bytes": [], "md5": []}
    for row in batch.to_pylist():
        src, dst = row["src"], row["dst"]
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        want_md5 = None
        if os.path.exists(dst) and os.path.getsize(dst) == os.path.getsize(src):
            want_md5 = _md5_file(dst)  # resume candidate
        src_md5 = _md5_file(src)
        if want_md5 != src_md5:
            tmp = dst + ".tmp"
            shutil.copyfile(src, tmp)
            os.replace(tmp, dst)  # atomic per file
            if _md5_file(dst) != src_md5:
                raise IOError(f"copy verification failed for {src}")
        out_rows["path"].append(row["rel"])
        out_rows["bytes"].append(os.path.getsize(src))
        out_rows["md5"].append(src_md5)
    return pa.table(
        {
            "path": pa.array(out_rows["path"], pa.string()),
            "bytes": pa.array(out_rows["bytes"], pa.int64()),
            "md5": pa.array(out_rows["md5"], pa.string()),
        }
    )


def _parallel_copy(src_dir: str, dst_dir: str, rels: list[str]) -> list[dict]:
    import ray.data as rd

    items = [
        {
            "rel": r,
            "src": os.path.join(src_dir, r),
            "dst": os.path.join(dst_dir, r),
        }
        for r in rels
    ]
    rows = (
        rd.from_items(items)
        .map_batches(_copy_batch, batch_format="pyarrow", batch_size=8)
        .take_all()
    )
    return sorted(rows, key=lambda r: r["path"])


def snapshot_index(index_dir: str, snap_dir: str) -> dict:
    """Copy the artifact to ``snap_dir`` and write the checksummed
    snapshot manifest (last, atomically).  Returns the manifest dict.
    Re-running after an interruption skips files already copied."""
    rels = _artifact_files(index_dir)
    os.makedirs(snap_dir, exist_ok=True)
    files = _parallel_copy(index_dir, snap_dir, rels)
    snap = {"source": os.path.abspath(index_dir), "files": files}
    tmp = os.path.join(snap_dir, SNAP_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(snap_dir, SNAP_MANIFEST))
    return snap


def verify_snapshot(snap_dir: str) -> dict:
    """Re-hash every file against the snapshot manifest.  Returns
    ``{"ok": bool, "errors": [...]}`` — mirrors ``fsck``'s shape."""
    path = os.path.join(snap_dir, SNAP_MANIFEST)
    if not os.path.exists(path):
        return {"ok": False, "errors": ["missing snapshot_manifest.json"]}
    with open(path) as f:
        snap = json.load(f)
    errors = []
    for row in snap["files"]:
        p = os.path.join(snap_dir, row["path"])
        if not os.path.exists(p):
            errors.append(f"missing {row['path']}")
        elif os.path.getsize(p) != row["bytes"]:
            errors.append(f"size mismatch {row['path']}")
        elif _md5_file(p) != row["md5"]:
            errors.append(f"checksum mismatch {row['path']}")
    return {"ok": not errors, "errors": errors}


def restore_index(snap_dir: str, out_dir: str, force: bool = False) -> dict:
    """Verified restore: every checksum is re-checked on the restored
    copy; refuses to overwrite an existing artifact unless ``force``."""
    check = verify_snapshot(snap_dir)
    if not check["ok"]:
        raise IOError(f"snapshot is damaged: {check['errors'][:3]}")
    if load_manifest(out_dir) is not None and not force:
        raise FileExistsError(
            f"{out_dir} already holds an artifact (force=True to replace)"
        )
    if force:
        shutil.rmtree(out_dir, ignore_errors=True)
    with open(os.path.join(snap_dir, SNAP_MANIFEST)) as f:
        snap = json.load(f)
    rels = [r["path"] for r in snap["files"]]
    files = _parallel_copy(snap_dir, out_dir, rels)
    by_path = {r["path"]: r for r in files}
    for row in snap["files"]:
        got = by_path.get(row["path"])
        if got is None or got["md5"] != row["md5"]:
            raise IOError(f"restore verification failed for {row['path']}")
    return {"ok": True, "files": len(files)}
