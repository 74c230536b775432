"""Build manifest — per-partition checkpoints with lineage.

The ``north_rule`` requires index construction "resumable from
per-partition checkpoints with lineage and per-stage metrics".
Reference analog: explicit ``save_index`` / ``load_index`` persistence
(``/root/reference/src/refimage/search/__init__.py:322-396``) plus the
spec's restart requirement
(``/root/reference/docs/requirements-spec.md:25``).

Layout under ``<index_dir>/``:

- ``docs/``                      — the docs metadata table (parquet) + ``_SUCCESS``
- ``part-{shard:05d}-{salt:02d}.parquet`` — posting-list partitions
- ``manifest.json``              — deterministic: config, corpus stats,
                                   input lineage, completed partitions
- ``metrics.json``               — timing/throughput (non-deterministic,
                                   kept separate so the *artifact* is
                                   byte-reproducible across resumes)

Writes are atomic (tmp file + ``os.replace``) so a killed build never
leaves a half-written partition that a resume would trust.
"""

from __future__ import annotations

import json
import os
from typing import Any


def part_filename(shard: int, salt: int) -> str:
    return f"part-{shard:05d}-{salt:02d}.parquet"


def atomic_write_bytes(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        # fsync per partition file costs ~10-50 ms of serial disk latency
        # per reducer; rename-atomicity is enough for resume correctness
        # (a torn file without its manifest entry is rebuilt anyway).
        # Set REFIMAGE_FSYNC=1 for crash-consistent durability.
        if os.environ.get("REFIMAGE_FSYNC") == "1":
            os.fsync(f.fileno())
    os.replace(tmp, path)


def atomic_write_json(path: str, obj: Any) -> None:
    atomic_write_bytes(path, json.dumps(obj, indent=1, sort_keys=True).encode())


def load_manifest(index_dir: str) -> dict | None:
    path = os.path.join(index_dir, "manifest.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def completed_partitions(index_dir: str) -> set[tuple[int, int]]:
    """(shard, salt) pairs that are checkpointed AND whose file exists."""
    man = load_manifest(index_dir)
    if not man:
        return set()
    done = set()
    for p in man.get("partitions", []):
        if os.path.exists(os.path.join(index_dir, p["path"])):
            done.add((int(p["shard"]), int(p["salt"])))
    return done


def save_manifest(
    index_dir: str,
    *,
    config: dict,
    stats: dict,
    lineage: list[dict],
    partitions: list[dict],
) -> dict:
    man = {
        "format_version": 1,
        "config": config,
        "stats": stats,
        "lineage": lineage,
        "partitions": sorted(partitions, key=lambda p: (p["shard"], p["salt"])),
    }
    atomic_write_json(os.path.join(index_dir, "manifest.json"), man)
    return man


def save_metrics(index_dir: str, metrics: dict) -> None:
    atomic_write_json(os.path.join(index_dir, "metrics.json"), metrics)
