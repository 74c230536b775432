"""Index fsck — verify an index artifact against its manifest.

Resumable 100-TB builds need a cheap answer to "is this artifact
complete and internally consistent?" before serving or merging it.
Two levels:

- **shallow** (driver-only, O(partitions) stat calls): manifest
  present and well-formed, every checkpointed partition file exists
  with the recorded byte size, ``docs/_SUCCESS`` present, stats
  totals consistent with the partition rows.
- **deep** (distributed, one Ray task per partition): decode every
  posting list and check the structural invariants the query path
  relies on — df matches the decoded length, doc_ids strictly
  increasing (delta+varbyte decode round-trips), weights finite with
  ``max_weight`` exact, block metadata consistent
  (``block_last_doc[-1]`` is the list's last doc), and the
  shard-routing invariant ``term_hash % num_shards == shard``
  (the round-2 hot-term salting bug class — a posting row landing in
  a foreign shard's file is invisible to LocalSearcher but breaks
  shard-routed serving).

Reference analog: the reference rebuilds its FAISS index when the
stored vectors and index disagree (``/root/reference/src/refimage/
search/__init__.py:100-145``); here the artifact is checkable without
a rebuild.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from refimage_ray.functions.codec import (
    decode_f64,
    delta_decode,
    varbyte_decode,
)
from refimage_ray.functions.hashing import blake2b64
from refimage_ray.index.manifest import load_manifest


def _check_positions(tag: str, pos_b: bytes, tf_b: bytes, errs: list) -> None:
    """Positional-index invariants for one term run: the flat positions
    blob segments exactly by tf, and positions ascend strictly WITHIN
    each doc's segment (they may reset at doc boundaries)."""
    pos = varbyte_decode(pos_b).astype(np.int64)
    tfs = varbyte_decode(tf_b).astype(np.int64)
    if len(pos) != int(tfs.sum()):
        errs.append(f"{tag}: positions len {len(pos)} != sum(tf) {int(tfs.sum())}")
        return
    if len(pos) > 1:
        starts = np.cumsum(tfs)[:-1]  # segment boundaries in [1, len)
        ok = np.diff(pos) > 0
        ok[starts - 1] = True  # cross-doc steps are unconstrained
        if not ok.all():
            errs.append(f"{tag}: positions not ascending within a doc")


def _check_partition(index_dir: str, part: dict, num_shards: int) -> list[str]:
    """Deep per-partition invariants → list of problem strings."""
    errs: list[str] = []
    path = os.path.join(index_dir, part["path"])
    t = pq.read_table(path)
    if t.num_rows != int(part["n_terms"]):
        errs.append(
            f"{part['path']}: n_terms {t.num_rows} != manifest {part['n_terms']}"
        )
    dfs = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    if int(dfs.sum()) != int(part["n_postings"]):
        errs.append(
            f"{part['path']}: sum(df) {int(dfs.sum())} != manifest "
            f"n_postings {part['n_postings']}"
        )
    shard = int(part["shard"])
    terms = t["term"].to_pylist()
    hashes = t["term_hash"].to_pylist()
    for i in range(t.num_rows):
        tag = f"{part['path']}[{terms[i]}]"
        h = int(hashes[i])
        if blake2b64(terms[i]) != h:
            errs.append(f"{tag}: stored term_hash mismatch")
        if h % num_shards != shard:
            errs.append(f"{tag}: routed to shard {h % num_shards}, stored in {shard}")
        ids = delta_decode(varbyte_decode(t["doc_ids"][i].as_py()))
        if len(ids) != dfs[i]:
            errs.append(f"{tag}: decoded {len(ids)} ids, df={dfs[i]}")
            continue
        if len(ids) > 1 and not (np.diff(ids.astype(np.int64)) > 0).all():
            errs.append(f"{tag}: doc_ids not strictly increasing")
        w = decode_f64(t["weights"][i].as_py())
        if len(w) != dfs[i] or not np.isfinite(w).all():
            errs.append(f"{tag}: bad weights")
        elif w.max() != t["max_weight"][i].as_py():
            errs.append(f"{tag}: max_weight stale")
        bl = t["block_last_doc"][i].as_py()
        if bl and int(bl[-1]) != int(ids[-1]):
            errs.append(f"{tag}: block_last_doc[-1] != last doc id")
        if "positions" in t.column_names and "tfs" in t.column_names:
            _check_positions(
                tag, t["positions"][i].as_py(), t["tfs"][i].as_py(), errs
            )
    return errs


def verify_docpart_index(index_dir: str, deep: bool = False) -> dict:
    """Doc-partitioned-layout fsck: shard files present and, with
    ``deep``, the per-shard decoded df partials re-aggregate EXACTLY to
    the stored global ``terms/`` df table (the invariant the layout's
    exact-idf scoring rests on), plus per-term structural checks."""
    problems: list[str] = []
    man = load_manifest(index_dir)
    shards = sorted(
        f for f in os.listdir(index_dir) if f.startswith("docshard-")
    )
    # the build writes one file per NON-EMPTY doc-shard group (the
    # hash may leave buckets empty on small/skewed corpora), so file
    # presence is checked against the manifest's recorded file SET —
    # catching both missing and stale/extra files exactly
    expected_files = man.get("docshard_files")
    if expected_files is not None:
        missing = sorted(set(expected_files) - set(shards))
        extra = sorted(set(shards) - set(expected_files))
        for f in missing:
            problems.append(f"{f}: recorded in manifest but missing")
        for f in extra:
            problems.append(
                f"{f}: not in manifest (stale file from a prior run?)"
            )
    else:  # pre-docshard_files manifests: bound-check the ordinals
        n_expected = int(man.get("num_doc_shards", len(shards)))
        if len(shards) > n_expected:
            problems.append(
                f"{len(shards)} docshard files, manifest says {n_expected}"
            )
        for f in shards:
            try:
                ordinal = int(f[len("docshard-"):].split(".")[0])
            except ValueError:
                problems.append(f"unparseable docshard filename: {f}")
                continue
            if ordinal >= n_expected:
                problems.append(
                    f"{f}: shard ordinal {ordinal} >= num_doc_shards "
                    f"{n_expected} (stale file from a prior layout?)"
                )
    if not os.path.isdir(os.path.join(index_dir, "terms")):
        problems.append("terms/ global-df table missing")

    # doc-value files: the manifest records which columns were built;
    # every NON-EMPTY doc shard must then carry a docvalues sibling
    # with exactly (doc_id + those columns); docvalues files on an
    # artifact built WITHOUT value_columns are stale leftovers
    vcols = man.get("value_columns") or []
    vfiles = {f for f in os.listdir(index_dir) if f.startswith("docvalues-")
              and f.endswith(".parquet")}
    if vcols:
        for f in shards:
            vf = f.replace("docshard-", "docvalues-")
            if vf not in vfiles:
                problems.append(f"{vf}: value_columns={vcols} but missing")
            else:
                names = set(pq.read_schema(os.path.join(index_dir, vf)).names)
                want = set(vcols) | {"doc_id"}
                if names != want:
                    problems.append(
                        f"{vf}: columns {sorted(names)} != manifest "
                        f"{sorted(want)}"
                    )
        # a values file may exist without a postings sibling (every doc
        # in that shard had zero tokens) — structurally fine
    elif vfiles:
        problems.append(
            f"{len(vfiles)} docvalues files but manifest has no "
            "value_columns (stale from a prior build?)"
        )

    if deep and not problems:
        check_values = bool(vcols)

        def check(batch: pa.Table) -> pa.Table:
            errs, terms, dfs = [], [], []
            for row in batch.to_pylist():
                t = pq.read_table(os.path.join(index_dir, row["f"]))
                vids = None
                if check_values:
                    vt = pq.read_table(
                        os.path.join(
                            index_dir,
                            row["f"].replace("docshard-", "docvalues-"),
                        ),
                        columns=["doc_id"],
                    )
                    vids = np.sort(
                        vt["doc_id"].to_numpy(zero_copy_only=False)
                        .astype(np.int64)
                    )
                    if len(vids) == 0 and t.num_rows:
                        errs.append(
                            f"{row['f']}: docvalues sibling has 0 rows "
                            "but shard has postings"
                        )
                        vids = None
                check_pos = "positions" in t.column_names
                for i in range(t.num_rows):
                    ids = delta_decode(varbyte_decode(t["doc_ids"][i].as_py()))
                    if check_pos:
                        _check_positions(
                            f"{row['f']}[{t['term'][i]}]",
                            t["positions"][i].as_py(), t["tfs"][i].as_py(),
                            errs,
                        )
                    if len(ids) != t["df_local"][i].as_py():
                        errs.append(f"{row['f']}[{t['term'][i]}]: df_local mismatch")
                    elif len(ids) > 1 and not (
                        np.diff(ids.astype(np.int64)) > 0
                    ).all():
                        errs.append(f"{row['f']}[{t['term'][i]}]: ids not sorted")
                    elif vids is not None:
                        # searcher-load invariant: posting docs must be
                        # covered by the shard's values universe, or
                        # filter masks would rank-misalign
                        j = np.searchsorted(vids, ids.astype(np.int64))
                        ok = (j < len(vids)) & (
                            vids[np.minimum(j, len(vids) - 1)]
                            == ids.astype(np.int64)
                        )
                        if not ok.all():
                            errs.append(
                                f"{row['f']}[{t['term'][i]}]: "
                                f"{int((~ok).sum())} posting docs not in "
                                "docvalues universe"
                            )
                terms.extend(t["term"].to_pylist())
                dfs.extend(t["df_local"].to_pylist())
            return pa.table(
                {
                    "kind": pa.array(
                        ["err"] * len(errs) + ["df"] * len(terms), pa.string()
                    ),
                    "term": pa.array([""] * len(errs) + terms, pa.string()),
                    "val": pa.array(errs + [str(d) for d in dfs], pa.string()),
                }
            )

        rows = (
            rd.from_items([{"f": f} for f in shards])
            .map_batches(check, batch_format="pyarrow", batch_size=2)
            .take_all()
        )
        agg: dict[str, int] = {}
        for r in rows:
            if r["kind"] == "err":
                problems.append(r["val"])
            else:
                agg[r["term"]] = agg.get(r["term"], 0) + int(r["val"])
        stored = pq.read_table(os.path.join(index_dir, "terms"))
        stored_df = dict(
            zip(stored["term"].to_pylist(),
                (int(x) for x in stored["df"].to_pylist()))
        )
        if agg != stored_df:
            diff = {t for t in set(agg) | set(stored_df)
                    if agg.get(t) != stored_df.get(t)}
            problems.append(
                f"global df drift on {len(diff)} terms (e.g. "
                f"{sorted(diff)[:3]})"
            )

    return {
        "ok": not problems,
        "layout": "doc-partitioned",
        "checked_partitions": len(shards),
        "deep": bool(deep),
        "problems": problems,
    }


def verify_index(index_dir: str, deep: bool = False) -> dict:
    """Check the artifact; returns ``{"ok": bool, "checked_partitions":
    n, "problems": [...]}`` (never raises on a bad artifact).  Detects
    the layout: term-partitioned (default build) or doc-partitioned
    (routes to :func:`verify_docpart_index`)."""
    problems: list[str] = []
    man = load_manifest(index_dir)
    if man is None:
        return {"ok": False, "checked_partitions": 0,
                "problems": ["manifest.json missing"]}
    if man.get("layout") == "doc-partitioned":
        return verify_docpart_index(index_dir, deep=deep)
    parts = man.get("partitions", [])
    if not os.path.exists(os.path.join(index_dir, "docs", "_SUCCESS")):
        problems.append("docs/_SUCCESS missing (docs stage incomplete)")

    seen = set()
    for p in parts:
        key = (int(p["shard"]), int(p["salt"]))
        if key in seen:
            problems.append(f"duplicate manifest entry for {key}")
        seen.add(key)
        fp = os.path.join(index_dir, p["path"])
        if not os.path.exists(fp):
            problems.append(f"{p['path']}: checkpointed but missing on disk")
        elif os.path.getsize(fp) != int(p["file_bytes"]):
            problems.append(
                f"{p['path']}: size {os.path.getsize(fp)} != manifest "
                f"{p['file_bytes']} (torn or foreign file)"
            )

    if deep and parts and not problems:
        num_shards = int(man["config"]["num_shards"])

        def check(batch: pa.Table) -> pa.Table:
            out = []
            for row in batch.to_pylist():
                out.extend(_check_partition(index_dir, row, num_shards))
            return pa.table({"problem": pa.array(out, pa.string())})

        errs_ds = rd.from_items(
            [{k: p[k] for k in ("path", "shard", "salt", "n_terms",
                                "n_postings")} for p in parts]
        ).map_batches(check, batch_format="pyarrow", batch_size=4)
        problems.extend(r["problem"] for r in errs_ds.take_all())

    problems.extend(_check_lm_artifact(index_dir))

    return {
        "ok": not problems,
        "checked_partitions": len(parts),
        "deep": bool(deep),
        "problems": problems,
    }


def _check_lm_artifact(index_dir: str) -> list[str]:
    """Optional ``lm/`` side artifact (CLI train-lm): when present its
    parquet row counts must match lm.json — a torn save would otherwise
    surface only as silently wrong suggester scores."""
    lm_dir = os.path.join(index_dir, "lm")
    meta_path = os.path.join(lm_dir, "lm.json")
    if not os.path.exists(meta_path):
        return []
    import json

    import pyarrow.parquet as pq

    out = []
    try:
        with open(meta_path) as f:
            meta = json.load(f)
        n_uni = pq.read_metadata(
            os.path.join(lm_dir, "unigrams.parquet")
        ).num_rows
        n_big = pq.read_metadata(
            os.path.join(lm_dir, "bigrams.parquet")
        ).num_rows
        if n_uni != int(meta["n_vocab"]):
            out.append(f"lm/unigrams.parquet: {n_uni} rows != lm.json "
                       f"n_vocab {meta['n_vocab']}")
        if n_big != int(meta["n_bigrams"]):
            out.append(f"lm/bigrams.parquet: {n_big} rows != lm.json "
                       f"n_bigrams {meta['n_bigrams']}")
    except Exception as exc:  # torn/unreadable artifact IS the finding
        out.append(f"lm/ artifact unreadable: {exc}")
    return out
