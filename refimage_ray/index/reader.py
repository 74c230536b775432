"""Index artifact reader — load posting-list partitions into memory.

Reference analog: ``load_index`` — FAISS index + id map loaded once
into process memory and kept resident for all queries
(``/root/reference/src/refimage/search/__init__.py:362-396``,
``:57-60``).  Here each query actor loads the part files of its
assigned shards once in ``__init__``.

Salt-bucket merge: a hot term's postings live in several
``part-{shard}-{salt}`` files, each covering a disjoint, increasing
doc_id range — so merging is pure concatenation in salt order and the
result is globally doc_id-sorted (the property the build guarantees).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow.parquet as pq

from refimage_ray.functions.codec import decode_f64, decode_postings, varbyte_decode
from refimage_ray.index.manifest import load_manifest


@dataclass
class TermPostings:
    df: int
    doc_ids: np.ndarray        # int64, sorted ascending
    weights: np.ndarray        # float64, aligned
    tfs: np.ndarray            # int64, aligned
    max_weight: float
    block_last_doc: np.ndarray  # int64
    block_max_weight: np.ndarray  # float64
    dls: np.ndarray | None = None  # int64, aligned (doc lengths)
    positions: np.ndarray | None = None  # int32 flat, segmented by tfs
    # load-time rank of each doc_id in the sorted corpus universe
    # (see attach_ranks) — enables dense-array TAAT scoring
    ranks: np.ndarray | None = None


def load_doc_universe(index_dir: str) -> np.ndarray:
    """Sorted unique doc_id universe of a resident index, from the docs
    artifact (one narrow column read).  Memory: 8 B/doc — the same
    class as the resident posting lists themselves, so any index that
    fits a serving box can afford its universe.  (Trillion-doc serving
    goes through the doc-partitioned layout instead — index/docpart.py.)
    """
    import pyarrow.dataset as pads

    ds = pads.dataset(os.path.join(index_dir, "docs"))
    if "doc_id" not in ds.schema.names:  # empty corpus → schema-less dir
        return np.zeros(0, dtype=np.int64)
    t = ds.to_table(columns=["doc_id"])
    return np.unique(t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64))


def staged_docs(index_dir: str, columns: list[str] | None = None):
    """Canonical reader of an index's staged corpus: ``docs/`` minus
    the exact-dup losers recorded in ``losers.parquet``.

    ``docs/`` keeps ALL staged rows (the write stage never re-shuffles
    the corpus); dedup is a side-channel of loser doc_ids that every
    downstream consumer must apply.  External consumers (oracle
    corpora, re-indexing into another layout, exports) should read
    through this instead of ``read_parquet(index_dir + "/docs")`` —
    the raw read silently includes dup losers and shifts N/avgdl/df.
    Returns a ``ray.data.Dataset``; the loser filter is a broadcast
    sorted-membership mask inside ``map_batches`` (no shuffle).
    """
    import pyarrow as pa
    import ray
    import ray.data as rd

    from refimage_ray.functions.arrays import sorted_membership

    ds = rd.read_parquet(os.path.join(index_dir, "docs"), columns=columns)
    losers_path = os.path.join(index_dir, "losers.parquet")
    if not os.path.exists(losers_path):
        return ds
    losers = np.sort(
        pq.read_table(losers_path)["doc_id"].to_numpy().astype(np.int64)
    )
    if len(losers) == 0:
        return ds
    losers_ref = ray.put(losers)

    def drop(batch: pa.Table) -> pa.Table:
        excl = ray.get(losers_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(~sorted_membership(excl, ids)))

    return ds.map_batches(drop, batch_format="pyarrow")


def attach_ranks(
    term_map: dict[str, TermPostings], all_ids: np.ndarray
) -> dict[str, TermPostings]:
    """One-time per-load rank remap: ``ranks[i] = index of doc_ids[i]
    in all_ids``.  Query-time disjunctive scoring then accumulates into
    a dense float64 array by fancy indexing (no per-query sort /
    factorize / searchsorted) — the classic score-array TAAT.  Ranks
    are int32 below 2^31 docs (+4 B/posting resident).  Self-checking:
    a doc_id absent from the universe (corrupt artifact) raises."""
    dtype = np.int32 if len(all_ids) < 2**31 else np.int64
    for term, p in term_map.items():
        r = np.searchsorted(all_ids, p.doc_ids)
        if len(p.doc_ids) and (
            r.max() >= len(all_ids) or not np.array_equal(all_ids[r], p.doc_ids)
        ):
            raise ValueError(
                f"posting doc_ids for {term!r} not all present in docs/ universe"
            )
        p.ranks = r.astype(dtype)
    return term_map


class IndexReader:
    def __init__(self, index_dir: str) -> None:
        self.index_dir = index_dir
        man = load_manifest(index_dir)
        if man is None:
            raise FileNotFoundError(f"no manifest.json under {index_dir}")
        self.manifest = man
        # tombstones: deleted doc_ids filtered out at load (reference
        # analog: remove_embedding requires a full rebuild,
        # search/__init__.py:268-320 — we do logical deletes + compact)
        tomb = os.path.join(index_dir, "tombstones.parquet")
        if os.path.exists(tomb):
            self.tombstones = np.sort(
                pq.read_table(tomb)["doc_id"].to_numpy().astype(np.int64)
            )
        else:
            self.tombstones = np.zeros(0, dtype=np.int64)
        self.stats = man["stats"]
        self.num_shards = int(man["config"]["num_shards"])
        self.n_docs = int(self.stats["n_docs"])
        self.avgdl = float(self.stats["avgdl"])
        self._parts_by_shard: dict[int, list[dict]] = {}
        for p in man["partitions"]:
            self._parts_by_shard.setdefault(int(p["shard"]), []).append(p)
        for plist in self._parts_by_shard.values():
            plist.sort(key=lambda p: int(p["salt"]))

    def shards(self) -> list[int]:
        return sorted(self._parts_by_shard)

    def load_shards(self, shards: list[int] | None = None) -> dict[str, TermPostings]:
        """Decode posting lists for the given shards (all if None)."""
        if shards is None:
            shards = self.shards()
        acc: dict[str, list[tuple]] = {}
        for shard in shards:
            for p in self._parts_by_shard.get(shard, []):
                t = pq.read_table(os.path.join(self.index_dir, p["path"]))
                for row in t.to_pylist():
                    acc.setdefault(row["term"], []).append(row)
        out: dict[str, TermPostings] = {}
        for term, rows in acc.items():
            # rows arrive in salt order per shard (manifest sorted);
            # doc ranges are disjoint increasing → concatenation is sorted
            rows.sort(key=lambda r: r["salt"])
            ids = np.concatenate([decode_postings(r["doc_ids"]) for r in rows])
            w = np.concatenate([decode_f64(r["weights"]) for r in rows])
            tfs = np.concatenate(
                [varbyte_decode(r["tfs"]).astype(np.int64) for r in rows]
            )
            if "dls" in rows[0]:
                dls = np.concatenate(
                    [varbyte_decode(r["dls"]).astype(np.int64) for r in rows]
                )
            else:  # pre-dls artifacts remain readable
                dls = None
            if "positions" in rows[0]:
                positions = np.concatenate(
                    [varbyte_decode(r["positions"]).astype(np.int32) for r in rows]
                )
            else:
                positions = None
            bl = np.concatenate(
                [np.asarray(r["block_last_doc"], dtype=np.int64) for r in rows]
            )
            bm = np.concatenate(
                [np.asarray(r["block_max_weight"], dtype=np.float64) for r in rows]
            )
            # Tombstone semantics (documented): logical deletes remove
            # docs from RESULTS only; df / N / avgdl / weights keep
            # their pre-delete values until a compaction/merge rebuilds
            # them (Lucene-style deleted-docs behavior; the reference
            # simply required a full rebuild, search/__init__.py:268-320).
            # Stored block fences stay valid as upper bounds.
            if len(self.tombstones):
                from refimage_ray.functions.arrays import sorted_membership

                dead = sorted_membership(self.tombstones, ids)
                if dead.any():
                    keep = ~dead
                    if positions is not None:
                        from refimage_ray.index.pack import ragged_take

                        positions = ragged_take(
                            positions, tfs.astype(np.int64), np.flatnonzero(keep)
                        )
                    ids, w, tfs = ids[keep], w[keep], tfs[keep]
                    if dls is not None:
                        dls = dls[keep]
                    if len(ids) == 0:
                        continue
            out[term] = TermPostings(
                df=int(sum(r["df"] for r in rows)),
                doc_ids=ids,
                weights=w,
                tfs=tfs,
                max_weight=float(max(r["max_weight"] for r in rows)),
                block_last_doc=bl,
                block_max_weight=bm,
                dls=dls,
                positions=positions,
            )
        return out
