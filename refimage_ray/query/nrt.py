"""Near-real-time search: a base artifact + an in-memory delta buffer.

Lucene-NRT analog for this engine: freshly added documents become
searchable IMMEDIATELY (no rebuild, no artifact write) by holding
their postings in process memory and merging them with the base
index's postings *at query time, with merged global statistics* —
N, avgdl, df and every per-posting weight are recomputed over
base ∪ buffer, so a DeltaSearcher's results are **bit-identical** to a
full rebuild over the union corpus (asserted in tests/test_nrt.py).

Reference analog: the reference adds one vector at a time straight
into the resident FAISS index (`/root/reference/src/refimage/search/
__init__.py:243-261` index.add) — NRT-by-construction but with no
persistence story.  Here the persistent artifact stays immutable and
the buffer is explicitly flushed through the incremental-add lifecycle
(``index/lifecycle.add_documents``) when it grows past serving size.

Scale note: the buffer is a *serving-side* structure (thousands of
docs, not the corpus); each query recomputes weights only for ITS
terms' postings — O(query posting mass), the same order as scoring.
Filters/facets/order_by need the rank-aligned doc-value machinery of a
built artifact and therefore require a flush first (loud error).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from refimage_ray.index.manifest import load_manifest
from refimage_ray.index.reader import TermPostings
from refimage_ray.query.engine import LocalSearcher, _SearcherBase
from refimage_ray.query.scorer import bm25_weight

#: Per-searcher (per-shard, for the doc-partitioned wrap) cap on the
#: per-generation merged-postings memo.  Generous for any real query
#: mix — the memo holds only QUERIED terms — but bounds an adversarial
#: or long-tail query stream on a rarely-mutated index.
_TERM_MEMO_CAP = 65536


class _LRUTermMemo:
    """Bounded LRU for per-(term, generation) merged postings.

    A pure cache: eviction can only cost a rebuild on the next query
    for that term, never change results (the NRT bit-identity tests
    hold under a cap smaller than the query vocabulary).  Mutations
    (add/flush) still ``clear()`` the whole memo — generation safety
    is the caller's invariant, this class only bounds the size.

    THREAD-SAFE: searchers holding this memo are shared across
    ThreadingHTTPServer request threads, so the get's ``get +
    move_to_end`` pair (and setitem's ``popitem`` past the cap) must
    not interleave with a concurrent eviction or an add/flush
    ``clear()`` — unguarded, that interleaving raises ``KeyError`` and
    turns a ``/search`` into a 500.  One tiny lock around the dict ops
    (never around postings work) closes it."""

    __slots__ = ("_d", "_cap", "_lock")

    def __init__(self, cap: int = _TERM_MEMO_CAP):
        import threading
        from collections import OrderedDict

        self._d: "OrderedDict[str, TermPostings]" = OrderedDict()
        self._cap = cap
        self._lock = threading.Lock()

    def get(self, key: str):
        with self._lock:
            v = self._d.get(key)
            if v is not None:
                self._d.move_to_end(key)
            return v

    def __setitem__(self, key: str, value) -> None:
        with self._lock:
            d = self._d
            d[key] = value
            d.move_to_end(key)
            if len(d) > self._cap:
                d.popitem(last=False)

    def clear(self) -> None:
        with self._lock:
            self._d.clear()

    def __len__(self) -> int:
        return len(self._d)


def _buffer_postings(
    table: pa.Table, cfg
) -> tuple[dict[str, tuple], np.ndarray, np.ndarray]:
    """(doc_id, text) buffer rows → per-term (ids, tfs, dls) arrays +
    (sorted buffer ids, doc lengths aligned to them).  Vectorized: one
    tokenize_batch + one argsort; no per-row Python."""
    from refimage_ray.stages.tokenize import doc_lengths, tokenize_batch

    ids = table["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    dl = doc_lengths(table["text"], cfg).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    ids, dl = ids[order], dl[order]
    if len(np.unique(ids)) != len(ids):
        raise ValueError("duplicate doc_ids within the added batch")

    toks = tokenize_batch(table, cfg)
    t_ids = toks["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    t_tfs = toks["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
    terms = toks["term"]
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    import pyarrow.compute as pc

    dct = pc.dictionary_encode(terms)
    if isinstance(dct, pa.ChunkedArray):
        dct = dct.combine_chunks()
    codes = dct.indices.to_numpy(zero_copy_only=False)
    vocab = dct.dictionary.to_pylist()
    # group rows by (term code, doc_id): one lexsort, then split at
    # term-code boundaries — postings come out doc_id-sorted per term
    sel = np.lexsort((t_ids, codes))
    codes, t_ids, t_tfs = codes[sel], t_ids[sel], t_tfs[sel]
    bounds = np.flatnonzero(np.diff(codes)) + 1
    dls_all = dl[np.searchsorted(ids, t_ids)]
    out: dict[str, tuple] = {}
    for c_start, c_end in zip(
        np.concatenate(([0], bounds)), np.concatenate((bounds, [len(codes)]))
    ):
        if c_end == c_start:
            continue
        term = vocab[codes[c_start]]
        out[term] = (
            t_ids[c_start:c_end],
            t_tfs[c_start:c_end],
            dls_all[c_start:c_end],
        )
    return out, ids, dl


def _merge_sorted_disjoint(a_key, b_key, a_payloads, b_payloads):
    """Linear merge of two SORTED, DISJOINT key arrays (+ aligned
    payload arrays) via searchsorted ranks — the NRT merge primitive.
    Disjointness is the CALLER's contract (both NRT searchers validate
    ids on add); violating it would collide output slots."""
    ia = np.arange(len(a_key), dtype=np.int64) + np.searchsorted(b_key, a_key)
    ib = np.arange(len(b_key), dtype=np.int64) + np.searchsorted(a_key, b_key)
    n = len(a_key) + len(b_key)
    key = np.empty(n, np.int64)
    key[ia], key[ib] = a_key, b_key
    outs = []
    for pa_, pb_ in zip(a_payloads, b_payloads):
        o = np.empty(n, pa_.dtype)
        o[ia], o[ib] = pa_, pb_
        outs.append(o)
    return key, outs


def _lookup_buffered(buf_tables: list, ids: list) -> list[dict]:
    """Metadata rows for buffered doc_ids (shared by both NRT
    searchers — serving's metadata join falls back here)."""
    import pyarrow.compute as pc

    want = sorted(set(int(i) for i in ids))
    out: list[dict] = []
    for t in buf_tables:
        m = pc.is_in(t["doc_id"], value_set=pa.array(want, pa.int64()))
        out.extend(t.filter(m).to_pylist())
    return out


class DeltaSearcher(_SearcherBase):
    """Search base ∪ buffer with exact merged statistics."""

    def __init__(self, index_dir: str, base: "LocalSearcher | None" = None):
        self.base = base if base is not None else LocalSearcher(index_dir)
        if self.base.index_dir != index_dir:
            raise ValueError("base searcher was loaded from a different dir")
        man = load_manifest(index_dir)
        stats = man["stats"]
        self.index_dir = index_dir
        self._base_n = int(stats["n_docs"])
        self._base_sum_dl = int(stats["sum_dl"])
        self._k1 = float(stats.get("k1", 1.2))
        self._b = float(stats.get("b", 0.75))
        self.token_pattern = man["config"].get("token_pattern")
        self.term_filter = man["config"].get("term_filter", "none")
        from refimage_ray.config import DEFAULT_CONFIG, EngineConfig

        self._cfg = (
            EngineConfig(
                **({"token_pattern": self.token_pattern}
                   if self.token_pattern else {}),
                term_filter=self.term_filter,
            )
            if self.token_pattern or self.term_filter != "none"
            else DEFAULT_CONFIG
        )
        # base universe for disjointness checks (narrow read; the dense
        # LocalSearcher already holds it)
        if self.base.all_ids is not None:
            self._base_ids = self.base.all_ids
        else:
            from refimage_ray.index.reader import load_doc_universe

            self._base_ids = load_doc_universe(index_dir)
        self._buf_tables: list[pa.Table] = []
        self._buf: dict[str, tuple] = {}
        self._buf_ids = np.zeros(0, dtype=np.int64)
        self._buf_sum_dl = 0
        # merged-postings memo: global stats (N, avgdl) only move on
        # add()/flush(), so a term's merged+reweighted postings are
        # immutable between buffer mutations — rebuild-per-query was
        # the NRT p95 gap (concat + sort + full weight recompute over
        # the BASE posting mass each query).  LRU-bounded (the queried
        # vocabulary can be adversarially large between mutations);
        # cleared on every buffer mutation.
        self._tm_cache = _LRUTermMemo()
        # dense-TAAT rank universe over base ∪ buffer: rebuilt once
        # per buffer MUTATION (linear merge of two sorted disjoint id
        # arrays), and per-term ranks attach lazily in the per-gen
        # _term_map memo — so queries between adds run the same dense
        # scoring path as the base searcher.
        self._rebuild_universe()
        self._refresh_stats()

    # ------------------------------------------------------------------

    def _rebuild_universe(self) -> None:
        base = self.base.all_ids
        if base is None:
            self.all_ids = None
            return
        b = self._buf_ids
        if not len(b):
            self.all_ids = base
            return
        self.all_ids, _ = _merge_sorted_disjoint(base, b, (), ())

    def doc_values(self, columns):
        # the artifact's doc-value files are rank-aligned to the BASE
        # universe; against the merged universe they would silently
        # misalign — keep the pre-dense loud error
        raise ValueError(
            "doc-value filters/facets need a built artifact covering "
            "the buffered docs; flush() first"
        )

    def _refresh_stats(self) -> None:
        self.n_docs = self._base_n + len(self._buf_ids)
        total = self._base_sum_dl + self._buf_sum_dl
        self.avgdl = total / self.n_docs if self.n_docs else 1.0

    def add(self, docs: pa.Table) -> int:
        """Buffer (doc_id, text) rows; they are searchable on return.
        Doc ids must be new (not in the base artifact or the buffer)."""
        if not {"doc_id", "text"} <= set(docs.column_names):
            raise ValueError("add() needs doc_id and text columns")
        postings, ids, dl = _buffer_postings(docs, self._cfg)
        clash = ids[np.isin(ids, self._buf_ids) | np.isin(ids, self._base_ids)]
        if len(clash):
            raise ValueError(
                f"doc_ids already indexed or buffered: {clash[:5].tolist()}"
            )
        for term, (p_ids, p_tfs, p_dls) in postings.items():
            have = self._buf.get(term)
            if have is None:
                self._buf[term] = (p_ids, p_tfs, p_dls)
            else:
                merged = tuple(
                    np.concatenate((a, b)) for a, b in zip(have, (p_ids, p_tfs, p_dls))
                )
                order = np.argsort(merged[0], kind="stable")
                self._buf[term] = tuple(m[order] for m in merged)
        self._buf_tables.append(docs)
        self._buf_ids = np.sort(np.concatenate((self._buf_ids, ids)))
        self._buf_sum_dl += int(dl.sum())
        self._tm_cache.clear()  # N/avgdl moved: every weight is stale
        self._rebuild_universe()
        self._refresh_stats()
        return len(ids)

    @property
    def buffered(self) -> int:
        return len(self._buf_ids)

    def lookup_buffered(self, ids: list[int]) -> list[dict]:
        """Metadata rows for buffered doc_ids (serving's metadata join
        falls back here for hits that aren't in the artifact yet)."""
        return _lookup_buffered(self._buf_tables, ids)

    def flush(self, out_dir: str, cfg=None) -> str:
        """Persist the buffer through the incremental-add lifecycle
        (delta build + shard merge) and clear it.  Returns ``out_dir``
        — reload a DeltaSearcher from there to continue."""
        if not self._buf_tables:
            raise ValueError("nothing buffered")
        import ray.data as rd

        from refimage_ray.config import DEFAULT_CONFIG
        from refimage_ray.index.lifecycle import add_documents

        add_documents(
            self.index_dir,
            rd.from_arrow(pa.concat_tables(self._buf_tables, promote_options="default")),
            out_dir,
            cfg if cfg is not None else DEFAULT_CONFIG,
        )
        self._buf_tables, self._buf = [], {}
        self._buf_ids = np.zeros(0, dtype=np.int64)
        self._buf_sum_dl = 0
        self._tm_cache.clear()
        self._rebuild_universe()
        self._refresh_stats()
        return out_dir

    # ------------------------------------------------------------------

    def _term_map(self, terms: list[str]) -> dict[str, TermPostings]:
        out: dict[str, TermPostings] = {}
        for t in terms:
            hit = self._tm_cache.get(t)
            if hit is not None:
                out[t] = hit
                continue
            bp = self.base.terms.get(t)
            buf = self._buf.get(t)
            if bp is None and buf is None:
                continue
            parts_ids, parts_tfs, parts_dls = [], [], []
            if bp is not None and bp.df > 0:
                if bp.dls is None:
                    raise ValueError(
                        "NRT merge needs per-posting doc lengths; rebuild "
                        "the base artifact (dls missing for term "
                        f"{t!r})"
                    )
                parts_ids.append(bp.doc_ids)
                parts_tfs.append(bp.tfs)
                parts_dls.append(bp.dls)
            if buf is not None:
                parts_ids.append(buf[0])
                parts_tfs.append(buf[1])
                parts_dls.append(buf[2])
            if len(parts_ids) > 1:
                # both sides arrive doc_id-sorted and disjoint: linear
                # two-way merge via searchsorted ranks (no argsort of
                # the full merged stream)
                ids, (tfs, dls) = _merge_sorted_disjoint(
                    parts_ids[0], parts_ids[1],
                    (parts_tfs[0], parts_dls[0]),
                    (parts_tfs[1], parts_dls[1]),
                )
            else:
                ids = parts_ids[0]
                tfs = parts_tfs[0]
                dls = parts_dls[0]
            w = bm25_weight(
                tfs.astype(np.float64), dls.astype(np.float64),
                self.avgdl, self._k1, self._b,
            )
            mx = float(w.max()) if len(w) else 0.0
            tp = TermPostings(
                df=len(ids),
                doc_ids=ids,
                weights=w,
                tfs=tfs,
                max_weight=mx,
                block_last_doc=ids[-1:].copy(),
                block_max_weight=np.array([mx], np.float64),
                dls=dls,
            )
            if self.all_ids is not None:
                r = np.searchsorted(self.all_ids, ids)
                tp.ranks = r.astype(
                    np.int32 if len(self.all_ids) < 2**31 else np.int64
                )
            self._tm_cache[t] = tp
            out[t] = tp
        return out

    def _expand_pairs(self, kind: str, arg: str) -> list[tuple[str, int]]:
        # expansion probes must see buffered vocabulary too; merge the
        # base's resident expansion with a probe over the buffer terms
        from refimage_ray.query.engine import _expand_resident

        base_pairs = dict(self.base._expand_pairs(kind, arg))
        if self._buf:
            fake = {
                t: TermPostings(
                    df=len(v[0]), doc_ids=v[0], weights=None, tfs=None,
                    max_weight=0.0, block_last_doc=None, block_max_weight=None,
                )
                for t, v in self._buf.items()
            }
            for t, df in _expand_resident(fake, {}, kind, arg):
                base_pairs[t] = base_pairs.get(t, 0) + df
        return sorted(base_pairs.items())


class _DeltaShardWrap(_SearcherBase):
    """One doc shard under merged NRT stats: query-term postings are
    the shard's stored (ids, tfs, dls) merged with the shard's slice
    of the buffer, REWEIGHTED under the union's N/avgdl — the same
    per-(term, generation) memo discipline as :class:`DeltaSearcher`.
    Sparse scoring (no rank universe); doc values refuse like the term
    NRT (the shard's values don't cover buffered docs)."""

    def __init__(self, owner: "DocPartDeltaSearcher", inner, gkey: int):
        self._owner = owner
        self._inner = inner
        self._gkey = gkey
        self.token_pattern = inner.token_pattern
        self.term_filter = inner.term_filter
        self.all_ids = None
        self._cache = _LRUTermMemo()

    # merged stats live on the owner (one refresh per add/flush)
    @property
    def n_docs(self) -> int:
        return self._owner.n_docs

    @property
    def avgdl(self) -> float:
        return self._owner.avgdl

    def doc_values(self, columns):
        raise ValueError(
            "doc-value filters/facets need a built artifact covering "
            "the buffered docs; flush() first"
        )

    def _term_map(self, terms: list[str]) -> dict[str, TermPostings]:
        out: dict[str, TermPostings] = {}
        buf = self._owner._shard_buf[self._gkey]
        for t in terms:
            hit = self._cache.get(t)
            if hit is not None:
                out[t] = hit
                continue
            bp = self._inner._tm.get(t)
            bb = buf.get(t)
            if bp is None and bb is None:
                continue
            parts = []
            if bp is not None and bp.df > 0:
                parts.append((bp.doc_ids, bp.tfs, bp.dls))
            if bb is not None:
                parts.append(bb)
            if len(parts) == 2:
                (a, at, ad), (b, bt, bd) = parts
                ids, (tfs, dls) = _merge_sorted_disjoint(
                    a, b, (at, ad), (bt, bd))
            else:
                ids, tfs, dls = parts[0]
            w = bm25_weight(
                tfs.astype(np.float64), dls.astype(np.float64),
                self._owner.avgdl, self._owner._k1, self._owner._b,
            )
            mx = float(w.max()) if len(w) else 0.0
            # idf basis: the UNION-GLOBAL df from the artifact's
            # global terms table + the buffer — NOT bp.df: a buffered
            # doc can land in a shard that holds no base postings for
            # the term, yet the term exists in other base shards
            gdf = self._owner._base_global_df.get(t, 0) + \
                self._owner._buf_df.get(t, 0)
            tp = TermPostings(
                df=gdf, doc_ids=ids, weights=w,
                tfs=tfs.astype(np.int64), max_weight=mx,
                block_last_doc=ids[-1:].copy(),
                block_max_weight=np.array([mx], np.float64),
                dls=dls.astype(np.int64),
            )
            self._cache[t] = tp
            out[t] = tp
        return out


class DocPartDeltaSearcher:
    """NRT over the DOC-PARTITIONED layout (the serving-default
    scatter): buffered (doc_id, text) rows route to their hash shard,
    each shard evaluates base∪buffer under the MERGED global stats,
    and the scatter merge stays exact (a doc's postings — stored or
    buffered — live wholly in its one shard).  Results are
    bit-identical to a full doc-partitioned rebuild over the union
    AND to the term layout's :class:`DeltaSearcher` (asserted in
    tests).  Same contract as DeltaSearcher: new doc_ids only;
    filters/facets need a flush; ``flush`` persists through the
    docpart incremental-add lifecycle."""

    def __init__(self, index_dir: str, base=None) -> None:
        from refimage_ray.index.docpart import DocPartSearcher

        self.base = base if base is not None else DocPartSearcher(index_dir)
        if self.base.index_dir != index_dir:
            raise ValueError("base searcher was loaded from a different dir")
        self.index_dir = index_dir
        man = self.base.manifest
        st = man["stats"]
        self.manifest = man
        self._base_n = int(st["n_docs"])
        self._base_sum_dl = int(st["sum_dl"])
        self._k1 = float(st.get("k1", 1.2))
        self._b = float(st.get("b", 0.75))
        self._num_doc_shards = int(man["num_doc_shards"])
        cfgd = man.get("config", {})
        from refimage_ray.config import engine_config_from_manifest

        self._cfg = engine_config_from_manifest(cfgd)
        # file order == DocPartSearcher.shards order; gkey parses from
        # the filename (empty shards write no file)
        self._shard_gkeys = [
            int(f.split("-")[1].split(".")[0])
            for f in man["docshard_files"]
        ]
        self._shard_buf: dict[int, dict[str, tuple]] = {
            g: {} for g in range(self._num_doc_shards)
        }
        # per-term GLOBAL buffered df (idf basis): shard postings are
        # slices, but TermPostings.df must be the UNION-global df —
        # base global df (terms/ table) + buffered docs with the term
        self._buf_df: dict[str, int] = {}
        self._base_global_df: dict = self.base._global_df
        self._base_ids: "np.ndarray | None" = None  # lazy universe
        self._buf_tables: list[pa.Table] = []
        self._buf_ids = np.zeros(0, np.int64)
        self._buf_sum_dl = 0
        self.shards = [
            _DeltaShardWrap(self, v, g)
            for v, g in zip(self.base.shards, self._shard_gkeys)
        ]
        self._refresh_stats()

    def _refresh_stats(self) -> None:
        self.n_docs = self._base_n + len(self._buf_ids)
        total = self._base_sum_dl + self._buf_sum_dl
        self.avgdl = total / self.n_docs if self.n_docs else 1.0

    @property
    def buffered(self) -> int:
        return len(self._buf_ids)

    def _base_universe(self) -> np.ndarray:
        """Sorted base doc ids, built lazily ONCE: per shard the
        docvalues universe when present, else the union of the shard's
        posting doc_ids (membership basis = docs with ≥1 posting — a
        fully-empty doc can't collide in scoring, only in metadata)."""
        if self._base_ids is None:
            parts = []
            for v in self.base.shards:
                if v.all_ids is not None:
                    parts.append(v.all_ids)
                elif v._tm:
                    parts.append(np.unique(np.concatenate(
                        [p.doc_ids for p in v._tm.values()])))
            self._base_ids = (
                np.unique(np.concatenate(parts)) if parts
                else np.zeros(0, np.int64)
            )
        return self._base_ids

    def add(self, docs: pa.Table) -> int:
        """Buffer rows; searchable on return.  Doc ids must be new —
        checked against the buffer AND the base artifact's doc
        universe (a duplicate id would collide the disjoint-merge's
        output slots → duplicate hits with garbage scores).

        A buffered doc whose hash shard wrote NO base file would need
        a fresh empty shard view; that only happens on pathological
        many-shards-few-docs layouts, so it raises loudly instead."""
        from refimage_ray.index.docpart import _doc_shard_of

        if not {"doc_id", "text"} <= set(docs.column_names):
            raise ValueError("add() needs doc_id and text columns")
        postings, ids, dl = _buffer_postings(docs, self._cfg)
        clash = ids[
            np.isin(ids, self._buf_ids)
            | np.isin(ids, self._base_universe())
        ]
        if len(clash):
            raise ValueError(
                f"doc_ids already indexed or buffered: "
                f"{clash[:5].tolist()}"
            )
        gk = _doc_shard_of(ids, self._num_doc_shards)
        missing = set(np.unique(gk).tolist()) - set(self._shard_gkeys)
        if missing:
            raise ValueError(
                f"buffered docs hash to shards with no base file "
                f"{sorted(missing)}; rebuild with fewer doc shards or "
                "flush through the lifecycle instead"
            )
        for term, (p_ids, p_tfs, p_dls) in postings.items():
            self._buf_df[term] = self._buf_df.get(term, 0) + len(p_ids)
            pg = _doc_shard_of(p_ids, self._num_doc_shards)
            for g in np.unique(pg):
                m = pg == g
                add_t = (p_ids[m], p_tfs[m], p_dls[m])
                buf = self._shard_buf[int(g)]
                have = buf.get(term)
                if have is None:
                    buf[term] = add_t
                else:
                    merged = tuple(
                        np.concatenate((a, b))
                        for a, b in zip(have, add_t)
                    )
                    o = np.argsort(merged[0], kind="stable")
                    buf[term] = tuple(m_[o] for m_ in merged)
        self._buf_tables.append(docs)
        self._buf_ids = np.sort(np.concatenate((self._buf_ids, ids)))
        self._buf_sum_dl += int(dl.sum())
        for sh in self.shards:
            sh._cache.clear()
        self._refresh_stats()
        return len(ids)

    def lookup_buffered(self, ids: list[int]) -> list[dict]:
        return _lookup_buffered(self._buf_tables, ids)

    def flush(self, out_dir: str, cfg=None) -> str:
        """Persist through the docpart incremental-add lifecycle and
        clear the buffer."""
        if not self._buf_tables:
            raise ValueError("nothing buffered")
        import ray.data as rd

        from refimage_ray.index.docpart_lifecycle import (
            add_documents_docpart,
        )

        add_documents_docpart(
            self.index_dir,
            rd.from_arrow(pa.concat_tables(
                self._buf_tables, promote_options="default")),
            out_dir,
        )
        self._buf_tables = []
        self._buf_ids = np.zeros(0, np.int64)
        self._buf_sum_dl = 0
        self._buf_df = {}
        self._shard_buf = {g: {} for g in range(self._num_doc_shards)}
        for sh in self.shards:
            sh._cache.clear()
        self._refresh_stats()
        return out_dir

    # --- scatter surface (same merge discipline as DocPartSearcher) ---

    def search(self, query, k=None, threshold=None, mode="or",
               cfg=None, where=None, offset: int = 0,
               min_match=None, after=None, boost=None, order_by=None):
        from refimage_ray.config import DEFAULT_CONFIG
        from refimage_ray.query.scorer import topk_select

        cfg = DEFAULT_CONFIG if cfg is None else cfg
        if order_by is not None:
            raise ValueError(
                "order_by needs doc values over the buffered docs; "
                "flush() first"
            )
        k = cfg.default_k if k is None else k
        threshold = cfg.default_threshold if threshold is None else threshold
        kk = k + offset
        ids_parts, score_parts = [], []
        for sh in self.shards:
            hits = sh.search(query, k=kk, threshold=threshold, mode=mode,
                             cfg=cfg, where=where, min_match=min_match,
                             after=after, boost=boost)
            if hits:
                ids_parts.append(np.array([d for d, _ in hits], np.int64))
                score_parts.append(
                    np.array([s for _, s in hits], np.float64))
        if not ids_parts:
            return []
        ids, scores = topk_select(
            np.concatenate(ids_parts), np.concatenate(score_parts),
            kk, threshold,
        )
        return list(zip(ids.tolist(), scores.tolist()))[offset:]

    def count(self, query, mode="or", where=None, min_match=None) -> int:
        return sum(
            sh.count(query, mode=mode, where=where, min_match=min_match)
            for sh in self.shards
        )

    def _needs_flush(self, what: str):
        raise ValueError(
            f"{what} queries over the docpart NRT buffer need a "
            "flush() first (positions/vocabulary structures are "
            "artifact-side)"
        )

    # loud, structured refusals (not AttributeError 500s) for the
    # search-family surfaces the buffer can't answer exactly yet
    def search_phrase(self, *a, **k):
        self._needs_flush("phrase")

    def search_near(self, *a, **k):
        self._needs_flush("NEAR")

    def search_prefix(self, *a, **k):
        self._needs_flush("prefix")

    def search_fuzzy(self, *a, **k):
        self._needs_flush("fuzzy")

    def search_wildcard(self, *a, **k):
        self._needs_flush("wildcard")

    def search_regex(self, *a, **k):
        self._needs_flush("regex")

    def search_phrase_prefix(self, *a, **k):
        self._needs_flush("phrase_prefix")

    def search_rescore(self, *a, **k):
        self._needs_flush("rescore")

    def search_many(self, *a, **k):
        self._needs_flush("batch (search_many)")

    def suggest(self, *a, **k):
        self._needs_flush("suggest")

    def _expand_pairs(self, *a, **k):
        self._needs_flush("vocabulary-browse (/terms)")

    def facets(self, *a, **k):
        self._needs_flush("facet")

    def composite(self, *a, **k):
        self._needs_flush("composite-paging")

    def search_grouped(self, *a, **k):
        self._needs_flush("grouped")
