"""Exact-substring span scrubbing (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better", §3 ExactSubstr): remove
from every document each token span covered by an ``n``-token gram that
also appears in at least ``min_docs`` distinct documents.

Where :func:`refimage_ray.pipelines.corpus.dup_span_stats` *counts*
duplicated positions, this stage *rewrites* the corpus — the actual
training-data cleaning step.  Overlapping grams are handled by position
coverage (a token is removed when ANY duplicated gram covers it), so
maximal duplicated spans of any alignment are excised in full — unlike
segment-level line dedup (``stages/lines.py``), which only catches
segment-aligned boilerplate.

Dataflow (the line-dedup broadcast shape):

1. **dup-gram pass** — per batch, per-doc-unique ``(g_hi, g_lo,
   doc_id, first_pos)`` rows (a doc's text is ONE row, so per-batch
   unique == globally per-doc unique); one narrow groupby over the
   128-bit gram key keeps grams seen in ≥ ``min_docs`` docs and elects
   the globally first occurrence ``(min doc_id, its pos)`` as winner.
2. **broadcast** — the dup-gram table (hashes + winners) is collected,
   lexsorted, and ``ray.put`` once.  For a larger-than-broadcast dup
   set, ``method="join"`` runs the fully-distributed variant instead
   (bucketed ``hash_join`` of occurrence rows against the dup-gram
   Dataset + a tag-union bucket groupby for the rebuild) — results
   identical, asserted by test.
3. **rebuild pass** — per batch: vectorized gram hashes with global
   flat start indices, double-binary-search membership probe
   (``sorted_pair_membership``), coverage mask widened by ``n``
   positions, kept tokens re-joined per doc with ONE
   ``ListArray``/``binary_join`` (no per-doc Python loop).

Gram identity is a 128-bit pair of independent positional mix-hashes —
the repo-wide collision discipline (a 64-bit collision here would
silently delete innocent text).  The cleaned text is in token space
(lowercased, punctuation-split), like the tokenized corpora the paper's
pipeline operates on.

Reference: this is corpus hygiene the reference system lacks; the
dedup-family anchor is ``/root/reference/src/refimage/storage.py``'s
content-hash uniqueness, generalized to substring granularity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from refimage_ray.config import DEFAULT_CONFIG, EngineConfig
from refimage_ray.functions.arrays import sorted_pair_membership
from refimage_ray.functions.hashing import md5_halves_string_array
from refimage_ray.stages.tokenize import _flat_tokens

_MIX_A = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant
_MIX_B = np.uint64(0xC2B2AE3D27D4EB4F)  # murmur3 finalizer odd constant


def _gram_hash_pairs(
    text: pa.ChunkedArray | pa.Array, n: int, cfg: EngineConfig
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, pa.Array,
           np.ndarray]:
    """text column → per-gram ``(g_hi, g_lo, parent_row, flat_start)``
    plus the flat token array and its per-token parent indices.

    ``flat_start`` is the gram's index in the flat token array — the
    coverage arithmetic needs it, and it doubles as the within-batch
    position basis (``pos_in_doc = flat_start - doc_first_flat``)."""
    flat, parent = _flat_tokens(text, cfg)
    parent = np.asarray(parent, dtype=np.int64)
    nf = len(flat)
    if nf < n:
        z = np.zeros(0, np.uint64)
        return z, z.copy(), np.zeros(0, np.int64), \
            np.zeros(0, np.int64), flat, parent
    # the halves must come from INDEPENDENT per-token hashes: two
    # polynomials over the same 64-bit token hash would both collapse
    # on one token-hash collision, defeating the 128-bit discipline
    h_a, h_b = md5_halves_string_array(flat)
    h_a = np.asarray(h_a, dtype=np.uint64)
    h_b = np.asarray(h_b, dtype=np.uint64)
    m = nf - n + 1
    acc_a = np.zeros(m, np.uint64)
    acc_b = np.zeros(m, np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n):
            acc_a = acc_a * _MIX_A + h_a[j: j + m]
            acc_b = acc_b * _MIX_B + h_b[j: j + m]
    ok = parent[:m] == parent[n - 1:]
    starts = np.flatnonzero(ok).astype(np.int64)
    return acc_a[ok], acc_b[ok], parent[:m][ok], starts, flat, parent


def duplicated_grams(
    docs_ds,
    *,
    n: int = 3,
    min_docs: int = 2,
    cfg: EngineConfig = DEFAULT_CONFIG,
    text_col: str = "text",
    doc_col: str = "doc_id",
    agg_buckets: int = 64,
):
    """Dataset of grams appearing in ≥ ``min_docs`` distinct docs:
    ``(g_hi, g_lo, nd, win_doc)`` — ``win_doc`` = smallest doc_id
    holding the gram (the keep-first survivor's doc; the surviving
    OCCURRENCE is that doc's first, recovered locally at rebuild).
    Pure Count/Min aggregates over per-doc-unique gram rows — no
    per-group Python (gram groups are token-scale)."""

    def partials(batch: pa.Table) -> pa.Table:
        g_hi, g_lo, parent, starts, flat, tok_parent = _gram_hash_pairs(
            batch[text_col], n, cfg
        )
        if len(g_hi) == 0:
            # schema must match the normal branch exactly (mixed block
            # schemas break the downstream groupby — the tokenize.py
            # empty-block rule)
            return pa.table({
                "g_hi": pa.array([], pa.int64()),
                "g_lo": pa.array([], pa.int64()),
                "nd": pa.array([], pa.int64()),
                "win_doc": pa.array([], pa.int64()),
            })
        ids = batch[doc_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # per-doc-unique gram rows (one text row per doc → per-batch
        # unique == globally per-doc unique), then a WITHIN-BATCH
        # combine to one row per distinct gram: partial distinct-doc
        # count + partial min doc.  Each doc lives in exactly one
        # batch, so Sum(partial counts) = global distinct-doc count
        # and Min(partial mins) = global winner — and the exchange
        # shrinks by the batch's duplication factor, which on
        # boilerplate-heavy web text (the target corpus) is large.
        df = pd.DataFrame({
            "g_hi": g_hi.view(np.int64), "g_lo": g_lo.view(np.int64),
            "doc_id": ids[parent],
        }).drop_duplicates()
        gb = (
            df.groupby(["g_hi", "g_lo"], sort=False)["doc_id"]
            .agg(["count", "min"])
            .reset_index()
        )
        return pa.table({
            "g_hi": pa.array(gb["g_hi"].to_numpy(np.int64), pa.int64()),
            "g_lo": pa.array(gb["g_lo"].to_numpy(np.int64), pa.int64()),
            "nd": pa.array(gb["count"].to_numpy(np.int64), pa.int64()),
            "win_doc": pa.array(gb["min"].to_numpy(np.int64), pa.int64()),
        })

    # PACKED exchange (the index build's pack.py discipline): the
    # naive groupby ships one row per (gram, batch) — tens of millions
    # of 32-byte rows whose per-row sort cost dominates the stage.
    # Instead each batch packs its per-bucket gram arrays into ONE
    # binary row per bucket (raw little-endian int64 bytes), the
    # exchange moves ~buckets rows per batch, and the per-bucket
    # reducer aggregates with lexsort + reduceat — all numpy.
    # ``agg_buckets`` reducer groups; each must hold its share of the
    # distinct-gram partials in one unpack — widen on large clusters
    # (the knob every sibling packed exchange exposes)
    AGG_BUCKETS = int(agg_buckets)

    def pack_partial(batch: pa.Table) -> pa.Table:
        from refimage_ray.functions.packexchange import pack_by_bucket

        g = partials(batch)
        hi = g["g_hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pack_by_bucket(
            (hi.view(np.uint64) % np.uint64(AGG_BUCKETS)).astype(np.int64),
            {
                "hi": hi,
                "lo": g["g_lo"].to_numpy(zero_copy_only=False).astype(np.int64),
                "nd": g["nd"].to_numpy(zero_copy_only=False).astype(np.int64),
                "win": g["win_doc"].to_numpy(
                    zero_copy_only=False).astype(np.int64),
            },
            bucket_col="bkt",
        )

    _GRAM_SCHEMA = pa.schema([
        ("g_hi", pa.int64()), ("g_lo", pa.int64()),
        ("nd", pa.int64()), ("win_doc", pa.int64()),
    ])

    def reduce_bucket(g: pa.Table) -> pa.Table:
        from refimage_ray.functions.packexchange import unpack_group

        if g.num_rows == 0:
            return _GRAM_SCHEMA.empty_table()
        a = unpack_group(
            g, {c: np.int64 for c in ("hi", "lo", "nd", "win")}
        )
        hi, lo = a["hi"], a["lo"]
        nd, win = a["nd"], a["win"]
        order = np.lexsort((lo, hi))
        hi, lo, nd, win = hi[order], lo[order], nd[order], win[order]
        change = np.ones(len(hi), dtype=bool)
        change[1:] = (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])
        bounds = np.flatnonzero(change)
        nd_tot = np.add.reduceat(nd, bounds)
        win_min = np.minimum.reduceat(win, bounds)
        keep = nd_tot >= min_docs
        return pa.table({
            "g_hi": pa.array(hi[bounds][keep], pa.int64()),
            "g_lo": pa.array(lo[bounds][keep], pa.int64()),
            "nd": pa.array(nd_tot[keep], pa.int64()),
            "win_doc": pa.array(win_min[keep], pa.int64()),
        })

    return (
        docs_ds.map_batches(pack_partial, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(reduce_bucket, batch_format="pyarrow")
    )


def scrub_dup_spans(
    docs_ds,
    *,
    n: int = 3,
    min_docs: int = 2,
    mode: str = "drop_all",
    return_text: bool = True,
    method: str = "auto",
    buckets: int = 64,
    auto_broadcast_max_grams: int = 2_000_000,
    cfg: EngineConfig = DEFAULT_CONFIG,
    text_col: str = "text",
    doc_col: str = "doc_id",
):
    """Rewrite every doc with duplicated-gram-covered token spans
    removed; Dataset of ``(doc_id, n_tokens, n_removed[, text])``.

    ``mode="drop_all"`` removes every occurrence (the aggressive
    ExactSubstr variant); ``mode="keep_first"`` keeps the globally
    first occurrence of each duplicated gram (smallest ``(doc_id,
    pos)``) and removes the rest.

    ``method="broadcast"`` collects the dup-gram table to the driver
    and probes it per batch — right whenever the dup set fits a
    broadcast (production n≈50: the dup set is proportional to actual
    duplication).  ``method="join"`` never materializes the dup set:
    occurrence rows join the dup-gram Dataset with the bucketed
    ``hash_join``, and the (doc, removed-position) rows meet the doc
    texts in a tag-union bucket groupby (one vectorized call per
    BUCKET, never per doc) — the exact >broadcast scale path, results
    identical by construction (and by test).

    ``method="auto"`` (default) counts the duplicated grams first (the
    dup table is the CHEAP side — its size tracks actual duplication,
    not corpus size) and picks broadcast when it is at most
    ``auto_broadcast_max_grams`` rows (~100 MB of driver state at the
    2M default), else the join path — removing the collect-a-huge-
    dup-set-on-the-driver footgun without giving up the fast small
    path.  The counted table is reused when broadcast wins; the join
    path re-derives it (one extra narrow aggregate pass)."""
    import ray

    if mode not in ("drop_all", "keep_first"):
        raise ValueError(
            f"mode must be 'drop_all' or 'keep_first', got {mode!r}"
        )
    if method not in ("auto", "broadcast", "join"):
        raise ValueError(
            f"method must be 'auto', 'broadcast' or 'join', got {method!r}"
        )
    from refimage_ray.functions.packexchange import collect_small_pandas

    dup_schema = pa.schema([
        ("g_hi", pa.int64()), ("g_lo", pa.int64()),
        ("nd", pa.int64()), ("win_doc", pa.int64()),
    ])
    dup = None
    dup_ds_counted = None
    if method == "auto":
        dup_ds_counted = duplicated_grams(
            docs_ds, n=n, min_docs=min_docs, cfg=cfg,
            text_col=text_col, doc_col=doc_col, agg_buckets=buckets,
        ).materialize()  # count + collect must not double-execute
        if dup_ds_counted.count() <= auto_broadcast_max_grams:
            method = "broadcast"
            dup = collect_small_pandas(dup_ds_counted, dup_schema)
        else:
            method = "join"
    if method == "join":
        return _scrub_via_join(
            docs_ds, n=n, min_docs=min_docs,
            keep_first=(mode == "keep_first"), return_text=return_text,
            cfg=cfg, text_col=text_col, doc_col=doc_col, buckets=buckets,
            # auto already materialized the dup-gram table for the
            # count — reuse it instead of re-running the dup-gram
            # discovery exchange over the whole corpus
            dup_ds=dup_ds_counted,
        )
    if dup is None:
        dup = collect_small_pandas(
            duplicated_grams(
                docs_ds, n=n, min_docs=min_docs, cfg=cfg,
                text_col=text_col, doc_col=doc_col, agg_buckets=buckets,
            ),
            dup_schema,
        )
    hi = dup["g_hi"].to_numpy().view(np.uint64)
    lo = dup["g_lo"].to_numpy().view(np.uint64)
    order = np.lexsort((lo, hi))
    shi_ref = ray.put(hi[order])
    slo_ref = ray.put(lo[order])
    wdoc_ref = ray.put(dup["win_doc"].to_numpy()[order])
    keep_first = mode == "keep_first"

    def rebuild(batch: pa.Table) -> pa.Table:
        g_hi, g_lo, parent, starts, flat, tok_parent = _gram_hash_pairs(
            batch[text_col], n, cfg
        )
        ids = batch[doc_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n_rows = batch.num_rows
        n_tokens = np.bincount(tok_parent, minlength=n_rows).astype(np.int64)
        covered = np.zeros(len(flat), dtype=bool)
        if len(g_hi):
            member, mpos = sorted_pair_membership(
                ray.get(shi_ref), ray.get(slo_ref), g_hi, g_lo,
                return_index=True,
            )
            drop = member.copy()
            if keep_first and member.any():
                # the surviving occurrence = the win_doc's FIRST
                # occurrence of the gram.  The doc's whole text is one
                # row, so "first in doc" is decidable locally: member
                # grams are in ascending flat order, so the first of
                # each (gram, row) run is the doc's first occurrence.
                wdoc = ray.get(wdoc_ref)
                m = np.flatnonzero(member)
                key_g, key_r = mpos[m], parent[m]
                o = np.lexsort((m, key_r, key_g))
                first_of_run = np.ones(len(m), dtype=bool)
                first_of_run[1:] = (key_g[o][1:] != key_g[o][:-1]) | (
                    key_r[o][1:] != key_r[o][:-1]
                )
                is_first = np.zeros(len(m), dtype=bool)
                is_first[o] = first_of_run
                is_winner = is_first & (ids[key_r] == wdoc[key_g])
                drop[m[is_winner]] = False
            hit = starts[drop]
            for j in range(n):
                covered[hit + j] = True
        kept = ~covered
        n_removed = n_tokens - np.bincount(
            tok_parent[kept], minlength=n_rows
        ).astype(np.int64)
        cols = {
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_removed": pa.array(n_removed, pa.int64()),
        }
        if return_text:
            kept_counts = n_tokens - n_removed
            offsets = np.append(0, np.cumsum(kept_counts)).astype(np.int32)
            lst = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), flat.filter(pa.array(kept))
            )
            cols["text"] = pc.binary_join(lst, " ")
        return pa.table(cols)

    return docs_ds.map_batches(rebuild, batch_format="pyarrow")


def _scrub_via_join(
    docs_ds,
    *,
    n: int,
    min_docs: int,
    keep_first: bool,
    return_text: bool,
    cfg: EngineConfig,
    text_col: str,
    doc_col: str,
    buckets: int = 64,
    dup_ds=None,
):
    """The >broadcast scrub path: no dup-set driver materialization.

    1. occurrence rows ``(g_hi, g_lo, doc_id, pos, first)`` — ``first``
       marks the doc's FIRST occurrence of the gram, decided locally
       (a doc's text is one row), so the keep-first winner rule is
       ``first AND doc_id == win_doc`` with no position shipping.
    2. bucketed ``hash_join`` against the dup-gram Dataset (64-bit
       ``g_hi`` bucket key, exact 128-bit equality re-checked on
       ``g_lo`` after the join — a hi-half collision only costs a
       discarded candidate row).
    3. the removal rows ``(doc_id, pos)`` meet the doc texts in a
       tag-union groupby on ``md5(doc_id) % buckets`` — ONE vectorized
       rebuild per bucket (the ``stages/joins.py`` shape), never a
       per-doc Python call.
    """
    from refimage_ray.stages.joins import hash_join

    def occs(batch: pa.Table) -> pa.Table:
        g_hi, g_lo, parent, starts, flat, tok_parent = _gram_hash_pairs(
            batch[text_col], n, cfg
        )
        if len(g_hi) == 0:
            return pa.table({
                "g_hi": pa.array([], pa.int64()),
                "g_lo": pa.array([], pa.int64()),
                "odoc": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
                "first": pa.array([], pa.bool_()),
            })
        ids = batch[doc_col].to_numpy(zero_copy_only=False).astype(np.int64)
        doc_first = np.searchsorted(
            tok_parent, np.arange(batch.num_rows, dtype=np.int64),
            side="left",
        )
        pos = starts - doc_first[parent]
        # first occurrence per (gram, row): grams arrive in ascending
        # flat order, so after a stable sort by (gram, row) the first
        # of each run is the doc's first occurrence
        o = np.lexsort((starts, parent, g_lo, g_hi))
        fs = np.ones(len(o), dtype=bool)
        fs[1:] = (
            (g_hi[o][1:] != g_hi[o][:-1])
            | (g_lo[o][1:] != g_lo[o][:-1])
            | (parent[o][1:] != parent[o][:-1])
        )
        first = np.zeros(len(o), dtype=bool)
        first[o] = fs
        return pa.table({
            "g_hi": pa.array(g_hi.view(np.int64), pa.int64()),
            "g_lo": pa.array(g_lo.view(np.int64), pa.int64()),
            "odoc": pa.array(ids[parent], pa.int64()),
            "pos": pa.array(pos, pa.int64()),
            "first": pa.array(first, pa.bool_()),
        })

    if dup_ds is None:
        dup_ds = duplicated_grams(
            docs_ds, n=n, min_docs=min_docs, cfg=cfg,
            text_col=text_col, doc_col=doc_col, agg_buckets=buckets,
        )
    dup_ds = dup_ds.map_batches(
        lambda t: pa.table({
            "g_hi": t["g_hi"],
            "g_lo2": t["g_lo"],
            "win_doc": t["win_doc"],
        }),
        batch_format="pyarrow",
    )
    joined = hash_join(
        docs_ds.map_batches(occs, batch_format="pyarrow"),
        dup_ds,
        left_on="g_hi", right_on="g_hi",
        left_cols=["g_hi", "g_lo", "odoc", "pos", "first"],
        right_cols=["g_hi", "g_lo2", "win_doc"],
        buckets=buckets,
    )

    def to_removals(t: pa.Table) -> pa.Table:
        m = pc.equal(t["g_lo"], t["g_lo2"])  # exact 128-bit confirm
        t = t.filter(m)
        if keep_first:
            survivor = pc.and_(
                t["first"], pc.equal(t["odoc"], t["win_doc"])
            )
            t = t.filter(pc.invert(survivor))
        return pa.table({"rdoc": t["odoc"], "pos": t["pos"]})

    removals = joined.map_batches(to_removals, batch_format="pyarrow")

    # content-keyed doc bucket: the shared splitmix64 helper (ONE
    # definition with stages/lines.py's tag-union path), independent
    # of the gram-join bucketing and of block layout
    from refimage_ray.functions.arrays import splitmix64_bucket

    def tag_docs(b: pa.Table) -> pa.Table:
        ids = b[doc_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "__b": pa.array(splitmix64_bucket(ids, buckets), pa.int64()),
            "side": pa.array(np.zeros(len(ids), np.int8), pa.int8()),
            "doc_id": pa.array(ids, pa.int64()),
            "text": pc.cast(b[text_col], pa.string()),
            "pos": pa.array(np.full(len(ids), -1, np.int64), pa.int64()),
        })

    def tag_removals(b: pa.Table) -> pa.Table:
        ids = b["rdoc"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "__b": pa.array(splitmix64_bucket(ids, buckets), pa.int64()),
            "side": pa.array(np.ones(len(ids), np.int8), pa.int8()),
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.nulls(len(ids), pa.string()),
            "pos": pc.cast(b["pos"], pa.int64()),
        })

    both = docs_ds.map_batches(tag_docs, batch_format="pyarrow").union(
        removals.map_batches(tag_removals, batch_format="pyarrow")
    )

    def rebuild_bucket(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        docs = g.filter(pa.array(side == 0))
        rem = g.filter(pa.array(side == 1))
        order = pc.sort_indices(docs["doc_id"])
        docs = docs.take(order)
        ids = docs["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, tok_parent = _flat_tokens(docs["text"], cfg)
        tok_parent = np.asarray(tok_parent, dtype=np.int64)
        n_rows = docs.num_rows
        n_tokens = np.bincount(tok_parent, minlength=n_rows).astype(np.int64)
        covered = np.zeros(len(flat), dtype=bool)
        if rem.num_rows:
            rdoc = rem["doc_id"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            rpos = rem["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
            row = np.searchsorted(ids, rdoc)
            doc_first = np.searchsorted(
                tok_parent, np.arange(n_rows, dtype=np.int64), side="left"
            )
            hit = doc_first[row] + rpos
            for j in range(n):
                covered[hit + j] = True
        kept = ~covered
        n_removed = n_tokens - np.bincount(
            tok_parent[kept], minlength=n_rows
        ).astype(np.int64)
        cols = {
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_removed": pa.array(n_removed, pa.int64()),
        }
        if return_text:
            from refimage_ray.functions.arrays import (
                cast_large_string_chunked,
            )

            kept_counts = n_tokens - n_removed
            # int64 offsets: a bucket holds ~1/buckets of the corpus,
            # so int32 list offsets would overflow at the very scale
            # this path exists for; the final string column casts back
            # in row-boundary chunks for the same reason
            offsets = np.append(0, np.cumsum(kept_counts)).astype(np.int64)
            lst = pa.LargeListArray.from_arrays(
                pa.array(offsets, pa.int64()),
                pc.cast(flat.filter(pa.array(kept)), pa.large_string()),
            )
            cols["text"] = cast_large_string_chunked(
                pc.binary_join(lst, pa.scalar(" ", pa.large_string()))
            )
        return pa.table(cols)

    return (
        both.groupby("__b")
        .map_groups(rebuild_bucket, batch_format="pyarrow")
    )
