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
   lexsorted, and ``ray.put`` once; at 100-TB scale with a
   larger-than-broadcast dup set, swap the probe for the bucketed
   ``stages/joins.hash_join`` of gram rows against the dup table (the
   ``dup_span_stats`` shape) — semantics identical.
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
                "doc_id": pa.array([], pa.int64()),
            })
        ids = batch[doc_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # per-doc-unique gram rows (one text row per doc → per-batch
        # unique == globally per-doc unique) shrink the exchange to
        # distinct (gram, doc) pairs — the term-df pre-agg discipline
        df = pd.DataFrame({
            "g_hi": g_hi.view(np.int64), "g_lo": g_lo.view(np.int64),
            "doc_id": ids[parent],
        }).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    from ray.data.aggregate import Count, Min

    agg = (
        docs_ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["g_hi", "g_lo"])
        .aggregate(Count(alias_name="nd"), Min("doc_id", alias_name="win_doc"))
    )
    return agg.map_batches(
        lambda t: t.filter(pc.greater_equal(t["nd"], min_docs)),
        batch_format="pyarrow",
    )


def scrub_dup_spans(
    docs_ds,
    *,
    n: int = 3,
    min_docs: int = 2,
    mode: str = "drop_all",
    return_text: bool = True,
    cfg: EngineConfig = DEFAULT_CONFIG,
    text_col: str = "text",
    doc_col: str = "doc_id",
):
    """Rewrite every doc with duplicated-gram-covered token spans
    removed; Dataset of ``(doc_id, n_tokens, n_removed[, text])``.

    ``mode="drop_all"`` removes every occurrence (the aggressive
    ExactSubstr variant); ``mode="keep_first"`` keeps the globally
    first occurrence of each duplicated gram (smallest ``(doc_id,
    pos)``) and removes the rest."""
    import ray

    if mode not in ("drop_all", "keep_first"):
        raise ValueError(
            f"mode must be 'drop_all' or 'keep_first', got {mode!r}"
        )
    dup = duplicated_grams(
        docs_ds, n=n, min_docs=min_docs, cfg=cfg,
        text_col=text_col, doc_col=doc_col,
    ).to_pandas()
    if "g_hi" not in dup.columns:
        # Ray quirk: to_pandas() of a fully-empty Dataset loses the
        # schema (zero-column frame)
        dup = pd.DataFrame({
            c: pd.Series([], dtype="int64")
            for c in ("g_hi", "g_lo", "nd", "win_doc")
        })
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
