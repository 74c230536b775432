"""BM25F — multi-field weighted ranking (title/body style).

Zaragoza, Craswell, Taylor, Saria & Robertson, *Microsoft Cambridge at
TREC-13* / "Simple BM25 extension to multiple weighted fields" (CIKM
2004): instead of scoring fields separately and mixing scores (which
double-counts the tf saturation), BM25F sums **length-normalized term
frequencies across fields first**, then saturates once:

    wtf(d, t) = Σ_f  w_f · tf_{f,d,t} / (1 − b + b · dl_f(d)/avgdl_f)
    score(d)  = Σ_t  idf(t) · wtf(d, t) / (k1 + wtf(d, t))

Each field is its own index artifact over the same doc_id space (the
engine's federated-artifact machinery: fields are built/merged/
compacted independently, exactly like Lucene per-field inverted
lists).  idf comes from the designated ``idf_field`` (the body field)
— the common convention, documented rather than hidden.

The per-term work is fully vectorized: per field a posting-aligned
contribution array, a factorize+bincount union across fields, one
saturation pass — the same machinery class as ``search_weighted``.

Reference analog: none (the reference scores one CLIP space); this is
the search-engine-parity extension of §2.8 F1.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from refimage_ray.query.scorer import idf as _idf
from refimage_ray.query.scorer import query_terms, topk_select


def bm25f_search(
    fields: "dict[str, tuple]",
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    idf_field: str | None = None,
    threshold: float = float("-inf"),
) -> list[tuple[int, float]]:
    """Exact BM25F top-k.

    ``fields``: ``{name: (searcher, weight)}`` — each searcher serves
    one field's artifact (same doc_id space).  ``idf_field`` names the
    field whose df/N define idf (default: the first field
    alphabetically — pass the body field explicitly in practice).
    Every field's searcher must hold per-posting doc lengths (``dls``
    — standard artifacts persist them).
    """
    if not fields:
        raise ValueError("bm25f_search needs at least one field")
    names = sorted(fields)
    idf_field = names[0] if idf_field is None else idf_field
    if idf_field not in fields:
        raise ValueError(f"idf_field {idf_field!r} not in fields")
    idf_s = fields[idf_field][0]
    terms = query_terms(idf_s._tokenize(query))
    if not terms:
        return []
    maps = {f: fields[f][0]._term_map(terms) for f in names}
    out_ids: list[np.ndarray] = []
    out_scores: list[np.ndarray] = []
    acc_ids: np.ndarray | None = None
    acc_sc: np.ndarray | None = None
    for t in terms:  # ascending unique → canonical float sums
        pb = maps[idf_field].get(t)
        if pb is None or pb.df == 0:
            continue  # idf-field df defines term existence (documented)
        part_ids, part_wtf = [], []
        for f in names:
            p = maps[f].get(t)
            if p is None or p.df == 0:
                continue
            if p.dls is None:
                raise ValueError(
                    f"field {f!r} artifact lacks per-posting doc lengths"
                )
            s, w = fields[f]
            norm = 1.0 - b + b * (
                p.dls.astype(np.float64) / s.avgdl
            )
            part_ids.append(p.doc_ids)
            part_wtf.append(w * p.tfs.astype(np.float64) / norm)
        if not part_ids:
            continue
        codes, uniq = pd.factorize(np.concatenate(part_ids), sort=True)
        wtf = np.bincount(codes, weights=np.concatenate(part_wtf))
        sc = _idf(pb.df, idf_s.n_docs) * wtf / (k1 + wtf)
        # accumulate into the running (sorted-unique ids, scores) pair
        if acc_ids is None:
            acc_ids, acc_sc = uniq.astype(np.int64), sc
        else:
            codes2, uniq2 = pd.factorize(
                np.concatenate([acc_ids, uniq.astype(np.int64)]), sort=True
            )
            acc_sc = np.bincount(
                codes2, weights=np.concatenate([acc_sc, sc])
            )
            acc_ids = uniq2.astype(np.int64)
    if acc_ids is None:
        return []
    ids, sc = topk_select(acc_ids, acc_sc, k, threshold)
    return [(int(d), float(s)) for d, s in zip(ids, sc)]
