"""Corpus curation — the composed training-data prep flow.

One Dataset chain fuses the quality-signal, language-ID, and
content-hash stages, filters by deterministic curation thresholds, and
exact-dedups the survivors — the canonical pre-indexing pipeline of a
web-scale training-data build (quality gate → language gate → dedup),
here as a single streaming pass + one narrow groupby.

Scale shape: the fused stage emits ~40 B/row of numerics (no text
leaves the stage), so the dedup groupby shuffles keys, not the corpus —
the same side-channel philosophy as ``index/build``'s loser scan.

Reference analog: ingest-time validation + hashing before storage
(``/root/reference/src/refimage/storage.py:130-202``), composed with
the derived-feature stages this engine adds for LLM-corpus prep.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from refimage_ray.config import DEFAULT_CONFIG
from refimage_ray.stages.analysis import LangId, quality_batch
from refimage_ray.stages.dedup import add_content_hash


class CurationStage:
    """Actor-pool stage: quality signals + lang-ID + content keys in one
    pass over each batch (state — the LangId profiles — built once per
    actor in ``__init__``)."""

    def __init__(self) -> None:
        self.langid = LangId()

    def __call__(self, batch: pa.Table) -> pa.Table:
        q = quality_batch(batch, DEFAULT_CONFIG)
        l = self.langid(batch)
        h = add_content_hash(batch)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": q["n_tokens"],
                "stopword_ratio": q["stopword_ratio"],
                "pred_lang": l["pred_lang"],
                # int64 reinterpret of the uint64 halves (same bits) so
                # the downstream groupby key is a native Arrow int type
                "content_key": pc.cast(
                    h["content_key"], pa.int64(), safe=False
                ),
                "content_key2": pc.cast(
                    h["content_key2"], pa.int64(), safe=False
                ),
            }
        )


def curated_doc_ids(
    docs_ds: "ray.data.Dataset",
    *,
    min_tokens: int = 30,
    min_stopword_ratio: float = 0.04,
    lang: str = "en",
) -> pa.Table:
    """doc_ids surviving the curation gates, exact-deduped (keeper =
    min doc_id per full-128-bit content hash), sorted ascending.

    Gates are deterministic and SQL-mirrored (the driver oracle):
    ``n_tokens >= min_tokens``, ``stopword_ratio >= min_stopword_ratio``
    (inclusive), ``pred_lang == lang``.
    """
    import numpy as np
    from ray.data.aggregate import Min

    from refimage_ray.stages.dedup_near import collect_small

    feats = docs_ds.map_batches(
        CurationStage, batch_format="pyarrow", concurrency=(1, 4)
    )

    def gate(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(batch["n_tokens"], min_tokens),
                pc.greater_equal(batch["stopword_ratio"], min_stopword_ratio),
            ),
            pc.equal(batch["pred_lang"], lang),
        )
        return batch.filter(keep).select(
            ["content_key", "content_key2", "doc_id"]
        )

    keepers = (
        feats.map_batches(gate, batch_format="pyarrow")
        .groupby(["content_key", "content_key2"])
        .aggregate(Min("doc_id", alias_name="doc_id"))
    )
    out = collect_small(
        keepers,
        pa.schema(
            [
                ("content_key", pa.int64()),
                ("content_key2", pa.int64()),
                ("doc_id", pa.int64()),
            ]
        ),
    )
    ids = np.sort(out["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64))
    return pa.table({"doc_id": pa.array(ids, pa.int64())})


def curated_docs(sf_dir: str) -> pa.Table:
    """queries() entry: curated keeper doc_ids over the documents table
    (thresholds documented in :func:`curated_doc_ids`; SQL-mirrored)."""
    from refimage_ray.pipelines.corpus import _docs

    return curated_doc_ids(_docs(sf_dir))


# ---------------------------------------------------------------------------
# line/segment-level dedup (CCNet boilerplate removal) — contract queries
# ---------------------------------------------------------------------------

def line_dup_stats(sf_dir: str) -> pa.Table:
    """Global segment-duplication summary over fixed 20-word windows
    (the deterministic pseudo-paragraphs the SQL oracle mirrors):
    total/distinct segments and how many occurrences / distinct values
    are globally duplicated (CCNet-style boilerplate candidates)."""
    from ray.data.aggregate import Count, Sum

    from refimage_ray.pipelines.corpus import _docs
    from refimage_ray.stages.lines import duplicated_segments

    seg_counts = duplicated_segments(_docs(sf_dir), seg_words=20, min_count=1)

    def tag(b: pa.Table) -> pa.Table:
        n = b["n"]
        dup = pc.greater_equal(n, 2)
        return pa.table(
            {
                "n": n,
                "dup_n": pc.if_else(dup, n, pa.scalar(0, pa.int64())),
                "is_dup": pc.cast(dup, pa.int64()),
            }
        )

    agg = seg_counts.map_batches(tag, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="total_segments"),
        Count(alias_name="distinct_segments"),
        Sum("dup_n", alias_name="dup_segments"),
        Sum("is_dup", alias_name="distinct_dup_segments"),
    )
    names = (
        "total_segments distinct_segments dup_segments distinct_dup_segments"
    ).split()
    return pa.table({k: pa.array([int(agg[k])], pa.int64()) for k in names})


def line_dedup_docs(sf_dir: str):
    """Per-doc boilerplate-removal stats, drop_all mode: every
    occurrence of a globally-duplicated 20-word window is stripped."""
    from refimage_ray.pipelines.corpus import _docs
    from refimage_ray.stages.lines import line_dedup

    return line_dedup(
        _docs(sf_dir), seg_words=20, min_count=2, mode="drop_all"
    )


def line_dedup_keep_first(sf_dir: str):
    """Per-doc dedup stats, keep_first mode (MassiveText "all but
    one"): the globally (doc_id, seg_idx)-smallest occurrence of each
    duplicated window survives."""
    from refimage_ray.pipelines.corpus import _docs
    from refimage_ray.stages.lines import line_dedup

    return line_dedup(
        _docs(sf_dir), seg_words=20, min_count=2, mode="keep_first"
    )
