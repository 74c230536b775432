"""Flagship pipeline: full build + query over a pages corpus.

The end-to-end capability graph of SURVEY.md §3.1/§3.2 in one call:
pages parquet → stateful extract (byte-identical) → exact dedup →
deterministic doc ids → sharded/salted index build → BM25 top-k →
metadata join.  Used by ``__ray_entry__.entry()`` (sf0.001) and by
``bench.py`` at larger scales.
"""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pyarrow as pa

import ray.data as rd

from refimage_ray.config import EngineConfig
from refimage_ray.index.build import BuildResult, build_index
from refimage_ray.index.manifest import load_manifest
from refimage_ray.query.engine import LocalSearcher, lookup_docs
from refimage_ray.sources.pages import pages_from_documents, write_pages
from refimage_ray.stages.dedup import add_content_hash
from refimage_ray.stages.docids import add_url_hash_ids
from refimage_ray.stages.extract import ExtractText, extract_text_batch

FLAGSHIP_QUERIES = [
    "spark join query",
    "merge sort table",
    "window stream batch",
    "fast data scan",
    "the slow group",
]

# per-worker-process LangId cache for the task-pool curation gate —
# its state is a few word lists, so the extract_text_batch pattern
# (module global, zero actor ramp, scheduler-sized parallelism)
# applies; an actor pool here was measured as a concurrency=4 cap
# throttling the whole streaming build
_GATE_LANGID = None


def curation_gate_batch(
    batch: pa.Table, min_tokens: int, min_stop: float, lang: str
) -> pa.Table:
    """Quality + lang-ID curation gate over one extracted batch:
    failures are dropped IN-FLIGHT, before any text is staged or
    shuffled — at 100 TB curation must not add a corpus pass.
    (Exact dedup still runs as the in-build side pass, exactly as in
    ``pipelines/curate.py``.)"""
    import pyarrow.compute as pc

    from refimage_ray.stages.analysis import LangId, quality_batch

    global _GATE_LANGID
    if _GATE_LANGID is None:
        _GATE_LANGID = LangId()
    # the analysis stages key their outputs by doc_id; attach a
    # transient row index when the batch doesn't carry ids yet (the
    # pages path gates BEFORE doc-id assignment)
    tmp = batch
    if "doc_id" not in batch.column_names:
        tmp = batch.append_column(
            "doc_id", pa.array(range(batch.num_rows), pa.int64())
        )
    q = quality_batch(tmp)
    keep = pc.and_(
        pc.and_(
            pc.greater_equal(q["n_tokens"], min_tokens),
            pc.greater_equal(q["stopword_ratio"], min_stop),
        ),
        pc.equal(_GATE_LANGID(tmp)["pred_lang"], lang),
    )
    return batch.filter(keep)


def apply_curation_gate(ds: "rd.Dataset", curate: dict) -> "rd.Dataset":
    """Attach the in-flight curation gate to a docs/extracted Dataset
    (task-pool ``map_batches``; works on any table with a text column,
    with or without doc ids)."""
    min_tokens = int(curate.get("min_tokens", 30))
    min_stop = float(curate.get("min_stopword_ratio", 0.04))
    lang = str(curate.get("lang", "en"))
    return ds.map_batches(
        lambda b: curation_gate_batch(b, min_tokens, min_stop, lang),
        batch_format="pyarrow",
    )


def build_from_pages(
    pages_dir: str,
    index_dir: str,
    cfg: EngineConfig,
    *,
    extract_concurrency: int | tuple | None = None,
    resume: bool = True,
    curate: dict | None = None,
    source: str = "parquet",
) -> BuildResult:
    """pages parquet dir → full index artifact.

    ``extract_concurrency=None`` (default) runs extraction as a
    TASK-pool ``map_batches`` with per-worker-process cached state
    (``extract_text_batch``): the extractor's state is three compiled
    regexes, so actor-pool startup ramp is pure overhead on a short
    stage, and the task scheduler sizes parallelism to free CPUs.
    Pass an int or (min, max) tuple to get the actor-pool flavor
    instead — the pattern to use when per-worker state is genuinely
    expensive.  (A FIXED pool equal to the cluster's CPU count
    deadlocks the streaming executor — the actors reserve every CPU
    and the read/write stages starve — hence (min, max) there.)
    """
    docs = docs_from_pages(
        pages_dir, extract_concurrency=extract_concurrency,
        curate=curate, source=source,
    )
    exts = (".parquet",) if source == "parquet" else (".warc", ".warc.gz")
    lineage = [
        {"path": os.path.join(pages_dir, f)}
        for f in sorted(os.listdir(pages_dir))
        if f.endswith(exts)
    ]
    return build_index(
        docs, index_dir, cfg, lineage=lineage, resume=resume, dedup_exact=True
    )


def docs_from_pages(
    pages_dir: str,
    *,
    extract_concurrency: int | tuple | None = None,
    curate: dict | None = None,
    source: str = "parquet",
) -> "rd.Dataset":
    """pages container → docs Dataset (extract → optional in-flight
    curation gates → content hash + pure-function doc ids) — the
    pre-index half of :func:`build_from_pages`, reusable by the
    sub-range job path (``scripts/build_job.py --subranges``)."""
    if source == "parquet":
        pages = rd.read_parquet(
            pages_dir, columns=["url", "warc_ts", "html", "lang"]
        )
    elif source == "warc":
        # Common-Crawl container ingest: same downstream stages, the
        # pages arrive as WARC/1.0 response records (sources/warc.py)
        from refimage_ray.sources.warc import read_warc

        pages = read_warc(pages_dir)
    else:
        raise ValueError(f"unknown pages source {source!r}")
    if extract_concurrency is None:
        extracted = pages.map_batches(
            extract_text_batch, batch_format="pyarrow", batch_size=256
        )
    else:
        extracted = pages.map_batches(
            ExtractText,
            batch_format="pyarrow",
            concurrency=extract_concurrency,
            batch_size=256,
        )
    if curate is not None:
        extracted = apply_curation_gate(extracted, curate)
    # pure-function doc ids + content hash in-flight; exact dedup runs
    # as a small-column side pass inside build_index (no corpus shuffle)
    return extracted.map_batches(
        lambda b: add_url_hash_ids(add_content_hash(b)), batch_format="pyarrow"
    )


def prepare_pages_from_documents(sf_dir: str, out_dir: str) -> str:
    """Materialize a pages corpus wrapping the driver's documents table
    (deterministic; cached)."""
    marker = os.path.join(out_dir, "_SUCCESS")
    if not os.path.exists(marker):
        shutil.rmtree(out_dir, ignore_errors=True)
        table = pages_from_documents(os.path.join(sf_dir, "documents.parquet"))
        write_pages(table, out_dir, rows_per_file=8192)
        with open(marker, "w") as f:
            f.write("")
    return out_dir


def flagship(sf_dir: str = "/root/testdata/sf0.001", k: int = 10) -> pd.DataFrame:
    """Build (cached) + run the fixture queries; returns the joined
    top-k result frame (query, rank, doc_id, score, url, lang)."""
    import hashlib

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = f"/tmp/refimage_ray_cache/flagship-{tag}"
    pages_dir = prepare_pages_from_documents(sf_dir, os.path.join(root, "pages"))
    index_dir = os.path.join(root, "index")
    cfg = EngineConfig(num_shards=16, salt_buckets=4)
    if load_manifest(index_dir) is None:
        build_from_pages(pages_dir, index_dir, cfg)
    searcher = LocalSearcher(index_dir)
    frames = []
    for q in FLAGSHIP_QUERIES:
        hits = searcher.search(q, k=k, mode="or")
        if not hits:
            continue
        meta = lookup_docs(index_dir, [d for d, _ in hits],
                           columns=["doc_id", "url", "lang"]).to_pandas()
        df = pd.DataFrame(
            {
                "query": q,
                "rank": range(1, len(hits) + 1),
                "doc_id": [d for d, _ in hits],
                "score": [s for _, s in hits],
            }
        ).merge(meta, on="doc_id", how="left")
        frames.append(df)
    return pd.concat(frames, ignore_index=True)
