"""Corpus-analysis pipelines over ``{sf_dir}/documents.parquet``.

Every function: ``sf_dir -> Dataset | pyarrow.Table`` (the
``queries()`` contract).  All heavy lifting is distributed Ray Data;
only final (small) results are collected.  Aggregations follow the
partial-then-final pattern: vectorized per-batch combiners inside
``map_batches`` shrink the shuffle input to ~vocab-size rows before
the ``groupby`` (SURVEY.md §2.5 A5).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Sum

from refimage_ray.config import DEFAULT_CONFIG
from refimage_ray.stages.analysis import LangId, fingerprint_batch, quality_batch
from refimage_ray.stages.dedup import add_content_hash
from refimage_ray.stages.dedup_near import minhash_near_dup_pairs, simhash_batch
from refimage_ray.stages.tokenize import doc_lengths, tokenize_batch


def _docs(sf_dir: str, columns=("doc_id", "text")) -> "rd.Dataset":
    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=list(columns)
    )


def corpus_stats(sf_dir: str) -> pa.Table:
    """Global N / total tokens / avgdl (reference analog: storage stats
    rollup, /root/reference/src/refimage/storage.py:714-745)."""

    def stats(batch: pa.Table) -> pa.Table:
        dl = doc_lengths(batch["text"])
        return pa.table({"doc_len": pa.array(dl.astype(np.int64), pa.int64())})

    agg = _docs(sf_dir).map_batches(stats, batch_format="pyarrow").aggregate(
        Count(alias_name="n_docs"), Sum("doc_len", alias_name="total_tokens")
    )
    n, tot = int(agg["n_docs"]), int(agg["total_tokens"])
    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            "total_tokens": pa.array([tot], pa.int64()),
            "avgdl": pa.array([round(tot / n, 6)], pa.float64()),
        }
    )


def doc_stats(sf_dir: str) -> "rd.Dataset":
    """Per-doc token/char counts (stays distributed; driver collects)."""
    return _docs(sf_dir).map_batches(_doc_stats_batch, batch_format="pyarrow")


def _doc_stats_batch(batch: pa.Table) -> pa.Table:
    dl = doc_lengths(batch["text"])
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "doc_len": pa.array(dl.astype(np.int64), pa.int64()),
            "text_len": pc.cast(pc.utf8_length(batch["text"]), pa.int64()),
        }
    )


def _doc_ids_from_urls(batch: pa.Table) -> pa.Array:
    """Recover the documents.doc_id from the deterministic page url
    (``…/doc-<id>``) — vectorized regex extract, no Python loop."""
    ext = pc.extract_regex(batch["url"], pattern=r"doc-(?P<id>\d+)$")
    return pc.cast(pc.struct_field(ext, "id"), pa.int64())


def _cached_container(sf_dir: str, kind: str) -> str:
    """Materialize the documents table into an alternate container
    format once per (sf_dir, kind) — deterministic, _SUCCESS-marked."""
    import hashlib
    import shutil

    from refimage_ray.sources.pages import pages_from_documents

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    out = f"/tmp/refimage_ray_cache/{kind}-{tag}"
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        shutil.rmtree(out, ignore_errors=True)
        pages = pages_from_documents(os.path.join(sf_dir, "documents.parquet"))
        if kind == "warc":
            from refimage_ray.sources.warc import write_warc

            write_warc(pages, out, records_per_file=2048)
        else:
            from refimage_ray.sources.jsonl import write_jsonl

            write_jsonl(pages, out, rows_per_file=2048)
        with open(marker, "w") as f:
            f.write("")
    return out


def warc_doc_stats(sf_dir: str) -> "rd.Dataset":
    """Per-doc stats over a corpus ingested from WARC files.

    The corpus is the documents table serialized into WARC/1.0
    response records (``sources/warc.py``), read back distributed,
    html-extracted, and keyed by the doc_id recovered from the url —
    the oracle is the SAME SQL as ``doc_stats`` over the Parquet
    table, so a hash match proves the WARC container round-trips
    byte-faithfully through the whole ingest path.
    """
    from refimage_ray.sources.warc import read_warc
    from refimage_ray.stages.extract import extract_text_batch

    warc_dir = _cached_container(sf_dir, "warc")

    def stats(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {"doc_id": _doc_ids_from_urls(batch), "text": batch["text"]}
        )
        return _doc_stats_batch(t)

    return (
        read_warc(warc_dir)
        .map_batches(extract_text_batch, batch_format="pyarrow")
        .map_batches(stats, batch_format="pyarrow")
    )


def jsonl_doc_stats(sf_dir: str) -> "rd.Dataset":
    """Per-doc stats over the same corpus ingested from JSONL (WET-
    style, text already extracted) — oracle: the ``doc_stats`` SQL."""
    from refimage_ray.sources.jsonl import read_jsonl

    jsonl_dir = _cached_container(sf_dir, "jsonl")

    def stats(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {"doc_id": _doc_ids_from_urls(batch), "text": batch["text"]}
        )
        return _doc_stats_batch(t)

    return read_jsonl(jsonl_dir).map_batches(stats, batch_format="pyarrow")


def contamination_stats(
    sf_dir: str, n: int = 8, modulus: int = 97
) -> "rd.Dataset":
    """Benchmark decontamination: (doc_id, n_hit_grams) for every doc
    sharing ≥1 token ``n``-gram with the benchmark set.

    The benchmark is a deterministic corpus slice (``doc_id % modulus
    == 0`` — the stand-in for an eval set); it is tokenized ONCE,
    hashed, and broadcast via ``ray.put`` (eval sets are tiny, so the
    probe is a broadcast semi-join — no shuffle at any scale).  The
    corpus side streams: vectorized rolling-hash n-grams per batch +
    sorted binary-search probe (``stages/decontam.py``).
    """
    import ray

    from refimage_ray.stages.decontam import (
        benchmark_gram_set,
        contamination_counts,
    )

    def bench_filter(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(ids % modulus == 0))

    bench = pa.concat_tables(
        _docs(sf_dir)
        .map_batches(bench_filter, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )
    gram_ref = ray.put(benchmark_gram_set(bench["text"], n))

    def probe(batch: pa.Table) -> pa.Table:
        grams = ray.get(gram_ref)
        return contamination_counts(batch, grams, n)

    return _docs(sf_dir).map_batches(probe, batch_format="pyarrow")


def doc_len_quantiles(
    sf_dir: str, ps: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99)
) -> pa.Table:
    """EXACT corpus quantiles of doc token length — the bounded-int
    histogram shape: per-batch ``bincount`` partials → one
    histogram-sized groupby (|distinct lengths| rows, NOT |docs|) →
    driver cumsum picks the quantile values.  No sort, no sampling,
    no t-digest approximation; works at any corpus size because the
    exchange is bounded by the value domain.  Discrete-quantile rule
    matches DuckDB ``quantile_disc``: ``sorted[ceil(p·n) - 1]``."""

    def hist(batch: pa.Table) -> pa.Table:
        dl = doc_lengths(batch["text"]).astype(np.int64)
        counts = np.bincount(dl)
        # flatnonzero keys on the COUNT, so index 0 (zero-length docs)
        # is already included whenever counts[0] > 0
        lens = np.flatnonzero(counts)
        return pa.table(
            {
                "doc_len": pa.array(lens, pa.int64()),
                "cnt": pa.array(counts[lens], pa.int64()),
            }
        )

    rows = (
        _docs(sf_dir)
        .map_batches(hist, batch_format="pyarrow")
        .groupby("doc_len")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .take_all()
    )
    rows.sort(key=lambda r: r["doc_len"])
    lens = np.array([r["doc_len"] for r in rows], np.int64)
    cum = np.cumsum([r["cnt"] for r in rows])
    n = int(cum[-1]) if len(cum) else 0
    out_p, out_v = [], []
    if n:  # empty corpus: no quantiles (rather than lens[0] IndexError)
        for p in ps:
            k = max(1, int(np.ceil(p * n)))
            out_p.append(float(p))
            out_v.append(int(lens[np.searchsorted(cum, k)]))
    return pa.table(
        {
            "p": pa.array(out_p, pa.float64()),
            "doc_len": pa.array(out_v, pa.int64()),
        }
    )


def dup_span_stats(sf_dir: str, n: int = 3) -> "rd.Dataset":
    """Exact-substring duplication signal (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): for
    each doc, how many of its token ``n``-gram positions carry a gram
    that also appears in at least one OTHER doc.

    Unlike decontamination (small broadcast side), BOTH sides are the
    full corpus, so the dataflow is the large-large shape: per-batch
    vectorized rolling-hash grams → (gram, doc) pairs with per-doc
    position counts (combiner) → gram-df groupby (narrow: one row per
    distinct gram) → df≥2 grams semi-joined back to the pairs with the
    bucketed ``hash_join`` (no broadcast: at 100 TB the duplicated-gram
    set is itself huge) → per-doc sum.  Default ``n=3`` keeps the
    signal non-empty on the synthetic corpus; production spans use
    n≈50 tokens.
    """
    from ray.data.aggregate import Count as _Count

    from refimage_ray.stages.decontam import _ngram_hashes
    from refimage_ray.stages.joins import hash_join

    def pairs(batch: pa.Table) -> pa.Table:
        grams, parent = _ngram_hashes(batch["text"], n, DEFAULT_CONFIG)
        if len(grams) == 0:
            return pa.table(
                {
                    "gram": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = (
            pa.table(
                {
                    # int64 view of the uint64 hash (Arrow groupby + join
                    # keys stay one physical type everywhere)
                    "gram": pa.array(grams.view(np.int64), pa.int64()),
                    "doc_id": pa.array(ids[parent], pa.int64()),
                }
            )
            .group_by(["gram", "doc_id"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "gram": g["gram"],
                "doc_id": g["doc_id"],
                "cnt": pc.cast(g["count_all"], pa.int64()),
            }
        )

    # consumed twice (gram-df groupby, then the join's left side) but
    # NOT materialized: the pairs table is token-scale (~|corpus
    # tokens| rows) — re-running the vectorized gram pass beats
    # pinning it in the object store at 100 TB
    pair_ds = _docs(sf_dir).map_batches(pairs, batch_format="pyarrow")

    def dup_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["nd"], 2)).select(["gram"])

    dup_grams = (
        pair_ds.groupby("gram")
        .aggregate(_Count(alias_name="nd"))
        .map_batches(dup_only, batch_format="pyarrow")
    )
    joined = hash_join(
        pair_ds, dup_grams,
        left_on="gram", right_on="gram",
        left_cols=["gram", "doc_id", "cnt"], right_cols=["gram"],
        buckets=16,
    )
    return (
        joined.groupby("doc_id")
        .aggregate(Sum("cnt", alias_name="n_dup_positions"))
    )


def scrub_dup_spans_docs(sf_dir: str, n: int = 3) -> "rd.Dataset":
    """Corpus rewritten with duplicated-span coverage removed (Lee et
    al. 2022 ExactSubstr dedup, aggressive drop-all variant): every
    token covered by an ``n``-gram that appears in ≥2 distinct docs is
    excised; ``(doc_id, n_tokens, n_removed, text)`` with the cleaned
    token-space text.  The *rewriting* counterpart of
    :func:`dup_span_stats` (which only counts).  Default ``n=3``
    matches the stats operator; production spans use n≈50."""
    from refimage_ray.stages.spans import scrub_dup_spans

    return scrub_dup_spans(_docs(sf_dir), n=n, mode="drop_all")


def repetition_stats(sf_dir: str) -> "rd.Dataset":
    """Gopher-style per-doc repetition signals: the fraction of tokens
    taken by the single most frequent word / bigram (Rae et al. 2021
    repetition filters — high values mark low-quality repetitive
    pages).  Fully vectorized: one Acero group_by per batch + numpy
    per-doc max/total; rounded at the boundary for the SQL oracle."""
    from refimage_ray.stages.tokenize import _flat_tokens

    def rep(batch: pa.Table) -> pa.Table:
        n_rows = batch.num_rows
        flat, parent = _flat_tokens(batch["text"], DEFAULT_CONFIG)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)

        def top_frac(keys: pa.Array, rows: np.ndarray) -> np.ndarray:
            """max per-row key count / total per-row keys (0.0 when a
            row has no keys)."""
            if len(rows) == 0:
                return np.zeros(n_rows, np.float64)
            g = (
                pa.table({"row": pa.array(rows, pa.int64()), "k": keys})
                .group_by(["row", "k"])
                .aggregate([([], "count_all")])
            )
            gr = g["row"].to_numpy(zero_copy_only=False).astype(np.int64)
            gc = g["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
            tot = np.bincount(gr, weights=gc, minlength=n_rows)
            mx = np.zeros(n_rows, np.int64)
            np.maximum.at(mx, gr, gc)
            with np.errstate(invalid="ignore", divide="ignore"):
                f = np.where(tot > 0, mx / np.maximum(tot, 1), 0.0)
            return f

        word_frac = top_frac(flat, parent)
        # bigrams: adjacent token pairs within one doc (join kernel)
        if len(flat) >= 2:
            big = pc.binary_join_element_wise(
                flat.slice(0, len(flat) - 1), flat.slice(1), " "
            )
            ok = parent[:-1] == parent[1:]
            big = big.filter(pa.array(ok))
            brows = parent[:-1][ok]
        else:
            big, brows = pa.array([], pa.string()), np.zeros(0, np.int64)
        bigram_frac = top_frac(big, brows)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "top_word_frac": pc.round(
                    pa.array(word_frac, pa.float64()), ndigits=6
                ),
                "top_bigram_frac": pc.round(
                    pa.array(bigram_frac, pa.float64()), ndigits=6
                ),
            }
        )

    return _docs(sf_dir).map_batches(rep, batch_format="pyarrow")


def _term_partials(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: (term, df_part, tf_part) — shrinks the
    shuffle to vocab-size rows per batch."""
    toks = tokenize_batch(batch)
    g = (
        toks.select(["term", "tf"])
        .group_by("term")
        .aggregate([("tf", "sum"), ([], "count_all")])
    )
    return pa.table(
        {
            "term": g["term"],
            "df_part": pc.cast(g["count_all"], pa.int64()),
            "tf_part": pc.cast(g["tf_sum"], pa.int64()),
        }
    )


def term_stats(sf_dir: str) -> "rd.Dataset":
    """df + total tf per term (partial agg → tiny groupby)."""
    out = (
        _docs(sf_dir)
        .map_batches(_term_partials, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df_part", alias_name="df"), Sum("tf_part", alias_name="total_tf"))
    )
    return out


def term_df(sf_dir: str) -> "rd.Dataset":
    return term_stats(sf_dir).select_columns(["term", "df"])


def top_terms_per_lang(sf_dir: str, n: int = 5) -> pa.Table:
    """Grouped top-k: the ``n`` highest-df terms within each language.

    Dataflow shape: per-batch (lang, term) df partials (combiner) →
    multi-key groupby sum (the only wide step, vocab×langs rows) →
    per-lang ``map_groups`` top-k.  Ties break (df desc, term asc) on
    both the Ray and SQL sides."""
    ds = _docs(sf_dir, columns=("doc_id", "text", "lang"))

    def partials(batch: pa.Table) -> pa.Table:
        toks = tokenize_batch(batch)
        pos = pc.index_in(toks["doc_id"], value_set=batch["doc_id"])
        lang = batch["lang"].take(pos)
        g = (
            pa.table({"lang": lang, "term": toks["term"]})
            .group_by(["lang", "term"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "lang": g["lang"],
                "term": g["term"],
                "df_part": pc.cast(g["count_all"], pa.int64()),
            }
        )

    def topn(group: pa.Table) -> pa.Table:
        idx = pa.compute.sort_indices(
            group, sort_keys=[("df", "descending"), ("term", "ascending")]
        )
        return group.take(idx[:n])

    out = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["lang", "term"])
        .aggregate(Sum("df_part", alias_name="df"))
        .groupby("lang")
        .map_groups(topn, batch_format="pyarrow")
    )
    t = out.take_all()
    tbl = pa.Table.from_pylist(
        t, schema=pa.schema([("lang", pa.string()), ("term", pa.string()),
                             ("df", pa.int64())])
    )
    idx = pc.sort_indices(
        tbl, sort_keys=[("lang", "ascending"), ("df", "descending"),
                        ("term", "ascending")]
    )
    return tbl.take(idx)


def top_terms(sf_dir: str, n: int = 20) -> pa.Table:
    """Top-n terms by df (ties broken by term asc — both sides)."""
    df = term_stats(sf_dir).select_columns(["term", "df"]).to_pandas()
    df = df.sort_values(["df", "term"], ascending=[False, True], kind="mergesort")
    return pa.Table.from_pandas(df.head(n), preserve_index=False)


def dedup_exact_docs(sf_dir: str, buckets: int = 64) -> "rd.Dataset":
    """Exact-dup groups: keep-first doc_id + group size per distinct
    text (reference: file_hash UNIQUE / 409, storage.py:89).  Bucketed
    shuffle + one vectorized pandas groupby per bucket (not one Python
    call per text group)."""
    from refimage_ray.stages.dedup import _add_bucket

    hashed = _docs(sf_dir).map_batches(
        lambda b: _add_bucket(b, "text", buckets), batch_format="pyarrow"
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("content_hash", sort=False)
            .agg(doc_id=("doc_id", "min"), n_dups=("doc_id", "size"))
            .reset_index(drop=True)
        )
        out["n_dups"] = out["n_dups"].astype("int64")
        return out

    return (
        hashed.select_columns(["doc_id", "content_hash", "dedup_bucket"])
        .groupby("dedup_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def tokenize_postings(sf_dir: str, max_doc: int = 100) -> "rd.Dataset":
    """Raw tokenizer output (doc_id, term, tf) for a doc_id range —
    the direct tokenizer-conformance check (debug surface analog of
    the reference's conversion endpoints, api.py:160-229)."""

    def tok(batch: pa.Table) -> pa.Table:
        keep = pc.less(batch["doc_id"], max_doc)
        sub = batch.filter(keep)
        if sub.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        t = tokenize_batch(sub)
        return pa.table({"doc_id": t["doc_id"], "term": t["term"],
                         "tf": pc.cast(t["tf"], pa.int64())})

    return _docs(sf_dir).map_batches(tok, batch_format="pyarrow")


_PAGE_SORT_COLS = {"doc_id", "n_chars", "lang"}


def list_docs_page(
    sf_dir: str,
    limit: int = 50,
    offset: int = 100,
    sort_by: str = "n_chars",
    sort_order: str = "desc",
) -> pa.Table:
    """ORDER BY + LIMIT/OFFSET pagination with input validation
    (reference: ``list_images(limit, offset, sort_by, sort_order)``
    with whitelist validation, storage.py:353-437).

    OFFSET is applied after a distributed sort + bounded take — fine
    for page-sized offsets; deep pagination at scale should use
    key-range continuation tokens instead (SURVEY.md §7.3 K4 note).
    """
    if sort_by not in _PAGE_SORT_COLS:
        raise ValueError(f"invalid sort_by {sort_by!r}; allowed {_PAGE_SORT_COLS}")
    if sort_order not in ("asc", "desc"):
        raise ValueError(f"invalid sort_order {sort_order!r}")
    if limit < 0 or offset < 0:
        raise ValueError("limit/offset must be non-negative")
    desc = sort_order == "desc"
    keys = [sort_by] if sort_by == "doc_id" else [sort_by, "doc_id"]
    head = (
        _docs(sf_dir, columns=("doc_id", "lang", "n_chars"))
        .sort(keys, descending=[desc] + [False] * (len(keys) - 1))
        .limit(offset + limit)
        .to_pandas()
    )
    return pa.Table.from_pandas(head.iloc[offset:], preserve_index=False)


def lang_counts(sf_dir: str) -> "rd.Dataset":
    return (
        _docs(sf_dir, columns=("doc_id", "lang"))
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"))
    )


def quality_stats(sf_dir: str) -> "rd.Dataset":
    """Per-doc quality signals, rounded at the API boundary for the
    SQL oracle."""

    def q(batch: pa.Table) -> pa.Table:
        t = quality_batch(batch)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
                "n_stopwords": t["n_stopwords"],
                "stopword_ratio": pc.round(t["stopword_ratio"], ndigits=6),
                "mean_token_len": pc.round(t["mean_token_len"], ndigits=6),
            }
        )

    return _docs(sf_dir).map_batches(q, batch_format="pyarrow")


def domain_stats(sf_dir: str) -> "rd.Dataset":
    """Per-domain rollup over page URLs — the first aggregation every
    web-corpus pipeline runs (per-host counts / quality gates / crawl
    budgets).  The documents table carries no url column, so a pages
    view is derived per row (deterministic ``https://{source}.{lang}
    .example.org/doc-{id}`` — same convention as
    ``sources.pages.pages_from_documents``); the host is then parsed
    back OUT of the url string with a vectorized regex, exactly as a
    real pipeline would on crawl urls.  All string work is
    ``pyarrow.compute`` kernels; the groupby ships ≤ |hosts| rows per
    block (Ray's AggregateMap combines per block).

    Reference analog: per-prefix listing/stats of the metadata store
    (``/root/reference/src/refimage/storage.py:353-437``).
    """

    def hostify(b: pa.Table) -> pa.Table:
        url = pc.binary_join_element_wise(
            "https://",
            b["source"],
            ".",
            b["lang"],
            ".example.org/doc-",
            pc.cast(b["doc_id"], pa.string()),
            "",
        )
        host = pc.struct_field(
            pc.extract_regex(url, pattern=r"^https?://(?P<host>[^/]+)/"),
            "host",
        )
        return pa.table({"host": host, "n_chars": b["n_chars"]})

    return (
        _docs(sf_dir, columns=("doc_id", "lang", "source", "n_chars"))
        .map_batches(hostify, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_chars", alias_name="sum_chars"),
            Max("n_chars", alias_name="max_chars"),
        )
    )


def doc_fingerprints(sf_dir: str) -> "rd.Dataset":
    """Rolling-hash document fingerprints.

    SQL-value-oracled: md5-u64 token hashes + the Horner form of the
    polynomial (list_reduce with HUGEINT mod-2^64 arithmetic) reproduce
    the uint64 wraparound exactly in DuckDB."""

    def fp(batch: pa.Table) -> pa.Table:
        t = fingerprint_batch(batch)
        # driver compare dislikes uint64 → present as hex string
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "fingerprint": pc.cast(t["fingerprint"], pa.string()),
            }
        )

    return _docs(sf_dir).map_batches(fp, batch_format="pyarrow")


def langid_pred(sf_dir: str) -> "rd.Dataset":
    """Language-ID heuristic — stateful actor-pool stage (rows-only)."""
    return _docs(sf_dir).map_batches(
        LangId, batch_format="pyarrow", concurrency=2
    ).map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "pred_lang": b["pred_lang"],
                "lang_confidence": pc.round(b["lang_confidence"], ndigits=6),
            }
        ),
        batch_format="pyarrow",
    )


def minhash_near_dups(sf_dir: str, threshold: float = 0.6) -> pa.Table:
    """MinHash+LSH near-dup pairs with distributed exact-Jaccard
    verify (candidates joined back to texts via the bucketed hash
    join; rows-only)."""
    pairs = minhash_near_dup_pairs(_docs(sf_dir), threshold=threshold)
    return pa.table(
        {
            "doc_a": pairs["doc_a"],
            "doc_b": pairs["doc_b"],
            "jaccard": pc.round(pairs["jaccard"], ndigits=6),
        }
    )


def ngram_jaccard_near_dups(sf_dir: str, threshold: float = 0.6) -> pa.Table:
    """Exact n-gram-Jaccard near-dup pairs via shingle-anchor blocking
    (the non-probabilistic sibling of minhash_near_dups; rows-only)."""
    from refimage_ray.stages.dedup_near import ngram_jaccard_near_dup_pairs

    pairs = ngram_jaccard_near_dup_pairs(_docs(sf_dir), threshold=threshold)
    return pa.table(
        {
            "doc_a": pairs["doc_a"],
            "doc_b": pairs["doc_b"],
            "jaccard": pc.round(pairs["jaccard"], ndigits=6),
        }
    )


def simhash_near_dups(sf_dir: str, max_hamming: int = 8) -> pa.Table:
    """SimHash near-dup pairs — distributed 16-bit-chunk banding +
    per-bucket vectorized hamming verify (rows-only)."""
    from refimage_ray.stages.dedup_near import simhash_near_dup_pairs

    return simhash_near_dup_pairs(_docs(sf_dir), max_hamming=max_hamming)


def bigram_counts(sf_dir: str, min_count: int = 5) -> "rd.Dataset":
    """Word-bigram counts across the corpus (n-gram LM corpus prep).

    Vectorized: flat tokens + parent indices → adjacent pairs within
    the same doc → ``binary_join_element_wise`` → per-batch partial
    counts → tiny groupby.  SQL oracle via lateral generate_series.
    """
    from refimage_ray.stages.tokenize import _flat_tokens

    def partial(batch: pa.Table) -> pa.Table:
        flat, parent = _flat_tokens(batch["text"], DEFAULT_CONFIG)
        n = len(flat)
        if n < 2:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n_part": pa.array([], pa.int64())})
        same_doc = parent[:-1] == parent[1:]
        left = flat.slice(0, n - 1).filter(pa.array(same_doc))
        right = flat.slice(1, n - 1).filter(pa.array(same_doc))
        joined = pc.binary_join_element_wise(left, right, " ")
        g = pa.table({"bigram": joined}).group_by("bigram").aggregate(
            [([], "count_all")]
        )
        return pa.table({"bigram": g["bigram"],
                         "n_part": pc.cast(g["count_all"], pa.int64())})

    out = (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n_part", alias_name="n"))
    )
    return out.map_batches(
        lambda b: b.filter(pc.greater_equal(b["n"], min_count)),
        batch_format="pyarrow",
    )


def doc_lexical_stats(sf_dir: str) -> "rd.Dataset":
    """Per-doc vocabulary-richness signals (the classic quality-filter
    trio next to length/stopword heuristics): distinct terms,
    type-token ratio, and hapax count (terms occurring once in the
    doc).  One tokenize pass per batch, one Arrow group_by(doc, term)
    — a document's text is one row, so per-doc stats are exact within
    the batch with NO shuffle."""

    from refimage_ray.stages.tokenize import _flat_tokens

    def stats(b: pa.Table) -> pa.Table:
        flat, parent = _flat_tokens(b["text"], DEFAULT_CONFIG)
        n_rows = b.num_rows
        if len(flat) == 0:
            return pa.table({
                "doc_id": b["doc_id"],
                "n_tokens": pa.array(np.zeros(n_rows, np.int64)),
                "distinct_terms": pa.array(np.zeros(n_rows, np.int64)),
                # null (not NaN values) — same encoding as the masked
                # path below and the oracle's CASE WHEN n_tokens > 0
                "ttr": pa.array([None] * n_rows, pa.float64()),
                "hapax": pa.array(np.zeros(n_rows, np.int64)),
            })
        g = (
            pa.table({"row": pa.array(parent), "term": flat})
            .group_by(["row", "term"]).aggregate([([], "count_all")])
        )
        rows = g["row"].to_numpy(zero_copy_only=False).astype(np.int64)
        tf = g["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_tok = np.bincount(parent, minlength=n_rows).astype(np.int64)
        distinct = np.bincount(rows, minlength=n_rows).astype(np.int64)
        hapax = np.bincount(rows[tf == 1], minlength=n_rows).astype(np.int64)
        with np.errstate(invalid="ignore"):
            ttr = np.where(n_tok > 0,
                           np.round(distinct / np.maximum(n_tok, 1), 6),
                           np.nan)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_tokens": pa.array(n_tok),
            "distinct_terms": pa.array(distinct),
            "ttr": pa.array(ttr, pa.float64(), mask=np.isnan(ttr)),
            "hapax": pa.array(hapax),
        })

    return _docs(sf_dir).map_batches(stats, batch_format="pyarrow")


def dup_rate_by_source(sf_dir: str) -> pa.Table:
    """Exact-duplicate rate per source (crawl-health rollup: which
    feeds ship copies).  Per-batch combiner emits (source, md5-hash)
    partial counts; ONE narrow groupby over (source, hash) then a
    source-sized rollup — the corpus text never shuffles."""
    from ray.data.aggregate import Count, Sum

    from refimage_ray.functions.hashing import md5_string_array

    def keyed(b: pa.Table) -> pa.Table:
        return pa.table({
            "source": b["source"],
            "h": md5_string_array(b["text"]),
        })

    per_hash = (
        _docs(sf_dir, ("source", "text"))
        .map_batches(keyed, batch_format="pyarrow")
        .groupby(["source", "h"])
        .aggregate(Count(alias_name="n"))
    )

    def rollup(b: pa.Table) -> pa.Table:
        return pa.table({
            "source": b["source"],
            "docs": pc.cast(b["n"], pa.int64()),
            "distinct": pa.array(np.ones(b.num_rows, np.int64)),
        })

    agg = (
        per_hash.map_batches(rollup, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("docs", alias_name="n_docs"),
                   Sum("distinct", alias_name="n_distinct"))
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    agg["dup_rate"] = (1.0 - agg["n_distinct"] / agg["n_docs"]).round(6)
    return pa.Table.from_pandas(agg, preserve_index=False)


def zipf_fit(sf_dir: str) -> pa.Table:
    """Zipf-law fit of the term-frequency distribution: least-squares
    slope/intercept/R² of ln(tf) vs ln(rank) (rank by tf desc, term
    asc).  A healthy natural-language corpus slopes ≈ −1; synthetic or
    template-heavy corpora flatten — a one-row corpus-health
    diagnostic on top of `term_stats`' vocab-sized aggregate.  The
    regression runs on the driver over |vocab| rows and is mirrored by
    DuckDB regr_slope/intercept/r2 (same ranking, same logs)."""
    hist = (
        term_stats(sf_dir)
        .select_columns(["term", "total_tf"])
        .to_pandas()
        .sort_values(["total_tf", "term"], ascending=[False, True])
        .reset_index(drop=True)
    )
    y = np.log(hist["total_tf"].to_numpy(np.float64))
    x = np.log(np.arange(1, len(hist) + 1, dtype=np.float64))
    mx, my = x.mean(), y.mean()
    cov = ((x - mx) * (y - my)).sum()
    varx = ((x - mx) ** 2).sum()
    vary = ((y - my) ** 2).sum()
    slope = cov / varx
    return pa.table({
        "n_terms": pa.array([len(hist)], pa.int64()),
        "slope": pa.array([round(float(slope), 6)], pa.float64()),
        "intercept": pa.array([round(float(my - slope * mx), 6)],
                              pa.float64()),
        "r2": pa.array([round(float(cov * cov / (varx * vary)), 6)],
                       pa.float64()),
    })


def doc_perplexity(sf_dir: str, k: float = 1.0) -> "rd.Dataset":
    """CCNet-style LM quality scores: train an add-k bigram LM on the
    corpus (ONE vocab-sized counting exchange), broadcast it once, score
    every document's perplexity vectorized (``stages/lm.py``).  Docs with
    <2 tokens have no transitions and are dropped (mirrored in SQL)."""
    from refimage_ray.stages.lm import score_perplexity, train_bigram_lm

    docs = _docs(sf_dir)
    lm = train_bigram_lm(docs, k=k)
    import pyarrow.compute as _pc

    scored = score_perplexity(docs, lm)
    return scored.map_batches(
        lambda b: b.filter(_pc.is_valid(b["ppl"])), batch_format="pyarrow"
    )


def perplexity_filter_stats(sf_dir: str, max_ppl: float = 120.0) -> pa.Table:
    """Quality-gate rollup: how many docs (and tokens) survive a
    perplexity threshold — the planning query behind choosing a CCNet
    cutoff."""
    import pyarrow.compute as _pc
    from ray.data.aggregate import Count, Sum

    from refimage_ray.stages.lm import perplexity_filter, train_bigram_lm

    docs = _docs(sf_dir)
    lm = train_bigram_lm(docs)
    kept = perplexity_filter(docs, lm, max_ppl)

    def with_len(b: pa.Table) -> pa.Table:
        toks = _pc.count_substring_regex(
            _pc.utf8_lower(b["text"]), pattern=DEFAULT_CONFIG.token_pattern
        )
        return pa.table({"doc_id": b["doc_id"],
                         "n_tokens": _pc.cast(toks, pa.int64())})

    agg = (
        kept.map_batches(with_len, batch_format="pyarrow")
        .aggregate(Count(), Sum("n_tokens", alias_name="kept_tokens"))
    )
    return pa.table({
        "kept_docs": pa.array([int(agg["count()"])], pa.int64()),
        "kept_tokens": pa.array([int(agg["kept_tokens"])], pa.int64()),
    })


def bpe_merges(sf_dir: str, num_merges: int = 200) -> pa.Table:
    """Learned BPE merge table (rank, left, right).  The distributed
    part is the word histogram (``term_stats``, one vocab-sized
    exchange); the merge loop runs over the histogram — O(vocab×merges),
    corpus-size-independent (``stages/bpe.py``).  Rows-only check: the
    greedy merge recursion has no SQL analog; determinism + hand-traced
    merge laws live in tests/test_bpe.py."""
    from refimage_ray.stages.bpe import learn_bpe, merges_table

    hist = (
        term_stats(sf_dir)
        .select_columns(["term", "total_tf"])
        .to_pandas()
    )
    merges = learn_bpe(
        list(zip(hist["term"], hist["total_tf"])), num_merges
    )
    return merges_table(merges)


def bpe_token_stats_query(
    sf_dir: str, num_merges: int = 200
) -> "rd.Dataset":
    """Per-doc regex-word vs learned-subword counts (rows-only; the
    n_words column is SQL-checkable but n_bpe is not — pytest verifies
    encode == training segmentation instead)."""
    from refimage_ray.stages.bpe import bpe_token_stats, learn_bpe

    hist = (
        term_stats(sf_dir)
        .select_columns(["term", "total_tf"])
        .to_pandas()
    )
    merges = learn_bpe(
        list(zip(hist["term"], hist["total_tf"])), num_merges
    )
    return bpe_token_stats(_docs(sf_dir), merges)


def lang_classifier_stats(sf_dir: str, dim: int = 4096) -> pa.Table:
    """Distributed logistic regression (fastText-style quality/domain
    gate, ``stages/classifier.py``): train on the corpus to predict
    ``lang == 'en'`` from hashed bag-of-words, report the confusion
    matrix at p>=0.5.  Rows-only: training is iterative (no SQL
    analog); separability/gradient/determinism laws are pytest-verified
    in tests/test_classifier.py.  NOTE: the synthetic corpus draws all
    languages from ONE shared vocabulary, so the Bayes-optimal here is
    the majority class — the interesting guarantees are the pytest laws
    (perfect accuracy on separable data), not this table's values."""
    import pyarrow.compute as _pc

    from refimage_ray.stages.classifier import score_logreg, train_logreg

    docs = _docs(sf_dir, columns=("doc_id", "text", "lang"))
    # train on a deterministic 25% hash sample (production gate shape:
    # each GD iteration is a full pass over the training set, so the
    # sample cuts iteration cost 4x); scoring runs over the FULL corpus
    w, _hist = train_logreg(docs, "lang", "en", dim=dim, n_iter=12,
                            sample_frac=0.25)
    scored = score_logreg(docs, w, dim=dim)

    def confusion(b: pa.Table) -> pa.Table:
        pred = _pc.greater_equal(b["p"], 0.5)
        truth = _pc.equal(b["lang"], "en")
        p = pred.to_numpy(zero_copy_only=False)
        t = truth.to_numpy(zero_copy_only=False)
        return pa.table({
            "tp": pa.array([int((p & t).sum())], pa.int64()),
            "fp": pa.array([int((p & ~t).sum())], pa.int64()),
            "tn": pa.array([int((~p & ~t).sum())], pa.int64()),
            "fn": pa.array([int((~p & t).sum())], pa.int64()),
        })

    from ray.data.aggregate import Sum

    agg = (
        scored.map_batches(confusion, batch_format="pyarrow")
        .aggregate(Sum("tp", alias_name="tp"), Sum("fp", alias_name="fp"),
                   Sum("tn", alias_name="tn"), Sum("fn", alias_name="fn"))
    )
    return pa.table({k: pa.array([int(agg[k])], pa.int64())
                     for k in ("tp", "fp", "tn", "fn")})


def dedup_incremental_docs(sf_dir: str) -> pa.Table:
    """Cross-crawl incremental dedup (``stages.dedup.dedup_against_index``):
    the even-doc_id half of the corpus plays the EXISTING crawl (built
    into an index artifact whose docs/ stages the md5 halves), the odd
    half plays the incoming delta.  Result = delta survivor doc_ids
    after (a) dropping docs whose content the existing corpus already
    holds — broadcast hash-set probe, no rescan of the old crawl — and
    (b) exact dedup within the delta itself ("existing corpus wins",
    then first-doc_id-wins)."""
    import ray.data as _rd

    from refimage_ray.config import EngineConfig
    from refimage_ray.index.build import build_index
    from refimage_ray.index.manifest import load_manifest
    from refimage_ray.pipelines.search import _index_dir_for
    from refimage_ray.stages.dedup import dedup_against_index

    import pyarrow.compute as _pc

    def _parity(par: int):
        def f(b: pa.Table) -> pa.Table:
            return b.filter(
                _pc.equal(_pc.bit_wise_and(b["doc_id"], 1), par)
            )

        return f

    index_dir = _index_dir_for(sf_dir) + "-oldhalf"
    if load_manifest(index_dir) is None:
        old = (
            _docs(sf_dir, columns=("doc_id", "text"))
            .map_batches(_parity(0), batch_format="pyarrow")
            .map_batches(add_content_hash, batch_format="pyarrow")
        )
        build_index(old, index_dir,
                    EngineConfig(num_shards=8, salt_buckets=2),
                    dedup_exact=True)  # stages the md5 halves in docs/
    delta = _docs(sf_dir, columns=("doc_id", "text")).map_batches(
        _parity(1), batch_format="pyarrow"
    )
    kept = dedup_against_index(delta, index_dir)
    ids = sorted(r["doc_id"] for r in
                 kept.select_columns(["doc_id"]).take_all())
    return pa.table({"doc_id": pa.array(ids, pa.int64())})


def minhash_dup_clusters(sf_dir: str, threshold: float = 0.6) -> pa.Table:
    """Near-dup clusters (connected components over verified MinHash
    pairs): (doc_id, cluster_id) — rows-only check."""
    from refimage_ray.stages.dedup_near import dup_clusters

    pairs = minhash_near_dups(sf_dir, threshold=threshold)
    return dup_clusters(pairs)


def simhash_values(sf_dir: str) -> "rd.Dataset":
    """Per-doc 64-bit SimHash (rows-only; hex-string presented)."""

    def sh(batch: pa.Table) -> pa.Table:
        t = simhash_batch(batch)
        return pa.table(
            {"doc_id": t["doc_id"], "simhash": pc.cast(t["simhash"], pa.string())}
        )

    return _docs(sf_dir).map_batches(sh, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# sketch-backed aggregations (stages/sketches.py)
# ---------------------------------------------------------------------------


def heavy_hitters(
    sf_dir: str, threshold_frac: float = 0.01, capacity: int = 4095
) -> pa.Table:
    """EXACT counts of every term whose corpus-wide token frequency is
    ≥ ``ceil(threshold_frac * total_tokens)`` — via a Misra–Gries
    candidate pass, not a vocab-wide shuffle.

    Pass 1 (one scan): per-batch exact counts compressed to
    ``capacity`` MG rows (``stages/sketches.mg_partials_batch``);
    summaries merge in a *summary-sized* groupby (≤ capacity rows per
    block, vs the full vocab for ``term_stats``).  The total
    under-count ``E = Σ batch decrements ≤ N/(capacity+1)``, so when
    ``threshold > E`` the merged summary provably contains every
    qualifying term.  Pass 2 (one scan): exact recount restricted to
    the candidate set, broadcast once via ``ray.put``.  If the guard
    fails (threshold too small for the capacity) we fall back to the
    exact ``term_stats`` path — the result is always exact.
    """
    import ray

    from refimage_ray.stages.sketches import MG_SENTINEL, mg_partials_batch

    merged = (
        _docs(sf_dir, columns=("text",))
        .map_batches(
            lambda b: mg_partials_batch(b, capacity), batch_format="pyarrow"
        )
        .groupby("term")
        .aggregate(
            Sum("w", alias_name="w"),
            Sum("decr", alias_name="decr"),
            Sum("n_tokens", alias_name="n_tokens"),
        )
        .take_all()  # ≤ blocks × capacity summary rows, never the corpus
    )
    total_err = sum(r["decr"] for r in merged)
    total_tokens = sum(r["n_tokens"] for r in merged)
    threshold = int(np.ceil(threshold_frac * total_tokens))

    if threshold <= total_err:
        # guard: sketch can't certify the superset — exact fallback
        stats = term_stats(sf_dir).take_all()
        rows = [
            (r["term"], r["total_tf"]) for r in stats if r["total_tf"] >= threshold
        ]
    else:
        candidates = {
            r["term"]
            for r in merged
            if r["term"] != MG_SENTINEL and r["w"] + total_err >= threshold
        }
        cand_ref = ray.put(pa.array(sorted(candidates), pa.string()))

        def recount(batch: pa.Table) -> pa.Table:
            from refimage_ray.stages.tokenize import _flat_tokens

            cand = ray.get(cand_ref)
            flat, _ = _flat_tokens(batch["text"], DEFAULT_CONFIG)
            flat = flat.filter(pc.is_in(flat, value_set=cand))
            g = pa.table({"term": flat}).group_by("term").aggregate(
                [([], "count_all")]
            )
            return pa.table(
                {"term": g["term"], "cnt_part": pc.cast(g["count_all"], pa.int64())}
            )

        exact = (
            _docs(sf_dir, columns=("text",))
            .map_batches(recount, batch_format="pyarrow")
            .groupby("term")
            .aggregate(Sum("cnt_part", alias_name="cnt"))
            .take_all()
        )
        rows = [(r["term"], r["cnt"]) for r in exact if r["cnt"] >= threshold]

    rows.sort(key=lambda r: (-r[1], r[0]))
    return pa.table(
        {
            "term": pa.array([r[0] for r in rows], pa.string()),
            "cnt": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


def distinct_counts(sf_dir: str) -> pa.Table:
    """Exact distinct-term and distinct-language counts (one row).

    Distinct terms: per-batch unique terms (the combiner) → narrow
    groupby → ``Dataset.count()`` of the group table (never collected).
    """
    def uniq_terms(batch: pa.Table) -> pa.Table:
        from refimage_ray.stages.tokenize import _flat_tokens

        flat, _ = _flat_tokens(batch["text"], DEFAULT_CONFIG)
        return pa.table({"term": pc.unique(flat)})

    n_terms = (
        _docs(sf_dir, columns=("text",))
        .map_batches(uniq_terms, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Count(alias_name="c"))
        .count()
    )
    n_langs = (
        _docs(sf_dir, columns=("lang",))
        .groupby("lang")
        .aggregate(Count(alias_name="c"))
        .count()
    )
    return pa.table(
        {
            "distinct_terms": pa.array([n_terms], pa.int64()),
            "distinct_langs": pa.array([n_langs], pa.int64()),
        }
    )


def distinct_terms_hll(sf_dir: str, p: int = 12) -> pa.Table:
    """HyperLogLog distinct-term estimate (rows-only contract query —
    approximate by design; the exact twin is ``distinct_counts``).

    Each block contributes ONE ``2**p``-byte register row; the merge
    is a driver-side elementwise max over block-count rows.  The
    estimate is deterministic (md5-u64 token hash — no seeded runtime
    hashing), so the rows-only check is stable across runs.
    """
    from refimage_ray.stages.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers_batch,
    )

    rows = (
        _docs(sf_dir, columns=("text",))
        .map_batches(lambda b: hll_registers_batch(b, p), batch_format="pyarrow")
        .take_all()  # one tiny row per block
    )
    regs = hll_merge([np.asarray(r["regs"], dtype=np.uint8) for r in rows])
    return pa.table(
        {
            "estimate": pa.array([round(hll_estimate(regs), 3)], pa.float64()),
            "p": pa.array([p], pa.int64()),
        }
    )


def term_counts_cms(
    sf_dir: str,
    probes: tuple = ("data", "spark", "query", "zzz_absent"),
    width: int = 4096,
    depth: int = 4,
) -> pa.Table:
    """Count-Min point estimates for probe terms (rows-only — the
    sketch is approximate by design; its exact twin `term_stats` IS
    oracled, and the never-undercount + merge-linearity laws are
    pytest-verified).  One ``depth·width``-int64 row per block is the
    whole exchange; the driver merge is elementwise add (CMS is a
    linear sketch)."""
    from refimage_ray.functions.hashing import md5_u64_string_array
    from refimage_ray.stages.sketches import cms_batch, cms_merge, cms_query

    rows = (
        _docs(sf_dir, columns=("text",))
        .map_batches(
            lambda b: cms_batch(b, width, depth), batch_format="pyarrow"
        )
        .take_all()  # one tiny row per block
    )
    cms = cms_merge([
        np.asarray(r["cms"], np.int64).reshape(depth, width) for r in rows
    ])
    h = md5_u64_string_array(pa.array(list(probes), pa.string()))
    est = cms_query(cms, h)
    return pa.table({
        "term": pa.array(list(probes), pa.string()),
        "est": pa.array(est, pa.int64()),
    })


def bigram_pmi(sf_dir: str, min_count: int = 5) -> "rd.Dataset":
    """Pointwise mutual information of word bigrams (collocation
    mining): ``pmi = ln( P(xy) / (P(x)·P(y)) )`` over all bigrams with
    count ≥ ``min_count``.

    Dataflow: the bigram counts reuse :func:`bigram_counts`'s combiner
    → vocab²-bounded groupby; unigram counts are vocab-bounded and
    broadcast ONCE via ``ray.put`` (at true web scale swap the
    broadcast for ``stages/joins.hash_join`` against the term table —
    the bigram side never leaves the cluster either way).  No LIMIT:
    every qualifying bigram is returned, so float tie-order can't
    change membership; pmi is rounded to 6 dp on both sides.
    """
    import ray

    from refimage_ray.stages.tokenize import doc_lengths

    # corpus totals: unigram tokens + bigram slots (Σ max(dl-1, 0))
    def totals(batch: pa.Table) -> pa.Table:
        dl = doc_lengths(batch["text"]).astype(np.int64)
        return pa.table(
            {
                "uni": pa.array([int(dl.sum())], pa.int64()),
                "bi": pa.array([int(np.maximum(dl - 1, 0).sum())], pa.int64()),
            }
        )

    tot = (
        _docs(sf_dir, columns=("text",))
        .map_batches(totals, batch_format="pyarrow")
        .aggregate(Sum("uni", alias_name="uni"), Sum("bi", alias_name="bi"))
    )
    n_uni, n_bi = float(tot["uni"]), float(tot["bi"])

    # unigram tf per term (vocab-bounded) → broadcast lookup table
    uni = (
        _docs(sf_dir)
        .map_batches(_term_partials, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("tf_part", alias_name="tf"))
        .take_all()
    )
    terms = pa.array([r["term"] for r in uni], pa.string())
    counts = np.array([r["tf"] for r in uni], dtype=np.float64)
    lut_ref = ray.put((terms, counts))

    def pmi_batch(batch: pa.Table) -> pa.Table:
        t, c = ray.get(lut_ref)
        parts = pc.split_pattern(batch["bigram"], " ")
        left = pc.list_element(parts, 0)
        right = pc.list_element(parts, 1)
        cx = c[pc.index_in(left, value_set=t).to_numpy(zero_copy_only=False)]
        cy = c[pc.index_in(right, value_set=t).to_numpy(zero_copy_only=False)]
        cxy = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        pmi = np.round(np.log((cxy * n_uni * n_uni) / (n_bi * cx * cy)), 6)
        return pa.table(
            {
                "bigram": batch["bigram"],
                "n": batch["n"],
                "pmi": pa.array(pmi, pa.float64()),
            }
        )

    return bigram_counts(sf_dir, min_count).map_batches(
        pmi_batch, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# URL canonicalization / canonical-URL dedup (crawl prep)
# ---------------------------------------------------------------------------

def _messy_urls(b: pa.Table) -> pa.Table:
    """Adversarial URL spellings derived deterministically from doc_id
    (the driver corpus has no URL column and synthetic urls are already
    canonical — casing, www., default ports, trailing slashes, tracking
    params and fragments are injected here so the canonicalizer has
    teeth; mirrored term-for-term in the SQL oracle).  Consecutive
    doc_id pairs target the same canonical URL (doc_id // 2), so the
    dedup query has real groups."""
    d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    base = d // 2
    s97 = pc.cast(pa.array(base % 97), pa.string())
    sbase = pc.cast(pa.array(base), pa.string())
    port = pc.if_else(pa.array(d % 5 == 0), ":443", "")
    trail = pc.if_else(pa.array(d % 7 == 0), "/", "")
    m3 = d % 3
    q = pc.if_else(
        pa.array(m3 == 0),
        "?utm_source=feed&b=2&a=1",
        pc.if_else(pa.array(m3 == 1), "?a=1&utm_campaign=x&b=2", "?b=2&a=1"),
    )
    frag = pc.if_else(pa.array(d % 5 == 0), "#frag", "")
    url = pc.binary_join_element_wise(
        "HTTPS://WWW.Site", s97, ".Example", port, "/d/page-", sbase,
        trail, q, frag, "",
    )
    return pa.table({"doc_id": b["doc_id"], "url": url})


def url_canonical_docs(sf_dir: str) -> "rd.Dataset":
    """Per-doc canonical URL over the adversarial derivation (see
    ``stages/urls.canonicalize_url_array`` for the canonical form)."""
    from refimage_ray.stages.urls import add_canonical_url

    return (
        _docs(sf_dir, columns=("doc_id",))
        .map_batches(_messy_urls, batch_format="pyarrow")
        .map_batches(
            lambda b: add_canonical_url(b).select(
                ["doc_id", "canonical_url"]
            ),
            batch_format="pyarrow",
        )
    )


def url_canonical_dedup(sf_dir: str) -> "rd.Dataset":
    """Canonical-URL dedup groups (n_dups >= 2): the URL-level
    complement of content dedup — same narrow-shuffle shape as
    ``dedup_exact_docs``."""
    from refimage_ray.stages.urls import canonical_url_dup_groups

    messy = _docs(sf_dir, columns=("doc_id",)).map_batches(
        _messy_urls, batch_format="pyarrow"
    )
    return canonical_url_dup_groups(messy)
