"""Training-data preparation pipelines (LM-corpus extensions).

Four operators a 100-TB training-data pipeline runs after curation,
each a ``sf_dir -> Dataset`` entry in ``queries()`` with a DuckDB
value oracle:

- ``pack_sequences``      — context-window packing (distributed scan,
                            ``stages/packing.py``).
- ``lang_mixture_sample`` — per-language mixture re-weighting with a
                            deterministic hash gate (no RNG — the same
                            multiplicative-hash mask as
                            ``relational.doc_sample``, so resumes and
                            cluster-size changes never change the
                            sample).
- ``url_blocklist_stats`` — host blocklist gate (the UT1-style crawl
                            filter) over urls derived + parsed exactly
                            as in ``corpus.domain_stats``.
- ``pii_scrub_stats``     — regex PII scrub (emails / IPv4 / phone)
                            with per-doc match counts.  The synthetic
                            corpus carries no PII, so a deterministic
                            per-row augmentation (doc-id-derived
                            email/ip/phone) is appended on BOTH the
                            Ray and SQL sides — the oracle checks the
                            scrub itself, not the augmentation.

No reference analogs (the reference stores images); prompt-mandated
training-data extensions.  All string work is RE2 kernels
(``pyarrow.compute`` ↔ DuckDB both compile RE2, so the patterns below
behave identically on both sides).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count

from refimage_ray.stages.packing import pack_offsets
from refimage_ray.stages.tokenize import doc_lengths


def _docs(sf_dir: str, columns) -> "rd.Dataset":
    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=list(columns)
    )


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

def pack_sequences(sf_dir: str, budget: int = 256, n_buckets: int = 16) -> "rd.Dataset":
    """Every doc's (seq_id, begin_offset, n_crossings) under contiguous
    doc_id-order concatenation into ``budget``-token sequences."""

    def dl(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "dl": pa.array(
                    doc_lengths(batch["text"]).astype(np.int64), pa.int64()
                ),
            }
        )

    narrow = _docs(sf_dir, ("doc_id", "text")).map_batches(
        dl, batch_format="pyarrow"
    )
    return pack_offsets(narrow, budget=budget, n_buckets=n_buckets)


def packed_sequences(sf_dir: str, budget: int = 256, n_buckets: int = 16) -> "rd.Dataset":
    """Order-pinned checksums of the packed token-id sequences
    (`stages.packing.pack_token_sequences`): per sequence, token count,
    id sum, and a position-weighted id sum — all three reproducible in
    SQL with window functions, so the oracle pins content AND order of
    every sequence without shipping list columns through the compare.
    """
    from refimage_ray.stages.packing import pack_token_sequences

    seqs = pack_token_sequences(
        _docs(sf_dir, ("doc_id", "text")), budget=budget, n_buckets=n_buckets
    )
    return seqs.map_batches(_seq_checksums, batch_format="pyarrow")


def _seq_checksums(b: pa.Table) -> pa.Table:
    """Per-sequence (n_tokens, sum_ids, possum_ids) checksum columns —
    shared by :func:`packed_sequences` and
    :func:`curated_packed_sequences` so both oracles pin the same
    content-and-order semantics."""
    out = {"seq_id": [], "n_tokens": [], "sum_ids": [], "possum_ids": []}
    for row in b.to_pylist():
        ids = np.asarray(row["token_ids"], np.int64)
        out["seq_id"].append(row["seq_id"])
        out["n_tokens"].append(len(ids))
        out["sum_ids"].append(int(ids.sum()))
        out["possum_ids"].append(int(((np.arange(len(ids)) + 1) * ids).sum()))
    return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})


# ---------------------------------------------------------------------------
# mixture sampling
# ---------------------------------------------------------------------------

#: default language mixture (typical LM rebalancing shape: keep all
#: English, downsample the rest) — overridable per call.
DEFAULT_LANG_RATES: dict[str, float] = {
    "en": 1.0,
    "es": 0.5,
    "fr": 0.5,
    "de": 0.25,
    "zh": 0.1,
}
DEFAULT_RATE = 0.05

_HASH_MUL = np.uint64(2654435761)
_HASH_MOD = np.uint64(0xFFFFFFFF)


def global_shuffle_docs(sf_dir: str, seed: int = 0) -> "rd.Dataset":
    """Deterministic global shuffle of the corpus: every doc's position
    in the training-order permutation (``stages.packing.shuffle_ranks``
    — hash-rank scan, not ``random_shuffle``, so the order is seedable,
    byte-stable across resumes/cluster sizes, and SQL-verifiable as
    ``ROW_NUMBER() OVER (ORDER BY shuffle_key, doc_id)``)."""
    from refimage_ray.stages.packing import shuffle_ranks

    return shuffle_ranks(
        _docs(sf_dir, ("doc_id",)), id_col="doc_id", seed=seed
    )


def lang_mixture_sample(
    sf_dir: str, rates: dict[str, float] | None = None, default: float = DEFAULT_RATE
) -> "rd.Dataset":
    """Deterministic per-language downsampling: doc survives iff
    ``(doc_id * 2654435761) mod 2^32 < rate(lang) * 2^32``."""
    rates = DEFAULT_LANG_RATES if rates is None else rates

    def gate(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * _HASH_MUL) & _HASH_MOD
        lang = b["lang"].to_pylist()
        thr = np.fromiter(
            (int(rates.get(l, default) * 4294967296.0) for l in lang),
            dtype=np.uint64,
            count=len(lang),
        )
        keep = pa.array(h < thr)
        return pa.table(
            {"doc_id": b["doc_id"], "lang": b["lang"]}
        ).filter(keep)

    return _docs(sf_dir, ("doc_id", "lang")).map_batches(
        gate, batch_format="pyarrow"
    )


def lang_temperature_sample(sf_dir: str, alpha: float = 0.5) -> "rd.Dataset":
    """Temperature-based language rebalancing (the XLM-R / mT5
    α-sampling recipe): effective language shares ∝ p_l^α, realized by
    per-lang survival rates r_l ∝ p_l^(α-1) normalized so the rarest
    language keeps everything.  Rates derive from ONE lang-sized count
    pass; the gate is the same deterministic multiplicative-hash
    threshold as ``lang_mixture_sample`` (seed-free, resume-stable,
    SQL-mirrored float-for-float via power()/floor())."""
    from ray.data.aggregate import Count

    counts = (
        _docs(sf_dir, ("lang",)).groupby("lang")
        .aggregate(Count(alias_name="n")).to_pandas()
    )
    n_total = float(counts["n"].sum())
    w = (counts["n"].astype(np.float64) / n_total) ** (alpha - 1.0)
    rates = dict(zip(counts["lang"], (w / w.max()).astype(float)))
    return lang_mixture_sample(sf_dir, rates=rates, default=0.0)


def lm_gated_packed_sequences(
    sf_dir: str, budget: int = 256, n_buckets: int = 16,
    max_ppl: float = 32.0,
) -> "rd.Dataset":
    """The FULL training-prep composition under one value oracle:
    curation gates (quality + lang-ID + exact dedup) ∩ bigram-LM
    perplexity gate (model self-trained on the whole corpus,
    ``stages/lm.py``) → token-id sequence packing over the survivors,
    checksummed per sequence.  Every stage's SQL mirror already exists
    (curation keep-set, add-1 LM scored CTE, packed-stream windows) —
    composed, they pin the END-TO-END pipeline content and order.

    Dataflow: curated ids broadcast (small side), LM broadcast once,
    the ppl gate runs in-stage over the survivor stream — nothing
    rescans the corpus driver-side."""
    import ray

    from refimage_ray.pipelines.curate import curated_doc_ids
    from refimage_ray.stages.lm import perplexity_filter, train_bigram_lm
    from refimage_ray.stages.packing import pack_token_sequences

    docs = _docs(sf_dir, ("doc_id", "text"))
    lm = train_bigram_lm(docs)  # full-corpus basis, like doc_perplexity
    keep_tbl = curated_doc_ids(docs)
    keep_ref = ray.put(keep_tbl["doc_id"].combine_chunks())

    def keep_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["doc_id"], value_set=ray.get(keep_ref)))

    survivors = perplexity_filter(
        _docs(sf_dir, ("doc_id", "text")).map_batches(
            keep_only, batch_format="pyarrow"
        ),
        lm, max_ppl,
    )
    seqs = pack_token_sequences(survivors, budget=budget,
                                n_buckets=n_buckets)
    return seqs.map_batches(_seq_checksums, batch_format="pyarrow")


def curated_packed_sequences(
    sf_dir: str, budget: int = 256, n_buckets: int = 16
) -> "rd.Dataset":
    """The composed prep pipeline: curation gates (quality + lang-ID +
    exact dedup, ``pipelines.curate``) → token-id sequence packing over
    the SURVIVORS — checksummed per sequence like
    :func:`packed_sequences`.  Survivor doc_ids keep their values
    (gaps are fine: the packing buckets are ranges, the stream order
    is ascending doc_id of survivors) and the vocab is built over the
    survivors, so the oracle mirrors both the gate set and the stream.

    Dataflow: the curated id set is the small side (ids only) —
    broadcast into a vectorized ``is_in`` filter in front of the
    packing scan; at 100 TB the same filter reads the persisted
    curation output instead of recomputing it.
    """
    import ray

    from refimage_ray.pipelines.curate import curated_doc_ids
    from refimage_ray.stages.packing import pack_token_sequences

    keep_tbl = curated_doc_ids(_docs(sf_dir, ("doc_id", "text")))
    keep_ref = ray.put(keep_tbl["doc_id"].combine_chunks())

    def keep_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["doc_id"], value_set=ray.get(keep_ref)))

    survivors = _docs(sf_dir, ("doc_id", "text")).map_batches(
        keep_only, batch_format="pyarrow"
    )
    seqs = pack_token_sequences(survivors, budget=budget, n_buckets=n_buckets)
    return seqs.map_batches(_seq_checksums, batch_format="pyarrow")


#: BPE-ish pre-tokenizer pattern (GPT-2-style split classes: letter
#: runs, digit runs, single non-space symbols) — RE2-safe on both the
#: Arrow and DuckDB sides.
BPE_ISH = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"
WS_TOKEN = r"\S+"


def token_count_multi(sf_dir: str) -> "rd.Dataset":
    """Per-doc token counts under three tokenizers (engine
    ``[a-z0-9]+``, whitespace, BPE-ish pre-tokenizer) — the cost model
    every budget/packing decision starts from.  One
    ``count_substring_regex`` pass per tokenizer, no splits
    materialized."""

    def counts(b: pa.Table) -> pa.Table:
        low = pc.utf8_lower(b["text"])
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_tokens": pc.cast(
                    pc.count_substring_regex(low, pattern="[a-z0-9]+"),
                    pa.int64(),
                ),
                "n_ws_tokens": pc.cast(
                    pc.count_substring_regex(b["text"], pattern=WS_TOKEN),
                    pa.int64(),
                ),
                "n_bpe_tokens": pc.cast(
                    pc.count_substring_regex(b["text"], pattern=BPE_ISH),
                    pa.int64(),
                ),
            }
        )

    return _docs(sf_dir, ("doc_id", "text")).map_batches(
        counts, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# url blocklist
# ---------------------------------------------------------------------------

#: hosts every SF's source×lang grid contains — a stand-in for a UT1 /
#: spam blocklist shard broadcast to the filter stage.
DEFAULT_BLOCKLIST: tuple[str, ...] = (
    "src3.de.example.org",
    "src7.zh.example.org",
    "src12.es.example.org",
)


def url_blocklist_stats(
    sf_dir: str, blocklist: tuple[str, ...] = DEFAULT_BLOCKLIST
) -> "rd.Dataset":
    """Surviving-doc count per host after the blocklist gate.

    The url is derived per row then the host parsed back OUT with the
    same regex as ``domain_stats`` (a real pipeline filters on parsed
    crawl urls).  The blocklist rides in the task closure — broadcast
    once, never per batch (a production list is a few MB: same
    pattern, or ``ray.put`` above ~100 MB)."""
    block = pa.array(sorted(set(blocklist)), pa.string())

    def gate(b: pa.Table) -> pa.Table:
        url = pc.binary_join_element_wise(
            "https://", b["source"], ".", b["lang"], ".example.org/doc-",
            pc.cast(b["doc_id"], pa.string()), "",
        )
        host = pc.struct_field(
            pc.extract_regex(url, pattern=r"^https?://(?P<host>[^/]+)/"),
            "host",
        )
        keep = pc.invert(pc.is_in(host, value_set=block))
        return pa.table({"host": host}).filter(keep)

    return (
        _docs(sf_dir, ("doc_id", "lang", "source"))
        .map_batches(gate, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Count(alias_name="n_docs"))
    )


# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------

PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}-\d{4}\b"


def _augment_pii(b: pa.Table) -> pa.Array:
    """Deterministic id-derived PII suffix (mirrored in the oracle)."""
    ids = b["doc_id"]
    return pc.binary_join_element_wise(
        b["text"],
        " contact doc",
        pc.cast(ids, pa.string()),
        "@example.com from 192.168.",
        pc.cast(pc.subtract(ids, pc.multiply(pc.divide(ids, 256), 256)), pa.string()),
        ".",
        pc.cast(pc.subtract(ids, pc.multiply(pc.divide(ids, 100), 100)), pa.string()),
        " call 555-",
        pc.utf8_lpad(
            pc.cast(
                pc.subtract(ids, pc.multiply(pc.divide(ids, 10000), 10000)),
                pa.string(),
            ),
            width=4,
            padding="0",
        ),
        "",
    )


def pii_scrub_batch(text: pa.Array | pa.ChunkedArray) -> dict[str, pa.Array]:
    """Count and redact emails / IPv4s / phone numbers — three RE2
    passes, no Python loop.  Redaction order (email → ip → phone) is
    part of the contract: an address inside an email must be counted
    once, as an email."""
    # counts run on the PROGRESSIVELY redacted text so they agree with
    # the redaction output: a phone/IP embedded in an email is counted
    # once, as the email that swallowed it
    n_emails = pc.count_substring_regex(text, pattern=PII_EMAIL)
    clean = pc.replace_substring_regex(text, pattern=PII_EMAIL, replacement="<EMAIL>")
    n_ips = pc.count_substring_regex(clean, pattern=PII_IPV4)
    clean = pc.replace_substring_regex(clean, pattern=PII_IPV4, replacement="<IP>")
    n_phones = pc.count_substring_regex(clean, pattern=PII_PHONE)
    clean = pc.replace_substring_regex(clean, pattern=PII_PHONE, replacement="<PHONE>")
    return {
        "n_emails": pc.cast(n_emails, pa.int64()),
        "n_ips": pc.cast(n_ips, pa.int64()),
        "n_phones": pc.cast(n_phones, pa.int64()),
        "clean": clean,
    }


def pii_scrub_stats(sf_dir: str) -> "rd.Dataset":
    """Per-doc PII match counts + redacted length over the augmented
    corpus (augmentation gives the oracle teeth — the raw synthetic
    text contains no PII)."""

    def scrub(b: pa.Table) -> pa.Table:
        synth = _augment_pii(b)
        out = pii_scrub_batch(synth)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_emails": out["n_emails"],
                "n_ips": out["n_ips"],
                "n_phones": out["n_phones"],
                "clean_len": pc.cast(pc.utf8_length(out["clean"]), pa.int64()),
            }
        )

    return _docs(sf_dir, ("doc_id", "text")).map_batches(
        scrub, batch_format="pyarrow"
    )


def split_by_hash(sf_dir: str, val_pct: int = 1, test_pct: int = 1) -> "rd.Dataset":
    """Deterministic train/val/test split rollup: every doc is assigned
    a split by ``md5_u64(doc_id) % 100`` (train < 98, val = 98,
    test = 99 at the defaults) — the standard reproducible holdout
    assignment for a training corpus (no RNG: adding machines, resuming,
    or re-running never moves a doc across splits, so the val set can
    never leak into train between runs).

    Output pins the assignment, not just the sizes: per split,
    ``n_docs``, ``total_tokens`` (engine tokenizer) and ``sum_doc_ids``
    — a misassigned doc changes two rows' checksums at once.

    Scale shape: the assignment is a pure per-batch map (NO shuffle at
    100 TB — the split column would simply be written through);
    the rollup combines per batch first, so the only exchange is
    ≤ 3 rows per block through one tiny groupby.
    """
    from ray.data.aggregate import Sum

    from refimage_ray.functions.hashing import md5_u64_string_array

    train_hi = 100 - val_pct - test_pct

    def partial(b: pa.Table) -> pa.Table:
        bucket = md5_u64_string_array(
            pc.cast(b["doc_id"], pa.string())
        ) % np.uint64(100)
        split = np.where(
            bucket < train_hi, "train",
            np.where(bucket < 100 - test_pct, "val", "test"),
        )
        dl = doc_lengths(b["text"]).astype(np.int64)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        out = {"split": [], "n_docs": [], "total_tokens": [], "sum_doc_ids": []}
        for s in ("train", "val", "test"):
            m = split == s
            if m.any():
                out["split"].append(s)
                out["n_docs"].append(int(m.sum()))
                out["total_tokens"].append(int(dl[m].sum()))
                out["sum_doc_ids"].append(int(ids[m].sum()))
        return pa.table(
            {
                "split": pa.array(out["split"], pa.string()),
                "n_docs": pa.array(out["n_docs"], pa.int64()),
                "total_tokens": pa.array(out["total_tokens"], pa.int64()),
                "sum_doc_ids": pa.array(out["sum_doc_ids"], pa.int64()),
            }
        )

    return (
        _docs(sf_dir, ("doc_id", "text"))
        .map_batches(partial, batch_format="pyarrow")
        .groupby("split")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("total_tokens", alias_name="total_tokens"),
            Sum("sum_doc_ids", alias_name="sum_doc_ids"),
        )
    )


def url_latest_snapshot(sf_dir: str, pages_per_host: int = 500) -> "rd.Dataset":
    """Latest-crawl-snapshot-per-url selection (the recency dedup every
    multi-crawl web pipeline runs before content dedup: many fetches of
    the same page over time, keep the newest).  The synthetic corpus has
    one row per doc, so the page url and fetch time are DERIVED
    deterministically — several docs share a url (``doc_id %
    pages_per_host`` within a host) and the fetch offset is
    ``md5_u64(doc_id) % 1e6`` seconds — giving the oracle real
    multi-snapshot groups to adjudicate.

    Winner per url = max by (fetch offset, doc_id) — an argmax-per-key
    aggregate, the "latest version wins" upsert semantic.

    Scale shape: each batch first reduces to ONE candidate row per url
    it saw (per-batch argmax combiner + partial count), so the shuffle
    carries ≤ |urls-in-batch| narrow rows, never the corpus; the final
    ``groupby(url)`` adjudicates candidate rows only.
    """
    from refimage_ray.functions.hashing import md5_u64_string_array

    def partial(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        ts_off = (
            md5_u64_string_array(pc.cast(b["doc_id"], pa.string()))
            % np.uint64(1_000_000)
        ).astype(np.int64)
        url = pc.binary_join_element_wise(
            b["source"], ".", b["lang"], ".example.org/page-",
            pc.cast(
                pc.subtract(
                    b["doc_id"],
                    pc.multiply(
                        pc.divide(b["doc_id"], pages_per_host),
                        pages_per_host,
                    ),
                ),
                pa.string(),
            ),
            "",
        )
        t = pa.table(
            {
                "url": url,
                "doc_id": b["doc_id"],
                "ts_off": pa.array(ts_off, pa.int64()),
                "n": pa.array(np.ones(len(ids), np.int64), pa.int64()),
            }
        )
        # per-batch argmax combiner: sort (url asc, ts_off desc, id desc),
        # keep each url run's first row, carry the run length as n
        idx = pc.sort_indices(
            t,
            sort_keys=[("url", "ascending"), ("ts_off", "descending"),
                       ("doc_id", "descending")],
        )
        t = t.take(idx)
        urls = t["url"].to_numpy(zero_copy_only=False)
        is_first = np.concatenate(([True], urls[1:] != urls[:-1]))
        starts = np.flatnonzero(is_first)
        run_len = np.diff(np.append(starts, len(urls)))
        return t.filter(pa.array(is_first)).set_column(
            3, "n", pa.array(run_len.astype(np.int64), pa.int64())
        )

    def finalize(g):
        g = g.sort_values(
            ["ts_off", "doc_id"], ascending=[False, False], kind="mergesort"
        )
        import pandas as pd

        return pd.DataFrame(
            {
                "url": [g["url"].iloc[0]],
                "latest_doc_id": [np.int64(g["doc_id"].iloc[0])],
                "n_snapshots": [np.int64(g["n"].sum())],
            }
        )

    return (
        _docs(sf_dir, ("doc_id", "lang", "source"))
        .map_batches(partial, batch_format="pyarrow")
        .groupby("url")
        .map_groups(finalize)
    )


def stratified_sample(sf_dir: str, n_per_stratum: int = 30) -> "rd.Dataset":
    """EXACT-count stratified sample: the ``n`` docs with the lowest
    deterministic hash within each language (so the sample is stable
    across runs/cluster sizes — the property a reproducible training
    mix needs; rate-based sampling is :func:`lang_mixture_sample`).

    Scale shape: a stratum is a whole language — far too large for one
    ``map_groups`` group — so each batch first keeps only ITS lowest
    ``n`` per lang (combiner), shrinking the shuffle to ≤ blocks × n ×
    |langs| rows; the per-lang finalizer then picks the global lowest
    ``n`` from those.  Order key is (md5-u64(doc_id), doc_id): fully
    deterministic and mirrored by the SQL oracle's ``row_number()``.
    """
    import pyarrow.compute as pc

    from refimage_ray.functions.hashing import md5_u64_string_array

    # hash column type: reinterpreting u64 as int64 would flip the
    # order for hashes >= 2^63, so store the hash SHIFTED into signed
    # range (h - 2^63) — strictly monotone in the unsigned value
    def partial_shifted(b: pa.Table) -> pa.Table:
        h = md5_u64_string_array(pc.cast(b["doc_id"], pa.string()))
        hs = (h - np.uint64(1 << 63)).view(np.int64)
        t = pa.table(
            {
                "doc_id": b["doc_id"],
                "lang": b["lang"],
                "h": pa.array(hs, pa.int64()),
            }
        )
        idx = pc.sort_indices(
            t, sort_keys=[("lang", "ascending"), ("h", "ascending"),
                          ("doc_id", "ascending")]
        )
        t = t.take(idx)
        # keep the first n rows of each lang run (vectorized run-length)
        langs = t["lang"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(
            np.concatenate(([True], langs[1:] != langs[:-1]))
        )
        run_id = np.cumsum(
            np.concatenate(([False], langs[1:] != langs[:-1]))
        )
        pos_in_run = np.arange(len(langs)) - starts[run_id]
        return t.filter(pa.array(pos_in_run < n_per_stratum))

    def finalize(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["h", "doc_id"], kind="mergesort").head(n_per_stratum)
        return g[["doc_id", "lang"]]

    import pandas as pd  # noqa: F401  (map_groups yields pandas)

    return (
        _docs(sf_dir, ("doc_id", "lang"))
        .map_batches(partial_shifted, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(finalize)
    )


# ---------------------------------------------------------------------------
# crawl-snapshot delta (incremental-crawl management)
# ---------------------------------------------------------------------------

def _snapshot_pair(sf_dir: str):
    """Two deterministic crawl snapshots derived from the documents
    table (it has no snapshot dimension): the OLD crawl drops
    ``doc_id % 10 == 0`` rows, the NEW crawl drops ``% 10 == 9`` and
    rewrites the text of ``% 10 == 5`` rows — so added / removed /
    changed / unchanged all have real members.  Mirrored 1:1 in SQL."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def old_f(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.filter(pa.array(d % 10 != 0))

    def new_f(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = b.filter(pa.array(d % 10 != 9))
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        text = pc.if_else(
            pa.array(d % 10 == 5),
            pc.binary_join_element_wise(b["text"], " v2", ""),
            b["text"],
        )
        return pa.table({"doc_id": b["doc_id"], "text": text})

    return (
        docs.map_batches(old_f, batch_format="pyarrow"),
        docs.map_batches(new_f, batch_format="pyarrow"),
    )


def crawl_delta_docs(sf_dir: str) -> "rd.Dataset":
    """Per-key crawl diff (added/removed/changed/unchanged) — see
    ``stages/crawl.crawl_delta``; only 16 B content fingerprints
    shuffle, never page text."""
    from refimage_ray.stages.crawl import crawl_delta

    old, new = _snapshot_pair(sf_dir)
    return crawl_delta(old, new, key_col="doc_id")


def crawl_delta_summary(sf_dir: str) -> pa.Table:
    """4-row status rollup of the crawl diff (zeros included)."""
    from refimage_ray.stages.crawl import crawl_delta_stats

    old, new = _snapshot_pair(sf_dir)
    return crawl_delta_stats(old, new, key_col="doc_id")


# ---------------------------------------------------------------------------
# deterministic weighted sampling (Efraimidis–Spirakis exponential race)
# ---------------------------------------------------------------------------

def weighted_sample(
    ds: "rd.Dataset",
    n: int,
    *,
    weight_col: str,
    id_col: str = "doc_id",
) -> "rd.Dataset":
    """Weighted sampling WITHOUT replacement, deterministically:
    Efraimidis & Spirakis (IPL 2006) — give each row the exponential
    race key ``-ln(u)/w`` and keep the ``n`` smallest.  ``u`` is a
    content-derived uniform (md5 of the id, never an RNG), so the
    sample is independent of block layout / cluster size / resume —
    the same no-RNG discipline as every other sampling gate here.

    Distributed shape: per-batch bottom-``n`` partials (lexsort slice),
    then one small sort+limit over ≤ n·blocks survivor rows — the
    corpus itself never sorts.  Rows with weight <= 0 are excluded (an
    infinite race time).
    """
    from refimage_ray.functions.hashing import md5_u64_string_array

    def partial(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = b[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        h = md5_u64_string_array(pc.cast(b[id_col], pa.string()))
        # (h + 0.5) / 2^64 ∈ (0, 1) exactly, and the SAME float ops as
        # the SQL mirror — so keys are bit-identical on both sides
        u = (h.astype(np.float64) + 0.5) / 18446744073709551616.0
        with np.errstate(divide="ignore"):
            key = np.where(w > 0, -np.log(u) / w, np.inf)
        keep = np.lexsort((ids, key))[: min(n, len(ids))]
        keep = keep[np.isfinite(key[keep])]
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                weight_col: pa.array(
                    b[weight_col].take(pa.array(keep))
                ),
                "sample_key": pa.array(key[keep], pa.float64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .sort(["sample_key", id_col])
        .limit(n)
    )


def weighted_sample_docs(sf_dir: str, n: int = 100) -> "rd.Dataset":
    """Length-weighted doc sample (quality/length-weighted mixture
    draws are standard in training-data curation): weight = n_chars."""
    return weighted_sample(
        _docs(sf_dir, ("doc_id", "n_chars")), n, weight_col="n_chars"
    )


def doc_chunks(sf_dir: str, size: int = 64, stride: int = 32) -> "rd.Dataset":
    """RAG-style overlapping passage chunks (size-64 windows every 32
    words) — see ``stages/lines.chunk_batch`` for the vectorized rule."""
    from refimage_ray.stages.lines import chunk_docs

    return chunk_docs(_docs(sf_dir, ("doc_id", "text")),
                      size=size, stride=stride)
