"""Benchmark driver — headline pipelines over $GRAFT_SF_DIR.

Plain run: one JSON line
    {"metric": "index_build_sec", "value": <sec>, "unit": "sec",
     "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
     "docs_per_sec": ..., "query_p95_ms": ...}

--scaling: runs the SAME job in two fresh processes (num_cpus=8 and
32 — the sandbox proxy for N vs 4N nodes, per driver instructions) and
prints throughputs + scaling efficiency.

The bench corpus is the sf documents table replicated REP× with a
deterministic per-replica suffix token (distinct urls + distinct
content), so the full extract→dedup→ids→index pipeline runs at a
meaningful document count (sf0.1 has 5 000 base docs; REP=20 → 100 000
pages).  Input prep and a warm-up scan are untimed (page-cache warm,
per ray_guide).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REP = int(os.environ.get("RAY_GRAFT_REP", "50"))

BENCH_QUERIES = [
    "spark join query", "merge sort table", "window stream batch",
    "fast data scan", "the slow group", "hash index lookup",
    "column row filter", "batch stream window agg", "key value store",
    "table scan merge", "big small fast slow", "data query join sort",
]


def _prepare_pages(sf_dir: str, rep: int) -> str:
    """Deterministic replicated pages corpus (untimed input prep)."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from refimage_ray.sources.pages import make_html, EPOCH_US, write_pages

    tag = hashlib.md5(f"{os.path.abspath(sf_dir)}|{rep}".encode()).hexdigest()[:12]
    out_dir = f"/tmp/refimage_ray_bench/pages-{tag}"
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text", "lang"])
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    langs = docs["lang"].to_pylist()
    import numpy as np

    all_tables = []
    for r in range(rep):
        suffix = f" r{r:02d}"
        t = [x + suffix for x in texts]
        urls = [f"https://docs.example/{l}/doc-{d}-r{r:02d}"
                for d, l in zip(ids, langs)]
        ts = (EPOCH_US + (np.asarray(ids, dtype=np.int64) * rep + r) * 137_000_000
              ).astype("datetime64[us]")
        htmls = [make_html(x, f"doc-{d}-r{r:02d}") for d, x in zip(ids, t)]
        all_tables.append(pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(t, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }))
    write_pages(pa.concat_tables(all_tables), out_dir, rows_per_file=4096)
    with open(marker, "w") as f:
        f.write("")
    return out_dir


def _host_canary() -> float:
    """Fixed single-thread CPU workload (seconds) — a host-speed canary.

    The sandbox host's effective CPU speed varies several-fold between
    rounds (co-tenant contention); this number lets any two bench runs
    be compared speed-normalized.  Pure numpy, no Ray, deterministic.
    """
    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.random(2_000_000)
    acc = 0.0
    for _ in range(2):  # untimed warmup (page-in, frequency ramp)
        acc += float(np.sort(a)[0]) + float((a * a).sum())
    t0 = time.perf_counter()
    for _ in range(20):
        acc += float(np.sort(a)[0]) + float((a * a).sum())
    assert acc == acc
    return round(time.perf_counter() - t0, 3)


def _host_canary_mt(threads: int = 16) -> float:
    """Same workload × ``threads`` concurrent threads (numpy releases
    the GIL in sort) — measures EFFECTIVE multi-core availability.
    mt/st ≈ 1 means `threads` truly free cores; ≫1 means co-tenant
    contention or vCPU oversubscription is eating the parallelism."""
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.random(2_000_000)

    def work() -> float:
        acc = 0.0
        for _ in range(20):
            acc += float(np.sort(a)[0]) + float((a * a).sum())
        return acc

    with ThreadPoolExecutor(max_workers=threads) as pool:
        list(pool.map(lambda _: work(), range(threads)))  # warmup+page-in
        t0 = time.perf_counter()
        res = list(pool.map(lambda _: work(), range(threads)))
    assert all(x == x for x in res)
    return round(time.perf_counter() - t0, 3)


def _median3(fn) -> tuple[float, float]:
    """(median, spread=max−min) of three timed runs — sub-second
    metrics moved ±8% on single runs two rounds straight, so rounds
    compare medians with the per-run spread recorded next to them."""
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[1], ts[2] - ts[0]


def _p95x3(queries, call, passes: int = 2) -> tuple[float, float]:
    """Median of three independent p95 estimates (each over
    ``passes`` full passes of the query set) + their spread."""
    import numpy as np

    p95s = []
    for _ in range(3):
        lat = []
        for _ in range(passes):
            for q in queries:
                t0 = time.perf_counter()
                call(q)
                lat.append(time.perf_counter() - t0)
        p95s.append(float(np.percentile(np.array(lat), 95)))
    p95s.sort()
    return p95s[1], p95s[2] - p95s[0]


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import numpy as np
    import pyarrow.parquet as pq

    from refimage_ray.config import EngineConfig
    from refimage_ray.pipelines import relational, vectors
    from refimage_ray.pipelines.corpus import term_stats
    from refimage_ray.pipelines.flagship import build_from_pages
    from refimage_ray.query.engine import LocalSearcher

    pages_dir = _prepare_pages(SF_DIR, REP)
    # warm page cache (untimed)
    for f in os.listdir(pages_dir):
        if f.endswith(".parquet"):
            pq.read_table(os.path.join(pages_dir, f))
    # warm the worker pool (untimed): spawn Ray workers before the clock
    # starts so both parallelism levels pay startup outside the measure
    import ray.data as rd

    rd.range(NUM_CPUS * 8, override_num_blocks=NUM_CPUS * 8).map_batches(
        lambda b: b
    ).materialize()

    # IMPORTANT: identical job config at every parallelism level (the
    # scaling criterion compares the same job at N and 4N)
    cfg = EngineConfig(num_shards=64, salt_buckets=8)
    index_dir = f"/tmp/refimage_ray_bench/index-{NUM_CPUS}"
    shutil.rmtree(index_dir, ignore_errors=True)

    timings: dict[str, float] = {}

    # extract flavor: "task" (default) = task-pool map_batches with
    # per-worker cached regex state — no actor ramp, scheduler-sized
    # parallelism; "actor" = the pre-warmed autoscaling pool (kept for
    # A/B; the pattern for genuinely expensive per-worker state).
    if os.environ.get("REFIMAGE_EXTRACT_MODE", "task") == "task":
        extract_conc = None
    else:
        extract_conc = (max(1, NUM_CPUS // 4), max(2, NUM_CPUS // 2))
    t0 = time.perf_counter()
    res = build_from_pages(pages_dir, index_dir, cfg,
                           extract_concurrency=extract_conc)
    build_sec = time.perf_counter() - t0
    timings["index_build"] = round(build_sec, 3)
    n_docs = res.metrics["n_docs"]

    # REFIMAGE_BENCH_LITE=1 (the --scaling legs): measure ONLY the
    # headline build so a lo/hi pair fits inside this host's short
    # co-tenant-calm windows — everything after the build is skipped
    # and query_p95 reported as a cheap 1-pass estimate.
    lite = os.environ.get("REFIMAGE_BENCH_LITE") == "1"

    # query latency (warm actor-free local path; p95 over repeated set).
    # One UNTIMED warmup pass first: right after a build, pass 1 is
    # dominated by Ray worker teardown/GC contention + cold file reads,
    # not the engine — measured 1204 ms cold-pass mean vs 192 ms warm at
    # num_cpus=32 on a byte-identical index (vs 296/179 at 8), which made
    # the hi leg of --scaling look 1.3-1.6x worse on query p95 purely
    # from startup noise.
    searcher = LocalSearcher(index_dir)
    for q in BENCH_QUERIES:
        searcher.search(q, k=10, mode="or")
    if lite:
        # scaling legs: one cheap pass (comparable across legs/rounds)
        lat = []
        for q in BENCH_QUERIES:
            tq = time.perf_counter()
            searcher.search(q, k=10, mode="or")
            lat.append(time.perf_counter() - tq)
        p95 = float(np.percentile(np.array(lat), 95))
    else:
        p95, spread = _p95x3(
            BENCH_QUERIES, lambda q: searcher.search(q, k=10, mode="or")
        )
        timings["query_p95_spread"] = round(spread, 5)
    timings["query_p95"] = round(p95, 5)

    if lite:
        out = {
            "metric": "index_build_sec",
            "value": round(build_sec, 3),
            "unit": "sec",
            "queries": timings,
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "n_docs": int(n_docs),
            "n_postings": int(res.metrics["n_postings"]),
            "docs_per_sec": round(n_docs / build_sec, 1),
            "postings_per_sec": round(res.metrics["n_postings"] / build_sec, 1),
            "query_p95_ms": round(p95 * 1000, 2),
            "build_stages": {
                k: round(res.metrics[k], 3)
                for k in ("docs_write_sec", "dedup_sec", "stats_sec",
                          "hot_sec", "shuffle_build_sec",
                          "reducer_wall_sec")
                if k in res.metrics
            },
            "shuffle_bytes": int(res.metrics.get("shuffle_bytes", 0)),
            "host_canary_sec": _host_canary(),
            "host_canary_mt16_sec": _host_canary_mt(16),
        }
        ray.shutdown()
        return out

    # doc-values query paths: filtered top-k and a full facet panel.
    # Filtered search is the EXACT (unpruned) evaluation + an
    # O(candidates) rank-aligned mask probe, so its p95 tracks the
    # dense-TAAT cost rather than the MaxScore-pruned plain p95 —
    # recorded separately and honestly (first call pays the one-time
    # doc-value column load; warmed before timing).
    _where = [("lang", "=", "en")]
    searcher.search(BENCH_QUERIES[0], k=10, where=_where)  # dv load + warm
    med, spread = _p95x3(
        BENCH_QUERIES, lambda q: searcher.search(q, k=10, where=_where)
    )
    timings["query_p95_filtered"] = round(med, 5)
    timings["query_p95_filtered_spread"] = round(spread, 5)
    med, spread = _median3(lambda: searcher.facets(
        BENCH_QUERIES[0], by=["lang"],
        histograms={"doc_len": 50}, sums={"lang": "doc_len"}))
    timings["facet_panel_sec"] = round(med, 5)
    timings["facet_panel_sec_spread"] = round(spread, 5)

    # function-scored path (decay boost = exact evaluation + one
    # vectorized per-candidate factor multiply over rank-aligned
    # doc values) — same evaluation class as filtered search
    from refimage_ray.query.boost import DecaySpec

    _spec = DecaySpec("n_chars", 0.0, 2000.0, 0.5, "exp")
    searcher.search(BENCH_QUERIES[0], k=10, boost=_spec)  # warm
    med, spread = _p95x3(
        BENCH_QUERIES, lambda q: searcher.search(q, k=10, boost=_spec)
    )
    timings["query_p95_decay"] = round(med, 5)
    timings["query_p95_decay_spread"] = round(spread, 5)

    # NRT ingestion: docs/s into the in-memory delta buffer (searchable
    # on return, merged-stats exact) + the buffered-query p95
    import pyarrow as pa
    import pyarrow.dataset as _pads

    from refimage_ray.query.nrt import DeltaSearcher

    _nrt_src = _pads.dataset(os.path.join(index_dir, "docs")).head(
        5000, columns=["doc_id", "text"]
    )
    _nrt_tbl = _nrt_src.set_column(
        _nrt_src.schema.get_field_index("doc_id"), "doc_id",
        pa.array(
            _nrt_src["doc_id"].to_numpy(zero_copy_only=False) + 10**15,
            pa.int64(),
        ),
    )
    _delta = DeltaSearcher(index_dir, base=searcher)
    tq = time.perf_counter()
    _delta.add(_nrt_tbl)
    _nrt_sec = time.perf_counter() - tq
    timings["nrt_add_docs_per_sec"] = round(_nrt_tbl.num_rows / _nrt_sec, 1)
    # refresh pass (the Lucene NRT reader-warm analog): the first
    # query per (term, buffer-generation) pays the base∪buffer merge
    # once; its cost is the REFRESH metric, steady-state latency is
    # the p95 — both reported
    tq = time.perf_counter()
    for q in BENCH_QUERIES:
        _delta.search(q, k=10)
    timings["nrt_refresh_sec"] = round(time.perf_counter() - tq, 5)
    med, spread = _p95x3(BENCH_QUERIES, lambda q: _delta.search(q, k=10))
    timings["query_p95_nrt"] = round(med, 5)
    timings["query_p95_nrt_spread"] = round(spread, 5)
    del _delta

    # hit-count surface (exact membership, no scoring/top-k)
    searcher.count(BENCH_QUERIES[0])  # warm
    med, spread = _p95x3(BENCH_QUERIES, searcher.count)
    timings["query_p95_count"] = round(med, 5)
    timings["query_p95_count_spread"] = round(spread, 5)

    # actor-pool serving path (shard actors load postings once in
    # __init__; driver merges in canonical order)
    from refimage_ray.query.engine import DistributedSearcher

    dsr = DistributedSearcher(index_dir, num_actors=min(8, max(2, NUM_CPUS // 4)))
    dsr.wait_ready()  # all actors postings-resident before the clock
    dsr.search("warmup query", k=10)
    med, spread = _p95x3(
        BENCH_QUERIES, lambda q: dsr.search(q, k=10, mode="or")
    )
    timings["query_p95_actor_pool"] = round(med, 5)
    timings["query_p95_actor_pool_spread"] = round(spread, 5)

    # serving THROUGHPUT (doc-partitioned scatter-gather, pipelined):
    # build the docpart layout from the already-staged docs, then push
    # a query batch through search_many and report QPS
    # (REFIMAGE_BENCH_QPS=0 skips — e.g. inside --scaling, where only
    # the headline build is compared across parallelism levels)
    if os.environ.get("REFIMAGE_BENCH_QPS", "1") != "0":
        from refimage_ray.index.docpart import (
            DistributedDocPartSearcher, build_doc_partitioned,
        )

        from refimage_ray.index.reader import staged_docs

        # term-partitioned batch serving first (dsr already exists),
        # then RELEASE its pool: idle actors reserve 1 CPU each, and a
        # pool of 8 would steal a quarter of the machine from every
        # Dataset stage timed after it (measured 60 s → 11 s on the
        # pack stage with 16 idle actors released).
        qbatch = BENCH_QUERIES * 8  # 96 queries in flight
        dsr.search_many(BENCH_QUERIES, k=10)  # warm
        tq = time.perf_counter()
        dsr.search_many(qbatch, k=10, mode="or")
        timings["qps_termpart"] = round(
            len(qbatch) / (time.perf_counter() - tq), 1
        )
        for a in dsr.actors:
            ray.kill(a)

        # POSITIONAL docpart build (store_positions=True): the richer
        # artifact — phrase/proximity-capable shards — so docpart_build
        # includes positions through the exchange (was position-free
        # before 2026-08-19; noted in BENCH/BASELINE.md)
        from dataclasses import replace as _dc_replace

        docpart_dir = f"/tmp/refimage_ray_bench/docpart-{NUM_CPUS}"
        shutil.rmtree(docpart_dir, ignore_errors=True)
        tq = time.perf_counter()
        build_doc_partitioned(
            staged_docs(index_dir, columns=["doc_id", "text"]),
            docpart_dir, _dc_replace(cfg, store_positions=True),
            num_doc_shards=max(8, NUM_CPUS // 2),
        )
        timings["docpart_build"] = round(time.perf_counter() - tq, 3)
        dps = DistributedDocPartSearcher(
            docpart_dir, num_actors=min(8, max(2, NUM_CPUS // 4))
        )
        dps.search_many(BENCH_QUERIES, k=10)  # warmup (actors load postings)
        tq = time.perf_counter()
        dps.search_many(qbatch, k=10, mode="or")
        qps_sec = time.perf_counter() - tq
        timings["qps_docpart"] = round(len(qbatch) / qps_sec, 1)

        # phrase/proximity serving over the positional doc shards
        _PHRASEQ = ["table scan", "data join", "merge sort",
                    "window stream", "key value", "fast data"]
        dps.search_phrase("table scan", k=10)  # warm
        med, spread = _p95x3(
            _PHRASEQ, lambda q: dps.search_phrase(q, k=10, slop=1)
        )
        timings["query_p95_phrase_docpart"] = round(med, 5)
        timings["query_p95_phrase_docpart_spread"] = round(spread, 5)

        # unordered proximity (NEAR/W) on the same positional shards —
        # the scale path (the term-layout artifact here stores no
        # positions, so near there would time the text fallback)
        dps.search_near("table scan", window=5, k=10)  # warm
        med, spread = _p95x3(
            _PHRASEQ, lambda q: dps.search_near(q, window=5, k=10)
        )
        timings["query_p95_near"] = round(med, 5)
        timings["query_p95_near_spread"] = round(spread, 5)
        for a in dps.actors:
            ray.kill(a)

        # full-match-set export (scroll/export-all): hot-term membership
        # streamed through the term-pruned decode + narrow groupby —
        # rows/s for the batch-export side of the query engine
        from refimage_ray.pipelines.export import matches_dataset

        tq = time.perf_counter()
        n_export = matches_dataset(index_dir, "the data join").count()
        export_sec = time.perf_counter() - tq
        timings["export_matches"] = round(export_sec, 3)
        timings["export_rows_per_sec"] = round(n_export / export_sec, 1)

        # training-prep throughput: token-id sequence packing over the
        # staged REP'd corpus (vocab build + scan + piece/assembly
        # shuffles) — docs/s for the prep side of the engine
        from refimage_ray.stages.packing import (
            pack_token_sequences, vocab_from_index,
        )

        tq = time.perf_counter()
        n_seqs = pack_token_sequences(
            staged_docs(index_dir, columns=["doc_id", "text"]),
            budget=2048, n_buckets=max(8, NUM_CPUS),
            vocab=vocab_from_index(index_dir),  # artifact reuse, no re-tokenize
        ).count()
        pack_sec = time.perf_counter() - tq
        timings["pack_sequences"] = round(pack_sec, 3)
        timings["pack_docs_per_sec"] = round(n_docs / pack_sec, 1)
        timings["pack_n_seqs"] = int(n_seqs)

        # LM quality-gate throughput: bigram-LM train (one vocab-sized
        # exchange) + full-corpus perplexity scoring (broadcast model,
        # vectorized searchsorted probes) — docs/s for the CCNet-style
        # filter stage
        from refimage_ray.stages.lm import score_perplexity, train_bigram_lm

        _corp = staged_docs(index_dir, columns=["doc_id", "text"])
        tq = time.perf_counter()
        _lm = train_bigram_lm(_corp, min_count=2)
        timings["lm_train_sec"] = round(time.perf_counter() - tq, 3)
        tq = time.perf_counter()
        n_scored = score_perplexity(_corp, _lm).count()
        ppl_sec = time.perf_counter() - tq
        timings["ppl_score_docs_per_sec"] = round(n_scored / ppl_sec, 1)

        # phrase-suggester serving latency (LM already trained above —
        # the persisted-artifact serving shape)
        from refimage_ray.query.suggest import PhraseSuggester

        _sug = PhraseSuggester(_lm)
        _sug.suggest("tabl scann")  # warm (deletes index built in init)
        tq = time.perf_counter()
        for _ in range(20):
            _sug.suggest("tabl scann")
        timings["suggest_phrase_ms"] = round(
            (time.perf_counter() - tq) / 20 * 1000, 2
        )

        # exact-substring span scrub throughput (Lee et al. rewrite):
        # dup-gram discovery + coverage rebuild over the full corpus
        from refimage_ray.stages.spans import scrub_dup_spans

        tq = time.perf_counter()
        n_scrubbed = scrub_dup_spans(_corp, n=8, return_text=True).count()
        scrub_sec = time.perf_counter() - tq
        timings["scrub_spans_docs_per_sec"] = round(n_scrubbed / scrub_sec, 1)

        # MinHash LSH near-dup candidate generation over the full
        # REP'd corpus (every doc ~REP-way duplicated — the worst-case
        # collision load); packed band + pair-dedup exchanges
        from refimage_ray.stages.dedup_near import (
            lsh_candidate_pairs,
            minhash_band_rows,
        )

        tq = time.perf_counter()
        _bands = _corp.map_batches(minhash_band_rows, batch_format="pyarrow")
        n_cand = lsh_candidate_pairs(_bands, max_run=400).count()
        mh_sec = time.perf_counter() - tq
        timings["minhash_pairs_docs_per_sec"] = round(n_docs / mh_sec, 1)
        timings["minhash_candidate_pairs"] = int(n_cand)

    for name, fn in [
        ("term_stats", lambda: term_stats(SF_DIR).to_pandas()),
        ("tpch_q1", lambda: relational.tpch_q1(SF_DIR)),
        ("events_hourly", lambda: relational.events_hourly(SF_DIR)),
        ("knn_cosine", lambda: vectors.knn_cosine(SF_DIR)),
    ]:
        med, spread = _median3(fn)
        timings[name] = round(med, 3)
        timings[name + "_spread"] = round(spread, 3)

    out = {
        "metric": "index_build_sec",
        "value": round(build_sec, 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_docs": int(n_docs),
        "n_postings": int(res.metrics["n_postings"]),
        "docs_per_sec": round(n_docs / build_sec, 1),
        "postings_per_sec": round(res.metrics["n_postings"] / build_sec, 1),
        "query_p95_ms": round(p95 * 1000, 2),
        # where the build wall went (from the build's own metrics.json)
        "build_stages": {
            k: round(res.metrics[k], 3)
            for k in ("docs_write_sec", "dedup_sec", "stats_sec", "hot_sec",
                      "shuffle_build_sec", "reducer_wall_sec")
            if k in res.metrics
        },
        "shuffle_bytes": int(res.metrics.get("shuffle_bytes", 0)),
        # single-thread host-speed canary (see _host_canary): divide
        # wall times by (canary / historical canary) before comparing
        # rounds — the sandbox host speed varies several-fold
        "host_canary_sec": _host_canary(),
        "host_canary_mt16_sec": _host_canary_mt(16),
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    # --scaling defaults to REP=200 (1M docs) rather than the plain
    # bench's REP=50: the criterion is the 100-TB regime, where
    # constant costs (driver side passes, pool spin-up, warm-up) are
    # amortized — at REP=50 the build lasts ~6 s and constants dominate
    # both levels equally, measuring overhead rather than the engine.
    rep = os.environ.get("RAY_GRAFT_REP", "200")

    def run_once(ncpu: int) -> dict:
        # scaling compares the headline build across parallelism levels;
        # skip the docpart/QPS section so each level stays one job
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   RAY_GRAFT_REP=rep, REFIMAGE_BENCH_QPS="0",
                   REFIMAGE_BENCH_LITE="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def run(ncpu: int) -> dict:
        # best-of-2 with settle pauses: back-to-back Ray sessions on one
        # box contend on page-cache reclaim / object-store teardown and
        # inflate wall time by up to 40% — take the cleaner measurement.
        # RAY_GRAFT_BEST_OF=1 halves the pair's wall time so it fits
        # inside this host's short co-tenant-calm windows (each leg's
        # JSON carries its own host canaries, so a watcher can validate
        # the window instead of relying on repetition).
        best_of = int(os.environ.get("RAY_GRAFT_BEST_OF", "2"))
        settle = int(os.environ.get("RAY_GRAFT_SETTLE", "15"))
        best = None
        for _ in range(best_of):
            time.sleep(settle)  # let the previous session's teardown settle
            r = run_once(ncpu)
            if best is None or r["value"] < best["value"]:
                best = r
        return best

    # The N-vs-4N proxy pair is configurable: 8/32 is the headline;
    # 2/8 exercises the regime where per-core memory bandwidth is not
    # saturated (closer to a real N->4N NODE step, where bandwidth
    # grows with the cluster).
    lo_n = int(os.environ.get("RAY_GRAFT_SCALE_LO", "8"))
    hi_n = int(os.environ.get("RAY_GRAFT_SCALE_HI", "32"))
    lo, hi = run(lo_n), run(hi_n)
    eff = (lo["value"] / hi["value"]) / (hi_n / lo_n)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo_n,
        "cpus_hi": hi_n,
        "sec_lo": lo["value"],
        "sec_hi": hi["value"],
        "docs_per_sec_lo": lo["docs_per_sec"],
        "docs_per_sec_hi": hi["docs_per_sec"],
        "query_p95_ms_lo": lo["query_p95_ms"],
        "query_p95_ms_hi": hi["query_p95_ms"],
        "host_canary_sec_lo": lo.get("host_canary_sec"),
        "host_canary_sec_hi": hi.get("host_canary_sec"),
        "host_canary_mt16_sec_lo": lo.get("host_canary_mt16_sec"),
        "host_canary_mt16_sec_hi": hi.get("host_canary_mt16_sec"),
        # per-leg stage split — shows which stage carries any
        # non-scaling (Amdahl) component of the ratio
        "build_stages_lo": lo.get("build_stages", {}),
        "build_stages_hi": hi.get("build_stages", {}),
        "sf": SF_DIR,
        "n_docs": hi["n_docs"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
