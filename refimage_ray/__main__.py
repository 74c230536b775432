"""CLI — build / search / explain / merge / delete / compact.

The user-facing surface analog of the reference's API endpoints
(``/root/reference/src/refimage/api.py``: ingest, search modes, CRUD,
conversions) as batch commands.  This module OWNS the Ray session
(guarded init — library code never calls ray.init).

Usage (from the repo root so Ray workers can import the package)::

    python -m refimage_ray build  --pages PAGES_DIR --index INDEX_DIR
    python -m refimage_ray build  --documents DOCS.parquet --index INDEX_DIR
    python -m refimage_ray search --index INDEX_DIR "spark join" -k 10
    python -m refimage_ray dsl    --index INDEX_DIR "spark AND join NOT slow #en"
    python -m refimage_ray explain "spark AND join"
    python -m refimage_ray delete --index INDEX_DIR --doc-ids 1,2,3
    python -m refimage_ray compact --index INDEX_DIR --out OUT_DIR
    python -m refimage_ray merge  --out OUT_DIR IDX1 IDX2 ...
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_up(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _is_docpart(index_dir: str) -> bool:
    """Route lifecycle subcommands by the artifact's manifest layout."""
    import json as _json
    import os as _os

    p = _os.path.join(index_dir, "manifest.json")
    if not _os.path.exists(p):
        return False
    with open(p) as f:
        return _json.load(f).get("layout") == "doc-partitioned"


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="refimage_ray")
    p.add_argument("--num-cpus", type=int, default=8)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an inverted index")
    src = b.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages", help="pages parquet dir (url/warc_ts/html/lang)")
    src.add_argument("--warc", help="WARC file dir (CC-style response records)")
    src.add_argument("--documents", help="documents parquet (doc_id/text)")
    b.add_argument("--index", required=True)
    b.add_argument("--num-shards", type=int, default=32)
    b.add_argument("--salt-buckets", type=int, default=8)
    b.add_argument("--term-filter", default="none",
                   help="analysis chain: post-tokenize term transform "
                        "(none | s_stem), persisted in the manifest")
    b.add_argument("--curate", action="store_true",
                   help="apply quality/lang gates in-flight before staging")
    b.add_argument("--curate-lang", default="en")
    b.add_argument("--curate-min-tokens", type=int, default=30)
    b.add_argument("--curate-min-stopword-ratio", type=float, default=0.04)

    s = sub.add_parser("search", help="BM25 top-k")
    s.add_argument("--index", required=True)
    s.add_argument("query")
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--threshold", type=float, default=0.0)
    s.add_argument("--mode", choices=["or", "and", "phrase"], default="or")
    s.add_argument("--join", action="store_true", help="join doc metadata")

    d = sub.add_parser("dsl", help="DSL query (AND/OR/NOT/#tag/^w)")
    d.add_argument("--index", required=True)
    d.add_argument("query")
    d.add_argument("--limit", type=int, default=10)
    d.add_argument("--threshold", type=float, default=0.0)

    pl = sub.add_parser("plan", help="capacity plan for a corpus x cluster")
    pl.add_argument("--n-docs", type=lambda s: int(float(s)), required=True,
                    help="accepts scientific notation, e.g. 1e12")
    pl.add_argument("--avg-doc-tokens", type=float, default=300.0)
    pl.add_argument("--nodes", type=int, default=1)
    pl.add_argument("--cpus-per-node", type=int, default=32)

    pm = sub.add_parser("plan-mixture", help="data-constrained token "
                        "allocation across domains (epoch caps + "
                        "water-filling)")
    pm.add_argument("--budget", type=float, required=True,
                    help="total training tokens")
    pm.add_argument("--domain", action="append", required=True,
                    metavar="NAME=TOKENS",
                    help="repeatable: available tokens per domain")
    pm.add_argument("--max-epochs", type=float, default=4.0)
    pm.add_argument("--alpha", type=float, default=1.0)

    e = sub.add_parser("explain", help="query → execution plan (no exec)")
    e.add_argument("query")
    e.add_argument("--num-shards", type=int, default=32)

    rm = sub.add_parser("delete", help="tombstone doc ids or a predicate")
    rm.add_argument("--index", required=True)
    rm.add_argument("--doc-ids", help="comma-separated doc ids")
    rm.add_argument("--where", help="doc-value predicate (retention/TTL), "
                                    "serve filter grammar: 'lang=en,doc_len<40'")

    c = sub.add_parser("compact", help="drop tombstones, refresh stats")
    c.add_argument("--index", required=True)
    c.add_argument("--out", required=True)

    ri = sub.add_parser("reindex", help="stream docs into a fresh build "
                                        "(optional predicate / new shards)")
    ri.add_argument("--index", required=True)
    ri.add_argument("--out", required=True)
    ri.add_argument("--where", help="doc-value predicate, serve filter "
                                    "grammar: 'lang=en,doc_len<40'")
    ri.add_argument("--num-shards", type=int,
                    help="re-shard the target (default: source config)")

    m = sub.add_parser("merge", help="merge same-config indexes")
    m.add_argument("--out", required=True)
    m.add_argument("inputs", nargs="+")

    tl = sub.add_parser("train-lm", help="train + persist the corpus "
                        "bigram LM under {index}/lm (phrase suggester / "
                        "perplexity serving loads it instead of retraining)")
    tl.add_argument("--index", required=True)
    tl.add_argument("--k", type=float, default=1.0,
                    help="add-k smoothing mass")
    tl.add_argument("--min-count", type=int, default=1,
                    help="prune unigrams rarer than this from the vocab")

    fs = sub.add_parser("fsck", help="verify artifact vs manifest")
    fs.add_argument("--index", required=True)
    fs.add_argument("--deep", action="store_true",
                    help="decode every posting list (distributed)")

    al = sub.add_parser("alias", help="named atomic pointers to artifacts")
    al.add_argument("action", choices=["set", "drop", "list", "resolve"])
    al.add_argument("--registry", required=True)
    al.add_argument("--name")
    al.add_argument("--index")

    sn = sub.add_parser("snapshot", help="checksummed artifact snapshot")
    sn.add_argument("--index", required=True)
    sn.add_argument("--out", required=True)

    rs = sub.add_parser("restore", help="verified restore of a snapshot")
    rs.add_argument("--snapshot", required=True)
    rs.add_argument("--out", required=True)
    rs.add_argument("--force", action="store_true")

    ro = sub.add_parser("rollover", help="generation/segment index groups "
                        "(ES rollover / ILM analog)")
    ro.add_argument("action",
                    choices=["ingest", "search", "prune", "status", "verify"])
    ro.add_argument("--deep", action="store_true",
                    help="verify: decode every posting list")
    ro.add_argument("--group", required=True, help="group root dir")
    ro.add_argument("--documents", help="parquet with (doc_id, text) to ingest")
    ro.add_argument("--max-docs", type=int, default=1_000_000,
                    help="seal a generation once it holds this many docs")
    ro.add_argument("--num-shards", type=int, default=8)
    ro.add_argument("--salt-buckets", type=int, default=4)
    ro.add_argument("--query", help="query for the search action")
    ro.add_argument("--k", type=int, default=10)
    ro.add_argument("--keep-last", type=int, default=1,
                    help="generations to keep for the prune action")

    pk = sub.add_parser("pack", help="write token-id training sequences")
    pk.add_argument("--documents", required=True,
                    help="parquet file/dir with (doc_id, text)")
    pk.add_argument("--out", required=True)
    pk.add_argument("--budget", type=int, default=2048)
    pk.add_argument("--seqs-per-file", type=int, default=4096)
    pk.add_argument("--index", default=None,
                    help="optional index dir: reuse its term vocab")
    pk.add_argument("--shuffle", action="store_true",
                    help="write in deterministic global-shuffle order")
    pk.add_argument("--seed", type=int, default=0,
                    help="shuffle permutation seed")

    ej = sub.add_parser("export-jsonl", help="corpus/match-set → resumable "
                        "partitioned JSONL (C4/Dolma delivery format)")
    ej.add_argument("--documents", help="parquet file/dir to export")
    ej.add_argument("--index", help="export a query's match set instead")
    ej.add_argument("--query", help="query (with --index)")
    ej.add_argument("--out", required=True)
    ej.add_argument("--key-col", default="doc_id")
    ej.add_argument("--n-files", type=int, default=64)
    ej.add_argument("--compress", action="store_true")

    qt = sub.add_parser("quantiles", help="exact quantiles of a numeric "
                        "column (distributed histogram bisection)")
    qt.add_argument("--input", required=True, help="parquet file/dir")
    qt.add_argument("--column", required=True)
    qt.add_argument("--q", type=float, nargs="+", default=[0.5, 0.9, 0.99])

    sv = sub.add_parser("serve", help="HTTP JSON API over an index")
    sv.add_argument("--index", help="artifact dir (or use --registry/--alias)")
    sv.add_argument("--registry", help="alias registry dir")
    sv.add_argument("--alias", help="alias name to resolve at boot")
    sv.add_argument("--port", type=int, default=8080)
    sv.add_argument("--actors", type=int, default=0,
                    help="0 = in-process searcher; N = shard actor pool")

    # env-settings layer (flag > env > default): REFIMAGE_RAY_* values
    # become parser DEFAULTS on every (sub)parser that has the dest —
    # an explicit flag still wins — and satisfy `required` flags the
    # way the reference's Settings provide path defaults.
    from refimage_ray.config import cli_env_defaults

    env_defaults = cli_env_defaults()
    if env_defaults:
        for sp in (p, b, s, d, pl, pm, e, rm, c, ri, m, tl, fs, al, sn,
                   rs, ro, pk, ej, qt, sv):
            hit = {}
            for a in sp._actions:
                if a.dest in env_defaults:
                    hit[a.dest] = env_defaults[a.dest]
                    a.required = False
            if hit:
                sp.set_defaults(**hit)

    args = p.parse_args(argv)

    if args.cmd == "alias":  # pure file ops, no Ray needed
        from refimage_ray.index.alias import (
            drop_alias, load_aliases, resolve_alias, set_alias,
        )

        if args.action == "list":
            print(json.dumps(load_aliases(args.registry), indent=1))
            return 0
        if not args.name:
            print(json.dumps({"error": "--name required"}))
            return 1
        if args.action == "resolve":
            try:
                print(json.dumps({"index": resolve_alias(args.registry,
                                                         args.name)}))
                return 0
            except KeyError as err:
                print(json.dumps({"error": str(err)}))
                return 1
        if args.action == "drop":
            ok = drop_alias(args.registry, args.name)
            print(json.dumps({"dropped": ok}))
            return 0 if ok else 1
        if not args.index:
            print(json.dumps({"error": "--index required for set"}))
            return 1
        set_alias(args.registry, args.name, args.index)
        print(json.dumps({"alias": args.name, "index": args.index}))
        return 0
    if args.cmd == "plan":  # pure arithmetic, no Ray needed
        from refimage_ray.planner import plan_build, plan_dict

        print(json.dumps(plan_dict(plan_build(
            args.n_docs, args.avg_doc_tokens,
            nodes=args.nodes, cpus_per_node=args.cpus_per_node,
        )), indent=1))
        return
    if args.cmd == "plan-mixture":  # pure arithmetic, no Ray needed
        from refimage_ray.planner import plan_mixture

        domains = {}
        for spec in args.domain:
            name, _, tok = spec.partition("=")
            if not tok:
                print(json.dumps({"error": f"--domain needs NAME=TOKENS, "
                                           f"got {spec!r}"}))
                return 1
            try:
                domains[name] = float(tok)
            except ValueError:
                print(json.dumps({"error": f"--domain TOKENS must be "
                                           f"numeric, got {spec!r}"}))
                return 1
        print(json.dumps(plan_mixture(
            args.budget, domains,
            max_epochs=args.max_epochs, alpha=args.alpha,
        ), indent=1))
        return 0
    if args.cmd == "explain":  # driver-only, no Ray needed
        from refimage_ray.extension import explain

        print(json.dumps(explain(args.query, num_shards=args.num_shards), indent=1))
        return 0

    _ray_up(args.num_cpus)
    import ray

    try:
        if args.cmd == "build":
            from refimage_ray.config import engine_config_from_env

            # fresh build: env layer first (covers fields without a
            # dedicated flag: k1/b/store_positions/...), flags on top
            cfg = engine_config_from_env().with_(
                num_shards=args.num_shards, salt_buckets=args.salt_buckets,
                term_filter=args.term_filter
            )
            if args.pages or args.warc:
                from refimage_ray.pipelines.flagship import build_from_pages

                curate = None
                if args.curate:
                    curate = {
                        "lang": args.curate_lang,
                        "min_tokens": args.curate_min_tokens,
                        "min_stopword_ratio": args.curate_min_stopword_ratio,
                    }
                # task-pool extract default (build_from_pages docstring)
                res = build_from_pages(
                    args.pages or args.warc, args.index, cfg, curate=curate,
                    source="warc" if args.warc else "parquet",
                )
            else:
                import ray.data as rd

                from refimage_ray.index.build import build_index

                docs = rd.read_parquet(args.documents)
                if args.curate:
                    # same in-flight gate as the pages path (documents
                    # already carry doc ids, so the gate uses them)
                    from refimage_ray.pipelines.flagship import (
                        apply_curation_gate,
                    )

                    docs = apply_curation_gate(docs, {
                        "lang": args.curate_lang,
                        "min_tokens": args.curate_min_tokens,
                        "min_stopword_ratio": args.curate_min_stopword_ratio,
                    })
                res = build_index(docs, args.index, cfg,
                                  lineage=[{"path": args.documents}])
            print(json.dumps(res.metrics, indent=1))
        elif args.cmd == "search":
            from refimage_ray.query.engine import LocalSearcher, lookup_docs

            searcher = LocalSearcher(args.index)
            if args.mode == "phrase":
                hits = searcher.search_phrase(args.query, k=args.k,
                                              threshold=args.threshold)
            else:
                hits = searcher.search(args.query, k=args.k,
                                       threshold=args.threshold, mode=args.mode)
            out = [{"doc_id": d, "score": s} for d, s in hits]
            if args.join and hits:
                meta = lookup_docs(args.index, [d for d, _ in hits]).to_pylist()
                by_id = {r["doc_id"]: r for r in meta}
                for row in out:
                    row.update(by_id.get(row["doc_id"], {}))
            print(json.dumps(out, indent=1, default=str))
        elif args.cmd == "dsl":
            from refimage_ray.query.dsl import DSLExecutor
            from refimage_ray.query.engine import LocalSearcher

            ex = DSLExecutor(LocalSearcher(args.index))
            hits = ex.execute_query(args.query, limit=args.limit,
                                    threshold=args.threshold)
            print(json.dumps([{"doc_id": d, "score": s} for d, s in hits], indent=1))
        elif args.cmd == "delete":
            from refimage_ray.index.lifecycle import delete_docs, delete_docs_where

            if bool(args.doc_ids) == bool(args.where):
                print(json.dumps(
                    {"error": "exactly one of --doc-ids / --where"}))
                return 1
            if args.where:
                from refimage_ray.serve import parse_filter

                n = delete_docs_where(args.index, parse_filter(args.where))
                print(json.dumps({"deleted": n}))
            else:
                ids = [int(x) for x in args.doc_ids.split(",") if x]
                print(json.dumps({"tombstones": delete_docs(args.index, ids)}))
        elif args.cmd == "compact":
            from refimage_ray.config import EngineConfig
            from refimage_ray.index.lifecycle import compact_index
            from refimage_ray.index.manifest import load_manifest

            if _is_docpart(args.index):
                from refimage_ray.index.docpart_lifecycle import compact_docpart

                out = compact_docpart(args.index, args.out)
            else:
                man = load_manifest(args.index)
                cfg = EngineConfig(
                    num_shards=int(man["config"]["num_shards"]),
                    salt_buckets=int(man["config"]["salt_buckets"]),
                )
                out = compact_index(args.index, args.out, cfg)
            print(json.dumps(out["stats"]))
        elif args.cmd == "reindex":
            from refimage_ray.config import EngineConfig
            from refimage_ray.index.lifecycle import reindex
            from refimage_ray.index.manifest import load_manifest

            where = None
            if args.where:
                from refimage_ray.serve import parse_filter

                where = parse_filter(args.where)
            cfg = None
            if args.num_shards:
                man = load_manifest(args.index)
                cfg = EngineConfig(
                    **{**man["config"], "num_shards": int(args.num_shards)}
                )
            out = reindex(args.index, args.out, cfg, where=where)
            print(json.dumps(out.manifest["stats"]))
        elif args.cmd == "merge":
            from refimage_ray.config import EngineConfig
            from refimage_ray.index.lifecycle import merge_indexes
            from refimage_ray.index.manifest import load_manifest

            if _is_docpart(args.inputs[0]):
                from refimage_ray.index.docpart_lifecycle import (
                    merge_docpart_indexes,
                )

                out = merge_docpart_indexes(args.inputs, args.out)
            else:
                man = load_manifest(args.inputs[0])
                cfg = EngineConfig(
                    num_shards=int(man["config"]["num_shards"]),
                    salt_buckets=int(man["config"]["salt_buckets"]),
                )
                out = merge_indexes(args.inputs, args.out, cfg)
            print(json.dumps(out["stats"]))
        elif args.cmd == "train-lm":
            import os as _os

            from refimage_ray.config import engine_config_from_manifest
            from refimage_ray.index.manifest import load_manifest
            from refimage_ray.index.reader import staged_docs
            from refimage_ray.stages.lm import save_bigram_lm, train_bigram_lm

            man = load_manifest(args.index) or {}
            lm = train_bigram_lm(
                staged_docs(args.index, columns=["doc_id", "text"]),
                engine_config_from_manifest(man.get("config", {})),
                k=args.k, min_count=args.min_count,
            )
            out = save_bigram_lm(lm, _os.path.join(args.index, "lm"))
            print(json.dumps({"lm_dir": out, "n_vocab": lm.vocab_size,
                              "n_bigrams": int(len(lm.bigram_keys))}))
            return 0
        elif args.cmd == "fsck":
            from refimage_ray.index.fsck import verify_index

            rep = verify_index(args.index, deep=args.deep)
            print(json.dumps(rep, indent=1))
            return 0 if rep["ok"] else 1
        elif args.cmd == "snapshot":
            from refimage_ray.index.snapshot import snapshot_index

            man = snapshot_index(args.index, args.out)
            print(json.dumps({"ok": True, "files": len(man["files"])}))
            return 0
        elif args.cmd == "restore":
            from refimage_ray.index.snapshot import restore_index

            print(json.dumps(restore_index(args.snapshot, args.out,
                                           force=args.force)))
            return 0
        elif args.cmd == "export-jsonl":
            import ray.data as rd

            from refimage_ray.pipelines.export import export_jsonl

            if args.index and args.query:
                from refimage_ray.pipelines.export import matches_dataset

                src = matches_dataset(args.index, args.query)
            elif args.documents:
                src = rd.read_parquet(args.documents)
            else:
                print(json.dumps({"error": "--documents or --index+--query "
                                           "required"}))
                return 1
            print(json.dumps(export_jsonl(
                src, args.out, args.key_col,
                n_files=args.n_files, compress=args.compress,
            )))
            return 0
        elif args.cmd == "quantiles":
            import ray.data as rd

            from refimage_ray.stages.selection import quantiles_exact

            t = quantiles_exact(
                rd.read_parquet(args.input, columns=[args.column]),
                args.column, tuple(args.q),
            )
            print(json.dumps(dict(zip(
                [f"q{q:g}" for q in t["q"].to_pylist()],
                t["value"].to_pylist(),
            ))))
            return 0
        elif args.cmd == "rollover":
            from refimage_ray.index import rollover as ro_mod

            if args.action == "ingest":
                import ray.data as rd

                from refimage_ray.config import EngineConfig

                if not args.documents:
                    print(json.dumps({"error": "--documents required"}))
                    return 1
                cfg = (None if ro_mod.group_parts(args.group)
                       else EngineConfig(num_shards=args.num_shards,
                                         salt_buckets=args.salt_buckets))
                docs = rd.read_parquet(args.documents,
                                       columns=["doc_id", "text"])
                print(json.dumps(ro_mod.ingest(args.group, docs, cfg,
                                               max_docs=args.max_docs)))
            elif args.action == "search":
                if not args.query:
                    print(json.dumps({"error": "--query required"}))
                    return 1
                hits = ro_mod.group_searcher(args.group).search(
                    args.query, k=args.k)
                print(json.dumps(
                    [{"doc_id": d, "score": s} for d, s in hits], indent=1))
            elif args.action == "verify":
                rep = ro_mod.verify_group(args.group, deep=args.deep)
                print(json.dumps({"ok": rep["ok"],
                                  "parts": len(rep["parts"]),
                                  "problems": rep["problems"]}, indent=1))
                return 0 if rep["ok"] else 1
            elif args.action == "prune":
                dropped = ro_mod.prune_generations(args.group,
                                                   keep_last=args.keep_last)
                print(json.dumps({"dropped": dropped}))
            else:  # status
                gens = ro_mod.generations(args.group)
                print(json.dumps({
                    "generations": [
                        {"dir": g,
                         "sealed": ro_mod._is_sealed(g),
                         "docs": ro_mod._gen_docs(g)}
                        for g in gens
                    ],
                    "parts": ro_mod.group_parts(args.group),
                }, indent=1))
            return 0
        elif args.cmd == "pack":
            import ray.data as rd

            from refimage_ray.stages.packing import (
                vocab_from_index, write_packed_sequences,
            )

            docs = rd.read_parquet(args.documents, columns=["doc_id", "text"])
            vocab = vocab_from_index(args.index) if args.index else None
            man = write_packed_sequences(
                docs, args.out, budget=args.budget,
                seqs_per_file=args.seqs_per_file, vocab=vocab,
                order="shuffled" if args.shuffle else "stream",
                seed=args.seed,
            )
            print(json.dumps({"files": len(man["files"]),
                              "skipped": len(man["skipped_existing"]),
                              "budget": man["budget"],
                              "order": man["order"]}))
        elif args.cmd == "serve":
            from refimage_ray.serve import make_server

            if args.alias or args.registry:
                if not (args.alias and args.registry):
                    print(json.dumps({"error": "--alias needs --registry"}))
                    return 1
                from refimage_ray.index.alias import resolve_alias

                args.index = resolve_alias(args.registry, args.alias)
            elif not args.index:
                print(json.dumps({"error": "--index or --registry/--alias"}))
                return 1

            # a factory (not a bare instance) so POST /reload rebuilds
            # the SAME deployment kind — distributed stays distributed.
            # The actor-pool flavor routes by artifact layout, same as
            # the in-process default in make_server.
            if args.actors:
                if _is_docpart(args.index):
                    from refimage_ray.index.docpart import (
                        DistributedDocPartSearcher,
                    )

                    def searcher_factory(_index=args.index, _n=args.actors):
                        s = DistributedDocPartSearcher(_index, num_actors=_n)
                        s.wait_ready()
                        return s
                else:
                    from refimage_ray.query.engine import DistributedSearcher

                    def searcher_factory(_index=args.index, _n=args.actors):
                        s = DistributedSearcher(_index, num_actors=_n)
                        s.wait_ready()
                        return s
            else:
                searcher_factory = None
            srv = make_server(args.index, port=args.port,
                              searcher_factory=searcher_factory)
            print(json.dumps({"listening": srv.server_address[1]}))
            srv.serve_forever()
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
