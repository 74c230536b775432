"""Index-build job — the ``ray job submit`` entrypoint.

On a real multi-node cluster::

    ray job submit --working-dir /root/repo -- \
        python scripts/build_job.py --pages s3://bucket/pages \
        --index s3://bucket/index --num-shards 1024 --salt-buckets 16

In this sandbox (single node, no job server) the same script runs
directly; the pipeline is identical — streaming execution, packed
shuffle, per-partition checkpoints — so the job is resumable by simply
re-submitting it (completed partitions are skipped via the manifest).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--pages", required=True, help="pages parquet dir")
    p.add_argument("--index", required=True, help="output index dir")
    p.add_argument("--num-shards", type=int, default=128)
    p.add_argument("--salt-buckets", type=int, default=8)
    p.add_argument("--num-cpus", type=int,
                   default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    p.add_argument("--subranges", type=int, default=1,
                   help=">1: doc-range sub-builds + merge (the capacity "
                        "plan's >2M-reducer path; one would normally run "
                        "each sub-build as its own ray job)")
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        # on a cluster `ray job submit` pre-connects; locally init here
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 num_cpus=args.num_cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from refimage_ray.config import EngineConfig
    from refimage_ray.pipelines.flagship import build_from_pages

    cfg = EngineConfig(num_shards=args.num_shards,
                       salt_buckets=args.salt_buckets)
    if args.subranges > 1:
        from refimage_ray.index.lifecycle import build_subranges
        from refimage_ray.pipelines.flagship import docs_from_pages
        from refimage_ray.stages.dedup import exact_dedup

        # exact dedup must run GLOBALLY before the doc-range split —
        # duplicates cross range boundaries, and per-range builds
        # cannot see each other's content hashes
        docs = exact_dedup(docs_from_pages(args.pages))
        man = build_subranges(docs, args.index, cfg,
                              n_subranges=args.subranges)
        print(json.dumps(man["stats"]))
    else:
        res = build_from_pages(args.pages, args.index, cfg)
        print(json.dumps(res.metrics))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
