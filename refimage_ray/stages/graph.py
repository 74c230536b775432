"""Iterative graph algorithms over edge Datasets (PageRank).

The engine's iterative-dataflow pattern: per iteration, ranks are a
broadcast (``ray.put`` once, read in every task — never re-shipped per
batch), contributions are a vectorized ``map_batches`` over the edge
list, and the only wide step is one ``groupby(dst).sum`` whose output
is node-count rows.  The edge list itself never moves between
iterations (same Dataset re-scanned; at 100 TB you'd materialize the
bucketed edge list once and reuse it).

Semantics: the classic damped PageRank
``r' = (1-d)/N + d·(Σ_in r/outdeg + dangling_mass/N)`` with dangling
mass redistributed uniformly — the update is synchronous (power
iteration), so the numpy reference in tests matches to float epsilon.

Two variants share the semantics:

- :func:`pagerank` — ranks broadcast from the driver (8 B/node; the
  documented bound is graphs whose NODE set fits driver memory, e.g.
  the event-type transition graph).  Fastest at small node counts.
- :func:`pagerank_distributed` — ranks live as a Dataset keyed by
  node; each iteration joins contributions through the repo's bucketed
  ``stages/joins.hash_join`` and the driver only ever holds per-
  iteration SCALARS (N, dangling mass, rank delta).  This is the
  web-scale link-graph path (10⁹+ nodes): no driver-side node state,
  no ``take_all`` — asserted by a poisoned-collect test.

Reference analog: none — the reference has no iterative operator; this
fills SURVEY §2's "iterative algorithms" class.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data.aggregate import Sum


@ray.remote(num_cpus=0)
class _EdgeBucketRegistry:
    """Owner + map of the staged per-bucket edge pieces.

    Staging workers ``ray.put(piece, _owner=registry)`` — the bytes
    stay in the CREATING worker's local object store (no data flows
    through this actor), but ownership transfers here so pieces
    survive worker churn for the whole power iteration.  The actor
    itself only holds the {bucket: [refs]} map."""

    def __init__(self) -> None:
        self._refs: dict[int, list] = {}

    def set(self, bucket: int, wrapped_refs: list) -> None:
        # refs arrive WRAPPED in a list: a bare ObjectRef argument
        # would be auto-dereferenced by Ray's arg resolution.
        # SET, not append: a staging task retry (worker death, lost
        # block reconstruction) re-registers the same whole bucket and
        # must overwrite, not double-count its edges
        self._refs[int(bucket)] = list(wrapped_refs)

    def refs(self) -> dict:
        return self._refs


def pagerank(
    edges_ds,
    damping: float = 0.85,
    iters: int = 20,
    src_col: str = "src",
    dst_col: str = "dst",
) -> pa.Table:
    """PageRank over an edge Dataset → (node, rank) Arrow table.

    Nodes are the union of sources and destinations (computed
    distributed, once).  Parallel edges count with multiplicity.
    """
    # node universe + out-degrees: one pass, two narrow groupbys
    def ends(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        pc.cast(b[src_col], pa.string()).combine_chunks(),
                        pc.cast(b[dst_col], pa.string()).combine_chunks(),
                    ]
                )
            }
        )

    node_rows = (
        edges_ds.map_batches(ends, batch_format="pyarrow")
        .groupby("node")
        .count()
        .take_all()
    )
    nodes = np.array(sorted(r["node"] for r in node_rows), dtype=object)
    n = len(nodes)
    if n == 0:
        return pa.table({"node": pa.array([], pa.string()),
                         "rank": pa.array([], pa.float64())})

    def deg_partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = (
            pa.table({"src": pc.cast(b[src_col], pa.string())})
            .group_by("src")
            .aggregate([([], "count_all")])
        )
        return pa.table({"src": g["src"],
                         "deg": pc.cast(g["count_all"], pa.int64())})

    deg_rows = (
        edges_ds.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("src")
        .aggregate(Sum("deg", alias_name="deg"))
        .take_all()
    )
    outdeg = np.zeros(n, dtype=np.float64)
    node_index = {node: i for i, node in enumerate(nodes)}
    for r in deg_rows:
        outdeg[node_index[r["src"]]] = r["deg"]

    nodes_arr = pa.array(list(nodes), pa.string())
    ranks = np.full(n, 1.0 / n, dtype=np.float64)
    for _ in range(iters):
        dangling = float(ranks[outdeg == 0].sum())
        share = np.zeros(n, dtype=np.float64)
        nz = outdeg > 0
        share[nz] = ranks[nz] / outdeg[nz]
        state = ray.put((nodes_arr, share))

        def contrib(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            nd, sh = ray.get(state)
            src = pc.index_in(
                pc.cast(b[src_col], pa.string()), value_set=nd
            ).to_numpy(zero_copy_only=False)
            dst = pc.cast(b[dst_col], pa.string())
            g = (
                pa.table({"dst": dst, "c": pa.array(sh[src], pa.float64())})
                .group_by("dst")
                .aggregate([("c", "sum")])
            )
            return pa.table({"dst": g["dst"], "c": g["c_sum"]})

        rows = (
            edges_ds.map_batches(contrib, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("c", alias_name="c"))
            .take_all()
        )
        incoming = np.zeros(n, dtype=np.float64)
        for r in rows:
            incoming[node_index[r["dst"]]] = r["c"]
        ranks = (1.0 - damping) / n + damping * (incoming + dangling / n)

    order = np.argsort(-ranks, kind="stable")
    return pa.table(
        {
            "node": pa.array([nodes[i] for i in order], pa.string()),
            "rank": pa.array(np.round(ranks[order], 9), pa.float64()),
        }
    )


def pagerank_distributed(
    edges_ds,
    damping: float = 0.85,
    iters: int = 20,
    src_col: str = "src",
    dst_col: str = "dst",
    tol: float | None = None,
    buckets: int = 32,
    round_digits: "int | None" = 9,
):
    """PageRank with DISTRIBUTED rank state → (node, rank) Dataset.

    Bit-for-bit semantics of :func:`pagerank` (synchronous damped power
    iteration, uniform dangling redistribution, parallel-edge
    multiplicity) but ranks never leave the cluster: they are a
    materialized Dataset of (node, outdeg, rank) rows, contributions
    flow through ``hash_join(edges, share)`` + a ``groupby(node)``
    sum, and the update is a left join back onto the rank table.  The
    driver holds only scalars — node count, dangling mass, and (when
    ``tol`` is set) the L1 rank delta used for early convergence.

    Floats: distributed summation order differs from the numpy
    reference, so ranks match to ~1e-12 relative, not bit-exactly —
    same contract as :func:`pagerank`'s groupby sums.

    Scale notes: the edge list is staged ONCE into per-bucket
    object-store pieces keyed by hash(src) (worker-local ``ray.put``
    with ownership transferred to a registry actor); each iteration
    exchanges only the node-count share table into those buckets and
    joins per bucket against the resident pieces.  Per-iteration
    shuffle volume is therefore O(nodes) — edge bytes move at most
    once at staging and never again.  ``tol`` adds one narrow
    aggregate per iteration.  Partitioning assumption: a bucket's
    edge pieces plus its share slice fit one task's memory (tune
    ``buckets`` to the graph).
    """
    import pyarrow.compute as _pc

    from refimage_ray.stages.joins import hash_join

    # one materialization: iterations re-read blocks, never re-run the
    # upstream edge derivation (lazy Datasets re-execute per consume).
    # Node ids normalize to STRING here so every downstream join /
    # union side agrees on key dtype (int64 edge columns would
    # otherwise meet the string `node` column in hash_join).
    def _norm_edges(b: pa.Table) -> pa.Table:
        return pa.table({
            src_col: _pc.cast(b[src_col], pa.string()),
            dst_col: _pc.cast(b[dst_col], pa.string()),
        })

    edges = edges_ds.map_batches(
        _norm_edges, batch_format="pyarrow"
    ).materialize()

    def ends(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "node": pa.concat_arrays([
                pc.cast(b[src_col], pa.string()).combine_chunks(),
                pc.cast(b[dst_col], pa.string()).combine_chunks(),
            ])
        })

    nodes_ds = (
        edges.map_batches(ends, batch_format="pyarrow")
        .groupby("node").count().drop_columns(["count()"])
        .materialize()
    )
    n = nodes_ds.count()
    if n == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "rank": pa.array([], pa.float64()),
        }))

    def deg_partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = (
            pa.table({"src": pc.cast(b[src_col], pa.string())})
            .group_by("src").aggregate([([], "count_all")])
        )
        return pa.table({"src": g["src"],
                         "deg": pc.cast(g["count_all"], pa.int64())})

    deg_ds = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("src").aggregate(Sum("deg", alias_name="deg"))
    )

    r0 = 1.0 / n

    def init_rank(df):
        out = df[["node"]].copy()
        out["outdeg"] = df["deg"].fillna(0).astype("int64")
        out["rank"] = r0
        return out

    ranks = (
        hash_join(nodes_ds, deg_ds, left_on="node", right_on="src",
                  left_cols=["node"], right_cols=["src", "deg"],
                  buckets=buckets, how="left")
        .map_batches(init_rank, batch_format="pandas")
        .materialize()
    )

    # ---- bucket-persistent edge staging --------------------------------
    # The contribution join used to re-bucket the MATERIALIZED edge
    # list through hash_join's groupby exchange every iteration — an
    # all-to-all of edge rows per iteration.  The edge list now
    # crosses an exchange exactly ONCE, at staging: a groupby(bucket)
    # co-locates each hash(src) bucket whole, and the per-bucket task
    # ray.put's the bucket table in place (ownership transferred to a
    # zero-cpu registry actor so pieces outlive worker churn) and
    # REGISTERS IT WITH SET SEMANTICS — a Ray task retry re-stages the
    # same whole bucket and overwrites, so edges cannot be
    # double-counted (an append-based registry would).  Each iteration
    # then exchanges only the NARROW share table (node-count rows)
    # into the same buckets and joins per bucket against the resident
    # pieces: per-iteration shuffle volume is O(nodes), not O(edges).
    registry = _EdgeBucketRegistry.remote()
    # ray.put(_owner=...) needs a STARTED actor; block until the
    # registry is alive before any staging task runs
    ray.get(registry.refs.remote())

    try:
        def add_eb(b: pa.Table) -> pa.Table:
            from refimage_ray.stages.joins import bucket_of

            eb = np.asarray(bucket_of(b[src_col], buckets))
            return b.append_column("eb", pa.array(eb, pa.int64()))

        def stage_bucket(g: pa.Table) -> pa.Table:
            if g.num_rows == 0:
                return pa.table({"eb": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            v = int(g["eb"][0].as_py())
            piece = g.select([src_col, dst_col]).combine_chunks()
            ref = ray.put(piece, _owner=registry)
            ray.get(registry.set.remote(v, [ref]))
            return pa.table({"eb": pa.array([v], pa.int64()),
                             "n": pa.array([g.num_rows], pa.int64())})

        def stage_all():
            """Run the staging pipeline over the materialized edges and
            broadcast the fresh {bucket: [refs]} map once (one small
            handle per task instead of re-serializing the ref map into
            every closure).  Idempotent — the registry's set semantics
            overwrite whole buckets — so it doubles as the recovery
            path: staged pieces are ``ray.put`` objects and thus NOT
            lineage-reconstructable (unlike Dataset blocks); if the
            node holding a piece dies mid-power-iteration the consumer
            raises ``ObjectLostError`` and the loop below re-stages
            everything from ``edges`` exactly once before retrying."""
            (
                edges.map_batches(add_eb, batch_format="pyarrow")
                .groupby("eb")
                .map_groups(stage_bucket, batch_format="pyarrow")
                .sum("n")
            )
            return ray.put(ray.get(registry.refs.remote()))

        pieces_handle = stage_all()

        _CONTRIB_SCHEMA = pa.schema([
            ("node", pa.string()), ("outdeg", pa.int64()),
            ("rank", pa.float64()), ("c", pa.float64()),
            ("upd_bucket", pa.int64()),
        ])

        def share_map(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            m = pc.greater(b["outdeg"], 0)
            t = b.filter(m)
            return pa.table({
                "node": t["node"],
                "share": pc.divide(
                    t["rank"], pc.cast(t["outdeg"], pa.float64())),
            })

        def dangling_partial(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            s = pc.sum(b.filter(pc.equal(b["outdeg"], 0))["rank"])
            return pa.table({"d": pa.array(
                [float(s.as_py() or 0.0)], pa.float64())})

        # The per-iteration contribution sum and the rank update share the
        # SAME key (node), so they fuse into ONE exchange: rank rows and
        # per-batch pre-aggregated contribution rows union into a unified
        # (node, outdeg, rank, c) stream bucketed by hash(node), and one
        # map_groups both sums c and applies the update — two all-to-alls
        # per iteration total (edge×share join, fused update), the minimum
        # for join-based PR, instead of three.
        def _node_bucket(arr: pa.Array) -> pa.Array:
            from refimage_ray.stages.joins import bucket_of

            return pa.array(bucket_of(arr, buckets), pa.int64())

        def rank_rows(b: pa.Table) -> pa.Table:
            nr = b.num_rows
            return pa.table({
                "node": b["node"], "outdeg": b["outdeg"], "rank": b["rank"],
                "c": pa.nulls(nr, pa.float64()),
                "upd_bucket": _node_bucket(b["node"]),
            })

        def add_share_bucket(b: pa.Table) -> pa.Table:
            return b.append_column("sb", _node_bucket(b["node"]))

        def contrib_bucket(g: pa.Table) -> pa.Table:
            """One share bucket × its resident edge pieces → per-dst
            contribution partials (unified update-stream rows)."""
            if g.num_rows == 0:
                return _CONTRIB_SCHEMA.empty_table()
            sb = int(g["sb"][0].as_py())
            piece_refs = ray.get(pieces_handle).get(sb)
            if not piece_refs:
                return _CONTRIB_SCHEMA.empty_table()
            ed = pa.concat_tables(ray.get(piece_refs)).to_pandas()
            sh = g.select(["node", "share"]).to_pandas()
            m = ed.merge(sh, left_on=src_col, right_on="node", how="inner")
            if not len(m):
                return _CONTRIB_SCHEMA.empty_table()
            cs = m.groupby(dst_col, sort=False)["share"].sum()
            nodes_out = pa.array(cs.index.to_numpy(dtype=object), pa.string())
            nr = len(cs)
            return pa.table({
                "node": nodes_out,
                "outdeg": pa.nulls(nr, pa.int64()),
                "rank": pa.nulls(nr, pa.float64()),
                "c": pa.array(cs.to_numpy(np.float64), pa.float64()),
                "upd_bucket": _node_bucket(nodes_out),
            })

        for _ in range(iters):
            for attempt in (0, 1):
                try:
                    dangling = (
                        ranks.map_batches(dangling_partial,
                                          batch_format="pyarrow")
                        .sum("d")
                    ) or 0.0
                    base = (1.0 - damping) / n + damping * dangling / n
                    contribs = (
                        ranks.map_batches(share_map, batch_format="pyarrow")
                        .map_batches(add_share_bucket,
                                     batch_format="pyarrow")
                        .groupby("sb")
                        .map_groups(contrib_bucket, batch_format="pyarrow")
                    )

                    def apply_update(g, base=base):
                        import pandas as pd

                        rows = g[g["outdeg"].notna()]
                        csum = g.groupby("node", sort=False)["c"].sum()
                        new = base + damping * rows["node"].map(
                            csum).fillna(0.0)
                        out = pd.DataFrame({
                            "node": rows["node"],
                            "outdeg": rows["outdeg"].astype("int64"),
                            "delta": (new - rows["rank"]).abs(),
                            "rank": new,
                        })
                        # Arrow block out: the per-iteration rebase below
                        # hands blocks over zero-copy via to_arrow_refs
                        return pa.Table.from_pandas(
                            out, preserve_index=False)

                    new_ranks = (
                        ranks.map_batches(rank_rows, batch_format="pyarrow")
                        .union(contribs)
                        .groupby("upd_bucket")
                        .map_groups(apply_update, batch_format="pandas")
                        # the union's block lists would otherwise COMPOUND
                        # across iterations (≈2× per iteration — measured
                        # 1→191 blocks in 7 iterations); cap the rank
                        # table at `buckets` blocks so per-iteration cost
                        # stays flat
                        .repartition(buckets)
                        .materialize()
                    )
                    break
                except ray.exceptions.ObjectLostError:
                    # a staged edge piece died with its node (ray.put
                    # objects are not lineage-reconstructable, unlike
                    # the old per-iteration hash_join's blocks).  ranks
                    # was NOT clobbered, so re-stage every bucket from
                    # the materialized edges dataset once and retry
                    # this iteration; a second loss surfaces loudly.
                    # (RayTaskError subclasses its cause, so this
                    # catches the worker-side raise too.)
                    if attempt:
                        raise
                    pieces_handle = stage_all()
            ranks = new_ranks
            # rebase onto the materialized block refs (zero-copy): the
            # Dataset stats/plan parent chain otherwise grows by one link
            # per iteration and the recursive stats summary overflows the
            # Python stack after ~50 iterations
            import ray.data as rd

            ranks = rd.from_arrow_refs(ranks.to_arrow_refs())
            if tol is not None and (ranks.sum("delta") or 0.0) < tol:
                break

    finally:
        # the final result depends only on the materialized rank
        # blocks (driver-owned); killing the registry releases every
        # staged edge piece whether the run completed or raised
        # mid-iteration — without this, a failed run pins the full
        # edge copy in the object store for the driver's lifetime
        ray.kill(registry)


    def final(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        r = b["rank"]
        if round_digits is not None:
            # API-boundary rounding (parity with :func:`pagerank`);
            # pass round_digits=None to keep full precision — e.g. to
            # sort on UNROUNDED ranks exactly like the broadcast
            # variant before rounding for display
            r = pc.round(r, ndigits=round_digits)
        return pa.table({"node": b["node"], "rank": r})

    return ranks.map_batches(final, batch_format="pyarrow")
