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

Scale note: the rank vector is node-count floats held on the driver
between iterations (8 B/node — 1e9 nodes = 8 GB: the documented limit
of this variant; past that, ranks join the edges through a bucketed
hash join instead of a broadcast).

Reference analog: none — the reference has no iterative operator; this
fills SURVEY §2's "iterative algorithms" class.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data.aggregate import Sum


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
