"""Relational pipelines over the TPC-H-ish driver tables.

These exercise the engine's general dataflow operators (groupby
aggregates with partial/final split, sorts, top-k, broadcast joins,
window-style time bucketing) against DuckDB SQL oracles.  Reference
analogs: the SQL aggregate/pagination surface of the metadata store
(``/root/reference/src/refimage/storage.py:353-437,714-745``).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum


def _t(sf_dir: str, name: str, columns=None) -> "rd.Dataset":
    return rd.read_parquet(
        os.path.join(sf_dir, f"{name}.parquet"), columns=columns
    )


def tpch_q1(sf_dir: str) -> pa.Table:
    """TPC-H Q1 pricing summary (filter → computed cols → grouped sums;
    avgs derived from sums for float determinism)."""
    cutoff = pa.scalar(np.datetime64("1998-09-02", "us"))

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less_equal(b["l_shipdate"], cutoff))
        disc_price = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        )
        charge = pc.multiply(disc_price, pc.add(pa.scalar(1.0), b["l_tax"]))
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "qty": b["l_quantity"],
                "base": b["l_extendedprice"],
                "disc_price": disc_price,
                "charge": charge,
                "disc": b["l_discount"],
            }
        )

    agg = (
        _t(sf_dir, "lineitem",
           ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_shipdate"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("base", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Sum("charge", alias_name="sum_charge"),
            Sum("disc", alias_name="sum_disc"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
    )
    agg["avg_qty"] = (agg["sum_qty"] / agg["count_order"]).round(4)
    agg["avg_price"] = (agg["sum_base_price"] / agg["count_order"]).round(4)
    agg["avg_disc"] = (agg["sum_disc"] / agg["count_order"]).round(4)
    # whole-unit rounding: distributed vs sequential float summation
    # differs by ~1e-5 absolute on 1e10-magnitude sums; a 0.01 quantum
    # makes boundary flips likely at scale, a 1.0 quantum does not
    for c in ("sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"):
        agg[c] = agg[c].round(0)
    agg = agg.drop(columns=["sum_disc"]).sort_values(
        ["l_returnflag", "l_linestatus"]
    )
    return pa.Table.from_pandas(agg, preserve_index=False)


def top_customers(sf_dir: str, n: int = 10) -> pa.Table:
    """Revenue top-n: wide groupby on orders, then a broadcast join of
    the tiny winner set against the customer dimension (no shuffle
    join — SURVEY.md §2.4 J1 pattern)."""
    from refimage_ray.stages.dedup_near import collect_small

    def partial_top(b: pd.DataFrame) -> pd.DataFrame:
        # per-block top-n: only n rows per block ever leave a worker,
        # so the driver-side final merge sees <= n * n_blocks rows no
        # matter how many customers exist
        return b.sort_values(
            ["total_spent", "o_custkey"], ascending=[False, True],
            kind="mergesort",
        ).head(n)

    spend_partials = (
        _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .groupby("o_custkey")
        .aggregate(Sum("o_totalprice", alias_name="total_spent"),
                   Count(alias_name="n_orders"))
        .map_batches(partial_top, batch_format="pandas")
    )
    spend = (
        collect_small(
            spend_partials,
            pa.schema([("o_custkey", pa.int64()), ("total_spent", pa.float64()),
                       ("n_orders", pa.int64())]),
        )
        .to_pandas()
        .sort_values(["total_spent", "o_custkey"], ascending=[False, True],
                     kind="mergesort")
        .head(n)
    )
    cust = (
        _t(sf_dir, "customer", ["c_custkey", "c_name"])
        .map_batches(
            lambda b: b.filter(
                pc.is_in(b["c_custkey"],
                         value_set=pa.array(spend["o_custkey"].tolist()))
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    out = spend.merge(cust, left_on="o_custkey", right_on="c_custkey")
    out["total_spent"] = out["total_spent"].round(2)
    out = out[["c_custkey", "c_name", "n_orders", "total_spent"]].sort_values(
        ["total_spent", "c_custkey"], ascending=[False, True], kind="mergesort"
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def orders_by_status(sf_dir: str) -> "rd.Dataset":
    return (
        _t(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
        .groupby("o_orderstatus")
        .aggregate(Count(alias_name="n_orders"))
    )


def events_hourly(sf_dir: str) -> pa.Table:
    """Tumbling 1-hour windows per event type (streaming-shaped op on
    a batch engine: event-time bucketing inside map_batches, then a
    grouped aggregate — ray_guide 'streaming-shaped workloads')."""

    def bucket(b: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(b["ts"], unit="hour")
        return pa.table(
            {"event_type": b["event_type"], "hour": hour, "value": b["value"]}
        )

    out = (
        _t(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(bucket, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    out["sum_value"] = out["sum_value"].round(4)
    out = out.sort_values(["event_type", "hour"])
    return pa.Table.from_pandas(out, preserve_index=False)


def events_hopping(
    sf_dir: str, window_minutes: int = 60, hop_minutes: int = 30
) -> pa.Table:
    """HOPPING (sliding/overlapping) event-time windows — the remaining
    classic window shape next to tumbling/session/rolling: window
    length L, hop H < L, so each event lands in L/H windows.  The
    expansion happens INSIDE map_batches (each row emits its L/H
    window-start keys, vectorized via one np.repeat/tile — never a
    driver loop), then one grouped aggregate over (type, window_start).
    Mirrored in SQL by a generate_series lateral join."""
    assert window_minutes % hop_minutes == 0, "L must be a multiple of H"
    k = window_minutes // hop_minutes
    hop_us = hop_minutes * 60_000_000
    win_us = window_minutes * 60_000_000

    def expand(b: pa.Table) -> pa.Table:
        ts = (
            b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        # last window start containing ts, then k hops backward
        last = (ts // hop_us) * hop_us
        starts = last[:, None] - np.arange(k, dtype=np.int64)[None, :] * hop_us
        keep = (starts.ravel() + win_us) > np.repeat(ts, k)  # ts ∈ [s, s+L)
        idx = np.repeat(np.arange(len(ts), dtype=np.int64), k)[keep]
        et = b["event_type"].to_numpy(zero_copy_only=False)
        val = b["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": pa.array(et[idx], pa.string()),
            "window_start": pa.array(starts.ravel()[keep],
                                     pa.timestamp("us")),
            "value": pa.array(val[idx], pa.float64()),
        })

    out = (
        _t(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(expand, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"),
                   Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    out["sum_value"] = out["sum_value"].round(4)
    out = out.sort_values(["event_type", "window_start"])
    return pa.Table.from_pandas(out, preserve_index=False)


def events_funnel(
    sf_dir: str, steps: tuple = ("view", "click", "purchase")
) -> pa.Table:
    """Ordered funnel conversion: how many users completed step 1,
    then step 2 STRICTLY AFTER their first step-1 event, and so on
    (the classic product-analytics funnel).  Per-user work is one
    in-group sort + a vectorized first-occurrence walk; the exchange
    is ONE user-keyed groupby emitting a single depth row per user.
    SQL mirror: nested min-ts-after-previous-step subqueries."""
    step_list = list(steps)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        et = g["event_type"].to_numpy()
        ts = g["ts"].to_numpy()
        depth = 0
        cur = None  # ts of the previous completed step
        for s in step_list:
            m = (et == s) if cur is None else ((et == s) & (ts > cur))
            if not m.any():
                break
            cur = ts[m].min()
            depth += 1
        return pd.DataFrame({"depth": [depth]})

    depths = (
        _t(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .to_pandas()["depth"]
        .to_numpy()
    )
    # users at step i = users whose depth >= i (cumulative from the top)
    n_at = [(depths >= i).sum() for i in range(1, len(step_list) + 1)]
    return pa.table({
        "step": pa.array(step_list, pa.string()),
        "step_idx": pa.array(range(1, len(step_list) + 1), pa.int64()),
        "n_users": pa.array([int(x) for x in n_at], pa.int64()),
    })


def events_cohort_retention(sf_dir: str, max_weeks: int = 8) -> pa.Table:
    """Weekly cohort retention matrix: users grouped by their FIRST
    activity week (Monday-aligned), counted in each later week they
    were active — (cohort_week, week_offset, n_users).  Per-user work
    is one distinct-week set; the exchange is user-keyed.  SQL mirror:
    date_trunc('week') + min-over-user + offset join."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        days = g["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        weeks = np.unique((((days + 3) // 7) * 7 - 3))  # Monday-aligned
        cohort = int(weeks.min())
        off = ((weeks - cohort) // 7).astype(np.int64)
        off = off[off < max_weeks]
        return pd.DataFrame({
            "cohort_days": np.full(len(off), cohort, np.int64),
            "week_offset": off,
        })

    out = (
        _t(sf_dir, "events", ["user_id", "ts"])
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .groupby(["cohort_days", "week_offset"])
        .aggregate(Count(alias_name="n_users"))
        .to_pandas()
        .sort_values(["cohort_days", "week_offset"])
    )
    out["cohort_week"] = (
        out["cohort_days"].to_numpy().astype("datetime64[D]")
        .astype("datetime64[us]")
    )
    out = out[["cohort_week", "week_offset", "n_users"]]
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False)


def events_user_stats(sf_dir: str) -> "rd.Dataset":
    """Per-user event stats incl. distinct-type count (map_groups for
    the non-algebraic distinct aggregate)."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_events": [len(g)],
                "n_types": [g["event_type"].nunique()],
                "sum_value": [round(float(g["value"].sum()), 4)],
            }
        )

    return (
        _t(sf_dir, "events", ["user_id", "event_type", "value"])
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
    )


def order_revenue_by_priority(sf_dir: str, buckets: int = 32) -> pa.Table:
    """Large-large join (lineitem ⋈ orders on orderkey) via the explicit
    bucketed hash join (stages/joins.py), then a grouped revenue sum."""
    from refimage_ray.stages.joins import hash_join

    joined = hash_join(
        _t(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]),
        _t(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]),
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_cols=["l_orderkey", "l_extendedprice", "l_discount"],
        right_cols=["o_orderkey", "o_orderpriority"],
        buckets=buckets,
    )

    def revenue(b: pa.Table) -> pa.Table:
        rev = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        )
        return pa.table({"o_orderpriority": b["o_orderpriority"], "rev": rev})

    out = (
        joined.map_batches(revenue, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_items"), Sum("rev", alias_name="rev_sum"))
        .to_pandas()
    )
    out["total_revenue"] = out["rev_sum"].round(0)  # whole units: see tpch_q1 note
    out = out.drop(columns=["rev_sum"]).sort_values("o_orderpriority")
    return pa.Table.from_pandas(out, preserve_index=False)


def tpch_q3(sf_dir: str, segment: str = "BUILDING",
            cutoff: str = "1996-06-01", k: int = 10) -> pa.Table:
    """TPC-H Q3 shipping priority (3-table join → per-order revenue →
    top-k).  Plan: customer filtered to the segment joins orders via
    the bucketed hash join (both sides scale with the corpus — no
    broadcast), the result joins lineitem the same way, revenue
    pre-aggregates per (orderkey, orderdate) and the final top-k is a
    distributed sort + limit (never a driver sort).  Ties break
    (revenue desc, o_orderdate asc, l_orderkey asc) for determinism —
    mirrored in the oracle."""
    from refimage_ray.stages.joins import hash_join

    cut = pa.scalar(np.datetime64(cutoff, "us"))
    cust = (
        _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .map_batches(
            lambda b: b.filter(pc.equal(b["c_mktsegment"], segment))
            .select(["c_custkey"]),
            batch_format="pyarrow",
        )
    )
    orders = (
        _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(
            lambda b: b.filter(pc.less(b["o_orderdate"], cut)),
            batch_format="pyarrow",
        )
    )
    co = hash_join(
        orders, cust,
        left_on="o_custkey", right_on="c_custkey",
        left_cols=["o_orderkey", "o_custkey", "o_orderdate"],
        right_cols=["c_custkey"],
    )
    li = (
        _t(sf_dir, "lineitem",
           ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])
        .map_batches(
            lambda b: b.filter(pc.greater(b["l_shipdate"], cut)),
            batch_format="pyarrow",
        )
    )
    j = hash_join(
        li, co,
        left_on="l_orderkey", right_on="o_orderkey",
        left_cols=["l_orderkey", "l_extendedprice", "l_discount"],
        right_cols=["o_orderkey", "o_orderdate"],
    )

    def rev(b: pa.Table) -> pa.Table:
        r = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        )
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "o_orderdate": b["o_orderdate"],
            "rev": r,
        })

    top = (
        j.map_batches(rev, batch_format="pyarrow")
        .groupby(["l_orderkey", "o_orderdate"])
        .aggregate(Sum("rev", alias_name="rev_sum"))
        .map_batches(
            # half-AWAY cents rounding (floor(x·100 + 0.5)/100), matching
            # DuckDB round(); pc.round is half-even and can differ by a
            # cent on exact .xx5 revenues (caught at sf0.001)
            lambda b: b.append_column(
                "revenue",
                pc.divide(
                    pc.floor(pc.add(pc.multiply(b["rev_sum"], 100.0), 0.5)),
                    100.0,
                ),
            ).drop_columns(["rev_sum"]),
            batch_format="pyarrow",
        )
        .sort(["revenue", "o_orderdate", "l_orderkey"],
              descending=[True, False, False])
        .limit(k)
        .to_pandas()
    )
    # tiny corpora: empty pandas blocks in the sort degrade int64 →
    # float64 (observed at sf0.001); restore the key dtype explicitly
    top["l_orderkey"] = top["l_orderkey"].astype("int64")
    return pa.Table.from_pandas(
        top[["l_orderkey", "revenue", "o_orderdate"]], preserve_index=False
    )


def tpch_q5(sf_dir: str, region: str = "ASIA",
            year_start: str = "1996-01-01",
            year_end: str = "1997-01-01") -> pa.Table:
    """TPC-H Q5 local-supplier volume (6-table join).  Plan: the
    dimension chain region→nation→supplier collapses to TWO broadcast
    arrays (nation-key → name, supp-key → nation-key — suppliers are
    the small side by TPC-H construction); customer⋈orders and
    (c⋈o)⋈lineitem run as bucketed hash joins; the local-supplier
    predicate (customer nation == supplier nation) and the name lookup
    are one vectorized map; the final rollup is a nation-sized
    groupby."""
    from refimage_ray.stages.joins import hash_join

    lo = pa.scalar(np.datetime64(year_start, "us"))
    hi = pa.scalar(np.datetime64(year_end, "us"))

    nation = _t(sf_dir, "nation").to_pandas()
    region_t = _t(sf_dir, "region").to_pandas()
    asia_keys = set(
        nation.merge(region_t, left_on="n_regionkey", right_on="r_regionkey")
        .query("r_name == @region")["n_nationkey"]
    )
    n_names = dict(zip(nation["n_nationkey"], nation["n_name"]))
    supp = _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    max_supp = int(supp["s_suppkey"].max())
    supp_nat = np.full(max_supp + 1, -1, np.int64)
    supp_nat[supp["s_suppkey"].to_numpy()] = supp["s_nationkey"].to_numpy()

    import ray

    side = ray.put((supp_nat, asia_keys, n_names))

    orders = (
        _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(
            lambda b: b.filter(pc.and_(
                pc.greater_equal(b["o_orderdate"], lo),
                pc.less(b["o_orderdate"], hi),
            )).select(["o_orderkey", "o_custkey"]),
            batch_format="pyarrow",
        )
    )
    co = hash_join(
        orders,
        _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        left_on="o_custkey", right_on="c_custkey",
        left_cols=["o_orderkey", "o_custkey"],
        right_cols=["c_custkey", "c_nationkey"],
    )
    j = hash_join(
        _t(sf_dir, "lineitem",
           ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]),
        co,
        left_on="l_orderkey", right_on="o_orderkey",
        left_cols=["l_orderkey", "l_suppkey", "l_extendedprice",
                   "l_discount"],
        right_cols=["o_orderkey", "c_nationkey"],
    )

    def local_rev(b: pa.Table) -> pa.Table:
        s_nat_arr, asia, names = ray.get(side)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        s_nat = s_nat_arr[sk]
        c_nat = b["c_nationkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        keep = (s_nat == c_nat) & np.isin(
            s_nat, np.fromiter(asia, np.int64, len(asia))
        )
        rev = (
            b["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - b["l_discount"].to_numpy(zero_copy_only=False))
        )
        name = [names.get(int(x), "") for x in s_nat[keep]]
        return pa.table({
            "n_name": pa.array(name, pa.string()),
            "rev": pa.array(rev[keep], pa.float64()),
        })

    out = (
        j.map_batches(local_rev, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("rev", alias_name="rev_sum"))
        .to_pandas()
    )
    out["revenue"] = out["rev_sum"].round(0)  # whole units: see tpch_q1 note
    out = out.drop(columns=["rev_sum"]).sort_values(
        "revenue", ascending=False
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def events_value_quantiles(
    sf_dir: str, qs: tuple = (0.5, 0.9, 0.99)
) -> pa.Table:
    """Exact quantiles of the unbounded double ``value`` column via
    iterative histogram bisection (``stages/selection.py`` — one
    B-int64 row per block per round, a handful of rounds).  The result
    is the exact rank-``ceil(q·n)`` element, so the oracle is plain
    ``ORDER BY value LIMIT 1 OFFSET k-1`` SQL."""
    from refimage_ray.stages.selection import quantiles_exact

    return quantiles_exact(
        _t(sf_dir, "events", ["value"]), "value", tuple(qs)
    )


def doc_sample(sf_dir: str, rate: float = 0.2) -> "rd.Dataset":
    """Deterministic hash-based sample (no RNG → stable across runs and
    cluster sizes; the same multiplicative-hash mask the index build
    uses for hot-term estimation, and SQL-expressible for the oracle)."""
    threshold = np.int64(int(rate * 4294967296.0))

    def mask(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
        return b.filter(pa.array(h < np.uint64(threshold)))

    return (
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "lang"])
        .map_batches(mask, batch_format="pyarrow")
    )


def events_rolling_avg(sf_dir: str, window: int = 3) -> "rd.Dataset":
    """Rolling mean per user over event time (windowed aggregate as
    groupby + in-group sort + pandas rolling; SQL window-fn oracle)."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort").reset_index(drop=True)
        g["rolling_avg"] = (
            g["value"].rolling(window, min_periods=1).mean().round(4)
        )
        return g[["user_id", "event_id", "ts", "rolling_avg"]]

    return (
        _t(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
    )


#: size-class interval table (lo inclusive, hi exclusive) — the small
#: side of the range join; a real pipeline ships this via the task
#: closure exactly like a blocklist.
SIZE_CLASSES: tuple[tuple[int, int, str], ...] = (
    (0, 10, "small"),
    (10, 25, "mid"),
    (25, 51, "large"),
)


def part_size_class(sf_dir: str) -> "rd.Dataset":
    """RANGE JOIN (prompt's custom-operator list): join each part to
    the interval table containing its ``p_size``.  Small interval
    side → broadcast the sorted breakpoints once and classify with one
    ``np.searchsorted`` per batch (no shuffle); rows falling in no
    interval are dropped (inner-join semantics).  Aggregated per class
    so the oracle is compact."""
    los = np.array([c[0] for c in SIZE_CLASSES], np.int64)
    his = np.array([c[1] for c in SIZE_CLASSES], np.int64)
    names = np.array([c[2] for c in SIZE_CLASSES])

    def classify(b: pa.Table) -> pa.Table:
        size = b["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(los, size, side="right") - 1
        ok = (idx >= 0) & (size < his[np.clip(idx, 0, len(his) - 1)])
        idx = idx[ok]
        return pa.table(
            {
                "size_class": pa.array(names[idx]),
                "p_retailprice": pa.array(
                    b["p_retailprice"].to_numpy(zero_copy_only=False)[ok],
                    pa.float64(),
                ),
            }
        )

    out = (
        _t(sf_dir, "part", ["p_size", "p_retailprice"])
        .map_batches(classify, batch_format="pyarrow")
        .groupby("size_class")
        .aggregate(
            Count(alias_name="n_parts"),
            Sum("p_retailprice", alias_name="sum_price"),
        )
    )

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "size_class": b["size_class"],
                "n_parts": pc.cast(b["n_parts"], pa.int64()),
                "avg_price": pc.round(
                    pc.divide(b["sum_price"], pc.cast(b["n_parts"], pa.float64())),
                    ndigits=4,
                ),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow")


def events_asof_last(sf_dir: str, match_type: str = "click") -> "rd.Dataset":
    """AS-OF join (strictly-prior, per key): for every event, the ts
    and value of the SAME user's most recent earlier ``match_type``
    event — the point-in-time lookup primitive (prompt's custom-
    operator list: "as-of join").  Self-join flavor keeps the times
    genuinely interleaved on the synthetic data.

    Shape: partition by key (one groupby), sort within group by
    (ts, event_id), then a vectorized carry —
    ``np.maximum.accumulate`` over match positions shifted by one, so
    the match is STRICTLY prior (an event never joins itself).
    Partitioning assumption: one user's events fit one group (same as
    sessionize); the key-partitioned as-of generalizes to two tables
    by tagging sides and carrying only the right side's last row.
    """

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort").reset_index(drop=True)
        n = len(g)
        is_m = (g["event_type"] == match_type).to_numpy()
        carry = np.where(is_m, np.arange(n), -1)
        carry = np.maximum.accumulate(carry)
        prior = np.concatenate(([-1], carry[:-1]))  # strictly prior
        has = prior >= 0
        prev_ts = np.full(n, np.datetime64("NaT", "us"))
        prev_val = np.full(n, np.nan)
        ts = g["ts"].to_numpy()
        val = g["value"].to_numpy()
        prev_ts[has] = ts[prior[has]]
        prev_val[has] = val[prior[has]]
        return pd.DataFrame(
            {
                "user_id": g["user_id"],
                "event_id": g["event_id"],
                "ts": g["ts"],
                "prev_ts": prev_ts,
                "prev_value": np.round(prev_val, 4),
            }
        )

    return (
        _t(sf_dir, "events", ["user_id", "event_id", "ts", "event_type", "value"])
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
    )


def events_user_lag(sf_dir: str) -> "rd.Dataset":
    """LAG/LEAD window functions per user: each event with the
    previous and next event's value and the seconds since the previous
    event — the remaining classic window primitive next to sessionize /
    rolling / as-of.  Same partitioning shape (one groupby, in-group
    mergesort by (ts, event_id), vectorized shifts)."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort").reset_index(
            drop=True
        )
        val = g["value"].to_numpy()
        ts = g["ts"].to_numpy()
        prev_val = np.concatenate(([np.nan], val[:-1]))
        next_val = np.concatenate((val[1:], [np.nan]))
        gap = np.full(len(g), np.nan)
        if len(g) > 1:
            gap[1:] = (ts[1:] - ts[:-1]) / np.timedelta64(1, "s")
        return pd.DataFrame({
            "user_id": g["user_id"],
            "event_id": g["event_id"],
            "prev_value": np.round(prev_val, 4),
            "next_value": np.round(next_val, 4),
            "gap_seconds": np.round(gap, 6),
        })

    return (
        _t(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
    )


def events_sessionize(sf_dir: str, gap_minutes: int = 30) -> "rd.Dataset":
    """Session windows per user (gap-based): the classic stream-shaped
    op on a batch engine — partition by key, sort by event time within
    the group, split sessions at gaps > ``gap_minutes``
    (ray_guide 'streaming-shaped workloads'; ordering assumption: all
    of a user's events fit one group, sorted in-group by ts)."""
    gap = np.timedelta64(gap_minutes * 60, "s")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="mergesort").reset_index(drop=True)
        ts = g["ts"].to_numpy()
        new_sess = np.ones(len(g), dtype=np.int64)
        if len(g) > 1:
            new_sess[1:] = (ts[1:] - ts[:-1]) > gap
        session_id = np.cumsum(new_sess)
        g["session_id"] = session_id
        out = (
            g.groupby("session_id", sort=True)
            .agg(
                n_events=("ts", "size"),
                start_ts=("ts", "min"),
                end_ts=("ts", "max"),
                sum_value=("value", "sum"),
            )
            .reset_index()
        )
        out.insert(0, "user_id", int(g["user_id"].iloc[0]))
        out["n_events"] = out["n_events"].astype("int64")
        out["sum_value"] = out["sum_value"].round(4)
        return out

    return (
        _t(sf_dir, "events", ["user_id", "ts", "value"])
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
    )


def part_brand_stats(sf_dir: str) -> pa.Table:
    out = (
        _t(sf_dir, "part", ["p_brand", "p_retailprice", "p_size"])
        .groupby("p_brand")
        .aggregate(
            Count(alias_name="n_parts"),
            Sum("p_retailprice", alias_name="sum_price"),
            Max("p_size", alias_name="max_size"),
            Min("p_size", alias_name="min_size"),
        )
        .to_pandas()
    )
    out["avg_price"] = (out["sum_price"] / out["n_parts"]).round(4)
    out = out.drop(columns=["sum_price"]).sort_values("p_brand")
    return pa.Table.from_pandas(out, preserve_index=False)


def nation_region_join(sf_dir: str) -> pa.Table:
    """Dimension-dimension broadcast join (both tiny): nations per region."""
    region = {
        r["r_regionkey"]: r["r_name"]
        for r in _t(sf_dir, "region").take_all()
    }
    region_ref = ray.put(region)

    def attach(b: pa.Table) -> pa.Table:
        reg = ray.get(region_ref)
        names = [reg.get(k) for k in b["n_regionkey"].to_pylist()]
        return b.append_column("r_name", pa.array(names, pa.string()))

    out = (
        _t(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
        .map_batches(attach, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Count(alias_name="n_nations"))
        .to_pandas()
        .sort_values("r_name")
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def orders_priority_filter(sf_dir: str) -> "rd.Dataset":
    """Predicate filter (vectorized inside map_batches) + grouped count."""

    def flt(b: pa.Table) -> pa.Table:
        keep = pc.equal(b["o_orderstatus"], "F")
        return b.filter(keep)

    return (
        _t(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])
        .map_batches(flt, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_orders"))
    )


# ---------------------------------------------------------------------------
# rollup index (pre-aggregated time series + raw tail)
# ---------------------------------------------------------------------------


def _rollup_dir_for(sf_dir: str) -> str:
    import hashlib

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return f"/tmp/refimage_ray_cache/{tag}/events-rollup-v1"


def build_events_rollup(sf_dir: str, cutoff_us: int, out_dir: str) -> str:
    """Persist hourly (event_type, hour) partials for events BEFORE the
    hour-aligned ``cutoff_us`` — the ES rollup-index analog: old data
    is served from the compact pre-aggregate, only the recent tail is
    scanned raw.  Written with a _SUCCESS marker + cutoff sidecar so
    consumers can trust it and re-builds are idempotent."""
    import json as _json
    import shutil as _shutil

    marker = os.path.join(out_dir, "_SUCCESS")
    meta_p = os.path.join(out_dir, "rollup.json")
    if os.path.exists(marker):
        with open(meta_p) as f:
            if _json.load(f)["cutoff_us"] == cutoff_us:
                return out_dir
        _shutil.rmtree(out_dir)
    elif os.path.exists(out_dir):
        _shutil.rmtree(out_dir)  # interrupted build → start clean

    def bucket_old(b: pa.Table) -> pa.Table:
        keep = pc.less(pc.cast(b["ts"], pa.int64()), cutoff_us)
        b = b.filter(keep)
        return pa.table(
            {
                "event_type": b["event_type"],
                # µs unit on BOTH rollup and tail sides so the union's
                # block schemas agree (floor_temporal returns the input
                # unit, parquet round-trips can downcast)
                "hour": pc.cast(
                    pc.floor_temporal(b["ts"], unit="hour"),
                    pa.timestamp("us"),
                ),
                "value": b["value"],
            }
        )

    (
        _t(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(bucket_old, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
        .write_parquet(os.path.join(out_dir, "data"))  # sidecars live above
    )
    with open(meta_p, "w") as f:
        _json.dump({"cutoff_us": cutoff_us}, f)
    with open(marker, "w") as f:
        f.write("")
    return out_dir


def events_hourly_rollup(sf_dir: str) -> pa.Table:
    """``events_hourly`` served lambda-style: hours before the cutoff
    come from the persisted rollup artifact, the recent tail is
    aggregated raw, and the two sides union through one final combine
    groupby.  The cutoff is hour-aligned, so no window spans both
    sides and the result is EXACT — the oracle is the plain hourly
    aggregate over the whole table (same SQL as ``events_hourly``)."""
    # deterministic hour-aligned cutoff at ~70% of the time range
    rng = _t(sf_dir, "events", ["ts"]).aggregate(Min("ts"), Max("ts"))
    lo = int(pa.scalar(rng["min(ts)"]).cast(pa.int64()).as_py())
    hi = int(pa.scalar(rng["max(ts)"]).cast(pa.int64()).as_py())
    hour_us = 3_600_000_000
    cutoff_us = (lo + int(0.7 * (hi - lo))) // hour_us * hour_us
    roll_dir = build_events_rollup(sf_dir, cutoff_us, _rollup_dir_for(sf_dir))

    rolled = rd.read_parquet(
        os.path.join(roll_dir, "data"),
        columns=["event_type", "hour", "n_events", "sum_value"],
    ).map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("hour"), "hour",
            pc.cast(b["hour"], pa.timestamp("us")),
        ),
        batch_format="pyarrow",
    )

    def bucket_tail(b: pa.Table) -> pa.Table:
        keep = pc.greater_equal(pc.cast(b["ts"], pa.int64()), cutoff_us)
        b = b.filter(keep)
        return pa.table(
            {
                "event_type": b["event_type"],
                "hour": pc.cast(
                    pc.floor_temporal(b["ts"], unit="hour"),
                    pa.timestamp("us"),
                ),
                "value": b["value"],
            }
        )

    tail = (
        _t(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(bucket_tail, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )
    out = (
        rolled.union(tail)
        .groupby(["event_type", "hour"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value", alias_name="sum_value"),
        )
        .to_pandas()
    )
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = out["sum_value"].round(4)
    out = out.sort_values(["event_type", "hour"])
    return pa.Table.from_pandas(out, preserve_index=False)


def customer_order_counts_left(sf_dir: str) -> "rd.Dataset":
    """LEFT OUTER join breadth: every customer with their order count,
    zero-order customers included (count 0) — the bucketed distributed
    hash join (``stages/joins.py``) in its outer mode; the orders side
    is pre-aggregated to one row per customer BEFORE the join, so the
    exchange carries |customers| rows, not |orders|."""
    from refimage_ray.stages.joins import hash_join

    per_cust = (
        _t(sf_dir, "orders", ["o_custkey"])
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n_orders"))
    )
    joined = hash_join(
        _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"]),
        per_cust,
        left_on="c_custkey",
        right_on="o_custkey",
        left_cols=["c_custkey", "c_mktsegment"],
        right_cols=["o_custkey", "n_orders"],  # key must ride along
        buckets=16,
        how="left",
    )

    def fill(b: pa.Table) -> pa.Table:
        n = pc.fill_null(pc.cast(b["n_orders"], pa.int64()), 0)
        return pa.table(
            {
                "c_custkey": b["c_custkey"],
                "c_mktsegment": b["c_mktsegment"],
                "n_orders": n,
            }
        )

    return joined.map_batches(fill, batch_format="pyarrow")


def events_value_median(sf_dir: str) -> pa.Table:
    """Exact per-type interpolated median (SQL ``quantile_cont``):
    non-algebraic, so it runs as a per-group sort inside map_groups —
    groups here are event types (few, large); the bounded-int exact
    path for corpus quantiles is ``doc_len_quantiles``."""

    def med(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["value"].to_numpy(np.float64))
        h = (len(v) - 1) * 0.5
        lo = int(np.floor(h))
        m = v[lo] + (h - lo) * (v[min(lo + 1, len(v) - 1)] - v[lo])
        return pd.DataFrame(
            {"event_type": [g["event_type"].iloc[0]],
             "median_value": [round(float(m), 6)]}
        )

    out = (
        _t(sf_dir, "events", ["event_type", "value"])
        .groupby("event_type")
        .map_groups(med, batch_format="pandas")
        .to_pandas()
        .sort_values("event_type")
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def event_transition_pagerank(sf_dir: str) -> pa.Table:
    """PageRank over the user-journey transition graph: within each
    user's time-ordered event stream, consecutive events contribute a
    (type → type) edge; ``stages/graph.pagerank_distributed`` then
    ranks event types by stationary visit probability.  VALUE-oracled:
    the 20-step damped power iteration is unrolled as chained
    materialized CTEs in DuckDB (``__ray_entry__._pagerank_sql``) —
    and pytest-verified against numpy power iteration and the
    broadcast variant.  Uses the distributed-rank-state path — no
    driver-side node state — so the external check certifies the
    web-scale variant."""
    from refimage_ray.stages.graph import pagerank_distributed

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        t = g["event_type"].to_numpy()
        if len(t) < 2:
            return pd.DataFrame({"src": [], "dst": []})
        return pd.DataFrame({"src": t[:-1], "dst": t[1:]})

    edges = (
        _t(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
    )
    ranked = pagerank_distributed(edges, damping=0.85, iters=20,
                                  buckets=8, round_digits=None)
    # event-type node set is tiny — driver-side sort of the REDUCED
    # result only, on UNROUNDED ranks (rank desc, node asc: same order
    # as the broadcast variant's stable argsort over name-sorted
    # nodes), rounding at the API boundary AFTER the sort so near-tie
    # rows order identically across variants
    from refimage_ray.stages.dedup_near import collect_small

    t = collect_small(ranked, pa.schema([("node", pa.string()),
                                         ("rank", pa.float64())]))
    order = pc.sort_indices(
        t, sort_keys=[("rank", "descending"), ("node", "ascending")]
    )
    t = t.take(order)
    return t.set_column(
        t.schema.get_field_index("rank"), "rank",
        pc.round(t["rank"], ndigits=9),
    )


def table_profile_lineitem(sf_dir: str) -> pa.Table:
    """Deequ-style per-column profile of the widest driver table:
    counts, nulls, exact distincts, numeric min/max/mean — see
    ``stages/profile.profile_table`` for the two narrow passes."""
    from refimage_ray.stages.profile import profile_table

    cols = [
        "l_orderkey", "l_quantity", "l_extendedprice",
        "l_returnflag", "l_linestatus", "l_shipdate",
    ]
    ds = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=cols)
    return profile_table(ds, cols)


def tpch_q6(sf_dir: str) -> pa.Table:
    """TPC-H Q6 forecasting-revenue change: one vectorized filter +
    sum — the no-shuffle aggregate shape (revenue rounded to the unit,
    the Q1 float-determinism quantum)."""
    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))

    def prep(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(b["l_shipdate"], lo),
                pc.less(b["l_shipdate"], hi),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(b["l_discount"], pa.scalar(0.05)),
                    pc.less_equal(b["l_discount"], pa.scalar(0.07)),
                ),
                pc.less(b["l_quantity"], pa.scalar(24.0)),
            ),
        )
        b = b.filter(m)
        return pa.table(
            {"rev": pc.multiply(b["l_extendedprice"], b["l_discount"])}
        )

    agg = (
        _t(sf_dir, "lineitem",
           ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])
        .map_batches(prep, batch_format="pyarrow")
        .aggregate(Sum("rev", alias_name="revenue"))
    )
    rev = agg["revenue"]  # None when the filter matches nothing
    # empty SUM is NULL in SQL — mirror the oracle, don't invent 0.0
    return pa.table(
        {
            "revenue": pa.array(
                [float(round(float(rev))) if rev is not None else None],
                pa.float64(),
            )
        }
    )


def orders_late_shipment_priority(sf_dir: str) -> pa.Table:
    """TPC-H Q4 (priority checking), adapted to the driver schema: the
    stock Q4 tests l_commitdate < l_receiptdate, columns this lineitem
    lacks — the EXISTS predicate here is "some line item shipped >= 30
    days after the order date" (same join/semi-join shape).  Counted
    per o_orderpriority for Q1-1996 orders (the driver corpus spans
    1995-2001, not the stock 1992-1998).

    Shape: large-large bucketed hash join (orders ⋈ lineitem on
    orderkey), vectorized lateness filter, then the EXISTS collapse as
    a (orderkey, priority) groupby — two narrow exchanges, no
    driver-side row loops.
    """
    from refimage_ray.stages.joins import hash_join

    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1996-04-01", "us"))

    def o_prep(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(b["o_orderdate"], lo),
            pc.less(b["o_orderdate"], hi),
        )
        return b.filter(m)

    orders = _t(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(o_prep, batch_format="pyarrow")
    items = _t(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    joined = hash_join(
        orders, items,
        left_on="o_orderkey", right_on="l_orderkey",
        left_cols=["o_orderkey", "o_orderdate", "o_orderpriority"],
        right_cols=["l_orderkey", "l_shipdate"],
    )
    late_us = 30 * 86_400_000_000  # 30 days in microseconds

    def late(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"].cast(pa.int64())
        od = b["o_orderdate"].cast(pa.int64())
        keep = pc.greater_equal(pc.subtract(ship, od), pa.scalar(late_us))
        b = b.filter(keep)
        return b.select(["o_orderkey", "o_orderpriority"])

    per_order = (
        joined.map_batches(late, batch_format="pyarrow")
        .groupby(["o_orderkey", "o_orderpriority"])
        .aggregate(Count(alias_name="_n"))
    )
    counts = (
        per_order.groupby("o_orderpriority")
        .aggregate(Count(alias_name="order_count"))
        .to_pandas()
    )
    if "o_orderpriority" not in counts.columns:  # empty-Dataset quirk
        return pa.table(
            {
                "o_orderpriority": pa.array([], pa.string()),
                "order_count": pa.array([], pa.int64()),
            }
        )
    counts = counts.sort_values("o_orderpriority").reset_index(drop=True)
    counts["order_count"] = counts["order_count"].astype("int64")
    return pa.Table.from_pandas(counts, preserve_index=False)
