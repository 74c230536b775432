"""Regression tests for the round-2 self-review findings (the batch
over commits 7aa03ee..HEAD): percentile NaN rank-basis unification,
canonical_tree_sum single upstream execution, profile distinct-count
key discipline, empty-aggregate SQL NULL semantics, lexical-stats
null encoding, composite-cursor arity, and plan-mixture CLI parse."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd


def test_numeric_values_drops_nan_unifying_percentile_paths():
    """The capped gather path and the above-cap bisection fallback must
    use ONE rank basis: numeric_values excludes NaN VALUES (not just
    nulls), same as stages/selection's valid-only rule."""
    from refimage_ray.index.docvalues import (
        DocValues, DVColumn, select_percentiles,
    )

    vals = np.array([1.0, np.nan, 2.0, np.nan, 3.0, 4.0])
    dv = DocValues(
        all_ids=np.arange(6, dtype=np.int64),
        cols={"x": DVColumn(values=vals)},
    )
    ranks = np.arange(6, dtype=np.int64)
    got = dv.numeric_values("x", ranks)
    np.testing.assert_array_equal(np.sort(got), [1.0, 2.0, 3.0, 4.0])
    # rank-ceil(q*n) over the valid-only basis: n=4, q=0.5 -> rank 2
    assert select_percentiles(got, [0.5]) == [(0.5, 2.0)]
    # and the max percentile is the max VALID value, never NaN
    assert select_percentiles(got, [1.0]) == [(1.0, 4.0)]


def test_canonical_tree_sum_executes_upstream_once(ray_session, tmp_path):
    """count() + take_all() on a lazy Dataset used to run the upstream
    map twice per reduce (2x every GD / k-means iteration).  The map fn
    drops a marker file per invocation; the total must equal the block
    count, not double it."""
    from refimage_ray.functions.arrays import canonical_tree_sum

    marker_dir = str(tmp_path / "exec_markers")
    os.makedirs(marker_dir)
    tbl = pa.table({"n": pa.array([1] * 40, pa.int64()),
                    "v": pa.array([0.5] * 40, pa.float64())})

    def partial(b: pa.Table, _d=marker_dir) -> pa.Table:
        import uuid
        with open(os.path.join(_d, uuid.uuid4().hex), "w"):
            pass
        return pa.table({
            "n": pa.array([int(pa.compute.sum(b["n"]).as_py())], pa.int64()),
            "v": pa.array([float(pa.compute.sum(b["v"]).as_py())],
                          pa.float64()),
        })

    ds = rd.from_arrow(tbl).repartition(4).map_batches(
        partial, batch_format="pyarrow"
    )
    got = canonical_tree_sum(ds, lambda r: (r["n"], r["v"]))
    assert got["n"] == 40 and got["v"] == pytest.approx(20.0)
    assert len(os.listdir(marker_dir)) == 4  # once per block, not 8


def test_profile_distinct_signed_zero_and_nan(ray_session):
    """-0.0 and 0.0 are ONE distinct value (SQL / pandas semantics);
    every NaN payload is ONE distinct value."""
    from refimage_ray.stages.profile import profile_table

    t = pa.table({
        "f": pa.array([0.0, -0.0, 1.0, float("nan"), float("nan"), None],
                      pa.float64()),
    })
    got = profile_table(rd.from_arrow(t), ["f"]).to_pandas().set_index(
        "column"
    )
    # {0.0, 1.0, NaN} -> 3 (NaN is a value in SQL DISTINCT; null is not)
    assert got.loc["f", "n_distinct"] == 3
    assert got.loc["f", "n_null"] == 1


def test_profile_string_keys_are_128bit(ray_session):
    """String distinct keys must carry both md5 halves (the repo-wide
    collision discipline) — the partial emits vkey_hi AND vkey_lo."""
    from refimage_ray.stages.profile import _value_keys

    arr = pa.array(["a", "b", "a", None])
    hi, lo = _value_keys(arr)
    assert len(hi) == 3 and len(lo) == 3  # null dropped
    # both halves vary across distinct strings (not a constant filler)
    assert len(set(zip(hi.tolist(), lo.tolist()))) == 2
    assert len(set(lo.tolist())) == 2


def test_tpch_q6_empty_sum_is_null(ray_session, tmp_path):
    """Empty SUM is NULL in SQL — the engine must not invent 0.0."""
    from refimage_ray.pipelines.relational import tpch_q6

    sf = str(tmp_path / "sf_empty_q6")
    os.makedirs(sf)
    # rows that fail every predicate (shipdate out of window)
    pq.write_table(
        pa.table({
            "l_shipdate": pa.array(
                [np.datetime64("1992-01-01", "us")] * 3,
                pa.timestamp("us"),
            ),
            "l_discount": pa.array([0.06] * 3, pa.float64()),
            "l_quantity": pa.array([10.0] * 3, pa.float64()),
            "l_extendedprice": pa.array([100.0] * 3, pa.float64()),
        }),
        os.path.join(sf, "lineitem.parquet"),
    )
    out = tpch_q6(sf)
    assert out.num_rows == 1
    assert out["revenue"][0].as_py() is None


def test_doc_lexical_stats_tokenless_batch_emits_null_ttr(
    ray_session, tmp_path
):
    """A batch whose every doc tokenizes to nothing must emit ttr as
    proper NULLs (like the mixed-batch masked path and the SQL CASE),
    not unmasked NaN values."""
    from refimage_ray.pipelines.corpus import doc_lexical_stats

    sf = str(tmp_path / "sf_tokenless")
    os.makedirs(sf)
    pq.write_table(
        pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["", "!!!", "  "], pa.string()),
        }),
        os.path.join(sf, "documents.parquet"),
    )
    out = doc_lexical_stats(sf).take_all()
    assert len(out) == 3
    for r in out:
        assert r["n_tokens"] == 0
        assert r["ttr"] is None  # null, not NaN


def test_plan_mixture_cli_rejects_non_numeric_tokens(capsys):
    from refimage_ray.__main__ import main

    rc = main(["plan-mixture", "--budget", "100", "--domain", "web=abc"])
    assert rc == 1
    msg = json.loads(capsys.readouterr().out)
    assert "numeric" in msg["error"]
