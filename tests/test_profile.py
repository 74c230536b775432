"""Table profiling (stages/profile.py) vs pandas ground truth."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from refimage_ray.stages.profile import profile_table


def _tbl() -> pa.Table:
    return pa.table(
        {
            "i": pa.array([1, 2, 2, None, 5], pa.int64()),
            "f": pa.array([1.5, None, 1.5, -2.0, 0.0], pa.float64()),
            "s": pa.array(["a", "b", None, "a", "c"]),
            "ts": pa.array(
                [0, 1_000_000, 1_000_000, None, 2_000_000],
                pa.timestamp("us"),
            ),
        }
    )


def test_profile_matches_pandas(ray_session):
    got = (
        profile_table(rd.from_arrow(_tbl()), ["i", "f", "s", "ts"])
        .to_pandas()
        .set_index("column")
    )
    pdf = _tbl().to_pandas()
    for c in ("i", "f", "s", "ts"):
        r = got.loc[c]
        assert r["n_rows"] == 5
        assert r["n_null"] == int(pdf[c].isna().sum())
        assert r["n_distinct"] == pdf[c].dropna().nunique(), c
    assert got.loc["i", "min_num"] == 1 and got.loc["i", "max_num"] == 5
    assert got.loc["f", "min_num"] == -2.0 and got.loc["f", "max_num"] == 1.5
    assert got.loc["i", "mean"] == round((1 + 2 + 2 + 5) / 4, 6)
    assert np.isnan(got.loc["s", "mean"]) and np.isnan(got.loc["ts", "min_num"])


def test_profile_block_invariance(ray_session):
    rng = np.random.default_rng(7)
    n = 2000
    t = pa.table(
        {
            "x": pa.array(rng.integers(0, 50, n), pa.int64()),
            "y": pa.array(np.round(rng.normal(size=n), 3), pa.float64()),
        }
    )
    one = profile_table(rd.from_arrow(t), ["x", "y"]).to_pandas()
    many = profile_table(
        rd.from_arrow(t).repartition(9), ["x", "y"]
    ).to_pandas()
    pd.testing.assert_frame_equal(one, many)
    assert one.set_index("column").loc["x", "n_distinct"] == 50
