"""Bucketed hash join (two large sides) vs pandas reference."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from refimage_ray.stages.joins import hash_join


@pytest.fixture(scope="module")
def two_tables():
    rng = np.random.default_rng(5)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 200, size=1000),
            "lv": rng.standard_normal(1000).round(3),
        }
    )
    right = pd.DataFrame(
        {
            "rk": np.arange(150),  # some keys match, some don't
            "rv": [f"name-{i}" for i in range(150)],
        }
    )
    return left, right


def test_inner_join_matches_pandas(ray_session, two_tables):
    left, right = two_tables
    got = (
        hash_join(
            rd.from_pandas(left),
            rd.from_pandas(right),
            left_on="k",
            right_on="rk",
            left_cols=["k", "lv"],
            right_cols=["rk", "rv"],
            buckets=16,
        )
        .to_pandas()
        .sort_values(["k", "lv", "rv"], kind="mergesort")
        .reset_index(drop=True)
    )
    exp = (
        left.merge(right, left_on="k", right_on="rk", how="inner")
        .sort_values(["k", "lv", "rv"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp)


def test_left_join_keeps_unmatched(ray_session, two_tables):
    left, right = two_tables
    got = hash_join(
        rd.from_pandas(left),
        rd.from_pandas(right),
        left_on="k",
        right_on="rk",
        left_cols=["k", "lv"],
        right_cols=["rk", "rv"],
        buckets=8,
        how="left",
    ).to_pandas()
    assert len(got) == len(left.merge(right, left_on="k", right_on="rk", how="left"))
    unmatched = got[got["rv"].isna()]
    assert (unmatched["k"] >= 150).all()


def test_native_join_matches_hash_join(ray_session):
    import pandas as pd

    from refimage_ray.stages.joins import hash_join, native_join

    left = pa.table(
        {
            "k": pa.array([1, 2, 3, 4, 5, 5], pa.int64()),
            "a": pa.array(list("abcdef"), pa.string()),
        }
    )
    right = pa.table(
        {
            "rk": pa.array([2, 3, 5, 7], pa.int64()),
            "b": pa.array(list("wxyz"), pa.string()),
        }
    )
    want = (
        hash_join(
            rd.from_arrow(left), rd.from_arrow(right),
            left_on="k", right_on="rk",
            left_cols=["k", "a"], right_cols=["rk", "b"], buckets=4,
        )
        .to_pandas()
        .sort_values(["k", "a", "b"])
        .reset_index(drop=True)
    )
    got = (
        native_join(
            rd.from_arrow(left), rd.from_arrow(right),
            left_on="k", right_on="rk", num_partitions=4,
        )
        .to_pandas()
        .sort_values(["k", "a", "b"])
        .reset_index(drop=True)
    )
    assert sorted(want["k"]) == sorted(got["k"])
    assert set(zip(want.k, want.a, want.b)) == set(zip(got.k, got.a, got.b))


@pytest.mark.parametrize("allow_exact", [False, True])
def test_asof_join_prior_matches_pandas_merge_asof(ray_session, allow_exact):
    """Random interleaved two-table data vs pandas.merge_asof
    (by=key, direction='backward') — exact frame equality."""
    import ray.data as rd

    from refimage_ray.stages.joins import asof_join_prior

    rng = np.random.default_rng(17)
    nl, nr = 300, 140
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 8, nl),
            "t": rng.integers(0, 50, nl).astype(np.int64),
            "lv": rng.normal(size=nl).round(4),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 8, nr),
            "t": rng.integers(0, 50, nr).astype(np.int64),
            "rv": rng.normal(size=nr).round(4),
        }
    )
    # merge_asof forbids duplicate right (k, t) ambiguity? it takes the
    # LAST right row at equal (k, t) — our stable lexsort does too, as
    # long as right arrival order matches; dedup to keep oracle sharp
    right = right.drop_duplicates(["k", "t"], keep="last").reset_index(drop=True)

    got = (
        asof_join_prior(
            rd.from_pandas(left), rd.from_pandas(right),
            key="k", on="t", left_cols=["lv"], right_cols=["rv"],
            allow_exact=allow_exact,
        )
        .to_pandas()
        .sort_values(["k", "t", "lv"], kind="mergesort")
        .reset_index(drop=True)
    )
    want = (
        pd.merge_asof(
            left.sort_values("t", kind="mergesort"),
            right.sort_values("t", kind="mergesort"),
            on="t", by="k", direction="backward",
            allow_exact_matches=allow_exact,
        )
        .rename(columns={"rv": "right_rv"})
        .sort_values(["k", "t", "lv"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["k", "t", "lv", "right_rv"]], want[["k", "t", "lv", "right_rv"]]
    )


def test_asof_join_prior_validates_columns(ray_session):
    import ray.data as rd

    from refimage_ray.stages.joins import asof_join_prior

    ds = rd.from_items([{"k": 1, "t": 1, "v": 1.0}])
    with pytest.raises(ValueError):
        asof_join_prior(ds, ds, key="k", on="t",
                        left_cols=["t"], right_cols=["v"])
    with pytest.raises(ValueError):
        asof_join_prior(ds, ds, key="k", on="t",
                        left_cols=["v"], right_cols=["v"])


def test_hash_join_left_outer(ray_session):
    """how='left': unmatched left rows survive with nulls, even in
    buckets that contain NO right-side rows at all."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from refimage_ray.stages.joins import hash_join

    left = rd.from_arrow(pa.table(
        {"k": pa.array(range(40), pa.int64()),
         "lv": pa.array([f"l{i}" for i in range(40)])}))
    right = rd.from_arrow(pa.table(
        {"k2": pa.array([0, 2, 4], pa.int64()),
         "rv": pa.array([10.0, 12.0, 14.0], pa.float64())}))
    out = hash_join(
        left, right, left_on="k", right_on="k2",
        left_cols=["k", "lv"], right_cols=["k2", "rv"],
        buckets=8, how="left",
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert len(out) == 40
    assert out.loc[out.k == 2, "rv"].iloc[0] == 12.0
    assert pd.isna(out.loc[out.k == 1, "rv"].iloc[0])
