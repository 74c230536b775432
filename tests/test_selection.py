"""Distributed exact selection: k-th smallest / quantiles must equal
numpy's sorted-order answer on doubles with duplicates and extremes."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from refimage_ray.stages.selection import kth_smallest, quantiles_exact


def _ds(vals: np.ndarray):
    return rd.from_arrow(
        pa.table({"value": pa.array(vals, pa.float64())})
    ).repartition(7)


@pytest.fixture(scope="module")
def messy(ray_session):
    rng = np.random.default_rng(11)
    vals = np.concatenate([
        rng.normal(0, 1, 3000),
        rng.lognormal(4, 2, 1000),          # heavy tail
        np.full(500, 3.25),                 # duplicate spike
        [-1e12, 1e12, 0.0, -0.0],           # extremes
    ])
    return vals, _ds(vals)


def test_kth_matches_numpy(messy):
    vals, ds = messy
    srt = np.sort(vals)
    n = len(vals)
    for k in (1, 2, 137, n // 2, n - 1, n):
        assert kth_smallest(ds, "value", k) == srt[k - 1], k


def test_quantiles_match_numpy(messy):
    vals, ds = messy
    srt = np.sort(vals)
    n = len(vals)
    t = quantiles_exact(ds, "value", (0.25, 0.5, 0.99))
    for q, v in zip(t["q"].to_pylist(), t["value"].to_pylist()):
        k = max(1, int(np.ceil(q * n)))
        assert v == srt[k - 1], q


def test_duplicate_spike_beyond_collect_cap(ray_session):
    """All-equal mass larger than collect_cap must converge via the
    ULP-narrow early exit, not loop forever."""
    vals = np.concatenate([np.full(5000, 7.5), [1.0, 2.0, 100.0]])
    ds = _ds(vals)
    assert kth_smallest(ds, "value", 2500, collect_cap=100) == 7.5


def test_all_equal_column(ray_session):
    ds = _ds(np.full(100, -3.0))
    assert kth_smallest(ds, "value", 50) == -3.0


def test_validates_k(messy):
    _, ds = messy
    with pytest.raises(ValueError, match="k="):
        kth_smallest(ds, "value", 10**9)
    with pytest.raises(ValueError, match="k must"):
        kth_smallest(ds, "value", 0)
    with pytest.raises(ValueError, match="quantile"):
        quantiles_exact(ds, "value", (0.0,))


def test_nulls_and_nan_excluded(ray_session):
    """Review regression: n used to count null/NaN rows, shifting every
    rank (and crashing high quantiles)."""
    vals = pa.array([1.0, None, 2.0, float("nan"), 3.0, None, 4.0],
                    pa.float64())
    ds = rd.from_arrow(pa.table({"value": vals})).repartition(3)
    assert kth_smallest(ds, "value", 1) == 1.0
    assert kth_smallest(ds, "value", 4) == 4.0
    t = quantiles_exact(ds, "value", (0.5, 0.99, 1.0))
    assert t["value"].to_pylist() == [2.0, 4.0, 4.0]
    with pytest.raises(ValueError, match="k=5"):
        kth_smallest(ds, "value", 5)
