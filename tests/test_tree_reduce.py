"""canonical_tree_sum laws: the distributed tree path is deterministic,
content-keyed (block-layout invariant), exact on integer columns, and
numerically equivalent to the driver path."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from refimage_ray.functions.arrays import canonical_tree_sum

def _partials(n_rows: int = 40) -> pa.Table:
    rng = np.random.default_rng(7)
    return pa.table(
        {
            "n": pa.array(rng.integers(1, 100, n_rows).tolist(), pa.int64()),
            "loss": pa.array(rng.normal(size=n_rows).tolist(), pa.float64()),
            "grad": pa.array(
                rng.normal(size=(n_rows, 8)).tolist(),
                pa.list_(pa.float64()),
            ),
        }
    )


# key defined as a lambda inside each test: cloudpickle ships lambdas
# by VALUE (the library callers do the same), while a module-level
# function in a test file pickles by reference and is unimportable in
# Ray workers
_key = lambda r: (r["n"], r["loss"], r["grad"])  # noqa: E731


def test_driver_path_matches_manual_canonical_sum(ray_session):
    tbl = _partials()
    got = canonical_tree_sum(rd.from_arrow(tbl), _key, driver_cap=4096)
    rows = sorted(tbl.to_pylist(), key=_key)
    assert got["n"] == sum(r["n"] for r in rows)
    assert got["loss"] == sum(r["loss"] for r in rows)  # same add order
    np.testing.assert_array_equal(
        got["grad"],
        np.sum(np.stack([np.asarray(r["grad"]) for r in rows]), axis=0),
    )


def test_tree_path_is_block_layout_invariant(ray_session):
    """Same partial rows in different block layouts → bit-identical
    result (the bucketing is content-keyed, never layout-keyed)."""
    tbl = _partials()
    a = canonical_tree_sum(rd.from_arrow(tbl), _key, driver_cap=3, branch=4)
    b = canonical_tree_sum(
        rd.from_arrow(tbl).repartition(7), _key, driver_cap=3, branch=4
    )
    c = canonical_tree_sum(
        rd.from_arrow(tbl).repartition(13), _key, driver_cap=3, branch=4
    )
    assert a == b == c


def test_tree_path_equals_driver_numerically(ray_session):
    tbl = _partials()
    driver = canonical_tree_sum(rd.from_arrow(tbl), _key, driver_cap=4096)
    tree = canonical_tree_sum(rd.from_arrow(tbl), _key, driver_cap=2,
                              branch=3)
    assert tree["n"] == driver["n"]  # ints are order-free: exact
    assert abs(tree["loss"] - driver["loss"]) < 1e-12 * max(
        1.0, abs(driver["loss"])
    )
    np.testing.assert_allclose(tree["grad"], driver["grad"], rtol=1e-12)


def test_empty_dataset_returns_none(ray_session):
    empty = rd.from_arrow(_partials(0))
    assert canonical_tree_sum(empty, _key) is None
