"""Crawl-snapshot delta (stages/crawl.py): status adjudication vs a
naive reference, string + integer key paths, block invariance, empty
sides."""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from refimage_ray.stages.crawl import crawl_delta, crawl_delta_stats


def _tbl(rows, key_type=pa.string()):
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], key_type),
            "text": pa.array([r[1] for r in rows]),
        }
    )


OLD = [("a", "one"), ("b", "two"), ("c", "three")]
NEW = [("b", "two"), ("c", "three CHANGED"), ("d", "four")]
WANT = {"a": "removed", "b": "unchanged", "c": "changed", "d": "added"}


def test_delta_statuses(ray_session):
    got = (
        crawl_delta(rd.from_arrow(_tbl(OLD)), rd.from_arrow(_tbl(NEW)))
        .to_pandas()
        .set_index("url")["status"]
        .to_dict()
    )
    assert got == WANT


def test_delta_int_keys_and_blocks(ray_session):
    old = pa.table(
        {
            "doc_id": pa.array(range(20), pa.int64()),
            "text": pa.array([f"t{i}" for i in range(20)]),
        }
    )
    new = pa.table(
        {
            "doc_id": pa.array(range(5, 25), pa.int64()),
            "text": pa.array(
                [f"t{i}" if i % 2 == 0 else f"t{i}x" for i in range(5, 25)]
            ),
        }
    )
    one = (
        crawl_delta(
            rd.from_arrow(old), rd.from_arrow(new), key_col="doc_id"
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    many = (
        crawl_delta(
            rd.from_arrow(old).repartition(5),
            rd.from_arrow(new).repartition(7),
            key_col="doc_id",
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert one.equals(many)
    s = one.set_index("doc_id")["status"]
    assert (s.loc[:4] == "removed").all()
    assert (s.loc[20:] == "added").all()
    assert (s.loc[6:18:2] == "unchanged").all()
    assert (s.loc[5:19:2] == "changed").all()


def test_delta_stats_zero_filled(ray_session):
    same = _tbl(OLD)
    out = crawl_delta_stats(
        rd.from_arrow(same), rd.from_arrow(same)
    ).to_pydict()
    assert out["status"] == ["added", "changed", "removed", "unchanged"]
    assert out["n"] == [0, 0, 0, 3]


def test_delta_empty_old(ray_session):
    out = (
        crawl_delta(rd.from_arrow(_tbl([])), rd.from_arrow(_tbl(NEW)))
        .to_pandas()
    )
    assert (out["status"] == "added").all() and len(out) == 3
