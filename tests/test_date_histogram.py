"""Calendar date_histogram facets: every interval must match DuckDB
date_trunc exactly (including pre-epoch timestamps), and the
doc-partitioned facet merge must equal the local panel."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from refimage_ray.config import EngineConfig
from refimage_ray.index.build import build_index
from refimage_ray.query.engine import LocalSearcher

CFG = EngineConfig(num_shards=4, salt_buckets=2)
BASE = int(np.datetime64("1969-06-15T07:31:05", "us").astype(np.int64))


@pytest.fixture(scope="module")
def ts_index(ray_session, tiny_docs, tmp_path_factory):
    """Index whose ts doc value straddles the epoch (negative µs too)."""
    ids = np.asarray(tiny_docs["doc_id"].to_pylist(), np.int64)
    us = BASE + (ids % 619) * 86_400_000_000 + (ids % 1373) * 61_000_000
    docs = tiny_docs.select(["doc_id", "text"]).append_column(
        "ts", pa.array(us, pa.timestamp("us"))
    )
    d = str(tmp_path_factory.mktemp("dhist") / "idx")
    build_index(rd.from_arrow(docs), d, CFG)
    return d, docs


@pytest.mark.parametrize("interval", ["hour", "day", "week", "month", "year"])
def test_matches_duckdb_date_trunc(ts_index, interval):
    d, docs = ts_index
    s = LocalSearcher(d)
    f = s.facets("the data", date_histograms={"ts": interval})
    got = {int(b): n for b, n in f["date_histograms"]["ts"]}

    con = duckdb.connect()
    con.register("docs", docs)
    want_rows = con.execute(f"""
        WITH m AS (
          SELECT DISTINCT doc_id FROM (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) t
            FROM docs) WHERE t IN ('the', 'data')
        )
        SELECT date_trunc('{interval}', ts) b, count(*) n
        FROM docs JOIN m USING (doc_id) GROUP BY 1
    """).fetchall()
    want = {
        int(np.datetime64(b, "us").astype(np.int64)): n for b, n in want_rows
    }
    assert got == want, interval


def test_docpart_merge_matches_local(ray_session, ts_index,
                                     tmp_path_factory):
    from refimage_ray.index.docpart import (
        DocPartSearcher,
        build_doc_partitioned,
    )

    d, docs = ts_index
    dp = str(tmp_path_factory.mktemp("dhistdp") / "dp")
    build_doc_partitioned(rd.from_arrow(docs), dp, CFG,
                          value_columns=["ts"])
    local = LocalSearcher(d).facets(
        "the data", date_histograms={"ts": "month"}
    )
    part = DocPartSearcher(dp).facets(
        "the data", date_histograms={"ts": "month"}
    )
    assert part["date_histograms"]["ts"] == local["date_histograms"]["ts"]
    assert part["total"] == local["total"]


def test_bad_interval_rejected(ts_index):
    d, _ = ts_index
    with pytest.raises(ValueError, match="interval"):
        LocalSearcher(d).facets("data", date_histograms={"ts": "fortnight"})
