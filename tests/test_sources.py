"""Alternate corpus sources: WARC (CC container) and JSONL (WET-style).

The contract under test: ingesting the SAME corpus through a different
container yields byte-identical rows — so every downstream stage
(extract → dedup → index) is source-agnostic, and an index built from
WARC equals one built from Parquet.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from refimage_ray.sources.jsonl import read_jsonl, write_jsonl
from refimage_ray.sources.warc import (
    parse_warc_file,
    read_warc,
    record_bytes,
    write_warc,
)


def _sorted_by_url(t: pa.Table) -> pa.Table:
    return t.sort_by("url")


def _collect(ds) -> pa.Table:
    return pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))


def test_warc_roundtrip_bytes(tiny_pages):
    """write_warc → parse_warc_file recovers every column exactly."""
    import os

    paths = write_warc(tiny_pages, "/tmp/warc_rt", records_per_file=64)
    assert len(paths) == (tiny_pages.num_rows + 63) // 64
    parts = []
    for p in paths:
        with open(p, "rb") as f:
            parts.append(parse_warc_file(f.read()))
    got = _sorted_by_url(pa.concat_tables(parts))
    want = _sorted_by_url(tiny_pages.select(["url", "warc_ts", "html", "lang"]))
    assert got["url"].to_pylist() == want["url"].to_pylist()
    assert got["html"].to_pylist() == want["html"].to_pylist()
    assert got["lang"].to_pylist() == want["lang"].to_pylist()
    # WARC-Date is second-precision (WARC/1.0): compare truncated
    want_s = pc.floor_temporal(want["warc_ts"], unit="second")
    assert got["warc_ts"].to_pylist() == want_s.to_pylist()
    for p in paths:
        os.unlink(p)


def test_warc_payload_may_contain_crlfcrlf():
    """Content-Length-driven parsing survives separator bytes in html."""
    html = b"<html>\r\n\r\nWARC/1.0\r\n\r\nfake-record-lookalike</html>"
    blob = record_bytes("https://x.example/a", 0, html, "en") + record_bytes(
        "https://x.example/b", 1_000_000, b"<p>second</p>", None
    )
    t = parse_warc_file(blob)
    assert t.num_rows == 2
    assert t["html"].to_pylist()[0] == html
    assert t["url"].to_pylist() == ["https://x.example/a", "https://x.example/b"]
    assert t["lang"].to_pylist() == ["en", None]


def test_warc_skips_non_response_records():
    warcinfo = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n"
    )
    blob = warcinfo + record_bytes("https://x.example/a", 0, b"<p>hi</p>", "en")
    t = parse_warc_file(blob)
    assert t.num_rows == 1
    assert t["url"].to_pylist() == ["https://x.example/a"]


@pytest.mark.parametrize("compress", [False, True])
def test_read_warc_distributed(ray_session, tiny_pages, tmp_path, compress):
    out = str(tmp_path / ("warc_gz" if compress else "warc"))
    write_warc(tiny_pages, out, records_per_file=50, compress=compress)
    got = _sorted_by_url(
        _collect(read_warc(out))
    )
    want = _sorted_by_url(tiny_pages)
    assert got.num_rows == tiny_pages.num_rows
    assert got["url"].to_pylist() == want["url"].to_pylist()
    assert got["html"].to_pylist() == want["html"].to_pylist()


def test_warc_extract_matches_parquet_path(ray_session, tiny_pages, tmp_path):
    """WARC → extract recovers the same text as the Parquet source."""
    from refimage_ray.stages.extract import extract_text_batch

    out = str(tmp_path / "warc")
    write_warc(tiny_pages, out, records_per_file=100)
    ext = read_warc(out).map_batches(
        extract_text_batch, batch_format="pyarrow"
    )
    got = _sorted_by_url(
        _collect(ext)
    )
    want = _sorted_by_url(tiny_pages)
    assert got["text"].to_pylist() == want["text"].to_pylist()


def test_jsonl_roundtrip(ray_session, tiny_pages, tmp_path):
    out = str(tmp_path / "jsonl")
    paths = write_jsonl(tiny_pages, out, rows_per_file=64)
    assert len(paths) == (tiny_pages.num_rows + 63) // 64
    got = _sorted_by_url(
        _collect(read_jsonl(out))
    )
    want = _sorted_by_url(tiny_pages)
    assert got["url"].to_pylist() == want["url"].to_pylist()
    assert got["text"].to_pylist() == want["text"].to_pylist()
    assert got["lang"].to_pylist() == want["lang"].to_pylist()
    assert got["warc_ts"].to_pylist() == want["warc_ts"].to_pylist()
    assert got.schema.field("warc_ts").type == pa.timestamp("us")


def test_index_from_warc_identical_to_parquet(ray_session, tiny_pages, tmp_path):
    """Full flagship build over the WARC container produces a
    byte-identical postings artifact to the Parquet-sourced build —
    the container is an ingest detail, not semantics."""
    import glob
    import os

    from refimage_ray.config import EngineConfig
    from refimage_ray.pipelines.flagship import build_from_pages
    from refimage_ray.sources.pages import write_pages

    pq_dir = str(tmp_path / "pages_pq")
    write_pages(tiny_pages, pq_dir, rows_per_file=64)
    warc_dir = str(tmp_path / "pages_warc")
    write_warc(tiny_pages, warc_dir, records_per_file=64)

    cfg = EngineConfig(num_shards=4, salt_buckets=2)
    res_pq = build_from_pages(pq_dir, str(tmp_path / "idx_pq"), cfg)
    res_warc = build_from_pages(
        warc_dir, str(tmp_path / "idx_warc"), cfg, source="warc"
    )
    assert res_warc.metrics["n_docs"] == res_pq.metrics["n_docs"]
    assert res_warc.metrics["n_postings"] == res_pq.metrics["n_postings"]
    names = sorted(
        os.path.basename(p)
        for p in glob.glob(str(tmp_path / "idx_pq" / "part-*.parquet"))
    )
    assert names == sorted(
        os.path.basename(p)
        for p in glob.glob(str(tmp_path / "idx_warc" / "part-*.parquet"))
    )
    assert names
    for name in names:
        a = open(str(tmp_path / "idx_pq" / name), "rb").read()
        b = open(str(tmp_path / "idx_warc" / name), "rb").read()
        assert a == b, f"{name} differs: warc vs parquet source"
