"""WARC corpus source — Common-Crawl's container format, from scratch.

The north-star input is "Common-Crawl-style web pages"; CC's native
interchange format is WARC/1.0 (ISO 28500): a concatenation of
records, each a small ``\\r\\n``-separated header block (with a
``Content-Length``) followed by exactly that many payload bytes.  For
*response* records the payload is an HTTP response whose body is the
page html.  This module provides

- :func:`write_warc` — serialize a pages table (``url, warc_ts, html,
  lang``) into one or more ``.warc`` / ``.warc.gz`` files,
  deterministically (fixture + round-trip oracle input);
- :func:`read_warc` — a distributed Ray Data reader:
  ``ray.data.read_binary_files`` (one task per file) → a vectorized-
  per-file parser ``map_batches`` stage emitting the same ``(url,
  warc_ts, html, lang)`` schema the Parquet source yields, so every
  downstream stage (extract → dedup → index) is source-agnostic.

Scale/partitioning assumption: parallelism comes from MANY WARC files
(Common Crawl ships ~72k ~1 GB files per crawl) — one read task per
file, never per record.  Record parsing inside a file is inherently
sequential (records are length-prefixed, not seekable), which is the
same contract CC's own tooling (warcio) has; per-record work here is
O(1) slicing + one small header scan.

Reference analog: upload ingestion boundary — bytes arrive in a
container and are normalized into the store's schema
(``/root/reference/src/refimage/api.py:384-420``).
"""

from __future__ import annotations

import gzip
import os
import re

import numpy as np
import pyarrow as pa

_WARC_DATE_FMT = "%Y-%m-%dT%H:%M:%SZ"
_HDR_RE = re.compile(r"^([A-Za-z0-9\-]+):\s*(.*)$")


def _warc_date(ts_us: int) -> str:
    # numpy's datetime64 renders ISO-8601 without a trailing Z;
    # WARC-Date requires UTC "Z".  Truncate to seconds (WARC/1.0).
    iso = str(np.datetime64(ts_us, "us").astype("datetime64[s]"))
    return iso + "Z"


def _parse_warc_date(s: str) -> int:
    """WARC-Date (UTC Z, second or sub-second precision) → epoch us."""
    s = s.strip()
    if s.endswith("Z"):
        s = s[:-1]
    return int(np.datetime64(s, "us").astype(np.int64))


def record_bytes(url: str, ts_us: int, html: bytes, lang: str | None) -> bytes:
    """One WARC/1.0 response record (header + HTTP envelope + html)."""
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n" + html
    )
    headers = [
        b"WARC/1.0",
        b"WARC-Type: response",
        b"WARC-Target-URI: " + url.encode("utf-8"),
        b"WARC-Date: " + _warc_date(ts_us).encode(),
    ]
    if lang is not None:
        # the header CC itself attaches (CLD2 output) to its records
        headers.append(
            b"WARC-Identified-Content-Language: " + lang.encode("utf-8")
        )
    headers += [
        b"Content-Type: application/http; msgtype=response",
        b"Content-Length: " + str(len(http)).encode(),
    ]
    return b"\r\n".join(headers) + b"\r\n\r\n" + http + b"\r\n\r\n"


def write_warc(
    table: pa.Table,
    out_dir: str,
    records_per_file: int = 4096,
    compress: bool = False,
) -> list[str]:
    """pages table → ``part-*.warc[.gz]`` files (one read unit each).

    Deterministic: record order is table order, names are sequential.
    ``compress=True`` gzips whole files (the reader sniffs by suffix).
    """
    os.makedirs(out_dir, exist_ok=True)
    urls = table["url"].to_pylist()
    ts = table["warc_ts"].cast(pa.int64()).to_pylist()
    htmls = table["html"].to_pylist()
    langs = (
        table["lang"].to_pylist()
        if "lang" in table.column_names
        else [None] * table.num_rows
    )
    paths: list[str] = []
    ext = ".warc.gz" if compress else ".warc"
    for fi, start in enumerate(range(0, table.num_rows, records_per_file)):
        stop = min(start + records_per_file, table.num_rows)
        blob = b"".join(
            record_bytes(urls[i], ts[i], htmls[i], langs[i])
            for i in range(start, stop)
        )
        if compress:
            # mtime=0 → byte-deterministic gzip output
            blob = gzip.compress(blob, mtime=0)
        path = os.path.join(out_dir, f"part-{fi:05d}{ext}")
        with open(path, "wb") as f:
            f.write(blob)
        paths.append(path)
    return paths


def parse_warc_file(data: bytes) -> pa.Table:
    """One WARC file's bytes → (url, warc_ts, html, lang) table.

    Content-Length-driven (payloads may themselves contain the
    ``\\r\\n\\r\\n`` separator, so splitting on it would corrupt
    records).  Non-response records (warcinfo, request, metadata) are
    skipped, as a reader of real CC files must.
    """
    urls: list[str] = []
    ts: list[int] = []
    htmls: list[bytes] = []
    langs: list[str | None] = []
    pos = 0
    n = len(data)
    while pos < n:
        idx = data.find(b"WARC/", pos)
        if idx < 0:
            break
        hdr_end = data.find(b"\r\n\r\n", idx)
        if hdr_end < 0:
            break
        fields: dict[str, str] = {}
        for line in data[idx:hdr_end].decode("utf-8", "replace").split("\r\n")[1:]:
            m = _HDR_RE.match(line)
            if m:
                fields[m.group(1).lower()] = m.group(2)
        try:
            clen = int(fields.get("content-length", ""))
        except ValueError:
            pos = hdr_end + 4
            continue
        body = data[hdr_end + 4 : hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        if fields.get("warc-type") != "response":
            continue
        # strip the HTTP envelope (its own Content-Length is
        # authoritative for the body, but the WARC record length
        # already bounds it; the envelope ends at the first CRLFCRLF,
        # which precedes any body bytes by construction of HTTP)
        he = body.find(b"\r\n\r\n")
        html = body[he + 4 :] if he >= 0 else body
        urls.append(fields.get("warc-target-uri", ""))
        ts.append(_parse_warc_date(fields.get("warc-date", "1970-01-01T00:00:00Z")))
        htmls.append(html)
        langs.append(fields.get("warc-identified-content-language"))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def _parse_batch(batch: pa.Table) -> pa.Table:
    out: list[pa.Table] = []
    paths = (
        batch["path"].to_pylist()
        if "path" in batch.column_names
        else [""] * batch.num_rows
    )
    for raw, _path in zip(batch["bytes"].to_pylist(), paths):
        # sniff the gzip magic rather than trusting the suffix:
        # ray.data.read_binary_files already decompresses files whose
        # extension Arrow recognizes, so suffix-based logic would
        # double-decompress (and a local .warc.gz read raw would fail)
        if raw[:2] == b"\x1f\x8b":
            raw = gzip.decompress(raw)
        out.append(parse_warc_file(raw))
    return pa.concat_tables(out) if out else parse_warc_file(b"")


def read_warc(paths: str | list[str]) -> "ray.data.Dataset":
    """WARC file(s)/dir → Dataset with the pages schema (minus text).

    One ``read_binary_files`` task per file; the parse stage is a
    plain task-pool ``map_batches`` (stateless, CPU-light).
    """
    import ray.data as rd

    ds = rd.read_binary_files(
        paths, include_paths=True, file_extensions=["warc", "gz"]
    )
    return ds.map_batches(_parse_batch, batch_format="pyarrow", batch_size=1)
