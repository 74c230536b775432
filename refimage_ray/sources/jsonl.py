"""JSONL (WET-style) corpus source.

Common Crawl's WET sidecar files carry already-extracted plain text;
the ubiquitous interchange for such corpora (C4, RedPajama, Dolma) is
newline-delimited JSON with ``url / timestamp / text`` fields.  This
source round-trips the pages schema minus html: a corpus arriving as
JSONL skips the extract stage and feeds the doc-id/content-hash
stages directly (the same contract as a WET pipeline).

- :func:`write_jsonl` — deterministic serializer (fixtures/oracles);
- :func:`read_jsonl` — ``ray.data.read_json`` (one task per file,
  Arrow-native NDJSON parse) + a vectorized timestamp normalization.

Reference analog: the store's JSON metadata ingestion
(``/root/reference/src/refimage/api.py:658-672``).
"""

from __future__ import annotations

import gzip
import json
import os

import pyarrow as pa
import pyarrow.compute as pc


def write_jsonl(
    table: pa.Table,
    out_dir: str,
    rows_per_file: int = 8192,
    compress: bool = False,
) -> list[str]:
    """pages-like table → ``part-*.jsonl[.gz]`` (WET-style rows).

    Emits ``url, warc_ts`` (ISO-8601), ``text, lang``; the ``html``
    column, if present, is dropped — JSONL is the extracted-text format.
    """
    os.makedirs(out_dir, exist_ok=True)
    urls = table["url"].to_pylist()
    ts = table["warc_ts"].cast(pa.int64()).to_pylist()
    texts = table["text"].to_pylist()
    langs = (
        table["lang"].to_pylist()
        if "lang" in table.column_names
        else [None] * table.num_rows
    )
    import numpy as np

    paths: list[str] = []
    ext = ".jsonl.gz" if compress else ".jsonl"
    for fi, start in enumerate(range(0, table.num_rows, rows_per_file)):
        stop = min(start + rows_per_file, table.num_rows)
        lines = "".join(
            json.dumps(
                {
                    "url": urls[i],
                    "warc_ts": str(np.datetime64(ts[i], "us")),
                    "text": texts[i],
                    "lang": langs[i],
                },
                ensure_ascii=False,
                sort_keys=True,
            )
            + "\n"
            for i in range(start, stop)
        )
        blob = lines.encode("utf-8")
        if compress:
            blob = gzip.compress(blob, mtime=0)
        path = os.path.join(out_dir, f"part-{fi:05d}{ext}")
        with open(path, "wb") as f:
            f.write(blob)
        paths.append(path)
    return paths


def _normalize(batch: pa.Table) -> pa.Table:
    # Arrow's NDJSON reader infers ISO-8601 strings as timestamps; if a
    # producer disabled inference the string→timestamp cast covers it.
    return pa.table(
        {
            "url": pc.cast(batch["url"], pa.string()),
            "warc_ts": pc.cast(batch["warc_ts"], pa.timestamp("us")),
            "text": pc.cast(batch["text"], pa.string()),
            "lang": pc.cast(batch["lang"], pa.string()),
        }
    )


def read_jsonl(paths: str | list[str], compressed: bool = False) -> "ray.data.Dataset":
    """JSONL file(s)/dir → Dataset ``(url, warc_ts, text, lang)``.

    One ``read_json`` task per file (Arrow-native NDJSON parse);
    ``compressed=True`` reads gzip members via Arrow's stream codec.
    """
    import ray.data as rd

    kwargs = {"file_extensions": ["jsonl", "gz"]}
    if compressed:
        kwargs["arrow_open_stream_args"] = {"compression": "gzip"}
    ds = rd.read_json(paths, **kwargs)
    return ds.map_batches(_normalize, batch_format="pyarrow")
