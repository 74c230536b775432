"""URL canonicalization + canonical-URL dedup (crawl-prep operators).

Crawls ship the same page under many URL spellings: scheme/host case,
``www.`` prefixes, default ports, trailing slashes, fragments, tracking
parameters (``utm_*``/``gclid``/``fbclid``/``ref``) and query-param
order.  Canonicalizing before URL-keyed dedup collapses these spellings
— the standard first step of a web-corpus pipeline (the reference's
analog is uniqueness on content hash, ``storage.py:89``; this is the
cheaper URL-level complement).

Canonical form (mirrored verbatim by the SQL oracle):
  1. drop the fragment (``#...``);
  2. lowercase ``scheme://host[:port]``; strip a leading ``www.``;
     strip the scheme's default port (``:80`` http / ``:443`` https);
  3. strip trailing ``/`` runs from the path;
  4. drop tracking query params, sort the rest lexicographically,
     rejoin with ``&`` (drop the ``?`` when none remain).
Strings that don't parse as ``scheme://authority...`` pass through
unchanged (canonicalization never invents URLs).

Everything is vectorized Arrow: regex kernels for the scalar rewrites
and the flatten → filter → lexsort → rebuild-list → ``binary_join``
trick for query-param normalization (the same shape as the line-dedup
segmenter) — no per-row Python in the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

TRACKING_PARAM_RE = r"^(utm_[a-z0-9]+|gclid|fbclid|ref)="


def canonicalize_url_array(url: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Canonical form of each URL in an Arrow string column."""
    if isinstance(url, pa.ChunkedArray):
        url = url.combine_chunks()
    u = pc.replace_substring_regex(pc.fill_null(url, ""), r"#.*$", "")
    ex = pc.extract_regex(
        u, r"^(?P<pre>[A-Za-z][A-Za-z0-9+.\-]*://[^/?]*)(?P<rest>.*)$"
    )
    valid = pc.is_valid(ex)
    pre = pc.fill_null(pc.struct_field(ex, "pre"), "")
    rest = pc.fill_null(pc.struct_field(ex, "rest"), "")
    pre = pc.utf8_lower(pre)
    pre = pc.replace_substring_regex(
        pre, r"^([a-z][a-z0-9+.\-]*://)www\.", r"\1"
    )
    pre = pc.replace_substring_regex(pre, r"^(https://[^/?:]*):443$", r"\1")
    pre = pc.replace_substring_regex(pre, r"^(http://[^/?:]*):80$", r"\1")
    path = pc.replace_substring_regex(rest, r"\?.*$", "")
    path = pc.replace_substring_regex(path, r"/+$", "")
    # query: '' both when there was no '?' and when params all drop —
    # identical canonical either way
    q = pc.replace_substring_regex(rest, r"^[^?]*\??", "")
    params = pc.split_pattern(q, "&")
    if isinstance(params, pa.ChunkedArray):
        params = params.combine_chunks()
    lens = pc.list_value_length(params).to_numpy(zero_copy_only=False)
    lens = lens.astype(np.int64)
    flat = pc.list_flatten(params)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    n = len(lens)
    parent = np.repeat(np.arange(n, dtype=np.int64), lens)
    keep = (
        pc.and_(
            pc.not_equal(flat, ""),
            pc.invert(pc.match_substring_regex(flat, TRACKING_PARAM_RE)),
        )
        .to_numpy(zero_copy_only=False)
        .astype(bool)
    )
    kv = flat.to_numpy(zero_copy_only=False)[keep]
    kp = parent[keep]
    order = np.lexsort((kv, kp))  # param-sorted within each URL
    counts = np.bincount(kp, minlength=n)
    offsets = np.append(0, np.cumsum(counts)).astype(np.int32)
    qjoin = pc.binary_join(
        pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(kv[order], pa.string())
        ),
        "&",
    )
    qpart = pc.if_else(
        pc.not_equal(qjoin, ""),
        pc.binary_join_element_wise("?", qjoin, ""),
        "",
    )
    canon = pc.binary_join_element_wise(pre, path, qpart, "")
    return pc.if_else(valid, canon, url)


def add_canonical_url(
    batch: pa.Table, url_col: str = "url", out_col: str = "canonical_url"
) -> pa.Table:
    """Batch map: append the canonical-URL column."""
    return batch.append_column(out_col, canonicalize_url_array(batch[url_col]))


def canonical_url_dup_groups(
    docs_ds,
    *,
    url_col: str = "url",
    id_col: str = "doc_id",
    min_count: int = 2,
    buckets: int = 64,
):
    """Canonical-URL dedup groups: one row per canonical URL shared by
    ``>= min_count`` docs, with the keeper (min id) and group size —
    the same narrow-shuffle shape as ``dedup_exact_docs`` (only
    (hash-bucket, canonical, id) rows move, never page payloads)."""
    from refimage_ray.functions.hashing import md5_u64_string_array

    def to_keys(b: pa.Table) -> pa.Table:
        canon = canonicalize_url_array(b[url_col])
        h = md5_u64_string_array(canon)
        return pa.table(
            {
                "canonical_url": canon,
                id_col: b[id_col],
                "url_bucket": pa.array(
                    (h % np.uint64(buckets)).astype(np.int64), pa.int64()
                ),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("canonical_url", sort=False)
            .agg(n_dups=(id_col, "size"), keeper=(id_col, "min"))
            .reset_index()
        )
        out = out[out["n_dups"] >= min_count]
        return out.astype({"n_dups": "int64", "keeper": "int64"})

    return (
        docs_ds.map_batches(to_keys, batch_format="pyarrow")
        .groupby("url_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
