"""URL canonicalization (stages/urls.py): rewrite cases, idempotence,
dedup groups, block-layout invariance."""

from __future__ import annotations

import pyarrow as pa
import pytest

import ray.data as rd

from refimage_ray.stages.urls import (
    add_canonical_url,
    canonical_url_dup_groups,
    canonicalize_url_array,
)

CASES = [
    # (input, canonical)
    ("HTTPS://WWW.Site5.Example:443/d/p-8/?b=2&a=1&utm_source=x#frag",
     "https://site5.example/d/p-8?a=1&b=2"),
    ("http://Host.com:80/", "http://host.com"),
    ("http://host.com:8080/x?z=1&y=2", "http://host.com:8080/x?y=2&z=1"),
    ("https://a.b/path", "https://a.b/path"),
    ("https://a.b/path?utm_campaign=x&gclid=1&ref=z&fbclid=2",
     "https://a.b/path"),
    ("not a url", "not a url"),                    # passthrough
    ("ftp://X.Y/Z/", "ftp://x.y/Z"),               # path case preserved
    ("https://a.b", "https://a.b"),
    ("https://a.b/?", "https://a.b"),
    ("https://www.a.b///", "https://a.b"),
    ("http://a.b:443/x", "http://a.b:443/x"),      # 443 not http's default
]


def test_canonicalize_cases():
    got = canonicalize_url_array(pa.array([c[0] for c in CASES])).to_pylist()
    for (inp, want), g in zip(CASES, got):
        assert g == want, inp


def test_canonicalize_null_passthrough():
    got = canonicalize_url_array(pa.array([None, "https://A.b/"]))
    assert got.to_pylist() == [None, "https://a.b"]


def test_canonicalize_idempotent():
    once = canonicalize_url_array(pa.array([c[0] for c in CASES]))
    twice = canonicalize_url_array(once)
    assert once.to_pylist() == twice.to_pylist()


def test_add_canonical_url_batch():
    b = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "url": pa.array(["HTTP://X.y/"])})
    out = add_canonical_url(b)
    assert out["canonical_url"].to_pylist() == ["http://x.y"]
    assert out["url"].to_pylist() == ["HTTP://X.y/"]  # original kept


def test_dup_groups(ray_session):
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "url": pa.array(
                [
                    "https://www.a.b/x/?utm_source=1",
                    "HTTPS://a.b/x",
                    "https://a.b/x/",
                    "https://c.d/only",
                    "http://a.b/x",  # different scheme → different group
                ]
            ),
        }
    )
    got = (
        canonical_url_dup_groups(rd.from_arrow(tbl))
        .to_pandas()
        .sort_values("canonical_url")
        .reset_index(drop=True)
    )
    assert len(got) == 1
    assert got["canonical_url"][0] == "https://a.b/x"
    assert (got["n_dups"][0], got["keeper"][0]) == (3, 1)


def test_dup_groups_block_invariance(ray_session):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(12), pa.int64()),
            "url": pa.array(
                [f"https://www.s{i // 3}.e/p?utm_ref=x&b={i % 2}"
                 for i in range(12)]
            ),
        }
    )
    one = (
        canonical_url_dup_groups(rd.from_arrow(tbl))
        .to_pandas().sort_values("canonical_url").reset_index(drop=True)
    )
    many = (
        canonical_url_dup_groups(rd.from_arrow(tbl).repartition(6))
        .to_pandas().sort_values("canonical_url").reset_index(drop=True)
    )
    assert one.equals(many)
    assert (one["n_dups"] >= 2).all() and len(one) > 0
