"""Unit tests: tokenizer — Arrow vectorized path vs pure-Python
definition (the index/query symmetry invariant, SURVEY.md §2.2 M5/M8)."""

import pyarrow as pa

from refimage_ray.functions.text import is_blank, term_counts, tokenize
from refimage_ray.stages.tokenize import (
    doc_lengths,
    doc_stats_batch,
    tokenize_batch,
)


def _batch(texts):
    return pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )


def test_tokenize_python():
    assert tokenize("The quick-BROWN fox,fox! 42x") == [
        "the", "quick", "brown", "fox", "fox", "42x",
    ]
    assert tokenize("") == []
    assert tokenize("  \t ") == []


def test_is_blank():
    assert is_blank("") and is_blank("  ") and is_blank(None)
    assert not is_blank("x")


def test_batch_matches_python(tiny_pages):
    texts = tiny_pages["text"].to_pylist()[:50]
    out = tokenize_batch(_batch(texts))
    got = {}
    for row in out.to_pylist():
        got.setdefault(row["doc_id"], {})[row["term"]] = row["tf"]
    for i, t in enumerate(texts):
        assert got.get(i, {}) == dict(term_counts(t)), f"doc {i}"


def test_dl_column_consistent():
    texts = ["a b c", "x-y z2", "", "the the the"]
    out = tokenize_batch(_batch(texts))
    dls = doc_lengths(pa.array(texts, pa.string()))
    assert list(dls) == [len(tokenize(t)) for t in texts]
    for row in out.to_pylist():
        assert row["dl"] == dls[row["doc_id"]]


def test_doc_stats_batch():
    b = _batch(["a b c", "hello world"])
    s = doc_stats_batch(b)
    assert s["doc_len"].to_pylist() == [3, 2]
    assert s["n_chars"].to_pylist() == [5, 11]


def test_empty_text_produces_no_postings():
    out = tokenize_batch(_batch(["", "   ", "a"]))
    assert out.num_rows == 1
    assert out["term"].to_pylist() == ["a"]


def test_term_hash_stable():
    from refimage_ray.functions.hashing import blake2b64, hash_string_array

    out = tokenize_batch(_batch(["spark join spark"]))
    for row in out.to_pylist():
        assert row["term_hash"] == blake2b64(row["term"])
    arr = pa.array(["x", "y", "x"], pa.string())
    h = hash_string_array(arr)
    assert h[0] == h[2] != h[1]
