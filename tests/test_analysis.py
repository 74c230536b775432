"""Text-analysis stages: quality signals, lang-id, fingerprints."""

import numpy as np
import pyarrow as pa
import pytest

from refimage_ray.functions.text import tokenize
from refimage_ray.stages.analysis import (
    STOPWORDS,
    LangId,
    fingerprint_batch,
    quality_batch,
)


def _batch(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_quality_matches_naive():
    texts = ["The cat sat on the mat", "a a b!", "", "xyz"]
    out = quality_batch(_batch(texts)).to_pylist()
    for i, t in enumerate(texts):
        toks = tokenize(t)
        row = out[i]
        assert row["n_tokens"] == len(toks)
        assert row["n_stopwords"] == sum(tok in STOPWORDS for tok in toks)
        if toks:
            assert row["stopword_ratio"] == pytest.approx(
                sum(tok in STOPWORDS for tok in toks) / len(toks)
            )
            assert row["mean_token_len"] == pytest.approx(
                sum(len(tok) for tok in toks) / len(toks)
            )


def test_langid_markers():
    li = LangId()
    out = li(_batch([
        "the cat is on the mat and it was good",
        "el perro de la casa y los gatos en el patio",
        "der hund und die katze von dem haus",
        "le chat et les chiens dans la maison pour il",
        "zzz qqq www",
    ])).to_pylist()
    assert [r["pred_lang"] for r in out] == ["en", "es", "de", "fr", "und"]
    assert all(0.0 <= r["lang_confidence"] <= 1.0 for r in out)


def test_fingerprint_order_sensitive_and_deterministic():
    a = fingerprint_batch(_batch(["alpha beta gamma", "beta alpha gamma",
                                  "alpha beta gamma", ""]))
    fps = a["fingerprint"].to_pylist()
    assert fps[0] == fps[2]          # identical docs → identical fp
    assert fps[0] != fps[1]          # order matters (rolling hash)
    assert fps[3] == 0               # empty doc
    b = fingerprint_batch(_batch(["alpha beta gamma"]))
    assert b["fingerprint"].to_pylist()[0] == fps[0]  # cross-batch stable


def test_fingerprint_matches_scalar_reference():
    """Vectorized path == naive per-doc polynomial evaluation."""
    from refimage_ray.functions.hashing import md5_hex
    from refimage_ray.stages.analysis import _POLY_B

    text = "one two three two one"
    got = fingerprint_batch(_batch([text]))["fingerprint"].to_pylist()[0]
    toks = tokenize(text)
    # naive: Σ h_i * B^(L-1-i) mod 2^64 (h = md5-prefix u64)
    acc = np.uint64(0)
    L = len(toks)
    for i, tok in enumerate(toks):
        p = np.uint64(1)
        for _ in range(L - 1 - i):
            p = p * _POLY_B
        acc = acc + np.uint64(int(md5_hex(tok)[:16], 16)) * p
    assert got == int(acc)


def test_top_terms_per_lang_matches_naive(ray_session):
    """Grouped top-k pipeline == naive pandas recomputation (sf0.001)."""
    from collections import Counter

    import pandas as pd
    import pyarrow.parquet as pq

    from refimage_ray.pipelines.corpus import top_terms_per_lang

    sf = "/root/testdata/sf0.001"
    got = top_terms_per_lang(sf, n=3).to_pandas()

    docs = pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).to_pandas()
    df_counts: Counter = Counter()
    for _, row in docs.iterrows():
        for term in set(tokenize(row["text"])):
            df_counts[(row["lang"], term)] += 1
    naive = pd.DataFrame(
        [(l, t, c) for (l, t), c in df_counts.items()],
        columns=["lang", "term", "df"],
    )
    naive = (
        naive.sort_values(["lang", "df", "term"],
                          ascending=[True, False, True], kind="mergesort")
        .groupby("lang", sort=True)
        .head(3)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), naive, check_dtype=False
    )


def test_domain_stats_matches_naive():
    """Per-domain rollup == naive pandas recomputation from the raw
    columns (sf0.001); exercises the vectorized url-build + host-parse
    round trip."""
    import pandas as pd
    import pyarrow.parquet as pq

    from refimage_ray.pipelines.corpus import domain_stats

    sf = "/root/testdata/sf0.001"
    got = (
        domain_stats(sf).to_pandas()
        .sort_values("host").reset_index(drop=True)
    )
    docs = pq.read_table(
        f"{sf}/documents.parquet",
        columns=["doc_id", "lang", "source", "n_chars"],
    ).to_pandas()
    docs["host"] = docs["source"] + "." + docs["lang"] + ".example.org"
    naive = (
        docs.groupby("host", sort=True)
        .agg(n_docs=("doc_id", "size"), sum_chars=("n_chars", "sum"),
             max_chars=("n_chars", "max"))
        .reset_index()
    )
    pd.testing.assert_frame_equal(
        got[["host", "n_docs", "sum_chars", "max_chars"]], naive,
        check_dtype=False,
    )
