"""Byte-identical text extraction per url (BASELINE.json input_hint;
verified row-for-row, the analog of the reference's exact self-match
tests ``/root/reference/tests/test_driver_real.py:139-144``)."""

import pyarrow as pa

from refimage_ray.sources.pages import (
    PAGES_SCHEMA,
    make_html,
    pages_from_documents,
    synthesize_pages,
)
from refimage_ray.stages.extract import ExtractText


def test_pages_schema_matches_input_hint(tiny_pages):
    assert tiny_pages.schema.equals(PAGES_SCHEMA)


def test_synthesis_deterministic():
    a = synthesize_pages(60, seed=42)
    b = synthesize_pages(60, seed=42)
    assert a.equals(b)
    c = synthesize_pages(60, seed=43)
    assert not a.equals(c)


def test_extract_byte_identical_synthetic(tiny_pages):
    ex = ExtractText()
    out = ex(tiny_pages.drop_columns(["text"]))
    got = out["text"].to_pylist()
    exp = tiny_pages["text"].to_pylist()
    for url, g, e in zip(tiny_pages["url"].to_pylist(), got, exp):
        assert g == e, f"extraction not byte-identical for {url}"


def test_extract_byte_identical_documents_corpus():
    pages = pages_from_documents("/root/testdata/sf0.001/documents.parquet")
    ex = ExtractText()
    out = ex(pages.drop_columns(["text"]))
    assert out["text"].to_pylist() == pages["text"].to_pylist()


def test_extract_handles_entities_and_multi_paragraph():
    ex = ExtractText()
    text = "x < y & z\n\nsecond ¶ para"
    html = make_html(text, "t")
    batch = pa.table({"url": pa.array(["u"]), "html": pa.array([html], pa.binary())})
    assert ex(batch)["text"].to_pylist() == [text]


def test_extract_drops_html_column(tiny_pages):
    ex = ExtractText()
    out = ex(tiny_pages.drop_columns(["text"]))
    assert "html" not in out.column_names  # projection early (SURVEY §4.2)


def test_extract_fallback_no_paragraphs():
    ex = ExtractText()
    batch = pa.table(
        {"html": pa.array([b"<html><body><div>plain stuff</div></body></html>"],
                          pa.binary())}
    )
    assert "plain stuff" in ex(batch)["text"].to_pylist()[0]


def test_extract_invalid_utf8_batch_falls_back():
    """Regression (ADVICE r1): invalid UTF-8 html bytes failed the
    vectorized cast for the whole batch; it must fall back to the
    tolerant scalar path (errors='replace') row-for-row."""
    import pyarrow as pa

    from refimage_ray.stages.extract import ExtractText

    good = b"<html><body><p>hello world</p></body></html>"
    bad = b"<html><body><p>bad \xff\xfe bytes</p></body></html>"
    batch = pa.table(
        {
            "url": pa.array(["u0", "u1"], pa.string()),
            "html": pa.array([good, bad], pa.binary()),
        }
    )
    ex = ExtractText()
    out = ex(batch)
    assert out["text"].to_pylist() == [ex.extract_one(good), ex.extract_one(bad)]
    assert "�" in out["text"][1].as_py()

def test_extract_text_batch_parity(tiny_pages):
    """The task-pool flavor (module-global cached state) must produce
    the exact bytes of the actor-pool class — it is the flagship
    default, so parity is load-bearing."""
    from refimage_ray.stages.extract import extract_text_batch

    inp = tiny_pages.drop_columns(["text"])
    assert extract_text_batch(inp).equals(ExtractText()(inp))
    # second call exercises the cached path
    assert extract_text_batch(inp).equals(ExtractText()(inp))


def test_fast_path_matches_scalar_on_divergent_shapes():
    """Regression: the vectorized fast path ignored the <body>
    restriction and matched '<p' case-sensitively, so these shapes
    extracted different text depending on which path the batch took."""
    import pyarrow as pa

    from refimage_ray.stages.extract import ExtractText

    ex = ExtractText()
    cases = [
        b"<body>stuff</body><p>a</p>",   # <p> OUTSIDE body
        b"<p>a</p><P>b</P>",             # case variants
        b'<body><P CLASS="x">upper</P></body>',
        b"<body><p>one</p><p>two</p></body>",
        b"no tags at all",
    ]
    batch = pa.table(
        {
            "html": pa.array(cases, pa.binary()),
            "url": pa.array([f"u{i}" for i in range(len(cases))]),
        }
    )
    assert ex(batch)["text"].to_pylist() == [ex.extract_one(c) for c in cases]
