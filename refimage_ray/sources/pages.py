"""`pages` corpus: deterministic synthesis + Parquet IO.

``input_hint`` fixes the input shape: Parquet with columns
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)``.  Everything here is seeded and wall-clock-free
(FIXTURES.md F1; the reference's mock layer seeds embeddings from
``hash(text)`` for the same reason,
``/root/reference/tests/mocks.py:52-70``).

The generator *embeds* the text into html (escaped) and the extractor
in ``stages/extract.py`` recovers it, so byte-identity per url is a
strict, testable invariant rather than an accident.
"""

from __future__ import annotations

import html as _html
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

EPOCH_US = 1_754_006_400_000_000  # 2025-08-01T00:00:00 UTC, fixed (no now())
LANGS = ["en", "es", "de", "fr", "zh", "ja"]

# ~200-term vocabulary: data-processing words + generated filler; the
# Zipfian draw over it guarantees hot stopword-like terms ("the", "a")
# to exercise the salted shuffle path.
_BASE_WORDS = (
    "the a of to and in data query join sort merge scan table row column "
    "batch stream window group filter key value hash index spark ray part "
    "order line item fast slow small big agg sum count distinct shuffle "
    "block heap list term doc score rank page text link node edge graph "
    "cache disk memory net io cpu task actor pool map reduce read write"
).split()
VOCAB = _BASE_WORDS + [f"w{i:03d}" for i in range(200 - len(_BASE_WORDS))]


def make_html(text: str, title: str) -> bytes:
    """Wrap text into a small deterministic html page (escaped)."""
    body = "".join(f"<p>{_html.escape(p, quote=False)}</p>" for p in text.split("\n\n"))
    return (
        f'<html><head><meta charset="utf-8"><title>{_html.escape(title, quote=False)}'
        f"</title></head><body><div class=\"main\">{body}</div>"
        f"<footer>gen</footer></body></html>"
    ).encode("utf-8")


def synthesize_pages(n_rows: int, seed: int = 42, dup_fraction: float = 0.01) -> pa.Table:
    """Deterministic Zipfian bag-of-words corpus (FIXTURES.md F1)."""
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, len(VOCAB) + 1, dtype=np.float64)
    probs = 1.0 / ranks**1.1
    probs /= probs.sum()
    lengths = rng.integers(20, 501, size=n_rows)
    vocab_arr = np.array(VOCAB)
    texts: list[str] = []
    for i in range(n_rows):
        toks = vocab_arr[rng.choice(len(VOCAB), size=lengths[i], p=probs)]
        texts.append(" ".join(toks))
    # ~dup_fraction of rows repeat an earlier row's text (distinct url)
    # to exercise exact dedup (reference analog: duplicate upload → 409,
    # /root/reference/src/refimage/api.py:866-877).
    n_dup = int(n_rows * dup_fraction)
    if n_dup and n_rows > 1:
        dup_targets = rng.choice(n_rows - 1, size=n_dup, replace=False)
        for j, tgt in enumerate(dup_targets):
            texts[n_rows - 1 - j] = texts[int(tgt)]
    langs = [LANGS[i % len(LANGS)] for i in range(n_rows)]
    urls = [f"https://site{i % 97}.example/{langs[i]}/page-{i}" for i in range(n_rows)]
    ts = (EPOCH_US + np.arange(n_rows, dtype=np.int64) * 137_000_000).astype("datetime64[us]")
    htmls = [make_html(t, f"t{i}") for i, t in enumerate(texts)]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def pages_from_documents(documents_path: str) -> pa.Table:
    """Wrap the driver's ``documents`` table into the pages shape.

    Used by bench/e2e so the full extract→index pipeline runs over the
    driver-provided corpora without synthesizing new text.
    """
    docs = pq.read_table(documents_path, columns=["doc_id", "text", "lang"])
    doc_ids = docs["doc_id"].to_numpy()
    langs = docs["lang"].to_pylist()
    texts = docs["text"].to_pylist()
    urls = [f"https://docs.example/{l}/doc-{d}" for d, l in zip(doc_ids, langs)]
    ts = (EPOCH_US + doc_ids.astype(np.int64) * 137_000_000).astype("datetime64[us]")
    htmls = [make_html(t, f"doc-{d}") for d, t in zip(doc_ids, texts)]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_pages(table: pa.Table, out_dir: str, rows_per_file: int = 16384) -> list[str]:
    """Write a pages table as multiple Parquet files (parallel read units).

    One file per slice → ``read_parquet`` parallelizes across files and
    a resumable build has natural input-lineage units.
    """
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for fi, start in enumerate(range(0, table.num_rows, rows_per_file)):
        path = os.path.join(out_dir, f"pages-{fi:05d}.parquet")
        pq.write_table(table.slice(start, rows_per_file), path)
        paths.append(path)
    return paths
