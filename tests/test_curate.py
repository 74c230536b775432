"""Composed curation pipeline: quality gate + lang gate + exact dedup
in one streaming chain (pipelines/curate.py) — the canonical
training-data prep flow."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from refimage_ray.pipelines.curate import CurationStage, curated_doc_ids


def _mk_docs():
    en = ("the data table is joined with the index and the result of "
          "the scan is sorted by the key for the merge of the batch "
          "stream in the window of the query plan")  # 33 tokens, stopword-rich
    short = "the tiny doc"
    no_stop = " ".join(f"tok{i}" for i in range(40))  # 40 tokens, 0 stopwords
    fr = ("le la de et les des en un une du que pour dans ce il "
          "le la de et les des en un une du que pour dans ce il "
          "le la de et les des en un une du que pour dans ce il")
    return pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "text": pa.array([en, en, short, no_stop, fr, en + " extra"], pa.string()),
    })


def test_curated_doc_ids_gates_and_dedup(ray_session):
    out = curated_doc_ids(rd.from_arrow(_mk_docs()))
    ids = out["doc_id"].to_pylist()
    # doc 1/2 identical en text → keeper is min doc_id 1; doc 6 is a
    # distinct en doc; 3 fails min_tokens, 4 fails stopword_ratio,
    # 5 fails the lang gate (predicted fr)
    assert ids == [1, 6]


def test_curation_stage_columns(ray_session):
    st = CurationStage()
    t = st(_mk_docs())
    assert t.column_names == ["doc_id", "n_tokens", "stopword_ratio",
                              "pred_lang", "content_key", "content_key2"]
    # identical texts → identical content keys, distinct doc ids
    rows = {d: (a, b) for d, a, b in zip(t["doc_id"].to_pylist(),
                                         t["content_key"].to_pylist(),
                                         t["content_key2"].to_pylist())}
    assert rows[1] == rows[2] and rows[1] != rows[6]
    assert t["pred_lang"].to_pylist()[4] == "fr"


def test_flagship_build_with_inflight_curation(ray_session, tiny_pages, tmp_path):
    """build_from_pages(curate=...) drops gate failures before staging:
    the staged corpus is exactly the gate-passing extracted docs, and
    the index is valid (searchable, stats consistent)."""
    import pyarrow.compute as pc

    from refimage_ray.config import EngineConfig
    from refimage_ray.index.reader import staged_docs
    from refimage_ray.pipelines.flagship import build_from_pages
    from refimage_ray.query.engine import LocalSearcher
    from refimage_ray.sources.pages import write_pages
    from refimage_ray.stages.analysis import LangId, quality_batch
    from refimage_ray.stages.extract import ExtractText

    pages_dir = str(tmp_path / "pages")
    write_pages(tiny_pages, pages_dir, rows_per_file=64)
    idx = str(tmp_path / "idx")
    gates = {"min_tokens": 20, "min_stopword_ratio": 0.02, "lang": "en"}
    cfg = EngineConfig(num_shards=4, salt_buckets=2)
    res = build_from_pages(pages_dir, idx, cfg, curate=gates)

    # expected: extract locally, apply the same gates, dedup exact
    ex = ExtractText()(tiny_pages.drop_columns(["text"]))
    ex = ex.append_column("doc_id",
                          pa.array(range(ex.num_rows), pa.int64()))
    q = quality_batch(ex)
    keep = pc.and_(
        pc.and_(pc.greater_equal(q["n_tokens"], 20),
                pc.greater_equal(q["stopword_ratio"], 0.02)),
        pc.equal(LangId()(ex)["pred_lang"], "en"),
    )
    survivors = ex.filter(keep)
    n_unique = len(set(survivors["text"].to_pylist()))
    assert 0 < n_unique < tiny_pages.num_rows  # gates actually bite
    assert res.metrics["n_docs"] == n_unique
    assert staged_docs(idx).count() == n_unique
    hits = LocalSearcher(idx).search("the data", k=5)
    assert hits


def test_curation_gate_on_documents_table(ray_session):
    """The CLI's ``build --documents --curate`` path: the same gate
    applies to a corpus that ALREADY carries doc ids (the pages path
    attaches a transient index; here the real ids are used and
    preserved)."""
    from refimage_ray.pipelines.flagship import apply_curation_gate

    docs = _mk_docs()
    gated = apply_curation_gate(
        rd.from_arrow(docs),
        {"min_tokens": 5, "min_stopword_ratio": 0.0, "lang": "en"},
    ).take_all()
    assert 0 < len(gated) < docs.num_rows  # gates bite
    kept_ids = {r["doc_id"] for r in gated}
    assert kept_ids <= set(docs["doc_id"].to_pylist())  # ids preserved
    # schema untouched: the gate filters rows, never rewrites columns
    assert set(gated[0].keys()) == set(docs.column_names)


def test_curated_doc_ids_empty_survivors(ray_session):
    """Gates that nothing passes → empty (doc_id) table, not a crash
    (empty groupby + collect path)."""
    out = curated_doc_ids(rd.from_arrow(_mk_docs()), min_tokens=10_000)
    assert out.num_rows == 0
    assert out.column_names == ["doc_id"]
