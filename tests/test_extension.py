"""Extension surface: analyzer/scorer registries, explain plan,
pagination validation (reference plugin-registry + validation analogs)."""

import pytest

from refimage_ray.extension import (
    ANALYZERS,
    SCORERS,
    explain,
    get_analyzer,
    get_scorer,
    register_analyzer,
)
from refimage_ray.functions.text import tokenize


def test_default_analyzer_matches_engine_tokenizer():
    s = "The quick-BROWN fox 42x"
    assert get_analyzer("default").tokenize(s) == tokenize(s)


def test_char3gram_analyzer():
    assert get_analyzer("char3gram").tokenize("ab sparkly") == [
        "ab", "spa", "par", "ark", "rkl", "kly",
    ]


def test_unknown_names_raise():
    with pytest.raises(KeyError, match="unknown analyzer"):
        get_analyzer("nope")
    with pytest.raises(KeyError, match="unknown scorer"):
        get_scorer("nope")


def test_scorer_protocol_default_matches_shared_definition():
    from refimage_ray.query.scorer import bm25_weight, idf

    sc = get_scorer("bm25")
    assert sc.idf(5, 100) == idf(5, 100)
    assert sc.weight(2.0, 30.0, 25.0) == bm25_weight(2.0, 30.0, 25.0, 1.2, 0.75)


def test_alternative_scorer_registered():
    sc = get_scorer("bm25l")
    assert sc.weight(2.0, 30.0, 25.0) > 0


def test_runtime_registration():
    @register_analyzer
    class Upper:
        name = "upper-test"

        def tokenize(self, text):
            return text.upper().split()

    assert get_analyzer("upper-test").tokenize("a b") == ["A", "B"]
    del ANALYZERS["upper-test"]


def test_explain_plan_shape():
    plan = explain("spark AND join NOT slow #en", num_shards=16)
    assert plan["plan"]["op"] == "and"
    text_node = plan["plan"]["operands"][0]
    assert text_node["op"] == "text"
    assert text_node["terms"][0]["term"] == "spark"
    assert 0 <= text_node["terms"][0]["shard"] < 16
    not_node = plan["plan"]["operands"][1]
    assert not_node["op"] == "not"
    # the #en tag rides inside the NOT's exclude operand (implicit AND)
    assert "exclude" in not_node


def test_list_docs_page_validation(ray_session):
    from refimage_ray.pipelines.corpus import list_docs_page

    with pytest.raises(ValueError, match="invalid sort_by"):
        list_docs_page("/root/testdata/sf0.001", sort_by="evil; DROP")
    with pytest.raises(ValueError, match="invalid sort_order"):
        list_docs_page("/root/testdata/sf0.001", sort_order="sideways")
    with pytest.raises(ValueError, match="non-negative"):
        list_docs_page("/root/testdata/sf0.001", limit=-1)
    page = list_docs_page("/root/testdata/sf0.001", limit=5, offset=2,
                          sort_by="doc_id", sort_order="asc")
    assert page["doc_id"].to_pylist() == [2, 3, 4, 5, 6]


def test_pluggable_scorer_end_to_end(ray_session, built_index):
    """search(scorer='bm25l') recomputes weights from stored (tf, dl)
    — ranks shift but doc coverage stays sane; default path unchanged."""
    from refimage_ray.query.engine import DistributedSearcher, LocalSearcher

    s = LocalSearcher(built_index[0])
    base = s.search("the data join", k=20)
    alt = s.search("the data join", k=20, scorer="bm25l")
    assert base and alt
    assert [d for d, _ in base] != [] and len(alt) == len(base)
    assert {d for d, _ in alt} & {d for d, _ in base}  # overlapping doc sets
    assert alt != base  # different scoring family → different scores
    with pytest.raises(KeyError):
        s.search("x", scorer="nope")
    # distributed path supports plugin scorers too (ships tf/dl arrays)
    d = DistributedSearcher(built_index[0], num_actors=2)
    assert d.search("the data join", k=20, scorer="bm25l") == alt
