"""Result snippets: best query-term window, engine-tokenizer-aligned
marking, and the serve/search integration."""

import pytest

from refimage_ray.query.snippets import best_snippet, snippets_for_hits


def test_best_window_covers_most_distinct_terms():
    text = ("alpha filler filler filler beta " + "x " * 200 +
            "alpha beta gamma together here")
    sn = best_snippet(text, ["alpha", "beta", "gamma"], width=60)
    assert sn["n_distinct"] == 3
    assert "[alpha] [beta] [gamma]" in sn["snippet"]


def test_marks_agree_with_engine_tokenizer():
    # "Sparkling" must NOT match the term "spark" (whole-token only),
    # and matching is case-insensitive
    sn = best_snippet("Sparkling water near the Spark cluster",
                      ["spark"], width=80)
    assert sn["n_matches"] == 1
    assert "[Spark]" in sn["snippet"] and "[Sparkling]" not in sn["snippet"]


def test_no_match_returns_head():
    sn = best_snippet("plain text with nothing relevant", ["zzz"], width=10)
    assert sn == {"snippet": "plain text", "n_matches": 0, "n_distinct": 0}


def test_window_respects_width_and_tie_break():
    # two windows with one term each -> earliest start wins
    text = "foo " + "pad " * 50 + "foo"
    sn = best_snippet(text, ["foo"], width=20)
    assert sn["snippet"].startswith("[foo]")


def test_term_longer_than_width():
    t = "a" * 50
    sn = best_snippet(f"{t} tail", [t], width=10)
    assert sn["n_distinct"] in (0, 1)  # no crash; deterministic


def test_term_longer_than_width_honors_width():
    # regression: with two occurrences and width < len(term), the old
    # two-pointer left j == i and spans[j-1] negative-indexed the LAST
    # span, returning the whole first..last region and ignoring width
    t = "longterm"
    text = t + " pad" * 30 + " " + t
    sn = best_snippet(text, [t], width=4)
    assert len(sn["snippet"]) <= 4          # truncated first match only
    assert sn["snippet"] == t[:4]
    assert sn["n_matches"] == 0             # no FULL match fits
    assert sn["n_distinct"] == 0


def test_snippets_for_hits_over_index(ray_session, built_index):
    from refimage_ray.query.engine import LocalSearcher

    index_dir = built_index[0]
    s = LocalSearcher(index_dir)
    hits = s.search("spark join", k=3)
    assert hits
    out = snippets_for_hits(index_dir, hits, "spark join", width=120)
    assert [(o["doc_id"], o["score"]) for o in out] == hits
    assert all(o["n_matches"] >= 1 for o in out)  # BM25 hits contain a term
    assert any("[" in o["snippet"] for o in out)


def test_unicode_lowercase_length_change_keeps_marks_aligned():
    # regression: spans were computed on text.lower(), whose length can
    # differ from the original ('İ'.lower() is 2 chars), shifting every
    # later span and garbling the marks
    text = "İstanbul guide to cats and more"
    sn = best_snippet(text, ["cats"], width=30)
    assert "[cats]" in sn["snippet"]
    assert sn["n_matches"] == 1
