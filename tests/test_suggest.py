"""Phrase suggester (query/suggest.py): context-aware correction vs a
hand-computed LM oracle, determinism, guards."""

from __future__ import annotations

import math
import re

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from refimage_ray.query.suggest import PhraseSuggester
from refimage_ray.stages.lm import train_bigram_lm

_TEXTS = [
    "machine learning improves search ranking",
    "machine learning models train on data",
    "machine warning lights on the dashboard",
    "deep learning is machine learning",
    "search ranking uses machine learning signals",
    "the warning was loud",
]


def _docs(texts=_TEXTS) -> pa.Table:
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


@pytest.fixture(scope="module")
def sug(ray_session):
    return PhraseSuggester(train_bigram_lm(rd.from_arrow(_docs())))


def test_context_beats_unigram_frequency(sug):
    # 'lerning' is lev-1 from 'learning'; the bigram p(learning|machine)
    # must pull the pair correction together
    phrase, _ = sug.suggest("machne lerning")
    assert phrase == "machine learning"


def test_exact_in_vocab_phrase_survives(sug):
    phrase, _ = sug.suggest("machine warning")
    assert phrase == "machine warning"


def test_score_matches_hand_formula(sug):
    """score = ln p_uni(w1) + ln p(w2|w1), add-1 over corpus counts."""
    toks = [re.findall(r"[a-z0-9]+", t) for t in _TEXTS]
    flat = [w for t in toks for w in t]
    uni = {w: flat.count(w) for w in set(flat)}
    big = {}
    for t in toks:
        for a, b in zip(t, t[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    V, T = len(uni), len(flat)
    want = (
        math.log((uni["machine"] + 1) / (T + V))
        + math.log((big[("machine", "learning")] + 1) / (uni["machine"] + V))
    )
    _, score = sug.suggest("machne lerning")
    assert score == pytest.approx(want, abs=1e-12)


def test_no_candidate_term_passes_through(sug):
    phrase, _ = sug.suggest("machine zzzzqqqq")
    assert phrase.startswith("machine ") and phrase.endswith("zzzzqqqq")


def test_empty_query_raises(sug):
    with pytest.raises(ValueError, match="no tokens"):
        sug.suggest("!!! ???")


def test_sequence_guard(ray_session):
    # 'ac' has TWO lev-1 candidates (aa, ab) -> 2 sequences > cap 1
    s = PhraseSuggester(
        train_bigram_lm(rd.from_arrow(_docs(["aa xx", "ab xx"]))),
        max_sequences=1,
    )
    with pytest.raises(ValueError, match="max_sequences"):
        s.suggest("ac xx")


def test_deterministic_tie_break(ray_session):
    # two equally-frequent, context-free candidates: ties go to the
    # lexicographically smaller phrase
    texts = ["aa xx", "ab xx"]  # p(aa)=p(ab), same transitions to xx
    s = PhraseSuggester(train_bigram_lm(rd.from_arrow(_docs(texts))))
    phrase, _ = s.suggest("ac xx")  # lev-1 of both aa and ab
    assert phrase == "aa xx"


def test_candidate_cap_by_frequency(ray_session):
    # cap 1: only the most frequent lev<=1 candidate is considered
    texts = ["cat toy", "cat toy", "car toy"]
    s = PhraseSuggester(
        train_bigram_lm(rd.from_arrow(_docs(texts))), max_candidates=1
    )
    phrase, _ = s.suggest("caz toy")
    assert phrase == "cat toy"  # 'cat' count 2 beats 'car' count 1


def test_suggester_honors_custom_analyzer(ray_session):
    """LM + probe tokenization must share the artifact's analyzer
    (term_filter chain): on an s_stem config the probe's plural
    misspelling corrects into the STEMMED vocabulary."""
    from refimage_ray.config import (
        EngineConfig, engine_config_from_manifest,
    )
    from refimage_ray.stages.lm import train_bigram_lm

    cfg = engine_config_from_manifest({"term_filter": "s_stem"})
    assert cfg.term_filter == "s_stem"
    assert isinstance(cfg, EngineConfig)
    texts = ["tables join tables", "tables join queries"]
    lm = train_bigram_lm(rd.from_arrow(_docs(texts)), cfg)
    # vocabulary is stemmed: 'tables' -> 'table'
    assert "table" in lm.vocab.tolist() and "tables" not in lm.vocab.tolist()
    s = PhraseSuggester(lm, cfg=cfg)
    phrase, _ = s.suggest("tabl joins")  # probe stems 'joins' -> 'join'
    assert phrase == "table join"
