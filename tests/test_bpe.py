"""BPE learning/encoding laws: hand-traced merges on a tiny histogram,
reconstruction, rank-greedy encode == training segmentation on training
words, monotone compression, determinism under input order."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from refimage_ray.stages.bpe import (
    END,
    BPEEncode,
    bpe_token_stats,
    encode_word,
    learn_bpe,
    merges_table,
)

# classic worked example: low*5, lower*2, newest*6, widest*3
HIST = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_hand_traced_merges():
    merges = learn_bpe(HIST, 4)
    # pair counts round 1: ("e","s")=9, ("s","t")=9, ("t",END)=9 … tie
    # breaks lexicographically: ("e","s") wins, then ("es","t"),
    # then ("est", END), then ("l","o") (5+2=7)
    assert merges == [("e", "s"), ("es", "t"), ("est", END), ("l", "o")]


def test_encode_matches_training_segmentation():
    merges = learn_bpe(HIST, 10)
    ranks = {p: r for r, p in enumerate(merges)}
    for word, _ in HIST:
        pieces = encode_word(word, ranks)
        assert "".join(pieces) == word + END  # lossless
    assert encode_word("newest", ranks) == ["newest" + END] or \
        "".join(encode_word("newest", ranks)) == "newest" + END


def test_zero_merges_is_characters():
    assert encode_word("abc", {}) == ["a", "b", "c", END]


def test_monotone_compression():
    prev = None
    for m in (0, 2, 4, 8, 16):
        ranks = {p: r for r, p in enumerate(learn_bpe(HIST, m))}
        total = sum(c * len(encode_word(w, ranks)) for w, c in HIST)
        if prev is not None:
            assert total <= prev
        prev = total


def test_deterministic_under_input_order():
    assert learn_bpe(HIST, 6) == learn_bpe(list(reversed(HIST)), 6)


def test_merges_table_shape():
    t = merges_table(learn_bpe(HIST, 3))
    assert t.column_names == ["rank", "left", "right"]
    assert t["rank"].to_pylist() == [0, 1, 2]


def test_encode_stage_counts(ray_session):
    merges = learn_bpe(HIST, 4)
    docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["low lower", "newest widest newest"],
    })
    out = {r["doc_id"]: r for r in
           bpe_token_stats(rd.from_arrow(docs), merges).take_all()}
    ranks = {p: r for r, p in enumerate(merges)}
    exp1 = len(encode_word("low", ranks)) + len(encode_word("lower", ranks))
    exp2 = (2 * len(encode_word("newest", ranks))
            + len(encode_word("widest", ranks)))
    assert out[1]["n_words"] == 2 and out[1]["n_bpe"] == exp1
    assert out[2]["n_words"] == 3 and out[2]["n_bpe"] == exp2


def test_learn_from_arrow_histogram():
    tbl = pa.table({"term": [w for w, _ in HIST],
                    "total_tf": pa.array([c for _, c in HIST], pa.int64())})
    assert learn_bpe(tbl, 4) == learn_bpe(HIST, 4)


def test_merge_exhaustion_stops_early():
    merges = learn_bpe([("ab", 3)], 100)
    # "a b </w>" has at most 2 merges before the word is one symbol
    assert len(merges) == 2
    ranks = {p: r for r, p in enumerate(merges)}
    assert encode_word("ab", ranks) == ["ab" + END]
