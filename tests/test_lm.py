"""Bigram LM perplexity (CCNet-style quality filter): hand-computed
probabilities, OOV handling, vocab pruning, and the filter gate."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from refimage_ray.stages.lm import (
    perplexity_filter,
    score_perplexity,
    train_bigram_lm,
)

CORPUS = pa.table({
    "doc_id": pa.array([1, 2, 3], pa.int64()),
    "text": ["a b a b", "a a", "x"],
})
# unigrams: a=4 b=2 x=1 (V=3); bigrams: "a b"=2 "b a"=1 "a a"=1


@pytest.fixture(scope="module")
def lm(ray_session):
    return train_bigram_lm(rd.from_arrow(CORPUS), k=1.0)


def test_counts(lm):
    assert list(lm.vocab) == ["a", "b", "x"]
    assert list(lm.unigram_counts) == [4, 2, 1]
    assert lm.bigram_counts.sum() == 4 and len(lm.bigram_keys) == 3


def test_hand_computed_perplexity(lm, ray_session):
    scored = {
        r["doc_id"]: r["ppl"]
        for r in score_perplexity(rd.from_arrow(CORPUS), lm).take_all()
    }
    # doc1: p(b|a)=3/7, p(a|b)=2/5, p(b|a)=3/7
    exp1 = math.exp(-(2 * math.log(3 / 7) + math.log(2 / 5)) / 3)
    # doc2: p(a|a)=2/7
    exp2 = math.exp(-math.log(2 / 7))
    assert scored[1] == round(exp1, 3)
    assert scored[2] == round(exp2, 3)
    assert scored[3] is None  # single token: no transitions


def test_oov_scores_uniform_floor(lm, ray_session):
    """Both-unknown transitions score k/(kV) = 1/V exactly."""
    probe = rd.from_arrow(pa.table({
        "doc_id": pa.array([9], pa.int64()), "text": ["zz qq"],
    }))
    [row] = score_perplexity(probe, lm).take_all()
    assert row["ppl"] == round(lm.vocab_size, 3)  # exp(-ln(1/V)) = V


def test_known_prev_unknown_cur(lm):
    # p(zz|a) = (0+1)/(4+3) = 1/7
    lp = lm.transition_logprobs(np.array(["a"]), np.array(["zz"]))
    assert lp[0] == pytest.approx(math.log(1 / 7))


def test_min_count_prunes_vocab(ray_session):
    lm2 = train_bigram_lm(rd.from_arrow(CORPUS), k=1.0, min_count=2)
    assert list(lm2.vocab) == ["a", "b"]  # x (count 1) pruned
    # bigrams touching pruned terms are gone too
    assert lm2.bigram_counts.sum() == 4  # none touched x here
    lm3 = train_bigram_lm(rd.from_arrow(CORPUS), k=1.0, min_count=5)
    assert len(lm3.vocab) == 0 and len(lm3.bigram_keys) == 0


def test_filter_gate(lm, ray_session):
    exp1 = math.exp(-(2 * math.log(3 / 7) + math.log(2 / 5)) / 3)
    kept = perplexity_filter(
        rd.from_arrow(CORPUS), lm, max_ppl=round(exp1, 3)
    ).take_all()
    assert [r["doc_id"] for r in kept] == [1]
    # text survives the gate untouched
    assert kept[0]["text"] == "a b a b"


def test_score_drops_text_keeps_other_columns(lm, ray_session):
    docs = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": ["a b"],
        "lang": ["en"],
    })
    [row] = score_perplexity(rd.from_arrow(docs), lm).take_all()
    assert set(row) == {"doc_id", "lang", "ppl"}


def test_empty_vocab_lm_refuses_to_score(ray_session):
    lm3 = train_bigram_lm(rd.from_arrow(CORPUS), k=1.0, min_count=5)
    assert lm3.vocab_size == 0
    with pytest.raises(ValueError, match="empty-vocabulary"):
        lm3.transition_logprobs(np.array(["a"]), np.array(["b"]))


def test_lm_save_load_roundtrip(ray_session, tiny_docs, tmp_path):
    """Persisted LM artifact loads bit-identical: same vocab, same
    transition log-probs, same phrase suggestion + score."""
    import numpy as np
    import ray.data as rd

    from refimage_ray.query.suggest import PhraseSuggester
    from refimage_ray.stages.lm import (
        load_bigram_lm, save_bigram_lm, train_bigram_lm,
    )

    lm = train_bigram_lm(rd.from_arrow(tiny_docs))
    d = str(tmp_path / "lm")
    save_bigram_lm(lm, d)
    lm2 = load_bigram_lm(d)
    assert (lm2.vocab == lm.vocab).all() and lm2.k == lm.k
    prev = np.array(["the", "data", "zzz"])
    cur = np.array(["data", "table", "the"])
    np.testing.assert_array_equal(
        lm.transition_logprobs(prev, cur), lm2.transition_logprobs(prev, cur)
    )
    probe = lm.vocab[np.argmax(lm.unigram_counts)][:-1] + "z"
    assert PhraseSuggester(lm).suggest(f"{probe} data") == \
        PhraseSuggester(lm2).suggest(f"{probe} data")
    # save is atomic-by-rename: re-save over the existing dir succeeds
    save_bigram_lm(lm, d)
    assert load_bigram_lm(d).vocab_size == lm.vocab_size


def test_lm_load_rejects_truncated_artifact(ray_session, tiny_docs, tmp_path):
    import json
    import os

    import ray.data as rd

    from refimage_ray.stages.lm import (
        load_bigram_lm, save_bigram_lm, train_bigram_lm,
    )

    lm = train_bigram_lm(rd.from_arrow(tiny_docs))
    d = str(tmp_path / "lm")
    save_bigram_lm(lm, d)
    meta = json.load(open(os.path.join(d, "lm.json")))
    meta["n_vocab"] += 1
    json.dump(meta, open(os.path.join(d, "lm.json"), "w"))
    import pytest

    with pytest.raises(ValueError, match="row counts"):
        load_bigram_lm(d)


def test_lm_save_crash_window_keeps_an_artifact(ray_session, tiny_docs,
                                                tmp_path, monkeypatch):
    """The old→aside / tmp→live swap never leaves ZERO artifacts: a
    crash after the old dir is renamed aside leaves a complete copy at
    out_dir + '.old' (and re-save cleans residue)."""
    import os

    import ray.data as rd

    from refimage_ray.stages.lm import (
        load_bigram_lm, save_bigram_lm, train_bigram_lm,
    )

    lm = train_bigram_lm(rd.from_arrow(tiny_docs))
    d = str(tmp_path / "lm")
    save_bigram_lm(lm, d)

    real_rename = os.rename

    def crashing_rename(src, dst):
        if src.endswith(".tmp"):
            raise OSError("simulated crash before the live rename")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", crashing_rename)
    with pytest.raises(OSError, match="simulated crash"):
        save_bigram_lm(lm, d)
    monkeypatch.undo()
    # the pre-crash artifact survives, complete, at the aside name
    assert load_bigram_lm(d + ".old").vocab_size == lm.vocab_size
    # a successful re-save restores the live name and clears residue
    save_bigram_lm(lm, d)
    assert load_bigram_lm(d).vocab_size == lm.vocab_size
    assert not os.path.exists(d + ".old")
    assert not os.path.exists(d + ".tmp")


def test_load_missing_path_fails_fast(tmp_path, monkeypatch):
    """A plain wrong lm_dir (no swap artifacts anywhere) must surface
    FileNotFoundError after ONE confirming re-check, not burn the full
    ~1 s retry budget reserved for the between-renames swap window."""
    import time as _time

    from refimage_ray.stages.lm import load_bigram_lm

    sleeps = []
    monkeypatch.setattr(_time, "sleep", lambda s: sleeps.append(s))
    with pytest.raises(FileNotFoundError):
        load_bigram_lm(str(tmp_path / "nope"))
    assert len(sleeps) <= 2


def test_load_retries_through_swap_window(tmp_path, monkeypatch):
    """When the .old swap artifact exists (mid-swap window), the loader
    keeps retrying the full budget — the window closes within it."""
    import time as _time

    from refimage_ray.stages.lm import load_bigram_lm

    lm_dir = tmp_path / "lm"
    (tmp_path / "lm.old").mkdir()  # a swap is plausibly in flight
    sleeps = []
    monkeypatch.setattr(_time, "sleep", lambda s: sleeps.append(s))
    with pytest.raises(FileNotFoundError):
        load_bigram_lm(str(lm_dir), _retries=5)
    assert len(sleeps) == 5
