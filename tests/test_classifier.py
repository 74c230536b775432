"""Distributed logistic regression laws: separable data reaches perfect
accuracy, loss is non-increasing (backtracking guarantee), gradients
match a numpy reference, training is deterministic."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from refimage_ray.config import DEFAULT_CONFIG
from refimage_ray.stages.classifier import (
    hashed_bow,
    score_logreg,
    train_logreg,
)
from refimage_ray.stages.tokenize import _flat_tokens

DIM = 256
# two disjoint vocabularies → linearly separable in hashed-BOW space
POS_WORDS = ["excellent", "clear", "thorough", "insight", "rigorous"]
NEG_WORDS = ["spam", "click", "buy", "cheap", "winner"]


def _corpus(n_per: int = 30) -> pa.Table:
    texts, labels = [], []
    for i in range(n_per):
        texts.append(" ".join(POS_WORDS[j % 5] for j in range(i, i + 4)))
        labels.append("good")
        texts.append(" ".join(NEG_WORDS[j % 5] for j in range(i, i + 4)))
        labels.append("bad")
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": texts,
        "label": labels,
    })


@pytest.fixture(scope="module")
def trained(ray_session):
    tbl = _corpus()
    ds = rd.from_arrow(tbl)
    w, hist = train_logreg(ds, "label", "good", dim=DIM, n_iter=15)
    return tbl, ds, w, hist


def test_loss_non_increasing(trained):
    _, _, _, hist = trained
    assert all(b <= a + 1e-12 for a, b in zip(hist, hist[1:])), hist


def test_separable_reaches_perfect_accuracy(trained):
    tbl, ds, w, _ = trained
    scored = score_logreg(ds, w, dim=DIM).to_pandas()  # keeps label col
    pred = scored["p"] >= 0.5
    assert (pred == (scored["label"] == "good")).all()


def test_gradient_matches_numpy(trained):
    """One partial-gradient round == dense numpy computation."""
    tbl, _, _, _ = trained
    flat, parent = _flat_tokens(tbl["text"], DEFAULT_CONFIG)
    X = hashed_bow(flat, parent, tbl.num_rows, DIM)
    y = (np.asarray(tbl["label"].to_pylist()) == "good").astype(np.float64)
    w = np.full(DIM + 1, 0.01)
    z = X @ w[:-1] + w[-1]
    p = 1 / (1 + np.exp(-z))
    ref_grad = np.concatenate([X.T @ (p - y), [(p - y).sum()]]) / len(y)

    import ray
    import ray.data as rd2

    from refimage_ray.stages.classifier import _features, _labels

    def partial(batch: pa.Table) -> pa.Table:
        Xb = _features(batch, DIM, DEFAULT_CONFIG)
        yb = _labels(batch, "label", "good")
        pb = 1 / (1 + np.exp(-(Xb @ w[:-1] + w[-1])))
        g = np.concatenate([Xb.T @ (pb - yb), [(pb - yb).sum()]])
        return pa.table({"grad": pa.array([g.tolist()],
                                          pa.list_(pa.float64()))})

    rows = rd2.from_arrow(tbl).map_batches(
        partial, batch_format="pyarrow"
    ).take_all()
    got = np.sum(np.stack([np.asarray(r["grad"]) for r in rows]),
                 axis=0) / tbl.num_rows
    np.testing.assert_allclose(got, ref_grad, rtol=1e-9, atol=1e-12)


def test_deterministic(trained, ray_session):
    tbl, ds, w, hist = trained
    w2, hist2 = train_logreg(ds, "label", "good", dim=DIM, n_iter=15)
    np.testing.assert_array_equal(w, w2)
    assert hist == hist2


def test_score_keeps_columns_drops_text(trained):
    tbl, ds, w, _ = trained
    [row] = score_logreg(ds.limit(1), w, dim=DIM).take_all()
    assert set(row) == {"doc_id", "label", "p"}


def test_empty_text_rows_score_at_bias(trained, ray_session):
    _, _, w, _ = trained
    probe = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()), "text": [""],
    }))
    [row] = score_logreg(probe, w, dim=DIM).take_all()
    expected = 1 / (1 + np.exp(-w[-1]))
    assert row["p"] == round(float(expected), 6)


def test_sample_frac_equals_prefiltered_training(ray_session):
    """sample_frac trains on EXACTLY the md5-u64-gated subset: weights
    are bit-identical to sample_frac=1.0 over the manually pre-filtered
    corpus, and differ from full-corpus training."""
    import hashlib

    tbl = _corpus(40)
    ds = rd.from_arrow(tbl)
    frac = 0.5

    def survives(i):
        h = int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "big")
        return (h % 4294967296) < int(frac * 4294967296)

    keep = [i for i in range(tbl.num_rows) if survives(i)]
    assert 0 < len(keep) < tbl.num_rows
    sub = tbl.take(pa.array(keep))

    w_sampled, _ = train_logreg(ds, "label", "good", dim=DIM, n_iter=8,
                                sample_frac=frac)
    w_manual, _ = train_logreg(rd.from_arrow(sub), "label", "good",
                               dim=DIM, n_iter=8)
    w_full, _ = train_logreg(ds, "label", "good", dim=DIM, n_iter=8)
    np.testing.assert_array_equal(w_sampled, w_manual)
    assert not np.array_equal(w_sampled, w_full)


def test_sample_frac_validation():
    with pytest.raises(ValueError):
        train_logreg(None, "label", "good", sample_frac=0.0)
    with pytest.raises(ValueError):
        train_logreg(None, "label", "good", sample_frac=1.5)
