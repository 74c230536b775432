"""Distributed linear text classifier (fastText/CCNet-style quality or
domain gate).

Production training-data pipelines (GPT-3's WebText-vs-CommonCrawl
quality filter, CCNet's language buckets, RefinedWeb's URL classifier)
gate documents with a SMALL linear classifier over cheap text features.
This module trains logistic regression over hashed bag-of-words features
with the same Ray-Data shape as ``stages/kmeans.py`` / PCA:

- **Features** (:func:`hashed_bow`): tokens hash into ``dim`` buckets
  (hashing trick — vocabulary-free, so the feature space is fixed and
  broadcastable at any corpus size); counts are L2-normalized.  Fully
  vectorized: one tokenize pass, ``md5_u64 % dim``, one
  ``np.add.at`` scatter per batch.
- **Training** (:func:`train_logreg`): full-batch gradient descent.
  Each iteration broadcasts the weight vector ONCE (``ray.put``); every
  block emits ONE partial row (gradient sum (dim+1 floats) + loss +
  count) — the exchange is ``num_blocks`` rows regardless of corpus
  size; the driver reduces in canonical order and steps with a
  deterministic backtracking line search (loss strictly non-increasing,
  asserted in tests).  No shuffle anywhere.
- **Scoring** (:func:`score_logreg`): broadcast weights, sigmoid per
  batch — embarrassingly parallel, composes with ``perplexity_filter``
  and the curation gates.

Everything is float64 and free of RNG, so training is bit-reproducible
given the same corpus (required for resume / lineage parity with the
rest of the engine).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from refimage_ray.config import DEFAULT_CONFIG, EngineConfig
from refimage_ray.functions.hashing import md5_u64_string_array
from refimage_ray.stages.tokenize import _flat_tokens


def hashed_bow(
    batch_text, parent: np.ndarray, n_rows: int, dim: int
) -> np.ndarray:
    """(n_rows, dim) float64 L2-normalized hashed token counts."""
    X = np.zeros((n_rows, dim))
    if len(parent):
        cols = (md5_u64_string_array(batch_text) % np.uint64(dim)).astype(
            np.int64
        )
        np.add.at(X, (parent, cols), 1.0)
    norms = np.linalg.norm(X, axis=1)
    norms[norms == 0.0] = 1.0
    return X / norms[:, None]


def _features(batch: pa.Table, dim: int, cfg: EngineConfig) -> np.ndarray:
    flat, parent = _flat_tokens(batch["text"], cfg)
    return hashed_bow(flat, parent, batch.num_rows, dim)


def _labels(batch: pa.Table, label_col: str, positive) -> np.ndarray:
    col = batch[label_col].to_numpy(zero_copy_only=False)
    return (col == positive).astype(np.float64)


def train_logreg(
    docs_ds,
    label_col: str,
    positive,
    *,
    dim: int = 4096,
    n_iter: int = 20,
    l2: float = 1e-4,
    sample_frac: float = 1.0,
    sample_key: str = "doc_id",
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> tuple[np.ndarray, list[float]]:
    """Full-batch logistic regression; returns (weights (dim+1,), loss
    history).  The last weight is the bias.  Loss is mean log-loss +
    (l2/2)·||w||² and is non-increasing across iterations by the
    backtracking guarantee.

    ``sample_frac < 1`` trains on a deterministic md5-u64 hash sample of
    the corpus (gate on ``sample_key``) — the production shape: a gate
    classifier doesn't need every document, and each GD iteration is a
    full pass over whatever it trains on, so a 10% sample cuts training
    cost ~10× while scoring still runs over the full corpus.  The gate
    is seed-free and resume/cluster-size-stable like every other
    sampling operator here.
    """
    import pyarrow.compute as pc
    import ray

    if not 0.0 < sample_frac <= 1.0:
        raise ValueError(f"sample_frac must be in (0, 1], got {sample_frac}")
    if sample_frac < 1.0:
        thr = np.uint64(int(sample_frac * 4294967296.0))

        def gate(b: pa.Table) -> pa.Table:
            h = md5_u64_string_array(
                pc.cast(b[sample_key], pa.string())
            ) % np.uint64(4294967296)
            return b.filter(pa.array(h < thr))

        docs_ds = docs_ds.select_columns(
            [sample_key, "text", label_col]
        ).map_batches(gate, batch_format="pyarrow")

    ds = docs_ds.select_columns(["text", label_col])
    w = np.zeros(dim + 1)

    def stats_for(w_ref):
        def partial(batch: pa.Table, _w=w_ref) -> pa.Table:
            wv = ray.get(_w)
            X = _features(batch, dim, cfg)
            y = _labels(batch, label_col, positive)
            z = X @ wv[:-1] + wv[-1]
            p = 1.0 / (1.0 + np.exp(-z))
            eps = 1e-12
            loss = -(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps))
            r = p - y
            g = np.concatenate([X.T @ r, [r.sum()]])
            return pa.table({
                "n": pa.array([batch.num_rows], pa.int64()),
                "loss": pa.array([float(loss.sum())], pa.float64()),
                "grad": pa.array([g.tolist()], pa.list_(pa.float64())),
            })

        # canonical reduce — grad in the key so identical (n, loss)
        # blocks still order deterministically; content-bucketed tree
        # reduce above the driver cap (bit-identical below it)
        from refimage_ray.functions.arrays import canonical_tree_sum

        agg = canonical_tree_sum(
            ds.map_batches(partial, batch_format="pyarrow"),
            key_fn=lambda r: (r["n"], r["loss"], r["grad"]),
        )
        return agg["n"], agg["loss"], np.asarray(agg["grad"])

    history: list[float] = []
    step = 1.0
    cur = stats_for(ray.put(w))
    for _ in range(n_iter):
        n, loss_sum, grad = cur
        loss = loss_sum / n + 0.5 * l2 * float(w @ w)
        grad = grad / n + l2 * w
        history.append(loss)
        gnorm2 = float(grad @ grad)
        if gnorm2 < 1e-18:
            break
        # deterministic backtracking: halve until Armijo holds.  The
        # accepted candidate's stats carry into the next iteration —
        # one full-corpus pass per iteration, not two (the candidate
        # pass IS next iteration's stats pass, same weights).
        while step > 1e-8:
            cand = w - step * grad
            cand_stats = stats_for(ray.put(cand))
            cand_loss = cand_stats[1] / n + 0.5 * l2 * float(cand @ cand)
            if cand_loss <= loss - 1e-4 * step * gnorm2:
                w = cand
                cur = cand_stats
                step = min(step * 2.0, 64.0)  # let it grow back
                break
            step *= 0.5
        else:
            break
    return w, history


class LogRegScore:
    """Actor stage: weights resolved once per actor; sigmoid per batch."""

    def __init__(self, w_ref, dim: int, cfg: EngineConfig = DEFAULT_CONFIG,
                 round_to: int = 6):
        import ray

        self.w = ray.get(w_ref) if not isinstance(w_ref, np.ndarray) else w_ref
        self.dim = dim
        self.cfg = cfg
        self.round_to = round_to

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = _features(batch, self.dim, self.cfg)
        p = 1.0 / (1.0 + np.exp(-(X @ self.w[:-1] + self.w[-1])))
        out = {n: batch[n] for n in batch.column_names if n != "text"}
        out["p"] = pa.array(np.round(p, self.round_to), pa.float64())
        return pa.table(out)


def score_logreg(docs_ds, w: np.ndarray, *, dim: int,
                 cfg: EngineConfig = DEFAULT_CONFIG, concurrency=(1, 8)):
    import ray

    return docs_ds.map_batches(
        LogRegScore,
        fn_constructor_args=(ray.put(np.asarray(w, np.float64)), dim, cfg),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
