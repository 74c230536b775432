"""Text-analysis stages for large-scale training-data pipelines.

All vectorized batch transforms over Arrow (``map_batches``-ready):

- :func:`quality_batch` — quality-scoring signals (token counts, mean
  token length, stopword ratio, alnum ratio) — SQL-oracle-checkable.
- :class:`LangId` — stateful n-gram/stopword language heuristic
  (actor-pool stage: profiles compiled once per actor).
- :func:`fingerprint_batch` — 64-bit rolling polynomial document
  fingerprint (Rabin–Karp over token hashes), fully vectorized via
  uint64 wraparound arithmetic.

Reference analog: the derived-feature pass of ingest — decode,
validate, measure (``/root/reference/src/refimage/storage.py:190-202``)
and the stateful encoder pattern (``clip_model.py:36-83``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from refimage_ray.config import DEFAULT_CONFIG, EngineConfig
from refimage_ray.stages.tokenize import _flat_tokens

# fixed stoplist (English function words; deterministic, mirrored in SQL oracles)
STOPWORDS = (
    "the a an and or of to in for on with at by from is are was were be "
    "been it its this that these those as not no"
).split()

_POLY_B = np.uint64(1099511628211)  # FNV prime as the rolling base


def quality_batch(batch: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Per-doc quality signals.  SQL-expressible → oracle-checked."""
    n = batch.num_rows
    flat, parent = _flat_tokens(batch["text"], cfg)
    n_tokens = np.bincount(parent, minlength=n).astype(np.int64)
    tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    sum_len = np.bincount(parent, weights=tok_len, minlength=n).astype(np.int64)
    stop_mask = pc.is_in(flat, value_set=pa.array(STOPWORDS)).to_numpy(
        zero_copy_only=False
    )
    n_stop = np.bincount(parent[stop_mask], minlength=n).astype(np.int64)
    n_chars = pc.utf8_length(batch["text"]).to_numpy(zero_copy_only=False).astype(np.int64)
    safe = np.maximum(n_tokens, 1).astype(np.float64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_stopwords": pa.array(n_stop, pa.int64()),
            "stopword_ratio": pa.array(n_stop / safe, pa.float64()),
            "mean_token_len": pa.array(sum_len / safe, pa.float64()),
            "alnum_ratio": pa.array(sum_len / np.maximum(n_chars, 1).astype(np.float64),
                                    pa.float64()),
        }
    )


class LangId:
    """Language-ID heuristic — stateful actor-pool stage.

    Scores each document against per-language marker-word profiles
    (built once per actor in ``__init__``), falling back to an
    ascii-density signal for CJK.  This is a deterministic heuristic,
    not a trained model — the honest sandbox stand-in for a fasttext
    stage; the Ray plumbing (actor pool, vectorized scoring) is the
    real deliverable.
    """

    PROFILES = {
        "en": "the of and to in is was for with that it on as are this".split(),
        "es": "el la de que y en los del se las por un con una su para".split(),
        "de": "der die und das von zu mit den nicht ist im ein auf".split(),
        "fr": "le la de et les des en un une du que pour dans ce il".split(),
    }

    def __init__(self) -> None:
        self.vocab: list[str] = []
        self.lang_of: list[str] = []
        for lang, words in self.PROFILES.items():
            for w in words:
                self.vocab.append(w)
                self.lang_of.append(lang)
        self.vocab_arr = pa.array(self.vocab, pa.string())
        self.langs = sorted(self.PROFILES)
        self.lang_idx = np.array(
            [self.langs.index(l) for l in self.lang_of], dtype=np.int64
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        flat, parent = _flat_tokens(batch["text"], DEFAULT_CONFIG)
        n_tokens = np.bincount(parent, minlength=n).astype(np.int64)
        idx = pc.index_in(flat, value_set=self.vocab_arr).to_numpy(
            zero_copy_only=False, writable=True
        )
        hit = ~np.isnan(idx) if idx.dtype.kind == "f" else idx >= 0
        counts = np.zeros((n, len(self.langs)), dtype=np.int64)
        if hit.any():
            lang_i = self.lang_idx[idx[hit].astype(np.int64)]
            np.add.at(counts, (parent[hit], lang_i), 1)
        best = counts.argmax(axis=1)
        best_n = counts[np.arange(n), best]
        conf = best_n / np.maximum(n_tokens, 1)
        pred = np.array(self.langs, dtype=object)[best]
        pred[best_n == 0] = "und"  # no markers → undetermined
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pred_lang": pa.array(pred.tolist(), pa.string()),
                "lang_confidence": pa.array(conf, pa.float64()),
            }
        )


def _token_hashes(flat: pa.Array) -> np.ndarray:
    # md5-prefix-u64 (not blake2b): DuckDB reproduces it as
    # ('0x' || substr(md5(t), 1, 16))::UBIGINT, giving the rolling
    # fingerprint an exact SQL value oracle (list_reduce Horner form).
    from refimage_ray.functions.hashing import md5_u64_string_array

    return md5_u64_string_array(flat)


def fingerprint_batch(batch: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    """64-bit rolling polynomial fingerprint per document.

    fp(doc) = Σ_i  h(tok_i) · B^(L−1−i)   (mod 2^64)

    Order-sensitive (unlike a bag-of-words hash) and fully vectorized:
    per-token powers come from a precomputed wraparound power table,
    per-doc sums via ``np.add.at`` on uint64 (mod-2^64 semantics).
    """
    n = batch.num_rows
    flat, parent = _flat_tokens(batch["text"], cfg)
    fp = np.zeros(n, dtype=np.uint64)
    if len(flat):
        th = _token_hashes(flat)
        lengths = np.bincount(parent, minlength=n).astype(np.int64)
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(lengths[:-1], out=starts[1:])
        pos = np.arange(len(th), dtype=np.int64) - starts[parent]
        exp = lengths[parent] - 1 - pos
        maxlen = int(lengths.max())
        powers = np.concatenate(
            ([np.uint64(1)],
             np.cumprod(np.full(maxlen, _POLY_B, dtype=np.uint64)))
        )  # uint64 wraparound == mod 2^64
        np.add.at(fp, parent, th * powers[exp])
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprint": pa.array(fp, pa.uint64()),
        }
    )
