"""N-gram language-model perplexity scoring (CCNet-style quality filter).

Large-scale training-data pipelines (CCNet, Gopher/MassiveText, RefinedWeb)
filter web documents by the perplexity of a small language model trained on
a trusted corpus.  This module implements the classic distributed recipe
over Ray Data:

- **Train** (:func:`train_bigram_lm`): one pass over the corpus counting
  unigrams and within-doc adjacent bigrams — a per-batch Arrow
  ``group_by`` combiner shrinks each block to its local vocabulary before
  ONE narrow ``groupby().sum()`` exchange, so the shuffle is vocab-sized,
  never corpus-sized.  The resulting model (sorted vocab + count arrays)
  is a few MB even for web-scale vocabularies after ``min_count`` pruning.
- **Score** (:func:`score_perplexity`): the model is broadcast once via
  ``ray.put`` and each scoring task resolves it zero-copy from the object
  store; per-batch work is fully vectorized (one ``searchsorted`` over the
  vocab for token ids, one over the encoded bigram keys, ``np.bincount``
  for the per-doc log-prob sums).  No shuffle — scoring is embarrassingly
  parallel.
- **Filter** (:func:`perplexity_filter`): keep documents whose perplexity
  is at most a threshold (low perplexity ≈ fluent under the model).

Model definition (mirrored exactly by the DuckDB oracle in
``__ray_entry__.oracle_sql()['doc_perplexity']``): add-k smoothed bigram
probabilities

    p(w_i | w_{i-1}) = (C(w_{i-1}, w_i) + k) / (C(w_{i-1}) + k * V)

where ``C`` are training counts, ``V`` the unigram vocabulary size, and
unknown tokens contribute their zero counts (p = k / (0 + kV) = 1/V when
both lookups miss).  A document's perplexity is
``exp(-mean(ln p))`` over its ``n_tokens - 1`` bigram transitions;
documents with fewer than two tokens have no transitions and score NULL.

Reference analog: the reference has no LM layer — this extends the engine
toward the training-data-prep operators the build brief mandates (quality
scoring family, next to ``stages/analysis.py``'s heuristic scorer).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from refimage_ray.config import DEFAULT_CONFIG, EngineConfig
from refimage_ray.stages.tokenize import _flat_tokens


@dataclass(frozen=True)
class BigramLM:
    """Frozen count model: parallel sorted arrays for O(log V) lookups.

    ``bigram_keys`` encodes ``prev_id * (V + 1) + cur_id`` in int64 with
    ids shifted by +1 so that unknown tokens (id 0) never collide with a
    real pair key; keys are sorted for ``searchsorted`` probing.
    """

    vocab: np.ndarray          # unicode, sorted ascending
    unigram_counts: np.ndarray  # int64, aligned with vocab
    bigram_keys: np.ndarray     # int64, sorted
    bigram_counts: np.ndarray   # int64, aligned with bigram_keys
    k: float                    # add-k smoothing mass

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def _token_ids(self, tokens: np.ndarray) -> np.ndarray:
        """tokens → 1-based vocab ids, 0 for out-of-vocabulary."""
        pos = np.searchsorted(self.vocab, tokens)
        pos_c = np.minimum(pos, len(self.vocab) - 1)
        known = (
            (self.vocab[pos_c] == tokens) if len(self.vocab) else
            np.zeros(len(tokens), dtype=bool)
        )
        return np.where(known, pos_c + 1, 0).astype(np.int64)

    def transition_logprobs(
        self, prev: np.ndarray, cur: np.ndarray
    ) -> np.ndarray:
        """Vectorized ln p(cur | prev) for aligned token arrays."""
        if self.vocab_size == 0:
            raise ValueError(
                "cannot score with an empty-vocabulary LM (min_count "
                "pruned everything?)"
            )
        pid = self._token_ids(prev)
        cid = self._token_ids(cur)
        keys = pid * np.int64(self.vocab_size + 1) + cid
        bpos = np.searchsorted(self.bigram_keys, keys)
        bpos_c = np.minimum(bpos, max(len(self.bigram_keys) - 1, 0))
        if len(self.bigram_keys):
            bhit = self.bigram_keys[bpos_c] == keys
            bc = np.where(bhit, self.bigram_counts[bpos_c], 0)
        else:
            bc = np.zeros(len(keys), dtype=np.int64)
        uc = np.where(pid > 0, self.unigram_counts[np.maximum(pid - 1, 0)], 0)
        return np.log((bc + self.k) / (uc + self.k * self.vocab_size))


def _pair_partial(batch: pa.Table, cfg: EngineConfig) -> pa.Table:
    """One block → its local (kind, key, n_part) counts.

    ``kind`` 0 = unigram (key = token), 1 = bigram (key = "prev cur");
    a single output schema lets train run as ONE map + ONE groupby.
    """
    def _counted(keys: pa.Array | pa.ChunkedArray, kind: int) -> pa.Table:
        g = pa.table({"key": keys}).group_by("key").aggregate(
            [([], "count_all")]
        )
        return pa.table({
            "kind": pa.array(np.full(g.num_rows, kind, np.int8)),
            "key": g["key"],
            "n_part": pc.cast(g["count_all"], pa.int64()),
        })

    flat, parent = _flat_tokens(batch["text"], cfg)
    n = len(flat)
    parts = [_counted(flat, 0)]
    if n >= 2:
        same_doc = pa.array(parent[:-1] == parent[1:])
        left = flat.slice(0, n - 1).filter(same_doc)
        right = flat.slice(1, n - 1).filter(same_doc)
        parts.append(_counted(
            pc.binary_join_element_wise(left, right, " "), 1
        ))
    return pa.concat_tables(parts)


def train_bigram_lm(
    docs_ds,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    k: float = 1.0,
    min_count: int = 1,
) -> BigramLM:
    """One distributed counting pass over ``docs_ds`` (needs ``text``).

    The exchange carries one row per distinct (kind, key) — vocab-sized.
    ``min_count`` prunes rare UNIGRAMS from the vocabulary (their bigrams
    drop with them), bounding model size on heavy-tailed web vocabularies;
    the smoothing floor absorbs the pruned mass at score time.
    """
    from ray.data.aggregate import Sum

    counts = (
        docs_ds.map_batches(
            lambda b: _pair_partial(b, cfg), batch_format="pyarrow"
        )
        .groupby(["kind", "key"])
        .aggregate(Sum("n_part", alias_name="n"))
    )
    tbl = pa.Table.from_pandas(counts.to_pandas())  # vocab-sized: small
    kind = tbl["kind"].to_numpy(zero_copy_only=False)
    key = np.asarray(tbl["key"].to_pylist(), dtype=object)
    n = tbl["n"].to_numpy(zero_copy_only=False).astype(np.int64)

    umask = kind == 0
    uni_keys = key[umask].astype(str)
    uni_n = n[umask]
    if min_count > 1:
        keep = uni_n >= min_count
        uni_keys, uni_n = uni_keys[keep], uni_n[keep]
    order = np.argsort(uni_keys, kind="stable")
    vocab = uni_keys[order]
    uni_counts = uni_n[order]

    bmask = kind == 1
    if bmask.any():
        pairs = np.char.partition(key[bmask].astype(str), " ")
        prev_t, cur_t = pairs[:, 0], pairs[:, 2]
        lm_tmp = BigramLM(vocab, uni_counts,
                          np.empty(0, np.int64), np.empty(0, np.int64), k)
        pid = lm_tmp._token_ids(prev_t)
        cid = lm_tmp._token_ids(cur_t)
        keys64 = pid * np.int64(len(vocab) + 1) + cid
        bn = n[bmask]
        # pruned-vocab endpoints (id 0) collapse: re-aggregate by key
        border = np.argsort(keys64, kind="stable")
        keys64, bn = keys64[border], bn[border]
        uniq, start = np.unique(keys64, return_index=True)
        sums = np.add.reduceat(bn, start) if len(bn) else bn
        known = uniq % np.int64(len(vocab) + 1) != 0
        known &= uniq >= np.int64(len(vocab) + 1)  # prev known too
        bigram_keys, bigram_counts = uniq[known], sums[known]
    else:
        bigram_keys = np.empty(0, np.int64)
        bigram_counts = np.empty(0, np.int64)
    return BigramLM(vocab, uni_counts, bigram_keys, bigram_counts, float(k))


def save_bigram_lm(lm: BigramLM, out_dir: str) -> str:
    """Persist a trained LM as a parquet artifact (atomic: tmp dir +
    rename) so serving loads it instead of re-running the training
    pass — at web scale training is a full-corpus pass, loading is
    vocab-sized IO.  Layout: ``unigrams.parquet`` (term, n — vocab
    order IS the file order), ``bigrams.parquet`` (key, n — sorted),
    ``lm.json`` (k + row counts for fsck-style sanity)."""
    import json
    import os

    import pyarrow.parquet as pq

    tmp = out_dir + ".tmp"
    if os.path.exists(tmp):
        import shutil

        shutil.rmtree(tmp)
    os.makedirs(tmp)
    # per-generation nonce, echoed in every file: a loader spanning a
    # concurrent swap could otherwise pair lm.json from one generation
    # with parquet files from the next undetected when row counts
    # coincide (common with a capped vocab) — the nonce makes the
    # torn-read check sound, not just count-based
    gen = os.urandom(8).hex()
    meta = {b"lm_gen": gen.encode()}
    pq.write_table(
        pa.table({
            "term": pa.array(lm.vocab.tolist(), pa.string()),
            "n": pa.array(lm.unigram_counts, pa.int64()),
        }).replace_schema_metadata(meta),
        os.path.join(tmp, "unigrams.parquet"),
    )
    pq.write_table(
        pa.table({
            "key": pa.array(lm.bigram_keys, pa.int64()),
            "n": pa.array(lm.bigram_counts, pa.int64()),
        }).replace_schema_metadata(meta),
        os.path.join(tmp, "bigrams.parquet"),
    )
    with open(os.path.join(tmp, "lm.json"), "w") as f:
        json.dump({"k": lm.k, "n_vocab": int(lm.vocab_size),
                   "n_bigrams": int(len(lm.bigram_keys)),
                   "gen": gen}, f)
    # Swap with the old artifact renamed ASIDE first (not rmtree'd in
    # place): a crash between the two renames leaves either the old or
    # the new dir present under out_dir-adjacent names, never a
    # PARTIAL artifact.  This is crash-safe but NOT atomically visible:
    # between rename(out_dir, old) and rename(tmp, out_dir) a
    # concurrent loader sees out_dir briefly missing —
    # load_bigram_lm retries through that window.  (A truly
    # single-rename cutover would need out_dir to be a symlink flipped
    # via os.replace; kept a plain directory so existing artifacts and
    # rmtree-based callers stay compatible.)
    old = out_dir + ".old"
    if os.path.exists(old):
        import shutil

        shutil.rmtree(old)
    if os.path.exists(out_dir):
        os.rename(out_dir, old)
    os.rename(tmp, out_dir)
    if os.path.exists(old):
        import shutil

        shutil.rmtree(old)
    return out_dir


def load_bigram_lm(lm_dir: str, *, _retries: int = 20) -> BigramLM:
    """Load a :func:`save_bigram_lm` artifact — scores are
    bit-identical to the in-memory model that wrote it (frozen int
    counts, same float arithmetic).

    Retries the WHOLE load on a missing path or a meta/count mismatch:
    a concurrent :func:`save_bigram_lm` swap has a short window between
    its two renames where ``lm_dir`` does not exist, and a swap landing
    mid-load can pair one generation's ``lm.json`` with the next
    generation's parquet files (see the swap comment there); any
    snapshot that loads consistently is always a complete artifact."""
    import json
    import os
    import time

    import pyarrow.parquet as pq

    last_err: Exception | None = None
    for attempt in range(_retries):
        try:
            with open(os.path.join(lm_dir, "lm.json")) as f:
                meta = json.load(f)
            uni = pq.read_table(os.path.join(lm_dir, "unigrams.parquet"))
            big = pq.read_table(os.path.join(lm_dir, "bigrams.parquet"))
            gen = meta.get("gen")
            if gen is not None:  # pre-nonce artifacts skip the check
                for t in (uni, big):
                    md = t.schema.metadata or {}
                    if md.get(b"lm_gen", b"").decode() != gen:
                        raise _TornLMRead(
                            f"LM artifact {lm_dir}: file generations "
                            "disagree (concurrent swap mid-load)"
                        )
            vocab = np.asarray(uni["term"].to_pylist(), dtype=str)
            lm = BigramLM(
                vocab,
                uni["n"].to_numpy(zero_copy_only=False).astype(np.int64),
                big["key"].to_numpy(zero_copy_only=False).astype(np.int64),
                big["n"].to_numpy(zero_copy_only=False).astype(np.int64),
                float(meta["k"]),
            )
            if (lm.vocab_size != meta["n_vocab"]
                    or len(lm.bigram_keys) != meta["n_bigrams"]):
                raise _TornLMRead(
                    f"LM artifact {lm_dir} row counts disagree with "
                    "lm.json (concurrent swap or truncated write)"
                )
            return lm
        except (FileNotFoundError, _TornLMRead) as err:
            last_err = err
            if isinstance(err, FileNotFoundError) and not (
                os.path.exists(lm_dir + ".old")
                or os.path.exists(lm_dir + ".tmp")
                # a swap can finish (final rename + .old cleanup)
                # between our failed open and these probes — if lm_dir
                # itself now exists, keep retrying, don't fail fast
                or os.path.exists(lm_dir)
            ):
                # no swap artifact in sight: this is a plain wrong/
                # missing path, not the between-renames window — one
                # confirming re-check, then surface immediately
                # instead of burning ~1 s of retries on a misconfig
                if attempt >= 1:
                    break
            time.sleep(0.05)
    if isinstance(last_err, _TornLMRead):
        raise ValueError(str(last_err))
    raise last_err


class _TornLMRead(Exception):
    """Internal: a load observed files from two different swap
    generations; retried inside :func:`load_bigram_lm`."""


class PerplexityScore:
    """Actor-pool scoring stage: resolves the broadcast model once per
    actor in ``__init__``; each ``__call__`` is pure vectorized math."""

    def __init__(self, lm_ref, cfg: EngineConfig = DEFAULT_CONFIG,
                 round_to: int = 3):
        import ray

        self.lm: BigramLM = (
            ray.get(lm_ref) if not isinstance(lm_ref, BigramLM) else lm_ref
        )
        self.cfg = cfg
        self.round_to = round_to

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, parent = _flat_tokens(batch["text"], self.cfg)
        toks = flat.to_numpy(zero_copy_only=False).astype(str)
        n = len(toks)
        n_rows = batch.num_rows
        ppl = np.full(n_rows, np.nan)
        if n >= 2:
            same_doc = parent[:-1] == parent[1:]
            lp = self.lm.transition_logprobs(
                toks[:-1][same_doc], toks[1:][same_doc]
            )
            rows = parent[:-1][same_doc]
            sums = np.bincount(rows, weights=lp, minlength=n_rows)
            cnts = np.bincount(rows, minlength=n_rows)
            with np.errstate(divide="ignore", invalid="ignore"):
                ppl = np.where(cnts > 0, np.exp(-sums / np.maximum(cnts, 1)),
                               np.nan)
        out = {name: batch[name] for name in batch.column_names
               if name != "text"}
        # NaN (no transitions) → proper Arrow null
        out["ppl"] = pa.array(np.round(ppl, self.round_to), pa.float64(),
                              mask=np.isnan(ppl))
        return pa.table(out)


def score_perplexity(docs_ds, lm: BigramLM, cfg: EngineConfig = DEFAULT_CONFIG,
                     *, concurrency=(1, 8), round_to: int = 3):
    """(doc_id, …, ppl) — text dropped, NaN ppl for <2-token docs."""
    import ray

    lm_ref = ray.put(lm)
    return docs_ds.map_batches(
        PerplexityScore,
        fn_constructor_args=(lm_ref, cfg, round_to),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def perplexity_filter(docs_ds, lm: BigramLM, max_ppl: float,
                      cfg: EngineConfig = DEFAULT_CONFIG,
                      *, concurrency=(1, 8)):
    """Keep rows whose perplexity under ``lm`` is ≤ ``max_ppl``.

    Text is re-attached by scoring in-stage (the mask is computed on the
    same batch), so the pipeline stays one narrow map — no join."""
    import ray

    lm_ref = ray.put(lm)

    class _Gate(PerplexityScore):
        def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
            scored = super().__call__(
                pa.table({"doc_id": batch["doc_id"], "text": batch["text"]})
            )
            keep = pc.and_(
                pc.is_valid(scored["ppl"]),
                pc.less_equal(scored["ppl"], max_ppl),
            )
            return batch.filter(keep)

    return docs_ds.map_batches(
        _Gate,
        fn_constructor_args=(lm_ref, cfg),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
