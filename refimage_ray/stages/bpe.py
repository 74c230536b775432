"""Byte-pair-encoding vocabulary learning + encoding over Ray Data.

The standard scale recipe (sentencepiece / GPT-2 tokenizer training):
the only corpus-sized work is the **word-frequency histogram** — here
that is ``pipelines.corpus.term_stats``'s shape (per-batch Arrow
combiner → ONE vocab-sized ``groupby().sum()`` exchange).  The merge
loop itself (:func:`learn_bpe`) runs over the *histogram*, so its cost
is O(|vocab| × merges) and independent of corpus size — at 100 TB the
histogram is still a few-MB table, which is why every production BPE
trainer is structured exactly this way.

Encoding (:class:`BPEEncode`) is a stateless-input actor stage: merge
ranks are built once per actor in ``__init__``; per batch, only the
batch's **unique** words are encoded (memoized across batches in a
per-actor cache — after warm-up the per-batch Python work is
cache-lookups only), and per-word piece counts scatter back to docs via
``np.bincount``.

Determinism: merge selection breaks count ties on the lexicographically
smallest (left, right) pair, so the merge table is a pure function of
the histogram.

Reference analog: none (the reference tokenizes with a regex only);
this implements the "BPE-ish" token-counting axis of the build brief as
a real learned-subword pipeline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from refimage_ray.config import DEFAULT_CONFIG, EngineConfig
from refimage_ray.stages.tokenize import _flat_tokens

END = "</w>"  # end-of-word sentinel symbol (classic BPE formulation)


def learn_bpe(
    word_counts: "pa.Table | list[tuple[str, int]]",
    num_merges: int,
) -> list[tuple[str, str]]:
    """Greedy BPE merges over a (word, count) histogram.

    Incremental pair-count maintenance: each merge updates only the
    words that contain the merged pair (tracked by an inverted
    pair → word-ids index), the textbook O(vocab × merges) trainer.
    """
    if isinstance(word_counts, pa.Table):
        cols = word_counts.column_names
        wcol = "term" if "term" in cols else "word"
        ccol = next(c for c in cols if c != wcol)
        items = list(zip(word_counts[wcol].to_pylist(),
                         word_counts[ccol].to_pylist()))
    else:
        items = list(word_counts)
    items.sort()  # id order deterministic regardless of input order

    words: list[list[str]] = [list(w) + [END] for w, _ in items]
    counts = [int(c) for _, c in items]

    pair_counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for i, sym in enumerate(words):
        c = counts[i]
        for pair in zip(sym, sym[1:]):
            pair_counts[pair] = pair_counts.get(pair, 0) + c
            where.setdefault(pair, set()).add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] <= 0:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for i in list(where.get(best, ())):
            sym, c = words[i], counts[i]
            # remove old pair contributions of this word
            for pair in zip(sym, sym[1:]):
                pair_counts[pair] -= c
                if pair_counts[pair] <= 0:
                    pair_counts.pop(pair, None)
                ws = where.get(pair)
                if ws is not None:
                    ws.discard(i)
                    if not ws:
                        where.pop(pair, None)
            # apply the merge left-to-right
            out: list[str] = []
            j = 0
            while j < len(sym):
                if (j + 1 < len(sym)
                        and sym[j] == best[0] and sym[j + 1] == best[1]):
                    out.append(joined)
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            words[i] = out
            for pair in zip(out, out[1:]):
                pair_counts[pair] = pair_counts.get(pair, 0) + c
                where.setdefault(pair, set()).add(i)
    return merges


def merges_table(merges: list[tuple[str, str]]) -> pa.Table:
    return pa.table({
        "rank": pa.array(range(len(merges)), pa.int64()),
        "left": pa.array([a for a, _ in merges], pa.string()),
        "right": pa.array([b for _, b in merges], pa.string()),
    })


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """GPT-2-style greedy-by-rank merge application to one word."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


class BPEEncode:
    """map_batches stage: (doc_id, text) → (doc_id, n_words, n_bpe).

    Ranks dict built once per actor; encoded words memoized across
    batches.  Per batch: ONE tokenize pass, unique-word encode (cache
    hits after warm-up), bincount scatter back to rows."""

    def __init__(self, merges_ref, cfg: EngineConfig = DEFAULT_CONFIG):
        import ray

        merges = (
            ray.get(merges_ref)
            if not isinstance(merges_ref, list) else merges_ref
        )
        self.ranks = {pair: r for r, pair in enumerate(merges)}
        self.cfg = cfg
        self.cache: dict[str, int] = {}

    def _pieces_of(self, word: str) -> int:
        n = self.cache.get(word)
        if n is None:
            n = len(encode_word(word, self.ranks))
            self.cache[word] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, parent = _flat_tokens(batch["text"], self.cfg)
        n_rows = batch.num_rows
        toks = flat.to_numpy(zero_copy_only=False).astype(str)
        uniq, inv = np.unique(toks, return_inverse=True)
        piece_counts = np.fromiter(
            (self._pieces_of(w) for w in uniq), np.int64, len(uniq)
        )
        per_tok = piece_counts[inv] if len(toks) else np.empty(0, np.int64)
        n_words = np.bincount(parent, minlength=n_rows).astype(np.int64)
        n_bpe = (np.bincount(parent, weights=per_tok, minlength=n_rows)
                 .astype(np.int64))
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_words": pa.array(n_words),
            "n_bpe": pa.array(n_bpe),
        })


def bpe_token_stats(docs_ds, merges: list[tuple[str, str]],
                    cfg: EngineConfig = DEFAULT_CONFIG,
                    *, concurrency=(1, 8)):
    """Per-doc word vs learned-subword token counts."""
    import ray

    merges_ref = ray.put(merges)
    return docs_ds.map_batches(
        BPEEncode,
        fn_constructor_args=(merges_ref, cfg),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
