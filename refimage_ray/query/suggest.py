"""Phrase-level "did you mean" suggestion (the Elasticsearch *phrase
suggester* analog): correct a whole multi-word query by searching the
per-term Levenshtein-≤1 candidate space for the sequence that maximizes
a corpus bigram language model.

Where ``LocalSearcher.suggest`` ranks single-term corrections by df,
this scores CONTEXT: for the probe ``"machne lerning"`` the bigram
``machine learning`` outranks the individually-plausible-but-incoherent
``machine warning`` because p(learning | machine) dominates.

Scoring (mirrored float-for-float in the SQL oracle): a candidate
sequence ``w1..wm`` scores ``ln p_uni(w1) + Σ ln p(wi | wi-1)`` under
the add-k bigram LM of :mod:`refimage_ray.stages.lm` with
``p_uni(w) = (c_w + k) / (T + kV)``.  Argmax with the deterministic
``(score desc, phrase asc)`` tie-break.

Scale note: the LM trains distributed once (vocab-sized exchange,
``train_bigram_lm``); suggestion itself is a driver-side lookup over
the candidate cross-product — bounded by ``max_candidates``^terms and
guarded by ``max_sequences``.  It is query-time serving work (ms), not
a data pass.

Reference analog: the reference's NL layer converts free text to
queries (``/root/reference/src/refimage/llm.py:396-460``); this is the
deterministic spelling-side counterpart over the same query surface.
"""

from __future__ import annotations

import itertools

import numpy as np

from refimage_ray.config import DEFAULT_CONFIG, EngineConfig
from refimage_ray.functions.text import tokenize
from refimage_ray.query.expand import build_deletes_index, fuzzy_matches
from refimage_ray.stages.lm import BigramLM


class PhraseSuggester:
    """Resident suggester over a trained :class:`BigramLM` — deletes
    index built once in ``__init__`` (the load-once discipline), each
    :meth:`suggest` call is pure lookups."""

    def __init__(
        self,
        lm: BigramLM,
        cfg: EngineConfig = DEFAULT_CONFIG,
        max_candidates: int = 8,
        max_sequences: int = 50_000,
    ) -> None:
        if lm.vocab_size == 0:
            raise ValueError("cannot suggest over an empty-vocabulary LM")
        self.lm = lm
        self.cfg = cfg
        self.max_candidates = max_candidates
        self.max_sequences = max_sequences
        self._deletes = build_deletes_index(lm.vocab.tolist())
        self._count_of = dict(
            zip(lm.vocab.tolist(), lm.unigram_counts.tolist())
        )
        self._total = float(lm.unigram_counts.sum())

    def _candidates(self, term: str) -> list[str]:
        """Lev-≤1 vocabulary candidates, capped to the
        ``max_candidates`` most frequent (count desc, term asc — the
        same deterministic cap rule as ``expand.cap_expansion``);
        ``[term]`` itself when nothing in the vocabulary is close."""
        cands = fuzzy_matches(self._deletes, term)
        if not cands:
            return [term]
        ranked = sorted(
            cands, key=lambda t: (-self._count_of.get(t, 0), t)
        )[: self.max_candidates]
        return sorted(ranked)

    def _uni_logprob(self, terms: np.ndarray) -> np.ndarray:
        ids = self.lm._token_ids(terms)
        c = np.where(
            ids > 0,
            self.lm.unigram_counts[np.maximum(ids - 1, 0)],
            0,
        ).astype(np.float64)
        return np.log(
            (c + self.lm.k) / (self._total + self.lm.k * self.lm.vocab_size)
        )

    def suggest(self, query: str) -> tuple[str, float]:
        """Best correction of ``query`` and its total log-probability.

        Ties break ``(score desc, phrase asc)`` — bit-reproducible
        across runs and cluster shapes (pure float64 arithmetic over
        frozen count arrays)."""
        terms = tokenize(query, self.cfg.token_pattern, self.cfg.term_filter)
        if not terms:
            raise ValueError("query has no tokens to correct")
        per_term = [self._candidates(t) for t in terms]
        n_seq = 1
        for c in per_term:
            n_seq *= len(c)
        if n_seq > self.max_sequences:
            raise ValueError(
                f"candidate space {n_seq} exceeds max_sequences "
                f"({self.max_sequences}) — raise it or trim the query"
            )
        seqs = list(itertools.product(*per_term))
        cols = [np.array([s[i] for s in seqs]) for i in range(len(terms))]
        score = self._uni_logprob(cols[0])
        for i in range(1, len(terms)):
            score = score + self.lm.transition_logprobs(cols[i - 1], cols[i])
        phrases = np.array([" ".join(s) for s in seqs])
        # (score desc, phrase asc): lexsort keys are last-key-primary
        best = np.lexsort((phrases, -score))[0]
        return str(phrases[best]), float(score[best])
