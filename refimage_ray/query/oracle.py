"""Pure-Python brute-force BM25 oracle.

The analog of the reference's deterministic mock layer:
``MockFAISSIndex`` reimplements exact cosine top-k in pure numpy so
the real engine can be asserted against an independent implementation
(``/root/reference/tests/mocks.py:124-184``; "Test Fallback/Avoidance"
policy, ``docs/test-framework-specification.md``).  No Arrow, no Ray,
no shared code paths with the distributed engine beyond
``query/scorer.py`` (the scoring *definition*) and
``functions/text.py`` (the tokenizer *definition*) — which both sides
must share by design.
"""

from __future__ import annotations

from collections import Counter

from refimage_ray.config import DEFAULT_CONFIG, EngineConfig
from refimage_ray.functions.text import tokenize
from refimage_ray.query.scorer import bm25_weight, idf, query_terms


class BM25Oracle:
    def __init__(
        self, docs: list[tuple[int, str]], cfg: EngineConfig = DEFAULT_CONFIG
    ) -> None:
        self.cfg = cfg
        self.dl: dict[int, int] = {}
        self.postings: dict[str, dict[int, int]] = {}
        for doc_id, text in docs:
            toks = tokenize(text, cfg.token_pattern, cfg.term_filter)
            self.dl[doc_id] = len(toks)
            for term, tf in Counter(toks).items():
                self.postings.setdefault(term, {})[doc_id] = tf
        self.n_docs = len(self.dl)
        self.avgdl = (sum(self.dl.values()) / self.n_docs) if self.n_docs else 1.0

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def idf(self, term: str) -> float:
        return idf(self.df(term), self.n_docs)

    def scores(self, query: str) -> dict[int, float]:
        """doc_id → score over all matching docs (disjunctive)."""
        acc: dict[int, float] = {}
        for term in query_terms(tokenize(query, self.cfg.token_pattern,
                                         self.cfg.term_filter)):
            plist = self.postings.get(term)
            if not plist:
                continue
            t_idf = self.idf(term)
            for doc_id, tf in plist.items():
                w = bm25_weight(
                    float(tf), float(self.dl[doc_id]), self.avgdl, self.cfg.k1, self.cfg.b
                )
                acc[doc_id] = acc.get(doc_id, 0.0) + t_idf * w
        return acc

    def search(
        self, query: str, k: int = 10, threshold: float = 0.0, mode: str = "or"
    ) -> list[tuple[int, float]]:
        acc = self.scores(query)
        if mode == "and":
            terms = [t for t in query_terms(
                tokenize(query, self.cfg.token_pattern,
                         self.cfg.term_filter))]
            acc = {
                d: s
                for d, s in acc.items()
                if all(d in self.postings.get(t, {}) for t in terms)
            }
        items = [(d, s) for d, s in acc.items() if s >= threshold]
        items.sort(key=lambda x: (-x[1], x[0]))
        return items[:k]
