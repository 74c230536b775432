"""Function scoring: multiplicative decay boosts over doc values.

Elasticsearch ``function_score`` decay analog (exp / gauss / linear)
re-expressed for this engine: the boost is a per-document multiplier
computed from a rank-aligned doc-value column (``index/docvalues.py``),
so it composes with every exact-evaluation feature (``where=``,
``min_match=``, ``after=``) and is vectorized over the candidate set —
O(candidates) numpy, no per-row Python.

Scoring correctness note: a decay boost makes the final score depend
on a doc value, so the MaxScore/dense pruned paths (whose θ bounds the
*unboosted* kth score) are bypassed — same argument as doc-value
filters (see ``_SearcherBase._match_ranks_scores``).  The reference
has no scoring-function layer (its ranking is fixed BM25,
/root/reference/src/refimage/search.py); this follows the public ES
semantics: value at distance 0 is 1.0, value at distance ``scale``
is ``decay``, missing values boost by 1.0.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

_KINDS = ("exp", "gauss", "linear")


@dataclass(frozen=True)
class DecaySpec:
    """``score' = score * decay_fn(|value - origin|)``.

    ``kind='exp'``:    ``exp(ln(decay)/scale * dist)``
    ``kind='gauss'``:  ``exp(ln(decay) * dist² / scale²)``
    ``kind='linear'``: ``max(0, (s - dist)/s)`` with ``s = scale/(1-decay)``

    All three satisfy f(0)=1 and f(scale)=decay (the ES contract).
    """

    col: str
    origin: float
    scale: float
    decay: float = 0.5
    kind: str = "exp"

    def __post_init__(self) -> None:
        if self.kind not in _KINDS:
            raise ValueError(f"kind must be one of {_KINDS}, got {self.kind!r}")
        if not (self.scale > 0):
            raise ValueError(f"scale must be > 0, got {self.scale!r}")
        if not (0.0 < self.decay < 1.0):
            raise ValueError(f"decay must be in (0, 1), got {self.decay!r}")

    def factors(self, dvcol, ranks: np.ndarray) -> np.ndarray:
        """Per-candidate multipliers from a rank-aligned DVColumn."""
        if dvcol.is_categorical:
            raise ValueError(
                f"decay boost needs a numeric/timestamp column, "
                f"{self.col!r} is categorical"
            )
        x = dvcol.values[ranks].astype(np.float64)
        dist = np.abs(x - float(self.origin))
        if self.kind == "exp":
            f = np.exp((np.log(self.decay) / self.scale) * dist)
        elif self.kind == "gauss":
            f = np.exp(np.log(self.decay) * (dist * dist) / (self.scale * self.scale))
        else:  # linear
            s = self.scale / (1.0 - self.decay)
            f = np.maximum(0.0, (s - dist) / s)
        if dvcol.null is not None:
            f[dvcol.null[ranks]] = 1.0  # missing value: neutral boost
        return f
