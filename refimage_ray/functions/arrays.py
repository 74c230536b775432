"""Small shared numpy set/array utilities."""

from __future__ import annotations

import numpy as np


def sorted_membership(sorted_arr: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Boolean mask: which ``values`` are present in ``sorted_arr``
    (which must be sorted ascending).  Binary search + bounds-clamped
    equality — the single definition of the idiom used by the loser /
    tombstone / metadata-update filters."""
    if len(sorted_arr) == 0 or len(values) == 0:
        return np.zeros(len(values), dtype=bool)
    pos = np.searchsorted(sorted_arr, values)
    return (pos < len(sorted_arr)) & (
        sorted_arr[np.minimum(pos, len(sorted_arr) - 1)] == values
    )
