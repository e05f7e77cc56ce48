"""Information-theory kernels. reference:src/mhealth/generic/information.py."""

from __future__ import annotations

import numpy as np


def entropy(x: np.ndarray) -> float:
    """Shannon entropy of a counts/probabilities vector: normalize by the
    sum, add 1e-30, ``-sum(p * ln p)``. reference:generic/information.py:10-20.
    """
    x = np.asarray(x, dtype=np.float64)
    p = x / x.sum()
    p = p + 1e-30
    return float(-(p * np.log(p)).sum())


def entropy_of_values(x: np.ndarray) -> float:
    """Shannon entropy of the value histogram of ``x`` (counts of each
    distinct value). The engine's token-histogram entropy feature —
    entropy() applied to np.unique counts, the same composition the
    reference uses for cluster labels (location/distribution.py:79-89).
    """
    _, counts = np.unique(np.asarray(x), return_counts=True)
    return entropy(counts)


def sampen(x: np.ndarray, mm: int = 2, r: float = 0.2, sd: float | None = None) -> float:
    """Sample entropy: -ln(A/B) with template length ``mm``, tolerance
    ``r * sd``, Chebyshev distance, self-matches excluded.
    reference:generic/information.py:23-113 (vendored from
    raphaelvallat/entropy, BSD-3) — re-expressed with a vectorized
    pairwise-distance formulation; O(n^2), bounded-window use only.
    """
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if sd is None:
        sd = np.std(x)
    tol = r * sd
    if n <= mm + 1:
        return float("nan")

    def _count(m: int) -> int:
        # templates of length m: shape (n-m+1, m)
        tpl = np.lib.stride_tricks.sliding_window_view(x, m)
        k = len(tpl)
        # pairwise Chebyshev distances, i<j only (exclude self-match)
        total = 0
        for i in range(k - 1):
            d = np.max(np.abs(tpl[i + 1 :] - tpl[i]), axis=1)
            total += int((d <= tol).sum())
        return total

    b = _count(mm)
    a = _count(mm + 1)
    if a == 0 or b == 0:
        return float("nan")
    return float(-np.log(a / b))
