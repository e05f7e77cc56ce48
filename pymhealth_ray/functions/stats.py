"""Statistical window kernels.

Semantics follow ``reference:src/mhealth/generic/stats.py`` (population
moments throughout, ddof=0; zero-variance guards return 0). All kernels take a
1-D numpy array and return a float (or tuple for ``minmax``).
"""

from __future__ import annotations

import numpy as np


def minmax(x: np.ndarray) -> tuple:
    """(min, max) in one pass. reference:generic/stats.py:12-31."""
    return (float(np.min(x)), float(np.max(x)))


def drange(x: np.ndarray) -> float:
    """max - min. reference:generic/stats.py:34-45."""
    return float(np.max(x) - np.min(x))


def interquartile_range(x: np.ndarray) -> float:
    """p75 - p25, linear interpolation. reference:generic/stats.py:48-59."""
    q75, q25 = np.percentile(x, [75.0, 25.0])
    return float(q75 - q25)


def mode(x: np.ndarray) -> float:
    """Most frequent value; ties resolve to the smallest value because
    np.unique returns sorted values and argmax takes the first maximal count.
    reference:generic/stats.py:62-72 (the np.unique variant — the jitted
    sort-scan variant at :75-94 has divergent tie/count behavior and is NOT
    replicated; see SURVEY.md §2.3).
    """
    vals, counts = np.unique(x, return_counts=True)
    return float(vals[np.argmax(counts)])


def skewness(x: np.ndarray) -> float:
    """Biased sample skewness m3 / sd^3; 0 when sd == 0.
    reference:generic/stats.py:97-110.
    """
    m = np.mean(x)
    sd = np.std(x)
    if sd == 0:
        return 0.0
    return float(np.mean((x - m) ** 3) / sd**3)


def kurtosis(x: np.ndarray) -> float:
    """Biased kurtosis m4 / m2^2 (NOT excess); 0 when var == 0.
    reference:generic/stats.py:113-126.
    """
    m = np.mean(x)
    v = np.var(x)
    if v == 0:
        return 0.0
    return float(np.mean((x - m) ** 4) / v**2)


def kurtosis_excess(x: np.ndarray) -> float:
    """kurtosis - 3. reference:generic/stats.py:129-139."""
    k = kurtosis(x)
    return k - 3.0


def coeff_var(x: np.ndarray) -> float:
    """Population std / mean. reference:generic/stats.py:142-153."""
    return float(np.std(x) / np.mean(x))


# Aliases re-exported by the reference (population std/var, ddof=0).
# reference:generic/stats.py:156-163.
def absolute(x):
    return np.abs(x)


def mean(x: np.ndarray) -> float:
    return float(np.mean(x))


def median(x: np.ndarray) -> float:
    return float(np.median(x))


def std(x: np.ndarray) -> float:
    return float(np.std(x))


def var(x: np.ndarray) -> float:
    return float(np.var(x))


def dmin(x: np.ndarray) -> float:
    return float(np.min(x))


def dmax(x: np.ndarray) -> float:
    return float(np.max(x))


def percentile(x: np.ndarray, q) -> float:
    return float(np.percentile(x, q))
