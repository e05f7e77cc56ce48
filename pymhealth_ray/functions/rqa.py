"""Recurrence quantification analysis. reference:src/mhealth/generic/rqa.py.

Quadratic per-window structure — only ever computed per bounded window inside
a map_batches kernel, never globally (SURVEY.md §1.1).
"""

from __future__ import annotations

import numpy as np

from pymhealth_ray.functions.information import entropy


def rq(x: np.ndarray, radius: float = 0.0) -> np.ndarray:
    """N×N boolean recurrence matrix: ``|x_i - x_j| <= radius``.
    reference:generic/rqa.py:9-28 (vectorized outer difference).
    """
    x = np.asarray(x, dtype=np.float64)
    return np.abs(x[:, None] - x[None, :]) <= radius


def rq2(x: np.ndarray, radius: float = 0.0) -> np.ndarray:
    """Multi-column recurrence matrix via pairwise euclidean distance.
    reference:generic/rqa.py:31-47 (scipy pdist re-expressed in numpy).
    """
    x = np.asarray(x, dtype=np.float64)
    sq = (x[:, None, :] - x[None, :, :]) ** 2
    return np.sqrt(sq.sum(axis=2)) <= radius


def recurrence_rate(r: np.ndarray) -> float:
    """Mean of the recurrence matrix. reference:generic/rqa.py:50-61."""
    return float(np.sum(r) / (r.shape[0] * r.shape[1]))


def _shift_diag(r: np.ndarray, di: int, dj: int) -> np.ndarray:
    """Zero-padded shift of a boolean matrix by (di, dj)."""
    out = np.zeros_like(r)
    n, m = r.shape
    si = slice(max(di, 0), n + min(di, 0))
    sj = slice(max(dj, 0), m + min(dj, 0))
    ti = slice(max(-di, 0), n + min(-di, 0))
    tj = slice(max(-dj, 0), m + min(-dj, 0))
    out[si, sj] = r[ti, tj]
    return out


def determinism(r: np.ndarray) -> float:
    """Fraction of points on diagonal lines of length >= 2:
    ``r & (shift(+1,+1) | shift(-1,-1))`` with zero padding — this reproduces
    the reference's explicit edge rules exactly, including the quirk that the
    anti-diagonal corners (0,-1) and (-1,0) are never counted.
    reference:generic/rqa.py:64-89.
    """
    r = np.asarray(r, dtype=bool)
    prev = _shift_diag(r, 1, 1)   # value of r[i-1, j-1] at (i, j)
    nxt = _shift_diag(r, -1, -1)  # value of r[i+1, j+1] at (i, j)
    return float(np.sum(r & (prev | nxt)) / (r.shape[0] * r.shape[1]))


def laminarity(r: np.ndarray) -> float:
    """Fraction of points on vertical (row-adjacent) lines >= 2:
    ``r & (shift(0,+1) | shift(0,-1))`` zero-padded. reference:generic/rqa.py:92-112.
    """
    r = np.asarray(r, dtype=bool)
    left = _shift_diag(r, 0, 1)
    right = _shift_diag(r, 0, -1)
    return float(np.sum(r & (left | right)) / (r.shape[0] * r.shape[1]))


def _run_lengths(flags: np.ndarray) -> np.ndarray:
    """Lengths of maximal runs of True in a 1-D boolean array."""
    f = np.asarray(flags, dtype=bool)
    if f.size == 0:
        return np.zeros(0, dtype=np.int64)
    padded = np.concatenate([[False], f, [False]]).astype(np.int8)
    d = np.diff(padded)
    starts = np.flatnonzero(d == 1)
    ends = np.flatnonzero(d == -1)
    return ends - starts


def diagonal_lengths(r: np.ndarray, minlen: int = 2) -> np.ndarray:
    """Lengths of maximal diagonal runs >= minlen. Equivalent to the
    reference's DP scan for minlen >= 2 (reference:generic/rqa.py:115-137);
    minlen < 2 triggered a counting quirk there (every cell reports >= 1)
    and is rejected here — recorded divergence.
    """
    if minlen < 2:
        raise ValueError("minlen must be >= 2 (see reference quirk note)")
    r = np.asarray(r, dtype=bool)
    n, m = r.shape
    lens = [_run_lengths(np.diagonal(r, offset=k)) for k in range(-n + 1, m)]
    all_lens = np.concatenate(lens) if lens else np.zeros(0, dtype=np.int64)
    return all_lens[all_lens >= minlen]


def vertical_lengths(r: np.ndarray, minlen: int = 2) -> np.ndarray:
    """Lengths of maximal vertical runs >= minlen. reference:generic/rqa.py:140-164."""
    if minlen < 2:
        raise ValueError("minlen must be >= 2 (see reference quirk note)")
    r = np.asarray(r, dtype=bool)
    lens = [_run_lengths(r[:, j]) for j in range(r.shape[1])]
    all_lens = np.concatenate(lens) if lens else np.zeros(0, dtype=np.int64)
    return all_lens[all_lens >= minlen]


def length_entropy(r: np.ndarray, minlen: int = 2) -> float:
    """Entropy of the diagonal-length histogram with bins minlen..N-1
    (zero-count bins included, as the reference's fixed-size count array
    does). reference:generic/rqa.py:167-187.
    """
    dlens = diagonal_lengths(r, minlen)
    n = r.shape[0]
    counts = np.bincount(np.clip(dlens, 0, n - 1), minlength=n)[minlen:]
    return entropy(counts)
