"""Time-domain signal kernels.

Semantics follow ``reference:src/mhealth/generic/timedom.py``; implementations
are vectorized numpy (the reference jits explicit loops).
"""

from __future__ import annotations

import numpy as np


def gradient(x: np.ndarray) -> np.ndarray:
    """Central difference, one-sided at the ends — identical to
    ``np.gradient`` defaults. reference:generic/timedom.py:11-31.
    """
    return np.gradient(np.asarray(x, dtype=np.float64))


def zero_crossings(x: np.ndarray, th: float = 0) -> np.ndarray:
    """Boolean crossing markers of length n-1.

    Values with ``|x| <= th`` are clamped to 0 first; a crossing is a change
    of the ``x > 0`` flag between consecutive samples. Because 0 is "not
    positive", a +,0,+ pattern yields TWO crossings — replicated on purpose.
    reference:generic/timedom.py:34-49.
    """
    x = np.asarray(x, dtype=np.float64).copy()
    x[np.abs(x) <= th] = 0
    pos = x > 0
    return pos[:-1] != pos[1:]


def zero_crossing_count(x: np.ndarray, th: float = 0) -> float:
    """Number of zero crossings. reference:generic/timedom.py:52-64."""
    return float(zero_crossings(x, th).sum())


def line_length(x: np.ndarray) -> float:
    """Sum of absolute successive differences.
    reference:generic/timedom.py:67-78.
    """
    return float(np.abs(np.diff(np.asarray(x, dtype=np.float64))).sum())


def hjorth_activity(x: np.ndarray) -> float:
    """Population variance of the signal. reference:generic/timedom.py:81-94."""
    return float(np.var(x))


def hjorth_mobility(x: np.ndarray) -> float:
    """sqrt(var(grad(x)) / var(x)). reference:generic/timedom.py:97-112."""
    return float(np.sqrt(np.var(gradient(x)) / np.var(x)))


def hjorth_complexity(x: np.ndarray) -> float:
    """mobility(grad(x)) / mobility(x). reference:generic/timedom.py:133-148."""
    return float(hjorth_mobility(gradient(x)) / hjorth_mobility(x))


def hjorth_mobility_derivative(dx: np.ndarray, x: np.ndarray) -> float:
    """Mobility with the derivative precomputed (shared-gradient internal).
    reference:generic/timedom.py:115-130.
    """
    return float(np.sqrt(np.var(dx) / np.var(x)))


def hjorth_complexity_derivatives(ddx: np.ndarray, dx: np.ndarray, x: np.ndarray) -> float:
    """Complexity from precomputed first/second derivatives.
    reference:generic/timedom.py:151-169.
    """
    return hjorth_mobility_derivative(ddx, dx) / hjorth_mobility_derivative(dx, x)


def hjorth_parameters(x: np.ndarray) -> tuple:
    """(activity, mobility, complexity) sharing one gradient computation —
    the reference's fused multi-output kernel. reference:generic/timedom.py:172-193.
    """
    x = np.asarray(x, dtype=np.float64)
    dx = np.gradient(x)
    ddx = np.gradient(dx)
    vx, vdx, vddx = np.var(x), np.var(dx), np.var(ddx)
    activity = vx
    mobility = np.sqrt(vdx / vx)
    complexity = np.sqrt(vddx / vdx) / mobility
    return (float(activity), float(mobility), float(complexity))


def hurst(x: np.ndarray, lags: np.ndarray | None = None) -> float:
    """Hurst exponent via the reference's (unusual) sqrt-of-std tau:
    ``tau[i] = sqrt(std(x[lag:] - x[:-lag]))`` over lags 2..63, then twice the
    log-log slope. Replicated as-is. reference:generic/timedom.py:238-259.
    """
    x = np.asarray(x, dtype=np.float64)
    if lags is None:
        lags = np.arange(2, 64)
    tau = np.array([np.sqrt(np.std(x[lag:] - x[:-lag])) for lag in lags])
    _, slope = o1fit(np.log(lags), np.log(tau))
    return float(slope * 2.0)


def o1fit(x: np.ndarray, y: np.ndarray) -> tuple:
    """Closed-form least-squares line; returns (intercept, slope).
    reference:generic/timedom.py:262-279.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = len(x)
    sx = x.sum()
    slope = (n * np.dot(x, y) - sx * y.sum()) / (n * np.dot(x, x) - sx * sx)
    intercept = y.mean() - slope * x.mean()
    return (float(intercept), float(slope))


def o1fit_multiple(x: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Fit one line per column of ``ys`` against shared ``x``; returns
    (m, 2) of (intercept, slope) — vectorized over columns rather than the
    reference's per-column loop. reference:generic/timedom.py:282-299.
    """
    x = np.asarray(x, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    n = len(x)
    sx = x.sum()
    sxy = x @ ys
    slope = (n * sxy - sx * ys.sum(axis=0)) / (n * np.dot(x, x) - sx * sx)
    intercept = ys.mean(axis=0) - slope * x.mean()
    return np.stack([intercept, slope], axis=1)


def dfa(x: np.ndarray, windows, o: int = 1, overlap: float = 0) -> float:
    """Detrended fluctuation analysis, exact reference semantics
    (reference:generic/timedom.py:196-235): cumulative profile, per-scale
    strided windows stepping by ``w*(100-overlap)/100`` (overlap in PERCENT),
    per-window RMS of order-``o`` polyfit residuals, per-scale nanmean over a
    fixed-width matrix, then the log-log polyfit slope.
    """
    x = np.asarray(x, dtype=np.float64)
    windows = np.asarray(windows, dtype=np.int64)
    prof = np.cumsum(x - np.mean(x))
    min_step = max(int(np.min(windows) * (100 - overlap) / 100), 1)
    out = np.full((len(windows), len(prof) // min_step), np.nan)
    for i, w in enumerate(windows):
        s = max(int(w * (100 - overlap) / 100), 1)
        seg = np.lib.stride_tricks.sliding_window_view(prof, int(w))[::s]
        res = np.polyfit(np.arange(w), seg.T, o, full=True)[1]
        rms = np.sqrt(res / w)
        out[i, : len(res)] = rms
    flucts = np.nanmean(out, axis=1)
    return float(np.polyfit(np.log(windows), np.log(flucts), 1)[0])
