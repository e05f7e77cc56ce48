"""Interval-series (HRV-style) lag features and two-level aggregates.

Semantics follow ``reference:src/mhealth/heart/hrv.py``. These are the
engine's lag-1 / successive-difference feature kernels and the
partial+final (two-level) aggregation precedents.
"""

from __future__ import annotations

import numpy as np

from pymhealth_ray.functions.windows import nonuniform_rolling_apply

_window_std = nonuniform_rolling_apply(np.std)
_window_mean = nonuniform_rolling_apply(np.mean)


def td_factor(unit: str) -> float:
    """Unit string → nanosecond conversion factor. reference:heart/hrv.py:25-35."""
    factors = {"ns": 1.0, "us": 1e3, "ms": 1e6, "s": 1e9}
    if unit not in factors:
        raise ValueError('Unknown unit. Must be: "ns", "us", "ms", or "s"')
    return factors[unit]


def nni_to_ms(nni: np.ndarray, current_unit: str = "ns") -> np.ndarray:
    """Intervals → milliseconds. reference:heart/hrv.py:38-40."""
    return td_factor(current_unit) * np.asarray(nni, dtype=np.float64) / 1e6


def nni_cumulative(nni: np.ndarray) -> np.ndarray:
    """Cumulative sum reconstructing event timestamps from inter-arrival
    intervals. reference:heart/hrv.py:43-45.
    """
    return np.cumsum(nni)


def sdnn(nni: np.ndarray) -> float:
    """Population std of intervals. reference:heart/hrv.py:49-62."""
    return float(np.std(nni))


def sdann(nni: np.ndarray, index=None, interval: float = 300.0, unit=None) -> float:
    """Two-level aggregate: tumbling ``interval``-second event-time windows →
    per-window MEAN → global STD of the window means. Index reconstructed
    from cumulative intervals when absent. reference:heart/hrv.py:65-85.
    Empty windows produce NaN means which poison the final std, as in the
    reference (use the engine window stage's emit_empty=False for the
    practical variant).
    """
    if index is None:
        if unit is None:
            raise ValueError("index or unit must be specified")
        index = nni_cumulative(nni) * td_factor(unit)
    iv_ns = interval * 1e9
    return float(_window_mean(np.asarray(index).astype(np.int64), np.asarray(nni, dtype=np.float64), iv_ns, iv_ns).std())


def sdnni(nni: np.ndarray, index=None, interval: float = 300.0, unit=None) -> float:
    """Dual of sdann: per-window STD → global MEAN. reference:heart/hrv.py:88-108."""
    if index is None:
        if unit is None:
            raise ValueError("index or unit must be specified")
        index = nni_cumulative(nni) * td_factor(unit)
    iv_ns = interval * 1e9
    return float(_window_std(np.asarray(index).astype(np.int64), np.asarray(nni, dtype=np.float64), iv_ns, iv_ns).mean())


def pnn50(nni: np.ndarray, unit: str = "ms") -> float:
    """Fraction of successive differences whose magnitude exceeds 50 ms.
    reference:heart/hrv.py:111-121.
    """
    return pnnx(nni, unit=unit, x=50.0)


def pnnx(nni: np.ndarray, unit: str = "ms", x: float = 50.0) -> float:
    """Parameterized pnn. reference:heart/hrv.py:124-135."""
    nni = np.asarray(nni, dtype=np.float64)
    cut = x * 1e6 / td_factor(unit)
    return float((np.abs(np.diff(nni)) > cut).sum() / (len(nni) - 1))


def rmssd(nni: np.ndarray) -> float:
    """sqrt(mean(diff^2)). reference:heart/hrv.py:138-146."""
    return float(np.sqrt(np.mean(np.square(np.diff(np.asarray(nni, dtype=np.float64))))))


def ssd(nni: np.ndarray) -> float:
    """Sum of successive differences. reference:heart/hrv.py:149-157."""
    return float(np.sum(np.diff(np.asarray(nni, dtype=np.float64))))


def sdsd(nni: np.ndarray) -> float:
    """Population std of successive differences. reference:heart/hrv.py:160-169."""
    return float(np.std(np.diff(np.asarray(nni, dtype=np.float64))))


def power_band(psd, freqs, lower=None, upper=None) -> float:
    """Sum |psd| within the inclusive [lower, upper] band.
    reference:heart/hrv.py:173-179.
    """
    psd = np.asarray(psd)
    freqs = np.asarray(freqs)
    lower = np.min(freqs) if lower is None else lower
    upper = np.max(freqs) if upper is None else upper
    return float(np.sum(np.abs(psd[(freqs >= lower) & (freqs <= upper)])))


def peak_frequency(psd, freqs, lower=None, upper=None) -> float:
    """Frequency of max PSD within the band. Uses CORRECT masked indexing
    (``freqs[mask][argmax(psd[mask])]``); the reference indexes the unmasked
    freqs (heart/hrv.py:189) — a recorded off-by-mask bug; the correct
    variant matches reference:generic/frequency/density.py:17-32.
    """
    psd = np.asarray(psd)
    freqs = np.asarray(freqs)
    lower = np.min(freqs) if lower is None else lower
    upper = np.max(freqs) if upper is None else upper
    mask = (freqs >= lower) & (freqs <= upper)
    return float(freqs[mask][np.argmax(psd[mask])])


def relative_power_band(psd, freqs, lower=None, upper=None) -> float:
    """Band power / total power. reference:heart/hrv.py:192-198."""
    return power_band(psd, freqs, lower, upper) / float(np.sum(np.abs(np.asarray(psd))))


_SQRT2_INV = 1.0 / np.sqrt(2.0)


def csi_sd1(rri: np.ndarray, factor: float = _SQRT2_INV) -> float:
    """Poincaré ellipse width = factor * std(diff(rri)). reference:heart/hrv.py:207-217."""
    return float(factor * np.std(np.diff(np.asarray(rri, dtype=np.float64))))


def csi_sd2(rri: np.ndarray, factor: float = _SQRT2_INV) -> float:
    """Poincaré ellipse length = factor * std(rri[1:] + rri[:-1]).
    reference:heart/hrv.py:220-231.
    """
    rri = np.asarray(rri, dtype=np.float64)
    return float(factor * np.std(rri[1:] + rri[:-1]))


def lorenz_csi(rri: np.ndarray, factor: float = _SQRT2_INV) -> float:
    """sd1 / sd2. reference:heart/hrv.py:234-243."""
    return csi_sd1(rri, factor) / csi_sd2(rri, factor)


def lorenz_cvi(rri: np.ndarray, factor: float = _SQRT2_INV) -> float:
    """log10(sd1 * sd2). reference:heart/hrv.py:246-250."""
    return float(np.log10(csi_sd1(rri, factor) * csi_sd2(rri, factor)))


def lorenz_mcsi(rri: np.ndarray, factor: float = _SQRT2_INV) -> float:
    """sd1^2 / sd2. reference:heart/hrv.py:253-266."""
    return csi_sd1(rri, factor) ** 2 / csi_sd2(rri, factor)
