"""Frequency-domain kernels: FFT wrappers, PSD band features, NUFFT.

reference:src/mhealth/fft/, src/mhealth/generic/frequency/. The reference's
FFTW CFFI binding is a perf tactic only; its numpy fallback
(fft/__init__.py:3-7) defines the semantics, so the engine uses np.fft.
"""

from __future__ import annotations

import numpy as np

# FFT API: the reference exposes fft/ifft with numpy-compatible signatures and
# falls back to np.fft when the compiled extension is absent
# (reference:fft/_fft.py:18-58, fft/__init__.py:3-7).
fft = np.fft.fft
ifft = np.fft.ifft
fftfreq = np.fft.fftfreq


def periodogram_psd(x: np.ndarray, fs: float = 1.0) -> tuple:
    """Simple |FFT|^2 periodogram over the positive frequencies; returns
    (psd, freqs). The engine's spectral front-end for power_band /
    peak_frequency kernels (reference pairs psd+freqs the same way,
    heart/hrv.py:173-198).
    """
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    spec = np.fft.rfft(x - x.mean())
    psd = (np.abs(spec) ** 2) / n
    freqs = np.fft.rfftfreq(n, d=1.0 / fs)
    return psd, freqs


def first_index(x: float, arr: np.ndarray) -> int:
    """First index where ``x <= arr[i]`` — searchsorted re-expression of the
    reference's linear scan. reference:generic/frequency/density.py:9-14.
    """
    return int(np.searchsorted(np.asarray(arr), x, side="left"))


def peak_frequency(psd: np.ndarray, freqs: np.ndarray, lower: float, upper: float) -> float:
    """Frequency of max PSD within [lower, upper) — the density.py variant
    with correct band-relative indexing. reference:generic/frequency/density.py:17-32.
    """
    psd = np.asarray(psd)
    freqs = np.asarray(freqs)
    lo = first_index(lower, freqs)
    hi = first_index(upper, freqs)
    return float(freqs[lo + int(np.argmax(psd[lo:hi]))])


def nufftfreqs(m: int, df: float = 1.0) -> np.ndarray:
    """Frequency grid for M bins. reference:generic/frequency/nufft.py:36-39."""
    return df * np.arange(-(m // 2), m - (m // 2))


def _compute_grid_params(m: int, eps: float) -> tuple:
    """Dutt–Rokhlin gaussian-gridding parameters from target accuracy eps.
    reference:generic/frequency/nufft.py:42-52 (method of Dutt & Rokhlin 1993,
    as vendored there from jakevdp/nufftpy).
    """
    if eps <= 1e-33 or eps >= 1e-1:
        raise ValueError("eps must be in (1e-33, 1e-1)")
    ratio = 2 if eps > 1e-11 else 3
    msp = int(-np.log(eps) / (np.pi * (ratio - 1) / (ratio - 0.5)) + 0.5)
    mr = max(ratio * m, 2 * msp)
    lambda_ = msp / (ratio * (ratio - 0.5))
    return mr, msp, lambda_


def build_grid_fast(x: np.ndarray, c: np.ndarray, mr: int, msp: int, tau: float) -> np.ndarray:
    """Fast gaussian-gridding spread of irregular samples onto the
    oversampled grid (the engine's counterpart of
    reference:generic/frequency/nufft.py:55-76 ``build_grid_fast``, which is
    a numba per-sample recurrence over factorized exponentials). Here the
    whole spread is TWO vectorized passes: an (N × 2·Msp) direct kernel
    evaluation and a bincount scatter-add per complex component — no
    per-sample Python, same gaussian to floating-point accuracy.
    """
    x = np.asarray(x, dtype=np.float64)
    c = np.asarray(c, dtype=np.complex128)
    hx = 2 * np.pi / mr
    xi = x % (2 * np.pi)
    i0 = (xi // hx).astype(np.int64)
    offsets = np.arange(-msp, msp)
    pos = i0[:, None] + offsets[None, :]          # (N, 2·Msp) grid slots
    kern = np.exp(-0.25 * (xi[:, None] - hx * pos) ** 2 / tau)
    idx = (pos % mr).ravel()
    vals = (c[:, None] * kern).ravel()
    grid = np.bincount(idx, weights=vals.real, minlength=mr).astype(np.complex128)
    grid += 1j * np.bincount(idx, weights=vals.imag, minlength=mr)
    return grid


def _build_grid_slow(x: np.ndarray, c: np.ndarray, mr: int, msp: int, tau: float) -> np.ndarray:
    """Per-sample reference spread (the round-1 loop) — kept as the test
    oracle for :func:`build_grid_fast`."""
    x = np.asarray(x, dtype=np.float64)
    c = np.asarray(c, dtype=np.complex128)
    grid = np.zeros(mr, dtype=np.complex128)
    hx = 2 * np.pi / mr
    xi = x % (2 * np.pi)
    i0 = (xi // hx).astype(np.int64)
    offsets = np.arange(-msp, msp)
    for j, idx0 in enumerate(i0):
        idx = (idx0 + offsets) % mr
        kernel = np.exp(-0.25 * (xi[j] - hx * (idx0 + offsets)) ** 2 / tau)
        grid[idx] += c[j] * kernel
    return grid


def nufft1d1(x: np.ndarray, c: np.ndarray, m: int, df: float = 1.0, eps: float = 1e-15) -> np.ndarray:
    """Type-1 non-uniform FFT via gaussian gridding — spectral estimates on
    irregular timestamps (pairs with power_band over event-time windows).
    reference:generic/frequency/nufft.py:55-99 (algorithm of jakevdp/nufftpy).
    """
    x = np.asarray(x, dtype=np.float64) * df
    c = np.asarray(c, dtype=np.complex128)
    mr, msp, lambda_ = _compute_grid_params(m, eps)
    tau = np.pi * lambda_ / m**2
    grid = build_grid_fast(x, c, mr, msp, tau)
    # Inverse DFT of the grid (sum f_m e^{+ik·2πm/Mr} = Mr·ifft), centered,
    # deconvolved by the gaussian transform ĝ_τ(k) = 2√(πτ)·e^{-τk²}:
    #   F(k) = (1/N)·√(π/τ)·e^{τk²}·ifft(grid)[k mod Mr]
    fgrid = np.fft.ifft(grid)
    k = nufftfreqs(m).astype(np.int64)
    f = fgrid[k % mr]
    return (1.0 / len(x)) * np.sqrt(np.pi / tau) * np.exp(tau * k.astype(np.float64) ** 2) * f
