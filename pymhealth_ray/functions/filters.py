"""Signal filters in pure numpy (scipy is unavailable in this environment).

``butterworth`` re-implements the reference's convenience wrapper
(reference:src/mhealth/generic/filters.py:8-35): a zero-phase (forward-
backward) Butterworth high/low/band-pass with cutoffs normalized by Nyquist.
The filter design (analog prototype → band transform → bilinear) and
``filtfilt`` (odd-extension padding + steady-state initial conditions) follow
the standard published formulations; no scipy code is used.
"""

from __future__ import annotations

import numpy as np


def _butter_prototype(order: int):
    """Analog lowpass Butterworth prototype poles (unit cutoff), gain 1."""
    k = np.arange(1, order + 1)
    poles = np.exp(1j * np.pi * (2 * k + order - 1) / (2 * order))
    return np.zeros(0, dtype=complex), poles, 1.0


def _lp2lp(z, p, k, wo):
    return z * wo, p * wo, k * wo ** (len(p) - len(z))


def _lp2hp(z, p, k, wo):
    z_hp = np.concatenate([wo / z if len(z) else z, np.zeros(len(p) - len(z), dtype=complex)])
    p_hp = wo / p
    k_hp = k * np.real(np.prod(-z) / np.prod(-p)) if len(z) else k * np.real(1.0 / np.prod(-p))
    return z_hp, p_hp, k_hp


def _lp2bp(z, p, k, wo, bw):
    scale = bw / 2.0
    z_s, p_s = z * scale, p * scale
    z_bp = np.concatenate([z_s + np.sqrt(z_s**2 - wo**2), z_s - np.sqrt(z_s**2 - wo**2)]) if len(z) else np.zeros(0, dtype=complex)
    p_bp = np.concatenate([p_s + np.sqrt(p_s**2 - wo**2), p_s - np.sqrt(p_s**2 - wo**2)])
    z_bp = np.concatenate([z_bp, np.zeros(len(p) - len(z), dtype=complex)])
    k_bp = k * bw ** (len(p) - len(z))
    return z_bp, p_bp, k_bp


def _bilinear(z, p, k, fs: float = 2.0):
    fs2 = 2.0 * fs
    z_d = (fs2 + z) / (fs2 - z)
    p_d = (fs2 + p) / (fs2 - p)
    z_d = np.concatenate([z_d, -np.ones(len(p) - len(z))])
    num = np.prod(fs2 - z) if len(z) else 1.0
    k_d = k * np.real(num / np.prod(fs2 - p))
    return z_d, p_d, k_d


def butter(order: int, wn, btype: str = "lowpass"):
    """Digital Butterworth (b, a) with cutoff(s) ``wn`` normalized to the
    Nyquist frequency (0..1), matching the scipy.signal.butter convention the
    reference relies on. Prefer :func:`butter_zpk` + :func:`zpk2sos` for
    high orders / low cutoffs.
    """
    z, p, k = butter_zpk(order, wn, btype)
    b = np.real(k * np.poly(z))
    a = np.real(np.poly(p))
    return b, a


def lfilter(b: np.ndarray, a: np.ndarray, x: np.ndarray, zi: np.ndarray | None = None):
    """IIR filter, direct form II transposed. Sequential by nature; used on
    bounded per-sequence arrays inside map_batches kernels only.
    """
    b = np.asarray(b, dtype=np.float64) / a[0]
    a = np.asarray(a, dtype=np.float64) / a[0]
    n = max(len(a), len(b))
    b = np.pad(b, (0, n - len(b)))
    a = np.pad(a, (0, n - len(a)))
    z = np.zeros(n - 1) if zi is None else zi.astype(np.float64).copy()
    y = np.empty(len(x), dtype=np.float64)
    for i, xi in enumerate(np.asarray(x, dtype=np.float64)):
        yi = b[0] * xi + z[0]
        z[:-1] = b[1:-1] * xi + z[1:] - a[1:-1] * yi
        z[-1] = b[-1] * xi - a[-1] * yi
        y[i] = yi
    return y, z


def lfilter_zi(b: np.ndarray, a: np.ndarray) -> np.ndarray:
    """Steady-state initial conditions for a unit step (Gustafsson 1996 /
    the standard lfilter_zi linear system).
    """
    b = np.asarray(b, dtype=np.float64) / a[0]
    a = np.asarray(a, dtype=np.float64) / a[0]
    n = max(len(a), len(b))
    b = np.pad(b, (0, n - len(b)))
    a = np.pad(a, (0, n - len(a)))
    comp = np.zeros((n - 1, n - 1))
    comp[0, :] = -a[1:]
    comp[1:, :-1] = np.eye(n - 2)
    rhs = b[1:] - a[1:] * b[0]
    return np.linalg.solve(np.eye(n - 1) - comp.T, rhs)


def filtfilt(b: np.ndarray, a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Zero-phase filtering: odd-extension padding, forward pass with scaled
    steady-state zi, backward pass over the reversed signal.
    """
    x = np.asarray(x, dtype=np.float64)
    padlen = 3 * (max(len(a), len(b)) - 1)
    if len(x) <= padlen:
        raise ValueError(f"input length {len(x)} must exceed padlen {padlen}")
    ext = np.concatenate([2 * x[0] - x[padlen:0:-1], x, 2 * x[-1] - x[-2 : -padlen - 2 : -1]])
    zi = lfilter_zi(b, a)
    y, _ = lfilter(b, a, ext, zi=zi * ext[0])
    y = y[::-1]
    y, _ = lfilter(b, a, y, zi=zi * y[0])
    y = y[::-1]
    return y[padlen : len(y) - padlen]


def butter_zpk(order: int, wn, btype: str = "lowpass"):
    """Digital Butterworth in zpk form (cutoffs normalized to Nyquist)."""
    fs = 2.0
    wn_arr = np.atleast_1d(np.asarray(wn, dtype=np.float64))
    warped = 2 * fs * np.tan(np.pi * wn_arr / fs)
    z, p, k = _butter_prototype(order)
    if btype == "lowpass":
        z, p, k = _lp2lp(z, p, k, warped[0])
    elif btype == "highpass":
        z, p, k = _lp2hp(z, p, k, warped[0])
    elif btype == "bandpass":
        wo = np.sqrt(warped[0] * warped[1])
        bw = warped[1] - warped[0]
        z, p, k = _lp2bp(z, p, k, wo, bw)
    else:
        raise ValueError("btype must be lowpass/highpass/bandpass")
    return _bilinear(z, p, k, fs)


def zpk2sos(z: np.ndarray, p: np.ndarray, k: float) -> np.ndarray:
    """Pair conjugate poles/zeros into second-order sections (rows of
    [b0 b1 b2 a0 a1 a2]). Cascaded biquads keep low-cutoff high-order designs
    numerically stable where a single (b, a) polynomial loses precision.
    """
    z = np.asarray(z, dtype=complex).copy()
    p = np.asarray(p, dtype=complex).copy()
    n_sections = (max(len(z), len(p)) + 1) // 2
    # order by ascending distance from the unit circle so the most selective
    # sections come last (standard practice)
    def split(roots):
        """Group roots into 2nd-order groups: conjugate pairs, then real
        roots two at a time, then at most one leftover single real root."""
        roots = sorted(roots, key=lambda r: (abs(1 - abs(r)), r.real, abs(r.imag)))
        groups, real = [], []
        used = [False] * len(roots)
        for i, r in enumerate(roots):
            if used[i]:
                continue
            if abs(r.imag) < 1e-12:
                real.append(r.real)
                used[i] = True
            else:
                for jj in range(i + 1, len(roots)):
                    if not used[jj] and abs(roots[jj] - r.conjugate()) < 1e-8:
                        used[i] = used[jj] = True
                        groups.append([r, roots[jj]])
                        break
                else:
                    raise ValueError("unpaired complex root")
        for i in range(0, len(real) - 1, 2):
            groups.append([real[i], real[i + 1]])
        if len(real) % 2:
            groups.append([real[-1]])
        return groups

    sections = []
    pairs_p = split(p)
    pairs_z = split(z)
    # pad with empty groups so both lists have n_sections entries
    while len(pairs_p) < n_sections:
        pairs_p.append([])
    while len(pairs_z) < n_sections:
        pairs_z.append([])
    for i in range(n_sections):
        b = np.real(np.poly(np.asarray(pairs_z[i], dtype=complex)))
        a = np.real(np.poly(np.asarray(pairs_p[i], dtype=complex)))
        b = np.pad(b, (0, 3 - len(b)))
        a = np.pad(a, (0, 3 - len(a)))
        sections.append(np.concatenate([b, a]))
    sos = np.asarray(sections)
    sos[0, :3] *= k
    return sos


def sosfiltfilt(sos: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Zero-phase cascaded-biquad filtering with odd-extension padding and
    per-section steady-state initial conditions.
    """
    x = np.asarray(x, dtype=np.float64)
    padlen = 3 * (2 * len(sos) + 1)
    if len(x) <= padlen:
        raise ValueError(f"input length {len(x)} must exceed padlen {padlen}")
    ext = np.concatenate([2 * x[0] - x[padlen:0:-1], x, 2 * x[-1] - x[-2 : -padlen - 2 : -1]])

    def one_pass(sig):
        for row in sos:
            b, a = row[:3], row[3:]
            zi = lfilter_zi(b, a)
            sig, _ = lfilter(b, a, sig, zi=zi * sig[0])
        return sig

    y = one_pass(ext)
    y = one_pass(y[::-1])[::-1]
    return y[padlen : len(y) - padlen]


def butterworth(arr: np.ndarray, cutoff, freq: float, order: int = 5, ftype: str = "highpass") -> np.ndarray:
    """Zero-phase Butterworth filter with cutoff(s) normalized by Nyquist —
    the reference's public filter API. reference:generic/filters.py:8-35.
    Implemented as cascaded second-order sections for numerical stability.
    """
    nyq = 0.5 * freq
    if np.size(cutoff) == 1:
        wn = float(np.asarray(cutoff).reshape(-1)[0]) / nyq
        btype = {"highpass": "highpass", "lowpass": "lowpass"}.get(ftype, ftype)
        z, p, k = butter_zpk(order, wn, btype)
    else:
        wn = [c / nyq for c in cutoff]
        z, p, k = butter_zpk(order, wn, "bandpass")
    return sosfiltfilt(zpk2sos(z, p, k), arr)


def moving_average(x: np.ndarray, window: int) -> np.ndarray:
    """Centered moving average (convolution, mode='same').
    reference:heart/qrs.py:19-22.
    """
    return np.convolve(np.asarray(x, dtype=np.float64), np.ones(window) / window, mode="same")


def pt_differentiate(x: np.ndarray) -> np.ndarray:
    """The reference's Pan-Tompkins 'derivative' AS IMPLEMENTED: the kernel
    literal ``[1, 2, 0, -2, -1][:-4]`` slices to ``[1]``, so the actual
    behavior is ``x / 8`` — replicated for oracle parity (recorded quirk).
    reference:heart/qrs.py:12-16. See :func:`five_point_derivative` for the
    documented transfer function.
    """
    return np.asarray(x, dtype=np.float64) / 8.0


def five_point_derivative(x: np.ndarray) -> np.ndarray:
    """The *intended* Pan-Tompkins five-point derivative
    ``H(z) = (1/8)(-z^-2 - 2 z^-1 + 2 z + z^2)``, same-length output.
    """
    x = np.asarray(x, dtype=np.float64)
    return np.convolve(x, np.array([1.0, 2.0, 0.0, -2.0, -1.0]), mode="same") / 8.0


def slope_sum(x: np.ndarray, w: int) -> np.ndarray:
    """Windowed sum of the derivative over a trailing window:
    ``out[i] = sum(diff(x)[i-w:i])`` for ``w <= i < len(x)-1``, 0 elsewhere.
    reference:heart/ppg.py:28-42 (vectorized via cumulative sums).
    """
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    out = np.zeros(n)
    if n < 2:
        return out
    dx = np.diff(x)
    cs = np.concatenate([[0.0], np.cumsum(dx)])
    i = np.arange(w, n - 1)
    out[i] = cs[i] - cs[i - w]
    return out
