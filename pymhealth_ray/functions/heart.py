"""Heart-signal detectors: the reference's stateful sequential scans.

These are the library's streaming precedents — sequential decision rules with
bounded ring-buffer state (reference:src/mhealth/heart/). In the engine they
run per-sequence inside map_batches actor kernels
(pymhealth_ray.stages.signal); the scan state lives entirely within one
entity's time-sorted rows, matching the stateful-stage contract
(SURVEY.md §3.1).
"""

from __future__ import annotations

import numpy as np

from pymhealth_ray.functions.filters import (
    butterworth,
    moving_average,
    pt_differentiate,
    slope_sum,
)


def bandpass(ecg: np.ndarray, fs: float, low: float = 5, high: float = 15, order: int = 5) -> np.ndarray:
    """ECG bandpass (5–15 Hz default). reference:heart/qrs.py:25-38."""
    return butterworth(ecg, (low, high), fs, ftype="bandpass", order=order)


def filter_pan_tompkins(ecg: np.ndarray, fs: float) -> np.ndarray:
    """Pan-Tompkins preprocessing: bandpass → derivative → square →
    0.2*fs moving average (fused per-sequence chain).
    reference:heart/qrs.py:41-56.
    """
    x = bandpass(ecg, fs)
    x = pt_differentiate(x)
    x = x**2
    return moving_average(x, int(0.2 * fs))


def filter_hamilton_tompkins(ecg: np.ndarray, fs: float) -> np.ndarray:
    """Hamilton-Tompkins preprocessing: bandpass 3–25 Hz → |derivative| →
    0.08*fs moving average. reference:heart/qrs.py:107-113.
    """
    x = bandpass(ecg, fs, 3, 25)
    x = np.abs(pt_differentiate(x))
    return moving_average(x, int(0.08 * fs))


def find_peaks(x: np.ndarray) -> np.ndarray:
    """Strict local maxima indices (greater than both neighbors) —
    vectorized. reference:heart/qrs.py:200-212.
    """
    x = np.asarray(x)
    barr = (x[1:-1] > x[:-2]) & (x[1:-1] > x[2:])
    return np.flatnonzero(barr) + 1


def decision_rule_hamilton_tompkins(
    fecg: np.ndarray, peaks: np.ndarray, fs: float, buf: int = 12, th: float = 0.3125
) -> np.ndarray:
    """Stateful QRS/noise classification scan over candidate peaks.

    State: ring buffers of the last ``buf`` QRS and noise peak positions,
    adaptive detection threshold ``dth = mean(noise_amps) +
    th * mean(qrs_amps - noise_amps)``, previous accepted peak. Rules:
    200 ms local-maximum test; both-gradients (baseline-drift) test; t-wave
    veto (< 0.36 s after previous QRS with < half its slope amplitude);
    missed-beat rescue once 1.5× the average buffered RR has elapsed and the
    amplitude clears dth/2. reference:heart/qrs.py:116-197 (Hamilton &
    Tompkins 1986, doi:10.1109/TBME.1986.325695).
    """
    fecg = np.asarray(fecg, dtype=np.float64)
    peaks = np.asarray(peaks, dtype=np.int64)
    accepted = np.zeros(len(peaks), dtype=bool)
    buf_qrs = np.zeros(buf, dtype=np.int64)
    buf_noise = np.zeros(buf, dtype=np.int64)
    n_qrs_seen = 0
    n_noise_seen = 0
    dth = 0.0
    prev_p = 0
    n_qrs = 0
    lim200 = int(fs * 0.2)
    lim50 = int(fs * 0.05)

    def is_local_max(p: int) -> bool:
        return fecg[p] >= np.max(fecg[max(0, p - lim200) : p + lim200])

    def has_both_gradients(p: int) -> bool:
        seg = fecg[max(0, p - lim50) : p + lim50]
        d = np.diff(seg)
        return bool((d > 0).any() and (d < 0).any())

    def is_twave(p1: int, p2: int) -> bool:
        if not p1 or p2 - p1 >= fs * 0.36:
            return False
        lim = fs * 0.05
        amp2 = np.max(np.diff(fecg[max(0, int(p2 - lim)) : int(p2 + lim)]))
        amp1 = np.max(np.diff(fecg[max(0, int(p1 - lim)) : int(p1 + lim)]))
        return bool(amp2 < 0.5 * amp1)

    def missed_beat_rescue(p1: int, p2: int) -> bool:
        if n_qrs <= 1:
            return False
        avg_rr = np.mean(np.diff(np.sort(buf_qrs)))
        return bool(fecg[p2] > 0.5 * dth and p2 - p1 >= 1.5 * avg_rr)

    for i, p in enumerate(peaks):
        is_qrs = is_local_max(p) and (
            (fecg[p] > dth and has_both_gradients(p) and not is_twave(prev_p, p))
            or missed_beat_rescue(prev_p, p)
        )
        if is_qrs:
            buf_qrs[n_qrs_seen % buf] = p
            n_qrs_seen += 1
            accepted[i] = True
            prev_p = p
            n_qrs += 1
        else:
            buf_noise[n_noise_seen % buf] = p
            n_noise_seen += 1
        dth = np.mean(fecg[buf_noise]) + th * np.mean(fecg[buf_qrs] - fecg[buf_noise])
    return peaks[accepted]


def rpeaks_hamilton_tompkins(ecg: np.ndarray, fs: float) -> np.ndarray:
    """Full R-peak chain: filter → candidate peaks → decision rule.
    reference:heart/qrs.py:59-104 (the np dispatch path; the DataFrame
    dispatch layer maps to the engine's column-spec API).
    """
    fecg = filter_hamilton_tompkins(np.asarray(ecg, dtype=np.float64), fs)
    peaks = find_peaks(fecg)
    return decision_rule_hamilton_tompkins(fecg, peaks, fs)


def physionet_decision_rule(x: np.ndarray, sampling_rate: int, backtracking: float = 0.0) -> np.ndarray:
    """Stateful pulse-onset scan: adaptive threshold from a 10-amplitude
    ring buffer (median), refractory skip of ``3*w150 - 1`` samples after a
    detection, optional backtracking on 10 s of silence.
    reference:heart/ppg.py:45-93 (Zong et al 2003, doi:10.1109/CIC.2003.1291140).
    """
    x = np.asarray(x, dtype=np.float64)
    sr10 = sampling_rate * 10
    th = 2 * np.std(x[:sr10]) + np.mean(x[:sr10])
    th_sub_std = th - np.std(x[:sr10])
    w150 = int(sampling_rate / (1000 / 150))
    onsets = []
    i = w150
    j = 0
    backtrack = 0
    amps_idx = 0
    prev_amps = np.full(10, th)
    while i < len(x) - sr10:
        if x[i] > th_sub_std:
            largest_nearby = i - w150 + int(np.argmax(x[i - w150 : i + w150]))
            j = largest_nearby
            onsets.append(j)
            i += (3 * w150) - 1
            amps_idx = (amps_idx + 1) % 10
            prev_amps[amps_idx] = x[largest_nearby]
            th = float(np.median(prev_amps))
            th_sub_std = th - 2 * np.std(prev_amps)
            backtrack = j
        i += 1
        if backtracking and (j < i - sr10):
            th = 3 * np.mean(x[j + sampling_rate : j + sampling_rate * 11])
            prev_amps[:] = th
            i = backtrack + w150
            backtrack += sampling_rate * 5
    return np.asarray(onsets, dtype=np.int64)


def pulse_onset_physionet(ppg: np.ndarray, sampling_rate: int) -> np.ndarray:
    """PPG onset chain: 0.5–20 Hz bandpass → slope-sum (150 ms window) →
    decision rule. reference:heart/ppg.py:11-25.
    """
    x = butterworth(np.asarray(ppg, dtype=np.float64), (0.5, 20), sampling_rate, ftype="bandpass")
    w = int(sampling_rate / (1000 / 150))
    return physionet_decision_rule(slope_sum(x, w), sampling_rate)


def _corr_multi(windows: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Pearson r of ``y`` against each buffered window (rows of ``windows``);
    0 where a window has zero variance. reference:heart/quality.py:7-19
    (vectorized across the buffer).
    """
    y = np.asarray(y, dtype=np.float64)
    yc = y - y.mean()
    ystd = y.std() * windows.shape[1]
    xc = windows - windows.mean(axis=1, keepdims=True)
    denom = windows.std(axis=1) * ystd
    num = (xc * yc).sum(axis=1)
    with np.errstate(invalid="ignore", divide="ignore"):
        corrs = np.where(denom != 0, num / denom, 0.0)
    return corrs


def beat_correlation(x: np.ndarray, peaks: np.ndarray, sampling_rate: int, buf_size: int = 24) -> np.ndarray:
    """Per-peak quality = mean correlation of the ±half-second window around
    each peak against a ring buffer of the previous ``buf_size`` beats — the
    lag-window feature precedent. Head/tail windows are zero-padded into a
    full-rate window as in the reference. reference:heart/quality.py:22-43.
    (The bidirectional variant at :46-101 is known-buggy and intentionally
    not replicated; SURVEY.md §2.6.)
    """
    x = np.asarray(x, dtype=np.float64)
    peaks = np.asarray(peaks, dtype=np.int64)
    hsr = sampling_rate // 2
    buf = np.full((buf_size, sampling_rate), np.nan)
    quality = np.zeros(len(peaks))
    for i in range(1, min(buf_size, len(peaks))):
        seg = x[peaks[i] - hsr : peaks[i] + hsr]
        if len(seg) == sampling_rate:
            buf[i, :] = seg
    head = np.zeros(sampling_rate)
    lead = min(hsr, peaks[0])
    head[hsr - lead :] = x[peaks[0] - lead : peaks[0] + hsr]
    with np.errstate(invalid="ignore"):
        quality[0] = np.nanmean(_corr_multi(buf, head))
        for i in range(1, len(peaks) - 1):
            seg = x[peaks[i] - hsr : peaks[i] + hsr]
            quality[i] = np.nanmean(_corr_multi(buf, seg))
            buf[i % buf_size, :] = seg
        tail = np.zeros(sampling_rate)
        trail = min(hsr, len(x) - peaks[-1])
        tail[: hsr + trail] = x[peaks[-1] - hsr : peaks[-1] + trail]
        quality[-1] = np.nanmean(_corr_multi(buf, tail))
    return quality
