"""Per-sequence signal detectors as distributed stages.

The reference's flagship chain (filter → candidate peaks → stateful decision
rule → HRV interval features, reference:heart/qrs.py:59-104, SURVEY.md §3.1)
applied to each row's token array as the signal. The sequential decision
rules run inside an actor pool (per-row state is bounded ring buffers; the
whole sequence is one row, so state never crosses batch boundaries);
everything around them is vectorized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pymhealth_ray.functions import heart
from pymhealth_ray.stages.rowfeatures import _flat_tokens
from pymhealth_ray.functions import hrv as hrv_fns


class RPeakDetector:
    """Actor: Hamilton-Tompkins R-peak detection + HRV summary per sequence.

    ``fs`` is the nominal sampling frequency assigned to token sequences
    (row position = time, SURVEY.md §1.1). Output per row: n_peaks,
    mean_rr, sdnn, rmssd, pnn50 over the detected inter-peak intervals
    (NaN when < 3 peaks).
    """

    def __init__(self, fs: float = 100.0, tokens_col: str = "tokens", min_len: int = 64):
        self.fs = fs
        self.tokens_col = tokens_col
        self.min_len = min_len

    def __call__(self, batch: pa.Table) -> pa.Table:
        v, off = _flat_tokens(batch, self.tokens_col)
        n = len(off) - 1
        n_peaks = np.zeros(n, dtype=np.int64)
        mean_rr = np.full(n, np.nan)
        sdnn = np.full(n, np.nan)
        rmssd = np.full(n, np.nan)
        pnn50 = np.full(n, np.nan)
        for i in range(n):
            x = v[off[i] : off[i + 1]]
            if len(x) < self.min_len:
                continue
            try:
                peaks = heart.rpeaks_hamilton_tompkins(x, self.fs)
            except ValueError:
                continue  # sequence shorter than the filter pad length
            n_peaks[i] = len(peaks)
            if len(peaks) >= 3:
                # intervals in ms at the nominal fs (reference ns convention,
                # heart/hrv.py:25-40)
                nni_ms = np.diff(peaks) * (1000.0 / self.fs)
                mean_rr[i] = nni_ms.mean()
                sdnn[i] = hrv_fns.sdnn(nni_ms)
                rmssd[i] = hrv_fns.rmssd(nni_ms)
                pnn50[i] = hrv_fns.pnn50(nni_ms, unit="ms")
        batch = batch.append_column("n_peaks", pa.array(n_peaks))
        batch = batch.append_column("mean_rr_ms", pa.array(mean_rr))
        batch = batch.append_column("sdnn_ms", pa.array(sdnn))
        batch = batch.append_column("rmssd_ms", pa.array(rmssd))
        return batch.append_column("pnn50", pa.array(pnn50))


def detect_rpeaks(ds, fs: float = 100.0, tokens_col: str = "tokens",
                  concurrency=(2, 8), batch_size: int = 256):
    return ds.map_batches(
        RPeakDetector,
        fn_constructor_args=(fs, tokens_col),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


class PulseOnsetDetector:
    """Actor: physionet PPG onset chain per sequence
    (reference:heart/ppg.py:11-25); emits the onset count."""

    def __init__(self, fs: int = 25, tokens_col: str = "tokens", min_len: int = 512):
        self.fs = fs
        self.tokens_col = tokens_col
        self.min_len = min_len

    def __call__(self, batch: pa.Table) -> pa.Table:
        v, off = _flat_tokens(batch, self.tokens_col)
        n = len(off) - 1
        n_onsets = np.zeros(n, dtype=np.int64)
        for i in range(n):
            x = v[off[i] : off[i + 1]]
            if len(x) < self.min_len:
                continue
            try:
                onsets = heart.pulse_onset_physionet(x, self.fs)
            except ValueError:
                continue
            n_onsets[i] = len(onsets)
        return batch.append_column("n_onsets", pa.array(n_onsets))


def detect_pulse_onsets(ds, fs: int = 25, tokens_col: str = "tokens",
                        concurrency=(2, 8), batch_size: int = 256):
    return ds.map_batches(
        PulseOnsetDetector,
        fn_constructor_args=(fs, tokens_col),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
