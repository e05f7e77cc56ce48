"""Per-row token-signal features: stateless, shuffle-free, fully vectorized.

Each row's ``tokens`` list IS the signal (SURVEY.md §1.2); the kernels of
reference:generic/{stats,timedom,information}.py are applied per row — but
vectorized ACROSS rows via the Arrow list layout (flat values + offsets),
using segmented cumulative sums / reduceat instead of any per-row Python
loop. One map_batches pass computes every requested feature.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: features with a segmented vectorized implementation
VECTORIZED_FEATURES = (
    "mean",
    "std",
    "var",
    "min",
    "max",
    "sum",
    "zero_crossing_count",
    "line_length",
    "entropy",
    "skewness",
    "kurtosis",
    "hjorth_activity",
    "hjorth_mobility",
    "hjorth_complexity",
)

DEFAULT_FEATURES = (
    "mean",
    "std",
    "min",
    "max",
    "zero_crossing_count",
    "line_length",
    "entropy",
)


def _flat_tokens(batch: pa.Table, col: str):
    """Zero-copy flat values + per-row offsets of a list<int32> column."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    off = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = arr.values.to_numpy(zero_copy_only=False)
    # honor a sliced parent array
    flat = values[off[0] : off[-1]].astype(np.float64)
    off = off - off[0]
    return flat, off


def _segmented_gradient(v: np.ndarray, off: np.ndarray) -> np.ndarray:
    """np.gradient semantics per row over the flat layout: central difference
    inside each row, one-sided at each row's ends
    (reference:generic/timedom.py:11-31 == np.gradient defaults).
    """
    g = np.empty_like(v)
    if len(v) >= 3:
        g[1:-1] = (v[2:] - v[:-2]) / 2.0
    starts = off[:-1]
    ends = off[1:] - 1
    # one-sided at row boundaries (rows have >= 2 elements in our data; a
    # 1-element row would get 0)
    single = ends == starts
    s, e = starts[~single], ends[~single]
    g[s] = v[s + 1] - v[s]
    g[e] = v[e] - v[e - 1]
    g[starts[single]] = 0.0
    return g


def _cumsum0(x: np.ndarray) -> np.ndarray:
    """[0, cumsum(x)] without an extra full-array copy."""
    out = np.empty(len(x) + 1, dtype=np.float64)
    out[0] = 0.0
    np.cumsum(x, out=out[1:])
    return out


def _row_moments(v: np.ndarray, off: np.ndarray):
    """Per-row (count, mean, m2) via cumulative sums."""
    cnt = (off[1:] - off[:-1]).astype(np.float64)
    cs = _cumsum0(v)
    s1 = cs[off[1:]] - cs[off[:-1]]
    mean = s1 / cnt
    cs2 = _cumsum0(v * v)
    s2 = cs2[off[1:]] - cs2[off[:-1]]
    m2 = s2 / cnt - mean**2
    return cnt, mean, np.maximum(m2, 0.0)


def _row_central_moments_34(v: np.ndarray, off: np.ndarray, mean: np.ndarray):
    """Per-row central 3rd and 4th moments, sharing one centered pass."""
    centered = v - np.repeat(mean, np.diff(off))
    c2 = centered * centered
    cs3 = _cumsum0(c2 * centered)
    m3 = (cs3[off[1:]] - cs3[off[:-1]]) / np.diff(off)
    cs4 = _cumsum0(c2 * c2)
    m4 = (cs4[off[1:]] - cs4[off[:-1]]) / np.diff(off)
    return m3, m4


def _row_entropy(v: np.ndarray, off: np.ndarray) -> np.ndarray:
    """Per-row Shannon entropy of the value histogram, vectorized across
    rows by ONE composite-key sort + run-length pass. Matches
    functions.information.entropy over np.unique counts (+1e-30 smoothing,
    reference:generic/information.py:10-20).

    When values fit in 24 bits (token ids < 2^24 — the vocab invariant) the
    (row, value) pair packs into a single uint64 key, which sorts ~2x faster
    than a two-key lexsort over the flat token stream.
    """
    n_rows = len(off) - 1
    cnt = np.diff(off)
    total = off[-1] - off[0]
    if total == 0:
        return np.zeros(n_rows)
    row_id = np.repeat(np.arange(n_rows, dtype=np.int64), cnt)
    vmin = v.min()
    vspan = v.max() - vmin
    if vspan < (1 << 24) and n_rows < (1 << 38) and np.all(v == np.floor(v)):
        key = (row_id.astype(np.uint64) << np.uint64(24)) | (v - vmin).astype(np.uint64)
        key.sort()
        sk = key
        new_run = np.empty(len(sk), dtype=bool)
        new_run[0] = True
        new_run[1:] = sk[1:] != sk[:-1]
        run_starts = np.flatnonzero(new_run)
        run_row = (sk[run_starts] >> np.uint64(24)).astype(np.int64)
    else:
        order = np.lexsort((v, row_id))
        sv, sr = v[order], row_id[order]
        new_run = np.empty(len(sv), dtype=bool)
        new_run[0] = True
        new_run[1:] = (sv[1:] != sv[:-1]) | (sr[1:] != sr[:-1])
        run_starts = np.flatnonzero(new_run)
        run_row = sr[run_starts]
    run_counts = np.diff(np.append(run_starts, total)).astype(np.float64)
    p = run_counts / cnt[run_row].astype(np.float64) + 1e-30
    contrib = -p * np.log(p)
    # bincount-with-weights is ~20x faster than np.add.at for this scatter
    return np.bincount(run_row, weights=contrib, minlength=n_rows)


def _segmented_sum(x: np.ndarray, off: np.ndarray) -> np.ndarray:
    cs = _cumsum0(x)
    return cs[off[1:]] - cs[off[:-1]]


def _boundary_zeroed_pair_stat(flat_stat: np.ndarray, off: np.ndarray) -> np.ndarray:
    """Sum a length-(N-1) consecutive-pair statistic per row, excluding the
    cross-row boundary positions. MUTATES flat_stat (callers pass freshly
    computed temporaries)."""
    # element at index e-1 pairs row r's last value with row r+1's first
    inner = off[1:-1] - 1
    flat_stat[inner] = 0.0
    cs = _cumsum0(flat_stat)
    lo = np.minimum(off[:-1], len(flat_stat))
    hi = np.minimum(off[1:], len(flat_stat))
    return cs[hi] - cs[lo]


def compute_token_features(batch: pa.Table, features=DEFAULT_FEATURES, tokens_col: str = "tokens", prefix: str = "tok_"):
    """Compute the requested per-row features; returns dict name→np array."""
    v, off = _flat_tokens(batch, tokens_col)
    if len(off) > 1 and not (np.diff(off) > 0).all():
        raise ValueError("empty tokens rows are unsupported (n_tok >= 1 invariant)")
    out: dict[str, np.ndarray] = {}
    cnt, mean, m2 = _row_moments(v, off)
    std = np.sqrt(m2)
    need = set(features)

    if "mean" in need:
        out[prefix + "mean"] = mean
    if "std" in need:
        out[prefix + "std"] = std
    if "var" in need:
        out[prefix + "var"] = m2
    if "sum" in need:
        out[prefix + "sum"] = _segmented_sum(v, off)
    if "min" in need or "max" in need:
        starts = off[:-1]
        if "min" in need:
            out[prefix + "min"] = np.minimum.reduceat(v, starts)
        if "max" in need:
            out[prefix + "max"] = np.maximum.reduceat(v, starts)
    if "zero_crossing_count" in need:
        # mean-centered zero crossings (reference:generic/timedom.py:34-64;
        # threshold 0, zeros count as "not positive")
        centered = v - np.repeat(mean, np.diff(off))
        pos = centered > 0
        cross = (pos[1:] != pos[:-1]).astype(np.float64)
        out[prefix + "zero_crossing_count"] = _boundary_zeroed_pair_stat(cross, off)
    if "line_length" in need:
        adiff = np.abs(np.diff(v))
        out[prefix + "line_length"] = _boundary_zeroed_pair_stat(adiff, off)
    if "entropy" in need:
        out[prefix + "entropy"] = _row_entropy(v, off)
    if need & {"skewness", "kurtosis"}:
        m3, m4 = _row_central_moments_34(v, off, mean)
        with np.errstate(invalid="ignore", divide="ignore"):
            if "skewness" in need:
                out[prefix + "skewness"] = np.where(std > 0, m3 / std**3, 0.0)
            if "kurtosis" in need:
                out[prefix + "kurtosis"] = np.where(m2 > 0, m4 / m2**2, 0.0)
    if need & {"hjorth_activity", "hjorth_mobility", "hjorth_complexity"}:
        g = _segmented_gradient(v, off)
        _, gmean, gm2 = _row_moments(g, off)
        if "hjorth_activity" in need:
            out[prefix + "hjorth_activity"] = m2
        with np.errstate(invalid="ignore", divide="ignore"):
            mob = np.sqrt(gm2 / m2)
        if "hjorth_mobility" in need:
            out[prefix + "hjorth_mobility"] = mob
        if "hjorth_complexity" in need:
            gg = _segmented_gradient(g, off)
            _, _, ggm2 = _row_moments(gg, off)
            with np.errstate(invalid="ignore", divide="ignore"):
                out[prefix + "hjorth_complexity"] = np.sqrt(ggm2 / gm2) / mob
    return out


def token_features(ds, features=DEFAULT_FEATURES, tokens_col: str = "tokens", prefix: str = "tok_",
                   drop_tokens: bool = False, batch_size: int | None = 2048):
    """Stateless map_batches stage appending per-row token features.

    ``drop_tokens=True`` removes the wide list column afterwards so the
    downstream shuffle moves only narrow feature columns — at 100 TB the
    token payload never enters the window/session/as-of exchange.
    """

    def fn(batch: pa.Table) -> pa.Table:
        cols = compute_token_features(batch, features, tokens_col, prefix)
        for name, arr in cols.items():
            batch = batch.append_column(name, pa.array(arr, type=pa.float64()))
        if drop_tokens:
            batch = batch.drop_columns([tokens_col])
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


# --------------------------------------------------------------------------
# spectral row features (reference:fft/, generic/frequency/, heart/hrv.py
# power_band/peak_frequency applied per sequence)
# --------------------------------------------------------------------------

def spectral_features(ds, tokens_col: str = "tokens", prefix: str = "spec_",
                      nfft: int = 2048, bands=((0.0, 0.1), (0.1, 0.25), (0.25, 0.5)),
                      batch_size: int | None = 2048):
    """Per-row periodogram features via ONE batched rfft over zero-padded,
    mean-centered sequences (fixed ``nfft`` so results are independent of
    batch composition): total power, per-band power (inclusive band edges,
    reference:heart/hrv.py:173-179), peak frequency (band-relative argmax,
    reference:generic/frequency/density.py:17-32) and spectral entropy.
    Frequencies are normalized (fs=1); sequences longer than nfft are
    truncated to nfft (documented bound).
    """
    freqs = np.fft.rfftfreq(nfft)

    def fn(batch: pa.Table) -> pa.Table:
        v, off = _flat_tokens(batch, tokens_col)
        n = len(off) - 1
        cnt = np.diff(off)
        # padded matrix of mean-centered sequences
        mat = np.zeros((n, nfft))
        _, mean, _ = _row_moments(v, off)
        for i in range(n):
            m = min(cnt[i], nfft)
            mat[i, :m] = v[off[i] : off[i] + m] - mean[i]
        spec = np.fft.rfft(mat, axis=1)
        psd = (np.abs(spec) ** 2) / nfft
        total = psd.sum(axis=1)
        out = {prefix + "total_power": total}
        for lo, hi in bands:
            mask = (freqs >= lo) & (freqs <= hi)
            out[f"{prefix}power_{lo:g}_{hi:g}"] = psd[:, mask].sum(axis=1)
        # peak frequency over the full positive band (excluding DC)
        out[prefix + "peak_freq"] = freqs[1:][np.argmax(psd[:, 1:], axis=1)]
        with np.errstate(invalid="ignore", divide="ignore"):
            p = psd / np.maximum(total[:, None], 1e-300)
            out[prefix + "entropy"] = -(np.where(p > 0, p * np.log(p), 0.0)).sum(axis=1)
        for name, arr in out.items():
            batch = batch.append_column(name, pa.array(np.asarray(arr, dtype=np.float64)))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)
