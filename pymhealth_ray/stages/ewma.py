"""Per-entity exponentially-weighted moving average — a streaming-state
temporal feature.

``ewma_t = Σ_{i≤t} (1−α)^{t−i}·x_i / Σ_{i≤t} (1−α)^{t−i}`` (the
"adjust=True" normalization: exact finite-history weights, no warm-up
bias). The recurrence is inherently sequential per entity, so it rides
the repo's single entity-bucket exchange: every entity lands wholly in
one bucket, one sorted pass per bucket.

Numerical plan — the naive vectorization ``cumsum(x·q^{−i})·q^i``
overflows past ~7k rows (q^{−i} → ∞); instead each entity streams in
CHUNKS of ≤512 rows with a renormalized carry: within a chunk the
cumsum trick is safe (q^{−511} ≈ 4e23), and the carry (numerator,
denominator at the chunk boundary) is decayed into the next chunk. State
is O(1) per entity — the same unbounded-history-bounded-state shape as
sessionization (stages/session.py), and the reason this scales to
arbitrarily long entity streams.

Reference lineage: reference `moving_average`
(`/root/reference/src/mhealth/heart/qrs.py` kernel family) generalized
from finite windows to exponential weighting; SURVEY §2.1 temporal
surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pymhealth_ray.stages.partition import entity_segments, grouped_by_bucket

_CHUNK = 512


def _ewma_segment(x: np.ndarray, q: float) -> np.ndarray:
    """Renormalized chunked scan of one entity's values (time order).
    Chunk length adapts to q: q^-j must stay within float range, so small
    q (aggressive alpha) gets short chunks (see _ewma_padded_lim)."""
    out = np.empty(len(x), dtype=np.float64)
    carry_num = 0.0
    carry_den = 0.0
    chunk = _ewma_padded_lim(q)
    for s in range(0, len(x), chunk):
        xc = x[s:s + chunk]
        m = len(xc)
        j = np.arange(m, dtype=np.float64)
        p = np.power(q, j)          # q^j
        inv = np.power(q, -j)       # q^-j, bounded by chunking
        num = np.cumsum(xc * inv) * p + carry_num * (p * q)
        den = np.cumsum(inv) * p + carry_den * (p * q)
        out[s:s + m] = num / den
        carry_num = num[-1]
        carry_den = den[-1]
    return out


def _ewma_padded_lim(q: float) -> int:
    """Longest segment the vectorized padded path may take: the in-chunk
    weight q^-j must stay under ~1e250 of headroom."""
    import math

    decade = -math.log10(q) if 0.0 < q < 1.0 else 1.0
    return max(1, min(_CHUNK, int(250.0 / max(decade, 1e-12))))


def _ewma_all_segments(x: np.ndarray, starts: np.ndarray, q: float) -> np.ndarray:
    """EWMA of every segment, vectorized ACROSS entities: short segments
    (≤ _ewma_padded_lim) are gathered into length-bucketed padded matrices
    (one cumsum per power-of-two length class — padding waste ≤ 2×, so no
    skew blowup) and long segments fall back to the chunked scan. The
    padded math is the chunked scan's first chunk verbatim, so results are
    BIT-IDENTICAL to the per-segment loop."""
    y = np.empty(len(x), dtype=np.float64)
    seg_lens = np.diff(starts)
    lim = _ewma_padded_lim(q)
    short = np.flatnonzero((seg_lens > 0) & (seg_lens <= lim))
    if len(short):
        lb = np.ceil(np.log2(np.maximum(seg_lens[short], 1))).astype(np.int64)
        lb[seg_lens[short] == 1] = 0
        for k in np.unique(lb):
            idx = short[lb == k]
            lens_k = seg_lens[idx]
            L = int(lens_k.max())
            n_k = len(idx)
            row = np.repeat(np.arange(n_k, dtype=np.int64), lens_k)
            col = (np.arange(int(lens_k.sum()), dtype=np.int64)
                   - np.repeat(np.cumsum(np.concatenate(([0], lens_k[:-1]))),
                               lens_k))
            pos = np.repeat(starts[idx], lens_k) + col
            mat = np.zeros((n_k, L), dtype=np.float64)
            msk = np.zeros((n_k, L), dtype=np.float64)
            mat[row, col] = x[pos]
            msk[row, col] = 1.0
            j = np.arange(L, dtype=np.float64)
            p = np.power(q, j)
            inv = np.power(q, -j)
            num = np.cumsum(mat * inv, axis=1) * p
            den = np.cumsum(msk * inv, axis=1) * p
            y[pos] = (num / den)[row, col]
    for e in np.flatnonzero(seg_lens > lim):
        s, t = starts[e], starts[e + 1]
        y[s:t] = _ewma_segment(x[s:t], q)
    return y


def ewma_features(ds, entity_col: str, ts_col: str, value_col: str,
                  alpha: float = 0.1, tiebreak_col: str | None = None,
                  num_buckets: int = 32, out_name: str = "ewma"):
    """Append the per-entity EWMA of ``value_col`` in (ts, tiebreak)
    order. Returns (entity, ts[, tiebreak], value, ewma) rows."""
    q = 1.0 - alpha

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl, starts, n_ent = entity_segments(tbl, entity_col, ts_col,
                                             tiebreak_col)
        v = tbl[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        x = v.to_numpy(zero_copy_only=False).astype(np.float64)
        y = _ewma_all_segments(x, starts, q)
        return tbl.append_column(out_name, pa.array(y))

    return grouped_by_bucket(ds, per_bucket, entity_col=entity_col,
                             num_buckets=num_buckets)


_MAX_SPAN_TAUS = 200.0


def _ewma_td_segment(x: np.ndarray, t: np.ndarray, tau: float) -> np.ndarray:
    """Time-decay EWMA of one entity (ts order): weights exp(-(t_now-t_i)/τ),
    adjust-normalized. Chunked anchor renormalization: chunks break every
    ``_CHUNK`` rows or ``_MAX_SPAN_TAUS``·τ of time-span, so every
    exp() stays inside float range; inter-chunk gaps decay the carry
    (underflow to 0 == true negligibility)."""
    n = len(x)
    out = np.empty(n, dtype=np.float64)
    carry_num = 0.0
    carry_den = 0.0
    prev_anchor = None
    s = 0
    while s < n:
        e_row = min(s + _CHUNK, n)
        e_time = int(np.searchsorted(t, t[s] + _MAX_SPAN_TAUS * tau,
                                     side="right"))
        e = max(s + 1, min(e_row, e_time))
        tc = t[s:e].astype(np.float64)
        xc = x[s:e]
        ta = tc[-1]
        w = np.exp((tc - ta) / tau)          # <= 1 within the chunk
        num = np.cumsum(xc * w)
        den = np.cumsum(w)
        if prev_anchor is not None:
            g = np.exp((prev_anchor - ta) / tau)
            num = num + carry_num * g
            den = den + carry_den * g
        out[s:e] = num / den             # anchor weight cancels in the ratio
        carry_num = num[-1]
        carry_den = den[-1]
        prev_anchor = ta
        s = e
    return out


def ewma_time_decay(ds, entity_col: str, ts_col: str, value_col: str,
                    tau: float, tiebreak_col: str | None = None,
                    num_buckets: int = 32, out_name: str = "ewma_td"):
    """Append the per-entity TIME-DECAY EWMA (weight exp(-Δt/τ)) of
    ``value_col`` in ts order — the irregular-timestamp generalization of
    :func:`ewma_features`; same single entity-bucket exchange, O(1)
    carry state per entity."""

    def per_bucket(tbl: pa.Table) -> pa.Table:
        from pymhealth_ray.stages.partition import column_f64, column_i64

        tbl, starts, n_ent = entity_segments(tbl, entity_col, ts_col,
                                             tiebreak_col)
        x = column_f64(tbl, value_col)
        t = column_i64(tbl, ts_col)
        y = np.empty(len(x), dtype=np.float64)
        for e in range(n_ent):
            a, b = starts[e], starts[e + 1]
            y[a:b] = _ewma_td_segment(x[a:b], t[a:b], tau)
        return tbl.append_column(out_name, pa.array(y))

    return grouped_by_bucket(ds, per_bucket, entity_col=entity_col,
                             num_buckets=num_buckets)
