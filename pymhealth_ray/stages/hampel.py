"""Hampel despiking filter — the standard mHealth artifact detector
(rolling-median baseline + rolling MAD spread; a sample deviating more
than ``n_mads`` MADs from its centered window median is a spike).
Generalizes the reference's artifact-removal intent (successive-difference
outlier logic, reference:heart/hrv.py) to an explicit robust filter.

Vectorized centered windows WITHOUT per-row loops: each entity segment is
NaN-padded with ``k`` slots on both sides, one
``sliding_window_view`` + ``np.nanmedian`` produces every row's shrinking
-edge window median in a single batched kernel, and the MAD reuses the
same window matrix (|A − med| → nanmedian). Integer-cent inputs make the
medians dyadic rationals (x.0 / x.5 / x.25) — bit-exact vs DuckDB's
interpolated ``median``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pymhealth_ray.stages.partition import (
    column_i64,
    entity_segments,
    grouped_by_bucket,
)


def _padded_windows(v: np.ndarray, starts: np.ndarray, k: int):
    """(n, 2k+1) float64 window matrix per row, NaN outside the row's own
    entity segment (shrinking edges)."""
    n_ent = len(starts) - 1
    seg_len = np.diff(starts)
    padded = np.full(len(v) + 2 * k * n_ent, np.nan)
    # each segment s occupies padded[starts[s] + 2k·s + k : ... + seg_len]
    dst = (np.arange(len(v), dtype=np.int64)
           + 2 * k * np.repeat(np.arange(n_ent, dtype=np.int64), seg_len)
           + k)
    padded[dst] = v.astype(np.float64)
    sw = np.lib.stride_tricks.sliding_window_view(padded, 2 * k + 1)
    return sw[dst - k]


def hampel_filter(ds, entity_col: str, ts_col: str, value_col: str, *,
                  k: int = 4, n_mads: float = 3.0,
                  num_buckets: int = 64, tiebreak_col: str | None = None):
    """Append ``med`` (centered rolling median), ``mad`` (rolling median
    absolute deviation) and ``spike`` (|v − med| > n_mads · mad) per
    (entity, ts)-ordered row. ``value_col`` must be integer (cents)."""

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl, starts, _ = entity_segments(tbl, entity_col, ts_col,
                                         tiebreak_col)
        v = column_i64(tbl, value_col)
        if len(v):
            A = _padded_windows(v, starts, k)
            med = np.nanmedian(A, axis=1)
            mad = np.nanmedian(np.abs(A - med[:, None]), axis=1)
        else:
            med = np.zeros(0)
            mad = np.zeros(0)
        dev = np.abs(v.astype(np.float64) - med)
        cols = {
            entity_col: tbl[entity_col],
            ts_col: tbl[ts_col],
            value_col: tbl[value_col],
            "med": pa.array(med),
            "mad": pa.array(mad),
            "spike": pa.array(dev > n_mads * mad),
        }
        if tiebreak_col is not None:
            cols[tiebreak_col] = tbl[tiebreak_col]
        return pa.table(cols)

    return grouped_by_bucket(ds, per_bucket, entity_col, num_buckets)
