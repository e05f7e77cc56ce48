"""Event-time window aggregation — the engine-defining operator.

Distributed re-expression of ``nonuniform_rolling_apply`` / ``get_indices``
(reference:util/windows.py:162-220, oracle: pymhealth_ray.functions.windows):
per entity, a window-start grid ``arange(first_ts, last_ts, wstep)`` anchored
at the entity's first event, half-open ``[start, start+wsize)`` windows whose
bounds are located by ``searchsorted`` (side='left'); windows with fewer than
``min_window_len`` rows yield NaN.

Physical plan: ONE entity-bucket shuffle (stages.partition), then per bucket
a single (entity, ts) Arrow sort and vectorized per-entity aggregation —
count/sum/mean/var/std come from cumulative sums, min/max from
``ufunc.reduceat`` over interleaved [start,end) bounds (overlap-safe), any
registered scalar kernel falls back to a bounded per-window loop.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable

import numpy as np
import pyarrow as pa

from pymhealth_ray.functions import KERNELS
from pymhealth_ray.stages.partition import (
    column_f64,
    column_i64,
    entity_segments,
    grouped_by_bucket,
)

#: aggregates with a fully vectorized segmented implementation
FAST_AGGS = {"count", "sum", "mean", "var", "std", "min", "max"}


def _reduceat_minmax(v: np.ndarray, si: np.ndarray, ei: np.ndarray, op) -> np.ndarray:
    """Per-window reduce over possibly-overlapping [si, ei) windows using one
    ufunc.reduceat call on interleaved bounds; empty windows → NaN."""
    n = len(si)
    out = np.full(n, np.nan)
    if n == 0 or len(v) == 0:
        return out
    nonempty = ei > si
    if not nonempty.any():
        return out
    si_ne, ei_ne = si[nonempty], ei[nonempty]
    idx = np.empty(2 * len(si_ne), dtype=np.int64)
    idx[0::2] = si_ne
    idx[1::2] = np.minimum(ei_ne, len(v) - 1)  # guard: reduceat needs idx < len
    red = op.reduceat(v, idx)[0::2]
    # windows whose end was clamped (ei == len(v)) are still correct because
    # reduceat reduces to the array end when idx[k] >= idx[k+1] is False and
    # the final slot runs to the end; handle the exact semantics below:
    # reduceat slot k covers [idx[2k], idx[2k+1]) unless idx[2k] >= idx[2k+1],
    # in which case it yields v[idx[2k]]. For ei == len(v) the pair is
    # (si, len-1) which drops the final element — patch those windows.
    clipped = ei_ne == len(v)
    if clipped.any():
        red = red.copy()
        red[clipped] = op(red[clipped], v[-1])
    # pairs where si == ei-? empty handled by mask; pairs with si >= len-1 fine
    out[nonempty] = red
    return out


def _reduceat_sum(v: np.ndarray, si: np.ndarray, ei: np.ndarray) -> np.ndarray:
    """Fresh per-window sums over (possibly overlapping) [si, ei) bounds via
    one np.add.reduceat on interleaved pairs — avoids the absolute error
    floor of cumulative-sum differencing (degenerate windows sum exactly)."""
    n = len(si)
    out = np.zeros(n)
    if n == 0 or len(v) == 0:
        return out
    nonempty = ei > si
    if not nonempty.any():
        return out
    si_ne, ei_ne = si[nonempty], ei[nonempty]
    idx = np.empty(2 * len(si_ne), dtype=np.int64)
    idx[0::2] = si_ne
    idx[1::2] = np.minimum(ei_ne, len(v) - 1)
    red = np.add.reduceat(v, idx)[0::2]
    clipped = ei_ne == len(v)
    if clipped.any():
        red = red.copy()
        # pair (si, len-1): when si == len-1 reduceat returned v[-1] already
        add_tail = clipped & (si_ne < len(v) - 1)
        red[add_tail] = red[add_tail] + v[-1]
    out[nonempty] = red
    return out


def _window_bounds(ts: np.ndarray, wsize: int, wstep: int):
    """Exact get_indices semantics for one entity (ts sorted int64 ns)."""
    starts = np.arange(ts[0], ts[-1], wstep)
    si = np.searchsorted(ts, starts, side="left")
    ei = np.searchsorted(ts, starts + wsize, side="left")
    return starts, si, ei


def compute_entity_windows(
    ts: np.ndarray,
    values: Dict[str, np.ndarray],
    wsize: int,
    wstep: int,
    aggs: Dict[str, tuple],
    min_window_len: int = 1,
    emit_empty: bool = True,
):
    """Aggregate one entity's sorted stream. ``aggs`` maps output column name
    → (value_col, agg_name_or_callable). Returns (window_start_ts, out_cols,
    counts) or None when the grid is empty (single-event entities produce no
    windows, exactly like ``arange(t, t, step)`` — reference:util/windows.py:175).
    """
    if len(ts) == 0 or ts[0] == ts[-1]:
        return None
    starts, si, ei = _window_bounds(ts, wsize, wstep)
    if len(starts) == 0:
        return None
    cnt = (ei - si).astype(np.int64)
    small = cnt < min_window_len

    out_cols: Dict[str, np.ndarray] = {}
    cumsums: Dict[str, np.ndarray] = {}
    centers: Dict[str, np.ndarray] = {}

    def cs_of(col):
        if col not in cumsums:
            cumsums[col] = np.concatenate([[0.0], np.cumsum(values[col])])
        return cumsums[col]

    def centered_of(col):
        # centered by the entity mean: kills the catastrophic cancellation of
        # the naive E[x^2]-E[x]^2 one-pass (a 1-element window is exactly 0)
        if col not in centers:
            c = float(values[col].mean()) if len(values[col]) else 0.0
            centers[col] = values[col] - c
        return centers[col]

    fcnt = cnt.astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        for name, (col, agg) in aggs.items():
            if agg == "count":
                res = fcnt.copy()
            elif callable(agg) or agg not in FAST_AGGS:
                fn = agg if callable(agg) else KERNELS[agg]
                v = values[col]
                res = np.full(len(starts), np.nan)
                for i in range(len(starts)):
                    if cnt[i] >= max(min_window_len, 1):
                        res[i] = fn(v[si[i] : ei[i]])
            elif agg == "min":
                res = _reduceat_minmax(values[col], si, ei, np.minimum)
            elif agg == "max":
                res = _reduceat_minmax(values[col], si, ei, np.maximum)
            else:
                cs = cs_of(col)
                s1 = cs[ei] - cs[si]
                if agg == "sum":
                    res = s1
                elif agg == "mean":
                    res = s1 / fcnt
                else:  # var / std (population, ddof=0 — reference convention)
                    vc = centered_of(col)
                    s1c = _reduceat_sum(vc, si, ei)
                    s2c = _reduceat_sum(vc * vc, si, ei)
                    m2 = np.maximum(s2c / fcnt - (s1c / fcnt) ** 2, 0.0)
                    res = m2 if agg == "var" else np.sqrt(m2)
            res = np.asarray(res, dtype=np.float64)
            res[small] = np.nan
            out_cols[name] = res

    if not emit_empty:
        keep = cnt > 0
        starts = starts[keep]
        cnt = cnt[keep]
        out_cols = {k: v[keep] for k, v in out_cols.items()}
    return starts, out_cols, cnt


def window_features(
    ds,
    wsize_ns: int,
    wstep_ns: int | None = None,
    aggs: Dict[str, tuple] | None = None,
    entity_col: str = "doc_id",
    ts_col: str = "ts_ns",
    min_window_len: int = 1,
    emit_empty: bool = True,
    num_buckets: int = 64,
):
    """Event-time window aggregation over the whole dataset.

    ``aggs``: {output_name: (value_col, agg)} where agg ∈ FAST_AGGS, a name
    in functions.KERNELS, or any callable f(np.ndarray)->float (the engine's
    pass-any-kernel extension surface, mirroring
    reference:util/windows.py:181's factory API). Multiple aggregates share
    one grid/searchsorted pass per entity (the list/dict variants,
    reference:util/windows.py:223-249).

    Output: one row per (entity, window_start): ``entity_col``,
    ``window_start_ns``, ``n_in_window`` + one column per agg.
    """
    if wstep_ns is None:
        wstep_ns = wsize_ns  # tumbling by default
    if aggs is None:
        aggs = {"value_mean": ("value", "mean")}
    value_cols = sorted({col for col, _ in aggs.values()})

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl, starts, n_ent = entity_segments(tbl, entity_col, ts_col)
        ts_all = column_i64(tbl, ts_col)
        vals_all = {c: column_f64(tbl, c) for c in value_cols}
        ent_arr = tbl[entity_col]
        if isinstance(ent_arr, pa.ChunkedArray):
            ent_arr = ent_arr.combine_chunks()

        out_entity_idx = []
        out_ts = []
        out_cnt = []
        out_feats: Dict[str, list] = {name: [] for name in aggs}
        for k in range(n_ent):
            lo, hi = starts[k], starts[k + 1]
            res = compute_entity_windows(
                ts_all[lo:hi],
                {c: v[lo:hi] for c, v in vals_all.items()},
                wsize_ns,
                wstep_ns,
                aggs,
                min_window_len,
                emit_empty,
            )
            if res is None:
                continue
            w_starts, cols, cnt = res
            out_entity_idx.append(np.full(len(w_starts), lo, dtype=np.int64))
            out_ts.append(w_starts)
            out_cnt.append(cnt)
            for name in aggs:
                out_feats[name].append(cols[name])

        if not out_ts:
            fields = {
                entity_col: pa.array([], type=pa.string()),
                "window_start_ns": pa.array([], type=pa.int64()),
                "n_in_window": pa.array([], type=pa.int64()),
            }
            for name in aggs:
                fields[name] = pa.array([], type=pa.float64())
            return pa.table(fields)

        ent_take = pa.array(np.concatenate(out_entity_idx))
        fields = {
            entity_col: ent_arr.take(ent_take),
            "window_start_ns": pa.array(np.concatenate(out_ts).astype(np.int64)),
            "n_in_window": pa.array(np.concatenate(out_cnt)),
        }
        for name in aggs:
            fields[name] = pa.array(np.concatenate(out_feats[name]), type=pa.float64())
        return pa.table(fields)

    return grouped_by_bucket(ds, per_bucket, entity_col, num_buckets)
