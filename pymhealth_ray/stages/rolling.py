"""Count-based rolling windows — the distributed ``rolling_apply``.

Semantics of reference:util/windows.py:54-95 (oracle:
functions.windows.rolling_apply): per entity in (ts[, tiebreak]) order,
window ``i`` covers rows ``[i*wstep, i*wstep + wsize)``;
``nw = max(0, 1 + (n - wsize) // wstep)`` full windows only. Aggregation is
vectorized per entity via cumulative sums.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pymhealth_ray.stages.partition import (
    column_f64,
    entity_segments,
    grouped_by_bucket,
)


def rolling_count_windows(
    ds,
    value_col: str,
    wsize: int,
    wstep: int = 1,
    entity_col: str = "doc_id",
    ts_col: str = "ts_ns",
    tiebreak_col: str | None = None,
    num_buckets: int = 64,
):
    """One row per (entity, window_idx): count-window mean/sum of value.

    Output: entity, window_idx (0-based), ``{value}_mean``, ``{value}_sum``.
    """

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl, starts, n_ent = entity_segments(tbl, entity_col, ts_col, tiebreak_col)
        v = column_f64(tbl, value_col)
        cs = np.concatenate([[0.0], np.cumsum(v)])
        ent_arr = tbl[entity_col]
        if isinstance(ent_arr, pa.ChunkedArray):
            ent_arr = ent_arr.combine_chunks()
        out_take, out_idx, out_sum = [], [], []
        for k in range(n_ent):
            lo, hi = starts[k], starts[k + 1]
            n = hi - lo
            nw = max(0, 1 + (n - wsize) // wstep)
            if nw == 0:
                continue
            w0 = lo + np.arange(nw, dtype=np.int64) * wstep
            s = cs[w0 + wsize] - cs[w0]
            out_take.append(np.full(nw, lo, dtype=np.int64))
            out_idx.append(np.arange(nw, dtype=np.int64))
            out_sum.append(s)
        if not out_idx:
            return pa.table(
                {
                    entity_col: ent_arr.slice(0, 0),
                    "window_idx": pa.array([], type=pa.int64()),
                    f"{value_col}_mean": pa.array([], type=pa.float64()),
                    f"{value_col}_sum": pa.array([], type=pa.float64()),
                }
            )
        sums = np.concatenate(out_sum)
        return pa.table(
            {
                entity_col: ent_arr.take(pa.array(np.concatenate(out_take))),
                "window_idx": pa.array(np.concatenate(out_idx)),
                f"{value_col}_mean": pa.array(sums / wsize),
                f"{value_col}_sum": pa.array(sums),
            }
        )

    return grouped_by_bucket(ds, per_bucket, entity_col, num_buckets)


def rolling_corr(ds, entity_col: str, ts_col: str, x_col: str, y_col: str,
                 window: int, tiebreak_col: str | None = None,
                 num_buckets: int = 32, out_name: str = "corr"):
    """Trailing ``window``-row Pearson correlation of two INTEGER columns
    per entity in ts order (NULL where either variance is zero, e.g. the
    first row of every entity).

    Numerics: all five window sums (Sx, Sy, Sxx, Syy, Sxy) come from int64
    cumulative-sum differences — exact, so the cancellation poison that
    forbids float cumsum variance (CLAUDE.md) does not apply. The only
    float work is the final ``num / (sqrt(denx)·sqrt(deny))`` (the split
    sqrt keeps the product inside float range; denx·deny can overflow
    int64). One pass, no per-entity Python."""

    def per_bucket(tbl: pa.Table) -> pa.Table:
        from pymhealth_ray.stages.partition import column_i64

        tbl, starts, n_ent = entity_segments(tbl, entity_col, ts_col,
                                             tiebreak_col)
        x = column_i64(tbl, x_col)
        y = column_i64(tbl, y_col)
        n_rows = len(x)
        seg_lens = np.diff(starts)
        seg_start = np.repeat(starts[:-1], seg_lens)
        i = np.arange(n_rows, dtype=np.int64)
        s = np.maximum(i - window + 1, seg_start)
        n = (i - s + 1)

        def wsum(v):
            c = np.concatenate(([0], np.cumsum(v)))
            return c[i + 1] - c[s]

        sx, sy = wsum(x), wsum(y)
        sxx, syy, sxy = wsum(x * x), wsum(y * y), wsum(x * y)
        num = n * sxy - sx * sy
        denx = n * sxx - sx * sx
        deny = n * syy - sy * sy
        ok = (denx > 0) & (deny > 0)
        with np.errstate(invalid="ignore", divide="ignore"):
            corr = num.astype(np.float64) / (
                np.sqrt(denx.astype(np.float64)) *
                np.sqrt(deny.astype(np.float64)))
        out = pa.array(np.where(ok, corr, 0.0), type=pa.float64(),
                       mask=~ok)
        return tbl.append_column(out_name, out)

    return grouped_by_bucket(ds, per_bucket, entity_col=entity_col,
                             num_buckets=num_buckets)


def rolling_zscore(ds, entity_col: str, ts_col: str, value_col: str,
                   window: int, tiebreak_col: str | None = None,
                   num_buckets: int = 32, out_name: str = "rz"):
    """Trailing ``window``-row z-score of an INTEGER column per entity —
    the temporal anomaly signal ((x − win_mean) / win_std, sample std,
    NULL when the window has <2 rows or zero variance). Same exact-int64
    cumsum-difference machinery as :func:`rolling_corr`."""

    def per_bucket(tbl: pa.Table) -> pa.Table:
        from pymhealth_ray.stages.partition import column_i64

        tbl, starts, n_ent = entity_segments(tbl, entity_col, ts_col,
                                             tiebreak_col)
        x = column_i64(tbl, value_col)
        n_rows = len(x)
        seg_lens = np.diff(starts)
        seg_start = np.repeat(starts[:-1], seg_lens)
        i = np.arange(n_rows, dtype=np.int64)
        s = np.maximum(i - window + 1, seg_start)
        n = (i - s + 1)

        def wsum(v):
            c = np.concatenate(([0], np.cumsum(v)))
            return c[i + 1] - c[s]

        sx = wsum(x)
        sxx = wsum(x * x)
        den_int = n * sxx - sx * sx
        ok = (n > 1) & (den_int > 0)
        with np.errstate(invalid="ignore", divide="ignore"):
            z = ((x.astype(np.float64) - sx.astype(np.float64) / n) /
                 np.sqrt(den_int.astype(np.float64) /
                         (n.astype(np.float64) * (n - 1))))
        out = pa.array(np.where(ok, z, 0.0), type=pa.float64(), mask=~ok)
        return tbl.append_column(out_name, out)

    return grouped_by_bucket(ds, per_bucket, entity_col=entity_col,
                             num_buckets=num_buckets)


def rolling_z_arrays(x: np.ndarray, starts: np.ndarray, window: int):
    """(z, ok) for pre-sorted segments — the exact-int64 kernel behind
    :func:`rolling_zscore`, reusable by combined stages."""
    n_rows = len(x)
    seg_lens = np.diff(starts)
    seg_start = np.repeat(starts[:-1], seg_lens)
    i = np.arange(n_rows, dtype=np.int64)
    s = np.maximum(i - window + 1, seg_start)
    n = (i - s + 1)

    def wsum(v):
        c = np.concatenate(([0], np.cumsum(v)))
        return c[i + 1] - c[s]

    sx = wsum(x)
    sxx = wsum(x * x)
    den_int = n * sxx - sx * sx
    ok = (n > 1) & (den_int > 0)
    with np.errstate(invalid="ignore", divide="ignore"):
        z = ((x.astype(np.float64) - sx.astype(np.float64) / n) /
             np.sqrt(den_int.astype(np.float64) /
                     (n.astype(np.float64) * (n - 1))))
    return np.where(ok, z, 0.0), ok
