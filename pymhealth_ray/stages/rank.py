"""Exact global rank / dense-rank / percent-rank by a value column.

Window-function semantics (``rank() OVER (ORDER BY v)``) without a global
sort: the value histogram is the whole distribution, so

  1. per-block combiners emit (value, count) partials — the exchange is
     O(distinct values × blocks), never O(rows);
  2. the merged histogram's exclusive prefix sum is the exact CDF,
     broadcast once via ``ray.put``;
  3. map-only apply: one vectorized ``searchsorted`` per batch gives
     rank = #smaller + 1, dense_rank = distinct index + 1,
     percent_rank = (rank − 1)/(n − 1) — a single int/int IEEE division,
     bit-exact against any SQL engine.

This is the bounded-cardinality plan (measurements, prices, scores). For
unbounded doubles use the range-bucket + offset plan that
``stages/shuffle.shuffle_positions`` demonstrates instead — same exchange
topology, positions instead of a CDF.

Exact-decimal values are histogrammed in integer cents so the histogram
keys are integers (no float equality anywhere).

Reference lineage: rank features are the beyond-reference tabular surface
(SURVEY §2.10); the histogram-combiner machinery mirrors
``stages/aggregate.grouped_quantiles``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def value_histogram(ds, value_col: str, scale: int = 100):
    """Driver-side exact histogram: (sorted unique scaled-int values,
    counts). One slim (value, count) exchange."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        iv = np.rint(v.to_numpy(zero_copy_only=False) * scale).astype(np.int64)
        vals, cnts = np.unique(iv, return_counts=True)
        return pa.table({
            "v": pa.array(vals),
            "c": pa.array(cnts.astype(np.int64)),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    agg = partials.groupby("v").sum("c")
    rows = agg.take_all()
    vals = np.array([r["v"] for r in rows], dtype=np.int64)
    cnts = np.array([r["sum(c)"] for r in rows], dtype=np.int64)
    order = np.argsort(vals)
    return vals[order], cnts[order]


def global_rank(ds, value_col: str, scale: int = 100,
                rank_name: str = "rnk", dense_name: str = "drnk",
                pct_name: str = "pct"):
    """Append exact ``rank() / dense_rank() / percent_rank() OVER
    (ORDER BY value)`` columns via a broadcast CDF."""
    import ray

    vals, cnts = value_histogram(ds, value_col, scale)
    n = int(cnts.sum())
    cum_less = np.concatenate(([0], np.cumsum(cnts)[:-1]))
    cdf_ref = ray.put((vals, cum_less, n))

    def fn(batch: pa.Table) -> pa.Table:
        v_sorted, less, total = ray.get(cdf_ref)
        v = batch[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        iv = np.rint(v.to_numpy(zero_copy_only=False) * scale).astype(np.int64)
        idx = np.searchsorted(v_sorted, iv)
        rnk = less[idx] + 1
        drnk = idx.astype(np.int64) + 1
        pct = (rnk - 1) / np.float64(max(total - 1, 1))
        batch = batch.append_column(rank_name, pa.array(rnk))
        batch = batch.append_column(dense_name, pa.array(drnk))
        batch = batch.append_column(pct_name, pa.array(pct))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow")
