"""Robust per-entity trend estimation — the Theil–Sen slope.

The Theil–Sen estimator (median of all pairwise slopes) tolerates up to
~29% outliers where OLS breaks on one; it is the robust twin of the
exact-integer OLS trend in `events_hourly_trend`. Per entity with m
observations the pair space is m·(m−1)/2 — bounded by per-entity event
counts, the same contract as the basket pair explosion
(stages/assoc.item_pair_topk), NOT by corpus size.

Plan: one bucket exchange co-locating whole entities → per bucket the
pair explosion is fully vectorized (triangles.segment_pairs over entity
segments), equal-timestamp pairs are masked out (slope undefined), and
every entity's slope median comes from ONE np.lexsort over the pair
array. Median follows SQL ``median(DOUBLE)`` bit-exactly: odd count →
middle element; even → the convex combination lo·0.5 + hi·0.5 (fuzzed
against DuckDB — the lo + (hi−lo)·0.5 form is 1 ulp off).

Slope units: value per SECOND — computed as
``(v_j − v_i) · 1e6 / (t_j − t_i)`` with t in integer microseconds and
exactly that op order, so SQL mirrors it bit for bit.

Reference lineage: robust generalization of the reference's o1fit
linear trend (`/root/reference/src/mhealth/generic/timedom.py`);
SURVEY §2.4 surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pymhealth_ray.stages.partition import (column_i64, entity_segments,
                                            grouped_by_bucket)
from pymhealth_ray.stages.triangles import segment_pairs


def _segment_median_cont(vals: np.ndarray, seg_id: np.ndarray,
                         n_seg: int) -> np.ndarray:
    """quantile_cont(0.5) per segment: one lexsort of (vals within
    seg_id), then index arithmetic — no per-segment Python."""
    order = np.lexsort((vals, seg_id))
    sv, sg = vals[order], seg_id[order]
    starts = np.zeros(n_seg, dtype=np.int64)
    lens = np.bincount(sg, minlength=n_seg).astype(np.int64)
    starts[1:] = np.cumsum(lens)[:-1]
    if (lens == 0).any():
        raise ValueError("empty slope segment")
    lo = sv[starts + (lens - 1) // 2]
    hi = sv[starts + lens // 2]
    # DuckDB interpolates as the convex combination lo·0.5 + hi·0.5
    # (NOT lo + (hi−lo)·0.5 — verified 1-ulp different on fuzzed pairs)
    return lo * 0.5 + hi * 0.5


def theil_sen_by_entity(ds, entity_col: str, ts_col: str, val_col: str,
                        tiebreak_col: str | None = None,
                        num_buckets: int = 32,
                        out_name: str = "ts_slope"):
    """One row per entity: (entity, n_pairs, ts_slope). Entities whose
    observations all share one timestamp (no defined pair) are dropped,
    mirroring SQL's inner pair join."""

    def per_bucket(tbl: pa.Table) -> pa.Table:
        ent_t = tbl.schema.field(entity_col).type  # preserve key dtype
        empty = pa.table({entity_col: pa.array([], type=ent_t),
                          "n_pairs": pa.array([], type=pa.int64()),
                          out_name: pa.array([], type=pa.float64())})
        if tbl.num_rows == 0:
            return empty
        tbl, starts, n_ent = entity_segments(tbl, entity_col, ts_col,
                                             tiebreak_col=tiebreak_col)
        ts = column_i64(tbl, ts_col)
        v = tbl[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ent = tbl[entity_col].to_numpy(zero_copy_only=False)
        fi, se = segment_pairs(np.diff(starts))
        if not len(fi):
            return empty
        gap = ts[se] - ts[fi]
        ok = gap > 0
        fi, se, gap = fi[ok], se[ok], gap[ok]
        if not len(fi):
            return empty
        slopes = (v[se] - v[fi]) * 1e6 / gap.astype(np.float64)
        eid = np.searchsorted(starts, fi, side="right") - 1
        ue, einv = np.unique(eid, return_inverse=True)
        med = _segment_median_cont(slopes, einv.astype(np.int64), len(ue))
        n_pairs = np.bincount(einv, minlength=len(ue)).astype(np.int64)
        return pa.table({entity_col: pa.array(ent[starts[ue]]),
                         "n_pairs": pa.array(n_pairs),
                         out_name: pa.array(med)})

    cols = [entity_col, ts_col, val_col]
    if tiebreak_col is not None:
        cols.append(tiebreak_col)
    return grouped_by_bucket(ds.select_columns(cols), per_bucket,
                             entity_col=entity_col,
                             num_buckets=num_buckets)


def kendall_by_entity(ds, entity_col: str, ts_col: str, val_col: str,
                      num_buckets: int = 32):
    """Kendall rank correlation per entity between time and value —
    the nonparametric monotone-trend test next to the Theil-Sen slope.
    Pairs with equal timestamps are excluded (the Theil-Sen
    convention); value ties count as neither concordant nor
    discordant. All counting is int64-exact through the same
    segment_pairs explosion; tau = (C − D) / n_pairs is the one float
    divide (tau-a over distinct-time pairs).

    Output: (entity, n_pairs, concordant, discordant, tau)."""

    def per_bucket(tbl: pa.Table) -> pa.Table:
        ent_t = tbl.schema.field(entity_col).type  # preserve key dtype
        empty = pa.table({entity_col: pa.array([], type=ent_t),
                          "n_pairs": pa.array([], type=pa.int64()),
                          "concordant": pa.array([], type=pa.int64()),
                          "discordant": pa.array([], type=pa.int64()),
                          "tau": pa.array([], type=pa.float64())})
        if tbl.num_rows == 0:
            return empty
        tbl, starts, n_ent = entity_segments(tbl, entity_col, ts_col)
        ts = column_i64(tbl, ts_col)
        v = tbl[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ent = tbl[entity_col].to_numpy(zero_copy_only=False)
        fi, se = segment_pairs(np.diff(starts))
        if not len(fi):
            return empty
        ok = ts[se] - ts[fi] > 0
        fi, se = fi[ok], se[ok]
        if not len(fi):
            return empty
        eid = np.searchsorted(starts, fi, side="right") - 1
        ue, einv = np.unique(eid, return_inverse=True)
        n_pairs = np.bincount(einv, minlength=len(ue)).astype(np.int64)
        conc = np.bincount(einv, weights=(v[se] > v[fi])) \
            .astype(np.int64)
        disc = np.bincount(einv, weights=(v[se] < v[fi])) \
            .astype(np.int64)
        tau = (conc - disc).astype(np.float64) \
            / n_pairs.astype(np.float64)
        return pa.table({entity_col: pa.array(ent[starts[ue]]),
                         "n_pairs": pa.array(n_pairs),
                         "concordant": pa.array(conc),
                         "discordant": pa.array(disc),
                         "tau": pa.array(tau)})

    return grouped_by_bucket(ds.select_columns([entity_col, ts_col,
                                                val_col]), per_bucket,
                             entity_col=entity_col,
                             num_buckets=num_buckets)
