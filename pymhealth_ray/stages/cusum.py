"""Per-entity CUSUM change detection (Page 1954) — the streaming drift
alarm of mHealth monitoring (heart-rate baseline shifts, activity-level
changes) generalized to any (entity, ts, value) stream.

One-sided upper CUSUM: s_i = max(0, s_{i-1} + (x_i − k)). The clamped
scan has the closed form s_i = p_i − min_{j≤i} p_j with p the plain
cumulative sum of (x − k) and p_0 = 0, so the whole bucket vectorizes as
ONE cumsum + ONE running minimum (np.minimum.accumulate) with per-entity
segment offsets — no sequential Python loop. Values are integer cents, so
every statistic is exact int64 and the SQL window oracle (cumulative sum
− cumulative min) matches bit-for-bit.

Reference lineage: successive-difference feature kernels
(reference:heart/hrv.py:111-169) extended to a clamped change statistic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pymhealth_ray.stages.partition import (
    column_i64,
    entity_segments,
    grouped_by_bucket,
)


def cusum(ds, entity_col: str, ts_col: str, value_col: str, *,
          k: int, h: int, out: str = "cusum", alarm: str = "alarm",
          num_buckets: int = 64, tiebreak_col: str | None = None):
    """Append the one-sided upper CUSUM statistic and the ``s > h`` alarm
    flag per (entity, ts)-ordered row. ``value_col`` MUST be integer
    (cents) — k and h are in the same units; all arithmetic is exact."""

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl, starts, n_ent = entity_segments(tbl, entity_col, ts_col,
                                             tiebreak_col)
        v = column_i64(tbl, value_col)
        y = v - np.int64(k)
        p = np.cumsum(y)
        # per-entity reset: subtract the segment's preceding total so each
        # entity's prefix starts at its own 0
        seg_off = np.zeros(len(v), dtype=np.int64)
        if n_ent and len(v):
            base = np.concatenate(([0], p[starts[1:-1] - 1])) if n_ent > 1 \
                else np.zeros(1, dtype=np.int64)
            seg_off = np.repeat(base, np.diff(starts))
        p = p - seg_off
        # running min of (0, p_1..p_i) within each segment == clamp scan.
        # Segmented running-min without a per-entity loop: shift each
        # segment down by seg_id·L (L > global value range) so one global
        # minimum.accumulate can never carry a value across a boundary,
        # then shift back.
        pm = np.minimum(p, 0)  # include the implicit p_0 = 0
        if len(pm):
            seg_id = np.repeat(np.arange(n_ent, dtype=np.int64),
                               np.diff(starts))
            L = np.int64(int(pm.max()) - int(pm.min()) + 1)
            run = np.minimum.accumulate(pm - seg_id * L) + seg_id * L
        else:
            run = pm
        s = p - run
        return pa.table({
            entity_col: tbl[entity_col],
            ts_col: tbl[ts_col],
            value_col: tbl[value_col],
            out: pa.array(s),
            alarm: pa.array(s > np.int64(h)),
        })

    return grouped_by_bucket(ds, per_bucket, entity_col, num_buckets)
