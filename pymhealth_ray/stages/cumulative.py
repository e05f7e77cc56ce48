"""Per-entity cumulative features — running sum / max / index in event-time
order, fully vectorized across entities inside each bucket.

The classic "expanding window" family (reference `nni_cumulative`,
`/root/reference/src/mhealth/heart/hrv.py`, generalized per SURVEY §2.6):
unlike the trailing windows in stages/window.py these never forget, so they
ride the same single entity-bucket exchange and one sorted pass.

Vectorization notes (no per-entity Python loop):
- segmented cumsum: global ``np.cumsum`` minus the per-segment base,
  exact in int64;
- segmented cummax: each segment's values are lifted by
  ``segment_id << 32`` (values are int32-bounded), one global
  ``np.maximum.accumulate``, then the lift is removed — monotone lifts
  never mix segments, and integer arithmetic keeps it exact;
- running index: ``arange`` minus the repeated segment start.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pymhealth_ray.stages.partition import (
    column_i64,
    entity_segments,
    grouped_by_bucket,
)

_LIFT = np.int64(1) << np.int64(32)


def cumulative_features(ds, entity_col: str, ts_col: str, value_col: str,
                        tiebreak_col: str | None = None,
                        num_buckets: int = 32):
    """Append ``cum_sum`` / ``cum_max`` / ``seq_idx`` (all int64; seq_idx is
    1-based) over integer ``value_col`` per entity in (ts[, tiebreak])
    order. Values must fit in int32 (the cummax lift's headroom)."""

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl, starts, n_ent = entity_segments(tbl, entity_col, ts_col,
                                             tiebreak_col)
        x = column_i64(tbl, value_col)
        if len(x) and (x.max() >= 2**31 or x.min() <= -(2**31)):
            raise ValueError("cumulative_features requires int32-range values")
        seg_lens = np.diff(starts)
        seg_of = np.repeat(np.arange(n_ent, dtype=np.int64), seg_lens)

        c = np.cumsum(x)
        base = c[starts[:-1]] - x[starts[:-1]] if n_ent else np.empty(0, np.int64)
        cum_sum = c - np.repeat(base, seg_lens)

        lifted = x + seg_of * _LIFT
        cum_max = np.maximum.accumulate(lifted) - seg_of * _LIFT

        seq_idx = np.arange(len(x), dtype=np.int64) - \
            np.repeat(starts[:-1], seg_lens) + 1

        return (tbl.append_column("cum_sum", pa.array(cum_sum))
                   .append_column("cum_max", pa.array(cum_max))
                   .append_column("seq_idx", pa.array(seq_idx)))

    return grouped_by_bucket(ds, per_bucket, entity_col=entity_col,
                             num_buckets=num_buckets)


def cumulative_arrays(x: np.ndarray, starts: np.ndarray):
    """(cum_sum, cum_max, seq_idx) int64 arrays for pre-sorted segments —
    the kernel behind :func:`cumulative_features`, exposed so combined
    single-exchange stages (stages/temporal.py) can reuse it."""
    n_ent = len(starts) - 1
    seg_lens = np.diff(starts)
    seg_of = np.repeat(np.arange(n_ent, dtype=np.int64), seg_lens)
    c = np.cumsum(x)
    base = c[starts[:-1]] - x[starts[:-1]] if n_ent else np.empty(0, np.int64)
    cum_sum = c - np.repeat(base, seg_lens)
    lifted = x + seg_of * _LIFT
    cum_max = np.maximum.accumulate(lifted) - seg_of * _LIFT
    seq_idx = np.arange(len(x), dtype=np.int64) - \
        np.repeat(starts[:-1], seg_lens) + 1
    return cum_sum, cum_max, seq_idx
