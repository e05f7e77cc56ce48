"""Combined temporal feature pack — MANY features, ONE exchange.

At cluster scale the entity-bucket exchange is the expensive step, not the
per-bucket math: computing cumulative features, a trailing z-score and
lag/diff as separate stages pays that shuffle once per feature. This stage
sorts each bucket once and evaluates the whole feature set over the same
(x, starts) segments — the same amortize-the-exchange design as the
flagship's single temporal pass (pipelines/flagship.py) and the map-side
combined windows (stages/window.py), applied to the expanding/trailing
feature family.

Kernels are the SAME functions the standalone stages use
(cumulative.cumulative_arrays, rolling.rolling_z_arrays), so each output
column is bit-identical to its single-op query — the oracle composes the
already-verified SQL pieces into one statement.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pymhealth_ray.stages.cumulative import cumulative_arrays
from pymhealth_ray.stages.partition import (
    column_i64,
    entity_segments,
    grouped_by_bucket,
)
from pymhealth_ray.stages.rolling import rolling_z_arrays


def temporal_feature_pack(ds, entity_col: str, ts_col: str, value_col: str,
                          window: int = 16, tiebreak_col: str | None = None,
                          num_buckets: int = 32):
    """Append cum_sum / cum_max / seq_idx / rz (trailing z-score) / lag1 /
    diff1 of integer ``value_col`` per entity — one sorted pass per
    bucket. lag1/diff1 are NULL on each entity's first row."""

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl, starts, n_ent = entity_segments(tbl, entity_col, ts_col,
                                             tiebreak_col)
        x = column_i64(tbl, value_col)
        cum_sum, cum_max, seq_idx = cumulative_arrays(x, starts)
        z, ok = rolling_z_arrays(x, starts, window)
        lag1 = np.empty_like(x)
        lag1[1:] = x[:-1]
        lag1[:1] = 0
        head = np.zeros(len(x), dtype=bool)
        head[starts[:-1]] = True
        diff1 = x - lag1
        return (tbl.append_column("cum_sum", pa.array(cum_sum))
                   .append_column("cum_max", pa.array(cum_max))
                   .append_column("seq_idx", pa.array(seq_idx))
                   .append_column("rz", pa.array(z, type=pa.float64(),
                                                 mask=~ok))
                   .append_column("lag1", pa.array(lag1, type=pa.int64(),
                                                   mask=head))
                   .append_column("diff1", pa.array(diff1, type=pa.int64(),
                                                    mask=head)))

    return grouped_by_bucket(ds, per_bucket, entity_col=entity_col,
                             num_buckets=num_buckets)
