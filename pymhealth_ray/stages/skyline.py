"""Distributed 2-D skyline (Pareto front): minimize one column, maximize
another, keep every row no other row dominates.

Skylines are the rare wide operator that needs NO exchange at all: the
skyline of a union is the skyline of the union of per-part skylines
(dominance is transitive and oblivious to partitioning), so the plan is
local skyline per block → union of the tiny survivors → one more local
pass over a single coalesced block. The 2-D local kernel is a sort +
running max, O(n log n), fully vectorized; survivors at 100 TB are the
per-block fronts, typically O(log n) rows each for random data, so the
final single-block pass is driver-scale by construction (a skew-proof
variant would tree-merge, which this composes into trivially).

Dominance: row j dominates row i iff ``min_col_j <= min_col_i`` and
``max_col_j >= max_col_i`` with at least one strict. Exact ties on BOTH
columns dominate neither way — all duplicates of a front point survive,
matching the SQL ``NOT EXISTS`` oracle form.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def skyline_mask(minimize: np.ndarray, maximize: np.ndarray) -> np.ndarray:
    """Boolean mask of non-dominated rows (see module dominance rule).
    Integer inputs keep the comparison exact end to end."""
    n = len(minimize)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-maximize, minimize))  # min_col asc, max_col desc
    p, s = minimize[order], maximize[order]
    new_p = np.concatenate(([True], p[1:] != p[:-1]))
    grp_id = np.cumsum(new_p) - 1
    grp_max = s[new_p]  # sorted desc within a price group → first is max
    prev_max = np.full(len(grp_max), np.iinfo(np.int64).min, dtype=np.int64)
    if len(grp_max) > 1:
        prev_max[1:] = np.maximum.accumulate(grp_max)[:-1]
    keep_sorted = (s == grp_max[grp_id]) & (s > prev_max[grp_id])
    mask = np.zeros(n, dtype=bool)
    mask[order[keep_sorted]] = True
    return mask


def skyline_2d(ds, min_col: str, max_col: str):
    """Rows of ``ds`` on the (min_col, max_col) Pareto front, all columns
    carried through. Two map-only passes, zero exchanges."""

    def local(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        mn = b[min_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mx = b[max_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.filter(pa.array(skyline_mask(mn, mx)))

    partial = ds.map_batches(local, batch_format="pyarrow", batch_size=None)
    return partial.repartition(1).map_batches(local, batch_format="pyarrow",
                                              batch_size=None)
