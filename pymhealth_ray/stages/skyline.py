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


def skyline_mask_nd(mins: np.ndarray, maxs: np.ndarray,
                    chunk: int = 2048) -> np.ndarray:
    """Boolean mask of non-dominated rows in ANY dimension count —
    ``mins``/``maxs`` are (n, d_min)/(n, d_max) int64 matrices. Rule:
    j dominates i iff j ≤ i on every minimized dim and j ≥ i on every
    maximized dim, with at least one strict; full ties dominate
    neither way (all duplicates of a front point survive, matching the
    SQL NOT EXISTS form).

    Chunked block-nested-loop: rows stream in (first-min asc) order in
    blocks of ``chunk``; each block tests against the SURVIVOR SET with
    one broadcast compare (survivors are tiny for non-degenerate data),
    then resolves intra-block dominance pairwise. Python-level work is
    O(n/chunk) iterations, not O(n)."""
    n = len(mins) if len(mins) else len(maxs)
    if n == 0:
        return np.zeros(0, dtype=bool)
    # canonical form: negate maximized dims -> all-minimize
    pts = np.concatenate([mins.reshape(n, -1),
                          -maxs.reshape(n, -1)], axis=1)
    order = np.lexsort(tuple(pts[:, k] for k in
                             range(pts.shape[1] - 1, -1, -1)))
    p = pts[order]

    def dominated_by(cand: np.ndarray, ref: np.ndarray) -> np.ndarray:
        """cand (c, d) rows dominated by ANY ref (s, d) row."""
        if not len(ref) or not len(cand):
            return np.zeros(len(cand), dtype=bool)
        le = ref[None, :, :] <= cand[:, None, :]  # (c, s, d)
        lt = ref[None, :, :] < cand[:, None, :]
        return (le.all(axis=2) & lt.any(axis=2)).any(axis=1)

    keep_sorted = np.zeros(n, dtype=bool)
    surv = np.zeros((0, p.shape[1]), dtype=np.int64)
    for lo in range(0, n, chunk):
        blk = p[lo:lo + chunk]
        alive = ~dominated_by(blk, surv)
        idx = np.flatnonzero(alive)
        # intra-block resolve among the survivors-so-far of this block
        sub = blk[idx]
        intra = ~dominated_by(sub, sub)
        final = idx[intra]
        keep_sorted[lo + final] = True
        surv = np.concatenate([surv, blk[final]])
    mask = np.zeros(n, dtype=bool)
    mask[order[keep_sorted]] = True
    return mask


def skyline_nd(ds, min_cols, max_cols):
    """n-dimensional Pareto front, same zero-exchange plan as
    :func:`skyline_2d` (skyline of a union == skyline of the union of
    local skylines): local front per block, then one pass over the
    coalesced survivors."""
    min_cols = list(min_cols)
    max_cols = list(max_cols)

    def local(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        mn = np.stack([b[c].to_numpy(zero_copy_only=False)
                       .astype(np.int64) for c in min_cols], axis=1) \
            if min_cols else np.zeros((b.num_rows, 0), dtype=np.int64)
        mx = np.stack([b[c].to_numpy(zero_copy_only=False)
                       .astype(np.int64) for c in max_cols], axis=1) \
            if max_cols else np.zeros((b.num_rows, 0), dtype=np.int64)
        return b.filter(pa.array(skyline_mask_nd(mn, mx)))

    partial = ds.map_batches(local, batch_format="pyarrow",
                             batch_size=None)
    return partial.repartition(1).map_batches(local,
                                              batch_format="pyarrow",
                                              batch_size=None)
