"""Distributed model-evaluation statistics: exact grouped ROC-AUC.

AUC is the Mann-Whitney U statistic normalized by npos·nneg — a pure
RANK computation, so it is exact in integers until one closing IEEE
division. Per group:

    AUC = (Σ_{positives} avg_rank − npos·(npos+1)/2) / (npos·nneg)

with ``avg_rank`` the tie-averaged rank of the row's score within the
group. Tie-averaged ranks are half-integers, so everything is carried
DOUBLED (``ar2 = 2·rank_min + ties − 1`` — an int64) and the closing
formula divides by ``2·npos·nneg``; both sides of the driver gate
compute the identical integer numerator and one identical divide.

Plan: one bucket exchange co-locating whole groups (the repo-wide
partitioning invariant), then a single ``np.lexsort`` per bucket ranks
EVERY group's scores at once — no per-group Python. The exchange
carries only (group, score, label); output is one row per group. Groups
without both classes are dropped (AUC undefined), mirroring SQL's
``HAVING npos > 0 AND nneg > 0``.

Reference lineage: generalizes the reference's per-subject summary
statistics (`/root/reference/src/mhealth/generic/stats.py`) to ranked
evaluation metrics; SURVEY §2.10 analytics surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pymhealth_ray.stages.partition import grouped_by_bucket


def grouped_auc(ds, group_col: str, label_col: str, score_col: str,
                num_buckets: int = 32, out_name: str = "auc"):
    """One row per group: (group, npos, nneg, auc). ``label_col`` must be
    0/1 int; ``score_col`` numeric. Ties get average rank (the standard
    Mann-Whitney convention)."""

    def per_bucket(tbl: pa.Table) -> pa.Table:
        if not pa.types.is_integer(tbl.schema.field(group_col).type):
            raise ValueError(
                "grouped_auc requires an integer group column; "
                "dictionary-encode string keys first")
        empty = pa.table({
            group_col: pa.array([], type=pa.int64()),
            "npos": pa.array([], type=pa.int64()),
            "nneg": pa.array([], type=pa.int64()),
            out_name: pa.array([], type=pa.float64()),
        })
        if tbl.num_rows == 0:
            return empty
        g = tbl[group_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = tbl[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sc = tbl[score_col].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((sc, g))
        g, lab, sc = g[order], lab[order], sc[order]
        n = len(g)
        # group segment starts and 1-based rank within group
        gs = np.ones(n, dtype=bool)
        gs[1:] = g[1:] != g[:-1]
        gstart = np.flatnonzero(gs)
        glen = np.diff(np.append(gstart, n))
        rank = np.arange(n, dtype=np.int64) - np.repeat(gstart, glen) + 1
        # tie segments: same group AND same score
        ts = gs.copy()
        ts[1:] |= sc[1:] != sc[:-1]
        tstart = np.flatnonzero(ts)
        tlen = np.diff(np.append(tstart, n))
        rank_min = np.repeat(rank[tstart], tlen)
        ties = np.repeat(tlen, tlen)
        ar2 = 2 * rank_min + ties - 1  # doubled tie-averaged rank, int64
        # int64-exact per-group sums via reduceat over the group-sorted
        # layout — float-weighted bincount would silently cap exactness
        # at 2^53 for huge groups (session code-review finding)
        npos = np.add.reduceat(lab, gstart)
        nneg = glen.astype(np.int64) - npos
        sp2 = np.add.reduceat(ar2 * lab, gstart)
        keep = (npos > 0) & (nneg > 0)
        if not keep.any():
            return empty
        npos, nneg, sp2 = npos[keep], nneg[keep], sp2[keep]
        num2 = sp2 - npos * (npos + 1)
        auc = num2.astype(np.float64) / (2 * npos * nneg).astype(np.float64)
        return pa.table({
            group_col: pa.array(g[gstart][keep]),
            "npos": pa.array(npos),
            "nneg": pa.array(nneg),
            out_name: pa.array(auc),
        })

    slim = ds.select_columns([group_col, label_col, score_col])
    return grouped_by_bucket(slim, per_bucket, entity_col=group_col,
                             num_buckets=num_buckets)


def isotonic_calibration(ds, score_col: str, label_col: str):
    """Exact isotonic regression of a binary label on an INTEGER score
    grid — the calibration map behind reliability-corrected model
    scores. The classic PAVA (pool-adjacent-violators) fit, kept exact:

      1. one grouped rollup to (score, n, npos) — the only exchange;
         the distinct-score grid is the bounded domain (a price/logit
         grid), NEVER the row count — the percent_rank contract;
      2. driver-side stack PAVA entirely in int64 rationals: pools
         merge while mean_prev > mean_cur, compared by
         cross-multiplication (s_prev·w_cur > s_cur·w_prev) — no float
         enters until the fitted probability prints, so the fit is
         deterministic under any partitioning;
      3. the fitted step function re-enters Ray as a Dataset
         (score, n, npos, fitted), fitted = round(pool_s/pool_w, 6).

    Pool merging uses STRICT violation (ties stay separate pools) —
    the convention the materialized oracle replicates."""
    import ray

    from pymhealth_ray.stages.aggregate import grouped_stats

    agg = grouped_stats(ds.select_columns([score_col, label_col]),
                        [score_col], sum_cols=[label_col])
    rows = agg.take_all()
    sc = np.array([r[score_col] for r in rows], dtype=np.int64)
    n = np.array([r["n"] for r in rows], dtype=np.int64)
    s = np.array([r[f"{label_col}_sum"] for r in rows], dtype=np.int64)
    order = np.argsort(sc)
    sc, n, s = sc[order], n[order], s[order]
    # stack PAVA: (w, s, count-of-grid-points) pools
    pw, ps, pc = [], [], []
    for i in range(len(sc)):
        cw, cs, cc = int(n[i]), int(s[i]), 1
        while pw and ps[-1] * cw > cs * pw[-1]:  # mean_prev > mean_cur
            cw += pw.pop(); cs += ps.pop(); cc += pc.pop()
        pw.append(cw); ps.append(cs); pc.append(cc)
    fitted = np.repeat(np.array(ps, dtype=np.float64)
                       / np.array(pw, dtype=np.float64),
                       np.array(pc, dtype=np.int64))
    m = 1e6
    fitted = np.sign(fitted) * np.floor(np.abs(fitted) * m + 0.5) / m
    return ray.data.from_arrow(pa.table({
        score_col: pa.array(sc), "n": pa.array(n), "npos": pa.array(s),
        "fitted": pa.array(fitted)}))


def wilson_bounds(k: np.ndarray, n: np.ndarray, z: float = 1.96):
    """Wilson score interval for binomial proportions, vectorized.

    ``k`` successes of ``n`` trials (int64 arrays). Every operation is
    written in EXACTLY the SQL oracle's expression order so the driver
    gate's round-6 floats match bit-for-bit:

        p  = k / n            (double / bigint)
        c  = z·z
        lo = (p + c/(2n) − z·sqrt((p(1−p) + c/(4n)) / n)) / (1 + c/n)
        hi = the '+' twin

    Returns ``(lo, hi)`` unrounded float64 arrays. n must be > 0.
    """
    if np.any(n <= 0):
        raise ValueError("wilson_bounds needs n > 0")
    zf = np.float64(z)
    c = zf * zf
    nd = n.astype(np.float64)
    p = k.astype(np.float64) / n
    half = zf * np.sqrt((p * (1.0 - p) + c / (4.0 * nd)) / nd)
    denom = 1.0 + c / nd
    lo = (p + c / (2.0 * nd) - half) / denom
    hi = (p + c / (2.0 * nd) + half) / denom
    return lo, hi
