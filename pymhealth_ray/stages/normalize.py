"""Group-wise z-score normalization — the broadcast-statistics pattern.

Feature scaling per group (per source / language / shard) without a full
shuffle: a map-side partial pass collects exact-int ``(n, Σx, Σx²)`` per
group (one row per group per block crosses the wire), a tiny groupby-sum
lands on the driver, and the group-stats table is broadcast back into a
stateless map. Two linear scans, zero row exchange — the shape that holds
at 100 TB when the group cardinality is bounded (sources, languages);
unbounded group keys should use the entity-bucket exchange instead.

Numerics: sums are exact int64 (integer inputs), so every engine and the
SQL oracle derive the float z-score from IDENTICAL integers via the same
expression shape ``(x − Σx/n) / sqrt((n·Σx² − (Σx)²) / (n·(n−1)))`` —
no one-pass float cancellation (CLAUDE.md gotcha).

Reference lineage: std/mean feature family
(`/root/reference/src/mhealth/generic/stats.py`) lifted to grouped
normalization; SURVEY §2.3.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def group_stats_exact(ds, group_col: str, value_col: str):
    """dict group -> (n, sum, sumsq) with exact int64 sums."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = g.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        x = batch[value_col]
        if isinstance(x, pa.ChunkedArray):
            x = x.combine_chunks()
        v = x.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(enc.dictionary)
        n = np.bincount(idx, minlength=k).astype(np.int64)
        sx = np.bincount(idx, weights=v, minlength=k).astype(np.int64)
        sxx = np.bincount(idx, weights=(v * v).astype(np.float64),
                          minlength=k).astype(np.int64)
        return pa.table({group_col: enc.dictionary,
                         "n": pa.array(n), "sx": pa.array(sx),
                         "sxx": pa.array(sxx)})

    agg = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
           .groupby(group_col).sum(["n", "sx", "sxx"]))
    out = {}
    for r in agg.take_all():
        out[r[group_col]] = (int(r["sum(n)"]), int(r["sum(sx)"]),
                             int(r["sum(sxx)"]))
    return out


def zscore_by_group(ds, group_col: str, value_col: str,
                    out_name: str = "z"):
    """Append the per-group z-score of integer ``value_col`` (sample std;
    NULL for groups with n<2 or zero variance)."""
    import ray

    stats_ref = ray.put(group_stats_exact(ds, group_col, value_col))

    def norm(batch: pa.Table) -> pa.Table:
        stats = ray.get(stats_ref)
        g = batch[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = g.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        tup = [stats.get(v, (0, 0, 0)) for v in enc.dictionary.to_pylist()]
        n = np.array([t[0] for t in tup], dtype=np.int64)[idx]
        sx = np.array([t[1] for t in tup], dtype=np.int64)[idx]
        sxx = np.array([t[2] for t in tup], dtype=np.int64)[idx]
        x = batch[value_col]
        if isinstance(x, pa.ChunkedArray):
            x = x.combine_chunks()
        v = x.to_numpy(zero_copy_only=False).astype(np.int64)
        den_int = n * sxx - sx * sx
        ok = (n > 1) & (den_int > 0)
        with np.errstate(invalid="ignore", divide="ignore"):
            z = ((v.astype(np.float64) - sx.astype(np.float64) / n) /
                 np.sqrt(den_int.astype(np.float64) /
                         (n.astype(np.float64) * (n - 1))))
        out = pa.array(np.where(ok, z, 0.0), type=pa.float64(), mask=~ok)
        return batch.append_column(out_name, out)

    return ds.map_batches(norm, batch_format="pyarrow")


def bucket_by_group_quantiles(ds, group_col: str, value_col: str,
                              qs=(0.25, 0.5, 0.75),
                              out_name: str = "qbucket"):
    """Append the 1-based quantile bucket of ``value_col`` within its group
    (quartiles by default: bucket k ⇔ value ≤ k-th group quantile, else
    len(qs)+1). Thresholds come from the exact distributed
    ``grouped_quantiles`` (quantile_disc semantics) and are broadcast —
    the same two-scan zero-row-exchange shape as :func:`zscore_by_group`."""
    import ray

    from pymhealth_ray.stages.aggregate import grouped_quantiles

    qs = list(qs)
    q_names = [f"q{int(round(q * 100))}" for q in qs]
    thr_rows = grouped_quantiles(ds, [group_col], value_col, qs).take_all()
    thr = {r[group_col]: np.array([r[qn] for qn in q_names], dtype=np.float64)
           for r in thr_rows}
    thr_ref = ray.put(thr)

    def assign(batch: pa.Table) -> pa.Table:
        t = ray.get(thr_ref)
        g = batch[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = g.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        mats = np.stack([t[v] for v in enc.dictionary.to_pylist()])
        x = batch[value_col]
        if isinstance(x, pa.ChunkedArray):
            x = x.combine_chunks()
        v = x.to_numpy(zero_copy_only=False).astype(np.float64)
        row_thr = mats[idx]                      # (rows, len(qs))
        bucket = 1 + (v[:, None] > row_thr).sum(axis=1).astype(np.int64)
        return batch.append_column(out_name, pa.array(bucket))

    return ds.map_batches(assign, batch_format="pyarrow")


def mad_outliers(ds, group_col: str, value_col: str, k: float = 3.0,
                 out_name: str = "is_outlier"):
    """Robust per-group outlier flags: ``|x − median| > k·MAD`` where MAD
    is the median absolute deviation — immune to the outliers themselves,
    unlike the z-score. Two broadcast-quantile passes (median, then MAD of
    the derived deviations) through the exact distributed
    ``grouped_quantiles``; integer inputs keep every comparison exact.
    Appends ``adev`` (|x − group median|, int64) and the boolean flag."""
    import ray

    from pymhealth_ray.stages.aggregate import grouped_quantiles

    med_rows = grouped_quantiles(ds, [group_col], value_col,
                                 qs=(0.5,)).take_all()
    med = {r[group_col]: int(r["q50"]) for r in med_rows}
    med_ref = ray.put(med)

    def add_adev(batch: pa.Table) -> pa.Table:
        m = ray.get(med_ref)
        g = batch[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = g.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        meds = np.array([m[v] for v in enc.dictionary.to_pylist()],
                        dtype=np.int64)[idx]
        x = batch[value_col]
        if isinstance(x, pa.ChunkedArray):
            x = x.combine_chunks()
        v = x.to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("adev", pa.array(np.abs(v - meds)))

    with_adev = ds.map_batches(add_adev, batch_format="pyarrow")
    mad_rows = grouped_quantiles(with_adev, [group_col], "adev",
                                 qs=(0.5,)).take_all()
    mad = {r[group_col]: int(r["q50"]) for r in mad_rows}
    mad_ref = ray.put(mad)

    def flag(batch: pa.Table) -> pa.Table:
        m = ray.get(mad_ref)
        g = batch[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = g.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        mads = np.array([m[v] for v in enc.dictionary.to_pylist()],
                        dtype=np.int64)[idx]
        adev = batch["adev"]
        if isinstance(adev, pa.ChunkedArray):
            adev = adev.combine_chunks()
        a = adev.to_numpy(zero_copy_only=False)
        return batch.append_column(out_name,
                                   pa.array(a > k * mads, type=pa.bool_()))

    return with_adev.map_batches(flag, batch_format="pyarrow")


def percent_rank_by_group(ds, group_col: str, value_col: str,
                          out_name: str = "pr"):
    """Exact per-group percent_rank (SQL semantics: ``(rank−1)/(n−1)``,
    ties share the minimum rank) for DISCRETE integer values — the
    quantile-normalization transform. A value-histogram partial pass
    (one row per (group, distinct value) per block) collapses to a tiny
    per-group CDF that broadcasts; ranking is then a stateless
    searchsorted map. Zero row exchange; NULL when a group has one row."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        return batch.select([group_col, value_col]).group_by(
            [group_col, value_col]).aggregate([([], "count_all")])

    hist = (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
            .groupby([group_col, value_col]).sum("count_all"))
    cdf = {}
    for r in hist.take_all():
        cdf.setdefault(r[group_col], []).append(
            (r[value_col], r["sum(count_all)"]))
    bundle = {}
    for g, rows in cdf.items():
        rows.sort()
        vals = np.array([v for v, _ in rows], dtype=np.int64)
        cnts = np.array([c for _, c in rows], dtype=np.int64)
        below = np.concatenate(([0], np.cumsum(cnts)[:-1]))
        bundle[g] = (vals, below, int(cnts.sum()))
    ref = ray.put(bundle)

    def score(batch: pa.Table) -> pa.Table:
        bd = ray.get(ref)
        gcol = batch[group_col]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        enc = gcol.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        x = batch[value_col]
        if isinstance(x, pa.ChunkedArray):
            x = x.combine_chunks()
        v = x.to_numpy(zero_copy_only=False).astype(np.int64)
        pr = np.zeros(len(v), dtype=np.float64)
        ok = np.zeros(len(v), dtype=bool)
        for gi, gval in enumerate(enc.dictionary.to_pylist()):
            vals, below, n = bd[gval]
            sel = idx == gi
            if n > 1:
                pos = np.searchsorted(vals, v[sel])
                pr[sel] = below[pos].astype(np.float64) / (n - 1)
                ok[sel] = True
        out = pa.array(pr, type=pa.float64(), mask=~ok)
        return batch.append_column(out_name, out)

    return ds.map_batches(score, batch_format="pyarrow")


def winsorize_by_group(ds, group_col: str, value_col: str,
                       lo: float = 0.05, hi: float = 0.95,
                       out_name: str = "value_w"):
    """Append ``value_col`` clipped to its group's exact [lo, hi]
    quantiles (quantile_disc semantics) — winsorization, the standard
    tail-taming step before scale-sensitive features. Thresholds come
    from the distributed ``grouped_quantiles`` histogram combiner and are
    broadcast; the clip emits either the original value or a threshold
    value verbatim, so results are bit-exact against SQL
    ``least(greatest(x, q_lo), q_hi)``."""
    import ray

    from pymhealth_ray.stages.aggregate import grouped_quantiles

    q_names = [f"q{int(round(q * 100))}" for q in (lo, hi)]
    thr_rows = grouped_quantiles(ds, [group_col], value_col,
                                 qs=(lo, hi)).take_all()
    thr = {r[group_col]: (r[q_names[0]], r[q_names[1]]) for r in thr_rows}
    thr_ref = ray.put(thr)

    def clip(batch: pa.Table) -> pa.Table:
        t = ray.get(thr_ref)
        g = batch[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = g.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        pairs = [t[v] for v in enc.dictionary.to_pylist()]
        lo_a = np.array([p[0] for p in pairs], dtype=np.float64)[idx]
        hi_a = np.array([p[1] for p in pairs], dtype=np.float64)[idx]
        x = batch[value_col]
        if isinstance(x, pa.ChunkedArray):
            x = x.combine_chunks()
        v = x.to_numpy(zero_copy_only=False).astype(np.float64)
        return batch.append_column(
            out_name, pa.array(np.minimum(np.maximum(v, lo_a), hi_a),
                               type=pa.float64()))

    return ds.map_batches(clip, batch_format="pyarrow")
