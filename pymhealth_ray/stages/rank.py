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


def partitioned_sort_rank(ds, partition_col: str, value_col: str,
                          tie_col: str, num_bins: int = 1024,
                          rank_name: str = "rnk"):
    """Exact 0-based ``row_number() OVER (PARTITION BY p ORDER BY value,
    tie) - 1`` for UNBOUNDED value domains — the range-partition plan
    (stages/shuffle.shuffle_positions topology, value ranges instead of
    hash ranges):

      1. one cheap partial-agg pass gets per-partition (min, max, n) —
         |partitions| rows, driver-bounded;
      2. map: bucket = partition-code · num_bins + equi-width bin(value)
         (buckets are contiguous value ranges within a partition, so
         global order within a partition == (bucket, within-bucket
         order)); groupby(bucket) → vectorized sort (value, tie) →
         within-bucket rank;
      3. bucket counts → driver exclusive prefix sum per partition
         (O(partitions·num_bins) state) → broadcast; rank = offset +
         within-rank.

    Equi-width bins only affect balance, never correctness; a skewed
    production distribution would sample quantile edges instead (same
    topology). ``tie_col`` must make (partition, value, tie) row-unique.
    Returns the input columns + rank + ``__n_part`` (partition size,
    for window functions like ntile that need it)."""
    import pyarrow.compute as pc
    import ray

    from pymhealth_ray.stages.aggregate import grouped_stats

    stats = grouped_stats(ds.map_batches(
        lambda b: b.select([partition_col, value_col]),
        batch_format="pyarrow"), [partition_col],
        min_cols=[value_col], max_cols=[value_col]).take_all()
    parts = sorted(str(r[partition_col]) for r in stats)
    pcode = {p: i for i, p in enumerate(parts)}
    lo = np.empty(len(parts)); hi = np.empty(len(parts))
    for r in stats:
        i = pcode[str(r[partition_col])]
        lo[i] = r[f"{value_col}_min"]
        hi[i] = r[f"{value_col}_max"]
    width = np.where(hi > lo, (hi - lo) / num_bins, 1.0)
    edges_ref = ray.put((pcode, lo, width))
    B, R = "__rkbucket", "__rkrank"

    def tag(batch: pa.Table) -> pa.Table:
        codes_map, lo_, w_ = ray.get(edges_ref)
        p = np.array([codes_map[str(x)] for x in
                      batch[partition_col].to_pylist()], dtype=np.int64)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        binned = np.clip(((v - lo_[p]) / w_[p]).astype(np.int64),
                         0, num_bins - 1)
        return batch.append_column(
            B, pa.array(p * num_bins + binned, type=pa.int64()))

    def rank_bucket(tbl: pa.Table) -> pa.Table:
        order = pc.sort_indices(tbl, sort_keys=[(value_col, "ascending"),
                                                (tie_col, "ascending")])
        tbl = tbl.take(order)
        return tbl.append_column(
            R, pa.array(np.arange(tbl.num_rows, dtype=np.int64)))

    ranked = ds.map_batches(tag, batch_format="pyarrow").groupby(
        B).map_groups(rank_bucket, batch_format="pyarrow").materialize()

    counts = ranked.groupby(B).count().take_all()
    nbuckets = len(parts) * num_bins
    per_bucket = np.zeros(nbuckets, dtype=np.int64)
    for r in counts:
        per_bucket[r[B]] = r["count()"]
    # exclusive prefix sum restarted at each partition boundary
    grid = per_bucket.reshape(len(parts), num_bins)
    n_part = grid.sum(axis=1)
    offsets = np.cumsum(grid, axis=1) - grid
    off_ref = ray.put((offsets.reshape(-1), n_part))

    def finish(batch: pa.Table) -> pa.Table:
        off, npart = ray.get(off_ref)
        b = batch[B].to_numpy(zero_copy_only=False)
        r = batch[R].to_numpy(zero_copy_only=False)
        batch = batch.drop_columns([B, R])
        batch = batch.append_column(rank_name, pa.array(off[b] + r))
        return batch.append_column(
            "__n_part", pa.array(npart[b // num_bins]))

    return ranked.map_batches(finish, batch_format="pyarrow")


def ntile(ds, partition_col: str, value_col: str, tie_col: str, k: int,
          num_bins: int = 1024, out: str = "tile"):
    """Exact SQL ``NTILE(k) OVER (PARTITION BY p ORDER BY value, tie)``:
    rank via :func:`partitioned_sort_rank`, then the SQL tile rule — with
    n = q·k + r, the first r tiles get q+1 rows, the rest q."""

    ranked = partitioned_sort_rank(ds, partition_col, value_col, tie_col,
                                   num_bins=num_bins, rank_name="__rnk")

    def tiles(batch: pa.Table) -> pa.Table:
        r = batch["__rnk"].to_numpy(zero_copy_only=False)
        n = batch["__n_part"].to_numpy(zero_copy_only=False)
        q, rem = n // k, n % k
        big_span = rem * (q + 1)
        small = np.maximum(q, 1)  # q=0: all rows land in the big tiles
        t = np.where(r < big_span, r // np.maximum(q + 1, 1),
                     rem + (r - big_span) // small)
        batch = batch.drop_columns(["__rnk", "__n_part"])
        return batch.append_column(out, pa.array(t.astype(np.int64) + 1))

    return ranked.map_batches(tiles, batch_format="pyarrow")


def ordered_prefix_sum(ds, value_col: str, order_col: str, tie_col: str,
                       num_bins: int = 1024, out: str = "cum"):
    """Distributed inclusive SCAN: ``sum(value) OVER (ORDER BY order, tie
    ROWS UNBOUNDED PRECEDING)`` — the parallel-prefix primitive behind
    concat-then-split example layout, running totals and offset
    assignment. Same range-bucket topology as
    :func:`partitioned_sort_rank` (global order == (bucket, within-bucket
    order) because buckets are contiguous ranges of ``order_col``):
    per-bucket vectorized sort + cumsum, O(bins) bucket totals to the
    driver, exclusive offsets broadcast back. Values must be int64 (exact
    associativity — floats would make the result partitioning-dependent).
    """
    import pyarrow.compute as pc
    import ray

    from pymhealth_ray.stages.aggregate import grouped_stats

    stats = grouped_stats(ds.map_batches(
        lambda b: pa.table({"one": pa.array(
            np.zeros(b.num_rows, dtype=np.int8)),
            order_col: b[order_col]}),
        batch_format="pyarrow"), ["one"],
        min_cols=[order_col], max_cols=[order_col]).take_all()
    if not stats:  # empty input: emit the schema (+ cum) with zero rows
        def empty_cum(batch: pa.Table) -> pa.Table:
            return batch.append_column(out, pa.array(
                np.zeros(batch.num_rows, dtype=np.int64)))

        return ds.map_batches(empty_cum, batch_format="pyarrow")
    lo = float(stats[0][f"{order_col}_min"])
    hi = float(stats[0][f"{order_col}_max"])
    width = (hi - lo) / num_bins if hi > lo else 1.0
    B, C = "__psbucket", "__pscum"

    def tag(batch: pa.Table) -> pa.Table:
        o = batch[order_col].to_numpy(zero_copy_only=False).astype(np.float64)
        binned = np.clip(((o - lo) / width).astype(np.int64), 0, num_bins - 1)
        return batch.append_column(B, pa.array(binned, type=pa.int64()))

    def scan_bucket(tbl: pa.Table) -> pa.Table:
        order = pc.sort_indices(tbl, sort_keys=[(order_col, "ascending"),
                                                (tie_col, "ascending")])
        tbl = tbl.take(order)
        v = tbl[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return tbl.append_column(C, pa.array(np.cumsum(v)))

    scanned = ds.map_batches(tag, batch_format="pyarrow").groupby(
        B).map_groups(scan_bucket, batch_format="pyarrow").materialize()

    totals = scanned.groupby(B).sum(value_col).take_all()
    per_bucket = np.zeros(num_bins, dtype=np.int64)
    for r in totals:
        per_bucket[r[B]] = r[f"sum({value_col})"]
    offsets = np.concatenate(([0], np.cumsum(per_bucket)[:-1]))
    off_ref = ray.put(offsets)

    def finish(batch: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        b = batch[B].to_numpy(zero_copy_only=False)
        c = batch[C].to_numpy(zero_copy_only=False)
        batch = batch.drop_columns([B, C])
        return batch.append_column(out, pa.array(off[b] + c))

    return scanned.map_batches(finish, batch_format="pyarrow")


def partitioned_prefix_sum(ds, partition_col: str, value_col: str,
                           order_col: str, tie_col: str,
                           num_bins: int = 512, out: str = "cum"):
    """Inclusive scan WITHIN each partition — ``sum(value) OVER
    (PARTITION BY p ORDER BY order, tie ROWS UNBOUNDED PRECEDING)`` — in
    ONE pass for every partition (:func:`ordered_prefix_sum` per
    partition value would pay the full execution-barrier chain per
    partition; here partitions share the range-bucket grid exactly like
    :func:`partitioned_sort_rank`). Driver state is
    O(partitions · num_bins) offsets."""
    import pyarrow.compute as pc
    import ray

    from pymhealth_ray.stages.aggregate import grouped_stats

    stats = grouped_stats(ds.map_batches(
        lambda b: b.select([partition_col, order_col]),
        batch_format="pyarrow"), [partition_col],
        min_cols=[order_col], max_cols=[order_col]).take_all()
    if not stats:
        def empty_cum(batch: pa.Table) -> pa.Table:
            return batch.append_column(out, pa.array(
                np.zeros(batch.num_rows, dtype=np.int64)))

        return ds.map_batches(empty_cum, batch_format="pyarrow")
    parts = sorted(str(r[partition_col]) for r in stats)
    pcode = {p: i for i, p in enumerate(parts)}
    lo = np.empty(len(parts)); hi = np.empty(len(parts))
    for r in stats:
        i = pcode[str(r[partition_col])]
        lo[i] = r[f"{order_col}_min"]
        hi[i] = r[f"{order_col}_max"]
    width = np.where(hi > lo, (hi - lo) / num_bins, 1.0)
    edges_ref = ray.put((pcode, lo, width))
    B, C = "__ppsbucket", "__ppscum"

    def tag(batch: pa.Table) -> pa.Table:
        codes_map, lo_, w_ = ray.get(edges_ref)
        p = np.array([codes_map[str(x)] for x in
                      batch[partition_col].to_pylist()], dtype=np.int64)
        o = batch[order_col].to_numpy(zero_copy_only=False).astype(np.float64)
        binned = np.clip(((o - lo_[p]) / w_[p]).astype(np.int64),
                         0, num_bins - 1)
        return batch.append_column(
            B, pa.array(p * num_bins + binned, type=pa.int64()))

    def scan_bucket(tbl: pa.Table) -> pa.Table:
        order = pc.sort_indices(tbl, sort_keys=[(order_col, "ascending"),
                                                (tie_col, "ascending")])
        tbl = tbl.take(order)
        v = tbl[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return tbl.append_column(C, pa.array(np.cumsum(v)))

    scanned = ds.map_batches(tag, batch_format="pyarrow").groupby(
        B).map_groups(scan_bucket, batch_format="pyarrow").materialize()

    totals = scanned.groupby(B).sum(value_col).take_all()
    nb = len(parts) * num_bins
    per_bucket = np.zeros(nb, dtype=np.int64)
    for r in totals:
        per_bucket[r[B]] = r[f"sum({value_col})"]
    grid = per_bucket.reshape(len(parts), num_bins)
    offsets = (np.cumsum(grid, axis=1) - grid).reshape(-1)
    off_ref = ray.put(offsets)

    def finish(batch: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        b = batch[B].to_numpy(zero_copy_only=False)
        c = batch[C].to_numpy(zero_copy_only=False)
        batch = batch.drop_columns([B, C])
        return batch.append_column(out, pa.array(off[b] + c))

    return scanned.map_batches(finish, batch_format="pyarrow")


I64_MIN = np.iinfo(np.int64).min


def ordered_prefix_max(ds, value_col: str, order_col: str, tie_col: str,
                       num_bins: int = 1024, out: str = "runmax"):
    """Distributed EXCLUSIVE prefix max: ``max(value) OVER (ORDER BY
    order, tie ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)`` — the
    high-watermark primitive behind late-data detection in event-time
    streaming (the watermark at a row is the max event time seen over
    all earlier ARRIVALS). Same range-bucket topology as
    :func:`ordered_prefix_sum` (buckets are contiguous ranges of
    ``order_col``, so global order == (bucket, within-bucket order));
    max is associative and commutative, so per-bucket maxima fold into
    exclusive cross-bucket offsets exactly like the sum scan. Rows with
    no preceding row (SQL NULL) carry the ``I64_MIN`` sentinel in
    ``out`` — callers must mask it, never subtract from it. Values must
    be int64."""
    import pyarrow.compute as pc
    import ray

    from pymhealth_ray.stages.aggregate import grouped_stats

    stats = grouped_stats(ds.map_batches(
        lambda b: pa.table({"one": pa.array(
            np.zeros(b.num_rows, dtype=np.int8)),
            order_col: b[order_col]}),
        batch_format="pyarrow"), ["one"],
        min_cols=[order_col], max_cols=[order_col]).take_all()
    if not stats:
        # empty input: map fns never run on zero-column empty blocks, so
        # build the typed empty result explicitly from the input schema
        pas = ds.schema().base_schema
        cols = {f.name: pa.array([], type=f.type) for f in pas}
        cols[out] = pa.array([], type=pa.int64())
        return ray.data.from_arrow(pa.table(cols))
    lo = float(stats[0][f"{order_col}_min"])
    hi = float(stats[0][f"{order_col}_max"])
    width = (hi - lo) / num_bins if hi > lo else 1.0
    B, C = "__pmbucket", "__pmexcl"

    def tag(batch: pa.Table) -> pa.Table:
        o = batch[order_col].to_numpy(zero_copy_only=False).astype(np.float64)
        binned = np.clip(((o - lo) / width).astype(np.int64), 0, num_bins - 1)
        return batch.append_column(B, pa.array(binned, type=pa.int64()))

    def scan_bucket(tbl: pa.Table) -> pa.Table:
        order = pc.sort_indices(tbl, sort_keys=[(order_col, "ascending"),
                                                (tie_col, "ascending")])
        tbl = tbl.take(order)
        v = tbl[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        excl = np.empty_like(v)
        if len(v):
            excl[0] = I64_MIN
            np.maximum.accumulate(v[:-1], out=excl[1:])
        return tbl.append_column(C, pa.array(excl))

    scanned = ds.map_batches(tag, batch_format="pyarrow").groupby(
        B).map_groups(scan_bucket, batch_format="pyarrow").materialize()

    totals = scanned.groupby(B).max(value_col).take_all()
    per_bucket = np.full(num_bins, I64_MIN, dtype=np.int64)
    for r in totals:
        per_bucket[r[B]] = r[f"max({value_col})"]
    offsets = np.empty(num_bins, dtype=np.int64)
    offsets[0] = I64_MIN
    if num_bins > 1:
        np.maximum.accumulate(per_bucket[:-1], out=offsets[1:])
    off_ref = ray.put(offsets)

    def finish(batch: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        b = batch[B].to_numpy(zero_copy_only=False)
        c = batch[C].to_numpy(zero_copy_only=False)
        batch = batch.drop_columns([B, C])
        return batch.append_column(out, pa.array(np.maximum(off[b], c)))

    return scanned.map_batches(finish, batch_format="pyarrow")
