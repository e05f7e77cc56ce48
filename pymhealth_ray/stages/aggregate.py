"""Partial+final (combiner) aggregation — the scalable groupby pattern.

The reference's two-level aggregates (sdann/sdnni, reference:heart/hrv.py:65-108)
are the semantic precedent; physically this is the map-side combine every
100 TB groupby needs: each map_batches task collapses its batch to one row
per key (pyarrow hash aggregation), so the shuffle moves |keys|·|tasks| rows
instead of the full dataset, and a final small groupby merges the partials.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa


def grouped_stats(
    ds,
    keys: List[str],
    sum_cols: List[str] | None = None,
    min_cols: List[str] | None = None,
    max_cols: List[str] | None = None,
    count_name: str = "n",
):
    """Distributed group-by computing count + per-column sum/min/max via
    partial aggregation. Returns a Dataset with one row per key combination:
    ``keys + [{c}_sum...] + [{c}_min...] + [{c}_max...] + [count_name]``.

    Means/variances derive from (sum, sum-of-squares, count): append squared
    columns first with :func:`with_squares`.
    """
    sum_cols = sum_cols or []
    min_cols = min_cols or []
    max_cols = max_cols or []
    aggs = (
        [(c, "sum") for c in sum_cols]
        + [(c, "min") for c in min_cols]
        + [(c, "max") for c in max_cols]
        + [([], "count_all")]
    )

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(keys).aggregate(aggs)

    final_spec = (
        [(f"{c}_sum", "sum") for c in sum_cols]
        + [(f"{c}_min", "min") for c in min_cols]
        + [(f"{c}_max", "max") for c in max_cols]
        + [("count_all", "sum")]
    )

    def final(tbl: pa.Table) -> pa.Table:
        out = tbl.group_by(keys).aggregate(final_spec)
        names = []
        for f in out.column_names:
            if f == "count_all_sum":
                names.append(count_name)
            elif f.endswith("_sum_sum") or f.endswith("_min_min") or f.endswith("_max_max"):
                names.append(f[:-4])
            else:
                names.append(f)
        return out.rename_columns(names)

    # group on a bounded hash bucket of the FIRST key, not the key tuple:
    # map_groups pays a Python call per group, and per-entity aggregates
    # have corpus-cardinality keys at scale. Every row of a key tuple
    # shares key[0], so bucketing on it keeps groups intact; the arrow
    # group_by inside ``final`` does the per-key work vectorized.
    from pymhealth_ray.stages.partition import _stable_bucket_of

    def with_bucket(batch: pa.Table) -> pa.Table:
        b = _stable_bucket_of(batch[keys[0]], 256)
        return batch.append_column("__aggbucket", pa.array(b, type=pa.int32()))

    def final_bucket(tbl: pa.Table) -> pa.Table:
        return final(tbl.drop_columns(["__aggbucket"]))

    partials = ds.map_batches(partial, batch_format="pyarrow").map_batches(
        with_bucket, batch_format="pyarrow")
    return partials.groupby("__aggbucket").map_groups(final_bucket, batch_format="pyarrow")


def with_squares(ds, cols: List[str]):
    """Append {col}__sq columns so grouped_stats can derive variances."""

    def fn(batch: pa.Table) -> pa.Table:
        for c in cols:
            col = batch[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            v = col.to_numpy(zero_copy_only=False).astype(np.float64)
            batch = batch.append_column(f"{c}__sq", pa.array(v * v))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow")


def _topk_rows(tbl: pa.Table, group_cols, order_col, k, descending, tie_cols,
               rank_name=None) -> pa.Table:
    """Vectorized top-k per group within one table: composite group code →
    single lexsort → positional cutoff. No per-group Python."""
    if tbl.num_rows == 0:
        if rank_name:
            tbl = tbl.append_column(rank_name, pa.array([], type=pa.int64()))
        return tbl
    gid = np.zeros(tbl.num_rows, dtype=np.int64)
    for c in group_cols:
        col = tbl[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        enc = col.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        gid = gid * (len(enc.dictionary) + 1) + codes
    ov = tbl[order_col]
    if isinstance(ov, pa.ChunkedArray):
        ov = ov.combine_chunks()
    ov = ov.to_numpy(zero_copy_only=False)
    if descending:
        ov = -ov
    ties = []
    for c in tie_cols:
        tc = tbl[c]
        if isinstance(tc, pa.ChunkedArray):
            tc = tc.combine_chunks()
        ties.append(tc.to_numpy(zero_copy_only=False))
    idx = np.lexsort(tuple(reversed(ties)) + (ov, gid))
    gs = gid[idx]
    starts = np.ones(len(gs), dtype=bool)
    starts[1:] = gs[1:] != gs[:-1]
    start_pos = np.flatnonzero(starts)
    counts = np.diff(np.append(start_pos, len(gs)))
    pos = np.arange(len(gs)) - np.repeat(start_pos, counts)
    keep = pos < k
    out = tbl.take(pa.array(idx[keep]))
    if rank_name:
        out = out.append_column(rank_name, pa.array(pos[keep] + 1, type=pa.int64()))
    return out.replace_schema_metadata(None)


def grouped_topk(
    ds,
    group_cols: List[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tie_cols: List[str] | None = None,
    rank_name: str | None = None,
    num_buckets: int = 256,
):
    """Distributed top-k rows per group — SQL
    ``row_number() OVER (PARTITION BY group ORDER BY order_col [DESC],
    tie_cols) <= k`` semantics.

    Map-side partial: every block keeps only its own top-k per group, so the
    exchange carries at most k rows per (group, block) — the combiner
    pattern applied to order statistics. Final: bucket exchange on
    ``group_cols[0]``'s hash (every row of a group tuple shares it; bounded
    bucket count keeps map_groups calls off the per-group Python path) and
    one more vectorized top-k with rank emission. ``order_col`` must be
    numeric for ``descending=True`` (negation trick); ties must be broken
    by ``tie_cols`` for a deterministic result.
    """
    tie_cols = list(tie_cols or [])
    from pymhealth_ray.stages.partition import _stable_bucket_of

    def partial(batch: pa.Table) -> pa.Table:
        return _topk_rows(batch, group_cols, order_col, k, descending, tie_cols)

    def with_bucket(batch: pa.Table) -> pa.Table:
        b = _stable_bucket_of(batch[group_cols[0]], num_buckets)
        return batch.append_column("__aggbucket", pa.array(b, type=pa.int32()))

    def final_bucket(tbl: pa.Table) -> pa.Table:
        return _topk_rows(tbl.drop_columns(["__aggbucket"]), group_cols,
                          order_col, k, descending, tie_cols, rank_name)

    partials = ds.map_batches(partial, batch_format="pyarrow").map_batches(
        with_bucket, batch_format="pyarrow")
    return partials.groupby("__aggbucket").map_groups(final_bucket, batch_format="pyarrow")
