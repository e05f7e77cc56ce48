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
