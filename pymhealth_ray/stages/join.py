"""General equi-join for large-large tables.

The reference has only broadcast small-side lookups
(reference:location/distance.py:36-44); the engine completes the join story:

- small side → broadcast (``stages.asof``-style ray.put lookup, or the
  annotate pattern in ``pipelines.queries.q_orders_segment_join``);
- large-large → THIS: hash-bucket both sides on the key (one exchange per
  side, same bucket function → co-partitioned), then a vectorized Arrow
  hash join inside each bucket. Skewed keys follow the same story as
  entities: many keys per bucket amortize, pathological single keys would
  need broadcast-of-the-hot-subset (documented, not needed for the bench
  keys).
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa

from pymhealth_ray.stages.partition import BUCKET_COL, _stable_bucket_of

SIDE_COL = "__join_side"


def equi_join(
    left,
    right,
    on: List[str] | str,
    join_type: str = "inner",
    num_buckets: int = 64,
    left_suffix: str = "",
    right_suffix: str = "_r",
):
    """Join two Datasets on equal key columns.

    Both sides are tagged and unioned, hash-partitioned ONCE on the key,
    and joined per bucket with ``pyarrow.Table.join`` (vectorized hash
    join). Non-key column name collisions on the right get
    ``right_suffix``. ``join_type``: inner / left outer / right outer /
    full outer (pyarrow semantics).
    """
    on = [on] if isinstance(on, str) else list(on)

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            b = _stable_bucket_of(batch[on[0]], num_buckets)
            batch = batch.append_column(BUCKET_COL, pa.array(b, type=pa.int32()))
            return batch.append_column(SIDE_COL, pa.array(np.full(batch.num_rows, side, dtype=np.int8)))

        return fn

    # union with differing schemas: pad each side with the other's columns
    import pyarrow.types as pat

    left_schema = _schema_of(left)
    right_schema = _schema_of(right)
    left_names = set(left_schema.names)
    right_names = set(right_schema.names)

    def pad(to_names, other_schema):
        def fn(batch: pa.Table) -> pa.Table:
            for name in other_schema.names:
                if name not in batch.column_names:
                    batch = batch.append_column(name, pa.nulls(batch.num_rows, type=other_schema.field(name).type))
            return batch.select(sorted(batch.column_names)).replace_schema_metadata(None)

        return fn

    lt = left.map_batches(tag(0), batch_format="pyarrow").map_batches(pad(left_names, right_schema), batch_format="pyarrow")
    rt = right.map_batches(tag(1), batch_format="pyarrow").map_batches(pad(right_names, left_schema), batch_format="pyarrow")
    unioned = lt.union(rt)

    l_only = [c for c in left_schema.names if c not in on]
    r_only = [c for c in right_schema.names if c not in on]

    def per_bucket(tbl: pa.Table) -> pa.Table:
        side = tbl[SIDE_COL]
        if isinstance(side, pa.ChunkedArray):
            side = side.combine_chunks()
        s = side.to_numpy(zero_copy_only=False)
        lt_tbl = tbl.filter(pa.array(s == 0)).select(on + l_only)
        rt_tbl = tbl.filter(pa.array(s == 1)).select(on + r_only)
        joined = lt_tbl.join(
            rt_tbl, keys=on, join_type=join_type, right_suffix=right_suffix, use_threads=False
        )
        return joined.replace_schema_metadata(None)

    return unioned.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pyarrow")


def _schema_of(ds) -> pa.Schema:
    from pymhealth_ray.stages.asof import _pa_schema

    return _pa_schema(ds)
