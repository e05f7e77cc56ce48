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


# --- hot-key (skew-salted) equi-join ---------------------------------------


def detect_hot_keys(ds, on: str, threshold: int) -> list:
    """EXACT heavy-hitter detection: map-side ``value_counts`` partials (one
    row per distinct key per batch crosses the wire) → small groupby-sum →
    keys whose total count exceeds ``threshold``.

    The returned list is bounded by ``total_rows / threshold`` regardless of
    key cardinality, so collecting it on the driver is scale-safe.
    """
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[on]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vc = pc.value_counts(col)
        keys = vc.field("values")
        b = _stable_bucket_of(keys, 256)
        return pa.table({
            on: keys,
            "__cnt": vc.field("counts").cast(pa.int64()),
            "__kbucket": pa.array(b, type=pa.int32()),
        })

    def per_bucket(tbl: pa.Table) -> pa.Table:
        # vectorized per-bucket rollup: dictionary-encode the key, bincount
        # the partial counts, keep keys over threshold — the exchange sorts
        # only the tiny int bucket column, never the full key
        keys = tbl[on]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        enc = keys.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        cnt = tbl["__cnt"].to_numpy(zero_copy_only=False)
        totals = np.bincount(idx, weights=cnt, minlength=len(enc.dictionary))
        hot_mask = totals > threshold
        return pa.table({on: enc.dictionary.filter(pa.array(hot_mask))})

    hot = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("__kbucket")
        .map_groups(lambda t: per_bucket(t.drop_columns(["__kbucket"])), batch_format="pyarrow")
        .to_pandas()
    )
    return sorted(hot[on].tolist())


def equi_join_salted(
    left,
    right,
    on: str,
    join_type: str = "inner",
    hot_keys: list | None = None,
    hot_threshold: int = 100_000,
    num_buckets: int = 64,
    right_suffix: str = "_r",
    concurrency=(2, 8),
):
    """Skew-safe equi-join: hot keys are joined map-side against a broadcast
    of the right side's hot-key subset; everything else takes the normal
    co-partitioned ``equi_join`` exchange. Mirrors ``asof_join_salted``'s
    broadcast-of-the-hot-subset pattern, generalized from the reference's
    small-side lookup precedent (reference:location/distance.py:36-44).

    Assumptions (documented, asserted where cheap):
    - ``join_type`` is ``inner`` or ``left outer`` — the hot path joins per
      left batch, so right-outer semantics would need an extra match-bit
      exchange.
    - the right side restricted to hot keys fits in the object store as one
      broadcast table (dimension-like right). The LEFT side's hot keys may
      be arbitrarily heavy — that is the skew being solved: their rows never
      enter the all-to-all exchange, so no hot bucket exists.
    - ``hot_keys`` may be passed explicitly (e.g. known Zipf head); when
      None they are detected exactly with :func:`detect_hot_keys` on the
      left side (one cheap partial-count pass).

    NOTE each input Dataset is consumed twice (left: detection + exchange;
    right: hot-subset collection + exchange) — upstream of both sides should
    be a pruned read or an already-materialized dataset, not an expensive
    pipeline.
    """
    import ray
    import pyarrow.compute as pc

    if join_type not in ("inner", "left outer"):
        raise ValueError(f"equi_join_salted supports inner/left outer, got {join_type!r}")
    if hot_keys is None:
        hot_keys = detect_hot_keys(left, on, hot_threshold)
    if not hot_keys:
        return equi_join(left, right, on, join_type=join_type,
                         num_buckets=num_buckets, right_suffix=right_suffix)

    left_schema = _schema_of(left)
    right_schema = _schema_of(right)
    l_cols = [on] + [c for c in left_schema.names if c != on]
    hot_arr = pa.array(hot_keys, type=left_schema.field(on).type)

    def split(side_cols, keep_hot: bool):
        def fn(batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch[on], value_set=hot_arr)
            if not keep_hot:
                mask = pc.invert(mask)
            return batch.filter(mask).select(side_cols)

        return fn

    r_cols = [on] + [c for c in right_schema.names if c != on]
    right_hot_ds = right.map_batches(split(r_cols, True), batch_format="pyarrow")
    tbls = [t.select(r_cols) for t in ray.get(right_hot_ds.to_arrow_refs()) if t.num_rows]
    if tbls:
        right_hot_tbl = pa.concat_tables(tbls).combine_chunks()
    else:
        right_hot_tbl = pa.table(
            {c: pa.array([], type=right_schema.field(c).type) for c in r_cols}
        )
    hot_ref = ray.put(right_hot_tbl)

    # SINGLE-EXCHANGE salted plan: one scan of each side, one exchange.
    # Cold rows bucket by key hash (co-partitioned as in equi_join); hot
    # LEFT rows get a round-robin bucket instead — evenly spread, so no hot
    # bucket can form — and join inside their bucket against the broadcast
    # right-hot table (zero-copy plasma read per task). Hot RIGHT rows are
    # dropped from the exchange entirely: they ride the broadcast. This
    # replaces the earlier two-pipeline (hot map-join ∪ cold equi_join)
    # plan, which scanned the left twice and paid a second execution.
    l_only = [c for c in left_schema.names if c != on]
    r_only = [c for c in right_schema.names if c != on]
    out_cols = [on] + l_only + [
        (c + right_suffix if c in left_schema.names else c) for c in r_only
    ]

    def tag_left(batch: pa.Table) -> pa.Table:
        keys = batch[on]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        hot_mask = pc.is_in(keys, value_set=hot_arr).to_numpy(zero_copy_only=False)
        b = np.asarray(_stable_bucket_of(keys, num_buckets), dtype=np.int32)
        b[hot_mask] = np.arange(int(hot_mask.sum()), dtype=np.int32) % num_buckets
        batch = batch.select([on] + l_only)
        for c in r_only:
            batch = batch.append_column(c, pa.nulls(batch.num_rows, type=right_schema.field(c).type))
        batch = batch.append_column(BUCKET_COL, pa.array(b, type=pa.int32()))
        batch = batch.append_column(SIDE_COL, pa.array(np.zeros(batch.num_rows, dtype=np.int8)))
        return batch.select(sorted(batch.column_names)).replace_schema_metadata(None)

    def tag_right_cold(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.invert(pc.is_in(batch[on], value_set=hot_arr)))
        keys = batch[on]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        b = _stable_bucket_of(keys, num_buckets)
        batch = batch.select([on] + r_only)
        for c in l_only:
            batch = batch.append_column(c, pa.nulls(batch.num_rows, type=left_schema.field(c).type))
        batch = batch.append_column(BUCKET_COL, pa.array(b, type=pa.int32()))
        batch = batch.append_column(SIDE_COL, pa.array(np.ones(batch.num_rows, dtype=np.int8)))
        return batch.select(sorted(batch.column_names)).replace_schema_metadata(None)

    def per_bucket(tbl: pa.Table) -> pa.Table:
        side = tbl[SIDE_COL]
        if isinstance(side, pa.ChunkedArray):
            side = side.combine_chunks()
        s = side.to_numpy(zero_copy_only=False)
        left_tbl = tbl.filter(pa.array(s == 0)).select([on] + l_only)
        right_tbl = tbl.filter(pa.array(s == 1)).select([on] + r_only)
        hot_mask = pc.is_in(left_tbl[on], value_set=hot_arr)
        lc = left_tbl.filter(pc.invert(hot_mask))
        lh = left_tbl.filter(hot_mask)
        parts = []
        if lc.num_rows:
            parts.append(
                lc.join(right_tbl, keys=[on], join_type=join_type,
                        right_suffix=right_suffix, use_threads=False).select(out_cols)
            )
        if lh.num_rows:
            parts.append(
                lh.join(ray.get(hot_ref), keys=[on], join_type=join_type,
                        right_suffix=right_suffix, use_threads=False).select(out_cols)
            )
        if not parts:
            empty_schema = pa.schema(
                [(c, left_schema.field(c).type) for c in [on] + l_only]
                + [(c + right_suffix if c in left_schema.names else c,
                    right_schema.field(c).type) for c in r_only]
            )
            return pa.table({f.name: pa.array([], type=f.type) for f in empty_schema}).select(out_cols)
        return pa.concat_tables(parts).replace_schema_metadata(None)

    unioned = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right_cold, batch_format="pyarrow")
    )
    return unioned.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pyarrow")
