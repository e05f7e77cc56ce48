"""Distributed range (interval) join: fact rows matched to every dim
interval of the same entity that contains the fact timestamp.

The reference joins point observations to containing windows only inside a
single in-memory array (reference:util/windows.py `get_indices` — window
containment over one entity's samples); this generalizes that containment
semantics to a distributed fact x interval-table join, following the same
co-partitioning story as ``stages.asof`` / ``stages.join``:

- both sides tagged with the entity's hash bucket, ONE union exchange,
  per-bucket vectorized ``pyarrow.Table.join`` on the entity followed by an
  Arrow interval-containment filter (``start <= ts < end``). The join
  multiplies |facts_e| x |intervals_e| per entity *before* the filter, so
- ``time_chunk_us`` bounds that blowup for interval-dense entities: facts
  key on (entity, ts // T), intervals are REPLICATED to every chunk they
  overlap (an interval of length L lands in at most L/T + 1 chunks), and
  the per-group join sees only the intervals that can possibly contain the
  group's timestamps. Each (fact, interval) match is emitted exactly once —
  in the fact's own chunk — so no dedup pass is needed.

Scale notes: one all-to-all exchange total; narrow columns only (callers
should prune); the chunked variant is the 100TB path whenever a single
entity can hold many live intervals (the unchunked group is O(F_e * I_e)).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pymhealth_ray.stages.partition import BUCKET_COL, _stable_bucket_of

SIDE_COL = "__rj_side"
CHUNK_COL = "__rj_chunk"


def _schema_of(ds) -> pa.Schema:
    from pymhealth_ray.stages.asof import _pa_schema

    return _pa_schema(ds)


def _i64(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.cast(pa.int64()).to_numpy(zero_copy_only=False)


def range_join(
    fact,
    dim,
    entity_col: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    join_type: str = "inner",
    num_buckets: int = 32,
    time_chunk_us: int | None = None,
    right_suffix: str = "_r",
):
    """Join ``fact`` rows to the ``dim`` intervals containing them.

    Match condition: ``fact.entity == dim.entity`` and
    ``dim.start <= fact.ts < dim.end`` (half-open, intervals may overlap
    arbitrarily). ``ts``/``start``/``end`` must be int64-castable (epoch
    microseconds or any consistent integer clock). ``join_type``: ``inner``
    or ``left outer`` (unmatched fact rows keep nulls for dim columns).
    ``time_chunk_us`` enables the chunk-replicated plan (see module doc).
    """
    if join_type not in ("inner", "left outer"):
        raise ValueError(f"range_join supports inner/left outer, got {join_type!r}")

    fact_schema = _schema_of(fact)
    dim_schema = _schema_of(dim)
    f_cols = list(fact_schema.names)
    d_cols = [c for c in dim_schema.names if c != entity_col]
    out_cols = f_cols + [
        (c + right_suffix if c in fact_schema.names else c) for c in d_cols
    ]
    join_keys = [entity_col] + ([CHUNK_COL] if time_chunk_us else [])

    def tag_fact(batch: pa.Table) -> pa.Table:
        keys = batch[entity_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        b = _stable_bucket_of(keys, num_buckets)
        batch = batch.select(f_cols)
        for c in d_cols:
            batch = batch.append_column(c, pa.nulls(batch.num_rows, type=dim_schema.field(c).type))
        if time_chunk_us:
            chunk = _i64(batch[ts_col]) // time_chunk_us
            batch = batch.append_column(CHUNK_COL, pa.array(chunk, type=pa.int64()))
        batch = batch.append_column(BUCKET_COL, pa.array(b, type=pa.int32()))
        batch = batch.append_column(SIDE_COL, pa.array(np.zeros(batch.num_rows, dtype=np.int8)))
        return batch.select(sorted(batch.column_names)).replace_schema_metadata(None)

    def tag_dim(batch: pa.Table) -> pa.Table:
        if time_chunk_us:
            # replicate each interval to every chunk it overlaps
            start = _i64(batch[start_col])
            end = _i64(batch[end_col])
            c0 = start // time_chunk_us
            c1 = np.maximum(c0, (end - 1) // time_chunk_us)  # empty intervals stay in 1 chunk
            reps = (c1 - c0 + 1).astype(np.int64)
            idx = np.repeat(np.arange(len(start), dtype=np.int64), reps)
            offs = np.arange(len(idx), dtype=np.int64) - np.repeat(
                np.concatenate(([0], np.cumsum(reps)[:-1])), reps
            )
            chunk = c0[idx] + offs
            batch = batch.take(pa.array(idx))
            batch = batch.append_column(CHUNK_COL, pa.array(chunk, type=pa.int64()))
        keys = batch[entity_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        b = _stable_bucket_of(keys, num_buckets)
        batch = batch.select([entity_col] + d_cols + ([CHUNK_COL] if time_chunk_us else []))
        for c in f_cols:
            if c != entity_col:
                batch = batch.append_column(c, pa.nulls(batch.num_rows, type=fact_schema.field(c).type))
        batch = batch.append_column(BUCKET_COL, pa.array(b, type=pa.int32()))
        batch = batch.append_column(SIDE_COL, pa.array(np.ones(batch.num_rows, dtype=np.int8)))
        return batch.select(sorted(batch.column_names)).replace_schema_metadata(None)

    FID = "__rj_fid"

    def per_bucket(tbl: pa.Table) -> pa.Table:
        side = tbl[SIDE_COL]
        if isinstance(side, pa.ChunkedArray):
            side = side.combine_chunks()
        s = side.to_numpy(zero_copy_only=False)
        fsel = f_cols + ([CHUNK_COL] if time_chunk_us else [])
        dsel = [entity_col] + d_cols + ([CHUNK_COL] if time_chunk_us else [])
        ft = tbl.filter(pa.array(s == 0)).select(fsel)
        dt = tbl.filter(pa.array(s == 1)).select(dsel)
        # group-local fact id: disambiguates duplicate (entity, ts) fact rows
        # in the left-outer keep-one-placeholder logic below
        ft = ft.append_column(FID, pa.array(np.arange(ft.num_rows, dtype=np.int64)))
        joined = ft.join(dt, keys=join_keys,
                         join_type="left outer" if join_type == "left outer" else "inner",
                         right_suffix=right_suffix, use_threads=False)
        sc = start_col + right_suffix if start_col in fact_schema.names else start_col
        ec = end_col + right_suffix if end_col in fact_schema.names else end_col
        inside = pc.fill_null(
            pc.and_(pc.less_equal(joined[sc], joined[ts_col]),
                    pc.less(joined[ts_col], joined[ec])), False)
        if join_type == "inner":
            joined = joined.filter(inside)
        else:
            # keep matching rows; for facts with no containing interval keep
            # exactly one row and null out its dim columns
            ins = inside.to_numpy(zero_copy_only=False)
            fid = _i64(joined[FID])
            order = np.argsort(fid, kind="stable")
            inv = np.empty_like(order)
            inv[order] = np.arange(len(order))
            fo, io = fid[order], ins[order]
            first = np.ones(len(fo), dtype=bool)
            first[1:] = fo[1:] != fo[:-1]
            n_f = ft.num_rows
            has_match = np.bincount(fo[io], minlength=n_f) > 0
            survive = (io | (first & ~has_match[fo]))[inv]
            joined = joined.filter(pa.array(survive))
            matched = pc.fill_null(
                pc.and_(pc.less_equal(joined[sc], joined[ts_col]),
                        pc.less(joined[ts_col], joined[ec])), False)
            if not matched.to_numpy(zero_copy_only=False).all():
                dim_out = set(joined.column_names) - set(fsel) - {FID}
                cols = {}
                for c in joined.column_names:
                    col = joined[c]
                    if c in dim_out:
                        col = pc.if_else(matched, col, pa.scalar(None, type=col.type))
                    cols[c] = col
                joined = pa.table(cols)
        drop = [c for c in (FID, CHUNK_COL, CHUNK_COL + right_suffix)
                if c in joined.column_names]
        joined = joined.drop_columns(drop)
        return joined.select(out_cols).replace_schema_metadata(None)

    unioned = fact.map_batches(tag_fact, batch_format="pyarrow").union(
        dim.map_batches(tag_dim, batch_format="pyarrow")
    )
    return unioned.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pyarrow")
