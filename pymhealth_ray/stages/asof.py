"""Point-in-time (backward as-of) join — zero temporal leakage.

For every fact row, attach the dimension row of the same entity with the
greatest ``dim_ts <= fact_ts`` (NULL before the first dimension row). This
generalizes the reference's home-reference join-back pattern (a per-entity
dimension value broadcast onto the stream, reference:location/features.py:27-53)
to a time-versioned dimension, with the same searchsorted idiom as the
window bounds (reference:util/windows.py:175-178) pointed backward.

Two physical plans:

- **co-partitioned sorted merge** (default): tag each side, union, ONE
  entity-bucket shuffle, and inside each bucket a vectorized per-entity
  ``searchsorted(dim_ts, fact_ts, 'right') - 1``. Scales to dimensions of
  any size; skew follows the entity bucketing.
- **broadcast** (``broadcast=True``): the dimension is materialized once,
  put in the object store via ``ray.put``, and every map_batches actor
  builds an entity→(ts, values) index in ``__init__`` (once per actor, NOT
  per batch). For small dimension tables this avoids the shuffle entirely.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from pymhealth_ray.stages.partition import (
    column_i64,
    entity_segments,
    grouped_by_bucket,
)

SIDE_COL = "__asof_side"


def _null_array(n: int, typ: pa.DataType) -> pa.Array:
    return pa.nulls(n, type=typ)


def asof_join(
    facts,
    dim,
    value_cols: List[str],
    entity_col: str = "doc_id",
    ts_col: str = "ts_ns",
    dim_ts_col: str | None = None,
    suffix: str = "_asof",
    num_buckets: int = 64,
    broadcast: bool = False,
    concurrency=(2, 8),
):
    """Backward as-of join of ``dim``'s ``value_cols`` onto ``facts``.

    ``dim`` must have ``entity_col`` and ``dim_ts_col`` (default: same name
    as ``ts_col``). Output = facts columns + ``{v}{suffix}`` per value col +
    ``{ts_col}{suffix}`` (matched dimension timestamp, NULL when no match).
    """
    dim_ts_col = dim_ts_col or ts_col

    if broadcast:
        return _asof_broadcast(facts, dim, value_cols, entity_col, ts_col, dim_ts_col, suffix, concurrency)

    fact_schema = _pa_schema(facts)
    dim_schema = _pa_schema(dim)
    fact_names = list(fact_schema.names)

    def tag_fact(batch: pa.Table) -> pa.Table:
        batch = batch.append_column(SIDE_COL, pa.array(np.ones(batch.num_rows, dtype=np.int8)))
        # strip schema metadata so both union branches carry identical schemas
        # (otherwise Ray logs a schema-dedup warning per block)
        return batch.replace_schema_metadata(None)

    def tag_dim(batch: pa.Table) -> pa.Table:
        # align to fact schema: ts under ts_col, fact-only columns null
        n = batch.num_rows
        cols = {}
        for name in fact_names:
            if name == ts_col:
                cols[name] = batch[dim_ts_col].cast(pa.int64()) if dim_ts_col != ts_col else batch[ts_col]
            elif name == entity_col:
                cols[name] = batch[entity_col]
            elif name in batch.column_names and name in value_cols:
                cols[name] = batch[name]
            else:
                cols[name] = _null_array(n, fact_schema.field(name).type)
        out = pa.table(cols)
        # dimension value columns not present in fact schema ride along
        for v in value_cols:
            if v not in fact_names:
                out = out.append_column(v, batch[v])
        out = out.append_column(SIDE_COL, pa.array(np.zeros(n, dtype=np.int8)))
        return out.replace_schema_metadata(None)

    def pad_fact(batch: pa.Table) -> pa.Table:
        # give facts the dim-only value columns (null) so the union schemas match
        for v in value_cols:
            if v not in batch.column_names:
                batch = batch.append_column(v, _null_array(batch.num_rows, dim_schema.field(v).type))
        return batch

    tagged_facts = facts.map_batches(pad_fact, batch_format="pyarrow").map_batches(tag_fact, batch_format="pyarrow")
    tagged_dim = dim.map_batches(tag_dim, batch_format="pyarrow")
    unioned = tagged_facts.union(tagged_dim)

    out_names = [f"{v}{suffix}" for v in value_cols]

    def per_bucket(tbl: pa.Table) -> pa.Table:
        side = tbl[SIDE_COL]
        if isinstance(side, pa.ChunkedArray):
            side = side.combine_chunks()
        side_np = side.to_numpy(zero_copy_only=False)
        facts_tbl = tbl.filter(pa.array(side_np == 1))
        dim_tbl = tbl.filter(pa.array(side_np == 0))

        facts_tbl, f_starts, f_n = entity_segments(facts_tbl, entity_col, ts_col)
        out_base = facts_tbl.drop_columns([SIDE_COL] + [v for v in value_cols if v not in fact_names])
        if dim_tbl.num_rows == 0 or facts_tbl.num_rows == 0:
            n = facts_tbl.num_rows
            for v, oname in zip(value_cols, [f"{v}{suffix}" for v in value_cols]):
                out_base = out_base.append_column(oname, _null_array(n, dim_schema.field(v).type))
            return out_base.append_column(f"{ts_col}{suffix}", _null_array(n, pa.int64()))
        dim_tbl, d_starts, d_n = entity_segments(dim_tbl, entity_col, ts_col)
        f_ts = column_i64(facts_tbl, ts_col)
        d_ts = column_i64(dim_tbl, ts_col)

        # entity → dim segment lookup (few distinct entities per bucket)
        d_ent = dim_tbl[entity_col]
        if isinstance(d_ent, pa.ChunkedArray):
            d_ent = d_ent.combine_chunks()
        dim_seg = {
            d_ent[d_starts[k]].as_py(): (d_starts[k], d_starts[k + 1]) for k in range(d_n)
        }
        f_ent = facts_tbl[entity_col]
        if isinstance(f_ent, pa.ChunkedArray):
            f_ent = f_ent.combine_chunks()

        match = np.full(len(f_ts), -1, dtype=np.int64)
        for k in range(f_n):
            lo, hi = f_starts[k], f_starts[k + 1]
            seg = dim_seg.get(f_ent[lo].as_py())
            if seg is None:
                continue
            dlo, dhi = seg
            pos = np.searchsorted(d_ts[dlo:dhi], f_ts[lo:hi], side="right") - 1
            found = pos >= 0
            match[lo:hi][found] = dlo + pos[found]

        found_mask = match >= 0
        take_idx = pa.array(np.where(found_mask, match, 0))
        out = out_base
        valid = pa.array(found_mask)
        for v, oname in zip(value_cols, out_names):
            col = dim_tbl[v]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            gathered = col.take(take_idx)
            out = out.append_column(oname, pc.if_else(valid, gathered, pa.nulls(len(found_mask), type=col.type)))
        matched_ts = pa.array(d_ts[np.where(found_mask, match, 0)])
        out = out.append_column(
            f"{ts_col}{suffix}",
            pc.if_else(valid, matched_ts, pa.nulls(len(found_mask), type=pa.int64())),
        )
        return out

    return grouped_by_bucket(unioned, per_bucket, entity_col, num_buckets)


class _AsOfBroadcastIndex:
    """map_batches actor: builds the entity→(sorted ts, values) index ONCE
    per actor from a broadcast object-store ref; __call__ is pure lookup."""

    def __init__(self, dim_ref, entity_col, dim_ts_col, value_cols, ts_col, suffix):
        dim_tbl: pa.Table = ray.get(dim_ref)
        self.entity_col = entity_col
        self.ts_col = ts_col
        self.suffix = suffix
        self.value_cols = value_cols
        tbl, starts, n_ent = entity_segments(dim_tbl, entity_col, dim_ts_col)
        ts = column_i64(tbl, dim_ts_col)
        vals = {}
        for v in value_cols:
            col = tbl[v]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            vals[v] = col.to_numpy(zero_copy_only=False)
        ent = tbl[entity_col]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        self.index: Dict[str, tuple] = {}
        for k in range(n_ent):
            lo, hi = starts[k], starts[k + 1]
            self.index[ent[lo].as_py()] = (ts[lo:hi], {v: vals[v][lo:hi] for v in value_cols})

    def __call__(self, batch: pa.Table) -> pa.Table:
        ent = batch[self.entity_col]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        enc = ent.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        uniq = enc.dictionary.to_pylist()
        f_ts = column_i64(batch, self.ts_col)
        n = len(f_ts)
        out_vals = {v: np.zeros(n, dtype=np.float64) for v in self.value_cols}
        out_ts = np.zeros(n, dtype=np.int64)
        found = np.zeros(n, dtype=bool)
        for code, name in enumerate(uniq):
            seg = self.index.get(name)
            if seg is None:
                continue
            rows = np.flatnonzero(codes == code)
            d_ts, d_vals = seg
            pos = np.searchsorted(d_ts, f_ts[rows], side="right") - 1
            ok = pos >= 0
            rr = rows[ok]
            found[rr] = True
            out_ts[rr] = d_ts[pos[ok]]
            for v in self.value_cols:
                out_vals[v][rr] = d_vals[v][pos[ok]]
        valid = pa.array(found)
        for v in self.value_cols:
            batch = batch.append_column(
                f"{v}{self.suffix}",
                pc.if_else(valid, pa.array(out_vals[v]), pa.nulls(n, type=pa.float64())),
            )
        batch = batch.append_column(
            f"{self.ts_col}{self.suffix}",
            pc.if_else(valid, pa.array(out_ts), pa.nulls(n, type=pa.int64())),
        )
        return batch


def _asof_broadcast(facts, dim, value_cols, entity_col, ts_col, dim_ts_col, suffix, concurrency):
    dim_tbl = _to_arrow(dim)
    dim_ref = ray.put(dim_tbl)
    return facts.map_batches(
        _AsOfBroadcastIndex,
        fn_constructor_args=(dim_ref, entity_col, dim_ts_col, value_cols, ts_col, suffix),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def _pa_schema(ds) -> pa.Schema:
    sch = ds.schema()
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for n, t in zip(sch.names, sch.types):
        if not isinstance(t, pa.DataType):
            dt = np.dtype(t)
            t = pa.string() if dt == np.dtype(object) else pa.from_numpy_dtype(dt)
        fields.append(pa.field(n, t))
    return pa.schema(fields)


def _to_arrow(ds_or_table) -> pa.Table:
    if isinstance(ds_or_table, pa.Table):
        return ds_or_table
    # small-side materialization is the point of the broadcast path
    refs = ds_or_table.to_arrow_refs()
    return pa.concat_tables([ray.get(r) for r in refs])
