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

Plan selection is automatic by default (``broadcast="auto"``): a bounded
``limit(threshold+1).count()`` probe (early-terminating, never a full
scan) picks broadcast when the dimension fits ``broadcast_threshold``
rows — the common feature-store case of a small filtered dim against a
huge fact stream — and the co-partitioned exchange otherwise. Both plans
are value- AND dtype-identical (the broadcast lookup gathers with Arrow
``take`` from the original dim columns).
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
    broadcast: bool | str = "auto",
    broadcast_threshold: int = 1_000_000,
    concurrency=(2, 8),
):
    """Backward as-of join of ``dim``'s ``value_cols`` onto ``facts``.

    ``dim`` must have ``entity_col`` and ``dim_ts_col`` (default: same name
    as ``ts_col``). Output = facts columns + ``{v}{suffix}`` per value col +
    ``{ts_col}{suffix}`` (matched dimension timestamp, NULL when no match).

    ``broadcast``: True forces the broadcast plan, False the co-partitioned
    exchange, "auto" (default) probes the dim size with a bounded
    early-terminating count and broadcasts iff ≤ ``broadcast_threshold``
    rows. Output is identical either way.
    """
    dim_ts_col = dim_ts_col or ts_col

    if broadcast == "auto":
        broadcast = dim.limit(broadcast_threshold + 1).count() <= broadcast_threshold
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
        # keep the sorted dim table: output gathers with Arrow take, so value
        # columns keep their exact dim dtype (same as the bucketed plan)
        self.dim_cols = {}
        for v in value_cols:
            col = tbl[v]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            self.dim_cols[v] = col
        self.ts = column_i64(tbl, dim_ts_col)
        ent = tbl[entity_col]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        self.index: Dict[str, tuple] = {}
        for k in range(n_ent):
            lo, hi = starts[k], starts[k + 1]
            self.index[ent[lo].as_py()] = (lo, hi)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ent = batch[self.entity_col]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        enc = ent.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        uniq = enc.dictionary.to_pylist()
        f_ts = column_i64(batch, self.ts_col)
        n = len(f_ts)
        if not len(self.ts):  # empty dimension: all-null outputs
            for v in self.value_cols:
                batch = batch.append_column(
                    f"{v}{self.suffix}",
                    pa.nulls(n, type=self.dim_cols[v].type))
            return batch.append_column(
                f"{self.ts_col}{self.suffix}", pa.nulls(n, type=pa.int64()))
        match = np.full(n, -1, dtype=np.int64)  # global dim row per fact row
        for code, name in enumerate(uniq):
            seg = self.index.get(name)
            if seg is None:
                continue
            lo, hi = seg
            rows = np.flatnonzero(codes == code)
            pos = np.searchsorted(self.ts[lo:hi], f_ts[rows], side="right") - 1
            ok = pos >= 0
            match[rows[ok]] = lo + pos[ok]
        found = match >= 0
        take_idx = pa.array(np.where(found, match, 0))
        valid = pa.array(found)
        for v in self.value_cols:
            col = self.dim_cols[v]
            gathered = col.take(take_idx)
            batch = batch.append_column(
                f"{v}{self.suffix}",
                pc.if_else(valid, gathered, pa.nulls(n, type=col.type)),
            )
        matched_ts = pa.array(self.ts[np.where(found, match, 0)])
        batch = batch.append_column(
            f"{self.ts_col}{self.suffix}",
            pc.if_else(valid, matched_ts, pa.nulls(n, type=pa.int64())),
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
    # small-side materialization is the point of the broadcast path.
    # Empty blocks can carry an EMPTY schema (e.g. out of a groupby whose
    # bucket produced no rows) — concat would fail on the mismatch, so keep
    # only row-bearing tables.
    tables = [ray.get(r) for r in ds_or_table.to_arrow_refs()]
    nonempty = [t for t in tables if t.num_rows > 0]
    if nonempty:
        return pa.concat_tables(nonempty)
    for t in tables:
        if t.num_columns:
            return t
    return tables[0] if tables else pa.table({})


# --------------------------------------------------------------------------
# salted as-of: bounded memory when the DIMENSION side has hot entities
# --------------------------------------------------------------------------


def asof_join_salted(
    facts,
    dim,
    value_cols: List[str],
    entity_col: str = "doc_id",
    ts_col: str = "ts_ns",
    suffix: str = "_asof",
    num_buckets: int = 64,
    salt_threshold: int = 1_000_000,
    salt_span_ns: int = 3600 * 10**9,
):
    """Backward as-of join that also bounds per-task memory when the
    DIMENSION side is hot (one entity's dim rows exceed a worker).

    A hot entity's dim stream is split into time chunks; each FACT routes to
    the single chunk that must contain its backward match: the non-empty
    chunk with the greatest first-dim-ts <= fact_ts (a fact between chunks
    matches the previous chunk's LAST row, which lives in that chunk). The
    non-empty-chunk boundary lists come from a tiny pre-aggregation and are
    broadcast. Facts before the first dim row route to the first chunk and
    come back NULL. Cold entities take the plain path unchanged; results are
    identical to :func:`asof_join` (equivalence-tested).
    """
    import zlib

    from pymhealth_ray.stages.aggregate import grouped_stats
    from pymhealth_ray.stages.partition import BUCKET_COL, _stable_bucket_of
    from pymhealth_ray.stages.window import _hot_entity_stats

    dim_schema = _pa_schema(dim)
    fact_schema = _pa_schema(facts)
    fact_names = list(fact_schema.names)
    hot = _hot_entity_stats(dim, entity_col, ts_col, salt_threshold)

    # non-empty chunk boundaries per hot entity: (chunk_id, first_dim_ts)
    chunk_map: dict = {}
    if hot:
        hot_set = set(hot)

        def hot_chunks(b: pa.Table) -> pa.Table:
            ent = b[entity_col]
            if isinstance(ent, pa.ChunkedArray):
                ent = ent.combine_chunks()
            keep = np.fromiter((e in hot_set for e in ent.to_pylist()), dtype=bool, count=b.num_rows)
            b = b.filter(pa.array(keep))
            if b.num_rows == 0:
                return pa.table({entity_col: pa.array([], type=dim_schema.field(entity_col).type),
                                 "__chunk": pa.array([], type=pa.int64()),
                                 ts_col: pa.array([], type=pa.int64())})
            ent2 = b[entity_col]
            if isinstance(ent2, pa.ChunkedArray):
                ent2 = ent2.combine_chunks()
            ts = column_i64(b, ts_col)
            anchors = np.fromiter((hot[e][0] for e in ent2.to_pylist()), dtype=np.int64, count=b.num_rows)
            chunk = (ts - anchors) // salt_span_ns
            return pa.table({entity_col: ent2, "__chunk": pa.array(chunk), ts_col: pa.array(ts)})

        summary = grouped_stats(
            dim.map_batches(hot_chunks, batch_format="pyarrow"),
            [entity_col, "__chunk"], min_cols=[ts_col],
        )
        rows = sorted(
            (
                (e, int(c), int(first))
                for b in summary.iter_batches(batch_format="pyarrow")
                for e, c, first in zip(b[entity_col].to_pylist(), b["__chunk"].to_pylist(),
                                       b[f"{ts_col}_min"].to_pylist())
            ),
            key=lambda r: (str(r[0]), r[1]),
        )
        for e, c, first in rows:
            chunk_map.setdefault(e, ([], []))
            chunk_map[e][0].append(first)
            chunk_map[e][1].append(c)
        chunk_map = {e: (np.asarray(f, dtype=np.int64), np.asarray(cs, dtype=np.int64))
                     for e, (f, cs) in chunk_map.items()}
    chunk_ref = ray.put(chunk_map)

    CHUNK = "__asof_chunk"

    class Route:
        """Assigns bucket + chunk: dim rows to their own chunk, fact rows to
        the chunk holding their backward match."""

        def __init__(self, side: int):
            self.side = side
            self.map = ray.get(chunk_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            ent = batch[entity_col]
            if isinstance(ent, pa.ChunkedArray):
                ent = ent.combine_chunks()
            ts = column_i64(batch, ts_col)
            chunk = np.full(n, -1, dtype=np.int64)
            bucket = _stable_bucket_of(ent, num_buckets).astype(np.int64)
            for i, e in enumerate(ent.to_pylist()):
                cm = self.map.get(e)
                if cm is None:
                    continue
                firsts, cids = cm
                if self.side == 0:
                    pos = np.searchsorted(firsts, ts[i], side="right") - 1
                    c = int(cids[max(pos, 0)])  # dim row's own (non-empty) chunk
                else:
                    pos = np.searchsorted(firsts, ts[i], side="right") - 1
                    c = int(cids[max(pos, 0)])  # match chunk; pos<0 → NULL later
                chunk[i] = c
                bucket[i] = zlib.crc32(f"{e}#a{c}".encode()) % num_buckets
            batch = batch.append_column(CHUNK, pa.array(chunk))
            batch = batch.append_column(BUCKET_COL, pa.array(bucket.astype(np.int32)))
            return batch.append_column(SIDE_COL, pa.array(np.full(n, self.side, dtype=np.int8)))

    def pad_fact(batch: pa.Table) -> pa.Table:
        for v in value_cols:
            if v not in batch.column_names:
                batch = batch.append_column(v, pa.nulls(batch.num_rows, type=dim_schema.field(v).type))
        return batch.select(sorted(batch.column_names)).replace_schema_metadata(None)

    def shape_dim(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {}
        for name in fact_names:
            if name in (ts_col, entity_col) or name in value_cols:
                cols[name] = batch[name]
            else:
                cols[name] = pa.nulls(n, type=fact_schema.field(name).type)
        out = pa.table(cols)
        for v in value_cols:
            if v not in fact_names:
                out = out.append_column(v, batch[v])
        for extra in (CHUNK, BUCKET_COL, SIDE_COL):
            out = out.append_column(extra, batch[extra])
        return out.select(sorted(out.column_names)).replace_schema_metadata(None)

    routed_facts = facts.map_batches(Route, fn_constructor_args=(1,), batch_format="pyarrow",
                                     concurrency=(2, 8)).map_batches(pad_fact, batch_format="pyarrow")
    routed_dim = dim.map_batches(Route, fn_constructor_args=(0,), batch_format="pyarrow",
                                 concurrency=(2, 8)).map_batches(shape_dim, batch_format="pyarrow")
    unioned = routed_facts.union(routed_dim)

    out_names = [f"{v}{suffix}" for v in value_cols]

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl = tbl.drop_columns([BUCKET_COL])
        order = pc.sort_indices(
            tbl, sort_keys=[(entity_col, "ascending"), (CHUNK, "ascending"), (ts_col, "ascending")]
        )
        tbl = tbl.take(order)
        n = tbl.num_rows
        ent = tbl[entity_col]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        if n == 0:
            base = tbl.drop_columns([SIDE_COL, CHUNK] + [v for v in value_cols if v not in fact_names])
            for v, oname in zip(value_cols, out_names):
                base = base.append_column(oname, pa.nulls(0, type=dim_schema.field(v).type))
            return base.append_column(f"{ts_col}{suffix}", pa.nulls(0, type=pa.int64()))
        codes = ent.dictionary_encode().indices.to_numpy(zero_copy_only=False).astype(np.int64)
        chunks = column_i64(tbl, CHUNK)
        side = tbl[SIDE_COL]
        if isinstance(side, pa.ChunkedArray):
            side = side.combine_chunks()
        s = side.to_numpy(zero_copy_only=False)
        ts = column_i64(tbl, ts_col)
        seg_start = np.empty(n, dtype=bool)
        seg_start[0] = True
        seg_start[1:] = (codes[1:] != codes[:-1]) | (chunks[1:] != chunks[:-1])
        bounds = np.append(np.flatnonzero(seg_start), n)
        match = np.full(n, -1, dtype=np.int64)  # global dim row index per fact row
        for k in range(len(bounds) - 1):
            lo, hi = bounds[k], bounds[k + 1]
            is_dim = s[lo:hi] == 0
            dim_idx = lo + np.flatnonzero(is_dim)
            fact_idx = lo + np.flatnonzero(~is_dim)
            if len(fact_idx) == 0 or len(dim_idx) == 0:
                continue
            pos = np.searchsorted(ts[dim_idx], ts[fact_idx], side="right") - 1
            ok = pos >= 0
            match[fact_idx[ok]] = dim_idx[pos[ok]]
        fact_rows = np.flatnonzero(s == 1)
        base = tbl.take(pa.array(fact_rows)).drop_columns(
            [SIDE_COL, CHUNK] + [v for v in value_cols if v not in fact_names]
        )
        fmatch = match[fact_rows]
        found = fmatch >= 0
        take_idx = pa.array(np.where(found, fmatch, 0))
        valid = pa.array(found)
        for v, oname in zip(value_cols, out_names):
            col = tbl[v]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            gathered = col.take(take_idx)
            base = base.append_column(oname, pc.if_else(valid, gathered, pa.nulls(len(found), type=col.type)))
        mts = pa.array(ts[np.where(found, fmatch, 0)])
        base = base.append_column(
            f"{ts_col}{suffix}", pc.if_else(valid, mts, pa.nulls(len(found), type=pa.int64()))
        )
        return base

    return unioned.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pyarrow")


def asof_join_tolerance(facts, dim, value_cols, tolerance: int,
                        entity_col: str = "doc_id", ts_col: str = "ts_ns",
                        dim_ts_col: str | None = None,
                        suffix: str = "_asof", num_buckets: int = 64,
                        broadcast: bool | str = "auto"):
    """Backward as-of join with a STALENESS BOUND: matches older than
    ``tolerance`` (fact_ts − dim_ts > tolerance) are nulled — the
    point-in-time lookup every feature store wants ("the last reading,
    but only if fresh"). A stateless post-mask over :func:`asof_join`'s
    matched-timestamp column; no extra exchange."""
    joined = asof_join(facts, dim, value_cols, entity_col=entity_col,
                       ts_col=ts_col, dim_ts_col=dim_ts_col, suffix=suffix,
                       num_buckets=num_buckets, broadcast=broadcast)
    ts_m = f"{ts_col}{suffix}"
    out_cols = [f"{v}{suffix}" for v in value_cols] + [ts_m]

    def mask(batch: pa.Table) -> pa.Table:
        m = batch[ts_m]
        if isinstance(m, pa.ChunkedArray):
            m = m.combine_chunks()
        t = batch[ts_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        import pyarrow.compute as pc

        fresh = pc.and_kleene(
            m.is_valid(),
            pc.less_equal(pc.subtract(t.cast(pa.int64()),
                                      m.cast(pa.int64()).fill_null(0)),
                          tolerance))
        for c in out_cols:
            i = batch.column_names.index(c)
            col = batch[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            batch = batch.set_column(
                i, c, pc.if_else(fresh, col, pa.nulls(len(col), col.type)))
        return batch

    return joined.map_batches(mask, batch_format="pyarrow")
