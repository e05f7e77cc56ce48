"""Ordered multi-step funnel over an event stream — "reached view →
click → purchase, and when" per entity, the canonical product-analytics /
label-engineering query.

Semantics (earliest-chain): ``t1`` = the entity's earliest step-1 event;
``t_{k+1}`` = the earliest step-(k+1) event STRICTLY after ``t_k``;
``reached`` = number of completed steps. Strict inequality makes the
definition order-unambiguous under timestamp ties between different steps.

Plan: map-side filter to the step types only (plus one distinct-entity
marker row per block so zero-step entities still appear with reached=0) —
a slim (entity, ts:int64, step:int8) exchange, one entity-bucket shuffle,
then a fully vectorized per-bucket chain: for each step, a masked
``np.minimum.reduceat`` over the entity segments (k passes of O(rows),
no per-entity Python).

Reference lineage: the per-entity ordered-scan shape of the session /
window stages (SURVEY §2.1) applied to ordered-pattern matching; part of
the beyond-reference training-data surface (§2.10).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pymhealth_ray.stages.partition import (
    column_i64,
    entity_segments,
    grouped_by_bucket,
)


def funnel_steps(ds, steps, entity_col: str = "user_id",
                 ts_col: str = "ts_us", type_col: str = "event_type",
                 num_buckets: int = 32):
    """Per entity: ``reached`` (0..len(steps)) plus ``t1..tk`` int64
    timestamps of the earliest chain (NULL from the first unreached step).
    Every entity present in ``ds`` appears exactly once."""
    steps = list(steps)
    k = len(steps)
    step_of = {s: i for i, s in enumerate(steps)}

    def slim(batch: pa.Table) -> pa.Table:
        ent = batch[entity_col]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        typ = batch[type_col]
        if isinstance(typ, pa.ChunkedArray):
            typ = typ.combine_chunks()
        enc = typ.dictionary_encode()
        dmap = np.array([step_of.get(v, -1) for v in
                         enc.dictionary.to_pylist()], dtype=np.int8)
        step = dmap[enc.indices.to_numpy(zero_copy_only=False)]
        ts = column_i64(batch, ts_col)
        keep = step >= 0
        # marker rows: one per distinct entity in the block, so entities
        # with zero step events still get an output row (reached=0)
        uniq = ent.unique()
        cols = {
            entity_col: pa.concat_arrays([ent.filter(pa.array(keep)), uniq]),
            ts_col: pa.array(np.concatenate([ts[keep],
                                             np.zeros(len(uniq), np.int64)])),
            "__step": pa.array(np.concatenate([step[keep],
                                               np.full(len(uniq), -1, np.int8)])),
        }
        return pa.table(cols)

    slimmed = ds.map_batches(slim, batch_format="pyarrow")

    t_names = [f"t{i + 1}" for i in range(k)]

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl, starts, n_ent = entity_segments(tbl, entity_col, ts_col)
        ent = tbl[entity_col]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        if n_ent == 0:
            cols = {entity_col: ent.slice(0, 0)}
            for tn in t_names:
                cols[tn] = pa.array([], type=pa.int64())
            cols["reached"] = pa.array([], type=pa.int64())
            return pa.table(cols)
        ts = column_i64(tbl, ts_col)
        step = tbl["__step"]
        if isinstance(step, pa.ChunkedArray):
            step = step.combine_chunks()
        sv = step.to_numpy(zero_copy_only=False)
        seg_id = np.repeat(np.arange(n_ent), np.diff(starts))
        INF = np.iinfo(np.int64).max
        t_prev = np.full(n_ent, np.iinfo(np.int64).min, dtype=np.int64)
        out_ts = []
        for s in range(k):
            cand = np.where((sv == s) & (ts > t_prev[seg_id]), ts, INF)
            t_s = np.minimum.reduceat(cand, starts[:-1])
            out_ts.append(t_s)
            t_prev = t_s  # unreached (INF): no later step can beat it
        reached = np.zeros(n_ent, dtype=np.int64)
        alive = np.ones(n_ent, dtype=bool)
        cols = {entity_col: ent.take(pa.array(starts[:-1]))}
        for s, tn in zip(range(k), t_names):
            hit = alive & (out_ts[s] != INF)
            reached += hit
            alive = hit
            cols[tn] = pa.array(np.where(hit, out_ts[s], 0),
                                type=pa.int64(), mask=~hit)
        cols["reached"] = pa.array(reached)
        return pa.table(cols)

    return grouped_by_bucket(slimmed, per_bucket, entity_col=entity_col,
                             num_buckets=num_buckets)
