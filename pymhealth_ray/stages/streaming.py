"""Streaming stateful scans over a SORTED entity-bucketed layout — the
north-star execution shape taken literally: each partition file streams
through ``ParquetFile.iter_batches`` inside one task, and a bounded carry
(ONE open aggregate — the boundary entity's) crosses Arrow batch
boundaries. Memory is O(batch + 1 open session) no matter how large the
partition grows, where the sort-based bucket stages
(``stages/session.py``) hold a whole bucket per task.

Contract: the layout was written by ``state/lineage.resumable_write``
with ``sort_cols=[entity, ts]`` — sort ONCE at ingest, stream forever
after. Entities never span partition files (hash-bucketed), so sessions
never span tasks and the scan is embarrassingly parallel across files.

Reference lineage: gap-threshold sessionization semantics identical to
``stages/session.py:session_stats`` (equivalence-tested + same SQL
oracle); only the physical plan differs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class _OpenSession:
    __slots__ = ("entity", "sid", "start", "last_ts", "n", "vsum")

    def __init__(self, entity, sid, start, last_ts, n, vsum):
        self.entity = entity
        self.sid = sid
        self.start = start
        self.last_ts = last_ts
        self.n = n
        self.vsum = vsum


def _scan_one_file(path: str, entity_col: str, ts_col: str,
                   value_col: str, gap: int, batch_rows: int):
    """Yield (entity, session_id, n_events, start, end, vsum) tuples for
    every completed session of one sorted partition file."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    carry: _OpenSession | None = None
    out = []
    for rb in pf.iter_batches(batch_size=batch_rows,
                              columns=[entity_col, ts_col, value_col]):
        if rb.num_rows == 0:
            continue
        tbl = pa.Table.from_batches([rb])
        ent = tbl[entity_col].combine_chunks()
        ts = tbl[ts_col].combine_chunks().to_numpy(zero_copy_only=False)
        v = tbl[value_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        codes = ent.dictionary_encode().indices.to_numpy(
            zero_copy_only=False)
        n = len(ts)
        # break BEFORE row i: new entity or gap exceeded
        brk = np.empty(n, dtype=bool)
        brk[0] = True
        if n > 1:
            brk[1:] = (codes[1:] != codes[:-1]) | (np.diff(ts) > gap)
        first_ent = ent[0].as_py()
        cont = (carry is not None and carry.entity == first_ent
                and ts[0] - carry.last_ts <= gap)
        starts = np.flatnonzero(brk)
        ends = np.concatenate((starts[1:], [n]))
        vs = np.add.reduceat(v, starts)
        ent_py = None  # lazy per-segment entity lookup
        for k, (a, b) in enumerate(zip(starts.tolist(), ends.tolist())):
            ent_py = ent[a].as_py()
            if k == 0 and cont:
                carry.last_ts = int(ts[b - 1])
                carry.n += b - a
                carry.vsum += int(vs[0])
            else:
                if carry is not None:
                    if carry.entity == ent_py:
                        sid = carry.sid + 1
                    else:
                        sid = 0
                    out.append((carry.entity, carry.sid, carry.n,
                                carry.start, carry.last_ts, carry.vsum))
                else:
                    sid = 0
                carry = _OpenSession(ent_py, sid, int(ts[a]),
                                     int(ts[b - 1]), b - a, int(vs[k]))
    if carry is not None:
        out.append((carry.entity, carry.sid, carry.n, carry.start,
                    carry.last_ts, carry.vsum))
    return out


def streaming_session_stats(layout_dir: str, *, gap: int,
                            entity_col: str = "doc_id",
                            ts_col: str = "ts_ns",
                            value_col: str = "n_tok",
                            batch_rows: int = 65536,
                            blocks: int | None = None):
    """Session summaries (entity, session_id, n_events, start, end,
    duration, value sum/mean) from a sorted bucketed layout — one task
    per partition file, bounded memory, no exchange at all."""
    import glob
    import os

    import ray

    paths = sorted(glob.glob(os.path.join(layout_dir, "part=*",
                                          "*.parquet")))
    pds = ray.data.from_items([{"path": p} for p in paths])
    if blocks or len(paths) > 1:
        pds = pds.repartition(blocks or len(paths))

    def scan(batch: pa.Table) -> pa.Table:
        rows = []
        for p in batch["path"].to_pylist():
            rows.extend(_scan_one_file(p, entity_col, ts_col, value_col,
                                       gap, batch_rows))
        ents = [r[0] for r in rows]
        nev = np.array([r[2] for r in rows], dtype=np.int64)
        start = np.array([r[3] for r in rows], dtype=np.int64)
        end = np.array([r[4] for r in rows], dtype=np.int64)
        vsum = np.array([r[5] for r in rows], dtype=np.int64)
        return pa.table({
            entity_col: pa.array(ents, type=pa.string()),
            "session_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "n_events": pa.array(nev),
            "start_ns": pa.array(start),
            "end_ns": pa.array(end),
            "duration_ns": pa.array(end - start),
            f"{value_col}_sum": pa.array(vsum),
            f"{value_col}_mean": pa.array(vsum / nev),
        })

    return pds.map_batches(scan, batch_format="pyarrow", batch_size=None)


def _lag_one_file(path: str, entity_col: str, ts_col: str, value_col: str,
                  head_fill: int, batch_rows: int):
    """Per-row lag1/delta-ts/diff1 for one sorted partition file with a
    ONE-ROW carry across Arrow batch boundaries (entity, last ts, last
    value). Heads take ``head_fill`` for diff1 (the successive_distance
    convention) and NULL for lag1/dt."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    carry = None  # (entity, ts, value)
    out = []
    for rb in pf.iter_batches(batch_size=batch_rows,
                              columns=[entity_col, ts_col, value_col]):
        if rb.num_rows == 0:
            continue
        tbl = pa.Table.from_batches([rb])
        ent = tbl[entity_col].combine_chunks()
        ts = tbl[ts_col].combine_chunks().to_numpy(zero_copy_only=False)
        v = tbl[value_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        codes = ent.dictionary_encode().indices.to_numpy(
            zero_copy_only=False)
        n = len(ts)
        lag = np.empty(n, dtype=np.int64)
        lts = np.empty(n, dtype=np.int64)
        lag[1:] = v[:-1]
        lts[1:] = ts[:-1]
        head = np.empty(n, dtype=bool)
        head[0] = True
        head[1:] = codes[1:] != codes[:-1]
        if carry is not None and ent[0].as_py() == carry[0]:
            head[0] = False
            lts[0] = carry[1]
            lag[0] = carry[2]
        out.append(pa.table({
            entity_col: tbl[entity_col],
            ts_col: tbl[ts_col],
            value_col: tbl[value_col],
            "lag1": pa.array(np.where(head, 0, lag), type=pa.int64(),
                             mask=head),
            "dt": pa.array(np.where(head, 0, ts - lts), type=pa.int64(),
                           mask=head),
            "diff1": pa.array(np.where(head, head_fill, v - lag),
                              type=pa.int64()),
        }))
        carry = (ent[n - 1].as_py(), int(ts[n - 1]), int(v[n - 1]))
    return out


def streaming_lag_features(layout_dir: str, *, entity_col: str = "doc_id",
                           ts_col: str = "ts_ns",
                           value_col: str = "n_tok", head_fill: int = 0,
                           batch_rows: int = 65536):
    """Per-entity lag/delta/successive-diff from a sorted bucketed layout
    — one task per partition file, one-row carry across batch boundaries,
    no exchange (the streaming form of ``stages/lag.lag_features``)."""
    import glob
    import os

    import ray

    paths = sorted(glob.glob(os.path.join(layout_dir, "part=*",
                                          "*.parquet")))
    pds = ray.data.from_items([{"path": p} for p in paths]).repartition(
        max(len(paths), 1))

    def scan(batch: pa.Table) -> pa.Table:
        outs = []
        for p in batch["path"].to_pylist():
            outs.extend(_lag_one_file(p, entity_col, ts_col, value_col,
                                      head_fill, batch_rows))
        return pa.concat_tables(outs)

    return pds.map_batches(scan, batch_format="pyarrow", batch_size=None)


def _asof_one_pair(lpath: str, rpath: str, entity_col: str, ts_col: str,
                   val_col: str, out_ts: str, out_val: str,
                   batch_rows: int):
    """Streaming sorted-merge as-of join of one co-bucketed partition
    pair: the left file streams batch-by-batch; right batches load only
    until their key range covers the current left batch, and the right
    BUFFER is trimmed after every left batch to (last match of the
    boundary entity + unconsumed future rows) — memory stays O(batch +
    right rows overlapping one left batch's key range)."""
    import pyarrow.parquet as pq

    lpf = pq.ParquetFile(lpath)
    r_iter = pq.ParquetFile(rpath).iter_batches(
        batch_size=batch_rows, columns=[entity_col, ts_col, val_col]) \
        if rpath is not None else iter(())
    r_exhausted = rpath is None
    r_ent: list = []
    r_ts = np.empty(0, np.int64)
    r_val = np.empty(0, np.int64)
    out_tables = []
    for rb in lpf.iter_batches(batch_size=batch_rows,
                               columns=[entity_col, ts_col]):
        if rb.num_rows == 0:
            continue
        tbl = pa.Table.from_batches([rb])
        l_ent = tbl[entity_col].combine_chunks().to_pylist()
        l_ts = tbl[ts_col].combine_chunks().to_numpy(zero_copy_only=False)
        max_key = (l_ent[-1], int(l_ts[-1]))
        # pull right batches until the buffer's tail passes the left max
        while not r_exhausted and (
                len(r_ent) == 0 or (r_ent[-1], int(r_ts[-1])) <= max_key):
            nxt = next(r_iter, None)
            if nxt is None:
                r_exhausted = True
                break
            t = pa.Table.from_batches([nxt])
            r_ent.extend(t[entity_col].combine_chunks().to_pylist())
            r_ts = np.concatenate(
                [r_ts, t[ts_col].combine_chunks().to_numpy(
                    zero_copy_only=False)])
            r_val = np.concatenate(
                [r_val, t[val_col].combine_chunks().to_numpy(
                    zero_copy_only=False).astype(np.int64)])
        # vectorized per-entity backward search over the SHARED sorted
        # entity list (codes monotone with entity order on both sides)
        from pymhealth_ray.stages.partition import segmented_searchsorted

        ents = sorted(set(r_ent) | set(l_ent))
        code = {e: i for i, e in enumerate(ents)}
        rc = np.fromiter((code[e] for e in r_ent), dtype=np.int64,
                         count=len(r_ent))
        lc = np.fromiter((code[e] for e in l_ent), dtype=np.int64,
                         count=len(l_ent))
        grid = np.arange(len(ents) + 1, dtype=np.int64)
        r_starts = np.searchsorted(rc, grid).astype(np.int64)
        l_starts = np.searchsorted(lc, grid).astype(np.int64)
        if len(r_ts):
            pos = segmented_searchsorted(r_ts, r_starts, l_ts, l_starts,
                                         side="right") - 1
            ok = pos >= r_starts[lc]
        else:
            pos = np.zeros(len(l_ts), dtype=np.int64)
            ok = np.zeros(len(l_ts), dtype=bool)
        safe = np.maximum(pos, 0)
        mts = np.where(ok, r_ts[safe] if len(r_ts) else 0, 0)
        mval = np.where(ok, r_val[safe] if len(r_val) else 0, 0)
        out_tables.append(pa.table({
            entity_col: tbl[entity_col],
            ts_col: tbl[ts_col],
            out_ts: pa.array(mts.astype(np.int64), type=pa.int64(),
                             mask=~ok),
            out_val: pa.array(mval.astype(np.int64), type=pa.int64(),
                              mask=~ok),
        }))
        # trim the right buffer: drop everything strictly before the
        # boundary entity; within it keep only the current best match +
        # unconsumed future rows
        be = lc[-1]
        keep = rc > be
        same = rc == be
        matched = same & (r_ts <= l_ts[-1])
        if matched.any():
            keep[np.flatnonzero(matched)[-1]] = True
        keep |= same & (r_ts > l_ts[-1])
        sel = np.flatnonzero(keep)
        r_ent = [r_ent[i] for i in sel.tolist()]
        r_ts = r_ts[sel]
        r_val = r_val[sel]
    return out_tables


def streaming_asof_join(left_layout: str, right_layout: str, *,
                        entity_col: str = "doc_id", ts_col: str = "ts_ns",
                        val_col: str = "n_tok", out_ts: str = "asof_ts",
                        out_val: str = "asof_val",
                        batch_rows: int = 65536):
    """Backward (inclusive) as-of join of two SORTED co-bucketed layouts
    written with the same entity hash — each task streams ONE partition
    pair with the sorted-merge cursor; no exchange, bounded memory."""
    import glob
    import os

    import ray

    def parts(root):
        return {os.path.basename(d): sorted(
            glob.glob(os.path.join(d, "*.parquet")))[0]
            for d in glob.glob(os.path.join(root, "part=*"))}

    lp, rp = parts(left_layout), parts(right_layout)
    # left partitions with NO right counterpart (a filtered right side may
    # leave buckets empty → no part dir at all) still emit every left row,
    # with NULL as-of columns — matching SQL left-join semantics
    pairs = [{"left": lp[k], "right": rp.get(k, "")} for k in sorted(lp)]
    pds = ray.data.from_items(pairs).repartition(max(len(pairs), 1))

    def scan(batch: pa.Table) -> pa.Table:
        outs = []
        for lpath, rpath in zip(batch["left"].to_pylist(),
                                batch["right"].to_pylist()):
            outs.extend(_asof_one_pair(lpath, rpath or None, entity_col,
                                       ts_col, val_col, out_ts, out_val,
                                       batch_rows))
        return pa.concat_tables(outs) if outs else pa.table({
            entity_col: pa.array([], type=pa.string()),
            ts_col: pa.array([], type=pa.int64()),
            out_ts: pa.array([], type=pa.int64()),
            out_val: pa.array([], type=pa.int64()),
        })

    return pds.map_batches(scan, batch_format="pyarrow", batch_size=None)


def _latest_one_file(path: str, entity_col: str, ts_col: str,
                     val_col: str, batch_rows: int):
    """One sorted partition file -> (entity, n_rows, last_ts, last_val)
    per entity: the file is sorted by (entity, ts), so each entity's
    LAST row is its latest version; only the boundary entity's running
    (count, last row) carries across Arrow batches — O(batch) memory."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    carry = None  # [entity(py), n, last_ts, last_val]
    ent_parts, n_parts, ts_parts, val_parts = [], [], [], []

    def emit_carry():
        ent_parts.append(pa.array([carry[0]]))
        n_parts.append(np.array([carry[1]], dtype=np.int64))
        ts_parts.append(np.array([carry[2]], dtype=np.int64))
        val_parts.append(np.array([carry[3]], dtype=np.int64))

    for rb in pf.iter_batches(batch_size=batch_rows,
                              columns=[entity_col, ts_col, val_col]):
        if rb.num_rows == 0:
            continue
        tbl = pa.Table.from_batches([rb])
        ent = tbl[entity_col].combine_chunks()
        codes = ent.dictionary_encode().indices.to_numpy(
            zero_copy_only=False)
        ts = tbl[ts_col].combine_chunks().to_numpy(zero_copy_only=False)
        val = tbl[val_col].combine_chunks().to_numpy(zero_copy_only=False)
        new = np.empty(len(codes), dtype=bool)
        new[0] = True
        new[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:], [len(codes)]]) - 1
        n = (ends - starts + 1).astype(np.int64)
        if carry is not None and carry[0] == ent[0].as_py():
            n[0] += carry[1]
        elif carry is not None:
            emit_carry()
        # all segments but the last complete in this batch — vectorized
        if len(starts) > 1:
            ent_parts.append(ent.take(pa.array(starts[:-1])))
            n_parts.append(n[:-1])
            ts_parts.append(ts[ends[:-1]].astype(np.int64))
            val_parts.append(val[ends[:-1]].astype(np.int64))
        carry = [ent[int(starts[-1])].as_py(), int(n[-1]),
                 int(ts[-1]), int(val[-1])]
    if carry is not None:
        emit_carry()
    if not ent_parts:
        return None
    return (pa.concat_arrays([a.cast(ent_parts[0].type)
                              for a in ent_parts]),
            np.concatenate(n_parts), np.concatenate(ts_parts),
            np.concatenate(val_parts))


def streaming_latest(layout_dir: str, *, entity_col: str = "doc_id",
                     ts_col: str = "ts_ns", val_col: str = "n_tok",
                     batch_rows: int = 65536):
    """Latest-version-wins compaction by STREAMING a sorted bucketed
    layout (the zero-exchange counterpart of stages/dedup.latest_by_key):
    one task per partition file, one boundary-entity carry, output one
    row per entity — (entity, n_rows, last_ts, last_val)."""
    import glob
    import os

    import ray

    files = sorted(glob.glob(os.path.join(layout_dir, "part=*",
                                          "*.parquet")))
    pds = ray.data.from_items([{"path": p} for p in files]).repartition(
        max(len(files), 1))

    def scan(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        paths = batch["path"].to_pylist()
        parts = [r for p in paths
                 if (r := _latest_one_file(p, entity_col, ts_col, val_col,
                                           batch_rows)) is not None]
        if not parts:
            # take the entity dtype from the file schema — a hardcoded
            # string here would break schema unification against blocks
            # that did produce rows (int64 layouts)
            ent_type = (pq.read_schema(paths[0]).field(entity_col).type
                        if paths else pa.string())
            return pa.table({entity_col: pa.array([], type=ent_type),
                             "n_rows": pa.array([], type=pa.int64()),
                             "last_ts": pa.array([], type=pa.int64()),
                             "last_val": pa.array([], type=pa.int64())})
        return pa.table({
            entity_col: pa.concat_arrays(
                [p[0].cast(parts[0][0].type) for p in parts]),
            "n_rows": pa.array(np.concatenate([p[1] for p in parts])),
            "last_ts": pa.array(np.concatenate([p[2] for p in parts])),
            "last_val": pa.array(np.concatenate([p[3] for p in parts])),
        })

    return pds.map_batches(scan, batch_format="pyarrow", batch_size=None)


def _rolling_one_file(path: str, entity_col: str, ts_col: str,
                      value_col: str, window: int, batch_rows: int):
    """Trailing ROWS-window sum/count for one sorted partition file with
    a bounded carry (≤ window−1 trailing values of the open entity)
    across Arrow batch boundaries. Int64-exact: each batch recomputes a
    fresh cumsum over carry+batch (no cross-batch cumsum differences)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    carry_ent = None
    carry_vals = np.zeros(0, dtype=np.int64)
    out = []
    for rb in pf.iter_batches(batch_size=batch_rows,
                              columns=[entity_col, ts_col, value_col]):
        if rb.num_rows == 0:
            continue
        tbl = pa.Table.from_batches([rb])
        ent = tbl[entity_col].combine_chunks()
        v = tbl[value_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        codes = ent.dictionary_encode().indices.to_numpy(
            zero_copy_only=False)
        n = len(v)
        joined = carry_ent is not None and ent[0].as_py() == carry_ent
        pre = carry_vals if joined else np.zeros(0, dtype=np.int64)
        arr = np.concatenate([pre, v])
        cs = np.concatenate([[0], np.cumsum(arr)])
        # segment start (GLOBAL index into arr) for every batch row
        head = np.empty(n, dtype=bool)
        head[0] = not joined
        head[1:] = codes[1:] != codes[:-1]
        g = np.arange(n, dtype=np.int64) + len(pre)
        seg_start = np.where(head, g, 0)
        seg_start[0] = 0 if joined else len(pre)  # open entity reaches back
        seg_start = np.maximum.accumulate(seg_start)
        win_start = np.maximum(g - window + 1, seg_start)
        out.append(pa.table({
            entity_col: tbl[entity_col],
            ts_col: tbl[ts_col],
            value_col: tbl[value_col],
            "wsum": pa.array(cs[g + 1] - cs[win_start], type=pa.int64()),
            "wn": pa.array(g + 1 - win_start, type=pa.int64()),
        }))
        # carry: trailing ≤ window−1 values of the batch's LAST entity
        seg_vals = arr[int(seg_start[-1]):]
        carry_ent = ent[n - 1].as_py()
        carry_vals = seg_vals[max(len(seg_vals) - (window - 1), 0):].copy() \
            if window > 1 else np.zeros(0, dtype=np.int64)
    return out


def streaming_rolling(layout_dir: str, *, entity_col: str = "doc_id",
                      ts_col: str = "ts_ns", value_col: str = "n_tok",
                      window: int = 8, batch_rows: int = 65536):
    """Per-entity trailing ROWS-window sum/count by streaming the sorted
    bucketed layout — one task per partition file, bounded (≤ window−1
    rows) carry across batch boundaries, ZERO query-time exchange: the
    streaming twin of stages/rolling.py, same shape SQL expresses as
    ``sum(v) OVER (PARTITION BY e ORDER BY ts ROWS window−1 PRECEDING)``."""
    import glob
    import os

    import ray

    paths = sorted(glob.glob(os.path.join(layout_dir, "part=*",
                                          "*.parquet")))
    pds = ray.data.from_items([{"path": p} for p in paths]).repartition(
        max(len(paths), 1))

    def scan(batch: pa.Table) -> pa.Table:
        outs = []
        for p in batch["path"].to_pylist():
            outs.extend(_rolling_one_file(p, entity_col, ts_col, value_col,
                                          window, batch_rows))
        # a task whose partition files all yield zero batches must still
        # return a typed table (mirrors the streaming_asof scan's guard)
        return pa.concat_tables(outs) if outs else pa.table({
            entity_col: pa.array([], type=pa.string()),
            ts_col: pa.array([], type=pa.int64()),
            value_col: pa.array([], type=pa.int64()),
            "wsum": pa.array([], type=pa.int64()),
            "wn": pa.array([], type=pa.int64()),
        })

    return pds.map_batches(scan, batch_format="pyarrow", batch_size=None)


def streaming_equi_join(left_layout: str, right_layout: str, *,
                        key_col: str, join_type: str = "inner",
                        right_suffix: str = "_r"):
    """SMB (sort-merge-bucket) JOIN: equi-join two layouts bucketed with
    the SAME entity hash on ``key_col`` — each task joins ONE partition
    pair locally (vectorized ``pa.Table.join``), so the join pays ZERO
    query-time exchange. The lakehouse pattern for repeated joins against
    a big fact table: bucket once at ingest, join forever for free.
    Missing right partitions (a filtered right side) behave as an empty
    right table — inner drops, left outer NULL-pads. Only inner /
    left outer are supported: pairs enumerate from LEFT part dirs, so a
    right- or full-outer join would silently drop right-only buckets."""
    import glob
    import os

    import pyarrow.parquet as pq
    import ray

    if join_type not in ("inner", "left outer"):
        raise ValueError(
            f"streaming_equi_join supports inner/left outer, got {join_type!r}")

    def parts(root):
        return {os.path.basename(d): sorted(
            glob.glob(os.path.join(d, "*.parquet")))
            for d in glob.glob(os.path.join(root, "part=*"))}

    lp, rp = parts(left_layout), parts(right_layout)
    if not rp:
        raise ValueError(
            f"right layout has no part=*/ partitions: {right_layout!r} — "
            "cannot infer the right schema to honor the join contract")
    pairs = [{"left": ";".join(lp[k]), "right": ";".join(rp.get(k, []))}
             for k in sorted(lp)]
    pds = ray.data.from_items(pairs).repartition(max(len(pairs), 1))
    # right schema for NULL-padding empty partitions
    any_r = next((v for v in rp.values() if v), None)
    r_schema = pq.read_schema(any_r[0]) if any_r else None

    def join_pair(batch: pa.Table) -> pa.Table:
        outs = []
        for lpaths, rpaths in zip(batch["left"].to_pylist(),
                                  batch["right"].to_pylist()):
            lt = pa.concat_tables([pq.read_table(p)
                                   for p in lpaths.split(";") if p])
            if rpaths:
                rt = pa.concat_tables([pq.read_table(p)
                                       for p in rpaths.split(";") if p])
            else:
                rt = r_schema.empty_table()
            outs.append(lt.join(rt, keys=[key_col], join_type=join_type,
                                right_suffix=right_suffix,
                                use_threads=False)
                        .replace_schema_metadata(None))
        return pa.concat_tables(outs, promote_options="default")

    return pds.map_batches(join_pair, batch_format="pyarrow",
                           batch_size=None)


def _interval_one_pair(lpath: str, rpath, entity_col: str, ts_col: str,
                       start_col: str, end_col: str, l_extra: list,
                       r_extra: list, batch_rows: int):
    """Streaming sorted-merge INTERVAL JOIN of one co-bucketed partition
    pair: facts (sorted by entity, ts) match every interval (sorted by
    entity, start) with start <= ts < end. The right buffer holds, per
    entity at the merge frontier, only intervals that can still match —
    after each left batch everything before the boundary entity drops,
    and within it every interval with end <= the last seen ts drops —
    so memory is O(batch + max concurrent intervals per entity), the
    documented partitioning assumption (heavily nested interval sets
    belong on the chunk-replicated stages/rangejoin plan instead)."""
    import pyarrow.parquet as pq

    lpf = pq.ParquetFile(lpath)
    r_cols = list(dict.fromkeys(
        [entity_col, start_col, end_col] + r_extra))
    r_iter = pq.ParquetFile(rpath).iter_batches(
        batch_size=batch_rows, columns=r_cols) \
        if rpath is not None else iter(())
    r_exhausted = rpath is None
    rbuf = None  # pa.Table, lazily initialized
    out_tables = []
    for rb in lpf.iter_batches(batch_size=batch_rows,
                               columns=[entity_col, ts_col] + l_extra):
        if rb.num_rows == 0:
            continue
        tbl = pa.Table.from_batches([rb])
        l_ent = tbl[entity_col].combine_chunks().to_pylist()
        l_ts = tbl[ts_col].combine_chunks().to_numpy(zero_copy_only=False)
        max_key = (l_ent[-1], int(l_ts[-1]))

        def tail_key():
            if rbuf is None or rbuf.num_rows == 0:
                return None
            return (rbuf[entity_col][rbuf.num_rows - 1].as_py(),
                    int(rbuf[start_col][rbuf.num_rows - 1].as_py()))

        while not r_exhausted and (tail_key() is None
                                   or tail_key() <= max_key):
            nxt = next(r_iter, None)
            if nxt is None:
                r_exhausted = True
                break
            t = pa.Table.from_batches([nxt])
            rbuf = t if rbuf is None else pa.concat_tables(
                [rbuf, t]).combine_chunks()
        if rbuf is not None and rbuf.num_rows:
            r_ent = rbuf[entity_col].combine_chunks().to_pylist()
            r_start = rbuf[start_col].combine_chunks().to_numpy(
                zero_copy_only=False)
            r_end = rbuf[end_col].combine_chunks().to_numpy(
                zero_copy_only=False)
            from pymhealth_ray.stages.partition import (
                segmented_searchsorted)

            ents = sorted(set(r_ent) | set(l_ent))
            code = {e: i for i, e in enumerate(ents)}
            rc = np.fromiter((code[e] for e in r_ent), dtype=np.int64,
                             count=len(r_ent))
            lc = np.fromiter((code[e] for e in l_ent), dtype=np.int64,
                             count=len(l_ent))
            grid = np.arange(len(ents) + 1, dtype=np.int64)
            r_starts = np.searchsorted(rc, grid).astype(np.int64)
            l_starts = np.searchsorted(lc, grid).astype(np.int64)
            hi = segmented_searchsorted(r_start, r_starts, l_ts, l_starts,
                                        side="right")
            lo = r_starts[lc]
            lens = hi - lo
            tot = int(lens.sum())
            if tot:
                fact = np.repeat(np.arange(len(l_ts), dtype=np.int64),
                                 lens)
                csum = np.concatenate(([0], np.cumsum(lens)))
                within = np.arange(tot, dtype=np.int64) - np.repeat(
                    csum[:-1], lens)
                rpos = np.repeat(lo, lens) + within
                ok = r_end[rpos] > l_ts[fact]
                fact, rpos = fact[ok], rpos[ok]
                if len(fact):
                    cols = {entity_col: tbl[entity_col].take(
                        pa.array(fact)),
                        ts_col: tbl[ts_col].take(pa.array(fact))}
                    for c in l_extra:
                        cols[c] = tbl[c].take(pa.array(fact))
                    for c in r_extra:
                        cols[c] = rbuf[c].take(pa.array(rpos))
                    out_tables.append(pa.table(cols))
            # trim: drop entities before the boundary; within it drop
            # intervals that ended at or before the last seen ts
            be = lc[-1]
            keep = (rc > be) | ((rc == be) & (r_end > l_ts[-1]))
            sel = np.flatnonzero(keep)
            rbuf = rbuf.take(pa.array(sel)) if len(sel) < rbuf.num_rows \
                else rbuf
    return out_tables


def streaming_interval_join(left_layout: str, right_layout: str, *,
                            entity_col: str = "entity",
                            ts_col: str = "ts_us",
                            start_col: str = "start_us",
                            end_col: str = "end_us",
                            l_extra: list | None = None,
                            r_extra: list | None = None,
                            batch_rows: int = 65536):
    """INNER interval join (start <= ts < end) of two SORTED co-bucketed
    layouts written with the same entity hash — the streaming twin of
    stages/rangejoin.range_join: each task streams ONE partition pair
    with a merge cursor and an active-interval buffer, ZERO query-time
    exchange. Left sorted by (entity, ts); right by (entity, start)."""
    import glob
    import os

    import pyarrow.parquet as pq
    import ray

    l_extra = list(l_extra or [])
    r_extra = list(r_extra or [])

    def parts(root):
        return {os.path.basename(d): sorted(
            glob.glob(os.path.join(d, "*.parquet")))[0]
            for d in glob.glob(os.path.join(root, "part=*"))}

    lp, rp = parts(left_layout), parts(right_layout)
    pairs = [{"left": lp[k], "right": rp.get(k, "")} for k in sorted(lp)]
    # typed empty fallback from the layouts' own schemas
    ls = pq.read_schema(next(iter(lp.values())))
    rs = pq.read_schema(next(iter(rp.values()))) if rp else None

    def empty():
        cols = {entity_col: pa.array([], type=ls.field(entity_col).type),
                ts_col: pa.array([], type=ls.field(ts_col).type)}
        for c in l_extra:
            cols[c] = pa.array([], type=ls.field(c).type)
        for c in r_extra:
            cols[c] = pa.array([], type=(
                rs.field(c).type if rs is not None else pa.int64()))
        return pa.table(cols)

    pds = ray.data.from_items(pairs).repartition(max(len(pairs), 1))

    def scan(batch: pa.Table) -> pa.Table:
        outs = []
        for lpath, rpath in zip(batch["left"].to_pylist(),
                                batch["right"].to_pylist()):
            outs.extend(_interval_one_pair(
                lpath, rpath or None, entity_col, ts_col, start_col,
                end_col, l_extra, r_extra, batch_rows))
        return pa.concat_tables(outs) if outs else empty()

    return pds.map_batches(scan, batch_format="pyarrow", batch_size=None)


def _candles_one_file(path: str, entity_col: str, ts_col: str,
                      val_col: str, day_us: int, batch_rows: int):
    """Per-(entity, calendar-bucket) OHLC candles for one sorted
    partition file: rows arrive in (entity, ts, tie) order, so each
    (entity, day) is a contiguous run; the only state across Arrow
    batch boundaries is the OPEN candle (7 scalars). Emits closed
    candles per batch, flushes the open one at file end."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    carry = None  # (ent, day, n, open, high, low, close)
    ents, days, ns, os_, hs, ls, cs = ([] for _ in range(7))

    def emit(e, d, n, o, h, lo, c):
        ents.append(e); days.append(d); ns.append(n)
        os_.append(o); hs.append(h); ls.append(lo); cs.append(c)

    for rb in pf.iter_batches(batch_size=batch_rows,
                              columns=[entity_col, ts_col, val_col]):
        if rb.num_rows == 0:
            continue
        tbl = pa.Table.from_batches([rb])
        ent = tbl[entity_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        ts = tbl[ts_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        v = tbl[val_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        day = ts // day_us
        n = v.size
        head = np.empty(n, dtype=bool)
        head[0] = True
        head[1:] = (ent[1:] != ent[:-1]) | (day[1:] != day[:-1])
        starts = np.flatnonzero(head)
        ends = np.append(starts[1:], n)
        seg_n = (ends - starts).astype(np.int64)
        seg_o = v[starts]
        seg_c = v[ends - 1]
        seg_h = np.maximum.reduceat(v, starts)
        seg_l = np.minimum.reduceat(v, starts)
        seg_e = ent[starts]
        seg_d = day[starts]
        k = 0
        if carry is not None:
            if seg_e[0] == carry[0] and seg_d[0] == carry[1]:
                merged = (carry[0], carry[1],
                          carry[2] + int(seg_n[0]), carry[3],
                          max(carry[4], int(seg_h[0])),
                          min(carry[5], int(seg_l[0])), int(seg_c[0]))
                if len(starts) == 1:
                    carry = merged
                    continue
                emit(*merged)
                k = 1
            else:
                emit(*carry)
        for i in range(k, len(starts) - 1):
            emit(int(seg_e[i]), int(seg_d[i]), int(seg_n[i]),
                 int(seg_o[i]), int(seg_h[i]), int(seg_l[i]),
                 int(seg_c[i]))
        i = len(starts) - 1
        if i >= k:
            carry = (int(seg_e[i]), int(seg_d[i]), int(seg_n[i]),
                     int(seg_o[i]), int(seg_h[i]), int(seg_l[i]),
                     int(seg_c[i]))
    if carry is not None:
        emit(*carry)
    if not ents:
        return None
    return pa.table({
        entity_col: pa.array(np.array(ents, dtype=np.int64)),
        "day": pa.array(np.array(days, dtype=np.int64)),
        "n": pa.array(np.array(ns, dtype=np.int64)),
        "open": pa.array(np.array(os_, dtype=np.int64)),
        "high": pa.array(np.array(hs, dtype=np.int64)),
        "low": pa.array(np.array(ls, dtype=np.int64)),
        "close": pa.array(np.array(cs, dtype=np.int64))})


def streaming_candles(layout_dir: str, *, entity_col: str = "user_id",
                      ts_col: str = "ts_us", val_col: str = "val_c",
                      day_us: int = 86_400_000_000,
                      batch_rows: int = 65536):
    """Per-(entity, day) OHLC candles by STREAMING the sorted bucketed
    layout — the zero-exchange twin of stages/aggregate.grouped_ohlc:
    one task per partition file, a single open-candle carry across
    batch boundaries, no query-time shuffle."""
    import glob
    import os

    import ray

    paths = sorted(glob.glob(os.path.join(layout_dir, "part=*",
                                          "*.parquet")))
    pds = ray.data.from_items([{"path": p} for p in paths]).repartition(
        max(len(paths), 1))

    def scan(batch: pa.Table) -> pa.Table:
        outs = [t for p in batch["path"].to_pylist()
                if (t := _candles_one_file(p, entity_col, ts_col, val_col,
                                           day_us, batch_rows)) is not None]
        return pa.concat_tables(outs) if outs else pa.table({
            entity_col: pa.array([], type=pa.int64()),
            "day": pa.array([], type=pa.int64()),
            "n": pa.array([], type=pa.int64()),
            "open": pa.array([], type=pa.int64()),
            "high": pa.array([], type=pa.int64()),
            "low": pa.array([], type=pa.int64()),
            "close": pa.array([], type=pa.int64())})

    return pds.map_batches(scan, batch_format="pyarrow", batch_size=None)


def _window_dedup_one_file(path: str, entity_col: str, type_col: str,
                           ts_col: str, keep_cols, window: int,
                           batch_rows: int):
    """Window-dedup one sorted partition file (sorted by entity, ts
    [, tiebreak]): emit rows whose previous same-(entity, type) row is
    more than ``window`` behind. Carry across Arrow batch boundaries is
    the BOUNDARY ENTITY's {type -> last ts} map — bounded by the type
    domain, not the file size."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    carry_ent = None
    carry: dict = {}
    out = []
    cols = list(dict.fromkeys([entity_col, type_col, ts_col]
                              + list(keep_cols)))
    for rb in pf.iter_batches(batch_size=batch_rows, columns=cols):
        if rb.num_rows == 0:
            continue
        tbl = pa.Table.from_batches([rb])
        ent = tbl[entity_col].combine_chunks()
        ucode = ent.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        typ = tbl[type_col].combine_chunks()
        tenc = typ.dictionary_encode()
        tcode = tenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ts = tbl[ts_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        n = len(ts)
        # stable (entity, type) grouping; ts order preserved within runs
        order = np.lexsort((np.arange(n), tcode, ucode))
        us, tss, tcs = ucode[order], ts[order], tcode[order]
        head = np.ones(n, dtype=bool)
        head[1:] = (us[1:] != us[:-1]) | (tcs[1:] != tcs[:-1])
        prev = np.empty(n, dtype=np.int64)
        prev[1:] = tss[:-1]
        prev[0] = np.iinfo(np.int64).min // 2
        keep_s = head | (tss - prev > window)
        # boundary-entity heads consult the carried {type: last_ts} map
        if carry_ent is not None and n and ent[0].as_py() == carry_ent:
            tdict = tenc.dictionary.to_pylist()
            first_u = ucode[0]
            for i in np.flatnonzero(head & (us == first_u)):
                lt = carry.get(tdict[int(tcs[i])])
                if lt is not None:
                    keep_s[i] = (int(tss[i]) - lt) > window
        keep = np.empty(n, dtype=bool)
        keep[order] = keep_s
        out.append(tbl.filter(pa.array(keep)))
        # rebuild the carry for this batch's LAST entity
        last_u = ucode[-1]
        m = ucode == last_u
        tdict = tenc.dictionary.to_pylist()
        new_carry = {} if ent[n - 1].as_py() != carry_ent else dict(carry)
        tc_l, ts_l = tcode[m], ts[m]
        o2 = np.lexsort((ts_l, tc_l))
        tc_l, ts_l = tc_l[o2], ts_l[o2]
        last_of = np.ones(len(tc_l), dtype=bool)
        last_of[:-1] = tc_l[1:] != tc_l[:-1]
        for i in np.flatnonzero(last_of):
            new_carry[tdict[int(tc_l[i])]] = int(ts_l[i])
        carry_ent = ent[n - 1].as_py()
        carry = new_carry
    return out


def streaming_window_dedup(layout_dir: str, *, entity_col: str = "user_id",
                           type_col: str = "event_type",
                           ts_col: str = "ts_us", keep_cols=(),
                           window: int = 0, batch_rows: int = 65536):
    """Streaming twin of ``stages/lag.dedup_within_window``: drop rows
    whose previous same-(entity, type) row is within ``window``, by
    scanning each sorted partition file once with a bounded
    {type -> last ts} carry — ZERO query-time exchange (10th streaming
    family member). Same lag-based semantics, same SQL oracle."""
    import glob
    import os

    import ray

    paths = sorted(glob.glob(os.path.join(layout_dir, "part=*",
                                          "*.parquet")))
    pds = ray.data.from_items([{"path": p} for p in paths]).repartition(
        max(len(paths), 1))

    def scan(batch: pa.Table) -> pa.Table:
        outs = []
        for p in batch["path"].to_pylist():
            outs.extend(_window_dedup_one_file(
                p, entity_col, type_col, ts_col, keep_cols, window,
                batch_rows))
        if not outs:
            import pyarrow.parquet as pq
            first = sorted(glob.glob(os.path.join(
                layout_dir, "part=*", "*.parquet")))
            sch = pq.read_schema(first[0]) if first else pa.schema([])
            cols = list(dict.fromkeys([entity_col, type_col, ts_col]
                                      + list(keep_cols)))
            return pa.table({c: pa.array([], type=sch.field(c).type)
                             for c in cols if sch.get_field_index(c) >= 0})
        return pa.concat_tables(outs)

    return pds.map_batches(scan, batch_format="pyarrow", batch_size=None)


def _funnel_one_file(path: str, entity_col: str, type_col: str,
                     ts_col: str, steps, batch_rows: int):
    """Earliest-chain funnel over one sorted partition file. Because the
    stream is (entity, ts)-ascending, each step's chain minimum is FINAL
    the moment it is observed — so the carry across Arrow batch
    boundaries is just the boundary entity's per-step timestamps. An
    entity is emitted when the stream moves past it."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    k = len(steps)
    carry_ent = None
    carry = [None] * k
    out = []

    def emit(e_val, st):
        reached = 0
        for v in st:
            if v is None:
                break
            reached += 1
        out.append((e_val, *st, reached))

    for rb in pf.iter_batches(batch_size=batch_rows,
                              columns=[entity_col, type_col, ts_col]):
        if rb.num_rows == 0:
            continue
        tbl = pa.Table.from_batches([rb])
        ent = tbl[entity_col].combine_chunks()
        codes = ent.dictionary_encode().indices.to_numpy(
            zero_copy_only=False)
        typ = tbl[type_col].combine_chunks()
        tenc = typ.dictionary_encode()
        tcode = tenc.indices.to_numpy(zero_copy_only=False)
        tdict = tenc.dictionary.to_pylist()
        scode = {s: i for i, s in enumerate(tdict)}
        step_codes = [scode.get(s, -1) for s in steps]
        ts = tbl[ts_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        n = len(ts)
        bounds = np.concatenate(
            [[0], np.flatnonzero(codes[1:] != codes[:-1]) + 1, [n]])
        first_ent = ent[0].as_py()
        if carry_ent is not None and first_ent != carry_ent:
            emit(carry_ent, carry)
            carry_ent, carry = None, [None] * k
        for i in range(len(bounds) - 1):
            s0, e0 = int(bounds[i]), int(bounds[i + 1])
            e_val = ent[s0].as_py()
            st = list(carry) if carry_ent == e_val else [None] * k
            seg_t = ts[s0:e0]
            seg_c = tcode[s0:e0]
            for j in range(k):
                if st[j] is not None:
                    continue
                if j > 0 and st[j - 1] is None:
                    break
                m = seg_c == step_codes[j]
                if j > 0:
                    m = m & (seg_t > st[j - 1])
                hit = np.flatnonzero(m)
                if len(hit):
                    st[j] = int(seg_t[hit].min())
            if i < len(bounds) - 2:
                emit(e_val, st)          # stream moved past this entity
                carry_ent, carry = None, [None] * k
            else:
                carry_ent, carry = e_val, st
    if carry_ent is not None:
        emit(carry_ent, carry)
    return out


def streaming_funnel(layout_dir: str, *, entity_col: str = "user_id",
                     type_col: str = "event_type", ts_col: str = "ts_us",
                     steps=("view", "click", "purchase"),
                     batch_rows: int = 65536):
    """Streaming twin of stages/funnel.funnel_steps (11th streaming
    family member): the earliest-chain funnel read straight off the
    sorted bucketed layout — one task per partition file, a per-step
    timestamp carry for the boundary entity, ZERO query-time exchange.
    Shares the exchange funnel's SQL oracle."""
    import glob
    import os

    import ray

    paths = sorted(glob.glob(os.path.join(layout_dir, "part=*",
                                          "*.parquet")))
    pds = ray.data.from_items([{"path": p} for p in paths]).repartition(
        max(len(paths), 1))
    k = len(steps)
    tnames = [f"t{j + 1}" for j in range(k)]
    import pyarrow.parquet as _pq

    ent_type = (_pq.read_schema(paths[0]).field(entity_col).type
                if paths else pa.int64())

    def scan(batch: pa.Table) -> pa.Table:
        rows = []
        for p in batch["path"].to_pylist():
            rows.extend(_funnel_one_file(p, entity_col, type_col,
                                         ts_col, steps, batch_rows))
        cols = {entity_col: pa.array([r[0] for r in rows],
                                     type=ent_type)}
        for j, tn in enumerate(tnames):
            vals = [r[1 + j] for r in rows]
            cols[tn] = pa.array(vals, type=pa.int64())
        cols["reached"] = pa.array([r[1 + k] for r in rows],
                                   type=pa.int64())
        return pa.table(cols)

    return pds.map_batches(scan, batch_format="pyarrow", batch_size=None)
