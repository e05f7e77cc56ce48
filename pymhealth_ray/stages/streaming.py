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
