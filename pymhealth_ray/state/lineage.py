"""Per-partition lineage manifests + checkpointed, resumable output.

Output layout (BASELINE.json north_star: "per-partition lineage manifests and
checkpointed partition outputs enabling resume-from-failure"):

    out_dir/
      part=<bucket>/data.parquet      (atomic: tmp file + os.replace)
      _manifests/bucket=<bucket>.json (written AFTER the data file)

A bucket is done iff its manifest exists and records the same params hash.
On resume, rows whose bucket is already done are filtered out BEFORE the
shuffle, so finished partitions cost nothing. Manifests record row count,
byte size, entity range and the parameter hash — the lineage needed to audit
or invalidate a partition.
"""

from __future__ import annotations

import hashlib
import json
import os
import pathlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pymhealth_ray.stages.partition import BUCKET_COL, with_entity_bucket


def params_hash(params: dict | None) -> str:
    blob = json.dumps(params or {}, sort_keys=True, default=str)
    return hashlib.sha1(blob.encode()).hexdigest()[:12]


def read_manifests(out_dir: str) -> dict:
    """bucket → manifest dict for every completed partition."""
    mdir = pathlib.Path(out_dir) / "_manifests"
    out = {}
    if not mdir.is_dir():
        return out
    for f in mdir.glob("bucket=*.json"):
        try:
            m = json.loads(f.read_text())
            out[int(m["bucket"])] = m
        except (ValueError, KeyError):
            continue
    return out


def resumable_write(
    ds,
    out_dir: str,
    entity_col: str = "doc_id",
    num_buckets: int = 64,
    params: dict | None = None,
    fail_buckets: set | None = None,
    bucket_col: str | None = None,
    sort_cols: list | None = None,
):
    """Write ``ds`` partitioned by entity bucket with per-partition manifests;
    skips buckets whose manifest already matches. Returns the manifest list
    (one dict per bucket written or previously done).

    ``bucket_col`` switches from hash-of-entity partitioning to IDENTITY
    partitioning on an existing small-int column (e.g. an IVF centroid id):
    ``part=<value>`` directories, the column itself kept in the data files so
    readers can prune without recomputing the assignment.

    ``fail_buckets`` injects failures (tests only): the writer raises before
    writing those buckets' manifests.
    """
    phash = params_hash(params)
    done = {b: m for b, m in read_manifests(out_dir).items() if m.get("params_hash") == phash}
    out_path = pathlib.Path(out_dir)
    (out_path / "_manifests").mkdir(parents=True, exist_ok=True)

    if bucket_col is not None:
        def add_identity_bucket(batch: pa.Table) -> pa.Table:
            return batch.append_column(BUCKET_COL, batch[bucket_col].cast(pa.int32()))

        bucketed = ds.map_batches(add_identity_bucket, batch_format="pyarrow")
    else:
        bucketed = with_entity_bucket(ds, entity_col, num_buckets)
    if done:
        done_arr = np.array(sorted(done), dtype=np.int32)

        def drop_done(batch: pa.Table) -> pa.Table:
            b = batch[BUCKET_COL]
            if isinstance(b, pa.ChunkedArray):
                b = b.combine_chunks()
            keep = ~np.isin(b.to_numpy(zero_copy_only=False), done_arr)
            return batch.filter(pa.array(keep))

        bucketed = bucketed.map_batches(drop_done, batch_format="pyarrow")

    fail = fail_buckets or set()

    def write_bucket(tbl: pa.Table) -> pa.Table:
        bucket = int(tbl[BUCKET_COL][0].as_py())
        tbl = tbl.drop_columns([BUCKET_COL])
        if sort_cols:
            # sort ONCE at ingest so every later job streams the partition
            # in (entity, ts) order without re-sorting (include sort_cols in
            # ``params`` so the manifest cache key reflects the layout)
            import pyarrow.compute as pc

            tbl = tbl.take(pc.sort_indices(
                tbl, sort_keys=[(c, "ascending") for c in sort_cols]))
        if bucket in fail:
            raise RuntimeError(f"injected failure for bucket {bucket}")
        pdir = out_path / f"part={bucket}"
        pdir.mkdir(parents=True, exist_ok=True)
        tmp = pdir / ".data.parquet.tmp"
        pq.write_table(tbl, tmp)
        final = pdir / "data.parquet"
        os.replace(tmp, final)
        ent = tbl[entity_col]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        manifest = {
            "bucket": bucket,
            "rows": tbl.num_rows,
            "bytes": final.stat().st_size,
            "entity_min": min(ent.to_pylist()) if tbl.num_rows else None,
            "entity_max": max(ent.to_pylist()) if tbl.num_rows else None,
            "params_hash": phash,
        }
        mtmp = out_path / "_manifests" / f".bucket={bucket}.tmp"
        mtmp.write_text(json.dumps(manifest))
        os.replace(mtmp, out_path / "_manifests" / f"bucket={bucket}.json")
        return pa.table({"bucket": pa.array([bucket], type=pa.int64()), "rows": pa.array([tbl.num_rows], type=pa.int64())})

    result = bucketed.groupby(BUCKET_COL).map_groups(write_bucket, batch_format="pyarrow")
    result.materialize()  # drive the write; per-bucket side effects are atomic
    return read_manifests(out_dir)


def incremental_files(input_dir: str, state_dir: str,
                      pattern: str = "*.parquet") -> list:
    """INPUT-side delta tracking: the files under ``input_dir`` matching
    ``pattern`` that have not yet been recorded as ingested in
    ``state_dir`` — the complement of :func:`resumable_write`'s
    output-side manifests. A 100 TB corpus lands as part files over days;
    each run processes only the new ones. Identity is (path, size,
    mtime_ns), so an overwritten file re-ingests."""
    sdir = pathlib.Path(state_dir)
    seen = set()
    ledger = sdir / "ingested.jsonl"
    if ledger.exists():
        for line in ledger.read_text().splitlines():
            try:
                m = json.loads(line)
                seen.add((m["path"], m["size"], m["mtime_ns"]))
            except (ValueError, KeyError):
                continue
    out = []
    for f in sorted(pathlib.Path(input_dir).glob(pattern)):
        st = f.stat()
        key = (str(f), st.st_size, st.st_mtime_ns)
        if key not in seen:
            out.append(key)
    return out


def mark_ingested(state_dir: str, file_keys: list) -> None:
    """Append the given (path, size, mtime_ns) keys to the ingest ledger
    (atomic append-rename, so a crash mid-mark re-ingests rather than
    skips — at-least-once, matching the idempotent bucketed sink)."""
    sdir = pathlib.Path(state_dir)
    sdir.mkdir(parents=True, exist_ok=True)
    ledger = sdir / "ingested.jsonl"
    lines = "".join(
        json.dumps({"path": p, "size": s, "mtime_ns": m}) + "\n"
        for p, s, m in file_keys)
    tmp = sdir / "ingested.jsonl.tmp"
    tmp.write_text((ledger.read_text() if ledger.exists() else "") + lines)
    tmp.replace(ledger)


def ingest_delta(input_dir: str, state_dir: str, process,
                 pattern: str = "*.parquet"):
    """Run ``process(list_of_new_paths) -> result`` over the unprocessed
    input files and mark them ingested on success. Returns (result,
    n_new_files); result is None when there is nothing new."""
    new = incremental_files(input_dir, state_dir, pattern)
    if not new:
        return None, 0
    result = process([p for p, _, _ in new])
    mark_ingested(state_dir, new)
    return result, len(new)
