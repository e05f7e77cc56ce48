"""Incremental grouped-aggregate state — materialized-view maintenance.

The aggregate analog of the content-dedup ledger (stages/dedup.py
ledger_dedup_ingest): a persisted per-group (count, sums) table that
ingest DELTAS update in place, so the standing daily/entity rollup of a
100 TB corpus is maintained by touching only the delta and the state —
never recomputing history. Reference (an array-kernel library,
/root/reference/src/mhealth) has no persistent state; the design is the
standard hash-partitioned merge-on-write aggregate state.

Layout: ``state_dir/bucket=K/state.parquet`` (one hash bucket of the
group domain per file, atomic tmp+rename swap) plus a per-bucket
``tags.json`` listing applied delta tags — re-applying a tag is a
per-bucket NO-OP, so a retried ingest after a partial failure converges
instead of double-counting (idempotence at the same granularity as the
write).

Distributed plan: the delta collapses map-side to per-block partial rows
(batch_size=None), ONE hash exchange co-locates each group's partials
with its state bucket, and every bucket task merges + rewrites only its
own file. Exchange volume ∝ distinct groups in the delta, not delta
rows; state I/O ∝ buckets touched.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pymhealth_ray.stages.partition import (_stable_bucket_of,
                                            grouped_by_bucket)


def _sum_cols_of(sum_cols):
    return [f"{c}_sum" for c in sum_cols]


def _merge(tbl: pa.Table, group_cols, out_cols) -> pa.Table:
    agg = tbl.group_by(group_cols).aggregate(
        [(c, "sum") for c in out_cols])
    return agg.rename_columns(group_cols + out_cols)


def apply_group_sum_delta(delta_ds, state_dir: str, group_cols,
                          sum_cols, tag: str, num_buckets: int = 32):
    """Fold one delta (identified by ``tag``) into the persisted
    per-group count+sum state. Buckets that already applied ``tag``
    skip themselves. Returns the number of state rows written."""
    group_cols = list(group_cols)
    sum_cols = list(sum_cols)
    out_cols = ["n"] + _sum_cols_of(sum_cols)
    os.makedirs(state_dir, exist_ok=True)

    def partial(batch: pa.Table) -> pa.Table:
        b = batch.append_column(
            "n", pa.array(np.ones(batch.num_rows, dtype=np.int64)))
        cols = {c: b[c] for c in group_cols}
        cols["n"] = b["n"]
        for c in sum_cols:
            cols[f"{c}_sum"] = b[c].cast(pa.int64())
        return _merge(pa.table(cols), group_cols, out_cols)

    partials = delta_ds.map_batches(partial, batch_format="pyarrow",
                                    batch_size=None)

    def merge_bucket(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"rows": pa.array([], type=pa.int64())})
        k = int(_stable_bucket_of(tbl[group_cols[0]], num_buckets)[0])
        bdir = os.path.join(state_dir, f"bucket={k}")
        os.makedirs(bdir, exist_ok=True)
        tags_path = os.path.join(bdir, "tags.json")
        tags = json.load(open(tags_path)) if os.path.exists(tags_path) \
            else []
        spath = os.path.join(bdir, "state.parquet")
        if tag in tags:
            rows = pq.read_metadata(spath).num_rows \
                if os.path.exists(spath) else 0
            return pa.table({"rows": pa.array([rows], type=pa.int64())})
        merged = _merge(tbl, group_cols, out_cols)
        if os.path.exists(spath):
            merged = _merge(pa.concat_tables(
                [pq.read_table(spath), merged]), group_cols, out_cols)
        tmp = spath + ".tmp"
        pq.write_table(merged, tmp)
        os.replace(tmp, spath)
        with open(tags_path + ".tmp", "w") as f:
            json.dump(tags + [tag], f)
        os.replace(tags_path + ".tmp", tags_path)
        return pa.table({"rows": pa.array([merged.num_rows],
                                          type=pa.int64())})

    out = grouped_by_bucket(partials, merge_bucket,
                            entity_col=group_cols[0],
                            num_buckets=num_buckets).take_all()
    return int(sum(r["rows"] for r in out))


def read_group_sum_state(state_dir: str):
    """The current state as a Dataset (one row per group)."""
    import glob

    import ray

    paths = sorted(glob.glob(os.path.join(state_dir, "bucket=*",
                                          "state.parquet")))
    if not paths:
        raise FileNotFoundError(f"no aggregate state under {state_dir}")
    return ray.data.read_parquet(paths,
                                 override_num_blocks=max(len(paths), 8))
