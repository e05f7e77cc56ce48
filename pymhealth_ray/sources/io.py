"""Parquet read helpers: column pruning + explicit read parallelism.

``read_table`` always passes ``columns=`` (prune at the read — never load
columns a 2-column transform won't touch) and sizes ``override_num_blocks``
to the cluster so downstream shuffles get parallel input even when the
source is a single small file. At 100 TB the file count dominates and the
override becomes unnecessary; locally it is the difference between a
1-task sort and a 2×CPU-way sort.
"""

from __future__ import annotations

import pyarrow as pa
import ray


def default_blocks(min_blocks: int = 8, per_cpu: int = 2, cap: int = 256) -> int:
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(min_blocks, min(cap, per_cpu * cpus))


def _strip_meta(batch):
    # drop pandas schema metadata so downstream table reconstructions keep
    # byte-identical schemas (avoids Ray's per-block schema-dedup warnings)
    return batch.replace_schema_metadata(None)


def read_table(path: str, columns=None, blocks: int | None = None):
    ds = ray.data.read_parquet(
        path,
        columns=columns,
        override_num_blocks=blocks or default_blocks(),
    )
    return ds.map_batches(_strip_meta, batch_format="pyarrow")


def read_jsonl(path: str, columns=None, blocks: int | None = None):
    """Newline-delimited JSON source (the raw-crawl interchange format).

    Ray's JSON datasource has no reader-side projection, so pruning
    happens in the first map (still before any exchange). At 100 TB
    prefer parquet; this reader exists so pipelines can ingest the
    jsonl drops that upstream crawlers produce without a conversion job.
    """
    ds = ray.data.read_json(
        path,
        override_num_blocks=blocks or default_blocks(),
    )

    def prune(batch):
        batch = batch.replace_schema_metadata(None)
        if columns is not None:
            batch = batch.select(columns)
        return batch

    return ds.map_batches(prune, batch_format="pyarrow")


def read_csv(path: str, columns=None, blocks: int | None = None):
    """CSV source (ray.data.read_csv). Like the jsonl reader, CSV has no
    reader-side projection, so pruning happens in the first map — still
    before any exchange. Prefer parquet at 100 TB; this exists so upstream
    CSV drops ingest without a conversion job."""
    ds = ray.data.read_csv(
        path,
        override_num_blocks=blocks or default_blocks(),
    )

    def prune(batch):
        batch = batch.replace_schema_metadata(None)
        if columns is not None:
            batch = batch.select(columns)
        return batch

    return ds.map_batches(prune, batch_format="pyarrow")


def write_partitioned(ds, out_dir: str, partition_col: str):
    """Hive-style partitioned parquet sink: one directory per distinct
    value of ``partition_col`` (``col=value/``). Rows are routed with ONE
    groupby exchange on the partition column; each partition writes its
    own files atomically (tmp + rename), so downstream reads prune by
    directory; for skip-finished-partition resume semantics use
    ``state/lineage.resumable_write``. Returns the partition values."""
    import os

    def write_group(tbl):
        import pyarrow.parquet as pq_mod

        val = tbl[partition_col][0].as_py()
        d = os.path.join(out_dir, f"{partition_col}={val}")
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, "data.parquet.tmp")
        pq_mod.write_table(tbl.drop_columns([partition_col]), tmp)
        os.replace(tmp, os.path.join(d, "data.parquet"))
        return pa.table({partition_col: tbl[partition_col].slice(0, 1)})

    done = ds.groupby(partition_col).map_groups(
        write_group, batch_format="pyarrow").take_all()
    return sorted(r[partition_col] for r in done)
