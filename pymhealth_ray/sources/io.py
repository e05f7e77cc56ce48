"""Parquet read helpers: column pruning + explicit read parallelism.

``read_table`` always passes ``columns=`` (prune at the read — never load
columns a 2-column transform won't touch) and sizes ``override_num_blocks``
to the cluster so downstream shuffles get parallel input even when the
source is a single small file. At 100 TB the file count dominates and the
override becomes unnecessary; locally it is the difference between a
1-task sort and a 2×CPU-way sort.
"""

from __future__ import annotations

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
