"""Entity partitioning: the engine's single shuffle.

Range/hash partition by entity with explicit skew awareness (BASELINE.json
north_star): rows are hash-assigned to ``num_buckets`` buckets on the entity
key, so every entity lands wholly inside one bucket — the invariant all
temporal stages rely on. Bucket count is the scale knob: at 100 TB pick
``total_bytes / ~256 MiB`` buckets (config.EngineConfig).

Salting note (SURVEY.md §7 hard parts): a single pathologically hot entity
makes one bucket large. Stateless window grids can split such an entity into
``doc_id#salt`` sub-streams with ``wsize`` overlap-replay; sessionization has
unbounded lookback and stays unsalted. ``with_entity_bucket`` exposes
``salt_threshold`` for the stateless path.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

BUCKET_COL = "__bucket"


def _stable_bucket_of(strings: pa.ChunkedArray | pa.Array, num_buckets: int) -> np.ndarray:
    """Deterministic (process-independent) bucket per string value.

    Dictionary-encodes the column so crc32 runs once per distinct value per
    batch, not once per row — the per-batch Python cost is O(distinct).
    """
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    enc = strings.dictionary_encode()
    dict_vals = enc.dictionary.to_pylist()
    hashes = np.fromiter(
        (zlib.crc32(str(v).encode("utf-8")) for v in dict_vals),
        dtype=np.uint32,
        count=len(dict_vals),
    )
    buckets = (hashes % np.uint32(num_buckets)).astype(np.int32)
    idx = enc.indices.to_numpy(zero_copy_only=False)
    return buckets[idx]


def with_entity_bucket(ds, entity_col: str = "doc_id", num_buckets: int = 64):
    """Append the bucket column via a stateless zero-copy map_batches."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = _stable_bucket_of(batch[entity_col], num_buckets)
        return batch.append_column(BUCKET_COL, pa.array(b, type=pa.int32()))

    return ds.map_batches(add_bucket, batch_format="pyarrow")


def grouped_by_bucket(ds, fn, entity_col: str = "doc_id", num_buckets: int = 64, **map_groups_kwargs):
    """The canonical temporal-stage plan: bucket → groupby → map_groups(fn).

    ``fn`` receives one bucket's rows as a single pyarrow.Table (bucket col
    already dropped) and returns a pyarrow.Table.
    """

    def wrapper(tbl: pa.Table) -> pa.Table:
        return fn(tbl.drop_columns([BUCKET_COL]))

    bucketed = with_entity_bucket(ds, entity_col, num_buckets)
    return bucketed.groupby(BUCKET_COL).map_groups(
        wrapper, batch_format="pyarrow", **map_groups_kwargs
    )


def entity_segments(tbl: pa.Table, entity_col: str, ts_col: str, tiebreak_col: str | None = None):
    """Sort a group table by (entity, ts[, tiebreak]) and expose per-entity
    segments.

    Returns ``(sorted_tbl, starts, n_entities)`` where ``starts`` is an
    int64 array of segment boundaries of length ``n_entities + 1``
    (``starts[k]:starts[k+1]`` are entity k's rows in ts order).
    """
    keys = [(entity_col, "ascending"), (ts_col, "ascending")]
    if tiebreak_col is not None:
        keys.append((tiebreak_col, "ascending"))
    order = pc.sort_indices(tbl, sort_keys=keys)
    tbl = tbl.take(order)
    ent = tbl[entity_col]
    if isinstance(ent, pa.ChunkedArray):
        ent = ent.combine_chunks()
    codes = ent.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    n = len(codes)
    if n == 0:
        return tbl, np.zeros(1, dtype=np.int64), 0
    change = np.flatnonzero(codes[1:] != codes[:-1]) + 1
    starts = np.concatenate([[0], change, [n]]).astype(np.int64)
    return tbl, starts, len(starts) - 1


def column_f64(tbl: pa.Table, col: str) -> np.ndarray:
    """Column as a float64 numpy array (zero-copy when possible)."""
    arr = tbl[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)


def column_i64(tbl: pa.Table, col: str) -> np.ndarray:
    arr = tbl[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
