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
    import pyarrow.types as pat

    if pat.is_integer(strings.type) and strings.null_count == 0:
        # numeric keys: one vectorized 64-bit mix, no per-value Python
        v = strings.to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = v * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(29)
            h *= np.uint64(0xBF58476D1CE4E5B9)
            h ^= h >> np.uint64(32)
        return (h % np.uint64(num_buckets)).astype(np.int32)
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
    if arr.null_count:
        # nulls come out of to_numpy as NaN and astype(int64) turns them
        # into garbage silently — refuse instead of corrupting
        raise ValueError(
            f"column {col!r} has {arr.null_count} nulls; integer temporal "
            f"kernels need a null-free column (fill or drop first)")
    return arr.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)


def segmented_searchsorted(hay: np.ndarray, hay_starts: np.ndarray,
                           q: np.ndarray, q_starts: np.ndarray,
                           side: str = "left") -> np.ndarray:
    """``np.searchsorted`` of each query inside ITS OWN entity's haystack
    segment, fully vectorized across entities — returns GLOBAL indices into
    ``hay`` (i.e. ``hay_starts[k] + local_insertion_point`` for a query of
    entity ``k``; an "empty" result is ``hay_starts[k]`` itself).

    Both arrays are int64, segment-sorted, grouped by the same entity order
    (``hay_starts`` / ``q_starts`` are length n_ent+1 boundary arrays). The
    trick: rebase each entity's values to a shared non-negative range and add
    ``entity_index * B`` (B wider than any rebased value) so ONE global
    searchsorted answers every segment. Entities are processed in chunks
    sized so ``chunk * B`` cannot overflow int64 — per-call Python work is
    O(n_ent / chunk), not O(n_ent), at any entity cardinality.
    """
    n_ent = len(hay_starts) - 1
    out = np.empty(len(q), dtype=np.int64)
    if n_ent == 0 or len(q) == 0:
        return out
    hay_len = np.diff(hay_starts)
    q_len = np.diff(q_starts)

    # per-entity min/max across BOTH arrays (empty segments → neutral)
    big = np.int64(2**62)
    def seg_min(a, starts, lens):
        m = np.full(n_ent, big)
        nz = lens > 0
        if nz.any():
            m[nz] = np.minimum.reduceat(a, starts[:-1][nz])
        return m

    def seg_max(a, starts, lens):
        m = np.full(n_ent, -big)
        nz = lens > 0
        if nz.any():
            m[nz] = np.maximum.reduceat(a, starts[:-1][nz])
        return m

    base = np.minimum(seg_min(hay, hay_starts, hay_len), seg_min(q, q_starts, q_len))
    top = np.maximum(seg_max(hay, hay_starts, hay_len), seg_max(q, q_starts, q_len))
    span = np.maximum(top - base, 0)
    B = int(span.max()) + 2 if n_ent else 2
    chunk = max(1, int((2**62) // max(B, 1)))

    for c0 in range(0, n_ent, chunk):
        c1 = min(c0 + chunk, n_ent)
        hs, he = hay_starts[c0], hay_starts[c1]
        qs, qe = q_starts[c0], q_starts[c1]
        if qe == qs:
            continue
        ents = np.arange(c0, c1, dtype=np.int64)
        hay_ent = np.repeat(ents - c0, hay_len[c0:c1])
        q_ent = np.repeat(ents - c0, q_len[c0:c1])
        hay_base = np.repeat(base[c0:c1], hay_len[c0:c1])
        q_base = np.repeat(base[c0:c1], q_len[c0:c1])
        adj_hay = (hay[hs:he] - hay_base) + hay_ent * np.int64(B)
        adj_q = (q[qs:qe] - q_base) + q_ent * np.int64(B)
        out[qs:qe] = hs + np.searchsorted(adj_hay, adj_q, side=side)
    return out
