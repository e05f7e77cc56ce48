"""Mergeable Bloom filter — broadcast membership index for semi-/anti-join
filtering without a shuffle.

The 100TB use case: dedup or route a NEW shard against an EXISTING corpus
(\"drop documents whose id we already ingested\") without ever shuffling the
corpus — build the filter once over the corpus keys, broadcast the bitmap
(``ray.put``), and every task tests membership locally. This is the
reference's broadcast small-side lookup (reference:location/distance.py:
36-44) generalized to sets too large to broadcast exactly.

Mergeability: per-block partial bitmaps OR together — order-free, like the
HLL registers (stages.sketch), so the built filter is BIT-IDENTICAL for
any block layout, which is what lets a single-process oracle check the
distributed build exactly. The merge is two-level (block partials →
bounded merge groups → driver) so no single place ever holds
blocks x bitmap bytes.

Semantics: no false negatives ever; false positives at the standard
(1 - e^{-kn/m})^k rate. Anti-join (keep definite-non-members) therefore
drops a small FP fraction of genuinely-new rows — callers that cannot
tolerate that follow with an exact pass over the (tiny) maybe-set.

Hashing: double hashing h1 + i*h2 over splitmix64 (ints) / md5 halves
(strings), computed per distinct value per batch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _hash_pair(col) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) uint64 per row."""
    from pymhealth_ray.stages.sketch import _splitmix64

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        v = col.cast(pa.int64()).to_numpy(zero_copy_only=False).view(np.uint64)
        return _splitmix64(v), _splitmix64(v ^ np.uint64(0xA5A5A5A5A5A5A5A5))
    enc = col.dictionary_encode()
    idx = enc.indices.to_numpy(zero_copy_only=False)
    uniq = enc.dictionary.to_pylist()
    digs = [hashlib.md5(str(v).encode()).digest() for v in uniq]
    h1 = np.array([int.from_bytes(d[:8], "little") for d in digs], dtype=np.uint64)
    h2 = np.array([int.from_bytes(d[8:], "little") for d in digs], dtype=np.uint64)
    return h1[idx], h2[idx]


def _bit_positions(h1: np.ndarray, h2: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """(n, k) bit indices via double hashing (h2 forced odd so it cycles)."""
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * (h2[:, None] | np.uint64(1)))
            % np.uint64(n_bits)).astype(np.int64)


def _bitmap_of(col, n_bits: int, k: int) -> np.ndarray:
    bm = np.zeros(n_bits // 8, dtype=np.uint8)
    if len(col):
        h1, h2 = _hash_pair(col)
        pos = _bit_positions(h1, h2, n_bits, k).reshape(-1)
        np.bitwise_or.at(bm, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return bm


def build_bloom(ds, col: str, n_bits: int = 1 << 20, k: int = 7,
                merge_groups: int = 64) -> np.ndarray:
    """Distributed build: per-block partial bitmaps, two-level OR-merge.
    Returns the packed uint8 bitmap (length n_bits/8)."""
    import ray

    if n_bits % 8:
        raise ValueError("n_bits must be a multiple of 8")

    def partial(batch: pa.Table) -> pa.Table:
        bm = _bitmap_of(batch[col], n_bits, k)
        return pa.table({
            "bm": pa.FixedSizeListArray.from_arrays(
                pa.array(bm, type=pa.uint8()), len(bm)),
            "__mgroup": pa.array([int(bm[:64].sum()) % merge_groups], type=pa.int32()),
        })

    def or_group(tbl: pa.Table) -> pa.Table:
        col_ = tbl["bm"]
        if isinstance(col_, pa.ChunkedArray):
            col_ = col_.combine_chunks()
        mats = np.asarray(col_.values.to_numpy(zero_copy_only=False),
                          dtype=np.uint8).reshape(tbl.num_rows, -1)
        merged = np.bitwise_or.reduce(mats, axis=0)
        return pa.table({
            "bm": pa.FixedSizeListArray.from_arrays(
                pa.array(merged, type=pa.uint8()), len(merged)),
        })

    merged = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).groupby(
        "__mgroup").map_groups(
        lambda t: or_group(t.drop_columns(["__mgroup"])), batch_format="pyarrow")
    out = np.zeros(n_bits // 8, dtype=np.uint8)
    for t in ray.get(merged.to_arrow_refs()):
        if t.num_rows:
            mats = np.asarray(t["bm"].combine_chunks().values.to_numpy(
                zero_copy_only=False), dtype=np.uint8).reshape(t.num_rows, -1)
            out |= np.bitwise_or.reduce(mats, axis=0)
    return out


def bloom_contains(bitmap: np.ndarray, col, k: int = 7) -> np.ndarray:
    """Vectorized membership test (bool per row; no false negatives)."""
    n_bits = len(bitmap) * 8
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.zeros(0, dtype=bool)
    h1, h2 = _hash_pair(col)
    pos = _bit_positions(h1, h2, n_bits, k)
    bits = (bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)


def filter_against_bloom(ds, col: str, bloom_ref, k: int = 7,
                         keep_members: bool = True):
    """Broadcast semi-join (``keep_members=True``: rows whose key MAY be in
    the indexed set, incl. FPs) or anti-join (False: rows whose key is
    DEFINITELY not). ``bloom_ref`` is ``ray.put(bitmap)``."""
    import ray

    def fn(batch: pa.Table) -> pa.Table:
        bm = ray.get(bloom_ref)
        hit = bloom_contains(bm, batch[col], k)
        return batch.filter(pa.array(hit if keep_members else ~hit))

    return ds.map_batches(fn, batch_format="pyarrow")
