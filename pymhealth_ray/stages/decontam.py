"""Eval-set decontamination: how much of each eval document's content
already appears in the training corpus.

The standard LLM-data integrity check: an eval document whose n-grams are
largely present in the training set is contaminated and silently inflates
benchmark scores. At corpus scale the train side cannot be joined per
n-gram — instead its shingle set is compressed into a mergeable Bloom
bitmap (stages.bloom: per-block partial bitmaps, order-free OR merge →
bit-identical for any layout) and broadcast; each eval document then
scores map-only as the fraction of its shingles hitting the filter.

No false negatives means contamination is never UNDER-reported; the FP
rate adds a small constant over-report (bounded by the bitmap sizing),
which is the safe direction for a decontamination gate. Shingles are the
same rolling char-k-gram hashes the MinHash pipeline uses
(stages.dedup._shingle_hashes), so the two dedup surfaces agree on what
"same content" means.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pymhealth_ray.stages.bloom import _bit_positions
from pymhealth_ray.stages.dedup import _shingle_hashes
from pymhealth_ray.stages.sketch import _splitmix64


def _hash_pair_u64(h: np.ndarray):
    return _splitmix64(h), _splitmix64(h ^ np.uint64(0xA5A5A5A5A5A5A5A5))


def _texts_of(batch: pa.Table, text_col: str) -> list:
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_pylist()


def _shingle_bitmap(texts: list, shingle_k: int, n_bits: int, k_hashes: int) -> np.ndarray:
    bm = np.zeros(n_bits // 8, dtype=np.uint8)
    for t in texts:
        sh = _shingle_hashes(t, shingle_k)
        h1, h2 = _hash_pair_u64(sh)
        pos = _bit_positions(h1, h2, n_bits, k_hashes).reshape(-1)
        np.bitwise_or.at(bm, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return bm


def build_shingle_bloom(train_ds, text_col: str = "text", shingle_k: int = 16,
                        n_bits: int = 1 << 22, k_hashes: int = 5,
                        merge_groups: int = 64) -> np.ndarray:
    """Bloom bitmap over every char-``shingle_k``-gram of the train corpus
    (distributed two-level OR merge, bit-identical to a single-process
    build)."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        bm = _shingle_bitmap(_texts_of(batch, text_col), shingle_k, n_bits, k_hashes)
        return pa.table({
            "bm": pa.FixedSizeListArray.from_arrays(pa.array(bm, type=pa.uint8()), len(bm)),
            "__mgroup": pa.array([int(bm[:64].sum()) % merge_groups], type=pa.int32()),
        })

    def or_group(tbl: pa.Table) -> pa.Table:
        col = tbl["bm"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mats = np.asarray(col.values.to_numpy(zero_copy_only=False),
                          dtype=np.uint8).reshape(tbl.num_rows, -1)
        merged = np.bitwise_or.reduce(mats, axis=0)
        return pa.table({"bm": pa.FixedSizeListArray.from_arrays(
            pa.array(merged, type=pa.uint8()), len(merged))})

    merged = train_ds.map_batches(partial, batch_format="pyarrow", batch_size=None).groupby(
        "__mgroup").map_groups(
        lambda t: or_group(t.drop_columns(["__mgroup"])), batch_format="pyarrow")
    out = np.zeros(n_bits // 8, dtype=np.uint8)
    for t in ray.get(merged.to_arrow_refs()):
        if t.num_rows:
            mats = np.asarray(t["bm"].combine_chunks().values.to_numpy(
                zero_copy_only=False), dtype=np.uint8).reshape(t.num_rows, -1)
            out |= np.bitwise_or.reduce(mats, axis=0)
    return out


def contamination_scores(eval_ds, bloom_ref, id_col: str = "doc_id",
                         text_col: str = "text", shingle_k: int = 16,
                         k_hashes: int = 5):
    """Per eval document: n_shingles and the fraction present in the train
    bloom (rounded to 6). Map-only against the broadcast bitmap."""
    import ray

    def fn(batch: pa.Table) -> pa.Table:
        bm = ray.get(bloom_ref)
        n_bits = len(bm) * 8
        texts = _texts_of(batch, text_col)
        n_sh = np.zeros(len(texts), dtype=np.int64)
        frac = np.zeros(len(texts), dtype=np.float64)
        for i, t in enumerate(texts):
            sh = _shingle_hashes(t, shingle_k)
            h1, h2 = _hash_pair_u64(sh)
            pos = _bit_positions(h1, h2, n_bits, k_hashes)
            hits = ((bm[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1).all(axis=1)
            n_sh[i] = len(sh)
            frac[i] = hits.mean() if len(sh) else 0.0
        return pa.table({
            id_col: batch[id_col],
            "n_shingles": pa.array(n_sh),
            "contamination": pa.array(np.round(frac, 6)),
        })

    return eval_ds.map_batches(fn, batch_format="pyarrow")
