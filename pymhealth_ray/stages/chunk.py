"""Context-window chunking of token sequences — the map-only op that
turns variable-length documents into fixed-budget training windows.

The reference's windowing machinery slices a single in-memory array into
overlapping views (reference:src/mhealth/util/windows.py:view /
get_indices); this is the corpus-scale, list-column generalization: each
row's ``tokens:list<int32>`` payload is cut into windows of ``max_len``
starting every ``stride`` tokens, entirely from the Arrow list offsets —
no per-row Python, no exchange (embarrassingly parallel; at 100 TB this
stage is pure streaming map_batches with zero shuffle).

Chunk semantics (match the SQL oracle exactly):
- starts are ``0, stride, 2*stride, …`` while ``start < n``; the final
  chunk may be shorter than ``max_len`` (kept — downstream packing /
  padding decides its fate);
- empty rows produce no chunks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _chunk_spans(list_arr, max_len: int, stride: int):
    """Vectorized (row_idx, chunk_id, global_start, global_end) for every
    chunk of every row of a list array. Returns int64 arrays."""
    if isinstance(list_arr, pa.ChunkedArray):
        list_arr = list_arr.combine_chunks()
    off = np.asarray(list_arr.offsets, dtype=np.int64)
    base = off[0]
    n = np.diff(off)  # row lengths
    n_chunks = np.where(n > 0, (n - 1) // stride + 1, 0)
    row_idx = np.repeat(np.arange(len(n), dtype=np.int64), n_chunks)
    # chunk_id = position within its own row's run
    run_starts = np.concatenate(([0], np.cumsum(n_chunks)[:-1]))
    chunk_id = np.arange(int(n_chunks.sum()), dtype=np.int64) - run_starts[row_idx]
    g_start = (off[:-1] - base)[row_idx] + chunk_id * stride
    g_end = np.minimum(g_start + max_len, (off[1:] - base)[row_idx])
    return row_idx, chunk_id, g_start, g_end


def chunk_tokens(ds, tokens_col: str = "tokens", max_len: int = 128,
                 stride: int = 128, meta_cols=("doc_id", "ts_ns"),
                 emit_tokens: bool = False):
    """Explode each row into fixed-window chunks of its token list.

    Output columns: ``*meta_cols, chunk_id:int64, n_chunk:int64,
    tok_sum:int64, first_tok:int32, last_tok:int32`` and, when
    ``emit_tokens``, ``chunk:list<int32>`` (the window itself, rebuilt
    zero-copy-adjacent via one gather over the flattened values).
    """
    if stride <= 0 or max_len <= 0:
        raise ValueError("max_len and stride must be positive")
    meta_cols = list(meta_cols)

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        row_idx, chunk_id, g_start, g_end = _chunk_spans(col, max_len, stride)
        vals = np.asarray(col.flatten().to_numpy(zero_copy_only=False),
                          dtype=np.int64)
        # exact int64 window sums off one cumsum (ids are non-negative
        # int32 — no cancellation concern for integer prefix sums)
        cs = np.concatenate(([0], np.cumsum(vals)))
        cols = {m: batch[m].take(pa.array(row_idx)) for m in meta_cols}
        cols["chunk_id"] = pa.array(chunk_id)
        cols["n_chunk"] = pa.array(g_end - g_start)
        cols["tok_sum"] = pa.array(cs[g_end] - cs[g_start])
        cols["first_tok"] = pa.array(vals[g_start].astype(np.int32))
        cols["last_tok"] = pa.array(vals[g_end - 1].astype(np.int32))
        if emit_tokens:
            lens = g_end - g_start
            new_off = np.concatenate(([0], np.cumsum(lens)))
            gather = np.repeat(g_start - new_off[:-1], lens) + np.arange(
                int(new_off[-1]), dtype=np.int64)
            chunk_vals = pa.array(vals[gather].astype(np.int32))
            if new_off[-1] < 2**31:
                cols["chunk"] = pa.ListArray.from_arrays(
                    pa.array(new_off, type=pa.int32()), chunk_vals)
            else:  # >2B tokens in one batch: large_list offsets
                cols["chunk"] = pa.LargeListArray.from_arrays(
                    pa.array(new_off, type=pa.int64()), chunk_vals)
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")
