"""Intra-document repetition statistics — the Gopher/MassiveText quality
signals (Rae et al. 2021, §A1.1: "repetition" filters) over tokenized
sequences: documents dominated by a single token or by duplicated n-grams
are low-quality boilerplate/spam and get filtered before training.

Map-only and fully vectorized: every per-row distinct/mode/bigram count is
computed across the WHOLE batch with one lexsort + run-length pass — no
per-row Python. The stage is embarrassingly parallel (no exchange), so it
scales linearly with input size.

Reference lineage: the reference's per-array stats kernels
(/root/reference/src/mhealth/generic/statsfuncs.py `mode`) generalized to
segmented (per-row) operation over a token batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _segmented_unique_stats(row_of: np.ndarray, keys: np.ndarray,
                            n_rows: int):
    """Per-row (n_distinct, max_run) over (row, key) pairs, vectorized:
    one lexsort; run boundaries give distinct counts, run lengths give the
    per-row mode frequency."""
    if len(keys) == 0:
        return (np.zeros(n_rows, dtype=np.int64),
                np.zeros(n_rows, dtype=np.int64))
    order = np.lexsort((keys, row_of))
    r = row_of[order]
    k = keys[order]
    new_run = np.concatenate(([True], (r[1:] != r[:-1]) | (k[1:] != k[:-1])))
    run_starts = np.flatnonzero(new_run)
    run_rows = r[run_starts]
    run_lens = np.diff(np.concatenate((run_starts, [len(k)])))
    n_distinct = np.bincount(run_rows, minlength=n_rows).astype(np.int64)
    # per-row max run length: runs are contiguous per row after the sort
    max_run = np.zeros(n_rows, dtype=np.int64)
    row_first = np.concatenate(([True], run_rows[1:] != run_rows[:-1]))
    starts_in_runs = np.flatnonzero(row_first)
    present = run_rows[starts_in_runs]
    max_run[present] = np.maximum.reduceat(run_lens, starts_in_runs)
    return n_distinct, max_run


def shingle_diversity(ds, text_col: str = "text", id_col: str = "doc_id",
                      k: int = 5):
    """Per-doc distinct character-k-gram fraction — the char-level
    templatedness signal (low diversity ⇒ boilerplate/generated text).
    Byte 5-grams packed into int64 keys (40 bits), per-row distinct via
    the shared one-lexsort segmented kernel; byte-shingles == SQL
    character ``substr`` shingles on ASCII corpora (asserted against the
    fixture: length(text) == strlen(text) everywhere)."""

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        bcol = col.cast(pa.binary())
        # BinaryArray exposes offsets only via raw buffers (int32, shifted
        # by the array's own offset for sliced arrays)
        offs = np.frombuffer(bcol.buffers()[1], dtype=np.int32)[
            bcol.offset: bcol.offset + len(bcol) + 1].astype(np.int64)
        data = np.frombuffer(bcol.buffers()[2], dtype=np.uint8)
        lo = offs[0]
        flat = data[lo:offs[-1]].astype(np.int64)
        offs = offs - lo
        lens = np.diff(offs)
        n_rows = len(lens)
        n_sh = np.maximum(lens - k + 1, 0)
        pos = np.arange(len(flat), dtype=np.int64)
        local = pos - np.repeat(offs[:-1], lens)
        ok = local <= np.repeat(lens - k, lens)
        starts = np.flatnonzero(ok)
        keys = np.zeros(len(starts), dtype=np.int64)
        for j in range(k):
            keys |= flat[starts + j] << np.int64(8 * j)
        row_of = np.repeat(np.arange(n_rows, dtype=np.int64), n_sh)
        d_sh, _ = _segmented_unique_stats(row_of, keys, n_rows)
        frac = np.zeros(n_rows, dtype=np.float64)
        nz = n_sh > 0
        frac[nz] = d_sh[nz] / n_sh[nz]
        return pa.table({
            id_col: batch[id_col],
            "n_sh": pa.array(n_sh),
            "d_sh": pa.array(d_sh),
            "distinct_frac": pa.array(frac, type=pa.float64(), mask=~nz),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def repetition_stats(ds, tokens_col: str = "tokens",
                     id_cols=("doc_id", "ts_ns"), key_mult: int = 2048):
    """Per row: ``n_tok``, ``distinct_frac`` (distinct tokens / tokens),
    ``top_tok_frac`` (most-frequent-token count / tokens) and
    ``dup_bigram_frac`` ((bigrams − distinct bigrams) / bigrams; NULL when
    the row has fewer than 2 tokens). Every ratio is an int/int double
    division — bit-exact against the SQL oracle with no rounding
    (pipelines/queries.py float-parity rules)."""
    id_cols = list(id_cols)

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        lens = pc.list_value_length(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_rows = len(lens)
        row_of = np.repeat(np.arange(n_rows, dtype=np.int64), lens)

        n_distinct, max_run = _segmented_unique_stats(row_of, flat, n_rows)

        # packed bigrams: adjacent pairs WITHIN rows (drop each row's last)
        offs = np.concatenate(([0], np.cumsum(lens)))
        last_of_row = offs[1:] - 1
        keep = np.ones(len(flat), dtype=bool)
        keep[last_of_row[lens > 0]] = False
        bi_rows = row_of[keep]
        bpos = np.flatnonzero(keep)
        bigrams = flat[bpos] * np.int64(key_mult) + flat[bpos + 1]
        n_bg = np.maximum(lens - 1, 0)
        d_bg, _ = _segmented_unique_stats(bi_rows, bigrams, n_rows)

        def ratio(num, den):
            out = np.zeros(n_rows, dtype=np.float64)
            nz = den > 0
            out[nz] = num[nz] / den[nz]
            return pa.array(out, type=pa.float64(), mask=~nz)

        cols = {c: batch[c] for c in id_cols}
        cols["n_tok"] = pa.array(lens)
        cols["distinct_frac"] = ratio(n_distinct, lens)
        cols["top_tok_frac"] = ratio(max_run, lens)
        cols["dup_bigram_frac"] = ratio(n_bg - d_bg, n_bg)
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")
