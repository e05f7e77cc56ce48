"""Gopher-style document quality rules (Rae et al. 2021, "Scaling Language
Models: ... Gopher", Appendix A1.1 — public heuristics, re-derived).

Per-document repetition / quality signals used by every large-scale text
curation pipeline: word counts and mean word length, alphabetic-word and
stopword coverage, symbol-to-word ratio, bullet / ellipsis line fractions,
and duplicate-line fraction (the line-level repetition signal of
C4 / RefinedWeb), plus the combined ``keep`` verdict.

Fully vectorized: one `split_pattern_regex` per batch for words, one
`split_pattern` for lines, then flat-array Arrow kernels + ``np.bincount``
segment-aggregations back to the document axis — no per-document Python.
Stateless map_batches (no shuffle); every signal is an exact int/int
double so the SQL oracle is bit-equal (DuckDB ``/`` is double division,
and both sides run the same IEEE ops in the same order).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Gopher's stopword-coverage list (A1.1): a doc must contain >= 2 of these.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
_STOP_ARR = pa.array(GOPHER_STOPWORDS, type=pa.string())

# keep-rule thresholds (A1.1, line-level subset)
MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MEAN_WLEN, MAX_MEAN_WLEN = 3.0, 10.0
MIN_ALPHA_FRAC = 0.8
MIN_STOPWORDS = 2
MAX_SYMBOL_RATIO = 0.1
MAX_BULLET_FRAC = 0.9
MAX_ELLIPSIS_FRAC = 0.3


def _flat(list_arr):
    """(flat values, doc index per value) for a ListArray."""
    if isinstance(list_arr, pa.ChunkedArray):
        list_arr = list_arr.combine_chunks()
    off = np.asarray(list_arr.offsets)
    doc = np.repeat(np.arange(len(list_arr), dtype=np.int64), np.diff(off))
    return list_arr.values, doc


def _seg_count(mask, doc, n) -> np.ndarray:
    return np.bincount(doc, weights=mask.astype(np.float64), minlength=n).astype(np.int64)


def gopher_stats_table(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc Gopher signals for one Arrow batch (pure function)."""
    txt = batch[text_col]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    n = len(txt)

    # ---- words: split on \s+, drop empties (same contract as the oracle's
    # list_filter(regexp_split_to_array(text, '\s+'), w -> w <> ''))
    wflat, wdoc = _flat(pc.split_pattern_regex(txt, pattern=r"\s+"))
    keep_w = pc.not_equal(wflat, "").to_numpy(zero_copy_only=False)
    wdoc = wdoc[keep_w]
    wflat = wflat.filter(pa.array(keep_w))
    n_words = np.bincount(wdoc, minlength=n).astype(np.int64)
    wlen = pc.utf8_length(wflat).to_numpy(zero_copy_only=False).astype(np.int64)
    sum_wlen = np.bincount(wdoc, weights=wlen, minlength=n).astype(np.int64)
    alpha = pc.match_substring_regex(wflat, "[A-Za-z]").to_numpy(zero_copy_only=False)
    n_alpha = _seg_count(alpha, wdoc, n)
    stop = pc.is_in(pc.utf8_lower(wflat), value_set=_STOP_ARR).to_numpy(
        zero_copy_only=False)
    n_stop = _seg_count(stop, wdoc, n)

    # ---- lines
    lflat, ldoc = _flat(pc.split_pattern(txt, pattern="\n"))
    n_lines = np.bincount(ldoc, minlength=n).astype(np.int64)
    bullet = pc.or_(
        pc.or_(pc.starts_with(lflat, pattern="- "),
               pc.starts_with(lflat, pattern="* ")),
        pc.starts_with(lflat, pattern="• ")).to_numpy(zero_copy_only=False)
    ellip = pc.or_(pc.ends_with(lflat, pattern="..."),
                   pc.ends_with(lflat, pattern="…")).to_numpy(
        zero_copy_only=False)
    n_bullet = _seg_count(bullet, ldoc, n)
    n_ellip = _seg_count(ellip, ldoc, n)

    import pandas as pd

    uniq = pd.DataFrame({
        "d": ldoc, "l": lflat.to_numpy(zero_copy_only=False),
    }).drop_duplicates()
    n_dlines = np.bincount(uniq["d"].to_numpy(), minlength=n).astype(np.int64)

    # ---- symbols over raw text (non-overlapping counts == replace-diff)
    n_sym = (pc.count_substring(txt, pattern="#").to_numpy(zero_copy_only=False)
             + pc.count_substring(txt, pattern="...").to_numpy(
                 zero_copy_only=False)).astype(np.int64)

    with np.errstate(divide="ignore", invalid="ignore"):
        mean_wlen = np.where(n_words > 0, sum_wlen / np.maximum(n_words, 1), 0.0)
        alpha_frac = np.where(n_words > 0, n_alpha / np.maximum(n_words, 1), 0.0)
        sym_ratio = np.where(n_words > 0, n_sym / np.maximum(n_words, 1), 0.0)
        bullet_frac = np.where(n_lines > 0, n_bullet / np.maximum(n_lines, 1), 0.0)
        ellip_frac = np.where(n_lines > 0, n_ellip / np.maximum(n_lines, 1), 0.0)
        dup_line_frac = np.where(
            n_lines > 0, 1.0 - n_dlines / np.maximum(n_lines, 1), 0.0)

    keep = ((n_words >= MIN_WORDS) & (n_words <= MAX_WORDS)
            & (mean_wlen >= MIN_MEAN_WLEN) & (mean_wlen <= MAX_MEAN_WLEN)
            & (alpha_frac >= MIN_ALPHA_FRAC) & (n_stop >= MIN_STOPWORDS)
            & (sym_ratio <= MAX_SYMBOL_RATIO) & (bullet_frac <= MAX_BULLET_FRAC)
            & (ellip_frac <= MAX_ELLIPSIS_FRAC))

    out = {c: batch[c] for c in batch.column_names if c != text_col}
    out.update({
        "n_words": pa.array(n_words),
        "mean_word_len": pa.array(mean_wlen),
        "frac_alpha_words": pa.array(alpha_frac),
        "stopword_count": pa.array(n_stop),
        "symbol_word_ratio": pa.array(sym_ratio),
        "frac_lines_bullet": pa.array(bullet_frac),
        "frac_lines_ellipsis": pa.array(ellip_frac),
        "dup_line_frac": pa.array(dup_line_frac),
        "keep": pa.array(keep),
    })
    return pa.table(out)


def gopher_quality(ds, text_col: str = "text"):
    """Append Gopher quality signals + ``keep`` verdict per document and
    drop the text payload. Stateless map-only stage."""
    return ds.map_batches(
        lambda b: gopher_stats_table(b, text_col), batch_format="pyarrow")
