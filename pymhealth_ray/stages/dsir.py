"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023):
score every raw document by the log importance ratio of a TARGET
distribution over a RAW distribution, both modeled as hashed n-gram
(bigram) multinomials with add-1 smoothing. High-scoring docs "look like"
the target corpus; sampling proportional to the weights selects
target-like pretraining data without training a classifier.

Distributed plan (two scans + ONE slim exchange, everything else
broadcast/map-only):
  1. FUSED count pass: each block emits (bucket, c) partials for the raw
     family and (bucket + B, c) for the target family (rows matching
     ``target_mask_fn``) — the disjoint-tag trick from stages/lm.py's
     fused trigram round; one keyed_sum exchange sums both; the driver
     densifies to two length-B int arrays (B = 4096 — fixed broadcast
     size at ANY corpus scale).
  2. map-only scoring against the broadcast log-prob difference array:
     per doc, hashed-feature contributions are summed IN FEATURE ORDER
     (np.add.reduceat) so the float chain is partitioning-invariant and
     bit-exact vs the single-process oracle.

Feature hash: first 3 hex chars of md5("w1 w2") → bucket in [0, 4096) —
per-DISTINCT-bigram C-speed md5 per batch (dictionary-encoded), and
exactly reproducible in SQL as ``substr(md5(w1 || ' ' || w2), 1, 3)``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

N_BUCKETS = 4096  # 16^3: bucket == int of the md5 hex prefix


def _word_bigram_buckets(texts: pa.Array):
    """Per-row hashed-bigram bucket ids, flattened, plus per-row feature
    counts. Vectorized: one split, one dictionary-encode of the joined
    bigram strings, md5 once per DISTINCT bigram."""
    words = pc.split_pattern(texts, pattern=" ")
    flat = words.values if isinstance(words, pa.ListArray) else \
        words.combine_chunks().values
    lens = pc.list_value_length(words).to_numpy(
        zero_copy_only=False).astype(np.int64)
    offs = np.concatenate(([0], np.cumsum(lens)))
    keep = np.ones(len(flat), dtype=bool)
    keep[offs[1:][lens > 0] - 1] = False  # drop each row's last word
    pos = np.flatnonzero(keep)
    if len(pos) == 0:
        return np.empty(0, np.int64), np.maximum(lens - 1, 0)
    lead = flat.take(pa.array(pos))
    trail = flat.take(pa.array(pos + 1))
    joined = pc.binary_join_element_wise(lead, trail, " ")
    enc = joined.dictionary_encode()
    uniq = enc.dictionary.cast(pa.binary()).to_pylist()
    lut = np.fromiter(
        (int(hashlib.md5(s).hexdigest()[:3], 16) for s in uniq),
        dtype=np.int64, count=len(uniq))
    buckets = lut[enc.indices.to_numpy(zero_copy_only=False)]
    return buckets, np.maximum(lens - 1, 0)


def dsir_fit(ds, text_col: str, target_expr, num_buckets: int = 64):
    """Fit the two hashed-bigram multinomials. ``target_expr(batch) ->
    bool numpy mask`` selects the target rows inside each batch. Returns
    (log_ratio: np.ndarray[N_BUCKETS], n_raw, n_target) — the broadcastable
    model: log_ratio[b] = ln p_target(b) − ln p_raw(b), add-1 smoothed."""
    from pymhealth_ray.stages.aggregate import keyed_sum

    B = np.int64(N_BUCKETS)

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        bk, n_feat = _word_bigram_buckets(col)
        mask = target_expr(batch)
        row_of = np.repeat(np.arange(len(n_feat), dtype=np.int64), n_feat)
        tgt = mask[row_of]
        tagged = np.concatenate([bk, bk[tgt] + B])
        vals, cnts = np.unique(tagged, return_counts=True)
        return pa.table({"k": pa.array(vals),
                         "c": pa.array(cnts.astype(np.int64))})

    counts = keyed_sum(ds.map_batches(partial, batch_format="pyarrow",
                                      batch_size=None),
                       "k", ["c"], num_buckets=num_buckets,
                       precombine_rows=None)
    raw = np.zeros(N_BUCKETS, dtype=np.int64)
    tgt = np.zeros(N_BUCKETS, dtype=np.int64)
    for t in counts.iter_batches(batch_format="pyarrow"):
        k = t["k"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        is_t = k >= N_BUCKETS
        raw[k[~is_t]] = c[~is_t]
        tgt[k[is_t] - N_BUCKETS] = c[is_t]
    n_raw = int(raw.sum())
    n_tgt = int(tgt.sum())
    log_ratio = (np.log(tgt + 1.0) - np.log(float(n_tgt + N_BUCKETS))
                 - np.log(raw + 1.0) + np.log(float(n_raw + N_BUCKETS)))
    return log_ratio, n_raw, n_tgt


def dsir_scores(ds, log_ratio_ref, text_col: str = "text",
                id_col: str = "doc_id"):
    """Map-only scoring: per doc ``n_feat`` and ``dsir_logw`` (sum of the
    broadcast per-bucket log-ratios over its hashed bigrams, in feature
    order; NULL when the doc has no bigram)."""
    import ray

    def fn(batch: pa.Table) -> pa.Table:
        lr = ray.get(log_ratio_ref)
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        bk, n_feat = _word_bigram_buckets(col)
        contrib = lr[bk]
        starts = np.concatenate(([0], np.cumsum(n_feat)))[:-1]
        sums = np.zeros(len(n_feat), dtype=np.float64)
        nz = n_feat > 0
        if nz.any() and len(contrib):
            sums[nz] = np.add.reduceat(contrib, starts[nz])
        return pa.table({
            id_col: batch[id_col],
            "n_feat": pa.array(n_feat),
            "dsir_logw": pa.array(np.where(nz, sums, 0.0),
                                  type=pa.float64(), mask=~nz),
        })

    return ds.map_batches(fn, batch_format="pyarrow")
