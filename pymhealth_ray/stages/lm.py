"""Unigram language-model scoring: per-document average negative
log-likelihood under the corpus's own unigram distribution.

The standard cheap "perplexity filter" of web-scale pipelines (CCNet-style
quality scoring with the LM replaced by the corpus unigram model, which
needs no external artifact). Plan:

  1. corpus token counts via ``vocab.token_vocabulary`` (per-block
     combiners + bucketed exchange of (token, count) rows);
  2. the count table collects to one {token: log p} dict, broadcast once
     via ``ray.put`` (at a 10⁸-type vocabulary you would hash tokens to
     int64 and broadcast two numpy arrays; topology unchanged);
  3. map-only scoring — per batch, tokens are exploded once, dictionary-
     encoded so the dict lookup runs once per DISTINCT token per batch,
     and per-doc means come from one ``np.add.reduceat`` over the gathered
     log-probs. No per-token Python in the hot path.

Reference lineage: `functions/information.py` entropy family
(`/root/reference/src/mhealth/generic/information.py`) generalized from
one array to a corpus; scoring semantics follow the published CCNet
recipe (unigram fallback).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pymhealth_ray.stages.vocab import token_vocabulary


def unigram_logprobs(ds, text_col: str = "text", num_buckets: int = 64):
    """Driver-side {token: ln(count / total)} over the corpus. Empty
    tokens (consecutive separators) are dropped, matching
    ``vocab.token_vocabulary`` and SQL ``string_split`` + ``<> ''``."""
    counts = {}
    for r in token_vocabulary(ds, text_col, num_buckets=num_buckets).take_all():
        counts[r["tok"]] = r["c"]
    total = float(sum(counts.values()))
    return {t: float(np.log(c / total)) for t, c in counts.items()}


def score_documents(ds, lp_ref, id_col: str = "doc_id",
                    text_col: str = "text", oov_logprob: float | None = None):
    """Per doc: ``n_tok`` and ``nll`` (−mean token log-prob). Unknown
    tokens score ``oov_logprob`` (None → must not happen; scoring the
    training corpus itself covers every token)."""
    import ray

    def fn(batch: pa.Table) -> pa.Table:
        lp = ray.get(lp_ref)
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern(col, pattern=" ")
        flat = toks.values if isinstance(toks, pa.ListArray) else toks.combine_chunks().values
        keep = pc.not_equal(flat, "")
        # doc offsets over the FILTERED token stream
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        keep_np = keep.to_numpy(zero_copy_only=False)
        flat = flat.filter(keep)
        doc_of = doc_of[keep_np]
        n_docs = len(lens)
        n_tok = np.bincount(doc_of, minlength=n_docs).astype(np.int64)

        enc = flat.dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        lut = np.empty(len(uniq), dtype=np.float64)
        for j, t in enumerate(uniq):
            v = lp.get(t, oov_logprob)
            if v is None:
                raise KeyError(f"token {t!r} missing from LM and no oov_logprob")
            lut[j] = v
        tok_lp = lut[enc.indices.to_numpy(zero_copy_only=False)]

        starts = np.concatenate(([0], np.cumsum(n_tok)[:-1]))
        sums = np.zeros(n_docs, dtype=np.float64)
        nz = n_tok > 0
        if nz.any():
            sums[nz] = np.add.reduceat(tok_lp, starts[nz]) if len(tok_lp) else 0.0
        nll = np.zeros(n_docs, dtype=np.float64)
        nll[nz] = -(sums[nz] / n_tok[nz])
        return pa.table({
            id_col: batch[id_col],
            "n_tok": pa.array(n_tok),
            "nll": pa.array(nll),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def unigram_nll(ds, id_col: str = "doc_id", text_col: str = "text",
                num_buckets: int = 64):
    """End-to-end self-scoring: count pass → broadcast → map-only score.
    ``ds`` is consumed twice (like every fit-then-apply stage)."""
    import ray

    lp = unigram_logprobs(ds, text_col, num_buckets)
    lp_ref = ray.put(lp)
    return score_documents(ds, lp_ref, id_col, text_col)


def bigram_nll(ds, tokens_col: str = "tokens", id_cols=("doc_id", "ts_ns"),
               key_mult: int = 2048, out_name: str = "nll_mean"):
    """Token-native add-one-smoothed bigram LM: train adjacent-pair counts
    over the corpus (stages/pmi.skipgram_pair_counts, window=1 — one
    vocab²-bounded (key,count) exchange), densify to a broadcast count
    matrix, then score every sequence map-only:
    ``nll_mean = −(Σ_slots ln((c_ab+1)/(c_a+V))) / n_slots`` (NULL for
    sequences with <2 tokens). ``c_a`` is the left-context marginal over
    pair slots; ``V`` the corpus' distinct-token count.

    The broadcast is key_mult² int64 (32 MB at key_mult=2048) shipped ONCE
    via ray.put — per-batch work is pure vectorized lookups + reduceat."""
    import ray

    from pymhealth_ray.stages.pmi import skipgram_pair_counts

    pairs = skipgram_pair_counts(ds, tokens_col, window=1,
                                 key_mult=key_mult)
    dense = np.zeros(key_mult * key_mult, dtype=np.int64)
    for b in pairs.iter_batches(batch_format="pyarrow"):
        k = b["key"].to_numpy(zero_copy_only=False)
        c = b["c"].to_numpy(zero_copy_only=False)
        dense[k] = c
    left = dense.reshape(key_mult, key_mult).sum(axis=1)

    def distinct_partial(batch: pa.Table) -> pa.Table:
        col = batch[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
        return pa.table({"tok": pa.array(np.unique(flat))})

    vocab = (ds.map_batches(distinct_partial, batch_format="pyarrow",
                            batch_size=None)
             .groupby("tok").count().count())

    dense_ref = ray.put(dense)
    left_ref = ray.put(left)

    def score(batch: pa.Table) -> pa.Table:
        d = ray.get(dense_ref)
        lm = ray.get(left_ref)
        col = batch[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.int64)
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
        offs = np.concatenate(([0], np.cumsum(lens)))
        pos = np.arange(len(flat), dtype=np.int64)
        local = pos - np.repeat(offs[:-1], lens)
        ok = local < np.repeat(lens - 1, lens)
        a = flat[ok]
        b = flat[np.flatnonzero(ok) + 1]
        terms = np.log((d[a * key_mult + b] + 1).astype(np.float64) /
                       (lm[a] + vocab))
        nslots = np.maximum(lens - 1, 0)
        soffs = np.concatenate(([0], np.cumsum(nslots)))[:-1]
        sums = np.zeros(len(lens), dtype=np.float64)
        nz = nslots > 0
        if nz.any():
            red = np.add.reduceat(terms, soffs[nz]) if len(terms) else []
            sums[nz] = red
        with np.errstate(invalid="ignore", divide="ignore"):
            nll = -(sums / nslots)
        cols = {c: batch[c] for c in id_cols}
        cols["n_slots"] = pa.array(nslots)
        cols[out_name] = pa.array(np.where(nz, nll, 0.0),
                                  type=pa.float64(), mask=~nz)
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow")
