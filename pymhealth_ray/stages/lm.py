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
