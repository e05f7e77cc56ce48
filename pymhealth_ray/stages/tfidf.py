"""TF-IDF term scoring — corpus-weighted per-document term ranking.

Shape of the plan (and why it scales):
- document frequency (df) is the only corpus-global state. It is built
  with the vocabulary exchange (per-block distinct (term, rows-containing)
  partials bucketed by token hash → one small merge — volume is
  |distinct terms per block|, never the corpus), then broadcast ONCE via
  ``ray.put`` (a corpus vocabulary is millions of terms ≈ tens of MB, the
  classic small-side broadcast; at larger vocabularies swap the broadcast
  for a term-bucketed equi-join — stages/join.py — without touching the
  scoring pass).
- scoring + per-doc top-k is then MAP-ONLY: a document's text is one row,
  so its term frequencies and its top-k are computed entirely inside the
  block (Arrow group_by per block, numpy lexsort top-k). No per-doc
  exchange ever happens.

Float parity (see pipelines/queries.py docstring): the idf weight is the
LINEAR ratio ``N / df`` (one IEEE double division, bit-identical in any
engine) rather than ``ln(N/df)`` — a libm ``ln`` can differ in the last
ulp between runtimes, which would poison hash-exact verification. The
ranking is identical for any monotone idf; the docstring records the
substitution.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from pymhealth_ray.stages.partition import _stable_bucket_of


def _row_term_counts(batch: pa.Table, text_col: str, doc_col: str,
                     pattern: str = " ") -> pa.Table:
    """Per-(doc, term) counts for one block: split on ``pattern``, drop
    empties, count inside each row via one Arrow group_by (doc ids are
    repeated along the flattened token list off the list offsets)."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks_list = pc.split_pattern(col, pattern=pattern)
    off = np.asarray(toks_list.offsets, dtype=np.int64)
    doc = batch[doc_col].take(pa.array(
        np.repeat(np.arange(batch.num_rows, dtype=np.int64), np.diff(off - off[0]))))
    flat = pa.table({"doc_id": doc, "tok": toks_list.flatten()})
    flat = flat.filter(pc.not_equal(flat["tok"], ""))
    out = flat.group_by(["doc_id", "tok"]).aggregate([([], "count_all")])
    return out.rename_columns(["doc_id", "tok", "tf"])


def document_frequency(ds, text_col: str = "text", doc_col: str = "doc_id",
                       num_buckets: int = 256, pattern: str = " "):
    """term → (#docs containing it) Dataset (columns ``tok, df``)."""

    def partial(batch: pa.Table) -> pa.Table:
        tc = _row_term_counts(batch, text_col, doc_col, pattern)
        vc = tc.group_by("tok").aggregate([([], "count_all")])
        tok = vc["tok"]
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        b = _stable_bucket_of(tok, num_buckets)
        return pa.table({"tok": tok, "df": vc["count_all"].cast(pa.int64()),
                         "__aggbucket": pa.array(b, type=pa.int32())})

    def merge(tbl: pa.Table) -> pa.Table:
        out = tbl.drop_columns(["__aggbucket"]).group_by("tok").aggregate(
            [("df", "sum")])
        return out.rename_columns(["tok", "df"])

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return partials.groupby("__aggbucket").map_groups(merge, batch_format="pyarrow")


def tfidf_top_terms(ds, text_col: str = "text", doc_col: str = "doc_id",
                    k: int = 5, num_buckets: int = 256, pattern: str = " "):
    """Top-k terms per document by ``tf * (N / df)`` (score desc, term asc
    tie-break, 1-based ``rn``). Output: ``doc_id, rn, tok, tf, df, score``.

    ``ds`` is consumed twice (df build + scoring scan) — both are
    streaming passes; only df's bounded partials are ever exchanged.
    """
    n_docs = ds.count()
    df_tbl = pa.concat_tables(document_frequency(
        ds, text_col, doc_col, num_buckets, pattern
    ).iter_batches(batch_format="pyarrow", batch_size=None))
    df_map_ref = ray.put(dict(zip(df_tbl["tok"].to_pylist(),
                                  df_tbl["df"].to_pylist())))

    class Scorer:
        def __init__(self, df_ref, n):
            self.df = ray.get(df_ref)
            self.n = float(n)

        def __call__(self, batch: pa.Table) -> pa.Table:
            tc = _row_term_counts(batch, text_col, doc_col, pattern)
            if tc.num_rows == 0:
                return pa.table({"doc_id": pa.array([], batch[doc_col].type),
                                 "rn": pa.array([], pa.int64()),
                                 "tok": pa.array([], pa.string()),
                                 "tf": pa.array([], pa.int64()),
                                 "df": pa.array([], pa.int64()),
                                 "score": pa.array([], pa.float64())})
            toks = tc["tok"].to_pylist()
            # dict lookups only on the batch's DISTINCT terms, broadcast
            # back by inverse index — never a per-row Python pass
            uu, inv = np.unique(np.asarray(toks, dtype=object),
                                return_inverse=True)
            dfv = np.array([self.df[t] for t in uu], dtype=np.int64)[inv]
            tf = tc["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
            score = tf * (self.n / dfv)
            doc = tc["doc_id"].to_numpy(zero_copy_only=False)
            # top-k inside each doc: lexsort (tok asc within score desc
            # within doc), then rank-within-run off the sorted doc ids
            tok_sort = pc.sort_indices(tc["tok"]).to_numpy().astype(np.int64)
            tok_rank = np.empty(len(toks), dtype=np.int64)
            tok_rank[tok_sort] = np.arange(len(toks))
            order = np.lexsort((tok_rank, -score, doc))
            d_sorted = doc[order]
            run_start = np.concatenate(([0], np.flatnonzero(
                d_sorted[1:] != d_sorted[:-1]) + 1))
            rn = np.arange(len(d_sorted), dtype=np.int64) - np.repeat(
                run_start, np.diff(np.concatenate((run_start, [len(d_sorted)])))) + 1
            keep = rn <= k
            sel = order[keep]
            return pa.table({
                "doc_id": tc["doc_id"].take(pa.array(sel)),
                "rn": pa.array(rn[keep]),
                "tok": tc["tok"].take(pa.array(sel)),
                "tf": pa.array(tf[sel]),
                "df": pa.array(dfv[sel]),
                "score": pa.array(score[sel]),
            })

    return ds.map_batches(
        Scorer, fn_constructor_args=(df_map_ref, n_docs),
        batch_format="pyarrow", concurrency=(1, 8))
