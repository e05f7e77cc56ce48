"""BM25 retrieval: score every document against a query, return the
global top-k.

The retrieval scorer behind search-based corpus filtering and
decontamination lookups. Okapi BM25 with the Lucene-style non-negative
idf, ``idf = ln((N − df + 0.5)/(df + 0.5) + 1)``. Plan:

  1. **corpus stats pass** — per-block combiners emit (per-query-term
     document frequency, doc count, token count); a handful of rows
     collect to the driver → N, avgdl, idf per query term. The exchange
     is O(query terms × blocks).
  2. **map-only scoring** — query terms and idfs broadcast once; each
     batch computes tf per query term with one dictionary-encoded pass
     (no per-token Python) and the vectorized BM25 sum;
  3. **partial top-k** — each block emits only its k best (rounded-score
     DESC, doc_id ASC ordering, exactly the oracle's sort), the ≤
     k·blocks survivors merge on the driver. Nothing rank-relevant ever
     needs a global sort.

Scores are rounded (DuckDB half-away convention) BEFORE ranking so both
engines select and order by the identical key.

Reference lineage: beyond-reference retrieval surface (SURVEY §2.10);
partial-top-k mirrors ``stages/aggregate.grouped_topk``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _round_away(x: np.ndarray, d: int = 6) -> np.ndarray:
    m = 10.0**d
    return np.sign(x) * np.floor(np.abs(x) * m + 0.5) / m


def _corpus_stats(ds, query_terms, text_col: str):
    terms = list(query_terms)

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern(col, pattern=" ")
        flat = toks.values
        keep = pc.not_equal(flat, "")
        n_tok_total = int(pc.sum(keep.cast(pa.int64())).as_py() or 0)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64),
                           lens.astype(np.int64))
        keep_np = keep.to_numpy(zero_copy_only=False)
        # df per query term: docs containing the term at least once
        dfs = []
        for t in terms:
            hit = pc.equal(flat, t).to_numpy(zero_copy_only=False) & keep_np
            dfs.append(len(np.unique(doc_of[hit])))
        return pa.table({
            "term": pa.array(terms + ["", ""], type=pa.string()),
            "c": pa.array(dfs + [batch.num_rows, n_tok_total],
                          type=pa.int64()),
            "kind": pa.array(["df"] * len(terms) + ["n", "len"],
                             type=pa.string()),
        })

    rows = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None).take_all()
    df = {t: 0 for t in terms}
    n_docs = 0
    total_len = 0
    for r in rows:
        if r["kind"] == "df":
            df[r["term"]] += r["c"]
        elif r["kind"] == "n":
            n_docs += r["c"]
        else:
            total_len += r["c"]
    return df, n_docs, total_len


def bm25_topk(ds, query_terms, id_col: str = "doc_id",
              text_col: str = "text", k: int = 20,
              k1: float = 1.5, b: float = 0.75):
    """Top-k (id, score, rn) by BM25 against ``query_terms``. Returns a
    pyarrow.Table (the result is k rows — driver-sized by definition)."""
    import ray

    terms = list(query_terms)
    df, n_docs, total_len = _corpus_stats(ds, terms, text_col)
    avgdl = total_len / np.float64(n_docs)
    idf = {t: float(np.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1))
           for t in terms}
    bc = ray.put((terms, idf, avgdl, k1, b))

    def score_block(batch: pa.Table) -> pa.Table:
        terms_, idf_, avgdl_, k1_, b_ = ray.get(bc)
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern(col, pattern=" ")
        flat = toks.values
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        dl = np.bincount(doc_of[keep], minlength=len(lens)).astype(np.int64)
        denom_base = k1_ * (0.25 + b_ * (dl / avgdl_))
        score = np.zeros(len(lens), dtype=np.float64)
        for t in terms_:
            hit = keep & pc.equal(flat, t).to_numpy(zero_copy_only=False)
            tf = np.bincount(doc_of[hit], minlength=len(lens)).astype(np.int64)
            score += idf_[t] * ((tf * (k1_ + 1)) / (tf + denom_base))
        score = _round_away(score, 6)
        tbl = pa.table({
            id_col: batch[id_col],
            "score": pa.array(score),
        })
        tbl = tbl.filter(pa.array(score > 0))
        order = pc.sort_indices(tbl, sort_keys=[("score", "descending"),
                                                (id_col, "ascending")])
        return tbl.take(order[:k])

    partials = ds.map_batches(score_block, batch_format="pyarrow",
                              batch_size=None).take_all()
    partials.sort(key=lambda r: (-r["score"], r[id_col]))
    top = partials[:k]
    return pa.table({
        id_col: pa.array([r[id_col] for r in top], type=pa.int64()),
        "score": pa.array([r["score"] for r in top], type=pa.float64()),
        "rn": pa.array(np.arange(1, len(top) + 1, dtype=np.int64)),
    })
