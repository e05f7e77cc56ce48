"""Inverted-index construction: term → posting list over a document corpus.

The retrieval-side primitive of a training-data pipeline (BM25 filtering,
decontamination lookups, term-level corpus analytics). Plan:

  1. map-only explode to one row per (term, doc_id, tf) — tf counted
     per doc inside the block, so the exchange carries one slim row per
     distinct term per doc, never raw text;
  2. one bucket exchange on the term (same `_stable_bucket_of` machinery
     as every other wide op) → per-bucket sort by (term, doc_id) →
     segment walk: df = segment length, tf = reduceat sum, posting list =
     vectorized ``binary_join`` of the doc ids in ascending order.

At 100 TB the posting lists themselves are the output (written
partitioned by term bucket); here each list is carried as an md5 digest
plus its head so the driver oracle can hash-compare compactly.

Reference lineage: beyond-reference training-data surface (SURVEY §2.10);
the reference has no corpus-level ops.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pyarrow as pa

from pymhealth_ray.stages.collect import _segment_join
from pymhealth_ray.stages.partition import entity_segments, grouped_by_bucket


def explode_term_tf(ds, id_col: str = "doc_id", text_col: str = "text"):
    """One row per (term, doc, tf). Counter per doc keeps the exchange at
    O(distinct terms per doc)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        terms, doc_ids, tfs = [], [], []
        for did, t in zip(ids, texts):
            for term, c in Counter(t.split(" ")).items():
                terms.append(term)
                doc_ids.append(did)
                tfs.append(c)
        return pa.table({
            "term": pa.array(terms, type=pa.string()),
            id_col: pa.array(doc_ids, type=pa.int64()),
            "tf": pa.array(tfs, type=pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def inverted_index(ds, id_col: str = "doc_id", text_col: str = "text",
                   min_df: int = 1, num_buckets: int = 32):
    """Per term: ``df`` (docs containing it), ``tf`` (total occurrences),
    ``postings_md5`` (md5 of the comma-joined ascending doc-id list) and
    ``first_docs`` (head of the posting list, human-checkable)."""

    rows = explode_term_tf(ds, id_col, text_col)

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl, starts, n_term = entity_segments(tbl, "term", id_col)
        if n_term == 0:
            return pa.table({
                "term": pa.array([], type=pa.string()),
                "df": pa.array([], type=pa.int64()),
                "tf": pa.array([], type=pa.int64()),
                "postings_md5": pa.array([], type=pa.string()),
                "first_docs": pa.array([], type=pa.string()),
            })
        tf = tbl["tf"]
        if isinstance(tf, pa.ChunkedArray):
            tf = tf.combine_chunks()
        tf_np = tf.to_numpy(zero_copy_only=False)
        df = np.diff(starts)
        tf_sum = np.add.reduceat(tf_np, starts[:-1])
        doc_str = tbl[id_col].cast(pa.string())
        if isinstance(doc_str, pa.ChunkedArray):
            doc_str = doc_str.combine_chunks()
        joined = _segment_join(doc_str, starts, ",")
        postings = joined.to_pylist()
        md5s = [hashlib.md5(s.encode()).hexdigest() for s in postings]
        heads = [",".join(s.split(",", 5)[:5]) for s in postings]
        out = pa.table({
            "term": tbl["term"].take(pa.array(starts[:-1])),
            "df": pa.array(df),
            "tf": pa.array(tf_sum.astype(np.int64)),
            "postings_md5": pa.array(md5s, type=pa.string()),
            "first_docs": pa.array(heads, type=pa.string()),
        })
        if min_df > 1:
            out = out.filter(pa.array(df >= min_df))
        return out

    return grouped_by_bucket(rows, per_bucket, entity_col="term",
                             num_buckets=num_buckets)
