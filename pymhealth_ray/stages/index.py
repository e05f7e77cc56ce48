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


def write_search_index(ds, out_dir: str, id_col: str = "doc_id",
                       text_col: str = "text",
                       num_term_buckets: int = 32,
                       num_doc_buckets: int = 16):
    """Persist a SERVING-SHAPED search index: posting lists partitioned
    by term hash (``postings-{b}.parquet``: term, doc, tf, sorted) plus
    doc lengths partitioned by doc hash (``doclen-{b}.parquet``) and a
    ``_meta.json`` with the corpus stats BM25 needs (N, total length).
    Query-time cost is then proportional to the QUERY TERMS' posting
    lists — :func:`search_conjunctive` opens only the term buckets the
    query hashes to and the doc buckets its candidates hash to, never
    the corpus. Files write atomically; the meta file commits last."""
    import json as _json
    import os

    import pyarrow.parquet as pq_mod

    from pymhealth_ray.stages.partition import _stable_bucket_of

    os.makedirs(out_dir, exist_ok=True)
    rows = explode_term_tf(ds, id_col, text_col)

    def drop_empty(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.not_equal(batch["term"], ""))

    rows = rows.map_batches(drop_empty, batch_format="pyarrow")

    def write_term_bucket(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = int(tbl["__bucket"][0].as_py())
        tbl = tbl.drop_columns(["__bucket"])
        tbl = tbl.take(pc.sort_indices(
            tbl, sort_keys=[("term", "ascending"), (id_col, "ascending")]))
        name = f"postings-{b:05d}.parquet"
        tmp = os.path.join(out_dir, "." + name + ".tmp")
        pq_mod.write_table(tbl, tmp)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({"file": pa.array([name]),
                         "rows": pa.array([tbl.num_rows],
                                          type=pa.int64())})

    def tag_term(batch: pa.Table) -> pa.Table:
        b = _stable_bucket_of(batch["term"], num_term_buckets)
        return batch.append_column("__bucket",
                                   pa.array(b, type=pa.int32()))

    rows = rows.map_batches(tag_term, batch_format="pyarrow").materialize()
    rows.groupby("__bucket").map_groups(
        write_term_bucket, batch_format="pyarrow").take_all()

    # doc lengths (dl = Σ tf per doc), partitioned by doc hash
    def dl_partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by([id_col]).aggregate([("tf", "sum")])
        b = _stable_bucket_of(t[id_col], num_doc_buckets)
        return t.append_column("__dbucket", pa.array(b, type=pa.int32()))

    def write_doc_bucket(tbl: pa.Table) -> pa.Table:
        b = int(tbl["__dbucket"][0].as_py())
        tbl = tbl.drop_columns(["__dbucket"])
        tbl = tbl.group_by([id_col]).aggregate([("tf_sum", "sum")])
        tbl = pa.table({id_col: tbl[id_col], "dl": tbl["tf_sum_sum"]})
        name = f"doclen-{b:05d}.parquet"
        tmp = os.path.join(out_dir, "." + name + ".tmp")
        pq_mod.write_table(tbl, tmp)
        return_row = pa.table({
            "file": pa.array([name]),
            "n_docs": pa.array([tbl.num_rows], type=pa.int64()),
            "total_len": pa.array(
                [int(np.sum(tbl["dl"].to_numpy(zero_copy_only=False)))],
                type=pa.int64())})
        os.replace(tmp, os.path.join(out_dir, name))
        return return_row

    stats = rows.map_batches(dl_partial, batch_format="pyarrow",
                             batch_size=None).groupby(
        "__dbucket").map_groups(write_doc_bucket,
                                batch_format="pyarrow").take_all()
    meta = {"n_docs": int(sum(r["n_docs"] for r in stats)),
            "total_len": int(sum(r["total_len"] for r in stats)),
            "num_term_buckets": num_term_buckets,
            "num_doc_buckets": num_doc_buckets}
    tmp = os.path.join(out_dir, "_meta.json.tmp")
    with open(tmp, "w") as f:
        _json.dump(meta, f)
    os.replace(tmp, os.path.join(out_dir, "_meta.json"))
    return meta


def search_conjunctive(out_dir: str, terms, k: int = 10,
                       id_col: str = "doc_id"):
    """Conjunctive (AND) BM25 top-k over a :func:`write_search_index`
    layout: open ONLY the term buckets the query terms hash to, keep
    only their postings (bounded by the query's posting lists — the
    serving-time invariant), intersect to candidates, read candidate
    doc lengths from their doc buckets only, and score with the same
    k1=1.5 / b=0.75 BM25 the corpus-wide ranker uses (sum over terms
    in sorted-term order; ranking key = round(score, 6), doc id
    tie-break). Returns a pa.Table (doc_id, score, rn)."""
    import json as _json
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq_mod

    from pymhealth_ray.stages.partition import _stable_bucket_of

    with open(os.path.join(out_dir, "_meta.json")) as f:
        meta = _json.load(f)
    terms = sorted(set(terms))
    tarr = pa.array(terms, type=pa.string())
    tbuckets = sorted(set(
        _stable_bucket_of(tarr, meta["num_term_buckets"]).tolist()))
    posts = []
    for b in tbuckets:
        p = os.path.join(out_dir, f"postings-{b:05d}.parquet")
        if not os.path.exists(p):
            continue
        t = pq_mod.read_table(p)
        posts.append(t.filter(pc.is_in(t["term"], value_set=tarr)))
    empty = pa.table({id_col: pa.array([], type=pa.int64()),
                      "score": pa.array([], type=pa.float64()),
                      "rn": pa.array([], type=pa.int64())})
    if not posts:
        return empty
    post = pa.concat_tables(posts).combine_chunks()
    term_v = np.asarray(post["term"].to_pylist(), dtype=object)
    doc_v = post[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    tf_v = post["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
    # df per term + conjunctive candidates
    present, df = np.unique(term_v, return_counts=True)
    if len(present) < len(terms):
        return empty  # some term matches nothing: AND is empty
    docs, n_terms_per_doc = np.unique(doc_v, return_counts=True)
    cand = docs[n_terms_per_doc == len(terms)]
    if not len(cand):
        return empty
    # candidate doc lengths from the pruned doc buckets
    carr = pa.array(cand, type=pa.int64())
    dbuckets = sorted(set(
        _stable_bucket_of(carr, meta["num_doc_buckets"]).tolist()))
    dls = []
    for b in dbuckets:
        t = pq_mod.read_table(
            os.path.join(out_dir, f"doclen-{b:05d}.parquet"))
        dls.append(t.filter(pc.is_in(t[id_col], value_set=carr)))
    dlt = pa.concat_tables(dls).combine_chunks()
    dl_doc = dlt[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    dl_v = dlt["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
    o = np.argsort(dl_doc)
    dl_of = dl_v[o][np.searchsorted(dl_doc[o], cand)]
    n = float(meta["n_docs"])
    avgdl = float(meta["total_len"]) / n
    idf = {t: float(np.log((n - d + 0.5) / (d + 0.5) + 1.0))
           for t, d in zip(present.tolist(), df.tolist())}
    keep = np.isin(doc_v, cand)
    score = np.zeros(len(cand), dtype=np.float64)
    cpos = np.searchsorted(cand, doc_v[keep])
    tfk = tf_v[keep].astype(np.float64)
    termk = term_v[keep]
    # accumulate per term in sorted-term order (matches the SQL ranker)
    for t in terms:
        m = termk == t
        contrib = idf[t] * (tfk[m] * 2.5) / (
            tfk[m] + 1.5 * (0.25 + 0.75 * (dl_of[cpos[m]] / avgdl)))
        score[cpos[m]] += contrib
    # DuckDB ROUND convention: half away from zero
    rs = np.sign(score) * np.floor(np.abs(score) * 1e6 + 0.5) / 1e6
    order = np.lexsort((cand, -rs))[:k]
    return pa.table({
        id_col: pa.array(cand[order]),
        "score": pa.array(rs[order]),
        "rn": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
    })
