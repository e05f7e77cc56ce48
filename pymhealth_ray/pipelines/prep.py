"""Composed training-data prep pipeline as a reusable, job-submittable unit.

``corpus_prep`` chains the curation stages end-to-end over a documents
Dataset (columns ``doc_id:int64, text:string, n_chars``):

    quality filter -> exact dedup -> near-dup CLUSTER drop
    (MinHash-LSH pairs -> connected components -> keep min doc per
    component) -> deterministic train/eval split -> greedy packing into
    fixed token budgets.

Every stage is deterministic and partitioning-invariant, so the same
chain run single-process is a hash-exact oracle (see
``pipelines.queries.q_docs_prep_pipeline``, which is this function plus a
column-ordering finish).

Scale notes: the only driver-side state is the non-canonical drop set
(bounded by the verified near-dup pair count — the LSH bucket caps bound
it) which is broadcast via ``ray.put`` once; everything else streams.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from pymhealth_ray.stages.dedup import exact_dedup, minhash_lsh_dupes
from pymhealth_ray.stages.graph import connected_components
from pymhealth_ray.stages.pack import pack_assignments
from pymhealth_ray.stages.sample import split_train_eval


def corpus_prep(docs, *, min_chars: int = 100, jaccard_threshold: float = 0.5,
                eval_fraction: float = 0.1, salt: str = "s",
                max_len: int = 2048, num_buckets: int = 32,
                tok_per_char: int = 4):
    """Run the full prep chain; returns a Dataset with one row per surviving
    document: (doc_id, split, est_tok, pack_id)."""

    def quality(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b["n_chars"], min_chars)).drop_columns(
            ["n_chars"])

    q = docs.map_batches(quality, batch_format="pyarrow")
    d1 = exact_dedup(q, keep_payload=True).map_batches(
        lambda b: b.select(["doc_id", "text"]), batch_format="pyarrow").materialize()
    pairs = minhash_lsh_dupes(d1, jaccard_threshold=jaccard_threshold)
    labels = connected_components(pairs, "id_a", "id_b",
                                  num_buckets=num_buckets).to_pandas()
    drop = pa.array(
        sorted(labels.v[labels.v != labels.l].astype("int64").tolist()),
        type=pa.int64())
    drop_ref = ray.put(drop)

    def drop_noncanon(b: pa.Table) -> pa.Table:
        return b.filter(pc.invert(pc.is_in(b["doc_id"], value_set=ray.get(drop_ref))))

    d2 = d1.map_batches(drop_noncanon, batch_format="pyarrow")
    d3 = split_train_eval(d2, "doc_id", eval_fraction=eval_fraction, salt=salt)

    def lenify(b: pa.Table) -> pa.Table:
        txt = b["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        est = pc.utf8_length(txt).to_numpy(zero_copy_only=False).astype(
            np.int64) // tok_per_char
        return pa.table({
            "doc_id": b["doc_id"],
            "z": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
            "est_tok": pa.array(est),
            "split": b["split"],
        })

    sized = d3.map_batches(lenify, batch_format="pyarrow").materialize()
    parts = []
    for sp in ("train", "eval"):
        side = sized.map_batches(
            lambda b, sp=sp: b.filter(pc.equal(b["split"], sp)),
            batch_format="pyarrow")
        parts.append(pack_assignments(side, id_col="doc_id", ts_col="z",
                                      len_col="est_tok", max_len=max_len,
                                      num_buckets=num_buckets,
                                      extra_cols=["split"]))
    out = parts[0].union(parts[1])

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"],
            "split": b["split"],
            "est_tok": b["est_tok"],
            "pack_id": b["pack_id"],
        })

    return out.map_batches(finish, batch_format="pyarrow")
