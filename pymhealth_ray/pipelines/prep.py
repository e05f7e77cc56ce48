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

Scale notes: no unbounded driver-side state. The non-canonical drop set
is applied through ``stages/dropset.filter_by_keys`` — broadcast only
under its key threshold, bloom-prefiltered co-partitioned anti-join in
the cluster above it — so dup-heavy corpora (where the label count grows
linearly with corpus size) never collect labels to the driver.

Execution shape (round-3 rework): the minhash signature is computed in the
SAME map pass as the quality filter + md5 and carried through the
exact-dedup exchange (``exact_dedup(carry_cols=["minhash"])``), so the one
materialized artifact (doc_id, text, minhash) feeds the LSH band explode,
the verify path, AND the survivor stream — the separate shingling pass and
its materialize are gone. (Tradeoff: signatures are also computed for rows
exact-dedup then drops; worth it unless the exact-dup ratio is extreme.)
Packing runs per (split, bucket) in ONE exchange instead of two per-split
passes. Results are hash-identical to the staged form (every stage is
deterministic), only the number of executions changes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pymhealth_ray.stages.dedup import (
    _cached_minhasher,
    exact_dedup,
    minhash_lsh_dupes,
)
from pymhealth_ray.stages.dropset import filter_by_keys
from pymhealth_ray.stages.graph import connected_components
from pymhealth_ray.stages.pack import pack_assignments
from pymhealth_ray.stages.sample import split_train_eval


def corpus_prep(docs, *, min_chars: int = 100, jaccard_threshold: float = 0.5,
                eval_fraction: float = 0.1, salt: str = "s",
                max_len: int = 2048, num_buckets: int = 32,
                tok_per_char: int = 4, num_hashes: int = 64,
                shingle_k: int = 5,
                drop_broadcast_threshold: int | None = None):
    """Run the full prep chain; returns a Dataset with one row per surviving
    document: (doc_id, split, est_tok, pack_id).

    ``drop_broadcast_threshold`` overrides stages/dropset's broadcast-vs-
    bloom-exchange switch for the cluster-drop step (0 forces the
    above-threshold bloom plan; results are exact under either plan)."""

    def quality_sig(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater_equal(b["n_chars"], min_chars)).drop_columns(
            ["n_chars"])
        return _cached_minhasher("text", num_hashes, shingle_k)(b)

    q = docs.map_batches(quality_sig, batch_format="pyarrow",
                         batch_size=None)
    d1 = exact_dedup(q, keep_payload=True, carry_cols=["minhash"]).map_batches(
        lambda b: b.select(["doc_id", "text", "minhash"]),
        batch_format="pyarrow").materialize()
    pairs = minhash_lsh_dupes(d1, jaccard_threshold=jaccard_threshold,
                              num_hashes=num_hashes, shingle_k=shingle_k,
                              sig_ds=d1)
    labels = connected_components(pairs, "id_a", "id_b",
                                  num_buckets=num_buckets)
    # non-canonical members of every dup cluster; the drop SET stays in the
    # cluster — stages/dropset.py broadcasts only under its key threshold and
    # switches to the bloom-prefiltered co-partitioned anti-join above it
    # (round-3 VERDICT: driver-collected labels grow linearly on dup-heavy
    # corpora)
    drop_keys = labels.map_batches(
        lambda b: pa.table(
            {"doc_id": b.filter(pc.not_equal(b["v"], b["l"]))["v"].cast(
                pa.int64())}),
        batch_format="pyarrow")
    fk_kwargs = {} if drop_broadcast_threshold is None else \
        {"broadcast_threshold": drop_broadcast_threshold}
    d2 = filter_by_keys(d1, "doc_id", drop_keys, keep=False,
                        num_buckets=num_buckets, **fk_kwargs)
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

    sized = d3.map_batches(lenify, batch_format="pyarrow")
    out = pack_assignments(sized, id_col="doc_id", ts_col="z",
                           len_col="est_tok", max_len=max_len,
                           num_buckets=num_buckets, extra_cols=["split"],
                           group_cols=["split"])

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"],
            "split": b["split"],
            "est_tok": b["est_tok"],
            "pack_id": b["pack_id"],
        })

    return out.map_batches(finish, batch_format="pyarrow")
