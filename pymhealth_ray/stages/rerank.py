"""Second-stage RERANKING of retrieval candidates with a batched model —
the retrieve-then-rerank serving shape: a cheap first stage (ANN /
RRF) produces a small candidate set per query, and an expensive
cross-encoder scores (query, candidate) PAIRS in batches on an actor
pool (model loaded once per actor in ``__init__``, inference per batch
in ``__call__`` — the stateful-stage pattern from stages/multimodal.py
and stages/signal.py).

The container has no ML runtime, so the default scorer is a
DETERMINISTIC STUB (md5 of the pair key — uniform, reproducible, and
exactly expressible in SQL, which is what lets the driver gate the
whole pipeline hash-exactly). A real deployment swaps ``_load_model``
/ ``_score_pairs`` for an actual cross-encoder; every Ray-side
decision — candidate fan-in, actor-pool sizing, batch shape, rank
reassembly — is identical and is what this stage actually tests.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class CrossEncoderStub:
    """Actor: 'model' prepared once per actor; __call__ scores a batch of
    (query_id, neighbor_id) pairs. Stub score = first 8 md5 hex chars of
    ``f"{q}:{n}-{salt}"`` (compared lexicographically — no float round
    trip, so SQL reproduces it bit-for-bit)."""

    def __init__(self, salt: str = "xe"):
        self.salt = salt  # a real model would load weights here

    def __call__(self, batch: pa.Table) -> pa.Table:
        q = batch["query_id"].to_numpy(zero_copy_only=False)
        n = batch["neighbor_id"].to_numpy(zero_copy_only=False)
        s = np.array([hashlib.md5(f"{a}:{b}-{self.salt}".encode())
                      .hexdigest()[:8] for a, b in zip(q, n)], dtype=object)
        return pa.table({"query_id": batch["query_id"],
                         "neighbor_id": batch["neighbor_id"],
                         "score": pa.array(s, type=pa.string())})


def rerank_candidates(candidates: pa.Table, *, salt: str = "xe",
                      concurrency=(2, 4), batch_size: int = 4096):
    """Score every candidate pair on the actor pool and return
    (query_id, neighbor_id, score, rank) with rank = position under
    (score DESC, neighbor_id ASC) within each query. The candidate set
    is small by construction (n_queries × k), so the final rank
    assembly is a bounded driver pass."""
    import ray

    ds = ray.data.from_arrow(candidates.select(["query_id",
                                                "neighbor_id"]))
    scored = ds.map_batches(CrossEncoderStub,
                            fn_constructor_args=(salt,),
                            batch_format="pyarrow",
                            batch_size=batch_size,
                            concurrency=concurrency)
    tabs = [t for t in ray.get(scored.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return pa.table({"query_id": pa.array([], type=pa.int64()),
                         "neighbor_id": pa.array([], type=pa.int64()),
                         "score": pa.array([], type=pa.string()),
                         "rank": pa.array([], type=pa.int64())})
    tbl = pa.concat_tables(tabs)
    q = np.asarray(tbl["query_id"].to_pylist())
    n = np.asarray(tbl["neighbor_id"].to_pylist())
    s = np.asarray(tbl["score"].to_pylist(), dtype=object)
    # rank within query by (score desc, neighbor asc)
    order = np.lexsort((n, np.array([_neg_hex(x) for x in s],
                                    dtype=object), q))
    qs, ns, ss = q[order], n[order], s[order]
    rank = np.ones(len(qs), dtype=np.int64)
    for i in range(1, len(qs)):
        rank[i] = rank[i - 1] + 1 if qs[i] == qs[i - 1] else 1
    return pa.table({"query_id": pa.array(qs, type=pa.int64()),
                     "neighbor_id": pa.array(ns, type=pa.int64()),
                     "score": pa.array(ss, type=pa.string()),
                     "rank": pa.array(rank)})


_HEX_COMPLEMENT = str.maketrans("0123456789abcdef", "fedcba9876543210")


def _neg_hex(h: str) -> str:
    """Lexicographic inversion of a fixed-width hex string (descending
    sort via ascending lexsort): complement each nibble."""
    return h.translate(_HEX_COMPLEMENT)
