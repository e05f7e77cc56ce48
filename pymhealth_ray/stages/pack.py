"""Sequence packing: greedy fixed-budget packing of variable-length
tokenized sequences into training examples.

Training pipelines pack documents into fixed token budgets (e.g. 2048) to
avoid padding waste. Packing is order-dependent, so the distributed form
pins a deterministic total order — hash-bucket by id (the packing
partition), sort (id, ts) within the bucket — making the result identical
for any block layout and reproducible single-process (which is how the
driver's materialized oracle checks it).

Per bucket the greedy boundaries come from a searchsorted walk over the
length cumsum: O(#packs log n) rather than a per-row Python loop — the
loop count is the OUTPUT size, not the input size. A sequence longer than
the budget is emitted as its own (overflowing) pack rather than dropped,
flagged via ``oversize``.

Scale: one exchange of narrow (id, ts, len) rows; token payloads should
NOT be routed through packing — join the pack assignment back to the
token table (equi_join / partition-aligned map) instead of shipping
tokens, the same narrow-columns-only rule as the flagship exchange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pymhealth_ray.stages.partition import _stable_bucket_of

PACK_BITS = 32  # pack_id = bucket << 32 | seq-within-bucket


def greedy_boundaries(lens: np.ndarray, max_len: int) -> np.ndarray:
    """Greedy first-fit-in-order pack boundaries over ``lens``: returns
    ``b`` with packs ``[b[i], b[i+1])``; each pack's total <= max_len
    unless it is a single oversize sequence."""
    cs = np.concatenate(([0], np.cumsum(lens, dtype=np.int64)))
    n = len(lens)
    bounds = [0]
    while bounds[-1] < n:
        b = int(np.searchsorted(cs, cs[bounds[-1]] + max_len, side="right")) - 1
        if b <= bounds[-1]:
            b = bounds[-1] + 1  # oversize sequence packs alone
        bounds.append(b)
    return np.asarray(bounds, dtype=np.int64)


def pack_summary_for_bucket(tbl: pa.Table, bucket: int, id_col: str,
                            ts_col: str, len_col: str, max_len: int) -> pa.Table:
    """Deterministic packing of one bucket: sort (id, ts), greedy pack,
    one output row per pack."""
    import pyarrow.compute as pc

    # len as a third key: rows identical on all three are interchangeable,
    # so the summary is deterministic even with (id, ts) duplicates
    order = pc.sort_indices(tbl, sort_keys=[(id_col, "ascending"),
                                            (ts_col, "ascending"),
                                            (len_col, "ascending")])
    tbl = tbl.take(order)
    lens = tbl[len_col].to_numpy(zero_copy_only=False).astype(np.int64)
    b = greedy_boundaries(lens, max_len)
    starts, ends = b[:-1], b[1:]
    n_seqs = ends - starts
    cs = np.concatenate(([0], np.cumsum(lens)))
    totals = cs[ends] - cs[starts]
    pack_id = (np.int64(bucket) << PACK_BITS) | np.arange(len(starts), dtype=np.int64)
    return pa.table({
        "pack_id": pa.array(pack_id),
        "n_seqs": pa.array(n_seqs),
        "tok_total": pa.array(totals),
        "oversize": pa.array(totals > max_len),
    })


def pack_sequences(ds, id_col: str = "doc_id", ts_col: str = "ts_ns",
                   len_col: str = "n_tok", max_len: int = 2048,
                   num_buckets: int = 32):
    """Distributed packing summary: one row per produced pack
    (pack_id, n_seqs, tok_total, oversize). Deterministic and
    block-layout-invariant (see module doc)."""
    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.select([id_col, ts_col, len_col])
        b = _stable_bucket_of(batch[id_col], num_buckets)
        return batch.append_column("__packbucket", pa.array(b, type=pa.int32()))

    def per_bucket(tbl: pa.Table) -> pa.Table:
        bucket = int(tbl["__packbucket"][0].as_py())
        return pack_summary_for_bucket(
            tbl.drop_columns(["__packbucket"]), bucket, id_col, ts_col,
            len_col, max_len)

    return ds.map_batches(tag, batch_format="pyarrow").groupby(
        "__packbucket").map_groups(per_bucket, batch_format="pyarrow")


def pack_expected(ids, tss, lens, max_len: int = 2048, num_buckets: int = 32):
    """Single-process reference (oracle): identical bucket assignment,
    order, and greedy walk — must equal the distributed form exactly."""
    import pandas as pd

    buckets = np.asarray(_stable_bucket_of(pa.array(ids), num_buckets))
    frames = []
    for b in np.unique(buckets):
        m = buckets == b
        tbl = pa.table({"id": pa.array(np.asarray(ids)[m]),
                        "ts": pa.array(np.asarray(tss)[m]),
                        "len": pa.array(np.asarray(lens)[m])})
        frames.append(pack_summary_for_bucket(tbl, int(b), "id", "ts", "len",
                                              max_len).to_pandas())
    return pd.concat(frames, ignore_index=True)


def pack_assignments_for_bucket(tbl: pa.Table, bucket: int, id_col: str,
                                ts_col: str, len_col: str, max_len: int) -> pa.Table:
    """Like :func:`pack_summary_for_bucket` but emits one row per INPUT
    sequence with its assigned pack_id (join this back to the payload
    table instead of routing payloads through packing)."""
    import pyarrow.compute as pc

    order = pc.sort_indices(tbl, sort_keys=[(id_col, "ascending"),
                                            (ts_col, "ascending"),
                                            (len_col, "ascending")])
    tbl = tbl.take(order)
    lens = tbl[len_col].to_numpy(zero_copy_only=False).astype(np.int64)
    b = greedy_boundaries(lens, max_len)
    n_seqs = b[1:] - b[:-1]
    pack_idx = np.repeat(np.arange(len(n_seqs), dtype=np.int64), n_seqs)
    pack_id = (np.int64(bucket) << PACK_BITS) | pack_idx
    return tbl.append_column("pack_id", pa.array(pack_id))


def pack_assignments(ds, id_col: str = "doc_id", ts_col: str = "ts_ns",
                     len_col: str = "n_tok", max_len: int = 2048,
                     num_buckets: int = 32, extra_cols=(), group_cols=()):
    """Distributed per-sequence pack assignment: input columns (+``extra_cols``)
    plus ``pack_id``. Same deterministic order and bucketing as
    :func:`pack_sequences`. ``group_cols``: extra partition keys — packing
    runs independently per (group, bucket) in ONE exchange, e.g. a
    train/eval split column instead of two per-split passes."""
    group_cols = list(group_cols)
    keep = [id_col, ts_col, len_col]
    for c in list(extra_cols) + group_cols:
        if c not in keep:
            keep.append(c)

    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.select(keep)
        b = _stable_bucket_of(batch[id_col], num_buckets)
        return batch.append_column("__packbucket", pa.array(b, type=pa.int32()))

    def per_bucket(tbl: pa.Table) -> pa.Table:
        bucket = int(tbl["__packbucket"][0].as_py())
        return pack_assignments_for_bucket(
            tbl.drop_columns(["__packbucket"]), bucket, id_col, ts_col,
            len_col, max_len)

    return ds.map_batches(tag, batch_format="pyarrow").groupby(
        group_cols + ["__packbucket"]).map_groups(
        per_bucket, batch_format="pyarrow")


def length_histogram(ds, len_col: str = "n_tok"):
    """Power-of-two length-bucket histogram with padding waste — the
    dynamic-batching planning op: bucket ``b`` holds lengths in
    ``[2^b, 2^(b+1))``; ``pad_waste`` is the total padding a pad-to-bucket-
    cap batcher would burn (``2^(b+1) - n`` per sequence).

    Buckets come from ``np.frexp`` exponents (pure integer arithmetic, no
    libm ``log2`` — exact at every power of two, matching SQL
    ``floor(log2(n))``). Per-block partials collapse to ≤64 rows each, so
    the exchange is a few KB regardless of corpus size. Zero-length rows
    are excluded (no bucket).
    """

    def partial(batch: pa.Table) -> pa.Table:
        n = batch[len_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = n[n > 0]
        _, e = np.frexp(n.astype(np.float64))
        bucket = (e - 1).astype(np.int64)
        uniq, idx = np.unique(bucket, return_inverse=True)
        cnt = np.bincount(idx).astype(np.int64)
        waste = np.bincount(idx, weights=(1 << (bucket + 1)) - n).astype(np.int64)
        n_min = np.full(len(uniq), np.iinfo(np.int64).max)
        np.minimum.at(n_min, idx, n)
        n_max = np.zeros(len(uniq), dtype=np.int64)
        np.maximum.at(n_max, idx, n)
        return pa.table({
            "bucket": pa.array(uniq), "n_seqs": pa.array(cnt),
            "n_min": pa.array(n_min.astype(np.int64)),
            "n_max": pa.array(n_max),
            "pad_waste": pa.array(waste),
        })

    def merge(tbl: pa.Table) -> pa.Table:
        out = tbl.group_by("bucket").aggregate(
            [("n_seqs", "sum"), ("n_min", "min"), ("n_max", "max"),
             ("pad_waste", "sum")])
        return out.rename_columns(["bucket", "n_seqs", "n_min", "n_max",
                                   "pad_waste"])

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    # ≤64 distinct buckets exist in total: a single final group is fine
    return partials.groupby("bucket").map_groups(
        lambda t: merge(t), batch_format="pyarrow")
