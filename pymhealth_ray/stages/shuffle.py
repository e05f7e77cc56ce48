"""Deterministic global shuffle: a reproducible training-example order.

Training runs need the corpus in a shuffled order that is (a) uniform,
(b) identical across reruns and cluster sizes, and (c) cheap to extend —
appending new documents must not reshuffle old ones. Randomized
``ds.random_shuffle`` gives none of these. The keyed-hash order does:
every row's position is ``rank of (md5-hex16(key-salt), key)`` — a fixed
pseudo-random permutation of the corpus, the same one any SQL engine
computes with ``row_number() OVER (ORDER BY substr(md5(key||'-'||salt),
1, 16), key) - 1`` (which is how the driver oracle checks it).

Distributed plan (one narrow exchange, exact global positions):

1. map: priority = md5-hex16(key-salt); range-bucket on the priority's
   first 4 hex digits (buckets are CONTIGUOUS priority ranges, so
   global order == (bucket, within-bucket order));
2. groupby(bucket) -> sort (priority, key) within bucket -> within-bucket
   rank. Only (key, priority, bucket [, extras]) cross the exchange —
   payloads stay put and are joined back by key downstream;
3. bucket row-counts (num_buckets values) -> driver exclusive prefix-sum
   -> broadcast offsets; position = offset[bucket] + rank.

Step 3's driver state is O(num_buckets), not O(rows); the ranked narrow
table is materialized once so the count pass does not recompute the sort.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from pymhealth_ray.stages.sample import _hexn

BUCKET_HEX = 4  # range-bucket on the first 4 hex digits (65536 ranges)


def shuffle_positions(ds, key_col: str, salt: str = "0",
                      num_buckets: int = 256, extra_cols=(),
                      pos_name: str = "pos"):
    """Assign each row its global position in the deterministic shuffled
    order (0-based, dense). Returns (key_col, *extra_cols, pos). ``key_col``
    must be row-unique (ties share a priority but the key tie-break keeps
    the order total)."""
    if not 1 <= num_buckets <= 16**BUCKET_HEX:
        raise ValueError(f"num_buckets must be in [1, {16**BUCKET_HEX}]")
    keep = [key_col] + list(extra_cols)

    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.select(keep)
        pri = _hexn(batch[key_col], salt, 16)
        prefix = np.array([int(p[:BUCKET_HEX], 16) for p in pri], dtype=np.int64)
        bucket = prefix * num_buckets // (16**BUCKET_HEX)
        batch = batch.append_column("__pri", pa.array(pri.tolist(), type=pa.string()))
        return batch.append_column("__shbucket", pa.array(bucket.astype(np.int32)))

    def rank_bucket(tbl: pa.Table) -> pa.Table:
        order = pc.sort_indices(tbl, sort_keys=[("__pri", "ascending"),
                                                (key_col, "ascending")])
        tbl = tbl.take(order).drop_columns(["__pri"])
        return tbl.append_column(
            "__rank", pa.array(np.arange(tbl.num_rows, dtype=np.int64)))

    ranked = ds.map_batches(tag, batch_format="pyarrow").groupby(
        "__shbucket").map_groups(rank_bucket, batch_format="pyarrow").materialize()

    counts = ranked.groupby("__shbucket").count().to_pandas()
    offsets = np.zeros(num_buckets, dtype=np.int64)
    offsets[counts["__shbucket"].to_numpy()] = counts["count()"].to_numpy()
    offsets = np.concatenate(([0], np.cumsum(offsets)[:-1]))
    off_ref = ray.put(offsets)

    def finish(batch: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        b = batch["__shbucket"].to_numpy(zero_copy_only=False)
        r = batch["__rank"].to_numpy(zero_copy_only=False)
        batch = batch.drop_columns(["__shbucket", "__rank"])
        return batch.append_column(pos_name, pa.array(off[b] + r))

    return ranked.map_batches(finish, batch_format="pyarrow")


def shuffle_positions_expected(keys, salt: str = "0"):
    """Single-process reference: rank of (md5-hex16(key-salt), key)."""
    import hashlib

    keys = list(keys)
    pri = [hashlib.md5(f"{k}-{salt}".encode()).hexdigest()[:16] for k in keys]
    order = sorted(range(len(keys)), key=lambda i: (pri[i], keys[i]))
    pos = np.empty(len(keys), dtype=np.int64)
    pos[order] = np.arange(len(keys), dtype=np.int64)
    return pos
