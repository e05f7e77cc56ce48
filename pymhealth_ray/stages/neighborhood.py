"""Sorted-neighborhood blocking: candidate pairs within a rank window of
a global sort order.

The classic entity-resolution blocking method (Hernández & Stolfo's
sorted-neighborhood): sort the corpus by a blocking key, then every pair
of records within ``window`` positions of each other is a candidate for
expensive pairwise matching. All-pairs is O(n²); this is O(n·w).

Distributed plan — one exchange plus O(window × num_buckets) driver state:

  1. range-bucket on the numeric blocking key (contiguous value ranges, so
     global order == (bucket, within-bucket order); same invariant as
     ``stages/shuffle``);
  2. per-bucket sort by (key, id) → all SAME-bucket pairs with rank
     distance ≤ w are emitted vectorized (two shifted takes per distance);
     the first w and last w rows of each bucket (all rows when the bucket
     has ≤ 2w) are additionally emitted as boundary markers;
  3. the markers — ≤ 2·w·num_buckets narrow rows — collect to the driver,
     which emits the CROSS-bucket pairs. Correctness of the marker
     subsequence: any cross-bucket pair with true rank distance ≤ w has
     every intervening row inside a marker zone (an intervening bucket
     must hold ≤ w rows and is then fully marked), so distance in the
     marker subsequence equals true rank distance.

Value-range buckets inherit the key's skew; at scale feed ``bounds`` from
a quantile sketch instead of min/max (the exchange topology is unchanged).

Reference lineage: beyond-reference training-data surface (SURVEY §2.10);
the range-bucket + boundary-replay pattern mirrors ``stages/rangejoin``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_BUCKET = "__nbbucket"
_KIND = "__kind"  # 1 = pair row, 0 = boundary marker


def _key_bounds(ds, key_col: str):
    def mm(batch: pa.Table) -> pa.Table:
        v = batch[key_col]
        return pa.table({
            "mn": pa.array([pc.min(v).as_py()], type=pa.int64()),
            "mx": pa.array([pc.max(v).as_py()], type=pa.int64()),
        })

    rows = ds.map_batches(mm, batch_format="pyarrow",
                          batch_size=None).take_all()
    return (min(r["mn"] for r in rows), max(r["mx"] for r in rows))


def _bucket_pairs(tbl: pa.Table, key_col: str, id_col: str, window: int) -> pa.Table:
    order = pc.sort_indices(tbl, sort_keys=[(key_col, "ascending"),
                                            (id_col, "ascending")])
    tbl = tbl.take(order)
    n = tbl.num_rows
    ids = tbl[id_col]
    keys = tbl[key_col]
    bkt = tbl[_BUCKET][0].as_py() if n else -1
    out_a, out_ka, out_b, out_kb, out_d, out_kind, out_bkt = [], [], [], [], [], [], []
    for d in range(1, window + 1):
        if n <= d:
            break
        m = n - d
        out_a.append(ids.slice(0, m))
        out_ka.append(keys.slice(0, m))
        out_b.append(ids.slice(d, m))
        out_kb.append(keys.slice(d, m))
        out_d.append(pa.array(np.full(m, d, dtype=np.int64)))
        out_kind.append(pa.array(np.ones(m, dtype=np.int64)))
        out_bkt.append(pa.array(np.full(m, bkt, dtype=np.int64)))
    # boundary markers: first w and last w rows (deduped)
    zone = sorted(set(range(min(window, n))) |
                  set(range(max(n - window, 0), n)))
    if zone:
        zi = pa.array(np.array(zone, dtype=np.int64))
        m = len(zone)
        out_a.append(ids.take(zi))
        out_ka.append(keys.take(zi))
        out_b.append(ids.take(zi))
        out_kb.append(keys.take(zi))
        out_d.append(pa.array(np.zeros(m, dtype=np.int64)))
        out_kind.append(pa.array(np.zeros(m, dtype=np.int64)))
        out_bkt.append(pa.array(np.full(m, bkt, dtype=np.int64)))

    def cat(chunks, typ=None):
        if not chunks:
            return pa.array([], type=typ or pa.int64())
        return pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray)
                                 else c for c in chunks])

    return pa.table({
        "id_a": cat(out_a), "key_a": cat(out_ka),
        "id_b": cat(out_b), "key_b": cat(out_kb),
        "d": cat(out_d), _KIND: cat(out_kind), _BUCKET: cat(out_bkt),
    })


def sorted_neighborhood_pairs(ds, key_col: str, id_col: str,
                              window: int = 2, num_buckets: int = 32,
                              bounds: tuple | None = None):
    """All (id_a, id_b, key_a, key_b, d) pairs with global rank distance
    ``d ≤ window`` under ORDER BY (key, id). ``bounds`` overrides the
    min/max scan (supply quantile-based splits for skewed keys)."""
    import ray

    mn, mx = bounds if bounds is not None else _key_bounds(ds, key_col)
    span = max(mx - mn + 1, 1)

    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.select([id_col, key_col])
        v = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.clip((v - mn) * num_buckets // span, 0, num_buckets - 1)
        return pa.table({
            id_col: batch[id_col],
            key_col: batch[key_col],
            _BUCKET: pa.array(b.astype(np.int64)),
        })

    combined = (ds.map_batches(tag, batch_format="pyarrow")
                .groupby(_BUCKET)
                .map_groups(lambda t: _bucket_pairs(t, key_col, id_col, window),
                            batch_format="pyarrow")
                .materialize())

    markers = combined.map_batches(
        lambda b: b.filter(pc.equal(b[_KIND], 0)),
        batch_format="pyarrow").take_all()
    markers.sort(key=lambda r: (r[_BUCKET], r["key_a"], r["id_a"]))
    cross = {"id_a": [], "key_a": [], "id_b": [], "key_b": [], "d": []}
    for i, a in enumerate(markers):
        for j in range(i + 1, min(i + window + 1, len(markers))):
            b = markers[j]
            if b[_BUCKET] != a[_BUCKET]:
                cross["id_a"].append(a["id_a"])
                cross["key_a"].append(a["key_a"])
                cross["id_b"].append(b["id_b"])
                cross["key_b"].append(b["key_b"])
                cross["d"].append(j - i)

    pairs = combined.map_batches(
        lambda b: b.filter(pc.equal(b[_KIND], 1)).drop_columns([_KIND, _BUCKET]),
        batch_format="pyarrow")
    if cross["id_a"]:
        extra = ray.data.from_arrow(pa.table({
            "id_a": pa.array(cross["id_a"], type=pa.int64()),
            "key_a": pa.array(cross["key_a"], type=pa.int64()),
            "id_b": pa.array(cross["id_b"], type=pa.int64()),
            "key_b": pa.array(cross["key_b"], type=pa.int64()),
            "d": pa.array(cross["d"], type=pa.int64()),
        }))
        pairs = pairs.union(extra)
    return pairs
