"""Ordered per-group sequence collection (distributed ``collect_list``).

Builds, for every group (user, entity, session …), the concatenation of a
value column in event order — the op behind "turn an event log into
per-user training sequences" for sequence models. Plan:

  one bucket exchange on the group key (every group lands wholly in one
  bucket) → per-bucket sort by (group, order, tiebreak) → ListArray over
  the segment offsets → ``pc.binary_join`` (vectorized string join; no
  per-row Python) → per-group digest.

Only the named columns cross the exchange; the join itself is an Arrow
kernel, so the per-bucket Python cost is O(groups), not O(rows).

Reference lineage: the reference's per-subject array pipelines
(`/root/reference/src/mhealth/generic/window.py` operates on one subject's
arrays at a time); this is the corpus-scale generalization that produces
those per-subject arrays from a row stream.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pymhealth_ray.stages.partition import entity_segments, grouped_by_bucket


def _segment_join(values: pa.Array, starts: np.ndarray, sep: str) -> pa.Array:
    """Join each segment ``starts[k]:starts[k+1]`` of a string array with
    ``sep`` via one vectorized ``binary_join`` over a ListArray view."""
    offsets = pa.array(starts, type=pa.int32())
    lists = pa.ListArray.from_arrays(offsets, values.cast(pa.string()))
    return pc.binary_join(lists, sep)


def grouped_ordered_collect(
    ds,
    group_col: str,
    order_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
    sep: str = ",",
    num_buckets: int = 32,
    keep_seq: bool = False,
):
    """Per group: ``n`` rows, ``n_distinct`` values, ``first_<order>`` /
    ``last_<order>``, and ``seq_md5`` (md5 of the sep-joined value column in
    (order, tiebreak) order). ``keep_seq=True`` also carries the joined
    sequence string for downstream stages."""

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl, starts, n_grp = entity_segments(tbl, group_col, order_col,
                                             tiebreak_col)
        if n_grp == 0:
            cols = {
                group_col: tbl[group_col],
                "n": pa.array([], type=pa.int64()),
                "n_distinct": pa.array([], type=pa.int64()),
                "first_ord": tbl[order_col],
                "last_ord": tbl[order_col],
                "seq_md5": pa.array([], type=pa.string()),
            }
            if keep_seq:
                cols["seq"] = pa.array([], type=pa.string())
            return pa.table(cols)
        vals = tbl[value_col]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        joined = _segment_join(vals, starts, sep)
        md5s = [hashlib.md5(s.encode()).hexdigest()
                for s in joined.to_pylist()]
        # distinct values per segment: sort codes within segments, count steps
        codes = vals.dictionary_encode().indices.to_numpy(zero_copy_only=False).astype(np.int64)
        seg_id = np.repeat(np.arange(n_grp, dtype=np.int64), np.diff(starts))
        order = np.lexsort((codes, seg_id))
        cs, ss = codes[order], seg_id[order]
        new = np.ones(len(cs), dtype=np.int64)
        new[1:] = (cs[1:] != cs[:-1]) | (ss[1:] != ss[:-1])
        n_distinct = np.bincount(ss, weights=new, minlength=n_grp).astype(np.int64)
        head = starts[:-1]
        tail = starts[1:] - 1
        cols = {
            group_col: tbl[group_col].take(pa.array(head)),
            "n": pa.array(np.diff(starts)),
            "n_distinct": pa.array(n_distinct),
            "first_ord": tbl[order_col].take(pa.array(head)),
            "last_ord": tbl[order_col].take(pa.array(tail)),
            "seq_md5": pa.array(md5s, type=pa.string()),
        }
        if keep_seq:
            cols["seq"] = joined
        return pa.table(cols)

    return grouped_by_bucket(ds, per_bucket, entity_col=group_col,
                             num_buckets=num_buckets)


def grouped_head_collect(
    ds,
    group_col: str,
    order_col: str,
    value_col: str,
    k: int,
    tiebreak_col: str | None = None,
    sep: str = ">",
    out: str = "journey",
    num_buckets: int = 32,
):
    """Per group: the sep-joined FIRST-k values in (order, tiebreak) order
    plus ``n_first = min(n, k)`` — SQL ``string_agg(v, sep ORDER BY o)
    FILTER (row_number() <= k)``. Same one-exchange plan as
    :func:`grouped_ordered_collect`; the head clip is pure offset
    arithmetic (segment ends clamped to start+k before the vectorized
    ListArray join)."""

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl, starts, n_grp = entity_segments(tbl, group_col, order_col,
                                             tiebreak_col)
        if n_grp == 0:
            return pa.table({
                group_col: tbl[group_col],
                out: pa.array([], type=pa.string()),
                "n_first": pa.array([], type=pa.int64()),
            })
        vals = tbl[value_col]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        head = starts[:-1]
        ends = np.minimum(starts[1:], head + k)
        # compact the kept rows so one flat ListArray covers them
        # (vectorized gather: no per-group Python)
        keep_len = ends - head
        new_starts = np.concatenate(([0], np.cumsum(keep_len)))
        total = int(new_starts[-1])
        keep_idx = (np.repeat(head, keep_len)
                    + (np.arange(total, dtype=np.int64)
                       - np.repeat(new_starts[:-1], keep_len)))
        kept = vals.take(pa.array(keep_idx))
        joined = _segment_join(kept, new_starts, sep)
        return pa.table({
            group_col: tbl[group_col].take(pa.array(head)),
            out: joined,
            "n_first": pa.array(ends - head),
        })

    return grouped_by_bucket(ds, per_bucket, entity_col=group_col,
                             num_buckets=num_buckets)
