"""Event-time window aggregation — the engine-defining operator.

Distributed re-expression of ``nonuniform_rolling_apply`` / ``get_indices``
(reference:util/windows.py:162-220, oracle: pymhealth_ray.functions.windows):
per entity, a window-start grid ``arange(first_ts, last_ts, wstep)`` anchored
at the entity's first event, half-open ``[start, start+wsize)`` windows whose
bounds are located by ``searchsorted`` (side='left'); windows with fewer than
``min_window_len`` rows yield NaN.

Physical plan: ONE entity-bucket shuffle (stages.partition), then per bucket
a single (entity, ts) Arrow sort and vectorized per-entity aggregation —
count/sum/mean/var/std come from cumulative sums, min/max from
``ufunc.reduceat`` over interleaved [start,end) bounds (overlap-safe), any
registered scalar kernel falls back to a bounded per-window loop.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable

import numpy as np
import pyarrow as pa
import ray

from pymhealth_ray.functions import KERNELS
from pymhealth_ray.stages.partition import (
    BUCKET_COL,
    _stable_bucket_of,
    column_f64,
    column_i64,
    entity_segments,
    grouped_by_bucket,
)

#: aggregates with a fully vectorized segmented implementation
FAST_AGGS = {"count", "sum", "mean", "var", "std", "min", "max"}


def _reduceat_minmax(v: np.ndarray, si: np.ndarray, ei: np.ndarray, op) -> np.ndarray:
    """Per-window reduce over possibly-overlapping [si, ei) windows using one
    ufunc.reduceat call on interleaved bounds; empty windows → NaN."""
    n = len(si)
    out = np.full(n, np.nan)
    if n == 0 or len(v) == 0:
        return out
    nonempty = ei > si
    if not nonempty.any():
        return out
    si_ne, ei_ne = si[nonempty], ei[nonempty]
    idx = np.empty(2 * len(si_ne), dtype=np.int64)
    idx[0::2] = si_ne
    idx[1::2] = np.minimum(ei_ne, len(v) - 1)  # guard: reduceat needs idx < len
    red = op.reduceat(v, idx)[0::2]
    # windows whose end was clamped (ei == len(v)) are still correct because
    # reduceat reduces to the array end when idx[k] >= idx[k+1] is False and
    # the final slot runs to the end; handle the exact semantics below:
    # reduceat slot k covers [idx[2k], idx[2k+1]) unless idx[2k] >= idx[2k+1],
    # in which case it yields v[idx[2k]]. For ei == len(v) the pair is
    # (si, len-1) which drops the final element — patch those windows.
    clipped = ei_ne == len(v)
    if clipped.any():
        red = red.copy()
        red[clipped] = op(red[clipped], v[-1])
    # pairs where si == ei-? empty handled by mask; pairs with si >= len-1 fine
    out[nonempty] = red
    return out


def _reduceat_sum(v: np.ndarray, si: np.ndarray, ei: np.ndarray) -> np.ndarray:
    """Fresh per-window sums over (possibly overlapping) [si, ei) bounds via
    one np.add.reduceat on interleaved pairs — avoids the absolute error
    floor of cumulative-sum differencing (degenerate windows sum exactly)."""
    n = len(si)
    out = np.zeros(n)
    if n == 0 or len(v) == 0:
        return out
    nonempty = ei > si
    if not nonempty.any():
        return out
    si_ne, ei_ne = si[nonempty], ei[nonempty]
    idx = np.empty(2 * len(si_ne), dtype=np.int64)
    idx[0::2] = si_ne
    idx[1::2] = np.minimum(ei_ne, len(v) - 1)
    red = np.add.reduceat(v, idx)[0::2]
    clipped = ei_ne == len(v)
    if clipped.any():
        red = red.copy()
        # pair (si, len-1): when si == len-1 reduceat returned v[-1] already
        add_tail = clipped & (si_ne < len(v) - 1)
        red[add_tail] = red[add_tail] + v[-1]
    out[nonempty] = red
    return out


def _window_bounds(ts: np.ndarray, wsize: int, wstep: int):
    """Exact get_indices semantics for one entity (ts sorted int64 ns)."""
    starts = np.arange(ts[0], ts[-1], wstep)
    si = np.searchsorted(ts, starts, side="left")
    ei = np.searchsorted(ts, starts + wsize, side="left")
    return starts, si, ei


def compute_entity_windows(
    ts: np.ndarray,
    values: Dict[str, np.ndarray],
    wsize: int,
    wstep: int,
    aggs: Dict[str, tuple],
    min_window_len: int = 1,
    emit_empty: bool = True,
    starts: np.ndarray | None = None,
):
    """Aggregate one entity's sorted stream. ``aggs`` maps output column name
    → (value_col, agg_name_or_callable). Returns (window_start_ts, out_cols,
    counts) or None when the grid is empty (single-event entities produce no
    windows, exactly like ``arange(t, t, step)`` — reference:util/windows.py:175).

    ``starts`` overrides the locally-derived grid — the salted path passes
    the globally-anchored grid slice for one hot-entity time chunk.
    """
    if starts is None:
        if len(ts) == 0 or ts[0] == ts[-1]:
            return None
        starts, si, ei = _window_bounds(ts, wsize, wstep)
    else:
        if len(ts) == 0:
            return None
        si = np.searchsorted(ts, starts, side="left")
        ei = np.searchsorted(ts, starts + wsize, side="left")
    if len(starts) == 0:
        return None
    cnt = (ei - si).astype(np.int64)
    small = cnt < min_window_len

    out_cols: Dict[str, np.ndarray] = {}
    cumsums: Dict[str, np.ndarray] = {}
    centers: Dict[str, np.ndarray] = {}

    def cs_of(col):
        if col not in cumsums:
            cumsums[col] = np.concatenate([[0.0], np.cumsum(values[col])])
        return cumsums[col]

    def centered_of(col):
        # centered by the entity mean: kills the catastrophic cancellation of
        # the naive E[x^2]-E[x]^2 one-pass (a 1-element window is exactly 0)
        if col not in centers:
            c = float(values[col].mean()) if len(values[col]) else 0.0
            centers[col] = values[col] - c
        return centers[col]

    fcnt = cnt.astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        for name, (col, agg) in aggs.items():
            if agg == "count":
                res = fcnt.copy()
            elif callable(agg) or agg not in FAST_AGGS:
                fn = agg if callable(agg) else KERNELS[agg]
                v = values[col]
                res = np.full(len(starts), np.nan)
                for i in range(len(starts)):
                    if cnt[i] >= max(min_window_len, 1):
                        res[i] = fn(v[si[i] : ei[i]])
            elif agg == "min":
                res = _reduceat_minmax(values[col], si, ei, np.minimum)
            elif agg == "max":
                res = _reduceat_minmax(values[col], si, ei, np.maximum)
            else:
                cs = cs_of(col)
                s1 = cs[ei] - cs[si]
                if agg == "sum":
                    res = s1
                elif agg == "mean":
                    res = s1 / fcnt
                else:  # var / std (population, ddof=0 — reference convention)
                    vc = centered_of(col)
                    s1c = _reduceat_sum(vc, si, ei)
                    s2c = _reduceat_sum(vc * vc, si, ei)
                    m2 = np.maximum(s2c / fcnt - (s1c / fcnt) ** 2, 0.0)
                    res = m2 if agg == "var" else np.sqrt(m2)
            res = np.asarray(res, dtype=np.float64)
            res[small] = np.nan
            out_cols[name] = res

    if not emit_empty:
        keep = cnt > 0
        starts = starts[keep]
        cnt = cnt[keep]
        out_cols = {k: v[keep] for k, v in out_cols.items()}
    return starts, out_cols, cnt


def window_features(
    ds,
    wsize_ns: int,
    wstep_ns: int | None = None,
    aggs: Dict[str, tuple] | None = None,
    entity_col: str = "doc_id",
    ts_col: str = "ts_ns",
    min_window_len: int = 1,
    emit_empty: bool = True,
    num_buckets: int = 64,
    salt_threshold: int | None = None,
    salt_span_ns: int | None = None,
):
    """Event-time window aggregation over the whole dataset.

    ``aggs``: {output_name: (value_col, agg)} where agg ∈ FAST_AGGS, a name
    in functions.KERNELS, or any callable f(np.ndarray)->float (the engine's
    pass-any-kernel extension surface, mirroring
    reference:util/windows.py:181's factory API). Multiple aggregates share
    one grid/searchsorted pass per entity (the list/dict variants,
    reference:util/windows.py:223-249).

    Output: one row per (entity, window_start): ``entity_col``,
    ``window_start_ns``, ``n_in_window`` + one column per agg.

    ``salt_threshold``: entities with more rows than this are SALTED — their
    streams split into time chunks of ``salt_span_ns`` (default 16×wsize)
    spread across buckets, with an overlap-replay of the leading ``wsize``
    of each chunk into the previous chunk's bucket so every window still
    sees its full row range (windows are pure functions of [start,
    start+wsize) — SURVEY.md §7 hard parts). Grid anchoring stays global:
    each entity's (first_ts, last_ts) comes from a cheap pre-aggregation
    broadcast to all tasks.
    """
    if wstep_ns is None:
        wstep_ns = wsize_ns  # tumbling by default
    if aggs is None:
        aggs = {"value_mean": ("value", "mean")}
    value_cols = sorted({col for col, _ in aggs.values()})

    if salt_threshold is not None:
        return _window_features_salted(
            ds, wsize_ns, wstep_ns, aggs, value_cols, entity_col, ts_col,
            min_window_len, emit_empty, num_buckets, salt_threshold,
            salt_span_ns or 16 * wsize_ns,
        )

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl, starts, n_ent = entity_segments(tbl, entity_col, ts_col)
        ts_all = column_i64(tbl, ts_col)
        vals_all = {c: column_f64(tbl, c) for c in value_cols}
        ent_arr = tbl[entity_col]
        if isinstance(ent_arr, pa.ChunkedArray):
            ent_arr = ent_arr.combine_chunks()

        out_entity_idx = []
        out_ts = []
        out_cnt = []
        out_feats: Dict[str, list] = {name: [] for name in aggs}
        for k in range(n_ent):
            lo, hi = starts[k], starts[k + 1]
            res = compute_entity_windows(
                ts_all[lo:hi],
                {c: v[lo:hi] for c, v in vals_all.items()},
                wsize_ns,
                wstep_ns,
                aggs,
                min_window_len,
                emit_empty,
            )
            if res is None:
                continue
            w_starts, cols, cnt = res
            out_entity_idx.append(np.full(len(w_starts), lo, dtype=np.int64))
            out_ts.append(w_starts)
            out_cnt.append(cnt)
            for name in aggs:
                out_feats[name].append(cols[name])

        if not out_ts:
            fields = {
                entity_col: pa.array([], type=pa.string()),
                "window_start_ns": pa.array([], type=pa.int64()),
                "n_in_window": pa.array([], type=pa.int64()),
            }
            for name in aggs:
                fields[name] = pa.array([], type=pa.float64())
            return pa.table(fields)

        ent_take = pa.array(np.concatenate(out_entity_idx))
        fields = {
            entity_col: ent_arr.take(ent_take),
            "window_start_ns": pa.array(np.concatenate(out_ts).astype(np.int64)),
            "n_in_window": pa.array(np.concatenate(out_cnt)),
        }
        for name in aggs:
            fields[name] = pa.array(np.concatenate(out_feats[name]), type=pa.float64())
        return pa.table(fields)

    return grouped_by_bucket(ds, per_bucket, entity_col, num_buckets)


# --------------------------------------------------------------------------
# salted path: hot-entity time-chunk spreading with overlap-replay
# --------------------------------------------------------------------------

CHUNK_COL = "__salt_chunk"
REPLAY_COL = "__salt_replay"


def _hot_entity_stats(ds, entity_col: str, ts_col: str, threshold: int) -> dict:
    """Cheap pre-pass: per-entity (count, min_ts, max_ts) via partial
    aggregation, filtered to hot entities ONLY before collection (the hot
    set is small by definition; the aggregate output is one row per entity
    and never collects cold rows)."""
    from pymhealth_ray.stages.aggregate import grouped_stats

    stats = grouped_stats(
        ds.map_batches(lambda b: b.select([entity_col, ts_col]), batch_format="pyarrow"),
        [entity_col],
        min_cols=[ts_col],
        max_cols=[ts_col],
    )

    def hot_only(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.greater(b["n"], threshold))

    hot_tbl = pa.concat_tables(
        list(stats.map_batches(hot_only, batch_format="pyarrow").iter_batches(batch_format="pyarrow"))
        or [pa.table({entity_col: pa.array([], type=pa.string()),
                      f"{ts_col}_min": pa.array([], type=pa.int64()),
                      f"{ts_col}_max": pa.array([], type=pa.int64()),
                      "n": pa.array([], type=pa.int64())})]
    )
    return {
        e: (int(lo), int(hi))
        for e, lo, hi in zip(
            hot_tbl[entity_col].to_pylist(),
            hot_tbl[f"{ts_col}_min"].to_pylist(),
            hot_tbl[f"{ts_col}_max"].to_pylist(),
        )
    }


class _SaltedBucketizer:
    """map_batches actor: assigns buckets with hot-entity time-chunk salting
    and emits overlap-replay duplicates. Hot map fetched once per actor."""

    def __init__(self, hot_ref, entity_col, ts_col, span_ns, wsize_ns, num_buckets):
        self.hot = ray.get(hot_ref)
        self.entity_col = entity_col
        self.ts_col = ts_col
        self.span = span_ns
        self.wsize = wsize_ns
        self.num_buckets = num_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        import zlib

        n = batch.num_rows
        ent = batch[self.entity_col]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        ts = column_i64(batch, self.ts_col)
        chunk = np.full(n, -1, dtype=np.int64)
        bucket = _stable_bucket_of(ent, self.num_buckets).astype(np.int64)
        ent_list = ent.to_pylist()
        replay_rows = []
        for i, e in enumerate(ent_list):
            info = self.hot.get(e)
            if info is None:
                continue
            anchor = info[0]
            c = (ts[i] - anchor) // self.span
            chunk[i] = c
            bucket[i] = zlib.crc32(f"{e}#{c}".encode()) % self.num_buckets
            # leading-wsize rows also serve the previous chunk's windows
            if c > 0 and (ts[i] - anchor) % self.span < self.wsize:
                replay_rows.append((i, c - 1))
        batch = batch.append_column(CHUNK_COL, pa.array(chunk))
        batch = batch.append_column(REPLAY_COL, pa.array(np.zeros(n, dtype=np.int8)))
        batch = batch.append_column(BUCKET_COL, pa.array(bucket.astype(np.int32)))
        if replay_rows:
            idx = pa.array([i for i, _ in replay_rows])
            rep = batch.take(idx)
            rep_chunk = np.array([c for _, c in replay_rows], dtype=np.int64)
            rep_bucket = np.array(
                [zlib.crc32(f"{ent_list[i]}#{c}".encode()) % self.num_buckets for i, c in replay_rows],
                dtype=np.int32,
            )
            names = rep.column_names
            rep = rep.set_column(names.index(CHUNK_COL), CHUNK_COL, pa.array(rep_chunk))
            rep = rep.set_column(names.index(REPLAY_COL), REPLAY_COL, pa.array(np.ones(len(replay_rows), dtype=np.int8)))
            rep = rep.set_column(names.index(BUCKET_COL), BUCKET_COL, pa.array(rep_bucket))
            batch = pa.concat_tables([batch, rep])
        return batch


def _window_features_salted(
    ds, wsize_ns, wstep_ns, aggs, value_cols, entity_col, ts_col,
    min_window_len, emit_empty, num_buckets, salt_threshold, salt_span_ns,
):
    if salt_span_ns < 2 * wsize_ns:
        raise ValueError("salt_span_ns must be >= 2 * wsize_ns (overlap-replay bound)")
    hot = _hot_entity_stats(ds, entity_col, ts_col, salt_threshold)
    hot_ref = ray.put(hot)

    bucketed = ds.map_batches(
        _SaltedBucketizer,
        fn_constructor_args=(hot_ref, entity_col, ts_col, salt_span_ns, wsize_ns, num_buckets),
        batch_format="pyarrow",
        concurrency=(2, 8),
    )

    def per_bucket(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tbl = tbl.drop_columns([BUCKET_COL])
        order = pc.sort_indices(
            tbl,
            sort_keys=[(entity_col, "ascending"), (CHUNK_COL, "ascending"), (ts_col, "ascending")],
        )
        tbl = tbl.take(order)
        ent = tbl[entity_col]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        codes = ent.dictionary_encode().indices.to_numpy(zero_copy_only=False).astype(np.int64)
        chunks = column_i64(tbl, CHUNK_COL)
        n = len(codes)
        if n == 0:
            return _empty_window_table(entity_col, aggs)
        seg_key_change = np.empty(n, dtype=bool)
        seg_key_change[0] = True
        seg_key_change[1:] = (codes[1:] != codes[:-1]) | (chunks[1:] != chunks[:-1])
        starts_idx = np.append(np.flatnonzero(seg_key_change), n)

        ts_all = column_i64(tbl, ts_col)
        vals_all = {c: column_f64(tbl, c) for c in value_cols}

        out_entity_idx, out_ts, out_cnt = [], [], []
        out_feats = {name: [] for name in aggs}
        hot_map = hot
        for k in range(len(starts_idx) - 1):
            lo, hi = starts_idx[k], starts_idx[k + 1]
            e = ent[lo].as_py()
            c = chunks[lo]
            seg_ts = ts_all[lo:hi]
            seg_vals = {col: v[lo:hi] for col, v in vals_all.items()}
            if c < 0:
                grid = None  # cold entity: local anchoring, unchanged semantics
            else:
                anchor, last = hot_map[e]
                k_max = -((anchor - last) // wstep_ns)  # ceil((last-anchor)/wstep)
                c_lo = anchor + c * salt_span_ns
                c_hi = c_lo + salt_span_ns
                k_lo = max(0, -((anchor - c_lo) // wstep_ns))
                k_hi = min(k_max, -((anchor - c_hi) // wstep_ns))
                if k_hi <= k_lo:
                    continue
                grid = anchor + np.arange(k_lo, k_hi, dtype=np.int64) * wstep_ns
            res = compute_entity_windows(
                seg_ts, seg_vals, wsize_ns, wstep_ns, aggs, min_window_len, emit_empty, starts=grid
            )
            if res is None:
                continue
            w_starts, cols, cnt = res
            out_entity_idx.append(np.full(len(w_starts), lo, dtype=np.int64))
            out_ts.append(w_starts)
            out_cnt.append(cnt)
            for name in aggs:
                out_feats[name].append(cols[name])

        if not out_ts:
            return _empty_window_table(entity_col, aggs)
        fields = {
            entity_col: ent.take(pa.array(np.concatenate(out_entity_idx))),
            "window_start_ns": pa.array(np.concatenate(out_ts).astype(np.int64)),
            "n_in_window": pa.array(np.concatenate(out_cnt)),
        }
        for name in aggs:
            fields[name] = pa.array(np.concatenate(out_feats[name]), type=pa.float64())
        return pa.table(fields)

    grouped = bucketed.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pyarrow")
    return grouped


def _empty_window_table(entity_col: str, aggs) -> pa.Table:
    fields = {
        entity_col: pa.array([], type=pa.string()),
        "window_start_ns": pa.array([], type=pa.int64()),
        "n_in_window": pa.array([], type=pa.int64()),
    }
    for name in aggs:
        fields[name] = pa.array([], type=pa.float64())
    return pa.table(fields)


# --------------------------------------------------------------------------
# map-side combined tumbling windows: the partial-aggregation scale path
# --------------------------------------------------------------------------


def window_features_combined(
    ds,
    wsize_ns: int,
    aggs: Dict[str, tuple],
    entity_col: str = "doc_id",
    ts_col: str = "ts_ns",
    num_buckets: int = 64,
):
    """TUMBLING window aggregation with map-side combining.

    Instead of shuffling every event row into entity buckets (the general
    sort path), each input block collapses to ONE partial row per
    (entity, window) it touches; the exchange then moves |windows|·|blocks|
    partials instead of |rows| events. Measured on the 2M-row bench fixture
    (1h windows): 24.5x fewer exchanged rows when input blocks are
    entity-clustered (the bucketed ingest layout), 5.5x even on fully
    interleaved input. On this single node the raw sort is cheap enough
    that wall-time favors the sort path; on a network-bound cluster the
    exchange-volume reduction is the dominant term (BASELINE.md).

    Two phases:
    0. narrow pre-pass: per-entity (first_ts, last_ts, mean) via partial
       aggregation, broadcast via ray.put — first_ts anchors the window grid
       exactly like ``get_indices`` (reference:util/windows.py:175: grid =
       arange(first, last, wstep)); the mean centers the variance partials
       so degenerate windows stay exactly 0. (The broadcast is one entry per
       entity; for billion-entity tables this map would itself be hash-
       partitioned and co-shuffled instead — documented trade-off.)
    1. map_batches: assign k = (ts - anchor) // wsize, drop k >= n_windows
       (the arange excludes the last event's boundary window), per-batch
       numpy rollup per (entity, k) → partials (n, s1c, s2c, min, max).
    2. small groupby (entity, k): merge partials, emit the same output
       schema as :func:`window_features` with ``emit_empty=False`` (empty
       windows produce no partials by construction).

    Supported aggs: count/sum/mean/min/max/var/std. Falls back is the
    caller's job (use window_features for sliding grids or custom kernels).
    """
    for name, (col, agg) in aggs.items():
        if agg not in FAST_AGGS:
            raise ValueError(f"window_features_combined supports {FAST_AGGS}, got {agg}")
    value_cols = sorted({col for col, _ in aggs.values()})
    if len(value_cols) != 1:
        raise ValueError("combined path currently supports one value column")
    vcol = value_cols[0]

    from pymhealth_ray.stages.aggregate import grouped_stats

    # phase 0: per-entity anchor stats (narrow partial aggregation)
    pre = grouped_stats(
        ds.map_batches(lambda b: b.select([entity_col, ts_col, vcol]), batch_format="pyarrow"),
        [entity_col],
        sum_cols=[vcol],
        min_cols=[ts_col],
        max_cols=[ts_col],
    )
    ent_stats = {}
    for b in pre.iter_batches(batch_format="pyarrow"):
        for e, lo, hi, s, n in zip(
            b[entity_col].to_pylist(),
            b[f"{ts_col}_min"].to_pylist(),
            b[f"{ts_col}_max"].to_pylist(),
            b[f"{vcol}_sum"].to_pylist(),
            b["n"].to_pylist(),
        ):
            ent_stats[e] = (int(lo), int(hi), float(s) / float(n))
    stats_ref = ray.put(ent_stats)

    class Partials:
        def __init__(self):
            self.stats = ray.get(stats_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ent = batch[entity_col]
            if isinstance(ent, pa.ChunkedArray):
                ent = ent.combine_chunks()
            enc = ent.dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            uniq = enc.dictionary.to_pylist()
            ts = column_i64(batch, ts_col)
            v = column_f64(batch, vcol)
            anchors = np.empty(len(uniq), dtype=np.int64)
            lasts = np.empty(len(uniq), dtype=np.int64)
            centers = np.empty(len(uniq), dtype=np.float64)
            for i, e in enumerate(uniq):
                a, l, c = self.stats[e]
                anchors[i], lasts[i], centers[i] = a, l, c
            k = (ts - anchors[codes]) // wsize_ns
            # grid excludes the boundary window at/after the last event
            nw = -((anchors - lasts) // wsize_ns)  # ceil((last-anchor)/wsize)
            keep = k < nw[codes]
            codes, k, ts, v = codes[keep], k[keep], ts[keep], v[keep]
            if len(k) == 0:
                return _combined_partial_table(entity_col, ent.slice(0, 0))
            vc = v - centers[codes]
            # rollup per (code, k) via one composite sort
            key = codes * np.int64(1 << 40) + k
            order = np.argsort(key, kind="stable")
            key_s = key[order]
            new = np.empty(len(key_s), dtype=bool)
            new[0] = True
            new[1:] = key_s[1:] != key_s[:-1]
            seg = np.flatnonzero(new)
            vc_s = vc[order]
            v_s = v[order]
            n_part = np.diff(np.append(seg, len(key_s))).astype(np.int64)
            s1c = np.add.reduceat(vc_s, seg)
            s2c = np.add.reduceat(vc_s * vc_s, seg)
            vmin = np.minimum.reduceat(v_s, seg)
            vmax = np.maximum.reduceat(v_s, seg)
            out_codes = codes[order][seg]
            out_k = k[order][seg]
            return pa.table(
                {
                    entity_col: enc.dictionary.take(pa.array(out_codes)),
                    "__wk": pa.array(out_k),
                    "__n": pa.array(n_part),
                    "__s1c": pa.array(s1c),
                    "__s2c": pa.array(s2c),
                    "__min": pa.array(vmin),
                    "__max": pa.array(vmax),
                }
            )

    # batch_size=None: collapse the WHOLE block to one partial row per
    # (entity, window) — the default 1024-row batches would emit
    # block_rows/1024 x more partials into the exchange
    partials = ds.map_batches(Partials, batch_format="pyarrow",
                              batch_size=None, concurrency=(2, 8))

    # phase 2: merge partials inside entity buckets — ONE map call per
    # bucket running a vectorized Arrow hash aggregation (Ray's native
    # groupby.aggregate and per-group map_groups both cost ~0.2 ms/group of
    # fixed overhead, which dominates at 10^5+ windows), then finalize
    # vectorized in the same pass.
    def finalize(tbl: pa.Table) -> pa.Table:
        tbl = tbl.group_by([entity_col, "__wk"]).aggregate(
            [("__n", "sum"), ("__s1c", "sum"), ("__s2c", "sum"), ("__min", "min"), ("__max", "max")]
        )
        stats = ray.get(stats_ref)  # worker-local object-store read, cached
        ent = tbl[entity_col]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        enc = ent.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = enc.dictionary.to_pylist()
        anchors = np.array([stats[e][0] for e in uniq], dtype=np.int64)
        centers = np.array([stats[e][2] for e in uniq], dtype=np.float64)
        k = column_i64(tbl, "__wk")
        n = column_i64(tbl, "__n_sum")
        fn = n.astype(np.float64)
        s1c = column_f64(tbl, "__s1c_sum")
        s2c = column_f64(tbl, "__s2c_sum")
        mean_c = s1c / fn
        m2 = np.maximum(s2c / fn - mean_c**2, 0.0)
        fields = {
            entity_col: ent,
            "window_start_ns": pa.array(anchors[codes] + k * wsize_ns, type=pa.int64()),
            "n_in_window": pa.array(n),
        }
        for name, (_, agg) in aggs.items():
            if agg == "count":
                val = fn
            elif agg == "sum":
                val = s1c + centers[codes] * fn
            elif agg == "mean":
                val = centers[codes] + mean_c
            elif agg == "min":
                val = column_f64(tbl, "__min_min")
            elif agg == "max":
                val = column_f64(tbl, "__max_max")
            elif agg == "var":
                val = m2
            else:  # std
                val = np.sqrt(m2)
            fields[name] = pa.array(np.asarray(val, dtype=np.float64))
        return pa.table(fields)

    return grouped_by_bucket(partials, finalize, entity_col, num_buckets)


def _combined_partial_table(entity_col: str, empty_ent) -> pa.Table:
    return pa.table(
        {
            entity_col: empty_ent,
            "__wk": pa.array([], type=pa.int64()),
            "__n": pa.array([], type=pa.int64()),
            "__s1c": pa.array([], type=pa.float64()),
            "__s2c": pa.array([], type=pa.float64()),
            "__min": pa.array([], type=pa.float64()),
            "__max": pa.array([], type=pa.float64()),
        }
    )
