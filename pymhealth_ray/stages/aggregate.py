"""Partial+final (combiner) aggregation — the scalable groupby pattern.

The reference's two-level aggregates (sdann/sdnni, reference:heart/hrv.py:65-108)
are the semantic precedent; physically this is the map-side combine every
100 TB groupby needs: each map_batches task collapses its batch to one row
per key (pyarrow hash aggregation), so the shuffle moves |keys|·|tasks| rows
instead of the full dataset, and a final small groupby merges the partials.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa


def grouped_stats(
    ds,
    keys: List[str],
    sum_cols: List[str] | None = None,
    min_cols: List[str] | None = None,
    max_cols: List[str] | None = None,
    count_name: str = "n",
):
    """Distributed group-by computing count + per-column sum/min/max via
    partial aggregation. Returns a Dataset with one row per key combination:
    ``keys + [{c}_sum...] + [{c}_min...] + [{c}_max...] + [count_name]``.

    Means/variances derive from (sum, sum-of-squares, count): append squared
    columns first with :func:`with_squares`.
    """
    sum_cols = sum_cols or []
    min_cols = min_cols or []
    max_cols = max_cols or []
    aggs = (
        [(c, "sum") for c in sum_cols]
        + [(c, "min") for c in min_cols]
        + [(c, "max") for c in max_cols]
        + [([], "count_all")]
    )

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(keys).aggregate(aggs)

    final_spec = (
        [(f"{c}_sum", "sum") for c in sum_cols]
        + [(f"{c}_min", "min") for c in min_cols]
        + [(f"{c}_max", "max") for c in max_cols]
        + [("count_all", "sum")]
    )

    def final(tbl: pa.Table) -> pa.Table:
        out = tbl.group_by(keys).aggregate(final_spec)
        names = []
        for f in out.column_names:
            if f == "count_all_sum":
                names.append(count_name)
            elif f.endswith("_sum_sum") or f.endswith("_min_min") or f.endswith("_max_max"):
                names.append(f[:-4])
            else:
                names.append(f)
        return out.rename_columns(names)

    # group on a bounded hash bucket of the FIRST key, not the key tuple:
    # map_groups pays a Python call per group, and per-entity aggregates
    # have corpus-cardinality keys at scale. Every row of a key tuple
    # shares key[0], so bucketing on it keeps groups intact; the arrow
    # group_by inside ``final`` does the per-key work vectorized.
    from pymhealth_ray.stages.partition import _stable_bucket_of

    def with_bucket(batch: pa.Table) -> pa.Table:
        b = _stable_bucket_of(batch[keys[0]], 256)
        return batch.append_column("__aggbucket", pa.array(b, type=pa.int32()))

    def final_bucket(tbl: pa.Table) -> pa.Table:
        return final(tbl.drop_columns(["__aggbucket"]))

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).map_batches(
        with_bucket, batch_format="pyarrow")
    return partials.groupby("__aggbucket").map_groups(final_bucket, batch_format="pyarrow")


def with_squares(ds, cols: List[str]):
    """Append {col}__sq columns so grouped_stats can derive variances."""

    def fn(batch: pa.Table) -> pa.Table:
        for c in cols:
            col = batch[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            v = col.to_numpy(zero_copy_only=False).astype(np.float64)
            batch = batch.append_column(f"{c}__sq", pa.array(v * v))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow")


def _topk_rows(tbl: pa.Table, group_cols, order_col, k, descending, tie_cols,
               rank_name=None) -> pa.Table:
    """Vectorized top-k per group within one table: composite group code →
    single lexsort → positional cutoff. No per-group Python."""
    if tbl.num_rows == 0:
        if rank_name:
            tbl = tbl.append_column(rank_name, pa.array([], type=pa.int64()))
        return tbl
    gid = np.zeros(tbl.num_rows, dtype=np.int64)
    for c in group_cols:
        col = tbl[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        enc = col.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        gid = gid * (len(enc.dictionary) + 1) + codes
    ov = tbl[order_col]
    if isinstance(ov, pa.ChunkedArray):
        ov = ov.combine_chunks()
    ov = ov.to_numpy(zero_copy_only=False)
    if descending:
        ov = -ov
    ties = []
    for c in tie_cols:
        tc = tbl[c]
        if isinstance(tc, pa.ChunkedArray):
            tc = tc.combine_chunks()
        ties.append(tc.to_numpy(zero_copy_only=False))
    idx = np.lexsort(tuple(reversed(ties)) + (ov, gid))
    gs = gid[idx]
    starts = np.ones(len(gs), dtype=bool)
    starts[1:] = gs[1:] != gs[:-1]
    start_pos = np.flatnonzero(starts)
    counts = np.diff(np.append(start_pos, len(gs)))
    pos = np.arange(len(gs)) - np.repeat(start_pos, counts)
    keep = pos < k
    out = tbl.take(pa.array(idx[keep]))
    if rank_name:
        out = out.append_column(rank_name, pa.array(pos[keep] + 1, type=pa.int64()))
    return out.replace_schema_metadata(None)


def grouped_topk(
    ds,
    group_cols: List[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tie_cols: List[str] | None = None,
    rank_name: str | None = None,
    num_buckets: int = 256,
):
    """Distributed top-k rows per group — SQL
    ``row_number() OVER (PARTITION BY group ORDER BY order_col [DESC],
    tie_cols) <= k`` semantics.

    Map-side partial: every block keeps only its own top-k per group, so the
    exchange carries at most k rows per (group, block) — the combiner
    pattern applied to order statistics. Final: bucket exchange on
    ``group_cols[0]``'s hash (every row of a group tuple shares it; bounded
    bucket count keeps map_groups calls off the per-group Python path) and
    one more vectorized top-k with rank emission. ``order_col`` must be
    numeric for ``descending=True`` (negation trick); ties must be broken
    by ``tie_cols`` for a deterministic result.
    """
    tie_cols = list(tie_cols or [])
    from pymhealth_ray.stages.partition import _stable_bucket_of

    def partial(batch: pa.Table) -> pa.Table:
        return _topk_rows(batch, group_cols, order_col, k, descending, tie_cols)

    def with_bucket(batch: pa.Table) -> pa.Table:
        b = _stable_bucket_of(batch[group_cols[0]], num_buckets)
        return batch.append_column("__aggbucket", pa.array(b, type=pa.int32()))

    def final_bucket(tbl: pa.Table) -> pa.Table:
        return _topk_rows(tbl.drop_columns(["__aggbucket"]), group_cols,
                          order_col, k, descending, tie_cols, rank_name)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).map_batches(
        with_bucket, batch_format="pyarrow")
    return partials.groupby("__aggbucket").map_groups(final_bucket, batch_format="pyarrow")


def grouped_quantiles(
    ds,
    group_cols: List[str],
    value_col: str,
    qs=(0.25, 0.5, 0.75),
    num_buckets: int = 256,
    count_name: str = "n",
):
    """EXACT distributed per-group quantiles for discrete-valued columns —
    SQL ``quantile_disc``/``percentile_disc`` semantics
    (``sorted[ceil(q*n)-1]``, verified against DuckDB over randomized
    cases including float-rounding edges like q=0.1, n=30).

    Combiner pattern on the VALUE HISTOGRAM: each block collapses to one
    row per (group, distinct value) via Arrow hash aggregation, so the
    exchange carries |distinct values| rows per (group, block) — not the
    data. Works whenever the value domain is bounded (token counts,
    lengths, scores); for unbounded continuous values use a sketch
    instead. Final pass merges histograms per bucket and reads all
    quantiles off the per-group CDF with one searchsorted — the trick:
    within a group the cumulative count is strictly increasing, so
    ``segment_id * M + cum`` is globally sorted and one searchsorted of
    ``segment_id * M + target`` answers every (group, q) pair at once.
    """
    qs = list(qs)
    from pymhealth_ray.stages.partition import _stable_bucket_of

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(group_cols + [value_col]).aggregate([([], "count_all")])

    def with_bucket(batch: pa.Table) -> pa.Table:
        b = _stable_bucket_of(batch[group_cols[0]], num_buckets)
        return batch.append_column("__aggbucket", pa.array(b, type=pa.int32()))

    q_names = [f"q{int(round(q * 100))}" for q in qs]

    def final_bucket(tbl: pa.Table) -> pa.Table:
        tbl = tbl.drop_columns(["__aggbucket"])
        # merge partial histograms
        tbl = tbl.group_by(group_cols + [value_col]).aggregate([("count_all", "sum")])
        if tbl.num_rows == 0:
            cols = {c: tbl[c] for c in group_cols}
            for qn in q_names:
                cols[qn] = pa.array([], type=tbl[value_col].type)
            cols[count_name] = pa.array([], type=pa.int64())
            return pa.table(cols)
        gid = np.zeros(tbl.num_rows, dtype=np.int64)
        for c in group_cols:
            col = tbl[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            enc = col.dictionary_encode()
            gid = gid * (len(enc.dictionary) + 1) + enc.indices.to_numpy(
                zero_copy_only=False).astype(np.int64)
        vcol = tbl[value_col]
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        v = vcol.to_numpy(zero_copy_only=False)
        c = tbl["count_all_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((v, gid))
        g, v, c = gid[order], v[order], c[order]
        starts = np.ones(len(g), dtype=bool)
        starts[1:] = g[1:] != g[:-1]
        start_pos = np.flatnonzero(starts)
        seg_len = np.diff(np.append(start_pos, len(g)))
        seg_id = np.repeat(np.arange(len(start_pos)), seg_len)
        cs = np.cumsum(c)
        base = np.repeat(cs[start_pos] - c[start_pos], seg_len)
        cum = cs - base                      # cumulative count within group
        n_g = np.add.reduceat(c, start_pos)  # group totals
        M = int(n_g.max()) + 1
        key = seg_id * M + cum
        out_cols = {}
        first_row = order[start_pos]
        for col_name in group_cols:
            out_cols[col_name] = tbl[col_name].take(pa.array(first_row))
        for q, qn in zip(qs, q_names):
            # DuckDB quantile_disc: element at 1-based rank ceil(q*n),
            # same double arithmetic (no epsilon)
            target = np.maximum(np.ceil(q * n_g), 1.0).astype(np.int64)
            pos = np.searchsorted(key, np.arange(len(n_g)) * M + target, side="left")
            out_cols[qn] = pa.array(v[pos])
        out_cols[count_name] = pa.array(n_g, type=pa.int64())
        return pa.table(out_cols)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).map_batches(
        with_bucket, batch_format="pyarrow")
    return partials.groupby("__aggbucket").map_groups(final_bucket, batch_format="pyarrow")


def grouped_weighted_median(
    ds,
    group_cols: List[str],
    value_col: str,
    weight_col: str,
    num_buckets: int = 256,
    out_name: str = "wmedian",
    total_name: str = "total_w",
):
    """EXACT distributed per-group LOWER WEIGHTED MEDIAN: the smallest
    value v with 2 * cumweight(<= v) >= total weight (integer weights,
    fraction-free comparison). Same combiner shape as
    :func:`grouped_quantiles` — blocks collapse to one row per (group,
    distinct value) with a partial SUM OF WEIGHTS, so the exchange
    carries the value histogram, not the data; the per-bucket finish
    reads every group's median off the weighted CDF with one
    searchsorted (within a group 2*cumw is strictly increasing, so
    ``segment_id * M + 2*cumw`` is globally sorted)."""
    from pymhealth_ray.stages.partition import _stable_bucket_of

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(group_cols + [value_col]).aggregate(
            [(weight_col, "sum")])

    def with_bucket(batch: pa.Table) -> pa.Table:
        b = _stable_bucket_of(batch[group_cols[0]], num_buckets)
        return batch.append_column("__aggbucket",
                                   pa.array(b, type=pa.int32()))

    wname = f"{weight_col}_sum"

    def final_bucket(tbl: pa.Table) -> pa.Table:
        tbl = tbl.drop_columns(["__aggbucket"])
        tbl = tbl.group_by(group_cols + [value_col]).aggregate(
            [(wname, "sum")])
        if tbl.num_rows == 0:
            cols = {c: tbl[c] for c in group_cols}
            cols[out_name] = pa.array([], type=tbl[value_col].type)
            cols[total_name] = pa.array([], type=pa.int64())
            return pa.table(cols)
        gid = np.zeros(tbl.num_rows, dtype=np.int64)
        for c in group_cols:
            col = tbl[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            enc = col.dictionary_encode()
            gid = gid * (len(enc.dictionary) + 1) + enc.indices.to_numpy(
                zero_copy_only=False).astype(np.int64)
        vcol = tbl[value_col]
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        v = vcol.to_numpy(zero_copy_only=False)
        w = tbl[f"{wname}_sum"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.lexsort((v, gid))
        g, v, w = gid[order], v[order], w[order]
        starts = np.ones(len(g), dtype=bool)
        starts[1:] = g[1:] != g[:-1]
        start_pos = np.flatnonzero(starts)
        seg_len = np.diff(np.append(start_pos, len(g)))
        seg_id = np.repeat(np.arange(len(start_pos)), seg_len)
        cs = np.cumsum(w)
        base = np.repeat(cs[start_pos] - w[start_pos], seg_len)
        cum = cs - base
        tot = np.add.reduceat(w, start_pos)
        M = 2 * int(tot.max()) + 2
        key = seg_id * M + 2 * cum
        pos = np.searchsorted(key, np.arange(len(tot)) * M + tot,
                              side="left")
        out_cols = {}
        first_row = order[start_pos]
        for col_name in group_cols:
            out_cols[col_name] = tbl[col_name].take(pa.array(first_row))
        out_cols[out_name] = pa.array(v[pos])
        out_cols[total_name] = pa.array(tot, type=pa.int64())
        return pa.table(out_cols)

    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None).map_batches(
        with_bucket, batch_format="pyarrow")
    return partials.groupby("__aggbucket").map_groups(
        final_bucket, batch_format="pyarrow")


def grouped_rollup(ds, keys: List[str], sum_cols: List[str],
                   count_name: str = "n"):
    """SQL ``GROUP BY ROLLUP (k1, k2, …)`` for associative sums: one
    partial-aggregation pass computes the FINEST level; every coarser
    level (k1..k_{i}, then the grand total) is derived from it by exact
    re-aggregation — zero extra scans, and exact because the measures are
    integer/associative. Rolled-up key columns are NULL (SQL convention).

    Output: keys (with NULLs) + sum_cols + count_name, one row per rollup
    group."""
    sum_cols = list(sum_cols)
    fine = grouped_stats(ds, keys, sum_cols=sum_cols, count_name=count_name)

    import pyarrow.compute as pc

    def expand(tbl: pa.Table) -> pa.Table:
        levels = [tbl]
        for i in range(len(keys) - 1, -1, -1):
            gb_keys = keys[:i]
            if gb_keys:  # every coarser level derives from the finest
                up = tbl.group_by(gb_keys).aggregate(
                    [(f"{c}_sum", "sum") for c in sum_cols]
                    + [(count_name, "sum")])
                names = []
                for f in up.column_names:
                    if f.endswith("_sum_sum"):
                        names.append(f[:-4])
                    elif f == f"{count_name}_sum":
                        names.append(count_name)
                    else:
                        names.append(f)
                up = up.rename_columns(names)
            else:  # grand total
                cols = {f"{c}_sum": pa.array(
                    [pc.sum(tbl[f"{c}_sum"]).as_py() or 0], type=pa.int64())
                    for c in sum_cols}
                cols[count_name] = pa.array(
                    [pc.sum(tbl[count_name]).as_py() or 0], type=pa.int64())
                up = pa.table(cols)
            for j in range(i, len(keys)):  # rolled-up keys are NULL
                up = up.append_column(
                    keys[j], pa.nulls(up.num_rows,
                                      type=tbl.schema.field(keys[j]).type))
            levels.append(up.select(tbl.column_names))
        return pa.concat_tables([lv.replace_schema_metadata(None)
                                 for lv in levels])

    def const_g(batch: pa.Table) -> pa.Table:
        return batch.append_column("__g", pa.array(
            np.zeros(batch.num_rows, dtype=np.int8)))

    # the finest-level table is |groups|-bounded: one merge group suffices
    return fine.map_batches(const_g, batch_format="pyarrow").groupby(
        "__g").map_groups(lambda t: expand(t.drop_columns(["__g"])),
                          batch_format="pyarrow")


def grouped_cube(ds, keys: List[str], sum_cols: List[str],
                 count_name: str = "n"):
    """SQL ``GROUP BY CUBE (k1, k2, …)`` for associative sums: like
    :func:`grouped_rollup` but over EVERY subset of ``keys`` (2^|keys|
    grouping sets). One partial-aggregation pass computes the finest
    level; every other grouping set is derived from it by exact
    re-aggregation, so the input is scanned once regardless of the number
    of grouping sets. Dropped key columns are NULL (SQL convention).

    Output: keys (with NULLs) + ``{c}_sum`` per sum col + count_name, one
    row per cube group."""
    sum_cols = list(sum_cols)
    fine = grouped_stats(ds, keys, sum_cols=sum_cols, count_name=count_name)

    import pyarrow.compute as pc

    def expand(tbl: pa.Table) -> pa.Table:
        levels = []
        for mask in range(1 << len(keys)):
            gb_keys = [k for i, k in enumerate(keys) if mask & (1 << i)]
            if len(gb_keys) == len(keys):
                levels.append(tbl)
                continue
            if gb_keys:
                up = tbl.group_by(gb_keys).aggregate(
                    [(f"{c}_sum", "sum") for c in sum_cols]
                    + [(count_name, "sum")])
                names = []
                for f in up.column_names:
                    if f.endswith("_sum_sum"):
                        names.append(f[:-4])
                    elif f == f"{count_name}_sum":
                        names.append(count_name)
                    else:
                        names.append(f)
                up = up.rename_columns(names)
            else:  # grand total
                cols = {f"{c}_sum": pa.array(
                    [pc.sum(tbl[f"{c}_sum"]).as_py() or 0], type=pa.int64())
                    for c in sum_cols}
                cols[count_name] = pa.array(
                    [pc.sum(tbl[count_name]).as_py() or 0], type=pa.int64())
                up = pa.table(cols)
            for i, k in enumerate(keys):  # dropped keys are NULL
                if not mask & (1 << i):
                    up = up.append_column(
                        k, pa.nulls(up.num_rows,
                                    type=tbl.schema.field(k).type))
            levels.append(up.select(tbl.column_names))
        return pa.concat_tables([lv.replace_schema_metadata(None)
                                 for lv in levels])

    def const_g(batch: pa.Table) -> pa.Table:
        return batch.append_column("__g", pa.array(
            np.zeros(batch.num_rows, dtype=np.int8)))

    # the finest-level table is |groups|-bounded: one merge group suffices
    return fine.map_batches(const_g, batch_format="pyarrow").groupby(
        "__g").map_groups(lambda t: expand(t.drop_columns(["__g"])),
                          batch_format="pyarrow")


def grouped_pivot_counts(ds, entity_col: str, cat_col: str, categories,
                         prefix: str = "n_"):
    """Per-entity wide count columns (one-hot aggregation): SQL
    ``count(*) FILTER (WHERE cat = '…')`` per category. One partial pass
    collapses each block to (entity, cat) counts; the bucketed merge emits
    ``prefix+cat`` int64 columns — the categorical feature-vector builder."""
    categories = list(categories)
    from pymhealth_ray.stages.partition import _stable_bucket_of

    def partial(batch: pa.Table) -> pa.Table:
        return batch.select([entity_col, cat_col]).group_by(
            [entity_col, cat_col]).aggregate([([], "count_all")])

    def with_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("__b", pa.array(
            _stable_bucket_of(batch[entity_col], 64), type=pa.int32()))

    def pivot(tbl: pa.Table) -> pa.Table:
        tbl = tbl.drop_columns(["__b"])
        tbl = tbl.group_by([entity_col, cat_col]).aggregate(
            [("count_all", "sum")])
        ent = tbl[entity_col]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        enc = ent.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        n_ent = len(enc.dictionary)
        cat = tbl[cat_col]
        if isinstance(cat, pa.ChunkedArray):
            cat = cat.combine_chunks()
        cvals = cat.to_pylist()
        c = tbl["count_all_sum"].to_numpy(zero_copy_only=False)
        cols = {entity_col: enc.dictionary}
        for name in categories:
            mask = np.fromiter((v == name for v in cvals), dtype=bool,
                               count=len(cvals))
            cols[f"{prefix}{name}"] = pa.array(np.bincount(
                idx[mask], weights=c[mask],
                minlength=n_ent).astype(np.int64))
        return pa.table(cols)

    return (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .map_batches(with_bucket, batch_format="pyarrow")
            .groupby("__b").map_groups(pivot, batch_format="pyarrow"))


def keyed_sum(ds, key_col: str, val_cols, num_buckets: int = 256,
              precombine_rows: int | None = 8_000_000):
    """Exact per-key sums for HIGH-CARDINALITY integer keys without a
    row-level sort: Ray's ``groupby(key).sum`` sorts the whole exchange by
    the key (measured 60×+ slower than this plan on a 16M-row pair table);
    here rows exchange on a 256-value int32 bucket of the mixed key and
    each bucket rolls up vectorized (np.unique + bincount). Same output as
    ``groupby(key_col).sum(val_cols)`` up to row order.

    ``precombine_rows``: when the key domain is dense (per-block partials
    ≈ the full domain), an extra pre-exchange combine coalesces
    ~precombine_rows of partials per batch and re-uniques — cross-block
    combining that cuts exchange volume by ≈ (coalesced blocks)× at the
    cost of one cheap vectorized pass. None disables."""
    from pymhealth_ray.stages.partition import _stable_bucket_of

    val_cols = list(val_cols)
    B = "__aggbucket"

    def combine(tbl: pa.Table) -> pa.Table:
        k = tbl[key_col]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        kv = k.to_numpy(zero_copy_only=False)
        vals, inv = np.unique(kv, return_inverse=True)
        cols = {key_col: pa.array(vals)}
        for c in val_cols:
            v = tbl[c]
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            s = np.bincount(inv, weights=v.to_numpy(zero_copy_only=False),
                            minlength=len(vals))
            cols[c] = pa.array(s.astype(np.int64))
        return pa.table(cols)

    if precombine_rows:
        # num_cpus=1.001 BREAKS OPERATOR FUSION with the upstream partial
        # map: fused, Ray batches the RAW INPUT at precombine_rows and the
        # whole scan collapses into a couple of serial tasks (measured 135 s
        # vs 22 s on the 2M-row pair-count job). Unfused, this stage
        # coalesces ~precombine_rows of PARTIALS per task and re-uniques.
        ds = ds.map_batches(combine, batch_format="pyarrow",
                            batch_size=precombine_rows, num_cpus=1.001)

    def with_bucket(batch: pa.Table) -> pa.Table:
        b = _stable_bucket_of(batch[key_col], num_buckets)
        return batch.append_column(B, pa.array(b, type=pa.int32()))

    def rollup(tbl: pa.Table) -> pa.Table:
        return combine(tbl.drop_columns([B]))

    return (ds.map_batches(with_bucket, batch_format="pyarrow",
                           batch_size=None)
            .groupby(B).map_groups(rollup, batch_format="pyarrow"))


def keyed_agg(ds, key_col: str, spec: dict, num_buckets: int = 256,
              precombine_rows: int | None = 8_000_000):
    """Generalized :func:`keyed_sum`: exact per-key ``sum`` / ``min`` /
    ``max`` over high-cardinality integer keys (``spec``: col → agg name).
    All three merges are associative+commutative, so the same two-level
    plan applies: optional fusion-broken pre-combine, int32-bucket
    exchange, vectorized sorted reduceat rollup per bucket."""
    from pymhealth_ray.stages.partition import _stable_bucket_of

    ufuncs = {"sum": np.add, "min": np.minimum, "max": np.maximum}
    for c, a in spec.items():
        if a not in ufuncs:
            raise ValueError(f"unsupported agg {a!r} for {c!r}")
    B = "__aggbucket"

    def combine(tbl: pa.Table) -> pa.Table:
        k = tbl[key_col]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        kv = k.to_numpy(zero_copy_only=False)
        order = np.argsort(kv, kind="stable")
        ks = kv[order]
        is_start = np.ones(len(ks), dtype=bool)
        is_start[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(is_start)
        cols = {key_col: pa.array(ks[starts])}
        for c, a in spec.items():
            v = tbl[c]
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            vv = v.to_numpy(zero_copy_only=False)[order]
            red = ufuncs[a].reduceat(vv, starts) if len(starts) else vv[:0]
            cols[c] = pa.array(red)
        return pa.table(cols)

    if precombine_rows:
        # num_cpus=1.001: break operator fusion (see keyed_sum)
        ds = ds.map_batches(combine, batch_format="pyarrow",
                            batch_size=precombine_rows, num_cpus=1.001)

    def with_bucket(batch: pa.Table) -> pa.Table:
        b = _stable_bucket_of(batch[key_col], num_buckets)
        return batch.append_column(B, pa.array(b, type=pa.int32()))

    def rollup(tbl: pa.Table) -> pa.Table:
        return combine(tbl.drop_columns([B]))

    return (ds.map_batches(with_bucket, batch_format="pyarrow",
                           batch_size=None)
            .groupby(B).map_groups(rollup, batch_format="pyarrow"))


def grouped_distinct_count(ds, group_col: str, value_col: str,
                           num_buckets: int = 128,
                           out: str = "n_distinct"):
    """EXACT ``count(DISTINCT value) GROUP BY group`` for integer
    group/value columns at any cardinality — no driver value sets, no row
    sort: per-block distinct (group, value) partials (np.unique on the
    packed pair), one hash-bucket exchange on the PAIR (equal pairs
    co-locate, so per-bucket unique is globally exact), then a keyed_sum
    rollup of per-group counts across buckets. Groups may span buckets;
    pairs may not — that is the invariant that makes the count exact.

    Both columns must be non-negative int64 with values < 2^31 in
    ``value_col`` (packing bound; group codes are block-local)."""
    from pymhealth_ray.stages.partition import _stable_bucket_of

    SHIFT = np.int64(1) << np.int64(32)
    B = "__dcbucket"

    def partial(batch: pa.Table) -> pa.Table:
        g = batch[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        v = batch[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        gv = g.to_numpy(zero_copy_only=False).astype(np.int64)
        vv = v.to_numpy(zero_copy_only=False).astype(np.int64)
        if len(vv) and (vv.min() < 0 or vv.max() >= (1 << 31)):
            raise ValueError("value codes must be in [0, 2^31)")
        gu, ginv = np.unique(gv, return_inverse=True)
        du = np.unique(ginv.astype(np.int64) * SHIFT + vv)
        return pa.table({
            group_col: pa.array(gu[(du >> np.int64(32))]),
            value_col: pa.array(du & np.int64(0xFFFFFFFF)),
        })

    def with_bucket(batch: pa.Table) -> pa.Table:
        g = batch[group_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            h = ((g.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                 ^ v.astype(np.uint64)) % np.uint64(num_buckets)
        return batch.append_column(B, pa.array(h.astype(np.int32)))

    def per_bucket(tbl: pa.Table) -> pa.Table:
        g = tbl[group_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = tbl[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        gu, ginv = np.unique(g, return_inverse=True)
        du = np.unique(ginv.astype(np.int64) * SHIFT + v)
        cnt = np.bincount((du >> np.int64(32)), minlength=len(gu))
        return pa.table({group_col: pa.array(gu),
                         "c": pa.array(cnt.astype(np.int64))})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None).map_batches(
        with_bucket, batch_format="pyarrow", batch_size=None)
    per_b = partials.groupby(B).map_groups(
        lambda t: per_bucket(t.drop_columns([B])), batch_format="pyarrow")
    summed = keyed_sum(per_b, group_col, ["c"], num_buckets=64,
                       precombine_rows=None)
    return summed.map_batches(
        lambda b: b.rename_columns([group_col, out]),
        batch_format="pyarrow", batch_size=None)


def grouped_ohlc(ds, entity_col: str, order_col: str, tie_col: str,
                 value_col: str, num_buckets: int = 64):
    """Per-entity OHLC candle: ``open``/``close`` are the value at the
    first/last row in (order, tie) order, ``high``/``low`` the extrema,
    ``n`` the row count — the canonical downsample of a value stream to
    one row per entity (daily bars, per-key first/last CDC summaries).

    ONE bucket exchange (``grouped_by_bucket`` co-locates every row of an
    entity), then vectorized segment reductions inside each bucket:
    ``entity_segments`` sorts once by (entity, order, tie) and
    open/close index the segment boundaries while high/low come from
    ``reduceat`` — no per-group Python. Value column must be int64-safe
    (use cents for decimals); output dtypes are all int64 except the
    entity column, whose dtype is preserved.
    """
    from pymhealth_ray.stages.partition import (column_i64, entity_segments,
                                                grouped_by_bucket)

    def candle_of_bucket(tbl: pa.Table) -> pa.Table:
        ent_type = (tbl[entity_col].type if entity_col in tbl.column_names
                    else pa.int64())
        empty = pa.table({
            entity_col: pa.array([], type=ent_type),
            "n": pa.array([], type=pa.int64()),
            "open": pa.array([], type=pa.int64()),
            "high": pa.array([], type=pa.int64()),
            "low": pa.array([], type=pa.int64()),
            "close": pa.array([], type=pa.int64())})
        if tbl.num_rows == 0:
            return empty
        tbl, starts, n_ent = entity_segments(tbl, entity_col, order_col,
                                             tiebreak_col=tie_col)
        v = column_i64(tbl, value_col)
        first = starts[:-1]
        last = starts[1:] - 1
        ent = tbl[entity_col]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        return pa.table({
            entity_col: ent.take(pa.array(first)),
            "n": pa.array(np.diff(starts).astype(np.int64)),
            "open": pa.array(v[first]),
            "high": pa.array(np.maximum.reduceat(v, first)),
            "low": pa.array(np.minimum.reduceat(v, first)),
            "close": pa.array(v[last])})

    return grouped_by_bucket(ds, candle_of_bucket, entity_col=entity_col,
                             num_buckets=num_buckets)
