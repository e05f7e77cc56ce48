"""Single-pass table profiling: per-column row/null counts and min/max.

The first thing anyone does with an unfamiliar 100TB table — and the thing
that must NOT cost one scan per column. One pass: each block collapses to
one narrow partial row PER COLUMN (Arrow kernels only), the exchange
carries |columns| x |blocks| rows, and a tiny groupby merges them. Numeric
columns report double min/max, string columns lexicographic min/max; no
arithmetic is performed on the values so the results are exact (SQL
oracle: a UNION ALL of per-column aggregates).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def profile_table(ds, columns=None):
    """One profile row per column:
    (col, n_rows, n_null, min_num, max_num, min_str, max_str)."""

    def partial(batch: pa.Table) -> pa.Table:
        names, n, nn = [], [], []
        mn_num, mx_num, mn_str, mx_str = [], [], [], []
        for name in (columns or batch.column_names):
            col = batch[name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            names.append(name)
            n.append(len(col))
            nn.append(col.null_count)
            if pa.types.is_floating(col.type) or pa.types.is_integer(col.type):
                mm = pc.min_max(col)
                mn = mm["min"].as_py()
                mx = mm["max"].as_py()
                mn_num.append(float(mn) if mn is not None else None)
                mx_num.append(float(mx) if mx is not None else None)
                mn_str.append(None)
                mx_str.append(None)
            elif pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                mm = pc.min_max(col)
                mn_num.append(None)
                mx_num.append(None)
                mn_str.append(mm["min"].as_py())
                mx_str.append(mm["max"].as_py())
            else:
                # timestamps, lists, binary …: counts only
                mn_num.append(None)
                mx_num.append(None)
                mn_str.append(None)
                mx_str.append(None)
        return pa.table({
            "col": pa.array(names, type=pa.string()),
            "n_rows": pa.array(n, type=pa.int64()),
            "n_null": pa.array(nn, type=pa.int64()),
            "min_num": pa.array(mn_num, type=pa.float64()),
            "max_num": pa.array(mx_num, type=pa.float64()),
            "min_str": pa.array(mn_str, type=pa.string()),
            "max_str": pa.array(mx_str, type=pa.string()),
        })

    def merge(tbl: pa.Table) -> pa.Table:
        out = tbl.group_by("col").aggregate([
            ("n_rows", "sum"), ("n_null", "sum"),
            ("min_num", "min"), ("max_num", "max"),
            ("min_str", "min"), ("max_str", "max"),
        ])
        return out.rename_columns(
            ["col", "n_rows", "n_null", "min_num", "max_num", "min_str", "max_str"])

    # |columns| x |blocks| partial rows: small enough for a single merge
    # group, so no bucket column is needed
    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def const_group(batch: pa.Table) -> pa.Table:
        return batch.append_column("__g", pa.array(
            np.zeros(batch.num_rows, dtype=np.int8)))

    return partials.map_batches(const_group, batch_format="pyarrow").groupby(
        "__g").map_groups(
        lambda t: merge(t.drop_columns(["__g"])), batch_format="pyarrow")


def _col_as_str(col: pa.Array) -> pa.Array:
    """Injective string view of a column (distinctness-preserving: Arrow's
    double→string is shortest-round-trip). Nulls stay null."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return col
    return pc.cast(col, pa.string())


def constraint_checks(ds, columns, unique_key=None, num_buckets: int = 64):
    """Data-quality constraint suite in ~one scan + one slim exchange:
    one (check, value:int64) row per check —

    - ``rows``: total row count;
    - ``null:<col>``: null count per column;
    - ``distinct:<col>``: EXACT distinct non-null count per column
      (SQL COUNT(DISTINCT col));
    - ``dup:<k1,k2,…>``: duplicate-row count over a composite key
      (rows − distinct key tuples) — the uniqueness violation counter.

    Exactness without collecting values: each block emits its DISTINCT
    (check, string-view-of-value) pairs; the exchange buckets on the pair
    hash so every global duplicate lands in one bucket, each bucket counts
    its unique pairs per check vectorized, and a tiny final sum per check
    adds the scalar counters. Exchange volume is O(block-distinct values),
    never rows; no driver-side value set.
    """
    from pymhealth_ray.stages.partition import _stable_bucket_of

    columns = list(columns)
    key_cols = list(unique_key or [])
    key_name = "dup:" + ",".join(key_cols) if key_cols else None

    def partial(batch: pa.Table) -> pa.Table:
        checks, vals, counts = [], [], []
        # scalar partials ride the same (check, val, c) stream with val=NULL
        checks.append("rows")
        vals.append(None)
        counts.append(batch.num_rows)
        for c in columns:
            col = batch[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            checks.append(f"null:{c}")
            vals.append(None)
            counts.append(col.null_count)
            u = pc.unique(pc.drop_null(_col_as_str(col)))
            checks.extend([f"distinct:{c}"] * len(u))
            vals.extend(u.to_pylist())
            counts.extend([0] * len(u))
        if key_cols:
            # Injective composite: length-prefix every component (so a '|'
            # inside a string key can't alias another tuple) and map NULL
            # components to a sentinel no length-prefixed value can produce
            # (non-null parts always start with digits + ':'), so null-keyed
            # rows participate in the distinct count like SQL row tuples.
            def _inj(p: pa.Array) -> pa.Array:
                ln = pc.cast(pc.binary_length(p), pa.string())
                return pc.fill_null(
                    pc.binary_join_element_wise(ln, p, ":"), "N")

            parts = [_inj(_col_as_str(batch[c])) for c in key_cols]
            composite = parts[0]
            for p in parts[1:]:
                composite = pc.binary_join_element_wise(composite, p, "|")
            u = pc.unique(pc.drop_null(composite))
            checks.extend([key_name] * len(u))
            vals.extend(u.to_pylist())
            counts.extend([0] * len(u))
            checks.append("__rows_for_dup")
            vals.append(None)
            counts.append(batch.num_rows)
        return pa.table({
            "check": pa.array(checks, type=pa.string()),
            "val": pa.array(vals, type=pa.string()),
            "c": pa.array(counts, type=pa.int64()),
        })

    def with_bucket(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            batch["check"], pc.fill_null(batch["val"], "\x00"), "\x01")
        return batch.append_column("__b", pa.array(
            _stable_bucket_of(key, num_buckets), type=pa.int32()))

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl = tbl.drop_columns(["__b"])
        val = tbl["val"]
        if isinstance(val, pa.ChunkedArray):
            val = val.combine_chunks()
        isval = val.is_valid().to_numpy(zero_copy_only=False)
        scal = tbl.filter(pa.array(~isval))
        sums = scal.group_by("check").aggregate([("c", "sum")])
        out_checks = sums["check"].to_pylist()
        out_vals = sums["c_sum"].to_pylist()
        vrows = tbl.filter(pa.array(isval))
        if vrows.num_rows:
            key = pc.binary_join_element_wise(vrows["check"], vrows["val"], "\x01")
            uniq = pc.unique(key.combine_chunks() if isinstance(key, pa.ChunkedArray) else key)
            chk = pc.split_pattern(uniq, "\x01", max_splits=1)
            firsts = pc.list_element(chk, 0)
            vc = pc.value_counts(firsts)
            out_checks.extend(vc.field("values").to_pylist())
            out_vals.extend(vc.field("counts").to_pylist())
        return pa.table({"check": pa.array(out_checks, type=pa.string()),
                         "c": pa.array(out_vals, type=pa.int64())})

    def finish(tbl: pa.Table) -> pa.Table:
        merged = tbl.group_by("check").aggregate([("c", "sum")])
        checks = merged["check"].to_pylist()
        vals = {k: v for k, v in zip(checks, merged["c_sum"].to_pylist())}
        if key_name is not None:
            vals[key_name] = vals.get("__rows_for_dup", 0) - vals.get(key_name, 0)
            vals.pop("__rows_for_dup", None)
        names = sorted(vals)
        return pa.table({"check": pa.array(names, type=pa.string()),
                         "value": pa.array([vals[k] for k in names],
                                           type=pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
    per_b = partials.map_batches(with_bucket, batch_format="pyarrow",
                                 batch_size=None).groupby("__b").map_groups(
        per_bucket, batch_format="pyarrow")

    def const_g(batch: pa.Table) -> pa.Table:
        return batch.append_column("__g", pa.array(
            np.zeros(batch.num_rows, dtype=np.int8)))

    # final merge: ≤ (#checks × #buckets) rows — one tiny group
    return per_b.map_batches(const_g, batch_format="pyarrow").groupby(
        "__g").map_groups(lambda t: finish(t.drop_columns(["__g"])),
                          batch_format="pyarrow")
