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
