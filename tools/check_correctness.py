"""Local mimic of the driver's correctness gate: run every queries() entry
and its oracle_sql() side by side at a given sf, compare row count, schema
(column names) and an order-insensitive value hash (floats canonicalized).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> tuple:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            # canonicalize -0.0 and NaN; stringify at fixed precision.
            # Keep a float marker (trailing .0) so an int64 column and a
            # float64 column with equal values hash DIFFERENTLY — the driver
            # compares dtype-faithfully, and round 1 proved that %.10g alone
            # masks int-vs-float oracle mismatches (session_id bug).
            v = df[c].to_numpy(dtype=np.float64, na_value=np.nan)
            v = np.where(v == 0.0, 0.0, v)

            def _fmt(x: float) -> str:
                if not np.isfinite(x):
                    return "nan"
                s = f"{x:.10g}"
                if "." not in s and "e" not in s and "n" not in s:
                    s += ".0"
                return s

            df[c] = [_fmt(x) for x in v]
        else:
            df[c] = df[c].astype("string").fillna("nan").astype(str)
    rows = sorted(map(tuple, df.itertuples(index=False, name=None)))
    h = hashlib.md5(repr(rows).encode()).hexdigest()
    return h, rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"[ERR ] {name}: engine raised {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in sqls:
            print(f"[ROWS] {name}: {len(got)} rows (no oracle — rows-only)")
            continue
        try:
            exp = con.execute(sqls[name]).df()
        except Exception as e:
            print(f"[ERR ] {name}: oracle raised {type(e).__name__}: {e}")
            failures.append(name)
            continue
        ok_rows = len(got) == len(exp)
        ok_schema = sorted(got.columns) == sorted(exp.columns)
        gh, grows = canon(got)
        eh, erows = canon(exp)
        ok_vals = gh == eh
        status = "PASS" if (ok_rows and ok_schema and ok_vals) else "FAIL"
        print(f"[{status}] {name}: rows {len(got)}/{len(exp)} schema={ok_schema} hash={ok_vals}")
        if status == "FAIL":
            failures.append(name)
            if not ok_schema:
                print("   engine cols:", sorted(got.columns))
                print("   oracle cols:", sorted(exp.columns))
            elif ok_rows and not ok_vals:
                diff = [(a, b) for a, b in zip(grows, erows) if a != b][:3]
                for a, b in diff:
                    print("   engine:", a)
                    print("   oracle:", b)
    print("\n%d/%d compared queries failed" % (len(failures), len([n for n in qs if not only or n in only])))
    if failures:
        print("failures:", failures)
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
