"""Local mimic of the driver's correctness gate: run every queries() entry
and its oracle_sql() side by side at a given sf, compare row count, schema
(column names) and an order-insensitive value hash (floats canonicalized).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor

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
    """Order-insensitive canonical (hash, sorted-row-strings). Vectorized
    (np.char %g formatting + C-level row joins): the old per-row
    tuple/repr form was the gate's serial GIL bottleneck on 100k-row
    results once queries started overlapping in threads."""
    df = df[sorted(df.columns)]
    cols = []
    for c in df.columns:
        if np.issubdtype(df[c].dtype, np.floating):
            # canonicalize -0.0 and NaN; stringify at fixed precision.
            # Keep a float marker (trailing .0) so an int64 column and a
            # float64 column with equal values hash DIFFERENTLY — the
            # driver compares dtype-faithfully, and round 1 proved that
            # %.10g alone masks int-vs-float mismatches (session_id bug).
            v = df[c].to_numpy(dtype=np.float64, na_value=np.nan)
            v = np.where(v == 0.0, 0.0, v)
            s = np.char.mod("%.10g", v)
            bad = ~np.isfinite(v)
            if bad.any():
                s[bad] = "nan"  # matches the old _fmt (inf → "nan" too)
            plain = ((np.char.find(s, ".") < 0)
                     & (np.char.find(s, "e") < 0)
                     & (np.char.find(s, "n") < 0))
            s = np.where(plain, np.char.add(s, ".0"), s)
            cols.append(s.tolist())
        elif df[c].dtype == object:
            cols.append([str(x) for x in df[c]])
        else:
            cols.append(df[c].astype("string").fillna("nan")
                        .astype(str).tolist())
    rows = sorted(map("\x1f".join, zip(*cols))) if cols else []
    h = hashlib.md5("\x1e".join(rows).encode()).hexdigest()
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

    # GATE_WORKERS queries run concurrently on the one shared Ray session
    # (VERDICT r4 item 4: the serial 224-query loop hit ~7 min warm — at
    # sf0.01 each query is execution-barrier-bound, not data-bound, so
    # overlapping a few in flight reclaims the idle time). DuckDB
    # connections are per-thread; each builds its own view set.
    workers = int(os.environ.get("GATE_WORKERS", "4"))
    tls = threading.local()

    def get_con():
        if not hasattr(tls, "con"):
            con = duckdb.connect()
            for t in ("region nation customer supplier part orders "
                      "lineitem events documents embeddings").split():
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                            f"read_parquet('{sf_dir}/{t}.parquet')")
            tls.con = con
        return tls.con

    def check_one(name: str) -> tuple[str, bool, str]:
        """Returns (name, failed, report-text)."""
        t0 = time.time()
        try:
            got = to_pandas(qs[name](sf_dir))
        except Exception as e:
            return name, True, \
                f"[ERR ] {name}: engine raised {type(e).__name__}: {e}"
        if name not in sqls:
            return name, False, \
                f"[ROWS] {name}: {len(got)} rows (no oracle — rows-only)"
        try:
            exp = get_con().execute(sqls[name]).df()
        except Exception as e:
            return name, True, \
                f"[ERR ] {name}: oracle raised {type(e).__name__}: {e}"
        ok_rows = len(got) == len(exp)
        ok_schema = sorted(got.columns) == sorted(exp.columns)
        gh, grows = canon(got)
        eh, erows = canon(exp)
        ok_vals = gh == eh
        status = "PASS" if (ok_rows and ok_schema and ok_vals) else "FAIL"
        lines = [f"[{status}] {name}: rows {len(got)}/{len(exp)} "
                 f"schema={ok_schema} hash={ok_vals} "
                 f"({time.time() - t0:.1f}s)"]
        if status == "FAIL":
            if not ok_schema:
                lines.append(f"   engine cols: {sorted(got.columns)}")
                lines.append(f"   oracle cols: {sorted(exp.columns)}")
            elif ok_rows and not ok_vals:
                for a, b in [(a, b) for a, b in zip(grows, erows)
                             if a != b][:3]:
                    lines.append(f"   engine: {a}")
                    lines.append(f"   oracle: {b}")
        return name, status == "FAIL", "\n".join(lines)

    # Python lazy imports are not thread-safe: ray.data's per-read
    # _is_http_filesystem does `from fsspec.implementations.http import
    # HTTPFileSystem` and catches ModuleNotFoundError (aiohttp is absent
    # here, so the import always fails) — but when two query threads
    # trigger the failing import at once, the loser sees a PARTIAL module
    # and gets a plain ImportError ("cannot import name ..."), which ray
    # does not catch. Install a minimal stub so the import succeeds
    # deterministically; local parquet reads never use the HTTP fs.
    try:
        import fsspec.implementations.http  # noqa: F401
    except ImportError:
        import types

        import fsspec.implementations
        import fsspec.spec

        class _StubHTTPFileSystem(fsspec.spec.AbstractFileSystem):
            def __init__(self, *a, **k):
                raise ImportError("aiohttp missing: HTTP fs unavailable")

        _m = types.ModuleType("fsspec.implementations.http")
        _m.HTTPFileSystem = _StubHTTPFileSystem
        sys.modules["fsspec.implementations.http"] = _m
        fsspec.implementations.http = _m

    names = [n for n in qs if not only or n in only]
    failures = []
    if names:
        name, failed, report = check_one(names[0])
        print(report, flush=True)
        if failed:
            failures.append(name)
    with ThreadPoolExecutor(max_workers=workers) as pool:
        for name, failed, report in pool.map(check_one, names[1:]):
            print(report, flush=True)
            if failed:
                failures.append(name)
    print("\n%d/%d compared queries failed" % (len(failures), len(names)))
    if failures:
        print("failures:", failures)
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
