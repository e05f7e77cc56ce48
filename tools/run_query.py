#!/usr/bin/env python
"""Run any registered pipeline from the command line.

    python tools/run_query.py --list
    python tools/run_query.py seq_trigram_nll /root/testdata/sf0.01 \
        --out /tmp/trigram_out --limit 5

Owns the Ray session (the library never calls ray.init). Results write
as parquet when --out is given; otherwise the first --limit rows print.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("query", nargs="?", help="query name (see --list)")
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--out", help="write result parquet here")
    ap.add_argument("--limit", type=int, default=10)
    ap.add_argument("--list", action="store_true", help="list queries")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    args = ap.parse_args()

    from pymhealth_ray.pipelines.queries import build_queries

    qs = build_queries()
    if args.list or not args.query:
        for name in sorted(qs):
            print(name)
        return 0
    if args.query not in qs:
        print(f"unknown query {args.query!r}; --list shows all", file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False)
    try:
        import pyarrow as pa

        t0 = time.time()
        res = qs[args.query](args.sf_dir)
        if isinstance(res, pa.Table):
            tbl, rows = res, res.num_rows
            if args.out:
                import pyarrow.parquet as pq

                pq.write_table(tbl, args.out)
            else:
                print(tbl.slice(0, args.limit).to_pandas())
        else:
            if args.out:
                res.write_parquet(args.out)
                rows = "written"
            else:
                head = res.limit(args.limit).to_pandas()
                print(head)
                rows = res.count()
        print(json.dumps({"query": args.query, "sf_dir": args.sf_dir,
                          "rows": rows, "sec": round(time.time() - t0, 2),
                          "out": args.out}))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
