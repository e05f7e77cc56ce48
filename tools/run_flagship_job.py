#!/usr/bin/env python
"""Cluster entrypoint for the flagship pipeline — the script you hand to
``ray job submit`` on a real cluster (BASELINE.json north_rule):

    ray job submit --working-dir . -- \
        python tools/run_flagship_job.py \
        --input s3://bucket/sequences/ --output s3://bucket/features/ \
        --num-buckets 4096 --resume

Locally it runs against the deterministic fixture. The job is resumable:
output is bucket-partitioned with per-partition lineage manifests
(state.lineage), and --resume skips partitions whose manifest matches the
parameter hash. On a cluster, ``ray.init()`` with no address connects to the
running cluster per Ray convention; locally it starts one.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None, help="parquet dir (default: generated fixture)")
    ap.add_argument("--output", required=False, default="/tmp/flagship_job_out")
    ap.add_argument("--num-buckets", type=int, default=256,
                    help="entity buckets ≈ total_bytes/256MiB, >= 4x cluster cores")
    ap.add_argument("--gap-ns", type=int, default=1800 * 10**9)
    ap.add_argument("--wsize-ns", type=int, default=3600 * 10**9)
    ap.add_argument("--read-blocks", type=int, default=0, help="0 = auto")
    ap.add_argument("--resume", action="store_true",
                    help="skip output partitions with matching manifests")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local" if args.input is None else None, include_dashboard=False)

    from ray.data.context import DataContext, ShuffleStrategy

    DataContext.get_current().shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED

    from pymhealth_ray.pipelines.flagship import flagship_features
    from pymhealth_ray.sources.io import default_blocks
    from pymhealth_ray.state.lineage import resumable_write

    path = args.input
    if path is None:
        from pymhealth_ray.sources.generate import ensure_fixture

        path = ensure_fixture("/root/testdata/sf0.01")

    t0 = time.time()
    ds = ray.data.read_parquet(path, override_num_blocks=args.read_blocks or default_blocks())
    ff = flagship_features(ds, gap_ns=args.gap_ns, wsize_ns=args.wsize_ns,
                           num_buckets=args.num_buckets)
    params = {"gap_ns": args.gap_ns, "wsize_ns": args.wsize_ns,
              "num_buckets": args.num_buckets, "input": path, "v": 1}
    if not args.resume:
        import shutil

        shutil.rmtree(args.output, ignore_errors=True)
    manifests = resumable_write(ff, args.output, num_buckets=args.num_buckets, params=params)
    rows = sum(m["rows"] for m in manifests.values())
    print(json.dumps({
        "status": "ok",
        "rows": rows,
        "partitions": len(manifests),
        "sec": round(time.time() - t0, 2),
        "output": args.output,
    }))
    ray.shutdown()


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
