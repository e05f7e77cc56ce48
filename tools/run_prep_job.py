#!/usr/bin/env python
"""Cluster entrypoint for the corpus-prep pipeline — the training-data-side
counterpart of ``tools/run_flagship_job.py``, handed to ``ray job submit``:

    ray job submit --working-dir . -- \
        python tools/run_prep_job.py \
        --input s3://bucket/documents/ --output s3://bucket/prep/ \
        --num-buckets 4096 --resume

Runs quality filter -> exact dedup -> near-dup cluster drop -> train/eval
split -> greedy packing (pipelines.prep.corpus_prep) and writes the
assignment table bucket-partitioned with per-partition lineage manifests;
--resume skips partitions whose manifest matches the parameter hash.
Locally (no --input) it runs against the driver's sf0.01 documents table.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None, help="documents parquet (default: sf0.01 table)")
    ap.add_argument("--output", default="/tmp/prep_job_out")
    ap.add_argument("--num-buckets", type=int, default=64,
                    help="output partitions ~= total_bytes/256MiB, >= 4x cluster cores")
    ap.add_argument("--min-chars", type=int, default=100)
    ap.add_argument("--jaccard", type=float, default=0.5)
    ap.add_argument("--eval-fraction", type=float, default=0.1)
    ap.add_argument("--salt", default="s")
    ap.add_argument("--max-len", type=int, default=2048)
    ap.add_argument("--read-blocks", type=int, default=0, help="0 = auto")
    ap.add_argument("--resume", action="store_true",
                    help="skip output partitions with matching manifests")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local" if args.input is None else None, include_dashboard=False)

    from pymhealth_ray.tuning import tune_data_context

    tune_data_context()

    from pymhealth_ray.pipelines.prep import corpus_prep
    from pymhealth_ray.sources.io import default_blocks, read_table
    from pymhealth_ray.state.lineage import resumable_write

    path = args.input or "/root/testdata/sf0.01/documents.parquet"

    t0 = time.time()
    docs = read_table(path, columns=["doc_id", "text", "n_chars"],
                      blocks=args.read_blocks or default_blocks())
    out = corpus_prep(docs, min_chars=args.min_chars,
                      jaccard_threshold=args.jaccard,
                      eval_fraction=args.eval_fraction, salt=args.salt,
                      max_len=args.max_len, num_buckets=args.num_buckets)
    params = {"input": path, "min_chars": args.min_chars,
              "jaccard": args.jaccard, "eval_fraction": args.eval_fraction,
              "salt": args.salt, "max_len": args.max_len,
              "num_buckets": args.num_buckets, "v": 1}
    if not args.resume:
        import shutil

        shutil.rmtree(args.output, ignore_errors=True)
    manifests = resumable_write(out, args.output, num_buckets=args.num_buckets,
                                params=params)
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
