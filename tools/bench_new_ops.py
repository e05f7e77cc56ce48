"""Throughput of the round-2 second-wave operators at bench scale (2M-row
sequences fixture) — the numbers recorded in BASELINE.md's operator table.

Usage: python tools/bench_new_ops.py [rows]
Owns its Ray session (driver contract: the package never calls ray.init).
"""

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import ray


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _bench_fixture, _tune_context, NUM_CPUS
    from pymhealth_ray.sources.io import read_table

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False)
    _tune_context()
    path = _bench_fixture(rows)

    def ds(cols):
        return read_table(path, columns=cols)

    def run(name, fn, n_rows=rows):
        t0 = time.perf_counter()
        res = fn()
        out_rows = res.num_rows if isinstance(res, pa.Table) else res.count()
        dt = time.perf_counter() - t0
        print(json.dumps({"op": name, "sec": round(dt, 2),
                          "rows_per_sec": int(n_rows / dt),
                          "out_rows": int(out_rows)}))

    from pymhealth_ray.stages.cumulative import cumulative_features
    from pymhealth_ray.stages.drift import token_drift_topk
    from pymhealth_ray.stages.ewma import ewma_features, ewma_time_decay
    from pymhealth_ray.stages.lm import bigram_nll
    from pymhealth_ray.stages.normalize import zscore_by_group
    from pymhealth_ray.stages.pca import pca_components, pca_project
    from pymhealth_ray.stages.pmi import pmi_topk
    from pymhealth_ray.stages.resample import resample_ffill
    from pymhealth_ray.stages.rolling import rolling_corr
    from pymhealth_ray.stages.rowfeatures import token_features
    from pymhealth_ray.stages.sample import stratified_sample

    import pyarrow.compute as pc

    HOUR_NS = 3_600_000_000_000

    run("ewma", lambda: ewma_features(
        ds(["doc_id", "ts_ns", "n_tok"]), "doc_id", "ts_ns", "n_tok",
        alpha=0.1, num_buckets=128))
    run("ewma_time_decay", lambda: ewma_time_decay(
        ds(["doc_id", "ts_ns", "n_tok"]), "doc_id", "ts_ns", "n_tok",
        tau=2.0 * HOUR_NS, num_buckets=128))
    run("cumulative", lambda: cumulative_features(
        ds(["doc_id", "ts_ns", "n_tok"]), "doc_id", "ts_ns", "n_tok",
        num_buckets=128))
    run("resample_ffill_1h", lambda: resample_ffill(
        ds(["doc_id", "ts_ns", "n_tok"]), "doc_id", "ts_ns", ["n_tok"],
        step=HOUR_NS, num_buckets=128))
    run("rolling_corr_w16", lambda: rolling_corr(
        token_features(ds(["doc_id", "ts_ns", "n_tok", "tokens"]),
                       features=("sum",), drop_tokens=True),
        "doc_id", "ts_ns", "n_tok", "tok_sum", window=16, num_buckets=128))
    run("zscore_by_source", lambda: zscore_by_group(
        ds(["doc_id", "ts_ns", "source", "n_tok"]), "source", "n_tok"))

    def mixture():
        d = ds(["doc_id", "ts_ns", "source", "n_tok"])

        def add_key(b):
            k = pc.binary_join_element_wise(
                b["doc_id"].cast(pa.string()),
                b["ts_ns"].cast(pa.string()), "-")
            return b.append_column("k", k)

        return stratified_sample(
            d.map_batches(add_key, batch_format="pyarrow"), "source", "k",
            {"web": 0.25, "chat": 0.75, "code": 0.5, "book": 1.0})

    run("stratified_sample", mixture)
    run("pmi_topk_w2", lambda: pmi_topk(ds(["tokens"]), window=2,
                                        min_count=5, k=25))
    run("bigram_nll", lambda: bigram_nll(ds(["doc_id", "ts_ns", "tokens"])))

    def drift():
        d = ds(["source", "tokens"])

        def flag(b):
            return b.append_column("inp", pc.equal(b["source"], "web"))

        return token_drift_topk(d.map_batches(flag, batch_format="pyarrow"),
                                "tokens", "inp", k=25)

    run("token_drift", drift)

    ray.shutdown()


if __name__ == "__main__":
    main()
