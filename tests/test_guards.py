"""Round-5 overflow / empty-input guards (ADVICE r4): packed-key domain
checks in the pair/triple miners, arbitrary-precision fano finish, and
the streaming_rolling zero-batch scan guard."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from pymhealth_ray.stages.triangles import group_pair_rows


def test_group_pair_rows_rejects_overflowing_K():
    tbl = pa.table({"g": ["a"], "i": pa.array([0], type=pa.int64())})
    with pytest.raises(ValueError, match="overflows int64"):
        group_pair_rows(tbl, "g", "i", K=2 ** 32)


def test_frequent_triples_rejects_overflowing_K():
    from pymhealth_ray.stages.assoc import frequent_triples
    with pytest.raises(ValueError, match="overflows int64"):
        # K³ ≥ 2⁶³ trips before the dataset is touched
        frequent_triples(None, "g", "i", max_item=2_100_000,
                         min_support=2)


def test_fano_exact_matches_bigint_beyond_int64():
    from pymhealth_ray.pipelines.queries import _fano_exact
    # sq ~ 4.6e18: n·sq wraps int64 (n=4) — the guarded path must match
    # exact integer arithmetic cast to double, per-row
    n = np.array([4, 3, 2, 1], dtype=np.int64)
    s = np.array([4_000_000_000, 9, 3_100_000_000, 7], dtype=np.int64)
    sq = np.array([4_600_000_000_000_000_000, 29,
                   4_805_000_000_000_000_000, 49], dtype=np.int64)
    got = _fano_exact(n, s, sq)
    want = np.array([float(int(ni) * int(qi) - int(si) ** 2)
                     / float(int(ni) * int(si))
                     for ni, si, qi in zip(n, s, sq)])
    assert (got == want).all()


def test_fano_exact_fast_path_small_values():
    from pymhealth_ray.pipelines.queries import _fano_exact
    rng = np.random.default_rng(11)
    c = rng.integers(1, 50, size=(20, 5))
    n = np.full(20, 5, dtype=np.int64)
    s = c.sum(1)
    sq = (c * c).sum(1)
    got = _fano_exact(n, s, sq)
    want = (n * sq - s * s).astype(float) / (n * s).astype(float)
    assert (got == want).all()


def test_streaming_rolling_all_empty_partition_files(ray_session, tmp_path):
    """A layout whose partition files hold ZERO rows must scan to a typed
    empty table, not raise ArrowInvalid (ADVICE r4)."""
    from pymhealth_ray.stages.streaming import streaming_rolling

    layout = tmp_path / "RZ"
    part = layout / "part=0"
    part.mkdir(parents=True)
    empty = pa.table({"doc_id": pa.array([], type=pa.string()),
                      "ts_ns": pa.array([], type=pa.int64()),
                      "n_tok": pa.array([], type=pa.int64())})
    pq.write_table(empty, part / "b0.parquet")
    got = streaming_rolling(str(layout), window=4)
    assert got.count() == 0
    assert set(got.schema().names) == {"doc_id", "ts_ns", "n_tok",
                                       "wsum", "wn"}
