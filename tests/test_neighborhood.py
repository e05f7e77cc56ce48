"""Tests for sorted-neighborhood blocking (stages/neighborhood.py),
including adversarial bucket distributions (skew, tiny/empty buckets,
windows wider than buckets)."""

import numpy as np
import pandas as pd
import pytest
import ray

from pymhealth_ray.stages.neighborhood import sorted_neighborhood_pairs


def _expected_pairs(keys, ids, window):
    order = sorted(range(len(ids)), key=lambda i: (keys[i], ids[i]))
    out = set()
    for i in range(len(order)):
        for d in range(1, window + 1):
            if i + d < len(order):
                a, b = order[i], order[i + d]
                out.add((ids[a], ids[b], keys[a], keys[b], d))
    return out


def _got_pairs(df):
    return set(map(tuple, df[["id_a", "id_b", "key_a", "key_b", "d"]]
                   .itertuples(index=False)))


@pytest.mark.parametrize("dist,window,buckets", [
    ("uniform", 2, 8),
    ("uniform", 5, 8),      # window wider than many bucket populations
    ("zipf", 2, 8),         # heavy skew: most rows in one bucket
    ("sparse", 3, 16),      # many empty buckets, tiny occupied ones
])
def test_pairs_exact(ray_session, dist, window, buckets):
    rng = np.random.default_rng(hash(dist) % 2**31)
    n = 250
    if dist == "uniform":
        keys = rng.integers(0, 1000, n)
    elif dist == "zipf":
        keys = np.minimum((rng.pareto(0.8, n) * 3).astype(np.int64), 999)
    else:
        keys = rng.choice([5, 6, 990, 991, 992], n)
    ids = np.arange(n, dtype=np.int64)
    df = pd.DataFrame({"doc_id": ids, "k": keys.astype(np.int64)})
    got = (sorted_neighborhood_pairs(
               ray.data.from_pandas(df).repartition(5), "k", "doc_id",
               window=window, num_buckets=buckets)
           .to_pandas())
    exp = _expected_pairs(keys.tolist(), ids.tolist(), window)
    assert _got_pairs(got) == exp
    assert len(got) == len(exp)  # no duplicate pairs


def test_single_bucket_and_tiny_input(ray_session):
    df = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64),
                       "k": np.array([7, 7, 7], dtype=np.int64)})
    got = sorted_neighborhood_pairs(ray.data.from_pandas(df), "k", "doc_id",
                                    window=4, num_buckets=4).to_pandas()
    exp = _expected_pairs([7, 7, 7], [0, 1, 2], 4)
    assert _got_pairs(got) == exp
