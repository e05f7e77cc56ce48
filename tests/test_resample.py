"""Tests for time-grid forward-fill resampling (stages/resample.py)."""

import numpy as np
import pandas as pd
import pytest
import ray

from pymhealth_ray.stages.resample import resample_ffill


def _expected(df, step):
    rows = []
    for e, g in df.sort_values(["e", "ts"]).groupby("e", sort=False):
        ts = g["ts"].to_numpy()
        v = g["v"].to_numpy()
        g0 = -(-ts.min() // step)
        g1 = ts.max() // step
        for t in range(int(g0), int(g1) + 1):
            tick = t * step
            rows.append((e, tick, v[np.searchsorted(ts, tick, side="right") - 1]))
    return pd.DataFrame(rows, columns=["e", "grid_ts", "v"])


class TestResample:
    def test_matches_brute(self, ray_session):
        rng = np.random.default_rng(13)
        n = 2000
        df = pd.DataFrame({
            "e": rng.integers(0, 17, n).astype(np.int64),
            "ts": rng.integers(0, 5000, n).astype(np.int64),
            "v": rng.integers(0, 100, n).astype(np.int64),
        })
        df = df.drop_duplicates(["e", "ts"])
        got = (resample_ffill(ray.data.from_pandas(df).repartition(5),
                              "e", "ts", ["v"], step=100, num_buckets=4)
               .to_pandas().sort_values(["e", "grid_ts"])
               .reset_index(drop=True))
        exp = (_expected(df, 100).sort_values(["e", "grid_ts"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(got, exp)

    def test_grid_alignment_and_span(self, ray_session):
        # obs at ts 150..450: ticks must be 200,300,400 (snapped), ffilled
        df = pd.DataFrame({
            "e": np.array([1, 1, 1], dtype=np.int64),
            "ts": np.array([150, 250, 450], dtype=np.int64),
            "v": np.array([10, 20, 30], dtype=np.int64),
        })
        got = (resample_ffill(ray.data.from_pandas(df), "e", "ts", ["v"],
                              step=100, num_buckets=2)
               .to_pandas().sort_values("grid_ts").reset_index(drop=True))
        assert got["grid_ts"].tolist() == [200, 300, 400]
        assert got["v"].tolist() == [10, 20, 20]

    def test_short_span_entity_emits_nothing(self, ray_session):
        df = pd.DataFrame({
            "e": np.array([1, 1, 2], dtype=np.int64),
            "ts": np.array([101, 150, 500], dtype=np.int64),
            "v": np.array([1, 2, 3], dtype=np.int64),
        })
        got = resample_ffill(ray.data.from_pandas(df), "e", "ts", ["v"],
                             step=100, num_buckets=2).to_pandas()
        # entity 1 spans (101,150): no tick inside; entity 2 sits ON a tick
        assert got["e"].tolist() == [2]
        assert got["grid_ts"].tolist() == [500]
        assert got["v"].tolist() == [3]

    def test_partition_invariant(self, ray_session):
        rng = np.random.default_rng(14)
        df = pd.DataFrame({
            "e": rng.integers(0, 5, 300).astype(np.int64),
            "ts": rng.choice(10_000, 300, replace=False).astype(np.int64),
            "v": rng.normal(size=300),
        })
        outs = [resample_ffill(ray.data.from_pandas(df).repartition(b),
                               "e", "ts", ["v"], step=500, num_buckets=3)
                .to_pandas().sort_values(["e", "grid_ts"])
                .reset_index(drop=True)
                for b in (1, 8)]
        pd.testing.assert_frame_equal(outs[0], outs[1])

    def test_rejects_bad_step(self, ray_session):
        df = pd.DataFrame({"e": [1], "ts": [1], "v": [1]})
        with pytest.raises(ValueError):
            resample_ffill(ray.data.from_pandas(df), "e", "ts", ["v"], step=0)
