"""Tests for as-of with staleness tolerance and trailing-window z-score."""

import numpy as np
import pandas as pd
import ray

from pymhealth_ray.stages.asof import asof_join_tolerance
from pymhealth_ray.stages.rolling import rolling_zscore


class TestAsofTolerance:
    def test_stale_matches_nulled(self, ray_session):
        facts = pd.DataFrame({
            "e": np.array([1, 1, 1, 1], dtype=np.int64),
            "ts": np.array([100, 150, 300, 1000], dtype=np.int64),
        })
        dim = pd.DataFrame({
            "e": np.array([1, 1], dtype=np.int64),
            "ts": np.array([90, 280], dtype=np.int64),
            "v": np.array([7, 9], dtype=np.int64),
        })
        got = (asof_join_tolerance(ray.data.from_pandas(facts),
                                   ray.data.from_pandas(dim), ["v"],
                                   tolerance=100, entity_col="e",
                                   ts_col="ts", num_buckets=2)
               .to_pandas().sort_values("ts").reset_index(drop=True))
        # ts=100 -> dim 90 (age 10, fresh); 150 -> 90 (60, fresh);
        # 300 -> 280 (20, fresh); 1000 -> 280 (720, STALE -> null)
        assert got["v_asof"].tolist()[:3] == [7, 7, 9]
        assert np.isnan(got["v_asof"].iloc[3])
        assert np.isnan(got["ts_asof"].iloc[3])
        assert got["ts_asof"].tolist()[:3] == [90, 90, 280]

    def test_no_match_stays_null(self, ray_session):
        facts = pd.DataFrame({"e": np.array([5], dtype=np.int64),
                              "ts": np.array([10], dtype=np.int64)})
        dim = pd.DataFrame({"e": np.array([5], dtype=np.int64),
                            "ts": np.array([50], dtype=np.int64),
                            "v": np.array([1], dtype=np.int64)})
        got = asof_join_tolerance(ray.data.from_pandas(facts),
                                  ray.data.from_pandas(dim), ["v"],
                                  tolerance=1000, entity_col="e",
                                  ts_col="ts", num_buckets=1).to_pandas()
        assert np.isnan(got["v_asof"].iloc[0])


class TestRollingZscore:
    def test_matches_pandas(self, ray_session):
        rng = np.random.default_rng(111)
        n = 2000
        df = pd.DataFrame({
            "e": rng.integers(0, 13, n).astype(np.int64),
            "ts": rng.permutation(n).astype(np.int64),
            "v": rng.integers(0, 500, n).astype(np.int64),
        })
        got = (rolling_zscore(ray.data.from_pandas(df).repartition(4),
                              "e", "ts", "v", window=8, num_buckets=3)
               .to_pandas().sort_values(["e", "ts"]).reset_index(drop=True))
        exp = df.sort_values(["e", "ts"]).reset_index(drop=True)
        g = exp.groupby("e", sort=False)["v"]
        mean = g.transform(lambda s: s.rolling(8, min_periods=1).mean())
        std = g.transform(lambda s: s.rolling(8, min_periods=1).std(ddof=1))
        ref = ((exp["v"] - mean) / std).to_numpy()
        gv = got["rz"].to_numpy()
        valid = ~np.isnan(ref) & (std.to_numpy() > 0)
        assert np.array_equal(np.isnan(gv), ~valid)
        np.testing.assert_allclose(gv[valid], ref[valid], atol=1e-10)


class TestTemporalPack:
    def test_columns_match_standalone_stages(self, ray_session):
        from pymhealth_ray.stages.cumulative import cumulative_features
        from pymhealth_ray.stages.rolling import rolling_zscore
        from pymhealth_ray.stages.temporal import temporal_feature_pack

        rng = np.random.default_rng(121)
        n = 1200
        df = pd.DataFrame({
            "e": rng.integers(0, 11, n).astype(np.int64),
            "ts": rng.permutation(n).astype(np.int64),
            "v": rng.integers(0, 400, n).astype(np.int64),
        })
        ds = ray.data.from_pandas(df).repartition(4)
        pack = (temporal_feature_pack(ds, "e", "ts", "v", window=16,
                                      num_buckets=3)
                .to_pandas().sort_values(["e", "ts"]).reset_index(drop=True))
        cum = (cumulative_features(ds, "e", "ts", "v", num_buckets=3)
               .to_pandas().sort_values(["e", "ts"]).reset_index(drop=True))
        rz = (rolling_zscore(ds, "e", "ts", "v", window=16, num_buckets=3)
              .to_pandas().sort_values(["e", "ts"]).reset_index(drop=True))
        for c in ("cum_sum", "cum_max", "seq_idx"):
            assert pack[c].tolist() == cum[c].tolist()
        pd.testing.assert_series_equal(pack["rz"], rz["rz"])
        # lag/diff: head of each entity is NULL, rest shifted
        exp = df.sort_values(["e", "ts"]).reset_index(drop=True)
        lag = exp.groupby("e", sort=False)["v"].shift(1)
        assert np.array_equal(pack["lag1"].isna(), lag.isna())
        valid = ~lag.isna()
        assert pack["lag1"][valid].tolist() == lag[valid].tolist()
        assert pack["diff1"][valid].tolist() == (exp["v"] - lag)[valid].tolist()
