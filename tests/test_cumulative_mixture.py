"""Tests for per-entity cumulative features (stages/cumulative.py) and
stratified mixture sampling (stages/sample.stratified_sample)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from pymhealth_ray.stages.cumulative import cumulative_features
from pymhealth_ray.stages.sample import hash_sample, stratified_sample


class TestCumulative:
    def test_matches_pandas(self, ray_session):
        rng = np.random.default_rng(5)
        n = 3000
        df = pd.DataFrame({
            "e": rng.integers(0, 23, n).astype(np.int64),
            "ts": rng.permutation(n).astype(np.int64),
            "v": rng.integers(-100, 500, n).astype(np.int32),
        })
        got = (cumulative_features(ray.data.from_pandas(df).repartition(5),
                                   "e", "ts", "v", num_buckets=4)
               .to_pandas().sort_values(["e", "ts"]).reset_index(drop=True))
        exp = df.sort_values(["e", "ts"]).reset_index(drop=True)
        g = exp.groupby("e", sort=False)["v"]
        assert got["cum_sum"].tolist() == g.cumsum().tolist()
        assert got["cum_max"].tolist() == g.cummax().tolist()
        assert got["seq_idx"].tolist() == (g.cumcount() + 1).tolist()

    def test_negative_values_and_singletons(self, ray_session):
        df = pd.DataFrame({
            "e": np.array([1, 1, 1, 2], dtype=np.int64),
            "ts": np.array([0, 1, 2, 0], dtype=np.int64),
            "v": np.array([-5, -7, 10, -3], dtype=np.int64),
        })
        got = (cumulative_features(ray.data.from_pandas(df), "e", "ts", "v",
                                   num_buckets=2)
               .to_pandas().sort_values(["e", "ts"]).reset_index(drop=True))
        assert got["cum_sum"].tolist() == [-5, -12, -2, -3]
        assert got["cum_max"].tolist() == [-5, -5, 10, -3]
        assert got["seq_idx"].tolist() == [1, 2, 3, 1]

    def test_rejects_out_of_range(self, ray_session):
        df = pd.DataFrame({
            "e": np.array([1], dtype=np.int64),
            "ts": np.array([0], dtype=np.int64),
            "v": np.array([2**40], dtype=np.int64),
        })
        with pytest.raises(Exception):
            cumulative_features(ray.data.from_pandas(df), "e", "ts", "v",
                                num_buckets=1).to_pandas()


class TestStratifiedSample:
    def _df(self, n=6000, seed=7):
        rng = np.random.default_rng(seed)
        return pd.DataFrame({
            "k": [f"r{i}" for i in range(n)],
            "s": rng.choice(["a", "b", "c"], n, p=[0.5, 0.3, 0.2]),
        })

    def test_rates_and_determinism(self, ray_session):
        df = self._df()
        rates = {"a": 0.25, "b": 1.0, "c": 0.0}
        out = (stratified_sample(ray.data.from_pandas(df).repartition(4),
                                 "s", "k", rates)
               .to_pandas().sort_values("k").reset_index(drop=True))
        # every 'b' row kept, no 'c' rows, 'a' near its rate
        n_a = (df.s == "a").sum()
        got_a = (out.s == "a").sum()
        assert (out.s == "b").sum() == (df.s == "b").sum()
        assert (out.s == "c").sum() == 0
        assert abs(got_a / n_a - 0.25) < 0.05
        out2 = (stratified_sample(ray.data.from_pandas(df).repartition(9),
                                  "s", "k", rates)
                .to_pandas().sort_values("k").reset_index(drop=True))
        pd.testing.assert_frame_equal(out, out2)

    def test_consistent_with_hash_sample(self, ray_session):
        # a single-stratum table at rate r must equal hash_sample(r)
        df = self._df(2000)
        df["s"] = "only"
        a = (stratified_sample(ray.data.from_pandas(df), "s", "k",
                               {"only": 0.4}).to_pandas()
             .sort_values("k").reset_index(drop=True))
        b = (hash_sample(ray.data.from_pandas(df), "k", 0.4).to_pandas()
             .sort_values("k").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)

    def test_default_rate_for_unknown_stratum(self, ray_session):
        df = self._df(1000)
        out = stratified_sample(ray.data.from_pandas(df), "s", "k",
                                {"a": 1.0}, default_rate=0.0).to_pandas()
        assert set(out.s) == {"a"}


class TestQuantileBucket:
    def test_matches_pandas_qcut_semantics(self, ray_session):
        from pymhealth_ray.stages.normalize import bucket_by_group_quantiles

        rng = np.random.default_rng(81)
        df = pd.DataFrame({
            "g": rng.choice(["a", "b"], 1500),
            "v": rng.integers(0, 300, 1500).astype(np.int64),
            "i": np.arange(1500, dtype=np.int64),
        })
        got = (bucket_by_group_quantiles(
            ray.data.from_pandas(df).repartition(5), "g", "v")
            .to_pandas().sort_values("i").reset_index(drop=True))
        # brute: quantile_disc thresholds sorted[ceil(q*n)-1]
        import math
        for grp, sub in df.groupby("g"):
            vals = np.sort(sub["v"].to_numpy())
            thr = [vals[max(1, math.ceil(q * len(vals))) - 1]
                   for q in (0.25, 0.5, 0.75)]
            sel = got[got.g == grp]
            exp = 1 + (sel["v"].to_numpy()[:, None] >
                       np.array(thr)[None, :]).sum(axis=1)
            assert sel["qbucket"].tolist() == exp.tolist()
        # buckets roughly balanced
        frac = got.groupby("qbucket").size() / len(got)
        assert (frac > 0.15).all()


class TestNullGuard:
    def test_integer_kernels_refuse_nulls(self, ray_session):
        import pytest as _pytest

        df = pd.DataFrame({
            "e": np.array([1, 1], dtype=np.int64),
            "ts": np.array([0, 1], dtype=np.int64),
            "v": pd.array([1, None], dtype="Int64"),
        })
        with _pytest.raises(Exception, match="null"):
            cumulative_features(ray.data.from_pandas(df), "e", "ts", "v",
                                num_buckets=1).to_pandas()


class TestPercentRank:
    def test_matches_pandas_min_rank(self, ray_session):
        from pymhealth_ray.stages.normalize import percent_rank_by_group

        rng = np.random.default_rng(151)
        df = pd.DataFrame({
            "g": rng.choice(["a", "b"], 1000),
            "v": rng.integers(0, 50, 1000).astype(np.int64),
            "i": np.arange(1000, dtype=np.int64),
        })
        got = (percent_rank_by_group(
            ray.data.from_pandas(df).repartition(4), "g", "v")
            .to_pandas().sort_values("i").reset_index(drop=True))
        exp = df.groupby("g")["v"].transform(
            lambda s: (s.rank(method="min") - 1) / (len(s) - 1))
        np.testing.assert_allclose(got["pr"].to_numpy(), exp.to_numpy(),
                                   rtol=1e-12)

    def test_singleton_group_null(self, ray_session):
        from pymhealth_ray.stages.normalize import percent_rank_by_group

        df = pd.DataFrame({"g": ["x", "y", "y"],
                           "v": np.array([5, 1, 2], dtype=np.int64)})
        got = percent_rank_by_group(ray.data.from_pandas(df),
                                    "g", "v").to_pandas()
        assert np.isnan(got[got.g == "x"]["pr"]).all()
        assert sorted(got[got.g == "y"]["pr"].tolist()) == [0.0, 1.0]


class TestCompact:
    def test_keeps_changes_only(self, ray_session):
        from pymhealth_ray.stages.lag import compact_unchanged

        df = pd.DataFrame({
            "e": np.array([1, 1, 1, 1, 2], dtype=np.int64),
            "ts": np.array([0, 1, 2, 3, 0], dtype=np.int64),
            "v": ["a", "a", "b", "b", "a"],
        })
        got = (compact_unchanged(ray.data.from_pandas(df), "e", "ts", "v",
                                 num_buckets=2)
               .to_pandas().sort_values(["e", "ts"]).reset_index(drop=True))
        assert got["ts"].tolist() == [0, 2, 0]
        assert got["v"].tolist() == ["a", "b", "a"]

    def test_partition_invariant(self, ray_session):
        from pymhealth_ray.stages.lag import compact_unchanged

        rng = np.random.default_rng(161)
        df = pd.DataFrame({
            "e": rng.integers(0, 7, 800).astype(np.int64),
            "ts": np.arange(800, dtype=np.int64),
            "v": rng.choice(["x", "y"], 800),
        })
        outs = [compact_unchanged(ray.data.from_pandas(df).repartition(b),
                                  "e", "ts", "v", num_buckets=3)
                .to_pandas().sort_values(["e", "ts"]).reset_index(drop=True)
                for b in (1, 6)]
        pd.testing.assert_frame_equal(outs[0], outs[1])
