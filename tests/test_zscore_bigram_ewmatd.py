"""Tests for group z-score (stages/normalize.py), bigram LM scoring
(stages/lm.bigram_nll), and time-decay EWMA (stages/ewma.ewma_time_decay)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from pymhealth_ray.stages.ewma import _ewma_td_segment, ewma_time_decay
from pymhealth_ray.stages.lm import bigram_nll
from pymhealth_ray.stages.normalize import group_stats_exact, zscore_by_group


class TestZscore:
    def test_matches_pandas(self, ray_session):
        rng = np.random.default_rng(71)
        df = pd.DataFrame({
            "g": rng.choice(["a", "b", "c"], 2000),
            "v": rng.integers(0, 1000, 2000).astype(np.int64),
            "i": np.arange(2000, dtype=np.int64),
        })
        got = (zscore_by_group(ray.data.from_pandas(df).repartition(6),
                               "g", "v")
               .to_pandas().sort_values("i").reset_index(drop=True))
        exp = df.groupby("g")["v"].transform(
            lambda s: (s - s.mean()) / s.std(ddof=1))
        np.testing.assert_allclose(got["z"].to_numpy(), exp.to_numpy(),
                                   rtol=1e-10)

    def test_stats_exact_and_partition_invariant(self, ray_session):
        df = pd.DataFrame({
            "g": ["a"] * 5 + ["b"] * 3,
            "v": np.array([1, 2, 3, 4, 5, 10, 10, 10], dtype=np.int64),
        })
        for blocks in (1, 4):
            st = group_stats_exact(ray.data.from_pandas(df).repartition(blocks),
                                   "g", "v")
            assert st == {"a": (5, 15, 55), "b": (3, 30, 300)}

    def test_zero_variance_group_is_null(self, ray_session):
        df = pd.DataFrame({"g": ["a", "a", "b"],
                           "v": np.array([7, 7, 1], dtype=np.int64)})
        got = zscore_by_group(ray.data.from_pandas(df), "g", "v").to_pandas()
        assert got["z"].isna().all()


class TestBigramNll:
    def test_matches_brute(self, ray_session):
        rng = np.random.default_rng(72)
        lists = [rng.integers(0, 12, rng.integers(1, 15)).tolist()
                 for _ in range(150)]
        tbl = pa.table({
            "doc_id": pa.array([f"d{i}" for i in range(150)]),
            "ts_ns": pa.array(np.arange(150, dtype=np.int64)),
            "tokens": pa.array(lists, type=pa.list_(pa.int32())),
        })
        out = (bigram_nll(ray.data.from_arrow(tbl).repartition(4),
                          key_mult=16)
               .to_pandas().set_index("doc_id"))

        from collections import Counter
        cab, ca = Counter(), Counter()
        vocab = len({t for l in lists for t in l})
        for l in lists:
            for i in range(len(l) - 1):
                cab[(l[i], l[i + 1])] += 1
                ca[l[i]] += 1
        for i, l in enumerate(lists):
            r = out.loc[f"d{i}"]
            if len(l) < 2:
                assert r["n_slots"] == 0 and np.isnan(r["nll_mean"])
                continue
            terms = [np.log((cab[(l[j], l[j + 1])] + 1) / (ca[l[j]] + vocab))
                     for j in range(len(l) - 1)]
            assert r["n_slots"] == len(l) - 1
            np.testing.assert_allclose(r["nll_mean"],
                                       -(np.sum(terms) / len(terms)),
                                       rtol=1e-12)


class TestEwmaTimeDecay:
    def _brute(self, x, t, tau):
        y = np.empty(len(x))
        for j in range(len(x)):
            w = np.exp(-(t[j] - t[:j + 1]) / tau)
            y[j] = (x[:j + 1] * w).sum() / w.sum()
        return y

    def test_segment_matches_brute(self):
        rng = np.random.default_rng(73)
        t = np.sort(rng.integers(0, 10_000, 300)).astype(np.int64)
        x = rng.normal(10, 3, 300)
        got = _ewma_td_segment(x, t, tau=500.0)
        np.testing.assert_allclose(got, self._brute(x, t, 500.0), rtol=1e-10)

    def test_long_gaps_and_chunk_boundaries(self):
        # gaps far beyond the span guard: old history must fully decay
        t = np.array([0, 1, 2, 10_000_000, 10_000_001], dtype=np.int64)
        x = np.array([100.0, 100.0, 100.0, 1.0, 3.0])
        got = _ewma_td_segment(x, t, tau=10.0)
        assert np.all(np.isfinite(got))
        np.testing.assert_allclose(got[3], 1.0, atol=1e-9)
        d = np.exp(-0.1)
        np.testing.assert_allclose(got[4], (3 + d * 1) / (1 + d), rtol=1e-12)

    def test_distributed_partition_invariant(self, ray_session):
        rng = np.random.default_rng(74)
        n = 1500
        df = pd.DataFrame({
            "e": rng.integers(0, 9, n).astype(np.int64),
            "ts": rng.choice(10**6, n, replace=False).astype(np.int64),
            "v": rng.normal(5, 2, n),
        })
        outs = [ewma_time_decay(ray.data.from_pandas(df).repartition(b),
                                "e", "ts", "v", tau=5000.0, num_buckets=3)
                .to_pandas().sort_values(["e", "ts"]).reset_index(drop=True)
                for b in (1, 7)]
        pd.testing.assert_frame_equal(outs[0], outs[1])
        # spot-check one entity against brute
        g = outs[0][outs[0].e == outs[0].e.iloc[0]]
        brute = self._brute(g["v"].to_numpy(), g["ts"].to_numpy(), 5000.0)
        np.testing.assert_allclose(g["ewma_td"].to_numpy(), brute, rtol=1e-9)
