"""Tests for MAD outliers (stages/normalize.mad_outliers) and integer
PageRank (stages/graph.pagerank_tokens)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from pymhealth_ray.stages.graph import pagerank_tokens
from pymhealth_ray.stages.normalize import mad_outliers


class TestMadOutliers:
    def test_matches_brute(self, ray_session):
        rng = np.random.default_rng(101)
        n = 2000
        df = pd.DataFrame({
            "g": rng.choice(["a", "b"], n),
            "v": rng.integers(0, 100, n).astype(np.int64),
            "i": np.arange(n, dtype=np.int64),
        })
        # inject obvious outliers
        df.loc[df.index[:5], "v"] = 10_000
        got = (mad_outliers(ray.data.from_pandas(df).repartition(5),
                            "g", "v", k=3.0)
               .to_pandas().sort_values("i").reset_index(drop=True))
        import math

        def qdisc(vals, q):
            s = np.sort(vals)
            return s[max(1, math.ceil(q * len(s))) - 1]

        for grp, sub in df.groupby("g"):
            med = qdisc(sub["v"].to_numpy(), 0.5)
            adev = np.abs(sub["v"].to_numpy() - med)
            mad = qdisc(adev, 0.5)
            sel = got[got.g == grp]
            assert sel["adev"].tolist() == adev.tolist()
            assert sel["is_outlier"].tolist() == (adev > 3.0 * mad).tolist()
        assert got[got.i < 5]["is_outlier"].all()

    def test_outliers_do_not_move_the_flag(self, ray_session):
        # robust: one massive outlier must not suppress detection (z-score
        # would inflate the std; MAD must not)
        v = np.array([10] * 50 + [11] * 50 + [10_000], dtype=np.int64)
        df = pd.DataFrame({"g": "x", "v": v, "i": np.arange(len(v))})
        got = mad_outliers(ray.data.from_pandas(df), "g", "v").to_pandas()
        assert got[got.v == 10_000]["is_outlier"].all()
        assert not got[got.v != 10_000]["is_outlier"].any()


def _tok_ds(lists, blocks=4):
    tbl = pa.table({"tokens": pa.array(lists, type=pa.list_(pa.int32()))})
    return ray.data.from_arrow(tbl).repartition(blocks)


class TestPagerank:
    def test_partition_invariant_bit_identical(self, ray_session):
        rng = np.random.default_rng(102)
        lists = [rng.integers(0, 40, rng.integers(2, 30)).tolist()
                 for _ in range(300)]
        outs = [pagerank_tokens(_tok_ds(lists, b), iters=5, key_mult=64,
                                k=15).to_pandas()
                for b in (1, 7)]
        pd.testing.assert_frame_equal(outs[0], outs[1])

    def test_sink_node_accumulates(self, ray_session):
        # star graph: every sequence ends at token 9 -> 9 must rank first
        lists = [[i % 5, 9] for i in range(100)]
        out = pagerank_tokens(_tok_ds(lists), iters=10, key_mult=16,
                              k=6).to_pandas()
        assert out.iloc[0]["tok"] == 9
        assert out.iloc[0]["rank"] > out.iloc[1]["rank"]

    def test_rank_mass_conserved_approximately(self, ray_session):
        rng = np.random.default_rng(103)
        lists = [rng.integers(0, 10, 12).tolist() for _ in range(50)]
        out = pagerank_tokens(_tok_ds(lists), iters=10, key_mult=16,
                              k=10).to_pandas()
        # all 10 nodes present; total rank ≈ scale (floor-division losses only)
        assert len(out) == 10
        assert 0.9 * 10**12 < out["rank"].sum() <= 10**12
