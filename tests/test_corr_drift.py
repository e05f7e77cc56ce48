"""Tests for rolling correlation (stages/rolling.rolling_corr) and token
distribution drift (stages/drift.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from pymhealth_ray.stages.drift import token_drift_topk, token_slice_counts
from pymhealth_ray.stages.rolling import rolling_corr


class TestRollingCorr:
    def test_matches_pandas(self, ray_session):
        rng = np.random.default_rng(31)
        n = 2500
        df = pd.DataFrame({
            "e": rng.integers(0, 19, n).astype(np.int64),
            "ts": rng.permutation(n).astype(np.int64),
            "x": rng.integers(0, 200, n).astype(np.int64),
            "y": rng.integers(0, 5000, n).astype(np.int64),
        })
        got = (rolling_corr(ray.data.from_pandas(df).repartition(5),
                            "e", "ts", "x", "y", window=8, num_buckets=4)
               .to_pandas().sort_values(["e", "ts"]).reset_index(drop=True))
        exp = df.sort_values(["e", "ts"]).reset_index(drop=True)
        ref = (exp.groupby("e", sort=False)
               .apply(lambda g: g["x"].rolling(8, min_periods=1)
                      .corr(g["y"]), include_groups=False)
               .reset_index(drop=True))
        g = got["corr"].to_numpy()
        r = ref.to_numpy()
        valid = ~np.isnan(r)
        # pandas emits NaN where var==0; engine emits NULL->NaN
        assert np.array_equal(np.isnan(g), ~valid)
        np.testing.assert_allclose(g[valid], r[valid], atol=1e-10)

    def test_constant_window_is_null(self, ray_session):
        df = pd.DataFrame({
            "e": np.ones(5, dtype=np.int64),
            "ts": np.arange(5, dtype=np.int64),
            "x": np.array([3, 3, 3, 3, 4], dtype=np.int64),
            "y": np.array([1, 2, 3, 4, 5], dtype=np.int64),
        })
        got = (rolling_corr(ray.data.from_pandas(df), "e", "ts", "x", "y",
                            window=3, num_buckets=1)
               .to_pandas().sort_values("ts"))
        # first row: n=1 -> null; rows where x is constant -> null
        assert np.isnan(got["corr"].iloc[0])
        assert np.isnan(got["corr"].iloc[1])
        assert np.isnan(got["corr"].iloc[2])
        assert not np.isnan(got["corr"].iloc[4])

    def test_partition_invariant(self, ray_session):
        rng = np.random.default_rng(32)
        df = pd.DataFrame({
            "e": rng.integers(0, 4, 400).astype(np.int64),
            "ts": np.arange(400, dtype=np.int64),
            "x": rng.integers(0, 50, 400).astype(np.int64),
            "y": rng.integers(0, 50, 400).astype(np.int64),
        })
        outs = [rolling_corr(ray.data.from_pandas(df).repartition(b),
                             "e", "ts", "x", "y", window=5, num_buckets=3)
                .to_pandas().sort_values(["e", "ts"]).reset_index(drop=True)
                for b in (1, 7)]
        pd.testing.assert_frame_equal(outs[0], outs[1])


def _mk_token_ds(lists, flags, blocks=4):
    tbl = pa.table({
        "tokens": pa.array(lists, type=pa.list_(pa.int32())),
        "inp": pa.array(flags, type=pa.bool_()),
    })
    return ray.data.from_arrow(tbl).repartition(blocks)


class TestDrift:
    def test_counts(self, ray_session):
        ds = _mk_token_ds([[1, 1, 2], [2, 3]], [True, False])
        got = {r["tok"]: (r["cp"], r["cq"])
               for r in token_slice_counts(ds, "tokens", "inp").take_all()}
        assert got == {1: (2, 0), 2: (1, 1), 3: (0, 1)}

    def test_topk_matches_brute(self, ray_session):
        rng = np.random.default_rng(41)
        lists, flags = [], []
        for i in range(400):
            inp = bool(i % 3)
            # make the distributions genuinely different
            hi = 20 if inp else 40
            lists.append(rng.integers(0, hi, rng.integers(1, 30)).tolist())
            flags.append(inp)
        out = token_drift_topk(_mk_token_ds(lists, flags), "tokens", "inp",
                               k=10).to_pandas()

        from collections import Counter
        cp, cq = Counter(), Counter()
        for toks, f in zip(lists, flags):
            (cp if f else cq).update(toks)
        vocab = len(set(cp) | set(cq))
        n_p, n_q = sum(cp.values()), sum(cq.values())
        rows = []
        for t in set(cp) | set(cq):
            p = (cp[t] + 1) / (n_p + vocab)
            q = (cq[t] + 1) / (n_q + vocab)
            c = p * np.log(p / q)
            m = 1e6
            rows.append((t, float(np.sign(c) * np.floor(abs(c) * m + 0.5) / m)))
        rows.sort(key=lambda r: (-r[1], r[0]))
        for i, (t, c) in enumerate(rows[:10]):
            assert out.iloc[i].tok == t
            assert out.iloc[i].contrib == c
            assert out.iloc[i].rn == i + 1

    def test_partition_invariant(self, ray_session):
        rng = np.random.default_rng(42)
        lists = [rng.integers(0, 15, 10).tolist() for _ in range(100)]
        flags = [bool(i % 2) for i in range(100)]
        outs = [token_drift_topk(_mk_token_ds(lists, flags, blocks=b),
                                 "tokens", "inp", k=8).to_pandas()
                for b in (1, 6)]
        pd.testing.assert_frame_equal(outs[0], outs[1])
