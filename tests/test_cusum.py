"""stages/cusum: clamped-scan closed form vs a sequential reference loop,
plus partitioning invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from pymhealth_ray.stages.cusum import cusum


def _seq_reference(df, k):
    out = []
    for _, g in df.sort_values(["user", "ts"]).groupby("user", sort=True):
        s = 0
        for v in g.v.tolist():
            s = max(0, s + (v - k))
            out.append(s)
    return np.array(out, dtype=np.int64)


def test_matches_sequential_recurrence(ray_session):
    rng = np.random.default_rng(21)
    n = 4000
    df = pd.DataFrame({
        "user": rng.integers(0, 37, n).astype(np.int64),
        "ts": rng.permutation(n).astype(np.int64),
        "v": rng.integers(0, 200, n).astype(np.int64),
    })
    k, h = 90, 300
    got = (cusum(ray.data.from_pandas(df).repartition(6),
                 "user", "ts", "v", k=k, h=h, num_buckets=5)
           .to_pandas().sort_values(["user", "ts"]).reset_index(drop=True))
    want = _seq_reference(df, k)
    assert (got.cusum.to_numpy() == want).all()
    assert (got.alarm.to_numpy() == (want > h)).all()
    assert got.alarm.any() and not got.alarm.all()


def test_partition_invariance(ray_session):
    rng = np.random.default_rng(22)
    n = 2000
    df = pd.DataFrame({
        "user": rng.integers(0, 11, n).astype(np.int64),
        "ts": np.arange(n, dtype=np.int64),
        "v": rng.integers(-50, 50, n).astype(np.int64),
    })
    outs = [
        (cusum(ray.data.from_pandas(df).repartition(p),
               "user", "ts", "v", k=0, h=40, num_buckets=b)
         .to_pandas().sort_values(["user", "ts"]).reset_index(drop=True))
        for p, b in ((1, 1), (9, 7))
    ]
    pd.testing.assert_frame_equal(outs[0], outs[1])


class TestHampel:
    def test_matches_naive_windows(self, ray_session):
        from pymhealth_ray.stages.hampel import hampel_filter

        rng = np.random.default_rng(31)
        n = 1500
        df = pd.DataFrame({
            "user": rng.integers(0, 13, n).astype(np.int64),
            "ts": np.arange(n, dtype=np.int64),
            "v": rng.integers(0, 1000, n).astype(np.int64),
        })
        k = 3
        got = (hampel_filter(ray.data.from_pandas(df).repartition(5),
                             "user", "ts", "v", k=k, num_buckets=4)
               .to_pandas().sort_values(["user", "ts"]).reset_index(drop=True))
        ref_med, ref_mad = [], []
        for _, g in df.sort_values(["user", "ts"]).groupby("user", sort=True):
            vals = g.v.to_numpy().astype(np.float64)
            for i in range(len(vals)):
                w = vals[max(0, i - k): i + k + 1]
                m = np.median(w)
                ref_med.append(m)
                ref_mad.append(np.median(np.abs(w - m)))
        assert (got.med.to_numpy() == np.array(ref_med)).all()
        assert (got.mad.to_numpy() == np.array(ref_mad)).all()
        # planted extreme spike is flagged
        df2 = df.copy()
        df2.loc[df2.index[100], "v"] = 10**7
        got2 = (hampel_filter(ray.data.from_pandas(df2), "user", "ts", "v",
                              k=k, num_buckets=2)
                .to_pandas())
        u, t = df2.loc[df2.index[100], ["user", "ts"]]
        assert bool(got2[(got2.user == u) & (got2.ts == t)].spike.iloc[0])
