"""Tests for per-entity EWMA (stages/ewma.py) and skip-gram PMI
(stages/pmi.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from pymhealth_ray.stages.ewma import _ewma_segment, ewma_features
from pymhealth_ray.stages.pmi import pmi_topk, skipgram_pair_counts


class TestEwmaKernel:
    def test_matches_pandas_ewm_short(self):
        rng = np.random.default_rng(3)
        x = rng.normal(5.0, 2.0, 100)
        got = _ewma_segment(x, 0.9)
        exp = pd.Series(x).ewm(alpha=0.1, adjust=True).mean().to_numpy()
        np.testing.assert_allclose(got, exp, rtol=1e-12)

    def test_matches_pandas_ewm_long_crosses_chunks(self):
        # 3000 rows: the naive cumsum trick overflows near ~7k but the
        # renormalized carry must already be exercised (chunk = 512).
        rng = np.random.default_rng(4)
        x = rng.normal(0.0, 100.0, 3000)
        got = _ewma_segment(x, 0.99)
        exp = pd.Series(x).ewm(alpha=0.01, adjust=True).mean().to_numpy()
        np.testing.assert_allclose(got, exp, rtol=1e-10)

    def test_very_long_no_overflow(self):
        x = np.ones(50_000)
        got = _ewma_segment(x, 0.999)
        assert np.all(np.isfinite(got))
        np.testing.assert_allclose(got, 1.0, rtol=1e-9)

    def test_single_element(self):
        np.testing.assert_allclose(_ewma_segment(np.array([7.5]), 0.9), [7.5])


class TestEwmaDistributed:
    def _expected(self, df, alpha):
        q = 1.0 - alpha
        df = df.sort_values(["e", "ts"], kind="mergesort").reset_index(drop=True)
        out = np.empty(len(df))
        for _, g in df.groupby("e", sort=False):
            num = den = 0.0
            y = []
            for xi in g["v"].to_numpy(dtype=float):
                num = xi + q * num
                den = 1.0 + q * den
                y.append(num / den)
            out[g.index.to_numpy()] = y
        df["ewma"] = out
        return df

    def test_matches_single_process(self, ray_session):
        rng = np.random.default_rng(11)
        n = 4000
        df = pd.DataFrame({
            "e": rng.integers(0, 37, n).astype(np.int64),
            "ts": rng.permutation(n).astype(np.int64),
            "v": rng.normal(10.0, 4.0, n),
        })
        got = (ewma_features(ray.data.from_pandas(df).repartition(6),
                             "e", "ts", "v", alpha=0.2, num_buckets=5)
               .to_pandas().sort_values(["e", "ts"]).reset_index(drop=True))
        exp = self._expected(df, 0.2)
        np.testing.assert_allclose(got["ewma"].to_numpy(),
                                   exp["ewma"].to_numpy(), rtol=1e-11)
        assert got["e"].tolist() == exp["e"].tolist()
        assert got["ts"].tolist() == exp["ts"].tolist()

    def test_partition_invariant(self, ray_session):
        rng = np.random.default_rng(12)
        n = 500
        df = pd.DataFrame({
            "e": rng.integers(0, 5, n).astype(np.int64),
            "ts": np.arange(n, dtype=np.int64),
            "v": rng.normal(size=n),
        })
        outs = []
        for blocks in (1, 7):
            outs.append(ewma_features(
                ray.data.from_pandas(df).repartition(blocks),
                "e", "ts", "v", alpha=0.1, num_buckets=3)
                .to_pandas().sort_values(["e", "ts"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])


def _brute_pmi(lists, window, min_count, k, key_mult=2048):
    from collections import Counter

    pairs = Counter()
    for toks in lists:
        for d in range(1, window + 1):
            for i in range(len(toks) - d):
                pairs[(toks[i], toks[i + d])] += 1
    n = sum(pairs.values())
    ca = Counter()
    cb = Counter()
    for (a, b), c in pairs.items():
        ca[a] += c
        cb[b] += c
    rows = []
    for (a, b), c in pairs.items():
        if c < min_count:
            continue
        pmi = np.log(float(n * c) / (ca[a] * cb[b]))
        m = 1e6
        pmi = float(np.sign(pmi) * np.floor(abs(pmi) * m + 0.5) / m)
        rows.append((a, b, c, ca[a], cb[b], pmi))
    rows.sort(key=lambda r: (-r[5], r[0], r[1]))
    return rows[:k], n


class TestPmi:
    def _ds(self, lists, blocks=4):
        tbl = pa.table({"tokens": pa.array(lists, type=pa.list_(pa.int32()))})
        return ray.data.from_arrow(tbl).repartition(blocks)

    def test_pair_counts(self, ray_session):
        lists = [[1, 2, 3], [2, 3], [5]]
        got = {r["key"]: r["c"] for r in
               skipgram_pair_counts(self._ds(lists), window=2,
                                    key_mult=100).take_all()}
        # window-1 pairs: (1,2) (2,3) (2,3) ; window-2: (1,3)
        assert got == {102: 1, 203: 2, 103: 1}

    def test_topk_matches_brute(self, ray_session):
        rng = np.random.default_rng(21)
        lists = [rng.integers(0, 30, rng.integers(2, 40)).tolist()
                 for _ in range(300)]
        out = pmi_topk(self._ds(lists), window=2, min_count=5, k=25,
                       key_mult=64).to_pandas()
        exp, n = _brute_pmi(lists, 2, 5, 25, 64)
        assert len(out) == len(exp)
        for i, (a, b, cab, ca, cb, pmi) in enumerate(exp):
            r = out.iloc[i]
            assert (r.a, r.b, r.cab, r.ca, r.cb) == (a, b, cab, ca, cb)
            assert r.pmi == pmi
            assert r.rn == i + 1

    def test_partition_invariant(self, ray_session):
        rng = np.random.default_rng(22)
        lists = [rng.integers(0, 10, 20).tolist() for _ in range(80)]
        outs = [pmi_topk(self._ds(lists, blocks=b), window=2, min_count=3,
                         k=10, key_mult=16).to_pandas()
                for b in (1, 6)]
        pd.testing.assert_frame_equal(outs[0], outs[1])


class TestEwmaVectorizedPath:
    def test_padded_bit_identical_to_loop_and_small_q(self):
        from pymhealth_ray.stages.ewma import _ewma_all_segments

        rng = np.random.default_rng(6)
        for q in (0.9, 0.5, 0.1, 0.999):
            lens = rng.integers(1, 1500, 120)
            starts = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
            x = rng.normal(10, 5, starts[-1])
            got = _ewma_all_segments(x, starts, q)
            ref = np.empty_like(got)
            for e in range(len(lens)):
                s, t = starts[e], starts[e + 1]
                ref[s:t] = _ewma_segment(x[s:t], q)
            assert np.array_equal(got, ref)
            assert np.all(np.isfinite(got))

    def test_aggressive_alpha_no_overflow(self):
        # alpha=0.9 (q=0.1): q^-512 overflows float64 — the chunk length
        # must adapt (regression: fixed 512-chunk produced NaNs)
        x = np.ones(5000)
        got = _ewma_segment(x, 0.1)
        assert np.all(np.isfinite(got))
        np.testing.assert_allclose(got, 1.0, rtol=1e-12)


class TestPmiNeighbors:
    def test_matches_brute(self, ray_session):
        from pymhealth_ray.stages.pmi import pmi_neighbors

        rng = np.random.default_rng(23)
        lists = [rng.integers(0, 20, 25).tolist() for _ in range(200)]
        tbl = pa.table({"tokens": pa.array(lists, type=pa.list_(pa.int32()))})
        out = (pmi_neighbors(ray.data.from_arrow(tbl).repartition(4),
                             window=2, min_count=3, k_per_token=3,
                             key_mult=32)
               .to_pandas().sort_values(["a", "rn"]).reset_index(drop=True))
        all_rows, _ = _brute_pmi(lists, 2, 3, 10**9, 32)
        from collections import defaultdict
        per_a = defaultdict(list)
        for a, b, cab, ca, cb, pmi in sorted(
                all_rows, key=lambda r: (-r[5], r[1])):
            if len(per_a[a]) < 3:
                per_a[a].append((b, cab, pmi))
        for a, rows in per_a.items():
            sel = out[out.a == a]
            assert len(sel) == len(rows)
            for i, (b, cab, pmi) in enumerate(rows):
                r = sel.iloc[i]
                assert (r.b, r.cab, r.pmi, r.rn) == (b, cab, pmi, i + 1)
