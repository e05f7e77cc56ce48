"""Round-3 operators: funnel, linear-interp resample, constraint checks."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from pymhealth_ray.stages.funnel import funnel_steps
from pymhealth_ray.stages.profile import constraint_checks
from pymhealth_ray.stages.resample import resample_ffill, resample_interp


class TestFunnel:
    def _ds(self, rows, blocks=3):
        df = pd.DataFrame(rows, columns=["user_id", "ts_us", "event_type"])
        return ray.data.from_pandas(df).repartition(blocks)

    def test_earliest_chain(self, ray_session):
        rows = [
            # u1 completes: view@10, click@20, purchase@30 (ignores later dups)
            (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
            (1, 5, "click"),          # click BEFORE first view: not chained
            (1, 40, "view"),
            # u2 stalls at click (purchase before click)
            (2, 10, "view"), (2, 5, "purchase"), (2, 20, "click"),
            # u3 never views
            (3, 10, "click"), (3, 20, "purchase"),
            # u4 only unrelated events
            (4, 10, "error"),
        ]
        got = (funnel_steps(self._ds(rows), ("view", "click", "purchase"),
                            num_buckets=4)
               .to_pandas().sort_values("user_id").reset_index(drop=True))
        assert got.reached.tolist() == [3, 2, 0, 0]
        assert got.t1.tolist()[:2] == [10, 10]
        assert got.t2.tolist()[:2] == [20, 20]
        assert got.t3.iloc[0] == 30 and pd.isna(got.t3.iloc[1])
        assert pd.isna(got.t1.iloc[2]) and pd.isna(got.t1.iloc[3])

    def test_strictly_after_ties(self, ray_session):
        # click at the SAME ts as view must not count (strict >)
        rows = [(1, 10, "view"), (1, 10, "click"), (1, 11, "click")]
        got = funnel_steps(self._ds(rows, 1), ("view", "click"),
                           num_buckets=2).to_pandas()
        assert got.reached.tolist() == [2]
        assert got.t2.tolist() == [11]

    def test_partition_invariant(self, ray_session):
        rng = np.random.default_rng(19)
        rows = [(int(rng.integers(0, 40)), int(rng.integers(0, 10**6)),
                 str(rng.choice(["view", "click", "purchase", "error"])))
                for _ in range(3000)]
        outs = [funnel_steps(self._ds(rows, b), ("view", "click", "purchase"),
                             num_buckets=8)
                .to_pandas().sort_values("user_id").reset_index(drop=True)
                for b in (1, 13)]
        pd.testing.assert_frame_equal(outs[0], outs[1])
        assert outs[0].reached.max() == 3  # non-trivial fixture


class TestResampleInterp:
    def test_linear_between_and_on_obs(self, ray_session):
        df = pd.DataFrame({
            "user_id": [1] * 3,
            "ts_us": [0, 100, 300],
            "value": [0.0, 10.0, 30.0],
            "event_id": [1, 2, 3],
        })
        got = (resample_interp(ray.data.from_pandas(df), "user_id", "ts_us",
                               "value", 50, tiebreak_col="event_id",
                               num_buckets=2)
               .to_pandas().sort_values("grid_ts").reset_index(drop=True))
        assert got.grid_ts.tolist() == [0, 50, 100, 150, 200, 250, 300]
        np.testing.assert_allclose(got.value_interp.tolist(),
                                   [0, 5, 10, 15, 20, 25, 30])

    def test_tie_collapse_max_tiebreak(self, ray_session):
        df = pd.DataFrame({
            "user_id": [1, 1, 1],
            "ts_us": [0, 100, 100],      # tie at 100
            "value": [0.0, 99.0, 10.0],  # event_id 3 wins -> 10.0
            "event_id": [1, 2, 3],
        })
        got = (resample_interp(ray.data.from_pandas(df), "user_id", "ts_us",
                               "value", 50, tiebreak_col="event_id",
                               num_buckets=2)
               .to_pandas().sort_values("grid_ts").reset_index(drop=True))
        np.testing.assert_allclose(got.value_interp.tolist(), [0, 5, 10])

    def test_matches_ffill_on_ticks_at_obs(self, ray_session):
        rng = np.random.default_rng(3)
        n = 400
        df = pd.DataFrame({
            "user_id": rng.integers(0, 10, n),
            "ts_us": rng.integers(0, 10**5, n),
            "value": rng.random(n),
            "event_id": np.arange(n),
        }).drop_duplicates(["user_id", "ts_us"])
        ds = ray.data.from_pandas(df.reset_index(drop=True))
        fi = (resample_interp(ds, "user_id", "ts_us", "value", 1000,
                              tiebreak_col="event_id", num_buckets=4)
              .to_pandas())
        ff = (resample_ffill(ds, "user_id", "ts_us", ["value"], 1000,
                             tiebreak_col="event_id", num_buckets=4)
              .to_pandas())
        assert len(fi) == len(ff)
        # single-process replication
        for uid, g in df.groupby("user_id"):
            g = g.sort_values("ts_us")
            ts, v = g.ts_us.values, g.value.values
            sub = (fi[fi.user_id == uid].sort_values("grid_ts")
                   .reset_index(drop=True))
            exp = np.interp(sub.grid_ts.values, ts, v)
            np.testing.assert_allclose(sub.value_interp.values, exp,
                                       rtol=0, atol=1e-12)


class TestConstraintChecks:
    def test_matches_pandas(self, ray_session):
        rng = np.random.default_rng(8)
        n = 5000
        df = pd.DataFrame({
            "k1": rng.integers(0, 900, n),
            "k2": rng.integers(0, 4, n),
            "x": rng.choice([1.5, 2.5, np.nan], n),
            "s": rng.choice(["a", "b", "c", None], n),
        })
        got = (constraint_checks(ray.data.from_pandas(df).repartition(7),
                                 ["k1", "x", "s"], unique_key=("k1", "k2"))
               .to_pandas().set_index("check").value.to_dict())
        assert got["rows"] == n
        assert got["null:x"] == int(df.x.isna().sum())
        assert got["null:s"] == int(df.s.isna().sum())
        assert got["distinct:k1"] == df.k1.nunique()
        assert got["distinct:x"] == df.x.nunique()
        assert got["distinct:s"] == df.s.nunique()
        dup = n - df[["k1", "k2"]].drop_duplicates().shape[0]
        assert got["dup:k1,k2"] == dup and dup > 0

    def test_partition_invariant(self, ray_session):
        rng = np.random.default_rng(9)
        df = pd.DataFrame({"a": rng.integers(0, 50, 2000),
                           "b": rng.random(2000)})
        outs = [constraint_checks(ray.data.from_pandas(df).repartition(blocks),
                                  ["a", "b"], unique_key=("a",))
                .to_pandas().sort_values("check").reset_index(drop=True)
                for blocks in (1, 9)]
        pd.testing.assert_frame_equal(outs[0], outs[1])


class TestTargetEncodeLoo:
    def test_loo_exact(self, ray_session):
        from pymhealth_ray.stages.encode import target_encode_loo

        df = pd.DataFrame({
            "id": range(5),
            "cat": ["a", "a", "a", "b", "c"],
            "v": [1.00, 2.00, 3.00, 4.00, 5.00],
        })
        got = (target_encode_loo(ray.data.from_pandas(df).repartition(2),
                                 "cat", "v")
               .to_pandas().sort_values("id").reset_index(drop=True))
        np.testing.assert_allclose(got.v_loo[:3], [2.5, 2.0, 1.5])
        assert got.v_loo[3:].isna().all()  # singleton categories -> NULL

    def test_matches_pandas_loo(self, ray_session):
        from pymhealth_ray.stages.encode import target_encode_loo

        rng = np.random.default_rng(21)
        df = pd.DataFrame({
            "id": range(3000),
            "cat": rng.choice(list("abcdefgh"), 3000),
            "v": np.round(rng.random(3000) * 100, 2),
        })
        got = (target_encode_loo(ray.data.from_pandas(df).repartition(5),
                                 "cat", "v")
               .to_pandas().sort_values("id").reset_index(drop=True))
        s = df.groupby("cat").v.transform("sum")
        n = df.groupby("cat").v.transform("count")
        exp = (s - df.v) / (n - 1)
        np.testing.assert_allclose(got.v_loo.values, exp.values, atol=1e-9)


class TestRollupPivot:
    def test_rollup_matches_pandas(self, ray_session):
        from pymhealth_ray.stages.aggregate import grouped_rollup

        rng = np.random.default_rng(22)
        df = pd.DataFrame({
            "k1": rng.choice(["x", "y"], 4000),
            "k2": rng.choice(["p", "q", "r"], 4000),
            "m": rng.integers(0, 100, 4000).astype(np.int64),
        })
        got = (grouped_rollup(ray.data.from_pandas(df).repartition(6),
                              ["k1", "k2"], ["m"])
               .to_pandas())
        fine = got[got.k2.notna()]
        exp = df.groupby(["k1", "k2"]).m.agg(["sum", "count"]).reset_index()
        assert len(fine) == len(exp)
        for _, r in exp.iterrows():
            row = fine[(fine.k1 == r.k1) & (fine.k2 == r.k2)].iloc[0]
            assert row.m_sum == r["sum"] and row.n == r["count"]
        sub = got[got.k2.isna() & got.k1.notna()].set_index("k1").sort_index()
        exp1 = df.groupby("k1").m.sum().sort_index()
        assert (sub.m_sum.values == exp1.values).all()
        grand = got[got.k1.isna()]
        assert len(grand) == 1
        assert grand.m_sum.iloc[0] == df.m.sum() and grand.n.iloc[0] == 4000

    def test_pivot_matches_pandas(self, ray_session):
        from pymhealth_ray.stages.aggregate import grouped_pivot_counts

        rng = np.random.default_rng(23)
        df = pd.DataFrame({
            "u": rng.integers(0, 50, 5000),
            "c": rng.choice(["a", "b", "z"], 5000),
        })
        got = (grouped_pivot_counts(ray.data.from_pandas(df).repartition(7),
                                    "u", "c", ["a", "b", "z"])
               .to_pandas().sort_values("u").reset_index(drop=True))
        exp = df.pivot_table(index="u", columns="c", aggfunc=len,
                             fill_value=0)
        for cat in ("a", "b", "z"):
            np.testing.assert_array_equal(got[f"n_{cat}"].values,
                                          exp[cat].values)


class TestCubeBasket:
    def test_cube_matches_pandas(self, ray_session):
        from pymhealth_ray.stages.aggregate import grouped_cube

        rng = np.random.default_rng(31)
        df = pd.DataFrame({
            "k1": rng.choice(["x", "y"], 3000),
            "k2": rng.choice(["p", "q", "r"], 3000),
            "m": rng.integers(0, 100, 3000).astype(np.int64),
        })
        got = (grouped_cube(ray.data.from_pandas(df).repartition(5),
                            ["k1", "k2"], ["m"])
               .to_pandas())
        # 4 grouping sets: (k1,k2), (k1), (k2), ()
        fine = got[got.k1.notna() & got.k2.notna()]
        exp = df.groupby(["k1", "k2"]).m.agg(["sum", "count"]).reset_index()
        assert len(fine) == len(exp)
        for _, r in exp.iterrows():
            row = fine[(fine.k1 == r.k1) & (fine.k2 == r.k2)].iloc[0]
            assert row.m_sum == r["sum"] and row.n == r["count"]
        k2only = got[got.k1.isna() & got.k2.notna()].set_index("k2").sort_index()
        exp2 = df.groupby("k2").m.sum().sort_index()
        assert (k2only.m_sum.values == exp2.values).all()
        k1only = got[got.k2.isna() & got.k1.notna()].set_index("k1").sort_index()
        exp1 = df.groupby("k1").m.sum().sort_index()
        assert (k1only.m_sum.values == exp1.values).all()
        grand = got[got.k1.isna() & got.k2.isna()]
        assert len(grand) == 1 and grand.m_sum.iloc[0] == df.m.sum()

    def test_pair_topk_matches_bruteforce(self, ray_session):
        from itertools import combinations

        from pymhealth_ray.stages.assoc import item_pair_topk

        rng = np.random.default_rng(32)
        n = 6000
        df = pd.DataFrame({
            "g": rng.integers(0, 800, n),
            "i": rng.integers(0, 60, n).astype(np.int64),
        })
        got = (item_pair_topk(ray.data.from_pandas(df).repartition(7),
                              "g", "i", k=15, min_count=2)
               .to_pandas()
               .sort_values(["c", "item_a", "item_b"],
                            ascending=[False, True, True])
               .reset_index(drop=True))
        from collections import Counter
        cnt = Counter()
        for _, grp in df.groupby("g"):
            for a, b in combinations(sorted(set(grp.i)), 2):
                cnt[(a, b)] += 1
        exp = sorted(((c, a, b) for (a, b), c in cnt.items() if c >= 2),
                     key=lambda t: (-t[0], t[1], t[2]))[:15]
        assert len(got) == len(exp)
        for row, (c, a, b) in zip(got.itertuples(index=False), exp):
            assert (row.c, row.item_a, row.item_b) == (c, a, b)

    def test_pair_topk_partition_invariant(self, ray_session):
        from pymhealth_ray.stages.assoc import item_pair_topk

        rng = np.random.default_rng(33)
        df = pd.DataFrame({
            "g": rng.integers(0, 100, 2000),
            "i": rng.integers(0, 2_000_000_000, 2000).astype(np.int64),
        })
        outs = []
        for parts in (1, 9):
            outs.append(
                item_pair_topk(ray.data.from_pandas(df).repartition(parts),
                               "g", "i", k=10, min_count=1)
                .to_pandas()
                .sort_values(["c", "item_a", "item_b"],
                             ascending=[False, True, True])
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])


class TestGroupedDistinctCount:
    def test_matches_pandas_nunique(self, ray_session):
        from pymhealth_ray.stages.aggregate import grouped_distinct_count

        rng = np.random.default_rng(61)
        df = pd.DataFrame({
            "g": rng.integers(0, 300, 20000),
            "v": rng.integers(0, 500, 20000).astype(np.int64),
        })
        got = (grouped_distinct_count(
                   ray.data.from_pandas(df).repartition(9), "g", "v")
               .to_pandas().sort_values("g").reset_index(drop=True))
        exp = df.groupby("g").v.nunique().sort_index()
        np.testing.assert_array_equal(got.g.values, exp.index.values)
        np.testing.assert_array_equal(got.n_distinct.values, exp.values)

    def test_partition_invariant(self, ray_session):
        from pymhealth_ray.stages.aggregate import grouped_distinct_count

        rng = np.random.default_rng(62)
        df = pd.DataFrame({
            "g": rng.integers(0, 20, 5000),
            "v": rng.integers(0, 2**30, 5000).astype(np.int64),
        })
        outs = [grouped_distinct_count(
                    ray.data.from_pandas(df).repartition(p), "g", "v")
                .to_pandas().sort_values("g").reset_index(drop=True)
                for p in (1, 11)]
        pd.testing.assert_frame_equal(outs[0], outs[1])
