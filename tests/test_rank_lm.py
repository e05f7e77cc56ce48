"""Tests for exact global rank (stages/rank.py) and unigram LM scoring
(stages/lm.py)."""

import numpy as np
import pandas as pd
import ray

from pymhealth_ray.stages.lm import unigram_nll
from pymhealth_ray.stages.rank import global_rank, value_histogram


class TestGlobalRank:
    def test_matches_pandas_rank(self, ray_session):
        rng = np.random.default_rng(3)
        vals = np.round(rng.uniform(0, 50, 500), 2)
        df = pd.DataFrame({"k": np.arange(500, dtype=np.int64), "v": vals})
        out = (global_rank(ray.data.from_pandas(df).repartition(5), "v")
               .to_pandas().sort_values("k").reset_index(drop=True))
        s = pd.Series(vals)
        assert (out.rnk == s.rank(method="min").astype(int)).all()
        assert (out.drnk == s.rank(method="dense").astype(int)).all()
        exp_pct = (s.rank(method="min").astype(np.int64) - 1) / np.float64(499)
        assert (out.pct == exp_pct).all()

    def test_histogram_partition_invariant(self, ray_session):
        vals = np.array([1.0, 1.0, 2.5, 2.5, 2.5, 7.25])
        df = pd.DataFrame({"v": vals})
        for blocks in (1, 3):
            v, c = value_histogram(
                ray.data.from_pandas(df).repartition(blocks), "v")
            assert v.tolist() == [100, 250, 725]
            assert c.tolist() == [2, 3, 1]

    def test_single_row_percent_rank(self, ray_session):
        df = pd.DataFrame({"v": [4.0]})
        out = global_rank(ray.data.from_pandas(df), "v").to_pandas()
        assert out.pct.iloc[0] == 0.0


class TestUnigramNLL:
    def test_matches_single_process(self, ray_session):
        rng = np.random.default_rng(5)
        vocab = ["alpha", "beta", "gamma", "delta", "eps"]
        docs = [" ".join(rng.choice(vocab, rng.integers(1, 12)))
                for _ in range(200)]
        df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                           "text": docs})
        out = (unigram_nll(ray.data.from_pandas(df).repartition(4),
                           num_buckets=8)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))

        from collections import Counter
        cnt = Counter()
        for t in docs:
            cnt.update(w for w in t.split(" ") if w)
        total = float(sum(cnt.values()))
        lp = {w: float(np.log(c / total)) for w, c in cnt.items()}
        for i, t in enumerate(docs):
            toks = [w for w in t.split(" ") if w]
            exp = -np.mean([lp[w] for w in toks])
            assert out.n_tok.iloc[i] == len(toks)
            assert abs(out.nll.iloc[i] - exp) < 1e-12

    def test_double_space_tokens_dropped(self, ray_session):
        df = pd.DataFrame({"doc_id": [0, 1],
                           "text": ["a  a b", "b a"]})
        out = (unigram_nll(ray.data.from_pandas(df))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert out.n_tok.tolist() == [3, 2]
        # corpus: a=3, b=2, total=5
        lp_a, lp_b = np.log(3 / 5.0), np.log(2 / 5.0)
        assert abs(out.nll.iloc[0] - (-(2 * lp_a + lp_b) / 3)) < 1e-12


class TestPartitionedSortRank:
    def test_ntile_matches_duckdb(self, ray_session):
        import duckdb

        from pymhealth_ray.stages.rank import ntile

        rng = np.random.default_rng(41)
        n = 8000
        df = pd.DataFrame({
            "p": rng.choice(["a", "b", "c"], n),
            # heavy ties + skew to stress bin edges
            "v": np.round(rng.exponential(5.0, n), 1),
            "id": np.arange(n, dtype=np.int64),
        })
        got = (ntile(ray.data.from_pandas(df).repartition(7),
                     "p", "v", "id", k=4, num_bins=32)
               .to_pandas().sort_values("id").reset_index(drop=True))
        exp = duckdb.sql(
            "SELECT id, ntile(4) OVER (PARTITION BY p ORDER BY v, id) t "
            "FROM df ORDER BY id").df()
        np.testing.assert_array_equal(got.tile.values,
                                      exp.t.values.astype(np.int64))

    def test_rank_exact_with_constant_partition(self, ray_session):
        from pymhealth_ray.stages.rank import partitioned_sort_rank

        rng = np.random.default_rng(42)
        df = pd.DataFrame({
            "p": ["x"] * 3000,
            "v": rng.normal(size=3000),
            "id": np.arange(3000, dtype=np.int64),
        })
        got = (partitioned_sort_rank(ray.data.from_pandas(df).repartition(5),
                                     "p", "v", "id", num_bins=16)
               .to_pandas().sort_values("id").reset_index(drop=True))
        exp = df.sort_values(["v", "id"]).reset_index()
        expected_rank = np.empty(3000, dtype=np.int64)
        expected_rank[exp["index"].values] = np.arange(3000)
        np.testing.assert_array_equal(got.rnk.values, expected_rank)
        assert (got["__n_part"] == 3000).all()


class TestHeadCollect:
    def test_matches_duckdb_string_agg(self, ray_session):
        import duckdb

        from pymhealth_ray.stages.collect import grouped_head_collect

        rng = np.random.default_rng(43)
        n = 5000
        df = pd.DataFrame({
            "u": rng.integers(0, 120, n),
            "o": rng.integers(0, 10**9, n),
            "id": np.arange(n, dtype=np.int64),
            "t": rng.choice(["A", "B", "C", "D"], n),
        })
        got = (grouped_head_collect(
                   ray.data.from_pandas(df).repartition(6),
                   "u", "o", "t", k=5, tiebreak_col="id", sep=">")
               .to_pandas().sort_values("u").reset_index(drop=True))
        exp = duckdb.sql("""
            WITH r AS (SELECT *, row_number() OVER
                       (PARTITION BY u ORDER BY o, id) rn FROM df)
            SELECT u, string_agg(t, '>' ORDER BY rn) j, count(*) nf
            FROM r WHERE rn <= 5 GROUP BY u ORDER BY u""").df()
        assert list(got.journey) == list(exp.j)
        np.testing.assert_array_equal(got.n_first.values,
                                      exp.nf.values.astype(np.int64))


class TestOrderedPrefixSum:
    def test_matches_pandas_cumsum(self, ray_session):
        from pymhealth_ray.stages.rank import ordered_prefix_sum

        rng = np.random.default_rng(44)
        n = 7000
        df = pd.DataFrame({
            "o": rng.integers(0, 10**15, n),
            "id": np.arange(n, dtype=np.int64),
            "v": rng.integers(0, 1000, n).astype(np.int64),
        })
        got = (ordered_prefix_sum(ray.data.from_pandas(df).repartition(9),
                                  "v", "o", "id", num_bins=64)
               .to_pandas().sort_values("id").reset_index(drop=True))
        exp = df.sort_values(["o", "id"]).v.cumsum()
        exp_by_id = pd.Series(exp.values,
                              index=df.sort_values(["o", "id"]).id.values)
        np.testing.assert_array_equal(got.cum.values,
                                      exp_by_id.sort_index().values)

    def test_partition_invariant_with_ties(self, ray_session):
        from pymhealth_ray.stages.rank import ordered_prefix_sum

        rng = np.random.default_rng(45)
        df = pd.DataFrame({
            "o": rng.integers(0, 20, 3000),  # heavy ties
            "id": np.arange(3000, dtype=np.int64),
            "v": rng.integers(0, 9, 3000).astype(np.int64),
        })
        outs = []
        for parts in (1, 8):
            outs.append(
                ordered_prefix_sum(ray.data.from_pandas(df).repartition(parts),
                                   "v", "o", "id", num_bins=16)
                .to_pandas().sort_values("id").reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])


class TestTrigramNLL:
    def test_matches_single_process(self, ray_session):
        from pymhealth_ray.stages.lm import trigram_nll

        rng = np.random.default_rng(71)
        rows = []
        for i in range(300):
            n = int(rng.integers(1, 40))
            rows.append({"doc_id": f"d{i:04d}", "ts_ns": int(1e9 + i),
                         "tokens": rng.integers(0, 12, n).astype(np.int32).tolist()})
        df = pd.DataFrame(rows)
        ds = ray.data.from_pandas(df).repartition(7)
        got = (trigram_nll(ds, key_mult=2048)
               .to_pandas().set_index("doc_id").sort_index())

        # single-process replication: corpus counts + per-row start-order sum
        from collections import Counter
        c3, c2 = Counter(), Counter()
        for r in rows:
            t = r["tokens"]
            for i2 in range(len(t) - 2):
                c3[(t[i2], t[i2+1], t[i2+2])] += 1
                c2[(t[i2], t[i2+1])] += 1
        for r in rows:
            t = r["tokens"]
            n_tri = max(len(t) - 2, 0)
            g = got.loc[r["doc_id"]]
            assert g.n_trigrams == n_tri
            if n_tri == 0:
                assert pd.isna(g.nll)
                continue
            contrib = np.array([np.log(float(c3[(t[i2], t[i2+1], t[i2+2])]))
                                - np.log(float(c2[(t[i2], t[i2+1])]))
                                for i2 in range(n_tri)])
            exp = -np.add.reduceat(contrib, [0])[0] / n_tri
            assert g.nll == exp  # bit-exact: pinned summation order

    def test_partition_invariant(self, ray_session):
        from pymhealth_ray.stages.lm import trigram_nll

        rng = np.random.default_rng(72)
        rows = [{"doc_id": f"d{i}", "ts_ns": i,
                 "tokens": rng.integers(0, 6, int(rng.integers(3, 20))).astype(np.int32).tolist()}
                for i in range(80)]
        df = pd.DataFrame(rows)
        outs = [trigram_nll(ray.data.from_pandas(df).repartition(p))
                .to_pandas().sort_values("doc_id").reset_index(drop=True)
                for p in (1, 9)]
        pd.testing.assert_frame_equal(outs[0], outs[1])


class TestTrigramPlans:
    def test_broadcast_equals_join_plan(self, ray_session):
        from pymhealth_ray.stages.lm import trigram_nll

        rng = np.random.default_rng(73)
        rows = [{"doc_id": f"d{i:03d}", "ts_ns": i,
                 "tokens": rng.integers(0, 9, int(rng.integers(1, 30))).astype(np.int32).tolist()}
                for i in range(150)]
        df = pd.DataFrame(rows)
        a = (trigram_nll(ray.data.from_pandas(df).repartition(6),
                         plan="broadcast")
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        b = (trigram_nll(ray.data.from_pandas(df).repartition(6),
                         plan="join")
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)


class TestNewStageEdgeCases:
    def test_single_group_single_row(self, ray_session):
        from pymhealth_ray.stages.rank import ntile, ordered_prefix_sum

        df = pd.DataFrame({"p": ["a"], "v": [1.0],
                           "id": np.array([0], dtype=np.int64),
                           "w": np.array([5], dtype=np.int64)})
        t = ntile(ray.data.from_pandas(df), "p", "v", "id", k=4).to_pandas()
        assert t.tile.tolist() == [1]
        s = ordered_prefix_sum(ray.data.from_pandas(df), "w", "v", "id",
                               num_bins=4).to_pandas()
        assert s.cum.tolist() == [5]

    def test_head_collect_k_larger_than_group(self, ray_session):
        from pymhealth_ray.stages.collect import grouped_head_collect

        df = pd.DataFrame({"u": [1, 1, 2], "o": [3, 1, 5],
                           "id": np.array([0, 1, 2], dtype=np.int64),
                           "t": ["x", "y", "z"]})
        got = (grouped_head_collect(ray.data.from_pandas(df), "u", "o", "t",
                                    k=10, tiebreak_col="id")
               .to_pandas().sort_values("u"))
        assert got.journey.tolist() == ["y>x", "z"]
        assert got.n_first.tolist() == [2, 1]

    def test_distinct_count_all_identical(self, ray_session):
        from pymhealth_ray.stages.aggregate import grouped_distinct_count

        df = pd.DataFrame({"g": np.zeros(1000, dtype=np.int64),
                           "v": np.full(1000, 7, dtype=np.int64)})
        got = grouped_distinct_count(
            ray.data.from_pandas(df).repartition(5), "g", "v").to_pandas()
        assert got.n_distinct.tolist() == [1]

    def test_trigram_all_short_rows(self, ray_session):
        from pymhealth_ray.stages.lm import trigram_nll

        df = pd.DataFrame({
            "doc_id": ["a", "b"], "ts_ns": [1, 2],
            "tokens": [[1, 2], [3]],
        })
        got = (trigram_nll(ray.data.from_pandas(df))
               .to_pandas().sort_values("doc_id"))
        assert got.n_trigrams.tolist() == [0, 0]
        assert got.nll.isna().all()


def test_ordered_prefix_sum_empty_input(ray_session):
    from pymhealth_ray.stages.rank import ordered_prefix_sum

    df = pd.DataFrame({"o": np.array([], dtype=np.int64),
                       "id": np.array([], dtype=np.int64),
                       "v": np.array([], dtype=np.int64)})
    out = ordered_prefix_sum(ray.data.from_pandas(df), "v", "o", "id")
    assert out.count() == 0


def test_partitioned_prefix_sum_matches_duckdb(ray_session):
    import duckdb

    from pymhealth_ray.stages.rank import partitioned_prefix_sum

    rng = np.random.default_rng(91)
    n = 6000
    df = pd.DataFrame({
        "p": rng.choice(["x", "y", "z"], n),
        "o": rng.integers(0, 30, n),  # heavy ties
        "id": np.arange(n, dtype=np.int64),
        "v": rng.integers(0, 100, n).astype(np.int64),
    })
    got = (partitioned_prefix_sum(ray.data.from_pandas(df).repartition(7),
                                  "p", "v", "o", "id", num_bins=16)
           .to_pandas().sort_values("id").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT id, CAST(sum(v) OVER (PARTITION BY p ORDER BY o, id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) c
        FROM df ORDER BY id""").df()
    np.testing.assert_array_equal(got.cum.values, exp.c.values)
