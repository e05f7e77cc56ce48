"""Tests for repeated token-span detection (stages/spans.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from pymhealth_ray.stages.spans import repeated_span_stats, span_counts


def _ds(lists, blocks=4):
    tbl = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(len(lists))]),
        "ts_ns": pa.array(np.arange(len(lists), dtype=np.int64)),
        "tokens": pa.array(lists, type=pa.list_(pa.int32())),
    })
    return ray.data.from_arrow(tbl).repartition(blocks)


class TestSpans:
    def test_counts_exact(self, ray_session):
        lists = [[1, 2, 3, 4, 5, 6], [2, 3, 4, 5, 6], [9, 9, 9, 9]]
        got = {r["key"]: r["c"] for r in
               span_counts(_ds(lists), key_mult=16).take_all()}
        # row0 windows: (1..5),(2..6); row1: (2..6); row2: none (len<5)
        k1 = 1 + 2*16 + 3*16**2 + 4*16**3 + 5*16**4
        k2 = 2 + 3*16 + 4*16**2 + 5*16**3 + 6*16**4
        assert got == {k1: 1, k2: 2}

    def test_stats_and_coverage(self, ray_session):
        lists = [
            [1, 2, 3, 4, 5, 6],   # window (2..6) duplicated -> covers pos 1..5
            [2, 3, 4, 5, 6],      # fully covered
            [7, 7, 7, 7, 7, 7, 7],  # intra-row repeats: (7x5) occurs 3x
            [1, 2, 3],            # too short: 0 windows
        ]
        got = (repeated_span_stats(_ds(lists), key_mult=16)
               .to_pandas().sort_values("ts_ns").reset_index(drop=True))
        assert got["n_windows"].tolist() == [2, 1, 3, 0]
        assert got["n_dup"].tolist() == [1, 1, 3, 0]
        np.testing.assert_allclose(got["frac_cov"].tolist()[:3],
                                   [5 / 6, 1.0, 1.0])
        assert got["frac_cov"].iloc[3] == 0.0

    def test_partition_invariant(self, ray_session):
        rng = np.random.default_rng(131)
        lists = [rng.integers(0, 6, rng.integers(3, 20)).tolist()
                 for _ in range(150)]
        outs = [repeated_span_stats(_ds(lists, b), key_mult=8)
                .to_pandas().sort_values("ts_ns").reset_index(drop=True)
                for b in (1, 7)]
        pd.testing.assert_frame_equal(outs[0], outs[1])

    def test_no_duplicates_all_zero(self, ray_session):
        lists = [[1, 2, 3, 4, 5], [6, 7, 8, 9, 10]]
        got = repeated_span_stats(_ds(lists), key_mult=16).to_pandas()
        assert got["n_dup"].tolist() == [0, 0]
        assert got["frac_cov"].tolist() == [0.0, 0.0]


class TestSpansDistributed:
    """The dup-set-too-big-to-broadcast plan (bloom-prefiltered
    co-partitioned semi-join) must be value-identical to the broadcast
    plan — forced by broadcast_threshold=0 (every dup set exceeds it)."""

    def test_distributed_matches_broadcast(self, ray_session):
        rng = np.random.default_rng(77)
        lists = [rng.integers(0, 5, rng.integers(3, 25)).tolist()
                 for _ in range(200)]
        base = (repeated_span_stats(_ds(lists, 5), key_mult=8)
                .to_pandas().sort_values("ts_ns").reset_index(drop=True))
        dist = (repeated_span_stats(_ds(lists, 5), key_mult=8,
                                    broadcast_threshold=0)
                .to_pandas().sort_values("ts_ns").reset_index(drop=True))
        pd.testing.assert_frame_equal(base, dist)
        assert base["n_dup"].sum() > 0  # non-trivial dup set

    def test_distributed_coverage_and_zero_rows(self, ray_session):
        lists = [
            [1, 2, 3, 4, 5, 6],
            [2, 3, 4, 5, 6],
            [7, 7, 7, 7, 7, 7, 7],
            [1, 2, 3],           # 0 windows: must still appear with 0s
            [8, 9, 10, 11, 12],  # unique: n_dup 0, frac 0.0
        ]
        got = (repeated_span_stats(_ds(lists), key_mult=16,
                                   broadcast_threshold=0)
               .to_pandas().sort_values("ts_ns").reset_index(drop=True))
        assert got["n_windows"].tolist() == [2, 1, 3, 0, 1]
        assert got["n_dup"].tolist() == [1, 1, 3, 0, 0]
        np.testing.assert_allclose(got["frac_cov"].tolist()[:3],
                                   [5 / 6, 1.0, 1.0])
        assert got["frac_cov"].tolist()[3:] == [0.0, 0.0]

    def test_cross_doc_distributed_matches_broadcast(self, ray_session):
        from pymhealth_ray.stages.spans import cross_doc_span_stats

        rng = np.random.default_rng(78)
        lists = [rng.integers(0, 5, rng.integers(3, 25)).tolist()
                 for _ in range(200)]
        lists.append([7] * 9)  # intra-only repeats (token 7 nowhere else)
        base = (cross_doc_span_stats(_ds(lists, 5), key_mult=8)
                .to_pandas().sort_values("ts_ns").reset_index(drop=True))
        dist = (cross_doc_span_stats(_ds(lists, 5), key_mult=8,
                                     broadcast_threshold=0)
                .to_pandas().sort_values("ts_ns").reset_index(drop=True))
        pd.testing.assert_frame_equal(base, dist)
        assert base["n_cross"].sum() > 0 and base["n_intra"].sum() > 0


class TestCrossDocSpans:
    def test_cross_vs_intra_split(self, ray_session):
        from pymhealth_ray.stages.spans import cross_doc_span_stats

        lists = [
            [1, 2, 3, 4, 5],          # d0: span A, also in d1 -> cross
            [1, 2, 3, 4, 5, 9],       # d1: span A (cross) + one unique
            [7, 7, 7, 7, 7, 7, 7],    # d2: intra-only repeats
        ]
        got = (cross_doc_span_stats(_ds(lists), key_mult=16)
               .to_pandas().sort_values("ts_ns").reset_index(drop=True))
        assert got["n_cross"].tolist() == [1, 1, 0]
        # d1's second window (2,3,4,5,9) is unique; d2 has 3 intra windows
        assert got["n_intra"].tolist() == [0, 0, 3]

    def test_keyed_agg_matches_pandas(self, ray_session):
        import pandas as pd

        from pymhealth_ray.stages.aggregate import keyed_agg

        rng = np.random.default_rng(141)
        df = pd.DataFrame({
            "key": rng.integers(0, 500, 20_000).astype(np.int64),
            "c": rng.integers(1, 5, 20_000).astype(np.int64),
            "v": rng.integers(-100, 100, 20_000).astype(np.int64),
        })
        got = (keyed_agg(ray.data.from_pandas(df).repartition(6), "key",
                         {"c": "sum", "v": "min"}, num_buckets=8,
                         precombine_rows=4000)
               .to_pandas().sort_values("key").reset_index(drop=True))
        exp = (df.groupby("key").agg(c=("c", "sum"), v=("v", "min"))
               .reset_index())
        assert got["key"].tolist() == exp["key"].tolist()
        assert got["c"].tolist() == exp["c"].tolist()
        assert got["v"].tolist() == exp["v"].tolist()


class TestTokenMinHash:
    def test_near_dup_vs_random_separation(self, ray_session):
        from pymhealth_ray.stages.dedup import TokenMinHasher

        rng = np.random.default_rng(81)
        base = rng.integers(0, 2000, 60).astype(np.int64)
        near = base.copy(); near[0] = (near[0] + 1) % 2048
        rand = rng.integers(0, 2000, 60).astype(np.int64)
        tbl = pa.table({
            "rid": pa.array([0, 1, 2], type=pa.int64()),
            "tokens": pa.array([base.tolist(), near.tolist(), rand.tolist()],
                               type=pa.list_(pa.int64())),
        })
        h = TokenMinHasher(id_col="rid")
        sig = h(tbl)["minhash"].combine_chunks().values.to_numpy(
            zero_copy_only=False).reshape(3, -1)
        est_near = (sig[0] == sig[1]).mean()
        est_rand = (sig[0] == sig[2]).mean()
        assert est_near > 0.8
        assert est_rand < 0.2
        # deterministic across instances
        sig2 = TokenMinHasher(id_col="rid")(tbl)["minhash"].combine_chunks(
            ).values.to_numpy(zero_copy_only=False).reshape(3, -1)
        np.testing.assert_array_equal(sig, sig2)

    def test_short_row_fallback(self, ray_session):
        from pymhealth_ray.stages.dedup import TokenMinHasher

        tbl = pa.table({"rid": pa.array([0, 1], type=pa.int64()),
                        "tokens": pa.array([[5], [5]],
                                           type=pa.list_(pa.int64()))})
        sig = TokenMinHasher(id_col="rid")(tbl)["minhash"].combine_chunks(
            ).values.to_numpy(zero_copy_only=False).reshape(2, -1)
        np.testing.assert_array_equal(sig[0], sig[1])
