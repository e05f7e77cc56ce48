"""stages/repetition + stages/semdedup: hand-computed values and
partitioning invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from pymhealth_ray.stages.repetition import repetition_stats
from pymhealth_ray.stages.semdedup import semantic_dedup


class TestRepetition:
    def test_hand_values(self, ray_session):
        tbl = pa.table({
            "doc_id": pa.array(["a", "b", "c", "d"]),
            "ts_ns": pa.array([1, 2, 3, 4], type=pa.int64()),
            "tokens": pa.array([
                [5, 5, 5, 5],          # one distinct, all bigrams (5,5)
                [1, 2, 3, 1, 2, 3],    # repeated phrase
                [7],                   # no bigrams -> null frac
                [1, 2, 3, 4],          # all distinct
            ], type=pa.list_(pa.int32())),
        })
        out = (repetition_stats(ray.data.from_arrow(tbl).repartition(3))
               .to_pandas().sort_values("ts_ns").reset_index(drop=True))
        assert out.n_tok.tolist() == [4, 6, 1, 4]
        assert out.distinct_frac.tolist() == [0.25, 0.5, 1.0, 1.0]
        assert out.top_tok_frac.tolist() == [1.0, 2 / 6, 1.0, 0.25]
        # b's bigrams: 12,23,31,12,23 -> 5 total, 3 distinct -> 2/5 dup
        got = out.dup_bigram_frac.tolist()
        assert got[0] == 2 / 3 and got[1] == 2 / 5  # (n_bg - d_bg) / n_bg
        assert pd.isna(got[2]) and got[3] == 0.0

    def test_partition_invariance(self, ray_session):
        rng = np.random.default_rng(9)
        tbl = pa.table({
            "doc_id": pa.array([f"d{i}" for i in range(300)]),
            "ts_ns": pa.array(np.arange(300), type=pa.int64()),
            "tokens": pa.array([rng.integers(0, 12, rng.integers(0, 30)).tolist()
                                for _ in range(300)], type=pa.list_(pa.int32())),
        })
        a = (repetition_stats(ray.data.from_arrow(tbl).repartition(1))
             .to_pandas().sort_values("ts_ns").reset_index(drop=True))
        b = (repetition_stats(ray.data.from_arrow(tbl).repartition(7))
             .to_pandas().sort_values("ts_ns").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)


class TestSemDedup:
    def _ds(self, n=240, dim=8, seed=4):
        rng = np.random.default_rng(seed)
        base = rng.normal(size=(n, dim)).astype(np.float32)
        # make ids 3k/3k+1 near-identical (tiny perturbation)
        base[1::3] = base[0::3] + rng.normal(scale=1e-4,
                                             size=base[0::3].shape).astype(np.float32)
        return pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(base.tolist(),
                                  type=pa.list_(pa.float32())),
        })

    def test_near_dups_collapse_and_invariance(self, ray_session):
        tbl = self._ds()
        out1 = (semantic_dedup(ray.data.from_arrow(tbl).repartition(2),
                               n_clusters=4, threshold=0.99)
                .to_pandas().sort_values("vec_id").reset_index(drop=True))
        out2 = (semantic_dedup(ray.data.from_arrow(tbl).repartition(9),
                               n_clusters=4, threshold=0.99)
                .to_pandas().sort_values("vec_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(out1, out2)
        # each planted pair collapses to the even (lower) id
        planted = out1[out1.vec_id % 3 == 1]
        assert (planted.rep_id == planted.vec_id - 1).all()
        assert not planted.keep.any()
        keepers = out1[out1.vec_id % 3 == 0]
        assert (keepers.rep_id == keepers.vec_id).all()
        assert keepers.keep.all()
        # representatives are always kept rows
        reps = set(out1[out1.keep].vec_id)
        assert set(out1.rep_id).issubset(reps)


class TestDSIR:
    def test_partition_invariance_and_direction(self, ray_session):
        import pyarrow.compute as pc

        from pymhealth_ray.stages.dsir import dsir_fit, dsir_scores

        rng = np.random.default_rng(11)
        en_words = ["the", "cat", "sat", "on", "mat", "dog", "ran"]
        de_words = ["der", "hund", "lief", "auf", "dem", "weg", "heute"]
        rows = []
        for i in range(400):
            en = i % 2 == 0
            vocab = en_words if en else de_words
            rows.append((i, " ".join(rng.choice(vocab, 12)),
                         "en" if en else "de"))
        tbl = pa.table({
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array([r[2] for r in rows]),
        })

        def target(batch):
            return pc.fill_null(pc.equal(batch["lang"], "en"),
                                False).to_numpy(zero_copy_only=False)

        outs = []
        for parts in (1, 7):
            ds = ray.data.from_arrow(tbl).repartition(parts)
            lr, n_raw, n_tgt = dsir_fit(ds, "text", target)
            assert n_raw > n_tgt > 0
            lr_ref = ray.put(lr)
            outs.append(dsir_scores(ds, lr_ref).to_pandas()
                        .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])
        got = outs[0].merge(pd.DataFrame(
            {"doc_id": [r[0] for r in rows], "lang": [r[2] for r in rows]}))
        # every English doc must outscore every German doc
        assert got[got.lang == "en"].dsir_logw.min() > \
            got[got.lang == "de"].dsir_logw.max()
