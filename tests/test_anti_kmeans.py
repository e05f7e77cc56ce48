"""Tests for the 'left anti' equi_join path and distributed k-means
assignment."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from pymhealth_ray.stages.ann import _unit, train_ivf_centroids
from pymhealth_ray.stages.join import equi_join


class TestAntiJoin:
    def test_left_anti_matches_pandas(self, ray_session):
        rng = np.random.default_rng(51)
        left = pd.DataFrame({
            "k": rng.integers(0, 100, 800).astype(np.int64),
            "v": np.arange(800, dtype=np.int64),
        })
        right = pd.DataFrame({
            "k": rng.integers(50, 150, 300).astype(np.int64),
        })
        got = (equi_join(ray.data.from_pandas(left).repartition(4),
                         ray.data.from_pandas(right).repartition(3),
                         on="k", join_type="left anti", num_buckets=5)
               .to_pandas().sort_values("v").reset_index(drop=True))
        keep = ~left["k"].isin(set(right["k"]))
        exp = left[keep].sort_values("v").reset_index(drop=True)
        assert got["v"].tolist() == exp["v"].tolist()
        assert got["k"].tolist() == exp["k"].tolist()

    def test_semi_matches_pandas(self, ray_session):
        left = pd.DataFrame({"k": np.array([1, 2, 3, 4], dtype=np.int64),
                             "v": np.array([10, 20, 30, 40], dtype=np.int64)})
        right = pd.DataFrame({"k": np.array([2, 4, 4], dtype=np.int64)})
        got = (equi_join(ray.data.from_pandas(left),
                         ray.data.from_pandas(right),
                         on="k", join_type="left semi", num_buckets=3)
               .to_pandas().sort_values("k").reset_index(drop=True))
        assert got["k"].tolist() == [2, 4]
        assert got["v"].tolist() == [20, 40]


class TestKmeansAssign:
    def test_assignment_partition_invariant(self, ray_session):
        rng = np.random.default_rng(52)
        emb = rng.normal(size=(300, 16)).astype(np.float64)
        cent = train_ivf_centroids(emb[:128], n_centroids=4)
        cent_ref = ray.put(cent)

        def assign(batch: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            m = _unit(np.stack(batch["embedding"].to_pandas().to_numpy())
                      .astype(np.float64))
            sims = m @ c.T
            lab = np.argmax(sims, axis=1)
            return pa.table({
                "vec_id": batch["vec_id"],
                "cluster": pa.array(lab.astype(np.int64)),
            })

        tbl = pa.table({
            "vec_id": pa.array(np.arange(300, dtype=np.int64)),
            "embedding": pa.array(list(emb), type=pa.list_(pa.float64())),
        })
        outs = []
        for blocks in (1, 8):
            outs.append(ray.data.from_arrow(tbl).repartition(blocks)
                        .map_batches(assign, batch_format="pyarrow")
                        .to_pandas().sort_values("vec_id")
                        .reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])
        # single-process reference
        sims = _unit(emb) @ cent.T
        exp = np.argmax(sims, axis=1)
        assert outs[0]["cluster"].tolist() == exp.astype(np.int64).tolist()

    def test_training_is_deterministic(self):
        rng = np.random.default_rng(53)
        x = rng.normal(size=(200, 8))
        a = train_ivf_centroids(x, n_centroids=3)
        b = train_ivf_centroids(x, n_centroids=3)
        np.testing.assert_array_equal(a, b)
