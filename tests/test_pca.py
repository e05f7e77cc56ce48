"""Tests for distributed PCA (stages/pca.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from pymhealth_ray.stages.pca import (
    pca_components,
    pca_project,
    scatter_partials,
)


def _mk_ds(emb, blocks=4):
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(emb), dtype=np.int64)),
        "embedding": pa.array(list(emb.astype(np.float32)),
                              type=pa.list_(pa.float32())),
    })
    return ray.data.from_arrow(tbl).repartition(blocks)


class TestPca:
    def test_scatter_exact_and_partition_invariant(self, ray_session):
        rng = np.random.default_rng(61)
        emb = rng.normal(scale=0.3, size=(400, 8))
        totals = []
        for blocks in (1, 7):
            parts = scatter_partials(_mk_ds(emb, blocks)).take_all()
            n = sum(int(p["n"]) for p in parts)
            s = np.sum([p["s"] for p in parts], axis=0)
            ss = np.sum([p["ss"] for p in parts], axis=0)
            totals.append((n, s.tolist(), ss.tolist()))
        assert totals[0] == totals[1]
        # exact vs brute quantization
        q = np.rint(emb.astype(np.float32).astype(np.float64) * (1 << 18)).astype(object)
        assert totals[0][0] == 400
        assert totals[0][1] == [int(x) for x in q.sum(axis=0)]

    def test_components_match_numpy_cov(self, ray_session):
        rng = np.random.default_rng(62)
        # anisotropic data: a dominant direction PCA must find
        base = rng.normal(size=(600, 6)) * np.array([3, 1, 0.5, 0.2, 0.1, 0.05])
        rot, _ = np.linalg.qr(rng.normal(size=(6, 6)))
        emb = (base @ rot) * 0.1
        comp = pca_components(_mk_ds(emb), k=2)
        ref_cov = np.cov(emb, rowvar=False)
        _, vecs = np.linalg.eigh(ref_cov)
        ref1 = vecs[:, -1]
        # direction match up to sign, small quantization tolerance
        assert abs(abs(comp[0] @ ref1) - 1.0) < 1e-4
        assert abs(np.linalg.norm(comp[0]) - 1.0) < 1e-12
        assert abs(comp[0] @ comp[1]) < 1e-12

    def test_projection_partition_invariant(self, ray_session):
        rng = np.random.default_rng(63)
        emb = rng.normal(scale=0.2, size=(300, 5))
        comp = pca_components(_mk_ds(emb), k=2)
        outs = [pca_project(_mk_ds(emb, b), comp).to_pandas()
                .sort_values("vec_id").reset_index(drop=True)
                for b in (1, 9)]
        pd.testing.assert_frame_equal(outs[0], outs[1])

    def test_sign_convention(self, ray_session):
        rng = np.random.default_rng(64)
        emb = rng.normal(scale=0.2, size=(200, 4))
        comp = pca_components(_mk_ds(emb), k=2)
        for row in comp:
            assert row[int(np.argmax(np.abs(row)))] > 0
