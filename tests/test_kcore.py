"""Core decomposition: distributed H-index iteration vs exact BZ peel."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from pymhealth_ray.stages.graph import (coreness, coreness_hindex,
                                        coreness_peel_exact)


def _random_edges(seed, n=120, m=420):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n, m).astype(np.int64)
    b = rng.integers(0, n, m).astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    pk = np.unique(lo * (n + 1) + hi)
    return (pk // (n + 1)).astype(np.int64), (pk % (n + 1)).astype(np.int64)


def _ds(a, b):
    return ray.data.from_arrow(pa.table({"a": pa.array(a),
                                         "b": pa.array(b)})).repartition(5)


def _got(a, b, num_buckets):
    out = coreness_hindex(_ds(a, b), num_buckets=num_buckets).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def _hindex_fixpoint_sim(a, b):
    """Pure-numpy H-index iteration (no Ray) — lets adversarial
    slow-converging shapes (paths) verify the FIXPOINT = coreness
    theorem without paying a Ray round per hop."""
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    n = len(nodes)
    ai, bi = inv[:len(a)], inv[len(a):]
    deg = np.bincount(ai, minlength=n) + np.bincount(bi, minlength=n)
    src = np.concatenate([ai, bi])
    dst = np.concatenate([bi, ai])
    order = np.argsort(src, kind="stable")
    adj = dst[order]
    starts = np.concatenate(([0], np.cumsum(deg)))
    c = deg.astype(np.int64).copy()
    for _ in range(10 * n):
        new = c.copy()
        for v in range(n):
            vals = np.sort(c[adj[starts[v]:starts[v + 1]]])[::-1]
            h = int(np.max(np.minimum(vals, np.arange(1, len(vals) + 1))))
            new[v] = min(c[v], h)
        if np.array_equal(new, c):
            return nodes, c
        c = new
    raise AssertionError("no fixpoint")


class TestCorenessPeel:
    def test_fixpoint_equals_peel_adversarial(self):
        # long path (O(diameter) rounds) + random graphs, no Ray cost
        n = 60
        a = np.arange(n - 1, dtype=np.int64)
        b = a + 1
        for aa, bb in [(a, b), _random_edges(7), _random_edges(41)]:
            nodes, core = coreness_peel_exact(aa, bb)
            snodes, sim = _hindex_fixpoint_sim(aa, bb)
            assert np.array_equal(nodes, snodes)
            assert np.array_equal(core, sim)


class TestCorenessDistributed:
    def test_matches_exact_peel(self, ray_session):
        a, b = _random_edges(23)  # converges in ~5 rounds
        nodes, core = coreness_peel_exact(a, b)
        got = _got(a, b, num_buckets=8)
        assert np.array_equal(got.node.to_numpy(), nodes)
        assert np.array_equal(got.core.to_numpy(), core)

    def test_partition_invariance(self, ray_session):
        a, b = _random_edges(23)
        assert _got(a, b, 3).equals(_got(a, b, 17))

    def test_known_shapes(self, ray_session):
        # triangle + pendant: triangle nodes core 2, pendant core 1
        a = np.array([0, 1, 0, 2], dtype=np.int64)
        b = np.array([1, 2, 2, 3], dtype=np.int64)
        got = _got(a, b, num_buckets=4).set_index("node").core
        assert got[0] == got[1] == got[2] == 2 and got[3] == 1
        # clique of 6: core 5 everywhere
        idx = np.array([(i, j) for i in range(6) for j in range(i + 1, 6)],
                       dtype=np.int64)
        got = _got(idx[:, 0], idx[:, 1], num_buckets=4)
        assert (got.core == 5).all()

    def test_nonconvergence_raises(self, ray_session):
        a = np.arange(29, dtype=np.int64)
        b = a + 1
        with pytest.raises(RuntimeError):
            coreness_hindex(_ds(a, b), num_buckets=4, max_rounds=2)

    def test_hybrid_driver_path(self, ray_session):
        a = np.arange(59, dtype=np.int64)
        b = a + 1
        out = coreness(_ds(a, b), driver_threshold=10**6).to_pandas()
        assert (out.sort_values("node").core == 1).all()
