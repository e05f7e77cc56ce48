"""Round-5 overflow / empty-input guards (ADVICE r4): packed-key domain
checks in the pair/triple miners, arbitrary-precision fano finish, and
the streaming_rolling zero-batch scan guard."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from pymhealth_ray.stages.triangles import group_pair_rows


def test_group_pair_rows_rejects_overflowing_K():
    tbl = pa.table({"g": ["a"], "i": pa.array([0], type=pa.int64())})
    with pytest.raises(ValueError, match="overflows int64"):
        group_pair_rows(tbl, "g", "i", K=2 ** 32)


def test_frequent_triples_rejects_overflowing_K():
    from pymhealth_ray.stages.assoc import frequent_triples
    with pytest.raises(ValueError, match="overflows int64"):
        # K³ ≥ 2⁶³ trips before the dataset is touched
        frequent_triples(None, "g", "i", max_item=2_100_000,
                         min_support=2)


def test_fano_exact_matches_bigint_beyond_int64():
    from pymhealth_ray.pipelines.queries import _fano_exact
    # sq ~ 4.6e18: n·sq wraps int64 (n=4) — the guarded path must match
    # exact integer arithmetic cast to double, per-row
    n = np.array([4, 3, 2, 1], dtype=np.int64)
    s = np.array([4_000_000_000, 9, 3_100_000_000, 7], dtype=np.int64)
    sq = np.array([4_600_000_000_000_000_000, 29,
                   4_805_000_000_000_000_000, 49], dtype=np.int64)
    got = _fano_exact(n, s, sq)
    want = np.array([float(int(ni) * int(qi) - int(si) ** 2)
                     / float(int(ni) * int(si))
                     for ni, si, qi in zip(n, s, sq)])
    assert (got == want).all()


def test_fano_exact_fast_path_small_values():
    from pymhealth_ray.pipelines.queries import _fano_exact
    rng = np.random.default_rng(11)
    c = rng.integers(1, 50, size=(20, 5))
    n = np.full(20, 5, dtype=np.int64)
    s = c.sum(1)
    sq = (c * c).sum(1)
    got = _fano_exact(n, s, sq)
    want = (n * sq - s * s).astype(float) / (n * s).astype(float)
    assert (got == want).all()


def test_streaming_rolling_all_empty_partition_files(ray_session, tmp_path):
    """A layout whose partition files hold ZERO rows must scan to a typed
    empty table, not raise ArrowInvalid (ADVICE r4)."""
    from pymhealth_ray.stages.streaming import streaming_rolling

    layout = tmp_path / "RZ"
    part = layout / "part=0"
    part.mkdir(parents=True)
    empty = pa.table({"doc_id": pa.array([], type=pa.string()),
                      "ts_ns": pa.array([], type=pa.int64()),
                      "n_tok": pa.array([], type=pa.int64())})
    pq.write_table(empty, part / "b0.parquet")
    got = streaming_rolling(str(layout), window=4)
    assert got.count() == 0
    assert set(got.schema().names) == {"doc_id", "ts_ns", "n_tok",
                                       "wsum", "wn"}


class TestMisraGries:
    def _files(self, tmp_path, n_files=5, rows=400, vocab=3000, seed=7):
        import pyarrow.parquet as pq

        rng = np.random.default_rng(seed)
        paths = []
        all_tokens = []
        for i in range(n_files):
            toks = []
            for _ in range(rows):
                # zipf-ish skew so real heavy hitters exist
                t = (rng.zipf(1.3, rng.integers(5, 40)) % vocab)
                toks.append(t.astype(np.int64).tolist())
                all_tokens.extend(toks[-1])
            p = tmp_path / f"part-{i:03d}.parquet"
            pq.write_table(pa.table({"tokens": pa.array(
                toks, type=pa.list_(pa.int64()))}), p)
            paths.append(str(p))
        return paths, np.asarray(all_tokens, dtype=np.int64)

    def test_guarantees_vs_exact(self, ray_session, tmp_path):
        from pymhealth_ray.stages.sketch import misra_gries_topk

        k = 16
        paths, flat = self._files(tmp_path)
        out = misra_gries_topk(paths, "tokens", k=k, top=10).to_pandas()
        uk, uc = np.unique(flat, return_counts=True)
        exact = dict(zip(uk.tolist(), uc.tolist()))
        n = len(flat)
        err = int(out.max_undercount.iloc[0])
        for _, r in out.iterrows():
            true = exact[int(r.token)]
            # est never overcounts; undercount bounded by the tracked err
            assert r.est_count <= true <= r.est_count + err
        # every item with true freq > n/(k+1) must survive and be in the
        # top list when top >= number of such items
        musts = {int(t) for t, c in exact.items() if c > n / (k + 1)}
        assert musts <= set(out.token.astype(int))

    def test_fold_order_is_deterministic(self, ray_session, tmp_path):
        from pymhealth_ray.stages.sketch import misra_gries_topk

        paths, _ = self._files(tmp_path, seed=8)
        a = misra_gries_topk(paths, "tokens", k=16, top=10).to_pandas()
        b = misra_gries_topk(list(reversed(paths)), "tokens",
                             k=16, top=10).to_pandas()
        pd.testing.assert_frame_equal(a, b)  # sorted internally


@pytest.mark.usefixtures("ray_session")
def test_ratio_delta_overflow_guard(tmp_path):
    import pyarrow.parquet as pq

    from pymhealth_ray.pipelines import queries as Q

    n = 40
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.arange(n, dtype=np.int64) * 1000,
                       type=pa.timestamp("us")),
        "user_id": pa.array(np.zeros(n, dtype=np.int64)),
        "event_type": pa.array(["view"] * n),
        # one user accumulates ~4e9 cents -> x*x would overflow int64
        "value": pa.array(np.full(n, 1_000_000_00.0)),
        "props": pa.array([""] * n),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    with pytest.raises(Exception, match="overflow"):
        Q.q_events_ratio_delta(str(tmp_path))
