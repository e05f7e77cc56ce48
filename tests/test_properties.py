"""Property-based tests (hypothesis): the engine's in-group computations vs
the single-array oracle on arbitrary irregular series — no Ray involved, so
these fuzz the numeric core cheaply (SURVEY.md §5.2 item 4 family)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from pymhealth_ray.functions import windows as W
from pymhealth_ray.stages.window import compute_entity_windows

ts_strategy = st.lists(
    st.integers(min_value=0, max_value=10**6), min_size=2, max_size=120
).map(lambda xs: np.unique(np.asarray(xs, dtype=np.int64)))


@settings(max_examples=200, deadline=None)
@given(
    ts=ts_strategy,
    wsize=st.integers(min_value=1, max_value=10**5),
    wstep=st.integers(min_value=1, max_value=10**5),
    min_len=st.integers(min_value=1, max_value=4),
)
def test_window_stage_matches_oracle(ts, wsize, wstep, min_len):
    if len(ts) < 2:
        return
    rng = np.random.default_rng(0)
    v = rng.normal(size=len(ts)) * 10
    res = compute_entity_windows(
        ts, {"v": v}, wsize, wstep,
        {"m": ("v", "mean"), "s": ("v", "std"), "mn": ("v", "min"), "mx": ("v", "max"), "c": ("v", "count")},
        min_window_len=min_len,
    )
    starts = W.window_starts(ts, wstep)
    if len(starts) == 0:
        assert res is None
        return
    w_starts, cols, cnt = res
    assert np.array_equal(w_starts, starts)
    idx = W.get_indices(ts, wsize, wstep)
    for name, fn in (("m", np.mean), ("s", np.std), ("mn", np.min), ("mx", np.max)):
        exp = W.indices_rolling_apply(fn, min_len)(idx, v)
        assert np.allclose(cols[name], exp, equal_nan=True, atol=1e-9), name
    assert np.array_equal(cnt, idx[1] - idx[0])


@settings(max_examples=200, deadline=None)
@given(
    ts=ts_strategy,
    gap=st.integers(min_value=1, max_value=10**6),
)
def test_sessionize_monotone_and_gap_consistent(ts, gap):
    sid = W.sessionize(ts, gap)
    assert len(sid) == len(ts)
    if len(ts) == 0:
        return
    assert sid[0] == 0
    d = np.diff(sid)
    assert ((d == 0) | (d == 1)).all()
    breaks = np.diff(ts) > gap
    assert np.array_equal(d == 1, breaks)


@settings(max_examples=200, deadline=None)
@given(
    fact_ts=ts_strategy,
    dim_ts=ts_strategy,
)
def test_asof_backward_properties(fact_ts, dim_ts):
    pos = W.asof_backward(fact_ts, dim_ts)
    for t, p in zip(fact_ts, pos):
        if p < 0:
            # no dim row at or before t
            assert (dim_ts > t).all() or len(dim_ts) == 0
        else:
            assert dim_ts[p] <= t
            if p + 1 < len(dim_ts):
                assert dim_ts[p + 1] > t


@settings(max_examples=100, deadline=None)
@given(
    vals=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=60),
    w=st.integers(min_value=1, max_value=20),
    s=st.integers(min_value=1, max_value=10),
)
def test_rolling_apply_window_count(vals, w, s):
    arr = np.asarray(vals, dtype=np.float64)
    out = W.rolling_apply(np.mean, w, s)(arr)
    assert len(out) == max(0, 1 + (len(arr) - w) // s)
    for i, o in enumerate(out):
        assert np.isclose(o, arr[i * s : i * s + w].mean())


class TestWindowEdgeCases:
    def test_single_event_no_windows(self):
        assert compute_entity_windows(
            np.array([5]), {"v": np.array([1.0])}, 10, 10, {"m": ("v", "mean")}
        ) is None

    def test_all_same_ts_no_windows(self):
        assert compute_entity_windows(
            np.array([5, 5, 5]), {"v": np.ones(3)}, 10, 10, {"m": ("v", "mean")}
        ) is None

    def test_constant_values_zero_std(self):
        ts = np.arange(10, dtype=np.int64)
        res = compute_entity_windows(ts, {"v": np.full(10, 7.0)}, 3, 3, {"s": ("v", "std")})
        _, cols, _ = res
        assert (cols["s"] == 0).all()

    def test_empty_window_nan_gating(self):
        ts = np.array([0, 1, 2, 200, 201], dtype=np.int64)
        res = compute_entity_windows(
            ts, {"v": np.arange(5.0)}, 10, 10, {"m": ("v", "mean")}, min_window_len=1
        )
        starts, cols, cnt = res
        assert np.isclose(cols["m"][0], 1.0)
        assert np.isnan(cols["m"][1]) and cnt[1] == 0


# --- round-2 pure kernels ---------------------------------------------------


class TestTopKRowsProperties:
    @given(st.lists(st.tuples(st.integers(0, 5), st.integers(-50, 50),
                              st.integers(0, 10**6)), min_size=1, max_size=200),
           st.integers(1, 8), st.booleans())
    @settings(max_examples=150, deadline=None)
    def test_matches_sorted_head(self, rows, k, descending):
        import pandas as pd
        import pyarrow as pa
        from pymhealth_ray.stages.aggregate import _topk_rows

        tbl = pa.table({
            "g": pa.array([r[0] for r in rows]),
            "v": pa.array([r[1] for r in rows]),
            "i": pa.array([r[2] for r in rows]),
        })
        got = _topk_rows(tbl, ["g"], "v", k, descending, ["i"], "rn").to_pandas()
        df = pd.DataFrame({"g": tbl["g"], "v": tbl["v"], "i": tbl["i"]})
        want = (df.sort_values(["v", "i"], ascending=[not descending, True])
                  .groupby("g", sort=False).head(k))
        assert len(got) == len(want)
        got_set = set(zip(got.g, got.v, got.i))
        want_set = set(zip(want.g, want.v, want.i))
        assert got_set == want_set
        assert (got.groupby("g").rn.min() == 1).all()
        assert (got.groupby("g").rn.max() == got.groupby("g").size()).all()


class TestGreedyPackProperties:
    @given(st.lists(st.integers(0, 3000), min_size=0, max_size=300),
           st.integers(1, 2500))
    @settings(max_examples=200, deadline=None)
    def test_boundaries_invariants(self, lens, max_len):
        import numpy as np
        from pymhealth_ray.stages.pack import greedy_boundaries

        arr = np.array(lens, dtype=np.int64)
        b = greedy_boundaries(arr, max_len)
        assert b[0] == 0 and b[-1] == len(arr)
        assert (np.diff(b) >= 1).all()
        for s, e in zip(b[:-1], b[1:]):
            total = arr[s:e].sum()
            # a pack over budget must be a single oversize sequence
            assert total <= max_len or e - s == 1
            # greedy: the next sequence would not have fit
            if e < len(arr) and e - s >= 1 and total <= max_len:
                assert total + arr[e] > max_len


class TestHLLProperties:
    @given(st.lists(st.integers(0, 10**12), min_size=1, max_size=500),
           st.integers(1, 4))
    @settings(max_examples=50, deadline=None)
    def test_merge_equals_whole(self, vals, n_splits):
        import numpy as np
        from pymhealth_ray.stages.sketch import _hash64, _registers
        import pyarrow as pa

        p = 12
        whole = _registers(np.zeros(len(vals), dtype=np.int64),
                           _hash64(pa.array(vals, type=pa.int64())), 1, p)
        chunks = np.array_split(np.asarray(vals, dtype=np.int64), n_splits)
        merged = np.zeros_like(whole)
        for c in chunks:
            if len(c):
                part = _registers(np.zeros(len(c), dtype=np.int64),
                                  _hash64(pa.array(c, type=pa.int64())), 1, p)
                merged = np.maximum(merged, part)
        assert np.array_equal(whole, merged)


class TestQuantileRuleProperties:
    @given(st.lists(st.integers(0, 40), min_size=1, max_size=60),
           st.sampled_from([0.1, 0.25, 1 / 3, 0.5, 2 / 3, 0.75, 0.9]))
    @settings(max_examples=100, deadline=None)
    def test_matches_duckdb(self, vals, q):
        import duckdb
        import math

        con = duckdb.connect()
        con.execute("create table t(x int)")
        con.executemany("insert into t values (?)", [(v,) for v in vals])
        want = con.execute(f"select quantile_disc(x, {q!r}) from t").fetchone()[0]
        xs = sorted(vals)
        got = xs[max(0, math.ceil(q * len(xs)) - 1)]
        assert got == want
