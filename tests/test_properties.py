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
