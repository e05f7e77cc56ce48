"""Sweep-line peak concurrency (stages/sweep.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray


def _brute_peak(iv, period_us):
    """Reference: evaluate concurrency at every delta point AND at each
    active period's start (the carried-in level)."""
    pts = sorted([(s, 1) for s, _ in iv] + [(e + 1, -1) for _, e in iv],
                 key=lambda p: (p[0], p[1]))
    cum, best, last_per = 0, {}, None
    for t, d in pts:
        per = t // period_us
        if per != last_per:
            best[per] = max(best.get(per, -10**18), cum)  # entering level
            last_per = per
        cum += d
        best[per] = max(best[per], cum)
    return best


@pytest.mark.usefixtures("ray_session")
def test_peak_concurrency_matches_bruteforce():
    from pymhealth_ray.stages.sweep import peak_concurrency

    rng = np.random.default_rng(7)
    s = rng.integers(0, 50_000, size=400).astype(np.int64)
    e = s + rng.integers(0, 9_000, size=400).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"s": s, "e": e})).repartition(7)
    got = peak_concurrency(ds, "s", "e", period_us=10_000).to_pandas()
    want = _brute_peak(list(zip(s.tolist(), e.tolist())), 10_000)
    got = got.sort_values("period").reset_index(drop=True)
    assert dict(zip(got["period"], got["peak"])) == want
    assert got["peak"].dtype == np.int64


@pytest.mark.usefixtures("ray_session")
def test_peak_concurrency_partition_invariant():
    from pymhealth_ray.stages.sweep import peak_concurrency

    rng = np.random.default_rng(11)
    s = rng.integers(0, 200_000, size=1500).astype(np.int64)
    e = s + rng.integers(0, 30_000, size=1500).astype(np.int64)
    tbl = pa.table({"s": s, "e": e})

    def run(n_part, n_bins):
        ds = ray.data.from_arrow(tbl).repartition(n_part)
        out = peak_concurrency(ds, "s", "e", period_us=50_000,
                               num_bins=n_bins).to_pandas()
        return out.sort_values("period").reset_index(drop=True)

    a = run(3, 16)
    b = run(17, 301)
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_peak_concurrency_ties_close_before_open():
    # back-to-back intervals [0,9] and [10,19]: at t=10 the first is
    # closed before the second opens, so peak stays 1.
    from pymhealth_ray.stages.sweep import peak_concurrency

    tbl = pa.table({"s": pa.array([0, 10], type=pa.int64()),
                    "e": pa.array([9, 19], type=pa.int64())})
    out = peak_concurrency(ray.data.from_arrow(tbl), "s", "e",
                           period_us=1_000_000).to_pandas()
    assert out["peak"].tolist() == [1]


@pytest.mark.usefixtures("ray_session")
def test_scd2_intervals_tile_the_timeline():
    import pyarrow.parquet  # noqa: F401
    from pymhealth_ray.pipelines.queries import q_events_scd2

    out = q_events_scd2("/root/testdata/sf0.001").to_pandas()
    out = out.sort_values(["user_id", "version_n"])
    for uid, g in out.groupby("user_id"):
        v = g.reset_index(drop=True)
        # versions are 1..n, exactly one open row (the last), and each
        # valid_to equals the next version's valid_from
        assert v["version_n"].tolist() == list(range(1, len(v) + 1))
        assert v["valid_to"].isna().tolist() == [False] * (len(v) - 1) + [True]
        if len(v) > 1:
            assert (v["valid_to"].iloc[:-1].to_numpy()
                    == v["valid_from"].iloc[1:].to_numpy()).all()
