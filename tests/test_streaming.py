"""stages/streaming: the streaming per-file sessionizer equals the
sort-based bucket sessionizer, including with TINY Arrow batches so the
open-session carry crosses many batch boundaries."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from pymhealth_ray.stages.session import session_stats
from pymhealth_ray.stages.streaming import streaming_session_stats
from pymhealth_ray.state.lineage import resumable_write

GAP = 1000


def _df(n=3000, seed=17):
    rng = np.random.default_rng(seed)
    ent = np.array([f"d{int(i):04d}" for i in rng.integers(0, 40, n)])
    ts = rng.integers(0, 200_000, n).astype(np.int64)
    df = pd.DataFrame({"doc_id": ent, "ts_ns": ts,
                       "n_tok": rng.integers(1, 50, n).astype(np.int64)})
    return df.drop_duplicates(["doc_id", "ts_ns"]).reset_index(drop=True)


@pytest.mark.parametrize("batch_rows", [7, 64, 65536])
def test_streaming_equals_sorted_buckets(ray_session, tmp_path, batch_rows):
    df = _df()
    ds = ray.data.from_pandas(df).repartition(6)
    layout = str(tmp_path / "lay")
    resumable_write(ds, layout, entity_col="doc_id", num_buckets=8,
                    params={"sorted": True}, sort_cols=["doc_id", "ts_ns"])
    got = (streaming_session_stats(layout, gap=GAP, batch_rows=batch_rows)
           .to_pandas().sort_values(["doc_id", "session_id"])
           .reset_index(drop=True))
    want = (session_stats(ds, GAP, value_col="n_tok", num_buckets=8)
            .to_pandas()
            [["doc_id", "session_id", "n_events", "start_ns", "end_ns",
              "duration_ns", "n_tok_sum", "n_tok_mean"]]
            .sort_values(["doc_id", "session_id"]).reset_index(drop=True))
    got = got[want.columns]
    pd.testing.assert_frame_equal(
        got.astype({"n_tok_sum": np.int64}),
        want.astype({"n_tok_sum": np.int64}))


@pytest.mark.parametrize("batch_rows", [5, 64, 65536])
def test_streaming_asof_matches_pandas(ray_session, tmp_path, batch_rows):
    from pymhealth_ray.stages.streaming import streaming_asof_join

    rng = np.random.default_rng(29)
    n = 2500
    df = pd.DataFrame({
        "doc_id": np.array([f"d{int(i):03d}" for i in rng.integers(0, 25, n)]),
        "ts_ns": rng.integers(0, 10**6, n).astype(np.int64),
        "n_tok": rng.integers(1, 100, n).astype(np.int64),
    }).drop_duplicates(["doc_id", "ts_ns"]).reset_index(drop=True)
    T = 80
    ds = ray.data.from_pandas(df).repartition(5)
    left = str(tmp_path / "L")
    right = str(tmp_path / "R")
    resumable_write(ds, left, entity_col="doc_id", num_buckets=6,
                    params={"s": 1}, sort_cols=["doc_id", "ts_ns"])
    resumable_write(
        ds.filter(lambda r: r["n_tok"] >= T), right, entity_col="doc_id",
        num_buckets=6, params={"s": 2}, sort_cols=["doc_id", "ts_ns"])
    got = (streaming_asof_join(left, right, batch_rows=batch_rows)
           .to_pandas().sort_values(["doc_id", "ts_ns"])
           .reset_index(drop=True))
    # pandas reference: running last qualifying (ts, val) per entity
    want_ts, want_val = [], []
    for _, g in df.sort_values(["doc_id", "ts_ns"]).groupby("doc_id",
                                                            sort=True):
        last = None
        for ts, v in zip(g.ts_ns, g.n_tok):
            if v >= T:
                last = (ts, v)
            want_ts.append(last[0] if last else None)
            want_val.append(last[1] if last else None)
    assert ([None if pd.isna(x) else int(x) for x in got.asof_ts]
            == [None if t is None else int(t) for t in want_ts])
    assert ([None if pd.isna(x) else int(x) for x in got.asof_val]
            == [None if v is None else int(v) for v in want_val])


@pytest.mark.parametrize("batch_rows", [6, 65536])
def test_streaming_lag_matches_pandas(ray_session, tmp_path, batch_rows):
    from pymhealth_ray.stages.streaming import streaming_lag_features

    df = _df(seed=41)
    ds = ray.data.from_pandas(df).repartition(4)
    layout = str(tmp_path / "lag")
    resumable_write(ds, layout, entity_col="doc_id", num_buckets=5,
                    params={"s": 3}, sort_cols=["doc_id", "ts_ns"])
    got = (streaming_lag_features(layout, batch_rows=batch_rows)
           .to_pandas().sort_values(["doc_id", "ts_ns"])
           .reset_index(drop=True))
    ref = df.sort_values(["doc_id", "ts_ns"]).reset_index(drop=True)
    g = ref.groupby("doc_id", sort=True)
    want_lag = g.n_tok.shift(1)
    want_dt = ref.ts_ns - g.ts_ns.shift(1)
    want_diff = (ref.n_tok - g.n_tok.shift(1)).fillna(0)
    assert ([None if pd.isna(x) else int(x) for x in got.lag1]
            == [None if pd.isna(x) else int(x) for x in want_lag])
    assert ([None if pd.isna(x) else int(x) for x in got.dt]
            == [None if pd.isna(x) else int(x) for x in want_dt])
    assert got.diff1.astype(int).tolist() == want_diff.astype(int).tolist()


def test_streaming_asof_missing_right_partitions(ray_session, tmp_path):
    """A filtered right side can leave whole buckets without a part dir;
    those left partitions must still emit every row with NULL as-ofs
    (round-4 code-review finding)."""
    from pymhealth_ray.stages.streaming import streaming_asof_join

    df = pd.DataFrame({
        "doc_id": np.array([f"d{i:02d}" for i in range(30)
                            for _ in range(4)]),
        "ts_ns": np.tile(np.arange(4, dtype=np.int64), 30),
        "n_tok": np.ones(120, dtype=np.int64),
    })
    # right side: qualifying rows exist for ONE doc only -> most right
    # buckets are empty and get no part dir at all
    df.loc[(df.doc_id == "d03"), "n_tok"] = 99
    ds = ray.data.from_pandas(df).repartition(3)
    left = str(tmp_path / "L2")
    right = str(tmp_path / "R2")
    resumable_write(ds, left, entity_col="doc_id", num_buckets=8,
                    params={"s": 1}, sort_cols=["doc_id", "ts_ns"])
    resumable_write(ds.filter(lambda r: r["n_tok"] >= 99), right,
                    entity_col="doc_id", num_buckets=8, params={"s": 2},
                    sort_cols=["doc_id", "ts_ns"])
    got = streaming_asof_join(left, right).to_pandas()
    assert len(got) == 120  # no left row dropped
    hit = got[got.doc_id == "d03"]
    assert hit.asof_val.notna().all()
    assert got[got.doc_id != "d03"].asof_val.isna().all()


def test_streaming_rolling_tiny_batches_match_pandas(ray_session, tmp_path):
    """Trailing-window sums with batch_rows=7 (carry crosses many batch
    boundaries) equal the pandas groupby.rolling reference."""
    from pymhealth_ray.stages.streaming import streaming_rolling

    df = _df(2500, seed=23)
    ds = ray.data.from_pandas(df).repartition(3)
    layout = str(tmp_path / "RW")
    resumable_write(ds, layout, entity_col="doc_id", num_buckets=6,
                    params={"s": 3}, sort_cols=["doc_id", "ts_ns"])
    got = streaming_rolling(layout, window=8, batch_rows=7).to_pandas()
    got = got.sort_values(["doc_id", "ts_ns"]).reset_index(drop=True)
    ref = df.sort_values(["doc_id", "ts_ns"]).reset_index(drop=True)
    g = ref.groupby("doc_id")["n_tok"]
    want_sum = g.rolling(8, min_periods=1).sum().reset_index(drop=True)
    want_n = g.rolling(8, min_periods=1).count().reset_index(drop=True)
    assert (got["wsum"].to_numpy() == want_sum.to_numpy().astype(np.int64)).all()
    assert (got["wn"].to_numpy() == want_n.to_numpy().astype(np.int64)).all()


def test_streaming_equi_join_matches_pyarrow(ray_session, tmp_path):
    """SMB join over co-bucketed layouts == a plain hash join, for inner
    and left outer, including right buckets with NO part dir."""
    from pymhealth_ray.stages.streaming import streaming_equi_join

    rng = np.random.default_rng(31)
    left = pd.DataFrame({
        "k": np.array([f"k{i:03d}" for i in rng.integers(0, 120, 800)]),
        "lv": rng.integers(0, 1000, 800).astype(np.int64)})
    right = pd.DataFrame({
        "k": np.array([f"k{i:03d}" for i in range(0, 120, 3)]),
        "rv": np.arange(0, 120, 3, dtype=np.int64)})
    ll = str(tmp_path / "L")
    rr = str(tmp_path / "R")
    resumable_write(ray.data.from_pandas(left), ll, entity_col="k",
                    num_buckets=8, params={"t": 1}, sort_cols=["k"])
    resumable_write(ray.data.from_pandas(right), rr, entity_col="k",
                    num_buckets=8, params={"t": 2}, sort_cols=["k"])
    for jt in ("inner", "left outer"):
        got = streaming_equi_join(ll, rr, key_col="k",
                                  join_type=jt).to_pandas()
        want = left.merge(right, on="k",
                          how="inner" if jt == "inner" else "left")
        got = got.sort_values(["k", "lv"]).reset_index(drop=True)
        want = want.sort_values(["k", "lv"]).reset_index(drop=True)
        assert len(got) == len(want)
        assert (got["k"].to_numpy() == want["k"].to_numpy()).all()
        assert got["rv"].fillna(-1).to_numpy().tolist() == \
            want["rv"].fillna(-1).to_numpy().tolist()


def test_streaming_equi_join_contract_guards(ray_session, tmp_path):
    from pymhealth_ray.stages.streaming import streaming_equi_join

    ll = str(tmp_path / "L3")
    resumable_write(ray.data.from_pandas(
        pd.DataFrame({"k": ["a"], "v": [1]})), ll, entity_col="k",
        num_buckets=2, params={"t": 9}, sort_cols=["k"])
    with pytest.raises(ValueError, match="inner/left outer"):
        streaming_equi_join(ll, ll, key_col="k", join_type="full outer")
    with pytest.raises(ValueError, match="no part"):
        streaming_equi_join(ll, str(tmp_path / "nope"), key_col="k")


@pytest.mark.parametrize("batch_rows", [64, 65536])
def test_streaming_interval_join_matches_bruteforce(ray_session, tmp_path,
                                                    batch_rows):
    from pymhealth_ray.stages.streaming import streaming_interval_join

    rng = np.random.default_rng(31)
    nf, ni = 1500, 400
    facts = pd.DataFrame({
        "entity": rng.integers(0, 12, nf).astype(np.int64),
        "ts_us": rng.integers(0, 10**5, nf).astype(np.int64),
        "event_id": np.arange(nf, dtype=np.int64),
    })
    start = rng.integers(0, 10**5, ni).astype(np.int64)
    ivals = pd.DataFrame({
        "entity": rng.integers(0, 12, ni).astype(np.int64),
        "start_us": start,
        "end_us": start + rng.integers(1, 2 * 10**4, ni).astype(np.int64),
        "ival_id": np.arange(ni, dtype=np.int64),
    })
    ll, rr = str(tmp_path / "F"), str(tmp_path / "I")
    resumable_write(ray.data.from_pandas(facts).repartition(4), ll,
                    entity_col="entity", num_buckets=5, params={"s": 1},
                    sort_cols=["entity", "ts_us"])
    resumable_write(ray.data.from_pandas(ivals).repartition(3), rr,
                    entity_col="entity", num_buckets=5, params={"s": 2},
                    sort_cols=["entity", "start_us"])
    got = streaming_interval_join(
        ll, rr, entity_col="entity", ts_col="ts_us",
        start_col="start_us", end_col="end_us",
        l_extra=["event_id"], r_extra=["ival_id"],
        batch_rows=batch_rows).to_pandas()
    got = got.sort_values(["event_id", "ival_id"]).reset_index(drop=True)

    m = facts.merge(ivals, on="entity")
    m = m[(m.ts_us >= m.start_us) & (m.ts_us < m.end_us)]
    exp = m[["entity", "ts_us", "event_id", "ival_id"]] \
        .sort_values(["event_id", "ival_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp)


def test_streaming_interval_join_empty_right_partitions(ray_session,
                                                        tmp_path):
    from pymhealth_ray.stages.streaming import streaming_interval_join

    facts = pd.DataFrame({
        "entity": np.arange(20, dtype=np.int64),
        "ts_us": np.full(20, 50, dtype=np.int64),
        "event_id": np.arange(20, dtype=np.int64),
    })
    ivals = pd.DataFrame({
        "entity": np.array([0], dtype=np.int64),
        "start_us": np.array([0], dtype=np.int64),
        "end_us": np.array([100], dtype=np.int64),
        "ival_id": np.array([7], dtype=np.int64),
    })
    ll, rr = str(tmp_path / "F2"), str(tmp_path / "I2")
    resumable_write(ray.data.from_pandas(facts), ll, entity_col="entity",
                    num_buckets=8, params={"s": 1},
                    sort_cols=["entity", "ts_us"])
    resumable_write(ray.data.from_pandas(ivals), rr, entity_col="entity",
                    num_buckets=8, params={"s": 2},
                    sort_cols=["entity", "start_us"])
    got = streaming_interval_join(
        ll, rr, entity_col="entity", ts_col="ts_us",
        start_col="start_us", end_col="end_us",
        l_extra=["event_id"], r_extra=["ival_id"]).to_pandas()
    assert len(got) == 1
    assert got.event_id[0] == 0 and got.ival_id[0] == 7
