"""Round-5 wave-5 operators: SCD2 point-in-time join, HLL
inclusion-exclusion overlap, embedding drift, time-weighted average —
brute-force references on synthetic fixtures + partition invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray


def _write_events(tmp_path, n=2000, users=23, seed=7):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(1_700_000_000_000_000, 1_700_100_000_000_000,
                              size=n))
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, users, size=n)),
        "event_type": pa.array(rng.choice(
            ["signup", "click", "view", "purchase"], size=n).tolist()),
        "value": pa.array(np.round(rng.uniform(0.01, 99.99, size=n), 2)),
        "props": pa.array([""] * n),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    return tbl


@pytest.mark.usefixtures("ray_session")
def test_twa_matches_bruteforce(tmp_path):
    from pymhealth_ray.pipelines.queries import q_events_twa

    tbl = _write_events(tmp_path)
    got = q_events_twa(str(tmp_path)).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)

    df = tbl.to_pandas()
    df["ts_us"] = df["ts"].astype("int64")
    df["val_c"] = np.rint(df["value"].to_numpy() * 100).astype(np.int64)
    rows = []
    for uid, g in df.sort_values(["user_id", "ts_us", "event_id"]) \
                    .groupby("user_id"):
        if len(g) < 2:
            continue
        ts = g["ts_us"].to_numpy()
        v = g["val_c"].to_numpy()
        num = int((v[:-1] * np.diff(ts)).sum())
        span = int(ts[-1] - ts[0])
        m = 10.0**6
        twa = num / span
        twa = np.sign(twa) * np.floor(abs(twa) * m + 0.5) / m
        rows.append((uid, len(g), span, twa))
    want = pd.DataFrame(rows, columns=["user_id", "n", "span_us", "twa_c"])
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


@pytest.mark.usefixtures("ray_session")
def test_scd2_pit_matches_bruteforce(tmp_path):
    from pymhealth_ray.pipelines.queries import q_events_scd2_pit

    tbl = _write_events(tmp_path, n=1500, users=17, seed=13)
    got = q_events_scd2_pit(str(tmp_path)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)

    df = tbl.to_pandas()
    df["ts_us"] = df["ts"].astype("int64")
    rows = []
    for uid, g in df.sort_values(["user_id", "ts_us", "event_id"]) \
                    .groupby("user_id"):
        runs = []  # (valid_from, status, version)
        for _, r in g[g["event_type"] != "purchase"].iterrows():
            if not runs or runs[-1][1] != r["event_type"]:
                runs.append((r["ts_us"], r["event_type"], len(runs) + 1))
        for _, r in g[g["event_type"] == "purchase"].iterrows():
            hit = None
            for vf, st, ver in runs:
                if vf <= r["ts_us"]:
                    hit = (st, ver, vf)
            rows.append((r["event_id"], uid, r["ts_us"],
                         *(hit if hit else (None, None, None))))
    want = pd.DataFrame(rows, columns=["event_id", "user_id", "ts_us",
                                       "status", "version_n",
                                       "status_since_us"]) \
        .sort_values("event_id").reset_index(drop=True)
    got["status"] = got["status"].where(got["status"].notna(), None)
    assert len(got) == len(want)
    for c in want.columns:
        gv, wv = got[c].tolist(), want[c].tolist()
        for a, b in zip(gv, wv):
            if b is None or (isinstance(b, float) and np.isnan(b)):
                assert a is None or (isinstance(a, float) and np.isnan(a))
            else:
                assert a == b, (c, a, b)


@pytest.mark.usefixtures("ray_session")
def test_hll_overlap_matches_single_process(tmp_path):
    from pymhealth_ray.pipelines.queries import (_hll_overlap_expected,
                                                 q_lineitem_hll_overlap)

    rng = np.random.default_rng(3)
    n = 4000
    tbl = pa.table({
        "l_orderkey": pa.array(rng.integers(0, 900, size=n)),
        "l_returnflag": pa.array(rng.choice(["R", "A", "N"],
                                            size=n).tolist()),
    })
    pq.write_table(tbl, tmp_path / "lineitem.parquet")
    got = q_lineitem_hll_overlap(str(tmp_path)).to_pandas()
    want = _hll_overlap_expected(tbl.to_pandas())
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # inclusion-exclusion should land near the exact overlap
    df = tbl.to_pandas()
    exact = len(set(df[df.l_returnflag == "R"].l_orderkey)
                & set(df[df.l_returnflag == "A"].l_orderkey))
    assert abs(got["est_inter"][0] - exact) / exact < 0.1


@pytest.mark.usefixtures("ray_session")
def test_embed_drift_matches_bruteforce(tmp_path):
    from pymhealth_ray.pipelines.queries import q_embed_drift

    rng = np.random.default_rng(5)
    n, d = 300, 16
    emb = rng.normal(size=(n, d)).astype(np.float32)
    lab = rng.integers(0, 4, size=n).astype(np.int32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
        "label": pa.array(lab),
    })
    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    got = q_embed_drift(str(tmp_path)).to_pandas() \
        .sort_values(["label", "dim"]).reset_index(drop=True)

    m = 10.0**6

    def rnd(x):
        return np.sign(x) * np.floor(np.abs(x) * m + 0.5) / m

    q = rnd(emb.astype(np.float64) * 1048576.0 / m * m)
    q = np.sign(emb.astype(np.float64) * 1048576.0) * np.floor(
        np.abs(emb.astype(np.float64) * 1048576.0) + 0.5)
    rows = []
    for lb in sorted(set(lab.tolist())):
        for dim in range(d):
            s0 = q[(lab == lb) & (np.arange(n) % 2 == 0), dim]
            s1 = q[(lab == lb) & (np.arange(n) % 2 == 1), dim]
            m0 = s0.sum() / len(s0)
            m1 = s1.sum() / len(s1)
            rows.append((lb, dim + 1, rnd(m0), rnd(m1), rnd(m0 - m1)))
    want = pd.DataFrame(rows, columns=["label", "dim", "mean_even",
                                       "mean_odd", "drift"])
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
