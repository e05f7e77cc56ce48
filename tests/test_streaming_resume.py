"""Failure injection for the streaming layouts (VERDICT r4 item 8): a
resumable_write killed mid-layout leaves some buckets missing; the rerun
must complete ONLY the missing buckets and every streaming consumer over
the resumed layout must equal the one built in a single clean pass."""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from pymhealth_ray.state.lineage import read_manifests, resumable_write

GAP = 1000


def _df(n=2500, seed=31):
    rng = np.random.default_rng(seed)
    ent = np.array([f"d{int(i):04d}" for i in rng.integers(0, 30, n)])
    ts = rng.integers(0, 150_000, n).astype(np.int64)
    df = pd.DataFrame({"doc_id": ent, "ts_ns": ts,
                       "n_tok": rng.integers(1, 50, n).astype(np.int64)})
    return df.drop_duplicates(["doc_id", "ts_ns"]).reset_index(drop=True)


def _build(ds, layout, fail_buckets=None):
    resumable_write(ds, layout, entity_col="doc_id", num_buckets=6,
                    params={"v": 1}, sort_cols=["doc_id", "ts_ns"],
                    fail_buckets=fail_buckets)


@pytest.mark.usefixtures("ray_session")
def test_interrupted_layout_resumes_and_streams_identically(tmp_path):
    from pymhealth_ray.stages.streaming import (streaming_lag_features,
                                                streaming_rolling,
                                                streaming_session_stats)

    df = _df()
    ds = ray.data.from_pandas(df).repartition(3)

    clean = str(tmp_path / "CLEAN")
    _build(ds, clean)

    # injected death before buckets 2 and 4 get manifests
    resumed = str(tmp_path / "RESUMED")
    with pytest.raises(Exception):
        _build(ds, resumed, fail_buckets={2, 4})
    done = read_manifests(resumed)
    assert 2 not in done and 4 not in done
    # the rerun completes only the missing buckets
    _build(ds, resumed)
    assert set(read_manifests(resumed)) == set(read_manifests(clean))

    def canon(got: pd.DataFrame) -> pd.DataFrame:
        return got.sort_values(list(got.columns)).reset_index(drop=True)

    for fn, kw in ((streaming_session_stats, {"gap": GAP}),
                   (streaming_lag_features, {}),
                   (streaming_rolling, {"window": 8})):
        a = canon(fn(clean, **kw).to_pandas())
        b = canon(fn(resumed, **kw).to_pandas())
        pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_equi_join_and_latest_over_resumed_layouts(tmp_path):
    """The two consumers the round-4 review called out: SMB equi-join
    over a LEFT layout that died mid-ingest and was resumed, and
    latest-compaction over a resumed layout — both must equal their
    clean-build twins."""
    from pymhealth_ray.stages.streaming import (streaming_equi_join,
                                                streaming_latest)

    df = _df(seed=33)
    ds = ray.data.from_pandas(df).repartition(3)
    right = pd.DataFrame({
        "doc_id": sorted(df.doc_id.unique())[::2],
    })
    right["rv"] = np.arange(len(right), dtype=np.int64)
    rds = ray.data.from_pandas(right)

    clean_l, res_l = str(tmp_path / "JL"), str(tmp_path / "JLR")
    rlay = str(tmp_path / "JR")
    _build(ds, clean_l)
    with pytest.raises(Exception):
        _build(ds, res_l, fail_buckets={0, 3})
    _build(ds, res_l)
    resumable_write(rds, rlay, entity_col="doc_id", num_buckets=6,
                    params={"v": 1}, sort_cols=["doc_id"])

    def canon(got: pd.DataFrame) -> pd.DataFrame:
        return got.sort_values(list(got.columns)).reset_index(drop=True)

    for jt in ("inner", "left outer"):
        a = canon(streaming_equi_join(clean_l, rlay, key_col="doc_id",
                                      join_type=jt).to_pandas())
        b = canon(streaming_equi_join(res_l, rlay, key_col="doc_id",
                                      join_type=jt).to_pandas())
        pd.testing.assert_frame_equal(a, b)

    a = canon(streaming_latest(clean_l).to_pandas())
    b = canon(streaming_latest(res_l).to_pandas())
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_resume_skips_completed_buckets(tmp_path):
    """The rerun must not rewrite finished partitions: data files of
    completed buckets keep their mtime/inode across the resume."""
    df = _df(seed=32)
    ds = ray.data.from_pandas(df).repartition(3)
    layout = str(tmp_path / "SKIP")
    with pytest.raises(Exception):
        _build(ds, layout, fail_buckets={1})
    before = {p: os.stat(p).st_mtime_ns
              for p in glob.glob(os.path.join(layout, "part=*",
                                              "*.parquet"))}
    assert before  # some buckets did finish before the injected death
    _build(ds, layout)
    after = {p: os.stat(p).st_mtime_ns for p in before}
    assert before == after


@pytest.mark.usefixtures("ray_session")
def test_candles_over_resumed_layout(tmp_path):
    """streaming_candles over a killed-then-resumed layout equals the
    clean-pass build bit-for-bit (10th-family failure injection)."""
    from pymhealth_ray.stages.streaming import streaming_candles

    rng = np.random.default_rng(37)
    n = 3000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 25, n).astype(np.int64),
        "ts_us": rng.integers(0, 40 * 86_400_000_000, n).astype(np.int64),
        "val_c": rng.integers(-900, 900, n).astype(np.int64),
    }).drop_duplicates(["user_id", "ts_us"]).reset_index(drop=True)
    ds = ray.data.from_pandas(df).repartition(4)

    def build(layout, fail=None):
        resumable_write(ds, layout, entity_col="user_id", num_buckets=5,
                        params={"v": 1}, sort_cols=["user_id", "ts_us"],
                        fail_buckets=fail)

    clean = str(tmp_path / "C")
    build(clean)
    resumed = str(tmp_path / "R")
    with pytest.raises(Exception):
        build(resumed, fail={1, 3})
    build(resumed)

    def run(layout):
        return streaming_candles(layout, entity_col="user_id",
                                 ts_col="ts_us", val_col="val_c",
                                 batch_rows=256).to_pandas() \
            .sort_values(["user_id", "day"]).reset_index(drop=True)

    a, b = run(clean), run(resumed)
    assert a.equals(b)
    # and equals the brute force
    df2 = df.copy()
    df2["day"] = df2["ts_us"] // 86_400_000_000
    df2 = df2.sort_values(["user_id", "ts_us"])
    exp = df2.groupby(["user_id", "day"])["val_c"].agg(
        ["size", "first", "max", "min", "last"]).reset_index()
    assert (a["n"].to_numpy() == exp["size"].to_numpy()).all()
    assert (a["open"].to_numpy() == exp["first"].to_numpy()).all()
    assert (a["close"].to_numpy() == exp["last"].to_numpy()).all()
