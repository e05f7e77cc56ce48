"""Range (interval) join: brute-force parity, chunked/unchunked equivalence,
left-outer placeholder semantics, duplicate fact rows."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from pymhealth_ray.stages.rangejoin import range_join


def _brute(facts: pd.DataFrame, dims: pd.DataFrame, join_type: str) -> pd.DataFrame:
    rows = []
    for _, f in facts.iterrows():
        matched = dims[
            (dims.entity == f.entity) & (dims.start <= f.ts) & (f.ts < dims.end)
        ]
        if len(matched):
            for _, d in matched.iterrows():
                rows.append((f.entity, f.ts, f.payload, d.start, d.end, d.tag))
        elif join_type == "left outer":
            rows.append((f.entity, f.ts, f.payload, None, None, None))
    return (
        pd.DataFrame(rows, columns=["entity", "ts", "payload", "start", "end", "tag"])
        .sort_values(["entity", "ts", "payload", "start", "tag"], na_position="last")
        .reset_index(drop=True)
    )


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.sort_values(["entity", "ts", "payload", "start", "tag"], na_position="last")
        .reset_index(drop=True)
        .astype({"start": "float64", "end": "float64"})
    )


@pytest.fixture(scope="module")
def fixture(ray_session):
    rng = np.random.default_rng(7)
    n_f, n_d = 600, 120
    facts = pd.DataFrame({
        "entity": rng.integers(0, 12, n_f),
        "ts": rng.integers(0, 10_000, n_f),
        "payload": np.arange(n_f),
    })
    # duplicate (entity, ts) pairs on purpose
    facts.loc[5, ["entity", "ts"]] = facts.loc[4, ["entity", "ts"]].values
    start = rng.integers(0, 9_500, n_d)
    dims = pd.DataFrame({
        "entity": rng.integers(0, 12, n_d),
        "start": start,
        "end": start + rng.integers(1, 2_000, n_d),  # overlapping intervals
        "tag": np.arange(n_d) * 10,
    })
    return facts, dims


class TestRangeJoin:
    @pytest.mark.parametrize("join_type", ["inner", "left outer"])
    @pytest.mark.parametrize("chunk", [None, 1024])
    def test_matches_brute_force(self, fixture, join_type, chunk):
        facts, dims = fixture
        got = range_join(
            ray.data.from_pandas(facts), ray.data.from_pandas(dims),
            entity_col="entity", ts_col="ts", start_col="start", end_col="end",
            join_type=join_type, num_buckets=4, time_chunk_us=chunk,
        ).to_pandas()
        want = _brute(facts, dims, join_type)
        assert len(got) == len(want)
        pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)

    def test_chunk_replication_bounded(self, fixture, ray_session):
        # an interval of length L enters at most L/T + 1 chunk groups; with
        # T larger than every interval, the exchange carries <= 2x dim rows
        facts, dims = fixture
        out_wide = range_join(
            ray.data.from_pandas(facts), ray.data.from_pandas(dims),
            entity_col="entity", ts_col="ts", start_col="start", end_col="end",
            num_buckets=4, time_chunk_us=4096,
        ).to_pandas()
        out_plain = range_join(
            ray.data.from_pandas(facts), ray.data.from_pandas(dims),
            entity_col="entity", ts_col="ts", start_col="start", end_col="end",
            num_buckets=4,
        ).to_pandas()
        assert len(out_wide) == len(out_plain)

    def test_left_outer_keeps_every_fact_once_or_matched(self, fixture):
        facts, dims = fixture
        got = range_join(
            ray.data.from_pandas(facts), ray.data.from_pandas(dims),
            entity_col="entity", ts_col="ts", start_col="start", end_col="end",
            join_type="left outer", num_buckets=4,
        ).to_pandas()
        # every payload (unique fact id) appears; unmatched exactly once
        per_fact = got.groupby("payload").agg(n=("tag", "size"), matched=("tag", "count"))
        assert set(per_fact.index) == set(facts.payload)
        unmatched = per_fact[per_fact.matched == 0]
        assert (unmatched.n == 1).all()
