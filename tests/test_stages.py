"""End-to-end conformance of the distributed stages against the in-memory
numpy oracle (FIXTURES.md F1/F3/F4/F5; SURVEY.md §5.2 items 2-4)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from pymhealth_ray.functions import information, stats, timedom
from pymhealth_ray.functions import windows as W
from pymhealth_ray.stages import (
    asof_join,
    lag_features,
    session_stats,
    sessionize,
    token_features,
    window_features,
)

GAP = 1800 * 10**9
W_NS = 3600 * 10**9
S_NS = 600 * 10**9


@pytest.fixture(scope="module")
def raw_df(sequences_table):
    df = sequences_table.to_pandas().sort_values(["doc_id", "ts_ns"]).reset_index(drop=True)
    df["tok_mean"] = df.tokens.map(lambda t: np.mean(np.asarray(t, dtype=np.float64)))
    return df


class TestTokenFeatures:
    def test_matches_per_row_oracle(self, sequences_ds, raw_df):
        feat = token_features(
            sequences_ds,
            features=("mean", "std", "min", "max", "zero_crossing_count", "line_length", "entropy"),
        )
        fdf = feat.to_pandas().sort_values(["doc_id", "ts_ns"]).reset_index(drop=True)
        assert len(fdf) == len(raw_df)
        rng = np.random.default_rng(1)
        for i in rng.choice(len(raw_df), 100, replace=False):
            x = np.asarray(raw_df.tokens[i], dtype=np.float64)
            assert np.isclose(fdf.tok_mean[i], x.mean())
            assert np.isclose(fdf.tok_std[i], x.std())
            assert np.isclose(fdf.tok_min[i], x.min())
            assert np.isclose(fdf.tok_max[i], x.max())
            assert np.isclose(fdf.tok_zero_crossing_count[i], timedom.zero_crossing_count(x - x.mean()))
            assert np.isclose(fdf.tok_line_length[i], timedom.line_length(x))
            assert np.isclose(fdf.tok_entropy[i], information.entropy_of_values(x))

    def test_token_passthrough_equality(self, sequences_ds, sequences_table):
        # per input_hint: token arrays survive the pipeline byte-identically
        feat = token_features(sequences_ds, features=("mean",))
        got = feat.to_pandas().sort_values(["doc_id", "ts_ns"]).reset_index(drop=True)
        exp = sequences_table.to_pandas().sort_values(["doc_id", "ts_ns"]).reset_index(drop=True)
        for a, b in zip(got.tokens, exp.tokens):
            assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_batch_size_invariance(self, sequences_ds):
        a = token_features(sequences_ds, features=("mean", "entropy"), batch_size=32).to_pandas()
        b = token_features(sequences_ds, features=("mean", "entropy"), batch_size=1000).to_pandas()
        a = a.sort_values(["doc_id", "ts_ns"]).reset_index(drop=True)
        b = b.sort_values(["doc_id", "ts_ns"]).reset_index(drop=True)
        assert np.allclose(a.tok_mean, b.tok_mean) and np.allclose(a.tok_entropy, b.tok_entropy)


def window_oracle(raw_df, min_len=2):
    frames = []
    for did, g in raw_df.groupby("doc_id"):
        ts, v = g.ts_ns.values, g.tok_mean.values
        if len(ts) < 2 or ts[0] == ts[-1]:
            continue
        starts = W.window_starts(ts, S_NS)
        if len(starts) == 0:
            continue
        idx = W.get_indices(ts, W_NS, S_NS)
        frames.append(
            pd.DataFrame(
                {
                    "doc_id": did,
                    "window_start_ns": starts,
                    "om": W.indices_rolling_apply(np.mean, min_len)(idx, v),
                    "os": W.indices_rolling_apply(np.std, min_len)(idx, v),
                    "omn": W.indices_rolling_apply(np.min, min_len)(idx, v),
                    "oiqr": W.indices_rolling_apply(stats.interquartile_range, min_len)(idx, v),
                }
            )
        )
    return pd.concat(frames).sort_values(["doc_id", "window_start_ns"]).reset_index(drop=True)


class TestWindowStage:
    AGGS = {
        "m": ("tok_mean", "mean"),
        "s": ("tok_mean", "std"),
        "mn": ("tok_mean", "min"),
        "q": ("tok_mean", "iqr"),
    }

    def _run(self, ds, num_buckets=8):
        feat = token_features(ds, features=("mean",))
        wf = window_features(feat, W_NS, S_NS, aggs=self.AGGS, min_window_len=2, num_buckets=num_buckets)
        return wf.to_pandas().sort_values(["doc_id", "window_start_ns"]).reset_index(drop=True)

    def test_matches_oracle(self, sequences_ds, raw_df):
        wdf = self._run(sequences_ds)
        orc = window_oracle(raw_df)
        assert len(wdf) == len(orc)
        assert (wdf.doc_id.values == orc.doc_id.values).all()
        assert (wdf.window_start_ns.values == orc.window_start_ns.values).all()
        assert np.allclose(wdf.m.values, orc.om.values, rtol=1e-9, equal_nan=True)
        assert np.allclose(wdf.s.values, orc.os.values, rtol=1e-9, atol=1e-12, equal_nan=True)
        assert np.allclose(wdf.mn.values, orc.omn.values, rtol=1e-9, equal_nan=True)
        assert np.allclose(wdf.q.values, orc.oiqr.values, rtol=1e-9, equal_nan=True)

    def test_partition_invariance(self, sequences_table, raw_df):
        """Identical results across block counts, bucket counts and shuffled
        input row order (SURVEY.md §5.2 item 4)."""
        orc = window_oracle(raw_df)
        rng = np.random.default_rng(3)
        perm = rng.permutation(sequences_table.num_rows)
        shuffled = sequences_table.take(pa.array(perm))
        for tbl, blocks, buckets in [
            (sequences_table, 1, 4),
            (sequences_table, 17, 8),
            (shuffled, 4, 17),
        ]:
            ds = ray.data.from_arrow(tbl).repartition(blocks)
            wdf = self._run(ds, num_buckets=buckets)
            assert len(wdf) == len(orc)
            assert np.allclose(wdf.m.values, orc.om.values, rtol=1e-9, equal_nan=True)


class TestSessionStage:
    def test_session_ids_match_oracle(self, sequences_ds):
        sess = sessionize(sequences_ds, GAP, num_buckets=8).to_pandas()
        sess = sess.sort_values(["doc_id", "ts_ns"]).reset_index(drop=True)
        for _, g in sess.groupby("doc_id"):
            assert (g.session_id.values == W.sessionize(g.ts_ns.values, GAP)).all()
        assert sess.session_id.max() > 0  # fixture has session breaks

    def test_session_stats(self, sequences_ds):
        sess = sessionize(sequences_ds, GAP, num_buckets=8).to_pandas()
        st = session_stats(sequences_ds, GAP, value_col="n_tok", num_buckets=8).to_pandas()
        got = st.set_index(["doc_id", "session_id"]).sort_index()
        grp = sess.groupby(["doc_id", "session_id"])
        assert (got.n_events.values == grp.size().sort_index().values).all()
        assert np.allclose(got.n_tok_mean.values, grp.n_tok.mean().sort_index().values)
        assert np.allclose(got.n_tok_std.values, grp.n_tok.std(ddof=0).sort_index().values)
        assert (got.duration_ns.values == (grp.ts_ns.max() - grp.ts_ns.min()).sort_index().values).all()


class TestLagStage:
    def test_lags_leads_diffs(self, sequences_ds):
        lf = lag_features(
            sequences_ds, ["n_tok"], lags=(1, 3), leads=(2,), diffs=["n_tok"], num_buckets=8
        ).to_pandas().sort_values(["doc_id", "ts_ns"]).reset_index(drop=True)
        for _, g in lf.groupby("doc_id"):
            v = g.n_tok.values.astype(float)
            assert np.isnan(g.n_tok_lag1.values[0])
            assert np.allclose(g.n_tok_lag1.values[1:], v[:-1])
            if len(v) > 3:
                assert np.isnan(g.n_tok_lag3.values[:3]).all()
                assert np.allclose(g.n_tok_lag3.values[3:], v[:-3])
                assert np.isnan(g.n_tok_lead2.values[-2:]).all()
                assert np.allclose(g.n_tok_lead2.values[:-2], v[2:])
            d1 = g.n_tok_diff1.values
            assert d1[0] == 0 and np.allclose(d1[1:], np.diff(v))


def _session_dim(ds):
    dim = session_stats(ds, GAP, value_col="n_tok", num_buckets=8)
    return dim.map_batches(
        lambda t: t.select(["doc_id", "start_ns", "n_tok_mean"]).rename_columns(
            ["doc_id", "ts_ns", "ref_mean"]
        ),
        batch_format="pyarrow",
    )


class TestAsOfStage:
    def test_backward_match_oracle(self, sequences_ds):
        dim = _session_dim(sequences_ds)
        dimdf = dim.to_pandas()
        j = asof_join(sequences_ds, dim, ["ref_mean"], num_buckets=8,
                      broadcast=False).to_pandas()
        j = j.sort_values(["doc_id", "ts_ns"]).reset_index(drop=True)
        assert len(j) == sequences_ds.count()
        for did, g in j.groupby("doc_id"):
            dg = dimdf[dimdf.doc_id == did].sort_values("ts_ns")
            pos = np.searchsorted(dg.ts_ns.values, g.ts_ns.values, side="right") - 1
            exp = np.where(pos >= 0, dg.ref_mean.values[np.maximum(pos, 0)], np.nan)
            assert np.allclose(g.ref_mean_asof.values, exp, equal_nan=True)
            exp_ts = np.where(pos >= 0, dg.ts_ns.values[np.maximum(pos, 0)], np.nan)
            got_ts = g.ts_ns_asof.astype(float).values
            assert np.allclose(got_ts, exp_ts, equal_nan=True)

    def test_broadcast_equals_shuffle(self, sequences_ds):
        dim = _session_dim(sequences_ds)
        a = asof_join(sequences_ds, dim, ["ref_mean"], num_buckets=8,
                      broadcast=False).to_pandas()
        b = asof_join(sequences_ds, dim, ["ref_mean"], broadcast=True).to_pandas()
        a = a.sort_values(["doc_id", "ts_ns"]).reset_index(drop=True)
        b = b.sort_values(["doc_id", "ts_ns"]).reset_index(drop=True)
        assert np.allclose(a.ref_mean_asof.values, b.ref_mean_asof.values, equal_nan=True)

    def test_auto_plan_dtype_faithful(self, ray_session):
        """auto selects broadcast for a small dim, shuffle above the
        threshold — and BOTH keep the dim value column's exact dtype
        (int stays int; the old broadcast path coerced to float64)."""
        facts = pd.DataFrame({
            "doc_id": ["a"] * 4 + ["b"] * 3,
            "ts_ns": [10, 20, 30, 40, 10, 25, 50],
        })
        dim = pd.DataFrame({
            "doc_id": ["a", "a", "b"],
            "ts_ns": [15, 35, 20],
            "val": pd.array([100, 200, 300], dtype="int64"),
        })
        outs = {}
        for bc in ("auto", False, True):
            j = asof_join(ray.data.from_pandas(facts),
                          ray.data.from_pandas(dim), ["val"],
                          num_buckets=4, broadcast=bc)
            tbl = pa.concat_tables(
                list(j.iter_batches(batch_format="pyarrow")))
            assert tbl.schema.field("val_asof").type == pa.int64()
            assert tbl.schema.field("ts_ns_asof").type == pa.int64()
            df = tbl.to_pandas().sort_values(
                ["doc_id", "ts_ns"]).reset_index(drop=True)
            outs[bc] = df
        for bc in (False, True):
            pd.testing.assert_frame_equal(outs["auto"], outs[bc])
        exp = [np.nan, 100, 100, 200, np.nan, 300, 300]
        assert np.allclose(outs["auto"]["val_asof"].astype(float).values,
                           exp, equal_nan=True)
        # threshold below the dim size must force the shuffle plan and
        # still produce the same values
        small = asof_join(ray.data.from_pandas(facts),
                          ray.data.from_pandas(dim), ["val"], num_buckets=4,
                          broadcast="auto", broadcast_threshold=1).to_pandas()
        small = small.sort_values(["doc_id", "ts_ns"]).reset_index(drop=True)
        assert np.allclose(small["val_asof"].astype(float).values, exp,
                           equal_nan=True)

    def test_zero_leakage(self, sequences_table):
        """Perturbing every dimension row that lies in an event's future must
        not change any output row (FIXTURES.md F5 leakage probe)."""
        ds = ray.data.from_arrow(sequences_table)
        dim_df = _session_dim(ds).to_pandas()
        max_event_ts = sequences_table.column("ts_ns").to_pandas().max()
        # add future dimension rows, then perturb them
        future = pd.DataFrame(
            {
                "doc_id": dim_df.doc_id.unique(),
                "ts_ns": max_event_ts + 10**9,
                "ref_mean": 1e9,
            }
        )
        dim_a = pd.concat([dim_df, future], ignore_index=True)
        dim_b = dim_a.copy()
        dim_b.loc[dim_b.ts_ns > max_event_ts, "ref_mean"] = -123456.0
        ja = asof_join(ds, ray.data.from_pandas(dim_a), ["ref_mean"], num_buckets=8).to_pandas()
        jb = asof_join(ds, ray.data.from_pandas(dim_b), ["ref_mean"], num_buckets=8).to_pandas()
        ja = ja.sort_values(["doc_id", "ts_ns"]).reset_index(drop=True)
        jb = jb.sort_values(["doc_id", "ts_ns"]).reset_index(drop=True)
        assert np.allclose(ja.ref_mean_asof.values, jb.ref_mean_asof.values, equal_nan=True)


class TestGenerator:
    def test_determinism_and_invariants(self, sequences_table):
        from pymhealth_ray.sources.generate import generate_sequences
        from pymhealth_ray.sources.schema import validate_sequences

        again = generate_sequences(3000, 40, seed=42)
        assert sequences_table.equals(again)
        validate_sequences(sequences_table)
        df = sequences_table.select(["doc_id", "ts_ns"]).to_pandas()
        assert not df.duplicated().any()


class TestSaltedWindows:
    def test_salted_equals_unsalted_on_skewed_data(self, sequences_ds):
        """Hot-entity time-chunk salting with overlap-replay must reproduce
        the unsalted window results exactly (SURVEY.md §7 hard parts)."""
        H = 3600 * 10**9
        args = dict(
            aggs={"m": ("n_tok", "mean"), "s": ("n_tok", "std"), "c": ("n_tok", "count")},
            min_window_len=1,
            emit_empty=True,
            num_buckets=8,
        )
        a = window_features(sequences_ds, H, H // 2, **args).to_pandas()
        b = window_features(
            sequences_ds, H, H // 2, salt_threshold=100, salt_span_ns=4 * H, **args
        ).to_pandas()
        a = a.sort_values(["doc_id", "window_start_ns"]).reset_index(drop=True)
        b = b.sort_values(["doc_id", "window_start_ns"]).reset_index(drop=True)
        assert len(a) == len(b)
        assert (a.doc_id.values == b.doc_id.values).all()
        assert (a.window_start_ns.values == b.window_start_ns.values).all()
        assert (a.n_in_window.values == b.n_in_window.values).all()
        for col in ("m", "s", "c"):
            assert np.allclose(a[col].values, b[col].values, equal_nan=True, rtol=1e-12)


class TestCombinedWindows:
    def test_combined_equals_sort_path(self, sequences_ds):
        from pymhealth_ray.stages.window import window_features_combined

        H = 3600 * 10**9
        aggs = {"m": ("n_tok", "mean"), "s": ("n_tok", "std"), "c": ("n_tok", "count"),
                "mn": ("n_tok", "min"), "sm": ("n_tok", "sum")}
        a = window_features(sequences_ds, H, H, aggs=aggs, emit_empty=False, num_buckets=8).to_pandas()
        b = window_features_combined(sequences_ds, H, aggs=aggs, num_buckets=8).to_pandas()
        a = a.sort_values(["doc_id", "window_start_ns"]).reset_index(drop=True)
        b = b.sort_values(["doc_id", "window_start_ns"]).reset_index(drop=True)
        assert len(a) == len(b)
        assert (a.window_start_ns.values == b.window_start_ns.values).all()
        assert (a.n_in_window.values == b.n_in_window.values).all()
        for col in aggs:
            assert np.allclose(a[col].values, b[col].values, rtol=1e-9, atol=1e-9), col

    def test_combined_rejects_generic_kernels(self, sequences_ds):
        from pymhealth_ray.stages.window import window_features_combined

        with pytest.raises(ValueError):
            window_features_combined(sequences_ds, 10**9, aggs={"q": ("n_tok", "iqr")})


class TestSaltedSessionize:
    def test_salted_equals_plain(self, sequences_ds):
        from pymhealth_ray.stages.session import sessionize_salted

        a = sessionize(sequences_ds, GAP, num_buckets=8).to_pandas()
        b = sessionize_salted(sequences_ds, GAP, num_buckets=8, salt_threshold=100).to_pandas()
        a = a.sort_values(["doc_id", "ts_ns"]).reset_index(drop=True)
        b = b.sort_values(["doc_id", "ts_ns"]).reset_index(drop=True)
        assert len(a) == len(b)
        assert (a.doc_id.values == b.doc_id.values).all()
        assert (a.session_id.values == b.session_id.values).all()


class TestSaltedAsOf:
    def test_salted_equals_plain_with_hot_dim(self, sequences_ds):
        from pymhealth_ray.stages.asof import asof_join_salted

        def mk_dim(b):
            v = b["n_tok"].to_numpy(zero_copy_only=False).astype(np.float64)
            return pa.table({"doc_id": b["doc_id"], "ts_ns": b["ts_ns"], "ref": pa.array(v * 2.0)})

        def mk_fact(b):
            ts = b["ts_ns"].to_numpy(zero_copy_only=False) + 10**12
            return pa.table({"doc_id": b["doc_id"], "ts_ns": pa.array(ts), "n_tok": b["n_tok"]})

        narrow = sequences_ds.map_batches(
            lambda b: b.select(["doc_id", "ts_ns", "n_tok"]), batch_format="pyarrow"
        )
        dim = narrow.map_batches(mk_dim, batch_format="pyarrow")
        facts = narrow.map_batches(mk_fact, batch_format="pyarrow")
        a = asof_join(facts, dim, ["ref"], num_buckets=8).to_pandas()
        b = asof_join_salted(facts, dim, ["ref"], num_buckets=8, salt_threshold=100,
                             salt_span_ns=24 * 3600 * 10**9).to_pandas()
        a = a.sort_values(["doc_id", "ts_ns"]).reset_index(drop=True)
        b = b.sort_values(["doc_id", "ts_ns"]).reset_index(drop=True)
        assert len(a) == len(b)
        assert np.allclose(a.ref_asof.values, b.ref_asof.values, equal_nan=True)
        assert np.allclose(a.ts_ns_asof.astype(float).values, b.ts_ns_asof.astype(float).values, equal_nan=True)
