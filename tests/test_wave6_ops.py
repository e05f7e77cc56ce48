"""Round-5 wave-6 operators: grouped OHLC candles, FIFO budget
allocation, word2vec frequency downsampling, Welch A/B t — brute-force
references on synthetic fixtures + partition invariance."""

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray


@pytest.mark.usefixtures("ray_session")
def test_grouped_ohlc_bruteforce_and_partition_invariance():
    from pymhealth_ray.stages.aggregate import grouped_ohlc

    rng = np.random.default_rng(11)
    n = 4000
    tbl = pa.table({
        "ent": pa.array(rng.integers(0, 37, size=n)),
        "o": pa.array(rng.integers(0, 500, size=n)),
        "tie": pa.array(rng.permutation(n).astype(np.int64)),
        "v": pa.array(rng.integers(-1000, 1000, size=n)),
    })

    def run(nb):
        ds = ray.data.from_arrow(tbl).repartition(7)
        out = grouped_ohlc(ds, "ent", "o", "tie", "v", num_buckets=nb)
        return out.to_pandas().sort_values("ent").reset_index(drop=True)

    got = run(8)
    assert got.equals(run(3))  # partition / bucket invariance

    df = tbl.to_pandas().sort_values(["ent", "o", "tie"])
    for ent, g in df.groupby("ent"):
        row = got[got["ent"] == ent].iloc[0]
        assert row["n"] == len(g)
        assert row["open"] == g["v"].iloc[0]
        assert row["close"] == g["v"].iloc[-1]
        assert row["high"] == g["v"].max()
        assert row["low"] == g["v"].min()


@pytest.mark.usefixtures("ray_session")
def test_fifo_alloc_bruteforce(tmp_path):
    from pymhealth_ray.pipelines.queries import q_orders_fifo_alloc

    rng = np.random.default_rng(5)
    n = 3000
    status = rng.choice(["F", "O", "P"], size=n, p=[0.4, 0.4, 0.2])
    tbl = pa.table({
        "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, 41, size=n)),
        "o_orderstatus": pa.array(status.tolist()),
        "o_totalprice": pa.array(
            np.round(rng.uniform(1.0, 500.0, size=n), 2)),
        "o_orderdate": pa.array(
            rng.integers(8000, 9000, size=n).astype("int32")).cast(
                pa.date32()),
        "o_orderpriority": pa.array(["x"] * n),
    })
    pq.write_table(tbl, tmp_path / "orders.parquet")

    got = q_orders_fifo_alloc(str(tmp_path)).to_pandas() \
        .sort_values("o_orderkey").reset_index(drop=True)

    df = tbl.to_pandas()
    df["price_c"] = np.rint(df["o_totalprice"].to_numpy() * 100) \
        .astype(np.int64)
    df["date_i"] = df["o_orderdate"].map(lambda d: d.toordinal())
    budg = df[df["o_orderstatus"] == "F"].groupby("o_custkey")[
        "price_c"].sum().to_dict()
    opens = df[df["o_orderstatus"] == "O"].sort_values(
        ["o_custkey", "date_i", "o_orderkey"])
    expect = {}
    for ck, g in opens.groupby("o_custkey"):
        left = int(budg.get(ck, 0))
        for _, r in g.iterrows():
            a = min(int(r["price_c"]), max(left, 0))
            expect[int(r["o_orderkey"])] = a
            left -= int(r["price_c"])
    assert len(got) == len(expect)
    for _, r in got.iterrows():
        assert expect[int(r["o_orderkey"])] == int(r["alloc_c"])


@pytest.mark.usefixtures("ray_session")
def test_downsample_tokens_predicate_and_rare_kept():
    from pymhealth_ray.stages.vocab import downsample_tokens

    rng = np.random.default_rng(3)
    n_rows = 300
    toks = [rng.choice([1, 1, 1, 1, 2, 3, 5, 7],
                       size=rng.integers(1, 30)).astype(np.int32)
            for _ in range(n_rows)]
    tbl = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(n_rows)]),
        "ts_ns": pa.array(np.arange(n_rows, dtype=np.int64)),
        "tokens": pa.array([t.tolist() for t in toks],
                           type=pa.list_(pa.int32())),
    })
    # token 1 heavy with threshold 0.4*2^32; everything else untouched
    htok = np.array([1], dtype=np.int64)
    thr = np.array([int(0.4 * 4294967296.0)], dtype=np.int64)
    ds = ray.data.from_arrow(tbl).repartition(5)
    out = downsample_tokens(ds, htok, thr).to_pandas() \
        .sort_values("ts_ns").reset_index(drop=True)

    for i in range(n_rows):
        orig = toks[i]
        kept = np.asarray(out["tokens_kept"][i])
        expect = []
        for k, v in enumerate(orig, start=1):
            if v != 1:
                expect.append(v)
                continue
            u = int(hashlib.md5(
                f"d{i}:{i}:{k}-w2v".encode()).hexdigest()[:8], 16)
            if u < thr[0]:
                expect.append(v)
        assert list(kept) == expect
    # rare tokens never dropped
    flat_in = np.concatenate(toks)
    flat_out = np.concatenate([np.asarray(x) for x in out["tokens_kept"]])
    for t in (2, 3, 5, 7):
        assert (flat_out == t).sum() == (flat_in == t).sum()


@pytest.mark.usefixtures("ray_session")
def test_downsample_partition_invariance():
    from pymhealth_ray.stages.vocab import downsample_tokens

    rng = np.random.default_rng(9)
    tbl = pa.table({
        "doc_id": pa.array([f"x{i}" for i in range(200)]),
        "ts_ns": pa.array(np.arange(200, dtype=np.int64)),
        "tokens": pa.array(
            [rng.integers(0, 10, size=rng.integers(0, 15)).tolist()
             for _ in range(200)], type=pa.list_(pa.int32())),
    })
    htok = np.array([0, 4, 9], dtype=np.int64)
    thr = np.array([int(0.2 * 2**32), int(0.5 * 2**32),
                    int(0.9 * 2**32)], dtype=np.int64)

    def run(parts):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        return downsample_tokens(ds, htok, thr).to_pandas() \
            .sort_values("ts_ns").reset_index(drop=True)

    a, b = run(2), run(11)
    assert all(list(x) == list(y)
               for x, y in zip(a["tokens_kept"], b["tokens_kept"]))


@pytest.mark.usefixtures("ray_session")
def test_welch_matches_manual(tmp_path):
    from pymhealth_ray.pipelines.queries import q_events_ab_welch

    rng = np.random.default_rng(21)
    n = 2500
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.sort(rng.integers(
            1_700_000_000_000_000, 1_700_050_000_000_000,
            size=n))).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 50, size=n)),
        "event_type": pa.array(rng.choice(
            ["a", "b", "c"], size=n).tolist()),
        "value": pa.array(np.round(rng.uniform(0.01, 200.0, size=n), 2)),
        "props": pa.array([""] * n),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")

    got = q_events_ab_welch(str(tmp_path)).to_pandas() \
        .set_index("event_type")

    df = tbl.to_pandas()
    df["c"] = np.rint(df["value"].to_numpy() * 100).astype(np.int64)
    df["arm"] = df["user_id"].to_numpy() % 2
    for et, g in df.groupby("event_type"):
        g0 = g[g["arm"] == 0]["c"].to_numpy().astype(np.float64)
        g1 = g[g["arm"] == 1]["c"].to_numpy().astype(np.float64)
        m0, m1 = g0.mean(), g1.mean()
        v0 = g0.var(ddof=1)
        v1 = g1.var(ddof=1)
        t = (m1 - m0) / np.sqrt(v0 / len(g0) + v1 / len(g1))
        row = got.loc[et]
        assert row["n0"] == len(g0) and row["n1"] == len(g1)
        assert abs(row["mean_diff"] - (m1 - m0)) < 1e-4
        assert abs(row["t_welch"] - t) < 1e-4


@pytest.mark.usefixtures("ray_session")
def test_mutual_nn_bruteforce(tmp_path):
    from pymhealth_ray.pipelines.queries import q_embed_mutual_nn

    rng = np.random.default_rng(13)
    n, d = 120, 8
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(
            [rng.normal(size=d).astype(np.float32).tolist()
             for _ in range(n)], type=pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 3, size=n).astype(np.int32)),
    })
    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    got = q_embed_mutual_nn(str(tmp_path)).to_pandas() \
        .sort_values(["a_id"]).reset_index(drop=True)

    emb = np.array([np.asarray(e, dtype=np.float64)
                    for e in tbl["embedding"].to_pylist()])
    labs = tbl["label"].to_numpy()
    expect = set()
    for lab in np.unique(labs):
        idx = np.flatnonzero(labs == lab)
        u = emb[idx] / np.linalg.norm(emb[idx], axis=1, keepdims=True)
        s = u @ u.T
        np.fill_diagonal(s, -np.inf)
        nn = np.argmax(s, axis=1)
        for i in range(len(idx)):
            j = nn[i]
            if nn[j] == i and i < j:
                expect.add((int(idx[i]), int(idx[j])))
    assert set(zip(got["a_id"], got["b_id"])) == expect


def _lcs_classic(a, b):
    dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            dp[i][j] = (dp[i - 1][j - 1] + 1 if a[i - 1] == b[j - 1]
                        else max(dp[i - 1][j], dp[i][j - 1]))
    return dp[-1][-1]


@pytest.mark.usefixtures("ray_session")
def test_lcs_kernel_vs_classic_dp():
    from pymhealth_ray.pipelines.queries import _lcs_pairs_of_bucket

    rng = np.random.default_rng(17)
    n_docs = 60
    toks = [rng.integers(0, 6, size=rng.integers(0, 60)).tolist()
            for _ in range(n_docs)]
    tbl = pa.table({
        "doc_id": pa.array([f"d{i:03d}" for i in range(n_docs)]),
        "ts_ns": pa.array(np.arange(n_docs, dtype=np.int64)),
        "tokens": pa.array(toks, type=pa.list_(pa.int32())),
        "source": pa.array((["s1"] * 30) + (["s2"] * 30)),
    })
    out = _lcs_pairs_of_bucket(tbl).to_pandas() \
        .sort_values(["source", "a_doc"]).reset_index(drop=True)
    assert len(out) == 58  # 29 adjacent pairs per source
    for _, r in out.iterrows():
        ia = int(r["a_doc"][1:])
        ib = int(r["b_doc"][1:])
        a = toks[ia][:48]
        b = toks[ib][:48]
        assert r["lcs_len"] == _lcs_classic(a, b)
        assert r["n_a"] == len(a) and r["n_b"] == len(b)


@pytest.mark.usefixtures("ray_session")
def test_holt_matches_sequential(tmp_path):
    from pymhealth_ray.pipelines.queries import (HOLT_ALPHA, HOLT_BETA,
                                                 q_events_holt)

    rng = np.random.default_rng(29)
    n = 1500
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.sort(rng.integers(
            1_700_000_000_000_000, 1_700_050_000_000_000,
            size=n))).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 31, size=n)),
        "event_type": pa.array(["e"] * n),
        "value": pa.array(np.round(rng.uniform(0.01, 99.99, size=n), 2)),
        "props": pa.array([""] * n),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = q_events_holt(str(tmp_path)).to_pandas() \
        .set_index("user_id").sort_index()

    df = tbl.to_pandas()
    df["ts_us"] = df["ts"].astype("int64")
    df["c"] = np.rint(df["value"].to_numpy() * 100).astype(np.int64)
    for uid, g in df.sort_values(["user_id", "ts_us", "event_id"]) \
                    .groupby("user_id"):
        xs = g["c"].to_numpy().astype(np.float64)
        if xs.size < 2:
            assert uid not in got.index
            continue
        lvl, trd = float(xs[0]), float(xs[1] - xs[0])
        for t in range(1, xs.size):
            nl = HOLT_ALPHA * xs[t] + (1 - HOLT_ALPHA) * (lvl + trd)
            trd = HOLT_BETA * (nl - lvl) + (1 - HOLT_BETA) * trd
            lvl = nl
        row = got.loc[uid]
        assert row["n"] == xs.size
        assert abs(row["level_c"] - lvl) < 1e-6
        assert abs(row["trend_c"] - trd) < 1e-6


@pytest.mark.usefixtures("ray_session")
def test_cohort_ltv_bruteforce(tmp_path):
    from pymhealth_ray.pipelines.queries import q_orders_cohort_ltv

    rng = np.random.default_rng(31)
    n = 2500
    tbl = pa.table({
        "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, 60, size=n)),
        "o_orderstatus": pa.array(["O"] * n),
        "o_totalprice": pa.array(
            np.round(rng.uniform(1.0, 400.0, size=n), 2)),
        "o_orderdate": pa.array(
            rng.integers(9000, 10500, size=n).astype("int32")).cast(
                pa.date32()),
        "o_orderpriority": pa.array(["x"] * n),
    })
    pq.write_table(tbl, tmp_path / "orders.parquet")
    got = q_orders_cohort_ltv(str(tmp_path)).to_pandas() \
        .sort_values(["cohort_m", "age_m"]).reset_index(drop=True)

    df = tbl.to_pandas()
    df["price_c"] = np.rint(df["o_totalprice"].to_numpy() * 100) \
        .astype(np.int64)
    df["m"] = df["o_orderdate"].map(lambda d: d.year * 12 + d.month)
    first = df.groupby("o_custkey")["m"].min()
    df["cohort_m"] = df["o_custkey"].map(first)
    df["age_m"] = df["m"] - df["cohort_m"]
    exp = df.groupby(["cohort_m", "age_m"]).agg(
        n_orders=("price_c", "size"), revenue_c=("price_c", "sum"),
        n_customers=("o_custkey", "nunique")).reset_index()
    exp = exp.sort_values(["cohort_m", "age_m"]).reset_index(drop=True)
    assert len(got) == len(exp)
    for c in ["cohort_m", "age_m", "n_orders", "revenue_c",
              "n_customers"]:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


@pytest.mark.usefixtures("ray_session")
def test_audience_overlap_bruteforce(tmp_path):
    from pymhealth_ray.pipelines.queries import q_events_audience_overlap

    rng = np.random.default_rng(37)
    n = 3000
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.sort(rng.integers(
            1_700_000_000_000_000, 1_700_050_000_000_000,
            size=n))).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 80, size=n)),
        "event_type": pa.array(rng.choice(
            ["a", "b", "c", "d"], size=n, p=[0.5, 0.3, 0.15, 0.05])
            .tolist()),
        "value": pa.array(np.ones(n)),
        "props": pa.array([""] * n),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = q_events_audience_overlap(str(tmp_path)).to_pandas()

    df = tbl.to_pandas()[["user_id", "event_type"]].drop_duplicates()
    sets = {t: set(g["user_id"]) for t, g in df.groupby("event_type")}
    ts = sorted(sets)
    seen = 0
    for i in range(len(ts)):
        for j in range(i + 1, len(ts)):
            inter = len(sets[ts[i]] & sets[ts[j]])
            if inter == 0:
                continue
            seen += 1
            row = got[(got["type_a"] == ts[i])
                      & (got["type_b"] == ts[j])].iloc[0]
            union = len(sets[ts[i]] | sets[ts[j]])
            assert row["n_a"] == len(sets[ts[i]])
            assert row["n_b"] == len(sets[ts[j]])
            assert row["n_inter"] == inter
            assert row["n_union"] == union
    assert seen == len(got)


@pytest.mark.usefixtures("ray_session")
def test_streaming_candles_carry(tmp_path):
    from pymhealth_ray.stages.streaming import _candles_one_file

    rng = np.random.default_rng(41)
    n = 1200
    ent = np.sort(rng.integers(0, 9, size=n))
    ts = np.sort(rng.integers(0, 40 * 86_400_000_000, size=n))
    # sort rows by (ent, ts) to mimic the layout contract
    order = np.lexsort((ts, ent))
    tbl = pa.table({"user_id": pa.array(ent[order]),
                    "ts_us": pa.array(ts[order]),
                    "val_c": pa.array(rng.integers(-500, 500, size=n))})
    p = tmp_path / "f.parquet"
    pq.write_table(tbl, p)

    big = _candles_one_file(str(p), "user_id", "ts_us", "val_c",
                            86_400_000_000, batch_rows=10**6).to_pandas()
    tiny = _candles_one_file(str(p), "user_id", "ts_us", "val_c",
                             86_400_000_000, batch_rows=7).to_pandas()
    assert big.sort_values(["user_id", "day"]).reset_index(drop=True) \
        .equals(tiny.sort_values(["user_id", "day"])
                .reset_index(drop=True))

    df = tbl.to_pandas()
    df["day"] = df["ts_us"] // 86_400_000_000
    exp = df.groupby(["user_id", "day"])["val_c"].agg(
        ["size", "first", "max", "min", "last"]).reset_index()
    got = big.sort_values(["user_id", "day"]).reset_index(drop=True)
    exp = exp.sort_values(["user_id", "day"]).reset_index(drop=True)
    assert (got["n"].to_numpy() == exp["size"].to_numpy()).all()
    assert (got["open"].to_numpy() == exp["first"].to_numpy()).all()
    assert (got["high"].to_numpy() == exp["max"].to_numpy()).all()
    assert (got["low"].to_numpy() == exp["min"].to_numpy()).all()
    assert (got["close"].to_numpy() == exp["last"].to_numpy()).all()


@pytest.mark.usefixtures("ray_session")
def test_mahalanobis_matches_numpy(tmp_path):
    from pymhealth_ray.pipelines.queries import q_events_mahalanobis

    rng = np.random.default_rng(43)
    n = 2000
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.sort(rng.integers(
            1_700_000_000_000_000, 1_700_864_000_000_000,
            size=n))).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 40, size=n)),
        "event_type": pa.array(rng.choice(["p", "q"], size=n).tolist()),
        "value": pa.array(np.round(rng.uniform(0.01, 150.0, size=n), 2)),
        "props": pa.array([""] * n),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = q_events_mahalanobis(str(tmp_path)).to_pandas() \
        .set_index("event_id").sort_index()
    assert len(got) == n

    df = tbl.to_pandas()
    df["x"] = np.rint(df["value"].to_numpy() * 100).astype(np.int64)
    df["y"] = (df["ts"].astype("int64") // 3_600_000_000) % 24
    for et, g in df.groupby("event_type"):
        X = g[["x", "y"]].to_numpy().astype(np.float64)
        mu = X.mean(axis=0)
        cov = np.cov(X.T, ddof=1)
        inv = np.linalg.inv(cov)
        d = X - mu
        m2 = np.einsum("ij,jk,ik->i", d, inv, d)
        gm = got.loc[g["event_id"].to_numpy()]["m2"].to_numpy()
        assert np.abs(gm - m2).max() < 1e-4


@pytest.mark.usefixtures("ray_session")
def test_dup_invoices_bruteforce(tmp_path):
    from pymhealth_ray.pipelines.queries import q_orders_dup_invoices

    rng = np.random.default_rng(47)
    n = 2000
    # quantized prices force natural collisions too
    prices = rng.integers(1, 40, size=n) * 25.0
    tbl = pa.table({
        "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, 25, size=n)),
        "o_orderstatus": pa.array(["O"] * n),
        "o_totalprice": pa.array(prices),
        "o_orderdate": pa.array(
            rng.integers(9000, 9200, size=n).astype("int32")).cast(
                pa.date32()),
        "o_orderpriority": pa.array(["x"] * n),
    })
    pq.write_table(tbl, tmp_path / "orders.parquet")
    got = q_orders_dup_invoices(str(tmp_path)).to_pandas() \
        .sort_values(["a_key", "b_key"]).reset_index(drop=True)

    df = tbl.to_pandas()
    df["price_c"] = np.rint(df["o_totalprice"].to_numpy() * 100) \
        .astype(np.int64)
    df["days"] = df["o_orderdate"].map(lambda d: d.toordinal())
    aug = df[["o_orderkey", "o_custkey", "price_c", "days"]].copy()
    seeded = aug[aug["o_orderkey"] % 37 == 0].copy()
    seeded["o_orderkey"] += 10_000_000
    seeded["days"] += 3
    import pandas as pd
    aug = pd.concat([aug, seeded]).sort_values(
        ["o_custkey", "price_c", "days", "o_orderkey"])
    expect = []
    for (_, _), g in aug.groupby(["o_custkey", "price_c"]):
        k = g["o_orderkey"].to_numpy()
        d = g["days"].to_numpy()
        for i in range(len(g) - 1):
            if d[i + 1] - d[i] <= 7:
                expect.append((int(k[i]), int(k[i + 1])))
    assert sorted(expect) == list(zip(got["a_key"], got["b_key"]))


@pytest.mark.usefixtures("ray_session")
def test_benford_digits(tmp_path):
    from pymhealth_ray.pipelines.queries import q_lineitem_benford

    rng = np.random.default_rng(53)
    n = 5000
    price = np.round(np.exp(rng.uniform(0, 10, size=n)) + 0.01, 2)
    tbl = pa.table({"l_extendedprice": pa.array(price)})
    pq.write_table(tbl, tmp_path / "lineitem.parquet")
    got = q_lineitem_benford(str(tmp_path)).to_pandas() \
        .set_index("digit")

    cents = np.rint(price * 100).astype(np.int64)
    first = np.array([int(str(c)[0]) for c in cents])
    for d in range(1, 10):
        cnt = int((first == d).sum())
        if cnt == 0:
            assert d not in got.index
            continue
        assert got.loc[d]["n"] == cnt
        assert abs(got.loc[d]["share"] - cnt / n) < 1e-5
        assert abs(got.loc[d]["expected_p"]
                   - np.log10(1 + 1 / d)) < 1e-5


@pytest.mark.usefixtures("ray_session")
def test_token_burstiness_bruteforce(tmp_path, monkeypatch):
    import pymhealth_ray.pipelines.queries as Q

    rng = np.random.default_rng(59)
    n_rows = 400
    # token 7 bursty (many repeats in few docs), token 3 uniform
    toks = []
    for i in range(n_rows):
        t = rng.integers(0, 20, size=rng.integers(1, 25)).tolist()
        if i % 40 == 0:
            t += [7] * 15
        if i % 2 == 0:
            t.append(3)
        toks.append(t)
    tbl = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(n_rows)]),
        "ts_ns": pa.array(np.arange(n_rows, dtype=np.int64)),
        "tokens": pa.array(toks, type=pa.list_(pa.int32())),
        "n_tok": pa.array([len(t) for t in toks], type=pa.int32()),
        "source": pa.array(["s"] * n_rows),
    })
    d = tmp_path / "fix"
    d.mkdir()
    pq.write_table(tbl, d / "part-0.parquet")
    monkeypatch.setattr(Q, "ensure_fixture", lambda sf: str(d))

    got = Q.q_seq_token_burstiness("ignored").to_pandas() \
        .set_index("tok")

    from collections import Counter
    per_doc = [Counter(t) for t in toks]
    for tok in got.index:
        c = np.array([pd.get(tok, 0) for pd in per_doc],
                     dtype=np.float64)
        assert got.loc[tok]["total_c"] == int(c.sum())
        assert got.loc[tok]["n_docs"] == int((c > 0).sum())
        vmr = c.var() / c.mean()
        assert abs(got.loc[tok]["vmr"] - vmr) < 1e-4
    # bursty token has higher vmr than the uniform one
    if 7 in got.index and 3 in got.index:
        assert got.loc[7]["vmr"] > got.loc[3]["vmr"]


@pytest.mark.usefixtures("ray_session")
def test_good_turing_bruteforce(tmp_path, monkeypatch):
    import pymhealth_ray.pipelines.queries as Q

    rng = np.random.default_rng(61)
    n_rows = 300
    toks = [(rng.zipf(1.7, size=rng.integers(1, 30)) % 500).tolist()
            for _ in range(n_rows)]
    tbl = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(n_rows)]),
        "ts_ns": pa.array(np.arange(n_rows, dtype=np.int64)),
        "tokens": pa.array(toks, type=pa.list_(pa.int32())),
        "n_tok": pa.array([len(t) for t in toks], type=pa.int32()),
        "source": pa.array(["s"] * n_rows),
    })
    d = tmp_path / "fix"
    d.mkdir()
    pq.write_table(tbl, d / "part-0.parquet")
    monkeypatch.setattr(Q, "ensure_fixture", lambda sf: str(d))

    got = Q.q_seq_good_turing("ignored").to_pandas().set_index("r")

    from collections import Counter
    tc = Counter()
    for t in toks:
        tc.update(t)
    nr = Counter(tc.values())
    assert set(got.index) == set(nr)
    for r in nr:
        assert got.loc[r]["n_r"] == nr[r]
        exp = (r + 1) * nr.get(r + 1, 0) / nr[r]
        assert abs(got.loc[r]["r_star"] - exp) < 1e-5


@pytest.mark.usefixtures("ray_session")
def test_gini_bruteforce(tmp_path):
    from pymhealth_ray.pipelines.queries import q_part_revenue_gini

    rng = np.random.default_rng(67)
    n_parts, n_li = 120, 4000
    part = pa.table({
        "p_partkey": pa.array(np.arange(n_parts, dtype=np.int64)),
        "p_brand": pa.array([f"B{i % 5}" for i in range(n_parts)]),
    })
    li = pa.table({
        "l_partkey": pa.array(rng.integers(0, n_parts, size=n_li)),
        "l_extendedprice": pa.array(
            np.round(rng.lognormal(4, 1, size=n_li), 2)),
    })
    pq.write_table(part, tmp_path / "part.parquet")
    pq.write_table(li, tmp_path / "lineitem.parquet")
    got = q_part_revenue_gini(str(tmp_path)).to_pandas() \
        .set_index("p_brand")

    df = li.to_pandas()
    df["rev_c"] = np.rint(df["l_extendedprice"].to_numpy() * 100) \
        .astype(np.int64)
    rev = df.groupby("l_partkey")["rev_c"].sum().reset_index()
    rev["brand"] = rev["l_partkey"].map(
        dict(zip(part["p_partkey"].to_pylist(),
                 part["p_brand"].to_pylist())))
    for b, g in rev.groupby("brand"):
        x = np.sort(g["rev_c"].to_numpy())
        n = len(x)
        i = np.arange(1, n + 1)
        gini = (2 * (i * x).sum() - (n + 1) * x.sum()) / (n * x.sum())
        row = got.loc[b]
        assert row["n_parts"] == n
        assert row["revenue_c"] == x.sum()
        assert abs(row["gini"] - gini) < 1e-6


@pytest.mark.usefixtures("ray_session")
def test_kleinberg_bursts_vs_sequential(tmp_path):
    from pymhealth_ray.pipelines.queries import (_bursts_expected,
                                                 q_events_bursts_kleinberg)

    rng = np.random.default_rng(71)
    # users with a planted burst: dense cluster in the middle
    rows = []
    eid = 0
    for uid in range(17):
        base = 1_700_000_000_000_000
        t = base
        for i in range(40):
            t += int(rng.integers(30_000_000, 120_000_000))
            rows.append((eid, t, uid))
            eid += 1
        for i in range(12):  # burst: 10x faster
            t += int(rng.integers(2_000_000, 8_000_000))
            rows.append((eid, t, uid))
            eid += 1
        for i in range(30):
            t += int(rng.integers(30_000_000, 120_000_000))
            rows.append((eid, t, uid))
            eid += 1
    arr = np.array(rows, dtype=np.int64)
    tbl = pa.table({
        "event_id": pa.array(arr[:, 0]),
        "ts": pa.array(arr[:, 1]).cast(pa.timestamp("us")),
        "user_id": pa.array(arr[:, 2]),
        "event_type": pa.array(["e"] * len(arr)),
        "value": pa.array(np.ones(len(arr))),
        "props": pa.array([""] * len(arr)),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = q_events_bursts_kleinberg(str(tmp_path)).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    exp = _bursts_expected(
        tbl.select(["event_id", "ts", "user_id"]).to_pandas()) \
        .sort_values("user_id").reset_index(drop=True)
    assert got.equals(exp)
    # every user detects at least one burst run covering the plant
    assert (got["n_burst_gaps"] >= 8).all()
    assert (got["n_burst_runs"] >= 1).all()


@pytest.mark.usefixtures("ray_session")
def test_hhi_bruteforce(tmp_path):
    from pymhealth_ray.pipelines.queries import q_lineitem_supplier_hhi

    rng = np.random.default_rng(73)
    n = 3000
    tbl = pa.table({
        "l_partkey": pa.array(rng.integers(0, 90, size=n)),
        "l_suppkey": pa.array(rng.integers(0, 12, size=n)),
        "l_quantity": pa.array(rng.integers(1, 50, size=n)
                               .astype(np.float64)),
    })
    pq.write_table(tbl, tmp_path / "lineitem.parquet")
    got = q_lineitem_supplier_hhi(str(tmp_path)).to_pandas() \
        .set_index("l_partkey")

    df = tbl.to_pandas()
    df["q"] = df["l_quantity"].astype(np.int64)
    for pk, g in df.groupby("l_partkey"):
        qs = g.groupby("l_suppkey")["q"].sum().to_numpy()
        row = got.loc[pk]
        assert row["n_suppliers"] == len(qs)
        assert row["total_qty"] == qs.sum()
        hhi = (qs.astype(float) ** 2).sum() / float(qs.sum()) ** 2
        assert abs(row["hhi"] - hhi) < 1e-6


def _mk_seq_fixture(tmp_path, monkeypatch, toks):
    import pymhealth_ray.pipelines.queries as Q
    n_rows = len(toks)
    tbl = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(n_rows)]),
        "ts_ns": pa.array(np.arange(n_rows, dtype=np.int64)),
        "tokens": pa.array(toks, type=pa.list_(pa.int32())),
        "n_tok": pa.array([len(t) for t in toks], type=pa.int32()),
        "source": pa.array(["s"] * n_rows),
    })
    d = tmp_path / "fix"
    d.mkdir()
    pq.write_table(tbl, d / "part-0.parquet")
    monkeypatch.setattr(Q, "ensure_fixture", lambda sf: str(d))
    return Q


@pytest.mark.usefixtures("ray_session")
def test_span_corruption_bruteforce(tmp_path, monkeypatch):
    rng = np.random.default_rng(79)
    toks = [rng.integers(0, 50, size=rng.integers(0, 40)).tolist()
            for _ in range(250)]
    Q = _mk_seq_fixture(tmp_path, monkeypatch, toks)
    from pymhealth_ray.stages.sample import _threshold_hex
    thr = _threshold_hex(Q.T5_MASK_P)

    got = Q.q_seq_span_corruption("ignored").to_pandas() \
        .sort_values("ts_ns").reset_index(drop=True)
    for i, t in enumerate(toks):
        msk = [hashlib.md5(f"d{i}:{i}:{k}-t5".encode())
               .hexdigest()[:8] < thr for k in range(1, len(t) + 1)]
        inp, tgt, sidx = [], [], 0
        for k, (v, m) in enumerate(zip(t, msk)):
            st = m and (k == 0 or not msk[k - 1])
            if st:
                sidx += 1
                inp.append(-sidx)
                tgt.append(-sidx)
            if m:
                tgt.append(v)
            else:
                inp.append(v)
        row = got.iloc[i]
        assert row["n_masked"] == sum(msk)
        assert row["n_spans"] == sidx
        exp_in = hashlib.md5(",".join(map(str, inp)).encode()).hexdigest()
        exp_t = hashlib.md5(",".join(map(str, tgt)).encode()).hexdigest()
        assert row["input_md5"] == exp_in
        assert row["target_md5"] == exp_t


@pytest.mark.usefixtures("ray_session")
def test_fim_layout_bruteforce(tmp_path, monkeypatch):
    rng = np.random.default_rng(83)
    toks = [rng.integers(0, 50, size=rng.integers(0, 30)).tolist()
            for _ in range(250)]
    Q = _mk_seq_fixture(tmp_path, monkeypatch, toks)

    got = Q.q_seq_fim_layout("ignored").to_pandas() \
        .sort_values("ts_ns").reset_index(drop=True)
    for i, t in enumerate(toks):
        n = len(t)
        u1 = int(hashlib.md5(f"d{i}:{i}-fim1".encode())
                 .hexdigest()[:8], 16)
        u2 = int(hashlib.md5(f"d{i}:{i}-fim2".encode())
                 .hexdigest()[:8], 16)
        c1 = (u1 * (n + 1)) >> 32
        c2 = c1 + ((u2 * (n - c1 + 1)) >> 32)
        assert 0 <= c1 <= c2 <= n
        lay = [-1] + t[:c1] + [-2] + t[c2:] + [-3] + t[c1:c2]
        exp = hashlib.md5(",".join(map(str, lay)).encode()).hexdigest()
        row = got.iloc[i]
        assert row["c1"] == c1 and row["c2"] == c2
        assert row["fim_md5"] == exp


@pytest.mark.usefixtures("ray_session")
def test_changepoint_planted_shift(tmp_path):
    from pymhealth_ray.pipelines.queries import (_changepoint_expected,
                                                 q_events_changepoint)

    rng = np.random.default_rng(89)
    rows = []
    eid = 0
    for uid in range(13):
        shift_at = int(rng.integers(20, 40))
        t = 1_700_000_000_000_000
        for i in range(60):
            t += int(rng.integers(1_000_000, 5_000_000))
            base = 20.0 if i < shift_at else 80.0
            rows.append((eid, t, uid,
                         round(base + rng.uniform(-5, 5), 2), shift_at))
            eid += 1
    arr = rows
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in arr], type=pa.int64()),
        "ts": pa.array([r[1] for r in arr],
                       type=pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in arr], type=pa.int64()),
        "event_type": pa.array(["e"] * len(arr)),
        "value": pa.array([r[3] for r in arr]),
        "props": pa.array([""] * len(arr)),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = q_events_changepoint(str(tmp_path)).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    exp = _changepoint_expected(
        tbl.select(["event_id", "ts", "user_id", "value"]).to_pandas()) \
        .sort_values("user_id").reset_index(drop=True)
    assert got.equals(exp)
    # the detected split lands on the planted shift
    shifts = {r[2]: r[4] for r in arr}
    for _, row in got.iterrows():
        assert abs(row["k_star"] - shifts[row["user_id"]]) <= 1
        assert row["mean_after_c"] > row["mean_before_c"] + 4000


@pytest.mark.usefixtures("ray_session")
def test_diff_in_diff_bruteforce(tmp_path):
    from pymhealth_ray.pipelines.queries import q_events_diff_in_diff

    rng = np.random.default_rng(97)
    n = 3000
    ts = np.sort(rng.integers(1_700_000_000_000_000,
                              1_700_100_000_000_000, size=n))
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 60, size=n)),
        "event_type": pa.array(rng.choice(["a", "b"], size=n).tolist()),
        "value": pa.array(np.round(rng.uniform(1, 99, size=n), 2)),
        "props": pa.array([""] * n),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = q_events_diff_in_diff(str(tmp_path)).to_pandas() \
        .set_index("event_type")

    df = tbl.to_pandas()
    df["c"] = np.rint(df["value"].to_numpy() * 100).astype(np.int64)
    df["tsu"] = df["ts"].astype("int64")
    mid = (df["tsu"].min() + df["tsu"].max()) // 2
    df["cell"] = (df["user_id"] % 2) * 2 + (df["tsu"] >= mid)
    for et, g in df.groupby("event_type"):
        m = {k: gg["c"].mean() for k, gg in g.groupby("cell")}
        did = (m[3] - m[2]) - (m[1] - m[0])
        row = got.loc[et]
        assert abs(row["did"] - did) < 1e-4
        for k in range(4):
            assert row[f"n{k // 2}{k % 2}"] == (g["cell"] == k).sum()


@pytest.mark.usefixtures("ray_session")
def test_price_relatives_bruteforce(tmp_path):
    from pymhealth_ray.pipelines.queries import (q_part_price_index,
                                                 q_part_price_relatives)

    rng = np.random.default_rng(101)
    n = 4000
    tbl = pa.table({
        "l_partkey": pa.array(rng.integers(0, 80, size=n)),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(10, 900, size=n), 2)),
        "l_quantity": pa.array(rng.integers(1, 50, size=n)
                               .astype(np.float64)),
        "l_shipdate": pa.array(
            rng.integers(9000, 10000, size=n).astype("int32")).cast(
                pa.date32()),
    })
    pq.write_table(tbl, tmp_path / "lineitem.parquet")
    got = q_part_price_relatives(str(tmp_path)).to_pandas() \
        .set_index("l_partkey").sort_index()

    df = tbl.to_pandas()
    df["v"] = np.rint(df["l_extendedprice"].to_numpy() * 100) \
        .astype(np.int64)
    df["q"] = df["l_quantity"].astype(np.int64)
    df["d"] = df["l_shipdate"].map(lambda d: d.toordinal())
    mid = (df["d"].min() + df["d"].max()) // 2
    df["half"] = (df["d"] >= mid).astype(int)
    agg = df.groupby(["l_partkey", "half"])[["v", "q"]].sum().unstack(
        fill_value=0)
    count_match = 0
    for pk in agg.index:
        v0, v1 = agg.loc[pk][("v", 0)], agg.loc[pk][("v", 1)]
        q0, q1 = agg.loc[pk][("q", 0)], agg.loc[pk][("q", 1)]
        if q0 > 0 and q1 > 0 and v0 > 0:
            rel = (int(v1) * int(q0) * 1_000_000) // (int(q1) * int(v0))
            row = got.loc[pk]
            assert (row["v0"], row["q0"], row["v1"], row["q1"]) \
                == (v0, q0, v1, q1)
            assert row["rel_micro"] == rel
            count_match += 1
    assert count_match == len(got)

    # index = q0-weighted lower median of relatives
    idx = q_part_price_index(str(tmp_path)).to_pandas().iloc[0]
    rel_sorted = got.sort_values("rel_micro")
    cw = rel_sorted["q0"].cumsum()
    tot = rel_sorted["q0"].sum()
    pick = rel_sorted[2 * cw >= tot].iloc[0]["rel_micro"]
    assert idx["index_micro"] == pick
    assert idx["total_q0"] == tot


@pytest.mark.usefixtures("ray_session")
def test_pq_roundtrip_properties():
    from pymhealth_ray.stages.ann import pq_decode, train_pq_codebooks

    rng = np.random.default_rng(103)
    mat = rng.normal(size=(600, 32))
    books = train_pq_codebooks(mat, m=4, k=8, iters=6, seed=3)
    assert books.shape == (4, 8, 8)
    dec = pq_decode(mat, books)
    assert dec.shape == mat.shape
    # decoding is idempotent: decoded vectors snap to themselves
    assert np.allclose(pq_decode(dec, books), dec)
    # reconstruction reduces error vs a random codebook
    rand_books = rng.normal(size=books.shape)
    err = ((dec - mat) ** 2).sum()
    err_rand = ((pq_decode(mat, rand_books) - mat) ** 2).sum()
    assert err < err_rand


@pytest.mark.usefixtures("ray_session")
def test_order_violations_bruteforce(tmp_path):
    from pymhealth_ray.pipelines.queries import q_events_order_violations

    rng = np.random.default_rng(107)
    n = 2500
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.sort(rng.integers(
            1_700_000_000_000_000, 1_700_050_000_000_000,
            size=n))).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 45, size=n)),
        "event_type": pa.array(rng.choice(
            ["view", "purchase", "click"], size=n,
            p=[0.3, 0.3, 0.4]).tolist()),
        "value": pa.array(np.ones(n)),
        "props": pa.array([""] * n),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = q_events_order_violations(str(tmp_path)).to_pandas() \
        .set_index("user_id")

    df = tbl.to_pandas()
    df["tsu"] = df["ts"].astype("int64")
    for uid, g in df.sort_values(["user_id", "tsu", "event_id"]) \
                    .groupby("user_id"):
        types = g["event_type"].tolist()
        first_v = next((i for i, t in enumerate(types) if t == "view"),
                       len(types))
        n_p = types.count("purchase")
        n_v = sum(1 for i, t in enumerate(types)
                  if t == "purchase" and i < first_v)
        row = got.loc[uid]
        assert row["n_purchases"] == n_p
        assert row["n_violations"] == n_v


@pytest.mark.usefixtures("ray_session")
def test_compress_ratio_properties(tmp_path):
    import zlib

    from pymhealth_ray.pipelines.queries import q_docs_compress_ratio

    texts = ["spam " * 200, "the quick brown fox jumps over it " * 6,
             "", "abcdefghij" * 3]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = q_docs_compress_ratio(str(tmp_path)).to_pandas() \
        .set_index("doc_id").sort_index()
    for i, t in enumerate(texts):
        raw = len(t.encode())
        comp = len(zlib.compress(t.encode(), 6))
        assert got.loc[i]["n_bytes"] == raw
        assert got.loc[i]["comp_bytes"] == comp
        assert got.loc[i]["ratio_milli"] == \
            ((comp * 1000) // raw if raw else 0)
    # repetitive text compresses harder than prose
    assert got.loc[0]["ratio_milli"] < got.loc[1]["ratio_milli"]


def test_skyline_nd_bruteforce():
    from pymhealth_ray.stages.skyline import skyline_mask_nd

    rng = np.random.default_rng(109)
    n = 800
    mins = rng.integers(0, 40, size=(n, 1)).astype(np.int64)
    maxs = rng.integers(0, 40, size=(n, 2)).astype(np.int64)
    mask = skyline_mask_nd(mins, maxs, chunk=64)

    def dominated(i):
        for j in range(n):
            if j == i:
                continue
            le = (mins[j, 0] <= mins[i, 0] and maxs[j, 0] >= maxs[i, 0]
                  and maxs[j, 1] >= maxs[i, 1])
            lt = (mins[j, 0] < mins[i, 0] or maxs[j, 0] > maxs[i, 0]
                  or maxs[j, 1] > maxs[i, 1])
            if le and lt:
                return True
        return False

    expect = np.array([not dominated(i) for i in range(n)])
    assert (mask == expect).all()
    # chunk-size invariance
    assert (mask == skyline_mask_nd(mins, maxs, chunk=7)).all()


@pytest.mark.usefixtures("ray_session")
def test_dup_rate_estimate_consistency(tmp_path, monkeypatch):
    rng = np.random.default_rng(113)
    toks = [rng.integers(0, 30, size=rng.integers(1, 10)).tolist()
            for _ in range(500)]
    Q = _mk_seq_fixture(tmp_path, monkeypatch, toks)
    got = Q.q_seq_dup_rate_estimate("ignored").to_pandas().iloc[0]
    # seeded duplication forces a positive dup rate
    assert got["full_docs"] > got["full_distinct"]
    assert 0 < got["full_rate"] < 0.5
    assert got["sample_docs"] < got["full_docs"]
    # estimator is in the ballpark of truth on 500 docs
    assert got["rate_err"] == round(
        abs(got["full_rate"] - got["sample_rate"]), 6) or \
        abs(got["rate_err"]
            - abs(got["full_rate"] - got["sample_rate"])) < 2e-6


@pytest.mark.usefixtures("ray_session")
def test_shard_balance_bruteforce(tmp_path, monkeypatch):
    rng = np.random.default_rng(127)
    toks = [rng.integers(0, 30, size=rng.integers(1, 20)).tolist()
            for _ in range(400)]
    Q = _mk_seq_fixture(tmp_path, monkeypatch, toks)
    got = Q.q_seq_shard_balance("ignored").to_pandas() \
        .set_index("shard")

    from collections import defaultdict
    nd = defaultdict(int)
    nt = defaultdict(int)
    for i, t in enumerate(toks):
        s = int(hashlib.md5(f"d{i}-shard".encode())
                .hexdigest()[:8], 16) % Q.N_SHARDS
        nd[s] += 1
        nt[s] += len(t)
    tot = sum(nt.values())
    assert set(got.index) == set(nd)
    for s in nd:
        assert got.loc[s]["n_docs"] == nd[s]
        assert got.loc[s]["n_tokens"] == nt[s]
        assert got.loc[s]["share_milli"] == (nt[s] * 1000) // tot


@pytest.mark.usefixtures("ray_session")
def test_anomaly_panel_gap_rule(tmp_path):
    from pymhealth_ray.pipelines.queries import q_events_anomaly_panel

    # one user with regular 10s gaps and a single 100s outage:
    # outage gap * n_gaps > 3 * span  ->  exactly one gap flag
    ts = [1_700_000_000_000_000]
    for i in range(50):
        ts.append(ts[-1] + (100_000_000 if i == 25 else 10_000_000))
    n = len(ts)
    rng = np.random.default_rng(131)
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.array(ts, dtype=np.int64)).cast(
            pa.timestamp("us")),
        "user_id": pa.array(np.zeros(n, dtype=np.int64)),
        "event_type": pa.array(["e"] * n),
        "value": pa.array(np.round(rng.uniform(10, 20, size=n), 2)),
        "props": pa.array([""] * n),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = q_events_anomaly_panel(str(tmp_path)).to_pandas().iloc[0]
    assert got["n_events"] == n
    span = ts[-1] - ts[0]
    assert 100_000_000 * (n - 1) > 3 * span  # the outage gap flags
    assert 10_000_000 * (n - 1) <= 3 * span  # regular gaps don't
    assert got["n_gap"] == 1


@pytest.mark.usefixtures("ray_session")
def test_winnow_fingerprints_bruteforce(tmp_path, monkeypatch):
    rng = np.random.default_rng(137)
    toks = [rng.integers(0, 40, size=rng.integers(0, 30)).tolist()
            for _ in range(300)]
    Q = _mk_seq_fixture(tmp_path, monkeypatch, toks)
    got = Q.q_seq_winnow_fingerprints("ignored").to_pandas() \
        .sort_values("ts_ns").reset_index(drop=True)

    K, W, B = Q.WINNOW_K, Q.WINNOW_W, Q.WINNOW_BASE
    for i, t in enumerate(toks):
        row = got.iloc[i]
        if len(t) < K:
            assert row["n_kgrams"] == 0
            assert row["n_fingerprints"] == 0
            assert row["fp_md5"] == hashlib.md5(b"").hexdigest()
            continue
        packs = [sum(t[j + d] * (B ** d) for d in range(K))
                 for j in range(len(t) - K + 1)]
        if len(packs) >= W:
            wins = [min(packs[j:j + W])
                    for j in range(len(packs) - W + 1)]
        else:
            wins = [min(packs)]
        fps = sorted(set(wins))
        assert row["n_kgrams"] == len(packs)
        assert row["n_fingerprints"] == len(fps)
        exp = hashlib.md5(",".join(map(str, fps)).encode()).hexdigest()
        assert row["fp_md5"] == exp


@pytest.mark.usefixtures("ray_session")
def test_hard_negatives_bruteforce(tmp_path):
    from pymhealth_ray.pipelines.queries import (_HARDNEG_K, _HARDNEG_NQ,
                                                 q_embed_hard_negatives)

    rng = np.random.default_rng(139)
    n, d = 150, 8
    emb = rng.normal(size=(n, d))
    labs = rng.integers(0, 3, size=n)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([e.astype(np.float32).tolist()
                               for e in emb],
                              type=pa.list_(pa.float32())),
        "label": pa.array(labs.astype(np.int32)),
    })
    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    got = q_embed_hard_negatives(str(tmp_path)).to_pandas()

    m = emb.astype(np.float64)
    # float32 storage: recompute from the stored values
    m = np.array([np.asarray(e, dtype=np.float64)
                  for e in tbl["embedding"].to_pylist()])
    u = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    for q in range(_HARDNEG_NQ):
        sims = u @ u[q]
        mask = labs != labs[q]
        cand = np.flatnonzero(mask)
        order = np.lexsort((cand, -sims[cand]))[:_HARDNEG_K]
        exp = cand[order].tolist()
        rows = got[got["query_id"] == q].sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True])
        assert rows["neighbor_id"].tolist() == exp


@pytest.mark.usefixtures("ray_session")
def test_source_similarity_bruteforce(tmp_path, monkeypatch):
    import pymhealth_ray.pipelines.queries as Q

    rng = np.random.default_rng(149)
    n_rows = 400
    srcs = ["alpha", "beta", "gamma"]
    toks, ss = [], []
    for i in range(n_rows):
        s = srcs[i % 3]
        lo = {"alpha": 0, "beta": 20, "gamma": 40}[s]
        toks.append(rng.integers(lo, lo + 40,
                                 size=rng.integers(1, 20)).tolist())
        ss.append(s)
    tbl = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(n_rows)]),
        "ts_ns": pa.array(np.arange(n_rows, dtype=np.int64)),
        "tokens": pa.array(toks, type=pa.list_(pa.int32())),
        "n_tok": pa.array([len(t) for t in toks], type=pa.int32()),
        "source": pa.array(ss),
    })
    d = tmp_path / "fix"
    d.mkdir()
    pq.write_table(tbl, d / "part-0.parquet")
    monkeypatch.setattr(Q, "ensure_fixture", lambda sf: str(d))

    got = Q.q_seq_source_similarity("ignored").to_pandas()

    from collections import Counter
    per_src = {s: Counter() for s in srcs}
    for t, s in zip(toks, ss):
        per_src[s].update(t)
    tops = {}
    for s in srcs:
        items = sorted(per_src[s].items(), key=lambda kv: (-kv[1], kv[0]))
        tops[s] = set(k for k, _ in items[:Q.SRC_SIM_TOPK])
    for _, r in got.iterrows():
        a, b = tops[r["source_a"]], tops[r["source_b"]]
        assert r["n_common"] == len(a & b)
        assert r["n_union"] == len(a | b)
    # adjacent alphabets overlap; disjoint ones don't
    g = got.set_index(["source_a", "source_b"])
    assert g.loc[("alpha", "gamma")]["n_common"] == 0
    assert g.loc[("alpha", "beta")]["n_common"] > 0


@pytest.mark.usefixtures("ray_session")
def test_transition_dwell_bruteforce(tmp_path):
    from pymhealth_ray.pipelines.queries import q_events_transition_dwell

    rng = np.random.default_rng(151)
    n = 2000
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.sort(rng.integers(
            1_700_000_000_000_000, 1_700_050_000_000_000,
            size=n))).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 35, size=n)),
        "event_type": pa.array(rng.choice(["a", "b", "c"],
                                          size=n).tolist()),
        "value": pa.array(np.ones(n)),
        "props": pa.array([""] * n),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = q_events_transition_dwell(str(tmp_path)).to_pandas() \
        .set_index(["t_from", "t_to"])

    df = tbl.to_pandas()
    df["tsu"] = df["ts"].astype("int64")
    from collections import defaultdict
    sums = defaultdict(int)
    cnts = defaultdict(int)
    for _, g in df.sort_values(["user_id", "tsu", "event_id"]) \
                  .groupby("user_id"):
        ts = g["tsu"].to_numpy()
        et = g["event_type"].tolist()
        for i in range(len(g) - 1):
            sums[(et[i], et[i + 1])] += int(ts[i + 1] - ts[i])
            cnts[(et[i], et[i + 1])] += 1
    assert set(got.index) == set(cnts)
    for k in cnts:
        assert got.loc[k]["n"] == cnts[k]
        assert abs(got.loc[k]["mean_gap_us"]
                   - sums[k] / cnts[k]) < 1e-3
