"""Round-5 wave-10 operators: MTTR matching, funnel latency quantiles,
linear multi-touch attribution, Mahalanobis OOD — brute-force references
+ partition invariance."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray


def _events_tbl(uid, ts_us, etype, val=None):
    n = len(uid)
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.asarray(ts_us, dtype=np.int64)).cast(
            pa.timestamp("us")),
        "user_id": pa.array(np.asarray(uid, dtype=np.int64)),
        "event_type": pa.array(list(etype)),
        "value": pa.array(np.ones(n) if val is None else val),
        "props": pa.array([""] * n)})


@pytest.mark.usefixtures("ray_session")
def test_mttr_bruteforce(tmp_path):
    from pymhealth_ray.pipelines.queries import q_events_mttr

    rng = np.random.default_rng(31)
    n = 3000
    uid = rng.integers(0, 50, size=n)
    ts = rng.integers(0, 10**12, size=n)
    types = rng.choice(["error", "view", "click"], size=n,
                       p=[0.3, 0.4, 0.3])
    pq.write_table(_events_tbl(uid, ts, types), tmp_path / "events.parquet")

    got = q_events_mttr(str(tmp_path)).to_pandas() \
        .set_index("user_id").sort_index()
    for u in np.unique(uid):
        m = uid == u
        order = np.lexsort((np.arange(n)[m], ts[m]))
        tt, tp = ts[m][order], types[m][order]
        n_err = n_res = s = 0
        for i in range(len(tt)):
            if tp[i] != "error":
                continue
            n_err += 1
            nxt = [j for j in range(i + 1, len(tt)) if tp[j] != "error"]
            if nxt:
                n_res += 1
                s += int(tt[nxt[0]] - tt[i])
        if n_err == 0:
            assert u not in got.index
            continue
        row = got.loc[u]
        assert int(row["n_errors"]) == n_err
        assert int(row["n_resolved"]) == n_res
        assert int(row["sum_res_us"]) == s
        if n_res:
            assert row["mean_res_us"] == s / n_res
        else:
            assert np.isnan(row["mean_res_us"])


@pytest.mark.usefixtures("ray_session")
def test_funnel_latency_bruteforce(tmp_path):
    from pymhealth_ray.pipelines.queries import q_events_funnel_latency

    rng = np.random.default_rng(37)
    n = 4000
    uid = rng.integers(0, 120, size=n)
    ts = rng.integers(0, 10**13, size=n)
    types = rng.choice(["signup", "purchase", "view"], size=n,
                       p=[0.1, 0.2, 0.7])
    pq.write_table(_events_tbl(uid, ts, types), tmp_path / "events.parquet")

    got = q_events_funnel_latency(str(tmp_path)).to_pandas()
    lats = []
    for u in np.unique(uid):
        m = uid == u
        order = np.lexsort((np.arange(n)[m], ts[m]))
        tt, tp = ts[m][order], types[m][order]
        s_at = next((i for i in range(len(tt)) if tp[i] == "signup"), None)
        if s_at is None:
            continue
        p_at = next((j for j in range(s_at + 1, len(tt))
                     if tp[j] == "purchase"), None)
        if p_at is None:
            continue
        lats.append(int(tt[p_at] - tt[s_at]) // 1_000_000)
    lats = sorted(lats)
    assert len(got) == 1
    assert int(got["n"].iloc[0]) == len(lats)
    for q, col in [(0.25, "q25"), (0.5, "q50"), (0.75, "q75"),
                   (0.9, "q90")]:
        exp = lats[int(np.ceil(q * len(lats))) - 1]
        assert int(got[col].iloc[0]) == exp


@pytest.mark.usefixtures("ray_session")
def test_linear_attribution_bruteforce(tmp_path):
    from pymhealth_ray.pipelines.queries import q_events_linear_attribution

    rng = np.random.default_rng(41)
    n = 3000
    uid = rng.integers(0, 40, size=n)
    ts = rng.integers(0, 10**12, size=n)
    types = rng.choice(["view", "click", "purchase", "error"], size=n,
                       p=[0.4, 0.2, 0.2, 0.2])
    pq.write_table(_events_tbl(uid, ts, types), tmp_path / "events.parquet")

    got = q_events_linear_attribution(str(tmp_path)).to_pandas()
    from collections import Counter
    cnt = Counter()
    for u in np.unique(uid):
        m = uid == u
        order = np.lexsort((np.arange(n)[m], ts[m]))
        tp = types[m][order]
        journeys, cur = [], []
        for t in tp:
            if t == "purchase":
                journeys.append(cur)
                cur = []
            elif t in ("view", "click"):
                cur.append(t)
        for j in journeys:
            k = len(j)
            for t in j:
                cnt[(t, k)] += 1
    exp = {key: v for key, v in cnt.items()}
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        key = (r["event_type"], int(r["k"]))
        assert exp[key] == int(r["n_touches"])
        assert abs(r["credit"] - exp[key] / key[1]) < 1e-6


@pytest.mark.usefixtures("ray_session")
def test_embed_ood_partition_invariance_and_outlier():
    from pymhealth_ray.stages.aggregate import grouped_topk
    from pymhealth_ray.stages.pca import (gaussian_md2_params,
                                          label_scatter_partials,
                                          md2_rows, merge_label_scatter,
                                          _quantize)

    rng = np.random.default_rng(43)
    n, d = 400, 16
    emb = rng.normal(size=(n, d)) * 0.1
    emb[7] += 3.0  # injected outlier in label 7%3
    lab = (np.arange(n) % 3).astype(np.int32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([list(map(float, e)) for e in emb],
                              type=pa.list_(pa.float32())),
        "label": pa.array(lab)})

    def stats_of(parts_ds):
        return merge_label_scatter(parts_ds.take_all())

    s1 = stats_of(label_scatter_partials(
        ray.data.from_arrow(tbl).repartition(7)))
    s2 = stats_of(label_scatter_partials(
        ray.data.from_arrow(tbl).repartition(2)))
    assert s1 == s2  # exact ints, any partitioning

    # the injected outlier has the max distance within its label
    f32 = np.array([np.asarray(list(map(np.float32, e)), dtype=np.float64)
                    for e in emb])
    q = _quantize(f32, 18)
    lv = int(lab[7])
    nl, sl, ssl = s1[lv]
    mu, inv = gaussian_md2_params(nl, sl, ssl)
    m = lab == lv
    md2 = md2_rows(q[m], mu, inv)
    assert np.argmax(md2) == np.flatnonzero(m).tolist().index(7)
