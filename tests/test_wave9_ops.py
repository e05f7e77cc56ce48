"""Round-5 wave-9 operators: prominence local peaks, interarrival
cadence moments, Wilson score interval, readability signal —
brute-force references on synthetic fixtures + partition invariance."""

import numpy as np
import pyarrow as pa
import pytest
import ray


def test_wilson_bounds_bruteforce():
    from pymhealth_ray.stages.mleval import wilson_bounds

    rng = np.random.default_rng(9)
    n = rng.integers(1, 500, size=200).astype(np.int64)
    k = (rng.random(200) * (n + 1)).astype(np.int64)
    k = np.minimum(k, n)
    lo, hi = wilson_bounds(k, n)
    assert np.all(lo >= 0.0) and np.all(hi <= 1.0)
    assert np.all(lo <= hi)
    p = k / n
    assert np.all(lo <= p + 1e-12) and np.all(hi >= p - 1e-12)
    # closed-form sanity at k=0 / k=n: interval still inside [0,1] and
    # degenerate cases match the direct scalar formula
    z = 1.96
    for kk, nn in [(0, 10), (10, 10), (3, 7)]:
        l2, h2 = wilson_bounds(np.array([kk], dtype=np.int64),
                               np.array([nn], dtype=np.int64))
        c = z * z
        pp, nd = kk / nn, float(nn)
        half = z * np.sqrt((pp * (1.0 - pp) + c / (4.0 * nd)) / nd)
        den = 1.0 + c / nd
        assert l2[0] == (pp + c / (2.0 * nd) - half) / den
        assert h2[0] == (pp + c / (2.0 * nd) + half) / den
    with pytest.raises(ValueError):
        wilson_bounds(np.array([0], dtype=np.int64),
                      np.array([0], dtype=np.int64))


def _peaks_brute(uid, ts, c, prom):
    out = {}
    for u in np.unique(uid):
        m = uid == u
        order = np.argsort(ts[m], kind="stable")
        cv = c[m][order]
        pk = [cv[i] for i in range(1, len(cv) - 1)
              if cv[i] - cv[i - 1] >= prom and cv[i] - cv[i + 1] >= prom]
        if pk:
            out[int(u)] = (len(pk), max(pk))
    return out


@pytest.mark.usefixtures("ray_session")
def test_local_peaks_bruteforce_and_partition_invariance(tmp_path):
    import pyarrow.parquet as pq
    from pymhealth_ray.pipelines.queries import q_events_local_peaks

    rng = np.random.default_rng(17)
    n = 4000
    uid = rng.integers(0, 60, size=n).astype(np.int64)
    ts = rng.integers(0, 10**9, size=n).astype(np.int64) * 1000
    # distinct ts per row avoids tie-order ambiguity in the brute force
    ts = ts + np.arange(n)
    val = np.round(rng.random(n) * 40, 2)
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "user_id": pa.array(uid),
        "event_type": pa.array(["view"] * n),
        "value": pa.array(val),
        "props": pa.array([""] * n)})
    pq.write_table(tbl, tmp_path / "events.parquet")

    got = q_events_local_peaks(str(tmp_path)).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    c = np.rint(val * 100).astype(np.int64)
    exp = _peaks_brute(uid, ts, c, 500)
    assert set(got["user_id"]) == set(exp)
    for _, r in got.iterrows():
        npk, mx = exp[int(r["user_id"])]
        assert int(r["n_peaks"]) == npk
        assert int(r["max_peak_cents"]) == mx


@pytest.mark.usefixtures("ray_session")
def test_interarrival_bruteforce(tmp_path):
    import pyarrow.parquet as pq
    from pymhealth_ray.pipelines.queries import q_orders_interarrival

    rng = np.random.default_rng(23)
    n = 1500
    ck = rng.integers(0, 80, size=n).astype(np.int64)
    days = rng.integers(8000, 12000, size=n).astype(np.int64)
    tbl = pa.table({
        "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
        "o_custkey": pa.array(ck),
        "o_orderstatus": pa.array(["O"] * n),
        "o_totalprice": pa.array(np.ones(n)),
        # date32 path (sf fixtures are timestamp[us]; both must work)
        "o_orderdate": pa.array(days.astype(np.int32)).cast(pa.date32()),
        "o_orderpriority": pa.array(["1-URGENT"] * n)})
    pq.write_table(tbl, tmp_path / "orders.parquet")

    got = q_orders_interarrival(str(tmp_path)).to_pandas() \
        .sort_values("o_custkey").reset_index(drop=True)
    for u in np.unique(ck):
        d = np.sort(days[ck == u])
        if len(d) < 2:
            assert u not in set(got["o_custkey"])
            continue
        gaps = np.diff(d)
        row = got[got["o_custkey"] == u].iloc[0]
        assert int(row["n_orders"]) == len(d)
        assert int(row["n_gaps"]) == len(gaps)
        assert int(row["sum_gap_days"]) == int(gaps.sum())
        assert row["mean_gap"] == gaps.sum() / len(gaps)
        m2 = len(gaps) * int((gaps.astype(object) ** 2).sum()) \
            - int(gaps.sum()) ** 2
        assert abs(row["std_gap"] - np.sqrt(float(m2)) / len(gaps)) < 1e-6


@pytest.mark.usefixtures("ray_session")
def test_readability_formula_and_zero_word_filter(tmp_path):
    import pyarrow.parquet as pq
    from pymhealth_ray.pipelines.queries import q_docs_readability

    texts = [
        "The quick brown fox jumps over the lazy dog. It runs! Fast?",
        "aaa bbb ccc",          # zero sentences -> greatest(1, s)
        "   ",                  # whitespace only: zero words -> filtered
        "one two three four five. six seven eight nine ten.",
    ]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["t"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64())})
    pq.write_table(tbl, tmp_path / "documents.parquet")

    got = q_docs_readability(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == [0, 1, 3]  # doc 2 has no words
    import re
    for _, r in got.iterrows():
        t = texts[int(r["doc_id"])]
        w = len(re.findall(r"\S+", t))
        s = len(re.findall(r"[.!?]+", t))
        v = len(re.findall(r"[aeiouAEIOU]+", t))
        assert int(r["n_words"]) == w
        assert int(r["n_sentences"]) == s
        assert int(r["n_vowel_groups"]) == v
        exp = 206.835 - 1.015 * (w / max(1, s)) - 84.6 * (v / w)
        assert abs(r["flesch"] - exp) < 1e-5
