"""Round-5 wave-8 operators: grouped ROC-AUC, KMV distinct sketch,
Theil-Sen robust slope, association rules — brute-force references on
synthetic fixtures + partition invariance."""

import hashlib
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
import ray


@pytest.mark.usefixtures("ray_session")
def test_grouped_auc_bruteforce_and_partition_invariance():
    from pymhealth_ray.stages.mleval import grouped_auc

    rng = np.random.default_rng(5)
    n = 3000
    g = rng.integers(0, 25, size=n)
    lab = rng.integers(0, 2, size=n)
    # coarse scores force rank ties
    sc = np.round(rng.normal(size=n) + 0.7 * lab, 1)
    tbl = pa.table({"g": pa.array(g), "lab": pa.array(lab),
                    "s": pa.array(sc)})

    def run(nb, parts):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        return grouped_auc(ds, "g", "lab", "s", num_buckets=nb) \
            .to_pandas().sort_values("g").reset_index(drop=True)

    got = run(8, 7)
    assert got.equals(run(3, 2))

    for grp in np.unique(g):
        m = g == grp
        pos, neg = sc[m][lab[m] == 1], sc[m][lab[m] == 0]
        if not len(pos) or not len(neg):
            assert grp not in set(got["g"])
            continue
        # brute-force Mann-Whitney: wins + half-ties over all pairs
        wins = (pos[:, None] > neg[None, :]).sum()
        ties = (pos[:, None] == neg[None, :]).sum()
        expect = (wins + 0.5 * ties) / (len(pos) * len(neg))
        row = got[got["g"] == grp].iloc[0]
        assert row["npos"] == len(pos) and row["nneg"] == len(neg)
        assert abs(row["auc"] - expect) < 1e-12


@pytest.mark.usefixtures("ray_session")
def test_kmv_distinct_exact_small_estimate_invariant():
    from pymhealth_ray.stages.sketch import kmv_distinct

    rng = np.random.default_rng(9)
    # group 0: 30 distinct (< k → exact); group 1: 5000 distinct
    g = np.concatenate((np.zeros(400, dtype=np.int64),
                        np.ones(8000, dtype=np.int64)))
    v = np.concatenate((rng.integers(0, 30, size=400),
                        rng.integers(0, 100_000, size=8000)))
    tbl = pa.table({"g": pa.array(g), "v": pa.array(v)})
    nd1 = len(np.unique(v[400:]))

    def run(nb, parts):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        return kmv_distinct(ds, "g", "v", k=64, num_buckets=nb) \
            .to_pandas().sort_values("g").reset_index(drop=True)

    got = run(8, 9)
    # merge is a bottom-k set union → bit-identical any partitioning
    assert got.equals(run(2, 3))

    r0 = got[got["g"] == 0].iloc[0]
    assert r0["n_kept"] == len(np.unique(v[:400]))
    assert r0["est_distinct"] == float(r0["n_kept"])
    r1 = got[got["g"] == 1].iloc[0]
    assert r1["n_kept"] == 64
    assert abs(r1["est_distinct"] - nd1) / nd1 < 0.5  # ~1/sqrt(63) error

    # engine hash == SQL hash contract
    h = int(hashlib.md5(b"42").hexdigest()[:16], 16)
    from pymhealth_ray.stages.sketch import _md5_u64
    assert _md5_u64(pa.array(["42"]))[0] == np.uint64(h)


@pytest.mark.usefixtures("ray_session")
def test_theil_sen_bruteforce():
    from pymhealth_ray.stages.robust import theil_sen_by_entity

    rng = np.random.default_rng(3)
    rows = []
    for ent in range(40):
        m = int(rng.integers(2, 30))
        ts = np.sort(rng.choice(10_000, size=m, replace=False)) * 1000
        if m > 3:  # inject duplicate timestamps
            ts[1] = ts[0]
        v = 0.001 * ts / 1000 + rng.normal(size=m)
        rows += [(ent, int(t), float(x)) for t, x in zip(ts, v)]
    tbl = pa.table({"ent": pa.array([r[0] for r in rows]),
                    "ts": pa.array([r[1] for r in rows]),
                    "v": pa.array([r[2] for r in rows])})

    def run(nb, parts):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        return theil_sen_by_entity(ds, "ent", "ts", "v", num_buckets=nb) \
            .to_pandas().sort_values("ent").reset_index(drop=True)

    got = run(8, 5)
    assert got.equals(run(3, 2))

    df = tbl.to_pandas()
    for ent, grp in df.groupby("ent"):
        t = grp["ts"].to_numpy()
        v = grp["v"].to_numpy()
        slopes = []
        for i in range(len(t)):
            for j in range(len(t)):
                if t[j] > t[i]:
                    slopes.append((v[j] - v[i]) * 1e6
                                  / float(t[j] - t[i]))
        slopes.sort()
        m = len(slopes)
        exp = (slopes[(m - 1) // 2] * 0.5 + slopes[m // 2] * 0.5)
        row = got[got["ent"] == ent].iloc[0]
        assert row["n_pairs"] == m
        assert row["ts_slope"] == exp


@pytest.mark.usefixtures("ray_session")
def test_association_rules_bruteforce_and_guard():
    from pymhealth_ray.stages.assoc import association_rules

    rng = np.random.default_rng(17)
    g = rng.integers(0, 300, size=3000)
    i = rng.integers(0, 40, size=3000)
    tbl = pa.table({"g": pa.array(g), "i": pa.array(i)})

    got = association_rules(ray.data.from_arrow(tbl).repartition(6),
                            "g", "i", min_support=4, num_buckets=8) \
        .to_pandas().sort_values(["antecedent", "consequent"]) \
        .reset_index(drop=True)

    baskets = {}
    for gg, ii in zip(g, i):
        baskets.setdefault(gg, set()).add(ii)
    pair_c: Counter = Counter()
    item_c: Counter = Counter()
    for items in baskets.values():
        s = sorted(items)
        for x in s:
            item_c[x] += 1
        for xi in range(len(s)):
            for yi in range(xi + 1, len(s)):
                pair_c[(s[xi], s[yi])] += 1
    ng = len(baskets)
    expect = []
    for (a, b), c in pair_c.items():
        if c >= 4:
            expect.append((a, b, c))
            expect.append((b, a, c))
    assert len(got) == len(expect)
    for a, b, c in expect:
        row = got[(got["antecedent"] == a) & (got["consequent"] == b)]
        assert len(row) == 1
        row = row.iloc[0]
        assert row["support"] == c
        assert row["c_ant"] == item_c[a] and row["c_cons"] == item_c[b]
        assert row["confidence"] == c / item_c[a]
        assert row["lift"] == (ng * c) / (item_c[a] * item_c[b])

    big = pa.table({"g": pa.array([1, 1]),
                    "i": pa.array([0, 1 << 31])})
    with pytest.raises(Exception, match="item codes"):
        association_rules(ray.data.from_arrow(big), "g", "i",
                          min_support=1).take_all()


@pytest.mark.usefixtures("ray_session")
def test_mmr_select_diversity_and_lambda1():
    from pymhealth_ray.stages.ann import mmr_select

    rng = np.random.default_rng(21)
    base = rng.normal(size=(50, 8)).astype(np.float32)
    q = base[0] + 0.01 * rng.normal(size=8).astype(np.float32)
    # vectors 10 and 11 are near-duplicates, both highly relevant
    base[10] = q + 0.001 * rng.normal(size=8).astype(np.float32)
    base[11] = base[10] + 0.001 * rng.normal(size=8).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(50, dtype=np.int64)),
        "embedding": pa.array([r.tolist() for r in base],
                              type=pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(tbl).repartition(4)

    # strong diversity weight: the near-dup of rank-1 must be deferred
    out = mmr_select(ds, q.astype(np.float64), k=5, lam=0.3, pool=20)
    picks = out["vec_id"].to_pylist()
    assert len(picks) == 5 and len(set(picks)) == 5
    assert not ({10, 11} <= set(picks[:2]))

    # λ=1 → pure relevance top-k
    out1 = mmr_select(ds, q.astype(np.float64), k=5, lam=1.0, pool=20)
    P = base.astype(np.float64)
    P = P / np.linalg.norm(P, axis=1, keepdims=True)
    qd = q.astype(np.float64) / np.linalg.norm(q.astype(np.float64))
    rel = P @ qd
    expect = np.lexsort((np.arange(50), -rel))[:5]
    assert out1["vec_id"].to_pylist() == sorted(expect.tolist(),
                                                key=lambda i: -rel[i])


@pytest.mark.usefixtures("ray_session")
def test_isotonic_calibration_properties():
    from pymhealth_ray.stages.mleval import isotonic_calibration

    rng = np.random.default_rng(33)
    n = 5000
    sc = rng.integers(0, 200, size=n)
    # noisy but increasing true probability
    lab = (rng.random(n) < 0.2 + 0.003 * sc).astype(np.int64)
    tbl = pa.table({"s": pa.array(sc.astype(np.int64)),
                    "lab": pa.array(lab)})

    def run(parts):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        return isotonic_calibration(ds, "s", "lab") \
            .to_pandas().sort_values("s").reset_index(drop=True)

    got = run(7)
    assert got.equals(run(2))  # partition invariance (exact ints)

    f = got["fitted"].to_numpy()
    assert (np.diff(f) >= 0).all()  # isotonic
    # pool means preserve total positives: sum(fitted*n) == sum(npos)
    assert abs((f * got["n"].to_numpy()).sum()
               - got["npos"].sum()) < 1e-3 * len(got)
    # fit never leaves [0, 1]
    assert f.min() >= 0.0 and f.max() <= 1.0


@pytest.mark.usefixtures("ray_session")
def test_patch_extractor_layout():
    from pymhealth_ray.stages.multimodal import PatchExtractor

    w, h, P = 20, 17, 8  # crops to 2x2 patch grid
    pix = np.arange(h * w, dtype=np.uint8).reshape(h, w)
    payload = f"P5\n{w} {h}\n255\n".encode() + pix.tobytes()
    tbl = pa.table({"doc_id": pa.array([5], type=pa.int64()),
                    "payload": pa.array([payload], type=pa.binary())})
    out = PatchExtractor(patch=P)(tbl).to_pandas()
    assert len(out) == 4
    assert set(zip(out["patch_row"], out["patch_col"])) == \
        {(0, 0), (0, 1), (1, 0), (1, 1)}
    img = pix.astype(np.float64) / 255.0
    expect = img[:16, :16].reshape(2, 8, 2, 8).mean(axis=(1, 3))
    for _, r in out.iterrows():
        assert abs(r["patch_mean"]
                   - expect[int(r["patch_row"]), int(r["patch_col"])]) \
            < 1e-12


@pytest.mark.usefixtures("ray_session")
def test_kendall_by_entity_bruteforce():
    from pymhealth_ray.stages.robust import kendall_by_entity

    rng = np.random.default_rng(7)
    rows = []
    for ent in range(25):
        m = int(rng.integers(2, 25))
        ts = np.sort(rng.choice(5000, size=m, replace=False)) * 1000
        if m > 4:
            ts[2] = ts[1]  # duplicate timestamps
        v = rng.integers(0, 8, size=m).astype(np.float64)  # value ties
        rows += [(ent, int(t), float(x)) for t, x in zip(ts, v)]
    tbl = pa.table({"ent": pa.array([r[0] for r in rows]),
                    "ts": pa.array([r[1] for r in rows]),
                    "v": pa.array([r[2] for r in rows])})

    def run(nb, parts):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        return kendall_by_entity(ds, "ent", "ts", "v", num_buckets=nb) \
            .to_pandas().sort_values("ent").reset_index(drop=True)

    got = run(8, 5)
    assert got.equals(run(3, 2))

    df = tbl.to_pandas()
    for ent, grp in df.groupby("ent"):
        t = grp["ts"].to_numpy()
        v = grp["v"].to_numpy()
        np_, c_, d_ = 0, 0, 0
        for i in range(len(t)):
            for j in range(len(t)):
                if t[j] > t[i]:
                    np_ += 1
                    c_ += v[j] > v[i]
                    d_ += v[j] < v[i]
        row = got[got["ent"] == ent].iloc[0]
        assert row["n_pairs"] == np_
        assert row["concordant"] == c_ and row["discordant"] == d_
        assert row["tau"] == (c_ - d_) / np_


@pytest.mark.usefixtures("ray_session")
def test_ipc_sink_source_roundtrip(tmp_path):
    import glob

    from pymhealth_ray.sources.io import read_ipc, write_ipc

    rng = np.random.default_rng(41)
    tbl = pa.table({
        "k": pa.array(np.arange(500, dtype=np.int64)),
        "v": pa.array(rng.integers(0, 100, size=500)),
        "s": pa.array([f"row-{i}" for i in range(500)],
                      type=pa.string())})
    out = str(tmp_path / "ipc")
    res = write_ipc(ray.data.from_arrow(tbl).repartition(5), out,
                    num_files=4)
    assert sum(r["rows"] for r in res) == 500
    files = sorted(glob.glob(out + "/part-*.arrow"))
    assert files and len(files) <= 4

    back = read_ipc(files, columns=["k", "v", "s"]).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert back.equals(tbl.to_pandas())

    # column pruning drops unrequested columns at decode time
    two = read_ipc(files, columns=["k", "v"]).schema().names
    assert two == ["k", "v"]
