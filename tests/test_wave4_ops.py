"""Round-5 wave-4 operators: grouped interval union (stages/sweep),
ordered prefix max (stages/rank), token chi2 and RFM composition —
brute-force references + partition invariance."""

import numpy as np
import pyarrow as pa
import pytest
import ray


def _brute_union(iv):
    """Per-key (n_islands, covered) over half-open [s, e)."""
    out = {}
    bykey = {}
    for k, s, e in iv:
        bykey.setdefault(k, []).append((s, e))
    for k, xs in bykey.items():
        xs.sort()
        n, cov, cur_s, cur_e = 0, 0, None, None
        for s, e in xs:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    cov += cur_e - cur_s
                n, cur_s, cur_e = n + 1, s, e
            else:
                cur_e = max(cur_e, e)
        cov += cur_e - cur_s
        out[k] = (n, cov)
    return out


@pytest.mark.usefixtures("ray_session")
def test_interval_union_matches_bruteforce():
    from pymhealth_ray.stages.sweep import grouped_interval_union

    rng = np.random.default_rng(5)
    k = rng.integers(0, 37, size=600).astype(np.int64)
    s = rng.integers(0, 100_000, size=600).astype(np.int64)
    e = s + rng.integers(1, 8_000, size=600).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"k": k, "s": s, "e": e}))
    want = _brute_union(list(zip(k.tolist(), s.tolist(), e.tolist())))
    for parts in (1, 5, 23):
        got = grouped_interval_union(ds.repartition(parts), "k", "s", "e",
                                     num_buckets=8).to_pandas()
        assert dict(zip(got["k"],
                        zip(got["n_islands"], got["covered"]))) == want


@pytest.mark.usefixtures("ray_session")
def test_interval_union_fallback_path_matches():
    """Force the per-segment accumulate fallback (tiny threshold can't be
    injected, so emulate: huge end values make seg*K overflow check
    trip) — equal results either way."""
    from pymhealth_ray.stages.sweep import grouped_interval_union

    rng = np.random.default_rng(9)
    k = rng.integers(0, 50, size=300).astype(np.int64)
    base = 2**61  # range * segments overflows the vector-offset trick
    s = base + rng.integers(0, 10_000, size=300).astype(np.int64)
    e = s + rng.integers(1, 500, size=300).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"k": k, "s": s, "e": e})) \
        .repartition(4)
    got = grouped_interval_union(ds, "k", "s", "e",
                                 num_buckets=4).to_pandas()
    want = _brute_union(list(zip(k.tolist(), s.tolist(), e.tolist())))
    assert dict(zip(got["k"],
                    zip(got["n_islands"], got["covered"]))) == want


@pytest.mark.usefixtures("ray_session")
def test_ordered_prefix_max_matches_numpy():
    from pymhealth_ray.stages.rank import I64_MIN, ordered_prefix_max

    rng = np.random.default_rng(3)
    n = 1000
    order = rng.permutation(n).astype(np.int64)
    val = rng.integers(-500, 500, size=n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"o": order, "v": val}))
    # reference: exclusive running max in o-order
    pos = np.argsort(order)
    want = np.empty(n, dtype=np.int64)
    want[0] = I64_MIN
    np.maximum.accumulate(val[pos][:-1], out=want[1:])
    for parts in (1, 3, 17):
        got = ordered_prefix_max(ds.repartition(parts), "v", "o", "o",
                                 num_bins=16).to_pandas()
        got = got.sort_values("o").reset_index(drop=True)
        assert np.array_equal(got["runmax"].to_numpy(), want)
        assert got["runmax"].dtype == np.int64


@pytest.mark.usefixtures("ray_session")
def test_ordered_prefix_max_empty():
    from pymhealth_ray.stages.rank import ordered_prefix_max

    ds = ray.data.from_arrow(pa.table({
        "o": pa.array([], type=pa.int64()),
        "v": pa.array([], type=pa.int64())}))
    got = ordered_prefix_max(ds, "v", "o", "o")
    # NB: Dataset.to_pandas() drops columns entirely on empty datasets,
    # so assert on the Dataset schema
    assert got.count() == 0
    assert got.schema().names == ["o", "v", "runmax"]


@pytest.mark.usefixtures("ray_session")
def test_token_chi2_bruteforce(tmp_path):
    """q_docs_token_chi2 against an independent per-doc-set chi2."""
    import pyarrow.parquet as pq

    from pymhealth_ray.pipelines.queries import q_docs_token_chi2

    rng = np.random.default_rng(11)
    vocab = [f"t{i}" for i in range(40)]
    rows = []
    for i in range(300):
        en = i % 3 != 0
        # en docs are biased toward the first half of the vocabulary
        probs = (np.linspace(2, 1, 40) if en else np.linspace(1, 2, 40))
        probs = probs / probs.sum()
        toks = rng.choice(vocab, size=rng.integers(3, 25), p=probs)
        rows.append((i, " ".join(toks.tolist()),
                     "en" if en else "de", "web", 1))
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": [r[1] for r in rows],
        "lang": [r[2] for r in rows],
        "source": [r[3] for r in rows],
        "n_chars": pa.array([r[4] for r in rows], type=pa.int64())})
    pq.write_table(tbl, tmp_path / "documents.parquet")

    got = q_docs_token_chi2(str(tmp_path)).to_pandas()

    n = len(rows)
    n1 = sum(1 for r in rows if r[2] == "en")
    stats = {}
    for _, text, lang, _, _ in rows:
        for t in set(text.split(" ")):
            if t:
                a, b = stats.get(t, (0, 0))
                stats[t] = (a + (lang == "en"), b + (lang != "en"))
    cand = []
    for t, (a, b) in stats.items():
        if not (5 <= a + b < n):
            continue
        cc, dd = n1 - a, (n - n1) - b
        num = float(a * dd - b * cc)
        chi2 = float(n) * num * num / ((a + b) * (cc + dd)) \
            / ((a + cc) * (b + dd))
        m = 10.0**6
        chi2 = np.sign(chi2) * np.floor(abs(chi2) * m + 0.5) / m
        cand.append((t, a, b, chi2))
    cand.sort(key=lambda x: (-x[3], x[0]))
    want = cand[:50]
    gotl = list(zip(got["tok"], got["a"], got["b"], got["chi2"]))
    assert gotl == want
    assert got["rn"].tolist() == list(range(1, len(want) + 1))
