"""Round-5 wave-11 operators: Haar wavelet energy (dyadic-exact) and
ROUGE-1 temporal drift — brute-force references + partition invariance."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
import ray


def _haar_brute(x):
    es = []
    cur = list(x)
    for _ in range(3):
        m = len(cur) // 2
        es.append(sum((cur[2 * i] - cur[2 * i + 1]) ** 2 for i in range(m)))
        cur = [cur[2 * i] + cur[2 * i + 1] for i in range(m)]
    return es


@pytest.mark.usefixtures("ray_session")
def test_haar_energy_bruteforce(tmp_path, monkeypatch):
    from pymhealth_ray.pipelines import queries as Q

    rng = np.random.default_rng(47)
    rows = []
    for i in range(200):
        n = int(rng.integers(0, 17))
        rows.append(rng.integers(0, 1000, size=n).astype(np.int32))
    tbl = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(len(rows))]),
        "ts_ns": pa.array(np.arange(len(rows), dtype=np.int64)),
        "tokens": pa.array([list(map(int, r)) for r in rows],
                           type=pa.list_(pa.int32())),
        "n_tok": pa.array([len(r) for r in rows], type=pa.int32()),
        "source": pa.array(["s"] * len(rows))})
    import pyarrow.parquet as pq
    pq.write_table(tbl, tmp_path / "part-0.parquet")
    monkeypatch.setattr(Q, "_seq_ds", lambda sf, columns=None: (
        ray.data.read_parquet(str(tmp_path), columns=columns),
        str(tmp_path)))

    got = Q.q_seq_haar_energy("ignored").to_pandas() \
        .sort_values("ts_ns").reset_index(drop=True)
    assert len(got) == len(rows)
    for i, r in enumerate(rows):
        e1, e2, e3 = _haar_brute(list(map(int, r)))
        g = got.iloc[i]
        assert (int(g["e1"]), int(g["e2"]), int(g["e3"])) == (e1, e2, e3)


@pytest.mark.usefixtures("ray_session")
def test_rouge_pairs_bruteforce_and_partition_invariance(
        tmp_path, monkeypatch):
    from pymhealth_ray.pipelines import queries as Q

    rng = np.random.default_rng(53)
    rows = []
    for d in range(30):
        for t in range(int(rng.integers(1, 6))):
            n = int(rng.integers(0, 12))
            rows.append((f"doc{d}", t * 1000,
                         rng.integers(0, 8, size=n).tolist()))
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows]),
        "ts_ns": pa.array([r[1] for r in rows], type=pa.int64()),
        "tokens": pa.array([r[2] for r in rows], type=pa.list_(pa.int32())),
        "n_tok": pa.array([len(r[2]) for r in rows], type=pa.int32()),
        "source": pa.array(["s"] * len(rows))})
    import pyarrow.parquet as pq
    pq.write_table(tbl, tmp_path / "part-0.parquet")
    monkeypatch.setattr(Q, "_seq_ds", lambda sf, columns=None: (
        ray.data.read_parquet(str(tmp_path), columns=columns)
        .repartition(5),
        str(tmp_path)))

    got = Q.q_seq_rouge_pairs("ignored").to_pandas() \
        .sort_values(["doc_id", "ts_ns"]).reset_index(drop=True)

    exp = []
    by_doc: dict = {}
    for d, t, toks in rows:
        by_doc.setdefault(d, []).append((t, toks))
    for d, seq in by_doc.items():
        seq.sort()
        for (ta, a), (_tb, b) in zip(seq, seq[1:]):
            if len(b) == 0:
                continue
            ov = sum((Counter(a) & Counter(b)).values())
            exp.append((d, ta, ov, len(b)))
    exp.sort()
    assert len(got) == len(exp)
    for row, (d, ta, ov, lb) in zip(got.itertuples(), exp):
        assert row.doc_id == d and int(row.ts_ns) == ta
        assert int(row.overlap) == ov and int(row.len_b) == lb
        assert abs(row.rouge1 - ov / lb) < 1e-6
