"""Triangle counting (stages/triangles.py)."""

import itertools

import numpy as np
import pyarrow as pa
import pytest
import ray


def test_segment_pairs_small():
    from pymhealth_ray.stages.triangles import segment_pairs

    fi, se = segment_pairs(np.array([3, 1, 2]))
    # segment [0,1,2] → (0,1),(0,2),(1,2); [3] → none; [4,5] → (4,5)
    assert fi.tolist() == [0, 0, 1, 4]
    assert se.tolist() == [1, 2, 2, 5]
    fi, se = segment_pairs(np.array([], dtype=np.int64))
    assert len(fi) == 0 and len(se) == 0


def _brute_triangles(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for n in (x, y, z):
                counts[n] = counts.get(n, 0) + 1
    return counts


@pytest.mark.usefixtures("ray_session")
def test_triangle_node_counts_bruteforce():
    from pymhealth_ray.stages.triangles import triangle_node_counts

    rng = np.random.default_rng(13)
    n_nodes = 40
    pairs = sorted({(int(a), int(b)) for a, b in
                    rng.integers(0, n_nodes, size=(300, 2)) if a < b})
    a = np.array([p[0] for p in pairs], dtype=np.int64)
    b = np.array([p[1] for p in pairs], dtype=np.int64)
    K = n_nodes
    tbl = pa.table({"pkey": pa.array(a * K + b), "a": pa.array(a),
                    "b": pa.array(b)})
    ds = ray.data.from_arrow(tbl).repartition(5)
    got = triangle_node_counts(ds, max_node=n_nodes - 1,
                               num_buckets=8).to_pandas()
    want = _brute_triangles(pairs)
    assert dict(zip(got["node"], got["n_triangles"])) == want


@pytest.mark.usefixtures("ray_session")
def test_cooccurrence_edges_and_partition_invariance():
    from pymhealth_ray.stages.triangles import (cooccurrence_edges,
                                                triangle_node_counts)

    rng = np.random.default_rng(21)
    g = rng.integers(0, 200, size=2000).astype(np.int64)
    i = rng.integers(0, 60, size=2000).astype(np.int64)
    tbl = pa.table({"g": pa.array(g), "i": pa.array(i)})

    def run(n_part, nb):
        ds = ray.data.from_arrow(tbl).repartition(n_part)
        e = cooccurrence_edges(ds, "g", "i", max_item=59, num_buckets=nb)
        t = triangle_node_counts(e, max_node=59, num_buckets=nb).to_pandas()
        return t.sort_values("node").reset_index(drop=True)

    x, y = run(3, 4), run(19, 11)
    assert x.equals(y)
    # edge weights: number of distinct groups containing both items
    e = cooccurrence_edges(ray.data.from_arrow(tbl), "g", "i",
                           max_item=59, num_buckets=8).to_pandas()
    sets = {}
    for gg, ii in zip(g, i):
        sets.setdefault(gg, set()).add(ii)
    from collections import Counter
    want = Counter()
    for members in sets.values():
        for aa, bb in itertools.combinations(sorted(members), 2):
            want[(aa, bb)] += 1
    got = {(r.a, r.b): r.w for r in e.itertuples()}
    assert got == dict(want)


@pytest.mark.usefixtures("ray_session")
def test_frequent_triples_bruteforce():
    from pymhealth_ray.stages.assoc import frequent_triples

    rng = np.random.default_rng(0)
    rows_g, rows_p = [], []
    for u in range(30):
        for p in rng.choice(50, size=8, replace=False):
            rows_g.append(u)
            rows_p.append(int(p))
    tbl = pa.table({"u": pa.array(rows_g, type=pa.int64()),
                    "p": pa.array(rows_p, type=pa.int64())})
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = frequent_triples(ds, "u", "p", max_item=49, min_support=2,
                           num_buckets=4).to_pandas()
    from collections import Counter
    baskets = {}
    for u, p in zip(rows_g, rows_p):
        baskets.setdefault(u, set()).add(p)
    c = Counter()
    for b in baskets.values():
        for t in itertools.combinations(sorted(b), 3):
            c[t] += 1
    want = {t: n for t, n in c.items() if n >= 2}
    got = {(r.item_a, r.item_b, r.item_c): r.support
           for r in out.itertuples()}
    assert got == want


def test_dropset_collect_raises_on_missing_column():
    # a zero-COLUMN empty block is tolerated, but a real block missing
    # the key column must raise (it indicates a miswired keys_col)
    from pymhealth_ray.stages.dropset import _collect_keys  # noqa: F401
    import pyarrow as pa
    import ray

    ds = ray.data.from_arrow(pa.table({"other": pa.array([1, 2])}))
    with pytest.raises(Exception):
        _collect_keys(ds, "pkey")


def test_phash64_noise_robust_and_deterministic():
    from pymhealth_ray.stages.multimodal import phash64

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 30), dtype=np.uint8)
    h1 = phash64(img.astype(np.float64) / 255.0)
    # tiny perturbation -> small hamming; resize-invariance-ish: the
    # nearest-neighbor upsample of the same image hashes identically
    pert = img.copy()
    pert[:2, :2] = np.clip(pert[:2, :2].astype(np.int64) + 1, 0, 255) \
        .astype(np.uint8)
    h2 = phash64(pert.astype(np.float64) / 255.0)
    ham = bin(int(h1.astype(np.uint64)) ^ int(h2.astype(np.uint64))) \
        .count("1")
    assert ham <= 7
    assert phash64(img.astype(np.float64) / 255.0) == h1
    # unrelated image -> far away
    other = rng.integers(0, 256, (24, 30), dtype=np.uint8)
    h3 = phash64(other.astype(np.float64) / 255.0)
    assert bin(int(h1.astype(np.uint64)) ^ int(h3.astype(np.uint64))) \
        .count("1") > 12


@pytest.mark.usefixtures("ray_session")
def test_prefix_dupes_bruteforce_and_partition_invariant():
    from pymhealth_ray.stages.dedup import prefix_dupes

    rng = np.random.default_rng(9)
    docs, ids = [], []
    for i in range(80):
        docs.append(rng.integers(0, 6, rng.integers(4, 12)).tolist())
        ids.append(f"d{i:03d}")
    # seed real prefixes
    for i in range(0, 80, 9):
        docs.append(docs[i][: max(1, len(docs[i]) // 2)])
        ids.append(f"d{i:03d}~t")
    # zero-length sequences: strict prefixes of every non-empty doc
    # (the broadcast side-path), but never of each other
    docs.extend([[], []])
    ids.extend(["e000", "e001"])
    tbl = pa.table({"doc_id": pa.array(ids),
                    "tokens": pa.array(docs, type=pa.list_(pa.int32()))})

    def run(n_part, nb):
        ds = ray.data.from_arrow(tbl).repartition(n_part)
        out = prefix_dupes(ds, num_buckets=nb).to_pandas()
        return set(zip(out["short_id"], out["long_id"]))

    got = run(3, 4)
    assert got == run(11, 7)  # partition/bucket invariance
    want = set()
    for a in range(len(docs)):
        for b in range(len(docs)):
            if a != b and len(docs[a]) < len(docs[b]) \
                    and docs[b][: len(docs[a])] == docs[a]:
                want.add((ids[a], ids[b]))
    assert got == want
