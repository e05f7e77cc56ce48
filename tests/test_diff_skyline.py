"""Snapshot diff classification and skyline operators."""

import numpy as np
import pyarrow as pa
import pytest
import ray


@pytest.mark.usefixtures("ray_session")
def test_full_outer_diff_classification():
    from pymhealth_ray.stages.join import equi_join

    a = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], type=pa.int64()),
        "val_a": pa.array([10, 20, 30], type=pa.int64())}))
    b = ray.data.from_arrow(pa.table({
        "k": pa.array([2, 3, 4], type=pa.int64()),
        "val_b": pa.array([20, 99, 40], type=pa.int64())}))
    j = equi_join(a, b, on="k", join_type="full outer",
                  num_buckets=4).to_pandas().sort_values("k")
    # 1: removed (right null), 2: same, 3: changed, 4: added (left null)
    assert j["k"].tolist() == [1, 2, 3, 4]
    assert j["val_a"].tolist()[:3] == [10, 20, 30]
    assert np.isnan(j["val_b"].iloc[0]) and np.isnan(j["val_a"].iloc[3])
    assert j["val_b"].iloc[1] == 20 and j["val_b"].iloc[2] == 99


def _brute_skyline(mn, mx):
    keep = []
    for i in range(len(mn)):
        dom = any(mn[j] <= mn[i] and mx[j] >= mx[i]
                  and (mn[j] < mn[i] or mx[j] > mx[i])
                  for j in range(len(mn)))
        keep.append(not dom)
    return np.array(keep)


def test_skyline_mask_bruteforce_with_ties():
    from pymhealth_ray.stages.skyline import skyline_mask

    rng = np.random.default_rng(3)
    for _ in range(20):
        # small value range forces exact ties, including full duplicates
        mn = rng.integers(0, 8, size=60).astype(np.int64)
        mx = rng.integers(0, 8, size=60).astype(np.int64)
        got = skyline_mask(mn, mx)
        want = _brute_skyline(mn.tolist(), mx.tolist())
        assert (got == want).all()


@pytest.mark.usefixtures("ray_session")
def test_skyline_2d_partition_invariant():
    from pymhealth_ray.stages.skyline import skyline_2d

    rng = np.random.default_rng(5)
    tbl = pa.table({
        "id": pa.array(np.arange(5000, dtype=np.int64)),
        "cost": pa.array(rng.integers(0, 10_000, 5000).astype(np.int64)),
        "gain": pa.array(rng.integers(0, 10_000, 5000).astype(np.int64))})

    def run(n_part):
        ds = ray.data.from_arrow(tbl).repartition(n_part)
        out = skyline_2d(ds, "cost", "gain").to_pandas()
        return out.sort_values("id").reset_index(drop=True)

    a, b = run(2), run(23)
    assert a.equals(b)
    # every survivor is non-dominated vs the full table
    mn = tbl["cost"].to_numpy()
    mx = tbl["gain"].to_numpy()
    for _, r in a.iterrows():
        dom = ((mn <= r["cost"]) & (mx >= r["gain"])
               & ((mn < r["cost"]) | (mx > r["gain"]))).any()
        assert not dom


@pytest.mark.usefixtures("ray_session")
def test_knn_dot_metric_vs_numpy():
    from pymhealth_ray.stages.ann import knn_bruteforce

    rng = np.random.default_rng(2)
    mat = rng.normal(size=(200, 16))
    tbl = pa.table({"vec_id": pa.array(np.arange(200, dtype=np.int64)),
                    "embedding": pa.array(list(mat))})
    ds = ray.data.from_arrow(tbl).repartition(6)
    q = tbl.slice(0, 3)
    got = knn_bruteforce(ds, q, k=4, metric="dot")
    sims = mat[:3] @ mat.T
    for qi in range(3):
        s = sims[qi].copy()
        s[qi] = -np.inf
        order = np.lexsort((np.arange(200), -s))[:4]
        m = got.filter(pa.compute.equal(got["query_id"], qi))
        assert m["neighbor_id"].to_pylist() == order.tolist()
