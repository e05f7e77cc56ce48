"""stages/dropset: plan equality (broadcast vs bloom/co-partitioned) and
no-driver-collect guarantee for the large-set plan."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from pymhealth_ray.stages import dropset
from pymhealth_ray.stages.dropset import filter_by_keys, lookup_with_default


def _data_ds(n=5000, seed=7):
    rng = np.random.default_rng(seed)
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(rng.permutation(n).astype(np.int64)),
        "val": pa.array(rng.integers(0, 100, n).astype(np.int64)),
    })).repartition(8)


def _keys_ds(n=5000, seed=11):
    rng = np.random.default_rng(seed)
    # ~40% of the id domain, plus keys OUTSIDE the domain (never match)
    ks = np.unique(rng.integers(0, int(n * 1.3), int(n * 0.55)).astype(np.int64))
    return ray.data.from_arrow(pa.table({"doc_id": pa.array(ks)})).repartition(4)


def _sorted_pd(ds):
    return ds.to_pandas().sort_values(["doc_id"]).reset_index(drop=True)


@pytest.mark.parametrize("keep", [False, True])
def test_filter_plan_equality(ray_session, keep):
    ds, keys = _data_ds(), _keys_ds()
    small = filter_by_keys(ds, "doc_id", keys, keep=keep,
                           broadcast_threshold=10**9)
    large = filter_by_keys(ds, "doc_id", keys, keep=keep,
                           broadcast_threshold=0, bloom_bits=1 << 14,
                           num_buckets=5)
    a, b = _sorted_pd(small), _sorted_pd(large)
    assert a.equals(b)
    assert len(a) > 0 and len(a) < 5000


def test_filter_large_plan_never_collects(ray_session, monkeypatch):
    def boom(*a, **k):
        raise AssertionError("large-set plan collected keys to the driver")

    monkeypatch.setattr(dropset, "_collect_keys", boom)
    ds, keys = _data_ds(), _keys_ds()
    out = filter_by_keys(ds, "doc_id", keys, keep=False,
                         broadcast_threshold=0, num_buckets=4)
    assert out.count() > 0


def test_lookup_plan_equality(ray_session):
    ds = _data_ds()
    rng = np.random.default_rng(3)
    vs = np.unique(rng.integers(0, 5000, 1500).astype(np.int64))
    map_ds = ray.data.from_arrow(pa.table({
        "v": pa.array(vs),
        "l": pa.array((vs // 7).astype(np.int64)),
    })).repartition(3)
    small = lookup_with_default(ds, "doc_id", map_ds, "v", "l", "cluster_id",
                                broadcast_threshold=10**9)
    large = lookup_with_default(ds, "doc_id", map_ds, "v", "l", "cluster_id",
                                broadcast_threshold=0, bloom_bits=1 << 13,
                                num_buckets=6)
    a, b = _sorted_pd(small), _sorted_pd(large)
    assert a.equals(b)
    # unmapped rows defaulted to their own id
    unmapped = a[~a.doc_id.isin(vs)]
    assert (unmapped.cluster_id == unmapped.doc_id).all()
    mapped = a[a.doc_id.isin(vs)]
    assert (mapped.cluster_id == mapped.doc_id // 7).all()


def test_filter_empty_keys(ray_session):
    ds = _data_ds(200)
    keys = ray.data.from_arrow(pa.table({"doc_id": pa.array([], type=pa.int64())}))
    assert filter_by_keys(ds, "doc_id", keys, keep=False).count() == 200
    assert filter_by_keys(ds, "doc_id", keys, keep=True).count() == 0
