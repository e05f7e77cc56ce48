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
