"""The mhealth_compat layer: reference-shaped imports and DataFrame
dispatch work as a reference user expects."""

import numpy as np
import pandas as pd

from pymhealth_ray.functions.filters import moving_average
from pymhealth_ray.mhealth_compat.generic import information, rqa, stats, timedom
from pymhealth_ray.mhealth_compat.heart import hrv, qrs
from pymhealth_ray.mhealth_compat.inertial import accelerometer
from pymhealth_ray.mhealth_compat.location import distance, distribution, features
from pymhealth_ray.mhealth_compat.util import functional, windows


def test_accelerometer_df_dispatch():
    df = pd.DataFrame({"x": np.random.randn(50), "y": np.random.randn(50), "z": np.random.randn(50)})
    m = accelerometer.magnitude(df)
    assert isinstance(m, pd.Series) and m.name == "magnitude"
    assert np.allclose(m.values, np.sqrt(df.x**2 + df.y**2 + df.z**2))
    assert isinstance(accelerometer.roll(df), pd.Series)
    assert isinstance(accelerometer.pitch(df), pd.Series)
    assert np.isscalar(accelerometer.magnitude_dot(df))
    # ndarray path still works
    assert np.allclose(accelerometer.magnitude(df.x.values, df.y.values, df.z.values), m.values)


def test_qrs_df_dispatch_infers_fs():
    idx = pd.date_range("2024-01-01", periods=2000, freq="4ms")  # 250 Hz
    ecg = np.zeros(2000)
    ecg[::250] = 1.0
    edf = pd.DataFrame({"ecg": moving_average(ecg, 5)}, index=idx)
    peaks = qrs.rpeaks_hamilton_tompkins(edf)
    assert isinstance(peaks, pd.DataFrame) and len(peaks) >= 6


def test_location_df_layer():
    idx = pd.date_range("2024-01-01", periods=300, freq="11min")
    ldf = pd.DataFrame(
        {"latitude": 51.5 + np.random.randn(300) * 0.001, "longitude": 0.1 + np.random.randn(300) * 0.001},
        index=idx,
    )
    lat, lon = features.determine_home_coords(ldf)
    assert abs(lat - 51.5) < 0.01 and abs(lon - 0.1) < 0.01
    assert features.proportion_home_stay(ldf, limit=5.0) == 1.0
    d = features.successive_distance(ldf)
    assert d.iloc[0] == 0.0
    labels = distribution.cluster_locations(ldf, gap="30min")
    assert distribution.num_clusters(labels) == 1
    assert distance.haversine(0, 0, 0, 0) == 0.0


def test_window_and_functional_surface():
    agg = windows.nonuniform_rolling_apply({"m": np.mean, "s": np.std})(
        np.arange(50) * 10**9, np.arange(50.0), 10**10, 10**10
    )
    assert set(agg) == {"m", "s"} and len(agg["m"]) == 5
    f = functional.rcompose(lambda x: x + 1, lambda x: x * 2)
    assert f(3) == 8
    assert stats.mode(np.array([2, 2, 1])) == 2
    assert timedom.line_length(np.array([0.0, 1.0, 0.0])) == 2.0
    assert hrv.td_factor("ms") == 1e6
    assert information.entropy(np.array([1.0, 1.0])) > 0.69
    assert rqa.recurrence_rate(rqa.rq(np.array([1.0, 1.0]))) == 1.0


class TestQueryRegistry:
    def test_every_query_has_an_oracle(self, ray_session):
        # driver contract: hash-exact gate for EVERY query — a key present
        # in queries() but missing from oracle_sql() silently downgrades
        # to a rows-only check; fail loudly here instead
        from pymhealth_ray.pipelines.queries import (
            build_oracle_sql,
            build_queries,
        )

        q = set(build_queries())
        s = set(build_oracle_sql())
        assert q == s, (q - s, s - q)
