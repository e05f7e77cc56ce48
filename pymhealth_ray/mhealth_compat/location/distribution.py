"""reference:src/mhealth/location/distribution.py surface. HDBSCAN is not
available in this environment; ``cluster_locations`` is replaced by the
engine's deterministic gap-threshold sessionizer over the datetime index
(SURVEY.md §2.8) — pass ``gap`` to control it."""
import numpy as np

from pymhealth_ray.functions.location import (  # noqa: F401
    arr_location_variance, num_clusters, cluster_totals, cluster_entropy,
    normalized_cluster_entropy,
)
from pymhealth_ray.functions.windows import sessionize as _sessionize


def location_variance(df):
    return arr_location_variance(df["latitude"].values, df["longitude"].values)


def cluster_locations(df, gap="30min", **kwargs):
    """Gap-threshold session labels over the DataFrame's datetime index —
    the engine's deterministic replacement for HDBSCAN density clusters
    (reference:location/distribution.py:42-55; divergence documented)."""
    import pandas as pd

    ts = df.index.asi8
    return _sessionize(ts, pd.Timedelta(gap).value)
