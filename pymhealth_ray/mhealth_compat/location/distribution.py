"""reference:src/mhealth/location/distribution.py surface. HDBSCAN is not
available in this environment; ``cluster_locations`` runs the engine's
DETERMINISTIC grid-accelerated haversine DBSCAN (same label contract: ints
from 0 upward, noise −1; density clustering, not HDBSCAN's hierarchy —
divergence documented in SURVEY.md §8). The round-1 gap-threshold temporal
sessionizer remains available as ``cluster_locations_temporal``."""
import numpy as np

from pymhealth_ray.functions.location import (  # noqa: F401
    arr_location_variance, num_clusters, cluster_totals, cluster_entropy,
    normalized_cluster_entropy, haversine_dbscan,
)
from pymhealth_ray.functions.windows import sessionize as _sessionize


def location_variance(df):
    return arr_location_variance(df["latitude"].values, df["longitude"].values)


def cluster_locations(df, eps_km: float = 0.1, min_samples=None, gap=None, **kwargs):
    """Density-cluster a latitude/longitude DataFrame
    (reference:location/distribution.py:42-55; min_samples defaults to the
    reference's 1 + N//20). Passing ``gap`` selects the temporal fallback
    for callers of the round-1 surface."""
    if gap is not None:
        return cluster_locations_temporal(df, gap=gap)
    return haversine_dbscan(
        df["latitude"].values, df["longitude"].values, eps_km=eps_km,
        min_samples=min_samples,
    )


def cluster_locations_temporal(df, gap="30min"):
    """Gap-threshold session labels over the DataFrame's datetime index —
    the round-1 temporal generalization, kept for sessioning use cases."""
    import pandas as pd

    ts = df.index.asi8
    return _sessionize(ts, pd.Timedelta(gap).value)
