"""Distributed density clustering of GPS-like points
(reference:location/distribution.py:42-55 ``cluster_locations`` + its
downstream ``num_clusters`` / ``cluster_entropy`` features).

Plan: ONE entity-bucket exchange (every entity's points land in one bucket —
the engine's standard partitioning invariant), then a per-entity
grid-accelerated haversine DBSCAN inside each bucket. Clustering is local to
an entity by definition (a user's places), so no cross-bucket state exists
and the stage scales with bucket count; the grid acceleration keeps the
per-entity cost near-linear, and per-entity point counts are the documented
memory bound (a single entity's GPS history fits in a task).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pymhealth_ray.functions.location import cluster_entropy, haversine_dbscan
from pymhealth_ray.stages.partition import entity_segments, grouped_by_bucket


def cluster_locations_stage(
    ds,
    entity_col: str = "user_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    ts_col: str = "ts",
    eps_km: float = 0.1,
    min_samples: int | None = None,
    num_buckets: int = 64,
):
    """Per-entity DBSCAN labels: one row per input point with its cluster
    label (ints from 0 in first-appearance order per entity, noise −1),
    points processed in (entity, ts) order so labels are deterministic."""

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl, starts, n_ent = entity_segments(tbl, entity_col, ts_col)
        lat = tbl[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lon = tbl[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        labels = np.empty(len(lat), dtype=np.int64)
        for k in range(n_ent):
            s, e = starts[k], starts[k + 1]
            labels[s:e] = haversine_dbscan(lat[s:e], lon[s:e], eps_km, min_samples)
        return tbl.append_column("cluster", pa.array(labels))

    return grouped_by_bucket(ds, per_bucket, entity_col=entity_col, num_buckets=num_buckets)


def cluster_features_stage(
    ds,
    entity_col: str = "user_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    ts_col: str = "ts",
    eps_km: float = 0.1,
    min_samples: int | None = None,
    num_buckets: int = 64,
):
    """Per-entity cluster summary (reference ``num_clusters`` /
    ``cluster_totals`` / ``cluster_entropy`` / ``normalized_cluster_entropy``
    family): one row per entity. Entropy follows the reference semantics —
    computed over ALL label totals including noise (−1), natural log."""

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl, starts, n_ent = entity_segments(tbl, entity_col, ts_col)
        lat = tbl[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lon = tbl[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ent_col = tbl[entity_col]
        if isinstance(ent_col, pa.ChunkedArray):
            ent_col = ent_col.combine_chunks()
        out_ent, out_n, out_nc, out_noise, out_H = [], [], [], [], []
        for k in range(n_ent):
            s, e = starts[k], starts[k + 1]
            labels = haversine_dbscan(lat[s:e], lon[s:e], eps_km, min_samples)
            out_ent.append(ent_col[int(s)].as_py())
            out_n.append(int(e - s))
            out_nc.append(int((np.unique(labels) >= 0).sum()))
            out_noise.append(int((labels == -1).sum()))
            out_H.append(float(cluster_entropy(labels)))
        return pa.table({
            entity_col: pa.array(out_ent, type=ent_col.type),
            "n_points": pa.array(out_n, type=pa.int64()),
            "n_clusters": pa.array(out_nc, type=pa.int64()),
            "n_noise": pa.array(out_noise, type=pa.int64()),
            "cluster_entropy": pa.array(out_H, type=pa.float64()),
        })

    return grouped_by_bucket(ds, per_bucket, entity_col=entity_col, num_buckets=num_buckets)
