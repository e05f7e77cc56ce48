"""Location kernels: haversine distances, home-reference features,
distribution features. Semantics follow ``reference:src/mhealth/location/``.

These provide the engine's broadcast-join precedent (fixed reference point
vs a stream) and the grouped-entropy aggregates.
"""

from __future__ import annotations

import numpy as np

from pymhealth_ray.functions.information import entropy

EARTH_DIAMETER_KM = 12742.018  # 2 * 6371.009, reference:location/distance.py:9


def haversine(lat1, lon1, lat2, lon2):
    """Great-circle distance in km between points in degrees (vectorized —
    accepts scalars or arrays, broadcasting). reference:location/distance.py:4-19.
    """
    rlat1, rlat2 = np.radians(lat1), np.radians(lat2)
    rlon1, rlon2 = np.radians(lon1), np.radians(lon2)
    dlat = rlat2 - rlat1
    dlon = rlon2 - rlon1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(rlat1) * np.cos(rlat2) * np.sin(dlon / 2.0) ** 2
    return EARTH_DIAMETER_KM * np.arcsin(np.sqrt(h))


def haversine_elementwise(lat1, lon1, lat2, lon2):
    """Row-wise distance of two coordinate streams.
    reference:location/distance.py:22-33.
    """
    return haversine(np.asarray(lat1), np.asarray(lon1), np.asarray(lat2), np.asarray(lon2))


def haversine_vector(lat1, lon1, latcol, loncol):
    """Fixed point vs a stream — the broadcast small-side precedent.
    reference:location/distance.py:36-44.
    """
    return haversine(lat1, lon1, np.asarray(latcol), np.asarray(loncol))


def haversine_outer_product(lat1, lon1, lat2, lon2):
    """Full n×m distance matrix (windowed use only — never global).
    reference:location/distance.py:47-59.
    """
    a1 = np.asarray(lat1)[:, None]
    o1 = np.asarray(lon1)[:, None]
    return haversine(a1, o1, np.asarray(lat2)[None, :], np.asarray(lon2)[None, :])


def determine_home_coords(ts_ns: np.ndarray, latitude: np.ndarray, longitude: np.ndarray,
                          start_hour: int = 23, end_hour: int = 6) -> tuple:
    """Median (lat, lon) among night-time rows — a time-of-day-predicated
    aggregate over an entity's history, producing a per-entity dimension row.
    reference:location/features.py:11-24 (pandas between_time('23:00','06:00'),
    inclusive bounds) re-expressed over int64-ns timestamps.
    """
    ns_per_day = 86_400_000_000_000
    ns_per_hour = 3_600_000_000_000
    tod = np.asarray(ts_ns, dtype=np.int64) % ns_per_day
    mask = (tod >= start_hour * ns_per_hour) | (tod <= end_hour * ns_per_hour)
    return (float(np.median(np.asarray(latitude)[mask])), float(np.median(np.asarray(longitude)[mask])))


def arr_distance_from_home(latitude, longitude, home_coords) -> np.ndarray:
    """Distance of every row from the home point (broadcast join-back).
    reference:location/features.py:43-53.
    """
    lat, lon = home_coords
    return haversine_vector(lat, lon, latitude, longitude)


def arr_proportion_home_stay(latitude, longitude, limit, home_coords) -> float:
    """Fraction of rows within ``limit`` km of home (strict <).
    reference:location/features.py:71-84 (note :68 uses <, replicated).
    """
    d = arr_distance_from_home(latitude, longitude, home_coords)
    return float((d < limit).sum() / len(np.asarray(latitude)))


def arr_successive_distance(latitude, longitude) -> np.ndarray:
    """Distance between consecutive points; first element 0 — the lag-1
    feature with explicit head backfill. reference:location/features.py:98-113.
    """
    latitude = np.asarray(latitude, dtype=np.float64)
    longitude = np.asarray(longitude, dtype=np.float64)
    out = np.zeros(len(latitude), dtype=np.float64)
    out[1:] = haversine_elementwise(latitude[:-1], longitude[:-1], latitude[1:], longitude[1:])
    return out


def arr_location_variance(latitude, longitude) -> float:
    """var(lat) + var(lon) — the CODE behavior (docstring claims log; the
    reference code returns the un-logged sum, recorded divergence
    location/distribution.py:31 vs :39). reference:location/distribution.py:16-39.
    """
    return float(np.var(np.asarray(latitude)) + np.var(np.asarray(longitude)))


def num_clusters(labels) -> int:
    """Count of unique labels. reference:location/distribution.py:58-65."""
    return int(len(np.unique(np.asarray(labels))))


def cluster_totals(labels) -> dict:
    """Label → occurrence count. reference:location/distribution.py:68-76."""
    vals, counts = np.unique(np.asarray(labels), return_counts=True)
    return {v: int(c) for v, c in zip(vals.tolist(), counts.tolist())}


def cluster_entropy(labels) -> float:
    """Shannon entropy of label counts. reference:location/distribution.py:79-89."""
    counts = np.unique(np.asarray(labels), return_counts=True)[1]
    return entropy(counts)


def normalized_cluster_entropy(labels, n_clusters=None) -> float:
    """Entropy / log(n_clusters). reference:location/distribution.py:92-102."""
    if n_clusters is None:
        n_clusters = num_clusters(labels)
    return cluster_entropy(labels) / float(np.log(n_clusters))


# --- deterministic density clustering (round 2) ------------------------------
#
# The reference clusters GPS points with hdbscan (haversine metric,
# min_samples=1+N//20, reference:location/distribution.py:42-55). hdbscan is
# not installed here; the engine provides a DETERMINISTIC grid-accelerated
# haversine DBSCAN with the same label contract (ints from 0 upward in order
# of first appearance, noise = -1) — a density clustering, not a port of
# HDBSCAN's hierarchy (divergence documented in SURVEY.md §8).


def _dbscan_bruteforce(lat: np.ndarray, lon: np.ndarray, eps_km: float,
                       min_samples: int) -> np.ndarray:
    """O(n²) reference DBSCAN used as the test/driver oracle for
    :func:`haversine_dbscan` — full pairwise haversine matrix, classic
    core/border/noise expansion, first-appearance label order."""
    n = len(lat)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    d = haversine_outer_product(lat, lon, lat, lon)
    nbr = d <= eps_km  # includes self
    core = nbr.sum(axis=1) >= min_samples
    labels = np.full(n, -1, dtype=np.int64)
    cur = 0
    for i in range(n):
        if labels[i] != -1 or not core[i]:
            continue
        # BFS over density-reachable points
        labels[i] = cur
        frontier = [i]
        while frontier:
            p = frontier.pop()
            if not core[p]:
                continue
            for q in np.flatnonzero(nbr[p]):
                if labels[q] == -1:
                    labels[q] = cur
                    frontier.append(q)
        cur += 1
    return labels


def haversine_dbscan(lat: np.ndarray, lon: np.ndarray, eps_km: float = 0.1,
                     min_samples: int | None = None) -> np.ndarray:
    """Grid-accelerated haversine DBSCAN: snap points to eps-sized grid
    cells, examine only the 3×3 cell neighborhood for neighbors, union-find
    core connectivity. Identical output to :func:`_dbscan_bruteforce`
    (property-tested) at O(n · neighborhood) instead of O(n²).

    ``min_samples`` defaults to the reference's ``1 + N//20``
    (reference:location/distribution.py:54) and COUNTS THE POINT ITSELF
    (classic DBSCAN / sklearn convention).
    """
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    n = len(lat)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    if min_samples is None:
        min_samples = 1 + n // 20

    # cell size ≥ eps in both axes so neighbors are always within ±1 cell
    dlat = np.degrees(eps_km / 6371.009)
    coslat = np.maximum(np.cos(np.radians(np.abs(lat).max())), 1e-6)
    dlon = dlat / coslat
    ci = np.floor(lat / dlat).astype(np.int64)
    cj = np.floor(lon / dlon).astype(np.int64)
    cell_key = ci * np.int64(1 << 32) + cj
    order = np.argsort(cell_key, kind="stable")
    sorted_keys = cell_key[order]

    # points of each cell, via searchsorted on the sorted key array
    def cell_points(ki: int, kj: int) -> np.ndarray:
        key = ki * np.int64(1 << 32) + kj
        lo = np.searchsorted(sorted_keys, key, side="left")
        hi = np.searchsorted(sorted_keys, key, side="right")
        return order[lo:hi]

    uniq_cells = np.unique(np.stack([ci, cj], axis=1), axis=0)

    # pass 1: neighbor lists (within eps) per point, via 3×3 cells
    neighbor_lists: list = [None] * n
    core = np.zeros(n, dtype=bool)
    for ki, kj in uniq_cells:
        pts = cell_points(ki, kj)
        cand = np.concatenate([
            cell_points(ki + a, kj + b) for a in (-1, 0, 1) for b in (-1, 0, 1)
        ])
        d = haversine_outer_product(lat[pts], lon[pts], lat[cand], lon[cand])
        within = d <= eps_km
        for row, p in enumerate(pts):
            # ascending order matches the brute-force oracle's expansion
            # order (border points take the FIRST cluster that reaches them)
            nb = np.sort(cand[within[row]])
            neighbor_lists[p] = nb
            core[p] = len(nb) >= min_samples  # includes self

    # pass 2: classic DBSCAN expansion in point order (deterministic labels)
    labels = np.full(n, -1, dtype=np.int64)
    cur = 0
    for i in range(n):
        if labels[i] != -1 or not core[i]:
            continue
        labels[i] = cur
        frontier = [i]
        while frontier:
            p = frontier.pop()
            if not core[p]:
                continue
            for q in neighbor_lists[p]:
                if labels[q] == -1:
                    labels[q] = cur
                    frontier.append(q)
        cur += 1
    return labels
