"""Accelerometer projections. reference:src/mhealth/inertial/accelerometer.py.

Per-record maps over x/y/z columns — the canonical stateless map_batches
kernels (engine stage: pymhealth_ray.stages.rowfeatures applies them over
Arrow columns directly).
"""

from __future__ import annotations

import numpy as np

from pymhealth_ray.functions.filters import butterworth

RAD2DEG = 180.0 / np.pi


def roll(y, z):
    """arctan2(y, z) in degrees. reference:inertial/accelerometer.py:13-41."""
    return np.arctan2(np.asarray(y), np.asarray(z)) * RAD2DEG


def pitch(x, y, z):
    """arctan2(-x, sqrt(y^2+z^2)) in degrees.
    reference:inertial/accelerometer.py:44-74.
    """
    x, y, z = np.asarray(x), np.asarray(y), np.asarray(z)
    return np.arctan2(-x, np.sqrt(y**2 + z**2)) * RAD2DEG


def magnitude(x, y, z):
    """Per-row euclidean norm. reference:inertial/accelerometer.py:198-233."""
    x, y, z = np.asarray(x), np.asarray(y), np.asarray(z)
    return np.sqrt(x**2 + y**2 + z**2)


def magnitude_dot(x, y, z):
    """Whole-array norm sqrt(x.x + y.y + z.z) — a global aggregate.
    reference:inertial/accelerometer.py:236-265.
    """
    x, y, z = np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64), np.asarray(z, dtype=np.float64)
    return float(np.sqrt(np.dot(x, x) + np.dot(y, y) + np.dot(z, z)))


def linear_filter(arr: np.ndarray, freq: float, cutoff: float = 0.3, order: int = 5) -> np.ndarray:
    """High-pass per column → non-gravity (linear) acceleration component.
    reference:inertial/accelerometer.py:77-138.
    """
    arr = np.atleast_2d(np.asarray(arr, dtype=np.float64).T).T
    out = np.empty_like(arr)
    for c in range(arr.shape[1]):
        out[:, c] = butterworth(arr[:, c], cutoff, freq, order=order, ftype="highpass")
    return out.squeeze()


def gravity_filter(arr: np.ndarray, freq: float, cutoff: float = 0.3, order: int = 5) -> np.ndarray:
    """Low-pass per column → gravity component.
    reference:inertial/accelerometer.py:141-195.
    """
    arr = np.atleast_2d(np.asarray(arr, dtype=np.float64).T).T
    out = np.empty_like(arr)
    for c in range(arr.shape[1]):
        out[:, c] = butterworth(arr[:, c], cutoff, freq, order=order, ftype="lowpass")
    return out.squeeze()
