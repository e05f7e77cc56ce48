"""reference:src/mhealth/inertial/accelerometer.py surface with the
DataFrame dispatch layer (x/y/z column convention)."""
from functools import singledispatch

import numpy as np

from pymhealth_ray.functions import inertial as _k

NUMERIC = [np.float32, np.float64, np.int32, np.int64]


def _df_xyz(df):
    return df["x"].values, df["y"].values, df["z"].values


@singledispatch
def roll(y, z=None):
    return _k.roll(y, z)


@singledispatch
def pitch(x, y=None, z=None):
    return _k.pitch(x, y, z)


@singledispatch
def magnitude(x, y=None, z=None):
    return _k.magnitude(x, y, z)


@singledispatch
def magnitude_dot(x, y=None, z=None):
    return _k.magnitude_dot(x, y, z)


def linear_filter(arr, freq, cutoff=0.3, order=5):
    return _k.linear_filter(arr, freq, cutoff, order)


def gravity_filter(arr, freq, cutoff=0.3, order=5):
    return _k.gravity_filter(arr, freq, cutoff, order)


try:
    import pandas as pd

    @roll.register(pd.DataFrame)
    def _df_roll(df):
        return pd.Series(_k.roll(df["y"].values, df["z"].values), index=df.index, name="roll")

    @pitch.register(pd.DataFrame)
    def _df_pitch(df):
        x, y, z = _df_xyz(df)
        return pd.Series(_k.pitch(x, y, z), index=df.index, name="pitch")

    @magnitude.register(pd.DataFrame)
    def _df_magnitude(df):
        x, y, z = _df_xyz(df)
        return pd.Series(_k.magnitude(x, y, z), index=df.index, name="magnitude")

    @magnitude_dot.register(pd.DataFrame)
    def _df_magnitude_dot(df):
        x, y, z = _df_xyz(df)
        return _k.magnitude_dot(x, y, z)
except ImportError:  # pragma: no cover
    pass
