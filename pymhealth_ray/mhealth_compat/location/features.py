"""reference:src/mhealth/location/features.py surface (DataFrame layer:
datetime index + latitude/longitude columns in degrees)."""
import numpy as np
import pandas as pd

from pymhealth_ray.functions.location import (  # noqa: F401
    arr_distance_from_home,
    arr_proportion_home_stay,
    arr_successive_distance,
)
from pymhealth_ray.functions import location as _k


def determine_home_coords(df, start_time="23:00", end_time="06:00"):
    sub = df[["latitude", "longitude"]].between_time(start_time, end_time)
    lat, lon = sub.median().values
    return (lat, lon)


def distance_from_home(df, home_coords=None):
    if home_coords is None:
        home_coords = determine_home_coords(df)
    out = pd.Series(
        arr_distance_from_home(df["latitude"].values, df["longitude"].values, home_coords),
        index=df.index,
    )
    out.name = "home_distance"
    return out


def proportion_home_stay(df, limit=0.1, home_coords=None):
    return (distance_from_home(df, home_coords) < limit).sum() / len(df)


def successive_distance(df):
    return pd.Series(
        arr_successive_distance(df["latitude"].values, df["longitude"].values),
        index=df.index,
    )
