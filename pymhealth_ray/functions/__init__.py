"""Vectorized numpy kernel library (the reference's feature math, re-expressed).

Each module mirrors one reference module's *semantics* (cited per function as
``reference:file:line``); implementations are fresh numpy re-expressions —
vectorized where the reference used jitted loops. These kernels are:

- the per-window aggregation functions fed to the window engine
  (`pymhealth_ray.stages.window`),
- the per-row token-signal features (`pymhealth_ray.stages.rowfeatures`),
- the oracle used by the test suite.
"""

from pymhealth_ray.functions import (  # noqa: F401
    stats,
    timedom,
    information,
    windows,
    hrv,
    location,
    functional,
    rqa,
    frequency,
    filters,
    heart,
    inertial,
)

#: Registry of named scalar window kernels f(values: np.ndarray) -> float.
#: Names with a vectorized segmented fast path in the window engine are
#: marked there; anything else falls back to a per-window call of these.
KERNELS = {
    "count": len,
    "sum": lambda x: float(x.sum()),
    "mean": stats.mean,
    "median": stats.median,
    "std": stats.std,
    "var": stats.var,
    "min": stats.dmin,
    "max": stats.dmax,
    "drange": stats.drange,
    "iqr": stats.interquartile_range,
    "mode": stats.mode,
    "skewness": stats.skewness,
    "kurtosis": stats.kurtosis,
    "kurtosis_excess": stats.kurtosis_excess,
    "coeff_var": stats.coeff_var,
    "zero_crossing_count": timedom.zero_crossing_count,
    "line_length": timedom.line_length,
    "hjorth_activity": timedom.hjorth_activity,
    "hjorth_mobility": timedom.hjorth_mobility,
    "hjorth_complexity": timedom.hjorth_complexity,
    "hurst": timedom.hurst,
    "entropy_hist": information.entropy_of_values,
    "rmssd": hrv.rmssd,
    "sdsd": hrv.sdsd,
    "ssd": hrv.ssd,
    "pnn50": hrv.pnn50,
}


def register_kernel(name, fn):
    """Register a user window kernel (the engine analog of passing any
    jittable function to rolling_apply — reference:util/windows.py:54,122,181).
    """
    KERNELS[name] = fn
    return fn
