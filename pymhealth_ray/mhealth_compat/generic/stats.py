"""reference:src/mhealth/generic/stats.py surface."""
from pymhealth_ray.functions.stats import (  # noqa: F401
    minmax, drange, interquartile_range, mode, skewness, kurtosis,
    kurtosis_excess, coeff_var, absolute, mean, median, std, var,
    dmin, dmax, percentile,
)
