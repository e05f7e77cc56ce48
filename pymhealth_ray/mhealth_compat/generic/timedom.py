"""reference:src/mhealth/generic/timedom.py surface."""
from pymhealth_ray.functions.timedom import (  # noqa: F401
    gradient, zero_crossings, zero_crossing_count, line_length,
    hjorth_activity, hjorth_mobility, hjorth_mobility_derivative,
    hjorth_complexity, hjorth_complexity_derivatives, hjorth_parameters,
    dfa, hurst, o1fit, o1fit_multiple,
)
