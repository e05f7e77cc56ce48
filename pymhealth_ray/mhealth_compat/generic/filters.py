"""reference:src/mhealth/generic/filters.py surface."""
from pymhealth_ray.functions.filters import butterworth  # noqa: F401
