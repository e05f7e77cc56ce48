"""reference:src/mhealth/util/windows.py surface."""
from pymhealth_ray.functions.windows import (  # noqa: F401
    view, rolling_apply, indices_rolling_apply, get_indices,
    nonuniform_rolling_apply,
)
