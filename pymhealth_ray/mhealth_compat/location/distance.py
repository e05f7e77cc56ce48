"""reference:src/mhealth/location/distance.py surface."""
from pymhealth_ray.functions.location import (  # noqa: F401
    haversine, haversine_elementwise, haversine_vector, haversine_outer_product,
)
