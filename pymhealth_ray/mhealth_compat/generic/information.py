"""reference:src/mhealth/generic/information.py surface."""
from pymhealth_ray.functions.information import entropy, sampen  # noqa: F401
