"""reference:src/mhealth/util/functional.py surface."""
from pymhealth_ray.functions.functional import identity, count, pairwise, compose, rcompose  # noqa: F401
