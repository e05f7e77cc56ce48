"""reference:src/mhealth/heart/quality.py surface (the bidirectional
variant is known-buggy in the reference and intentionally not provided —
SURVEY.md §2.6)."""
from pymhealth_ray.functions.heart import beat_correlation  # noqa: F401
