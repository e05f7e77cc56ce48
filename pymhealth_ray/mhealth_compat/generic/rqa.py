"""reference:src/mhealth/generic/rqa.py surface."""
from pymhealth_ray.functions.rqa import (  # noqa: F401
    rq, rq2, recurrence_rate, determinism, laminarity,
    diagonal_lengths, vertical_lengths, length_entropy,
)
