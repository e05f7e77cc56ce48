"""reference:src/mhealth/fft surface (numpy fallback defines semantics)."""
from pymhealth_ray.functions.frequency import fft, ifft  # noqa: F401
