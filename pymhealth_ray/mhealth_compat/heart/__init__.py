from pymhealth_ray.mhealth_compat.heart import qrs, hrv, ppg, quality  # noqa: F401
