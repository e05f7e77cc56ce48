from pymhealth_ray.mhealth_compat.generic import stats, timedom, information, filters, rqa  # noqa: F401
