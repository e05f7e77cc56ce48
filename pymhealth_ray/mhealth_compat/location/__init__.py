from pymhealth_ray.mhealth_compat.location import distance, features, distribution  # noqa: F401
