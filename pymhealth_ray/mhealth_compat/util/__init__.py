from pymhealth_ray.mhealth_compat.util import windows, functional  # noqa: F401
