from pymhealth_ray.mhealth_compat.inertial import accelerometer  # noqa: F401
