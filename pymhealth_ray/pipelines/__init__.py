from pymhealth_ray.pipelines.flagship import flagship_features  # noqa: F401
