from pymhealth_ray.state.lineage import resumable_write, read_manifests  # noqa: F401
