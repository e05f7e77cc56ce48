"""Sources & sinks: schema, deterministic generator, parquet IO."""

from pymhealth_ray.sources.schema import SEQUENCES_SCHEMA  # noqa: F401
from pymhealth_ray.sources.generate import (  # noqa: F401
    generate_sequences,
    write_sequences,
    ensure_fixture,
)
