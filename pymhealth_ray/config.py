"""Engine configuration.

Centralizes the scale knobs so every stage sizes itself consistently:
bucket count for the single entity shuffle, batch sizes for wide
(token-list) rows, and actor-pool sizing for stateful stages.
"""

from __future__ import annotations

import dataclasses
import os


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Knobs shared by all stages.

    At 100 TB scale ``num_buckets`` must grow so one bucket (the unit of
    per-task work and of resumable output) stays at a few hundred MB:
    pick ``num_buckets ≈ total_bytes / 256 MiB`` and >= 4× total cluster
    cores. Entities are hash-assigned to buckets, so one bucket holds many
    whole entities; a single entity never straddles buckets (the invariant
    every temporal stage relies on).
    """

    # Unit of the entity shuffle; also the resume/lineage partition unit.
    num_buckets: int = 64
    # Rows per Arrow batch for narrow rows; wide token rows use bytes budget.
    batch_size: int = 4096
    # Byte budget per batch for wide rows (tokens lists): rows are chosen so
    # rows * avg_row_bytes <= this.
    target_batch_bytes: int = 32 * 1024 * 1024
    # Actor pool size for stateful stages (min, max).
    actor_pool_min: int = 2
    actor_pool_max: int = 8
    # Entities whose row count exceeds this are salted for stateless window
    # work (overlap-replay); sessionization routes them unsalted.
    hot_entity_rows: int = 2_000_000
    # Canonical time unit is nanoseconds (reference: heart/qrs.py:102,
    # heart/hrv.py:84 both normalize to ns).
    ts_unit: str = "ns"

    @staticmethod
    def default() -> "EngineConfig":
        nb = int(os.environ.get("PYMHEALTH_RAY_NUM_BUCKETS", "64"))
        return EngineConfig(num_buckets=nb)


DEFAULT = EngineConfig.default()
