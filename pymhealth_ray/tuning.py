"""Process-wide Ray Data execution tuning for the engine's query paths.

Measured on this sandbox (BASELINE.md "Measurement method"): the push-based
sort shuffle is ~2x faster than the default sort shuffle for the engine's
bucket exchanges (equi-join co-partitioning, as-of union exchange, groupby
rollups) — e.g. orders_customer_join_salted 9.6s -> 6.6s, events_asof_purchase
5.7s -> 3.2s at sf0.1 / 32 cpus. Mutates only the process-local
``DataContext`` (no ``ray.init``), so it is safe under the driver contract.

Called from every query/pipeline entry point (``build_queries``,
``__ray_entry__.entry``, ``bench.py``); tests deliberately run the default
strategy so correctness stays strategy-independent.
"""

from __future__ import annotations


def tune_data_context() -> None:
    try:
        from ray.data.context import DataContext, ShuffleStrategy

        DataContext.get_current().shuffle_strategy = (
            ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
        )
    except Exception:
        # older/newer ray without the enum: keep the default strategy
        pass
