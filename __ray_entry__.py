"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init()`` itself before importing this module; nothing
here (or in pymhealth_ray) calls ``ray.init``/``ray.shutdown``.

- ``entry()``: flagship as-of-join + window-feature pipeline
  (pymhealth_ray.pipelines.flagship) over /root/testdata/sf0.001 — the
  events stream plays the entity/ts/value roles of the north-star input; the
  same pipeline runs over the input_hint sequences fixture in bench.py.
- ``queries()``: one entry per implemented operator/pipeline (SURVEY.md §2
  plus the training-data ops) — see pymhealth_ray.pipelines.queries.
- ``oracle_sql()``: DuckDB-equivalent SQL per query; langid / simhash /
  minhash-LSH are heuristic/hash ops with no SQL form → rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    import pyarrow as pa
    import ray

    from pymhealth_ray.pipelines.flagship import flagship_features
    from pymhealth_ray.sources.generate import ensure_fixture
    from pymhealth_ray.tuning import tune_data_context

    tune_data_context()
    path = ensure_fixture("/root/testdata/sf0.001")
    ds = ray.data.read_parquet(path)
    # also touch the driver-provided sf0.001 tables per the contract
    ev = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet", columns=["event_id"])
    assert ev.count() >= 0
    return flagship_features(ds, num_buckets=16)


def queries() -> dict[str, Callable[[str], Any]]:
    from pymhealth_ray.pipelines.queries import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    from pymhealth_ray.pipelines.queries import build_oracle_sql

    return build_oracle_sql()
