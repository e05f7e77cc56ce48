"""Tests for input-side incremental ingestion (state/lineage.ingest_delta)."""

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from pymhealth_ray.state.lineage import (
    incremental_files,
    ingest_delta,
    mark_ingested,
)


def _write_part(d, name, n, seed):
    rng = np.random.default_rng(seed)
    t = pa.table({"k": pa.array(rng.integers(0, 100, n).astype(np.int64))})
    pq.write_table(t, os.path.join(d, name))


class TestIncremental:
    def test_delta_then_nothing_then_new_file(self, ray_session, tmp_path):
        inp = tmp_path / "in"
        state = tmp_path / "state"
        inp.mkdir()
        _write_part(str(inp), "a.parquet", 100, 1)
        _write_part(str(inp), "b.parquet", 50, 2)

        def process(paths):
            return ray.data.read_parquet(paths).count()

        r1, n1 = ingest_delta(str(inp), str(state), process)
        assert (r1, n1) == (150, 2)
        r2, n2 = ingest_delta(str(inp), str(state), process)
        assert (r2, n2) == (None, 0)
        _write_part(str(inp), "c.parquet", 25, 3)
        r3, n3 = ingest_delta(str(inp), str(state), process)
        assert (r3, n3) == (25, 1)

    def test_overwritten_file_reingests(self, ray_session, tmp_path):
        inp = tmp_path / "in"
        state = tmp_path / "state"
        inp.mkdir()
        _write_part(str(inp), "a.parquet", 10, 1)
        mark_ingested(str(state), incremental_files(str(inp), str(state)))
        assert incremental_files(str(inp), str(state)) == []
        time.sleep(0.01)
        _write_part(str(inp), "a.parquet", 20, 9)  # new content
        new = incremental_files(str(inp), str(state))
        assert len(new) == 1 and new[0][0].endswith("a.parquet")

    def test_failed_process_does_not_mark(self, ray_session, tmp_path):
        inp = tmp_path / "in"
        state = tmp_path / "state"
        inp.mkdir()
        _write_part(str(inp), "a.parquet", 10, 1)

        def boom(paths):
            raise RuntimeError("transient")

        try:
            ingest_delta(str(inp), str(state), boom)
        except RuntimeError:
            pass
        # at-least-once: the file is still pending
        assert len(incremental_files(str(inp), str(state))) == 1
