"""Tests for the CSV source and hive-partitioned sink (sources/io.py)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from pymhealth_ray.sources.io import read_csv, read_table, write_partitioned


class TestCsvSource:
    def test_roundtrip_with_quoting(self, ray_session, tmp_path):
        df = pd.DataFrame({
            "id": np.arange(5, dtype=np.int64),
            "text": ['plain', 'has,comma', 'has "quotes"',
                     "trailing space ", "unicode ü"],
        })
        p = tmp_path / "t.csv"
        df.to_csv(p, index=False)
        got = (read_csv(str(p), columns=["id", "text"], blocks=2)
               .to_pandas().sort_values("id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, df)


class TestPartitionedSink:
    def test_layout_and_roundtrip(self, ray_session, tmp_path):
        rng = np.random.default_rng(91)
        df = pd.DataFrame({
            "k": np.arange(1000, dtype=np.int64),
            "part": rng.choice(["x", "y", "z"], 1000),
            "v": rng.integers(0, 100, 1000).astype(np.int64),
        })
        out = str(tmp_path / "sink")
        vals = write_partitioned(ray.data.from_pandas(df).repartition(4),
                                 out, "part")
        assert vals == ["x", "y", "z"]
        for v in vals:
            f = os.path.join(out, f"part={v}", "data.parquet")
            assert os.path.exists(f)
            t = pq.read_table(f)
            # partition column lives in the path, not the file
            assert "part" not in t.column_names
            assert t.num_rows == (df.part == v).sum()
        back = (read_table(out).to_pandas()
                .sort_values("k").reset_index(drop=True))
        assert len(back) == len(df)
        exp = df.sort_values("k").reset_index(drop=True)
        assert back["k"].tolist() == exp["k"].tolist()
        assert back["v"].tolist() == exp["v"].tolist()
        assert back["part"].astype(str).tolist() == exp["part"].tolist()

    def test_atomic_no_tmp_left(self, ray_session, tmp_path):
        df = pd.DataFrame({"k": [1, 2], "part": ["a", "a"]})
        out = str(tmp_path / "sink2")
        write_partitioned(ray.data.from_pandas(df), out, "part")
        files = os.listdir(os.path.join(out, "part=a"))
        assert files == ["data.parquet"]
