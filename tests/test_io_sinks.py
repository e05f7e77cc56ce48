"""Tests for the CSV source and hive-partitioned sink (sources/io.py)."""

import os

import numpy as np
import pandas as pd
import pytest
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


class TestZoneMap:
    def test_roundtrip_and_pruning(self, ray_session, tmp_path):
        from pymhealth_ray.sources.io import read_zonemapped, write_zonemapped

        rng = np.random.default_rng(51)
        n = 20_000
        df = pd.DataFrame({
            "t": np.sort(rng.integers(0, 10**9, n)).astype(np.int64),
            "v": rng.integers(0, 100, n).astype(np.int64),
        })
        # shuffle so the writer has to range-partition
        df = df.sample(frac=1.0, random_state=0).reset_index(drop=True)
        zdir = str(tmp_path / "zm")
        man = write_zonemapped(ray.data.from_pandas(df).repartition(8),
                               zdir, "t", num_files=16)
        assert sum(m["rows"] for m in man) == n
        # zones must be disjoint-ordered
        man = sorted(man, key=lambda m: m["zmin"])
        for a, b in zip(man, man[1:]):
            assert a["zmax"] <= b["zmin"]

        lo, hi = 250_000_000, 500_000_000
        ds, n_read, n_total = read_zonemapped(zdir, "t", lo, hi)
        assert n_read < n_total  # pruning actually happened
        got = ds.to_pandas().sort_values(["t", "v"]).reset_index(drop=True)
        exp = (df[(df.t >= lo) & (df.t <= hi)]
               .sort_values(["t", "v"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, exp)

    def test_empty_range(self, ray_session, tmp_path):
        from pymhealth_ray.sources.io import read_zonemapped, write_zonemapped

        df = pd.DataFrame({"t": np.arange(100, dtype=np.int64),
                           "v": np.arange(100, dtype=np.int64)})
        zdir = str(tmp_path / "zm2")
        write_zonemapped(ray.data.from_pandas(df), zdir, "t", num_files=4)
        ds, n_read, _ = read_zonemapped(zdir, "t", 10**6, 10**7)
        assert n_read == 0 and ds.count() == 0


class TestCompactionEvolution:
    def test_compact_preserves_reads(self, ray_session, tmp_path):
        from pymhealth_ray.sources.io import (compact_zonemapped,
                                              read_zonemapped,
                                              write_zonemapped)

        rng = np.random.default_rng(52)
        df = pd.DataFrame({
            "t": rng.integers(0, 10**8, 10_000).astype(np.int64),
            "v": rng.integers(0, 50, 10_000).astype(np.int64),
        })
        zdir = str(tmp_path / "zc")
        write_zonemapped(ray.data.from_pandas(df).repartition(6),
                         zdir, "t", num_files=24)
        before, _, _ = read_zonemapped(zdir, "t", 10**7, 6 * 10**7)
        before = before.to_pandas().sort_values(["t", "v"]).reset_index(drop=True)

        man = compact_zonemapped(zdir, target_files=5)
        assert len(man) <= 8  # grouping is approximate but must shrink
        import os
        files = [f for f in os.listdir(zdir) if f.endswith(".parquet")]
        assert len(files) == len(man)
        after, n_read, n_total = read_zonemapped(zdir, "t", 10**7, 6 * 10**7)
        after = after.to_pandas().sort_values(["t", "v"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(before, after)
        assert n_total == len(man)

    def test_recompaction_is_lossless(self, ray_session, tmp_path):
        """Second compaction must not overwrite inputs sibling merge tasks
        haven't read (generation-prefixed names) nor delete files the new
        manifest points at."""
        import os

        from pymhealth_ray.sources.io import (compact_zonemapped,
                                              read_zonemapped,
                                              write_zonemapped)

        rng = np.random.default_rng(53)
        df = pd.DataFrame({
            "t": rng.integers(0, 10**8, 8_000).astype(np.int64),
            "v": rng.integers(0, 50, 8_000).astype(np.int64),
        })
        zdir = str(tmp_path / "zc2")
        write_zonemapped(ray.data.from_pandas(df).repartition(6),
                         zdir, "t", num_files=32)
        man1 = compact_zonemapped(zdir, target_files=8)
        man2 = compact_zonemapped(zdir, target_files=2)
        assert len(man2) < len(man1)
        files = {f for f in os.listdir(zdir) if f.endswith(".parquet")}
        assert files == {m["file"] for m in man2}
        got, _, _ = read_zonemapped(zdir, "t", 0, 10**8)
        got = got.to_pandas().sort_values(["t", "v"]).reset_index(drop=True)
        want = df.sort_values(["t", "v"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)

    def test_empty_write_and_schema_carrying_miss(self, ray_session, tmp_path):
        from pymhealth_ray.sources.io import read_zonemapped, write_zonemapped

        zdir = str(tmp_path / "zempty")
        empty = pd.DataFrame({"t": pd.Series([], dtype="int64"),
                              "v": pd.Series([], dtype="int64")})
        assert write_zonemapped(ray.data.from_pandas(empty), zdir, "t") == []
        ds, n_read, n_total = read_zonemapped(zdir, "t", 0, 10)
        assert n_read == 0 and n_total == 0 and ds.count() == 0

        zdir2 = str(tmp_path / "zmiss")
        df = pd.DataFrame({"t": np.arange(100, dtype=np.int64),
                           "v": np.arange(100, dtype=np.int64)})
        write_zonemapped(ray.data.from_pandas(df), zdir2, "t", num_files=4)
        ds, n_read, _ = read_zonemapped(zdir2, "t", 10**9, 2 * 10**9)
        assert n_read == 0
        # the no-hit dataset carries the REAL file schema
        assert set(ds.schema().names) == {"t", "v"}

    def test_evolved_read_fills_and_casts(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from pymhealth_ray.sources.io import read_table_evolved

        old = pa.table({"a": pa.array([1, 2], type=pa.int32())})
        new = pa.table({"a": pa.array([3], type=pa.int64()),
                        "b": pa.array(["x"]),
                        "extra": pa.array([9.0])})
        pq.write_table(old, str(tmp_path / "old.parquet"))
        pq.write_table(new, str(tmp_path / "new.parquet"))
        target = pa.schema([("a", pa.int64()), ("b", pa.string())])
        got = (read_table_evolved([str(tmp_path / "old.parquet"),
                                   str(tmp_path / "new.parquet")], target)
               .to_pandas().sort_values("a").reset_index(drop=True))
        assert got.a.tolist() == [1, 2, 3]
        assert got.b.tolist()[:2] == [None, None] and got.b.tolist()[2] == "x"
        assert str(got.a.dtype) == "int64"


class TestZoneMapDegenerate:
    def test_constant_sort_key(self, ray_session, tmp_path):
        from pymhealth_ray.sources.io import read_zonemapped, write_zonemapped

        df = pd.DataFrame({"t": np.full(500, 42, dtype=np.int64),
                           "v": np.arange(500, dtype=np.int64)})
        zdir = str(tmp_path / "zconst")
        man = write_zonemapped(ray.data.from_pandas(df).repartition(4),
                               zdir, "t", num_files=8)
        assert len(man) == 1  # all rows share one zone
        ds, n_read, n_total = read_zonemapped(zdir, "t", 0, 100)
        assert (n_read, n_total) == (1, 1)
        assert ds.count() == 500
        ds2, n_read2, _ = read_zonemapped(zdir, "t", 43, 100)
        assert n_read2 == 0 and ds2.count() == 0


class TestZoneMapBloom:
    RARE = 99_999

    def _layout(self, tmp_path, n=20_000, users=400, num_files=16):
        from pymhealth_ray.sources.io import write_zonemapped

        rng = np.random.default_rng(61)
        df = pd.DataFrame({
            "t": np.sort(rng.integers(0, 10**9, n)).astype(np.int64),
            "u": rng.integers(0, users, n).astype(np.int64),
        })
        # a user confined to a narrow time band: present in ~1-2 of the
        # 16 zones, so bloom skipping has something to skip
        rare_rows = pd.DataFrame({
            "t": rng.integers(0, 3 * 10**7, 30).astype(np.int64),
            "u": np.full(30, self.RARE, dtype=np.int64),
        })
        df = pd.concat([df, rare_rows], ignore_index=True)
        df = df.sample(frac=1.0, random_state=1).reset_index(drop=True)
        zdir = str(tmp_path / "zb")
        man = write_zonemapped(ray.data.from_pandas(df).repartition(8),
                               zdir, "t", num_files=num_files,
                               bloom_cols=["u"])
        return df, zdir, man

    def test_point_lookup_prunes_and_is_exact(self, ray_session, tmp_path):
        from pymhealth_ray.sources.io import read_zonemapped_point

        df, zdir, man = self._layout(tmp_path)
        assert all("bloom__u" in m for m in man)
        # the rare user lives in a narrow time band: files without it
        # must be skipped, and the result must equal the plain filter
        sub = df[df.u == self.RARE]
        ds, n_read, n_total = read_zonemapped_point(zdir, "u", self.RARE)
        got = ds.to_pandas().sort_values(["t"]).reset_index(drop=True)
        exp = sub.sort_values(["t"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp)
        assert n_read < n_total  # skipping actually happened

    def test_absent_value_reads_nothing_or_fp_only(self, ray_session,
                                                   tmp_path):
        from pymhealth_ray.sources.io import read_zonemapped_point

        df, zdir, _ = self._layout(tmp_path)
        ds, n_read, n_total = read_zonemapped_point(zdir, "u", 10**9)
        assert ds.count() == 0  # equality residual kills bloom FPs
        assert n_read < n_total

    def test_compaction_carries_blooms(self, ray_session, tmp_path):
        from pymhealth_ray.sources.io import (compact_zonemapped,
                                              read_zonemapped_point)

        df, zdir, _ = self._layout(tmp_path)
        man = compact_zonemapped(zdir, target_files=4)
        assert all("bloom__u" in m for m in man)
        ds, n_read, n_total = read_zonemapped_point(zdir, "u", self.RARE)
        got = ds.to_pandas().sort_values(["t"]).reset_index(drop=True)
        exp = df[df.u == self.RARE].sort_values(["t"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp)


class TestZoneMapUpsert:
    def _layout(self, tmp_path):
        from pymhealth_ray.sources.io import write_zonemapped

        rng = np.random.default_rng(71)
        n = 12_000
        df = pd.DataFrame({
            "k": np.arange(n, dtype=np.int64),
            "t": np.sort(rng.integers(0, 10**9, n)).astype(np.int64),
            "v": rng.integers(0, 100, n).astype(np.int64),
        })
        df = df.sample(frac=1.0, random_state=2).reset_index(drop=True)
        zdir = str(tmp_path / "zu")
        write_zonemapped(ray.data.from_pandas(df).repartition(6),
                         zdir, "t", num_files=16, bloom_cols=["k"])
        return df, zdir

    def test_partial_rewrite_and_exact_merge(self, ray_session, tmp_path):
        import glob
        import os

        from pymhealth_ray.sources.io import (read_zonemapped,
                                              read_zonemapped_point,
                                              upsert_zonemapped)

        df, zdir = self._layout(tmp_path)
        # corrections confined to an early time band + one brand-new key
        band = df[(df.t < 5 * 10**7)]
        upd = band.head(40).copy()
        upd["v"] = upd.v + 1000
        ins = pd.DataFrame({"k": [10**6], "t": [upd.t.iloc[0] + 1],
                            "v": [7]})
        delta = pa.Table.from_pandas(pd.concat([upd, ins]),
                                     preserve_index=False)

        before = {p: os.stat(p).st_mtime_ns
                  for p in glob.glob(os.path.join(zdir, "*.parquet"))}
        n_touch, n_total = upsert_zonemapped(zdir, delta, "k", "t")
        assert 0 < n_touch < n_total  # only the touched files rewrote
        # MVCC: originals are untouched (kept for time travel); exactly
        # n_touch NEW generation-named files appeared
        for p, mt in before.items():
            assert os.stat(p).st_mtime_ns == mt
        new_files = [p for p in glob.glob(os.path.join(zdir, "*.parquet"))
                     if p not in before]
        assert len(new_files) == n_touch
        assert all(os.path.basename(p).startswith("u001-")
                   for p in new_files)

        # merged content equals the pandas merge
        exp = df[~df.k.isin(upd.k)].copy()
        exp = pd.concat([exp, upd, ins], ignore_index=True)
        got, _, _ = read_zonemapped(zdir, "t", 0, 2 * 10**9)
        got = got.to_pandas().sort_values(["k"]).reset_index(drop=True)
        exp = exp.sort_values(["k"]).reset_index(drop=True)[got.columns]
        pd.testing.assert_frame_equal(
            got, exp.astype({c: got[c].dtype for c in got.columns}))

        # blooms were recomputed: point lookup finds the inserted key
        ds, n_read, n_tot = read_zonemapped_point(zdir, "k", 10**6)
        assert ds.count() == 1
        assert n_read < n_tot

    def test_duplicate_delta_keys_rejected(self, ray_session, tmp_path):
        from pymhealth_ray.sources.io import upsert_zonemapped

        df, zdir = self._layout(tmp_path)
        bad = pa.table({"k": pa.array([1, 1], type=pa.int64()),
                        "t": pa.array([5, 6], type=pa.int64()),
                        "v": pa.array([0, 0], type=pa.int64())})
        with pytest.raises(ValueError, match="unique"):
            upsert_zonemapped(zdir, bad, "k", "t")

    def test_zones_stay_disjoint_after_gap_inserts(self, ray_session,
                                                   tmp_path):
        import json

        from pymhealth_ray.sources.io import upsert_zonemapped

        df, zdir = self._layout(tmp_path)
        # inserts beyond both ends and into inter-zone gaps
        delta = pa.table({
            "k": pa.array([2 * 10**6, 2 * 10**6 + 1], type=pa.int64()),
            "t": pa.array([-5, 2 * 10**9], type=pa.int64()),
            "v": pa.array([1, 2], type=pa.int64())})
        upsert_zonemapped(zdir, delta, "k", "t")
        with open(f"{zdir}/_zonemap.json") as f:
            man = sorted(json.load(f), key=lambda m: m["zmin"])
        for a, b in zip(man, man[1:]):
            assert a["zmax"] <= b["zmin"]


class TestZoneMapMVCC:
    def _layout(self, tmp_path):
        from pymhealth_ray.sources.io import write_zonemapped

        rng = np.random.default_rng(81)
        n = 8_000
        df = pd.DataFrame({
            "k": np.arange(n, dtype=np.int64),
            "t": np.sort(rng.integers(0, 10**9, n)).astype(np.int64),
            "v": rng.integers(0, 100, n).astype(np.int64),
        })
        df = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
        zdir = str(tmp_path / "zm")
        write_zonemapped(ray.data.from_pandas(df).repartition(4),
                         zdir, "t", num_files=12, bloom_cols=["k"])
        return df, zdir

    def _full(self, zdir, version=None):
        from pymhealth_ray.sources.io import read_zonemapped

        ds, _, _ = read_zonemapped(zdir, "t", -10**12, 10**13,
                                   version=version)
        return ds.to_pandas().sort_values("k").reset_index(drop=True)

    def test_time_travel_and_vacuum(self, ray_session, tmp_path):
        from pymhealth_ray.sources.io import (upsert_zonemapped,
                                              vacuum_zonemapped)

        df, zdir = self._layout(tmp_path)
        orig = self._full(zdir)
        delta = pa.Table.from_pandas(
            df.head(25).assign(v=lambda d: d.v + 500),
            preserve_index=False)
        upsert_zonemapped(zdir, delta, "k", "t")
        # current reflects the merge; version 0 is the pre-merge table
        cur = self._full(zdir)
        assert (cur.v.to_numpy() != orig.v.to_numpy()).sum() > 0
        pd.testing.assert_frame_equal(self._full(zdir, version=0), orig)
        # second mutation → version 1 snapshot == state after mutation 1
        delta2 = pa.Table.from_pandas(
            df.tail(10).assign(v=lambda d: d.v + 9), preserve_index=False)
        upsert_zonemapped(zdir, delta2, "k", "t")
        pd.testing.assert_frame_equal(self._full(zdir, version=1), cur)
        pd.testing.assert_frame_equal(self._full(zdir, version=0), orig)
        # vacuum drops history, keeps current readable; version indices
        # RESET (current becomes version 0), higher pins raise
        cur2 = self._full(zdir)
        removed = vacuum_zonemapped(zdir)
        assert removed > 0
        pd.testing.assert_frame_equal(self._full(zdir), cur2)
        pd.testing.assert_frame_equal(self._full(zdir, version=0), cur2)
        with pytest.raises(FileNotFoundError, match="vacuumed"):
            self._full(zdir, version=1)

    def test_delete_prunes_with_blooms(self, ray_session, tmp_path):
        from pymhealth_ray.sources.io import delete_zonemapped

        df, zdir = self._layout(tmp_path)
        # keys clustered in one time band → few candidate files
        band_keys = df[df.t < 10**8].k.head(30).to_numpy()
        n_rw, n_total, n_del = delete_zonemapped(zdir, "k", band_keys)
        assert n_del == len(band_keys)
        assert 0 < n_rw < n_total  # bloom pruned the untouched files
        got = self._full(zdir)
        exp = df[~df.k.isin(band_keys)].sort_values("k") \
            .reset_index(drop=True)[got.columns]
        pd.testing.assert_frame_equal(
            got, exp.astype({c: got[c].dtype for c in got.columns}))
        # deleting absent keys is a no-op that creates NO new version
        from pymhealth_ray.sources.io import _zonemap_versions

        v_before = _zonemap_versions(zdir)
        n_rw2, _, n_del2 = delete_zonemapped(zdir, "k", [10**9])
        assert n_rw2 == 0 and n_del2 == 0
        assert _zonemap_versions(zdir) == v_before

    def test_delete_empties_file_drops_manifest_entry(self, ray_session,
                                                      tmp_path):
        from pymhealth_ray.sources.io import (delete_zonemapped,
                                              zonemap_manifest)

        df, zdir = self._layout(tmp_path)
        man = sorted(zonemap_manifest(zdir), key=lambda m: m["zmin"])
        # wipe every key of the first zone's file
        first = man[0]
        lo_keys = df.sort_values("t").head(first["rows"]).k.to_numpy()
        delete_zonemapped(zdir, "k", lo_keys)
        names = {m["file"] for m in zonemap_manifest(zdir)}
        assert first["file"] not in names
        assert len(names) == len(man) - 1
        got = self._full(zdir)
        assert len(got) == len(df) - len(lo_keys)


class TestChangeFeed:
    def _layout(self, tmp_path):
        from pymhealth_ray.sources.io import write_zonemapped

        rng = np.random.default_rng(93)
        n = 9_000
        df = pd.DataFrame({
            "k": np.arange(n, dtype=np.int64),
            "t": np.sort(rng.integers(0, 10**9, n)).astype(np.int64),
            "v": rng.integers(0, 100, n).astype(np.int64),
        })
        zdir = str(tmp_path / "zcf")
        write_zonemapped(ray.data.from_pandas(df).repartition(6),
                         zdir, "t", num_files=16, bloom_cols=["k"])
        return df, zdir

    def test_feed_matches_bruteforce_and_prunes(self, ray_session,
                                                tmp_path):
        from pymhealth_ray.sources.io import (change_feed_file_sets,
                                              delete_zonemapped,
                                              upsert_zonemapped,
                                              zonemap_change_feed)

        df, zdir = self._layout(tmp_path)
        # mutate a narrow time band only (so most files stay shared)
        band = df[df.t < 10**8]
        upd = band.head(60).copy()
        upd["v"] = upd.v + 1000
        ins = pd.DataFrame({"k": [10**6, 10**6 + 1],
                            "t": [int(band.t.iloc[0]) + 1] * 2,
                            "v": [7, 8]})
        upsert_zonemapped(zdir, pa.Table.from_pandas(
            pd.concat([upd, ins]), preserve_index=False), "k", "t")
        del_keys = band.k.to_numpy()[60:90]
        delete_zonemapped(zdir, "k", del_keys)

        old_only, new_only, shared = change_feed_file_sets(zdir, 0)
        assert shared, "untouched zones must stay shared"
        assert old_only and new_only

        feed = zonemap_change_feed(zdir, "k", 0, compare_cols=["v"])
        got = feed.to_pandas().sort_values("k").reset_index(drop=True)

        # brute force: old snapshot = df; new = upsert+delete applied
        new = df[~df.k.isin(upd.k) & ~df.k.isin(del_keys)]
        new = pd.concat([new, upd[~upd.k.isin(del_keys)], ins],
                        ignore_index=True)
        om = df.set_index("k").v
        nm = new.set_index("k").v
        rows = []
        for k in sorted(set(om.index) | set(nm.index)):
            o = om.get(k)
            nv = nm.get(k)
            if o is None:
                rows.append((k, "insert", np.nan, float(nv)))
            elif nv is None:
                rows.append((k, "delete", float(o), np.nan))
            elif o != nv:
                rows.append((k, "update", float(o), float(nv)))
        exp = pd.DataFrame(rows, columns=["k", "change", "old_v",
                                          "new_v"])
        assert list(got.columns) == ["k", "change", "old_v", "new_v"]
        pd.testing.assert_frame_equal(
            got.astype({"old_v": float, "new_v": float}), exp)

    def test_same_version_feed_is_empty(self, ray_session, tmp_path):
        from pymhealth_ray.sources.io import (upsert_zonemapped,
                                              zonemap_change_feed)

        df, zdir = self._layout(tmp_path)
        upd = df.head(5).copy()
        upd["v"] = upd.v + 1
        upsert_zonemapped(zdir, pa.Table.from_pandas(
            upd, preserve_index=False), "k", "t")
        feed = zonemap_change_feed(zdir, "k", 1, to_version=1,
                                   compare_cols=["v"])
        assert feed.count() == 0


class TestZonemapCrudFuzz:
    """Model-based randomized CRUD sequence over one zonemapped layout:
    after EVERY operation the full-range read must equal a plain dict
    model. Individual op semantics are covered above; this closes the
    compositional gap (upsert-after-delete, compact-mid-history,
    vacuum-then-mutate…)."""

    def test_random_crud_sequence_matches_model(self, ray_session,
                                                tmp_path):
        from pymhealth_ray.sources.io import (compact_zonemapped,
                                              delete_zonemapped,
                                              read_zonemapped,
                                              upsert_zonemapped,
                                              vacuum_zonemapped,
                                              write_zonemapped)

        rng = np.random.default_rng(77)
        n0 = 4000
        t = np.sort(rng.integers(0, 10**9, n0)).astype(np.int64)
        k = rng.permutation(n0).astype(np.int64)
        v = rng.integers(0, 1000, n0).astype(np.int64)
        model = {int(kk): (int(tt), int(vv))
                 for kk, tt, vv in zip(k, t, v)}
        next_key = n0
        zdir = str(tmp_path / "crud")
        df = pd.DataFrame({"t": t, "k": k, "v": v})
        write_zonemapped(ray.data.from_pandas(df).repartition(6), zdir,
                         "t", num_files=8, bloom_cols=["k"])

        def check():
            got, _, _ = read_zonemapped(zdir, "t", 0, 2 * 10**9)
            gdf = got.to_pandas().sort_values("k").reset_index(drop=True)
            exp = pd.DataFrame(
                sorted((kk, tt, vv) for kk, (tt, vv) in model.items()),
                columns=["k", "t", "v"])
            assert len(gdf) == len(exp)
            assert gdf["k"].tolist() == exp["k"].tolist()
            assert gdf["t"].tolist() == exp["t"].tolist()
            assert gdf["v"].tolist() == exp["v"].tolist()

        ops = rng.choice(["upsert", "delete", "compact", "vacuum",
                          "ttl"],
                         size=12, p=[0.35, 0.25, 0.15, 0.1, 0.15])
        for op in ops:
            keys_now = np.array(sorted(model), dtype=np.int64)
            if op == "upsert":
                upd = rng.choice(keys_now, size=min(30, len(keys_now)),
                                 replace=False)
                rows = []
                for kk in upd:  # updates keep the key's event time
                    tt, _ = model[int(kk)]
                    nv = int(rng.integers(0, 1000))
                    model[int(kk)] = (tt, nv)
                    rows.append((tt, int(kk), nv))
                for _ in range(5):  # fresh inserts
                    tt = int(rng.integers(0, 10**9))
                    nv = int(rng.integers(0, 1000))
                    model[next_key] = (tt, nv)
                    rows.append((tt, next_key, nv))
                    next_key += 1
                delta = pa.table({
                    "t": pa.array([r[0] for r in rows],
                                  type=pa.int64()),
                    "k": pa.array([r[1] for r in rows],
                                  type=pa.int64()),
                    "v": pa.array([r[2] for r in rows],
                                  type=pa.int64())})
                upsert_zonemapped(zdir, delta, "k", "t")
            elif op == "delete":
                dels = rng.choice(keys_now, size=min(20, len(keys_now)),
                                  replace=False).tolist()
                dels.append(10**7)  # absent key: must be a no-op
                for kk in dels:
                    model.pop(int(kk), None)
                delete_zonemapped(zdir, "k", dels)
            elif op == "compact":
                compact_zonemapped(zdir, target_files=4)
            elif op == "ttl":
                from pymhealth_ray.sources.io import \
                    delete_zonemapped_range

                ts_now = sorted(tt for tt, _ in model.values())
                if ts_now:
                    # cut a small slice off the old end
                    cutoff = ts_now[max(0, len(ts_now) // 10)]
                    for kk in [kk for kk, (tt, _) in model.items()
                               if tt < cutoff]:
                        del model[kk]
                    delete_zonemapped_range(zdir, "t", cutoff)
            else:
                vacuum_zonemapped(zdir)
            check()
