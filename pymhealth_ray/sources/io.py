"""Parquet read helpers: column pruning + explicit read parallelism.

``read_table`` always passes ``columns=`` (prune at the read — never load
columns a 2-column transform won't touch) and sizes ``override_num_blocks``
to the cluster so downstream shuffles get parallel input even when the
source is a single small file. At 100 TB the file count dominates and the
override becomes unnecessary; locally it is the difference between a
1-task sort and a 2×CPU-way sort.
"""

from __future__ import annotations

import pyarrow as pa
import ray


def default_blocks(min_blocks: int = 8, per_cpu: int = 2, cap: int = 256) -> int:
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(min_blocks, min(cap, per_cpu * cpus))


def _strip_meta(batch):
    # drop pandas schema metadata so downstream table reconstructions keep
    # byte-identical schemas (avoids Ray's per-block schema-dedup warnings)
    return batch.replace_schema_metadata(None)


def read_table(path: str, columns=None, blocks: int | None = None):
    ds = ray.data.read_parquet(
        path,
        columns=columns,
        override_num_blocks=blocks or default_blocks(),
    )
    return ds.map_batches(_strip_meta, batch_format="pyarrow")


def read_table_filtered(path: str, filter_expr, columns=None,
                        blocks: int | None = None):
    """Predicate-pushdown parquet read: ``filter_expr`` is a
    ``pyarrow.dataset`` expression evaluated AT THE SCAN — row groups
    whose statistics exclude the predicate are never decoded, and
    surviving row groups are filtered before any block leaves the read
    task. The 100 TB rule: selectivity belongs in the reader, not in a
    downstream map over rows that already crossed the object store."""
    ds = ray.data.read_parquet(
        path,
        columns=columns,
        filter=filter_expr,
        override_num_blocks=blocks or default_blocks(),
    )
    return ds.map_batches(_strip_meta, batch_format="pyarrow")


def read_jsonl(path: str, columns=None, blocks: int | None = None):
    """Newline-delimited JSON source (the raw-crawl interchange format).

    Ray's JSON datasource has no reader-side projection, so pruning
    happens in the first map (still before any exchange). At 100 TB
    prefer parquet; this reader exists so pipelines can ingest the
    jsonl drops that upstream crawlers produce without a conversion job.
    """
    ds = ray.data.read_json(
        path,
        override_num_blocks=blocks or default_blocks(),
    )

    def prune(batch):
        batch = batch.replace_schema_metadata(None)
        if columns is not None:
            batch = batch.select(columns)
        return batch

    return ds.map_batches(prune, batch_format="pyarrow")


def read_csv(path: str, columns=None, blocks: int | None = None):
    """CSV source (ray.data.read_csv). Like the jsonl reader, CSV has no
    reader-side projection, so pruning happens in the first map — still
    before any exchange. Prefer parquet at 100 TB; this exists so upstream
    CSV drops ingest without a conversion job."""
    ds = ray.data.read_csv(
        path,
        override_num_blocks=blocks or default_blocks(),
    )

    def prune(batch):
        batch = batch.replace_schema_metadata(None)
        if columns is not None:
            batch = batch.select(columns)
        return batch

    return ds.map_batches(prune, batch_format="pyarrow")


def write_partitioned(ds, out_dir: str, partition_col: str):
    """Hive-style partitioned parquet sink: one directory per distinct
    value of ``partition_col`` (``col=value/``). Rows are routed with ONE
    groupby exchange on the partition column; each partition writes its
    own files atomically (tmp + rename), so downstream reads prune by
    directory; for skip-finished-partition resume semantics use
    ``state/lineage.resumable_write``. Returns the partition values."""
    import os

    def write_group(tbl):
        import pyarrow.parquet as pq_mod

        val = tbl[partition_col][0].as_py()
        d = os.path.join(out_dir, f"{partition_col}={val}")
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, "data.parquet.tmp")
        pq_mod.write_table(tbl.drop_columns([partition_col]), tmp)
        os.replace(tmp, os.path.join(d, "data.parquet"))
        return pa.table({partition_col: tbl[partition_col].slice(0, 1)})

    done = ds.groupby(partition_col).map_groups(
        write_group, batch_format="pyarrow").take_all()
    return sorted(r[partition_col] for r in done)


def write_zonemapped(ds, out_dir: str, sort_col: str, num_files: int = 64,
                     bloom_cols: list | None = None,
                     bloom_bits: int = 1 << 14, bloom_k: int = 7):
    """Range-partitioned parquet sink with a ZONE-MAP manifest: rows are
    range-bucketed on ``sort_col`` (equi-width over the observed min/max),
    each bucket writes one file sorted by ``sort_col``, and
    ``_zonemap.json`` records every file's (min, max, rows). The 100 TB
    point is the read side: a range predicate opens only the files whose
    zone overlaps — I/O proportional to selectivity, not corpus size
    (Parquet row-group statistics generalized to the file/manifest level,
    so planning never touches the footers of non-matching files).

    ``bloom_cols`` adds a per-file BLOOM FILTER on each named column to
    the manifest (hex-packed, stages/bloom hashing) — the skipping index
    for POINT lookups on columns the layout is NOT sorted by (the
    Delta/Iceberg bloom-index shape): a user-id equality probe over a
    time-zonemapped events layout opens only the files that may contain
    that user. No false negatives; FP files cost one wasted read.

    Writes are atomic per file (tmp + rename) and the manifest is written
    last, so a partially failed write is invisible to readers."""
    import json as _json
    import os

    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq_mod

    os.makedirs(out_dir, exist_ok=True)
    from pymhealth_ray.stages.aggregate import grouped_stats

    stats = grouped_stats(ds.map_batches(
        lambda b: pa.table({"one": pa.nulls(b.num_rows, pa.int8()).fill_null(0),
                            sort_col: b[sort_col]}),
        batch_format="pyarrow"), ["one"],
        min_cols=[sort_col], max_cols=[sort_col]).take_all()
    if not stats:  # empty input: write an empty (valid) manifest
        with open(os.path.join(out_dir, "_zonemap.json.tmp"), "w") as f:
            _json.dump([], f)
        os.replace(os.path.join(out_dir, "_zonemap.json.tmp"),
                   os.path.join(out_dir, "_zonemap.json"))
        return []
    lo = float(stats[0][f"{sort_col}_min"])
    hi = float(stats[0][f"{sort_col}_max"])
    width = (hi - lo) / num_files if hi > lo else 1.0

    def tag(batch: pa.Table) -> pa.Table:
        v = batch[sort_col].to_numpy(zero_copy_only=False).astype(np.float64)
        f = np.clip(((v - lo) / width).astype(np.int64), 0, num_files - 1)
        return batch.append_column("__zfile", pa.array(f, type=pa.int32()))

    def write_group(tbl: pa.Table) -> pa.Table:
        fid = int(tbl["__zfile"][0].as_py())
        tbl = tbl.drop_columns(["__zfile"])
        tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[(sort_col, "ascending")]))
        name = f"part-{fid:05d}.parquet"
        tmp = os.path.join(out_dir, "." + name + ".tmp")
        pq_mod.write_table(tbl, tmp)
        os.replace(tmp, os.path.join(out_dir, name))
        mn = tbl[sort_col][0].as_py()
        mx = tbl[sort_col][tbl.num_rows - 1].as_py()
        cols = {"file": pa.array([name]),
                "zmin": pa.array([int(mn)], type=pa.int64()),
                "zmax": pa.array([int(mx)], type=pa.int64()),
                "rows": pa.array([tbl.num_rows], type=pa.int64())}
        for c in (bloom_cols or []):
            from pymhealth_ray.stages.bloom import _bitmap_of

            bm = _bitmap_of(tbl[c].combine_chunks()
                            if isinstance(tbl[c], pa.ChunkedArray)
                            else tbl[c], bloom_bits, bloom_k)
            cols[f"bloom__{c}"] = pa.array([bm.tobytes().hex()])
        if bloom_cols:
            cols["bloom_k"] = pa.array([bloom_k], type=pa.int64())
        return pa.table(cols)

    manifest = ds.map_batches(tag, batch_format="pyarrow").groupby(
        "__zfile").map_groups(write_group, batch_format="pyarrow").take_all()
    manifest = sorted(manifest, key=lambda r: r["file"])
    with open(os.path.join(out_dir, "_zonemap.json.tmp"), "w") as f:
        _json.dump(manifest, f)
    os.replace(os.path.join(out_dir, "_zonemap.json.tmp"),
               os.path.join(out_dir, "_zonemap.json"))
    return manifest


def read_zonemapped(out_dir: str, sort_col: str, lo: int, hi: int,
                    columns=None, blocks: int | None = None,
                    version: int | None = None):
    """Range-pruned read of a :func:`write_zonemapped` directory: only
    files whose [zmin, zmax] overlaps [lo, hi] are opened; a vectorized
    residual filter trims the two boundary files. ``version`` pins an
    archived MVCC generation (time travel). Returns (dataset,
    n_files_read, n_files_total) so callers/tests can assert pruning."""
    import os

    import pyarrow.compute as pc

    manifest = zonemap_manifest(out_dir, version)
    hit = [m["file"] for m in manifest
           if not (m["zmax"] < lo or m["zmin"] > hi)]
    if not hit:
        import pyarrow.parquet as pq_mod
        import ray.data as _rd

        # carry the REAL file schema so callers can still project/filter
        # on sort_col; a column-less table breaks them
        if manifest:
            schema = pq_mod.read_schema(
                os.path.join(out_dir, manifest[0]["file"]))
            if columns:
                schema = pa.schema([schema.field(c) for c in columns])
            empty = schema.empty_table()
        else:
            empty = pa.table({})
        return _rd.from_arrow(empty), 0, len(manifest)
    paths = [os.path.join(out_dir, h) for h in hit]
    ds = read_table(paths, columns=columns, blocks=blocks)

    def residual(b: pa.Table) -> pa.Table:
        v = b[sort_col]
        keep = pc.and_(pc.greater_equal(v, pa.scalar(lo)),
                       pc.less_equal(v, pa.scalar(hi)))
        return b.filter(keep)

    return ds.map_batches(residual, batch_format="pyarrow"), len(hit), len(manifest)


def read_zonemapped_point(out_dir: str, col: str, value, columns=None,
                          blocks: int | None = None,
                          version: int | None = None):
    """POINT-lookup read of a bloom-indexed zonemapped directory: only
    files whose per-file bloom on ``col`` MAY contain ``value`` are
    opened (no false negatives — a file the bloom rejects definitely
    lacks the value); an exact equality filter trims bloom false
    positives. Files written without a bloom on ``col`` are always read
    (safe fallback). ``version`` pins an archived MVCC generation.
    Returns (dataset, n_files_read, n_files_total)."""
    import os

    import numpy as np
    import pyarrow.compute as pc

    from pymhealth_ray.stages.bloom import bloom_contains

    manifest = zonemap_manifest(out_dir, version)
    key = f"bloom__{col}"
    probe = pa.array([value])
    hit = []
    for m in manifest:
        hx = m.get(key)
        if hx is None:
            hit.append(m["file"])  # no index → must read
            continue
        bm = np.frombuffer(bytes.fromhex(hx), dtype=np.uint8)
        if bool(bloom_contains(bm, probe, int(m.get("bloom_k", 7)))[0]):
            hit.append(m["file"])
    if not hit:
        import pyarrow.parquet as pq_mod
        import ray.data as _rd

        if manifest:
            schema = pq_mod.read_schema(
                os.path.join(out_dir, manifest[0]["file"]))
            if columns:
                schema = pa.schema([schema.field(c) for c in columns])
            empty = schema.empty_table()
        else:
            empty = pa.table({})
        return _rd.from_arrow(empty), 0, len(manifest)
    ds = read_table([os.path.join(out_dir, h) for h in hit],
                    columns=columns, blocks=blocks)

    def residual(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b[col], pa.scalar(value)))

    return (ds.map_batches(residual, batch_format="pyarrow"),
            len(hit), len(manifest))


def _zonemap_versions(out_dir: str) -> int:
    """Number of ARCHIVED manifest generations (current = this index)."""
    import glob as _glob
    import os

    return len(_glob.glob(os.path.join(out_dir, "_zonemap.v*.json")))


def zonemap_manifest(out_dir: str, version: int | None = None) -> list:
    """Load a layout manifest — current (``version=None``) or a pinned
    historical generation (time travel): mutating ops archive the
    pre-edit manifest as ``_zonemap.v{N}.json`` and keep the data files
    it references, so ``version=K`` reads the layout exactly as it was
    after its K-th mutation epoch (0 = as originally written)."""
    import json as _json
    import os

    if version is None:
        path = os.path.join(out_dir, "_zonemap.json")
    else:
        cur = _zonemap_versions(out_dir)
        if version == cur:
            path = os.path.join(out_dir, "_zonemap.json")
        else:
            path = os.path.join(out_dir, f"_zonemap.v{version}.json")
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"zonemap version {version} not found (current is "
                    f"{cur}; vacuumed history is unrecoverable)")
    with open(path) as f:
        return _json.load(f)


def _archive_and_swap(out_dir: str, old_manifest: list,
                      new_manifest: list) -> int:
    """MVCC commit: archive the pre-edit manifest as the next
    ``_zonemap.v{N}.json``, then atomically swap ``_zonemap.json``.
    Data files the old manifest references are KEPT (readers pinned to
    version N still resolve) until :func:`vacuum_zonemapped`."""
    import json as _json
    import os

    gen = _zonemap_versions(out_dir)
    arch = os.path.join(out_dir, f"_zonemap.v{gen}.json")
    with open(arch + ".tmp", "w") as f:
        _json.dump(old_manifest, f)
    os.replace(arch + ".tmp", arch)
    tmp = os.path.join(out_dir, "_zonemap.json.tmp")
    with open(tmp, "w") as f:
        _json.dump(sorted(new_manifest, key=lambda m: m["file"]), f)
    os.replace(tmp, os.path.join(out_dir, "_zonemap.json"))
    return gen + 1


def _rewritten_name(orig: str, gen: int) -> str:
    import re as _re

    return f"u{gen:03d}-{_re.sub(r'^u[0-9]+-', '', orig)}"


def _recomputed_blooms(m: dict, merged: "pa.Table",
                       bloom_keys: list) -> dict:
    out = {}
    for bk in bloom_keys:
        from pymhealth_ray.stages.bloom import _bitmap_of

        col = bk[len("bloom__"):]
        n_bits = len(bytes.fromhex(m[bk])) * 8
        out[bk] = _bitmap_of(merged[col].combine_chunks(), n_bits,
                             int(m.get("bloom_k", 7))).tobytes().hex()
    return out


def upsert_zonemapped(out_dir: str, delta: "pa.Table", key_col: str,
                      sort_col: str):
    """MERGE (upsert) a delta batch into a zonemapped layout, rewriting
    ONLY the files the delta touches — the Iceberg/Delta copy-on-write
    MERGE shape: at 100 TB a correction batch touching 0.1% of zones
    rewrites 0.1% of the files, not the table. MVCC: rewritten files get
    NEW generation-prefixed names and the pre-edit manifest is archived,
    so concurrent/pinned readers keep a consistent snapshot and
    ``zonemap_manifest(version=K)`` time-travels (until vacuum).

    Semantics: delta rows REPLACE same-``key_col`` rows; new keys
    insert. ``sort_col`` must be immutable per key (the event-time
    layout contract — a correction carries its original timestamp), so
    every replacement lands in the file that holds its old version.
    Delta keys must be unique (raises otherwise). Each touched file is
    rewritten by its own Ray task; per-file blooms are recomputed with
    the entry's own parameters; the manifest swaps LAST, so readers
    never observe a half-merged layout.
    Returns (n_files_rewritten, n_files_total)."""
    import os

    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq_mod
    import ray as _ray

    if isinstance(delta, pa.Table) is False:
        raise TypeError("delta must be a pyarrow Table (driver-sized "
                        "correction batch); stream large deltas in "
                        "several calls")
    keys = delta[key_col].to_numpy(zero_copy_only=False)
    if len(np.unique(keys)) != len(keys):
        raise ValueError("delta keys must be unique per upsert batch")

    manifest = sorted(zonemap_manifest(out_dir), key=lambda m: m["zmin"])
    if not manifest:
        raise ValueError("cannot upsert into an empty layout")
    gen = _zonemap_versions(out_dir) + 1
    zmax = np.array([m["zmax"] for m in manifest], dtype=np.int64)
    sv = delta[sort_col].to_numpy(zero_copy_only=False).astype(np.int64)
    # route each delta row to the first zone whose zmax covers it (rows
    # beyond the last zone append to the last file)
    fidx = np.minimum(np.searchsorted(zmax, sv), len(manifest) - 1)

    bloom_keys = [k for k in manifest[0] if k.startswith("bloom__")]

    @_ray.remote
    def rewrite(i: int, sub: pa.Table) -> dict:
        m = manifest[i]
        base = pq_mod.read_table(os.path.join(out_dir, m["file"]))
        drop = pc.is_in(base[key_col], value_set=sub[key_col].combine_chunks()
                        if isinstance(sub[key_col], pa.ChunkedArray)
                        else sub[key_col])
        kept = base.filter(pc.invert(drop))
        merged = pa.concat_tables([kept, sub.select(base.column_names)])
        merged = merged.take(pc.sort_indices(
            merged, sort_keys=[(sort_col, "ascending")]))
        name = _rewritten_name(m["file"], gen)
        tmp = os.path.join(out_dir, "." + name + ".tmp")
        pq_mod.write_table(merged, tmp)
        os.replace(tmp, os.path.join(out_dir, name))
        out = dict(m)
        out["file"] = name
        out["zmin"] = int(merged[sort_col][0].as_py())
        out["zmax"] = int(merged[sort_col][merged.num_rows - 1].as_py())
        out["rows"] = int(merged.num_rows)
        out.update(_recomputed_blooms(m, merged, bloom_keys))
        return out

    touched = np.unique(fidx)
    reps = _ray.get([
        rewrite.remote(int(i), delta.filter(pa.array(fidx == i)))
        for i in touched])
    new_manifest = list(manifest)
    for i, rep in zip(touched, reps):
        new_manifest[int(i)] = rep
    _archive_and_swap(out_dir, manifest, new_manifest)
    return len(touched), len(manifest)


def delete_zonemapped(out_dir: str, key_col: str, keys):
    """Copy-on-write DELETE by key: candidate files are found through
    each file's bloom on ``key_col`` when present (a file whose bloom
    rejects every key definitely holds none of them — zero reads for the
    untouched 99.9%), rewritten without the matching rows, and committed
    MVCC like :func:`upsert_zonemapped` (archive + swap; a file left
    empty drops out of the manifest). Files without a bloom are scanned.
    Returns (n_files_rewritten, n_files_total, n_rows_deleted)."""
    import os

    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq_mod
    import ray as _ray

    from pymhealth_ray.stages.bloom import bloom_contains

    keys = pa.array(keys) if not isinstance(keys, (pa.Array,
                                                   pa.ChunkedArray)) \
        else keys
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    manifest = sorted(zonemap_manifest(out_dir), key=lambda m: m["zmin"])
    gen = _zonemap_versions(out_dir) + 1
    bk = f"bloom__{key_col}"
    bloom_keys = [k for k in (manifest[0] if manifest else {})
                  if k.startswith("bloom__")]

    cand = []
    for i, m in enumerate(manifest):
        hx = m.get(bk)
        if hx is None:
            cand.append(i)
            continue
        bm = np.frombuffer(bytes.fromhex(hx), dtype=np.uint8)
        if bool(bloom_contains(bm, keys,
                               int(m.get("bloom_k", 7))).any()):
            cand.append(i)

    @_ray.remote
    def rewrite(i: int) -> tuple:
        m = manifest[i]
        base = pq_mod.read_table(os.path.join(out_dir, m["file"]))
        drop = pc.is_in(base[key_col], value_set=keys)
        n_dropped = int(pc.sum(drop.cast(pa.int64())).as_py() or 0)
        if n_dropped == 0:
            return m, 0  # bloom false positive — file untouched
        kept = base.filter(pc.invert(drop))
        if kept.num_rows == 0:
            return None, n_dropped
        name = _rewritten_name(m["file"], gen)
        tmp = os.path.join(out_dir, "." + name + ".tmp")
        pq_mod.write_table(kept, tmp)
        os.replace(tmp, os.path.join(out_dir, name))
        out = dict(m)
        out["file"] = name
        out["rows"] = int(kept.num_rows)
        out.update(_recomputed_blooms(m, kept, bloom_keys))
        return out, n_dropped

    results = _ray.get([rewrite.remote(int(i)) for i in cand])
    n_deleted = sum(r[1] for r in results)
    rewritten = sum(1 for r in results if r[1] > 0)
    if rewritten == 0:
        return 0, len(manifest), 0  # nothing matched: no new version
    new_manifest = list(manifest)
    for i, (rep, nd) in zip(cand, results):
        new_manifest[int(i)] = rep if nd > 0 else manifest[int(i)]
    new_manifest = [m for m in new_manifest if m is not None]
    _archive_and_swap(out_dir, manifest, new_manifest)
    return rewritten, len(manifest), n_deleted


def delete_zonemapped_range(out_dir: str, col: str, cutoff: int):
    """TTL / RETENTION SWEEP — copy-on-write range delete of every row
    with ``col < cutoff``, pruned by the ZONEMAP instead of a bloom:
    files with zmax < cutoff DROP WHOLESALE (no read at all — the
    common case for time-ordered data aging out), files with
    zmin >= cutoff are untouched, only STRADDLERS rewrite. Commits MVCC
    like the other mutations (archive + swap, time travel preserved).
    Returns (n_dropped_files, n_rewritten, n_files_total,
    n_rows_deleted); dropped counts every file REMOVED from the manifest
    (zonemap-pruned wholesale + straddlers the rewrite emptied),
    rewritten counts files replaced by a new version. ``col`` must be
    the zonemapped sort column."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq_mod
    import ray as _ray

    manifest = sorted(zonemap_manifest(out_dir), key=lambda m: m["zmin"])
    gen = _zonemap_versions(out_dir) + 1
    bloom_keys = [k for k in (manifest[0] if manifest else {})
                  if k.startswith("bloom__")]
    drop_idx, rewrite_idx = [], []
    for i, m in enumerate(manifest):
        if int(m["zmax"]) < cutoff:
            drop_idx.append(i)
        elif int(m["zmin"]) < cutoff:
            rewrite_idx.append(i)

    @_ray.remote
    def rewrite(i: int) -> tuple:
        m = manifest[i]
        base = pq_mod.read_table(os.path.join(out_dir, m["file"]))
        keep = pc.greater_equal(base[col], cutoff)
        kept = base.filter(keep)
        nd = base.num_rows - kept.num_rows
        if nd == 0:
            return m, 0
        if kept.num_rows == 0:
            return None, nd
        name = _rewritten_name(m["file"], gen)
        tmp = os.path.join(out_dir, "." + name + ".tmp")
        pq_mod.write_table(kept, tmp)
        os.replace(tmp, os.path.join(out_dir, name))
        out = dict(m)
        out["file"] = name
        out["rows"] = int(kept.num_rows)
        out["zmin"] = int(pc.min(kept[col]).as_py())
        out.update(_recomputed_blooms(m, kept, bloom_keys))
        return out, nd

    results = _ray.get([rewrite.remote(int(i)) for i in rewrite_idx])
    n_deleted = sum(r[1] for r in results)
    n_deleted += sum(int(manifest[i]["rows"]) for i in drop_idx)
    if not drop_idx and all(r[1] == 0 for r in results):
        return 0, 0, len(manifest), 0
    new_manifest = list(manifest)
    for i in drop_idx:
        new_manifest[i] = None
    for i, (rep, nd) in zip(rewrite_idx, results):
        if nd > 0:
            new_manifest[int(i)] = rep
    new_manifest = [m for m in new_manifest if m is not None]
    _archive_and_swap(out_dir, manifest, new_manifest)
    # a straddler whose rewrite kept zero rows left the manifest without
    # a new file: count it as DROPPED, not rewritten — telemetry says
    # 'dropped = files removed', 'rewritten = files with a new version'
    n_emptied = sum(1 for rep, nd in results if nd > 0 and rep is None)
    n_rw = sum(1 for rep, nd in results if nd > 0 and rep is not None)
    return len(drop_idx) + n_emptied, n_rw, len(manifest), n_deleted


def vacuum_zonemapped(out_dir: str) -> int:
    """Reclaim MVCC history: drop every archived manifest generation and
    delete data files only the history references. After vacuum only the
    CURRENT state is readable and version indices RESET — the current
    state becomes version 0; any higher pin raises. Returns the number
    of data files removed."""
    import glob as _glob
    import os

    live = {m["file"] for m in zonemap_manifest(out_dir)}
    removed = 0
    for p in _glob.glob(os.path.join(out_dir, "*.parquet")):
        if os.path.basename(p) not in live:
            try:
                os.remove(p)
                removed += 1
            except OSError:
                pass
    for p in _glob.glob(os.path.join(out_dir, "_zonemap.v*.json")):
        try:
            os.remove(p)
        except OSError:
            pass
    return removed


def compact_zonemapped(out_dir: str, target_files: int):
    """Storage maintenance: merge a :func:`write_zonemapped` directory's
    many small files into ~``target_files`` larger ones WITHOUT a global
    re-sort — zones are disjoint and ordered, so concatenating adjacent
    files in zmin order preserves the sorted-by-zone layout. Each output
    group is merged by an independent Ray task (bounded by group bytes);
    the new manifest is written LAST and old files removed only after it
    lands, so readers never observe a half-compacted directory (crash
    leaves orphan files, never a wrong manifest)."""
    import json as _json
    import os

    import numpy as np
    import pyarrow.parquet as pq_mod
    import ray as _ray

    with open(os.path.join(out_dir, "_zonemap.json")) as f:
        manifest = sorted(_json.load(f), key=lambda m: m["zmin"])
    if len(manifest) <= target_files:
        return manifest
    total = sum(m["rows"] for m in manifest)
    per = max(1, total // target_files)
    groups, cur, acc = [], [], 0
    for m in manifest:
        cur.append(m)
        acc += m["rows"]
        if acc >= per:
            groups.append(cur)
            cur, acc = [], 0
    if cur:
        groups.append(cur)

    # Generation-prefixed output names: re-compacting a directory whose
    # manifest already holds compact-* files must not overwrite inputs that
    # sibling merge tasks haven't read yet (silent data loss), so every
    # compaction writes a FRESH generation namespace.
    import re as _re

    gens = [int(g.group(1)) for m in manifest
            for g in [_re.match(r"compact-g(\d+)-", m["file"])] if g]
    gen = (max(gens) + 1) if gens else 0

    @_ray.remote
    def merge(gidx: int, members: list) -> dict:
        tbl = pa.concat_tables([
            pq_mod.read_table(os.path.join(out_dir, m["file"]))
            for m in members])
        name = f"compact-g{gen:03d}-{gidx:05d}.parquet"
        tmp = os.path.join(out_dir, "." + name + ".tmp")
        pq_mod.write_table(tbl, tmp)
        os.replace(tmp, os.path.join(out_dir, name))
        out = {"file": name,
               "zmin": int(min(m["zmin"] for m in members)),
               "zmax": int(max(m["zmax"] for m in members)),
               "rows": int(tbl.num_rows)}
        # per-file blooms OR together (same bit positions) — carried
        # through compaction only when EVERY member has a same-shape
        # bloom; otherwise the merged file falls back to always-read
        bloom_keys = {k for m in members for k in m
                      if k.startswith("bloom__")}
        for key in bloom_keys:
            if not all(key in m for m in members):
                continue
            bms = [np.frombuffer(bytes.fromhex(m[key]), dtype=np.uint8)
                   for m in members]
            ks = {int(m.get("bloom_k", 7)) for m in members}
            if len({len(b) for b in bms}) == 1 and len(ks) == 1:
                out[key] = np.bitwise_or.reduce(bms).tobytes().hex()
                out["bloom_k"] = ks.pop()
        return out

    new_manifest = _ray.get([merge.remote(i, g) for i, g in enumerate(groups)])
    new_manifest = sorted(new_manifest, key=lambda m: m["zmin"])
    tmp = os.path.join(out_dir, "_zonemap.json.tmp")
    with open(tmp, "w") as f:
        _json.dump(new_manifest, f)
    os.replace(tmp, os.path.join(out_dir, "_zonemap.json"))
    # old files only after the manifest swap — and NEVER a name the new
    # manifest still points at. Compaction is a SPACE op: it also drops
    # the MVCC history (archived generations reference the files being
    # deleted here), like vacuum_zonemapped.
    import glob as _glob

    for p in _glob.glob(os.path.join(out_dir, "_zonemap.v*.json")):
        try:
            os.remove(p)
        except OSError:
            pass
    live = {m["file"] for m in new_manifest}
    for m in manifest:
        if m["file"] not in live:
            try:
                os.remove(os.path.join(out_dir, m["file"]))
            except OSError:
                pass
    return new_manifest


def read_table_evolved(paths, target_schema: "pa.Schema", blocks: int | None = None):
    """Schema-evolution-tolerant parquet read: files written before a
    column existed are read anyway — missing columns fill with typed
    nulls, extra columns drop, and every batch casts to ``target_schema``
    (so a widened int32 → int64 migration reads cleanly). The 100 TB
    reality: a year of ingests never shares one schema; the reader, not a
    rewrite job, absorbs the drift."""
    ds = ray.data.read_parquet(paths, override_num_blocks=blocks or default_blocks())

    def conform(batch: pa.Table) -> pa.Table:
        batch = batch.replace_schema_metadata(None)
        cols = {}
        for field in target_schema:
            if field.name in batch.column_names:
                col = batch[field.name]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                cols[field.name] = col.cast(field.type)
            else:
                cols[field.name] = pa.nulls(batch.num_rows, type=field.type)
        return pa.table(cols)

    return ds.map_batches(conform, batch_format="pyarrow")


def _spread16(v):
    """Spread the low 16 bits of each uint32 to even bit positions."""
    import numpy as np

    v = v.astype(np.uint32)
    v = (v | (v << np.uint32(8))) & np.uint32(0x00FF00FF)
    v = (v | (v << np.uint32(4))) & np.uint32(0x0F0F0F0F)
    v = (v | (v << np.uint32(2))) & np.uint32(0x33333333)
    v = (v | (v << np.uint32(1))) & np.uint32(0x55555555)
    return v


def zorder_key(x, y, x_lo, x_hi, y_lo, y_hi):
    """32-bit Morton code of two int columns normalized to a 16-bit grid
    each — nearby (x, y) points land in nearby keys, so range-bucketing
    the key gives every file a TIGHT bounding box in BOTH dimensions."""
    import numpy as np

    def grid(v, lo, hi):
        span = (hi - lo) if hi > lo else 1
        g = ((v.astype(np.float64) - lo) / span * 65535.0)
        return np.clip(g, 0, 65535).astype(np.uint32)

    with np.errstate(over="ignore"):
        return (_spread16(grid(x, x_lo, x_hi)) |
                (_spread16(grid(y, y_lo, y_hi)) << np.uint32(1))).astype(
            np.int64)


def write_zordered(ds, out_dir: str, col_x: str, col_y: str,
                   num_files: int = 64):
    """Z-ORDER (Morton-interleaved) parquet sink: the 2-D generalization
    of ``write_zonemapped`` — rows are bucketed on the interleaved-bit
    key of (col_x, col_y), each file is written sorted by the key, and
    ``_zordermap.json`` records every file's bounding box in BOTH
    columns. A 2-D box predicate on the read side opens only the files
    whose box overlaps — data skipping on two columns at once, which a
    single-column sort cannot give (sorting by x makes y's per-file
    ranges span the whole domain). Atomic per-file writes; manifest
    written last."""
    import json as _json
    import os

    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq_mod

    os.makedirs(out_dir, exist_ok=True)
    from pymhealth_ray.stages.aggregate import grouped_stats

    stats = grouped_stats(ds.map_batches(
        lambda b: pa.table({
            "one": pa.nulls(b.num_rows, pa.int8()).fill_null(0),
            col_x: b[col_x], col_y: b[col_y]}),
        batch_format="pyarrow"), ["one"],
        min_cols=[col_x, col_y], max_cols=[col_x, col_y]).take_all()
    man_path = os.path.join(out_dir, "_zordermap.json")
    if not stats:
        with open(man_path + ".tmp", "w") as f:
            _json.dump([], f)
        os.replace(man_path + ".tmp", man_path)
        return []
    x_lo, x_hi = int(stats[0][f"{col_x}_min"]), int(stats[0][f"{col_x}_max"])
    y_lo, y_hi = int(stats[0][f"{col_y}_min"]), int(stats[0][f"{col_y}_max"])
    # the grid stretches min→0, max→65535, so keys span ~the full 32-bit
    # domain: equi-width bucketing over it is the 1-D writer's compromise
    width = max((1 << 32) // num_files, 1)

    def tag(batch: pa.Table) -> pa.Table:
        x = batch[col_x].to_numpy(zero_copy_only=False)
        y = batch[col_y].to_numpy(zero_copy_only=False)
        z = zorder_key(x, y, x_lo, x_hi, y_lo, y_hi)
        batch = batch.append_column("__zkey", pa.array(z, type=pa.int64()))
        return batch.append_column(
            "__zfile", pa.array(np.minimum(z // width, num_files - 1)
                                .astype(np.int32)))

    def write_group(tbl: pa.Table) -> pa.Table:
        fid = int(tbl["__zfile"][0].as_py())
        tbl = tbl.take(pc.sort_indices(
            tbl, sort_keys=[("__zkey", "ascending")]))
        tbl = tbl.drop_columns(["__zfile", "__zkey"])
        name = f"part-{fid:05d}.parquet"
        tmp = os.path.join(out_dir, "." + name + ".tmp")
        pq_mod.write_table(tbl, tmp)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({
            "file": pa.array([name]),
            "x_min": pa.array([pc.min(tbl[col_x]).as_py()], type=pa.int64()),
            "x_max": pa.array([pc.max(tbl[col_x]).as_py()], type=pa.int64()),
            "y_min": pa.array([pc.min(tbl[col_y]).as_py()], type=pa.int64()),
            "y_max": pa.array([pc.max(tbl[col_y]).as_py()], type=pa.int64()),
            "rows": pa.array([tbl.num_rows], type=pa.int64()),
        })

    entries = ds.map_batches(tag, batch_format="pyarrow").groupby(
        "__zfile").map_groups(write_group, batch_format="pyarrow").take_all()
    entries = sorted(entries, key=lambda e: e["file"])
    with open(man_path + ".tmp", "w") as f:
        _json.dump(entries, f)
    os.replace(man_path + ".tmp", man_path)
    return entries


def read_zordered(out_dir: str, col_x: str, col_y: str,
                  x_lo: int, x_hi: int, y_lo: int, y_hi: int,
                  columns=None):
    """Read only the z-ordered files whose bounding box overlaps the
    2-D box [x_lo, x_hi] × [y_lo, y_hi] (inclusive), then apply the
    residual row filter. Returns (dataset, files_read, files_total)."""
    import json as _json
    import os

    import pyarrow.compute as pc
    import ray

    with open(os.path.join(out_dir, "_zordermap.json")) as f:
        man = _json.load(f)
    hits = [m for m in man
            if m["x_max"] >= x_lo and m["x_min"] <= x_hi
            and m["y_max"] >= y_lo and m["y_min"] <= y_hi]
    if not hits:
        schema_cols = columns or [col_x, col_y]
        return (ray.data.from_arrow(pa.table(
            {c: pa.array([], type=pa.int64()) for c in schema_cols})),
            0, len(man))
    paths = [os.path.join(out_dir, m["file"]) for m in hits]
    need = columns if columns is None else sorted(
        set(columns) | {col_x, col_y})
    ds = ray.data.read_parquet(paths, columns=need,
                               override_num_blocks=max(len(paths), 8))

    def box(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.greater_equal(b[col_x], x_lo),
                    pc.less_equal(b[col_x], x_hi)),
            pc.and_(pc.greater_equal(b[col_y], y_lo),
                    pc.less_equal(b[col_y], y_hi)))
        out = b.filter(keep)
        return out.select(columns) if columns is not None else out

    return ds.map_batches(box, batch_format="pyarrow"), len(hits), len(man)


def change_feed_file_sets(out_dir: str, from_version: int,
                          to_version: int | None = None):
    """File-level plan for :func:`zonemap_change_feed`: (old_only,
    new_only, shared) file name lists between two manifest versions.
    Copy-on-write mutations give rewritten files NEW generation-prefixed
    names, so a file name present in BOTH manifests is byte-identical —
    its rows cannot have changed and it is pruned from both sides."""
    old_files = [m["file"] for m in zonemap_manifest(out_dir, from_version)]
    new_files = [m["file"] for m in zonemap_manifest(out_dir, to_version)]
    shared = set(old_files) & set(new_files)
    return ([f for f in old_files if f not in shared],
            [f for f in new_files if f not in shared],
            sorted(shared))


def zonemap_change_feed(out_dir: str, key_col: str, from_version: int,
                        to_version: int | None = None,
                        compare_cols: list | None = None,
                        num_buckets: int = 64):
    """CDC CHANGE FEED between two MVCC versions of a zonemapped layout:
    one row per key whose content differs between the snapshots,
    classified ``insert`` / ``delete`` / ``update`` with ``old_<c>`` /
    ``new_<c>`` values for every compared column (NULL on the absent
    side). The Delta/Iceberg ``table_changes`` shape.

    100 TB story: the feed NEVER reads the whole table at either
    version. Files shared by both manifests are pruned up front
    (:func:`change_feed_file_sets` — copy-on-write renames guarantee a
    shared name is byte-identical), so a mutation epoch touching 0.1%
    of zones diffs 0.1% of the files; the surviving rewritten/added/
    removed files still hold mostly-unchanged rows, which fall out as
    ``same`` pairs in ONE co-partitioned full-outer join and are
    dropped. Keys never migrate between shared files (rewrites keep a
    row in the file that held its old version), so pruning loses no
    changes.
    """
    import os

    import numpy as np
    import pyarrow.compute as pc
    import ray

    from pymhealth_ray.stages.join import equi_join

    import pyarrow.parquet as pq_mod

    old_only, new_only, _shared = change_feed_file_sets(
        out_dir, from_version, to_version)
    probe_src = old_only + new_only + _shared
    schema = pq_mod.read_schema(
        os.path.join(out_dir, probe_src[0])) if probe_src else None

    def side(files: list, prefix: str, flag: str):
        cols = compare_cols if compare_cols is not None else \
            [c for c in (schema.names if schema else []) if c != key_col]
        if not files:
            def ftype(c):
                return schema.field(c).type if schema is not None \
                    else pa.int64()
            empty = {key_col: pa.array([], type=ftype(key_col))}
            for c in cols:
                empty[f"{prefix}{c}"] = pa.array([], type=ftype(c))
            empty[flag] = pa.array([], type=pa.int8())
            return ray.data.from_arrow(pa.table(empty)), cols
        ds = ray.data.read_parquet(
            [os.path.join(out_dir, f) for f in files],
            columns=[key_col] + cols,
            override_num_blocks=max(len(files), 8))

        def rename(b: pa.Table) -> pa.Table:
            out = {key_col: b[key_col]}
            for c in cols:
                out[f"{prefix}{c}"] = b[c]
            out[flag] = pa.array(np.ones(b.num_rows, dtype=np.int8))
            return pa.table(out)

        return ds.map_batches(rename, batch_format="pyarrow"), cols

    old_ds, cols = side(old_only, "old_", "in_old")
    new_ds, _ = side(new_only, "new_", "in_new")
    joined = equi_join(old_ds, new_ds, on=key_col,
                       join_type="full outer", num_buckets=num_buckets)

    def classify(b: pa.Table) -> pa.Table:
        # presence via explicit flags, never value NULL-ness (ADVICE r4)
        in_old = pc.fill_null(pc.is_valid(b["in_old"]), False)
        in_new = pc.fill_null(pc.is_valid(b["in_new"]), False)
        same = pa.array(np.ones(b.num_rows, dtype=bool))
        for c in cols:
            a, n = b[f"old_{c}"], b[f"new_{c}"]
            eq = pc.or_(pc.fill_null(pc.equal(a, n), False),
                        pc.and_(pc.is_null(a), pc.is_null(n)))
            same = pc.and_(same, eq)
        change = pc.if_else(
            pc.invert(in_new), pa.scalar("delete"),
            pc.if_else(pc.invert(in_old), pa.scalar("insert"),
                       pa.scalar("update")))
        keep = pc.invert(pc.and_(pc.and_(in_old, in_new), same))
        out = {key_col: b[key_col], "change": change}
        for c in cols:
            out[f"old_{c}"] = b[f"old_{c}"]
            out[f"new_{c}"] = b[f"new_{c}"]
        return pa.table(out).filter(keep)

    return joined.map_batches(classify, batch_format="pyarrow")


def read_ipc(path_or_dir: str, columns=None, blocks: int | None = None):
    """Arrow IPC (feather v2 / .arrow) source: file-parallel ingest via
    ray.data.read_binary_files + a per-task pa.ipc open — each file
    decodes zero-copy into Arrow batches on the worker that read it.
    ``columns`` prunes at decode time (IPC is column-addressable, so
    unneeded columns are never materialized)."""
    import ray

    ds = ray.data.read_binary_files(
        path_or_dir, override_num_blocks=blocks or default_blocks())

    def decode(batch: "pa.Table") -> "pa.Table":
        outs = []
        payloads = batch["bytes"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        for i in range(len(payloads)):
            buf = pa.BufferReader(payloads[i].as_py())
            tbl = pa.ipc.open_file(buf).read_all()
            if columns is not None:
                tbl = tbl.select(columns)
            outs.append(tbl.combine_chunks())
        if not outs:
            return pa.table({})
        return pa.concat_tables(outs)

    return ds.map_batches(decode, batch_format="pyarrow", batch_size=None)


def write_ipc(ds, out_dir: str, num_files: int = 16):
    """Arrow IPC sink: ``num_files`` bucketed .arrow files (one IPC
    file per bucket via map_groups — the resumable-sink layout shape),
    atomic per-file tmp→rename, a _SUCCESS marker last."""
    import os

    import ray  # noqa: F401

    from pymhealth_ray.stages.partition import BUCKET_COL, with_entity_bucket

    os.makedirs(out_dir, exist_ok=True)
    first = ds.schema().names[0]
    bucketed = with_entity_bucket(ds, first, num_files)

    def write_group(tbl: "pa.Table") -> "pa.Table":
        if tbl.num_rows == 0:
            return pa.table({"file": pa.array([], type=pa.string()),
                             "rows": pa.array([], type=pa.int64())})
        b = int(tbl[BUCKET_COL][0].as_py())
        tbl = tbl.drop_columns([BUCKET_COL])
        path = os.path.join(out_dir, f"part-{b:05d}.arrow")
        tmp = path + ".tmp"
        with pa.OSFile(tmp, "wb") as f:
            with pa.ipc.new_file(f, tbl.schema) as w:
                w.write_table(tbl)
        os.replace(tmp, path)
        return pa.table({"file": pa.array([path], type=pa.string()),
                         "rows": pa.array([tbl.num_rows],
                                          type=pa.int64())})

    out = bucketed.groupby(BUCKET_COL).map_groups(
        write_group, batch_format="pyarrow").take_all()
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        f.write("ok")
    return out


def read_orc(path_or_files, columns=None, blocks: int | None = None):
    """ORC source: file-parallel ingest via ray.data.read_binary_files +
    a per-task pyarrow.orc decode — the lake format next to parquet and
    the IPC/.arrow path (read_ipc). ``columns`` prunes at decode time
    (ORC is column-addressable: unread columns never materialize)."""
    import ray

    ds = ray.data.read_binary_files(
        path_or_files, override_num_blocks=blocks or default_blocks())

    def decode(batch: "pa.Table") -> "pa.Table":
        from pyarrow import orc as _orc

        outs = []
        payloads = batch["bytes"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        for i in range(len(payloads)):
            buf = pa.BufferReader(payloads[i].as_py())
            f = _orc.ORCFile(buf)
            tbl = f.read(columns=columns)
            outs.append(tbl.combine_chunks())
        if not outs:
            return pa.table({})
        return pa.concat_tables(outs)

    return ds.map_batches(decode, batch_format="pyarrow", batch_size=None)


def write_orc(ds, out_dir: str, num_files: int = 16):
    """ORC sink: ``num_files`` bucketed .orc files (one per bucket via
    map_groups — the resumable-sink layout shape), atomic per-file
    tmp→rename, a _SUCCESS marker last. Mirrors write_ipc."""
    import os

    from pymhealth_ray.stages.partition import BUCKET_COL, with_entity_bucket

    os.makedirs(out_dir, exist_ok=True)
    first = ds.schema().names[0]
    bucketed = with_entity_bucket(ds, first, num_files)

    def write_group(tbl: "pa.Table") -> "pa.Table":
        from pyarrow import orc as _orc

        if tbl.num_rows == 0:
            return pa.table({"file": pa.array([], type=pa.string()),
                             "rows": pa.array([], type=pa.int64())})
        b = int(tbl[BUCKET_COL][0].as_py())
        tbl = tbl.drop_columns([BUCKET_COL])
        path = os.path.join(out_dir, f"part-{b:05d}.orc")
        tmp = path + ".tmp"
        _orc.write_table(tbl, tmp)
        os.replace(tmp, path)
        return pa.table({"file": pa.array([path], type=pa.string()),
                         "rows": pa.array([tbl.num_rows],
                                          type=pa.int64())})

    out = bucketed.groupby(BUCKET_COL).map_groups(
        write_group, batch_format="pyarrow").take_all()
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        f.write("ok")
    return out
