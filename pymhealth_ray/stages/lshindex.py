"""Persistent MinHash-LSH index: build ONCE over the standing corpus,
then dedup every incremental ingest batch against it WITHOUT touching the
corpus again — the 100 TB dedup-maintenance story (the content-ledger in
stages/dedup.py answers "exact duplicate?"; this answers "NEAR duplicate
of anything already indexed?").

Layout under ``index_dir``:
  bands/part=NNN/*.parquet   (band_key:int64, doc_id:int64) — hash-
                             partitioned on band_key so a probe batch
                             reads ONLY the partitions its own band keys
                             hash into (small ingests touch few files);
  sigs/part=NNN/*.parquet    (doc_id:int64, minhash fixed list) — hash-
                             partitioned on doc_id so candidate
                             verification reads only partitions holding
                             candidate ids;
  _lsh_index.json            params manifest (hash family seed/shape) —
                             probes refuse an index built with different
                             parameters instead of silently mismatching.

Build is one signature scan + one partitioned write per layout; probe is
map-only signatures + a PRUNED read + one join per layout. Nothing about
the standing corpus is recomputed at ingest time.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from pymhealth_ray.stages.dedup import (
    _band_keys_vec,
    _cached_minhasher,
)

_MANIFEST = "_lsh_index.json"


def _band_part(keys: np.ndarray, n_parts: int) -> np.ndarray:
    return (keys.astype(np.uint64) % np.uint64(n_parts)).astype(np.int64)


def _id_part(ids: np.ndarray, n_parts: int) -> np.ndarray:
    # splitmix-style spread so sequential ids don't skew partitions
    from pymhealth_ray.stages.sketch import _splitmix64

    return (_splitmix64(ids.astype(np.int64).view(np.uint64))
            % np.uint64(n_parts)).astype(np.int64)


def _sig_matrix(batch: pa.Table) -> np.ndarray:
    col = batch["minhash"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    width = col.type.list_size
    if batch.num_rows == 0:  # reshape(0, -1) raises in numpy
        return np.empty((0, width), dtype=np.uint64)
    return col.values.to_numpy(zero_copy_only=False).reshape(
        batch.num_rows, width).astype(np.uint64)


def lsh_index_write(docs, index_dir: str, *, text_col: str = "text",
                    id_col: str = "doc_id", num_hashes: int = 64,
                    bands: int = 16, shingle_k: int = 5,
                    n_parts: int = 16) -> dict:
    """Build the persistent index over ``docs``. Returns the manifest."""
    from pymhealth_ray.sources.io import write_partitioned

    rpb = num_hashes // bands

    def sigify(batch: pa.Table) -> pa.Table:
        out = _cached_minhasher(text_col, num_hashes, shingle_k)(batch)
        return pa.table({id_col: out[id_col].cast(pa.int64()),
                         "minhash": out["minhash"]})

    sigs = docs.map_batches(sigify, batch_format="pyarrow",
                            batch_size=None).materialize()

    def explode(batch: pa.Table) -> pa.Table:
        sig = _sig_matrix(batch)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        ks, ds_ = [], []
        for b in range(bands):
            ks.append(_band_keys_vec(sig, b, rpb).astype(np.int64))
            ds_.append(ids)
        k = np.concatenate(ks) if ks else np.empty(0, np.int64)
        d = np.concatenate(ds_) if ds_ else np.empty(0, np.int64)
        return pa.table({
            "band_key": pa.array(k),
            id_col: pa.array(d),
            "part": pa.array(_band_part(k, n_parts), type=pa.int64()),
        })

    write_partitioned(sigs.map_batches(explode, batch_format="pyarrow",
                                       batch_size=None),
                      os.path.join(index_dir, "bands"), "part")

    def sig_part(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array(_id_part(ids, n_parts), type=pa.int64()))

    write_partitioned(sigs.map_batches(sig_part, batch_format="pyarrow",
                                       batch_size=None),
                      os.path.join(index_dir, "sigs"), "part")
    manifest = {"num_hashes": num_hashes, "bands": bands,
                "shingle_k": shingle_k, "n_parts": n_parts,
                "id_col": id_col}
    tmp = os.path.join(index_dir, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(index_dir, _MANIFEST))
    return manifest


def lsh_index_append(new_docs, index_dir: str, *, text_col: str = "text",
                     id_col: str = "doc_id", ingest_tag: str = "a") -> int:
    """Index MAINTENANCE: fold an ingest batch into the standing index —
    signatures computed once, band/sig rows appended as NEW FILES inside
    the existing hash partitions (append-only; no rewrite of standing
    data). Idempotent per ``ingest_tag``: re-running the same tag is a
    no-op, so a failed ingest can simply re-run. Returns rows appended
    (0 when the tag already landed)."""
    import pyarrow.parquet as pq_mod
    import ray

    with open(os.path.join(index_dir, _MANIFEST)) as f:
        m = json.load(f)
    bands, rpb = m["bands"], m["num_hashes"] // m["bands"]
    n_parts = m["n_parts"]
    marker = os.path.join(index_dir, f"_ingest_{ingest_tag}.json")
    if os.path.exists(marker):
        return 0

    def sigify(batch: pa.Table) -> pa.Table:
        out = _cached_minhasher(text_col, m["num_hashes"],
                                m["shingle_k"])(batch)
        return pa.table({id_col: out[id_col].cast(pa.int64()),
                         "minhash": out["minhash"]})

    arefs = ray.get(new_docs.map_batches(
        sigify, batch_format="pyarrow", batch_size=None).to_arrow_refs())
    sigs = pa.concat_tables(arefs) if arefs else pa.table(
        {id_col: pa.array([], type=pa.int64()),
         "minhash": pa.array([], type=pa.list_(pa.int64(),
                                               m["num_hashes"]))})
    ids = sigs[id_col].to_numpy(zero_copy_only=False)
    sig = _sig_matrix(sigs)
    # band rows grouped per destination partition, one new file each
    ks = [_band_keys_vec(sig, b, rpb).astype(np.int64) for b in range(bands)]
    k = np.concatenate(ks) if ks else np.empty(0, np.int64)
    d = np.concatenate([ids] * bands) if bands and len(ids) else \
        np.empty(0, np.int64)
    bp = _band_part(k, n_parts)
    for p in np.unique(bp):
        sel = bp == p
        pdir = os.path.join(index_dir, "bands", f"part={int(p)}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, f".ingest-{ingest_tag}.parquet.tmp")
        pq_mod.write_table(pa.table({"band_key": pa.array(k[sel]),
                                     id_col: pa.array(d[sel])}), tmp)
        os.replace(tmp, os.path.join(pdir, f"ingest-{ingest_tag}.parquet"))
    sp = _id_part(ids, n_parts)
    for p in np.unique(sp):
        sel = sp == p
        pdir = os.path.join(index_dir, "sigs", f"part={int(p)}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, f".ingest-{ingest_tag}.parquet.tmp")
        pq_mod.write_table(
            sigs.filter(pa.array(sel)).select([id_col, "minhash"]), tmp)
        os.replace(tmp, os.path.join(pdir, f"ingest-{ingest_tag}.parquet"))
    with open(marker + ".tmp", "w") as f:
        json.dump({"rows": int(len(ids))}, f)
    os.replace(marker + ".tmp", marker)
    return int(len(ids))


def _part_paths(root: str, parts) -> list:
    out = []
    for p in sorted(set(int(x) for x in parts)):
        d = os.path.join(root, f"part={p}")
        if os.path.isdir(d):
            out.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                       if f.endswith(".parquet"))
    return out


def lsh_index_probe(new_docs, index_dir: str, *, text_col: str = "text",
                    id_col: str = "doc_id",
                    jaccard_threshold: float = 0.5,
                    max_candidates_per_doc: int = 4096) -> pa.Table:
    """Near-dup pairs (new_id, old_id, est_jaccard) of an ingest batch
    against the standing index. Reads ONLY the band partitions the batch's
    own band keys hash into and the sig partitions holding candidate ids.
    Returns a driver-sized pyarrow Table (pairs of one ingest batch)."""
    import pyarrow.parquet as pq_mod
    import ray

    with open(os.path.join(index_dir, _MANIFEST)) as f:
        m = json.load(f)
    bands, rpb = m["bands"], m["num_hashes"] // m["bands"]
    n_parts = m["n_parts"]

    def sigify(batch: pa.Table) -> pa.Table:
        out = _cached_minhasher(text_col, m["num_hashes"],
                                m["shingle_k"])(batch)
        return pa.table({id_col: out[id_col].cast(pa.int64()),
                         "minhash": out["minhash"]})

    refs = ray.get(new_docs.map_batches(
        sigify, batch_format="pyarrow", batch_size=None).to_arrow_refs())
    new_sigs_tbl = pa.concat_tables(refs) if refs else pa.table(
        {id_col: pa.array([], type=pa.int64()),
         "minhash": pa.array([], type=pa.list_(pa.int64(),
                                               m["num_hashes"]))})
    new_sig = _sig_matrix(new_sigs_tbl)
    new_ids = new_sigs_tbl[id_col].to_numpy(zero_copy_only=False)
    nb_keys = [
        _band_keys_vec(new_sig, b, rpb).astype(np.int64)
        for b in range(bands)
    ] if len(new_ids) else []
    all_new_keys = np.unique(np.concatenate(nb_keys)) if nb_keys else \
        np.empty(0, np.int64)

    # PRUNED band read: only partitions any probe key hashes into
    band_paths = _part_paths(os.path.join(index_dir, "bands"),
                             _band_part(all_new_keys, n_parts))
    cands: dict = {}
    if band_paths:
        from pymhealth_ray.sources.io import read_table

        def match(batch: pa.Table) -> pa.Table:
            bk = batch["band_key"].to_numpy(zero_copy_only=False)
            oid = batch[id_col].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(all_new_keys, bk)
            posc = np.minimum(pos, max(len(all_new_keys) - 1, 0))
            hit = (all_new_keys[posc] == bk) if len(all_new_keys) else \
                np.zeros(len(bk), dtype=bool)
            return pa.table({"band_key": pa.array(bk[hit]),
                             "old_id": pa.array(oid[hit])})

        hits = pa.concat_tables(ray.get(
            read_table(band_paths, columns=["band_key", id_col])
            .map_batches(match, batch_format="pyarrow",
                         batch_size=None).to_arrow_refs()))
        # band_key -> new ids with that key (per band), joined driver-side:
        # the hit set is ingest-batch-sized by construction
        key_to_new: dict = {}
        for b in range(bands):
            for k, nid in zip(nb_keys[b].tolist(), new_ids.tolist()):
                key_to_new.setdefault(k, set()).add(nid)
        for k, oid in zip(hits["band_key"].to_pylist(),
                          hits["old_id"].to_pylist()):
            for nid in key_to_new.get(k, ()):
                cands.setdefault(int(nid), set()).add(int(oid))

    # degenerate-band guard: a boilerplate band key shared by much of the
    # standing corpus would otherwise make one probe doc pull corpus-sized
    # candidates; cap per doc (sorted-id truncation, logged) — the same
    # contract as minhash_lsh_dupes' max_bucket_size
    for nid, s in cands.items():
        if len(s) > max_candidates_per_doc:
            import logging

            logging.getLogger(__name__).warning(
                "lsh_index_probe: doc %s hit %d candidates; capping at %d",
                nid, len(s), max_candidates_per_doc)
            cands[nid] = set(sorted(s)[:max_candidates_per_doc])

    # verification: PRUNED sig read of only candidate-id partitions
    all_old = sorted({o for s in cands.values() for o in s})
    rows = {"new_id": [], "old_id": [], "est_jaccard": []}
    if all_old:
        sig_paths = _part_paths(
            os.path.join(index_dir, "sigs"),
            _id_part(np.asarray(all_old, dtype=np.int64), n_parts))
        old_tbl = pa.concat_tables(
            [pq_mod.read_table(p, columns=[id_col, "minhash"])
             for p in sig_paths])
        old_ids = old_tbl[id_col].to_numpy(zero_copy_only=False)
        old_sig = _sig_matrix(old_tbl)
        pos_of = {int(i): j for j, i in enumerate(old_ids)}
        new_pos = {int(i): j for j, i in enumerate(new_ids)}
        for nid in sorted(cands):
            for oid in sorted(cands[nid]):
                if oid not in pos_of:
                    continue
                est = float((new_sig[new_pos[nid]]
                             == old_sig[pos_of[oid]]).mean())
                if est >= jaccard_threshold:
                    rows["new_id"].append(nid)
                    rows["old_id"].append(oid)
                    rows["est_jaccard"].append(round(est, 4))
    return pa.table({
        "new_id": pa.array(rows["new_id"], type=pa.int64()),
        "old_id": pa.array(rows["old_id"], type=pa.int64()),
        "est_jaccard": pa.array(rows["est_jaccard"], type=pa.float64()),
    })
