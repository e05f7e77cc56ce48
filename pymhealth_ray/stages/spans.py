"""Repeated token-span detection — ExactSubstr-style dedup signal at the
token level ("Deduplicating Training Data Makes Language Models Better",
Lee et al. 2022, adapted to fixed-length spans).

A span is an L=5 token window packed EXACTLY into one int64
(``Σ tok_j · K^j``, K=2048 > max token ⇒ collision-free, no hashing
uncertainty). Any span occurring ≥2 times anywhere in the corpus
(cross- or intra-document) is "duplicated"; each row reports how many of
its windows are duplicated and what fraction of its token positions a
duplicated span covers — the mask a curation pipeline would cut.

Two physical plans, auto-selected by the size of the duplicated-span set
(the set itself is computed distributed either way: window packing →
``keyed_sum`` count per span, no key sort; the filtered set is
``materialize()``-d into the CLUSTER object store — spill-backed, never a
driver list):

- **small set (≤ broadcast_threshold keys)**: broadcast the sorted key
  array (``ray.put`` once) and score map-only with searchsorted — one
  exchange total, the hot-set-broadcast shape shared with boilerplate
  removal (stages/linededup.py).
- **large set**: no driver materialization anywhere. A fixed-size
  mergeable Bloom filter over the set (stages/bloom.py — bounded bits
  regardless of set size) is broadcast as a PREFILTER with no false
  negatives; surviving candidate windows (true dups + the small FP
  fraction) take a slim (key:int64, id, start:int64) co-partitioned
  exchange against the set for EXACT membership, and a second slim
  exchange re-groups dup windows with per-row geometry (id, len) to
  rebuild counts and coverage. Results are bit-identical to the
  broadcast plan; only exchange shape differs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

L = 5

# keys above this count take the distributed semi-join plan instead of a
# driver-collected broadcast (8 bytes/key -> ~32 MB broadcast at the cap).
BROADCAST_THRESHOLD = 4_000_000


def _flat_windows(col: pa.ListArray, key_mult: int):
    """(keys, starts_global, lens, offs) — packed int64 keys of every
    within-row window of length L, plus row geometry."""
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.int64)
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    offs = np.concatenate(([0], np.cumsum(lens)))
    pos = np.arange(len(flat), dtype=np.int64)
    local = pos - np.repeat(offs[:-1], lens)
    ok = local <= np.repeat(lens - L, lens)
    starts = np.flatnonzero(ok)
    keys = np.zeros(len(starts), dtype=np.int64)
    mult = np.int64(1)
    for j in range(L):
        keys += flat[starts + j] * mult
        mult *= key_mult
    return keys, starts, lens, offs


def _window_rows(col: pa.ListArray, key_mult: int):
    """(keys, rowidx, local_start, lens) — per-window row index and
    within-row start position (the explode geometry both plans share)."""
    keys, starts, lens, offs = _flat_windows(col, key_mult)
    n_windows = np.maximum(lens - L + 1, 0)
    rowidx = np.repeat(np.arange(len(lens), dtype=np.int64), n_windows)
    local = starts - np.repeat(offs[:-1], n_windows)
    return keys, rowidx, local, lens


def span_counts(ds, tokens_col: str = "tokens", key_mult: int = 2048):
    """Dataset of (key, c): exact corpus-wide occurrence count per packed
    span key."""
    from pymhealth_ray.stages.aggregate import keyed_sum

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        keys, _, _, _ = _flat_windows(col, key_mult)
        vals, cnts = np.unique(keys, return_counts=True)
        return pa.table({"key": pa.array(vals),
                         "c": pa.array(cnts.astype(np.int64))})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
    # span keys are mostly singletons: the big-coalesce pre-combine can't
    # shrink them and only serializes the scan (8.3 s vs 4.2 s measured on
    # the 10.8M-key trigram domain) — disable it
    return keyed_sum(partials, "key", ["c"], num_buckets=256,
                     precombine_rows=None)


def _member(sorted_arr: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Membership of keys in a SORTED array (bool per key)."""
    if not len(sorted_arr) or not len(keys):
        return np.zeros(len(keys), dtype=bool)
    idx = np.searchsorted(sorted_arr, keys)
    ok = idx < len(sorted_arr)
    ok[ok] = sorted_arr[idx[ok]] == keys[ok]
    return ok


def _collect_int64(ds, col: str) -> np.ndarray:
    """Sorted int64 values of a (small, pre-thresholded) column."""
    parts = [b[col].to_numpy(zero_copy_only=False)
             for b in ds.iter_batches(batch_format="pyarrow")]
    return np.sort(np.concatenate(parts)) if parts else np.empty(0, np.int64)


def _encode_pairs(tbl: pa.Table, id_cols) -> np.ndarray:
    """1-D int64 composite code per row — dictionary codes per id column
    packed positionally (shared across the whole table, so equal id
    tuples get equal codes). 1-D packing matters: ``np.unique(axis=0)``
    on millions of window rows is a structured sort ~20× slower than the
    flat int64 path."""
    packed = np.zeros(tbl.num_rows, dtype=np.int64)
    for c in id_cols:
        col = tbl[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        enc = col.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        packed = packed * np.int64(len(enc.dictionary) + 1) + codes
    return packed


def _dup_window_rows(ds, set_ds, tokens_col, id_cols, key_mult,
                     extra_set_cols=(), bloom_bits=1 << 23,
                     num_key_buckets: int = 64):
    """Distributed exact semi-join of every token window against a span-key
    set: returns a slim Dataset of (id_cols..., __start, extra_set_cols...)
    — one row per window whose key is in ``set_ds.key``.

    Bloom prefilter (broadcast, fixed bits, no false negatives) drops
    definite non-members map-side so the key-bucket exchange carries only
    true dups + the FP fraction; per-bucket sorted searchsorted gives exact
    membership. Nothing data-dependent ever lands on the driver.
    """
    import ray

    from pymhealth_ray.stages.bloom import bloom_contains, build_bloom
    from pymhealth_ray.stages.partition import _stable_bucket_of

    extra_set_cols = list(extra_set_cols)
    bloom_ref = ray.put(build_bloom(set_ds, "key", n_bits=bloom_bits))
    BKT, TAG, START = "__spanbkt", "__spanside", "__start"

    def wcand(batch: pa.Table) -> pa.Table:
        col = batch[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        keys, rowidx, local, _ = _window_rows(col, key_mult)
        hit = bloom_contains(ray.get(bloom_ref), pa.array(keys))
        keys, rowidx, local = keys[hit], rowidx[hit], local[hit]
        cols = {"key": pa.array(keys)}
        take = pa.array(rowidx)
        for c in id_cols:
            cols[c] = batch[c].take(take)
        cols[START] = pa.array(local)
        for c in extra_set_cols:
            cols[c] = pa.nulls(len(keys), type=pa.int8())
        out = pa.table(cols)
        out = out.append_column(TAG, pa.array(
            np.zeros(len(keys), dtype=np.int8)))
        return out.append_column(BKT, pa.array(
            _stable_bucket_of(out["key"], num_key_buckets), type=pa.int32()))

    sch = ds.schema()
    id_schema = [(c, sch.base_schema.field(c).type) for c in id_cols]

    def dside(batch: pa.Table) -> pa.Table:
        cols = {"key": batch["key"]}
        for c, typ in id_schema:
            cols[c] = pa.nulls(batch.num_rows, type=typ)
        cols[START] = pa.nulls(batch.num_rows, type=pa.int64())
        for c in extra_set_cols:
            cols[c] = batch[c].cast(pa.int8())
        out = pa.table(cols)
        out = out.append_column(TAG, pa.array(
            np.ones(batch.num_rows, dtype=np.int8)))
        return out.append_column(BKT, pa.array(
            _stable_bucket_of(out["key"], num_key_buckets), type=pa.int32()))

    w = ds.map_batches(wcand, batch_format="pyarrow")
    d = set_ds.map_batches(dside, batch_format="pyarrow", batch_size=None)

    def per_bucket(tbl: pa.Table) -> pa.Table:
        side = tbl[TAG]
        if isinstance(side, pa.ChunkedArray):
            side = side.combine_chunks()
        s = side.to_numpy(zero_copy_only=False)
        dm = s == 1
        dpart = tbl.filter(pa.array(dm))
        dkeys = dpart["key"].to_numpy(zero_copy_only=False)
        order = np.argsort(dkeys, kind="stable")
        dkeys_sorted = dkeys[order]
        wpart = tbl.filter(pa.array(~dm))
        wkeys = wpart["key"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(dkeys_sorted, wkeys)
        hit = idx < len(dkeys_sorted)
        hit[hit] = dkeys_sorted[idx[hit]] == wkeys[hit]
        out = wpart.filter(pa.array(hit))
        keep = list(id_cols) + [START]
        if extra_set_cols:
            # graft the set-side attribute columns onto matched windows
            pos = order[idx[hit]]
            cols = {c: out[c] for c in keep}
            for c in extra_set_cols:
                vals = dpart[c].combine_chunks() if isinstance(
                    dpart[c], pa.ChunkedArray) else dpart[c]
                cols[c] = vals.take(pa.array(pos))
            return pa.table(cols)
        return out.select(keep)

    return w.union(d).groupby(BKT).map_groups(
        per_bucket, batch_format="pyarrow")


def _scored_from_windows(ds, dupwin, tokens_col, id_cols, score_bucket_fn,
                         extra_cols=(), num_row_buckets: int = 64):
    """Second slim exchange: co-partition per-row geometry (id_cols, len)
    with the dup-window rows on hash(id_cols[0]) and rebuild per-row stats
    vectorized inside each bucket. ``extra_cols``: (name, type) window
    attribute columns riding along from the set side.
    ``score_bucket_fn(n_u, invR, invW, startW, lensR, id_tbl, wtbl)``
    returns the per-bucket output table."""
    from pymhealth_ray.stages.partition import _stable_bucket_of

    BKT, TAG, START = "__rowbkt", "__rowside", "__start"
    extra_cols = list(extra_cols)

    def geom_pad(batch: pa.Table) -> pa.Table:
        col = batch[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = pc.list_value_length(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        cols = {c: batch[c] for c in id_cols}
        cols["__len"] = pa.array(lens)
        cols[START] = pa.nulls(batch.num_rows, type=pa.int64())
        for c, typ in extra_cols:
            cols[c] = pa.nulls(batch.num_rows, type=typ)
        out = pa.table(cols)
        out = out.append_column(TAG, pa.array(
            np.zeros(batch.num_rows, dtype=np.int8)))
        return out.append_column(BKT, pa.array(
            _stable_bucket_of(out[id_cols[0]], num_row_buckets),
            type=pa.int32()))

    def w_bkt(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in id_cols}
        cols["__len"] = pa.nulls(batch.num_rows, type=pa.int64())
        cols[START] = batch[START]
        for c, typ in extra_cols:
            cols[c] = batch[c].cast(typ)
        out = pa.table(cols)
        out = out.append_column(TAG, pa.array(
            np.ones(batch.num_rows, dtype=np.int8)))
        return out.append_column(BKT, pa.array(
            _stable_bucket_of(out[id_cols[0]], num_row_buckets),
            type=pa.int32()))

    r = ds.map_batches(geom_pad, batch_format="pyarrow")
    w = dupwin.map_batches(w_bkt, batch_format="pyarrow")

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl = tbl.drop_columns([BKT])
        side = tbl[TAG]
        if isinstance(side, pa.ChunkedArray):
            side = side.combine_chunks()
        s = side.to_numpy(zero_copy_only=False)
        rm = s == 0
        rtbl = tbl.filter(pa.array(rm))
        wtbl = tbl.filter(pa.array(~rm))
        pairs = _encode_pairs(tbl, id_cols)
        pR, pW = pairs[rm], pairs[~rm]
        allp = np.concatenate([pR, pW]) if len(pW) else pR
        _, inv = np.unique(allp, return_inverse=True)
        invR, invW = inv[:len(pR)], inv[len(pR):]
        lensR = rtbl["__len"].to_numpy(zero_copy_only=False).astype(np.int64)
        startW = (wtbl[START].to_numpy(zero_copy_only=False).astype(np.int64)
                  if wtbl.num_rows else np.empty(0, np.int64))
        n_u = int(inv.max()) + 1 if len(inv) else 0
        return score_bucket_fn(n_u, invR, invW, startW, lensR,
                               rtbl.select(list(id_cols)), wtbl)

    return r.union(w).groupby(BKT).map_groups(
        per_bucket, batch_format="pyarrow")


def _coverage_per_group(n_u, invW, startW):
    """Union length of [start, start+L) per group — sort by (group, start);
    equal-length intervals mean the running union grows by
    min(L, start_i - start_{i-1}) within a group."""
    cov = np.zeros(n_u, dtype=np.int64)
    if len(invW):
        order = np.lexsort((startW, invW))
        g, st = invW[order], startW[order]
        first = np.ones(len(g), dtype=bool)
        first[1:] = g[1:] != g[:-1]
        gap = np.full(len(g), L, dtype=np.int64)
        nf = np.flatnonzero(~first)
        gap[nf] = np.minimum(L, st[nf] - st[nf - 1])
        cov = np.bincount(g, weights=gap, minlength=n_u).astype(np.int64)
    return cov


def _dup_set_ds(ds, tokens_col, key_mult, min_occurrences):
    """Materialized Dataset of duplicated span keys (cluster-resident,
    spill-backed — the only full-set storage either plan needs)."""
    counts = span_counts(ds, tokens_col, key_mult)

    def dup_only(batch: pa.Table) -> pa.Table:
        c = batch["c"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(c >= min_occurrences)).select(["key"])

    return counts.map_batches(dup_only, batch_format="pyarrow",
                              batch_size=None).materialize()


def repeated_span_stats(ds, tokens_col: str = "tokens",
                        id_cols=("doc_id", "ts_ns"), key_mult: int = 2048,
                        min_occurrences: int = 2,
                        broadcast_threshold: int = BROADCAST_THRESHOLD,
                        bloom_bits: int = 1 << 23):
    """Per row: n_windows, n_dup (windows whose span occurs ≥
    ``min_occurrences`` corpus-wide) and frac_cov (fraction of token
    positions covered by ≥1 duplicated span).

    ``id_cols`` must uniquely identify rows (the distributed plan groups by
    them). Plan selection: exact broadcast while the duplicated-span set
    fits ``broadcast_threshold`` keys; above that, the bloom-prefiltered
    co-partitioned semi-join (module docstring) — identical output."""
    import ray

    dup_ds = _dup_set_ds(ds, tokens_col, key_mult, min_occurrences)
    if dup_ds.count() > broadcast_threshold:
        return _repeated_span_stats_distributed(
            ds, dup_ds, tokens_col, id_cols, key_mult, bloom_bits)

    dup_keys = _collect_int64(dup_ds, "key")
    dup_ref = ray.put(dup_keys)

    def score(batch: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        col = batch[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        keys, starts, lens, offs = _flat_windows(col, key_mult)
        isdup = _member(dup, keys)
        n_windows = np.maximum(lens - L + 1, 0)
        woffs = np.concatenate(([0], np.cumsum(n_windows)))
        n_dup = np.zeros(len(lens), dtype=np.int64)
        nz = n_windows > 0
        if nz.any() and len(isdup):
            n_dup[nz] = np.add.reduceat(isdup.astype(np.int64),
                                        woffs[:-1][nz])
        # coverage: union of [start, start+L) for duplicated windows
        total = int(offs[-1])
        ds_ = starts[isdup]
        delta = (np.bincount(ds_, minlength=total + 1)
                 - np.bincount(ds_ + L, minlength=total + 1))
        covered = (np.cumsum(delta[:-1]) > 0).astype(np.int64)
        cov = np.zeros(len(lens), dtype=np.int64)
        rnz = lens > 0
        if rnz.any():
            cov[rnz] = np.add.reduceat(covered, offs[:-1][rnz])
        with np.errstate(invalid="ignore", divide="ignore"):
            frac = cov.astype(np.float64) / lens
        cols = {c: batch[c] for c in id_cols}
        cols["n_windows"] = pa.array(n_windows)
        cols["n_dup"] = pa.array(n_dup)
        cols["frac_cov"] = pa.array(np.where(rnz, frac, 0.0),
                                    type=pa.float64(), mask=~rnz)
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow")


def _repeated_span_stats_distributed(ds, dup_ds, tokens_col, id_cols,
                                     key_mult, bloom_bits):
    dupwin = _dup_window_rows(ds, dup_ds, tokens_col, id_cols, key_mult,
                              bloom_bits=bloom_bits)

    def score_bucket(n_u, invR, invW, startW, lensR, id_tbl, _wtbl):
        n_dup_u = np.bincount(invW, minlength=n_u).astype(np.int64)
        cov_u = _coverage_per_group(n_u, invW, startW)
        n_windows = np.maximum(lensR - L + 1, 0)
        n_dup = n_dup_u[invR]
        cov = cov_u[invR]
        rnz = lensR > 0
        with np.errstate(invalid="ignore", divide="ignore"):
            frac = cov.astype(np.float64) / lensR
        cols = {c: id_tbl[c] for c in id_tbl.column_names}
        cols["n_windows"] = pa.array(n_windows)
        cols["n_dup"] = pa.array(n_dup)
        cols["frac_cov"] = pa.array(np.where(rnz, frac, 0.0),
                                    type=pa.float64(), mask=~rnz)
        return pa.table(cols)

    return _scored_from_windows(ds, dupwin, tokens_col, id_cols,
                                score_bucket, extra_cols=[])


def _flagged_set_ds(ds, tokens_col, entity_col, key_mult):
    """Materialized Dataset (key, flag) over spans worth marking:
    flag=1 cross-doc (seen in ≥2 docs), flag=2 intra-only repeats.
    Exchange carries exact mergeable facts (count, min/max doc-hash) via
    keyed_agg; cross iff min≠max."""
    import zlib

    from pymhealth_ray.stages.aggregate import keyed_agg

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        keys, starts, lens, offs = _flat_windows(col, key_mult)
        ent = batch[entity_col]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        enc = ent.dictionary_encode()
        dh = np.array([zlib.crc32(str(v).encode()) for v in
                       enc.dictionary.to_pylist()], dtype=np.int64)
        row_h = dh[enc.indices.to_numpy(zero_copy_only=False)]
        n_windows = np.maximum(lens - L + 1, 0)
        win_doc = np.repeat(row_h, n_windows)
        order = np.argsort(keys, kind="stable")
        ks, dv = keys[order], win_doc[order]
        is_start = np.ones(len(ks), dtype=bool)
        is_start[1:] = ks[1:] != ks[:-1]
        st = np.flatnonzero(is_start)
        if len(st):
            cnt = np.diff(np.append(st, len(ks)))
            dmin = np.minimum.reduceat(dv, st)
            dmax = np.maximum.reduceat(dv, st)
            uk = ks[st]
        else:
            cnt = np.empty(0, dtype=np.int64)
            dmin = dmax = np.empty(0, dtype=np.int64)
            uk = np.empty(0, dtype=np.int64)
        return pa.table({"key": pa.array(uk),
                         "c": pa.array(cnt.astype(np.int64)),
                         "dmin": pa.array(dmin), "dmax": pa.array(dmax)})

    agg = keyed_agg(ds.map_batches(partial, batch_format="pyarrow",
                                   batch_size=None),
                    "key", {"c": "sum", "dmin": "min", "dmax": "max"},
                    num_buckets=256, precombine_rows=None)

    def classify(batch: pa.Table) -> pa.Table:
        c = batch["c"].to_numpy(zero_copy_only=False)
        mn = batch["dmin"].to_numpy(zero_copy_only=False)
        mx = batch["dmax"].to_numpy(zero_copy_only=False)
        flag = np.where(mn != mx, np.int8(1),
                        np.where(c >= 2, np.int8(2), np.int8(0)))
        keep = flag > 0
        return pa.table({
            "key": batch["key"].filter(pa.array(keep)),
            "flag": pa.array(flag[keep], type=pa.int8()),
        })

    return agg.map_batches(classify, batch_format="pyarrow",
                           batch_size=None).materialize()


def cross_doc_span_stats(ds, tokens_col: str = "tokens",
                         entity_col: str = "doc_id",
                         id_cols=("doc_id", "ts_ns"), key_mult: int = 2048,
                         broadcast_threshold: int = BROADCAST_THRESHOLD,
                         bloom_bits: int = 1 << 23):
    """Per row: n_cross (windows whose span ALSO occurs in another
    document) and n_intra (spans repeated only within this document) —
    the novelty split curation wants: cross-doc duplication is
    boilerplate/contamination, intra-doc repetition is style.

    Doc identity hashes with crc32 over ≤ corpus docs — at gate scale
    exact; at larger scale a 64-bit hash slot-in. Same plan selection as
    :func:`repeated_span_stats`: flagged-set broadcast under the
    threshold, bloom-prefiltered co-partitioned semi-join above it."""
    import ray

    flag_ds = _flagged_set_ds(ds, tokens_col, entity_col, key_mult)
    if flag_ds.count() > broadcast_threshold:
        return _cross_doc_span_stats_distributed(
            ds, flag_ds, tokens_col, id_cols, key_mult, bloom_bits)

    cross_parts, intra_parts = [], []
    for b in flag_ds.iter_batches(batch_format="pyarrow"):
        k = b["key"].to_numpy(zero_copy_only=False)
        f = b["flag"].to_numpy(zero_copy_only=False)
        cross_parts.append(k[f == 1])
        intra_parts.append(k[f == 2])
    cross = (np.sort(np.concatenate(cross_parts))
             if cross_parts else np.empty(0, np.int64))
    intra = (np.sort(np.concatenate(intra_parts))
             if intra_parts else np.empty(0, np.int64))
    cross_ref = ray.put(cross)
    intra_ref = ray.put(intra)

    def score(batch: pa.Table) -> pa.Table:
        cr = ray.get(cross_ref)
        it = ray.get(intra_ref)
        col = batch[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        keys, starts, lens, offs = _flat_windows(col, key_mult)
        n_windows = np.maximum(lens - L + 1, 0)
        woffs = np.concatenate(([0], np.cumsum(n_windows)))
        out = {}
        for name, arr in (("n_cross", _member(cr, keys)),
                          ("n_intra", _member(it, keys))):
            acc = np.zeros(len(lens), dtype=np.int64)
            nz = n_windows > 0
            if nz.any() and len(arr):
                acc[nz] = np.add.reduceat(arr.astype(np.int64),
                                          woffs[:-1][nz])
            out[name] = acc
        cols = {c: batch[c] for c in id_cols}
        cols["n_windows"] = pa.array(n_windows)
        cols["n_cross"] = pa.array(out["n_cross"])
        cols["n_intra"] = pa.array(out["n_intra"])
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow")


def _cross_doc_span_stats_distributed(ds, flag_ds, tokens_col, id_cols,
                                      key_mult, bloom_bits):
    dupwin = _dup_window_rows(ds, flag_ds, tokens_col, id_cols, key_mult,
                              extra_set_cols=["flag"],
                              bloom_bits=bloom_bits)

    def score_bucket(n_u, invR, invW, startW, lensR, id_tbl, wtbl):
        flag = (wtbl["flag"].to_numpy(zero_copy_only=False)
                if wtbl.num_rows else np.empty(0, np.int8))
        n_cross_u = np.bincount(invW[flag == 1], minlength=n_u).astype(np.int64)
        n_intra_u = np.bincount(invW[flag == 2], minlength=n_u).astype(np.int64)
        cols = {c: id_tbl[c] for c in id_tbl.column_names}
        cols["n_windows"] = pa.array(np.maximum(lensR - L + 1, 0))
        cols["n_cross"] = pa.array(n_cross_u[invR])
        cols["n_intra"] = pa.array(n_intra_u[invR])
        return pa.table(cols)

    return _scored_from_windows(ds, dupwin, tokens_col, id_cols,
                                score_bucket,
                                extra_cols=[("flag", pa.int8())])
