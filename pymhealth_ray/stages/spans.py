"""Repeated token-span detection — ExactSubstr-style dedup signal at the
token level ("Deduplicating Training Data Makes Language Models Better",
Lee et al. 2022, adapted to fixed-length spans).

A span is an L=5 token window packed EXACTLY into one int64
(``Σ tok_j · K^j``, K=2048 > max token ⇒ collision-free, no hashing
uncertainty). Any span occurring ≥2 times anywhere in the corpus
(cross- or intra-document) is "duplicated"; each row reports how many of
its windows are duplicated and what fraction of its token positions a
duplicated span covers — the mask a curation pipeline would cut.

Plan: map-only window packing off the flat Arrow token buffer →
``keyed_sum`` count per span (bucketed rollup, no key sort) → the
duplicated-span set broadcast sorted (bounded by the true duplicate count,
the same hot-set-broadcast shape as cross-doc boilerplate removal,
stages/linededup.py) → a stateless scoring map (searchsorted membership +
interval-union coverage via a delta/cumsum sweep). One vocab-bounded-ish
exchange; zero row shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

L = 5


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
    return keyed_sum(partials, "key", ["c"], num_buckets=256)


def repeated_span_stats(ds, tokens_col: str = "tokens",
                        id_cols=("doc_id", "ts_ns"), key_mult: int = 2048,
                        min_occurrences: int = 2):
    """Per row: n_windows, n_dup (windows whose span occurs ≥
    ``min_occurrences`` corpus-wide) and frac_cov (fraction of token
    positions covered by ≥1 duplicated span)."""
    import ray

    counts = span_counts(ds, tokens_col, key_mult)

    def dup_only(batch: pa.Table) -> pa.Table:
        c = batch["c"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(c >= min_occurrences))

    dup_keys = np.sort(np.concatenate([
        b["key"].to_numpy(zero_copy_only=False)
        for b in counts.map_batches(dup_only, batch_format="pyarrow",
                                    batch_size=None)
        .iter_batches(batch_format="pyarrow")] or
        [np.empty(0, dtype=np.int64)]))
    dup_ref = ray.put(dup_keys)

    def score(batch: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        col = batch[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        keys, starts, lens, offs = _flat_windows(col, key_mult)
        idx = np.searchsorted(dup, keys)
        isdup = (idx < len(dup))
        if len(dup):
            isdup &= dup[np.minimum(idx, len(dup) - 1)] == keys
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


def cross_doc_span_stats(ds, tokens_col: str = "tokens",
                         entity_col: str = "doc_id",
                         id_cols=("doc_id", "ts_ns"), key_mult: int = 2048):
    """Per row: n_cross (windows whose span ALSO occurs in another
    document) and n_intra (spans repeated only within this document) —
    the novelty split curation wants: cross-doc duplication is
    boilerplate/contamination, intra-doc repetition is style.

    Per span the exchange carries exact mergeable facts
    (count, min doc-hash, max doc-hash) through keyed_agg; a span is
    cross-doc iff min≠max (doc-hash collisions: crc32 over ≤ corpus docs —
    at gate scale exact; at larger scale a 64-bit hash slot-in)."""
    import zlib

    import ray

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
                    num_buckets=256)

    cross_keys = []
    intra_keys = []
    for b in agg.iter_batches(batch_format="pyarrow"):
        k = b["key"].to_numpy(zero_copy_only=False)
        c = b["c"].to_numpy(zero_copy_only=False)
        mn = b["dmin"].to_numpy(zero_copy_only=False)
        mx = b["dmax"].to_numpy(zero_copy_only=False)
        cross_keys.append(k[mn != mx])
        intra_keys.append(k[(mn == mx) & (c >= 2)])
    cross = np.sort(np.concatenate(cross_keys)) if cross_keys else np.empty(0, np.int64)
    intra = np.sort(np.concatenate(intra_keys)) if intra_keys else np.empty(0, np.int64)
    cross_ref = ray.put(cross)
    intra_ref = ray.put(intra)

    def member(sorted_arr, keys):
        if not len(sorted_arr) or not len(keys):
            return np.zeros(len(keys), dtype=bool)
        idx = np.searchsorted(sorted_arr, keys)
        ok = idx < len(sorted_arr)
        ok[ok] = sorted_arr[idx[ok]] == keys[ok]
        return ok

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
        for name, arr in (("n_cross", member(cr, keys)),
                          ("n_intra", member(it, keys))):
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
