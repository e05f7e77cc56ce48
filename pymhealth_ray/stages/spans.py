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
