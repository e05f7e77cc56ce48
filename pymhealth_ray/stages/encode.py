"""Categorical feature encoding for tabular training data.

Two classic ML-prep ops, both expressed as "small aggregate → broadcast →
map-only apply" so the full table is touched exactly once and never
shuffled:

- **frequency label encoding** — map each category to a dense integer id
  ordered by (count DESC, value ASC), the standard vocabulary-index step
  before embedding lookup;
- **target (mean) encoding** — replace a category with the mean of a
  numeric target over that category. Exact-decimal targets are summed in
  integer cents so the broadcast stats are integers and the final mean is
  a single int/int IEEE division (bit-exact against any other engine).

The category statistics come from per-block combiners (``batch_size=None``
— one partial per block) followed by a tiny ``groupby().sum`` whose input
is O(distinct categories × blocks); the category table is then `ray.put`
once and read from the object store by every map task, never re-shipped
per batch.

Reference lineage: broadcast-small-side precedent
`/root/reference/src/mhealth/location/distance.py:36-44`; the encoding
semantics are the beyond-reference tabular-prep surface (SURVEY §2.10).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def category_stats(ds, col: str, target_cents_col: str | None = None):
    """Driver-side dict: category → (count, target_cents_sum). The
    distinct-category set is assumed small (it is a *categorical* column);
    the exchange carries one (category, count, sum) row per block."""

    def partial(batch: pa.Table) -> pa.Table:
        cats = batch[col]
        if isinstance(cats, pa.ChunkedArray):
            cats = cats.combine_chunks()
        enc = cats.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        k = len(enc.dictionary)
        n = np.bincount(idx, minlength=k).astype(np.int64)
        if target_cents_col is not None:
            t = batch[target_cents_col]
            if isinstance(t, pa.ChunkedArray):
                t = t.combine_chunks()
            tv = np.rint(t.to_numpy(zero_copy_only=False) * 100).astype(np.int64)
            s = np.bincount(idx, weights=tv, minlength=k).astype(np.int64)
        else:
            s = np.zeros(k, dtype=np.int64)
        return pa.table({
            col: enc.dictionary,
            "n": pa.array(n),
            "s": pa.array(s),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    final = partials.groupby(col).sum(["n", "s"])
    out = {}
    for r in final.take_all():
        out[r[col]] = (int(r["sum(n)"]), int(r["sum(s)"]))
    return out


def build_encoding(stats: dict) -> dict:
    """Dense ids ordered by (count DESC, category ASC) — row_number
    semantics, 1-based to match SQL oracles."""
    ordered = sorted(stats.items(), key=lambda kv: (-kv[1][0], kv[0]))
    return {
        cat: (rank + 1, n, s)
        for rank, (cat, (n, s)) in enumerate(ordered)
    }


def encode_categories(ds, col: str, enc_ref, mean_scale: int = 100):
    """Map-only apply of a broadcast encoding: appends ``cat_id`` (dense
    rank), ``cat_n`` (category count) and — when the encoding carries
    target sums — ``cat_target_mean`` (cents_sum / (scale * n), one IEEE
    division of two exact integers)."""
    import ray

    def fn(batch: pa.Table) -> pa.Table:
        enc = ray.get(enc_ref)
        cats = batch[col]
        if isinstance(cats, pa.ChunkedArray):
            cats = cats.combine_chunks()
        d = cats.dictionary_encode()
        idx = d.indices.to_numpy(zero_copy_only=False)
        ids = np.empty(len(d.dictionary), dtype=np.int64)
        ns = np.empty(len(d.dictionary), dtype=np.int64)
        ss = np.empty(len(d.dictionary), dtype=np.int64)
        for j, cat in enumerate(d.dictionary.to_pylist()):
            cid, n, s = enc[cat]
            ids[j], ns[j], ss[j] = cid, n, s
        means = ss.astype(np.float64) / (mean_scale * ns)
        batch = batch.append_column("cat_id", pa.array(ids[idx]))
        batch = batch.append_column("cat_n", pa.array(ns[idx]))
        batch = batch.append_column("cat_target_mean", pa.array(means[idx]))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow")


def frequency_target_encode(ds, col: str, target_col: str | None = None,
                            num_buckets: int = 32):
    """End-to-end: category stats (one pass over a 2-column projection) →
    broadcast → map-only encode of the full input."""
    import ray

    stats = category_stats(ds, col, target_col)
    enc_ref = ray.put(build_encoding(stats))
    return encode_categories(ds, col, enc_ref)


# --------------------------------------------------------------------------
# leave-one-out target encoding (round 3)
# --------------------------------------------------------------------------


def target_encode_loo(ds, cat_col: str, value_col: str,
                      out_name: str | None = None, scale: int = 100):
    """Leakage-safe leave-one-out target encoding: each row's category is
    encoded as the TARGET mean over all OTHER rows of that category —
    ``(sum_cat − own) / (n_cat − 1)`` (NULL for singleton categories), so
    a row's own label never leaks into its feature (the zero-leakage
    discipline of stages/asof.py applied to encoders).

    One partial-aggregation pass → tiny per-category (int-cents sum, n)
    broadcast → stateless per-row exclusion map. ``scale``: fixed-point
    multiplier for exact integer sums (2-dec data → 100); enc is int/int
    division, bit-equal to the SQL oracle."""
    import ray

    out_name = out_name or f"{value_col}_loo"

    def partial(batch: pa.Table) -> pa.Table:
        cat = batch[cat_col]
        if isinstance(cat, pa.ChunkedArray):
            cat = cat.combine_chunks()
        v = batch[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        cents = np.rint(v.to_numpy(zero_copy_only=False).astype(np.float64)
                        * scale).astype(np.int64)
        enc = cat.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        k = len(enc.dictionary)
        return pa.table({
            cat_col: enc.dictionary,
            "s": pa.array(np.bincount(idx, weights=cents,
                                      minlength=k).astype(np.int64)),
            "n": pa.array(np.bincount(idx, minlength=k).astype(np.int64)),
        })

    merged = (ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=None)
              .groupby(cat_col).sum(["s", "n"]))
    stats: dict = {}
    for b in merged.iter_batches(batch_format="pyarrow"):
        for c, s, n in zip(b[cat_col].to_pylist(), b["sum(s)"].to_pylist(),
                           b["sum(n)"].to_pylist()):
            stats[c] = (int(s), int(n))
    stats_ref = ray.put(stats)

    def score(batch: pa.Table) -> pa.Table:
        st = ray.get(stats_ref)
        cat = batch[cat_col]
        if isinstance(cat, pa.ChunkedArray):
            cat = cat.combine_chunks()
        v = batch[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        cents = np.rint(v.to_numpy(zero_copy_only=False).astype(np.float64)
                        * scale).astype(np.int64)
        enc = cat.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        dvals = enc.dictionary.to_pylist()
        S = np.array([st.get(c, (0, 0))[0] for c in dvals], dtype=np.int64)
        N = np.array([st.get(c, (0, 0))[1] for c in dvals], dtype=np.int64)
        s_row, n_row = (S[idx], N[idx]) if len(dvals) else (
            np.zeros(0, np.int64), np.zeros(0, np.int64))
        ok = n_row > 1
        with np.errstate(invalid="ignore", divide="ignore"):
            enc_val = (s_row - cents).astype(np.float64) / (
                scale * (n_row - 1)).astype(np.float64)
        return batch.append_column(
            out_name, pa.array(np.where(ok, enc_val, 0.0),
                               type=pa.float64(), mask=~ok))

    return ds.map_batches(score, batch_format="pyarrow")
