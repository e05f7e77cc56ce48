"""Skip-gram PMI: token-pair association statistics over token arrays.

The word2vec-era co-occurrence signal, computed token-natively: for every
directed pair (tokens[i], tokens[i+d]), d ≤ window, the pointwise mutual
information ``pmi = ln(N·c_ab / (c_a·c_b))`` where c_a / c_b are the
left/right marginals over pair slots. Plan:

  1. map-only pair counting — both shifts are numpy slices of the flat
     Arrow token buffer; pair keys pack into one int64
     (``a·K + b``, K > max token), counted per block with ``np.unique``.
     The exchange carries (key, count) partials only;
  2. ``groupby(key).sum`` → the global pair table (stays distributed);
  3. marginals project off the pair table — two O(vocab) aggregations
     that collect to the driver and broadcast;
  4. map-only PMI + per-block partial top-k (rounded-PMI DESC, a, b —
     the oracle's exact sort key), driver merges ≤ k·blocks rows.

All counts are exact int64; the only float is the final ln of a ratio of
exact integers, rounded half-away on both engines before ranking.

Reference lineage: entropy/information family
(`/root/reference/src/mhealth/generic/information.py`) extended to pair
statistics; SURVEY §2.10 token-corpus surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _round_away(x: np.ndarray, d: int = 6) -> np.ndarray:
    m = 10.0**d
    return np.sign(x) * np.floor(np.abs(x) * m + 0.5) / m


def skipgram_pair_counts(ds, tokens_col: str = "tokens", window: int = 2,
                         key_mult: int = 2048):
    """Dataset of (key, c) — directed pair counts packed as a·K + b."""

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.int64)
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
        offs = np.concatenate(([0], np.cumsum(lens)))
        keys = []
        for d in range(1, window + 1):
            # valid left positions: local index < len - d
            pos = np.arange(len(flat), dtype=np.int64)
            local = pos - np.repeat(offs[:-1], lens)
            ok = local < np.repeat(lens - d, lens)
            left = flat[ok]
            right = flat[np.flatnonzero(ok) + d]
            keys.append(left * key_mult + right)
        if keys:
            allk = np.concatenate(keys)
            vals, cnts = np.unique(allk, return_counts=True)
        else:
            vals = np.empty(0, dtype=np.int64)
            cnts = np.empty(0, dtype=np.int64)
        return pa.table({
            "key": pa.array(vals),
            "c": pa.array(cnts.astype(np.int64)),
        })

    from pymhealth_ray.stages.aggregate import keyed_sum

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
    # bucketed rollup, NOT groupby(key).sum: the row-level key sort was the
    # scale bottleneck (16.7M partial rows at sf0.1 took >2 min; this takes
    # seconds — the exchange keys on a 256-value int32 bucket instead)
    return keyed_sum(partials, "key", ["c"], num_buckets=256)


def pmi_topk(ds, tokens_col: str = "tokens", window: int = 2,
             min_count: int = 5, k: int = 25, key_mult: int = 2048):
    """Top-k directed token pairs by PMI (pyarrow.Table: a, b, cab, ca,
    cb, pmi, rn). ``key_mult`` must exceed the max token id + 1."""
    import ray

    pairs = skipgram_pair_counts(ds, tokens_col, window, key_mult).materialize()

    def marg(col_expr):
        def fn(batch: pa.Table) -> pa.Table:
            key = batch["key"].to_numpy(zero_copy_only=False)
            c = batch["c"].to_numpy(zero_copy_only=False)
            m = col_expr(key)
            vals, inv = np.unique(m, return_inverse=True)
            s = np.bincount(inv, weights=c).astype(np.int64)
            return pa.table({"t": pa.array(vals), "c": pa.array(s)})
        out = {}
        for r in pairs.map_batches(fn, batch_format="pyarrow",
                                   batch_size=None).take_all():
            out[r["t"]] = out.get(r["t"], 0) + r["c"]
        return out

    ca = marg(lambda key: key // key_mult)
    cb = marg(lambda key: key % key_mult)
    n_pairs = sum(ca.values())
    ca_arr = np.zeros(key_mult, dtype=np.int64)
    cb_arr = np.zeros(key_mult, dtype=np.int64)
    for t, c in ca.items():
        ca_arr[t] = c
    for t, c in cb.items():
        cb_arr[t] = c
    bc = ray.put((ca_arr, cb_arr, n_pairs))

    def score(batch: pa.Table) -> pa.Table:
        ca_, cb_, n_ = ray.get(bc)
        key = batch["key"].to_numpy(zero_copy_only=False)
        cab = batch["c"].to_numpy(zero_copy_only=False)
        keep = cab >= min_count
        key, cab = key[keep], cab[keep]
        a, b = key // key_mult, key % key_mult
        pmi = _round_away(
            np.log((n_ * cab).astype(np.float64) / (ca_[a] * cb_[b])), 6)
        tbl = pa.table({
            "a": pa.array(a), "b": pa.array(b),
            "cab": pa.array(cab.astype(np.int64)),
            "ca": pa.array(ca_[a]), "cb": pa.array(cb_[b]),
            "pmi": pa.array(pmi),
        })
        order = pc.sort_indices(tbl, sort_keys=[
            ("pmi", "descending"), ("a", "ascending"), ("b", "ascending")])
        return tbl.take(order[:k])

    top = pairs.map_batches(score, batch_format="pyarrow",
                            batch_size=None).take_all()
    top.sort(key=lambda r: (-r["pmi"], r["a"], r["b"]))
    top = top[:k]
    return pa.table({
        "a": pa.array([r["a"] for r in top], type=pa.int64()),
        "b": pa.array([r["b"] for r in top], type=pa.int64()),
        "cab": pa.array([r["cab"] for r in top], type=pa.int64()),
        "ca": pa.array([r["ca"] for r in top], type=pa.int64()),
        "cb": pa.array([r["cb"] for r in top], type=pa.int64()),
        "pmi": pa.array([r["pmi"] for r in top], type=pa.float64()),
        "rn": pa.array(np.arange(1, len(top) + 1, dtype=np.int64)),
    })


def pmi_neighbors(ds, tokens_col: str = "tokens", window: int = 2,
                  min_count: int = 5, k_per_token: int = 5,
                  key_mult: int = 2048):
    """Top-``k_per_token`` associates of EVERY token by PMI — the
    word-association table (distributional neighbors). Same pair/marginal
    machinery as :func:`pmi_topk`; the per-token ranking runs through
    stages/aggregate.grouped_topk (map-side per-block partials), so the
    output is vocab·k rows and nothing larger ever collects."""
    import ray

    from pymhealth_ray.stages.aggregate import grouped_topk

    pairs = skipgram_pair_counts(ds, tokens_col, window, key_mult).materialize()

    def marg(col_expr):
        def fn(batch: pa.Table) -> pa.Table:
            key = batch["key"].to_numpy(zero_copy_only=False)
            c = batch["c"].to_numpy(zero_copy_only=False)
            m = col_expr(key)
            vals, inv = np.unique(m, return_inverse=True)
            s = np.bincount(inv, weights=c).astype(np.int64)
            return pa.table({"t": pa.array(vals), "c": pa.array(s)})
        out = {}
        for r in pairs.map_batches(fn, batch_format="pyarrow",
                                   batch_size=None).take_all():
            out[r["t"]] = out.get(r["t"], 0) + r["c"]
        return out

    ca = marg(lambda key: key // key_mult)
    cb = marg(lambda key: key % key_mult)
    n_pairs = sum(ca.values())
    ca_arr = np.zeros(key_mult, dtype=np.int64)
    cb_arr = np.zeros(key_mult, dtype=np.int64)
    for t, c in ca.items():
        ca_arr[t] = c
    for t, c in cb.items():
        cb_arr[t] = c
    bc = ray.put((ca_arr, cb_arr, n_pairs))

    def score(batch: pa.Table) -> pa.Table:
        ca_, cb_, n_ = ray.get(bc)
        key = batch["key"].to_numpy(zero_copy_only=False)
        cab = batch["c"].to_numpy(zero_copy_only=False)
        keep = cab >= min_count
        key, cab = key[keep], cab[keep]
        a, b = key // key_mult, key % key_mult
        pmi = _round_away(
            np.log((n_ * cab).astype(np.float64) / (ca_[a] * cb_[b])), 6)
        return pa.table({
            "a": pa.array(a), "b": pa.array(b),
            "cab": pa.array(cab.astype(np.int64)),
            "pmi": pa.array(pmi),
        })

    scored = pairs.map_batches(score, batch_format="pyarrow",
                               batch_size=None)
    return grouped_topk(scored, ["a"], "pmi", k_per_token, descending=True,
                        tie_cols=["b"], rank_name="rn", num_buckets=64)
