"""Mergeable HyperLogLog sketch — approximate distinct counting at scale.

The reference counts distinct clusters by materializing the whole label
array (reference:location/distribution.py:58-65 ``num_clusters`` =
``len(np.unique(...))``); that is exact but O(data) per group. This is the
100TB form: each block collapses to a fixed 2^p-byte register array per
group (the Flajolet–Fuss–Gandouet–Meunier HLL, public-domain algorithm),
registers merge by elementwise max — associative and commutative, so the
result is BIT-IDENTICAL regardless of block count or merge order — and the
exchange carries m bytes per (group, block) instead of the values.

Determinism: 64-bit splitmix64 for integer values, md5-prefix for strings
(hashed once per distinct value per batch). Estimator: alpha_m * m^2 /
sum(2^-M_j) with linear-counting small-range correction; no large-range
correction needed at 64-bit. Standard error ~= 1.04/sqrt(m) (p=12 ->
~1.6%).
"""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np
import pyarrow as pa

from pymhealth_ray.stages.partition import _stable_bucket_of

_REG_COL = "__hll_regs"


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D9ECA9AAC582A3)
    return z ^ (z >> np.uint64(31))


def _hash64(col: pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        return _splitmix64(col.cast(pa.int64()).to_numpy(zero_copy_only=False).view(np.uint64))
    # strings / binary: md5 prefix, computed once per DISTINCT value
    enc = col.dictionary_encode()
    idx = enc.indices.to_numpy(zero_copy_only=False)
    uniq = enc.dictionary.to_pylist()
    h = np.fromiter(
        (int.from_bytes(hashlib.md5(
            v.encode() if isinstance(v, str) else v).digest()[:8], "little")
         for v in uniq),
        dtype=np.uint64, count=len(uniq),
    )
    return h[idx]


def _registers(gid: np.ndarray, hashes: np.ndarray, n_groups: int, p: int) -> np.ndarray:
    """(n_groups, m) uint8 register matrix: max rho per (group, register)."""
    m = 1 << p
    reg_idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = hashes & np.uint64((1 << (64 - p)) - 1)
    # rho = leading-zero count of the remaining (64-p) bits + 1; rest < 2^52
    # for p >= 12 so float64 log2 is exact
    rho = np.where(
        rest == 0, 64 - p + 1,
        (64 - p) - np.floor(np.log2(rest.astype(np.float64))).astype(np.int64)
    ).astype(np.uint8)
    flat = gid * m + reg_idx
    order = np.argsort(flat, kind="stable")
    fs, rs = flat[order], rho[order]
    starts = np.ones(len(fs), dtype=bool)
    starts[1:] = fs[1:] != fs[:-1]
    start_pos = np.flatnonzero(starts)
    regs = np.zeros(n_groups * m, dtype=np.uint8)
    if len(start_pos):
        regs[fs[start_pos]] = np.maximum.reduceat(rs, start_pos)
    return regs.reshape(n_groups, m)


def _estimate(regs: np.ndarray) -> np.ndarray:
    """HLL estimate per row of an (n_groups, m) register matrix."""
    m = regs.shape[1]
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)), axis=1)
    zeros = np.sum(regs == 0, axis=1)
    small = (est <= 2.5 * m) & (zeros > 0)
    with np.errstate(divide="ignore"):
        linear = m * np.log(m / np.maximum(zeros, 1).astype(np.float64))
    return np.where(small, linear, est)


def grouped_approx_distinct(
    ds,
    group_cols: List[str],
    value_col: str,
    p: int = 12,
    est_name: str = "approx_distinct",
    count_name: str = "n_rows",
    num_buckets: int = 64,
):
    """Approximate COUNT(DISTINCT value) per group via mergeable HLL
    sketches: per-block register partials → bucket exchange (m bytes per
    group-block) → elementwise-max merge → estimate. Deterministic and
    partitioning-invariant (see module doc)."""
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        gid = np.zeros(batch.num_rows, dtype=np.int64)
        dicts = []
        for c in group_cols:
            col = batch[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            enc = col.dictionary_encode()
            dicts.append(enc)
            gid = gid * (len(enc.dictionary) + 1) + enc.indices.to_numpy(
                zero_copy_only=False).astype(np.int64)
        uniq_gid, first_row, inv = np.unique(gid, return_index=True, return_inverse=True)
        hashes = _hash64(batch[value_col])
        regs = _registers(inv, hashes, len(uniq_gid), p)
        counts = np.bincount(inv, minlength=len(uniq_gid)).astype(np.int64)
        cols = {c: batch[c].take(pa.array(first_row)) for c in group_cols}
        cols[_REG_COL] = pa.FixedSizeListArray.from_arrays(
            pa.array(regs.reshape(-1), type=pa.uint8()), m)
        cols[count_name] = pa.array(counts)
        out = pa.table(cols)
        b = _stable_bucket_of(out[group_cols[0]], num_buckets)
        return out.append_column("__aggbucket", pa.array(b, type=pa.int32()))

    def final_bucket(tbl: pa.Table) -> pa.Table:
        tbl = tbl.drop_columns(["__aggbucket"])
        gid = np.zeros(tbl.num_rows, dtype=np.int64)
        for c in group_cols:
            col = tbl[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            enc = col.dictionary_encode()
            gid = gid * (len(enc.dictionary) + 1) + enc.indices.to_numpy(
                zero_copy_only=False).astype(np.int64)
        reg_col = tbl[_REG_COL]
        if isinstance(reg_col, pa.ChunkedArray):
            reg_col = reg_col.combine_chunks()
        regs = np.asarray(reg_col.values.to_numpy(zero_copy_only=False),
                          dtype=np.uint8).reshape(tbl.num_rows, -1)
        order = np.argsort(gid, kind="stable")
        gs = gid[order]
        starts = np.ones(len(gs), dtype=bool)
        starts[1:] = gs[1:] != gs[:-1]
        start_pos = np.flatnonzero(starts)
        merged = np.maximum.reduceat(regs[order], start_pos, axis=0)
        counts = np.add.reduceat(
            tbl[count_name].to_numpy(zero_copy_only=False)[order], start_pos)
        first_row = order[start_pos]
        cols = {c: tbl[c].take(pa.array(first_row)) for c in group_cols}
        cols[est_name] = pa.array(np.round(_estimate(merged), 6))
        cols[count_name] = pa.array(counts.astype(np.int64))
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return partials.groupby("__aggbucket").map_groups(final_bucket, batch_format="pyarrow")


def hll_expected(values, group_keys, p: int = 12):
    """Single-process reference implementation (oracle): same registers,
    same estimator, no partitioning — must agree bit-for-bit with the
    distributed form because max-merge is order-free."""
    import pandas as pd

    df = pd.DataFrame({"g": group_keys})
    codes, uniques = pd.factorize(df.g, sort=True)
    col = pa.array(values)
    hashes = _hash64(col)
    regs = _registers(codes.astype(np.int64), hashes, len(uniques), p)
    est = np.round(_estimate(regs), 6)
    n = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
    return pd.DataFrame({"g": uniques, "est": est, "n": n})


# --- count-min sketch: the frequency member of the sketch triad ------------
# (distinct = HLL above, membership = stages.bloom, frequency = THIS)


def _cms_rows(col, width: int, depth: int) -> np.ndarray:
    """(depth, width) int64 counter partial for one batch."""
    h = _hash64(col)
    cms = np.zeros((depth, width), dtype=np.int64)
    for d in range(depth):
        hd = _splitmix64(h ^ np.uint64((0x9E3779B97F4A7C15 * (d + 1)) & 0xFFFFFFFFFFFFFFFF))
        idx = (hd % np.uint64(width)).astype(np.int64)
        cms[d] += np.bincount(idx, minlength=width)
    return cms


def build_count_min(ds, col: str, width: int = 1 << 14, depth: int = 4,
                    merge_groups: int = 64) -> np.ndarray:
    """Count-min sketch over a column: per-block counter partials, two-level
    ``+``-merge (associative/commutative → the built sketch is BIT-IDENTICAL
    for any block layout, like the HLL registers and the Bloom bitmap).
    Estimates are one-sided: ``estimate >= true count`` always, over-count
    bounded by ~e*N/width with probability 1 - e^-depth."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        cms = _cms_rows(batch[col], width, depth)
        return pa.table({
            "cms": pa.FixedSizeListArray.from_arrays(
                pa.array(cms.reshape(-1)), width * depth),
            "__mgroup": pa.array([int(cms.sum()) % merge_groups], type=pa.int32()),
        })

    def sum_group(tbl: pa.Table) -> pa.Table:
        c = tbl["cms"]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        mats = np.asarray(c.values.to_numpy(zero_copy_only=False),
                          dtype=np.int64).reshape(tbl.num_rows, -1)
        return pa.table({"cms": pa.FixedSizeListArray.from_arrays(
            pa.array(mats.sum(axis=0)), width * depth)})

    merged = ds.map_batches(partial, batch_format="pyarrow", batch_size=None) \
        .groupby("__mgroup").map_groups(
        lambda t: sum_group(t.drop_columns(["__mgroup"])), batch_format="pyarrow")
    out = np.zeros(depth * width, dtype=np.int64)
    for t in ray.get(merged.to_arrow_refs()):
        if t.num_rows:
            mats = np.asarray(t["cms"].combine_chunks().values.to_numpy(
                zero_copy_only=False), dtype=np.int64).reshape(t.num_rows, -1)
            out += mats.sum(axis=0)
    return out.reshape(depth, width)


def count_min_estimate(cms: np.ndarray, col, ) -> np.ndarray:
    """Estimated count per row of ``col`` (min over the depth rows)."""
    depth, width = cms.shape
    h = _hash64(col)
    est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(depth):
        hd = _splitmix64(h ^ np.uint64((0x9E3779B97F4A7C15 * (d + 1)) & 0xFFFFFFFFFFFFFFFF))
        idx = (hd % np.uint64(width)).astype(np.int64)
        est = np.minimum(est, cms[d][idx])
    return est


# --------------------------------------------------------------------------
# Misra–Gries heavy hitters: the mergeable bounded-memory frequency
# summary (Agarwal et al., "Mergeable Summaries"). k counters per
# summary; after any sequence of merges every surviving estimate obeys
#   true − err ≤ est ≤ true      (err returned alongside),
# and every item with true frequency > n/(k+1) is guaranteed to survive.
# Summaries are built ONE PER INPUT FILE and folded in sorted-path order,
# so the result is DETERMINISTIC (MG merging is commutative but not
# associative — scheduler-dependent fold order would break hash parity).
# --------------------------------------------------------------------------


def _mg_compress(keys: np.ndarray, counts: np.ndarray,
                 k: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Keep ≤ k counters: subtract the (k+1)-th largest count from all
    and drop the non-positive — the classic MG decrement, vectorized.
    Returns (keys, counts, decrement) with keys ascending."""
    if len(keys) <= k:
        order = np.argsort(keys)
        return keys[order], counts[order], 0
    kth = np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)]
    c2 = counts - kth
    keep = c2 > 0
    keys, c2 = keys[keep], c2[keep]
    order = np.argsort(keys)
    return keys[order], c2[order], int(kth)


def _mg_merge(a: tuple, b: tuple, k: int) -> tuple:
    """Merge two (keys, counts, err) summaries: sum counts on the key
    union, re-compress, accumulate the error bound (prior errors + this
    merge's decrement)."""
    ka, ca, ea = a
    kb, cb, eb = b
    keys = np.concatenate([ka, kb])
    counts = np.concatenate([ca, cb])
    uk, inv = np.unique(keys, return_inverse=True)
    uc = np.bincount(inv, weights=counts.astype(np.float64)) \
        .astype(np.int64)
    uk2, uc2, dec = _mg_compress(uk, uc, k)
    return uk2, uc2, ea + eb + dec


def misra_gries_file_summary(path: str, tokens_col: str,
                             k: int) -> tuple:
    """(keys, counts, err) summary of one parquet file's flattened token
    column. Per-file counting is exact here (the fixture vocabulary is
    bounded); an unbounded-vocab file would run the same MG decrement
    chunk by chunk — the summary contract is identical either way."""
    import pyarrow.parquet as pq_mod

    import pyarrow.compute as pc

    tbl = pq_mod.read_table(path, columns=[tokens_col])
    flat = pc.list_flatten(tbl[tokens_col].combine_chunks()) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    uk, uc = np.unique(flat, return_counts=True)
    uk2, uc2, dec = _mg_compress(uk, uc.astype(np.int64), k)
    return uk2, uc2, dec


def misra_gries_topk(paths: list, tokens_col: str, k: int = 64,
                     top: int = 10) -> pa.Table:
    """Distributed heavy hitters: one MG summary per file (parallel Ray
    tasks), folded on the driver in SORTED PATH ORDER (deterministic).
    Output: top-``top`` surviving items by estimated count with the
    global error bound — (token, est_count, max_undercount). The driver
    holds O(files · k) ints while folding, never the value domain."""
    import ray

    @ray.remote
    def one(p: str) -> tuple:
        return misra_gries_file_summary(p, tokens_col, k)

    paths = sorted(paths)
    parts = ray.get([one.remote(p) for p in paths])
    acc = (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64), 0)
    for part in parts:
        acc = _mg_merge(acc, part, k)
    keys, counts, err = acc
    order = np.lexsort((keys, -counts))[:top]
    return pa.table({
        "token": pa.array(keys[order]),
        "est_count": pa.array(counts[order]),
        "max_undercount": pa.array(np.full(len(order), err,
                                           dtype=np.int64)),
    })


def _md5_u64(col) -> np.ndarray:
    """uint64 of the first 16 md5 hex chars of each value's string form,
    hashed once per DISTINCT value per batch (dictionary-encode first).
    Lowercase-hex prefix order == numeric order, so the exact same hash
    is ``('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 16))::UBIGINT`` in
    SQL — the KMV sketch below is engine-reproducible bit for bit."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    enc = col.dictionary_encode()
    idx = enc.indices.to_numpy(zero_copy_only=False)
    uniq = enc.dictionary.to_pylist()
    h = np.array(
        [int(hashlib.md5(f"{v}".encode()).hexdigest()[:16], 16)
         for v in uniq], dtype=np.uint64)
    return h[idx]


def _kmv_bottom_k(g: np.ndarray, h: np.ndarray, k: int):
    """Distinct (group, hash) rows, keeping only each group's k smallest
    hashes. Returns (g, h) arrays sorted by (group, hash)."""
    order = np.lexsort((h, g))
    g, h = g[order], h[order]
    newg = np.ones(len(g), dtype=bool)
    newg[1:] = g[1:] != g[:-1]
    dup = np.zeros(len(g), dtype=bool)
    dup[1:] = (~newg[1:]) & (h[1:] == h[:-1])
    g, h = g[~dup], h[~dup]
    newg = np.ones(len(g), dtype=bool)
    newg[1:] = g[1:] != g[:-1]
    starts = np.flatnonzero(newg)
    lens = np.diff(np.append(starts, len(g)))
    rank = np.arange(len(g), dtype=np.int64) - np.repeat(starts, lens)
    keep = rank < k
    return g[keep], h[keep]


def kmv_distinct(ds, group_col: str, value_col: str, k: int = 64,
                 num_buckets: int = 32, out_name: str = "est_distinct"):
    """Per-group KMV (k-minimum-values / bottom-k) distinct sketch — the
    third mergeable distinct estimator next to HLL and exact
    grouped_distinct_count, and the one whose merge is a plain set-union
    bottom-k, so incremental ingest can persist it as k hashes per group.

    est = (k−1) / u_k with u_k the k-th smallest md5-uniform hash
    normalized to (0,1); groups with fewer than k distinct values report
    their EXACT count (the merged bottom-k then contains every hash).
    Bottom-k union is associative/commutative ⇒ the result is identical
    under any partitioning. Exchange volume: ≤ k rows per (group, block).

    Output: one row per group — (group, n_kept, est_distinct)."""
    from pymhealth_ray.stages.partition import grouped_by_bucket

    def partial(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({group_col: pa.array([], type=pa.int64()),
                             "__h": pa.array([], type=pa.uint64())})
        g = tbl[group_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = _md5_u64(tbl[value_col])
        g, h = _kmv_bottom_k(g, h, k)
        return pa.table({group_col: pa.array(g), "__h": pa.array(h)})

    parts = ds.select_columns([group_col, value_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None)

    def merge(tbl: pa.Table) -> pa.Table:
        empty = pa.table({group_col: pa.array([], type=pa.int64()),
                          "n_kept": pa.array([], type=pa.int64()),
                          out_name: pa.array([], type=pa.float64())})
        if tbl.num_rows == 0:
            return empty
        g = tbl[group_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = tbl["__h"].to_numpy(zero_copy_only=False).astype(np.uint64)
        g, h = _kmv_bottom_k(g, h, k)
        newg = np.ones(len(g), dtype=bool)
        newg[1:] = g[1:] != g[:-1]
        starts = np.flatnonzero(newg)
        lens = np.diff(np.append(starts, len(g)))
        full = lens >= k
        hk = h[starts + np.minimum(lens - 1, k - 1)]  # k-th smallest
        est = np.where(
            full,
            np.float64(k - 1) / (hk.astype(np.float64)
                                 / 18446744073709551616.0),
            lens.astype(np.float64))
        return pa.table({group_col: pa.array(g[starts]),
                         "n_kept": pa.array(np.minimum(lens, k)),
                         out_name: pa.array(est)})

    return grouped_by_bucket(parts, merge, entity_col=group_col,
                             num_buckets=num_buckets)
