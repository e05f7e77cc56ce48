"""Deterministic hash-based sampling and train/eval splitting.

Training-data pipelines need samples and splits that are (a) reproducible
across reruns and cluster sizes, (b) computable map-only (no shuffle, no
global state), and (c) consistent for the same key everywhere — the same
document must land in the same split in every job that ever touches it.
Random sampling gives none of these; keyed hashing gives all three.

Rule: a row is kept (or assigned a split) by comparing the first 8 hex
chars of ``md5(f"{key}-{salt}")`` against the fraction's threshold —
lowercase-hex lexicographic order equals numeric order, so the exact same
predicate runs in any SQL engine (``substr(md5(...),1,8) < '...'``), which
is how the driver oracle checks it. md5 is uniform enough that the kept
fraction converges to the target at corpus scale (binomial error only).

Map-only: each batch filters independently; hashing is done once per
DISTINCT key per batch (dictionary-encode first). Stateless tasks — no
actor pool needed.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _hex8(col, salt: str) -> np.ndarray:
    """First 8 md5 hex chars of f"{value}-{salt}" per row, hashed once per
    distinct value within the batch."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    enc = col.dictionary_encode()
    idx = enc.indices.to_numpy(zero_copy_only=False)
    uniq = enc.dictionary.to_pylist()
    h = np.array(
        [hashlib.md5(f"{v}-{salt}".encode()).hexdigest()[:8] for v in uniq],
        dtype=object,
    )
    return h[idx]


def _threshold_hex(fraction: float) -> str:
    """8-hex-digit threshold: P(md5-prefix < threshold) == fraction up to
    1/16^8 quantization."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return format(min(int(fraction * 16**8), 16**8 - 1), "08x")


def hash_sample(ds, key_col: str, fraction: float, salt: str = "0"):
    """Keep ~``fraction`` of rows, keyed on ``key_col``: deterministic,
    rerun-stable, and consistent — every row of a key is kept or dropped
    together. SQL-equivalent predicate:
    ``substr(md5(key || '-' || salt), 1, 8) < '<threshold>'``."""
    thr = _threshold_hex(fraction)

    def fn(batch: pa.Table) -> pa.Table:
        keep = _hex8(batch[key_col], salt) < thr
        return batch.filter(pa.array(keep.astype(bool)))

    return ds.map_batches(fn, batch_format="pyarrow")


def split_train_eval(ds, key_col: str, eval_fraction: float = 0.1,
                     salt: str = "0", split_name: str = "split"):
    """Append a ``split`` column ('eval' below the hash threshold, 'train'
    otherwise). Same guarantees as :func:`hash_sample`; the complementary
    predicate means train/eval are disjoint and exhaustive by
    construction."""
    thr = _threshold_hex(eval_fraction)

    def fn(batch: pa.Table) -> pa.Table:
        is_eval = _hex8(batch[key_col], salt) < thr
        lab = np.where(is_eval.astype(bool), "eval", "train")
        return batch.append_column(split_name, pa.array(lab.tolist(), type=pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def _hexn(col, salt: str, n: int) -> np.ndarray:
    """First ``n`` md5 hex chars of f"{value}-{salt}" per row (per-distinct
    hashing, same contract as :func:`_hex8`)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    enc = col.dictionary_encode()
    idx = enc.indices.to_numpy(zero_copy_only=False)
    uniq = enc.dictionary.to_pylist()
    h = np.array(
        [hashlib.md5(f"{v}-{salt}".encode()).hexdigest()[:n] for v in uniq],
        dtype=object,
    )
    return h[idx]


def grouped_sample_k(ds, group_cols, key_col: str, k: int, salt: str = "0",
                     rank_name: str = "rn", num_buckets: int = 256):
    """Deterministic uniform k-per-group sample WITHOUT replacement: rank
    rows by the md5-priority of their key (uniform on [0,1), so the k
    smallest priorities are a uniform k-subset) and keep rank <= k. Same
    rerun/cluster-size/SQL reproducibility story as :func:`hash_sample`
    (oracle: ``row_number() OVER (PARTITION BY g ORDER BY
    substr(md5(...),1,16), key) <= k``); scalability = ``grouped_topk``'s
    map-side per-block partials."""
    from pymhealth_ray.stages.aggregate import grouped_topk

    PRI = "__pri"

    def with_priority(batch: pa.Table) -> pa.Table:
        pri = _hexn(batch[key_col], salt, 16)
        return batch.append_column(PRI, pa.array(pri.tolist(), type=pa.string()))

    sampled = grouped_topk(
        ds.map_batches(with_priority, batch_format="pyarrow"),
        group_cols, PRI, k, descending=False, tie_cols=[key_col],
        rank_name=rank_name, num_buckets=num_buckets,
    )

    def drop_pri(batch: pa.Table) -> pa.Table:
        return batch.drop_columns([PRI])

    return sampled.map_batches(drop_pri, batch_format="pyarrow")


def grouped_weighted_sample_k(ds, group_cols, key_col: str, weight_col: str,
                              k: int, salt: str = "0", rank_name: str = "rn",
                              num_buckets: int = 256):
    """Weighted k-per-group sampling WITHOUT replacement — the data-mixing
    primitive (sample sequences proportionally to token count, balance
    sources by quality weight, ...). Efraimidis-Spirakis A-ES: each row
    gets priority ``-ln(u)/w`` with ``u`` the row key's md5-uniform in
    (0,1); the k SMALLEST priorities per group are exactly a weighted
    sample without replacement. ``u`` is keyed (not random), so the sample
    is rerun-stable and identical at any cluster size; rows with w <= 0
    get +inf priority (never sampled). ``key_col`` must be row-unique
    within its group (build a composite key upstream if needed).
    Distributed via ``grouped_topk``'s map-side partials."""
    from pymhealth_ray.stages.aggregate import grouped_topk

    PRI = "__wpri"

    def with_priority(batch: pa.Table) -> pa.Table:
        u_hex = _hexn(batch[key_col], salt, 16)
        u = np.array([int(h, 16) for h in u_hex], dtype=np.uint64)
        # (0,1): +1 / 2^64+2 keeps u strictly inside the open interval
        uf = (u.astype(np.float64) + 1.0) / 18446744073709551618.0
        w = batch[weight_col]
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        wv = w.to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(divide="ignore"):
            pri = np.where(wv > 0, -np.log(uf) / np.maximum(wv, 1e-300), np.inf)
        batch = batch.append_column(PRI, pa.array(pri))
        # w <= 0 rows are EXCLUDED (not merely deprioritized): "never
        # sampled" must hold even when k >= group size
        return batch.filter(pa.array(np.isfinite(pri)))

    sampled = grouped_topk(
        ds.map_batches(with_priority, batch_format="pyarrow"),
        group_cols, PRI, k, descending=False, tie_cols=[key_col],
        rank_name=rank_name, num_buckets=num_buckets,
    )
    return sampled.map_batches(lambda b: b.drop_columns([PRI]),
                               batch_format="pyarrow")


def stratified_sample(ds, strata_col: str, key_col: str,
                      rates: dict, default_rate: float = 0.0,
                      salt: str = "0"):
    """Per-stratum deterministic hash sampling — the training-data MIXTURE
    control: keep each stratum (source / language / domain) at its own
    rate so the output matches a target composition. Same md5-threshold
    contract as :func:`hash_sample` (rerun-stable, cluster-size-invariant,
    SQL-reproducible via a CASE over thresholds); stateless map-only, so
    at 100 TB it is pure scan-rate."""
    thr_map = {k: _threshold_hex(v) for k, v in rates.items()}
    default_thr = _threshold_hex(default_rate)

    def fn(batch: pa.Table) -> pa.Table:
        h = _hex8(batch[key_col], salt)
        strata = batch[strata_col]
        if isinstance(strata, pa.ChunkedArray):
            strata = strata.combine_chunks()
        enc = strata.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        thr = np.array([thr_map.get(v, default_thr)
                        for v in enc.dictionary.to_pylist()], dtype=object)
        keep = h < thr[idx]
        return batch.filter(pa.array(keep.astype(bool)))

    return ds.map_batches(fn, batch_format="pyarrow")


def temperature_thresholds(counts: dict, alpha: float = 0.5) -> dict:
    """Per-group keep rates for multinomial temperature sampling
    (downsample-only variant): target composition ∝ n_g^alpha, anchored so
    the SMALLEST group is kept whole — keep_rate_g = (n_min / n_g)^(1-alpha).

    The rebalancing rule used for multilingual corpora (XLM-R / mT5 style
    alpha-sampling; reference computes no such thing — this is a
    training-data op the 100 TB tier needs). With the default alpha=0.5 the
    rate is a single ``sqrt(n_min/n_g)`` — both numpy and DuckDB evaluate
    IEEE-correctly-rounded sqrt and division, so the md5 threshold below is
    bit-identical to the SQL oracle. Returns {group: 15-hex threshold or
    None}; None means "keep all" (the n_min group).
    """
    if not counts:
        return {}
    n_min = min(counts.values())
    out: dict = {}
    for g, n in counts.items():
        if n == n_min:
            out[g] = None
            continue
        if alpha == 0.5:
            rate = float(np.sqrt(np.float64(n_min) / np.float64(n)))
        else:
            rate = float((np.float64(n_min) / np.float64(n)) ** (1.0 - alpha))
        # 16^15 = 2^60 is an exact power of two: the multiply only shifts
        # the exponent, so floor() agrees bit-for-bit with DuckDB's
        # floor(rate * 1152921504606846976)
        out[g] = format(int(np.floor(rate * float(16**15))), "015x")
    return out


def temperature_sample(ds, group_col: str, key_col: str, alpha: float = 0.5,
                       salt: str = "temp"):
    """Deterministic temperature (alpha) sampling across a provenance
    column: per-group md5-threshold keep with rates from
    :func:`temperature_thresholds`, so group sizes end up ∝ n_g^alpha.

    Plan: one bounded partial-count pass (per-block value_counts merged on
    the driver — bounded by |groups| × blocks, groups = languages/sources,
    a small domain by construction), then a stateless map-only filter. At
    100 TB this is two scans and zero exchanges; the count pass reads only
    ``group_col``.
    """
    def partial(b: pa.Table) -> pa.Table:
        vc = pc.value_counts(b[group_col].combine_chunks()
                             if isinstance(b[group_col], pa.ChunkedArray)
                             else b[group_col])
        return pa.table({"g": vc.field("values"),
                         "c": vc.field("counts").cast(pa.int64())})

    counts: dict = {}
    for t in (ds.select_columns([group_col])
              .map_batches(partial, batch_format="pyarrow", batch_size=None)
              .iter_batches(batch_format="pyarrow")):
        for g, c in zip(t["g"].to_pylist(), t["c"].to_pylist()):
            counts[g] = counts.get(g, 0) + c
    thr_map = temperature_thresholds(counts, alpha)
    import ray as _ray
    thr_ref = _ray.put(thr_map)

    def keep(batch: pa.Table) -> pa.Table:
        tm = _ray.get(thr_ref)
        h = _hexn(batch[key_col], salt, 15)
        grp = batch[group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        enc = grp.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        uniq = enc.dictionary.to_pylist()
        thr = np.array([tm.get(v) for v in uniq], dtype=object)
        keep_all = np.array([tm.get(v) is None for v in uniq], dtype=bool)
        row_thr = thr[idx]
        mask = keep_all[idx] | (h < np.where(row_thr == None, "", row_thr))  # noqa: E711
        return batch.filter(pa.array(mask.astype(bool)))

    return ds.map_batches(keep, batch_format="pyarrow")
