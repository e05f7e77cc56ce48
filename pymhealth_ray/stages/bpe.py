"""Distributed BPE merge training over a tokenized corpus — the
tokenizer-construction step of a training-data pipeline (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units").

Each round: exact corpus-wide adjacent-pair counts (map-side ``np.unique``
partials → ``keyed_sum``, the no-sort high-cardinality plan), the most
frequent pair (ties: smaller left id, then smaller right id) becomes a new
symbol, and subsequent rounds count pairs over the corpus WITH all merges
so far applied map-side. The corpus itself is never re-materialized
between rounds — round r re-applies the r-entry merge list inside the
counting map (O(k²) vectorized merge passes total, zero intermediate
corpus storage), which keeps the plan streaming and partitioning-invariant
at any scale. At 100 TB you train the merge table on a sample (BPE
statistics saturate quickly) and ``apply_bpe`` to the full corpus —
the merge list is a tiny broadcast either way.

Merge application is the exact sequential semantics, vectorized: match
positions of (a, b) in the flat token buffer, then left-to-right
non-overlapping resolution by keeping alternate members of each
consecutive-match run (only overlapping case is a==b runs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _apply_merge(flat: np.ndarray, offs: np.ndarray, a: int, b: int,
                 new_id: int):
    """One merge pass over the flat row-concatenated buffer: replace every
    left-to-right non-overlapping (a, b) with new_id. Returns (flat, offs)."""
    n = len(flat)
    if n < 2:
        return flat, offs
    rowid = np.repeat(np.arange(len(offs) - 1, dtype=np.int64),
                      np.diff(offs))
    match = (flat[:-1] == a) & (flat[1:] == b) & (rowid[:-1] == rowid[1:])
    m = np.flatnonzero(match)
    if not len(m):
        return flat, offs
    # left-to-right non-overlap: within each run of CONSECUTIVE match
    # positions keep every other one (runs only overlap when a == b)
    run_break = np.flatnonzero(np.diff(m) != 1)
    run_start_idx = np.concatenate(([0], run_break + 1))
    run_len = np.diff(np.append(run_start_idx, len(m)))
    pos_in_run = np.arange(len(m)) - np.repeat(run_start_idx, run_len)
    kept = m[pos_in_run % 2 == 0]
    out = flat.copy()
    out[kept] = new_id
    keep_mask = np.ones(n, dtype=bool)
    keep_mask[kept + 1] = False
    del_per_row = np.bincount(rowid[kept], minlength=len(offs) - 1)
    new_offs = offs - np.concatenate(([0], np.cumsum(del_per_row)))
    return out[keep_mask], new_offs


def _flat_of(col) -> tuple[np.ndarray, np.ndarray]:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.int64)
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    offs = np.concatenate(([0], np.cumsum(lens)))
    return flat, offs


def _pair_counts_round(ds, tokens_col: str, merges: list, big: int,
                       num_buckets: int = 128):
    """Exact adjacent-pair counts with the merge list applied map-side."""
    from pymhealth_ray.stages.aggregate import keyed_sum

    merges_t = tuple(merges)

    def partial(batch: pa.Table) -> pa.Table:
        flat, offs = _flat_of(batch[tokens_col])
        for (a, b, nid) in merges_t:
            flat, offs = _apply_merge(flat, offs, a, b, nid)
        if len(flat) < 2:
            return pa.table({"key": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        rowid = np.repeat(np.arange(len(offs) - 1, dtype=np.int64),
                          np.diff(offs))
        ok = rowid[:-1] == rowid[1:]
        keys = flat[:-1][ok] * big + flat[1:][ok]
        vals, cnts = np.unique(keys, return_counts=True)
        return pa.table({"key": pa.array(vals),
                         "c": pa.array(cnts.astype(np.int64))})

    # precombine at 2M partial rows: per-block partials are ~vocab²-dense,
    # so the default 8M coalesce leaves only 1 serial combine task at this
    # corpus size — smaller batches keep the pre-exchange combine parallel
    return keyed_sum(ds.map_batches(partial, batch_format="pyarrow",
                                    batch_size=None), "key", ["c"],
                     num_buckets=num_buckets, precombine_rows=2_000_000)


def bpe_train(ds, tokens_col: str = "tokens", n_merges: int = 8,
              base_vocab: int = 2048, min_count: int = 2):
    """Learn ``n_merges`` BPE merges; returns a pandas DataFrame
    (rank, a, b, new_id, count) — new ids are ``base_vocab + rank``.
    Stops early when no pair reaches ``min_count``. Deterministic and
    partitioning-invariant (exact counts; count-desc, a-asc, b-asc ties)."""
    import pandas as pd

    big = base_vocab + n_merges + 1
    merges: list = []
    rows = []
    for r in range(n_merges):
        counts = _pair_counts_round(ds, tokens_col, merges, big)
        best = None  # (-c, a, b)
        for batch in counts.iter_batches(batch_format="pyarrow"):
            k = batch["key"].to_numpy(zero_copy_only=False)
            c = batch["c"].to_numpy(zero_copy_only=False)
            if not len(k):
                continue
            a, b = k // big, k % big
            order = np.lexsort((b, a, -c))[0]
            cand = (-int(c[order]), int(a[order]), int(b[order]))
            if best is None or cand < best:
                best = cand
        if best is None or -best[0] < min_count:
            break
        cnt, a, b = -best[0], best[1], best[2]
        new_id = base_vocab + r
        merges.append((a, b, new_id))
        rows.append((r, a, b, new_id, cnt))
    return pd.DataFrame(rows, columns=["rank", "a", "b", "new_id", "count"])


def apply_bpe(ds, merges, tokens_col: str = "tokens",
              out_col: str | None = None):
    """Map-side application of a learned merge list (list of (a, b, new_id)
    or the bpe_train DataFrame) — the tiny-broadcast re-tokenization pass.
    Output replaces ``tokens_col`` (or writes ``out_col``) and refreshes
    an ``n_tok``-style length via ``{out}_len``."""
    import ray

    if hasattr(merges, "itertuples"):
        merges = [(int(r.a), int(r.b), int(r.new_id))
                  for r in merges.itertuples()]
    merges_ref = ray.put(tuple(merges))
    out_col = out_col or tokens_col

    def fn(batch: pa.Table) -> pa.Table:
        ms = ray.get(merges_ref)
        flat, offs = _flat_of(batch[tokens_col])
        for (a, b, nid) in ms:
            flat, offs = _apply_merge(flat, offs, a, b, nid)
        arr = pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()),
            pa.array(flat.astype(np.int32), type=pa.int32()))
        names = batch.column_names
        if out_col in names:
            batch = batch.set_column(names.index(out_col), out_col, arr)
        else:
            batch = batch.append_column(out_col, arr)
        return batch.append_column(
            f"{out_col}_len", pa.array(np.diff(offs).astype(np.int64)))

    return ds.map_batches(fn, batch_format="pyarrow")
