"""Token-distribution drift between two corpus slices — per-token KL
contributions with add-one smoothing.

The dataset-QA operator for training-data mixing: did the web slice's
unigram distribution drift from the rest of the corpus? For every token
``t``: ``p = (c_p+1)/(N_p+V)``, ``q = (c_q+1)/(N_q+V)``,
``contrib = p·ln(p/q)`` (a term of KL(p‖q); V = joint vocabulary size, so
unseen-on-one-side tokens are defined). Counts are exact int64 end-to-end;
the only floats are the final two divisions and one log, evaluated in the
same expression shape the SQL oracle uses.

Plan: map-only per-block (token, c_p, c_q) partials off the flat Arrow
token buffer (np.unique over ≤vocab distinct values — the exchange carries
vocab-bounded partials, not tokens), ``groupby(token).sum``, scalar totals
via Dataset aggregates, then a map-only score with per-block partial top-k
(pmi.py's merge pattern: the driver sees ≤ k·blocks rows).

Reference lineage: `entropy` (information-theoretic family,
`/root/reference/src/mhealth/generic/information.py:8-20`) extended to a
two-sample divergence; SURVEY §2.9.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _round_away(x: np.ndarray, d: int = 6) -> np.ndarray:
    m = 10.0**d
    return np.sign(x) * np.floor(np.abs(x) * m + 0.5) / m


def token_slice_counts(ds, tokens_col: str, flag_col: str):
    """Dataset of (tok, cp, cq): exact token counts inside / outside the
    boolean ``flag_col`` slice."""

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.int64)
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
        flag = batch[flag_col]
        if isinstance(flag, pa.ChunkedArray):
            flag = flag.combine_chunks()
        inp = np.repeat(flag.to_numpy(zero_copy_only=False).astype(bool), lens)
        toks, inv = np.unique(flat, return_inverse=True)
        cp = np.bincount(inv, weights=inp, minlength=len(toks)).astype(np.int64)
        cq = np.bincount(inv, weights=~inp, minlength=len(toks)).astype(np.int64)
        return pa.table({"tok": pa.array(toks), "cp": pa.array(cp),
                         "cq": pa.array(cq)})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
    agg = partials.groupby("tok").sum(["cp", "cq"])
    return agg.map_batches(
        lambda b: b.rename_columns(["tok", "cp", "cq"]),
        batch_format="pyarrow")


def token_drift_topk(ds, tokens_col: str, flag_col: str, k: int = 25):
    """Top-k tokens by smoothed KL contribution p·ln(p/q) (descending,
    token-id tiebreak). Returns a pyarrow.Table: tok, cp, cq, contrib, rn."""
    counts = token_slice_counts(ds, tokens_col, flag_col).materialize()
    np_tot = counts.sum(["cp", "cq"])
    n_p, n_q = int(np_tot["sum(cp)"]), int(np_tot["sum(cq)"])
    vocab = counts.count()

    def score(batch: pa.Table) -> pa.Table:
        tok = batch["tok"].to_numpy(zero_copy_only=False)
        cp = batch["cp"].to_numpy(zero_copy_only=False)
        cq = batch["cq"].to_numpy(zero_copy_only=False)
        p = (cp + 1).astype(np.float64) / (n_p + vocab)
        q = (cq + 1).astype(np.float64) / (n_q + vocab)
        contrib = _round_away(p * np.log(p / q), 6)
        tbl = pa.table({"tok": pa.array(tok.astype(np.int64)),
                        "cp": pa.array(cp.astype(np.int64)),
                        "cq": pa.array(cq.astype(np.int64)),
                        "contrib": pa.array(contrib)})
        order = pc.sort_indices(tbl, sort_keys=[
            ("contrib", "descending"), ("tok", "ascending")])
        return tbl.take(order[:k])

    top = counts.map_batches(score, batch_format="pyarrow",
                             batch_size=None).take_all()
    top.sort(key=lambda r: (-r["contrib"], r["tok"]))
    top = top[:k]
    return pa.table({
        "tok": pa.array([r["tok"] for r in top], type=pa.int64()),
        "cp": pa.array([r["cp"] for r in top], type=pa.int64()),
        "cq": pa.array([r["cq"] for r in top], type=pa.int64()),
        "contrib": pa.array([r["contrib"] for r in top], type=pa.float64()),
        "rn": pa.array(np.arange(1, len(top) + 1, dtype=np.int64)),
    })
