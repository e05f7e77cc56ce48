"""Global token counting / vocabulary building — the canonical corpus
map-reduce, fully Arrow-vectorized.

The reference computes per-array histograms in one process
(reference:generic/information.py entropy over np.unique counts); this is
the corpus-scale generalization: tokenize → count → merge → top-k.

- tokenize + count inside each block with Arrow kernels only
  (``pc.split_pattern`` → ``flatten`` → ``pc.value_counts``) — no Python
  token loop anywhere;
- the exchange carries (token, count) partials, bucketed by token hash, so
  merge volume is |distinct tokens| per block, not the corpus;
- global top-k prunes map-side first (any global top-k token must be in
  some bucket's top-k, because buckets partition the distinct tokens), so
  the final single-group selection sees at most k rows per bucket.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pymhealth_ray.stages.partition import _stable_bucket_of


def token_vocabulary(ds, text_col: str = "text", token_name: str = "tok",
                     count_name: str = "c", num_buckets: int = 256,
                     pattern: str = " "):
    """Corpus-wide token → count Dataset. Tokenization is a literal split
    on ``pattern`` with empty tokens dropped (identical to SQL
    ``string_split`` + ``tok <> ''``, which is how the oracle checks it)."""

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern(col, pattern=pattern).flatten()
        vc = pc.value_counts(toks)
        tok = vc.field("values")
        cnt = vc.field("counts").cast(pa.int64())
        keep = pc.not_equal(tok, "")
        tok, cnt = tok.filter(keep), cnt.filter(keep)
        b = _stable_bucket_of(tok, num_buckets)
        return pa.table({
            token_name: tok,
            count_name: cnt,
            "__aggbucket": pa.array(b, type=pa.int32()),
        })

    def final_bucket(tbl: pa.Table) -> pa.Table:
        out = tbl.drop_columns(["__aggbucket"]).group_by(token_name).aggregate(
            [(count_name, "sum")])
        return out.rename_columns([token_name, count_name])

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return partials.groupby("__aggbucket").map_groups(final_bucket, batch_format="pyarrow")


def top_tokens(ds, text_col: str = "text", k: int = 50, rank_name: str = "rn",
               num_buckets: int = 256, pattern: str = " "):
    """Top-k tokens by corpus count (count desc, token asc tie-break,
    ranked) — ``token_vocabulary`` followed by map-side top-k pruning and
    one k*num_buckets-row final selection."""
    from pymhealth_ray.stages.aggregate import _topk_rows

    vocab = token_vocabulary(ds, text_col=text_col, num_buckets=num_buckets,
                             pattern=pattern)

    def prune(batch: pa.Table) -> pa.Table:
        batch = batch.append_column("__g", pa.array(
            np.zeros(batch.num_rows, dtype=np.int8)))
        return _topk_rows(batch, ["__g"], "c", k, True, ["tok"])

    def final(tbl: pa.Table) -> pa.Table:
        out = _topk_rows(tbl, ["__g"], "c", k, True, ["tok"], rank_name=rank_name)
        return out.drop_columns(["__g"])

    return vocab.map_batches(prune, batch_format="pyarrow").groupby("__g").map_groups(
        final, batch_format="pyarrow")


# --------------------------------------------------------------------------
# token-native n-grams (over list<int32> token arrays, no text)
# --------------------------------------------------------------------------

NGRAM_BITS = {2: 32, 3: 21}  # id bits per position; ids must fit


def _ngram_codes(list_arr, n: int):
    """Vectorized within-row n-gram codes for a list<int> array: pack the
    n token ids into one int64 (NGRAM_BITS[n] bits each). No Python loop —
    adjacency masks come straight off the list offsets."""
    if isinstance(list_arr, pa.ChunkedArray):
        list_arr = list_arr.combine_chunks()
    bits = NGRAM_BITS[n]
    off = np.asarray(list_arr.offsets, dtype=np.int64)
    off = off - off[0]  # slice-safe: flatten() below re-bases the values
    vals = np.asarray(list_arr.flatten().to_numpy(zero_copy_only=False),
                      dtype=np.int64)
    if len(vals) and (vals.max() >= (1 << bits) or vals.min() < 0):
        raise ValueError(f"token ids must be in [0, 2^{bits}) for n={n}")
    if len(vals) < n:
        return np.empty(0, dtype=np.int64)
    # a window starting at i is valid iff it stays inside i's row: the row
    # ends (off[1:]) invalidate the n-1 starts before each boundary
    valid = np.ones(len(vals) - (n - 1), dtype=bool)
    bnd = off[1:-1]
    for j in range(1, n):
        idx = bnd - j
        idx = idx[(idx >= 0) & (idx < len(valid))]
        valid[idx] = False
    code = vals[: len(vals) - (n - 1)].copy()
    for j in range(1, n):
        code = (code << bits) | vals[j: len(vals) - (n - 1) + j]
    return code[valid]


def ngram_vocabulary(ds, tokens_col: str = "tokens", n: int = 2,
                     num_buckets: int = 256):
    """Corpus-wide n-gram → count Dataset over token arrays (columns
    ``code:int64, c:int64``). Same partial/merge shape as
    :func:`token_vocabulary`: the exchange carries per-block distinct
    (code, count) partials bucketed by a vectorized hash of the code."""

    def partial(batch: pa.Table) -> pa.Table:
        code = _ngram_codes(batch[tokens_col], n)
        uniq, cnt = np.unique(code, return_counts=True)
        b = _stable_bucket_of(pa.array(uniq, type=pa.int64()), num_buckets)
        return pa.table({
            "code": pa.array(uniq),
            "c": pa.array(cnt.astype(np.int64)),
            "__aggbucket": pa.array(b, type=pa.int32()),
        })

    def final_bucket(tbl: pa.Table) -> pa.Table:
        out = tbl.drop_columns(["__aggbucket"]).group_by("code").aggregate(
            [("c", "sum")])
        return out.rename_columns(["code", "c"])

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return partials.groupby("__aggbucket").map_groups(
        final_bucket, batch_format="pyarrow")


def top_ngrams(ds, tokens_col: str = "tokens", n: int = 2, k: int = 50,
               rank_name: str = "rn", num_buckets: int = 256):
    """Top-k token n-grams by corpus count (count desc, gram asc tie-break)
    with map-side pruning; output unpacks the code into t1..tn (int32)."""
    from pymhealth_ray.stages.aggregate import _topk_rows

    vocab = ngram_vocabulary(ds, tokens_col=tokens_col, n=n,
                             num_buckets=num_buckets)
    bits = NGRAM_BITS[n]

    def prune(batch: pa.Table) -> pa.Table:
        batch = batch.append_column("__g", pa.array(
            np.zeros(batch.num_rows, dtype=np.int8)))
        return _topk_rows(batch, ["__g"], "c", k, True, ["code"])

    def final(tbl: pa.Table) -> pa.Table:
        out = _topk_rows(tbl, ["__g"], "c", k, True, ["code"],
                         rank_name=rank_name).drop_columns(["__g"])
        code = out["code"].to_numpy(zero_copy_only=False)
        cols = {}
        mask = (1 << bits) - 1
        for j in range(n):
            cols[f"t{j + 1}"] = pa.array(
                ((code >> (bits * (n - 1 - j))) & mask).astype(np.int32))
        cols["c"] = out["c"]
        cols[rank_name] = out[rank_name]
        return pa.table(cols)

    return vocab.map_batches(prune, batch_format="pyarrow").groupby("__g").map_groups(
        final, batch_format="pyarrow")


def scrub_tokens(ds, stop, tokens_col: str = "tokens"):
    """Remove a BROADCAST stop-set of token ids from every sequence —
    the stopword/blocklist scrub of a tokenized corpus. The set ships
    once through the object store (``ray.put``) and every batch filters
    with one vectorized ``np.isin`` + offset rebuild; no exchange, no
    per-row loop — map-only at any corpus size. Appends
    ``<tokens_col>_kept`` (same list<int32> layout) to each batch."""
    import ray

    import pyarrow.compute as pc

    stop_ref = ray.put(np.asarray(stop, dtype=np.int64))

    def fn(b: pa.Table) -> pa.Table:
        if tokens_col not in b.column_names:  # schema-less empty block
            return b
        sarr = ray.get(stop_ref)
        col = b[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = pc.list_value_length(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = ~np.isin(flat, sarr)
        row = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        kept_per_row = np.bincount(row[keep], minlength=len(lens))
        new_off = np.concatenate(
            ([0], np.cumsum(kept_per_row))).astype(np.int32)
        kept = pa.ListArray.from_arrays(
            pa.array(new_off, type=pa.int32()),
            pa.array(flat[keep].astype(np.int32), type=pa.int32()))
        return b.append_column(f"{tokens_col}_kept", kept)

    return ds.map_batches(fn, batch_format="pyarrow")


def downsample_tokens(ds, heavy_tok, thr_u32, tokens_col: str = "tokens",
                      key_cols=("doc_id", "ts_ns"), salt: str = "w2v"):
    """Word2vec-style FREQUENCY DOWNSAMPLING of a tokenized corpus
    (Mikolov et al. 2013 subsampling): each occurrence of a *heavy*
    token — corpus frequency f above the threshold t — is kept iff a
    deterministic per-occurrence uniform falls below ``sqrt(t/f)``;
    rare tokens are always kept and never hashed.

    The broadcast side is the heavy set only, which is bounded by
    construction at ≤ 1/t tokens (a few hundred for t=1e-3) at ANY
    corpus size — the counts table itself never ships. The uniform is
    the first 8 md5 hex digits of ``"{key...}:{pos}-{salt}"`` (pos is
    1-based, matching SQL ``generate_subscripts``), so the exact same
    predicate runs in DuckDB; a production pipeline would swap in a
    vectorized splitmix hash at the cost of SQL reproducibility — the
    md5 loop touches only heavy occurrences and parallelizes across
    blocks. Map-only, zero exchange. Appends ``<tokens_col>_kept``.

    ``heavy_tok`` must be SORTED int64 token ids; ``thr_u32`` the
    aligned int64 thresholds in [0, 2**32).
    """
    import hashlib

    import ray

    heavy_tok = np.asarray(heavy_tok, dtype=np.int64)
    thr_u32 = np.asarray(thr_u32, dtype=np.int64)
    if heavy_tok.size and np.any(heavy_tok[1:] <= heavy_tok[:-1]):
        raise ValueError("heavy_tok must be strictly sorted")
    ref = ray.put((heavy_tok, thr_u32))

    def fn(b: pa.Table) -> pa.Table:
        if tokens_col not in b.column_names:  # schema-less empty block
            return b
        htok, thr = ray.get(ref)
        col = b[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = pc.list_value_length(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n = flat.size
        keep = np.ones(n, dtype=bool)
        if htok.size and n:
            idx = np.searchsorted(htok, flat)
            idx_c = np.minimum(idx, htok.size - 1)
            hmask = htok[idx_c] == flat
            hits = np.flatnonzero(hmask)
            if hits.size:
                row = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
                # 1-based position within the sequence
                pos = (np.arange(n, dtype=np.int64)
                       - np.repeat(np.concatenate(([0], np.cumsum(lens[:-1]))),
                                   lens) + 1)
                kcols = [(b[c].combine_chunks()
                          if isinstance(b[c], pa.ChunkedArray)
                          else b[c]).to_pylist() for c in key_cols]
                row_key = [":".join(str(x) for x in t)
                           for t in zip(*kcols)]
                hit_rows = row[hits]
                hit_pos = pos[hits]
                u = np.fromiter(
                    (int(hashlib.md5(
                        f"{row_key[r]}:{p}-{salt}".encode())
                        .hexdigest()[:8], 16)
                     for r, p in zip(hit_rows, hit_pos)),
                    dtype=np.int64, count=hits.size)
                keep[hits] = u < thr[idx_c[hits]]
        kept_per_row = np.zeros(len(lens), dtype=np.int64)
        if n:
            row_all = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
            kept_per_row = np.bincount(row_all[keep], minlength=len(lens))
        new_off = np.concatenate(
            ([0], np.cumsum(kept_per_row))).astype(np.int32)
        kept = pa.ListArray.from_arrays(
            pa.array(new_off, type=pa.int32()),
            pa.array(flat[keep].astype(np.int32), type=pa.int32()))
        return b.append_column(f"{tokens_col}_kept", kept)

    return ds.map_batches(fn, batch_format="pyarrow")
