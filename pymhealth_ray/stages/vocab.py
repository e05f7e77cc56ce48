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
