"""Distributed subword tokenization — greedy longest-match (WordPiece-
style) encoding with a corpus-derived broadcast vocabulary.

This is the canonical "apply a tokenizer to 100 TB of text" stage:

- the VOCABULARY is the only global state. It is derived from the corpus
  with the bounded exchanges that already exist (top-k words via
  stages/vocab.py's map-side-pruned wordcount; the observed character set
  via per-block distinct partials), assembled deterministically on the
  driver, and broadcast ONCE via ``ray.put`` — never re-shipped per batch.
- ENCODING is map-only. Each actor materializes the piece dict in
  ``__init__`` and keeps a word→ids cache across batches; per batch only
  the DISTINCT uncached words run the (inherently char-level) greedy
  matcher, and rows are reassembled vectorized from inverse indices +
  list offsets. On natural-language corpora distinct words per batch are
  a small fraction of tokens, so the Python matcher is amortized away.

Greedy longest-match spec (the materialized oracle reimplements this
independently — pipelines/queries.py:_tokenize_expected):
- words are the literal split on " " with empties dropped (tokenizer
  parity with the vocabulary / SQL oracles);
- a word is encoded left-to-right, taking the LONGEST vocab piece at each
  position; positions > 0 match "##"-prefixed continuation pieces;
- if no piece matches at some position the WHOLE word becomes [UNK]
  (standard WordPiece semantics);
- ids: [UNK]=0, then every other piece in lexicographic order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

UNK = "[UNK]"


def build_wordpiece_vocab(ds, text_col: str = "text", num_words: int = 200,
                          num_buckets: int = 256) -> dict:
    """piece → id dict: top-``num_words`` corpus words (count desc, word
    asc tie-break) as whole-word pieces, plus every observed character as
    both an initial piece and a "##" continuation piece. Both corpus scans
    exchange only bounded partials (top-k prune / per-block charsets)."""
    from pymhealth_ray.stages.vocab import top_tokens

    top = pa.concat_tables(top_tokens(
        ds, text_col=text_col, k=num_words, num_buckets=num_buckets
    ).iter_batches(batch_format="pyarrow", batch_size=None))
    words = top["tok"].to_pylist()

    def charset(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        chars = sorted(set("".join(col.to_pylist()).replace(" ", "")))
        return pa.table({"ch": pa.array(chars, type=pa.string())})

    ch_parts = pa.concat_tables(ds.map_batches(
        charset, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow", batch_size=None))
    chars = set(ch_parts["ch"].to_pylist())

    pieces = set(words) | chars | {"##" + c for c in chars}
    vocab = {UNK: 0}
    for i, p in enumerate(sorted(pieces), start=1):
        vocab[p] = i
    return vocab


def _greedy_encode(word: str, vocab: dict, max_len: int) -> list:
    ids = []
    i = 0
    n = len(word)
    while i < n:
        j = min(n, i + max_len)
        hit = None
        while j > i:
            piece = word[i:j] if i == 0 else "##" + word[i:j]
            pid = vocab.get(piece)
            if pid is not None:
                hit = (pid, j)
                break
            j -= 1
        if hit is None:
            return [0]
        ids.append(hit[0])
        i = hit[1]
    return ids


class WordpieceEncoder:
    """Actor-pool ``map_batches`` callable: encode ``text_col`` and emit
    per-doc summary columns (``n_tok, n_unk, tok_sum, tok_md5``) and,
    when ``emit_tokens``, the ``tokens:list<int32>`` payload itself."""

    def __init__(self, vocab_ref, text_col: str = "text",
                 emit_tokens: bool = False, cache_cap: int = 1_000_000):
        self.vocab = ray.get(vocab_ref) if isinstance(
            vocab_ref, ray.ObjectRef) else vocab_ref
        # over-estimate (continuations contribute len-2) — only bounds the
        # greedy scan start, extra dict misses are harmless
        self.max_len = max(map(len, self.vocab)) if self.vocab else 1
        self.text_col = text_col
        self.emit_tokens = emit_tokens
        self.cache: dict = {}
        self.cache_cap = cache_cap  # bound actor heap on adversarial corpora

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        col = batch[self.text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        words_list = pc.split_pattern(col, pattern=" ")
        off = np.asarray(words_list.offsets, dtype=np.int64)
        off = off - off[0]
        flat = words_list.flatten().to_pylist()
        keep = np.array([w != "" for w in flat], dtype=bool)
        row_of = np.repeat(np.arange(batch.num_rows, dtype=np.int64),
                           np.diff(off))[keep] if len(flat) else np.empty(0, np.int64)
        kept = [w for w in flat if w != ""]

        uniq, inv = (np.unique(np.asarray(kept, dtype=object),
                               return_inverse=True)
                     if kept else (np.empty(0, object), np.empty(0, np.int64)))
        enc = []
        for w in uniq:
            ids = self.cache.get(w)
            if ids is None:
                ids = _greedy_encode(w, self.vocab, self.max_len)
                if len(self.cache) < self.cache_cap:
                    self.cache[w] = ids
            enc.append(ids)
        enc_arr = np.empty(len(enc), dtype=object)
        for i, e in enumerate(enc):
            enc_arr[i] = np.asarray(e, dtype=np.int32)
        w_len = np.array([len(e) for e in enc], dtype=np.int64)
        w_sum = np.array([sum(e) for e in enc], dtype=np.int64)
        w_unk = np.array([e.count(0) for e in enc], dtype=np.int64)

        n = batch.num_rows
        n_tok = np.bincount(row_of, weights=w_len[inv], minlength=n).astype(np.int64)
        tok_sum = np.bincount(row_of, weights=w_sum[inv], minlength=n).astype(np.int64)
        n_unk = np.bincount(row_of, weights=w_unk[inv], minlength=n).astype(np.int64)

        # words are already in row order (repeat + mask preserve it), so
        # concatenating their encodings yields the per-row sequences; row
        # boundaries come straight from the n_tok cumsum
        flat_ids = (np.concatenate(list(enc_arr[inv])) if len(inv)
                    else np.empty(0, dtype=np.int32))
        row_off = np.concatenate(([0], np.cumsum(n_tok)))
        md5s = [hashlib.md5(flat_ids[row_off[i]:row_off[i + 1]].tobytes()).hexdigest()
                for i in range(n)]

        cols = {m: batch[m] for m in batch.column_names if m != self.text_col}
        cols["n_tok"] = pa.array(n_tok)
        cols["n_unk"] = pa.array(n_unk)
        cols["tok_sum"] = pa.array(tok_sum)
        cols["tok_md5"] = pa.array(md5s, type=pa.string())
        if self.emit_tokens:
            cols["tokens"] = pa.ListArray.from_arrays(
                pa.array(row_off, type=pa.int32()), pa.array(flat_ids))
        return pa.table(cols)


def tokenize(ds, vocab: dict, text_col: str = "text",
             emit_tokens: bool = False, concurrency=(1, 8)):
    """Encode ``text_col`` with a broadcast vocabulary (see module doc)."""
    vocab_ref = ray.put(vocab)
    return ds.map_batches(
        WordpieceEncoder,
        fn_constructor_args=(vocab_ref, text_col, emit_tokens),
        batch_format="pyarrow", concurrency=concurrency)
