"""Text analysis over document tables: token counting, quality scoring,
language-ID, content fingerprinting.

Training-data-pipeline operators (a core deliverable beyond the reference's
own inventory): all stateless map_batches over Arrow string columns, with the
heavier per-doc work (hashing, n-gram profiles) vectorized or bounded.
Regex/stopword/profile state is module-level (compiled once per worker
process — the actor-__init__ pattern for stateless tasks).
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

STOPWORDS = frozenset(
    "the a an of and to in is are was for on with as by at it this that".split()
)
_PUNCT_RE = re.compile(r"[.,!?;:]")
# BPE-ish token splitter: runs of letters, runs of digits, or a single
# non-space symbol — a deterministic stand-in for a real BPE vocab.
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")


def _strings(batch: pa.Table, col: str) -> list:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.to_pylist()


def token_counts(ds, text_col: str = "text", batch_size: int = 4096):
    """Whitespace token count + BPE-ish token count + char length per doc."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = _strings(batch, text_col)
        ws = np.fromiter((len(t.split()) for t in texts), dtype=np.int64, count=len(texts))
        bpe = np.fromiter((len(_BPE_RE.findall(t)) for t in texts), dtype=np.int64, count=len(texts))
        chars = pc.utf8_length(batch[text_col]).cast(pa.int64())
        batch = batch.append_column("n_ws_tokens", pa.array(ws))
        batch = batch.append_column("n_bpe_tokens", pa.array(bpe))
        return batch.append_column("n_chars_utf8", chars)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def quality_scores(ds, text_col: str = "text", batch_size: int = 4096):
    """Heuristic quality features: token count, mean word length, stopword
    ratio, punctuation ratio — the standard pre-training quality signals."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = _strings(batch, text_col)
        n = len(texts)
        n_tok = np.zeros(n, dtype=np.int64)
        mean_wl = np.zeros(n, dtype=np.float64)
        stop_r = np.zeros(n, dtype=np.float64)
        punct_r = np.zeros(n, dtype=np.float64)
        for i, t in enumerate(texts):
            words = t.split()
            n_tok[i] = len(words)
            if words:
                mean_wl[i] = sum(len(w) for w in words) / len(words)
                stop_r[i] = sum(1 for w in words if w.lower() in STOPWORDS) / len(words)
            if t:
                punct_r[i] = len(_PUNCT_RE.findall(t)) / len(t)
        batch = batch.append_column("n_tokens", pa.array(n_tok))
        batch = batch.append_column("mean_word_len", pa.array(mean_wl))
        batch = batch.append_column("stopword_ratio", pa.array(stop_r))
        return batch.append_column("punct_ratio", pa.array(punct_r))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(ds, text_col: str = "text", id_col: str = "doc_id",
                 min_words: int = 50, max_words: int = 100_000,
                 min_mwl: float = 3.0, max_mwl: float = 10.0,
                 min_alpha_frac: float = 0.8, min_stop_hits: int = 2):
    """Gopher/MassiveText document-quality RULES (Rae et al. 2021 §A1.1):
    word-count bounds, mean-word-length window, fraction of words with an
    alphabetic character, and the must-contain-stopwords rule; ``passes``
    is their conjunction. Map-only and Arrow-vectorized (one split, one
    regex kernel, reduceat sums); ratios are int/int double divisions for
    bit-exact SQL parity. Words = single-space split with empties dropped
    (SQL ``list_filter(string_split(text,' '), x -> x <> '')``)."""
    import pyarrow.compute as pc

    stop_arr = pa.array(list(GOPHER_STOPWORDS))

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        words = pc.split_pattern(col, pattern=" ")
        flat = words.values if isinstance(words, pa.ListArray) else \
            words.combine_chunks().values
        lens = pc.list_value_length(words).to_numpy(
            zero_copy_only=False).astype(np.int64)
        row_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        row_of = row_of[keep]
        n_rows = len(lens)
        n_words = np.bincount(row_of, minlength=n_rows).astype(np.int64)

        wl = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(
            np.int64)
        char_sum = np.bincount(row_of, weights=wl,
                               minlength=n_rows).astype(np.int64)
        alpha = pc.match_substring_regex(flat, "[A-Za-z]").to_numpy(
            zero_copy_only=False)
        n_alpha = np.bincount(row_of, weights=alpha,
                              minlength=n_rows).astype(np.int64)
        # distinct stopwords present per row: (row, stop-index) pairs deduped
        low = pc.utf8_lower(flat)
        sidx = pc.index_in(low, value_set=stop_arr)
        hitmask = sidx.is_valid().to_numpy(zero_copy_only=False)
        pair = row_of[hitmask] * np.int64(len(GOPHER_STOPWORDS)) + \
            sidx.to_numpy(zero_copy_only=False)[hitmask].astype(np.int64)
        upair = np.unique(pair)
        stop_hits = np.bincount((upair // len(GOPHER_STOPWORDS)).astype(
            np.int64), minlength=n_rows).astype(np.int64)

        nz = n_words > 0
        mwl = np.zeros(n_rows, dtype=np.float64)
        mwl[nz] = char_sum[nz] / n_words[nz]
        afrac = np.zeros(n_rows, dtype=np.float64)
        afrac[nz] = n_alpha[nz] / n_words[nz]
        passes = ((n_words >= min_words) & (n_words <= max_words)
                  & (mwl >= min_mwl) & (mwl <= max_mwl)
                  & (afrac >= min_alpha_frac)
                  & (stop_hits >= min_stop_hits))
        return pa.table({
            id_col: batch[id_col],
            "n_words": pa.array(n_words),
            "mean_word_len": pa.array(mwl, type=pa.float64(), mask=~nz),
            "alpha_frac": pa.array(afrac, type=pa.float64(), mask=~nz),
            "stop_hits": pa.array(stop_hits),
            "passes": pa.array(passes, type=pa.bool_(), mask=~nz),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def content_hashes(ds, text_col: str = "text", batch_size: int = 4096):
    """Deterministic content hashes per doc: md5 hex (dedup key), crc32 and a
    64-bit FNV-1a rolling fingerprint (cheap shard-stable id)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = _strings(batch, text_col)
        payloads = [t.encode("utf-8") for t in texts]
        md5 = [hashlib.md5(p).hexdigest() for p in payloads]
        crc = np.fromiter((zlib.crc32(p) for p in payloads), dtype=np.int64, count=len(texts))
        fnv = _fnv1a64_batch(payloads)
        batch = batch.append_column("md5", pa.array(md5, type=pa.string()))
        batch = batch.append_column("crc32", pa.array(crc))
        return batch.append_column("fnv64", pa.array(fnv.astype(np.int64)))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def _fnv1a64_batch(payloads: list) -> np.ndarray:
    """FNV-1a 64-bit of each byte string, vectorized ACROSS the batch:
    one numpy pass per byte *position* (bounded by the longest doc) instead
    of a Python iteration per byte per doc — bit-identical to the scalar
    round-1 loop, ~100× less interpreter work on 1KB docs."""
    n = len(payloads)
    lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n)
    h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    if n == 0 or lens.max(initial=0) == 0:
        return h
    maxlen = int(lens.max())
    mat = np.zeros((n, maxlen), dtype=np.uint8)
    for i, p in enumerate(payloads):
        mat[i, : len(p)] = np.frombuffer(p, dtype=np.uint8)
    prime = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            active = lens > j
            h[active] = (h[active] ^ mat[active, j].astype(np.uint64)) * prime
    return h


def _fnv1a64(data: bytes) -> int:
    """Scalar FNV-1a (kept as the semantic definition / test oracle of
    ``_fnv1a64_batch``)."""
    h = 0xCBF29CE484222325
    for b in data:
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


# --- language ID: char-trigram profiles (tiny built-in, deterministic) ----

_LANG_PROFILES = {
    "en": "the and ing ion tio ent for hat his tha ere ate you",
    "es": "que los ent aci del nte con ció por una sta ado par",
    "fr": "les ent que une des ion elle ait pour dans est sur",
    "de": "der die und sch ein ich den cht ung gen wir das mit",
    "zh": "",  # CJK handled by codepoint-range rule
}


class LanguageId:
    """Actor-pool language identifier: trigram profiles built once in
    __init__ (per actor), scored per batch — the stateful-stage pattern for
    model-like lookups."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.profiles = {
            lang: set(p.split()) for lang, p in _LANG_PROFILES.items() if p
        }

    def _score(self, t: str) -> str:
        if any("一" <= ch <= "鿿" for ch in t[:200]):
            return "zh"
        tl = t.lower()
        grams = {tl[i : i + 3] for i in range(min(len(tl), 500) - 2)}
        best, best_score = "en", -1
        for lang, prof in self.profiles.items():
            s = len(grams & prof)
            if s > best_score:
                best, best_score = lang, s
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = _strings(batch, self.text_col)
        langs = [self._score(t) for t in texts]
        return batch.append_column("lang_pred", pa.array(langs, type=pa.string()))


def language_id(ds, text_col: str = "text", concurrency=(2, 8), batch_size: int = 4096):
    return ds.map_batches(
        LanguageId,
        fn_constructor_args=(text_col,),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


def redact(ds, pattern: str, replacement: str, text_col: str = "text",
           out_col: str = "redacted", count_col: str = "n_redactions",
           batch_size: int = 4096):
    """Regex redaction / normalization (the PII-scrub class of corpus op):
    appends the redacted text and the per-row match count. Fully
    vectorized — Arrow's ``replace_substring_regex`` / ``count_substring_regex``
    run RE2 over the whole batch (the same regex engine DuckDB uses, which
    is what makes the SQL oracle exact). Map-only, no shuffle."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        red = pc.replace_substring_regex(col, pattern=pattern,
                                         replacement=replacement)
        cnt = pc.count_substring_regex(col, pattern=pattern).cast(pa.int64())
        batch = batch.append_column(out_col, red)
        return batch.append_column(count_col, cnt)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)
