"""Cross-document line/segment-level boilerplate removal.

The C4 / RefinedWeb cleaning step the doc-level dedups cannot do: a line
(nav bar, cookie banner, license header) that repeats across MANY documents
is boilerplate and should be dropped from every document that contains it,
while the documents themselves are kept.

Plan (scale-first, two passes, no all-to-all of document payloads):

1. **Doc frequency of every segment** — each document splits into
   non-overlapping ``words_per_seg``-word segments; per-block combiners
   count each segment once per containing doc (a doc never spans blocks:
   one row = one doc), then a single slim ``(seg, c)`` exchange +
   ``groupby(seg).sum`` yields exact document frequency. Only segment
   strings and int64 counts cross the wire — never document payloads.
2. **Hot-set broadcast** — segments with ``df > max_df`` are the
   boilerplate set. It is small by construction (boilerplate is the
   repeated tail, not the corpus), so it is collected once, ``ray.put``,
   and every map task reads the same object-store copy. At 100 TB you
   would broadcast 128-bit segment hashes instead of the strings; the
   exchange/broadcast topology is unchanged.
3. **Map-only scrub** — each document drops its hot segments and is
   re-assembled in segment order. No second shuffle.

Reference lineage: generalizes the corpus-wide fingerprint dedup family
(`/root/reference/src/mhealth` has no corpus ops; this is part of the
beyond-reference training-data surface, SURVEY §2.10).
"""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pyarrow as pa


def _doc_segments(text: str, words_per_seg: int) -> list:
    """Non-overlapping ``words_per_seg``-word chunks of a document, in
    order. The last chunk may be short. ''.split(' ') quirks follow
    SQL ``string_split``: an empty text yields one empty segment."""
    words = text.split(" ")
    return [" ".join(words[i: i + words_per_seg])
            for i in range(0, len(words), words_per_seg)]


def segment_doc_frequency(ds, text_col: str = "text", words_per_seg: int = 3):
    """Exact document frequency per distinct segment.

    Per-block partial counts (each segment counted once per doc) keep the
    exchange at O(distinct segments per block); the final
    ``groupby(seg).sum`` is exact because every doc lives in exactly one
    block row.
    """

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        counter = Counter()
        for t in col.to_pylist():
            counter.update(set(_doc_segments(t, words_per_seg)))
        return pa.table({
            "seg": pa.array(list(counter.keys()), type=pa.string()),
            "c": pa.array(list(counter.values()), type=pa.int64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    out = partials.groupby("seg").sum("c")
    return out.map_batches(
        lambda b: b.rename_columns(["seg", "df"]), batch_format="pyarrow")


class HotSegments:
    """Broadcastable membership over the boilerplate segment set.

    Exact mode holds the frozenset; bloom mode holds a fixed-size bitmap
    (stages.bloom double hashing over md5 halves) for sets too large to
    collect — NO false negatives (every true boilerplate segment is still
    dropped), a small false-positive rate over-scrubs ~fp_rate of innocent
    segments (acceptable for a cleaning op; callers needing exactness raise
    ``max_set_size``)."""

    def __init__(self, exact: frozenset | None = None,
                 bitmap=None, k: int = 7):
        self.exact = exact
        self.bitmap = bitmap
        self.k = k

    def __contains__(self, s: str) -> bool:
        if self.exact is not None:
            return s in self.exact
        d = hashlib.md5(str(s).encode()).digest()
        h1 = int.from_bytes(d[:8], "little")
        h2 = int.from_bytes(d[8:], "little") | 1
        n_bits = len(self.bitmap) * 8
        for i in range(self.k):
            # mask to 64 bits FIRST: build_bloom's numpy side wraps mod 2^64
            # before the % n_bits reduction; unbounded Python ints agree only
            # when n_bits is a power of two — silent false negatives otherwise
            pos = ((h1 + i * h2) & ((1 << 64) - 1)) % n_bits
            if not (self.bitmap[pos >> 3] >> (pos & 7)) & 1:
                return False
        return True


def hot_segment_set(ds, text_col: str = "text", words_per_seg: int = 3,
                    max_df: int = 2, max_set_size: int = 2_000_000,
                    bloom_bits: int = 1 << 24) -> HotSegments:
    """The boilerplate set: segments appearing in more than ``max_df``
    docs. The set size is data-dependent (bounded by corpus segment pairs
    / max_df, NOT by a constant), so the driver collect is gated: exact
    frozenset up to ``max_set_size`` segments, mergeable-Bloom bitmap
    (fixed ``bloom_bits`` regardless of set size, built distributed)
    above it — logged when it engages."""
    import pyarrow.compute as pc

    df = segment_doc_frequency(ds, text_col, words_per_seg)
    hot = df.map_batches(
        lambda b: b.filter(pc.greater(b["df"], max_df)).select(["seg"]),
        batch_format="pyarrow").materialize()
    n = hot.count()
    if n <= max_set_size:
        rows = hot.take_all()
        return HotSegments(exact=frozenset(r["seg"] for r in rows))
    import logging

    from pymhealth_ray.stages.bloom import build_bloom

    logging.getLogger(__name__).warning(
        "hot_segment_set: %d hot segments exceed max_set_size=%d; using a "
        "%d-bit Bloom filter (no false negatives; ~FP-rate over-scrub)",
        n, max_set_size, bloom_bits)
    return HotSegments(bitmap=build_bloom(hot, "seg", n_bits=bloom_bits))


def drop_hot_segments(ds, hot_ref, id_col: str = "doc_id",
                      text_col: str = "text", words_per_seg: int = 3,
                      keep_text: bool = False):
    """Map-only scrub against the broadcast hot set: per doc emits
    ``n_seg``, ``n_dropped``, ``clean_md5`` (md5 of the re-assembled
    kept text) and ``n_chars_clean``; ``keep_text=True`` also carries the
    cleaned text for downstream stages."""
    import ray

    def fn(batch: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        texts = col.to_pylist()
        n_seg = np.zeros(len(texts), dtype=np.int64)
        n_drop = np.zeros(len(texts), dtype=np.int64)
        md5s, cleans, n_chars = [], [], np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            segs = _doc_segments(t, words_per_seg)
            kept = [s for s in segs if s not in hot]
            clean = " ".join(kept)
            n_seg[i] = len(segs)
            n_drop[i] = len(segs) - len(kept)
            n_chars[i] = len(clean)
            md5s.append(hashlib.md5(clean.encode()).hexdigest())
            if keep_text:
                cleans.append(clean)
        cols = {
            id_col: batch[id_col],
            "n_seg": pa.array(n_seg),
            "n_dropped": pa.array(n_drop),
            "clean_md5": pa.array(md5s, type=pa.string()),
            "n_chars_clean": pa.array(n_chars),
        }
        if keep_text:
            cols["clean_text"] = pa.array(cleans, type=pa.string())
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def segment_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                  words_per_seg: int = 3, max_df: int = 2,
                  keep_text: bool = False, max_set_size: int = 2_000_000):
    """End-to-end boilerplate scrub: df count → hot-set broadcast →
    map-only drop. ``ds`` is consumed twice (count pass + scrub pass) —
    at scale, persist the input or fuse the count into ingest."""
    import ray

    hot = hot_segment_set(ds, text_col, words_per_seg, max_df,
                          max_set_size=max_set_size)
    hot_ref = ray.put(hot)
    return drop_hot_segments(ds, hot_ref, id_col, text_col, words_per_seg,
                             keep_text)
