"""Blocked fuzzy string matching — the VERIFY half of entity resolution.

`stages/neighborhood.py` (sorted-neighborhood) and plain equi-blocking
generate candidate pairs; this module scores them with an exact
Levenshtein edit distance so a pipeline can do the classic
block → verify record-linkage plan entirely inside the engine. The
reference (an array-kernel library, /root/reference/src/mhealth) has no
string ops; semantics follow the standard Wagner–Fischer DP and DuckDB's
`levenshtein` (unicode codepoints), which the driver oracle checks
bit-for-bit.

The DP is VECTORIZED ACROSS PAIRS, not per string: all pair strings are
packed into fixed-width uint32 codepoint matrices (numpy 'U' views), and
the (i, j) loop runs over the capped prefix lengths with every operation
a length-n vector op — n pairs cost O(cap²) numpy passes, never a Python
loop per pair.

Scale note: the per-block pair explosion is quadratic in block size, so
the blocking key must keep blocks small (prefixes, n-char buckets,
phonetic keys). Hot blocks are capped by ``max_block`` (dropped + counted
in the log) rather than silently exploding a task — the same skew defense
as the LSH bucket cap in stages/dedup.py.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

logger = logging.getLogger(__name__)


def _to_codes(strs: list[str], width: int) -> tuple[np.ndarray, np.ndarray]:
    """Pack python strings into an (n, width) uint32 codepoint matrix
    (zero-padded) plus the true lengths (capped at width)."""
    arr = np.array(strs, dtype=f"U{width}")
    lens = np.minimum(np.fromiter((len(s) for s in strs), dtype=np.int64,
                                  count=len(strs)), width)
    if len(strs) == 0:
        return np.zeros((0, width), dtype=np.uint32), lens
    mat = arr.view(np.uint32).reshape(len(strs), -1)[:, :width]
    return mat, lens


# pairs per DP chunk: bounds the two rolling (chunk, width+1) int32 rows
# + gathered code matrices to ~100 MB however many pairs a block emits
_DP_CHUNK = 1 << 18


def _lev_codes(am: np.ndarray, al: np.ndarray, bm: np.ndarray,
               bl: np.ndarray, width: int) -> np.ndarray:
    """Wagner–Fischer DP vectorized across pairs of pre-packed codepoint
    rows (two rolling rows of shape (n, width+1), int32)."""
    n = len(al)
    out = np.zeros(n, dtype=np.int64)
    if n == 0:
        return out
    la_max = int(al.max())
    prev = np.tile(np.arange(width + 1, dtype=np.int32), (n, 1))
    # rows where a_len == 0: distance = b_len (row 0 of the DP)
    out[al == 0] = bl[al == 0]
    for i in range(1, la_max + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = am[:, i - 1]
        for j in range(1, width + 1):
            cost = (ai != bm[:, j - 1]).astype(np.int32)
            cur[:, j] = np.minimum(np.minimum(prev[:, j] + 1,
                                              cur[:, j - 1] + 1),
                                   prev[:, j - 1] + cost)
        done = al == i
        if done.any():
            out[done] = cur[done, bl[done]]
        prev = cur
    return out


def levenshtein_pairs(a: list[str], b: list[str], width: int) -> np.ndarray:
    """Exact Levenshtein distance for each (a[i], b[i]) pair, both sides
    truncated to ``width`` codepoints."""
    am, al = _to_codes(a, width)
    bm, bl = _to_codes(b, width)
    return _lev_codes(am, al, bm, bl, width)


def fuzzy_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                block_prefix: int = 8, sim_prefix: int = 24,
                max_dist: int = 5, num_buckets: int = 32,
                max_block: int = 10_000, lowercase: bool = True,
                metric: str = "levenshtein", min_sim: float = 0.9):
    """All id pairs (a < b) sharing an exact ``block_prefix``-codepoint
    prefix whose ``sim_prefix``-codepoint prefixes match under the chosen
    metric: ``levenshtein`` (edit distance <= ``max_dist``, int ``dist``
    column) or ``jaro_winkler`` (similarity >= ``min_sim``, double
    ``sim`` column, DuckDB-bit-exact). One hash exchange on the block
    key; per block a vectorized pair explosion + the across-pairs
    kernel. Blocks larger than ``max_block`` rows are dropped (logged) —
    size the blocking key so this never fires on real data."""
    if metric not in ("levenshtein", "jaro_winkler"):
        raise ValueError(f"unknown metric {metric!r}")
    jw = metric == "jaro_winkler"
    out_col = "sim" if jw else "dist"
    out_type = pa.float64() if jw else pa.int64()
    from pymhealth_ray.stages.partition import grouped_by_bucket
    from pymhealth_ray.stages.setjoin import _explode_pairs

    def prep(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        if lowercase:
            txt = pc.utf8_lower(txt)
        return pa.table({
            id_col: batch[id_col],
            "bkey": pc.utf8_slice_codeunits(txt, 0, block_prefix),
            "s": pc.utf8_slice_codeunits(txt, 0, sim_prefix),
        })

    rows = ds.map_batches(prep, batch_format="pyarrow")

    def pairs_of_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                          "id_b": pa.array([], type=pa.int64()),
                          out_col: pa.array([], type=out_type)})
        if tbl.num_rows == 0:
            return empty
        key = tbl["bkey"].combine_chunks().dictionary_encode()
        codes = key.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, codes))
        codes, ids = codes[order], ids[order]
        sizes = np.bincount(codes)
        big = np.flatnonzero(sizes > max_block)
        if len(big):
            logger.warning("fuzzy_pairs: dropping %d blocks over max_block"
                           "=%d (largest %d rows)", len(big), max_block,
                           int(sizes.max()))
            keep = ~np.isin(codes, big)
            codes, ids, order = codes[keep], ids[keep], order[keep]
        starts = np.concatenate(
            ([0], np.flatnonzero(codes[1:] != codes[:-1]) + 1, [len(codes)]))
        idx = np.arange(len(codes))
        ia, ib = _explode_pairs(idx, starts)
        if len(ia) == 0:
            return empty
        # encode each ROW once; pairs gather rows from the packed matrix —
        # and the DP runs in bounded chunks so a block emitting millions
        # of pairs never materializes them all in the rolling rows
        s = tbl["s"].combine_chunks().take(pa.array(order)).to_pylist()
        mat, lens = _to_codes(s, sim_prefix)
        outs_a, outs_b, outs_d = [], [], []
        for lo in range(0, len(ia), _DP_CHUNK):
            ca, cb = ia[lo:lo + _DP_CHUNK], ib[lo:lo + _DP_CHUNK]
            if jw:
                score = _jw_codes(mat[ca], lens[ca], mat[cb], lens[cb],
                                  sim_prefix)
                hit = score >= min_sim
            else:
                score = _lev_codes(mat[ca], lens[ca], mat[cb], lens[cb],
                                   sim_prefix)
                hit = score <= max_dist
            outs_a.append(ids[ca[hit]])
            outs_b.append(ids[cb[hit]])
            outs_d.append(score[hit])
        a = np.concatenate(outs_a)
        b = np.concatenate(outs_b)
        score = np.concatenate(outs_d)
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pa.table({"id_a": pa.array(a2, type=pa.int64()),
                         "id_b": pa.array(b2, type=pa.int64()),
                         out_col: pa.array(score, type=out_type)})

    return grouped_by_bucket(rows, pairs_of_bucket, entity_col="bkey",
                             num_buckets=num_buckets)


def jaro_winkler_pairs(a: list[str], b: list[str], width: int) -> np.ndarray:
    """Jaro-Winkler similarity for each (a[i], b[i]) pair, truncated to
    ``width`` codepoints — vectorized ACROSS pairs like the Levenshtein
    kernel. Semantics match DuckDB's ``jaro_winkler_similarity``:
    match window ``max(la,lb)//2 - 1``, transpositions = mismatched
    matched positions / 2 (float), Winkler prefix boost (<=4 chars,
    scale 0.1) applied only when jaro > 0.7, empty strings score 0."""
    am, al = _to_codes(a, width)
    bm, bl = _to_codes(b, width)
    return _jw_codes(am, al, bm, bl, width)


def _jw_codes(am: np.ndarray, al: np.ndarray, bm: np.ndarray,
              bl: np.ndarray, width: int) -> np.ndarray:
    n = len(al)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    w = np.maximum(np.maximum(al, bl) // 2 - 1, 0)
    used_b = np.zeros((n, width), dtype=bool)
    matched_a = np.zeros((n, width), dtype=bool)
    cols = np.arange(width)
    la_max = int(al.max()) if n else 0
    for i in range(la_max):
        lo = np.maximum(0, i - w)[:, None]
        hi = np.minimum(bl, i + w + 1)[:, None]
        cand = ((cols >= lo) & (cols < hi) & ~used_b
                & (bm == am[:, i][:, None]) & (i < al)[:, None])
        found = cand.any(axis=1)
        j = cand.argmax(axis=1)
        used_b[found, j[found]] = True
        matched_a[found, i] = True
    m = matched_a.sum(axis=1).astype(np.int64)
    # k-th matched char of each side, in position order (scatter by rank)
    a_seq = np.zeros((n, width), dtype=np.uint32)
    b_seq = np.zeros((n, width), dtype=np.uint32)
    ra, ca = np.nonzero(matched_a)
    a_seq[ra, np.cumsum(matched_a, axis=1)[ra, ca] - 1] = am[ra, ca]
    rb, cb = np.nonzero(used_b)
    b_seq[rb, np.cumsum(used_b, axis=1)[rb, cb] - 1] = bm[rb, cb]
    diff = ((a_seq != b_seq) & (cols < m[:, None])).sum(axis=1)
    t = diff // 2  # DuckDB/RapidFuzz FLOOR the transposition count
    with np.errstate(invalid="ignore", divide="ignore"):
        mf = m.astype(np.float64)
        jaro = (mf / al + mf / bl + (mf - t) / mf) / 3.0
    jaro = np.where(m > 0, jaro, 0.0)
    pfx_eq = np.cumprod((am[:, :4] == bm[:, :4]) &
                        (cols[:4] < np.minimum(al, bl)[:, None]), axis=1)
    L = pfx_eq.sum(axis=1).astype(np.float64)
    jw = np.where(jaro > 0.7, jaro + L * 0.1 * (1.0 - jaro), jaro)
    return jw
