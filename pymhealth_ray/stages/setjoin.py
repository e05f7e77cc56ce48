"""Exact set-similarity self-join: all pairs with word-shingle Jaccard >= tau.

The exact counterpart of the MinHash/SimHash near-dup modalities
(stages/dedup.py): instead of estimating Jaccard from signatures, find the
EXACT pair set {(a, b) : J(S_a, S_b) >= tau} over word n-gram shingle sets
— the verification-grade dedup a curation pipeline runs when false
positives are expensive. Reference (an array-kernel library,
/root/reference/src/mhealth) has no joins at all; the algorithm is the
public prefix-filtering set-similarity join (Chaudhuri, Ganti, Kaushik
"A Primitive Operator for Similarity Joins", ICDE 2006; Xiao et al.
"Efficient Similarity Joins for Near Duplicate Detection", WWW 2008).

Distributed plan (all exchanges are slim, all kernels vectorized):

1. shingle rows    map-only: per doc, DISTINCT word k-shingles -> (id, sh).
2. df attach       hash-exchange by shingle: global document frequency per
                   shingle computed inside its bucket (a shingle's rows are
                   co-located), attached to every row — one exchange, no
                   join.
3. prefix mark     hash-exchange by doc: per doc sort shingles RAREST-FIRST
                   (df asc, shingle asc — one global order everywhere), set
                   size m, prefix length m - floor(tau*m) + 1.  floor (not
                   ceil) keeps the prefix conservatively long, so float
                   rounding of tau*m can never drop a qualifying pair.
4. candidates      prefix rows hash-exchange by shingle: all id pairs
                   (a < b) sharing a prefix shingle, deduped per pair
                   bucket.  Prefix-filter lemma: J(A,B) >= tau implies
                   |A∩B| >= tau*max(|A|,|B|), and two sets with overlap
                   >= t must collide inside their (m - t + 1)-prefixes
                   under any single global order.
5. restriction     stages/dropset.filter_by_keys semi-join of the shingle
                   rows to docs that appear in ANY candidate pair
                   (broadcast <= 4M docs, bloom + co-partitioned exchange
                   above — the spans.py pattern).
6. exact counts    restricted rows hash-exchange by shingle: per-shingle
                   pair explosion (vectorized multi-range construction, no
                   Python loop) -> per-bucket partial (a, b, c) -> pair-hash
                   exchange -> exact |A∩B|.  When the candidate-pair set is
                   broadcastable, partials are prefiltered to known pairs
                   (PPJoin's candidate intersection) before the exchange.
7. verify          attach set sizes (broadcast under the dropset threshold,
                   co-partitioned equi_join above), keep c/(m_a+m_b-c)
                   >= tau.

Correctness without a final candidate-pair intersection: step 6 counts are
exact for EVERY pair of restricted docs, and every pair with J >= tau has
both endpoints restricted (step 4 is complete), so the tau filter alone
yields exactly the true pair set — the optional prefilter only reduces
exchange volume.

Scale note (100 TB): steps 2/3/4/6 exchange (shingle, id, small ints) —
never documents; the quadratic per-shingle explosion in step 6 runs only
over CANDIDATE docs and is bounded per bucket; boilerplate (high-df)
shingles sort LAST in the rarest-first order and rarely enter prefixes, so
they generate no candidates — the standard prefix-filter skew defense.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from pymhealth_ray.stages.dropset import BROADCAST_THRESHOLD, filter_by_keys
from pymhealth_ray.stages.partition import grouped_by_bucket

PAIR_KEY = "__pk"


def _shingle_batch(batch: pa.Table, id_col: str, text_col: str, k: int) -> pa.Table:
    """(id, sh) rows: distinct lowercase word k-shingles per document.

    Matches the SQL form ``string_split(lower(text), ' ')`` + k-gram join
    with single spaces; consecutive spaces yield empty words on both sides.
    """
    txt = batch[text_col]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    words = pc.split_pattern(pc.utf8_lower(txt), " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offs = words.offsets.to_numpy()
    vals = words.values.to_numpy(zero_copy_only=False).astype(object)
    lens = np.diff(offs)
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    ids_np = ids.to_numpy(zero_copy_only=False)
    empty = pa.table({id_col: pa.array([], type=ids.type),
                      "sh": pa.array([], type=pa.string())})
    n_vals = len(vals)
    if n_vals < k:
        return empty
    doc_idx = np.repeat(np.arange(len(lens)), lens)
    # vectorized k-gram join over the flattened word buffer; starts whose
    # k-th word falls in a different doc are masked out
    sh = vals[: n_vals - k + 1].copy()
    for j in range(1, k):
        sh = sh + " "
        sh = sh + vals[j: n_vals - k + 1 + j]
    valid = doc_idx[: n_vals - k + 1] == doc_idx[k - 1:]
    if not valid.any():
        return empty
    sh = sh[valid]
    sdoc = doc_idx[: n_vals - k + 1][valid]
    df = pd.DataFrame({"i": ids_np[sdoc], "sh": sh}).drop_duplicates()
    return pa.table({id_col: pa.array(df["i"].to_numpy(), type=ids.type),
                     "sh": pa.array(df["sh"].tolist(), type=pa.string())})


def shingle_rows(ds, id_col: str = "doc_id", text_col: str = "text", k: int = 3):
    # batch_size=None: compute-heavy per-batch kernel — the 1024-row
    # default would re-pay the numpy/pandas setup per 1024 rows
    return ds.map_batches(
        lambda b: _shingle_batch(b, id_col, text_col, k),
        batch_format="pyarrow", batch_size=None)


def _pair_hash(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Deterministic int64 routing key for an (a, b) pair — used ONLY for
    bucket assignment; equality is always decided on the real columns."""
    with np.errstate(over="ignore"):
        h = a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        h ^= b.astype(np.uint64) + np.uint64(0xBF58476D1CE4E5B9) + (h << np.uint64(6))
    return h.astype(np.int64)


def _explode_pairs(ids_sorted_by_sh: np.ndarray, starts: np.ndarray):
    """All (a < b) pairs within each [starts[i], starts[i+1]) run of a
    shingle-sorted id array — vectorized multi-range construction."""
    sizes = np.diff(starts)
    # per-element repeat count = elements after it in its run
    pos = np.arange(len(ids_sorted_by_sh)) - np.repeat(starts[:-1], sizes)
    reps = np.repeat(sizes, sizes) - 1 - pos
    total = int(reps.sum())
    if total == 0:
        return (np.array([], dtype=ids_sorted_by_sh.dtype),) * 2
    a_idx = np.repeat(np.arange(len(reps)), reps)
    cum0 = np.cumsum(reps) - reps
    off = np.arange(total) - np.repeat(cum0, reps)
    b_idx = a_idx + 1 + off
    return ids_sorted_by_sh[a_idx], ids_sorted_by_sh[b_idx]


def _reduce_pairs(a: np.ndarray, b: np.ndarray, w: np.ndarray | None = None):
    """(a, b, count) rollup via lexsort + reduceat (no Python loop)."""
    if len(a) == 0:
        return a, b, np.array([], dtype=np.int64)
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    wv = w[order] if w is not None else np.ones(len(a), dtype=np.int64)
    new = np.empty(len(a), dtype=bool)
    new[0] = True
    new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    starts = np.flatnonzero(new)
    return a[starts], b[starts], np.add.reduceat(wv, starts).astype(np.int64)


def _pairs_of_bucket(tbl: pa.Table, id_col: str,
                     member: tuple | None = None) -> pa.Table:
    """Per-shingle pair explosion + within-bucket partial counts."""
    if tbl.num_rows == 0:
        return pa.table({"id_a": pa.array([], type=pa.int64()),
                         "id_b": pa.array([], type=pa.int64()),
                         "c": pa.array([], type=pa.int64())})
    sh = tbl["sh"].combine_chunks().dictionary_encode()
    codes = sh.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((ids, codes))
    codes, ids = codes[order], ids[order]
    starts = np.concatenate(
        ([0], np.flatnonzero(codes[1:] != codes[:-1]) + 1, [len(codes)]))
    a, b = _explode_pairs(ids, starts)
    if member is not None and len(a):
        # optional PPJoin candidate intersection: drop partials for pairs
        # that cannot qualify (needs 32-bit-packable ids; routing-only)
        pk_lo, = member
        packed = (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)
        hit = np.isin(packed.astype(np.int64), pk_lo, assume_unique=False)
        a, b = a[hit], b[hit]
    a, b, c = _reduce_pairs(a, b)
    return pa.table({"id_a": pa.array(a, type=pa.int64()),
                     "id_b": pa.array(b, type=pa.int64()),
                     "c": pa.array(c, type=pa.int64())})


def _with_pair_key(ds):
    def add(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(PAIR_KEY, pa.array(_pair_hash(a, b)))
    return ds.map_batches(add, batch_format="pyarrow")


def _uniq_pairs_tbl(tbl: pa.Table) -> pa.Table:
    """Distinct (id_a, id_b) rows of one pair bucket."""
    a = tbl["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = tbl["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
    a, b, _ = _reduce_pairs(a, b)
    return pa.table({"id_a": pa.array(a, type=pa.int64()),
                     "id_b": pa.array(b, type=pa.int64())})


def _sum_pairs_tbl(tbl: pa.Table) -> pa.Table:
    """Merge per-bucket partial (id_a, id_b, c) counts."""
    a = tbl["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = tbl["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
    c = tbl["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    a, b, c = _reduce_pairs(a, b, c)
    return pa.table({"id_a": pa.array(a, type=pa.int64()),
                     "id_b": pa.array(b, type=pa.int64()),
                     "c": pa.array(c, type=pa.int64())})


def _endpoint_ids(pairs, id_col: str, cols=("id_a", "id_b")):
    """Key-set dataset of pair endpoints, DEDUPED per batch before it
    reaches dropset — the plan decision there counts raw rows, and a
    dup-heavy corpus has ~n² pair rows over only n distinct docs (the
    round-3 LSH-threshold lesson)."""
    cols = list(cols)

    def uniq(b: pa.Table) -> pa.Table:
        parts = [b[c].combine_chunks().cast(pa.int64()) for c in cols]
        arr = pa.concat_arrays(parts) if len(parts) > 1 else parts[0]
        u = np.unique(arr.to_numpy(zero_copy_only=False))
        return pa.table({id_col: pa.array(u, type=pa.int64())})

    return pairs.map_batches(uniq, batch_format="pyarrow")


def _pack_member(pairs, broadcast_threshold: int):
    """Broadcast the candidate-pair set as one sorted packed-int64 array
    when it fits (PPJoin prefilter); returns an ObjectRef or None. Pairs
    must pack into 32-bit halves — bail to None otherwise."""
    import ray

    if pairs.count() > broadcast_threshold:
        return None
    packed_parts = []
    for t in pairs.iter_batches(batch_format="pyarrow"):
        pa_ = t["id_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pb_ = t["id_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        if len(pa_) and (pa_.max() >= 2**32 or pb_.max() >= 2**32):
            return None
        packed_parts.append(((pa_ << np.uint64(32)) | pb_).astype(np.int64))
    member_arr = np.sort(np.concatenate(packed_parts)) if packed_parts \
        else np.array([], dtype=np.int64)
    return ray.put(member_arr)


def _cross_pairs_of_bucket(tbl: pa.Table, id_col: str,
                           member: tuple | None = None) -> pa.Table:
    """Per-shingle CROSS-SIDE pair explosion (side 0 = left/train, side 1 =
    right/eval) + within-bucket partial counts — the R×S analog of
    `_pairs_of_bucket`. Vectorized: per shared shingle, left rows repeat
    ne times against the contiguous right slice."""
    empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                      "id_b": pa.array([], type=pa.int64()),
                      "c": pa.array([], type=pa.int64())})
    if tbl.num_rows == 0:
        return empty
    sh = tbl["sh"].combine_chunks().dictionary_encode()
    codes = sh.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    side = tbl["side"].to_numpy(zero_copy_only=False).astype(np.int64)
    t_mask = side == 0
    t_codes, t_ids = codes[t_mask], ids[t_mask]
    e_codes, e_ids = codes[~t_mask], ids[~t_mask]
    if len(t_codes) == 0 or len(e_codes) == 0:
        return empty
    to = np.argsort(t_codes, kind="stable")
    t_codes, t_ids = t_codes[to], t_ids[to]
    eo = np.argsort(e_codes, kind="stable")
    e_codes, e_ids = e_codes[eo], e_ids[eo]
    # per-left-row right-run [start, len) of its shingle code
    r_start = np.searchsorted(e_codes, t_codes, side="left")
    r_end = np.searchsorted(e_codes, t_codes, side="right")
    reps = r_end - r_start
    total = int(reps.sum())
    if total == 0:
        return empty
    a = np.repeat(t_ids, reps)
    cum0 = np.cumsum(reps) - reps
    off = np.arange(total) - np.repeat(cum0, reps)
    b = e_ids[np.repeat(r_start, reps) + off]
    if member is not None and len(a):
        pk_lo, = member
        packed = (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)
        hit = np.isin(packed.astype(np.int64), pk_lo, assume_unique=False)
        a, b = a[hit], b[hit]
    a, b, c = _reduce_pairs(a, b)
    return pa.table({"id_a": pa.array(a, type=pa.int64()),
                     "id_b": pa.array(b, type=pa.int64()),
                     "c": pa.array(c, type=pa.int64())})


def containment_join(left_ds, right_ds, id_col: str = "doc_id",
                     text_col: str = "text", k: int = 3, tau: float = 0.5,
                     num_buckets: int = 32,
                     broadcast_threshold: int = BROADCAST_THRESHOLD):
    """Exact R×S containment join: every (left_id, right_id) pair where
    containment C = |S_left ∩ S_right| / |S_right| >= tau over word
    k-shingle sets — "which training docs contain at least tau of this
    eval doc's shingles", the exact counterpart of bloom decontamination
    (stages/decontam.py) and MinHash cross-split pairs.

    Plan mirrors `similarity_join` with an asymmetric prefix filter:
    the LEFT (train) side is never pruned, so completeness needs only a
    RIGHT-side prefix — if C >= tau then |∩| >= t = floor(tau*m_r), and
    any (m_r - t + 1)-prefix of the right set must hit the intersection.
    Right prefixes sort rarest-first by LEFT-side document frequency
    (right-only shingles have df 0, sort first, and generate no
    candidates — they prune for free). Exchanges carry only
    (shingle, id, side) — never documents. containment = c/m int/int
    division, bit-exact vs SQL."""
    import ray

    # the left (train) shingle rows feed THREE executions (df exchange,
    # candidate generation, exact counts) — materialize once instead of
    # re-reading + re-shingling the big side each time
    t_rows = shingle_rows(left_ds, id_col, text_col, k).materialize()
    e_rows = shingle_rows(right_ds, id_col, text_col, k)

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            return b.append_column(
                "side", pa.array(np.full(b.num_rows, side, dtype=np.int64)))
        return fn

    both = t_rows.map_batches(tag(0), batch_format="pyarrow").union(
        e_rows.map_batches(tag(1), batch_format="pyarrow"))

    def attach_left_df(tbl: pa.Table) -> pa.Table:
        # left-side document frequency per shingle, attached to RIGHT rows
        sh = tbl["sh"].combine_chunks()
        enc = sh.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        side = tbl["side"].to_numpy(zero_copy_only=False)
        cnt = np.bincount(idx[side == 0],
                          minlength=len(enc.dictionary)).astype(np.int64)
        right = tbl.filter(pa.array(side == 1)).select([id_col, "sh"])
        return right.append_column(
            "df", pa.array(cnt[idx[side == 1]], type=pa.int64()))

    e_df = grouped_by_bucket(both, attach_left_df, entity_col="sh",
                             num_buckets=num_buckets)

    def mark_prefix(tbl: pa.Table) -> pa.Table:
        pdf = tbl.to_pandas()
        pdf = pdf.sort_values([id_col, "df", "sh"],
                              kind="mergesort").reset_index(drop=True)
        grp = pdf.groupby(id_col, sort=False)
        m = grp[id_col].transform("size").to_numpy().astype(np.int64)
        pos = grp.cumcount().to_numpy()
        pfx_len = np.minimum(m, m - np.floor(tau * m).astype(np.int64) + 1)
        return pa.table({
            id_col: pa.array(pdf[id_col].to_numpy(), type=pa.int64()),
            "sh": pa.array(pdf["sh"].tolist(), type=pa.string()),
            "m": pa.array(m, type=pa.int64()),
            "pfx": pa.array(pos < pfx_len, type=pa.bool_()),
            "first": pa.array(pos == 0, type=pa.bool_()),
        })

    ann = grouped_by_bucket(e_df, mark_prefix, entity_col=id_col,
                            num_buckets=num_buckets).materialize()

    def with_side(side: int, cols):
        def fn(b: pa.Table) -> pa.Table:
            out = b.select(cols)
            return out.append_column("side", pa.array(
                np.full(out.num_rows, side, dtype=np.int64)))
        return fn

    pfx = ann.map_batches(
        lambda b: b.filter(b["pfx"]).select([id_col, "sh"]).append_column(
            "side", pa.array(np.ones(int(pc.sum(b["pfx"]).as_py() or 0),
                                     dtype=np.int64))),
        batch_format="pyarrow")
    cand_in = t_rows.map_batches(with_side(0, [id_col, "sh"]),
                                 batch_format="pyarrow").union(pfx)
    cand = grouped_by_bucket(
        cand_in,
        lambda t: _cross_pairs_of_bucket(t, id_col).select(["id_a", "id_b"]),
        entity_col="sh", num_buckets=num_buckets)

    pairs = grouped_by_bucket(_with_pair_key(cand), _uniq_pairs_tbl,
                              entity_col=PAIR_KEY,
                              num_buckets=num_buckets).materialize()

    t_restricted = filter_by_keys(
        t_rows, id_col, _endpoint_ids(pairs, id_col, cols=("id_a",)),
        keep=True, broadcast_threshold=broadcast_threshold,
        num_buckets=num_buckets)
    e_restricted = filter_by_keys(
        ann.map_batches(lambda b: b.select([id_col, "sh", "m", "first"]),
                        batch_format="pyarrow"),
        id_col, _endpoint_ids(pairs, id_col, cols=("id_b",)),
        keep=True, broadcast_threshold=broadcast_threshold,
        num_buckets=num_buckets).materialize()

    member = _pack_member(pairs, broadcast_threshold)

    count_in = t_restricted.map_batches(
        with_side(0, [id_col, "sh"]), batch_format="pyarrow").union(
        e_restricted.map_batches(with_side(1, [id_col, "sh"]),
                                 batch_format="pyarrow"))

    def count_bucket(tbl: pa.Table) -> pa.Table:
        mem = (ray.get(member),) if member is not None else None
        return _cross_pairs_of_bucket(tbl, id_col, mem)

    partials = grouped_by_bucket(count_in, count_bucket, entity_col="sh",
                                 num_buckets=num_buckets)

    counts = grouped_by_bucket(_with_pair_key(partials), _sum_pairs_tbl,
                               entity_col=PAIR_KEY, num_buckets=num_buckets)

    sizes = e_restricted.map_batches(
        lambda b: b.filter(b["first"]).select([id_col, "m"]),
        batch_format="pyarrow")
    n_cand = sizes.count()
    if n_cand <= broadcast_threshold:
        sid, sm = [], []
        for t in sizes.iter_batches(batch_format="pyarrow"):
            sid.append(t[id_col].to_numpy(zero_copy_only=False))
            sm.append(t["m"].to_numpy(zero_copy_only=False))
        sid = np.concatenate(sid) if sid else np.array([], dtype=np.int64)
        sm = np.concatenate(sm) if sm else np.array([], dtype=np.int64)
        order = np.argsort(sid)
        sizes_ref = ray.put((sid[order], sm[order]))

        def verify(batch: pa.Table) -> pa.Table:
            ids_s, ms = ray.get(sizes_ref)
            a = batch["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
            b = batch["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
            c = batch["c"].to_numpy(zero_copy_only=False).astype(np.int64)
            mb = ms[np.searchsorted(ids_s, b)]
            con = c.astype(np.float64) / mb.astype(np.float64)
            keep = con >= tau
            return pa.table({
                "id_a": pa.array(a[keep], type=pa.int64()),
                "id_b": pa.array(b[keep], type=pa.int64()),
                "n_shared": pa.array(c[keep], type=pa.int64()),
                "containment": pa.array(con[keep], type=pa.float64()),
            })

        return counts.map_batches(verify, batch_format="pyarrow")

    from pymhealth_ray.stages.join import equi_join

    cb = equi_join(
        counts.map_batches(lambda b: pa.table(
            {"id_a": b["id_a"], id_col: b["id_b"], "c": b["c"]}),
            batch_format="pyarrow"),
        sizes, on=id_col, num_buckets=num_buckets, right_suffix="_b")

    def verify_joined(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        c = batch["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        mb = batch["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        con = c.astype(np.float64) / mb.astype(np.float64)
        keep = con >= tau
        return pa.table({
            "id_a": pa.array(a[keep], type=pa.int64()),
            "id_b": pa.array(b[keep], type=pa.int64()),
            "n_shared": pa.array(c[keep], type=pa.int64()),
            "containment": pa.array(con[keep], type=pa.float64()),
        })

    return cb.map_batches(verify_joined, batch_format="pyarrow")


def similarity_join(ds, id_col: str = "doc_id", text_col: str = "text",
                    k: int = 3, tau: float = 0.8, num_buckets: int = 32,
                    broadcast_threshold: int = BROADCAST_THRESHOLD):
    """Exact Jaccard self-join: (id_a, id_b, n_shared, jaccard) for every
    pair with word-k-shingle Jaccard >= tau. See module docstring for the
    plan; ids must be non-negative int64."""
    import ray

    rows = shingle_rows(ds, id_col, text_col, k)

    def attach_df(tbl: pa.Table) -> pa.Table:
        sh = tbl["sh"].combine_chunks()
        enc = sh.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(idx, minlength=len(enc.dictionary)).astype(np.int64)
        return tbl.append_column("df", pa.array(cnt[idx], type=pa.int64()))

    rows_df = grouped_by_bucket(rows, attach_df, entity_col="sh",
                                num_buckets=num_buckets)

    def mark_prefix(tbl: pa.Table) -> pa.Table:
        pdf = tbl.to_pandas()
        pdf = pdf.sort_values([id_col, "df", "sh"],
                              kind="mergesort").reset_index(drop=True)
        grp = pdf.groupby(id_col, sort=False)
        m = grp[id_col].transform("size").to_numpy().astype(np.int64)
        pos = grp.cumcount().to_numpy()
        # conservative prefix: required overlap >= floor(tau*m) <= true
        # minimum — completeness survives float rounding of tau*m
        pfx_len = np.minimum(m, m - np.floor(tau * m).astype(np.int64) + 1)
        return pa.table({
            id_col: pa.array(pdf[id_col].to_numpy(), type=pa.int64()),
            "sh": pa.array(pdf["sh"].tolist(), type=pa.string()),
            "m": pa.array(m, type=pa.int64()),
            "pfx": pa.array(pos < pfx_len, type=pa.bool_()),
            "first": pa.array(pos == 0, type=pa.bool_()),
        })

    # the annotated shingle table is consumed by three chains (candidate
    # generation, dropset restriction x2, sizes) — materialize once
    ann = grouped_by_bucket(rows_df, mark_prefix, entity_col=id_col,
                            num_buckets=num_buckets).materialize()

    pfx = ann.map_batches(
        lambda b: b.filter(b["pfx"]).select([id_col, "sh"]),
        batch_format="pyarrow")
    cand = grouped_by_bucket(
        pfx, lambda t: _pairs_of_bucket(t, id_col).select(["id_a", "id_b"]),
        entity_col="sh", num_buckets=num_buckets)

    pairs = grouped_by_bucket(_with_pair_key(cand), _uniq_pairs_tbl,
                              entity_col=PAIR_KEY,
                              num_buckets=num_buckets).materialize()

    cand_ids = _endpoint_ids(pairs, id_col)
    restricted = filter_by_keys(
        ann.map_batches(lambda b: b.select([id_col, "sh", "m", "first"]),
                        batch_format="pyarrow"),
        id_col, cand_ids, keep=True,
        broadcast_threshold=broadcast_threshold,
        num_buckets=num_buckets).materialize()

    # optional candidate-pair prefilter for the count exchange
    member = _pack_member(pairs, broadcast_threshold)

    def count_bucket(tbl: pa.Table) -> pa.Table:
        mem = (ray.get(member),) if member is not None else None
        return _pairs_of_bucket(tbl.select([id_col, "sh"]), id_col, mem)

    partials = grouped_by_bucket(restricted, count_bucket, entity_col="sh",
                                 num_buckets=num_buckets)

    counts = grouped_by_bucket(_with_pair_key(partials), _sum_pairs_tbl,
                               entity_col=PAIR_KEY, num_buckets=num_buckets)

    sizes = restricted.map_batches(
        lambda b: b.filter(b["first"]).select([id_col, "m"]),
        batch_format="pyarrow")
    n_cand = sizes.count()
    if n_cand <= broadcast_threshold:
        sid, sm = [], []
        for t in sizes.iter_batches(batch_format="pyarrow"):
            sid.append(t[id_col].to_numpy(zero_copy_only=False))
            sm.append(t["m"].to_numpy(zero_copy_only=False))
        sid = np.concatenate(sid) if sid else np.array([], dtype=np.int64)
        sm = np.concatenate(sm) if sm else np.array([], dtype=np.int64)
        order = np.argsort(sid)
        sizes_ref = ray.put((sid[order], sm[order]))

        def verify(batch: pa.Table) -> pa.Table:
            ids_s, ms = ray.get(sizes_ref)
            a = batch["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
            b = batch["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
            c = batch["c"].to_numpy(zero_copy_only=False).astype(np.int64)
            ma = ms[np.searchsorted(ids_s, a)]
            mb = ms[np.searchsorted(ids_s, b)]
            jac = c.astype(np.float64) / (ma + mb - c).astype(np.float64)
            keep = jac >= tau
            return pa.table({
                "id_a": pa.array(a[keep], type=pa.int64()),
                "id_b": pa.array(b[keep], type=pa.int64()),
                "n_shared": pa.array(c[keep], type=pa.int64()),
                "jaccard": pa.array(jac[keep], type=pa.float64()),
            })

        return counts.map_batches(verify, batch_format="pyarrow")

    # large candidate set: attach sizes by two co-partitioned equi-joins
    from pymhealth_ray.stages.join import equi_join

    ca = equi_join(
        counts.map_batches(lambda b: pa.table(
            {id_col: b["id_a"], "id_b": b["id_b"], "c": b["c"]}),
            batch_format="pyarrow"),
        sizes, on=id_col, num_buckets=num_buckets, right_suffix="_a")
    ca = ca.map_batches(lambda b: pa.table({
        "id_a": b[id_col], id_col: b["id_b"], "c": b["c"], "m_a": b["m"]}),
        batch_format="pyarrow")
    cb = equi_join(ca, sizes, on=id_col, num_buckets=num_buckets,
                   right_suffix="_b")

    def verify_joined(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        c = batch["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        ma = batch["m_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        mb = batch["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        jac = c.astype(np.float64) / (ma + mb - c).astype(np.float64)
        keep = jac >= tau
        return pa.table({
            "id_a": pa.array(a[keep], type=pa.int64()),
            "id_b": pa.array(b[keep], type=pa.int64()),
            "n_shared": pa.array(c[keep], type=pa.int64()),
            "jaccard": pa.array(jac[keep], type=pa.float64()),
        })

    return cb.map_batches(verify_joined, batch_format="pyarrow")
