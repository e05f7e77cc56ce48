"""Deduplication at training-data scale: exact, MinHash+LSH, SimHash,
n-gram Jaccard verification, embedding-cosine near-dup.

Physical plans (all shuffle only keys/signatures, never full text twice):

- exact: hash text → hash-partition groupby → keep min doc_id per hash
  (one shuffle of (hash, id) pairs).
- MinHash+LSH: per doc compute k minhashes over character shingles
  (vectorized), band them, explode to (band_hash, doc) pairs, groupby band
  bucket → candidate pairs → optional exact Jaccard verify inside the group.
- SimHash: 64-bit hyperplane signature of token hashes; near-dup = equal
  band keys on bit-chunks.
- embedding cosine: normalize vectors, LSH-bucket by random-hyperplane signs
  (broadcast planes), verify cosine within buckets.
"""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np
import pyarrow as pa

# --- exact dedup -----------------------------------------------------------


def exact_dedup(ds, key_col: str = "text", id_col: str = "doc_id", keep_payload: bool = False):
    """Keep the smallest ``id_col`` per distinct ``key_col`` value.

    Map side emits (md5(key), id[, payload]); one groupby on the digest; the
    winner per group is the min id — the hash-partition + per-group-first
    plan (SURVEY.md §2.10 set-ops decision).
    """

    def to_keyed(batch: pa.Table) -> pa.Table:
        arr = batch[key_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        digests = [hashlib.md5(str(v).encode("utf-8")).hexdigest() for v in arr.to_pylist()]
        cols = {
            "key_md5": pa.array(digests, type=pa.string()),
            id_col: batch[id_col],
        }
        if keep_payload:
            cols[key_col] = batch[key_col]
        return pa.table(cols)

    def pick_first(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(tbl, sort_keys=[(id_col, "ascending")])
        first = tbl.take(order[:1])
        return first.append_column("n_dups", pa.array([tbl.num_rows], type=pa.int64()))

    keyed = ds.map_batches(to_keyed, batch_format="pyarrow")
    return keyed.groupby("key_md5").map_groups(pick_first, batch_format="pyarrow")


# --- MinHash + LSH ---------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Rolling 64-bit hashes of the k-char shingles of a text."""
    data = text.encode("utf-8")
    n = len(data)
    if n < k:
        return np.array([int.from_bytes(hashlib.md5(data).digest()[:8], "big")], dtype=np.uint64)
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    # polynomial rolling hash via cumulative products (vectorized horner)
    base = np.uint64(1099511628211)
    h = np.zeros(n - k + 1, dtype=np.uint64)
    acc = np.zeros(n, dtype=np.uint64)
    power = np.uint64(1)
    with np.errstate(over="ignore"):
        for j in range(k):
            acc[: n - k + 1] = acc[: n - k + 1] * base + arr[j : n - k + 1 + j]
        h = acc[: n - k + 1]
    return np.unique(h)


class MinHasher:
    """Actor: random affine permutations drawn once in __init__ (seeded), so
    every actor across the cluster agrees on the hash family."""

    def __init__(self, text_col: str = "text", num_hashes: int = 64, shingle_k: int = 5, seed: int = 13):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_hashes, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_hashes, dtype=np.int64).astype(np.uint64)
        self.text_col = text_col
        self.shingle_k = shingle_k
        self.num_hashes = num_hashes

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.shingle_k)
        with np.errstate(over="ignore"):
            vals = (sh[None, :] * self.a[:, None] + self.b[:, None]) % np.uint64(_MERSENNE)
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        arr = batch[self.text_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        sigs = np.stack([self.signature(t) for t in arr.to_pylist()])
        return batch.append_column(
            "minhash", pa.FixedSizeListArray.from_arrays(pa.array(sigs.astype(np.int64).ravel()), self.num_hashes)
        )


def minhash_signatures(ds, text_col: str = "text", num_hashes: int = 64, shingle_k: int = 5,
                       concurrency=(2, 8), batch_size: int = 1024):
    return ds.map_batches(
        MinHasher,
        fn_constructor_args=(text_col, num_hashes, shingle_k),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


def minhash_lsh_dupes(ds, text_col: str = "text", id_col: str = "doc_id",
                      num_hashes: int = 64, bands: int = 16, shingle_k: int = 5,
                      jaccard_threshold: float = 0.8, concurrency=(2, 8)):
    """Candidate near-dup pairs via banded MinHash-LSH, verified by minhash
    Jaccard estimate. Returns (id_a, id_b, est_jaccard) with id_a < id_b.

    Plan: signatures (actor pool) → flat_map to (band_key, id, signature) —
    the shuffle carries only ids+signatures — → groupby band_key →
    in-group pairwise verify (bucket sizes are small by construction).
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(ds, text_col, num_hashes, shingle_k, concurrency)

    def explode(batch: pa.Table) -> pa.Table:
        mh = batch["minhash"]
        if isinstance(mh, pa.ChunkedArray):
            mh = mh.combine_chunks()
        sig = mh.values.to_numpy(zero_copy_only=False).reshape(-1, num_hashes).astype(np.uint64)
        ids = batch[id_col].to_pylist()
        n = len(ids)
        band_keys, out_ids, out_sig_rows = [], [], []
        for b in range(bands):
            chunk = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
            for i in range(n):
                digest = hashlib.md5(chunk[i].tobytes() + bytes([b])).hexdigest()[:16]
                band_keys.append(digest)
                out_ids.append(ids[i])
                out_sig_rows.append(i)
        rep_sig = sig[np.asarray(out_sig_rows)]
        return pa.table(
            {
                "band_key": pa.array(band_keys, type=pa.string()),
                id_col: pa.array(out_ids),
                "minhash": pa.FixedSizeListArray.from_arrays(
                    pa.array(rep_sig.astype(np.int64).ravel()), num_hashes
                ),
            }
        )

    def verify(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        if n < 2:
            return pa.table(
                {"id_a": pa.array([], type=pa.int64()), "id_b": pa.array([], type=pa.int64()),
                 "est_jaccard": pa.array([], type=pa.float64())}
            )
        mh = tbl["minhash"]
        if isinstance(mh, pa.ChunkedArray):
            mh = mh.combine_chunks()
        sig = mh.values.to_numpy(zero_copy_only=False).reshape(-1, num_hashes)
        ids = np.asarray(tbl[id_col].to_pylist())
        a_out, b_out, j_out = [], [], []
        for i in range(n - 1):
            est = (sig[i + 1 :] == sig[i]).mean(axis=1)
            hit = np.flatnonzero(est >= jaccard_threshold)
            for h in hit:
                x, y = ids[i], ids[i + 1 + h]
                if x == y:
                    continue
                a_out.append(min(x, y))
                b_out.append(max(x, y))
                j_out.append(float(est[h]))
        return pa.table(
            {"id_a": pa.array(a_out, type=pa.int64()), "id_b": pa.array(b_out, type=pa.int64()),
             "est_jaccard": pa.array(j_out, type=pa.float64())}
        )

    exploded = sigs.map_batches(explode, batch_format="pyarrow")
    pairs = exploded.groupby("band_key").map_groups(verify, batch_format="pyarrow")

    # candidate pairs repeat across bands → final dedup of the (small) pair set
    def dedup_pairs(tbl: pa.Table) -> pa.Table:
        return tbl.slice(0, 1)

    return pairs.groupby(["id_a", "id_b"]).map_groups(dedup_pairs, batch_format="pyarrow")


# --- SimHash ---------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over whitespace tokens (FNV token hashes, sign
    accumulation) — near-dup docs differ in few bits."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.bit_masks = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> np.uint64:
        acc = np.zeros(64, dtype=np.int64)
        for w in text.split():
            h = np.uint64(int(hashlib.md5(w.encode("utf-8")).hexdigest()[:16], 16))
            bits = ((h & self.bit_masks) != 0).astype(np.int64)
            acc += 2 * bits - 1
        return np.uint64(((acc > 0).astype(np.uint64) * self.bit_masks).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        arr = batch[self.text_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        sh = np.fromiter((self.simhash(t) for t in arr.to_pylist()), dtype=np.uint64, count=batch.num_rows)
        return batch.append_column("simhash", pa.array(sh.astype(np.int64)))


def simhash_signatures(ds, text_col: str = "text", concurrency=(2, 8), batch_size: int = 1024):
    return ds.map_batches(
        SimHasher, fn_constructor_args=(text_col,), batch_format="pyarrow",
        concurrency=concurrency, batch_size=batch_size,
    )


# --- n-gram Jaccard (exact verification kernel) ----------------------------


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact character-shingle Jaccard — the verifier behind LSH candidates."""
    sa = set(_shingle_hashes(a, k).tolist())
    sb = set(_shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# --- embedding near-dup ----------------------------------------------------


def embedding_dupes(ds, emb_col: str = "embedding", id_col: str = "vec_id",
                    cos_threshold: float = 0.95, n_planes: int = 12, seed: int = 29):
    """Embedding-cosine near-dup via random-hyperplane LSH buckets: vectors
    whose sign signature matches land in one group; exact cosine verified
    in-group. Planes are seeded so every task agrees (broadcast-free — the
    'model' is the RNG seed)."""

    def bucketize(batch: pa.Table) -> pa.Table:
        emb = batch[emb_col]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = emb.values.to_numpy(zero_copy_only=False)
        dim = len(flat) // batch.num_rows if batch.num_rows else 0
        mat = flat.reshape(-1, dim).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.maximum(norms, 1e-12)
        planes = np.random.default_rng(seed).normal(size=(dim, n_planes))
        signs = (mat @ planes) > 0
        keys = (signs.astype(np.uint64) << np.arange(n_planes, dtype=np.uint64)).sum(axis=1)
        return pa.table(
            {
                "lsh_key": pa.array(keys.astype(np.int64)),
                id_col: batch[id_col],
                "unit": pa.FixedSizeListArray.from_arrays(pa.array(mat.ravel()), dim),
            }
        )

    def verify(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        empty = pa.table(
            {"id_a": pa.array([], type=pa.int64()), "id_b": pa.array([], type=pa.int64()),
             "cosine": pa.array([], type=pa.float64())}
        )
        if n < 2:
            return empty
        unit = tbl["unit"]
        if isinstance(unit, pa.ChunkedArray):
            unit = unit.combine_chunks()
        flat = unit.values.to_numpy(zero_copy_only=False)
        mat = flat.reshape(n, -1)
        ids = np.asarray(tbl[id_col].to_pylist())
        sims = mat @ mat.T
        iu = np.triu_indices(n, 1)
        hit = sims[iu] >= cos_threshold
        ia, ib = ids[iu[0][hit]], ids[iu[1][hit]]
        return pa.table(
            {"id_a": pa.array(np.minimum(ia, ib)), "id_b": pa.array(np.maximum(ia, ib)),
             "cosine": pa.array(sims[iu][hit])}
        )

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")
    return bucketed.groupby("lsh_key").map_groups(verify, batch_format="pyarrow")
