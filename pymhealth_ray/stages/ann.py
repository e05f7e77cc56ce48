"""Similarity search over an embedding column (list<float>).

- ``knn_bruteforce``: exact cosine top-k — the query matrix is broadcast ONCE
  via ray.put and each map_batches task scores its batch against it with one
  matmul (small-side broadcast, never a shuffle join).
- ``knn_ivf``: the scale path — k-means-style coarse quantizer (seeded,
  trained on a sample), vectors bucketed by nearest centroid; queries probe
  only the ``nprobe`` nearest buckets.
"""

from __future__ import annotations

import heapq
from typing import List

import numpy as np
import pyarrow as pa
import ray


def _emb_matrix(batch: pa.Table, emb_col: str) -> np.ndarray:
    emb = batch[emb_col]
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    flat = emb.values.to_numpy(zero_copy_only=False)
    if batch.num_rows == 0:
        return np.zeros((0, 0))
    return flat.reshape(batch.num_rows, -1).astype(np.float64)


def _unit(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


class _BruteForceScorer:
    """Actor: queries fetched from the object store and normalized ONCE in
    __init__; __call__ is one matmul + partial top-k per batch."""

    def __init__(self, q_ref, emb_col: str, id_col: str, k: int, exclude_self: bool,
                 metric: str = "cosine"):
        q_ids, q_mat = ray.get(q_ref)
        self.q_ids = q_ids
        self.q = _unit(q_mat) if metric == "cosine" else q_mat.astype(np.float64)
        self.emb_col = emb_col
        self.id_col = id_col
        self.k = k
        self.exclude_self = exclude_self
        self.metric = metric

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _emb_matrix(batch, self.emb_col)
        mat = _unit(mat) if self.metric == "cosine" else mat.astype(np.float64)
        ids = np.asarray(batch[self.id_col].to_pylist())
        sims = self.q @ mat.T  # (n_q, n_batch)
        if self.exclude_self:
            same = self.q_ids[:, None] == ids[None, :]
            sims = np.where(same, -np.inf, sims)
        k = min(self.k, sims.shape[1])
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        rows = np.repeat(self.q_ids, k)
        cand = ids[idx.ravel()]
        simv = np.take_along_axis(sims, idx, axis=1).ravel()
        keep = np.isfinite(simv)
        return pa.table(
            {
                "query_id": pa.array(rows[keep]),
                "neighbor_id": pa.array(cand[keep]),
                "cosine": pa.array(simv[keep]),
            }
        )


def knn_bruteforce(ds, queries: pa.Table, k: int = 5, emb_col: str = "embedding",
                   id_col: str = "vec_id", exclude_self: bool = True, concurrency=(2, 8),
                   metric: str = "cosine"):
    """Exact top-k of every query against the whole dataset under
    ``metric`` ("cosine" or "dot" — raw inner product, the MIPS ranking;
    the score column is named "cosine" either way for schema stability).

    Per-batch partial top-k flows to the driver (tiny: n_q × k per batch) and
    is merged there — the dataset itself streams, only candidates collect.
    Returns a pyarrow Table (query_id, neighbor_id, cosine) sorted by
    (query_id, -cosine, neighbor_id).
    """
    q_ids = np.asarray(queries[id_col].to_pylist())
    q_mat = _emb_matrix(queries, emb_col)
    q_ref = ray.put((q_ids, q_mat))

    partials = ds.map_batches(
        _BruteForceScorer,
        fn_constructor_args=(q_ref, emb_col, id_col, k, exclude_self, metric),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    # merge partial top-k per query on the driver (bounded: n_batches * n_q * k)
    batches = list(partials.iter_batches(batch_format="pyarrow"))
    tbl = pa.concat_tables(batches) if batches else None
    if tbl is None or tbl.num_rows == 0:
        return pa.table({"query_id": pa.array([], type=pa.int64()),
                         "neighbor_id": pa.array([], type=pa.int64()),
                         "cosine": pa.array([], type=pa.float64())})
    qi = np.asarray(tbl["query_id"].to_pylist())
    ni = np.asarray(tbl["neighbor_id"].to_pylist())
    cs = np.asarray(tbl["cosine"].to_pylist())
    out_q: List[int] = []
    out_n: List[int] = []
    out_c: List[float] = []
    for q in np.unique(qi):
        m = qi == q
        order = np.lexsort((ni[m], -cs[m]))[:k]
        out_q.extend([int(q)] * len(order))
        out_n.extend(ni[m][order].tolist())
        out_c.extend(cs[m][order].tolist())
    return pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                     "neighbor_id": pa.array(out_n, type=pa.int64()),
                     "cosine": pa.array(out_c, type=pa.float64())})


def quantize_dequantize_int8(mat: np.ndarray) -> np.ndarray:
    """Symmetric per-vector int8 quantization, returned DEQUANTIZED
    (float64): q = round(x · 127/max|x|), back to q/scale. Elementwise
    (no reductions across rows), so engine batches and a single-process
    full matrix produce bit-identical values."""
    m = mat.astype(np.float64)
    amax = np.abs(m).max(axis=1)
    amax[amax == 0] = 1.0
    scale = 127.0 / amax
    q = np.round(m * scale[:, None])
    return q / scale[:, None]


def quantized_embeddings(ds, emb_col: str = "embedding",
                         id_col: str = "vec_id"):
    """Map-only int8 quantize→dequantize of the embedding column — the
    4x-storage-compression path of a 100 TB embedding store; pair with
    :func:`knn_bruteforce` to measure the recall cost."""

    def fn(batch: pa.Table) -> pa.Table:
        deq = quantize_dequantize_int8(_emb_matrix(batch, emb_col))
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()),
            emb_col: pa.FixedSizeListArray.from_arrays(
                pa.array(deq.ravel(), type=pa.float64()), deq.shape[1]),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def train_ivf_centroids(sample: np.ndarray, n_centroids: int, iters: int = 10, seed: int = 5) -> np.ndarray:
    """Mini k-means on unit vectors (cosine == dot): seeded, deterministic."""
    rng = np.random.default_rng(seed)
    sample = _unit(sample)
    cent = sample[rng.choice(len(sample), n_centroids, replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(n_centroids):
            members = sample[assign == c]
            if len(members):
                v = members.sum(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def knn_ivf(ds, queries: pa.Table, k: int = 5, n_centroids: int = 16, nprobe: int = 4,
            emb_col: str = "embedding", id_col: str = "vec_id", train_sample: int = 2048,
            exclude_self: bool = True, concurrency=(2, 8)):
    """IVF-style ANN: bucket vectors by nearest centroid (one pass), score
    queries only against their ``nprobe`` closest buckets. Recall < 1 by
    design; the brute-force path is the correctness baseline.

    At cluster scale the bucketed dataset would be written partitioned by
    centroid so probes read only matching partitions.
    """
    sample_tbl = ds.limit(train_sample).to_pandas().sort_values(
        id_col).reset_index(drop=True)
    sample = np.stack(sample_tbl[emb_col].to_list()).astype(np.float64)
    cent = train_ivf_centroids(sample, n_centroids)
    cent_ref = ray.put(cent)

    q_ids = np.asarray(queries[id_col].to_pylist())
    q_mat = _unit(_emb_matrix(queries, emb_col))
    q_probe = np.argsort(-(q_mat @ cent.T), axis=1)[:, :nprobe]
    probe_sets = [set(row.tolist()) for row in q_probe]

    class Scorer:
        def __init__(self):
            self.cent = ray.get(cent_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _unit(_emb_matrix(batch, emb_col))
            ids = np.asarray(batch[id_col].to_pylist())
            assign = np.argmax(mat @ self.cent.T, axis=1)
            out_q, out_n, out_c = [], [], []
            for qe, (qid, probes) in enumerate(zip(q_ids, probe_sets)):
                mask = np.isin(assign, list(probes))
                if exclude_self:
                    mask &= ids != qid
                if not mask.any():
                    continue
                sims = mat[mask] @ q_mat[qe]
                sel = np.argsort(-sims)[:k]
                out_q.extend([qid] * len(sel))
                out_n.extend(ids[mask][sel].tolist())
                out_c.extend(sims[sel].tolist())
            return pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                             "neighbor_id": pa.array(out_n, type=pa.int64()),
                             "cosine": pa.array(out_c, type=pa.float64())})

    partials = ds.map_batches(Scorer, batch_format="pyarrow", concurrency=concurrency)
    merged: dict = {}
    for b in partials.iter_batches(batch_format="pyarrow"):
        for q, n, c in zip(b["query_id"].to_pylist(), b["neighbor_id"].to_pylist(), b["cosine"].to_pylist()):
            heap = merged.setdefault(q, [])
            heapq.heappush(heap, (c, n))
            if len(heap) > k:
                heapq.heappop(heap)
    out_q, out_n, out_c = [], [], []
    for q in sorted(merged):
        for c, n in sorted(merged[q], key=lambda t: (-t[0], t[1])):
            out_q.append(q)
            out_n.append(n)
            out_c.append(c)
    return pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                     "neighbor_id": pa.array(out_n, type=pa.int64()),
                     "cosine": pa.array(out_c, type=pa.float64())})


# --- centroid-partitioned IVF layout (round 2: the 100TB probe path) -------


def build_ivf_index(ds, index_dir: str, n_centroids: int = 16,
                    emb_col: str = "embedding", id_col: str = "vec_id",
                    train_sample: int = 2048, iters: int = 10, seed: int = 5):
    """Write the dataset PARTITIONED BY CENTROID under ``index_dir`` so a
    probe later reads only its ``nprobe`` partitions' files.

    One streaming pass: assign each vector to its nearest centroid
    (broadcast centroids, one matmul per batch) → identity-partitioned
    resumable write (``part=<centroid>/data.parquet`` + lineage manifests —
    a failed build resumes from finished centroids). Centroids are stored in
    the index (``centroids.npy``) so probing needs no recompute. Returns the
    centroid matrix.
    """
    import os
    import pathlib

    from pymhealth_ray.state.lineage import params_hash, read_manifests, resumable_write

    import json

    params = {"n_centroids": n_centroids, "seed": seed, "iters": iters,
              "train_sample": train_sample, "kind": "ivf", "v": 2}
    cent_path = pathlib.Path(index_dir) / "centroids.npy"
    complete_path = pathlib.Path(index_dir) / "_complete.json"
    if cent_path.exists() and complete_path.exists():
        try:
            if json.loads(complete_path.read_text()).get("params_hash") == params_hash(params):
                # complete index for these params — nothing to do
                return np.load(cent_path)
        except (ValueError, OSError):
            pass

    # sort the sample by id: ds.limit() row ORDER follows block arrival, and
    # k-means init indexes into the sample — sorting makes the trained
    # centroids independent of partitioning/scheduling (v2 of the index)
    sample_tbl = ds.limit(train_sample).to_pandas().sort_values(
        id_col).reset_index(drop=True)
    sample = np.stack(sample_tbl[emb_col].to_list()).astype(np.float64)
    cent = train_ivf_centroids(sample, n_centroids, iters=iters, seed=seed)
    cent_ref = ray.put(cent)

    class Assign:
        def __init__(self):
            self.cent = ray.get(cent_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _unit(_emb_matrix(batch, emb_col))
            assign = np.argmax(mat @ self.cent.T, axis=1).astype(np.int32)
            return batch.append_column("centroid", pa.array(assign))

    assigned = ds.map_batches(Assign, batch_format="pyarrow", concurrency=(2, 8))
    resumable_write(
        assigned, index_dir, entity_col=id_col, num_buckets=n_centroids,
        params=params,
        bucket_col="centroid",
    )
    p = pathlib.Path(index_dir)
    tmp = p / ".centroids.npy.tmp"
    with open(tmp, "wb") as f:
        np.save(f, cent)
    os.replace(tmp, p / "centroids.npy")
    ctmp = p / "._complete.json.tmp"
    ctmp.write_text(json.dumps({"params_hash": params_hash(params)}))
    os.replace(ctmp, p / "_complete.json")
    return cent


def ivf_probe_paths(index_dir: str, centroid_ids) -> list:
    """The exact data files a probe of these centroids touches — the
    partition-pruning contract (pytest asserts len ≤ nprobe × files/part)."""
    import pathlib

    out = []
    for c in sorted(set(int(c) for c in centroid_ids)):
        f = pathlib.Path(index_dir) / f"part={c}" / "data.parquet"
        if f.exists():
            out.append(str(f))
    return out


def knn_ivf_partitioned(index_dir: str, queries: pa.Table, k: int = 5, nprobe: int = 4,
                        emb_col: str = "embedding", id_col: str = "vec_id",
                        exclude_self: bool = True, concurrency=(2, 8)):
    """ANN probe against a ``build_ivf_index`` layout: loads the (tiny)
    centroid matrix, computes each query's ``nprobe`` nearest centroids, and
    reads ONLY the union of those partitions' files — at 100TB the other
    ``n_centroids - nprobe`` partitions never leave storage. Scoring reuses
    the stored ``centroid`` column (no re-assignment)."""
    import pathlib

    cent = np.load(pathlib.Path(index_dir) / "centroids.npy")
    q_ids = np.asarray(queries[id_col].to_pylist())
    q_mat = _unit(_emb_matrix(queries, emb_col))
    q_probe = np.argsort(-(q_mat @ cent.T), axis=1)[:, :nprobe]
    probe_sets = [set(row.tolist()) for row in q_probe]
    union = sorted(set().union(*probe_sets)) if probe_sets else []
    paths = ivf_probe_paths(index_dir, union)
    if not paths:
        return pa.table({"query_id": pa.array([], type=pa.int64()),
                         "neighbor_id": pa.array([], type=pa.int64()),
                         "cosine": pa.array([], type=pa.float64())})

    from pymhealth_ray.sources.io import read_table

    ds = read_table(paths, columns=[id_col, emb_col, "centroid"])
    q_ref = ray.put((q_ids, q_mat, probe_sets))

    class Scorer:
        def __init__(self):
            self.q_ids, self.q_mat, self.probe_sets = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _unit(_emb_matrix(batch, emb_col))
            ids = np.asarray(batch[id_col].to_pylist())
            assign = np.asarray(batch["centroid"].to_pylist())
            out_q, out_n, out_c = [], [], []
            for qe, (qid, probes) in enumerate(zip(self.q_ids, self.probe_sets)):
                mask = np.isin(assign, list(probes))
                if exclude_self:
                    mask &= ids != qid
                if not mask.any():
                    continue
                sims = mat[mask] @ self.q_mat[qe]
                sel = np.argsort(-sims)[:k]
                out_q.extend([qid] * len(sel))
                out_n.extend(ids[mask][sel].tolist())
                out_c.extend(sims[sel].tolist())
            return pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                             "neighbor_id": pa.array(out_n, type=pa.int64()),
                             "cosine": pa.array(out_c, type=pa.float64())})

    partials = ds.map_batches(Scorer, batch_format="pyarrow", concurrency=concurrency)
    merged: dict = {}
    for b in partials.iter_batches(batch_format="pyarrow"):
        for q, n, c in zip(b["query_id"].to_pylist(), b["neighbor_id"].to_pylist(), b["cosine"].to_pylist()):
            heap = merged.setdefault(q, [])
            heapq.heappush(heap, (c, n))
            if len(heap) > k:
                heapq.heappop(heap)
    out_q, out_n, out_c = [], [], []
    for q in sorted(merged):
        for c, n in sorted(merged[q], key=lambda t: (-t[0], t[1])):
            out_q.append(q)
            out_n.append(n)
            out_c.append(c)
    return pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                     "neighbor_id": pa.array(out_n, type=pa.int64()),
                     "cosine": pa.array(out_c, type=pa.float64())})


def train_pq_codebooks(sample: np.ndarray, m: int = 4, k: int = 16,
                       iters: int = 8, seed: int = 11) -> np.ndarray:
    """PRODUCT-QUANTIZATION codebooks: split the dimension into ``m``
    subspaces and run a seeded deterministic L2 k-means in each —
    (m, k, d/m). Empty clusters keep their previous centroid; argmin
    ties resolve to the lowest centroid index (np.argmin), the same
    rule the decoder and the single-process oracle use."""
    n, d = sample.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by {m} subspaces")
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, dsub), dtype=np.float64)
    for s in range(m):
        sub = sample[:, s * dsub:(s + 1) * dsub].astype(np.float64)
        cent = sub[rng.choice(n, k, replace=False)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(k):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[s] = cent
    return books


def pq_decode(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Encode-then-decode through the PQ codebooks (ADC-style lossy
    reconstruction): per subspace, each subvector snaps to its nearest
    (L2) centroid. Elementwise per row — engine batches and a
    single-process full matrix produce identical values."""
    m, k, dsub = books.shape
    out = np.empty_like(mat, dtype=np.float64)
    for s in range(m):
        sub = mat[:, s * dsub:(s + 1) * dsub].astype(np.float64)
        d2 = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
        out[:, s * dsub:(s + 1) * dsub] = books[s][np.argmin(d2, axis=1)]
    return out


def pq_embeddings(ds, books: np.ndarray, emb_col: str = "embedding",
                  id_col: str = "vec_id"):
    """Map-only PQ encode→decode of the embedding column (the ~16-64x
    compression path of a 100 TB vector store; codebooks broadcast once
    through the object store)."""
    books_ref = ray.put(np.ascontiguousarray(books))

    def fn(batch: pa.Table) -> pa.Table:
        b = ray.get(books_ref)
        deq = pq_decode(_emb_matrix(batch, emb_col), b)
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()),
            emb_col: pa.FixedSizeListArray.from_arrays(
                pa.array(deq.ravel(), type=pa.float64()), deq.shape[1]),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def mmr_select(ds, query_vec: np.ndarray, k: int = 10, lam: float = 0.7,
               pool: int = 64, emb_col: str = "embedding",
               id_col: str = "vec_id") -> pa.Table:
    """MAXIMAL MARGINAL RELEVANCE selection — diversity-aware top-k, the
    standard greedy for picking training examples / retrieval results
    that are relevant AND mutually non-redundant:

        score(d) = λ·cos(q, d) − (1−λ)·max_{s∈S} cos(d, s)

    Two-phase plan that keeps the greedy's quadratic term off the
    corpus: (1) the distributed exact brute-force scorer streams the
    dataset once and collects only a ``pool``-sized candidate set
    (bounded — the same contract as knn_bruteforce's driver merge);
    (2) the greedy runs on the driver over pool×pool cosines. Candidate
    rows are re-fetched and sorted by id so every float op sees one
    canonical array layout regardless of scheduling.

    Returns (rank, vec_id, rel_cosine, mmr_score) — ``mmr_score`` is
    the selection-time score (the first pick's is λ·rel, no penalty).
    Ties resolve to the lowest id (np.argmax first-max over id-sorted
    rows)."""
    import pyarrow.compute as pc

    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    qtbl = pa.table({id_col: pa.array([np.int64(-1)]),
                     emb_col: pa.array([q.tolist()],
                                       type=pa.list_(pa.float32()))})
    top = knn_bruteforce(ds, qtbl, k=pool, emb_col=emb_col,
                         id_col=id_col, exclude_self=False)
    ids = np.sort(np.asarray(top["neighbor_id"].to_pylist(),
                             dtype=np.int64))
    ids_ref = ray.put(ids)

    def fetch(batch: pa.Table) -> pa.Table:
        want = ray.get(ids_ref)
        m = np.isin(batch[id_col].to_numpy(zero_copy_only=False), want)
        return batch.filter(pa.array(m)).select([id_col, emb_col])

    rows = ds.map_batches(fetch, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r[id_col])
    rid = np.array([r[id_col] for r in rows], dtype=np.int64)
    P = np.array([r[emb_col] for r in rows], dtype=np.float64)
    P = P / np.maximum(np.linalg.norm(P, axis=1, keepdims=True), 1e-12)
    rel = P @ q
    sims = P @ P.T
    n = len(rid)
    k = min(k, n)
    chosen = np.zeros(n, dtype=bool)
    max_sim = np.full(n, -np.inf)
    out_id, out_rel, out_score = [], [], []
    for _ in range(k):
        pen = np.zeros(n)
        seen = ~np.isneginf(max_sim)  # avoid 0·(−inf) warnings at λ=1
        pen[seen] = (1.0 - lam) * max_sim[seen]
        score = lam * rel - pen
        score = np.where(chosen, -np.inf, score)
        j = int(np.argmax(score))
        chosen[j] = True
        out_id.append(rid[j])
        out_rel.append(rel[j])
        out_score.append(score[j])
        max_sim = np.maximum(max_sim, sims[:, j])
    return pa.table({
        "rank": pa.array(np.arange(1, k + 1, dtype=np.int64)),
        id_col: pa.array(np.array(out_id, dtype=np.int64)),
        "rel_cosine": pa.array(np.array(out_rel)),
        "mmr_score": pa.array(np.array(out_score)),
    })
