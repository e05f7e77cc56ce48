"""Semantic deduplication over an embedding column (SemDeDup, Abbas et
al. 2023): k-means-cluster the embeddings, then inside every cluster drop
all but one member of each group of near-identical vectors (pairwise
cosine above a threshold). Web-scale corpora carry large volumes of
semantically-duplicated content that exact/MinHash dedup misses (same
meaning, different surface form); SemDeDup removes it at embedding level.

Distributed plan:
  1. centroids trained once on a deterministic id-sorted sample
     (``stages/ann.train_ivf_centroids`` — cosine k-means), broadcast via
     ``ray.put``;
  2. map-side cluster assignment (batch matmul against the broadcast
     centroid matrix);
  3. ONE hash exchange on the cluster id; each cluster lands in one
     ``map_groups`` task that sorts members by id (partitioning-invariant
     matmul input order), builds the cosine-similarity dup graph above
     ``threshold``, labels connected components with a local union-find,
     and keeps the min-id member per component.

Scale: pairwise work is O(cluster_size² · dim) — bounded by sizing
``n_clusters`` proportionally to the corpus (fixed expected cluster
size), the same contract as the published recipe; clusters are
independent so the stage parallelizes across them.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pymhealth_ray.stages.ann import _emb_matrix, _unit, train_ivf_centroids


def _local_components(n: int, ia: np.ndarray, ib: np.ndarray) -> np.ndarray:
    """Union-find over n local nodes with edge arrays (ia, ib) → min-index
    component label per node."""
    parent = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(ia.tolist(), ib.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return np.array([find(i) for i in range(n)], dtype=np.int64)


def semantic_dedup(ds, *, emb_col: str = "embedding", id_col: str = "vec_id",
                   n_clusters: int = 8, threshold: float = 0.97,
                   train_sample: int = 2048, seed: int = 5):
    """Returns one row per input vector: (id, cluster:int64, rep_id:int64 —
    the kept representative of its near-dup component, keep:bool). Vectors
    with no near-dup neighbor keep themselves."""
    import ray

    sample_tbl = pa.Table.from_pandas(
        ds.limit(train_sample).to_pandas().sort_values(id_col).reset_index(
            drop=True))
    sample = _emb_matrix(sample_tbl, emb_col).astype(np.float64)
    cent = train_ivf_centroids(sample, n_centroids=n_clusters,
                               seed=seed).astype(np.float64)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _unit(_emb_matrix(batch, emb_col).astype(np.float64))
        lab = np.argmax(m @ c.T, axis=1)
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()),
            emb_col: batch[emb_col],
            "cluster": pa.array(lab.astype(np.int64)),
        })

    assigned = ds.map_batches(assign, batch_format="pyarrow")

    def per_cluster(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[(id_col, "ascending")]))
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        m = _unit(_emb_matrix(tbl, emb_col).astype(np.float64))
        sims = m @ m.T
        iu, ju = np.triu_indices(len(ids), k=1)
        hit = sims[iu, ju] > threshold
        labels = _local_components(len(ids), iu[hit], ju[hit])
        rep = ids[labels]
        return pa.table({
            id_col: pa.array(ids),
            "cluster": tbl["cluster"],
            "rep_id": pa.array(rep),
            "keep": pa.array(rep == ids),
        })

    return assigned.groupby("cluster").map_groups(
        per_cluster, batch_format="pyarrow")
