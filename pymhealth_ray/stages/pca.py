"""Distributed PCA over an embedding column — exact integer covariance
partials, driver-side eigendecomposition, map-only projection.

Determinism is the design constraint: float partial sums depend on block
grouping, so a float covariance would differ between partitionings (and
from any single-process oracle) in ulps that eigendecomposition amplifies.
Instead embeddings are quantized to integers (``round(x·2^scale_bits)`` —
exact for |x| < 2^(21-scale_bits+31)…practically any unit-scale embedding),
and the scatter matrix is accumulated EXACTLY:

- per block, in chunks of ≤1024 rows, ``qᵀq`` runs through float64 BLAS —
  every product and every chunk sum stays under 2^53, so the float result
  IS the integer result — then accumulates into int64;
- block partials (n, Σq, Σqqᵀ) are vocabulary-sized (d + d² ints), merged
  on the driver in arbitrary-precision Python ints;
- the centered scatter ``M = n·Σqqᵀ − (Σq)(Σq)ᵀ`` (same eigenvectors as
  the covariance, positive scale) feeds one LAPACK ``eigh`` on the driver.

Any partitioning of the input yields the bit-identical M, hence identical
components and projections — the property the oracle gate checks.

Reference lineage: linear-algebra feature family (`o1fit`,
`/root/reference/src/mhealth/generic/timedomain.py`) lifted to
multivariate embeddings; SURVEY §2 training-data surface (ANN siblings in
stages/ann.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_CHUNK = 1024


def _quantize(mat: np.ndarray, scale_bits: int) -> np.ndarray:
    q = np.rint(mat.astype(np.float64) * (1 << scale_bits))
    if np.abs(q).max(initial=0.0) >= 2.0**21:
        raise ValueError("embedding magnitude too large for exact partials; "
                         "lower scale_bits")
    return q


def _emb_matrix(batch: pa.Table, emb_col: str) -> np.ndarray:
    col = batch[emb_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False)
    d = len(col[0])
    return flat.reshape(-1, d)


def scatter_partials(ds, emb_col: str = "embedding", scale_bits: int = 18):
    """Dataset of one row per block: n, s (list<int64>, Σq) and ss
    (list<int64>, Σqqᵀ row-major) — exact integer partials."""

    def partial(batch: pa.Table) -> pa.Table:
        q = _quantize(_emb_matrix(batch, emb_col), scale_bits)
        d = q.shape[1]
        ss = np.zeros((d, d), dtype=np.int64)
        s = np.zeros(d, dtype=np.int64)
        for i in range(0, len(q), _CHUNK):
            c = q[i:i + _CHUNK]
            ss += (c.T @ c).astype(np.int64)   # exact: <2^53 per chunk
            s += c.sum(axis=0).astype(np.int64)
        return pa.table({
            "n": pa.array([len(q)], type=pa.int64()),
            "s": pa.array([s.tolist()], type=pa.list_(pa.int64())),
            "ss": pa.array([ss.ravel().tolist()], type=pa.list_(pa.int64())),
        })

    return ds.map_batches(partial, batch_format="pyarrow", batch_size=None)


def pca_components(ds, emb_col: str = "embedding", k: int = 2,
                   scale_bits: int = 18) -> np.ndarray:
    """Top-k principal directions (k×d float64, sign-fixed so each
    component's largest-|coord| entry is positive)."""
    parts = scatter_partials(ds, emb_col, scale_bits).take_all()
    if not parts:
        raise ValueError("empty dataset")
    d = len(parts[0]["s"])
    n = 0
    s = [0] * d
    ss = [0] * (d * d)
    for p in parts:                       # python ints: exact at any scale
        n += int(p["n"])
        ps, pss = p["s"], p["ss"]
        for j in range(d):
            s[j] += int(ps[j])
        for j in range(d * d):
            ss[j] += int(pss[j])
    m = np.empty((d, d), dtype=np.float64)
    for r in range(d):
        for c in range(d):
            m[r, c] = float(n * ss[r * d + c] - s[r] * s[c])
    vals, vecs = np.linalg.eigh(m)
    comp = vecs[:, ::-1][:, :k].T.copy()
    for i in range(k):                    # deterministic sign convention
        j = int(np.argmax(np.abs(comp[i])))
        if comp[i, j] < 0:
            comp[i] = -comp[i]
    return comp


def pca_project(ds, components: np.ndarray, emb_col: str = "embedding",
                id_col: str = "vec_id", scale_bits: int = 18):
    """Map-only projection of every (quantized) embedding onto the given
    components; returns (id, pc1..pck) with the id column cast to int64."""
    import ray

    comp_ref = ray.put(np.ascontiguousarray(components))
    scale = float(1 << scale_bits)

    def project(batch: pa.Table) -> pa.Table:
        comp = ray.get(comp_ref)
        q = _quantize(_emb_matrix(batch, emb_col), scale_bits) / scale
        proj = q @ comp.T
        cols = {id_col: batch[id_col].cast(pa.int64())}
        for i in range(comp.shape[0]):
            cols[f"pc{i + 1}"] = pa.array(proj[:, i])
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")


def embedding_dispersion(ds, emb_col: str = "embedding",
                         scale_bits: int = 18) -> dict:
    """EXACT corpus dispersion — mean pairwise squared distance between
    (quantized) embeddings — from ONE streaming pass and O(d·blocks)
    driver state, via the sum-vector identity

        Σ_{i<j} ‖q_i − q_j‖² = n·Σ‖q_i‖² − ‖Σq_i‖².

    The pairwise statistic every diversity/coverage report wants, with
    no pairwise anything: at 100 TB nothing is materialized beyond one
    int vector per dim per block. Same exact-integer discipline as the
    scatter partials above (half-away quantization matching SQL ROUND;
    per-dim int64 block sums + python-int driver merge; the per-row dot
    chunk-summed so no int64 overflow at any block size). Returns
    ``{"n": int, "A": int, "B": int}`` — A = Σ_d (Σ_i q_id)²,
    B = Σ_i ‖q_i‖², both arbitrary-precision python ints.
    """

    def partial(batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch, emb_col)
        v = m.astype(np.float64) * float(1 << scale_bits)
        q = (np.sign(v) * np.floor(np.abs(v) + 0.5))  # SQL ROUND
        if np.abs(q).max(initial=0.0) >= 2.0 ** 21:
            raise ValueError("embedding magnitude too large for exact "
                             "partials; lower scale_bits")
        q = q.astype(np.int64)
        s = q.sum(axis=0, dtype=np.int64)  # |s| ≤ rows·2²¹ — exact
        dots = (q * q).sum(axis=1, dtype=np.int64)  # ≤ d·2⁴² per row
        # chunked python-int total: int64 is exact only to ~32k rows of
        # worst-case dots, so blocks merge through python ints
        b_total = 0
        for i in range(0, len(dots), 16384):
            b_total += int(dots[i:i + 16384].sum(dtype=np.int64))
        return pa.table({
            "s": pa.array([s.tolist()], type=pa.list_(pa.int64())),
            "b_str": pa.array([str(b_total)]),
            "rows": pa.array([len(dots)], type=pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).take_all()
    if not parts:
        return {"n": 0, "A": 0, "B": 0}
    d = len(parts[0]["s"])
    sd = [0] * d
    B = 0
    n = 0
    for p in parts:
        for j, v in enumerate(p["s"]):
            sd[j] += int(v)
        B += int(p["b_str"])
        n += int(p["rows"])
    A = sum(v * v for v in sd)
    return {"n": n, "A": A, "B": B}
