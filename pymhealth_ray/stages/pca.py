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


def label_scatter_partials(ds, label_col: str = "label",
                           emb_col: str = "embedding",
                           scale_bits: int = 18):
    """Per-LABEL exact integer scatter partials — one row per
    (block, label): n, s (Σq) and ss (Σqqᵀ row-major). Same exactness
    discipline as scatter_partials; the label loop is over the ≤ tens
    of distinct labels in a block, each side vectorized."""

    def partial(batch: pa.Table) -> pa.Table:
        q = _quantize(_emb_matrix(batch, emb_col), scale_bits)
        lab = batch[label_col]
        if isinstance(lab, pa.ChunkedArray):
            lab = lab.combine_chunks()
        lab = lab.to_numpy(zero_copy_only=False).astype(np.int64)
        labs, ns, ss_l, s_l = [], [], [], []
        for lv in np.unique(lab):
            m = q[lab == lv]
            d = m.shape[1]
            ss = np.zeros((d, d), dtype=np.int64)
            s = np.zeros(d, dtype=np.int64)
            for i in range(0, len(m), _CHUNK):
                c = m[i:i + _CHUNK]
                ss += (c.T @ c).astype(np.int64)
                s += c.sum(axis=0).astype(np.int64)
            labs.append(int(lv))
            ns.append(len(m))
            s_l.append(s.tolist())
            ss_l.append(ss.ravel().tolist())
        return pa.table({
            "label": pa.array(labs, type=pa.int64()),
            "n": pa.array(ns, type=pa.int64()),
            "s": pa.array(s_l, type=pa.list_(pa.int64())),
            "ss": pa.array(ss_l, type=pa.list_(pa.int64()))})

    return ds.map_batches(partial, batch_format="pyarrow", batch_size=None)


def merge_label_scatter(parts) -> dict:
    """Merge partial rows into {label: (n, s, ss)} with python-int
    exactness (any partitioning → bit-identical totals)."""
    out: dict = {}
    for p in parts:
        lv = int(p["label"])
        d = len(p["s"])
        n0, s0, ss0 = out.get(lv, (0, [0] * d, [0] * (d * d)))
        n0 += int(p["n"])
        ps, pss = p["s"], p["ss"]
        for j in range(d):
            s0[j] += int(ps[j])
        for j in range(d * d):
            ss0[j] += int(pss[j])
        out[lv] = (n0, s0, ss0)
    return out


def gaussian_md2_params(n: int, s: list, ss: list,
                        ridge_frac: float = 0.1):
    """Float finish shared by the engine and the materialized oracle:
    mean (q-units) and the ridge-regularized inverse covariance.

        covq = (n·ss − s·sᵀ) / n²      (population covariance, q-units)
        inv  = (covq + λI)⁻¹,  λ = ridge_frac · trace(covq)/d

    The ridge keeps the inverse defined when n < d (few samples per
    label). Every float op runs on the driver from the EXACT integer
    scatter, so any partitioning yields the identical (mu, inv)."""
    d = int(np.sqrt(len(ss)))
    m = np.empty((d, d), dtype=np.float64)
    for r in range(d):
        for c in range(d):
            m[r, c] = float(n * ss[r * d + c] - s[r] * s[c])
    covq = m / (float(n) * float(n))
    lam = ridge_frac * (np.trace(covq) / d)
    inv = np.linalg.inv(covq + lam * np.eye(d))
    mu = np.array([float(v) for v in s], dtype=np.float64) / float(n)
    return mu, inv


def md2_rows(matq: np.ndarray, mu: np.ndarray, inv: np.ndarray) -> np.ndarray:
    """Per-row squared Mahalanobis distance — the one float kernel both
    the distributed map and the single-process oracle call verbatim."""
    diff = matq - mu
    y = diff @ inv
    return (y * diff).sum(axis=1)


def linear_probe_weights(stats: dict, ridge_frac: float = 0.1):
    """Closed-form one-vs-rest LINEAR PROBE from per-label exact
    scatter partials (no iterations, no randomness): ridge normal
    equations  (XᵀX + λI) w_l = Σ_{i∈l} x_i  in quantized units.

    ``stats`` is merge_label_scatter's output. Returns
    ``(labels_asc, W)`` with W[k] the weight vector of labels_asc[k].
    All float ops run on the driver from exact integers, so any input
    partitioning yields bit-identical weights."""
    labels = sorted(stats)
    d = int(np.sqrt(len(stats[labels[0]][2])))
    SS = [0] * (d * d)
    for lv in labels:
        ss = stats[lv][2]
        for j in range(d * d):
            SS[j] += int(ss[j])
    A = np.empty((d, d), dtype=np.float64)
    for r in range(d):
        for c in range(d):
            A[r, c] = float(SS[r * d + c])
    lam = ridge_frac * (np.trace(A) / d)
    M = A + lam * np.eye(d)
    W = np.empty((len(labels), d), dtype=np.float64)
    for k, lv in enumerate(labels):
        b = np.array([float(v) for v in stats[lv][1]], dtype=np.float64)
        W[k] = np.linalg.solve(M, b)
    return np.array(labels, dtype=np.int64), W
