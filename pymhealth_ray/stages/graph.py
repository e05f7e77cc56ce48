"""Distributed connected components — near-dup pairs → dedup clusters.

Completes the dedup story: MinHash-LSH emits verified candidate PAIRS
(stages.dedup); deduplication needs CLUSTERS (keep one doc per component).
Min-label propagation with POINTER DOUBLING, the PRAM shortcutting
technique: every round each node takes (a) the min label over itself and
its neighbors, then (b) the label of its label — so labels reach across 2^r
hops after r rounds and a diameter-D component converges in O(log D)
rounds, not O(D) (a plain-propagation path graph of 60 nodes needs ~59
rounds; with shortcutting it needs ~7 — the long-chain pytest pins this).

Every step of the large-graph path is a co-partitioned exchange over
narrow (node, label) or (edge) rows — O(|E|) shuffle volume per round, no
adjacency materialized on any single node, no driver-side graph state
(edge lists small enough to collect take a driver union-find shortcut
instead — see ``connected_components``). Convergence ("no label
changed anywhere in a full round") is summed from the already-materialized
labels dataset, and the round loop is a driver-side loop over Ray
executions — the honest Ray Data expression of an iterative fixpoint.

Node ids must be int64 (doc ids); labels converge to the component's min
id, matching a single-process union-find with min-canonical roots (the
driver oracle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pymhealth_ray.stages.partition import _stable_bucket_of

_BIG = np.iinfo(np.int64).max


def _min_per_key(tbl: pa.Table, key_col: str, lab_col: str, cur_col: str | None):
    """One row per key with the min label; `changed` = min beat the key's
    own current label (current rides in cur_col, +inf on propagated rows)."""
    k = tbl[key_col]
    if isinstance(k, pa.ChunkedArray):
        k = k.combine_chunks()
    enc = k.dictionary_encode()
    idx = enc.indices.to_numpy(zero_copy_only=False)
    lab = tbl[lab_col].to_numpy(zero_copy_only=False)
    order = np.argsort(idx, kind="stable")
    io, lo = idx[order], lab[order]
    starts = np.ones(len(io), dtype=bool)
    starts[1:] = io[1:] != io[:-1]
    start_pos = np.flatnonzero(starts)
    mins = np.minimum.reduceat(lo, start_pos)
    out = {"v": enc.dictionary.take(pa.array(io[start_pos])), "l": pa.array(mins)}
    if cur_col is not None:
        cur = tbl[cur_col].to_numpy(zero_copy_only=False)[order]
        curmin = np.minimum.reduceat(cur, start_pos)
        out["changed"] = pa.array((mins < curmin).astype(np.int64))
    return pa.table(out)


def _bucketed(t: pa.Table, key: str, num_buckets: int) -> pa.Table:
    return t.append_column("__cbucket", pa.array(
        _stable_bucket_of(t[key], num_buckets), type=pa.int32()))


def _prop_round(und, labels, num_buckets: int):
    """labels'(v) = min(labels(v), min over neighbors labels(u))."""

    def tag_edge(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "v": batch["v"], "u": batch["u"],
            "lab": pa.nulls(n, type=pa.int64()),
            "__cur": pa.nulls(n, type=pa.int64()),
            "__cbucket": batch["__cbucket"],
            "__side": pa.array(np.zeros(n, dtype=np.int8)),
        })

    def tag_label(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        t = pa.table({
            "v": batch["v"], "u": pa.nulls(n, type=pa.int64()),
            "lab": batch["l"], "__cur": batch["l"],
        })
        t = _bucketed(t, "v", num_buckets)
        return t.append_column("__side", pa.array(np.ones(n, dtype=np.int8)))

    def per_bucket(tbl: pa.Table) -> pa.Table:
        side = tbl["__side"].to_numpy(zero_copy_only=False)
        e = tbl.filter(pa.array(side == 0)).select(["v", "u"])
        l = tbl.filter(pa.array(side == 1)).select(["v", "lab"])
        j = e.join(l, keys=["v"], join_type="inner", use_threads=False)
        prop = pa.table({
            "v": j["u"], "lab": j["lab"],
            "__cur": pa.array(np.full(j.num_rows, _BIG, dtype=np.int64)),
        })
        curr = pa.table({"v": l["v"], "lab": l["lab"], "__cur": l["lab"]})
        out = pa.concat_tables([prop, curr])
        return _bucketed(out, "v", num_buckets).rename_columns(
            ["v", "lab", "__cur", "__nbucket"])

    unioned = und.map_batches(tag_edge, batch_format="pyarrow").union(
        labels.map_batches(tag_label, batch_format="pyarrow"))
    cand = unioned.groupby("__cbucket").map_groups(
        lambda t: per_bucket(t.drop_columns(["__cbucket"])), batch_format="pyarrow")
    # NOT materialized and no sum here: the changed flag rides through the
    # shortcut round, which owns the round's single materialize + sum
    return cand.groupby("__nbucket").map_groups(
        lambda t: _min_per_key(t.drop_columns(["__nbucket"]), "v", "lab", "__cur"),
        batch_format="pyarrow")


def _shortcut_round(labels, num_buckets: int):
    """labels'(v) = min(labels(v), labels(labels(v))) — pointer doubling."""

    def tag_lookup(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        t = pa.table({
            "key": batch["v"], "val": batch["l"],
            "v": pa.nulls(n, type=pa.int64()), "l": pa.nulls(n, type=pa.int64()),
            "ch": pa.nulls(n, type=pa.int64()),
        })
        t = _bucketed(t, "key", num_buckets)
        return t.append_column("__side", pa.array(np.zeros(n, dtype=np.int8)))

    def tag_request(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ch = (batch["changed"] if "changed" in batch.column_names
              else pa.array(np.zeros(n, dtype=np.int64)))
        t = pa.table({
            "key": batch["l"], "val": pa.nulls(n, type=pa.int64()),
            "v": batch["v"], "l": batch["l"], "ch": ch,
        })
        t = _bucketed(t, "key", num_buckets)
        return t.append_column("__side", pa.array(np.ones(n, dtype=np.int8)))

    def per_bucket(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = tbl["__side"].to_numpy(zero_copy_only=False)
        look = tbl.filter(pa.array(side == 0)).select(["key", "val"])
        req = tbl.filter(pa.array(side == 1)).select(["key", "v", "l", "ch"])
        j = req.join(look, keys=["key"], join_type="left outer", use_threads=False)
        l = j["l"].to_numpy(zero_copy_only=False)
        # a missing lookup (label not in this bucket's node set — cannot
        # happen for labels that are node ids, but guard) keeps the label
        l2 = pc.coalesce(j["val"], j["l"]).to_numpy(zero_copy_only=False)
        new = np.minimum(l, l2)
        ch = j["ch"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "v": j["v"], "l": pa.array(new),
            "changed": pa.array(((new < l) | (ch > 0)).astype(np.int64)),
        })

    unioned = labels.map_batches(tag_lookup, batch_format="pyarrow").union(
        labels.map_batches(tag_request, batch_format="pyarrow"))
    new_labels = unioned.groupby("__cbucket").map_groups(
        lambda t: per_bucket(t.drop_columns(["__cbucket"])), batch_format="pyarrow"
    ).materialize()
    changed = new_labels.sum("changed") or 0
    return new_labels.drop_columns(["changed"]), changed


def connected_components(edges, a_col: str = "a", b_col: str = "b",
                         num_buckets: int = 32, max_iter: int = 25,
                         driver_threshold: int = 100_000):
    """Labels Dataset (v, l) with l = min node id of v's component. Only
    nodes appearing in ``edges`` are labeled (singletons are the caller's
    identity mapping).

    Hybrid plan: the edge list is materialized (it is bounded — e.g.
    capped LSH pair output, orders of magnitude smaller than the corpus);
    when it holds at most ``driver_threshold`` edges a driver-side
    union-find answers in one pass (the common near-dup case), otherwise
    the distributed pointer-doubling rounds run. Both paths emit the
    identical min-of-component labels."""

    def to_sym(batch: pa.Table) -> pa.Table:
        av = batch[a_col]
        bv = batch[b_col]
        if isinstance(av, pa.ChunkedArray):
            av = av.combine_chunks()
        if isinstance(bv, pa.ChunkedArray):
            bv = bv.combine_chunks()
        t = pa.table({"v": pa.concat_arrays([av, bv]).cast(pa.int64()),
                      "u": pa.concat_arrays([bv, av]).cast(pa.int64())})
        return _bucketed(t, "v", num_buckets)

    und = edges.map_batches(to_sym, batch_format="pyarrow").materialize()

    if und.count() <= 2 * driver_threshold:  # und holds both directions
        return _driver_union_find(und)

    def init_bucket(t: pa.Table) -> pa.Table:
        # free first propagation: neighbors are already co-located here, so
        # the initial label is min(v, neighbors) rather than v
        v = t["v"]
        u = t["u"]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        pairs = pa.table({"v": pa.concat_arrays([v, v]),
                          "l": pa.concat_arrays([v, u])})
        return _min_per_key(pairs, "v", "l", None)

    labels = und.groupby("__cbucket").map_groups(
        lambda t: init_bucket(t.drop_columns(["__cbucket"])),
        batch_format="pyarrow").materialize()

    for _ in range(max_iter):
        prop = _prop_round(und, labels, num_buckets).materialize()
        labels, changed = _shortcut_round(prop, num_buckets)
        if changed == 0:
            break
    return labels


def _driver_union_find(und):
    """Small-graph fast path: collect the (bounded) symmetric edge list and
    union-find on the driver; same min-canonical labels as the distributed
    rounds, returned as a 1-block Dataset."""
    import ray

    tbls = [t for t in ray.get(und.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return ray.data.from_arrow(pa.table({
            "v": pa.array([], type=pa.int64()),
            "l": pa.array([], type=pa.int64()),
        }))
    all_t = pa.concat_tables([t.select(["v", "u"]) for t in tbls])
    a = all_t["v"].combine_chunks().to_numpy(zero_copy_only=False)
    b = all_t["u"].combine_chunks().to_numpy(zero_copy_only=False)
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    nodes = np.unique(a)
    labels = np.fromiter((find(int(n)) for n in nodes), dtype=np.int64,
                         count=len(nodes))
    return ray.data.from_arrow(pa.table({
        "v": pa.array(nodes.astype(np.int64)), "l": pa.array(labels),
    }))


def pagerank_tokens(ds, tokens_col: str = "tokens", iters: int = 10,
                    key_mult: int = 2048, scale: int = 10**12, k: int = 25,
                    damping: tuple = (85, 100)):
    """INTEGER PageRank over the token-transition graph (nodes = tokens,
    directed edge weights = adjacent-pair counts).

    Every quantity is int64 and every step uses explicit floor division,
    so the iteration is bit-identical under any partitioning — the same
    determinism contract as connected_components. Per iteration one
    map-only pass over the distributed edge table emits per-block INFLOW
    partials (node-indexed int vectors, exact order-free sums); ranks are
    a vocab-sized broadcast. Update:
    ``r' = (15·(scale//V) + 85·(inflow + dangling//V)) // 100`` with edge
    contribution ``(r_a//W_a)·c + ((r_a%W_a)·c)//W_a`` (needs
    W_a·c < 2^63; at larger corpora pre-scale counts).

    Returns a pyarrow.Table of the top-k tokens by final rank
    (tok, rank, rn). Reference lineage: iterative fix-point structure of
    connected components (this file); pair counting via stages/pmi."""
    import ray

    from pymhealth_ray.stages.pmi import skipgram_pair_counts

    num, den = damping
    edges = skipgram_pair_counts(ds, tokens_col, window=1,
                                 key_mult=key_mult).materialize()

    # out-weight per node + observed node set (either endpoint)
    W = np.zeros(key_mult, dtype=np.int64)
    seen = np.zeros(key_mult, dtype=bool)
    for b in edges.iter_batches(batch_format="pyarrow"):
        key = b["key"].to_numpy(zero_copy_only=False)
        c = b["c"].to_numpy(zero_copy_only=False)
        a, t = key // key_mult, key % key_mult
        W += np.bincount(a, weights=c, minlength=key_mult).astype(np.int64)
        seen[a] = True
        seen[t] = True
    nodes = np.flatnonzero(seen)
    V = len(nodes)
    if V == 0:
        return pa.table({"tok": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "rn": pa.array([], pa.int64())})

    r = np.zeros(key_mult, dtype=np.int64)
    r[nodes] = scale // V
    base = (den - num) * (scale // V)

    for _ in range(iters):
        r_ref = ray.put(r)

        def inflow_partial(batch: pa.Table) -> pa.Table:
            rr = ray.get(r_ref)
            key = batch["key"].to_numpy(zero_copy_only=False)
            c = batch["c"].to_numpy(zero_copy_only=False)
            a, t = key // key_mult, key % key_mult
            ra, wa = rr[a], W[a]
            contrib = (ra // wa) * c + ((ra % wa) * c) // wa
            inflow = np.bincount(t, weights=contrib,
                                 minlength=key_mult).astype(np.int64)
            return pa.table({"inflow": pa.array([inflow.tolist()],
                                                type=pa.list_(pa.int64()))})

        total = np.zeros(key_mult, dtype=np.int64)
        for b in edges.map_batches(inflow_partial, batch_format="pyarrow",
                                   batch_size=None).iter_batches(
                                       batch_format="pyarrow"):
            flat = b["inflow"]
            if isinstance(flat, pa.ChunkedArray):
                flat = flat.combine_chunks()
            arr = flat.values.to_numpy(zero_copy_only=False).reshape(
                -1, key_mult)
            total += arr.sum(axis=0, dtype=np.int64)
        dangling = int(r[nodes][W[nodes] == 0].sum())
        new_r = np.zeros(key_mult, dtype=np.int64)
        new_r[nodes] = (base + num * (total[nodes] + dangling // V)) // den
        r = new_r

    order = np.lexsort((nodes, -r[nodes]))[:k]
    top_nodes = nodes[order]
    return pa.table({
        "tok": pa.array(top_nodes.astype(np.int64)),
        "rank": pa.array(r[top_nodes]),
        "rn": pa.array(np.arange(1, len(top_nodes) + 1, dtype=np.int64)),
    })


def coreness_peel_exact(a: np.ndarray, b: np.ndarray):
    """Single-process EXACT core decomposition (Batagelj-Zaveršnik
    bucket peel, O(m)) over a distinct undirected edge list — the
    oracle for :func:`coreness_hindex`. Returns (nodes, core) int64
    arrays sorted by node id."""
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    n = len(nodes)
    ai, bi = inv[: len(a)], inv[len(a):]
    deg = (np.bincount(ai, minlength=n)
           + np.bincount(bi, minlength=n)).astype(np.int64)
    src = np.concatenate([ai, bi])
    dst = np.concatenate([bi, ai])
    order = np.argsort(src, kind="stable")
    adj_to = dst[order]
    starts = np.concatenate(([0], np.cumsum(deg)))
    d = deg.copy()
    md = int(d.max()) if n else 0
    bin_ptr = np.concatenate(
        ([0], np.cumsum(np.bincount(d, minlength=md + 1))))[:md + 1]
    bin_ptr = bin_ptr.astype(np.int64)
    vert = np.argsort(d, kind="stable").astype(np.int64)
    pos = np.empty(n, dtype=np.int64)
    pos[vert] = np.arange(n)
    core = np.zeros(n, dtype=np.int64)
    for i in range(n):
        v = vert[i]
        core[v] = d[v]
        for u in adj_to[starts[v]:starts[v + 1]]:
            if d[u] > d[v]:
                du = d[u]
                pu = pos[u]
                pw = bin_ptr[du]
                w = vert[pw]
                if u != w:
                    vert[pu], vert[pw] = w, u
                    pos[u], pos[w] = pw, pu
                bin_ptr[du] += 1
                d[u] -= 1
    return nodes, core


def _hindex_bucket(tbl: pa.Table) -> pa.Table:
    """Per-node H-index finish: rows carry (node, nbr, cur) where curr
    rows have the node's own value in ``cur`` (and a harmless 0 in
    ``nbr``) and propagated rows have a neighbor value in ``nbr`` (and
    +inf in ``cur``)."""
    node = tbl["node"].to_numpy(zero_copy_only=False).astype(np.int64)
    nbr = tbl["nbr"].to_numpy(zero_copy_only=False).astype(np.int64)
    cur = tbl["cur"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((-nbr, node))
    no, nb, cu = node[order], nbr[order], cur[order]
    is_start = np.ones(len(no), dtype=bool)
    is_start[1:] = no[1:] != no[:-1]
    start_pos = np.flatnonzero(is_start)
    counts = np.diff(np.append(start_pos, len(no)))
    rank = np.arange(len(no), dtype=np.int64) - np.repeat(start_pos, counts)
    contrib = np.minimum(nb, rank + 1)
    h = np.maximum.reduceat(contrib, start_pos)
    curmin = np.minimum.reduceat(cu, start_pos)
    new = np.minimum(h, curmin)
    return pa.table({
        "v": pa.array(no[start_pos]),
        "l": pa.array(new),
        "changed": pa.array((new < curmin).astype(np.int64)),
    })


def coreness_hindex(edges, num_buckets: int = 32, max_rounds: int = 200):
    """Distributed CORE DECOMPOSITION: per-node k-core numbers by
    H-INDEX ITERATION (Lü et al. 2016, "The H-index of a network node
    and its relation to degree and coreness"): c0(v) = deg(v), then
    each round c(v) <- H-index of the multiset {c(u) : u ~ v}. The
    sequence is monotone nonincreasing and its fixpoint is exactly the
    coreness — no sequential peel, so the algorithm is a per-round
    pair of co-partitioned exchanges over narrow (node, value) rows
    (the CC/_prop_round shape): join values onto edges bucketed by
    source, re-bucket the propagated values by target, reduce with a
    vectorized H-index kernel. Convergence (no node changed) is summed
    from the already-materialized labels; rounds needed in practice ≈
    O(log n) on real graphs, bounded by ``max_rounds`` (raises on
    non-convergence rather than returning a wrong answer).

    ``edges``: Dataset with distinct int64 ``a`` < ``b`` rows. Returns
    a Dataset (node, core).
    """
    _BIGV = np.iinfo(np.int64).max

    def to_sym(batch: pa.Table) -> pa.Table:
        av = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        bv = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = np.concatenate([av, bv])
        u = np.concatenate([bv, av])
        t = pa.table({"v": pa.array(v), "u": pa.array(u)})
        return _bucketed(t, "v", num_buckets)

    und = edges.map_batches(to_sym, batch_format="pyarrow").materialize()

    def deg_bucket(tbl: pa.Table) -> pa.Table:
        v = tbl["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        vs, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(vs),
                         "l": pa.array(cnt.astype(np.int64))})

    labels = und.groupby("__cbucket").map_groups(
        lambda t: deg_bucket(t.drop_columns(["__cbucket"])),
        batch_format="pyarrow").materialize()

    def tag_edge(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "v": batch["v"], "u": batch["u"],
            "c": pa.nulls(n, type=pa.int64()),
            "__cbucket": batch["__cbucket"],
            "__side": pa.array(np.zeros(n, dtype=np.int8)),
        })

    def tag_label(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        t = pa.table({"v": batch["v"],
                      "u": pa.nulls(n, type=pa.int64()),
                      "c": batch["l"]})
        t = _bucketed(t, "v", num_buckets)
        return t.append_column("__side",
                               pa.array(np.ones(n, dtype=np.int8)))

    def per_bucket(tbl: pa.Table) -> pa.Table:
        side = tbl["__side"].to_numpy(zero_copy_only=False)
        e = tbl.filter(pa.array(side == 0)).select(["v", "u"])
        lb = tbl.filter(pa.array(side == 1)).select(["v", "c"])
        j = e.join(lb, keys=["v"], join_type="inner", use_threads=False)
        prop = pa.table({
            "node": j["u"], "nbr": j["c"],
            "cur": pa.array(np.full(j.num_rows, _BIGV, dtype=np.int64)),
        })
        curr = pa.table({
            "node": lb["v"],
            "nbr": pa.array(np.zeros(lb.num_rows, dtype=np.int64)),
            "cur": lb["c"],
        })
        out = pa.concat_tables([prop, curr])
        return _bucketed(out, "node", num_buckets).rename_columns(
            ["node", "nbr", "cur", "__nbucket"])

    for _ in range(max_rounds):
        unioned = und.map_batches(tag_edge, batch_format="pyarrow").union(
            labels.map_batches(tag_label, batch_format="pyarrow"))
        cand = unioned.groupby("__cbucket").map_groups(
            lambda t: per_bucket(t.drop_columns(["__cbucket"])),
            batch_format="pyarrow")
        new_labels = cand.groupby("__nbucket").map_groups(
            lambda t: _hindex_bucket(t.drop_columns(["__nbucket"])),
            batch_format="pyarrow").materialize()
        changed = new_labels.sum("changed") or 0
        labels = new_labels.drop_columns(["changed"])
        if changed == 0:
            return labels.map_batches(
                lambda b: pa.table({"node": b["v"], "core": b["l"]}),
                batch_format="pyarrow")
    raise RuntimeError(
        f"coreness_hindex did not converge in {max_rounds} rounds")


def coreness(edges, num_buckets: int = 32,
             driver_threshold: int = 2_000_000, max_rounds: int = 200):
    """Core decomposition with the hybrid plan CC uses: an edge list
    small enough to collect (narrow int64 pairs, bounded by
    ``driver_threshold``) takes the exact O(m) driver peel; larger
    graphs run the distributed H-index iteration. Both produce the
    identical exact coreness."""
    n_edges = edges.count()
    if n_edges <= driver_threshold:
        import ray as _ray

        def slim(b: pa.Table) -> pa.Table:
            # upstream grouped stages emit schema-less zero-row blocks
            if "a" not in b.column_names:
                return pa.table({"a": pa.array([], type=pa.int64()),
                                 "b": pa.array([], type=pa.int64())})
            return b.select(["a", "b"])

        tabs = [t for t in _ray.get(
            edges.map_batches(slim, batch_format="pyarrow")
            .to_arrow_refs()) if t.num_columns]  # empties pass the map
        tbl = pa.concat_tables(tabs) if tabs else pa.table(
            {"a": pa.array([], type=pa.int64()),
             "b": pa.array([], type=pa.int64())})
        nodes, core = coreness_peel_exact(
            tbl["a"].to_numpy(zero_copy_only=False),
            tbl["b"].to_numpy(zero_copy_only=False))
        import ray.data as _rd

        return _rd.from_arrow(pa.table({"node": pa.array(nodes),
                                        "core": pa.array(core)}))
    return coreness_hindex(edges, num_buckets=num_buckets,
                           max_rounds=max_rounds)


def label_propagation(edges, max_node: int, rounds: int = 4,
                      num_buckets: int = 32):
    """COMMUNITY DETECTION by synchronous label propagation (Raghavan
    et al. 2007) over a distinct undirected edge list (int64 columns
    ``a`` < ``b``): labels start as node ids; each round EVERY node
    simultaneously takes the most frequent label among its neighbors,
    ties broken toward the SMALLEST label. A fixed round count plus the
    lexical tie rule makes the result deterministic and bit-identical
    under any partitioning (plain async LPA is run-order dependent —
    useless under a distributed scheduler).

    Plan per round: the label table is bounded by the NODE DOMAIN (a
    dimension at 100 TB — parts, users — never the fact-row count), so
    it broadcasts via ray.put; each edge batch emits pre-shrunk
    (dst, neighbor-label) count partials (np.unique per batch) packed
    as dst·K + label; ONE exchange co-locates each dst's rows and a
    vectorized lexsort picks (max count, min label) per node. Packed
    keys require K² < 2**63 (checked, the assoc.py guard rule).

    Returns a Dataset (node, label) covering every node with ≥1 edge.
    """
    import ray as _ray

    from pymhealth_ray.stages.partition import grouped_by_bucket

    K = int(max_node) + 1
    if K * K >= 2 ** 63:
        raise ValueError(f"node domain {K} overflows packed int64 keys")

    labels = np.arange(K, dtype=np.int64)
    # each round re-consumes the edge list: materialize ONCE so the
    # upstream pair-explosion exchange doesn't re-execute per round
    edges = edges.materialize()
    final = None
    for _ in range(rounds):
        lab_ref = _ray.put(labels)

        def emit(b: pa.Table, _lr=lab_ref) -> pa.Table:
            lab = _ray.get(_lr)
            if b.num_rows == 0:
                return pa.table({"dst": pa.array([], type=pa.int64()),
                                 "pkey": pa.array([], type=pa.int64()),
                                 "cnt": pa.array([], type=pa.int64())})
            a = b["a"].to_numpy(zero_copy_only=False)
            e = b["b"].to_numpy(zero_copy_only=False)
            dst = np.concatenate([a, e])
            msg = np.concatenate([lab[e], lab[a]])
            pk = dst * K + msg
            u, c = np.unique(pk, return_counts=True)
            return pa.table({"dst": pa.array((u // K).astype(np.int64)),
                             "pkey": pa.array(u.astype(np.int64)),
                             "cnt": pa.array(c.astype(np.int64))})

        msgs = edges.map_batches(emit, batch_format="pyarrow",
                                 batch_size=None)

        def pick(tbl: pa.Table) -> pa.Table:
            if tbl.num_rows == 0:
                return pa.table({"node": pa.array([], type=pa.int64()),
                                 "label": pa.array([], type=pa.int64())})
            pk = tbl["pkey"].to_numpy(zero_copy_only=False)
            cnt = tbl["cnt"].to_numpy(zero_copy_only=False)
            # same (dst, label) may arrive from several batches: fold first
            upk, inv = np.unique(pk, return_inverse=True)
            tot = np.bincount(inv, weights=cnt.astype(np.float64),
                              minlength=upk.size).astype(np.int64)
            d, lb = upk // K, upk % K
            order = np.lexsort((lb, -tot, d))
            d, lb = d[order], lb[order]
            first = np.ones(len(d), dtype=bool)
            first[1:] = d[1:] != d[:-1]
            return pa.table({"node": pa.array(d[first]),
                             "label": pa.array(lb[first])})

        rows = grouped_by_bucket(msgs, pick, entity_col="dst",
                                 num_buckets=num_buckets).take_all()
        labels = labels.copy()
        nodes = np.array([r["node"] for r in rows], dtype=np.int64)
        labs = np.array([r["label"] for r in rows], dtype=np.int64)
        labels[nodes] = labs
        final = (nodes, labs)

    import ray.data as _rd

    nodes, labs = final if final is not None else (
        np.zeros(0, np.int64), np.zeros(0, np.int64))
    o = np.argsort(nodes)
    return _rd.from_arrow(pa.table({"node": pa.array(nodes[o]),
                                    "label": pa.array(labs[o])}))
