"""Item co-occurrence / association mining over a grouped event stream.

Market-basket-style counts: for every unordered pair of items (event
types, tags, tokens…) the number of groups (users, sessions, docs…)
containing BOTH, plus per-item group counts and the lift statistic —
``lift = n_groups·c_ab / (c_a·c_b)`` (>1 ⇒ the items co-occur more than
independence predicts). The pair space is O(distinct items²) — tiny —
while the input is the full event stream, so the plan keeps everything
per-group until the last, minuscule aggregation:

  1. one bucket exchange on the group key (each group wholly in one
     bucket — the repo-wide partitioning invariant);
  2. per bucket: distinct (group, item) via one np.unique over combined
     codes, pairs in lexicographic item order, Counter-combined into
     (item_a, item_b, count) partials — O(distinct pairs) rows out;
  3. the partials (plus per-item and group-count partials, tagged) are
     a few hundred rows: final summation happens driver-side and the
     result re-enters Ray as a Dataset.

Lift's division is the only float op: int64·int64 / int64·int64 in one
IEEE divide — bit-exact against any SQL engine.

Reference lineage: generalizes the reference's per-subject type-count
aggregations (`/root/reference/src/mhealth/location/distribution.py`
cluster_totals) to cross-item statistics; SURVEY §2.10 surface.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pymhealth_ray.stages.partition import grouped_by_bucket


def item_pair_counts(ds, group_col: str, item_col: str,
                     num_buckets: int = 32):
    """Dataset of (item_a, item_b, c_ab, c_a, c_b, n_groups, lift), one
    row per unordered item pair (item_a < item_b lexicographically) that
    co-occurs in at least one group."""
    import ray

    def per_bucket(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({
                "kind": pa.array([], type=pa.string()),
                "ta": pa.array([], type=pa.string()),
                "tb": pa.array([], type=pa.string()),
                "c": pa.array([], type=pa.int64()),
            })
        grp = tbl[group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        itm = tbl[item_col]
        if isinstance(itm, pa.ChunkedArray):
            itm = itm.combine_chunks()
        genc = grp.dictionary_encode()
        ienc = itm.dictionary_encode()
        gcodes = genc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        icodes = ienc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        items = ienc.dictionary.to_pylist()
        # lexicographic rank per dictionary code
        lex_order = np.argsort(np.array(items, dtype=object))
        lex_rank = np.empty(len(items), dtype=np.int64)
        lex_rank[lex_order] = np.arange(len(items))
        k = max(len(items), 1)
        uniq = np.unique(gcodes * k + lex_rank[icodes])
        ug, ui = uniq // k, uniq % k
        lex_items = [items[j] for j in lex_order]

        pair_c: Counter = Counter()
        item_c = np.bincount(ui, minlength=k).astype(np.int64)
        starts = np.concatenate(
            ([0], np.flatnonzero(ug[1:] != ug[:-1]) + 1, [len(ug)]))
        for s, e in zip(starts[:-1], starts[1:]):
            ranks = ui[s:e]  # ascending within a group by construction
            for x in range(len(ranks)):
                for y in range(x + 1, len(ranks)):
                    pair_c[(ranks[x], ranks[y])] += 1

        ta = [lex_items[a] for a, _ in pair_c] + lex_items + [""]
        tb = [lex_items[b] for _, b in pair_c] + [""] * k + [""]
        kind = ["p"] * len(pair_c) + ["i"] * k + ["n"]
        c = list(pair_c.values()) + item_c.tolist() + [len(starts) - 1]
        return pa.table({
            "kind": pa.array(kind, type=pa.string()),
            "ta": pa.array(ta, type=pa.string()),
            "tb": pa.array(tb, type=pa.string()),
            "c": pa.array(c, type=pa.int64()),
        })

    partials = grouped_by_bucket(ds, per_bucket, entity_col=group_col,
                                 num_buckets=num_buckets).take_all()
    pair_c: Counter = Counter()
    item_c: Counter = Counter()
    n_groups = 0
    for r in partials:
        if r["kind"] == "p":
            pair_c[(r["ta"], r["tb"])] += r["c"]
        elif r["kind"] == "i":
            item_c[r["ta"]] += r["c"]
        else:
            n_groups += r["c"]

    pairs = sorted(pair_c)
    ca = np.array([item_c[a] for a, _ in pairs], dtype=np.int64)
    cb = np.array([item_c[b] for _, b in pairs], dtype=np.int64)
    cab = np.array([pair_c[p] for p in pairs], dtype=np.int64)
    lift = (n_groups * cab).astype(np.float64) / (ca * cb)
    return ray.data.from_arrow(pa.table({
        "ta": pa.array([a for a, _ in pairs], type=pa.string()),
        "tb": pa.array([b for _, b in pairs], type=pa.string()),
        "cab": pa.array(cab),
        "ca": pa.array(ca),
        "cb": pa.array(cb),
        "n_groups": pa.array(np.full(len(pairs), n_groups, dtype=np.int64)),
        "lift": pa.array(lift),
    }))


def item_pair_topk(ds, group_col: str, item_col: str, k: int = 20,
                   min_count: int = 2, num_buckets: int = 64,
                   out_a: str = "item_a", out_b: str = "item_b",
                   count_name: str = "c"):
    """HIGH-CARDINALITY market-basket pair mining: top-k unordered item
    pairs (item_a < item_b) by the number of distinct groups containing
    both. Unlike :func:`item_pair_counts` (driver merge, O(items²)
    domains), every step here is distributed, for item domains of any
    size — only per-GROUP item counts must stay bounded (baskets: order
    line counts; the pair explosion is Σ m_g·(m_g−1)/2).

    Plan: one bucket exchange on the group key → per-bucket distinct
    (group, item) + fully vectorized within-group pair explosion packed
    into one int64 key (a·2³² + b; requires items < 2³¹) → exact counts
    via ``keyed_sum`` (no row sort) → threshold filter → distributed
    top-k via ``grouped_topk`` partial pruning. Deterministic total order:
    (count DESC, item_a, item_b).

    Both columns must be non-negative integers. Returns
    (out_a, out_b, count_name), at most k rows.
    """
    from pymhealth_ray.stages.aggregate import grouped_topk, keyed_sum
    from pymhealth_ray.stages.partition import grouped_by_bucket

    SHIFT = np.int64(1) << np.int64(32)

    def per_bucket(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"key": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        g = tbl[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        it = tbl[item_col]
        if isinstance(it, pa.ChunkedArray):
            it = it.combine_chunks()
        gv = g.to_numpy(zero_copy_only=False).astype(np.int64)
        iv = it.to_numpy(zero_copy_only=False).astype(np.int64)
        if len(iv) and (iv.min() < 0 or iv.max() >= (1 << 31)):
            raise ValueError("item codes must be in [0, 2^31)")
        # distinct (group, item), sorted by (group, item): group codes keep
        # items packable even when group ids exceed 2^31
        _, ginv = np.unique(gv, return_inverse=True)
        du = np.unique(ginv.astype(np.int64) * SHIFT + iv)
        dg, di = du >> np.int64(32), du & np.int64(0xFFFFFFFF)
        seg_start = np.ones(len(dg), dtype=bool)
        seg_start[1:] = dg[1:] != dg[:-1]
        starts = np.flatnonzero(seg_start)
        m = np.diff(np.append(starts, len(dg)))
        within = np.arange(len(dg), dtype=np.int64) - np.repeat(starts, m)
        nfirst = (np.repeat(m, m) - 1) - within  # pairs led by this row
        P = int(nfirst.sum())
        if P == 0:
            return pa.table({"key": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        a_flat = np.repeat(np.arange(len(dg), dtype=np.int64), nfirst)
        offs = np.concatenate(([0], np.cumsum(nfirst)))[:-1]
        b_flat = a_flat + (np.arange(P, dtype=np.int64)
                           - np.repeat(offs, nfirst)) + 1
        keys = di[a_flat] * SHIFT + di[b_flat]  # a < b within a segment
        vals, cnts = np.unique(keys, return_counts=True)
        return pa.table({"key": pa.array(vals),
                         "c": pa.array(cnts.astype(np.int64))})

    partials = grouped_by_bucket(ds, per_bucket, entity_col=group_col,
                                 num_buckets=num_buckets)
    # pair keys rarely repeat across groups -> the big-coalesce
    # pre-combine can't shrink them and only serializes (see keyed_sum)
    counts = keyed_sum(partials, "key", ["c"], num_buckets=num_buckets,
                       precombine_rows=None)

    def unpack(batch: pa.Table) -> pa.Table:
        kv = batch["key"].to_numpy(zero_copy_only=False)
        c = batch["c"].to_numpy(zero_copy_only=False)
        keep = c >= min_count
        kv, c = kv[keep], c[keep]
        return pa.table({
            out_a: pa.array(kv >> np.int64(32)),
            out_b: pa.array(kv & np.int64(0xFFFFFFFF)),
            count_name: pa.array(c),
            "__one": pa.array(np.zeros(len(kv), dtype=np.int8)),
        })

    filtered = counts.map_batches(unpack, batch_format="pyarrow",
                                  batch_size=None)
    top = grouped_topk(filtered, ["__one"], count_name, k,
                       descending=True, tie_cols=[out_a, out_b],
                       num_buckets=1)
    return top.map_batches(lambda b: b.drop_columns(["__one"]),
                           batch_format="pyarrow")


def frequent_triples(ds, group_col: str, item_col: str, max_item: int,
                     min_support: int, num_buckets: int = 32):
    """A-PRIORI frequent 3-itemsets: unordered item triples contained in
    at least ``min_support`` groups. The classic mining plan, kept exact
    and cluster-resident end to end:

      1. one bucket exchange on the group key → distinct (group, item)
         → vectorized pair explosion (triangles.segment_pairs), keeping
         the group id on every pair row;
      2. pair supports via ``keyed_sum`` on the packed pair key;
         pairs < min_support leave the game — the A-priori
         monotonicity step (support(triple) ≤ support(every sub-pair)),
         so no triple is lost;
      3. the group-pair rows semi-join the frequent key set
         (dropset.filter_by_keys — broadcast or bloom+exchange, exact
         either way), so the cubic explosion never happens: candidate
         triples are TRIANGLES of the per-group frequent-pair graph,
         enumerated per (group, min-item) segment, and the closing
         (b, c) pair is checked by one more semi-join;
      4. exact support per packed triple key (a·K² + b·K + c, K =
         max_item+1 — callers must keep K³ < 2⁶³) via ``keyed_sum``,
         filtered to ``min_support``.

    Output: (item_a, item_b, item_c, support), item_a < item_b < item_c.
    """
    from pymhealth_ray.stages.aggregate import keyed_sum
    from pymhealth_ray.stages.dropset import filter_by_keys
    from pymhealth_ray.stages.triangles import group_pair_rows, segment_pairs

    K = int(max_item) + 1
    if K ** 3 >= 2 ** 63:  # python ints — checked before any int64 math
        raise ValueError(
            f"frequent_triples: K={K} overflows int64 triple packing "
            f"(K³ ≥ 2⁶³); re-id items to a dense domain first")

    def group_pairs(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"g": pa.array([], type=pa.int64()),
                          "pkey": pa.array([], type=pa.int64())})
        if tbl.num_rows == 0:
            return empty
        gdict, ugf, pkey = group_pair_rows(tbl, group_col, item_col, K)
        if not len(pkey):
            return empty
        return pa.table({"g": gdict.take(pa.array(ugf)).cast(pa.int64()),
                         "pkey": pa.array(pkey)})

    gp = grouped_by_bucket(ds, group_pairs, entity_col=group_col,
                           num_buckets=num_buckets).materialize()

    counts = keyed_sum(gp.map_batches(
        lambda b: pa.table({"pkey": b["pkey"],
                            "one": pa.array(np.ones(b.num_rows,
                                                    dtype=np.int64))}),
        batch_format="pyarrow"), "pkey", ["one"],
        num_buckets=num_buckets, precombine_rows=None)
    fp = counts.map_batches(
        lambda b: b.filter(pc.greater_equal(b["one"], min_support))
                   .select(["pkey"]),
        batch_format="pyarrow").materialize()  # consumed by BOTH semi-joins

    ge = filter_by_keys(gp, "pkey", fp, keep=True,
                        num_buckets=num_buckets)

    def wedges(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"wkey": pa.array([], type=pa.int64()),
                          "tkey": pa.array([], type=pa.int64())})
        if tbl.num_rows == 0:
            return empty
        g = tbl["g"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = tbl["pkey"].to_numpy(zero_copy_only=False)
        a, b = pk // K, pk % K
        order = np.lexsort((b, a, g))
        g, a, b = g[order], a[order], b[order]
        new = np.ones(len(g), dtype=bool)
        new[1:] = (g[1:] != g[:-1]) | (a[1:] != a[:-1])
        seg = np.concatenate((np.flatnonzero(new), [len(g)]))
        fi, se = segment_pairs(np.diff(seg))
        if not len(fi):
            return empty
        # b's ascend within a (group, a) segment → u < v
        u, v = b[fi], b[se]
        return pa.table({"wkey": pa.array(u * K + v),
                         "tkey": pa.array(a[fi] * K * K + u * K + v)})

    wd = grouped_by_bucket(ge, wedges, entity_col="g",
                           num_buckets=num_buckets)
    closed = filter_by_keys(wd, "wkey", fp, keys_col="pkey", keep=True,
                            num_buckets=num_buckets)

    sup = keyed_sum(closed.map_batches(
        lambda b: pa.table({"tkey": b["tkey"],
                            "one": pa.array(np.ones(b.num_rows,
                                                    dtype=np.int64))}),
        batch_format="pyarrow"), "tkey", ["one"],
        num_buckets=num_buckets, precombine_rows=None)

    def unpack(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater_equal(b["one"], min_support))
        tk = b["tkey"].to_numpy(zero_copy_only=False)
        return pa.table({"item_a": pa.array(tk // (K * K)),
                         "item_b": pa.array((tk // K) % K),
                         "item_c": pa.array(tk % K),
                         "support": b["one"].cast(pa.int64())})

    return sup.map_batches(unpack, batch_format="pyarrow")


def association_rules(ds, group_col: str, item_col: str,
                      min_support: int = 3, max_rules: int = 100_000,
                      num_buckets: int = 64,
                      out_ant: str = "antecedent",
                      out_cons: str = "consequent"):
    """Directional association rules over baskets: for every unordered
    item pair contained in ≥ ``min_support`` groups, TWO rows
    (antecedent → consequent, both directions) with
    ``support`` (= c_ab), ``c_ant``, ``c_cons``,
    ``confidence = c_ab / c_ant`` and
    ``lift = n_groups·c_ab / (c_ant·c_cons)`` — each one int-exact until
    a single IEEE divide, so SQL mirrors them bit for bit.

    Plan: ONE bucket exchange on the group key (groups whole per bucket)
    emitting tagged int64-keyed partials in disjoint key domains —
    pair keys ``2⁶² + a·2³¹ + b``, item keys ``[0, 2³¹)``, and a −1 key
    carrying the bucket's exact distinct-group count (exact because
    groups never split across buckets) — one ``keyed_sum`` rollup, a
    support filter (items keep the same filter: an item in a frequent
    pair has count ≥ any pair's support, so nothing needed is lost),
    and a driver finish bounded by ``max_rules`` (raises above it).
    Items must be ints in [0, 2³¹)."""
    import ray

    from pymhealth_ray.stages.aggregate import keyed_sum
    from pymhealth_ray.stages.partition import grouped_by_bucket

    SHIFT = np.int64(1) << np.int64(31)
    PAIR_BASE = np.int64(1) << np.int64(62)

    def per_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"key": pa.array([], type=pa.int64()),
                          "c": pa.array([], type=pa.int64())})
        if tbl.num_rows == 0:
            return empty
        g = tbl[group_col].to_numpy(zero_copy_only=False).astype(np.int64)
        iv = tbl[item_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(iv) and (iv.min() < 0 or iv.max() >= (1 << 31)):
            raise ValueError("item codes must be in [0, 2^31)")
        _, ginv = np.unique(g, return_inverse=True)
        n_groups = int(ginv.max()) + 1 if len(ginv) else 0
        # distinct (group, item) packed as ginv·2³² + item (item < 2³¹)
        du = np.unique(ginv.astype(np.int64) * (SHIFT * 2) + iv)
        dg, di = du >> np.int64(32), du & np.int64(0xFFFFFFFF)
        seg_start = np.ones(len(dg), dtype=bool)
        seg_start[1:] = dg[1:] != dg[:-1]
        starts = np.flatnonzero(seg_start)
        m = np.diff(np.append(starts, len(dg)))
        from pymhealth_ray.stages.triangles import segment_pairs
        fi, se = segment_pairs(m)
        pair_keys = PAIR_BASE + di[fi] * SHIFT + di[se]
        item_vals, item_cnts = np.unique(di, return_counts=True)
        keys = np.concatenate((pair_keys, item_vals,
                               np.array([-1], dtype=np.int64)))
        cs = np.concatenate((np.ones(len(pair_keys), dtype=np.int64),
                             item_cnts.astype(np.int64),
                             np.array([n_groups], dtype=np.int64)))
        uk, inv = np.unique(keys, return_inverse=True)
        uc = np.bincount(inv, weights=cs.astype(np.float64)).astype(np.int64)
        return pa.table({"key": pa.array(uk), "c": pa.array(uc)})

    partials = grouped_by_bucket(ds.select_columns([group_col, item_col]),
                                 per_bucket, entity_col=group_col,
                                 num_buckets=num_buckets)
    counts = keyed_sum(partials, "key", ["c"], num_buckets=num_buckets,
                       precombine_rows=None)

    def keep(b: pa.Table) -> pa.Table:
        kv = b["key"].to_numpy(zero_copy_only=False)
        c = b["c"].to_numpy(zero_copy_only=False)
        m = (kv == -1) | (c >= min_support)
        return pa.table({"key": pa.array(kv[m]), "c": pa.array(c[m])})

    filtered = counts.map_batches(keep, batch_format="pyarrow") \
        .materialize()  # counted BEFORE the driver collect — the guard
    n_keep = filtered.count()  # must fire without materializing rows
    if n_keep > max_rules:    # driver-side (session code review)
        raise ValueError(
            f"association_rules: {n_keep} surviving partial rows "
            f"exceed max_rules={max_rules}; raise min_support")
    rows = filtered.take_all()
    n_groups = 0
    item_c: dict = {}
    pairs = []
    for r in rows:
        k, c = int(r["key"]), int(r["c"])
        if k == -1:
            n_groups += c
        elif k >= int(PAIR_BASE):
            rem = k - int(PAIR_BASE)
            pairs.append((rem >> 31, rem & ((1 << 31) - 1), c))
        else:
            item_c[k] = c
    ant, cons, sup = [], [], []
    for a, b, c in sorted(pairs):
        ant += [a, b]
        cons += [b, a]
        sup += [c, c]
    ant_a = np.array(ant, dtype=np.int64)
    cons_a = np.array(cons, dtype=np.int64)
    sup_a = np.array(sup, dtype=np.int64)
    ca = np.array([item_c[a] for a in ant], dtype=np.int64)
    cb = np.array([item_c[b] for b in cons], dtype=np.int64)
    conf = sup_a.astype(np.float64) / ca.astype(np.float64)
    lift = (n_groups * sup_a).astype(np.float64) \
        / (ca * cb).astype(np.float64)
    return ray.data.from_arrow(pa.table({
        out_ant: pa.array(ant_a), out_cons: pa.array(cons_a),
        "support": pa.array(sup_a), "c_ant": pa.array(ca),
        "c_cons": pa.array(cb), "confidence": pa.array(conf),
        "lift": pa.array(lift)}))
