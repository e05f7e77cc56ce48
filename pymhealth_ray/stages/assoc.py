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
