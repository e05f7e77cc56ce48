"""Driver-facing queries and their DuckDB oracle SQL.

Every entry in QUERIES is a pipeline over the driver's parquet tables (or the
deterministic sequences fixture); ORACLE_SQL holds the ANSI-SQL equivalent
DuckDB runs on the same inputs. Column names, types and rounding are kept
IDENTICAL on both sides (the driver hash-compares values after sorting
columns by name):

- exact-decimal data (2-dec values/prices) is summed in integer cents on
  both sides → hash-exact integers;
- integer-derived means are emitted as raw doubles (identical int/int
  division on both sides → bit-equal);
- genuinely float aggregates (entropy, stds over floats) are rounded to 6
  decimals with DuckDB's half-away-from-zero convention on both sides.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from pymhealth_ray.sources.generate import ensure_fixture
from pymhealth_ray.sources.io import read_table
from pymhealth_ray.stages.asof import asof_join
from pymhealth_ray.stages.aggregate import grouped_stats
from pymhealth_ray.stages.dedup import exact_dedup, minhash_lsh_dupes, simhash_signatures
from pymhealth_ray.stages.lag import lag_features
from pymhealth_ray.stages.rolling import rolling_count_windows
from pymhealth_ray.stages.rowfeatures import token_features
from pymhealth_ray.stages.session import session_stats
from pymhealth_ray.stages.text import language_id, quality_scores, token_counts
from pymhealth_ray.stages.window import window_features
from pymhealth_ray.stages import ann

HOUR_US = 3_600_000_000

# The correctness gate overlaps queries in threads (tools/
# check_correctness.py GATE_WORKERS): /tmp caches SHARED between queries
# (sorted layouts, the IVF index, the ranked-minhash fixture) must be
# built once under a per-path lock, not raced by two cold threads.
import threading as _threading

_PATH_LOCKS: dict = {}
_PATH_LOCKS_GUARD = _threading.Lock()


def _build_lock(path: str):
    with _PATH_LOCKS_GUARD:
        return _PATH_LOCKS.setdefault(path, _threading.Lock())
MIN5_US = 300_000_000
GAP_US = 1_800_000_000
HOUR_NS = 3_600_000_000_000
GAP_NS = 1_800_000_000_000

NB = 32  # bucket count for sf-scale correctness runs


def _round_away(x: np.ndarray, d: int) -> np.ndarray:
    """DuckDB ROUND convention: half away from zero."""
    m = 10.0**d
    return np.sign(x) * np.floor(np.abs(x) * m + 0.5) / m


def _round_cols(tbl: pa.Table, spec: dict) -> pa.Table:
    for col, d in spec.items():
        i = tbl.column_names.index(col)
        arr = tbl[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        v = arr.to_numpy(zero_copy_only=False).astype(np.float64)
        mask = np.isnan(v)
        r = _round_away(np.where(mask, 0.0, v), d)
        out = pa.array(np.where(mask, np.nan, r))
        if arr.null_count:
            out = pc.if_else(arr.is_valid(), out, pa.nulls(len(v), type=pa.float64()))
        tbl = tbl.set_column(i, col, out)
    return tbl


def _cast_cols(tbl: pa.Table, spec: dict) -> pa.Table:
    for col, typ in spec.items():
        i = tbl.column_names.index(col)
        tbl = tbl.set_column(i, col, tbl[col].cast(typ))
    return tbl


def _events(sf_dir: str, columns):
    ds = read_table(f"{sf_dir}/events.parquet", columns=columns)

    def add_us(b: pa.Table) -> pa.Table:
        return b.append_column("ts_us", b["ts"].cast(pa.int64())).drop_columns(["ts"])

    return ds.map_batches(add_us, batch_format="pyarrow")


def _epoch_days(col) -> np.ndarray:
    """Epoch-day int64 from a timestamp[us] OR date32 column (date32 can't
    cast to int64 directly — the documented ArrowNotImplementedError)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_timestamp(col.type):
        return col.cast(pa.int64()).to_numpy(zero_copy_only=False) \
            // 86_400_000_000
    return col.cast(pa.date32()).cast(pa.int32()) \
        .to_numpy(zero_copy_only=False).astype(np.int64)


def _cents(b: pa.Table, col: str, out: str, scale: int = 100) -> pa.Table:
    arr = b[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    v = arr.to_numpy(zero_copy_only=False).astype(np.float64)
    return b.append_column(out, pa.array(np.rint(v * scale).astype(np.int64)))


# --------------------------------------------------------------------------
# events queries
# --------------------------------------------------------------------------


def q_events_window_1h(sf_dir: str):
    ds = _events(sf_dir, ["user_id", "ts", "value"])
    wf = window_features(
        ds,
        HOUR_US,
        HOUR_US,
        aggs={
            "value_sum": ("value", "sum"),
            "value_mean": ("value", "mean"),
            "value_min": ("value", "min"),
            "value_max": ("value", "max"),
        },
        entity_col="user_id",
        ts_col="ts_us",
        emit_empty=False,
        num_buckets=NB,
    )

    def finish(b: pa.Table) -> pa.Table:
        b = b.rename_columns(
            ["user_id", "window_start_us", "n_events", "value_sum", "value_mean", "value_min", "value_max"]
        )
        b = _round_cols(b, {"value_sum": 2, "value_mean": 6, "value_min": 2, "value_max": 2})
        return b

    return wf.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_WINDOW_1H = f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
b AS (SELECT user_id, min(ts_us) AS f, max(ts_us) AS l FROM e GROUP BY user_id),
w AS (SELECT e.user_id, f + ((e.ts_us - f) // {HOUR_US}) * {HOUR_US} AS window_start_us, e.value
      FROM e JOIN b USING (user_id)
      WHERE (e.ts_us - f) // {HOUR_US} < (l - f + {HOUR_US} - 1) // {HOUR_US})
SELECT user_id, window_start_us, count(*) AS n_events,
       round(sum(value), 2) AS value_sum, round(avg(value), 6) AS value_mean,
       round(min(value), 2) AS value_min, round(max(value), 2) AS value_max
FROM w GROUP BY user_id, window_start_us
"""


def q_events_sessions(sf_dir: str):
    ds = _events(sf_dir, ["user_id", "ts", "value"])
    st = session_stats(ds, GAP_US, value_col="value", entity_col="user_id", ts_col="ts_us", num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        b = b.rename_columns(
            ["user_id", "session_id", "n_events", "start_us", "end_us", "duration_us",
             "value_sum", "value_mean", "value_std"]
        )
        return _round_cols(b, {"value_sum": 2, "value_mean": 6, "value_std": 6})

    return st.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_SESSIONS = f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
s AS (SELECT user_id, ts_us, value,
             CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) > {GAP_US}
                  THEN 1 ELSE 0 END AS brk
      FROM e),
s2 AS (SELECT user_id, ts_us, value,
              CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
       FROM s)
SELECT user_id, session_id, count(*) AS n_events, min(ts_us) AS start_us, max(ts_us) AS end_us,
       max(ts_us) - min(ts_us) AS duration_us,
       round(sum(value), 2) AS value_sum, round(avg(value), 6) AS value_mean,
       round(stddev_pop(value), 6) AS value_std
FROM s2 GROUP BY user_id, session_id
"""


def q_events_asof_purchase(sf_dir: str):
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "event_type", "value"])

    def only_facts(b: pa.Table) -> pa.Table:
        b = b.filter(pc.not_equal(b["event_type"], "purchase"))
        return b.drop_columns(["event_type"])

    def only_dim(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["event_type"], "purchase"))
        return b.select(["user_id", "ts_us", "value"]).rename_columns(["user_id", "ts_us", "purchase_value"])

    facts = ds.map_batches(only_facts, batch_format="pyarrow")
    # dim (purchases) materialized: it is a small filtered subset, and the
    # as-of's schema probe + union would otherwise re-run its read twice
    dim = ds.map_batches(only_dim, batch_format="pyarrow").materialize()
    j = asof_join(facts, dim, ["purchase_value"], entity_col="user_id", ts_col="ts_us", num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(["event_id", "user_id", "ts_us", "value", "purchase_value_asof", "ts_us_asof"])
        b = b.rename_columns(["event_id", "user_id", "ts_us", "value", "purchase_value", "purchase_ts_us"])
        return _round_cols(b, {"value": 2, "purchase_value": 2})

    return j.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_ASOF_PURCHASE = """
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value FROM events),
f AS (SELECT event_id, user_id, ts_us, value FROM e WHERE event_type <> 'purchase'),
d AS (SELECT user_id, ts_us AS p_ts, value AS p_val FROM e WHERE event_type = 'purchase')
SELECT f.event_id, f.user_id, f.ts_us, round(f.value, 2) AS value,
       round(d.p_val, 2) AS purchase_value, d.p_ts AS purchase_ts_us
FROM f ASOF LEFT JOIN d ON f.user_id = d.user_id AND f.ts_us >= d.p_ts
"""


def q_events_lag_diff(sf_dir: str):
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])
    lf = lag_features(
        ds, ["value"], lags=(), diffs=["value"], entity_col="user_id", ts_col="ts_us",
        num_buckets=NB, tiebreak_col="event_id",
    )

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(["event_id", "user_id", "ts_us", "value_diff1", "row_idx"])
        return b.rename_columns(["event_id", "user_id", "ts_us", "value_diff1", "rn"])

    return lf.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_LAG_DIFF = """
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events)
SELECT event_id, user_id, ts_us,
       COALESCE(value - lag(value) OVER w, 0.0) AS value_diff1,
       row_number() OVER w - 1 AS rn
FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
"""


def q_events_rolling_mean(sf_dir: str):
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])
    rw = rolling_count_windows(
        ds, "value", wsize=10, wstep=5, entity_col="user_id", ts_col="ts_us",
        tiebreak_col="event_id", num_buckets=NB,
    )

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(["user_id", "window_idx", "value_mean"])
        return _round_cols(b, {"value_mean": 6})

    return rw.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_ROLLING_MEAN = """
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events),
r AS (SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) - 1 AS rn,
             count(*) OVER (PARTITION BY user_id) AS cnt,
             avg(value) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                              ROWS BETWEEN CURRENT ROW AND 9 FOLLOWING) AS wmean
      FROM e)
SELECT user_id, rn // 5 AS window_idx, round(wmean, 6) AS value_mean
FROM r WHERE rn % 5 = 0 AND rn + 10 <= cnt
"""


def q_events_sdann(sf_dir: str):
    ds = _events(sf_dir, ["user_id", "ts", "value"])
    wf = window_features(
        ds, MIN5_US, MIN5_US,
        aggs={"wmean": ("value", "mean"), "wstd": ("value", "std")},
        entity_col="user_id", ts_col="ts_us", emit_empty=False, num_buckets=NB,
    )

    def per_bucket(tbl: pa.Table) -> pa.Table:
        # two-pass std over the (few) window means per user, vectorized
        # across ALL users in the bucket (centered bincount sums —
        # numerically equivalent to DuckDB's Welford stddev_pop at 6
        # decimals; per-user map_groups would pay a Python call per user)
        order = pc.sort_indices(tbl, sort_keys=[("user_id", "ascending")])
        tbl = tbl.take(order)
        uid = tbl["user_id"]
        if isinstance(uid, pa.ChunkedArray):
            uid = uid.combine_chunks()
        codes = uid.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        m = tbl["wmean"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = tbl["wstd"].to_numpy(zero_copy_only=False).astype(np.float64)
        cnt = np.bincount(codes).astype(np.float64)
        mean_m = np.bincount(codes, weights=m) / cnt
        var = np.bincount(codes, weights=(m - mean_m[codes]) ** 2) / cnt
        sdnni = np.bincount(codes, weights=s) / cnt
        firsts = np.concatenate([[0], np.flatnonzero(codes[1:] != codes[:-1]) + 1]).astype(np.int64)
        return pa.table(
            {
                "user_id": uid.take(pa.array(firsts)),
                "sdann": pa.array(_round_away(np.sqrt(var), 6)),
                "sdnni": pa.array(_round_away(sdnni, 6)),
            }
        )

    from pymhealth_ray.stages.partition import grouped_by_bucket

    return grouped_by_bucket(wf, per_bucket, entity_col="user_id", num_buckets=NB)


SQL_EVENTS_SDANN = f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
b AS (SELECT user_id, min(ts_us) AS f, max(ts_us) AS l FROM e GROUP BY user_id),
w AS (SELECT e.user_id, (e.ts_us - f) // {MIN5_US} AS k, e.value
      FROM e JOIN b USING (user_id)
      WHERE (e.ts_us - f) // {MIN5_US} < (l - f + {MIN5_US} - 1) // {MIN5_US}),
m AS (SELECT user_id, k, avg(value) AS wmean, stddev_pop(value) AS wstd FROM w GROUP BY user_id, k)
SELECT user_id, round(stddev_pop(wmean), 6) AS sdann, round(avg(wstd), 6) AS sdnni
FROM m GROUP BY user_id
"""


def q_events_type_entropy(sf_dir: str):
    ds = read_table(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
    counts = grouped_stats(ds, ["user_id", "event_type"])

    def finish(tbl: pa.Table) -> pa.Table:
        # per-user entropy over type counts (reference entropy semantics,
        # generic/information.py:10-20; the 1e-30 smoothing is < 1e-26 here
        # and invisible at 6 decimals) — Arrow/numpy segment reduce, no
        # pandas conversion in the stage
        uids = tbl["user_id"].to_numpy(zero_copy_only=False)
        cnts = tbl["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        uniq, inv = np.unique(uids, return_inverse=True)
        tot = np.bincount(inv, weights=cnts)
        p = cnts / tot[inv]
        H = -np.bincount(inv, weights=p * np.log(p))
        return pa.table(
            {"user_id": pa.array(uniq), "type_entropy": pa.array(_round_away(H, 6))}
        )

    from pymhealth_ray.stages.partition import grouped_by_bucket

    # bucket-grouped (finish is vectorized across users), not per-user calls
    return grouped_by_bucket(counts, finish, entity_col="user_id", num_buckets=NB)


SQL_EVENTS_TYPE_ENTROPY = """
WITH c AS (SELECT user_id, event_type, count(*)::DOUBLE AS c FROM events GROUP BY 1, 2),
t AS (SELECT user_id, sum(c) AS n FROM c GROUP BY 1)
SELECT c.user_id, round(-sum((c.c / t.n) * ln(c.c / t.n)), 6) AS type_entropy
FROM c JOIN t USING (user_id) GROUP BY c.user_id
"""


# --------------------------------------------------------------------------
# lineitem / orders
# --------------------------------------------------------------------------


def q_lineitem_pricing(sf_dir: str):
    ds = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "l_quantity", "qty_c")
        b = _cents(b, "l_extendedprice", "price_c")
        price_c = b["price_c"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        disc_c = np.rint(disc * 100).astype(np.int64)
        b = b.append_column("disc_price_u", pa.array(price_c * (100 - disc_c)))
        return b.select(["l_returnflag", "l_linestatus", "qty_c", "price_c", "disc_price_u"])

    agg = grouped_stats(ds.map_batches(prep, batch_format="pyarrow"),
                        ["l_returnflag", "l_linestatus"],
                        sum_cols=["qty_c", "price_c", "disc_price_u"])

    def finish(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        qty = b["qty_c_sum"].to_numpy(zero_copy_only=False)
        price = b["price_c_sum"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "sum_qty_cents": b["qty_c_sum"].cast(pa.int64()),
                "sum_price_cents": b["price_c_sum"].cast(pa.int64()),
                "sum_disc_price_u": b["disc_price_u_sum"].cast(pa.int64()),
                "avg_qty": pa.array(qty / (100.0 * n)),
                "avg_price": pa.array(price / (100.0 * n)),
                "n": b["n"].cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_LINEITEM_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_price_u,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / (100 * count(*)) AS avg_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / (100 * count(*)) AS avg_price,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_orders_segment_join(sf_dir: str):
    """Broadcast join: the small customer table is put in the object store
    once; every task maps custkey → mktsegment locally (no shuffle join)."""
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    lookup_ref = ray.put(dict(zip(cust["c_custkey"].to_pylist(), cust["c_mktsegment"].to_pylist())))
    orders = read_table(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderstatus", "o_totalprice"])

    class Annotate:
        def __init__(self):
            self.lookup = ray.get(lookup_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            seg = [self.lookup.get(k) for k in b["o_custkey"].to_pylist()]
            b = b.append_column("c_mktsegment", pa.array(seg, type=pa.string()))
            b = _cents(b, "o_totalprice", "total_c")
            return b.select(["c_mktsegment", "o_orderstatus", "total_c"])

    annotated = orders.map_batches(Annotate, batch_format="pyarrow", concurrency=(1, 4))
    agg = grouped_stats(annotated, ["c_mktsegment", "o_orderstatus"], sum_cols=["total_c"], count_name="n_orders")

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": b["c_mktsegment"],
                "o_orderstatus": b["o_orderstatus"],
                "n_orders": b["n_orders"].cast(pa.int64()),
                "total_cents": b["total_c_sum"].cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_ORDERS_SEGMENT_JOIN = """
SELECT c_mktsegment, o_orderstatus, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment, o_orderstatus
"""


# --------------------------------------------------------------------------
# documents
# --------------------------------------------------------------------------


def q_docs_token_counts(sf_dir: str):
    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = token_counts(ds)
    return out.map_batches(
        lambda b: b.select(["doc_id", "n_ws_tokens", "n_bpe_tokens", "n_chars_utf8"]),
        batch_format="pyarrow",
    )


SQL_DOCS_TOKEN_COUNTS = r"""
SELECT doc_id, CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]')) AS BIGINT) AS n_bpe_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_utf8
FROM documents
"""


def q_docs_quality(sf_dir: str):
    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = quality_scores(ds)

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(["doc_id", "n_tokens", "mean_word_len", "stopword_ratio", "punct_ratio"])
        return _round_cols(b, {"mean_word_len": 6, "stopword_ratio": 6, "punct_ratio": 6})

    return out.map_batches(finish, batch_format="pyarrow")


_STOPWORD_SQL = ", ".join(
    f"'{w}'" for w in sorted(
        "the a an of and to in is are was for on with as by at it this that".split()
    )
)

SQL_DOCS_QUALITY = rf"""
WITH w AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w FROM documents),
a AS (SELECT doc_id, count(*) AS n_tokens, round(avg(length(w)), 6) AS mean_word_len,
             round(avg(CASE WHEN lower(w) IN ({_STOPWORD_SQL}) THEN 1.0 ELSE 0.0 END), 6) AS stopword_ratio
      FROM w GROUP BY doc_id)
SELECT a.doc_id, a.n_tokens, a.mean_word_len, a.stopword_ratio,
       round(CAST(len(regexp_extract_all(d.text, '[.,!?;:]')) AS DOUBLE) / length(d.text), 6) AS punct_ratio
FROM a JOIN documents d USING (doc_id)
"""


def q_docs_hashes(sf_dir: str):
    from pymhealth_ray.stages.text import content_hashes

    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return content_hashes(ds).map_batches(lambda b: b.select(["doc_id", "md5"]), batch_format="pyarrow")


SQL_DOCS_HASHES = "SELECT doc_id, md5(text) AS md5 FROM documents"


def q_docs_dedup_first8(sf_dir: str):
    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def add_fp(b: pa.Table) -> pa.Table:
        fp = [" ".join(t.split()[:8]) for t in b["text"].to_pylist()]
        return pa.table({"doc_id": b["doc_id"], "fp": pa.array(fp, type=pa.string())})

    dd = exact_dedup(ds.map_batches(add_fp, batch_format="pyarrow"), key_col="fp", id_col="doc_id")
    return dd.map_batches(
        lambda b: b.select(["key_md5", "doc_id", "n_dups"]).rename_columns(["fp_md5", "doc_id", "n_dups"]),
        batch_format="pyarrow",
    )


SQL_DOCS_DEDUP_FIRST8 = r"""
WITH f AS (SELECT doc_id, md5(array_to_string((regexp_extract_all(text, '\S+'))[1:8], ' ')) AS fp_md5
           FROM documents)
SELECT fp_md5, min(doc_id) AS doc_id, count(*) AS n_dups FROM f GROUP BY fp_md5
"""


def q_docs_langid(sf_dir: str):
    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return language_id(ds).map_batches(lambda b: b.select(["doc_id", "lang_pred"]), batch_format="pyarrow")


def q_docs_langid_confusion(sf_dir: str):
    """Language-ID EVALUATION: confusion matrix of predicted vs labeled
    language — (lang, lang_pred, n) counts via per-block partial
    value_counts merged driver-side (bounded by |langs|²·blocks). The
    model-eval query every classifier-gated pipeline runs before trusting
    the router."""
    ds = read_table(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text", "lang"])
    pred = language_id(ds)

    def pairs(b: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(b["lang"], b["lang_pred"], "\x00")
        vc = pc.value_counts(key)
        return pa.table({"k": vc.field("values"),
                         "c": vc.field("counts").cast(pa.int64())})

    counts: dict = {}
    for t in pred.map_batches(pairs, batch_format="pyarrow",
                              batch_size=None).iter_batches(
                                  batch_format="pyarrow"):
        for k, c in zip(t["k"].to_pylist(), t["c"].to_pylist()):
            counts[k] = counts.get(k, 0) + c
    ks = sorted(counts)
    return ray.data.from_arrow(pa.table({
        "lang": pa.array([k.split("\x00")[0] for k in ks]),
        "lang_pred": pa.array([k.split("\x00")[1] for k in ks]),
        "n": pa.array([counts[k] for k in ks], type=pa.int64()),
    }))


def _langid_confusion_expected(df):
    import pandas as pd

    pred = _langid_expected(df[["doc_id", "text"]])
    m = df[["doc_id", "lang"]].merge(pred, on="doc_id")
    g = m.groupby(["lang", "lang_pred"]).size().reset_index(name="n")
    g = g.sort_values(["lang", "lang_pred"]).reset_index(drop=True)
    return pd.DataFrame({"lang": g.lang, "lang_pred": g.lang_pred,
                         "n": g.n.astype(np.int64)})


def q_docs_simhash(sf_dir: str):
    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_signatures(ds).map_batches(lambda b: b.select(["doc_id", "simhash"]), batch_format="pyarrow")


def q_docs_minhash_pairs(sf_dir: str):
    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pairs = minhash_lsh_dupes(ds, jaccard_threshold=0.5)
    return pairs.map_batches(lambda b: _round_cols(b, {"est_jaccard": 4}), batch_format="pyarrow")


# --------------------------------------------------------------------------
# embeddings
# --------------------------------------------------------------------------


def q_embed_stats(sf_dir: str):
    ds = read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def fn(b: pa.Table) -> pa.Table:
        emb = b["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        off = emb.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = emb.values.to_numpy(zero_copy_only=False)[off[0]: off[-1]].astype(np.float64)
        off = off - off[0]
        dim = np.diff(off)
        cs = np.concatenate([[0.0], np.cumsum(flat)])
        cs2 = np.concatenate([[0.0], np.cumsum(flat * flat)])
        s1 = cs[off[1:]] - cs[off[:-1]]
        s2 = cs2[off[1:]] - cs2[off[:-1]]
        return pa.table(
            {
                "vec_id": b["vec_id"],
                "dim": pa.array(dim.astype(np.int64)),
                "l2_norm": pa.array(_round_away(np.sqrt(s2), 6)),
                "emb_mean": pa.array(_round_away(s1 / dim, 6)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_EMBED_STATS = """
SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
       round(sqrt(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x), 'sum')), 6) AS l2_norm,
       round(list_aggregate(CAST(embedding AS DOUBLE[]), 'mean'), 6) AS emb_mean
FROM embeddings
"""


def q_embed_knn(sf_dir: str):
    import pyarrow.parquet as pq

    ds = read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    full = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    queries = full.filter(pc.less(full["vec_id"], 10))
    topk = ann.knn_bruteforce(ds, queries, k=5)
    return _round_cols(topk, {"cosine": 4})


SQL_EMBED_KNN = """
WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id < 10),
n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
s AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
             list_cosine_similarity(q.e, n.e) AS sim,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY list_cosine_similarity(q.e, n.e) DESC, n.vec_id) AS rnk
      FROM q CROSS JOIN n WHERE q.vec_id <> n.vec_id)
SELECT query_id, neighbor_id, round(sim, 4) AS cosine FROM s WHERE rnk <= 5
"""


def q_embed_label_norms(sf_dir: str):
    ds = read_table(f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"])

    def fn(b: pa.Table) -> pa.Table:
        emb = b["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        off = emb.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = emb.values.to_numpy(zero_copy_only=False)[off[0]: off[-1]].astype(np.float64)
        off = off - off[0]
        cs2 = np.concatenate([[0.0], np.cumsum(flat * flat)])
        nrm = np.sqrt(cs2[off[1:]] - cs2[off[:-1]])
        return pa.table({"label": b["label"], "nrm": pa.array(nrm)})

    agg = grouped_stats(ds.map_batches(fn, batch_format="pyarrow"), ["label"], sum_cols=["nrm"])

    def finish(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = b["nrm_sum"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "label": b["label"],
                "n": b["n"].cast(pa.int64()),
                "avg_norm": pa.array(_round_away(s / n, 6)),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_EMBED_LABEL_NORMS = """
WITH t AS (SELECT label, sqrt(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x), 'sum')) AS nrm
           FROM embeddings)
SELECT label, count(*) AS n, round(avg(nrm), 6) AS avg_norm FROM t GROUP BY label
"""


# --------------------------------------------------------------------------
# sequences fixture (input_hint table)
# --------------------------------------------------------------------------


def _seq_ds(sf_dir: str, columns=None):
    path = ensure_fixture(sf_dir)
    return read_table(path, columns=columns), path


def q_seq_token_stats(sf_dir: str):
    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "n_tok", "tokens"])
    feat = token_features(
        ds,
        features=("mean", "sum", "min", "max", "zero_crossing_count", "line_length", "entropy"),
        drop_tokens=True,
    )

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(
            ["doc_id", "ts_ns", "n_tok", "tok_sum", "tok_min", "tok_max", "tok_mean",
             "tok_zero_crossing_count", "tok_line_length", "tok_entropy"]
        )
        b = _cast_cols(b, {"tok_sum": pa.int64(), "tok_min": pa.int64(), "tok_max": pa.int64(),
                           "tok_zero_crossing_count": pa.int64(), "tok_line_length": pa.int64(),
                           "n_tok": pa.int64()})
        b = b.rename_columns(
            ["doc_id", "ts_ns", "n_tok", "tok_sum", "tok_min", "tok_max", "tok_mean", "zcc", "line_length", "tok_entropy"]
        )
        return _round_cols(b, {"tok_entropy": 6})

    return feat.map_batches(finish, batch_format="pyarrow")


def sql_seq_token_stats(path: str) -> str:
    return f"""
WITH s AS (SELECT doc_id, ts_ns, n_tok, tokens FROM read_parquet('{path}/part-*.parquet')),
u AS (SELECT doc_id, ts_ns, unnest(tokens) AS v, generate_subscripts(tokens, 1) AS k FROM s),
a AS (SELECT doc_id, ts_ns, count(*) AS cnt, CAST(sum(v) AS BIGINT) AS tok_sum,
             CAST(min(v) AS BIGINT) AS tok_min, CAST(max(v) AS BIGINT) AS tok_max
      FROM u GROUP BY doc_id, ts_ns),
z AS (SELECT u.doc_id, u.ts_ns, u.k, (u.v > CAST(a.tok_sum AS DOUBLE) / a.cnt) AS pos, u.v
      FROM u JOIN a USING (doc_id, ts_ns)),
zc AS (SELECT doc_id, ts_ns, CAST(count(*) FILTER (WHERE pos <> prev_pos) AS BIGINT) AS zcc
       FROM (SELECT doc_id, ts_ns, pos, lag(pos) OVER (PARTITION BY doc_id, ts_ns ORDER BY k) AS prev_pos FROM z)
       GROUP BY doc_id, ts_ns),
ll AS (SELECT doc_id, ts_ns, CAST(sum(abs(v - prev_v)) AS BIGINT) AS line_length
       FROM (SELECT doc_id, ts_ns, v, lag(v) OVER (PARTITION BY doc_id, ts_ns ORDER BY k) AS prev_v FROM u)
       WHERE prev_v IS NOT NULL GROUP BY doc_id, ts_ns),
hh AS (SELECT doc_id, ts_ns, round(-sum(p * ln(p)), 6) AS tok_entropy FROM (
         SELECT c.doc_id, c.ts_ns, c.c::DOUBLE / a.cnt AS p
         FROM (SELECT doc_id, ts_ns, v, count(*) AS c FROM u GROUP BY doc_id, ts_ns, v) c
         JOIN a USING (doc_id, ts_ns))
       GROUP BY doc_id, ts_ns)
SELECT s.doc_id, s.ts_ns, CAST(s.n_tok AS BIGINT) AS n_tok, a.tok_sum, a.tok_min, a.tok_max,
       CAST(a.tok_sum AS DOUBLE) / a.cnt AS tok_mean, zc.zcc, ll.line_length, hh.tok_entropy
FROM s JOIN a USING (doc_id, ts_ns) JOIN zc USING (doc_id, ts_ns)
JOIN ll USING (doc_id, ts_ns) JOIN hh USING (doc_id, ts_ns)
"""


def q_seq_tokens_md5(sf_dir: str):
    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "tokens"])

    def fn(b: pa.Table) -> pa.Table:
        from pymhealth_ray.stages.dedup import tokens_join_key

        key = tokens_join_key(b["tokens"])
        digests = [hashlib.md5(s).hexdigest()
                   for s in key.cast(pa.binary()).to_pylist()]
        return pa.table({"doc_id": b["doc_id"], "ts_ns": b["ts_ns"], "tok_md5": pa.array(digests, type=pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow")


def sql_seq_tokens_md5(path: str) -> str:
    return f"""
SELECT doc_id, ts_ns, md5(array_to_string(tokens, ',')) AS tok_md5
FROM read_parquet('{path}/part-*.parquet')
"""


def q_seq_sessions(sf_dir: str):
    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "n_tok"])
    st = session_stats(ds, GAP_NS, value_col="n_tok", num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(["doc_id", "session_id", "n_events", "start_ns", "end_ns", "duration_ns", "n_tok_sum", "n_tok_mean"])
        return _cast_cols(b, {"n_tok_sum": pa.int64()})

    return st.map_batches(finish, batch_format="pyarrow")


def sql_seq_sessions(path: str) -> str:
    return f"""
WITH e AS (SELECT doc_id, ts_ns, n_tok FROM read_parquet('{path}/part-*.parquet')),
s AS (SELECT doc_id, ts_ns, n_tok,
             CASE WHEN ts_ns - lag(ts_ns) OVER (PARTITION BY doc_id ORDER BY ts_ns) > {GAP_NS}
                  THEN 1 ELSE 0 END AS brk FROM e),
s2 AS (SELECT doc_id, ts_ns, n_tok,
              CAST(sum(brk) OVER (PARTITION BY doc_id ORDER BY ts_ns ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
       FROM s)
SELECT doc_id, session_id, count(*) AS n_events, min(ts_ns) AS start_ns, max(ts_ns) AS end_ns,
       max(ts_ns) - min(ts_ns) AS duration_ns,
       CAST(sum(n_tok) AS BIGINT) AS n_tok_sum,
       CAST(sum(n_tok) AS DOUBLE) / count(*) AS n_tok_mean
FROM s2 GROUP BY doc_id, session_id
"""


def q_seq_streaming_sessions(sf_dir: str):
    """The north-star execution shape taken literally: sessionize by
    STREAMING each partition of a sorted entity-bucketed layout through
    ParquetFile.iter_batches with ONE open-session carry across Arrow
    batch boundaries (stages/streaming.py) — bounded memory per task, no
    exchange at query time; the one sort happened at ingest
    (state/lineage.resumable_write(sort_cols=...), cached layout). Same
    SQL oracle as the sort-based seq_sessions — identical semantics,
    different physical plan."""
    from pymhealth_ray.stages.streaming import streaming_session_stats

    ds, path = _seq_ds(sf_dir, ["doc_id", "ts_ns", "n_tok"])
    layout = _sorted_layout(sf_dir, ds)
    out = streaming_session_stats(layout, gap=GAP_NS)

    def finish(b: pa.Table) -> pa.Table:
        return b.select(["doc_id", "session_id", "n_events", "start_ns",
                         "end_ns", "duration_ns", "n_tok_sum",
                         "n_tok_mean"])

    return out.map_batches(finish, batch_format="pyarrow")


def _sorted_layout(sf_dir: str, ds, *, suffix: str = "", filter_fn=None,
                   num_buckets: int = 16, entity_col: str = "doc_id",
                   sort_cols: list | None = None):
    """Cached SORTED entity-bucketed layout for the streaming scans."""
    import os as _os

    from pymhealth_ray.state.lineage import resumable_write

    sort_cols = sort_cols or ["doc_id", "ts_ns"]
    name = _os.path.basename(_os.path.normpath(sf_dir))
    layout = f"/tmp/pymhealth_ray_sorted_layout/{name}{suffix}_v1"
    # completion MARKER, not a manifest count: a filtered layout may leave
    # buckets legitimately empty (no manifest), and the count ignores
    # params — both would force a rebuild on every call
    marker = _os.path.join(layout, "_LAYOUT_OK")
    if not _os.path.exists(marker):
        with _build_lock(layout):
            if not _os.path.exists(marker):
                src = ds if filter_fn is None else ds.map_batches(
                    filter_fn, batch_format="pyarrow")
                resumable_write(src, layout, entity_col=entity_col,
                                num_buckets=num_buckets,
                                params={"sorted": sort_cols,
                                        "suffix": suffix, "v": 1},
                                sort_cols=sort_cols)
                with open(marker + ".tmp", "w") as f:
                    f.write("ok")
                _os.replace(marker + ".tmp", marker)
    return layout


def q_seq_streaming_lag(sf_dir: str):
    """Per-row lag/delta/successive-diff by STREAMING the sorted layout
    (stages/streaming.streaming_lag_features — one-row carry across
    Arrow batch boundaries, no exchange at query time). Same semantics
    as the sort-based stages/lag.py; SQL window oracle."""
    from pymhealth_ray.stages.streaming import streaming_lag_features

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "n_tok"])
    layout = _sorted_layout(sf_dir, ds)
    return streaming_lag_features(layout)


def sql_seq_streaming_lag(path: str) -> str:
    return f"""
SELECT doc_id, ts_ns, CAST(n_tok AS BIGINT) AS n_tok,
  CAST(lag(n_tok) OVER w AS BIGINT) AS lag1,
  ts_ns - lag(ts_ns) OVER w AS dt,
  CAST(coalesce(n_tok - lag(n_tok) OVER w, 0) AS BIGINT) AS diff1
FROM read_parquet('{path}/part-*.parquet')
WINDOW w AS (PARTITION BY doc_id ORDER BY ts_ns)
"""


ASOF_STREAM_T = 56


def q_seq_asof_stream(sf_dir: str):
    """STREAMING sorted-merge as-of join (stages/streaming.py — the
    north-star phrase taken literally): left = every row, right = the
    high-token rows (n_tok ≥ 56), both as sorted co-bucketed layouts;
    each task streams ONE partition pair with a merge cursor and a
    trimmed right buffer — zero query-time exchange, bounded memory.
    Inclusive backward semantics; SQL oracle = IGNORE NULLS running
    last_value window."""
    from pymhealth_ray.stages.streaming import streaming_asof_join

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "n_tok"])
    left = _sorted_layout(sf_dir, ds)

    def big_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b["n_tok"], ASOF_STREAM_T))

    right = _sorted_layout(sf_dir, ds, suffix="_big", filter_fn=big_only)
    return streaming_asof_join(left, right, out_ts="asof_ts",
                               out_val="asof_n_tok")


def sql_seq_asof_stream(path: str) -> str:
    return f"""
SELECT doc_id, ts_ns,
  CAST(max(CASE WHEN n_tok >= {ASOF_STREAM_T} THEN ts_ns END)
       OVER w AS BIGINT) AS asof_ts,
  CAST(last_value(CASE WHEN n_tok >= {ASOF_STREAM_T} THEN n_tok END
                  IGNORE NULLS) OVER w AS BIGINT) AS asof_n_tok
FROM read_parquet('{path}/part-*.parquet')
WINDOW w AS (PARTITION BY doc_id ORDER BY ts_ns ROWS UNBOUNDED PRECEDING)
"""


def q_seq_windows_1h(sf_dir: str):
    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "n_tok"])
    wf = window_features(
        ds, HOUR_NS, HOUR_NS,
        aggs={"ntok_sum": ("n_tok", "sum"), "ntok_mean": ("n_tok", "mean")},
        emit_empty=False, num_buckets=NB,
    )

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(["doc_id", "window_start_ns", "n_in_window", "ntok_sum", "ntok_mean"])
        b = b.rename_columns(["doc_id", "window_start_ns", "n_events", "ntok_sum", "ntok_mean"])
        return _cast_cols(b, {"ntok_sum": pa.int64()})

    return wf.map_batches(finish, batch_format="pyarrow")


def sql_seq_windows_1h(path: str) -> str:
    return f"""
WITH e AS (SELECT doc_id, ts_ns, n_tok FROM read_parquet('{path}/part-*.parquet')),
b AS (SELECT doc_id, min(ts_ns) AS f, max(ts_ns) AS l FROM e GROUP BY doc_id),
w AS (SELECT e.doc_id, f + ((e.ts_ns - f) // {HOUR_NS}) * {HOUR_NS} AS window_start_ns, e.n_tok
      FROM e JOIN b USING (doc_id)
      WHERE (e.ts_ns - f) // {HOUR_NS} < (l - f + {HOUR_NS} - 1) // {HOUR_NS})
SELECT doc_id, window_start_ns, count(*) AS n_events,
       CAST(sum(n_tok) AS BIGINT) AS ntok_sum, CAST(sum(n_tok) AS DOUBLE) / count(*) AS ntok_mean
FROM w GROUP BY doc_id, window_start_ns
"""


def q_seq_asof_sessions(sf_dir: str):
    """Backward as-of of the last CLOSED session summary onto every row.
    Publication time is ``end + gap`` — the earliest instant the session
    boundary is knowable — so the feature is stable under truncation of
    future rows (zero temporal leakage)."""
    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "n_tok"])
    st = session_stats(ds, GAP_NS, value_col="n_tok", num_buckets=NB)

    def mk_dim(b: pa.Table) -> pa.Table:
        pub = pc.add(b["end_ns"], GAP_NS)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "ts_ns": pub.cast(pa.int64()),
                "sess_mean": b["n_tok_mean"],
                "sess_end": b["end_ns"],
            }
        )

    # materialize the (small) session-summary dim: asof_join's schema probe
    # plus the union would otherwise execute the session_stats exchange twice
    dim = st.map_batches(mk_dim, batch_format="pyarrow").materialize()
    j = asof_join(ds, dim, ["sess_mean", "sess_end"], num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(["doc_id", "ts_ns", "n_tok", "sess_mean_asof", "sess_end_asof"])
        b = b.rename_columns(["doc_id", "ts_ns", "n_tok", "sess_ref_mean", "sess_ref_end_ns"])
        return _cast_cols(b, {"n_tok": pa.int64()})

    return j.map_batches(finish, batch_format="pyarrow")


def sql_seq_asof_sessions(path: str) -> str:
    return f"""
WITH e AS (SELECT doc_id, ts_ns, n_tok FROM read_parquet('{path}/part-*.parquet')),
s AS (SELECT doc_id, ts_ns, n_tok,
             CASE WHEN ts_ns - lag(ts_ns) OVER (PARTITION BY doc_id ORDER BY ts_ns) > {GAP_NS}
                  THEN 1 ELSE 0 END AS brk FROM e),
s2 AS (SELECT doc_id, ts_ns, n_tok,
              sum(brk) OVER (PARTITION BY doc_id ORDER BY ts_ns ROWS UNBOUNDED PRECEDING) AS session_id
       FROM s),
d AS (SELECT doc_id, max(ts_ns) + {GAP_NS} AS pub_ns, max(ts_ns) AS end_ns,
             CAST(sum(n_tok) AS DOUBLE) / count(*) AS sess_mean
      FROM s2 GROUP BY doc_id, session_id)
SELECT e.doc_id, e.ts_ns, CAST(e.n_tok AS BIGINT) AS n_tok,
       d.sess_mean AS sess_ref_mean, d.end_ns AS sess_ref_end_ns
FROM e ASOF LEFT JOIN d ON e.doc_id = d.doc_id AND e.ts_ns >= d.pub_ns
"""


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------


def build_queries() -> dict:
    from pymhealth_ray.tuning import tune_data_context

    tune_data_context()
    return {
        "events_window_1h": q_events_window_1h,
        "events_sessions": q_events_sessions,
        "events_asof_purchase": q_events_asof_purchase,
        "events_lag_diff": q_events_lag_diff,
        "events_rolling_mean": q_events_rolling_mean,
        "events_sdann": q_events_sdann,
        "events_type_entropy": q_events_type_entropy,
        "lineitem_pricing": q_lineitem_pricing,
        "orders_segment_join": q_orders_segment_join,
        "docs_token_counts": q_docs_token_counts,
        "docs_quality": q_docs_quality,
        "docs_hashes": q_docs_hashes,
        "docs_dedup_first8": q_docs_dedup_first8,
        "docs_langid": q_docs_langid,
        "docs_langid_confusion": q_docs_langid_confusion,
        "docs_simhash": q_docs_simhash,
        "docs_minhash_pairs": q_docs_minhash_pairs,
        "embed_stats": q_embed_stats,
        "embed_knn": q_embed_knn,
        "embed_label_norms": q_embed_label_norms,
        "seq_token_stats": q_seq_token_stats,
        "seq_tokens_md5": q_seq_tokens_md5,
        "seq_sessions": q_seq_sessions,
        "seq_windows_1h": q_seq_windows_1h,
        "seq_asof_sessions": q_seq_asof_sessions,
        "seq_moments": q_seq_moments,
        "seq_hjorth": q_seq_hjorth,
        "seq_rolling_mean": q_seq_rolling_mean,
        "seq_spectral": q_seq_spectral,
        "seq_rpeaks": q_seq_rpeaks,
        "events_night_stats": q_events_night_stats,
        "seq_window_median": q_seq_window_median,
        "seq_distinct_sources": q_seq_distinct_sources,
        "seq_nonlinear": q_seq_nonlinear,
        "embed_inertial": q_embed_inertial,
        "events_sliding_window": q_events_sliding_window,
        "seq_windows_combined": q_seq_windows_combined,
        "seq_sessions_salted": q_seq_sessions_salted,
        "orders_lineitem_join": q_orders_lineitem_join,
        "seq_asof_salted": q_seq_asof_salted,
        "orders_customer_join_salted": q_orders_customer_join_salted,
        "embed_knn_ivf": q_embed_knn_ivf,
        "events_geo_clusters": q_events_geo_clusters,
        "embed_dupes": q_embed_dupes,
        "region_revenue": q_region_revenue,
        "part_brand_pricing": q_part_brand_pricing,
        "supplier_nation_balance": q_supplier_nation_balance,
        "events_orders_range_join": q_events_orders_range_join,
        "docs_topk_chars": q_docs_topk_chars,
        "seq_quantiles": q_seq_quantiles,
        "docs_approx_distinct": q_docs_approx_distinct,
        "docs_split_sample": q_docs_split_sample,
        "docs_top_tokens": q_docs_top_tokens,
        "seq_pack": q_seq_pack,
        "docs_dedup_clusters": q_docs_dedup_clusters,
        "docs_sample_per_lang": q_docs_sample_per_lang,
        "orders_bloom_semi": q_orders_bloom_semi,
        "docs_decontam": q_docs_decontam,
        "lineitem_profile": q_lineitem_profile,
        "docs_prep_pipeline": q_docs_prep_pipeline,
        "docs_prep_bloom": q_docs_prep_bloom,
        "docs_simhash_dupes": q_docs_simhash_dupes,
        "docs_redact": q_docs_redact,
        "seq_weighted_sample": q_seq_weighted_sample,
        "lineitem_cms_counts": q_lineitem_cms_counts,
        "docs_media_decode": q_docs_media_decode,
        "docs_shuffle_order": q_docs_shuffle_order,
        "docs_gopher_quality": q_docs_gopher_quality,
        "seq_top_bigrams": q_seq_top_bigrams,
        "seq_chunks": q_seq_chunks,
        "docs_tfidf": q_docs_tfidf,
        "docs_tokenize": q_docs_tokenize,
        "seq_dedup_tokens": q_seq_dedup_tokens,
        "seq_length_buckets": q_seq_length_buckets,
        "events_hampel": q_events_hampel,
        "docs_line_dedup": q_docs_line_dedup,
        "events_user_sequences": q_events_user_sequences,
        "docs_inverted_index": q_docs_inverted_index,
        "orders_priority_encode": q_orders_priority_encode,
        "lineitem_quantity_rank": q_lineitem_quantity_rank,
        "docs_lm_nll": q_docs_lm_nll,
        "docs_dsir_weights": q_docs_dsir_weights,
        "docs_gopher_rules": q_docs_gopher_rules,
        "docs_cross_dupes": q_docs_cross_dupes,
        "docs_dup_rate_by_source": q_docs_dup_rate_by_source,
        "docs_lsh_incremental": q_docs_lsh_incremental,
        "docs_k_anonymize": q_docs_k_anonymize,
        "docs_keyword_tags": q_docs_keyword_tags,
        "docs_shingle_diversity": q_docs_shingle_diversity,
        "docs_cluster_size_hist": q_docs_cluster_size_hist,
        "docs_quality_deciles": q_docs_quality_deciles,
        "docs_sorted_neighborhood": q_docs_sorted_neighborhood,
        "events_type_pairs": q_events_type_pairs,
        "docs_bm25": q_docs_bm25,
        "docs_jsonl_roundtrip": q_docs_jsonl_roundtrip,
        "seq_ewma": q_seq_ewma,
        "seq_pmi": q_seq_pmi,
        "seq_cumulative": q_seq_cumulative,
        "seq_mixture": q_seq_mixture,
        "seq_resample": q_seq_resample,
        "seq_rolling_corr": q_seq_rolling_corr,
        "seq_drift": q_seq_drift,
        "orders_anti_returned": q_orders_anti_returned,
        "embed_kmeans": q_embed_kmeans,
        "embed_semdedup": q_embed_semdedup,
        "embed_pca": q_embed_pca,
        "embed_diversity": q_embed_diversity,
        "seq_heavy_hitters": q_seq_heavy_hitters,
        "seq_zscore": q_seq_zscore,
        "seq_bigram_nll": q_seq_bigram_nll,
        "seq_ewma_td": q_seq_ewma_td,
        "seq_qbucket": q_seq_qbucket,
        "docs_csv_roundtrip": q_docs_csv_roundtrip,
        "docs_partitioned_sink": q_docs_partitioned_sink,
        "seq_feature_matrix": q_seq_feature_matrix,
        "seq_mad_outliers": q_seq_mad_outliers,
        "seq_approx_quantiles": q_seq_approx_quantiles,
        "seq_pagerank": q_seq_pagerank,
        "seq_asof_fresh": q_seq_asof_fresh,
        "seq_rolling_z": q_seq_rolling_z,
        "seq_temporal_pack": q_seq_temporal_pack,
        "seq_pmi_neighbors": q_seq_pmi_neighbors,
        "docs_dedup_keep_best": q_docs_dedup_keep_best,
        "seq_repeated_spans": q_seq_repeated_spans,
        "events_temporal_pack": q_events_temporal_pack,
        "events_resample": q_events_resample,
        "seq_winsorize": q_seq_winsorize,
        "seq_span_novelty": q_seq_span_novelty,
        "events_ewma_td": q_events_ewma_td,
        "seq_percent_rank": q_seq_percent_rank,
        "events_compact": q_events_compact,
        "seq_mode_by_source": q_seq_mode_by_source,
        "events_gap_stats": q_events_gap_stats,
        "events_hour_profile": q_events_hour_profile,
        "seq_source_transitions": q_seq_source_transitions,
        "seq_trend": q_seq_trend,
        "seq_autocorr": q_seq_autocorr,
        "events_dominant_type": q_events_dominant_type,
        "events_funnel": q_events_funnel,
        "seq_oov_rate": q_seq_oov_rate,
        "lineitem_constraints": q_lineitem_constraints,
        "events_resample_interp": q_events_resample_interp,
        "seq_bpe_merges": q_seq_bpe_merges,
        "seq_bpe_apply": q_seq_bpe_apply,
        "events_target_loo": q_events_target_loo,
        "lineitem_rollup": q_lineitem_rollup,
        "events_type_pivot": q_events_type_pivot,
        "events_nearest_poi": q_events_nearest_poi,
        "events_value_hist": q_events_value_hist,
        "lineitem_corr": q_lineitem_corr,
        "events_funnel_summary": q_events_funnel_summary,
        "lineitem_cube": q_lineitem_cube,
        "lineitem_moments": q_lineitem_moments,
        "lineitem_star_revenue": q_lineitem_star_revenue,
        "orders_basket_pairs": q_orders_basket_pairs,
        "events_ntile": q_events_ntile,
        "events_attribution": q_events_attribution,
        "events_journey": q_events_journey,
        "seq_token_spectrum": q_seq_token_spectrum,
        "seq_distinct_ngrams": q_seq_distinct_ngrams,
        "seq_repetition": q_seq_repetition,
        "seq_epoch_shuffle": q_seq_epoch_shuffle,
        "seq_streaming_sessions": q_seq_streaming_sessions,
        "seq_asof_stream": q_seq_asof_stream,
        "seq_streaming_lag": q_seq_streaming_lag,
        "events_cusum": q_events_cusum,
        "events_pushdown_scan": q_events_pushdown_scan,
        "events_stickiness": q_events_stickiness,
        "docs_temperature_sample": q_docs_temperature_sample,
        "docs_jaccard_dupes": q_docs_jaccard_dupes,
        "docs_eval_containment": q_docs_eval_containment,
        "events_upsert_latest": q_events_upsert_latest,
        "events_winsorized": q_events_winsorized,
        "events_value_share": q_events_value_share,
        "events_session_type_pairs": q_events_session_type_pairs,
        "orders_repeat_gap": q_orders_repeat_gap,
        "seq_streaming_latest": q_seq_streaming_latest,
        "docs_fuzzy_pairs": q_docs_fuzzy_pairs,
        "events_type_transitions": q_events_type_transitions,
        "docs_jw_pairs": q_docs_jw_pairs,
        "docs_er_clusters": q_docs_er_clusters,
        "docs_lsh_calibration": q_docs_lsh_calibration,
        "events_value_runs": q_events_value_runs,
        "events_zorder_box": q_events_zorder_box,
        "events_incremental_daily": q_events_incremental_daily,
        "events_session_enriched": q_events_session_enriched,
        "seq_vocab_growth": q_seq_vocab_growth,
        "docs_ledger_ingest": q_docs_ledger_ingest,
        "seq_concat_examples": q_seq_concat_examples,
        "events_retention": q_events_retention,
        "part_revenue_pareto": q_part_revenue_pareto,
        "events_zonemap_range": q_events_zonemap_range,
        "events_bloom_point": q_events_bloom_point,
        "events_upsert_merge": q_events_upsert_merge,
        "events_time_travel": q_events_time_travel,
        "events_change_feed": q_events_change_feed,
        "part_kcore": q_part_kcore,
        "seq_scrub_tokens": q_seq_scrub_tokens,
        "docs_audio_vad": q_docs_audio_vad,
        "lineitem_weighted_median": q_lineitem_weighted_median,
        "docs_search_and": q_docs_search_and,
        "events_psi_drift": q_events_psi_drift,
        "events_range_join_stream": q_events_range_join_stream,
        "embed_ivf_recall": q_embed_ivf_recall,
        "embed_quantized_recall": q_embed_quantized_recall,
        "events_hourly_distinct": q_events_hourly_distinct,
        "supplier_part_degree": q_supplier_part_degree,
        "seq_trigram_nll": q_seq_trigram_nll,
        "seq_minhash_dupes": q_seq_minhash_dupes,
        "seq_vocab_coverage": q_seq_vocab_coverage,
        "orders_daily_ma": q_orders_daily_ma,
        "events_props_extract": q_events_props_extract,
        "events_sliding_distinct": q_events_sliding_distinct,
        "docs_audio_real": q_docs_audio_real,
        "docs_image_real": q_docs_image_real,
        "docs_video_frames": q_docs_video_frames,
        "seq_prep_pipeline": q_seq_prep_pipeline,
        "events_value_rank": q_events_value_rank,
        "events_concurrency": q_events_concurrency,
        "events_snapshot_diff": q_events_snapshot_diff,
        "part_skyline": q_part_skyline,
        "item_triangles": q_item_triangles,
        "events_scd2": q_events_scd2,
        "item_triples": q_item_triples,
        "events_cuped": q_events_cuped,
        "embed_rrf": q_embed_rrf,
        "seq_streaming_rolling": q_seq_streaming_rolling,
        "events_hourly_trend": q_events_hourly_trend,
        "docs_cluster_split": q_docs_cluster_split,
        "events_labeled_examples": q_events_labeled_examples,
        "orders_smb_join": q_orders_smb_join,
        "embed_rerank": q_embed_rerank,
        "events_daily_top_types": q_events_daily_top_types,
        "docs_phash_dupes": q_docs_phash_dupes,
        "item_similarity_topk": q_item_similarity_topk,
        "lineitem_join_estimate": q_lineitem_join_estimate,
        "seq_prefix_dupes": q_seq_prefix_dupes,
        "events_burstiness": q_events_burstiness,
        "events_interval_union": q_events_interval_union,
        "events_late_data": q_events_late_data,
        "docs_token_chi2": q_docs_token_chi2,
        "events_rfm_segments": q_events_rfm_segments,
        "events_scd2_pit": q_events_scd2_pit,
        "lineitem_hll_overlap": q_lineitem_hll_overlap,
        "embed_drift": q_embed_drift,
        "events_twa": q_events_twa,
        "events_ohlc": q_events_ohlc,
        "orders_fifo_alloc": q_orders_fifo_alloc,
        "seq_downsample_tokens": q_seq_downsample_tokens,
        "events_ab_welch": q_events_ab_welch,
        "embed_mutual_nn": q_embed_mutual_nn,
        "seq_lcs_pairs": q_seq_lcs_pairs,
        "events_holt": q_events_holt,
        "orders_cohort_ltv": q_orders_cohort_ltv,
        "events_audience_overlap": q_events_audience_overlap,
        "events_streaming_candles": q_events_streaming_candles,
        "events_mahalanobis": q_events_mahalanobis,
        "orders_dup_invoices": q_orders_dup_invoices,
        "lineitem_benford": q_lineitem_benford,
        "seq_token_burstiness": q_seq_token_burstiness,
        "seq_good_turing": q_seq_good_turing,
        "part_revenue_gini": q_part_revenue_gini,
        "events_bursts_kleinberg": q_events_bursts_kleinberg,
        "lineitem_supplier_hhi": q_lineitem_supplier_hhi,
        "seq_span_corruption": q_seq_span_corruption,
        "seq_fim_layout": q_seq_fim_layout,
        "events_changepoint": q_events_changepoint,
        "events_diff_in_diff": q_events_diff_in_diff,
        "part_price_relatives": q_part_price_relatives,
        "part_price_index": q_part_price_index,
        "embed_pq_recall": q_embed_pq_recall,
        "events_order_violations": q_events_order_violations,
        "docs_compress_ratio": q_docs_compress_ratio,
        "part_skyline3": q_part_skyline3,
        "seq_dup_rate_estimate": q_seq_dup_rate_estimate,
        "seq_shard_balance": q_seq_shard_balance,
        "events_anomaly_panel": q_events_anomaly_panel,
        "seq_winnow_fingerprints": q_seq_winnow_fingerprints,
        "embed_hard_negatives": q_embed_hard_negatives,
        "seq_source_similarity": q_seq_source_similarity,
        "events_transition_dwell": q_events_transition_dwell,
        "events_auc": q_events_auc,
        "events_kmv_distinct": q_events_kmv_distinct,
        "events_theil_sen": q_events_theil_sen,
        "orders_assoc_rules": q_orders_assoc_rules,
        "events_kaplan_meier": q_events_kaplan_meier,
        "embed_mmr": q_embed_mmr,
        "events_calibration": q_events_calibration,
        "events_ks_drift": q_events_ks_drift,
        "events_dow_index": q_events_dow_index,
        "events_isotonic": q_events_isotonic,
        "docs_image_patches": q_docs_image_patches,
        "events_stl_decompose": q_events_stl_decompose,
        "events_tukey_outliers": q_events_tukey_outliers,
        "docs_l_diversity": q_docs_l_diversity,
        "events_kendall_tau": q_events_kendall_tau,
        "events_trimmed_mean": q_events_trimmed_mean,
        "embed_knn_classify": q_embed_knn_classify,
        "events_garman_klass": q_events_garman_klass,
        "part_price_elasticity": q_part_price_elasticity,
        "events_markov_accuracy": q_events_markov_accuracy,
        "embed_retrieval_ndcg": q_embed_retrieval_ndcg,
        "events_lead_lag": q_events_lead_lag,
        "docs_ipc_roundtrip": q_docs_ipc_roundtrip,
        "seq_coverage_select": q_seq_coverage_select,
        "seq_mlm_mask": q_seq_mlm_mask,
        "docs_lsh_pr": q_docs_lsh_pr,
        "events_local_peaks": q_events_local_peaks,
        "orders_interarrival": q_orders_interarrival,
        "lineitem_return_ci": q_lineitem_return_ci,
        "docs_readability": q_docs_readability,
        "events_mttr": q_events_mttr,
        "events_funnel_latency": q_events_funnel_latency,
        "events_linear_attribution": q_events_linear_attribution,
        "embed_ood": q_embed_ood,
        "seq_haar_energy": q_seq_haar_energy,
        "seq_rouge_pairs": q_seq_rouge_pairs,
        "orders_ship_latency": q_orders_ship_latency,
        "orders_seasonal_naive": q_orders_seasonal_naive,
        "customer_segment_chi2": q_customer_segment_chi2,
        "embed_linear_probe": q_embed_linear_probe,
        "events_dedup_window": q_events_dedup_window,
        "events_streaming_dedup": q_events_streaming_dedup,
        "events_gini_split": q_events_gini_split,
        "events_ips_eval": q_events_ips_eval,
        "part_lpa_communities": q_part_lpa_communities,
        "events_markov_attribution": q_events_markov_attribution,
        "seq_kn_bigram": q_seq_kn_bigram,
        "seq_watermark_score": q_seq_watermark_score,
        "orders_woe_iv": q_orders_woe_iv,
        "docs_ncd_pairs": q_docs_ncd_pairs,
        "events_next_purchase": q_events_next_purchase,
        "docs_orc_roundtrip": q_docs_orc_roundtrip,
        "seq_dp_token_counts": q_seq_dp_token_counts,
        "part_croston": q_part_croston,
        "orders_total_reconcile": q_orders_total_reconcile,
        "events_ratio_delta": q_events_ratio_delta,
        "events_ab_power": q_events_ab_power,
        "docs_audio_logmel": q_docs_audio_logmel,
        "events_user_neighbors": q_events_user_neighbors,
        "docs_chunk_overlap": q_docs_chunk_overlap,
        "part_xyz_class": q_part_xyz_class,
        "events_hour_dow_heatmap": q_events_hour_dow_heatmap,
        "embed_mrr": q_embed_mrr,
        "seq_greedy_bigram_accuracy": q_seq_greedy_bigram_accuracy,
        "lineitem_fk_orphans": q_lineitem_fk_orphans,
        "orders_band_migration": q_orders_band_migration,
        "events_streaming_funnel": q_events_streaming_funnel,
        "part_pmi_svd_neighbors": q_part_pmi_svd_neighbors,
        "customer_t_closeness": q_customer_t_closeness,
        "seq_curriculum_order": q_seq_curriculum_order,
        "orders_budget_apportion": q_orders_budget_apportion,
        "events_kpi_decomposition": q_events_kpi_decomposition,
        "embed_split_mmd": q_embed_split_mmd,
        "embed_ivf_sweep": q_embed_ivf_sweep,
        "part_reorder_point": q_part_reorder_point,
        "docs_image_norm_stats": q_docs_image_norm_stats,
        "embed_silhouette_lite": q_embed_silhouette_lite,
        "events_ab_srm": q_events_ab_srm,
        "events_rolling_retention": q_events_rolling_retention,
        "seq_entropy_rate": q_seq_entropy_rate,
    }


def build_oracle_sql(sf_dir_for_fixture: str = "/root/testdata/sf0.01") -> dict:
    """SQL for every oracle-expressible query. The sequences fixture is
    materialized (idempotent) so read_parquet paths resolve when DuckDB runs.
    Non-SQL-expressible ops (langid heuristic, simhash, minhash-LSH) are
    intentionally absent → the driver records a rows-only check for them.
    """
    path = ensure_fixture(sf_dir_for_fixture)
    out = {
        "events_window_1h": SQL_EVENTS_WINDOW_1H,
        "events_sessions": SQL_EVENTS_SESSIONS,
        "events_asof_purchase": SQL_EVENTS_ASOF_PURCHASE,
        "events_lag_diff": SQL_EVENTS_LAG_DIFF,
        "events_rolling_mean": SQL_EVENTS_ROLLING_MEAN,
        "events_sdann": SQL_EVENTS_SDANN,
        "events_type_entropy": SQL_EVENTS_TYPE_ENTROPY,
        "lineitem_pricing": SQL_LINEITEM_PRICING,
        "orders_segment_join": SQL_ORDERS_SEGMENT_JOIN,
        "docs_token_counts": SQL_DOCS_TOKEN_COUNTS,
        "docs_quality": SQL_DOCS_QUALITY,
        "docs_hashes": SQL_DOCS_HASHES,
        "docs_dedup_first8": SQL_DOCS_DEDUP_FIRST8,
        "embed_stats": SQL_EMBED_STATS,
        "embed_knn": SQL_EMBED_KNN,
        "embed_label_norms": SQL_EMBED_LABEL_NORMS,
        "seq_token_stats": sql_seq_token_stats(path),
        "seq_tokens_md5": sql_seq_tokens_md5(path),
        "seq_sessions": sql_seq_sessions(path),
        "seq_windows_1h": sql_seq_windows_1h(path),
        "seq_asof_sessions": sql_seq_asof_sessions(path),
        "seq_moments": sql_seq_moments(path),
        "seq_hjorth": sql_seq_hjorth(path),
        "seq_rolling_mean": sql_seq_rolling_mean(path),
        "events_night_stats": SQL_EVENTS_NIGHT_STATS,
        "seq_window_median": sql_seq_window_median(path),
        "seq_distinct_sources": sql_seq_distinct_sources(path),
        "embed_inertial": SQL_EMBED_INERTIAL,
        "events_sliding_window": SQL_EVENTS_SLIDING_WINDOW,
        "seq_windows_combined": sql_seq_windows_combined(path),
        "seq_sessions_salted": sql_seq_sessions_salted(path),
        "orders_lineitem_join": SQL_ORDERS_LINEITEM_JOIN,
        "seq_asof_salted": sql_seq_asof_sessions(path),
        "orders_customer_join_salted": SQL_ORDERS_CUSTOMER_JOIN_SALTED,
        "embed_knn_ivf": SQL_EMBED_KNN,
        "events_geo_clusters": sql_events_geo_clusters(sf_dir_for_fixture),
        "seq_spectral": sql_seq_spectral(path),
        "seq_nonlinear": sql_seq_nonlinear(path),
        "seq_rpeaks": sql_seq_rpeaks(path),
        "docs_simhash": _docs_materialized_oracle(sf_dir_for_fixture, "simhash_v1", _simhash_expected),
        "docs_minhash_pairs": _docs_materialized_oracle(sf_dir_for_fixture, "minhash_pairs_v1", _minhash_pairs_expected),
        "docs_langid": _docs_materialized_oracle(sf_dir_for_fixture, "langid_v1", _langid_expected),
        "docs_langid_confusion": _docs_materialized_oracle(
            sf_dir_for_fixture, "langid_confusion_v1",
            _langid_confusion_expected,
            columns=("doc_id", "text", "lang")),
        "docs_dedup_clusters": _docs_materialized_oracle(sf_dir_for_fixture, "dedup_clusters_v1", _dedup_clusters_expected),
        "docs_cluster_split": _docs_materialized_oracle(sf_dir_for_fixture, "cluster_split_v1", _cluster_split_expected),
        "docs_phash_dupes": _docs_materialized_oracle(sf_dir_for_fixture, "phash_dupes_v1", _phash_dupes_expected, columns=("doc_id",)),
        "lineitem_join_estimate": _table_materialized_oracle(sf_dir_for_fixture, "lineitem", "join_estimate_v1", _join_estimate_expected, ("l_orderkey",)),
        "embed_dupes": sql_embed_dupes(sf_dir_for_fixture),
        "region_revenue": SQL_REGION_REVENUE,
        "part_brand_pricing": SQL_PART_BRAND_PRICING,
        "supplier_nation_balance": SQL_SUPPLIER_NATION_BALANCE,
        "events_orders_range_join": SQL_EVENTS_ORDERS_RANGE_JOIN,
        "docs_topk_chars": SQL_DOCS_TOPK_CHARS,
        "seq_quantiles": sql_seq_quantiles(path),
        "docs_split_sample": SQL_DOCS_SPLIT_SAMPLE,
        "docs_top_tokens": SQL_DOCS_TOP_TOKENS,
        "docs_sample_per_lang": SQL_DOCS_SAMPLE_PER_LANG,
        "lineitem_profile": SQL_LINEITEM_PROFILE,
        "docs_redact": SQL_DOCS_REDACT,
        "orders_bloom_semi": _orders_bloom_semi_oracle(sf_dir_for_fixture),
        "lineitem_cms_counts": _cms_counts_oracle(sf_dir_for_fixture),
        "docs_media_decode": _docs_materialized_oracle(
            sf_dir_for_fixture, "media_decode_v1", _media_decode_expected),
        "docs_decontam": _docs_materialized_oracle(sf_dir_for_fixture, "decontam_v1", _decontam_expected_docs),
        "docs_simhash_dupes": _docs_materialized_oracle(
            sf_dir_for_fixture, "simhash_dupes_v1", _simhash_dupes_expected),
        "docs_prep_pipeline": _docs_materialized_oracle(
            sf_dir_for_fixture, "prep_pipeline_v1", _prep_expected_docs,
            columns=("doc_id", "text", "n_chars")),
        # same chain, dropset forced onto the bloom-exchange plan — the
        # result is plan-independent, so the oracle is shared
        "docs_prep_bloom": _docs_materialized_oracle(
            sf_dir_for_fixture, "prep_pipeline_v1", _prep_expected_docs,
            columns=("doc_id", "text", "n_chars")),
        "seq_weighted_sample": _materialized_oracle(
            path, "weighted_sample_v1", _weighted_sample_expected,
            columns=("doc_id", "ts_ns", "n_tok", "source")),
        "seq_pack": _materialized_oracle(path, "seq_pack_v1", _pack_expected_seq,
                                         columns=("doc_id", "ts_ns", "n_tok")),
        "docs_approx_distinct": _docs_materialized_oracle(
            sf_dir_for_fixture, "hll_distinct_v1", _hll_expected_docs,
            columns=("lang", "text")),
        "docs_shuffle_order": SQL_DOCS_SHUFFLE_ORDER,
        "docs_gopher_quality": SQL_DOCS_GOPHER_QUALITY,
        "seq_top_bigrams": sql_seq_top_bigrams(path),
        "seq_chunks": sql_seq_chunks(path),
        "docs_tfidf": SQL_DOCS_TFIDF,
        "docs_tokenize": _docs_materialized_oracle(
            sf_dir_for_fixture, "tokenize_v1", _tokenize_expected),
        "seq_dedup_tokens": sql_seq_dedup_tokens(path),
        "seq_length_buckets": sql_seq_length_buckets(path),
        "events_hampel": SQL_EVENTS_HAMPEL,
        "docs_line_dedup": SQL_DOCS_LINE_DEDUP,
        "events_user_sequences": SQL_EVENTS_USER_SEQUENCES,
        "docs_inverted_index": SQL_DOCS_INVERTED_INDEX,
        "orders_priority_encode": SQL_ORDERS_PRIORITY_ENCODE,
        "lineitem_quantity_rank": SQL_LINEITEM_QUANTITY_RANK,
        "docs_lm_nll": SQL_DOCS_LM_NLL,
        "docs_gopher_rules": sql_docs_gopher_rules(),
        "docs_quality_deciles": sql_docs_quality_deciles(),
        "docs_k_anonymize": sql_docs_k_anonymize(),
        "docs_keyword_tags": sql_docs_keyword_tags(),
        "docs_shingle_diversity": sql_docs_shingle_diversity(),
        "docs_cluster_size_hist": _docs_materialized_oracle(
            sf_dir_for_fixture, "cluster_size_hist_v1",
            _cluster_size_hist_expected),
        "docs_cross_dupes": _docs_materialized_oracle(
            sf_dir_for_fixture, "cross_dupes_v1", _cross_dupes_expected),
        "docs_dup_rate_by_source": _docs_materialized_oracle(
            sf_dir_for_fixture, "dup_rate_by_source_v1",
            _dup_rate_by_source_expected,
            columns=("doc_id", "text", "source")),
        "docs_lsh_incremental": _docs_materialized_oracle(
            sf_dir_for_fixture, "lsh_incremental_v1",
            _lsh_incremental_expected),
        "docs_dsir_weights": _docs_materialized_oracle(
            sf_dir_for_fixture, "dsir_weights_v1", _dsir_expected,
            columns=("doc_id", "text", "lang")),
        "docs_sorted_neighborhood": SQL_DOCS_SORTED_NEIGHBORHOOD,
        "events_type_pairs": SQL_EVENTS_TYPE_PAIRS,
        "docs_bm25": SQL_DOCS_BM25,
        "docs_jsonl_roundtrip": SQL_DOCS_JSONL_ROUNDTRIP,
        "seq_ewma": sql_seq_ewma(path),
        "seq_pmi": sql_seq_pmi(path),
        "seq_cumulative": sql_seq_cumulative(path),
        "seq_mixture": sql_seq_mixture(path),
        "seq_resample": sql_seq_resample(path),
        "seq_rolling_corr": sql_seq_rolling_corr(path),
        "seq_drift": sql_seq_drift(path),
        "orders_anti_returned": SQL_ORDERS_ANTI_RETURNED,
        "embed_kmeans": _kmeans_oracle(sf_dir_for_fixture),
        "embed_semdedup": _semdedup_oracle(sf_dir_for_fixture),
        "embed_pca": _pca_oracle(sf_dir_for_fixture),
        "embed_diversity": SQL_EMBED_DIVERSITY,
        "seq_heavy_hitters": _mg_oracle(path),
        "seq_zscore": sql_seq_zscore(path),
        "seq_bigram_nll": sql_seq_bigram_nll(path),
        "seq_ewma_td": sql_seq_ewma_td(path),
        "seq_qbucket": sql_seq_qbucket(path),
        "docs_csv_roundtrip": SQL_DOCS_CSV_ROUNDTRIP,
        "docs_partitioned_sink": SQL_DOCS_PARTITIONED_SINK,
        "seq_feature_matrix": sql_seq_feature_matrix(path),
        "seq_mad_outliers": sql_seq_mad_outliers(path),
        "seq_approx_quantiles": sql_seq_approx_quantiles(path),
        "seq_pagerank": sql_seq_pagerank(path),
        "seq_asof_fresh": sql_seq_asof_fresh(path),
        "seq_rolling_z": sql_seq_rolling_z(path),
        "seq_temporal_pack": sql_seq_temporal_pack(path),
        "seq_pmi_neighbors": sql_seq_pmi_neighbors(path),
        "seq_repeated_spans": sql_seq_repeated_spans(path),
        "events_temporal_pack": SQL_EVENTS_TEMPORAL_PACK,
        "events_resample": SQL_EVENTS_RESAMPLE,
        "seq_winsorize": sql_seq_winsorize(path),
        "seq_span_novelty": sql_seq_span_novelty(path),
        "events_ewma_td": _events_ewma_td_oracle(sf_dir_for_fixture),
        "seq_percent_rank": sql_seq_percent_rank(path),
        "events_compact": SQL_EVENTS_COMPACT,
        "seq_mode_by_source": sql_seq_mode_by_source(path),
        "events_gap_stats": SQL_EVENTS_GAP_STATS,
        "events_hour_profile": SQL_EVENTS_HOUR_PROFILE,
        "seq_source_transitions": sql_seq_source_transitions(path),
        "seq_trend": sql_seq_trend(path),
        "seq_autocorr": sql_seq_autocorr(path),
        "events_dominant_type": SQL_EVENTS_DOMINANT_TYPE,
        "docs_dedup_keep_best": _docs_materialized_oracle(
            sf_dir_for_fixture, "dedup_keep_best_v1",
            _dedup_keep_best_expected,
            columns=("doc_id", "text", "n_chars")),
        "events_funnel": SQL_EVENTS_FUNNEL,
        "seq_oov_rate": sql_seq_oov_rate(path),
        "lineitem_constraints": SQL_LINEITEM_CONSTRAINTS,
        "events_resample_interp": SQL_EVENTS_RESAMPLE_INTERP,
        "seq_bpe_merges": sql_seq_bpe_merges(path),
        "seq_bpe_apply": sql_seq_bpe_apply(path),
        "events_target_loo": SQL_EVENTS_TARGET_LOO,
        "lineitem_rollup": SQL_LINEITEM_ROLLUP,
        "events_type_pivot": SQL_EVENTS_TYPE_PIVOT,
        "events_nearest_poi": sql_events_nearest_poi(),
        "events_value_hist": SQL_EVENTS_VALUE_HIST,
        "lineitem_corr": SQL_LINEITEM_CORR,
        "events_funnel_summary": SQL_EVENTS_FUNNEL_SUMMARY,
        "lineitem_cube": SQL_LINEITEM_CUBE,
        "lineitem_moments": SQL_LINEITEM_MOMENTS,
        "lineitem_star_revenue": SQL_LINEITEM_STAR_REVENUE,
        "orders_basket_pairs": SQL_ORDERS_BASKET_PAIRS,
        "events_ntile": SQL_EVENTS_NTILE,
        "events_attribution": SQL_EVENTS_ATTRIBUTION,
        "events_journey": SQL_EVENTS_JOURNEY,
        "seq_token_spectrum": sql_seq_token_spectrum(path),
        "seq_distinct_ngrams": sql_seq_distinct_ngrams(path),
        "seq_repetition": sql_seq_repetition(path),
        "seq_epoch_shuffle": sql_seq_epoch_shuffle(path),
        "seq_streaming_sessions": sql_seq_sessions(path),
        "seq_asof_stream": sql_seq_asof_stream(path),
        "seq_streaming_lag": sql_seq_streaming_lag(path),
        "seq_streaming_rolling": sql_seq_streaming_rolling(path),
        "seq_prefix_dupes": sql_seq_prefix_dupes(path),
        "events_cusum": SQL_EVENTS_CUSUM,
        "events_pushdown_scan": SQL_EVENTS_PUSHDOWN_SCAN,
        "events_stickiness": SQL_EVENTS_STICKINESS,
        "docs_temperature_sample": SQL_DOCS_TEMPERATURE_SAMPLE,
        "docs_jaccard_dupes": SQL_DOCS_JACCARD_DUPES,
        "docs_eval_containment": SQL_DOCS_EVAL_CONTAINMENT,
        "events_upsert_latest": SQL_EVENTS_UPSERT_LATEST,
        "events_winsorized": SQL_EVENTS_WINSORIZED,
        "events_value_share": SQL_EVENTS_VALUE_SHARE,
        "events_session_type_pairs": SQL_EVENTS_SESSION_TYPE_PAIRS,
        "orders_repeat_gap": SQL_ORDERS_REPEAT_GAP,
        "seq_streaming_latest": sql_seq_streaming_latest(path),
        "docs_fuzzy_pairs": SQL_DOCS_FUZZY_PAIRS,
        "events_type_transitions": SQL_EVENTS_TYPE_TRANSITIONS,
        "docs_jw_pairs": SQL_DOCS_JW_PAIRS,
        "docs_er_clusters": SQL_DOCS_ER_CLUSTERS,
        "events_value_runs": SQL_EVENTS_VALUE_RUNS,
        "events_zorder_box": SQL_EVENTS_ZORDER_BOX,
        "events_incremental_daily": SQL_EVENTS_INCREMENTAL_DAILY,
        "events_session_enriched": SQL_EVENTS_SESSION_ENRICHED,
        "events_concurrency": SQL_EVENTS_CONCURRENCY,
        "events_snapshot_diff": SQL_EVENTS_SNAPSHOT_DIFF,
        "part_skyline": SQL_PART_SKYLINE,
        "item_triangles": SQL_ITEM_TRIANGLES,
        "events_scd2": SQL_EVENTS_SCD2,
        "item_triples": SQL_ITEM_TRIPLES,
        "events_cuped": SQL_EVENTS_CUPED,
        "embed_rrf": SQL_EMBED_RRF,
        "events_hourly_trend": SQL_EVENTS_HOURLY_TREND,
        "events_labeled_examples": SQL_EVENTS_LABELED_EXAMPLES,
        "orders_smb_join": SQL_ORDERS_SMB_JOIN,
        "embed_rerank": SQL_EMBED_RERANK,
        "events_daily_top_types": SQL_EVENTS_DAILY_TOP_TYPES,
        "item_similarity_topk": SQL_ITEM_SIMILARITY_TOPK,
        "events_burstiness": SQL_EVENTS_BURSTINESS,
        "docs_lsh_calibration": _docs_materialized_oracle(
            sf_dir_for_fixture, "lsh_calibration_v1",
            _lsh_calibration_expected),
        "seq_vocab_growth": sql_seq_vocab_growth(path),
        "docs_ledger_ingest": SQL_DOCS_LEDGER_INGEST,
        "seq_concat_examples": sql_seq_concat_examples(path),
        "events_retention": SQL_EVENTS_RETENTION,
        "part_revenue_pareto": SQL_PART_REVENUE_PARETO,
        "events_zonemap_range": SQL_EVENTS_ZONEMAP_RANGE,
        "events_bloom_point": SQL_EVENTS_BLOOM_POINT,
        "events_upsert_merge": SQL_EVENTS_UPSERT_MERGE,
        "events_time_travel": SQL_EVENTS_TIME_TRAVEL,
        "events_change_feed": SQL_EVENTS_CHANGE_FEED,
        "part_kcore": _table_materialized_oracle(
            sf_dir_for_fixture, "lineitem", "kcore_v1",
            _kcore_expected, ("l_orderkey", "l_partkey")),
        "seq_scrub_tokens": sql_seq_scrub_tokens(path),
        "docs_audio_vad": _docs_materialized_oracle(
            sf_dir_for_fixture, "audio_vad_v1", _audio_vad_expected,
            columns=("doc_id",)),
        "lineitem_weighted_median": SQL_LINEITEM_WEIGHTED_MEDIAN,
        "docs_search_and": SQL_DOCS_SEARCH_AND,
        "events_psi_drift": SQL_EVENTS_PSI_DRIFT,
        "events_range_join_stream": SQL_EVENTS_RANGE_JOIN_STREAM,
        "embed_ivf_recall": _ivf_recall_oracle(sf_dir_for_fixture),
        "embed_quantized_recall": _quant_recall_oracle(sf_dir_for_fixture),
        "events_hourly_distinct": SQL_EVENTS_HOURLY_DISTINCT,
        "supplier_part_degree": SQL_SUPPLIER_PART_DEGREE,
        "seq_trigram_nll": sql_seq_trigram_nll(path),
        "seq_minhash_dupes": sql_seq_minhash_dupes(path),
        "seq_vocab_coverage": sql_seq_vocab_coverage(path),
        "orders_daily_ma": SQL_ORDERS_DAILY_MA,
        "events_props_extract": SQL_EVENTS_PROPS_EXTRACT,
        "events_sliding_distinct": SQL_EVENTS_SLIDING_DISTINCT,
        "docs_audio_real": _docs_materialized_oracle(
            sf_dir_for_fixture, "audio_real_v1", _audio_real_expected,
            columns=("doc_id",)),
        "docs_image_real": _docs_materialized_oracle(
            sf_dir_for_fixture, "image_real_v1", _image_real_expected,
            columns=("doc_id",)),
        "docs_video_frames": _docs_materialized_oracle(
            sf_dir_for_fixture, "video_frames_v1", _video_frames_expected,
            columns=("doc_id",)),
        "seq_prep_pipeline": sql_seq_prep_pipeline(path),
        "events_value_rank": SQL_EVENTS_VALUE_RANK,
        "events_interval_union": SQL_EVENTS_INTERVAL_UNION,
        "events_late_data": SQL_EVENTS_LATE_DATA,
        "docs_token_chi2": SQL_DOCS_TOKEN_CHI2,
        "events_rfm_segments": SQL_EVENTS_RFM_SEGMENTS,
        "events_scd2_pit": SQL_EVENTS_SCD2_PIT,
        "lineitem_hll_overlap": _table_materialized_oracle(
            sf_dir_for_fixture, "lineitem", "hll_overlap_v1",
            _hll_overlap_expected, ("l_orderkey", "l_returnflag")),
        "embed_drift": SQL_EMBED_DRIFT,
        "events_twa": SQL_EVENTS_TWA,
        "events_ohlc": SQL_EVENTS_OHLC,
        "orders_fifo_alloc": SQL_ORDERS_FIFO_ALLOC,
        "seq_downsample_tokens": sql_seq_downsample_tokens(path),
        "events_ab_welch": SQL_EVENTS_AB_WELCH,
        "embed_mutual_nn": SQL_EMBED_MUTUAL_NN,
        "seq_lcs_pairs": _materialized_oracle(
            path, "lcs_pairs_v1", _lcs_pairs_expected,
            columns=("doc_id", "ts_ns", "tokens", "source")),
        "events_holt": _table_materialized_oracle(
            sf_dir_for_fixture, "events", "holt_v1", _events_holt_expected,
            ("event_id", "ts", "user_id", "value")),
        "orders_cohort_ltv": SQL_ORDERS_COHORT_LTV,
        "events_audience_overlap": SQL_EVENTS_AUDIENCE_OVERLAP,
        # streaming twin shares the exchange plan's window oracle
        "events_streaming_candles": SQL_EVENTS_OHLC,
        "events_mahalanobis": SQL_EVENTS_MAHALANOBIS,
        "orders_dup_invoices": SQL_ORDERS_DUP_INVOICES,
        "lineitem_benford": SQL_LINEITEM_BENFORD,
        "seq_token_burstiness": sql_seq_token_burstiness(path),
        "seq_good_turing": sql_seq_good_turing(path),
        "part_revenue_gini": SQL_PART_REVENUE_GINI,
        "events_bursts_kleinberg": _table_materialized_oracle(
            sf_dir_for_fixture, "events", "bursts_v1", _bursts_expected,
            ("event_id", "ts", "user_id")),
        "lineitem_supplier_hhi": SQL_LINEITEM_SUPPLIER_HHI,
        "seq_span_corruption": sql_seq_span_corruption(path),
        "seq_fim_layout": sql_seq_fim_layout(path),
        "events_changepoint": _table_materialized_oracle(
            sf_dir_for_fixture, "events", "changepoint_v1",
            _changepoint_expected, ("event_id", "ts", "user_id", "value")),
        "events_diff_in_diff": SQL_EVENTS_DIFF_IN_DIFF,
        "part_price_relatives": SQL_PART_PRICE_RELATIVES,
        "part_price_index": SQL_PART_PRICE_INDEX,
        "embed_pq_recall": _pq_recall_oracle(sf_dir_for_fixture),
        "events_order_violations": SQL_EVENTS_ORDER_VIOLATIONS,
        "docs_compress_ratio": _docs_materialized_oracle(
            sf_dir_for_fixture, "compress_ratio_v1",
            _compress_ratio_expected),
        "part_skyline3": SQL_PART_SKYLINE3,
        "seq_dup_rate_estimate": sql_seq_dup_rate_estimate(path),
        "seq_shard_balance": sql_seq_shard_balance(path),
        "events_anomaly_panel": SQL_EVENTS_ANOMALY_PANEL,
        "seq_winnow_fingerprints": sql_seq_winnow_fingerprints(path),
        "embed_hard_negatives": SQL_EMBED_HARD_NEGATIVES,
        "seq_source_similarity": sql_seq_source_similarity(path),
        "events_transition_dwell": SQL_EVENTS_TRANSITION_DWELL,
        "events_auc": SQL_EVENTS_AUC,
        "events_kmv_distinct": SQL_EVENTS_KMV_DISTINCT,
        "events_theil_sen": SQL_EVENTS_THEIL_SEN,
        "orders_assoc_rules": SQL_ORDERS_ASSOC_RULES,
        "events_kaplan_meier": SQL_EVENTS_KAPLAN_MEIER,
        "embed_mmr": _table_materialized_oracle(
            sf_dir_for_fixture, "embeddings", "mmr_v1", _mmr_expected,
            ["vec_id", "embedding"]),
        "events_calibration": SQL_EVENTS_CALIBRATION,
        "events_ks_drift": SQL_EVENTS_KS_DRIFT,
        "events_dow_index": SQL_EVENTS_DOW_INDEX,
        "events_isotonic": _table_materialized_oracle(
            sf_dir_for_fixture, "events", "isotonic_v1",
            _isotonic_expected, ["event_type", "value"]),
        "docs_image_patches": _docs_materialized_oracle(
            sf_dir_for_fixture, "image_patches_v1",
            _image_patches_expected, ["doc_id"]),
        "events_stl_decompose": SQL_EVENTS_STL_DECOMPOSE,
        "events_tukey_outliers": SQL_EVENTS_TUKEY_OUTLIERS,
        "docs_l_diversity": SQL_DOCS_L_DIVERSITY,
        "events_kendall_tau": SQL_EVENTS_KENDALL_TAU,
        "events_trimmed_mean": SQL_EVENTS_TRIMMED_MEAN,
        "embed_knn_classify": _table_materialized_oracle(
            sf_dir_for_fixture, "embeddings", "knn_classify_v1",
            _knn_classify_expected, ["vec_id", "embedding", "label"]),
        "events_garman_klass": SQL_EVENTS_GARMAN_KLASS,
        "part_price_elasticity": SQL_PART_PRICE_ELASTICITY,
        "events_markov_accuracy": SQL_EVENTS_MARKOV_ACCURACY,
        "embed_retrieval_ndcg": _table_materialized_oracle(
            sf_dir_for_fixture, "embeddings", "retrieval_ndcg_v1",
            _ndcg_expected, ["vec_id", "embedding", "label"]),
        "events_lead_lag": SQL_EVENTS_LEAD_LAG,
        "docs_ipc_roundtrip": SQL_DOCS_IPC_ROUNDTRIP,
        "seq_coverage_select": _materialized_oracle(
            path, "coverage_select_v2", _coverage_select_expected,
            columns=("doc_id", "ts_ns", "tokens")),
        "seq_mlm_mask": sql_seq_mlm_mask(path),
        "docs_lsh_pr": _docs_materialized_oracle(
            sf_dir_for_fixture, "lsh_pr_v1", _lsh_pr_expected),
        "events_local_peaks": SQL_EVENTS_LOCAL_PEAKS,
        "orders_interarrival": SQL_ORDERS_INTERARRIVAL,
        "lineitem_return_ci": SQL_LINEITEM_RETURN_CI,
        "docs_readability": SQL_DOCS_READABILITY,
        "events_mttr": SQL_EVENTS_MTTR,
        "events_funnel_latency": SQL_EVENTS_FUNNEL_LATENCY,
        "events_linear_attribution": SQL_EVENTS_LINEAR_ATTRIBUTION,
        "embed_ood": _table_materialized_oracle(
            sf_dir_for_fixture, "embeddings", "ood_v1",
            _embed_ood_expected, ["vec_id", "embedding", "label"]),
        "seq_haar_energy": sql_seq_haar_energy(path),
        "seq_rouge_pairs": sql_seq_rouge_pairs(path),
        "orders_ship_latency": SQL_ORDERS_SHIP_LATENCY,
        "orders_seasonal_naive": SQL_ORDERS_SEASONAL_NAIVE,
        "customer_segment_chi2": SQL_CUSTOMER_SEGMENT_CHI2,
        "embed_linear_probe": _table_materialized_oracle(
            sf_dir_for_fixture, "embeddings", "linear_probe_v1",
            _linear_probe_expected, ["vec_id", "embedding", "label"]),
        "events_dedup_window": SQL_EVENTS_DEDUP_WINDOW,
        "events_streaming_dedup": SQL_EVENTS_DEDUP_WINDOW,
        "events_gini_split": SQL_EVENTS_GINI_SPLIT,
        "events_ips_eval": SQL_EVENTS_IPS_EVAL,
        "part_lpa_communities": _table_materialized_oracle(
            sf_dir_for_fixture, "lineitem", "lpa_v1", _lpa_expected,
            ["l_orderkey", "l_partkey"]),
        "events_markov_attribution": _table_materialized_oracle(
            sf_dir_for_fixture, "events", "markov_attr_v1",
            _markov_attr_expected,
            ["event_id", "user_id", "event_type", "ts"]),
        "seq_kn_bigram": sql_seq_kn_bigram(path),
        "seq_watermark_score": sql_seq_watermark_score(path),
        "orders_woe_iv": SQL_ORDERS_WOE_IV,
        "docs_ncd_pairs": _docs_materialized_oracle(
            sf_dir_for_fixture, "ncd_pairs_v1", _ncd_expected),
        "events_next_purchase": SQL_EVENTS_NEXT_PURCHASE,
        "docs_orc_roundtrip": SQL_DOCS_ORC_ROUNDTRIP,
        "seq_dp_token_counts": sql_seq_dp_token_counts(path),
        "part_croston": _table_materialized_oracle(
            sf_dir_for_fixture, "lineitem", "croston_v1",
            _croston_expected,
            ["l_partkey", "l_shipdate", "l_quantity"]),
        "orders_total_reconcile": SQL_ORDERS_TOTAL_RECONCILE,
        "events_ratio_delta": SQL_EVENTS_RATIO_DELTA,
        "events_ab_power": SQL_EVENTS_AB_POWER,
        "docs_audio_logmel": _docs_materialized_oracle(
            sf_dir_for_fixture, "audio_logmel_v1",
            _audio_logmel_expected, ["doc_id"]),
        "events_user_neighbors": SQL_EVENTS_USER_NEIGHBORS,
        "docs_chunk_overlap": SQL_DOCS_CHUNK_OVERLAP,
        "part_xyz_class": SQL_PART_XYZ_CLASS,
        "events_hour_dow_heatmap": SQL_EVENTS_HOUR_DOW_HEATMAP,
        "embed_mrr": _table_materialized_oracle(
            sf_dir_for_fixture, "embeddings", "mrr_v1",
            _embed_mrr_expected, ["vec_id", "embedding", "label"]),
        "seq_greedy_bigram_accuracy":
            sql_seq_greedy_bigram_accuracy(path),
        "lineitem_fk_orphans": SQL_LINEITEM_FK_ORPHANS,
        "orders_band_migration": SQL_ORDERS_BAND_MIGRATION,
        "events_streaming_funnel": SQL_EVENTS_FUNNEL,
        "part_pmi_svd_neighbors": _table_materialized_oracle(
            sf_dir_for_fixture, "lineitem", "pmi_svd_v1",
            _pmi_svd_expected, ["l_orderkey", "l_partkey"]),
        "customer_t_closeness": SQL_CUSTOMER_T_CLOSENESS,
        "seq_curriculum_order": sql_seq_curriculum_order(path),
        "orders_budget_apportion": SQL_ORDERS_BUDGET_APPORTION,
        "events_kpi_decomposition": SQL_EVENTS_KPI_DECOMPOSITION,
        "embed_split_mmd": _table_materialized_oracle(
            sf_dir_for_fixture, "embeddings", "split_mmd_v1",
            _split_mmd_expected, ["vec_id", "embedding"]),
        "embed_ivf_sweep": _ivf_sweep_oracle(sf_dir_for_fixture),
        "part_reorder_point": SQL_PART_REORDER_POINT,
        "docs_image_norm_stats": _docs_materialized_oracle(
            sf_dir_for_fixture, "image_norm_v1",
            _image_norm_expected, ["doc_id"]),
        "embed_silhouette_lite": _table_materialized_oracle(
            sf_dir_for_fixture, "embeddings", "silhouette_v1",
            _silhouette_expected, ["vec_id", "embedding", "label"]),
        "events_ab_srm": SQL_EVENTS_AB_SRM,
        "events_rolling_retention": SQL_EVENTS_ROLLING_RETENTION,
        "seq_entropy_rate": _materialized_oracle(
            path, "entropy_rate_v1", _entropy_rate_expected,
            ["tokens"]),
    }
    _flush_pending_oracles()
    return out


# --------------------------------------------------------------------------
# additional sequence-kernel queries
# --------------------------------------------------------------------------


def q_seq_moments(sf_dir: str):
    """Per-row skewness / kurtosis (biased, zero-variance→0 — exact
    reference semantics, generic/stats.py:97-126) with a full SQL oracle."""
    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "tokens"])
    feat = token_features(ds, features=("skewness", "kurtosis"), drop_tokens=True)

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(["doc_id", "ts_ns", "tok_skewness", "tok_kurtosis"])
        b = b.rename_columns(["doc_id", "ts_ns", "skewness", "kurtosis"])
        return _round_cols(b, {"skewness": 6, "kurtosis": 6})

    return feat.map_batches(finish, batch_format="pyarrow")


def sql_seq_moments(path: str) -> str:
    return f"""
WITH s AS (SELECT doc_id, ts_ns, tokens FROM read_parquet('{path}/part-*.parquet')),
u AS (SELECT doc_id, ts_ns, unnest(tokens) AS v FROM s),
a AS (SELECT doc_id, ts_ns, count(*) AS cnt, CAST(sum(v) AS DOUBLE) / count(*) AS m FROM u GROUP BY doc_id, ts_ns),
c AS (SELECT u.doc_id, u.ts_ns,
             avg(pow(u.v - a.m, 2)) AS m2,
             avg(pow(u.v - a.m, 3)) AS m3,
             avg(pow(u.v - a.m, 4)) AS m4
      FROM u JOIN a USING (doc_id, ts_ns) GROUP BY u.doc_id, u.ts_ns)
SELECT doc_id, ts_ns,
       round(CASE WHEN m2 > 0 THEN m3 / pow(m2, 1.5) ELSE 0 END, 6) AS skewness,
       round(CASE WHEN m2 > 0 THEN m4 / (m2 * m2) ELSE 0 END, 6) AS kurtosis
FROM c
"""


def q_seq_hjorth(sf_dir: str):
    """Hjorth activity / mobility per row (reference:generic/timedom.py:81-112).

    Integer-valued token data makes variances exact dyadic rationals that can
    sit precisely ON rounding half-steps, so both sides compute the variance
    in EXACT int64 arithmetic — ``(n·Σv² − (Σv)²) / n²`` and the doubled
    gradient ``2g`` (always integral) — and emit the resulting bit-identical
    doubles unrounded.
    """
    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "tokens"])

    def fn(b: pa.Table) -> pa.Table:
        from pymhealth_ray.stages.rowfeatures import _flat_tokens, _segmented_gradient

        v, off = _flat_tokens(b, "tokens")
        vi = v.astype(np.int64)
        n = np.diff(off).astype(np.int64)
        idx = off[:-1]
        s1 = np.add.reduceat(vi, idx)
        s2 = np.add.reduceat(vi * vi, idx)
        act = (n * s2 - s1 * s1).astype(np.float64) / (n * n).astype(np.float64)
        g2 = np.rint(_segmented_gradient(v, off) * 2.0).astype(np.int64)
        gs1 = np.add.reduceat(g2, idx)
        gs2 = np.add.reduceat(g2 * g2, idx)
        varg2 = (n * gs2 - gs1 * gs1).astype(np.float64) / (n * n).astype(np.float64)
        varg = varg2 / 4.0
        with np.errstate(invalid="ignore", divide="ignore"):
            mob = np.sqrt(varg / act)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "ts_ns": b["ts_ns"],
                "hjorth_activity": pa.array(act),
                "hjorth_mobility": pa.array(mob),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def sql_seq_hjorth(path: str) -> str:
    return f"""
WITH s AS (SELECT doc_id, ts_ns, tokens FROM read_parquet('{path}/part-*.parquet')),
u AS (SELECT doc_id, ts_ns, CAST(unnest(tokens) AS BIGINT) AS v,
             generate_subscripts(tokens, 1) AS k, len(tokens) AS cnt FROM s),
g AS (SELECT doc_id, ts_ns, cnt, k, v,
             CASE WHEN k = 1 THEN 2 * (lead(v) OVER w - v)
                  WHEN k = cnt THEN 2 * (v - lag(v) OVER w)
                  ELSE lead(v) OVER w - lag(v) OVER w END AS g2
      FROM u WINDOW w AS (PARTITION BY doc_id, ts_ns ORDER BY k)),
a AS (SELECT doc_id, ts_ns, any_value(cnt) AS n,
             CAST(sum(v) AS BIGINT) AS s1, CAST(sum(v * v) AS BIGINT) AS s2,
             CAST(sum(g2) AS BIGINT) AS gs1, CAST(sum(g2 * g2) AS BIGINT) AS gs2
      FROM g GROUP BY doc_id, ts_ns)
SELECT doc_id, ts_ns,
       CAST(n * s2 - s1 * s1 AS DOUBLE) / CAST(n * n AS DOUBLE) AS hjorth_activity,
       sqrt((CAST(n * gs2 - gs1 * gs1 AS DOUBLE) / CAST(n * n AS DOUBLE) / 4.0)
            / (CAST(n * s2 - s1 * s1 AS DOUBLE) / CAST(n * n AS DOUBLE))) AS hjorth_mobility
FROM a
"""


def q_seq_rolling_mean(sf_dir: str):
    """Count-based rolling windows over sequences (rolling_apply semantics,
    reference:util/windows.py:54-95) with a SQL oracle."""
    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "n_tok"])
    rw = rolling_count_windows(ds, "n_tok", wsize=8, wstep=4, num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(["doc_id", "window_idx", "n_tok_mean"])
        return _round_cols(b, {"n_tok_mean": 6})

    return rw.map_batches(finish, batch_format="pyarrow")


def sql_seq_rolling_mean(path: str) -> str:
    return f"""
WITH e AS (SELECT doc_id, ts_ns, n_tok FROM read_parquet('{path}/part-*.parquet')),
r AS (SELECT doc_id, n_tok,
             row_number() OVER (PARTITION BY doc_id ORDER BY ts_ns) - 1 AS rn,
             count(*) OVER (PARTITION BY doc_id) AS cnt,
             avg(n_tok) OVER (PARTITION BY doc_id ORDER BY ts_ns
                              ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS wmean
      FROM e)
SELECT doc_id, rn // 4 AS window_idx, round(wmean, 6) AS n_tok_mean
FROM r WHERE rn % 4 = 0 AND rn + 8 <= cnt
"""


def q_seq_spectral(sf_dir: str):
    """Spectral row features (batched rfft) — no SQL form, rows-only check."""
    from pymhealth_ray.stages.rowfeatures import spectral_features

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "tokens"])
    sp = spectral_features(ds)
    keep = ["doc_id", "ts_ns", "spec_total_power", "spec_power_0_0.1",
            "spec_power_0.1_0.25", "spec_power_0.25_0.5", "spec_peak_freq", "spec_entropy"]
    return sp.map_batches(lambda b: b.select(keep), batch_format="pyarrow")


def q_seq_rpeaks(sf_dir: str):
    """Hamilton-Tompkins R-peak detection + HRV summary per sequence
    (stateful scan chain, reference:heart/qrs.py:59-197) — rows-only."""
    from pymhealth_ray.stages.signal import detect_rpeaks

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "tokens"])
    rp = detect_rpeaks(ds)
    return rp.map_batches(
        lambda b: b.select(["doc_id", "ts_ns", "n_peaks", "mean_rr_ms", "sdnn_ms", "rmssd_ms", "pnn50"]),
        batch_format="pyarrow",
    )


def q_events_night_stats(sf_dir: str):
    """Time-of-day-predicated per-entity aggregate — the reference's
    determine_home_coords pattern (median over 22:00-06:00 history,
    reference:location/features.py:11-24) over the events stream."""
    ds = _events(sf_dir, ["user_id", "ts", "value"])
    US_DAY, US_HOUR = 86_400_000_000, 3_600_000_000

    def night_only(b: pa.Table) -> pa.Table:
        ts = b["ts_us"].to_numpy(zero_copy_only=False)
        hour = (ts % US_DAY) // US_HOUR
        keep = (hour >= 22) | (hour < 6)
        return b.filter(pa.array(keep))

    filtered = ds.map_batches(night_only, batch_format="pyarrow")

    def per_bucket(tbl: pa.Table) -> pa.Table:
        # medians/means for every user in the bucket in one pass: sort by
        # (user, value), segment boundaries, index-arithmetic medians
        order = pc.sort_indices(tbl, sort_keys=[("user_id", "ascending"), ("value", "ascending")])
        tbl = tbl.take(order)
        uid = tbl["user_id"]
        if isinstance(uid, pa.ChunkedArray):
            uid = uid.combine_chunks()
        codes = uid.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        v = tbl["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        cnt = np.bincount(codes)
        firsts = np.concatenate([[0], np.flatnonzero(codes[1:] != codes[:-1]) + 1]).astype(np.int64)
        lo = firsts + (cnt - 1) // 2
        hi = firsts + cnt // 2
        median = (v[lo] + v[hi]) / 2.0  # == np.median on the sorted segment
        mean = np.bincount(codes, weights=v) / cnt
        return pa.table(
            {
                "user_id": uid.take(pa.array(firsts)),
                "n_night": pa.array(cnt.astype(np.int64)),
                "value_median": pa.array(_round_away(median, 6)),
                "value_mean": pa.array(_round_away(mean, 6)),
            }
        )

    from pymhealth_ray.stages.partition import grouped_by_bucket

    return grouped_by_bucket(filtered, per_bucket, entity_col="user_id", num_buckets=NB)


SQL_EVENTS_NIGHT_STATS = """
WITH e AS (SELECT user_id, (epoch_us(ts) % 86400000000) // 3600000000 AS hour, value FROM events)
SELECT user_id, count(*) AS n_night, round(median(value), 6) AS value_median,
       round(avg(value), 6) AS value_mean
FROM e WHERE hour >= 22 OR hour < 6 GROUP BY user_id
"""


def q_seq_window_median(sf_dir: str):
    """Window median + IQR via the generic registered-kernel path
    (reference:generic/stats.py median/interquartile_range as window
    aggregations) with a quantile_cont SQL oracle."""
    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "n_tok"])
    wf = window_features(
        ds, HOUR_NS, HOUR_NS,
        aggs={"ntok_median": ("n_tok", "median"), "ntok_iqr": ("n_tok", "iqr")},
        emit_empty=False, num_buckets=NB,
    )

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(["doc_id", "window_start_ns", "n_in_window", "ntok_median", "ntok_iqr"])
        b = b.rename_columns(["doc_id", "window_start_ns", "n_events", "ntok_median", "ntok_iqr"])
        return _round_cols(b, {"ntok_median": 6, "ntok_iqr": 6})

    return wf.map_batches(finish, batch_format="pyarrow")


def sql_seq_window_median(path: str) -> str:
    return f"""
WITH e AS (SELECT doc_id, ts_ns, n_tok FROM read_parquet('{path}/part-*.parquet')),
b AS (SELECT doc_id, min(ts_ns) AS f, max(ts_ns) AS l FROM e GROUP BY doc_id),
w AS (SELECT e.doc_id, f + ((e.ts_ns - f) // {HOUR_NS}) * {HOUR_NS} AS window_start_ns, e.n_tok
      FROM e JOIN b USING (doc_id)
      WHERE (e.ts_ns - f) // {HOUR_NS} < (l - f + {HOUR_NS} - 1) // {HOUR_NS})
SELECT doc_id, window_start_ns, count(*) AS n_events,
       round(median(CAST(n_tok AS DOUBLE)), 6) AS ntok_median,
       round(quantile_cont(CAST(n_tok AS DOUBLE), 0.75)
             - quantile_cont(CAST(n_tok AS DOUBLE), 0.25), 6) AS ntok_iqr
FROM w GROUP BY doc_id, window_start_ns
"""


def q_seq_distinct_sources(sf_dir: str):
    """Distinct counting per entity (the reference's num_clusters pattern,
    location/distribution.py:58-65) via two-level partial aggregation."""
    ds, _ = _seq_ds(sf_dir, ["doc_id", "source"])
    pairs = grouped_stats(ds, ["doc_id", "source"])

    def per_bucket(tbl: pa.Table) -> pa.Table:
        order = pc.sort_indices(tbl, sort_keys=[("doc_id", "ascending")])
        tbl = tbl.take(order)
        did = tbl["doc_id"]
        if isinstance(did, pa.ChunkedArray):
            did = did.combine_chunks()
        codes = did.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        n = tbl["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        firsts = np.concatenate([[0], np.flatnonzero(codes[1:] != codes[:-1]) + 1]).astype(np.int64)
        return pa.table(
            {
                "doc_id": did.take(pa.array(firsts)),
                "n_sources": pa.array(np.bincount(codes).astype(np.int64)),
                "n_rows": pa.array(np.bincount(codes, weights=n).astype(np.int64)),
            }
        )

    from pymhealth_ray.stages.partition import grouped_by_bucket

    return grouped_by_bucket(pairs, per_bucket, entity_col="doc_id", num_buckets=NB)


def sql_seq_distinct_sources(path: str) -> str:
    return f"""
SELECT doc_id, count(DISTINCT source) AS n_sources, count(*) AS n_rows
FROM read_parquet('{path}/part-*.parquet') GROUP BY doc_id
"""


def q_seq_nonlinear(sf_dir: str):
    """Nonlinear per-row kernels on a bounded prefix (first 128 tokens):
    Hurst exponent, DFA slope, sample entropy, RQA recurrence rate and
    determinism (reference:generic/timedom.py:196-259,
    generic/information.py:23-113, generic/rqa.py) — O(n²)-bounded per
    window, actor-pool stage, rows-only check."""
    from pymhealth_ray.functions import information, rqa, timedom
    from pymhealth_ray.stages.rowfeatures import _flat_tokens

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "tokens"])

    class Nonlinear:
        PREFIX = 128

        def __call__(self, b: pa.Table) -> pa.Table:
            v, off = _flat_tokens(b, "tokens")
            n = len(off) - 1
            hurst = np.full(n, np.nan)
            dfa = np.full(n, np.nan)
            sampen = np.full(n, np.nan)
            rec_rate = np.full(n, np.nan)
            determ = np.full(n, np.nan)
            for i in range(n):
                x = v[off[i] : min(off[i] + self.PREFIX, off[i + 1])]
                if len(x) < 66:  # hurst needs lags up to 63
                    continue
                hurst[i] = timedom.hurst(x)
                dfa[i] = timedom.dfa(x, windows=[4, 8, 16, 32])
                sampen[i] = information.sampen(x)
                r = rqa.rq(x, radius=np.std(x) * 0.2)
                rec_rate[i] = rqa.recurrence_rate(r)
                determ[i] = rqa.determinism(r)
            out = b.drop_columns(["tokens"])
            out = out.append_column("hurst", pa.array(hurst))
            out = out.append_column("dfa", pa.array(dfa))
            out = out.append_column("sampen", pa.array(sampen))
            out = out.append_column("recurrence_rate", pa.array(rec_rate))
            return out.append_column("determinism", pa.array(determ))

    return ds.map_batches(Nonlinear, batch_format="pyarrow", concurrency=(2, 8), batch_size=512)


def q_embed_inertial(sf_dir: str):
    """Inertial projections (reference:inertial/accelerometer.py roll/pitch/
    magnitude) applied to the first three embedding components as x/y/z —
    elementwise kernels with a full SQL oracle."""
    from pymhealth_ray.functions import inertial

    ds = read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def fn(b: pa.Table) -> pa.Table:
        emb = b["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        off = emb.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = emb.values.to_numpy(zero_copy_only=False)[off[0]: off[-1]].astype(np.float64)
        off = off - off[0]
        x, y, z = flat[off[:-1]], flat[off[:-1] + 1], flat[off[:-1] + 2]
        return pa.table(
            {
                "vec_id": b["vec_id"],
                "roll_deg": pa.array(_round_away(inertial.roll(y, z), 6)),
                "pitch_deg": pa.array(_round_away(inertial.pitch(x, y, z), 6)),
                "magnitude": pa.array(_round_away(inertial.magnitude(x, y, z), 6)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_EMBED_INERTIAL = """
WITH e AS (SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x, CAST(embedding[2] AS DOUBLE) AS y,
                  CAST(embedding[3] AS DOUBLE) AS z FROM embeddings)
SELECT vec_id, round(degrees(atan2(y, z)), 6) AS roll_deg,
       round(degrees(atan2(-x, sqrt(y * y + z * z))), 6) AS pitch_deg,
       round(sqrt(x * x + y * y + z * z), 6) AS magnitude
FROM e
"""


QUARTER_US = 900_000_000


def q_events_sliding_window(sf_dir: str):
    """SLIDING event-time windows (wsize 1 h, wstep 15 min — overlapping,
    grid anchored at each entity's first event) — the general
    nonuniform_rolling_apply case, oracle-checked via a generate_series
    range join."""
    ds = _events(sf_dir, ["user_id", "ts", "value"])
    wf = window_features(
        ds, HOUR_US, QUARTER_US,
        aggs={"value_mean": ("value", "mean"), "value_max": ("value", "max")},
        entity_col="user_id", ts_col="ts_us", emit_empty=False, num_buckets=NB,
    )

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(["user_id", "window_start_ns", "n_in_window", "value_mean", "value_max"])
        b = b.rename_columns(["user_id", "window_start_us", "n_events", "value_mean", "value_max"])
        return _round_cols(b, {"value_mean": 6, "value_max": 2})

    return wf.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_SLIDING_WINDOW = f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
b AS (SELECT user_id, min(ts_us) AS f, max(ts_us) AS l FROM e GROUP BY user_id HAVING max(ts_us) > min(ts_us)),
g AS (SELECT user_id, f + unnest(generate_series(0, CAST((l - f - 1) // {QUARTER_US} AS BIGINT))) * {QUARTER_US} AS ws
      FROM b),
j AS (SELECT g.user_id, g.ws, e.value
      FROM g JOIN e ON e.user_id = g.user_id AND e.ts_us >= g.ws AND e.ts_us < g.ws + {HOUR_US})
SELECT user_id, ws AS window_start_us, count(*) AS n_events,
       round(avg(value), 6) AS value_mean, round(max(value), 2) AS value_max
FROM j GROUP BY user_id, ws
"""


def q_seq_windows_combined(sf_dir: str):
    """Tumbling windows via the MAP-SIDE COMBINED path (partials per
    (entity, window) per block shuffle instead of raw rows) — same oracle
    semantics as seq_windows_1h; float reconstruction differs at the
    10^-13 level, so values are rounded on both sides."""
    from pymhealth_ray.stages.window import window_features_combined

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "n_tok"])
    wf = window_features_combined(
        ds, HOUR_NS,
        aggs={"ntok_sum": ("n_tok", "sum"), "ntok_mean": ("n_tok", "mean"), "ntok_std": ("n_tok", "std")},
        num_buckets=NB,
    )

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(["doc_id", "window_start_ns", "n_in_window", "ntok_sum", "ntok_mean", "ntok_std"])
        b = b.rename_columns(["doc_id", "window_start_ns", "n_events", "ntok_sum", "ntok_mean", "ntok_std"])
        return _round_cols(b, {"ntok_sum": 4, "ntok_mean": 6, "ntok_std": 6})

    return wf.map_batches(finish, batch_format="pyarrow")


def sql_seq_windows_combined(path: str) -> str:
    return f"""
WITH e AS (SELECT doc_id, ts_ns, n_tok FROM read_parquet('{path}/part-*.parquet')),
b AS (SELECT doc_id, min(ts_ns) AS f, max(ts_ns) AS l FROM e GROUP BY doc_id),
w AS (SELECT e.doc_id, f + ((e.ts_ns - f) // {HOUR_NS}) * {HOUR_NS} AS window_start_ns, e.n_tok
      FROM e JOIN b USING (doc_id)
      WHERE (e.ts_ns - f) // {HOUR_NS} < (l - f + {HOUR_NS} - 1) // {HOUR_NS})
SELECT doc_id, window_start_ns, count(*) AS n_events,
       round(CAST(sum(n_tok) AS DOUBLE), 4) AS ntok_sum,
       round(avg(CAST(n_tok AS DOUBLE)), 6) AS ntok_mean,
       round(stddev_pop(CAST(n_tok AS DOUBLE)), 6) AS ntok_std
FROM w GROUP BY doc_id, window_start_ns
"""


def q_seq_sessions_salted(sf_dir: str):
    """Per-row session ids via the SALTED sessionizer (hot entities split
    into bounded time chunks, ids reconciled from per-chunk summaries) —
    must equal the plain gap-scan oracle exactly."""
    from pymhealth_ray.stages.session import sessionize_salted

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns"])
    out = sessionize_salted(ds, GAP_NS, num_buckets=NB, salt_threshold=500)
    return out.map_batches(lambda b: b.select(["doc_id", "ts_ns", "session_id"]), batch_format="pyarrow")


def sql_seq_sessions_salted(path: str) -> str:
    return f"""
WITH e AS (SELECT doc_id, ts_ns FROM read_parquet('{path}/part-*.parquet')),
s AS (SELECT doc_id, ts_ns,
             CASE WHEN ts_ns - lag(ts_ns) OVER (PARTITION BY doc_id ORDER BY ts_ns) > {GAP_NS}
                  THEN 1 ELSE 0 END AS brk FROM e)
SELECT doc_id, ts_ns,
       CAST(sum(brk) OVER (PARTITION BY doc_id ORDER BY ts_ns ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
FROM s
"""


def q_orders_lineitem_join(sf_dir: str):
    """Large-large co-partitioned hash join (orders ⋈ lineitem on orderkey)
    → revenue per order priority — TPC-H Q3-family shape, one exchange per
    side + per-bucket Arrow hash join + partial-agg rollup."""
    from pymhealth_ray.stages.join import equi_join

    orders = read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"])
    li = read_table(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def prep(b: pa.Table) -> pa.Table:
        price_c = np.rint(b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        disc_c = np.rint(b["l_discount"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        b = b.append_column("rev_u", pa.array(price_c * (100 - disc_c)))
        return b.select(["l_orderkey", "rev_u"]).rename_columns(["o_orderkey", "rev_u"])

    li2 = li.map_batches(prep, batch_format="pyarrow")
    j = equi_join(orders, li2, on="o_orderkey", join_type="inner", num_buckets=NB)
    agg = grouped_stats(j, ["o_orderpriority"], sum_cols=["rev_u"], count_name="n_items")

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": b["o_orderpriority"],
                "n_items": b["n_items"].cast(pa.int64()),
                "revenue_u": b["rev_u_sum"].cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_ORDERS_LINEITEM_JOIN = """
SELECT o_orderpriority, count(*) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_u
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""


def q_seq_asof_salted(sf_dir: str):
    """Same as-of-last-closed-session semantics as seq_asof_sessions, but
    through the SALTED as-of (hot dimension entities chunked by time with
    fact routing) — must match the same SQL oracle exactly."""
    from pymhealth_ray.stages.asof import asof_join_salted

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "n_tok"])
    st = session_stats(ds, GAP_NS, value_col="n_tok", num_buckets=NB)

    def mk_dim(b: pa.Table) -> pa.Table:
        pub = pc.add(b["end_ns"], GAP_NS)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "ts_ns": pub.cast(pa.int64()),
                "sess_mean": b["n_tok_mean"],
                "sess_end": b["end_ns"],
            }
        )

    # materialized for the same double-execution reason as seq_asof_sessions
    dim = st.map_batches(mk_dim, batch_format="pyarrow").materialize()
    j = asof_join_salted(ds, dim, ["sess_mean", "sess_end"], num_buckets=NB, salt_threshold=50)

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(["doc_id", "ts_ns", "n_tok", "sess_mean_asof", "sess_end_asof"])
        b = b.rename_columns(["doc_id", "ts_ns", "n_tok", "sess_ref_mean", "sess_ref_end_ns"])
        return _cast_cols(b, {"n_tok": pa.int64()})

    return j.map_batches(finish, batch_format="pyarrow")


# --------------------------------------------------------------------------
# round 2: hot-key salted equi-join (VERDICT item 4)
# --------------------------------------------------------------------------


def q_orders_customer_join_salted(sf_dir: str):
    """orders ⋈ customer on custkey through the SALTED equi-join: heavy
    custkeys (detected exactly via partial counts) are joined map-side
    against a broadcast of their customer rows; the rest take the normal
    co-partitioned exchange — generalizes the reference's broadcast lookup
    (reference:location/distance.py:36-44) to skewed large-large joins.
    Threshold is set low enough that BOTH paths run at every sf."""
    from pymhealth_ray.stages.join import equi_join_salted

    orders = read_table(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey", "o_orderstatus"])
    cust = read_table(f"{sf_dir}/customer.parquet",
                      columns=["c_custkey", "c_mktsegment", "c_nationkey"])

    def key_align(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": b["c_custkey"],
            "c_mktsegmt": b["c_mktsegment"],
            "c_natkey": b["c_nationkey"].cast(pa.int64()),
        })

    dim = cust.map_batches(key_align, batch_format="pyarrow")
    j = equi_join_salted(orders, dim, on="o_custkey", join_type="inner",
                         hot_threshold=12, num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_custkey": b["o_custkey"],
            "o_orderstatus": b["o_orderstatus"],
            "c_mktsegmt": b["c_mktsegmt"],
            "c_natkey": b["c_natkey"],
        })

    return j.map_batches(finish, batch_format="pyarrow")


SQL_ORDERS_CUSTOMER_JOIN_SALTED = """
SELECT o_orderkey, o_custkey, o_orderstatus,
       c_mktsegment AS c_mktsegmt, CAST(c_nationkey AS BIGINT) AS c_natkey
FROM orders JOIN customer ON o_custkey = c_custkey
"""


def q_embed_knn_ivf(sf_dir: str):
    """Exact top-k THROUGH the centroid-partitioned IVF layout: index built
    (resumable, cached by params) under /tmp, probed with nprobe =
    n_centroids so the result is exact and shares SQL_EMBED_KNN's oracle.
    Partition PRUNING (nprobe < n_centroids) is covered by pytest
    (TestIVFPartitioned.test_probe_reads_at_most_nprobe_partitions)."""
    import os
    import pyarrow.parquet as pq

    n_centroids = 8
    ds = read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    index_dir = f"/tmp/pymhealth_ray_ivf/{os.path.basename(os.path.normpath(sf_dir))}"
    with _build_lock(index_dir):
        ann.build_ivf_index(ds, index_dir, n_centroids=n_centroids)

    full = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    queries = full.filter(pc.less(full["vec_id"], 10))
    topk = ann.knn_ivf_partitioned(index_dir, queries, k=5, nprobe=n_centroids)
    return _round_cols(topk, {"cosine": 4})


# --------------------------------------------------------------------------
# round 2: per-entity density clustering (VERDICT item 7)
# --------------------------------------------------------------------------

_GEO_EPS_KM = 0.1
_GEO_MIN_SAMPLES = 3


def _geo_coords(user_id: np.ndarray, event_id: np.ndarray, value: np.ndarray):
    """Deterministic synthetic GPS pings from event fields (identical numpy
    float64 expressions on BOTH the engine and oracle side → bit-exact):
    3 sites per user, jitter from the value column."""
    site = (event_id % 3).astype(np.float64)
    jitter = (np.mod(value * 1000.0, 1.0) - 0.5) * 2e-4
    jitter2 = (np.mod(value * 7777.0, 1.0) - 0.5) * 2e-4
    lat = 45.0 + (user_id % 10).astype(np.float64) * 0.5 + site * 0.05 + jitter
    lon = 7.0 + site * 0.05 + jitter2
    return lat, lon


def q_events_geo_clusters(sf_dir: str):
    """Per-user density clustering of (synthetic) GPS pings — the
    distributed form of reference cluster_locations + num_clusters /
    cluster_entropy (reference:location/distribution.py:42-102), via the
    grid-accelerated haversine DBSCAN. Oracle = the O(n²) brute-force
    DBSCAN, independently materialized."""
    from pymhealth_ray.stages.geo import cluster_features_stage

    ds = read_table(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"])

    def synth(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        val = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        lat, lon = _geo_coords(uid, eid, val)
        return pa.table({
            "user_id": b["user_id"],
            "ts": b["event_id"],  # unique per-user order key
            "lat": pa.array(lat), "lon": pa.array(lon),
        })

    feats = cluster_features_stage(
        ds.map_batches(synth, batch_format="pyarrow"),
        entity_col="user_id", ts_col="ts",
        eps_km=_GEO_EPS_KM, min_samples=_GEO_MIN_SAMPLES, num_buckets=NB,
    )

    def finish(b: pa.Table) -> pa.Table:
        rounded = pc.round(b["cluster_entropy"], ndigits=6)
        return b.drop_columns(["cluster_entropy"]).append_column("cluster_entropy", rounded)

    return feats.map_batches(finish, batch_format="pyarrow")


def sql_events_geo_clusters(sf_dir: str) -> str:
    """Materialize the expected per-user cluster features with the
    INDEPENDENT O(n²) DBSCAN (functions.location._dbscan_bruteforce) and
    return a SQL passthrough — the seq_asof_sessions fixture-oracle
    pattern for non-SQL-expressible algorithms."""
    import os

    import duckdb
    import pyarrow.parquet as pq_mod

    from pymhealth_ray.functions.location import _dbscan_bruteforce
    from pymhealth_ray.sources.generate import fixture_dir_for

    out_dir = fixture_dir_for(sf_dir).rstrip("/") + "_geo_oracle"
    out_path = os.path.join(out_dir, "expected.parquet")
    if not os.path.exists(out_path):
        os.makedirs(out_dir, exist_ok=True)
        df = duckdb.sql(
            f"SELECT event_id, user_id, value FROM read_parquet('{sf_dir}/events.parquet') "
            "ORDER BY user_id, event_id"
        ).df()
        lat, lon = _geo_coords(df.user_id.values, df.event_id.values,
                               df.value.values.astype(np.float64))
        rows = []
        idx = np.arange(len(df))
        for uid in np.unique(df.user_id.values):
            m = idx[df.user_id.values == uid]
            labels = _dbscan_bruteforce(lat[m], lon[m], _GEO_EPS_KM, _GEO_MIN_SAMPLES)
            counts = np.unique(labels, return_counts=True)[1].astype(np.float64)
            p = counts / counts.sum() + 1e-30
            rows.append({
                "user_id": int(uid),
                "n_points": int(len(m)),
                "n_clusters": int((np.unique(labels) >= 0).sum()),
                "n_noise": int((labels == -1).sum()),
                "cluster_entropy": round(float(-(p * np.log(p)).sum()), 6),
            })
        import pandas as pd

        tmp = out_path + ".tmp"
        pq_mod.write_table(pa.Table.from_pandas(pd.DataFrame(rows)), tmp)
        os.replace(tmp, out_path)
    return f"SELECT * FROM read_parquet('{out_path}')"


# --------------------------------------------------------------------------
# round 2: materialized oracles for seq_spectral / seq_nonlinear (VERDICT 8)
# --------------------------------------------------------------------------


#: (src_path_or_None, out_path, builder, columns, as_pandas) records of
#: oracle parquets whose files are missing — built in ONE parallel flush at
#: the end of build_oracle_sql (ray tasks when a session is up) instead of
#: serially at registration. Cold-cache oracle_sql() build was the single
#: biggest gate fixed cost (~2m20s on a wiped /tmp).
_PENDING_ORACLES: list = []


def _build_oracle_file(src_path, out_path, builder, columns, as_pandas,
                       shards=1):
    """Single-process oracle replication → parquet (atomic rename)."""
    import os

    import pyarrow.parquet as pq_mod

    src = pq_mod.read_table(src_path, columns=list(columns))
    exp = builder(src.to_pandas() if as_pandas else src)
    tmp = f"{out_path}.tmp{os.getpid()}"
    pq_mod.write_table(pa.Table.from_pandas(exp, preserve_index=False), tmp)
    os.replace(tmp, out_path)


def _build_oracle_shard(src_path, builder, columns, as_pandas, idx, shards):
    """One row-range shard of a ROW-LOCAL builder (output row i depends
    only on input row i), for parallelizing the heavy per-row signal
    replications (rpeaks, nonlinear)."""
    import pyarrow.parquet as pq_mod

    src = pq_mod.read_table(src_path, columns=list(columns))
    n = src.num_rows
    lo = (n * idx) // shards
    hi = (n * (idx + 1)) // shards
    part = src.slice(lo, hi - lo)
    return builder(part.to_pandas() if as_pandas else part)


def _flush_pending_oracles():
    global _PENDING_ORACLES
    pending, _PENDING_ORACLES = _PENDING_ORACLES, []
    if not pending:
        return
    if ray.is_initialized():
        import os

        import pandas as pd
        import pyarrow.parquet as pq_mod

        file_task = ray.remote(num_cpus=1)(_build_oracle_file)
        shard_task = ray.remote(num_cpus=1)(_build_oracle_shard)
        whole, sharded = [], []
        for args in pending:
            (sharded if args[5] > 1 else whole).append(args)
        futs = [file_task.remote(*args[:5]) for args in whole]
        shard_futs = []
        for (src_path, out_path, builder, columns, as_pandas, shards) in sharded:
            shard_futs.append((out_path, [
                shard_task.remote(src_path, builder, columns, as_pandas, i, shards)
                for i in range(shards)]))
        ray.get(futs)
        for out_path, parts in shard_futs:
            exp = pd.concat(ray.get(parts), ignore_index=True)
            tmp = f"{out_path}.tmp{os.getpid()}"
            pq_mod.write_table(pa.Table.from_pandas(exp, preserve_index=False), tmp)
            os.replace(tmp, out_path)
    else:  # never auto-init a ray session from inside the package
        for args in pending:
            _build_oracle_file(*args[:5])


def _materialized_oracle(path: str, name: str, builder,
                         columns=("doc_id", "ts_ns", "tokens"),
                         shards: int = 1) -> str:
    """Register (build-once, flushed in parallel) an expected-result parquet
    with ``builder(table) -> pandas.DataFrame`` over the sequences fixture
    and return a SQL passthrough — the seq_asof_sessions pattern: the
    oracle is computed single-process, independently of Ray's partitioning
    / batching / ordering, and the driver hash-compares the two paths."""
    import os

    out_path = os.path.join(path, f"_oracle_{name}.parquet")
    if not os.path.exists(out_path):
        _PENDING_ORACLES.append((path, out_path, builder, list(columns),
                                 False, shards))
    return f"SELECT * FROM read_parquet('{out_path}')"


def _spectral_expected(src: pa.Table):
    """Single-process reimplementation of the spectral row features
    (mean-centered zero-padded rfft periodogram, nfft=2048, inclusive band
    edges) — integer token sums make the centering bit-exact and pocketfft
    is batch-size-invariant, so no rounding is needed."""
    import pandas as pd

    nfft = 2048
    freqs = np.fft.rfftfreq(nfft)
    toks = src["tokens"]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.values.to_numpy(zero_copy_only=False)[off[0]: off[-1]].astype(np.float64)
    off = off - off[0]
    n = len(off) - 1
    cnt = np.diff(off)
    sums = np.add.reduceat(flat, off[:-1])
    sums[cnt == 0] = 0.0
    mean = np.where(cnt > 0, sums / np.maximum(cnt, 1), 0.0)
    mat = np.zeros((n, nfft))
    for i in range(n):
        m = min(cnt[i], nfft)
        mat[i, :m] = flat[off[i]: off[i] + m] - mean[i]
    spec = np.fft.rfft(mat, axis=1)
    psd = (np.abs(spec) ** 2) / nfft
    total = psd.sum(axis=1)
    out = {
        "doc_id": src["doc_id"].to_pandas(),
        "ts_ns": src["ts_ns"].to_pandas(),
        "spec_total_power": total,
    }
    for lo, hi in ((0.0, 0.1), (0.1, 0.25), (0.25, 0.5)):
        mask = (freqs >= lo) & (freqs <= hi)
        out[f"spec_power_{lo:g}_{hi:g}"] = psd[:, mask].sum(axis=1)
    out["spec_peak_freq"] = freqs[1:][np.argmax(psd[:, 1:], axis=1)]
    with np.errstate(invalid="ignore", divide="ignore"):
        p = psd / np.maximum(total[:, None], 1e-300)
        out["spec_entropy"] = -(np.where(p > 0, p * np.log(p), 0.0)).sum(axis=1)
    import pandas as pd

    return pd.DataFrame(out)


def _nonlinear_expected(src: pa.Table):
    """Single-process per-row evaluation of the nonlinear kernels (the same
    scalar functions the actor-pool stage calls row-by-row — independence
    here is the execution path: no Ray, no batching, no partitioning)."""
    import pandas as pd

    from pymhealth_ray.functions import information, rqa, timedom

    toks = src["tokens"]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lists = toks.to_pylist()
    n = len(lists)
    cols = {k: np.full(n, np.nan) for k in
            ("hurst", "dfa", "sampen", "recurrence_rate", "determinism")}
    for i, t in enumerate(lists):
        x = np.asarray(t[:128], dtype=np.float64)
        if len(x) < 66:
            continue
        cols["hurst"][i] = timedom.hurst(x)
        cols["dfa"][i] = timedom.dfa(x, windows=[4, 8, 16, 32])
        cols["sampen"][i] = information.sampen(x)
        r = rqa.rq(x, radius=np.std(x) * 0.2)
        cols["recurrence_rate"][i] = rqa.recurrence_rate(r)
        cols["determinism"][i] = rqa.determinism(r)
    out = {"doc_id": src["doc_id"].to_pandas(), "ts_ns": src["ts_ns"].to_pandas()}
    out.update(cols)
    return pd.DataFrame(out)


def sql_seq_spectral(path: str) -> str:
    return _materialized_oracle(path, "spectral_v1", _spectral_expected)


def sql_seq_nonlinear(path: str) -> str:
    return _materialized_oracle(path, "nonlinear_v1", _nonlinear_expected,
                                shards=16)


def _rpeaks_expected(src: pa.Table):
    """Single-process per-row Hamilton-Tompkins + HRV summary (the same
    scalar chain the actor pool runs; execution-path-independent oracle)."""
    import pandas as pd

    from pymhealth_ray.functions import heart
    from pymhealth_ray.functions import hrv as hrv_fns

    toks = src["tokens"]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lists = toks.to_pylist()
    n = len(lists)
    n_peaks = np.zeros(n, dtype=np.int64)
    cols = {k: np.full(n, np.nan) for k in ("mean_rr_ms", "sdnn_ms", "rmssd_ms", "pnn50")}
    fs = 100.0
    for i, t in enumerate(lists):
        x = np.asarray(t, dtype=np.float64)
        if len(x) < 64:
            continue
        try:
            peaks = heart.rpeaks_hamilton_tompkins(x, fs)
        except ValueError:
            continue
        n_peaks[i] = len(peaks)
        if len(peaks) >= 3:
            nni_ms = np.diff(peaks) * (1000.0 / fs)
            cols["mean_rr_ms"][i] = nni_ms.mean()
            cols["sdnn_ms"][i] = hrv_fns.sdnn(nni_ms)
            cols["rmssd_ms"][i] = hrv_fns.rmssd(nni_ms)
            cols["pnn50"][i] = hrv_fns.pnn50(nni_ms, unit="ms")
    out = {"doc_id": src["doc_id"].to_pandas(), "ts_ns": src["ts_ns"].to_pandas(),
           "n_peaks": n_peaks}
    out.update(cols)
    return pd.DataFrame(out)


def sql_seq_rpeaks(path: str) -> str:
    return _materialized_oracle(path, "rpeaks_v1", _rpeaks_expected,
                                shards=16)


def _docs_materialized_oracle(sf_dir: str, name: str, builder,
                              columns=("doc_id", "text")) -> str:
    """Materialized-oracle helper over the documents TABLE (not the
    sequences fixture): builder(texts_df) -> expected DataFrame, written
    once under the fixture cache, returned as a SQL passthrough."""
    import os

    import pyarrow.parquet as pq_mod

    from pymhealth_ray.sources.generate import fixture_dir_for

    out_dir = fixture_dir_for(sf_dir).rstrip("/") + "_docs_oracle"
    out_path = os.path.join(out_dir, f"{name}.parquet")
    if not os.path.exists(out_path):
        os.makedirs(out_dir, exist_ok=True)
        _PENDING_ORACLES.append((f"{sf_dir}/documents.parquet", out_path,
                                 builder, list(columns), True, 1))
    return f"SELECT * FROM read_parquet('{out_path}')"


def _simhash_expected(df):
    """Scalar round-1 SimHash (per-token md5 loop) — the semantic definition
    the vectorized batch implementation must reproduce bit-for-bit."""
    import pandas as pd

    masks = np.uint64(1) << np.arange(64, dtype=np.uint64)
    out = np.zeros(len(df), dtype=np.uint64)
    for i, t in enumerate(df.text.values):
        acc = np.zeros(64, dtype=np.int64)
        for w in t.split():
            h = np.uint64(int(hashlib.md5(w.encode("utf-8")).hexdigest()[:16], 16))
            acc += 2 * ((h & masks) != 0).astype(np.int64) - 1
        out[i] = ((acc > 0).astype(np.uint64) * masks).sum()
    return pd.DataFrame({"doc_id": df.doc_id.values, "simhash": out.astype(np.int64)})


def _minhash_pairs_expected(df):
    """Single-process banded MinHash-LSH (signatures via the same seeded
    hash family, but banding / bucketing / pair generation / verification
    all reimplemented driver-side with plain dicts — no Ray, no exchange,
    no join) producing (id_a, id_b, est_jaccard rounded to 4)."""
    import pandas as pd

    from pymhealth_ray.stages.dedup import MinHasher

    hasher = MinHasher()
    ids = df.doc_id.values.astype(np.int64)
    sigs = np.stack([hasher.signature(t) for t in df.text.values]).astype(np.uint64)
    bands, rows_per_band = 16, 4
    buckets: dict = {}
    for b in range(bands):
        for i in range(len(ids)):
            key = (b, sigs[i, b * rows_per_band:(b + 1) * rows_per_band].tobytes())
            buckets.setdefault(key, []).append(i)
    pairs = set()
    for members in buckets.values():
        for ai in range(len(members)):
            for bi in range(ai + 1, len(members)):
                x, y = ids[members[ai]], ids[members[bi]]
                if x != y:
                    pairs.add((min(x, y), max(x, y)))
    rows = []
    by_id = {int(ids[i]): i for i in range(len(ids))}
    for a, b in sorted(pairs):
        est = float((sigs[by_id[a]] == sigs[by_id[b]]).mean())
        if est >= 0.5:
            rows.append({"id_a": int(a), "id_b": int(b), "est_jaccard": round(est, 4)})
    return pd.DataFrame(rows, columns=["id_a", "id_b", "est_jaccard"])


def _langid_expected(df):
    """Driver-side row-at-a-time language-ID (same trigram profiles, no Ray
    actor pool / batching — execution-path-independent)."""
    import pandas as pd

    from pymhealth_ray.stages.text import LanguageId

    scorer = LanguageId()
    return pd.DataFrame({
        "doc_id": df.doc_id.values,
        "lang_pred": [scorer._score(t) for t in df.text.values],
    })


def q_embed_dupes(sf_dir: str):
    """Embedding-cosine near-dup pairs via random-hyperplane LSH buckets
    (stages/dedup.embedding_dupes) — oracle is the single-process
    reimplementation of the same bucketing, driver-hash-exact."""
    from pymhealth_ray.stages.dedup import embedding_dupes

    ds = read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    pairs = embedding_dupes(ds, cos_threshold=0.35, n_planes=6)
    return pairs.map_batches(lambda b: _round_cols(b, {"cosine": 4}), batch_format="pyarrow")


def _embed_dupes_expected(sf_dir: str):
    import pandas as pd
    import pyarrow.parquet as pq_mod

    src = pq_mod.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]).to_pandas()
    mat = np.stack(src.embedding.to_list()).astype(np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ids = src.vec_id.values.astype(np.int64)
    planes = np.random.default_rng(29).normal(size=(mat.shape[1], 6))
    keys = ((mat @ planes) > 0).astype(np.uint64)
    keys = (keys << np.arange(6, dtype=np.uint64)).sum(axis=1)
    buckets: dict = {}
    for i, k in enumerate(keys):
        buckets.setdefault(int(k), []).append(i)
    rows = []
    for members in buckets.values():
        for ai in range(len(members)):
            for bi in range(ai + 1, len(members)):
                i, j = members[ai], members[bi]
                c = float(mat[i] @ mat[j])
                if c >= 0.35:
                    a, b = sorted((int(ids[i]), int(ids[j])))
                    rows.append({"id_a": a, "id_b": b, "cosine": round(c, 4)})
    return pd.DataFrame(rows, columns=["id_a", "id_b", "cosine"])


def sql_embed_dupes(sf_dir: str) -> str:
    import os

    import pyarrow.parquet as pq_mod

    from pymhealth_ray.sources.generate import fixture_dir_for

    out_dir = fixture_dir_for(sf_dir).rstrip("/") + "_docs_oracle"
    out_path = os.path.join(out_dir, "embed_dupes_v2.parquet")
    if not os.path.exists(out_path):
        os.makedirs(out_dir, exist_ok=True)
        exp = _embed_dupes_expected(sf_dir)
        tmp = out_path + ".tmp"
        pq_mod.write_table(pa.Table.from_pandas(exp, preserve_index=False), tmp)
        os.replace(tmp, out_path)
    return f"SELECT * FROM read_parquet('{out_path}')"


# --------------------------------------------------------------------------
# round 2: multi-dim star joins over the small TPC-H dims (region/nation/
# supplier/part) — broadcast-compose the dimension chain once, annotate the
# fact stream map-side, partial+final aggregate (never shuffle the fact on
# a dim key).
# --------------------------------------------------------------------------


def q_region_revenue(sf_dir: str):
    """Q5-family star join: orders → customer → nation → region, revenue by
    region name. The three dims compose driver-side into ONE sorted
    (custkey → region_name) lookup broadcast via ray.put; the fact table
    streams through a single annotate+partial-agg pass."""
    import pyarrow.parquet as pq_mod

    orders = read_table(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    cust = pq_mod.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pq_mod.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    region = pq_mod.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])

    r_names = np.asarray(region["r_name"].to_pylist())
    r_keys = region["r_regionkey"].to_numpy().astype(np.int64)
    n_keys = nation["n_nationkey"].to_numpy().astype(np.int64)
    n_rkeys = nation["n_regionkey"].to_numpy().astype(np.int64)
    n_order = np.argsort(n_keys)
    c_keys = cust["c_custkey"].to_numpy().astype(np.int64)
    c_nkeys = cust["c_nationkey"].to_numpy().astype(np.int64)
    c_order = np.argsort(c_keys)
    # compose: custkey -> nationkey -> regionkey -> r_name
    r_order = np.argsort(r_keys)
    nat_rname = r_names[r_order[np.searchsorted(r_keys[r_order], n_rkeys)]]
    cust_rname = nat_rname[n_order[np.searchsorted(n_keys[n_order], c_nkeys[c_order])]]
    lookup_ref = ray.put((c_keys[c_order], cust_rname))

    def annotate(b: pa.Table) -> pa.Table:
        keys, rnames = ray.get(lookup_ref)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        name = rnames[np.searchsorted(keys, ck)]
        cents = np.rint(b["o_totalprice"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({
            "region_name": pa.array(name.tolist(), type=pa.string()),
            "rev_c": pa.array(cents),
        })

    agg = grouped_stats(orders.map_batches(annotate, batch_format="pyarrow"),
                        ["region_name"], sum_cols=["rev_c"], count_name="n_orders")

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "region_name": b["region_name"],
            "n_orders": b["n_orders"].cast(pa.int64()),
            "revenue_c": b["rev_c_sum"].cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_REGION_REVENUE = """
SELECT r_name AS region_name, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_part_brand_pricing(sf_dir: str):
    """Q14-family broadcast join: lineitem ⋈ part on partkey (part is the
    broadcast side), integer-cents revenue by brand — the small-side lookup
    precedent (reference:location/distance.py:36-44) over a fact stream."""
    import pyarrow.parquet as pq_mod

    li = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_partkey", "l_extendedprice", "l_discount"])
    part = pq_mod.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    p_keys = part["p_partkey"].to_numpy().astype(np.int64)
    p_brands = np.asarray(part["p_brand"].to_pylist())
    order = np.argsort(p_keys)
    lookup_ref = ray.put((p_keys[order], p_brands[order]))

    def annotate(b: pa.Table) -> pa.Table:
        keys, brands = ray.get(lookup_ref)
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        brand = brands[np.searchsorted(keys, pk)]
        price_c = np.rint(b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        disc_c = np.rint(b["l_discount"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({
            "p_brand": pa.array(brand.tolist(), type=pa.string()),
            "rev_u": pa.array(price_c * (100 - disc_c)),
        })

    agg = grouped_stats(li.map_batches(annotate, batch_format="pyarrow"),
                        ["p_brand"], sum_cols=["rev_u"], count_name="n_items")

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "p_brand": b["p_brand"],
            "n_items": b["n_items"].cast(pa.int64()),
            "revenue_u": b["rev_u_sum"].cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_PART_BRAND_PRICING = """
SELECT p_brand, count(*) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_u
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def q_supplier_nation_balance(sf_dir: str):
    """supplier ⋈ nation rollup (acctbal cents by nation name) — tiny-table
    path: whole-dim arrow compute, still expressed as a Dataset for sink
    compatibility."""
    import pyarrow.parquet as pq_mod

    sup = read_table(f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_acctbal"], blocks=2)
    nation = pq_mod.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    n_keys = nation["n_nationkey"].to_numpy().astype(np.int64)
    n_names = np.asarray(nation["n_name"].to_pylist())
    order = np.argsort(n_keys)
    lookup_ref = ray.put((n_keys[order], n_names[order]))

    def annotate(b: pa.Table) -> pa.Table:
        keys, names = ray.get(lookup_ref)
        nk = b["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.rint(b["s_acctbal"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({
            "n_name": pa.array(names[np.searchsorted(keys, nk)].tolist(), type=pa.string()),
            "bal_c": pa.array(cents),
        })

    agg = grouped_stats(sup.map_batches(annotate, batch_format="pyarrow"),
                        ["n_name"], sum_cols=["bal_c"], count_name="n_suppliers")

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": b["n_name"],
            "n_suppliers": b["n_suppliers"].cast(pa.int64()),
            "acctbal_c": b["bal_c_sum"].cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_SUPPLIER_NATION_BALANCE = """
SELECT n_name, count(*) AS n_suppliers,
       CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_c
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


# --------------------------------------------------------------------------
# round 2: distributed range (interval) join
# --------------------------------------------------------------------------

_RJ_BASE24 = 1704067200000000       # epoch us of 2024-01-01 (events domain)
_RJ_BASE95 = 788918400000000        # epoch us of 1995-01-01 (orders domain)
_RJ_SPAN = 2505600000000            # 29 days in us (events table span)
_RJ_LEN = 43200000000               # 12 h interval length in us


def q_events_orders_range_join(sf_dir: str):
    """Range join through stages.rangejoin: each event matched to every
    12-hour interval (derived deterministically from orders, remapped into
    the events' time domain) containing its timestamp. Exercises the
    chunk-replicated plan (time_chunk = interval length → each interval
    lands in <= 2 chunk groups); intervals per entity overlap heavily
    (o_custkey % 150 folds 10 custkeys onto each entity at sf0.1)."""
    from pymhealth_ray.stages.rangejoin import range_join

    ev = read_table(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"])
    orders = read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def mk_fact(b: pa.Table) -> pa.Table:
        return pa.table({
            "entity": b["user_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "event_id": b["event_id"],
        })

    def mk_intervals(b: pa.Table) -> pa.Table:
        od = b["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        start = _RJ_BASE24 + (od - _RJ_BASE95) % _RJ_SPAN
        ck = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "entity": pa.array(ck % 150),
            "start_us": pa.array(start),
            "end_us": pa.array(start + _RJ_LEN),
            "o_orderkey": b["o_orderkey"],
        })

    j = range_join(
        ev.map_batches(mk_fact, batch_format="pyarrow"),
        orders.map_batches(mk_intervals, batch_format="pyarrow"),
        entity_col="entity", ts_col="ts_us", start_col="start_us", end_col="end_us",
        join_type="inner", num_buckets=NB, time_chunk_us=_RJ_LEN,
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b["event_id"],
            "o_orderkey": b["o_orderkey"],
            "entity": b["entity"].cast(pa.int64()),
            "ts_us": b["ts_us"],
            "start_us": b["start_us"],
        })

    return j.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_ORDERS_RANGE_JOIN = """
WITH iv AS (
  SELECT o_orderkey, o_custkey % 150 AS entity,
         1704067200000000 + ((epoch_us(o_orderdate) - 788918400000000) % 2505600000000) AS start_us
  FROM orders
)
SELECT e.event_id, iv.o_orderkey, CAST(e.user_id AS BIGINT) AS entity,
       epoch_us(e.ts) AS ts_us, iv.start_us
FROM events e JOIN iv ON e.user_id = iv.entity
  AND epoch_us(e.ts) >= iv.start_us AND epoch_us(e.ts) < iv.start_us + 43200000000
"""


def q_docs_topk_chars(sf_dir: str):
    """Top-3 documents per (lang, source) by length through
    stages.aggregate.grouped_topk (map-side per-block top-k partials →
    bucket exchange → final top-k with rank), row_number semantics with
    doc_id tie-break."""
    from pymhealth_ray.stages.aggregate import grouped_topk

    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "lang", "source", "n_chars"])
    top = grouped_topk(docs, ["lang", "source"], "n_chars", k=3,
                       descending=True, tie_cols=["doc_id"], rank_name="rn",
                       num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "lang": b["lang"],
            "source": b["source"],
            "doc_id": b["doc_id"],
            "n_chars": b["n_chars"],
            "rn": b["rn"],
        })

    return top.map_batches(finish, batch_format="pyarrow")


SQL_DOCS_TOPK_CHARS = """
SELECT lang, source, doc_id, n_chars, rn FROM (
  SELECT lang, source, doc_id, n_chars,
         CAST(row_number() OVER (PARTITION BY lang, source
                                 ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rn
  FROM documents) t
WHERE rn <= 3
"""


def q_seq_quantiles(sf_dir: str):
    """Per-source EXACT quantiles of sequence length via
    stages.aggregate.grouped_quantiles (value-histogram combiner →
    one-searchsorted CDF readout; quantile_disc semantics)."""
    from pymhealth_ray.stages.aggregate import grouped_quantiles

    ds, _ = _seq_ds(sf_dir, ["source", "n_tok"])
    out = grouped_quantiles(ds, ["source"], "n_tok", qs=(0.25, 0.5, 0.75, 0.9),
                            num_buckets=NB, count_name="n")

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "source": b["source"],
            "q25": b["q25"].cast(pa.int64()),
            "q50": b["q50"].cast(pa.int64()),
            "q75": b["q75"].cast(pa.int64()),
            "q90": b["q90"].cast(pa.int64()),
            "n": b["n"],
        })

    return out.map_batches(finish, batch_format="pyarrow")


def sql_seq_quantiles(path: str) -> str:
    return f"""
SELECT source,
       CAST(quantile_disc(n_tok, 0.25) AS BIGINT) AS q25,
       CAST(quantile_disc(n_tok, 0.5) AS BIGINT) AS q50,
       CAST(quantile_disc(n_tok, 0.75) AS BIGINT) AS q75,
       CAST(quantile_disc(n_tok, 0.9) AS BIGINT) AS q90,
       count(*) AS n
FROM read_parquet('{path}/part-*.parquet') GROUP BY source
"""


def q_docs_approx_distinct(sf_dir: str):
    """Mergeable-HLL approximate distinct texts per language
    (stages.sketch). Register max-merge is order-free, so the distributed
    result is bit-identical to the single-process reference the
    materialized oracle runs — an exactness check on an approximate
    operator."""
    from pymhealth_ray.stages.sketch import grouped_approx_distinct

    docs = read_table(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
    out = grouped_approx_distinct(docs, ["lang"], "text", num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "lang": b["lang"],
            "approx_distinct": b["approx_distinct"],
            "n_rows": b["n_rows"],
        })

    return out.map_batches(finish, batch_format="pyarrow")


def _hll_expected_docs(df):
    from pymhealth_ray.stages.sketch import hll_expected

    exp = hll_expected(df.text.values, df.lang.values)
    return exp.rename(columns={"g": "lang", "est": "approx_distinct",
                               "n": "n_rows"})


def q_docs_split_sample(sf_dir: str):
    """Deterministic keyed sampling + train/eval split (stages.sample):
    keep ~50% of documents by doc_id hash, label ~10% of the kept set as
    eval — map-only, rerun-stable, and exactly reproducible in SQL (the
    oracle runs the same md5-prefix predicate)."""
    from pymhealth_ray.stages.sample import hash_sample, split_train_eval

    docs = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    kept = hash_sample(docs, "doc_id", 0.5, salt="k")
    out = split_train_eval(kept, "doc_id", eval_fraction=0.1, salt="s")

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"],
            "lang": b["lang"],
            "split": b["split"],
        })

    return out.map_batches(finish, batch_format="pyarrow")


SQL_DOCS_SPLIT_SAMPLE = """
SELECT doc_id, lang,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || '-s'), 1, 8) < '19999999'
            THEN 'eval' ELSE 'train' END AS split
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR) || '-k'), 1, 8) < '80000000'
"""


def q_docs_top_tokens(sf_dir: str):
    """Corpus vocabulary top-50 (stages.vocab): Arrow-kernel tokenize +
    count inside each block, token-hash bucket merge, map-side top-k
    pruning — the canonical wordcount, zero Python token loops."""
    from pymhealth_ray.stages.vocab import top_tokens

    docs = read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    return top_tokens(docs, k=50, num_buckets=NB)


SQL_DOCS_TOP_TOKENS = """
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
cnt AS (SELECT tok, count(*) AS c FROM toks WHERE tok <> '' GROUP BY tok)
SELECT tok, c, rn FROM (
  SELECT tok, c,
         CAST(row_number() OVER (ORDER BY c DESC, tok) AS BIGINT) AS rn
  FROM cnt) t
WHERE rn <= 50
"""


def q_seq_pack(sf_dir: str):
    """Greedy sequence packing into 2048-token training examples
    (stages.pack): deterministic bucket+sort order makes the distributed
    summary bit-identical to the single-process reference the materialized
    oracle runs."""
    from pymhealth_ray.stages.pack import pack_sequences

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "n_tok"])
    return pack_sequences(ds, max_len=2048, num_buckets=NB)


def _pack_expected_seq(src: pa.Table):
    from pymhealth_ray.stages.pack import pack_expected

    return pack_expected(
        src["doc_id"].to_numpy(zero_copy_only=False),
        src["ts_ns"].to_numpy(zero_copy_only=False),
        src["n_tok"].to_numpy(zero_copy_only=False),
        max_len=2048, num_buckets=NB,
    )


def q_docs_dedup_clusters(sf_dir: str):
    """Near-dup CLUSTERS: MinHash-LSH verified pairs → distributed
    min-label connected components (stages.graph) → (doc_id, cluster_id =
    min doc of the component). The full dedup decision: keep cluster_id,
    drop the rest."""
    from pymhealth_ray.stages.graph import connected_components

    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pairs = minhash_lsh_dupes(ds, jaccard_threshold=0.5)
    labels = connected_components(pairs, "id_a", "id_b", num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b["v"], "cluster_id": b["l"]})

    return labels.map_batches(finish, batch_format="pyarrow")


def q_docs_cluster_size_hist(sf_dir: str):
    """Dedup analytics #2: the near-dup CLUSTER-SIZE distribution —
    (cluster_size, n_clusters) including the size-1 row for documents in
    no pair. What a curation run reads to pick keep-best vs drop-all
    policies. Sizes come from one tiny groupby over the CC labels; the
    singleton count is total-docs − labeled-docs (two scalars)."""
    from pymhealth_ray.stages.graph import connected_components

    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    n_docs = docs.count()
    pairs = minhash_lsh_dupes(docs, jaccard_threshold=0.5)
    labels = connected_components(pairs, "id_a", "id_b", num_buckets=NB)
    sizes = labels.groupby("l").count()
    hist: dict = {}
    n_labeled = 0
    for t in sizes.iter_batches(batch_format="pyarrow"):
        for c in t["count()"].to_pylist():
            hist[c] = hist.get(c, 0) + 1
            n_labeled += c
    hist[1] = hist.get(1, 0) + (n_docs - n_labeled)
    ks = sorted(hist)
    return ray.data.from_arrow(pa.table({
        "cluster_size": pa.array(ks, type=pa.int64()),
        "n_clusters": pa.array([hist[k] for k in ks], type=pa.int64()),
    }))


def _cluster_size_hist_expected(df):
    import pandas as pd

    clusters = _dedup_clusters_expected(df)
    sizes = clusters.groupby("cluster_id").size()
    hist = sizes.value_counts().to_dict()
    hist[1] = hist.get(1, 0) + (len(df) - len(clusters))
    ks = sorted(hist)
    return pd.DataFrame({
        "cluster_size": np.array(ks, dtype=np.int64),
        "n_clusters": np.array([hist[k] for k in ks], dtype=np.int64),
    })


def _dedup_clusters_expected(df):
    """Single-process union-find over the single-process LSH pairs."""
    import pandas as pd

    pairs = _minhash_pairs_expected(df)
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs.id_a.values, pairs.id_b.values):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted(set(pairs.id_a.tolist()) | set(pairs.id_b.tolist()))
    return pd.DataFrame({
        "doc_id": np.array(nodes, dtype=np.int64),
        "cluster_id": np.array([find(n) for n in nodes], dtype=np.int64),
    })


def q_docs_sample_per_lang(sf_dir: str):
    """Deterministic 5-doc uniform sample per language
    (stages.sample.grouped_sample_k): md5-priority ranking through the
    grouped top-k machinery — rerun-stable and SQL-reproducible."""
    from pymhealth_ray.stages.sample import grouped_sample_k

    docs = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    out = grouped_sample_k(docs, ["lang"], "doc_id", k=5, salt="g",
                           num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "lang": b["lang"],
            "doc_id": b["doc_id"],
            "rn": b["rn"],
        })

    return out.map_batches(finish, batch_format="pyarrow")


SQL_DOCS_SAMPLE_PER_LANG = """
SELECT lang, doc_id, rn FROM (
  SELECT lang, doc_id,
         CAST(row_number() OVER (
            PARTITION BY lang
            ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || '-g'), 1, 16),
                     doc_id) AS BIGINT) AS rn
  FROM documents) t
WHERE rn <= 5
"""


def q_orders_bloom_semi(sf_dir: str):
    """Broadcast Bloom semi-join (stages.bloom): index event user_ids once
    (distributed two-level OR-merge build — bit-identical to the
    single-process oracle build because OR is order-free), then keep orders
    whose custkey may be an active user — no shuffle of either table."""
    from pymhealth_ray.stages.bloom import build_bloom, filter_against_bloom

    ev = read_table(f"{sf_dir}/events.parquet", columns=["user_id"])
    bloom = build_bloom(ev, "user_id", n_bits=1 << 16, k=5)
    bloom_ref = ray.put(bloom)
    orders = read_table(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    out = filter_against_bloom(orders, "o_custkey", bloom_ref, k=5,
                               keep_members=True)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "o_custkey": b["o_custkey"]})

    return out.map_batches(finish, batch_format="pyarrow")


def _orders_bloom_semi_oracle(sf_dir: str) -> str:
    """Materialized oracle: single-process bitmap over the same keys, same
    membership test, written once per sf dir."""
    import os

    import pyarrow.parquet as pq_mod

    from pymhealth_ray.sources.generate import fixture_dir_for
    from pymhealth_ray.stages.bloom import _bitmap_of, bloom_contains

    out_dir = fixture_dir_for(sf_dir).rstrip("/") + "_docs_oracle"
    out_path = os.path.join(out_dir, "bloom_semi_v1.parquet")
    if not os.path.exists(out_path):
        os.makedirs(out_dir, exist_ok=True)
        ev = pq_mod.read_table(f"{sf_dir}/events.parquet", columns=["user_id"])
        bm = _bitmap_of(ev["user_id"].combine_chunks(), 1 << 16, 5)
        orders = pq_mod.read_table(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])
        hit = bloom_contains(bm, orders["o_custkey"].combine_chunks(), 5)
        exp = orders.filter(pa.array(hit))
        tmp = out_path + ".tmp"
        pq_mod.write_table(exp, tmp)
        os.replace(tmp, out_path)
    return f"SELECT * FROM read_parquet('{out_path}')"


def q_docs_decontam(sf_dir: str):
    """Eval-set decontamination (stages.decontam): split documents with the
    same hash predicate as docs_split_sample, compress the TRAIN side's
    char-16-gram set into a broadcast Bloom bitmap (distributed order-free
    OR build), and score each EVAL doc's contamination fraction map-only."""
    from pymhealth_ray.stages.decontam import (build_shingle_bloom,
                                               contamination_scores)
    from pymhealth_ray.stages.sample import split_train_eval

    docs = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    labeled = split_train_eval(docs, "doc_id", eval_fraction=0.1, salt="s")

    def side(which):
        def fn(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b["split"], which)).drop_columns(["split"])
        return fn

    train = labeled.map_batches(side("train"), batch_format="pyarrow")
    ev = labeled.map_batches(side("eval"), batch_format="pyarrow")
    bm = build_shingle_bloom(train, n_bits=1 << 20)
    return contamination_scores(ev, ray.put(bm))


def _decontam_expected_docs(df):
    """Single-process identical computation (bloom OR is order-free, so the
    bitmaps agree bit-for-bit)."""
    import pandas as pd

    from pymhealth_ray.stages.bloom import _bit_positions
    from pymhealth_ray.stages.decontam import _hash_pair_u64, _shingle_bitmap
    from pymhealth_ray.stages.dedup import _shingle_hashes
    from pymhealth_ray.stages.sample import _hex8, _threshold_hex

    thr = _threshold_hex(0.1)
    is_eval = _hex8(pa.array(df.doc_id.values), "s") < thr
    n_bits, kh = 1 << 20, 5
    bm = _shingle_bitmap(df.text.values[~is_eval].tolist(), 16, n_bits, kh)
    rows = []
    for did, text in zip(df.doc_id.values[is_eval], df.text.values[is_eval]):
        sh = _shingle_hashes(text, 16)
        h1, h2 = _hash_pair_u64(sh)
        pos = _bit_positions(h1, h2, n_bits, kh)
        hits = ((bm[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1).all(axis=1)
        rows.append((int(did), len(sh),
                     round(float(hits.mean()) if len(sh) else 0.0, 6)))
    return pd.DataFrame(rows, columns=["doc_id", "n_shingles", "contamination"])


def q_lineitem_profile(sf_dir: str):
    """One-pass per-column profile of lineitem (stages.profile): row/null
    counts + exact min/max, one partial row per column per block."""
    from pymhealth_ray.stages.profile import profile_table

    cols = ["l_orderkey", "l_quantity", "l_extendedprice", "l_discount",
            "l_returnflag", "l_linestatus"]
    ds = read_table(f"{sf_dir}/lineitem.parquet", columns=cols)
    return profile_table(ds, columns=cols)


SQL_LINEITEM_PROFILE = """
SELECT 'l_orderkey' AS col, count(*) AS n_rows, count(*) - count(l_orderkey) AS n_null,
       CAST(min(l_orderkey) AS DOUBLE) AS min_num, CAST(max(l_orderkey) AS DOUBLE) AS max_num,
       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM lineitem
UNION ALL
SELECT 'l_quantity', count(*), count(*) - count(l_quantity),
       min(l_quantity), max(l_quantity), NULL, NULL FROM lineitem
UNION ALL
SELECT 'l_extendedprice', count(*), count(*) - count(l_extendedprice),
       min(l_extendedprice), max(l_extendedprice), NULL, NULL FROM lineitem
UNION ALL
SELECT 'l_discount', count(*), count(*) - count(l_discount),
       min(l_discount), max(l_discount), NULL, NULL FROM lineitem
UNION ALL
SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
       NULL, NULL, min(l_returnflag), max(l_returnflag) FROM lineitem
UNION ALL
SELECT 'l_linestatus', count(*), count(*) - count(l_linestatus),
       NULL, NULL, min(l_linestatus), max(l_linestatus) FROM lineitem
"""


def q_docs_prep_pipeline(sf_dir: str):
    """THE composed training-data prep pipeline — every dedup/curation
    stage interoperating end-to-end: quality filter (n_chars >= 100) →
    exact dedup (min doc per md5) → near-dup CLUSTER drop (MinHash-LSH
    pairs → connected components → keep each component's min doc) →
    deterministic 90/10 train/eval split → greedy packing of est_tok =
    len(text)//4 into 2048-token examples per split. Output: one row per
    surviving doc with its split and pack assignment. The non-canonical
    drop set is broadcast (bounded by the verified-pair node count — the
    LSH bucket caps bound it, same class as the hot-key broadcast).

    The chain itself lives in :func:`pipelines.prep.corpus_prep` (also the
    ``tools/run_prep_job.py`` ray-job entrypoint)."""
    from pymhealth_ray.pipelines.prep import corpus_prep

    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text", "n_chars"])
    return corpus_prep(docs, min_chars=100, jaccard_threshold=0.5,
                       eval_fraction=0.1, salt="s", max_len=2048,
                       num_buckets=NB)


def q_docs_prep_bloom(sf_dir: str):
    """The SAME composed prep chain as docs_prep_pipeline, with the
    cluster-drop step FORCED onto dropset's above-threshold plan
    (broadcast_threshold=0 → bloom-prefiltered co-partitioned anti-join
    instead of the small-set broadcast). Exact under either plan — the
    shared oracle closes the loop the plan-equality pytest opened:
    the 100-TB drop-set path is now itself driver-gated end-to-end."""
    from pymhealth_ray.pipelines.prep import corpus_prep

    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text", "n_chars"])
    return corpus_prep(docs, min_chars=100, jaccard_threshold=0.5,
                       eval_fraction=0.1, salt="s", max_len=2048,
                       num_buckets=NB, drop_broadcast_threshold=0)


def _prep_expected_docs(df):
    """Single-process replication of the whole prep chain (every stage is
    deterministic and partitioning-invariant, so the driver hash-compares
    the two paths exactly)."""
    import hashlib as _hl

    import pandas as pd

    from pymhealth_ray.stages.pack import pack_assignments_for_bucket
    from pymhealth_ray.stages.partition import _stable_bucket_of
    from pymhealth_ray.stages.sample import _hex8, _threshold_hex

    df = df[df.n_chars >= 100][["doc_id", "text"]].reset_index(drop=True)
    dig = df.text.map(lambda t: _hl.md5(str(t).encode("utf-8")).hexdigest())
    minid = df.groupby(dig.values).doc_id.transform("min")
    df = df[df.doc_id == minid].reset_index(drop=True)

    pairs = _minhash_pairs_expected(df)
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs.id_a.values, pairs.id_b.values):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    drop = {n for n in set(pairs.id_a.tolist()) | set(pairs.id_b.tolist())
            if find(n) != n}
    df = df[~df.doc_id.isin(drop)].reset_index(drop=True)

    thr = _threshold_hex(0.1)
    is_eval = _hex8(pa.array(df.doc_id.values), "s") < thr
    split = np.where(is_eval.astype(bool), "eval", "train")
    est_tok = df.text.str.len().values.astype(np.int64) // 4
    buckets = np.asarray(_stable_bucket_of(pa.array(df.doc_id.values), NB))
    frames = []
    for sp in ("train", "eval"):
        m = split == sp
        for b in np.unique(buckets[m]):
            mm = m & (buckets == b)
            tbl = pa.table({
                "doc_id": pa.array(df.doc_id.values[mm]),
                "z": pa.array(np.zeros(int(mm.sum()), dtype=np.int64)),
                "est_tok": pa.array(est_tok[mm]),
                "split": pa.array([sp] * int(mm.sum()), type=pa.string()),
            })
            frames.append(pack_assignments_for_bucket(
                tbl, int(b), "doc_id", "z", "est_tok", 2048).to_pandas())
    out = pd.concat(frames, ignore_index=True)
    return out[["doc_id", "split", "est_tok", "pack_id"]]


def q_docs_simhash_dupes(sf_dir: str):
    """SimHash Hamming-ball near-dup pairs (stages.dedup.simhash_dupes):
    banded exact-match candidates (pigeonhole-complete for hamming <=
    bands-1), in-bucket vectorized XOR popcount verification."""
    from pymhealth_ray.stages.dedup import simhash_dupes

    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_dupes(ds, max_hamming=3, num_bands=4, num_buckets=NB)


def _simhash_dupes_expected(df):
    """Single-process banded Hamming search over the scalar-reference
    signatures (same banding, cap, and popcount as the engine)."""
    import pandas as pd

    from pymhealth_ray.stages.dedup import _POP8

    sig_df = _simhash_expected(df)
    ids = sig_df.doc_id.values.astype(np.int64)
    sig = sig_df.simhash.values.view(np.uint64)
    order = np.argsort(ids)
    ids, sig = ids[order], sig[order]
    band_bits, num_bands, max_h, cap = 16, 4, 3, 512
    mask = np.uint64((1 << band_bits) - 1)
    pairs = set()
    for band in range(num_bands):
        bb = (sig >> np.uint64(band * band_bits)) & mask
        groups: dict = {}
        for i, k in enumerate(bb.tolist()):
            groups.setdefault(k, []).append(i)
        for members in groups.values():
            members = members[:cap]  # ids already sorted ascending
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    i, j = members[x], members[y]
                    xr = np.uint64(sig[i] ^ sig[j])
                    h = int(_POP8[np.frombuffer(xr.tobytes(), dtype=np.uint8)].sum())
                    if h <= max_h:
                        pairs.add((int(ids[i]), int(ids[j]), h))
    out = sorted(pairs)
    return pd.DataFrame(out, columns=["id_a", "id_b", "hamming"])


def q_docs_redact(sf_dir: str):
    """Regex redaction (stages.text.redact): RE2 replace + match count per
    doc — Arrow and DuckDB share the RE2 engine, so the oracle is the
    literal same regex in SQL."""
    from pymhealth_ray.stages.text import redact

    docs = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = redact(docs, pattern=r"\b(spark|hash|vector)\b",
                 replacement="<TOOL>")

    def finish(b: pa.Table) -> pa.Table:
        red = b["redacted"]
        if isinstance(red, pa.ChunkedArray):
            red = red.combine_chunks()
        md5s = [hashlib.md5(t.encode()).hexdigest() for t in red.to_pylist()]
        return pa.table({
            "doc_id": b["doc_id"],
            "red_md5": pa.array(md5s, type=pa.string()),
            "n_redactions": b["n_redactions"],
        })

    return out.map_batches(finish, batch_format="pyarrow")


SQL_DOCS_REDACT = r"""
SELECT doc_id,
       md5(regexp_replace(text, '\b(spark|hash|vector)\b', '<TOOL>', 'g')) AS red_md5,
       CAST(len(regexp_extract_all(text, '\b(spark|hash|vector)\b')) AS BIGINT) AS n_redactions
FROM documents
"""


def q_seq_weighted_sample(sf_dir: str):
    """Token-weighted 50-per-source sample of sequences
    (stages.sample.grouped_weighted_sample_k, Efraimidis-Spirakis with
    keyed uniforms): longer sequences proportionally more likely, sample
    identical on every rerun and cluster size."""
    from pymhealth_ray.stages.sample import grouped_weighted_sample_k

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "n_tok", "source"])

    def with_rid(b: pa.Table) -> pa.Table:
        rid = pc.binary_join_element_wise(
            b["doc_id"], pc.cast(b["ts_ns"], pa.string()), ":")
        wt = b["n_tok"].to_numpy(zero_copy_only=False).astype(np.float64) + 1.0
        t = b.append_column("rid", rid)
        return t.append_column("wt", pa.array(wt))

    out = grouped_weighted_sample_k(
        ds.map_batches(with_rid, batch_format="pyarrow"),
        ["source"], "rid", "wt", k=50, salt="w", num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "source": b["source"],
            "doc_id": b["doc_id"],
            "ts_ns": b["ts_ns"],
            "n_tok": b["n_tok"],
            "rn": b["rn"],
        })

    return out.map_batches(finish, batch_format="pyarrow")


def _weighted_sample_expected(src: pa.Table):
    """Single-process A-ES with the identical keyed uniforms and float
    ops — priorities are bit-equal, so the sampled set and ranks match."""
    import pandas as pd

    from pymhealth_ray.stages.sample import _hexn

    did = np.asarray(src["doc_id"].to_pylist())
    ts = src["ts_ns"].to_numpy(zero_copy_only=False).astype(np.int64)
    ntok = src["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
    source = np.asarray(src["source"].to_pylist())
    rid = np.array([f"{d}:{t}" for d, t in zip(did, ts)], dtype=object)
    u_hex = _hexn(pa.array(rid.tolist(), type=pa.string()), "w", 16)
    u = np.array([int(h, 16) for h in u_hex], dtype=np.uint64)
    uf = (u.astype(np.float64) + 1.0) / 18446744073709551618.0
    wv = ntok.astype(np.float64) + 1.0
    pri = -np.log(uf) / wv
    df = pd.DataFrame({"source": source, "doc_id": did, "ts_ns": ts,
                       "n_tok": ntok, "rid": rid, "pri": pri})
    out = (df.sort_values(["pri", "rid"]).groupby("source", sort=False).head(50)
             .copy())
    out["rn"] = out.groupby("source", sort=False).cumcount() + 1
    return out[["source", "doc_id", "ts_ns", "n_tok", "rn"]].reset_index(drop=True)


def q_lineitem_cms_counts(sf_dir: str):
    """Count-min frequency sketch (stages.sketch.build_count_min): build
    over lineitem's partkey stream (distributed +-merge, bit-identical for
    any block layout), then estimate each part's line count map-only
    against the broadcast sketch. Estimates are one-sided (>= true)."""
    from pymhealth_ray.stages.sketch import build_count_min, count_min_estimate

    li = read_table(f"{sf_dir}/lineitem.parquet", columns=["l_partkey"])
    cms = build_count_min(li, "l_partkey", width=1 << 14, depth=4)
    cms_ref = ray.put(cms)
    parts = read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"])

    def estimate(b: pa.Table) -> pa.Table:
        m = ray.get(cms_ref)
        pk = b["p_partkey"]
        if isinstance(pk, pa.ChunkedArray):
            pk = pk.combine_chunks()
        est = count_min_estimate(m, pk)
        return pa.table({"p_partkey": pk, "est_lines": pa.array(est)})

    return parts.map_batches(estimate, batch_format="pyarrow")


def _cms_counts_oracle(sf_dir: str) -> str:
    """Materialized oracle: single-process sketch over the same stream —
    +-merge is order-free, so the counters agree bit-for-bit."""
    import os

    import pyarrow.parquet as pq_mod

    from pymhealth_ray.sources.generate import fixture_dir_for
    from pymhealth_ray.stages.sketch import _cms_rows, count_min_estimate

    out_dir = fixture_dir_for(sf_dir).rstrip("/") + "_docs_oracle"
    out_path = os.path.join(out_dir, "cms_counts_v1.parquet")
    if not os.path.exists(out_path):
        os.makedirs(out_dir, exist_ok=True)
        li = pq_mod.read_table(f"{sf_dir}/lineitem.parquet", columns=["l_partkey"])
        cms = _cms_rows(li["l_partkey"].combine_chunks(), 1 << 14, 4)
        parts = pq_mod.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"])
        pk = parts["p_partkey"].combine_chunks()
        est = count_min_estimate(cms, pk)
        tmp = out_path + ".tmp"
        pq_mod.write_table(pa.table({"p_partkey": pk, "est_lines": pa.array(est)}), tmp)
        os.replace(tmp, out_path)
    return f"SELECT * FROM read_parquet('{out_path}')"


def _docs_media_table(b: pa.Table) -> pa.Table:
    """Deterministic media table derived from documents: payload = utf-8
    text bytes, dimensions derived from doc_id."""
    did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table({
        "doc_id": b["doc_id"],
        "payload": b["text"].cast(pa.binary()),
        "width": pa.array((16 + did % 32).astype(np.int32)),
        "height": pa.array((16 + (did // 7) % 32).astype(np.int32)),
    })


def q_docs_media_decode(sf_dir: str):
    """Multimodal decode plumbing under the driver gate: documents' bytes
    as opaque payloads → actor-pool fake decode (codec stubbed, everything
    around it real: per-actor init, byte-sized batches, block-mean thumb
    pooling, payload dropped after decode) → per-doc pixel stats. The
    decode is payload-deterministic, so the oracle reuses the SAME
    ImageDecoder class single-process."""
    from pymhealth_ray.stages.multimodal import decode_images

    docs = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    media = docs.map_batches(_docs_media_table, batch_format="pyarrow")
    dec = decode_images(media, decoder="fake", thumb=8)

    def finish(b: pa.Table) -> pa.Table:
        tv = b["thumb_vec"]
        if isinstance(tv, pa.ChunkedArray):
            tv = tv.combine_chunks()
        mat = np.asarray(tv.values.to_numpy(zero_copy_only=False)).reshape(b.num_rows, -1)
        return pa.table({
            "doc_id": b["doc_id"],
            "pixel_mean": pa.array(np.round(
                b["pixel_mean"].to_numpy(zero_copy_only=False), 6)),
            "thumb_norm": pa.array(np.round(np.linalg.norm(mat, axis=1), 6)),
        })

    return dec.map_batches(finish, batch_format="pyarrow")


def _media_decode_expected(df):
    """Single-process pass through the same decoder class."""
    import pandas as pd

    from pymhealth_ray.stages.multimodal import ImageDecoder

    src = pa.table({"doc_id": pa.array(df.doc_id.values),
                    "text": pa.array(df.text.values)})
    media = _docs_media_table(src)
    out = ImageDecoder(decoder="fake", thumb=8)(media)
    tv = out["thumb_vec"]
    if isinstance(tv, pa.ChunkedArray):
        tv = tv.combine_chunks()
    mat = np.asarray(tv.values.to_numpy(zero_copy_only=False)).reshape(out.num_rows, -1)
    return pd.DataFrame({
        "doc_id": out["doc_id"].to_numpy(zero_copy_only=False),
        "pixel_mean": np.round(out["pixel_mean"].to_numpy(zero_copy_only=False), 6),
        "thumb_norm": np.round(np.linalg.norm(mat, axis=1), 6),
    })


# --------------------------------------------------------------------------
# deterministic global shuffle (training-example order)
# --------------------------------------------------------------------------


def q_docs_shuffle_order(sf_dir: str):
    """Reproducible global training order: every document's exact position
    in the keyed-hash shuffled permutation (stages/shuffle.py — one narrow
    exchange, range-bucketed by md5-priority prefix, O(num_buckets) driver
    state). The same permutation any engine derives from
    ``row_number() OVER (ORDER BY substr(md5(key||'-'||salt),1,16), key)``."""
    from pymhealth_ray.stages.shuffle import shuffle_positions

    docs = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    return shuffle_positions(docs, "doc_id", salt="tr1", num_buckets=NB,
                             extra_cols=["lang"])


SQL_DOCS_SHUFFLE_ORDER = """
SELECT doc_id, lang,
       row_number() OVER (
           ORDER BY substr(md5(cast(doc_id AS varchar) || '-tr1'), 1, 16),
                    doc_id) - 1 AS pos
FROM documents
"""


# --------------------------------------------------------------------------
# Gopher-style quality rules
# --------------------------------------------------------------------------


def q_docs_gopher_quality(sf_dir: str):
    """Gopher repetition/quality rules (stages/gopher.py): word stats,
    alphabetic/stopword coverage, symbol ratio, bullet/ellipsis/dup-line
    fractions and the combined keep verdict — every signal an exact
    int/int double, bit-equal to the SQL oracle."""
    from pymhealth_ray.stages.gopher import gopher_quality

    docs = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return gopher_quality(docs)


SQL_DOCS_GOPHER_QUALITY = r"""
WITH base AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\s+'), w -> w <> '') AS words,
    string_split(text, chr(10)) AS lines,
    (length(text) - length(replace(text, '#', '')))
      + (length(text) - length(replace(text, '...', ''))) // 3 AS n_sym
  FROM documents
), agg AS (
  SELECT doc_id,
    len(words) AS n_words, len(lines) AS n_lines, n_sym,
    coalesce(list_sum(list_transform(words, w -> length(w))), 0) AS sum_wlen,
    len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha,
    len(list_filter(words, w -> lower(w) IN
        ('the','be','to','of','and','that','have','with'))) AS n_stop,
    len(list_filter(lines, l -> l LIKE '- %' OR l LIKE '* %' OR l LIKE '• %')) AS n_bullet,
    len(list_filter(lines, l -> l LIKE '%...' OR l LIKE '%…')) AS n_ellip,
    len(list_distinct(lines)) AS n_dlines
  FROM base
)
SELECT doc_id, n_words,
  CASE WHEN n_words > 0 THEN sum_wlen / n_words ELSE 0.0 END AS mean_word_len,
  CASE WHEN n_words > 0 THEN n_alpha / n_words ELSE 0.0 END AS frac_alpha_words,
  n_stop AS stopword_count,
  CASE WHEN n_words > 0 THEN n_sym / n_words ELSE 0.0 END AS symbol_word_ratio,
  CASE WHEN n_lines > 0 THEN n_bullet / n_lines ELSE 0.0 END AS frac_lines_bullet,
  CASE WHEN n_lines > 0 THEN n_ellip / n_lines ELSE 0.0 END AS frac_lines_ellipsis,
  CASE WHEN n_lines > 0 THEN 1 - n_dlines / n_lines ELSE 0.0 END AS dup_line_frac,
  (n_words BETWEEN 50 AND 100000)
   AND (CASE WHEN n_words > 0 THEN sum_wlen / n_words ELSE 0.0 END BETWEEN 3.0 AND 10.0)
   AND (CASE WHEN n_words > 0 THEN n_alpha / n_words ELSE 0.0 END >= 0.8)
   AND n_stop >= 2
   AND (CASE WHEN n_words > 0 THEN n_sym / n_words ELSE 0.0 END <= 0.1)
   AND (CASE WHEN n_lines > 0 THEN n_bullet / n_lines ELSE 0.0 END <= 0.9)
   AND (CASE WHEN n_lines > 0 THEN n_ellip / n_lines ELSE 0.0 END <= 0.3) AS keep
FROM agg
"""


# --------------------------------------------------------------------------
# token-native n-gram vocabulary
# --------------------------------------------------------------------------


def q_seq_top_bigrams(sf_dir: str):
    """Top-25 token BIGRAMS over the tokens:list<int32> column — the
    tokens-payload-native analog of docs_top_tokens (stages/vocab.py
    ngram machinery: within-row adjacency off the list offsets, int64
    packed codes, per-block distinct partials, map-side top-k pruning)."""
    from pymhealth_ray.stages.vocab import top_ngrams

    ds, _ = _seq_ds(sf_dir, ["tokens"])
    return top_ngrams(ds, tokens_col="tokens", n=2, k=25, num_buckets=NB)


def sql_seq_top_bigrams(path: str) -> str:
    return f"""
SELECT t1, t2, count(*) AS c,
       row_number() OVER (ORDER BY count(*) DESC, t1, t2) AS rn
FROM (SELECT tokens[i] AS t1, tokens[i+1] AS t2
      FROM read_parquet('{path}/part-*.parquet'),
           LATERAL unnest(generate_series(1, len(tokens)-1)) AS u(i))
GROUP BY t1, t2 ORDER BY c DESC, t1, t2 LIMIT 25
"""


# --------------------------------------------------------------------------
# context-window chunking
# --------------------------------------------------------------------------


def q_seq_chunks(sf_dir: str):
    """Fixed-window chunking of every token sequence (max_len=48,
    stride=32 — overlapping context windows), map-only explode off the
    Arrow list offsets (stages/chunk.py). Summary columns keep the oracle
    list-free: per-chunk length, exact int64 token sum, first/last token."""
    from pymhealth_ray.stages.chunk import chunk_tokens

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "tokens"])
    return chunk_tokens(ds, max_len=48, stride=32)


def sql_seq_chunks(path: str) -> str:
    return f"""
WITH s AS (SELECT doc_id, ts_ns, tokens, len(tokens) AS n
           FROM read_parquet('{path}/part-*.parquet')),
c AS (SELECT doc_id, ts_ns, tokens, n, i AS chunk_id,
             tokens[i * 32 + 1 : least(i * 32 + 48, n)] AS chunk
      FROM s, LATERAL unnest(generate_series(0, (n - 1) // 32)) AS u(i))
SELECT doc_id, ts_ns, chunk_id,
       CAST(len(chunk) AS BIGINT) AS n_chunk,
       CAST(list_aggregate(chunk, 'sum') AS BIGINT) AS tok_sum,
       chunk[1] AS first_tok, chunk[len(chunk)] AS last_tok
FROM c
"""


# --------------------------------------------------------------------------
# tf-idf
# --------------------------------------------------------------------------


def q_docs_tfidf(sf_dir: str):
    """Top-5 terms per document by tf-idf (stages/tfidf.py): one bounded
    df exchange + ray.put broadcast, then a MAP-ONLY scoring pass (a doc's
    text is one row, so per-doc top-k never shuffles). idf is the linear
    ratio N/df — one IEEE division, bit-identical to DuckDB, where ln()
    could differ in the last ulp (ranking unchanged for monotone idf)."""
    from pymhealth_ray.stages.tfidf import tfidf_top_terms

    docs = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return tfidf_top_terms(docs, k=5, num_buckets=NB)


SQL_DOCS_TFIDF = """
WITH u AS (SELECT doc_id, tok
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
           WHERE tok <> ''),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM u GROUP BY doc_id, tok),
df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM u GROUP BY tok),
n AS (SELECT count(*) AS n FROM documents),
s AS (SELECT tf.doc_id, tf.tok, tf.tf, df.df,
             tf.tf * (CAST((SELECT n FROM n) AS DOUBLE) / df.df) AS score
      FROM tf JOIN df USING (tok))
SELECT doc_id, rn, tok, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score
FROM (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS BIGINT) AS rn FROM s) t
WHERE rn <= 5
"""


# --------------------------------------------------------------------------
# subword tokenization
# --------------------------------------------------------------------------


def q_docs_tokenize(sf_dir: str):
    """Greedy longest-match (WordPiece-style) subword encoding of every
    document with a corpus-derived vocabulary (stages/tokenize.py): vocab
    = top-200 words + observed charset (+##continuations), built with
    bounded exchanges, broadcast once via ray.put; encoding is a map-only
    actor pool with a per-actor word cache. Summary columns pin the exact
    id sequences (md5 of the int32 payload)."""
    from pymhealth_ray.stages.tokenize import build_wordpiece_vocab, tokenize

    docs = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    vocab = build_wordpiece_vocab(docs, num_words=200, num_buckets=NB)
    return tokenize(docs, vocab)


def _tokenize_expected(df):
    """Independent single-process WordPiece reference: same spec
    (stages/tokenize.py module doc), fresh implementation — dict vocab,
    per-word greedy scan, plain Python accumulation."""
    import collections
    import hashlib

    import pandas as pd

    texts = df["text"].tolist()
    wc = collections.Counter()
    charset = set()
    for t in texts:
        for w in t.split(" "):
            if w:
                wc[w] += 1
                charset.update(w)
    topw = [w for w, _ in sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:200]]
    pieces = set(topw) | charset | {"##" + c for c in charset}
    vocab = {"[UNK]": 0}
    for i, p in enumerate(sorted(pieces), 1):
        vocab[p] = i
    maxlen = max(map(len, vocab))

    memo = {}

    def enc_word(w):
        got = memo.get(w)
        if got is not None:
            return got
        out = []
        i = 0
        while i < len(w):
            found = None
            for j in range(min(len(w), i + maxlen), i, -1):
                cand = w[i:j] if i == 0 else "##" + w[i:j]
                if cand in vocab:
                    found = (vocab[cand], j)
                    break
            if found is None:
                out = [0]
                break
            out.append(found[0])
            i = found[1]
        memo[w] = out
        return out

    rows = []
    for did, t in zip(df["doc_id"].tolist(), texts):
        ids = []
        for w in t.split(" "):
            if w:
                ids.extend(enc_word(w))
        arr = np.asarray(ids, dtype=np.int32)
        rows.append((did, len(ids), int((arr == 0).sum()), int(arr.sum(dtype=np.int64)),
                     hashlib.md5(arr.tobytes()).hexdigest()))
    return pd.DataFrame(rows, columns=["doc_id", "n_tok", "n_unk", "tok_sum", "tok_md5"])


# --------------------------------------------------------------------------
# token-payload exact dedup + length bucketing
# --------------------------------------------------------------------------


def q_seq_dedup_tokens(sf_dir: str):
    """Exact dedup over the token PAYLOAD (md5 of the id sequence): keep
    the first (doc_id, ts_ns) per distinct sequence with its duplicate
    count — stages/dedup.py exact_dedup with a zero-padded composite row
    id so min-string == min-(doc_id, ts_ns)."""
    from pymhealth_ray.stages.dedup import (composite_rid, exact_dedup,
                                            split_rid, tokens_join_key)

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "tokens"])

    def add_key(b: pa.Table) -> pa.Table:
        # doc_id is fixed-width ("dNNNNNN") so lexicographic == natural
        # order; ts_ns zero-padded to 20 digits keeps the composite sortable.
        return pa.table({"seq": tokens_join_key(b["tokens"]),
                         "rid": composite_rid(b["doc_id"], b["ts_ns"])})

    dd = exact_dedup(ds.map_batches(add_key, batch_format="pyarrow"),
                     key_col="seq", id_col="rid")

    def finish(b: pa.Table) -> pa.Table:
        doc, ts = split_rid(b["rid"])
        return pa.table({"tok_md5": b["key_md5"], "doc_id": doc, "ts_ns": ts,
                         "n_dups": b["n_dups"]})

    return dd.map_batches(finish, batch_format="pyarrow")


def sql_seq_dedup_tokens(path: str) -> str:
    return f"""
WITH k AS (SELECT doc_id, ts_ns, md5(array_to_string(tokens, ',')) AS tok_md5
           FROM read_parquet('{path}/part-*.parquet')),
r AS (SELECT tok_md5, doc_id, ts_ns,
             row_number() OVER (PARTITION BY tok_md5 ORDER BY doc_id, ts_ns) AS rn,
             count(*) OVER (PARTITION BY tok_md5) AS n_dups
      FROM k)
SELECT tok_md5, doc_id, ts_ns, CAST(n_dups AS BIGINT) AS n_dups FROM r WHERE rn = 1
"""


def q_seq_length_buckets(sf_dir: str):
    """Power-of-two length-bucket histogram + pad-to-bucket-cap padding
    waste (stages/pack.py:length_histogram) — integer frexp exponents, no
    libm log2; per-block partials keep the exchange at ≤64 rows/block."""
    from pymhealth_ray.stages.pack import length_histogram

    ds, _ = _seq_ds(sf_dir, ["n_tok"])
    return length_histogram(ds, len_col="n_tok")


def sql_seq_length_buckets(path: str) -> str:
    return f"""
WITH s AS (SELECT CAST(n_tok AS BIGINT) AS n
           FROM read_parquet('{path}/part-*.parquet') WHERE n_tok > 0),
b AS (SELECT CAST(floor(log2(n)) AS BIGINT) AS bucket, n FROM s)
SELECT bucket, count(*) AS n_seqs, CAST(min(n) AS BIGINT) AS n_min,
       CAST(max(n) AS BIGINT) AS n_max,
       CAST(sum((CAST(1 AS BIGINT) << CAST(bucket + 1 AS INTEGER)) - n) AS BIGINT) AS pad_waste
FROM b GROUP BY bucket
"""


# --------------------------------------------------------------------------
# cross-document line/segment boilerplate dedup
# --------------------------------------------------------------------------


def q_docs_line_dedup(sf_dir: str):
    """C4-style boilerplate scrub: 3-word segments appearing in >2 docs are
    dropped from every document (stages/linededup.py — slim (seg,count)
    exchange, hot-set broadcast, map-only scrub)."""
    from pymhealth_ray.stages.linededup import segment_dedup

    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return segment_dedup(ds, words_per_seg=3, max_df=2)


SQL_DOCS_LINE_DEDUP = r"""
WITH w AS (
  SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS ord,
         unnest(string_split(text, ' ')) AS word
  FROM documents
), seg AS (
  SELECT doc_id, CAST((ord - 1) // 3 AS BIGINT) AS seg_no,
         string_agg(word, ' ' ORDER BY ord) AS seg
  FROM w GROUP BY doc_id, CAST((ord - 1) // 3 AS BIGINT)
), df AS (
  SELECT seg, count(DISTINCT doc_id) AS df FROM seg GROUP BY seg
), tagged AS (
  SELECT s.doc_id, s.seg_no, s.seg, (d.df > 2) AS hot
  FROM seg s JOIN df d USING (seg)
), agg AS (
  SELECT doc_id, count(*) AS n_seg,
         sum(CASE WHEN hot THEN 1 ELSE 0 END) AS n_dropped,
         coalesce(string_agg(CASE WHEN NOT hot THEN seg END, ' ' ORDER BY seg_no), '') AS clean
  FROM tagged GROUP BY doc_id
)
SELECT doc_id, CAST(n_seg AS BIGINT) AS n_seg,
       CAST(n_dropped AS BIGINT) AS n_dropped,
       md5(clean) AS clean_md5,
       CAST(length(clean) AS BIGINT) AS n_chars_clean
FROM agg
"""


# --------------------------------------------------------------------------
# ordered per-group sequence collection / inverted index / categorical encode
# --------------------------------------------------------------------------


def q_events_user_sequences(sf_dir: str):
    """Per-user ordered event-type sequence (stages/collect.py — one bucket
    exchange, vectorized binary_join per segment, md5 digest)."""
    from pymhealth_ray.stages.collect import grouped_ordered_collect

    ev = read_table(f"{sf_dir}/events.parquet",
                    columns=["user_id", "ts", "event_type", "event_id"])
    out = grouped_ordered_collect(ev, "user_id", "ts", "event_type",
                                  tiebreak_col="event_id", num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "n": b["n"],
            "n_distinct": b["n_distinct"],
            "first_ts": b["first_ord"],
            "last_ts": b["last_ord"],
            "seq_md5": b["seq_md5"],
        })

    return out.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_USER_SEQUENCES = """
SELECT user_id, CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_distinct,
       min(ts) AS first_ts, max(ts) AS last_ts,
       md5(string_agg(event_type, ',' ORDER BY ts, event_id)) AS seq_md5
FROM events GROUP BY user_id
"""


def q_docs_inverted_index(sf_dir: str):
    """Term → posting-list index over documents (stages/index.py — slim
    (term, doc, tf) explode, one term-bucket exchange, segment walk)."""
    from pymhealth_ray.stages.index import inverted_index

    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    return inverted_index(docs, min_df=3, num_buckets=NB)


SQL_DOCS_INVERTED_INDEX = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT term, doc_id, count(*) AS tf FROM w GROUP BY term, doc_id
), agg AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS tf,
         string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
  FROM tf GROUP BY term
)
SELECT term, df, tf, md5(postings) AS postings_md5,
       array_to_string(list_slice(string_split(postings, ','), 1, 5), ',') AS first_docs
FROM agg WHERE df >= 3
"""


def q_orders_priority_encode(sf_dir: str):
    """Frequency label encoding + exact target-mean encoding of
    o_orderpriority (stages/encode.py — per-block combiners, tiny groupby,
    broadcast dict, map-only apply; mean = one int/int IEEE division)."""
    from pymhealth_ray.stages.encode import frequency_target_encode

    orders = read_table(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_orderpriority",
                                 "o_totalprice"])
    out = frequency_target_encode(orders, "o_orderpriority", "o_totalprice")

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_orderpriority": b["o_orderpriority"],
            "cat_id": b["cat_id"],
            "cat_n": b["cat_n"],
            "cat_target_mean": b["cat_target_mean"],
        })

    return out.map_batches(finish, batch_format="pyarrow")


SQL_ORDERS_PRIORITY_ENCODE = """
WITH s AS (
  SELECT o_orderpriority, count(*) AS n,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS sc
  FROM orders GROUP BY o_orderpriority
), r AS (
  SELECT o_orderpriority, n, sc,
         CAST(row_number() OVER (ORDER BY n DESC, o_orderpriority) AS BIGINT)
           AS cat_id
  FROM s
)
SELECT o.o_orderkey, o.o_orderpriority, r.cat_id,
       CAST(r.n AS BIGINT) AS cat_n,
       CAST(r.sc AS DOUBLE) / (100 * r.n) AS cat_target_mean
FROM orders o JOIN r USING (o_orderpriority)
"""


# --------------------------------------------------------------------------
# global rank features / unigram LM scoring
# --------------------------------------------------------------------------


def q_lineitem_quantity_rank(sf_dir: str):
    """Exact global rank/dense_rank/percent_rank of l_quantity via a
    broadcast value-histogram CDF (stages/rank.py — slim (value, count)
    exchange, map-only searchsorted apply; no global sort)."""
    from pymhealth_ray.stages.rank import global_rank

    li = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_orderkey", "l_linenumber", "l_quantity"])
    out = global_rank(li, "l_quantity", scale=100)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "l_linenumber": b["l_linenumber"].cast(pa.int64()),
            "l_quantity": b["l_quantity"],
            "rnk": b["rnk"],
            "drnk": b["drnk"],
            "pct": b["pct"],
        })

    return out.map_batches(finish, batch_format="pyarrow")


SQL_LINEITEM_QUANTITY_RANK = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity,
       CAST(rank() OVER (ORDER BY l_quantity) AS BIGINT) AS rnk,
       CAST(dense_rank() OVER (ORDER BY l_quantity) AS BIGINT) AS drnk,
       percent_rank() OVER (ORDER BY l_quantity) AS pct
FROM lineitem
"""


def q_seq_length_buckets(sf_dir: str):
    """Length-bucketed INFERENCE batching layout: rank every row by
    n_tok globally (one partitioned_sort_rank exchange), then derive its
    NTILE(10) length bucket AND its fixed-size batch index inside the
    bucket from (rank, total) map-side with the exact SQL tile rule — so
    similar-length rows batch together (minimal padding waste) and the
    whole layout is one exchange + integer arithmetic, reproducible by
    any reader."""
    from pymhealth_ray.stages.dedup import composite_rid
    from pymhealth_ray.stages.rank import partitioned_sort_rank

    K_TILES, BATCH = 10, 32
    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "n_tok"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"], "ts_ns": b["ts_ns"],
            "n_tok": b["n_tok"].cast(pa.int64()),
            "one": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
            "rid": composite_rid(b["doc_id"], b["ts_ns"]),
        })

    ranked = partitioned_sort_rank(
        ds.map_batches(prep, batch_format="pyarrow"),
        "one", "n_tok", "rid", num_bins=256, rank_name="rnk")

    def tiles(b: pa.Table) -> pa.Table:
        r = b["rnk"].to_numpy(zero_copy_only=False)
        n = b["__n_part"].to_numpy(zero_copy_only=False)
        q, rem = n // K_TILES, n % K_TILES
        cut = rem * (q + 1)
        in_big = r < cut
        tile = np.where(in_big, r // np.maximum(q + 1, 1),
                        rem + (r - cut) // np.maximum(q, 1))
        start = np.where(in_big, tile * (q + 1), cut + (tile - rem) * q)
        batch_idx = (r - start) // BATCH
        return pa.table({
            "doc_id": b["doc_id"], "ts_ns": b["ts_ns"], "n_tok": b["n_tok"],
            "bucket": pa.array(tile.astype(np.int64) + 1),
            "batch_idx": pa.array(batch_idx.astype(np.int64)),
        })

    return ranked.map_batches(tiles, batch_format="pyarrow")


def sql_seq_length_buckets(path: str) -> str:
    return f"""
WITH r AS (
  SELECT doc_id, ts_ns, CAST(n_tok AS BIGINT) AS n_tok,
         CAST(row_number() OVER (ORDER BY n_tok, doc_id, ts_ns) - 1
              AS BIGINT) AS rnk,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM read_parquet('{path}/part-*.parquet')
)
SELECT doc_id, ts_ns, n_tok,
  CASE WHEN rnk < (n % 10) * (n // 10 + 1)
       THEN rnk // (n // 10 + 1)
       ELSE (n % 10) + (rnk - (n % 10) * (n // 10 + 1)) // (n // 10)
  END + 1 AS bucket,
  CASE WHEN rnk < (n % 10) * (n // 10 + 1)
       THEN (rnk - (rnk // (n // 10 + 1)) * (n // 10 + 1)) // 32
       ELSE (rnk - ((n % 10) * (n // 10 + 1)
             + ((rnk - (n % 10) * (n // 10 + 1)) // (n // 10)) * (n // 10)))
            // 32
  END AS batch_idx
FROM r
"""


def q_seq_epoch_shuffle(sf_dir: str):
    """Deterministic EPOCH SHUFFLE order: every row's position in a
    seeded global permutation — rank of md5(row-id + epoch salt)
    (stages/rank.partitioned_sort_rank over the 15-hex-digit priority as
    int64). The scale-safe alternative to ``random_shuffle()``: the
    permutation is a pure function of (row id, epoch), so any failed/
    resumed reader reproduces it without coordination, and a different
    salt re-shuffles the next epoch. SQL-exact (hex-string order ==
    numeric order at fixed width)."""
    from pymhealth_ray.stages.rank import partitioned_sort_rank

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns"])

    def pri(b: pa.Table) -> pa.Table:
        docs = b["doc_id"].to_pylist()
        tss = b["ts_ns"].to_pylist()
        p = np.fromiter(
            (int(hashlib.md5(f"{d}|{t}-e0".encode()).hexdigest()[:15], 16)
             for d, t in zip(docs, tss)),
            dtype=np.int64, count=len(docs))
        return pa.table({
            "doc_id": b["doc_id"], "ts_ns": b["ts_ns"],
            "one": pa.array(np.zeros(len(docs), dtype=np.int8)),
            "pri": pa.array(p),
        })

    ranked = partitioned_sort_rank(
        ds.map_batches(pri, batch_format="pyarrow"),
        "one", "pri", "doc_id", num_bins=256, rank_name="epoch_pos")
    return ranked.map_batches(
        lambda b: b.select(["doc_id", "ts_ns", "epoch_pos"]),
        batch_format="pyarrow")


def sql_seq_epoch_shuffle(path: str) -> str:
    return f"""
SELECT doc_id, ts_ns,
       CAST(row_number() OVER (
         ORDER BY substr(md5(doc_id || '|' || CAST(ts_ns AS VARCHAR)
                             || '-e0'), 1, 15), doc_id, ts_ns) - 1
            AS BIGINT) AS epoch_pos
FROM read_parquet('{path}/part-*.parquet')
"""


def q_docs_quality_deciles(sf_dir: str):
    """Composite quality DECILES: one map pass extracts the Gopher
    signals (stages/text.gopher_rules), a single int/int-exact composite
    score (alphabetic-word fraction + stopword-hit rate) ranks every doc,
    and exact NTILE(10) (stages/rank.ntile — range-bucket distributed
    ranking) assigns the decile. The curriculum/mixture-planning shape:
    score map-side, rank once, bucket."""
    from pymhealth_ray.stages.rank import ntile
    from pymhealth_ray.stages.text import gopher_rules

    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    sig = gopher_rules(docs)

    def score(b: pa.Table) -> pa.Table:
        nw = b["n_words"].to_numpy(zero_copy_only=False)
        af = b["alpha_frac"].to_numpy(zero_copy_only=False)
        sh = b["stop_hits"].to_numpy(zero_copy_only=False)
        keep = nw > 0
        s = af + sh / nw  # same operand order as the SQL expression
        return pa.table({
            "doc_id": b["doc_id"],
            "score": pa.array(s),
            # ntile ranks ascending; negate for ORDER BY score DESC
            "neg_score": pa.array(-s),
            "one": pa.array(np.zeros(len(nw), dtype=np.int8)),
        }).filter(pa.array(keep))

    out = ntile(sig.map_batches(score, batch_format="pyarrow"),
                "one", "neg_score", "doc_id", k=10, out="decile")
    return out.map_batches(
        lambda b: b.select(["doc_id", "score", "decile"]),
        batch_format="pyarrow")


def sql_docs_quality_deciles() -> str:
    stops = ", ".join(f"'{s}'" for s in
                      ("the", "be", "to", "of", "and", "that", "have",
                       "with"))
    return f"""
WITH w AS (SELECT doc_id,
                  list_filter(string_split(text, ' '), x -> x <> '') AS ws
           FROM documents),
s AS (SELECT doc_id,
        CAST(len(ws) AS BIGINT) AS n_words,
        CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
             AS BIGINT) AS n_alpha,
        CAST(len(list_intersect(list_distinct([lower(x) FOR x IN ws]),
                                [{stops}])) AS BIGINT) AS stop_hits
      FROM w),
sc AS (SELECT doc_id,
         CAST(n_alpha AS DOUBLE) / n_words
         + CAST(stop_hits AS DOUBLE) / n_words AS score
       FROM s WHERE n_words > 0)
SELECT doc_id, score,
       CAST(ntile(10) OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS decile
FROM sc
"""


def q_docs_shingle_diversity(sf_dir: str):
    """Char-5-gram diversity per doc (stages/repetition.shingle_diversity
    — packed byte shingles, one lexsort per batch, map-only): the
    char-level templatedness/boilerplate signal. Oracle: pure-SQL
    substr list comprehension (byte == char shingles on this ASCII
    corpus)."""
    from pymhealth_ray.stages.repetition import shingle_diversity

    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    return shingle_diversity(docs)


def sql_docs_shingle_diversity() -> str:
    return """
WITH s AS (SELECT doc_id,
  CAST(greatest(length(text) - 4, 0) AS BIGINT) AS n_sh,
  CAST(len(list_distinct([substr(text, i, 5)
       FOR i IN generate_series(1, length(text) - 4)])) AS BIGINT) AS d_sh
FROM documents)
SELECT doc_id, n_sh, d_sh,
  CASE WHEN n_sh > 0 THEN CAST(d_sh AS DOUBLE) / n_sh END AS distinct_frac
FROM s
"""


KEYWORD_TAGS = ("data", "model", "user", "system", "energy")


def q_docs_keyword_tags(sf_dir: str):
    """Multi-keyword occurrence tagging (brand-safety / topic-routing
    shape): per doc, substring occurrence counts for a fixed keyword list
    — one Arrow ``count_substring`` kernel per keyword, map-only, no
    exchange. SQL parity via the length-difference identity."""
    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])

    def tag(b: pa.Table) -> pa.Table:
        txt = b["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        cols = {"doc_id": b["doc_id"]}
        for kw in KEYWORD_TAGS:
            cols[f"n_{kw}"] = pc.count_substring(txt, kw).cast(pa.int64())
        return pa.table(cols)

    return docs.map_batches(tag, batch_format="pyarrow")


def sql_docs_keyword_tags() -> str:
    cols = ",\n  ".join(
        f"CAST((length(text) - length(replace(text, '{kw}', '')))"
        f" // {len(kw)} AS BIGINT) AS n_{kw}" for kw in KEYWORD_TAGS)
    return f"SELECT doc_id,\n  {cols}\nFROM documents"


def q_docs_k_anonymize(sf_dir: str):
    """k-anonymity suppression over quasi-identifiers: keep only docs
    whose (lang, source) group has ≥ k members — the governance filter a
    pipeline runs before releasing provenance-annotated data. Per-block
    partial group counts merge driver-side (bounded by |langs×sources| ×
    blocks), the small kept-group set broadcasts, the filter is map-only."""
    K_ANON = 5
    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "lang", "source"])

    def partial(b: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(b["lang"], b["source"], "\x00")
        vc = pc.value_counts(key)
        return pa.table({"g": vc.field("values"),
                         "c": vc.field("counts").cast(pa.int64())})

    counts: dict = {}
    for t in docs.map_batches(partial, batch_format="pyarrow",
                              batch_size=None).iter_batches(
                                  batch_format="pyarrow"):
        for g, c in zip(t["g"].to_pylist(), t["c"].to_pylist()):
            counts[g] = counts.get(g, 0) + c
    kept = pa.array(sorted(g for g, c in counts.items() if c >= K_ANON))
    n_of = {g: c for g, c in counts.items()}
    kept_ref = ray.put((kept, n_of))

    def keep(b: pa.Table) -> pa.Table:
        kp, nof = ray.get(kept_ref)
        key = pc.binary_join_element_wise(b["lang"], b["source"], "\x00")
        m = pc.is_in(key, value_set=kp)
        # group_n looked up once per DISTINCT group, not per row
        enc = key.dictionary_encode() if isinstance(key, pa.Array) else \
            key.combine_chunks().dictionary_encode()
        lut = np.array([nof[k_] for k_ in enc.dictionary.to_pylist()],
                       dtype=np.int64)
        b = b.append_column("group_n", pa.array(
            lut[enc.indices.to_numpy(zero_copy_only=False)]))
        return b.filter(m)

    return docs.map_batches(keep, batch_format="pyarrow")


def sql_docs_k_anonymize() -> str:
    return """
SELECT doc_id, lang, source, group_n FROM (
  SELECT doc_id, lang, source,
         CAST(count(*) OVER (PARTITION BY lang, source) AS BIGINT) AS group_n
  FROM documents)
WHERE group_n >= 5
"""


def q_docs_lsh_incremental(sf_dir: str):
    """Incremental near-dup dedup against a PERSISTENT LSH index
    (stages/lshindex.py): the standing corpus (train split) is indexed
    once — hash-partitioned band-key and signature layouts + a params
    manifest — and the ingest batch (eval split) probes it with PRUNED
    reads (only the band partitions its keys hash into, only the sig
    partitions holding candidate ids). Nothing about the standing corpus
    recomputes at ingest. Output: (new_id, old_id, est_jaccard)."""
    import os as _os

    from pymhealth_ray.stages.lshindex import lsh_index_probe, lsh_index_write
    from pymhealth_ray.stages.sample import split_train_eval

    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    split = split_train_eval(docs, "doc_id", eval_fraction=0.2, salt="ix")
    train = split.filter(lambda r: r["split"] == "train").map_batches(
        lambda b: b.select(["doc_id", "text"]), batch_format="pyarrow")
    new = split.filter(lambda r: r["split"] == "eval").map_batches(
        lambda b: b.select(["doc_id", "text"]), batch_format="pyarrow")

    name = _os.path.basename(_os.path.normpath(sf_dir))
    index_dir = f"/tmp/pymhealth_ray_lshidx/{name}_v1"
    if not _os.path.exists(_os.path.join(index_dir, "_lsh_index.json")):
        with _build_lock(index_dir):
            if not _os.path.exists(_os.path.join(index_dir,
                                                 "_lsh_index.json")):
                lsh_index_write(train, index_dir)
    return lsh_index_probe(new, index_dir, jaccard_threshold=0.5)


def _lsh_incremental_expected(df):
    """Single-process replication: same split rule, same hash family; the
    band index and probe are plain dicts."""
    import hashlib

    import pandas as pd

    from pymhealth_ray.stages.dedup import MinHasher, _band_keys_vec
    from pymhealth_ray.stages.sample import _threshold_hex

    thr = _threshold_hex(0.2)
    ids = df.doc_id.to_numpy().astype(np.int64)
    is_eval = np.array(
        [hashlib.md5(f"{i}-ix".encode()).hexdigest()[:8] < thr
         for i in ids])
    hasher = MinHasher()
    sigs = np.stack([hasher.signature(t) for t in df.text.values]).astype(
        np.uint64)
    bands, rpb = 16, 4
    index: dict = {}
    for b in range(bands):
        keys = _band_keys_vec(sigs[~is_eval], b, rpb)
        for k, i in zip(keys.tolist(), ids[~is_eval].tolist()):
            index.setdefault((b, k), []).append(i)
    old_pos = {int(i): j for j, i in enumerate(ids[~is_eval])}
    old_sigs = sigs[~is_eval]
    rows = []
    new_ids = ids[is_eval]
    new_sigs = sigs[is_eval]
    for j, nid in enumerate(new_ids.tolist()):
        cand = set()
        for b in range(bands):
            k = int(_band_keys_vec(new_sigs[j:j + 1], b, rpb)[0])
            cand.update(index.get((b, k), ()))
        for oid in sorted(cand):
            est = float((new_sigs[j] == old_sigs[old_pos[oid]]).mean())
            if est >= 0.5:
                rows.append((nid, oid, round(est, 4)))
    rows.sort()
    return pd.DataFrame({
        "new_id": np.array([r[0] for r in rows], dtype=np.int64),
        "old_id": np.array([r[1] for r in rows], dtype=np.int64),
        "est_jaccard": np.array([r[2] for r in rows], dtype=np.float64),
    })


def q_docs_dup_rate_by_source(sf_dir: str):
    """Dedup ANALYTICS: per source, how many docs participate in at least
    one verified near-dup pair and the dup rate — the per-provenance
    quality report a crawl pipeline reviews before re-weighting sources.
    Plan: LSH pairs → distinct dup ids (tiny) → co-partitioned equi-join
    back to (doc_id, source) → per-block partial counts merged
    driver-side (bounded by #sources × blocks). Oracle: single-process
    LSH replay + pandas rollup."""
    from pymhealth_ray.stages.join import equi_join

    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text", "source"])
    pairs = minhash_lsh_dupes(
        docs.map_batches(lambda b: b.select(["doc_id", "text"]),
                         batch_format="pyarrow"),
        jaccard_threshold=0.5)

    def pair_ids(b: pa.Table) -> pa.Table:
        ids = np.unique(np.concatenate([
            b["id_a"].to_numpy(zero_copy_only=False),
            b["id_b"].to_numpy(zero_copy_only=False)]))
        return pa.table({"doc_id": pa.array(ids.astype(np.int64))})

    dup_ids = pairs.map_batches(pair_ids, batch_format="pyarrow",
                                batch_size=None)
    # global distinct (block partials may overlap): one tiny groupby
    dup_ids = dup_ids.groupby("doc_id").count().map_batches(
        lambda b: b.select(["doc_id"]), batch_format="pyarrow")
    meta = docs.map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"].cast(pa.int64()),
                            "source": b["source"]}),
        batch_format="pyarrow")
    dup_src = equi_join(dup_ids, meta, on="doc_id", num_buckets=NB)

    def src_counts(ds_):
        import pyarrow.compute as pc_

        counts: dict = {}
        part = ds_.map_batches(
            lambda b: pa.table(
                {"source": pc_.value_counts(b["source"]).field("values"),
                 "c": pc_.value_counts(b["source"]).field("counts").cast(
                     pa.int64())}),
            batch_format="pyarrow", batch_size=None)
        for t in part.iter_batches(batch_format="pyarrow"):
            for s, c in zip(t["source"].to_pylist(), t["c"].to_pylist()):
                counts[s] = counts.get(s, 0) + c
        return counts

    total = src_counts(meta)
    dups = src_counts(dup_src)
    srcs = sorted(total)
    n_docs = np.array([total[s] for s in srcs], dtype=np.int64)
    n_dup = np.array([dups.get(s, 0) for s in srcs], dtype=np.int64)
    return ray.data.from_arrow(pa.table({
        "source": pa.array(srcs, type=pa.string()),
        "n_docs": pa.array(n_docs),
        "n_dup_docs": pa.array(n_dup),
        "dup_rate": pa.array(n_dup / n_docs),
    }))


def _dup_rate_by_source_expected(df):
    """Single-process replication: LSH pair replay + pandas rollup."""
    import pandas as pd

    pairs = _minhash_pairs_expected(df[["doc_id", "text"]])
    dup = set(pairs.id_a.tolist()) | set(pairs.id_b.tolist())
    src = dict(zip(df.doc_id.astype(np.int64), df.source))
    total: dict = {}
    dups: dict = {}
    for d, s in src.items():
        total[s] = total.get(s, 0) + 1
        if d in dup:
            dups[s] = dups.get(s, 0) + 1
    srcs = sorted(total)
    n_docs = np.array([total[s] for s in srcs], dtype=np.int64)
    n_dup = np.array([dups.get(s, 0) for s in srcs], dtype=np.int64)
    return pd.DataFrame({
        "source": srcs,
        "n_docs": n_docs,
        "n_dup_docs": n_dup,
        "dup_rate": n_dup / n_docs,
    })


def q_docs_cross_dupes(sf_dir: str):
    """Cross-split CONTAMINATION pairs: MinHash-LSH near-dup pairs where
    one side landed in train and the other in eval under the
    deterministic md5 split — the near-dup generalization of n-gram
    decontamination (exact-overlap decontam is `docs_decontam`). The
    split side is a pure function of doc_id, so pair sides are
    recomputed MAP-SIDE on the (small) verified pair set — no join back
    to the corpus. Output: (train_id, eval_id, est_jaccard)."""
    from pymhealth_ray.stages.sample import _hex8, _threshold_hex

    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    pairs = minhash_lsh_dupes(docs, jaccard_threshold=0.5)
    thr = _threshold_hex(0.1)

    def cross(b: pa.Table) -> pa.Table:
        ev_a = _hex8(b["id_a"], "xc") < thr
        ev_b = _hex8(b["id_b"], "xc") < thr
        keep = ev_a != ev_b
        b = b.filter(pa.array(keep))
        ev_a = ev_a[keep]
        ia = b["id_a"].to_numpy(zero_copy_only=False)
        ib = b["id_b"].to_numpy(zero_copy_only=False)
        return _round_cols(pa.table({
            "train_id": pa.array(np.where(ev_a, ib, ia).astype(np.int64)),
            "eval_id": pa.array(np.where(ev_a, ia, ib).astype(np.int64)),
            "est_jaccard": b["est_jaccard"],
        }), {"est_jaccard": 4})

    return pairs.map_batches(cross, batch_format="pyarrow")


def _cross_dupes_expected(df):
    """Single-process replication: the `_minhash_pairs_expected` LSH
    replay restricted to cross-split pairs with the same md5 side rule."""
    import hashlib

    import pandas as pd

    from pymhealth_ray.stages.sample import _threshold_hex

    pairs = _minhash_pairs_expected(df)
    thr = _threshold_hex(0.1)

    def is_eval(i: int) -> bool:
        return hashlib.md5(f"{i}-xc".encode()).hexdigest()[:8] < thr

    rows = []
    for r in pairs.itertuples(index=False):
        ea, eb = is_eval(int(r.id_a)), is_eval(int(r.id_b))
        if ea != eb:
            t, e = (r.id_b, r.id_a) if ea else (r.id_a, r.id_b)
            rows.append({"train_id": int(t), "eval_id": int(e),
                         "est_jaccard": r.est_jaccard})
    return pd.DataFrame(rows, columns=["train_id", "eval_id",
                                       "est_jaccard"]).astype(
        {"train_id": np.int64, "eval_id": np.int64,
         "est_jaccard": np.float64})


def q_docs_gopher_rules(sf_dir: str):
    """Gopher/MassiveText quality RULES per document (stages/text.py
    gopher_rules — map-only, Arrow split + one RE2 kernel + bincount
    sums): word-count bounds, mean-word-length window, alphabetic-word
    fraction, stopword-presence rule, and their conjunction."""
    from pymhealth_ray.stages.text import gopher_rules

    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    return gopher_rules(docs)


def sql_docs_gopher_rules() -> str:
    stops = ", ".join(f"'{s}'" for s in
                      ("the", "be", "to", "of", "and", "that", "have",
                       "with"))
    return f"""
WITH w AS (SELECT doc_id,
                  list_filter(string_split(text, ' '), x -> x <> '') AS ws
           FROM documents),
s AS (SELECT doc_id,
        CAST(len(ws) AS BIGINT) AS n_words,
        CAST(coalesce(list_sum([CAST(length(x) AS BIGINT) FOR x IN ws]), 0)
             AS BIGINT) AS char_sum,
        CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
             AS BIGINT) AS n_alpha,
        CAST(len(list_intersect(list_distinct([lower(x) FOR x IN ws]),
                                [{stops}])) AS BIGINT) AS stop_hits
      FROM w)
SELECT doc_id, n_words,
  CASE WHEN n_words > 0
       THEN CAST(char_sum AS DOUBLE) / n_words END AS mean_word_len,
  CASE WHEN n_words > 0
       THEN CAST(n_alpha AS DOUBLE) / n_words END AS alpha_frac,
  stop_hits,
  CASE WHEN n_words > 0 THEN
    n_words BETWEEN 50 AND 100000
    AND (CAST(char_sum AS DOUBLE) / n_words) BETWEEN 3.0 AND 10.0
    AND (CAST(n_alpha AS DOUBLE) / n_words) >= 0.8
    AND stop_hits >= 2
  END AS passes
FROM s
"""


def q_docs_dsir_weights(sf_dir: str):
    """DSIR importance log-weights (Xie et al. 2023) for every document:
    target = the English subcorpus, raw = everything; hashed word-bigram
    multinomials with add-1 smoothing (stages/dsir.py — one fused count
    exchange, fixed 4096-bucket broadcast, map-only scoring). Oracle:
    single-process replication with the identical reduceat float chain."""
    from pymhealth_ray.stages.dsir import dsir_fit, dsir_scores

    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text", "lang"])

    def target(batch: pa.Table) -> np.ndarray:
        m = pc.fill_null(pc.equal(batch["lang"], "en"), False)
        return m.to_numpy(zero_copy_only=False)

    lr, _, _ = dsir_fit(docs, "text", target, num_buckets=NB)
    lr_ref = ray.put(lr)
    return dsir_scores(docs, lr_ref)


def _dsir_expected(df):
    """Single-process DSIR replication: same md5-prefix bucketing, same
    add-1 formula, and the SAME flat-reduceat float chain (one 'batch' of
    the whole table) so sums are bit-exact."""
    import hashlib

    import pandas as pd

    B = 4096
    feats = []
    for t in df["text"].tolist():
        w = t.split(" ")
        feats.append([int(hashlib.md5(f"{a} {b}".encode()).hexdigest()[:3],
                          16) for a, b in zip(w[:-1], w[1:])])
    raw = np.zeros(B, dtype=np.int64)
    tgt = np.zeros(B, dtype=np.int64)
    is_en = (df["lang"] == "en").to_numpy()
    for f, e in zip(feats, is_en):
        for b in f:
            raw[b] += 1
            if e:
                tgt[b] += 1
    n_raw, n_tgt = int(raw.sum()), int(tgt.sum())
    lr = (np.log(tgt + 1.0) - np.log(float(n_tgt + B))
          - np.log(raw + 1.0) + np.log(float(n_raw + B)))
    n_feat = np.array([len(f) for f in feats], dtype=np.int64)
    flat = np.concatenate([np.asarray(f, dtype=np.int64) for f in feats]) \
        if n_feat.sum() else np.empty(0, np.int64)
    contrib = lr[flat]
    starts = np.concatenate(([0], np.cumsum(n_feat)))[:-1]
    sums = np.zeros(len(n_feat), dtype=np.float64)
    nz = n_feat > 0
    if nz.any() and len(contrib):
        sums[nz] = np.add.reduceat(contrib, starts[nz])
    out = pd.DataFrame({
        "doc_id": df["doc_id"].to_numpy().astype(np.int64),
        "n_feat": n_feat,
        "dsir_logw": sums,
    })
    # featureless docs are NULL (pd.NA -> parquet null), matching the
    # engine's masked column
    out.loc[~nz, "dsir_logw"] = None
    return out


def q_docs_lm_nll(sf_dir: str):
    """Per-doc average negative log-likelihood under the corpus unigram
    LM (stages/lm.py — count pass, broadcast log-prob dict, map-only
    dictionary-encoded scoring)."""
    from pymhealth_ray.stages.lm import unigram_nll

    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    out = unigram_nll(docs, num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        b = _round_cols(b, {"nll": 6})
        return pa.table({
            "doc_id": b["doc_id"],
            "n_tok": b["n_tok"],
            "nll": b["nll"],
        })

    return out.map_batches(finish, batch_format="pyarrow")


SQL_DOCS_LM_NLL = """
WITH w AS (
  SELECT doc_id, t AS term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
  WHERE t <> ''
), cnt AS (
  SELECT term, count(*) AS c FROM w GROUP BY term
), tot AS (
  SELECT CAST(sum(c) AS DOUBLE) AS t FROM cnt
), d AS (
  SELECT w.doc_id, count(*) AS n_tok,
         -avg(ln(CAST(cnt.c AS DOUBLE) / tot.t)) AS nll
  FROM w JOIN cnt USING (term) CROSS JOIN tot GROUP BY w.doc_id
)
SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, round(nll, 6) AS nll FROM d
"""


def q_docs_sorted_neighborhood(sf_dir: str):
    """Sorted-neighborhood blocking pairs on doc length
    (stages/neighborhood.py — range-bucket exchange, vectorized in-bucket
    pairs, O(w×buckets) driver markers for cross-bucket pairs)."""
    from pymhealth_ray.stages.neighborhood import sorted_neighborhood_pairs

    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "n_chars"])
    return sorted_neighborhood_pairs(docs, "n_chars", "doc_id", window=2,
                                     num_buckets=NB)


SQL_DOCS_SORTED_NEIGHBORHOOD = """
WITH r AS (
  SELECT doc_id, n_chars,
         row_number() OVER (ORDER BY n_chars, doc_id) AS rn
  FROM documents
)
SELECT a.doc_id AS id_a, a.n_chars AS key_a,
       b.doc_id AS id_b, b.n_chars AS key_b,
       CAST(b.rn - a.rn AS BIGINT) AS d
FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 2
"""


# --------------------------------------------------------------------------
# co-occurrence / BM25 retrieval / jsonl source
# --------------------------------------------------------------------------


def q_events_type_pairs(sf_dir: str):
    """Per-user event-type co-occurrence with lift (stages/assoc.py —
    user-bucket exchange, per-bucket distinct+pairs, tiny tagged-partial
    final on the driver; lift is one int/int IEEE division)."""
    from pymhealth_ray.stages.assoc import item_pair_counts

    ev = read_table(f"{sf_dir}/events.parquet",
                    columns=["user_id", "event_type"])
    return item_pair_counts(ev, "user_id", "event_type", num_buckets=NB)


SQL_EVENTS_TYPE_PAIRS = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
ca AS (SELECT event_type, count(*) AS c FROM ut GROUP BY event_type),
nu AS (SELECT count(DISTINCT user_id) AS n FROM events),
p AS (
  SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS cab
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT p.ta, p.tb, CAST(p.cab AS BIGINT) AS cab,
       CAST(c1.c AS BIGINT) AS ca, CAST(c2.c AS BIGINT) AS cb,
       CAST(nu.n AS BIGINT) AS n_groups,
       CAST(nu.n * p.cab AS DOUBLE) / (c1.c * c2.c) AS lift
FROM p JOIN ca c1 ON c1.event_type = p.ta
       JOIN ca c2 ON c2.event_type = p.tb
       CROSS JOIN nu
"""


_BM25_QUERY_TERMS = ("hash", "join", "dup", "stream")


def q_docs_bm25(sf_dir: str):
    """BM25 top-20 documents for a fixed query (stages/bm25.py —
    O(terms×blocks) stats pass, broadcast idf, map-only vectorized
    scoring, partial top-k merge; ranking key is the rounded score both
    sides)."""
    from pymhealth_ray.stages.bm25 import bm25_topk

    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    return bm25_topk(docs, _BM25_QUERY_TERMS, k=20)


SQL_DOCS_BM25 = f"""
WITH w AS (
  SELECT doc_id, t AS term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
  WHERE t <> ''
), dl AS (
  SELECT doc_id, count(*) AS dl FROM w GROUP BY doc_id
), st AS (
  SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl
), q(term) AS (
  VALUES {", ".join(f"('{t}')" for t in _BM25_QUERY_TERMS)}
), df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM w JOIN q USING (term)
  GROUP BY term
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM w JOIN q USING (term)
  GROUP BY doc_id, term
), sc AS (
  SELECT tf.doc_id,
         sum(ln((st.n - df.df + 0.5) / (df.df + 0.5) + 1) *
             (tf.tf * 2.5) /
             (tf.tf + 1.5 * (0.25 + 0.75 * (dl.dl / st.avgdl)))) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score, 6) AS score,
       CAST(row_number() OVER (ORDER BY round(score, 6) DESC, doc_id)
            AS BIGINT) AS rn
FROM sc
QUALIFY rn <= 20
"""


def _jsonl_fixture(sf_dir: str) -> str:
    """Materialize (once) the documents table as newline-delimited JSON —
    the raw-crawl interchange format the jsonl reader ingests."""
    import os

    import duckdb

    name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/pymhealth_ray_fixtures/jsonl_{name}_v1"
    out = os.path.join(out_dir, "documents.jsonl")
    marker = os.path.join(out_dir, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(out_dir, exist_ok=True)
        duckdb.sql(
            f"COPY (SELECT doc_id, lang, text FROM "
            f"'{sf_dir}/documents.parquet' ORDER BY doc_id) "
            f"TO '{out}' (FORMAT JSON)")
        with open(marker, "w") as f:
            f.write("ok")
    return out


def q_docs_jsonl_roundtrip(sf_dir: str):
    """Ingest the jsonl drop of the documents table (sources/io.read_jsonl
    — ray.data.read_json + map-side projection) and recompute per-doc
    length + content digest; the oracle reads the parquet original, so a
    hash match proves the jsonl path is lossless."""
    from pymhealth_ray.sources.io import read_jsonl

    path = _jsonl_fixture(sf_dir)
    ds = read_jsonl(path, columns=["doc_id", "lang", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        txt = batch["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        md5s = [hashlib.md5(t.encode()).hexdigest() for t in txt.to_pylist()]
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "lang": batch["lang"],
            "n_chars": pc.utf8_length(txt).cast(pa.int64()),
            "text_md5": pa.array(md5s, type=pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_DOCS_JSONL_ROUNDTRIP = """
SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars,
       md5(text) AS text_md5
FROM documents
"""


# --------------------------------------------------------------------------
# per-entity EWMA (streaming-state temporal feature)
# --------------------------------------------------------------------------


def q_seq_ewma(sf_dir: str):
    """Per-entity exponentially-weighted moving average of n_tok
    (alpha=0.1, adjust-normalized) in ts order — stages/ewma.py: a
    chunk-renormalized scan per entity riding the single entity-bucket
    exchange. The oracle is an INDEPENDENT single-process sequential
    recurrence (num=x+q·num, den=1+q·den), so a hash match proves both the
    distributed plumbing and the chunked-scan numerics."""
    from pymhealth_ray.stages.ewma import ewma_features

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "n_tok"])
    out = ewma_features(ds, "doc_id", "ts_ns", "n_tok", alpha=0.1,
                        num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(["doc_id", "ts_ns", "n_tok", "ewma"])
        b = _cast_cols(b, {"n_tok": pa.int64()})
        return _round_cols(b, {"ewma": 6})

    return out.map_batches(finish, batch_format="pyarrow")


def _ewma_expected(src: pa.Table):
    """Single-process EWMA via the textbook streaming recurrence — a
    different float path than the engine's chunked cumsum scan."""
    import pandas as pd

    df = (src.to_pandas()
          .sort_values(["doc_id", "ts_ns"], kind="mergesort")
          .reset_index(drop=True))
    q = 0.9
    out = np.empty(len(df), dtype=np.float64)
    for _, g in df.groupby("doc_id", sort=False):
        x = g["n_tok"].to_numpy(dtype=np.float64)
        num = 0.0
        den = 0.0
        y = np.empty(len(x), dtype=np.float64)
        for i in range(len(x)):
            num = x[i] + q * num
            den = 1.0 + q * den
            y[i] = num / den
        out[g.index.to_numpy()] = y
    m = 1e6
    ew = np.sign(out) * np.floor(np.abs(out) * m + 0.5) / m
    return pd.DataFrame({
        "doc_id": df["doc_id"],
        "ts_ns": df["ts_ns"].astype(np.int64),
        "n_tok": df["n_tok"].astype(np.int64),
        "ewma": ew,
    })


def sql_seq_ewma(path: str) -> str:
    return _materialized_oracle(path, "ewma_v1", _ewma_expected,
                                columns=("doc_id", "ts_ns", "n_tok"))


# --------------------------------------------------------------------------
# skip-gram PMI (token-pair association)
# --------------------------------------------------------------------------


def q_seq_pmi(sf_dir: str):
    """Top-25 directed skip-gram token pairs by PMI (window=2,
    min_count=5) over the tokens payload — stages/pmi.py: map-only packed
    pair counting, one (key,count) exchange, broadcast marginals, map-side
    partial top-k. All counts exact int64; ln/round-6 on both engines."""
    from pymhealth_ray.stages.pmi import pmi_topk

    ds, _ = _seq_ds(sf_dir, ["tokens"])
    return pmi_topk(ds, tokens_col="tokens", window=2, min_count=5, k=25)


def sql_seq_pmi(path: str) -> str:
    return f"""
WITH p AS (
  SELECT CAST(tokens[i] AS BIGINT) AS a, CAST(tokens[i + d] AS BIGINT) AS b
  FROM read_parquet('{path}/part-*.parquet'),
       LATERAL unnest(generate_series(1, 2)) AS dd(d),
       LATERAL unnest(generate_series(1, len(tokens) - d)) AS u(i)
), pc AS (
  SELECT a, b, count(*) AS cab FROM p GROUP BY a, b
), ma AS (
  SELECT a, count(*) AS ca FROM p GROUP BY a
), mb AS (
  SELECT b, count(*) AS cb FROM p GROUP BY b
), nt AS (
  SELECT count(*) AS n FROM p
)
SELECT a, b, cab, ca, cb,
       round(ln(CAST(nt.n * cab AS DOUBLE) / (ca * cb)), 6) AS pmi,
       CAST(row_number() OVER (
           ORDER BY round(ln(CAST(nt.n * cab AS DOUBLE) / (ca * cb)), 6) DESC,
                    a, b) AS BIGINT) AS rn
FROM pc JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN nt
WHERE cab >= 5
ORDER BY pmi DESC, a, b
LIMIT 25
"""


# --------------------------------------------------------------------------
# per-entity cumulative (expanding-window) features
# --------------------------------------------------------------------------


def q_seq_cumulative(sf_dir: str):
    """Per-entity running sum / max / index of n_tok in ts order —
    stages/cumulative.py: segmented cumsum + lift-trick cummax, zero
    per-entity Python, exact int64 (reference nni_cumulative lineage,
    /root/reference/src/mhealth/heart/hrv.py)."""
    from pymhealth_ray.stages.cumulative import cumulative_features

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "n_tok"])
    out = cumulative_features(ds, "doc_id", "ts_ns", "n_tok", num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(["doc_id", "ts_ns", "n_tok", "cum_sum", "cum_max",
                      "seq_idx"])
        return _cast_cols(b, {"n_tok": pa.int64()})

    return out.map_batches(finish, batch_format="pyarrow")


def sql_seq_cumulative(path: str) -> str:
    return f"""
SELECT doc_id, ts_ns, CAST(n_tok AS BIGINT) AS n_tok,
       CAST(sum(n_tok) OVER w AS BIGINT) AS cum_sum,
       CAST(max(n_tok) OVER w AS BIGINT) AS cum_max,
       CAST(row_number() OVER w AS BIGINT) AS seq_idx
FROM read_parquet('{path}/part-*.parquet')
WINDOW w AS (PARTITION BY doc_id ORDER BY ts_ns
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# source-mixture stratified sampling
# --------------------------------------------------------------------------

_MIXTURE_RATES = {"web": 0.25, "chat": 0.75, "code": 0.5, "book": 1.0}


def q_seq_mixture(sf_dir: str):
    """Source-mixture control: per-stratum deterministic hash sampling
    (stages/sample.py stratified_sample) — downsample web, keep books,
    reweight the corpus composition. Map-only; md5 thresholds make it
    SQL-reproducible."""
    from pymhealth_ray.stages.sample import stratified_sample

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "source", "n_tok"])

    def add_key(b: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            b["doc_id"].cast(pa.string()),
            b["ts_ns"].cast(pa.string()), "-")
        return b.append_column("k", k)

    out = stratified_sample(ds.map_batches(add_key, batch_format="pyarrow"),
                            "source", "k", _MIXTURE_RATES, salt="0")

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(["doc_id", "ts_ns", "source", "n_tok"])
        return _cast_cols(b, {"n_tok": pa.int64()})

    return out.map_batches(finish, batch_format="pyarrow")


def sql_seq_mixture(path: str) -> str:
    from pymhealth_ray.stages.sample import _threshold_hex

    case = " ".join(
        f"WHEN '{s}' THEN '{_threshold_hex(r)}'"
        for s, r in _MIXTURE_RATES.items())
    return f"""
SELECT doc_id, ts_ns, source, CAST(n_tok AS BIGINT) AS n_tok
FROM read_parquet('{path}/part-*.parquet')
WHERE substr(md5(doc_id || '-' || CAST(ts_ns AS VARCHAR) || '-0'), 1, 8)
      < CASE source {case} ELSE '00000000' END
"""


# --------------------------------------------------------------------------
# time-grid resample (forward-fill alignment)
# --------------------------------------------------------------------------


def q_seq_resample(sf_dir: str):
    """Hourly-grid forward-fill of n_tok per entity — stages/resample.py:
    per-entity grids via repeat/arange arithmetic, filled with
    segmented_searchsorted; ticks snap to the global grid so entities
    align. Oracle: DuckDB ASOF JOIN against integer-built grid ticks."""
    from pymhealth_ray.stages.resample import resample_ffill

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "n_tok"])
    out = resample_ffill(ds, "doc_id", "ts_ns", ["n_tok"], step=HOUR_NS,
                         num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        return _cast_cols(b, {"n_tok": pa.int64()})

    return out.map_batches(finish, batch_format="pyarrow")


def sql_seq_resample(path: str) -> str:
    return f"""
WITH s AS (
  SELECT doc_id, ts_ns, CAST(n_tok AS BIGINT) AS n_tok
  FROM read_parquet('{path}/part-*.parquet')
), b AS (
  SELECT doc_id,
         (min(ts_ns) + {HOUR_NS} - 1) // {HOUR_NS} AS g0,
         max(ts_ns) // {HOUR_NS} AS g1
  FROM s GROUP BY doc_id
), g AS (
  SELECT doc_id, (g0 + i) * {HOUR_NS} AS grid_ts
  FROM b, LATERAL unnest(generate_series(0, g1 - g0)) AS u(i)
)
SELECT g.doc_id, g.grid_ts, s.n_tok
FROM g ASOF JOIN s ON g.doc_id = s.doc_id AND g.grid_ts >= s.ts_ns
"""


# --------------------------------------------------------------------------
# rolling correlation (two-column trailing-window statistic)
# --------------------------------------------------------------------------


def q_seq_rolling_corr(sf_dir: str):
    """Trailing 16-row Pearson corr(n_tok, tok_sum) per entity —
    stages/rolling.py rolling_corr: exact int64 cumsum-difference window
    sums (no float cancellation), split-sqrt final division, NULL on
    zero-variance windows. Token sums come from the vectorized
    token_features kernel."""
    from pymhealth_ray.stages.rolling import rolling_corr

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "n_tok", "tokens"])
    feat = token_features(ds, features=("sum",), drop_tokens=True)
    out = rolling_corr(feat, "doc_id", "ts_ns", "n_tok", "tok_sum",
                       window=16, num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(["doc_id", "ts_ns", "n_tok", "tok_sum", "corr"])
        b = _cast_cols(b, {"n_tok": pa.int64(), "tok_sum": pa.int64()})
        return _round_cols(b, {"corr": 6})

    return out.map_batches(finish, batch_format="pyarrow")


def sql_seq_rolling_corr(path: str) -> str:
    return f"""
WITH s AS (
  SELECT doc_id, ts_ns, CAST(n_tok AS BIGINT) AS x,
         CAST(list_aggregate(tokens, 'sum') AS BIGINT) AS y
  FROM read_parquet('{path}/part-*.parquet')
), w AS (
  SELECT doc_id, ts_ns, x, y,
         count(*) OVER w AS n,
         CAST(sum(x) OVER w AS BIGINT) AS sx,
         CAST(sum(y) OVER w AS BIGINT) AS sy,
         CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
         CAST(sum(y * y) OVER w AS BIGINT) AS syy,
         CAST(sum(x * y) OVER w AS BIGINT) AS sxy
  FROM s
  WINDOW w AS (PARTITION BY doc_id ORDER BY ts_ns
               ROWS BETWEEN 15 PRECEDING AND CURRENT ROW)
)
SELECT doc_id, ts_ns, x AS n_tok, y AS tok_sum,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN round(CAST(n * sxy - sx * sy AS DOUBLE) /
                       (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
                        sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
            ELSE NULL END AS corr
FROM w
"""


# --------------------------------------------------------------------------
# token-distribution drift (two-sample KL contributors)
# --------------------------------------------------------------------------


def q_seq_drift(sf_dir: str):
    """Top-25 tokens by smoothed KL contribution between the web slice and
    the rest of the corpus — stages/drift.py: vocab-bounded count partials,
    one (tok, cp, cq) exchange, map-side partial top-k. Exact int counts;
    float work mirrors the SQL expression shape."""
    from pymhealth_ray.stages.drift import token_drift_topk

    ds, _ = _seq_ds(sf_dir, ["source", "tokens"])

    def flag(b: pa.Table) -> pa.Table:
        return b.append_column("inp", pc.equal(b["source"], "web"))

    return token_drift_topk(ds.map_batches(flag, batch_format="pyarrow"),
                            "tokens", "inp", k=25)


def sql_seq_drift(path: str) -> str:
    expr = ("(CAST(cp + 1 AS DOUBLE) / (np + v)) * "
            "ln((CAST(cp + 1 AS DOUBLE) / (np + v)) / "
            "(CAST(cq + 1 AS DOUBLE) / (nq + v)))")
    return f"""
WITH f AS (
  SELECT source = 'web' AS inp, unnest(tokens) AS tok
  FROM read_parquet('{path}/part-*.parquet')
), c AS (
  SELECT CAST(tok AS BIGINT) AS tok,
         CAST(sum(CASE WHEN inp THEN 1 ELSE 0 END) AS BIGINT) AS cp,
         CAST(sum(CASE WHEN inp THEN 0 ELSE 1 END) AS BIGINT) AS cq
  FROM f GROUP BY 1
), t AS (
  SELECT CAST(sum(cp) AS BIGINT) AS np, CAST(sum(cq) AS BIGINT) AS nq,
         count(*) AS v FROM c
)
SELECT tok, cp, cq, round({expr}, 6) AS contrib,
       CAST(row_number() OVER (ORDER BY round({expr}, 6) DESC, tok)
            AS BIGINT) AS rn
FROM c CROSS JOIN t
ORDER BY contrib DESC, tok
LIMIT 25
"""


# --------------------------------------------------------------------------
# exact distributed anti-join
# --------------------------------------------------------------------------


def q_orders_anti_returned(sf_dir: str):
    """Orders with NO returned lineitem — exact large-large anti-join:
    stages/join.py equi_join with pyarrow 'left anti' per co-partitioned
    bucket (co-partitioning makes per-bucket anti globally correct, unlike
    the probabilistic bloom semi-join in orders_bloom_semi)."""
    from pymhealth_ray.stages.join import equi_join

    orders = read_table(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey", "o_totalprice"])
    li = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_orderkey", "l_returnflag"])

    def returned(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["l_returnflag"], "R"))
        return pa.table({"o_orderkey": b["l_orderkey"]})

    right = li.map_batches(returned, batch_format="pyarrow")
    out = equi_join(orders, right, on="o_orderkey", join_type="left anti",
                    num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(["o_orderkey", "o_custkey", "o_totalprice"])
        return _round_cols(b, {"o_totalprice": 2})

    return out.map_batches(finish, batch_format="pyarrow")


SQL_ORDERS_ANTI_RETURNED = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
"""


# --------------------------------------------------------------------------
# k-means cluster assignment over embeddings
# --------------------------------------------------------------------------


def q_embed_kmeans(sf_dir: str):
    """Cosine k-means assignment of every embedding to deterministic
    seeded centroids (stages/ann.train_ivf_centroids, 8 clusters) —
    centroids broadcast once via ray.put, per-batch float64 matmul
    assignment. Oracle: the same single-process training + a full-matrix
    assignment, so a hash match proves the distributed assignment path."""
    from pymhealth_ray.stages.ann import _emb_matrix, _unit, train_ivf_centroids

    ds = read_table(f"{sf_dir}/embeddings.parquet",
                    columns=["vec_id", "embedding"])
    # sort by id: ds.limit() row ORDER follows block arrival (round-3
    # lesson) and the centroid trainer is sample-order-dependent; the
    # oracle's file-order slice is vec_id-sorted
    sample_tbl = pa.Table.from_pandas(
        ds.limit(2048).to_pandas().sort_values("vec_id").reset_index(drop=True))
    sample = _emb_matrix(sample_tbl, "embedding").astype(np.float64)
    cent = train_ivf_centroids(sample, n_centroids=8).astype(np.float64)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _unit(_emb_matrix(batch, "embedding").astype(np.float64))
        sims = m @ c.T
        lab = np.argmax(sims, axis=1)
        best = sims[np.arange(len(lab)), lab]
        return pa.table({
            "vec_id": batch["vec_id"].cast(pa.int64()),
            "cluster": pa.array(lab.astype(np.int64)),
            "sim": pa.array(_round_away(best, 6)),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def _kmeans_expected(sf_dir: str):
    import pandas as pd

    from pymhealth_ray.stages.ann import _unit, train_ivf_centroids

    import pyarrow.parquet as pq_mod
    tbl = pq_mod.read_table(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    emb = np.stack(tbl["embedding"].to_pandas().to_numpy()).astype(np.float64)
    cent = train_ivf_centroids(emb[:2048], n_centroids=8).astype(np.float64)
    m = _unit(emb)
    sims = m @ cent.T
    lab = np.argmax(sims, axis=1)
    best = sims[np.arange(len(lab)), lab]
    return pd.DataFrame({
        "vec_id": tbl["vec_id"].to_pandas().astype(np.int64),
        "cluster": lab.astype(np.int64),
        "sim": _round_away(best, 6),
    })


def _kmeans_oracle(sf_dir: str) -> str:
    import os

    import pyarrow.parquet as pq_mod

    name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/pymhealth_ray_fixtures/kmeans_{name}_v1"
    out = os.path.join(out_dir, "expected.parquet")
    if not os.path.exists(out):
        os.makedirs(out_dir, exist_ok=True)
        exp = _kmeans_expected(sf_dir)
        tmp = out + ".tmp"
        pq_mod.write_table(pa.Table.from_pandas(exp, preserve_index=False), tmp)
        os.replace(tmp, out)
    return f"SELECT * FROM read_parquet('{out}')"


def q_embed_semdedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023) semantic near-dup removal:
    k-means-cluster the embeddings, ONE exchange on the cluster id, then
    per-cluster pairwise-cosine dup graph → local union-find → keep the
    min-id member per component (stages/semdedup.py). Oracle:
    single-process replication (materialized parquet passthrough)."""
    from pymhealth_ray.stages.semdedup import semantic_dedup

    ds = read_table(f"{sf_dir}/embeddings.parquet",
                    columns=["vec_id", "embedding"])
    return semantic_dedup(ds, n_clusters=8, threshold=0.9)


def _semdedup_expected(sf_dir: str):
    """Single-process SemDeDup replication (numpy only)."""
    import pandas as pd
    import pyarrow.parquet as pq_mod

    from pymhealth_ray.stages.ann import _unit, train_ivf_centroids
    from pymhealth_ray.stages.semdedup import _local_components

    tbl = pq_mod.read_table(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    ids_all = tbl["vec_id"].to_pandas().to_numpy().astype(np.int64)
    emb = np.stack(tbl["embedding"].to_pandas().to_numpy()).astype(np.float64)
    order = np.argsort(ids_all)
    ids_all, emb = ids_all[order], emb[order]
    cent = train_ivf_centroids(emb[:2048], n_centroids=8).astype(np.float64)
    m = _unit(emb)
    lab = np.argmax(m @ cent.T, axis=1)
    out = {"vec_id": [], "cluster": [], "rep_id": [], "keep": []}
    for cl in np.unique(lab):
        sel = np.flatnonzero(lab == cl)  # already id-sorted
        sims = m[sel] @ m[sel].T
        iu, ju = np.triu_indices(len(sel), k=1)
        hit = sims[iu, ju] > 0.9
        comp = _local_components(len(sel), iu[hit], ju[hit])
        rep = ids_all[sel][comp]
        out["vec_id"].extend(ids_all[sel].tolist())
        out["cluster"].extend([int(cl)] * len(sel))
        out["rep_id"].extend(rep.tolist())
        out["keep"].extend((rep == ids_all[sel]).tolist())
    return pd.DataFrame({
        "vec_id": np.array(out["vec_id"], dtype=np.int64),
        "cluster": np.array(out["cluster"], dtype=np.int64),
        "rep_id": np.array(out["rep_id"], dtype=np.int64),
        "keep": np.array(out["keep"], dtype=bool),
    })


def _semdedup_oracle(sf_dir: str) -> str:
    import os

    import pyarrow.parquet as pq_mod

    name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/pymhealth_ray_fixtures/semdedup_{name}_v1"
    out = os.path.join(out_dir, "expected.parquet")
    if not os.path.exists(out):
        os.makedirs(out_dir, exist_ok=True)
        exp = _semdedup_expected(sf_dir)
        tmp = out + ".tmp"
        pq_mod.write_table(pa.Table.from_pandas(exp, preserve_index=False), tmp)
        os.replace(tmp, out)
    return f"SELECT * FROM read_parquet('{out}')"


# --------------------------------------------------------------------------
# distributed PCA (exact integer scatter partials)
# --------------------------------------------------------------------------


def q_embed_diversity(sf_dir: str):
    """Corpus embedding DIVERSITY: exact mean pairwise squared distance
    via the sum-vector identity (stages/pca.embedding_dispersion) — the
    pairwise statistic with NO pairwise computation: one streaming pass,
    per-dim integer sums, python-int driver finish mirroring the SQL
    HUGEINT → DOUBLE cast chain bit-for-bit. Half-away quantization at
    2^18 matches SQL ROUND."""
    from pymhealth_ray.stages.pca import embedding_dispersion

    ds = read_table(f"{sf_dir}/embeddings.parquet",
                    columns=["vec_id", "embedding"])
    r = embedding_dispersion(ds)
    n, A, B = r["n"], r["A"], r["B"]
    mpsd = (float(n * B - A) * 2 / (float(n) * float(n - 1))
            / 262144.0 / 262144.0)
    return pa.table({
        "n_vectors": pa.array([n], type=pa.int64()),
        "mean_pairwise_sq_dist": pa.array([mpsd], type=pa.float64()),
    })


SQL_EMBED_DIVERSITY = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
           FROM embeddings),
xs AS (SELECT vec_id, unnest(emb) AS x, generate_subscripts(emb, 1) AS d
       FROM e),
qs AS (SELECT d, CAST(round(x * 262144) AS BIGINT) AS qv FROM xs),
agg AS (SELECT d, CAST(sum(qv) AS HUGEINT) AS sd,
               CAST(sum(CAST(qv AS HUGEINT) * qv) AS HUGEINT) AS bd
        FROM qs GROUP BY d),
t AS (SELECT CAST(sum(sd * sd) AS HUGEINT) AS A,
             CAST(sum(bd) AS HUGEINT) AS B FROM agg),
c AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM e)
SELECT CAST(n AS BIGINT) AS n_vectors,
       CAST(n * B - A AS DOUBLE) * 2
         / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))
         / 262144.0 / 262144.0 AS mean_pairwise_sq_dist
FROM t, c
"""


MG_K, MG_TOP = 64, 10


def q_seq_heavy_hitters(sf_dir: str):
    """Misra–Gries HEAVY HITTERS over the corpus token stream: one
    k-counter summary per input file (parallel tasks, bounded memory
    whatever the vocabulary), folded in sorted-path order — MG merging
    is commutative but NOT associative, so a scheduler-dependent fold
    would break determinism (stages/sketch.misra_gries_topk). Output:
    top-10 by estimated count with the global undercount bound. Every
    item with true frequency > n/(k+1) is guaranteed to survive the
    summary (pytest-verified against exact counts)."""
    import glob

    from pymhealth_ray.stages.sketch import misra_gries_topk

    _, path = _seq_ds(sf_dir, ["tokens"])
    paths = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    return misra_gries_topk(paths, "tokens", k=MG_K, top=MG_TOP)


def _mg_oracle(path: str) -> str:
    """Single-process fold of the identical per-file summaries (no Ray —
    only the parallel summary computation differs)."""
    import glob

    import pyarrow.parquet as pq_mod

    from pymhealth_ray.stages.sketch import (_mg_merge,
                                             misra_gries_file_summary)

    out = os.path.join(path, "_oracle_mg_topk_v1.parquet")
    if not os.path.exists(out):
        paths = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
        acc = (np.zeros(0, np.int64), np.zeros(0, np.int64), 0)
        for p in paths:
            acc = _mg_merge(acc, misra_gries_file_summary(p, "tokens",
                                                          MG_K), MG_K)
        keys, counts, err = acc
        order = np.lexsort((keys, -counts))[:MG_TOP]
        tbl = pa.table({
            "token": pa.array(keys[order]),
            "est_count": pa.array(counts[order]),
            "max_undercount": pa.array(np.full(len(order), err,
                                               dtype=np.int64)),
        })
        pq_mod.write_table(tbl, out + ".tmp")
        os.replace(out + ".tmp", out)
    return f"SELECT * FROM read_parquet('{out}')"


def q_embed_pca(sf_dir: str):
    """Project every embedding onto the corpus' top-2 principal directions
    — stages/pca.py: per-block EXACT integer scatter partials (quantized
    embeddings, chunked f64 BLAS under 2^53), python-int driver merge, one
    LAPACK eigh, map-only projection. Bit-identical under any
    partitioning; the oracle recomputes single-process."""
    from pymhealth_ray.stages.pca import pca_components, pca_project

    ds = read_table(f"{sf_dir}/embeddings.parquet",
                    columns=["vec_id", "embedding"])
    comp = pca_components(ds, k=2)
    out = pca_project(ds, comp)

    def finish(b: pa.Table) -> pa.Table:
        return _round_cols(b, {"pc1": 6, "pc2": 6})

    return out.map_batches(finish, batch_format="pyarrow")


def _pca_expected(sf_dir: str):
    import pandas as pd
    import pyarrow.parquet as pq_mod

    from pymhealth_ray.stages.pca import _quantize

    tbl = pq_mod.read_table(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    emb = np.stack(tbl["embedding"].to_pandas().to_numpy())
    q = _quantize(emb, 18)
    d = q.shape[1]
    n = len(q)
    # exact integer scatter via python ints, organized differently from the
    # engine (whole-matrix int64 accumulation in 512-row chunks)
    ss = np.zeros((d, d), dtype=np.int64)
    s = np.zeros(d, dtype=np.int64)
    for i in range(0, n, 512):
        c = q[i:i + 512]
        ss += (c.T @ c).astype(np.int64)
        s += c.sum(axis=0).astype(np.int64)
    m = np.empty((d, d))
    for r in range(d):
        for c_ in range(d):
            m[r, c_] = float(int(n) * int(ss[r, c_]) - int(s[r]) * int(s[c_]))
    vals, vecs = np.linalg.eigh(m)
    comp = vecs[:, ::-1][:, :2].T.copy()
    for i in range(2):
        j = int(np.argmax(np.abs(comp[i])))
        if comp[i, j] < 0:
            comp[i] = -comp[i]
    proj = (q / float(1 << 18)) @ comp.T
    mlt = 1e6
    r6 = lambda x: np.sign(x) * np.floor(np.abs(x) * mlt + 0.5) / mlt
    return pd.DataFrame({
        "vec_id": tbl["vec_id"].to_pandas().astype(np.int64),
        "pc1": r6(proj[:, 0]),
        "pc2": r6(proj[:, 1]),
    })


def _pca_oracle(sf_dir: str) -> str:
    import os

    import pyarrow.parquet as pq_mod

    name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/pymhealth_ray_fixtures/pca_{name}_v1"
    out = os.path.join(out_dir, "expected.parquet")
    if not os.path.exists(out):
        os.makedirs(out_dir, exist_ok=True)
        exp = _pca_expected(sf_dir)
        tmp = out + ".tmp"
        pq_mod.write_table(pa.Table.from_pandas(exp, preserve_index=False), tmp)
        os.replace(tmp, out)
    return f"SELECT * FROM read_parquet('{out}')"


# --------------------------------------------------------------------------
# group-wise z-score normalization (broadcast statistics)
# --------------------------------------------------------------------------


def q_seq_zscore(sf_dir: str):
    """Per-source z-score of n_tok — stages/normalize.py: exact-int
    (n, Σx, Σx²) partials, tiny groupby, broadcast stats, stateless
    normalize map. Two linear scans, zero row exchange."""
    from pymhealth_ray.stages.normalize import zscore_by_group

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "source", "n_tok"])
    out = zscore_by_group(ds, "source", "n_tok")

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(["doc_id", "ts_ns", "source", "n_tok", "z"])
        b = _cast_cols(b, {"n_tok": pa.int64()})
        return _round_cols(b, {"z": 6})

    return out.map_batches(finish, batch_format="pyarrow")


def sql_seq_zscore(path: str) -> str:
    return f"""
WITH s AS (
  SELECT doc_id, ts_ns, source, CAST(n_tok AS BIGINT) AS x
  FROM read_parquet('{path}/part-*.parquet')
), g AS (
  SELECT source, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM s GROUP BY source
)
SELECT doc_id, ts_ns, source, x AS n_tok,
       CASE WHEN n > 1 AND n * sxx - sx * sx > 0
            THEN round((CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / n) /
                       sqrt(CAST(n * sxx - sx * sx AS DOUBLE) /
                            (CAST(n AS DOUBLE) * (n - 1))), 6)
            ELSE NULL END AS z
FROM s JOIN g USING (source)
"""


# --------------------------------------------------------------------------
# token-native bigram LM scoring
# --------------------------------------------------------------------------


def q_seq_bigram_nll(sf_dir: str):
    """Mean add-one-smoothed bigram NLL per sequence — stages/lm.bigram_nll:
    corpus-trained adjacent-pair counts (one vocab²-bounded exchange),
    32 MB dense broadcast, vectorized lookup + reduceat scoring. Exact int
    counts; ln/round-6 expression mirrors the SQL oracle."""
    from pymhealth_ray.stages.lm import bigram_nll

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "tokens"])
    out = bigram_nll(ds, "tokens", id_cols=("doc_id", "ts_ns"))

    def finish(b: pa.Table) -> pa.Table:
        return _round_cols(b, {"nll_mean": 6})

    return out.map_batches(finish, batch_format="pyarrow")


def sql_seq_bigram_nll(path: str) -> str:
    return f"""
WITH src AS (
  SELECT doc_id, ts_ns, tokens FROM read_parquet('{path}/part-*.parquet')
), p AS (
  SELECT doc_id, ts_ns, CAST(tokens[i] AS BIGINT) AS a,
         CAST(tokens[i + 1] AS BIGINT) AS b
  FROM src, LATERAL unnest(generate_series(1, len(tokens) - 1)) AS u(i)
), cab AS (
  SELECT a, b, count(*) AS c FROM p GROUP BY a, b
), ca AS (
  SELECT a, count(*) AS c FROM p GROUP BY a
), v AS (
  SELECT count(DISTINCT tok) AS v
  FROM (SELECT unnest(tokens) AS tok FROM src)
), sc AS (
  SELECT p.doc_id, p.ts_ns, count(*) AS n_slots,
         round(-sum(ln(CAST(cab.c + 1 AS DOUBLE) / (ca.c + v.v)))
               / count(*), 6) AS nll_mean
  FROM p JOIN cab USING (a, b) JOIN ca USING (a) CROSS JOIN v
  GROUP BY p.doc_id, p.ts_ns
)
SELECT src.doc_id, src.ts_ns,
       CAST(coalesce(sc.n_slots, 0) AS BIGINT) AS n_slots, sc.nll_mean
FROM src LEFT JOIN sc USING (doc_id, ts_ns)
"""


# --------------------------------------------------------------------------
# time-decay EWMA (irregular timestamps)
# --------------------------------------------------------------------------

_TD_TAU_NS = 2.0 * HOUR_NS


def q_seq_ewma_td(sf_dir: str):
    """Per-entity time-decay EWMA of n_tok (τ = 2 h, weight exp(-Δt/τ)) —
    stages/ewma.ewma_time_decay: anchor-renormalized chunked scan with
    time-span guards. Oracle: independent single-process sequential
    recurrence num = x + e^{-Δt/τ}·num."""
    from pymhealth_ray.stages.ewma import ewma_time_decay

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "n_tok"])
    out = ewma_time_decay(ds, "doc_id", "ts_ns", "n_tok", tau=_TD_TAU_NS,
                          num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(["doc_id", "ts_ns", "n_tok", "ewma_td"])
        b = _cast_cols(b, {"n_tok": pa.int64()})
        return _round_cols(b, {"ewma_td": 6})

    return out.map_batches(finish, batch_format="pyarrow")


def _ewma_td_expected(src: pa.Table):
    import pandas as pd

    df = (src.to_pandas()
          .sort_values(["doc_id", "ts_ns"], kind="mergesort")
          .reset_index(drop=True))
    out = np.empty(len(df), dtype=np.float64)
    for _, g in df.groupby("doc_id", sort=False):
        x = g["n_tok"].to_numpy(dtype=np.float64)
        t = g["ts_ns"].to_numpy(dtype=np.float64)
        num = den = 0.0
        y = np.empty(len(x), dtype=np.float64)
        for i in range(len(x)):
            if i:
                d = np.exp(-(t[i] - t[i - 1]) / _TD_TAU_NS)
                num *= d
                den *= d
            num += x[i]
            den += 1.0
            y[i] = num / den
        out[g.index.to_numpy()] = y
    m = 1e6
    ew = np.sign(out) * np.floor(np.abs(out) * m + 0.5) / m
    return pd.DataFrame({
        "doc_id": df["doc_id"],
        "ts_ns": df["ts_ns"].astype(np.int64),
        "n_tok": df["n_tok"].astype(np.int64),
        "ewma_td": ew,
    })


def sql_seq_ewma_td(path: str) -> str:
    return _materialized_oracle(path, "ewma_td_v1", _ewma_td_expected,
                                columns=("doc_id", "ts_ns", "n_tok"))


# --------------------------------------------------------------------------
# per-group quantile bucketing
# --------------------------------------------------------------------------


def q_seq_qbucket(sf_dir: str):
    """Quartile bucket of n_tok within each source —
    stages/normalize.bucket_by_group_quantiles: exact distributed
    quantile_disc thresholds broadcast into a stateless assignment map."""
    from pymhealth_ray.stages.normalize import bucket_by_group_quantiles

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "source", "n_tok"])
    out = bucket_by_group_quantiles(ds, "source", "n_tok")

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(["doc_id", "ts_ns", "source", "n_tok", "qbucket"])
        return _cast_cols(b, {"n_tok": pa.int64()})

    return out.map_batches(finish, batch_format="pyarrow")


def sql_seq_qbucket(path: str) -> str:
    return f"""
WITH s AS (
  SELECT doc_id, ts_ns, source, CAST(n_tok AS BIGINT) AS n_tok
  FROM read_parquet('{path}/part-*.parquet')
), g AS (
  SELECT source,
         quantile_disc(n_tok, 0.25) AS q25,
         quantile_disc(n_tok, 0.50) AS q50,
         quantile_disc(n_tok, 0.75) AS q75
  FROM s GROUP BY source
)
SELECT doc_id, ts_ns, source, n_tok,
       CAST(CASE WHEN n_tok <= q25 THEN 1
                 WHEN n_tok <= q50 THEN 2
                 WHEN n_tok <= q75 THEN 3
                 ELSE 4 END AS BIGINT) AS qbucket
FROM s JOIN g USING (source)
"""


# --------------------------------------------------------------------------
# csv source + hive-partitioned sink roundtrips
# --------------------------------------------------------------------------


def _csv_fixture(sf_dir: str) -> str:
    import os

    import duckdb

    name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/pymhealth_ray_fixtures/csv_{name}_v1"
    out = os.path.join(out_dir, "documents.csv")
    marker = os.path.join(out_dir, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(out_dir, exist_ok=True)
        duckdb.sql(
            f"COPY (SELECT doc_id, lang, text FROM "
            f"'{sf_dir}/documents.parquet' ORDER BY doc_id) "
            f"TO '{out}' (FORMAT CSV, HEADER)")
        with open(marker, "w") as f:
            f.write("ok")
    return out


def q_docs_csv_roundtrip(sf_dir: str):
    """Ingest the CSV drop of the documents table (sources/io.read_csv —
    ray.data.read_csv + map-side projection) and recompute per-doc length
    + content digest; the oracle reads the parquet original, so a hash
    match proves the CSV path (RFC4180 quoting included) is lossless."""
    from pymhealth_ray.sources.io import read_csv

    path = _csv_fixture(sf_dir)
    ds = read_csv(path, columns=["doc_id", "lang", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        txt = batch["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        md5s = [hashlib.md5(t.encode()).hexdigest() for t in txt.to_pylist()]
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "lang": batch["lang"],
            "n_chars": pc.utf8_length(txt).cast(pa.int64()),
            "text_md5": pa.array(md5s, type=pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_DOCS_CSV_ROUNDTRIP = """
SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars,
       md5(text) AS text_md5
FROM documents
"""


def q_docs_partitioned_sink(sf_dir: str):
    """Write documents through the hive-partitioned sink
    (sources/io.write_partitioned, one directory per lang), read every
    partition back, and aggregate — a write→read roundtrip the oracle
    checks against the parquet original. Proves routing, atomic layout,
    and that no rows are lost or duplicated across partitions."""
    import os

    from pymhealth_ray.sources.io import write_partitioned

    name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/pymhealth_ray_out/partitioned_docs_{name}"
    ds = read_table(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "lang", "n_chars"])
    langs = write_partitioned(ds, out_dir, "lang")
    assert langs  # at least one partition written
    # hive layout: read the root once; the partition column is inferred
    # from the lang=<value> directory names (pruned reads at scale would
    # pass a path filter instead)
    unioned = read_table(out_dir)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("lang").aggregate(
            [("doc_id", "count"), ("n_chars", "sum"), ("doc_id", "max")])
        return g.rename_columns(["lang", "n_docs", "sum_chars", "max_doc"])

    def final(tbl: pa.Table) -> pa.Table:
        g = tbl.group_by("lang").aggregate(
            [("n_docs", "sum"), ("sum_chars", "sum"), ("max_doc", "max")])
        return g.rename_columns(["lang", "n_docs", "sum_chars", "max_doc"])

    return (unioned.map_batches(partial, batch_format="pyarrow",
                                batch_size=None)
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None))


SQL_DOCS_PARTITIONED_SINK = """
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       max(doc_id) AS max_doc
FROM documents GROUP BY lang
"""


# --------------------------------------------------------------------------
# composed feature-matrix pipeline (third-wave ops interoperating)
# --------------------------------------------------------------------------


def q_seq_feature_matrix(sf_dir: str):
    """COMPOSED feature-engineering chain — source-mixture sampling →
    per-source z-score → per-source quantile bucket → per-entity
    cumulative features, every stage the engine's own operator
    (stages/sample, normalize, cumulative), statistics computed on the
    SAMPLED subset. One entity exchange + two broadcast scans total; the
    oracle reproduces the whole chain in a single SQL statement, so a
    hash match proves the stages compose without order/stat leakage."""
    from pymhealth_ray.stages.cumulative import cumulative_features
    from pymhealth_ray.stages.normalize import (
        bucket_by_group_quantiles,
        zscore_by_group,
    )
    from pymhealth_ray.stages.sample import stratified_sample

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "source", "n_tok"])

    def add_key(b: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            b["doc_id"].cast(pa.string()),
            b["ts_ns"].cast(pa.string()), "-")
        return b.append_column("k", k)

    sampled = stratified_sample(ds.map_batches(add_key, batch_format="pyarrow"),
                                "source", "k", _MIXTURE_RATES, salt="0")
    scored = zscore_by_group(sampled, "source", "n_tok")
    bucketed = bucket_by_group_quantiles(scored, "source", "n_tok")
    out = cumulative_features(bucketed, "doc_id", "ts_ns", "n_tok",
                              num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(["doc_id", "ts_ns", "source", "n_tok", "z", "qbucket",
                      "cum_sum", "seq_idx"])
        b = _cast_cols(b, {"n_tok": pa.int64()})
        return _round_cols(b, {"z": 6})

    return out.map_batches(finish, batch_format="pyarrow")


def sql_seq_feature_matrix(path: str) -> str:
    from pymhealth_ray.stages.sample import _threshold_hex

    case = " ".join(
        f"WHEN '{s}' THEN '{_threshold_hex(r)}'"
        for s, r in _MIXTURE_RATES.items())
    return f"""
WITH sampled AS (
  SELECT doc_id, ts_ns, source, CAST(n_tok AS BIGINT) AS n_tok
  FROM read_parquet('{path}/part-*.parquet')
  WHERE substr(md5(doc_id || '-' || CAST(ts_ns AS VARCHAR) || '-0'), 1, 8)
        < CASE source {case} ELSE '00000000' END
), g AS (
  SELECT source, count(*) AS n, CAST(sum(n_tok) AS BIGINT) AS sx,
         CAST(sum(n_tok * n_tok) AS BIGINT) AS sxx,
         quantile_disc(n_tok, 0.25) AS q25,
         quantile_disc(n_tok, 0.50) AS q50,
         quantile_disc(n_tok, 0.75) AS q75
  FROM sampled GROUP BY source
)
SELECT doc_id, ts_ns, source, n_tok,
       CASE WHEN n > 1 AND n * sxx - sx * sx > 0
            THEN round((CAST(n_tok AS DOUBLE) - CAST(sx AS DOUBLE) / n) /
                       sqrt(CAST(n * sxx - sx * sx AS DOUBLE) /
                            (CAST(n AS DOUBLE) * (n - 1))), 6)
            ELSE NULL END AS z,
       CAST(CASE WHEN n_tok <= q25 THEN 1
                 WHEN n_tok <= q50 THEN 2
                 WHEN n_tok <= q75 THEN 3
                 ELSE 4 END AS BIGINT) AS qbucket,
       CAST(sum(n_tok) OVER w AS BIGINT) AS cum_sum,
       CAST(row_number() OVER w AS BIGINT) AS seq_idx
FROM sampled JOIN g USING (source)
WINDOW w AS (PARTITION BY doc_id ORDER BY ts_ns
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# robust MAD outlier flags
# --------------------------------------------------------------------------


def q_seq_mad_outliers(sf_dir: str):
    """Per-source robust outliers (|x − median| > 3·MAD) —
    stages/normalize.mad_outliers: two broadcast exact-quantile passes,
    integer comparisons throughout."""
    from pymhealth_ray.stages.normalize import mad_outliers

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "source", "n_tok"])
    out = mad_outliers(ds, "source", "n_tok", k=3.0)

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(["doc_id", "ts_ns", "source", "n_tok", "adev",
                      "is_outlier"])
        return _cast_cols(b, {"n_tok": pa.int64()})

    return out.map_batches(finish, batch_format="pyarrow")


def sql_seq_mad_outliers(path: str) -> str:
    return f"""
WITH s AS (
  SELECT doc_id, ts_ns, source, CAST(n_tok AS BIGINT) AS n_tok
  FROM read_parquet('{path}/part-*.parquet')
), m AS (
  SELECT source, quantile_disc(n_tok, 0.5) AS med FROM s GROUP BY source
), a AS (
  SELECT s.*, abs(n_tok - med) AS adev FROM s JOIN m USING (source)
), d AS (
  SELECT source, quantile_disc(adev, 0.5) AS mad FROM a GROUP BY source
)
SELECT doc_id, ts_ns, source, n_tok, adev, adev > 3.0 * mad AS is_outlier
FROM a JOIN d USING (source)
"""


# --------------------------------------------------------------------------
# approximate quantiles via deterministic bottom-k sampling
# --------------------------------------------------------------------------


def q_seq_approx_quantiles(sf_dir: str):
    """Approximate per-source quantiles from a FIXED-SIZE deterministic
    sample: md5-priority bottom-k per group (stages/sample.grouped_sample_k
    — mergeable min-merge, so the sample is partitioning-invariant) then
    exact quantiles of the sample (stages/aggregate.grouped_quantiles).
    Sample size is constant per group no matter how large the data grows —
    the unbounded-domain alternative to the exact histogram quantiles."""
    from pymhealth_ray.stages.aggregate import grouped_quantiles
    from pymhealth_ray.stages.sample import grouped_sample_k

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "source", "n_tok"])

    def add_key(b: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            b["doc_id"].cast(pa.string()),
            b["ts_ns"].cast(pa.string()), "-")
        return b.append_column("k", k)

    sampled = grouped_sample_k(ds.map_batches(add_key, batch_format="pyarrow"),
                               ["source"], "k", k=500, salt="0",
                               num_buckets=NB)
    out = grouped_quantiles(sampled, ["source"], "n_tok",
                            qs=(0.25, 0.5, 0.75), num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(["source", "q25", "q50", "q75", "n"])
        return _cast_cols(b, {"q25": pa.int64(), "q50": pa.int64(),
                              "q75": pa.int64()})

    return out.map_batches(finish, batch_format="pyarrow")


def sql_seq_approx_quantiles(path: str) -> str:
    return f"""
WITH s AS (
  SELECT source, CAST(n_tok AS BIGINT) AS n_tok,
         doc_id || '-' || CAST(ts_ns AS VARCHAR) AS k
  FROM read_parquet('{path}/part-*.parquet')
), r AS (
  SELECT source, n_tok,
         row_number() OVER (PARTITION BY source
                            ORDER BY substr(md5(k || '-0'), 1, 16), k) AS rn
  FROM s
)
SELECT source,
       quantile_disc(n_tok, 0.25) AS q25,
       quantile_disc(n_tok, 0.50) AS q50,
       quantile_disc(n_tok, 0.75) AS q75,
       count(*) AS n
FROM r WHERE rn <= 500 GROUP BY source
"""


# --------------------------------------------------------------------------
# integer PageRank over the token-transition graph
# --------------------------------------------------------------------------


def q_seq_pagerank(sf_dir: str):
    """Top-25 tokens by 10-iteration INTEGER PageRank over adjacent-token
    transitions — stages/graph.pagerank_tokens: vocab-sized broadcast
    ranks, one map-only inflow pass per iteration, all-int64 floor-division
    updates (bit-identical under any partitioning). Oracle: single-process
    replication from independently-counted pairs."""
    from pymhealth_ray.stages.graph import pagerank_tokens

    ds, _ = _seq_ds(sf_dir, ["tokens"])
    return pagerank_tokens(ds, iters=10, k=25)


def _pagerank_expected(src: pa.Table):
    import pandas as pd
    from collections import Counter

    K = 2048
    scale = 10**12
    toks = src["tokens"]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    pairs = Counter()
    for lst in toks.to_pylist():
        for i in range(len(lst) - 1):
            pairs[(lst[i], lst[i + 1])] += 1
    W = np.zeros(K, dtype=np.int64)
    seen = np.zeros(K, dtype=bool)
    for (a, b), c in pairs.items():
        W[a] += c
        seen[a] = True
        seen[b] = True
    nodes = np.flatnonzero(seen)
    V = len(nodes)
    r = np.zeros(K, dtype=np.int64)
    r[nodes] = scale // V
    base = 15 * (scale // V)
    edge = [(a, b, c) for (a, b), c in pairs.items()]
    for _ in range(10):
        inflow = np.zeros(K, dtype=np.int64)
        for a, b, c in edge:
            ra, wa = int(r[a]), int(W[a])
            inflow[b] += (ra // wa) * c + ((ra % wa) * c) // wa
        dangling = int(r[nodes][W[nodes] == 0].sum())
        new_r = np.zeros(K, dtype=np.int64)
        new_r[nodes] = (base + 85 * (inflow[nodes] + dangling // V)) // 100
        r = new_r
    order = np.lexsort((nodes, -r[nodes]))[:25]
    top = nodes[order]
    return pd.DataFrame({
        "tok": top.astype(np.int64),
        "rank": r[top],
        "rn": np.arange(1, len(top) + 1, dtype=np.int64),
    })


def sql_seq_pagerank(path: str) -> str:
    return _materialized_oracle(path, "pagerank_v1", _pagerank_expected,
                                columns=("tokens",))


# --------------------------------------------------------------------------
# as-of join with staleness tolerance; trailing-window z-score
# --------------------------------------------------------------------------


def q_seq_asof_fresh(sf_dir: str):
    """Last CHAT-sourced row's n_tok at-or-before each row, nulled when
    staler than 6 h — stages/asof.asof_join_tolerance (the feature-store
    freshness contract as a stateless post-mask over the as-of match)."""
    from pymhealth_ray.stages.asof import asof_join_tolerance

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "source", "n_tok"])

    def only_facts(b: pa.Table) -> pa.Table:
        return b.select(["doc_id", "ts_ns", "n_tok"])

    def only_dim(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["source"], "chat"))
        return (b.select(["doc_id", "ts_ns", "n_tok"])
                 .rename_columns(["doc_id", "ts_ns", "chat_tok"]))

    facts = ds.map_batches(only_facts, batch_format="pyarrow")
    dim = ds.map_batches(only_dim, batch_format="pyarrow").materialize()
    j = asof_join_tolerance(facts, dim, ["chat_tok"],
                            tolerance=6 * HOUR_NS, num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(["doc_id", "ts_ns", "n_tok", "chat_tok_asof",
                      "ts_ns_asof"])
        b = b.rename_columns(["doc_id", "ts_ns", "n_tok", "chat_tok",
                              "chat_ts"])
        return _cast_cols(b, {"n_tok": pa.int64(),
                              "chat_tok": pa.int64()})

    return j.map_batches(finish, batch_format="pyarrow")


def sql_seq_asof_fresh(path: str) -> str:
    return f"""
WITH s AS (
  SELECT doc_id, ts_ns, source, CAST(n_tok AS BIGINT) AS n_tok
  FROM read_parquet('{path}/part-*.parquet')
), d AS (
  SELECT doc_id, ts_ns AS c_ts, n_tok AS c_tok FROM s WHERE source = 'chat'
), j AS (
  SELECT s.doc_id, s.ts_ns, s.n_tok, d.c_tok, d.c_ts
  FROM s ASOF LEFT JOIN d ON s.doc_id = d.doc_id AND s.ts_ns >= d.c_ts
)
SELECT doc_id, ts_ns, n_tok,
       CASE WHEN ts_ns - c_ts <= {6 * HOUR_NS} THEN c_tok END AS chat_tok,
       CASE WHEN ts_ns - c_ts <= {6 * HOUR_NS} THEN c_ts END AS chat_ts
FROM j
"""


def q_seq_rolling_z(sf_dir: str):
    """Trailing 16-row z-score of n_tok per entity —
    stages/rolling.rolling_zscore (exact int64 window sums, NULL on
    degenerate windows): the temporal anomaly signal."""
    from pymhealth_ray.stages.rolling import rolling_zscore

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "n_tok"])
    out = rolling_zscore(ds, "doc_id", "ts_ns", "n_tok", window=16,
                         num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(["doc_id", "ts_ns", "n_tok", "rz"])
        b = _cast_cols(b, {"n_tok": pa.int64()})
        return _round_cols(b, {"rz": 6})

    return out.map_batches(finish, batch_format="pyarrow")


def sql_seq_rolling_z(path: str) -> str:
    return f"""
WITH s AS (
  SELECT doc_id, ts_ns, CAST(n_tok AS BIGINT) AS x
  FROM read_parquet('{path}/part-*.parquet')
), w AS (
  SELECT doc_id, ts_ns, x,
         count(*) OVER w AS n,
         CAST(sum(x) OVER w AS BIGINT) AS sx,
         CAST(sum(x * x) OVER w AS BIGINT) AS sxx
  FROM s
  WINDOW w AS (PARTITION BY doc_id ORDER BY ts_ns
               ROWS BETWEEN 15 PRECEDING AND CURRENT ROW)
)
SELECT doc_id, ts_ns, x AS n_tok,
       CASE WHEN n > 1 AND n * sxx - sx * sx > 0
            THEN round((CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / n) /
                       sqrt(CAST(n * sxx - sx * sx AS DOUBLE) /
                            (CAST(n AS DOUBLE) * (n - 1))), 6)
            ELSE NULL END AS rz
FROM w
"""


# --------------------------------------------------------------------------
# combined temporal feature pack (one exchange, many features)
# --------------------------------------------------------------------------


def q_seq_temporal_pack(sf_dir: str):
    """Six temporal features of n_tok in ONE entity exchange —
    stages/temporal.temporal_feature_pack (cumulative + trailing z +
    lag/diff share the same sorted segments; kernels identical to the
    standalone stages, oracle composes their verified SQL)."""
    from pymhealth_ray.stages.temporal import temporal_feature_pack

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "n_tok"])
    out = temporal_feature_pack(ds, "doc_id", "ts_ns", "n_tok", window=16,
                                num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(["doc_id", "ts_ns", "n_tok", "cum_sum", "cum_max",
                      "seq_idx", "rz", "lag1", "diff1"])
        b = _cast_cols(b, {"n_tok": pa.int64()})
        return _round_cols(b, {"rz": 6})

    return out.map_batches(finish, batch_format="pyarrow")


def sql_seq_temporal_pack(path: str) -> str:
    return f"""
WITH s AS (
  SELECT doc_id, ts_ns, CAST(n_tok AS BIGINT) AS x
  FROM read_parquet('{path}/part-*.parquet')
), w AS (
  SELECT doc_id, ts_ns, x,
         CAST(sum(x) OVER cume AS BIGINT) AS cum_sum,
         CAST(max(x) OVER cume AS BIGINT) AS cum_max,
         CAST(row_number() OVER cume AS BIGINT) AS seq_idx,
         lag(x) OVER cume AS lag1,
         x - lag(x) OVER cume AS diff1,
         count(*) OVER trail AS n,
         CAST(sum(x) OVER trail AS BIGINT) AS sx,
         CAST(sum(x * x) OVER trail AS BIGINT) AS sxx
  FROM s
  WINDOW cume AS (PARTITION BY doc_id ORDER BY ts_ns
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         trail AS (PARTITION BY doc_id ORDER BY ts_ns
                   ROWS BETWEEN 15 PRECEDING AND CURRENT ROW)
)
SELECT doc_id, ts_ns, x AS n_tok, cum_sum, cum_max, seq_idx,
       CASE WHEN n > 1 AND n * sxx - sx * sx > 0
            THEN round((CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / n) /
                       sqrt(CAST(n * sxx - sx * sx AS DOUBLE) /
                            (CAST(n AS DOUBLE) * (n - 1))), 6)
            ELSE NULL END AS rz,
       lag1, diff1
FROM w
"""


# --------------------------------------------------------------------------
# PMI association neighbors per token
# --------------------------------------------------------------------------


def q_seq_pmi_neighbors(sf_dir: str):
    """Top-5 PMI associates of every token (window=2, min_count=5) —
    stages/pmi.pmi_neighbors: pair machinery + grouped_topk ranking;
    output is vocab·k rows, nothing larger collects."""
    from pymhealth_ray.stages.pmi import pmi_neighbors

    ds, _ = _seq_ds(sf_dir, ["tokens"])
    return pmi_neighbors(ds, window=2, min_count=5, k_per_token=5)


def sql_seq_pmi_neighbors(path: str) -> str:
    return f"""
WITH p AS (
  SELECT CAST(tokens[i] AS BIGINT) AS a, CAST(tokens[i + d] AS BIGINT) AS b
  FROM read_parquet('{path}/part-*.parquet'),
       LATERAL unnest(generate_series(1, 2)) AS dd(d),
       LATERAL unnest(generate_series(1, len(tokens) - d)) AS u(i)
), pc AS (
  SELECT a, b, count(*) AS cab FROM p GROUP BY a, b
), ma AS (
  SELECT a, count(*) AS ca FROM p GROUP BY a
), mb AS (
  SELECT b, count(*) AS cb FROM p GROUP BY b
), nt AS (
  SELECT count(*) AS n FROM p
), sc AS (
  SELECT a, b, cab,
         round(ln(CAST(nt.n * cab AS DOUBLE) / (ca * cb)), 6) AS pmi
  FROM pc JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN nt
  WHERE cab >= 5
)
SELECT a, b, cab, pmi,
       CAST(row_number() OVER (PARTITION BY a ORDER BY pmi DESC, b)
            AS BIGINT) AS rn
FROM sc
QUALIFY rn <= 5
"""


# --------------------------------------------------------------------------
# keep-best-per-duplicate-cluster curation
# --------------------------------------------------------------------------


def q_docs_dedup_keep_best(sf_dir: str):
    """Curation decision: among each near-dup cluster keep the HIGHEST
    QUALITY doc (longest n_chars, doc_id tiebreak) instead of the
    arbitrary min-id — LSH pairs → connected components →
    stages/dropset.lookup_with_default (labels stay IN THE CLUSTER above
    the broadcast threshold: bloom-prefiltered co-partitioned left join;
    singleton docs default to their own id) → grouped_topk(k=1).
    Output: one row per kept doc (cluster_id, doc_id, n_chars)."""
    from pymhealth_ray.stages.aggregate import grouped_topk
    from pymhealth_ray.stages.dropset import lookup_with_default
    from pymhealth_ray.stages.graph import connected_components

    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text", "n_chars"])
    pairs = minhash_lsh_dupes(
        docs.map_batches(lambda b: b.select(["doc_id", "text"]),
                         batch_format="pyarrow"),
        jaccard_threshold=0.5)
    labels = connected_components(pairs, "id_a", "id_b", num_buckets=NB)

    def slim(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_chars": batch["n_chars"].cast(pa.int64()),
        })

    # materialize the NARROW projection (16 B/row): the distributed lookup
    # consumes its input twice (bloom-miss pass + bloom-hit exchange) —
    # pinned blocks beat a second parquet scan of the docs table
    slim_ds = docs.map_batches(slim, batch_format="pyarrow").materialize()
    assigned = lookup_with_default(
        slim_ds, "doc_id", labels, "v", "l", "cluster_id", num_buckets=NB)
    best = grouped_topk(assigned, ["cluster_id"], "n_chars", 1,
                        descending=True, tie_cols=["doc_id"],
                        rank_name="rn", num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        return b.select(["cluster_id", "doc_id", "n_chars"])

    return best.map_batches(finish, batch_format="pyarrow")


def _dedup_keep_best_expected(df):
    """Single-process replication: union-find clusters + argmax-quality."""
    import pandas as pd

    clusters = _dedup_clusters_expected(df)
    lab = dict(zip(clusters.doc_id.tolist(), clusters.cluster_id.tolist()))
    ids = df["doc_id"].to_numpy().astype(np.int64)
    nch = df["n_chars"].to_numpy().astype(np.int64)
    rows = {}
    for i, n in zip(ids, nch):
        c = lab.get(int(i), int(i))
        cur = rows.get(c)
        if cur is None or (n, -i) > (cur[1], -cur[0]):
            rows[c] = (int(i), int(n))
    out = sorted((c, d, n) for c, (d, n) in rows.items())
    return pd.DataFrame({
        "cluster_id": np.array([r[0] for r in out], dtype=np.int64),
        "doc_id": np.array([r[1] for r in out], dtype=np.int64),
        "n_chars": np.array([r[2] for r in out], dtype=np.int64),
    })


# --------------------------------------------------------------------------
# repeated token-span detection (ExactSubstr-style dedup signal)
# --------------------------------------------------------------------------


def q_seq_repeated_spans(sf_dir: str):
    """Per row: how many of its 5-token spans repeat anywhere in the
    corpus, and the covered-position fraction — stages/spans.py
    (collision-free int64-packed windows, keyed_sum counting, duplicated
    set broadcast, delta-sweep coverage). Oracle: single-process Counter
    replication."""
    from pymhealth_ray.stages.spans import repeated_span_stats

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "tokens"])
    out = repeated_span_stats(ds, "tokens", id_cols=("doc_id", "ts_ns"))

    def finish(b: pa.Table) -> pa.Table:
        return _round_cols(b, {"frac_cov": 6})

    return out.map_batches(finish, batch_format="pyarrow")


def _repeated_spans_expected(src: pa.Table):
    import pandas as pd
    from collections import Counter

    K, L = 2048, 5
    toks = src["tokens"]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lists = toks.to_pylist()
    cnt = Counter()
    for lst in lists:
        for i in range(len(lst) - L + 1):
            k = 0
            for j in range(L - 1, -1, -1):
                k = k * K + lst[i + j]
            cnt[k] += 1
    n_windows, n_dup, frac = [], [], []
    for lst in lists:
        nw = max(len(lst) - L + 1, 0)
        nd = 0
        covered = np.zeros(len(lst), dtype=bool)
        for i in range(nw):
            k = 0
            for j in range(L - 1, -1, -1):
                k = k * K + lst[i + j]
            if cnt[k] >= 2:
                nd += 1
                covered[i:i + L] = True
        n_windows.append(nw)
        n_dup.append(nd)
        if len(lst):
            f = covered.sum() / len(lst)
            m = 1e6
            frac.append(float(np.floor(abs(f) * m + 0.5) / m))
        else:
            frac.append(None)
    return pd.DataFrame({
        "doc_id": src["doc_id"].to_pandas(),
        "ts_ns": src["ts_ns"].to_pandas().astype(np.int64),
        "n_windows": np.array(n_windows, dtype=np.int64),
        "n_dup": np.array(n_dup, dtype=np.int64),
        "frac_cov": pd.array(frac, dtype="float64"),
    })


def sql_seq_repeated_spans(path: str) -> str:
    return _materialized_oracle(path, "repeated_spans_v1",
                                _repeated_spans_expected)


# --------------------------------------------------------------------------
# temporal feature pack over the events table (integer-cents values)
# --------------------------------------------------------------------------


def q_events_pushdown_scan(sf_dir: str):
    """Predicate-pushdown read (sources/io.read_table_filtered): the
    high-value slice ``value >= 100`` is evaluated AT THE PARQUET SCAN
    (row-group statistics pruning + reader-side filtering) — no
    downstream filter stage, nothing crosses the object store but
    matches. Oracle: plain SQL WHERE."""
    import pyarrow.dataset as pads

    from pymhealth_ray.sources.io import read_table_filtered

    ds = read_table_filtered(
        f"{sf_dir}/events.parquet",
        pads.field("value") >= 100.0,
        columns=["event_id", "user_id", "value"])

    def finish(b: pa.Table) -> pa.Table:
        return _cents(b, "value", "v_c").drop_columns(["value"])

    return ds.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_PUSHDOWN_SCAN = """
SELECT event_id, user_id, CAST(round(value * 100) AS BIGINT) AS v_c
FROM events WHERE value >= 100.0
"""


def q_events_cusum(sf_dir: str):
    """Per-user CUSUM change-detection statistic + alarm flag
    (stages/cusum.py): one-sided upper CUSUM over integer-cents values in
    event-time order, vectorized via the clamped-scan closed form
    (cumsum − segmented running min, no sequential loop). All-int64
    arithmetic → the SQL window oracle matches bit-for-bit."""
    from pymhealth_ray.stages.cusum import cusum

    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])
    ds = ds.map_batches(
        lambda b: _cents(b, "value", "v_c").drop_columns(["value"]),
        batch_format="pyarrow")
    out = cusum(ds, "user_id", "ts_us", "v_c", k=6000, h=10000,
                tiebreak_col="event_id", num_buckets=NB)
    return out.map_batches(
        lambda b: b.select(["user_id", "ts_us", "v_c", "cusum", "alarm"]),
        batch_format="pyarrow")


SQL_EVENTS_CUSUM = """
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100) AS BIGINT) AS v_c
  FROM events
), p AS (
  SELECT user_id, ts_us, v_c, event_id,
         CAST(sum(v_c - 6000) OVER (PARTITION BY user_id
                                    ORDER BY ts_us, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pf
  FROM e
), m AS (
  SELECT user_id, ts_us, v_c, pf,
         least(CAST(min(pf) OVER (PARTITION BY user_id
                                  ORDER BY ts_us, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT),
               0) AS mn
  FROM p
)
SELECT user_id, ts_us, v_c,
       CAST(pf - mn AS BIGINT) AS cusum,
       (pf - mn) > 10000 AS alarm
FROM m
"""


def q_events_hampel(sf_dir: str):
    """Hampel despiking per user (stages/hampel.py): centered rolling
    median + rolling MAD over integer-cents values, spike = deviation
    > 3 MADs. NaN-padded sliding-window kernel — every shrinking-edge
    window in one batched nanmedian, no per-row loop; dyadic medians
    match DuckDB's interpolated median bit-for-bit."""
    from pymhealth_ray.stages.hampel import hampel_filter

    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])
    ds = ds.map_batches(
        lambda b: _cents(b, "value", "v_c").drop_columns(["value"]),
        batch_format="pyarrow")
    out = hampel_filter(ds, "user_id", "ts_us", "v_c", k=4, n_mads=3.0,
                        tiebreak_col="event_id", num_buckets=NB)
    return out.map_batches(
        lambda b: b.select(["user_id", "ts_us", "v_c", "med", "mad",
                            "spike"]),
        batch_format="pyarrow")


SQL_EVENTS_HAMPEL = """
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100) AS BIGINT) AS v_c
  FROM events
), r AS (
  SELECT user_id, ts_us, v_c,
         CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts_us, event_id) AS BIGINT) AS rn
  FROM e
), w AS (
  SELECT a.user_id, a.rn, a.ts_us, a.v_c, median(b.v_c) AS med
  FROM r a JOIN r b
    ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 4 AND a.rn + 4
  GROUP BY a.user_id, a.rn, a.ts_us, a.v_c
), m AS (
  SELECT w.user_id, w.rn, w.ts_us, w.v_c, w.med,
         median(abs(b.v_c - w.med)) AS mad
  FROM w JOIN r b
    ON w.user_id = b.user_id AND b.rn BETWEEN w.rn - 4 AND w.rn + 4
  GROUP BY w.user_id, w.rn, w.ts_us, w.v_c, w.med
)
SELECT user_id, ts_us, v_c, med, mad,
       abs(v_c - med) > 3.0 * mad AS spike
FROM m
"""


def q_events_temporal_pack(sf_dir: str):
    """The combined temporal pack applied to the EVENTS stream (per-user
    running sum/max/index + trailing z + lag/diff of value-in-cents) —
    cross-table reuse of stages/temporal.py; the 2-decimal float value
    becomes exact int64 cents so every sum matches SQL bit-for-bit."""
    from pymhealth_ray.stages.temporal import temporal_feature_pack

    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])
    ds = ds.map_batches(lambda b: _cents(b, "value", "v_c").drop_columns(["value"]),
                        batch_format="pyarrow")
    out = temporal_feature_pack(ds, "user_id", "ts_us", "v_c", window=16,
                                tiebreak_col="event_id", num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(["event_id", "user_id", "ts_us", "v_c", "cum_sum",
                      "cum_max", "seq_idx", "rz", "lag1", "diff1"])
        return _round_cols(b, {"rz": 6})

    return out.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_TEMPORAL_PACK = """
WITH s AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100) AS BIGINT) AS v_c
  FROM events
), w AS (
  SELECT event_id, user_id, ts_us, v_c,
         CAST(sum(v_c) OVER cume AS BIGINT) AS cum_sum,
         CAST(max(v_c) OVER cume AS BIGINT) AS cum_max,
         CAST(row_number() OVER cume AS BIGINT) AS seq_idx,
         lag(v_c) OVER cume AS lag1,
         v_c - lag(v_c) OVER cume AS diff1,
         count(*) OVER trail AS n,
         CAST(sum(v_c) OVER trail AS BIGINT) AS sx,
         CAST(sum(v_c * v_c) OVER trail AS BIGINT) AS sxx
  FROM s
  WINDOW cume AS (PARTITION BY user_id ORDER BY ts_us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         trail AS (PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN 15 PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, ts_us, v_c, cum_sum, cum_max, seq_idx,
       CASE WHEN n > 1 AND n * sxx - sx * sx > 0
            THEN round((CAST(v_c AS DOUBLE) - CAST(sx AS DOUBLE) / n) /
                       sqrt(CAST(n * sxx - sx * sx AS DOUBLE) /
                            (CAST(n AS DOUBLE) * (n - 1))), 6)
            ELSE NULL END AS rz,
       lag1, diff1
FROM w
"""


def q_events_resample(sf_dir: str):
    """Per-user 5-minute-grid forward-fill of the event value (cents) —
    stages/resample.py on the events stream (second schema + µs unit)."""
    from pymhealth_ray.stages.resample import resample_ffill

    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])
    ds = ds.map_batches(
        lambda b: _cents(b, "value", "v_c").drop_columns(["value", "event_id"]),
        batch_format="pyarrow")
    out = resample_ffill(ds, "user_id", "ts_us", ["v_c"],
                         step=12 * MIN5_US, num_buckets=NB)
    return out


SQL_EVENTS_RESAMPLE = f"""
WITH s AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100) AS BIGINT) AS v_c
  FROM events
), b AS (
  SELECT user_id,
         (min(ts_us) + {12 * MIN5_US} - 1) // {12 * MIN5_US} AS g0,
         max(ts_us) // {12 * MIN5_US} AS g1
  FROM s GROUP BY user_id
), g AS (
  SELECT user_id, (g0 + i) * {12 * MIN5_US} AS grid_ts
  FROM b, LATERAL unnest(generate_series(0, g1 - g0)) AS u(i)
)
SELECT g.user_id, g.grid_ts, s.v_c
FROM g ASOF JOIN s ON g.user_id = s.user_id AND g.grid_ts >= s.ts_us
"""


def q_seq_winsorize(sf_dir: str):
    """Per-source winsorization: clip n_tok to the group's [q05, q95]
    (exact distributed quantile thresholds broadcast into a stateless
    clip map) — the standard heavy-tail taming step before averaging."""
    from pymhealth_ray.stages.aggregate import grouped_quantiles

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "source", "n_tok"])
    rows = grouped_quantiles(ds, ["source"], "n_tok",
                             qs=(0.05, 0.95), num_buckets=NB).take_all()
    thr = {r["source"]: (int(r["q5"]), int(r["q95"])) for r in rows}
    thr_ref = ray.put(thr)

    def clip(batch: pa.Table) -> pa.Table:
        t = ray.get(thr_ref)
        g = batch["source"]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = g.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        lo = np.array([t[v][0] for v in enc.dictionary.to_pylist()],
                      dtype=np.int64)[idx]
        hi = np.array([t[v][1] for v in enc.dictionary.to_pylist()],
                      dtype=np.int64)[idx]
        x = batch["n_tok"]
        if isinstance(x, pa.ChunkedArray):
            x = x.combine_chunks()
        v = x.to_numpy(zero_copy_only=False).astype(np.int64)
        w = np.minimum(np.maximum(v, lo), hi)
        return pa.table({
            "doc_id": batch["doc_id"], "ts_ns": batch["ts_ns"],
            "source": g, "n_tok": pa.array(v),
            "n_tok_w": pa.array(w),
        })

    return ds.map_batches(clip, batch_format="pyarrow")


def sql_seq_winsorize(path: str) -> str:
    return f"""
WITH s AS (
  SELECT doc_id, ts_ns, source, CAST(n_tok AS BIGINT) AS n_tok
  FROM read_parquet('{path}/part-*.parquet')
), g AS (
  SELECT source, quantile_disc(n_tok, 0.05) AS lo,
         quantile_disc(n_tok, 0.95) AS hi
  FROM s GROUP BY source
)
SELECT doc_id, ts_ns, source, n_tok,
       least(greatest(n_tok, lo), hi) AS n_tok_w
FROM s JOIN g USING (source)
"""


def q_seq_span_novelty(sf_dir: str):
    """Cross- vs intra-document span duplication split per row —
    stages/spans.cross_doc_span_stats (keyed_agg carries exact mergeable
    (count, min/max doc-hash) facts per span; cross ⇔ min≠max). Oracle:
    single-process dict replication."""
    from pymhealth_ray.stages.spans import cross_doc_span_stats

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "tokens"])
    return cross_doc_span_stats(ds, "tokens", entity_col="doc_id",
                                id_cols=("doc_id", "ts_ns"))


def _span_novelty_expected(src: pa.Table):
    import zlib
    import pandas as pd

    K, L = 2048, 5
    toks = src["tokens"]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lists = toks.to_pylist()
    docs = src["doc_id"].to_pylist()

    def wkeys(lst):
        out = []
        for i in range(len(lst) - L + 1):
            k = 0
            for j in range(L - 1, -1, -1):
                k = k * K + lst[i + j]
            out.append(k)
        return out

    info = {}
    for lst, d in zip(lists, docs):
        dh = zlib.crc32(str(d).encode())
        for k in wkeys(lst):
            c, mn, mx = info.get(k, (0, dh, dh))
            info[k] = (c + 1, min(mn, dh), max(mx, dh))
    cross = {k for k, (c, mn, mx) in info.items() if mn != mx}
    intra = {k for k, (c, mn, mx) in info.items() if mn == mx and c >= 2}
    n_windows, n_cross, n_intra = [], [], []
    for lst in lists:
        ks = wkeys(lst)
        n_windows.append(len(ks))
        n_cross.append(sum(1 for k in ks if k in cross))
        n_intra.append(sum(1 for k in ks if k in intra))
    return pd.DataFrame({
        "doc_id": src["doc_id"].to_pandas(),
        "ts_ns": src["ts_ns"].to_pandas().astype(np.int64),
        "n_windows": np.array(n_windows, dtype=np.int64),
        "n_cross": np.array(n_cross, dtype=np.int64),
        "n_intra": np.array(n_intra, dtype=np.int64),
    })


def sql_seq_span_novelty(path: str) -> str:
    return _materialized_oracle(path, "span_novelty_v1",
                                _span_novelty_expected)


_EV_TAU_US = 2.0 * 12 * MIN5_US  # 2 h in microseconds


def q_events_ewma_td(sf_dir: str):
    """Per-user time-decay EWMA (τ = 2 h) of the event value over the
    irregular events stream — stages/ewma.ewma_time_decay on the second
    schema/µs unit; integer-cents input keeps the oracle's recurrence on
    identical exact values."""
    from pymhealth_ray.stages.ewma import ewma_time_decay

    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])
    ds = ds.map_batches(
        lambda b: _cents(b, "value", "v_c").drop_columns(["value"]),
        batch_format="pyarrow")
    out = ewma_time_decay(ds, "user_id", "ts_us", "v_c", tau=_EV_TAU_US,
                          tiebreak_col="event_id", num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(["event_id", "user_id", "ts_us", "v_c", "ewma_td"])
        return _round_cols(b, {"ewma_td": 6})

    return out.map_batches(finish, batch_format="pyarrow")


def _events_ewma_td_expected(sf_dir: str):
    import pandas as pd

    import duckdb

    df = duckdb.sql(
        f"SELECT event_id, user_id, epoch_us(ts) AS ts_us, "
        f"CAST(round(value * 100) AS BIGINT) AS v_c "
        f"FROM '{sf_dir}/events.parquet' "
        f"ORDER BY user_id, ts_us, event_id").df()
    out = np.empty(len(df), dtype=np.float64)
    for _, g in df.groupby("user_id", sort=False):
        x = g["v_c"].to_numpy(dtype=np.float64)
        t = g["ts_us"].to_numpy(dtype=np.float64)
        num = den = 0.0
        y = np.empty(len(x), dtype=np.float64)
        for i in range(len(x)):
            if i:
                d = np.exp(-(t[i] - t[i - 1]) / _EV_TAU_US)
                num *= d
                den *= d
            num += x[i]
            den += 1.0
            y[i] = num / den
        out[g.index.to_numpy()] = y
    m = 1e6
    ew = np.sign(out) * np.floor(np.abs(out) * m + 0.5) / m
    return pd.DataFrame({
        "event_id": df["event_id"].astype(np.int64),
        "user_id": df["user_id"].astype(np.int64),
        "ts_us": df["ts_us"].astype(np.int64),
        "v_c": df["v_c"].astype(np.int64),
        "ewma_td": ew,
    })


def _events_ewma_td_oracle(sf_dir: str) -> str:
    import os

    import pyarrow.parquet as pq_mod

    name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/pymhealth_ray_fixtures/events_ewma_td_{name}_v1"
    out = os.path.join(out_dir, "expected.parquet")
    if not os.path.exists(out):
        os.makedirs(out_dir, exist_ok=True)
        exp = _events_ewma_td_expected(sf_dir)
        tmp = out + ".tmp"
        pq_mod.write_table(pa.Table.from_pandas(exp, preserve_index=False), tmp)
        os.replace(tmp, out)
    return f"SELECT * FROM read_parquet('{out}')"


def q_seq_percent_rank(sf_dir: str):
    """Exact per-source percent_rank of n_tok —
    stages/normalize.percent_rank_by_group: value-histogram CDF broadcast
    + stateless searchsorted ranking (SQL percent_rank semantics)."""
    from pymhealth_ray.stages.normalize import percent_rank_by_group

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "source", "n_tok"])
    out = percent_rank_by_group(ds, "source", "n_tok")

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(["doc_id", "ts_ns", "source", "n_tok", "pr"])
        b = _cast_cols(b, {"n_tok": pa.int64()})
        return _round_cols(b, {"pr": 6})

    return out.map_batches(finish, batch_format="pyarrow")


def sql_seq_percent_rank(path: str) -> str:
    return f"""
SELECT doc_id, ts_ns, source, CAST(n_tok AS BIGINT) AS n_tok,
       round(percent_rank() OVER (PARTITION BY source ORDER BY n_tok), 6)
           AS pr
FROM read_parquet('{path}/part-*.parquet')
"""


def q_events_compact(sf_dir: str):
    """Change-event compaction of the events stream: per user keep the
    first row and rows whose event_type differs from the previous one —
    stages/lag.compact_unchanged (storage-shrinking encoding for
    slowly-varying streams)."""
    from pymhealth_ray.stages.lag import compact_unchanged

    ds = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
    out = compact_unchanged(ds, "user_id", "ts_us", "event_type",
                            tiebreak_col="event_id", num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        return b.select(["event_id", "user_id", "ts_us", "event_type"])

    return out.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_COMPACT = """
WITH s AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts), event_id) AS prev
  FROM events
)
SELECT event_id, user_id, ts_us, event_type
FROM s WHERE prev IS NULL OR event_type <> prev
"""


def q_seq_mode_by_source(sf_dir: str):
    """Exact MODE of n_tok per source (most frequent value, smallest-value
    tiebreak) — the value-histogram combiner pattern: per-block
    (source, value, count) partials, tiny exchange, per-group argmax."""
    ds, _ = _seq_ds(sf_dir, ["source", "n_tok"])

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(["source", "n_tok"]).aggregate(
            [([], "count_all")])

    hist = (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
            .groupby(["source", "n_tok"]).sum("count_all"))

    def argmax(tbl: pa.Table) -> pa.Table:
        order = pc.sort_indices(tbl, sort_keys=[
            ("sum(count_all)", "descending"), ("n_tok", "ascending")])
        top = tbl.take(order[:1])
        return pa.table({
            "source": top["source"],
            "mode_tok": top["n_tok"].cast(pa.int64()),
            "c": top["sum(count_all)"].cast(pa.int64()),
        })

    return hist.groupby("source").map_groups(argmax,
                                             batch_format="pyarrow")


def sql_seq_mode_by_source(path: str) -> str:
    return f"""
WITH h AS (
  SELECT source, CAST(n_tok AS BIGINT) AS n_tok, count(*) AS c
  FROM read_parquet('{path}/part-*.parquet')
  GROUP BY source, n_tok
)
SELECT source, n_tok AS mode_tok, c
FROM (SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY c DESC, n_tok) AS rn FROM h)
WHERE rn = 1
"""


def q_events_gap_stats(sf_dir: str):
    """Per-user inter-event gap statistics: n_gaps, mean gap, max gap and
    BURSTINESS (gap std/mean — the classic human-activity signature) —
    one entity-bucket pass (stages/lag machinery shape): exact int64 gap
    sums, variance from the exact-int identity, float only at the end."""
    from pymhealth_ray.stages.partition import (
        column_i64,
        entity_segments,
        grouped_by_bucket,
    )

    ds = _events(sf_dir, ["event_id", "user_id", "ts"])

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl, starts, n_ent = entity_segments(tbl, "user_id", "ts_us",
                                             "event_id")
        ts = column_i64(tbl, "ts_us")
        seg_lens = np.diff(starts)
        # whole-second gaps: µs gaps square past int64 (observed 1.5e20)
        gaps = (ts[1:] - ts[:-1]) // 1_000_000
        valid = np.ones(len(ts) - 1, dtype=bool) if len(ts) else np.empty(0, bool)
        valid[starts[1:-1] - 1] = False  # seams between entities
        n = np.maximum(seg_lens - 1, 0)
        # per-entity sums over the entity's own gap slice
        gv = np.where(valid, gaps, 0)
        gv2 = np.where(valid, gaps * gaps, 0)
        gmax = np.where(valid, gaps, np.int64(-1))
        cs, cs2 = np.concatenate(([0], np.cumsum(gv))), np.concatenate(([0], np.cumsum(gv2)))
        ent = tbl["user_id"]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        users = ent.take(pa.array(starts[:-1]))
        lo = starts[:-1]
        hi = np.maximum(starts[1:] - 1, lo)
        sx = cs[hi] - cs[lo]
        sxx = cs2[hi] - cs2[lo]
        mx = np.full(n_ent, -1, dtype=np.int64)
        for e in range(n_ent):      # max has no subtraction trick; per-entity
            if n[e] > 0:            # slices are tiny (gap maxima only)
                mx[e] = gmax[lo[e]:hi[e]].max()
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = sx.astype(np.float64) / n
            den = n * sxx - sx * sx
            burst = np.sqrt(den.astype(np.float64) /
                            (n.astype(np.float64) * (n - 1))) / mean
        ok2 = (n > 1) & (sx > 0)
        ok1 = n > 0
        return pa.table({
            "user_id": users,
            "n_gaps": pa.array(n.astype(np.int64)),
            "sum_gap": pa.array(sx.astype(np.int64)),
            "max_gap": pa.array(np.where(ok1, mx, 0), type=pa.int64(),
                                mask=~ok1),
            "burstiness": pa.array(np.where(ok2, burst, 0.0),
                                   type=pa.float64(), mask=~ok2),
        })

    out = grouped_by_bucket(ds, per_bucket, entity_col="user_id",
                            num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        return _round_cols(b, {"burstiness": 6})

    return out.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_GAP_STATS = """
WITH s AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
             // 1000000 AS gap
  FROM events
), g AS (
  SELECT user_id, count(gap) AS n_gaps,
         CAST(coalesce(sum(gap), 0) AS BIGINT) AS sum_gap,
         max(gap) AS max_gap,
         CAST(coalesce(sum(gap * gap), 0) AS BIGINT) AS sxx
  FROM s GROUP BY user_id
)
SELECT user_id, n_gaps, sum_gap, max_gap,
       CASE WHEN n_gaps > 1 AND sum_gap > 0
            THEN round(sqrt(CAST(n_gaps * sxx - sum_gap * sum_gap AS DOUBLE)
                            / (CAST(n_gaps AS DOUBLE) * (n_gaps - 1)))
                       / (CAST(sum_gap AS DOUBLE) / n_gaps), 6)
            ELSE NULL END AS burstiness
FROM g
"""


def q_events_hour_profile(sf_dir: str):
    """Hour-of-day activity profile per event type — the seasonality
    histogram (map-side (type, hour) partials, tiny exchange)."""
    ds = _events(sf_dir, ["event_id", "ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts_us"]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        t = ts.to_numpy(zero_copy_only=False).astype(np.int64)
        hour = (t // 3_600_000_000) % 24
        b2 = pa.table({"event_type": batch["event_type"],
                       "hour": pa.array(hour)})
        return b2.group_by(["event_type", "hour"]).aggregate(
            [([], "count_all")])

    agg = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
           .groupby(["event_type", "hour"]).sum("count_all"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            "hour": b["hour"].cast(pa.int64()),
            "c": b["sum(count_all)"].cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_HOUR_PROFILE = """
SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hour,
       count(*) AS c
FROM events GROUP BY event_type, hour
"""


def q_seq_source_transitions(sf_dir: str):
    """Markov transition counts between SOURCES along each entity's
    timeline (prev source → source, ts order) — one entity-bucket pass,
    shift-compare + vectorized pair counting; the sequence-mixing
    signature of the corpus."""
    from pymhealth_ray.stages.partition import entity_segments, grouped_by_bucket

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "source"])

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl, starts, n_ent = entity_segments(tbl, "doc_id", "ts_ns")
        s = tbl["source"]
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        enc = s.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(enc.dictionary)
        valid = np.ones(max(len(codes) - 1, 0), dtype=bool)
        valid[starts[1:-1] - 1] = False
        pair = codes[:-1][valid] * k + codes[1:][valid]
        cnt = np.bincount(pair, minlength=k * k)
        nz = np.flatnonzero(cnt)
        prev = enc.dictionary.take(pa.array(nz // k))
        nxt = enc.dictionary.take(pa.array(nz % k))
        return pa.table({"prev_source": prev, "source": nxt,
                         "c": pa.array(cnt[nz].astype(np.int64))})

    partials = grouped_by_bucket(ds, per_bucket, entity_col="doc_id",
                                 num_buckets=NB)
    agg = partials.groupby(["prev_source", "source"]).sum("c")

    def finish(b: pa.Table) -> pa.Table:
        return b.rename_columns(["prev_source", "source", "c"])

    return agg.map_batches(finish, batch_format="pyarrow")


def sql_seq_source_transitions(path: str) -> str:
    return f"""
WITH s AS (
  SELECT source,
         lag(source) OVER (PARTITION BY doc_id ORDER BY ts_ns) AS prev_source
  FROM read_parquet('{path}/part-*.parquet')
)
SELECT prev_source, source, count(*) AS c
FROM s WHERE prev_source IS NOT NULL
GROUP BY prev_source, source
"""


def q_seq_trend(sf_dir: str):
    """Per-entity OLS trend of n_tok over elapsed time (slope tok/min +
    intercept) — the reference o1fit linear-fit family
    (/root/reference/src/mhealth/generic/timedom.py o1fit lineage)
    distributed: elapsed MINUTES keep every normal-equation sum exact in
    int64 (µs/ns elapsed squares overflow); float only in the final
    division, same expression shape as the SQL oracle."""
    from pymhealth_ray.stages.partition import (
        column_i64,
        entity_segments,
        grouped_by_bucket,
    )

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "n_tok"])
    MIN_NS = 60_000_000_000

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl, starts, n_ent = entity_segments(tbl, "doc_id", "ts_ns")
        ts = column_i64(tbl, "ts_ns")
        y = column_i64(tbl, "n_tok")
        seg_lens = np.diff(starts)
        mn = np.repeat(ts[starts[:-1]], seg_lens)
        t = (ts - mn) // MIN_NS
        lo = starts[:-1]
        n = seg_lens

        def ssum(v):
            c = np.concatenate(([0], np.cumsum(v)))
            return c[starts[1:]] - c[lo]

        st, sy = ssum(t), ssum(y)
        sty, stt = ssum(t * y), ssum(t * t)
        num = n * sty - st * sy
        den = n * stt - st * st
        ok = den > 0
        with np.errstate(invalid="ignore", divide="ignore"):
            slope = num.astype(np.float64) / den
            intercept = (sy.astype(np.float64) - slope * st) / n
        ent = tbl["doc_id"]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        return pa.table({
            "doc_id": ent.take(pa.array(lo)),
            "n": pa.array(n.astype(np.int64)),
            "slope": pa.array(np.where(ok, slope, 0.0), type=pa.float64(),
                              mask=~ok),
            "intercept": pa.array(np.where(ok, intercept, 0.0),
                                  type=pa.float64(), mask=~ok),
        })

    out = grouped_by_bucket(ds, per_bucket, entity_col="doc_id",
                            num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        return _round_cols(b, {"slope": 6, "intercept": 6})

    return out.map_batches(finish, batch_format="pyarrow")


def sql_seq_trend(path: str) -> str:
    return f"""
WITH s AS (
  SELECT doc_id, ts_ns, CAST(n_tok AS BIGINT) AS y
  FROM read_parquet('{path}/part-*.parquet')
), m AS (
  SELECT doc_id, min(ts_ns) AS mn FROM s GROUP BY doc_id
), t AS (
  SELECT s.doc_id, (ts_ns - mn) // 60000000000 AS tm, y
  FROM s JOIN m USING (doc_id)
), g AS (
  SELECT doc_id, count(*) AS n,
         CAST(sum(tm) AS BIGINT) AS st, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(tm * y) AS BIGINT) AS sty,
         CAST(sum(tm * tm) AS BIGINT) AS stt
  FROM t GROUP BY doc_id
)
SELECT doc_id, n,
       CASE WHEN n * stt - st * st > 0
            THEN round(CAST(n * sty - st * sy AS DOUBLE)
                       / (n * stt - st * st), 6) END AS slope,
       CASE WHEN n * stt - st * st > 0
            THEN round((CAST(sy AS DOUBLE)
                        - (CAST(n * sty - st * sy AS DOUBLE)
                           / (n * stt - st * st)) * st) / n, 6) END
           AS intercept
FROM g
"""


def q_seq_autocorr(sf_dir: str):
    """Per-entity lag-1 autocorrelation of n_tok (Pearson corr of adjacent
    pairs in ts order) — the persistence/momentum signature; exact int64
    pair sums over one entity-bucket pass, NULL for entities with <3 rows
    or zero variance on either side."""
    from pymhealth_ray.stages.partition import (
        column_i64,
        entity_segments,
        grouped_by_bucket,
    )

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "n_tok"])

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl, starts, n_ent = entity_segments(tbl, "doc_id", "ts_ns")
        v = column_i64(tbl, "n_tok")
        seg_lens = np.diff(starts)
        x = v[:-1] if len(v) else v
        y = v[1:] if len(v) else v
        valid = np.ones(len(x), dtype=bool)
        valid[starts[1:-1] - 1] = False
        lo = starts[:-1]
        hi = np.maximum(starts[1:] - 1, lo)

        def ssum(a):
            w = np.where(valid, a, 0)
            c = np.concatenate(([0], np.cumsum(w)))
            return c[hi] - c[lo]

        n = np.maximum(seg_lens - 1, 0)
        sx, sy = ssum(x), ssum(y)
        sxx, syy, sxy = ssum(x * x), ssum(y * y), ssum(x * y)
        num = n * sxy - sx * sy
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        ok = (dx > 0) & (dy > 0)
        with np.errstate(invalid="ignore", divide="ignore"):
            ac = num.astype(np.float64) / (
                np.sqrt(dx.astype(np.float64)) *
                np.sqrt(dy.astype(np.float64)))
        ent = tbl["doc_id"]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        return pa.table({
            "doc_id": ent.take(pa.array(lo)),
            "n_pairs": pa.array(n.astype(np.int64)),
            "autocorr": pa.array(np.where(ok, ac, 0.0), type=pa.float64(),
                                 mask=~ok),
        })

    out = grouped_by_bucket(ds, per_bucket, entity_col="doc_id",
                            num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        return _round_cols(b, {"autocorr": 6})

    return out.map_batches(finish, batch_format="pyarrow")


def sql_seq_autocorr(path: str) -> str:
    return f"""
WITH s AS (
  SELECT doc_id, CAST(n_tok AS BIGINT) AS y,
         lag(CAST(n_tok AS BIGINT)) OVER (
             PARTITION BY doc_id ORDER BY ts_ns) AS x
  FROM read_parquet('{path}/part-*.parquet')
), g AS (
  SELECT doc_id, count(x) AS n,
         CAST(coalesce(sum(x), 0) AS BIGINT) AS sx,
         CAST(coalesce(sum(CASE WHEN x IS NOT NULL THEN y END), 0)
              AS BIGINT) AS sy,
         CAST(coalesce(sum(x * x), 0) AS BIGINT) AS sxx,
         CAST(coalesce(sum(CASE WHEN x IS NOT NULL THEN y * y END), 0)
              AS BIGINT) AS syy,
         CAST(coalesce(sum(x * y), 0) AS BIGINT) AS sxy
  FROM s GROUP BY doc_id
)
SELECT doc_id, CAST(n AS BIGINT) AS n_pairs,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN round(CAST(n * sxy - sx * sy AS DOUBLE) /
                       (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
                        sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
            END AS autocorr
FROM g
"""


def q_events_dominant_type(sf_dir: str):
    """Per-user dominant event type and its share — per-block
    (user, type, count) partials, tiny exchange, per-user argmax
    (count desc, type asc tiebreak); share = int/int division both
    engines."""
    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        return (batch.select(["user_id", "event_type"])
                .group_by(["user_id", "event_type"])
                .aggregate([([], "count_all")]))

    hist = (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
            .groupby(["user_id", "event_type"]).sum("count_all"))

    def argmax(tbl: pa.Table) -> pa.Table:
        c = tbl["sum(count_all)"]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        total = int(pc.sum(c).as_py())
        order = pc.sort_indices(tbl, sort_keys=[
            ("sum(count_all)", "descending"), ("event_type", "ascending")])
        top = tbl.take(order[:1])
        cnt = int(top["sum(count_all)"][0].as_py())
        return pa.table({
            "user_id": top["user_id"],
            "dominant_type": top["event_type"],
            "c": pa.array([cnt], type=pa.int64()),
            "n": pa.array([total], type=pa.int64()),
            "share": pa.array([_round_away(np.array([cnt / total]), 6)[0]],
                              type=pa.float64()),
        })

    return hist.groupby("user_id").map_groups(argmax,
                                              batch_format="pyarrow")


SQL_EVENTS_DOMINANT_TYPE = """
WITH h AS (
  SELECT user_id, event_type, count(*) AS c FROM events
  GROUP BY user_id, event_type
), t AS (
  SELECT user_id, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY user_id
)
SELECT user_id, event_type AS dominant_type, c, n,
       round(CAST(c AS DOUBLE) / n, 6) AS share
FROM (SELECT h.*, t.n,
             row_number() OVER (PARTITION BY h.user_id
                                ORDER BY c DESC, event_type) AS rn
      FROM h JOIN t USING (user_id))
WHERE rn = 1
"""


# --------------------------------------------------------------------------
# round 3: funnel / OOV rate / constraint suite / linear-interp resample
# --------------------------------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")


def q_events_funnel(sf_dir: str):
    """Earliest-chain 3-step funnel per user (view -> click -> purchase,
    each step strictly after the previous) — stages/funnel.py: slim
    (entity, ts, step) exchange + masked segmented reduceat chain."""
    from pymhealth_ray.stages.funnel import funnel_steps

    ds = _events(sf_dir, ["user_id", "ts", "event_type"])
    return funnel_steps(ds, FUNNEL_STEPS, entity_col="user_id",
                        ts_col="ts_us", num_buckets=NB)


SQL_EVENTS_FUNNEL = """
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
u AS (SELECT DISTINCT user_id FROM e),
s1 AS (SELECT user_id, min(ts_us) AS t1 FROM e
       WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(ts_us) AS t2 FROM e JOIN s1 USING (user_id)
       WHERE event_type = 'click' AND ts_us > t1 GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(ts_us) AS t3 FROM e JOIN s2 USING (user_id)
       WHERE event_type = 'purchase' AND ts_us > t2 GROUP BY e.user_id)
SELECT u.user_id, t1, t2, t3,
       (CASE WHEN t1 IS NULL THEN 0 WHEN t2 IS NULL THEN 1
             WHEN t3 IS NULL THEN 2 ELSE 3 END)::BIGINT AS reached
FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
       LEFT JOIN s3 USING (user_id)
"""


OOV_TOPK = 256


def q_seq_oov_rate(sf_dir: str):
    """Per row: tokens outside the corpus-wide top-256 vocabulary (count
    DESC, token ASC ties) and the OOV fraction — the vocabulary-coverage
    filter. Global counts via keyed_sum (vocab-bounded), top-K sorted on
    the driver (K rows), broadcast, stateless searchsorted scoring map."""
    import ray as _ray

    from pymhealth_ray.stages.aggregate import keyed_sum

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "n_tok", "tokens"])

    def tok_partial(b: pa.Table) -> pa.Table:
        col = b["tokens"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.int64)
        vals, cnts = np.unique(flat, return_counts=True)
        return pa.table({"tok": pa.array(vals), "c": pa.array(cnts.astype(np.int64))})

    counts = keyed_sum(ds.map_batches(tok_partial, batch_format="pyarrow",
                                      batch_size=None), "tok", ["c"],
                       num_buckets=64)
    parts = [b for b in counts.iter_batches(batch_format="pyarrow")]
    tok = np.concatenate([p["tok"].to_numpy(zero_copy_only=False) for p in parts])
    c = np.concatenate([p["c"].to_numpy(zero_copy_only=False) for p in parts])
    order = np.lexsort((tok, -c))[:OOV_TOPK]
    vocab = np.sort(tok[order])
    vocab_ref = _ray.put(vocab)

    def score(b: pa.Table) -> pa.Table:
        v = _ray.get(vocab_ref)
        col = b["tokens"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.int64)
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(v, flat)
        inv = idx < len(v)
        inv[inv] = v[idx[inv]] == flat[inv]
        offs = np.concatenate(([0], np.cumsum(lens)))
        oov = np.zeros(len(lens), dtype=np.int64)
        nz = lens > 0
        if nz.any() and len(flat):
            oov[nz] = np.add.reduceat((~inv).astype(np.int64), offs[:-1][nz])
        rate = oov / np.maximum(lens, 1)
        out = pa.table({
            "doc_id": b["doc_id"], "ts_ns": b["ts_ns"],
            "n_tok": pc.cast(b["n_tok"], pa.int64()),
            "n_oov": pa.array(oov),
            "oov_rate": pa.array(rate, type=pa.float64()),
        })
        return _round_cols(out, {"oov_rate": 6})

    return ds.map_batches(score, batch_format="pyarrow")


def sql_seq_oov_rate(path: str) -> str:
    return f"""
WITH t AS (SELECT doc_id, ts_ns, unnest(tokens) AS tok
           FROM read_parquet('{path}/part-*.parquet')),
v AS (SELECT tok FROM t GROUP BY tok
      ORDER BY count(*) DESC, tok LIMIT {OOV_TOPK})
SELECT doc_id, ts_ns, count(*)::BIGINT AS n_tok,
       count(*) FILTER (WHERE tok NOT IN (SELECT tok FROM v))::BIGINT AS n_oov,
       round(count(*) FILTER (WHERE tok NOT IN (SELECT tok FROM v))
             / count(*)::DOUBLE, 6) AS oov_rate
FROM t GROUP BY doc_id, ts_ns
"""


CONSTRAINT_COLS = ("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
CONSTRAINT_KEY = ("l_orderkey", "l_linenumber")


def q_lineitem_constraints(sf_dir: str):
    """Data-quality constraint suite over lineitem (stages/profile.py
    constraint_checks): row count, per-column null counts, EXACT distinct
    counts, and duplicate-(orderkey, linenumber) violations — one scan +
    one block-distinct exchange, no driver value sets."""
    from pymhealth_ray.stages.profile import constraint_checks

    ds = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=list(dict.fromkeys(CONSTRAINT_COLS + CONSTRAINT_KEY)))
    return constraint_checks(ds, CONSTRAINT_COLS, unique_key=CONSTRAINT_KEY)


SQL_LINEITEM_CONSTRAINTS = """
SELECT check_name AS "check", value FROM (
  SELECT 'rows' AS check_name, count(*)::BIGINT AS value FROM lineitem
  UNION ALL SELECT 'null:l_orderkey', count(*) - count(l_orderkey) FROM lineitem
  UNION ALL SELECT 'null:l_partkey', count(*) - count(l_partkey) FROM lineitem
  UNION ALL SELECT 'null:l_quantity', count(*) - count(l_quantity) FROM lineitem
  UNION ALL SELECT 'null:l_returnflag', count(*) - count(l_returnflag) FROM lineitem
  UNION ALL SELECT 'distinct:l_orderkey', count(DISTINCT l_orderkey) FROM lineitem
  UNION ALL SELECT 'distinct:l_partkey', count(DISTINCT l_partkey) FROM lineitem
  UNION ALL SELECT 'distinct:l_quantity', count(DISTINCT l_quantity) FROM lineitem
  UNION ALL SELECT 'distinct:l_returnflag', count(DISTINCT l_returnflag) FROM lineitem
  UNION ALL SELECT 'dup:l_orderkey,l_linenumber',
    count(*) - count(DISTINCT concat(l_orderkey, '|', l_linenumber)) FROM lineitem
) ORDER BY check_name
"""


def q_events_resample_interp(sf_dir: str):
    """Per-user hourly grid with LINEAR interpolation of value between the
    neighboring observations (stages/resample.py resample_interp; ts ties
    collapsed to max event_id on both sides)."""
    from pymhealth_ray.stages.resample import resample_interp

    ds = _events(sf_dir, ["user_id", "ts", "value", "event_id"])
    out = resample_interp(ds, "user_id", "ts_us", "value", HOUR_US,
                          tiebreak_col="event_id", num_buckets=NB,
                          grid_name="grid_us", out_name="value_interp")

    def finish(b: pa.Table) -> pa.Table:
        return _round_cols(b, {"value_interp": 6})

    return out.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_RESAMPLE_INTERP = f"""
WITH e0 AS (SELECT user_id, epoch_us(ts) AS ts_us, value, event_id FROM events),
e AS (SELECT user_id, ts_us, value FROM
        (SELECT *, row_number() OVER (PARTITION BY user_id, ts_us
                                      ORDER BY event_id DESC) AS rn FROM e0)
      WHERE rn = 1),
b AS (SELECT user_id, min(ts_us) AS f, max(ts_us) AS l FROM e GROUP BY user_id),
g AS (SELECT user_id,
             unnest(generate_series(((f + {HOUR_US} - 1) // {HOUR_US}) * {HOUR_US},
                                    (l // {HOUR_US}) * {HOUR_US},
                                    {HOUR_US})) AS grid_us
      FROM b),
p AS (SELECT g.user_id, g.grid_us, max(e.ts_us) AS tp FROM g
      JOIN e ON e.user_id = g.user_id AND e.ts_us <= g.grid_us
      GROUP BY g.user_id, g.grid_us),
n AS (SELECT g.user_id, g.grid_us, min(e.ts_us) AS tn FROM g
      JOIN e ON e.user_id = g.user_id AND e.ts_us >= g.grid_us
      GROUP BY g.user_id, g.grid_us)
SELECT p.user_id, p.grid_us,
       round(CASE WHEN n.tn = p.tp THEN ep.value
                  ELSE ep.value + (en.value - ep.value) *
                       (CAST(p.grid_us - p.tp AS DOUBLE) /
                        CAST(n.tn - p.tp AS DOUBLE)) END, 6) AS value_interp
FROM p JOIN n ON n.user_id = p.user_id AND n.grid_us = p.grid_us
JOIN e ep ON ep.user_id = p.user_id AND ep.ts_us = p.tp
JOIN e en ON en.user_id = n.user_id AND en.ts_us = n.tn
"""


# --------------------------------------------------------------------------
# round 3: BPE merge training / application (tokenizer construction)
# --------------------------------------------------------------------------

BPE_MERGES = 8
BPE_BASE = 2048
_BPE_MEMO: dict = {}


def _bpe_merges_for(sf_dir: str):
    """Train (once per fixture per process) the 8-merge table — the
    training result is deterministic, so reruns within a bench/gate
    session reuse it."""
    from pymhealth_ray.stages.bpe import bpe_train

    ds, path = _seq_ds(sf_dir, ["tokens"])
    if path not in _BPE_MEMO:
        with _build_lock(f"bpe:{path}"):  # train once even when the
            if path not in _BPE_MEMO:     # gate overlaps both BPE queries
                _BPE_MEMO[path] = bpe_train(ds, "tokens",
                                            n_merges=BPE_MERGES,
                                            base_vocab=BPE_BASE)
    return _BPE_MEMO[path]


def q_seq_bpe_merges(sf_dir: str):
    """Learn 8 BPE merges over the corpus (stages/bpe.py: exact pair
    counts via keyed_sum each round, merges applied map-side — no
    intermediate corpus materialization)."""
    df = _bpe_merges_for(sf_dir)
    return pa.Table.from_pandas(df, preserve_index=False).cast(pa.schema([
        ("rank", pa.int64()), ("a", pa.int64()), ("b", pa.int64()),
        ("new_id", pa.int64()), ("count", pa.int64())]))


def q_seq_bpe_apply(sf_dir: str):
    """Apply the learned merge list to every row (broadcast merge table,
    map-only) and report the re-tokenized length."""
    from pymhealth_ray.stages.bpe import apply_bpe

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "tokens"])
    merges = _bpe_merges_for(sf_dir)
    out = apply_bpe(ds, merges, "tokens", out_col="bpe")

    def finish(b: pa.Table) -> pa.Table:
        return b.select(["doc_id", "ts_ns", "bpe_len"])

    return out.map_batches(finish, batch_format="pyarrow")


def _bpe_oracle_merges(src: pa.Table):
    """Independent single-process BPE: one flat numpy corpus, np.unique
    pair counting, per-run python overlap resolution (structurally
    different from the engine's segmented vectorized path)."""
    import pandas as pd

    toks = src["tokens"]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    offs = np.concatenate(([0], np.cumsum(lens)))
    rows = []
    for r in range(BPE_MERGES):
        rowid = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
        ok = rowid[:-1] == rowid[1:]
        big = BPE_BASE + BPE_MERGES + 1
        keys = flat[:-1][ok] * big + flat[1:][ok]
        vals, cnts = np.unique(keys, return_counts=True)
        if not len(vals) or cnts.max() < 2:
            break
        order = np.lexsort((vals % big, vals // big, -cnts))[0]
        a, b, cnt = int(vals[order] // big), int(vals[order] % big), int(cnts[order])
        new_id = BPE_BASE + r
        rows.append((r, a, b, new_id, cnt))
        # apply sequentially: python loop over match runs
        match = np.flatnonzero((flat[:-1] == a) & (flat[1:] == b)
                               & (rowid[:-1] == rowid[1:]))
        kept = []
        last = -2
        for p in match.tolist():
            if p == last + 1:
                continue  # overlaps the previous kept match
            kept.append(p)
            last = p
        kept = np.asarray(kept, dtype=np.int64)
        flat[kept] = new_id
        drop = np.zeros(len(flat), dtype=bool)
        drop[kept + 1] = True
        del_per_row = np.bincount(rowid[kept], minlength=len(offs) - 1)
        offs = offs - np.concatenate(([0], np.cumsum(del_per_row)))
        flat = flat[~drop]
    df = pd.DataFrame(rows, columns=["rank", "a", "b", "new_id", "count"])
    _bpe_oracle_merges.last_state = (flat, offs)
    return df.astype("int64")


def _bpe_apply_expected(src: pa.Table):
    import pandas as pd

    _bpe_oracle_merges(src)
    flat, offs = _bpe_oracle_merges.last_state
    return pd.DataFrame({
        "doc_id": src["doc_id"].to_pandas(),
        "ts_ns": src["ts_ns"].to_pandas(),
        "bpe_len": np.diff(offs).astype(np.int64),
    })


def sql_seq_bpe_merges(path: str) -> str:
    return _materialized_oracle(path, "bpe_merges_v1", _bpe_oracle_merges,
                                columns=("tokens",))


def sql_seq_bpe_apply(path: str) -> str:
    return _materialized_oracle(path, "bpe_apply_v1", _bpe_apply_expected)


# --------------------------------------------------------------------------
# round 3: LOO target encoding / rollup / pivot counts / nearest-POI
# --------------------------------------------------------------------------


def q_events_target_loo(sf_dir: str):
    """Leakage-safe leave-one-out target encoding of event_type against
    value (stages/encode.target_encode_loo): per-category integer-cents
    stats broadcast, per-row exclusion map; singleton categories NULL."""
    from pymhealth_ray.stages.encode import target_encode_loo

    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["event_id", "event_type", "value"])
    out = target_encode_loo(ds, "event_type", "value", out_name="value_loo")

    def finish(b: pa.Table) -> pa.Table:
        return b.select(["event_id", "event_type", "value_loo"])

    return out.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_TARGET_LOO = """
WITH e AS (SELECT event_id, event_type,
                  CAST(round(value * 100) AS BIGINT) AS vc FROM events),
s AS (SELECT event_type, sum(vc) AS sc, count(*) AS n FROM e GROUP BY event_type)
SELECT e.event_id, e.event_type,
       CASE WHEN s.n > 1
            THEN CAST(s.sc - e.vc AS DOUBLE) / CAST(100 * (s.n - 1) AS DOUBLE)
            END AS value_loo
FROM e JOIN s USING (event_type)
"""


def q_lineitem_rollup(sf_dir: str):
    """GROUP BY ROLLUP (returnflag, linestatus) of quantity cents + row
    counts (stages/aggregate.grouped_rollup: finest level via partial
    aggregation, coarser levels derived exactly — one scan)."""
    from pymhealth_ray.stages.aggregate import grouped_rollup

    ds = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_returnflag", "l_linestatus", "l_quantity"])

    def cents(b: pa.Table) -> pa.Table:
        return _cents(b, "l_quantity", "qty_c").drop_columns(["l_quantity"])

    out = grouped_rollup(ds.map_batches(cents, batch_format="pyarrow"),
                         ["l_returnflag", "l_linestatus"], ["qty_c"])

    def finish(b: pa.Table) -> pa.Table:
        return b.select(["l_returnflag", "l_linestatus", "qty_c_sum", "n"])

    return out.map_batches(finish, batch_format="pyarrow")


SQL_LINEITEM_ROLLUP = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_c_sum,
       count(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_events_type_pivot(sf_dir: str):
    """Per-user wide event-type count columns (one-hot aggregation,
    stages/aggregate.grouped_pivot_counts) — the categorical feature
    vector for downstream models."""
    from pymhealth_ray.stages.aggregate import grouped_pivot_counts

    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["user_id", "event_type"])
    return grouped_pivot_counts(ds, "user_id", "event_type", PIVOT_TYPES)


SQL_EVENTS_TYPE_PIVOT = """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click')    AS n_click,
       count(*) FILTER (WHERE event_type = 'error')    AS n_error,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
       count(*) FILTER (WHERE event_type = 'view')     AS n_view
FROM events GROUP BY user_id
"""


#: fixed reference sites for the nearest-site join (inline VALUES in SQL)
POI_SITES = [
    (0, 45.10, 7.02), (1, 45.62, 7.08), (2, 46.55, 7.04),
    (3, 47.08, 7.11), (4, 48.01, 6.98), (5, 49.53, 7.06),
]


def q_events_nearest_poi(sf_dir: str):
    """Broadcast nearest-reference-site join: per event, the argmin site
    over squared-degree distance (ties -> smaller site id) on the
    deterministic synthetic coordinates — the reference's home-coords
    broadcast lookup (reference:location/features.py:27-53) generalized to
    an argmin over a site table. Pure-arithmetic distance keeps both sides
    bit-exact."""
    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["event_id", "user_id", "value"])
    sites = np.array(POI_SITES, dtype=np.float64)

    def score(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        val = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        lat, lon = _geo_coords(uid, eid, val)
        dlat = lat[:, None] - sites[None, :, 1]
        dlon = lon[:, None] - sites[None, :, 2]
        d2 = dlat * dlat + dlon * dlon
        best = np.argmin(d2, axis=1)  # first minimum = smallest site id
        return pa.table({
            "event_id": b["event_id"],
            "poi_id": pa.array(sites[best, 0].astype(np.int64)),
            "d2": pa.array(d2[np.arange(len(best)), best],
                           type=pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def sql_events_nearest_poi() -> str:
    values = ", ".join(f"({pid}, {plat}, {plon})"
                       for pid, plat, plon in POI_SITES)
    return f"""
WITH e AS (SELECT event_id,
                  45.0 + (user_id % 10) * 0.5 + (event_id % 3) * 0.05
                       + ((value * 1000.0) % 1.0 - 0.5) * 2e-4 AS lat,
                  7.0 + (event_id % 3) * 0.05
                      + ((value * 7777.0) % 1.0 - 0.5) * 2e-4 AS lon
           FROM events),
p(poi_id, plat, plon) AS (VALUES {values}),
d AS (SELECT event_id, poi_id,
             (lat - plat) * (lat - plat) + (lon - plon) * (lon - plon) AS d2,
             row_number() OVER (PARTITION BY event_id
                                ORDER BY (lat - plat) * (lat - plat)
                                       + (lon - plon) * (lon - plon), poi_id) AS rn
      FROM e CROSS JOIN p)
SELECT event_id, poi_id, d2 FROM d WHERE rn = 1
"""


# --------------------------------------------------------------------------
# round 3: histogram / correlation matrix / funnel summary
# --------------------------------------------------------------------------

HIST_W = 50  # cents per bin


def q_events_value_hist(sf_dir: str):
    """Fixed-width histogram of value per event_type (bin = floor of
    integer cents / width — exact on both sides). Partial bincounts per
    block collapse the exchange to (type, bin) rows."""
    from pymhealth_ray.stages.aggregate import grouped_stats

    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["event_type", "value"])

    def binify(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "vc")
        vc = b["vc"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": b["event_type"],
            "bin": pa.array(vc // HIST_W),
        })

    out = grouped_stats(ds.map_batches(binify, batch_format="pyarrow"),
                        ["event_type", "bin"], count_name="n")

    def finish(b: pa.Table) -> pa.Table:
        return b.select(["event_type", "bin", "n"])

    return out.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_VALUE_HIST = f"""
SELECT event_type,
       CAST(round(value * 100) AS BIGINT) // {HIST_W} AS bin,
       count(*) AS n
FROM events GROUP BY event_type, bin
"""

CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def q_lineitem_corr(sf_dir: str):
    """Exact Pearson correlation matrix over the 2-dec lineitem measures:
    per-block integer-cents partial sums (n, Sx, Sxx, Sxy) merge exactly,
    the final correlation is one identical float expression on both sides
    (cross-products bounded: cents² × rows < 2^63 at gate scale — at
    larger scale shard the sums or widen to float partials)."""
    cols = list(CORR_COLS)
    ds = read_table(f"{sf_dir}/lineitem.parquet", columns=cols)
    k = len(cols)

    def partial(b: pa.Table) -> pa.Table:
        mats = []
        for c in cols:
            v = b[c]
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            mats.append(np.rint(v.to_numpy(zero_copy_only=False)
                                .astype(np.float64) * 100).astype(np.int64))
        M = np.stack(mats, axis=1)
        names, vals = ["n"], [np.int64(len(M))]
        for i in range(k):
            names.append(f"s{i}")
            vals.append(M[:, i].sum())
        for i in range(k):
            for j in range(i, k):
                names.append(f"p{i}_{j}")
                vals.append((M[:, i] * M[:, j]).sum())
        return pa.table({nm: pa.array([v], type=pa.int64())
                         for nm, v in zip(names, vals)})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)

    def const_g(b: pa.Table) -> pa.Table:
        return b.append_column("__g", pa.array(
            np.zeros(b.num_rows, dtype=np.int8)))

    def merge(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__g"])
        sums = {nm: int(pc.sum(t[nm]).as_py() or 0) for nm in t.column_names}
        n = sums["n"]
        rows = []
        for i in range(k):
            for j in range(i + 1, k):
                sx, sy = sums[f"s{i}"], sums[f"s{j}"]
                sxx, syy = sums[f"p{i}_{i}"], sums[f"p{j}_{j}"]
                sxy = sums[f"p{i}_{j}"]
                num = float(n * sxy - sx * sy)
                den = float(n * sxx - sx * sx) * float(n * syy - sy * sy)
                rows.append((cols[i], cols[j], num / np.sqrt(den)))
        tbl = pa.table({
            "col_a": pa.array([r[0] for r in rows], type=pa.string()),
            "col_b": pa.array([r[1] for r in rows], type=pa.string()),
            "corr": pa.array([r[2] for r in rows], type=pa.float64()),
        })
        return _round_cols(tbl, {"corr": 6})

    return partials.map_batches(const_g, batch_format="pyarrow").groupby(
        "__g").map_groups(merge, batch_format="pyarrow")


def _sql_corr_pair(a: str, b: str) -> str:
    ca = f"CAST(round({a} * 100) AS BIGINT)"
    cb = f"CAST(round({b} * 100) AS BIGINT)"
    return f"""
  SELECT '{a}' AS col_a, '{b}' AS col_b,
         round(CAST(count(*) * sum({ca} * {cb}) - sum({ca}) * sum({cb}) AS DOUBLE)
               / sqrt(CAST(count(*) * sum({ca} * {ca}) - sum({ca}) * sum({ca}) AS DOUBLE)
                      * CAST(count(*) * sum({cb} * {cb}) - sum({cb}) * sum({cb}) AS DOUBLE)), 6) AS corr
  FROM lineitem"""


SQL_LINEITEM_CORR = " UNION ALL ".join(
    _sql_corr_pair(a, b)
    for i, a in enumerate(CORR_COLS) for b in CORR_COLS[i + 1:])


def q_events_funnel_summary(sf_dir: str):
    """Funnel conversion summary: user counts per reached level plus exact
    mean step-transition times over completers of that step (integer-us
    sums / counts — bit-exact int/int division both sides)."""
    funnel = q_events_funnel(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        r = b["reached"].to_numpy(zero_copy_only=False)
        t1 = b["t1"].to_numpy(zero_copy_only=False)
        t2 = b["t2"].to_numpy(zero_copy_only=False)
        t3 = b["t3"].to_numpy(zero_copy_only=False)
        rows = {"reached": [], "n_users": [], "d12_sum": [], "d12_n": [],
                "d23_sum": [], "d23_n": []}
        for lvl in np.unique(r):
            m = r == lvl
            rows["reached"].append(int(lvl))
            rows["n_users"].append(int(m.sum()))
            m2 = m & (r >= 2)
            d12 = (t2[m2] - t1[m2]) if m2.any() else np.array([], np.int64)
            rows["d12_sum"].append(int(d12.sum()))
            rows["d12_n"].append(int(m2.sum()))
            m3 = m & (r >= 3)
            d23 = (t3[m3] - t2[m3]) if m3.any() else np.array([], np.int64)
            rows["d23_sum"].append(int(d23.sum()))
            rows["d23_n"].append(int(m3.sum()))
        return pa.table({k2: pa.array(v, type=pa.int64())
                         for k2, v in rows.items()})

    def const_g(b: pa.Table) -> pa.Table:
        return b.append_column("__g", pa.array(
            np.zeros(b.num_rows, dtype=np.int8)))

    def merge(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__g"]).group_by("reached").aggregate(
            [("n_users", "sum"), ("d12_sum", "sum"), ("d12_n", "sum"),
             ("d23_sum", "sum"), ("d23_n", "sum")])
        r = t["reached"].to_numpy(zero_copy_only=False)
        nu = t["n_users_sum"].to_numpy(zero_copy_only=False)
        d12s = t["d12_sum_sum"].to_numpy(zero_copy_only=False)
        d12n = t["d12_n_sum"].to_numpy(zero_copy_only=False)
        d23s = t["d23_sum_sum"].to_numpy(zero_copy_only=False)
        d23n = t["d23_n_sum"].to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            m12 = d12s / d12n
            m23 = d23s / d23n
        return pa.table({
            "reached": pa.array(r, type=pa.int64()),
            "n_users": pa.array(nu, type=pa.int64()),
            "mean_t12_us": pa.array(np.where(d12n > 0, m12, 0.0),
                                    type=pa.float64(), mask=d12n == 0),
            "mean_t23_us": pa.array(np.where(d23n > 0, m23, 0.0),
                                    type=pa.float64(), mask=d23n == 0),
        })

    return funnel.map_batches(partial, batch_format="pyarrow",
                              batch_size=None).map_batches(
        const_g, batch_format="pyarrow").groupby("__g").map_groups(
        merge, batch_format="pyarrow")


SQL_EVENTS_FUNNEL_SUMMARY = f"""
WITH f AS ({SQL_EVENTS_FUNNEL})
SELECT reached, count(*)::BIGINT AS n_users,
       CAST(sum(t2 - t1) FILTER (WHERE reached >= 2) AS DOUBLE)
           / count(*) FILTER (WHERE reached >= 2) AS mean_t12_us,
       CAST(sum(t3 - t2) FILTER (WHERE reached >= 3) AS DOUBLE)
           / count(*) FILTER (WHERE reached >= 3) AS mean_t23_us
FROM f GROUP BY reached
"""


# --------------------------------------------------------------------------
# round-3 second wave: OLAP / mining / rank / journey operators
# --------------------------------------------------------------------------


def q_lineitem_cube(sf_dir: str):
    """GROUP BY CUBE (returnflag, linestatus): every grouping subset from
    ONE input scan (stages/aggregate.grouped_cube — coarser sets derived
    exactly from the finest partial aggregation)."""
    from pymhealth_ray.stages.aggregate import grouped_cube

    ds = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_returnflag", "l_linestatus", "l_quantity"])

    def cents(b: pa.Table) -> pa.Table:
        return _cents(b, "l_quantity", "qty_c").drop_columns(["l_quantity"])

    out = grouped_cube(ds.map_batches(cents, batch_format="pyarrow"),
                       ["l_returnflag", "l_linestatus"], ["qty_c"])
    return out.map_batches(
        lambda b: b.select(["l_returnflag", "l_linestatus", "qty_c_sum", "n"]),
        batch_format="pyarrow")


SQL_LINEITEM_CUBE = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_c_sum,
       count(*) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_lineitem_moments(sf_dir: str):
    """Exact per-group skewness/kurtosis from integer power sums: quantity
    is whole units 1..50, so Σq..Σq⁴ are exact int64 at any scale (q⁴ ≤
    6.25e6 ⇒ ~1e12 group rows before overflow); the float expression tree
    over the exact sums matches the SQL oracle op-for-op (population
    moments: g1 = m3/m2^1.5, g2 = m4/m2² − 3)."""
    ds = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_returnflag", "l_quantity"])

    def powers(b: pa.Table) -> pa.Table:
        q = np.rint(b["l_quantity"].to_numpy(zero_copy_only=False)).astype(np.int64)
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "q1": pa.array(q), "q2": pa.array(q * q),
            "q3": pa.array(q * q * q), "q4": pa.array(q * q * q * q),
        })

    agg = grouped_stats(ds.map_batches(powers, batch_format="pyarrow"),
                        ["l_returnflag"], sum_cols=["q1", "q2", "q3", "q4"])

    def finish(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        s1 = b["q1_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
        s2 = b["q2_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
        s3 = b["q3_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
        s4 = b["q4_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
        mu = s1 / n
        m2 = s2 / n - mu * mu
        m3 = s3 / n - 3.0 * mu * (s2 / n) + 2.0 * mu * mu * mu
        m4 = (s4 / n - 4.0 * mu * (s3 / n) + 6.0 * mu * mu * (s2 / n)
              - 3.0 * mu * mu * mu * mu)
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "n": b["n"].cast(pa.int64()),
            "mean_qty": pa.array(_round_away(mu, 6)),
            "var_qty": pa.array(_round_away(m2, 6)),
            "skew_qty": pa.array(_round_away(m3 / (m2 ** 1.5), 6)),
            "kurt_qty": pa.array(_round_away(m4 / (m2 * m2) - 3.0, 6)),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_LINEITEM_MOMENTS = """
WITH s AS (
  SELECT l_returnflag, count(*) AS n,
         sum(q) AS s1, sum(q*q) AS s2, sum(q*q*q) AS s3, sum(q*q*q*q) AS s4
  FROM (SELECT l_returnflag, CAST(round(l_quantity) AS BIGINT) AS q FROM lineitem)
  GROUP BY l_returnflag)
SELECT l_returnflag, n,
  round(CAST(s1 AS DOUBLE)/n, 6) AS mean_qty,
  round(CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n), 6) AS var_qty,
  round((CAST(s3 AS DOUBLE)/n - 3.0*(CAST(s1 AS DOUBLE)/n)*(CAST(s2 AS DOUBLE)/n)
         + 2.0*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n))
        / pow(CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n), 1.5), 6) AS skew_qty,
  round((CAST(s4 AS DOUBLE)/n - 4.0*(CAST(s1 AS DOUBLE)/n)*(CAST(s3 AS DOUBLE)/n)
         + 6.0*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)*(CAST(s2 AS DOUBLE)/n)
         - 3.0*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n))
        / ((CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n))
           * (CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n))) - 3.0, 6) AS kurt_qty
FROM s
"""


def q_lineitem_star_revenue(sf_dir: str):
    """TPC-H Q5-shape star join: lineitem ⋈ orders large-large
    co-partitioned hash join, then the customer→nation→region dimension
    chain applied as ONE broadcast map-side lookup (dims are small and
    static — ray.put once, array-indexed per batch; no extra exchange).
    Revenue in exact integer 10⁻⁴ units."""
    import pyarrow.parquet as pq

    from pymhealth_ray.stages.join import equi_join

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    ck = cust["c_custkey"].to_numpy()
    c2n = np.zeros(int(ck.max()) + 1, dtype=np.int64)
    c2n[ck] = cust["c_nationkey"].to_numpy().astype(np.int64)
    nk = nat["n_nationkey"].to_numpy()
    n_names = np.empty(int(nk.max()) + 1, dtype=object)
    n_names[nk] = np.array(nat["n_name"].to_pylist(), dtype=object)
    n2r = np.zeros(int(nk.max()) + 1, dtype=np.int64)
    n2r[nk] = nat["n_regionkey"].to_numpy().astype(np.int64)
    rk = reg["r_regionkey"].to_numpy()
    r_names = np.empty(int(rk.max()) + 1, dtype=object)
    r_names[rk] = np.array(reg["r_name"].to_pylist(), dtype=object)
    dims_ref = ray.put((c2n, n_names, n2r, r_names))

    orders = read_table(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    li = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def prep(b: pa.Table) -> pa.Table:
        price_c = np.rint(b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        disc_c = np.rint(b["l_discount"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"o_orderkey": b["l_orderkey"],
                         "rev_u": pa.array(price_c * (100 - disc_c)),
                         "n_li": pa.array(np.ones(b.num_rows, dtype=np.int64))})

    # pre-aggregate revenue per orderkey BEFORE the join: the join exchange
    # then carries one row per order instead of one per lineitem (~4× less
    # at TPC-H fan-out; the reduction is exact — revenue sums and line
    # counts are associative)
    from pymhealth_ray.stages.aggregate import keyed_sum

    # 1M-row pre-combine chunks: lineitem is orderkey-clustered, so the
    # map-side combine still collapses ~4x while staying parallel (the 8M
    # default would serialize the 6M-row scan into one task)
    per_order = keyed_sum(li.map_batches(prep, batch_format="pyarrow"),
                          "o_orderkey", ["rev_u", "n_li"], num_buckets=NB,
                          precombine_rows=1_000_000)
    j = equi_join(orders, per_order,
                  on="o_orderkey", join_type="inner", num_buckets=NB)

    class DimChain:
        def __init__(self):
            self.c2n, self.n_names, self.n2r, self.r_names = ray.get(dims_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            cust = b["o_custkey"].to_numpy(zero_copy_only=False)
            nk = self.c2n[cust]
            return pa.table({
                "r_name": pa.array(self.r_names[self.n2r[nk]], type=pa.string()),
                "n_name": pa.array(self.n_names[nk], type=pa.string()),
                "rev_u": b["rev_u"],
                "n_li": b["n_li"],
            })

    annotated = j.map_batches(DimChain, batch_format="pyarrow",
                              concurrency=(1, 8))
    agg = grouped_stats(annotated, ["r_name", "n_name"],
                        sum_cols=["rev_u", "n_li"])
    return agg.map_batches(
        lambda b: pa.table({
            "r_name": b["r_name"], "n_name": b["n_name"],
            "n_items": b["n_li_sum"].cast(pa.int64()),
            "revenue_u": b["rev_u_sum"].cast(pa.int64())}),
        batch_format="pyarrow")


SQL_LINEITEM_STAR_REVENUE = """
SELECT r_name, n_name, count(*) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_u
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q_orders_basket_pairs(sf_dir: str):
    """Market-basket mining: top-20 part pairs by the number of orders
    containing both (stages/assoc.item_pair_topk — distributed pair
    explosion bounded by per-order line counts, keyed_sum merge, top-k
    partial pruning; deterministic (count DESC, part_a, part_b) order)."""
    from pymhealth_ray.stages.assoc import item_pair_topk

    ds = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_orderkey", "l_partkey"])
    return item_pair_topk(ds, "l_orderkey", "l_partkey", k=20, min_count=2,
                          num_buckets=NB, out_a="part_a", out_b="part_b",
                          count_name="n_orders")


SQL_ORDERS_BASKET_PAIRS = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*)::BIGINT AS n_orders
      FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                        AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2)
SELECT part_a, part_b, n_orders FROM p WHERE n_orders >= 2
ORDER BY n_orders DESC, part_a, part_b LIMIT 20
"""


def q_events_ntile(sf_dir: str):
    """Exact NTILE(4) within event_type ordered by (value, event_id) —
    the unbounded-domain distributed ranking plan
    (stages/rank.partitioned_sort_rank: range-bucket on value, per-bucket
    vectorized sort rank, O(partitions·bins) driver offsets)."""
    from pymhealth_ray.stages.rank import ntile

    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["event_id", "event_type", "value"])
    out = ntile(ds, "event_type", "value", "event_id", k=4, out="tile")
    return out.map_batches(
        lambda b: b.select(["event_id", "event_type", "tile"]),
        batch_format="pyarrow")


SQL_EVENTS_NTILE = """
SELECT event_id, event_type,
       CAST(ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id)
            AS BIGINT) AS tile
FROM events
"""


def q_events_attribution(sf_dir: str):
    """Last-touch attribution: each purchase as-of joins to the user's
    most recent click (stages/asof.py — the sessionization-adjacent join
    the reference's home-coords join-back prefigures), then revenue rolls
    up by the attributed click's hour-of-day (NULL = unattributed).
    Integer-cents revenue; hour from pure epoch-µs arithmetic so both
    sides are bit-exact."""
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "event_type", "value"])

    def purchases(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["event_type"], "purchase"))
        b = _cents(b, "value", "rev_c")
        return b.select(["event_id", "user_id", "ts_us", "rev_c"])

    def clicks(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["event_type"], "click"))
        return b.select(["user_id", "ts_us"])

    facts = ds.map_batches(purchases, batch_format="pyarrow")
    dim = ds.map_batches(clicks, batch_format="pyarrow").materialize()
    j = asof_join(facts, dim, [], entity_col="user_id", ts_col="ts_us",
                  num_buckets=NB)

    HOUR_US = 3_600_000_000

    def hour_of(b: pa.Table) -> pa.Table:
        cts = b["ts_us_asof"]
        if isinstance(cts, pa.ChunkedArray):
            cts = cts.combine_chunks()
        valid = pc.is_valid(cts).to_numpy(zero_copy_only=False)
        v = cts.fill_null(0).to_numpy(zero_copy_only=False)
        # -1 sentinel = unattributed (group keys must be null-free for the
        # bucket exchange); restored to SQL NULL in finish
        hour = np.where(valid, (v // HOUR_US) % 24, -1)
        return pa.table({
            "click_hour": pa.array(hour.astype(np.int64)),
            "rev_c": b["rev_c"],
        })

    agg = grouped_stats(j.map_batches(hour_of, batch_format="pyarrow"),
                        ["click_hour"], sum_cols=["rev_c"],
                        count_name="n_purchases")

    def finish(b: pa.Table) -> pa.Table:
        h = b["click_hour"].to_numpy(zero_copy_only=False)
        return pa.table({
            "click_hour": pa.array(h, type=pa.int64(), mask=h < 0),
            "n_purchases": b["n_purchases"].cast(pa.int64()),
            "revenue_cents": b["rev_c_sum"].cast(pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_ATTRIBUTION = """
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type, value FROM events),
f AS (SELECT user_id, ts_us, CAST(round(value * 100) AS BIGINT) AS rev_c
      FROM e WHERE event_type = 'purchase'),
d AS (SELECT user_id, ts_us AS c_ts FROM e WHERE event_type = 'click'),
j AS (SELECT f.rev_c, d.c_ts
      FROM f ASOF LEFT JOIN d ON f.user_id = d.user_id AND f.ts_us >= d.c_ts)
SELECT (c_ts // 3600000000) % 24 AS click_hour,
       count(*) AS n_purchases,
       CAST(sum(rev_c) AS BIGINT) AS revenue_cents
FROM j GROUP BY 1
"""


def q_events_journey(sf_dir: str):
    """Per-user first-10-event journey string (ordered string_agg head —
    stages/collect.grouped_head_collect: one entity exchange, vectorized
    ListArray join, head clip in offset arithmetic)."""
    from pymhealth_ray.stages.collect import grouped_head_collect

    ds = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
    return grouped_head_collect(ds, "user_id", "ts_us", "event_type", k=10,
                                tiebreak_col="event_id", sep=">",
                                out="journey", num_buckets=NB)


SQL_EVENTS_JOURNEY = """
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type FROM events),
r AS (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts_us, event_id) AS rn FROM e)
SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS journey,
       count(*) AS n_first
FROM r WHERE rn <= 10 GROUP BY user_id
"""


def q_seq_token_spectrum(sf_dir: str):
    """Zipf frequency spectrum: token → exact corpus count (keyed_sum —
    no row sort), then count → #tokens at that count (second, tiny
    keyed_sum). The spectrum is the corpus-statistics input to
    vocabulary-size and subword decisions."""
    from pymhealth_ray.stages.aggregate import keyed_sum

    ds, _ = _seq_ds(sf_dir, ["tokens"])

    def tok_partial(b: pa.Table) -> pa.Table:
        col = b["tokens"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.int64)
        vals, cnts = np.unique(flat, return_counts=True)
        return pa.table({"tok": pa.array(vals),
                         "c": pa.array(cnts.astype(np.int64))})

    tok_counts = keyed_sum(
        ds.map_batches(tok_partial, batch_format="pyarrow", batch_size=None),
        "tok", ["c"], num_buckets=64)

    def spec_partial(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(c, return_counts=True)
        return pa.table({"freq": pa.array(vals),
                         "n_tokens": pa.array(cnts.astype(np.int64))})

    return keyed_sum(
        tok_counts.map_batches(spec_partial, batch_format="pyarrow",
                               batch_size=None),
        "freq", ["n_tokens"], num_buckets=8, precombine_rows=None)


def sql_seq_token_spectrum(path: str) -> str:
    return f"""
WITH t AS (SELECT unnest(tokens) AS tok FROM read_parquet('{path}/part-*.parquet')),
c AS (SELECT tok, count(*)::BIGINT AS c FROM t GROUP BY tok)
SELECT c AS freq, count(*)::BIGINT AS n_tokens FROM c GROUP BY c
"""


def q_seq_distinct_ngrams(sf_dir: str):
    """Per-row trigram diversity: distinct packed 3-token windows and the
    distinct fraction (type-token ratio at the n-gram level) — a pure
    map-only kernel (collision-free int packing, per-segment sorted
    run-count; no exchange at all)."""
    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "tokens"])
    K = np.int64(2048)

    def score(b: pa.Table) -> pa.Table:
        col = b["tokens"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.int64)
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
        offs = np.concatenate(([0], np.cumsum(lens)))
        n_tri = np.maximum(lens - 2, 0)
        pos = np.arange(len(flat), dtype=np.int64)
        local = pos - np.repeat(offs[:-1], lens)
        ok = local <= np.repeat(lens - 3, lens)
        starts = np.flatnonzero(ok)
        keys = flat[starts] + flat[starts + 1] * K + flat[starts + 2] * K * K
        # distinct per row: sort within segments, count value runs
        rowidx = np.repeat(np.arange(len(lens), dtype=np.int64), n_tri)
        order = np.lexsort((keys, rowidx))
        ks, rs = keys[order], rowidx[order]
        newv = np.ones(len(ks), dtype=np.int64)
        newv[1:] = (ks[1:] != ks[:-1]) | (rs[1:] != rs[:-1])
        nd = np.bincount(rs, weights=newv, minlength=len(lens)).astype(np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            frac = nd.astype(np.float64) / n_tri
        has = n_tri > 0
        return pa.table({
            "doc_id": b["doc_id"], "ts_ns": b["ts_ns"],
            "n_trigrams": pa.array(n_tri),
            "n_distinct": pa.array(nd),
            "distinct_frac": pa.array(np.where(has, frac, 0.0),
                                      type=pa.float64(), mask=~has),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def sql_seq_distinct_ngrams(path: str) -> str:
    return f"""
SELECT doc_id, ts_ns,
  CAST(greatest(len(tokens) - 2, 0) AS BIGINT) AS n_trigrams,
  CAST(len(list_distinct([CAST(tokens[i] AS BIGINT)
       + CAST(tokens[i+1] AS BIGINT)*2048
       + CAST(tokens[i+2] AS BIGINT)*4194304
       FOR i IN generate_series(1, len(tokens)-2)])) AS BIGINT) AS n_distinct,
  CASE WHEN len(tokens) >= 3 THEN
    CAST(len(list_distinct([CAST(tokens[i] AS BIGINT)
         + CAST(tokens[i+1] AS BIGINT)*2048
         + CAST(tokens[i+2] AS BIGINT)*4194304
         FOR i IN generate_series(1, len(tokens)-2)])) AS DOUBLE)
      / (len(tokens) - 2)
  END AS distinct_frac
FROM read_parquet('{path}/part-*.parquet')
"""


def q_seq_repetition(sf_dir: str):
    """Gopher/MassiveText intra-document repetition signals per row
    (stages/repetition.py — map-only, one lexsort per batch, no exchange):
    distinct-token fraction, most-frequent-token fraction, duplicate-bigram
    fraction. The standard pre-training quality filters for boilerplate/
    spam-dominated documents."""
    from pymhealth_ray.stages.repetition import repetition_stats

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "tokens"])
    return repetition_stats(ds)


def sql_seq_repetition(path: str) -> str:
    return f"""
WITH s AS (SELECT doc_id, ts_ns, tokens FROM read_parquet('{path}/part-*.parquet')),
t AS (SELECT doc_id, ts_ns, unnest(tokens) AS tok FROM s),
c AS (SELECT doc_id, ts_ns, tok, count(*) AS c FROM t GROUP BY 1, 2, 3),
m AS (SELECT doc_id, ts_ns, CAST(max(c) AS BIGINT) AS top_c,
             CAST(count(*) AS BIGINT) AS n_distinct FROM c GROUP BY 1, 2),
b AS (SELECT doc_id, ts_ns, CAST(len(tokens) AS BIGINT) AS n_tok,
             CAST(greatest(len(tokens) - 1, 0) AS BIGINT) AS n_bg,
             CAST(len(list_distinct([CAST(tokens[i] AS BIGINT) * 2048
                                     + CAST(tokens[i+1] AS BIGINT)
                   FOR i IN generate_series(1, len(tokens) - 1)])) AS BIGINT) AS d_bg
      FROM s)
SELECT b.doc_id, b.ts_ns, b.n_tok,
       CASE WHEN b.n_tok > 0
            THEN CAST(m.n_distinct AS DOUBLE) / b.n_tok END AS distinct_frac,
       CASE WHEN b.n_tok > 0
            THEN CAST(m.top_c AS DOUBLE) / b.n_tok END AS top_tok_frac,
       CASE WHEN b.n_bg > 0
            THEN CAST(b.n_bg - b.d_bg AS DOUBLE) / b.n_bg END AS dup_bigram_frac
FROM b LEFT JOIN m USING (doc_id, ts_ns)
"""


def q_seq_vocab_growth(sf_dir: str):
    """Vocabulary-growth (Heaps-law) curve over event time: per token the
    FIRST-SEEN timestamp (keyed_agg min — vocab-bounded output), then
    cumulative vocabulary size at 10 equal time checkpoints. All integer
    arithmetic; the curve is how data-mixture plans estimate marginal
    novel-token yield."""
    from pymhealth_ray.stages.aggregate import keyed_agg

    ds, _ = _seq_ds(sf_dir, ["ts_ns", "tokens"])

    def partial(b: pa.Table) -> pa.Table:
        col = b["tokens"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.int64)
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = np.repeat(b["ts_ns"].to_numpy(zero_copy_only=False), lens)
        order = np.argsort(flat, kind="stable")
        fs, tss = flat[order], ts[order]
        is_start = np.ones(len(fs), dtype=bool)
        is_start[1:] = fs[1:] != fs[:-1]
        st = np.flatnonzero(is_start)
        first = (np.minimum.reduceat(tss, st) if len(st)
                 else tss[:0])
        return pa.table({"tok": pa.array(fs[st] if len(st) else fs[:0]),
                         "first_ts": pa.array(first)})

    firsts = keyed_agg(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        "tok", {"first_ts": "min"}, num_buckets=64)

    import pyarrow.parquet as _pq  # noqa: F401  (driver-less bounds pass)
    bounds = grouped_stats(
        ds.map_batches(lambda b: pa.table(
            {"one": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
             "ts_ns": b["ts_ns"]}), batch_format="pyarrow"),
        ["one"], min_cols=["ts_ns"], max_cols=["ts_ns"]).take_all()
    mn = int(bounds[0]["ts_ns_min"]); mx = int(bounds[0]["ts_ns_max"])
    thr = np.array([mn + ((mx - mn) * cp) // 10 for cp in range(1, 11)],
                   dtype=np.int64)
    thr_ref = ray.put(thr)

    def hist(b: pa.Table) -> pa.Table:
        t = ray.get(thr_ref)
        f = b["first_ts"].to_numpy(zero_copy_only=False)
        # tokens first seen ≤ thr_cp, per checkpoint (partial, summed below)
        counts = np.searchsorted(np.sort(f), t, side="right")
        return pa.table({"cp": pa.array(np.arange(1, 11, dtype=np.int64)),
                         "thr_ts": pa.array(t),
                         "vocab": pa.array(counts.astype(np.int64))})

    from pymhealth_ray.stages.aggregate import keyed_sum
    parts = firsts.map_batches(hist, batch_format="pyarrow",
                               batch_size=None)
    merged = keyed_sum(parts, "cp", ["vocab"], num_buckets=1,
                       precombine_rows=None)

    def attach(b: pa.Table) -> pa.Table:
        t = ray.get(thr_ref)
        cp = b["cp"].to_numpy(zero_copy_only=False)
        return pa.table({"cp": b["cp"], "thr_ts": pa.array(t[cp - 1]),
                         "vocab": b["vocab"]})

    return merged.map_batches(attach, batch_format="pyarrow")


def sql_seq_vocab_growth(path: str) -> str:
    return f"""
WITH s AS (SELECT ts_ns, unnest(tokens) AS tok FROM read_parquet('{path}/part-*.parquet')),
f AS (SELECT tok, min(ts_ns) AS first_ts FROM s GROUP BY tok),
b AS (SELECT min(ts_ns) AS mn, max(ts_ns) AS mx FROM read_parquet('{path}/part-*.parquet')),
cps AS (SELECT unnest(generate_series(1, 10)) AS cp)
SELECT cp, mn + ((mx - mn) * cp) // 10 AS thr_ts,
       (SELECT count(*) FROM f WHERE first_ts <= mn + ((mx - mn) * cp) // 10) AS vocab
FROM cps, b
"""


def q_docs_ledger_ingest(sf_dir: str):
    """Two-phase incremental ingestion with a persistent dedup ledger
    (stages/dedup.ledger_dedup_ingest): even doc_ids arrive first and
    seed the ledger; odd doc_ids arrive second — the result is phase 2's
    survivors (content never seen in phase 1, intra-shard deduped).
    The ledger directory is rebuilt per run for determinism."""
    import shutil
    import tempfile

    ldir = os.path.join(tempfile.gettempdir(), "pymhealth_ray_fixtures",
                        f"ledger_{os.path.basename(sf_dir)}_v1")
    shutil.rmtree(ldir, ignore_errors=True)

    ds = read_table(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])

    def even(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(d % 2 == 0))

    def odd(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(d % 2 == 1))

    from pymhealth_ray.stages.dedup import ledger_dedup_ingest

    phase_a = ledger_dedup_ingest(
        ds.map_batches(even, batch_format="pyarrow"), ldir,
        ingest_tag="a", num_buckets=16)
    phase_a.materialize()  # ledger write barrier: phase b must see a

    phase_b = ledger_dedup_ingest(
        ds.map_batches(odd, batch_format="pyarrow"), ldir,
        ingest_tag="b", num_buckets=16)
    return phase_b.map_batches(
        lambda b: b.select(["doc_id", "key_md5", "n_dups"]),
        batch_format="pyarrow")


SQL_DOCS_LEDGER_INGEST = """
WITH a AS (SELECT md5(text) AS h FROM documents WHERE doc_id % 2 = 0),
b AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 2 = 1),
wb AS (SELECT min(doc_id) AS doc_id, h, count(*)::BIGINT AS n_dups
       FROM b GROUP BY h)
SELECT doc_id, h AS key_md5, n_dups FROM wb
WHERE h NOT IN (SELECT DISTINCT h FROM a)
"""


CONCAT_L = 2048


def q_seq_concat_examples(sf_dir: str):
    """Concat-then-split example layout (the GPT-style alternative to
    greedy packing): documents concatenated in deterministic (ts_ns,
    doc_id) order and cut into fixed 2048-token examples. Per document:
    its global token offset (distributed scan —
    stages/rank.ordered_prefix_sum), the first/last example it lands in,
    and how many example boundaries cut it."""
    from pymhealth_ray.stages.rank import ordered_prefix_sum

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "n_tok"])

    def widen(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b["doc_id"], "ts_ns": b["ts_ns"],
                         "n_tok": b["n_tok"].cast(pa.int64())})

    cum = ordered_prefix_sum(ds.map_batches(widen, batch_format="pyarrow"),
                             "n_tok", "ts_ns", "doc_id", out="cum")

    def layout(b: pa.Table) -> pa.Table:
        c = b["cum"].to_numpy(zero_copy_only=False)
        n = b["n_tok"].to_numpy(zero_copy_only=False)
        prev = c - n
        first = prev // CONCAT_L
        last = np.where(n > 0, (c - 1) // CONCAT_L, first)
        return pa.table({
            "doc_id": b["doc_id"], "ts_ns": b["ts_ns"],
            "tok_offset": pa.array(prev),
            "first_example": pa.array(first),
            "last_example": pa.array(last),
            "n_cuts": pa.array(last - first),
        })

    return cum.map_batches(layout, batch_format="pyarrow")


def sql_seq_concat_examples(path: str) -> str:
    return f"""
WITH e AS (SELECT doc_id, ts_ns, CAST(n_tok AS BIGINT) AS n_tok,
                  CAST(sum(CAST(n_tok AS BIGINT)) OVER (
                      ORDER BY ts_ns, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
           FROM read_parquet('{path}/part-*.parquet'))
SELECT doc_id, ts_ns, cum - n_tok AS tok_offset,
       (cum - n_tok) // {CONCAT_L} AS first_example,
       CASE WHEN n_tok > 0 THEN (cum - 1) // {CONCAT_L}
            ELSE (cum - n_tok) // {CONCAT_L} END AS last_example,
       (CASE WHEN n_tok > 0 THEN (cum - 1) // {CONCAT_L}
             ELSE (cum - n_tok) // {CONCAT_L} END)
           - ((cum - n_tok) // {CONCAT_L}) AS n_cuts
FROM e
"""


DAY_US = 86_400_000_000


def q_events_retention(sf_dir: str):
    """Cohort retention matrix: users grouped by first-active day; for
    every (cohort_day, day_offset) the number of cohort users active that
    day. ONE entity exchange: per-user bucket groups compute first day +
    distinct active days vectorized (the sessionization partitioning
    invariant reused); output is |days|² bounded."""
    from pymhealth_ray.stages.partition import grouped_by_bucket

    ds = _events(sf_dir, ["user_id", "ts"])

    def days(b: pa.Table) -> pa.Table:
        ts = b["ts_us"].to_numpy(zero_copy_only=False)
        return pa.table({"user_id": b["user_id"],
                         "day": pa.array(ts // DAY_US)})

    def per_bucket(tbl: pa.Table) -> pa.Table:
        u = tbl["user_id"].to_numpy(zero_copy_only=False)
        d = tbl["day"].to_numpy(zero_copy_only=False)
        _, inv = np.unique(u, return_inverse=True)
        n_u = int(inv.max()) + 1 if len(inv) else 0
        # distinct (user, day)
        K = np.int64(1) << np.int64(32)
        du = np.unique(inv.astype(np.int64) * K + d)
        ug, ud = du >> np.int64(32), du & np.int64(0xFFFFFFFF)
        first = np.zeros(n_u, dtype=np.int64)
        seg = np.ones(len(ug), dtype=bool)
        seg[1:] = ug[1:] != ug[:-1]
        first[ug[np.flatnonzero(seg)]] = ud[np.flatnonzero(seg)]  # sorted ⇒ min
        cohort = first[ug]
        off = ud - cohort
        keys, cnts = np.unique(cohort * K + off, return_counts=True)
        return pa.table({
            "cohort_day": pa.array(keys >> np.int64(32)),
            "day_offset": pa.array(keys & np.int64(0xFFFFFFFF)),
            "n_users": pa.array(cnts.astype(np.int64)),
        })

    parts = grouped_by_bucket(ds.map_batches(days, batch_format="pyarrow"),
                              per_bucket, entity_col="user_id",
                              num_buckets=NB)
    agg = grouped_stats(parts, ["cohort_day", "day_offset"],
                        sum_cols=["n_users"], count_name="__nb")
    return agg.map_batches(
        lambda b: pa.table({
            "cohort_day": b["cohort_day"],
            "day_offset": b["day_offset"],
            "n_users": b["n_users_sum"].cast(pa.int64())}),
        batch_format="pyarrow")


SQL_EVENTS_RETENTION = """
WITH d AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
f AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id)
SELECT cohort_day, day - cohort_day AS day_offset, count(*) AS n_users
FROM d JOIN f USING (user_id) GROUP BY 1, 2
"""


def q_part_revenue_pareto(sf_dir: str):
    """Revenue-concentration (Pareto/Lorenz) deciles: parts ranked by
    revenue, cumulative share per decile — composes THREE distributed
    primitives (keyed_sum rollup → partitioned_sort_rank global ordering
    → decile aggregation) with int/int float division for bit-exact
    shares."""
    from pymhealth_ray.stages.aggregate import keyed_sum
    from pymhealth_ray.stages.rank import partitioned_sort_rank

    li = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_partkey", "l_extendedprice", "l_discount"])

    def prep(b: pa.Table) -> pa.Table:
        price_c = np.rint(b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        disc_c = np.rint(b["l_discount"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"l_partkey": b["l_partkey"],
                         "rev_u": pa.array(price_c * (100 - disc_c))})

    per_part = keyed_sum(li.map_batches(prep, batch_format="pyarrow"),
                         "l_partkey", ["rev_u"], num_buckets=NB,
                         precombine_rows=1_000_000)

    def negkey(b: pa.Table) -> pa.Table:
        r = b["rev_u"].to_numpy(zero_copy_only=False)
        b = b.append_column("neg_rev", pa.array(-r))
        return b.append_column("one", pa.array(
            np.zeros(b.num_rows, dtype=np.int8)))

    ranked = partitioned_sort_rank(
        per_part.map_batches(negkey, batch_format="pyarrow"),
        "one", "neg_rev", "l_partkey", num_bins=256, rank_name="rnk")

    def to_decile(b: pa.Table) -> pa.Table:
        r = b["rnk"].to_numpy(zero_copy_only=False)
        n = b["__n_part"].to_numpy(zero_copy_only=False)
        dec = (10 * r) // np.maximum(n, 1) + 1
        return pa.table({"decile": pa.array(dec.astype(np.int64)),
                         "rev_u": b["rev_u"],
                         "__one": pa.array(np.zeros(b.num_rows, np.int8))})

    agg = grouped_stats(ranked.map_batches(to_decile, batch_format="pyarrow"),
                        ["decile"], sum_cols=["rev_u"], count_name="n_parts")

    def finish(tbl: pa.Table) -> pa.Table:
        d = tbl["decile"].to_numpy(zero_copy_only=False)
        order = np.argsort(d)
        tbl = tbl.take(pa.array(order))
        rev = tbl["rev_u_sum"].to_numpy(zero_copy_only=False)
        total = rev.sum()
        cum = np.cumsum(rev)
        return pa.table({
            "decile": tbl["decile"].cast(pa.int64()),
            "n_parts": tbl["n_parts"].cast(pa.int64()),
            "revenue_u": pa.array(rev.astype(np.int64)),
            "rev_share": pa.array(rev.astype(np.float64) / total),
            "cum_share": pa.array(cum.astype(np.float64) / total),
        })

    def const_g(b: pa.Table) -> pa.Table:
        return b.append_column("__g", pa.array(
            np.zeros(b.num_rows, dtype=np.int8)))

    # ≤10 rows: one merge group for the cumulative readout
    return agg.map_batches(const_g, batch_format="pyarrow").groupby(
        "__g").map_groups(lambda t: finish(t.drop_columns(["__g"])),
                          batch_format="pyarrow")


SQL_PART_REVENUE_PARETO = """
WITH p AS (SELECT l_partkey,
                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                           (100 - CAST(round(l_discount * 100) AS BIGINT)))
                       AS BIGINT) AS rev_u
           FROM lineitem GROUP BY l_partkey),
r AS (SELECT rev_u,
             row_number() OVER (ORDER BY rev_u DESC, l_partkey) - 1 AS rnk,
             count(*) OVER () AS n FROM p),
d AS (SELECT (10 * rnk) // n + 1 AS decile, count(*) AS n_parts,
             CAST(sum(rev_u) AS BIGINT) AS revenue_u
      FROM r GROUP BY 1)
SELECT decile, n_parts, revenue_u,
       CAST(revenue_u AS DOUBLE)
           / (SELECT CAST(sum(revenue_u) AS BIGINT) FROM d) AS rev_share,
       CAST(CAST(sum(revenue_u) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS DOUBLE)
           / (SELECT CAST(sum(revenue_u) AS BIGINT) FROM d) AS cum_share
FROM d ORDER BY decile
"""


def q_events_zonemap_range(sf_dir: str):
    """Zone-map data skipping: events written range-partitioned by ts with
    a (min,max) manifest (sources/io.write_zonemapped), then a mid-50%
    time-range aggregate reads ONLY the overlapping files
    (io.read_zonemapped — I/O ∝ selectivity, the file-level generalization
    of parquet row-group stats). Pruning itself is pytest-asserted;
    here the driver gates the end-to-end filtered aggregate."""
    import shutil
    import tempfile

    from pymhealth_ray.sources.io import read_zonemapped, write_zonemapped

    zdir = os.path.join(tempfile.gettempdir(), "pymhealth_ray_fixtures",
                        f"zonemap_{os.path.basename(sf_dir)}_v1")
    if not os.path.exists(os.path.join(zdir, "_zonemap.json")):
        shutil.rmtree(zdir, ignore_errors=True)
        ds = _events(sf_dir, ["event_id", "ts", "event_type", "value"])
        write_zonemapped(ds, zdir, "ts_us", num_files=32)

    import json as _json

    with open(os.path.join(zdir, "_zonemap.json")) as f:
        man = _json.load(f)
    mn = min(m["zmin"] for m in man)
    mx = max(m["zmax"] for m in man)
    lo = mn + ((mx - mn) * 25) // 100
    hi = mn + ((mx - mn) * 75) // 100
    pruned, _, _ = read_zonemapped(zdir, "ts_us", lo, hi,
                                   columns=["ts_us", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return _cents(b, "value", "val_c").select(["event_type", "val_c"])

    agg = grouped_stats(pruned.map_batches(prep, batch_format="pyarrow"),
                        ["event_type"], sum_cols=["val_c"])
    return agg.map_batches(
        lambda b: pa.table({
            "event_type": b["event_type"],
            "n": b["n"].cast(pa.int64()),
            "value_cents": b["val_c_sum"].cast(pa.int64())}),
        batch_format="pyarrow")


def q_events_bloom_point(sf_dir: str):
    """Per-file BLOOM data skipping for point lookups on a column the
    layout is NOT sorted by (the Delta/Iceberg bloom-index shape): events
    written range-partitioned by time with a bloom on user_id in every
    file's manifest entry (io.write_zonemapped bloom_cols), then one
    user's full history read through io.read_zonemapped_point — only
    files that MAY contain the user are opened; an exact equality filter
    trims bloom false positives. Pruning is pytest-asserted; the driver
    gates the end-to-end result."""
    import shutil
    import tempfile

    from pymhealth_ray.sources.io import (read_zonemapped_point,
                                          write_zonemapped)

    zdir = os.path.join(tempfile.gettempdir(), "pymhealth_ray_fixtures",
                        f"zonemap_bloom_{os.path.basename(sf_dir)}_v1")
    if not os.path.exists(os.path.join(zdir, "_zonemap.json")):
        with _build_lock(zdir):
            if not os.path.exists(os.path.join(zdir, "_zonemap.json")):
                shutil.rmtree(zdir, ignore_errors=True)
                ds = _events(sf_dir, ["event_id", "user_id", "ts",
                                      "value"])
                write_zonemapped(ds, zdir, "ts_us", num_files=32,
                                 bloom_cols=["user_id"])

    pruned, _, _ = read_zonemapped_point(
        zdir, "user_id", 7,
        columns=["event_id", "user_id", "ts_us", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "val_c")
        return b.select(["event_id", "user_id", "ts_us", "val_c"])

    return pruned.map_batches(prep, batch_format="pyarrow")


def q_events_upsert_merge(sf_dir: str):
    """Copy-on-write MERGE into a zonemapped layout (the Iceberg/Delta
    upsert shape): a correction batch (value bump for every 97th event)
    plus an insert batch (a derived copy for one user cohort) folds into
    the time-partitioned layout REWRITING ONLY THE TOUCHED FILES
    (io.upsert_zonemapped — replacements land in the file holding their
    old version because event-time is immutable per key). The driver
    gates the post-merge table; partial-rewrite behavior is
    pytest-asserted. The layout is rebuilt fresh per run (the op mutates
    it — caching would make the query non-idempotent)."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq_mod

    from pymhealth_ray.sources.io import upsert_zonemapped, write_zonemapped

    zdir = os.path.join(tempfile.gettempdir(), "pymhealth_ray_out",
                        f"upsert_merge_{os.path.basename(sf_dir)}")
    with _build_lock(zdir):
        shutil.rmtree(zdir, ignore_errors=True)
        ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])

        def prep(b: pa.Table) -> pa.Table:
            b = _cents(b, "value", "val_c")
            return b.select(["event_id", "user_id", "ts_us", "val_c"])

        base = ds.map_batches(prep, batch_format="pyarrow")
        write_zonemapped(base, zdir, "ts_us", num_files=32)

        # driver-sized correction+insert batch, derived deterministically
        def delta_of(b: pa.Table) -> pa.Table:
            eid = b["event_id"].to_numpy(zero_copy_only=False)
            uid = b["user_id"].to_numpy(zero_copy_only=False)
            upd = b.filter(pa.array(eid % 97 == 0))
            upd = pa.table({
                "event_id": upd["event_id"],
                "user_id": upd["user_id"],
                "ts_us": upd["ts_us"],
                "val_c": pc.add(upd["val_c"], 100),
            })
            ins = b.filter(pa.array(uid % 37 == 5))
            ins = pa.table({
                "event_id": pc.add(ins["event_id"], 10_000_000),
                "user_id": ins["user_id"],
                "ts_us": ins["ts_us"],
                "val_c": pc.multiply(ins["val_c"], 2),
            })
            return pa.concat_tables([upd, ins])

        delta = pa.concat_tables(
            ray.get(base.map_batches(delta_of, batch_format="pyarrow",
                                     batch_size=None).to_arrow_refs()))
        upsert_zonemapped(zdir, delta.combine_chunks(), "event_id",
                          "ts_us")
        # read through the CURRENT manifest (MVCC keeps the pre-merge
        # files on disk for time travel — a raw listdir would double-read)
        from pymhealth_ray.sources.io import zonemap_manifest

        merged = pa.concat_tables([
            pq_mod.read_table(os.path.join(zdir, m["file"]))
            for m in zonemap_manifest(zdir)])
    return merged.select(["event_id", "ts_us", "val_c"])


def q_events_time_travel(sf_dir: str):
    """MVCC TIME TRAVEL: after a copy-on-write MERGE mutates the
    zonemapped layout, reading at pinned ``version=0``
    (io.zonemap_manifest — mutations archive the pre-edit manifest and
    keep its data files until vacuum) returns the table EXACTLY as
    originally written. The oracle is simply the unmodified base table —
    if any merged file leaked into the snapshot the hash breaks."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq_mod

    from pymhealth_ray.sources.io import (upsert_zonemapped,
                                          write_zonemapped,
                                          zonemap_manifest)

    zdir = os.path.join(tempfile.gettempdir(), "pymhealth_ray_out",
                        f"time_travel_{os.path.basename(sf_dir)}")
    with _build_lock(zdir):
        shutil.rmtree(zdir, ignore_errors=True)
        ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])

        def prep(b: pa.Table) -> pa.Table:
            b = _cents(b, "value", "val_c")
            return b.select(["event_id", "user_id", "ts_us", "val_c"])

        base = ds.map_batches(prep, batch_format="pyarrow")
        write_zonemapped(base, zdir, "ts_us", num_files=16)

        def delta_of(b: pa.Table) -> pa.Table:
            eid = b["event_id"].to_numpy(zero_copy_only=False)
            upd = b.filter(pa.array(eid % 53 == 0))
            return pa.table({
                "event_id": upd["event_id"],
                "user_id": upd["user_id"],
                "ts_us": upd["ts_us"],
                "val_c": pc.add(upd["val_c"], 999),
            })

        delta = pa.concat_tables(
            ray.get(base.map_batches(delta_of, batch_format="pyarrow",
                                     batch_size=None).to_arrow_refs()))
        upsert_zonemapped(zdir, delta.combine_chunks(), "event_id",
                          "ts_us")
        snap = pa.concat_tables([
            pq_mod.read_table(os.path.join(zdir, m["file"]))
            for m in zonemap_manifest(zdir, version=0)])
    return snap.select(["event_id", "ts_us", "val_c"])


SQL_EVENTS_TIME_TRAVEL = """
SELECT event_id, epoch_us(ts) AS ts_us,
       CAST(round(value * 100) AS BIGINT) AS val_c
FROM events
"""


SQL_EVENTS_UPSERT_MERGE = """
WITH base AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                     CAST(round(value * 100) AS BIGINT) AS val_c
              FROM events),
delta AS (
  SELECT event_id, ts_us, val_c + 100 AS val_c FROM base
  WHERE event_id % 97 = 0
  UNION ALL
  SELECT event_id + 10000000 AS event_id, ts_us, val_c * 2 AS val_c
  FROM base WHERE user_id % 37 = 5),
merged AS (
  SELECT event_id, ts_us, val_c FROM base
  WHERE event_id NOT IN (SELECT event_id FROM delta)
  UNION ALL SELECT event_id, ts_us, val_c FROM delta)
SELECT event_id, ts_us, val_c FROM merged
"""


SQL_EVENTS_BLOOM_POINT = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       CAST(round(value * 100) AS BIGINT) AS val_c
FROM events WHERE user_id = 7
"""


SQL_EVENTS_ZONEMAP_RANGE = """
WITH e AS (SELECT event_type, value, epoch_us(ts) AS ts_us FROM events),
b AS (SELECT min(ts_us) AS mn, max(ts_us) AS mx FROM e)
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM e, b
WHERE ts_us >= mn + ((mx - mn) * 25) // 100
  AND ts_us <= mn + ((mx - mn) * 75) // 100
GROUP BY event_type
"""


_RECALL_K, _RECALL_NPROBE, _RECALL_NCENT, _RECALL_NQ = 10, 2, 8, 50


def q_embed_ivf_recall(sf_dir: str):
    """ANN quality evaluation as a first-class pipeline: recall@10 of the
    nprobe=2 IVF probe against the exact brute-force top-10, per query —
    the measurement loop a 100 TB embedding store runs before trusting an
    approximate index (probes read only nprobe partitions; the exact side
    streams the corpus once)."""
    import pyarrow.parquet as pq

    ds = read_table(f"{sf_dir}/embeddings.parquet",
                    columns=["vec_id", "embedding"])
    index_dir = f"/tmp/pymhealth_ray_ivf/{os.path.basename(os.path.normpath(sf_dir))}"
    with _build_lock(index_dir):
        ann.build_ivf_index(ds, index_dir, n_centroids=_RECALL_NCENT)

    full = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    queries = full.filter(pc.less(full["vec_id"], _RECALL_NQ))
    approx = ann.knn_ivf_partitioned(index_dir, queries, k=_RECALL_K,
                                     nprobe=_RECALL_NPROBE)
    exact = ann.knn_bruteforce(ds, queries, k=_RECALL_K)

    def to_sets(tbl):
        out = {}
        for q, n in zip(tbl["query_id"].to_pylist(),
                        tbl["neighbor_id"].to_pylist()):
            out.setdefault(q, set()).add(n)
        return out

    a, e = to_sets(approx), to_sets(exact)
    qids = sorted(e)
    hits = np.array([len(a.get(q, set()) & e[q]) for q in qids],
                    dtype=np.int64)
    return ray.data.from_arrow(pa.table({
        "query_id": pa.array(qids, type=pa.int64()),
        "n_hit": pa.array(hits),
        "recall": pa.array(hits / np.float64(_RECALL_K)),
    }))


def q_embed_quantized_recall(sf_dir: str):
    """Recall@10 cost of int8 per-vector quantization: exact brute-force
    top-10 over the FLOAT corpus vs the same search over the
    quantize→dequantize corpus (stages/ann.quantized_embeddings — the 4x
    storage compression every 100 TB embedding store considers), per
    query. Same measurement loop as embed_ivf_recall."""
    import pyarrow.parquet as pq

    ds = read_table(f"{sf_dir}/embeddings.parquet",
                    columns=["vec_id", "embedding"])
    full = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    queries = full.filter(pc.less(full["vec_id"], _RECALL_NQ))
    exact = ann.knn_bruteforce(ds, queries, k=_RECALL_K)
    quant = ann.knn_bruteforce(ann.quantized_embeddings(ds), queries,
                               k=_RECALL_K)

    def to_sets(tbl):
        out = {}
        for q, n in zip(tbl["query_id"].to_pylist(),
                        tbl["neighbor_id"].to_pylist()):
            out.setdefault(q, set()).add(n)
        return out

    a, e = to_sets(quant), to_sets(exact)
    qids = sorted(e)
    hits = np.array([len(a.get(q, set()) & e[q]) for q in qids],
                    dtype=np.int64)
    return ray.data.from_arrow(pa.table({
        "query_id": pa.array(qids, type=pa.int64()),
        "n_hit": pa.array(hits),
        "recall": pa.array(hits / np.float64(_RECALL_K)),
    }))


def _quant_recall_expected(sf_dir: str):
    """Single-process replication: full-matrix float and dequantized-int8
    top-k with knn_bruteforce's exact tie rule (lexsort on (id, -cos))."""
    import pandas as pd
    import pyarrow.parquet as pq_mod

    from pymhealth_ray.stages.ann import _unit, quantize_dequantize_int8

    tbl = pq_mod.read_table(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    ids = tbl["vec_id"].to_pandas().to_numpy().astype(np.int64)
    emb = np.stack(tbl["embedding"].to_pandas().to_numpy()).astype(np.float64)
    qsel = ids < _RECALL_NQ
    q_ids, q_mat = ids[qsel], emb[qsel]

    def topk_sets(corpus):
        m = _unit(corpus)
        qs = _unit(q_mat)
        sims = m @ qs.T  # (n, nq)
        out = {}
        for j, qid in enumerate(q_ids):
            s = sims[:, j].copy()
            mask = ids != qid  # exclude self
            cand_ids, cand_s = ids[mask], s[mask]
            order = np.lexsort((cand_ids, -cand_s))[:_RECALL_K]
            out[int(qid)] = set(cand_ids[order].tolist())
        return out

    e = topk_sets(emb)
    a = topk_sets(quantize_dequantize_int8(emb))
    qids = sorted(e)
    hits = np.array([len(a.get(q, set()) & e[q]) for q in qids],
                    dtype=np.int64)
    return pd.DataFrame({
        "query_id": np.array(qids, dtype=np.int64),
        "n_hit": hits,
        "recall": hits / np.float64(_RECALL_K),
    })


def _quant_recall_oracle(sf_dir: str) -> str:
    import pyarrow.parquet as pq_mod

    name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/pymhealth_ray_fixtures/quant_recall_{name}_v1"
    out = os.path.join(out_dir, "expected.parquet")
    if not os.path.exists(out):
        os.makedirs(out_dir, exist_ok=True)
        exp = _quant_recall_expected(sf_dir)
        tmp = out + ".tmp"
        pq_mod.write_table(pa.Table.from_pandas(exp, preserve_index=False),
                           tmp)
        os.replace(tmp, out)
    return f"SELECT * FROM read_parquet('{out}')"


def _ivf_recall_oracle(sf_dir: str) -> str:
    """Single-process numpy replication of the IVF-vs-exact recall —
    independent of Ray partitioning/batching: same seeded centroid
    training (pure-numpy kernel), full-matrix assignment, per-query
    candidate sets from the top-nprobe centroids, tuple-order top-k
    matching each engine path's tie rule."""
    import pyarrow.parquet as pq_mod

    name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/pymhealth_ray_fixtures/ivf_recall_{name}_v1"
    out = os.path.join(out_dir, "expected.parquet")
    if not os.path.exists(out):
        os.makedirs(out_dir, exist_ok=True)
        from pymhealth_ray.stages.ann import _unit, train_ivf_centroids

        tbl = pq_mod.read_table(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
        ids = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
        emb = tbl["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        X = np.stack([np.asarray(r, dtype=np.float64)
                      for r in emb.to_pylist()])
        Xu = _unit(X)
        cent = train_ivf_centroids(X[:2048], _RECALL_NCENT)
        assign = np.argmax(Xu @ cent.T, axis=1)
        rows = []
        for qid in ids[ids < _RECALL_NQ]:
            qi = int(np.flatnonzero(ids == qid)[0])
            sims = Xu @ Xu[qi]
            mask = ids != qid
            # exact top-k: (-cosine, +neighbor_id) — brute-force tie rule
            mi = np.flatnonzero(mask)
            order = np.lexsort((ids[mi], -sims[mi]))[:_RECALL_K]
            exact = set(ids[mi][order].tolist())
            probes = np.argsort(-(Xu[qi] @ cent.T))[:_RECALL_NPROBE]
            cmask = mask & np.isin(assign, probes)
            ci = np.flatnonzero(cmask)
            # ivf top-k: largest (cosine, neighbor_id) tuples — heap rule
            order2 = np.lexsort((-ids[ci], -sims[ci]))[:_RECALL_K]
            approx = set(ids[ci][order2].tolist())
            rows.append((int(qid), len(approx & exact)))
        qs = pa.array([r[0] for r in rows], type=pa.int64())
        hs = np.array([r[1] for r in rows], dtype=np.int64)
        exp = pa.table({"query_id": qs, "n_hit": pa.array(hs),
                        "recall": pa.array(hs / np.float64(_RECALL_K))})
        tmp = out + ".tmp"
        pq_mod.write_table(exp, tmp)
        os.replace(tmp, out)
    return f"SELECT * FROM read_parquet('{out}')"


def q_events_hourly_distinct(sf_dir: str):
    """Time-windowed exact cardinality: distinct active users per hour
    bucket (stages/aggregate.grouped_distinct_count — distinct (hour,user)
    pairs co-locate by pair hash, per-bucket unique is globally exact, no
    driver value sets)."""
    from pymhealth_ray.stages.aggregate import grouped_distinct_count

    ds = _events(sf_dir, ["user_id", "ts"])

    def hourify(b: pa.Table) -> pa.Table:
        ts = b["ts_us"].to_numpy(zero_copy_only=False)
        return pa.table({"hour": pa.array(ts // 3_600_000_000),
                         "user_id": b["user_id"]})

    return grouped_distinct_count(
        ds.map_batches(hourify, batch_format="pyarrow"),
        "hour", "user_id", out="n_users")


SQL_EVENTS_HOURLY_DISTINCT = """
SELECT epoch_us(ts) // 3600000000 AS hour,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM events GROUP BY 1
"""


def q_events_stickiness(sf_dir: str):
    """Engagement STICKINESS per user: distinct active hours / distinct
    active days (the DAU/MAU shape at user grain) — two
    grouped_distinct_count passes co-partitioned by pair hash, joined on
    the user (one co-partitioned equi-join; both sides are user-sized)."""
    from pymhealth_ray.stages.aggregate import grouped_distinct_count
    from pymhealth_ray.stages.join import equi_join

    HOUR = 3_600_000_000
    DAY = 24 * HOUR
    ds = _events(sf_dir, ["user_id", "ts"]).materialize()

    def bucketize(div: int, name: str):
        def fn(b: pa.Table) -> pa.Table:
            ts = b["ts_us"].to_numpy(zero_copy_only=False)
            return pa.table({"user_id": b["user_id"],
                             name: pa.array(ts // div)})
        return fn

    hours = grouped_distinct_count(
        ds.map_batches(bucketize(HOUR, "hour"), batch_format="pyarrow"),
        "user_id", "hour", out="n_hours")
    days = grouped_distinct_count(
        ds.map_batches(bucketize(DAY, "day"), batch_format="pyarrow"),
        "user_id", "day", out="n_days")
    joined = equi_join(hours, days, on="user_id", num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        nh = b["n_hours"].to_numpy(zero_copy_only=False)
        nd = b["n_days"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b["user_id"],
            "n_hours": pa.array(nh.astype(np.int64)),
            "n_days": pa.array(nd.astype(np.int64)),
            "stickiness": pa.array(nh / nd),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_STICKINESS = """
SELECT user_id,
  CAST(count(DISTINCT epoch_us(ts) // 3600000000) AS BIGINT) AS n_hours,
  CAST(count(DISTINCT epoch_us(ts) // 86400000000) AS BIGINT) AS n_days,
  CAST(count(DISTINCT epoch_us(ts) // 3600000000) AS DOUBLE)
    / count(DISTINCT epoch_us(ts) // 86400000000) AS stickiness
FROM events GROUP BY user_id
"""


def q_supplier_part_degree(sf_dir: str):
    """Bipartite degree histogram of the supplier→part graph: exact
    distinct part count per supplier, then the degree histogram — the
    graph-shape profile (two grouped_distinct_count/keyed_sum levels)."""
    from pymhealth_ray.stages.aggregate import (grouped_distinct_count,
                                                keyed_sum)

    li = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_suppkey", "l_partkey"])
    deg = grouped_distinct_count(li, "l_suppkey", "l_partkey",
                                 out="degree")

    def hist_partial(b: pa.Table) -> pa.Table:
        d = b["degree"].to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(d, return_counts=True)
        return pa.table({"degree": pa.array(vals),
                         "n_suppliers": pa.array(cnts.astype(np.int64))})

    return keyed_sum(deg.map_batches(hist_partial, batch_format="pyarrow",
                                     batch_size=None),
                     "degree", ["n_suppliers"], num_buckets=8,
                     precombine_rows=None)


SQL_SUPPLIER_PART_DEGREE = """
WITH d AS (SELECT l_suppkey, count(DISTINCT l_partkey)::BIGINT AS degree
           FROM lineitem GROUP BY l_suppkey)
SELECT degree, count(*)::BIGINT AS n_suppliers FROM d GROUP BY degree
"""


def q_seq_trigram_nll(sf_dir: str):
    """Trigram LM scoring through the JOIN plan (stages/lm.trigram_nll):
    counts attach via co-partitioned exchanges instead of a broadcast —
    the path a vocab where |V|³ ≫ worker memory forces. Summation order
    is pinned (window-start reduceat), so the result is bit-identical to
    the single-process oracle."""
    from pymhealth_ray.stages.lm import trigram_nll

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "tokens"])
    return trigram_nll(ds, num_buckets=NB)


def _trigram_nll_expected(src: pa.Table):
    """Single-process replication: corpus trigram/context counts, per-row
    start-order reduceat — the same float expression tree as the engine."""
    import pandas as pd

    from collections import Counter

    docs = src["doc_id"].to_pylist()
    tss = src["ts_ns"].to_pylist()
    toks = src["tokens"].to_pylist()
    c3: Counter = Counter()
    c2: Counter = Counter()
    for t in toks:
        for i in range(len(t) - 2):
            c3[(t[i], t[i + 1], t[i + 2])] += 1
            c2[(t[i], t[i + 1])] += 1
    out = {"doc_id": [], "ts_ns": [], "n_trigrams": [], "nll": []}
    for d, ts, t in zip(docs, tss, toks):
        n_tri = max(len(t) - 2, 0)
        out["doc_id"].append(d)
        out["ts_ns"].append(ts)
        out["n_trigrams"].append(n_tri)
        if n_tri == 0:
            out["nll"].append(None)
            continue
        contrib = np.array([
            np.log(float(c3[(t[i], t[i + 1], t[i + 2])]))
            - np.log(float(c2[(t[i], t[i + 1])]))
            for i in range(n_tri)])
        out["nll"].append(-np.add.reduceat(contrib, [0])[0] / n_tri)
    return pd.DataFrame(out)


def sql_seq_trigram_nll(path: str) -> str:
    return _materialized_oracle(path, "trigram_nll_v1",
                                _trigram_nll_expected)


def _seed_near_dups(b: pa.Table) -> pa.Table:
    """Append a perturbed copy of every 97th-hashed row (first token
    flipped, ts_ns+1, doc_id suffixed): the synthetic corpus has no
    natural near-dups, and a dedup demo over provably-empty ground truth
    proves nothing. Map-local and deterministic — the oracle replicates
    the same derivation."""
    ts = b["ts_ns"].to_numpy(zero_copy_only=False)
    pick = np.flatnonzero(ts % 97 == 0)
    if not len(pick):
        return b
    take = pa.array(pick)
    toks = b["tokens"].combine_chunks() if isinstance(
        b["tokens"], pa.ChunkedArray) else b["tokens"]
    copies = []
    for i in pick.tolist():
        t = list(toks[i].as_py())
        if t:
            t[0] = (t[0] + 1) % 2048
        copies.append(t)
    dup = pa.table({
        "doc_id": pa.array([f"{v}~dup" for v in
                            b["doc_id"].take(take).to_pylist()]),
        "ts_ns": pa.array(ts[pick] + 1),
        "tokens": pa.array(copies, type=toks.type),
    })
    return pa.concat_tables([b.select(["doc_id", "ts_ns", "tokens"]),
                             dup]).combine_chunks()


_TOKMH_CACHE: dict = {}


def _cached_token_minhasher():
    from pymhealth_ray.stages.dedup import TokenMinHasher

    h = _TOKMH_CACHE.get("h")
    if h is None:
        h = _TOKMH_CACHE["h"] = TokenMinHasher(id_col="rid")
    return h


def q_seq_minhash_dupes(sf_dir: str):
    """Near-duplicate SEQUENCES via token-shingle MinHash+LSH — the eighth
    dedup modality: surrogate int ids from the deterministic global rank
    (stages/rank.partitioned_sort_rank over (ts_ns, doc_id)), signatures
    over packed-3-gram shingles (stages/dedup.TokenMinHasher), then the
    existing banded-LSH pair machinery unchanged (sig_ds reuse). Returns
    (id_a, id_b, est_jaccard) in rank space."""
    import os as _os

    from pymhealth_ray.stages.dedup import minhash_lsh_dupes
    from pymhealth_ray.stages.rank import partitioned_sort_rank

    # the seeded+ranked table is a PURE function of the fixture — cache it
    # as an ingest artifact (surrogate-id assignment happens once at
    # ingest, not per analysis run)
    name = _os.path.basename(_os.path.normpath(sf_dir))
    cache = f"/tmp/pymhealth_ray_fixtures/minhash_ranked_{name}_v1"
    marker = _os.path.join(cache, "_OK")
    if not _os.path.exists(marker):
        with _build_lock(cache):
            if not _os.path.exists(marker):
                ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "tokens"])

                def add_one(b: pa.Table) -> pa.Table:
                    b = _seed_near_dups(b)
                    return b.append_column("one", pa.array(
                        np.zeros(b.num_rows, dtype=np.int8)))

                ranked_ds = partitioned_sort_rank(
                    ds.map_batches(add_one, batch_format="pyarrow"),
                    "one", "ts_ns", "doc_id", num_bins=256,
                    rank_name="rid")
                ranked_ds.map_batches(
                    lambda b: b.select(["rid", "tokens"]),
                    batch_format="pyarrow").write_parquet(cache)
                with open(marker + ".tmp", "w") as f:
                    f.write("ok")
                _os.replace(marker + ".tmp", marker)
    ranked = read_table(cache, columns=["rid", "tokens"])

    def sig(b: pa.Table) -> pa.Table:
        return _cached_token_minhasher()(b)

    # batch_size=None: per-BLOCK batches — the 1024-row default was
    # 2.5x slower (per-batch fixed numpy setup dominates at small batches)
    sigs = ranked.map_batches(sig, batch_format="pyarrow",
                              batch_size=None).materialize()
    return minhash_lsh_dupes(sigs, id_col="rid", jaccard_threshold=0.7,
                             sig_ds=sigs)


def _seq_minhash_expected(src: pa.Table):
    """Single-process LSH replication (no bucket caps apply at gate
    scale): same rank assignment, same TokenMinHasher family, same band
    keys; pairs sharing ≥1 band kept when the signature Jaccard estimate
    clears the threshold."""
    import pandas as pd

    from pymhealth_ray.stages.dedup import _band_keys_vec

    seeded = _seed_near_dups(src.select(["doc_id", "ts_ns", "tokens"]))
    df = pd.DataFrame({
        "doc_id": seeded["doc_id"].to_pylist(),
        "ts_ns": seeded["ts_ns"].to_pylist(),
        "tokens": seeded["tokens"].to_pylist(),
    }).sort_values(["ts_ns", "doc_id"]).reset_index(drop=True)
    h = _cached_token_minhasher()
    tbl = pa.table({"rid": pa.array(np.arange(len(df), dtype=np.int64)),
                    "tokens": pa.array(df.tokens.tolist(),
                                       type=pa.list_(pa.int64()))})
    sig_tbl = h(tbl)
    sigs = sig_tbl["minhash"].combine_chunks().values.to_numpy(
        zero_copy_only=False).reshape(len(df), -1).astype(np.uint64)
    bands, rpb = 16, 4
    cand = set()
    for b in range(bands):
        keys = _band_keys_vec(sigs, b, rpb)
        buckets: dict = {}
        for i, k2 in enumerate(keys.tolist()):
            buckets.setdefault(k2, []).append(i)
        for members in buckets.values():
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    cand.add((members[x], members[y]))
    rows = []
    for a, b2 in sorted(cand):
        est = float((sigs[a] == sigs[b2]).mean())
        if est >= 0.7:
            rows.append((a, b2, est))
    return pd.DataFrame({
        "id_a": [r[0] for r in rows],
        "id_b": [r[1] for r in rows],
        "est_jaccard": [r[2] for r in rows]})


def sql_seq_minhash_dupes(path: str) -> str:
    return _materialized_oracle(path, "seq_minhash_v4",  # v4: uint32 lanes
                                _seq_minhash_expected)


COVERAGE_KS = (100, 500, 1000, 2000)


def q_seq_vocab_coverage(sf_dir: str):
    """Vocabulary coverage curve: corpus token mass covered by the top-K
    tokens, K ∈ {100,500,1000,2000} — the tokenizer-budget planning
    companion to the Zipf spectrum. One keyed_sum exchange; the readout is
    vocab-bounded (the same bound that lets LM tables broadcast)."""
    from pymhealth_ray.stages.aggregate import keyed_sum

    ds, _ = _seq_ds(sf_dir, ["tokens"])

    def partial(b: pa.Table) -> pa.Table:
        col = b["tokens"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.int64)
        vals, cnts = np.unique(flat, return_counts=True)
        return pa.table({"tok": pa.array(vals),
                         "c": pa.array(cnts.astype(np.int64))})

    counts = keyed_sum(ds.map_batches(partial, batch_format="pyarrow",
                                      batch_size=None), "tok", ["c"],
                       num_buckets=64)

    def const_g(b: pa.Table) -> pa.Table:
        return b.append_column("__g", pa.array(
            np.zeros(b.num_rows, dtype=np.int8)))

    def finish(tbl: pa.Table) -> pa.Table:
        tok = tbl["tok"].to_numpy(zero_copy_only=False)
        c = tbl["c"].to_numpy(zero_copy_only=False)
        order = np.lexsort((tok, -c))
        cs = c[order]
        cum = np.cumsum(cs)
        total = int(cum[-1]) if len(cum) else 0
        ks = np.array(COVERAGE_KS, dtype=np.int64)
        idx = np.minimum(ks, len(cs)) - 1
        cum_k = np.where(idx >= 0, cum[np.maximum(idx, 0)], 0).astype(np.int64)
        return pa.table({
            "k": pa.array(ks),
            "cum_tokens": pa.array(cum_k),
            "total_tokens": pa.array(np.full(len(ks), total, dtype=np.int64)),
            "coverage": pa.array(cum_k.astype(np.float64) / total),
        })

    return counts.map_batches(const_g, batch_format="pyarrow",
                              batch_size=None).groupby("__g").map_groups(
        lambda t: finish(t.drop_columns(["__g"])), batch_format="pyarrow")


def sql_seq_vocab_coverage(path: str) -> str:
    ks = ", ".join(str(k) for k in COVERAGE_KS)
    return f"""
WITH c AS (SELECT tok, count(*)::BIGINT AS c
           FROM (SELECT unnest(tokens) AS tok
                 FROM read_parquet('{path}/part-*.parquet')) GROUP BY tok),
r AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rn FROM c),
t AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM c),
ks AS (SELECT unnest([{ks}]) AS k)
SELECT k, CAST((SELECT coalesce(sum(c), 0) FROM r WHERE rn <= k) AS BIGINT) AS cum_tokens,
       total AS total_tokens,
       CAST(CAST((SELECT coalesce(sum(c), 0) FROM r WHERE rn <= k) AS BIGINT) AS DOUBLE)
           / total AS coverage
FROM ks, t
"""


def q_orders_daily_ma(sf_dir: str):
    """Daily revenue time series with a trailing 7-day moving average:
    high-cardinality day rollup via keyed_sum, then the MA over the
    |days|-bounded series in one merge group (exact int sums; MA is one
    int/int division per day — bit-exact vs the SQL window oracle)."""
    from pymhealth_ray.stages.aggregate import keyed_sum

    ds = read_table(f"{sf_dir}/orders.parquet",
                    columns=["o_orderdate", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        day = (b["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False) // 86_400_000_000)
        b = _cents(b, "o_totalprice", "rev_c")
        return pa.table({"day": pa.array(day), "rev_c": b["rev_c"]})

    daily = keyed_sum(ds.map_batches(prep, batch_format="pyarrow"),
                      "day", ["rev_c"], num_buckets=64,
                      precombine_rows=None)

    def const_g(b: pa.Table) -> pa.Table:
        return b.append_column("__g", pa.array(
            np.zeros(b.num_rows, dtype=np.int8)))

    def finish(tbl: pa.Table) -> pa.Table:
        d = tbl["day"].to_numpy(zero_copy_only=False)
        r = tbl["rev_c"].to_numpy(zero_copy_only=False)
        order = np.argsort(d)
        d, r = d[order], r[order]
        # trailing 7-ROW window over the dense daily series (the fixture's
        # order dates are contiguous days; SQL oracle uses the same ROWS
        # frame so semantics match even if gaps appeared)
        cum = np.concatenate(([0], np.cumsum(r)))
        lo = np.maximum(np.arange(len(r)) - 6, 0)
        wsum = cum[np.arange(1, len(r) + 1)] - cum[lo]
        wn = np.arange(1, len(r) + 1) - lo
        return pa.table({
            "day": pa.array(d),
            "revenue_cents": pa.array(r.astype(np.int64)),
            "ma7": pa.array(wsum.astype(np.float64) / wn),
        })

    return daily.map_batches(const_g, batch_format="pyarrow",
                             batch_size=None).groupby("__g").map_groups(
        lambda t: finish(t.drop_columns(["__g"])), batch_format="pyarrow")


SQL_ORDERS_DAILY_MA = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
           FROM orders GROUP BY 1)
SELECT day, revenue_cents,
       CAST(CAST(sum(revenue_cents) OVER (ORDER BY day
                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS DOUBLE)
           / count(*) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS ma7
FROM d
"""


def q_events_props_extract(sf_dir: str):
    """Semi-structured column handling: the events ``props`` JSON string
    is parsed VECTORIZED with one Arrow regex kernel (pc.extract_regex —
    no per-row Python json.loads), the extracted key aggregates per event
    type (exact int sums, int/int mean). The regexp is the cross-engine
    parity choice: DuckDB's json_extract and Python's json module agree
    on these flat payloads, but regex is bit-identical by construction."""
    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["event_type", "props"])

    def extract(b: pa.Table) -> pa.Table:
        props = b["props"]
        if isinstance(props, pa.ChunkedArray):
            props = props.combine_chunks()
        m = pc.extract_regex(props, r'"k":\s*(?P<k>-?\d+)')
        ks = pc.struct_field(m, "k").cast(pa.int64())
        valid = pc.is_valid(ks).to_numpy(zero_copy_only=False)
        kv = ks.fill_null(0).to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": b["event_type"],
            "k": pa.array(kv),
            "has_k": pa.array(valid.astype(np.int64)),
        })

    agg = grouped_stats(ds.map_batches(extract, batch_format="pyarrow"),
                        ["event_type"], sum_cols=["k", "has_k"])

    def finish(b: pa.Table) -> pa.Table:
        ks = b["k_sum"].to_numpy(zero_copy_only=False)
        n = b["has_k_sum"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": b["event_type"],
            "n_with_k": pa.array(n.astype(np.int64)),
            "k_sum": pa.array(ks.astype(np.int64)),
            "k_mean": pa.array(ks.astype(np.float64) / n),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_PROPS_EXTRACT = r"""
WITH e AS (SELECT event_type,
                  TRY_CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k
           FROM events)
SELECT event_type,
       count(k) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS k_sum,
       CAST(CAST(sum(k) AS BIGINT) AS DOUBLE) / count(k) AS k_mean
FROM e GROUP BY event_type
"""


def q_events_sliding_distinct(sf_dir: str):
    """Sliding-window cardinality: distinct users in each trailing 24-hour
    window, hourly steps. Distinct counts don't subtract, so the exact
    plan explodes each distinct (hour, user) fact into the ≤24 windows it
    feeds (bounded fan-out) and reuses grouped_distinct_count — the
    window-end hour is the group, the user the value. Windows are emitted
    only for observed end-hours (SQL oracle mirrors via a self-join over
    hour offsets)."""
    from pymhealth_ray.stages.aggregate import grouped_distinct_count

    ds = _events(sf_dir, ["user_id", "ts"])
    HOUR_US = 3_600_000_000

    def hour_user(b: pa.Table) -> pa.Table:
        ts = b["ts_us"].to_numpy(zero_copy_only=False)
        u = b["user_id"].to_numpy(zero_copy_only=False)
        h = ts // HOUR_US
        du = np.unique(h * np.int64(1 << 22) + u)  # user_id < 2^22 here
        return pa.table({"hour": pa.array(du >> np.int64(22)),
                         "user_id": pa.array(du & np.int64((1 << 22) - 1))})

    facts = ds.map_batches(hour_user, batch_format="pyarrow")

    # observed hours, broadcast (bounded by the time span)
    hours = sorted({r["hour"] for r in
                    facts.groupby("hour").count().take_all()})
    hours_arr = np.array(hours, dtype=np.int64)
    href = ray.put(hours_arr)

    def explode(b: pa.Table) -> pa.Table:
        hs = ray.get(href)
        h = b["hour"].to_numpy(zero_copy_only=False)
        u = b["user_id"].to_numpy(zero_copy_only=False)
        # window end-hours: observed hours in [h, h+23]
        lo = np.searchsorted(hs, h, side="left")
        hi = np.searchsorted(hs, h + 24, side="left")
        n_w = hi - lo
        rep_u = np.repeat(u, n_w)
        flat = (np.repeat(lo, n_w)
                + (np.arange(int(n_w.sum()), dtype=np.int64)
                   - np.repeat(np.concatenate(([0], np.cumsum(n_w)))[:-1],
                               n_w)))
        return pa.table({"end_hour": pa.array(hs[flat]),
                         "user_id": pa.array(rep_u)})

    exploded = facts.map_batches(explode, batch_format="pyarrow")
    return grouped_distinct_count(exploded, "end_hour", "user_id",
                                  out="n_users_24h")


SQL_EVENTS_SLIDING_DISTINCT = """
WITH f AS (SELECT DISTINCT epoch_us(ts) // 3600000000 AS hour, user_id FROM events),
h AS (SELECT DISTINCT hour FROM f)
SELECT h.hour AS end_hour, count(DISTINCT f.user_id)::BIGINT AS n_users_24h
FROM h JOIN f ON f.hour BETWEEN h.hour - 23 AND h.hour
GROUP BY h.hour
"""


def _synth_wav(doc_id: int) -> bytes:
    """Deterministic REAL RIFF/PCM WAV payload per doc (16-bit mono sine +
    seeded noise, 2000 samples @8 kHz) — a genuine encoder (stdlib wave)
    so the decode path exercises a real codec, not a stub."""
    import io
    import wave

    rng = np.random.default_rng(doc_id + 7)
    t = np.arange(2000, dtype=np.float64)
    freq = 100.0 + (doc_id % 40) * 25.0
    sig = 0.5 * np.sin(2 * np.pi * freq * t / 8000.0)
    sig = sig + 0.1 * rng.standard_normal(2000)
    pcm = np.clip(sig * 32767.0, -32768, 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def _docs_wav_table(b: pa.Table) -> pa.Table:
    ids = b["doc_id"].to_numpy(zero_copy_only=False)
    return pa.table({
        "doc_id": b["doc_id"],
        "payload": pa.array([_synth_wav(int(i)) for i in ids],
                            type=pa.binary()),
    })


def q_docs_audio_real(sf_dir: str):
    """REAL-codec audio pipeline under the driver gate: per-doc WAV bytes
    (genuinely RIFF/PCM-encoded) → actor-pool stdlib-wave decode
    (stages/multimodal.AudioFrameSampler, decoder='real') → strided frame
    features → per-doc summary. Decode is payload-deterministic, so the
    oracle replays the same class single-process — the real-codec analog
    of docs_media_decode's fake-decoder gate."""
    from pymhealth_ray.stages.multimodal import sample_audio_frames

    docs = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    media = docs.map_batches(_docs_wav_table, batch_format="pyarrow")
    dec = sample_audio_frames(media, decoder="real")

    def finish(b: pa.Table) -> pa.Table:
        fv = b["frame_feats"]
        if isinstance(fv, pa.ChunkedArray):
            fv = fv.combine_chunks()
        mat = np.asarray(fv.values.to_numpy(zero_copy_only=False),
                         dtype=np.float64).reshape(b.num_rows, -1)
        return pa.table({
            "doc_id": b["doc_id"],
            "frame_norm": pa.array(np.round(np.linalg.norm(mat, axis=1), 6)),
            "frame_mean": pa.array(np.round(mat.mean(axis=1), 6)),
        })

    return dec.map_batches(finish, batch_format="pyarrow")


def _audio_real_expected(df):
    """Single-process replay of the real WAV decode."""
    import pandas as pd

    from pymhealth_ray.stages.multimodal import AudioFrameSampler

    tbl = pa.table({
        "doc_id": pa.array(df["doc_id"].tolist(), type=pa.int64()),
    })
    media = _docs_wav_table(tbl)
    out = AudioFrameSampler(decoder="real")(media)
    fv = out["frame_feats"]
    if isinstance(fv, pa.ChunkedArray):
        fv = fv.combine_chunks()
    mat = np.asarray(fv.values.to_numpy(zero_copy_only=False),
                     dtype=np.float64).reshape(out.num_rows, -1)
    return pd.DataFrame({
        "doc_id": df["doc_id"].tolist(),
        "frame_norm": np.round(np.linalg.norm(mat, axis=1), 6),
        "frame_mean": np.round(mat.mean(axis=1), 6),
    })


def _synth_pnm(doc_id: int) -> tuple:
    """Deterministic binary P5 PNM payload per doc (REAL image container:
    header + raw gray bytes) with its (w, h)."""
    rng = np.random.default_rng(doc_id + 31)
    w = int(16 + (doc_id % 17))
    h = int(16 + (doc_id % 13))
    pix = rng.integers(0, 256, (h, w), dtype=np.uint8)
    header = f"P5\n{w} {h}\n255\n".encode()
    return header + pix.tobytes(), w, h


def _docs_pnm_table(b: pa.Table) -> pa.Table:
    ids = b["doc_id"].to_numpy(zero_copy_only=False)
    payloads, ws, hs = [], [], []
    for i in ids:
        p, w, h = _synth_pnm(int(i))
        payloads.append(p); ws.append(w); hs.append(h)
    return pa.table({
        "doc_id": b["doc_id"],
        "payload": pa.array(payloads, type=pa.binary()),
        "width": pa.array(np.array(ws, dtype=np.int32)),
        "height": pa.array(np.array(hs, dtype=np.int32)),
    })


def q_docs_image_real(sf_dir: str):
    """REAL-codec image pipeline under the driver gate: binary P5 PNM
    payloads (real container: header parse + raw gray plane) →
    actor-pool decode (stages/multimodal.ImageDecoder, decoder='real',
    pure-numpy PNM parser — PIL absent in this container) → 8×8
    block-mean thumbnails → per-doc stats; oracle replays the class
    single-process."""
    from pymhealth_ray.stages.multimodal import decode_images

    docs = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    media = docs.map_batches(_docs_pnm_table, batch_format="pyarrow")
    dec = decode_images(media, decoder="real", thumb=8)

    def finish(b: pa.Table) -> pa.Table:
        tv = b["thumb_vec"]
        if isinstance(tv, pa.ChunkedArray):
            tv = tv.combine_chunks()
        mat = np.asarray(tv.values.to_numpy(zero_copy_only=False),
                         dtype=np.float64).reshape(b.num_rows, -1)
        return pa.table({
            "doc_id": b["doc_id"],
            "pixel_mean": pa.array(np.round(
                b["pixel_mean"].to_numpy(zero_copy_only=False), 6)),
            "thumb_norm": pa.array(np.round(np.linalg.norm(mat, axis=1), 6)),
        })

    return dec.map_batches(finish, batch_format="pyarrow")


def _image_real_expected(df):
    import pandas as pd

    from pymhealth_ray.stages.multimodal import ImageDecoder

    tbl = pa.table({"doc_id": pa.array(df["doc_id"].tolist(),
                                       type=pa.int64())})
    media = _docs_pnm_table(tbl)
    out = ImageDecoder(decoder="real", thumb=8)(media)
    tv = out["thumb_vec"]
    if isinstance(tv, pa.ChunkedArray):
        tv = tv.combine_chunks()
    mat = np.asarray(tv.values.to_numpy(zero_copy_only=False),
                     dtype=np.float64).reshape(out.num_rows, -1)
    return pd.DataFrame({
        "doc_id": df["doc_id"].tolist(),
        "pixel_mean": np.round(
            out["pixel_mean"].to_numpy(zero_copy_only=False), 6),
        "thumb_norm": np.round(np.linalg.norm(mat, axis=1), 6),
    })


def _docs_clip_table(b: pa.Table) -> pa.Table:
    """Deterministic fake clip payloads (size sets the derived frame
    count, contents seed the fake frames)."""
    ids = b["doc_id"].to_numpy(zero_copy_only=False)
    payloads = []
    for i in ids:
        rng = np.random.default_rng(int(i) + 101)
        size = int(512 + (int(i) % 13) * 384)
        payloads.append(rng.integers(0, 256, size, dtype=np.uint8).tobytes())
    return pa.table({
        "media_id": b["doc_id"].cast(pa.int64()),
        "payload": pa.array(payloads, type=pa.binary()),
    })


def q_docs_video_frames(sf_dir: str):
    """Video frame-sampling plumbing under the driver gate: clip payloads
    → actor-pool frame explode (one ROW PER SAMPLED FRAME, keyed
    (media_id, frame_idx) — stages/multimodal.VideoFrameSampler; real
    decode honestly stubbed, PyAV absent) → per-frame thumb norms. The
    explode layout, byte-sized batching and actor signature are the real
    contract a production decoder drops into."""
    from pymhealth_ray.stages.multimodal import sample_video_frames

    docs = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    media = docs.map_batches(_docs_clip_table, batch_format="pyarrow")
    frames = sample_video_frames(media, decoder="fake")

    def finish(b: pa.Table) -> pa.Table:
        fv = b["frame_vec"]
        if isinstance(fv, pa.ChunkedArray):
            fv = fv.combine_chunks()
        mat = np.asarray(fv.values.to_numpy(zero_copy_only=False),
                         dtype=np.float64).reshape(b.num_rows, -1)
        return pa.table({
            "media_id": b["media_id"],
            "frame_idx": b["frame_idx"],
            "frame_norm": pa.array(np.round(np.linalg.norm(mat, axis=1), 6)),
        })

    return frames.map_batches(finish, batch_format="pyarrow")


def _video_frames_expected(df):
    import pandas as pd

    from pymhealth_ray.stages.multimodal import VideoFrameSampler

    tbl = pa.table({"doc_id": pa.array(df["doc_id"].tolist(),
                                       type=pa.int64())})
    media = _docs_clip_table(tbl)
    out = VideoFrameSampler(decoder="fake")(media)
    fv = out["frame_vec"]
    if isinstance(fv, pa.ChunkedArray):
        fv = fv.combine_chunks()
    mat = np.asarray(fv.values.to_numpy(zero_copy_only=False),
                     dtype=np.float64).reshape(out.num_rows, -1)
    return pd.DataFrame({
        "media_id": out["media_id"].to_pylist(),
        "frame_idx": out["frame_idx"].to_pylist(),
        "frame_norm": np.round(np.linalg.norm(mat, axis=1), 6),
    })


SEQ_PREP_KEEP_Q = 0.7      # keep the best 70% by LM score
SEQ_PREP_CALIB_K = 2048    # deterministic calibration-sample size
SEQ_PREP_EVAL_FRAC = 0.1
SEQ_PREP_L = 2048


def _md5_pri60(rids) -> np.ndarray:
    """First 15 md5 hex chars of each rid as int64 — the deterministic
    sample priority (fits int64; same expression on both sides)."""
    return np.array([int(hashlib.md5(f"{r}-cal".encode())
                         .hexdigest()[:15], 16) for r in rids],
                    dtype=np.int64)


def q_seq_prep_pipeline(sf_dir: str):
    """Token-native curation chain — the composed flagship for the
    sequences table: exact payload dedup (md5 of the token ids, first
    (doc_id,ts_ns) wins) → trigram-LM quality filter (broadcast-plan
    trigram_nll trained on the DEDUPED corpus, n_tok riding the score
    as a dependent id column — no join back) → deterministic md5
    train/eval split → per-split concat-then-split example layout
    (distributed scan). Every stage is an already-gated primitive; this
    gate proves they compose hash-exactly. The quality cut is CALIBRATED
    ON A DETERMINISTIC SAMPLE (md5-priority bottom-k → quantile_disc of
    its nll) so the kept fraction is scale-free — fixed absolute
    thresholds drift with corpus size because unsmoothed LM scores grow
    with the context counts."""
    from pymhealth_ray.stages.aggregate import grouped_topk
    from pymhealth_ray.stages.dedup import exact_dedup
    from pymhealth_ray.stages.lm import trigram_nll
    from pymhealth_ray.stages.sample import split_train_eval

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "tokens", "n_tok"])

    def add_key(b: pa.Table) -> pa.Table:
        from pymhealth_ray.stages.dedup import composite_rid, tokens_join_key

        return pa.table({"seq": tokens_join_key(b["tokens"]),
                         "rid": composite_rid(b["doc_id"], b["ts_ns"]),
                         "doc_id": b["doc_id"], "ts_ns": b["ts_ns"],
                         "tokens": b["tokens"],
                         "n_tok": b["n_tok"].cast(pa.int64())})

    winners = exact_dedup(ds.map_batches(add_key, batch_format="pyarrow"),
                          key_col="seq", id_col="rid",
                          carry_cols=["doc_id", "ts_ns", "tokens", "n_tok"])
    survivors = winners.map_batches(
        lambda b: b.select(["doc_id", "ts_ns", "tokens", "n_tok", "rid"]),
        batch_format="pyarrow").materialize()

    scored = trigram_nll(survivors,
                         id_cols=("doc_id", "ts_ns", "n_tok", "rid"),
                         num_buckets=NB)

    def candidates(b: pa.Table) -> pa.Table:
        nt = b["n_trigrams"].to_numpy(zero_copy_only=False)
        nll = b["nll"].to_numpy(zero_copy_only=False)
        ok = (nt >= 1) & ~np.isnan(nll)
        return b.filter(pa.array(ok)).select(
            ["doc_id", "ts_ns", "n_tok", "rid", "nll"])

    cand = scored.map_batches(candidates,
                              batch_format="pyarrow").materialize()

    # threshold calibration: deterministic md5-priority bottom-k sample,
    # quantile_disc over ITS nll (grouped_topk partial pruning — the
    # sample, not the corpus, reaches the driver)
    def pri(b: pa.Table) -> pa.Table:
        p = _md5_pri60(b["rid"].to_pylist())
        b = b.append_column("__pri", pa.array(p))
        return b.append_column("__one", pa.array(
            np.zeros(b.num_rows, dtype=np.int8)))

    samp = grouped_topk(cand.map_batches(pri, batch_format="pyarrow"),
                        ["__one"], "__pri", SEQ_PREP_CALIB_K,
                        descending=False, tie_cols=["rid"], num_buckets=1)
    svals = np.sort(np.concatenate(
        [t["nll"].to_numpy(zero_copy_only=False)
         for t in samp.iter_batches(batch_format="pyarrow")] or
        [np.empty(0)]))
    import math
    thr = (float(svals[max(math.ceil(SEQ_PREP_KEEP_Q * len(svals)) - 1, 0)])
           if len(svals) else float("inf"))

    def keep(b: pa.Table) -> pa.Table:
        nll = b["nll"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(nll <= thr))

    kept = split_train_eval(
        cand.map_batches(keep, batch_format="pyarrow"),
        "rid", eval_fraction=SEQ_PREP_EVAL_FRAC).materialize()

    # ONE partition-aware scan covers both splits (per-split
    # ordered_prefix_sum would pay the whole barrier chain twice)
    from pymhealth_ray.stages.rank import partitioned_prefix_sum

    cum = partitioned_prefix_sum(kept, "split", "n_tok", "ts_ns",
                                 "doc_id", out="cum")

    def layout(b: pa.Table) -> pa.Table:
        c = b["cum"].to_numpy(zero_copy_only=False)
        n = b["n_tok"].to_numpy(zero_copy_only=False)
        prev = c - n
        return pa.table({
            "doc_id": b["doc_id"], "ts_ns": b["ts_ns"],
            "split": b["split"], "n_tok": b["n_tok"],
            "nll": b["nll"],
            "tok_offset": pa.array(prev),
            "first_example": pa.array(prev // SEQ_PREP_L),
        })

    return cum.map_batches(layout, batch_format="pyarrow")


def _seq_prep_expected(src: pa.Table):
    """Single-process replication of the whole chain (dedup → trigram
    counts on survivors → filter → md5 split → per-split cumsum)."""
    import hashlib as _h

    import pandas as pd

    docs = src["doc_id"].to_pylist()
    tss = src["ts_ns"].to_pylist()
    toks = src["tokens"].to_pylist()
    ntoks = src["n_tok"].to_pylist()
    # dedup: first (doc,ts) composite per distinct token payload
    best = {}
    for d, t, tk, nt in zip(docs, tss, toks, ntoks):
        key = ",".join(str(x) for x in tk)
        rid = f"{d}|{t:020d}"
        if key not in best or rid < best[key][0]:
            best[key] = (rid, d, t, tk, int(nt))
    surv = sorted(best.values())
    # trigram counts over survivors
    from collections import Counter
    c3, c2 = Counter(), Counter()
    for _, _, _, tk, _ in surv:
        for i in range(len(tk) - 2):
            c3[(tk[i], tk[i+1], tk[i+2])] += 1
            c2[(tk[i], tk[i+1])] += 1
    cand_rows = []
    for rid, d, t, tk, nt in surv:
        n_tri = max(len(tk) - 2, 0)
        if n_tri < 1:
            continue
        contrib = np.array([
            np.log(float(c3[(tk[i], tk[i+1], tk[i+2])]))
            - np.log(float(c2[(tk[i], tk[i+1])]))
            for i in range(n_tri)])
        nll = -np.add.reduceat(contrib, [0])[0] / n_tri
        cand_rows.append((rid, d, t, nt, nll))
    # calibration: same md5-priority bottom-k, same quantile_disc rule
    import math
    pri = _md5_pri60([r[0] for r in cand_rows])
    order = np.lexsort((np.array([r[0] for r in cand_rows], dtype=object),
                        pri))[:SEQ_PREP_CALIB_K]
    svals = np.sort(np.array([cand_rows[i][4] for i in order]))
    thr = (float(svals[max(math.ceil(SEQ_PREP_KEEP_Q * len(svals)) - 1, 0)])
           if len(svals) else float("inf"))
    rows = []
    for rid, d, t, nt, nll in cand_rows:
        if not nll <= thr:
            continue
        hx = _h.md5(f"{rid}-0".encode()).hexdigest()[:8]
        is_eval = int(hx, 16) < int(SEQ_PREP_EVAL_FRAC * float(1 << 32))
        rows.append((d, t, "eval" if is_eval else "train", nt, nll))
    out = {"doc_id": [], "ts_ns": [], "split": [], "n_tok": [],
           "nll": [], "tok_offset": [], "first_example": []}
    df = pd.DataFrame(rows, columns=["doc_id", "ts_ns", "split",
                                     "n_tok", "nll"])
    for split in ("train", "eval"):
        part = df[df.split == split].sort_values(
            ["ts_ns", "doc_id"]).reset_index(drop=True)
        cum = part.n_tok.cumsum().to_numpy(dtype=np.int64)
        prev = cum - part.n_tok.to_numpy(dtype=np.int64)
        out["doc_id"].extend(part.doc_id.tolist())
        out["ts_ns"].extend(part.ts_ns.tolist())
        out["split"].extend(part.split.tolist())
        out["n_tok"].extend(part.n_tok.astype("int64").tolist())
        out["nll"].extend(part.nll.tolist())
        out["tok_offset"].extend(prev.tolist())
        out["first_example"].extend((prev // SEQ_PREP_L).tolist())
    return pd.DataFrame(out)


def sql_seq_prep_pipeline(path: str) -> str:
    return _materialized_oracle(path, "seq_prep_v2", _seq_prep_expected,
                                columns=("doc_id", "ts_ns", "tokens",
                                         "n_tok"))


def q_events_value_rank(sf_dir: str):
    """Exact global rank / dense_rank / percent_rank over the value column
    (stages/rank.global_rank — broadcast value-histogram CDF, bounded by
    distinct cents values; percent_rank is one int/int IEEE division,
    bit-exact vs SQL)."""
    from pymhealth_ray.stages.rank import global_rank

    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["event_id", "value"])
    out = global_rank(ds, "value", scale=100)
    return out.map_batches(
        lambda b: pa.table({
            "event_id": b["event_id"],
            "rnk": b["rnk"], "drnk": b["drnk"],
            "pct": b["pct"]}),
        batch_format="pyarrow")


SQL_EVENTS_VALUE_RANK = """
WITH e AS (SELECT event_id, CAST(round(value * 100) AS BIGINT) AS vc FROM events)
SELECT event_id,
       rank() OVER (ORDER BY vc) AS rnk,
       dense_rank() OVER (ORDER BY vc) AS drnk,
       CAST(rank() OVER (ORDER BY vc) - 1 AS DOUBLE)
           / (count(*) OVER () - 1) AS pct
FROM e
"""


def q_docs_temperature_sample(sf_dir: str):
    """Multinomial temperature (alpha=0.5) rebalancing across sources
    (stages.sample.temperature_sample): per-source keep rate
    sqrt(n_min/n_s), applied as a deterministic md5 threshold — the
    multilingual-corpus composition control. One bounded count pass + one
    map-only filter; zero exchanges. Bit-exact SQL parity because sqrt and
    float division are IEEE-correctly-rounded on both sides and the
    threshold scale 16^15 is a power of two."""
    from pymhealth_ray.stages.sample import temperature_sample

    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "lang"])
    out = temperature_sample(docs, "lang", "doc_id", alpha=0.5)
    return out.map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"], "lang": b["lang"]}),
        batch_format="pyarrow")


SQL_DOCS_TEMPERATURE_SAMPLE = """
WITH counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang
), mn AS (SELECT min(n) AS n_min FROM counts),
thr AS (
  SELECT c.lang, c.n,
         CASE WHEN c.n = m.n_min THEN NULL
              ELSE lpad(lower(to_hex(CAST(floor(
                     sqrt(CAST(m.n_min AS DOUBLE) / CAST(c.n AS DOUBLE))
                     * 1152921504606846976) AS BIGINT))), 15, '0')
         END AS t
  FROM counts c, mn m)
SELECT d.doc_id, d.lang
FROM documents d JOIN thr ON d.lang = thr.lang
WHERE thr.t IS NULL
   OR substr(md5(CAST(d.doc_id AS VARCHAR) || '-temp'), 1, 15) < thr.t
"""


def q_docs_jaccard_dupes(sf_dir: str):
    """EXACT word-3-shingle Jaccard self-join at tau=0.8
    (stages/setjoin.py — prefix-filtered set-similarity join, the
    verification-grade 9th dedup modality next to MinHash/SimHash
    estimates): slim (shingle,id) exchanges, rarest-first prefixes, pair
    counts reduced per bucket. jaccard is an int/int division — bit-exact
    vs the SQL brute force."""
    from pymhealth_ray.stages.setjoin import similarity_join

    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    return similarity_join(docs, tau=0.8, num_buckets=NB)


SQL_DOCS_JACCARD_DUPES = """
WITH words AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
tok AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
  FROM words, UNNEST(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3),
size_ AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS m FROM tok GROUP BY doc_id),
inter AS (SELECT a.doc_id ia, b.doc_id ib, CAST(count(*) AS BIGINT) c
  FROM tok a JOIN tok b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT ia AS id_a, ib AS id_b, c AS n_shared,
       CAST(c AS DOUBLE) / (sa.m + sb.m - c) AS jaccard
FROM inter JOIN size_ sa ON ia = sa.doc_id JOIN size_ sb ON ib = sb.doc_id
WHERE CAST(c AS DOUBLE) / (sa.m + sb.m - c) >= 0.8
"""


def q_docs_eval_containment(sf_dir: str):
    """EXACT cross-split contamination (stages/setjoin.py
    containment_join): for every eval doc (md5 '-xc' split, 10%), the
    train docs containing >= 50% of its word-3-shingles — the exact
    counterpart of the bloom decontam (`docs_decontam`) and MinHash
    cross pairs (`docs_cross_dupes`). Right-side-only prefix filter
    (left never pruned), rarest-first by LEFT df; containment is an
    int/int division — bit-exact vs the SQL brute force."""
    from pymhealth_ray.stages.sample import _hex8, _threshold_hex
    from pymhealth_ray.stages.setjoin import containment_join

    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    thr = _threshold_hex(0.1)

    def split(is_eval: bool):
        def fn(b: pa.Table) -> pa.Table:
            ev = _hex8(b["doc_id"], "xc") < thr
            return b.filter(pa.array(ev if is_eval else ~ev))
        return fn

    train = docs.map_batches(split(False), batch_format="pyarrow")
    ev = docs.map_batches(split(True), batch_format="pyarrow")
    out = containment_join(train, ev, tau=0.5, num_buckets=NB)
    return out.map_batches(
        lambda b: pa.table({
            "train_id": b["id_a"], "eval_id": b["id_b"],
            "n_shared": b["n_shared"], "containment": b["containment"]}),
        batch_format="pyarrow")


SQL_DOCS_EVAL_CONTAINMENT = """
WITH base AS (
  SELECT doc_id, lower(text) AS t,
         substr(md5(CAST(doc_id AS VARCHAR) || '-xc'), 1, 8) < '19999999'
           AS is_eval
  FROM documents),
words AS (SELECT doc_id, is_eval, string_split(t, ' ') AS w FROM base),
tok AS (SELECT DISTINCT doc_id, is_eval,
               w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
  FROM words, UNNEST(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3),
esz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS m
  FROM tok WHERE is_eval GROUP BY doc_id),
inter AS (SELECT tr.doc_id AS train_id, ev.doc_id AS eval_id,
                 CAST(count(*) AS BIGINT) AS c
  FROM tok tr JOIN tok ev ON tr.sh = ev.sh
  WHERE NOT tr.is_eval AND ev.is_eval GROUP BY 1, 2)
SELECT train_id, eval_id, c AS n_shared,
       CAST(c AS DOUBLE) / m AS containment
FROM inter JOIN esz ON eval_id = esz.doc_id
WHERE CAST(c AS DOUBLE) / m >= 0.5
"""


def q_events_upsert_latest(sf_dir: str):
    """CDC upsert / log compaction (stages/dedup.py latest_by_key):
    latest event per (user_id, event_type) under (ts, event_id) order —
    one exchange on user_id, per-bucket mergesort + group-boundary take
    (Arrow take keeps the timestamp dtype bit-faithful)."""
    from pymhealth_ray.stages.dedup import latest_by_key

    ev = read_table(f"{sf_dir}/events.parquet",
                    columns=["event_id", "ts", "user_id",
                             "event_type", "value"])
    return latest_by_key(ev, ["user_id", "event_type"],
                         ["ts", "event_id"], num_buckets=NB)


SQL_EVENTS_UPSERT_LATEST = """
SELECT event_id, ts, user_id, event_type, value FROM (
  SELECT event_id, ts, user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) t
WHERE rn = 1
"""


def q_events_winsorized(sf_dir: str):
    """Per-type winsorization (stages/normalize.py winsorize_by_group):
    clip value to the exact [p5, p95] group quantiles from the
    distributed histogram combiner — broadcast thresholds, zero row
    exchange; output doubles are verbatim inputs or thresholds, bit-exact
    vs SQL least/greatest over quantile_disc."""
    from pymhealth_ray.stages.normalize import winsorize_by_group

    ev = read_table(f"{sf_dir}/events.parquet",
                    columns=["event_id", "event_type", "value"])
    return winsorize_by_group(ev, "event_type", "value", lo=0.05, hi=0.95)


SQL_EVENTS_WINSORIZED = """
WITH thr AS (
  SELECT event_type, quantile_disc(value, 0.05) AS qlo,
         quantile_disc(value, 0.95) AS qhi
  FROM events GROUP BY event_type)
SELECT e.event_id, e.event_type, e.value,
       least(greatest(e.value, thr.qlo), thr.qhi) AS value_w
FROM events e JOIN thr USING (event_type)
"""


def q_events_value_share(sf_dir: str):
    """Per-row share of its user's total value — the percent-of-total
    feature, exact: 2-decimal values become integer cents, per-user
    totals are bincount sums inside the user's bucket (ONE exchange of
    rows, zero joins), share = cents/total int/int division — bit-exact
    against the SQL window sum either side of any partitioning."""
    from pymhealth_ray.stages.partition import grouped_by_bucket

    # no temporal component — read only the three columns the share needs
    ev = read_table(f"{sf_dir}/events.parquet",
                    columns=["event_id", "user_id", "value"])

    def share_of_bucket(tbl: pa.Table) -> pa.Table:
        tbl = _cents(tbl, "value", "__c")
        uid = tbl["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = tbl["__c"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(uid, return_inverse=True)
        tot = np.bincount(inv, weights=c.astype(np.float64))
        tot = np.rint(tot).astype(np.int64)
        share = c.astype(np.float64) / tot[inv].astype(np.float64)
        return pa.table({
            "event_id": tbl["event_id"],
            "user_id": tbl["user_id"],
            "value": tbl["value"],
            "share": pa.array(share, type=pa.float64()),
        })

    return grouped_by_bucket(ev, share_of_bucket, entity_col="user_id",
                             num_buckets=NB)


SQL_EVENTS_VALUE_SHARE = """
WITH c AS (SELECT event_id, user_id, value,
                  CAST(round(value * 100) AS BIGINT) AS cents FROM events)
SELECT event_id, user_id, value,
       CAST(cents AS DOUBLE) /
       CAST(sum(cents) OVER (PARTITION BY user_id) AS BIGINT) AS share
FROM c
"""


def q_events_session_type_pairs(sf_dir: str):
    """Session-scoped co-occurrence: for every unordered event-type pair,
    how many (user, session) sessions contain BOTH types. Sessionize +
    distinct-types + vectorized pair explosion
    (stages/setjoin._explode_pairs) run FUSED inside ONE bucket
    map_groups call — the whole bucket arrives as a single table, so a
    (user, session) group can never straddle a block boundary (a separate
    map_batches stage could see map_groups outputs re-split by the block
    sizer and silently double-count). The final rollup moves <= |types|^2
    rows per bucket."""
    from pymhealth_ray.stages.partition import (entity_segments,
                                                grouped_by_bucket)
    from pymhealth_ray.stages.session import _session_ids
    from pymhealth_ray.stages.setjoin import _explode_pairs

    ev = _events(sf_dir, ["user_id", "ts", "event_type"])

    def pairs_of_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"type_a": pa.array([], type=pa.string()),
                          "type_b": pa.array([], type=pa.string()),
                          "n_sessions": pa.array([], type=pa.int64())})
        if tbl.num_rows == 0:
            return empty
        tbl, starts, _ = entity_segments(tbl, "user_id", "ts_us")
        ts = tbl["ts_us"].combine_chunks().to_numpy(zero_copy_only=False)
        sid = _session_ids(ts.astype(np.int64), starts, GAP_US)
        tbl = tbl.append_column("session_id",
                                pa.array(sid, type=pa.int64()))
        et = tbl["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        types = np.asarray(et.dictionary.to_pylist(), dtype=object)
        order = np.argsort(types, kind="stable")  # pair codes in type order
        rank = np.empty_like(order)
        rank[order] = np.arange(len(order))
        codes = rank[codes]
        uid = tbl["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sid = tbl["session_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # dynamic-width packing with a LOUD overflow guard (a silent
        # wrap would merge sessions across users)
        w = np.int64(sid.max() + 1)
        if int(uid.max()) >= (1 << 62) // (int(w) * (len(types) + 1)):
            raise OverflowError("session-pair key packing would overflow; "
                                "re-key users or split the bucket")
        grp = uid * w + sid
        key = grp * np.int64(len(types) + 1) + codes
        key = np.unique(key)  # distinct (group, type), sorted => types asc
        g2 = key // np.int64(len(types) + 1)
        c2 = key % np.int64(len(types) + 1)
        starts = np.concatenate(
            ([0], np.flatnonzero(g2[1:] != g2[:-1]) + 1, [len(g2)]))
        a, b = _explode_pairs(c2, starts)
        if len(a) == 0:
            return empty
        pk = a * np.int64(len(types) + 1) + b
        u, cnt = np.unique(pk, return_counts=True)
        ta = types[order][u // np.int64(len(types) + 1)]
        tb = types[order][u % np.int64(len(types) + 1)]
        return pa.table({
            "type_a": pa.array(list(ta), type=pa.string()),
            "type_b": pa.array(list(tb), type=pa.string()),
            "n_sessions": pa.array(cnt.astype(np.int64)),
        })

    partials = grouped_by_bucket(ev, pairs_of_bucket, entity_col="user_id",
                                 num_buckets=NB)

    def rollup(tbl: pa.Table) -> pa.Table:
        return tbl.group_by(["type_a", "type_b"]).aggregate(
            [("n_sessions", "sum")]).rename_columns(
            ["type_a", "type_b", "n_sessions"])

    return grouped_by_bucket(partials, rollup, entity_col="type_a",
                             num_buckets=4)


SQL_EVENTS_SESSION_TYPE_PAIRS = f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
s AS (SELECT user_id, ts_us, event_type,
             CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) > {GAP_US}
                  THEN 1 ELSE 0 END AS brk
      FROM e),
s2 AS (SELECT user_id, event_type,
              CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
       FROM s),
t AS (SELECT DISTINCT user_id, session_id, event_type FROM s2)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS n_sessions
FROM t a JOIN t b ON a.user_id = b.user_id AND a.session_id = b.session_id
                 AND a.event_type < b.event_type
GROUP BY 1, 2
"""


def q_orders_repeat_gap(sf_dir: str):
    """Repeat-purchase cadence per customer: integer day gaps between
    consecutive orders (date asc, orderkey tiebreak), per-customer count
    / exact median (quantile_disc rule) / max — one exchange on custkey,
    all-integer arithmetic."""
    from pymhealth_ray.stages.partition import grouped_by_bucket

    ds = read_table(f"{sf_dir}/orders.parquet",
                    columns=["o_custkey", "o_orderdate", "o_orderkey"])

    def per_bucket(tbl: pa.Table) -> pa.Table:
        d = tbl["o_orderdate"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False) // np.int64(86_400_000_000)
        cust = tbl["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        okey = tbl["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((okey, d, cust))
        cust, d = cust[order], d[order]
        gap = np.diff(d)
        same = cust[1:] == cust[:-1]
        gaps, gcust = gap[same], cust[1:][same]
        if len(gaps) == 0:
            return pa.table({"custkey": pa.array([], type=pa.int64()),
                             "n_gaps": pa.array([], type=pa.int64()),
                             "median_gap_days": pa.array([], type=pa.int64()),
                             "max_gap_days": pa.array([], type=pa.int64())})
        o2 = np.lexsort((gaps, gcust))
        gaps, gcust = gaps[o2], gcust[o2]
        starts = np.concatenate(
            ([0], np.flatnonzero(gcust[1:] != gcust[:-1]) + 1, [len(gcust)]))
        n = np.diff(starts)
        med_idx = starts[:-1] + np.ceil(0.5 * n).astype(np.int64) - 1
        max_idx = starts[1:] - 1  # gaps sorted asc within customer
        return pa.table({
            "custkey": pa.array(gcust[starts[:-1]]),
            "n_gaps": pa.array(n.astype(np.int64)),
            "median_gap_days": pa.array(gaps[med_idx]),
            "max_gap_days": pa.array(gaps[max_idx]),
        })

    return grouped_by_bucket(ds, per_bucket, entity_col="o_custkey",
                             num_buckets=NB)


SQL_ORDERS_REPEAT_GAP = """
WITH o AS (SELECT o_custkey, epoch_us(o_orderdate) // 86400000000 AS d,
                  o_orderkey FROM orders),
g AS (SELECT o_custkey,
             d - lag(d) OVER (PARTITION BY o_custkey
                              ORDER BY d, o_orderkey) AS gap
      FROM o)
SELECT o_custkey AS custkey, CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(quantile_disc(gap, 0.5) AS BIGINT) AS median_gap_days,
       CAST(max(gap) AS BIGINT) AS max_gap_days
FROM g WHERE gap IS NOT NULL GROUP BY o_custkey
"""


def q_seq_streaming_latest(sf_dir: str):
    """Latest-version-wins compaction by STREAMING the sorted layout
    (stages/streaming.streaming_latest): per entity one output row
    (count, last ts, last value) read off each partition file's entity
    segments with a single boundary carry — zero query-time exchange;
    the streaming counterpart of stages/dedup.latest_by_key."""
    from pymhealth_ray.stages.streaming import streaming_latest

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "n_tok"])
    layout = _sorted_layout(sf_dir, ds)
    return streaming_latest(layout)


def sql_seq_streaming_latest(path: str) -> str:
    return f"""
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_rows,
       max(ts_ns) AS last_ts,
       CAST(arg_max(n_tok, ts_ns) AS BIGINT) AS last_val
FROM read_parquet('{path}/part-*.parquet') GROUP BY doc_id
"""


def q_docs_fuzzy_pairs(sf_dir: str):
    """Entity-resolution verify step (stages/fuzzy.py): equi-block on the
    8-char lowercased prefix, then EXACT Levenshtein over 24-char
    prefixes — the Wagner-Fischer DP vectorized ACROSS pairs (uint32
    codepoint matrices, O(cap^2) numpy passes for any number of pairs).
    One exchange on the block key; hot blocks capped + logged."""
    from pymhealth_ray.stages.fuzzy import fuzzy_pairs

    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    return fuzzy_pairs(docs, block_prefix=8, sim_prefix=24, max_dist=5,
                       num_buckets=NB)


SQL_DOCS_FUZZY_PAIRS = """
WITH t AS (SELECT doc_id, substr(lower(text), 1, 8) AS bkey,
                  substr(lower(text), 1, 24) AS s FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
FROM t a JOIN t b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
WHERE levenshtein(a.s, b.s) <= 5
"""


def q_events_type_transitions(sf_dir: str):
    """First-order Markov transition matrix over user event streams:
    consecutive event-type pairs per user ((ts, event_id) order), global
    counts, and exact row-normalized probabilities (int/int division —
    the from-type rollup bucket co-locates a row's whole distribution).
    One full exchange (user buckets) + one tiny pair exchange."""
    from pymhealth_ray.stages.partition import entity_segments, grouped_by_bucket

    ev = _events(sf_dir, ["user_id", "ts", "event_type", "event_id"])

    def pairs_of_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"type_from": pa.array([], type=pa.string()),
                          "type_to": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64())})
        if tbl.num_rows == 0:
            return empty
        tbl, starts, _ = entity_segments(tbl, "user_id", "ts_us",
                                         tiebreak_col="event_id")
        et = tbl["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        types = np.asarray(et.dictionary.to_pylist(), dtype=object)
        k = len(types)
        same = np.ones(len(codes) - 1, dtype=bool) if len(codes) > 1 \
            else np.zeros(0, dtype=bool)
        same[starts[1:-1] - 1] = False  # user boundaries break pairs
        key = codes[:-1][same] * np.int64(k) + codes[1:][same]
        if len(key) == 0:
            return empty
        u, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "type_from": pa.array(list(types[u // k]), type=pa.string()),
            "type_to": pa.array(list(types[u % k]), type=pa.string()),
            "n": pa.array(cnt.astype(np.int64)),
        })

    partials = grouped_by_bucket(ev, pairs_of_bucket, entity_col="user_id",
                                 num_buckets=NB)

    def rollup(tbl: pa.Table) -> pa.Table:
        agg = tbl.group_by(["type_from", "type_to"]).aggregate(
            [("n", "sum")]).rename_columns(["type_from", "type_to", "n"])
        tf = agg["type_from"].combine_chunks().dictionary_encode()
        idx = tf.indices.to_numpy(zero_copy_only=False)
        n = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        tot = np.bincount(idx, weights=n.astype(np.float64))
        tot = np.rint(tot).astype(np.int64)
        p = n.astype(np.float64) / tot[idx].astype(np.float64)
        return agg.append_column("p", pa.array(p, type=pa.float64()))

    return grouped_by_bucket(partials, rollup, entity_col="type_from",
                             num_buckets=4)


SQL_EVENTS_TYPE_TRANSITIONS = """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
           FROM events),
t AS (SELECT event_type AS tf,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts_us, event_id) AS tt
      FROM e),
c AS (SELECT tf AS type_from, tt AS type_to, CAST(count(*) AS BIGINT) AS n
      FROM t WHERE tt IS NOT NULL GROUP BY 1, 2)
SELECT type_from, type_to, n,
       CAST(n AS DOUBLE) /
       CAST(sum(n) OVER (PARTITION BY type_from) AS BIGINT) AS p
FROM c
"""


def q_docs_jw_pairs(sf_dir: str):
    """Jaro-Winkler record-linkage pairs (stages/fuzzy.py metric=
    'jaro_winkler'): same 8-char equi-blocking as docs_fuzzy_pairs, but
    scored by the across-pairs Jaro-Winkler kernel — greedy window
    matching, FLOORED transposition count, 0.7 boost threshold, <=4
    prefix at 0.1 scale — bit-exact vs DuckDB's RapidFuzz-derived
    jaro_winkler_similarity (3000-pair fuzz in pytest)."""
    from pymhealth_ray.stages.fuzzy import fuzzy_pairs

    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    return fuzzy_pairs(docs, block_prefix=8, sim_prefix=24,
                       metric="jaro_winkler", min_sim=0.85,
                       num_buckets=NB)


SQL_DOCS_JW_PAIRS = """
WITH t AS (SELECT doc_id, substr(lower(text), 1, 8) AS bkey,
                  substr(lower(text), 1, 24) AS s FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       jaro_winkler_similarity(a.s, b.s) AS sim
FROM t a JOIN t b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
WHERE jaro_winkler_similarity(a.s, b.s) >= 0.85
"""


def q_docs_er_clusters(sf_dir: str):
    """End-to-end ENTITY RESOLUTION: 8-char equi-blocking → across-pairs
    Levenshtein verify (stages/fuzzy.py) → min-label connected components
    (stages/graph.py) → (doc_id, canonical_id) for every doc in a fuzzy
    cluster. The string-similarity twin of the MinHash chain
    (docs_dedup_clusters); SQL oracle closes the same clusters with a
    recursive transitive-closure CTE."""
    from pymhealth_ray.stages.fuzzy import fuzzy_pairs
    from pymhealth_ray.stages.graph import connected_components

    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    pairs = fuzzy_pairs(docs, block_prefix=8, sim_prefix=24, max_dist=5,
                        num_buckets=NB)
    labels = connected_components(pairs, "id_a", "id_b", num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b["v"], "canonical_id": b["l"]})

    return labels.map_batches(finish, batch_format="pyarrow")


SQL_DOCS_ER_CLUSTERS = """
WITH RECURSIVE
t AS (SELECT doc_id, substr(lower(text), 1, 8) AS bkey,
             substr(lower(text), 1, 24) AS s FROM documents),
p AS (SELECT a.doc_id AS u, b.doc_id AS v
      FROM t a JOIN t b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
      WHERE levenshtein(a.s, b.s) <= 5),
edges AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
SELECT u AS doc_id, least(u, min(v)) AS canonical_id
FROM reach GROUP BY u
"""


def q_docs_lsh_calibration(sf_dir: str):
    """Estimator CALIBRATION: for every LSH-verified near-dup pair,
    the signature-estimated Jaccard next to the EXACT Jaccard of the
    same rolling-hash shingle sets (stages/dedup._shingle_hashes) — the
    report a curation run reads to pick an LSH threshold. The exact side
    touches only the verified pairs: endpoint texts come back through
    the dropset restriction + two co-partitioned equi-joins (never a
    full corpus pass), and the per-pair set intersection is bounded by
    the dup-pair count. exact_jaccard = |∩|/|∪| int/int — bit-exact vs
    the single-process materialized oracle."""
    from pymhealth_ray.stages.dedup import _shingle_hashes
    from pymhealth_ray.stages.dropset import filter_by_keys
    from pymhealth_ray.stages.join import equi_join
    from pymhealth_ray.stages.setjoin import _endpoint_ids

    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    pairs = minhash_lsh_dupes(docs, jaccard_threshold=0.5).materialize()
    docs_r = filter_by_keys(docs, "doc_id", _endpoint_ids(pairs, "doc_id"),
                            keep=True, num_buckets=NB)
    j1 = equi_join(
        pairs.map_batches(lambda b: pa.table(
            {"doc_id": b["id_a"], "id_b": b["id_b"],
             "est_jaccard": b["est_jaccard"]}), batch_format="pyarrow"),
        docs_r, on="doc_id", num_buckets=NB, right_suffix="_a")
    j1 = j1.map_batches(lambda b: pa.table(
        {"id_a": b["doc_id"], "doc_id": b["id_b"],
         "est_jaccard": b["est_jaccard"], "text_a": b["text"]}),
        batch_format="pyarrow")
    j2 = equi_join(j1, docs_r, on="doc_id", num_buckets=NB,
                   right_suffix="_b")

    def calib(b: pa.Table) -> pa.Table:
        ta = b["text_a"].to_pylist()
        tb = b["text"].to_pylist()
        exact = np.empty(len(ta), dtype=np.float64)
        for i, (x, y) in enumerate(zip(ta, tb)):
            ha = _shingle_hashes(x)
            hb = _shingle_hashes(y)
            c = len(np.intersect1d(ha, hb, assume_unique=True))
            exact[i] = c / (len(ha) + len(hb) - c)
        out = pa.table({
            "id_a": b["id_a"], "id_b": b["doc_id"],
            "est_jaccard": b["est_jaccard"],
            "exact_jaccard": pa.array(exact, type=pa.float64()),
        })
        return _round_cols(out, {"est_jaccard": 4})

    return j2.map_batches(calib, batch_format="pyarrow")


def _lsh_calibration_expected(df):
    """Single-process replication: the LSH pair replay + per-pair exact
    shingle-hash-set Jaccard."""
    import pandas as pd

    from pymhealth_ray.stages.dedup import _shingle_hashes

    pairs = _minhash_pairs_expected(df)
    texts = dict(zip(df["doc_id"].astype(int), df["text"]))
    rows = []
    for r in pairs.itertuples(index=False):
        ha = _shingle_hashes(texts[int(r.id_a)])
        hb = _shingle_hashes(texts[int(r.id_b)])
        c = len(np.intersect1d(ha, hb, assume_unique=True))
        rows.append({"id_a": int(r.id_a), "id_b": int(r.id_b),
                     "est_jaccard": r.est_jaccard,
                     "exact_jaccard": c / (len(ha) + len(hb) - c)})
    return pd.DataFrame(rows, columns=["id_a", "id_b", "est_jaccard",
                                       "exact_jaccard"]).astype(
        {"id_a": np.int64, "id_b": np.int64,
         "est_jaccard": np.float64, "exact_jaccard": np.float64})


def q_events_value_runs(sf_dir: str):
    """Gaps-and-islands: per user, the RUNS of consecutive
    above-threshold events ((ts, event_id) order) — run count, longest
    run, and total hot events. One bucket exchange; runs fall out of a
    boundary mask over the sorted segments, all-integer. SQL oracle is
    the classic row_number-difference islands trick."""
    from pymhealth_ray.stages.partition import entity_segments, grouped_by_bucket

    THR = 50.0
    ev = _events(sf_dir, ["user_id", "ts", "event_id", "value"])

    def runs_of_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], type=pa.int64()),
                          "n_runs": pa.array([], type=pa.int64()),
                          "longest_run": pa.array([], type=pa.int64()),
                          "n_hot": pa.array([], type=pa.int64())})
        if tbl.num_rows == 0:
            return empty
        tbl, starts, _ = entity_segments(tbl, "user_id", "ts_us",
                                         tiebreak_col="event_id")
        uid = tbl["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hot = tbl["value"].to_numpy(zero_copy_only=False) > THR
        seg_id = np.zeros(len(uid), dtype=np.int64)
        seg_id[starts[1:-1]] = 1
        seg_id = np.cumsum(seg_id)
        # run starts: hot row whose predecessor is cold or another user
        prev_hot = np.concatenate(([False], hot[:-1]))
        prev_same = np.concatenate(([False], seg_id[1:] == seg_id[:-1]))
        run_start = hot & ~(prev_hot & prev_same)
        if not hot.any():
            return empty
        run_id = np.cumsum(run_start) - 1  # valid only on hot rows
        run_len = np.bincount(run_id[hot])
        run_user = uid[run_start]
        order = np.argsort(run_user, kind="stable")
        ru, rl = run_user[order], run_len[order]
        ustarts = np.concatenate(
            ([0], np.flatnonzero(ru[1:] != ru[:-1]) + 1, [len(ru)]))
        n_runs = np.diff(ustarts)
        longest = np.maximum.reduceat(rl, ustarts[:-1])
        n_hot = np.add.reduceat(rl, ustarts[:-1])
        return pa.table({
            "user_id": pa.array(ru[ustarts[:-1]]),
            "n_runs": pa.array(n_runs.astype(np.int64)),
            "longest_run": pa.array(longest.astype(np.int64)),
            "n_hot": pa.array(n_hot.astype(np.int64)),
        })

    return grouped_by_bucket(ev, runs_of_bucket, entity_col="user_id",
                             num_buckets=NB)


SQL_EVENTS_VALUE_RUNS = """
WITH e AS (SELECT user_id, value > 50.0 AS hot,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts), event_id) AS rn
           FROM events),
h AS (SELECT user_id, rn,
             rn - row_number() OVER (PARTITION BY user_id
                                     ORDER BY rn) AS grp
      FROM e WHERE hot),
r AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len
      FROM h GROUP BY user_id, grp)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_runs,
       CAST(max(len) AS BIGINT) AS longest_run,
       CAST(sum(len) AS BIGINT) AS n_hot
FROM r GROUP BY user_id
"""


def q_events_zorder_box(sf_dir: str):
    """TWO-column data skipping: events written Z-ORDERED on
    (ts_us, user_id) (sources/io.write_zordered — Morton-interleaved key,
    per-file bounding box in BOTH columns), then a mid-50% time × mid-50%
    user BOX aggregate reads only the overlapping files
    (io.read_zordered). A single-column sort cannot skip on the second
    predicate; the Morton layout prunes on both at once (pruning itself
    is pytest-asserted; the driver gates the end-to-end box aggregate)."""
    import json as _json
    import shutil
    import tempfile

    from pymhealth_ray.sources.io import read_zordered, write_zordered

    zdir = os.path.join(tempfile.gettempdir(), "pymhealth_ray_fixtures",
                        f"zorder_{os.path.basename(sf_dir)}_v1")
    if not os.path.exists(os.path.join(zdir, "_zordermap.json")):
        shutil.rmtree(zdir, ignore_errors=True)
        ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type",
                              "value"])
        write_zordered(ds, zdir, "ts_us", "user_id", num_files=32)

    with open(os.path.join(zdir, "_zordermap.json")) as f:
        man = _json.load(f)
    t_mn = min(m["x_min"] for m in man)
    t_mx = max(m["x_max"] for m in man)
    u_mn = min(m["y_min"] for m in man)
    u_mx = max(m["y_max"] for m in man)
    t_lo = t_mn + ((t_mx - t_mn) * 25) // 100
    t_hi = t_mn + ((t_mx - t_mn) * 75) // 100
    u_lo = u_mn + ((u_mx - u_mn) * 25) // 100
    u_hi = u_mn + ((u_mx - u_mn) * 75) // 100
    pruned, _, _ = read_zordered(zdir, "ts_us", "user_id",
                                 t_lo, t_hi, u_lo, u_hi,
                                 columns=["event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return _cents(b, "value", "val_c").select(["event_type", "val_c"])

    agg = grouped_stats(pruned.map_batches(prep, batch_format="pyarrow"),
                        ["event_type"], sum_cols=["val_c"])
    return agg.map_batches(
        lambda b: pa.table({
            "event_type": b["event_type"],
            "n": b["n"].cast(pa.int64()),
            "value_cents": b["val_c_sum"].cast(pa.int64())}),
        batch_format="pyarrow")


SQL_EVENTS_ZORDER_BOX = """
WITH e AS (SELECT event_type, value, user_id, epoch_us(ts) AS ts_us
           FROM events),
b AS (SELECT min(ts_us) AS tmn, max(ts_us) AS tmx,
             min(user_id) AS umn, max(user_id) AS umx FROM e)
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM e, b
WHERE ts_us >= tmn + ((tmx - tmn) * 25) // 100
  AND ts_us <= tmn + ((tmx - tmn) * 75) // 100
  AND user_id >= umn + ((umx - umn) * 25) // 100
  AND user_id <= umn + ((umx - umn) * 75) // 100
GROUP BY event_type
"""


def q_events_incremental_daily(sf_dir: str):
    """Incremental MATERIALIZED-VIEW maintenance (state/aggstate.py):
    the per-(day, event_type) count+cents rollup is built by folding two
    ingest deltas (event_id parity split) into persisted hash-bucketed
    state — map-side partials, ONE exchange ∝ distinct groups, each
    bucket merges + atomically rewrites only its own file; re-applying a
    tag is a per-bucket no-op (the first delta is applied twice here on
    purpose). Oracle: one full GROUP BY over everything — incremental
    state must equal the full recompute exactly."""
    import tempfile

    from pymhealth_ray.state.aggstate import (apply_group_sum_delta,
                                              read_group_sum_state)

    sdir = os.path.join(tempfile.gettempdir(), "pymhealth_ray_fixtures",
                        f"aggstate_{os.path.basename(sf_dir)}_v1")

    def delta(par: int):
        ev = _events(sf_dir, ["event_id", "ts", "event_type", "value"])

        def prep(b: pa.Table) -> pa.Table:
            b = b.filter(pc.equal(
                pc.bit_wise_and(b["event_id"], 1), par))
            b = _cents(b, "value", "val_c")
            day = pc.divide(b["ts_us"], 86_400_000_000)
            return pa.table({"day": day.cast(pa.int64()),
                             "event_type": b["event_type"],
                             "val_c": b["val_c"]})

        return ev.map_batches(prep, batch_format="pyarrow")

    apply_group_sum_delta(delta(0), sdir, ["day", "event_type"],
                          ["val_c"], tag="d0", num_buckets=NB)
    apply_group_sum_delta(delta(1), sdir, ["day", "event_type"],
                          ["val_c"], tag="d1", num_buckets=NB)
    # retried ingest: must be a no-op, not a double count
    apply_group_sum_delta(delta(0), sdir, ["day", "event_type"],
                          ["val_c"], tag="d0", num_buckets=NB)

    st = read_group_sum_state(sdir)
    return st.map_batches(
        lambda b: pa.table({"day": b["day"], "event_type": b["event_type"],
                            "n": b["n"], "value_cents": b["val_c_sum"]}),
        batch_format="pyarrow")


SQL_EVENTS_INCREMENTAL_DAILY = """
SELECT epoch_us(ts) // 86400000000 AS day, event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events GROUP BY 1, 2
"""


def q_events_session_enriched(sf_dir: str):
    """SESSION-WINDOW JOIN without a join: every event annotated with
    its own session's size, span, and position in it. The session
    assignment and the summary attach happen in the SAME bucket pass
    (a session lives entirely inside its user's bucket), so enrichment
    costs zero exchanges beyond the one the sessionizer already pays —
    the window-join shape SQL expresses as two window functions."""
    from pymhealth_ray.stages.partition import entity_segments, grouped_by_bucket
    from pymhealth_ray.stages.session import _session_ids

    ev = _events(sf_dir, ["event_id", "user_id", "ts"])

    def enrich(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"event_id": pa.array([], type=pa.int64()),
                             "user_id": pa.array([], type=pa.int64()),
                             "session_id": pa.array([], type=pa.int64()),
                             "session_n": pa.array([], type=pa.int64()),
                             "session_span_us": pa.array([], type=pa.int64()),
                             "pos_in_session": pa.array([], type=pa.int64())})
        tbl, starts, _ = entity_segments(tbl, "user_id", "ts_us",
                                         tiebreak_col="event_id")
        ts = tbl["ts_us"].combine_chunks().to_numpy(zero_copy_only=False)
        sid = _session_ids(ts.astype(np.int64), starts, GAP_US)
        # session boundaries: new user segment OR session id change
        new = np.zeros(len(sid), dtype=bool)
        new[0] = True
        new[starts[1:-1]] = True
        new[1:] |= sid[1:] != sid[:-1]
        sstart = np.flatnonzero(new)
        send = np.concatenate([sstart[1:], [len(sid)]])
        n = (send - sstart).astype(np.int64)
        span = ts[send - 1] - ts[sstart]
        srun = np.cumsum(new) - 1
        pos = np.arange(len(sid)) - sstart[srun]
        return pa.table({
            "event_id": tbl["event_id"],
            "user_id": tbl["user_id"],
            "session_id": pa.array(sid, type=pa.int64()),
            "session_n": pa.array(n[srun]),
            "session_span_us": pa.array(span[srun].astype(np.int64)),
            "pos_in_session": pa.array(pos.astype(np.int64)),
        })

    return grouped_by_bucket(ev, enrich, entity_col="user_id",
                             num_buckets=NB)


SQL_EVENTS_SESSION_ENRICHED = f"""
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
s AS (SELECT event_id, user_id, ts_us,
             CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) > {GAP_US}
                  THEN 1 ELSE 0 END AS brk
      FROM e),
s2 AS (SELECT event_id, user_id, ts_us,
              CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
       FROM s)
SELECT event_id, user_id, session_id,
       CAST(count(*) OVER w AS BIGINT) AS session_n,
       max(ts_us) OVER w - min(ts_us) OVER w AS session_span_us,
       CAST(row_number() OVER (PARTITION BY user_id, session_id
                               ORDER BY ts_us, event_id) - 1 AS BIGINT)
         AS pos_in_session
FROM s2 WINDOW w AS (PARTITION BY user_id, session_id)
"""


def q_events_concurrency(sf_dir: str):
    """GLOBAL sweep line: per-day PEAK number of concurrently-open user
    sessions. Sessions are built in their user's bucket (one exchange),
    collapse to (start, end) intervals, and the cross-entity question —
    how many are open at once — runs as interval→±1 deltas through the
    distributed ordered prefix sum (stages/sweep.py). No per-row window
    join, no driver loop; all int64."""
    from pymhealth_ray.stages.partition import entity_segments, grouped_by_bucket
    from pymhealth_ray.stages.session import _session_ids
    from pymhealth_ray.stages.sweep import peak_concurrency

    ev = _events(sf_dir, ["event_id", "user_id", "ts"])

    def to_intervals(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"s": pa.array([], type=pa.int64()),
                             "e": pa.array([], type=pa.int64())})
        tbl, starts, _ = entity_segments(tbl, "user_id", "ts_us",
                                         tiebreak_col="event_id")
        ts = tbl["ts_us"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        sid = _session_ids(ts, starts, GAP_US)
        new = np.zeros(len(sid), dtype=bool)
        new[0] = True
        new[starts[1:-1]] = True
        new[1:] |= sid[1:] != sid[:-1]
        sstart = np.flatnonzero(new)
        send = np.concatenate([sstart[1:], [len(sid)]])
        return pa.table({"s": pa.array(ts[sstart]),
                         "e": pa.array(ts[send - 1])})

    iv = grouped_by_bucket(ev, to_intervals, entity_col="user_id",
                           num_buckets=NB)
    out = peak_concurrency(iv, "s", "e")
    return out.map_batches(
        lambda b: pa.table({"day": b["period"],
                            "peak_sessions": b["peak"]}),
        batch_format="pyarrow")


SQL_EVENTS_CONCURRENCY = f"""
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
s AS (SELECT user_id, ts_us, event_id,
             CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) > {GAP_US}
                  THEN 1 ELSE 0 END AS brk
      FROM e),
s2 AS (SELECT user_id, ts_us,
              CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
       FROM s),
iv AS (SELECT user_id, sid, min(ts_us) AS s, max(ts_us) AS e
       FROM s2 GROUP BY user_id, sid),
d AS (SELECT s AS t, s * 2 + 1 AS key, CAST(1 AS BIGINT) AS d FROM iv
      UNION ALL
      SELECT e + 1 AS t, (e + 1) * 2 AS key, CAST(-1 AS BIGINT) AS d FROM iv),
c AS (SELECT t, d, CAST(sum(d) OVER (ORDER BY key ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM d),
p AS (SELECT t // 86400000000 AS day, CAST(max(cum) AS BIGINT) AS mx,
             CAST(sum(d) AS BIGINT) AS dsum
      FROM c GROUP BY 1),
q AS (SELECT day, mx,
             CAST(coalesce(sum(dsum) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS entering
      FROM p)
SELECT day, greatest(entering, mx) AS peak_sessions FROM q
"""


def q_events_snapshot_diff(sf_dir: str):
    """CDC snapshot DIFF: the first- and second-half-of-time latest
    value per user (latest_by_key, the log-compaction MERGE) are
    reconciled with ONE co-partitioned FULL OUTER join and classified
    added / removed / changed / same — the change-audit shape between
    two warehouse snapshots. The midpoint comes from the data (global
    min/max, O(1) driver state); values compare in integer cents."""
    from pymhealth_ray.stages.aggregate import grouped_stats
    from pymhealth_ray.stages.dedup import latest_by_key
    from pymhealth_ray.stages.join import equi_join

    ev = _events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "val_c")
        return b.select(["event_id", "user_id", "ts_us", "val_c"])

    # consumed three times (range probe + both snapshot halves)
    ev = ev.map_batches(prep, batch_format="pyarrow").materialize()
    st = grouped_stats(ev.map_batches(
        lambda b: pa.table({"one": pa.array(
            np.zeros(b.num_rows, dtype=np.int8)), "ts_us": b["ts_us"]}),
        batch_format="pyarrow"), ["one"],
        min_cols=["ts_us"], max_cols=["ts_us"]).take_all()
    tmn, tmx = int(st[0]["ts_us_min"]), int(st[0]["ts_us_max"])
    tmid = tmn + (tmx - tmn) // 2

    def half(keep_first: bool):
        def f(b: pa.Table) -> pa.Table:
            m = pc.less_equal(b["ts_us"], tmid) if keep_first \
                else pc.greater(b["ts_us"], tmid)
            return b.filter(m)
        name = "val_a" if keep_first else "val_b"
        # explicit presence flag: classification must test "row exists in
        # this snapshot half", not val NULL-ness (a NULL latest value
        # would otherwise masquerade as added/removed — ADVICE r4)
        flag = "in_a" if keep_first else "in_b"
        latest = latest_by_key(ev.map_batches(f, batch_format="pyarrow"),
                               ["user_id"], ["ts_us", "event_id"],
                               num_buckets=NB)
        return latest.map_batches(
            lambda b: pa.table({"user_id": b["user_id"], name: b["val_c"],
                                flag: pa.array(np.ones(b.num_rows,
                                                       dtype=np.int8))}),
            batch_format="pyarrow")

    joined = equi_join(half(True), half(False), on="user_id",
                       join_type="full outer", num_buckets=NB)

    def classify(b: pa.Table) -> pa.Table:
        a, v = b["val_a"], b["val_b"]
        a_null = pc.is_null(b["in_a"])
        b_null = pc.is_null(b["in_b"])
        status = pc.if_else(
            b_null, pa.scalar("removed"),
            pc.if_else(a_null, pa.scalar("added"),
                       pc.if_else(pc.equal(a, v), pa.scalar("same"),
                                  pa.scalar("changed"))))
        return pa.table({"user_id": b["user_id"], "status": status,
                         "val_a_c": a.cast(pa.int64()),
                         "val_b_c": v.cast(pa.int64())})

    return joined.map_batches(classify, batch_format="pyarrow")


SQL_EVENTS_SNAPSHOT_DIFF = """
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                  CAST(round(value * 100) AS BIGINT) AS val_c FROM events),
b0 AS (SELECT min(ts_us) + (max(ts_us) - min(ts_us)) // 2 AS tmid FROM e),
a AS (SELECT user_id, val_c FROM (
        SELECT user_id, val_c,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts_us DESC, event_id DESC) AS rn
        FROM e, b0 WHERE ts_us <= tmid) WHERE rn = 1),
b AS (SELECT user_id, val_c FROM (
        SELECT user_id, val_c,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts_us DESC, event_id DESC) AS rn
        FROM e, b0 WHERE ts_us > tmid) WHERE rn = 1)
SELECT COALESCE(a.user_id, b.user_id) AS user_id,
       CASE WHEN b.user_id IS NULL THEN 'removed'
            WHEN a.user_id IS NULL THEN 'added'
            WHEN a.val_c = b.val_c THEN 'same'
            ELSE 'changed' END AS status,
       a.val_c AS val_a_c, b.val_c AS val_b_c
FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
"""


def q_part_skyline(sf_dir: str):
    """Pareto FRONT of the part catalog: cheapest price for the size you
    get (minimize retail cents, maximize size). Skylines merge without an
    exchange — local front per block, union, one coalesced re-pass
    (stages/skyline.py) — so the operator is map-only at any scale.
    Ties on both dimensions all survive, matching NOT EXISTS dominance."""
    from pymhealth_ray.stages.skyline import skyline_2d

    part = read_table(f"{sf_dir}/part.parquet",
                      columns=["p_partkey", "p_size", "p_retailprice"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "p_retailprice", "price_c")
        return pa.table({"p_partkey": b["p_partkey"],
                         "price_c": b["price_c"],
                         "p_size": b["p_size"].cast(pa.int64())})

    front = skyline_2d(part.map_batches(prep, batch_format="pyarrow"),
                       "price_c", "p_size")
    return front


SQL_PART_SKYLINE = """
WITH p AS (SELECT p_partkey,
                  CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
                  CAST(p_size AS BIGINT) AS p_size
           FROM part)
SELECT p_partkey, price_c, p_size FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.price_c <= a.price_c AND b.p_size >= a.p_size
    AND (b.price_c < a.price_c OR b.p_size > a.p_size))
"""


def q_item_triangles(sf_dir: str):
    """TRIANGLE COUNTING on the item co-purchase graph: parts are nodes,
    orders containing both parts are edges, and each part reports how
    many triangles it sits in. Edges dedupe through a packed-key
    keyed_sum; edges orient by (degree, id) rank — the O(√m) out-degree
    bound that keeps the wedge fan-out polynomial at web scale; wedges
    close via the exact dual-plan semi-join (stages/triangles.py)."""
    from pymhealth_ray.stages.aggregate import grouped_stats
    from pymhealth_ray.stages.triangles import (cooccurrence_edges,
                                                triangle_node_counts)

    li = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_orderkey", "l_partkey"])
    st = grouped_stats(li.map_batches(
        lambda b: pa.table({"one": pa.array(
            np.zeros(b.num_rows, dtype=np.int8)),
            "l_partkey": b["l_partkey"]}),
        batch_format="pyarrow"), ["one"],
        max_cols=["l_partkey"]).take_all()
    mx = int(st[0]["l_partkey_max"])
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey", max_item=mx,
                               num_buckets=NB)
    tri = triangle_node_counts(edges, max_node=mx, num_buckets=NB)
    return tri.map_batches(
        lambda b: pa.table({"p_partkey": b["node"],
                            "n_triangles": b["n_triangles"]}),
        batch_format="pyarrow")


SQL_ITEM_TRIANGLES = """
WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e AS (SELECT DISTINCT x.p AS a, y.p AS b
      FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1
      JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
      JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
n AS (SELECT x AS node FROM t
      UNION ALL SELECT y FROM t
      UNION ALL SELECT z FROM t)
SELECT node AS p_partkey, CAST(count(*) AS BIGINT) AS n_triangles
FROM n GROUP BY node
"""


def q_events_scd2(sf_dir: str):
    """Type-2 SLOWLY-CHANGING-DIMENSION build: the per-user event_type
    stream collapses to validity intervals [valid_from, valid_to) — one
    row per constant-value run, valid_to = the next run's start (NULL on
    the open current row). One bucket exchange; run boundaries and the
    lead fall out of the same sorted segment masks the sessionizer uses.
    Oracle: islands trick + lead() — the warehouse-standard SCD2 MERGE."""
    from pymhealth_ray.stages.partition import entity_segments, grouped_by_bucket

    ev = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"])

    def scd_of_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], type=pa.int64()),
                          "event_type": pa.array([], type=pa.string()),
                          "valid_from": pa.array([], type=pa.int64()),
                          "valid_to": pa.array([], type=pa.int64()),
                          "version_n": pa.array([], type=pa.int64())})
        if tbl.num_rows == 0:
            return empty
        tbl, starts, _ = entity_segments(tbl, "user_id", "ts_us",
                                         tiebreak_col="event_id")
        ts = tbl["ts_us"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        et = tbl["event_type"].combine_chunks()
        codes = et.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        new = np.zeros(len(ts), dtype=bool)
        new[0] = True
        new[starts[1:-1]] = True
        new[1:] |= codes[1:] != codes[:-1]
        rstart = np.flatnonzero(new)
        rend = np.concatenate([rstart[1:], [len(ts)]])
        uid = tbl["user_id"].to_numpy(zero_copy_only=False)[rstart]
        # lead(valid_from): next run's start within the same user
        vfrom = ts[rstart]
        vto = np.empty(len(rstart), dtype=np.int64)
        vto[:-1] = vfrom[1:]
        vto[-1] = 0
        last_of_user = np.zeros(len(rstart), dtype=bool)
        last_of_user[:-1] = uid[1:] != uid[:-1]
        last_of_user[-1] = True
        # version number within user (1-based)
        firsts = np.concatenate(([True], uid[1:] != uid[:-1]))
        ver = np.arange(len(rstart), dtype=np.int64)
        ver -= np.maximum.accumulate(np.where(firsts, ver, -1))
        ver += 1
        return pa.table({
            "user_id": pa.array(uid),
            "event_type": et.take(pa.array(rstart)),
            "valid_from": pa.array(vfrom),
            "valid_to": pa.array(vto, type=pa.int64(), mask=last_of_user),
            "version_n": pa.array(ver),
        })

    return grouped_by_bucket(ev, scd_of_bucket, entity_col="user_id",
                             num_buckets=NB)


SQL_EVENTS_SCD2 = """
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
           FROM events),
m AS (SELECT user_id, ts_us, event_id, event_type,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
r AS (SELECT user_id, ts_us, event_type,
             CAST(sum(brk) OVER (PARTITION BY user_id
                                 ORDER BY ts_us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
      FROM m),
iv AS (SELECT user_id, event_type, run, min(ts_us) AS valid_from
       FROM r GROUP BY user_id, event_type, run)
SELECT user_id, event_type, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY run) AS valid_to,
       CAST(run AS BIGINT) AS version_n
FROM iv
"""


def q_item_triples(sf_dir: str):
    """A-PRIORI frequent 3-itemsets over customer purchase baskets
    (orders ⋈ lineitem → distinct parts per customer): triples of parts
    at least 3 customers all bought. Pair supports prune first
    (monotonicity — no triple outlives an infrequent sub-pair), so the
    cubic candidate space never materializes; both membership checks run
    through the exact dual-plan semi-join (stages/assoc.frequent_triples)."""
    from pymhealth_ray.stages.aggregate import grouped_stats
    from pymhealth_ray.stages.assoc import frequent_triples
    from pymhealth_ray.stages.join import equi_join

    orders = read_table(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    li = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_orderkey", "l_partkey"])
    li = li.map_batches(
        lambda b: pa.table({"o_orderkey": b["l_orderkey"],
                            "p": b["l_partkey"]}),
        batch_format="pyarrow")
    # max(l_partkey) probed on the RAW lineitem read (every lineitem
    # row joins an order, so the join cannot change the max) — avoids
    # re-executing the whole equi_join for a scalar
    st = grouped_stats(li.map_batches(
        lambda b: pa.table({"one": pa.array(
            np.zeros(b.num_rows, dtype=np.int8)), "p": b["p"]}),
        batch_format="pyarrow"), ["one"], max_cols=["p"]).take_all()
    mx = int(st[0]["p_max"])
    ub = equi_join(li, orders, on="o_orderkey", num_buckets=NB)
    ub = ub.map_batches(
        lambda b: pa.table({"u": b["o_custkey"], "p": b["p"]}),
        batch_format="pyarrow")
    return frequent_triples(ub, "u", "p", max_item=mx, min_support=3,
                            num_buckets=NB)


SQL_ITEM_TRIPLES = """
WITH ub AS (SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS p
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey)
SELECT x.p AS item_a, y.p AS item_b, z.p AS item_c,
       CAST(count(*) AS BIGINT) AS support
FROM ub x
JOIN ub y ON y.u = x.u AND y.p > x.p
JOIN ub z ON z.u = x.u AND z.p > y.p
GROUP BY 1, 2, 3 HAVING count(*) >= 3
"""


def q_events_cuped(sf_dir: str):
    """CUPED experiment readout: per-user pre/post-period spend (integer
    cents, split at the global time midpoint), deterministic md5 variant
    assignment, and the variance-reduced adjusted mean per variant —
    ``post̄_v − θ·(prē_v − prē)`` with θ = cov(pre,post)/var(pre) pooled.
    Scale shape: ONE keyed_sum on user_id builds the per-user panel, one
    tiny grouped_stats emits 2 rows of exact int64 moments; θ and the
    adjustment are computed from those ints in arbitrary-precision
    Python, mirroring the oracle's HUGEINT → DOUBLE cast sequence, so
    the floats are bit-identical. Driver state is O(variants)."""
    import hashlib

    from pymhealth_ray.stages.aggregate import grouped_stats, keyed_sum

    ev = _events(sf_dir, ["user_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "val_c")
        return pa.table({"user_id": b["user_id"], "ts_us": b["ts_us"],
                         "val_c": b["val_c"]})

    ev = ev.map_batches(prep, batch_format="pyarrow").materialize()
    st = grouped_stats(ev.map_batches(
        lambda b: pa.table({"one": pa.array(
            np.zeros(b.num_rows, dtype=np.int8)), "ts_us": b["ts_us"]}),
        batch_format="pyarrow"), ["one"],
        min_cols=["ts_us"], max_cols=["ts_us"]).take_all()
    tmn, tmx = int(st[0]["ts_us_min"]), int(st[0]["ts_us_max"])
    tmid = tmn + (tmx - tmn) // 2

    def split_cols(b: pa.Table) -> pa.Table:
        pre_m = pc.less_equal(b["ts_us"], tmid)
        v = b["val_c"]
        zero = pa.scalar(0, type=pa.int64())
        return pa.table({"user_id": b["user_id"],
                         "pre": pc.if_else(pre_m, v, zero),
                         "post": pc.if_else(pre_m, zero, v)})

    panel = keyed_sum(ev.map_batches(split_cols, batch_format="pyarrow"),
                      "user_id", ["pre", "post"], num_buckets=NB,
                      precombine_rows=None)

    def moments(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        h = np.array([hashlib.md5(f"{u}-cuped".encode()).hexdigest()[:8]
                      for u in uid], dtype=object)
        variant = (h >= "80000000").astype(np.int64)
        pre = b["pre"].to_numpy(zero_copy_only=False)
        post = b["post"].to_numpy(zero_copy_only=False)
        return pa.table({"variant": pa.array(variant),
                         "pre": pa.array(pre), "post": pa.array(post),
                         "pre2": pa.array(pre * pre),
                         "prepost": pa.array(pre * post)})

    agg = grouped_stats(panel.map_batches(moments, batch_format="pyarrow"),
                        ["variant"],
                        sum_cols=["pre", "post", "pre2", "prepost"])
    rows = sorted(agg.take_all(), key=lambda r: r["variant"])
    # pooled θ from arbitrary-precision ints; floats mirror the SQL cast
    # sequence exactly: CAST(int AS DOUBLE) → float(int), then IEEE ops
    n_p = sum(int(r["n"]) for r in rows)
    sx_p = sum(int(r["pre_sum"]) for r in rows)
    sy_p = sum(int(r["post_sum"]) for r in rows)
    sxx_p = sum(int(r["pre2_sum"]) for r in rows)
    sxy_p = sum(int(r["prepost_sum"]) for r in rows)
    num = sxy_p * n_p - sx_p * sy_p
    den = sxx_p * n_p - sx_p * sx_p
    # constant pre-period spend: var(pre)=0, CUPED degenerates to the
    # plain mean (theta irrelevant since pre deviations are all zero)
    theta = float(num) / float(den) if den else 0.0
    mean_pre_pool = float(sx_p) / float(n_p)
    out_v, out_n, out_adj = [], [], []
    for r in rows:
        n_v = int(r["n"])
        adj = (float(int(r["post_sum"])) / float(n_v)
               - theta * (float(int(r["pre_sum"])) / float(n_v)
                          - mean_pre_pool))
        out_v.append(int(r["variant"]))
        out_n.append(n_v)
        out_adj.append(float(_round_away(np.array([adj]), 6)[0]))
    return pa.table({"variant": pa.array(out_v, type=pa.int64()),
                     "n_users": pa.array(out_n, type=pa.int64()),
                     "adj_mean_c": pa.array(out_adj, type=pa.float64())})


SQL_EVENTS_CUPED = """
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
                  CAST(round(value * 100) AS BIGINT) AS val_c FROM events),
b0 AS (SELECT min(ts_us) + (max(ts_us) - min(ts_us)) // 2 AS tmid FROM e),
u AS (SELECT user_id,
             CAST(sum(CASE WHEN ts_us <= tmid THEN val_c ELSE 0 END)
                  AS BIGINT) AS pre,
             CAST(sum(CASE WHEN ts_us > tmid THEN val_c ELSE 0 END)
                  AS BIGINT) AS post
      FROM e, b0 GROUP BY user_id),
v AS (SELECT CASE WHEN substr(md5(user_id || '-cuped'), 1, 8) >= '80000000'
                  THEN 1 ELSE 0 END AS variant, pre, post FROM u),
agg AS (SELECT variant, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(pre) AS BIGINT) AS sx,
               CAST(sum(post) AS BIGINT) AS sy,
               CAST(sum(pre * pre) AS BIGINT) AS sxx,
               CAST(sum(pre * post) AS BIGINT) AS sxy
        FROM v GROUP BY variant),
pool AS (SELECT CAST(sum(n) AS HUGEINT) AS n, CAST(sum(sx) AS HUGEINT) AS sx,
                CAST(sum(sy) AS HUGEINT) AS sy,
                CAST(sum(sxx) AS HUGEINT) AS sxx,
                CAST(sum(sxy) AS HUGEINT) AS sxy FROM agg)
SELECT a.variant, a.n AS n_users,
       round(CAST(a.sy AS DOUBLE) / CAST(a.n AS DOUBLE)
             - (CAST(p.sxy * p.n - p.sx * p.sy AS DOUBLE)
                / CAST(p.sxx * p.n - p.sx * p.sx AS DOUBLE))
               * (CAST(a.sx AS DOUBLE) / CAST(a.n AS DOUBLE)
                  - CAST(p.sx AS DOUBLE) / CAST(p.n AS DOUBLE)), 6)
         AS adj_mean_c
FROM agg a, pool p
"""


def q_embed_rrf(sf_dir: str):
    """RECIPROCAL-RANK FUSION of two retrieval views: exact cosine top-20
    and exact inner-product (MIPS) top-20 per query fuse as
    Σ 1/(60 + rank) — the standard hybrid-retrieval merge. Both rankings
    stream the candidate set (partial top-k per batch, driver merges
    n_q × k rows); the fusion itself is O(queries × k). Ranks tie-break
    on neighbor id, matching the oracle's window order exactly."""
    import pyarrow.parquet as pq_mod

    from pymhealth_ray.stages import ann

    ds = read_table(f"{sf_dir}/embeddings.parquet",
                    columns=["vec_id", "embedding"])
    full = pq_mod.read_table(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
    queries = full.filter(pc.less(full["vec_id"], 8))
    K_RET = 20

    def ranks_of(tbl: pa.Table) -> dict:
        # tbl is sorted (query_id, -score, neighbor_id); rank = position
        out = {}
        qi = tbl["query_id"].to_numpy(zero_copy_only=False)
        ni = tbl["neighbor_id"].to_numpy(zero_copy_only=False)
        r = 0
        prev = None
        for q, n in zip(qi, ni):
            r = r + 1 if q == prev else 1
            prev = q
            out[(int(q), int(n))] = r
        return out

    ra = ranks_of(ann.knn_bruteforce(ds, queries, k=K_RET, metric="cosine"))
    rb = ranks_of(ann.knn_bruteforce(ds, queries, k=K_RET, metric="dot"))
    keys = sorted(set(ra) | set(rb))
    rrf = [(0.0 if k not in ra else 1.0 / (60 + ra[k]))
           + (0.0 if k not in rb else 1.0 / (60 + rb[k])) for k in keys]
    return pa.table({
        "query_id": pa.array([k[0] for k in keys], type=pa.int64()),
        "neighbor_id": pa.array([k[1] for k in keys], type=pa.int64()),
        "rrf": pa.array(_round_away(np.array(rrf, dtype=np.float64), 9)),
    })


SQL_EMBED_RRF = """
WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings WHERE vec_id < 8),
n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
a AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY list_cosine_similarity(q.e, n.e) DESC,
                                         n.vec_id) AS rnk
      FROM q CROSS JOIN n WHERE q.vec_id <> n.vec_id),
b AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY list_inner_product(q.e, n.e) DESC,
                                         n.vec_id) AS rnk
      FROM q CROSS JOIN n WHERE q.vec_id <> n.vec_id),
a20 AS (SELECT * FROM a WHERE rnk <= 20),
b20 AS (SELECT * FROM b WHERE rnk <= 20)
SELECT COALESCE(a20.query_id, b20.query_id) AS query_id,
       COALESCE(a20.neighbor_id, b20.neighbor_id) AS neighbor_id,
       round(COALESCE(1.0 / (60 + a20.rnk), 0.0)
             + COALESCE(1.0 / (60 + b20.rnk), 0.0), 9) AS rrf
FROM a20 FULL OUTER JOIN b20
  ON a20.query_id = b20.query_id AND a20.neighbor_id = b20.neighbor_id
"""


def q_seq_streaming_rolling(sf_dir: str):
    """Trailing 8-row window sum/count per entity by STREAMING the
    sorted layout (stages/streaming.streaming_rolling — bounded
    ≤ window−1 carry across Arrow batch boundaries, zero query-time
    exchange): the streaming twin of the exchange-based rolling stage.
    Int64-exact; SQL ROWS-window oracle."""
    from pymhealth_ray.stages.streaming import streaming_rolling

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "n_tok"])
    layout = _sorted_layout(sf_dir, ds)
    return streaming_rolling(layout, window=8)


def sql_seq_streaming_rolling(path: str) -> str:
    return f"""
SELECT doc_id, ts_ns, CAST(n_tok AS BIGINT) AS n_tok,
  CAST(sum(n_tok) OVER w AS BIGINT) AS wsum,
  CAST(count(*) OVER w AS BIGINT) AS wn
FROM read_parquet('{path}/part-*.parquet')
WINDOW w AS (PARTITION BY doc_id ORDER BY ts_ns
             ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
"""


def q_events_hourly_trend(sf_dir: str):
    """Per-event-type OLS trend of spend vs hour-of-day: slope and
    intercept from EXACT int64 moment partials (n, Σx, Σy, Σxx, Σxy —
    map-side sums, one tiny exchange over event types), finished in
    arbitrary-precision Python mirroring the oracle's HUGEINT → DOUBLE
    cast sequence. The grouped-regression shape (regr_slope) without
    float accumulation — partitioning-independent by construction."""
    from pymhealth_ray.stages.aggregate import grouped_stats

    ev = _events(sf_dir, ["ts", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "y")
        ts = b["ts_us"].to_numpy(zero_copy_only=False)
        x = (ts // 3_600_000_000) % 24
        y = b["y"].to_numpy(zero_copy_only=False)
        return pa.table({"event_type": b["event_type"], "x": pa.array(x),
                         "y": b["y"], "xx": pa.array(x * x),
                         "xy": pa.array(x * y)})

    agg = grouped_stats(ev.map_batches(prep, batch_format="pyarrow"),
                        ["event_type"], sum_cols=["x", "y", "xx", "xy"])
    rows = agg.take_all()
    et, ns, slopes, icepts = [], [], [], []
    for r in sorted(rows, key=lambda r: r["event_type"]):
        n, sx, sy = int(r["n"]), int(r["x_sum"]), int(r["y_sum"])
        sxx, sxy = int(r["xx_sum"]), int(r["xy_sum"])
        den = n * sxx - sx * sx
        if den == 0:  # zero x-variance: SQL's division yields NULL
            slope = icept = None
        else:
            slope = float(n * sxy - sx * sy) / float(den)
            icept = (float(sy) - slope * float(sx)) / float(n)
            slope = float(_round_away(np.array([slope]), 6)[0])
            icept = float(_round_away(np.array([icept]), 6)[0])
        et.append(r["event_type"])
        ns.append(n)
        slopes.append(slope)
        icepts.append(icept)
    return pa.table({"event_type": pa.array(et), "n": pa.array(ns, type=pa.int64()),
                     "slope_c": pa.array(slopes, type=pa.float64()),
                     "intercept_c": pa.array(icepts, type=pa.float64())})


SQL_EVENTS_HOURLY_TREND = """
WITH e AS (SELECT event_type,
                  (epoch_us(ts) // 3600000000) % 24 AS x,
                  CAST(round(value * 100) AS BIGINT) AS y FROM events),
agg AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
               CAST(sum(x * x) AS HUGEINT) AS sxx,
               CAST(sum(x * y) AS HUGEINT) AS sxy
        FROM e GROUP BY event_type),
s AS (SELECT event_type, n, sx, sy,
             CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
      FROM agg)
SELECT event_type, CAST(n AS BIGINT) AS n,
       round(slope, 6) AS slope_c,
       round((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE), 6) AS intercept_c
FROM s
"""


def q_docs_cluster_split(sf_dir: str):
    """LEAKAGE-FREE train/eval split: the md5 split key is the near-dup
    CLUSTER id, not the doc id, so a duplicate family can never straddle
    the split boundary (the classic contamination hole a doc-keyed split
    leaves open). LSH pairs → CC labels → dual-plan cluster lookup
    (singletons default to their own id) → one map-only md5 predicate.
    80/20 split; oracle = single-process replication to parquet."""
    from pymhealth_ray.stages.dropset import lookup_with_default
    from pymhealth_ray.stages.graph import connected_components
    from pymhealth_ray.stages.sample import _hex8, _threshold_hex

    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    pairs = minhash_lsh_dupes(docs, jaccard_threshold=0.5)
    labels = connected_components(pairs, "id_a", "id_b", num_buckets=NB)
    with_cluster = lookup_with_default(
        docs.select_columns(["doc_id"]), "doc_id", labels, "v", "l",
        "cluster_id", num_buckets=NB)
    thr = _threshold_hex(0.8)

    def assign(b: pa.Table) -> pa.Table:
        h = _hex8(b["cluster_id"], "clsplit")
        return pa.table({
            "doc_id": b["doc_id"],
            "cluster_id": b["cluster_id"].cast(pa.int64()),
            "split": pa.array(np.where(h < thr, "train", "eval")),
        })

    return with_cluster.map_batches(assign, batch_format="pyarrow")


def _cluster_split_expected(df):
    """Single-process replication: UF clusters (singletons = self), then
    the same md5-prefix predicate per cluster."""
    import pandas as pd

    lab = _dedup_clusters_expected(df)
    cmap = dict(zip(lab.doc_id.values, lab.cluster_id.values))
    cl = np.array([cmap.get(int(d), int(d)) for d in df.doc_id.values],
                  dtype=np.int64)
    thr = format(int(0.8 * 16**8), "08x")
    split = np.array([
        "train" if hashlib.md5(f"{c}-clsplit".encode()).hexdigest()[:8] < thr
        else "eval" for c in cl])
    return pd.DataFrame({"doc_id": df.doc_id.values.astype(np.int64),
                         "cluster_id": cl, "split": split})


def q_events_labeled_examples(sf_dir: str):
    """Supervised EXAMPLE BUILDER for next-event prediction: per user
    (ts, event_id order) each row becomes features drawn strictly from
    its own past — current type, gap to the previous event, trailing
    3-row spend — plus ``label_type`` = the NEXT event's type; last rows
    (no future) drop out. The leakage discipline is structural: features
    are windowed ≤ current row, only the label looks forward, all in the
    one sorted bucket pass the sessionizer already pays for."""
    from pymhealth_ray.stages.partition import entity_segments, grouped_by_bucket

    ev = _events(sf_dir, ["event_id", "user_id", "ts", "event_type",
                          "value"])

    def build(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"event_id": pa.array([], type=pa.int64()),
                          "user_id": pa.array([], type=pa.int64()),
                          "cur_type": pa.array([], type=pa.string()),
                          "dt_prev_us": pa.array([], type=pa.int64()),
                          "w3_sum_c": pa.array([], type=pa.int64()),
                          "label_type": pa.array([], type=pa.string())})
        if tbl.num_rows == 0:
            return empty
        tbl = _cents(tbl, "value", "val_c")
        tbl, starts, _ = entity_segments(tbl, "user_id", "ts_us",
                                         tiebreak_col="event_id")
        ts = tbl["ts_us"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        v = tbl["val_c"].to_numpy(zero_copy_only=False)
        n = len(ts)
        head = np.zeros(n, dtype=bool)
        head[starts[:-1]] = True
        seg_start = np.maximum.accumulate(
            np.where(head, np.arange(n), 0))
        g = np.arange(n)
        win = np.maximum(g - 2, seg_start)
        cs = np.concatenate([[0], np.cumsum(v)])
        w3 = cs[g + 1] - cs[win]
        dt = np.empty(n, dtype=np.int64)
        dt[1:] = ts[1:] - ts[:-1]
        dt[0] = 0
        last = np.zeros(n, dtype=bool)
        last[starts[1:] - 1] = True
        keep = ~last
        et = tbl["event_type"].combine_chunks()
        nxt_idx = np.minimum(g + 1, n - 1)
        out = pa.table({
            "event_id": tbl["event_id"],
            "user_id": tbl["user_id"],
            "cur_type": et,
            "dt_prev_us": pa.array(dt, type=pa.int64(), mask=head),
            "w3_sum_c": pa.array(w3.astype(np.int64)),
            "label_type": et.take(pa.array(nxt_idx)),
        })
        return out.filter(pa.array(keep))

    return grouped_by_bucket(ev, build, entity_col="user_id",
                             num_buckets=NB)


SQL_EVENTS_LABELED_EXAMPLES = """
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
                  CAST(round(value * 100) AS BIGINT) AS val_c FROM events),
w AS (SELECT event_id, user_id, event_type AS cur_type,
             ts_us - lag(ts_us) OVER win AS dt_prev_us,
             CAST(sum(val_c) OVER (win ROWS BETWEEN 2 PRECEDING
                                   AND CURRENT ROW) AS BIGINT) AS w3_sum_c,
             lead(event_type) OVER win AS label_type
      FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, event_id))
SELECT * FROM w WHERE label_type IS NOT NULL
"""


def _keyed_layout(sf_dir: str, ds, *, key_col: str, tag: str,
                  num_buckets: int = 16):
    """Cached key-bucketed sorted layout (the SMB-join ingest side) —
    one marker discipline, shared with _sorted_layout."""
    return _sorted_layout(sf_dir, ds, suffix=f"_smb_{tag}",
                          num_buckets=num_buckets, entity_col=key_col,
                          sort_cols=[key_col])


def q_orders_smb_join(sf_dir: str):
    """SMB (sort-merge-bucket) JOIN: orders and customers are written
    ONCE as co-bucketed sorted layouts on the customer key (same entity
    hash ⇒ partition k joins partition k), then the join runs with ZERO
    query-time exchange — one local pa.Table.join per partition pair
    (stages/streaming.streaming_equi_join). Bucket at ingest, join
    forever for free: the lakehouse answer to the repeated
    fact-dimension join. Output at order grain, price in cents."""
    from pymhealth_ray.stages.streaming import streaming_equi_join

    orders = read_table(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def o_prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "o_totalprice", "price_c")
        return pa.table({"custkey": b["o_custkey"],
                         "o_orderkey": b["o_orderkey"],
                         "price_c": b["price_c"]})

    cust = read_table(f"{sf_dir}/customer.parquet",
                      columns=["c_custkey", "c_mktsegment"])

    def c_prep(b: pa.Table) -> pa.Table:
        return pa.table({"custkey": b["c_custkey"],
                         "segment": b["c_mktsegment"]})

    lo = _keyed_layout(sf_dir, orders.map_batches(o_prep,
                                                  batch_format="pyarrow"),
                       key_col="custkey", tag="orders")
    lc = _keyed_layout(sf_dir, cust.map_batches(c_prep,
                                                batch_format="pyarrow"),
                       key_col="custkey", tag="cust")
    out = streaming_equi_join(lo, lc, key_col="custkey")
    return out.map_batches(
        lambda b: pa.table({"o_orderkey": b["o_orderkey"],
                            "custkey": b["custkey"],
                            "segment": b["segment"],
                            "price_c": b["price_c"]}),
        batch_format="pyarrow")


SQL_ORDERS_SMB_JOIN = """
SELECT o.o_orderkey, o.o_custkey AS custkey, c.c_mktsegment AS segment,
       CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_c
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
"""


def q_embed_rerank(sf_dir: str):
    """RETRIEVE-THEN-RERANK: exact cosine top-20 per query (stage one)
    rescored pairwise by a batched actor-pool cross-encoder (stage two —
    model state per actor, inference per batch; stages/rerank.py). The
    scorer is the deterministic md5 stub (no ML runtime in-container),
    which is exactly what makes the WHOLE serving pipeline — candidate
    fan-in, actor batching, rank reassembly — SQL-gateable bit-for-bit."""
    import pyarrow.parquet as pq_mod

    from pymhealth_ray.stages import ann
    from pymhealth_ray.stages.rerank import rerank_candidates

    ds = read_table(f"{sf_dir}/embeddings.parquet",
                    columns=["vec_id", "embedding"])
    full = pq_mod.read_table(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
    queries = full.filter(pc.less(full["vec_id"], 8))
    cands = ann.knn_bruteforce(ds, queries, k=20, metric="cosine")
    return rerank_candidates(cands, salt="xe")


SQL_EMBED_RERANK = """
WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings WHERE vec_id < 8),
n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
a AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY list_cosine_similarity(q.e, n.e) DESC,
                                         n.vec_id) AS rnk
      FROM q CROSS JOIN n WHERE q.vec_id <> n.vec_id),
c AS (SELECT query_id, neighbor_id,
             substr(md5(query_id || ':' || neighbor_id || '-xe'), 1, 8)
               AS score
      FROM a WHERE rnk <= 20)
SELECT query_id, neighbor_id, score,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, neighbor_id)
            AS BIGINT) AS rank
FROM c
"""


def q_events_daily_top_types(sf_dir: str):
    """TRENDING report: each day's top-3 event types by exact spend —
    the daily-leaderboard shape. Partial per-group sums map-side, one
    tiny (day, type) rollup, then distributed top-k with map-side
    pruning (grouped_topk: the exchange carries ≤ k rows per group per
    block). All-integer; rank ties break on type."""
    from pymhealth_ray.stages.aggregate import grouped_stats, grouped_topk

    ev = _events(sf_dir, ["ts", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "val_c")
        ts = b["ts_us"].to_numpy(zero_copy_only=False)
        return pa.table({"day": pa.array(ts // 86_400_000_000),
                         "event_type": b["event_type"],
                         "val_c": b["val_c"]})

    agg = grouped_stats(ev.map_batches(prep, batch_format="pyarrow"),
                        ["day", "event_type"], sum_cols=["val_c"])
    day_type = agg.map_batches(
        lambda b: pa.table({"day": b["day"],
                            "event_type": b["event_type"],
                            "spend_c": b["val_c_sum"].cast(pa.int64())}),
        batch_format="pyarrow")
    return grouped_topk(day_type, ["day"], "spend_c", k=3,
                        tie_cols=["event_type"], rank_name="rnk",
                        num_buckets=NB)


SQL_EVENTS_DAILY_TOP_TYPES = """
WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day, event_type,
                  CAST(round(value * 100) AS BIGINT) AS val_c FROM events),
a AS (SELECT day, event_type, CAST(sum(val_c) AS BIGINT) AS spend_c
      FROM e GROUP BY 1, 2),
r AS (SELECT day, event_type, spend_c,
             CAST(row_number() OVER (PARTITION BY day
                                     ORDER BY spend_c DESC, event_type)
                  AS BIGINT) AS rnk
      FROM a)
SELECT day, event_type, spend_c, rnk FROM r WHERE rnk <= 3
"""


def _docs_phash_media(b: pa.Table) -> pa.Table:
    """Image payloads with SEEDED near-duplicates: docs with
    doc_id % 7 == 3 carry a lightly-perturbed copy of doc_id−1's image
    (the synthetic corpus has no natural visual near-dups — same
    convention as seq_minhash_dupes; the oracle builds the identical
    table single-process)."""
    ids = b["doc_id"].to_numpy(zero_copy_only=False)
    payloads = []
    for i in ids:
        i = int(i)
        if i % 7 == 3 and i > 0:
            # rebuild doc_id−1's RAW uint8 plane (the PNM parser
            # normalizes to [0,1] floats — perturb bytes, not floats)
            rng = np.random.default_rng((i - 1) + 31)
            w = int(16 + ((i - 1) % 17))
            h = int(16 + ((i - 1) % 13))
            pix = rng.integers(0, 256, (h, w), dtype=np.uint8).copy()
            pix[:2, :2] = np.clip(pix[:2, :2].astype(np.int64) + 1,
                                  0, 255).astype(np.uint8)
            payloads.append(f"P5\n{w} {h}\n255\n".encode() + pix.tobytes())
        else:
            payloads.append(_synth_pnm(i)[0])
    return pa.table({"doc_id": b["doc_id"],
                     "payload": pa.array(payloads, type=pa.binary())})


def q_docs_phash_dupes(sf_dir: str):
    """PERCEPTUAL image dedup (9th dedup modality): binary image
    payloads → actor-pool pHash (32² resample → pure-numpy 2-D DCT-II →
    64-bit median-threshold signature, stages/multimodal.phash64) →
    pigeonhole-complete Hamming-ball pairs over the banded signature
    (stages/dedup.hamming_ball_pairs — the machinery SimHash uses,
    applied to a different modality). Seeded perturbed copies are the
    ground truth; oracle replays everything single-process."""
    from pymhealth_ray.stages.dedup import hamming_ball_pairs
    from pymhealth_ray.stages.multimodal import phash_images

    docs = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    media = docs.map_batches(_docs_phash_media, batch_format="pyarrow")
    sigs = phash_images(media)
    # num_bands=8 → 8-bit bands (256 values): size the bucket cap to the
    # corpus so the pigeonhole completeness is not silently voided
    return hamming_ball_pairs(sigs, sig_col="phash", max_hamming=6,
                              num_bands=8, num_buckets=NB,
                              max_bucket_size=65536)


def _phash_dupes_expected(df):
    import pandas as pd

    from pymhealth_ray.stages.multimodal import ImagePHasher

    tbl = pa.table({"doc_id": pa.array(df["doc_id"].tolist(),
                                       type=pa.int64())})
    media = _docs_phash_media(tbl)
    sigs = ImagePHasher()(media)
    ids = sigs["doc_id"].to_numpy(zero_copy_only=False)
    ph = sigs["phash"].to_numpy(zero_copy_only=False).view(np.uint64)
    ia, ib = np.triu_indices(len(ids), k=1)
    x = ph[ia] ^ ph[ib]
    h = np.zeros(len(x), dtype=np.int64)
    for _ in range(64):
        h += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    keep = h <= 6
    a, bb = ids[ia[keep]], ids[ib[keep]]
    lo, hi = np.minimum(a, bb), np.maximum(a, bb)
    order = np.lexsort((hi, lo))
    return pd.DataFrame({"id_a": lo[order], "id_b": hi[order],
                         "hamming": h[keep][order]})


def q_item_similarity_topk(sf_dir: str):
    """ITEM-ITEM collaborative filtering: for every part, the 5 most
    similar parts by basket Jaccard — c_ab / (c_a + c_b − c_ab) over
    customer purchase sets. Edges and per-item counts are exact int64
    (cooccurrence_edges + keyed_sum); each edge explodes into both
    directed rows, similarity is ONE int/int IEEE division (bit-exact vs
    SQL), and the leaderboard is the map-side-pruned distributed top-k.
    The classic recommender precompute, cluster-resident end to end."""
    from pymhealth_ray.stages.aggregate import grouped_stats, grouped_topk, keyed_sum
    from pymhealth_ray.stages.dropset import lookup_with_default
    from pymhealth_ray.stages.join import equi_join
    from pymhealth_ray.stages.triangles import cooccurrence_edges

    orders = read_table(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    li = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_orderkey", "l_partkey"])
    li = li.map_batches(
        lambda b: pa.table({"o_orderkey": b["l_orderkey"],
                            "p": b["l_partkey"]}),
        batch_format="pyarrow").materialize()  # probe + join consume it
    st = grouped_stats(li.map_batches(
        lambda b: pa.table({"one": pa.array(
            np.zeros(b.num_rows, dtype=np.int8)), "p": b["p"]}),
        batch_format="pyarrow"), ["one"], max_cols=["p"]).take_all()
    mx = int(st[0]["p_max"])
    ub = equi_join(li, orders, on="o_orderkey", num_buckets=NB)
    ub = ub.map_batches(
        lambda b: pa.table({"u": b["o_custkey"], "p": b["p"]}),
        batch_format="pyarrow").materialize()

    edges = cooccurrence_edges(ub, "u", "p", max_item=mx, num_buckets=NB)

    # exact distinct-user count per item: one bucket pass emits distinct
    # (u, p) partials, keyed_sum folds them
    def distinct_up(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"p": pa.array([], type=pa.int64()),
                             "one": pa.array([], type=pa.int64())})
        K = mx + 1
        u = tbl["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = tbl["p"].to_numpy(zero_copy_only=False).astype(np.int64)
        _, inv = np.unique(u, return_inverse=True)
        uniq = np.unique(inv.astype(np.int64) * K + p)
        return pa.table({"p": pa.array(uniq % K),
                         "one": pa.array(np.ones(len(uniq),
                                                 dtype=np.int64))})

    from pymhealth_ray.stages.partition import grouped_by_bucket
    cnt = keyed_sum(grouped_by_bucket(ub, distinct_up, entity_col="u",
                                      num_buckets=NB),
                    "p", ["one"], num_buckets=NB,
                    precombine_rows=None).materialize()

    def explode(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False)
        bb = b["b"].to_numpy(zero_copy_only=False)
        w = b["w"].to_numpy(zero_copy_only=False)
        return pa.table({"item": pa.array(np.concatenate([a, bb])),
                         "other": pa.array(np.concatenate([bb, a])),
                         "w": pa.array(np.concatenate([w, w]))})

    both = edges.map_batches(explode, batch_format="pyarrow")
    both = lookup_with_default(both, "item", cnt, "p", "one", "ca",
                               num_buckets=NB)
    both = lookup_with_default(both, "other", cnt, "p", "one", "cb",
                               num_buckets=NB)

    def jac(b: pa.Table) -> pa.Table:
        w = b["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        ca = b["ca"].to_numpy(zero_copy_only=False).astype(np.int64)
        cb = b["cb"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"item": b["item"], "other": b["other"],
                         "w": pa.array(w),
                         "jac": pa.array(w.astype(np.float64)
                                         / (ca + cb - w))})

    scored = both.map_batches(jac, batch_format="pyarrow")
    return grouped_topk(scored, ["item"], "jac", k=5,
                        tie_cols=["other"], rank_name="rnk",
                        num_buckets=NB)


SQL_ITEM_SIMILARITY_TOPK = """
WITH ub AS (SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS p
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
cnt AS (SELECT p, CAST(count(*) AS BIGINT) AS c FROM ub GROUP BY p),
e AS (SELECT x.p AS a, y.p AS b, CAST(count(*) AS BIGINT) AS w
      FROM ub x JOIN ub y ON y.u = x.u AND y.p > x.p GROUP BY 1, 2),
dir AS (SELECT a AS item, b AS other, w FROM e
        UNION ALL SELECT b, a, w FROM e),
j AS (SELECT d.item, d.other, d.w,
             CAST(d.w AS DOUBLE) / (ca.c + cb.c - d.w) AS jac
      FROM dir d JOIN cnt ca ON ca.p = d.item
                 JOIN cnt cb ON cb.p = d.other),
r AS (SELECT item, other, w, jac,
             CAST(row_number() OVER (PARTITION BY item
                                     ORDER BY jac DESC, other)
                  AS BIGINT) AS rnk
      FROM j)
SELECT item, other, w, jac, rnk FROM r WHERE rnk <= 5
"""


def _table_materialized_oracle(sf_dir: str, table: str, name: str, builder,
                               columns) -> str:
    """Materialized-oracle helper over an arbitrary testdata TABLE —
    the _docs_materialized_oracle pattern, parameterized by table."""
    import os

    from pymhealth_ray.sources.generate import fixture_dir_for

    out_dir = fixture_dir_for(sf_dir).rstrip("/") + f"_{table}_oracle"
    out_path = os.path.join(out_dir, f"{name}.parquet")
    if not os.path.exists(out_path):
        os.makedirs(out_dir, exist_ok=True)
        _PENDING_ORACLES.append((f"{sf_dir}/{table}.parquet", out_path,
                                 builder, list(columns), True, 1))
    return f"SELECT * FROM read_parquet('{out_path}')"


def q_lineitem_join_estimate(sf_dir: str):
    """OPTIMIZER STATISTICS: estimate the self-equi-join cardinality of
    lineitem on orderkey with a count-min sketch INNER PRODUCT
    (est = min_d Σ_w cms[d,w]² — the classic AMS/CMS join-size bound,
    always ≥ truth) next to the exact Σ c(k)² (keyed_sum). The sketch
    is a fixed-size mergeable array — the only thing that crosses the
    cluster — which is why this is THE join-size primitive at 100 TB.
    One row out: (exact_pairs, cms_estimate, ratio)."""
    from pymhealth_ray.stages.aggregate import grouped_stats, keyed_sum
    from pymhealth_ray.stages.sketch import build_count_min

    li = read_table(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"])
    li = li.materialize()  # consumed by the sketch AND the exact count
    cms = build_count_min(li, "l_orderkey")
    est = int(np.min((cms.astype(np.float64) ** 2).sum(axis=1)))

    counts = keyed_sum(li.map_batches(
        lambda b: pa.table({"k": b["l_orderkey"],
                            "one": pa.array(np.ones(b.num_rows,
                                                    dtype=np.int64))}),
        batch_format="pyarrow"), "k", ["one"], num_buckets=NB,
        precombine_rows=None)
    sq = grouped_stats(counts.map_batches(
        lambda b: pa.table({"one2": pa.array(
            np.zeros(b.num_rows, dtype=np.int8)),
            "c2": pa.array(b["one"].to_numpy(zero_copy_only=False) ** 2)}),
        batch_format="pyarrow"), ["one2"], sum_cols=["c2"]).take_all()
    exact = int(sq[0]["c2_sum"])
    return pa.table({
        "exact_pairs": pa.array([exact], type=pa.int64()),
        "cms_estimate": pa.array([est], type=pa.int64()),
        "ratio": pa.array([float(est) / float(exact)], type=pa.float64()),
    })


def _join_estimate_expected(df):
    import pandas as pd

    from pymhealth_ray.stages.sketch import _cms_rows

    col = pa.array(df["l_orderkey"].to_numpy(), type=pa.int64())
    cms = _cms_rows(col, 1 << 14, 4)
    est = int(np.min((cms.astype(np.float64) ** 2).sum(axis=1)))
    c = df["l_orderkey"].value_counts().to_numpy().astype(np.int64)
    exact = int((c * c).sum())
    return pd.DataFrame({"exact_pairs": [exact], "cms_estimate": [est],
                         "ratio": [float(est) / float(exact)]})


def _seed_trunc_copies(b: pa.Table) -> pa.Table:
    """Append a half-length TRUNCATED copy of every 89th-hashed row: the
    synthetic corpus has no natural truncation dups. Map-local and
    deterministic; the oracle derives the identical rows in SQL."""
    ts = b["ts_ns"].to_numpy(zero_copy_only=False)
    toks = b["tokens"].combine_chunks() if isinstance(
        b["tokens"], pa.ChunkedArray) else b["tokens"]
    off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n = np.diff(off)
    pick = np.flatnonzero((ts % 89 == 0) & (n >= 8))
    base = pa.table({"doc_id": b["doc_id"], "tokens": toks})
    if not len(pick):
        return base
    copies = []
    for i in pick.tolist():
        t = toks[i].as_py()
        copies.append(t[: len(t) // 2])
    dup = pa.table({
        "doc_id": pa.array([f"{v}~trunc" for v in
                            b["doc_id"].take(pa.array(pick)).to_pylist()]),
        "tokens": pa.array(copies, type=toks.type),
    })
    return pa.concat_tables([base, dup]).combine_chunks()


def q_seq_prefix_dupes(sf_dir: str):
    """TRUNCATION dedup over token sequences (10th dedup modality):
    pairs where one sequence is a strict PREFIX of another — the
    same-page-cut-at-different-lengths shape. Power-of-two-level prefix
    hashing (O(rows·log max_len) slim fan-out) + an in-bucket
    sort-adjacency prefix-stack scan (stages/dedup.prefix_dupes). Seeded
    half-length copies are the ground truth; the oracle derives the
    identical seeded table and match in pure SQL."""
    from pymhealth_ray.stages.dedup import prefix_dupes

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "tokens"])
    seeded = ds.map_batches(_seed_trunc_copies, batch_format="pyarrow")
    return prefix_dupes(seeded, num_buckets=NB)


def sql_seq_prefix_dupes(path: str) -> str:
    return f"""
WITH base AS (SELECT doc_id, ts_ns, tokens, len(tokens) AS n
              FROM read_parquet('{path}/part-*.parquet')),
seeded AS (SELECT doc_id, tokens, n FROM base
           UNION ALL
           SELECT doc_id || '~trunc' AS doc_id,
                  tokens[1:CAST(n // 2 AS BIGINT)] AS tokens,
                  n // 2 AS n
           FROM base WHERE ts_ns % 89 = 0 AND n >= 8),
lens AS (SELECT DISTINCT n FROM seeded),
fulls AS (SELECT doc_id, n, md5(array_to_string(tokens, ',')) AS h
          FROM seeded),
cands AS (SELECT s.doc_id AS long_id, l.n AS L,
                 md5(array_to_string(s.tokens[1:CAST(l.n AS BIGINT)], ','))
                   AS h
          FROM seeded s JOIN lens l ON l.n < s.n)
SELECT f.doc_id AS short_id, c.long_id
FROM fulls f JOIN cands c ON c.L = f.n AND c.h = f.h
"""


def _fano_exact(n: np.ndarray, s: np.ndarray, sq: np.ndarray) -> np.ndarray:
    """(n·sq − s²) / (n·s) with the HUGEINT semantics SQL uses: the int
    products are exact, only the final cast to DOUBLE rounds. Vectorized
    int64 fast path; rows whose products could exceed 2⁶² finish in
    arbitrary-precision python ints (ADVICE r4 overflow guard)."""
    num = n * sq - s * s
    den = n * s
    big = ((np.abs(sq) >= 2 ** 62 // np.maximum(n, 1))
           | (np.abs(s) >= np.int64(3_037_000_499)))
    if big.any():
        f = num.astype(np.float64) / den.astype(np.float64)
        for i in np.flatnonzero(big):
            ni, si, qi = int(n[i]), int(s[i]), int(sq[i])
            f[i] = float(ni * qi - si * si) / float(ni * si)
        return f
    return num.astype(np.float64) / den.astype(np.float64)


def q_events_burstiness(sf_dir: str):
    """Per-user BURSTINESS (Fano factor) of hourly activity: variance /
    mean of the user's per-hour event counts, over their observed hours.
    fano = (n·Σc² − (Σc)²) / (n·Σc): exact int64 all the way to ONE IEEE
    division (bit-exact vs SQL). Two bucketed exchanges: packed
    (user, hour) counts via keyed_sum, then per-user moment rollup."""
    from pymhealth_ray.stages.aggregate import keyed_agg, keyed_sum

    HOUR = 3_600_000_000
    ev = _events(sf_dir, ["user_id", "ts"])
    st = grouped_stats(ev.map_batches(
        lambda b: pa.table({"one": pa.array(
            np.zeros(b.num_rows, dtype=np.int8)),
            "user_id": b["user_id"], "ts_us": b["ts_us"]}),
        batch_format="pyarrow"), ["one"],
        max_cols=["user_id", "ts_us"]).take_all()
    K = int(st[0]["user_id_max"]) + 1
    hmax = int(st[0]["ts_us_max"]) // HOUR
    if hmax * K + (K - 1) >= 2 ** 63:  # python ints — no silent wrap
        raise ValueError(
            f"events_burstiness: packed (hour·K+user) key overflows "
            f"int64 (K={K}, max hour={hmax}); re-id users densely")

    def pack(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = b["ts_us"].to_numpy(zero_copy_only=False) // HOUR
        return pa.table({"uh": pa.array(h * K + u),
                         "one": pa.array(np.ones(b.num_rows,
                                                 dtype=np.int64))})

    per_hour = keyed_sum(ev.map_batches(pack, batch_format="pyarrow"),
                         "uh", ["one"], num_buckets=NB,
                         precombine_rows=None)

    def unpack(b: pa.Table) -> pa.Table:
        uh = b["uh"].to_numpy(zero_copy_only=False)
        c = b["one"].to_numpy(zero_copy_only=False)
        return pa.table({"user_id": pa.array(uh % K),
                         "n": pa.array(np.ones(len(c), dtype=np.int64)),
                         "s": pa.array(c), "sq": pa.array(c * c)})

    mom = keyed_agg(per_hour.map_batches(unpack, batch_format="pyarrow"),
                    "user_id", {"n": "sum", "s": "sum", "sq": "sum"},
                    num_buckets=NB, precombine_rows=None)

    def fano(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = b["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        sq = b["sq"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "user_id": b["user_id"],
            "n_hours": pa.array(n),
            "n_events": pa.array(s),
            "fano": pa.array(_fano_exact(n, s, sq)),
        })

    return mom.map_batches(fano, batch_format="pyarrow")


SQL_EVENTS_BURSTINESS = """
WITH e AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hour
           FROM events),
hc AS (SELECT user_id, hour, CAST(count(*) AS BIGINT) AS c
       FROM e GROUP BY 1, 2),
m AS (SELECT user_id, CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(c) AS HUGEINT) AS s,
             CAST(sum(c * c) AS HUGEINT) AS sq
      FROM hc GROUP BY user_id)
SELECT user_id, CAST(n AS BIGINT) AS n_hours, CAST(s AS BIGINT) AS n_events,
       CAST(n * sq - s * s AS DOUBLE) / CAST(n * s AS DOUBLE) AS fano
FROM m
"""


def q_events_change_feed(sf_dir: str):
    """CDC CHANGE FEED between MVCC versions of a zonemapped layout
    (io.zonemap_change_feed — the Delta/Iceberg ``table_changes``
    shape): base write (v0) → copy-on-write UPSERT of updates+inserts
    (v1) → bloom-pruned DELETE (v2), then the feed diffs v0→current and
    emits insert/delete/update rows only. Files shared by both
    manifests are pruned from BOTH sides before any read (rewrites
    rename, so a shared name is byte-identical); the surviving files'
    unchanged rows drop out of one co-partitioned full-outer join. A
    key updated in v1 then deleted in v2 correctly surfaces as a
    single ``delete`` against its v0 value."""
    import shutil
    import tempfile

    from pymhealth_ray.sources.io import (delete_zonemapped,
                                          upsert_zonemapped,
                                          write_zonemapped,
                                          zonemap_change_feed)

    zdir = os.path.join(tempfile.gettempdir(), "pymhealth_ray_out",
                        f"change_feed_{os.path.basename(sf_dir)}")
    with _build_lock(zdir):
        shutil.rmtree(zdir, ignore_errors=True)
        ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])

        def prep(b: pa.Table) -> pa.Table:
            b = _cents(b, "value", "val_c")
            return b.select(["event_id", "user_id", "ts_us", "val_c"])

        base = ds.map_batches(prep, batch_format="pyarrow").materialize()
        write_zonemapped(
            base.map_batches(lambda b: b.drop_columns(["user_id"]),
                             batch_format="pyarrow"),
            zdir, "ts_us", num_files=32, bloom_cols=["event_id"])

        def delta_of(b: pa.Table) -> pa.Table:
            eid = b["event_id"].to_numpy(zero_copy_only=False)
            uid = b["user_id"].to_numpy(zero_copy_only=False)
            upd = b.filter(pa.array(eid % 53 == 0))
            upd = pa.table({"event_id": upd["event_id"],
                            "ts_us": upd["ts_us"],
                            "val_c": pc.add(upd["val_c"], 999)})
            ins = b.filter(pa.array(uid % 41 == 3))
            ins = pa.table({"event_id": pc.add(ins["event_id"],
                                               10_000_000),
                            "ts_us": ins["ts_us"],
                            "val_c": pc.multiply(ins["val_c"], 2)})
            return pa.concat_tables([upd, ins])

        delta = pa.concat_tables(
            ray.get(base.map_batches(delta_of, batch_format="pyarrow",
                                     batch_size=None).to_arrow_refs()))
        upsert_zonemapped(zdir, delta.combine_chunks(), "event_id",
                          "ts_us")  # -> version 1

        def del_keys_of(b: pa.Table) -> pa.Table:
            eid = b["event_id"].to_numpy(zero_copy_only=False)
            return b.filter(pa.array(eid % 71 == 0)).select(["event_id"])

        del_keys = pa.concat_tables(
            ray.get(base.map_batches(del_keys_of, batch_format="pyarrow",
                                     batch_size=None).to_arrow_refs()))
        delete_zonemapped(zdir, "event_id",
                          del_keys["event_id"].combine_chunks())  # -> v2

        feed = zonemap_change_feed(zdir, "event_id", from_version=0,
                                   compare_cols=["val_c"],
                                   num_buckets=NB)
        feed = feed.map_batches(
            lambda b: pa.table({"event_id": b["event_id"],
                                "change": b["change"],
                                "old_val_c": b["old_val_c"],
                                "new_val_c": b["new_val_c"]}),
            batch_format="pyarrow").materialize()
    return feed


SQL_EVENTS_CHANGE_FEED = """
WITH base AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                     CAST(round(value * 100) AS BIGINT) AS val_c
              FROM events),
newt AS (
  SELECT event_id,
         CASE WHEN event_id % 53 = 0 THEN val_c + 999 ELSE val_c END
           AS val_c
  FROM base WHERE event_id % 71 <> 0
  UNION ALL
  SELECT event_id + 10000000 AS event_id, val_c * 2 AS val_c
  FROM base WHERE user_id % 41 = 3),
oldt AS (SELECT event_id, val_c FROM base)
SELECT COALESCE(o.event_id, n.event_id) AS event_id,
       CASE WHEN n.event_id IS NULL THEN 'delete'
            WHEN o.event_id IS NULL THEN 'insert'
            ELSE 'update' END AS change,
       o.val_c AS old_val_c, n.val_c AS new_val_c
FROM oldt o FULL OUTER JOIN newt n ON o.event_id = n.event_id
WHERE o.event_id IS NULL OR n.event_id IS NULL OR o.val_c <> n.val_c
"""


def _kcore_expected(df):
    """Exact coreness of the item co-purchase graph, single-process:
    distinct within-order part pairs -> Batagelj-Zaveršnik peel."""
    import pandas as pd

    from pymhealth_ray.stages.graph import coreness_peel_exact
    from pymhealth_ray.stages.triangles import segment_pairs

    d = df.drop_duplicates().sort_values(["l_orderkey", "l_partkey"])
    o = d.l_orderkey.to_numpy()
    p = d.l_partkey.to_numpy().astype(np.int64)
    starts = np.flatnonzero(np.r_[True, o[1:] != o[:-1]])
    lens = np.diff(np.append(starts, len(o)))
    fi, se = segment_pairs(lens)
    K = int(p.max()) + 1
    pk = np.unique(np.minimum(p[fi], p[se]) * K
                   + np.maximum(p[fi], p[se]))
    nodes, core = coreness_peel_exact(pk // K, pk % K)
    return pd.DataFrame({"p_partkey": nodes, "core": core})


def q_part_kcore(sf_dir: str):
    """CORE DECOMPOSITION of the item co-purchase graph: parts are
    nodes, an edge joins two parts bought together in some order, and
    each part reports its k-core number — the standard density measure
    for community mining / influence pruning. Edges dedupe through the
    packed-key exchange (stages/triangles.cooccurrence_edges); coreness
    runs the hybrid plan (stages/graph.coreness): exact O(m) driver
    peel under the edge threshold, distributed H-INDEX ITERATION above
    it (c0=deg, c(v) <- H of neighbor values; monotone fixpoint ==
    coreness — Lü et al. 2016), each round two co-partitioned
    exchanges over narrow (node, value) rows. Oracle: materialized
    single-process peel."""
    from pymhealth_ray.stages.graph import coreness
    from pymhealth_ray.stages.triangles import cooccurrence_edges

    li = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_orderkey", "l_partkey"])
    st = grouped_stats(li.map_batches(
        lambda b: pa.table({"one": pa.array(
            np.zeros(b.num_rows, dtype=np.int8)),
            "l_partkey": b["l_partkey"]}),
        batch_format="pyarrow"), ["one"],
        max_cols=["l_partkey"]).take_all()
    mx = int(st[0]["l_partkey_max"])
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey", max_item=mx,
                               num_buckets=NB)
    out = coreness(edges, num_buckets=NB)
    return out.map_batches(
        lambda b: pa.table({"p_partkey": b["node"], "core": b["core"]}),
        batch_format="pyarrow")


def q_seq_scrub_tokens(sf_dir: str):
    """STOPWORD SCRUB of the tokenized corpus: the global top-20 most
    frequent token ids (count desc, id asc — exact keyed_sum counts;
    the counts table is bounded by vocabulary size, not corpus size,
    so the driver top-k is a bounded partial) are removed from every
    sequence with one broadcast np.isin map (stages/vocab.scrub_tokens
    — zero exchange on the corpus itself). Emits per-row kept/removed
    counts and the md5 of the scrubbed id sequence, matching the SQL
    list_filter oracle byte-for-byte."""
    import hashlib as _hl

    from pymhealth_ray.stages.aggregate import keyed_sum
    from pymhealth_ray.stages.dedup import tokens_join_key
    from pymhealth_ray.stages.vocab import scrub_tokens

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "tokens"])
    ds = ds.materialize()  # consumed by the count pass AND the scrub

    def tok_partial(b: pa.Table) -> pa.Table:
        col = b["tokens"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        vals, cnts = np.unique(flat, return_counts=True)
        return pa.table({"tok": pa.array(vals),
                         "c": pa.array(cnts.astype(np.int64))})

    counts = keyed_sum(
        ds.map_batches(tok_partial, batch_format="pyarrow",
                       batch_size=None),
        "tok", ["c"], num_buckets=NB).take_all()
    tok = np.array([r["tok"] for r in counts], dtype=np.int64)
    c = np.array([r["c"] for r in counts], dtype=np.int64)
    order = np.lexsort((tok, -c))[:20]
    stop = tok[order]

    scrubbed = scrub_tokens(ds, stop)

    def finish(b: pa.Table) -> pa.Table:
        col = b["tokens"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n0 = pc.list_value_length(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        kept = b["tokens_kept"]
        if isinstance(kept, pa.ChunkedArray):
            kept = kept.combine_chunks()
        nk = pc.list_value_length(kept).to_numpy(
            zero_copy_only=False).astype(np.int64)
        joined = tokens_join_key(kept)
        md5 = [_hl.md5(s.encode()).hexdigest()
               for s in joined.to_pylist()]
        return pa.table({
            "doc_id": b["doc_id"], "ts_ns": b["ts_ns"],
            "n_kept": pa.array(nk), "n_removed": pa.array(n0 - nk),
            "scrub_md5": pa.array(md5, type=pa.string()),
        })

    return scrubbed.map_batches(finish, batch_format="pyarrow")


def sql_seq_scrub_tokens(path: str) -> str:
    return f"""
WITH t AS (SELECT unnest(tokens) AS tok
           FROM read_parquet('{path}/part-*.parquet')),
top AS (SELECT tok FROM (SELECT tok, count(*) AS c FROM t GROUP BY tok
                         ORDER BY c DESC, tok ASC LIMIT 20)),
st AS (SELECT list(tok) AS stop FROM top),
s AS (SELECT doc_id, ts_ns, len(tokens) AS n0,
             list_filter(tokens, x -> NOT list_contains(stop, x)) AS kept
      FROM read_parquet('{path}/part-*.parquet'), st)
SELECT doc_id, ts_ns,
       CAST(len(kept) AS BIGINT) AS n_kept,
       CAST(n0 - len(kept) AS BIGINT) AS n_removed,
       md5(COALESCE(array_to_string(kept, ','), '')) AS scrub_md5
FROM s
"""


def q_docs_audio_vad(sf_dir: str):
    """Energy-threshold VOICE-ACTIVITY DETECTION over real PCM WAV
    clips (stages/multimodal.AudioVAD, actor pool): per doc the clip
    frames into 200-sample windows, active = RMS energy above the
    clip mean, and the summary emits frame counts, longest active run
    and zero-crossings inside active frames — the silence-trim /
    speech-rate shape of an audio curation pipeline. All-integer
    output; the oracle replays the same deterministic decode
    single-process."""
    from pymhealth_ray.stages.multimodal import audio_vad

    docs = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    media = docs.map_batches(_docs_wav_table, batch_format="pyarrow")
    return audio_vad(media).map_batches(
        lambda b: b.select(["doc_id", "n_frames", "n_active",
                            "longest_active", "zc_active"]),
        batch_format="pyarrow")


def _audio_vad_expected(df):
    import pandas as pd

    from pymhealth_ray.stages.multimodal import AudioVAD

    tbl = pa.table({"doc_id": pa.array(df["doc_id"].tolist(),
                                       type=pa.int64())})
    out = AudioVAD()(_docs_wav_table(tbl))
    return pd.DataFrame({
        "doc_id": df["doc_id"].tolist(),
        "n_frames": out["n_frames"].to_numpy(),
        "n_active": out["n_active"].to_numpy(),
        "longest_active": out["longest_active"].to_numpy(),
        "zc_active": out["zc_active"].to_numpy(),
    })


def q_lineitem_weighted_median(sf_dir: str):
    """Per-flag EXACT WEIGHTED MEDIAN price (weight = quantity): the
    robust 'typical unit price' statistic. Exchange carries the (flag,
    price) weight histogram (stages/aggregate.grouped_weighted_median
    — the grouped_quantiles combiner with Σweight partials); the lower
    weighted median (min price with 2·cumw >= totw) compares in
    integers, so both sides are fraction-free and hash-exact."""
    from pymhealth_ray.stages.aggregate import grouped_weighted_median

    li = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_returnflag", "l_extendedprice",
                             "l_quantity"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "l_extendedprice", "price_c")
        q = b["l_quantity"].to_numpy(zero_copy_only=False)
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "price_c": b["price_c"],
            "qty": pa.array(np.rint(q).astype(np.int64)),
        })

    wm = grouped_weighted_median(
        li.map_batches(prep, batch_format="pyarrow"),
        ["l_returnflag"], "price_c", "qty", num_buckets=8,
        out_name="wmedian_price_c", total_name="total_qty")
    return wm


SQL_LINEITEM_WEIGHTED_MEDIAN = """
WITH g AS (SELECT l_returnflag,
                  CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
                  CAST(round(l_quantity) AS BIGINT) AS qty
           FROM lineitem),
a AS (SELECT l_returnflag, price_c, CAST(sum(qty) AS BIGINT) AS w
      FROM g GROUP BY l_returnflag, price_c),
c AS (SELECT l_returnflag, price_c,
             CAST(sum(w) OVER (PARTITION BY l_returnflag
                               ORDER BY price_c) AS BIGINT) AS cw,
             CAST(sum(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tw
      FROM a)
SELECT l_returnflag, CAST(min(price_c) AS BIGINT) AS wmedian_price_c,
       CAST(min(tw) AS BIGINT) AS total_qty
FROM c WHERE 2 * cw >= tw GROUP BY l_returnflag
"""


def q_docs_search_and(sf_dir: str):
    """SERVING-SHAPED conjunctive retrieval: a persisted search index
    (stages/index.write_search_index — posting lists partitioned by
    term hash, doc lengths by doc hash, corpus stats in _meta.json,
    built once per corpus) answers an AND-of-terms BM25 top-10 by
    opening ONLY the query terms' posting buckets and the candidates'
    doc-length buckets — query cost ∝ posting-list sizes, never the
    corpus. Scoring is the same k1=1.5/b=0.75 BM25 as docs_bm25;
    ranking key round(score,6) with doc-id tie-break."""
    import tempfile

    from pymhealth_ray.stages.index import (search_conjunctive,
                                            write_search_index)

    idir = os.path.join(tempfile.gettempdir(), "pymhealth_ray_searchidx",
                        f"{os.path.basename(sf_dir)}_v1")
    with _build_lock(idir):
        if not os.path.exists(os.path.join(idir, "_meta.json")):
            docs = read_table(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])
            write_search_index(docs, idir, num_term_buckets=NB,
                               num_doc_buckets=8)
    return search_conjunctive(idir, list(_BM25_QUERY_TERMS), k=10)


SQL_DOCS_SEARCH_AND = f"""
WITH w AS (
  SELECT doc_id, t AS term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
  WHERE t <> ''
), dl AS (
  SELECT doc_id, count(*) AS dl FROM w GROUP BY doc_id
), st AS (
  SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl
), q(term) AS (
  VALUES {", ".join(f"('{t}')" for t in _BM25_QUERY_TERMS)}
), df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM w JOIN q USING (term)
  GROUP BY term
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM w JOIN q USING (term)
  GROUP BY doc_id, term
), cand AS (
  SELECT doc_id FROM tf GROUP BY doc_id
  HAVING count(DISTINCT term) = (SELECT count(*) FROM q)
), sc AS (
  SELECT tf.doc_id,
         sum(ln((st.n - df.df + 0.5) / (df.df + 0.5) + 1) *
             (tf.tf * 2.5) /
             (tf.tf + 1.5 * (0.25 + 0.75 * (dl.dl / st.avgdl)))) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  WHERE tf.doc_id IN (SELECT doc_id FROM cand)
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score, 6) AS score,
       CAST(row_number() OVER (ORDER BY round(score, 6) DESC, doc_id)
            AS BIGINT) AS rn
FROM sc
QUALIFY rn <= 10
"""


def q_events_psi_drift(sf_dir: str):
    """DISTRIBUTION-DRIFT REPORT (PSI): per event_type, the value
    histogram of the first time half vs the second over 10 fixed
    equi-width bins, one row per (type, bin) with both counts and the
    add-one-smoothed POPULATION STABILITY INDEX term
    (p−q)·ln(p/q) — the per-bin decomposition every monitoring stack
    sums into the headline PSI. Binning is ALL-INTEGER (cents, floor
    division), counts are exact int sums under any partitioning; only
    the final per-row term is float (round 6, same expression as the
    SQL). Two passes: O(1) global stats, then one tiny
    (type, bin) exchange of per-block partial counts."""
    ev = _events(sf_dir, ["event_type", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "val_c")
        return b.select(["event_type", "ts_us", "val_c"])

    ev = ev.map_batches(prep, batch_format="pyarrow").materialize()
    st = grouped_stats(ev.map_batches(
        lambda b: pa.table({"one": pa.array(
            np.zeros(b.num_rows, dtype=np.int8)),
            "val_c": b["val_c"], "ts_us": b["ts_us"]}),
        batch_format="pyarrow"), ["one"],
        min_cols=["val_c", "ts_us"], max_cols=["val_c", "ts_us"]
    ).take_all()
    lo, hi = int(st[0]["val_c_min"]), int(st[0]["val_c_max"])
    tmn, tmx = int(st[0]["ts_us_min"]), int(st[0]["ts_us_max"])
    tmid = tmn + (tmx - tmn) // 2

    def partial(b: pa.Table) -> pa.Table:
        v = b["val_c"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = b["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        # int64-safe: |v-lo|*10 stays far under 2^63 for cent-scaled data
        bins = np.clip((v - lo) * 10 // (hi - lo + 1), 0, 9)
        h1 = (ts <= tmid).astype(np.int64)
        t = pa.table({"event_type": b["event_type"],
                      "bin": pa.array(bins),
                      "c1": pa.array(h1),
                      "c2": pa.array(1 - h1)})
        return t.group_by(["event_type", "bin"]).aggregate(
            [("c1", "sum"), ("c2", "sum")])

    cnt = grouped_stats(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["event_type", "bin"], sum_cols=["c1_sum", "c2_sum"],
        count_name="__n")

    def finish(tbl: pa.Table) -> pa.Table:
        c1 = tbl["c1_sum_sum"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        c2 = tbl["c2_sum_sum"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        et = tbl["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        # per-type totals via dictionary-encoded bincount
        enc = et.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        t1 = np.bincount(idx, weights=c1.astype(np.float64)) \
            .astype(np.int64)[idx]
        t2 = np.bincount(idx, weights=c2.astype(np.float64)) \
            .astype(np.int64)[idx]
        p = (c1 + 1).astype(np.float64) / (t1 + 10).astype(np.float64)
        q = (c2 + 1).astype(np.float64) / (t2 + 10).astype(np.float64)
        term = _round_away((p - q) * np.log(p / q), 6)
        return pa.table({"event_type": et, "bin": tbl["bin"],
                         "c1": pa.array(c1), "c2": pa.array(c2),
                         "psi_term": pa.array(term)})

    # the (type, bin) table is tiny (|types| x 10) but per-type totals
    # need every bin of a type in one place: single-block finish
    return cnt.repartition(1).map_batches(finish, batch_format="pyarrow",
                                          batch_size=None)


SQL_EVENTS_PSI_DRIFT = """
WITH e AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS val_c,
                  epoch_us(ts) AS ts_us FROM events),
b0 AS (SELECT min(val_c) AS lo, max(val_c) AS hi,
              min(ts_us) + (max(ts_us) - min(ts_us)) // 2 AS tmid FROM e),
h AS (SELECT event_type,
             least(greatest((val_c - lo) * 10 // (hi - lo + 1), 0), 9)
               AS bin,
             CASE WHEN ts_us <= tmid THEN 1 ELSE 0 END AS h1
      FROM e, b0),
c AS (SELECT event_type, bin, CAST(sum(h1) AS BIGINT) AS c1,
             CAST(count(*) - sum(h1) AS BIGINT) AS c2
      FROM h GROUP BY event_type, bin),
t AS (SELECT event_type, CAST(sum(c1) AS BIGINT) AS t1,
             CAST(sum(c2) AS BIGINT) AS t2
      FROM c GROUP BY event_type)
SELECT c.event_type, c.bin, c1, c2,
       round((CAST(c1 + 1 AS DOUBLE) / (t1 + 10)
              - CAST(c2 + 1 AS DOUBLE) / (t2 + 10))
             * ln((CAST(c1 + 1 AS DOUBLE) / (t1 + 10))
                  / (CAST(c2 + 1 AS DOUBLE) / (t2 + 10))), 6) AS psi_term
FROM c JOIN t USING (event_type)
"""


def q_events_range_join_stream(sf_dir: str):
    """STREAMING twin of events_orders_range_join (8th streaming family
    member, stages/streaming.streaming_interval_join): facts and
    intervals land in SORTED co-bucketed layouts once (ingest-time
    cost, resumable), then the interval join streams each partition
    pair with a merge cursor and an active-interval buffer — ZERO
    query-time exchange, memory bounded by the max concurrent
    intervals per entity. Identical inner-join semantics and SQL
    oracle shape as the exchange-based rangejoin plan."""
    from pymhealth_ray.stages.streaming import streaming_interval_join

    ev = read_table(f"{sf_dir}/events.parquet",
                    columns=["event_id", "ts", "user_id"])
    orders = read_table(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey",
                                 "o_orderdate"])

    def mk_fact(b: pa.Table) -> pa.Table:
        return pa.table({
            "entity": b["user_id"].cast(pa.int64()),
            "ts_us": b["ts"].cast(pa.int64()),
            "event_id": b["event_id"],
        })

    def mk_intervals(b: pa.Table) -> pa.Table:
        od = b["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        start = _RJ_BASE24 + (od - _RJ_BASE95) % _RJ_SPAN
        ck = b["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "entity": pa.array(ck % 150),
            "start_us": pa.array(start),
            "end_us": pa.array(start + _RJ_LEN),
            "o_orderkey": b["o_orderkey"],
        })

    left = _sorted_layout(
        sf_dir, ev.map_batches(mk_fact, batch_format="pyarrow"),
        suffix="_rjfact", entity_col="entity",
        sort_cols=["entity", "ts_us"])
    right = _sorted_layout(
        sf_dir, orders.map_batches(mk_intervals, batch_format="pyarrow"),
        suffix="_rjival", entity_col="entity",
        sort_cols=["entity", "start_us"])
    j = streaming_interval_join(left, right, entity_col="entity",
                                ts_col="ts_us", start_col="start_us",
                                end_col="end_us", l_extra=["event_id"],
                                r_extra=["o_orderkey", "start_us"])

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b["event_id"],
            "o_orderkey": b["o_orderkey"],
            "entity": b["entity"],
            "ts_us": b["ts_us"],
            "start_us": b["start_us"],
        })

    return j.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_RANGE_JOIN_STREAM = """
WITH iv AS (
  SELECT o_orderkey, o_custkey % 150 AS entity,
         1704067200000000 + ((epoch_us(o_orderdate) - 788918400000000)
                             % 2505600000000) AS start_us
  FROM orders
)
SELECT e.event_id, iv.o_orderkey, CAST(e.user_id AS BIGINT) AS entity,
       epoch_us(e.ts) AS ts_us, iv.start_us
FROM events e JOIN iv ON e.user_id = iv.entity
  AND epoch_us(e.ts) >= iv.start_us
  AND epoch_us(e.ts) < iv.start_us + 43200000000
"""


def q_events_interval_union(sf_dir: str):
    """PER-USER INTERVAL-UNION COVERAGE (gaps-and-islands with
    VARIABLE-length intervals, stages/sweep.grouped_interval_union):
    each event opens a half-open activity interval [ts, ts + value
    minutes-ish) and the answer per user is the number of maximal merged
    islands plus the total covered wall-clock — the "how long was the
    user actually active" question. Distinct from sessionization
    (events_sessions): a fixed gap needs no running max, variable-length
    intervals do (an early long interval can swallow several later
    ones). One slim (user, start, end) bucket exchange, vectorized
    segment-reset running-max sweep, all int64 — hash-exact under any
    partitioning because coverage is order-independent."""
    from pymhealth_ray.stages.sweep import grouped_interval_union

    ev = _events(sf_dir, ["user_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "val_c")
        s = b["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = np.maximum(b["val_c"].to_numpy(zero_copy_only=False)
                       .astype(np.int64), 1) * 600_000
        return pa.table({"user_id": b["user_id"],
                         "start_us": pa.array(s),
                         "end_us": pa.array(s + d)})

    iu = grouped_interval_union(ev.map_batches(prep, batch_format="pyarrow"),
                                "user_id", "start_us", "end_us",
                                num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["user_id"],
                         "n_islands": b["n_islands"],
                         "covered_us": b["covered"]})

    return iu.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_INTERVAL_UNION = """
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS s,
                  epoch_us(ts)
                  + greatest(CAST(round(value * 100) AS BIGINT), 1) * 600000
                    AS en
           FROM events),
m AS (SELECT user_id, s, en, event_id,
             max(en) OVER (PARTITION BY user_id ORDER BY s, en, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS pm
      FROM e),
f AS (SELECT user_id, s, en, event_id,
             CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS brk
      FROM m),
g AS (SELECT user_id, s, en,
             CAST(sum(brk) OVER (PARTITION BY user_id
                                 ORDER BY s, en, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS island
      FROM f),
i AS (SELECT user_id, island, min(s) AS st, max(en) AS fin
      FROM g GROUP BY user_id, island)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(fin - st) AS BIGINT) AS covered_us
FROM i GROUP BY user_id
"""


_LATE_TOL_US = 14 * 24 * HOUR_US  # 14-day lateness tolerance
_LATE_LANES = 97  # deterministic arrival interleave (event_id % lanes)


def q_events_late_data(sf_dir: str):
    """EVENT-TIME WATERMARK / LATE-DATA DETECTION
    (stages/rank.ordered_prefix_max): arrival order is simulated
    deterministically by interleaving 97 lanes (event_id % 97 — the
    fixture's event_id is time-sorted, so the interleave recreates the
    out-of-order arrivals every real ingest has); the watermark at a row
    is the EXCLUSIVE running max of event time over all earlier
    arrivals, and a row is late when its event time trails the
    high-water mark by more than the tolerance. The scan is the
    distributed range-bucket prefix-MAX (same topology as the prefix-sum
    scan: per-bucket sort+accumulate, O(bins) bucket maxima through the
    driver) — ZERO driver row loops, exact int64, and the arrival key
    packs (lane, event_id) into one int64 so the bucket ranges follow
    the true arrival order."""
    from pymhealth_ray.stages.rank import I64_MIN, ordered_prefix_max

    ev = _events(sf_dir, ["event_id", "user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if eid.size and eid.max() >= 1 << 40:
            raise ValueError("event_id exceeds the 2^40 lane-pack bound")
        okey = (eid % _LATE_LANES) * (1 << 40) + eid
        return pa.table({"event_id": b["event_id"],
                         "user_id": b["user_id"],
                         "ts_us": b["ts_us"],
                         "okey": pa.array(okey)})

    scan = ordered_prefix_max(ev.map_batches(prep, batch_format="pyarrow"),
                              value_col="ts_us", order_col="okey",
                              tie_col="okey", out="hw")

    def finish(b: pa.Table) -> pa.Table:
        hw = b["hw"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = b["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        late = (hw != I64_MIN) & (ts < hw - _LATE_TOL_US)
        t = pa.table({"event_id": b["event_id"], "user_id": b["user_id"],
                      "ts_us": b["ts_us"],
                      "highwater_us": pa.array(hw),
                      "lateness_us": pa.array(hw - ts)})
        return t.filter(pa.array(late))

    return scan.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_LATE_DATA = """
WITH a AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                  event_id % 97 AS lane
           FROM events),
w AS (SELECT event_id, user_id, ts_us,
             max(ts_us) OVER (ORDER BY lane, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS hw
      FROM a)
SELECT event_id, user_id, ts_us, hw AS highwater_us,
       hw - ts_us AS lateness_us
FROM w WHERE hw IS NOT NULL AND ts_us < hw - 1209600000000
"""


def q_docs_token_chi2(sf_dir: str):
    """CHI-SQUARE TOKEN↔LABEL FEATURE SELECTION — the fasttext-style
    quality/language classifier prep step: which tokens are most
    associated with the English label? Per token, document-level
    presence counts a (en docs containing it) and b (non-en docs) are
    EXACT int64 under any partitioning (per-block per-doc distinct via
    dictionary codes + one np.unique, partial (tok, a, b) rows bucketed
    by token hash); the chi-square statistic n·(ad−bc)²/((a+b)(c+d)
    (a+c)(b+d)) is finished map-side with the SAME float association as
    the SQL (int64 cross product, then four double ops left-to-right).
    Top-50 by (chi2 desc, tok) via map-side local top-k pruning — the
    global top-k must be in some block's local top-k."""
    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["text", "lang"])

    # tiny pass: n (docs), n1 (english docs)
    tot = grouped_stats(docs.map_batches(
        lambda b: pa.table({"one": pa.array(
            np.zeros(b.num_rows, dtype=np.int8)),
            "is_en": pc.cast(pc.equal(b["lang"], "en"), pa.int64())}),
        batch_format="pyarrow"), ["one"], sum_cols=["is_en"],
        count_name="n").take_all()
    n, n1 = int(tot[0]["n"]), int(tot[0]["is_en_sum"])
    if n > 10_000_000:
        raise ValueError("chi2 int64 cross products need n <= 1e7")

    def partial(b: pa.Table) -> pa.Table:
        col = b["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lang = b["lang"]
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        is_en = pc.cast(pc.equal(lang, "en"), pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.float64)
        toks = pc.split_pattern(col, pattern=" ")
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        row = np.repeat(np.arange(len(toks), dtype=np.int64),
                        np.diff(offs))
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        V = len(enc.dictionary)
        upair = np.unique(row * V + codes)  # per-doc distinct presence
        urow, ucode = upair // V, upair % V
        a = np.bincount(ucode, weights=is_en[urow], minlength=V) \
            .astype(np.int64)
        t = np.bincount(ucode, minlength=V).astype(np.int64)
        tok = enc.dictionary
        keep = pc.not_equal(tok, "").to_numpy(zero_copy_only=False)
        from pymhealth_ray.stages.partition import _stable_bucket_of
        tok = tok.filter(pa.array(keep))
        return pa.table({
            "tok": tok, "a": pa.array(a[keep]),
            "b": pa.array((t - a)[keep]),
            "__ckbucket": pa.array(_stable_bucket_of(tok, NB),
                                   type=pa.int32())})

    def merge_bucket(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"tok": pa.array([], type=pa.string()),
                             "a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64())})
        out = tbl.drop_columns(["__ckbucket"]).group_by("tok").aggregate(
            [("a", "sum"), ("b", "sum")])
        return out.rename_columns(["tok", "a", "b"])

    counts = docs.map_batches(partial, batch_format="pyarrow",
                              batch_size=None).groupby(
        "__ckbucket").map_groups(merge_bucket, batch_format="pyarrow")

    def chi_topk(tbl: pa.Table) -> pa.Table:
        a = tbl["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        bb = tbl["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (a + bb >= 5) & (a + bb < n)
        tbl = tbl.filter(pa.array(keep))
        a, bb = a[keep], bb[keep]
        cc, dd = n1 - a, (n - n1) - bb
        num = (a * dd - bb * cc).astype(np.float64)
        chi2 = _round_away(
            float(n) * num * num
            / ((a + bb) * (cc + dd)).astype(np.float64)
            / ((a + cc) * (bb + dd)).astype(np.float64), 6)
        out = pa.table({"tok": tbl["tok"], "a": tbl["a"], "b": tbl["b"],
                        "chi2": pa.array(chi2)})
        order = pc.sort_indices(out, sort_keys=[("chi2", "descending"),
                                                ("tok", "ascending")])
        return out.take(order[:50])

    def final(tbl: pa.Table) -> pa.Table:
        order = pc.sort_indices(tbl, sort_keys=[("chi2", "descending"),
                                                ("tok", "ascending")])
        tbl = tbl.take(order[:50])
        return tbl.append_column(
            "rn", pa.array(np.arange(1, tbl.num_rows + 1, dtype=np.int64)))

    return counts.map_batches(chi_topk, batch_format="pyarrow",
                              batch_size=None).repartition(1).map_batches(
        final, batch_format="pyarrow", batch_size=None)


SQL_DOCS_TOKEN_CHI2 = """
WITH d AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en,
                  unnest(list_distinct(string_split(text, ' '))) AS tok
           FROM documents),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n1
        FROM documents),
c AS (SELECT tok, CAST(sum(is_en) AS BIGINT) AS a,
             CAST(count(*) - sum(is_en) AS BIGINT) AS b
      FROM d WHERE tok <> '' GROUP BY tok),
x AS (SELECT tok, a, b, n1 - a AS cc, (n - n1) - b AS dd, n
      FROM c, tot WHERE a + b >= 5 AND a + b < n),
chi AS (SELECT tok, a, b,
               round(CAST(n AS DOUBLE)
                     * CAST(a * dd - b * cc AS DOUBLE)
                     * CAST(a * dd - b * cc AS DOUBLE)
                     / CAST((a + b) * (cc + dd) AS DOUBLE)
                     / CAST((a + cc) * (b + dd) AS DOUBLE), 6) AS chi2
        FROM x)
SELECT tok, a, b, chi2, rn FROM (
  SELECT tok, a, b, chi2,
         CAST(row_number() OVER (ORDER BY chi2 DESC, tok) AS BIGINT) AS rn
  FROM chi) t
WHERE rn <= 50
"""


def q_events_rfm_segments(sf_dir: str):
    """RFM CUSTOMER SEGMENTATION — the classic recency/frequency/
    monetary quartile coding, composed from the engine's exact
    distributed primitives: one grouped_stats exchange builds the
    per-user (recency, frequency, monetary-cents) profile, then THREE
    exact NTILE(4) window passes (stages/rank.ntile — range-bucket rank
    + the SQL tile rule) assign quartiles, descending order realized by
    negating the int64 sort keys. Output is the 3-digit RFM code per
    user — every value an exact integer, hash-identical to the SQL
    window functions."""
    from pymhealth_ray.stages.rank import ntile

    ev = _events(sf_dir, ["user_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "val_c")
        return b.select(["user_id", "ts_us", "val_c"])

    prof = grouped_stats(ev.map_batches(prep, batch_format="pyarrow"),
                         ["user_id"], sum_cols=["val_c"],
                         max_cols=["ts_us"], count_name="freq")

    def neg(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "one": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
            "nrec": pc.negate(b["ts_us_max"].cast(pa.int64())),
            "nfreq": pc.negate(b["freq"].cast(pa.int64())),
            "nmon": pc.negate(b["val_c_sum"].cast(pa.int64()))})

    t = prof.map_batches(neg, batch_format="pyarrow")
    t = ntile(t, "one", "nrec", "user_id", 4, out="r")
    t = ntile(t, "one", "nfreq", "user_id", 4, out="f")
    t = ntile(t, "one", "nmon", "user_id", 4, out="m")

    def finish(b: pa.Table) -> pa.Table:
        r = b["r"].to_numpy(zero_copy_only=False).astype(np.int64)
        f = b["f"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = b["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"user_id": b["user_id"], "r": pa.array(r),
                         "f": pa.array(f), "m": pa.array(m),
                         "rfm": pa.array(r * 100 + f * 10 + m)})

    return t.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_RFM_SEGMENTS = """
WITH u AS (SELECT user_id, max(epoch_us(ts)) AS rec_us,
                  CAST(count(*) AS BIGINT) AS freq,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                    AS mon_c
           FROM events GROUP BY user_id),
t AS (SELECT user_id,
             CAST(ntile(4) OVER (ORDER BY rec_us DESC, user_id) AS BIGINT)
               AS r,
             CAST(ntile(4) OVER (ORDER BY freq DESC, user_id) AS BIGINT)
               AS f,
             CAST(ntile(4) OVER (ORDER BY mon_c DESC, user_id) AS BIGINT)
               AS m
      FROM u)
SELECT user_id, r, f, m, r * 100 + f * 10 + m AS rfm FROM t
"""


def q_events_scd2_pit(sf_dir: str):
    """POINT-IN-TIME JOIN against a type-2 SCD dimension — the lakehouse
    staple "what was the user's status when they purchased": the status
    stream (all non-purchase events) collapses to SCD2 validity runs
    (same islands kernel as events_scd2), and each purchase fact as-of
    joins the run whose valid_from is the latest ≤ the purchase time
    (stages/asof.asof_join — runs are contiguous per user, so the
    backward as-of IS the BETWEEN-validity match; purchases before any
    status row keep NULLs, the LEFT PIT semantics). Oracle: DuckDB
    ASOF LEFT JOIN over the same SCD2 CTE."""
    from pymhealth_ray.stages.partition import entity_segments, grouped_by_bucket

    ev = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"]) \
        .materialize()  # consumed by both the dim build and the facts

    status = ev.map_batches(
        lambda b: b.filter(pc.not_equal(b["event_type"], "purchase")),
        batch_format="pyarrow")

    def runs_of_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], type=pa.int64()),
                          "status": pa.array([], type=pa.string()),
                          "version_n": pa.array([], type=pa.int64()),
                          "valid_from": pa.array([], type=pa.int64())})
        if tbl.num_rows == 0:
            return empty
        tbl, starts, _ = entity_segments(tbl, "user_id", "ts_us",
                                         tiebreak_col="event_id")
        ts = tbl["ts_us"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        et = tbl["event_type"].combine_chunks()
        codes = et.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        new = np.zeros(len(ts), dtype=bool)
        new[0] = True
        new[starts[1:-1]] = True
        new[1:] |= codes[1:] != codes[:-1]
        rstart = np.flatnonzero(new)
        uid = tbl["user_id"].to_numpy(zero_copy_only=False)[rstart]
        firsts = np.concatenate(([True], uid[1:] != uid[:-1]))
        ver = np.arange(len(rstart), dtype=np.int64)
        ver -= np.maximum.accumulate(np.where(firsts, ver, -1))
        ver += 1
        return pa.table({"user_id": pa.array(uid),
                         "status": et.take(pa.array(rstart)),
                         "version_n": pa.array(ver),
                         "valid_from": pa.array(ts[rstart])})

    dim = grouped_by_bucket(status, runs_of_bucket, entity_col="user_id",
                            num_buckets=NB)

    facts = ev.map_batches(
        lambda b: b.filter(pc.equal(b["event_type"], "purchase"))
        .select(["event_id", "user_id", "ts_us"]),
        batch_format="pyarrow")
    j = asof_join(facts, dim, value_cols=["status", "version_n"],
                  entity_col="user_id", ts_col="ts_us",
                  dim_ts_col="valid_from", num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"event_id": b["event_id"],
                         "user_id": b["user_id"],
                         "ts_us": b["ts_us"],
                         "status": b["status_asof"],
                         "version_n": b["version_n_asof"],
                         "status_since_us": b["ts_us_asof"]})

    return j.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_SCD2_PIT = """
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
           FROM events),
s AS (SELECT * FROM e WHERE event_type <> 'purchase'),
m AS (SELECT user_id, ts_us, event_id, event_type,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS brk
      FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
r AS (SELECT user_id, ts_us, event_type,
             CAST(sum(brk) OVER (PARTITION BY user_id
                                 ORDER BY ts_us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
      FROM m),
d AS (SELECT user_id, event_type AS status, run AS version_n,
             min(ts_us) AS valid_from
      FROM r GROUP BY user_id, event_type, run),
p AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'purchase')
SELECT p.event_id, p.user_id, p.ts_us, d.status, d.version_n,
       d.valid_from AS status_since_us
FROM p ASOF LEFT JOIN d
  ON p.user_id = d.user_id AND p.ts_us >= d.valid_from
"""


def q_lineitem_hll_overlap(sf_dir: str):
    """SKETCH-ALGEBRA SET OVERLAP: how many distinct orders contain both
    a RETURNED ('R') and an ACCEPTED ('A') line? Exact intersection
    needs a co-partitioned distinct; the sketch answer ships three
    fixed-size HLL register arrays and uses inclusion-exclusion
    (|A∩B| ≈ |A| + |B| − |A∪B|, the union estimate falling out of the
    same max-merge that makes HLL mergeable — each row is emitted once
    under its own tag and once under the union tag, ONE pass).
    Deterministic and partitioning-invariant, so the oracle is the
    single-process replication of the identical sketch."""
    from pymhealth_ray.stages.sketch import grouped_approx_distinct

    li = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_orderkey", "l_returnflag"])

    def tag(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b["l_returnflag"],
                        value_set=pa.array(["R", "A"]))
        b = b.filter(keep)
        own = pa.table({"g": b["l_returnflag"], "k": b["l_orderkey"]})
        union = pa.table({
            "g": pa.array(np.full(b.num_rows, "U"), type=pa.string()),
            "k": b["l_orderkey"]})
        return pa.concat_tables([own, union]).combine_chunks()

    est = grouped_approx_distinct(li.map_batches(tag,
                                                 batch_format="pyarrow"),
                                  ["g"], "k", num_buckets=8)

    def finish(tbl: pa.Table) -> pa.Table:
        g = tbl["g"].to_pylist()
        e = tbl["approx_distinct"].to_numpy(zero_copy_only=False)
        n = tbl["n_rows"].to_numpy(zero_copy_only=False)
        by = dict(zip(g, zip(e.tolist(), n.tolist())))
        er, ea, eu = by["R"][0], by["A"][0], by["U"][0]
        inter = _round_away(np.array([er + ea - eu]), 6)[0]
        return pa.table({"est_r": pa.array([er]), "est_a": pa.array([ea]),
                         "est_union": pa.array([eu]),
                         "est_inter": pa.array([inter]),
                         "rows_r": pa.array([int(by["R"][1])]),
                         "rows_a": pa.array([int(by["A"][1])])})

    return est.repartition(1).map_batches(finish, batch_format="pyarrow",
                                          batch_size=None)


def _hll_overlap_expected(df):
    import pandas as pd

    from pymhealth_ray.stages.sketch import hll_expected

    sub = df[df["l_returnflag"].isin(["R", "A"])]
    vals = np.concatenate([sub["l_orderkey"].to_numpy()] * 2)
    grps = np.concatenate([sub["l_returnflag"].to_numpy(),
                           np.full(len(sub), "U")])
    ref = hll_expected(pa.array(vals, type=pa.int64()), grps)
    by = {g: (e, n) for g, e, n in zip(ref["g"], ref["est"], ref["n"])}
    er, ea, eu = by["R"][0], by["A"][0], by["U"][0]
    m = 10.0**6
    inter = float(np.sign(er + ea - eu)
                  * np.floor(abs(er + ea - eu) * m + 0.5) / m)
    return pd.DataFrame({"est_r": [er], "est_a": [ea], "est_union": [eu],
                         "est_inter": [inter],
                         "rows_r": [int(by["R"][1])],
                         "rows_a": [int(by["A"][1])]})


def q_embed_drift(sf_dir: str):
    """EMBEDDING-DISTRIBUTION DRIFT MONITOR: per (label, dimension), the
    mean of even-vec_id embeddings vs odd (the two "snapshots"), and
    their difference — the per-coordinate centroid-shift report a
    production embedding pipeline alarms on. Float sums are NOT
    associative, so the engine quantizes each coordinate to 2^-20 grid
    ints (exact under any partitioning; |q| ≤ 2^26, sums ≤ 2^53 for any
    realistic shard) and divides once at the end with the same double
    association as the SQL. One slim (label, half, dim) exchange of
    per-block int sums."""
    ds = read_table(f"{sf_dir}/embeddings.parquet",
                    columns=["vec_id", "embedding", "label"])

    def partial(b: pa.Table) -> pa.Table:
        emb = b["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        off = emb.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        d = int(off[1] - off[0]) if len(off) > 1 else 0
        flat = emb.values.to_numpy(zero_copy_only=False)[
            off[0]: off[-1]].astype(np.float64)
        q = _round_away(flat * 1048576.0, 0).reshape(-1, d).astype(np.int64)
        lab = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        half = (b["vec_id"].to_numpy(zero_copy_only=False)
                .astype(np.int64) % 2)
        code = lab * 2 + half
        order = np.argsort(code, kind="stable")
        cs = code[order]
        starts = np.flatnonzero(np.diff(cs, prepend=-1))
        sums = np.add.reduceat(q[order], starts, axis=0)
        cnts = np.diff(np.append(starts, len(cs)))
        g = cs[starts]
        n_g = len(g)
        return pa.table({
            "label": pa.array(np.repeat(g // 2, d)),
            "half": pa.array(np.repeat(g % 2, d)),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                    n_g)),
            "s": pa.array(sums.reshape(-1)),
            "c": pa.array(np.repeat(cnts.astype(np.int64), d))})

    agg = grouped_stats(ds.map_batches(partial, batch_format="pyarrow",
                                       batch_size=None),
                        ["label", "half", "dim"], sum_cols=["s", "c"])

    def finish(tbl: pa.Table) -> pa.Table:
        lab = tbl["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        half = tbl["half"].to_numpy(zero_copy_only=False).astype(np.int64)
        dim = tbl["dim"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = tbl["s_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = tbl["c_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = lab * 1024 + dim
        order = np.lexsort((half, key))
        key, half = key[order], half[order]
        s, c = s[order], c[order]
        # rows come in (half=0, half=1) pairs per (label, dim)
        assert np.array_equal(half[0::2], np.zeros(len(half) // 2)) \
            and np.array_equal(key[0::2], key[1::2])
        m0 = s[0::2].astype(np.float64) / c[0::2].astype(np.float64)
        m1 = s[1::2].astype(np.float64) / c[1::2].astype(np.float64)
        return pa.table({
            "label": pa.array(key[0::2] // 1024),
            "dim": pa.array(key[0::2] % 1024),
            "mean_even": pa.array(_round_away(m0, 6)),
            "mean_odd": pa.array(_round_away(m1, 6)),
            "drift": pa.array(_round_away(m0 - m1, 6))})

    # (labels x 2 x dims) rows: single-block pairing finish
    return agg.repartition(1).map_batches(finish, batch_format="pyarrow",
                                          batch_size=None)


SQL_EMBED_DRIFT = """
WITH x AS (SELECT CAST(label AS BIGINT) AS label,
                  vec_id % 2 AS half,
                  CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
                  CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1048576)
                       AS BIGINT) AS q
           FROM embeddings),
g AS (SELECT label, half, dim, CAST(sum(q) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS c
      FROM x GROUP BY label, half, dim)
SELECT a.label, a.dim,
       round(CAST(a.s AS DOUBLE) / a.c, 6) AS mean_even,
       round(CAST(b.s AS DOUBLE) / b.c, 6) AS mean_odd,
       round(CAST(a.s AS DOUBLE) / a.c - CAST(b.s AS DOUBLE) / b.c, 6)
         AS drift
FROM g a JOIN g b ON a.label = b.label AND a.dim = b.dim
WHERE a.half = 0 AND b.half = 1
"""


def q_events_twa(sf_dir: str):
    """TIME-WEIGHTED AVERAGE per user — the metering/billing aggregate:
    each event's value holds until the next event, so the user's TWA is
    Σ value·Δt over the observed span. Last-value-carried intervals come
    from the same sorted per-entity segment masks the lag stage uses;
    the weighted sum is exact int64 (cents × µs, magnitude-guarded) and
    the single closing division matches the SQL double. One bucket
    exchange, vectorized reduceat per user."""
    from pymhealth_ray.stages.partition import entity_segments, grouped_by_bucket

    ev = _events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "val_c")
        return b.select(["event_id", "user_id", "ts_us", "val_c"])

    def twa_of_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64()),
                          "span_us": pa.array([], type=pa.int64()),
                          "twa_c": pa.array([], type=pa.float64())})
        if tbl.num_rows == 0:
            return empty
        tbl, starts, n_ent = entity_segments(tbl, "user_id", "ts_us",
                                             tiebreak_col="event_id")
        ts = tbl["ts_us"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        v = tbl["val_c"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        dt = np.empty_like(ts)
        dt[:-1] = ts[1:] - ts[:-1]
        dt[-1] = 0
        dt[starts[1:-1] - 1] = 0  # last row of each entity holds nothing
        span = ts[starts[1:] - 1] - ts[starts[:-1]]
        if v.size and int(np.abs(v).max()) * int(span.max() if span.size
                                                 else 0) >= 2**62:
            raise ValueError("TWA cents x span overflows int64; rescale dt")
        num = np.add.reduceat(v * dt, starts[:-1])
        cnt = np.diff(starts)
        uid = tbl["user_id"].to_numpy(zero_copy_only=False)[starts[:-1]]
        keep = cnt >= 2
        return pa.table({
            "user_id": pa.array(uid[keep]),
            "n": pa.array(cnt[keep].astype(np.int64)),
            "span_us": pa.array(span[keep]),
            "twa_c": pa.array(_round_away(
                num[keep].astype(np.float64)
                / span[keep].astype(np.float64), 6))})

    return grouped_by_bucket(
        ev.map_batches(prep, batch_format="pyarrow"), twa_of_bucket,
        entity_col="user_id", num_buckets=NB)


SQL_EVENTS_TWA = """
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
                  CAST(round(value * 100) AS BIGINT) AS val_c, event_id
           FROM events),
l AS (SELECT user_id, ts_us, val_c,
             lead(ts_us) OVER (PARTITION BY user_id
                               ORDER BY ts_us, event_id) AS nxt
      FROM e),
s AS (SELECT user_id,
             CAST(sum(CASE WHEN nxt IS NULL THEN 0
                           ELSE val_c * (nxt - ts_us) END) AS BIGINT) AS num,
             CAST(max(ts_us) - min(ts_us) AS BIGINT) AS span_us,
             CAST(count(*) AS BIGINT) AS n
      FROM l GROUP BY user_id)
SELECT user_id, n, span_us,
       round(CAST(num AS DOUBLE) / span_us, 6) AS twa_c
FROM s WHERE n >= 2
"""


def q_events_ohlc(sf_dir: str):
    """Per-(user, day) OHLC CANDLES over the event value stream — the
    canonical bar-chart / daily-summary downsample: open/close are the
    cents value at the first/last event of the day (ts, event_id
    order), high/low the extrema. The generic kernel is
    stages/aggregate.grouped_ohlc (one bucket exchange + segment
    reduceat); the (user, day) pair rides through it as one packed
    int64 entity and is unpacked on the way out."""
    from pymhealth_ray.stages.aggregate import grouped_ohlc

    DAY_US = 86_400_000_000
    PACK = 1_000_000

    ev = _events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "val_c")
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = b["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = ts // DAY_US
        if day.size and (day.min() < 0 or day.max() >= PACK):
            raise ValueError("day index outside packed-key range")
        key = uid * PACK + day
        return pa.table({"ud": pa.array(key), "ts_us": b["ts_us"],
                         "event_id": b["event_id"], "val_c": b["val_c"]})

    candles = grouped_ohlc(ev.map_batches(prep, batch_format="pyarrow"),
                           entity_col="ud", order_col="ts_us",
                           tie_col="event_id", value_col="val_c",
                           num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        key = b["ud"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "user_id": pa.array(key // PACK),
            "day": pa.array(key % PACK),
            "n": b["n"], "open_c": b["open"], "high_c": b["high"],
            "low_c": b["low"], "close_c": b["close"]})

    return candles.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_OHLC = """
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
                  epoch_us(ts) // 86400000000 AS day,
                  CAST(round(value * 100) AS BIGINT) AS val_c, event_id
           FROM events),
w AS (SELECT user_id, day, val_c,
             first_value(val_c) OVER (PARTITION BY user_id, day
                                      ORDER BY ts_us, event_id) AS open_c,
             last_value(val_c) OVER (PARTITION BY user_id, day
                                     ORDER BY ts_us, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND UNBOUNDED FOLLOWING) AS close_c
      FROM e)
SELECT user_id, CAST(day AS BIGINT) AS day, CAST(count(*) AS BIGINT) AS n,
       CAST(max(open_c) AS BIGINT) AS open_c,
       CAST(max(val_c) AS BIGINT) AS high_c,
       CAST(min(val_c) AS BIGINT) AS low_c,
       CAST(max(close_c) AS BIGINT) AS close_c
FROM w GROUP BY user_id, day
"""


def q_orders_fifo_alloc(sf_dir: str):
    """FIFO BUDGET ALLOCATION — the settlement/billing matcher: each
    customer's budget (total cents of their finished 'F' orders) is
    allocated across their open 'O' orders in (date, key) order; an
    order receives min(price, remaining budget). Closed form over the
    per-entity exclusive prefix sum, so the whole allocation is ONE
    bucket exchange: budgets and open orders co-locate by customer in
    the same grouped_by_bucket pass (no join), and inside the bucket
    the prefix is a segment cumsum. All int64 cents — bit-exact vs the
    SQL window formulation."""
    from pymhealth_ray.stages.partition import (column_i64, entity_segments,
                                                grouped_by_bucket)

    ds = read_table(f"{sf_dir}/orders.parquet",
                    columns=["o_orderkey", "o_custkey", "o_orderstatus",
                             "o_totalprice", "o_orderdate"])

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b["o_orderstatus"],
                              value_set=pa.array(["F", "O"])))
        b = _cents(b, "o_totalprice", "price_c")
        st = b["o_orderstatus"]
        if isinstance(st, pa.ChunkedArray):
            st = st.combine_chunks()
        is_f = pc.equal(st, "F")
        dcol = b["o_orderdate"]
        if pa.types.is_date32(dcol.type):
            dcol = dcol.cast(pa.int32())
        date_i = dcol.cast(pa.int64())
        return pa.table({
            "o_orderkey": b["o_orderkey"], "o_custkey": b["o_custkey"],
            "is_f": is_f.cast(pa.int8()), "date_i": date_i,
            "price_c": b["price_c"]})

    def alloc_of_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"o_orderkey": pa.array([], type=pa.int64()),
                          "o_custkey": pa.array([], type=pa.int64()),
                          "price_c": pa.array([], type=pa.int64()),
                          "alloc_c": pa.array([], type=pa.int64())})
        if tbl.num_rows == 0:
            return empty
        isf = tbl["is_f"].to_numpy(zero_copy_only=False).astype(bool)
        fck = column_i64(tbl, "o_custkey")[isf]
        fpr = column_i64(tbl, "price_c")[isf]
        order = np.argsort(fck, kind="stable")
        fck, fpr = fck[order], fpr[order]
        uf, fstarts = np.unique(fck, return_index=True)
        budgets = (np.add.reduceat(fpr, fstarts)
                   if fpr.size else np.zeros(0, dtype=np.int64))
        open_tbl = tbl.filter(pa.array(~isf))
        if open_tbl.num_rows == 0:
            return empty
        open_tbl, starts, n_ent = entity_segments(
            open_tbl, "o_custkey", "date_i", tiebreak_col="o_orderkey")
        price = column_i64(open_tbl, "price_c")
        cs = np.cumsum(price)
        excl = cs - price
        counts = np.diff(starts)
        before = excl - np.repeat(excl[starts[:-1]], counts)
        ck = column_i64(open_tbl, "o_custkey")
        seg_ck = ck[starts[:-1]]
        if len(uf):
            bidx = np.searchsorted(uf, seg_ck)
            bidx_c = np.minimum(bidx, len(uf) - 1)
            seg_budget = np.where(uf[bidx_c] == seg_ck,
                                  budgets[bidx_c], 0).astype(np.int64)
        else:
            seg_budget = np.zeros(n_ent, dtype=np.int64)
        budget_row = np.repeat(seg_budget, counts)
        alloc = np.minimum(price, np.maximum(budget_row - before, 0))
        return pa.table({
            "o_orderkey": open_tbl["o_orderkey"].cast(pa.int64()),
            "o_custkey": open_tbl["o_custkey"].cast(pa.int64()),
            "price_c": pa.array(price), "alloc_c": pa.array(alloc)})

    return grouped_by_bucket(
        ds.map_batches(prep, batch_format="pyarrow"), alloc_of_bucket,
        entity_col="o_custkey", num_buckets=NB)


SQL_ORDERS_FIFO_ALLOC = """
WITH o AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_orderdate,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
           FROM orders WHERE o_orderstatus IN ('F', 'O')),
b AS (SELECT o_custkey,
             CAST(COALESCE(sum(CASE WHEN o_orderstatus = 'F'
                                    THEN price_c END), 0) AS BIGINT)
             AS budget_c
      FROM o GROUP BY o_custkey),
q AS (SELECT o_orderkey, o_custkey, price_c,
             CAST(COALESCE(sum(price_c) OVER (
                  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS before_c
      FROM o WHERE o_orderstatus = 'O')
SELECT q.o_orderkey, q.o_custkey, q.price_c,
       CAST(least(q.price_c, greatest(b.budget_c - q.before_c, 0))
            AS BIGINT) AS alloc_c
FROM q JOIN b ON q.o_custkey = b.o_custkey
"""


def q_seq_downsample_tokens(sf_dir: str):
    """WORD2VEC-STYLE FREQUENCY DOWNSAMPLING of the tokenized corpus
    (Mikolov subsampling, t=1e-3): occurrences of tokens whose corpus
    frequency exceeds t survive with probability sqrt(t/f), decided by
    a deterministic per-occurrence md5 uniform so the exact predicate
    re-runs in SQL. The broadcast side is the HEAVY SET ONLY — bounded
    at ≤ 1/t tokens by construction regardless of corpus size (the
    counts table never ships); rare tokens are never hashed. One
    keyed_sum for counts + one map — zero corpus exchange
    (stages/vocab.downsample_tokens)."""
    import hashlib as _hl

    from pymhealth_ray.stages.aggregate import keyed_sum
    from pymhealth_ray.stages.dedup import tokens_join_key
    from pymhealth_ray.stages.vocab import downsample_tokens

    T_SUB = 0.001

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "tokens"])
    ds = ds.materialize()  # consumed by the count pass AND the map

    def tok_partial(b: pa.Table) -> pa.Table:
        col = b["tokens"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        vals, cnts = np.unique(flat, return_counts=True)
        return pa.table({"tok": pa.array(vals),
                         "c": pa.array(cnts.astype(np.int64))})

    counts = keyed_sum(
        ds.map_batches(tok_partial, batch_format="pyarrow",
                       batch_size=None),
        "tok", ["c"], num_buckets=NB).take_all()
    tok = np.array([r["tok"] for r in counts], dtype=np.int64)
    c = np.array([r["c"] for r in counts], dtype=np.int64)
    total = int(c.sum())
    ratio = (T_SUB * float(total)) / c.astype(np.float64)
    heavy = ratio < 1.0
    order = np.argsort(tok[heavy])
    htok = tok[heavy][order]
    thr = np.floor(np.sqrt(ratio[heavy][order])
                   * 4294967296.0).astype(np.int64)

    kept = downsample_tokens(ds, htok, thr, key_cols=("doc_id", "ts_ns"),
                             salt="w2v")

    def finish(b: pa.Table) -> pa.Table:
        col = b["tokens"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n0 = pc.list_value_length(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        kcol = b["tokens_kept"]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        nk = pc.list_value_length(kcol).to_numpy(
            zero_copy_only=False).astype(np.int64)
        joined = tokens_join_key(kcol)
        md5 = [_hl.md5(s.encode()).hexdigest()
               for s in joined.to_pylist()]
        return pa.table({
            "doc_id": b["doc_id"], "ts_ns": b["ts_ns"],
            "n_tok": pa.array(n0), "n_kept": pa.array(nk),
            "ds_md5": pa.array(md5, type=pa.string())})

    return kept.map_batches(finish, batch_format="pyarrow")


def sql_seq_downsample_tokens(path: str) -> str:
    return f"""
WITH s AS (SELECT doc_id, ts_ns, tokens
           FROM read_parquet('{path}/part-*.parquet')),
u AS (SELECT doc_id, ts_ns, unnest(tokens) AS v,
             generate_subscripts(tokens, 1) AS k FROM s),
c AS (SELECT v, count(*) AS c FROM u GROUP BY v),
tt AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM c),
thr AS (SELECT c.v,
               CASE WHEN (0.001 * tt.t) / c.c >= 1.0 THEN NULL
                    ELSE printf('%08x', CAST(floor(
                         sqrt((0.001 * tt.t) / c.c) * 4294967296.0)
                         AS BIGINT)) END AS h
        FROM c, tt),
kept AS (SELECT u.doc_id, u.ts_ns, u.k, u.v
         FROM u JOIN thr ON u.v = thr.v
         WHERE thr.h IS NULL
            OR substr(md5(u.doc_id || ':' || CAST(u.ts_ns AS VARCHAR)
                          || ':' || CAST(u.k AS VARCHAR) || '-w2v'),
                      1, 8) < thr.h),
g AS (SELECT doc_id, ts_ns, CAST(count(*) AS BIGINT) AS nk,
             string_agg(CAST(v AS VARCHAR), ',' ORDER BY k) AS js
      FROM kept GROUP BY doc_id, ts_ns)
SELECT s.doc_id, s.ts_ns, CAST(len(s.tokens) AS BIGINT) AS n_tok,
       CAST(COALESCE(g.nk, 0) AS BIGINT) AS n_kept,
       md5(COALESCE(g.js, '')) AS ds_md5
FROM s LEFT JOIN g USING (doc_id, ts_ns)
"""


def q_events_ab_welch(sf_dir: str):
    """WELCH TWO-SAMPLE T per event type — the A/B-test readout:
    treatment arm = user_id % 2, metric = event value in cents. The
    distributed part is exact int64 (count, Σc, Σc²) partials per
    (type, arm) via grouped_stats; the bounded per-type table finishes
    on the driver with the SAME double expression order as the SQL
    (CAST-to-DOUBLE means, Σc²−Σc·mean sample variance, t =
    Δmean/sqrt(v0/n0+v1/n1)) so floats are bit-identical. Magnitudes
    are guarded before squaring."""
    from pymhealth_ray.stages.aggregate import grouped_stats

    ev = read_table(f"{sf_dir}/events.parquet",
                    columns=["user_id", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "c")
        cv = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        if cv.size and int(np.abs(cv).max()) >= 3_000_000_000:
            raise ValueError("cents magnitude overflows int64 square")
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"event_type": b["event_type"],
                         "arm": pa.array(uid % 2),
                         "c": pa.array(cv), "c2": pa.array(cv * cv)})

    stats = grouped_stats(ev.map_batches(prep, batch_format="pyarrow"),
                          ["event_type", "arm"], sum_cols=["c", "c2"],
                          count_name="n").take_all()
    rows = {}
    for r in stats:
        rows.setdefault(r["event_type"], {})[int(r["arm"])] = r
    out = {"event_type": [], "n0": [], "n1": [],
           "mean_diff": [], "t_welch": []}
    for et in sorted(rows):
        arms = rows[et]
        if 0 not in arms or 1 not in arms:
            continue
        n0, n1 = arms[0]["n"], arms[1]["n"]
        if n0 < 2 or n1 < 2:
            continue
        s0, s1 = float(arms[0]["c_sum"]), float(arms[1]["c_sum"])
        ss0, ss1 = float(arms[0]["c2_sum"]), float(arms[1]["c2_sum"])
        m0, m1 = s0 / n0, s1 / n1
        v0 = (ss0 - s0 * m0) / (n0 - 1)
        v1 = (ss1 - s1 * m1) / (n1 - 1)
        t = (m1 - m0) / np.sqrt(v0 / n0 + v1 / n1)
        out["event_type"].append(et)
        out["n0"].append(n0)
        out["n1"].append(n1)
        out["mean_diff"].append(
            float(_round_away(np.array([m1 - m0]), 6)[0]))
        out["t_welch"].append(float(_round_away(np.array([t]), 6)[0]))
    return pa.table({"event_type": pa.array(out["event_type"],
                                            type=pa.string()),
                     "n0": pa.array(out["n0"], type=pa.int64()),
                     "n1": pa.array(out["n1"], type=pa.int64()),
                     "mean_diff": pa.array(out["mean_diff"]),
                     "t_welch": pa.array(out["t_welch"])})


SQL_EVENTS_AB_WELCH = """
WITH e AS (SELECT event_type, user_id % 2 AS arm,
                  CAST(round(value * 100) AS BIGINT) AS c FROM events),
a AS (SELECT event_type, arm, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS ss
      FROM e GROUP BY event_type, arm),
p AS (SELECT a0.event_type, a0.n AS n0, a1.n AS n1, a0.s AS s0, a1.s AS s1,
             a0.ss AS ss0, a1.ss AS ss1
      FROM a a0 JOIN a a1 ON a0.event_type = a1.event_type
      WHERE a0.arm = 0 AND a1.arm = 1)
SELECT event_type, n0, n1,
       round(CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0, 6)
           AS mean_diff,
       round((CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0) / sqrt(
             ((CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE)
               * (CAST(s0 AS DOUBLE) / n0)) / (n0 - 1)) / n0
           + ((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE)
               * (CAST(s1 AS DOUBLE) / n1)) / (n1 - 1)) / n1), 6)
           AS t_welch
FROM p WHERE n0 >= 2 AND n1 >= 2
"""


def q_embed_mutual_nn(sf_dir: str):
    """MUTUAL NEAREST NEIGHBOR pairs within each label group — the
    bitext/duplicate mining primitive: a pair qualifies iff each vector
    is the other's cosine top-1 inside its label. Groups co-locate via
    ONE grouped_by_bucket exchange; inside a group the kernel is a
    single normalized matmul + argmax (ids sorted ascending so argmax's
    first-max rule matches SQL's (sim DESC, vec_id ASC) tie order). At
    corpus scale the label is a k-means/IVF cluster id (the SemDeDup
    partitioning) so no group outgrows a worker; the all-pairs matmul
    never leaves the group."""
    from pymhealth_ray.stages.partition import entity_segments, grouped_by_bucket

    ds = read_table(f"{sf_dir}/embeddings.parquet",
                    columns=["vec_id", "embedding", "label"])

    def mnn_of_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"label": pa.array([], type=pa.int64()),
                          "a_id": pa.array([], type=pa.int64()),
                          "b_id": pa.array([], type=pa.int64()),
                          "cosine": pa.array([], type=pa.float64())})
        if tbl.num_rows == 0:
            return empty
        tbl, starts, n_ent = entity_segments(tbl, "label", "vec_id")
        emb = tbl["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        off = emb.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = emb.values.to_numpy(zero_copy_only=False)
        mat = flat[off[0]: off[-1]].astype(np.float64).reshape(
            tbl.num_rows, -1)
        vids = tbl["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        labs = tbl["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_l, out_a, out_b, out_c = [], [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            g = mat[s:e]
            if e - s < 2:
                continue
            u = g / np.maximum(np.linalg.norm(g, axis=1, keepdims=True),
                               1e-12)
            sims = u @ u.T
            np.fill_diagonal(sims, -np.inf)
            nn = np.argmax(sims, axis=1)
            i = np.arange(e - s)
            mutual = (nn[nn] == i) & (i < nn)
            hits = np.flatnonzero(mutual)
            out_l.append(np.full(hits.size, labs[s], dtype=np.int64))
            out_a.append(vids[s:e][hits])
            out_b.append(vids[s:e][nn[hits]])
            out_c.append(sims[hits, nn[hits]])
        if not out_l:
            return empty
        return pa.table({
            "label": pa.array(np.concatenate(out_l)),
            "a_id": pa.array(np.concatenate(out_a)),
            "b_id": pa.array(np.concatenate(out_b)),
            "cosine": pa.array(_round_away(np.concatenate(out_c), 4))})

    return grouped_by_bucket(ds, mnn_of_bucket, entity_col="label",
                             num_buckets=NB)


SQL_EMBED_MUTUAL_NN = """
WITH e AS (SELECT CAST(label AS BIGINT) AS label, vec_id,
                  CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
s AS (SELECT a.label, a.vec_id AS qa, b.vec_id AS qb,
             list_cosine_similarity(a.v, b.v) AS sim,
             row_number() OVER (PARTITION BY a.vec_id
                                ORDER BY list_cosine_similarity(a.v, b.v)
                                    DESC, b.vec_id) AS rnk
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id),
nn AS (SELECT label, qa, qb, sim FROM s WHERE rnk = 1)
SELECT x.label, x.qa AS a_id, x.qb AS b_id, round(x.sim, 4) AS cosine
FROM nn x JOIN nn y ON x.qb = y.qa AND x.qa = y.qb AND x.qa < x.qb
"""


L_LCS = 48


def _lcs_pairs_of_bucket(tbl: pa.Table) -> pa.Table:
    """One bucket's adjacent-pair LCS: sort (source, ts_ns, doc_id),
    pair each row with its successor inside the source segment, then a
    SINGLE DP vectorized ACROSS pairs (the fuzzy.py trick): per A-row
    the LCS recurrence collapses to max(prev[1:], prev[:-1]+eq)
    followed by a running row max — cur[j-1] only propagates maxima
    forward in a non-decreasing row. Prefixes are capped at L_LCS
    tokens (distinct pads -1/-2 never match), so cost is
    O(pairs · L²) independent of document length."""
    from pymhealth_ray.stages.partition import entity_segments

    empty = pa.table({"source": pa.array([], type=pa.string()),
                      "a_doc": pa.array([], type=pa.string()),
                      "b_doc": pa.array([], type=pa.string()),
                      "n_a": pa.array([], type=pa.int64()),
                      "n_b": pa.array([], type=pa.int64()),
                      "lcs_len": pa.array([], type=pa.int64())})
    if tbl.num_rows == 0:
        return empty
    tbl, starts, n_ent = entity_segments(tbl, "source", "ts_ns",
                                         tiebreak_col="doc_id")
    n = tbl.num_rows
    is_last = np.zeros(n, dtype=bool)
    is_last[starts[1:] - 1] = True
    a_idx = np.flatnonzero(~is_last)
    if a_idx.size == 0:
        return empty
    b_idx = a_idx + 1
    toks = tbl["tokens"]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.values.to_numpy(zero_copy_only=False).astype(np.int64)
    base = off[0]
    lens = (off[1:] - off[:-1])
    trunc = np.minimum(lens, L_LCS)

    def gather(idx, pad):
        m = idx.size
        out = np.full((m, L_LCS), pad, dtype=np.int64)
        cols = np.arange(L_LCS)[None, :]
        mask = cols < trunc[idx][:, None]
        posn = (off[idx][:, None] - base) + cols
        out[mask] = flat[posn[mask]]
        return out

    A = gather(a_idx, -1)
    B = gather(b_idx, -2)
    m = a_idx.size
    prev = np.zeros((m, L_LCS + 1), dtype=np.int32)
    zero = np.zeros((m, 1), dtype=np.int32)
    for i in range(L_LCS):
        eq = (A[:, i][:, None] == B).astype(np.int32)
        c = np.maximum(prev[:, 1:], prev[:, :-1] + eq)
        cur = np.maximum.accumulate(c, axis=1)
        prev = np.concatenate([zero, cur], axis=1)
    lcs = prev[:, -1].astype(np.int64)
    src = tbl["source"]
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    dids = tbl["doc_id"]
    if isinstance(dids, pa.ChunkedArray):
        dids = dids.combine_chunks()
    return pa.table({
        "source": src.take(pa.array(a_idx)),
        "a_doc": dids.take(pa.array(a_idx)),
        "b_doc": dids.take(pa.array(b_idx)),
        "n_a": pa.array(trunc[a_idx]),
        "n_b": pa.array(trunc[b_idx]),
        "lcs_len": pa.array(lcs)})


def q_seq_lcs_pairs(sf_dir: str):
    """LONGEST COMMON SUBSEQUENCE between ADJACENT documents of each
    source ((ts_ns, doc_id) order) — the alignment-style similarity
    feature next to the set-based (Jaccard) and edit-based
    (Levenshtein) verifiers: order-preserving shared token count over
    the first L_LCS tokens of each side. Pairs form inside ONE
    grouped_by_bucket exchange (sources co-locate; adjacency never
    crosses a group); the DP is vectorized across all pairs of the
    bucket. All-integer output; the oracle replays pair construction +
    a per-pair row-loop DP single-process."""
    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "tokens", "source"])
    from pymhealth_ray.stages.partition import grouped_by_bucket

    return grouped_by_bucket(ds, _lcs_pairs_of_bucket,
                             entity_col="source", num_buckets=NB)


def _lcs_pairs_expected(src: pa.Table):
    """Independent single-process LCS reference: same pairing, but a
    per-pair classic DP (row loop over A, numpy row update)."""
    import pandas as pd

    df = src.to_pandas()
    df = df.sort_values(["source", "ts_ns", "doc_id"]).reset_index(drop=True)
    rows = []
    for source, g in df.groupby("source", sort=False):
        toks = [np.asarray(t, dtype=np.int64)[:L_LCS]
                for t in g["tokens"]]
        ids = g["doc_id"].tolist()
        for i in range(len(g) - 1):
            a, b = toks[i], toks[i + 1]
            prev = np.zeros(len(b) + 1, dtype=np.int64)
            for x in a:
                cand = np.maximum(prev[1:], prev[:-1] + (b == x))
                cur = np.maximum.accumulate(cand)
                prev = np.concatenate(([0], cur))
            rows.append({"source": source, "a_doc": ids[i],
                         "b_doc": ids[i + 1], "n_a": len(a),
                         "n_b": len(b), "lcs_len": int(prev[-1])})
    out = pd.DataFrame(rows, columns=["source", "a_doc", "b_doc",
                                      "n_a", "n_b", "lcs_len"])
    out["n_a"] = out["n_a"].astype("int64")
    out["n_b"] = out["n_b"].astype("int64")
    return out


HOLT_ALPHA = 0.5
HOLT_BETA = 0.3


def q_events_holt(sf_dir: str):
    """HOLT LINEAR (double) EXPONENTIAL SMOOTHING per user over the
    event value stream: level l ← α·x + (1−α)(l+b), trend b ←
    β(l−l_prev) + (1−β)b, initialized l₀=x₀, b₀=x₁−x₀. Users co-locate
    via ONE bucket exchange; inside the bucket the recurrence is
    vectorized ACROSS entities (step loop over time, masked by each
    entity's length) — elementwise IEEE ops in the same per-entity
    order as a sequential run, so the materialized single-process
    oracle matches bit-for-bit. Emits per-user level, trend and the
    one-step forecast l+b (round 6)."""
    from pymhealth_ray.stages.partition import (column_i64, entity_segments,
                                                grouped_by_bucket)

    ev = _events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "val_c")
        return b.select(["event_id", "user_id", "ts_us", "val_c"])

    def holt_of_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64()),
                          "level_c": pa.array([], type=pa.float64()),
                          "trend_c": pa.array([], type=pa.float64()),
                          "forecast_c": pa.array([], type=pa.float64())})
        if tbl.num_rows == 0:
            return empty
        tbl, starts, n_ent = entity_segments(tbl, "user_id", "ts_us",
                                             tiebreak_col="event_id")
        v = column_i64(tbl, "val_c").astype(np.float64)
        cnt = np.diff(starts)
        keep = cnt >= 2
        if not keep.any():
            return empty
        k_starts = starts[:-1][keep]
        k_cnt = cnt[keep]
        maxlen = int(k_cnt.max())
        m = k_starts.size
        x = np.full((m, maxlen), np.nan)
        cols = np.arange(maxlen)[None, :]
        mask = cols < k_cnt[:, None]
        x[mask] = v[(k_starts[:, None] + cols)[mask]]
        lvl = x[:, 0].copy()
        trd = x[:, 1] - x[:, 0]
        for t in range(1, maxlen):
            act = t < k_cnt
            xt = x[:, t]
            nl = HOLT_ALPHA * xt + (1.0 - HOLT_ALPHA) * (lvl + trd)
            nb = (HOLT_BETA * (nl - lvl) + (1.0 - HOLT_BETA) * trd)
            lvl = np.where(act, nl, lvl)
            trd = np.where(act, nb, trd)
        uid = column_i64(tbl, "user_id")[k_starts]
        return pa.table({
            "user_id": pa.array(uid),
            "n": pa.array(k_cnt.astype(np.int64)),
            "level_c": pa.array(_round_away(lvl, 6)),
            "trend_c": pa.array(_round_away(trd, 6)),
            "forecast_c": pa.array(_round_away(lvl + trd, 6))})

    return grouped_by_bucket(
        ev.map_batches(prep, batch_format="pyarrow"), holt_of_bucket,
        entity_col="user_id", num_buckets=NB)


def _events_holt_expected(df):
    """Sequential per-user Holt recurrence (python floats) — the
    independent reference for the vectorized engine kernel. Receives
    the events table as a pandas DataFrame (table-oracle contract)."""
    import pandas as pd

    df = df.copy()
    df["ts_us"] = df["ts"].astype("int64")
    df["val_c"] = np.rint(df["value"].to_numpy() * 100).astype(np.int64)
    rows = []
    for uid, g in df.sort_values(["user_id", "ts_us", "event_id"]) \
                    .groupby("user_id"):
        xs = g["val_c"].to_numpy().astype(np.float64)
        if xs.size < 2:
            continue
        lvl = float(xs[0])
        trd = float(xs[1]) - float(xs[0])
        for t in range(1, xs.size):
            nl = HOLT_ALPHA * float(xs[t]) + (1.0 - HOLT_ALPHA) * (lvl + trd)
            trd = HOLT_BETA * (nl - lvl) + (1.0 - HOLT_BETA) * trd
            lvl = nl
        rows.append({
            "user_id": int(uid), "n": int(xs.size),
            "level_c": float(_round_away(np.array([lvl]), 6)[0]),
            "trend_c": float(_round_away(np.array([trd]), 6)[0]),
            "forecast_c": float(_round_away(np.array([lvl + trd]), 6)[0])})
    return pd.DataFrame(rows, columns=["user_id", "n", "level_c",
                                       "trend_c", "forecast_c"])


COHORT_PACK = 4096
MONTH_OFFSET = 1970 * 12 + 1  # numpy months-since-1970 -> year*12+month


def q_orders_cohort_ltv(sf_dir: str):
    """COHORT LTV matrix — revenue by (signup cohort month, months since
    first order): the classic subscription/commerce LTV report. ONE
    grouped_by_bucket exchange does everything per-customer: customers
    co-locate, so each bucket derives first-order months locally
    (monotonic date→month map: month of min date == min month), tags
    every order with (cohort, age) and rolls up (orders, revenue,
    DISTINCT customers) per cell — customer sets are disjoint across
    buckets, so the per-bucket distinct counts SUM globally exact (the
    grouped_distinct_count co-location argument). A small keyed_sum
    over packed (cohort·4096+age) int64 keys merges the partials."""
    from pymhealth_ray.stages.aggregate import keyed_sum
    from pymhealth_ray.stages.partition import grouped_by_bucket

    ds = read_table(f"{sf_dir}/orders.parquet",
                    columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "o_totalprice", "price_c")
        dcol = b["o_orderdate"]
        if isinstance(dcol, pa.ChunkedArray):
            dcol = dcol.combine_chunks()
        days = dcol.cast(pa.date32()).cast(pa.int32()) \
            .to_numpy(zero_copy_only=False)
        months = (days.astype("datetime64[D]").astype("datetime64[M]")
                  .astype(np.int64) + MONTH_OFFSET)
        return pa.table({"o_custkey": b["o_custkey"],
                         "m": pa.array(months), "price_c": b["price_c"]})

    def cells_of_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], type=pa.int64()),
                          "n_orders": pa.array([], type=pa.int64()),
                          "revenue_c": pa.array([], type=pa.int64()),
                          "n_customers": pa.array([], type=pa.int64())})
        if tbl.num_rows == 0:
            return empty
        from pymhealth_ray.stages.partition import column_i64

        ck = column_i64(tbl, "o_custkey")
        m = column_i64(tbl, "m")
        pr = column_i64(tbl, "price_c")
        order = np.argsort(ck, kind="stable")
        cks, ms, prs = ck[order], m[order], pr[order]
        is_start = np.ones(cks.size, dtype=bool)
        is_start[1:] = cks[1:] != cks[:-1]
        starts = np.flatnonzero(is_start)
        cohort_seg = np.minimum.reduceat(ms, starts)
        cnts = np.diff(np.concatenate([starts, [cks.size]]))
        cohort = np.repeat(cohort_seg, cnts)
        age = ms - cohort
        if age.size and int(age.max()) >= COHORT_PACK:
            raise ValueError("cohort age exceeds pack range")
        cell = cohort * COHORT_PACK + age
        # per-cell rollup + per-cell distinct customers (pairs sorted
        # by (cell, cust): unique pair = first occurrence)
        po = np.lexsort((cks, cell))
        cs, us = cell[po], cks[po]
        new_pair = np.ones(cs.size, dtype=bool)
        new_pair[1:] = (cs[1:] != cs[:-1]) | (us[1:] != us[:-1])
        uc, inv = np.unique(cell, return_inverse=True)
        n_orders = np.bincount(inv, minlength=uc.size).astype(np.int64)
        srt = np.argsort(cell, kind="stable")
        rev = np.add.reduceat(
            pr[order][srt],
            np.flatnonzero(np.concatenate(
                ([True], cell[srt][1:] != cell[srt][:-1]))))
        ncust = np.bincount(np.searchsorted(uc, cs[new_pair]),
                            minlength=uc.size).astype(np.int64)
        return pa.table({"cell": pa.array(uc),
                         "n_orders": pa.array(n_orders),
                         "revenue_c": pa.array(rev),
                         "n_customers": pa.array(ncust)})

    partials = grouped_by_bucket(
        ds.map_batches(prep, batch_format="pyarrow"), cells_of_bucket,
        entity_col="o_custkey", num_buckets=NB)
    summed = keyed_sum(partials, "cell",
                       ["n_orders", "revenue_c", "n_customers"],
                       num_buckets=NB, precombine_rows=None)

    def finish(b: pa.Table) -> pa.Table:
        cell = b["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "cohort_m": pa.array(cell // COHORT_PACK),
            "age_m": pa.array(cell % COHORT_PACK),
            "n_orders": b["n_orders"], "revenue_c": b["revenue_c"],
            "n_customers": b["n_customers"]})

    return summed.map_batches(finish, batch_format="pyarrow")


SQL_ORDERS_COHORT_LTV = """
WITH f AS (SELECT o_custkey, min(o_orderdate) AS first_d
           FROM orders GROUP BY o_custkey),
j AS (SELECT o.o_custkey,
             year(f.first_d) * 12 + month(f.first_d) AS cohort_m,
             (year(o.o_orderdate) * 12 + month(o.o_orderdate))
                 - (year(f.first_d) * 12 + month(f.first_d)) AS age_m,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_c
      FROM orders o JOIN f ON o.o_custkey = f.o_custkey)
SELECT CAST(cohort_m AS BIGINT) AS cohort_m, CAST(age_m AS BIGINT) AS age_m,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(price_c) AS BIGINT) AS revenue_c,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM j GROUP BY cohort_m, age_m
"""


def q_events_audience_overlap(sf_dir: str):
    """AUDIENCE OVERLAP matrix — exact pairwise Jaccard between event
    types' user sets: the segment/feature co-occurrence report. Users
    co-locate in ONE grouped_by_bucket exchange; each bucket collapses
    its users to TYPE BITMASKS (np.bitwise_or.reduceat over a
    broadcast type index) and emits bounded (mask, count) partials —
    at most 2^T rows per bucket regardless of corpus size. The driver
    folds mask counts into every pairwise intersection/union. Types
    are guarded to ≤ 30 (int64 bitmask; wider domains would shard the
    mask)."""
    from pymhealth_ray.stages.aggregate import grouped_stats, keyed_sum
    from pymhealth_ray.stages.partition import grouped_by_bucket

    types_rows = grouped_stats(
        read_table(f"{sf_dir}/events.parquet", columns=["event_type"]),
        ["event_type"]).take_all()
    types = sorted(r["event_type"] for r in types_rows)
    if len(types) > 30:
        raise ValueError("audience_overlap bitmask supports <= 30 types")
    tmap = {t: i for i, t in enumerate(types)}

    ev = read_table(f"{sf_dir}/events.parquet",
                    columns=["user_id", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        et = b["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        bit_of = np.array([1 << tmap[t]
                           for t in enc.dictionary.to_pylist()],
                          dtype=np.int64)
        bits = bit_of[enc.indices.to_numpy(zero_copy_only=False)]
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # block-local pre-OR per user (slim exchange)
        order = np.argsort(uid, kind="stable")
        us, bs = uid[order], bits[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], us[1:] != us[:-1])))
        return pa.table({
            "user_id": pa.array(us[starts]),
            "mask": pa.array(np.bitwise_or.reduceat(bs, starts))})

    def masks_of_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"mask": pa.array([], type=pa.int64()),
                          "cnt": pa.array([], type=pa.int64())})
        if tbl.num_rows == 0:
            return empty
        from pymhealth_ray.stages.partition import column_i64

        uid = column_i64(tbl, "user_id")
        mk = column_i64(tbl, "mask")
        order = np.argsort(uid, kind="stable")
        us, ms = uid[order], mk[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], us[1:] != us[:-1])))
        full = np.bitwise_or.reduceat(ms, starts)
        vals, cnts = np.unique(full, return_counts=True)
        return pa.table({"mask": pa.array(vals),
                         "cnt": pa.array(cnts.astype(np.int64))})

    partials = grouped_by_bucket(
        ev.map_batches(prep, batch_format="pyarrow"), masks_of_bucket,
        entity_col="user_id", num_buckets=NB)
    rows = keyed_sum(partials, "mask", ["cnt"], num_buckets=NB,
                     precombine_rows=None).take_all()
    masks = np.array([r["mask"] for r in rows], dtype=np.int64)
    cnts = np.array([r["cnt"] for r in rows], dtype=np.int64)
    out = {"type_a": [], "type_b": [], "n_a": [], "n_b": [],
           "n_inter": [], "n_union": [], "jaccard": []}
    for i in range(len(types)):
        for j in range(i + 1, len(types)):
            ai = (masks >> i) & 1
            aj = (masks >> j) & 1
            n_a = int(cnts[ai == 1].sum())
            n_b = int(cnts[aj == 1].sum())
            inter = int(cnts[(ai & aj) == 1].sum())
            if inter == 0:
                continue
            union = n_a + n_b - inter
            out["type_a"].append(types[i])
            out["type_b"].append(types[j])
            out["n_a"].append(n_a)
            out["n_b"].append(n_b)
            out["n_inter"].append(inter)
            out["n_union"].append(union)
            out["jaccard"].append(float(_round_away(
                np.array([inter / union]), 6)[0]))
    return pa.table({
        "type_a": pa.array(out["type_a"], type=pa.string()),
        "type_b": pa.array(out["type_b"], type=pa.string()),
        "n_a": pa.array(out["n_a"], type=pa.int64()),
        "n_b": pa.array(out["n_b"], type=pa.int64()),
        "n_inter": pa.array(out["n_inter"], type=pa.int64()),
        "n_union": pa.array(out["n_union"], type=pa.int64()),
        "jaccard": pa.array(out["jaccard"], type=pa.float64())})


SQL_EVENTS_AUDIENCE_OVERLAP = """
WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_inter
      FROM d a JOIN d b ON a.user_id = b.user_id
                        AND a.event_type < b.event_type
      GROUP BY 1, 2),
c AS (SELECT event_type, count(*) AS n FROM d GROUP BY event_type)
SELECT p.type_a, p.type_b, CAST(ca.n AS BIGINT) AS n_a,
       CAST(cb.n AS BIGINT) AS n_b, CAST(p.n_inter AS BIGINT) AS n_inter,
       CAST(ca.n + cb.n - p.n_inter AS BIGINT) AS n_union,
       round(CAST(p.n_inter AS DOUBLE) / (ca.n + cb.n - p.n_inter), 6)
           AS jaccard
FROM p JOIN c ca ON p.type_a = ca.event_type
       JOIN c cb ON p.type_b = cb.event_type
"""


def q_events_streaming_candles(sf_dir: str):
    """STREAMING twin of events_ohlc (9th streaming family member):
    per-(user, day) OHLC candles read straight off the sorted bucketed
    events layout — one task per partition file, a single open-candle
    carry across Arrow batch boundaries, ZERO query-time exchange
    (stages/streaming.streaming_candles). Shares events_ohlc's SQL
    window oracle, so the exchange plan and the streaming plan are
    verified against the same truth."""
    from pymhealth_ray.stages.streaming import streaming_candles

    ev = _events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "val_c")
        return b.select(["user_id", "ts_us", "event_id", "val_c"])

    ds = ev.map_batches(prep, batch_format="pyarrow")
    layout = _sorted_layout(sf_dir, ds, suffix="_candles",
                            entity_col="user_id",
                            sort_cols=["user_id", "ts_us", "event_id"])
    out = streaming_candles(layout, entity_col="user_id",
                            ts_col="ts_us", val_col="val_c")

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"], "day": b["day"], "n": b["n"],
            "open_c": b["open"], "high_c": b["high"],
            "low_c": b["low"], "close_c": b["close"]})

    return out.map_batches(finish, batch_format="pyarrow")


def q_events_mahalanobis(sf_dir: str):
    """MULTIVARIATE ANOMALY SCORE per event: squared Mahalanobis
    distance of (value cents, hour-of-day) from the event type's own
    2-D distribution. Stats are ONE exact-int64 grouped_stats pass
    (n, Σx, Σy, Σx², Σy², Σxy per type — magnitudes guarded); the
    bounded per-type parameter table broadcasts and scoring is a pure
    map with the SAME double expression order as the SQL (closed-form
    2×2 inverse: (dx²·cyy − 2·dx·dy·cxy + dy²·cxx)/det), so floats are
    bit-identical. The complement of the univariate MAD/Hampel/CUSUM
    detectors: it catches jointly-unusual (value, time) combinations."""
    import ray as _ray

    from pymhealth_ray.stages.aggregate import grouped_stats

    HOUR_US = 3_600_000_000

    ev = _events(sf_dir, ["event_id", "event_type", "ts", "value"])
    ev = ev.materialize()  # consumed by the stats pass AND the scorer

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "x")
        xv = b["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        if xv.size and int(np.abs(xv).max()) >= 3_000_000_000:
            raise ValueError("cents magnitude overflows int64 square")
        ts = b["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        yv = (ts // HOUR_US) % 24
        return pa.table({"event_id": b["event_id"],
                         "event_type": b["event_type"],
                         "x": pa.array(xv), "y": pa.array(yv),
                         "xx": pa.array(xv * xv), "yy": pa.array(yv * yv),
                         "xy": pa.array(xv * yv)})

    scored_src = ev.map_batches(prep, batch_format="pyarrow")
    stats = grouped_stats(scored_src, ["event_type"],
                          sum_cols=["x", "y", "xx", "yy", "xy"],
                          count_name="n").take_all()
    params = {}
    for r in stats:
        n = r["n"]
        if n < 3:
            continue
        sx, sy = float(r["x_sum"]), float(r["y_sum"])
        sxx, syy = float(r["xx_sum"]), float(r["yy_sum"])
        sxy = float(r["xy_sum"])
        mx, my = sx / n, sy / n
        cxx = (sxx - sx * (sx / n)) / (n - 1)
        cyy = (syy - sy * (sy / n)) / (n - 1)
        cxy = (sxy - sx * (sy / n)) / (n - 1)
        params[r["event_type"]] = (mx, my, cxx, cyy, cxy)
    p_ref = _ray.put(params)

    def score(b: pa.Table) -> pa.Table:
        pm = _ray.get(p_ref)
        et = b["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        dvals = enc.dictionary.to_pylist()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        have = np.array([t in pm for t in dvals], dtype=bool)
        arr = np.array([pm.get(t, (0.0, 0.0, 1.0, 1.0, 0.0))
                        for t in dvals], dtype=np.float64)
        mx, my, cxx, cyy, cxy = (arr[idx, k] for k in range(5))
        keep = have[idx]
        x = b["x"].to_numpy(zero_copy_only=False).astype(np.float64)
        y = b["y"].to_numpy(zero_copy_only=False).astype(np.float64)
        dx = x - mx
        dy = y - my
        det = cxx * cyy - cxy * cxy
        m2 = (dx * dx * cyy - 2.0 * dx * dy * cxy + dy * dy * cxx) / det
        out = pa.table({"event_id": b["event_id"],
                        "event_type": b["event_type"],
                        "m2": pa.array(_round_away(m2, 6))})
        return out.filter(pa.array(keep))

    return scored_src.map_batches(score, batch_format="pyarrow")


SQL_EVENTS_MAHALANOBIS = """
WITH e AS (SELECT event_id, event_type,
                  CAST(round(value * 100) AS BIGINT) AS x,
                  (epoch_us(ts) // 3600000000) % 24 AS y
           FROM events),
a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM e GROUP BY event_type),
p AS (SELECT event_type,
             CAST(sx AS DOUBLE) / n AS mx, CAST(sy AS DOUBLE) / n AS my,
             (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                  * (CAST(sx AS DOUBLE) / n)) / (n - 1) AS cxx,
             (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                  * (CAST(sy AS DOUBLE) / n)) / (n - 1) AS cyy,
             (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                  * (CAST(sy AS DOUBLE) / n)) / (n - 1) AS cxy
      FROM a WHERE n >= 3)
SELECT e.event_id, e.event_type,
       round(((e.x - p.mx) * (e.x - p.mx) * p.cyy
              - 2.0 * (e.x - p.mx) * (e.y - p.my) * p.cxy
              + (e.y - p.my) * (e.y - p.my) * p.cxx)
             / (p.cxx * p.cyy - p.cxy * p.cxy), 6) AS m2
FROM e JOIN p USING (event_type)
"""


DUPINV_PACK = 100_000_000


def q_orders_dup_invoices(sf_dir: str):
    """DUPLICATE-INVOICE detection — the fintech double-charge rule:
    two orders of the SAME customer with the SAME cents amount within
    7 days. The fixture has no natural amount collisions, so the query
    seeds deterministic duplicates on BOTH sides (every 37th orderkey
    re-emitted at key+10M, date+3d — the seq_minhash_dupes seeding
    precedent). Candidates co-locate by packed (customer, amount)
    int64 key in ONE grouped_by_bucket exchange; inside a bucket the
    rule is an adjacent-gap scan per segment, matching the SQL lag
    formulation pair-for-pair."""
    from pymhealth_ray.stages.partition import (column_i64, entity_segments,
                                                grouped_by_bucket)

    ds = read_table(f"{sf_dir}/orders.parquet",
                    columns=["o_orderkey", "o_custkey", "o_totalprice",
                             "o_orderdate"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "o_totalprice", "price_c")
        key = b["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pr = b["price_c"].to_numpy(zero_copy_only=False).astype(np.int64)
        dcol = b["o_orderdate"]
        if isinstance(dcol, pa.ChunkedArray):
            dcol = dcol.combine_chunks()
        days = dcol.cast(pa.date32()).cast(pa.int32()) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        if pr.size and (pr.min() < 0 or pr.max() >= DUPINV_PACK):
            raise ValueError("price_c outside dup-invoice pack range")
        seed = key % 37 == 0
        key = np.concatenate([key, key[seed] + 10_000_000])
        ck = np.concatenate([ck, ck[seed]])
        pr = np.concatenate([pr, pr[seed]])
        days = np.concatenate([days, days[seed] + 3])
        return pa.table({"gk": pa.array(ck * DUPINV_PACK + pr),
                         "o_orderkey": pa.array(key),
                         "days": pa.array(days)})

    def pairs_of_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"a_key": pa.array([], type=pa.int64()),
                          "b_key": pa.array([], type=pa.int64()),
                          "o_custkey": pa.array([], type=pa.int64()),
                          "price_c": pa.array([], type=pa.int64()),
                          "gap_days": pa.array([], type=pa.int64())})
        if tbl.num_rows == 0:
            return empty
        tbl, starts, n_ent = entity_segments(tbl, "gk", "days",
                                             tiebreak_col="o_orderkey")
        gk = column_i64(tbl, "gk")
        key = column_i64(tbl, "o_orderkey")
        days = column_i64(tbl, "days")
        n = tbl.num_rows
        is_last = np.zeros(n, dtype=bool)
        is_last[starts[1:] - 1] = True
        a = np.flatnonzero(~is_last)
        if a.size == 0:
            return empty
        b_ = a + 1
        gap = days[b_] - days[a]
        hit = gap <= 7
        a, b_, gap = a[hit], b_[hit], gap[hit]
        return pa.table({"a_key": pa.array(key[a]),
                         "b_key": pa.array(key[b_]),
                         "o_custkey": pa.array(gk[a] // DUPINV_PACK),
                         "price_c": pa.array(gk[a] % DUPINV_PACK),
                         "gap_days": pa.array(gap)})

    return grouped_by_bucket(
        ds.map_batches(prep, batch_format="pyarrow"), pairs_of_bucket,
        entity_col="gk", num_buckets=NB)


SQL_ORDERS_DUP_INVOICES = """
WITH o0 AS (SELECT o_orderkey,
                   o_custkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
                   CAST(o_orderdate AS DATE) AS d
            FROM orders),
aug AS (SELECT * FROM o0
        UNION ALL
        SELECT o_orderkey + 10000000, o_custkey, price_c, d + 3
        FROM o0 WHERE o_orderkey % 37 = 0),
s AS (SELECT o_orderkey, o_custkey, price_c, d,
             lag(o_orderkey) OVER w AS prev_key,
             lag(d) OVER w AS prev_d
      FROM aug
      WINDOW w AS (PARTITION BY o_custkey, price_c
                   ORDER BY d, o_orderkey))
SELECT prev_key AS a_key, o_orderkey AS b_key, o_custkey, price_c,
       CAST(d - prev_d AS BIGINT) AS gap_days
FROM s WHERE prev_key IS NOT NULL AND d - prev_d <= 7
"""


def q_lineitem_benford(sf_dir: str):
    """BENFORD FIRST-DIGIT audit over line-item amounts — the classic
    fraud-analytics screen: observed share of each leading digit of
    the cents amount next to Benford's log10(1+1/d) expectation. The
    digit extraction is an all-integer vectorized divide-down (≤ 19
    halvings of magnitude, no float log near power-of-ten
    boundaries); counts are exact keyed_sum partials; only the two
    per-digit report floats (share, expected) are computed, in SQL's
    expression order."""
    from pymhealth_ray.stages.aggregate import keyed_sum

    li = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        b = _cents(b, "l_extendedprice", "price_c")
        d = b["price_c"].to_numpy(zero_copy_only=False).astype(np.int64)
        if d.size and d.min() <= 0:
            raise ValueError("benford digits need positive amounts")
        while True:
            big = d >= 10
            if not big.any():
                break
            d = np.where(big, d // 10, d)
        vals, cnts = np.unique(d, return_counts=True)
        return pa.table({"digit": pa.array(vals),
                         "c": pa.array(cnts.astype(np.int64))})

    rows = keyed_sum(li.map_batches(partial, batch_format="pyarrow",
                                    batch_size=None),
                     "digit", ["c"], num_buckets=NB,
                     precombine_rows=None).take_all()
    dig = np.array([r["digit"] for r in rows], dtype=np.int64)
    cnt = np.array([r["c"] for r in rows], dtype=np.int64)
    order = np.argsort(dig)
    dig, cnt = dig[order], cnt[order]
    total = int(cnt.sum())
    share = _round_away(cnt.astype(np.float64) / total, 6)
    expected = _round_away(
        np.log(1.0 + 1.0 / dig.astype(np.float64)) / np.log(10.0), 6)
    return pa.table({"digit": pa.array(dig), "n": pa.array(cnt),
                     "share": pa.array(share),
                     "expected_p": pa.array(expected)})


SQL_LINEITEM_BENFORD = """
WITH e AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS p
           FROM lineitem),
d AS (SELECT CAST(substr(CAST(p AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM e),
a AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit),
t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM a)
SELECT a.digit, a.n,
       round(CAST(a.n AS DOUBLE) / t.total, 6) AS share,
       round(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS expected_p
FROM a, t
"""


BURST_VPACK = 4096


def q_seq_token_burstiness(sf_dir: str):
    """TOKEN BURSTINESS (Church-Gale): variance-to-mean ratio of each
    token's per-document count over ALL documents (zeros included) —
    separates bursty topical tokens from uniformly-spread function
    words; a vocabulary-analysis complement to PMI/drift/Zipf. One
    map pass packs (row, token) into int64 and uniques per block —
    per-(doc, token) counts never leave the block; exact (Σc, Σc²,
    doc-frequency) partials flow through ONE keyed_sum (+ a tagged
    −1 row carrying the document count). Top-50 selection is on
    exact integers (count DESC, token ASC); only the reported vmr is
    float, in SQL's expression order."""
    from pymhealth_ray.stages.aggregate import keyed_sum

    ds, _ = _seq_ds(sf_dir, ["tokens"])

    def partial(b: pa.Table) -> pa.Table:
        col = b["tokens"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = pc.list_value_length(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        if flat.size and int(flat.max()) >= BURST_VPACK:
            raise ValueError("token id exceeds burstiness pack range")
        row = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        pk, c = np.unique(row * BURST_VPACK + flat, return_counts=True)
        tok = pk % BURST_VPACK
        c = c.astype(np.int64)
        order = np.argsort(tok, kind="stable")
        ts_, cs_ = tok[order], c[order]
        st = np.flatnonzero(np.concatenate(([True], ts_[1:] != ts_[:-1])))
        s = np.add.reduceat(cs_, st)
        ss = np.add.reduceat(cs_ * cs_, st)
        df = np.diff(np.concatenate([st, [ts_.size]])).astype(np.int64)
        return pa.table({
            "tok": pa.array(np.concatenate([ts_[st], [-1]])),
            "s": pa.array(np.concatenate([s, [len(lens)]])),
            "ss": pa.array(np.concatenate([ss, [0]])),
            "df": pa.array(np.concatenate([df, [0]]))})

    rows = keyed_sum(ds.map_batches(partial, batch_format="pyarrow",
                                    batch_size=None),
                     "tok", ["s", "ss", "df"], num_buckets=NB,
                     precombine_rows=None).take_all()
    tok = np.array([r["tok"] for r in rows], dtype=np.int64)
    s = np.array([r["s"] for r in rows], dtype=np.int64)
    ss = np.array([r["ss"] for r in rows], dtype=np.int64)
    df = np.array([r["df"] for r in rows], dtype=np.int64)
    d_total = int(s[tok == -1][0])
    keep = tok >= 0
    tok, s, ss, df = tok[keep], s[keep], ss[keep], df[keep]
    top = np.lexsort((tok, -s))[:50]
    tok, s, ss, df = tok[top], s[top], ss[top], df[top]
    m = s.astype(np.float64) / d_total
    a = ss.astype(np.float64) / d_total
    vmr = _round_away((a - m * m) / m, 6)
    return pa.table({"tok": pa.array(tok), "total_c": pa.array(s),
                     "n_docs": pa.array(df),
                     "vmr": pa.array(vmr)})


def sql_seq_token_burstiness(path: str) -> str:
    return f"""
WITH u AS (SELECT doc_id, ts_ns, unnest(tokens) AS v
           FROM read_parquet('{path}/part-*.parquet')),
c AS (SELECT doc_id, ts_ns, v, count(*) AS c FROM u
      GROUP BY doc_id, ts_ns, v),
a AS (SELECT v, CAST(sum(c) AS BIGINT) AS s,
             CAST(sum(c * c) AS BIGINT) AS ss,
             CAST(count(*) AS BIGINT) AS df
      FROM c GROUP BY v),
dd AS (SELECT count(*) AS d FROM read_parquet('{path}/part-*.parquet')),
t AS (SELECT v, s, ss, df FROM a ORDER BY s DESC, v LIMIT 50)
SELECT t.v AS tok, t.s AS total_c, t.df AS n_docs,
       round((CAST(t.ss AS DOUBLE) / dd.d
              - (CAST(t.s AS DOUBLE) / dd.d)
                * (CAST(t.s AS DOUBLE) / dd.d))
             / (CAST(t.s AS DOUBLE) / dd.d), 6) AS vmr
FROM t, dd
"""


def q_seq_good_turing(sf_dir: str):
    """GOOD-TURING frequency smoothing over the unigram vocabulary —
    the LM-calibration classic: counts-of-counts N_r and the smoothed
    estimate r* = (r+1)·N_{r+1}/N_r per observed frequency r. Two
    exact keyed_sum levels (token → r, then r → N_r: the second level
    is bounded by |distinct frequencies|, far smaller than the
    vocabulary); the driver joins the shifted table. One float
    division per report row, SQL order; rows whose N_{r+1} is absent
    report r* = 0 (COALESCE 0 on both sides)."""
    from pymhealth_ray.stages.aggregate import keyed_sum

    ds, _ = _seq_ds(sf_dir, ["tokens"])

    def tok_partial(b: pa.Table) -> pa.Table:
        col = b["tokens"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        vals, cnts = np.unique(flat, return_counts=True)
        return pa.table({"tok": pa.array(vals),
                         "c": pa.array(cnts.astype(np.int64))})

    counts = keyed_sum(ds.map_batches(tok_partial, batch_format="pyarrow",
                                      batch_size=None),
                       "tok", ["c"], num_buckets=NB)

    def r_partial(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        vals, cnts = np.unique(c, return_counts=True)
        return pa.table({"r": pa.array(vals),
                         "n": pa.array(cnts.astype(np.int64))})

    rows = keyed_sum(counts.map_batches(r_partial, batch_format="pyarrow",
                                        batch_size=None),
                     "r", ["n"], num_buckets=NB,
                     precombine_rows=None).take_all()
    r = np.array([x["r"] for x in rows], dtype=np.int64)
    n = np.array([x["n"] for x in rows], dtype=np.int64)
    order = np.argsort(r)
    r, n = r[order], n[order]
    nxt = np.searchsorted(r, r + 1)
    nxt_c = np.minimum(nxt, r.size - 1)
    n_next = np.where(r[nxt_c] == r + 1, n[nxt_c], 0).astype(np.int64)
    r_star = _round_away(((r + 1) * n_next).astype(np.float64)
                         / n.astype(np.float64), 6)
    return pa.table({"r": pa.array(r), "n_r": pa.array(n),
                     "r_star": pa.array(r_star)})


def sql_seq_good_turing(path: str) -> str:
    return f"""
WITH u AS (SELECT unnest(tokens) AS v
           FROM read_parquet('{path}/part-*.parquet')),
c AS (SELECT v, count(*) AS r FROM u GROUP BY v),
nr AS (SELECT CAST(r AS BIGINT) AS r, CAST(count(*) AS BIGINT) AS n_r
       FROM c GROUP BY r)
SELECT a.r, a.n_r,
       round(CAST((a.r + 1) * COALESCE(b.n_r, 0) AS DOUBLE) / a.n_r, 6)
           AS r_star
FROM nr a LEFT JOIN nr b ON b.r = a.r + 1
"""


def q_part_revenue_gini(sf_dir: str):
    """REVENUE CONCENTRATION per brand — the Gini coefficient of part
    revenues inside each brand, the assortment-inequality report. Part
    revenues are ONE exact keyed_sum over l_partkey (int cents); brand
    comes from a broadcast dimension lookup (parts are a dimension
    table — the star-revenue precedent); within-brand ranks come from
    a deterministic (revenue, partkey) sort inside the brand-bucketed
    exchange. Gini = (2·Σᵢi·xᵢ − (n+1)·Σx)/(n·Σx) over the sorted
    revenues: every term is exact int64 (magnitude-guarded), so the
    ONLY float is the final division — bit-exact vs SQL at any
    partitioning."""
    import pyarrow.parquet as _pq
    import ray as _ray

    from pymhealth_ray.stages.aggregate import keyed_sum
    from pymhealth_ray.stages.partition import (column_i64, entity_segments,
                                                grouped_by_bucket)

    li = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_partkey", "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "l_extendedprice", "rev_c")
        return b.select(["l_partkey", "rev_c"])

    rev = keyed_sum(li.map_batches(prep, batch_format="pyarrow"),
                    "l_partkey", ["rev_c"], num_buckets=NB)

    part = _pq.read_table(f"{sf_dir}/part.parquet",
                          columns=["p_partkey", "p_brand"])
    pk = part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(pk)
    brand_ref = _ray.put((pk[order],
                          np.asarray(part["p_brand"].to_pylist(),
                                     dtype=object)[order]))

    def tag_brand(b: pa.Table) -> pa.Table:
        keys, brands = _ray.get(brand_ref)
        k = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(keys, k)
        idx_c = np.minimum(idx, keys.size - 1)
        hit = keys[idx_c] == k
        out = b.append_column("p_brand", pa.array(
            brands[idx_c].astype(str), type=pa.string()))
        return out.filter(pa.array(hit))

    def gini_of_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"p_brand": pa.array([], type=pa.string()),
                          "n_parts": pa.array([], type=pa.int64()),
                          "revenue_c": pa.array([], type=pa.int64()),
                          "gini": pa.array([], type=pa.float64())})
        if tbl.num_rows == 0:
            return empty
        tbl, starts, n_ent = entity_segments(tbl, "p_brand", "rev_c",
                                             tiebreak_col="l_partkey")
        x = column_i64(tbl, "rev_c")
        n_all = tbl.num_rows
        i_global = np.arange(n_all, dtype=np.int64)
        cnt = np.diff(starts)
        i_local = i_global - np.repeat(starts[:-1], cnt) + 1
        if x.size and int(x.max()) * n_all * n_all >= 2**62:
            raise ValueError("gini rank-sum overflows int64")
        wsum = np.add.reduceat(i_local * x, starts[:-1])
        tot = np.add.reduceat(x, starts[:-1])
        num = 2 * wsum - (cnt + 1) * tot
        den = cnt * tot
        brand = tbl["p_brand"]
        if isinstance(brand, pa.ChunkedArray):
            brand = brand.combine_chunks()
        return pa.table({
            "p_brand": brand.take(pa.array(starts[:-1])),
            "n_parts": pa.array(cnt.astype(np.int64)),
            "revenue_c": pa.array(tot),
            "gini": pa.array(_round_away(
                num.astype(np.float64) / den.astype(np.float64), 6))})

    tagged = rev.map_batches(tag_brand, batch_format="pyarrow")
    return grouped_by_bucket(tagged, gini_of_bucket,
                             entity_col="p_brand", num_buckets=NB)


SQL_PART_REVENUE_GINI = """
WITH r AS (SELECT l_partkey,
                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                       AS BIGINT) AS rev_c
           FROM lineitem GROUP BY l_partkey),
j AS (SELECT p.p_brand, r.l_partkey, r.rev_c,
             row_number() OVER (PARTITION BY p.p_brand
                                ORDER BY r.rev_c, r.l_partkey) AS i,
             count(*) OVER (PARTITION BY p.p_brand) AS n
      FROM r JOIN part p ON r.l_partkey = p.p_partkey)
SELECT p_brand, CAST(max(n) AS BIGINT) AS n_parts,
       CAST(sum(rev_c) AS BIGINT) AS revenue_c,
       round(CAST(2 * sum(i * rev_c) - (max(n) + 1) * sum(rev_c)
                  AS DOUBLE)
             / (max(n) * sum(rev_c)), 6) AS gini
FROM j GROUP BY p_brand
"""


KLEIN_S = 2.0
KLEIN_GAMMA = 1.0


def q_events_bursts_kleinberg(sf_dir: str):
    """KLEINBERG BURST DETECTION per user (2-state automaton, the
    stream-mining classic): state 1 fires at s× the user's base rate;
    a Viterbi pass over inter-event gaps labels each gap, paying
    γ·ln(n) to enter the burst state. The DP is vectorized ACROSS
    users inside the bucket (step loop over gap index, masked by each
    user's gap count; backtrack over stored choice bits) — elementwise
    IEEE ops in the same per-user order as a sequential run, so the
    materialized single-process oracle matches exactly; ties prefer
    state 0 on both sides. Output is all-integer: per user the gap
    count, burst-gap count and burst-run count."""
    from pymhealth_ray.stages.partition import (column_i64, entity_segments,
                                                grouped_by_bucket)

    ev = _events(sf_dir, ["event_id", "user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        return b.select(["event_id", "user_id", "ts_us"])

    def bursts_of_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], type=pa.int64()),
                          "n_gaps": pa.array([], type=pa.int64()),
                          "n_burst_gaps": pa.array([], type=pa.int64()),
                          "n_burst_runs": pa.array([], type=pa.int64())})
        if tbl.num_rows == 0:
            return empty
        tbl, starts, n_ent = entity_segments(tbl, "user_id", "ts_us",
                                             tiebreak_col="event_id")
        ts = column_i64(tbl, "ts_us")
        cnt = np.diff(starts)
        keep = cnt >= 3  # need >= 2 gaps and a positive span
        if not keep.any():
            return empty
        k_starts = starts[:-1][keep]
        k_cnt = cnt[keep]
        n_gaps = k_cnt - 1
        maxg = int(n_gaps.max())
        m = k_starts.size
        g = np.full((m, maxg), np.nan)
        cols = np.arange(maxg)[None, :]
        gmask = cols < n_gaps[:, None]
        src = (k_starts[:, None] + cols)[gmask]
        g[gmask] = (ts[src + 1] - ts[src]).astype(np.float64)
        span = (ts[k_starts + k_cnt - 1] - ts[k_starts]).astype(np.float64)
        pos_span = span > 0
        if not pos_span.all():
            sel = np.flatnonzero(keep)[pos_span]
            # drop zero-span users entirely (cannot define a base rate)
            keep2 = np.zeros(len(cnt), dtype=bool)
            keep2[sel] = True
            keep = keep2
            k_starts = starts[:-1][keep]
            k_cnt = cnt[keep]
            n_gaps = k_cnt - 1
            maxg = int(n_gaps.max())
            m = k_starts.size
            g = np.full((m, maxg), np.nan)
            cols = np.arange(maxg)[None, :]
            gmask = cols < n_gaps[:, None]
            src = (k_starts[:, None] + cols)[gmask]
            g[gmask] = (ts[src + 1] - ts[src]).astype(np.float64)
            span = (ts[k_starts + k_cnt - 1]
                    - ts[k_starts]).astype(np.float64)
        lam0 = n_gaps.astype(np.float64) / span
        lam1 = KLEIN_S * lam0
        trans = KLEIN_GAMMA * np.log(k_cnt.astype(np.float64))
        ln0 = np.log(lam0)
        ln1 = np.log(lam1)
        d0 = np.zeros(m)
        d1 = np.full(m, np.inf)
        from0 = np.zeros((m, maxg), dtype=bool)  # d0' took min from d0?
        from0b = np.zeros((m, maxg), dtype=bool)  # d1' took d0+trans?
        for t in range(maxg):
            act = t < n_gaps
            c0 = -ln0 + lam0 * g[:, t]
            c1 = -ln1 + lam1 * g[:, t]
            take0 = d0 <= d1  # tie -> state 0 path
            nd0 = np.where(take0, d0, d1) + c0
            enter = d0 + trans
            take_enter = enter <= d1
            nd1 = np.where(take_enter, enter, d1) + c1
            from0[:, t] = take0
            from0b[:, t] = take_enter
            d0 = np.where(act, nd0, d0)
            d1 = np.where(act, nd1, d1)
        # backtrack per user (vectorized across users)
        state = (d1 < d0).astype(np.int8)  # final state; tie -> 0
        labels = np.zeros((m, maxg), dtype=np.int8)
        cur = state.copy()
        for t in range(maxg - 1, -1, -1):
            act = t < n_gaps
            labels[:, t] = np.where(act, cur, 0)
            prev0 = np.where(cur == 0, from0[:, t], from0b[:, t])
            nxt = np.where(prev0, 0, 1).astype(np.int8)
            cur = np.where(act, nxt, cur).astype(np.int8)
        lab = labels & gmask
        n_burst = lab.sum(axis=1).astype(np.int64)
        rised = (lab == 1) & np.concatenate(
            [np.ones((m, 1), dtype=bool), lab[:, :-1] == 0], axis=1)
        n_runs = rised.sum(axis=1).astype(np.int64)
        uid = column_i64(tbl, "user_id")[k_starts]
        return pa.table({
            "user_id": pa.array(uid),
            "n_gaps": pa.array(n_gaps.astype(np.int64)),
            "n_burst_gaps": pa.array(n_burst),
            "n_burst_runs": pa.array(n_runs)})

    return grouped_by_bucket(
        ev.map_batches(prep, batch_format="pyarrow"), bursts_of_bucket,
        entity_col="user_id", num_buckets=NB)


def _bursts_expected(df):
    """Sequential per-user Kleinberg Viterbi — independent reference."""
    import pandas as pd

    df = df.copy()
    df["ts_us"] = df["ts"].astype("int64")
    rows = []
    for uid, grp in df.sort_values(["user_id", "ts_us", "event_id"]) \
                      .groupby("user_id"):
        ts = grp["ts_us"].to_numpy().astype(np.int64)
        if ts.size < 3 or ts[-1] == ts[0]:
            continue
        gaps = np.diff(ts).astype(np.float64)
        n = gaps.size
        lam0 = float(n) / float(ts[-1] - ts[0])
        lam1 = KLEIN_S * lam0
        trans = KLEIN_GAMMA * float(np.log(float(ts.size)))
        ln0, ln1 = float(np.log(lam0)), float(np.log(lam1))
        d0, d1 = 0.0, float("inf")
        chc = []
        for gp in gaps:
            c0 = -ln0 + lam0 * gp
            c1 = -ln1 + lam1 * gp
            take0 = d0 <= d1
            nd0 = (d0 if take0 else d1) + c0
            enter = d0 + trans
            take_enter = enter <= d1
            nd1 = (enter if take_enter else d1) + c1
            chc.append((take0, take_enter))
            d0, d1 = nd0, nd1
        cur = 1 if d1 < d0 else 0
        labels = []
        for t in range(n - 1, -1, -1):
            labels.append(cur)
            take0, take_enter = chc[t]
            cur = (0 if take0 else 1) if cur == 0 \
                else (0 if take_enter else 1)
        labels = labels[::-1]
        nb = sum(labels)
        runs = sum(1 for i, v in enumerate(labels)
                   if v == 1 and (i == 0 or labels[i - 1] == 0))
        rows.append({"user_id": int(uid), "n_gaps": int(n),
                     "n_burst_gaps": int(nb), "n_burst_runs": int(runs)})
    return pd.DataFrame(rows, columns=["user_id", "n_gaps",
                                       "n_burst_gaps", "n_burst_runs"])


def q_lineitem_supplier_hhi(sf_dir: str):
    """SUPPLIER CONCENTRATION per part — the Herfindahl-Hirschman index
    of supplier quantity shares: HHI = Σ(qᵢ/T)² = Σqᵢ²/T². Two exact
    keyed_sum levels over packed int64 keys ((part, supplier) → q,
    then part → (Σq², Σq, n_suppliers)); every term is integer until
    ONE closing division, so the float is bit-exact under any
    partitioning. The antitrust-style twin of part_revenue_gini
    (share-of-squares vs rank form)."""
    from pymhealth_ray.stages.aggregate import keyed_sum

    HHI_PACK = 1 << 20

    li = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_partkey", "l_suppkey", "l_quantity"])

    def prep(b: pa.Table) -> pa.Table:
        pk = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = b["l_quantity"].to_numpy(zero_copy_only=False)
        qi = np.rint(np.asarray(q, dtype=np.float64)).astype(np.int64)
        if sk.size and (sk.min() < 0 or int(sk.max()) >= HHI_PACK):
            raise ValueError("suppkey outside HHI pack range")
        return pa.table({"ps": pa.array(pk * HHI_PACK + sk),
                         "q": pa.array(qi)})

    per_supp = keyed_sum(li.map_batches(prep, batch_format="pyarrow"),
                         "ps", ["q"], num_buckets=NB)

    def part_partial(b: pa.Table) -> pa.Table:
        ps = b["ps"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = b["q"].to_numpy(zero_copy_only=False).astype(np.int64)
        if q.size and int(np.abs(q).max()) >= 3_000_000_000:
            raise ValueError("quantity overflows int64 square")
        part = ps // HHI_PACK
        order = np.argsort(part, kind="stable")
        p_, q_ = part[order], q[order]
        st = np.flatnonzero(np.concatenate(([True], p_[1:] != p_[:-1])))
        return pa.table({
            "l_partkey": pa.array(p_[st]),
            "qq": pa.array(np.add.reduceat(q_ * q_, st)),
            "qs": pa.array(np.add.reduceat(q_, st)),
            "ns": pa.array(np.diff(np.concatenate(
                [st, [p_.size]])).astype(np.int64))})

    per_part = keyed_sum(per_supp.map_batches(
        part_partial, batch_format="pyarrow", batch_size=None),
        "l_partkey", ["qq", "qs", "ns"], num_buckets=NB,
        precombine_rows=None)

    def finish(b: pa.Table) -> pa.Table:
        qq = b["qq"].to_numpy(zero_copy_only=False).astype(np.int64)
        qs = b["qs"].to_numpy(zero_copy_only=False).astype(np.int64)
        if qs.size and int(qs.max()) >= 3_000_000_000:
            raise ValueError("total quantity overflows int64 square")
        return pa.table({
            "l_partkey": b["l_partkey"], "n_suppliers": b["ns"],
            "total_qty": pa.array(qs),
            "hhi": pa.array(_round_away(
                qq.astype(np.float64) / (qs * qs).astype(np.float64), 6))})

    return per_part.map_batches(finish, batch_format="pyarrow")


SQL_LINEITEM_SUPPLIER_HHI = """
WITH s AS (SELECT l_partkey, l_suppkey,
                  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                      AS q
           FROM lineitem GROUP BY l_partkey, l_suppkey)
SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(sum(q) AS BIGINT) AS total_qty,
       round(CAST(sum(q * q) AS DOUBLE)
             / CAST(sum(q) * sum(q) AS DOUBLE), 6) AS hhi
FROM s GROUP BY l_partkey
"""


T5_MASK_P = 0.15


def q_seq_span_corruption(sf_dir: str):
    """T5-STYLE SPAN CORRUPTION layout — the denoising-pretraining data
    transform: positions mask deterministically (md5 uniform < 0.15,
    the sample.py hash-threshold rule, so the predicate re-runs in
    SQL), maximal masked runs become spans, and the row emits the
    corrupted INPUT (span collapsed to a negative sentinel −span_idx)
    and the TARGET (sentinel followed by the span's tokens) as md5s of
    the integer sequences. Sentinels are negative ints, so both
    layouts stay int lists and reuse the vectorized Arrow join —
    map-only over the corpus, zero exchange."""
    import hashlib as _hl

    from pymhealth_ray.stages.dedup import tokens_join_key
    from pymhealth_ray.stages.sample import _hex8, _threshold_hex

    thr = _threshold_hex(T5_MASK_P)

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "tokens"])

    def corrupt(b: pa.Table) -> pa.Table:
        col = b["tokens"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = pc.list_value_length(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        nr = len(lens)
        n = flat.size
        row = np.repeat(np.arange(nr, dtype=np.int64), lens)
        row_start = np.concatenate(([0], np.cumsum(lens[:-1])))
        pos = np.arange(n, dtype=np.int64) - np.repeat(row_start, lens) + 1
        dids = b["doc_id"].to_pylist()
        tss = b["ts_ns"].to_pylist()
        keys = [f"{dids[r]}:{tss[r]}" for r in range(nr)]
        hexes = np.array([_hl.md5(f"{keys[r]}:{p}-t5".encode())
                          .hexdigest()[:8]
                          for r, p in zip(row, pos)], dtype=object) \
            if n else np.array([], dtype=object)
        masked = hexes < thr if n else np.zeros(0, dtype=bool)
        masked = np.asarray(masked, dtype=bool)
        prev = np.zeros(n, dtype=bool)
        prev[1:] = masked[:-1]
        prev[row_start[lens > 0]] = False  # row boundary resets lag
        start = masked & ~prev
        cstart = np.cumsum(start.astype(np.int64))
        spans_per_row = np.bincount(row[start], minlength=nr) \
            .astype(np.int64)
        prefix = np.concatenate(([0], np.cumsum(spans_per_row[:-1]))) \
            if nr else np.zeros(0, dtype=np.int64)
        base = np.repeat(prefix, lens)
        sidx = cstart - base  # 1-based span index within the row
        # ---- input layout: unmasked tokens + one sentinel per span
        keep_in = ~masked | start
        vals_in = np.where(start, -sidx, flat)[keep_in]
        cnt_in = np.bincount(row[keep_in], minlength=nr).astype(np.int64)
        off_in = np.concatenate(([0], np.cumsum(cnt_in))).astype(np.int32)
        in_list = pa.ListArray.from_arrays(
            pa.array(off_in, type=pa.int32()),
            pa.array(vals_in.astype(np.int32), type=pa.int32()))
        # ---- target layout: per masked pos (sentinel at span start) + v
        mrow = row[masked]
        mpos = pos[masked]
        mv = flat[masked]
        mst = start[masked]
        msx = sidx[masked]
        key2 = mpos * 2
        rows2 = np.concatenate([mrow[mst], mrow])
        keys2 = np.concatenate([key2[mst] - 1, key2])
        vals2 = np.concatenate([-msx[mst], mv])
        order2 = np.lexsort((keys2, rows2))
        vals2 = vals2[order2]
        cnt_t = (np.bincount(mrow, minlength=nr)
                 + np.bincount(mrow[mst], minlength=nr)).astype(np.int64)
        off_t = np.concatenate(([0], np.cumsum(cnt_t))).astype(np.int32)
        t_list = pa.ListArray.from_arrays(
            pa.array(off_t, type=pa.int32()),
            pa.array(vals2.astype(np.int32), type=pa.int32()))
        n_masked = np.bincount(row[masked], minlength=nr).astype(np.int64)
        n_spans = np.bincount(row[start], minlength=nr).astype(np.int64)
        in_md5 = [_hl.md5(s.encode()).hexdigest()
                  for s in tokens_join_key(in_list).to_pylist()]
        t_md5 = [_hl.md5(s.encode()).hexdigest()
                 for s in tokens_join_key(t_list).to_pylist()]
        return pa.table({
            "doc_id": b["doc_id"], "ts_ns": b["ts_ns"],
            "n_masked": pa.array(n_masked),
            "n_spans": pa.array(n_spans),
            "input_md5": pa.array(in_md5, type=pa.string()),
            "target_md5": pa.array(t_md5, type=pa.string())})

    return ds.map_batches(corrupt, batch_format="pyarrow")


def sql_seq_span_corruption(path: str) -> str:
    from pymhealth_ray.stages.sample import _threshold_hex

    thr = _threshold_hex(T5_MASK_P)
    return f"""
WITH s AS (SELECT doc_id, ts_ns, tokens
           FROM read_parquet('{path}/part-*.parquet')),
u AS (SELECT doc_id, ts_ns, unnest(tokens) AS v,
             generate_subscripts(tokens, 1) AS k FROM s),
m AS (SELECT *, substr(md5(doc_id || ':' || CAST(ts_ns AS VARCHAR)
                           || ':' || CAST(k AS VARCHAR) || '-t5'),
                       1, 8) < '{thr}' AS msk FROM u),
w AS (SELECT *, CASE WHEN msk AND NOT COALESCE(
                     lag(msk) OVER (PARTITION BY doc_id, ts_ns
                                    ORDER BY k), FALSE)
                     THEN 1 ELSE 0 END AS st FROM m),
x AS (SELECT *, CAST(sum(st) OVER (PARTITION BY doc_id, ts_ns
                                   ORDER BY k) AS BIGINT) AS sidx
      FROM w),
inp AS (SELECT doc_id, ts_ns,
               string_agg(CASE WHEN msk THEN CAST(-sidx AS VARCHAR)
                               ELSE CAST(v AS VARCHAR) END,
                          ',' ORDER BY k) AS js
        FROM x WHERE NOT msk OR st = 1 GROUP BY doc_id, ts_ns),
tgt AS (SELECT doc_id, ts_ns,
               string_agg(CASE WHEN st = 1
                               THEN CAST(-sidx AS VARCHAR) || ','
                                    || CAST(v AS VARCHAR)
                               ELSE CAST(v AS VARCHAR) END,
                          ',' ORDER BY k) AS js
        FROM x WHERE msk GROUP BY doc_id, ts_ns),
agg AS (SELECT doc_id, ts_ns,
               CAST(count(*) FILTER (WHERE msk) AS BIGINT) AS n_masked,
               CAST(sum(st) AS BIGINT) AS n_spans
        FROM x GROUP BY doc_id, ts_ns)
SELECT s.doc_id, s.ts_ns,
       CAST(COALESCE(a.n_masked, 0) AS BIGINT) AS n_masked,
       CAST(COALESCE(a.n_spans, 0) AS BIGINT) AS n_spans,
       md5(COALESCE(i.js, '')) AS input_md5,
       md5(COALESCE(t.js, '')) AS target_md5
FROM s LEFT JOIN agg a USING (doc_id, ts_ns)
LEFT JOIN inp i USING (doc_id, ts_ns)
LEFT JOIN tgt t USING (doc_id, ts_ns)
"""


def q_seq_fim_layout(sf_dir: str):
    """FILL-IN-THE-MIDDLE (PSM) layout — the infilling-pretraining
    transform: two md5-derived cut points split each sequence into
    prefix/middle/suffix and the row re-emits
    [−1] prefix [−2] suffix [−3] middle. Cut points are ALL-INTEGER
    fixed-point products ((u32 · (n+1)) >> 32), so engine and SQL
    agree bit-for-bit with no float anywhere; the reassembly is one
    vectorized scatter per batch (map-only, zero exchange); sentinels
    are negative ints so the layout reuses the Arrow int-join."""
    import hashlib as _hl

    from pymhealth_ray.stages.dedup import tokens_join_key

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "tokens"])

    def fim(b: pa.Table) -> pa.Table:
        col = b["tokens"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = pc.list_value_length(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        nr = len(lens)
        dids = b["doc_id"].to_pylist()
        tss = b["ts_ns"].to_pylist()
        u1 = np.array([int(_hl.md5(f"{dids[r]}:{tss[r]}-fim1".encode())
                           .hexdigest()[:8], 16) for r in range(nr)],
                      dtype=np.int64)
        u2 = np.array([int(_hl.md5(f"{dids[r]}:{tss[r]}-fim2".encode())
                           .hexdigest()[:8], 16) for r in range(nr)],
                      dtype=np.int64)
        c1 = (u1 * (lens + 1)) >> 32
        c2 = c1 + ((u2 * (lens - c1 + 1)) >> 32)
        row_start = np.concatenate(([0], np.cumsum(lens[:-1]))) \
            if nr else np.zeros(0, dtype=np.int64)
        out_len = lens + 3
        out_start = np.concatenate(([0], np.cumsum(out_len[:-1]))) \
            if nr else np.zeros(0, dtype=np.int64)
        total = int(out_len.sum())
        out = np.empty(total, dtype=np.int64)
        out[out_start] = -1
        out[out_start + c1 + 1] = -2
        out[out_start + c1 + (lens - c2) + 2] = -3
        n_all = flat.size
        row = np.repeat(np.arange(nr, dtype=np.int64), lens)
        k = np.arange(n_all, dtype=np.int64) - np.repeat(row_start, lens)
        c1r = c1[row]
        c2r = c2[row]
        lr = lens[row]
        outlocal = np.where(
            k < c1r, 1 + k,
            np.where(k >= c2r, c1r + 2 + (k - c2r),
                     c1r + (lr - c2r) + 3 + (k - c1r)))
        out[np.repeat(out_start, lens) + outlocal] = flat
        off = np.concatenate(([0], np.cumsum(out_len))).astype(np.int32)
        lay = pa.ListArray.from_arrays(
            pa.array(off, type=pa.int32()),
            pa.array(out.astype(np.int32), type=pa.int32()))
        md5 = [_hl.md5(s.encode()).hexdigest()
               for s in tokens_join_key(lay).to_pylist()]
        return pa.table({
            "doc_id": b["doc_id"], "ts_ns": b["ts_ns"],
            "n_tok": pa.array(lens), "c1": pa.array(c1),
            "c2": pa.array(c2),
            "fim_md5": pa.array(md5, type=pa.string())})

    return ds.map_batches(fim, batch_format="pyarrow")


def sql_seq_fim_layout(path: str) -> str:
    return f"""
WITH s AS (SELECT doc_id, ts_ns, tokens, len(tokens) AS n
           FROM read_parquet('{path}/part-*.parquet')),
c AS (SELECT doc_id, ts_ns, tokens, n,
             (('0x' || substr(md5(doc_id || ':'
                 || CAST(ts_ns AS VARCHAR) || '-fim1'), 1, 8))::BIGINT
              * (n + 1)) // 4294967296 AS c1
      FROM s),
d AS (SELECT doc_id, ts_ns, tokens, n, c1,
             c1 + (('0x' || substr(md5(doc_id || ':'
                 || CAST(ts_ns AS VARCHAR) || '-fim2'), 1, 8))::BIGINT
              * (n - c1 + 1)) // 4294967296 AS c2
      FROM c),
lay AS (SELECT doc_id, ts_ns, n, c1, c2,
               [-1] || list_slice(tokens, 1, c1) || [-2]
                    || list_slice(tokens, c2 + 1, n) || [-3]
                    || list_slice(tokens, c1 + 1, c2) AS l
        FROM d)
SELECT doc_id, ts_ns, CAST(n AS BIGINT) AS n_tok,
       CAST(c1 AS BIGINT) AS c1, CAST(c2 AS BIGINT) AS c2,
       md5(COALESCE(array_to_string(l, ','), '')) AS fim_md5
FROM lay
"""


def q_events_changepoint(sf_dir: str):
    """SINGLE CHANGE-POINT detection per user (AMOC / binary
    segmentation, mean-shift CUSUM statistic): for every split k the
    gain is G_k = (S_k − k·S_n/n)²·n/(k(n−k)) over the user's
    time-ordered cents values; the reported split maximizes G (first
    max in k order). The WHOLE G matrix is computed vectorized across
    users (padded cumsum — no per-user loop, no step loop); the
    per-user float op order equals a sequential run, so the
    single-process oracle matches bit-for-bit. Split index, the
    timestamp at the split and both segment means come out exact-int
    anchored (means are one mirrored division each)."""
    from pymhealth_ray.stages.partition import (column_i64, entity_segments,
                                                grouped_by_bucket)

    ev = _events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "val_c")
        return b.select(["event_id", "user_id", "ts_us", "val_c"])

    def cp_of_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64()),
                          "k_star": pa.array([], type=pa.int64()),
                          "split_ts": pa.array([], type=pa.int64()),
                          "mean_before_c": pa.array([], type=pa.float64()),
                          "mean_after_c": pa.array([], type=pa.float64()),
                          "gain": pa.array([], type=pa.float64())})
        if tbl.num_rows == 0:
            return empty
        tbl, starts, n_ent = entity_segments(tbl, "user_id", "ts_us",
                                             tiebreak_col="event_id")
        v = column_i64(tbl, "val_c")
        ts = column_i64(tbl, "ts_us")
        cnt = np.diff(starts)
        keep = cnt >= 4
        if not keep.any():
            return empty
        k_starts = starts[:-1][keep]
        k_cnt = cnt[keep]
        m = k_starts.size
        maxn = int(k_cnt.max())
        x = np.zeros((m, maxn), dtype=np.float64)
        cols = np.arange(maxn)[None, :]
        mask = cols < k_cnt[:, None]
        x[mask] = v[(k_starts[:, None] + cols)[mask]].astype(np.float64)
        S = np.cumsum(x, axis=1)
        n_f = k_cnt.astype(np.float64)[:, None]
        Sn = S[np.arange(m), k_cnt - 1][:, None]
        k_f = (cols + 1).astype(np.float64)
        c = S - (k_f * Sn) / n_f
        denom = k_f * (n_f - k_f)
        valid = (cols + 1 < k_cnt[:, None])
        g = np.where(valid, c * c * n_f / np.where(denom == 0, 1.0, denom),
                     -np.inf)
        k_star = np.argmax(g, axis=1) + 1  # first max, 1-based
        gain = g[np.arange(m), k_star - 1]
        sk = S[np.arange(m), k_star - 1]
        mean_b = sk / k_star.astype(np.float64)
        mean_a = (Sn[:, 0] - sk) / (k_cnt - k_star).astype(np.float64)
        split_ts = ts[k_starts + k_star - 1]
        uid = column_i64(tbl, "user_id")[k_starts]
        return pa.table({
            "user_id": pa.array(uid),
            "n": pa.array(k_cnt.astype(np.int64)),
            "k_star": pa.array(k_star.astype(np.int64)),
            "split_ts": pa.array(split_ts),
            "mean_before_c": pa.array(_round_away(mean_b, 6)),
            "mean_after_c": pa.array(_round_away(mean_a, 6)),
            "gain": pa.array(_round_away(gain, 6))})

    return grouped_by_bucket(
        ev.map_batches(prep, batch_format="pyarrow"), cp_of_bucket,
        entity_col="user_id", num_buckets=NB)


def _changepoint_expected(df):
    """Sequential per-user AMOC reference (k loop, python floats)."""
    import pandas as pd

    df = df.copy()
    df["ts_us"] = df["ts"].astype("int64")
    df["val_c"] = np.rint(df["value"].to_numpy() * 100).astype(np.int64)
    rows = []
    for uid, grp in df.sort_values(["user_id", "ts_us", "event_id"]) \
                      .groupby("user_id"):
        v = grp["val_c"].to_numpy().astype(np.float64)
        ts = grp["ts_us"].to_numpy()
        n = v.size
        if n < 4:
            continue
        Sn = 0.0
        S = []
        for val in v:
            Sn += val
            S.append(Sn)
        best_k, best_g = None, -float("inf")
        nf = float(n)
        for k in range(1, n):
            c = S[k - 1] - (float(k) * Sn) / nf
            g = c * c * nf / (float(k) * (nf - float(k)))
            if g > best_g:
                best_g, best_k = g, k
        mb = S[best_k - 1] / float(best_k)
        ma = (Sn - S[best_k - 1]) / float(n - best_k)
        rows.append({
            "user_id": int(uid), "n": int(n), "k_star": int(best_k),
            "split_ts": int(ts[best_k - 1]),
            "mean_before_c": float(_round_away(np.array([mb]), 6)[0]),
            "mean_after_c": float(_round_away(np.array([ma]), 6)[0]),
            "gain": float(_round_away(np.array([best_g]), 6)[0])})
    return pd.DataFrame(rows, columns=["user_id", "n", "k_star",
                                       "split_ts", "mean_before_c",
                                       "mean_after_c", "gain"])


def q_events_diff_in_diff(sf_dir: str):
    """DIFFERENCE-IN-DIFFERENCES per event type — the causal-readout
    completion of the A/B family (welch, cuped): arms = user_id % 2,
    periods split at the integer midpoint of the observed time range,
    DiD = (m̄ treat,post − m̄ treat,pre) − (m̄ ctrl,post − m̄ ctrl,pre).
    One bounded min/max pass pins the midpoint, one exact-int
    grouped_stats pass fills the four cells per type, and the driver
    finish mirrors the SQL double expression order."""
    from pymhealth_ray.stages.aggregate import grouped_stats

    ev = _events(sf_dir, ["user_id", "event_type", "ts", "value"])
    ev = ev.materialize()  # consumed by the range probe AND the cells

    rng_rows = grouped_stats(
        ev.map_batches(lambda b: b.select(["ts_us"]).append_column(
            "one", pa.array(np.zeros(b.num_rows, dtype=np.int64))),
            batch_format="pyarrow"),
        ["one"], min_cols=["ts_us"], max_cols=["ts_us"]).take_all()
    mn = min(r["ts_us_min"] for r in rng_rows)
    mx = max(r["ts_us_max"] for r in rng_rows)
    mid = (mn + mx) // 2

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "c")
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = b["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"event_type": b["event_type"],
                         "cell": pa.array((uid % 2) * 2
                                          + (ts >= mid).astype(np.int64)),
                         "c": b["c"]})

    stats = grouped_stats(ev.map_batches(prep, batch_format="pyarrow"),
                          ["event_type", "cell"], sum_cols=["c"],
                          count_name="n").take_all()
    cells = {}
    for r in stats:
        cells.setdefault(r["event_type"], {})[int(r["cell"])] = r
    out = {"event_type": [], "n00": [], "n01": [], "n10": [], "n11": [],
           "did": []}
    for et in sorted(cells):
        cc = cells[et]
        if any(k not in cc or cc[k]["n"] < 1 for k in range(4)):
            continue
        mns = {k: float(cc[k]["c_sum"]) / cc[k]["n"] for k in range(4)}
        did = (mns[3] - mns[2]) - (mns[1] - mns[0])
        out["event_type"].append(et)
        out["n00"].append(cc[0]["n"])
        out["n01"].append(cc[1]["n"])
        out["n10"].append(cc[2]["n"])
        out["n11"].append(cc[3]["n"])
        out["did"].append(float(_round_away(np.array([did]), 6)[0]))
    return pa.table({
        "event_type": pa.array(out["event_type"], type=pa.string()),
        "n00": pa.array(out["n00"], type=pa.int64()),
        "n01": pa.array(out["n01"], type=pa.int64()),
        "n10": pa.array(out["n10"], type=pa.int64()),
        "n11": pa.array(out["n11"], type=pa.int64()),
        "did": pa.array(out["did"], type=pa.float64())})


SQL_EVENTS_DIFF_IN_DIFF = """
WITH r AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
           FROM events),
e AS (SELECT event_type,
             (user_id % 2) * 2
                 + CASE WHEN epoch_us(ts) >= r.mid THEN 1 ELSE 0 END
                 AS cell,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events, r),
a AS (SELECT event_type, cell, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS s
      FROM e GROUP BY event_type, cell),
p AS (SELECT a0.event_type,
             a0.n AS n00, a1.n AS n01, a2.n AS n10, a3.n AS n11,
             a0.s AS s00, a1.s AS s01, a2.s AS s10, a3.s AS s11
      FROM a a0
      JOIN a a1 ON a0.event_type = a1.event_type AND a1.cell = 1
      JOIN a a2 ON a0.event_type = a2.event_type AND a2.cell = 2
      JOIN a a3 ON a0.event_type = a3.event_type AND a3.cell = 3
      WHERE a0.cell = 0)
SELECT event_type, n00, n01, n10, n11,
       round((CAST(s11 AS DOUBLE) / n11 - CAST(s10 AS DOUBLE) / n10)
             - (CAST(s01 AS DOUBLE) / n01 - CAST(s00 AS DOUBLE) / n00),
             6) AS did
FROM p
"""


def _price_relatives_ds(sf_dir: str):
    """Shared plan for the price-relative queries: per-part value/qty
    totals in each shipdate half (integer midpoint split), combined to
    one row per part through a SECOND keyed_sum (the two halves of a
    part may land in different buckets of the first), then the exact
    integer price relative rel_micro = (v1·q0·1e6) // (q1·v0)."""
    from pymhealth_ray.stages.aggregate import grouped_stats, keyed_sum

    li = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_partkey", "l_extendedprice", "l_quantity",
                             "l_shipdate"])
    li = li.materialize()  # consumed by the range probe AND the cells

    def days_of(b: pa.Table) -> np.ndarray:
        dcol = b["l_shipdate"]
        if isinstance(dcol, pa.ChunkedArray):
            dcol = dcol.combine_chunks()
        return dcol.cast(pa.date32()).cast(pa.int32()) \
            .to_numpy(zero_copy_only=False).astype(np.int64)

    rng_rows = grouped_stats(
        li.map_batches(lambda b: pa.table(
            {"d": pa.array(days_of(b)),
             "one": pa.array(np.zeros(b.num_rows, dtype=np.int64))}),
            batch_format="pyarrow"),
        ["one"], min_cols=["d"], max_cols=["d"]).take_all()
    mn = min(r["d_min"] for r in rng_rows)
    mx = max(r["d_max"] for r in rng_rows)
    mid = (mn + mx) // 2

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "l_extendedprice", "v")
        days = days_of(b)
        half = (days >= mid).astype(np.int64)
        pk = b["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = np.rint(b["l_quantity"].to_numpy(zero_copy_only=False)
                    .astype(np.float64)).astype(np.int64)
        return pa.table({"ph": pa.array(pk * 2 + half),
                         "v": pa.array(v), "q": pa.array(q)})

    halves = keyed_sum(li.map_batches(prep, batch_format="pyarrow"),
                       "ph", ["v", "q"], num_buckets=NB)

    def spread(b: pa.Table) -> pa.Table:
        ph = b["ph"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = b["q"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = ph % 2
        return pa.table({
            "l_partkey": pa.array(ph // 2),
            "v0": pa.array(np.where(h == 0, v, 0)),
            "q0": pa.array(np.where(h == 0, q, 0)),
            "v1": pa.array(np.where(h == 1, v, 0)),
            "q1": pa.array(np.where(h == 1, q, 0))})

    per_part = keyed_sum(halves.map_batches(
        spread, batch_format="pyarrow", batch_size=None),
        "l_partkey", ["v0", "q0", "v1", "q1"], num_buckets=NB,
        precombine_rows=None)

    def finish(b: pa.Table) -> pa.Table:
        v0 = b["v0"].to_numpy(zero_copy_only=False).astype(np.int64)
        q0 = b["q0"].to_numpy(zero_copy_only=False).astype(np.int64)
        v1 = b["v1"].to_numpy(zero_copy_only=False).astype(np.int64)
        q1 = b["q1"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (q0 > 0) & (q1 > 0) & (v0 > 0)
        if keep.any() and (int(v1[keep].max()) * int(q0[keep].max())
                           >= 2**62 // 1_000_000):
            raise ValueError("price relative overflows int64")
        rel = np.zeros(len(v0), dtype=np.int64)
        rel[keep] = (v1[keep] * q0[keep] * 1_000_000) \
            // (q1[keep] * v0[keep])
        out = pa.table({
            "l_partkey": b["l_partkey"],
            "v0": pa.array(v0), "q0": pa.array(q0),
            "v1": pa.array(v1), "q1": pa.array(q1),
            "rel_micro": pa.array(rel)})
        return out.filter(pa.array(keep))

    return per_part.map_batches(finish, batch_format="pyarrow")


def q_part_price_relatives(sf_dir: str):
    """PRICE RELATIVES per part between shipdate halves — the price-
    index building block: unit-value relative (v1/q1)/(v0/q0) computed
    FRACTION-FREE as (v1·q0·1e6)//(q1·v0), so the whole report is
    exact integers at any partitioning (guarded)."""
    return _price_relatives_ds(sf_dir)


SQL_PRICE_RELATIVES_BODY = """
WITH r AS (SELECT (min(datediff('day', DATE '1970-01-01',
                                CAST(l_shipdate AS DATE)))
                   + max(datediff('day', DATE '1970-01-01',
                                  CAST(l_shipdate AS DATE)))) // 2
               AS mid FROM lineitem),
e AS (SELECT l_partkey,
             CASE WHEN datediff('day', DATE '1970-01-01',
                                CAST(l_shipdate AS DATE)) >= r.mid
                  THEN 1 ELSE 0 END AS half,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
             CAST(round(l_quantity) AS BIGINT) AS q
      FROM lineitem, r),
a AS (SELECT l_partkey,
             CAST(COALESCE(sum(CASE WHEN half = 0 THEN v END), 0)
                  AS BIGINT) AS v0,
             CAST(COALESCE(sum(CASE WHEN half = 0 THEN q END), 0)
                  AS BIGINT) AS q0,
             CAST(COALESCE(sum(CASE WHEN half = 1 THEN v END), 0)
                  AS BIGINT) AS v1,
             CAST(COALESCE(sum(CASE WHEN half = 1 THEN q END), 0)
                  AS BIGINT) AS q1
      FROM e GROUP BY l_partkey),
rel AS (SELECT l_partkey, v0, q0, v1, q1,
               CAST((v1 * q0 * 1000000) // (q1 * v0) AS BIGINT)
                   AS rel_micro
        FROM a WHERE q0 > 0 AND q1 > 0 AND v0 > 0)
"""

SQL_PART_PRICE_RELATIVES = SQL_PRICE_RELATIVES_BODY + """
SELECT l_partkey, v0, q0, v1, q1, rel_micro FROM rel
"""


def q_part_price_index(sf_dir: str):
    """OVERALL PRICE INDEX — the base-quantity-weighted LOWER WEIGHTED
    MEDIAN of the per-part price relatives (a robust Laspeyres-style
    index that needs no cross-part float sum: the median pick is the
    fraction-free 2·cumw ≥ totw rule on exact integers, via
    aggregate.grouped_weighted_median over a constant group)."""
    from pymhealth_ray.stages.aggregate import grouped_weighted_median

    rel = _price_relatives_ds(sf_dir)

    def tag(b: pa.Table) -> pa.Table:
        return pa.table({
            "g": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
            "rel_micro": b["rel_micro"], "q0": b["q0"]})

    med = grouped_weighted_median(
        rel.map_batches(tag, batch_format="pyarrow"), ["g"],
        "rel_micro", "q0", num_buckets=NB,
        out_name="index_micro", total_name="total_q0")

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"index_micro": b["index_micro"].cast(pa.int64()),
                         "total_q0": b["total_q0"].cast(pa.int64())})

    return med.map_batches(finish, batch_format="pyarrow")


SQL_PART_PRICE_INDEX = SQL_PRICE_RELATIVES_BODY + """
, w AS (SELECT rel_micro, q0,
               CAST(sum(q0) OVER (ORDER BY rel_micro
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumw,
               CAST(sum(q0) OVER () AS BIGINT) AS totw
        FROM rel)
SELECT CAST(min(rel_micro) AS BIGINT) AS index_micro,
       CAST(max(totw) AS BIGINT) AS total_q0
FROM w WHERE 2 * cumw >= totw
"""


def q_embed_pq_recall(sf_dir: str):
    """PRODUCT-QUANTIZATION recall@10 — the third ANN-compression
    measurement next to IVF and int8: 4 subspaces × 16 L2 centroids
    (deterministic seeded k-means on the id-SORTED corpus — ds.limit
    order is scheduler-dependent, the round-3 IVF lesson), codebooks
    broadcast once, encode→decode map-only, then the same exact
    brute-force measurement loop as embed_quantized_recall."""
    import pyarrow.parquet as pq_mod

    ds = read_table(f"{sf_dir}/embeddings.parquet",
                    columns=["vec_id", "embedding"])
    full = pq_mod.read_table(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
    ids = np.asarray(full["vec_id"].to_pylist(), dtype=np.int64)
    order = np.argsort(ids)
    mat = np.array([np.asarray(e, dtype=np.float64)
                    for e in full["embedding"].to_pylist()])[order]
    books = ann.train_pq_codebooks(mat[:4096], m=4, k=16, iters=8,
                                   seed=11)
    queries = full.filter(pc.less(full["vec_id"], _RECALL_NQ))
    exact = ann.knn_bruteforce(ds, queries, k=_RECALL_K)
    pqd = ann.knn_bruteforce(ann.pq_embeddings(ds, books), queries,
                             k=_RECALL_K)

    def to_sets(tbl):
        out = {}
        for q, n in zip(tbl["query_id"].to_pylist(),
                        tbl["neighbor_id"].to_pylist()):
            out.setdefault(q, set()).add(n)
        return out

    a, e = to_sets(pqd), to_sets(exact)
    qids = sorted(e)
    hits = np.array([len(a.get(q, set()) & e[q]) for q in qids],
                    dtype=np.int64)
    return ray.data.from_arrow(pa.table({
        "query_id": pa.array(qids, type=pa.int64()),
        "n_hit": pa.array(hits),
        "recall": pa.array(hits / np.float64(_RECALL_K)),
    }))


def _pq_recall_expected(sf_dir: str):
    """Single-process replication: shared deterministic codebook
    training + full-matrix decode, knn_bruteforce's exact tie rule."""
    import pandas as pd
    import pyarrow.parquet as pq_mod

    from pymhealth_ray.stages.ann import (_unit, pq_decode,
                                          train_pq_codebooks)

    tbl = pq_mod.read_table(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    ids = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
    order = np.argsort(ids)
    ids_s = ids[order]
    emb = np.array([np.asarray(e, dtype=np.float64)
                    for e in tbl["embedding"].to_pylist()])[order]
    books = train_pq_codebooks(emb[:4096], m=4, k=16, iters=8, seed=11)
    q_mask = ids_s < _RECALL_NQ
    q_ids = ids_s[q_mask]
    q_mat = emb[q_mask]

    def topk_sets(corpus):
        m = _unit(corpus)
        qs = _unit(q_mat)
        sims = m @ qs.T
        out = {}
        for j, qid in enumerate(q_ids):
            s = sims[:, j]
            mask = ids_s != qid
            cand_ids, cand_s = ids_s[mask], s[mask]
            o = np.lexsort((cand_ids, -cand_s))[:_RECALL_K]
            out[int(qid)] = set(cand_ids[o].tolist())
        return out

    e = topk_sets(emb)
    a = topk_sets(pq_decode(emb, books))
    qids = sorted(e)
    hits = np.array([len(a.get(q, set()) & e[q]) for q in qids],
                    dtype=np.int64)
    return pd.DataFrame({
        "query_id": np.array(qids, dtype=np.int64),
        "n_hit": hits,
        "recall": hits / np.float64(_RECALL_K),
    })


def _pq_recall_oracle(sf_dir: str) -> str:
    import pyarrow.parquet as pq_mod

    name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/pymhealth_ray_fixtures/pq_recall_{name}_v1"
    out = os.path.join(out_dir, "expected.parquet")
    if not os.path.exists(out):
        os.makedirs(out_dir, exist_ok=True)
        exp = _pq_recall_expected(sf_dir)
        tmp = out + ".tmp"
        pq_mod.write_table(pa.Table.from_pandas(exp, preserve_index=False),
                           tmp)
        os.replace(tmp, out)
    return f"SELECT * FROM read_parquet('{out}')"


def q_events_order_violations(sf_dir: str):
    """ORDERED STATE-RULE audit — the sequence data-quality check: a
    'purchase' violates if the user has no 'view' STRICTLY EARLIER in
    (ts, event_id) order. Users co-locate in one grouped_by_bucket
    exchange; the rule is a per-segment first-view index compare
    (vectorized argmax over the sorted segment). Matches the SQL
    row_number formulation; all-integer output."""
    from pymhealth_ray.stages.partition import (column_i64, entity_segments,
                                                grouped_by_bucket)

    ev = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        et = b["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        return pa.table({
            "user_id": b["user_id"], "ts_us": b["ts_us"],
            "event_id": b["event_id"],
            "is_view": pc.equal(et, "view").cast(pa.int8()),
            "is_purchase": pc.equal(et, "purchase").cast(pa.int8())})

    def viol_of_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], type=pa.int64()),
                          "n_purchases": pa.array([], type=pa.int64()),
                          "n_violations": pa.array([], type=pa.int64())})
        if tbl.num_rows == 0:
            return empty
        tbl, starts, n_ent = entity_segments(tbl, "user_id", "ts_us",
                                             tiebreak_col="event_id")
        isv = tbl["is_view"].to_numpy(zero_copy_only=False).astype(bool)
        isp = tbl["is_purchase"].to_numpy(
            zero_copy_only=False).astype(bool)
        n = tbl.num_rows
        cnt = np.diff(starts)
        g = np.arange(n, dtype=np.int64)
        seg_of = np.repeat(np.arange(len(cnt), dtype=np.int64), cnt)
        # global index of each segment's FIRST view (n if none)
        first_view = np.full(len(cnt), n, dtype=np.int64)
        vidx = np.flatnonzero(isv)
        if vidx.size:
            vseg = seg_of[vidx]
            # vidx ascending -> keep the first per segment
            fseen = np.ones(vidx.size, dtype=bool)
            fseen[1:] = vseg[1:] != vseg[:-1]
            first_view[vseg[fseen]] = vidx[fseen]
        viol = isp & (g < first_view[seg_of])
        uid = column_i64(tbl, "user_id")[starts[:-1]]
        return pa.table({
            "user_id": pa.array(uid),
            "n_purchases": pa.array(np.bincount(
                seg_of[isp], minlength=len(cnt)).astype(np.int64)),
            "n_violations": pa.array(np.bincount(
                seg_of[viol], minlength=len(cnt)).astype(np.int64))})

    return grouped_by_bucket(
        ev.map_batches(prep, batch_format="pyarrow"), viol_of_bucket,
        entity_col="user_id", num_buckets=NB)


SQL_EVENTS_ORDER_VIOLATIONS = """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
           FROM events),
r AS (SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts_us, event_id) AS rn
      FROM e),
fv AS (SELECT user_id,
              min(CASE WHEN event_type = 'view' THEN rn END) AS first_v
       FROM r GROUP BY user_id)
SELECT r.user_id,
       CAST(count(*) FILTER (WHERE r.event_type = 'purchase') AS BIGINT)
           AS n_purchases,
       CAST(count(*) FILTER (WHERE r.event_type = 'purchase'
                             AND (fv.first_v IS NULL
                                  OR r.rn < fv.first_v)) AS BIGINT)
           AS n_violations
FROM r JOIN fv USING (user_id)
GROUP BY r.user_id
"""


def q_docs_compress_ratio(sf_dir: str):
    """COMPRESSIBILITY quality signal (the CCNet/Gopher-family
    heuristic): zlib-6 compressed size over raw size per document —
    highly repetitive boilerplate compresses far below prose.
    Stateless map over the corpus (stdlib zlib, deterministic
    bitstream for a fixed level, so the single-process oracle replays
    it byte-for-byte); all-integer output (ratio in ‰)."""
    import zlib as _zlib

    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        raw = np.array([len(t.encode()) for t in texts], dtype=np.int64)
        comp = np.array([len(_zlib.compress(t.encode(), 6))
                         for t in texts], dtype=np.int64)
        ratio = np.where(raw > 0, (comp * 1000) // np.maximum(raw, 1), 0)
        return pa.table({"doc_id": b["doc_id"],
                         "n_bytes": pa.array(raw),
                         "comp_bytes": pa.array(comp),
                         "ratio_milli": pa.array(ratio)})

    return docs.map_batches(fn, batch_format="pyarrow")


def _compress_ratio_expected(df):
    """Single-process zlib replay (same stdlib codec, same level).
    Receives the documents table as a pandas DataFrame."""
    import zlib as _zlib

    import pandas as pd

    texts = df["text"].tolist()
    dids = df["doc_id"].tolist()
    rows = []
    for d, t in zip(dids, texts):
        raw = len(t.encode())
        comp = len(_zlib.compress(t.encode(), 6))
        rows.append({"doc_id": d, "n_bytes": raw, "comp_bytes": comp,
                     "ratio_milli": (comp * 1000) // raw if raw else 0})
    return pd.DataFrame(rows, columns=["doc_id", "n_bytes",
                                       "comp_bytes", "ratio_milli"])


def q_part_skyline3(sf_dir: str):
    """3-D PARETO FRONT over parts — minimize catalog price, maximize
    total quantity sold, maximize revenue: the n-dimensional
    generalization of part_skyline through stages/skyline.skyline_nd
    (same zero-exchange local-front-union plan; chunked
    block-nested-loop kernel, python work O(n/2048) per block).
    Per-part aggregates are ONE keyed_sum; the catalog price joins via
    the broadcast dimension lookup (part is a dimension table)."""
    import pyarrow.parquet as _pq
    import ray as _ray

    from pymhealth_ray.stages.aggregate import keyed_sum
    from pymhealth_ray.stages.skyline import skyline_nd

    li = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_partkey", "l_quantity",
                             "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "l_extendedprice", "rev")
        q = np.rint(b["l_quantity"].to_numpy(zero_copy_only=False)
                    .astype(np.float64)).astype(np.int64)
        return pa.table({"l_partkey": b["l_partkey"],
                         "qty": pa.array(q), "rev": b["rev"]})

    agg = keyed_sum(li.map_batches(prep, batch_format="pyarrow"),
                    "l_partkey", ["qty", "rev"], num_buckets=NB)

    part = _pq.read_table(f"{sf_dir}/part.parquet",
                          columns=["p_partkey", "p_retailprice"])
    pk = part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    pr = np.rint(np.asarray(part["p_retailprice"].to_pylist(),
                            dtype=np.float64) * 100).astype(np.int64)
    order = np.argsort(pk)
    price_ref = _ray.put((pk[order], pr[order]))

    def tag_price(b: pa.Table) -> pa.Table:
        keys, prices = _ray.get(price_ref)
        k = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(keys, k)
        idx_c = np.minimum(idx, keys.size - 1)
        hit = keys[idx_c] == k
        out = pa.table({"l_partkey": pa.array(k),
                        "price_c": pa.array(prices[idx_c]),
                        "total_qty": b["qty"], "revenue_c": b["rev"]})
        return out.filter(pa.array(hit))

    tagged = agg.map_batches(tag_price, batch_format="pyarrow")
    return skyline_nd(tagged, min_cols=["price_c"],
                      max_cols=["total_qty", "revenue_c"])


SQL_PART_SKYLINE3 = """
WITH a AS (SELECT l_partkey,
                  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                      AS qty,
                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                       AS BIGINT) AS rev
           FROM lineitem GROUP BY l_partkey),
j AS (SELECT a.l_partkey,
             CAST(round(p.p_retailprice * 100) AS BIGINT) AS price_c,
             a.qty, a.rev
      FROM a JOIN part p ON a.l_partkey = p.p_partkey)
SELECT x.l_partkey, x.price_c, x.qty AS total_qty, x.rev AS revenue_c
FROM j x
WHERE NOT EXISTS (
    SELECT 1 FROM j y
    WHERE y.price_c <= x.price_c AND y.qty >= x.qty AND y.rev >= x.rev
      AND (y.price_c < x.price_c OR y.qty > x.qty OR y.rev > x.rev))
"""


DUPRATE_SEED_P = 0.08
DUPRATE_SAMPLE_P = 0.2


def q_seq_dup_rate_estimate(sf_dir: str):
    """SAMPLING-BASED DUP-RATE ESTIMATION vs exact — the planning
    report a 100 TB dedup run starts with: can a 20% hash sample
    predict the corpus duplicate rate? Duplicates are seeded
    deterministically (md5-rule 8% of docs re-emitted — the fixture
    has no natural payload dups); both the full corpus and the sample
    (the SAME sample.py hash-threshold predicate SQL runs) count exact
    distinct payload md5s through the pair-hash co-located distinct
    plan (grouped_distinct_count — per-bucket uniques sum globally
    exact). One row out: counts, both rates and the estimation error
    (mirrored double expressions)."""
    import hashlib as _hl

    from pymhealth_ray.stages.dedup import tokens_join_key
    from pymhealth_ray.stages.sample import _hex8, _threshold_hex

    thr_seed = _threshold_hex(DUPRATE_SEED_P)
    thr_samp = _threshold_hex(DUPRATE_SAMPLE_P)

    ds, _ = _seq_ds(sf_dir, ["doc_id", "tokens"])

    def aug(b: pa.Table) -> pa.Table:
        joined = tokens_join_key(b["tokens"]).to_pylist()
        pm = [_hl.md5(s.encode()).hexdigest() for s in joined]
        dids = b["doc_id"].to_pylist()
        seed = _hex8(b["doc_id"], "dupseed") < thr_seed
        out_ids = dids + [f"{d}#d" for d, s in zip(dids, seed) if s]
        out_pm = pm + [p for p, s in zip(pm, seed) if s]
        return pa.table({"doc_id": pa.array(out_ids, type=pa.string()),
                         "pm": pa.array(out_pm, type=pa.string())})

    aug_ds = ds.map_batches(aug, batch_format="pyarrow").materialize()

    from pymhealth_ray.stages.partition import _stable_bucket_of

    def counts_of(d):
        # exact distinct over STRING md5s: block-unique -> md5-hash
        # bucket exchange -> per-bucket unique count, summed (every
        # copy of a value lands in one bucket, so the sum is exact)
        n = d.count()

        def block_unique(b: pa.Table) -> pa.Table:
            pm = b["pm"]
            if isinstance(pm, pa.ChunkedArray):
                pm = pm.combine_chunks()
            u = pc.unique(pm)
            t = pa.table({"pm": u})
            bk = _stable_bucket_of(t["pm"], NB)
            return t.append_column("__b", pa.array(bk, type=pa.int32()))

        def bucket_count(tbl: pa.Table) -> pa.Table:
            pm = tbl["pm"]
            if isinstance(pm, pa.ChunkedArray):
                pm = pm.combine_chunks()
            return pa.table({"d": pa.array(
                [len(pc.unique(pm))], type=pa.int64())})

        rows = d.map_batches(block_unique, batch_format="pyarrow",
                             batch_size=None).groupby("__b").map_groups(
            bucket_count, batch_format="pyarrow").take_all()
        return n, int(sum(r["d"] for r in rows))

    full_n, full_d = counts_of(aug_ds)

    def samp(b: pa.Table) -> pa.Table:
        keep = _hex8(b["doc_id"], "0") < thr_samp
        return b.filter(pa.array(keep.astype(bool)))

    samp_n, samp_d = counts_of(
        aug_ds.map_batches(samp, batch_format="pyarrow"))

    fr = float(full_n - full_d) / full_n
    sr = float(samp_n - samp_d) / samp_n
    return pa.table({
        "full_docs": pa.array([full_n], type=pa.int64()),
        "full_distinct": pa.array([full_d], type=pa.int64()),
        "sample_docs": pa.array([samp_n], type=pa.int64()),
        "sample_distinct": pa.array([samp_d], type=pa.int64()),
        "full_rate": pa.array([float(_round_away(np.array([fr]), 6)[0])]),
        "sample_rate": pa.array(
            [float(_round_away(np.array([sr]), 6)[0])]),
        "rate_err": pa.array(
            [float(_round_away(np.array([abs(fr - sr)]), 6)[0])])})


def sql_seq_dup_rate_estimate(path: str) -> str:
    from pymhealth_ray.stages.sample import _threshold_hex

    thr_seed = _threshold_hex(DUPRATE_SEED_P)
    thr_samp = _threshold_hex(DUPRATE_SAMPLE_P)
    return f"""
WITH base AS (SELECT doc_id,
                     md5(COALESCE(array_to_string(tokens, ','), ''))
                         AS pm
              FROM read_parquet('{path}/part-*.parquet')),
aug AS (SELECT doc_id, pm FROM base
        UNION ALL
        SELECT doc_id || '#d', pm FROM base
        WHERE substr(md5(doc_id || '-dupseed'), 1, 8) < '{thr_seed}'),
f AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT pm) AS BIGINT) AS d FROM aug),
s AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT pm) AS BIGINT) AS d FROM aug
      WHERE substr(md5(doc_id || '-0'), 1, 8) < '{thr_samp}')
SELECT f.n AS full_docs, f.d AS full_distinct,
       s.n AS sample_docs, s.d AS sample_distinct,
       round(CAST(f.n - f.d AS DOUBLE) / f.n, 6) AS full_rate,
       round(CAST(s.n - s.d AS DOUBLE) / s.n, 6) AS sample_rate,
       round(abs(CAST(f.n - f.d AS DOUBLE) / f.n
                 - CAST(s.n - s.d AS DOUBLE) / s.n), 6) AS rate_err
FROM f, s
"""


N_SHARDS = 64


def q_seq_shard_balance(sf_dir: str):
    """TRAINING-SHARD BALANCE report — the pre-flight check of a
    distributed training run: docs assign to 64 shards by md5 (the
    same deterministic keyed-hash rule every job re-derives), and the
    report shows per-shard doc/token counts and the integer token
    share (‰). Map-only partials + one keyed_sum; assignment is
    per-DISTINCT-doc md5 (dictionary-encoded), never per token."""
    import hashlib as _hl

    from pymhealth_ray.stages.aggregate import keyed_sum

    ds, _ = _seq_ds(sf_dir, ["doc_id", "tokens"])

    def partial(b: pa.Table) -> pa.Table:
        did = b["doc_id"]
        if isinstance(did, pa.ChunkedArray):
            did = did.combine_chunks()
        enc = did.dictionary_encode()
        shard_of = np.array(
            [int(_hl.md5(f"{v}-shard".encode()).hexdigest()[:8], 16)
             % N_SHARDS for v in enc.dictionary.to_pylist()],
            dtype=np.int64)
        shard = shard_of[enc.indices.to_numpy(zero_copy_only=False)]
        nt = pc.list_value_length(b["tokens"]).to_numpy(
            zero_copy_only=False).astype(np.int64)
        vals, inv = np.unique(shard, return_inverse=True)
        return pa.table({
            "shard": pa.array(vals),
            "n_docs": pa.array(np.bincount(
                inv, minlength=vals.size).astype(np.int64)),
            "n_tokens": pa.array(np.bincount(
                inv, weights=nt, minlength=vals.size).astype(np.int64))})

    rows = keyed_sum(ds.map_batches(partial, batch_format="pyarrow",
                                    batch_size=None),
                     "shard", ["n_docs", "n_tokens"], num_buckets=NB,
                     precombine_rows=None).take_all()
    sh = np.array([r["shard"] for r in rows], dtype=np.int64)
    nd = np.array([r["n_docs"] for r in rows], dtype=np.int64)
    nt = np.array([r["n_tokens"] for r in rows], dtype=np.int64)
    order = np.argsort(sh)
    sh, nd, nt = sh[order], nd[order], nt[order]
    tot = int(nt.sum())
    return pa.table({"shard": pa.array(sh), "n_docs": pa.array(nd),
                     "n_tokens": pa.array(nt),
                     "share_milli": pa.array((nt * 1000) // tot)})


def sql_seq_shard_balance(path: str) -> str:
    return f"""
WITH s AS (SELECT (('0x' || substr(md5(doc_id || '-shard'), 1, 8))::BIGINT
                   % {N_SHARDS}) AS shard,
                  len(tokens) AS nt
           FROM read_parquet('{path}/part-*.parquet')),
a AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(nt) AS BIGINT) AS n_tokens
      FROM s GROUP BY shard),
t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM a)
SELECT a.shard, a.n_docs, a.n_tokens,
       CAST((a.n_tokens * 1000) // t.tot AS BIGINT) AS share_milli
FROM a, t
"""


def q_events_anomaly_panel(sf_dir: str):
    """ANOMALY DETECTOR PANEL per user — the triage report combining
    three flag families in ONE pass shape: (a) univariate 3σ on cents
    within the event type (broadcast exact-int stats), (b) the 2-D
    Mahalanobis flag m² > 9 on (cents, hour) with the same closed-form
    expression as events_mahalanobis, and (c) the ALL-INTEGER gap rule
    gap·n_gaps > 3·span (gap > 3× the user's own mean gap,
    fraction-free). One bounded type-stats pass + one user-bucket
    exchange; every float compare is the SQL expression verbatim."""
    from pymhealth_ray.stages.aggregate import grouped_stats
    from pymhealth_ray.stages.partition import (column_i64, entity_segments,
                                                grouped_by_bucket)

    HOUR_US = 3_600_000_000

    ev = _events(sf_dir, ["event_id", "user_id", "event_type", "ts",
                          "value"])
    ev = ev.materialize()  # stats pass AND panel pass

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "x")
        xv = b["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        if xv.size and int(np.abs(xv).max()) >= 3_000_000_000:
            raise ValueError("cents magnitude overflows int64 square")
        ts = b["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        yv = (ts // HOUR_US) % 24
        return pa.table({"event_id": b["event_id"],
                         "user_id": b["user_id"],
                         "event_type": b["event_type"],
                         "ts_us": b["ts_us"],
                         "x": pa.array(xv), "y": pa.array(yv),
                         "xx": pa.array(xv * xv), "yy": pa.array(yv * yv),
                         "xy": pa.array(xv * yv)})

    src = ev.map_batches(prep, batch_format="pyarrow")
    stats = grouped_stats(src, ["event_type"],
                          sum_cols=["x", "y", "xx", "yy", "xy"],
                          count_name="n").take_all()
    params = {}
    for r in stats:
        n = r["n"]
        if n < 3:
            continue
        sx, sy = float(r["x_sum"]), float(r["y_sum"])
        sxx, syy = float(r["xx_sum"]), float(r["yy_sum"])
        sxy = float(r["xy_sum"])
        mx, my = sx / n, sy / n
        cxx = (sxx - sx * (sx / n)) / (n - 1)
        cyy = (syy - sy * (sy / n)) / (n - 1)
        cxy = (sxy - sx * (sy / n)) / (n - 1)
        params[r["event_type"]] = (mx, my, cxx, cyy, cxy)
    import ray as _ray

    p_ref = _ray.put(params)

    def panel_of_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], type=pa.int64()),
                          "n_events": pa.array([], type=pa.int64()),
                          "n_z": pa.array([], type=pa.int64()),
                          "n_m2": pa.array([], type=pa.int64()),
                          "n_gap": pa.array([], type=pa.int64())})
        if tbl.num_rows == 0:
            return empty
        pm = _ray.get(p_ref)
        tbl, starts, n_ent = entity_segments(tbl, "user_id", "ts_us",
                                             tiebreak_col="event_id")
        et = tbl["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        dvals = enc.dictionary.to_pylist()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        have = np.array([t in pm for t in dvals], dtype=bool)[idx]
        arr = np.array([pm.get(t, (0.0, 0.0, 1.0, 1.0, 0.0))
                        for t in dvals], dtype=np.float64)
        mx, my, cxx, cyy, cxy = (arr[idx, k] for k in range(5))
        x = tbl["x"].to_numpy(zero_copy_only=False).astype(np.float64)
        y = tbl["y"].to_numpy(zero_copy_only=False).astype(np.float64)
        zf = have & (np.abs(x - mx) > 3.0 * np.sqrt(cxx))
        dx = x - mx
        dy = y - my
        det = cxx * cyy - cxy * cxy
        m2 = (dx * dx * cyy - 2.0 * dx * dy * cxy
              + dy * dy * cxx) / np.where(det == 0, 1.0, det)
        m2f = have & (det != 0) & (m2 > 9.0)
        ts = column_i64(tbl, "ts_us")
        cnt = np.diff(starts)
        seg_of = np.repeat(np.arange(len(cnt), dtype=np.int64), cnt)
        n = tbl.num_rows
        gap = np.zeros(n, dtype=np.int64)
        gap[1:] = ts[1:] - ts[:-1]
        is_first = np.zeros(n, dtype=bool)
        is_first[starts[:-1]] = True
        gap[is_first] = 0
        span = ts[starts[1:] - 1] - ts[starts[:-1]]
        n_gaps = cnt - 1
        gapf = (~is_first) & (n_gaps[seg_of] >= 1) \
            & (gap * n_gaps[seg_of] > 3 * span[seg_of])
        uid = column_i64(tbl, "user_id")[starts[:-1]]
        return pa.table({
            "user_id": pa.array(uid),
            "n_events": pa.array(cnt.astype(np.int64)),
            "n_z": pa.array(np.bincount(
                seg_of[zf], minlength=len(cnt)).astype(np.int64)),
            "n_m2": pa.array(np.bincount(
                seg_of[m2f], minlength=len(cnt)).astype(np.int64)),
            "n_gap": pa.array(np.bincount(
                seg_of[gapf], minlength=len(cnt)).astype(np.int64))})

    return grouped_by_bucket(src, panel_of_bucket,
                             entity_col="user_id", num_buckets=NB)


SQL_EVENTS_ANOMALY_PANEL = """
WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
                  CAST(round(value * 100) AS BIGINT) AS x,
                  (epoch_us(ts) // 3600000000) % 24 AS y
           FROM events),
a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM e GROUP BY event_type),
p AS (SELECT event_type,
             CAST(sx AS DOUBLE) / n AS mx, CAST(sy AS DOUBLE) / n AS my,
             (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                  * (CAST(sx AS DOUBLE) / n)) / (n - 1) AS cxx,
             (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                  * (CAST(sy AS DOUBLE) / n)) / (n - 1) AS cyy,
             (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                  * (CAST(sy AS DOUBLE) / n)) / (n - 1) AS cxy
      FROM a WHERE n >= 3),
f AS (SELECT e.user_id, e.event_id,
             CASE WHEN abs(e.x - p.mx) > 3.0 * sqrt(p.cxx)
                  THEN 1 ELSE 0 END AS zf,
             CASE WHEN p.cxx * p.cyy - p.cxy * p.cxy <> 0 AND
                  ((e.x - p.mx) * (e.x - p.mx) * p.cyy
                   - 2.0 * (e.x - p.mx) * (e.y - p.my) * p.cxy
                   + (e.y - p.my) * (e.y - p.my) * p.cxx)
                  / (p.cxx * p.cyy - p.cxy * p.cxy) > 9.0
                  THEN 1 ELSE 0 END AS m2f
      FROM e JOIN p USING (event_type)),
g AS (SELECT user_id, event_id, ts_us,
             ts_us - lag(ts_us) OVER w AS gap,
             CAST(count(*) OVER (PARTITION BY user_id) - 1 AS BIGINT)
                 AS n_gaps,
             CAST(max(ts_us) OVER (PARTITION BY user_id)
                  - min(ts_us) OVER (PARTITION BY user_id) AS BIGINT)
                 AS span
      FROM e WINDOW w AS (PARTITION BY user_id
                          ORDER BY ts_us, event_id)),
gf AS (SELECT user_id,
              CAST(count(*) FILTER (WHERE gap IS NOT NULL
                   AND n_gaps >= 1 AND gap * n_gaps > 3 * span)
                   AS BIGINT) AS n_gap,
              CAST(count(*) AS BIGINT) AS n_events
       FROM g GROUP BY user_id),
zz AS (SELECT e.user_id,
              CAST(COALESCE(sum(f.zf), 0) AS BIGINT) AS n_z,
              CAST(COALESCE(sum(f.m2f), 0) AS BIGINT) AS n_m2
       FROM e LEFT JOIN f USING (event_id) GROUP BY e.user_id)
SELECT gf.user_id, gf.n_events, zz.n_z, zz.n_m2, gf.n_gap
FROM gf JOIN zz ON gf.user_id = zz.user_id
"""


WINNOW_K = 5      # k-gram length
WINNOW_W = 8      # winnowing window
WINNOW_BASE = 2048  # > max token id; 2048^4 < 2^63 keeps packs exact


def q_seq_winnow_fingerprints(sf_dir: str):
    """WINNOWING document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm — the 11th fingerprinting/dedup modality): each
    position's token 5-gram packs COLLISION-FREE into int64
    (Σ tᵢ·2048^i, the repeated-spans trick — no hash, so SQL computes
    the identical value), and every 8-gram window keeps its MINIMUM;
    the doc's fingerprint set is the distinct window minima. Map-only
    (numpy sliding_window_view min per batch, zero exchange); emits
    per doc the k-gram count, fingerprint count and the md5 of the
    sorted fingerprint list — byte-equal to the SQL window-min
    formulation."""
    import hashlib as _hl

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "tokens"])

    def winnow(b: pa.Table) -> pa.Table:
        col = b["tokens"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = pc.list_value_length(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        if flat.size and int(flat.max()) >= WINNOW_BASE:
            raise ValueError("token id exceeds winnowing pack base")
        nr = len(lens)
        n_kgrams = np.maximum(lens - WINNOW_K + 1, 0)
        n_fp = np.zeros(nr, dtype=np.int64)
        md5s = []
        off = np.concatenate(([0], np.cumsum(lens)))
        for r in range(nr):
            seq = flat[off[r]:off[r + 1]]
            if seq.size < WINNOW_K:
                md5s.append(_hl.md5(b"").hexdigest())
                continue
            sw = np.lib.stride_tricks.sliding_window_view(seq, WINNOW_K)
            packs = (sw * (WINNOW_BASE ** np.arange(WINNOW_K,
                                                    dtype=np.int64))
                     ).sum(axis=1)
            if packs.size >= WINNOW_W:
                wins = np.lib.stride_tricks.sliding_window_view(
                    packs, WINNOW_W).min(axis=1)
            else:
                wins = np.array([packs.min()], dtype=np.int64)
            fps = np.unique(wins)
            n_fp[r] = fps.size
            md5s.append(_hl.md5(
                ",".join(map(str, fps.tolist())).encode()).hexdigest())
        return pa.table({
            "doc_id": b["doc_id"], "ts_ns": b["ts_ns"],
            "n_kgrams": pa.array(n_kgrams),
            "n_fingerprints": pa.array(n_fp),
            "fp_md5": pa.array(md5s, type=pa.string())})

    return ds.map_batches(winnow, batch_format="pyarrow")


def sql_seq_winnow_fingerprints(path: str) -> str:
    pack_expr = " + ".join(
        f"CAST(tokens[k + {i}] AS BIGINT) * {WINNOW_BASE ** i}"
        for i in range(WINNOW_K))
    return f"""
WITH s AS (SELECT doc_id, ts_ns, tokens, len(tokens) AS n
           FROM read_parquet('{path}/part-*.parquet')),
g AS (SELECT doc_id, ts_ns, k, {pack_expr} AS pk
      FROM s, LATERAL unnest(generate_series(1, n - {WINNOW_K - 1}))
               AS u(k)
      WHERE n >= {WINNOW_K}),
w AS (SELECT doc_id, ts_ns, k,
             min(pk) OVER (PARTITION BY doc_id, ts_ns ORDER BY k
                           ROWS BETWEEN CURRENT ROW
                           AND {WINNOW_W - 1} FOLLOWING) AS wmin,
             count(*) OVER (PARTITION BY doc_id, ts_ns) AS npk
      FROM g),
fp AS (SELECT doc_id, ts_ns,
              list_sort(array_agg(DISTINCT wmin)) AS fps
       FROM w WHERE k <= npk - {WINNOW_W - 1}
          OR (npk < {WINNOW_W} AND k = 1)
       GROUP BY doc_id, ts_ns),
fpx AS (SELECT doc_id, ts_ns,
               CAST(len(fps) AS BIGINT) AS n_fingerprints,
               md5(array_to_string(fps, ',')) AS fp_md5
        FROM fp)
SELECT s.doc_id, s.ts_ns,
       CAST(greatest(s.n - {WINNOW_K - 1}, 0) AS BIGINT) AS n_kgrams,
       CAST(COALESCE(f.n_fingerprints, 0) AS BIGINT) AS n_fingerprints,
       COALESCE(f.fp_md5, md5('')) AS fp_md5
FROM s LEFT JOIN fpx f USING (doc_id, ts_ns)
"""


_HARDNEG_NQ = 30
_HARDNEG_K = 5


def q_embed_hard_negatives(sf_dir: str):
    """HARD-NEGATIVE MINING for retrieval training: for each query
    vector, the top-k most-similar corpus vectors with a DIFFERENT
    label — the pairs a contrastive fine-tune needs most. Exact plan:
    one brute-force pass per query-label group against the
    label-pruned corpus (labels are bounded; each pass reads only the
    complement — at 100 TB the complement filter rides the label
    partitioning), same tie rule as embed_knn."""
    import pyarrow.parquet as pq_mod

    ds = read_table(f"{sf_dir}/embeddings.parquet",
                    columns=["vec_id", "embedding", "label"])
    full = pq_mod.read_table(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding", "label"])
    queries = full.filter(pc.less(full["vec_id"], _HARDNEG_NQ))
    out = []
    labels = sorted(set(queries["label"].to_pylist()))
    for lab in labels:
        qs = queries.filter(pc.equal(queries["label"], lab))
        sub = ds.map_batches(
            lambda b, _l=lab: b.filter(pc.not_equal(b["label"], _l)),
            batch_format="pyarrow")
        topk = ann.knn_bruteforce(sub, qs.select(["vec_id", "embedding"]),
                                  k=_HARDNEG_K)
        out.append(topk)
    res = pa.concat_tables(out)
    order = pc.sort_indices(res, sort_keys=[("query_id", "ascending"),
                                            ("cosine", "descending"),
                                            ("neighbor_id", "ascending")])
    res = res.take(order)
    return _round_cols(res, {"cosine": 4})


SQL_EMBED_HARD_NEGATIVES = f"""
WITH q AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings WHERE vec_id < {_HARDNEG_NQ}),
n AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings),
s AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
             list_cosine_similarity(q.e, n.e) AS sim,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY list_cosine_similarity(q.e, n.e)
                                    DESC, n.vec_id) AS rnk
      FROM q JOIN n ON q.label <> n.label)
SELECT query_id, neighbor_id, round(sim, 4) AS cosine
FROM s WHERE rnk <= {_HARDNEG_K}
"""


SRC_SIM_TOPK = 200


def q_seq_source_similarity(sf_dir: str):
    """CROSS-SOURCE VOCABULARY SIMILARITY — the mixture-planning
    report: Jaccard overlap between each pair of sources' top-200
    token sets (count DESC, token ASC ties — fully deterministic on
    exact integers). Per-(source, token) counts are bounded by
    |sources|·|vocab| (never corpus-sized): one keyed_sum over packed
    keys, a bounded driver top-k per source, and the pairwise fold.
    The integer n_common/n_union pair anchors the one float."""
    from pymhealth_ray.stages.aggregate import grouped_stats, keyed_sum

    ds, _ = _seq_ds(sf_dir, ["source", "tokens"])
    ds = ds.materialize()  # source-list probe AND the count pass

    src_rows = grouped_stats(
        ds.map_batches(lambda b: b.select(["source"]),
                       batch_format="pyarrow"), ["source"]).take_all()
    sources = sorted(r["source"] for r in src_rows)
    smap = {s: i for i, s in enumerate(sources)}
    SPACK = 1 << 20

    import ray as _ray

    smap_ref = _ray.put(smap)

    def partial(b: pa.Table) -> pa.Table:
        sm = _ray.get(smap_ref)
        col = b["tokens"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = pc.list_value_length(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        if flat.size and int(flat.max()) >= SPACK:
            raise ValueError("token id exceeds source-sim pack range")
        src = b["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = src.dictionary_encode()
        si_of = np.array([sm[s] for s in enc.dictionary.to_pylist()],
                         dtype=np.int64)
        si = si_of[enc.indices.to_numpy(zero_copy_only=False)]
        key = np.repeat(si, lens) * SPACK + flat
        vals, cnts = np.unique(key, return_counts=True)
        return pa.table({"st": pa.array(vals),
                         "c": pa.array(cnts.astype(np.int64))})

    rows = keyed_sum(ds.map_batches(partial, batch_format="pyarrow",
                                    batch_size=None),
                     "st", ["c"], num_buckets=NB,
                     precombine_rows=None).take_all()
    st = np.array([r["st"] for r in rows], dtype=np.int64)
    c = np.array([r["c"] for r in rows], dtype=np.int64)
    si = st // SPACK
    tok = st % SPACK
    tops = {}
    for i, s in enumerate(sources):
        m = si == i
        order = np.lexsort((tok[m], -c[m]))[:SRC_SIM_TOPK]
        tops[s] = set(tok[m][order].tolist())
    out = {"source_a": [], "source_b": [], "n_common": [],
           "n_union": [], "jaccard": []}
    for i in range(len(sources)):
        for j in range(i + 1, len(sources)):
            a, b_ = tops[sources[i]], tops[sources[j]]
            inter = len(a & b_)
            union = len(a | b_)
            out["source_a"].append(sources[i])
            out["source_b"].append(sources[j])
            out["n_common"].append(inter)
            out["n_union"].append(union)
            out["jaccard"].append(float(_round_away(
                np.array([inter / union]), 6)[0]))
    return pa.table({
        "source_a": pa.array(out["source_a"], type=pa.string()),
        "source_b": pa.array(out["source_b"], type=pa.string()),
        "n_common": pa.array(out["n_common"], type=pa.int64()),
        "n_union": pa.array(out["n_union"], type=pa.int64()),
        "jaccard": pa.array(out["jaccard"], type=pa.float64())})


def sql_seq_source_similarity(path: str) -> str:
    return f"""
WITH u AS (SELECT source, unnest(tokens) AS v
           FROM read_parquet('{path}/part-*.parquet')),
c AS (SELECT source, v, count(*) AS c FROM u GROUP BY source, v),
r AS (SELECT source, v,
             row_number() OVER (PARTITION BY source
                                ORDER BY c DESC, v ASC) AS rn
      FROM c),
t AS (SELECT source, v FROM r WHERE rn <= {SRC_SIM_TOPK}),
pairs AS (SELECT a.source AS source_a, b.source AS source_b,
                 CAST(count(*) AS BIGINT) AS n_common
          FROM t a JOIN t b ON a.v = b.v AND a.source < b.source
          GROUP BY a.source, b.source),
sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n
          FROM t GROUP BY source)
SELECT p.source_a, p.source_b, p.n_common,
       CAST(sa.n + sb.n - p.n_common AS BIGINT) AS n_union,
       round(CAST(p.n_common AS DOUBLE)
             / (sa.n + sb.n - p.n_common), 6) AS jaccard
FROM pairs p JOIN sizes sa ON p.source_a = sa.source
JOIN sizes sb ON p.source_b = sb.source
"""


def q_events_transition_dwell(sf_dir: str):
    """DWELL TIME per event-type transition — the journey-timing
    report: for every (from → to) pair, how many transitions and the
    mean gap. Users co-locate in one grouped_by_bucket exchange;
    transitions are adjacent rows of the sorted segment; partials are
    exact int (Σgap, n) per string pair through grouped_stats and the
    one mean division mirrors SQL."""
    from pymhealth_ray.stages.aggregate import grouped_stats
    from pymhealth_ray.stages.partition import (column_i64, entity_segments,
                                                grouped_by_bucket)

    ev = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        return b.select(["event_id", "user_id", "event_type", "ts_us"])

    def trans_of_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"t_from": pa.array([], type=pa.string()),
                          "t_to": pa.array([], type=pa.string()),
                          "gap": pa.array([], type=pa.int64())})
        if tbl.num_rows == 0:
            return empty
        tbl, starts, n_ent = entity_segments(tbl, "user_id", "ts_us",
                                             tiebreak_col="event_id")
        n = tbl.num_rows
        ts = column_i64(tbl, "ts_us")
        is_last = np.zeros(n, dtype=bool)
        is_last[starts[1:] - 1] = True
        a = np.flatnonzero(~is_last)
        if a.size == 0:
            return empty
        et = tbl["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        return pa.table({
            "t_from": et.take(pa.array(a)),
            "t_to": et.take(pa.array(a + 1)),
            "gap": pa.array(ts[a + 1] - ts[a])})

    trans = grouped_by_bucket(
        ev.map_batches(prep, batch_format="pyarrow"), trans_of_bucket,
        entity_col="user_id", num_buckets=NB)
    agg = grouped_stats(trans, ["t_from", "t_to"], sum_cols=["gap"],
                        count_name="n")

    def finish(b: pa.Table) -> pa.Table:
        s = b["gap_sum"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "t_from": b["t_from"], "t_to": b["t_to"],
            "n": pa.array(n),
            "mean_gap_us": pa.array(_round_away(
                s / n.astype(np.float64), 6))})

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_TRANSITION_DWELL = """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
           FROM events),
t AS (SELECT event_type AS t_to,
             lag(event_type) OVER w AS t_from,
             ts_us - lag(ts_us) OVER w AS gap
      FROM e WINDOW w AS (PARTITION BY user_id
                          ORDER BY ts_us, event_id))
SELECT t_from, t_to, CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(gap) AS DOUBLE) / count(*), 6) AS mean_gap_us
FROM t WHERE t_from IS NOT NULL GROUP BY t_from, t_to
"""


def q_events_auc(sf_dir: str):
    """Per-day exact ROC-AUC of value as a purchase predictor — the
    distributed eval-metric primitive (stages/mleval.grouped_auc):
    Mann-Whitney rank statistic, integer-exact numerator (doubled
    tie-averaged ranks), one closing IEEE divide mirrored by SQL."""
    from pymhealth_ray.stages.mleval import grouped_auc

    ev = _events(sf_dir, ["ts", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        ts = b["ts_us"].to_numpy(zero_copy_only=False)
        lab = pc.cast(pc.equal(b["event_type"], "purchase"), pa.int64())
        return pa.table({"day": pa.array(ts // 86_400_000_000),
                         "lab": lab, "score": b["value"]})

    return grouped_auc(ev.map_batches(prep, batch_format="pyarrow"),
                       "day", "lab", "score", num_buckets=NB)


SQL_EVENTS_AUC = """
WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day, value AS score,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                    AS lab
           FROM events),
r AS (SELECT day, lab,
             2 * RANK() OVER (PARTITION BY day ORDER BY score)
               + COUNT(*) OVER (PARTITION BY day, score) - 1 AS ar2
      FROM e),
g AS (SELECT day,
             CAST(sum(CASE WHEN lab = 1 THEN ar2 ELSE 0 END) AS BIGINT)
               AS sp2,
             CAST(sum(lab) AS BIGINT) AS npos,
             CAST(sum(1 - lab) AS BIGINT) AS nneg
      FROM r GROUP BY day)
SELECT day, npos, nneg,
       CAST(sp2 - npos * (npos + 1) AS DOUBLE)
         / CAST(2 * npos * nneg AS DOUBLE) AS auc
FROM g WHERE npos > 0 AND nneg > 0
"""


def q_events_kmv_distinct(sf_dir: str):
    """Per-day distinct-user estimate via the KMV bottom-k sketch
    (stages/sketch.kmv_distinct, k=64) — the third mergeable distinct
    estimator (vs HLL and the exact exchange); md5-uniform hashes make
    the whole sketch SQL-reproducible, small groups report exact."""
    from pymhealth_ray.stages.sketch import kmv_distinct

    ev = _events(sf_dir, ["ts", "user_id"])

    def prep(b: pa.Table) -> pa.Table:
        ts = b["ts_us"].to_numpy(zero_copy_only=False)
        return pa.table({"day": pa.array(ts // 86_400_000_000),
                         "user_id": b["user_id"]})

    return kmv_distinct(ev.map_batches(prep, batch_format="pyarrow"),
                        "day", "user_id", k=64, num_buckets=NB)


SQL_EVENTS_KMV_DISTINCT = """
WITH du AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day,
                   ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))
                     ::UBIGINT AS h
            FROM events),
r AS (SELECT day, h,
             row_number() OVER (PARTITION BY day ORDER BY h) AS rn,
             count(*) OVER (PARTITION BY day) AS nd
      FROM du),
g AS (SELECT day, max(nd) AS nd,
             max(h) FILTER (WHERE rn <= 64) AS hk
      FROM r GROUP BY day)
SELECT day, CAST(LEAST(nd, 64) AS BIGINT) AS n_kept,
       CASE WHEN nd < 64 THEN CAST(nd AS DOUBLE)
            ELSE CAST(63 AS DOUBLE)
                 / (CAST(hk AS DOUBLE) / 18446744073709551616.0)
       END AS est_distinct
FROM g
"""


def q_events_theil_sen(sf_dir: str):
    """Per-user robust value trend — Theil-Sen slope (median of all
    pairwise slopes, stages/robust.theil_sen_by_entity): pair explosion
    bounded per entity, one lexsort medians every user at once,
    DuckDB-parity convex median. Slope in value per second."""
    from pymhealth_ray.stages.robust import theil_sen_by_entity

    ev = _events(sf_dir, ["user_id", "ts", "value"])
    return theil_sen_by_entity(ev, "user_id", "ts_us", "value",
                               num_buckets=NB)


SQL_EVENTS_THEIL_SEN = """
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
p AS (SELECT a.user_id AS u,
             (b.value - a.value) * 1000000.0
               / CAST(b.ts_us - a.ts_us AS DOUBLE) AS s
      FROM e a JOIN e b
        ON a.user_id = b.user_id AND a.ts_us < b.ts_us)
SELECT u AS user_id, CAST(count(*) AS BIGINT) AS n_pairs,
       median(s) AS ts_slope
FROM p GROUP BY u
"""


def q_orders_assoc_rules(sf_dir: str):
    """Directional association rules over order baskets
    (stages/assoc.association_rules): support / confidence / lift per
    frequent part pair, both directions — one tagged-partial exchange
    carries pair keys, item counts and exact distinct-basket counts in
    disjoint int64 key domains through a single keyed_sum."""
    from pymhealth_ray.stages.assoc import association_rules

    ds = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_orderkey", "l_partkey"])
    return association_rules(ds, "l_orderkey", "l_partkey",
                             min_support=3, num_buckets=NB)


SQL_ORDERS_ASSOC_RULES = """
WITH d AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
           FROM lineitem),
n AS (SELECT count(DISTINCT g) AS ng FROM d),
ic AS (SELECT i, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY i),
p AS (SELECT a.i AS x, b.i AS y, CAST(count(*) AS BIGINT) AS c
      FROM d a JOIN d b ON a.g = b.g AND a.i < b.i
      GROUP BY a.i, b.i HAVING count(*) >= 3),
r AS (SELECT x AS antecedent, y AS consequent, c FROM p
      UNION ALL
      SELECT y AS antecedent, x AS consequent, c FROM p)
SELECT r.antecedent, r.consequent, r.c AS support,
       ia.c AS c_ant, ib.c AS c_cons,
       CAST(r.c AS DOUBLE) / CAST(ia.c AS DOUBLE) AS confidence,
       CAST(n.ng * r.c AS DOUBLE) / CAST(ia.c * ib.c AS DOUBLE) AS lift
FROM r JOIN ic ia ON ia.i = r.antecedent
       JOIN ic ib ON ib.i = r.consequent
       CROSS JOIN n
"""


def q_events_kaplan_meier(sf_dir: str):
    """Kaplan-Meier risk table over per-user observation spans: for
    each distinct span (days between first and last event) the risk-set
    size, event count, and survival estimate. Risk sets are exact ints
    (suffix sums over a duration rollup bounded by the observation
    window); survival is np.cumprod over ascending durations, which is
    bit-identical to DuckDB's sequential window product() (verified on
    fuzzed inputs). Spans exchange is one grouped_stats rollup."""
    import ray

    from pymhealth_ray.stages.aggregate import grouped_stats

    ev = _events(sf_dir, ["user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        ts = b["ts_us"].to_numpy(zero_copy_only=False)
        return pa.table({"user_id": b["user_id"],
                         "day": pa.array(ts // 86_400_000_000)})

    spans = grouped_stats(ev.map_batches(prep, batch_format="pyarrow"),
                          ["user_id"], min_cols=["day"], max_cols=["day"])

    def dur(b: pa.Table) -> pa.Table:
        lo = b["day_min"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = b["day_max"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"dur": pa.array(hi - lo)})

    counts = grouped_stats(spans.map_batches(dur, batch_format="pyarrow"),
                           ["dur"], count_name="ev")
    # distinct durations are bounded by the observation window — a
    # driver-side finish over ≤ window-days rows, never the user count
    rows = counts.take_all()
    d = np.array([r["dur"] for r in rows], dtype=np.int64)
    ev_c = np.array([r["ev"] for r in rows], dtype=np.int64)
    order = np.argsort(d)
    d, ev_c = d[order], ev_c[order]
    n_risk = np.cumsum(ev_c[::-1])[::-1]
    surv = np.cumprod(1.0 - ev_c.astype(np.float64)
                      / n_risk.astype(np.float64))
    return ray.data.from_arrow(pa.table({
        "dur_days": pa.array(d), "n_risk": pa.array(n_risk),
        "n_events": pa.array(ev_c), "surv": pa.array(surv)}))


SQL_EVENTS_KAPLAN_MEIER = """
WITH u AS (SELECT user_id,
                  max(epoch_us(ts) // 86400000000)
                    - min(epoch_us(ts) // 86400000000) AS dur
           FROM events GROUP BY user_id),
d AS (SELECT dur, CAST(count(*) AS BIGINT) AS ev FROM u GROUP BY dur),
r AS (SELECT dur, ev,
             CAST(sum(ev) OVER (ORDER BY dur DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS n_risk
      FROM d)
SELECT dur AS dur_days, n_risk, ev AS n_events,
       product(1.0 - CAST(ev AS DOUBLE) / CAST(n_risk AS DOUBLE))
         OVER (ORDER BY dur) AS surv
FROM r
"""


def _mmr_expected(df):
    """Independent single-process MMR replication: normalize, rank by
    cosine to vec 7's embedding, greedy λ·rel − (1−λ)·max-sim over the
    id-sorted pool — the exact op order of stages/ann.mmr_select."""
    import pandas as pd

    ids = df["vec_id"].to_numpy().astype(np.int64)
    P = np.array([np.asarray(e, dtype=np.float64)
                  for e in df["embedding"]])
    order = np.argsort(ids)
    ids, P = ids[order], P[order]
    q = P[ids == 7][0].copy()
    q = q / max(np.linalg.norm(q), 1e-12)
    U = P / np.maximum(np.linalg.norm(P, axis=1, keepdims=True), 1e-12)
    rel_all = U @ q
    pool = np.sort(np.lexsort((ids, -rel_all))[:64])
    rid, Pp = ids[pool], U[pool]
    rel = Pp @ q
    sims = Pp @ Pp.T
    lam, k = 0.7, 10
    chosen = np.zeros(len(rid), dtype=bool)
    max_sim = np.full(len(rid), -np.inf)
    out = []
    for rank in range(1, k + 1):
        pen = np.where(np.isneginf(max_sim), 0.0, (1.0 - lam) * max_sim)
        score = np.where(chosen, -np.inf, lam * rel - pen)
        j = int(np.argmax(score))
        chosen[j] = True
        out.append((rank, rid[j], rel[j], score[j]))
        max_sim = np.maximum(max_sim, sims[:, j])
    r = _round_away(np.array([o[2] for o in out]), 6)
    s = _round_away(np.array([o[3] for o in out]), 6)
    return pd.DataFrame({"rank": np.array([o[0] for o in out],
                                          dtype=np.int64),
                         "vec_id": np.array([o[1] for o in out],
                                            dtype=np.int64),
                         "rel_cosine": r, "mmr_score": s})


def q_embed_mmr(sf_dir: str):
    """Diversity-aware retrieval: MMR top-10 (λ=0.7) against vec 7's
    embedding over a distributed brute-force top-64 candidate pool
    (stages/ann.mmr_select) — the coreset/demo-selection primitive."""
    from pymhealth_ray.stages.ann import mmr_select

    ds = read_table(f"{sf_dir}/embeddings.parquet",
                    columns=["vec_id", "embedding"])
    ds = ds.materialize()  # scored once, pool re-fetched once
    qrow = ds.filter(lambda r: r["vec_id"] == 7).take(1)[0]
    q = np.asarray(qrow["embedding"], dtype=np.float64)
    tbl = mmr_select(ds, q, k=10, lam=0.7, pool=64)
    return _round_cols(tbl, {"rel_cosine": 6, "mmr_score": 6})


def q_events_calibration(sf_dir: str):
    """Reliability-diagram bins for value as a purchase predictor
    (companion to events_auc): 50-unit score bins, exact int counts /
    positives / cent sums map-side, two mirrored closing divisions."""
    from pymhealth_ray.stages.aggregate import grouped_stats

    ev = _events(sf_dir, ["ts", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "val_c")
        v = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        bin_ = np.minimum(np.floor(v / 50.0).astype(np.int64), 9)
        lab = pc.cast(pc.equal(b["event_type"], "purchase"), pa.int64())
        return pa.table({"bin": pa.array(bin_), "lab": lab,
                         "val_c": b["val_c"]})

    agg = grouped_stats(ev.map_batches(prep, batch_format="pyarrow"),
                        ["bin"], sum_cols=["lab", "val_c"])

    def finish(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        npos = b["lab_sum"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        s = b["val_c_sum"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        nf = n.astype(np.float64)
        return pa.table({
            "bin": b["bin"], "n": pa.array(n), "npos": pa.array(npos),
            "frac_pos": pa.array(npos.astype(np.float64) / nf),
            "mean_value": pa.array(_round_away(s / nf / 100.0, 6))})

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_CALIBRATION = """
WITH e AS (SELECT LEAST(CAST(floor(value / 50.0) AS BIGINT), 9) AS bin,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                    AS lab,
                  CAST(round(value * 100) AS BIGINT) AS c
           FROM events),
g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(lab) AS BIGINT) AS npos,
             CAST(sum(c) AS BIGINT) AS s
      FROM e GROUP BY bin)
SELECT bin, n, npos,
       CAST(npos AS DOUBLE) / CAST(n AS DOUBLE) AS frac_pos,
       round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6)
         AS mean_value
FROM g
"""


def q_events_ks_drift(sf_dir: str):
    """Kolmogorov-Smirnov distribution drift per event type: the max
    ECDF gap between a type's value distribution and the REST of the
    stream, on the cent grid (bounded domain ⇒ the driver finish holds
    the price grid, never the rows — the percent_rank contract).
    Partials are one (type, cent) grouped rollup; every per-point float
    is int/int in SQL's exact op order."""
    from pymhealth_ray.stages.aggregate import grouped_stats

    ev = _events(sf_dir, ["ts", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "c")
        return pa.table({"t": b["event_type"], "c": b["c"]})

    agg = grouped_stats(ev.map_batches(prep, batch_format="pyarrow"),
                        ["t", "c"])
    rows = agg.take_all()  # bounded: |types| × |price grid|
    t = np.array([r["t"] for r in rows], dtype=object)
    c = np.array([r["c"] for r in rows], dtype=np.int64)
    n = np.array([r["n"] for r in rows], dtype=np.int64)
    grid = np.unique(c)
    types = np.unique(t)
    na = int(n.sum())
    cum = np.zeros((len(types), len(grid)), dtype=np.int64)
    for i, ty in enumerate(types):
        m = t == ty
        hist = np.zeros(len(grid), dtype=np.int64)
        hist[np.searchsorted(grid, c[m])] = n[m]
        cum[i] = np.cumsum(hist)
    ca = cum.sum(axis=0)
    out_ks = []
    for i, ty in enumerate(types):
        nt = int(cum[i, -1])
        d = np.abs(cum[i].astype(np.float64) / np.float64(nt)
                   - (ca - cum[i]).astype(np.float64)
                   / np.float64(na - nt))
        out_ks.append(d.max())
    import ray
    return ray.data.from_arrow(pa.table({
        "event_type": pa.array(list(types), type=pa.string()),
        "n": pa.array(cum[:, -1]),
        "ks": pa.array(np.array(out_ks))}))


SQL_EVENTS_KS_DRIFT = """
WITH e AS (SELECT event_type AS t, CAST(round(value * 100) AS BIGINT)
             AS c FROM events),
g AS (SELECT t, c, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY t, c),
types AS (SELECT t, CAST(sum(n) AS BIGINT) AS nt FROM g GROUP BY t),
grid AS (SELECT DISTINCT c FROM g),
fullg AS (SELECT ty.t, ty.nt, gr.c FROM types ty CROSS JOIN grid gr),
cum AS (SELECT f.t, f.nt, f.c,
               CAST(sum(COALESCE(g.n, 0)) OVER (PARTITION BY f.t
                                                ORDER BY f.c)
                    AS BIGINT) AS ct
        FROM fullg f LEFT JOIN g ON g.t = f.t AND g.c = f.c),
allcum AS (SELECT c, CAST(sum(ct) AS BIGINT) AS ca FROM cum GROUP BY c),
tot AS (SELECT CAST(sum(nt) AS BIGINT) AS na FROM types)
SELECT cum.t AS event_type, cum.nt AS n,
       max(abs(CAST(ct AS DOUBLE) / CAST(nt AS DOUBLE)
               - CAST(ca - ct AS DOUBLE) / CAST(na - nt AS DOUBLE)))
         AS ks
FROM cum JOIN allcum ON allcum.c = cum.c CROSS JOIN tot
GROUP BY cum.t, cum.nt
"""


def q_events_dow_index(sf_dir: str):
    """Day-of-week seasonality index: mean spend per weekday over the
    global mean, exact int cents until two mirrored divisions."""
    from pymhealth_ray.stages.aggregate import grouped_stats

    ev = _events(sf_dir, ["ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "c")
        ts = b["ts_us"].to_numpy(zero_copy_only=False)
        dow = (ts // 86_400_000_000 + 4) % 7  # epoch day 0 = Thursday
        return pa.table({"dow": pa.array(dow), "c": b["c"]})

    agg = grouped_stats(ev.map_batches(prep, batch_format="pyarrow"),
                        ["dow"], sum_cols=["c"])
    rows = agg.take_all()  # 7 rows
    dow = np.array([r["dow"] for r in rows], dtype=np.int64)
    n = np.array([r["n"] for r in rows], dtype=np.int64)
    s = np.array([r["c_sum"] for r in rows], dtype=np.int64)
    gmean = np.float64(s.sum()) / np.float64(n.sum())
    idx = (s.astype(np.float64) / n.astype(np.float64)) / gmean
    import ray
    return ray.data.from_arrow(pa.table({
        "dow": pa.array(dow), "n": pa.array(n),
        "dow_index": pa.array(_round_away(idx, 6))}))


SQL_EVENTS_DOW_INDEX = """
WITH e AS (SELECT ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow,
                  CAST(round(value * 100) AS BIGINT) AS c FROM events),
g AS (SELECT dow, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS s FROM e GROUP BY dow),
t AS (SELECT CAST(sum(s) AS BIGINT) AS ts_, CAST(sum(n) AS BIGINT)
        AS tn FROM g)
SELECT dow, n,
       round((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(ts_ AS DOUBLE) / CAST(tn AS DOUBLE)), 6)
         AS dow_index
FROM g CROSS JOIN t
"""


def _isotonic_expected(df):
    """Independent PAVA replication — the textbook repeated-sweep form
    (scan for any adjacent violation, merge, restart) rather than the
    engine's stack; both converge to THE unique isotonic fit, compared
    exactly in int rationals."""
    import pandas as pd

    c = np.rint(df["value"].to_numpy() * 100).astype(np.int64)
    lab = (df["event_type"] == "purchase").to_numpy().astype(np.int64)
    grid = np.unique(c)
    n = np.zeros(len(grid), dtype=np.int64)
    s = np.zeros(len(grid), dtype=np.int64)
    idx = np.searchsorted(grid, c)
    np.add.at(n, idx, 1)
    np.add.at(s, idx, lab)
    pools = [[int(w), int(v), 1] for w, v in zip(n, s)]
    changed = True
    while changed:
        changed = False
        for i in range(len(pools) - 1):
            (w1, s1, c1), (w2, s2, c2) = pools[i], pools[i + 1]
            if s1 * w2 > s2 * w1:  # mean_i > mean_{i+1}
                pools[i:i + 2] = [[w1 + w2, s1 + s2, c1 + c2]]
                changed = True
                break
    fitted = np.repeat(
        np.array([p[1] for p in pools], dtype=np.float64)
        / np.array([p[0] for p in pools], dtype=np.float64),
        np.array([p[2] for p in pools], dtype=np.int64))
    return pd.DataFrame({"val_c": grid, "n": n, "npos": s,
                         "fitted": _round_away(fitted, 6)})


def q_events_isotonic(sf_dir: str):
    """Isotonic calibration of purchase probability on the cent grid
    (stages/mleval.isotonic_calibration): one grouped rollup, exact
    int-rational PAVA on the bounded grid, float only at print."""
    from pymhealth_ray.stages.mleval import isotonic_calibration

    ev = _events(sf_dir, ["ts", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "val_c")
        lab = pc.cast(pc.equal(b["event_type"], "purchase"), pa.int64())
        return pa.table({"val_c": b["val_c"], "lab": lab})

    return isotonic_calibration(ev.map_batches(prep,
                                               batch_format="pyarrow"),
                                "val_c", "lab")


def _image_patches_expected(df):
    """Single-process replay of the patch explode over the same
    deterministic PNM payloads."""
    import pandas as pd

    from pymhealth_ray.stages.multimodal import PatchExtractor

    tbl = pa.table({"doc_id": pa.array(df["doc_id"].tolist(),
                                       type=pa.int64())})
    out = PatchExtractor(patch=8)(_docs_pnm_table(tbl))
    pdf = out.to_pandas()
    pdf["patch_mean"] = _round_away(pdf["patch_mean"].to_numpy(), 6)
    return pdf


def q_docs_image_patches(sf_dir: str):
    """ViT-style patch tokenization of real P5-PNM payloads
    (stages/multimodal.extract_patches, actor pool): one row per 8×8
    patch with its mean intensity — the vision-ingest layout."""
    from pymhealth_ray.stages.multimodal import extract_patches

    docs = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    media = docs.map_batches(_docs_pnm_table, batch_format="pyarrow")
    patches = extract_patches(media, patch=8)
    return patches.map_batches(
        lambda b: _round_cols(b, {"patch_mean": 6}),
        batch_format="pyarrow")


def q_events_stl_decompose(sf_dir: str):
    """STL-lite seasonal decomposition of daily spend: trend = centered
    7-day MA (full windows only), seasonal = per-weekday convex median
    of the detrended series, remainder = the rest. ONE grouped rollup
    to the day grid (bounded by the calendar, never the rows); the
    driver finish mirrors SQL op for op — int 7-day sums, one /7,
    convex medians."""
    import ray

    from pymhealth_ray.stages.aggregate import grouped_stats

    ev = _events(sf_dir, ["ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "c")
        ts = b["ts_us"].to_numpy(zero_copy_only=False)
        return pa.table({"day": pa.array(ts // 86_400_000_000),
                         "c": b["c"]})

    agg = grouped_stats(ev.map_batches(prep, batch_format="pyarrow"),
                        ["day"], sum_cols=["c"])
    rows = agg.take_all()  # bounded: one row per calendar day
    day = np.array([r["day"] for r in rows], dtype=np.int64)
    dc = np.array([r["c_sum"] for r in rows], dtype=np.int64)
    order = np.argsort(day)
    day, dc = day[order], dc[order]
    if len(day) < 7:
        return ray.data.from_arrow(pa.table({
            "day": pa.array([], type=pa.int64()),
            "daily_c": pa.array([], type=pa.int64()),
            "trend": pa.array([], type=pa.float64()),
            "seasonal": pa.array([], type=pa.float64()),
            "remainder": pa.array([], type=pa.float64())}))
    cum = np.concatenate(([0], np.cumsum(dc)))
    s7 = cum[7:] - cum[:-7]  # int-exact 7-day sums, centered at i+3
    mid = np.arange(3, len(day) - 3)
    trend = s7.astype(np.float64) / 7.0
    detr = dc[mid].astype(np.float64) - trend
    dow = (day[mid] + 4) % 7
    seas = np.empty(len(mid), dtype=np.float64)
    for w in np.unique(dow):
        m = dow == w
        sv = np.sort(detr[m])
        n = len(sv)
        seas[m] = sv[(n - 1) // 2] * 0.5 + sv[n // 2] * 0.5
    return ray.data.from_arrow(pa.table({
        "day": pa.array(day[mid]), "daily_c": pa.array(dc[mid]),
        "trend": pa.array(_round_away(trend, 6)),
        "seasonal": pa.array(_round_away(seas, 6)),
        "remainder": pa.array(_round_away(detr - seas, 6))}))


SQL_EVENTS_STL_DECOMPOSE = """
WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  CAST(round(value * 100) AS BIGINT) AS c FROM events),
d AS (SELECT day, CAST(sum(c) AS BIGINT) AS dc FROM e GROUP BY day),
w AS (SELECT day, dc,
             CAST(sum(dc) OVER win AS BIGINT) AS s7,
             count(*) OVER win AS n7
      FROM d WINDOW win AS (ORDER BY day
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
t AS (SELECT day, dc, CAST(s7 AS DOUBLE) / 7 AS trend,
             CAST(dc AS DOUBLE) - CAST(s7 AS DOUBLE) / 7 AS detr,
             (day + 4) % 7 AS dow
      FROM w WHERE n7 = 7),
s AS (SELECT dow, median(detr) AS seas FROM t GROUP BY dow)
SELECT t.day, t.dc AS daily_c, round(t.trend, 6) AS trend,
       round(s.seas, 6) AS seasonal,
       round(t.detr - s.seas, 6) AS remainder
FROM t JOIN s ON s.dow = t.dow
"""


def q_events_tukey_outliers(sf_dir: str):
    """Tukey-fence outlier report per event type: exact quantile_disc
    Q1/Q3 picks on the cent grid, 1.5·IQR fences in SQL's float op
    order, counts beyond each fence. Types co-locate in one bucket
    exchange; one np.sort per type."""
    from pymhealth_ray.stages.partition import grouped_by_bucket

    ev = _events(sf_dir, ["ts", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "c")
        return pa.table({"event_type": b["event_type"], "c": b["c"]})

    def per_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({
            "event_type": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
            "q1_c": pa.array([], type=pa.int64()),
            "q3_c": pa.array([], type=pa.int64()),
            "n_low": pa.array([], type=pa.int64()),
            "n_high": pa.array([], type=pa.int64())})
        if tbl.num_rows == 0:
            return empty
        t = tbl["event_type"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        enc = t.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        c = tbl["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((c, codes))
        codes, c = codes[order], c[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(codes[1:] != codes[:-1]) + 1,
             [len(codes)]))
        names, ns, q1s, q3s, nlo, nhi = [], [], [], [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            seg = c[s:e]
            n = len(seg)
            q1 = int(seg[int(np.ceil(0.25 * n)) - 1])
            q3 = int(seg[int(np.ceil(0.75 * n)) - 1])
            iqr = np.float64(q3) - np.float64(q1)
            lo = np.float64(q1) - 1.5 * iqr
            hi = np.float64(q3) + 1.5 * iqr
            segf = seg.astype(np.float64)
            names.append(enc.dictionary[codes[s]].as_py())
            ns.append(n); q1s.append(q1); q3s.append(q3)
            nlo.append(int((segf < lo).sum()))
            nhi.append(int((segf > hi).sum()))
        return pa.table({
            "event_type": pa.array(names, type=pa.string()),
            "n": pa.array(np.array(ns, dtype=np.int64)),
            "q1_c": pa.array(np.array(q1s, dtype=np.int64)),
            "q3_c": pa.array(np.array(q3s, dtype=np.int64)),
            "n_low": pa.array(np.array(nlo, dtype=np.int64)),
            "n_high": pa.array(np.array(nhi, dtype=np.int64))})

    return grouped_by_bucket(ev.map_batches(prep, batch_format="pyarrow"),
                             per_bucket, entity_col="event_type",
                             num_buckets=NB)


SQL_EVENTS_TUKEY_OUTLIERS = """
WITH e AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
           FROM events),
q AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             quantile_disc(c, 0.25) AS q1_c,
             quantile_disc(c, 0.75) AS q3_c
      FROM e GROUP BY event_type),
f AS (SELECT event_type, n, q1_c, q3_c,
             CAST(q1_c AS DOUBLE)
               - 1.5 * (CAST(q3_c AS DOUBLE) - CAST(q1_c AS DOUBLE))
               AS lo,
             CAST(q3_c AS DOUBLE)
               + 1.5 * (CAST(q3_c AS DOUBLE) - CAST(q1_c AS DOUBLE))
               AS hi
      FROM q)
SELECT f.event_type, f.n, f.q1_c, f.q3_c,
       CAST(sum(CASE WHEN CAST(e.c AS DOUBLE) < f.lo THEN 1 ELSE 0 END)
            AS BIGINT) AS n_low,
       CAST(sum(CASE WHEN CAST(e.c AS DOUBLE) > f.hi THEN 1 ELSE 0 END)
            AS BIGINT) AS n_high
FROM f JOIN e ON e.event_type = f.event_type
GROUP BY f.event_type, f.n, f.q1_c, f.q3_c
"""


def q_docs_l_diversity(sf_dir: str):
    """l-DIVERSITY audit (companion to docs_k_anonymize): per
    quasi-identifier group (lang, 100-char length bucket) the row count
    and the number of DISTINCT sensitive values (source); l_ok flags
    groups meeting l ≥ 2. Two small exact rollups — distinct pairs
    first, then counts — no value domain on the driver."""
    from pymhealth_ray.stages.aggregate import grouped_stats

    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["lang", "source", "n_chars"])

    def prep(b: pa.Table) -> pa.Table:
        nb = b["n_chars"].to_numpy(zero_copy_only=False) \
            .astype(np.int64) // 100
        return pa.table({"lang": b["lang"], "len_b": pa.array(nb),
                         "source": b["source"]})

    pairs = grouped_stats(docs.map_batches(prep, batch_format="pyarrow"),
                          ["lang", "len_b", "source"])

    def strip(b: pa.Table) -> pa.Table:
        return pa.table({"lang": b["lang"], "len_b": b["len_b"],
                         "n_rows": b["n"].cast(pa.int64()),
                         "one": pa.array(np.ones(b.num_rows,
                                                 dtype=np.int64))})

    agg = grouped_stats(pairs.map_batches(strip, batch_format="pyarrow"),
                        ["lang", "len_b"], sum_cols=["n_rows", "one"])

    def finish(b: pa.Table) -> pa.Table:
        ell = b["one_sum"].cast(pa.int64())
        return pa.table({
            "lang": b["lang"], "len_b": b["len_b"],
            "n": b["n_rows_sum"].cast(pa.int64()),
            "l_distinct": ell,
            "l_ok": pc.cast(pc.greater_equal(ell, 2), pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_DOCS_L_DIVERSITY = """
WITH d AS (SELECT lang, n_chars // 100 AS len_b, source
           FROM documents),
g AS (SELECT lang, len_b, CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT source) AS BIGINT) AS l_distinct
      FROM d GROUP BY lang, len_b)
SELECT lang, len_b, n, l_distinct,
       CASE WHEN l_distinct >= 2 THEN 1 ELSE 0 END AS l_ok
FROM g
"""


def q_events_kendall_tau(sf_dir: str):
    """Per-user Kendall tau-a between time and value
    (stages/robust.kendall_by_entity) — the nonparametric trend test
    next to events_theil_sen: int-exact concordant/discordant counts,
    one closing divide."""
    from pymhealth_ray.stages.robust import kendall_by_entity

    ev = _events(sf_dir, ["user_id", "ts", "value"])
    return kendall_by_entity(ev, "user_id", "ts_us", "value",
                             num_buckets=NB)


SQL_EVENTS_KENDALL_TAU = """
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
p AS (SELECT a.user_id AS u,
             CASE WHEN b.value > a.value THEN 1 ELSE 0 END AS c,
             CASE WHEN b.value < a.value THEN 1 ELSE 0 END AS d
      FROM e a JOIN e b
        ON a.user_id = b.user_id AND a.ts_us < b.ts_us)
SELECT u AS user_id, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(c) AS BIGINT) AS concordant,
       CAST(sum(d) AS BIGINT) AS discordant,
       CAST(sum(c) - sum(d) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS tau
FROM p GROUP BY u
"""


def q_events_trimmed_mean(sf_dir: str):
    """10%-trimmed mean spend per event type: drop the ceil(0.1·n)
    smallest and largest cent values (tie-invariant — trimming by value
    multiset), int-exact middle sum, one closing divide. Types
    co-locate in one bucket exchange; one sort per type."""
    from pymhealth_ray.stages.partition import grouped_by_bucket

    ev = _events(sf_dir, ["ts", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "c")
        return pa.table({"event_type": b["event_type"], "c": b["c"]})

    def per_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({
            "event_type": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
            "n_used": pa.array([], type=pa.int64()),
            "trimmed_mean_c": pa.array([], type=pa.float64())})
        if tbl.num_rows == 0:
            return empty
        t = tbl["event_type"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        enc = t.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        c = tbl["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((c, codes))
        codes, c = codes[order], c[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(codes[1:] != codes[:-1]) + 1,
             [len(codes)]))
        names, ns, nus, tm = [], [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            n = e - s
            t_ = int(np.ceil(0.1 * n))
            if n - 2 * t_ <= 0:
                continue
            mid = c[s + t_: e - t_]
            names.append(enc.dictionary[codes[s]].as_py())
            ns.append(n)
            nus.append(len(mid))
            tm.append(np.float64(int(mid.sum()))
                      / np.float64(len(mid)))
        return pa.table({
            "event_type": pa.array(names, type=pa.string()),
            "n": pa.array(np.array(ns, dtype=np.int64)),
            "n_used": pa.array(np.array(nus, dtype=np.int64)),
            "trimmed_mean_c": pa.array(np.array(tm))})

    return grouped_by_bucket(ev.map_batches(prep, batch_format="pyarrow"),
                             per_bucket, entity_col="event_type",
                             num_buckets=NB)


SQL_EVENTS_TRIMMED_MEAN = """
WITH e AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
           FROM events),
r AS (SELECT event_type, c,
             row_number() OVER (PARTITION BY event_type ORDER BY c)
               AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM e),
t AS (SELECT event_type, c, n,
             CAST(ceil(0.1 * n) AS BIGINT) AS tr
      FROM r WHERE rn > CAST(ceil(0.1 * n) AS BIGINT)
               AND rn <= n - CAST(ceil(0.1 * n) AS BIGINT))
SELECT event_type, CAST(max(n) AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS n_used,
       CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         AS trimmed_mean_c
FROM t GROUP BY event_type HAVING count(*) > 0
"""


def _knn_classify_expected(df):
    """Single-process kNN-vote replication: full normalized matmul,
    top-5 by (sim DESC, id ASC) excluding self for every 5th vector,
    bincount-argmax vote (ties → smallest label), per-label accuracy."""
    import pandas as pd

    ids = df["vec_id"].to_numpy().astype(np.int64)
    labs = df["label"].to_numpy().astype(np.int64)
    P = np.array([np.asarray(e, dtype=np.float64)
                  for e in df["embedding"]])
    order = np.argsort(ids)
    ids, labs, P = ids[order], labs[order], P[order]
    U = P / np.maximum(np.linalg.norm(P, axis=1, keepdims=True), 1e-12)
    sims = U @ U.T
    qm = ids % 5 == 0
    stats: dict = {}
    for qi in np.flatnonzero(qm):
        s = sims[qi].copy()
        s[qi] = -np.inf  # exclude self
        top = np.lexsort((ids, -s))[:5]
        votes = np.bincount(labs[top])
        pred = int(np.argmax(votes))
        true = int(labs[qi])
        n, corr = stats.get(true, (0, 0))
        stats[true] = (n + 1, corr + (1 if pred == true else 0))
    rows = sorted(stats.items())
    lab = np.array([r[0] for r in rows], dtype=np.int64)
    n = np.array([r[1][0] for r in rows], dtype=np.int64)
    corr = np.array([r[1][1] for r in rows], dtype=np.int64)
    return pd.DataFrame({
        "label": lab, "n_queries": n, "n_correct": corr,
        "acc": corr.astype(np.float64) / n.astype(np.float64)})


def q_embed_knn_classify(sf_dir: str):
    """kNN classification eval: every 5th vector is an eval query, its
    label predicted by majority vote of the 5 nearest (brute-force
    exact cosine) corpus neighbors; per-label accuracy. Labels are
    fetched only for the bounded query+neighbor id set."""
    import ray

    from pymhealth_ray.stages.ann import knn_bruteforce

    ds = read_table(f"{sf_dir}/embeddings.parquet",
                    columns=["vec_id", "embedding", "label"])
    ds = ds.materialize()
    def pick_queries(b: pa.Table) -> pa.Table:
        m = b["vec_id"].to_numpy(zero_copy_only=False) % 5 == 0
        return b.filter(pa.array(m)).select(["vec_id", "embedding"])

    qtbl = pa.concat_tables(
        [b for b in ds.map_batches(pick_queries, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow")])
    top = knn_bruteforce(ds, qtbl, k=5, exclude_self=True)
    qi = np.asarray(top["query_id"].to_pylist(), dtype=np.int64)
    ni = np.asarray(top["neighbor_id"].to_pylist(), dtype=np.int64)
    need = np.unique(np.concatenate((qi, ni)))
    need_ref = ray.put(need)

    def fetch(b: pa.Table) -> pa.Table:
        w = ray.get(need_ref)
        m = np.isin(b["vec_id"].to_numpy(zero_copy_only=False), w)
        return b.filter(pa.array(m)).select(["vec_id", "label"])

    lab_rows = ds.map_batches(fetch, batch_format="pyarrow").take_all()
    lab_of = {r["vec_id"]: int(r["label"]) for r in lab_rows}
    # linear segment walk over the query-sorted neighbor list — a
    # per-query boolean scan would be O(n_q²) (session code review)
    order = np.argsort(qi, kind="stable")
    qs, ns_ = qi[order], ni[order]
    starts = np.concatenate(
        ([0], np.flatnonzero(qs[1:] != qs[:-1]) + 1, [len(qs)]))
    stats: dict = {}
    for s, e in zip(starts[:-1], starts[1:]):
        votes = np.bincount(np.array([lab_of[i] for i in ns_[s:e]]))
        pred = int(np.argmax(votes))
        true = lab_of[int(qs[s])]
        n, corr = stats.get(true, (0, 0))
        stats[true] = (n + 1, corr + (1 if pred == true else 0))
    rows = sorted(stats.items())
    lab = np.array([r[0] for r in rows], dtype=np.int64)
    n = np.array([r[1][0] for r in rows], dtype=np.int64)
    corr = np.array([r[1][1] for r in rows], dtype=np.int64)
    return ray.data.from_arrow(pa.table({
        "label": pa.array(lab), "n_queries": pa.array(n),
        "n_correct": pa.array(corr),
        "acc": pa.array(corr.astype(np.float64)
                        / n.astype(np.float64))}))


def q_events_garman_klass(sf_dir: str):
    """Garman-Klass volatility per (user, day) candle — the OHLC
    range-based variance estimator:
    0.5·ln(h/l)² − (2·ln2 − 1)·ln(c/o)². Candles come from the shared
    grouped_ohlc kernel (one bucket exchange); the per-row float
    finish mirrors SQL's ln/power op order (ln parity with DuckDB is
    proven across the LM/PMI oracles)."""
    from pymhealth_ray.stages.aggregate import grouped_ohlc

    DAY_US = 86_400_000_000
    PACK = 1_000_000

    ev = _events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "val_c")
        uid = b["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = b["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = ts // DAY_US
        if day.size and (day.min() < 0 or day.max() >= PACK):
            raise ValueError("day index outside packed-key range")
        return pa.table({"ud": pa.array(uid * PACK + day),
                         "ts_us": b["ts_us"],
                         "event_id": b["event_id"], "val_c": b["val_c"]})

    candles = grouped_ohlc(ev.map_batches(prep, batch_format="pyarrow"),
                           entity_col="ud", order_col="ts_us",
                           tie_col="event_id", value_col="val_c",
                           num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        key = b["ud"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = b["open"].to_numpy(zero_copy_only=False).astype(np.float64)
        h = b["high"].to_numpy(zero_copy_only=False).astype(np.float64)
        lo = b["low"].to_numpy(zero_copy_only=False).astype(np.float64)
        c = b["close"].to_numpy(zero_copy_only=False).astype(np.float64)
        hl = np.log(h / lo)
        co = np.log(c / o)
        gk = 0.5 * hl * hl - (2.0 * np.log(2.0) - 1.0) * co * co
        return pa.table({
            "user_id": pa.array(key // PACK),
            "day": pa.array(key % PACK),
            "n": b["n"],
            "gk_var": pa.array(_round_away(gk, 6))})

    return candles.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_GARMAN_KLASS = """
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
                  epoch_us(ts) // 86400000000 AS day,
                  CAST(round(value * 100) AS BIGINT) AS val_c, event_id
           FROM events),
w AS (SELECT user_id, day, val_c,
             first_value(val_c) OVER (PARTITION BY user_id, day
                                      ORDER BY ts_us, event_id)
               AS open_c,
             last_value(val_c) OVER (PARTITION BY user_id, day
                                     ORDER BY ts_us, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND UNBOUNDED FOLLOWING)
               AS close_c
      FROM e),
g AS (SELECT user_id, CAST(day AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS n,
             CAST(max(open_c) AS BIGINT) AS o,
             CAST(max(val_c) AS BIGINT) AS h,
             CAST(min(val_c) AS BIGINT) AS l,
             CAST(max(close_c) AS BIGINT) AS c
      FROM w GROUP BY user_id, day)
SELECT user_id, day, n,
       round(0.5 * ln(CAST(h AS DOUBLE) / CAST(l AS DOUBLE))
                 * ln(CAST(h AS DOUBLE) / CAST(l AS DOUBLE))
             - (2 * ln(2) - 1)
               * ln(CAST(c AS DOUBLE) / CAST(o AS DOUBLE))
               * ln(CAST(c AS DOUBLE) / CAST(o AS DOUBLE)), 6)
         AS gk_var
FROM g
"""


def q_part_price_elasticity(sf_dir: str):
    """Per-brand price-quantity OLS (the demand-curve slope): unit
    price in cents regressed against line quantity, EXACT int64 moment
    partials after ONE broadcast dim lookup (part is the small side —
    the star-join contract), arbitrary-precision driver finish
    mirroring SQL's HUGEINT→DOUBLE casts."""
    import ray

    from pymhealth_ray.stages.aggregate import grouped_stats

    li = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_partkey", "l_quantity",
                             "l_extendedprice"])
    part = read_table(f"{sf_dir}/part.parquet",
                      columns=["p_partkey", "p_brand"])
    prows = part.take_all()
    pk = np.array([r["p_partkey"] for r in prows], dtype=np.int64)
    bv = np.array([r["p_brand"] for r in prows], dtype=object)
    order = np.argsort(pk)
    lookup_ref = ray.put((pk[order], bv[order]))

    def prep(b: pa.Table) -> pa.Table:
        keys, brands = ray.get(lookup_ref)
        lpk = b["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        qn = b["l_quantity"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ep = b["l_extendedprice"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        # HALF-AWAY rounding to match SQL round() — np.rint is
        # half-to-even and diverges on exact .5 cents (952 rows at
        # sf0.01; caught by the session code review)
        t = ep / qn * 100
        x = (np.sign(t) * np.floor(np.abs(t) + 0.5)).astype(np.int64)
        y = np.rint(qn).astype(np.int64)  # quantities are whole
        br = brands[np.searchsorted(keys, lpk)]
        return pa.table({"p_brand": pa.array(list(br),
                                             type=pa.string()),
                         "x": pa.array(x), "y": pa.array(y),
                         "xx": pa.array(x * x), "xy": pa.array(x * y)})

    agg = grouped_stats(li.map_batches(prep, batch_format="pyarrow"),
                        ["p_brand"], sum_cols=["x", "y", "xx", "xy"])
    rows = agg.take_all()
    bs, ns, slopes = [], [], []
    for r in sorted(rows, key=lambda r: r["p_brand"]):
        n, sx, sy = int(r["n"]), int(r["x_sum"]), int(r["y_sum"])
        sxx, sxy = int(r["xx_sum"]), int(r["xy_sum"])
        den = n * sxx - sx * sx
        slope = None if den == 0 \
            else float(_round_away(np.array(
                [float(n * sxy - sx * sy) / float(den) * 1e6]), 6)[0])
        bs.append(r["p_brand"]); ns.append(n); slopes.append(slope)
    return pa.table({
        "p_brand": pa.array(bs, type=pa.string()),
        "n": pa.array(ns, type=pa.int64()),
        "slope_per_megacent": pa.array(slopes, type=pa.float64())})


SQL_PART_PRICE_ELASTICITY = """
WITH e AS (SELECT p.p_brand,
                  CAST(round(l.l_extendedprice / l.l_quantity * 100)
                       AS BIGINT) AS x,
                  CAST(round(l.l_quantity) AS BIGINT) AS y
           FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
agg AS (SELECT p_brand, CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(x) AS HUGEINT) AS sx,
               CAST(sum(y) AS HUGEINT) AS sy,
               CAST(sum(x * x) AS HUGEINT) AS sxx,
               CAST(sum(x * y) AS HUGEINT) AS sxy
        FROM e GROUP BY p_brand)
SELECT p_brand, CAST(n AS BIGINT) AS n,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE) * 1e6, 6)
       END AS slope_per_megacent
FROM agg
"""


def q_events_markov_accuracy(sf_dir: str):
    """First-order Markov next-type prediction eval: predict each
    transition's target as the modal successor of its source type and
    score accuracy — entirely from ONE (from, to) transition rollup
    (n_correct[from] = count(from, mode[from]), no second pass over
    the stream). Ties break to the lexicographically smallest
    successor; one closing int/int divide per source type."""
    import ray

    from pymhealth_ray.stages.aggregate import grouped_stats
    from pymhealth_ray.stages.partition import (column_i64,
                                                entity_segments,
                                                grouped_by_bucket)

    ev = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])

    def trans_of_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"t_from": pa.array([], type=pa.string()),
                          "t_to": pa.array([], type=pa.string())})
        if tbl.num_rows == 0:
            return empty
        tbl, starts, n_ent = entity_segments(tbl, "user_id", "ts_us",
                                             tiebreak_col="event_id")
        n = tbl.num_rows
        is_last = np.zeros(n, dtype=bool)
        is_last[starts[1:] - 1] = True
        a = np.flatnonzero(~is_last)
        if a.size == 0:
            return empty
        et = tbl["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        return pa.table({"t_from": et.take(pa.array(a)),
                         "t_to": et.take(pa.array(a + 1))})

    trans = grouped_by_bucket(
        ev.map_batches(lambda b: b.select(["event_id", "user_id",
                                           "event_type", "ts_us"]),
                       batch_format="pyarrow"),
        trans_of_bucket, entity_col="user_id", num_buckets=NB)
    agg = grouped_stats(trans, ["t_from", "t_to"])
    rows = agg.take_all()  # bounded: |types|²
    from collections import defaultdict
    by_from: dict = defaultdict(list)
    for r in rows:
        by_from[r["t_from"]].append((r["t_to"], int(r["n"])))
    out_f, out_n, out_p, out_c, out_a = [], [], [], [], []
    for f in sorted(by_from):
        tos = by_from[f]
        total = sum(c for _, c in tos)
        pred, cmax = min(((t, c) for t, c in tos),
                         key=lambda tc: (-tc[1], tc[0]))
        out_f.append(f); out_n.append(total); out_p.append(pred)
        out_c.append(cmax)
        out_a.append(np.float64(cmax) / np.float64(total))
    return ray.data.from_arrow(pa.table({
        "t_from": pa.array(out_f, type=pa.string()),
        "n": pa.array(np.array(out_n, dtype=np.int64)),
        "predicted": pa.array(out_p, type=pa.string()),
        "n_correct": pa.array(np.array(out_c, dtype=np.int64)),
        "acc": pa.array(np.array(out_a))}))


SQL_EVENTS_MARKOV_ACCURACY = """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
           FROM events),
t AS (SELECT lag(event_type) OVER w AS t_from, event_type AS t_to
      FROM e WINDOW w AS (PARTITION BY user_id
                          ORDER BY ts_us, event_id)),
g AS (SELECT t_from, t_to, CAST(count(*) AS BIGINT) AS c
      FROM t WHERE t_from IS NOT NULL GROUP BY t_from, t_to),
m AS (SELECT t_from, t_to AS predicted, c AS n_correct,
             row_number() OVER (PARTITION BY t_from
                                ORDER BY c DESC, t_to) AS rn
      FROM g),
tot AS (SELECT t_from, CAST(sum(c) AS BIGINT) AS n FROM g
        GROUP BY t_from)
SELECT tot.t_from, tot.n, m.predicted, m.n_correct,
       CAST(m.n_correct AS DOUBLE) / CAST(tot.n AS DOUBLE) AS acc
FROM tot JOIN m ON m.t_from = tot.t_from AND m.rn = 1
"""


def _ndcg_expected(df):
    """Single-process retrieval-nDCG replication: brute top-5 by
    (sim DESC, id ASC) excluding self for every 5th vector, binary
    relevance = label match, per-label mean nDCG accumulated in
    ascending query-id order (the engine's pinned order)."""
    import pandas as pd

    ids = df["vec_id"].to_numpy().astype(np.int64)
    labs = df["label"].to_numpy().astype(np.int64)
    P = np.array([np.asarray(e, dtype=np.float64)
                  for e in df["embedding"]])
    order = np.argsort(ids)
    ids, labs, P = ids[order], labs[order], P[order]
    U = P / np.maximum(np.linalg.norm(P, axis=1, keepdims=True), 1e-12)
    sims = U @ U.T
    disc = 1.0 / np.log2(np.arange(2, 7, dtype=np.float64))
    acc: dict = {}
    for qi in np.flatnonzero(ids % 5 == 0):
        s = sims[qi].copy()
        s[qi] = -np.inf
        top = np.lexsort((ids, -s))[:5]
        rel = (labs[top] == labs[qi]).astype(np.float64)
        dcg = float((rel * disc).sum())
        ideal = np.sort(rel)[::-1]
        idcg = float((ideal * disc).sum())
        nd = 0.0 if idcg == 0.0 else dcg / idcg
        true = int(labs[qi])
        n, tot = acc.get(true, (0, 0.0))
        acc[true] = (n + 1, tot + nd)
    rows = sorted(acc.items())
    lab = np.array([r[0] for r in rows], dtype=np.int64)
    n = np.array([r[1][0] for r in rows], dtype=np.int64)
    tot = np.array([r[1][1] for r in rows], dtype=np.float64)
    return pd.DataFrame({"label": lab, "n_queries": n,
                         "mean_ndcg": _round_away(tot / n, 6)})


def q_embed_retrieval_ndcg(sf_dir: str):
    """Retrieval quality eval: nDCG@5 with binary label relevance over
    the exact brute-force top-5, averaged per label with the
    accumulation PINNED to ascending query id (float-sum order is part
    of the contract). Completes the IR-eval family next to BM25,
    recall@k and RRF."""
    import ray

    from pymhealth_ray.stages.ann import knn_bruteforce

    ds = read_table(f"{sf_dir}/embeddings.parquet",
                    columns=["vec_id", "embedding", "label"])
    ds = ds.materialize()

    def pick_queries(b: pa.Table) -> pa.Table:
        m = b["vec_id"].to_numpy(zero_copy_only=False) % 5 == 0
        return b.filter(pa.array(m)).select(["vec_id", "embedding"])

    qtbl = pa.concat_tables(
        [b for b in ds.map_batches(pick_queries, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow")])
    top = knn_bruteforce(ds, qtbl, k=5, exclude_self=True)
    qi = np.asarray(top["query_id"].to_pylist(), dtype=np.int64)
    ni = np.asarray(top["neighbor_id"].to_pylist(), dtype=np.int64)
    need = np.unique(np.concatenate((qi, ni)))
    need_ref = ray.put(need)

    def fetch(b: pa.Table) -> pa.Table:
        w = ray.get(need_ref)
        m = np.isin(b["vec_id"].to_numpy(zero_copy_only=False), w)
        return b.filter(pa.array(m)).select(["vec_id", "label"])

    lab_rows = ds.map_batches(fetch, batch_format="pyarrow").take_all()
    lab_of = {r["vec_id"]: int(r["label"]) for r in lab_rows}
    disc = 1.0 / np.log2(np.arange(2, 7, dtype=np.float64))
    # neighbors arrive sorted by (query_id, -cosine, neighbor_id):
    # rank order within a segment IS the retrieval order
    order = np.argsort(qi, kind="stable")
    qs, ns_ = qi[order], ni[order]
    starts = np.concatenate(
        ([0], np.flatnonzero(qs[1:] != qs[:-1]) + 1, [len(qs)]))
    acc: dict = {}
    for s, e in zip(starts[:-1], starts[1:]):
        true = lab_of[int(qs[s])]
        rel = np.array([1.0 if lab_of[i] == true else 0.0
                        for i in ns_[s:e]])
        d = disc[:len(rel)]
        dcg = float((rel * d).sum())
        idcg = float((np.sort(rel)[::-1] * d).sum())
        nd = 0.0 if idcg == 0.0 else dcg / idcg
        n, tot = acc.get(true, (0, 0.0))
        acc[true] = (n + 1, tot + nd)
    rows = sorted(acc.items())
    lab = np.array([r[0] for r in rows], dtype=np.int64)
    n = np.array([r[1][0] for r in rows], dtype=np.int64)
    tot = np.array([r[1][1] for r in rows], dtype=np.float64)
    return ray.data.from_arrow(pa.table({
        "label": pa.array(lab), "n_queries": pa.array(n),
        "mean_ndcg": pa.array(_round_away(tot / n, 6))}))


def q_events_lead_lag(sf_dir: str):
    """Lead-lag cross-correlation between the purchase and click
    hourly count series at lags −3…3: zero-filled hour grid (bounded
    by the observation window), EXACT int64 moment sums per lag, one
    sqrt-finish mirroring the lineitem_corr Pearson op order."""
    import ray

    from pymhealth_ray.stages.aggregate import grouped_stats

    HOUR = 3_600_000_000
    ev = _events(sf_dir, ["ts", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        m = pc.is_in(b["event_type"],
                     value_set=pa.array(["purchase", "click"]))
        b = b.filter(m)
        ts = b["ts_us"].to_numpy(zero_copy_only=False)
        return pa.table({"hour": pa.array(ts // HOUR),
                         "event_type": b["event_type"]})

    agg = grouped_stats(ev.map_batches(prep, batch_format="pyarrow"),
                        ["hour", "event_type"])
    rows = agg.take_all()  # bounded: hours × 2
    hrs = np.array([r["hour"] for r in rows], dtype=np.int64)
    if not len(hrs):
        return ray.data.from_arrow(pa.table({
            "lag": pa.array([], type=pa.int64()),
            "n": pa.array([], type=pa.int64()),
            "corr": pa.array([], type=pa.float64())}))
    h0, h1 = int(hrs.min()), int(hrs.max())
    span = h1 - h0 + 1
    a = np.zeros(span, dtype=np.int64)  # purchases
    b_ = np.zeros(span, dtype=np.int64)  # clicks
    for r in rows:
        if r["event_type"] == "purchase":
            a[r["hour"] - h0] = int(r["n"])
        else:
            b_[r["hour"] - h0] = int(r["n"])
    lags, ns, cs = [], [], []
    for lag in range(-3, 4):
        if lag >= 0:
            x, y = a[:span - lag], b_[lag:]
        else:
            x, y = a[-lag:], b_[:span + lag]
        n = len(x)
        sx, sy = int(x.sum()), int(y.sum())
        sxx = int((x * x).sum()); syy = int((y * y).sum())
        sxy = int((x * y).sum())
        num = n * sxy - sx * sy
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        c = None if dx == 0 or dy == 0 else float(_round_away(
            np.array([float(num) / np.sqrt(float(dx) * float(dy))]),
            6)[0])
        lags.append(lag); ns.append(n); cs.append(c)
    return ray.data.from_arrow(pa.table({
        "lag": pa.array(np.array(lags, dtype=np.int64)),
        "n": pa.array(np.array(ns, dtype=np.int64)),
        "corr": pa.array(cs, type=pa.float64())}))


SQL_EVENTS_LEAD_LAG = """
WITH e AS (SELECT epoch_us(ts) // 3600000000 AS hour, event_type
           FROM events WHERE event_type IN ('purchase', 'click')),
bounds AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM e),
grid AS (SELECT unnest(generate_series(h0, h1)) AS hour FROM bounds),
a AS (SELECT g.hour, CAST(COALESCE(c.n, 0) AS BIGINT) AS v
      FROM grid g LEFT JOIN (SELECT hour, count(*) AS n FROM e
                             WHERE event_type = 'purchase'
                             GROUP BY hour) c ON c.hour = g.hour),
b AS (SELECT g.hour, CAST(COALESCE(c.n, 0) AS BIGINT) AS v
      FROM grid g LEFT JOIN (SELECT hour, count(*) AS n FROM e
                             WHERE event_type = 'click'
                             GROUP BY hour) c ON c.hour = g.hour),
lags AS (SELECT unnest(generate_series(-3, 3)) AS lag),
j AS (SELECT l.lag, a.v AS x, b.v AS y
      FROM lags l JOIN a ON TRUE JOIN b ON b.hour = a.hour + l.lag),
m AS (SELECT lag, CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(x * x) AS HUGEINT) AS sxx,
             CAST(sum(y * y) AS HUGEINT) AS syy,
             CAST(sum(x * y) AS HUGEINT) AS sxy
      FROM j GROUP BY lag)
SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n,
       CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
            THEN NULL
            ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
                       / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                              * CAST(n * syy - sy * sy AS DOUBLE)), 6)
       END AS corr
FROM m
"""


def q_docs_ipc_roundtrip(sf_dir: str):
    """Arrow-IPC format coverage: the documents table round-trips
    through the engine's bucketed .arrow sink (sources/io.write_ipc)
    and file-parallel IPC reader (read_ipc); per-doc length + content
    digest against the parquet original proves losslessness of BOTH
    directions."""
    import os

    from pymhealth_ray.sources.io import read_ipc, write_ipc

    name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/pymhealth_ray_fixtures/ipc_{name}_v1"
    marker = os.path.join(out_dir, "_SUCCESS")
    with _build_lock(out_dir):
        if not os.path.exists(marker):
            src = read_table(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "lang", "text"])
            write_ipc(src, out_dir, num_files=8)
    import glob as _glob

    files = sorted(_glob.glob(os.path.join(out_dir, "part-*.arrow")))
    ds = read_ipc(files, columns=["doc_id", "lang", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "doc_id": pa.array([], type=pa.int64()),
                "lang": pa.array([], type=pa.string()),
                "n_chars": pa.array([], type=pa.int64()),
                "text_md5": pa.array([], type=pa.string())})
        txt = batch["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        md5s = [hashlib.md5(t.encode()).hexdigest()
                for t in txt.to_pylist()]
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "lang": batch["lang"],
            "n_chars": pc.utf8_length(txt).cast(pa.int64()),
            "text_md5": pa.array(md5s, type=pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_DOCS_IPC_ROUNDTRIP = """
SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars,
       md5(text) AS text_md5
FROM documents
"""


def _coverage_select_expected(src: pa.Table):
    """Single-process greedy max-coverage replication at SEQUENCE
    granularity (a doc has many sequence rows — identity is
    (doc_id, ts_ns)): distinct-token counts per row, top-64 pool by
    (count DESC, doc_id, ts_ns), greedy largest-marginal-gain (ties →
    smallest (doc_id, ts_ns)), k=16."""
    import pandas as pd

    toks = src["tokens"]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    ids = src["doc_id"].to_pylist()
    tss = src["ts_ns"].to_pylist()
    sets = {(i, int(t)): set(tk.as_py())
            for i, t, tk in zip(ids, tss, toks)}
    pool = sorted(sets, key=lambda d: (-len(sets[d]), d))[:64]
    covered: set = set()
    out = []
    for rank in range(1, 17):
        best, best_gain = None, -1
        for d in pool:
            if any(d == o[1] for o in out):
                continue
            gain = len(sets[d] - covered)
            if gain > best_gain or (gain == best_gain
                                    and (best is None or d < best)):
                best, best_gain = d, gain
        covered |= sets[best]
        out.append((rank, best, best_gain, len(covered)))
    return pd.DataFrame({
        "rank": np.array([o[0] for o in out], dtype=np.int64),
        "doc_id": [o[1][0] for o in out],
        "ts_ns": np.array([o[1][1] for o in out], dtype=np.int64),
        "gain": np.array([o[2] for o in out], dtype=np.int64),
        "covered": np.array([o[3] for o in out], dtype=np.int64)})


def q_seq_coverage_select(sf_dir: str):
    """SUBMODULAR max-coverage data selection (the facility-location
    greedy): pick 16 sequences whose token sets together cover the
    most vocabulary. Distinct-token counts are ONE vectorized map
    (lexsorted (row, token) boundary counting — no per-row Python in
    the scan); the candidate pool is a distributed top-64; the greedy
    runs driver-side over the bounded pool's token sets — the MMR
    contract applied to coverage."""
    import ray

    from pymhealth_ray.stages.aggregate import grouped_topk

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "tokens"])
    ds = ds.materialize()  # scanned for counts, re-read for the pool

    def distinct_counts(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.string()),
                             "ts_ns": pa.array([], type=pa.int64()),
                             "nd": pa.array([], type=pa.int64()),
                             "__one": pa.array([], type=pa.int8())})
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        off = toks.offsets.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = toks.values.to_numpy(zero_copy_only=False) \
            .astype(np.int64)[off[0]: off[-1]]
        lens = np.diff(off)
        rid = np.repeat(np.arange(b.num_rows, dtype=np.int64), lens)
        order = np.lexsort((flat, rid))
        sr, st = rid[order], flat[order]
        new = np.ones(len(sr), dtype=bool)
        new[1:] = (sr[1:] != sr[:-1]) | (st[1:] != st[:-1])
        nd = np.bincount(sr[new], minlength=b.num_rows) \
            .astype(np.int64)
        return pa.table({
            "doc_id": b["doc_id"],
            "ts_ns": b["ts_ns"].cast(pa.int64()),
            "nd": pa.array(nd),
            "__one": pa.array(np.zeros(b.num_rows, dtype=np.int8))})

    counts = ds.map_batches(distinct_counts, batch_format="pyarrow")
    pool_tbl = grouped_topk(counts, ["__one"], "nd", 64,
                            descending=True,
                            tie_cols=["doc_id", "ts_ns"],
                            num_buckets=1)
    pool_keys = np.array(
        sorted(f'{r["doc_id"]}|{int(r["ts_ns"])}'
               for r in pool_tbl.take_all()), dtype=object)
    pool_ref = ray.put(pool_keys)

    def fetch(b: pa.Table) -> pa.Table:
        w = ray.get(pool_ref)
        did = b["doc_id"].to_pylist()
        tsv = b["ts_ns"].to_numpy(zero_copy_only=False)
        keys = np.array([f"{d}|{int(t)}" for d, t in zip(did, tsv)],
                        dtype=object)
        return b.filter(pa.array(np.isin(keys, w)))

    rows = ds.map_batches(fetch, batch_format="pyarrow").take_all()
    sets = {(r["doc_id"], int(r["ts_ns"])): set(r["tokens"])
            for r in rows}
    covered: set = set()
    chosen: set = set()
    out = []
    for rank in range(1, 17):
        best, best_gain = None, -1
        for d in sorted(sets):
            if d in chosen:
                continue
            gain = len(sets[d] - covered)
            if gain > best_gain:
                best, best_gain = d, gain
        covered |= sets[best]
        chosen.add(best)
        out.append((rank, best, best_gain, len(covered)))
    return ray.data.from_arrow(pa.table({
        "rank": pa.array(np.array([o[0] for o in out],
                                  dtype=np.int64)),
        "doc_id": pa.array([o[1][0] for o in out],
                           type=pa.string()),
        "ts_ns": pa.array(np.array([o[1][1] for o in out],
                                   dtype=np.int64)),
        "gain": pa.array(np.array([o[2] for o in out],
                                  dtype=np.int64)),
        "covered": pa.array(np.array([o[3] for o in out],
                                     dtype=np.int64))}))


def q_seq_mlm_mask(sf_dir: str):
    """BERT-style MLM mask layout (completing the objective-layout
    triad with T5 span corruption and PSM FIM): ~15% of positions per
    sequence are masked by a WEYL sequence keyed on one md5 per row —
    u_i = (md5_64(doc:ts) mod 2³¹ + i·1103515245) mod 2³¹ < 0.15·2³¹ —
    deterministic, one hash per ROW (not per token), and exactly
    reproducible in BIGINT-safe SQL. Summary per sequence keeps the
    oracle list-free: masked count, masked index sum, masked token
    sum."""
    from pymhealth_ray.stages.sketch import _md5_u64

    M = np.int64(1) << np.int64(31)
    C = np.int64(1103515245)
    T = np.int64(int(0.15 * (1 << 31)))

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "tokens"])

    def fn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "ts_ns": pa.array([], type=pa.int64()),
                "n_tok": pa.array([], type=pa.int64()),
                "n_masked": pa.array([], type=pa.int64()),
                "masked_idx_sum": pa.array([], type=pa.int64()),
                "masked_tok_sum": pa.array([], type=pa.int64())})
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        off = toks.offsets.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = toks.values.to_numpy(zero_copy_only=False) \
            .astype(np.int64)[off[0]: off[-1]]
        lens = np.diff(off)
        did = b["doc_id"].to_pylist()
        tsv = b["ts_ns"].to_numpy(zero_copy_only=False)
        keys = pa.array([f"{d}:{int(t)}" for d, t in zip(did, tsv)])
        base = (_md5_u64(keys) % np.uint64(M)).astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        pos = np.arange(len(flat), dtype=np.int64) \
            - np.repeat(starts, lens) + 1  # 1-based
        u = (np.repeat(base, lens) + pos * C) % M
        masked = u < T
        rid = np.repeat(np.arange(b.num_rows, dtype=np.int64), lens)
        nm = np.bincount(rid[masked], minlength=b.num_rows) \
            .astype(np.int64)
        # bincount(weights) ≫ np.add.at; per-row sums ≪ 2^53 so the
        # float accumulation is exact
        mis = np.bincount(rid[masked], weights=pos[masked],
                          minlength=b.num_rows).astype(np.int64)
        mts = np.bincount(rid[masked], weights=flat[masked],
                          minlength=b.num_rows).astype(np.int64)
        return pa.table({
            "doc_id": b["doc_id"],
            "ts_ns": b["ts_ns"].cast(pa.int64()),
            "n_tok": pa.array(lens.astype(np.int64)),
            "n_masked": pa.array(nm),
            "masked_idx_sum": pa.array(mis),
            "masked_tok_sum": pa.array(mts)})

    return ds.map_batches(fn, batch_format="pyarrow")


def sql_seq_mlm_mask(path: str) -> str:
    return f"""
WITH s AS (SELECT doc_id, ts_ns, tokens, len(tokens) AS n,
                  CAST(('0x' || substr(md5(doc_id || ':' ||
                        CAST(ts_ns AS VARCHAR)), 1, 16))::UBIGINT
                       % 2147483648 AS BIGINT) AS base
           FROM read_parquet('{path}/part-*.parquet')),
c AS (SELECT doc_id, ts_ns, n, i, tokens[i] AS tok,
             (base + i * 1103515245) % 2147483648 AS u
      FROM s, LATERAL unnest(generate_series(1, n)) AS g(i))
SELECT doc_id, ts_ns, CAST(max(n) AS BIGINT) AS n_tok,
       CAST(sum(CASE WHEN u < 322122547 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_masked,
       CAST(sum(CASE WHEN u < 322122547 THEN i ELSE 0 END) AS BIGINT)
         AS masked_idx_sum,
       CAST(sum(CASE WHEN u < 322122547 THEN tok ELSE 0 END) AS BIGINT)
         AS masked_tok_sum
FROM c GROUP BY doc_id, ts_ns
"""


def _lsh_pr_expected(df):
    """Single-process P/R replication: LSH candidate pairs via
    _minhash_pairs_expected (est ≥ 0.5), truth via brute-force exact
    word-3-shingle Jaccard ≥ 0.5 (the similarity_join definition)."""
    import pandas as pd

    lsh = _minhash_pairs_expected(df)
    lsh_pairs = {(int(a), int(b))
                 for a, b in zip(lsh["id_a"], lsh["id_b"])}
    sets = {}
    for i, t in zip(df["doc_id"].values, df["text"].values):
        w = t.lower().split(" ")
        sets[int(i)] = {" ".join(w[j:j + 3])
                        for j in range(len(w) - 2)}
    ids = sorted(sets)
    exact = set()
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= 0.5:
                exact.add((a, b))
    tp = len(lsh_pairs & exact)
    return pd.DataFrame({
        "n_lsh": np.array([len(lsh_pairs)], dtype=np.int64),
        "n_exact": np.array([len(exact)], dtype=np.int64),
        "tp": np.array([tp], dtype=np.int64),
        "precision": np.array(
            [np.float64(tp) / np.float64(len(lsh_pairs))
             if lsh_pairs else np.nan]),
        "recall": np.array(
            [np.float64(tp) / np.float64(len(exact))
             if exact else np.nan])})


def q_docs_lsh_pr(sf_dir: str):
    """DEDUP-QUALITY eval: precision/recall of the estimate-verified
    MinHash-LSH pair set against the verification-grade exact
    word-3-shingle Jaccard join at the same τ=0.5 — the set-level
    companion to docs_lsh_calibration's per-pair estimate audit. Both
    pair sets are individually driver-gated pipelines; this query
    joins them on the driver (both bounded by the corpus dup rate)."""
    import ray

    from pymhealth_ray.stages.dedup import minhash_lsh_dupes
    from pymhealth_ray.stages.setjoin import similarity_join

    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    docs = docs.materialize()  # consumed by BOTH pair pipelines
    lsh_rows = minhash_lsh_dupes(docs, jaccard_threshold=0.5) \
        .take_all()
    lsh_pairs = {(int(r["id_a"]), int(r["id_b"])) for r in lsh_rows}
    ex_rows = similarity_join(docs, tau=0.5, num_buckets=NB).take_all()
    exact = {(int(r["id_a"]), int(r["id_b"])) for r in ex_rows}
    tp = len(lsh_pairs & exact)
    return ray.data.from_arrow(pa.table({
        "n_lsh": pa.array([len(lsh_pairs)], type=pa.int64()),
        "n_exact": pa.array([len(exact)], type=pa.int64()),
        "tp": pa.array([tp], type=pa.int64()),
        "precision": pa.array(
            [np.float64(tp) / np.float64(len(lsh_pairs))
             if lsh_pairs else np.nan], type=pa.float64()),
        "recall": pa.array(
            [np.float64(tp) / np.float64(len(exact))
             if exact else np.nan], type=pa.float64())}))


# --------------------------------------------------------------------------
# round-5 fourth-session wave A: peaks / cadence / Wilson CI / readability
# --------------------------------------------------------------------------


def q_events_local_peaks(sf_dir: str):
    """PROMINENCE-FILTERED LOCAL MAXIMA per user — the event-stream
    analog of the reference's peak detectors (heart/qrs.py decision
    rules detect local maxima over a moving threshold): a row is a
    peak when its cents value exceeds BOTH neighbours by >= $5.00.
    Users co-locate in one grouped_by_bucket exchange; the test is a
    vectorized neighbour compare with segment-boundary masks; output
    is all-integer (counts + max peak cents)."""
    from pymhealth_ray.stages.partition import (column_i64, entity_segments,
                                                grouped_by_bucket)

    PROM_C = 500  # $5.00 prominence in cents
    ev = _events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "c")
        return b.select(["user_id", "ts_us", "event_id", "c"])

    def peaks_of_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], type=pa.int64()),
                          "n_peaks": pa.array([], type=pa.int64()),
                          "max_peak_cents": pa.array([], type=pa.int64())})
        if tbl.num_rows == 0:
            return empty
        tbl, starts, n_ent = entity_segments(tbl, "user_id", "ts_us",
                                             tiebreak_col="event_id")
        c = column_i64(tbl, "c")
        n = tbl.num_rows
        cnt = np.diff(starts)
        seg_of = np.repeat(np.arange(n_ent, dtype=np.int64), cnt)
        interior = np.ones(n, dtype=bool)
        interior[starts[:-1]] = False
        last = starts[1:] - 1
        interior[last] = False
        d_prev = np.empty(n, dtype=np.int64)
        d_next = np.empty(n, dtype=np.int64)
        d_prev[1:] = c[1:] - c[:-1]
        d_prev[0] = 0
        d_next[:-1] = c[:-1] - c[1:]
        d_next[-1] = 0
        peak = interior & (d_prev >= PROM_C) & (d_next >= PROM_C)
        pidx = np.flatnonzero(peak)
        if pidx.size == 0:
            return empty
        pseg = seg_of[pidx]  # ascending (pidx ascending, segments contig)
        first = np.ones(pidx.size, dtype=bool)
        first[1:] = pseg[1:] != pseg[:-1]
        bounds = np.flatnonzero(first)
        mx = np.maximum.reduceat(c[pidx], bounds)
        useg = pseg[first]
        npk = np.bincount(pseg, minlength=n_ent)[useg].astype(np.int64)
        uid = column_i64(tbl, "user_id")[starts[:-1]][useg]
        return pa.table({"user_id": pa.array(uid),
                         "n_peaks": pa.array(npk),
                         "max_peak_cents": pa.array(mx.astype(np.int64))})

    return grouped_by_bucket(
        ev.map_batches(prep, batch_format="pyarrow"), peaks_of_bucket,
        entity_col="user_id", num_buckets=NB)


SQL_EVENTS_LOCAL_PEAKS = """
WITH e AS (SELECT user_id, event_id,
                  CAST(round(value * 100) AS BIGINT) AS c,
                  epoch_us(ts) AS ts_us FROM events),
w AS (SELECT user_id, c,
             lag(c) OVER (PARTITION BY user_id
                          ORDER BY ts_us, event_id) AS p,
             lead(c) OVER (PARTITION BY user_id
                           ORDER BY ts_us, event_id) AS nx
      FROM e),
pk AS (SELECT user_id, c FROM w
       WHERE p IS NOT NULL AND nx IS NOT NULL
         AND c - p >= 500 AND c - nx >= 500)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_peaks,
       max(c) AS max_peak_cents
FROM pk GROUP BY user_id
"""


def q_orders_interarrival(sf_dir: str):
    """PURCHASE-CADENCE features per customer — interarrival gaps in
    whole days between consecutive orders (the RFM 'frequency' axis
    made temporal). Gaps are a sorted-date diff, so they are invariant
    to tie order among same-day orders; moments stay exact int64
    (gap <= ~2.5k days, counts <= dozens) and only the closing
    mean / std divisions are floats, mirrored to SQL op order."""
    from pymhealth_ray.stages.partition import (column_i64, entity_segments,
                                                grouped_by_bucket)

    ds = read_table(f"{sf_dir}/orders.parquet",
                    columns=["o_custkey", "o_orderdate"])

    def prep(b: pa.Table) -> pa.Table:
        col = b["o_orderdate"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_timestamp(col.type):
            d = col.cast(pa.int64()).to_numpy(zero_copy_only=False) \
                // 86_400_000_000
        else:
            d = col.cast(pa.date32()).cast(pa.int32()) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"o_custkey": b["o_custkey"],
                         "d": pa.array(d.astype(np.int64))})

    def cadence_of_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"o_custkey": pa.array([], type=pa.int64()),
                          "n_orders": pa.array([], type=pa.int64()),
                          "n_gaps": pa.array([], type=pa.int64()),
                          "sum_gap_days": pa.array([], type=pa.int64()),
                          "mean_gap": pa.array([], type=pa.float64()),
                          "std_gap": pa.array([], type=pa.float64())})
        if tbl.num_rows == 0:
            return empty
        tbl, starts, n_ent = entity_segments(tbl, "o_custkey", "d")
        d = column_i64(tbl, "d")
        cnt = np.diff(starts)
        keep = cnt >= 2
        if not keep.any():
            return empty
        gaps = np.empty(tbl.num_rows, dtype=np.int64)
        gaps[1:] = d[1:] - d[:-1]
        gaps[starts[:-1]] = 0  # boundary rows carry no gap
        seg_of = np.repeat(np.arange(n_ent, dtype=np.int64), cnt)
        s = np.bincount(seg_of, weights=gaps.astype(np.float64),
                        minlength=n_ent).astype(np.int64)
        sq = np.bincount(seg_of, weights=(gaps * gaps).astype(np.float64),
                         minlength=n_ent).astype(np.int64)
        n_gaps = (cnt - 1).astype(np.int64)
        uid = column_i64(tbl, "o_custkey")[starts[:-1]]
        s, sq, n_gaps, cnt, uid = (s[keep], sq[keep], n_gaps[keep],
                                   cnt[keep].astype(np.int64), uid[keep])
        nd = n_gaps.astype(np.float64)
        mean = s.astype(np.float64) / n_gaps
        m2 = n_gaps * sq - s * s
        std = _round_away(np.sqrt(m2.astype(np.float64)) / n_gaps, 6)
        _ = nd
        return pa.table({"o_custkey": pa.array(uid),
                         "n_orders": pa.array(cnt),
                         "n_gaps": pa.array(n_gaps),
                         "sum_gap_days": pa.array(s),
                         "mean_gap": pa.array(mean),
                         "std_gap": pa.array(std)})

    return grouped_by_bucket(
        ds.map_batches(prep, batch_format="pyarrow"), cadence_of_bucket,
        entity_col="o_custkey", num_buckets=NB)


SQL_ORDERS_INTERARRIVAL = """
WITH o AS (SELECT o_custkey,
                  datediff('day', DATE '1970-01-01',
                           CAST(o_orderdate AS DATE)) AS d
           FROM orders),
g AS (SELECT o_custkey,
             d - lag(d) OVER (PARTITION BY o_custkey ORDER BY d) AS gap
      FROM o),
a AS (SELECT o_custkey,
             CAST(count(*) AS BIGINT) AS n_gaps,
             CAST(sum(gap) AS BIGINT) AS s,
             CAST(sum(gap * gap) AS BIGINT) AS sq
      FROM g WHERE gap IS NOT NULL GROUP BY o_custkey)
SELECT o_custkey,
       n_gaps + 1 AS n_orders,
       n_gaps,
       s AS sum_gap_days,
       CAST(s AS DOUBLE) / n_gaps AS mean_gap,
       round(sqrt(CAST(n_gaps * sq - s * s AS DOUBLE)) / n_gaps, 6)
           AS std_gap
FROM a
"""


def q_lineitem_return_ci(sf_dir: str):
    """WILSON 95% SCORE INTERVAL on the monthly return rate — the
    small-n-safe binomial CI every data-quality dashboard needs.
    Counts (n lines, k returned per ship-month) are exact keyed_sum
    integers; the interval itself is the only float math, computed on
    the ~90-row driver result in exactly SQL's expression order
    (stages/mleval.py:wilson_bounds)."""
    from pymhealth_ray.stages.aggregate import keyed_sum
    from pymhealth_ray.stages.mleval import wilson_bounds

    li = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_shipdate", "l_returnflag"])

    def partial(b: pa.Table) -> pa.Table:
        sd = b["l_shipdate"]
        if isinstance(sd, pa.ChunkedArray):
            sd = sd.combine_chunks()
        ym = (pc.year(sd).cast(pa.int64()).to_numpy(zero_copy_only=False)
              * 100
              + pc.month(sd).cast(pa.int64()).to_numpy(zero_copy_only=False))
        rf = b["l_returnflag"]
        if isinstance(rf, pa.ChunkedArray):
            rf = rf.combine_chunks()
        is_r = pc.equal(rf, "R").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        u, inv = np.unique(ym, return_inverse=True)
        return pa.table({
            "ym": pa.array(u.astype(np.int64)),
            "n": pa.array(np.bincount(inv, minlength=u.size)
                          .astype(np.int64)),
            "k": pa.array(np.bincount(inv, weights=is_r.astype(np.float64),
                                      minlength=u.size).astype(np.int64))})

    rows = keyed_sum(li.map_batches(partial, batch_format="pyarrow",
                                    batch_size=None),
                     "ym", ["n", "k"], num_buckets=NB,
                     precombine_rows=None).take_all()
    ym = np.array([r["ym"] for r in rows], dtype=np.int64)
    n = np.array([r["n"] for r in rows], dtype=np.int64)
    k = np.array([r["k"] for r in rows], dtype=np.int64)
    order = np.argsort(ym)
    ym, n, k = ym[order], n[order], k[order]
    lo, hi = wilson_bounds(k, n)
    return pa.table({"ym": pa.array(ym), "n": pa.array(n),
                     "k": pa.array(k),
                     "wilson_lo": pa.array(_round_away(lo, 6)),
                     "wilson_hi": pa.array(_round_away(hi, 6))})


SQL_LINEITEM_RETURN_CI = """
WITH m AS (SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate)
                       AS BIGINT) AS ym,
                  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r
           FROM lineitem),
a AS (SELECT ym, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(r) AS BIGINT) AS k
      FROM m GROUP BY ym),
f AS (SELECT ym, n, k, CAST(k AS DOUBLE) / n AS p,
             CAST(n AS DOUBLE) AS nd, 1.96 * 1.96 AS c
      FROM a)
SELECT ym, n, k,
       round((p + c / (2 * nd)
              - 1.96 * sqrt((p * (1 - p) + c / (4 * nd)) / nd))
             / (1 + c / nd), 6) AS wilson_lo,
       round((p + c / (2 * nd)
              + 1.96 * sqrt((p * (1 - p) + c / (4 * nd)) / nd))
             / (1 + c / nd), 6) AS wilson_hi
FROM f
"""


def q_docs_readability(sf_dir: str):
    """FLESCH-STYLE READABILITY signal — the classic text-quality
    heuristic (score = 206.835 − 1.015·W/S − 84.6·V/W with vowel
    groups as the in-container syllable proxy). One map-only stage of
    three RE2 kernels (pc.count_substring_regex — same engine DuckDB
    uses, so counts match exactly); int/int divisions mirrored to SQL
    op order, round-6 output."""
    ds = read_table(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])

    def feats(b: pa.Table) -> pa.Table:
        txt = b["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        w = pc.count_substring_regex(txt, pattern=r"\S+") \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        s = pc.count_substring_regex(txt, pattern=r"[.!?]+") \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = pc.count_substring_regex(txt, pattern=r"[aeiouAEIOU]+") \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = w > 0
        doc = b["doc_id"]
        if isinstance(doc, pa.ChunkedArray):
            doc = doc.combine_chunks()
        doc = doc.to_numpy(zero_copy_only=False)[keep]
        w, s, v = w[keep], s[keep], v[keep]
        sden = np.maximum(np.int64(1), s)
        flesch = _round_away(
            206.835 - 1.015 * (w.astype(np.float64) / sden)
            - 84.6 * (v.astype(np.float64) / w), 6)
        return pa.table({"doc_id": pa.array(doc.astype(np.int64)),
                         "n_words": pa.array(w),
                         "n_sentences": pa.array(s),
                         "n_vowel_groups": pa.array(v),
                         "flesch": pa.array(flesch)})

    return ds.map_batches(feats, batch_format="pyarrow")


SQL_DOCS_READABILITY = r"""
WITH f AS (SELECT doc_id,
        CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
        CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)
            AS n_sentences,
        CAST(len(regexp_extract_all(text, '[aeiouAEIOU]+')) AS BIGINT)
            AS n_vowel_groups
    FROM documents)
SELECT doc_id, n_words, n_sentences, n_vowel_groups,
       round(206.835
             - 1.015 * (CAST(n_words AS DOUBLE)
                        / greatest(1, n_sentences))
             - 84.6 * (CAST(n_vowel_groups AS DOUBLE) / n_words), 6)
           AS flesch
FROM f WHERE n_words > 0
"""


# --------------------------------------------------------------------------
# round-5 fourth-session wave B: MTTR / funnel latency / attribution / OOD
# --------------------------------------------------------------------------


def q_events_mttr(sf_dir: str):
    """MEAN-TIME-TO-RESOLUTION per user — each 'error' event matched to
    the FIRST following non-error event in (ts, event_id) order (the
    ops-analytics staple). One grouped_by_bucket exchange; the match is
    a vectorized searchsorted over the segment's non-error positions
    (no per-row loop); sums stay int64 (res ≤ span·errors « 2^63) and
    only the closing mean divides."""
    from pymhealth_ray.stages.partition import (column_i64, entity_segments,
                                                grouped_by_bucket)

    ev = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        et = b["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        return pa.table({
            "user_id": b["user_id"], "ts_us": b["ts_us"],
            "event_id": b["event_id"],
            "is_err": pc.equal(et, "error").cast(pa.int8())})

    def mttr_of_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], type=pa.int64()),
                          "n_errors": pa.array([], type=pa.int64()),
                          "n_resolved": pa.array([], type=pa.int64()),
                          "sum_res_us": pa.array([], type=pa.int64()),
                          "mean_res_us": pa.array([], type=pa.float64())})
        if tbl.num_rows == 0:
            return empty
        tbl, starts, n_ent = entity_segments(tbl, "user_id", "ts_us",
                                             tiebreak_col="event_id")
        is_err = tbl["is_err"].to_numpy(zero_copy_only=False).astype(bool)
        ts = column_i64(tbl, "ts_us")
        n = tbl.num_rows
        cnt = np.diff(starts)
        seg_of = np.repeat(np.arange(n_ent, dtype=np.int64), cnt)
        eidx = np.flatnonzero(is_err)
        if eidx.size == 0:
            return empty
        ne = np.flatnonzero(~is_err)
        pos = np.searchsorted(ne, eidx, side="right")
        nxt = np.where(pos < ne.size, ne[np.minimum(pos, ne.size - 1)], -1)
        ok = (nxt >= 0) & (seg_of[np.maximum(nxt, 0)] == seg_of[eidx])
        res = np.where(ok, ts[np.maximum(nxt, 0)] - ts[eidx], 0)
        eseg = seg_of[eidx]
        n_err = np.bincount(eseg, minlength=n_ent).astype(np.int64)
        n_res = np.bincount(eseg[ok], minlength=n_ent).astype(np.int64)
        # res values fit float64 exactly? span·µs ≈ 1e14 < 2^53 per value,
        # but SUMS may not — use int accumulation via np.add.reduceat-free
        # bincount on int64 (weights float is unsafe) → do an argsort-free
        # reduceat: eidx ascending ⇒ eseg nondecreasing ⇒ segment bounds
        first = np.ones(eidx.size, dtype=bool)
        first[1:] = eseg[1:] != eseg[:-1]
        bounds = np.flatnonzero(first)
        sums = np.add.reduceat(res, bounds)
        useg = eseg[first]
        keep = n_err > 0
        uid = column_i64(tbl, "user_id")[starts[:-1]][keep]
        n_err_k, n_res_k = n_err[keep], n_res[keep]
        sum_res = np.zeros(n_ent, dtype=np.int64)
        sum_res[useg] = sums
        sum_res = sum_res[keep]
        mean = np.where(n_res_k > 0,
                        sum_res.astype(np.float64)
                        / np.maximum(n_res_k, 1), np.nan)
        marr = pa.array(np.where(np.isnan(mean), 0.0, mean))
        marr = pc.if_else(pa.array(n_res_k > 0), marr,
                          pa.nulls(len(mean), type=pa.float64()))
        return pa.table({"user_id": pa.array(uid),
                         "n_errors": pa.array(n_err_k),
                         "n_resolved": pa.array(n_res_k),
                         "sum_res_us": pa.array(sum_res),
                         "mean_res_us": marr})

    return grouped_by_bucket(
        ev.map_batches(prep, batch_format="pyarrow"), mttr_of_bucket,
        entity_col="user_id", num_buckets=NB)


SQL_EVENTS_MTTR = """
WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
           FROM events),
w AS (SELECT user_id, event_type, ts_us,
             min(CASE WHEN event_type <> 'error' THEN ts_us END)
               OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS nxt
      FROM e)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_errors,
       CAST(count(nxt) AS BIGINT) AS n_resolved,
       CAST(coalesce(sum(nxt - ts_us), 0) AS BIGINT) AS sum_res_us,
       CASE WHEN count(nxt) > 0
            THEN CAST(sum(nxt - ts_us) AS DOUBLE) / count(nxt)
       END AS mean_res_us
FROM w WHERE event_type = 'error'
GROUP BY user_id
"""


def q_events_funnel_latency(sf_dir: str):
    """SIGNUP→PURCHASE conversion-latency distribution — per user, the
    first purchase STRICTLY AFTER the first signup in (ts, event_id)
    order; global exact quantile_disc over the per-user latencies in
    whole seconds. The latency extraction is one bucket exchange; the
    quantiles ride the value-histogram combiner (grouped_quantiles), so
    nothing bigger than |distinct seconds| crosses the cluster."""
    from pymhealth_ray.stages.aggregate import grouped_quantiles
    from pymhealth_ray.stages.partition import (column_i64, entity_segments,
                                                grouped_by_bucket)

    ev = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        et = b["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        return pa.table({
            "user_id": b["user_id"], "ts_us": b["ts_us"],
            "event_id": b["event_id"],
            "is_s": pc.equal(et, "signup").cast(pa.int8()),
            "is_p": pc.equal(et, "purchase").cast(pa.int8())})

    def lat_of_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"g": pa.array([], type=pa.int64()),
                          "lat_s": pa.array([], type=pa.int64())})
        if tbl.num_rows == 0:
            return empty
        tbl, starts, n_ent = entity_segments(tbl, "user_id", "ts_us",
                                             tiebreak_col="event_id")
        is_s = tbl["is_s"].to_numpy(zero_copy_only=False).astype(bool)
        is_p = tbl["is_p"].to_numpy(zero_copy_only=False).astype(bool)
        ts = column_i64(tbl, "ts_us")
        n = tbl.num_rows
        cnt = np.diff(starts)
        seg_of = np.repeat(np.arange(n_ent, dtype=np.int64), cnt)
        # first signup index per segment (n if none)
        first_s = np.full(n_ent, n, dtype=np.int64)
        sidx = np.flatnonzero(is_s)
        if sidx.size == 0:
            return empty
        sseg = seg_of[sidx]
        fs = np.ones(sidx.size, dtype=bool)
        fs[1:] = sseg[1:] != sseg[:-1]
        first_s[sseg[fs]] = sidx[fs]
        # first purchase index strictly after the segment's first signup
        pidx = np.flatnonzero(is_p)
        if pidx.size == 0:
            return empty
        pos = np.searchsorted(pidx, first_s[first_s < n], side="right")
        segs = np.flatnonzero(first_s < n)
        nxt = np.where(pos < pidx.size,
                       pidx[np.minimum(pos, pidx.size - 1)], -1)
        ok = (nxt >= 0) & (seg_of[np.maximum(nxt, 0)] == segs)
        if not ok.any():
            return empty
        s_at = first_s[segs[ok]]
        p_at = nxt[ok]
        lat = (ts[p_at] - ts[s_at]) // 1_000_000
        return pa.table({
            "g": pa.array(np.zeros(int(ok.sum()), dtype=np.int64)),
            "lat_s": pa.array(lat.astype(np.int64))})

    lats = grouped_by_bucket(
        ev.map_batches(prep, batch_format="pyarrow"), lat_of_bucket,
        entity_col="user_id", num_buckets=NB)
    out = grouped_quantiles(lats, ["g"], "lat_s",
                            qs=(0.25, 0.5, 0.75, 0.9),
                            num_buckets=NB, count_name="n")

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "n": b["n"],
            "q25": b["q25"].cast(pa.int64()),
            "q50": b["q50"].cast(pa.int64()),
            "q75": b["q75"].cast(pa.int64()),
            "q90": b["q90"].cast(pa.int64())})

    return out.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_FUNNEL_LATENCY = """
WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
           FROM events),
r AS (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts_us, event_id) AS rn
      FROM e),
s1 AS (SELECT user_id, min(rn) AS srn FROM r
       WHERE event_type = 'signup' GROUP BY user_id),
st AS (SELECT r.user_id, r.ts_us AS s_ts, s1.srn
       FROM r JOIN s1 ON r.user_id = s1.user_id AND r.rn = s1.srn),
p1 AS (SELECT r.user_id, min(r.ts_us) AS p_ts
       FROM r JOIN st ON r.user_id = st.user_id AND r.rn > st.srn
       WHERE r.event_type = 'purchase' GROUP BY r.user_id),
l AS (SELECT (p_ts - s_ts) // 1000000 AS lat_s
      FROM p1 JOIN st USING (user_id))
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(quantile_disc(lat_s, 0.25) AS BIGINT) AS q25,
       CAST(quantile_disc(lat_s, 0.5) AS BIGINT) AS q50,
       CAST(quantile_disc(lat_s, 0.75) AS BIGINT) AS q75,
       CAST(quantile_disc(lat_s, 0.9) AS BIGINT) AS q90
FROM l HAVING count(*) > 0
"""


def q_events_linear_attribution(sf_dir: str):
    """LINEAR MULTI-TOUCH ATTRIBUTION — each purchase's preceding
    touches (views/clicks since the previous purchase) share one unit
    of credit equally. Reported at the (touch type, journey size k)
    grain, so every float is a single per-row division (count/k) —
    no cross-journey float sums to order. One bucket exchange + one
    packed-key keyed_sum; journeys without a closing purchase drop."""
    from pymhealth_ray.stages.aggregate import keyed_sum
    from pymhealth_ray.stages.partition import (entity_segments,
                                                grouped_by_bucket)

    ev = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        et = b["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        return pa.table({
            "user_id": b["user_id"], "ts_us": b["ts_us"],
            "event_id": b["event_id"],
            "is_p": pc.equal(et, "purchase").cast(pa.int8()),
            "is_v": pc.equal(et, "view").cast(pa.int8()),
            "is_c": pc.equal(et, "click").cast(pa.int8())})

    def partial_of_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"key": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64())})
        if tbl.num_rows == 0:
            return empty
        tbl, starts, n_ent = entity_segments(tbl, "user_id", "ts_us",
                                             tiebreak_col="event_id")
        is_p = tbl["is_p"].to_numpy(zero_copy_only=False).astype(bool)
        is_v = tbl["is_v"].to_numpy(zero_copy_only=False).astype(bool)
        is_c = tbl["is_c"].to_numpy(zero_copy_only=False).astype(bool)
        n = tbl.num_rows
        cnt = np.diff(starts)
        seg_of = np.repeat(np.arange(n_ent, dtype=np.int64), cnt)
        c = np.cumsum(is_p.astype(np.int64))
        off = c[starts[:-1]] - is_p[starts[:-1]].astype(np.int64)
        pcum = c - off[seg_of]          # inclusive within-segment count
        n_p = pcum[starts[1:] - 1]      # purchases per segment
        touch = is_v | is_c
        tidx = np.flatnonzero(touch)
        if tidx.size == 0:
            return empty
        jid = pcum[tidx] + 1            # journey of each touch
        valid = jid <= n_p[seg_of[tidx]]
        tidx, jid = tidx[valid], jid[valid]
        if tidx.size == 0:
            return empty
        BIG = np.int64(1) << 32
        jkey = seg_of[tidx] * BIG + jid
        uj, inv, kk = np.unique(jkey, return_inverse=True,
                                return_counts=True)
        k_of_touch = kk[inv]
        code = is_c[tidx].astype(np.int64)  # 0=view, 1=click
        pk = k_of_touch.astype(np.int64) * 2 + code
        u, cts = np.unique(pk, return_counts=True)
        return pa.table({"key": pa.array(u.astype(np.int64)),
                         "n": pa.array(cts.astype(np.int64))})

    parts = grouped_by_bucket(
        ev.map_batches(prep, batch_format="pyarrow"), partial_of_bucket,
        entity_col="user_id", num_buckets=NB)
    rows = keyed_sum(parts, "key", ["n"], num_buckets=NB,
                     precombine_rows=None).take_all()
    key = np.array([r["key"] for r in rows], dtype=np.int64)
    nt = np.array([r["n"] for r in rows], dtype=np.int64)
    order = np.argsort(key)
    key, nt = key[order], nt[order]
    k = key >> 1
    et = np.where(key & 1 == 1, "click", "view")
    credit = _round_away(nt.astype(np.float64) / k, 6)
    return pa.table({"event_type": pa.array(et.astype(object)),
                     "k": pa.array(k), "n_touches": pa.array(nt),
                     "credit": pa.array(credit)})


SQL_EVENTS_LINEAR_ATTRIBUTION = """
WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
           FROM events),
r AS (SELECT user_id, event_type,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS pcum
      FROM e),
np AS (SELECT user_id, max(pcum) AS n_p FROM r GROUP BY user_id),
t AS (SELECT user_id, event_type, pcum + 1 AS jid FROM r
      WHERE event_type IN ('view', 'click')),
tv AS (SELECT t.user_id, t.event_type, t.jid FROM t
       JOIN np USING (user_id) WHERE t.jid <= np.n_p),
k AS (SELECT user_id, jid, CAST(count(*) AS BIGINT) AS k
      FROM tv GROUP BY user_id, jid),
c AS (SELECT tv.event_type, k.k, CAST(count(*) AS BIGINT) AS n_touches
      FROM tv JOIN k USING (user_id, jid) GROUP BY tv.event_type, k.k)
SELECT event_type, k, n_touches,
       round(CAST(n_touches AS DOUBLE) / k, 6) AS credit
FROM c
"""


def q_embed_ood(sf_dir: str):
    """MAHALANOBIS OUT-OF-DISTRIBUTION audit — per label, the 10 most
    anomalous embeddings under that label's own ridge-regularized
    Gaussian (2-D events_mahalanobis lifted to the full 64-dim space).
    Per-label covariance comes from EXACT integer scatter partials
    (stages/pca.py — bit-identical under any partitioning), the float
    finish + per-row distance kernel are SHARED with the materialized
    oracle, and selection is a distributed grouped_topk."""
    from pymhealth_ray.stages.aggregate import grouped_topk
    from pymhealth_ray.stages.pca import (_emb_matrix, _quantize,
                                          gaussian_md2_params,
                                          label_scatter_partials,
                                          md2_rows, merge_label_scatter)

    emb = read_table(f"{sf_dir}/embeddings.parquet",
                     columns=["vec_id", "embedding", "label"])
    emb = emb.materialize()  # consumed by partials AND the distance map
    stats = merge_label_scatter(label_scatter_partials(emb).take_all())
    params = {lv: gaussian_md2_params(n, s, ss)
              for lv, (n, s, ss) in stats.items()}
    params_ref = ray.put(params)

    def dist(b: pa.Table) -> pa.Table:
        pr = ray.get(params_ref)
        q = _quantize(_emb_matrix(b, "embedding"), 18)
        lab = b["label"]
        if isinstance(lab, pa.ChunkedArray):
            lab = lab.combine_chunks()
        lab = lab.to_numpy(zero_copy_only=False).astype(np.int64)
        vid = b["vec_id"]
        if isinstance(vid, pa.ChunkedArray):
            vid = vid.combine_chunks()
        vid = vid.to_numpy(zero_copy_only=False).astype(np.int64)
        md2 = np.empty(len(lab), dtype=np.float64)
        for lv in np.unique(lab):
            mu, inv = pr[int(lv)]
            m = lab == lv
            md2[m] = md2_rows(q[m], mu, inv)
        return pa.table({"label": pa.array(lab),
                         "vec_id": pa.array(vid),
                         "md2": pa.array(md2)})

    scored = emb.map_batches(dist, batch_format="pyarrow")
    top = grouped_topk(scored, ["label"], "md2", k=10, descending=True,
                       tie_cols=["vec_id"], rank_name="rank",
                       num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "label": b["label"].cast(pa.int64()),
            "rank": b["rank"].cast(pa.int64()),
            "vec_id": b["vec_id"].cast(pa.int64()),
            "md2": pa.array(_round_away(
                b["md2"].to_numpy(zero_copy_only=False)
                if not isinstance(b["md2"], pa.ChunkedArray)
                else b["md2"].combine_chunks()
                .to_numpy(zero_copy_only=False), 6))})

    return top.map_batches(finish, batch_format="pyarrow")


def _embed_ood_expected(df):
    """Single-process replay of q_embed_ood: same quantization, same
    exact integer scatter (python ints), the same shared
    gaussian_md2_params / md2_rows kernels, (md2 DESC, vec_id ASC)
    top-10 per label, round-6."""
    import pandas as pd

    from pymhealth_ray.stages.pca import (gaussian_md2_params, md2_rows,
                                          _quantize)

    ids = df["vec_id"].to_numpy().astype(np.int64)
    labs = df["label"].to_numpy().astype(np.int64)
    P = np.array([np.asarray(e, dtype=np.float64) for e in df["embedding"]])
    q = _quantize(P, 18)
    rows = []
    for lv in np.unique(labs):
        m = labs == lv
        sub = q[m].astype(np.int64)
        n = int(m.sum())
        s = [int(v) for v in sub.sum(axis=0)]
        ss = [int(v) for v in (sub.T.astype(object) @ sub.astype(object))
              .ravel()]
        mu, inv = gaussian_md2_params(n, s, ss)
        md2 = md2_rows(q[m], mu, inv)
        vid = ids[m]
        order = np.lexsort((vid, -md2))[:10]
        for r, j in enumerate(order):
            rows.append((int(lv), r + 1, int(vid[j]), md2[j]))
    lab = np.array([r[0] for r in rows], dtype=np.int64)
    rk = np.array([r[1] for r in rows], dtype=np.int64)
    vid = np.array([r[2] for r in rows], dtype=np.int64)
    d2 = np.array([r[3] for r in rows], dtype=np.float64)
    m = 10.0**6
    d2 = np.sign(d2) * np.floor(np.abs(d2) * m + 0.5) / m
    return pd.DataFrame({"label": lab, "rank": rk, "vec_id": vid,
                         "md2": d2})


# --------------------------------------------------------------------------
# round-5 fourth-session wave C: Haar wavelet energy / ROUGE-1 drift
# --------------------------------------------------------------------------


def q_seq_haar_energy(sf_dir: str):
    """HAAR WAVELET ENERGY by level — the missing wavelet entry in the
    signal-feature family (frequency.py covers Fourier; Haar covers
    dyadic time-frequency). Unnormalized lifting: level sums
    a[i]=x[2i]+x[2i+1], details d[i]=x[2i]−x[2i+1], energy_L = Σd² —
    ALL integer arithmetic (dyadic-exact, the events_hampel lesson),
    odd tails dropped per level. Map-only, vectorized ACROSS rows via
    offset ramps (no per-row loop); three levels."""
    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "n_tok", "tokens"])

    def haar(b: pa.Table) -> pa.Table:
        col = b["tokens"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = col.values.to_numpy(zero_copy_only=False).astype(np.int64)
        rows = len(col)
        counts = np.diff(off)
        starts = off[:-1].copy()
        energies = []
        for _level in range(3):
            m = counts // 2
            tot = int(m.sum())
            e = np.zeros(rows, dtype=np.int64)
            if tot:
                row_of = np.repeat(np.arange(rows, dtype=np.int64), m)
                cm = np.concatenate([[0], np.cumsum(m)[:-1]])
                pos = np.arange(tot, dtype=np.int64) - cm[row_of]
                base = starts[row_of] + 2 * pos
                x0, x1 = flat[base], flat[base + 1]
                d = x0 - x1
                first = np.ones(tot, dtype=bool)
                first[1:] = row_of[1:] != row_of[:-1]
                bounds = np.flatnonzero(first)
                e[row_of[first]] = np.add.reduceat(d * d, bounds)
                # next level input: the pair sums, densely packed
                flat = x0 + x1
                starts = cm
            else:
                flat = np.zeros(0, dtype=np.int64)
                starts = np.zeros(rows, dtype=np.int64)
            counts = m
            energies.append(e)
        return pa.table({
            "doc_id": b["doc_id"], "ts_ns": b["ts_ns"],
            "n_tok": b["n_tok"].cast(pa.int64()),
            "e1": pa.array(energies[0]), "e2": pa.array(energies[1]),
            "e3": pa.array(energies[2])})

    return ds.map_batches(haar, batch_format="pyarrow")


def sql_seq_haar_energy(path: str) -> str:
    return f"""
WITH s AS (SELECT doc_id, ts_ns, CAST(n_tok AS BIGINT) AS n_tok,
                  list_transform(tokens, x -> CAST(x AS BIGINT)) AS t0
           FROM read_parquet('{path}/part-*.parquet')),
l1 AS (SELECT doc_id, ts_ns, n_tok,
         list_transform(range(1, CAST(len(t0) // 2 AS BIGINT) + 1),
                        i -> t0[2 * i - 1] + t0[2 * i]) AS t1,
         CAST(coalesce(list_sum(list_transform(
                range(1, CAST(len(t0) // 2 AS BIGINT) + 1),
                i -> (t0[2 * i - 1] - t0[2 * i])
                     * (t0[2 * i - 1] - t0[2 * i]))), 0) AS BIGINT) AS e1
       FROM s),
l2 AS (SELECT doc_id, ts_ns, n_tok, e1,
         list_transform(range(1, CAST(len(t1) // 2 AS BIGINT) + 1),
                        i -> t1[2 * i - 1] + t1[2 * i]) AS t2,
         CAST(coalesce(list_sum(list_transform(
                range(1, CAST(len(t1) // 2 AS BIGINT) + 1),
                i -> (t1[2 * i - 1] - t1[2 * i])
                     * (t1[2 * i - 1] - t1[2 * i]))), 0) AS BIGINT) AS e2
       FROM l1)
SELECT doc_id, ts_ns, n_tok, e1, e2,
       CAST(coalesce(list_sum(list_transform(
              range(1, CAST(len(t2) // 2 AS BIGINT) + 1),
              i -> (t2[2 * i - 1] - t2[2 * i])
                   * (t2[2 * i - 1] - t2[2 * i]))), 0) AS BIGINT) AS e3
FROM l2
"""


def q_seq_rouge_pairs(sf_dir: str):
    """ROUGE-1 TEMPORAL DRIFT — unigram-recall overlap between each
    sequence window and the NEXT window of the same document (the
    summarization-eval kernel applied as a content-drift probe):
    rouge1 = Σ_tok min(cnt_a, cnt_b) / |b|. Documents co-locate in one
    bucket exchange; the multiset intersection is vectorized ACROSS
    all pairs via packed (pair, token) keys + one searchsorted — no
    per-pair Python."""
    from pymhealth_ray.stages.partition import grouped_by_bucket

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "tokens"])

    def pairs_of_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], type=pa.string()),
                          "ts_ns": pa.array([], type=pa.int64()),
                          "overlap": pa.array([], type=pa.int64()),
                          "len_b": pa.array([], type=pa.int64()),
                          "rouge1": pa.array([], type=pa.float64())})
        if tbl.num_rows == 0:
            return empty
        order = pc.sort_indices(tbl, sort_keys=[("doc_id", "ascending"),
                                                ("ts_ns", "ascending")])
        tbl = tbl.take(order)
        doc = tbl["doc_id"]
        if isinstance(doc, pa.ChunkedArray):
            doc = doc.combine_chunks()
        codes = doc.dictionary_encode().indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        col = tbl["tokens"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = col.values.to_numpy(zero_copy_only=False).astype(np.int64)
        n = tbl.num_rows
        nxt_same = np.zeros(n, dtype=bool)
        nxt_same[:-1] = codes[1:] == codes[:-1]
        a_rows = np.flatnonzero(nxt_same)          # row i -> pair (i, i+1)
        if a_rows.size == 0:
            return empty
        lens = np.diff(off)
        keep = lens[a_rows + 1] > 0                # |b| > 0
        a_rows = a_rows[keep]
        if a_rows.size == 0:
            return empty
        pair_of_row = np.full(n, -1, dtype=np.int64)
        pair_of_row[a_rows] = np.arange(a_rows.size)
        pair_b = np.full(n, -1, dtype=np.int64)
        pair_b[a_rows + 1] = np.arange(a_rows.size)

        def side_counts(rows_sel, pair_ids):
            cnts = lens[rows_sel]
            tot = int(cnts.sum())
            pid = np.repeat(pair_ids, cnts)
            cm = np.concatenate([[0], np.cumsum(cnts)[:-1]])
            ramp = np.arange(tot, dtype=np.int64) - np.repeat(cm, cnts)
            toks = flat[np.repeat(off[rows_sel], cnts) + ramp]
            key = pid * (np.int64(1) << 32) + toks
            u, c = np.unique(key, return_counts=True)
            return u, c.astype(np.int64)

        ua, ca = side_counts(a_rows, np.arange(a_rows.size))
        ub, cb = side_counts(a_rows + 1, np.arange(a_rows.size))
        pos = np.searchsorted(ua, ub)
        pos_c = np.minimum(pos, max(len(ua) - 1, 0))
        hit = np.zeros(len(ub), dtype=bool)
        if len(ua):
            hit = (pos < len(ua)) & (ua[pos_c] == ub)
        mins = np.minimum(ca[pos_c[hit]], cb[hit])
        pair_of_key = (ub[hit] >> 32)
        # mins ≤ window length « 2^53 → float-weight bincount stays exact
        overlap = np.bincount(pair_of_key, weights=mins.astype(np.float64),
                              minlength=a_rows.size).astype(np.int64)
        len_b = lens[a_rows + 1].astype(np.int64)
        rouge = _round_away(overlap.astype(np.float64) / len_b, 6)
        did = doc.to_numpy(zero_copy_only=False)[a_rows]
        ts = column_ts = tbl["ts_ns"]
        if isinstance(column_ts, pa.ChunkedArray):
            ts = column_ts.combine_chunks()
        ts = ts.to_numpy(zero_copy_only=False)[a_rows]
        return pa.table({"doc_id": pa.array(did.astype(object),
                                            type=pa.string()),
                         "ts_ns": pa.array(ts.astype(np.int64)),
                         "overlap": pa.array(overlap),
                         "len_b": pa.array(len_b),
                         "rouge1": pa.array(rouge)})

    return grouped_by_bucket(ds, pairs_of_bucket, entity_col="doc_id",
                             num_buckets=NB)


def sql_seq_rouge_pairs(path: str) -> str:
    return f"""
WITH s AS (SELECT doc_id, ts_ns, tokens
           FROM read_parquet('{path}/part-*.parquet')),
r AS (SELECT doc_id, ts_ns, tokens,
             lead(ts_ns) OVER w AS ts_b,
             lead(tokens) OVER w AS tok_b
      FROM s WINDOW w AS (PARTITION BY doc_id ORDER BY ts_ns)),
p AS (SELECT doc_id, ts_ns, tokens, tok_b FROM r
      WHERE ts_b IS NOT NULL AND len(tok_b) > 0),
ua AS (SELECT doc_id, ts_ns, t, CAST(count(*) AS BIGINT) AS ca
       FROM (SELECT doc_id, ts_ns, unnest(tokens) AS t FROM p)
       GROUP BY doc_id, ts_ns, t),
ub AS (SELECT doc_id, ts_ns, t, CAST(count(*) AS BIGINT) AS cb
       FROM (SELECT doc_id, ts_ns, unnest(tok_b) AS t FROM p)
       GROUP BY doc_id, ts_ns, t),
ov AS (SELECT ua.doc_id, ua.ts_ns,
              CAST(sum(least(ua.ca, ub.cb)) AS BIGINT) AS overlap
       FROM ua JOIN ub ON ua.doc_id = ub.doc_id
            AND ua.ts_ns = ub.ts_ns AND ua.t = ub.t
       GROUP BY ua.doc_id, ua.ts_ns)
SELECT p.doc_id, p.ts_ns,
       CAST(coalesce(ov.overlap, 0) AS BIGINT) AS overlap,
       CAST(len(p.tok_b) AS BIGINT) AS len_b,
       round(CAST(coalesce(ov.overlap, 0) AS DOUBLE) / len(p.tok_b), 6)
           AS rouge1
FROM p LEFT JOIN ov ON p.doc_id = ov.doc_id AND p.ts_ns = ov.ts_ns
"""


# --------------------------------------------------------------------------
# round-5 fourth-session wave D: ship latency / backtest / chi2 / probe
# --------------------------------------------------------------------------


def q_orders_ship_latency(sf_dir: str):
    """ORDER→SHIP LATENCY distribution by priority — the fulfilment
    SLA view: one hash equi-join (lineitem ⋈ orders), then per-priority
    exact integer moments merged as PYTHON INTS on the driver (the
    events_cuped overflow discipline: n·Σx² at petabyte row counts
    exceeds int64, so block partials stay int64-bounded and the merge
    is arbitrary-precision); one float finish in SQL op order."""
    from pymhealth_ray.stages.join import equi_join

    li = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_orderkey", "l_shipdate"])
    od = read_table(f"{sf_dir}/orders.parquet",
                    columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def day_col(col):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_timestamp(col.type):
            return col.cast(pa.int64()).to_numpy(zero_copy_only=False) \
                // 86_400_000_000
        return col.cast(pa.date32()).cast(pa.int32()) \
            .to_numpy(zero_copy_only=False).astype(np.int64)

    def prep_li(b: pa.Table) -> pa.Table:
        return pa.table({"okey": b["l_orderkey"],
                         "ship_d": pa.array(day_col(b["l_shipdate"]))})

    def prep_od(b: pa.Table) -> pa.Table:
        return pa.table({"okey": b["o_orderkey"],
                         "order_d": pa.array(day_col(b["o_orderdate"])),
                         "prio": b["o_orderpriority"]})

    j = equi_join(li.map_batches(prep_li, batch_format="pyarrow"),
                  od.map_batches(prep_od, batch_format="pyarrow"),
                  on="okey", num_buckets=NB)

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"prio": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.int64()),
                             "sq": pa.array([], type=pa.int64()),
                             "mx": pa.array([], type=pa.int64())})
        lat = (b["ship_d"].to_numpy(zero_copy_only=False)
               - b["order_d"].to_numpy(zero_copy_only=False)) \
            .astype(np.int64)
        pr = b["prio"]
        if isinstance(pr, pa.ChunkedArray):
            pr = pr.combine_chunks()
        enc = pr.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nuniq = len(enc.dictionary)
        n = np.bincount(codes, minlength=nuniq).astype(np.int64)
        s = np.bincount(codes, weights=lat.astype(np.float64),
                        minlength=nuniq).astype(np.int64)
        sq = np.bincount(codes, weights=(lat * lat).astype(np.float64),
                         minlength=nuniq).astype(np.int64)
        mx = np.full(nuniq, np.iinfo(np.int64).min, dtype=np.int64)
        o = np.argsort(codes, kind="stable")
        cs = codes[o]
        first = np.ones(len(cs), dtype=bool)
        first[1:] = cs[1:] != cs[:-1]
        bounds = np.flatnonzero(first)
        mx[cs[first]] = np.maximum.reduceat(lat[o], bounds)
        return pa.table({"prio": enc.dictionary,
                         "n": pa.array(n), "s": pa.array(s),
                         "sq": pa.array(sq), "mx": pa.array(mx)})

    rows = j.map_batches(partial, batch_format="pyarrow",
                         batch_size=None).take_all()
    agg: dict = {}
    for r in rows:
        n0, s0, q0, m0 = agg.get(r["prio"], (0, 0, 0, None))
        agg[r["prio"]] = (n0 + int(r["n"]), s0 + int(r["s"]),
                          q0 + int(r["sq"]),
                          int(r["mx"]) if m0 is None
                          else max(m0, int(r["mx"])))
    prios = sorted(agg)
    n = np.array([agg[p][0] for p in prios], dtype=np.int64)
    mean = np.array([float(agg[p][1]) / agg[p][0] for p in prios])
    std = _round_away(np.array(
        [np.sqrt(float(agg[p][0] * agg[p][2] - agg[p][1] ** 2)) / agg[p][0]
         for p in prios]), 6)
    mx = np.array([agg[p][3] for p in prios], dtype=np.int64)
    return pa.table({"o_orderpriority": pa.array(prios, type=pa.string()),
                     "n": pa.array(n), "mean_days": pa.array(mean),
                     "std_days": pa.array(std), "max_days": pa.array(mx)})


SQL_ORDERS_SHIP_LATENCY = """
WITH l AS (SELECT o_orderpriority,
                  datediff('day', CAST(o_orderdate AS DATE),
                           CAST(l_shipdate AS DATE)) AS lat
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
a AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(lat) AS BIGINT) AS s,
             CAST(sum(lat * lat) AS BIGINT) AS sq,
             CAST(max(lat) AS BIGINT) AS mx
      FROM l GROUP BY o_orderpriority)
SELECT o_orderpriority, n,
       CAST(s AS DOUBLE) / n AS mean_days,
       round(sqrt(CAST(n * sq - s * s AS DOUBLE)) / n, 6) AS std_days,
       mx AS max_days
FROM a
"""


def q_orders_seasonal_naive(sf_dir: str):
    """SEASONAL-NAIVE BACKTEST — forecast tomorrow's daily order count
    with the count 7 days earlier, scored over the full calendar spine
    (zero-filled). Daily counts are a keyed_sum whose key domain is
    CALENDAR-BOUNDED (~2.5k days regardless of corpus size), so the
    driver-side spine walk is scale-safe; MAE/RMSE mirrored to SQL op
    order."""
    from pymhealth_ray.stages.aggregate import keyed_sum

    od = read_table(f"{sf_dir}/orders.parquet", columns=["o_orderdate"])

    def partial(b: pa.Table) -> pa.Table:
        col = b["o_orderdate"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_timestamp(col.type):
            d = col.cast(pa.int64()).to_numpy(zero_copy_only=False) \
                // 86_400_000_000
        else:
            d = col.cast(pa.date32()).cast(pa.int32()) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(d, return_counts=True)
        return pa.table({"d": pa.array(u.astype(np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    rows = keyed_sum(od.map_batches(partial, batch_format="pyarrow",
                                    batch_size=None),
                     "d", ["c"], num_buckets=NB,
                     precombine_rows=None).take_all()
    d = np.array([r["d"] for r in rows], dtype=np.int64)
    c = np.array([r["c"] for r in rows], dtype=np.int64)
    lo, hi = int(d.min()), int(d.max())
    dense = np.zeros(hi - lo + 1, dtype=np.int64)
    dense[d - lo] = c
    act = dense[7:]
    fc = dense[:-7]
    n_days = act.size
    err = act - fc
    tae = int(np.abs(err).sum())
    se = int((err * err).sum())
    return pa.table({
        "n_days": pa.array([n_days], type=pa.int64()),
        "total_abs_err": pa.array([tae], type=pa.int64()),
        "total_actual": pa.array([int(act.sum())], type=pa.int64()),
        "mae": pa.array([np.float64(tae) / n_days]),
        "rmse": pa.array(_round_away(
            np.array([np.sqrt(np.float64(se) / n_days)]), 6))})


SQL_ORDERS_SEASONAL_NAIVE = """
WITH d AS (SELECT datediff('day', DATE '1970-01-01',
                           CAST(o_orderdate AS DATE)) AS d,
                  CAST(count(*) AS BIGINT) AS c
           FROM orders GROUP BY 1),
b AS (SELECT min(d) AS lo, max(d) AS hi FROM d),
sp AS (SELECT unnest(range(lo + 7, hi + 1)) AS d FROM b),
e AS (SELECT sp.d, coalesce(a.c, 0) AS act, coalesce(f.c, 0) AS fc
      FROM sp LEFT JOIN d a ON a.d = sp.d
           LEFT JOIN d f ON f.d = sp.d - 7)
SELECT CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(abs(act - fc)) AS BIGINT) AS total_abs_err,
       CAST(sum(act) AS BIGINT) AS total_actual,
       CAST(sum(abs(act - fc)) AS DOUBLE) / count(*) AS mae,
       round(sqrt(CAST(sum((act - fc) * (act - fc)) AS DOUBLE)
                  / count(*)), 6) AS rmse
FROM e
"""


def q_customer_segment_chi2(sf_dir: str):
    """χ² INDEPENDENCE CELLS — nation × market segment contingency
    table with per-cell expectation and χ² contribution (the
    categorical-drift sibling of docs_token_chi2). Reported at the
    CELL grain so every float is a per-row expression in SQL op order
    — no cross-cell float sums to order. Counts are one bounded
    partial exchange (≤ |nations|·|segments| rows per block)."""
    cu = read_table(f"{sf_dir}/customer.parquet",
                    columns=["c_nationkey", "c_mktsegment"])

    def partial(b: pa.Table) -> pa.Table:
        nk = b["c_nationkey"]
        if isinstance(nk, pa.ChunkedArray):
            nk = nk.combine_chunks()
        nk = nk.to_numpy(zero_copy_only=False).astype(np.int64)
        sg = b["c_mktsegment"]
        if isinstance(sg, pa.ChunkedArray):
            sg = sg.combine_chunks()
        enc = sg.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        segs = enc.dictionary.to_pylist()
        key = nk * len(segs) + codes
        u, c = np.unique(key, return_counts=True)
        return pa.table({
            "c_nationkey": pa.array((u // len(segs)).astype(np.int64)),
            "c_mktsegment": pa.array(
                [segs[int(v)] for v in (u % len(segs))], type=pa.string()),
            "observed": pa.array(c.astype(np.int64))})

    rows = cu.map_batches(partial, batch_format="pyarrow",
                          batch_size=None).take_all()
    agg: dict = {}
    for r in rows:
        k = (int(r["c_nationkey"]), r["c_mktsegment"])
        agg[k] = agg.get(k, 0) + int(r["observed"])
    keys = sorted(agg)
    nk = np.array([k[0] for k in keys], dtype=np.int64)
    sg = [k[1] for k in keys]
    obs = np.array([agg[k] for k in keys], dtype=np.int64)
    rt_map: dict = {}
    ct_map: dict = {}
    for (a, b2), v in agg.items():
        rt_map[a] = rt_map.get(a, 0) + v
        ct_map[b2] = ct_map.get(b2, 0) + v
    gt = int(obs.sum())
    rt = np.array([rt_map[k[0]] for k in keys], dtype=np.int64)
    ct = np.array([ct_map[k[1]] for k in keys], dtype=np.int64)
    e = rt.astype(np.float64) * ct / gt
    chi = (obs - e) * (obs - e) / e
    return pa.table({"c_nationkey": pa.array(nk),
                     "c_mktsegment": pa.array(sg, type=pa.string()),
                     "observed": pa.array(obs),
                     "expected": pa.array(_round_away(e, 6)),
                     "cell_chi2": pa.array(_round_away(chi, 6))})


SQL_CUSTOMER_SEGMENT_CHI2 = """
WITH o AS (SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
                  c_mktsegment, CAST(count(*) AS BIGINT) AS observed
           FROM customer GROUP BY 1, 2),
r AS (SELECT c_nationkey, CAST(sum(observed) AS BIGINT) AS rt
      FROM o GROUP BY 1),
c AS (SELECT c_mktsegment, CAST(sum(observed) AS BIGINT) AS ct
      FROM o GROUP BY 1),
g AS (SELECT CAST(sum(observed) AS BIGINT) AS gt FROM o)
SELECT o.c_nationkey, o.c_mktsegment, o.observed,
       round(CAST(r.rt AS DOUBLE) * c.ct / g.gt, 6) AS expected,
       round((o.observed - CAST(r.rt AS DOUBLE) * c.ct / g.gt)
             * (o.observed - CAST(r.rt AS DOUBLE) * c.ct / g.gt)
             / (CAST(r.rt AS DOUBLE) * c.ct / g.gt), 6) AS cell_chi2
FROM o JOIN r USING (c_nationkey) JOIN c USING (c_mktsegment), g
"""


def q_embed_linear_probe(sf_dir: str):
    """CLOSED-FORM LINEAR PROBE — the standard representation-quality
    eval: one-vs-rest ridge regression fit by normal equations from
    the EXACT integer scatter partials (no SGD, no randomness —
    stages/pca.py:linear_probe_weights), argmax prediction (ties →
    smallest label), per-label accuracy. Weights are solved once on
    the driver and broadcast; scoring is a map; counts are exact."""
    from pymhealth_ray.stages.pca import (_emb_matrix, _quantize,
                                          label_scatter_partials,
                                          linear_probe_weights,
                                          merge_label_scatter)

    emb = read_table(f"{sf_dir}/embeddings.parquet",
                     columns=["vec_id", "embedding", "label"])
    emb = emb.materialize()  # consumed by partials AND the scoring map
    stats = merge_label_scatter(label_scatter_partials(emb).take_all())
    labels, W = linear_probe_weights(stats)
    w_ref = ray.put((labels, np.ascontiguousarray(W)))

    def score(b: pa.Table) -> pa.Table:
        labs_asc, Wm = ray.get(w_ref)
        q = _quantize(_emb_matrix(b, "embedding"), 18)
        lab = b["label"]
        if isinstance(lab, pa.ChunkedArray):
            lab = lab.combine_chunks()
        lab = lab.to_numpy(zero_copy_only=False).astype(np.int64)
        sc = q @ Wm.T
        pred = labs_asc[np.argmax(sc, axis=1)]  # first max → smallest label
        u, inv = np.unique(lab, return_inverse=True)
        n = np.bincount(inv, minlength=u.size).astype(np.int64)
        corr = np.bincount(inv, weights=(pred == lab).astype(np.float64),
                           minlength=u.size).astype(np.int64)
        return pa.table({"label": pa.array(u.astype(np.int64)),
                         "n": pa.array(n), "n_correct": pa.array(corr)})

    from pymhealth_ray.stages.aggregate import keyed_sum
    rows = keyed_sum(emb.map_batches(score, batch_format="pyarrow",
                                     batch_size=None),
                     "label", ["n", "n_correct"], num_buckets=NB,
                     precombine_rows=None).take_all()
    lab = np.array([r["label"] for r in rows], dtype=np.int64)
    n = np.array([r["n"] for r in rows], dtype=np.int64)
    cr = np.array([r["n_correct"] for r in rows], dtype=np.int64)
    o = np.argsort(lab)
    lab, n, cr = lab[o], n[o], cr[o]
    return pa.table({"label": pa.array(lab), "n": pa.array(n),
                     "n_correct": pa.array(cr),
                     "accuracy": pa.array(cr.astype(np.float64) / n)})


def _linear_probe_expected(df):
    """Single-process replay: same quantization, python-int scatter,
    the same linear_probe_weights / argmax rule, exact counts."""
    import pandas as pd

    from pymhealth_ray.stages.pca import (_quantize, linear_probe_weights)

    labs = df["label"].to_numpy().astype(np.int64)
    P = np.array([np.asarray(e, dtype=np.float64) for e in df["embedding"]])
    q = _quantize(P, 18)
    stats = {}
    for lv in np.unique(labs):
        m = labs == lv
        sub = q[m].astype(np.int64)
        s = [int(v) for v in sub.sum(axis=0)]
        ss = [int(v) for v in
              (sub.T.astype(object) @ sub.astype(object)).ravel()]
        stats[int(lv)] = (int(m.sum()), s, ss)
    labels, W = linear_probe_weights(stats)
    sc = q @ W.T
    pred = labels[np.argmax(sc, axis=1)]
    rows = []
    for lv in np.unique(labs):
        m = labs == lv
        n = int(m.sum())
        c = int((pred[m] == lv).sum())
        rows.append((int(lv), n, c))
    lab = np.array([r[0] for r in rows], dtype=np.int64)
    n = np.array([r[1] for r in rows], dtype=np.int64)
    cr = np.array([r[2] for r in rows], dtype=np.int64)
    return pd.DataFrame({"label": lab, "n": n, "n_correct": cr,
                         "accuracy": cr.astype(np.float64) / n})


# --------------------------------------------------------------------------
# round-5 fourth-session wave E: window dedup (+streaming twin) / stump / IPS
# --------------------------------------------------------------------------


DEDUP_WIN_US = 600_000_000  # 10 min


def q_events_dedup_window(sf_dir: str):
    """TIME-WINDOW DEDUP (debounce): drop an event when the previous
    event of the same (user, type) lies within 10 minutes — the
    retry-storm / double-fire suppressor that runs before counting.
    Lag-based semantics (rows compare to the previous EVENT, kept or
    not), so it is exactly a SQL lag() predicate and partition-
    invariant; one user-bucket exchange, sort + shifted-compare kernel
    (stages/lag.dedup_within_window)."""
    from pymhealth_ray.stages.lag import dedup_within_window

    ev = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])
    out = dedup_within_window(ev, ["user_id", "event_type"], "ts_us",
                              DEDUP_WIN_US, tiebreak_col="event_id",
                              num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        return b.select(["event_id", "user_id", "event_type", "ts_us"])

    return out.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_DEDUP_WINDOW = """
WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
           FROM events),
l AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts_us, event_id) AS pts
      FROM e)
SELECT event_id, user_id, event_type, ts_us
FROM l WHERE pts IS NULL OR ts_us - pts > 600000000
"""


def q_events_streaming_dedup(sf_dir: str):
    """STREAMING twin of events_dedup_window (10th streaming family
    member): the debounce filter read straight off the sorted bucketed
    events layout — one task per partition file, a bounded
    {type -> last ts} carry across Arrow batch boundaries, ZERO
    query-time exchange (stages/streaming.streaming_window_dedup).
    Shares events_dedup_window's SQL oracle, so the exchange plan and
    the streaming plan are verified against the same truth."""
    from pymhealth_ray.stages.streaming import streaming_window_dedup

    ev = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        return b.select(["user_id", "ts_us", "event_id", "event_type"])

    ds = ev.map_batches(prep, batch_format="pyarrow")
    layout = _sorted_layout(sf_dir, ds, suffix="_windedup",
                            entity_col="user_id",
                            sort_cols=["user_id", "ts_us", "event_id"])
    out = streaming_window_dedup(layout, entity_col="user_id",
                                 type_col="event_type", ts_col="ts_us",
                                 keep_cols=["event_id"],
                                 window=DEDUP_WIN_US)

    def finish(b: pa.Table) -> pa.Table:
        return b.select(["event_id", "user_id", "event_type", "ts_us"])

    return out.map_batches(finish, batch_format="pyarrow")


def q_events_gini_split(sf_dir: str):
    """DECISION-STUMP BEST SPLIT — the XGBoost histogram trick at
    cluster scale: find the value threshold that best separates
    purchases from the rest by Gini impurity decrease. Per-block
    (cents value, label) count partials shrink to the DISTINCT-VALUE
    domain (bounded by the price grid, not the row count) in one
    keyed_sum; the driver scans the cumulative histogram once. Every
    float is the same IEEE expression over exact int64 cumsums on both
    sides, and the winner is picked on UNROUNDED gains (ties -> lowest
    threshold), so the result is bit-stable under any partitioning."""
    from pymhealth_ray.stages.aggregate import keyed_sum

    ev = read_table(f"{sf_dir}/events.parquet",
                    columns=["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "v")
        v = b["v"].to_numpy(zero_copy_only=False)
        et = b["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        y = pc.equal(et, "purchase").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        u, inv = np.unique(v, return_inverse=True)
        return pa.table({
            "v": pa.array(u.astype(np.int64)),
            "n": pa.array(np.bincount(inv, minlength=u.size)
                          .astype(np.int64)),
            "n1": pa.array(np.bincount(inv, weights=y.astype(np.float64),
                                       minlength=u.size).astype(np.int64))})

    rows = keyed_sum(ev.map_batches(partial, batch_format="pyarrow",
                                    batch_size=None),
                     "v", ["n", "n1"], num_buckets=NB,
                     precombine_rows=None).take_all()
    v = np.array([r["v"] for r in rows], dtype=np.int64)
    n = np.array([r["n"] for r in rows], dtype=np.int64)
    n1 = np.array([r["n1"] for r in rows], dtype=np.int64)
    o = np.argsort(v)
    v, n, n1 = v[o], n[o], n1[o]
    nl = np.cumsum(n)
    nl1 = np.cumsum(n1)
    nt, nt1 = int(nl[-1]), int(nl1[-1])
    m = nl < nt  # right side must be non-empty
    v, nl, nl1 = v[m], nl[m].astype(np.float64), nl1[m].astype(np.float64)
    nr = nt - nl
    nr1 = nt1 - nl1
    gl = 1.0 - (nl1 / nl) * (nl1 / nl) \
        - ((nl - nl1) / nl) * ((nl - nl1) / nl)
    gr = 1.0 - (nr1 / nr) * (nr1 / nr) \
        - ((nr - nr1) / nr) * ((nr - nr1) / nr)
    gp = 1.0 - (nt1 / nt) * (nt1 / nt) \
        - ((nt - nt1) / nt) * ((nt - nt1) / nt)
    gain = gp - ((nl / nt) * gl + (nr / nt) * gr)
    best = np.lexsort((v, -gain))[0]
    return pa.table({
        "split_cents": pa.array([int(v[best])], type=pa.int64()),
        "n_left": pa.array([int(nl[best])], type=pa.int64()),
        "n_left_pos": pa.array([int(nl1[best])], type=pa.int64()),
        "n_right": pa.array([int(nr[best])], type=pa.int64()),
        "n_right_pos": pa.array([int(nr1[best])], type=pa.int64()),
        "gain": pa.array(_round_away(np.array([gain[best]]), 6))})


SQL_EVENTS_GINI_SPLIT = """
WITH e AS (SELECT CAST(round(value * 100) AS BIGINT) AS v,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
           FROM events),
c AS (SELECT v, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS n1
      FROM e GROUP BY v),
s AS (SELECT v,
             CAST(sum(n) OVER (ORDER BY v) AS BIGINT) AS nl,
             CAST(sum(n1) OVER (ORDER BY v) AS BIGINT) AS nl1,
             CAST(sum(n) OVER () AS BIGINT) AS nt,
             CAST(sum(n1) OVER () AS BIGINT) AS nt1
      FROM c),
g AS (SELECT v, nl, nl1, nt - nl AS nr, nt1 - nl1 AS nr1,
             (1.0 - (CAST(nt1 AS DOUBLE) / nt) * (CAST(nt1 AS DOUBLE) / nt)
                  - (CAST(nt - nt1 AS DOUBLE) / nt)
                    * (CAST(nt - nt1 AS DOUBLE) / nt))
             - ((CAST(nl AS DOUBLE) / nt)
                * (1.0 - (CAST(nl1 AS DOUBLE) / nl)
                         * (CAST(nl1 AS DOUBLE) / nl)
                       - (CAST(nl - nl1 AS DOUBLE) / nl)
                         * (CAST(nl - nl1 AS DOUBLE) / nl))
                + (CAST(nt - nl AS DOUBLE) / nt)
                  * (1.0 - (CAST(nt1 - nl1 AS DOUBLE) / (nt - nl))
                           * (CAST(nt1 - nl1 AS DOUBLE) / (nt - nl))
                         - (CAST((nt - nl) - (nt1 - nl1) AS DOUBLE)
                            / (nt - nl))
                           * (CAST((nt - nl) - (nt1 - nl1) AS DOUBLE)
                              / (nt - nl)))) AS gain
      FROM s WHERE nl < nt)
SELECT v AS split_cents, nl AS n_left, nl1 AS n_left_pos,
       nr AS n_right, nr1 AS n_right_pos, round(g.gain, 6) AS gain
FROM g ORDER BY g.gain DESC, v ASC LIMIT 1
"""


def q_events_ips_eval(sf_dir: str):
    """OFF-POLICY EVALUATION (IPS/SNIPS) — estimate a target policy's
    per-action value from logged events without re-serving: reward =
    value cents, logging propensity p = k/16 with k = 2^(md5 mod 5)
    (so the inverse weight 16/k is an EXACT small integer and the IPS
    numerator is an exact int64 sum — no float accumulation order to
    pin), target-policy match = a second independent md5 predicate.
    Both hashes run once per DISTINCT (user, action) pair per batch and
    are byte-identical to the SQL md5 expressions; the only floats are
    two closing divisions per action row."""
    from pymhealth_ray.stages.sketch import _md5_u64

    ev = _events(sf_dir, ["user_id", "event_type", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "cents")
        key = pc.binary_join_element_wise(
            pc.cast(b["user_id"], pa.string()), b["event_type"], "|")
        h_w = _md5_u64(pc.binary_join_element_wise(key, "ips", "|"))
        h_m = _md5_u64(pc.binary_join_element_wise(key, "pol", "|"))
        inv_w = (np.uint64(1) << (h_w % np.uint64(5))).astype(np.int64)
        matched = (h_m % np.uint64(4)) == 0
        cents = b["cents"].to_numpy(zero_copy_only=False)
        et = b["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(enc.dictionary)
        mw = np.where(matched, inv_w, 0)
        return pa.table({
            "event_type": enc.dictionary,
            "n": pa.array(np.bincount(codes, minlength=k)
                          .astype(np.int64)),
            "n_matched": pa.array(
                np.bincount(codes, weights=matched.astype(np.float64),
                            minlength=k).astype(np.int64)),
            "w_sum": pa.array(
                np.bincount(codes, weights=mw.astype(np.float64),
                            minlength=k).astype(np.int64)),
            "ips_sum_cents": pa.array(
                np.bincount(codes, weights=(mw * cents).astype(np.float64),
                            minlength=k).astype(np.int64))})

    rows = ev.map_batches(partial, batch_format="pyarrow",
                          batch_size=None).take_all()
    agg: dict = {}
    for r in rows:
        a = agg.get(r["event_type"], (0, 0, 0, 0))
        agg[r["event_type"]] = (a[0] + int(r["n"]),
                                a[1] + int(r["n_matched"]),
                                a[2] + int(r["w_sum"]),
                                a[3] + int(r["ips_sum_cents"]))
    ets = sorted(agg)
    n = np.array([agg[t][0] for t in ets], dtype=np.int64)
    nm = np.array([agg[t][1] for t in ets], dtype=np.int64)
    ws = np.array([agg[t][2] for t in ets], dtype=np.int64)
    ic = np.array([agg[t][3] for t in ets], dtype=np.int64)
    ips = ic.astype(np.float64) / (100.0 * n.astype(np.float64))
    snips = np.where(ws > 0,
                     ic.astype(np.float64)
                     / (100.0 * ws.astype(np.float64)), np.nan)
    return pa.table({
        "event_type": pa.array(ets, type=pa.string()),
        "n": pa.array(n), "n_matched": pa.array(nm),
        "w_sum": pa.array(ws), "ips_sum_cents": pa.array(ic),
        "ips_value": pa.array(_round_away(ips, 6)),
        "snips_value": pa.array(_round_away(snips, 6),
                                mask=~(ws > 0))})


SQL_EVENTS_IPS_EVAL = """
WITH e AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(user_id AS VARCHAR) || '|' || event_type AS k
  FROM events),
w AS (
  SELECT event_type, cents,
         CASE CAST(('0x' || substr(md5(k || '|' || 'ips'), 1, 16))::UBIGINT
                   % 5 AS INTEGER)
              WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 WHEN 3 THEN 8
              ELSE 16 END AS inv_w,
         CASE WHEN ('0x' || substr(md5(k || '|' || 'pol'), 1, 16))::UBIGINT
                   % 4 = 0 THEN 1 ELSE 0 END AS matched
  FROM e),
a AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(matched) AS BIGINT) AS n_matched,
         CAST(sum(matched * inv_w) AS BIGINT) AS w_sum,
         CAST(sum(matched * inv_w * cents) AS BIGINT) AS ips_sum_cents
  FROM w GROUP BY event_type)
SELECT event_type, n, n_matched, w_sum, ips_sum_cents,
       round(CAST(ips_sum_cents AS DOUBLE) / (100.0 * CAST(n AS DOUBLE)),
             6) AS ips_value,
       CASE WHEN w_sum > 0
            THEN round(CAST(ips_sum_cents AS DOUBLE)
                       / (100.0 * CAST(w_sum AS DOUBLE)), 6)
            END AS snips_value
FROM a
"""


# --------------------------------------------------------------------------
# round-5 fourth-session wave F: LPA communities / Markov attribution
# --------------------------------------------------------------------------


LPA_ROUNDS = 4


def q_part_lpa_communities(sf_dir: str):
    """COMMUNITY DETECTION on the item co-purchase graph: synchronous
    min-tie label propagation (stages/graph.label_propagation), 4 fixed
    rounds — deterministic where classic async LPA is run-order
    dependent. Edges dedupe through the packed-key exchange
    (cooccurrence_edges); per round the bounded label table broadcasts
    and one exchange does the per-node (max count, min label) vote.
    Oracle: independent single-process replay (Counter-based)."""
    from pymhealth_ray.stages.graph import label_propagation
    from pymhealth_ray.stages.triangles import cooccurrence_edges

    li = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_orderkey", "l_partkey"])
    st = grouped_stats(li.map_batches(
        lambda b: pa.table({"one": pa.array(
            np.zeros(b.num_rows, dtype=np.int8)),
            "l_partkey": b["l_partkey"]}),
        batch_format="pyarrow"), ["one"],
        max_cols=["l_partkey"]).take_all()
    mx = int(st[0]["l_partkey_max"])
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey", max_item=mx,
                               num_buckets=NB)
    out = label_propagation(edges, max_node=mx, rounds=LPA_ROUNDS,
                            num_buckets=NB)
    return out.map_batches(
        lambda b: pa.table({"p_partkey": b["node"], "community": b["label"]}),
        batch_format="pyarrow")


def _lpa_expected(df):
    """Single-process LPA replay: distinct co-purchase pairs, then
    ``LPA_ROUNDS`` synchronous rounds of (max neighbor-label count,
    min label) votes — written against dict/Counter, independent of
    the distributed kernel."""
    from collections import Counter, defaultdict

    import pandas as pd

    edges = set()
    for _, grp in df.groupby("l_orderkey"):
        items = sorted(set(int(v) for v in grp["l_partkey"]))
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                edges.add((items[i], items[j]))
    adj = defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    lab = {v: v for v in adj}
    for _ in range(LPA_ROUNDS):
        new = {}
        for v, nbrs in adj.items():
            c = Counter(lab[u] for u in nbrs)
            best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
            new[v] = best[0]
        lab = new
    nodes = sorted(adj)
    return pd.DataFrame({
        "p_partkey": np.array(nodes, dtype=np.int64),
        "community": np.array([lab[v] for v in nodes], dtype=np.int64)})


MARKOV_STATES = ("__start__", "__conv__", "__null__")


def _journey_transitions_py(users, types, ts, eids):
    """Single-process journey transition counter (the oracle's path):
    per user in (ts, event_id) order, journeys restart after each
    purchase; START -> first touch, touch -> touch, touch -> CONV on
    purchase, trailing touch -> NULL. Returns {(src, dst): count}."""
    from collections import defaultdict

    rows = sorted(zip(users, ts, eids, types))
    counts: dict = defaultdict(int)
    prev_user = None
    prev_state = None  # None == at journey start
    for u, _, _, t in rows:
        if u != prev_user:
            if prev_user is not None and prev_state is not None:
                counts[(prev_state, "__null__")] += 1
            prev_user, prev_state = u, None
        src = "__start__" if prev_state is None else prev_state
        if t == "purchase":
            counts[(src, "__conv__")] += 1
            prev_state = None
        else:
            counts[(src, t)] += 1
            prev_state = t
    if prev_user is not None and prev_state is not None:
        counts[(prev_state, "__null__")] += 1
    return dict(counts)


def _markov_attr_finish(counts: dict):
    """Removal-effect attribution from exact integer transition counts
    — SHARED by the engine query and the materialized oracle so the
    driver-side float path (row-normalize, absorbing-chain solve per
    removed channel) is executed identically on both sides.

    v solves v = r + Q v over transient states (START + channels);
    removing channel c redirects every transition INTO c to NULL
    (denominators unchanged — the standard removal-effect model)."""
    import pandas as pd

    chans = sorted({s for s, _ in counts} - {"__start__"})
    states = ["__start__"] + chans  # transient states, fixed order
    idx = {s: i for i, s in enumerate(states)}
    m = len(states)
    C = np.zeros((m, m), dtype=np.int64)   # transient -> transient
    R = np.zeros(m, dtype=np.int64)        # transient -> CONV
    out = np.zeros(m, dtype=np.int64)      # row totals (incl NULL)
    for (s, d), c in counts.items():
        i = idx[s]
        out[i] += c
        if d == "__conv__":
            R[i] += c
        elif d != "__null__":
            C[i, idx[d]] += c

    def conv_prob(removed: str | None) -> float:
        keep = [i for i, s in enumerate(states) if s != removed]
        Q = C[np.ix_(keep, keep)].astype(np.float64)
        r = R[keep].astype(np.float64)
        o = out[keep].astype(np.float64)
        Q = Q / o[:, None]
        r = r / o
        v = np.linalg.solve(np.eye(len(keep)) - Q, r)
        return float(v[0])  # START is index 0 in every keep-set

    base = conv_prob(None)
    re = np.array([max(0.0, 1.0 - conv_prob(c) / base) for c in chans])
    tot = float(re.sum())
    share = re / tot if tot > 0 else np.full(len(chans), np.nan)
    n_from = np.array([out[idx[c]] for c in chans], dtype=np.int64)
    return pd.DataFrame({
        "channel": chans,
        "out_transitions": n_from,
        "base_conv_prob": _round_away(np.full(len(chans), base), 6),
        "removal_effect": _round_away(re, 6),
        "attribution_share": _round_away(share, 6)})


def q_events_markov_attribution(sf_dir: str):
    """MARKOV (removal-effect) ATTRIBUTION — the data-driven upgrade of
    last-touch/linear attribution: journeys are per-user event paths
    that restart after each purchase; channels are the non-purchase
    event types. Transition counting is one user-bucket exchange with
    per-bucket vectorized boundary masks (counts leave each bucket at
    the (src, dst) grain — ≤ (T+2)² rows); the absorbing-chain solve
    runs once on the driver from exact integers via the SAME helper the
    oracle calls (_markov_attr_finish), so floats are bit-identical."""
    from pymhealth_ray.stages.partition import grouped_by_bucket

    ev = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])

    def per_bucket(tbl: pa.Table) -> pa.Table:
        from pymhealth_ray.stages.partition import entity_segments

        if tbl.num_rows == 0:
            return pa.table({"src": pa.array([], type=pa.string()),
                             "dst": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        tbl, starts, _ = entity_segments(tbl, "user_id", "ts_us",
                                         "event_id")
        et = tbl["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        tcode = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tdict = enc.dictionary.to_pylist()
        T = len(tdict)
        S, V, U = T, T + 1, T + 2  # START / CONV / NULL codes
        conv = np.array([t == "purchase" for t in tdict], dtype=bool)[tcode]
        n = len(tcode)
        seg_start = np.zeros(n, dtype=bool)
        seg_start[starts[:-1]] = True
        jstart = seg_start.copy()
        jstart[1:] |= conv[:-1]  # journeys restart after a purchase
        src = np.empty(n, dtype=np.int64)
        src[1:] = tcode[:-1]
        src[jstart] = S
        dst = np.where(conv, V, tcode)
        # trailing open journeys -> NULL
        ends = starts[1:] - 1
        open_end = ~conv[ends]
        pairs_src = np.concatenate([src, tcode[ends][open_end]])
        pairs_dst = np.concatenate([dst, np.full(int(open_end.sum()), U,
                                                 dtype=np.int64)])
        pk = pairs_src * (T + 3) + pairs_dst
        u, c = np.unique(pk, return_counts=True)
        names = tdict + ["__start__", "__conv__", "__null__"]
        return pa.table({
            "src": pa.array([names[int(v)] for v in u // (T + 3)],
                            type=pa.string()),
            "dst": pa.array([names[int(v)] for v in u % (T + 3)],
                            type=pa.string()),
            "cnt": pa.array(c.astype(np.int64))})

    rows = grouped_by_bucket(ev, per_bucket, entity_col="user_id",
                             num_buckets=NB).take_all()
    counts: dict = {}
    for r in rows:
        k = (r["src"], r["dst"])
        counts[k] = counts.get(k, 0) + int(r["cnt"])
    return pa.Table.from_pandas(_markov_attr_finish(counts),
                                preserve_index=False)


def _markov_attr_expected(df):
    counts = _journey_transitions_py(
        df["user_id"].to_numpy(), df["event_type"].to_numpy(),
        df["ts"].to_numpy(), df["event_id"].to_numpy())
    return _markov_attr_finish(counts)


def q_seq_kn_bigram(sf_dir: str):
    """Interpolated KNESER-NEY bigram NLL per sequence — the production
    n-gram smoothing (absolute discount + continuation-count backoff)
    next to seq_bigram_nll's add-one baseline. One vocab²-bounded pair
    exchange trains it; every KN statistic (N1+(a·), N1+(·b), bigram
    types B) falls out of the same dense broadcast on the driver
    (stages/lm.kn_bigram_nll); scoring is map-only with the SQL
    oracle's exact float op order."""
    from pymhealth_ray.stages.lm import kn_bigram_nll

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "tokens"])
    out = kn_bigram_nll(ds, "tokens", id_cols=("doc_id", "ts_ns"))

    def finish(b: pa.Table) -> pa.Table:
        return _round_cols(b, {"nll_mean": 6})

    return out.map_batches(finish, batch_format="pyarrow")


def sql_seq_kn_bigram(path: str) -> str:
    return f"""
WITH src AS (
  SELECT doc_id, ts_ns, tokens FROM read_parquet('{path}/part-*.parquet')
), p AS (
  SELECT doc_id, ts_ns, CAST(tokens[i] AS BIGINT) AS a,
         CAST(tokens[i + 1] AS BIGINT) AS b
  FROM src, LATERAL unnest(generate_series(1, len(tokens) - 1)) AS u(i)
), cab AS (
  SELECT a, b, count(*) AS c FROM p GROUP BY a, b
), ca AS (
  SELECT a, count(*) AS c FROM p GROUP BY a
), nr AS (
  SELECT a, count(*) AS c FROM cab GROUP BY a
), nl AS (
  SELECT b, count(*) AS c FROM cab GROUP BY b
), bt AS (
  SELECT count(*) AS bcnt FROM cab
), sc AS (
  SELECT p.doc_id, p.ts_ns, count(*) AS n_slots,
         round(-sum(ln(
             greatest(CAST(cab.c AS DOUBLE) - 0.75, 0.0) / ca.c
             + ((0.75 * nr.c) / ca.c)
               * (CAST(nl.c AS DOUBLE) / bt.bcnt)
         )) / count(*), 6) AS nll_mean
  FROM p JOIN cab USING (a, b) JOIN ca USING (a)
         JOIN nr USING (a) JOIN nl USING (b) CROSS JOIN bt
  GROUP BY p.doc_id, p.ts_ns
)
SELECT src.doc_id, src.ts_ns,
       CAST(coalesce(sc.n_slots, 0) AS BIGINT) AS n_slots, sc.nll_mean
FROM src LEFT JOIN sc USING (doc_id, ts_ns)
"""


# --------------------------------------------------------------------------
# round-5 fourth-session wave H: watermark z-score / WOE-IV scorecard
# --------------------------------------------------------------------------


def q_seq_watermark_score(sf_dir: str):
    """LLM WATERMARK DETECTION (Kirchenbauer et al. 2023 shape): a
    greenlist watermark puts each next-token draw in a prev-token-keyed
    pseudo-random green set of fraction γ; detection counts green slots
    and reports the one-proportion z-score per sequence. Greenlist
    membership here is the md5 predicate md5(prev|tok|wm) % 4 == 0
    (γ = 1/4) — deterministic, map-only, and byte-identical to the SQL
    expression. Hashing runs once per DISTINCT adjacent pair per batch
    (np.unique on packed int64 keys); z mirrors SQL op order."""
    from pymhealth_ray.stages.sketch import _md5_u64

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "tokens"])

    def score(batch: pa.Table) -> pa.Table:
        col = batch["tokens"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        lens = pc.list_value_length(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        offs = np.concatenate(([0], np.cumsum(lens)))
        pos = np.arange(len(flat), dtype=np.int64)
        local = pos - np.repeat(offs[:-1], lens)
        ok = local < np.repeat(lens - 1, lens)
        a = flat[ok]
        b = flat[np.flatnonzero(ok) + 1]
        V = 1 << 21
        pk = a * V + b
        upk, inv = np.unique(pk, return_inverse=True)
        us = pa.array([f"{int(k // V)}|{int(k % V)}|wm" for k in upk],
                      type=pa.string())
        green_u = (_md5_u64(us) % np.uint64(4)) == 0
        green = green_u[inv].astype(np.int64)
        nslots = np.maximum(lens - 1, 0)
        soffs = np.concatenate(([0], np.cumsum(nslots)))[:-1]
        ng = np.zeros(len(lens), dtype=np.int64)
        nz = nslots > 0
        if nz.any() and len(green):
            ng[nz] = np.add.reduceat(green, soffs[nz])
        nf = nslots.astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            z = (ng.astype(np.float64) - 0.25 * nf) \
                / np.sqrt(nf * 0.25 * 0.75)
        return pa.table({
            "doc_id": batch["doc_id"], "ts_ns": batch["ts_ns"],
            "n_slots": pa.array(nslots),
            "n_green": pa.array(ng),
            "z_score": pa.array(_round_away(np.where(nz, z, 0.0), 6),
                                mask=~nz)})

    return ds.map_batches(score, batch_format="pyarrow")


def sql_seq_watermark_score(path: str) -> str:
    return f"""
WITH src AS (
  SELECT doc_id, ts_ns, tokens FROM read_parquet('{path}/part-*.parquet')
), p AS (
  SELECT doc_id, ts_ns,
         CASE WHEN ('0x' || substr(md5(
                  CAST(CAST(tokens[i] AS BIGINT) AS VARCHAR) || '|' ||
                  CAST(CAST(tokens[i + 1] AS BIGINT) AS VARCHAR) || '|wm'),
              1, 16))::UBIGINT % 4 = 0 THEN 1 ELSE 0 END AS g
  FROM src, LATERAL unnest(generate_series(1, len(tokens) - 1)) AS u(i)
), sc AS (
  SELECT doc_id, ts_ns, CAST(count(*) AS BIGINT) AS n_slots,
         CAST(sum(g) AS BIGINT) AS n_green
  FROM p GROUP BY doc_id, ts_ns
)
SELECT src.doc_id, src.ts_ns,
       CAST(coalesce(sc.n_slots, 0) AS BIGINT) AS n_slots,
       CAST(coalesce(sc.n_green, 0) AS BIGINT) AS n_green,
       round((CAST(sc.n_green AS DOUBLE) - 0.25 * sc.n_slots)
             / sqrt(sc.n_slots * 0.25 * 0.75), 6) AS z_score
FROM src LEFT JOIN sc USING (doc_id, ts_ns)
"""


def q_orders_woe_iv(sf_dir: str):
    """WOE / IV SCORECARD — the classic credit-risk feature encoding:
    per $100 price band, weight of evidence ln of the good/bad rate
    ratio (0.5-smoothed numerators so empty cells stay finite) and the
    band's information-value term. One keyed_sum shrinks the corpus to
    the BAND domain (bounded by the price range, not row count); the
    float finish is one expression per band in SQL op order."""
    from pymhealth_ray.stages.aggregate import keyed_sum

    od = read_table(f"{sf_dir}/orders.parquet",
                    columns=["o_totalprice", "o_orderstatus"])

    def partial(b: pa.Table) -> pa.Table:
        b = _cents(b, "o_totalprice", "cents")
        band = b["cents"].to_numpy(zero_copy_only=False) // 10000
        st = b["o_orderstatus"]
        if isinstance(st, pa.ChunkedArray):
            st = st.combine_chunks()
        bad = pc.equal(st, "F").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        u, inv = np.unique(band, return_inverse=True)
        nb = np.bincount(inv, weights=bad.astype(np.float64),
                         minlength=u.size).astype(np.int64)
        n = np.bincount(inv, minlength=u.size).astype(np.int64)
        return pa.table({"band": pa.array(u.astype(np.int64)),
                         "n_good": pa.array(n - nb),
                         "n_bad": pa.array(nb)})

    rows = keyed_sum(od.map_batches(partial, batch_format="pyarrow",
                                    batch_size=None),
                     "band", ["n_good", "n_bad"], num_buckets=NB,
                     precombine_rows=None).take_all()
    band = np.array([r["band"] for r in rows], dtype=np.int64)
    g = np.array([r["n_good"] for r in rows], dtype=np.int64)
    bd = np.array([r["n_bad"] for r in rows], dtype=np.int64)
    o = np.argsort(band)
    band, g, bd = band[o], g[o], bd[o]
    G, B = float(g.sum()), float(bd.sum())
    pg = (g.astype(np.float64) + 0.5) / G
    pb = (bd.astype(np.float64) + 0.5) / B
    woe = np.log(pg / pb)
    iv = (pg - pb) * woe
    return pa.table({"band": pa.array(band),
                     "n_good": pa.array(g), "n_bad": pa.array(bd),
                     "woe": pa.array(_round_away(woe, 6)),
                     "iv_term": pa.array(_round_away(iv, 6))})


SQL_ORDERS_WOE_IV = """
WITH o AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 10000
               AS band,
           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
      FROM orders),
c AS (SELECT band, CAST(sum(1 - bad) AS BIGINT) AS n_good,
             CAST(sum(bad) AS BIGINT) AS n_bad
      FROM o GROUP BY band),
t AS (SELECT CAST(sum(n_good) AS BIGINT) AS g_tot,
             CAST(sum(n_bad) AS BIGINT) AS b_tot FROM c)
SELECT band, n_good, n_bad,
       round(ln(((CAST(n_good AS DOUBLE) + 0.5) / g_tot)
                / ((CAST(n_bad AS DOUBLE) + 0.5) / b_tot)), 6) AS woe,
       round(((CAST(n_good AS DOUBLE) + 0.5) / g_tot
              - (CAST(n_bad AS DOUBLE) + 0.5) / b_tot)
             * ln(((CAST(n_good AS DOUBLE) + 0.5) / g_tot)
                  / ((CAST(n_bad AS DOUBLE) + 0.5) / b_tot)), 6) AS iv_term
FROM c, t
"""


# --------------------------------------------------------------------------
# round-5 fourth-session wave I: NCD pairs / forward as-of (time-to-event)
# --------------------------------------------------------------------------


NCD_PREFIX = 24
NCD_BLOCK_CAP = 64


def _ncd_block_pairs(doc_ids, texts):
    """Pairs + compression lengths for ONE prefix block (doc_id-sorted,
    capped): shared verbatim by the engine kernel and the oracle so the
    zlib byte counts and the float expression are identical."""
    import zlib

    order = np.argsort(np.asarray(doc_ids, dtype=np.int64),
                       kind="stable")[:NCD_BLOCK_CAP]
    ids = [int(doc_ids[i]) for i in order]
    txt = [texts[i] for i in order]
    comp = [len(zlib.compress(t.encode(), 6)) for t in txt]
    rows = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            cab = len(zlib.compress((txt[i] + txt[j]).encode(), 6))
            lo, hi = min(comp[i], comp[j]), max(comp[i], comp[j])
            rows.append((ids[i], ids[j], comp[i], comp[j], cab,
                         float(cab - lo) / hi))
    return rows


def q_docs_ncd_pairs(sf_dir: str):
    """NORMALIZED COMPRESSION DISTANCE (Cilibrasi & Vitányi 2005) over
    prefix-blocked candidate pairs — the parameter-free 11th near-dup
    modality: ncd(x,y) = (C(xy) − min(Cx,Cy)) / max(Cx,Cy) with zlib-6
    byte counts (deterministic, byte-exact on both sides). Blocking =
    first 24 chars (the sorted-neighborhood family's key), one
    exchange; blocks are doc_id-sorted and capped at 64 docs (cap
    applied identically in the oracle), pair kernel shared with the
    oracle via _ncd_block_pairs."""
    from pymhealth_ray.stages.partition import grouped_by_bucket

    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])

    def with_key(b: pa.Table) -> pa.Table:
        return b.append_column("k", pc.utf8_slice_codeunits(
            b["text"], 0, NCD_PREFIX))

    ds = docs.map_batches(with_key, batch_format="pyarrow")

    def per_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({
            "doc_a": pa.array([], type=pa.int64()),
            "doc_b": pa.array([], type=pa.int64()),
            "c_a": pa.array([], type=pa.int64()),
            "c_b": pa.array([], type=pa.int64()),
            "c_ab": pa.array([], type=pa.int64()),
            "ncd": pa.array([], type=pa.float64())})
        if tbl.num_rows == 0:
            return empty
        order = pc.sort_indices(tbl, sort_keys=[("k", "ascending")])
        tbl = tbl.take(order)
        k = tbl["k"].combine_chunks()
        codes = k.dictionary_encode().indices.to_numpy(
            zero_copy_only=False)
        change = np.flatnonzero(codes[1:] != codes[:-1]) + 1
        starts = np.concatenate([[0], change, [len(codes)]])
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        txts = tbl["text"].to_pylist()
        rows = []
        for s, e in zip(starts[:-1], starts[1:]):
            if e - s > 1:
                rows.extend(_ncd_block_pairs(ids[s:e], txts[s:e]))
        if not rows:
            return empty
        arr = list(zip(*rows))
        return pa.table({
            "doc_a": pa.array(np.array(arr[0], dtype=np.int64)),
            "doc_b": pa.array(np.array(arr[1], dtype=np.int64)),
            "c_a": pa.array(np.array(arr[2], dtype=np.int64)),
            "c_b": pa.array(np.array(arr[3], dtype=np.int64)),
            "c_ab": pa.array(np.array(arr[4], dtype=np.int64)),
            "ncd": pa.array(_round_away(np.array(arr[5]), 6))})

    return grouped_by_bucket(ds, per_bucket, entity_col="k",
                             num_buckets=NB)


def _ncd_expected(df):
    import pandas as pd

    rows = []
    df = df.assign(_k=df["text"].str[:NCD_PREFIX])
    for _, grp in df.groupby("_k"):
        if len(grp) > 1:
            rows.extend(_ncd_block_pairs(grp["doc_id"].to_numpy(),
                                         grp["text"].tolist()))
    rows.sort()
    return pd.DataFrame({
        "doc_a": np.array([r[0] for r in rows], dtype=np.int64),
        "doc_b": np.array([r[1] for r in rows], dtype=np.int64),
        "c_a": np.array([r[2] for r in rows], dtype=np.int64),
        "c_b": np.array([r[3] for r in rows], dtype=np.int64),
        "c_ab": np.array([r[4] for r in rows], dtype=np.int64),
        "ncd": _round_away(np.array([r[5] for r in rows]), 6)})


def q_events_next_purchase(sf_dir: str):
    """FORWARD AS-OF (time-to-conversion): for every non-purchase
    event, the timestamp of the user's NEXT purchase strictly after it
    — the label generator for churn/conversion models. Implemented by
    running the backward as-of machinery on NEGATED microsecond
    timestamps (facts at −ts−1 make 'strictly after' an inclusive
    backward match), so the whole broadcast/exchange/salting plan
    surface is reused unchanged; SQL oracle is the time-based (not
    row-based) min-over-subsequent-purchases, which equal-timestamp
    collisions cannot bias."""
    from pymhealth_ray.stages.asof import asof_join

    ds = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"])

    def only_facts(b: pa.Table) -> pa.Table:
        b = b.filter(pc.not_equal(b["event_type"], "purchase"))
        ts = b["ts_us"].to_numpy(zero_copy_only=False)
        return pa.table({"event_id": b["event_id"],
                         "user_id": b["user_id"],
                         "ts_us": b["ts_us"],
                         "nts": pa.array(-ts - 1)})

    def only_dim(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["event_type"], "purchase"))
        ts = b["ts_us"].to_numpy(zero_copy_only=False)
        return pa.table({"user_id": b["user_id"],
                         "nts": pa.array(-ts),
                         "p_ts": b["ts_us"]})

    facts = ds.map_batches(only_facts, batch_format="pyarrow")
    dim = ds.map_batches(only_dim, batch_format="pyarrow").materialize()
    j = asof_join(facts, dim, ["p_ts"], entity_col="user_id",
                  ts_col="nts", num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        ts = b["ts_us"].to_numpy(zero_copy_only=False)
        nxt = b["p_ts_asof"]
        if isinstance(nxt, pa.ChunkedArray):
            nxt = nxt.combine_chunks()
        nv = nxt.to_numpy(zero_copy_only=False)
        null = pc.is_null(nxt).to_numpy(zero_copy_only=False)
        gap = np.where(null, 0, nv - ts).astype(np.int64)
        return pa.table({
            "event_id": b["event_id"], "user_id": b["user_id"],
            "ts_us": b["ts_us"],
            "next_purchase_ts": nxt.cast(pa.int64()),
            "gap_us": pa.array(gap, type=pa.int64(), mask=null)})

    return j.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_NEXT_PURCHASE = """
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
           FROM events),
f AS (SELECT event_id, user_id, ts_us FROM e
      WHERE event_type <> 'purchase'),
d AS (SELECT user_id, ts_us AS p_ts FROM e WHERE event_type = 'purchase')
SELECT f.event_id, f.user_id, f.ts_us,
       (SELECT min(d.p_ts) FROM d
        WHERE d.user_id = f.user_id AND d.p_ts > f.ts_us)
           AS next_purchase_ts,
       (SELECT min(d.p_ts) FROM d
        WHERE d.user_id = f.user_id AND d.p_ts > f.ts_us) - f.ts_us
           AS gap_us
FROM f
"""


# --------------------------------------------------------------------------
# round-5 fourth-session wave J: ORC roundtrip / DP counts / Croston
# --------------------------------------------------------------------------


def q_docs_orc_roundtrip(sf_dir: str):
    """ORC format coverage (the third lake format next to parquet and
    Arrow IPC): documents round-trip through the bucketed .orc sink
    (sources/io.write_orc) and the file-parallel ORC reader (read_orc,
    column-pruned decode); per-doc length + content digest against the
    parquet original proves losslessness both ways. Shares the IPC
    roundtrip's SQL oracle shape."""
    import glob as _glob
    import os

    from pymhealth_ray.sources.io import read_orc, write_orc

    name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/pymhealth_ray_fixtures/orc_{name}_v1"
    marker = os.path.join(out_dir, "_SUCCESS")
    with _build_lock(out_dir):
        if not os.path.exists(marker):
            src = read_table(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "lang", "text"])
            write_orc(src, out_dir, num_files=8)
    files = sorted(_glob.glob(os.path.join(out_dir, "part-*.orc")))
    ds = read_orc(files, columns=["doc_id", "lang", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "doc_id": pa.array([], type=pa.int64()),
                "lang": pa.array([], type=pa.string()),
                "n_chars": pa.array([], type=pa.int64()),
                "text_md5": pa.array([], type=pa.string())})
        txt = batch["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        md5s = [hashlib.md5(t.encode()).hexdigest()
                for t in txt.to_pylist()]
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "lang": batch["lang"],
            "n_chars": pc.utf8_length(txt).cast(pa.int64()),
            "text_md5": pa.array(md5s, type=pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_DOCS_ORC_ROUNDTRIP = """
SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars,
       md5(text) AS text_md5
FROM documents
"""


def q_seq_dp_token_counts(sf_dir: str):
    """DIFFERENTIALLY-PRIVATE-STYLE noisy count release: per-token
    corpus counts plus two-sided geometric (discrete Laplace, α = 0.5)
    noise drawn by INVERSE CDF from a token-keyed md5 uniform — the
    release pipeline is the real thing, the seeded generator stands in
    for a calibrated DP sampler so the artifact is testable (the
    multimodal-stub discipline). One vocab-bounded keyed_sum; the
    magnitude is floor(ln(1−u)/ln(0.5)) with u an exact 52-bit dyadic,
    mirrored term-for-term in SQL (ln parity long proven)."""
    from pymhealth_ray.stages.aggregate import keyed_sum
    from pymhealth_ray.stages.sketch import _md5_u64

    ds, _ = _seq_ds(sf_dir, ["tokens"])

    def partial(b: pa.Table) -> pa.Table:
        col = b["tokens"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        u, c = np.unique(flat, return_counts=True)
        return pa.table({"token": pa.array(u.astype(np.int64)),
                         "cnt": pa.array(c.astype(np.int64))})

    rows = keyed_sum(ds.map_batches(partial, batch_format="pyarrow",
                                    batch_size=None),
                     "token", ["cnt"], num_buckets=NB,
                     precombine_rows=None).take_all()
    tok = np.array([r["token"] for r in rows], dtype=np.int64)
    cnt = np.array([r["cnt"] for r in rows], dtype=np.int64)
    o = np.argsort(tok)
    tok, cnt = tok[o], cnt[o]
    keys = pa.array([f"{int(t)}|dp" for t in tok], type=pa.string())
    h = _md5_u64(keys)
    u = (h >> np.uint64(12)).astype(np.float64) / 4503599627370496.0
    mag = np.floor(np.log(1.0 - u) / np.log(0.5)).astype(np.int64)
    sgn = np.where((h % np.uint64(2)) == 0, 1, -1).astype(np.int64)
    noise = sgn * mag
    return pa.table({"token": pa.array(tok),
                     "true_count": pa.array(cnt),
                     "dp_noise": pa.array(noise),
                     "dp_count": pa.array(cnt + noise)})


def sql_seq_dp_token_counts(path: str) -> str:
    return f"""
WITH t AS (
  SELECT unnest(tokens) AS tok FROM read_parquet('{path}/part-*.parquet')
), c AS (
  SELECT CAST(tok AS BIGINT) AS token, CAST(count(*) AS BIGINT) AS cnt
  FROM t GROUP BY 1
), h AS (
  SELECT token, cnt,
         ('0x' || substr(md5(CAST(token AS VARCHAR) || '|dp'),
                         1, 16))::UBIGINT AS hv
  FROM c
), g AS (
  SELECT token, cnt,
         CAST(floor(ln(1.0 - CAST(hv // 4096 AS DOUBLE)
                       / 4503599627370496.0) / ln(0.5)) AS BIGINT) AS mag,
         CASE WHEN hv % 2 = 0 THEN 1 ELSE -1 END AS sgn
  FROM h
)
SELECT token, cnt AS true_count,
       CAST(sgn * mag AS BIGINT) AS dp_noise,
       CAST(cnt + sgn * mag AS BIGINT) AS dp_count
FROM g
"""


CROSTON_ALPHA = 0.1


def _croston_state(days, qtys):
    """Croston recurrence for ONE part (demand days ascending): init
    z = q1, p = 1.0; for each later demand, z += α(q−z) and
    p += α(i−p) with i the day gap. Shared verbatim by the engine's
    per-step vectorized kernel's semantics and the oracle replay."""
    z, p = float(qtys[0]), 1.0
    for k in range(1, len(days)):
        i = float(days[k] - days[k - 1])
        z = z + CROSTON_ALPHA * (float(qtys[k]) - z)
        p = p + CROSTON_ALPHA * (i - p)
    return z, p


def q_part_croston(sf_dir: str):
    """CROSTON INTERMITTENT-DEMAND FORECAST per part — the standard
    method when most periods have zero demand (spare parts, long-tail
    SKUs): SES (α = 0.1) on nonzero demand SIZES and on demand-day
    INTERVALS, forecast = z/p per day. Per-(part, day) quantity sums
    shrink in one keyed_sum (calendar × part bounded); the recurrence
    is vectorized ACROSS parts step-by-step (the events_holt shape), so
    floats replay the oracle's per-part sequential order exactly."""
    from pymhealth_ray.stages.aggregate import keyed_sum

    li = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_partkey", "l_shipdate", "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        d = _epoch_days(b["l_shipdate"])
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        q = np.rint(b["l_quantity"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        key = pk * 1_000_000 + (d % 1_000_000)
        u, inv = np.unique(key, return_inverse=True)
        qs = np.bincount(inv, weights=q.astype(np.float64),
                         minlength=u.size).astype(np.int64)
        return pa.table({"key": pa.array(u.astype(np.int64)),
                         "q_cents": pa.array(qs)})

    daily = keyed_sum(li.map_batches(partial, batch_format="pyarrow",
                                     batch_size=None),
                      "key", ["q_cents"], num_buckets=NB,
                      precombine_rows=None)

    from pymhealth_ray.stages.partition import grouped_by_bucket

    def per_bucket(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({
                "p_partkey": pa.array([], type=pa.int64()),
                "n_demand_days": pa.array([], type=pa.int64()),
                "z_size": pa.array([], type=pa.float64()),
                "p_interval": pa.array([], type=pa.float64()),
                "forecast_per_day": pa.array([], type=pa.float64())})
        key = tbl["key"].to_numpy(zero_copy_only=False)
        qc = tbl["q_cents"].to_numpy(zero_copy_only=False)
        part = key // 1_000_000
        day = key % 1_000_000
        order = np.lexsort((day, part))
        part, day, qc = part[order], day[order], qc[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(part[1:] != part[:-1]) + 1, [len(part)]])
        n_parts = len(starts) - 1
        pos = np.arange(len(part)) - np.repeat(starts[:-1],
                                               np.diff(starts))
        qv = qc.astype(np.float64) / 100.0
        z = np.empty(n_parts)
        p = np.ones(n_parts)
        seg = np.repeat(np.arange(n_parts), np.diff(starts))
        z[seg[pos == 0]] = qv[pos == 0]
        max_k = int(pos.max()) + 1 if len(pos) else 0
        for k in range(1, max_k):
            m = pos == k
            sidx = seg[m]
            gap = (day[m] - day[np.flatnonzero(m) - 1]).astype(np.float64)
            z[sidx] = z[sidx] + CROSTON_ALPHA * (qv[m] - z[sidx])
            p[sidx] = p[sidx] + CROSTON_ALPHA * (gap - p[sidx])
        nd = np.diff(starts).astype(np.int64)
        return pa.table({
            "p_partkey": pa.array(part[starts[:-1]].astype(np.int64)),
            "n_demand_days": pa.array(nd),
            "z_size": pa.array(_round_away(z, 6)),
            "p_interval": pa.array(_round_away(p, 6)),
            "forecast_per_day": pa.array(_round_away(z / p, 6))})

    def add_part(b: pa.Table) -> pa.Table:
        return b.append_column(
            "part", pa.array(b["key"].to_numpy(zero_copy_only=False)
                             // 1_000_000))

    return grouped_by_bucket(daily.map_batches(add_part,
                                               batch_format="pyarrow"),
                             per_bucket, entity_col="part",
                             num_buckets=NB)


def _croston_expected(df):
    import pandas as pd

    df = df.copy()
    sd = pd.to_datetime(df["l_shipdate"]).astype("datetime64[ns]")
    df["day"] = (sd.astype("int64") // 86_400_000_000_000).astype("int64")
    df["qc"] = np.rint(df["l_quantity"].to_numpy() * 100).astype("int64")
    rows = []
    for pk, grp in df.groupby("l_partkey"):
        daily = grp.groupby("day")["qc"].sum().sort_index()
        days = daily.index.to_numpy()
        qv = daily.to_numpy().astype(np.float64) / 100.0
        z, p = _croston_state(days, qv)
        rows.append((int(pk), len(days), z, p))
    rows.sort()
    return pd.DataFrame({
        "p_partkey": np.array([r[0] for r in rows], dtype=np.int64),
        "n_demand_days": np.array([r[1] for r in rows], dtype=np.int64),
        "z_size": _round_away(np.array([r[2] for r in rows]), 6),
        "p_interval": _round_away(np.array([r[3] for r in rows]), 6),
        "forecast_per_day": _round_away(
            np.array([r[2] / r[3] for r in rows]), 6)})


# --------------------------------------------------------------------------
# round-5 fourth-session wave K: reconciliation / ratio delta / power
# --------------------------------------------------------------------------


def q_orders_total_reconcile(sf_dir: str):
    """DOUBLE-ENTRY RECONCILIATION — the finance data-quality join: per
    order, compare the header total against Σ line price·(1−disc)·
    (1+tax), all in EXACT integer micro-units (cents × basis-point
    factors) so no float rounding can manufacture or hide a mismatch:
    item_micro = price_cents·(100−d100)·(100+t100). One hash equi-join
    + keyed_sum at the order grain."""
    from pymhealth_ray.stages.aggregate import keyed_sum
    from pymhealth_ray.stages.join import equi_join

    li = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_orderkey", "l_extendedprice",
                             "l_discount", "l_tax"])

    def li_partial(b: pa.Table) -> pa.Table:
        pc_ = np.rint(b["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        d = np.rint(b["l_discount"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        t = np.rint(b["l_tax"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        micro = pc_ * (100 - d) * (100 + t)
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(ok, return_inverse=True)
        return pa.table({
            "o_orderkey": pa.array(u.astype(np.int64)),
            "n_items": pa.array(np.bincount(inv, minlength=u.size)
                                .astype(np.int64)),
            "items_micro": pa.array(np.bincount(
                inv, weights=micro.astype(np.float64),
                minlength=u.size).astype(np.int64))})

    sums = keyed_sum(li.map_batches(li_partial, batch_format="pyarrow",
                                    batch_size=None),
                     "o_orderkey", ["n_items", "items_micro"],
                     num_buckets=NB, precombine_rows=None)

    od = read_table(f"{sf_dir}/orders.parquet",
                    columns=["o_orderkey", "o_totalprice"])

    def od_prep(b: pa.Table) -> pa.Table:
        return _cents(b, "o_totalprice", "total_cents") \
            .select(["o_orderkey", "total_cents"])

    j = equi_join(od.map_batches(od_prep, batch_format="pyarrow"),
                  sums, on="o_orderkey", join_type="left outer",
                  num_buckets=NB)

    def finish(b: pa.Table) -> pa.Table:
        ni = b["n_items"]
        if isinstance(ni, pa.ChunkedArray):
            ni = ni.combine_chunks()
        null = pc.is_null(ni).to_numpy(zero_copy_only=False)
        niv = np.where(null, 0, ni.to_numpy(zero_copy_only=False))
        im = b["items_micro"]
        if isinstance(im, pa.ChunkedArray):
            im = im.combine_chunks()
        imv = np.where(null, 0,
                       im.to_numpy(zero_copy_only=False)).astype(np.int64)
        tc = b["total_cents"].to_numpy(zero_copy_only=False)
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "total_cents": b["total_cents"],
            "n_items": pa.array(niv.astype(np.int64)),
            "items_micro": pa.array(imv),
            "diff_micro": pa.array(imv - tc * 10000)})

    return j.map_batches(finish, batch_format="pyarrow")


SQL_ORDERS_TOTAL_RECONCILE = """
WITH l AS (
  SELECT l_orderkey,
         CAST(round(l_extendedprice * 100) AS BIGINT)
         * (100 - CAST(round(l_discount * 100) AS BIGINT))
         * (100 + CAST(round(l_tax * 100) AS BIGINT)) AS micro
  FROM lineitem),
s AS (SELECT l_orderkey AS o_orderkey, CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(micro) AS BIGINT) AS items_micro
      FROM l GROUP BY 1)
SELECT o.o_orderkey,
       CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
       CAST(coalesce(s.n_items, 0) AS BIGINT) AS n_items,
       CAST(coalesce(s.items_micro, 0) AS BIGINT) AS items_micro,
       CAST(coalesce(s.items_micro, 0)
            - CAST(round(o.o_totalprice * 100) AS BIGINT) * 10000
            AS BIGINT) AS diff_micro
FROM orders o LEFT JOIN s USING (o_orderkey)
"""


def q_events_ratio_delta(sf_dir: str):
    """RATIO-METRIC A/B READOUT with DELTA-METHOD (cluster-robust)
    standard errors — the correct analysis when the metric is
    revenue-per-event but randomization is per USER: user-level
    (n_u, x_u) cluster sums roll up exactly (one keyed_sum at the user
    grain, then per-arm integer moments Σx, Σn, Σx², Σn², Σxn merged as
    python ints), and the variance of R = Σx/Σn comes from the delta
    expansion (Sxx − 2R·Sxn + R²·Snn). Arms are the md5 user split;
    every float is one driver expression in SQL op order."""
    from pymhealth_ray.stages.aggregate import keyed_sum
    from pymhealth_ray.stages.sketch import _md5_u64

    ev = _events(sf_dir, ["user_id", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "cents")
        u = b["user_id"].to_numpy(zero_copy_only=False)
        c = b["cents"].to_numpy(zero_copy_only=False)
        uu, inv = np.unique(u, return_inverse=True)
        return pa.table({
            "user_id": pa.array(uu.astype(np.int64)),
            "n": pa.array(np.bincount(inv, minlength=uu.size)
                          .astype(np.int64)),
            "x": pa.array(np.bincount(inv, weights=c.astype(np.float64),
                                      minlength=uu.size).astype(np.int64))})

    users = keyed_sum(ev.map_batches(partial, batch_format="pyarrow",
                                     batch_size=None),
                      "user_id", ["n", "x"], num_buckets=NB,
                      precombine_rows=None)

    def arm_partial(b: pa.Table) -> pa.Table:
        keys = pc.binary_join_element_wise(
            pc.cast(b["user_id"], pa.string()), "arm", "|")
        arm = (_md5_u64(keys) % np.uint64(2)).astype(np.int64)
        n = b["n"].to_numpy(zero_copy_only=False)
        x = b["x"].to_numpy(zero_copy_only=False)
        # int64 exactness bound: x·x and x·n must stay below 2^63 even
        # summed across the block (the triangles/assoc guard rule)
        if x.size and int(np.abs(x).max()) > 2_000_000_000:
            raise ValueError("user cents magnitude overflows int64 "
                             "squared moments; bucket users first")
        rows = []
        for a in (0, 1):
            m = arm == a
            rows.append((a, int(m.sum()), int(n[m].sum()),
                         int(x[m].sum()), int((x[m] * x[m]).sum()),
                         int((n[m] * n[m]).sum()),
                         int((x[m] * n[m]).sum())))
        return pa.table({
            "arm": pa.array([r[0] for r in rows], type=pa.int64()),
            "u": pa.array([r[1] for r in rows], type=pa.int64()),
            "sn": pa.array([r[2] for r in rows], type=pa.int64()),
            "sx": pa.array([r[3] for r in rows], type=pa.int64()),
            "sxx": pa.array([r[4] for r in rows], type=pa.int64()),
            "snn": pa.array([r[5] for r in rows], type=pa.int64()),
            "sxn": pa.array([r[6] for r in rows], type=pa.int64())})

    rows = users.map_batches(arm_partial, batch_format="pyarrow",
                             batch_size=None).take_all()
    agg = {0: [0] * 6, 1: [0] * 6}
    for r in rows:
        a = agg[r["arm"]]
        for i, k in enumerate(("u", "sn", "sx", "sxx", "snn", "sxn")):
            a[i] += int(r[k])
    out = {"arm": [], "n_users": [], "n_events": [], "sum_cents": [],
           "ratio_cents": [], "se_cents": []}
    for a in (0, 1):
        u, sn, sx, sxx, snn, sxn = agg[a]
        r = float(sx) / float(sn)
        vxx = float(sxx) - float(sx) * sx / u
        vnn = float(snn) - float(sn) * sn / u
        vxn = float(sxn) - float(sx) * sn / u
        nbar = float(sn) / u
        se = np.sqrt((vxx - 2 * r * vxn + r * r * vnn)
                     / (u - 1) / u) / nbar
        out["arm"].append(a)
        out["n_users"].append(u)
        out["n_events"].append(sn)
        out["sum_cents"].append(sx)
        out["ratio_cents"].append(float(_round_away(np.array([r]), 6)[0]))
        out["se_cents"].append(float(_round_away(np.array([se]), 6)[0]))
    return pa.table({
        "arm": pa.array(out["arm"], type=pa.int64()),
        "n_users": pa.array(out["n_users"], type=pa.int64()),
        "n_events": pa.array(out["n_events"], type=pa.int64()),
        "sum_cents": pa.array(out["sum_cents"], type=pa.int64()),
        "ratio_cents": pa.array(out["ratio_cents"], type=pa.float64()),
        "se_cents": pa.array(out["se_cents"], type=pa.float64())})


SQL_EVENTS_RATIO_DELTA = """
WITH e AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
uu AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(cents) AS BIGINT) AS x
       FROM e GROUP BY user_id),
t AS (SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || '|arm'),
                   1, 16))::UBIGINT % 2 AS BIGINT) AS arm, n, x
      FROM uu),
a AS (SELECT arm, CAST(count(*) AS BIGINT) AS u,
             CAST(sum(n) AS BIGINT) AS sn, CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(n * n) AS BIGINT) AS snn,
             CAST(sum(x * n) AS BIGINT) AS sxn
      FROM t GROUP BY arm)
SELECT arm, u AS n_users, sn AS n_events, sx AS sum_cents,
       round(CAST(sx AS DOUBLE) / CAST(sn AS DOUBLE), 6) AS ratio_cents,
       round(sqrt(((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / u)
                   - 2 * (CAST(sx AS DOUBLE) / CAST(sn AS DOUBLE))
                     * (CAST(sxn AS DOUBLE) - CAST(sx AS DOUBLE) * sn / u)
                   + (CAST(sx AS DOUBLE) / CAST(sn AS DOUBLE))
                     * (CAST(sx AS DOUBLE) / CAST(sn AS DOUBLE))
                     * (CAST(snn AS DOUBLE) - CAST(sn AS DOUBLE) * sn / u))
                  / (u - 1) / u)
             / (CAST(sn AS DOUBLE) / u), 6) AS se_cents
FROM a
"""


def q_events_ab_power(sf_dir: str):
    """EXPERIMENT POWER / MDE READOUT — the design-side complement of
    events_ab_welch: from the two md5-split arms' exact integer
    moments, the minimum detectable effect at α = 0.05 (two-sided) and
    80% power: mde = (z_α + z_β)·sqrt(v_t/n_t + v_c/n_c) with the
    standard normal constants fixed. Ints distributed, one float
    expression on the driver in SQL op order."""
    from pymhealth_ray.stages.aggregate import grouped_stats
    from pymhealth_ray.stages.sketch import _md5_u64

    Z_A, Z_B = 1.959964, 0.841621

    ev = _events(sf_dir, ["user_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "cents")
        keys = pc.binary_join_element_wise(
            pc.cast(b["user_id"], pa.string()), "arm", "|")
        arm = (_md5_u64(keys) % np.uint64(2)).astype(np.int64)
        c = b["cents"].to_numpy(zero_copy_only=False)
        if c.size and int(np.abs(c).max()) >= 3_000_000_000:
            raise ValueError("cents magnitude overflows int64 square")
        return pa.table({"arm": pa.array(arm),
                         "c": pa.array(c),
                         "cc": pa.array(c * c)})

    st = grouped_stats(ev.map_batches(prep, batch_format="pyarrow"),
                       ["arm"], sum_cols=["c", "cc"],
                       count_name="n").take_all()
    by = {int(r["arm"]): (int(r["n"]), int(r["c_sum"]), int(r["cc_sum"]))
          for r in st}
    n0, s0, q0 = by[0]
    n1, s1, q1 = by[1]
    v0 = (float(q0) - float(s0) * s0 / n0) / (n0 - 1)
    v1 = (float(q1) - float(s1) * s1 / n1) / (n1 - 1)
    mde = (Z_A + Z_B) * np.sqrt(v1 / n1 + v0 / n0)
    return pa.table({
        "n_control": pa.array([n0], type=pa.int64()),
        "n_treat": pa.array([n1], type=pa.int64()),
        "var_control": pa.array(_round_away(np.array([v0]), 6)),
        "var_treat": pa.array(_round_away(np.array([v1]), 6)),
        "mde_cents": pa.array(_round_away(np.array([mde]), 6))})


SQL_EVENTS_AB_POWER = """
WITH e AS (SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)
                        || '|arm'), 1, 16))::UBIGINT % 2 AS BIGINT) AS arm,
                  CAST(round(value * 100) AS BIGINT) AS c
           FROM events),
a AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS q
      FROM e GROUP BY arm),
w AS (SELECT
        max(CASE WHEN arm = 0 THEN n END) AS n0,
        max(CASE WHEN arm = 0 THEN s END) AS s0,
        max(CASE WHEN arm = 0 THEN q END) AS q0,
        max(CASE WHEN arm = 1 THEN n END) AS n1,
        max(CASE WHEN arm = 1 THEN s END) AS s1,
        max(CASE WHEN arm = 1 THEN q END) AS q1
      FROM a)
SELECT n0 AS n_control, n1 AS n_treat,
       round((CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * s0 / n0)
             / (n0 - 1), 6) AS var_control,
       round((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
             / (n1 - 1), 6) AS var_treat,
       round((1.959964 + 0.841621)
             * sqrt((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
                    / (n1 - 1) / n1
                    + (CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * s0 / n0)
                      / (n0 - 1) / n0), 6) AS mde_cents
FROM w
"""


# --------------------------------------------------------------------------
# round-5 fourth-session wave L: log-mel audio / behavioral user kNN
# --------------------------------------------------------------------------


def q_docs_audio_logmel(sf_dir: str):
    """LOG-MEL SPECTROGRAM features over the real-codec WAV path — the
    DSP step a speech-data pipeline runs before any model: hann frames
    → rfft power → 8 triangular mel filters → log energies → per-doc
    mean vector (stages/multimodal.LogMelExtractor, filterbank built
    once per actor). Payload-deterministic numpy, so the oracle
    replays the same class single-process."""
    from pymhealth_ray.stages.multimodal import extract_logmel

    docs = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    media = docs.map_batches(_docs_wav_table, batch_format="pyarrow")
    out = extract_logmel(media)

    def finish(b: pa.Table) -> pa.Table:
        lv = b["logmel"]
        if isinstance(lv, pa.ChunkedArray):
            lv = lv.combine_chunks()
        mat = np.asarray(lv.values.to_numpy(zero_copy_only=False),
                         dtype=np.float64).reshape(b.num_rows, -1)
        return pa.table({
            "doc_id": b["doc_id"],
            "logmel": pa.array(
                [[float(x) for x in row]
                 for row in _round_away(mat, 6)],
                type=pa.list_(pa.float64())),
            "logmel_mean": pa.array(_round_away(mat.mean(axis=1), 6)),
            "peak_mel": pa.array(np.argmax(mat, axis=1).astype(np.int64)),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def _audio_logmel_expected(df):
    import pandas as pd

    from pymhealth_ray.stages.multimodal import LogMelExtractor

    tbl = pa.table({"doc_id": pa.array(df["doc_id"].tolist(),
                                       type=pa.int64())})
    media = _docs_wav_table(tbl)
    out = LogMelExtractor()(media)
    lv = out["logmel"]
    if isinstance(lv, pa.ChunkedArray):
        lv = lv.combine_chunks()
    mat = np.asarray(lv.values.to_numpy(zero_copy_only=False),
                     dtype=np.float64).reshape(out.num_rows, -1)
    return pd.DataFrame({
        "doc_id": df["doc_id"].to_numpy().astype(np.int64),
        "logmel": [[float(x) for x in row] for row in _round_away(mat, 6)],
        "logmel_mean": _round_away(mat.mean(axis=1), 6),
        "peak_mel": np.argmax(mat, axis=1).astype(np.int64)})


USER_KNN_K = 5


def q_events_user_neighbors(sf_dir: str):
    """BEHAVIORAL SIMILARITY kNN: each user becomes a type-count vector
    (one bounded keyed_sum), then exact cosine top-5 neighbors run
    through the SAME brute-force MIPS machinery as the embedding
    queries (ann.knn_bruteforce: dataset streams, only n_q × k
    candidates collect) — feature engineering composed with ANN, no
    new kernel. Oracle is pure SQL: the pair cosine with integer dot
    products and the (sim DESC, id ASC) top-k rule."""
    from pymhealth_ray.stages.aggregate import keyed_sum
    from pymhealth_ray.stages.ann import knn_bruteforce

    ev = _events(sf_dir, ["user_id", "event_type", "ts"])

    TYPES = ("click", "error", "purchase", "signup", "view")

    def partial(b: pa.Table) -> pa.Table:
        et = b["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        tmap = {t: i for i, t in enumerate(TYPES)}
        dmap = np.array([tmap.get(t, -1) for t in
                         enc.dictionary.to_pylist()], dtype=np.int64)
        codes = dmap[enc.indices.to_numpy(zero_copy_only=False)]
        u = b["user_id"].to_numpy(zero_copy_only=False)
        keepm = codes >= 0  # types outside the pivot set are ignored
        u, codes = u[keepm], codes[keepm]
        key = u * len(TYPES) + codes
        uk, c = np.unique(key, return_counts=True)
        return pa.table({"key": pa.array(uk.astype(np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    counts = keyed_sum(ev.map_batches(partial, batch_format="pyarrow",
                                      batch_size=None),
                       "key", ["c"], num_buckets=NB,
                       precombine_rows=None)

    def to_vec(b: pa.Table) -> pa.Table:
        key = b["key"].to_numpy(zero_copy_only=False)
        c = b["c"].to_numpy(zero_copy_only=False)
        u = key // len(TYPES)
        t = key % len(TYPES)
        uu, inv = np.unique(u, return_inverse=True)
        mat = np.zeros((uu.size, len(TYPES)))
        mat[inv, t] = c
        return pa.table({
            "vec_id": pa.array(uu.astype(np.int64)),
            "embedding": pa.array([[float(x) for x in row]
                                   for row in mat],
                                  type=pa.list_(pa.float32()))})

    # same user may span blocks after keyed_sum (bucketed by key, not
    # user): one narrow user-bucket exchange makes vectors whole
    from pymhealth_ray.stages.partition import grouped_by_bucket

    def add_user(b: pa.Table) -> pa.Table:
        return b.append_column(
            "user", pa.array(b["key"].to_numpy(zero_copy_only=False)
                             // len(TYPES)))

    vecs = grouped_by_bucket(counts.map_batches(add_user,
                                                batch_format="pyarrow"),
                             to_vec, entity_col="user",
                             num_buckets=NB).materialize()
    queries_tbl = pa.concat_tables(
        [pa.table({"vec_id": b["vec_id"], "embedding": b["embedding"]})
         for b in vecs.iter_batches(batch_format="pyarrow")
         if b.num_rows > 0])
    out = knn_bruteforce(vecs, queries_tbl, k=USER_KNN_K)
    return pa.table({
        "user_id": out["query_id"],
        "neighbor_id": out["neighbor_id"],
        "cosine": pa.array(_round_away(
            out["cosine"].to_numpy(zero_copy_only=False), 6))})


SQL_EVENTS_USER_NEIGHBORS = """
WITH c AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
v AS (
  SELECT user_id,
         CAST(coalesce(max(CASE WHEN event_type = 'click' THEN c END), 0)
              AS BIGINT) AS f0,
         CAST(coalesce(max(CASE WHEN event_type = 'error' THEN c END), 0)
              AS BIGINT) AS f1,
         CAST(coalesce(max(CASE WHEN event_type = 'purchase' THEN c END), 0)
              AS BIGINT) AS f2,
         CAST(coalesce(max(CASE WHEN event_type = 'signup' THEN c END), 0)
              AS BIGINT) AS f3,
         CAST(coalesce(max(CASE WHEN event_type = 'view' THEN c END), 0)
              AS BIGINT) AS f4
  FROM c GROUP BY user_id),
p AS (
  SELECT a.user_id AS user_id, b.user_id AS neighbor_id,
         CAST(a.f0 * b.f0 + a.f1 * b.f1 + a.f2 * b.f2 + a.f3 * b.f3
              + a.f4 * b.f4 AS DOUBLE)
         / (sqrt(CAST(a.f0 * a.f0 + a.f1 * a.f1 + a.f2 * a.f2
                      + a.f3 * a.f3 + a.f4 * a.f4 AS DOUBLE))
            * sqrt(CAST(b.f0 * b.f0 + b.f1 * b.f1 + b.f2 * b.f2
                        + b.f3 * b.f3 + b.f4 * b.f4 AS DOUBLE))) AS sim
  FROM v a JOIN v b ON a.user_id <> b.user_id),
r AS (
  SELECT user_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY sim DESC, neighbor_id ASC) AS rn
  FROM p)
SELECT user_id, neighbor_id, round(sim, 6) AS cosine
FROM r WHERE rn <= 5
"""


# --------------------------------------------------------------------------
# round-5 fourth-session wave M: RAG chunking / XYZ class / heatmap / MRR
# --------------------------------------------------------------------------


CHUNK_W = 120
CHUNK_STRIDE = 80


def q_docs_chunk_overlap(sf_dir: str):
    """RAG CHUNKING: fixed-width character windows with overlap (width
    120, stride 80) — the retrieval-prep step every RAG corpus runs.
    Map-only; slicing is one vectorized utf8_slice per chunk position
    (positions bounded by max doc length, not row count); per-chunk md5
    digests make the oracle a pure SQL generate_series + substr."""
    docs = read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])

    def chunks(b: pa.Table) -> pa.Table:
        txt = b["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        ln = pc.utf8_length(txt).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        max_k = int((max(ln.max(), 1) - 1) // CHUNK_STRIDE) + 1 \
            if len(ln) else 0
        out_id, out_k, out_start, out_chunk = [], [], [], []
        for k in range(max_k):
            start = k * CHUNK_STRIDE
            m = ln > start
            if not m.any():
                break
            sl = pc.utf8_slice_codeunits(txt, start, start + CHUNK_W)
            sel = np.flatnonzero(m)
            sv = sl.take(pa.array(sel)).to_pylist()
            out_id.append(ids[sel])
            out_k.append(np.full(len(sel), k, dtype=np.int64))
            out_start.append(np.full(len(sel), start, dtype=np.int64))
            out_chunk.extend(sv)
        if not out_id:
            return pa.table({
                "doc_id": pa.array([], type=pa.int64()),
                "chunk_idx": pa.array([], type=pa.int64()),
                "start": pa.array([], type=pa.int64()),
                "chunk_len": pa.array([], type=pa.int64()),
                "chunk_md5": pa.array([], type=pa.string())})
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_id).astype(np.int64)),
            "chunk_idx": pa.array(np.concatenate(out_k)),
            "start": pa.array(np.concatenate(out_start)),
            "chunk_len": pa.array(
                np.array([len(c) for c in out_chunk], dtype=np.int64)),
            "chunk_md5": pa.array(
                [hashlib.md5(c.encode()).hexdigest() for c in out_chunk],
                type=pa.string())})

    return docs.map_batches(chunks, batch_format="pyarrow")


SQL_DOCS_CHUNK_OVERLAP = """
WITH g AS (
  SELECT doc_id, text,
         unnest(generate_series(0, length(text) - 1, 80)) AS start
  FROM documents)
SELECT doc_id, CAST(start // 80 AS BIGINT) AS chunk_idx,
       CAST(start AS BIGINT) AS start,
       CAST(length(substr(text, start + 1, 120)) AS BIGINT) AS chunk_len,
       md5(substr(text, start + 1, 120)) AS chunk_md5
FROM g
"""


def q_part_xyz_class(sf_dir: str):
    """XYZ DEMAND-VARIABILITY CLASSIFICATION (the inventory-planning
    complement of ABC/pareto and Croston): per part, the coefficient of
    variation of nonzero DAILY demand — X (steady, cv < 0.5), Y
    (variable, cv < 1), Z (erratic). Exact int64 moments over the
    (part, day) keyed_sum; one float expression per part in SQL op
    order; class thresholds compare bit-identical floats."""
    from pymhealth_ray.stages.aggregate import keyed_sum

    li = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_partkey", "l_shipdate", "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        d = _epoch_days(b["l_shipdate"])
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        q = np.rint(b["l_quantity"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        key = pk * 1_000_000 + (d % 1_000_000)
        u, inv = np.unique(key, return_inverse=True)
        qs = np.bincount(inv, weights=q.astype(np.float64),
                         minlength=u.size).astype(np.int64)
        return pa.table({"key": pa.array(u.astype(np.int64)),
                         "q": pa.array(qs)})

    daily = keyed_sum(li.map_batches(partial, batch_format="pyarrow",
                                     batch_size=None),
                      "key", ["q"], num_buckets=NB, precombine_rows=None)

    def part_partial(b: pa.Table) -> pa.Table:
        key = b["key"].to_numpy(zero_copy_only=False)
        q = b["q"].to_numpy(zero_copy_only=False)
        p = key // 1_000_000
        u, inv = np.unique(p, return_inverse=True)
        return pa.table({
            "part": pa.array(u.astype(np.int64)),
            "n": pa.array(np.bincount(inv, minlength=u.size)
                          .astype(np.int64)),
            "s": pa.array(np.bincount(inv, weights=q.astype(np.float64),
                                      minlength=u.size).astype(np.int64)),
            "ss": pa.array(np.bincount(
                inv, weights=(q * q).astype(np.float64),
                minlength=u.size).astype(np.int64))})

    rows = keyed_sum(daily.map_batches(part_partial,
                                       batch_format="pyarrow",
                                       batch_size=None),
                     "part", ["n", "s", "ss"], num_buckets=NB,
                     precombine_rows=None).take_all()
    part = np.array([r["part"] for r in rows], dtype=np.int64)
    n = np.array([r["n"] for r in rows], dtype=np.int64)
    s = np.array([r["s"] for r in rows], dtype=np.int64)
    ss = np.array([r["ss"] for r in rows], dtype=np.int64)
    o = np.argsort(part)
    part, n, s, ss = part[o], n[o], s[o], ss[o]
    mean = s.astype(np.float64) / n
    with np.errstate(invalid="ignore", divide="ignore"):
        var = (ss.astype(np.float64)
               - s.astype(np.float64) * s / n) / (n - 1)
        cv = np.sqrt(var) / mean
    single = n < 2
    cls = np.where(single, "Z",
                   np.where(cv < 0.5, "X", np.where(cv < 1.0, "Y", "Z")))
    return pa.table({
        "p_partkey": pa.array(part),
        "n_demand_days": pa.array(n),
        "mean_cents": pa.array(_round_away(mean, 6)),
        "cv": pa.array(_round_away(np.where(single, 0.0, cv), 6),
                       mask=single),
        "xyz": pa.array(cls.tolist(), type=pa.string())})


SQL_PART_XYZ_CLASS = """
WITH l AS (
  SELECT l_partkey,
         datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS d,
         CAST(round(l_quantity * 100) AS BIGINT) AS qc
  FROM lineitem),
daily AS (SELECT l_partkey, d, CAST(sum(qc) AS BIGINT) AS q
          FROM l GROUP BY 1, 2),
m AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(q) AS BIGINT) AS s,
             CAST(sum(q * q) AS BIGINT) AS ss
      FROM daily GROUP BY 1),
f AS (SELECT l_partkey, n, CAST(s AS DOUBLE) / n AS mean_cents,
             CASE WHEN n >= 2 THEN
               sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                    / (n - 1)) / (CAST(s AS DOUBLE) / n) END AS cv
      FROM m)
SELECT l_partkey AS p_partkey, n AS n_demand_days,
       round(mean_cents, 6) AS mean_cents, round(cv, 6) AS cv,
       CASE WHEN cv IS NULL THEN 'Z' WHEN cv < 0.5 THEN 'X'
            WHEN cv < 1.0 THEN 'Y' ELSE 'Z' END AS xyz
FROM f
"""


def q_events_hour_dow_heatmap(sf_dir: str):
    """HOUR × DAY-OF-WEEK activity heatmap — the ops-dashboard staple:
    one bounded (≤168-cell) count exchange, shares as one closing
    division per cell. Hour/dow derive from pure integer epoch
    arithmetic (no timezone/datepart dependence) so SQL and engine
    agree by construction."""
    ev = _events(sf_dir, ["ts", "event_id"])

    HOUR_US = 3_600_000_000
    DAY_US = 86_400_000_000

    def partial(b: pa.Table) -> pa.Table:
        ts = b["ts_us"].to_numpy(zero_copy_only=False)
        hour = (ts // HOUR_US) % 24
        dow = ((ts // DAY_US) + 4) % 7  # epoch day 0 = Thursday
        key = dow * 24 + hour
        u, c = np.unique(key, return_counts=True)
        return pa.table({"key": pa.array(u.astype(np.int64)),
                         "cnt": pa.array(c.astype(np.int64))})

    rows = ev.map_batches(partial, batch_format="pyarrow",
                          batch_size=None).take_all()
    agg: dict = {}
    for r in rows:
        agg[int(r["key"])] = agg.get(int(r["key"]), 0) + int(r["cnt"])
    keys = sorted(agg)
    k = np.array(keys, dtype=np.int64)
    c = np.array([agg[x] for x in keys], dtype=np.int64)
    tot = int(c.sum())
    return pa.table({
        "dow": pa.array(k // 24), "hour": pa.array(k % 24),
        "n": pa.array(c),
        "share": pa.array(_round_away(
            c.astype(np.float64) / np.float64(tot), 6))})


SQL_EVENTS_HOUR_DOW_HEATMAP = """
WITH e AS (SELECT epoch_us(ts) AS ts_us FROM events),
c AS (SELECT ((ts_us // 86400000000) + 4) % 7 AS dow,
             (ts_us // 3600000000) % 24 AS hour,
             CAST(count(*) AS BIGINT) AS n
      FROM e GROUP BY 1, 2),
t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
SELECT CAST(dow AS BIGINT) AS dow, CAST(hour AS BIGINT) AS hour, n,
       round(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share
FROM c, t
"""


def q_embed_mrr(sf_dir: str):
    """MRR@5 retrieval eval — reciprocal rank of the first same-label
    neighbor in the exact brute-force top-5 (0 when none), averaged per
    label with accumulation PINNED to ascending query id (the
    retrieval_ndcg float contract). Completes the IR-eval panel:
    recall@k, nDCG, RRF, MRR."""
    import ray

    from pymhealth_ray.stages.ann import knn_bruteforce

    ds = read_table(f"{sf_dir}/embeddings.parquet",
                    columns=["vec_id", "embedding", "label"])
    ds = ds.materialize()

    def pick_queries(b: pa.Table) -> pa.Table:
        m = b["vec_id"].to_numpy(zero_copy_only=False) % 5 == 0
        return b.filter(pa.array(m)).select(["vec_id", "embedding"])

    qtbl = pa.concat_tables(
        [b for b in ds.map_batches(pick_queries, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow")])
    top = knn_bruteforce(ds, qtbl, k=5, exclude_self=True)
    qi = np.asarray(top["query_id"].to_pylist(), dtype=np.int64)
    ni = np.asarray(top["neighbor_id"].to_pylist(), dtype=np.int64)
    need = np.unique(np.concatenate((qi, ni)))
    need_ref = ray.put(need)

    def fetch(b: pa.Table) -> pa.Table:
        w = ray.get(need_ref)
        m = np.isin(b["vec_id"].to_numpy(zero_copy_only=False), w)
        return b.filter(pa.array(m)).select(["vec_id", "label"])

    lab_rows = ds.map_batches(fetch, batch_format="pyarrow").take_all()
    lab_of = {r["vec_id"]: int(r["label"]) for r in lab_rows}
    order = np.argsort(qi, kind="stable")
    qs, ns_ = qi[order], ni[order]
    starts = np.concatenate(
        ([0], np.flatnonzero(qs[1:] != qs[:-1]) + 1, [len(qs)]))
    acc: dict = {}
    for s, e in zip(starts[:-1], starts[1:]):
        true = lab_of[int(qs[s])]
        rr = 0.0
        for rank, i in enumerate(ns_[s:e], start=1):
            if lab_of[int(i)] == true:
                rr = 1.0 / rank
                break
        n, tot = acc.get(true, (0, 0.0))
        acc[true] = (n + 1, tot + rr)
    rows = sorted(acc.items())
    lab = np.array([r[0] for r in rows], dtype=np.int64)
    n = np.array([r[1][0] for r in rows], dtype=np.int64)
    tot = np.array([r[1][1] for r in rows], dtype=np.float64)
    return pa.table({"label": pa.array(lab),
                     "n_queries": pa.array(n),
                     "mrr": pa.array(_round_away(tot / n, 6))})


def _embed_mrr_expected(df):
    """Single-process replay: exact cosine ranking with the engine's
    (sim DESC, id ASC) tie rule, query-id-ascending accumulation."""
    import pandas as pd

    ids = df["vec_id"].to_numpy().astype(np.int64)
    o = np.argsort(ids)
    ids = ids[o]
    labs = df["label"].to_numpy().astype(np.int64)[o]
    P = np.array([np.asarray(e, dtype=np.float32)
                  for e in df["embedding"].to_numpy()[o]])
    Pn = P / np.linalg.norm(P, axis=1, keepdims=True)
    acc: dict = {}
    for qpos in np.flatnonzero(ids % 5 == 0):
        sims = (Pn @ Pn[qpos]).astype(np.float64)
        sims[qpos] = -np.inf
        cand = np.lexsort((ids, -sims))[:5]
        true = labs[qpos]
        rr = 0.0
        for rank, i in enumerate(cand, start=1):
            if labs[i] == true:
                rr = 1.0 / rank
                break
        n, tot = acc.get(true, (0, 0.0))
        acc[true] = (n + 1, tot + rr)
    rows = sorted(acc.items())
    return pd.DataFrame({
        "label": np.array([r[0] for r in rows], dtype=np.int64),
        "n_queries": np.array([r[1][0] for r in rows], dtype=np.int64),
        "mrr": _round_away(np.array([r[1][1] / r[1][0] for r in rows]),
                           6)})


# --------------------------------------------------------------------------
# round-5 fourth-session wave N: greedy LM accuracy / FK audit / migration
# --------------------------------------------------------------------------


def q_seq_greedy_bigram_accuracy(sf_dir: str):
    """GREEDY NEXT-TOKEN ACCURACY — the speculative-decoding acceptance
    rate of a bigram draft model: predict each next token as
    argmax_b c(prev, b) (ties → smallest token id, the dense-matrix
    first-max), score self-accuracy per sequence. One vocab²-bounded
    count exchange (shared with bigram_nll's trainer), then the
    argmax table broadcasts and scoring is a map; counts exact, one
    closing division."""
    import ray as _ray

    from pymhealth_ray.stages.pmi import skipgram_pair_counts

    KM = 2048
    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "tokens"])
    pairs = skipgram_pair_counts(ds, "tokens", window=1, key_mult=KM)
    dense = np.zeros(KM * KM, dtype=np.int64)
    for b in pairs.iter_batches(batch_format="pyarrow"):
        k = b["key"].to_numpy(zero_copy_only=False)
        c = b["c"].to_numpy(zero_copy_only=False)
        dense[k] = c
    best = dense.reshape(KM, KM).argmax(axis=1).astype(np.int64)
    best_ref = _ray.put(best)

    def score(batch: pa.Table) -> pa.Table:
        bst = _ray.get(best_ref)
        col = batch["tokens"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        lens = pc.list_value_length(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        offs = np.concatenate(([0], np.cumsum(lens)))
        pos = np.arange(len(flat), dtype=np.int64)
        local = pos - np.repeat(offs[:-1], lens)
        ok = local < np.repeat(lens - 1, lens)
        a = flat[ok]
        b2 = flat[np.flatnonzero(ok) + 1]
        hit = (bst[a] == b2).astype(np.int64)
        nslots = np.maximum(lens - 1, 0)
        soffs = np.concatenate(([0], np.cumsum(nslots)))[:-1]
        nh = np.zeros(len(lens), dtype=np.int64)
        nz = nslots > 0
        if nz.any() and len(hit):
            nh[nz] = np.add.reduceat(hit, soffs[nz])
        with np.errstate(invalid="ignore", divide="ignore"):
            acc = nh.astype(np.float64) / nslots
        return pa.table({
            "doc_id": batch["doc_id"], "ts_ns": batch["ts_ns"],
            "n_slots": pa.array(nslots), "n_hit": pa.array(nh),
            "accuracy": pa.array(_round_away(np.where(nz, acc, 0.0), 6),
                                 mask=~nz)})

    return ds.map_batches(score, batch_format="pyarrow")


def sql_seq_greedy_bigram_accuracy(path: str) -> str:
    return f"""
WITH src AS (
  SELECT doc_id, ts_ns, tokens FROM read_parquet('{path}/part-*.parquet')
), p AS (
  SELECT doc_id, ts_ns, CAST(tokens[i] AS BIGINT) AS a,
         CAST(tokens[i + 1] AS BIGINT) AS b
  FROM src, LATERAL unnest(generate_series(1, len(tokens) - 1)) AS u(i)
), cab AS (
  SELECT a, b, count(*) AS c FROM p GROUP BY a, b
), best AS (
  SELECT a, b AS best_b FROM (
    SELECT a, b, row_number() OVER (PARTITION BY a
                                    ORDER BY c DESC, b ASC) AS rn
    FROM cab) WHERE rn = 1
), sc AS (
  SELECT p.doc_id, p.ts_ns, CAST(count(*) AS BIGINT) AS n_slots,
         CAST(sum(CASE WHEN p.b = best.best_b THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hit
  FROM p JOIN best USING (a) GROUP BY p.doc_id, p.ts_ns
)
SELECT src.doc_id, src.ts_ns,
       CAST(coalesce(sc.n_slots, 0) AS BIGINT) AS n_slots,
       CAST(coalesce(sc.n_hit, 0) AS BIGINT) AS n_hit,
       round(CAST(sc.n_hit AS DOUBLE) / sc.n_slots, 6) AS accuracy
FROM src LEFT JOIN sc USING (doc_id, ts_ns)
"""


def q_lineitem_fk_orphans(sf_dir: str):
    """REFERENTIAL-INTEGRITY AUDIT across all three lineitem FKs: child
    rows whose parent key is missing. orders is fact-sized, so that FK
    runs the co-partitioned Dataset-resident anti-join
    (dropset.filter_by_keys — bloom + exchange above the broadcast
    threshold); part/supplier are dims and broadcast. One audit row per
    relationship."""
    from pymhealth_ray.stages.dropset import filter_by_keys

    li = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_orderkey", "l_partkey", "l_suppkey"])
    li = li.materialize()
    n_child = li.count()
    out_rows = []
    for fk, parent_tbl, parent_col in (
            ("l_orderkey", "orders", "o_orderkey"),
            ("l_partkey", "part", "p_partkey"),
            ("l_suppkey", "supplier", "s_suppkey")):
        parents = read_table(f"{sf_dir}/{parent_tbl}.parquet",
                             columns=[parent_col])
        orphans = filter_by_keys(
            li.select_columns([fk]), fk, parents, keys_col=parent_col,
            keep=False, num_buckets=NB)
        out_rows.append((fk, n_child, orphans.count()))
    return pa.table({
        "fk": pa.array([r[0] for r in out_rows], type=pa.string()),
        "n_child": pa.array([r[1] for r in out_rows], type=pa.int64()),
        "n_orphans": pa.array([r[2] for r in out_rows],
                              type=pa.int64())})


SQL_LINEITEM_FK_ORPHANS = """
SELECT 'l_orderkey' AS fk, (SELECT count(*) FROM lineitem) AS n_child,
       (SELECT count(*) FROM lineitem l ANTI JOIN orders o
        ON l.l_orderkey = o.o_orderkey) AS n_orphans
UNION ALL
SELECT 'l_partkey', (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem l ANTI JOIN part p
        ON l.l_partkey = p.p_partkey)
UNION ALL
SELECT 'l_suppkey', (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem l ANTI JOIN supplier s
        ON l.l_suppkey = s.s_suppkey)
"""


def q_orders_band_migration(sf_dir: str):
    """CUSTOMER SPEND-BAND MIGRATION MATRIX: per (customer, month)
    spend rolls into decimal-magnitude bands (floor log10 of cents —
    fixed, rank-free, so no cross-month NTILE exchange), then each
    customer's CONSECUTIVE month pairs vote into a (from_band,
    to_band) transition matrix — the retention/upsell dashboard.
    (cust, month) sums in one keyed_sum; pair detection is a
    per-customer sorted shift inside one bucket exchange; matrix cells
    are exact ints + one share division."""
    from pymhealth_ray.stages.aggregate import keyed_sum
    from pymhealth_ray.stages.partition import grouped_by_bucket

    od = read_table(f"{sf_dir}/orders.parquet",
                    columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        b = _cents(b, "o_totalprice", "cents")
        days = _epoch_days(b["o_orderdate"])
        d64 = days.astype("datetime64[D]")
        # non-negative month index; the SQL oracle uses a different
        # epoch — only month ADJACENCY enters the result, constants
        # cancel in the (month == month + 1) test
        months = (d64.astype("datetime64[M]").astype(np.int64)
                  + 70 * 12 + 360)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        key = ck * 100_000 + months
        u, inv = np.unique(key, return_inverse=True)
        s = np.bincount(inv, weights=b["cents"].to_numpy(
            zero_copy_only=False).astype(np.float64),
            minlength=u.size).astype(np.int64)
        return pa.table({"key": pa.array(u.astype(np.int64)),
                         "cents": pa.array(s)})

    monthly = keyed_sum(od.map_batches(partial, batch_format="pyarrow",
                                       batch_size=None),
                        "key", ["cents"], num_buckets=NB,
                        precombine_rows=None)

    def add_cust(b: pa.Table) -> pa.Table:
        return b.append_column(
            "cust", pa.array(b["key"].to_numpy(zero_copy_only=False)
                             // 100_000))

    def per_bucket(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"from_band": pa.array([], type=pa.int64()),
                             "to_band": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        key = tbl["key"].to_numpy(zero_copy_only=False)
        cents = tbl["cents"].to_numpy(zero_copy_only=False)
        o = np.argsort(key)
        key, cents = key[o], cents[o]
        cust = key // 100_000
        month = key % 100_000
        band = np.floor(np.log10(cents.astype(np.float64))) \
            .astype(np.int64)
        adj = (cust[1:] == cust[:-1]) & (month[1:] == month[:-1] + 1)
        fb = band[:-1][adj]
        tb = band[1:][adj]
        pk = fb * 100 + tb
        u, c = np.unique(pk, return_counts=True)
        return pa.table({"from_band": pa.array((u // 100).astype(np.int64)),
                         "to_band": pa.array((u % 100).astype(np.int64)),
                         "n": pa.array(c.astype(np.int64))})

    rows = grouped_by_bucket(monthly.map_batches(add_cust,
                                                 batch_format="pyarrow"),
                             per_bucket, entity_col="cust",
                             num_buckets=NB).take_all()
    agg: dict = {}
    for r in rows:
        k = (int(r["from_band"]), int(r["to_band"]))
        agg[k] = agg.get(k, 0) + int(r["n"])
    keys = sorted(agg)
    fb = np.array([k[0] for k in keys], dtype=np.int64)
    tb = np.array([k[1] for k in keys], dtype=np.int64)
    n = np.array([agg[k] for k in keys], dtype=np.int64)
    tot = int(n.sum())
    return pa.table({
        "from_band": pa.array(fb), "to_band": pa.array(tb),
        "n": pa.array(n),
        "share": pa.array(_round_away(
            n.astype(np.float64) / np.float64(tot), 6))})


SQL_ORDERS_BAND_MIGRATION = """
WITH m AS (
  SELECT o_custkey AS cust,
         datediff('month', DATE '1940-01-01',
                  CAST(o_orderdate AS DATE)) AS month,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
  FROM orders GROUP BY 1, 2),
b AS (SELECT cust, month,
             CAST(floor(log10(CAST(cents AS DOUBLE))) AS BIGINT) AS band
      FROM m),
t AS (SELECT a.band AS from_band, c.band AS to_band,
             CAST(count(*) AS BIGINT) AS n
      FROM b a JOIN b c ON a.cust = c.cust AND c.month = a.month + 1
      GROUP BY 1, 2),
g AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM t)
SELECT from_band, to_band, n,
       round(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share
FROM t, g
"""


# --------------------------------------------------------------------------
# round-5 fourth-session wave O: streaming funnel / PMI-SVD item vectors
# --------------------------------------------------------------------------


def q_events_streaming_funnel(sf_dir: str):
    """STREAMING twin of events_funnel (11th streaming family member):
    the earliest-chain view→click→purchase funnel read straight off the
    sorted bucketed events layout — since the stream is (user, ts)-
    ascending, each step's chain minimum is final when observed, so the
    carry is just the boundary user's per-step timestamps
    (stages/streaming.streaming_funnel). Zero query-time exchange;
    shares events_funnel's SQL oracle."""
    from pymhealth_ray.stages.streaming import streaming_funnel

    ev = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        return b.select(["user_id", "ts_us", "event_id", "event_type"])

    ds = ev.map_batches(prep, batch_format="pyarrow")
    layout = _sorted_layout(sf_dir, ds, suffix="_windedup",
                            entity_col="user_id",
                            sort_cols=["user_id", "ts_us", "event_id"])
    out = streaming_funnel(layout, entity_col="user_id",
                           type_col="event_type", ts_col="ts_us",
                           steps=FUNNEL_STEPS)

    def finish(b: pa.Table) -> pa.Table:
        return b.select(["user_id", "t1", "t2", "t3", "reached"])

    return out.map_batches(finish, batch_format="pyarrow")


PMI_SVD_DIM = 16
PMI_SVD_K = 5


def _pmi_svd_vectors(dense: np.ndarray, kp: int):
    """PPMI → rank-16 SVD item vectors (Levy & Goldberg 2014) from the
    EXACT integer co-occurrence matrix — shared verbatim by the engine
    and the oracle so the driver-side float path (log, SVD, U·√Σ,
    row-normalize) is executed identically on both sides. Items with no
    co-occurrence get zero vectors and are dropped."""
    if kp > 8192:
        # full dense SVD is O(kp³): fine for a bounded item dimension,
        # dishonest beyond it — larger domains need a randomized/iterative
        # factorizer (not built; the cap raises instead of thrashing)
        raise ValueError(f"item domain {kp} exceeds the dense-SVD cap 8192")
    mat = dense.reshape(kp, kp).astype(np.float64)
    row = mat.sum(axis=1)
    tot = mat.sum()
    live = row > 0
    with np.errstate(divide="ignore", invalid="ignore"):
        pmi = np.log(mat * tot / np.outer(row, row))
    pmi[~np.isfinite(pmi)] = 0.0
    pmi[pmi < 0] = 0.0
    u, s, _ = np.linalg.svd(pmi, full_matrices=False)
    vec = u[:, :PMI_SVD_DIM] * np.sqrt(s[:PMI_SVD_DIM])[None, :]
    # deterministic sign: flip each column so its max-|.| entry is +
    for j in range(vec.shape[1]):
        i = int(np.argmax(np.abs(vec[:, j])))
        if vec[i, j] < 0:
            vec[:, j] = -vec[:, j]
    ids = np.flatnonzero(live).astype(np.int64)
    return ids, vec[live].astype(np.float32)


def q_part_pmi_svd_neighbors(sf_dir: str):
    """ITEM EMBEDDINGS from the co-purchase matrix: PPMI + truncated
    SVD (the count-based word2vec equivalence) — trained from one
    packed-key edge exchange (cooccurrence_edges), factorized once on
    the driver (the matrix is PART-DOMAIN bounded, a dimension, never
    fact-sized), then top-5 cosine neighbors run through the SAME
    distributed brute-force kNN as the embedding queries. The dense
    linear-algebra path is shared verbatim with the oracle
    (_pmi_svd_vectors), so floats are bit-identical."""
    import ray.data as _rd

    from pymhealth_ray.stages.ann import knn_bruteforce
    from pymhealth_ray.stages.triangles import cooccurrence_edges

    li = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_orderkey", "l_partkey"])
    st = grouped_stats(li.map_batches(
        lambda b: pa.table({"one": pa.array(
            np.zeros(b.num_rows, dtype=np.int8)),
            "l_partkey": b["l_partkey"]}),
        batch_format="pyarrow"), ["one"],
        max_cols=["l_partkey"]).take_all()
    kp = int(st[0]["l_partkey_max"]) + 1
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey",
                               max_item=kp - 1, num_buckets=NB)
    dense = np.zeros(kp * kp, dtype=np.int64)
    for b in edges.iter_batches(batch_format="pyarrow"):
        a = b["a"].to_numpy(zero_copy_only=False)
        e = b["b"].to_numpy(zero_copy_only=False)
        w = b["w"].to_numpy(zero_copy_only=False)
        dense[a * kp + e] = w
        dense[e * kp + a] = w
    ids, vec = _pmi_svd_vectors(dense, kp)
    tbl = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([[float(x) for x in row] for row in vec],
                              type=pa.list_(pa.float32()))})
    vds = _rd.from_arrow(tbl)
    out = knn_bruteforce(vds, tbl, k=PMI_SVD_K)
    return pa.table({
        "p_partkey": out["query_id"],
        "neighbor_id": out["neighbor_id"],
        "cosine": pa.array(_round_away(
            out["cosine"].to_numpy(zero_copy_only=False), 6))})


def _pmi_svd_expected(df):
    import pandas as pd

    edges = {}
    for _, grp in df.groupby("l_orderkey"):
        items = sorted(set(int(v) for v in grp["l_partkey"]))
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                edges[(items[i], items[j])] = \
                    edges.get((items[i], items[j]), 0) + 1
    kp = int(df["l_partkey"].max()) + 1
    dense = np.zeros(kp * kp, dtype=np.int64)
    for (a, b), w in edges.items():
        dense[a * kp + b] = w
        dense[b * kp + a] = w
    ids, vec = _pmi_svd_vectors(dense, kp)
    # exact replay of ann.knn_bruteforce's float path: float32 storage
    # -> float64 matrix -> _unit clamp -> float64 matmul
    m = vec.astype(np.float32).astype(np.float64)
    pn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    rows = []
    for qi in range(len(ids)):
        sims = pn @ pn[qi]
        sims[qi] = -np.inf
        cand = np.lexsort((ids, -sims))[:PMI_SVD_K]
        for c in cand:
            rows.append((int(ids[qi]), int(ids[c]), float(sims[c])))
    rows.sort(key=lambda r: (r[0], -r[2], r[1]))
    return pd.DataFrame({
        "p_partkey": np.array([r[0] for r in rows], dtype=np.int64),
        "neighbor_id": np.array([r[1] for r in rows], dtype=np.int64),
        "cosine": _round_away(np.array([r[2] for r in rows]), 6)})


# --------------------------------------------------------------------------
# round-5 fourth-session wave P: t-closeness / curriculum order
# --------------------------------------------------------------------------


def q_customer_t_closeness(sf_dir: str):
    """T-CLOSENESS AUDIT (Li et al. 2007) — completes the privacy triad
    next to docs_k_anonymize / docs_l_diversity: per quasi-identifier
    group (nation × segment), the Earth-Mover's Distance between the
    group's sensitive-value distribution (account-balance $1000 bands,
    ordered) and the global one. For ordered equi-spaced categories
    EMD = Σ|cum diffs|/(B−1); the numerator is computed over EXACT
    integers (cum of n_gj·n_tot − n_j·n_g), so the only float is ONE
    closing division — bit-exact under any partitioning. Counts are a
    bounded (groups × bands) partial exchange."""
    cu = read_table(f"{sf_dir}/customer.parquet",
                    columns=["c_nationkey", "c_mktsegment", "c_acctbal"])

    def partial(b: pa.Table) -> pa.Table:
        b = _cents(b, "c_acctbal", "cents")
        band = b["cents"].to_numpy(zero_copy_only=False) // 100_000
        nk = b["c_nationkey"]
        if isinstance(nk, pa.ChunkedArray):
            nk = nk.combine_chunks()
        nk = nk.to_numpy(zero_copy_only=False).astype(np.int64)
        sg = b["c_mktsegment"]
        if isinstance(sg, pa.ChunkedArray):
            sg = sg.combine_chunks()
        enc = sg.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        segs = enc.dictionary.to_pylist()
        # band offset keeps packed keys non-negative (acctbal can be < 0)
        pk = ((nk * len(segs) + codes) * 10_000) + (band + 1_000)
        u, c = np.unique(pk, return_counts=True)
        return pa.table({
            "nation": pa.array(((u // 10_000) // len(segs))
                               .astype(np.int64)),
            "segment": pa.array([segs[int(v)] for v in
                                 (u // 10_000) % len(segs)],
                                type=pa.string()),
            "band": pa.array((u % 10_000 - 1_000).astype(np.int64)),
            "n": pa.array(c.astype(np.int64))})

    rows = cu.map_batches(partial, batch_format="pyarrow",
                          batch_size=None).take_all()
    agg: dict = {}
    for r in rows:
        k = (int(r["nation"]), r["segment"], int(r["band"]))
        agg[k] = agg.get(k, 0) + int(r["n"])
    bands = sorted({k[2] for k in agg})
    bidx = {b_: i for i, b_ in enumerate(bands)}
    B = len(bands)
    glob = np.zeros(B, dtype=np.int64)
    groups: dict = {}
    for (nat, seg, b_), n in agg.items():
        glob[bidx[b_]] += n
        g = groups.setdefault((nat, seg), np.zeros(B, dtype=np.int64))
        g[bidx[b_]] += n
    n_tot = int(glob.sum())
    keys = sorted(groups)
    out_n, out_emd = [], []
    for k in keys:
        g = groups[k]
        ng = int(g.sum())
        # exact-integer cum diffs: cum(n_gj·n_tot − n_j·n_g)
        diffs = g.astype(object) * n_tot - glob.astype(object) * ng
        cum, acc = [], 0
        for d in diffs:
            acc += int(d)
            cum.append(abs(acc))
        num = sum(cum[:-1])  # last cum is always 0
        emd = float(num) / (float(ng) * n_tot * (B - 1))
        out_n.append(ng)
        out_emd.append(emd)
    return pa.table({
        "c_nationkey": pa.array([k[0] for k in keys], type=pa.int64()),
        "c_mktsegment": pa.array([k[1] for k in keys], type=pa.string()),
        "n": pa.array(out_n, type=pa.int64()),
        "t_closeness": pa.array(_round_away(np.array(out_emd), 6))})


SQL_CUSTOMER_T_CLOSENESS = """
WITH c AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS seg,
         -- floor division (numpy semantics): DuckDB // truncates
         -- toward zero on negatives, so spell the floor out
         CAST(floor(CAST(round(c_acctbal * 100) AS BIGINT)
                    / 100000.0) AS BIGINT) AS band
  FROM customer),
gb AS (SELECT nation, seg, band, CAST(count(*) AS BIGINT) AS n
       FROM c GROUP BY 1, 2, 3),
bands AS (SELECT DISTINCT band FROM c),
gdist AS (SELECT band, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tot,
               (SELECT count(*) FROM bands) AS nb FROM c),
grp AS (SELECT nation, seg, CAST(sum(n) AS BIGINT) AS ng
        FROM gb GROUP BY 1, 2),
spine AS (SELECT g.nation, g.seg, b.band, g.ng,
                 CAST(coalesce(gb.n, 0) AS BIGINT) AS ngj,
                 gl.n AS nj
          FROM grp g CROSS JOIN bands b
          LEFT JOIN gb ON gb.nation = g.nation AND gb.seg = g.seg
                       AND gb.band = b.band
          JOIN gdist gl ON gl.band = b.band),
cums AS (SELECT nation, seg, band, ng,
                CAST(sum(ngj * (SELECT n_tot FROM tot) - nj * ng)
                     OVER (PARTITION BY nation, seg ORDER BY band)
                     AS BIGINT) AS cumd
         FROM spine),
last_band AS (SELECT max(band) AS mb FROM bands),
s AS (SELECT nation, seg, ng, CAST(sum(abs(cumd)) AS BIGINT) AS num
      FROM cums, last_band WHERE band < mb GROUP BY 1, 2, ng)
SELECT nation AS c_nationkey, seg AS c_mktsegment, ng AS n,
       round(CAST(num AS DOUBLE)
             / (CAST(ng AS DOUBLE) * (SELECT n_tot FROM tot)
                * ((SELECT nb FROM tot) - 1)), 6) AS t_closeness
FROM s
"""


CURR_TILES = 8


def q_seq_curriculum_order(sf_dir: str):
    """DETERMINISTIC CURRICULUM SCHEDULE: rank rows by length
    difficulty (exact global NTILE(8) via partitioned_sort_rank), then
    interleave tiles round-robin — order_key = within_tile_rank·8 +
    tile — so training sees a stable easy→hard mix every epoch instead
    of random_shuffle's irreproducible order. One exchange + integer
    arithmetic; any reader reproduces the schedule."""
    from pymhealth_ray.stages.dedup import composite_rid
    from pymhealth_ray.stages.rank import partitioned_sort_rank

    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "n_tok"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"], "ts_ns": b["ts_ns"],
            "n_tok": b["n_tok"].cast(pa.int64()),
            "one": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
            "rid": composite_rid(b["doc_id"], b["ts_ns"]),
        })

    ranked = partitioned_sort_rank(
        ds.map_batches(prep, batch_format="pyarrow"),
        "one", "n_tok", "rid", num_bins=256, rank_name="rnk")

    def finish(b: pa.Table) -> pa.Table:
        r = b["rnk"].to_numpy(zero_copy_only=False)
        n = b["__n_part"].to_numpy(zero_copy_only=False)
        q, rem = n // CURR_TILES, n % CURR_TILES
        cut = rem * (q + 1)
        in_big = r < cut
        tile = np.where(in_big, r // np.maximum(q + 1, 1),
                        rem + (r - cut) // np.maximum(q, 1))
        start = np.where(in_big, tile * (q + 1), cut + (tile - rem) * q)
        within = r - start
        return pa.table({
            "doc_id": b["doc_id"], "ts_ns": b["ts_ns"],
            "n_tok": b["n_tok"],
            "tile": pa.array(tile.astype(np.int64)),
            "order_key": pa.array((within * CURR_TILES
                                   + tile).astype(np.int64))})

    return ranked.map_batches(finish, batch_format="pyarrow")


def sql_seq_curriculum_order(path: str) -> str:
    return f"""
WITH r AS (
  SELECT doc_id, ts_ns, CAST(n_tok AS BIGINT) AS n_tok,
         CAST(row_number() OVER (ORDER BY n_tok, doc_id, ts_ns) - 1
              AS BIGINT) AS rnk,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM read_parquet('{path}/part-*.parquet')
), t AS (
  SELECT doc_id, ts_ns, n_tok, rnk, n,
         CASE WHEN rnk < (n % 8) * (n // 8 + 1)
              THEN rnk // (n // 8 + 1)
              ELSE (n % 8) + (rnk - (n % 8) * (n // 8 + 1)) // (n // 8)
         END AS tile
  FROM r
)
SELECT doc_id, ts_ns, n_tok, CAST(tile AS BIGINT) AS tile,
       CAST((rnk - CASE WHEN rnk < (n % 8) * (n // 8 + 1)
                        THEN tile * (n // 8 + 1)
                        ELSE (n % 8) * (n // 8 + 1)
                             + (tile - n % 8) * (n // 8) END) * 8
            + tile AS BIGINT) AS order_key
FROM t
"""


# --------------------------------------------------------------------------
# round-5 fourth-session wave Q: apportionment / KPI decomposition / MMD
# --------------------------------------------------------------------------


APPORTION_N = 1_000_000


def q_orders_budget_apportion(sf_dir: str):
    """HAMILTON (largest-remainder) APPORTIONMENT — distribute an
    integer budget across priorities proportionally to order counts,
    the exact-arithmetic allocation primitive (ad budgets, sampling
    quotas, shard assignments): base_i = ⌊N·c_i/C⌋, the L = N − Σbase
    leftover units go to the largest remainders (ties → priority ASC).
    Pure integers end to end — no float can mis-allocate a unit."""
    od = read_table(f"{sf_dir}/orders.parquet",
                    columns=["o_orderpriority"])

    def partial(b: pa.Table) -> pa.Table:
        pr = b["o_orderpriority"]
        if isinstance(pr, pa.ChunkedArray):
            pr = pr.combine_chunks()
        enc = pr.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        n = np.bincount(codes, minlength=len(enc.dictionary))
        return pa.table({"prio": enc.dictionary,
                         "n": pa.array(n.astype(np.int64))})

    rows = od.map_batches(partial, batch_format="pyarrow",
                          batch_size=None).take_all()
    agg: dict = {}
    for r in rows:
        agg[r["prio"]] = agg.get(r["prio"], 0) + int(r["n"])
    prios = sorted(agg)
    c = np.array([agg[p] for p in prios], dtype=np.int64)
    C = int(c.sum())
    base = (APPORTION_N * c) // C
    rem = (APPORTION_N * c) % C
    left = APPORTION_N - int(base.sum())
    order = np.lexsort((np.arange(len(prios)), -rem))
    extra = np.zeros(len(prios), dtype=np.int64)
    extra[order[:left]] = 1
    return pa.table({
        "o_orderpriority": pa.array(prios, type=pa.string()),
        "n_orders": pa.array(c),
        "base_alloc": pa.array(base),
        "extra": pa.array(extra),
        "alloc": pa.array(base + extra)})


SQL_ORDERS_BUDGET_APPORTION = """
WITH c AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
           FROM orders GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) AS ct FROM c),
b AS (SELECT o_orderpriority, n,
             CAST(1000000 * n // ct AS BIGINT) AS base,
             CAST(1000000 * n % ct AS BIGINT) AS rem
      FROM c, t),
l AS (SELECT CAST(1000000 - sum(base) AS BIGINT) AS leftover FROM b),
r AS (SELECT *, row_number() OVER (ORDER BY rem DESC,
                                   o_orderpriority ASC) AS rk
      FROM b)
SELECT o_orderpriority, n AS n_orders, base AS base_alloc,
       CAST(CASE WHEN rk <= (SELECT leftover FROM l)
                 THEN 1 ELSE 0 END AS BIGINT) AS extra,
       CAST(base + CASE WHEN rk <= (SELECT leftover FROM l)
                        THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM r
"""


def q_events_kpi_decomposition(sf_dir: str):
    """NORTH-STAR KPI DECOMPOSITION: revenue = users × events/user ×
    revenue/event; the period-over-period change in log space splits
    EXACTLY into the three factors' log deltas (ΔlnR = Δln U + Δln(E/U)
    + Δln(R/E)) — the growth-accounting view every metrics team builds.
    Halves split at the integer timestamp midpoint; U is the exact
    distributed distinct (grouped_distinct_count), E and R exact int
    sums; one ln expression per factor in SQL op order."""
    from pymhealth_ray.stages.aggregate import (grouped_distinct_count,
                                                grouped_stats)

    ev = _events(sf_dir, ["user_id", "ts", "value"])
    ev = ev.materialize()
    st = grouped_stats(ev.map_batches(
        lambda b: pa.table({"one": pa.array(
            np.zeros(b.num_rows, dtype=np.int8)),
            "ts_us": b["ts_us"]}), batch_format="pyarrow"),
        ["one"], min_cols=["ts_us"], max_cols=["ts_us"]).take_all()
    lo, hi = int(st[0]["ts_us_min"]), int(st[0]["ts_us_max"])
    mid = (lo + hi) // 2

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "cents")
        ts = b["ts_us"].to_numpy(zero_copy_only=False)
        half = (ts > mid).astype(np.int64)
        return pa.table({"half": pa.array(half),
                         "user_id": b["user_id"],
                         "cents": b["cents"]})

    halved = ev.map_batches(prep, batch_format="pyarrow").materialize()
    sums = grouped_stats(halved, ["half"], sum_cols=["cents"],
                         count_name="n").take_all()
    dudc = grouped_distinct_count(halved.select_columns(
        ["half", "user_id"]), "half", "user_id", num_buckets=NB)
    urows = {int(r["half"]): int(r["n_distinct"])
             for r in dudc.take_all()}
    srows = {int(r["half"]): (int(r["n"]), int(r["cents_sum"]))
             for r in sums}
    u0, u1 = urows[0], urows[1]
    e0, r0 = srows[0]
    e1, r1 = srows[1]
    d_users = np.log(np.float64(u1) / u0)
    d_epu = np.log((np.float64(e1) / u1) / (np.float64(e0) / u0))
    d_rpe = np.log((np.float64(r1) / e1) / (np.float64(r0) / e0))
    d_rev = np.log(np.float64(r1) / r0)
    factors = ["users", "events_per_user", "revenue_per_event"]
    deltas = np.array([d_users, d_epu, d_rpe])
    return pa.table({
        "factor": pa.array(factors, type=pa.string()),
        "h0": pa.array([u0, e0, r0], type=pa.int64()),
        "h1": pa.array([u1, e1, r1], type=pa.int64()),
        "delta_log": pa.array(_round_away(deltas, 6)),
        "contribution": pa.array(_round_away(deltas / d_rev, 6))})


SQL_EVENTS_KPI_DECOMPOSITION = """
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
b AS (SELECT (min(ts_us) + max(ts_us)) // 2 AS mid FROM e),
h AS (SELECT CASE WHEN ts_us > (SELECT mid FROM b) THEN 1 ELSE 0 END
          AS half, user_id, cents FROM e),
a AS (SELECT half, CAST(count(DISTINCT user_id) AS BIGINT) AS u,
             CAST(count(*) AS BIGINT) AS ev,
             CAST(sum(cents) AS BIGINT) AS r
      FROM h GROUP BY half),
w AS (SELECT
        max(CASE WHEN half = 0 THEN u END) AS u0,
        max(CASE WHEN half = 1 THEN u END) AS u1,
        max(CASE WHEN half = 0 THEN ev END) AS e0,
        max(CASE WHEN half = 1 THEN ev END) AS e1,
        max(CASE WHEN half = 0 THEN r END) AS r0,
        max(CASE WHEN half = 1 THEN r END) AS r1
      FROM a)
SELECT * FROM (
  SELECT 'users' AS factor, u0 AS h0, u1 AS h1,
         round(ln(CAST(u1 AS DOUBLE) / u0), 6) AS delta_log,
         round(ln(CAST(u1 AS DOUBLE) / u0)
               / ln(CAST(r1 AS DOUBLE) / r0), 6) AS contribution
  FROM w
  UNION ALL
  SELECT 'events_per_user', e0, e1,
         round(ln((CAST(e1 AS DOUBLE) / u1) / (CAST(e0 AS DOUBLE) / u0)),
               6),
         round(ln((CAST(e1 AS DOUBLE) / u1) / (CAST(e0 AS DOUBLE) / u0))
               / ln(CAST(r1 AS DOUBLE) / r0), 6)
  FROM w
  UNION ALL
  SELECT 'revenue_per_event', r0, r1,
         round(ln((CAST(r1 AS DOUBLE) / e1) / (CAST(r0 AS DOUBLE) / e0)),
               6),
         round(ln((CAST(r1 AS DOUBLE) / e1) / (CAST(r0 AS DOUBLE) / e0))
               / ln(CAST(r1 AS DOUBLE) / r0), 6)
  FROM w)
"""


def q_embed_split_mmd(sf_dir: str):
    """EMBEDDING DISTRIBUTION SHIFT between two md5 splits — the
    vector-level complement of the scalar PSI/KS drift panel: squared
    distance between split mean embeddings plus each split's mean
    squared norm, all from EXACT integer quantized sums (the PCA
    discipline — any partitioning, bit-identical). A near-zero gap
    certifies the split didn't skew the representation space."""
    from pymhealth_ray.stages.pca import _emb_matrix, _quantize
    from pymhealth_ray.stages.sketch import _md5_u64

    emb = read_table(f"{sf_dir}/embeddings.parquet",
                     columns=["vec_id", "embedding"])

    def partial(b: pa.Table) -> pa.Table:
        keys = pc.binary_join_element_wise(
            pc.cast(b["vec_id"], pa.string()), "mmd", "|")
        half = (_md5_u64(keys) % np.uint64(2)).astype(np.int64)
        q = _quantize(_emb_matrix(b, "embedding"), 18).astype(np.int64)
        rows = []
        for h in (0, 1):
            m = half == h
            if not m.any():
                continue
            sub = q[m]
            rows.append((h, int(m.sum()),
                         [int(v) for v in sub.sum(axis=0)],
                         int((sub.astype(object) ** 2).sum())))
        return pa.table({
            "half": pa.array([r[0] for r in rows], type=pa.int64()),
            "n": pa.array([r[1] for r in rows], type=pa.int64()),
            "s": pa.array([r[2] for r in rows],
                          type=pa.list_(pa.int64())),
            "sq": pa.array([r[3] for r in rows], type=pa.int64())})

    rows = emb.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).take_all()
    agg = {0: [0, None, 0], 1: [0, None, 0]}
    for r in rows:
        a = agg[r["half"]]
        a[0] += int(r["n"])
        s = [int(v) for v in r["s"]]
        a[1] = s if a[1] is None else [x + y for x, y in zip(a[1], s)]
        a[2] += int(r["sq"])
    scale = float(1 << 18)
    out = {"half": [], "n": [], "mean_sq_norm": []}
    mus = []
    for h in (0, 1):
        n, s, sq = agg[h]
        mu = np.array([float(v) for v in s]) / (n * scale)
        mus.append(mu)
        out["half"].append(h)
        out["n"].append(n)
        out["mean_sq_norm"].append(float(sq) / (n * scale * scale))
    gap = float(((mus[0] - mus[1]) ** 2).sum())
    return pa.table({
        "half": pa.array(out["half"], type=pa.int64()),
        "n": pa.array(out["n"], type=pa.int64()),
        "mean_sq_norm": pa.array(_round_away(
            np.array(out["mean_sq_norm"]), 6)),
        "mean_gap_sq": pa.array(_round_away(
            np.array([gap, gap]), 6))})


def _split_mmd_expected(df):
    import hashlib as _hl

    import pandas as pd

    from pymhealth_ray.stages.pca import _quantize

    ids = df["vec_id"].to_numpy().astype(np.int64)
    P = np.array([np.asarray(e, dtype=np.float64)
                  for e in df["embedding"]])
    q = _quantize(P, 18).astype(np.int64)
    half = np.array([int(_hl.md5(f"{i}|mmd".encode())
                         .hexdigest()[:16], 16) % 2 for i in ids])
    scale = float(1 << 18)
    mus, ns, msn = [], [], []
    for h in (0, 1):
        m = half == h
        sub = q[m]
        n = int(m.sum())
        s = [int(v) for v in sub.sum(axis=0)]
        sq = int((sub.astype(object) ** 2).sum())
        mus.append(np.array([float(v) for v in s]) / (n * scale))
        ns.append(n)
        msn.append(float(sq) / (n * scale * scale))
    gap = float(((mus[0] - mus[1]) ** 2).sum())
    return pd.DataFrame({
        "half": np.array([0, 1], dtype=np.int64),
        "n": np.array(ns, dtype=np.int64),
        "mean_sq_norm": _round_away(np.array(msn), 6),
        "mean_gap_sq": _round_away(np.array([gap, gap]), 6)})


# --------------------------------------------------------------------------
# round-5 fourth-session wave R: IVF nprobe sweep / reorder point
# --------------------------------------------------------------------------


IVF_SWEEP_PROBES = (1, 2, 4)


def q_embed_ivf_sweep(sf_dir: str):
    """IVF RECALL-vs-NPROBE SWEEP — the tuning curve an ANN deployment
    reads before fixing its probe budget: mean recall@10 at nprobe ∈
    {1,2,4} against one exact brute-force pass, all from the SAME
    cached centroid-partitioned index as embed_ivf_recall (probes read
    only nprobe partitions per query). Hits are exact ints; one closing
    division per sweep point."""
    import pyarrow.parquet as pq

    ds = read_table(f"{sf_dir}/embeddings.parquet",
                    columns=["vec_id", "embedding"])
    index_dir = "/tmp/pymhealth_ray_ivf/" + os.path.basename(
        os.path.normpath(sf_dir))
    with _build_lock(index_dir):
        ann.build_ivf_index(ds, index_dir, n_centroids=_RECALL_NCENT)

    full = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    queries = full.filter(pc.less(full["vec_id"], _RECALL_NQ))
    exact = ann.knn_bruteforce(ds, queries, k=_RECALL_K)

    def to_sets(tbl):
        out = {}
        for q, n in zip(tbl["query_id"].to_pylist(),
                        tbl["neighbor_id"].to_pylist()):
            out.setdefault(q, set()).add(n)
        return out

    e = to_sets(exact)
    qids = sorted(e)
    rows = []
    for nprobe in IVF_SWEEP_PROBES:
        approx = to_sets(ann.knn_ivf_partitioned(
            index_dir, queries, k=_RECALL_K, nprobe=nprobe))
        hits = int(sum(len(approx.get(q, set()) & e[q]) for q in qids))
        rows.append((nprobe, len(qids), hits))
    return pa.table({
        "nprobe": pa.array([r[0] for r in rows], type=pa.int64()),
        "n_queries": pa.array([r[1] for r in rows], type=pa.int64()),
        "total_hits": pa.array([r[2] for r in rows], type=pa.int64()),
        "recall": pa.array(_round_away(np.array(
            [r[2] / (r[1] * _RECALL_K) for r in rows]), 6))})


def _ivf_sweep_oracle(sf_dir: str) -> str:
    """Single-process replay of the sweep — the _ivf_recall_oracle loop
    per nprobe, aggregated."""
    import pyarrow.parquet as pq_mod

    name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/pymhealth_ray_fixtures/ivf_sweep_{name}_v1"
    out = os.path.join(out_dir, "expected.parquet")
    if not os.path.exists(out):
        os.makedirs(out_dir, exist_ok=True)
        from pymhealth_ray.stages.ann import _unit, train_ivf_centroids

        tbl = pq_mod.read_table(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
        ids = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
        emb = tbl["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        X = np.stack([np.asarray(r, dtype=np.float64)
                      for r in emb.to_pylist()])
        Xu = _unit(X)
        cent = train_ivf_centroids(X[:2048], _RECALL_NCENT)
        assign = np.argmax(Xu @ cent.T, axis=1)
        rows = []
        for nprobe in IVF_SWEEP_PROBES:
            hits = 0
            nq = 0
            for qid in ids[ids < _RECALL_NQ]:
                qi = int(np.flatnonzero(ids == qid)[0])
                sims = Xu @ Xu[qi]
                mask = ids != qid
                mi = np.flatnonzero(mask)
                order = np.lexsort((ids[mi], -sims[mi]))[:_RECALL_K]
                exact = set(ids[mi][order].tolist())
                probes = np.argsort(-(Xu[qi] @ cent.T))[:nprobe]
                cmask = mask & np.isin(assign, probes)
                ci = np.flatnonzero(cmask)
                order2 = np.lexsort((-ids[ci], -sims[ci]))[:_RECALL_K]
                approx = set(ids[ci][order2].tolist())
                hits += len(approx & exact)
                nq += 1
            rows.append((nprobe, nq, hits))
        exp = pa.table({
            "nprobe": pa.array([r[0] for r in rows], type=pa.int64()),
            "n_queries": pa.array([r[1] for r in rows],
                                  type=pa.int64()),
            "total_hits": pa.array([r[2] for r in rows],
                                   type=pa.int64()),
            "recall": pa.array(_round_away(np.array(
                [r[2] / (r[1] * _RECALL_K) for r in rows]), 6))})
        tmp = out + ".tmp"
        pq_mod.write_table(exp, tmp)
        os.replace(tmp, out)
    return f"SELECT * FROM read_parquet('{out}')"


ROP_LEAD_DAYS = 7
ROP_Z = 1.644854  # 95% service level


def q_part_reorder_point(sf_dir: str):
    """REORDER POINT per part — the inventory-planning closer of the
    Croston/XYZ family: over the part's active calendar span, daily
    demand mean and variance (zero days included — derivable from
    nonzero-day moments + the span, no calendar spine needed), then
    ROP = L·μ + z·sqrt(L·σ²) at lead time 7 d / 95% service. Exact
    int64 moments; one float expression per part in SQL op order."""
    from pymhealth_ray.stages.aggregate import keyed_sum

    li = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_partkey", "l_shipdate", "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        d = _epoch_days(b["l_shipdate"])
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        q = np.rint(b["l_quantity"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        key = pk * 1_000_000 + (d % 1_000_000)
        u, inv = np.unique(key, return_inverse=True)
        qs = np.bincount(inv, weights=q.astype(np.float64),
                         minlength=u.size).astype(np.int64)
        return pa.table({"key": pa.array(u.astype(np.int64)),
                         "q": pa.array(qs)})

    daily = keyed_sum(li.map_batches(partial, batch_format="pyarrow",
                                     batch_size=None),
                      "key", ["q"], num_buckets=NB, precombine_rows=None)

    def part_partial(b: pa.Table) -> pa.Table:
        key = b["key"].to_numpy(zero_copy_only=False)
        q = b["q"].to_numpy(zero_copy_only=False)
        p = key // 1_000_000
        d = key % 1_000_000
        u, inv = np.unique(p, return_inverse=True)
        mn = np.full(u.size, np.iinfo(np.int64).max, dtype=np.int64)
        mx = np.full(u.size, np.iinfo(np.int64).min, dtype=np.int64)
        np.minimum.at(mn, inv, d)
        np.maximum.at(mx, inv, d)
        return pa.table({
            "part": pa.array(u.astype(np.int64)),
            "s": pa.array(np.bincount(inv, weights=q.astype(np.float64),
                                      minlength=u.size).astype(np.int64)),
            "ss": pa.array(np.bincount(
                inv, weights=(q * q).astype(np.float64),
                minlength=u.size).astype(np.int64)),
            "dmin": pa.array(mn), "dmax": pa.array(mx)})

    from pymhealth_ray.stages.aggregate import grouped_stats

    rows = grouped_stats(daily.map_batches(part_partial,
                                           batch_format="pyarrow",
                                           batch_size=None),
                         ["part"], sum_cols=["s", "ss"],
                         min_cols=["dmin"], max_cols=["dmax"]).take_all()
    part = np.array([r["part"] for r in rows], dtype=np.int64)
    s = np.array([r["s_sum"] for r in rows], dtype=np.int64)
    ss = np.array([r["ss_sum"] for r in rows], dtype=np.int64)
    span = np.array([r["dmax_max"] - r["dmin_min"] + 1 for r in rows],
                    dtype=np.int64)
    o = np.argsort(part)
    part, s, ss, span = part[o], s[o], ss[o], span[o]
    mu = s.astype(np.float64) / span
    with np.errstate(invalid="ignore", divide="ignore"):
        var = (ss.astype(np.float64)
               - s.astype(np.float64) * s / span) / (span - 1)
        rop = ROP_LEAD_DAYS * mu + ROP_Z * np.sqrt(ROP_LEAD_DAYS * var)
    one = span < 2
    return pa.table({
        "p_partkey": pa.array(part),
        "span_days": pa.array(span),
        "mu_cents": pa.array(_round_away(mu, 6)),
        "var_cents": pa.array(_round_away(np.where(one, 0.0, var), 6),
                              mask=one),
        "reorder_cents": pa.array(
            _round_away(np.where(one, 0.0, rop), 6), mask=one)})


SQL_PART_REORDER_POINT = """
WITH l AS (
  SELECT l_partkey,
         datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS d,
         CAST(round(l_quantity * 100) AS BIGINT) AS qc
  FROM lineitem),
daily AS (SELECT l_partkey, d, CAST(sum(qc) AS BIGINT) AS q
          FROM l GROUP BY 1, 2),
m AS (SELECT l_partkey,
             CAST(sum(q) AS BIGINT) AS s, CAST(sum(q * q) AS BIGINT) AS ss,
             CAST(max(d) - min(d) + 1 AS BIGINT) AS span
      FROM daily GROUP BY 1),
f AS (SELECT l_partkey, span, CAST(s AS DOUBLE) / span AS mu,
             CASE WHEN span >= 2 THEN
               (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / span)
               / (span - 1) END AS var
      FROM m)
SELECT l_partkey AS p_partkey, span AS span_days,
       round(mu, 6) AS mu_cents, round(var, 6) AS var_cents,
       round(7 * mu + 1.644854 * sqrt(7 * var), 6) AS reorder_cents
FROM f
"""


# --------------------------------------------------------------------------
# round-5 fourth-session wave S: image norm stats / silhouette / SRM
# --------------------------------------------------------------------------


def q_docs_image_norm_stats(sf_dir: str):
    """CHANNEL NORMALIZATION CONSTANTS — the mean/std every vision
    training run computes over its corpus (the ImageNet-stats step):
    per-doc exact integer pixel sums off the real P5-PNM decode path,
    merged to corpus mean/std as python ints (overflow-free), one float
    finish. Per-doc rows carry the corpus constants for downstream
    map-side normalization."""
    from pymhealth_ray.stages.multimodal import _parse_pnm

    docs = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    media = docs.map_batches(_docs_pnm_table, batch_format="pyarrow")

    def partial(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        n = np.empty(len(ids), dtype=np.int64)
        s = np.empty(len(ids), dtype=np.int64)
        ss = np.empty(len(ids), dtype=np.int64)
        for i, p in enumerate(b["payload"].to_pylist()):
            pix = np.rint(_parse_pnm(p) * 255.0).astype(np.int64)
            n[i] = pix.size
            s[i] = int(pix.sum())
            ss[i] = int((pix * pix).sum())
        return pa.table({"doc_id": pa.array(ids.astype(np.int64)),
                         "n_pix": pa.array(n), "sum_pix": pa.array(s),
                         "sumsq_pix": pa.array(ss)})

    rows = media.map_batches(partial, batch_format="pyarrow",
                             batch_size=None).take_all()
    rows.sort(key=lambda r: r["doc_id"])
    N = sum(int(r["n_pix"]) for r in rows)
    S = sum(int(r["sum_pix"]) for r in rows)
    SS = sum(int(r["sumsq_pix"]) for r in rows)
    mean = float(S) / N
    std = float(np.sqrt(float(N * SS - S * S)) / N)
    k = len(rows)
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.int64()),
        "n_pix": pa.array([r["n_pix"] for r in rows], type=pa.int64()),
        "sum_pix": pa.array([r["sum_pix"] for r in rows],
                            type=pa.int64()),
        "sumsq_pix": pa.array([r["sumsq_pix"] for r in rows],
                              type=pa.int64()),
        "corpus_mean": pa.array(_round_away(np.full(k, mean), 6)),
        "corpus_std": pa.array(_round_away(np.full(k, std), 6))})


def _image_norm_expected(df):
    import pandas as pd

    from pymhealth_ray.stages.multimodal import _parse_pnm

    ids = sorted(int(v) for v in df["doc_id"])
    rows = []
    for i in ids:
        p, _, _ = _synth_pnm(i)
        pix = np.rint(_parse_pnm(p) * 255.0).astype(np.int64)
        rows.append((i, int(pix.size), int(pix.sum()),
                     int((pix * pix).sum())))
    N = sum(r[1] for r in rows)
    S = sum(r[2] for r in rows)
    SS = sum(r[3] for r in rows)
    mean = float(S) / N
    std = float(np.sqrt(float(N * SS - S * S)) / N)
    return pd.DataFrame({
        "doc_id": np.array([r[0] for r in rows], dtype=np.int64),
        "n_pix": np.array([r[1] for r in rows], dtype=np.int64),
        "sum_pix": np.array([r[2] for r in rows], dtype=np.int64),
        "sumsq_pix": np.array([r[3] for r in rows], dtype=np.int64),
        "corpus_mean": _round_away(np.full(len(rows), mean), 6),
        "corpus_std": _round_away(np.full(len(rows), std), 6)})


def q_embed_silhouette_lite(sf_dir: str):
    """CLASS-SEPARATION AUDIT (silhouette-lite): per label, the mean
    squared distance to its own centroid (intra — from the exact
    integer scatter: E||x−μ||² = trace(SS)/n − ||μ||²) versus the
    squared distance to the NEAREST other centroid (inter). ratio > 1
    means classes separate. One label_scatter_partials pass; the float
    finish is shared verbatim with the oracle."""
    from pymhealth_ray.stages.pca import (label_scatter_partials,
                                          merge_label_scatter)

    emb = read_table(f"{sf_dir}/embeddings.parquet",
                     columns=["vec_id", "embedding", "label"])
    stats = merge_label_scatter(label_scatter_partials(emb).take_all())
    return pa.Table.from_pandas(_silhouette_finish(stats),
                                preserve_index=False)


def _silhouette_finish(stats: dict):
    import pandas as pd

    labels = sorted(stats)
    scale = float(1 << 18)
    mus, intra, ns = [], [], []
    for lv in labels:
        n, s, ss = stats[lv]
        d = len(s)
        mu = np.array([float(v) for v in s]) / (n * scale)
        tr = float(sum(int(ss[j * d + j]) for j in range(d)))
        e2 = tr / (n * scale * scale)
        intra.append(e2 - float((mu * mu).sum()))
        mus.append(mu)
        ns.append(n)
    M = np.stack(mus)
    nearest, inter = [], []
    for i in range(len(labels)):
        d2 = ((M - M[i]) ** 2).sum(axis=1)
        d2[i] = np.inf
        j = int(np.argmin(d2))  # first min → smallest label on ties
        nearest.append(labels[j])
        inter.append(float(d2[j]))
    intra_a = np.array(intra)
    inter_a = np.array(inter)
    return pd.DataFrame({
        "label": np.array(labels, dtype=np.int64),
        "n": np.array(ns, dtype=np.int64),
        "intra_msd": _round_away(intra_a, 6),
        "nearest_label": np.array(nearest, dtype=np.int64),
        "inter_sq": _round_away(inter_a, 6),
        "separation": _round_away(inter_a / intra_a, 6)})


def _silhouette_expected(df):
    from pymhealth_ray.stages.pca import _quantize

    labs = df["label"].to_numpy().astype(np.int64)
    P = np.array([np.asarray(e, dtype=np.float64) for e in df["embedding"]])
    q = _quantize(P, 18).astype(np.int64)
    stats = {}
    for lv in np.unique(labs):
        m = labs == lv
        sub = q[m]
        s = [int(v) for v in sub.sum(axis=0)]
        ss = [int(v) for v in
              (sub.T.astype(object) @ sub.astype(object)).ravel()]
        stats[int(lv)] = (int(m.sum()), s, ss)
    return _silhouette_finish(stats)


def q_events_ab_srm(sf_dir: str):
    """SAMPLE-RATIO-MISMATCH GUARD — the first check any experiment
    readout runs: chi-square statistic of the two md5 arms' sizes
    against the designed 50/50 split (a big value means the assignment
    or logging pipeline is broken and every downstream readout is
    void). Counts exact; one float expression."""
    from pymhealth_ray.stages.aggregate import grouped_stats
    from pymhealth_ray.stages.sketch import _md5_u64

    ev = _events(sf_dir, ["user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        keys = pc.binary_join_element_wise(
            pc.cast(b["user_id"], pa.string()), "arm", "|")
        arm = (_md5_u64(keys) % np.uint64(2)).astype(np.int64)
        return pa.table({"arm": pa.array(arm),
                         "one": pa.array(np.ones(b.num_rows,
                                                 dtype=np.int64))})

    st = grouped_stats(ev.map_batches(prep, batch_format="pyarrow"),
                       ["arm"], sum_cols=["one"]).take_all()
    by = {int(r["arm"]): int(r["one_sum"]) for r in st}
    n0, n1 = by.get(0, 0), by.get(1, 0)
    e = (n0 + n1) / 2.0
    chi2 = (n0 - e) * (n0 - e) / e + (n1 - e) * (n1 - e) / e
    return pa.table({
        "n_arm0": pa.array([n0], type=pa.int64()),
        "n_arm1": pa.array([n1], type=pa.int64()),
        "srm_chi2": pa.array(_round_away(np.array([chi2]), 6))})


SQL_EVENTS_AB_SRM = """
WITH e AS (SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)
                        || '|arm'), 1, 16))::UBIGINT % 2 AS BIGINT) AS arm
           FROM events),
a AS (SELECT arm, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY arm),
w AS (SELECT max(CASE WHEN arm = 0 THEN n END) AS n0,
             max(CASE WHEN arm = 1 THEN n END) AS n1 FROM a)
SELECT n0 AS n_arm0, n1 AS n_arm1,
       round((n0 - (n0 + n1) / 2.0) * (n0 - (n0 + n1) / 2.0)
             / ((n0 + n1) / 2.0)
             + (n1 - (n0 + n1) / 2.0) * (n1 - (n0 + n1) / 2.0)
               / ((n0 + n1) / 2.0), 6) AS srm_chi2
FROM w
"""


# --------------------------------------------------------------------------
# round-5 fourth-session wave T: rolling retention / entropy rate
# --------------------------------------------------------------------------


def q_events_rolling_retention(sf_dir: str):
    """7-DAY ROLLING RETENTION — the product-health curve: of the users
    active on day d, the share also active on day d+7. Distinct
    (user, day) pairs dedupe per block and co-locate by USER (one
    exchange); each user's sorted day list emits (d, retained?) votes
    map-side, so the per-day rollup is a bounded keyed_sum. Counts
    exact; one division per day."""
    from pymhealth_ray.stages.aggregate import keyed_sum
    from pymhealth_ray.stages.partition import grouped_by_bucket

    DAY_US = 86_400_000_000
    ev = _events(sf_dir, ["user_id", "ts"])

    def pairs(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        d = b["ts_us"].to_numpy(zero_copy_only=False) // DAY_US
        pk = u * 1_000_000 + (d % 1_000_000)
        return pa.table({"pk": pa.array(np.unique(pk).astype(np.int64))})

    def per_bucket(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"d": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "ret": pa.array([], type=pa.int64())})
        pk = np.unique(tbl["pk"].to_numpy(zero_copy_only=False))
        u = pk // 1_000_000
        d = pk % 1_000_000
        # sorted (user, day); day d is retained iff (user, d+7) exists
        ret = np.zeros(len(pk), dtype=np.int64)
        idx = np.searchsorted(pk, pk + 7)
        ok = idx < len(pk)
        ret[ok] = (pk[idx[ok]] == pk[ok] + 7) & (u[idx[ok]] == u[ok])
        un, inv = np.unique(d, return_inverse=True)
        return pa.table({
            "d": pa.array(un.astype(np.int64)),
            "n": pa.array(np.bincount(inv, minlength=un.size)
                          .astype(np.int64)),
            "ret": pa.array(np.bincount(
                inv, weights=ret.astype(np.float64),
                minlength=un.size).astype(np.int64))})

    def add_user(b: pa.Table) -> pa.Table:
        return b.append_column(
            "user", pa.array(b["pk"].to_numpy(zero_copy_only=False)
                             // 1_000_000))

    votes = grouped_by_bucket(
        ev.map_batches(pairs, batch_format="pyarrow",
                       batch_size=None).map_batches(
            add_user, batch_format="pyarrow"),
        per_bucket, entity_col="user", num_buckets=NB)
    rows = keyed_sum(votes, "d", ["n", "ret"], num_buckets=NB,
                     precombine_rows=None).take_all()
    d = np.array([r["d"] for r in rows], dtype=np.int64)
    n = np.array([r["n"] for r in rows], dtype=np.int64)
    ret = np.array([r["ret"] for r in rows], dtype=np.int64)
    o = np.argsort(d)
    d, n, ret = d[o], n[o], ret[o]
    return pa.table({
        "day": pa.array(d), "n_active": pa.array(n),
        "n_retained": pa.array(ret),
        "retention": pa.array(_round_away(
            ret.astype(np.float64) / n.astype(np.float64), 6))})


SQL_EVENTS_ROLLING_RETENTION = """
WITH p AS (SELECT DISTINCT user_id,
                  epoch_us(ts) // 86400000000 AS d
           FROM events),
r AS (SELECT a.d, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN b.user_id IS NULL THEN 0 ELSE 1 END)
                  AS BIGINT) AS ret
      FROM p a LEFT JOIN p b
        ON b.user_id = a.user_id AND b.d = a.d + 7
      GROUP BY a.d)
SELECT CAST(d AS BIGINT) AS day, n AS n_active, ret AS n_retained,
       round(CAST(ret AS DOUBLE) / CAST(n AS DOUBLE), 6) AS retention
FROM r
"""


def q_seq_entropy_rate(sf_dir: str):
    """CORPUS ENTROPY RATE — the single-number predictability summary:
    bigram conditional entropy H(next|prev) = −Σ (c_ab/T)·ln(c_ab/c_a)
    plus the unigram entropy over pair-slot marginals, from the same
    dense pair matrix as the LM family. The float accumulation is
    pinned to ascending (a, b) key order and replayed identically by
    the oracle (counts exact, so both sides walk the same terms)."""
    from pymhealth_ray.stages.pmi import skipgram_pair_counts

    KM = 2048
    ds, _ = _seq_ds(sf_dir, ["doc_id", "ts_ns", "tokens"])
    pairs = skipgram_pair_counts(ds, "tokens", window=1, key_mult=KM)
    dense = np.zeros(KM * KM, dtype=np.int64)
    for b in pairs.iter_batches(batch_format="pyarrow"):
        k = b["key"].to_numpy(zero_copy_only=False)
        c = b["c"].to_numpy(zero_copy_only=False)
        dense[k] = c
    return pa.Table.from_pandas(_entropy_rate_finish(dense, KM),
                                preserve_index=False)


def _entropy_rate_finish(dense: np.ndarray, km: int):
    import pandas as pd

    mat = dense.reshape(km, km)
    ca = mat.sum(axis=1)
    T = float(dense.sum())
    nz = np.flatnonzero(dense)  # ascending (a, b) packed keys
    cab = dense[nz].astype(np.float64)
    caf = ca[nz // km].astype(np.float64)
    h_cond = float(-np.sum((cab / T) * np.log(cab / caf)))
    anz = np.flatnonzero(ca)
    pa_ = ca[anz].astype(np.float64) / T
    h_uni = float(-np.sum(pa_ * np.log(pa_)))
    return pd.DataFrame({
        "n_pair_slots": np.array([int(T)], dtype=np.int64),
        "n_bigram_types": np.array([len(nz)], dtype=np.int64),
        "h_unigram": _round_away(np.array([h_uni]), 6),
        "h_conditional": _round_away(np.array([h_cond]), 6),
        "info_gain": _round_away(np.array([h_uni - h_cond]), 6)})


def _entropy_rate_expected(src: pa.Table):
    """Single-process replay over the sequences fixture."""
    KM = 2048
    toks = src["tokens"]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    dense = np.zeros(KM * KM, dtype=np.int64)
    for row in toks.to_pylist():
        for x, y in zip(row, row[1:]):
            dense[x * KM + y] += 1
    return _entropy_rate_finish(dense, KM)
