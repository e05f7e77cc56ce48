"""Tests for ordered per-group collection, inverted index, and categorical
encoding (stages/collect.py, stages/index.py, stages/encode.py)."""

import hashlib
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pytest
import ray

from pymhealth_ray.stages.collect import grouped_ordered_collect
from pymhealth_ray.stages.encode import (build_encoding, category_stats,
                                         frequency_target_encode)
from pymhealth_ray.stages.index import inverted_index


def _events_frame(n=400, users=17, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, users, n).astype(np.int64),
        # coarse ts on purpose: plenty of ties to exercise the tiebreak
        "ts": rng.integers(0, 50, n).astype(np.int64),
        "event_type": rng.choice(["a", "bb", "ccc", "d"], n),
    })


class TestOrderedCollect:
    def test_matches_single_process_and_partition_invariant(self, ray_session):
        df = _events_frame()
        outs = []
        for blocks in (1, 7):
            out = (grouped_ordered_collect(
                       ray.data.from_pandas(df).repartition(blocks),
                       "user_id", "ts", "event_type",
                       tiebreak_col="event_id", num_buckets=5, keep_seq=True)
                   .to_pandas().sort_values("user_id")
                   .reset_index(drop=True))
            outs.append(out)
        pd.testing.assert_frame_equal(outs[0], outs[1])

        exp = df.sort_values(["user_id", "ts", "event_id"])
        for uid, g in exp.groupby("user_id"):
            r = outs[0][outs[0].user_id == uid].iloc[0]
            seq = ",".join(g.event_type)
            assert r.seq == seq
            assert r.seq_md5 == hashlib.md5(seq.encode()).hexdigest()
            assert r.n == len(g)
            assert r.n_distinct == g.event_type.nunique()
            assert r.first_ord == g.ts.iloc[0]
            assert r.last_ord == g.ts.iloc[-1]


class TestInvertedIndex:
    def test_exact_postings(self, ray_session):
        docs = ["a b a c", "b b d", "a d d", "c", "a b"]
        df = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64),
                           "text": docs})
        out = (inverted_index(ray.data.from_pandas(df).repartition(3),
                              min_df=1, num_buckets=4)
               .to_pandas().sort_values("term").reset_index(drop=True))
        postings = defaultdict(list)
        tf_tot = Counter()
        for i, t in enumerate(docs):
            c = Counter(t.split(" "))
            for w, n in c.items():
                postings[w].append(i)
                tf_tot[w] += n
        assert set(out.term) == set(postings)
        for _, r in out.iterrows():
            plist = sorted(postings[r.term])
            s = ",".join(str(x) for x in plist)
            assert r.df == len(plist)
            assert r.tf == tf_tot[r.term]
            assert r.postings_md5 == hashlib.md5(s.encode()).hexdigest()
            assert r.first_docs == ",".join(str(x) for x in plist[:5])

    def test_min_df_filter(self, ray_session):
        df = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                           "text": ["x y", "x", "x z", "y"]})
        out = (inverted_index(ray.data.from_pandas(df), min_df=2,
                              num_buckets=2).to_pandas())
        assert set(out.term) == {"x", "y"}


class TestEncode:
    def test_stats_and_encoding_order(self, ray_session):
        df = pd.DataFrame({
            "cat": ["hi"] * 5 + ["lo"] * 2 + ["mid"] * 5 + ["solo"],
            "price": [1.25] * 5 + [2.50] * 2 + [0.75] * 5 + [9.99],
        })
        ds = ray.data.from_pandas(df).repartition(3)
        stats = category_stats(ds, "cat", "price")
        assert stats["hi"] == (5, 625)
        assert stats["solo"] == (1, 999)
        enc = build_encoding(stats)
        # ties on count=5 broken by category name: "hi" before "mid"
        assert enc["hi"][0] == 1 and enc["mid"][0] == 2
        assert enc["lo"][0] == 3 and enc["solo"][0] == 4

    def test_end_to_end_means_exact(self, ray_session):
        rng = np.random.default_rng(11)
        cats = rng.choice(["p1", "p2", "p3"], 300)
        cents = rng.integers(0, 100000, 300)
        df = pd.DataFrame({"k": np.arange(300, dtype=np.int64),
                           "cat": cats, "price": cents / 100.0})
        out = (frequency_target_encode(
                   ray.data.from_pandas(df).repartition(4), "cat", "price")
               .to_pandas().sort_values("k").reset_index(drop=True))
        for c in ["p1", "p2", "p3"]:
            mask = df.cat == c
            exp_mean = np.int64(cents[mask.values].sum()) / np.float64(
                100 * mask.sum())
            got = out[out.cat == c]
            assert (got.cat_n == mask.sum()).all()
            assert (got.cat_target_mean == exp_mean).all()
