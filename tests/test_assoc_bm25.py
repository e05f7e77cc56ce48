"""Tests for item co-occurrence (stages/assoc.py), BM25 retrieval
(stages/bm25.py), and the jsonl source (sources/io.read_jsonl)."""

import itertools
import json
from collections import Counter

import numpy as np
import pandas as pd
import ray

from pymhealth_ray.sources.io import read_jsonl
from pymhealth_ray.stages.assoc import item_pair_counts
from pymhealth_ray.stages.bm25 import bm25_topk


class TestItemPairs:
    def test_matches_single_process(self, ray_session):
        rng = np.random.default_rng(9)
        n = 600
        df = pd.DataFrame({
            "user_id": rng.integers(0, 40, n).astype(np.int64),
            "event_type": rng.choice(["click", "view", "buy", "share"], n),
        })
        out = (item_pair_counts(ray.data.from_pandas(df).repartition(5),
                                "user_id", "event_type", num_buckets=7)
               .to_pandas().sort_values(["ta", "tb"]).reset_index(drop=True))

        per_user = df.groupby("user_id").event_type.agg(lambda s: frozenset(s))
        n_users = len(per_user)
        item_c = Counter()
        pair_c = Counter()
        for types in per_user:
            item_c.update(types)
            for a, b in itertools.combinations(sorted(types), 2):
                pair_c[(a, b)] += 1
        assert len(out) == len(pair_c)
        for _, r in out.iterrows():
            assert r.cab == pair_c[(r.ta, r.tb)]
            assert r.ca == item_c[r.ta]
            assert r.cb == item_c[r.tb]
            assert r.n_groups == n_users
            assert r.lift == np.float64(n_users * r.cab) / (r.ca * r.cb)

    def test_partition_invariant(self, ray_session):
        df = pd.DataFrame({
            "user_id": np.array([1, 1, 1, 2, 2, 3], dtype=np.int64),
            "event_type": ["a", "b", "a", "b", "c", "a"],
        })
        outs = []
        for blocks in (1, 4):
            outs.append(item_pair_counts(
                ray.data.from_pandas(df).repartition(blocks),
                "user_id", "event_type", num_buckets=3)
                .to_pandas().sort_values(["ta", "tb"])
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])
        ab = outs[0][(outs[0].ta == "a") & (outs[0].tb == "b")].iloc[0]
        assert ab.cab == 1 and ab.ca == 2 and ab.cb == 2 and ab.n_groups == 3


class TestBM25:
    def _expected(self, docs, terms, k):
        tok = [[w for w in t.split(" ") if w] for t in docs]
        n = len(docs)
        avgdl = sum(len(t) for t in tok) / np.float64(n)
        df = {q: sum(1 for t in tok if q in t) for q in terms}
        idf = {q: np.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1)
               for q in terms}
        rows = []
        for i, t in enumerate(tok):
            c = Counter(t)
            s = 0.0
            for q in terms:
                tf = c[q]
                s += idf[q] * ((tf * 2.5) / (tf + 1.5 * (0.25 + 0.75 * (len(t) / avgdl))))
            if s > 0:
                m = 10.0**6
                rows.append((i, np.sign(s) * np.floor(abs(s) * m + 0.5) / m))
        rows.sort(key=lambda r: (-r[1], r[0]))
        return rows[:k]

    def test_matches_single_process(self, ray_session):
        rng = np.random.default_rng(31)
        vocab = ["red", "green", "blue", "cyan", "teal"]
        docs = [" ".join(rng.choice(vocab, rng.integers(2, 15)))
                for _ in range(120)]
        df = pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64),
                           "text": docs})
        got = bm25_topk(ray.data.from_pandas(df).repartition(6),
                        ["red", "teal"], k=10).to_pandas()
        exp = self._expected(docs, ["red", "teal"], 10)
        assert got.doc_id.tolist() == [e[0] for e in exp]
        assert got.score.tolist() == [e[1] for e in exp]
        assert got.rn.tolist() == list(range(1, len(exp) + 1))

    def test_absent_term_scores_nothing(self, ray_session):
        df = pd.DataFrame({"doc_id": [0, 1], "text": ["x y", "y z"]})
        got = bm25_topk(ray.data.from_pandas(df), ["absent"], k=5)
        assert got.num_rows == 0


class TestJsonlSource:
    def test_roundtrip(self, ray_session, tmp_path):
        rows = [{"doc_id": i, "text": f"doc {i} body", "extra": i * 2}
                for i in range(50)]
        p = tmp_path / "docs.jsonl"
        p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
        ds = read_jsonl(str(p), columns=["doc_id", "text"])
        out = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert list(out.columns) == ["doc_id", "text"]
        assert out.doc_id.tolist() == list(range(50))
        assert out.text.iloc[7] == "doc 7 body"
