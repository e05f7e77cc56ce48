"""BPE merge training / application (stages/bpe.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from pymhealth_ray.stages.bpe import _apply_merge, apply_bpe, bpe_train


def _ds(lists, blocks=4):
    tbl = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(len(lists))]),
        "tokens": pa.array(lists, type=pa.list_(pa.int32())),
    })
    return ray.data.from_arrow(tbl).repartition(blocks)


class TestApplyMerge:
    def test_nonoverlapping_left_to_right(self):
        # aaa with merge (a,a): only the FIRST pair merges
        flat = np.array([7, 7, 7], dtype=np.int64)
        offs = np.array([0, 3], dtype=np.int64)
        out, o2 = _apply_merge(flat, offs, 7, 7, 99)
        assert out.tolist() == [99, 7] and o2.tolist() == [0, 2]
        # aaaa: two merges
        out, o2 = _apply_merge(np.array([7, 7, 7, 7], dtype=np.int64),
                               np.array([0, 4], dtype=np.int64), 7, 7, 99)
        assert out.tolist() == [99, 99] and o2.tolist() == [0, 2]

    def test_no_cross_row_merge(self):
        flat = np.array([1, 2, 1, 2], dtype=np.int64)
        offs = np.array([0, 2, 4], dtype=np.int64)  # rows [1,2] and [1,2]
        out, o2 = _apply_merge(flat, offs, 2, 1, 99)  # (2,1) only ACROSS rows
        assert out.tolist() == [1, 2, 1, 2] and o2.tolist() == [0, 2, 4]

    def test_offsets_shift(self):
        flat = np.array([1, 2, 5, 1, 2], dtype=np.int64)
        offs = np.array([0, 3, 5], dtype=np.int64)
        out, o2 = _apply_merge(flat, offs, 1, 2, 9)
        assert out.tolist() == [9, 5, 9] and o2.tolist() == [0, 2, 3]


class TestBpeTrain:
    def test_known_corpus(self, ray_session):
        # (1,2) appears 5x, (2,3) 3x after merge competition
        lists = [[1, 2, 3], [1, 2, 3], [1, 2, 3], [1, 2], [1, 2], [4, 5]]
        m = bpe_train(_ds(lists), n_merges=2, base_vocab=100)
        assert m.iloc[0][["a", "b", "new_id", "count"]].tolist() == [1, 2, 100, 5]
        # after merging (1,2)->100: rows become [100,3]x3 -> (100,3) 3x
        assert m.iloc[1][["a", "b", "new_id", "count"]].tolist() == [100, 3, 101, 3]

    def test_early_stop_min_count(self, ray_session):
        lists = [[1, 2], [3, 4]]  # every pair occurs once
        m = bpe_train(_ds(lists, 2), n_merges=4, base_vocab=100, min_count=2)
        assert len(m) == 0

    def test_partition_invariant(self, ray_session):
        rng = np.random.default_rng(13)
        lists = [rng.integers(0, 6, rng.integers(2, 30)).tolist()
                 for _ in range(300)]
        ms = [bpe_train(_ds(lists, b), n_merges=6, base_vocab=64)
              for b in (1, 9)]
        pd.testing.assert_frame_equal(ms[0], ms[1])
        assert len(ms[0]) == 6

    def test_apply_roundtrip_lengths(self, ray_session):
        rng = np.random.default_rng(14)
        lists = [rng.integers(0, 4, rng.integers(2, 20)).tolist()
                 for _ in range(200)]
        ds = _ds(lists, 5)
        merges = bpe_train(ds, n_merges=4, base_vocab=64)
        out = (apply_bpe(ds, merges, "tokens", out_col="bpe")
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        # sequential single-process replication per row
        mlist = [(int(r.a), int(r.b), int(r.new_id))
                 for r in merges.itertuples()]
        for i, row in out.sort_values("doc_id").iterrows():
            toks = lists[int(row.doc_id[1:])]
            seq = list(toks)
            for a, b, nid in mlist:
                res, j = [], 0
                while j < len(seq):
                    if j + 1 < len(seq) and seq[j] == a and seq[j + 1] == b:
                        res.append(nid)
                        j += 2
                    else:
                        res.append(seq[j])
                        j += 1
                seq = res
            assert list(row.bpe) == seq
            assert row.bpe_len == len(seq)
