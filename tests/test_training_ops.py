"""Tests for the training-data operators: dedup, text analysis, ANN,
multimodal plumbing, partial aggregation, rolling windows, lineage/resume."""

import hashlib
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from pymhealth_ray.stages import ann, dedup, multimodal, text
from pymhealth_ray.stages.aggregate import grouped_stats
from pymhealth_ray.stages.rolling import rolling_count_windows
from pymhealth_ray.functions import windows as W


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    return ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    return ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet")


class TestText:
    def test_token_counts_match_python(self, docs_ds):
        out = text.token_counts(docs_ds.limit(50)).to_pandas()
        for _, r in out.iterrows():
            assert r.n_ws_tokens == len(r.text.split())
            assert r.n_chars_utf8 == len(r.text)

    def test_content_hashes(self, docs_ds):
        out = text.content_hashes(docs_ds.limit(20)).to_pandas()
        for _, r in out.iterrows():
            assert r.md5 == hashlib.md5(r.text.encode()).hexdigest()

    def test_language_id_deterministic(self, docs_ds):
        a = text.language_id(docs_ds.limit(50)).to_pandas().sort_values("doc_id")
        b = text.language_id(docs_ds.limit(50)).to_pandas().sort_values("doc_id")
        assert (a.lang_pred.values == b.lang_pred.values).all()


class TestDedup:
    def test_exact_dedup_keeps_min_id(self, ray_session):
        tbl = pa.table({"doc_id": pa.array([5, 3, 9, 1], type=pa.int64()),
                        "text": ["a", "a", "b", "b"]})
        out = dedup.exact_dedup(ray.data.from_arrow(tbl)).to_pandas().sort_values("doc_id")
        assert out.doc_id.tolist() == [1, 3]
        assert out.n_dups.tolist() == [2, 2]

    def test_minhash_finds_near_duplicates(self, ray_session):
        base = "the quick brown fox jumps over the lazy dog " * 8
        near = base.replace("lazy", "sleepy")
        far = "completely different content about database engines " * 8
        tbl = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                        "text": [base, near, far]})
        pairs = dedup.minhash_lsh_dupes(ray.data.from_arrow(tbl), jaccard_threshold=0.5).to_pandas()
        assert {(1, 2)} == set(zip(pairs.id_a, pairs.id_b))
        # exact jaccard verifier agrees
        assert dedup.ngram_jaccard(base, near) > 0.5
        assert dedup.ngram_jaccard(base, far) < 0.1

    def test_simhash_near_vs_far(self, ray_session):
        base = "alpha beta gamma delta epsilon zeta eta theta " * 6
        near = base.replace("zeta", "zeta2")
        far = "one two three four five six seven eight nine ten " * 6
        tbl = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                        "text": [base, near, far]})
        out = dedup.simhash_signatures(ray.data.from_arrow(tbl)).to_pandas().set_index("doc_id")
        h = lambda a, b: bin(np.uint64(out.simhash[a]) ^ np.uint64(out.simhash[b])).count("1")
        assert h(1, 2) < h(1, 3)

    def test_embedding_dupes_detects_clones(self, ray_session):
        rng = np.random.default_rng(0)
        vecs = rng.normal(size=(20, 16))
        vecs[7] = vecs[3] + 1e-6  # near-clone
        tbl = pa.table({"vec_id": pa.array(np.arange(20)),
                        "embedding": pa.array([list(map(float, v)) for v in vecs])})
        out = dedup.embedding_dupes(ray.data.from_arrow(tbl), cos_threshold=0.999).to_pandas()
        assert (3, 7) in set(zip(out.id_a, out.id_b))


class TestANN:
    def test_bruteforce_matches_numpy(self, emb_ds):
        full = emb_ds.to_pandas()
        M = np.stack(full.embedding.to_list()).astype(np.float64)
        Mu = M / np.linalg.norm(M, axis=1, keepdims=True)
        q = pa.table({"vec_id": pa.array(full.vec_id[:5]), "embedding": pa.array(list(full.embedding[:5]))})
        got = ann.knn_bruteforce(emb_ds, q, k=3).to_pandas()
        for qi in range(5):
            sims = Mu @ Mu[qi]
            sims[qi] = -np.inf
            exp = set(full.vec_id.values[np.argsort(-sims)[:3]])
            assert set(got[got.query_id == qi].neighbor_id) == exp

    def test_ivf_recall_reasonable(self, emb_ds):
        full = emb_ds.to_pandas()
        q = pa.table({"vec_id": pa.array(full.vec_id[:5]), "embedding": pa.array(list(full.embedding[:5]))})
        bf = ann.knn_bruteforce(emb_ds, q, k=5).to_pandas()
        iv = ann.knn_ivf(emb_ds, q, k=5, n_centroids=8, nprobe=4).to_pandas()
        rec = np.mean([
            len(set(bf[bf.query_id == qq].neighbor_id) & set(iv[iv.query_id == qq].neighbor_id)) / 5
            for qq in bf.query_id.unique()
        ])
        assert rec >= 0.4  # approximate by design; brute force is the baseline


class TestMultimodal:
    def test_decode_plumbing(self, ray_session):
        media = ray.data.from_arrow(multimodal.synth_media_table(16))
        out = multimodal.decode_images(media, decoder="fake", thumb=4).to_pandas()
        assert len(out) == 16
        assert all(len(v) == 16 for v in out.thumb_vec)
        assert "payload" not in out.columns  # heavy bytes dropped after decode

    def test_real_decoder_stubbed_for_unknown_formats(self):
        dec = multimodal.ImageDecoder(decoder="real")
        if dec._pil is None:  # without PIL only PNM payloads decode
            with pytest.raises(NotImplementedError):
                dec._decode(b"xx", 4, 4)

    def test_real_image_decode_pnm(self, ray_session):
        """The REAL decode path end-to-end through the actor-pool stage,
        using binary PGM/PPM payloads (pure-numpy parser; no PIL needed)."""
        import pyarrow as pa

        rng = np.random.default_rng(5)
        rows = []
        for i in range(6):
            w, h = int(rng.integers(8, 24)), int(rng.integers(8, 24))
            if i % 2:  # P5 grayscale
                raster = rng.integers(0, 256, w * h, dtype=np.uint8)
                payload = b"P5\n# cmt\n%d %d\n255\n" % (w, h) + raster.tobytes()
                exp_mean = raster.mean() / 255.0
            else:  # P6 RGB -> grayscale mean
                raster = rng.integers(0, 256, w * h * 3, dtype=np.uint8)
                payload = b"P6 %d %d 255\n" % (w, h) + raster.tobytes()
                exp_mean = raster.reshape(-1, 3).mean() / 255.0
            rows.append((i, payload, w, h, exp_mean))
        tbl = pa.table({
            "media_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "payload": pa.array([r[1] for r in rows], type=pa.binary()),
            "mime": pa.array(["image/x-portable-anymap"] * len(rows)),
            "width": pa.array([r[2] for r in rows], type=pa.int32()),
            "height": pa.array([r[3] for r in rows], type=pa.int32()),
        })
        out = (multimodal.decode_images(ray.data.from_arrow(tbl),
                                        decoder="real", thumb=4)
               .to_pandas().sort_values("media_id").reset_index(drop=True))
        for i, (_, _, _, _, exp_mean) in enumerate(rows):
            assert abs(out.pixel_mean[i] - exp_mean) < 1e-9

    def test_real_audio_decode_wav(self, ray_session):
        """REAL audio path: stdlib-wave PCM decode through the actor pool."""
        import io as _io
        import wave

        import pyarrow as pa

        rng = np.random.default_rng(7)
        payloads, expected = [], []
        for _ in range(4):
            samples = (rng.random(256) * 2 - 1)
            pcm = (samples * 32767).astype("<i2")
            buf = _io.BytesIO()
            with wave.open(buf, "wb") as wf:
                wf.setnchannels(1)
                wf.setsampwidth(2)
                wf.setframerate(8000)
                wf.writeframes(pcm.tobytes())
            payloads.append(buf.getvalue())
            expected.append((pcm.astype(np.float64) / 32768.0)[::4][:16])
        tbl = pa.table({
            "media_id": pa.array(np.arange(4), type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
        })
        out = (multimodal.sample_audio_frames(ray.data.from_arrow(tbl),
                                              decoder="real")
               .to_pandas().sort_values("media_id").reset_index(drop=True))
        for i in range(4):
            np.testing.assert_allclose(out.frame_feats[i], expected[i],
                                       rtol=0, atol=1e-6)

    def test_real_video_requires_pyav(self):
        pytest.importorskip("av", reason="PyAV not in this container")
        # with PyAV present, the sampler must construct without error
        multimodal.VideoFrameSampler(decoder="real")


class TestAggregate:
    def test_partial_agg_matches_pandas(self, sequences_ds, sequences_table):
        out = grouped_stats(sequences_ds, ["source"], sum_cols=["n_tok"],
                            min_cols=["n_tok"], max_cols=["n_tok"]).to_pandas()
        exp = sequences_table.to_pandas().groupby("source").n_tok.agg(["sum", "min", "max", "count"])
        got = out.set_index("source").sort_index()
        assert (got.n_tok_sum.values == exp["sum"].values).all()
        assert (got.n_tok_min.values == exp["min"].values).all()
        assert (got.n.values == exp["count"].values).all()


class TestRolling:
    def test_matches_rolling_apply_oracle(self, sequences_ds, sequences_table):
        out = rolling_count_windows(sequences_ds, "n_tok", wsize=7, wstep=3, num_buckets=8).to_pandas()
        df = sequences_table.to_pandas().sort_values(["doc_id", "ts_ns"])
        ra = W.rolling_apply(np.mean, 7, 3)
        for did, g in df.groupby("doc_id"):
            exp = ra(g.n_tok.values.astype(np.float64))
            got = out[out.doc_id == did].sort_values("window_idx").n_tok_mean.values
            assert len(got) == len(exp)
            assert np.allclose(got, exp)


class TestLineageResume:
    def test_failure_then_resume_completes(self, sequences_ds):
        from pymhealth_ray.state.lineage import read_manifests, resumable_write

        out = "/tmp/pymhealth_test_resume"
        shutil.rmtree(out, ignore_errors=True)
        with pytest.raises(Exception):
            resumable_write(sequences_ds, out, num_buckets=8, params={"v": 1}, fail_buckets={2, 5})
        partial = read_manifests(out)
        assert 0 < len(partial) < 8
        done = resumable_write(sequences_ds, out, num_buckets=8, params={"v": 1})
        assert len(done) == 8
        assert sum(m["rows"] for m in done.values()) == sequences_ds.count()
        # changed params invalidate the cache key → full rewrite required
        done2 = resumable_write(sequences_ds, out, num_buckets=8, params={"v": 2})
        assert all(m["params_hash"] == done2[0]["params_hash"] for m in done2.values())


class TestBucketedFlagship:
    def test_bucketed_equals_shuffle_path(self, sequences_ds):
        import pandas as pd

        from pymhealth_ray.pipelines.flagship import flagship_features, flagship_features_bucketed
        from pymhealth_ray.state.lineage import resumable_write

        layout = "/tmp/pymhealth_test_bucketed"
        shutil.rmtree(layout, ignore_errors=True)
        resumable_write(sequences_ds, layout, num_buckets=8, params={"v": 1})
        a = flagship_features(sequences_ds, num_buckets=8).to_pandas()
        b = flagship_features_bucketed(layout).to_pandas()
        key = ["doc_id", "ts_ns"]
        a = a.sort_values(key).reset_index(drop=True)
        b = b.sort_values(key).reset_index(drop=True)[a.columns]
        for c in a.columns:
            if a[c].dtype == object:
                assert (a[c] == b[c]).all(), c
            else:
                assert np.allclose(a[c].astype(float), b[c].astype(float), equal_nan=True), c


class TestFlagshipLeakage:
    def test_truncation_invariance(self, sequences_table):
        """Zero temporal leakage: flagship features for rows at ts <= T are
        identical whether or not data after T exists (FIXTURES.md F5)."""
        import pyarrow.compute as pc

        from pymhealth_ray.pipelines.flagship import flagship_features

        ts = sequences_table["ts_ns"].to_numpy()
        T = int(np.quantile(ts, 0.6))
        full = ray.data.from_arrow(sequences_table)
        trunc = ray.data.from_arrow(sequences_table.filter(pc.less_equal(sequences_table["ts_ns"], T)))
        a = flagship_features(full, num_buckets=8).to_pandas()
        b = flagship_features(trunc, num_buckets=8).to_pandas()
        a = a[a.ts_ns <= T].sort_values(["doc_id", "ts_ns"]).reset_index(drop=True)
        b = b.sort_values(["doc_id", "ts_ns"]).reset_index(drop=True)
        assert len(a) == len(b)
        for c in ("trail_mean", "trail_std", "trail_count", "sess_ref_mean", "sess_ref_end_ns",
                  "tok_mean_lag1", "tok_mean_diff1", "session_id"):
            av = a[c].astype(float).values
            bv = b[c].astype(float).values
            assert np.allclose(av, bv, equal_nan=True, atol=1e-9), c


class TestResumeByteIdentical:
    def test_resumed_output_equals_clean_run(self, sequences_ds):
        import glob

        import pyarrow.parquet as pq

        from pymhealth_ray.state.lineage import resumable_write

        clean, resumed = "/tmp/pmr_clean_out", "/tmp/pmr_resumed_out"
        for d in (clean, resumed):
            shutil.rmtree(d, ignore_errors=True)
        resumable_write(sequences_ds, clean, num_buckets=6, params={"v": 1})
        with pytest.raises(Exception):
            resumable_write(sequences_ds, resumed, num_buckets=6, params={"v": 1}, fail_buckets={4})
        resumable_write(sequences_ds, resumed, num_buckets=6, params={"v": 1})
        for part in sorted(glob.glob(clean + "/part=*")):
            b = part.replace(clean, resumed)
            ta = pq.read_table(part + "/data.parquet")
            tb = pq.read_table(b + "/data.parquet")
            ka = ta.sort_by([("doc_id", "ascending"), ("ts_ns", "ascending")])
            kb = tb.sort_by([("doc_id", "ascending"), ("ts_ns", "ascending")])
            assert ka.equals(kb)


class TestFlagshipPartitionInvariance:
    def test_same_result_across_buckets_and_blocks(self, sequences_table):
        from pymhealth_ray.pipelines.flagship import flagship_features

        ref = None
        rng = np.random.default_rng(9)
        perm = rng.permutation(sequences_table.num_rows)
        shuffled = sequences_table.take(pa.array(perm))
        for tbl, blocks, buckets in [(sequences_table, 1, 4), (sequences_table, 13, 16), (shuffled, 5, 7)]:
            ds = ray.data.from_arrow(tbl).repartition(blocks)
            out = flagship_features(ds, num_buckets=buckets).to_pandas()
            out = out.sort_values(["doc_id", "ts_ns"]).reset_index(drop=True)
            if ref is None:
                ref = out
                continue
            assert len(out) == len(ref)
            for c in ref.columns:
                if ref[c].dtype == object:
                    assert (out[c] == ref[c]).all(), c
                else:
                    assert np.allclose(out[c].astype(float), ref[c].astype(float),
                                       equal_nan=True, atol=1e-9), c


class TestFeaturizedLayout:
    def test_featurize_then_bucket_path(self, sequences_ds):
        from pymhealth_ray.pipelines.flagship import (
            featurize_then_bucket,
            flagship_features,
            flagship_features_bucketed,
        )

        layout = "/tmp/pmr_test_featurized"
        shutil.rmtree(layout, ignore_errors=True)
        featurize_then_bucket(sequences_ds, layout, num_buckets=8)
        a = flagship_features(sequences_ds, num_buckets=8).to_pandas()
        b = flagship_features_bucketed(layout).to_pandas()
        a = a.sort_values(["doc_id", "ts_ns"]).reset_index(drop=True)
        b = b.sort_values(["doc_id", "ts_ns"]).reset_index(drop=True)[a.columns]
        assert len(a) == len(b)
        for c in a.columns:
            if a[c].dtype == object:
                assert (a[c] == b[c]).all(), c
            else:
                # trailing-window stds carry a ~1e-9 cumsum error floor across
                # different bucket partitionings (extended-precision cumsums)
                assert np.allclose(a[c].astype(float), b[c].astype(float),
                                   equal_nan=True, atol=1e-8), c


class TestEquiJoin:
    def test_inner_and_outer_match_pandas(self, ray_session):
        import pandas as pd

        from pymhealth_ray.stages.join import equi_join

        left = pa.table({"k": pa.array([1, 2, 2, 3, 5], type=pa.int64()),
                         "a": pa.array([10, 20, 21, 30, 50], type=pa.int64())})
        right = pa.table({"k": pa.array([2, 3, 3, 4], type=pa.int64()),
                          "b": pa.array([200, 300, 301, 400], type=pa.int64())})
        for how, jt in [("inner", "inner"), ("left", "left outer")]:
            got = equi_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                            on="k", join_type=jt, num_buckets=4).to_pandas()
            exp = left.to_pandas().merge(right.to_pandas(), on="k", how=how)
            got = got.sort_values(["k", "a", "b"], na_position="last").reset_index(drop=True)
            exp = exp.sort_values(["k", "a", "b"], na_position="last").reset_index(drop=True)
            assert len(got) == len(exp), how
            assert (got.k.values == exp.k.values).all()
            assert np.allclose(got.b.astype(float).values, exp.b.astype(float).values, equal_nan=True)


class TestDedupScaleSafety:
    """Round-2 hardening: bounded LSH buckets, vectorized SimHash/FNV
    equivalence with the scalar reference semantics."""

    def test_degenerate_band_bucket_is_capped(self, ray_session):
        # 60 identical docs (one degenerate band key) + 2 distinct near-dups:
        # with max_bucket_size=16 the degenerate bucket emits only C(16,2)
        # pairs, while the independent near-dup pair is still found.
        boiler = "terms and conditions apply to all users of this site " * 6
        base = "the quick brown fox jumps over the lazy dog " * 8
        near = base.replace("lazy", "sleepy")
        ids = list(range(100, 160)) + [1, 2]
        texts = [boiler] * 60 + [base, near]
        tbl = pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": texts})
        pairs = dedup.minhash_lsh_dupes(
            ray.data.from_arrow(tbl), jaccard_threshold=0.5, max_bucket_size=16
        ).to_pandas()
        got = set(zip(pairs.id_a, pairs.id_b))
        assert (1, 2) in got
        boiler_pairs = [(a, b) for a, b in got if a >= 100]
        # capped: at most C(16,2) pairs from the degenerate bucket
        assert 0 < len(boiler_pairs) <= 16 * 15 // 2

    def test_capped_equals_uncapped_on_clean_corpus(self, ray_session):
        rng = np.random.default_rng(7)
        vocab = np.array([f"w{i:04d}q" for i in range(500)])
        texts = [" ".join(rng.choice(vocab, 40)) for _ in range(30)]
        texts += [texts[0] + " tail", texts[5] + " extra"]
        tbl = pa.table({"doc_id": pa.array(range(32), type=pa.int64()), "text": texts})
        a = dedup.minhash_lsh_dupes(ray.data.from_arrow(tbl), jaccard_threshold=0.6,
                                    max_bucket_size=512).to_pandas()
        b = dedup.minhash_lsh_dupes(ray.data.from_arrow(tbl), jaccard_threshold=0.6,
                                    max_bucket_size=8).to_pandas()
        ka = sorted(zip(a.id_a, a.id_b, a.est_jaccard.round(9)))
        kb = sorted(zip(b.id_a, b.id_b, b.est_jaccard.round(9)))
        assert ka == kb  # no bucket exceeds the small cap on a clean corpus

    def test_simhash_matches_scalar_reference(self, ray_session):
        def scalar_simhash(t: str) -> np.uint64:
            masks = np.uint64(1) << np.arange(64, dtype=np.uint64)
            acc = np.zeros(64, dtype=np.int64)
            for w in t.split():
                h = np.uint64(int(hashlib.md5(w.encode()).hexdigest()[:16], 16))
                acc += 2 * ((h & masks) != 0).astype(np.int64) - 1
            return np.uint64(((acc > 0).astype(np.uint64) * masks).sum())

        texts = ["the quick brown fox", "", "a a a b", "unicode café touché",
                 "repeated words words words and more words"]
        tbl = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                        "text": texts})
        out = dedup.simhash_signatures(ray.data.from_arrow(tbl)).to_pandas().set_index("doc_id")
        for i, t in enumerate(texts):
            assert np.uint64(out.simhash[i]) == scalar_simhash(t), repr(t)

    def test_fnv_batch_matches_scalar(self):
        payloads = [b"", b"a", b"hello world", bytes(range(256)), b"x" * 1000]
        got = text._fnv1a64_batch(payloads)
        for p, g in zip(payloads, got):
            assert int(g) == text._fnv1a64(p)


class TestSaltedEquiJoin:
    def _mk(self, ray_session):
        rng = np.random.default_rng(11)
        # Zipf-hot left: key 1 owns ~half the rows
        keys = rng.zipf(1.3, 4000).astype(np.int64)
        keys = np.clip(keys, 1, 50)
        left = pa.table({"k": pa.array(keys),
                         "a": pa.array(np.arange(len(keys), dtype=np.int64))})
        right = pa.table({"k": pa.array(np.arange(1, 41, dtype=np.int64)),
                          "b": pa.array(np.arange(1, 41, dtype=np.int64) * 100)})
        return left, right

    def test_salted_matches_pandas_inner_and_left(self, ray_session):
        from pymhealth_ray.stages.join import equi_join_salted

        left, right = self._mk(ray_session)
        for how, jt in [("inner", "inner"), ("left", "left outer")]:
            got = equi_join_salted(
                ray.data.from_arrow(left), ray.data.from_arrow(right),
                on="k", join_type=jt, hot_threshold=200, num_buckets=8,
            ).to_pandas().sort_values(["k", "a"]).reset_index(drop=True)
            exp = left.to_pandas().merge(right.to_pandas(), on="k", how=how) \
                .sort_values(["k", "a"]).reset_index(drop=True)
            assert len(got) == len(exp), how
            assert (got.k.values == exp.k.values).all()
            assert (got.a.values == exp.a.values).all()
            assert np.allclose(got.b.astype(float).values,
                               exp.b.astype(float).values, equal_nan=True)

    def test_explicit_hot_keys_and_detection_agree(self, ray_session):
        from pymhealth_ray.stages.join import detect_hot_keys, equi_join_salted

        left, right = self._mk(ray_session)
        lds = ray.data.from_arrow(left)
        hot = detect_hot_keys(lds, "k", 200)
        assert 1 in hot and len(hot) < 10  # Zipf head only
        a = equi_join_salted(lds, ray.data.from_arrow(right), on="k",
                             hot_keys=hot, num_buckets=8).to_pandas()
        b = equi_join_salted(ray.data.from_arrow(left), ray.data.from_arrow(right),
                             on="k", hot_threshold=200, num_buckets=8).to_pandas()
        ka = sorted(zip(a.k, a.a))
        kb = sorted(zip(b.k, b.a))
        assert ka == kb


class TestIVFPartitioned:
    @pytest.fixture(scope="class")
    def index_dir(self, emb_ds):
        d = "/tmp/pymhealth_test_ivf_index"
        shutil.rmtree(d, ignore_errors=True)
        ann.build_ivf_index(emb_ds, d, n_centroids=8)
        return d

    def test_probe_reads_at_most_nprobe_partitions(self, index_dir):
        paths = ann.ivf_probe_paths(index_dir, [0, 3, 5])
        assert len(paths) <= 3
        assert all("part=" in p and p.endswith("data.parquet") for p in paths)
        # full partition inventory is larger than any probe
        import pathlib
        all_parts = list(pathlib.Path(index_dir).glob("part=*/data.parquet"))
        assert len(all_parts) > 3

    def test_partitioned_matches_inmemory_ivf(self, emb_ds, index_dir):
        full = emb_ds.to_pandas()
        q = pa.table({"vec_id": pa.array(full.vec_id[:5]),
                      "embedding": pa.array(list(full.embedding[:5]))})
        a = ann.knn_ivf(emb_ds, q, k=5, n_centroids=8, nprobe=4).to_pandas()
        b = ann.knn_ivf_partitioned(index_dir, q, k=5, nprobe=4).to_pandas()
        ka = sorted(zip(a.query_id, a.neighbor_id, a.cosine.round(9)))
        kb = sorted(zip(b.query_id, b.neighbor_id, b.cosine.round(9)))
        assert ka == kb  # same centroids (seeded) -> identical probe results

    def test_partitioned_recall_vs_bruteforce(self, emb_ds, index_dir):
        full = emb_ds.to_pandas()
        q = pa.table({"vec_id": pa.array(full.vec_id[:5]),
                      "embedding": pa.array(list(full.embedding[:5]))})
        bf = ann.knn_bruteforce(emb_ds, q, k=5).to_pandas()
        iv = ann.knn_ivf_partitioned(index_dir, q, k=5, nprobe=4).to_pandas()
        rec = np.mean([
            len(set(bf[bf.query_id == qq].neighbor_id) & set(iv[iv.query_id == qq].neighbor_id)) / 5
            for qq in bf.query_id.unique()
        ])
        assert rec >= 0.4

    def test_build_is_resumable(self, emb_ds, index_dir):
        # second build with same params skips all partitions (manifests match)
        from pymhealth_ray.state.lineage import read_manifests
        before = read_manifests(index_dir)
        ann.build_ivf_index(emb_ds, index_dir, n_centroids=8)
        after = read_manifests(index_dir)
        assert before.keys() == after.keys()
        assert all(before[b]["rows"] == after[b]["rows"] for b in before)


class TestHaversineDBSCAN:
    """Round-2 density-clustering stand-in for reference cluster_locations
    (reference:location/distribution.py:42-55)."""

    def test_golden_two_sites_and_noise(self):
        from pymhealth_ray.functions import location as L

        # 6 points at site A (~within 50m), 4 at site B (5km away), 1 lone
        lat = np.array([51.5000, 51.50015, 51.50030, 51.49985, 51.50005, 51.50020,
                        51.5450, 51.54515, 51.54530, 51.54485,
                        51.6000])
        lon = np.array([-0.1000, -0.10015, -0.09985, -0.10020, -0.10005, -0.09990,
                        -0.1000, -0.10015, -0.09985, -0.10020,
                        -0.2000])
        labels = L.haversine_dbscan(lat, lon, eps_km=0.1, min_samples=3)
        assert labels.tolist() == [0, 0, 0, 0, 0, 0, 1, 1, 1, 1, -1]
        assert L.num_clusters(labels) == 3        # includes noise label
        assert L.cluster_totals(labels) == {-1: 1, 0: 6, 1: 4}
        assert L.cluster_entropy(labels) > 0

    def test_grid_matches_bruteforce_random(self):
        from pymhealth_ray.functions import location as L

        rng = np.random.default_rng(3)
        for trial in range(8):
            n = int(rng.integers(5, 120))
            # clumps + scatter around a city
            centers = rng.uniform([51.3, -0.3], [51.7, 0.1], size=(4, 2))
            pts = []
            for _ in range(n):
                c = centers[rng.integers(0, 4)]
                pts.append(c + rng.normal(scale=2e-4, size=2) * rng.integers(1, 4))
            pts = np.asarray(pts)
            for eps_km, ms in [(0.05, 3), (0.1, None), (0.3, 5)]:
                got = L.haversine_dbscan(pts[:, 0], pts[:, 1], eps_km, ms)
                exp = L._dbscan_bruteforce(
                    pts[:, 0], pts[:, 1], eps_km,
                    ms if ms is not None else 1 + n // 20)
                assert got.tolist() == exp.tolist(), (trial, eps_km, ms)

    def test_min_samples_reference_default(self):
        from pymhealth_ray.functions import location as L

        # 100 co-located points: default min_samples = 1 + 100//20 = 6 → core
        lat = np.full(100, 40.0) + np.linspace(0, 1e-4, 100)
        lon = np.full(100, -3.0)
        labels = L.haversine_dbscan(lat, lon, eps_km=0.1)
        assert (labels == 0).all()

    def test_stage_matches_kernel(self, ray_session):
        from pymhealth_ray.functions import location as L
        from pymhealth_ray.stages.geo import cluster_features_stage, cluster_locations_stage

        rng = np.random.default_rng(9)
        rows = []
        for uid in range(6):
            base = np.array([45.0 + uid * 0.5, 7.0])
            for i in range(40):
                site = base + (i % 3) * np.array([0.05, 0.05])
                p = site + rng.normal(scale=1.5e-4, size=2)
                rows.append((f"u{uid}", i, p[0], p[1]))
        tbl = pa.table({
            "user_id": pa.array([r[0] for r in rows]),
            "ts": pa.array([r[1] for r in rows], type=pa.int64()),
            "lat": pa.array([r[2] for r in rows]),
            "lon": pa.array([r[3] for r in rows]),
        })
        out = cluster_locations_stage(
            ray.data.from_arrow(tbl), eps_km=0.1, min_samples=3, num_buckets=4
        ).to_pandas().sort_values(["user_id", "ts"])
        feats = cluster_features_stage(
            ray.data.from_arrow(tbl), eps_km=0.1, min_samples=3, num_buckets=4
        ).to_pandas().set_index("user_id")
        df = tbl.to_pandas()
        for uid, g in df.groupby("user_id"):
            g = g.sort_values("ts")
            exp = L.haversine_dbscan(g.lat.values, g.lon.values, 0.1, 3)
            got = out[out.user_id == uid].cluster.values
            assert got.tolist() == exp.tolist(), uid
            assert feats.loc[uid, "n_clusters"] == (np.unique(exp) >= 0).sum()
            assert feats.loc[uid, "n_points"] == len(g)


class TestSegmentedSearchsorted:
    def test_matches_per_entity_searchsorted(self):
        from pymhealth_ray.stages.partition import segmented_searchsorted

        rng = np.random.default_rng(21)
        for trial in range(6):
            n_ent = int(rng.integers(1, 30))
            hay_parts, q_parts, hs, qs = [], [], [0], [0]
            for _ in range(n_ent):
                h = np.sort(rng.integers(-10**12, 10**12, rng.integers(0, 50)))
                q = rng.integers(-2 * 10**12, 2 * 10**12, rng.integers(0, 40))
                hay_parts.append(h); q_parts.append(q)
                hs.append(hs[-1] + len(h)); qs.append(qs[-1] + len(q))
            hay = np.concatenate(hay_parts) if hay_parts else np.array([], dtype=np.int64)
            q = np.concatenate(q_parts) if q_parts else np.array([], dtype=np.int64)
            hay = hay.astype(np.int64); q = q.astype(np.int64)
            hs = np.asarray(hs, dtype=np.int64); qs = np.asarray(qs, dtype=np.int64)
            for side in ("left", "right"):
                got = segmented_searchsorted(hay, hs, q, qs, side)
                exp = np.empty(len(q), dtype=np.int64)
                for k in range(n_ent):
                    exp[qs[k]:qs[k + 1]] = hs[k] + np.searchsorted(
                        hay[hs[k]:hs[k + 1]], q[qs[k]:qs[k + 1]], side=side)
                assert (got == exp).all(), (trial, side)

    def test_chunking_path(self):
        # force tiny chunks by a huge value span: B ~ 2^61 → chunk == 2
        from pymhealth_ray.stages.partition import segmented_searchsorted

        hay = np.array([0, 2**60, 0, 2**60, 0, 2**60], dtype=np.int64)
        hs = np.array([0, 2, 4, 6], dtype=np.int64)
        q = np.array([1, 2**60, -5], dtype=np.int64)
        qs = np.array([0, 1, 2, 3], dtype=np.int64)
        got = segmented_searchsorted(hay, hs, q, qs, "left")
        assert got.tolist() == [1, 3, 4]


class TestMinhashVerifyPaths:
    def test_broadcast_and_join_paths_agree(self, ray_session):
        base = "the quick brown fox jumps over the lazy dog " * 8
        near = base.replace("lazy", "sleepy")
        far = "completely different content about database engines " * 8
        also = far.replace("database", "storage")
        tbl = pa.table({"doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                        "text": [base, near, far, also]})
        a = dedup.minhash_lsh_dupes(ray.data.from_arrow(tbl), jaccard_threshold=0.5).to_pandas()
        b = dedup.minhash_lsh_dupes(ray.data.from_arrow(tbl), jaccard_threshold=0.5,
                                    broadcast_pairs_threshold=0).to_pandas()
        ka = sorted(zip(a.id_a, a.id_b, a.est_jaccard.round(9)))
        kb = sorted(zip(b.id_a, b.id_b, b.est_jaccard.round(9)))
        assert ka == kb and len(ka) >= 2


class TestMultimodalRound2:
    def test_video_frame_explode(self, ray_session):
        media = ray.data.from_arrow(multimodal.synth_media_table(8))
        out = multimodal.sample_video_frames(media, frame_stride=8, max_frames=4).to_pandas()
        assert len(out) >= 8  # ≥1 frame per clip
        assert set(out.columns) == {"media_id", "frame_idx", "frame_vec"}
        assert (out.frame_idx % 8 == 0).all()
        assert out.groupby("media_id").size().max() <= 4
        # deterministic across runs
        out2 = multimodal.sample_video_frames(media, frame_stride=8, max_frames=4).to_pandas()
        a = out.sort_values(["media_id", "frame_idx"]).frame_vec.to_list()
        b = out2.sort_values(["media_id", "frame_idx"]).frame_vec.to_list()
        assert all(np.array_equal(x, y) for x, y in zip(a, b))

    def test_video_real_decoder_stubbed(self):
        s = multimodal.VideoFrameSampler(decoder="real")
        with pytest.raises(NotImplementedError):
            s._decode_frame(b"xx", 0)

    def test_decode_then_embed_chain(self, ray_session):
        media = ray.data.from_arrow(multimodal.synth_media_table(16))
        thumbs = multimodal.decode_images(media, decoder="fake", thumb=4)
        emb = multimodal.embed_thumbnails(thumbs, in_dim=16, out_dim=8).to_pandas()
        assert len(emb) == 16
        assert all(len(v) == 8 for v in emb.embedding)
        assert "thumb_vec" not in emb.columns


class TestGroupedTopK:
    @staticmethod
    def _pandas_topk(df, k, descending):
        import pandas as pd
        asc = [not descending, True]
        out = (
            df.sort_values(["v", "i"], ascending=asc)
            .groupby(["g1", "g2"], sort=False)
            .head(k)
            .copy()
        )
        out["rn"] = out.groupby(["g1", "g2"], sort=False).cumcount() + 1
        return out.sort_values(["g1", "g2", "rn"]).reset_index(drop=True)

    @pytest.mark.parametrize("descending", [True, False])
    @pytest.mark.parametrize("blocks", [1, 7])
    def test_matches_pandas(self, ray_session, descending, blocks):
        import pandas as pd
        from pymhealth_ray.stages.aggregate import grouped_topk

        rng = np.random.default_rng(11)
        df = pd.DataFrame({
            "g1": rng.choice(["a", "b", "c"], 500),
            "g2": rng.integers(0, 5, 500),
            "v": rng.integers(0, 40, 500),  # plenty of ties
            "i": np.arange(500),
        })
        ds = ray.data.from_pandas(df).repartition(blocks)
        got = (
            grouped_topk(ds, ["g1", "g2"], "v", k=4, descending=descending,
                         tie_cols=["i"], rank_name="rn", num_buckets=8)
            .to_pandas()
            .sort_values(["g1", "g2", "rn"])
            .reset_index(drop=True)
        )
        want = self._pandas_topk(df, 4, descending)
        pd.testing.assert_frame_equal(
            got[["g1", "g2", "v", "i", "rn"]].astype({"g2": "int64", "rn": "int64"}),
            want[["g1", "g2", "v", "i", "rn"]].astype({"g2": "int64", "rn": "int64"}),
            check_dtype=False,
        )

    def test_k_larger_than_group(self, ray_session):
        import pandas as pd
        from pymhealth_ray.stages.aggregate import grouped_topk

        df = pd.DataFrame({"g1": ["x", "x", "y"], "g2": [0, 0, 0],
                           "v": [3, 1, 2], "i": [0, 1, 2]})
        got = grouped_topk(ray.data.from_pandas(df), ["g1", "g2"], "v", k=10,
                           tie_cols=["i"], rank_name="rn").to_pandas()
        assert len(got) == 3
        assert got.sort_values(["g1", "rn"]).rn.tolist() == [1, 2, 1]


class TestGroupedQuantiles:
    def test_matches_duckdb_randomized(self, ray_session):
        import duckdb
        import pandas as pd
        from pymhealth_ray.stages.aggregate import grouped_quantiles

        rng = np.random.default_rng(5)
        df = pd.DataFrame({
            "g": rng.choice(["a", "b", "c", "d"], 800),
            "v": rng.integers(0, 30, 800),
        })
        qs = (0.1, 0.25, 0.5, 2 / 3, 0.9)
        got = (
            grouped_quantiles(ray.data.from_pandas(df).repartition(5), ["g"], "v",
                              qs=qs, num_buckets=4)
            .to_pandas().sort_values("g").reset_index(drop=True)
        )
        con = duckdb.connect()
        cols = ", ".join(
            f"quantile_disc(v, {q!r}) AS q{int(round(q*100))}" for q in qs
        )
        want = con.execute(
            f"SELECT g, {cols}, count(*) AS n FROM df GROUP BY g ORDER BY g"
        ).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_block_count_invariant(self, ray_session):
        import pandas as pd
        from pymhealth_ray.stages.aggregate import grouped_quantiles

        rng = np.random.default_rng(6)
        df = pd.DataFrame({"g": rng.choice(["x", "y"], 300),
                           "v": rng.integers(0, 10, 300)})
        outs = []
        for blocks in (1, 9):
            outs.append(
                grouped_quantiles(ray.data.from_pandas(df).repartition(blocks),
                                  ["g"], "v", num_buckets=8)
                .to_pandas().sort_values("g").reset_index(drop=True)
            )
        pd.testing.assert_frame_equal(outs[0], outs[1])


class TestHLLSketch:
    def test_accuracy_and_partition_invariance(self, ray_session):
        import pandas as pd
        from pymhealth_ray.stages import sketch

        rng = np.random.default_rng(3)
        # two groups with known distinct cardinalities (with repeats)
        a_vals = rng.integers(0, 5000, 12000)   # ~4546 distinct expected
        b_vals = rng.integers(0, 300, 3000)
        df = pd.DataFrame({
            "g": ["a"] * len(a_vals) + ["b"] * len(b_vals),
            "v": np.concatenate([a_vals, b_vals]),
        })
        outs = []
        for blocks in (1, 11):
            out = (
                sketch.grouped_approx_distinct(
                    ray.data.from_pandas(df).repartition(blocks), ["g"], "v")
                .to_pandas().sort_values("g").reset_index(drop=True)
            )
            outs.append(out)
        pd.testing.assert_frame_equal(outs[0], outs[1])  # bit-identical merge
        exact = df.groupby("g").v.nunique()
        for _, r in outs[0].iterrows():
            assert abs(r.approx_distinct - exact[r.g]) / exact[r.g] < 0.05
        assert outs[0].n_rows.sum() == len(df)

    def test_matches_single_process_reference(self, ray_session):
        import pandas as pd
        from pymhealth_ray.stages import sketch

        rng = np.random.default_rng(4)
        df = pd.DataFrame({
            "g": rng.choice(["x", "y", "z"], 4000),
            "v": rng.choice([f"tok{i}" for i in range(900)], 4000),
        })
        got = (
            sketch.grouped_approx_distinct(
                ray.data.from_pandas(df).repartition(7), ["g"], "v")
            .to_pandas().sort_values("g").reset_index(drop=True)
        )
        want = sketch.hll_expected(df.v.values, df.g.values).sort_values("g").reset_index(drop=True)
        assert got.g.tolist() == want.g.tolist()
        assert np.array_equal(got.approx_distinct.values, want.est.values)
        assert np.array_equal(got.n_rows.values, want.n.values)


class TestHashSample:
    def test_deterministic_and_partition_invariant(self, ray_session):
        import pandas as pd
        from pymhealth_ray.stages.sample import hash_sample, split_train_eval

        df = pd.DataFrame({"k": np.arange(5000), "x": np.arange(5000) * 2})
        outs = []
        for blocks in (1, 13):
            ds = ray.data.from_pandas(df).repartition(blocks)
            outs.append(hash_sample(ds, "k", 0.3, salt="t")
                        .to_pandas().sort_values("k").reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])
        # fraction converges (binomial: 5000 draws, p=0.3 -> +-2%)
        assert abs(len(outs[0]) / 5000 - 0.3) < 0.02
        # split is exhaustive + disjoint and consistent per key
        sp = split_train_eval(ray.data.from_pandas(df), "k", 0.1, salt="t").to_pandas()
        assert set(sp.split.unique()) <= {"train", "eval"}
        assert len(sp) == 5000
        assert abs((sp.split == "eval").mean() - 0.1) < 0.02

    def test_matches_sql_predicate(self, ray_session):
        import duckdb
        import pandas as pd
        from pymhealth_ray.stages.sample import hash_sample

        df = pd.DataFrame({"k": np.arange(2000)})
        got = hash_sample(ray.data.from_pandas(df), "k", 0.25, salt="z") \
            .to_pandas().sort_values("k").reset_index(drop=True)
        con = duckdb.connect()
        want = con.execute(
            "SELECT k FROM df WHERE substr(md5(CAST(k AS VARCHAR) || '-z'),1,8) < '40000000' ORDER BY k"
        ).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestVocabulary:
    def test_counts_match_python(self, ray_session):
        import collections
        import pandas as pd
        from pymhealth_ray.stages.vocab import token_vocabulary, top_tokens

        texts = ["a b b  c", "b c d", "", "a a   a", "d e"]
        want = collections.Counter()
        for t in texts:
            want.update(tok for tok in t.split(" ") if tok)
        ds = ray.data.from_pandas(pd.DataFrame({"text": texts})).repartition(3)
        got = token_vocabulary(ds, num_buckets=4).to_pandas()
        assert dict(zip(got.tok, got.c)) == dict(want)
        top = top_tokens(ds, k=3, num_buckets=4).to_pandas().sort_values("rn")
        expect = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        assert list(zip(top.tok, top.c)) == expect
        assert top.rn.tolist() == [1, 2, 3]

    def test_ngram_codes_respect_row_boundaries(self):
        from pymhealth_ray.stages.vocab import _ngram_codes

        rows = [[1, 2, 3], [4], [], [5, 6]]
        arr = pa.array(rows, type=pa.list_(pa.int32()))
        codes = _ngram_codes(arr, 2)
        want = sorted([(1 << 32) | 2, (2 << 32) | 3, (5 << 32) | 6])
        assert sorted(codes.tolist()) == want
        # sliced array (non-zero offset) must give the same row-local grams
        codes_sl = _ngram_codes(arr.slice(1), 2)
        assert sorted(codes_sl.tolist()) == [(5 << 32) | 6]
        # trigrams: only the first row has one
        tri = _ngram_codes(arr, 3)
        assert tri.tolist() == [(1 << 42) | (2 << 21) | 3]

    def test_top_ngrams_matches_python(self, ray_session):
        import collections
        import pandas as pd

        rng = np.random.default_rng(17)
        rows = [rng.integers(0, 7, rng.integers(0, 12)).tolist()
                for _ in range(400)]
        want = collections.Counter()
        for r in rows:
            want.update(zip(r[:-1], r[1:]))
        df = pd.DataFrame({"tokens": rows})
        tbl = pa.table({"tokens": pa.array(rows, type=pa.list_(pa.int32()))})
        ds = ray.data.from_arrow(tbl).repartition(5)
        from pymhealth_ray.stages.vocab import top_ngrams

        top = top_ngrams(ds, n=2, k=10, num_buckets=4).to_pandas().sort_values("rn")
        expect = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        assert [((a, b), c) for a, b, c in zip(top.t1, top.t2, top.c)] == expect


class TestSequencePacking:
    def test_greedy_boundaries(self):
        from pymhealth_ray.stages.pack import greedy_boundaries

        b = greedy_boundaries(np.array([1000, 900, 200, 2048, 5000, 1, 1]), 2048)
        # [1000,900] [200] [2048] [5000 oversize alone] [1,1]
        assert b.tolist() == [0, 2, 3, 4, 5, 7]

    def test_partition_invariant_and_conserves_tokens(self, ray_session):
        import pandas as pd
        from pymhealth_ray.stages.pack import pack_sequences, pack_expected

        rng = np.random.default_rng(9)
        n = 3000
        df = pd.DataFrame({
            "doc_id": rng.integers(0, 40, n),
            "ts_ns": rng.integers(0, 10**9, n),
            "n_tok": rng.integers(0, 900, n),
        })
        outs = []
        for blocks in (1, 9):
            out = (
                pack_sequences(ray.data.from_pandas(df).repartition(blocks),
                               max_len=2048, num_buckets=8)
                .to_pandas().sort_values("pack_id").reset_index(drop=True)
            )
            outs.append(out)
        pd.testing.assert_frame_equal(outs[0], outs[1])
        assert outs[0].tok_total.sum() == df.n_tok.sum()
        assert outs[0].n_seqs.sum() == n
        assert (outs[0].tok_total[~outs[0].oversize] <= 2048).all()
        want = pack_expected(df.doc_id.values, df.ts_ns.values, df.n_tok.values,
                             max_len=2048, num_buckets=8)
        want = want.sort_values("pack_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(outs[0], want)

    def test_oversize_flagged(self, ray_session):
        import pandas as pd
        from pymhealth_ray.stages.pack import pack_sequences

        df = pd.DataFrame({"doc_id": [1, 1], "ts_ns": [0, 1],
                           "n_tok": [5000, 10]})
        out = pack_sequences(ray.data.from_pandas(df), max_len=2048,
                             num_buckets=2).to_pandas()
        assert out.oversize.sum() == 1 and len(out) == 2

    def test_length_histogram(self, ray_session):
        import pandas as pd
        from pymhealth_ray.stages.pack import length_histogram

        rng = np.random.default_rng(17)
        n = rng.integers(1, 5000, 4000)
        n[:5] = [1, 2, 4, 1024, 4096]          # exact powers of two
        n = np.concatenate([n, [0, 0]])        # zero lengths excluded
        df = pd.DataFrame({"n_tok": n})
        out = (length_histogram(ray.data.from_pandas(df).repartition(7))
               .to_pandas().sort_values("bucket").reset_index(drop=True))
        pos = n[n > 0]
        want_bucket = np.floor(np.log2(pos)).astype(np.int64)
        for _, r in out.iterrows():
            m = want_bucket == r.bucket
            assert r.n_seqs == m.sum()
            assert r.n_min == pos[m].min() and r.n_max == pos[m].max()
            assert r.pad_waste == ((1 << (int(r.bucket) + 1)) - pos[m]).sum()
        assert out.n_seqs.sum() == len(pos)


class TestConnectedComponents:
    @staticmethod
    def _uf(edges):
        parent = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        nodes = sorted({n for e in edges for n in e})
        return {n: find(n) for n in nodes}

    def test_random_graph_matches_union_find(self, ray_session):
        import pandas as pd
        from pymhealth_ray.stages.graph import connected_components

        rng = np.random.default_rng(13)
        edges = [tuple(sorted(map(int, rng.integers(0, 200, 2)))) for _ in range(250)]
        edges = [e for e in edges if e[0] != e[1]]
        df = pd.DataFrame(edges, columns=["a", "b"])
        got = (
            connected_components(ray.data.from_pandas(df).repartition(5),
                                 num_buckets=8)
            .to_pandas().sort_values("v").reset_index(drop=True)
        )
        want = self._uf(edges)
        assert dict(zip(got.v, got.l)) == want

    def test_long_chain_converges(self, ray_session):
        import pandas as pd
        from pymhealth_ray.stages.graph import connected_components

        # a path graph converges in O(log diameter) rounds only because of
        # the pointer-doubling step (plain propagation needs ~n rounds) —
        # 24 nodes = ~5 rounds, exercising shortcutting + the early exit
        df = pd.DataFrame({"a": np.arange(23) + 1, "b": np.arange(23) + 2})
        got = connected_components(ray.data.from_pandas(df), num_buckets=4,
                                   driver_threshold=0).to_pandas()
        assert (got.l == 1).all() and len(got) == 24


class TestGroupedSampleK:
    def test_deterministic_uniform_subset(self, ray_session):
        import pandas as pd
        from pymhealth_ray.stages.sample import grouped_sample_k

        df = pd.DataFrame({"g": np.repeat(["a", "b"], 500),
                           "k": np.arange(1000)})
        outs = []
        for blocks in (1, 8):
            outs.append(
                grouped_sample_k(ray.data.from_pandas(df).repartition(blocks),
                                 ["g"], "k", k=7, salt="t", num_buckets=4)
                .to_pandas().sort_values(["g", "rn"]).reset_index(drop=True)
            )
        pd.testing.assert_frame_equal(outs[0], outs[1])
        assert (outs[0].groupby("g").size() == 7).all()
        # samples come from the right groups
        assert (outs[0][outs[0].g == "a"].k < 500).all()
        assert (outs[0][outs[0].g == "b"].k >= 500).all()


class TestBloom:
    def test_no_false_negatives_and_fp_bounded(self, ray_session):
        import pandas as pd
        from pymhealth_ray.stages import bloom

        members = np.arange(0, 4000)
        non = np.arange(10_000, 30_000)
        dfm = pd.DataFrame({"k": members})
        bms = []
        for blocks in (1, 9):
            bms.append(bloom.build_bloom(
                ray.data.from_pandas(dfm).repartition(blocks), "k",
                n_bits=1 << 17, k=5))
        assert np.array_equal(bms[0], bms[1])  # order-free OR merge
        assert bloom.bloom_contains(bms[0], pa.array(members), 5).all()
        fp = bloom.bloom_contains(bms[0], pa.array(non), 5).mean()
        # m/n = 32 bits/key, k=5 -> theoretical FP ~0.04%; allow slack
        assert fp < 0.01

    def test_semi_and_anti_join(self, ray_session):
        import pandas as pd
        from pymhealth_ray.stages import bloom

        corpus = pd.DataFrame({"k": np.arange(500)})
        probe = pd.DataFrame({"k": np.arange(400, 900), "x": np.arange(500)})
        bm = bloom.build_bloom(ray.data.from_pandas(corpus), "k",
                               n_bits=1 << 16, k=5)
        ref = ray.put(bm)
        semi = bloom.filter_against_bloom(
            ray.data.from_pandas(probe), "k", ref, k=5,
            keep_members=True).to_pandas()
        anti = bloom.filter_against_bloom(
            ray.data.from_pandas(probe), "k", ref, k=5,
            keep_members=False).to_pandas()
        # all true members kept in semi; no true member leaks into anti
        assert set(range(400, 500)) <= set(semi.k)
        assert not (anti.k < 500).any()
        assert len(semi) + len(anti) == len(probe)


class TestDecontamination:
    def test_contaminated_doc_scores_high(self, ray_session):
        import pandas as pd
        from pymhealth_ray.stages.decontam import (build_shingle_bloom,
                                                   contamination_scores)

        train_text = "the training corpus contains this exact passage " * 10
        fresh = "entirely novel held out evaluation material here " * 10
        train = pd.DataFrame({"doc_id": [1, 2],
                              "text": [train_text, "other content " * 30]})
        evals = pd.DataFrame({"doc_id": [10, 11],
                              "text": [train_text, fresh]})
        bm = build_shingle_bloom(ray.data.from_pandas(train), n_bits=1 << 18)
        # distributed build == single-block build (order-free OR)
        bm2 = build_shingle_bloom(
            ray.data.from_pandas(train).repartition(2), n_bits=1 << 18)
        assert np.array_equal(bm, bm2)
        out = contamination_scores(ray.data.from_pandas(evals), ray.put(bm)) \
            .to_pandas().set_index("doc_id")
        assert out.contamination[10] == 1.0   # verbatim copy of a train doc
        assert out.contamination[11] < 0.1    # novel text: only FP hits


class TestProfile:
    def test_profile_matches_pandas(self, ray_session):
        import pandas as pd
        from pymhealth_ray.stages.profile import profile_table

        df = pd.DataFrame({
            "a": [1.5, None, 3.0, -2.0],
            "b": ["x", "aa", None, "zz"],
            "c": [1, 2, 3, 4],
        })
        out = profile_table(ray.data.from_pandas(df).repartition(3)) \
            .to_pandas().set_index("col")
        assert out.loc["a"].n_rows == 4 and out.loc["a"].n_null == 1
        assert out.loc["a"].min_num == -2.0 and out.loc["a"].max_num == 3.0
        assert out.loc["b"].min_str == "aa" and out.loc["b"].max_str == "zz"
        assert out.loc["b"].n_null == 1
        assert out.loc["c"].min_num == 1.0 and out.loc["c"].max_num == 4.0


class TestConnectedComponentsHybrid:
    def test_driver_fast_path_matches_distributed(self, ray_session):
        import pandas as pd
        from pymhealth_ray.stages.graph import connected_components

        rng = np.random.default_rng(17)
        edges = [tuple(sorted(map(int, rng.integers(0, 80, 2)))) for _ in range(90)]
        edges = [e for e in edges if e[0] != e[1]]
        df = pd.DataFrame(edges, columns=["a", "b"])
        fast = connected_components(ray.data.from_pandas(df)) \
            .to_pandas().sort_values("v").reset_index(drop=True)
        dist = connected_components(ray.data.from_pandas(df),
                                    driver_threshold=0, num_buckets=4) \
            .to_pandas().sort_values("v").reset_index(drop=True)
        pd.testing.assert_frame_equal(fast, dist)


class TestPrepPipeline:
    def test_invariants_at_sf0001(self, ray_session):
        from pymhealth_ray.pipelines.queries import q_docs_prep_pipeline
        import pyarrow.parquet as pq

        out = q_docs_prep_pipeline("/root/testdata/sf0.001").to_pandas()
        src = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                            columns=["doc_id", "text", "n_chars"]).to_pandas()
        # survivors are unique, from the source, and meet the quality bar
        assert out.doc_id.is_unique
        merged = out.merge(src, on="doc_id")
        assert len(merged) == len(out)
        assert (merged.n_chars >= 100).all()
        # packs respect the budget unless single-oversize
        per_pack = out.groupby(["split", "pack_id"]).est_tok.agg(["sum", "size"])
        bad = per_pack[(per_pack["sum"] > 2048) & (per_pack["size"] > 1)]
        assert len(bad) == 0
        assert set(out.split.unique()) <= {"train", "eval"}


class TestSimhashDupes:
    def test_complete_within_radius(self, ray_session):
        import pandas as pd
        from pymhealth_ray.stages.dedup import simhash_dupes, simhash_signatures, _POP8

        docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                                     columns=["doc_id", "text"])
        got = simhash_dupes(docs, max_hamming=3, num_bands=4, num_buckets=8) \
            .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        # brute-force reference over the same signatures
        sig = simhash_signatures(docs).to_pandas().sort_values("doc_id")
        s = sig.simhash.values.view(np.uint64)
        ids = sig.doc_id.values
        want = set()
        for i in range(len(s)):
            x = s[i] ^ s[i + 1:]
            h = _POP8[x.view(np.uint8).reshape(-1, 8)].sum(1)
            for j in np.flatnonzero(h <= 3):
                a, b = int(ids[i]), int(ids[i + 1 + j])
                want.add((min(a, b), max(a, b)))
        assert set(zip(got.id_a, got.id_b)) == want
        assert (got.hamming <= 3).all()


class TestRedact:
    def test_matches_python_re(self, ray_session):
        import re
        import pandas as pd
        from pymhealth_ray.stages.text import redact

        df = pd.DataFrame({"doc_id": [1, 2, 3],
                           "text": ["a spark b hash", "nothing here",
                                    "hash hash spark-spark"]})
        out = redact(ray.data.from_pandas(df), pattern=r"\b(spark|hash)\b",
                     replacement="<X>").to_pandas().sort_values("doc_id")
        for _, r in out.iterrows():
            src = df[df.doc_id == r.doc_id].text.iloc[0]
            assert r.redacted == re.sub(r"\b(spark|hash)\b", "<X>", src)
            assert r.n_redactions == len(re.findall(r"\b(spark|hash)\b", src))


class TestWeightedSample:
    def test_weighted_bias_and_determinism(self, ray_session):
        import pandas as pd
        from pymhealth_ray.stages.sample import grouped_weighted_sample_k

        n = 4000
        df = pd.DataFrame({
            "g": ["x"] * n,
            "key": np.arange(n),
            # half the rows carry 10x weight
            "w": np.where(np.arange(n) < n // 2, 10.0, 1.0),
        })
        outs = []
        for blocks in (1, 9):
            outs.append(
                grouped_weighted_sample_k(
                    ray.data.from_pandas(df).repartition(blocks), ["g"],
                    "key", "w", k=400, salt="t", num_buckets=4)
                .to_pandas().sort_values("rn").reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])
        heavy = (outs[0].key < n // 2).mean()
        # E[heavy fraction] ~ 10/11 = 0.91; binomial noise on 400 draws
        assert heavy > 0.8
        # zero/negative weights never sampled
        df.loc[0, "w"] = 0.0
        out = grouped_weighted_sample_k(ray.data.from_pandas(df), ["g"],
                                        "key", "w", k=n, salt="t").to_pandas()
        assert 0 not in set(out.key)


class TestCountMin:
    def test_one_sided_and_partition_invariant(self, ray_session):
        import duckdb
        import pandas as pd
        from pymhealth_ray.stages.sketch import build_count_min, count_min_estimate

        rng = np.random.default_rng(23)
        keys = rng.zipf(1.5, 20000) % 3000
        df = pd.DataFrame({"k": keys.astype(np.int64)})
        sketches = []
        for blocks in (1, 11):
            sketches.append(build_count_min(
                ray.data.from_pandas(df).repartition(blocks), "k",
                width=1 << 13, depth=4))
        assert np.array_equal(sketches[0], sketches[1])  # order-free + merge
        uniq, true = np.unique(df.k.values, return_counts=True)
        est = count_min_estimate(sketches[0], pa.array(uniq))
        assert (est >= true).all()                 # never undercounts
        assert (est - true).mean() < 0.01 * len(df)  # tight at this width


class TestShufflePositions:
    """Deterministic global shuffle: dense exact positions, layout
    invariance, and append-stability of the relative order."""

    def _ds(self, n, parts):
        ids = np.arange(n, dtype=np.int64) * 7 + 3
        return ray.data.from_arrow(pa.table({
            "doc_id": ids,
            "lang": pa.array([f"l{i % 3}" for i in range(n)]),
        })).repartition(parts), ids

    def test_exact_dense_positions(self):
        from pymhealth_ray.stages.shuffle import (shuffle_positions,
                                                  shuffle_positions_expected)

        ds, ids = self._ds(3000, 11)
        out = shuffle_positions(ds, "doc_id", salt="x", num_buckets=64,
                                extra_cols=["lang"]).to_pandas()
        out = out.sort_values("doc_id").reset_index(drop=True)
        exp = shuffle_positions_expected(sorted(ids.tolist()), salt="x")
        assert (out.pos.values == exp).all()
        assert sorted(out.pos.tolist()) == list(range(3000))

    def test_layout_invariance(self):
        from pymhealth_ray.stages.shuffle import shuffle_positions

        a, _ = self._ds(2000, 3)
        b, _ = self._ds(2000, 17)
        pa_ = shuffle_positions(a, "doc_id", num_buckets=16).to_pandas()
        pb = shuffle_positions(b, "doc_id", num_buckets=32).to_pandas()
        pa_ = pa_.sort_values("doc_id").reset_index(drop=True)
        pb = pb.sort_values("doc_id").reset_index(drop=True)
        assert (pa_.pos.values == pb.pos.values).all()

    def test_append_stability(self):
        # appending documents must keep the RELATIVE order of old ones
        from pymhealth_ray.stages.shuffle import shuffle_positions

        small, _ = self._ds(1000, 5)
        big, _ = self._ds(1500, 5)
        ps = shuffle_positions(small, "doc_id").to_pandas().sort_values("pos")
        pb = shuffle_positions(big, "doc_id").to_pandas()
        old = set(ps.doc_id)
        pb = pb[pb.doc_id.isin(old)].sort_values("pos")
        assert ps.doc_id.tolist() == pb.doc_id.tolist()


class TestGopherQuality:
    def test_signals_and_keep(self):
        from pymhealth_ray.stages.gopher import gopher_stats_table

        good = " ".join(["the quick brown fox jumps over that lazy dog"] * 10)
        docs = pa.table({
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": pa.array([
                good,                               # passes everything
                "",                                 # empty -> all zeros, drop
                "- a\n- b\n- c\n- a",               # bullet-heavy + dup line
                "one two three...",                 # too short + ellipsis
            ]),
        })
        out = gopher_stats_table(docs).to_pandas().set_index("doc_id")
        assert out.loc[1, "keep"] and out.loc[1, "n_words"] == 90
        assert out.loc[2, "n_words"] == 0 and not out.loc[2, "keep"]
        assert out.loc[3, "frac_lines_bullet"] == 1.0
        assert out.loc[3, "dup_line_frac"] == 0.25
        assert out.loc[4, "frac_lines_ellipsis"] == 1.0
        assert not out.loc[4, "keep"]

    def test_distributed_matches_pure(self):
        from pymhealth_ray.stages.gopher import gopher_quality, gopher_stats_table

        texts = [f"word{i} the be to of " * (i % 7 + 1) for i in range(500)]
        t = pa.table({"doc_id": pa.array(range(500), type=pa.int64()),
                      "text": pa.array(texts)})
        ds = ray.data.from_arrow(t).repartition(9)
        out = gopher_quality(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
        exp = gopher_stats_table(t).to_pandas()
        for c in exp.columns:
            assert (out[c].values == exp[c].values).all(), c


class TestChunking:
    def test_spans_and_sums_match_python(self, ray_session):
        import pandas as pd
        from pymhealth_ray.stages.chunk import chunk_tokens

        rng = np.random.default_rng(5)
        rows = [rng.integers(0, 1000, rng.integers(0, 40)).tolist()
                for _ in range(300)]
        tbl = pa.table({
            "doc_id": pa.array(range(300), type=pa.int64()),
            "ts_ns": pa.array([7] * 300, type=pa.int64()),
            "tokens": pa.array(rows, type=pa.list_(pa.int32())),
        })
        ds = ray.data.from_arrow(tbl).repartition(4)
        got = chunk_tokens(ds, max_len=8, stride=5, emit_tokens=True)
        df = got.to_pandas().sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
        want = []
        for did, r in enumerate(rows):
            s = 0
            cid = 0
            while s < len(r):
                ch = r[s:s + 8]
                want.append((did, cid, len(ch), sum(ch), ch[0], ch[-1], ch))
                s += 5
                cid += 1
        assert len(df) == len(want)
        for (did, cid, n, tsum, f, l, ch), row in zip(want, df.itertuples()):
            assert (row.doc_id, row.chunk_id, row.n_chunk, row.tok_sum,
                    row.first_tok, row.last_tok) == (did, cid, n, tsum, f, l)
            assert list(row.chunk) == ch

    def test_empty_rows_and_sliced_offsets(self):
        from pymhealth_ray.stages.chunk import _chunk_spans

        arr = pa.array([[], [1, 2, 3, 4, 5], []], type=pa.list_(pa.int32()))
        ri, ci, gs, ge = _chunk_spans(arr, 3, 2)
        assert ri.tolist() == [1, 1, 1]
        assert ci.tolist() == [0, 1, 2]
        assert gs.tolist() == [0, 2, 4] and ge.tolist() == [3, 5, 5]
        # non-zero-offset slice must stay row-local
        ri2, ci2, gs2, ge2 = _chunk_spans(arr.slice(1), 3, 2)
        assert ri2.tolist() == [0, 0, 0] and gs2.tolist() == [0, 2, 4]


class TestTfIdf:
    def test_matches_python_oracle(self, ray_session):
        import collections
        import pandas as pd
        from pymhealth_ray.stages.tfidf import tfidf_top_terms

        rng = np.random.default_rng(23)
        vocab = np.array([f"w{i}" for i in range(30)])
        texts = [" ".join(rng.choice(vocab, rng.integers(0, 25)))
                 for _ in range(80)] + ["", "  "]
        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        ds = ray.data.from_pandas(df).repartition(6)
        got = (tfidf_top_terms(ds, k=3, num_buckets=8).to_pandas()
               .sort_values(["doc_id", "rn"]).reset_index(drop=True))

        n = len(texts)
        docs = {i: [w for w in t.split(" ") if w] for i, t in enumerate(texts)}
        dfc = collections.Counter()
        for ws in docs.values():
            dfc.update(set(ws))
        want = []
        for i, ws in docs.items():
            tf = collections.Counter(ws)
            scored = sorted(((tf[w] * (float(n) / dfc[w]), w) for w in tf),
                            key=lambda sw: (-sw[0], sw[1]))[:3]
            for rn, (s, w) in enumerate(scored, 1):
                want.append((i, rn, w, tf[w], dfc[w], s))
        assert list(map(tuple, got[["doc_id", "rn", "tok", "tf", "df",
                                    "score"]].itertuples(index=False))) == want


class TestTokenize:
    def test_greedy_longest_match_and_unk(self):
        from pymhealth_ray.stages.tokenize import _greedy_encode

        vocab = {"[UNK]": 0, "ab": 1, "a": 2, "b": 3, "##b": 4, "##c": 5,
                 "abc": 6, "##bc": 7}
        # longest match wins at position 0
        assert _greedy_encode("abc", vocab, 3) == [6]
        assert _greedy_encode("abb", vocab, 3) == [1, 4]
        # continuation pieces required after position 0
        assert _greedy_encode("ba", vocab, 3) == [0]  # no "##a" -> whole-word UNK
        assert _greedy_encode("abcb", vocab, 3) == [6, 4]  # abc + ##b
        assert _greedy_encode("acb", vocab, 3) == [2, 5, 4]  # a + ##c + ##b

    def test_distributed_matches_single_process(self, ray_session):
        import hashlib
        import pandas as pd
        from pymhealth_ray.stages.tokenize import (
            build_wordpiece_vocab, tokenize, _greedy_encode)

        rng = np.random.default_rng(31)
        base = ["alpha", "beta", "gamma", "albedo", "betamax", "zz"]
        texts = [" ".join(rng.choice(base, rng.integers(0, 9))) + (" qxj" if i % 7 == 0 else "")
                 for i in range(60)]
        df = pd.DataFrame({"doc_id": range(60), "text": texts})
        ds = ray.data.from_pandas(df).repartition(5)
        vocab = build_wordpiece_vocab(ds, num_words=4, num_buckets=4)
        got = (tokenize(ds, vocab, emit_tokens=True).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        maxlen = max(map(len, vocab))
        for i, t in enumerate(texts):
            ids = []
            for w in t.split(" "):
                if w:
                    ids.extend(_greedy_encode(w, vocab, maxlen))
            arr = np.asarray(ids, dtype=np.int32)
            assert got.n_tok[i] == len(ids)
            assert got.tok_sum[i] == arr.sum(dtype=np.int64)
            assert got.n_unk[i] == int((arr == 0).sum())
            assert got.tok_md5[i] == hashlib.md5(arr.tobytes()).hexdigest()
            assert list(got.tokens[i]) == ids

    def test_unk_on_unseen_chars(self, ray_session):
        import pandas as pd
        from pymhealth_ray.stages.tokenize import tokenize

        vocab = {"[UNK]": 0, "a": 1, "##a": 2}
        df = pd.DataFrame({"doc_id": [0, 1], "text": ["aa xq", "aaa"]})
        got = (tokenize(ray.data.from_pandas(df), vocab).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert got.n_unk.tolist() == [1, 0]
        assert got.n_tok.tolist() == [3, 3]  # [a,##a] + [UNK] ; [a,##a,##a]


class TestLineDedup:
    def test_boilerplate_dropped_everywhere(self, ray_session):
        import pandas as pd
        from pymhealth_ray.stages.linededup import segment_dedup

        boiler = "accept all cookies"
        docs = [f"{boiler} doc{i} word{i} here{i} extra tail {i}"
                for i in range(5)]
        docs.append("totally clean document nothing shared at all ok")
        df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
        out = (segment_dedup(ray.data.from_pandas(df).repartition(3),
                             words_per_seg=3, max_df=2, keep_text=True)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        # the shared 3-word prefix segment is hot (df=5 > 2) and dropped
        assert (out.n_dropped[:5] == 1).all()
        assert not out.clean_text.str.contains(boiler).any()
        assert out.n_dropped.iloc[5] == 0
        assert out.clean_text.iloc[5] == docs[5]

    def test_adversarial_all_hot_bloom_fallback(self, ray_session):
        """Every segment hot (all docs identical) with max_set_size=0: the
        Bloom fallback engages — driver state stays at the fixed bitmap
        size — and no-false-negatives means every boilerplate segment is
        still dropped."""
        import pandas as pd
        from pymhealth_ray.stages.linededup import (
            HotSegments,
            hot_segment_set,
            segment_dedup,
        )

        docs = ["the same exact boilerplate text everywhere again"] * 20
        df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
        ds = ray.data.from_pandas(df).repartition(4)
        hot = hot_segment_set(ds, words_per_seg=3, max_df=2, max_set_size=0,
                              bloom_bits=1 << 16)
        assert isinstance(hot, HotSegments) and hot.exact is None
        assert len(hot.bitmap) == (1 << 16) // 8  # bounded regardless of set
        out = (segment_dedup(ds, words_per_seg=3, max_df=2, keep_text=True,
                             max_set_size=0)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert (out.n_dropped == out.n_seg).all()  # no false negatives
        assert (out.clean_text == "").all()

    def test_bloom_no_false_negatives_non_pow2_bits(self, ray_session):
        """Non-power-of-two bloom_bits: the Python-side __contains__ must
        wrap mod 2^64 like build_bloom's numpy side, or members silently
        test negative (round-3 ADVICE)."""
        import pandas as pd
        from pymhealth_ray.stages.linededup import hot_segment_set

        docs = ["warm common boiler plate words here today"] * 12
        df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
        ds = ray.data.from_pandas(df).repartition(3)
        hot = hot_segment_set(ds, words_per_seg=3, max_df=2, max_set_size=0,
                              bloom_bits=24_000)  # not a power of two
        for seg in ("warm common boiler", "plate words here", "today"):
            assert seg in hot

    def test_bloom_fallback_superset_of_exact(self, ray_session):
        """Bloom mode drops AT LEAST the exact hot set (FPs may add a few)."""
        import pandas as pd
        from pymhealth_ray.stages.linededup import segment_dedup

        rng = np.random.default_rng(31)
        vocab = ["a", "b", "c", "d", "e", "f"]
        docs = [" ".join(rng.choice(vocab, rng.integers(4, 20)))
                for _ in range(200)]
        df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
        ds = ray.data.from_pandas(df).repartition(3)
        exact = (segment_dedup(ds, words_per_seg=2, max_df=3)
                 .to_pandas().sort_values("doc_id").reset_index(drop=True))
        bloom = (segment_dedup(ds, words_per_seg=2, max_df=3, max_set_size=0)
                 .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert (bloom.n_dropped >= exact.n_dropped).all()
        assert exact.n_dropped.sum() > 0

    def test_partition_invariant_and_matches_single_process(self, ray_session):
        import hashlib
        import pandas as pd
        from collections import Counter
        from pymhealth_ray.stages.linededup import segment_dedup, _doc_segments

        rng = np.random.default_rng(23)
        vocab = ["a", "b", "c", "d", "e"]
        docs = [" ".join(rng.choice(vocab, rng.integers(4, 20)))
                for _ in range(300)]
        df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})

        outs = []
        for blocks in (1, 11):
            out = (segment_dedup(ray.data.from_pandas(df).repartition(blocks),
                                 words_per_seg=2, max_df=3)
                   .to_pandas().sort_values("doc_id").reset_index(drop=True))
            outs.append(out)
        pd.testing.assert_frame_equal(outs[0], outs[1])

        dfreq = Counter()
        for t in docs:
            dfreq.update(set(_doc_segments(t, 2)))
        hot = {s for s, c in dfreq.items() if c > 3}
        assert hot  # non-trivial fixture
        for i, t in enumerate(docs):
            segs = _doc_segments(t, 2)
            kept = [s for s in segs if s not in hot]
            clean = " ".join(kept)
            r = outs[0].iloc[i]
            assert r.n_seg == len(segs)
            assert r.n_dropped == len(segs) - len(kept)
            assert r.clean_md5 == hashlib.md5(clean.encode()).hexdigest()


class TestTokenSpectrumGrowth:
    def test_distinct_ngrams_bruteforce(self, ray_session):
        from pymhealth_ray.pipelines.queries import q_seq_distinct_ngrams

        # map kernel vs python brute force on the sf0.001 fixture
        from pymhealth_ray.sources.generate import ensure_fixture
        import pyarrow.parquet as pq
        import glob
        path = ensure_fixture("/root/testdata/sf0.001")
        tbl = pa.concat_tables([pq.read_table(p) for p in
                                sorted(glob.glob(f"{path}/part-*.parquet"))])
        got = (q_seq_distinct_ngrams("/root/testdata/sf0.001")
               .to_pandas().set_index(["doc_id", "ts_ns"]))
        rows = tbl.to_pydict()
        for did, ts, toks in list(zip(rows["doc_id"], rows["ts_ns"],
                                      rows["tokens"]))[:200]:
            tris = {tuple(toks[i:i+3]) for i in range(len(toks) - 2)}
            r = got.loc[(did, ts)]
            assert r.n_distinct == len(tris)
            assert r.n_trigrams == max(len(toks) - 2, 0)

    def test_vocab_growth_monotone_and_total(self, ray_session):
        from pymhealth_ray.pipelines.queries import (q_seq_token_spectrum,
                                                     q_seq_vocab_growth)

        g = (q_seq_vocab_growth("/root/testdata/sf0.001")
             .to_pandas().sort_values("cp"))
        assert (np.diff(g.vocab.values) >= 0).all()
        spec = q_seq_token_spectrum("/root/testdata/sf0.001").to_pandas()
        assert g.vocab.iloc[-1] == spec.n_tokens.sum()


class TestLedgerDedup:
    def test_three_phase_ingest_and_idempotence(self, ray_session, tmp_path):
        from pymhealth_ray.stages.dedup import ledger_dedup_ingest

        ldir = str(tmp_path / "ledger")

        def mk(ids, texts):
            return ray.data.from_pandas(
                pd.DataFrame({"doc_id": ids, "text": texts})).repartition(3)

        # phase 1: one intra-shard dup
        out1 = ledger_dedup_ingest(
            mk([1, 2, 3, 4], ["aa", "bb", "aa", "cc"]), ldir,
            ingest_tag="p1", num_buckets=4).to_pandas()
        assert sorted(out1.doc_id) == [1, 2, 4]
        assert out1.set_index("doc_id").n_dups[1] == 2

        # phase 2: one cross-phase dup ('bb'), one new
        out2 = ledger_dedup_ingest(
            mk([10, 11], ["bb", "dd"]), ldir,
            ingest_tag="p2", num_buckets=4).to_pandas()
        assert sorted(out2.doc_id) == [11]

        # idempotent re-run of phase 2: same result, no self-filtering
        out2b = ledger_dedup_ingest(
            mk([10, 11], ["bb", "dd"]), ldir,
            ingest_tag="p2", num_buckets=4).to_pandas()
        assert sorted(out2b.doc_id) == [11]

        # phase 3 sees everything including phase 2's survivor
        out3 = ledger_dedup_ingest(
            mk([20, 21], ["dd", "ee"]), ldir,
            ingest_tag="p3", num_buckets=4).to_pandas()
        assert sorted(out3.doc_id) == [21]


class TestTemperatureSample:
    def test_thresholds_math(self):
        from pymhealth_ray.stages.sample import temperature_thresholds

        thr = temperature_thresholds({"a": 100, "b": 400, "c": 100})
        assert thr["a"] is None and thr["c"] is None
        # rate for b = sqrt(100/400) = 0.5 exactly -> threshold 0.5 * 16^15
        assert int(thr["b"], 16) == 16**15 // 2

    def test_rebalances_toward_alpha(self, ray_session):
        from pymhealth_ray.stages.sample import temperature_sample

        n_a, n_b = 4000, 250
        tbl = pa.table({
            "k": pa.array(np.arange(n_a + n_b, dtype=np.int64)),
            "g": pa.array(["a"] * n_a + ["b"] * n_b),
        })
        ds = ray.data.from_arrow(tbl).repartition(7)
        out = temperature_sample(ds, "g", "k", alpha=0.5).to_pandas()
        vc = out.g.value_counts()
        # b (the min group) kept whole; a cut to ~sqrt(250/4000)*4000 = 1000
        assert vc["b"] == n_b
        assert abs(vc["a"] - 1000) < 120
        # rerun-stable and partition-count invariant
        out2 = temperature_sample(
            ray.data.from_arrow(tbl).repartition(3), "g", "k").to_pandas()
        assert sorted(out.k.tolist()) == sorted(out2.k.tolist())


class TestSimilarityJoin:
    def _brute(self, texts, tau, k=3):
        import itertools
        sets = {}
        for i, t in enumerate(texts):
            w = t.lower().split(" ")
            sets[i] = {" ".join(w[j:j + k]) for j in range(len(w) - k + 1)}
        out = []
        for a, b in itertools.combinations(sorted(sets), 2):
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            c = len(sa & sb)
            if c and c / (len(sa) + len(sb) - c) >= tau:
                out.append((a, b, c, c / (len(sa) + len(sb) - c)))
        return sorted(out)

    @pytest.fixture(scope="class")
    def corpus(self):
        rng = np.random.default_rng(7)
        vocab = [f"w{i}" for i in range(60)]
        texts = []
        for i in range(80):
            n = int(rng.integers(8, 40))
            texts.append(" ".join(rng.choice(vocab, size=n)))
        # seeded near-dups: perturb one word of an existing doc
        for i in range(0, 40, 5):
            w = texts[i].split(" ")
            w[len(w) // 2] = "zz"
            texts.append(" ".join(w))
        return texts

    def test_matches_bruteforce(self, ray_session, corpus):
        from pymhealth_ray.stages.setjoin import similarity_join

        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(np.arange(len(corpus), dtype=np.int64)),
            "text": pa.array(corpus)})).repartition(5)
        got = similarity_join(ds, tau=0.6, num_buckets=8).to_pandas()
        got = sorted(zip(got.id_a, got.id_b, got.n_shared, got.jaccard))
        exp = self._brute(corpus, 0.6)
        assert [(a, b, c) for a, b, c, _ in got] == [(a, b, c) for a, b, c, _ in exp]
        assert np.allclose([j for *_, j in got], [j for *_, j in exp])

    def test_distributed_plan_equals_broadcast(self, ray_session, corpus):
        # broadcast_threshold=0 forces the bloom/co-partitioned dropset
        # restriction, the no-prefilter count exchange, and the equi_join
        # size attach — rows must be identical to the broadcast plan
        from pymhealth_ray.stages.setjoin import similarity_join

        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(np.arange(len(corpus), dtype=np.int64)),
            "text": pa.array(corpus)})).repartition(3)
        small = similarity_join(ds, tau=0.6, num_buckets=8).to_pandas()
        big = similarity_join(ds, tau=0.6, num_buckets=8,
                              broadcast_threshold=0).to_pandas()
        key = ["id_a", "id_b"]
        pd.testing.assert_frame_equal(
            small.sort_values(key).reset_index(drop=True),
            big.sort_values(key).reset_index(drop=True))

    def test_empty_and_short_docs(self, ray_session):
        from pymhealth_ray.stages.setjoin import similarity_join

        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(["", "one two", "a b c d"])}))
        out = similarity_join(ds, tau=0.5).to_pandas()
        assert len(out) == 0


class TestContainmentJoin:
    def _brute(self, left, right, tau, k=3):
        def sh(t):
            w = t.lower().split(" ")
            return {" ".join(w[j:j + k]) for j in range(len(w) - k + 1)}
        ls = {i: sh(t) for i, t in enumerate(left)}
        rs = {1000 + i: sh(t) for i, t in enumerate(right)}
        out = []
        for a, sa in sorted(ls.items()):
            for b, sb in sorted(rs.items()):
                if not sb:
                    continue
                c = len(sa & sb)
                if c and c / len(sb) >= tau:
                    out.append((a, b, c, c / len(sb)))
        return sorted(out)

    @pytest.fixture(scope="class")
    def corpora(self):
        rng = np.random.default_rng(11)
        vocab = [f"w{i}" for i in range(50)]
        left = [" ".join(rng.choice(vocab, size=int(rng.integers(10, 40))))
                for _ in range(60)]
        right = []
        for i in range(12):
            # eval docs: contiguous slices of train docs (high containment)
            w = left[i * 3].split(" ")
            right.append(" ".join(w[: max(6, len(w) // 2)]))
        for _ in range(10):
            right.append(" ".join(rng.choice(vocab,
                                             size=int(rng.integers(8, 20)))))
        return left, right

    def _ds(self, texts, base):
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64) + base),
            "text": pa.array(texts)})).repartition(4)

    def test_matches_bruteforce(self, ray_session, corpora):
        from pymhealth_ray.stages.setjoin import containment_join

        left, right = corpora
        got = containment_join(self._ds(left, 0), self._ds(right, 1000),
                               tau=0.5, num_buckets=8).to_pandas()
        got = sorted(zip(got.id_a, got.id_b, got.n_shared, got.containment))
        exp = self._brute(left, right, 0.5)
        assert [(a, b, c) for a, b, c, _ in got] == \
            [(a, b, c) for a, b, c, _ in exp]
        assert np.allclose([x for *_, x in got], [x for *_, x in exp])
        assert len(got) >= 12  # every seeded slice is found

    def test_distributed_plan_equals_broadcast(self, ray_session, corpora):
        from pymhealth_ray.stages.setjoin import containment_join

        left, right = corpora
        small = containment_join(self._ds(left, 0), self._ds(right, 1000),
                                 tau=0.4, num_buckets=8).to_pandas()
        big = containment_join(self._ds(left, 0), self._ds(right, 1000),
                               tau=0.4, num_buckets=8,
                               broadcast_threshold=0).to_pandas()
        key = ["id_a", "id_b"]
        pd.testing.assert_frame_equal(
            small.sort_values(key).reset_index(drop=True),
            big.sort_values(key).reset_index(drop=True))

    def test_empty_sides(self, ray_session):
        from pymhealth_ray.stages.setjoin import containment_join

        left = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": pa.array(["a b c d e", "x y z w v"])}))
        right = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([5], type=pa.int64()),
            "text": pa.array(["q r"])}))
        out = containment_join(left, right, tau=0.5).to_pandas()
        assert len(out) == 0


class TestLatestByKey:
    def test_matches_pandas(self, ray_session):
        from pymhealth_ray.stages.dedup import latest_by_key

        rng = np.random.default_rng(3)
        n = 500
        tbl = pa.table({
            "k1": pa.array(rng.integers(0, 20, n), type=pa.int64()),
            "k2": pa.array([f"t{v}" for v in rng.integers(0, 4, n)]),
            "ts": pa.array(rng.integers(0, 100, n).astype("datetime64[us]")),
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "v": pa.array(rng.normal(size=n)),
        })
        got = latest_by_key(
            ray.data.from_arrow(tbl).repartition(7),
            ["k1", "k2"], ["ts", "id"], num_buckets=8).to_pandas()
        pdf = tbl.to_pandas()
        exp = (pdf.sort_values(["k1", "k2", "ts", "id"])
               .groupby(["k1", "k2"], sort=False).tail(1))
        key = ["k1", "k2"]
        pd.testing.assert_frame_equal(
            got.sort_values(key).reset_index(drop=True),
            exp.sort_values(key).reset_index(drop=True))
        # dtype-faithful: timestamp stays timestamp
        assert str(got["ts"].dtype).startswith("datetime64")

    def test_partition_invariance(self, ray_session):
        from pymhealth_ray.stages.dedup import latest_by_key

        rng = np.random.default_rng(5)
        n = 300
        tbl = pa.table({
            "k": pa.array(rng.integers(0, 10, n), type=pa.int64()),
            "ver": pa.array(rng.integers(0, 50, n), type=pa.int64()),
            "id": pa.array(np.arange(n, dtype=np.int64)),
        })
        outs = []
        for p in (1, 4, 9):
            got = latest_by_key(ray.data.from_arrow(tbl).repartition(p),
                                ["k"], ["ver", "id"],
                                num_buckets=5).to_pandas()
            outs.append(got.sort_values("k").reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])
        pd.testing.assert_frame_equal(outs[0], outs[2])


class TestWinsorizeByGroup:
    def test_matches_manual(self, ray_session):
        from pymhealth_ray.stages.normalize import winsorize_by_group

        rng = np.random.default_rng(9)
        n = 400
        g = rng.integers(0, 3, n)
        v = np.round(rng.normal(50, 20, n), 2)
        tbl = pa.table({
            "grp": pa.array([f"g{x}" for x in g]),
            "val": pa.array(v, type=pa.float64()),
            "rid": pa.array(np.arange(n, dtype=np.int64)),
        })
        got = winsorize_by_group(
            ray.data.from_arrow(tbl).repartition(5), "grp", "val",
            lo=0.1, hi=0.9, out_name="w").to_pandas()
        # quantile_disc semantics: sorted[ceil(q*n)-1]
        import math
        exp_w = np.empty(n)
        for gi in range(3):
            mask = g == gi
            vs = np.sort(v[mask])
            m = len(vs)
            qlo = vs[max(0, math.ceil(0.1 * m) - 1)]
            qhi = vs[max(0, math.ceil(0.9 * m) - 1)]
            exp_w[mask] = np.clip(v[mask], qlo, qhi)
        got = got.sort_values("rid").reset_index(drop=True)
        assert np.array_equal(got["w"].to_numpy(), exp_w)


class TestStreamingLatest:
    def test_carry_across_batches_matches_groupby(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from pymhealth_ray.stages.streaming import streaming_latest

        rng = np.random.default_rng(13)
        # sorted layout: one partition file, sorted by (entity, ts)
        ents = np.repeat(np.arange(40, dtype=np.int64),
                         rng.integers(1, 9, 40))
        ts = np.arange(len(ents), dtype=np.int64)
        val = rng.integers(0, 100, len(ents)).astype(np.int64)
        d = tmp_path / "part=0"
        d.mkdir()
        pq.write_table(pa.table({"doc_id": ents, "ts_ns": ts,
                                 "n_tok": val}), d / "data.parquet")
        # batch_rows=7 forces many mid-entity batch boundaries
        got = streaming_latest(str(tmp_path), batch_rows=7).to_pandas()
        pdf = pa.table({"doc_id": ents, "ts_ns": ts,
                        "n_tok": val}).to_pandas()
        exp = pdf.groupby("doc_id").agg(
            n_rows=("ts_ns", "size"), last_ts=("ts_ns", "max")
        ).reset_index()
        exp["last_val"] = pdf.loc[pdf.groupby("doc_id")["ts_ns"].idxmax(),
                                  "n_tok"].to_numpy()
        got = got.sort_values("doc_id").reset_index(drop=True)
        assert got["doc_id"].tolist() == exp["doc_id"].tolist()
        assert got["n_rows"].tolist() == exp["n_rows"].tolist()
        assert got["last_ts"].tolist() == exp["last_ts"].tolist()
        assert got["last_val"].tolist() == exp["last_val"].tolist()


class TestFuzzyPairs:
    def test_levenshtein_kernel(self):
        from pymhealth_ray.stages.fuzzy import levenshtein_pairs

        def ref(a, b):
            dp = list(range(len(b) + 1))
            for i in range(1, len(a) + 1):
                prev, dp[0] = dp[0], i
                for j in range(1, len(b) + 1):
                    cur = dp[j]
                    dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                                prev + (a[i - 1] != b[j - 1]))
                    prev = cur
            return dp[len(b)]

        import string
        rng = np.random.default_rng(1)
        alphabet = list(string.ascii_lowercase + " ")
        pairs = []
        for _ in range(200):
            la, lb = rng.integers(0, 16, 2)
            pairs.append(("".join(rng.choice(alphabet, la)),
                          "".join(rng.choice(alphabet, lb))))
        got = levenshtein_pairs([p[0] for p in pairs],
                                [p[1] for p in pairs], 16)
        assert got.tolist() == [ref(a, b) for a, b in pairs]

    def test_blocked_pairs_match_bruteforce(self, ray_session):
        from pymhealth_ray.stages.fuzzy import fuzzy_pairs

        rng = np.random.default_rng(2)
        texts = []
        for i in range(60):
            base = f"record {i % 7} " + "".join(
                rng.choice(list("abcdef "), 20))
            texts.append(base)
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts)})).repartition(5)
        got = fuzzy_pairs(ds, block_prefix=8, sim_prefix=16, max_dist=4,
                          num_buckets=8).to_pandas()

        def ref(a, b):
            dp = list(range(len(b) + 1))
            for i in range(1, len(a) + 1):
                prev, dp[0] = dp[0], i
                for j in range(1, len(b) + 1):
                    cur = dp[j]
                    dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                                prev + (a[i - 1] != b[j - 1]))
                    prev = cur
            return dp[len(b)]

        exp = []
        for i in range(len(texts)):
            for j in range(i + 1, len(texts)):
                a, b = texts[i].lower(), texts[j].lower()
                if a[:8] != b[:8]:
                    continue
                d = ref(a[:16], b[:16])
                if d <= 4:
                    exp.append((i, j, d))
        assert sorted(zip(got.id_a, got.id_b, got.dist)) == sorted(exp)


class TestJaroWinkler:
    def test_fuzz_vs_duckdb(self):
        import duckdb

        from pymhealth_ray.stages.fuzzy import jaro_winkler_pairs

        rng = np.random.default_rng(17)
        alphabet = list("abcdefgh ")
        pairs = []
        for _ in range(3000):
            la, lb = rng.integers(0, 20, 2)
            pairs.append(("".join(rng.choice(alphabet, la)),
                          "".join(rng.choice(alphabet, lb))))
        got = jaro_winkler_pairs([p[0] for p in pairs],
                                 [p[1] for p in pairs], 20)
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t AS SELECT * FROM (VALUES " +
            ",".join(f"('{a}','{b}',{i})"
                     for i, (a, b) in enumerate(pairs)) + ") v(a,b,i)")
        exp = np.array([r[0] for r in con.execute(
            "SELECT jaro_winkler_similarity(a,b) FROM t ORDER BY i"
        ).fetchall()])
        assert np.array_equal(got, exp)  # bit-exact, not allclose


class TestZOrder:
    def test_box_prunes_and_matches(self, ray_session, tmp_path):
        from pymhealth_ray.sources.io import read_zordered, write_zordered

        rng = np.random.default_rng(23)
        n = 20000
        x = rng.integers(0, 10_000, n).astype(np.int64)
        y = rng.integers(0, 10_000, n).astype(np.int64)
        v = rng.integers(0, 100, n).astype(np.int64)
        ds = ray.data.from_arrow(pa.table({"x": x, "y": y, "v": v})
                                 ).repartition(6)
        write_zordered(ds, str(tmp_path), "x", "y", num_files=64)
        got, files_read, files_total = read_zordered(
            str(tmp_path), "x", "y", 2000, 3000, 7000, 8000,
            columns=["x", "y", "v"])
        pdf = got.to_pandas().sort_values(["x", "y", "v"]).reset_index(
            drop=True)
        mask = (x >= 2000) & (x <= 3000) & (y >= 7000) & (y <= 8000)
        exp = (pa.table({"x": x[mask], "y": y[mask], "v": v[mask]})
               .to_pandas().sort_values(["x", "y", "v"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(pdf, exp)
        # the point of the Morton layout: a ~1% box opens FEW files; a
        # single-column sort would still open ~all of them on the second
        # predicate
        assert files_total >= 32
        assert files_read <= files_total // 4

    def test_empty_input_and_miss(self, ray_session, tmp_path):
        from pymhealth_ray.sources.io import read_zordered, write_zordered

        ds = ray.data.from_arrow(pa.table({
            "x": pa.array([], type=pa.int64()),
            "y": pa.array([], type=pa.int64())}))
        assert write_zordered(ds, str(tmp_path), "x", "y") == []
        got, nread, ntot = read_zordered(str(tmp_path), "x", "y",
                                         0, 10, 0, 10, columns=["x", "y"])
        assert got.count() == 0 and nread == 0 and ntot == 0


class TestAggState:
    def test_incremental_equals_full_and_idempotent(self, ray_session,
                                                    tmp_path):
        from pymhealth_ray.state.aggstate import (apply_group_sum_delta,
                                                  read_group_sum_state)

        rng = np.random.default_rng(29)
        n = 3000
        g = rng.integers(0, 40, n).astype(np.int64)
        t = np.array([f"t{v}" for v in rng.integers(0, 3, n)])
        v = rng.integers(0, 1000, n).astype(np.int64)

        def ds_of(mask):
            return ray.data.from_arrow(pa.table(
                {"g": g[mask], "t": t[mask], "v": v[mask]})).repartition(4)

        sdir = str(tmp_path / "state")
        third = np.arange(n) % 3
        for tag in ("a", "b", "c"):
            apply_group_sum_delta(ds_of(third == ord(tag) - ord("a")),
                                  sdir, ["g", "t"], ["v"], tag=tag,
                                  num_buckets=8)
        # replay every delta (retried ingest) — must change nothing
        for tag in ("b", "a", "c"):
            apply_group_sum_delta(ds_of(third == ord(tag) - ord("a")),
                                  sdir, ["g", "t"], ["v"], tag=tag,
                                  num_buckets=8)
        got = read_group_sum_state(sdir).to_pandas().sort_values(
            ["g", "t"]).reset_index(drop=True)
        exp = (pa.table({"g": g, "t": t, "v": v}).to_pandas()
               .groupby(["g", "t"], as_index=False)
               .agg(n=("v", "size"), v_sum=("v", "sum")))
        exp = exp.sort_values(["g", "t"]).reset_index(drop=True)
        assert got["g"].tolist() == exp["g"].tolist()
        assert got["t"].tolist() == exp["t"].tolist()
        assert got["n"].tolist() == exp["n"].tolist()
        assert got["v_sum"].tolist() == exp["v_sum"].tolist()


class TestScrubTokens:
    def test_scrub_matches_python_and_handles_empties(self, ray_session):
        from pymhealth_ray.stages.vocab import scrub_tokens

        rows = [[1, 2, 3, 2], [], [2, 2, 2], [5, 6], [7]]
        stop = np.array([2, 7], dtype=np.int64)
        tbl = pa.table({
            "i": pa.array(range(len(rows)), type=pa.int64()),
            "tokens": pa.array(rows, type=pa.list_(pa.int32())),
        })
        ds = ray.data.from_arrow(tbl).repartition(3)
        got = scrub_tokens(ds, stop).to_pandas().sort_values("i")
        exp = [[t for t in r if t not in (2, 7)] for r in rows]
        assert [list(x) for x in got.tokens_kept] == exp

    def test_sliced_chunks(self, ray_session):
        from pymhealth_ray.stages.vocab import scrub_tokens

        # sliced ListArray: offsets don't start at 0
        base = pa.array([[9, 1], [2, 9], [9, 9, 3]],
                        type=pa.list_(pa.int32()))
        sliced = base.slice(1)
        tbl = pa.table({"i": pa.array([0, 1], type=pa.int64()),
                        "tokens": sliced})
        got = scrub_tokens(ray.data.from_arrow(tbl),
                           np.array([9])).to_pandas().sort_values("i")
        assert [list(x) for x in got.tokens_kept] == [[2], [3]]


class TestAudioVAD:
    def _wav(self, sig):
        import io
        import wave

        pcm = np.clip(sig * 32767.0, -32768, 32767).astype(np.int16)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(8000)
            wf.writeframes(pcm.tobytes())
        return buf.getvalue()

    def test_silence_split(self, ray_session):
        from pymhealth_ray.stages.multimodal import audio_vad

        # 10 frames of near-silence then 10 loud frames (200 samples each)
        t = np.arange(2000, dtype=np.float64)
        loud = 0.5 * np.sin(2 * np.pi * 440.0 * t / 8000.0)
        sig = np.concatenate([np.full(2000, 1e-4), loud])
        tbl = pa.table({"doc_id": pa.array([1], type=pa.int64()),
                        "payload": pa.array([self._wav(sig)],
                                            type=pa.binary())})
        out = audio_vad(ray.data.from_arrow(tbl)).to_pandas()
        assert out.n_frames[0] == 20
        assert out.n_active[0] == 10
        assert out.longest_active[0] == 10
        assert out.zc_active[0] > 0

    def test_short_clip_guard(self, ray_session):
        from pymhealth_ray.stages.multimodal import AudioVAD

        tbl = pa.table({"doc_id": pa.array([1], type=pa.int64()),
                        "payload": pa.array(
                            [self._wav(np.zeros(50))], type=pa.binary())})
        out = AudioVAD(frame_len=200)(tbl)
        assert out["n_frames"][0].as_py() == 0
        assert out["longest_active"][0].as_py() == 0


class TestGroupedWeightedMedian:
    def test_random_vs_bruteforce(self, ray_session):
        from pymhealth_ray.stages.aggregate import grouped_weighted_median

        rng = np.random.default_rng(17)
        n = 4000
        df = pd.DataFrame({
            "g": rng.integers(0, 7, n).astype(np.int64),
            "v": rng.integers(-50, 50, n).astype(np.int64),
            "w": rng.integers(0, 9, n).astype(np.int64),
        })
        ds = ray.data.from_pandas(df).repartition(7)
        got = grouped_weighted_median(ds, ["g"], "v", "w", num_buckets=5) \
            .to_pandas().sort_values("g").reset_index(drop=True)

        exp_rows = []
        for g, sub in df.groupby("g"):
            s = sub.groupby("v").w.sum().sort_index()
            tot = int(s.sum())
            cw = s.cumsum()
            med = int(cw.index[np.searchsorted(
                2 * cw.to_numpy(), tot, side="left")])
            exp_rows.append((g, med, tot))
        exp = pd.DataFrame(exp_rows, columns=["g", "wmedian", "total_w"])
        pd.testing.assert_frame_equal(
            got.astype({"wmedian": np.int64, "total_w": np.int64}), exp)

    def test_partition_invariance(self, ray_session):
        from pymhealth_ray.stages.aggregate import grouped_weighted_median

        rng = np.random.default_rng(5)
        df = pd.DataFrame({
            "g": rng.integers(0, 4, 1000).astype(np.int64),
            "v": rng.integers(0, 20, 1000).astype(np.int64),
            "w": rng.integers(1, 5, 1000).astype(np.int64),
        })
        outs = []
        for parts, nb in ((2, 3), (9, 31)):
            ds = ray.data.from_pandas(df).repartition(parts)
            outs.append(grouped_weighted_median(ds, ["g"], "v", "w",
                                                num_buckets=nb)
                        .to_pandas().sort_values("g")
                        .reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])


class TestSearchIndex:
    def _build(self, tmp_path, texts):
        from pymhealth_ray.stages.index import write_search_index

        tbl = pa.table({
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        })
        idir = str(tmp_path / "sidx")
        meta = write_search_index(ray.data.from_arrow(tbl).repartition(3),
                                  idir, num_term_buckets=7,
                                  num_doc_buckets=3)
        return idir, meta

    def test_conjunctive_matches_bruteforce(self, ray_session, tmp_path):
        import math

        from pymhealth_ray.stages.index import search_conjunctive

        texts = ["a b c a", "b c d", "a c c e", "x y", "a b", "c b a a"]
        idir, meta = self._build(tmp_path, texts)
        assert meta["n_docs"] == 6
        assert meta["total_len"] == sum(len(t.split()) for t in texts)
        got = search_conjunctive(idir, ["a", "b"], k=10).to_pandas()

        # brute force BM25 over docs containing both terms
        docs = [t.split() for t in texts]
        n = len(docs)
        avgdl = sum(len(d) for d in docs) / n
        df = {t: sum(t in d for d in docs) for t in ("a", "b")}
        exp = []
        for i, d in enumerate(docs):
            if "a" in d and "b" in d:
                s = 0.0
                for t in ("a", "b"):
                    tf = d.count(t)
                    idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1)
                    s += idf * (tf * 2.5) / (
                        tf + 1.5 * (0.25 + 0.75 * len(d) / avgdl))
                exp.append((i, round(s, 6)))
        exp.sort(key=lambda r: (-r[1], r[0]))
        assert list(got.doc_id) == [e[0] for e in exp]
        assert list(got.score) == pytest.approx([e[1] for e in exp])
        assert list(got.rn) == list(range(1, len(exp) + 1))

    def test_missing_term_empty(self, ray_session, tmp_path):
        from pymhealth_ray.stages.index import search_conjunctive

        idir, _ = self._build(tmp_path, ["a b", "b c"])
        assert search_conjunctive(idir, ["a", "zzz"], k=5).num_rows == 0
