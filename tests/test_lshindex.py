"""stages/lshindex: persistent index build + pruned incremental probe."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from pymhealth_ray.stages import lshindex
from pymhealth_ray.stages.lshindex import lsh_index_probe, lsh_index_write


def _corpus(n=120, seed=3):
    # diverse random-letter words so unrelated docs share few char shingles
    rng = np.random.default_rng(seed)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    return [" ".join("".join(rng.choice(letters, 8)) for _ in range(40))
            for _ in range(n)]


def test_probe_finds_near_dups_and_prunes(ray_session, tmp_path):
    texts = _corpus()
    old = pd.DataFrame({"doc_id": np.arange(100, dtype=np.int64),
                        "text": texts[:100]})
    idx = str(tmp_path / "lsh")
    lsh_index_write(ray.data.from_pandas(old).repartition(4), idx,
                    n_parts=8)

    # ingest: one near-dup of doc 7 (tiny suffix change), one novel doc
    new = pd.DataFrame({
        "doc_id": np.array([1000, 1001], dtype=np.int64),
        "text": [old.text[7] + " alpha", texts[110]],
    })
    pairs = lsh_index_probe(ray.data.from_pandas(new), idx,
                            jaccard_threshold=0.5).to_pandas()
    assert 7 in set(pairs[pairs.new_id == 1000].old_id)
    assert (pairs.new_id != 1001).all()
    assert (pairs.est_jaccard >= 0.5).all()

    # idempotence of the probe (pure function of index + batch)
    pairs2 = lsh_index_probe(ray.data.from_pandas(new), idx,
                             jaccard_threshold=0.5).to_pandas()
    pd.testing.assert_frame_equal(pairs.sort_values(["new_id", "old_id"])
                                  .reset_index(drop=True),
                                  pairs2.sort_values(["new_id", "old_id"])
                                  .reset_index(drop=True))

    # pruning: a single probe key set touches a strict subset of the sig
    # partitions (band partitions may all be hit: 16 bands x 1 doc = up to
    # 16 distinct hash cells over 8 parts — so assert on the id side)
    one_old = lshindex._part_paths(
        f"{idx}/sigs", lshindex._id_part(np.array([7], dtype=np.int64), 8))
    all_sig = lshindex._part_paths(f"{idx}/sigs", range(8))
    assert len(one_old) < len(all_sig)


def test_append_then_probe_sees_new_docs(ray_session, tmp_path):
    from pymhealth_ray.stages.lshindex import lsh_index_append

    texts = _corpus(seed=9)
    old = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64),
                        "text": texts[:60]})
    idx = str(tmp_path / "lsh2")
    lsh_index_write(ray.data.from_pandas(old).repartition(3), idx,
                    n_parts=6)
    batch1 = pd.DataFrame({"doc_id": np.array([500], dtype=np.int64),
                           "text": [texts[61]]})
    n = lsh_index_append(ray.data.from_pandas(batch1), idx, ingest_tag="b1")
    assert n == 1
    # idempotent re-run
    assert lsh_index_append(ray.data.from_pandas(batch1), idx,
                            ingest_tag="b1") == 0
    # a later probe finds near-dups of the APPENDED doc too
    probe = pd.DataFrame({"doc_id": np.array([900], dtype=np.int64),
                          "text": [texts[61] + " zz"]})
    pairs = lsh_index_probe(ray.data.from_pandas(probe), idx,
                            jaccard_threshold=0.5).to_pandas()
    assert 500 in set(pairs.old_id)


def test_append_interrupted_then_rerun_converges(ray_session, tmp_path):
    """A mid-append death (some ingest files written, marker absent) must
    converge on re-run: same files, no duplicates, probe results equal an
    index that ingested the batch cleanly."""
    import glob
    import os

    from pymhealth_ray.stages.lshindex import lsh_index_append

    texts = _corpus(seed=5)
    old = pd.DataFrame({"doc_id": np.arange(80, dtype=np.int64),
                        "text": texts[:80]})
    batch = pd.DataFrame({
        "doc_id": np.array([500, 501], dtype=np.int64),
        "text": [old.text[3] + " tail", texts[100]],
    })
    probe = pd.DataFrame({
        "doc_id": np.array([900], dtype=np.int64),
        "text": [old.text[3] + " other"],
    })

    clean = str(tmp_path / "clean")
    lsh_index_write(ray.data.from_pandas(old).repartition(3), clean,
                    n_parts=4)
    lsh_index_append(ray.data.from_pandas(batch), clean, ingest_tag="t1")

    crashed = str(tmp_path / "crashed")
    lsh_index_write(ray.data.from_pandas(old).repartition(3), crashed,
                    n_parts=4)
    lsh_index_append(ray.data.from_pandas(batch), crashed, ingest_tag="t1")
    # simulate the death: marker gone, HALF the ingest files gone — the
    # re-run must rewrite the full deterministic file set, no dupes
    os.remove(os.path.join(crashed, "_ingest_t1.json"))
    ingest_files = sorted(glob.glob(
        os.path.join(crashed, "*", "part=*", "ingest-t1.parquet")))
    assert ingest_files
    for p in ingest_files[::2]:
        os.remove(p)
    appended = lsh_index_append(ray.data.from_pandas(batch), crashed,
                                ingest_tag="t1")
    assert appended == 2
    # third run: marker present → no-op
    assert lsh_index_append(ray.data.from_pandas(batch), crashed,
                            ingest_tag="t1") == 0

    got_c = sorted(os.path.basename(os.path.dirname(p)) + "/" +
                   os.path.basename(p) for p in glob.glob(
                       os.path.join(crashed, "*", "part=*", "*.parquet")))
    got_k = sorted(os.path.basename(os.path.dirname(p)) + "/" +
                   os.path.basename(p) for p in glob.glob(
                       os.path.join(clean, "*", "part=*", "*.parquet")))
    assert got_c == got_k  # identical deterministic file sets

    a = lsh_index_probe(ray.data.from_pandas(probe), clean,
                        jaccard_threshold=0.5).to_pandas()
    b = lsh_index_probe(ray.data.from_pandas(probe), crashed,
                        jaccard_threshold=0.5).to_pandas()
    key = ["new_id", "old_id"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))
