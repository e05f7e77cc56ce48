"""Deterministic synthetic generator for the primary ``sequences`` table.

Implements FIXTURES.md F1 exactly (seeded PCG64, pure numpy, no external
data): one row per pre-tokenized training sequence with Zipf-skewed entities
(hot-entity skew for salting tests), sinusoid+noise token values (so
zero-crossing / Hjorth / entropy kernels are non-trivial), and a derived
per-entity event-time axis with exponential inter-arrival gaps whose 5% tail
is inflated 100× (session breaks) — mirroring the reference's
interval→timestamp reconstruction ``nni_cumulative``
(reference:heart/hrv.py:43-45).

Generation is canonical for a given (seed, n_rows, n_entities): one
sequential RNG stream, chunk layout of the output files does not affect
values.
"""

from __future__ import annotations

import hashlib
import json
import os
import pathlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pymhealth_ray.sources.schema import SEQUENCES_SCHEMA

EPOCH0_NS = np.datetime64("2026-01-01T00:00:00", "ns").astype(np.int64)
VOCAB = 50257
SOURCES = np.array(["web", "code", "chat", "book"])
SOURCE_PROBS = np.array([0.55, 0.2, 0.15, 0.1])


def generate_sequences(
    n_rows: int = 20_000,
    n_entities: int = 200,
    zipf_a: float = 1.3,
    gap_mean_s: float = 30.0,
    seed: int = 42,
) -> pa.Table:
    """Generate the full table in memory as one Arrow table."""
    rng = np.random.default_rng(np.random.PCG64(seed))

    # entities: Zipf(a) clipped into [0, n_entities)
    ent = (rng.zipf(zipf_a, n_rows) - 1) % n_entities
    doc_id = np.array([f"d{e:06d}" for e in ent])

    # sequence lengths: 8 + Geometric(p=0.02), clipped to [8, 2048]
    n_tok = np.clip(8 + rng.geometric(0.02, n_rows), 8, 2048).astype(np.int32)
    total = int(n_tok.sum())

    # token values: floor(512 + 400*sin(2πk/17) + N(0,80)) clipped [0, VOCAB)
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    k = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], n_tok)
    vals = np.floor(512.0 + 400.0 * np.sin(2 * np.pi * k / 17.0) + rng.normal(0.0, 80.0, total))
    tokens_flat = np.clip(vals, 0, VOCAB - 1).astype(np.int32)

    # source: categorical
    source = SOURCES[rng.choice(len(SOURCES), n_rows, p=SOURCE_PROBS)]

    # event time: per entity, cumulative exponential gaps (5% inflated 100×),
    # accumulated in generation order, quantized to ns
    gaps_s = rng.exponential(gap_mean_s, n_rows)
    inflate = rng.random(n_rows) < 0.05
    gaps_s[inflate] *= 100.0
    gaps_ns = np.maximum(1, (gaps_s * 1e9).astype(np.int64))
    order = np.argsort(ent, kind="stable")  # group rows by entity, keep gen order
    seg_start = np.zeros(n_rows, dtype=bool)
    if n_rows:
        seg_start[0] = True
        seg_start[1:] = ent[order][1:] != ent[order][:-1]
    g = gaps_ns[order]
    cum = np.cumsum(g)
    # subtract each segment's leading cumulative total so ts restarts per entity
    seg_offsets = np.repeat(cum[seg_start] - g[seg_start], np.diff(np.append(np.flatnonzero(seg_start), n_rows)))
    ts_sorted = EPOCH0_NS + (cum - seg_offsets)
    ts_ns = np.empty(n_rows, dtype=np.int64)
    ts_ns[order] = ts_sorted

    tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), pa.array(tokens_flat, type=pa.int32()))
    return pa.table(
        {
            "doc_id": pa.array(doc_id, type=pa.string()),
            "ts_ns": pa.array(ts_ns, type=pa.int64()),
            "tokens": tokens,
            "n_tok": pa.array(n_tok, type=pa.int32()),
            "source": pa.array(source, type=pa.string()),
        }
    ).cast(SEQUENCES_SCHEMA)


def write_sequences(out_dir: str, n_rows: int, n_entities: int, seed: int = 42,
                    rows_per_file: int = 250_000, **kwargs) -> str:
    """Write the table as multi-file Parquet (one file per shard so reads
    parallelize; a resumable layout writes one directory per bucket —
    see pymhealth_ray.state.lineage for the checkpointed variant).
    """
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    table = generate_sequences(n_rows=n_rows, n_entities=n_entities, seed=seed, **kwargs)
    n_files = max(1, (n_rows + rows_per_file - 1) // rows_per_file)
    for i in range(n_files):
        shard = table.slice(i * rows_per_file, rows_per_file)
        pq.write_table(shard, out / f"part-{i:05d}.parquet")
    return str(out)


#: sf → (n_rows, n_entities) used when deriving a fixture size from a
#: driver-style sf directory name (TESTDATA.md scale points).
SF_SIZES = {
    "0.001": (2_000, 50),
    "0.01": (20_000, 200),
    "0.1": (200_000, 1_000),
}


def fixture_dir_for(sf_dir: str, base: str = "/tmp/pymhealth_ray_fixtures") -> str:
    """Deterministic fixture path for a given testdata sf directory."""
    name = pathlib.Path(sf_dir).name  # e.g. "sf0.01"
    sf = name[2:] if name.startswith("sf") else name
    n_rows, n_entities = SF_SIZES.get(sf, (20_000, 200))
    key = json.dumps({"n_rows": n_rows, "n_entities": n_entities, "seed": 42, "v": 1})
    h = hashlib.sha1(key.encode()).hexdigest()[:8]
    return os.path.join(base, f"sequences_sf{sf}_{h}")


def ensure_fixture(sf_dir: str, base: str = "/tmp/pymhealth_ray_fixtures") -> str:
    """Generate (once) and return the sequences fixture for an sf dir.
    Idempotent: a _SUCCESS marker gates completeness.
    """
    out = fixture_dir_for(sf_dir, base)
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    name = pathlib.Path(sf_dir).name
    sf = name[2:] if name.startswith("sf") else name
    n_rows, n_entities = SF_SIZES.get(sf, (20_000, 200))
    write_sequences(out, n_rows=n_rows, n_entities=n_entities, seed=42,
                    rows_per_file=max(2_000, n_rows // 16))
    with open(marker, "w") as f:
        f.write("ok")
    return out
