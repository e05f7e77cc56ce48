"""pymhealth_ray — a Ray-Data-native windowed feature-engineering engine.

A from-scratch re-expression of the capabilities of ``callumstew/pymhealth``
(reference at ``/root/reference``) as distributed Ray Data pipelines:

- point-in-time / as-of joins, gap-threshold sessionization, lag/lead/backfill
  and event-time window aggregation over entity-keyed, timestamp-sorted
  Parquet tables of pre-tokenized sequences
  ``(doc_id: string, tokens: list<int32>, n_tok: int32, source: string)``;
- the reference's per-window statistical / time-domain / information /
  HRV-style kernels as a vectorized numpy kernel registry
  (``pymhealth_ray.functions``);
- large-scale training-data ops: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding cosine), ANN similarity search, text analysis,
  multimodal plumbing (``pymhealth_ray.stages``).

Design: every stage is ``ray.data.Dataset`` + ``map_batches`` over zero-copy
Arrow batches; per-entity temporal ops use ONE hash-bucket shuffle
(``groupby(bucket).map_groups``) with in-group ``(entity, ts)`` sort and fully
vectorized per-entity segment computation. Nothing in this package calls
``ray.init()`` — the caller owns the Ray session.
"""

__version__ = "0.1.0"

from pymhealth_ray.config import EngineConfig  # noqa: F401
