"""Ray Data stages: the distributed operators of the engine.

Every temporal operator follows one physical plan (SURVEY.md §7):

1. assign each row an entity hash-bucket (``partition.with_entity_bucket``) —
   the ONE shuffle key reused by windows, sessions, as-of joins and lag
   features;
2. ``groupby(bucket).map_groups`` so each task owns whole entities;
3. inside the group: one multi-key Arrow sort ``(entity, ts)``, then fully
   vectorized per-entity segment computation (searchsorted window bounds,
   cumulative-sum aggregates, shift-based lags).

Stateless per-row work (token kernels, text analysis, hashing) is plain
``map_batches`` over zero-copy Arrow batches and never shuffles.
"""

from pymhealth_ray.stages.partition import with_entity_bucket, entity_segments  # noqa: F401
from pymhealth_ray.stages.rowfeatures import token_features, spectral_features  # noqa: F401
from pymhealth_ray.stages.window import window_features  # noqa: F401
from pymhealth_ray.stages.session import sessionize, session_stats  # noqa: F401
from pymhealth_ray.stages.asof import asof_join  # noqa: F401
from pymhealth_ray.stages.lag import lag_features  # noqa: F401
from pymhealth_ray.stages.rolling import rolling_count_windows  # noqa: F401
from pymhealth_ray.stages.aggregate import grouped_stats, with_squares  # noqa: F401
from pymhealth_ray.stages.signal import detect_rpeaks, detect_pulse_onsets  # noqa: F401

# round-2 training-data / relational operators
from pymhealth_ray.stages.aggregate import grouped_topk, grouped_quantiles  # noqa: F401
from pymhealth_ray.stages.join import equi_join, equi_join_salted, detect_hot_keys  # noqa: F401
from pymhealth_ray.stages.rangejoin import range_join  # noqa: F401
from pymhealth_ray.stages.sketch import grouped_approx_distinct  # noqa: F401
from pymhealth_ray.stages.sample import hash_sample, split_train_eval, grouped_sample_k  # noqa: F401
from pymhealth_ray.stages.vocab import token_vocabulary, top_tokens  # noqa: F401
from pymhealth_ray.stages.pack import pack_sequences, pack_assignments  # noqa: F401
from pymhealth_ray.stages.graph import connected_components  # noqa: F401
from pymhealth_ray.stages.bloom import build_bloom, filter_against_bloom, bloom_contains  # noqa: F401
from pymhealth_ray.stages.decontam import build_shingle_bloom, contamination_scores  # noqa: F401
from pymhealth_ray.stages.profile import profile_table  # noqa: F401
from pymhealth_ray.stages.sample import grouped_weighted_sample_k  # noqa: F401
from pymhealth_ray.stages.dedup import simhash_dupes  # noqa: F401
from pymhealth_ray.stages.text import redact  # noqa: F401
from pymhealth_ray.stages.sketch import build_count_min, count_min_estimate  # noqa: F401
from pymhealth_ray.stages.shuffle import shuffle_positions  # noqa: F401
from pymhealth_ray.stages.gopher import gopher_quality  # noqa: F401
from pymhealth_ray.stages.ewma import ewma_features  # noqa: F401
from pymhealth_ray.stages.pmi import pmi_topk, skipgram_pair_counts  # noqa: F401
from pymhealth_ray.stages.cumulative import cumulative_features  # noqa: F401
from pymhealth_ray.stages.sample import stratified_sample  # noqa: F401
from pymhealth_ray.stages.resample import resample_ffill  # noqa: F401
from pymhealth_ray.stages.rolling import rolling_corr  # noqa: F401
from pymhealth_ray.stages.drift import token_drift_topk, token_slice_counts  # noqa: F401
from pymhealth_ray.stages.pca import pca_components, pca_project, scatter_partials  # noqa: F401
from pymhealth_ray.stages.normalize import zscore_by_group, group_stats_exact  # noqa: F401
from pymhealth_ray.stages.ewma import ewma_time_decay  # noqa: F401
from pymhealth_ray.stages.normalize import bucket_by_group_quantiles  # noqa: F401
from pymhealth_ray.stages.graph import pagerank_tokens  # noqa: F401
from pymhealth_ray.stages.normalize import mad_outliers  # noqa: F401
from pymhealth_ray.stages.asof import asof_join_tolerance  # noqa: F401
from pymhealth_ray.stages.rolling import rolling_zscore  # noqa: F401
from pymhealth_ray.stages.temporal import temporal_feature_pack  # noqa: F401
from pymhealth_ray.stages.pmi import pmi_neighbors  # noqa: F401
from pymhealth_ray.stages.spans import repeated_span_stats, span_counts  # noqa: F401
from pymhealth_ray.stages.spans import cross_doc_span_stats  # noqa: F401
from pymhealth_ray.stages.aggregate import keyed_sum, keyed_agg  # noqa: F401
from pymhealth_ray.stages.lag import compact_unchanged  # noqa: F401
from pymhealth_ray.stages.normalize import percent_rank_by_group  # noqa: F401
