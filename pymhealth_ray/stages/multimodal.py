"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with metadata columns
(mime, width/height, sample rate). Decode and feature-extraction are
actor-pool map_batches stages with the real Ray-side plumbing (schema,
batch sizing by BYTES, actor signature, output layout); the codec itself is
STUBBED — the decode libraries are not in this container — behind
``decoder="fake"`` (deterministic synthetic pixels/samples derived from the
payload hash) or ``decoder="real"`` (raises NotImplementedError where
PIL/ffmpeg would be called).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("payload", pa.binary()),
        pa.field("mime", pa.string()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
    ]
)


def synth_media_table(n: int = 64, seed: int = 11) -> pa.Table:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.default_rng(seed)
    sizes = rng.integers(256, 4096, n)
    payloads = [rng.integers(0, 256, s, dtype=np.uint8).tobytes() for s in sizes]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n)),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(["image/png"] * n),
            "width": pa.array(rng.integers(16, 64, n).astype(np.int32)),
            "height": pa.array(rng.integers(16, 64, n).astype(np.int32)),
        }
    )


class ImageDecoder:
    """Actor-pool decode stage. ``__init__`` is where a real codec/model
    would be loaded once per actor; ``__call__`` decodes a batch and emits
    fixed-size float32 feature vectors.

    Batch size must be chosen by BYTES for binary payloads: with
    payload ~P bytes and pool size C, pick batch_size ≈
    target_batch_bytes / P so C concurrent decodes fit in worker heap
    (config.EngineConfig.target_batch_bytes).
    """

    def __init__(self, decoder: str = "fake", thumb: int = 8):
        if decoder not in ("fake", "real"):
            raise ValueError("decoder must be 'fake' or 'real'")
        self.decoder = decoder
        self.thumb = thumb

    def _decode(self, payload: bytes, w: int, h: int) -> np.ndarray:
        if self.decoder == "real":
            raise NotImplementedError(
                "real image decode requires PIL/libvips — not available in "
                "this container; plug the codec in here"
            )
        # deterministic fake pixels: seeded by the payload digest
        seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
        rng = np.random.default_rng(seed)
        return rng.random((h, w), dtype=np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        ws = batch["width"].to_pylist()
        hs = batch["height"].to_pylist()
        feats = np.zeros((batch.num_rows, self.thumb * self.thumb), dtype=np.float32)
        means = np.zeros(batch.num_rows)
        for i, (p, w, h) in enumerate(zip(payloads, ws, hs)):
            img = self._decode(p, w, h)
            # resize by block-mean pooling to thumb×thumb (pure numpy resize)
            ys = np.linspace(0, img.shape[0], self.thumb + 1).astype(int)
            xs = np.linspace(0, img.shape[1], self.thumb + 1).astype(int)
            pooled = np.array(
                [
                    [img[ys[a] : ys[a + 1], xs[b] : xs[b + 1]].mean() for b in range(self.thumb)]
                    for a in range(self.thumb)
                ]
            )
            feats[i] = pooled.ravel()
            means[i] = img.mean()
        out = batch.drop_columns(["payload"])  # features replace the heavy payload
        out = out.append_column(
            "thumb_vec", pa.FixedSizeListArray.from_arrays(pa.array(feats.ravel()), self.thumb * self.thumb)
        )
        return out.append_column("pixel_mean", pa.array(means))


def decode_images(ds, decoder: str = "fake", thumb: int = 8, concurrency=(2, 8), batch_size: int = 64):
    """Image decode → thumbnail feature stage (actor pool; small batches —
    payloads are wide)."""
    return ds.map_batches(
        ImageDecoder,
        fn_constructor_args=(decoder, thumb),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
        num_cpus=1,
    )


class AudioFrameSampler:
    """Audio/video frame-sample plumbing: emits every Nth frame's feature.
    Same stub contract as ImageDecoder."""

    def __init__(self, decoder: str = "fake", frame_stride: int = 4, n_frames: int = 16):
        self.decoder = decoder
        self.frame_stride = frame_stride
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        out_rows = np.zeros((batch.num_rows, self.n_frames), dtype=np.float32)
        for i, p in enumerate(payloads):
            if self.decoder == "real":
                raise NotImplementedError("real audio decode requires ffmpeg — plug in here")
            seed = int.from_bytes(hashlib.md5(p).digest()[:8], "big")
            samples = np.random.default_rng(seed).random(self.n_frames * self.frame_stride)
            out_rows[i] = samples[:: self.frame_stride][: self.n_frames]
        out = batch.drop_columns(["payload"])
        return out.append_column(
            "frame_feats", pa.FixedSizeListArray.from_arrays(pa.array(out_rows.ravel()), self.n_frames)
        )


def sample_audio_frames(ds, decoder: str = "fake", concurrency=(2, 8), batch_size: int = 64):
    return ds.map_batches(
        AudioFrameSampler,
        fn_constructor_args=(decoder,),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


class VideoFrameSampler:
    """Video frame-sample plumbing: decode every ``frame_stride``-th frame,
    thumbnail it, emit one ROW PER SAMPLED FRAME (flat_map-style explode —
    a clip becomes n_frames rows keyed (media_id, frame_idx)). Same stub
    contract as ImageDecoder: 'real' raises at the decode call, the Ray-side
    schema / batching / explode layout is real and tested.

    Batch size for video must be chosen by BYTES (clips are the largest
    payloads in a media table) — batch_size ≈ target_batch_bytes / clip_bytes.
    """

    def __init__(self, decoder: str = "fake", frame_stride: int = 8,
                 max_frames: int = 4, thumb: int = 4):
        if decoder not in ("fake", "real"):
            raise ValueError("decoder must be 'fake' or 'real'")
        self.decoder = decoder
        self.frame_stride = frame_stride
        self.max_frames = max_frames
        self.thumb = thumb

    def _decode_frame(self, payload: bytes, frame_idx: int) -> np.ndarray:
        if self.decoder == "real":
            raise NotImplementedError("real video decode requires ffmpeg/pyav — plug in here")
        seed = int.from_bytes(hashlib.md5(payload + frame_idx.to_bytes(4, "big")).digest()[:8], "big")
        return np.random.default_rng(seed).random(self.thumb * self.thumb).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        ids = batch["media_id"].to_pylist()
        out_ids, out_frames, out_vecs = [], [], []
        for mid, p in zip(ids, payloads):
            # fake "clip length" derived from payload size; real decoders
            # read the container header here
            n_avail = max(1, len(p) // 256)
            sampled = range(0, min(n_avail, self.frame_stride * self.max_frames), self.frame_stride)
            for f in sampled:
                out_ids.append(mid)
                out_frames.append(f)
                out_vecs.append(self._decode_frame(p, f))
        vecs = np.stack(out_vecs) if out_vecs else np.zeros((0, self.thumb * self.thumb), dtype=np.float32)
        return pa.table({
            "media_id": pa.array(out_ids, type=pa.int64()),
            "frame_idx": pa.array(out_frames, type=pa.int64()),
            "frame_vec": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.ravel()), self.thumb * self.thumb),
        })


def sample_video_frames(ds, decoder: str = "fake", frame_stride: int = 8,
                        max_frames: int = 4, thumb: int = 4,
                        concurrency=(2, 8), batch_size: int = 16):
    return ds.map_batches(
        VideoFrameSampler,
        fn_constructor_args=(decoder, frame_stride, max_frames, thumb),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


class ThumbEmbedder:
    """Batched 'model inference' over decoded thumbnails: a seeded random
    projection matrix stands in for model weights — LOADED ONCE PER ACTOR in
    __init__ (the pattern a real encoder follows), applied as one matmul per
    batch. Deterministic, so downstream ANN / dedup tests can rely on it."""

    def __init__(self, in_dim: int, out_dim: int = 16, seed: int = 41):
        self.W = np.random.default_rng(seed).normal(
            size=(in_dim, out_dim)).astype(np.float32) / np.sqrt(in_dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["thumb_vec"] if "thumb_vec" in batch.column_names else batch["frame_vec"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = batch.num_rows
        mat = col.values.to_numpy(zero_copy_only=False).reshape(n, -1).astype(np.float32)
        emb = mat @ self.W
        out_dim = emb.shape[1] if n else self.W.shape[1]
        src = batch.drop_columns([c for c in ("thumb_vec", "frame_vec") if c in batch.column_names])
        return src.append_column(
            "embedding", pa.FixedSizeListArray.from_arrays(pa.array(emb.ravel()), out_dim))


def embed_thumbnails(ds, in_dim: int, out_dim: int = 16, concurrency=(2, 8), batch_size: int = 256):
    return ds.map_batches(
        ThumbEmbedder,
        fn_constructor_args=(in_dim, out_dim),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
