"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with metadata columns
(mime, width/height, sample rate). Decode and feature-extraction are
actor-pool map_batches stages with the real Ray-side plumbing (schema,
batch sizing by BYTES, actor signature, output layout).

Decoders: ``decoder="fake"`` (deterministic synthetic pixels/samples
derived from the payload hash — the permanent oracle path, driver-gated)
or ``decoder="real"``:

- images: PIL when importable (loaded once per actor in ``__init__``),
  with a dependency-free pure-numpy PNM (P5/P6) parser as fallback —
  so the real path is exercisable even without PIL;
- audio: stdlib ``wave`` for RIFF/PCM payloads (8/16-bit, any channel
  count, mixed to mono); other containers need ffmpeg →
  NotImplementedError;
- video: PyAV when importable; absent → NotImplementedError (the honest
  stub — no ffmpeg in this container).
"""

from __future__ import annotations

import hashlib
import io

import numpy as np
import pyarrow as pa


def _parse_pnm(payload: bytes) -> np.ndarray:
    """Minimal binary PNM decoder (P5 gray / P6 RGB, maxval < 65536) →
    float64 grayscale in [0, 1]. Pure numpy — the in-container 'real
    codec' test vehicle."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM payload")
    pos = 2
    fields = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    ch = 1 if magic == b"P5" else 3
    if maxval < 256:
        raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch,
                               offset=pos).astype(np.float64)
    else:
        raster = np.frombuffer(payload, dtype=">u2", count=w * h * ch,
                               offset=pos).astype(np.float64)
    img = raster.reshape(h, w, ch).mean(axis=2)
    return img / maxval


def _decode_wav(payload: bytes) -> np.ndarray:
    """RIFF/PCM WAV → float64 mono samples in [-1, 1] via stdlib wave."""
    import wave

    with wave.open(io.BytesIO(payload)) as wf:
        n, width, ch = wf.getnframes(), wf.getsampwidth(), wf.getnchannels()
        raw = wf.readframes(n)
    if width == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{8 * width}-bit PCM needs ffmpeg")
    return arr.reshape(-1, ch).mean(axis=1)

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
        self._pil = None
        if decoder == "real":
            try:  # codec import happens ONCE per actor, not per batch
                from PIL import Image

                self._pil = Image
            except ImportError:
                self._pil = None  # PNM fallback still works

    def _decode(self, payload: bytes, w: int, h: int) -> np.ndarray:
        if self.decoder == "real":
            if payload[:2] in (b"P5", b"P6"):
                return _parse_pnm(payload)
            if self._pil is not None:
                img = self._pil.open(io.BytesIO(payload)).convert("L")
                return np.asarray(img, dtype=np.float64) / 255.0
            raise NotImplementedError(
                "real image decode requires PIL/libvips for non-PNM "
                "payloads — not available in this container"
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
                if p[:4] != b"RIFF":
                    raise NotImplementedError(
                        "real audio decode beyond PCM WAV requires ffmpeg")
                samples = _decode_wav(p)
            else:
                seed = int.from_bytes(hashlib.md5(p).digest()[:8], "big")
                samples = np.random.default_rng(seed).random(self.n_frames * self.frame_stride)
            strided = samples[:: self.frame_stride][: self.n_frames]
            out_rows[i, : len(strided)] = strided
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
        self._av = None
        if decoder == "real":
            try:  # container/codec import once per actor
                import av

                self._av = av
            except ImportError:
                self._av = None

    def _decode_frame(self, payload: bytes, frame_idx: int) -> np.ndarray:
        if self.decoder == "real":
            if self._av is None:
                raise NotImplementedError(
                    "real video decode requires PyAV/ffmpeg — not available "
                    "in this container")
            with self._av.open(io.BytesIO(payload)) as container:
                for i, frame in enumerate(container.decode(video=0)):
                    if i == frame_idx:
                        img = frame.to_ndarray(format="gray").astype(np.float64) / 255.0
                        ys = np.linspace(0, img.shape[0], self.thumb + 1).astype(int)
                        xs = np.linspace(0, img.shape[1], self.thumb + 1).astype(int)
                        pooled = np.array([
                            [img[ys[a]: ys[a + 1], xs[b]: xs[b + 1]].mean()
                             for b in range(self.thumb)]
                            for a in range(self.thumb)])
                        return pooled.ravel().astype(np.float32)
            raise ValueError(f"frame {frame_idx} beyond clip length")
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


def phash64(gray: np.ndarray, grid: int = 32, keep: int = 8) -> np.int64:
    """Perceptual hash of a grayscale image: nearest-neighbor resample to
    ``grid``², 2-D DCT-II (pure-numpy cosine basis — no scipy in this
    container), keep the ``keep``² lowest-frequency coefficients and set
    bit k when coefficient k exceeds their median. Robust to resizing
    and small pixel noise; two perceptually-similar images land within a
    small Hamming distance, which :func:`pymhealth_ray.stages.dedup.
    hamming_ball_pairs` turns into the 9th dedup modality."""
    if keep * keep > 64:
        raise ValueError("phash64 packs keep^2 bits into int64: keep <= 8")
    h, w = gray.shape
    ri = (np.arange(grid) * h) // grid
    ci = (np.arange(grid) * w) // grid
    small = gray[np.ix_(ri, ci)].astype(np.float64)
    n = grid
    k = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    C = np.cos(np.pi * k * (2 * x + 1) / (2 * n))
    D = C @ small @ C.T
    coef = D[:keep, :keep].ravel()
    med = np.median(coef)
    bits = (coef > med).astype(np.uint64)
    packed = int((bits << np.arange(keep * keep, dtype=np.uint64)).sum())
    return np.int64(packed - (1 << 64) if packed >= (1 << 63) else packed)


class ImagePHasher:
    """Actor: perceptual-hash a batch of binary image payloads (P5 PNM
    via the pure-numpy parser; PIL-backed codecs would slot into
    _parse_pnm's place exactly as in ImageDecoder)."""

    def __init__(self, grid: int = 32, keep: int = 8):
        self.grid = grid
        self.keep = keep

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        payloads = batch["payload"].to_pylist()
        hashes = np.array([phash64(_parse_pnm(p), self.grid, self.keep)
                           for p in payloads], dtype=np.int64)
        return pa.table({"doc_id": ids, "phash": pa.array(hashes)})


def phash_images(ds, grid: int = 32, keep: int = 8, concurrency=(2, 8),
                 batch_size: int = 64):
    """Actor-pool perceptual hashing of an image payload Dataset →
    (doc_id, phash int64)."""
    return ds.map_batches(ImagePHasher, fn_constructor_args=(grid, keep),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


class AudioVAD:
    """Frame-level VOICE-ACTIVITY features over real PCM WAV payloads:
    the clip splits into non-overlapping ``frame_len``-sample frames;
    per frame RMS energy + zero-crossing count; frames whose energy
    exceeds ``alpha`` × the clip's mean frame energy are "active" (the
    classic energy-threshold VAD used for silence trimming before ASR
    / audio-LM training). Stateful actor per the actor-pool decode
    contract — construct once, decode per batch. Emits per clip:
    n_frames, n_active, longest_active (run length), zc_active (total
    zero crossings inside active frames) — all integers, so results
    hash exactly under any partitioning."""

    def __init__(self, frame_len: int = 200, alpha: float = 1.0):
        self.frame_len = int(frame_len)
        self.alpha = float(alpha)

    def _clip(self, payload: bytes):
        if payload[:4] != b"RIFF":
            raise NotImplementedError(
                "real audio decode beyond PCM WAV requires ffmpeg")
        s = _decode_wav(payload)
        nf = len(s) // self.frame_len
        if nf == 0:
            return 0, 0, 0, 0
        x = s[: nf * self.frame_len].reshape(nf, self.frame_len)
        e = np.sqrt((x * x).mean(axis=1))
        zc = np.count_nonzero(np.diff(np.signbit(x), axis=1), axis=1)
        act = e > self.alpha * e.mean()
        n_active = int(act.sum())
        if n_active:
            # longest run of consecutive active frames
            d = np.diff(np.concatenate(([0], act.view(np.int8), [0])))
            runs = np.flatnonzero(d == -1) - np.flatnonzero(d == 1)
            longest = int(runs.max())
        else:
            longest = 0
        return nf, n_active, longest, int(zc[act].sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = [self._clip(p) for p in batch["payload"].to_pylist()]
        arr = np.asarray(rows, dtype=np.int64).reshape(-1, 4)
        out = batch.drop_columns(["payload"])
        for i, name in enumerate(["n_frames", "n_active",
                                  "longest_active", "zc_active"]):
            out = out.append_column(name, pa.array(arr[:, i]))
        return out


def audio_vad(ds, frame_len: int = 200, alpha: float = 1.0,
              concurrency=(2, 8), batch_size: int = 64):
    return ds.map_batches(
        AudioVAD,
        fn_constructor_args=(frame_len, alpha),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


class PatchExtractor:
    """ViT-style patch layout stage (actor pool): decode each payload
    with the real PNM parser, crop to the largest patch-multiple, and
    explode to one row per non-overlapping P×P patch with its mean
    intensity. The patch grid is the tokenization step of a vision
    transformer ingest — rows out are (doc_id, patch_row, patch_col,
    patch_mean), the layout a trainer consumes shard by shard."""

    def __init__(self, patch: int = 8):
        self.patch = patch

    def __call__(self, batch: pa.Table) -> pa.Table:
        P = self.patch
        ids_out, pr, pc_, pm = [], [], [], []
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        for i in range(len(ids)):
            img = _parse_pnm(payloads[i].as_py())
            h, w = img.shape
            gh, gw = h // P, w // P
            if gh == 0 or gw == 0:
                continue
            crop = img[:gh * P, :gw * P]
            means = crop.reshape(gh, P, gw, P).mean(axis=(1, 3))
            k = gh * gw
            ids_out.append(np.full(k, ids[i], dtype=np.int64))
            rr, cc = np.divmod(np.arange(k, dtype=np.int64), gw)
            pr.append(rr); pc_.append(cc)
            pm.append(means.ravel())
        if not ids_out:
            return pa.table({
                "doc_id": pa.array([], type=pa.int64()),
                "patch_row": pa.array([], type=pa.int64()),
                "patch_col": pa.array([], type=pa.int64()),
                "patch_mean": pa.array([], type=pa.float64())})
        return pa.table({
            "doc_id": pa.array(np.concatenate(ids_out)),
            "patch_row": pa.array(np.concatenate(pr)),
            "patch_col": pa.array(np.concatenate(pc_)),
            "patch_mean": pa.array(np.concatenate(pm))})


def extract_patches(ds, patch: int = 8, concurrency=(2, 8),
                    batch_size: int = 64):
    """Patch-explode stage wrapper (actor pool; small batches — binary
    payloads are wide)."""
    return ds.map_batches(
        PatchExtractor,
        fn_constructor_args=(patch,),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
        num_cpus=1,
    )


class LogMelExtractor:
    """LOG-MEL SPECTROGRAM features from RIFF/PCM WAV payloads — real
    DSP on the real-codec audio path (vs AudioFrameSampler's strided
    raw-sample features): hann-windowed 256-sample frames (hop 128) →
    rfft power spectrum → ``n_mels`` triangular mel filters → log10
    energies → per-payload MEAN mel vector. Pure numpy, payload-
    deterministic, so a single-process replay of this same class is a
    valid oracle. Filterbank built once per ACTOR in __init__."""

    def __init__(self, sr: int = 8000, n_fft: int = 256, hop: int = 128,
                 n_mels: int = 8):
        self.n_fft = n_fft
        self.hop = hop
        self.window = np.hanning(n_fft)
        n_bins = n_fft // 2 + 1
        freqs = np.arange(n_bins, dtype=np.float64) * (sr / n_fft)

        def mel(f):
            return 2595.0 * np.log10(1.0 + f / 700.0)

        def inv_mel(m):
            return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

        pts = inv_mel(np.linspace(mel(0.0), mel(sr / 2.0), n_mels + 2))
        fb = np.zeros((n_mels, n_bins))
        for k in range(n_mels):
            lo, mid, hi = pts[k], pts[k + 1], pts[k + 2]
            up = (freqs - lo) / (mid - lo)
            down = (hi - freqs) / (hi - mid)
            fb[k] = np.maximum(0.0, np.minimum(up, down))
        self.fb = fb

    def features(self, payload: bytes) -> np.ndarray:
        x = _decode_wav(payload)
        n = (len(x) - self.n_fft) // self.hop + 1
        if n < 1:
            return np.full(self.fb.shape[0], -10.0)
        idx = (np.arange(self.n_fft)[None, :]
               + self.hop * np.arange(n)[:, None])
        frames = x[idx] * self.window[None, :]
        spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
        mels = spec @ self.fb.T
        logm = np.log10(mels + 1e-10)
        return logm.mean(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = [self.features(p) for p in payloads]
        return pa.table({
            "doc_id": batch["doc_id"],
            "logmel": pa.array([[float(v) for v in f] for f in feats],
                               type=pa.list_(pa.float64())),
        })


def extract_logmel(ds, concurrency=(2, 8), batch_size: int = 64):
    """Actor-pool log-mel extraction (filterbank built once per actor)."""
    return ds.map_batches(
        LogMelExtractor,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
