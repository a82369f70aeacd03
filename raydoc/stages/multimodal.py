"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed by actor-pool map_batches stages.

The real decode codecs (PIL/ffmpeg/librosa) are NOT in this container,
so the codec boundary is explicit: ``decode_fn`` defaults to a
deterministic fake that parses the synthetic payload header produced by
``make_fake_media``; passing ``decode_fn="real"`` raises
NotImplementedError at the exact line where a codec library would be
called. Everything around that boundary — Arrow schemas, small
batch sizes for multi-MB payloads, per-actor model setup in __init__,
output layout — is real and tested (the Ray-side plumbing is the
deliverable; BASELINE.json multimodal requirement).

Fake payload layout (deterministic, schema-faithful):
    b"IMG1" + width:u32 + height:u32 + channels:u8 + pixel-seed bytes
    b"AUD1" + sample_rate:u32 + n_samples:u32 + pcm-seed bytes
    b"VID1" + width:u32 + height:u32 + n_frames:u32 + frame-seed bytes
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from raydoc.hashing import stable_u64

__all__ = [
    "make_fake_media",
    "ImageDecodeStage",
    "ImageFeatureStage",
    "AudioFeatureStage",
    "VideoFrameSampleStage",
    "MEDIA_SCHEMA",
]

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),  # image | audio | video
        pa.field("payload", pa.binary()),
        pa.field("meta_width", pa.int32()),
        pa.field("meta_height", pa.int32()),
        pa.field("meta_duration_ms", pa.int32()),
    ]
)


def make_fake_media(media_id: int, kind: str = "image") -> dict:
    """Deterministic fake media row (pure function of id)."""
    rng = np.random.RandomState(media_id % (2**31))
    if kind == "image":
        w, h, c = 64 + (media_id % 8) * 32, 64 + (media_id % 5) * 32, 3
        payload = b"IMG1" + struct.pack("<IIB", w, h, c) + rng.bytes(256)
        return {"media_id": media_id, "kind": kind, "payload": payload,
                "meta_width": w, "meta_height": h, "meta_duration_ms": 0}
    if kind == "audio":
        sr, n = 16000, 16000 * (1 + media_id % 5)
        payload = b"AUD1" + struct.pack("<II", sr, n) + rng.bytes(256)
        return {"media_id": media_id, "kind": kind, "payload": payload,
                "meta_width": 0, "meta_height": 0,
                "meta_duration_ms": int(n / sr * 1000)}
    w, h, nf = 320, 240, 24 * (1 + media_id % 4)
    payload = b"VID1" + struct.pack("<III", w, h, nf) + rng.bytes(256)
    return {"media_id": media_id, "kind": kind, "payload": payload,
            "meta_width": w, "meta_height": h,
            "meta_duration_ms": int(nf / 24 * 1000)}


def _fake_decode_image(payload: bytes) -> np.ndarray:
    """Header-driven deterministic pixel tensor (stand-in for
    PIL.Image.open)."""
    if payload[:4] != b"IMG1":
        raise ValueError("not a fake image payload")
    w, h, c = struct.unpack("<IIB", payload[4:13])
    seed = stable_u64(payload[13:45].hex()) % (2**31)
    return np.random.RandomState(seed).randint(0, 256, size=(h, w, c), dtype=np.uint8)


def _real_decode_unavailable(payload: bytes):
    raise NotImplementedError(
        "real image codecs (PIL/opencv) are not available in this "
        "environment; plug a decode_fn(payload)->ndarray here"
    )


class ImageDecodeStage:
    """payload -> decoded dims + mean pixel: actor-pool stage
    (map_batches(ImageDecodeStage, concurrency=(1, N), batch_size=SMALL)).
    Small batch_size is mandatory: each row may carry multi-MB binaries
    (same rule as the extract stage, SURVEY.md §7 hard part 2)."""

    def __init__(self, decode_fn="fake", target_size: int | None = None) -> None:
        # per-actor setup: resolve the codec ONCE (the model-load slot)
        self.decode = (
            _fake_decode_image if decode_fn == "fake" else
            _real_decode_unavailable if decode_fn == "real" else decode_fn
        )
        self.target = target_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, widths, heights, means, status = [], [], [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            try:
                img = self.decode(payload)
                if self.target:
                    # nearest-neighbor "resize" (index stride), codec-free
                    sy = max(1, img.shape[0] // self.target)
                    sx = max(1, img.shape[1] // self.target)
                    img = img[::sy, ::sx]
                ids.append(mid)
                heights.append(img.shape[0])
                widths.append(img.shape[1])
                means.append(float(img.mean()))
                status.append("ok")
            except Exception as e:
                ids.append(mid)
                heights.append(0)
                widths.append(0)
                means.append(0.0)
                status.append(f"error:{type(e).__name__}")
        return pa.Table.from_pydict(
            {"media_id": pa.array(ids, pa.int64()),
             "width": pa.array(widths, pa.int32()),
             "height": pa.array(heights, pa.int32()),
             "mean_pixel": pa.array(means, pa.float64()),
             "status": pa.array(status, pa.string())}
        )


class ImageFeatureStage:
    """decoded image -> fixed-dim feature vector (deterministic hash
    projection as the model stand-in; a real embedder loads its weights
    in __init__ and batches inference in __call__)."""

    def __init__(self, dim: int = 32, decode_fn="fake") -> None:
        self.dim = dim
        self.decode = _fake_decode_image if decode_fn == "fake" else decode_fn
        # "model": fixed random projection, built once per actor
        self.proj = np.random.RandomState(5).standard_normal((256, dim))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, feats, status = [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            ids.append(mid)
            try:  # in-band error rows: one bad payload never kills the job
                img = self.decode(payload)
                hist = np.bincount(
                    img.reshape(-1), minlength=256
                )[:256].astype(np.float64)
                hist /= max(hist.sum(), 1.0)
                feats.append((hist @ self.proj).tolist())
                status.append("ok")
            except Exception as e:
                feats.append(None)
                status.append(f"error:{type(e).__name__}:{e}"[:200])
        return pa.Table.from_pydict(
            {"media_id": pa.array(ids, pa.int64()),
             "feature": pa.array(feats, pa.list_(pa.float64())),
             "status": pa.array(status, pa.string())}
        )


class AudioFeatureStage:
    """audio payload -> (duration_s, n_windows) via header parse; the
    PCM decode itself is the stubbed codec boundary."""

    def __init__(self, window_ms: int = 25) -> None:
        self.window_ms = window_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, durs, wins = [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            if payload[:4] != b"AUD1":
                raise NotImplementedError("real audio codecs unavailable; stub")
            sr, n = struct.unpack("<II", payload[4:12])
            ids.append(mid)
            durs.append(n / sr)
            wins.append(int((n / sr * 1000) // self.window_ms))
        return pa.Table.from_pydict(
            {"media_id": pa.array(ids, pa.int64()),
             "duration_s": pa.array(durs, pa.float64()),
             "n_windows": pa.array(wins, pa.int64())}
        )


class VideoFrameSampleStage:
    """video payload -> one row per sampled frame index (flat_map-style
    explode; every_n frames). Frame pixel decode is the stubbed codec."""

    def __init__(self, every_n: int = 12) -> None:
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames = [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            if payload[:4] != b"VID1":
                raise NotImplementedError("real video codecs unavailable; stub")
            _w, _h, nf = struct.unpack("<III", payload[4:16])
            for fi in range(0, nf, self.every_n):
                ids.append(mid)
                frames.append(fi)
        return pa.Table.from_pydict(
            {"media_id": pa.array(ids, pa.int64()),
             "frame_idx": pa.array(frames, pa.int64())}
        )
