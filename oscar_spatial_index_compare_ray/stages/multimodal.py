"""Multimodal column stages: image/audio/video as opaque ``binary``
columns with typed metadata; decode / feature-extract / resize /
frame-sample as actor-pool ``map_batches`` stages.

The sandbox has no image/audio libraries, so the codec call itself is
STUBBED: ``decode_fn`` raises NotImplementedError unless a
deterministic fake decoder is injected.  Everything Ray-side — schema,
batch sizing, actor signature, output layout — is real and tested
(tests/test_multimodal.py): swapping ``FakeImageCodec`` for a PIL/ffmpeg
adapter is the only change needed on a real cluster.

Batch-size note: binary payloads are large; callers should pass small
``batch_size`` (e.g. 64) so batch × concurrency fits worker heaps.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),   # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
    ]
)


class CodecNotAvailable(NotImplementedError):
    pass


def real_decode(payload: bytes, media_type: str):  # pragma: no cover - stub
    raise CodecNotAvailable(
        "no image/audio libraries in this environment; inject a codec "
        "(e.g. PIL.Image.open / soundfile.read) via the stage's decode_fn"
    )


class FakeImageCodec:
    """Deterministic fake decoder for tests: 'decodes' a payload into a
    (h, w) derived from a stable hash of the bytes, and 'pixels' from a
    counter-based generator.  Real shape of a real codec's output."""

    def __call__(self, payload: bytes, media_type: str) -> dict:
        import hashlib

        h64 = int.from_bytes(hashlib.md5(payload or b"").digest()[:8], "little")
        height = 16 + (h64 & 0x3F)
        width = 16 + ((h64 >> 6) & 0x3F)
        mean = (h64 >> 12) % 256
        return {"height": height, "width": width, "mean_pixel": float(mean)}


class DecodeImages:
    """Actor-pool stage: binary payload → typed metadata + feature cols.

    __init__ holds the (potentially expensive) codec; __call__ is
    per-batch.  num_cpus/concurrency are set by the caller to match the
    codec's cost."""

    def __init__(self, decode_fn=None):
        self.decode = decode_fn or real_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = [
            self.decode(p, t)
            for p, t in zip(
                batch.column("payload").to_pylist(), batch.column("media_type").to_pylist()
            )
        ]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "height": pa.array([m["height"] for m in metas], pa.int32()),
                "width": pa.array([m["width"] for m in metas], pa.int32()),
                "mean_pixel": pa.array([m["mean_pixel"] for m in metas], pa.float64()),
            }
        )


class ResizeImages:
    """Stub resize stage: computes target dims (aspect-preserving) and
    would re-encode via the codec; emits the real output schema."""

    def __init__(self, max_side: int = 32, decode_fn=None):
        self.max_side = max_side
        self.decode = decode_fn or real_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = [
            self.decode(p, "image") for p in batch.column("payload").to_pylist()
        ]
        hs = np.array([m["height"] for m in metas], dtype=np.float64)
        ws = np.array([m["width"] for m in metas], dtype=np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(hs, ws))
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "new_height": pa.array((hs * scale).astype(np.int32), pa.int32()),
                "new_width": pa.array((ws * scale).astype(np.int32), pa.int32()),
            }
        )


class SampleFrames:
    """Stub video frame-sampler: deterministic frame indices per media id
    (every-nth policy); a real impl would pass them to the demuxer."""

    def __init__(self, every_n: int = 10, fake_frame_count: int = 100):
        self.every_n = every_n
        self.n_frames = fake_frame_count

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        out_id, out_frame = [], []
        for mid in ids:
            idxs = list(range(0, self.n_frames, self.every_n))
            out_id.extend([int(mid)] * len(idxs))
            out_frame.extend(idxs)
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_frame, pa.int32()),
            }
        )


def synthetic_media_table(n: int = 64) -> pa.Table:
    """Deterministic fake media corpus for the plumbing tests."""
    ids = np.arange(n, dtype=np.int64)
    payloads = [bytes([(7 * i + j) % 256 for j in range(128)]) for i in ids]
    types = ["image" if i % 3 else "video" for i in ids]
    mimes = ["image/png" if t == "image" else "video/mp4" for t in types]
    return pa.table(
        {
            "media_id": pa.array(ids),
            "media_type": pa.array(types, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes, pa.string()),
        }
    )
