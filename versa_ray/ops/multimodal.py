"""Multimodal (binary-payload) column plumbing.

Media columns are opaque Arrow ``binary`` values with typed metadata
columns beside them. Decode/resize/frame-sample stages are actor-pool
``map_batches`` classes with real Ray plumbing (schema, batch sizing,
actor signatures, output layout); the codec step itself is stubbed:
real image/audio libraries are not in this environment, so ``Decode*``
raises NotImplementedError unless ``fake=True`` selects the
deterministic byte-level fake (byte histograms / strided slices),
which keeps every downstream stage testable.

Batch-size guidance baked into helpers: media rows are wide, so
batches stay small (default 32) and blocks hold few rows — let the
object store spill rather than inflating worker heaps.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),      # image | audio | video
        ("payload", pa.binary()),
        ("meta", pa.string()),      # JSON: {width,height,...}
    ]
)


def synth_media_batch(start: int, stop: int, kind="image", payload_size=4096,
                      seed=42) -> pa.Table:
    """Deterministic fake media rows for plumbing tests."""
    from ..core.mmh3 import hash128_x64

    rows = []
    for i in range(start, stop):
        h = hash128_x64(f"{seed}:media:{i}".encode())[0]
        rng = np.random.RandomState(h % (2**31))
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "payload": rng.randint(0, 256, payload_size, dtype=np.uint8).tobytes(),
                "meta": '{"n":%d}' % payload_size,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


class DecodeImage:
    """Actor-pool stage: binary payload -> fixed-length feature vector.

    Real codecs (PIL/opencv) are unavailable here: with fake=False this
    raises NotImplementedError at construction; with fake=True the
    "decode" is a deterministic 64-bin byte histogram (real numpy work,
    same shape contract a CNN embedding stage would have).
    """

    def __init__(self, fake: bool = False, bins: int = 64):
        if not fake:
            raise NotImplementedError(
                "image decode requires PIL/opencv, not present in this "
                "environment; construct with fake=True for the "
                "deterministic byte-level stand-in"
            )
        self.bins = bins

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch["payload"]:
            arr = np.frombuffer(payload.as_py(), dtype=np.uint8)
            hist, _ = np.histogram(arr, bins=self.bins, range=(0, 256))
            feats.append((hist / max(1, arr.size)).astype(np.float32))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "feature": pa.array([f.tolist() for f in feats],
                                    type=pa.list_(pa.float32())),
            }
        )


class FrameSample:
    """Actor-pool stage: strided byte-window sampling, the plumbing
    shape of video frame sampling (N fixed-size windows per payload,
    one output row per frame)."""

    def __init__(self, n_frames: int = 4, frame_bytes: int = 256, fake: bool = True):
        if not fake:
            raise NotImplementedError("video decode unavailable; use fake=True")
        self.n_frames = n_frames
        self.frame_bytes = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "frame_ix": [], "frame": []}
        for mid, payload in zip(batch["media_id"], batch["payload"]):
            data = payload.as_py()
            if len(data) < self.frame_bytes:
                continue
            stride = max(1, (len(data) - self.frame_bytes) // max(1, self.n_frames - 1))
            for fx in range(self.n_frames):
                off = min(fx * stride, len(data) - self.frame_bytes)
                out["media_id"].append(mid.as_py())
                out["frame_ix"].append(fx)
                out["frame"].append(data[off : off + self.frame_bytes])
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], type=pa.int64()),
                "frame_ix": pa.array(out["frame_ix"], type=pa.int32()),
                "frame": pa.array(out["frame"], type=pa.binary()),
            }
        )


def decode_features(ds, concurrency=2, batch_size=32):
    return ds.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"fake": True},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(ds, n_frames=4, concurrency=2, batch_size=32):
    return ds.map_batches(
        FrameSample,
        fn_constructor_kwargs={"n_frames": n_frames, "fake": True},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
