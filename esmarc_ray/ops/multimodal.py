"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a metadata struct; the
compute stages (decode, resize, feature-extract, frame-sample) are actor-pool
``map_batches`` classes whose Ray-side plumbing — schema, batch sizing,
actor signature, output layout — is real and tested, while the *codec* call
itself defaults to ``decoder="fake"`` (deterministic synthetic pixels)
because no image/audio libraries ship in this container; ``decoder="pil"``
activates a real Pillow decode+resize when Pillow is importable (and raises
NotImplementedError otherwise); ``"libav"`` remains a stub.

Batch-size guidance for binary payloads: batches are sized by BYTES not rows
(``media_batch_size_rows``) — a 10 MB image at batch_size=1024 would put
10 GB in one task's heap; keep payload batches small and let the object
store stream.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synthetic_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (payload = seeded bytes)."""
    rows = {name: [] for name in MEDIA_SCHEMA.names}
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 64  # 2 KiB
        rows["media_id"].append(f"m{i:06d}")
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append({"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind])
        rows["width"].append(64 if kind != "audio" else 0)
        rows["height"].append(64 if kind != "audio" else 0)
        rows["duration_ms"].append(0 if kind == "image" else 1000 + i % 5000)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


class MediaDecoder:
    """Actor-pool decode stage.

    ``decoder="fake"``: deterministic pseudo-pixels derived from the payload
    bytes — exercises the full Ray plumbing.  Real decoders are explicit
    NotImplementedError stubs (no PIL/libav in this container).
    """

    def __init__(self, decoder: str = "fake", target_size: tuple[int, int] = (32, 32)):
        if decoder not in ("fake", "pil", "libav"):
            raise ValueError(decoder)
        if decoder == "pil":
            # feature-gated real decoder: used automatically the day PIL
            # lands in the runtime; tests keep decoder="fake" deterministic
            try:
                from PIL import Image  # noqa: F401

                self._pil_image = Image
            except ImportError as exc:  # pragma: no cover - PIL absent here
                raise NotImplementedError(
                    "decoder='pil' requires Pillow, which is not installed in "
                    "this environment; use decoder='fake' (deterministic stub)"
                ) from exc
        elif decoder == "libav":
            raise NotImplementedError(
                "decoder='libav' requires an av/ffmpeg binding not present in "
                "this environment; use decoder='fake' (deterministic stub)"
            )
        self.decoder = decoder
        self.target_size = target_size

    def _decode(self, payload: bytes) -> np.ndarray:
        h, w = self.target_size
        if self.decoder == "pil":  # pragma: no cover - exercised when PIL exists
            import io

            img = self._pil_image.open(io.BytesIO(payload)).convert("RGB")
            img = img.resize((w, h))
            return np.asarray(img, dtype=np.uint8)
        raw = np.frombuffer(
            hashlib.sha256(payload).digest() * ((h * w * 3) // 32 + 1), dtype=np.uint8
        )
        return raw[: h * w * 3].reshape(h, w, 3)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, checksums = [], []
        for payload in batch.column("payload").to_pylist():
            pixels = self._decode(payload)
            # feature-extract: channel means + std (a stand-in embedding)
            feats.append(
                np.concatenate([pixels.mean(axis=(0, 1)), pixels.std(axis=(0, 1))])
                .astype(np.float32)
                .tolist()
            )
            checksums.append(zlib.crc32(payload))
        return (
            batch.drop_columns(["payload"])  # don't carry big bytes past decode
            .append_column("features", pa.array(feats, pa.list_(pa.float32())))
            .append_column("payload_crc", pa.array(checksums, pa.uint32()))
        )


def decode_media(
    media: ray.data.Dataset,
    *,
    decoder: str = "fake",
    media_batch_size_rows: int = 32,
    concurrency: int | tuple[int, int] = 2,
) -> ray.data.Dataset:
    return media.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        batch_size=media_batch_size_rows,
        concurrency=concurrency,
        zero_copy_batch=True,
    )


class FrameSampler:
    """Actor-pool frame-sampling stage for video rows: emits one row per
    sampled frame (deterministic timestamps), non-video rows pass through
    with frame_idx = -1."""

    def __init__(self, fps: float = 1.0):
        self.fps = fps

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {name: [] for name in batch.schema.names}
        out["frame_idx"] = []
        out["frame_ts_ms"] = []
        for row in batch.to_pylist():
            if row["kind"] == "video" and row["duration_ms"] > 0:
                n_frames = max(1, int(row["duration_ms"] / 1000 * self.fps))
                for f in range(n_frames):
                    for name in batch.schema.names:
                        out[name].append(row[name])
                    out["frame_idx"].append(f)
                    out["frame_ts_ms"].append(int(f * 1000 / self.fps))
            else:
                for name in batch.schema.names:
                    out[name].append(row[name])
                out["frame_idx"].append(-1)
                out["frame_ts_ms"].append(-1)
        return pa.Table.from_pydict(out)


def sample_frames(media: ray.data.Dataset, fps: float = 1.0,
                  concurrency: int | tuple[int, int] = 2) -> ray.data.Dataset:
    return media.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"fps": fps},
        batch_format="pyarrow",
        batch_size=16,
        concurrency=concurrency,
    )
