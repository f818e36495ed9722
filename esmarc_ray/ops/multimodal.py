"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a metadata struct; the
compute stages (decode, resize, feature-extract, frame-sample) are actor-pool
``map_batches`` classes.  Decoder tiers:

* ``decoder="native"`` (default for the synthetic corpus): REAL decode of
  genuine BMP image / WAV audio bytes with the pure-numpy codecs in
  ``ops.media_codecs`` — header parse, pixel/sample extraction,
  nearest-neighbor resize, feature extraction.  Rows whose payload is
  neither format (e.g. video, which needs libav) get ``decode_ok=False``
  and zeroed features instead of failing the task (dead-letter semantics,
  same policy as the extract stage).
* ``decoder="fake"``: deterministic pseudo-pixels hashed from the payload —
  plumbing-only mode, decodes anything.
* ``decoder="pil"`` / ``"libav"``: feature-gated real libraries; raise
  NotImplementedError in this container (no Pillow / ffmpeg binding).

Batch-size guidance for binary payloads: batches are sized by BYTES not rows
(``media_batch_size_rows``) — a 10 MB image at batch_size=1024 would put
10 GB in one task's heap; keep payload batches small and let the object
store stream.
"""

from __future__ import annotations

import hashlib
import struct
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


def _synthetic_image(i: int, seed: int, w: int, h: int) -> bytes:
    """Deterministic gradient pixels (no RNG — version-proof) → real BMP."""
    from esmarc_ray.ops.media_codecs import encode_bmp

    digest = hashlib.sha256(f"{seed}:{i}".encode()).digest()
    phase = np.frombuffer(digest[:3], dtype=np.uint8).astype(np.int32)
    yy, xx = np.mgrid[0:h, 0:w]
    pixels = ((yy[..., None] * 5 + xx[..., None] * 3) * np.array([1, 2, 3]) + phase) % 256
    return encode_bmp(pixels.astype(np.uint8))


def _synthetic_audio(i: int, duration_ms: int, sample_rate: int = 8000) -> bytes:
    """Integer triangle wave (deterministic, no libm) → real WAV."""
    from esmarc_ray.ops.media_codecs import encode_wav

    n = sample_rate * duration_ms // 1000
    freq = 220 + (i % 32) * 15
    p = (np.arange(n, dtype=np.int64) * freq) % sample_rate
    tri = np.where(p < sample_rate // 2, p, sample_rate - p)
    samples = (tri * 48_000 // sample_rate - 12_000).astype(np.int16)
    return encode_wav(samples, sample_rate)


def synthetic_media_table(n: int, seed: int = 42, payloads: str = "native") -> pa.Table:
    """Deterministic media rows.

    ``payloads="native"`` (default) emits GENUINE media bytes — 24-bit BMP
    images and PCM-16 WAV audio built by ``ops.media_codecs`` — so the
    decode stage exercises real header parsing; video payloads stay opaque
    seeded bytes (no container-friendly video codec).  ``payloads="fake"``
    emits seeded opaque bytes for every kind (plumbing-only mode).
    """
    if payloads not in ("native", "fake"):
        raise ValueError(payloads)
    rows = {name: [] for name in MEDIA_SCHEMA.names}
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        w = h = 0
        if kind == "image":
            w, h = 16 + (i % 5) * 8, 12 + (i % 7) * 6
            duration_ms = 0
        elif kind == "audio":
            duration_ms = 100 + (i % 16) * 25
        else:
            w, h, duration_ms = 64, 64, 1000 + i % 5000
        if payloads == "native" and kind == "image":
            payload, mime = _synthetic_image(i, seed, w, h), "image/bmp"
        elif payloads == "native" and kind == "audio":
            payload, mime = _synthetic_audio(i, duration_ms), "audio/wav"
        else:
            payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 64  # 2 KiB
            mime = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind]
        rows["media_id"].append(f"m{i:06d}")
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append(mime)
        rows["width"].append(w)
        rows["height"].append(h)
        rows["duration_ms"].append(duration_ms)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


class MediaDecoder:
    """Actor-pool decode stage.

    ``decoder="native"``: REAL BMP/WAV decode via ``ops.media_codecs``
    (magic-byte sniff per payload; undecodable rows get ``decode_ok=False``
    + zero features, never a task failure).  ``decoder="fake"``:
    deterministic pseudo-pixels derived from the payload bytes — exercises
    the full Ray plumbing on any bytes.  ``"pil"``/``"libav"`` are
    feature-gated on libraries absent from this container.
    """

    def __init__(self, decoder: str = "native", target_size: tuple[int, int] = (32, 32)):
        if decoder not in ("native", "fake", "pil", "libav"):
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

    def _native_features(self, payload: bytes) -> tuple[list[float], bool]:
        """Sniff + decode one real payload; (6-dim features, decode_ok)."""
        import struct

        from esmarc_ray.ops import media_codecs as mc

        mime = mc.sniff_mime(payload)
        try:
            if mime == "image/bmp":
                pixels = mc.resize_nearest(mc.decode_bmp(payload), self.target_size)
                return (
                    np.concatenate([pixels.mean(axis=(0, 1)), pixels.std(axis=(0, 1))])
                    .astype(np.float32)
                    .tolist(),
                    True,
                )
            if mime == "audio/wav":
                samples, sr = mc.decode_wav(payload)
                x = samples.astype(np.float64)
                zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if len(x) > 1 else 0.0
                feats = [
                    float(np.sqrt(np.mean(x**2))),  # rms
                    zcr,
                    len(x) / sr,  # duration seconds
                    float(x.mean()),
                    float(x.std()),
                    float(np.abs(x).max(initial=0.0)),
                ]
                return np.asarray(feats, dtype=np.float32).tolist(), True
        except (ValueError, struct.error):
            # malformed/truncated header → dead-letter row, same as unknown
            # format (struct.error is NOT a ValueError subclass)
            pass
        return [0.0] * 6, False

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, checksums, oks = [], [], []
        for payload in batch.column("payload").to_pylist():
            if self.decoder == "native":
                f, ok = self._native_features(payload)
            else:
                pixels = self._decode(payload)
                # feature-extract: channel means + std (a stand-in embedding)
                f = (
                    np.concatenate([pixels.mean(axis=(0, 1)), pixels.std(axis=(0, 1))])
                    .astype(np.float32)
                    .tolist()
                )
                ok = True
            feats.append(f)
            oks.append(ok)
            checksums.append(zlib.crc32(payload))
        return (
            batch.drop_columns(["payload"])  # don't carry big bytes past decode
            .append_column("features", pa.array(feats, pa.list_(pa.float32())))
            .append_column("payload_crc", pa.array(checksums, pa.uint32()))
            .append_column("decode_ok", pa.array(oks, pa.bool_()))
        )


def decode_media(
    media: ray.data.Dataset,
    *,
    decoder: str = "native",
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
    with frame_idx = -1.

    Vectorized fan-out: per-row frame counts → one ``Table.take`` with a
    repeat-index array (zero-copy of the payload column) — no Python loop
    over rows."""

    def __init__(self, fps: float = 1.0):
        self.fps = fps

    def __call__(self, batch: pa.Table) -> pa.Table:
        kind = batch.column("kind").to_numpy(zero_copy_only=False)
        dur = batch.column("duration_ms").to_numpy(zero_copy_only=False)
        is_video = (kind == "video") & (dur > 0)
        n_frames = np.where(
            is_video, np.maximum(1, (dur / 1000 * self.fps).astype(np.int64)), 1
        )
        take_idx = np.repeat(np.arange(len(batch), dtype=np.int64), n_frames)
        # frame index within each fanned-out row group: 0..n_frames-1
        starts = np.concatenate(([0], np.cumsum(n_frames)[:-1]))
        local = np.arange(len(take_idx), dtype=np.int64) - np.repeat(starts, n_frames)
        frame_idx = np.where(np.repeat(is_video, n_frames), local, -1)
        frame_ts = np.where(frame_idx >= 0, (frame_idx * 1000 / self.fps).astype(np.int64), -1)
        out = batch.take(pa.array(take_idx))
        return out.append_column(
            "frame_idx", pa.array(frame_idx, pa.int64())
        ).append_column("frame_ts_ms", pa.array(frame_ts, pa.int64()))


def sample_frames(media: ray.data.Dataset, fps: float = 1.0,
                  concurrency: int | tuple[int, int] = 2) -> ray.data.Dataset:
    return media.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"fps": fps},
        batch_format="pyarrow",
        batch_size=16,
        concurrency=concurrency,
    )


def ahash64(pixels: np.ndarray) -> int:
    """64-bit perceptual average-hash of an RGB (H, W, 3) uint8 image:
    grayscale mean → deterministic 8×8 nearest resize → mean threshold →
    row-major bit pack.  Stable under re-encode, mild noise and modest
    resizes (the transformations format-variant media dups actually have);
    pure numpy, no codec libraries."""
    from esmarc_ray.ops.media_codecs import resize_nearest

    gray = pixels.astype(np.float64).mean(axis=2)
    small = resize_nearest(gray[..., None], (8, 8))[..., 0]
    bits = (small >= small.mean()).flatten()
    return int(np.packbits(bits).view(">u8")[0])


def phash_media(
    media: ray.data.Dataset, *, concurrency=(2, 8), batch_size: int = 64
) -> ray.data.Dataset:
    """Perceptual-hash stage: (media_id, phash, phash_ok) per row.  BMP
    payloads (magic-sniffed) decode with the native codec and hash via
    :func:`ahash64`; non-image / undecodable payloads get ``phash_ok=False``
    (never a task failure).  Actor pool, byte-sized batches — the payload
    column is dropped on output so only 16 bytes/row leave the stage."""
    from esmarc_ray.ops.media_codecs import decode_bmp, sniff_mime

    class Hasher:
        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("media_id").to_pylist()
            payloads = batch.column("payload").to_pylist()
            hashes, ok = [], []
            for p in payloads:
                try:
                    if sniff_mime(p) != "image/bmp":
                        raise ValueError("not a decodable image")
                    hashes.append(ahash64(decode_bmp(p)))
                    ok.append(True)
                except (ValueError, IndexError):
                    hashes.append(0)
                    ok.append(False)
            return pa.Table.from_pydict(
                {
                    "media_id": pa.array(ids, pa.string()),
                    "phash": pa.array(hashes, pa.uint64()),
                    "phash_ok": pa.array(ok, pa.bool_()),
                }
            )

    return media.map_batches(
        Hasher, batch_size=batch_size, concurrency=concurrency,
        batch_format="pyarrow", zero_copy_batch=True,
    )


def media_phash_dups(
    media: ray.data.Dataset, *, max_hamming: int = 3, concurrency=(2, 8)
) -> ray.data.Dataset:
    """Near-duplicate media detection across format variants (re-encodes,
    resizes, mild noise): perceptual hash per payload, then the generic
    16-bit-chunk bucket + exact-hamming machinery shared with SimHash text
    dedup.  Returns (doc_a, doc_b, hamming) media-id pairs."""
    from esmarc_ray.ops.dedup import hamming_near_dups

    sigs = phash_media(media, concurrency=concurrency).filter(expr="phash_ok")
    return hamming_near_dups(
        sigs, id_column="media_id", sig_column="phash", max_hamming=max_hamming
    )


def audio_features(
    media: ray.data.Dataset,
    *,
    id_column: str = "media_id",
    payload_column: str = "payload",
    batch_size: int = 64,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Audio DSP feature extraction over WAV payloads — the audio-side
    analogue of the image feature stage: per clip ``duration_s``, ``rms``
    (normalized to int16 full scale), ``zcr_hz`` (zero-crossing rate),
    ``spectral_centroid_hz`` / ``spectral_bandwidth_hz`` (magnitude-
    weighted rFFT moments) and ``rolloff85_hz`` (85% spectral-energy
    frequency).  Undecodable payloads get ``audio_ok=False`` dead-letter
    rows, never a task failure.

    Actor-pool stage (decode state is trivial but the pool caps peak
    payload memory like every media stage); all math is vectorized numpy
    per clip — one rFFT per payload, no Python inner loops.  Feature
    correctness is gated by tests/test_media.py::test_audio_features_dsp
    (pure sine → centroid/ZCR at the planted frequency; noise → wider
    bandwidth).
    """
    import pyarrow as pa

    from esmarc_ray.ops.media_codecs import decode_wav, sniff_mime

    class AudioFeatures:
        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_column).to_pylist()
            payloads = batch.column(payload_column).to_pylist()
            cols: dict[str, list] = {
                "duration_s": [], "rms": [], "zcr_hz": [],
                "spectral_centroid_hz": [], "spectral_bandwidth_hz": [],
                "rolloff85_hz": [], "audio_ok": [],
            }
            for p in payloads:
                try:
                    if sniff_mime(p) != "audio/wav":
                        raise ValueError("not a WAV payload")
                    samples, sr = decode_wav(p)
                    if not len(samples):
                        raise ValueError("empty clip")
                    x = samples.astype(np.float64) / 32768.0
                    n = len(x)
                    rms = float(np.sqrt(np.mean(x * x)))
                    crossings = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
                    zcr_hz = crossings / 2.0 * sr / max(n - 1, 1)
                    mag = np.abs(np.fft.rfft(x))
                    freqs = np.fft.rfftfreq(n, d=1.0 / sr)
                    power = mag * mag
                    tot = power.sum()
                    if tot <= 0.0:
                        raise ValueError("silent clip")
                    centroid = float((freqs * power).sum() / tot)
                    bandwidth = float(
                        np.sqrt(((freqs - centroid) ** 2 * power).sum() / tot)
                    )
                    cum = np.cumsum(power)
                    rolloff = float(freqs[np.searchsorted(cum, 0.85 * tot)])
                    cols["duration_s"].append(n / sr)
                    cols["rms"].append(rms)
                    cols["zcr_hz"].append(zcr_hz)
                    cols["spectral_centroid_hz"].append(centroid)
                    cols["spectral_bandwidth_hz"].append(bandwidth)
                    cols["rolloff85_hz"].append(rolloff)
                    cols["audio_ok"].append(True)
                except (ValueError, IndexError, struct.error):
                    for k in cols:
                        cols[k].append(False if k == "audio_ok" else 0.0)
            out = {id_column: pa.array(ids, pa.string())}
            for k, vals in cols.items():
                out[k] = pa.array(
                    vals, pa.bool_() if k == "audio_ok" else pa.float64()
                )
            return pa.Table.from_pydict(out)

    return media.map_batches(
        AudioFeatures, batch_size=batch_size, concurrency=concurrency,
        batch_format="pyarrow", zero_copy_batch=True,
    )


def image_features(
    media: ray.data.Dataset,
    *,
    id_column: str = "media_id",
    payload_column: str = "payload",
    batch_size: int = 64,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Image structure features over BMP payloads — the texture/edge leg of
    the interleaved media path (channel-moment features live in
    :class:`MediaDecoder`): per image ``width``/``height``, ``mean_luma`` /
    ``luma_std`` (BT.601 luminance mean and contrast), ``edge_density``
    (fraction of interior pixels whose Sobel gradient magnitude exceeds
    32/255 full scale), ``grad_mean`` (mean Sobel magnitude) and
    ``hist_entropy`` (Shannon entropy of the 16-bin luma histogram, bits).
    Undecodable payloads get ``image_ok=False`` dead-letter rows.

    Actor-pool stage sized like every media stage (small batches cap peak
    payload memory); per image the Sobel response is two vectorized
    convolutions expressed as shifted-array sums — no Python pixel loops.
    Feature correctness is gated by
    tests/test_media.py::test_image_features_structure (flat field → zero
    edges and entropy; period-4 stripes → near-total edge density; a single
    step → edge density localized to the boundary).
    """
    import pyarrow as pa

    from esmarc_ray.ops.media_codecs import decode_bmp, sniff_mime

    class ImageFeatures:
        @staticmethod
        def _sobel_mag(luma: np.ndarray) -> np.ndarray:
            # 3x3 Sobel via shifted slices on the padded plane (replicate
            # edges); returns magnitude over the full plane
            p = np.pad(luma, 1, mode="edge").astype(np.float64)
            gx = (
                (p[:-2, 2:] + 2.0 * p[1:-1, 2:] + p[2:, 2:])
                - (p[:-2, :-2] + 2.0 * p[1:-1, :-2] + p[2:, :-2])
            )
            gy = (
                (p[2:, :-2] + 2.0 * p[2:, 1:-1] + p[2:, 2:])
                - (p[:-2, :-2] + 2.0 * p[:-2, 1:-1] + p[:-2, 2:])
            )
            return np.hypot(gx, gy)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_column).to_pylist()
            payloads = batch.column(payload_column).to_pylist()
            cols: dict[str, list] = {
                "width": [], "height": [], "mean_luma": [], "luma_std": [],
                "edge_density": [], "grad_mean": [], "hist_entropy": [],
                "image_ok": [],
            }
            for p in payloads:
                try:
                    if sniff_mime(p) != "image/bmp":
                        raise ValueError("not a BMP payload")
                    px = decode_bmp(p).astype(np.float64)
                    h, w = px.shape[:2]
                    luma = (
                        0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
                    )
                    mag = self._sobel_mag(luma)
                    # Sobel max response is 4·255 per axis; normalize to the
                    # 0-255 luma scale before thresholding
                    mag_scaled = mag / 4.0
                    hist, _ = np.histogram(luma, bins=16, range=(0.0, 256.0))
                    freq = hist / max(luma.size, 1)
                    nz = freq[freq > 0]
                    cols["width"].append(w)
                    cols["height"].append(h)
                    cols["mean_luma"].append(float(luma.mean()))
                    cols["luma_std"].append(float(luma.std()))
                    cols["edge_density"].append(
                        float(np.mean(mag_scaled > 32.0))
                    )
                    cols["grad_mean"].append(float(mag_scaled.mean()))
                    cols["hist_entropy"].append(
                        float(-(nz * np.log2(nz)).sum())
                    )
                    cols["image_ok"].append(True)
                except (ValueError, IndexError, struct.error):
                    for k in cols:
                        cols[k].append(False if k == "image_ok" else 0.0)
            out = {id_column: pa.array(ids, pa.string())}
            for k, vals in cols.items():
                if k == "image_ok":
                    out[k] = pa.array(vals, pa.bool_())
                elif k in ("width", "height"):
                    out[k] = pa.array([int(v) for v in vals], pa.int32())
                else:
                    out[k] = pa.array([float(v) for v in vals], pa.float64())
            return pa.Table.from_pydict(out)

    return media.map_batches(
        ImageFeatures, batch_size=batch_size, concurrency=concurrency,
        batch_format="pyarrow", zero_copy_batch=True,
    )


def synthetic_video_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic BMV video clips with PLANTED scene structure: each clip
    has 2–4 scenes of 3–6 frames; within a scene frames share a base color
    plus a small per-frame deterministic perturbation (|Δluma| ≤ 4), across
    a cut the base jumps by ≥ 80 luma — so shot boundaries are exactly
    recoverable.  Ground truth rides along as ``cut_frames`` (JSON list of
    first-frame-of-scene indexes, excluding 0)."""
    import json

    from esmarc_ray.ops.media_codecs import encode_bmv

    rows = {"media_id": [], "payload": [], "n_frames": [], "cut_frames": []}
    for i in range(n):
        h = w = 16
        n_scenes = 2 + (i * 7 + seed) % 3
        frames, cuts = [], []
        level = 20 + (i * 37) % 60
        for s in range(n_scenes):
            if s:
                cuts.append(len(frames))
                level = (level + 90 + (i + s * 13) % 40) % 200 + 28
            n_f = 3 + (i + s * 5) % 4
            for f in range(n_f):
                jitter = ((i + s * 3 + f * 7) % 9) - 4  # |Δ| ≤ 4
                px = np.full((h, w, 3), np.clip(level + jitter, 0, 255), np.uint8)
                frames.append(px)
        rows["media_id"].append(f"v{i:06d}")
        rows["payload"].append(encode_bmv(frames, fps=10))
        rows["n_frames"].append(len(frames))
        rows["cut_frames"].append(json.dumps(cuts))
    return pa.table(
        {
            "media_id": pa.array(rows["media_id"], pa.string()),
            "payload": pa.array(rows["payload"], pa.binary()),
            "n_frames": pa.array(rows["n_frames"], pa.int32()),
            "cut_frames": pa.array(rows["cut_frames"], pa.string()),
        }
    )


def shot_boundaries(
    media: ray.data.Dataset,
    *,
    id_column: str = "media_id",
    payload_column: str = "payload",
    threshold: float = 24.0,
    batch_size: int = 16,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Video shot-boundary detection over BMV clips: per clip the mean
    absolute BT.601 luma difference between consecutive frames, a boundary
    wherever it exceeds ``threshold`` (0–255 scale).  Emits one row per clip:
    ``n_frames``, ``n_shots`` (= boundaries + 1), ``boundaries`` (list of
    first-frame-of-shot indexes) and ``max_frame_diff``; undecodable
    payloads get ``video_ok=False`` dead-letter rows.

    Actor-pool stage (a clip's decoded frames live only inside one
    ``__call__``; small batches cap peak frame memory).  The per-clip diff
    is one vectorized (n_frames−1, H, W) tensor op.  Recovery of planted
    cuts is gated by tests/test_media.py::test_shot_boundaries_planted.
    """
    import pyarrow as pa

    from esmarc_ray.ops.media_codecs import decode_bmv, sniff_mime

    class ShotDetect:
        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_column).to_pylist()
            payloads = batch.column(payload_column).to_pylist()
            cols: dict[str, list] = {
                "n_frames": [], "n_shots": [], "boundaries": [],
                "max_frame_diff": [], "video_ok": [],
            }
            for p in payloads:
                try:
                    if sniff_mime(p) != "video/x-bmv":
                        raise ValueError("not a BMV payload")
                    frames, _fps = decode_bmv(p)
                    stack = np.stack(frames).astype(np.float64)
                    luma = (
                        0.299 * stack[..., 0]
                        + 0.587 * stack[..., 1]
                        + 0.114 * stack[..., 2]
                    )
                    if len(frames) > 1:
                        diffs = np.abs(np.diff(luma, axis=0)).mean(axis=(1, 2))
                        cut_idx = (np.nonzero(diffs > threshold)[0] + 1).tolist()
                        max_diff = float(diffs.max())
                    else:
                        cut_idx, max_diff = [], 0.0
                    cols["n_frames"].append(len(frames))
                    cols["n_shots"].append(len(cut_idx) + 1)
                    cols["boundaries"].append([int(c) for c in cut_idx])
                    cols["max_frame_diff"].append(max_diff)
                    cols["video_ok"].append(True)
                except (ValueError, IndexError, struct.error):
                    cols["n_frames"].append(0)
                    cols["n_shots"].append(0)
                    cols["boundaries"].append([])
                    cols["max_frame_diff"].append(0.0)
                    cols["video_ok"].append(False)
            return pa.Table.from_pydict(
                {
                    id_column: pa.array(ids, pa.string()),
                    "n_frames": pa.array(cols["n_frames"], pa.int32()),
                    "n_shots": pa.array(cols["n_shots"], pa.int32()),
                    "boundaries": pa.array(cols["boundaries"], pa.list_(pa.int32())),
                    "max_frame_diff": pa.array(cols["max_frame_diff"], pa.float64()),
                    "video_ok": pa.array(cols["video_ok"], pa.bool_()),
                }
            )

    return media.map_batches(
        ShotDetect, batch_size=batch_size, concurrency=concurrency,
        batch_format="pyarrow", zero_copy_batch=True,
    )


def mel_features(
    media: ray.data.Dataset,
    *,
    n_mels: int = 12,
    fmin: float = 80.0,
    fmax: float | None = None,
    id_column: str = "media_id",
    payload_column: str = "payload",
    batch_size: int = 64,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Log-mel filterbank energies over WAV payloads — the MFCC front end
    (sans DCT) used by every speech/audio model: rFFT power spectrum →
    ``n_mels`` triangular filters spaced evenly on the mel scale
    (HTK convention, mel = 2595·log10(1 + f/700)) → log10 band energies.
    Emits ``mel_0..mel_{n-1}`` plus ``dominant_band`` (argmax) per clip;
    undecodable payloads dead-letter with ``mel_ok=False``.

    Actor-pool stage: the filterbank matrix depends only on (sample_rate,
    n_fft) and is memoized per actor across batches — built once, applied
    as one (n_bins × n_mels) matmul per clip.  Band localization of planted
    tones is gated by tests/test_media.py::test_mel_features_bands.
    """
    import pyarrow as pa

    from esmarc_ray.ops.media_codecs import decode_wav, sniff_mime

    class MelFeatures:
        def __init__(self):
            self._banks: dict[tuple[int, int], np.ndarray] = {}

        @staticmethod
        def _mel(f: np.ndarray) -> np.ndarray:
            return 2595.0 * np.log10(1.0 + f / 700.0)

        @staticmethod
        def _inv_mel(m: np.ndarray) -> np.ndarray:
            return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

        def _bank(self, sr: int, n_bins: int, n: int) -> np.ndarray:
            # key on the FFT length n, not n_bins: n_bins = n//2+1 collides
            # for clip lengths n and n+1 whose rfftfreq grids differ, which
            # would make the bank depend on which clip an actor saw first
            key = (sr, n)
            bank = self._banks.get(key)
            if bank is None:
                top = fmax if fmax is not None else sr / 2.0
                pts = self._inv_mel(
                    np.linspace(self._mel(np.array(fmin)), self._mel(np.array(top)), n_mels + 2)
                )
                freqs = np.fft.rfftfreq(n, d=1.0 / sr)
                bank = np.zeros((n_bins, n_mels))
                for j in range(n_mels):
                    lo, mid, hi = pts[j], pts[j + 1], pts[j + 2]
                    up = (freqs - lo) / max(mid - lo, 1e-9)
                    down = (hi - freqs) / max(hi - mid, 1e-9)
                    bank[:, j] = np.clip(np.minimum(up, down), 0.0, 1.0)
                self._banks[key] = bank
            return bank

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_column).to_pylist()
            payloads = batch.column(payload_column).to_pylist()
            mels, dom, oks = [], [], []
            for p in payloads:
                try:
                    if sniff_mime(p) != "audio/wav":
                        raise ValueError("not a WAV payload")
                    samples, sr = decode_wav(p)
                    if not len(samples):
                        raise ValueError("empty clip")
                    x = samples.astype(np.float64) / 32768.0
                    n = len(x)
                    power = np.abs(np.fft.rfft(x)) ** 2
                    bank = self._bank(sr, len(power), n)
                    e = power @ bank
                    loge = np.log10(e + 1e-12)
                    mels.append(loge.astype(np.float64).tolist())
                    dom.append(int(np.argmax(e)))
                    oks.append(True)
                except (ValueError, IndexError, struct.error):
                    mels.append([0.0] * n_mels)
                    dom.append(-1)
                    oks.append(False)
            return pa.Table.from_pydict(
                {
                    id_column: pa.array(ids, pa.string()),
                    "mel": pa.array(mels, pa.list_(pa.float64())),
                    "dominant_band": pa.array(dom, pa.int32()),
                    "mel_ok": pa.array(oks, pa.bool_()),
                }
            )

    return media.map_batches(
        MelFeatures, batch_size=batch_size, concurrency=concurrency,
        batch_format="pyarrow", zero_copy_batch=True,
    )


def audio_resample(
    media: ray.data.Dataset,
    target_sr: int,
    *,
    id_column: str = "media_id",
    payload_column: str = "payload",
    batch_size: int = 64,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Audio sample-rate conversion stage — the normalize-before-training
    step of an audio corpus pipeline: every WAV payload linearly resamples
    to ``target_sr`` and re-encodes (pure-numpy interpolation over the
    original sample grid; no Python inner loop).  Emits the resampled
    ``payload`` plus ``orig_sr`` / ``n_samples_out`` / ``rms_ratio``
    (output RMS over input RMS — ≈1.0 for band-limited content, the
    quick-look QA column).  Undecodable payloads dead-letter with
    ``resample_ok=False`` and an empty payload, never a task failure.

    Actor-pool stage (caps peak payload memory); frequency preservation is
    gated by tests/test_media.py::test_audio_resample_preserves_tone (a
    planted tone's dominant FFT frequency survives the rate change).
    """
    import pyarrow as pa

    from esmarc_ray.ops.media_codecs import decode_wav, encode_wav, sniff_mime

    class Resampler:
        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_column).to_pylist()
            payloads = batch.column(payload_column).to_pylist()
            out_payload, orig_srs, n_outs, ratios, oks = [], [], [], [], []
            for p in payloads:
                try:
                    if sniff_mime(p) != "audio/wav":
                        raise ValueError("not a WAV payload")
                    samples, sr = decode_wav(p)
                    x = samples.astype(np.float64)
                    n_out = max(1, int(round(len(x) * target_sr / sr)))
                    t_out = np.arange(n_out) * (sr / target_sr)
                    y = np.interp(t_out, np.arange(len(x)), x)
                    rms_in = float(np.sqrt((x**2).mean())) or 1.0
                    rms_out = float(np.sqrt((y**2).mean()))
                    out_payload.append(
                        encode_wav(
                            np.clip(np.round(y), -32768, 32767).astype(
                                np.int16
                            ),
                            target_sr,
                        )
                    )
                    orig_srs.append(sr)
                    n_outs.append(n_out)
                    ratios.append(rms_out / rms_in)
                    oks.append(True)
                except Exception:
                    out_payload.append(b"")
                    orig_srs.append(0)
                    n_outs.append(0)
                    ratios.append(0.0)
                    oks.append(False)
            return pa.table(
                {
                    id_column: pa.array(ids),
                    "payload": pa.array(out_payload, pa.binary()),
                    "orig_sr": pa.array(orig_srs, pa.int32()),
                    "n_samples_out": pa.array(n_outs, pa.int64()),
                    "rms_ratio": pa.array(ratios, pa.float64()),
                    "resample_ok": pa.array(oks, pa.bool_()),
                }
            )

    return media.map_batches(
        Resampler,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )


def image_resize(
    media: ray.data.Dataset,
    size: tuple[int, int],
    *,
    method: str = "bilinear",
    id_column: str = "media_id",
    payload_column: str = "payload",
    batch_size: int = 64,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Image normalization stage — decode BMP, resize to ``size`` with
    ``method`` ∈ {"bilinear", "nearest"}, re-encode BMP; emits the resized
    ``payload`` plus ``orig_width``/``orig_height``/``mean_abs_delta``
    (mean |Δ| between the resized image and a nearest-resized control —
    0 for nearest, small for bilinear on smooth content: the QA column).
    Undecodable payloads dead-letter with ``resize_ok=False``.

    Actor-pool stage; interpolation correctness is gated by
    tests/test_media.py::test_image_resize_bilinear (exact values on a
    linear ramp, where bilinear must reproduce the ramp).
    """
    import pyarrow as pa

    from esmarc_ray.ops.media_codecs import (
        decode_bmp,
        encode_bmp,
        resize_bilinear,
        resize_nearest,
        sniff_mime,
    )

    if method not in ("bilinear", "nearest"):
        raise ValueError(method)

    class Resizer:
        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_column).to_pylist()
            payloads = batch.column(payload_column).to_pylist()
            outp, ows, ohs, deltas, oks = [], [], [], [], []
            for p in payloads:
                try:
                    if sniff_mime(p) != "image/bmp":
                        raise ValueError("not a BMP payload")
                    pixels = decode_bmp(p)
                    fn = resize_bilinear if method == "bilinear" else resize_nearest
                    resized = fn(pixels, size)
                    control = resize_nearest(pixels, size)
                    outp.append(encode_bmp(resized))
                    ows.append(pixels.shape[1])
                    ohs.append(pixels.shape[0])
                    deltas.append(
                        float(
                            np.abs(
                                resized.astype(np.float64)
                                - control.astype(np.float64)
                            ).mean()
                        )
                    )
                    oks.append(True)
                except Exception:
                    outp.append(b"")
                    ows.append(0)
                    ohs.append(0)
                    deltas.append(0.0)
                    oks.append(False)
            return pa.table(
                {
                    id_column: pa.array(ids),
                    "payload": pa.array(outp, pa.binary()),
                    "orig_width": pa.array(ows, pa.int32()),
                    "orig_height": pa.array(ohs, pa.int32()),
                    "mean_abs_delta": pa.array(deltas, pa.float64()),
                    "resize_ok": pa.array(oks, pa.bool_()),
                }
            )

    return media.map_batches(
        Resizer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )
