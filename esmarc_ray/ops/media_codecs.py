"""Pure-numpy codecs for two REAL media container formats: BMP and WAV.

The container images for this engine ship no Pillow / libav, but two
ubiquitous formats are simple enough to encode and decode with ``struct`` +
numpy alone — so the multimodal path can exercise genuine media bytes end to
end instead of a stand-in:

* **BMP** (Windows V3, 24-bit uncompressed ``BI_RGB``): 14-byte file header
  + 40-byte ``BITMAPINFOHEADER``, BGR pixel rows padded to 4 bytes,
  bottom-up (positive height) or top-down (negative height).
* **WAV** (RIFF ``WAVE``, PCM, 16-bit mono): ``fmt `` chunk + ``data``
  chunk; the decoder walks chunks generically so extra chunks (``LIST``,
  ``fact``) don't break it.

Both layouts are public knowledge (Windows SDK / Multimedia Programming
Interface specs).  Reference parity note: the reference engine
(slub/esmarc) never decodes media — 856$u links pass through as URLs
(`/root/reference/esmarc/esmarc.py` has no media handling) — so this module
is part of the training-data extension surface, not reference parity.
"""

from __future__ import annotations

import struct

import numpy as np

_BMP_FILE_HEADER = struct.Struct("<2sIHHI")  # magic, filesize, res1, res2, pixel offset
_BMP_INFO_HEADER = struct.Struct("<IiiHHIIiiII")


def encode_bmp(pixels: np.ndarray) -> bytes:
    """RGB ``uint8`` array (H, W, 3) → 24-bit uncompressed BMP bytes."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("encode_bmp expects an (H, W, 3) RGB array")
    h, w = pixels.shape[:2]
    row_size = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = rows.tobytes()
    header = _BMP_FILE_HEADER.pack(b"BM", 54 + len(data), 0, 0, 54)
    info = _BMP_INFO_HEADER.pack(40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → RGB ``uint8`` array (H, W, 3).

    Handles both bottom-up (positive height) and top-down (negative height)
    row order and arbitrary row padding.
    """
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _, _, _, _, pixel_offset = _BMP_FILE_HEADER.unpack_from(data, 0)
    (hdr_size, w, h, _planes, bpp, compression, *_rest) = _BMP_INFO_HEADER.unpack_from(
        data, 14
    )
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    top_down = h < 0
    h = abs(h)
    row_size = (w * 3 + 3) // 4 * 4
    body = np.frombuffer(data, dtype=np.uint8, count=row_size * h, offset=pixel_offset)
    rows = body.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, ::-1])  # BGR → RGB


def resize_nearest(pixels: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Deterministic nearest-neighbor resize to ``(height, width)``."""
    h, w = size
    src_h, src_w = pixels.shape[:2]
    rows = (np.arange(h) * src_h) // h
    cols = (np.arange(w) * src_w) // w
    return pixels[rows][:, cols]


def resize_bilinear(pixels: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Deterministic bilinear resize to ``(height, width)`` — the
    anti-aliased sibling of :func:`resize_nearest` (pixel-center aligned,
    edge-clamped; pure numpy gathers, no Python loop)."""
    h, w = size
    src_h, src_w = pixels.shape[:2]
    ys = np.clip((np.arange(h) + 0.5) * src_h / h - 0.5, 0, src_h - 1)
    xs = np.clip((np.arange(w) + 0.5) * src_w / w - 0.5, 0, src_w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, src_h - 1)
    x1 = np.minimum(x0 + 1, src_w - 1)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    p = pixels.astype(np.float64)
    top = p[y0][:, x0] * (1 - fx) + p[y0][:, x1] * fx
    bot = p[y1][:, x0] * (1 - fx) + p[y1][:, x1] * fx
    out = top * (1 - fy) + bot * fy
    return np.clip(np.round(out), 0, 255).astype(pixels.dtype)


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """``int16`` mono samples → RIFF/WAVE PCM bytes."""
    samples = np.ascontiguousarray(samples, dtype=np.int16)
    body = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM-16 mono bytes → (``int16`` samples, sample_rate)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, sample_rate, samples = 12, None, None
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body_at = pos + 8
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", data, body_at
            )
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV variant (fmt={audio_fmt}, ch={channels}, bits={bits})"
                )
        elif cid == b"data":
            samples = np.frombuffer(data, dtype="<i2", count=size // 2, offset=body_at)
        pos = body_at + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return samples, sample_rate


def sniff_mime(data: bytes) -> str | None:
    """Magic-byte sniff for the formats this module decodes."""
    if len(data) >= 2 and data[:2] == b"BM":
        return "image/bmp"
    if len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "audio/wav"
    if len(data) >= 4 and data[:4] == BMV_MAGIC:
        return "video/x-bmv"
    return None


# --------------------------------------------------------------------------
# BMV — a minimal multi-frame container over BMP frames (this repo's own
# trivially-specified format, so the video path can exercise real decode +
# frame math with zero external libs): magic b"\\x89BMV" (non-ASCII lead byte, cannot collide with BMP's "BM" + filesize), uint16 fps, uint32
# frame count, then per frame uint32 length + a complete BMP payload.
# --------------------------------------------------------------------------

BMV_MAGIC = b"\x89BMV"
_BMV_HEADER = struct.Struct("<4sHI")  # magic, fps, n_frames


def encode_bmv(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """Encode RGB uint8 frames as a BMV clip (each frame a full BMP)."""
    if not frames:
        raise ValueError("BMV needs at least one frame")
    parts = [_BMV_HEADER.pack(BMV_MAGIC, fps, len(frames))]
    for fr in frames:
        payload = encode_bmp(fr)
        parts.append(struct.pack("<I", len(payload)))
        parts.append(payload)
    return b"".join(parts)


def decode_bmv(data: bytes) -> tuple[list[np.ndarray], int]:
    """Decode a BMV clip → (list of RGB uint8 frames, fps)."""
    if len(data) < _BMV_HEADER.size or data[:4] != BMV_MAGIC:
        raise ValueError("not a BMV payload")
    _, fps, n_frames = _BMV_HEADER.unpack_from(data, 0)
    pos = _BMV_HEADER.size
    frames = []
    for _ in range(n_frames):
        if pos + 4 > len(data):
            raise ValueError("truncated BMV frame table")
        (size,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if pos + size > len(data):
            raise ValueError("truncated BMV frame payload")
        frames.append(decode_bmp(data[pos:pos + size]))
        pos += size
    return frames, fps
