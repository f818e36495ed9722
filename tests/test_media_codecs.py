"""Pure-numpy BMP/WAV codecs (ops/media_codecs.py) + native decode stage."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from esmarc_ray.ops import media_codecs as mc
from esmarc_ray.ops import multimodal


def _gradient(h, w, phase=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return (((yy[..., None] * 5 + xx[..., None] * 3) * np.array([1, 2, 3])) + phase) % 256


@pytest.mark.parametrize("h,w", [(1, 1), (7, 3), (12, 16), (33, 31)])
def test_bmp_roundtrip(h, w):
    """Encode→decode is pixel-exact, including odd widths (row padding)."""
    pixels = _gradient(h, w, 9).astype(np.uint8)
    data = mc.encode_bmp(pixels)
    assert data[:2] == b"BM" and mc.sniff_mime(data) == "image/bmp"
    out = mc.decode_bmp(data)
    assert out.shape == (h, w, 3)
    assert (out == pixels).all()


def test_bmp_top_down_variant():
    """Decoder honors negative height (top-down row order)."""
    import struct

    pixels = _gradient(4, 5).astype(np.uint8)
    data = bytearray(mc.encode_bmp(pixels))
    # flip to top-down: negate height, reverse the stored row order
    row_size = (5 * 3 + 3) // 4 * 4
    body = np.frombuffer(bytes(data[54:]), dtype=np.uint8).reshape(4, row_size)
    data[54:] = body[::-1].tobytes()
    struct.pack_into("<i", data, 14 + 8, -4)
    out = mc.decode_bmp(bytes(data))
    assert (out == pixels).all()


def test_bmp_rejects_non_bmp():
    with pytest.raises(ValueError):
        mc.decode_bmp(b"\x89PNG" + b"\x00" * 100)


def test_resize_nearest():
    pixels = _gradient(8, 8).astype(np.uint8)
    up = mc.resize_nearest(pixels, (16, 4))
    assert up.shape == (16, 4, 3)
    # nearest-neighbor: every output pixel exists in the source
    assert (up[::2, :] == up[1::2, :]).all()  # 2× row duplication


def test_wav_roundtrip():
    samples = (np.arange(-500, 500, dtype=np.int16) * 3) % 20000 - 10000
    data = mc.encode_wav(samples.astype(np.int16), sample_rate=8000)
    assert mc.sniff_mime(data) == "audio/wav"
    out, sr = mc.decode_wav(data)
    assert sr == 8000
    assert (out == samples.astype(np.int16)).all()


def test_wav_chunk_walk_skips_extras():
    """Decoder must tolerate chunks other than fmt/data (e.g. LIST)."""
    import struct

    samples = np.array([1, -2, 3], dtype=np.int16)
    data = mc.encode_wav(samples, 16000)
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = data[:12] + extra + data[12:]
    patched = b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:]
    out, sr = mc.decode_wav(patched)
    assert sr == 16000 and (out == samples).all()


def test_native_decoder_dead_letters_truncated_wav():
    """A payload that sniffs as WAV but has a truncated fmt chunk must
    dead-letter (decode_ok=False), not raise through the task (struct.error
    is not a ValueError)."""
    import struct

    bad = (
        b"RIFF" + struct.pack("<I", 28) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + b"\x01\x00\x01\x00"  # truncated body
    )
    dec = multimodal.MediaDecoder(decoder="native")
    feats, ok = dec._native_features(bad)
    assert not ok and feats == [0.0] * 6
    out = dec(pa.table({"payload": [bad]}))
    assert out.column("decode_ok").to_pylist() == [False]


def test_native_decoder_real_payloads(ray_session):
    """decode_media(decoder='native') really parses the synthetic corpus's
    BMP/WAV bytes: image features equal the directly computed pixel stats,
    audio rows carry positive RMS/duration, video rows dead-letter."""
    table = multimodal.synthetic_media_table(30)
    decoded = (
        multimodal.decode_media(ray.data.from_arrow(table))
        .to_pandas()
        .sort_values("media_id")
        .set_index("media_id")
    )
    src = table.to_pandas().set_index("media_id")
    assert decoded["decode_ok"].eq(decoded.index.map(src["kind"]) != "video").all()
    img_id = src[src["kind"] == "image"].index[0]
    pixels = mc.resize_nearest(mc.decode_bmp(src.loc[img_id, "payload"]), (32, 32))
    expect = np.concatenate(
        [pixels.mean(axis=(0, 1)), pixels.std(axis=(0, 1))]
    ).astype(np.float32)
    assert np.allclose(np.array(decoded.loc[img_id, "features"]), expect)
    aud = decoded[decoded.index.map(src["kind"]) == "audio"]
    feats = np.stack(aud["features"].to_numpy())
    assert (feats[:, 0] > 0).all()  # rms
    assert (feats[:, 2] > 0).all()  # duration seconds
    # durations match the metadata column
    assert np.allclose(feats[:, 2] * 1000, src.loc[aud.index, "duration_ms"], atol=1)


def _split_image(h, w, vertical=True):
    """High-structure test image: dark half / bright half."""
    img = np.zeros((h, w, 3), dtype=np.uint8)
    if vertical:
        img[:, w // 2 :] = 220
    else:
        img[h // 2 :, :] = 220
    return img


def test_ahash64_stable_under_reencode_resize_noise():
    base = _split_image(48, 64, vertical=True)
    h0 = multimodal.ahash64(base)
    # re-encode round-trip: identical hash
    assert multimodal.ahash64(mc.decode_bmp(mc.encode_bmp(base))) == h0
    # integer-factor resize: near-identical hash (non-integer factors can
    # shift the 8x8 quantization boundary — the chunk-bucket recall
    # guarantee is hamming <= 3, so the planted variants use exact factors)
    resized = mc.resize_nearest(base, (24, 32))
    assert bin(multimodal.ahash64(resized) ^ h0).count("1") <= 2
    # mild additive noise: near-identical hash
    noisy = np.clip(base.astype(np.int16) + 2, 0, 255).astype(np.uint8)
    assert bin(multimodal.ahash64(noisy) ^ h0).count("1") <= 2
    # structurally different image: far hash
    other = _split_image(48, 64, vertical=False)
    assert bin(multimodal.ahash64(other) ^ h0).count("1") > 10


def test_media_phash_dups_finds_planted_variants(ray_session):
    """A resized re-encode of an image pairs with its original; structurally
    different images don't pair."""
    rows = {"media_id": [], "payload": []}
    imgs = {
        "v0": _split_image(40, 60, vertical=True),
        "h0": _split_image(40, 60, vertical=False),
        "c0": np.tile(
            np.kron(np.indices((4, 6)).sum(0) % 2, np.ones((10, 10)))[..., None] * 255,
            (1, 1, 3),
        ).astype(np.uint8),
    }
    for name, img in imgs.items():
        rows["media_id"].append(name)
        rows["payload"].append(mc.encode_bmp(img))
    # planted variant: v0 downsampled 2x and re-encoded
    rows["media_id"].append("v0_small")
    rows["payload"].append(mc.encode_bmp(mc.resize_nearest(imgs["v0"], (20, 30))))
    # one undecodable payload: must be skipped, not crash
    rows["media_id"].append("junk")
    rows["payload"].append(b"\x00" * 64)
    media = ray.data.from_arrow(
        pa.table({"media_id": pa.array(rows["media_id"]),
                  "payload": pa.array(rows["payload"], pa.binary())})
    )
    pairs = multimodal.media_phash_dups(media, max_hamming=3).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    assert ("v0", "v0_small") in got
    assert all("junk" not in p for p in got)
    # no structurally-different pair
    assert ("h0", "v0") not in got and ("c0", "v0") not in got and ("c0", "h0") not in got
