"""Interleaved text+media pipeline (pipelines/media.py)."""

import hashlib
import zlib

import pyarrow as pa
import pytest
import ray.data

from esmarc_ray.pipelines.media import (
    MediaFetcher,
    _media_batch,
    doc_media_features,
    media_refs,
)


def _span(kind, text="", ref="", off=0):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": off}


def test_media_batch_sliced_offsets():
    """The Arrow kernel must be correct on SLICED tables (non-zero list
    offsets) — the codec-offset gotcha class from round 1's review."""
    t = pa.table(
        {
            "doc_id": ["a", "b", "c"],
            "spans": [
                [_span("sub", "x"), _span("media", ref="u1", off=1)],
                [_span("media", ref="u2", off=0), _span("media", ref="u3", off=1)],
                [_span("ldr", "l")],
            ],
        }
    )
    out = _media_batch(t.slice(1))  # drops doc a
    assert out.column("doc_id").to_pylist() == ["b", "b"]
    assert out.column("media_ref").to_pylist() == ["u2", "u3"]
    assert out.column("span_order").to_pylist() == [0, 1]


def test_media_refs_preserves_interleaving(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": ["d1"],
                "spans": [
                    [
                        _span("sub", "text before", off=0),
                        _span("media", ref="r0", off=1),
                        _span("sub", "between", off=2),
                        _span("media", ref="r1", off=3),
                    ]
                ],
            }
        )
    )
    rows = media_refs(ds).to_pandas().sort_values("span_order")
    assert rows["media_ref"].tolist() == ["r0", "r1"]
    assert rows["span_order"].tolist() == [1, 3]  # span order == interleave order


def test_fetcher_deterministic_and_validates():
    batch = pa.table({"doc_id": ["d"], "media_ref": ["u"], "span_order": [0]})
    out1 = MediaFetcher(payload_bytes=64, payload_kind="fake")(batch)
    out2 = MediaFetcher(payload_bytes=64, payload_kind="fake")(batch)
    payload = out1.column("payload")[0].as_py()
    assert payload == out2.column("payload")[0].as_py()
    assert len(payload) == 64
    assert payload[:32] == hashlib.sha256(b"u").digest()
    with pytest.raises(ValueError):
        MediaFetcher(payload_bytes=33)
    with pytest.raises(ValueError):
        MediaFetcher(payload_kind="tiff")


def test_fetcher_serves_decodable_bmp():
    """Default payload_kind='bmp' serves genuine image bytes: distinct per
    ref, deterministic, and pixel-decodable by the native codec."""
    from esmarc_ray.ops.media_codecs import decode_bmp, sniff_mime

    batch = pa.table(
        {"doc_id": ["d", "d"], "media_ref": ["u1", "u2"], "span_order": [0, 1]}
    )
    out = MediaFetcher(payload_bytes=2048)(batch)
    p1, p2 = out.column("payload").to_pylist()
    assert sniff_mime(p1) == "image/bmp" and p1 != p2
    assert out.column("mime").to_pylist() == ["image/bmp", "image/bmp"]
    pixels = decode_bmp(p1)
    assert pixels.ndim == 3 and pixels.shape[2] == 3 and pixels.size > 0
    assert p1 == MediaFetcher(payload_bytes=2048)(batch).column("payload")[0].as_py()


def test_doc_media_features_end_to_end(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": ["d1", "d2"],
                "spans": [
                    [_span("media", ref="u1", off=0)],
                    [_span("sub", "no media here")],
                ],
            }
        )
    )
    out = doc_media_features(ds, payload_bytes=64).to_pandas()
    assert len(out) == 1  # d2 has no media span
    row = out.iloc[0]
    assert row["doc_id"] == "d1" and row["mime"] == "image/bmp"
    assert "payload" not in out.columns  # bytes dropped at the decode stage
    assert len(row["features"]) == 6  # 3 channel means + 3 stds
    assert row["decode_ok"]  # the BMP payload REALLY decoded
    from esmarc_ray.pipelines.media import _bmp_payload

    assert row["payload_crc"] == zlib.crc32(_bmp_payload("u1", 64))


def test_interleave_chunks_media_positions(ray_session):
    """Windows cut on text-token budget; media spans ride at their
    interleaved positions; a straddling span stays in its starting window."""
    import pyarrow as pa

    from esmarc_ray.pipelines.media import interleave_chunks

    spans = [
        {"kind": "text", "text": "a b c", "media_ref": "", "offset": 0},
        {"kind": "media", "text": "", "media_ref": "m1", "offset": 1},
        {"kind": "text", "text": "d e", "media_ref": "", "offset": 2},   # cum_before=3
        {"kind": "text", "text": "f g", "media_ref": "", "offset": 3},   # cum_before=5 -> chunk 1
        {"kind": "media", "text": "", "media_ref": "m2", "offset": 4},   # cum_before=7 -> chunk 1
        {"kind": "text", "text": "h", "media_ref": "", "offset": 5},     # cum_before=7 -> chunk 1
    ]
    table = pa.table(
        {"doc_id": ["d1"],
         "spans": [[tuple(s.values()) for s in spans]]},
        schema=pa.schema([
            ("doc_id", pa.string()),
            ("spans", pa.list_(pa.struct([
                ("kind", pa.string()), ("text", pa.string()),
                ("media_ref", pa.string()), ("offset", pa.int32()),
            ]))),
        ]),
    )
    got = (
        interleave_chunks(ray.data.from_arrow(table), chunk_tokens=4)
        .to_pandas()
        .sort_values("chunk_id")
        .reset_index(drop=True)
    )
    # chunk 0: "a b c" (3) + m1 + "d e" (2, starts at cum 3 < 4 -> straddles
    # but stays) = 5 text tokens, media m1
    # chunk 1: "f g" (cum 5) + m2 + "h" = 3 text tokens, media m2
    assert got["chunk_id"].tolist() == [0, 1]
    assert got["n_text_tokens"].tolist() == [5, 3]
    assert got["media_refs"].tolist() == ["m1", "m2"]
    assert got["n_media"].tolist() == [1, 1]


def test_audio_features_dsp(ray_session):
    """Spectral features recover planted signal structure: a pure sine's
    centroid and ZCR sit at its frequency (±1 bin), white noise has much
    wider bandwidth, a truncated payload dead-letters with audio_ok=False."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from esmarc_ray.ops.media_codecs import encode_wav
    from esmarc_ray.ops.multimodal import audio_features

    sr, n = 8000, 8000
    t = np.arange(n) / sr
    sine = encode_wav((np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int16), sr)
    rng = np.random.RandomState(3)
    noise = encode_wav((rng.randn(n) * 8000).clip(-32000, 32000).astype(np.int16), sr)
    broken = sine[:20]

    media = ray.data.from_arrow(
        pa.table(
            {
                "media_id": pa.array(["sine", "noise", "broken"]),
                "payload": pa.array([sine, noise, broken], pa.binary()),
            }
        )
    )
    out = audio_features(media, concurrency=(1, 2)).to_pandas().set_index("media_id")

    s = out.loc["sine"]
    assert s["audio_ok"]
    assert abs(s["spectral_centroid_hz"] - 440) < 2.0
    assert abs(s["zcr_hz"] - 440) < 2.0
    assert s["spectral_bandwidth_hz"] < 20.0
    assert abs(s["duration_s"] - 1.0) < 1e-9

    nz = out.loc["noise"]
    assert nz["audio_ok"]
    assert nz["spectral_bandwidth_hz"] > 500.0

    assert not out.loc["broken"]["audio_ok"]


def test_image_features_structure(ray_session):
    """Planted-pattern image DSP: a flat field has zero Sobel response and
    zero contrast; vertical stripes put edges on exactly the stripe
    boundaries; a checkerboard maximizes edge density; garbage bytes
    dead-letter instead of failing the task."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from esmarc_ray.ops.media_codecs import encode_bmp
    from esmarc_ray.ops.multimodal import image_features

    h = w = 32
    flat = np.full((h, w, 3), 128, dtype=np.uint8)
    stripes = np.zeros((h, w, 3), dtype=np.uint8)
    # period-4 stripes (2 px on / 2 px off): every column borders a step —
    # period-2 would alias to ZERO under a centered-difference Sobel
    stripes[:, (np.arange(w) // 2) % 2 == 0] = 255
    wide = np.zeros((h, w, 3), dtype=np.uint8)
    wide[:, w // 2:] = 255  # one vertical boundary
    media = pa.table(
        {
            "media_id": ["flat", "stripes", "wide", "junk"],
            "payload": [
                encode_bmp(flat), encode_bmp(stripes), encode_bmp(wide),
                b"\x00\x01garbage",
            ],
        }
    )
    out = (
        image_features(ray.data.from_arrow(media))
        .to_pandas()
        .set_index("media_id")
    )
    assert not out.loc["junk", "image_ok"]
    assert out.loc["flat", "image_ok"]
    assert out.loc["flat", "edge_density"] == 0.0
    assert out.loc["flat", "luma_std"] == 0.0
    assert abs(out.loc["flat", "mean_luma"] - 128.0) < 1e-9
    assert out.loc["flat", "hist_entropy"] == 0.0
    # single vertical boundary: gradient response within 1 px of the step
    # → edge_density ≈ 2 columns of 32 (Sobel support) out of 32×32
    assert 0.03 <= out.loc["wide", "edge_density"] <= 0.15
    # period-4 stripes: every pixel within Sobel support of a boundary
    assert out.loc["stripes", "edge_density"] > 0.9
    assert out.loc["stripes", "luma_std"] > out.loc["wide", "luma_std"] * 0.9
    assert out.loc["stripes", "hist_entropy"] > 0.9  # two equal bins ≈ 1 bit
    assert int(out.loc["flat", "width"]) == w and int(out.loc["flat", "height"]) == h


def test_bmv_roundtrip():
    """BMV container: frames and fps survive encode→decode bit-exactly;
    truncations raise instead of returning garbage."""
    import numpy as np
    import pytest

    from esmarc_ray.ops.media_codecs import (
        decode_bmv, encode_bmv, sniff_mime,
    )

    rng = np.random.RandomState(4)
    frames = [rng.randint(0, 256, (12, 10, 3)).astype(np.uint8) for _ in range(4)]
    clip = encode_bmv(frames, fps=7)
    assert sniff_mime(clip) == "video/x-bmv"
    got, fps = decode_bmv(clip)
    assert fps == 7 and len(got) == 4
    for a, b in zip(frames, got):
        assert (a == b).all()
    with pytest.raises(ValueError):
        decode_bmv(clip[: len(clip) // 2])
    with pytest.raises(ValueError):
        decode_bmv(b"nope")


def test_shot_boundaries_planted(ray_session):
    """Shot detection recovers the synthetic corpus's planted cuts exactly
    (intra-scene jitter ≤ 4 luma, cuts ≥ 80): zero false positives, zero
    misses, per clip; non-BMV payloads dead-letter."""
    import json

    import pyarrow as pa
    import ray.data

    from esmarc_ray.ops.multimodal import shot_boundaries, synthetic_video_table

    table = synthetic_video_table(40, seed=9)
    media = ray.data.from_arrow(table)
    out = shot_boundaries(media).to_pandas().set_index("media_id")
    truth = {
        mid: json.loads(cf)
        for mid, cf in zip(
            table.column("media_id").to_pylist(),
            table.column("cut_frames").to_pylist(),
        )
    }
    n_frames = dict(
        zip(table.column("media_id").to_pylist(), table.column("n_frames").to_pylist())
    )
    for mid, cuts in truth.items():
        assert out.loc[mid, "video_ok"]
        assert list(out.loc[mid, "boundaries"]) == cuts, mid
        assert out.loc[mid, "n_shots"] == len(cuts) + 1
        assert out.loc[mid, "n_frames"] == n_frames[mid]

    junk = ray.data.from_arrow(
        pa.table({"media_id": ["x"], "payload": [b"BM broken"]})
    )
    jout = shot_boundaries(junk).to_pandas()
    assert not jout["video_ok"].iloc[0] and jout["n_shots"].iloc[0] == 0


def test_mel_features_bands(ray_session):
    """Planted pure tones land in their mel band: dominant_band is the
    filter whose triangle peak is nearest the tone (recomputed here from
    the same HTK mel formula), and band index grows with frequency."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from esmarc_ray.ops.media_codecs import encode_wav
    from esmarc_ray.ops.multimodal import mel_features

    sr, n, n_mels, fmin = 8000, 8000, 12, 80.0

    def mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)

    def inv_mel(m):
        return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)

    peaks = inv_mel(np.linspace(mel(fmin), mel(sr / 2.0), n_mels + 2))[1:-1]
    t = np.arange(n) / sr
    tones = [float(peaks[1]), float(peaks[5]), float(peaks[9])]
    rows_id, rows_payload = [], []
    for i, f in enumerate(tones):
        wav = encode_wav((np.sin(2 * np.pi * f * t) * 20000).astype(np.int16), sr)
        rows_id.append(f"tone{i}")
        rows_payload.append(wav)
    rows_id.append("junk")
    rows_payload.append(b"RIFFbroken")
    media = ray.data.from_arrow(
        pa.table({"media_id": pa.array(rows_id),
                  "payload": pa.array(rows_payload, pa.binary())})
    )
    out = mel_features(media, n_mels=n_mels, fmin=fmin).to_pandas().set_index("media_id")
    assert not out.loc["junk", "mel_ok"]
    got = [int(out.loc[f"tone{i}", "dominant_band"]) for i in range(3)]
    assert got == [1, 5, 9], got
    assert all(len(out.loc[f"tone{i}", "mel"]) == n_mels for i in range(3))


def test_audio_resample_preserves_tone(ray_session):
    """A planted sine's dominant frequency must survive 8k→16k linear
    resampling; sample count doubles and RMS stays ~constant."""
    import numpy as np

    from esmarc_ray.ops.media_codecs import decode_wav, encode_wav
    from esmarc_ray.ops.multimodal import audio_resample

    sr, freq, n = 8000, 440.0, 8000
    t = np.arange(n) / sr
    wav = encode_wav((np.sin(2 * np.pi * freq * t) * 12000).astype(np.int16), sr)
    media = ray.data.from_arrow(
        pa.table({"media_id": ["a"], "payload": pa.array([wav], pa.binary())})
    )
    out = audio_resample(media, 16000).to_pandas()
    row = out.iloc[0]
    assert row["resample_ok"] and row["orig_sr"] == sr
    assert row["n_samples_out"] == 2 * n
    assert 0.95 < row["rms_ratio"] < 1.05
    y, sr2 = decode_wav(row["payload"])
    assert sr2 == 16000
    spec = np.abs(np.fft.rfft(y.astype(np.float64)))
    peak_hz = np.fft.rfftfreq(len(y), 1 / sr2)[int(np.argmax(spec[1:])) + 1]
    assert abs(peak_hz - freq) < 3.0
    # garbage payload dead-letters
    bad = ray.data.from_arrow(
        pa.table({"media_id": ["b"], "payload": pa.array([b"nope"], pa.binary())})
    )
    outb = audio_resample(bad, 16000).to_pandas()
    assert not outb.iloc[0]["resample_ok"]


def test_image_resize_bilinear(ray_session):
    """Bilinear resize of a linear ramp reproduces the ramp (interpolation
    is exact on affine content); nearest does not; garbage dead-letters."""
    import numpy as np

    from esmarc_ray.ops.media_codecs import decode_bmp, encode_bmp, resize_bilinear
    from esmarc_ray.ops.multimodal import image_resize

    # horizontal ramp 0..255 over 32 cols, 3 channels
    ramp = np.tile(
        np.linspace(0, 255, 32, dtype=np.float64)[None, :, None], (16, 1, 3)
    ).astype(np.uint8)
    up = resize_bilinear(ramp, (16, 64))
    # interior columns must be monotone and close to the analytic ramp
    got = up[8, :, 0].astype(np.float64)
    expect = np.clip((np.arange(64) + 0.5) * 32 / 64 - 0.5, 0, 31) * (255 / 31)
    # ≤1.5: uint8 quantization of the source ramp (±0.5) + output rounding
    assert np.abs(got - expect).max() <= 1.5

    media = ray.data.from_arrow(
        pa.table(
            {
                "media_id": ["a", "b"],
                "payload": pa.array([encode_bmp(ramp), b"junk"], pa.binary()),
            }
        )
    )
    out = image_resize(media, (8, 16)).to_pandas().set_index("media_id")
    assert out.loc["a", "resize_ok"] and not out.loc["b", "resize_ok"]
    assert out.loc["a", "orig_width"] == 32
    dec = decode_bmp(out.loc["a", "payload"])
    assert dec.shape[:2] == (8, 16)
    assert out.loc["a", "mean_abs_delta"] > 0  # bilinear ≠ nearest on a ramp
