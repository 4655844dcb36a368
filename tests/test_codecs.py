"""Pure-stdlib media codecs (pipeline/codecs.py) + their Spark wiring.

The encoders here are written INSIDE the tests (forward filter/pack
direction), so the decoders are checked against independently
constructed bytes, not against themselves.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from feldman_spark.pipeline import codecs


# ---------------------------------------------------------------------------
# reference encoders (test-side only)
# ---------------------------------------------------------------------------

def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _encode_png(pixels: np.ndarray, filters: list[int]) -> bytes:
    """Encode 8-bit pixels (h, w, ch) applying the given PNG filter type
    per row — the forward direction of what decode_png must undo."""
    h, w, ch = pixels.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y, f in zip(range(h), filters):
        cur = pixels[y].reshape(-1).astype(np.int32)
        raw.append(f)
        for x in range(w * ch):
            a = int(cur[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if f == 0:
                v = cur[x]
            elif f == 1:
                v = cur[x] - a
            elif f == 2:
                v = cur[x] - b
            elif f == 3:
                v = cur[x] - ((a + b) >> 1)
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = cur[x] - pred
            raw.append(v & 0xFF)
        prev = cur
    return (b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def _encode_bmp24(pixels: np.ndarray) -> bytes:
    """Encode (h, w, 3) RGB as a bottom-up 24-bit BMP with row padding."""
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):          # bottom-up
        row = pixels[y][:, ::-1].tobytes()  # RGB -> BGR
        body += row + b"\x00" * (stride - len(row))
    pix_off = 14 + 40
    hdr = (b"BM" + struct.pack("<IHHI", pix_off + len(body), 0, 0, pix_off)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                         2835, 2835, 0, 0))
    return bytes(hdr) + bytes(body)


def _encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(frames, channels) int16 -> RIFF/WAVE PCM via the stdlib writer."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# decoder unit tests
# ---------------------------------------------------------------------------

def test_png_roundtrip_every_filter_type():
    rng = np.random.RandomState(42)
    pixels = rng.randint(0, 256, size=(5, 7, 3), dtype=np.uint8)
    data = _encode_png(pixels, filters=[0, 1, 2, 3, 4])
    w, h, ch, out = codecs.decode_png(data)
    assert (w, h, ch) == (7, 5, 3)
    assert out == pixels.tobytes()


def test_png_roundtrip_rgba_and_gray():
    rng = np.random.RandomState(7)
    rgba = rng.randint(0, 256, size=(3, 4, 4), dtype=np.uint8)
    w, h, ch, out = codecs.decode_png(_encode_png(rgba, [4, 1, 3]))
    assert (w, h, ch) == (4, 3, 4) and out == rgba.tobytes()
    gray = rng.randint(0, 256, size=(2, 6, 1), dtype=np.uint8)
    w, h, ch, out = codecs.decode_png(_encode_png(gray, [2, 2]))
    assert (w, h, ch) == (6, 2, 1) and out == gray.tobytes()


def test_png_rejects_unsupported_features():
    pixels = np.zeros((1, 1, 3), dtype=np.uint8)
    good = _encode_png(pixels, [0])
    with pytest.raises(ValueError, match="signature"):
        codecs.decode_png(b"JUNK" + good)
    # 16-bit depth: patch IHDR depth byte (offset 8+8+8=24) + its CRC
    ihdr_body = bytearray(good[16:29])
    ihdr_body[8] = 16
    patched = (good[:8] + struct.pack(">I", 13) + b"IHDR" + bytes(ihdr_body[:13]))
    import zlib as z
    patched += struct.pack(">I", z.crc32(b"IHDR" + bytes(ihdr_body[:13])) & 0xFFFFFFFF)
    patched += good[33:]
    with pytest.raises(NotImplementedError, match="bit depth"):
        codecs.decode_png(patched)


def test_bmp_roundtrip_with_padding():
    rng = np.random.RandomState(3)
    # width 3 -> 9-byte rows padded to 12: exercises the stride logic
    pixels = rng.randint(0, 256, size=(4, 3, 3), dtype=np.uint8)
    w, h, ch, out = codecs.decode_bmp(_encode_bmp24(pixels))
    assert (w, h, ch) == (3, 4, 3)
    assert out == pixels.tobytes()   # top-down RGB restored


def test_png_and_bmp_same_image_decode_identical():
    rng = np.random.RandomState(11)
    pixels = rng.randint(0, 256, size=(6, 5, 3), dtype=np.uint8)
    _, _, _, from_png = codecs.decode_png(_encode_png(pixels, [0, 1, 2, 3, 4, 1]))
    _, _, _, from_bmp = codecs.decode_bmp(_encode_bmp24(pixels))
    assert from_png == from_bmp


def test_wav_roundtrip_stereo():
    rng = np.random.RandomState(5)
    frames = rng.randint(-30000, 30000, size=(8000, 2)).astype(np.int16)
    data = _encode_wav(frames, rate=16000)
    rate, ch, dur, samples = codecs.decode_wav(data)
    assert (rate, ch) == (16000, 2)
    assert dur == 500            # 8000 frames / 16 kHz
    assert np.array_equal(samples, frames)


def test_wav_8bit_centered():
    raw = bytes([0, 128, 255])
    body = (b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
            + b"data" + struct.pack("<I", 3) + raw + b"\x00")
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    rate, ch, dur, samples = codecs.decode_wav(data)
    assert (rate, ch) == (8000, 1)
    assert samples[:, 0].tolist() == [-32768, 0, 32512]


def test_sniff_and_dispatch():
    pixels = np.zeros((1, 1, 3), dtype=np.uint8)
    assert codecs.sniff_media(_encode_png(pixels, [0])) == "png"
    assert codecs.sniff_media(_encode_bmp24(pixels)) == "bmp"
    assert codecs.sniff_media(_encode_wav(np.zeros((4, 1), np.int16), 8000)) == "wav"
    assert codecs.sniff_media(b"\xff\xd8\xff\xe0JFIF") is None  # JPEG
    with pytest.raises(NotImplementedError, match="image library"):
        codecs.decode_image_bytes(b"\xff\xd8\xff\xe0 not decodable")


# ---------------------------------------------------------------------------
# Spark wiring: real decode through mapInPandas
# ---------------------------------------------------------------------------

def test_decode_image_real_bytes_through_spark(spark):
    from feldman_spark.pipeline.multimodal import decode_image, media_table

    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, size=(4, 4, 3), dtype=np.uint8)
    rows = [
        (1, "image", "image/png", 4, 4, None, _encode_png(img, [0, 1, 2, 4])),
        (2, "image", "image/bmp", 4, 4, None, _encode_bmp24(img)),
        (3, "audio", "audio/wav", None, None, 500,
         _encode_wav(np.zeros((100, 1), np.int16), 8000)),
    ]
    out = {r["media_id"]: r for r in
           decode_image(media_table(spark, rows)).collect()}
    assert bytes(out[1]["pixels"]) == img.tobytes()
    assert bytes(out[2]["pixels"]) == img.tobytes()   # same image, same pixels
    assert out[3]["pixels"] is None                    # non-image passthrough


def test_decode_audio_through_spark(spark):
    from feldman_spark.pipeline.multimodal import decode_audio, media_table

    tone = (np.sin(np.arange(16000) / 16000 * 2 * np.pi * 440) * 10000)
    frames = tone.astype(np.int16).reshape(-1, 1)
    rows = [
        (1, "audio", "audio/wav", None, None, None, _encode_wav(frames, 16000)),
        (2, "image", "image/png", 1, 1, None, b"\x89PNG\r\n\x1a\nxxxx"),
    ]
    out = decode_audio(media_table(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["media_id"], r["sample_rate"], r["n_channels"]) == (1, 16000, 1)
    assert r["duration_ms"] == 1000 and r["n_frames"] == 16000
    # RMS of a 10000-amplitude sine ~ 10000/sqrt(2)
    assert abs(r["rms"] - 10000 / np.sqrt(2)) < 50


# ---------------------------------------------------------------------------
# property: random shapes / channels / filter sequences round-trip
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 12),
        h=st.integers(1, 10),
        ch=st.sampled_from([1, 2, 3, 4]),
        seed=st.integers(0, 2**31 - 1),
        data=st.data(),
    )
    def test_png_roundtrip_property(w, h, ch, seed, data):
        filters = data.draw(
            st.lists(st.integers(0, 4), min_size=h, max_size=h))
        rng = np.random.RandomState(seed)
        pixels = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
        gw, gh, gch, out = codecs.decode_png(_encode_png(pixels, filters))
        assert (gw, gh, gch) == (w, h, ch)
        assert out == pixels.tobytes()

    @settings(max_examples=25, deadline=None)
    @given(w=st.integers(1, 9), h=st.integers(1, 7),
           seed=st.integers(0, 2**31 - 1))
    def test_bmp_roundtrip_property(w, h, seed):
        rng = np.random.RandomState(seed)
        pixels = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        gw, gh, gch, out = codecs.decode_bmp(_encode_bmp24(pixels))
        assert (gw, gh, gch) == (w, h, 3)
        assert out == pixels.tobytes()
except ImportError:  # pragma: no cover - hypothesis is baked in
    pass
