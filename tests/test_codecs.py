"""Pure-stdlib media codecs (pipeline/codecs.py) + their Spark wiring.

The encoders here are written INSIDE the tests (forward filter/pack
direction), so the decoders are checked against separately constructed
bytes, not against themselves. Because a test-side encoder built from
the same published tables could still share a systematic error with the
production pair, the JPEG decoder additionally gets an ABSOLUTE check:
a hand-assembled byte-literal stream whose expected pixels are derived
analytically (test_decode_jpeg_hand_assembled_absolute).
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


def _encode_png_palette(
    indices: np.ndarray,
    palette: np.ndarray,
    filters: list[int],
    trns: bytes | None = None,
) -> bytes:
    """Encode (h, w) uint8 palette indices + (n, 3) palette as a color
    type 3 PNG (PLTE chunk, optional tRNS) — the forward direction of
    the palette branch decode_png must undo."""
    h, w = indices.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(w, dtype=np.int32)
    for y, f in zip(range(h), filters):
        cur = indices[y].astype(np.int32)
        raw.append(f)
        for x in range(w):
            a = int(cur[x - 1]) if x >= 1 else 0
            b = int(prev[x])
            c = int(prev[x - 1]) if x >= 1 else 0
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
    out = (b"\x89PNG\r\n\x1a\n"
           + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"PLTE", palette.astype(np.uint8).tobytes()))
    if trns is not None:
        out += _png_chunk(b"tRNS", trns)
    return (out + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
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


def test_png_palette_roundtrip():
    rng = np.random.RandomState(21)
    palette = rng.randint(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, size=(5, 7), dtype=np.uint8)
    w, h, ch, out = codecs.decode_png(
        _encode_png_palette(idx, palette, [0, 1, 2, 3, 4]))
    assert (w, h, ch) == (7, 5, 3)
    assert out == palette[idx].tobytes()


def test_png_palette_trns_gives_rgba():
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], np.uint8)
    # alpha for entries 0 and 1 only; entry 2 defaults opaque
    w, h, ch, out = codecs.decode_png(
        _encode_png_palette(idx, palette, [0, 0], trns=bytes([10, 200])))
    assert (w, h, ch) == (3, 2, 4)
    alpha = np.array([10, 200, 255], np.uint8)
    expect = np.dstack([palette[idx], alpha[idx]])
    assert out == expect.tobytes()


def test_png_palette_malformed():
    palette = np.zeros((4, 3), np.uint8)
    idx = np.array([[0, 1, 5]], np.uint8)     # index 5 >= 4 entries
    with pytest.raises(ValueError, match="palette index"):
        codecs.decode_png(_encode_png_palette(idx, palette, [0]))
    good = _encode_png_palette(np.zeros((1, 2), np.uint8), palette, [0])
    # strip the PLTE chunk: type-3 without PLTE is malformed
    plte_at = good.index(b"PLTE") - 4
    plte_len = struct.unpack(">I", good[plte_at:plte_at + 4])[0]
    no_plte = good[:plte_at] + good[plte_at + 12 + plte_len:]
    with pytest.raises(ValueError, match="without a PLTE"):
        codecs.decode_png(no_plte)


def test_wav_malformed_fmt_chunk():
    # 0 channels must be ValueError, not ZeroDivisionError
    body = (b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", 1, 0, 8000, 8000, 1, 8)
            + b"data" + struct.pack("<I", 2) + b"\x00\x00")
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(ValueError, match="malformed fmt"):
        codecs.decode_wav(data)
    # fmt body shorter than 16 bytes must be ValueError, not struct.error
    short = (b"fmt " + struct.pack("<I", 8) + b"\x01\x00\x01\x00\x40\x1f\x00\x00"
             + b"data" + struct.pack("<I", 0))
    data = b"RIFF" + struct.pack("<I", 4 + len(short)) + b"WAVE" + short
    with pytest.raises(ValueError, match="malformed fmt"):
        codecs.decode_wav(data)


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
    assert codecs.sniff_media(b"\xff\xd8\xff\xe0JFIF") == "jpeg"
    with pytest.raises(NotImplementedError, match="image library"):
        codecs.decode_image_bytes(b"II*\x00 a TIFF, not decodable")


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


def test_decode_audio_drops_undecodable_rows(spark):
    """Documented contract: a malformed or compressed audio payload is
    dropped, it must not fail the whole stage."""
    from feldman_spark.pipeline.multimodal import decode_audio, media_table

    good = _encode_wav(np.zeros((80, 1), np.int16), 8000)
    truncated = good[:20]                       # RIFF header only
    zero_ch = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
               + b"fmt " + struct.pack("<I", 16)
               + struct.pack("<HHIIHH", 1, 0, 8000, 8000, 1, 8)
               + b"data" + struct.pack("<I", 0))
    nonpcm = good.replace(struct.pack("<HH", 1, 1),
                          struct.pack("<HH", 85, 1), 1)  # fmt 85 = MP3
    rows = [
        (1, "audio", "audio/wav", None, None, None, good),
        (2, "audio", "audio/wav", None, None, None, truncated),
        (3, "audio", "audio/wav", None, None, None, zero_ch),
        (4, "audio", "audio/mp3", None, None, None, nonpcm),
    ]
    out = decode_audio(media_table(spark, rows)).collect()
    assert [r["media_id"] for r in out] == [1]


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

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(1, 11),
        h=st.integers(1, 8),
        n_colors=st.integers(1, 256),
        with_trns=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
        data=st.data(),
    )
    def test_png_palette_roundtrip_property(w, h, n_colors, with_trns,
                                            seed, data):
        filters = data.draw(
            st.lists(st.integers(0, 4), min_size=h, max_size=h))
        rng = np.random.RandomState(seed)
        palette = rng.randint(0, 256, size=(n_colors, 3), dtype=np.uint8)
        idx = rng.randint(0, n_colors, size=(h, w), dtype=np.uint8)
        trns = None
        if with_trns:
            n_trns = rng.randint(1, n_colors + 1)
            trns = rng.randint(0, 256, size=n_trns, dtype=np.uint8).tobytes()
        gw, gh, gch, out = codecs.decode_png(
            _encode_png_palette(idx, palette, filters, trns=trns))
        assert (gw, gh) == (w, h)
        if trns is None:
            assert gch == 3
            assert out == palette[idx].tobytes()
        else:
            assert gch == 4
            alpha = np.full(n_colors, 255, dtype=np.uint8)
            t = np.frombuffer(trns, dtype=np.uint8)
            alpha[: len(t)] = t
            expect = np.dstack([palette[idx], alpha[idx]])
            assert out == expect.tobytes()

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


# ---------------------------------------------------------------------------
# baseline JPEG: test-side encoder (forward DCT/quantize/Huffman direction)
# ---------------------------------------------------------------------------

# orthonormal 8-point DCT-II basis, written out independently of the decoder
_JT = np.array(
    [[(np.sqrt(0.5) if u == 0 else 1.0) / 2.0
      * np.cos((2 * x + 1) * u * np.pi / 16.0)
      for u in range(8)] for x in range(8)])


def _jzz() -> np.ndarray:
    seq = []
    for s in range(15):
        d = [(s - j, j) for j in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2:
            d.reverse()
        seq.extend(d)
    return np.array([r * 8 + c for r, c in seq])

_JZZ = _jzz()

# ITU-T T.81 Annex K example quantization tables (natural row order)
_JQ_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99]).reshape(8, 8)
_JQ_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99]).reshape(8, 8)

# constructed canonical Huffman tables (any valid table is legal JPEG —
# the decoder must use what the DHT segments define, not assume Annex K):
# DC: 12 categories at 4 bits; AC: EOB+ZRL at 8 bits, 160 run/size at 9.
_JDC_BITS = [0, 0, 0, 12] + [0] * 12
_JDC_VALS = list(range(12))
_JAC_BITS = [0, 0, 0, 0, 0, 0, 0, 2, 160] + [0] * 7
_JAC_VALS = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                            for s in range(1, 11)]


def _enc_table(bits, vals):
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return table

_JDC_ENC = _enc_table(_JDC_BITS, _JDC_VALS)
_JAC_ENC = _enc_table(_JAC_BITS, _JAC_VALS)


class _JBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val: int, nbits: int):
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (val & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:          # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _jseg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _jpeg_quant(base: np.ndarray, quality: int) -> np.ndarray:
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _encode_jpeg(pixels: np.ndarray, quality: int = 100,
                 subsample: str = "444", restart: int = 0) -> bytes:
    """Baseline-sequential JFIF encoder: (h, w) gray or (h, w, 3) RGB."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if gray:
        planes = [pixels.astype(np.float64)]
        sampling = [(1, 1)]
        qsel = [0]
    else:
        p = pixels.astype(np.float64)
        r, g, b = p[:, :, 0], p[:, :, 1], p[:, :, 2]
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
                  0.5 * r - 0.418688 * g - 0.081312 * b + 128.0]
        sampling = {"444": [(1, 1)] * 3,
                    "422": [(2, 1), (1, 1), (1, 1)],
                    "420": [(2, 2), (1, 1), (1, 1)]}[subsample]
        qsel = [0, 1, 1]
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    pad_h, pad_w = mcuy * 8 * vmax, mcux * 8 * hmax
    qts = [_jpeg_quant(_JQ_LUM, quality), _jpeg_quant(_JQ_CHR, quality)]
    comp_planes = []
    for plane, (sh, sv) in zip(planes, sampling):
        full = np.pad(plane, ((0, pad_h - h), (0, pad_w - w)), mode="edge")
        fy, fx = vmax // sv, hmax // sh
        if fy > 1 or fx > 1:   # box-average downsample
            full = full.reshape(pad_h // fy, fy, pad_w // fx, fx).mean((1, 3))
        comp_planes.append(full - 128.0)
    writer = _JBitWriter()
    pred = [0] * len(planes)
    ecs_parts = []
    n_mcus = mcux * mcuy
    for m in range(n_mcus):
        my, mx = divmod(m, mcux)
        for ci, ((sh, sv), plane) in enumerate(zip(sampling, comp_planes)):
            qt = qts[qsel[ci]].astype(np.float64)
            for v in range(sv):
                for hh in range(sh):
                    by, bx = (my * sv + v) * 8, (mx * sh + hh) * 8
                    block = plane[by:by + 8, bx:bx + 8]
                    fr = _JT.T @ block @ _JT
                    q = np.round(fr / qt).astype(np.int64)
                    zz = q.reshape(-1)[_JZZ]
                    zz[1:] = np.clip(zz[1:], -1023, 1023)
                    diff = int(np.clip(zz[0] - pred[ci], -2047, 2047))
                    pred[ci] += diff
                    size = abs(diff).bit_length()
                    ln, code = _JDC_ENC[size]
                    writer.put(code, ln)
                    writer.put(diff if diff >= 0 else diff + (1 << size) - 1,
                               size)
                    run = 0
                    for k in range(1, 64):
                        val = int(zz[k])
                        if val == 0:
                            run += 1
                            continue
                        while run > 15:
                            ln, code = _JAC_ENC[0xF0]
                            writer.put(code, ln)
                            run -= 16
                        sz = abs(val).bit_length()
                        ln, code = _JAC_ENC[(run << 4) | sz]
                        writer.put(code, ln)
                        writer.put(val if val >= 0 else val + (1 << sz) - 1,
                                   sz)
                        run = 0
                    if run:
                        ln, code = _JAC_ENC[0x00]   # EOB
                        writer.put(code, ln)
        if restart and (m + 1) % restart == 0 and m + 1 < n_mcus:
            writer.flush()
            ecs_parts.append(bytes(writer.out))
            ecs_parts.append(bytes([0xFF, 0xD0 + ((m + 1) // restart - 1) % 8]))
            writer = _JBitWriter()
            pred = [0] * len(planes)
    writer.flush()
    ecs_parts.append(bytes(writer.out))
    out = bytearray(b"\xff\xd8")
    out += _jseg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1)
                 + b"\x00\x00")
    for ti in sorted(set(qsel)):
        out += _jseg(0xDB, bytes([ti])
                     + bytes(qts[ti].reshape(-1)[_JZZ].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for ci, (sh, sv) in enumerate(sampling):
        sof += bytes([ci + 1, (sh << 4) | sv, qsel[ci]])
    out += _jseg(0xC0, sof)
    for tc in (0, 1):
        for th in sorted(set(qsel)):
            bits = _JDC_BITS if tc == 0 else _JAC_BITS
            vals = _JDC_VALS if tc == 0 else _JAC_VALS
            out += _jseg(0xC4, bytes([(tc << 4) | th]) + bytes(bits)
                         + bytes(vals))
    if restart:
        out += _jseg(0xDD, struct.pack(">H", restart))
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, (qsel[ci] << 4) | qsel[ci]])
    sos += b"\x00\x3f\x00"
    out += _jseg(0xDA, sos)
    out += b"".join(ecs_parts)
    out += b"\xff\xd9"
    return bytes(out)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


# ---------------------------------------------------------------------------
# baseline JPEG decoder tests
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape", [(8, 8), (16, 24), (13, 7), (32, 33)])
def test_jpeg_gray_roundtrip_nearlossless(shape):
    rng = np.random.RandomState(41)
    img = rng.randint(0, 256, size=shape, dtype=np.uint8)
    w, h, ch, out = codecs.decode_jpeg(_encode_jpeg(img, quality=100))
    assert (w, h, ch) == (shape[1], shape[0], 1)
    got = np.frombuffer(out, np.uint8).reshape(shape)
    err = np.abs(got.astype(int) - img.astype(int))
    assert err.max() <= 4 and err.mean() <= 1.0


def test_jpeg_flat_image_is_exact():
    img = np.full((24, 16, 3), (90, 160, 203), dtype=np.uint8)
    for sub in ("444", "420"):
        w, h, ch, out = codecs.decode_jpeg(
            _encode_jpeg(img, quality=90, subsample=sub))
        got = np.frombuffer(out, np.uint8).reshape(24, 16, 3)
        assert (w, h, ch) == (16, 24, 3)
        assert np.abs(got.astype(int) - img.astype(int)).max() <= 1


def test_jpeg_color_444_nearlossless():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(24, 17, 3), dtype=np.uint8)
    w, h, ch, out = codecs.decode_jpeg(_encode_jpeg(img, quality=100))
    got = np.frombuffer(out, np.uint8).reshape(24, 17, 3)
    assert (w, h, ch) == (17, 24, 3)
    assert _psnr(img, got) > 40.0
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 8


@pytest.mark.parametrize("sub", ["420", "422"])
def test_jpeg_subsampled_gradient(sub):
    yy, xx = np.mgrid[0:40, 0:56]
    img = np.stack([(yy * 3 + 20) % 200 + 20,
                    (xx * 2 + 40) % 200 + 20,
                    ((xx + yy) * 2) % 200 + 20], axis=-1).astype(np.uint8)
    w, h, ch, out = codecs.decode_jpeg(
        _encode_jpeg(img, quality=90, subsample=sub))
    got = np.frombuffer(out, np.uint8).reshape(40, 56, 3)
    assert (w, h, ch) == (56, 40, 3)
    assert _psnr(img, got) > 24.0


def test_jpeg_restart_markers_do_not_change_pixels():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(32, 48), dtype=np.uint8)
    plain = codecs.decode_jpeg(_encode_jpeg(img, quality=85))
    rst = codecs.decode_jpeg(_encode_jpeg(img, quality=85, restart=2))
    assert plain == rst
    assert b"\xff\xdd" in _encode_jpeg(img, quality=85, restart=2)  # DRI


def test_jpeg_quality_knob_reduces_size_monotonically():
    rng = np.random.RandomState(3)
    base = rng.randint(0, 80, size=(32, 32), dtype=np.uint8)
    img = (base + np.mgrid[0:32, 0:32][0] * 4).astype(np.uint8)
    sizes = [len(_encode_jpeg(img, quality=q)) for q in (100, 75, 25)]
    assert sizes[0] > sizes[1] > sizes[2]
    for q, floor_psnr in ((75, 28.0), (25, 20.0)):
        w, h, ch, out = codecs.decode_jpeg(_encode_jpeg(img, quality=q))
        got = np.frombuffer(out, np.uint8).reshape(32, 32)
        assert _psnr(img, got) > floor_psnr


def test_jpeg_malformed_raise():
    img = np.zeros((8, 8), dtype=np.uint8)
    good = _encode_jpeg(img)
    sof = good.index(b"\xff\xc0")
    # a baseline stream RELABELED as SOF2 is a malformed progressive
    # file (its scan header says Ss=0..Se=63, illegal for SOF2)
    relabeled = good[:sof + 1] + b"\xc2" + good[sof + 2:]
    with pytest.raises(ValueError, match="spectral band"):
        codecs.decode_jpeg(relabeled)
    with pytest.raises(ValueError, match="SOI"):
        codecs.decode_jpeg(b"\x00\x01" + good)
    rng = np.random.RandomState(2)
    dense = _encode_jpeg(rng.randint(0, 256, (32, 32), np.uint8))
    with pytest.raises(ValueError):
        codecs.decode_jpeg(dense[: len(dense) // 2])


def test_jpeg_progressive_roundtrip_equals_baseline():
    """Progressive (SOF2: DC/AC first + refinement scans, successive
    approximation, EOB runs) codes the SAME quantized coefficients as
    baseline, so the two decodes must reconstruct IDENTICAL pixels —
    gray and color, subsampled and not, including odd (non-MCU-aligned)
    sizes that make the non-interleaved AC grid differ from the padded
    MCU grid."""
    rng = np.random.RandomState(11)
    cases = [
        # (h, w, channels, subsample)
        (16, 16, 1, "444"),
        (13, 21, 1, "444"),          # odd size, gray
        (16, 24, 3, "444"),
        (32, 32, 3, "420"),
        (19, 27, 3, "420"),          # odd size + subsampling
        (16, 18, 3, "422"),
    ]
    for h, w, ch, sub in cases:
        smooth = (np.mgrid[0:h, 0:w][0] * 5 + np.mgrid[0:h, 0:w][1] * 3)
        img = ((smooth[..., None] if ch == 3 else smooth)
               + rng.randint(0, 60, size=(h, w, ch) if ch == 3 else (h, w))
               ).astype(np.uint8)
        px = img.tobytes()
        base = codecs.encode_jpeg(px, w, h, ch, quality=80, subsample=sub)
        prog = codecs.encode_jpeg(px, w, h, ch, quality=80, subsample=sub,
                                  progressive=True)
        assert prog[:4] != base[:4] or prog != base   # distinct streams
        assert b"\xff\xc2" in prog and b"\xff\xc0" not in prog
        wb, hb, cb, out_b = codecs.decode_jpeg(base)
        wp, hp, cp, out_p = codecs.decode_jpeg(prog)
        assert (wb, hb, cb) == (wp, hp, cp) == (w, h, ch)
        assert out_b == out_p, f"case {(h, w, ch, sub)}"


def test_jpeg_progressive_through_sniff_dispatch():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    prog = codecs.encode_jpeg(img.tobytes(), 8, 8, 1, progressive=True)
    assert codecs.sniff_media(prog) == "jpeg"
    w, h, ch, out = codecs.decode_image_bytes(prog)
    assert (w, h, ch) == (8, 8, 1)
    base = codecs.decode_jpeg(codecs.encode_jpeg(img.tobytes(), 8, 8, 1))
    assert out == base[3]


def test_jpeg_through_spark_decode_image(spark):
    from feldman_spark.pipeline.multimodal import decode_image, media_table

    rng = np.random.RandomState(17)
    img = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    rows = [(1, "image", "image/jpeg", 8, 8, None,
             _encode_jpeg(img, quality=100))]
    out = decode_image(media_table(spark, rows)).collect()
    got = np.frombuffer(bytes(out[0]["pixels"]), np.uint8).reshape(8, 8, 3)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 8


# ---------------------------------------------------------------------------
# production PNG writer + bilinear resize + image stats
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ch", [1, 3, 4])
def test_encode_png_roundtrips_exactly(ch):
    rng = np.random.RandomState(23)
    img = rng.randint(0, 256, size=(9, 5, ch), dtype=np.uint8)
    data = codecs.encode_png(img.tobytes(), 5, 9, ch)
    w, h, och, out = codecs.decode_png(data)
    assert (w, h, och) == (5, 9, ch)
    assert out == img.tobytes()


def test_encode_png_validates():
    with pytest.raises(ValueError, match="channels"):
        codecs.encode_png(b"\x00" * 12, 2, 2, 5)
    with pytest.raises(ValueError, match="bytes"):
        codecs.encode_png(b"\x00" * 11, 2, 2, 3)


def test_resize_pixels_identity_and_flat():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(6, 7, 3), dtype=np.uint8)
    same = codecs.resize_pixels(img.tobytes(), 7, 6, 3, 7, 6)
    assert same == img.tobytes()            # identity resize is exact
    flat = np.full((8, 8, 3), 77, np.uint8)
    down = codecs.resize_pixels(flat.tobytes(), 8, 8, 3, 3, 5)
    assert set(down) == {77}                # flat stays flat at any scale
    with pytest.raises(ValueError, match=">= 1x1"):
        codecs.resize_pixels(flat.tobytes(), 8, 8, 3, 0, 4)


def test_resize_pixels_bilinear_center():
    # 2x2 -> 1x1: target center samples the middle -> average of corners
    img = np.array([[[0], [100]], [[200], [60]]], dtype=np.uint8)
    out = codecs.resize_pixels(img.tobytes(), 2, 2, 1, 1, 1)
    assert out[0] == round((0 + 100 + 200 + 60) / 4)


def test_resize_image_real_path_through_spark(spark):
    from feldman_spark.pipeline.multimodal import media_table, resize_image

    rng = np.random.RandomState(8)
    img = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    rows = [
        (1, "image", "image/png", 16, 16, None, _encode_png(img, [0] * 16)),
        (2, "image", "image/jpeg", 16, 16, None,
         _encode_jpeg(img, quality=100)),
        (3, "image", "image/webp", 4, 4, None, b"RIFFxxxxWEBPVP8 "),
        (4, "audio", "audio/wav", None, None, 10,
         _encode_wav(np.zeros((8, 1), np.int16), 8000)),
    ]
    out = {r["media_id"]: r for r in
           resize_image(media_table(spark, rows), 4, 4).collect()}
    for mid in (1, 2):
        assert (out[mid]["width"], out[mid]["height"]) == (4, 4)
        w, h, ch, px = codecs.decode_png(bytes(out[mid]["data"]))
        assert (w, h, ch) == (4, 4, 3)
    # undecodable image and non-image rows pass through unchanged
    assert bytes(out[3]["data"]) == b"RIFFxxxxWEBPVP8 "
    assert (out[3]["width"], out[3]["height"]) == (4, 4)
    assert out[4]["duration_ms"] == 10


def test_image_stats_through_spark(spark):
    from feldman_spark.pipeline.multimodal import image_stats, media_table

    flat = np.full((8, 8, 3), 50, np.uint8)
    rng = np.random.RandomState(4)
    noisy = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    rows = [
        (1, "image", "image/png", 8, 8, None, _encode_png(flat, [0] * 8)),
        (2, "image", "image/png", 8, 8, None, _encode_png(noisy, [1] * 8)),
        (3, "image", "image/webp", 8, 8, None, b"not an image"),
    ]
    out = {r["media_id"]: r for r in
           image_stats(media_table(spark, rows)).collect()}
    assert sorted(out) == [1, 2]            # undecodable dropped
    assert out[1]["mean_luma"] == 50.0
    assert out[1]["std_luma"] == 0.0 and out[1]["entropy"] == 0.0
    assert out[2]["entropy"] > 4.0          # noisy image: high entropy
    assert (out[2]["width"], out[2]["channels"]) == (8, 3)


# ---------------------------------------------------------------------------
# video container probes (MP4 / AVI) — metadata without frame decode
# ---------------------------------------------------------------------------

def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _make_mp4(duration_ms=4500, timescale=1000, w=640, h=360,
              version=0) -> bytes:
    dur = duration_ms * timescale // 1000
    if version == 1:
        mvhd = (b"\x01\x00\x00\x00" + b"\x00" * 16
                + struct.pack(">IQ", timescale, dur) + b"\x00" * 80)
        tkhd = (b"\x01\x00\x00\x07" + b"\x00" * 84
                + struct.pack(">II", w << 16, h << 16))
    else:
        mvhd = (b"\x00\x00\x00\x00" + b"\x00" * 8
                + struct.pack(">II", timescale, dur) + b"\x00" * 80)
        tkhd = (b"\x00\x00\x00\x07" + b"\x00" * 72
                + struct.pack(">II", w << 16, h << 16))
    moov = _box(b"moov", _box(b"mvhd", mvhd)
                + _box(b"trak", _box(b"tkhd", tkhd)))
    return _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov


def _make_avi(us_per_frame=40000, frames=250, w=320, h=240) -> bytes:
    avih = (struct.pack("<I", us_per_frame) + b"\x00" * 12
            + struct.pack("<I", frames) + b"\x00" * 12
            + struct.pack("<II", w, h) + b"\x00" * 16)
    hdrl = b"LIST" + struct.pack("<I", 4 + 8 + len(avih)) + b"hdrl" \
        + b"avih" + struct.pack("<I", len(avih)) + avih
    return b"RIFF" + struct.pack("<I", 4 + len(hdrl)) + b"AVI " + hdrl


@pytest.mark.parametrize("version", [0, 1])
def test_probe_mp4_duration_and_dims(version):
    data = _make_mp4(duration_ms=4500, w=640, h=360, version=version)
    assert codecs.sniff_media(data) == "mp4"
    assert codecs.probe_video(data) == ("mp4", 4500, 640, 360)


def test_probe_avi_duration_and_dims():
    data = _make_avi(us_per_frame=40000, frames=250, w=320, h=240)
    assert codecs.sniff_media(data) == "avi"
    # 250 frames at 25 fps = 10 s
    assert codecs.probe_video(data) == ("avi", 10000, 320, 240)


def test_probe_video_malformed_and_unknown():
    with pytest.raises(ValueError, match="moov"):
        codecs.probe_mp4(_box(b"ftyp", b"isom"))
    bad = _make_mp4()
    moov_at = bad.index(b"moov") - 4
    with pytest.raises(ValueError, match="box size"):
        codecs.probe_mp4(bad[:moov_at] + struct.pack(">I", 2)
                         + bad[moov_at + 4:])
    with pytest.raises(ValueError, match="avih"):
        codecs.probe_avi(b"RIFF" + struct.pack("<I", 4) + b"AVI ")
    with pytest.raises(NotImplementedError, match="ffprobe"):
        codecs.probe_video(b"\x1aE\xdf\xa3 matroska, not parseable")


def test_probe_media_through_spark(spark):
    from feldman_spark.pipeline.multimodal import media_table, probe_media

    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    rows = [
        (1, "video", "video/mp4", None, None, None, _make_mp4(3000, w=1280, h=720)),
        (2, "video", "video/avi", None, None, None, _make_avi(frames=50)),
        (3, "image", "image/png", 4, 4, None, _encode_png(img, [0] * 4)),
        (4, "audio", "audio/wav", None, None, None,
         _encode_wav(np.zeros((8000, 1), np.int16), 8000)),
        (5, "video", "video/mkv", None, None, None, b"\x1aE\xdf\xa3..."),
        (6, "image", "image/png", 1, 1, None, None),
    ]
    out = {r["media_id"]: r for r in
           probe_media(media_table(spark, rows)).collect()}
    assert sorted(out) == [1, 2, 3, 4]       # mkv + null payload dropped
    assert (out[1]["container"], out[1]["duration_ms"],
            out[1]["width"], out[1]["height"]) == ("mp4", 3000, 1280, 720)
    assert (out[2]["container"], out[2]["duration_ms"]) == ("avi", 2000)
    assert (out[3]["container"], out[3]["width"]) == ("png", 4)
    assert (out[4]["container"], out[4]["duration_ms"]) == ("wav", 1000)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 24),
        color=st.booleans(),
        sub=st.sampled_from(["444", "420", "422"]),
        restart=st.sampled_from([0, 1, 3]),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_jpeg_roundtrip_property(w, h, color, sub, restart, seed):
        """Any shape / subsampling / restart interval decodes to the
        right dimensions, and near-lossless quality stays near-lossless
        for 4:4:4 (subsampled chroma is bounded by PSNR instead)."""
        rng = np.random.RandomState(seed)
        shape = (h, w, 3) if color else (h, w)
        img = rng.randint(0, 256, size=shape, dtype=np.uint8)
        if not color:
            sub = "444"  # gray has no chroma to subsample
        data = _encode_jpeg(img, quality=100, subsample=sub,
                            restart=restart)
        gw, gh, ch, out = codecs.decode_jpeg(data)
        assert (gw, gh, ch) == (w, h, 3 if color else 1)
        got = np.frombuffer(out, np.uint8).reshape(
            (h, w, 3) if color else (h, w))
        if sub == "444":
            bound = 8 if color else 4   # coef rounding (+YCbCr for color)
            assert np.abs(got.astype(int) - img.astype(int)).max() <= bound
        else:
            assert _psnr(img, got) > 10.0  # random noise chroma: loose

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 24),
        color=st.booleans(),
        sub=st.sampled_from(["444", "420", "422"]),
        quality=st.sampled_from([25, 80, 100]),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_jpeg_progressive_equals_baseline_property(
            w, h, color, sub, quality, seed):
        """Progressive and baseline code the SAME quantized coefficients,
        so their decodes must be byte-identical for ANY shape /
        subsampling / quality — random pixels maximize EOB-run,
        refinement-bit and correction-bit coverage in the SOF2 scans."""
        rng = np.random.RandomState(seed)
        ch = 3 if color else 1
        img = rng.randint(0, 256,
                          size=(h, w, ch) if color else (h, w),
                          dtype=np.uint8)
        px = img.tobytes()
        base = codecs.encode_jpeg(px, w, h, ch, quality=quality,
                                  subsample=sub)
        prog = codecs.encode_jpeg(px, w, h, ch, quality=quality,
                                  subsample=sub, progressive=True)
        assert codecs.decode_jpeg(base) == codecs.decode_jpeg(prog)

except ImportError:  # pragma: no cover - hypothesis is baked in here
    pass


# ---------------------------------------------------------------------------
# absolute JPEG fixture: a minimal stream hand-assembled from byte
# literals per ITU-T T.81, with the expected pixels derived analytically
# (DC-only block: pixel = diff/8 + 128) — no encoder of ours in the
# loop, so a systematic error shared by the production and test-side
# encoders cannot round-trip invisibly through it
# ---------------------------------------------------------------------------

def _hand_assembled_jpeg(dc_diff: int) -> bytes:
    """8x8 grayscale baseline JPEG, one MCU, DC-only, quant table all
    ones (identity dequant). DC Huffman: 12 categories at 4 bits
    (canonical codes 0000..1011 for categories 0..11); AC Huffman: the
    single EOB symbol at 2 bits (code 00). Entropy segment is computed
    here by hand from those canonical codes, not by any shared
    bit-writer."""
    assert 32 <= dc_diff <= 63          # keep the hand-coding to category 6
    soi = b"\xff\xd8"
    dqt = b"\xff\xdb" + struct.pack(">B", 0).join([b""]) \
        + struct.pack(">HB", 67, 0x00) + bytes([1] * 64)
    sof = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) \
        + bytes([1, 0x11, 0])           # comp id 1, 1x1 sampling, qtable 0
    dht_dc = b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + 12, 0x00) \
        + bytes([0, 0, 0, 12] + [0] * 12) + bytes(range(12))
    dht_ac = b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + 1, 0x10) \
        + bytes([0, 1] + [0] * 14) + bytes([0x00])
    sos = b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])
    # bits: category-6 DC code 0110, 6 magnitude bits of dc_diff, AC EOB
    # code 00, pad to a byte boundary with 1s
    bits = "0110" + format(dc_diff, "06b") + "00"
    bits += "1" * (-len(bits) % 8)
    entropy = bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))
    return soi + dqt + sof + dht_dc + dht_ac + sos + entropy + b"\xff\xd9"


def test_decode_jpeg_hand_assembled_absolute():
    # dc_diff = 40 → every decoded sample is exactly 40/8 + 128 = 133
    data = _hand_assembled_jpeg(40)
    assert codecs.sniff_media(data) == "jpeg"
    w, h, ch, out = codecs.decode_jpeg(data)
    assert (w, h, ch) == (8, 8, 1)
    assert out == bytes([133] * 64)
    # a second level, same stream skeleton: 56/8 + 128 = 135
    w, h, ch, out = codecs.decode_jpeg(_hand_assembled_jpeg(56))
    assert (w, h, ch) == (8, 8, 1)
    assert out == bytes([135] * 64)


# ---------------------------------------------------------------------------
# production JPEG encoder (write side; validated against decode_jpeg,
# whose own tests use the test-side forward-direction encoder above —
# written separately but from the same published tables, so the
# hand-assembled absolute fixture above is what rules out a shared
# systematic error — plus flat-image exactness and PSNR checks)
# ---------------------------------------------------------------------------

def test_encode_jpeg_roundtrips_through_decoder():
    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, size=(24, 17, 3), dtype=np.uint8)
    data = codecs.encode_jpeg(img.tobytes(), 17, 24, 3, quality=100,
                              subsample="444")
    assert codecs.sniff_media(data) == "jpeg"
    w, h, ch, out = codecs.decode_jpeg(data)
    assert (w, h, ch) == (17, 24, 3)
    got = np.frombuffer(out, np.uint8).reshape(24, 17, 3)
    assert _psnr(img, got) > 40.0
    gray = rng.randint(0, 256, size=(9, 11), dtype=np.uint8)
    gdata = codecs.encode_jpeg(gray.tobytes(), 11, 9, 1, quality=100)
    w, h, ch, out = codecs.decode_jpeg(gdata)
    assert (w, h, ch) == (11, 9, 1)
    gerr = np.abs(np.frombuffer(out, np.uint8).reshape(9, 11).astype(int)
                  - gray.astype(int))
    assert gerr.max() <= 4


def test_encode_jpeg_quality_and_subsampling_shrink_bytes():
    yy, xx = np.mgrid[0:32, 0:48]
    img = np.stack([(yy * 3) % 220, (xx * 2) % 220,
                    ((xx + yy)) % 220], axis=-1).astype(np.uint8)
    hi = codecs.encode_jpeg(img.tobytes(), 48, 32, 3, quality=95,
                            subsample="444")
    lo = codecs.encode_jpeg(img.tobytes(), 48, 32, 3, quality=40,
                            subsample="420")
    assert len(lo) < len(hi)
    w, h, ch, out = codecs.decode_jpeg(lo)
    got = np.frombuffer(out, np.uint8).reshape(32, 48, 3)
    assert _psnr(img, got) > 22.0
    # rgba drops alpha, still valid
    rgba = np.dstack([img, np.full((32, 48), 255, np.uint8)])
    d4 = codecs.encode_jpeg(rgba.tobytes(), 48, 32, 4, quality=85)
    assert codecs.decode_jpeg(d4)[2] == 3


def test_encode_jpeg_validates():
    with pytest.raises(ValueError, match="channels"):
        codecs.encode_jpeg(b"\x00" * 8, 2, 2, 2)
    with pytest.raises(ValueError, match="bytes"):
        codecs.encode_jpeg(b"\x00" * 11, 2, 2, 3)
    with pytest.raises(ValueError, match="quality"):
        codecs.encode_jpeg(b"\x00" * 12, 2, 2, 3, quality=0)
    with pytest.raises(ValueError, match="subsample"):
        codecs.encode_jpeg(b"\x00" * 12, 2, 2, 3, subsample="411")


def test_resize_image_jpeg_output_through_spark(spark):
    from feldman_spark.pipeline.multimodal import media_table, resize_image

    rng = np.random.RandomState(31)
    img = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    rows = [(1, "image", "image/png", 16, 16, None,
             _encode_png(img, [0] * 16))]
    out = resize_image(media_table(spark, rows), 8, 8,
                       out_format="jpeg", quality=90).collect()[0]
    data = bytes(out["data"])
    assert codecs.sniff_media(data) == "jpeg"
    w, h, ch, _px = codecs.decode_jpeg(data)
    assert (w, h, ch) == (8, 8, 3)
    with pytest.raises(ValueError, match="out_format"):
        resize_image(media_table(spark, rows), 8, 8, out_format="webp")
