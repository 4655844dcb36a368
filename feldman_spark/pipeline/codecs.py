"""Pure-stdlib media codecs for the multimodal pipeline.

Real decoders for the three formats a dependency-free environment can
honestly support — PNG (RFC 2083: zlib + per-row filters), uncompressed
BMP (BITMAPINFOHEADER, 24/32-bit), and RIFF/WAVE PCM (8/16-bit) — so
:mod:`feldman_spark.pipeline.multimodal` decodes actual bytes instead of
raising behind the stub. Anything else (JPEG, MP3, video containers)
still raises ``NotImplementedError`` at the documented swap point: those
formats genuinely need PIL/ffmpeg, and faking them would be worse than
refusing.

Throughput note: these are reference decoders (numpy-assisted but
row-sequential where the format is — PNG's Sub/Avg/Paeth filters chain
on the left neighbor). They are correct and fine for metadata probes,
smoke tests, and modest thumbnails; a 100 TB media pipeline swaps in a
vectorized library (PIL/libvips/ffmpeg) AT THE SAME call sites without
touching the Spark dataflow around them.
"""

from __future__ import annotations

import struct
import zlib
from typing import Optional, Tuple

import numpy as np

__all__ = [
    "sniff_media",
    "decode_png",
    "decode_bmp",
    "decode_wav",
    "decode_image_bytes",
]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# PNG color type -> samples per pixel (8-bit depth supported)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def sniff_media(data: bytes) -> Optional[str]:
    """Identify a payload by magic bytes: 'png' | 'bmp' | 'wav' | None."""
    if data is None:
        return None
    b = bytes(data[:16])
    if b.startswith(_PNG_SIG):
        return "png"
    if b.startswith(b"BM"):
        return "bmp"
    if b.startswith(b"RIFF") and b[8:12] == b"WAVE":
        return "wav"
    return None


def _png_unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytes:
    """Undo PNG per-row filters (types 0-4). ``bpp`` = bytes per pixel."""
    stride = width * bpp
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).copy()
        pos += stride
        # scalar accumulation below runs in Python ints — adding two numpy
        # uint8 scalars is correct mod 256 but emits per-add overflow
        # RuntimeWarnings, noisy per worker and fatal under
        # warnings-as-errors
        if ftype == 0:                         # None
            cur = row
        elif ftype == 1:                       # Sub
            cur = row
            for x in range(bpp, stride):
                cur[x] = (int(cur[x]) + int(cur[x - bpp])) & 0xFF
        elif ftype == 2:                       # Up
            cur = ((row.astype(np.uint16) + prev) & 0xFF).astype(np.uint8)
        elif ftype == 3:                       # Average
            cur = row
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:                       # Paeth
            cur = row
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype} in row {y}")
        out[y] = cur
        prev = out[y]
    return out.tobytes()


def decode_png(data: bytes) -> Tuple[int, int, int, bytes]:
    """Decode an 8-bit non-interlaced PNG.

    Returns ``(width, height, channels, pixels)`` with ``pixels`` the
    raw row-major samples (RGB / RGBA / gray / gray+alpha). Palette
    images (color type 3, PLTE chunk, RFC 2083 §4.1.2) decode to
    expanded RGB — or RGBA when a tRNS chunk supplies per-entry alpha.
    Raises ``ValueError`` on malformed bytes and ``NotImplementedError``
    for the PNG features a real library should handle (16-bit and
    sub-byte depths, interlacing).
    """
    data = bytes(data)
    if not data.startswith(_PNG_SIG):
        raise ValueError("PNG: bad signature")
    pos, width = len(_PNG_SIG), None
    height = depth = ctype = None
    idat = bytearray()
    plte = trns = None
    while pos + 8 <= len(data):
        (length,), ctag = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + tag + data + crc
        if ctag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", chunk)
            if depth != 8:
                raise NotImplementedError(f"PNG: bit depth {depth} needs a real library")
            if ctype not in _PNG_CHANNELS and ctype != 3:
                raise NotImplementedError(f"PNG: color type {ctype} needs a real library")
            if interlace:
                raise NotImplementedError("PNG: Adam7 interlacing needs a real library")
            if comp or filt:
                raise ValueError("PNG: nonzero compression/filter method")
        elif ctag == b"PLTE":
            if length == 0 or length % 3 or length > 768:
                raise ValueError(f"PNG: bad PLTE length {length}")
            plte = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif ctag == b"tRNS":
            trns = np.frombuffer(chunk, dtype=np.uint8)
        elif ctag == b"IDAT":
            idat += chunk
        elif ctag == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG: missing IHDR or IDAT")
    # palette pixels are 1-byte indices on the wire; they unfilter like a
    # 1-channel image, then expand through the PLTE lookup table
    ch = 1 if ctype == 3 else _PNG_CHANNELS[ctype]
    raw = zlib.decompress(bytes(idat))
    expect = height * (1 + width * ch)
    if len(raw) != expect:
        raise ValueError(f"PNG: decompressed {len(raw)} bytes, expected {expect}")
    pixels = _png_unfilter(raw, width, height, ch)
    if ctype != 3:
        return width, height, ch, pixels
    if plte is None:
        raise ValueError("PNG: color type 3 without a PLTE chunk")
    idx = np.frombuffer(pixels, dtype=np.uint8)
    if int(idx.max(initial=0)) >= len(plte):
        raise ValueError("PNG: palette index out of range")
    if trns is not None:
        # per-entry alpha; entries past the tRNS table are opaque
        alpha = np.full(len(plte), 255, dtype=np.uint8)
        alpha[: min(len(trns), len(plte))] = trns[: len(plte)]
        lut = np.column_stack([plte, alpha])
    else:
        lut = plte
    out = lut[idx]
    return width, height, lut.shape[1], np.ascontiguousarray(out).tobytes()


def decode_bmp(data: bytes) -> Tuple[int, int, int, bytes]:
    """Decode an uncompressed 24/32-bit BMP (BITMAPINFOHEADER family).

    Returns ``(width, height, channels, pixels)`` — pixels row-major
    TOP-down in RGB(A) order (BMP stores bottom-up BGR; both are
    normalized so PNG and BMP of the same image decode byte-identical).
    """
    data = bytes(data)
    if not data.startswith(b"BM") or len(data) < 54:
        raise ValueError("BMP: bad signature or truncated header")
    pix_off, = struct.unpack_from("<I", data, 10)
    hdr_size, = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise NotImplementedError("BMP: BITMAPCOREHEADER needs a real library")
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression, = struct.unpack_from("<I", data, 30)
    if compression != 0:
        raise NotImplementedError(f"BMP: compression {compression} needs a real library")
    if bpp not in (24, 32):
        raise NotImplementedError(f"BMP: {bpp}-bit needs a real library")
    bottom_up = height > 0
    height = abs(height)
    ch = bpp // 8
    stride = (width * ch + 3) & ~3
    need = pix_off + stride * height
    if len(data) < need:
        raise ValueError(f"BMP: truncated pixel data ({len(data)} < {need})")
    arr = np.frombuffer(data, dtype=np.uint8, count=stride * height,
                        offset=pix_off).reshape(height, stride)
    arr = arr[:, : width * ch].reshape(height, width, ch)
    if bottom_up:
        arr = arr[::-1]
    # BGR(A) -> RGB(A)
    order = [2, 1, 0] + ([3] if ch == 4 else [])
    rgb = arr[:, :, order]
    return width, height, 3 if ch == 3 else 4, np.ascontiguousarray(rgb).tobytes()


def decode_wav(data: bytes) -> Tuple[int, int, int, np.ndarray]:
    """Decode RIFF/WAVE PCM (8-bit unsigned or 16-bit signed).

    Returns ``(sample_rate, channels, duration_ms, samples)`` with
    ``samples`` an int16 array of shape (frames, channels) — 8-bit
    input is centered to int16 range so downstream features are
    depth-independent.
    """
    data = bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("WAV: bad RIFF/WAVE header")
    pos = 12
    rate = channels = bits = None
    frames_raw = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        size, = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            if len(body) < 16:
                raise ValueError(
                    f"WAV: malformed fmt chunk ({len(body)} bytes, need 16)")
            fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits, = struct.unpack_from("<H", body, 14)
            if channels < 1:
                raise ValueError("WAV: malformed fmt chunk (0 channels)")
            if fmt != 1:
                raise NotImplementedError(f"WAV: format {fmt} (non-PCM) needs a real library")
            if bits not in (8, 16):
                raise NotImplementedError(f"WAV: {bits}-bit PCM needs a real library")
        elif tag == b"data":
            frames_raw = body
    if rate is None or frames_raw is None:
        raise ValueError("WAV: missing fmt or data chunk")
    if bits == 16:
        samples = np.frombuffer(
            frames_raw, dtype="<i2",
            count=len(frames_raw) // 2).astype(np.int16)
    else:
        samples = ((np.frombuffer(frames_raw, dtype=np.uint8).astype(np.int16)
                    - 128) << 8)
    nframes = len(samples) // channels
    samples = samples[: nframes * channels].reshape(nframes, channels)
    duration_ms = int(nframes * 1000 // rate) if rate else 0
    return rate, channels, duration_ms, samples


def decode_image_bytes(data: bytes) -> Tuple[int, int, int, bytes]:
    """Dispatch on magic bytes to the PNG/BMP decoder; the single swap
    point where a deployment plugs PIL for the formats stdlib can't do."""
    kind = sniff_media(data)
    if kind == "png":
        return decode_png(data)
    if kind == "bmp":
        return decode_bmp(data)
    raise NotImplementedError(
        "image format not decodable without an image library "
        f"(sniffed: {kind or 'unknown'}); PNG and BMP decode natively — "
        "swap decode_image_bytes for a PIL call for JPEG/WebP/etc.")
