"""Pure-stdlib media codecs: PNG (zlib) and WAV (struct).

Removes the multimodal pipeline's codec stub for the two formats a
standard library can genuinely decode: PNG is DEFLATE-compressed
scanlines with five per-line predictor filters (RFC 2083), WAV is a
RIFF container around raw PCM. No PIL/soundfile/ffmpeg — `zlib`,
`struct`, and numpy only. Baseline JPEG (the DCT/entropy stack) lives
in operators/jpeg.py; only video containers (MP4) remain behind the
``NotImplementedError`` at the ``decode_media`` boundary.

Scale note: these decoders run inside ``mapInPandas`` batches, one
media file per call. PNG unfiltering is a per-scanline Python loop
(the Sub/Paeth filters carry an intra-line byte dependency that
doesn't vectorize cleanly) — fine for metadata-sized images; a
production vision pipeline would swap the codec boundary for a native
decoder exactly as documented in operators/multimodal.py.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+A, RGBA


def decode_png(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """→ (width, height, channels, uint8 array of shape (h, w*channels)).

    Supports bit depth 8, color types 0/2/4/6, no interlace — the
    combinations every standard encoder (including :func:`encode_png`)
    emits for 8-bit imagery."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG file")
    pos, idat, header = 8, [], None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # 4 length + 4 type + data + 4 CRC
        if ctype == b"IHDR":
            header = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    if header is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = header
    if depth != 8 or interlace != 0 or color not in _CHANNELS:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={color}, "
            f"interlace={interlace}); this decoder handles 8-bit "
            "non-interlaced gray/RGB/RGBA"
        )
    channels = _CHANNELS[color]
    stride = w * channels
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != (stride + 1) * h:
        raise ValueError("PNG scanline data has wrong length")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = bytearray(stride)
    bpp = channels  # bytes per pixel at depth 8
    p = 0
    for y in range(h):
        ftype = raw[p]
        line = bytearray(raw[p + 1 : p + 1 + stride])
        p += 1 + stride
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
        prev = line
    return w, h, channels, out


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)


def encode_png(pixels: np.ndarray, channels: int = 1) -> bytes:
    """Encode a uint8 array of shape (h, w*channels) as a minimal PNG
    (filter 0 on every scanline — valid, just uncompressed-predictor)."""
    h, stride = pixels.shape
    if stride % channels:
        raise ValueError("row stride not divisible by channel count")
    w = stride // channels
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[y].astype(np.uint8).tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """→ (sample_rate, n_channels, int16 samples, channel-interleaved).

    PCM only (format tag 1): 16-bit little-endian passes through; 8-bit
    unsigned is widened to int16 (the lossless direction)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            pcm = body
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _byte_rate, _align, bits = fmt
    if audio_format != 1:
        raise ValueError(f"only PCM WAV supported (format tag {audio_format})")
    if bits == 16:
        samples = np.frombuffer(pcm, dtype="<i2").astype(np.int16)
    elif bits == 8:
        samples = ((np.frombuffer(pcm, dtype=np.uint8).astype(np.int16) - 128) << 8)
    else:
        raise ValueError(f"unsupported PCM bit depth {bits}")
    return sample_rate, n_channels, samples


def encode_wav(samples: np.ndarray, sample_rate: int, n_channels: int = 1) -> bytes:
    """Encode int16 samples (channel-interleaved) as PCM WAV."""
    pcm = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate, n_channels * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
