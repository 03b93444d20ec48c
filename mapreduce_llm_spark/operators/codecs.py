"""Pure-stdlib media codecs: PNG (zlib) and WAV (struct).

Removes the multimodal pipeline's codec stub for the two formats a
standard library can genuinely decode: PNG is DEFLATE-compressed
scanlines with five per-line predictor filters (RFC 2083), WAV is a
RIFF container around raw PCM or IMA-ADPCM blocks (the table-driven
4-bit codec from the IMA Digital Audio Pack spec — format tag 0x11).
No PIL/soundfile/ffmpeg — `zlib`, `struct`, and numpy only. Baseline
JPEG (the DCT/entropy stack) lives in operators/jpeg.py; only video
containers (MP4) remain behind the ``NotImplementedError`` at the
``decode_media`` boundary.

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

    PCM (format tag 1): 16-bit little-endian passes through; 8-bit
    unsigned is widened to int16 (the lossless direction). IMA-ADPCM
    (format tag 0x11) decodes through the published step/index tables
    (:func:`_ima_decode_blocks`)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, fmt_body, pcm = 12, None, b"", None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_body = body
        elif cid == b"data":
            pcm = body
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _byte_rate, align, bits = fmt
    if audio_format == 0x11:  # IMA ADPCM
        if bits != 4:
            raise ValueError(f"IMA-ADPCM WAV must be 4-bit (got {bits})")
        if len(fmt_body) < 20:
            raise ValueError("IMA-ADPCM fmt chunk missing samples-per-block")
        (spb,) = struct.unpack("<H", fmt_body[18:20])
        samples = _ima_decode_blocks(pcm, n_channels, align, spb)
        return sample_rate, n_channels, samples
    if audio_format != 1:
        raise ValueError(f"unsupported WAV format tag {audio_format} (PCM=1, IMA-ADPCM=0x11)")
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


# ---------------------------------------------------------------------------
# IMA (DVI) ADPCM — published step/index tables from the IMA Digital Audio
# Pack "Recommended Practices for Enhancing Digital Audio Compatibility"
# (rev 3.00, 1992), the same tables RFC 3551 §4.5.1 reproduces for DVI4.
# 4:1 compression of int16 audio; the codec the reference's training-data
# audio path would meet most often after raw PCM.

_IMA_STEP = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484,
    7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818,
    18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
_IMA_INDEX = (-1, -1, -1, -1, 2, 4, 6, 8)


def _ima_step_sample(pred: int, index: int, code: int) -> tuple[int, int]:
    """One IMA decode step: (predictor, step index) + 4-bit code → updated
    (predictor, step index). Shared by decoder and encoder (the encoder
    must track the decoder's reconstruction, not the true signal)."""
    step = _IMA_STEP[index]
    diff = step >> 3
    if code & 1:
        diff += step >> 2
    if code & 2:
        diff += step >> 1
    if code & 4:
        diff += step
    if code & 8:
        diff = -diff
    pred = max(-32768, min(32767, pred + diff))
    index = max(0, min(88, index + _IMA_INDEX[code & 7]))
    return pred, index


def _ima_decode_blocks(
    pcm: bytes, n_channels: int, block_align: int, samples_per_block: int
) -> np.ndarray:
    """Decode IMA-ADPCM block data → int16 channel-interleaved samples.

    Block layout (per the IMA WAV mapping): per channel a 4-byte header
    (int16 first sample = initial predictor, uint8 step index, reserved),
    then nibble data interleaved in 4-byte groups per channel, low nibble
    first. Like the PNG unfilter loop above, the sample chain carries a
    hard sequential dependency — per-file Python loop inside mapInPandas
    batches is the documented boundary."""
    per_ch = block_align // n_channels
    if per_ch < 4 or block_align % n_channels:
        raise ValueError(f"bad IMA block align {block_align} for {n_channels} channels")
    out: list[np.ndarray] = []
    for b0 in range(0, len(pcm), block_align):
        block = pcm[b0 : b0 + block_align]
        if len(block) < 4 * n_channels:
            break  # trailing padding too short to carry even the headers
        chans: list[list[int]] = []
        preds, idxs = [], []
        for c in range(n_channels):
            pred = struct.unpack_from("<h", block, 4 * c)[0]
            index = block[4 * c + 2]
            if index > 88:
                raise ValueError(f"IMA step index {index} out of range")
            chans.append([pred])
            preds.append(pred)
            idxs.append(index)
        # nibble payload: 4-byte groups round-robin across channels
        payload = block[4 * n_channels :]
        for g0 in range(0, len(payload), 4 * n_channels):
            for c in range(n_channels):
                for byte in payload[g0 + 4 * c : g0 + 4 * c + 4]:
                    for code in (byte & 0x0F, byte >> 4):
                        preds[c], idxs[c] = _ima_step_sample(preds[c], idxs[c], code)
                        chans[c].append(preds[c])
        n = min(samples_per_block, len(chans[0]))
        block_out = np.empty(n * n_channels, dtype=np.int16)
        for c in range(n_channels):
            block_out[c::n_channels] = np.asarray(chans[c][:n], dtype=np.int16)
        out.append(block_out)
    if not out:
        return np.empty(0, dtype=np.int16)
    return np.concatenate(out)


def encode_wav_adpcm(
    samples: np.ndarray,
    sample_rate: int,
    n_channels: int = 1,
    block_align_per_channel: int = 256,
) -> bytes:
    """Encode int16 channel-interleaved samples as an IMA-ADPCM WAV.

    The tail block is padded by repeating each channel's final sample
    (decode yields full blocks; callers trim to their known length).
    The step index persists across blocks; each block header restarts
    the predictor from the true first sample, so error cannot
    accumulate across blocks."""
    if block_align_per_channel < 8 or block_align_per_channel % 4:
        raise ValueError("block align per channel must be a multiple of 4, >= 8")
    spb = (block_align_per_channel - 4) * 2 + 1
    block_align = block_align_per_channel * n_channels
    x = np.asarray(samples, dtype=np.int16)
    if x.size % n_channels:
        raise ValueError("sample count not divisible by channel count")
    frames = x.size // n_channels
    n_blocks = max(1, -(-frames // spb))
    # pad to whole blocks with each channel's last frame (silence if empty)
    pad_frames = n_blocks * spb - frames
    if frames == 0:
        x = np.zeros(n_blocks * spb * n_channels, dtype=np.int16)
    elif pad_frames:
        tail = np.tile(x[-n_channels:], pad_frames)
        x = np.concatenate([x, tail])
    idxs = [0] * n_channels
    blocks: list[bytes] = []
    for b in range(n_blocks):
        frame0 = b * spb
        chunk = x[frame0 * n_channels : (frame0 + spb) * n_channels]
        header = bytearray()
        payload = bytearray()
        codes: list[list[int]] = []
        for c in range(n_channels):
            ch = chunk[c::n_channels].astype(np.int64)
            pred = int(ch[0])
            header += struct.pack("<hBB", pred, idxs[c], 0)
            ch_codes: list[int] = []
            for s in ch[1:]:
                step = _IMA_STEP[idxs[c]]
                diff = int(s) - pred
                code = 8 if diff < 0 else 0
                diff = abs(diff)
                if diff >= step:
                    code |= 4
                    diff -= step
                if diff >= step >> 1:
                    code |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    code |= 1
                pred, idxs[c] = _ima_step_sample(pred, idxs[c], code)
                ch_codes.append(code)
            codes.append(ch_codes)
        # pack nibbles (low first) into 4-byte groups, round-robin channels
        n_codes = len(codes[0])
        for g0 in range(0, n_codes, 8):
            for c in range(n_channels):
                grp = codes[c][g0 : g0 + 8] + [0] * max(0, 8 - (n_codes - g0))
                for i in range(0, 8, 2):
                    payload.append(grp[i] | (grp[i + 1] << 4))
        blocks.append(bytes(header) + bytes(payload))
    pcm = b"".join(blocks)
    byte_rate = (sample_rate * block_align) // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, n_channels, sample_rate, byte_rate, block_align, 4, 2, spb
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
