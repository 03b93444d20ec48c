"""Pure-Python/numpy baseline JPEG codec (ITU-T T.81).

Closes the last image-format gap behind ``decode_media``: the PNG/WAV
codecs (operators/codecs.py) covered the stdlib-decodable formats;
this module implements the DCT/entropy stack JPEG needs with nothing
but numpy — 8×8 orthonormal DCT-II as a matrix product, Annex-K
quantization tables with IJG quality scaling, canonical Huffman coding
with the Annex-K.3 table layouts, JFIF YCbCr color, byte stuffing.

Scope (encoder and decoder, symmetric): baseline sequential DCT,
8-bit, grayscale or 4:4:4 color (no chroma subsampling), no restart
markers, no progressive scans. The decoder reads quantization and
Huffman tables from the file's own DQT/DHT segments — it does not
assume the encoder's tables — and rejects the unsupported variants
loudly (progressive SOF2, subsampled components, DRI) rather than
producing wrong pixels.

Scale note: like the PNG path, this runs inside ``mapInPandas``
batches one file per call. Entropy coding is a per-symbol Python loop
— fine for the thumbnail-sized fixtures the pipeline tests ship; a
production vision pipeline swaps the codec boundary for libjpeg-turbo
exactly as documented in operators/multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]).reshape(8, 8)

Q_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]).reshape(8, 8)

DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))

AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    T = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    T[0, :] = 1.0 / np.sqrt(8)
    return T


_T = _dct_matrix()


def scaled_quant_table(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 → per-entry scale, clamped to [1, 255]."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def build_huffman(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman from the DHT (BITS, HUFFVAL) layout →
    {symbol: (code, length)}. Raises if the layout is not a valid
    prefix code (code space overflow)."""
    if sum(bits) != len(vals):
        raise ValueError("BITS total != number of HUFFVAL symbols")
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError("Huffman code space overflow")
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.put((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # pad with 1s
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data truncated")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("JPEG entropy data truncated")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
            self.acc = (self.acc << 8) | byte
            self.nbits += 8
        out = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return out

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category: value → (size, appended bits)."""
    size = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return np.stack(
        [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ],
        axis=-1,
    )


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    return np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )


def _pad_to_blocks(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, (-h) % 8), (0, (-w) % 8)), mode="edge")


def _encode_block(
    writer: _BitWriter,
    block: np.ndarray,
    qtab: np.ndarray,
    dc_pred: int,
    dc_huff: dict[int, tuple[int, int]],
    ac_huff: dict[int, tuple[int, int]],
) -> int:
    coef = _T @ (block - 128.0) @ _T.T
    quant = np.round(coef / qtab).astype(np.int64)
    zz = quant.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - dc_pred
    size, bits = _magnitude(diff)
    code, length = dc_huff[size]
    writer.put(code, length)
    writer.put(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        if k > last_nz:
            code, length = ac_huff[0x00]  # EOB
            writer.put(code, length)
            break
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_huff[0xF0]  # ZRL
            writer.put(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_huff[(run << 4) | size]
        writer.put(code, length)
        writer.put(bits, size)
        run = 0
    return int(zz[0])


def encode_jpeg(pixels: np.ndarray, channels: int = 1, quality: int = 85) -> bytes:
    """Encode a uint8 array of shape (h, w*channels) — the same calling
    convention as :func:`codecs.encode_png` — as baseline sequential
    JFIF. channels: 1 (grayscale) or 3 (RGB, stored 4:4:4)."""
    if channels not in (1, 3):
        raise ValueError("JPEG encoder supports 1 or 3 channels")
    h, stride = pixels.shape
    if stride % channels:
        raise ValueError("row stride not divisible by channel count")
    w = stride // channels
    img = pixels.reshape(h, w, channels).astype(np.float64)
    if channels == 3:
        img = _rgb_to_ycbcr(img)
    qtabs = [scaled_quant_table(Q_LUM, quality)]
    if channels == 3:
        qtabs.append(scaled_quant_table(Q_CHROM, quality))

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    for tq, tab in enumerate(qtabs):
        payload = bytes([tq]) + bytes(int(x) for x in tab.reshape(-1)[ZIGZAG])
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(payload)) + payload
    ncomp = channels
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    huff_specs = [(0x00, DC_LUM_BITS, DC_LUM_VALS), (0x10, AC_LUM_BITS, AC_LUM_VALS)]
    if channels == 3:
        huff_specs += [
            (0x01, DC_CHROM_BITS, DC_CHROM_VALS),
            (0x11, AC_CHROM_BITS, AC_CHROM_VALS),
        ]
    for tc_th, bits, vals in huff_specs:
        payload = bytes([tc_th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_lum = build_huffman(DC_LUM_BITS, DC_LUM_VALS)
    ac_lum = build_huffman(AC_LUM_BITS, AC_LUM_VALS)
    if channels == 3:
        dc_chrom = build_huffman(DC_CHROM_BITS, DC_CHROM_VALS)
        ac_chrom = build_huffman(AC_CHROM_BITS, AC_CHROM_VALS)
    planes = [_pad_to_blocks(img[..., c]) for c in range(ncomp)]
    writer = _BitWriter()
    preds = [0] * ncomp
    ph, pw = planes[0].shape
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for c in range(ncomp):
                dc_h = dc_lum if c == 0 else dc_chrom
                ac_h = ac_lum if c == 0 else ac_chrom
                qt = qtabs[0] if c == 0 else qtabs[1]
                preds[c] = _encode_block(
                    writer,
                    planes[c][by : by + 8, bx : bx + 8],
                    qt,
                    preds[c],
                    dc_h,
                    ac_h,
                )
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_jpeg(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """→ (width, height, channels, uint8 array of shape (h, w*channels))
    — the same return convention as :func:`codecs.decode_png`.

    Reads quantization and Huffman tables from the file's own DQT/DHT
    segments. Supports baseline sequential (SOF0), 8-bit, components
    with 1×1 sampling (grayscale / 4:4:4); rejects progressive scans,
    subsampling, and restart intervals loudly."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff_dec: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    scan_comps = None
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at offset {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte: 0xFF padding before the marker
            pos += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / RSTn are standalone markers with NO length field —
            # treating the following bytes as a length misparses the
            # rest of the stream (T.81 §B.1.1.3)
            pos += 2
            continue
        if pos + 4 > len(data):
            raise ValueError("truncated marker segment")
        (seg_len,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xDB:  # DQT (may hold several tables)
            b = body
            while b:
                pq, tq = b[0] >> 4, b[0] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = np.frombuffer(b[1:65], dtype=np.uint8)
                qtabs[tq] = tab.reshape(8, 8)
                b = b[65:]
        elif marker == 0xC4:  # DHT (may hold several tables)
            b = body
            while b:
                tc, th = b[0] >> 4, b[0] & 0x0F
                bits = list(b[1:17])
                n = sum(bits)
                vals = list(b[17 : 17 + n])
                enc = build_huffman(bits, vals)
                huff_dec[(tc, th)] = {
                    (length, code): sym for sym, (code, length) in enc.items()
                }
                b = b[17 + n :]
        elif marker == 0xC0:  # SOF0 baseline
            precision, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(ncomp):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise ValueError(
                        "chroma subsampling unsupported (this decoder "
                        "handles grayscale and 4:4:4)"
                    )
                comps.append((cid, tq))
            frame = (w, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:
            raise ValueError("restart intervals (DRI) unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan_comps = [(body[1 + 2 * i], body[2 + 2 * i]) for i in range(ns)]
            break
        # APPn/COM and other segments are skipped
    if frame is None or scan_comps is None:
        raise ValueError("JPEG missing SOF0/SOS")
    w, h, comps = frame
    ncomp = len(comps)
    if ncomp not in (1, 3) or len(scan_comps) != ncomp:
        raise ValueError("unsupported component layout")
    # validate table references up front: a scan naming an undeclared
    # table must fail with a clear error, not a KeyError mid-decode
    for ci, (_cid, td_ta) in enumerate(scan_comps):
        td, ta = td_ta >> 4, td_ta & 0x0F
        if (0, td) not in huff_dec or (1, ta) not in huff_dec:
            raise ValueError(f"missing DHT table referenced by scan (dc={td}, ac={ta})")
        if comps[ci][1] not in qtabs:
            raise ValueError(f"missing DQT table {comps[ci][1]} referenced by frame")

    reader = _BitReader(data, pos)
    bw, bh = -(-w // 8), -(-h // 8)
    planes = [np.zeros((bh * 8, bw * 8), dtype=np.float64) for _ in range(ncomp)]
    preds = [0] * ncomp
    for by in range(bh):
        for bx in range(bw):
            for ci, (cid, td_ta) in enumerate(scan_comps):
                td, ta = td_ta >> 4, td_ta & 0x0F
                dc_tab, ac_tab = huff_dec[(0, td)], huff_dec[(1, ta)]
                qt = qtabs[comps[ci][1]]
                zz = np.zeros(64, dtype=np.int64)
                size = reader.decode_symbol(dc_tab)
                diff = _extend(reader.read(size), size) if size else 0
                preds[ci] += diff
                zz[0] = preds[ci]
                k = 1
                while k < 64:
                    sym = reader.decode_symbol(ac_tab)
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += sym >> 4
                    if k > 63:
                        raise ValueError("AC run exceeds block")
                    zz[k] = _extend(reader.read(sym & 0x0F), sym & 0x0F)
                    k += 1
                quant = np.zeros(64, dtype=np.int64)
                quant[ZIGZAG] = zz
                block = _T.T @ (quant.reshape(8, 8) * qt).astype(np.float64) @ _T
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block + 128.0

    img = np.stack([p[:h, :w] for p in planes], axis=-1)
    if ncomp == 3:
        img = _ycbcr_to_rgb(img)
    out = np.clip(np.round(img), 0, 255).astype(np.uint8)
    return w, h, ncomp, out.reshape(h, w * ncomp)
