"""Pure-numpy baseline JPEG codec (ITU-T T.81 / JFIF).

Completes the real-codec set behind the multimodal stages
(PNG/BMP live in ``imagecodec.py``): no imaging library exists in
this container, so baseline sequential JPEG is implemented from the
public spec with numpy only.

Decoder: SOI/APP*/COM/DQT/DRI/SOF0/DHT/SOS parsing, canonical Huffman
decode over the byte-stuffed entropy stream (restart markers reset
the DC predictors at each DRI boundary), dequantize → inverse zigzag
→ IDCT (orthonormal DCT-III matrix) → level shift → chroma upsample →
YCbCr→RGB.  Supported: 8-bit baseline (SOF0), 1 or 3 components, any
integer-ratio sampling factors up to 4×4 (4:4:4, 4:2:2, 4:2:0, …).
Progressive (SOF2), non-interleaved multi-scan, CMYK, arithmetic
coding and 12-bit raise ``NotImplementedError`` — a full deployment
routes those to libjpeg through the same ``decode_image`` dispatch.

Encoder (fixture/corpus helper): 4:4:4 / 4:2:2 / 4:2:0,
quality-scaled Annex-K-style quantization tables, standard Huffman
tables, byte stuffing, optional restart intervals — the tables ride
in the stream (DQT/DHT), so any baseline decoder reads the output.

Reference parity: the reference repo never decodes media; this backs
the beyond-reference multimodal stages (stages/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants: zigzag, DCT matrix, quant + Huffman tables
# ---------------------------------------------------------------------------


def _zigzag() -> np.ndarray:
    """(64,) flat indices of the 8×8 block in JPEG zigzag order."""
    out = []
    for s in range(15):
        diag = [(i, s - i) for i in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2 == 0:
            diag = diag[::-1]
        out += diag
    return np.array([r * 8 + c for r, c in out], np.int64)


ZZ = _zigzag()
UNZZ = np.argsort(ZZ)


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    T = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    T[0] *= np.sqrt(0.5)
    return T * 0.5  # orthonormal: coeffs match JPEG quantizer scale


DCT_T = _dct_matrix()

# Annex K.1/K.2 base quantization tables (natural order)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], np.int64)

# standard Huffman tables (Annex K.3): (bits[1..16], values)
HUFF_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
HUFF_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def is_jpeg(data: bytes) -> bool:
    return data[:2] == b"\xff\xd8"


# ---------------------------------------------------------------------------
# Huffman code construction (canonical, ITU-T T.81 §C.2)
# ---------------------------------------------------------------------------


def _build_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decoder(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {(ln, code): sym for sym, (code, ln) in _build_codes(bits, values).items()}


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.buf)

    def marker(self, byte2: int) -> None:
        """Byte-align with 1-padding, then emit a raw (unstuffed)
        marker — used for RSTn inside the entropy stream."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.buf += bytes([0xFF, byte2])


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _value_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.stack([r, g, b], axis=-1)


def _blocks(chan: np.ndarray) -> np.ndarray:
    """(h, w) float → (n_blocks, 8, 8), edge-padded to multiples of 8,
    blocks in raster order."""
    h, w = chan.shape
    ph, pw = -h % 8, -w % 8
    c = np.pad(chan, ((0, ph), (0, pw)), mode="edge")
    H, W = c.shape
    return (c.reshape(H // 8, 8, W // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


_SUBSAMPLING = {
    "444": [(1, 1), (1, 1), (1, 1)],
    "422": [(2, 1), (1, 1), (1, 1)],
    "420": [(2, 2), (1, 1), (1, 1)],
}


def _box_downsample(chan: np.ndarray, fx: int, fy: int) -> np.ndarray:
    """(h, w) → (ceil(h/fy), ceil(w/fx)) box-mean (edge-padded)."""
    if fx == 1 and fy == 1:
        return chan
    h, w = chan.shape
    c = np.pad(chan, ((0, -h % fy), (0, -w % fx)), mode="edge")
    return c.reshape(c.shape[0] // fy, fy, c.shape[1] // fx, fx).mean((1, 3))


def _emit_block(bw: _BitWriter, zz: np.ndarray, prev_dc: int,
                dc_codes: dict, ac_codes: dict) -> int:
    """Entropy-code one zigzagged quantized block; returns its DC."""
    diff = int(zz[0]) - prev_dc
    size = _category(diff)
    code, ln = dc_codes[size]
    bw.write(code, ln)
    if size:
        bw.write(_value_bits(diff, size), size)
    run = 0
    last_nz = np.flatnonzero(zz[1:])
    end = (int(last_nz[-1]) + 2) if len(last_nz) else 1
    for i in range(1, end):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        size = _category(v)
        code, ln = ac_codes[(run << 4) | size]
        bw.write(code, ln)
        bw.write(_value_bits(v, size), size)
        run = 0
    if end < 64:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def encode_jpeg(arr: np.ndarray, quality: int = 75,
                restart_interval: int = 0,
                subsampling: str = "444") -> bytes:
    """(h, w), (h, w, 1) or (h, w, 3) uint8 → baseline JFIF bytes
    (quality-scaled tables riding in DQT/DHT).  ``subsampling`` picks
    the chroma layout: "444" (no subsampling), "422" or "420" (the
    common camera/web shape — box-mean downsampled chroma).
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers
    every that many MCUs (predictors reset, stream byte-aligned) —
    the resilience feature real camera encoders use."""
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    qt = [_scaled_quant(QUANT_LUMA, quality)]
    planes: list[tuple] = []  # (chan, qid, (hi, vi), huff_dc, huff_ac)
    if gray:
        factors = [(1, 1)]
        planes.append((arr.astype(np.float64), 0, (1, 1),
                       HUFF_DC_LUMA, HUFF_AC_LUMA))
    else:
        factors = _SUBSAMPLING[subsampling]
        qt.append(_scaled_quant(QUANT_CHROMA, quality))
        ycc = _rgb_to_ycbcr(arr)
        hmax = max(f[0] for f in factors)
        vmax = max(f[1] for f in factors)
        for ci in range(3):
            hi, vi = factors[ci]
            chan = _box_downsample(ycc[..., ci], hmax // hi, vmax // vi)
            planes.append((chan, 0 if ci == 0 else 1, (hi, vi),
                           HUFF_DC_LUMA if ci == 0 else HUFF_DC_CHROMA,
                           HUFF_AC_LUMA if ci == 0 else HUFF_AC_CHROMA))
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)  # APP0, 1:1 aspect (len 16)
    for tid, q in enumerate(qt):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) \
            + bytes(int(x) for x in q[ZZ])
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = planes[ci][2]
        sof += struct.pack(">BBB", ci + 1, (hi << 4) | vi,
                           0 if ci == 0 else 1)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    tables = [(0x00, HUFF_DC_LUMA), (0x10, HUFF_AC_LUMA)]
    if not gray:
        tables += [(0x01, HUFF_DC_CHROMA), (0x11, HUFF_AC_CHROMA)]
    for tc, (bits, vals) in tables:
        payload = bytes([tc]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # quantized block grid per component, padded to the MCU lattice
    comp_blocks = []
    for chan, qid, (hi, vi), _dc, _ac in planes:
        ph, pw = mcuy * vi * 8, mcux * hi * 8
        c = np.pad(chan, ((0, ph - chan.shape[0]), (0, pw - chan.shape[1])),
                   mode="edge")
        blks = _blocks(c - 128.0)
        coef = np.einsum("ux,nxy,vy->nuv", DCT_T, blks, DCT_T)
        qm = qt[qid].reshape(8, 8).astype(np.float64)
        q = np.round(coef / qm).astype(np.int64)
        comp_blocks.append(q.reshape(mcuy * vi, mcux * hi, 8, 8))
    dc_codes = [_build_codes(*p[3]) for p in planes]
    ac_codes = [_build_codes(*p[4]) for p in planes]
    bw = _BitWriter()
    prev = [0] * len(planes)
    for m in range(mcuy * mcux):
        if restart_interval and m and m % restart_interval == 0:
            bw.marker(0xD0 + ((m // restart_interval - 1) & 7))
            prev = [0] * len(planes)
        my, mx = divmod(m, mcux)
        for ci, (_chan, _qid, (hi, vi), _dc, _ac) in enumerate(planes):
            for v in range(vi):
                for hb in range(hi):
                    blk = comp_blocks[ci][my * vi + v, mx * hi + hb]
                    prev[ci] = _emit_block(
                        bw, blk.reshape(64)[ZZ], prev[ci],
                        dc_codes[ci], ac_codes[ci],
                    )
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """Reads the entropy-coded segment: un-stuffs 0xFF00 and stops at
    markers.  Restart markers are consumed EAGERLY via ``restart()``
    at the DRI boundary (the caller knows the MCU count), discarding
    the pre-marker padding bits — a lazy in-``_fill`` reset would let
    those pad bits leak into the next MCU and reset predictors one
    MCU late."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("JPEG entropy stream truncated")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                raise ValueError("hit marker inside entropy stream")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        out = (self.acc >> self.nbits) & 1
        # drop consumed bits — an unmasked accumulator grows with the
        # stream and turns every shift into a bigint copy (quadratic
        # decode; a megapixel JPEG would take minutes)
        self.acc &= (1 << self.nbits) - 1
        return out

    def restart(self) -> None:
        """Discard padding bits and consume the expected RSTn."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while (self.pos + 1 < len(d) and d[self.pos] == 0xFF
               and d[self.pos + 1] == 0xFF):  # legal fill bytes
            self.pos += 1
        if not (self.pos + 1 < len(d) and d[self.pos] == 0xFF
                and 0xD0 <= d[self.pos + 1] <= 0xD7):
            raise ValueError("expected restart marker")
        self.pos += 2

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def decode(self, table: dict[tuple[int, int], int]) -> int:
        code, ln = 0, 0
        while ln <= 16:
            code = (code << 1) | self.bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    return v - (1 << size) + 1 if size and v < (1 << (size - 1)) else v


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (h, w, 1|3) uint8."""
    try:
        return _decode_jpeg(data)
    except (struct.error, IndexError, KeyError) as e:
        # truncated mid-header / undefined table ids
        raise ValueError(f"malformed/truncated JPEG: {e}") from e


def _decode_jpeg(data: bytes) -> np.ndarray:
    if not is_jpeg(data):
        raise ValueError("not a JPEG stream")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decoder
    comps: list[dict] = []
    h = w = None
    scan: list[dict] = []
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2: pos + seglen]
        body_start = pos + seglen
        pos = body_start
        if marker == 0xDB:  # DQT (possibly several tables)
            o = 0
            while o < len(seg):
                prec, tid = seg[o] >> 4, seg[o] & 15
                if prec != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.frombuffer(seg, np.uint8, 64, o + 1).astype(np.int64)
                quant[tid] = tbl[UNZZ]  # store natural order
                o += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xC0:  # SOF0
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("12-bit JPEG")
            if nc not in (1, 3):
                raise NotImplementedError(
                    f"{nc}-component JPEG (CMYK/YCCK) unsupported"
                )
            for i in range(nc):
                cid, hv, qid = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                hi, vi = hv >> 4, hv & 15
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(f"bad sampling factors {hi}x{vi}")
                comps.append({"id": cid, "qid": qid, "h": hi, "v": vi})
        elif marker == 0xC4:  # DHT (possibly several tables)
            o = 0
            while o < len(seg):
                tc, tid = seg[o] >> 4, seg[o] & 15
                bits = list(seg[o + 1: o + 17])
                n = sum(bits)
                vals = list(seg[o + 17: o + 17 + n])
                huff[(tc, tid)] = _build_decoder(bits, vals)
                o += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            if ns != len(comps):
                raise NotImplementedError(
                    "non-interleaved multi-scan baseline JPEG"
                )
            for i in range(ns):
                cid, t = seg[1 + 2 * i], seg[2 + 2 * i]
                matches = [c for c in comps if c["id"] == cid]
                if not matches:
                    raise ValueError(f"SOS references unknown component {cid}")
                scan.append({**matches[0], "dc": t >> 4, "ac": t & 15})
            pos = body_start
            break
        # other markers (APPn, COM) skipped via seglen
    if h is None or not scan:
        raise ValueError("JPEG missing SOF0/SOS")

    if len(scan) == 1:
        # T.81 A.2: a single-component scan is NON-interleaved — one
        # data unit per MCU in raster order over the component's own
        # full-resolution grid, regardless of declared SOF factors
        # (e.g. grayscale files written with 2x2 sampling factors)
        scan[0] = {**scan[0], "h": 1, "v": 1}
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    for c in scan:
        if hmax % c["h"] or vmax % c["v"]:
            raise NotImplementedError(
                f"non-integer sampling ratio {c['h']}x{c['v']} vs "
                f"{hmax}x{vmax}"
            )
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64)
        for c in scan
    ]
    reader = _BitReader(data, pos)
    prev = [0] * len(scan)
    for m in range(mcuy * mcux):
        if restart_interval and m and m % restart_interval == 0:
            reader.restart()
            prev = [0] * len(scan)
        my, mx = divmod(m, mcux)
        for ci, comp in enumerate(scan):
            dc_tbl = huff[(0, comp["dc"])]
            ac_tbl = huff[(1, comp["ac"])]
            for v in range(comp["v"]):
                for hb in range(comp["h"]):
                    zz = np.zeros(64, np.int64)
                    size = reader.decode(dc_tbl)
                    diff = _extend(reader.bits(size), size) if size else 0
                    prev[ci] += diff
                    zz[0] = prev[ci]
                    k = 1
                    while k < 64:
                        sym = reader.decode(ac_tbl)
                        if sym == 0x00:  # EOB
                            break
                        run, size = sym >> 4, sym & 15
                        if size == 0:
                            if run != 15:
                                raise ValueError("bad AC symbol")
                            k += 16  # ZRL
                            continue
                        k += run
                        if k > 63:
                            raise ValueError("AC index overflow")
                        zz[k] = _extend(reader.bits(size), size)
                        k += 1
                    blk = np.zeros(64, np.int64)
                    blk[ZZ] = zz
                    coef = blk.reshape(8, 8) * quant[comp["qid"]].reshape(8, 8)
                    pix = DCT_T.T @ coef.astype(np.float64) @ DCT_T + 128.0
                    py = (my * comp["v"] + v) * 8
                    px = (mx * comp["h"] + hb) * 8
                    planes[ci][py:py + 8, px:px + 8] = pix
    # upsample subsampled components back to full resolution
    full = []
    for ci, comp in enumerate(scan):
        p = planes[ci]
        fy, fx = vmax // comp["v"], hmax // comp["h"]
        if fy > 1 or fx > 1:
            p = np.repeat(np.repeat(p, fy, axis=0), fx, axis=1)
        full.append(p[:h, :w])
    if len(scan) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return out[:, :, None]
    rgb = _ycbcr_to_rgb(np.stack(full, axis=-1))
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
