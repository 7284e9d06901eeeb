"""Pure-numpy image codecs: PNG (decode + encode) and BMP (decode).

No third-party imaging library exists in this container, so the real
codec path is implemented from the public format specs with stdlib
``zlib``/``struct`` + numpy only:

* PNG (RFC 2083 / W3C spec): 8-bit depth, color types 0 (gray),
  2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), no interlace.
  All five scanline filters are supported on decode; the encoder
  emits filter 0 (None) rows.
* BMP (BITMAPINFOHEADER): uncompressed 8-bit palette, 24- and 32-bit,
  bottom-up or top-down.

Baseline JPEG lives in the sibling ``jpegcodec`` module and is
dispatched from ``decode_image``; remaining formats (WebP, AVIF,
progressive JPEG) stay behind ``NotImplementedError`` — a real
deployment routes them to PIL/libjpeg via the same dispatch.

Reference parity: the reference repo treats media as opaque bytes and
never decodes; these codecs back the beyond-reference multimodal
stages (stages/multimodal.py).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return data[:8] == PNG_SIG


def is_bmp(data: bytes) -> bool:
    return data[:2] == b"BM"


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, channels) uint8 array.

    Palette images resolve through PLTE to RGB.  Raises ValueError on
    malformed streams and NotImplementedError on unsupported variants
    (16-bit depth, interlaced) — never codec-internal exception types
    (a crawled garbage payload must not crash an actor pool with
    zlib.error)."""
    try:
        return _decode_png(data)
    except (struct.error, IndexError, zlib.error) as e:
        raise ValueError(f"malformed/truncated PNG: {e}") from e


def _decode_png(data: bytes) -> np.ndarray:
    if not is_png(data):
        raise ValueError("not a PNG stream")
    pos = 8
    idat: list[bytes] = []
    plte: np.ndarray | None = None
    w = h = depth = color = interlace = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
        elif ctype == b"PLTE":
            plte = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} unsupported")
    if interlace != 0:
        raise NotImplementedError("interlaced PNG unsupported")
    if color not in _PNG_CHANNELS:
        raise NotImplementedError(f"PNG color type {color} unsupported")
    nch = _PNG_CHANNELS[color]
    stride = w * nch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    ftypes = rows[:, 0]
    recon = np.zeros((h, stride), np.int32)
    bpp = nch  # bytes per pixel at depth 8
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f = int(ftypes[y])
        line = rows[y, 1:].astype(np.int32)
        if f == 0:
            cur = line
        elif f == 1:  # Sub — per-lane cumulative sum (mod-256 safe)
            cur = line
            for off in range(bpp):
                cur[off::bpp] = np.cumsum(cur[off::bpp]) & 255
        elif f == 2:  # Up — fully vectorized
            cur = (line + prev) & 255
        elif f == 3:  # Average — sequential in x (left dependency)
            cur = line
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((a + prev[x]) >> 1)) & 255
        elif f == 4:  # Paeth — sequential in x
            cur = line
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa_ <= pb and pa_ <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                cur[x] = (cur[x] + pred) & 255
        else:
            raise ValueError(f"PNG filter type {f} invalid")
        recon[y] = cur
        prev = cur
    out = recon.astype(np.uint8).reshape(h, w, nch)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        out = plte[out[:, :, 0]]
    return out


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w) or (h, w, c) uint8 → PNG bytes (filter 0 scanlines)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    flat = np.ascontiguousarray(arr, dtype=np.uint8).reshape(h, w * c)
    raw = np.zeros((h, w * c + 1), np.uint8)
    raw[:, 1:] = flat
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → (h, w, channels) uint8.  BGR(A) reorders to RGB(A);
    8-bit palette resolves to RGB; bottom-up rows flip to top-down.
    Malformed streams raise ValueError only (see decode_png)."""
    try:
        return _decode_bmp(data)
    except (struct.error, IndexError) as e:
        raise ValueError(f"malformed/truncated BMP: {e}") from e


def _decode_bmp(data: bytes) -> np.ndarray:
    if not is_bmp(data):
        raise ValueError("not a BMP stream")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    w, h = struct.unpack_from("<ii", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (comp,) = struct.unpack_from("<I", data, 30)
    if comp != 0:
        raise NotImplementedError(f"BMP compression {comp} unsupported")
    top_down = h < 0
    h = abs(h)
    if bpp in (24, 32):
        nch = bpp // 8
        stride = ((w * nch + 3) // 4) * 4
        pix = np.frombuffer(data, np.uint8, count=stride * h, offset=pix_off)
        pix = pix.reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
        order = [2, 1, 0] if nch == 3 else [2, 1, 0, 3]
        out = pix[:, :, order]
    elif bpp == 8:
        (n_colors,) = struct.unpack_from("<I", data, 46)
        n_colors = n_colors or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            data, np.uint8, count=4 * n_colors, offset=pal_off
        ).reshape(-1, 4)[:, [2, 1, 0]]  # BGRA table → RGB
        stride = ((w + 3) // 4) * 4
        idx = np.frombuffer(data, np.uint8, count=stride * h, offset=pix_off)
        out = pal[idx.reshape(h, stride)[:, :w]]
    else:
        raise NotImplementedError(f"BMP {bpp}bpp unsupported")
    if not top_down:
        out = out[::-1]
    return np.ascontiguousarray(out)


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → 24-bit bottom-up BMP bytes (fixture helper)."""
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("encode_bmp expects 3 channels")
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = arr[::-1, :, [2, 1, 0]].reshape(h, w * 3)
    pix = rows.tobytes()
    header = (
        b"BM"
        + struct.pack("<IHHI", 14 + 40 + len(pix), 0, 0, 14 + 40)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    )
    return header + pix


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatch a real-format image payload to its codec → (h, w, c)
    uint8.  PNG/BMP decode here; baseline JPEG dispatches to
    ``jpegcodec``.  Unknown magics (WebP, progressive JPEG, …) raise
    NotImplementedError — route them to PIL in a full deployment."""
    from crawler_tjce_ray.functions import jpegcodec

    if is_png(payload):
        return decode_png(payload)
    if is_bmp(payload):
        return decode_bmp(payload)
    if jpegcodec.is_jpeg(payload):
        return jpegcodec.decode_jpeg(payload)
    raise NotImplementedError(
        f"no pure-numpy codec for magic {payload[:4]!r}; "
        "install PIL and route through it for WebP/AVIF"
    )
