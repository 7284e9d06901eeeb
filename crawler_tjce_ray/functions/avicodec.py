"""Pure-numpy uncompressed AVI (RIFF 'AVI ') codec — the real video
container behind the multimodal stages, completing the per-modality
codec set (PNG/BMP/JPEG images, WAV audio).

Decoder: RIFF/LIST chunk walk (word-aligned, tolerant of extra
chunks and an ``idx1`` index), ``avih`` for dimensions, ``strf``
(BITMAPINFOHEADER) for the pixel format, ``00db``/``00dc`` movi
chunks as frames.  Supported: 24-bit uncompressed DIB frames
(bottom-up BGR, 4-byte row stride) — the classic raw-AVI shape.
Frames return as GRAYSCALE (BT.601 luma), which is what the analysis
stages consume; compressed fourccs raise ``NotImplementedError`` —
a full deployment routes them to ffmpeg at the same dispatch point.

Encoder (fixture/corpus helper): grayscale frames replicate to BGR,
so decode(encode(frames)) is bit-exact.

Reference parity: the reference never decodes media; this backs the
beyond-reference multimodal stages (stages/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np


def is_avi(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"AVI "


def _chunk(cid: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return cid + struct.pack("<I", len(payload)) + payload + pad


def _list(ltype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", ltype + payload)


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """(nf, h, w) grayscale uint8 → uncompressed 24-bit AVI bytes."""
    frames = np.asarray(frames, np.uint8)
    nf, h, w = frames.shape
    stride = ((w * 3 + 3) // 4) * 4
    frame_bytes = stride * h
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, frame_bytes * fps, 0, 0x10, nf, 0, 1,
        frame_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (b"vids" + b"DIB " + struct.pack(
        "<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, nf, frame_bytes,
        0xFFFFFFFF, 0, 0,
    ))[:56].ljust(56, b"\x00")
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes,
                       2835, 2835, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    chunks = []
    for f in frames:
        rows = np.zeros((h, stride), np.uint8)
        rows[:, : w * 3] = np.repeat(f[::-1, :, None], 3, axis=2).reshape(
            h, w * 3
        )
        chunks.append(_chunk(b"00db", rows.tobytes()))
    movi = _list(b"movi", b"".join(chunks))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(data: bytes, pos: int, end: int, found: dict) -> None:
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body_start = pos + 8
        if cid == b"LIST":
            _walk(data, body_start + 4, body_start + clen, found)
        elif cid == b"avih":
            vals = struct.unpack_from("<14I", data, body_start)
            found["w"], found["h"] = int(vals[8]), int(vals[9])
        elif cid == b"strh":
            # remember which stream the next strf describes: an AVI
            # with an audio track carries a WAVEFORMATEX strf that
            # must NOT clobber the video format fields
            found["_stream"] = data[body_start:body_start + 4]
        elif cid == b"strf" and found.get("_stream") == b"vids":
            if clen < 20:
                raise ValueError("video strf chunk too short")
            (_sz, _w, bih, _planes, bits, comp) = struct.unpack_from(
                "<IiiHHI", data, body_start
            )
            found["bits"], found["comp"] = int(bits), int(comp)
            found["top_down"] = bih < 0
        elif cid in (b"00db", b"00dc"):
            found.setdefault("frames", []).append(
                (body_start, clen)
            )
        pos = body_start + clen + (clen & 1)


def decode_avi(data: bytes,
               frame_indices: list[int] | None = None,
               frame_stride: int | None = None) -> tuple[np.ndarray, int]:
    """AVI bytes → ``(frames, total_frame_count)`` with frames as
    (nf, h, w) grayscale uint8 (BT.601 luma).  ``frame_indices``
    decodes only the named frames; ``frame_stride`` decodes every
    n-th frame — both in ONE container walk (the frame-sampling
    stages skip most frames; the chunk index makes that skip free
    instead of paying a full luma conversion per discarded frame)."""
    if not is_avi(data):
        raise ValueError("not an AVI stream")
    found: dict = {}
    try:
        _walk(data, 12, 8 + struct.unpack_from("<I", data, 4)[0], found)
    except struct.error as e:
        raise ValueError(f"malformed/truncated AVI: {e}") from e
    if "w" not in found or "frames" not in found:
        raise ValueError("AVI missing avih/movi chunks")
    if found.get("comp", 0) != 0:
        raise NotImplementedError(
            f"compressed AVI (fourcc {found['comp']:#x}); route to ffmpeg"
        )
    if found.get("bits") != 24:
        raise NotImplementedError(f"{found.get('bits')}-bit AVI unsupported")
    w, h = found["w"], found["h"]
    stride = ((w * 3 + 3) // 4) * 4
    total = len(found["frames"])
    if frame_indices is not None:
        wanted = list(frame_indices)
    elif frame_stride is not None:
        wanted = list(range(0, total, frame_stride))
    else:
        wanted = list(range(total))
    out = np.empty((len(wanted), h, w), np.uint8)
    for i, fi in enumerate(wanted):
        off, clen = found["frames"][fi]
        if clen < stride * h or off + stride * h > len(data):
            raise ValueError("AVI frame chunk shorter than frame size")
        rows = np.frombuffer(data, np.uint8, count=stride * h, offset=off)
        bgr = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        if not found.get("top_down", False):
            bgr = bgr[::-1]  # bottom-up DIB (positive biHeight)
        luma = (0.114 * bgr[:, :, 0].astype(np.float64)
                + 0.587 * bgr[:, :, 1]
                + 0.299 * bgr[:, :, 2])
        out[i] = np.clip(np.round(luma), 0, 255).astype(np.uint8)
    return out, total
