"""Pure-stdlib WAV (RIFF/WAVE PCM) codec — the real audio container
behind the multimodal stages, completing the codec set (PNG/BMP/JPEG
for images live in ``imagecodec.py``/``jpegcodec.py``).

Decoder: RIFF chunk walk (tolerates extra chunks like LIST/fact),
PCM 16-bit mono/stereo; stereo downmixes to mono by sample mean —
the analysis stages operate on one channel.  Compressed formats
(format tags other than 1/PCM) raise ``NotImplementedError`` — a full
deployment routes them to ffmpeg at the same dispatch point.

Encoder (fixture/corpus helper): 16-bit PCM mono.

Reference parity: the reference never decodes media; this backs the
beyond-reference multimodal stages (stages/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np


def is_wav(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM bytes."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE bytes → (sample_rate, int16 mono samples).  Stereo
    downmixes by mean; non-PCM raises NotImplementedError."""
    if not is_wav(data):
        raise ValueError("not a WAV stream")
    pos = 12
    sr = nch = bits = None
    pcm = None
    try:
        while pos + 8 <= len(data):
            cid = data[pos:pos + 4]
            (clen,) = struct.unpack_from("<I", data, pos + 4)
            body = data[pos + 8: pos + 8 + clen]
            if len(body) < clen:
                raise ValueError("WAV chunk body shorter than declared")
            if cid == b"fmt ":
                tag, nch, sr, _br, _ba, bits = struct.unpack_from(
                    "<HHIIHH", body, 0
                )
                if tag != 1:
                    raise NotImplementedError(
                        f"non-PCM WAV (format tag {tag}); route to ffmpeg"
                    )
            elif cid == b"data":
                pcm = body
            pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    except struct.error as e:
        raise ValueError(f"malformed/truncated WAV: {e}") from e
    if sr is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    if bits != 16:
        raise NotImplementedError(f"{bits}-bit WAV unsupported (PCM16 only)")
    samples = np.frombuffer(pcm, "<i2", count=len(pcm) // 2)
    if nch == 2:
        samples = (samples.reshape(-1, 2).astype(np.int32)
                   .mean(axis=1)).astype(np.int16)
    elif nch != 1:
        raise NotImplementedError(f"{nch}-channel WAV unsupported")
    return int(sr), samples
