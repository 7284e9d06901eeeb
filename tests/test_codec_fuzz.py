"""Crawled-garbage safety: every media decoder, fed arbitrary bytes
behind a VALID magic, must raise only ValueError or
NotImplementedError — codec-internal exception types (zlib.error,
struct.error, KeyError, ...) escaping from a map_batches stage would
crash the whole actor-pool query on one bad payload.  Deterministic
seeded fuzz (no hypothesis dependency on timing) plus crafted
worst-case streams the random fuzz is unlikely to reach."""

import struct
import zlib

import numpy as np
import pytest

from crawler_tjce_ray.functions import avicodec, imagecodec, jpegcodec, wavcodec

DECODERS = {
    "png": (imagecodec.PNG_SIG, imagecodec.decode_png),
    "bmp": (b"BM", imagecodec.decode_bmp),
    "jpeg": (b"\xff\xd8", jpegcodec.decode_jpeg),
    "wav": (b"RIFF\x20\x00\x00\x00WAVE", wavcodec.decode_wav),
    "avi": (b"RIFF\x20\x00\x00\x00AVI ", avicodec.decode_avi),
}


@pytest.mark.parametrize("name", sorted(DECODERS))
def test_garbage_after_magic_raises_only_expected_types(name):
    magic, decode = DECODERS[name]
    rng = np.random.default_rng(hash(name) % 2**32)
    for _ in range(400):
        n = int(rng.integers(0, 300))
        blob = magic + rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        try:
            decode(bytes(blob))
        except (ValueError, NotImplementedError):
            pass  # the only allowed failure modes


def test_png_corrupt_idat_is_valueerror():
    # a structurally valid PNG whose IDAT is NOT a zlib stream — the
    # random fuzz rarely builds a correct chunk walk, so craft it
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    def chunk(ctype, payload):
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", crc))
    blob = (imagecodec.PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", b"not zlib data")
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        imagecodec.decode_png(blob)


def test_bmp_truncated_header_is_valueerror():
    with pytest.raises(ValueError):
        imagecodec.decode_bmp(b"BM\x10\x00")


def test_truncated_real_payloads_raise_cleanly():
    # cut every real container mid-stream at several offsets
    img = np.arange(192, dtype=np.uint8).reshape(8, 8, 3)
    samples = (np.arange(64) * 100).astype(np.int16)
    frames = np.arange(128, dtype=np.uint8).reshape(2, 8, 8)
    blobs = [
        (imagecodec.decode_png, imagecodec.encode_png(img)),
        (imagecodec.decode_bmp, imagecodec.encode_bmp(img)),
        (jpegcodec.decode_jpeg, jpegcodec.encode_jpeg(img)),
        (wavcodec.decode_wav, wavcodec.encode_wav(samples, 8000)),
        (avicodec.decode_avi, avicodec.encode_avi(frames)),
    ]
    for decode, blob in blobs:
        for cut in (3, len(blob) // 3, len(blob) - 5):
            try:
                decode(blob[:cut])
            except (ValueError, NotImplementedError):
                pass
