"""Synthetic multimodal media source: opaque ``binary`` payloads with
typed metadata, in a deterministic fake container format.

The real decode libraries (PIL / libav / soundfile) are not in this
container, so the *formats* are fakes — but the Ray-side plumbing
(schema, binary columns, batch sizing, partitioned write) is real and
is what the engine ships.  Container layouts (little-endian):

* image: ``FIMG`` | u16 width | u16 height | u8 channels | payload
  (width·height·channels bytes, seeded)
* audio: ``FAUD`` | u32 sample_rate | u32 n_samples | int16 samples
* video: ``FVID`` | u16 width | u16 height | u16 n_frames | frames
  (n_frames · width · height grayscale bytes)
"""

from __future__ import annotations

import hashlib
import os
import time

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),
        ("payload", pa.binary()),
        ("n_bytes", pa.int64()),
    ]
)

MAGIC_IMG = b"FIMG"
MAGIC_AUD = b"FAUD"
MAGIC_VID = b"FVID"


def _rng_for(media_id: int, seed: int) -> np.random.RandomState:
    h = hashlib.md5(f"{seed}:{media_id}".encode()).digest()
    return np.random.RandomState(int.from_bytes(h[:4], "little"))


def make_image(media_id: int, seed: int) -> bytes:
    """Images round-robin over four containers by image ordinal: the
    FIMG fake, a real PNG, a real BMP and a real baseline JPEG (the
    pure-numpy codecs in functions/imagecodec.py + jpegcodec.py), so
    the decode stages exercise genuine bytes end-to-end while staying
    deterministic.  JPEG is lossy, but its decode is deterministic, so
    downstream stats stay reproducible."""
    r = _rng_for(media_id, seed)
    w, h, c = int(r.randint(8, 33)), int(r.randint(8, 33)), int(r.choice([1, 3]))
    container = (media_id // 3) % 4
    if container == 1:  # real PNG (lossless: stats match the pixels)
        from crawler_tjce_ray.functions.imagecodec import encode_png

        return encode_png(r.randint(0, 256, size=(h, w, c), dtype=np.uint8))
    if container == 2:  # real 24-bit BMP
        from crawler_tjce_ray.functions.imagecodec import encode_bmp

        return encode_bmp(r.randint(0, 256, size=(h, w, 3), dtype=np.uint8))
    if container == 3:  # real baseline JPEG (alternating 4:4:4 / 4:2:0)
        from crawler_tjce_ray.functions.jpegcodec import encode_jpeg

        sub = "420" if (media_id // 12) % 2 else "444"
        # encode_jpeg ignores subsampling for 1-channel (gray) input
        return encode_jpeg(r.randint(0, 256, size=(h, w, c), dtype=np.uint8),
                           quality=85, subsampling=sub)
    head = MAGIC_IMG + np.array([w, h], "<u2").tobytes() + bytes([c])
    return head + r.randint(0, 256, size=w * h * c, dtype=np.uint8).tobytes()


def make_audio(media_id: int, seed: int) -> bytes:
    """Audio alternates two containers by ordinal: the FAUD fake and
    a real RIFF/WAVE PCM16 file (functions/wavcodec.py) — both carry
    identically-distributed samples so the feature stage exercises the
    real parser end-to-end."""
    r = _rng_for(media_id, seed)
    sr, n = 8000, int(r.randint(100, 2001))
    samples = (r.randn(n) * 3000).astype("<i2")
    if (media_id // 3) % 2:  # real WAV
        from crawler_tjce_ray.functions.wavcodec import encode_wav

        return encode_wav(samples, sr)
    head = MAGIC_AUD + np.array([sr, n], "<u4").tobytes()
    return head + samples.tobytes()


def make_video(media_id: int, seed: int) -> bytes:
    """Video alternates two containers by ordinal: the FVID fake and a
    real uncompressed 24-bit AVI (functions/avicodec.py) carrying the
    same grayscale frame distribution."""
    r = _rng_for(media_id, seed)
    w, h, nf = int(r.randint(8, 17)), int(r.randint(8, 17)), int(r.randint(4, 17))
    pix = r.randint(0, 256, size=nf * w * h, dtype=np.uint8)
    if (media_id // 3) % 2:  # real AVI
        from crawler_tjce_ray.functions.avicodec import encode_avi

        return encode_avi(pix.reshape(nf, h, w))
    head = MAGIC_VID + np.array([w, h, nf], "<u2").tobytes()
    return head + pix.tobytes()


_MAKERS = {"image": make_image, "audio": make_audio, "video": make_video}


def write_media_corpus(out_dir: str, n_media: int = 300, seed: int = 7) -> str:
    """Distributed synthesis: a ``range`` dataset → stateless
    ``map_batches`` generating each blob from (seed, media_id) — the
    same pattern as the pages corpus; partitioned Parquet out."""
    import ray.data as rd

    kinds = ["image", "audio", "video"]

    def gen(batch: dict) -> pa.Table:
        rows = []
        for i in batch["id"].to_pylist():
            kind = kinds[i % 3]
            payload = _MAKERS[kind](i, seed)
            rows.append(
                {"media_id": i, "kind": kind, "payload": payload,
                 "n_bytes": len(payload)}
            )
        return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)

    (
        rd.range(n_media)
        .map_batches(gen, batch_format="pyarrow", batch_size=64)
        .write_parquet(out_dir)
    )
    return out_dir


def media_cache_dir(n_media: int = 300, seed: int = 7) -> str:
    """Synthesize-once cache under /tmp keyed by params."""
    import shutil

    # v6: images round-robin FIMG/PNG/BMP/JPEG (444 + 420); audio
    # alternates FAUD / real WAV; video alternates FVID / real AVI
    root = "/tmp/crawler_tjce_ray_media"
    version = "v6"
    out = f"{root}/{version}_n{n_media}_s{seed}"
    marker = os.path.join(out, "_SUCCESS")
    # evict STALE leftovers (older-version corpora and .tmp dirs from
    # crashed builders) — each key bump would otherwise strand the
    # previous full corpus under /tmp forever.  Age-gated: a freshly
    # touched dir may belong to a concurrently running process from
    # an older checkout, and deleting it mid-read would break them.
    evict_after_s = 3600.0
    if os.path.isdir(root):
        now = time.time()
        for d in os.listdir(root):
            if d.startswith(f"{version}_") and ".tmp." not in d:
                continue
            p = os.path.join(root, d)
            try:
                age = now - os.path.getmtime(p)
            except OSError:
                continue
            if age > evict_after_s:
                shutil.rmtree(p, ignore_errors=True)
    if not os.path.exists(marker):
        # build in a process-private tmp dir, then atomically rename:
        # two concurrent builders can't interleave writes into the
        # final path (check-then-act on a shared dir raced)
        tmp = f"{out}.tmp.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        write_media_corpus(tmp, n_media=n_media, seed=seed)
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("ok")
        try:
            shutil.rmtree(out, ignore_errors=True)
            os.rename(tmp, out)
        except OSError:
            # another process won the rename; its corpus is identical
            shutil.rmtree(tmp, ignore_errors=True)
    return out
