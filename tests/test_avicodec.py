"""Uncompressed-AVI codec pins (functions/avicodec.py) and the video
stages over the v6 corpus (FVID + real AVI containers)."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from crawler_tjce_ray.functions import avicodec


def _frames(nf=6, h=12, w=16, seed=3):
    return np.random.default_rng(seed).integers(
        0, 256, (nf, h, w), dtype=np.uint8
    )


class TestRoundtrip:
    def test_gray_roundtrip_bit_exact(self):
        f = _frames()
        out = avicodec.decode_avi(avicodec.encode_avi(f))
        np.testing.assert_array_equal(out, f)

    def test_is_avi(self):
        assert avicodec.is_avi(avicodec.encode_avi(_frames(2, 8, 8)))
        assert not avicodec.is_avi(b"RIFF\x00\x00\x00\x00WAVE")

    def test_odd_width_stride_padding(self):
        f = _frames(3, 9, 11)  # stride 33 -> padded to 36
        np.testing.assert_array_equal(
            avicodec.decode_avi(avicodec.encode_avi(f)), f
        )

    def test_idx1_and_extra_chunks_tolerated(self):
        f = _frames(2, 8, 8)
        blob = avicodec.encode_avi(f)
        extra = b"idx1" + struct.pack("<I", 4) + b"\x00" * 4
        spliced = blob + extra
        spliced = (spliced[:4]
                   + struct.pack("<I", len(spliced) - 8) + spliced[8:])
        np.testing.assert_array_equal(avicodec.decode_avi(spliced), f)

    def test_compressed_fourcc_rejected(self):
        blob = bytearray(avicodec.encode_avi(_frames(2, 8, 8)))
        i = bytes(blob).index(b"strf") + 8
        # BITMAPINFOHEADER biCompression at offset 16 of the struct
        blob[i + 16:i + 20] = b"MJPG"
        with pytest.raises(NotImplementedError):
            avicodec.decode_avi(bytes(blob))

    def test_not_avi(self):
        with pytest.raises(ValueError):
            avicodec.decode_avi(b"nope")

    def test_truncated_frame_chunk(self):
        blob = avicodec.encode_avi(_frames(2, 8, 8))
        with pytest.raises(ValueError):
            avicodec.decode_avi(blob[: len(blob) - 40])


class TestCorpusAndStages:
    def test_corpus_alternates_fvid_and_avi(self):
        from crawler_tjce_ray.sources.media import MAGIC_VID, make_video

        kinds = set()
        for media_id in range(2, 50, 3):  # video ordinals
            blob = make_video(media_id, seed=7)
            kinds.add("avi" if avicodec.is_avi(blob)
                      else ("fvid" if blob.startswith(MAGIC_VID) else "?"))
        assert kinds == {"fvid", "avi"}

    def test_stage_identical_stats_across_containers(self):
        from crawler_tjce_ray.sources.media import MAGIC_VID
        from crawler_tjce_ray.stages.multimodal import FrameSampleStage

        f = _frames(5, 10, 10)
        fvid = (MAGIC_VID
                + np.array([10, 10, 5], "<u2").tobytes()
                + f.reshape(5, -1).tobytes())
        avi = avicodec.encode_avi(f)
        t = pa.table({
            "media_id": pa.array([1, 2], pa.int64()),
            "kind": pa.array(["video", "video"]),
            "payload": pa.array([fvid, avi], pa.binary()),
        })
        out = FrameSampleStage(stride=2)(t).to_pandas()
        a = out[out["media_id"] == 1].reset_index(drop=True)
        b = out[out["media_id"] == 2].reset_index(drop=True)
        assert a["mean_intensity"].tolist() == b["mean_intensity"].tolist()
        assert a["frame"].tolist() == b["frame"].tolist()

    def test_unknown_video_magic_raises(self):
        from crawler_tjce_ray.stages.multimodal import decode_any_video

        with pytest.raises(NotImplementedError):
            decode_any_video(b"\x00\x00\x00\x20ftypmp42")
