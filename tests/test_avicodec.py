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
        out, total = avicodec.decode_avi(avicodec.encode_avi(f))
        assert total == len(f)
        np.testing.assert_array_equal(out, f)

    def test_is_avi(self):
        assert avicodec.is_avi(avicodec.encode_avi(_frames(2, 8, 8)))
        assert not avicodec.is_avi(b"RIFF\x00\x00\x00\x00WAVE")

    def test_odd_width_stride_padding(self):
        f = _frames(3, 9, 11)  # stride 33 -> padded to 36
        np.testing.assert_array_equal(
            avicodec.decode_avi(avicodec.encode_avi(f))[0], f
        )

    def test_idx1_and_extra_chunks_tolerated(self):
        f = _frames(2, 8, 8)
        blob = avicodec.encode_avi(f)
        extra = b"idx1" + struct.pack("<I", 4) + b"\x00" * 4
        spliced = blob + extra
        spliced = (spliced[:4]
                   + struct.pack("<I", len(spliced) - 8) + spliced[8:])
        np.testing.assert_array_equal(avicodec.decode_avi(spliced)[0], f)

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


class TestExternalShapes:
    """Stream shapes the in-repo encoder never emits: audio tracks,
    top-down DIBs, partial frame decode."""

    def test_audio_strl_does_not_clobber_video_format(self):
        f = _frames(2, 8, 8)
        blob = avicodec.encode_avi(f)
        # craft an audio strl (strh 'auds' + 16-byte WAVEFORMAT strf)
        strh = (b"auds" + b"\x00" * 52)
        strf = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        audio_strl = avicodec._list(
            b"strl", avicodec._chunk(b"strh", strh)
            + avicodec._chunk(b"strf", strf)
        )
        # splice it at the end of hdrl (before the movi LIST)
        movi_at = blob.index(b"LIST", blob.index(b"movi") - 8)
        # recompute hdrl LIST length
        hdrl_at = blob.index(b"LIST")
        (hdrl_len,) = struct.unpack_from("<I", blob, hdrl_at + 4)
        spliced = (blob[:hdrl_at + 4]
                   + struct.pack("<I", hdrl_len + len(audio_strl))
                   + blob[hdrl_at + 8:movi_at] + audio_strl
                   + blob[movi_at:])
        spliced = (spliced[:4]
                   + struct.pack("<I", len(spliced) - 8) + spliced[8:])
        out, total = avicodec.decode_avi(spliced)
        assert total == 2
        np.testing.assert_array_equal(out, f)

    def test_top_down_dib_not_flipped(self):
        f = _frames(1, 8, 8)
        blob = bytearray(avicodec.encode_avi(f))
        i = bytes(blob).index(b"strf") + 8
        # flip biHeight sign (offset 8 within BITMAPINFOHEADER)
        (hv,) = struct.unpack_from("<i", bytes(blob), i + 8)
        struct.pack_into("<i", blob, i + 8, -hv)
        out_td, _ = avicodec.decode_avi(bytes(blob))
        out_bu, _ = avicodec.decode_avi(avicodec.encode_avi(f))
        # same bytes, opposite row order flag -> vertically mirrored
        np.testing.assert_array_equal(out_td, out_bu[:, ::-1, :])

    def test_partial_frame_decode(self):
        f = _frames(7, 8, 8)
        blob = avicodec.encode_avi(f)
        out, total = avicodec.decode_avi(blob, frame_indices=[0, 4])
        assert total == 7
        np.testing.assert_array_equal(out, f[[0, 4]])


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
