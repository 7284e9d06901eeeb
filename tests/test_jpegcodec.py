"""Baseline JPEG codec pins (functions/jpegcodec.py): structural
validity of the emitted stream, roundtrip fidelity bounds, dispatch
through decode_image, and the v3 media corpus carrying real JPEGs."""

import numpy as np
import pytest

from crawler_tjce_ray.functions import imagecodec, jpegcodec


def _gradient(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([(x * 4) % 256, (y * 5) % 256, ((x + y) * 3) % 256],
                    axis=-1).astype(np.uint8)


class TestStructure:
    def test_markers_and_stuffing(self):
        blob = jpegcodec.encode_jpeg(_gradient(24, 40), quality=80)
        assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
        for marker in (b"\xff\xe0", b"\xff\xdb", b"\xff\xc0",
                       b"\xff\xc4", b"\xff\xda"):
            assert marker in blob
        # entropy segment: every 0xFF is followed by 0x00 (stuffing)
        sos = blob.index(b"\xff\xda")
        seg = blob[sos + 4:-2]
        i = seg.index(b"\x00\x3f\x00") + 3  # skip SOS params
        while i < len(seg) - 1:
            if seg[i] == 0xFF:
                assert seg[i + 1] == 0x00
                i += 2
            else:
                i += 1

    def test_is_jpeg(self):
        assert jpegcodec.is_jpeg(b"\xff\xd8\xff\xe0")
        assert not jpegcodec.is_jpeg(imagecodec.PNG_SIG)


class TestRoundtrip:
    def test_rgb_smooth_high_quality(self):
        img = _gradient(40, 56)
        dec = jpegcodec.decode_jpeg(jpegcodec.encode_jpeg(img, quality=90))
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.mean() < 2.0  # smooth content survives q90

    def test_gray_roundtrip(self):
        y, x = np.mgrid[0:24, 0:40]
        g = ((x * 3 + y * 2) % 256).astype(np.uint8)
        dec = jpegcodec.decode_jpeg(jpegcodec.encode_jpeg(g, quality=95))
        assert dec.shape == (24, 40, 1)
        assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).mean() < 1.0

    def test_flat_color_exact(self):
        flat = np.full((16, 24, 3), 130, np.uint8)
        dec = jpegcodec.decode_jpeg(jpegcodec.encode_jpeg(flat, quality=75))
        assert np.array_equal(dec, flat)

    def test_non_multiple_of_8_dims(self):
        img = _gradient(13, 21)  # forces edge padding both axes
        dec = jpegcodec.decode_jpeg(jpegcodec.encode_jpeg(img, quality=92))
        assert dec.shape == (13, 21, 3)

    def test_deterministic(self):
        img = _gradient(16, 16)
        assert jpegcodec.encode_jpeg(img) == jpegcodec.encode_jpeg(img)
        blob = jpegcodec.encode_jpeg(img)
        assert np.array_equal(jpegcodec.decode_jpeg(blob),
                              jpegcodec.decode_jpeg(blob))

    def test_quality_monotonic_size(self):
        img = np.random.default_rng(3).integers(0, 256, (32, 32, 3),
                                                dtype=np.uint8)
        sizes = [len(jpegcodec.encode_jpeg(img, q)) for q in (25, 75, 95)]
        assert sizes[0] < sizes[1] < sizes[2]


class TestErrors:
    def test_not_jpeg(self):
        with pytest.raises(ValueError):
            jpegcodec.decode_jpeg(b"nope")

    def test_truncated_stream(self):
        blob = jpegcodec.encode_jpeg(_gradient(16, 16))
        with pytest.raises(ValueError):
            jpegcodec.decode_jpeg(blob[: len(blob) // 2])

    def test_progressive_rejected(self):
        blob = bytearray(jpegcodec.encode_jpeg(_gradient(16, 16)))
        i = bytes(blob).index(b"\xff\xc0")
        blob[i + 1] = 0xC2  # flip SOF0 -> SOF2
        with pytest.raises(NotImplementedError):
            jpegcodec.decode_jpeg(bytes(blob))


class TestDispatchAndCorpus:
    def test_decode_image_dispatch(self):
        img = _gradient(12, 12)
        out = imagecodec.decode_image(jpegcodec.encode_jpeg(img, 90))
        assert out.shape == (12, 12, 3)

    def test_media_corpus_contains_real_jpegs(self):
        from crawler_tjce_ray.sources.media import make_image

        kinds = set()
        for media_id in range(0, 48, 3):  # image ordinals
            blob = make_image(media_id, seed=7)
            if jpegcodec.is_jpeg(blob):
                kinds.add("jpeg")
                arr = imagecodec.decode_image(blob)
                assert arr.ndim == 3 and arr.dtype == np.uint8
            elif imagecodec.is_png(blob):
                kinds.add("png")
            elif imagecodec.is_bmp(blob):
                kinds.add("bmp")
            else:
                kinds.add("fimg")
        assert kinds == {"fimg", "png", "bmp", "jpeg"}


class TestRobustness:
    """External-JPEG shapes the in-repo encoder never emits by default:
    restart intervals, fill bytes, CMYK, multi-scan, bad table ids."""

    def test_restart_interval_roundtrip(self):
        img = _gradient(40, 56)
        for ri in (1, 3, 7):
            blob = jpegcodec.encode_jpeg(img, quality=90, restart_interval=ri)
            assert b"\xff\xdd" in blob  # DRI present
            dec = jpegcodec.decode_jpeg(blob)
            err = np.abs(dec.astype(int) - img.astype(int))
            assert err.mean() < 2.0, f"ri={ri}: mean err {err.mean()}"
        # restart output must equal the no-restart decode exactly
        base = jpegcodec.decode_jpeg(jpegcodec.encode_jpeg(img, quality=90))
        with_ri = jpegcodec.decode_jpeg(
            jpegcodec.encode_jpeg(img, quality=90, restart_interval=2)
        )
        assert np.array_equal(base, with_ri)

    def test_gray_restart_roundtrip(self):
        y, x = np.mgrid[0:24, 0:40]
        g = ((x * 3 + y * 2) % 256).astype(np.uint8)
        dec = jpegcodec.decode_jpeg(
            jpegcodec.encode_jpeg(g, quality=95, restart_interval=1)
        )
        assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).mean() < 1.0

    def test_fill_bytes_before_marker(self):
        blob = jpegcodec.encode_jpeg(_gradient(16, 16))
        i = blob.index(b"\xff\xdb")
        padded = blob[:i] + b"\xff\xff\xff" + blob[i:]  # T.81 B.1.1.2
        assert np.array_equal(jpegcodec.decode_jpeg(padded),
                              jpegcodec.decode_jpeg(blob))

    def test_cmyk_rejected(self):
        blob = bytearray(jpegcodec.encode_jpeg(_gradient(16, 16)))
        i = bytes(blob).index(b"\xff\xc0")
        # SOF0 payload: len(2) prec(1) h(2) w(2) nc(1) -> nc at i+9
        blob[i + 9] = 4
        with pytest.raises(NotImplementedError, match="component"):
            jpegcodec.decode_jpeg(bytes(blob))

    def test_multi_scan_rejected(self):
        blob = bytearray(jpegcodec.encode_jpeg(_gradient(16, 16)))
        i = bytes(blob).index(b"\xff\xda")
        # SOS payload: len(2) ns(1) ... — claim a 1-component scan of
        # a 3-component frame (non-interleaved multi-scan shape)
        blob[i + 4] = 1
        # keep the segment length consistent: 2 + 1 + 2*1 + 3 = 8
        blob[i + 2:i + 4] = (8).to_bytes(2, "big")
        with pytest.raises(NotImplementedError, match="multi-scan"):
            jpegcodec.decode_jpeg(bytes(blob))

    def test_undefined_huffman_table_is_valueerror(self):
        blob = bytearray(jpegcodec.encode_jpeg(_gradient(16, 16)))
        i = bytes(blob).index(b"\xff\xda")
        blob[i + 6] = 0x77  # component 1 -> undefined DC/AC table id 7
        with pytest.raises(ValueError):
            jpegcodec.decode_jpeg(bytes(blob))

    def test_unknown_scan_component_is_valueerror(self):
        blob = bytearray(jpegcodec.encode_jpeg(_gradient(16, 16)))
        i = bytes(blob).index(b"\xff\xda")
        blob[i + 5] = 9  # scan names component id 9, absent from SOF
        with pytest.raises(ValueError, match="unknown component"):
            jpegcodec.decode_jpeg(bytes(blob))


class TestSubsampling:
    """4:2:0 / 4:2:2 — the dominant real-world chroma layouts."""

    @pytest.mark.parametrize("mode", ["420", "422"])
    def test_subsampled_roundtrip(self, mode):
        img = _gradient(40, 56)
        blob = jpegcodec.encode_jpeg(img, quality=90, subsampling=mode)
        dec = jpegcodec.decode_jpeg(blob)
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int))
        # chroma is halved, so the bound is looser than 4:4:4 but the
        # image must still be recognizably intact on smooth content
        assert err.mean() < 6.0, f"{mode}: mean err {err.mean()}"
        # luma carries most of the signal: compare intensity directly
        lum_in = img.astype(float).mean(axis=2)
        lum_out = dec.astype(float).mean(axis=2)
        assert np.abs(lum_in - lum_out).mean() < 3.0

    def test_420_smaller_than_444(self):
        img = _gradient(64, 64)
        s444 = len(jpegcodec.encode_jpeg(img, 85, subsampling="444"))
        s420 = len(jpegcodec.encode_jpeg(img, 85, subsampling="420"))
        assert s420 < s444

    @pytest.mark.parametrize("mode", ["420", "422"])
    def test_subsampled_odd_dims(self, mode):
        img = _gradient(19, 27)  # not multiples of the MCU lattice
        dec = jpegcodec.decode_jpeg(
            jpegcodec.encode_jpeg(img, quality=92, subsampling=mode)
        )
        assert dec.shape == (19, 27, 3)

    def test_420_with_restart_interval(self):
        img = _gradient(48, 48)
        blob = jpegcodec.encode_jpeg(img, quality=90, subsampling="420",
                                     restart_interval=2)
        dec = jpegcodec.decode_jpeg(blob)
        base = jpegcodec.decode_jpeg(
            jpegcodec.encode_jpeg(img, quality=90, subsampling="420")
        )
        assert np.array_equal(dec, base)
