"""WAV codec pins (functions/wavcodec.py) and the audio stage over
the v5 corpus (FAUD + real WAV containers)."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from crawler_tjce_ray.functions import wavcodec


def _tone(n=800, sr=8000):
    t = np.arange(n) / sr
    return (np.sin(2 * np.pi * 440 * t) * 12000).astype(np.int16), sr


class TestRoundtrip:
    def test_mono_pcm16_exact(self):
        samples, sr = _tone()
        sr2, out = wavcodec.decode_wav(wavcodec.encode_wav(samples, sr))
        assert sr2 == sr
        np.testing.assert_array_equal(out, samples)

    def test_is_wav(self):
        samples, sr = _tone(16)
        assert wavcodec.is_wav(wavcodec.encode_wav(samples, sr))
        assert not wavcodec.is_wav(b"FAUD....")

    def test_extra_chunk_tolerated(self):
        samples, sr = _tone(32)
        blob = wavcodec.encode_wav(samples, sr)
        # splice a LIST chunk between fmt and data (word-aligned)
        fmt_end = blob.index(b"data")
        extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
        spliced = blob[:fmt_end] + extra + blob[fmt_end:]
        spliced = (spliced[:4]
                   + struct.pack("<I", len(spliced) - 8) + spliced[8:])
        sr2, out = wavcodec.decode_wav(spliced)
        np.testing.assert_array_equal(out, samples)

    def test_stereo_downmix(self):
        left = np.array([100, 200, -300], np.int16)
        right = np.array([300, 0, -100], np.int16)
        inter = np.empty(6, np.int16)
        inter[0::2], inter[1::2] = left, right
        pcm = inter.astype("<i2").tobytes()
        fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(pcm)) + pcm)
        blob = b"RIFF" + struct.pack("<I", len(body)) + body
        _, out = wavcodec.decode_wav(blob)
        np.testing.assert_array_equal(out, [200, 100, -200])

    def test_non_pcm_rejected(self):
        samples, sr = _tone(16)
        blob = bytearray(wavcodec.encode_wav(samples, sr))
        i = bytes(blob).index(b"fmt ") + 8
        blob[i:i + 2] = struct.pack("<H", 85)  # MP3 format tag
        with pytest.raises(NotImplementedError):
            wavcodec.decode_wav(bytes(blob))

    def test_not_wav(self):
        with pytest.raises(ValueError):
            wavcodec.decode_wav(b"nope")

    def test_truncated_data_chunk_raises(self):
        samples, sr = _tone(100)
        blob = wavcodec.encode_wav(samples, sr)
        with pytest.raises(ValueError):
            wavcodec.decode_wav(blob[:-50])


class TestCorpusAndStage:
    def test_corpus_alternates_faud_and_wav(self):
        from crawler_tjce_ray.sources.media import MAGIC_AUD, make_audio

        kinds = set()
        for media_id in range(1, 49, 3):  # audio ordinals
            blob = make_audio(media_id, seed=7)
            kinds.add("wav" if wavcodec.is_wav(blob)
                      else ("faud" if blob.startswith(MAGIC_AUD) else "?"))
        assert kinds == {"faud", "wav"}

    def test_stage_identical_stats_across_containers(self):
        from crawler_tjce_ray.sources.media import MAGIC_AUD
        from crawler_tjce_ray.stages.multimodal import AudioFeatureStage

        samples, sr = _tone()
        faud = (MAGIC_AUD + np.array([sr, len(samples)], "<u4").tobytes()
                + samples.astype("<i2").tobytes())
        wav = wavcodec.encode_wav(samples, sr)
        t = pa.table({
            "media_id": pa.array([1, 2], pa.int64()),
            "kind": pa.array(["audio", "audio"]),
            "payload": pa.array([faud, wav], pa.binary()),
        })
        out = AudioFeatureStage()(t)
        assert out["duration_s"][0].as_py() == out["duration_s"][1].as_py()
        assert out["rms"][0].as_py() == out["rms"][1].as_py()

    def test_unknown_audio_magic_raises(self):
        from crawler_tjce_ray.stages.multimodal import decode_any_audio

        with pytest.raises(NotImplementedError):
            decode_any_audio(b"OggS....")
