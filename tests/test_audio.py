"""Audio payload stages: WAV codec, stats, chunking (stages/audio)."""

from __future__ import annotations

import io
import wave

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from rustac_ray.stages.audio import (
    AudioStats,
    WavFormatError,
    chunk_audio,
    decode_wav,
    encode_wav,
)


def _wave_module_bytes(samples: np.ndarray, sr: int, ch: int = 1) -> bytes:
    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(ch)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(samples.astype("<i2").tobytes())
    return bio.getvalue()


def test_decode_matches_wave_module():
    rng = np.random.default_rng(5)
    s = rng.integers(-32768, 32768, 1000).astype(np.int16)
    got, sr = decode_wav(_wave_module_bytes(s, 8000))
    assert sr == 8000 and got.shape == (1000, 1)
    np.testing.assert_array_equal(got[:, 0], s)
    # stereo interleave
    inter = np.empty(2000, np.int16)
    inter[0::2] = s
    inter[1::2] = s[::-1]
    got2, _ = decode_wav(_wave_module_bytes(inter, 16000, ch=2))
    assert got2.shape == (1000, 2)
    np.testing.assert_array_equal(got2[:, 1], s[::-1])


def test_encode_roundtrip_and_wave_readable():
    s = (np.sin(np.arange(500) * 0.1) * 20000).astype(np.int16)
    b = encode_wav(s, 8000)
    got, sr = decode_wav(b)
    np.testing.assert_array_equal(got[:, 0], s)
    with wave.open(io.BytesIO(b), "rb") as wf:  # stdlib can read ours
        assert wf.getnframes() == 500 and wf.getframerate() == 8000


def test_decode_rejects_garbage():
    with pytest.raises(WavFormatError):
        decode_wav(b"\x00" * 64)
    with pytest.raises(WavFormatError):
        decode_wav(b"RIFF\x10\x00\x00\x00WAVE")  # no fmt/data


def test_audio_stats_integplaces(ray_session):
    s = np.array([0, 100, -32768, 32767, -200], np.int16)
    t = pa.table(
        {
            "audio_id": pa.array(["a", "bad"]),
            "bytes": pa.array([_wave_module_bytes(s, 8000), b"junk"], pa.binary()),
        }
    )
    out = AudioStats()(t).to_pandas().set_index("audio_id")
    assert out.loc["a", "peak"] == 32768
    assert out.loc["a", "clip_count"] == 2
    assert out.loc["a", "sumsq"] == int((s.astype(np.int64) ** 2).sum())
    assert not out.loc["bad", "decoded"]


def test_chunk_audio_conserves_mass(ray_session):
    rng = np.random.default_rng(8)
    clips = {
        f"c{i}": rng.integers(-3000, 3000, 950 + i * 37).astype(np.int16)
        for i in range(5)
    }
    t = pa.table(
        {
            "audio_id": pa.array(list(clips)),
            "bytes": pa.array(
                [_wave_module_bytes(v, 8000) for v in clips.values()], pa.binary()
            ),
        }
    )
    out = chunk_audio(rd.from_arrow(t), window=256).to_pandas()
    for cid, v in clips.items():
        g = out[out.audio_id == cid].sort_values("chunk_idx")
        assert g["n_samples"].sum() == len(v)  # tail emitted, mass conserved
        assert g["sumsq"].sum() == int((v.astype(np.int64) ** 2).sum())
        assert (g["start"].to_numpy() == np.arange(len(g)) * 256).all()
    # overlapping hop: window 256 hop 128 doubles coverage (except tail)
    out2 = chunk_audio(rd.from_arrow(t), window=256, hop=128).to_pandas()
    assert len(out2) > len(out)


def test_resample_downmix_exact(ray_session):
    from rustac_ray.stages.audio import resample_audio

    rng = np.random.default_rng(12)
    mono = rng.integers(-20000, 20000, 1003).astype(np.int16)
    inter = np.empty(2006, np.int16)
    inter[0::2] = mono
    inter[1::2] = (mono // 2)
    t = pa.table(
        {
            "audio_id": pa.array(["m", "s", "bad"]),
            "bytes": pa.array(
                [
                    _wave_module_bytes(mono, 8000),
                    _wave_module_bytes(inter, 16000, ch=2),
                    b"nope",
                ],
                pa.binary(),
            ),
        }
    )
    out = resample_audio(rd.from_arrow(t), 4).to_pandas().set_index("audio_id")
    # mono: block means with floor division, tail dropped
    v = mono.astype(np.int64)
    expect = v[: 250 * 4].reshape(250, 4).sum(1) // 4
    got, sr = decode_wav(out.loc["m", "bytes"])
    assert sr == 2000 and out.loc["m", "n_samples"] == 250
    np.testing.assert_array_equal(got[:, 0], expect.astype(np.int16))
    # stereo: downmix first (floor of channel sum / 2)
    mix = (v + (v // 2)) // 2
    expect_s = mix[: 250 * 4].reshape(250, 4).sum(1) // 4
    got_s, sr_s = decode_wav(out.loc["s", "bytes"])
    assert sr_s == 4000
    np.testing.assert_array_equal(got_s[:, 0], expect_s.astype(np.int16))
    assert not out.loc["bad", "decoded"] and out.loc["bad", "bytes"] is None
