"""WAV reader/writer round-trip and libsndfile-compatible conversion."""

import numpy as np

from stutter_tpu.io.wav import load_mono, read_wav, write_wav


def test_pcm16_roundtrip(tmp_path, rng):
    y = (rng.rand(16000).astype(np.float32) * 2 - 1) * 0.9
    p = tmp_path / "x.wav"
    write_wav(p, y, 16000)
    y2, sr = read_wav(p)
    assert sr == 16000
    # 16-bit quantization error bound
    assert np.abs(y - y2).max() <= 1.0 / 32768


def test_float_roundtrip(tmp_path, rng):
    y = rng.randn(1000).astype(np.float32)
    p = tmp_path / "f.wav"
    write_wav(p, y, 8000, subtype="FLOAT")
    y2, sr = read_wav(p)
    np.testing.assert_array_equal(y, y2)


def test_stereo_downmix(tmp_path):
    y = np.stack([np.ones(100, np.float32) * 0.5, -np.ones(100, np.float32) * 0.5], axis=1)
    p = tmp_path / "s.wav"
    write_wav(p, y, 8000, subtype="FLOAT")
    mono, sr = load_mono(p)
    np.testing.assert_allclose(mono, 0.0, atol=1e-7)


def test_reads_reference_wav():
    import glob

    wavs = sorted(glob.glob("/root/reference/clear_audio/*.wav"))
    if not wavs:
        return
    y, sr = load_mono(wavs[0])
    assert sr == 16000 and y.dtype == np.float32 and y.ndim == 1
