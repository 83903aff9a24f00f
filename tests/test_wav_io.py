"""WAV reader/writer round-trip and libsndfile-compatible conversion."""

import numpy as np
import pytest

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


# ---------------------------------------------------------------------------
# WAVE_FORMAT_EXTENSIBLE (0xFFFE): the real tag lives in the SubFormat GUID
# ---------------------------------------------------------------------------

_KS_SUFFIX = bytes.fromhex("000000001000800000aa00389b71")


def _write_extensible_wav(path, y, sr, fmt_tag, bits, guid_suffix=_KS_SUFFIX):
    import struct

    if fmt_tag == 1 and bits == 16:
        data = np.clip(np.rint(y * 32768.0), -32768, 32767).astype("<i2").tobytes()
    elif fmt_tag == 3 and bits == 32:
        data = y.astype("<f4").tobytes()
    else:
        raise AssertionError("unsupported test combo")
    block_align = bits // 8
    fmt = struct.pack(
        "<HHIIHH", 0xFFFE, 1, sr, sr * block_align, block_align, bits
    ) + struct.pack("<HHI", 22, bits, 0x4) + struct.pack("<H", fmt_tag) + guid_suffix
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    path = str(path)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)


def test_extensible_float32_decodes_as_float(tmp_path):
    """An extensible IEEE-float WAV must NOT be decoded as int32 PCM."""
    y = (np.sin(2 * np.pi * 440 * np.arange(8000) / 16000) * 0.5).astype(np.float32)
    p = tmp_path / "ext_f32.wav"
    _write_extensible_wav(p, y, 16000, fmt_tag=3, bits=32)
    got, sr = read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(got, y, atol=1e-7)


def test_extensible_pcm16_decodes(tmp_path):
    y = (np.sin(2 * np.pi * 300 * np.arange(6000) / 16000) * 0.4).astype(np.float32)
    p = tmp_path / "ext_i16.wav"
    _write_extensible_wav(p, y, 16000, fmt_tag=1, bits=16)
    got, sr = read_wav(p)
    np.testing.assert_allclose(got, y, atol=1.0 / 32768)


def test_extensible_unknown_guid_rejected(tmp_path):
    y = np.zeros(1000, np.float32)
    p = tmp_path / "ext_bad.wav"
    _write_extensible_wav(p, y, 16000, fmt_tag=1, bits=16, guid_suffix=b"\x00" * 14)
    with pytest.raises(ValueError, match="SubFormat GUID"):
        read_wav(p)


def test_extensible_native_decoder(tmp_path):
    """The C++ batch loader applies the same GUID rules (no Python fallback
    masking it: a good float32-extensible row must decode to float values)."""
    from stutter_tpu.io.native import load_wav_batch, native_available

    if not native_available():
        pytest.skip("no native toolchain")
    y = (np.sin(2 * np.pi * 200 * np.arange(5000) / 16000) * 0.25).astype(np.float32)
    pf = tmp_path / "n_f32.wav"
    pi = tmp_path / "n_i16.wav"
    pb = tmp_path / "n_bad.wav"
    _write_extensible_wav(pf, y, 16000, fmt_tag=3, bits=32)
    _write_extensible_wav(pi, y, 16000, fmt_tag=1, bits=16)
    _write_extensible_wav(pb, y, 16000, fmt_tag=1, bits=16, guid_suffix=b"\x00" * 14)
    audio, lens = load_wav_batch([str(pf), str(pi), str(pb)], 8000, 16000)
    assert lens[0] == 5000 and lens[1] == 5000
    np.testing.assert_allclose(audio[0, :5000], y, atol=1e-7)
    np.testing.assert_allclose(audio[1, :5000], y, atol=1.0 / 32768)
    assert lens[2] == 0  # unknown GUID rejected by both decoders
