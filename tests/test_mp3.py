"""MP3 decode via the ctypes libmpg123 binding (stutter_tpu.io.mp3).

The lame round-trip encodes a known tone with the system libmp3lame (also a
bare shared library) so decode correctness is provable without any committed
binary fixtures; the golden raw-path parity runs against the reference's
committed `*_raw_feats.npy` (slow-marked: the fast variant samples 8 files).
"""

import ctypes
import glob
import os

import numpy as np
import pytest

from stutter_tpu.io import mp3

needs_mpg123 = pytest.mark.skipif(not mp3.available(), reason="libmpg123 absent")

REFERENCE = "/root/reference"
CORPUS = sorted(
    glob.glob(os.path.join(REFERENCE, "segrigated_samples", "**", "*.mp3"),
              recursive=True)
)


def _lame_encode(y: np.ndarray, sr: int, path: str) -> None:
    """Encode mono float32 PCM to `path` with the system libmp3lame."""
    lib = ctypes.CDLL("libmp3lame.so.0")
    lib.lame_init.restype = ctypes.c_void_p
    h = ctypes.c_void_p(lib.lame_init())
    lib.lame_set_in_samplerate(h, sr)
    lib.lame_set_num_channels(h, 1)
    lib.lame_set_brate(h, 64)
    lib.lame_init_params(h)
    n = len(y)
    buf = (ctypes.c_char * (n + (1 << 16)))()
    pcm = np.ascontiguousarray(y, np.float32)
    lib.lame_encode_buffer_ieee_float.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
    ]
    m = lib.lame_encode_buffer_ieee_float(
        h, pcm.ctypes.data, pcm.ctypes.data, n, buf, len(buf)
    )
    assert m >= 0
    lib.lame_encode_flush.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
    tail = (ctypes.c_char * (1 << 16))()
    m2 = lib.lame_encode_flush(h, tail, len(tail))
    lib.lame_close(h)
    with open(path, "wb") as f:
        f.write(bytes(buf[:m]) + bytes(tail[:m2]))


@needs_mpg123
def test_lame_roundtrip_tone(tmp_path):
    """Encode a 440 Hz tone with lame, decode with mpg123: the decoded signal
    must be a 440 Hz tone at the right rate and amplitude (alignment found by
    cross-correlation; mp3 adds codec delay)."""
    try:
        ctypes.CDLL("libmp3lame.so.0")
    except OSError:
        pytest.skip("libmp3lame absent")
    sr = 16000
    t = np.arange(sr * 2) / sr
    tone = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    path = str(tmp_path / "tone.mp3")
    _lame_encode(tone, sr, path)

    y, got_sr = mp3.decode_mp3(path)
    assert got_sr == sr
    assert abs(len(y) - len(tone)) < 5000  # codec delay/padding only
    # dominant frequency
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    f_peak = np.argmax(spec) * sr / len(y)
    assert abs(f_peak - 440.0) < 2.0
    # amplitude preserved
    assert abs(np.percentile(np.abs(y), 99) - 0.5) < 0.05
    # waveform correlation at best lag (codec delay) on a mid slice
    mid = y[len(y) // 4 : len(y) // 4 + 4000]
    c = np.correlate(tone, mid, mode="valid")
    r = c.max() / (np.linalg.norm(mid) * 0.5 / np.sqrt(2) * np.sqrt(4000))
    assert r > 0.98


@needs_mpg123
def test_decode_audio_mp3_fallback(tmp_path):
    """decode_audio routes .mp3 through the built-in mpg123 fallback (and
    resamples to the target rate)."""
    try:
        ctypes.CDLL("libmp3lame.so.0")
    except OSError:
        pytest.skip("libmp3lame absent")
    from stutter_tpu.io.decode import decode_audio

    sr = 22050
    t = np.arange(sr) / sr
    tone = (0.4 * np.sin(2 * np.pi * 330.0 * t)).astype(np.float32)
    path = str(tmp_path / "tone22k.mp3")
    _lame_encode(tone, sr, path)
    y = decode_audio(path, 16000)
    assert y.dtype == np.float32
    assert abs(len(y) - 16000) < 4000
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    f_peak = np.argmax(spec) * 16000 / len(y)
    assert abs(f_peak - 330.0) < 2.0


@needs_mpg123
@pytest.mark.skipif(not CORPUS, reason="reference corpus not mounted")
def test_corpus_mp3_decodes():
    y, sr = mp3.decode_mp3(CORPUS[0])
    assert sr == 22050  # the corpus is MPEG-2 Layer III 22.05 kHz mono
    assert len(y) > 8000
    assert 0.01 < np.abs(y).max() <= 1.0


def _raw_parity(files) -> np.ndarray:
    """Relative feature MAE vs the committed *_raw_feats.npy per clip."""
    from stutter_tpu.oracle import frontend as OF

    rel = []
    for f in files:
        stem = os.path.splitext(os.path.basename(f))[0]
        gpath = os.path.join(REFERENCE, "cache_features", f"{stem}_raw_feats.npy")
        if not os.path.exists(gpath):
            continue
        golden = np.load(gpath)
        y, _ = mp3.load_mp3(f, 16000)
        ours = OF.extract_features(y, 16000, variant=149)
        denom = max(np.abs(golden).mean(), 1e-9)
        rel.append(np.abs(ours - golden).mean() / denom)
    return np.asarray(rel)


@needs_mpg123
@pytest.mark.skipif(not CORPUS, reason="reference corpus not mounted")
def test_raw_feats_golden_parity_sample():
    """Raw-path golden parity on a sample: decode mp3 -> Kaiser resample ->
    149-dim features vs the reference's committed raw vectors.  Different
    MPEG decoders are bit-different (the author's librosa->audioread stack is
    unknowable), so parity is approximate by construction; measured corpus
    distribution: mean relative MAE ~0.9%, all clips < 3%
    (docs/parity/README.md)."""
    rng = np.random.RandomState(0)
    files = [CORPUS[i] for i in rng.choice(len(CORPUS), 8, replace=False)]
    rel = _raw_parity(files)
    assert len(rel) >= 4
    assert rel.mean() < 0.02
    assert rel.max() < 0.05


@needs_mpg123
@pytest.mark.slow
@pytest.mark.skipif(not CORPUS, reason="reference corpus not mounted")
def test_raw_feats_golden_parity_full():
    """Full-corpus raw-path parity distribution (documented in
    docs/parity/README.md)."""
    rel = _raw_parity(CORPUS)
    assert len(rel) > 800
    assert rel.mean() < 0.02
    assert np.percentile(rel, 99) < 0.05
