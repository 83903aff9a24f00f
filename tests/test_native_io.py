"""Native C++ batch WAV loader: parity with the Python reader + prefetcher."""

import glob

import numpy as np
import pytest

from stutter_tpu.io.native import BatchPrefetcher, load_wav_batch, native_available
from stutter_tpu.io.wav import load_mono, write_wav


@pytest.fixture(scope="module")
def wavs(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.RandomState(0)
    paths = []
    for i, n in enumerate([4000, 9000, 16000]):
        y = (rng.randn(n) * 0.4).astype(np.float32)
        p = str(d / f"clip{i}.wav")
        write_wav(p, y, 16000)
        paths.append(p)
    return paths


def test_native_builds():
    assert native_available(), "g++ toolchain expected in this image"


def test_batch_matches_python_reader(wavs):
    audio, lengths = load_wav_batch(wavs, 16384, 16000)
    assert audio.shape == (3, 16384)
    for i, p in enumerate(wavs):
        y, _ = load_mono(p)
        assert lengths[i] == len(y)
        np.testing.assert_array_equal(audio[i, : len(y)], y)
        np.testing.assert_array_equal(audio[i, len(y):], 0.0)


def test_missing_file_degrades(wavs):
    audio, lengths = load_wav_batch([wavs[0], "/nonexistent/x.wav"], 8192)
    assert lengths[1] == 0
    np.testing.assert_array_equal(audio[1], 0.0)


def test_reference_corpus_sample():
    ref = sorted(glob.glob("/root/reference/clear_audio/*.wav"))[:8]
    if not ref:
        pytest.skip("reference not mounted")
    audio, lengths = load_wav_batch(ref, 163840)
    for i, p in enumerate(ref):
        y, _ = load_mono(p)
        assert lengths[i] == min(len(y), 163840)
        np.testing.assert_array_equal(audio[i, : lengths[i]], y[: lengths[i]])


def test_prefetcher_covers_corpus(wavs):
    seen = []
    for audio, lengths, items in BatchPrefetcher(wavs * 3, 16384, batch_size=2):
        assert audio.shape[0] == len(items) <= 2
        seen += list(items)
    assert len(seen) == 9
