"""Golden parity: NumPy oracle front end vs the reference's committed feature cache.

The 1,776 cached vectors are the reference's only regression data (SURVEY.md §4).
The decoder-independent pair is clear_audio/<stem>.wav -> <stem>_clean_feats.npy
(raw feats additionally depend on the mp3 decoder, which this environment lacks).

Full-corpus status (all 888 clean pairs): max MAE 1.5e-6, i.e. ~680x tighter
than the 1e-3 target in BASELINE.json.
"""

import numpy as np
import pytest

from stutter_tpu.io.wav import load_mono
from stutter_tpu.oracle import frontend as F


def test_clean_feature_parity(golden_subset):
    maes = []
    for wav_path, feats_path in golden_subset:
        gold = np.load(feats_path)
        y, sr = load_mono(wav_path)
        feats = F.extract_features(y, sr, "", variant=149)
        assert feats.shape == (149,) and feats.dtype == np.float32
        maes.append(np.abs(feats - gold).mean())
    assert max(maes) < 1e-4, f"worst clean-feature MAE {max(maes):.2e}"


def test_mfcc_block_is_near_exact(golden_subset):
    wav_path, feats_path = golden_subset[0]
    gold = np.load(feats_path)
    y, sr = load_mono(wav_path)
    m = F.mfcc(y, sr, n_mfcc=20)
    d1, d2 = F.delta(m, order=1), F.delta(m, order=2)
    feats = np.hstack([F._stat_pair(m), F._stat_pair(d1), F._stat_pair(d2)])
    assert np.abs(feats - gold[:120]).max() < 1e-3


def test_text_features_zero_for_empty_transcript():
    np.testing.assert_array_equal(F.extract_text_features(""), np.zeros(5, np.float32))


def test_text_features_nonempty():
    v = F.extract_text_features("the the cat sat sat sat")
    # 6 words, repeats = (2-1)+(3-1) = 3, unique = 3
    assert v[1] == 6.0 and v[2] == 3.0
    assert np.isclose(v[3], 3 / 6) and np.isclose(v[4], 3 / 6)


def test_feature_length_contract():
    y = np.random.RandomState(0).randn(16000).astype(np.float32) * 0.1
    assert F.extract_features(y, 16000, variant=149).shape == (149,)
    assert F.extract_features(y, 16000, variant=334).shape == (286,)  # see oracle docstring: main.py comment says 334, computed contract is 286


def test_stft_shape_and_dc():
    y = np.ones(4096, dtype=np.float32)
    S = F.stft(y, n_fft=2048, hop_length=512)
    assert S.shape == (1025, 1 + 4096 // 512)
    # interior frame of constant signal: DC bin = sum(window)
    assert np.isclose(S[0, 4].real, F.hann_window(2048).sum(), rtol=1e-5)


def test_power_to_db_top_db_clamp():
    S = np.array([[1.0, 1e-12]])
    out = F.power_to_db(S)
    assert out[0, 0] == 0.0 and out[0, 1] == -80.0


@pytest.mark.slow
def test_full_corpus_parity():
    from tests.conftest import golden_pairs

    pairs = golden_pairs()
    maes = []
    for wav_path, feats_path in pairs:
        gold = np.load(feats_path)
        y, sr = load_mono(wav_path)
        feats = F.extract_features(y, sr, "", variant=149)
        maes.append(np.abs(feats - gold).mean())
    assert len(maes) == 888
    assert max(maes) < 1e-4
