"""Polyphase resampler: tone fidelity, brute-force formula check, DC gain."""

import numpy as np
import pytest

from stutter_tpu.ops.resample import _polyphase_filter, _rational, resample


def test_rational():
    assert _rational(44100, 16000) == (160, 441)
    assert _rational(8000, 16000) == (2, 1)


def test_dc_gain():
    y = np.ones(4000, np.float32)
    out = resample(y, 22050, 16000)
    interior = out[200:-200]
    np.testing.assert_allclose(interior, 1.0, atol=1e-3)


def test_tone_preserved():
    """A 1 kHz tone at 22050 Hz must come out as a 1 kHz tone at 16 kHz."""
    sr_in, sr_out, f0 = 22050, 16000, 1000.0
    t_in = np.arange(22050) / sr_in
    y = np.sin(2 * np.pi * f0 * t_in).astype(np.float32)
    out = resample(y, sr_in, sr_out)
    t_out = np.arange(len(out)) / sr_out
    ref = np.sin(2 * np.pi * f0 * t_out).astype(np.float32)
    err = np.abs(out[500:-500] - ref[500 : len(out) - 500])
    assert err.max() < 5e-3


def test_matches_bruteforce_formula():
    """Device kernel == direct evaluation of the polyphase equation."""
    rng = np.random.RandomState(0)
    x = rng.randn(500).astype(np.float32)
    sr_in, sr_out = 24000, 16000
    L, M = _rational(sr_in, sr_out)  # 2, 3
    hphase, n_taps = _polyphase_filter(L, M)
    center = (n_taps - 1) // 2
    n_out = int(np.ceil(len(x) * sr_out / sr_in))
    ref = np.zeros(n_out)
    for n in range(n_out):
        t = n * M + center
        q = t % L
        m_top = t // L
        for k in range(hphase.shape[1]):
            m = m_top - k
            if 0 <= m < len(x):
                ref[n] += hphase[q, k] * x[m]
    out = resample(x, sr_in, sr_out)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_downsample_removes_high_freq():
    """Content above the output Nyquist must be attenuated, not aliased."""
    sr_in, sr_out = 48000, 16000
    t = np.arange(48000) / sr_in
    y = np.sin(2 * np.pi * 11000 * t).astype(np.float32)  # > 8 kHz Nyquist
    out = resample(y, sr_in, sr_out)
    assert np.abs(out[500:-500]).max() < 1e-2
