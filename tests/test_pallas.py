"""Pallas fused spectrogram kernel vs the XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stutter_tpu.ops.pallas_spectrogram import power_spectrogram_pallas
from stutter_tpu.ops.spectral import power_spectrogram


@pytest.mark.parametrize("g_clips", [1, 2])
def test_pallas_spectrogram_matches_xla(rng, g_clips):
    audio = jnp.asarray((rng.randn(4, 8192) * 0.3).astype(np.float32))
    ref = np.asarray(power_spectrogram(audio, 2048, 512, method="matmul"))
    got = np.asarray(power_spectrogram_pallas(audio, g_clips=g_clips, interpret=True))
    assert got.shape == ref.shape
    # bf16x3 vs f32: ~1e-5 relative on O(1e2) power values
    assert np.abs(got - ref).max() / ref.max() < 1e-4
