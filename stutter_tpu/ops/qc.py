"""Audio-quality (QC) metrics for the per-file analysis report.

Batched JAX equivalents of the reference's per-file metrics
(ref: pipeline1.py:151-186): segmental SNR, mean spectral flatness, and
high-frequency energy ratio, computed before and after cleaning for
per_file_analysis.csv (ref: pipeline1.py:371-424).

Note on hf ratio: the reference rFFTs the exact clip length; under static
shapes we rFFT the padded bucket (clip zero-padded), which samples the same
spectrum on a finer grid — the >4 kHz energy ratio differs only by spectral
interpolation at the boundary bin (validated ~1e-3 relative vs the oracle).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from stutter_tpu.ops.masked import frame_mask, masked_mean
from stutter_tpu.ops.spectral import frame, power_spectrogram


def _masked_percentile_linear(x: jnp.ndarray, mask: jnp.ndarray, q: float) -> jnp.ndarray:
    """np.percentile(x[mask], q) per row (linear interpolation), via sort."""
    B, N = x.shape
    cnt = jnp.sum(mask, axis=-1)
    s = jnp.sort(jnp.where(mask, x, jnp.inf), axis=-1)
    pos = (q / 100.0) * jnp.maximum(cnt - 1, 0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo
    vlo = jnp.take_along_axis(s, lo[:, None], axis=-1)[:, 0]
    vhi = jnp.take_along_axis(s, hi[:, None], axis=-1)[:, 0]
    return vlo + frac * (vhi - vlo)


@partial(jax.jit, static_argnames=("sr",))
def snr_db_batch(audio: jnp.ndarray, lengths: jnp.ndarray, sr: int = 16000) -> jnp.ndarray:
    """Segmental energy SNR in dB (ref: pipeline1.py:151-165).

    25 ms frames / 10 ms hop, no padding (librosa.util.frame); noise = mean
    energy of the bottom-25%-energy frames; 10*log10(mean_E / (noise_E+1e-10)).
    Returns 0.0 for clips shorter than one frame (reference behavior).
    """
    frame_length = int(0.025 * sr)
    hop = int(0.010 * sr)
    B, N = audio.shape
    n_frames = 1 + (N - frame_length) // hop
    idx = np.arange(frame_length)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = audio[:, jnp.asarray(idx)]  # [B, T, frame_length]
    energy = jnp.sum(frames * frames, axis=-1)  # [B, T]
    valid = jnp.arange(n_frames)[None, :] < (
        1 + (jnp.maximum(lengths, frame_length) - frame_length) // hop
    )[:, None]
    p25 = _masked_percentile_linear(energy, valid, 25.0)
    noise_mask = valid & (energy < p25[:, None])
    n_noise = jnp.sum(noise_mask, axis=-1)
    noise_power = jnp.sum(jnp.where(noise_mask, energy, 0.0), axis=-1) / jnp.maximum(n_noise, 1)
    signal_power = masked_mean(energy[..., None], valid, axis=1)[:, 0]
    snr = 10.0 * jnp.log10(signal_power / (noise_power + 1e-10))
    ok = (lengths >= frame_length) & (n_noise > 0)
    return jnp.where(ok, snr, 0.0)


@partial(jax.jit, static_argnames=("sr", "n_fft", "hop_length", "amin"))
def spectral_flatness_mean_batch(
    audio: jnp.ndarray,
    lengths: jnp.ndarray,
    sr: int = 16000,
    n_fft: int = 2048,
    hop_length: int = 512,
    amin: float = 1e-10,
) -> jnp.ndarray:
    """Mean spectral flatness (ref: pipeline1.py:168-174; librosa power=2)."""
    power = power_spectrogram(audio, n_fft, hop_length)
    mask = frame_mask(lengths, hop_length, power.shape[1])
    S = jnp.maximum(power, amin)
    gmean = jnp.exp(jnp.mean(jnp.log(S), axis=-1))
    amean = jnp.mean(S, axis=-1)
    flat = gmean / amean  # [B, T]
    return masked_mean(flat[..., None], mask, axis=1)[:, 0]


@partial(jax.jit, static_argnames=("sr", "cutoff_hz"))
def high_freq_energy_ratio_batch(
    audio: jnp.ndarray, lengths: jnp.ndarray, sr: int = 16000, cutoff_hz: float = 4000.0
) -> jnp.ndarray:
    """rFFT energy above cutoff / total (ref: pipeline1.py:177-186).

    Computed on the zero-padded bucket (see module docstring).
    """
    B, N = audio.shape
    spec = jnp.fft.rfft(audio, axis=-1)
    e = spec.real**2 + spec.imag**2
    freqs = np.fft.rfftfreq(N, 1.0 / sr)
    high = jnp.asarray(freqs > cutoff_hz)
    total = jnp.sum(e, axis=-1)
    high_e = jnp.sum(jnp.where(high[None, :], e, 0.0), axis=-1)
    return high_e / (total + 1e-10)


@partial(jax.jit, static_argnames=("sr",))
def qc_metrics_batch(audio: jnp.ndarray, lengths: jnp.ndarray, sr: int = 16000) -> dict:
    """All three QC metrics in one jitted call -> dict of [B] arrays."""
    return {
        "snr_db": snr_db_batch(audio, lengths, sr),
        "spectral_flatness": spectral_flatness_mean_batch(audio, lengths, sr),
        "hf_energy_ratio": high_freq_energy_ratio_batch(audio, lengths, sr),
    }
