"""Batched chroma_stft with signal-dependent tuning estimation, on TPU.

This is the parity-hard op (SURVEY.md §7): librosa.feature.chroma_stft
estimates a per-signal tuning offset via piptrack (parabolic-interpolation
peak picking on the power spectrogram), a median-magnitude threshold, and a
100-bin histogram of pitch residuals; the chroma filterbank is then built for
that tuning.

TPU-native design decisions:
  * The tuning estimate is always a histogram bin edge (resolution 0.01), so
    the 100 possible filterbanks are precomputed host-side into a
    [100, n_chroma, F] table and selected by bin index — no dynamic
    filterbank construction inside jit.
  * Peak candidates are compacted per-frame with lax.top_k over a
    candidate-keyed score (non-candidates = -inf). With K >= the true
    candidate count this is EXACT; the corpus-wide max is 105 candidates per
    frame, so the default K=128 reproduces librosa bit-for-bit on the corpus.
  * The candidate-magnitude median uses sort + order-statistic selection with
    +inf fill (exact np.median semantics).

Ref call chain: pipeline1.py:227 -> librosa chroma_stft/estimate_tuning/
piptrack/pitch_tuning/filters.chroma.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from stutter_tpu.ops import filterbanks as fb
from stutter_tpu.ops.masked import masked_median

HIGHEST = jax.lax.Precision.HIGHEST
_F32_TINY = float(np.finfo(np.float32).tiny)


@lru_cache(maxsize=None)
def _residual_table(sr: int, n_fft: int, n_freqs: int, n_chroma: int) -> np.ndarray:
    """[n_freqs] float32: mod(n_chroma * log2(bin * sr / (n_fft * 27.5)), 1) in f64.

    Entry 0 (DC) is never a candidate (piptrack's fmin >= 150 Hz); set to 0.
    """
    bins = np.arange(n_freqs, dtype=np.float64)
    bins[0] = 1.0
    r = np.mod(n_chroma * np.log2(bins * sr / (n_fft * (440.0 / 16.0))), 1.0)
    r[0] = 0.0
    return r.astype(np.float32)


def piptrack_candidates(
    power: jnp.ndarray,
    sr: int,
    n_fft: int,
    fmin: float = 150.0,
    fmax: float = 4000.0,
    threshold: float = 0.1,
    k_peaks: int = 128,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """power: [B, T, F] (zeroed at invalid frames) -> per-frame top-K candidates.

    Returns (bin_idx [B,T,K] int32, shifts [B,T,K], mags [B,T,K], valid [B,T,K]).
    """
    S = power  # piptrack treats its S input as magnitude; chroma passes power.
    F = S.shape[-1]

    avg_core = 0.5 * (S[..., 2:] - S[..., :-2])
    den = 2.0 * S[..., 1:-1] - S[..., 2:] - S[..., :-2]
    shift_core = avg_core / (den + (jnp.abs(den) < _F32_TINY))
    zeros = jnp.zeros_like(S[..., :1])
    avg = jnp.concatenate([zeros, avg_core, zeros], axis=-1)
    shift = jnp.concatenate([zeros, shift_core, zeros], axis=-1)
    dskew = 0.5 * avg * shift

    fft_freqs = np.linspace(0, sr / 2.0, F)
    freq_mask = jnp.asarray((max(fmin, 0.0) <= fft_freqs) & (fft_freqs < min(fmax, sr / 2.0)))

    ref = threshold * jnp.max(S, axis=-1, keepdims=True)
    gated = S * (S > ref)
    # localmax along frequency with edge padding: x > x[f-1] and x >= x[f+1]
    left = jnp.concatenate([gated[..., :1], gated[..., :-1]], axis=-1)
    right = jnp.concatenate([gated[..., 1:], gated[..., -1:]], axis=-1)
    cand = (gated > left) & (gated >= right) & freq_mask[None, None, :]

    mags = jnp.where(cand, S + dskew, 0.0)

    # Compact candidates: top-K by candidate-keyed score. With count <= K all
    # candidates are kept regardless of magnitude ordering.
    key = jnp.where(cand, mags, -jnp.inf)
    top_vals, top_idx = jax.lax.top_k(key, k_peaks)
    valid = jnp.isfinite(top_vals)
    sel_shift = jnp.take_along_axis(jnp.where(cand, shift, 0.0), top_idx, axis=-1)
    sel_mag = jnp.where(valid, jnp.take_along_axis(mags, top_idx, axis=-1), 0.0)
    # top_idx IS the FFT bin index of each candidate (candidates live on the
    # frequency axis); pitch = (bin + shift) * sr / n_fft is reconstructed by
    # callers from (bin, shift) to avoid device transcendentals.
    return top_idx, sel_shift, sel_mag, valid


def estimate_tuning_bin(
    power: jnp.ndarray,
    sr: int,
    n_fft: int,
    n_chroma: int = 12,
    resolution: float = 0.01,
    k_peaks: int = 128,
) -> jnp.ndarray:
    """[B, T, F] power (invalid frames zeroed) -> [B] int32 tuning bin index.

    Bin i corresponds to tuning = -0.5 + i * resolution (histogram left edge),
    exactly librosa.estimate_tuning's return value.
    """
    B = power.shape[0]
    n_bins = int(np.ceil(1.0 / resolution))
    bin_idx, shift, mag, valid = piptrack_candidates(power, sr, n_fft, k_peaks=k_peaks)
    bin_idx = bin_idx.reshape(B, -1)
    shift = shift.reshape(B, -1)
    mag = mag.reshape(B, -1)
    # librosa: candidates are pitch > 0; pitch = (bin + shift) * sr / n_fft.
    cand = valid.reshape(B, -1) & (bin_idx.astype(jnp.float32) + shift > 0)

    med = masked_median(mag, cand)
    sel = cand & (mag >= med[:, None])

    # pitch_tuning residual: mod(12*log2(pitch/27.5), 1), wrapped to [-0.5, 0.5).
    # TPU's log2 transcendental has ~1e-3 abs error at these magnitudes — enough
    # to flip histogram bins wholesale (counts here are small). Instead:
    #   12*log2((bin+shift)*sr/(n_fft*27.5)) mod 1
    #     = [12*log2(bin*sr/(n_fft*27.5)) mod 1]  (exact f64 host table)
    #     + 12*log2(1 + shift/bin)                (tiny u: fast-converging series)
    r_table = _residual_table(sr, n_fft, power.shape[-1], n_chroma)
    r_base = jnp.asarray(r_table)[bin_idx]
    binf = jnp.maximum(bin_idx.astype(jnp.float32), 1.0)
    u = shift / binf
    # log2(1+u) = (u - u^2/2 + u^3/3 - ... ) / ln 2; |u| <= ~0.03 in practice.
    ln2 = float(np.log(2.0))
    poly = u * (1.0 + u * (-1.0 / 2 + u * (1.0 / 3 + u * (-1.0 / 4 + u * (1.0 / 5 + u * (-1.0 / 6 + u * (1.0 / 7 + u * (-1.0 / 8))))))))
    residual = jnp.mod(r_base + (n_chroma / ln2) * poly, 1.0)
    residual = jnp.where(residual >= 0.5, residual - 1.0, residual)
    idx = jnp.clip(jnp.floor((residual + 0.5) * n_bins), 0, n_bins - 1).astype(jnp.int32)

    hist = jnp.zeros((B, n_bins), jnp.int32)
    hist = jax.vmap(lambda h, i, w: h.at[i].add(w))(hist, idx, sel.astype(jnp.int32))
    has_any = jnp.any(sel, axis=-1)
    # librosa returns tuning 0.0 when no candidates exist -> bin of 0.0
    zero_bin = n_bins // 2
    return jnp.where(has_any, jnp.argmax(hist, axis=-1).astype(jnp.int32), zero_bin)


def chroma_from_power(
    power: jnp.ndarray,
    tuning_bin: jnp.ndarray,
    sr: int,
    n_fft: int,
    n_chroma: int = 12,
) -> jnp.ndarray:
    """[B, T, F] power + [B] tuning bin -> [B, T, n_chroma] chroma (inf-normed)."""
    table = jnp.asarray(fb.chroma_fb_table(sr, n_fft, n_chroma))  # [100, C, F]
    fbk = table[tuning_bin]  # [B, C, F]
    raw = jnp.einsum("btf,bcf->btc", power, fbk, precision=HIGHEST)
    denom = jnp.max(jnp.abs(raw), axis=-1, keepdims=True)
    denom = jnp.where(denom < _F32_TINY, 1.0, denom)
    return raw / denom


@partial(jax.jit, static_argnames=("sr", "n_fft", "n_chroma", "k_peaks"))
def batched_chroma(
    power: jnp.ndarray,
    mask: jnp.ndarray,
    sr: int = 16000,
    n_fft: int = 2048,
    n_chroma: int = 12,
    k_peaks: int = 128,
) -> jnp.ndarray:
    """Power spectrogram [B,T,F] + frame mask [B,T] -> chroma [B,T,n_chroma]."""
    power = jnp.where(mask[:, :, None], power, 0.0)
    tb = estimate_tuning_bin(power, sr, n_fft, n_chroma=n_chroma, k_peaks=k_peaks)
    return chroma_from_power(power, tb, sr, n_fft, n_chroma)
