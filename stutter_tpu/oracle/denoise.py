"""NumPy reference implementation of the non-stationary spectral gate.

Independent CPU implementation of the same algorithm as stutter_tpu.denoise
(noisereduce.SpectralGateNonStationary semantics): used to cross-validate the
batched JAX path and as the CPU baseline for denoise throughput comparisons.

Ground truth: the committed clear_audio WAVs are REAL noisereduce output
(ref pipeline1.py:126-146).  With built-in mp3 decode (io/mp3.py) the full
chain mp3 -> gate -> waveform is golden-validated corpus-wide against them
(docs/parity/README.md "Denoiser golden parade",
tests/test_denoise_golden.py); agreement is bounded by the upstream decoder
delta (mpg123 vs the author's librosa stack), not by the gate.
"""

from __future__ import annotations

import numpy as np
import scipy.signal

from stutter_tpu.config import DenoiseConfig
from stutter_tpu.oracle import frontend as OF

PAD = 30000


def denoise_clip(y: np.ndarray, cfg: DenoiseConfig = DenoiseConfig()) -> np.ndarray:
    """Denoise one clip; returns a peak-normalized array of the same length."""
    n = len(y)
    x = np.pad(y.astype(np.float32), PAD)

    spec = OF.stft(x, n_fft=cfg.n_fft, hop_length=cfg.hop_length)  # [F, T]
    mag = np.abs(spec)

    t_frames = cfg.time_constant_s * cfg.sample_rate / float(cfg.hop_length)
    b = (np.sqrt(1 + 4 * t_frames**2) - 1) / (2 * t_frames**2)
    smooth = scipy.signal.filtfilt([b], [1, b - 1], mag.astype(np.float64), axis=-1,
                                   padtype=None)

    with np.errstate(divide="ignore", invalid="ignore"):
        above = np.where(smooth > 0, (mag - smooth) / np.where(smooth > 0, smooth, 1.0), 0.0)
    mask = 1.0 / (1.0 + np.exp(-(above - cfg.thresh_n_mult_nonstationary)
                               * cfg.sigmoid_slope_nonstationary))

    n_grad_freq = int(cfg.freq_mask_smooth_hz / (cfg.sample_rate / (cfg.n_fft / 2)))
    n_grad_time = int(cfg.time_mask_smooth_ms / ((cfg.hop_length / cfg.sample_rate) * 1000))
    if not (n_grad_freq == 1 and n_grad_time == 1):
        f_prof = np.concatenate(
            [np.linspace(0, 1, n_grad_freq + 1, endpoint=False), np.linspace(1, 0, n_grad_freq + 2)]
        )[1:-1]
        t_prof = np.concatenate(
            [np.linspace(0, 1, n_grad_time + 1, endpoint=False), np.linspace(1, 0, n_grad_time + 2)]
        )[1:-1]
        kernel = np.outer(f_prof, t_prof)
        kernel /= kernel.sum()
        mask = scipy.signal.fftconvolve(mask, kernel, mode="same")

    mask = mask * cfg.prop_decrease + (1.0 - cfg.prop_decrease)
    spec_dn = spec * mask

    # librosa-style iSTFT: irfft, window, overlap-add, window-sumsquare norm
    frames_t = np.fft.irfft(spec_dn, n=cfg.n_fft, axis=0) * OF.hann_window(cfg.n_fft)[:, None]
    T = spec.shape[1]
    out_len = (T - 1) * cfg.hop_length + cfg.n_fft
    ola = np.zeros(out_len)
    wss = np.zeros(out_len)
    w2 = OF.hann_window(cfg.n_fft).astype(np.float64) ** 2
    for t in range(T):
        ola[t * cfg.hop_length : t * cfg.hop_length + cfg.n_fft] += frames_t[:, t]
        wss[t * cfg.hop_length : t * cfg.hop_length + cfg.n_fft] += w2
    ola = ola / np.where(wss > np.finfo(np.float32).tiny, wss, 1.0)

    # OLA sample m corresponds to x[m - n_fft//2]; crop the chunk pad
    start = cfg.n_fft // 2 + PAD
    out = ola[start : start + n].astype(np.float32)

    peak = np.abs(out).max()
    if peak > np.finfo(np.float32).tiny:
        out = out / peak
    return out
