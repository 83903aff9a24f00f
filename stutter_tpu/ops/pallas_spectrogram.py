"""Fused Pallas spectrogram kernel: frame + window + DFT + |.|^2 in VMEM.

The XLA path (ops.spectral.power_spectrogram) materializes the framed signal
[B, T, n_fft] in HBM (~200 MB/batch at B=256) before the DFT contraction.
This kernel keeps each clip (192 KB) and its framed matrix entirely in VMEM:
frames are built once per clip into a bf16 hi/lo scratch (grid iterates
frequency tiles fastest, so the build runs only at f == 0), then contracted
against frequency-tiles of the window-folded DFT matrices on the MXU — the
frame tensor never exists in HBM.

Numerics: bf16x3 split-precision matmuls (the Precision.HIGH algorithm,
written out manually because Pallas dots only accept DEFAULT/HIGHEST):
x @ W ~= xh@Wh + xh@Wl + xl@Wh with f32 accumulation, where xh = bf16(x),
xl = bf16(x - xh).  Feature-level golden parity is equivalent to the XLA
matmul path (~1e-5 relative on the power spectrogram).

Status: measured 8.2 ms vs 5.4 ms for the XLA matmul path at B=256/3s on
v5e — XLA's lowering fuses the whole batch into one large GEMM, which beats
this per-clip formulation; the kernel is retained as a correct, tested
building block for deeper fusion (power->mel accumulation in VMEM) rather
than as the default spectrogram path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stutter_tpu.ops.spectral import _windowed_dft_mats


def _split_bf16(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    hi = x.astype(np.float32).astype(jnp.bfloat16)
    lo = (x.astype(np.float32) - hi.astype(np.float32)).astype(jnp.bfloat16)
    return np.asarray(hi), np.asarray(lo)


def _spectrogram_kernel(
    n_fft,
    hop,
    t_pad,
    g_clips,
    audio_ref,
    ch_ref,
    cl_ref,
    sh_ref,
    sl_ref,
    out_ref,
    fh_scratch,
    fl_scratch,
):
    """audio: [G,1,N_pad]; c/s hi+lo: [n_fft, f_tile]; out: [G, t_pad, f_tile];
    scratch: [G*t_pad, n_fft] bf16 x2 (persistent across the f grid axis)."""

    @pl.when(pl.program_id(1) == 0)
    def _build_frames():
        for g in range(g_clips):
            for t in range(t_pad):
                row = audio_ref[g, 0, pl.ds(t * hop, n_fft)]
                hi = row.astype(jnp.bfloat16)
                fh_scratch[g * t_pad + t, :] = hi
                fl_scratch[g * t_pad + t, :] = (row - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    d = partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    fh = fh_scratch[:, :]
    fl = fl_scratch[:, :]
    re = d(fh, ch_ref[:, :]) + d(fh, cl_ref[:, :]) + d(fl, ch_ref[:, :])
    im = d(fh, sh_ref[:, :]) + d(fh, sl_ref[:, :]) + d(fl, sh_ref[:, :])
    power = re * re + im * im
    tp = power.shape[0] // g_clips
    for g in range(g_clips):
        out_ref[g, :, :] = power[g * tp : (g + 1) * tp, :]


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "f_tile", "g_clips", "interpret"))
def power_spectrogram_pallas(
    audio: jnp.ndarray,
    n_fft: int = 2048,
    hop_length: int = 512,
    f_tile: int = 256,
    g_clips: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, N] zero-padded audio -> [B, T, n_fft//2+1] power spectrogram.

    Matches ops.spectral.power_spectrogram(method='matmul') semantics
    (center=True, constant padding, periodic Hann folded into the DFT).
    """
    B, N = audio.shape
    if N % hop_length:
        raise ValueError(f"N={N} must be a multiple of hop={hop_length}")
    while B % g_clips:
        g_clips //= 2
    t_max = N // hop_length + 1
    t_pad = -(-t_max // 16) * 16  # bf16 sublane tile
    n_freqs = n_fft // 2 + 1
    f_pad = -(-n_freqs // f_tile) * f_tile

    cos_m, sin_m = _windowed_dft_mats(n_fft, n_fft)
    mats = []
    for m in (cos_m, sin_m):
        mp = np.zeros((n_fft, f_pad), np.float32)
        mp[:, :n_freqs] = m
        mats += list(_split_bf16(mp))

    # extra tail so frame t_pad-1 stays in range
    tail = (t_pad - 1) * hop_length + n_fft - (N + n_fft)
    padded = jnp.pad(audio, ((0, 0), (n_fft // 2, n_fft // 2 + max(tail, 0))))[:, None, :]

    out = pl.pallas_call(
        partial(_spectrogram_kernel, n_fft, hop_length, t_pad, g_clips),
        grid=(B // g_clips, f_pad // f_tile),
        in_specs=[
            pl.BlockSpec((g_clips, 1, padded.shape[2]), lambda b, f: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, f_tile), lambda b, f: (0, f), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, f_tile), lambda b, f: (0, f), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, f_tile), lambda b, f: (0, f), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, f_tile), lambda b, f: (0, f), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (g_clips, t_pad, f_tile), lambda b, f: (b, 0, f), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, t_pad, f_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((g_clips * t_pad, n_fft), jnp.bfloat16),
            pltpu.VMEM((g_clips * t_pad, n_fft), jnp.bfloat16),
        ],
        interpret=interpret,
    )(padded, *[jnp.asarray(m) for m in mats])
    return out[:, :t_max, :n_freqs]
