"""Fused Pallas kernel for the non-stationary spectral gate (denoise.py).

The XLA gate is HBM-bound: every stage streams [B, T, 513] f32 buffers
through HBM (measured at B=64 x 3 s clips: rfft chain 6.6 ms, associative-
scan IIR 5.2 ms (~36 passes), mask smoothing 2.8 ms, iSTFT OLA 8.7 ms —
22 ms total).  This kernel runs the ENTIRE gate per clip in VMEM:

  1. chunk DFT Z = chunks @ E on the MXU (bf16x3 == XLA HIGH) + phase
     recombination + frequency-domain periodic Hann (exact 3-tap) — the same
     shared-chunk formulation as ops/pallas_spectromel.py, at the gate's
     1024/256 geometry;
  2. |.|, then the bidirectional first-order IIR (noisereduce's
     filtfilt([b],[1,b-1]) with steady-state init) as a log-depth doubling
     scan over VMEM rows — 2*ceil(log2 T) vector passes that never touch HBM;
  3. sigmoid threshold mask; separable triangular smoothing with the
     frequency axis as one banded [K, K] MXU GEMM (bf16x3) and the time axis
     as unrolled sublane-shift FMAs;
  4. masked-spectrum iSTFT as per-slot inverse-DFT GEMMs (synthesis Hann and
     1/N folded into the host-built matrices) overlap-added into a [T+r-1,
     hop] 2-D layout via static row shifts, then multiplied by the
     reciprocal window-sum-square table.

HBM traffic collapses to the audio in (chunks) + audio out (~0.9 MB/clip);
the crop/peak-normalize tail stays in XLA (denoise.py) on the small audio
array.  Numerics: DFT/IDFT/smoothing GEMMs are 3-way bf16 splits (~f32
HIGH); the gate's slope-10 sigmoid bounds ANY two fp implementations of this
algorithm to ~2 % pointwise agreement anyway (see denoise.py notes).

Ref: the reference cleans per clip on CPU with noisereduce
(pipeline1.py:140, main.py:657); this is hot loop #1 of its preprocess.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stutter_tpu.ops import filterbanks as fb
from stutter_tpu.ops.spectral import _chunk_dft_mats, _chunk_phase_tables

_F32_TINY = float(np.finfo(np.float32).tiny)


def _split_bf16(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    hi = x.astype(np.float32).astype(jnp.bfloat16)
    lo = (x.astype(np.float32) - hi.astype(np.float32)).astype(jnp.bfloat16)
    return np.asarray(hi), np.asarray(lo)


@lru_cache(maxsize=None)
def _gate_dft_consts(n_fft: int, hop: int):
    cos_c, sin_c = _chunk_dft_mats(n_fft, hop)
    p_re, p_im = _chunk_phase_tables(n_fft, hop)
    return (*_split_bf16(cos_c), *_split_bf16(sin_c), np.asarray(p_re),
            np.asarray(p_im))


@lru_cache(maxsize=None)
def _gate_idft_consts(n_fft: int):
    """[K, n_fft] real-IDFT matrices with the synthesis Hann and 1/N folded
    in: frames[t, n] = re @ Cr + im @ Ci reproduces
    irfft(spec) * hann exactly (f64 build, bf16 split)."""
    K = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)
    k = np.arange(K, dtype=np.float64)[:, None]
    w = np.full((K, 1), 2.0)
    w[0] = w[-1] = 1.0
    hann = np.asarray(fb.hann(n_fft), np.float64)[None, :]
    ang = 2.0 * np.pi * k * n[None, :] / n_fft
    cr = (w * np.cos(ang) / n_fft) * hann
    ci = (-w * np.sin(ang) / n_fft) * hann
    return (*_split_bf16(cr.astype(np.float32)),
            *_split_bf16(ci.astype(np.float32)))


@lru_cache(maxsize=None)
def _gate_smooth_consts(cfg):
    """(Sf_hi, Sf_lo [K, K] banded frequency-smoothing matrix, t_taps tuple)
    from denoise._mask_smoothing_profiles; identity/None when disabled."""
    from stutter_tpu.denoise import _mask_smoothing_profiles

    K = cfg.n_fft // 2 + 1
    profiles = _mask_smoothing_profiles(cfg)
    if profiles is None:
        return None
    f_taps, t_taps = profiles
    pf = len(f_taps) // 2
    Sf = np.zeros((K, K), np.float32)
    for i, tap in enumerate(np.asarray(f_taps, np.float64)):
        for dst in range(K):
            src = dst + i - pf
            if 0 <= src < K:
                Sf[src, dst] += tap
    return (*_split_bf16(Sf), tuple(float(v) for v in t_taps))


@lru_cache(maxsize=None)
def _gate_winv(t_frames: int, n_fft: int, hop: int) -> np.ndarray:
    """Reciprocal window-sum-square in the kernel's [T+r-1, hop] OLA layout
    (librosa iSTFT semantics: bins below f32 tiny divide by 1)."""
    from stutter_tpu.denoise import _window_sumsquare

    wss = _window_sumsquare(t_frames, n_fft, hop).astype(np.float64)
    denom = np.where(wss > np.finfo(np.float32).tiny, wss, 1.0)
    return (1.0 / denom).reshape(-1, hop).astype(np.float32)


def _dot3(a, b_hi_ref, b_lo_ref, sl=None):
    """a [M, K] f32 x host-split const -> f32 HIGH-equivalent product."""
    dot = partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b_hi_ref[:, :] if sl is None else b_hi_ref[:, sl]
    b_lo = b_lo_ref[:, :] if sl is None else b_lo_ref[:, sl]
    return dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)


def _affine_scan(a, u, n: int, reverse: bool):
    """Inclusive scan of y[t] = a[t]*y[t±1] + u[t] by log-depth doubling over
    VMEM rows (the XLA version's associative_scan costs one HBM pass per
    level per operand; here every level is a VMEM-resident shift+FMA)."""
    K = a.shape[1]
    s = 1
    while s < n:
        ones = jnp.ones((s, K), jnp.float32)
        zeros = jnp.zeros((s, K), jnp.float32)
        if not reverse:
            a_sh = jnp.concatenate([ones, a[:-s]], axis=0)
            u_sh = jnp.concatenate([zeros, u[:-s]], axis=0)
        else:
            a_sh = jnp.concatenate([a[s:], ones], axis=0)
            u_sh = jnp.concatenate([u[s:], zeros], axis=0)
        u = a * u_sh + u
        a = a * a_sh
        s *= 2
    return u


def _gate_kernel(
    ratio: int,
    t_max: int,
    hop: int,
    b: float,
    thresh: float,
    slope: float,
    prop: float,
    t_taps: tuple | None,
    has_freq_smooth: bool,
    *refs,
):
    it = iter(refs)
    (chunks_ref, ec_hi, ec_lo, es_hi, es_lo, pre_ref, pim_ref) = (
        next(it) for _ in range(7)
    )
    if has_freq_smooth:
        sf_hi, sf_lo = next(it), next(it)
    cr_hi, cr_lo, ci_hi, ci_lo, winv_ref = (next(it) for _ in range(5))
    out_ref = next(it)
    K = ec_hi.shape[-1]
    dot = partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rows = jax.lax.broadcasted_iota(jnp.int32, (t_max, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t_max, K), 1)

    # ---- chunk DFT (MXU, bf16x3) + phase recombination + 3-tap Hann ----
    ch = chunks_ref[0, :, :]
    ch_hi = ch.astype(jnp.bfloat16)
    ch_lo = (ch - ch_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def dft3(hi_m, lo_m):
        return dot(ch_hi, hi_m[:, :]) + dot(ch_hi, lo_m[:, :]) + dot(ch_lo, hi_m[:, :])

    zre = dft3(ec_hi, ec_lo)  # [C, K]
    zim = dft3(es_hi, es_lo)
    xr = jnp.zeros((t_max, K), jnp.float32)
    xi = jnp.zeros((t_max, K), jnp.float32)
    for c in range(ratio):
        zr = zre[c : c + t_max, :]
        zi = zim[c : c + t_max, :]
        fr = pre_ref[c, :][None, :]
        fi = pim_ref[c, :][None, :]
        xr = xr + fr * zr - fi * zi
        xi = xi + fr * zi + fi * zr

    xr_m = jnp.concatenate([xr[:, :1], xr[:, :-1]], axis=1)
    xi_m = jnp.concatenate([xi[:, :1], xi[:, :-1]], axis=1)
    xr_p = jnp.concatenate([xr[:, 1:], xr[:, -1:]], axis=1)
    xi_p = jnp.concatenate([xi[:, 1:], xi[:, -1:]], axis=1)
    yr = 0.5 * xr - 0.25 * (xr_m + xr_p)
    yi = 0.5 * xi - 0.25 * (xi_m + xi_p)
    yr = jnp.where(cols == 0, 0.5 * xr[:, :1] - 0.5 * xr[:, 1:2], yr)
    yi = jnp.where(cols == 0, 0.5 * xi[:, :1], yi)
    yr = jnp.where(cols == K - 1, 0.5 * xr[:, K - 1 : K] - 0.5 * xr[:, K - 2 : K - 1], yr)
    yi = jnp.where(cols == K - 1, 0.5 * xi[:, K - 1 : K], yi)

    # ---- bidirectional IIR smoothing of |spec| (log-depth, in VMEM) ----
    mag = jnp.sqrt(yr * yr + yi * yi)
    a0 = jnp.where(rows == 0, 0.0, 1.0 - b) * jnp.ones((t_max, K), jnp.float32)
    u0 = jnp.where(rows == 0, mag, b * mag)
    fwd = _affine_scan(a0, u0, t_max, reverse=False)
    a1 = jnp.where(rows == t_max - 1, 0.0, 1.0 - b) * jnp.ones((t_max, K), jnp.float32)
    u1 = jnp.where(rows == t_max - 1, fwd, b * fwd)
    smooth = _affine_scan(a1, u1, t_max, reverse=True)

    # ---- sigmoid gate + separable triangular smoothing ----
    above = jnp.where(
        smooth > 0.0, (mag - smooth) / jnp.where(smooth > 0.0, smooth, 1.0), 0.0
    )
    mask = jax.nn.sigmoid((above - thresh) * slope)
    if has_freq_smooth:
        mask = _dot3(mask, sf_hi, sf_lo)  # banded [K, K] on the MXU
    if t_taps is not None:
        kt = len(t_taps)
        pt = kt // 2
        acc = jnp.zeros((t_max, K), jnp.float32)
        zrow = jnp.zeros((1, K), jnp.float32)
        for i, tap in enumerate(t_taps):
            s = i - pt  # out[t] += tap * mask[t + s]
            if s == 0:
                sh = mask
            elif s > 0:
                sh = jnp.concatenate(
                    [mask[s:], jnp.concatenate([zrow] * s, axis=0)], axis=0
                )
            else:
                sh = jnp.concatenate(
                    [jnp.concatenate([zrow] * (-s), axis=0), mask[:s]], axis=0
                )
            acc = acc + tap * sh
        mask = acc
    mask = mask * prop + (1.0 - prop)

    yr = yr * mask
    yi = yi * mask

    # ---- iSTFT per hop-slot (IDFT GEMMs with Hann/N folded in) + OLA ----
    # OLA layout: out[r, j] = sum_s frames[r - s, s*hop + j]; frame rows are
    # shifted down by their slot index and summed — no flatten needed.
    n_rows = t_max + ratio - 1
    out = jnp.zeros((n_rows, hop), jnp.float32)
    for s in range(ratio):
        sl = slice(s * hop, (s + 1) * hop)
        ft = _dot3(yr, cr_hi, cr_lo, sl) + _dot3(yi, ci_hi, ci_lo, sl)
        top = jnp.zeros((s, hop), jnp.float32)
        bot = jnp.zeros((ratio - 1 - s, hop), jnp.float32)
        out = out + jnp.concatenate(
            [x for x in (top, ft, bot) if x.shape[0] > 0], axis=0
        )
    out_ref[0, :, :] = out * winv_ref[:, :]


@partial(jax.jit, static_argnames=("n_fft", "hop", "cfg", "interpret"))
def spectral_gate_pallas(
    chunks: jnp.ndarray,  # [B, C, hop] hop-chunked padded audio
    n_fft: int,
    hop: int,
    cfg,  # DenoiseConfig (frozen dataclass, hashable)
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, C, hop] -> OLA output [B, T+ratio-1, hop] == the XLA gate's
    iSTFT/wss result before cropping (denoise.denoise_batch does the chunking
    and the crop/peak-normalize tail)."""
    B, C, hop_in = chunks.shape
    assert hop_in == hop
    ratio = n_fft // hop
    t_max = C - ratio + 1
    K = n_fft // 2 + 1

    ec_hi, ec_lo, es_hi, es_lo, p_re, p_im = _gate_dft_consts(n_fft, hop)
    cr_hi, cr_lo, ci_hi, ci_lo = _gate_idft_consts(n_fft)
    sm = _gate_smooth_consts(cfg)
    winv = _gate_winv(t_max, n_fft, hop)

    t_frames = cfg.time_constant_s * cfg.sample_rate / float(hop)
    b = float((np.sqrt(1 + 4 * t_frames**2) - 1) / (2 * t_frames**2))

    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, C, hop), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        const((hop, K)), const((hop, K)), const((hop, K)), const((hop, K)),
        const((ratio, K)), const((ratio, K)),
    ]
    operands = [
        chunks, jnp.asarray(ec_hi), jnp.asarray(ec_lo),
        jnp.asarray(es_hi), jnp.asarray(es_lo),
        jnp.asarray(p_re), jnp.asarray(p_im),
    ]
    if sm is not None:
        sf_hi, sf_lo, t_taps = sm
        in_specs += [const((K, K)), const((K, K))]
        operands += [jnp.asarray(sf_hi), jnp.asarray(sf_lo)]
    else:
        t_taps = None
    in_specs += [const((K, n_fft))] * 4 + [const(winv.shape)]
    operands += [
        jnp.asarray(cr_hi), jnp.asarray(cr_lo),
        jnp.asarray(ci_hi), jnp.asarray(ci_lo), jnp.asarray(winv),
    ]
    n_rows = t_max + ratio - 1
    return pl.pallas_call(
        partial(
            _gate_kernel, ratio, t_max, hop, b,
            float(cfg.thresh_n_mult_nonstationary),
            float(cfg.sigmoid_slope_nonstationary),
            float(cfg.prop_decrease),
            t_taps, sm is not None,
        ),
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, n_rows, hop), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_rows, hop), jnp.float32),
        interpret=interpret,
    )(*operands)
