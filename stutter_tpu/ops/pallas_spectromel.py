"""Fused Pallas kernel: chunk-DFT recombination + Hann + power + mel (+tuning).

This is the power->mel VMEM fusion (the round-1 plan's stated next step, now
built on the shared-chunk DFT formulation of ops.spectral):

  1. The chunk DFT Z = chunks @ E — a [C, hop] x [hop, 2K] GEMM with ratio x
     fewer FLOPs than the framed [B*T, n_fft] GEMM (the reference's
     librosa.stft hot loop, pipeline1.py:216, does the full O(n_fft) work per
     frame on CPU) — runs INSIDE the kernel on the MXU (bf16x3 split, ==
     XLA's HIGH), so Z never exists in HBM (~420 MB of round-trip at the
     bench shape); the kernel's input is the raw hop-chunked audio.
  2. The kernel then produces the outputs the 149/334 pipelines need — the
     frame-masked power spectrogram (chroma/piptrack input) and the linear
     mel spectrogram (MFCC input) — in one pass: phase recombination across
     the ratio chunk slots, the periodic Hann applied in the frequency
     domain (exact 3-tap spectrum with conjugate-symmetric k=0/Nyquist
     edges), |.|^2, per-clip frame masking, and the mel contraction on the
     MXU (bf16x3 split precision).
  3. With with_tuning=True it ALSO runs the entire librosa tuning estimation
     per clip while the power spectrogram is still in VMEM: piptrack peak
     candidates (parabolic interpolation + median-magnitude threshold), the
     exact radix-select median, the 100-bin pitch-residual histogram, and
     its argmax — emitting one int32 tuning bin per clip.  In XLA this chain
     (ops/chroma.estimate_tuning_bin) costs ~15 HBM passes over [B, T, band]
     buffers plus 64 passes of the radix median (~6.5 ms/batch measured at
     the bench shape); in VMEM it is compute-bound and near-free.

  In pure XLA the same chain costs ~8 full HBM passes over [B, T, K] f32
  buffers (measured: the chunked path's elementwise tail alone outweighs its
  GEMM saving); here X/Y/power intermediates never leave VMEM.
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
_VMEM_CAP_BYTES = 8 << 20  # per-program working-set cap for the g_clips auto-tune


def _split_bf16(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    hi = x.astype(np.float32).astype(jnp.bfloat16)
    lo = (x.astype(np.float32) - hi.astype(np.float32)).astype(jnp.bfloat16)
    return np.asarray(hi), np.asarray(lo)


_TUNE_THRESHOLD = 0.1  # librosa piptrack default
_TUNE_BINS = 100  # ceil(1 / resolution), resolution 0.01


def _candidates_of(power, rtab_ref, gpack_ref, lo: int, hi: int, n_chroma: int,
                   wslot: int):
    """Per-clip piptrack candidates, 4->2 compacted, on a VMEM power spec.

    power: [t_max, K] frame-masked power -> ((mag_s, idx_s) per compaction
    slot, each [t_max, wslot]: mag 0 at empty slots, idx f32 residual
    histogram bin 0..99 at candidates, -1 elsewhere).  Pure vector ops plus
    small pack GEMMs — the per-clip serial parts of the tuning estimate
    (median + histogram) stay in XLA (ops/chroma.tuning_bin_from_candidates):
    inside the kernel they would serialize across the sequential grid
    (measured 7.4 ms/batch of pure loop-latency at B=256, g=2).

    Compaction: local maxima are never adjacent, so any 4 consecutive bins
    hold <= 2 candidates and groupwise first/second selection is exact (the
    same property ops/chroma.piptrack_candidates exploits).  The pack onto
    the compacted grid rides the MXU: out_s = (x * sel_s) @ G with
    G[k, k//4] = 1 — every output element sums <= 1 nonzero product against
    an exactly-representable 0/1 matrix, so a 3-way bf16 split of the
    magnitudes reproduces f32 to ~2^-24 and the (idx+2) pack (integers
    <= 101) is exact in one bf16 GEMM.  Emitting compacted arrays halves the
    kernel's candidate HBM writes and removes the XLA tail's compaction
    passes (measured ~2.5 ms/batch at B=256).

    Numerics identical to ops/chroma (piptrack_candidates +
    estimate_tuning_bin): parabolic interpolation, full-spectrum threshold,
    f64 host residual table + log2(1+shift/bin) series.
    """
    band = hi - lo
    t_max = power.shape[0]
    Sb = power[:, lo:hi]
    hm = power[:, lo - 1 : hi - 1]
    hp = power[:, lo + 1 : hi + 1]
    ref = _TUNE_THRESHOLD * jnp.max(power, axis=1, keepdims=True)

    avg = 0.5 * (hp - hm)
    den = 2.0 * Sb - hp - hm
    shift = avg / (den + (jnp.abs(den) < _F32_TINY))
    dskew = 0.5 * avg * shift

    gc = Sb * (Sb > ref)
    cand = (gc > hm * (hm > ref)) & (gc >= hp * (hp > ref))
    mags = jnp.where(cand, Sb + dskew, 0.0)
    binf = (
        jax.lax.broadcasted_iota(jnp.int32, (t_max, band), 1).astype(jnp.float32)
        + float(lo)
    )  # tpu.iota only produces integers; cast after
    candp = cand & ((binf + shift) > 0)

    # pitch residual: f64 host table at the bin + log2(1+shift/bin) series
    rb = rtab_ref[0, lo:hi][None, :]
    uu = shift / jnp.maximum(binf, 1.0)
    ln2 = float(np.log(2.0))
    poly = uu * (1.0 + uu * (-1.0 / 2 + uu * (1.0 / 3 + uu * (-1.0 / 4 + uu * (
        1.0 / 5 + uu * (-1.0 / 6 + uu * (1.0 / 7 + uu * (-1.0 / 8))))))))
    residual = jnp.mod(rb + (n_chroma / ln2) * poly, 1.0)
    residual = jnp.where(residual >= 0.5, residual - 1.0, residual)
    idx = jnp.clip(jnp.floor((residual + 0.5) * _TUNE_BINS), 0, _TUNE_BINS - 1)

    # ---- exact 4->2 compaction + MXU pack ----
    # groupwise exclusive candidate count via 3 lane shifts + position masks
    magv = jnp.where(candp, mags, 0.0)
    cf = candp.astype(jnp.float32)
    z1 = jnp.zeros((t_max, 1), jnp.float32)
    s1 = jnp.concatenate([z1, cf[:, :-1]], axis=1)
    s2 = jnp.concatenate([z1, z1, cf[:, :-2]], axis=1)
    s3 = jnp.concatenate([z1, z1, z1, cf[:, :-3]], axis=1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (t_max, band), 1) % 4
    cs = (
        s1 * (pos >= 1).astype(jnp.float32)
        + s2 * (pos >= 2).astype(jnp.float32)
        + s3 * (pos >= 3).astype(jnp.float32)
    )
    first = candp & (cs < 0.5)
    second = candp & (cs > 0.5) & (cs < 1.5)

    dot = partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # One pack GEMM set per slot (Mosaic cannot concat at unaligned offsets,
    # so slots are returned separately and stored to aligned output halves).
    G = gpack_ref[:, :]

    def pack(sel):
        m = jnp.where(sel, magv, 0.0)
        m_a = m.astype(jnp.bfloat16)
        r_a = m - m_a.astype(jnp.float32)
        m_b = r_a.astype(jnp.bfloat16)
        m_c = (r_a - m_b.astype(jnp.float32)).astype(jnp.bfloat16)
        mag_s = dot(m_a, G) + dot(m_b, G) + dot(m_c, G)  # [T, wslot]
        iv = jnp.where(sel, idx + 2.0, 0.0).astype(jnp.bfloat16)
        pidx = dot(iv, G)
        idx_s = jnp.where(pidx > 0.5, pidx - 2.0, -1.0)
        return mag_s, idx_s

    return pack(first), pack(second)


def _spectromel_kernel(
    ratio: int,
    t_max: int,
    g: int,
    tune_args: tuple | None,
    *refs,
):
    """chunks [g, C, hop] -> masked power [g, T, K] + mel [g, T, M]
    (+ candidate mags/idx [g, T, w_pad] when tune_args = (lo, hi, n_chroma));
    the chunk DFT Z = chunks @ E runs in-kernel so Z never touches HBM."""
    if tune_args is not None:
        (chunks_ref, ec_hi_ref, ec_lo_ref, es_hi_ref, es_lo_ref,
         pre_ref, pim_ref, mel_hi_ref, mel_lo_ref, rtab_ref, gpack_ref,
         nvalid_ref, power_ref, mel_ref, mags_ref, idxm_ref) = refs
    else:
        (chunks_ref, ec_hi_ref, ec_lo_ref, es_hi_ref, es_lo_ref,
         pre_ref, pim_ref, mel_hi_ref, mel_lo_ref,
         nvalid_ref, power_ref, mel_ref) = refs
    K = ec_hi_ref.shape[-1]
    dot = partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rows = jax.lax.broadcasted_iota(jnp.int32, (t_max, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t_max, K), 1)
    for gi in range(g):
        # chunk DFT on the MXU, bf16x3 split precision (== XLA's HIGH): the
        # Z = chunks @ E GEMM runs here so Z never round-trips through HBM
        # (at the bench shape that round-trip alone is ~420 MB / ~0.5 ms).
        ch = chunks_ref[gi, :, :]
        ch_hi = ch.astype(jnp.bfloat16)
        ch_lo = (ch - ch_hi.astype(jnp.float32)).astype(jnp.bfloat16)

        def dft3(hi_m, lo_m):
            return dot(ch_hi, hi_m[:, :]) + dot(ch_hi, lo_m[:, :]) + dot(ch_lo, hi_m[:, :])

        zre = dft3(ec_hi_ref, ec_lo_ref)  # [C, K]
        zim = dft3(es_hi_ref, es_lo_ref)

        # phase recombination over the ratio chunk slots (slices are static)
        xr = jnp.zeros((t_max, K), jnp.float32)
        xi = jnp.zeros((t_max, K), jnp.float32)
        for c in range(ratio):
            zr = zre[c : c + t_max, :]
            zi = zim[c : c + t_max, :]
            fr = pre_ref[c, :][None, :]
            fi = pim_ref[c, :][None, :]
            xr = xr + fr * zr - fi * zi
            xi = xi + fr * zi + fi * zr

        # periodic Hann via its exact 3-tap frequency response
        xr_m = jnp.concatenate([xr[:, :1], xr[:, :-1]], axis=1)
        xi_m = jnp.concatenate([xi[:, :1], xi[:, :-1]], axis=1)
        xr_p = jnp.concatenate([xr[:, 1:], xr[:, -1:]], axis=1)
        xi_p = jnp.concatenate([xi[:, 1:], xi[:, -1:]], axis=1)
        yr = 0.5 * xr - 0.25 * (xr_m + xr_p)
        yi = 0.5 * xi - 0.25 * (xi_m + xi_p)
        # conjugate-symmetric edges: k=0 uses X[-1]=conj(X[1]), Nyquist uses
        # X[K]=conj(X[K-2]); both collapse to 0.5*X[k] - 0.5*Re-part terms.
        xr1 = xr[:, 1:2]
        yr = jnp.where(cols == 0, 0.5 * xr[:, :1] - 0.5 * xr1, yr)
        yi = jnp.where(cols == 0, 0.5 * xi[:, :1], yi)
        xrn = xr[:, K - 2 : K - 1]
        yr = jnp.where(cols == K - 1, 0.5 * xr[:, K - 1 : K] - 0.5 * xrn, yr)
        yi = jnp.where(cols == K - 1, 0.5 * xi[:, K - 1 : K], yi)

        power = yr * yr + yi * yi
        power = jnp.where(rows < nvalid_ref[pl.program_id(0) * g + gi, 0], power, 0.0)
        power_ref[gi, :, :] = power

        # mel contraction on the MXU, bf16x3 split precision (~f32 quality)
        p_hi = power.astype(jnp.bfloat16)
        p_lo = (power - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        mel_ref[gi, :, :] = (
            dot(p_hi, mel_hi_ref[:, :])
            + dot(p_hi, mel_lo_ref[:, :])
            + dot(p_lo, mel_hi_ref[:, :])
        )

        if tune_args is not None:
            lo, hi, n_chroma = tune_args
            wslot = mags_ref.shape[-1] // 2
            (m0, ix0), (m1, ix1) = _candidates_of(
                power, rtab_ref, gpack_ref, lo, hi, n_chroma, wslot
            )
            mags_ref[gi, :, :wslot] = m0
            mags_ref[gi, :, wslot:] = m1
            idxm_ref[gi, :, :wslot] = ix0
            idxm_ref[gi, :, wslot:] = ix1


@lru_cache(maxsize=None)
def _mel_mats_bf16(sr: int, n_fft: int, n_mels: int):
    m = np.asarray(fb.mel_fb(sr, n_fft, n_mels), np.float32).T  # [K, M]
    return _split_bf16(m)


@lru_cache(maxsize=None)
def _chunk_dft_mats_bf16(n_fft: int, hop: int):
    """(cos_hi, cos_lo, sin_hi, sin_lo) bf16 splits of the chunk-DFT matrices."""
    cos_c, sin_c = _chunk_dft_mats(n_fft, hop)
    return (*_split_bf16(cos_c), *_split_bf16(sin_c))


@lru_cache(maxsize=None)
def _tuning_consts(sr: int, n_fft: int, n_chroma: int):
    """(lo, hi) piptrack band range, [1, K] f64-accurate residual table, and
    the [band, wslot] bf16 group-pack matrix G[k, k//4] = 1 (lane-aligned)."""
    from stutter_tpu.ops.chroma import _band_range, _residual_table

    K = n_fft // 2 + 1
    lo, hi = _band_range(sr, n_fft, 150.0, 4000.0)
    rtab = _residual_table(sr, n_fft, K, n_chroma).reshape(1, K)
    band = hi - lo
    n_groups = -(-band // 4)
    wslot = -(-n_groups // 128) * 128
    gpack = np.zeros((band, wslot), np.float32)
    gpack[np.arange(band), np.arange(band) // 4] = 1.0
    return lo, hi, rtab, gpack.astype(jnp.bfloat16)


@partial(
    jax.jit,
    static_argnames=(
        "sr", "n_fft", "hop_length", "n_mels", "n_chroma", "g_clips",
        "with_tuning", "interpret",
    ),
)
def spectromel_pallas(
    audio: jnp.ndarray,
    lengths: jnp.ndarray,
    sr: int = 16000,
    n_fft: int = 2048,
    hop_length: int = 512,
    n_mels: int = 128,
    n_chroma: int = 12,
    g_clips: int = 4,
    with_tuning: bool = False,
    interpret: bool = False,
):
    """[B, N] zero-padded audio + lengths -> (power [B,T,K] frame-masked,
    mel [B,T,n_mels]) matching power_spectrogram(method='chunked') + masking +
    the mel contraction of mel_power_to_db.  With with_tuning=True, also
    returns tuning_bin [B] int32 == ops.chroma.estimate_tuning_bin(power).
    """
    B, N = audio.shape
    ratio = n_fft // hop_length
    t_max = N // hop_length + 1
    K = n_fft // 2 + 1
    if with_tuning:
        lo, hi, rtab, gpack = _tuning_consts(sr, n_fft, n_chroma)
        tune_args = (lo, hi, n_chroma)
        w_pad = 2 * gpack.shape[1]  # two compacted slots, lane-aligned
    else:
        tune_args = None
    # VMEM budget: Z block (2 x C x K f32) + power/temps (~8 x T x K f32) per
    # clip (+ ~8 x T x band f32 tuning temps); cap the per-program working
    # set (default ~8 MB) so long buckets (10 s -> T=321) still compile.
    per_clip = ((t_max + ratio) * K * 2 + t_max * K * 8) * 4
    if with_tuning:
        # candidate temps + the [2T, band] pack stacks and their bf16 splits
        per_clip += t_max * (hi - lo) * 12 * 4
    g_clips = max(1, min(g_clips, _VMEM_CAP_BYTES // per_clip))
    while B % g_clips:
        g_clips -= 1

    padded = jnp.pad(audio, ((0, 0), (n_fft // 2, n_fft // 2)))
    chunks = padded.reshape(B, -1, hop_length)  # [B, C, hop]
    C = chunks.shape[1]
    ec_hi, ec_lo, es_hi, es_lo = _chunk_dft_mats_bf16(n_fft, hop_length)

    p_re, p_im = _chunk_phase_tables(n_fft, hop_length)
    mel_hi, mel_lo = _mel_mats_bf16(sr, n_fft, n_mels)
    n_valid = (1 + lengths // hop_length).astype(jnp.int32)[:, None]  # [B, 1]

    const_specs = [
        pl.BlockSpec((hop_length, K), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((hop_length, K), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((hop_length, K), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((hop_length, K), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((ratio, K), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((ratio, K), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, n_mels), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, n_mels), lambda b: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [
        chunks, jnp.asarray(ec_hi), jnp.asarray(ec_lo),
        jnp.asarray(es_hi), jnp.asarray(es_lo),
        jnp.asarray(p_re), jnp.asarray(p_im),
        jnp.asarray(mel_hi), jnp.asarray(mel_lo),
    ]
    out_specs = [
        pl.BlockSpec((g_clips, t_max, K), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((g_clips, t_max, n_mels), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, t_max, K), jnp.float32),
        jax.ShapeDtypeStruct((B, t_max, n_mels), jnp.float32),
    ]
    if with_tuning:
        const_specs.append(
            pl.BlockSpec((1, K), lambda b: (0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(jnp.asarray(rtab))
        const_specs.append(
            pl.BlockSpec(gpack.shape, lambda b: (0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(jnp.asarray(gpack))
        for _ in range(2):  # candidate mags + residual-bin index
            out_specs.append(
                pl.BlockSpec(
                    (g_clips, t_max, w_pad), lambda b: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
            out_shape.append(jax.ShapeDtypeStruct((B, t_max, w_pad), jnp.float32))

    outs = pl.pallas_call(
        partial(_spectromel_kernel, ratio, t_max, g_clips, tune_args),
        grid=(B // g_clips,),
        in_specs=[
            pl.BlockSpec(
                (g_clips, C, hop_length), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            *const_specs,
            pl.BlockSpec((B, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(*operands, n_valid)
    if with_tuning:
        from stutter_tpu.ops.chroma import tuning_bin_from_candidates

        power, mel, mags, idxm = outs
        return power, mel, tuning_bin_from_candidates(mags, idxm, compacted=True)
    return outs
