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
    stat_args: tuple | None,
    *refs,
):
    """chunks [g, C, hop] -> masked power [g, T, K] + mel [g, T, M] (or, with
    stat_args = (lasts,), the fused MFCC/delta stats [g, 6, n_mfcc] instead
    of mel) + candidate mags/idx [g, T, w_pad] when tune_args = (lo, hi,
    n_chroma); the chunk DFT Z = chunks @ E runs in-kernel so Z never
    touches HBM."""
    it = iter(refs)
    (chunks_ref, ec_hi_ref, ec_lo_ref, es_hi_ref, es_lo_ref,
     pre_ref, pim_ref, mel_hi_ref, mel_lo_ref) = (next(it) for _ in range(9))
    if tune_args is not None:
        rtab_ref, gpack_ref = next(it), next(it)
    if stat_args is not None:
        dct_hi_ref, dct_lo_ref = next(it), next(it)
        sg_refs = ((next(it), next(it)), (next(it), next(it)))
    nvalid_ref = next(it)
    power_ref = next(it)
    mel_ref = next(it)  # [g, T, M] mel, or [g, 6, n_mfcc] stats
    if tune_args is not None:
        mags_ref, idxm_ref = next(it), next(it)
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

        nv = nvalid_ref[pl.program_id(0) * g + gi, 0]
        power = yr * yr + yi * yi
        power = jnp.where(rows < nv, power, 0.0)
        power_ref[gi, :, :] = power

        # mel contraction on the MXU, bf16x3 split precision (~f32 quality)
        p_hi = power.astype(jnp.bfloat16)
        p_lo = (power - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        mel = (
            dot(p_hi, mel_hi_ref[:, :])
            + dot(p_hi, mel_lo_ref[:, :])
            + dot(p_lo, mel_hi_ref[:, :])
        )
        if stat_args is None:
            mel_ref[gi, :, :] = mel
        else:
            (lasts,) = stat_args
            stats = _mfcc_stats_of(
                mel, nv, dct_hi_ref, dct_lo_ref, sg_refs, lasts, t_max
            )
            for r, v in enumerate(stats):
                mel_ref[gi, r : r + 1, :] = v

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
def _stat_consts(t_max: int, n_mfcc: int, n_mels: int, width: int = 9):
    """Constants for the in-kernel MFCC/delta/stats path.

    Returns (dct_hi, dct_lo [n_mels, n_mfcc]; per order: S_hi, S_lo
    [t_max, t_max] banded SavGol operator with static first-edge rows baked
    in; last-edge coefficient rows [half][width] as python floats for
    unrolled in-kernel FMAs).  The dynamic last-edge rows (positions depend
    on each clip's n_valid) are applied inside the kernel via an exact
    one-hot window GEMM + iota-compare overwrite.
    """
    half = width // 2
    dct_t = fb.dct_mat(n_mfcc, n_mels).T.copy()  # [n_mels, n_mfcc]
    out = [*_split_bf16(dct_t)]
    lasts = []
    for order in (1, 2):
        ops = fb.savgol_ops(width, order)
        S = np.zeros((t_max, t_max), np.float64)
        for j in range(width):
            k = float(ops.interior[j])
            for t in range(t_max):
                src = t + j - half
                if 0 <= src < t_max:
                    S[t, src] += k
        S[:half, :] = 0.0
        S[:half, :width] = np.asarray(ops.first, np.float64)
        out.extend(_split_bf16(S.astype(np.float32)))
        lasts.append(tuple(tuple(float(v) for v in row) for row in ops.last))
    return tuple(out), tuple(lasts)


def _mfcc_stats_of(
    mel, nv, dct_hi_ref, dct_lo_ref, sg_refs, lasts, t_max: int, width: int = 9
):
    """VMEM-resident [t_max, n_mels] linear mel + scalar n_valid ->
    [6, n_mfcc] rows (mfcc mean/std, delta mean/std, delta2 mean/std).

    Reproduces the XLA tail db_from_mel -> mfcc_from_db -> sg_deltas ->
    masked_mean_std (ops/spectral.py, ops/delta.py, ops/masked.py; ref
    pipeline1.py:216-221) with all intermediates in VMEM: librosa
    power_to_db with the per-clip valid-frame max clamp, orthonormal DCT-II
    on the MXU (bf16x3 == XLA HIGH), SavGol interior+first-edge as one
    banded [T, T] GEMM, and the per-clip dynamic last-edge rows via an
    exact one-hot window GEMM (0/1 matrix x 3-way bf16 split ~ f32 exact)
    + iota-compare overwrites.
    """
    half = width // 2
    dot = partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    def split3(a):
        a_hi = a.astype(jnp.bfloat16)
        r = a - a_hi.astype(jnp.float32)
        a_mid = r.astype(jnp.bfloat16)
        a_lo = (r - a_mid.astype(jnp.float32)).astype(jnp.bfloat16)
        return a_hi, a_mid, a_lo

    rows_t = jax.lax.broadcasted_iota(jnp.int32, (t_max, 1), 0)
    mask_t = rows_t < nv
    cnt = jnp.maximum(nv, 1).astype(jnp.float32)

    db = 10.0 * jnp.log10(jnp.maximum(1e-10, mel))
    cmax = jnp.max(jnp.where(mask_t, db, -jnp.inf))
    db = jnp.maximum(db, cmax - 80.0)

    db_hi, db_mid, db_lo = split3(db)
    mf = (
        dot(db_hi, dct_hi_ref[:, :])
        + dot(db_hi, dct_lo_ref[:, :])
        + dot(db_mid, dct_hi_ref[:, :])
    )  # [T, C], bf16x3 == XLA HIGH

    # exact one-hot select of the last `width` valid rows (shared by orders)
    start = jnp.maximum(nv - width, 0)
    wj = jax.lax.broadcasted_iota(jnp.int32, (width, t_max), 0)
    wt = jax.lax.broadcasted_iota(jnp.int32, (width, t_max), 1)
    W = (wt == start + wj).astype(jnp.bfloat16)
    mf_hi, mf_mid, mf_lo = split3(mf)
    win = dot(W, mf_hi) + dot(W, mf_mid) + dot(W, mf_lo)  # [width, C] ~exact

    def mstat(x):
        mean = jnp.sum(jnp.where(mask_t, x, 0.0), axis=0, keepdims=True) / cnt
        c = x - mean
        var = jnp.sum(jnp.where(mask_t, c * c, 0.0), axis=0, keepdims=True) / cnt
        return mean, jnp.sqrt(var)

    out = [*mstat(mf)]
    for o, (sg_hi_ref, sg_lo_ref) in enumerate(sg_refs):
        d = (
            dot(sg_hi_ref[:, :], mf_hi)
            + dot(sg_hi_ref[:, :], mf_mid)
            + dot(sg_lo_ref[:, :], mf_hi)
        )  # interior + static first edge, bf16x3
        for e in range(half):
            le = sum(lasts[o][e][j] * win[j : j + 1, :] for j in range(width))
            d = jnp.where(rows_t == nv - half + e, le, d)
        out.extend(mstat(d))
    return out  # 6 x [1, n_mfcc]


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
        "sr", "n_fft", "hop_length", "n_mels", "n_mfcc", "n_chroma", "g_clips",
        "with_tuning", "with_stats", "interpret",
    ),
)
def spectromel_pallas(
    audio: jnp.ndarray,
    lengths: jnp.ndarray,
    sr: int = 16000,
    n_fft: int = 2048,
    hop_length: int = 512,
    n_mels: int = 128,
    n_mfcc: int = 20,
    n_chroma: int = 12,
    g_clips: int = 4,
    with_tuning: bool = False,
    with_stats: bool = False,
    interpret: bool = False,
):
    """[B, N] zero-padded audio + lengths -> (power [B,T,K] frame-masked,
    mel [B,T,n_mels]) matching power_spectrogram(method='chunked') + masking +
    the mel contraction of mel_power_to_db.  With with_tuning=True, also
    returns tuning_bin [B] int32 == ops.chroma.estimate_tuning_bin(power).
    With with_stats=True (requires with_tuning), the mel output is replaced
    by the fused MFCC/delta statistics [B, 6, n_mfcc] (rows: mfcc mean/std,
    delta mean/std, delta2 mean/std over valid frames — the XLA chain
    db_from_mel -> mfcc_from_db -> sg_deltas -> masked_mean_std computed
    entirely in VMEM), and the return is (power, stats, tuning_bin).
    """
    B, N = audio.shape
    ratio = n_fft // hop_length
    t_max = N // hop_length + 1
    K = n_fft // 2 + 1
    if with_stats and not with_tuning:
        raise ValueError("with_stats requires with_tuning")
    if with_tuning:
        lo, hi, rtab, gpack = _tuning_consts(sr, n_fft, n_chroma)
        tune_args = (lo, hi, n_chroma)
        w_pad = 2 * gpack.shape[1]  # two compacted slots, lane-aligned
    else:
        tune_args = None
    if with_stats:
        stat_mats, lasts = _stat_consts(t_max, n_mfcc, n_mels)
        stat_args = (lasts,)
    else:
        stat_args = None
    # VMEM budget: Z block (2 x C x K f32) + power/temps (~8 x T x K f32) per
    # clip (+ ~8 x T x band f32 tuning temps); cap the per-program working
    # set (default ~8 MB) so long buckets (10 s -> T=321) still compile.
    per_clip = ((t_max + ratio) * K * 2 + t_max * K * 8) * 4
    if with_tuning:
        # candidate temps + the [2T, band] pack stacks and their bf16 splits
        per_clip += t_max * (hi - lo) * 12 * 4
    if with_stats:
        # db/mfcc/delta temps (lane-padded to 128 inside the core)
        per_clip += t_max * max(n_mels, 128) * 16 * 4
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
    ]
    out_shape = [jax.ShapeDtypeStruct((B, t_max, K), jnp.float32)]
    if with_stats:
        out_specs.append(
            pl.BlockSpec((g_clips, 6, n_mfcc), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((B, 6, n_mfcc), jnp.float32))
    else:
        out_specs.append(
            pl.BlockSpec((g_clips, t_max, n_mels), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((B, t_max, n_mels), jnp.float32))
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
    if with_stats:
        for m in stat_mats:
            const_specs.append(
                pl.BlockSpec(m.shape, lambda b: (0, 0), memory_space=pltpu.VMEM)
            )
            operands.append(jnp.asarray(m))

    outs = pl.pallas_call(
        partial(_spectromel_kernel, ratio, t_max, g_clips, tune_args, stat_args),
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

        power, melstats, mags, idxm = outs
        return power, melstats, tuning_bin_from_candidates(mags, idxm, compacted=True)
    return outs
