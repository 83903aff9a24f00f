"""Fused chroma-apply + statistics Pallas kernel.

Closes the frontend's last XLA tail (CLAUDE.md budget: ~0.4 ms of the 4.2 ms
batch-256 extraction): after the per-clip tuning bin is known, the XLA chain
is `fbk = table[tb]` (a [B, 12, 1025] gather materialized in HBM) ->
`einsum('btf,bcf->btc')` -> per-frame inf-norm -> masked mean/std — four-plus
HBM passes over the [B, T, 1025] power spectrogram and its temps.  This
kernel does the filterbank GEMM, the inf-norm and both statistics in one
VMEM pass per clip, so the power spectrogram is read from HBM exactly once
and nothing intermediate is written back.

The per-clip filterbank selection stays in XLA (a 256-row gather of 49 KB
rows from the 100-entry table — cheap, and it keeps the kernel free of
dynamic slicing), but is fed to the kernel pre-transposed [K, n_chroma] so
the MXU contraction is a plain rhs-major GEMM.

Semantics mirrored (reference: pipeline1.py:220-221 feature layout;
librosa.feature.chroma_stft norm=inf):
  - chroma = (power @ fbk) inf-normalized per frame, tiny-guarded exactly
    like ops.chroma.chroma_from_power (denom < f32 tiny -> 1.0);
  - stats = masked population mean/std over valid frames, matching
    ops.masked.masked_mean_std (ddof=0, count clamped to >= 1).

The GEMM runs as the kernel-standard bf16x3 split (== XLA HIGH; the XLA
path used HIGHEST).  On the inf-normalized [0, 1] chroma values the delta is
~1e-7 — three orders below the 1e-3 golden-parity clip budget
(docs/parity/README.md).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from stutter_tpu.ops import filterbanks as fb
from stutter_tpu.ops.chroma import _F32_TINY

try:  # pragma: no cover - exercised on TPU
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pl = None
    pltpu = None

_VMEM_CAP_BYTES = 8 << 20


@lru_cache(maxsize=None)
def _fb_table_rows(sr: int, n_fft: int, n_chroma: int) -> np.ndarray:
    """[100 * n_chroma, K]: chroma_fb_table flattened to rows so the per-clip
    gather stays LANE-DENSE (lane dim = K).  A [B, K, n_chroma] layout would
    pad the 12-wide lane dimension to 128 on device — 10.7x the HBM traffic,
    which measured SLOWER than the XLA tail it replaces."""
    t = fb.chroma_fb_table(sr, n_fft, n_chroma)
    return np.ascontiguousarray(t.reshape(-1, t.shape[-1]))


def _chroma_stats_kernel(g: int, t_max: int, *refs):
    """power [g, T, K] + fbk [g, C, K] + n_valid [B, 1] (SMEM) ->
    stats [g, 2, C] (row 0 mean, row 1 std over valid frames).

    The filterbank arrives [C, K] (lane-dense) and the GEMM contracts both
    operands on their LAST dim (x @ y.T — the MXU loads the rhs transposed)."""
    power_ref, fbk_ref, nvalid_ref, out_ref = refs
    dot = partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rows = jax.lax.broadcasted_iota(jnp.int32, (t_max, 1), 0)
    for gi in range(g):
        s = power_ref[gi, :, :]  # [T, K], frame-masked upstream
        s_hi = s.astype(jnp.bfloat16)
        s_lo = (s - s_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        f = fbk_ref[gi, :, :]  # [C, K]
        f_hi = f.astype(jnp.bfloat16)
        f_lo = (f - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        raw = dot(s_hi, f_hi) + dot(s_hi, f_lo) + dot(s_lo, f_hi)  # [T, C]
        denom = jnp.max(jnp.abs(raw), axis=-1, keepdims=True)
        denom = jnp.where(denom < _F32_TINY, 1.0, denom)
        ch = raw / denom
        nv = nvalid_ref[pl.program_id(0) * g + gi, 0]
        valid = (rows < nv).astype(jnp.float32)  # [T, 1]
        cnt = jnp.maximum(nv.astype(jnp.float32), 1.0)
        mean = jnp.sum(ch * valid, axis=0, keepdims=True) / cnt  # [1, C]
        cen = (ch - mean) * valid
        var = jnp.sum(cen * cen, axis=0, keepdims=True) / cnt
        out_ref[gi, 0:1, :] = mean
        out_ref[gi, 1:2, :] = jnp.sqrt(var)


def chroma_stats_pallas(
    power: jnp.ndarray,
    tuning_bin: jnp.ndarray,
    n_valid: jnp.ndarray,
    sr: int = 16000,
    n_fft: int = 2048,
    n_chroma: int = 12,
    g_clips: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Frame-masked power [B, T, K] + tuning bin [B] + valid frame count [B]
    -> [B, 2 * n_chroma] (chroma means then stds), numerically matching
    _stat_pair(chroma_from_power(power, tb, ...), mask)."""
    B, t_max, K = power.shape
    table = jnp.asarray(_fb_table_rows(sr, n_fft, n_chroma))  # [100*C, K]
    # lane-dense gather: C rows of K floats per clip (49 KB), no lane padding
    idx = tuning_bin[:, None] * n_chroma + jnp.arange(n_chroma)[None, :]
    fbk = table[idx]  # [B, C, K]
    # VMEM per clip: power + its bf16 splits (T x K x 8 B) + the filterbank
    # block and splits (C-sublane-padded x K x 8 B).
    per_clip = t_max * K * 8 + 16 * K * 8
    g = max(1, min(g_clips, _VMEM_CAP_BYTES // per_clip))
    while B % g:
        g -= 1
    nv = n_valid.astype(jnp.int32).reshape(B, 1)
    out = pl.pallas_call(
        partial(_chroma_stats_kernel, g, t_max),
        grid=(B // g,),
        in_specs=[
            pl.BlockSpec((g, t_max, K), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_chroma, K), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (g, 2, n_chroma), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 2, n_chroma), jnp.float32),
        interpret=interpret,
    )(power, fbk, nv)
    return out.reshape(B, 2 * n_chroma)
