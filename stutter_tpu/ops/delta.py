"""Batched Savitzky-Golay delta features with mode='interp' edge semantics.

librosa.feature.delta (ref: pipeline1.py:217-218) is
scipy.signal.savgol_filter(width=9, polyorder=order, deriv=order,
mode='interp'): a 9-tap correlation in the interior plus polynomial-fit edge
rows computed from the first/last 9 valid frames.  Under batching with padded
frame buckets, the "last 9 valid frames" start at a per-clip dynamic offset,
handled with dynamic_slice/dynamic_update_slice under vmap.

Clips shorter than `width` frames cannot be filtered (scipy raises; the
reference's blanket except then zeroes the vector, pipeline1.py:237-239) —
callers should zero those clips' features; at 16 kHz/hop 512 that is only
clips < 0.26 s, below the corpus minimum of 0.45 s.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stutter_tpu.ops.filterbanks import savgol_ops


def sg_delta(x: jnp.ndarray, n_valid: jnp.ndarray, order: int = 1, width: int = 9) -> jnp.ndarray:
    """x: [B, T, C] features, n_valid: [B] valid frame counts -> [B, T, C].

    Output rows >= n_valid are garbage and must be masked by the caller.
    """
    ops = savgol_ops(width, order)
    half = width // 2
    B, T, C = x.shape

    # Interior correlation: y[t] = sum_j k[j] * x[t + j - half]
    xp = jnp.pad(x, ((0, 0), (half, half), (0, 0)))
    interior = sum(float(ops.interior[j]) * xp[:, j : j + T] for j in range(width))

    # First-edge rows (static position 0..half-1) from the first `width` frames.
    # HIGHEST precision: TPU matmul defaults to bf16, which costs ~1e-4 rel
    # error on O(500) MFCC values — outside the parity budget.
    first = jnp.einsum(
        "ew,bwc->bec", jnp.asarray(ops.first), x[:, :width], precision=jax.lax.Precision.HIGHEST
    )
    y = jnp.concatenate([first, interior[:, half:]], axis=1)

    # Last-edge rows (dynamic position n_valid-half .. n_valid-1) from the
    # last `width` valid frames: small take_along_axis gather + masked select
    # (a vmapped dynamic_update_slice forms a serialized scatter on TPU).
    start = jnp.maximum(n_valid - width, 0)  # [B]
    win_idx = start[:, None] + jnp.arange(width)[None, :]  # [B, width]
    win = jnp.take_along_axis(x, win_idx[:, :, None], axis=1)  # [B, width, C]
    last = jnp.einsum(
        "ew,bwc->bec", jnp.asarray(ops.last), win, precision=jax.lax.Precision.HIGHEST
    )  # [B, half, C]
    t_idx = jnp.arange(T)[None, :]  # [1, T]
    offset = t_idx - (n_valid[:, None] - half)  # [B, T]: 0..half-1 at edge rows
    is_edge = (offset >= 0) & (offset < half)
    edge_vals = jnp.take_along_axis(last, jnp.clip(offset, 0, half - 1)[:, :, None], axis=1)
    return jnp.where(is_edge[:, :, None], edge_vals, y)
