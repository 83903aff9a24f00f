"""Masked reductions for variable-length clips under static shapes.

Clips of 0.45-10.1 s are padded into fixed frame-count buckets so `jit` sees
static shapes (SURVEY.md §5.7); every statistic must then reduce over valid
frames only, with semantics identical to NumPy on the unpadded array.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def frame_mask(lengths: jnp.ndarray, hop_length: int, t_max: int) -> jnp.ndarray:
    """[B, t_max] bool: frame t valid iff t < 1 + length // hop (librosa count)."""
    n_frames = 1 + lengths // hop_length
    return jnp.arange(t_max)[None, :] < n_frames[:, None]


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Mean over `axis` counting only mask==True positions (mask broadcasts)."""
    mask = jnp.broadcast_to(jnp.expand_dims(mask, -1), x.shape) if mask.ndim < x.ndim else mask
    cnt = jnp.maximum(jnp.sum(mask, axis=axis), 1)
    return jnp.sum(jnp.where(mask, x, 0.0), axis=axis) / cnt


def masked_mean_std(x: jnp.ndarray, mask: jnp.ndarray, axis: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Two-pass masked mean and population std (ddof=0), matching np.mean/np.std."""
    if mask.ndim < x.ndim:
        mask = jnp.broadcast_to(jnp.expand_dims(mask, -1), x.shape)
    cnt = jnp.maximum(jnp.sum(mask, axis=axis), 1)
    mean = jnp.sum(jnp.where(mask, x, 0.0), axis=axis) / cnt
    centered = x - jnp.expand_dims(mean, axis)
    var = jnp.sum(jnp.where(mask, centered * centered, 0.0), axis=axis) / cnt
    return mean, jnp.sqrt(var)


def masked_max(x: jnp.ndarray, mask: jnp.ndarray, axis, keepdims: bool = False) -> jnp.ndarray:
    if mask.ndim < x.ndim:
        mask = jnp.broadcast_to(jnp.expand_dims(mask, -1), x.shape)
    return jnp.max(jnp.where(mask, x, -jnp.inf), axis=axis, keepdims=keepdims)


def masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """np.median(x[mask]) per row; x, mask: [B, N] -> [B].

    Sort ascending with +inf fill, then average the two middle order statistics
    (equal for odd counts). Rows with no valid entries return 0.0.
    """
    cnt = jnp.sum(mask, axis=-1)
    filled = jnp.where(mask, x, jnp.inf)
    s = jnp.sort(filled, axis=-1)
    lo_idx = jnp.maximum(cnt - 1, 0) // 2
    hi_idx = jnp.maximum(cnt, 1) // 2
    lo = jnp.take_along_axis(s, lo_idx[:, None], axis=-1)[:, 0]
    hi = jnp.take_along_axis(s, hi_idx[:, None], axis=-1)[:, 0]
    med = 0.5 * (lo + hi)
    return jnp.where(cnt > 0, med, 0.0)
