#!/usr/bin/env python3
"""Throughput benchmark: clips/sec/chip for 3 s 16 kHz audio, feats + classify.

Measures the serving hot path — batched 149-dim feature extraction (STFT,
mel, MFCC, SG-deltas, tuning-estimated chroma) fused with the MLP classifier
— in a device-resident steady-state loop, against the single-threaded CPU
reference pipeline (the NumPy oracle implementing the same librosa-parity
computation the reference runs per clip, stutter_tpu/oracle/frontend.py).

Prints ONE JSON line:
  {"metric": "clips/sec/chip (3s 16kHz, feats+classify)", "value": N,
   "unit": "clips/s", "vs_baseline": speedup_over_cpu_reference}
"""

import json
import sys
import time

import numpy as np


def measure_tpu(batch: int = 256, n_samples: int = 49152, iters: int = 30) -> float:
    import jax
    import jax.numpy as jnp

    from stutter_tpu.models.mlp import apply_mlp, init_mlp
    from stutter_tpu.ops.frontend import extract_features_149_batch

    params = init_mlp(jax.random.PRNGKey(0), 149, (256, 128, 64), 3)

    @jax.jit
    def step(audio, lengths):
        feats = extract_features_149_batch(audio, lengths)
        return jax.nn.softmax(apply_mlp(params, feats), -1)

    rng = np.random.RandomState(0)
    # two buffers so no result reuse is possible
    bufs = [
        jnp.asarray((rng.randn(batch, n_samples) * 0.1).astype(np.float32)) for _ in range(2)
    ]
    lengths = jnp.asarray(np.full(batch, 48000, np.int32))
    # compile + warm
    float(step(bufs[0], lengths)[0, 0])
    t0 = time.time()
    r = None
    for i in range(iters):
        r = step(bufs[i % 2], lengths)
    float(r[0, 0])  # sync through the tunnel
    dt = (time.time() - t0) / iters
    return batch / dt


def measure_denoise_tpu(batch: int = 256, n_samples: int = 49152, iters: int = 15) -> float:
    """Batched spectral-gate denoise throughput (the reference's hot loop #1,
    ref pipeline1.py:371-424 via nr.reduce_noise at :140).  B=256 amortizes
    per-dispatch overhead best (measured: 18.5k/21.8k/23.4k clips/s at
    B=64/128/256 on v5e)."""
    import jax
    import jax.numpy as jnp

    from stutter_tpu.config import DenoiseConfig
    from stutter_tpu.denoise import denoise_batch

    cfg = DenoiseConfig()

    @jax.jit
    def step(a, l):
        # scalar output: per-dispatch cost over tunneled backends scales with
        # output size, so reduce before timing
        return denoise_batch(a, l, cfg).sum()

    rng = np.random.RandomState(0)
    bufs = [
        jnp.asarray((rng.randn(batch, n_samples) * 0.1).astype(np.float32))
        for _ in range(2)
    ]
    lengths = jnp.asarray(np.full(batch, 48000, np.int32))
    float(step(bufs[0], lengths))  # compile + warm
    t0 = time.time()
    r = None
    for i in range(iters):
        r = step(bufs[i % 2], lengths)
    float(r)
    dt = (time.time() - t0) / iters
    return batch / dt


def measure_denoise_cpu(n_clips: int = 8) -> float:
    """Single-threaded CPU reference path: per-clip oracle spectral gate."""
    from stutter_tpu.oracle.denoise import denoise_clip

    rng = np.random.RandomState(0)
    clips = [(rng.randn(48000) * 0.1).astype(np.float32) for _ in range(n_clips)]
    denoise_clip(clips[0])  # warm filterbank caches
    t0 = time.time()
    for y in clips:
        denoise_clip(y)
    dt = (time.time() - t0) / n_clips
    return 1.0 / dt


def measure_cpu(n_clips: int = 12) -> float:
    """Single-threaded CPU reference path: per-clip oracle feats + classify."""
    from stutter_tpu.oracle import frontend as OF

    rng = np.random.RandomState(0)
    clips = [(rng.randn(48000) * 0.1).astype(np.float32) for _ in range(n_clips)]
    W = [rng.randn(149, 256) * 0.01, rng.randn(256, 128) * 0.01,
         rng.randn(128, 64) * 0.01, rng.randn(64, 3) * 0.01]
    # warm one clip (numpy caches filterbanks via lru)
    OF.extract_features(clips[0], 16000, variant=149)
    t0 = time.time()
    for y in clips:
        f = OF.extract_features(y, 16000, variant=149)
        h = f
        for w in W:
            h = np.maximum(h @ w, 0)
    dt = (time.time() - t0) / n_clips
    return 1.0 / dt


def main() -> int:
    cpu_rate = measure_cpu()
    tpu_rate = measure_tpu()
    den_cpu = measure_denoise_cpu()
    den_tpu = measure_denoise_tpu()
    print(
        json.dumps(
            {
                "metric": "clips/sec/chip (3s 16kHz, feats+classify)",
                "value": round(tpu_rate, 1),
                "unit": "clips/s",
                "vs_baseline": round(tpu_rate / cpu_rate, 1),
                "denoise_clips_per_s": round(den_tpu, 1),
                "denoise_vs_baseline": round(den_tpu / den_cpu, 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
