"""334-variant batched extractor vs the NumPy oracle.

NOTE: the reference's own 334 extractor is broken (every cached vector would
be zeros — main.py:753), so there is no external golden data; the oracle
implements the intended semantics and the batched path must match it.
Spectral-contrast dims of near-silent bands are noise-floor-dominated
(valley = min magnitude ~ FP rounding scale on a log axis), hence the looser
tolerance there.
"""

import numpy as np
import jax.numpy as jnp

from stutter_tpu.io.wav import load_mono
from stutter_tpu.oracle import frontend as OF
from stutter_tpu.ops.frontend334 import extract_features_334_batch


def _run(y, n):
    N = max(-(-n // 512) * 512, 1024)
    buf = np.zeros((1, N), np.float32)
    buf[0, :n] = y[:N]
    return np.asarray(
        extract_features_334_batch(jnp.asarray(buf), jnp.asarray([n], np.int32))
    )[0]


def test_334_matches_oracle_on_golden_clip(golden_subset):
    wav_path, _ = golden_subset[0]
    y, sr = load_mono(wav_path)
    ref = OF.extract_features(y, sr, variant=334)
    got = _run(y, len(y))
    assert got.shape == (286,)  # computed contract; main.py's "334" comment is wrong
    err = np.abs(got - ref)
    assert err[:264].max() < 1e-3  # mfcc+deltas+chroma
    assert err[264:278].max() < 1.0  # contrast (noise-floor-limited, see docstring)
    assert err[278:].max() < 1e-3  # scalars + text
    assert err.mean() < 5e-2


def test_334_synthetic(rng):
    y = (rng.randn(20000) * 0.2).astype(np.float32)
    ref = OF.extract_features(y, 16000, variant=334)
    got = _run(y, len(y))
    # broadband noise keeps every contrast band well above the floor
    assert np.abs(got - ref).max() < 2e-2
    assert np.abs(got[:264] - ref[:264]).max() < 1e-3
