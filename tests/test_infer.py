"""Predictor: shape guard, streaming windows, warmup."""

import numpy as np
import pytest

from stutter_tpu.config import PipelineConfig
from stutter_tpu.infer import Predictor
from stutter_tpu.models.scaler import LabelEncoder, StandardScaler
from stutter_tpu.train.trainer import MLPTrainConfig, fit_mlp


@pytest.fixture(scope="module")
def predictor(rng):
    X = rng.randn(80, 149).astype(np.float32)
    y = rng.randint(0, 3, 80)
    fitted = fit_mlp(X, y, MLPTrainConfig(hidden=(16,), epochs=3, n_seeds=2))
    p = Predictor(
        scaler=StandardScaler.fit(X),
        label_encoder=LabelEncoder(classes_=["a", "b", "c"]),
        model=fitted,
        cfg=PipelineConfig(),
        denoise_first=False,
    )
    return p


def test_predict_clip(predictor, rng):
    y = (rng.randn(16000) * 0.2).astype(np.float32)
    r = predictor.predict_clip(y)
    assert r["label"] in {"a", "b", "c"}
    assert abs(sum(r["proba"].values()) - 1) < 1e-5


def test_shape_guard(predictor, rng):
    bad = Predictor(
        scaler=StandardScaler.fit(rng.randn(10, 99).astype(np.float32)),
        label_encoder=predictor.label_encoder,
        model=predictor.model,
        denoise_first=False,
    )
    with pytest.raises(ValueError, match="feature length"):
        bad.predict_clip((rng.randn(16000) * 0.2).astype(np.float32))


def test_streaming_windows(predictor, rng):
    y = (rng.randn(16000 * 8) * 0.2).astype(np.float32)
    wins = predictor.predict_stream(y, window_s=3.0, hop_s=2.0, batch_size=2)
    assert len(wins) >= 3
    assert wins[0]["start_s"] == 0.0
    assert wins[1]["start_s"] == 2.0
    for w in wins:
        assert abs(sum(w["proba"].values()) - 1) < 1e-5
