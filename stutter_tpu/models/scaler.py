"""StandardScaler / LabelEncoder equivalents (jit-friendly, sklearn-compatible).

Ref: pipeline1.py:462-473 and main.py:873-887 use sklearn's StandardScaler
(per-feature zero-mean unit-variance, ddof=0, zero-variance features left
unscaled) and LabelEncoder (sorted unique classes -> ints).  These are plain
arrays here so they live in jitted pipelines and Orbax checkpoints.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class StandardScaler:
    mean_: np.ndarray
    scale_: np.ndarray
    # raw per-feature variance and sample count, kept so the fitted state can
    # be exported as a bit-faithful sklearn StandardScaler (persist.py); older
    # saved scalers may lack them.
    var_: np.ndarray | None = None
    n_samples_seen_: int | None = None

    @classmethod
    def fit(cls, X: np.ndarray) -> "StandardScaler":
        mean = X.mean(axis=0, dtype=np.float64)
        var = X.var(axis=0, dtype=np.float64)
        std = np.sqrt(var)
        # sklearn _handle_zeros_in_scale: zero variance -> scale 1
        scale = np.where(std == 0.0, 1.0, std)
        return cls(
            mean_=mean.astype(np.float32),
            scale_=scale.astype(np.float32),
            var_=var,
            n_samples_seen_=int(X.shape[0]),
        )

    def transform(self, X):
        return (X - self.mean_) / self.scale_

    def inverse_transform(self, X):
        return X * self.scale_ + self.mean_

    @property
    def n_features_in_(self) -> int:
        return int(self.mean_.shape[0])

    def to_arrays(self) -> dict:
        out = {"mean": self.mean_, "scale": self.scale_}
        if self.var_ is not None:
            out["var"] = self.var_
            out["n_samples"] = np.asarray(self.n_samples_seen_ or 0)
        return out

    @classmethod
    def from_arrays(cls, d: dict) -> "StandardScaler":
        return cls(
            mean_=np.asarray(d["mean"]),
            scale_=np.asarray(d["scale"]),
            var_=np.asarray(d["var"]) if "var" in d else None,
            n_samples_seen_=int(d["n_samples"]) if "n_samples" in d else None,
        )


@dataclasses.dataclass
class LabelEncoder:
    classes_: list[str]

    @classmethod
    def fit(cls, labels: list[str]) -> "LabelEncoder":
        return cls(classes_=sorted(set(labels)))

    def transform(self, labels: list[str]) -> np.ndarray:
        index = {c: i for i, c in enumerate(self.classes_)}
        return np.array([index[l] for l in labels], dtype=np.int32)

    def fit_transform(self, labels: list[str]) -> np.ndarray:
        self.classes_ = sorted(set(labels))
        return self.transform(labels)

    def inverse_transform(self, y) -> list[str]:
        return [self.classes_[int(i)] for i in np.atleast_1d(np.asarray(y))]

    @property
    def n_classes(self) -> int:
        return len(self.classes_)
