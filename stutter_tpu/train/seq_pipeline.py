"""Sequence-model training driver (CNN / CNN-BiLSTM over the corpus).

BASELINE.json configs #2/#3: mel-spectrogram CNN and MFCC+Δ+ΔΔ CNN-BiLSTM
heads.  Trains on a workspace corpus (clear_audio clips by default),
evaluates on the reference's stratified 80/20 protocol, persists params, and
appends to metrics_summary-style CSV artifacts.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import numpy as np

from stutter_tpu import evals
from stutter_tpu.config import PipelineConfig
from stutter_tpu.data import label_of, list_audio_files
from stutter_tpu.models.cnn import apply_cnn, init_cnn
from stutter_tpu.models.cnn_bilstm import apply_cnn_bilstm, init_cnn_bilstm
from stutter_tpu.models.scaler import LabelEncoder
from stutter_tpu.train.seq_trainer import (
    SeqTrainConfig,
    predict_sequence_model,
    prepare_sequence_dataset,
    standardize_sequences,
    train_sequence_model,
)
from stutter_tpu.train.splits import stratified_train_test_split

ARCHS = {
    "cnn": dict(
        kind="logmel",
        init_fn=init_cnn,
        apply_fn=apply_cnn,
        init_kwargs=lambda n_classes: {"n_mels": 128, "n_classes": n_classes},
    ),
    "cnn_bilstm": dict(
        kind="mfcc_deltas",
        init_fn=init_cnn_bilstm,
        apply_fn=apply_cnn_bilstm,
        init_kwargs=lambda n_classes: {"in_dim": 60, "n_classes": n_classes},
    ),
}


def load_corpus_clips(root: str, cfg: PipelineConfig) -> tuple[list[np.ndarray], list[str]]:
    """Denoised corpus clips (clear_audio by stem) + labels, via native decode."""
    from stutter_tpu.io.native import load_wav_batch
    from stutter_tpu.ops.frontend import DEFAULT_BUCKETS

    files = list_audio_files(os.path.join(root, cfg.data.data_dir), cfg.data.audio_exts)
    paths, labels = [], []
    for f in files:
        w = os.path.join(root, cfg.data.clear_dir, Path(f).stem + ".wav")
        if os.path.exists(w):
            paths.append(w)
            labels.append(label_of(f))
    audio, lens = load_wav_batch(paths, DEFAULT_BUCKETS[-1], cfg.features.frontend.sample_rate)
    clips = [audio[i, : lens[i]] for i in range(len(paths)) if lens[i] > 0]
    labels = [l for l, n in zip(labels, lens) if n > 0]
    return clips, labels


def cross_validate_seq(
    arch: str,
    clips: list[np.ndarray],
    y: np.ndarray,
    folds: list[tuple[np.ndarray, np.ndarray]],
    n_classes: int,
    train_cfg: SeqTrainConfig = SeqTrainConfig(epochs=80, batch_size=64),
    n_seeds: int = 1,
) -> tuple[np.ndarray, np.ndarray]:
    """K-fold CV for a sequence head; returns (y_pred, y_proba) in row order.

    The dataset is featurized once; per-fold standardization uses the train
    rows only (no leakage).  n_seeds > 1 soft-votes the out-of-fold
    probabilities of n_seeds independently-initialized trainings (seeds
    train_cfg.seed .. +n_seeds-1) — the same seed-vote the MLP grid trainer
    uses (train/trainer.py), which adds ~1pt CV on the reference corpus."""
    import dataclasses

    spec = ARCHS[arch]
    X, nv = prepare_sequence_dataset(clips, kind=spec["kind"])
    N = len(clips)
    y_proba = np.zeros((N, n_classes), np.float32)
    for tr, te in folds:
        Xs_tr, mean, std = standardize_sequences(X[tr], nv[tr])
        mask = (np.arange(X.shape[1])[None, :] < nv[:, None])[..., None]
        Xs_all = ((X - mean) / std * mask).astype(np.float32)
        for s in range(n_seeds):
            tc = (
                train_cfg if s == 0
                else dataclasses.replace(train_cfg, seed=train_cfg.seed + s)
            )
            params = train_sequence_model(
                spec["init_fn"], spec["apply_fn"], Xs_all[tr], nv[tr], y[tr],
                n_classes, tc, spec["init_kwargs"](n_classes),
            )
            y_proba[te] += predict_sequence_model(
                spec["apply_fn"], params, Xs_all[te], nv[te]
            ) / n_seeds
    return y_proba.argmax(-1), y_proba


def run_seq(
    root: str = ".",
    arch: str = "cnn_bilstm",
    cfg: PipelineConfig = PipelineConfig(),
    train_cfg: SeqTrainConfig = SeqTrainConfig(epochs=80, batch_size=64),
    ckpt: bool = False,
    labels_taxonomy: str = "folder",
) -> dict:
    """Train a sequence head on the workspace corpus; returns metrics + params.

    labels_taxonomy='5class' maps corpus folders into the 5-class dysfluency
    taxonomy and trains a 5-output head (BASELINE config #3)."""
    from stutter_tpu.data import encode_labels

    spec = ARCHS[arch]
    out_dir = os.path.join(root, cfg.data.output_dir)
    os.makedirs(out_dir, exist_ok=True)

    clips, labels = load_corpus_clips(root, cfg)
    labels, le = encode_labels(labels, labels_taxonomy)
    y = le.transform(labels)
    tr, te = stratified_train_test_split(y, cfg.train.test_size, cfg.train.seed)

    t0 = time.time()
    X, nv = prepare_sequence_dataset(clips, kind=spec["kind"])
    Xs, mean, std = standardize_sequences(X, nv)
    params = train_sequence_model(
        spec["init_fn"],
        spec["apply_fn"],
        Xs[tr],
        nv[tr],
        y[tr],
        le.n_classes,
        train_cfg,
        spec["init_kwargs"](le.n_classes),
        ckpt_dir=os.path.join(out_dir, f"ckpt_{arch}") if ckpt else None,
    )
    proba = predict_sequence_model(spec["apply_fn"], params, Xs[te], nv[te])
    pred = proba.argmax(-1)
    acc = evals.accuracy(y[te], pred) * 100
    loss = evals.log_loss(y[te], proba)
    elapsed = time.time() - t0

    # persist: params npz + normalization stats + confusion artifact
    from stutter_tpu.persist import _flatten_params

    np.savez(os.path.join(out_dir, f"model_{arch}.npz"), **_flatten_params(params))
    np.savez(os.path.join(out_dir, f"model_{arch}_norm.npz"), mean=mean, std=std)
    Path(os.path.join(out_dir, f"model_{arch}.json")).write_text(
        json.dumps({"arch": arch, "classes": le.classes_, "kind": spec["kind"]})
    )
    cm = evals.confusion_matrix(y[te], pred, le.n_classes)
    evals.write_confusion_csv(os.path.join(out_dir, f"confusion_{arch}.csv"), cm, le.classes_)
    return {
        "arch": arch,
        "accuracy": acc,
        "test_loss": loss,
        "elapsed_s": elapsed,
        "classes": le.classes_,
        "params": params,
    }
