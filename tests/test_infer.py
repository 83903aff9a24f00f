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


def test_predict_clip_resamples(predictor, rng):
    """A library caller passing non-16k audio gets it resampled, not silently
    mis-featurized: predict_clip(y, 8000) == predict_clip(resample(y), 16000)."""
    from stutter_tpu.ops.resample import resample

    y8 = (rng.randn(8000) * 0.2).astype(np.float32)
    r_direct = predictor.predict_clip(y8, sr=8000)
    y16 = resample(y8, 8000, 16000).astype(np.float32)
    r_manual = predictor.predict_clip(y16, sr=16000)
    assert r_direct["label"] == r_manual["label"]
    for c in r_direct["proba"]:
        assert abs(r_direct["proba"][c] - r_manual["proba"][c]) < 1e-5


def test_streaming_windows(predictor, rng):
    y = (rng.randn(16000 * 8) * 0.2).astype(np.float32)
    wins = predictor.predict_stream(y, window_s=3.0, hop_s=2.0, batch_size=2)
    assert len(wins) >= 3
    assert wins[0]["start_s"] == 0.0
    # window starts round to the 512-sample frame grid (<= 16 ms of the
    # requested hop) — the same stream geometry contract as the ensemble path
    for k, w in enumerate(wins):
        assert abs(w["start_s"] - 2.0 * k) <= 512 / 16000 / 2 + 1e-9
        assert abs(sum(w["proba"].values()) - 1) < 1e-5


def test_streaming_stream_once_exact_parity(predictor, rng):
    """Stream-once == one-clip predictions EXACTLY when the requested
    geometry is frame-aligned: the on-device frame-row rebuild of each
    window is bit-identical to the host-assembled clip, so probabilities
    must match predict_clip on the same samples.  seg_samples forces
    multiple segments to cover the segment-boundary bookkeeping."""
    win, hop = 16384, 8192  # 512-multiples: requested == aligned starts
    y = (rng.randn(16000 * 7) * 0.2).astype(np.float32)
    wins = predictor.predict_stream(
        y, window_s=win / 16000, hop_s=hop / 16000, seg_samples=2 * win
    )
    n_exp = len(range(0, len(y) - win // 2, hop))
    assert len(wins) == n_exp
    for k, w in enumerate(wins):
        s0 = int(round(w["start_s"] * 16000))
        assert s0 == k * hop
        assert abs(w["end_s"] - min(s0 + win, len(y)) / 16000) < 1e-9
        solo = predictor.predict_clip(y[s0 : s0 + win])
        assert w["label"] == solo["label"]
        for c in solo["proba"]:
            assert abs(w["proba"][c] - solo["proba"][c]) < 1e-5


def test_ensemble_predictor_unit(tmp_path, rng):
    """EnsemblePredictor mechanics without full run_cv: artifacts constructed
    directly (MLP via persist, seq heads via persist_seq_head, ensemble.json
    by hand), weighted soft-vote verified against the members' probabilities."""
    import json
    import os

    import jax

    from stutter_tpu import persist
    from stutter_tpu.infer import EnsemblePredictor
    from stutter_tpu.models.cnn import init_cnn
    from stutter_tpu.models.cnn_bilstm import init_cnn_bilstm
    from stutter_tpu.train.seq_pipeline import persist_seq_head

    out = str(tmp_path)
    classes = ["neg", "pos"]
    X = rng.randn(40, 149).astype(np.float32)
    y = rng.randint(0, 2, 40)
    scaler = StandardScaler.fit(X)
    persist.save_scaler(os.path.join(out, "scaler_after.npz"), scaler)
    persist.save_label_encoder(
        os.path.join(out, "label_encoder.json"), LabelEncoder(classes_=classes)
    )
    persist.save_mlp(
        os.path.join(out, "model_mlp_tpu"),
        fit_mlp(X, y, MLPTrainConfig(hidden=(8,), epochs=2, n_seeds=1, n_classes=2)),
    )
    persist_seq_head(
        out, "cnn", init_cnn(jax.random.PRNGKey(0), n_mels=128, n_classes=2),
        np.zeros(128, np.float32), np.ones(128, np.float32), classes,
    )
    persist_seq_head(
        out, "cnn_bilstm",
        init_cnn_bilstm(jax.random.PRNGKey(1), in_dim=60, n_classes=2),
        np.zeros(60, np.float32), np.ones(60, np.float32), classes,
    )
    # raw+clean both-features member (298-dim)
    Xb = rng.randn(40, 298).astype(np.float32)
    persist.save_scaler(os.path.join(out, "scaler_both.npz"), StandardScaler.fit(Xb))
    persist.save_mlp(
        os.path.join(out, "model_mlp_both_tpu"),
        fit_mlp(Xb, y, MLPTrainConfig(hidden=(8,), epochs=2, n_seeds=1, n_classes=2)),
    )
    # dedicated clean-features member (r4: its own scaler + refit artifact,
    # NOT engine B's full-corpus MLP)
    persist.save_scaler(os.path.join(out, "scaler_clean.npz"), StandardScaler.fit(X))
    persist.save_mlp(
        os.path.join(out, "model_mlp_clean_tpu"),
        fit_mlp(X, y, MLPTrainConfig(hidden=(8,), epochs=2, n_seeds=1, n_classes=2)),
    )
    weights = {"mlp": 0.2, "mlp_clean": 0.1, "mlp_both": 0.2, "cnn": 0.3,
               "cnn_bilstm": 0.2}
    json.dump(
        {"weights": weights, "classes": classes},
        open(os.path.join(out, "ensemble.json"), "w"),
    )

    pred = EnsemblePredictor.load(out, PipelineConfig())
    # warmup pre-compiles every member for the given buckets without error
    pred.warmup(buckets=[8192], denoise=False)
    clip = (rng.randn(16000) * 0.2).astype(np.float32)
    r = pred.predict_clip(clip, 16000, denoise=False)
    assert set(r["proba"]) == set(classes)
    assert abs(sum(r["proba"].values()) - 1) < 1e-6
    # the vote IS the weighted member combination
    expect = np.zeros(2)
    for name, w in weights.items():
        expect += w * np.array([r["members"][name][c] for c in classes])
    expect /= expect.sum()
    got = np.array([r["proba"][c] for c in classes])
    np.testing.assert_allclose(got, expect, atol=1e-6)

    # fused-path parity: the one-dispatch member probs must equal the serial
    # SeqPredictor path (same ops, same shapes)
    from stutter_tpu.infer import SeqPredictor

    for arch in ("cnn", "cnn_bilstm"):
        serial = SeqPredictor.load(out, arch, PipelineConfig()).predict_clip(
            clip, 16000, denoise=False
        )
        for c in classes:
            assert abs(r["members"][arch][c] - serial["proba"][c]) < 1e-5

    # seq-only ensemble with the gate INSIDE the fused dispatch: vote must
    # equal the members' host-denoised serial path
    json.dump(
        {"weights": {"cnn": 0.6, "cnn_bilstm": 0.4}, "classes": classes},
        open(os.path.join(out, "ensemble.json"), "w"),
    )
    pred2 = EnsemblePredictor.load(out, PipelineConfig())
    r2 = pred2.predict_clip(clip, 16000, denoise=True)
    from stutter_tpu.denoise import denoise_clips

    y_dn = denoise_clips([clip], PipelineConfig().denoise)[0]
    for arch in ("cnn", "cnn_bilstm"):
        serial = SeqPredictor.load(out, arch, PipelineConfig()).predict_clip(
            y_dn, 16000, denoise=False
        )
        for c in classes:
            assert abs(r2["members"][arch][c] - serial["proba"][c]) < 1e-4

    # stale-artifact guard: class order mismatch must refuse to load
    json.dump(
        {"weights": weights, "classes": ["pos", "neg"]},
        open(os.path.join(out, "ensemble.json"), "w"),
    )
    with pytest.raises(ValueError, match="class order|stale"):
        EnsemblePredictor.load(out, PipelineConfig())


def test_ensemble_predict_batch_matches_per_clip(tmp_path, rng):
    """predict_batch == [predict_clip(y) for y] for mixed-length clips (the
    micro-batcher's contract): clips share one bucket + one padded dispatch,
    pad rows are dropped, per-clip probs are unchanged."""
    import json
    import os

    import jax

    from stutter_tpu.infer import EnsemblePredictor
    from stutter_tpu.models.cnn import init_cnn
    from stutter_tpu.models.cnn_bilstm import init_cnn_bilstm
    from stutter_tpu.train.seq_pipeline import persist_seq_head

    out = str(tmp_path)
    classes = ["neg", "pos"]
    persist_seq_head(
        out, "cnn", init_cnn(jax.random.PRNGKey(0), n_mels=128, n_classes=2),
        np.zeros(128, np.float32), np.ones(128, np.float32), classes,
    )
    persist_seq_head(
        out, "cnn_bilstm",
        init_cnn_bilstm(jax.random.PRNGKey(1), in_dim=60, n_classes=2),
        np.zeros(60, np.float32), np.ones(60, np.float32), classes,
    )
    json.dump(
        {"weights": {"cnn": 0.6, "cnn_bilstm": 0.4}, "classes": classes},
        open(os.path.join(out, "ensemble.json"), "w"),
    )
    pred = EnsemblePredictor.load(out, PipelineConfig())
    # three clips of different lengths — the last crosses into the second
    # bucket, so the batch runs the short clips under a LARGER bucket than
    # their solo path (frame masking must make that invisible) — plus a
    # batch size that forces a pad row (3 -> B=4)
    clips = [
        (rng.randn(16000) * 0.2).astype(np.float32),
        (rng.randn(8000) * 0.3).astype(np.float32),
        (rng.randn(30000) * 0.1).astype(np.float32),
    ]
    batch = pred.predict_batch(clips, 16000, denoise=False)
    assert len(batch) == 3
    for y, b in zip(clips, batch):
        solo = pred.predict_clip(y, 16000, denoise=False)
        assert solo["label"] == b["label"]
        for c in classes:
            assert abs(solo["proba"][c] - b["proba"][c]) < 1e-5
    # the gate-inside-dispatch path batches too
    batch_dn = pred.predict_batch(clips[:2], 16000, denoise=True)
    for y, b in zip(clips[:2], batch_dn):
        solo = pred.predict_clip(y, 16000, denoise=True)
        for c in classes:
            assert abs(solo["proba"][c] - b["proba"][c]) < 1e-4


def test_ensemble_stacked_same_arch_matches_serial(tmp_path, rng):
    """Same-architecture members (the quint's three transformer recipes)
    stack on a leading param axis and run as one vmapped forward inside the
    fused dispatch — member probabilities must equal the serial SeqPredictor
    path exactly (same ops, different lowering)."""
    import json
    import os

    import jax

    from stutter_tpu.infer import EnsemblePredictor, SeqPredictor
    from stutter_tpu.models.cnn import init_cnn
    from stutter_tpu.models.transformer import init_transformer
    from stutter_tpu.train.seq_pipeline import persist_seq_head

    out = str(tmp_path)
    classes = ["neg", "pos"]
    # three transformer recipes = identical graphs, independent weights and
    # normalization stats, plus one structurally different member (cnn)
    for i, arch in enumerate(("transformer", "transformer_lr1e3",
                              "transformer_mix4_lr1e3")):
        persist_seq_head(
            out, arch,
            init_transformer(jax.random.PRNGKey(i), n_mels=128, n_classes=2),
            rng.randn(128).astype(np.float32) * 0.1,
            1.0 + rng.rand(128).astype(np.float32),
            classes,
        )
    persist_seq_head(
        out, "cnn", init_cnn(jax.random.PRNGKey(7), n_mels=128, n_classes=2),
        np.zeros(128, np.float32), np.ones(128, np.float32), classes,
    )
    json.dump(
        {"weights": {"transformer": 0.3, "transformer_lr1e3": 0.25,
                     "transformer_mix4_lr1e3": 0.25, "cnn": 0.2},
         "classes": classes},
        open(os.path.join(out, "ensemble.json"), "w"),
    )
    pred = EnsemblePredictor.load(out, PipelineConfig())
    clip = (rng.randn(16000) * 0.2).astype(np.float32)
    r = pred.predict_clip(clip, 16000, denoise=False)
    # distinct weights must produce distinct member probabilities (guards
    # against the stack accidentally broadcasting one member's params)
    p0 = [r["members"]["transformer"][c] for c in classes]
    p1 = [r["members"]["transformer_lr1e3"][c] for c in classes]
    assert not np.allclose(p0, p1, atol=1e-4)
    for arch in ("transformer", "transformer_lr1e3",
                 "transformer_mix4_lr1e3", "cnn"):
        serial = SeqPredictor.load(out, arch, PipelineConfig()).predict_clip(
            clip, 16000, denoise=False
        )
        for c in classes:
            assert abs(r["members"][arch][c] - serial["proba"][c]) < 1e-5


def _stream_ensemble(tmp_path, rng, archs=("cnn",), weights=None):
    """Build a seq-only EnsemblePredictor from freshly-initialized heads."""
    import json
    import os

    import jax

    from stutter_tpu.infer import EnsemblePredictor
    from stutter_tpu.train.seq_pipeline import ARCHS, persist_seq_head

    out = str(tmp_path)
    classes = ["neg", "pos"]
    for i, arch in enumerate(archs):
        spec = ARCHS[arch]
        kw = spec["init_kwargs"](2)
        D = kw.get("n_mels", kw.get("in_dim"))
        persist_seq_head(
            out, arch, spec["init_fn"](jax.random.PRNGKey(i), **kw),
            np.zeros(D, np.float32), np.ones(D, np.float32), classes,
        )
    w = weights or {a: 1.0 / len(archs) for a in archs}
    json.dump(
        {"weights": w, "classes": classes},
        open(os.path.join(out, "ensemble.json"), "w"),
    )
    return EnsemblePredictor.load(out, PipelineConfig()), classes


def test_ensemble_predict_stream_exact_parity(tmp_path, rng):
    """Stream-once windowed inference == the per-window path EXACTLY when the
    window boundaries are silent: the only semantic difference between the
    paths is STFT frames within n_fft/2 of a window edge (the per-window
    path zero-pads there, stream-once sees the neighboring audio), so a
    signal with >= n_fft/2 zeros around every window boundary removes it.
    Covers multi-segment processing, frame-grid window starts, stacked
    same-arch members, and both feature kinds (log-mel + MFCC/deltas)."""
    pred, classes = _stream_ensemble(
        tmp_path, rng,
        archs=("cnn", "cnn_bilstm", "transformer", "transformer_lr1e3"),
        weights={"cnn": 0.3, "cnn_bilstm": 0.3, "transformer": 0.2,
                 "transformer_lr1e3": 0.2},
    )
    win = 8192  # 0.512 s — a 512-multiple, so requested == aligned starts
    n_w = 3
    y = np.zeros(n_w * win, np.float32)
    for k in range(n_w):
        y[k * win + 1024 : (k + 1) * win - 1024] = (
            rng.randn(win - 2048) * 0.2
        )
    # seg_samples = 2*win forces one segment per window -> 3 segments
    wins = pred.predict_stream(
        y, 16000, window_s=win / 16000, hop_s=win / 16000,
        denoise=False, seg_samples=2 * win,
    )
    assert len(wins) == n_w
    assert wins[0]["start_s"] == 0.0
    assert abs(wins[0]["end_s"] - win / 16000) < 1e-6
    for w in wins:
        s0 = int(round(w["start_s"] * 16000))
        solo = pred.predict_clip(y[s0 : s0 + win], 16000, denoise=False)
        assert w["label"] == solo["label"]
        for c in classes:
            assert abs(w["proba"][c] - solo["proba"][c]) < 1e-4


def test_ensemble_predict_stream_generic_agreement(tmp_path, rng):
    """On generic audio the stream-once path differs from per-window only at
    window-edge STFT frames (real neighbors vs constant pad) and by the
    <= 16 ms frame-grid start rounding — window probabilities must stay
    close in aggregate, and the geometry must follow the request."""
    pred, classes = _stream_ensemble(tmp_path, rng)
    y = (rng.randn(16000 * 6) * 0.2).astype(np.float32)  # 6 s
    wins = pred.predict_stream(y, 16000, window_s=1.0, hop_s=0.7,
                               denoise=False, seg_samples=1 << 16)
    # starts: 0, 0.7, ..., < 6 - 0.512 -> ceil(5.488/0.7) = 8 windows
    assert len(wins) == 8
    starts = [w["start_s"] for w in wins]
    assert starts == sorted(starts) and starts[0] == 0.0
    # every aligned start within half a frame (16 ms) of the requested hop
    for k, w in enumerate(wins):
        assert abs(w["start_s"] - 0.7 * k) <= 512 / 16000 / 2 + 1e-9
    deltas = []
    for w in wins:
        s0 = int(round(w["start_s"] * 16000))
        solo = pred.predict_clip(y[s0 : s0 + 16384], 16000, denoise=False)
        deltas.extend(
            abs(w["proba"][c] - solo["proba"][c]) for c in classes
        )
    assert float(np.mean(deltas)) < 0.02  # edge-frame deltas only
    assert float(np.max(deltas)) < 0.1
