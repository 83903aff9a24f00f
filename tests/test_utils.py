"""Profiling + checkpoint/resume utilities."""

import numpy as np

from stutter_tpu.utils.profiling import StageTimer


def test_stage_timer_report():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    rep = t.report()
    assert "a" in rep and "b" in rep
    assert t.counts["a"] == 2


def test_train_checkpoint_resume(tmp_path, rng):
    """Interrupted seq training resumes from the Orbax checkpoint and matches
    an uninterrupted run."""
    from stutter_tpu.models.cnn_bilstm import apply_cnn_bilstm, init_cnn_bilstm
    from stutter_tpu.train.seq_trainer import SeqTrainConfig, train_sequence_model

    n, T, D = 32, 16, 8
    y = rng.randint(0, 2, n)
    X = (rng.randn(n, T, D) * 0.1 + y[:, None, None]).astype(np.float32)
    nv = np.full(n, T, np.int32)
    kw = {"in_dim": D, "conv_channels": (8,), "lstm_dim": 8, "n_classes": 2}
    cfg = SeqTrainConfig(epochs=20, batch_size=16)  # 40 steps

    full = train_sequence_model(
        init_cnn_bilstm, apply_cnn_bilstm, X, nv, y, 2, cfg, kw
    )

    ck = str(tmp_path / "ck")
    # "interrupted": checkpoint every 20 steps; run once fully (writes step 20/40)
    resumed = train_sequence_model(
        init_cnn_bilstm, apply_cnn_bilstm, X, nv, y, 2, cfg, kw,
        ckpt_dir=ck, ckpt_every=20,
    )
    from stutter_tpu.utils.checkpoint import latest_step

    assert latest_step(ck) == 40
    # re-invoking resumes at 40 -> no more steps -> identical params out
    resumed2 = train_sequence_model(
        init_cnn_bilstm, apply_cnn_bilstm, X, nv, y, 2, cfg, kw,
        ckpt_dir=ck, ckpt_every=20,
    )
    for k in resumed:
        np.testing.assert_allclose(np.asarray(resumed[k]), np.asarray(resumed2[k]), atol=1e-6)
    # and the checkpointed run equals the uninterrupted run (same rng stream)
    for k in full:
        np.testing.assert_allclose(np.asarray(full[k]), np.asarray(resumed[k]), atol=1e-6)
