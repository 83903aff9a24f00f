"""Pallas fused spectromel kernel vs the XLA reference (interpret mode on CPU)."""

import numpy as np


def test_spectromel_kernel_matches_xla_composition(rng):
    """Fused chunk-DFT spectromel (interpret mode) == XLA power+mask+mel."""
    import jax.numpy as jnp

    from stutter_tpu.ops import filterbanks as fb
    from stutter_tpu.ops.masked import frame_mask
    from stutter_tpu.ops.pallas_spectromel import spectromel_pallas
    from stutter_tpu.ops.spectral import power_spectrogram

    audio = jnp.asarray(rng.randn(4, 24576).astype(np.float32) * 0.3)
    lengths = jnp.asarray(np.array([24576, 20000, 9000, 3000], np.int32))
    for n_fft, hop in ((2048, 512), (512, 256)):
        p_ref = np.asarray(power_spectrogram(audio, n_fft, hop, method="fft"))
        mask = np.asarray(frame_mask(lengths, hop, p_ref.shape[1]))
        p_ref = np.where(mask[:, :, None], p_ref, 0.0)
        m_ref = np.einsum("btf,mf->btm", p_ref, np.asarray(fb.mel_fb(16000, n_fft, 128)))
        p, m = spectromel_pallas(
            audio, lengths, sr=16000, n_fft=n_fft, hop_length=hop, n_mels=128,
            interpret=True,
        )
        p, m = np.asarray(p), np.asarray(m)
        assert np.abs(p - p_ref).max() / p_ref.max() < 1e-5
        assert np.abs(m - m_ref).max() / max(m_ref.max(), 1e-9) < 1e-4


def test_chunked_spectrogram_matches_fft(rng):
    """Shared-chunk DFT + frequency-domain Hann == windowed rfft."""
    import jax.numpy as jnp

    from stutter_tpu.ops.spectral import power_spectrogram

    audio = jnp.asarray(rng.randn(3, 24576).astype(np.float32) * 0.3)
    for n_fft, hop in ((2048, 512), (512, 256)):
        p_fft = np.asarray(power_spectrogram(audio, n_fft, hop, method="fft"))
        p_ch = np.asarray(power_spectrogram(audio, n_fft, hop, method="chunked"))
        assert np.abs(p_ch - p_fft).max() / p_fft.max() < 1e-5


def test_spectromel_kernel_stats_match_xla(rng):
    """In-kernel db->DCT->SavGol-delta->masked-stats == the XLA composition."""
    import jax.numpy as jnp

    from stutter_tpu.ops.delta import sg_deltas
    from stutter_tpu.ops.masked import frame_mask, masked_mean_std
    from stutter_tpu.ops.pallas_spectromel import spectromel_pallas
    from stutter_tpu.ops.spectral import mel_power_to_db, mfcc_from_db, power_spectrogram

    t = np.arange(24576) / 16000.0
    rows = [
        0.5 * np.sin(2 * np.pi * 220.7 * t) + 0.05 * rng.randn(24576),
        0.3 * rng.randn(24576),
        0.4 * np.sin(2 * np.pi * 452.2 * t),
        0.2 * rng.randn(24576),
    ]
    audio = jnp.asarray(np.stack(rows).astype(np.float32))
    lengths = jnp.asarray(np.array([24576, 20000, 9000, 6000], np.int32))
    p, stats, tb = spectromel_pallas(
        audio, lengths, with_tuning=True, with_stats=True, interpret=True
    )
    assert stats.shape == (4, 6, 20)

    # XLA reference composition
    n_valid = 1 + lengths // 512
    power = power_spectrogram(audio, 2048, 512, method="fft")
    mask = frame_mask(lengths, 512, power.shape[1])
    power = jnp.where(mask[:, :, None], power, 0.0)
    db = mel_power_to_db(power, mask, 16000, 2048, 128)
    mf = mfcc_from_db(db, 20)
    d1, d2 = sg_deltas(mf, n_valid, orders=(1, 2))
    ref_rows = []
    for x in (mf, d1, d2):
        mean, std = masked_mean_std(x, mask, axis=1)
        ref_rows.extend([mean, std])
    ref = np.stack([np.asarray(r) for r in ref_rows], axis=1)  # [B, 6, 20]
    got = np.asarray(stats)
    assert np.abs(got - ref).max() < 2e-3, np.abs(got - ref).max()
    # means are O(1)-O(100); deltas are small — check relative scale too
    assert np.abs(got - ref).mean() < 2e-4


def test_spectromel_kernel_tuning_matches_xla(rng):
    """In-kernel piptrack+median+histogram tuning == estimate_tuning_bin."""
    import jax.numpy as jnp

    from stutter_tpu.ops.chroma import estimate_tuning_bin
    from stutter_tpu.ops.masked import frame_mask
    from stutter_tpu.ops.pallas_spectromel import spectromel_pallas

    # tonal content so real peaks exist, plus noise-only and near-silent rows
    t = np.arange(24576) / 16000.0
    rows = [
        0.5 * np.sin(2 * np.pi * 220.7 * t) + 0.05 * rng.randn(24576),
        0.4 * np.sin(2 * np.pi * 452.2 * t) + 0.3 * np.sin(2 * np.pi * 1337.9 * t),
        0.2 * rng.randn(24576),
        np.zeros(24576),
    ]
    audio = jnp.asarray(np.stack(rows).astype(np.float32))
    lengths = jnp.asarray(np.array([24576, 20000, 9000, 3000], np.int32))
    for n_fft, hop in ((2048, 512), (512, 256)):
        p, m, tb = spectromel_pallas(
            audio, lengths, sr=16000, n_fft=n_fft, hop_length=hop, n_mels=128,
            with_tuning=True, interpret=True,
        )
        tb_ref = estimate_tuning_bin(jnp.asarray(p), 16000, n_fft)
        np.testing.assert_array_equal(np.asarray(tb), np.asarray(tb_ref))
    # silent clip takes librosa's no-candidate fallback (tuning 0.0 = bin 50)
    assert np.asarray(tb)[3] == 50

def test_chroma_stats_kernel_matches_xla(rng):
    """Fused chroma-apply+stats kernel == table-gather einsum + inf-norm +
    masked mean/std (the XLA tail it replaces), incl. tonal / noise / short /
    silent clips and a forced spread of tuning bins."""
    import jax.numpy as jnp

    from stutter_tpu.ops.chroma import chroma_from_power
    from stutter_tpu.ops.masked import frame_mask, masked_mean_std
    from stutter_tpu.ops.pallas_chroma import chroma_stats_pallas
    from stutter_tpu.ops.spectral import power_spectrogram

    t = np.arange(24576) / 16000.0
    rows = [
        0.5 * np.sin(2 * np.pi * 220.7 * t) + 0.05 * rng.randn(24576),
        0.3 * rng.randn(24576),
        0.4 * np.sin(2 * np.pi * 452.2 * t),
        np.zeros(24576),
    ]
    audio = jnp.asarray(np.stack(rows).astype(np.float32))
    lengths = jnp.asarray(np.array([24576, 20000, 9000, 1000], np.int32))
    n_valid = 1 + lengths // 512
    power = power_spectrogram(audio, 2048, 512, method="fft")
    mask = frame_mask(lengths, 512, power.shape[1])
    power = jnp.where(mask[:, :, None], power, 0.0)
    # cover both table extremes and the no-candidate fallback bin
    tb = jnp.asarray(np.array([0, 50, 99, 50], np.int32))

    ch_ref = chroma_from_power(power, tb, 16000, 2048, 12)
    mean, std = masked_mean_std(ch_ref, mask, axis=1)
    ref = np.concatenate([np.asarray(mean), np.asarray(std)], axis=-1)

    got = np.asarray(
        chroma_stats_pallas(power, tb, n_valid, sr=16000, n_fft=2048,
                            interpret=True)
    )
    assert got.shape == (4, 24)
    assert np.abs(got - ref).max() < 1e-5, np.abs(got - ref).max()
    # silent clip: chroma is all zeros -> zero stats
    assert np.abs(got[3]).max() == 0.0


def test_chroma_stats_kernel_odd_batch(rng):
    """Batch sizes that don't divide the default g_clips still grid cleanly
    (the g auto-tune walks down to a divisor)."""
    import jax.numpy as jnp

    from stutter_tpu.ops.chroma import chroma_from_power
    from stutter_tpu.ops.masked import frame_mask, masked_mean_std
    from stutter_tpu.ops.pallas_chroma import chroma_stats_pallas
    from stutter_tpu.ops.spectral import power_spectrogram

    audio = jnp.asarray(rng.randn(3, 24576).astype(np.float32) * 0.3)
    lengths = jnp.asarray(np.array([24576, 9000, 16000], np.int32))
    n_valid = 1 + lengths // 512
    power = power_spectrogram(audio, 2048, 512, method="fft")
    mask = frame_mask(lengths, 512, power.shape[1])
    power = jnp.where(mask[:, :, None], power, 0.0)
    tb = jnp.asarray(np.array([10, 50, 90], np.int32))
    got = np.asarray(
        chroma_stats_pallas(power, tb, n_valid, interpret=True)
    )
    ch = chroma_from_power(power, tb, 16000, 2048, 12)
    mean, std = masked_mean_std(ch, mask, axis=1)
    ref = np.concatenate([np.asarray(mean), np.asarray(std)], axis=-1)
    assert np.abs(got - ref).max() < 1e-5
