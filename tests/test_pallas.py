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
