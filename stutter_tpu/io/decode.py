"""Pluggable audio-decode hooks — the framework's mp3 (and any-codec) story.

The reference ingests mp3 via librosa -> audioread/soundfile
(ref: pipeline1.py:100-106).  This environment ships no mp3 decoder, so the
framework's built-in path is WAV-only (stutter_tpu.io.wav + the native C++
batch loader).  Deployments that do have a codec (ffmpeg, torchaudio, ...)
register a decoder hook and every ingestion path — extract_corpus,
preprocess, Predictor.predict_file, load_wav_batch — picks it up:

    from stutter_tpu.io.decode import register_decoder

    def ffmpeg_decode(path: str, sr: int) -> np.ndarray:
        out = subprocess.run(
            ["ffmpeg", "-i", path, "-f", "f32le", "-ac", "1", "-ar", str(sr), "-"],
            capture_output=True, check=True).stdout
        return np.frombuffer(out, np.float32)

    register_decoder((".mp3", ".m4a", ".ogg"), ffmpeg_decode)

A decoder takes (path, target_sr) and returns mono float32 PCM at target_sr.
Per-call hooks can also be passed explicitly (`decoder=` kwargs) without
touching the global registry.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np

Decoder = Callable[[str, int], np.ndarray]

_REGISTRY: dict[str, Decoder] = {}


def register_decoder(exts: tuple[str, ...] | str, fn: Decoder) -> None:
    """Register `fn(path, sr) -> float32 PCM` for the given extensions."""
    if isinstance(exts, str):
        exts = (exts,)
    for e in exts:
        _REGISTRY[e.lower().lstrip(".")] = fn


def unregister_decoder(exts: tuple[str, ...] | str) -> None:
    if isinstance(exts, str):
        exts = (exts,)
    for e in exts:
        _REGISTRY.pop(e.lower().lstrip("."), None)


def get_decoder(path: str) -> Decoder | None:
    ext = os.path.splitext(path)[1].lower().lstrip(".")
    return _REGISTRY.get(ext)


def decode_audio(path: str, sr: int, decoder: Decoder | None = None) -> np.ndarray:
    """Decode `path` to mono float32 PCM at `sr`.

    Order: explicit `decoder` arg -> built-in WAV reader (resampling on-device
    via ops.resample when rates differ) -> registered hook for the extension.
    Raises if nothing can decode the file (callers degrade per the reference's
    skip-and-count contract, pipeline1.py:374-376).
    """
    if decoder is not None:
        return np.asarray(decoder(path, sr), np.float32)
    try:
        from stutter_tpu.io.wav import read_wav

        y, file_sr = read_wav(path)
        if y.ndim == 2:
            y = y.mean(axis=1)
        if file_sr != sr:
            from stutter_tpu.ops.resample import resample

            y = resample(y, file_sr, sr)
        return np.asarray(y, np.float32)
    except Exception:
        hook = get_decoder(path)
        if hook is not None:
            return np.asarray(hook(path, sr), np.float32)
        # built-in MPEG fallback: libmpg123 over ctypes where the shared
        # library exists (stutter_tpu.io.mp3) — the reference's mp3 ingestion
        # (pipeline1.py:100-106) without an audio-stack dependency
        if os.path.splitext(path)[1].lower() == ".mp3":
            from stutter_tpu.io import mp3

            if mp3.available():
                y, _ = mp3.load_mp3(path, sr)
                return y
        raise
