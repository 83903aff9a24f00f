"""ctypes binding for the native (C++) batch WAV loader, with prefetching.

Builds stutter_tpu/native/stutter_io.cpp into a shared library on first use
(g++ -O3 -pthread) and exposes:
  * load_wav_batch(paths, n_max, sr) -> (audio [B, n_max] f32, lengths [B])
  * BatchPrefetcher: background-thread double buffering so the native decode
    of batch k+1 overlaps device compute of batch k (the host->HBM feed
    pipeline from BASELINE.json's north star).

Falls back to the pure-Python reader when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import queue
import subprocess
import threading
from pathlib import Path

import numpy as np

_LIB = None
_LIB_FAILED = False


def _build_and_load() -> ctypes.CDLL | None:
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    src = Path(__file__).resolve().parent.parent / "native" / "stutter_io.cpp"
    so = src.with_suffix(".so")
    try:
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
                 str(src), "-o", str(so)],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(so))
        lib.st_abi_version.restype = ctypes.c_int
        assert lib.st_abi_version() == 1
        lib.st_load_wav_batch.restype = ctypes.c_int
        lib.st_load_wav_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            ctypes.c_int,
        ]
        _LIB = lib
    except Exception:
        _LIB_FAILED = True
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _build_and_load() is not None


def load_wav_batch(
    paths: list[str],
    n_samples_max: int,
    sr: int = 16000,
    n_threads: int = 8,
    decoder=None,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode a batch of WAVs into a padded [B, n_max] f32 buffer + lengths.

    Rows that fail native decode fall back to the Python reader, then to the
    pluggable `decoder` hook (path -> float32 PCM at `sr`; see
    stutter_tpu.io.decode) for non-WAV formats like mp3 — the reference
    decodes mp3 through librosa/audioread (ref: pipeline1.py:100-106), which
    this environment lacks; deployments with ffmpeg register a hook instead.
    Rows that fail everything are zeros with length 0 (reference degrade
    semantics).
    """
    B = len(paths)
    out = np.zeros((B, n_samples_max), np.float32)
    lengths = np.zeros(B, np.int32)
    lib = _build_and_load()
    if lib is not None and B:
        c_paths = (ctypes.c_char_p * B)(*[p.encode() for p in paths])
        lib.st_load_wav_batch(
            c_paths,
            B,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n_samples_max,
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            sr,
            n_threads,
        )
    # Python / hook fallback for rows the native decoder rejected
    from stutter_tpu.io.decode import decode_audio

    for i, p in enumerate(paths):
        if lengths[i] == 0:
            try:
                y = decode_audio(p, sr, decoder=decoder)
                n = min(len(y), n_samples_max)
                out[i, :n] = y[:n]
                lengths[i] = n
            except Exception:
                pass
    return out, lengths


class BatchPrefetcher:
    """Double-buffered corpus iterator: native decode runs one batch ahead.

    for audio, lengths, items in BatchPrefetcher(paths, bucket, batch): ...
    """

    def __init__(
        self,
        paths: list[str],
        n_samples_max: int,
        batch_size: int = 256,
        sr: int = 16000,
        depth: int = 2,
        decoder=None,
    ):
        self.paths = paths
        self.n_samples_max = n_samples_max
        self.batch_size = batch_size
        self.sr = sr
        self.decoder = decoder
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._thread = threading.Thread(target=self._producer, daemon=True)

    def _producer(self):
        for s in range(0, len(self.paths), self.batch_size):
            chunk = self.paths[s : s + self.batch_size]
            audio, lengths = load_wav_batch(
                chunk, self.n_samples_max, self.sr, decoder=self.decoder
            )
            self._q.put((audio, lengths, chunk))
        self._q.put(None)

    def __iter__(self):
        self._thread.start()
        while True:
            item = self._q.get()
            if item is None:
                return
            yield item
