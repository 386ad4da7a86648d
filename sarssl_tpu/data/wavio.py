"""WAV read/write via scipy (soundfile is not in the environment).

Writes float32 WAVs so the trees are bit-compatible with what the reference's
soundfile.write produces for float input.
"""
from __future__ import annotations

import numpy as np
from scipy.io import wavfile


def write_wav(path: str, data: np.ndarray, fs: int):
    wavfile.write(path, fs, data.astype(np.float32))


def read_wav(path: str):
    """Returns (data float32 (nsample, nch), fs)."""
    fs, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 1:
        data = data[:, None]
    return data, fs
