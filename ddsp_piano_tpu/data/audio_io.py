"""Audio file I/O and host-side resampling (no pydub/soundfile deps).

Equivalents of the reference's pydub-based helpers
(/root/reference/ddsp_piano/utils/io_utils.py:50-74, 245-253): wav
read/decode to float32 mono at a target rate, wav write, and dBFS
normalization.
"""

from __future__ import annotations

import wave
from fractions import Fraction
from typing import Optional

import numpy as np


def read_wav(path: str):
    """Read a wav file -> (float32 array (n_samples, channels), rate)."""
    try:
        from scipy.io import wavfile
        rate, data = wavfile.read(path)
        if data.dtype == np.int16:
            data = data.astype(np.float32) / 32768.0
        elif data.dtype == np.int32:
            data = data.astype(np.float32) / 2147483648.0
        elif data.dtype == np.uint8:
            data = (data.astype(np.float32) - 128.0) / 128.0
        else:
            data = data.astype(np.float32)
    except Exception:
        with wave.open(path, 'rb') as w:
            rate = w.getframerate()
            n = w.getnframes()
            width = w.getsampwidth()
            raw = w.readframes(n)
            if width == 2:
                data = np.frombuffer(raw, '<i2').astype(np.float32) / 32768.0
            elif width == 4:
                data = np.frombuffer(raw, '<i4').astype(np.float32) / 2147483648.0
            elif width == 3:
                b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
                ints = (b[:, 0].astype(np.int32)
                        | (b[:, 1].astype(np.int32) << 8)
                        | (b[:, 2].astype(np.int32) << 16))
                ints = np.where(ints >= 1 << 23, ints - (1 << 24), ints)
                data = ints.astype(np.float32) / float(1 << 23)
            else:
                raise ValueError(f"Unsupported wav sample width {width}")
            channels = w.getnchannels()
            data = data.reshape(-1, channels)
    if data.ndim == 1:
        data = data[:, np.newaxis]
    return data, rate


def resample_audio(audio: np.ndarray, orig_rate: int,
                   target_rate: int) -> np.ndarray:
    """Polyphase resampling along axis 0."""
    if orig_rate == target_rate:
        return audio
    from scipy.signal import resample_poly
    frac = Fraction(target_rate, orig_rate).limit_denominator(1000)
    return resample_poly(audio, frac.numerator, frac.denominator,
                         axis=0).astype(np.float32)


def load_audio_as_signal(audio_path: str,
                         sample_rate: int = 16000) -> np.ndarray:
    """Load audio as mono float32 in [-1, 1] at the target sample rate.

    Matches the reference's expected-length convention: the output length is
    round(duration_at_original_rate * sample_rate), padded/trimmed after
    resampling.
    """
    data, rate = read_wav(audio_path)
    mono = data.mean(axis=1)
    expected_len = int(len(mono) / rate * sample_rate)
    audio = resample_audio(mono, rate, sample_rate)
    if len(audio) > expected_len:
        audio = audio[:expected_len]
    elif len(audio) < expected_len:
        audio = np.pad(audio, (0, expected_len - len(audio)))
    return audio.astype(np.float32)


def write_wav(path: str, audio: np.ndarray, sample_rate: int,
              clip: bool = True):
    """Write mono/stereo float audio to a 16-bit wav."""
    audio = np.asarray(audio, np.float32)
    if audio.ndim == 1:
        audio = audio[:, np.newaxis]
    if clip:
        audio = np.clip(audio, -1.0, 1.0)
    pcm = (audio * 32767.0).astype('<i2')
    with wave.open(path, 'wb') as w:
        w.setnchannels(audio.shape[1])
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(pcm.tobytes())


def dbfs(audio: np.ndarray) -> float:
    """RMS level relative to full scale, in dB (pydub convention)."""
    rms = float(np.sqrt(np.mean(np.square(audio), dtype=np.float64)))
    if rms <= 0:
        return -float('inf')
    return 20.0 * np.log10(rms)


def normalize_audio(audio_file: str, volume: float = -20.0):
    """Rewrite a wav file gain-adjusted to the target dBFS level."""
    data, rate = read_wav(audio_file)
    gain_db = volume - dbfs(data)
    write_wav(audio_file, data * (10.0 ** (gain_db / 20.0)), rate)
