"""Spectral ops: STFT, magnitudes, loudness, multi-scale spectral distances.

JAX equivalents of the ``ddsp.spectral_ops`` surface consumed by the
reference's losses and evaluation protocol (SpectralLoss at
/root/reference/ddsp_piano/modules/losses.py:7-32; per-10s-segment evaluation
at /root/reference/evaluate_model.py:85-104). STFT framing/padding follows
the tf.signal.stft convention (hop = frame_size * (1 - overlap), periodic
Hann window, pad_end) so loss values are comparable with the reference
protocol.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ddsp_piano_tpu.ops import core

Array = jax.Array


def frame(x: Array, frame_length: int, frame_step: int,
          pad_end: bool = False) -> Array:
    """Slice (..., samples) into (..., n_frames, frame_length) windows.

    Matches tf.signal.frame: with pad_end, n_frames = ceil(len / step) and
    the tail is zero-padded; without, n_frames = 1 + (len - length) // step.
    """
    x = jnp.asarray(x)
    n = x.shape[-1]
    if pad_end:
        n_frames = -(-n // frame_step)
        full_len = (n_frames - 1) * frame_step + frame_length
        pad = [(0, 0)] * (x.ndim - 1) + [(0, full_len - n)]
        x = jnp.pad(x, pad)
    else:
        n_frames = 1 + (n - frame_length) // frame_step
    if frame_length % frame_step == 0:
        # Overlapping windows whose hop divides the length (all the STFT
        # losses: 75 % overlap) need no gather: chop into hop-sized rows
        # and concatenate `ratio` shifted row views — a TPU gather of
        # (n_frames, frame_length) indices was the hot op of the
        # multi-scale loss (~1.8 ms per FFT size on the training step).
        ratio = frame_length // frame_step
        n_rows = n_frames + ratio - 1
        rows_len = n_rows * frame_step
        cur = x.shape[-1]
        if cur < rows_len:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, rows_len - cur)])
        rows = x[..., :rows_len].reshape(*x.shape[:-1], n_rows, frame_step)
        return jnp.concatenate(
            [rows[..., i:i + n_frames, :] for i in range(ratio)], axis=-1)
    idx = (jnp.arange(n_frames)[:, None] * frame_step
           + jnp.arange(frame_length)[None, :])
    return x[..., idx]


def stft(audio: Array, frame_size: int = 2048, overlap: float = 0.75,
         pad_end: bool = True) -> Array:
    """Short-time Fourier transform with periodic Hann window.

    Returns complex (..., n_frames, frame_size // 2 + 1).
    """
    hop = int(frame_size * (1.0 - overlap))
    frames = frame(core.f32(audio), frame_size, hop, pad_end=pad_end)
    window = core.hann_window(frame_size, periodic=True)
    return jnp.fft.rfft(frames * window, n=frame_size, axis=-1)


@functools.lru_cache(maxsize=16)
def _dft_mag_basis(frame_size: int):
    """(frame_size, frame_size//2+1) cos/sin DFT bases with the periodic
    Hann window folded in, built in float64 and cast to f32.

    Returns NUMPY arrays on purpose: the cache is shared across traces, so
    caching `jnp.asarray` outputs would capture a tracer when the first
    call happens inside a jit trace and leak it into every later trace
    with the same size. Numpy constants are staged per-trace by XLA.
    """
    import numpy as np
    n = np.arange(frame_size, dtype=np.float64)
    k = np.arange(frame_size // 2 + 1, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(n, k) / frame_size
    denom = frame_size + (1 - frame_size % 2) - 1  # core.hann_window
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / denom)
    cos_b = (np.cos(ang) * w[:, None]).astype(np.float32)
    sin_b = (np.sin(ang) * w[:, None]).astype(np.float32)
    return cos_b, sin_b


def _compute_mag_mm(audio: Array, size: int, overlap: float,
                    pad_end: bool) -> Array:
    """|STFT| as two f32 basis matmuls (windowed DFT) + hypot.

    XLA's TPU FFT lowers to a slow generic radix path; for the loss sizes
    (64..2048, 75 % overlap) the windowed-DFT matmul rides the MXU instead.
    Matches the rfft path up to float reassociation (HIGHEST precision) and
    has a finite gradient at zero magnitude (jnp.abs of a complex STFT
    does not). DDSP_PIANO_TPU_STFT_PREC (read at trace time:
    'highest' default | 'high' | 'default') selects the TPU matmul pass
    count (f32 / bf16x3 / bf16) for the two basis einsums — a measurement
    knob; flip only on a measured win with recorded loss deltas.
    """
    hop = int(size * (1.0 - overlap))
    frames = frame(core.f32(audio), size, hop, pad_end=pad_end)
    cos_b, sin_b = _dft_mag_basis(size)
    table = {'highest': jax.lax.Precision.HIGHEST,
             'high': jax.lax.Precision.HIGH,
             'default': jax.lax.Precision.DEFAULT}
    name = os.environ.get('DDSP_PIANO_TPU_STFT_PREC', 'highest')
    if name not in table:
        raise ValueError(
            f'DDSP_PIANO_TPU_STFT_PREC={name!r}: expected one of '
            f'{sorted(table)}')
    prec = table[name]
    re = jnp.einsum('...tn,nk->...tk', frames, cos_b, precision=prec)
    im = jnp.einsum('...tn,nk->...tk', frames, sin_b, precision=prec)
    return jnp.sqrt(re * re + im * im + 1e-24)


def compute_mag(audio: Array, size: int = 2048, overlap: float = 0.75,
                pad_end: bool = True, method: str = 'auto') -> Array:
    """STFT magnitudes. method: 'auto' | 'fft' | 'mm'.

    'auto' resolves via DDSP_PIANO_TPU_STFT (read at trace time): 'mm'
    forces the windowed-DFT matmul, 'fft' (the default) the rfft path.
    The TPU train-step A/B measured fft vs mm as a wash (38.7 vs 38.6
    ms/step, BASELINE.md) — 'mm' stays an opt-in knob, kept for its finite
    zero-magnitude gradient and as an MXU path should FFT cost ever grow.
    """
    if method == 'auto':
        method = os.environ.get('DDSP_PIANO_TPU_STFT', 'fft')
        if method not in ('fft', 'mm'):
            # Loud, like DDSP_PIANO_TPU_STFT_PREC: a silently-misread flag
            # would corrupt every A/B measurement that uses it.
            raise ValueError(
                f"DDSP_PIANO_TPU_STFT={method!r}: expected 'fft' or 'mm'")
    if method == 'mm':
        return _compute_mag_mm(audio, size, overlap, pad_end)
    if method != 'fft':
        raise ValueError(
            f"compute_mag method={method!r}: expected 'auto', 'fft' or 'mm'")
    return jnp.abs(stft(audio, frame_size=size, overlap=overlap,
                        pad_end=pad_end)).astype(jnp.float32)


def compute_logmag(audio: Array, size: int = 2048, **kwargs) -> Array:
    return core.safe_log(compute_mag(audio, size=size, **kwargs))


def mean_difference(target: Array, value: Array, loss_type: str = 'L1',
                    weights: Optional[Array] = None) -> Array:
    """Mean of an elementwise difference metric."""
    difference = target - value
    weights = 1.0 if weights is None else weights
    loss_type = loss_type.upper()
    if loss_type == 'L1':
        return jnp.mean(jnp.abs(difference * weights))
    if loss_type == 'L2':
        return jnp.mean(difference ** 2 * weights)
    if loss_type == 'COSINE':
        t = target.reshape(target.shape[0], -1)
        v = value.reshape(value.shape[0], -1)
        num = jnp.sum(t * v, axis=-1)
        den = jnp.linalg.norm(t, axis=-1) * jnp.linalg.norm(v, axis=-1)
        return jnp.mean(1.0 - num / jnp.maximum(den, 1e-12))
    raise ValueError(f"Unknown loss_type: {loss_type!r}")


# A-weighting for perceptual loudness (IEC 61672:2003).
def _a_weighting_db(frequencies_hz: Array) -> Array:
    f = jnp.maximum(core.f32(frequencies_hz), 1e-6)
    f2 = f ** 2
    ra = (12194.0 ** 2 * f2 ** 2) / (
        (f2 + 20.6 ** 2)
        * jnp.sqrt((f2 + 107.7 ** 2) * (f2 + 737.9 ** 2))
        * (f2 + 12194.0 ** 2))
    return 20.0 * jnp.log10(jnp.maximum(ra, 1e-20)) + 2.0


def compute_loudness(audio: Array, sample_rate: int = 16000,
                     frame_rate: int = 250, n_fft: int = 2048,
                     range_db: float = 120.0,
                     ref_db: float = 0.0) -> Array:
    """Perceptual (A-weighted) loudness in dB at frame rate.

    Follows the ddsp recipe: STFT power -> per-bin A-weighting -> mean power
    across bins -> dB, clipped to [-range_db + ref_db, inf).
    """
    audio = core.f32(audio)
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[jnp.newaxis, :]
    hop = sample_rate // frame_rate
    overlap = 1.0 - hop / n_fft
    s = stft(audio, frame_size=n_fft, overlap=overlap, pad_end=True)
    power = jnp.abs(s) ** 2
    freqs = jnp.fft.rfftfreq(n_fft, d=1.0 / sample_rate)
    a_weight = 10.0 ** (_a_weighting_db(freqs) / 10.0)
    weighted_power = jnp.mean(power * a_weight, axis=-1)
    loudness = 10.0 * jnp.log10(jnp.maximum(weighted_power, 1e-20)) - ref_db
    loudness = jnp.maximum(loudness, -range_db)
    return loudness[0] if squeeze else loudness


def multi_scale_spectral_loss(
        target_audio: Array,
        audio: Array,
        fft_sizes: Sequence[int] = (2048, 1024, 512, 256, 128, 64),
        loss_type: str = 'L1',
        mag_weight: float = 1.0,
        logmag_weight: float = 0.0,
        delta_time_weight: float = 0.0,
        delta_freq_weight: float = 0.0,
        cumsum_freq_weight: float = 0.0,
        loudness_weight: float = 0.0,
        sample_rate: int = 16000,
        weights: Optional[Array] = None) -> Array:
    """Multi-resolution STFT loss (the reference's headline training loss).

    Same term structure as ddsp.losses.SpectralLoss: per-FFT-size L1/L2 on
    magnitudes, optional log magnitudes, time/freq deltas, cumulative-freq
    (spectral "Wasserstein-ish") term, plus an optional loudness term.
    """
    loss = 0.0
    diff_t = lambda m: m[:, 1:] - m[:, :-1]
    diff_f = lambda m: m[..., 1:] - m[..., :-1]
    for size in fft_sizes:
        target_mag = compute_mag(target_audio, size=size)
        value_mag = compute_mag(audio, size=size)
        if mag_weight > 0:
            loss += mag_weight * mean_difference(target_mag, value_mag,
                                                 loss_type, weights)
        if delta_time_weight > 0:
            loss += delta_time_weight * mean_difference(
                diff_t(target_mag), diff_t(value_mag), loss_type, weights)
        if delta_freq_weight > 0:
            loss += delta_freq_weight * mean_difference(
                diff_f(target_mag), diff_f(value_mag), loss_type, weights)
        if cumsum_freq_weight > 0:
            loss += cumsum_freq_weight * mean_difference(
                jnp.cumsum(target_mag, axis=-1),
                jnp.cumsum(value_mag, axis=-1), loss_type, weights)
        if logmag_weight > 0:
            loss += logmag_weight * mean_difference(
                core.safe_log(target_mag), core.safe_log(value_mag),
                loss_type, weights)
    if loudness_weight > 0:
        target_l = compute_loudness(target_audio, sample_rate=sample_rate)
        value_l = compute_loudness(audio, sample_rate=sample_rate)
        loss += loudness_weight * mean_difference(target_l, value_l,
                                                  loss_type, weights)
    return loss


def compute_mel(audio: Array, sample_rate: int = 16000, lo_hz: float = 0.0,
                hi_hz: float = 8000.0, bins: int = 64, fft_size: int = 2048,
                overlap: float = 0.75, pad_end: bool = True) -> Array:
    """Mel-scaled magnitude spectrogram (utility for summaries/analysis)."""
    mag = compute_mag(audio, size=fft_size, overlap=overlap, pad_end=pad_end)
    num_spectrogram_bins = mag.shape[-1]
    mel_matrix = _linear_to_mel_matrix(bins, num_spectrogram_bins,
                                       sample_rate, lo_hz, hi_hz)
    return jnp.matmul(mag, mel_matrix)


@functools.lru_cache(maxsize=8)
def _linear_to_mel_matrix(num_mel_bins, num_spectrogram_bins, sample_rate,
                          lower_edge_hertz, upper_edge_hertz):
    import numpy as np

    def hz_to_mel(f):
        return 1127.0 * np.log1p(f / 700.0)

    nyquist = sample_rate / 2.0
    linear_freqs = np.linspace(0, nyquist, num_spectrogram_bins)
    mel_edges = np.linspace(hz_to_mel(lower_edge_hertz),
                            hz_to_mel(upper_edge_hertz), num_mel_bins + 2)
    mel_freqs = hz_to_mel(linear_freqs)
    lower, center, upper = mel_edges[:-2], mel_edges[1:-1], mel_edges[2:]
    up_slope = (mel_freqs[:, None] - lower[None, :]) / np.maximum(
        center - lower, 1e-8)[None, :]
    down_slope = (upper[None, :] - mel_freqs[:, None]) / np.maximum(
        upper - center, 1e-8)[None, :]
    weights = np.maximum(0.0, np.minimum(up_slope, down_slope))
    # Numpy on purpose: this cache is shared across traces (see
    # _dft_mag_basis) — caching a jnp array would leak the first trace's
    # tracer into later traces with the same signature.
    return weights.astype(np.float32)
