"""Core signal ops (L0).

JAX re-implementations of the tensor-function layer the reference application
consumes from ``ddsp.core`` (see reference SURVEY §2.8; import sites e.g.
/root/reference/ddsp_piano/modules/sub_modules.py:5 and
/root/reference/ddsp_piano/modules/inharm_synth.py:4), plus the repo-local
extensions ``exp_tanh`` (inharm_synth.py:8-17) and ``get_inharmonic_freq``
(inharm_synth.py:20-46).

All functions are pure, shape-static and jit/vmap/grad-compatible. Numerics
are validated against TensorFlow golden values in tests/test_core_ops.py
(the reference delegates these ops to TF kernels; bit-level conventions such
as the legacy ``tf.compat.v1.image.resize(align_corners=False)`` coordinate
mapping and the Hann overlap-add 'window' resampling are reproduced exactly
so released checkpoints stay numerically compatible).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

_2PI = 2.0 * math.pi


def f32(x) -> Array:
    """Ensure input is a float32 jnp array."""
    return jnp.asarray(x, dtype=jnp.float32)


def midi_to_hz(notes) -> Array:
    """MIDI note number to frequency in Hz (A4 = 69 = 440 Hz)."""
    notes = f32(notes)
    return 440.0 * (2.0 ** ((notes - 69.0) / 12.0))


def hz_to_midi(frequencies) -> Array:
    """Frequency in Hz to (fractional) MIDI note number."""
    frequencies = f32(frequencies)
    notes = 12.0 * (jnp.log2(frequencies) - jnp.log2(440.0)) + 69.0
    return jnp.where(frequencies <= 0.0, 0.0, notes)


def unit_to_midi(unit, midi_min=20.0, midi_max=90.0, clip=False):
    unit = jnp.clip(unit, 0.0, 1.0) if clip else unit
    return midi_min + (midi_max - midi_min) * unit


def midi_to_unit(midi, midi_min=20.0, midi_max=90.0, clip=False):
    unit = (f32(midi) - midi_min) / (midi_max - midi_min)
    return jnp.clip(unit, 0.0, 1.0) if clip else unit


def exp_sigmoid(x, exponent=10.0, max_value=2.0, threshold=1e-7) -> Array:
    """Exponentiated sigmoid nonlinearity for positive synth controls.

    ``max_value * sigmoid(x) ** log(exponent) + threshold``
    """
    x = f32(x)
    return max_value * jax.nn.sigmoid(x) ** jnp.log(exponent) + threshold


def positive_tanh(x) -> Array:
    return 0.5 * (jnp.tanh(f32(x)) + 1.0)


def exp_tanh(x, max_value=2.0, exponent=10.0, gain=1.0, threshold=1e-7) -> Array:
    """exp_sigmoid variant built on tanh; saturates faster.

    Reference: inharm_synth.py:13-17.
    """
    y = max_value * positive_tanh(gain * f32(x)) ** jnp.log(exponent)
    return y + threshold


def safe_divide(numerator, denominator, eps=1e-7) -> Array:
    """Division that replaces a zero denominator by eps."""
    safe_denominator = jnp.where(denominator == 0.0, eps, denominator)
    return numerator / safe_denominator


def safe_log(x, eps=1e-5) -> Array:
    """Logarithm clamped away from non-positive inputs."""
    return jnp.log(jnp.where(x <= eps, eps, x))


def remove_above_nyquist(frequency_envelopes, amplitude_envelopes,
                         sample_rate=16000) -> Array:
    """Zero amplitudes of oscillators at or above the Nyquist frequency."""
    frequency_envelopes = f32(frequency_envelopes)
    amplitude_envelopes = f32(amplitude_envelopes)
    mask = (frequency_envelopes < sample_rate / 2.0).astype(jnp.float32)
    return amplitude_envelopes * mask


def get_harmonic_frequencies(frequencies, n_harmonics: int) -> Array:
    """Integer multiples of fundamental frequencies.

    Args:
        frequencies: (..., 1) fundamental frequencies in Hz.
        n_harmonics: number of harmonics.
    Returns:
        (..., n_harmonics) harmonic frequencies.
    """
    frequencies = f32(frequencies)
    ratios = jnp.linspace(1.0, float(n_harmonics), n_harmonics,
                          dtype=jnp.float32)
    return frequencies * ratios


def get_inharmonic_freq(f0_hz, inharm_coef, n_harmonics: int):
    """Stiff-string partial frequencies f_k = f0 * k * sqrt(1 + B k^2).

    Behavioral equivalent of reference inharm_synth.py:20-46.

    Args:
        f0_hz: (batch, time, 1) fundamental frequencies in Hz.
        inharm_coef: (batch, time, 1) inharmonicity coefficient B.
        n_harmonics: number of partials.
    Returns:
        inharmonic_freq: (batch, time, n_harmonics) partial frequencies (Hz).
        harmonic_shifts: (batch, time, n_harmonics) multiplicative deviation
            from integer harmonicity (sqrt(1 + B k^2) - 1).
    """
    f0_hz = f32(f0_hz)
    inharm_coef = f32(inharm_coef)
    k = jnp.linspace(1.0, float(n_harmonics), n_harmonics, dtype=jnp.float32)
    inharm_factor = jnp.sqrt(k * k * inharm_coef + 1.0)
    inharmonic_freq = f0_hz * k * inharm_factor
    harmonic_shifts = inharm_factor - 1.0
    return inharmonic_freq, harmonic_shifts


# -----------------------------------------------------------------------------
# Resampling
# -----------------------------------------------------------------------------


def _ensure_3d(x: Array):
    """Reshape 1-D/2-D inputs to (batch, time, channels); report original rank."""
    rank = x.ndim
    if rank == 1:
        x = x[jnp.newaxis, :, jnp.newaxis]
    elif rank == 2:
        x = x[:, :, jnp.newaxis]
    return x, rank


def _restore_rank(x: Array, rank: int) -> Array:
    if rank == 1:
        return x[0, :, 0]
    if rank == 2:
        return x[:, :, 0]
    return x


def linear_resample(x: Array, n_timesteps: int, align_corners: bool = False
                    ) -> Array:
    """Linear resampling along axis 1 of a (batch, time, ...) array.

    Matches the legacy ``tf.compat.v1.image.resize_bilinear`` coordinate
    convention used by the reference's resample(method='linear'):
    with align_corners=False (the reference default, add_endpoint=True) source
    position of output index j is ``j * n_in / n_out``; with
    align_corners=True it is ``j * (n_in - 1) / (n_out - 1)``.
    """
    x = f32(x)
    n_in = x.shape[1]
    if n_in == n_timesteps:
        return x
    if align_corners and n_timesteps > 1:
        scale = (n_in - 1) / (n_timesteps - 1)
    else:
        scale = n_in / n_timesteps
    src = jnp.arange(n_timesteps, dtype=jnp.float32) * scale
    lo = jnp.floor(src).astype(jnp.int32)
    lo = jnp.clip(lo, 0, n_in - 1)
    hi = jnp.clip(lo + 1, 0, n_in - 1)
    frac = src - lo.astype(jnp.float32)
    shape = [1, n_timesteps] + [1] * (x.ndim - 2)
    frac = frac.reshape(shape)
    x_lo = jnp.take(x, lo, axis=1)
    x_hi = jnp.take(x, hi, axis=1)
    return x_lo + (x_hi - x_lo) * frac


def nearest_resample(x: Array, n_timesteps: int) -> Array:
    """Nearest-neighbor resampling along axis 1 (legacy TF v1 convention)."""
    x = f32(x)
    n_in = x.shape[1]
    src = jnp.arange(n_timesteps, dtype=jnp.float32) * (n_in / n_timesteps)
    idx = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, n_in - 1)
    return jnp.take(x, idx, axis=1)


def hann_window(window_length: int, periodic: bool = True) -> Array:
    """Hann window matching tf.signal.hann_window bit-conventions.

    TF's raised-cosine denominator is ``L + periodic*(1 - L%2) - 1``: an odd
    "periodic" window uses L-1 (same as symmetric), an even one uses L.
    """
    if window_length == 1:
        return jnp.ones((1,), dtype=jnp.float32)
    denom = window_length + (1 - window_length % 2 if periodic else 0) - 1
    n = jnp.arange(window_length, dtype=jnp.float32)
    return 0.5 - 0.5 * jnp.cos(_2PI * n / denom)


def upsample_with_windows(inputs: Array, n_timesteps: int,
                          add_endpoint: bool = True) -> Array:
    """Upsample (batch, n_frames, ch) by overlapping Hann windows.

    Semantics match the reference's resample(method='window') path: append
    an endpoint frame, then constant-overlap-add with half-overlapping
    periodic Hann windows of length 2*hop and trim one hop from each edge.
    Algebraically this reduces to a raised-cosine crossfade between adjacent
    frames, which is how it is computed here (no overlap-add scatter, which
    would be HBM-unfriendly on TPU):

        out[k*hop + s] = a[k] * (1 - h[s]) + a[k+1] * h[s],
        h[s] = sin^2(pi*s/(2*hop))
    """
    if inputs.ndim != 3:
        raise ValueError("upsample_with_windows expects (batch, time, ch), "
                         f"got shape {inputs.shape}")
    inputs = f32(inputs)
    if add_endpoint:
        inputs = jnp.concatenate([inputs, inputs[:, -1:, :]], axis=1)
    n_frames = inputs.shape[1]
    n_intervals = n_frames - 1
    if n_frames >= n_timesteps:
        raise ValueError(f"upsample_with_windows can only upsample: "
                         f"{n_frames} frames -> {n_timesteps} timesteps.")
    if n_timesteps % n_intervals != 0:
        raise ValueError(f"n_timesteps ({n_timesteps}) must be divisible by "
                         f"n_intervals ({n_intervals}).")
    hop = n_timesteps // n_intervals
    s = jnp.arange(hop, dtype=jnp.float32)
    h = jnp.sin(math.pi * s / (2.0 * hop)) ** 2  # (hop,)
    left = inputs[:, :-1, jnp.newaxis, :]        # (b, n_intervals, 1, ch)
    right = inputs[:, 1:, jnp.newaxis, :]
    h = h[jnp.newaxis, jnp.newaxis, :, jnp.newaxis]
    out = left * (1.0 - h) + right * h           # (b, n_intervals, hop, ch)
    b, _, _, ch = out.shape
    return out.reshape(b, n_timesteps, ch)


def resample(inputs: Array, n_timesteps: int, method: str = 'linear',
             add_endpoint: bool = True) -> Array:
    """Resample along the time axis (axis 1), any of 1-D to 4-D inputs.

    Methods: 'nearest', 'linear' (legacy-bilinear coordinates), 'window'
    (overlapping Hann). Mirrors the reference API surface consumed at
    sub_modules.py:5 and inharm_synth.py:117-119.
    """
    inputs = f32(inputs)
    if inputs.ndim == 4:
        b, t, c1, c2 = inputs.shape
        out = resample(inputs.reshape(b, t, c1 * c2), n_timesteps,
                       method=method, add_endpoint=add_endpoint)
        return out.reshape(b, n_timesteps, c1, c2)
    x, rank = _ensure_3d(inputs)
    if method == 'nearest':
        out = nearest_resample(x, n_timesteps)
    elif method == 'linear':
        out = linear_resample(x, n_timesteps, align_corners=not add_endpoint)
    elif method == 'window':
        out = upsample_with_windows(x, n_timesteps, add_endpoint=add_endpoint)
    else:
        raise ValueError(f"Unknown resample method: {method!r} "
                         "(expected 'nearest', 'linear' or 'window').")
    return _restore_rank(out, rank)


# -----------------------------------------------------------------------------
# Phase accumulation
# -----------------------------------------------------------------------------


def angular_cumsum(angular_frequency: Array, chunk_size: int = 1000) -> Array:
    """Cumulative sum of angular frequency with chunked mod-2pi accumulation.

    Avoids float32 phase error build-up on long sequences (the reference
    enables this at inference; inharm_synth.py:73-77). Axis 1 is time.
    """
    x = f32(angular_frequency)
    length = x.shape[1]
    n_chunks = -(-length // chunk_size)
    pad = n_chunks * chunk_size - length
    if pad:
        pad_widths = [(0, 0)] * x.ndim
        pad_widths[1] = (0, pad)
        x = jnp.pad(x, pad_widths)
    chunked = x.reshape((x.shape[0], n_chunks, chunk_size) + x.shape[2:])
    phase = jnp.cumsum(chunked, axis=2)
    phase = jnp.mod(phase, _2PI)
    # Offset of each chunk = accumulated end-phase of all previous chunks.
    last = phase[:, :, -1]
    offsets = jnp.mod(jnp.cumsum(last, axis=1) - last, _2PI)
    phase = jnp.mod(phase + offsets[:, :, jnp.newaxis], _2PI)
    phase = phase.reshape((x.shape[0], n_chunks * chunk_size) + x.shape[2:])
    return phase[:, :length]


def pad_or_trim_to_expected_length(vector, expected_len: int,
                                   pad_value: float = 0.0,
                                   len_tolerance: int = 20):
    """Crop or right-pad last axis to expected_len (numpy/jnp)."""
    expected_len = int(expected_len)
    vector_len = int(vector.shape[-1])
    if abs(vector_len - expected_len) > len_tolerance:
        raise ValueError(
            f"Vector length {vector_len} differs from expected "
            f"{expected_len} by more than tolerance {len_tolerance}.")
    if vector_len > expected_len:
        return vector[..., :expected_len]
    if vector_len < expected_len:
        pad_widths = [(0, 0)] * (vector.ndim - 1) + [(0, expected_len - vector_len)]
        return jnp.pad(jnp.asarray(vector), pad_widths,
                       constant_values=pad_value)
    return vector


def make_iterable(x):
    """Wrap a single object into a tuple; pass through iterables."""
    if x is None:
        return ()
    if isinstance(x, (list, tuple)):
        return tuple(x)
    return (x,)


def cross_fade(a: Array, b: Array, n: Optional[int] = None) -> Array:
    """Equal-power crossfade of the last n samples of a into first n of b."""
    if n is None:
        n = min(a.shape[-1], b.shape[-1])
    if n == 0:
        # a[..., :-0] would be empty and silently drop all of `a`.
        return jnp.concatenate([a, b], axis=-1)
    t = jnp.linspace(0.0, 1.0, n, dtype=jnp.float32)
    fade_out = jnp.cos(t * math.pi / 2.0)
    fade_in = jnp.sin(t * math.pi / 2.0)
    overlap = a[..., -n:] * fade_out + b[..., :n] * fade_in
    return jnp.concatenate([a[..., :-n], overlap, b[..., n:]], axis=-1)
