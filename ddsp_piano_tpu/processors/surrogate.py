"""Surrogate additive synthesizer (Hayes-style complex-amplitude surrogate).

Behavioral equivalent of /root/reference/ddsp_piano/modules/surrogate_synth.py:
oscillators carry per-partial exponential decay envelopes |decay|^t whose
time base resets at note onsets, making partial frequencies optimizable by
gradient descent on the complex circle.

TPU design: the decay envelope |d|^(t) with per-frame decay d[k] and
per-sample time t = up * T[k] + s is computed in closed form inside the same
framewise structure as the main oscillator (exp(log|d| * t)), avoiding the
reference's (batch, n_samples, n_harmonics) materialized envelopes.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ddsp_piano_tpu.ops import core, oscillator
from ddsp_piano_tpu.processors.base import Processor

Array = jax.Array


def surrogate_harmonic_synthesis(frequencies, amplitudes, decays=None,
                                 decay_time=None, harmonic_shifts=None,
                                 harmonic_distribution=None, upsampling=64,
                                 sample_rate=16000,
                                 amp_resample_method='window',
                                 use_angular_cumsum=False):
    """Oscillator bank with exponentially-decaying per-partial amplitudes.

    Args (all frame rate):
        frequencies (b, t, 1), amplitudes (b, t, 1),
        decays (b, t, K) in [1e-5, 1], decay_time (b, t, 1) frames since
        onset, harmonic_shifts/harmonic_distribution (b, t, K).
    """
    frequencies = core.f32(frequencies)
    amplitudes = core.f32(amplitudes)
    b, n_frames, _ = frequencies.shape
    n_samples = upsampling * n_frames

    if harmonic_distribution is not None:
        n_harmonics = harmonic_distribution.shape[-1]
    elif harmonic_shifts is not None:
        n_harmonics = harmonic_shifts.shape[-1]
    else:
        n_harmonics = 1

    harmonic_frequencies = core.get_harmonic_frequencies(frequencies,
                                                         n_harmonics)
    if harmonic_shifts is not None:
        harmonic_frequencies = harmonic_frequencies * (1.0 + harmonic_shifts)
    if harmonic_distribution is not None:
        harmonic_amplitudes = amplitudes * harmonic_distribution
    else:
        harmonic_amplitudes = amplitudes

    controls = oscillator.framewise_osc_controls(
        harmonic_frequencies, harmonic_amplitudes, upsampling, sample_rate)

    if decays is None or decay_time is None:
        return oscillator.render_framewise(controls, upsampling, sample_rate)
    return render_framewise_decay(controls, decays, decay_time, upsampling,
                                  sample_rate)


def render_framewise_decay(controls, decays, decay_time, upsampling,
                           sample_rate):
    """Framewise oscillator render with per-partial exponential decay.

    Closed-form decay envelope per (frame, intra-sample): the reference
    repeats frame values `up` times and adds an intra-frame ramp:
        env[k, s] = |decays[k]| ** (up * decay_time[k] + s)
    `decays`/`decay_time` align with the controls' rendered frames (trim
    the lookahead endpoint before calling in streaming mode).
    """
    import math

    decays = core.f32(decays)
    decay_time = core.f32(decay_time)
    up = upsampling
    f_lo, f_hi, a_lo, a_hi, phase0 = controls
    b, n_frames, _ = f_lo.shape

    s = jnp.arange(up, dtype=jnp.float32)
    s_col = s[jnp.newaxis, jnp.newaxis, :, jnp.newaxis]       # (1,1,up,1)
    log_d = jnp.log(jnp.abs(decays))[:, :, jnp.newaxis, :]    # (b,t,1,K)
    t_base = (decay_time * up)[:, :, jnp.newaxis, :]          # (b,t,1,1)
    decay_env = jnp.exp(log_d * (t_base + s_col))             # (b,t,up,K)

    # Amplitude crossfade and Nyquist mask as in render_framewise.
    h = jnp.sin((math.pi / (2.0 * up)) * s) ** 2
    h = h[jnp.newaxis, jnp.newaxis, :, jnp.newaxis]
    amp = a_lo[:, :, jnp.newaxis, :] * (1.0 - h) + a_hi[:, :, jnp.newaxis, :] * h
    df = (f_hi - f_lo)[:, :, jnp.newaxis, :]
    freq = f_lo[:, :, jnp.newaxis, :] + df * (s_col * (1.0 / up))
    amp = amp * (freq < sample_rate / 2.0).astype(jnp.float32)
    amp = amp * decay_env

    w_scale = 2.0 * math.pi / float(sample_rate)
    tri = (s_col * (s_col + 1.0)) * (0.5 / up)
    phase = (phase0[:, :, jnp.newaxis, :]
             + w_scale * ((s_col + 1.0) * f_lo[:, :, jnp.newaxis, :]
                          + df * tri))
    audio = jnp.sum(amp * jnp.cos(phase), axis=-1)
    return audio.reshape(b, n_frames * up)


class SurrogateAdditive(Processor):
    """Surrogate inharmonic synth processor (surrogate_synth.py:107-214)."""

    def __init__(self,
                 frame_rate: int = 250,
                 sample_rate: int = 16000,
                 min_frequency: float = 20.0,
                 normalize_harm_distribution: bool = True,
                 scale_fn: Optional[Callable] = core.exp_sigmoid,
                 normalize_below_nyquist: bool = True,
                 inference: bool = False,
                 name: str = 'inharmonic'):
        super().__init__(name=name)
        self.frame_rate = frame_rate
        self.sample_rate = sample_rate
        self.min_frequency = min_frequency
        self.normalize_harm_distribution = normalize_harm_distribution
        self.scale_fn = scale_fn
        self.normalize_below_nyquist = normalize_below_nyquist
        self.inference = inference

    @property
    def upsampling(self) -> int:
        return int(self.sample_rate / self.frame_rate)

    def get_controls(self, params, amplitudes, decays, decay_time,
                     harmonic_distribution, inharm_coef, f0_hz, **_):
        if self.scale_fn is not None:
            amplitudes = self.scale_fn(amplitudes)
            harmonic_distribution = self.scale_fn(harmonic_distribution)
        amplitudes = core.f32(amplitudes)
        harmonic_distribution = core.f32(harmonic_distribution)
        inharm_coef = jnp.maximum(core.f32(inharm_coef), 0.0)
        n_harmonics = harmonic_distribution.shape[-1]
        inharmonic_freq, harmonic_shifts = core.get_inharmonic_freq(
            f0_hz, inharm_coef, n_harmonics)
        if decays is not None:
            decays = jnp.clip(core.f32(decays), 1e-5, 1.0)
            decays = jnp.where(inharmonic_freq >= self.sample_rate / 2.0,
                               jnp.ones_like(decays), decays)
        if self.normalize_below_nyquist:
            harmonic_distribution = core.remove_above_nyquist(
                inharmonic_freq, harmonic_distribution, self.sample_rate)
            amplitudes = amplitudes * (core.f32(f0_hz)
                                       > self.min_frequency).astype(jnp.float32)
        if self.normalize_harm_distribution:
            harmonic_distribution = core.safe_divide(
                harmonic_distribution,
                jnp.sum(harmonic_distribution, axis=-1, keepdims=True))
        return {'amplitudes': amplitudes,
                'decays': decays,
                'decay_time': core.f32(decay_time),
                'harmonic_distribution': harmonic_distribution,
                'harmonic_shifts': harmonic_shifts,
                'f0_hz': core.f32(f0_hz)}

    @staticmethod
    def fold_controls(amplitudes, harmonic_distribution, harmonic_shifts,
                      f0_hz):
        """Per-partial (freqs, amps) at frame rate — the streaming driver's
        shared representation (single-substring surrogate: no fold)."""
        n_harmonics = harmonic_distribution.shape[-1]
        freqs = core.get_harmonic_frequencies(f0_hz, n_harmonics)
        freqs = freqs * (1.0 + harmonic_shifts)
        return freqs, amplitudes * harmonic_distribution

    def get_signal(self, params, amplitudes, decays, decay_time,
                   harmonic_distribution, harmonic_shifts, f0_hz,
                   rng=None, **_):
        return surrogate_harmonic_synthesis(
            frequencies=f0_hz,
            amplitudes=amplitudes,
            decays=decays,
            decay_time=decay_time,
            harmonic_shifts=harmonic_shifts,
            harmonic_distribution=harmonic_distribution,
            upsampling=self.upsampling,
            sample_rate=self.sample_rate,
            use_angular_cumsum=self.inference)
