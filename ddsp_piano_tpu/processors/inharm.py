"""Inharmonic additive synthesizers.

Behavioral equivalents of the reference's InHarmonic / MultiInharmonic
processors (/root/reference/ddsp_piano/modules/inharm_synth.py:130-293),
built on the framewise fused oscillator (ddsp_piano_tpu.ops.oscillator).

TPU note: MultiInharmonic renders all substrings in one batched oscillator
call by folding the substring axis into the partial axis (the per-substring
controls share amplitudes/shifts), instead of the reference's Python loop
over substrings.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ddsp_piano_tpu.ops import core, oscillator
from ddsp_piano_tpu.processors.base import Processor

Array = jax.Array


class InHarmonic(Processor):
    """Bank of inharmonic cosine oscillators.

    Args:
        frame_rate: controls per second.
        sample_rate: audio samples per second.
        min_frequency: f0 below this silences the note.
        scale_fn: network-output scaling (exp_sigmoid / exp_tanh / None).
        normalize_after_nyquist_cut: renormalize the harmonic distribution
            after zeroing bands above Nyquist.
        normalize_below_nyquist: zero partials above Nyquist and gate
            amplitude on f0 > min_frequency.
        inference: numerically-robust phase accumulation (the framewise
            renderer is always mod-2pi accurate, so this only changes the
            envelope-pipeline fallback).
    """

    def __init__(self,
                 frame_rate: int = 250,
                 sample_rate: int = 16000,
                 min_frequency: float = 20.0,
                 scale_fn: Optional[Callable] = core.exp_sigmoid,
                 normalize_after_nyquist_cut: bool = True,
                 normalize_below_nyquist: bool = True,
                 inference: bool = False,
                 name: str = 'inharmonic'):
        super().__init__(name=name)
        self.frame_rate = frame_rate
        self.sample_rate = sample_rate
        self.min_frequency = min_frequency
        self.scale_fn = scale_fn
        self.normalize_after_nyquist_cut = normalize_after_nyquist_cut
        self.normalize_below_nyquist = normalize_below_nyquist
        self.inference = inference

    @property
    def upsampling(self) -> int:
        return int(self.sample_rate / self.frame_rate)

    def get_controls(self, params, amplitudes, harmonic_distribution,
                     inharm_coef, f0_hz, **_):
        """Scale raw network outputs into synth controls.

        Args: amplitudes (b, t, 1); harmonic_distribution (b, t, K);
        inharm_coef (b, t, 1); f0_hz (b, t, 1).
        """
        inharm_coef = jnp.maximum(core.f32(inharm_coef), 0.0)
        if self.scale_fn is not None:
            amplitudes = self.scale_fn(amplitudes)
            harmonic_distribution = self.scale_fn(harmonic_distribution)
        amplitudes = core.f32(amplitudes)
        harmonic_distribution = core.f32(harmonic_distribution)
        n_harmonics = harmonic_distribution.shape[-1]

        inharmonic_freq, harmonic_shifts = core.get_inharmonic_freq(
            f0_hz, inharm_coef, n_harmonics)
        if not self.normalize_after_nyquist_cut:
            harmonic_distribution = core.safe_divide(
                harmonic_distribution,
                jnp.sum(harmonic_distribution, axis=-1, keepdims=True))
        if self.normalize_below_nyquist:
            harmonic_distribution = core.remove_above_nyquist(
                inharmonic_freq, harmonic_distribution, self.sample_rate)
            amplitudes = amplitudes * (core.f32(f0_hz)
                                       > self.min_frequency).astype(jnp.float32)
        if self.normalize_after_nyquist_cut:
            harmonic_distribution = core.safe_divide(
                harmonic_distribution,
                jnp.sum(harmonic_distribution, axis=-1, keepdims=True))

        return {'amplitudes': amplitudes,
                'harmonic_distribution': harmonic_distribution,
                'harmonic_shifts': harmonic_shifts,
                'f0_hz': core.f32(f0_hz)}

    def get_signal(self, params, amplitudes, harmonic_distribution,
                   harmonic_shifts, f0_hz, rng=None, **_):
        n_frames = f0_hz.shape[1]
        return oscillator.harmonic_synthesis(
            frequencies=f0_hz,
            amplitudes=amplitudes,
            harmonic_shifts=harmonic_shifts,
            harmonic_distribution=harmonic_distribution,
            n_samples=self.upsampling * n_frames,
            sample_rate=self.sample_rate,
            use_angular_cumsum=self.inference)


class MultiInharmonic(InHarmonic):
    """Inharmonic synth with one f0 per substring (detuned piano strings).

    f0_hz is (batch, time, n_substrings); partial amplitudes/shifts are
    shared across substrings and the global amplitude is split evenly
    (reference inharm_synth.py:247-293). All substrings render in a single
    fused oscillator call.
    """

    def __init__(self, name: str = 'multi_inharmonic', **kwargs):
        super().__init__(name=name, **kwargs)

    def get_controls(self, params, amplitudes, harmonic_distribution,
                     inharm_coef, f0_hz, **kwargs):
        controls = super().get_controls(params, amplitudes,
                                        harmonic_distribution, inharm_coef,
                                        f0_hz[..., 0:1], **kwargs)
        controls['f0_hz'] = core.f32(f0_hz)
        controls['amplitudes'] = controls['amplitudes'] / float(
            f0_hz.shape[-1])
        return controls

    @staticmethod
    def fold_substrings(amplitudes, harmonic_distribution, harmonic_shifts,
                        f0_hz):
        """Fold per-substring partials into one oscillator axis.

        Returns (freqs, amps), each (b, t, n_substrings * n_harmonics) —
        the shared representation for both one-shot and streaming renders.

        The fold is HARMONIC-MAJOR (h1s0, h1s1, h2s0, h2s1, ...), not
        substring-major: the skipping Pallas oscillator walks 8-partial
        tiles up to the LAST sub-Nyquist partial, and a substring-major
        order puts every substring's live harmonics after the previous
        substring's dead (Nyquist-masked) tail, forcing the kernel
        through ~(n_harm + live) partials instead of ~(n_sub * live).
        The substrings are detuned by cents, so their Nyquist cuts are
        adjacent harmonics — interleaving clusters all dead partials at
        the end (measured 2.2x less oscillator tile-work on the chordal
        bench scene for dafx22's 2 substrings x 96 harmonics).
        """
        b, n_frames, n_sub = f0_hz.shape
        n_harm = harmonic_distribution.shape[-1]
        k = jnp.linspace(1.0, float(n_harm), n_harm, dtype=jnp.float32)
        shift_mul = (1.0 + harmonic_shifts)                  # (b, t, K)
        freqs = (f0_hz[..., jnp.newaxis, :] * k[:, jnp.newaxis]
                 * shift_mul[..., :, jnp.newaxis]            # (b, t, K, S)
                 ).reshape(b, n_frames, n_harm * n_sub)
        amps = (amplitudes * harmonic_distribution)[..., :, jnp.newaxis]
        amps = jnp.broadcast_to(amps, (b, n_frames, n_harm, n_sub)
                                ).reshape(b, n_frames, n_harm * n_sub)
        return freqs, amps

    def get_signal(self, params, amplitudes, harmonic_distribution,
                   harmonic_shifts, f0_hz, rng=None, **_):
        up = self.upsampling
        freqs, amps = self.fold_substrings(amplitudes, harmonic_distribution,
                                           harmonic_shifts, f0_hz)
        controls = oscillator.framewise_osc_controls(
            freqs, amps, up, self.sample_rate)
        return oscillator.render_framewise(controls, up, self.sample_rate)
