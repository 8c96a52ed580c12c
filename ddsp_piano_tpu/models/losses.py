"""Training losses (reference /root/reference/ddsp_piano/modules/losses.py)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ddsp_piano_tpu.ops import spectral


class Loss:
    """A named loss computed from the model outputs dict."""

    def __init__(self, name: str):
        self.name = name

    def compute(self, outputs: dict) -> jax.Array:
        raise NotImplementedError


class SpectralLoss(Loss):
    """Multi-resolution STFT loss on a selected output key
    (losses.py:7-32)."""

    def __init__(self,
                 output_key: str = 'audio_synth',
                 extract_signal: bool = False,
                 fft_sizes: Sequence[int] = (2048, 1024, 512, 256, 128, 64),
                 loss_type: str = 'L1',
                 mag_weight: float = 1.0,
                 logmag_weight: float = 0.0,
                 delta_time_weight: float = 0.0,
                 delta_freq_weight: float = 0.0,
                 cumsum_freq_weight: float = 0.0,
                 loudness_weight: float = 0.0,
                 sample_rate: int = 16000,
                 name: str = 'audio_stft_loss'):
        super().__init__(name=name)
        self.output_key = output_key
        self.extract_signal = extract_signal
        self.fft_sizes = tuple(fft_sizes)
        self.loss_type = loss_type
        self.mag_weight = mag_weight
        self.logmag_weight = logmag_weight
        self.delta_time_weight = delta_time_weight
        self.delta_freq_weight = delta_freq_weight
        self.cumsum_freq_weight = cumsum_freq_weight
        self.loudness_weight = loudness_weight
        self.sample_rate = sample_rate

    def compute(self, outputs):
        audio_synth = outputs[self.output_key]
        if self.extract_signal:
            audio_synth = audio_synth['signal']
        return self._loss(outputs['audio'], audio_synth)

    def compute_per_element(self, target_audio, audio):
        """Per-batch-element losses, shape (batch,).

        Element i equals compute() on the singleton batch {i} — the
        reference's per-segment evaluation protocol (its evaluate_model.py
        runs batch-1 forwards; /root/reference/evaluate_model.py:36-46).
        vmap keeps the whole batch on the MXU instead of B host
        round-trips.
        """
        return jax.vmap(lambda t, a: self._loss(t[None], a[None]))(
            target_audio, audio)

    def _loss(self, target_audio, audio_synth):
        return spectral.multi_scale_spectral_loss(
            target_audio, audio_synth,
            fft_sizes=self.fft_sizes,
            loss_type=self.loss_type,
            mag_weight=self.mag_weight,
            logmag_weight=self.logmag_weight,
            delta_time_weight=self.delta_time_weight,
            delta_freq_weight=self.delta_freq_weight,
            cumsum_freq_weight=self.cumsum_freq_weight,
            loudness_weight=self.loudness_weight,
            sample_rate=self.sample_rate)


class ReverbRegularizer(Loss):
    """L1/L2 penalty on the reverb IR, per batch element
    (losses.py:35-51)."""

    def __init__(self, weight: float = 0.01, loss_type: str = 'L1',
                 name: str = 'reverb_regularizer'):
        super().__init__(name=name)
        self.weight = weight
        self.magnitude_order = (jnp.abs if loss_type == 'L1'
                                else jnp.square)

    def compute(self, outputs):
        ir = outputs['reverb_ir']
        return self.weight * jnp.sum(self.magnitude_order(ir)) / ir.shape[0]


class InharmonicityLoss(Loss):
    """Penalize negative inharmonicity coefficients (losses.py:54-68)."""

    def __init__(self, weight: float = 10.0, name: str = 'inharmonicity_loss'):
        super().__init__(name=name)
        self.weight = weight

    def compute(self, outputs):
        inharm = outputs['inharm_coef']
        loss = jnp.sum(jnp.maximum(-inharm, 0.0)) / inharm.shape[0]
        return self.weight * loss


class LoudnessLoss(Loss):
    """Loudness-only distance between two processor outputs
    (losses.py:71-92)."""

    def __init__(self, target_key: str, synth_key: str,
                 sample_rate: int = 16000, name: str = 'loudness_loss'):
        super().__init__(name=name)
        self.target_key = target_key
        self.synth_key = synth_key
        self.sample_rate = sample_rate

    def compute(self, outputs):
        target = outputs[self.target_key]['signal']
        synth = outputs[self.synth_key]['signal']
        return spectral.multi_scale_spectral_loss(
            target, synth, mag_weight=0.0, loudness_weight=1.0,
            sample_rate=self.sample_rate)
