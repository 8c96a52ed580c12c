"""Reverb processors: learned-IR convolution reverb and the FDN reverb.

- Reverb: behavioral equivalent of ddsp.effects.Reverb as consumed by the
  reference configs (trainable=False, IR fed from the model's reverb
  sub-module; dafx22.gin:99-111). Masks the first IR sample (dry tap) and
  adds the dry signal unless add_dry=False (multi_instruments.gin:107-109).
- FeedbackDelayNetwork: processor wrapper over the functional FDN IR math in
  ddsp_piano_tpu.ops.fdn; either holds trainable parameters (standalone
  mode, ENSTDkCl configs) or receives them as controls from per-instrument
  embeddings (v2 model).
  Reference: /root/reference/ddsp_piano/modules/fdn_reverb.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ddsp_piano_tpu.ops import core, fdn, filters
from ddsp_piano_tpu.processors.base import Processor

Array = jax.Array


class Reverb(Processor):
    """Convolution reverb with an externally-supplied or trainable IR."""

    def __init__(self, trainable: bool = False, reverb_length: int = 48000,
                 add_dry: bool = True, name: str = 'reverb'):
        super().__init__(name=name)
        self.trainable = trainable
        self.reverb_length = reverb_length
        self.add_dry = add_dry

    def init(self, key):
        if not self.trainable:
            return {}
        return {'ir': 1e-6 * jax.random.normal(
            key, (self.reverb_length,), jnp.float32)}

    @staticmethod
    def _mask_dry_ir(ir: Array) -> Array:
        if ir.ndim == 1:
            ir = ir[jnp.newaxis, :]
        elif ir.ndim == 3:
            ir = ir[:, :, 0]
        return jnp.concatenate(
            [jnp.zeros((ir.shape[0], 1), ir.dtype), ir[:, 1:]], axis=1)

    def get_controls(self, params, audio, ir: Optional[Array] = None, **_):
        if self.trainable:
            ir = params['ir']
        if ir is None:
            raise ValueError("Reverb requires an 'ir' control when not "
                             "trainable.")
        return {'audio': audio, 'ir': core.f32(ir)}

    def get_signal(self, params, audio, ir, rng=None, **_):
        ir = self._mask_dry_ir(ir)
        wet = filters.fft_convolve(core.f32(audio), ir, padding='same',
                                   delay_compensation=0)
        return (wet + audio) if self.add_dry else wet


class FeedbackDelayNetwork(Processor):
    """Differentiable FDN reverb processor.

    In trainable mode the FDN controls are parameters of this processor;
    otherwise they are passed in as controls. The IR is synthesized in the
    frequency domain (see ops.fdn) and applied by FFT convolution without
    dry masking or dry add, matching the reference's behavior.
    """

    def __init__(self,
                 trainable: bool = False,
                 sampling_rate: float = 16000.0,
                 delay_lines: int = 8,
                 early_ir_length: int = 200,
                 delay_trainable: bool = False,
                 name: str = 'DelayNetwork'):
        super().__init__(name=name)
        self.trainable = trainable
        self.delay_trainable = delay_trainable and trainable
        self.sampling_rate = float(sampling_rate)
        self.delay_lines = delay_lines
        self.early_ir_length = early_ir_length
        self.delay_values = jnp.asarray(
            fdn.DEFAULT_DELAY_VALUES[:delay_lines], jnp.float32)
        self.fixed_delays_allpass = jnp.asarray(
            fdn.DEFAULT_DELAYS_ALLPASS[:delay_lines], jnp.float32)

    @property
    def freq_points(self) -> int:
        return int(2 * self.sampling_rate)

    def init(self, key):
        if not self.trainable:
            return {}
        ks = jax.random.split(key, 8)
        n = self.delay_lines
        normal = jax.random.normal
        params = {
            'early_ir': 0.1 * normal(ks[0], (self.early_ir_length,)),
            'input_gain': 0.25 + 0.1 * normal(ks[1], (n,)),
            'output_gain': 0.25 + 0.1 * normal(ks[2], (n,)),
            'time_rev_0_sec': 2.0 + 0.5 * normal(ks[3], ()),
            'alpha_tone': 0.1 * normal(ks[4], ()),
            'delays_allpass': 400.0 + 60.0 * normal(ks[5], (n, 4)),
            'gain_allpass': 0.25 + 0.1 * normal(ks[6], (n, 4)),
        }
        if self.delay_trainable:
            params['delay_values'] = 400.0 + 60.0 * normal(ks[7], (n,))
        return params

    def _params_to_controls(self, params) -> fdn.FDNParams:
        return fdn.FDNParams(
            input_gain=params['input_gain'],
            output_gain=params['output_gain'],
            gain_allpass=params['gain_allpass'],
            delays_allpass=params['delays_allpass'],
            time_rev_0_sec=jnp.maximum(params['time_rev_0_sec'], 0.0),
            alpha_tone=jax.nn.sigmoid(params['alpha_tone']),
            early_ir=params['early_ir'],
        )

    def get_ir(self, input_gain, output_gain, gain_allpass, delays_allpass,
               time_rev_0_sec, alpha_tone, early_ir) -> Array:
        controls = fdn.FDNParams(input_gain, output_gain, gain_allpass,
                                 delays_allpass, time_rev_0_sec, alpha_tone,
                                 early_ir)
        return fdn.fdn_ir(controls, self.sampling_rate,
                          delay_values=self.delay_values,
                          freq_points=self.freq_points)

    def get_controls(self, params, audio_dry=None, input_gain=None,
                     output_gain=None, gain_allpass=None, delays_allpass=None,
                     time_rev_0_sec=None, alpha_tone=None, early_ir=None, **_):
        if self.trainable:
            fdn_params = self._params_to_controls(params)
        else:
            fdn_params = fdn.FDNParams(input_gain, output_gain, gain_allpass,
                                       delays_allpass, time_rev_0_sec,
                                       alpha_tone, early_ir)
        delay_values = (params['delay_values'] if self.delay_trainable
                        else self.delay_values)
        ir = fdn.fdn_ir(fdn_params, self.sampling_rate,
                        delay_values=delay_values,
                        freq_points=self.freq_points)
        return {'audio': audio_dry, 'ir': ir}

    def get_signal(self, params, audio, ir, rng=None, **_):
        return fdn.fdn_reverb_signal(core.f32(audio), ir)
