"""Piano model sub-modules (L2).

Functional JAX equivalents of every sub-module in
/root/reference/ddsp_piano/modules/sub_modules.py (see SURVEY §2.4),
parameter-layout-compatible with the released TF checkpoints. Each module is
a DictModule: it reads named features and returns named outputs, mirroring
the reference's nn.DictLayer protocol.

Conventions:
- extended_pitch and conditioning are already folded to (n_synths*batch, ...)
  when monophonic modules run (see Parallelizer).
- ``training`` is a static argument; inference-only behaviors (reverb decay
  mask) are driven by a static ``inference`` flag set from the config, like
  the reference's ``%inference`` gin macro.
- Modules with weight regularizers expose ``regularization(params)``;
  PianoModel sums them into 'regularization_loss'
  (reference piano_model.py:74-76).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ddsp_piano_tpu import nn
from ddsp_piano_tpu.ops import core

Array = jax.Array

MIDI_NORM = 128.0


def _collapse_last_axis(x: Array) -> Array:
    """(b, t, n, c) -> (b, t, n*c)."""
    return x.reshape(*x.shape[:-2], x.shape[-2] * x.shape[-1])


def _norm_conditioning(conditioning: Array) -> Array:
    """Scale (…, 2) pitch/velocity pairs by [1/128, 1]."""
    scale = jnp.asarray([1.0 / MIDI_NORM, 1.0], jnp.float32)
    return conditioning * scale


# -----------------------------------------------------------------------------
# Global models
# -----------------------------------------------------------------------------


class ContextNetwork(nn.DictModule):
    """Global context vector from conditioning + pedal + z.

    layers: the internal Sequential (config-driven, e.g. Dense32(leaky) ->
    GRU64 -> Normalize for dafx22); a dense_out head splits into
    output_splits. Reference sub_modules.py:17-64.
    """

    input_keys = ('conditioning', 'pedal', 'z')
    output_keys = ('context',)

    def __init__(self, layers: Sequence[nn.Module], out_features: int,
                 output_splits=(('context', 32),), normalize_pitch=False,
                 name='context_net'):
        self.model = nn.Sequential(list(layers))
        self.output_splits = tuple(output_splits)
        self.normalize_pitch = normalize_pitch
        self.name = name
        n_out = sum(v[1] for v in self.output_splits)
        self.dense_out = nn.Dense(n_out, out_features)
        self.output_keys = tuple(k for k, _ in self.output_splits)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {'model': self.model.init(k1),
                'dense_out': self.dense_out.init(k2)}

    def apply(self, params, conditioning, pedal, z, training=False):
        if self.normalize_pitch:
            conditioning = _norm_conditioning(conditioning)
        x = jnp.concatenate([_collapse_last_axis(conditioning), pedal, z],
                            axis=-1)
        x = self.model(params['model'], x)
        x = self.dense_out(params['dense_out'], x)
        outs = nn.split_to_dict(x, self.output_splits)
        return tuple(outs[k] for k in self.output_keys)


class SimpleContextNet(nn.DictModule):
    """Pedal-only context with FiLM conditioning from the instrument z.

    Polyphony-independent (inference n_synths may differ from training).
    Reference sub_modules.py:67-93.
    """

    input_keys = ('pedal', 'z?')
    output_keys = ('context',)

    def __init__(self, layers: Sequence[nn.Module], out_features: int,
                 output_splits=(('context', 32),), name='context_net'):
        self.model = nn.Sequential(list(layers))
        self.output_splits = tuple(output_splits)
        self.name = name
        n_out = sum(v[1] for v in self.output_splits)
        self.dense_out = nn.Dense(n_out, out_features)
        self.output_keys = tuple(k for k, _ in self.output_splits)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {'model': self.model.init(k1),
                'dense_out': self.dense_out.init(k2)}

    def apply(self, params, pedal, z=None, training=False):
        context = self.model(params['model'], pedal)
        context = self.dense_out(params['dense_out'], context)
        if z is not None:
            film_coef, film_bias = jnp.split(z, 2, axis=-1)
            context = context * film_coef + film_bias
        return context


class FiLMContextNetwork(nn.DictModule):
    """Context network with per-input heads and a piano-id FiLM layer.

    Reference sub_modules.py:96-179 (v2 model). Head dims confirmed against
    the v2 checkpoint index: conditioning FcStack(32)x2, pedal FcStack(16)x2,
    Embedding(n_instruments, 32), main Dense(48->64) -> GRU64 -> Dense64 ->
    LayerNorm -> leaky, FiLM Dense(32->128), out FcStack(32)x2.
    """

    input_keys = ('conditioning', 'pedal', 'piano_model')
    output_keys = ('context',)

    def __init__(self, n_instruments=10, n_synths=16, layer_dim=64,
                 context_dim=32, name='context_net'):
        self.name = name
        self.n_instruments = n_instruments
        self.conditioning_head = nn.FcStack(32, n_synths * 2, layers=2)
        self.pedal_head = nn.FcStack(16, 4, layers=2)
        self.piano_id_head = nn.Embedding(n_instruments, 32)
        self.main_model = nn.Sequential([
            nn.Dense(layer_dim, 32 + 16, activation='leaky_relu'),
            nn.GRU(layer_dim, layer_dim),
            nn.Dense(layer_dim, layer_dim),
            nn.LayerNormalization(layer_dim),
            nn.Activation('leaky_relu'),
        ])
        self.film_input_reshape = nn.Dense(layer_dim * 2, 32)
        self.output_layer = nn.FcStack(context_dim, layer_dim, layers=2)

    def init(self, key):
        ks = nn.split_keys(key, ['conditioning_head', 'pedal_head',
                                 'piano_id_head', 'main_model',
                                 'film_input_reshape', 'output_layer'])
        return {name: getattr(self, name).init(k) for name, k in ks.items()}

    def apply(self, params, conditioning, pedal, piano_model, training=False):
        conditioning = _collapse_last_axis(_norm_conditioning(conditioning))
        cond_feat = self.conditioning_head(params['conditioning_head'],
                                           conditioning)
        pedal_feat = self.pedal_head(params['pedal_head'], pedal)
        piano_feat = self.piano_id_head(params['piano_id_head'], piano_model)
        features = jnp.concatenate([cond_feat, pedal_feat], axis=-1)
        features = self.main_model(params['main_model'], features)
        # FiLM modulation from the piano embedding (broadcast over time).
        piano_feat = self.film_input_reshape(params['film_input_reshape'],
                                             piano_feat)
        film_coef, film_bias = jnp.split(piano_feat, 2, axis=-1)
        features = features * film_coef + film_bias
        return self.output_layer(params['output_layer'], features)


class OneHotZEncoder(nn.DictModule):
    """Instrument id -> z embedding + global inharm/detune scalars.

    Reference sub_modules.py:182-250; embeddings resampled to
    duration * frame_rate frames.
    """

    input_keys = ('piano_model',)
    output_keys = ('z', 'global_inharm', 'global_detuning')

    def __init__(self, n_instruments=16, z_dim=16, duration=None,
                 frame_rate=250, name='z_encoder'):
        self.name = name
        self.n_instruments = n_instruments
        self.z_dim = z_dim
        self.duration = duration
        self.frame_rate = frame_rate
        self.embedding = nn.Embedding(n_instruments, z_dim)
        self.inharm_embedding = nn.Embedding(n_instruments, 1)
        self.detune_embedding = nn.Embedding(n_instruments, 1)

    @property
    def n_frames(self) -> int:
        return int(self.duration * self.frame_rate) if self.duration else 1

    def init(self, key):
        ks = nn.split_keys(key, ['embedding', 'inharm_embedding',
                                 'detune_embedding'])
        return {n: getattr(self, n).init(k) for n, k in ks.items()}

    def apply(self, params, piano_model, training=False):
        if self.n_instruments == 1:
            piano_model = jnp.zeros_like(jnp.asarray(piano_model,
                                                     jnp.int32))
        z = self.embedding(params['embedding'], piano_model)
        gi = self.inharm_embedding(params['inharm_embedding'], piano_model)
        gd = self.detune_embedding(params['detune_embedding'], piano_model)
        if z.ndim == 2:
            z, gi, gd = z[:, None, :], gi[:, None, :], gd[:, None, :]
        z = core.resample(z, self.n_frames)
        gi = core.resample(gi, self.n_frames)
        gd = core.resample(gd, self.n_frames)
        return z, gi, gd


class BackgroundNoiseFilter(nn.DictModule):
    """Constant per-environment noise-filter magnitudes
    (sub_modules.py:253-299)."""

    input_keys = ('piano_model',)
    output_keys = ('background_mag',)

    def __init__(self, n_instruments=16, n_filters=64, duration=None,
                 frame_rate=250, denoise=False, name='background_noise'):
        self.name = name
        self.n_instruments = n_instruments
        self.n_filters = n_filters
        self.duration = duration
        self.frame_rate = frame_rate
        self.denoise = denoise
        self.embedding = nn.Embedding(n_instruments, n_filters)

    @property
    def n_frames(self) -> int:
        return int(self.duration * self.frame_rate) if self.duration else 1

    def init(self, key):
        return {'embedding': self.embedding.init(key)}

    def apply(self, params, piano_model, training=False):
        mag = self.embedding(params['embedding'], piano_model)
        if mag.ndim == 2:
            mag = mag[:, None, :]
        mag = core.resample(mag, self.n_frames)
        if self.denoise:
            mag = -10.0 * jnp.ones_like(mag)
        return mag


class MultiInstrumentReverb(nn.DictModule):
    """Learned raw IR per recording environment (sub_modules.py:302-365)."""

    input_keys = ('piano_model',)
    output_keys = ('reverb_ir',)

    def __init__(self, n_instruments=16, reverb_duration=1.5,
                 sample_rate=16000, inference=False, name='reverb_model'):
        self.name = name
        self.n_instruments = n_instruments
        self.reverb_duration = reverb_duration
        self.sample_rate = sample_rate
        self.inference = inference
        self.reverb_dict = nn.Embedding(n_instruments, self.reverb_length,
                                        embeddings_init='normal',
                                        init_mean=0.0, init_stddev=1e-6)

    @property
    def reverb_length(self) -> int:
        return int(self.reverb_duration * self.sample_rate)

    def init(self, key):
        return {'reverb_dict': self.reverb_dict.init(key)}

    def exponential_decay_mask(self, ir, decay_exponent=4.0,
                               decay_start=16000):
        t = jnp.linspace(0.0, 1.0, self.reverb_length - decay_start)
        mask = jnp.concatenate(
            [jnp.ones((decay_start,)), jnp.exp(-decay_exponent * t)])
        return ir * mask[None, :]

    def apply(self, params, piano_model, training=False):
        if self.n_instruments == 1:
            piano_model = jnp.zeros_like(jnp.asarray(piano_model, jnp.int32))
        ir = self.reverb_dict(params['reverb_dict'], piano_model)
        if ir.ndim == 3:
            ir = ir[:, 0]
        if self.inference:
            ir = self.exponential_decay_mask(ir)
        return ir


class MultiInstrumentFeedbackDelayReverb(nn.DictModule):
    """Per-instrument FDN parameter embeddings -> reverb IR
    (sub_modules.py:368-446, v2 model)."""

    input_keys = ('piano_model',)
    output_keys = ('reverb_ir',)

    def __init__(self, n_instruments=10, sample_rate=16000, delay_lines=8,
                 early_ir_length=200, regularize_early=False,
                 name='reverb_model'):
        from ddsp_piano_tpu.processors.reverb import FeedbackDelayNetwork
        self.name = name
        self.n_instruments = n_instruments
        self.sample_rate = sample_rate
        self.delay_lines = delay_lines
        self.regularize_early = regularize_early
        norm = dict(embeddings_init='normal')
        self._input_gain = nn.Embedding(n_instruments, delay_lines,
                                        init_mean=0.25, init_stddev=0.1,
                                        **norm)
        self._output_gain = nn.Embedding(n_instruments, delay_lines,
                                         init_mean=0.25, init_stddev=0.1,
                                         **norm)
        self._gain_allpass = nn.Embedding(n_instruments, 4 * delay_lines,
                                          init_mean=0.25, init_stddev=0.1,
                                          **norm)
        self._delays_allpass = nn.Embedding(n_instruments, 4 * delay_lines,
                                            init_mean=400.0, init_stddev=60.0,
                                            **norm)
        self._time_rev_0_sec = nn.Embedding(n_instruments, 1, init_mean=2.0,
                                            init_stddev=0.5, **norm)
        self._alpha_tone = nn.Embedding(n_instruments, 1, init_mean=0.0,
                                        init_stddev=0.1, **norm)
        self._early_ir = nn.Embedding(n_instruments, early_ir_length,
                                      init_mean=0.0, init_stddev=0.1, **norm)
        self.reverb_model = FeedbackDelayNetwork(
            trainable=False, sampling_rate=sample_rate,
            delay_lines=delay_lines, early_ir_length=early_ir_length)

    _EMBEDDINGS = ('_input_gain', '_output_gain', '_gain_allpass',
                   '_delays_allpass', '_time_rev_0_sec', '_alpha_tone',
                   '_early_ir')

    def init(self, key):
        ks = nn.split_keys(key, self._EMBEDDINGS)
        return {n: getattr(self, n).init(k) for n, k in ks.items()}

    @staticmethod
    def _reshape_embedding(e, splits=4):
        # (b, 4n) -> (b, n, 4): chunk the last axis and stack chunk-index
        # last, as the reference's reshape_embedding (tf.split + stack).
        parts = jnp.split(e, splits, axis=-1)
        return jnp.stack(parts, axis=-1)

    def apply(self, params, piano_model, training=False):
        if self.n_instruments == 1:
            piano_model = jnp.zeros_like(jnp.asarray(piano_model, jnp.int32))
        ids = jnp.asarray(piano_model, jnp.int32)[..., 0]  # (b,)
        gather = lambda n: getattr(self, n)(params[n], ids)
        controls = dict(
            input_gain=gather('_input_gain'),
            output_gain=gather('_output_gain'),
            gain_allpass=self._reshape_embedding(gather('_gain_allpass')),
            delays_allpass=self._reshape_embedding(
                gather('_delays_allpass')),
            time_rev_0_sec=jax.nn.relu(gather('_time_rev_0_sec')),
            alpha_tone=jax.nn.sigmoid(gather('_alpha_tone')),
            early_ir=gather('_early_ir'),
        )
        ir = jax.vmap(lambda c: self.reverb_model.get_ir(**c))(controls)
        return ir

    def regularization(self, params):
        if not self.regularize_early:
            return 0.0
        return 1e-1 * jnp.sum(jnp.abs(params['_early_ir']['embeddings']))


# -----------------------------------------------------------------------------
# Monophonic amplitude models
# -----------------------------------------------------------------------------


class MonophonicNetwork(nn.DictModule):
    """Monophonic controls from folded per-voice inputs
    (sub_modules.py:454-495)."""

    input_keys = ('conditioning', 'extended_pitch', 'context')

    def __init__(self, layers: Sequence[nn.Module], out_features: int,
                 output_splits=(('amplitudes', 1),
                                ('harmonic_distribution', 96),
                                ('magnitudes', 64)),
                 name='mono_net'):
        self.name = name
        self.model = nn.Sequential(list(layers))
        self.output_splits = tuple(output_splits)
        n_out = sum(v[1] for v in self.output_splits)
        self.dense_out = nn.Dense(n_out, out_features)
        self.output_keys = tuple(k for k, _ in self.output_splits)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {'model': self.model.init(k1),
                'dense_out': self.dense_out.init(k2)}

    def _inputs(self, conditioning, extended_pitch, context):
        return jnp.concatenate([extended_pitch / MIDI_NORM,
                                _norm_conditioning(conditioning),
                                context], axis=-1)

    def apply(self, params, conditioning, extended_pitch, context,
              training=False):
        x = self._inputs(conditioning, extended_pitch, context)
        x = self.model(params['model'], x)
        x = self.dense_out(params['dense_out'], x)
        outs = nn.split_to_dict(x, self.output_splits)
        return tuple(outs[k] for k in self.output_keys)


class MonophonicDeepNetwork(MonophonicNetwork):
    """DDSP-decoder-style monophonic network (sub_modules.py:498-524):
    3 input FcStacks -> GRU -> skip concat -> out FcStack -> dense_out."""

    def __init__(self, rnn_channels=192, ch=64, layers_per_stack=3,
                 context_dim=32,
                 output_splits=(('amplitudes', 1),
                                ('harmonic_distribution', 96),
                                ('magnitudes', 64)),
                 name='mono_net'):
        self.name = name
        self.output_splits = tuple(output_splits)
        self.output_keys = tuple(k for k, _ in self.output_splits)
        self.input_stacks = [
            nn.FcStack(ch, 1, layers=layers_per_stack),
            nn.FcStack(ch, 2, layers=layers_per_stack),
            nn.FcStack(ch, context_dim, layers=layers_per_stack),
        ]
        self.model = nn.GRU(rnn_channels, 3 * ch)
        self.out_stack = nn.FcStack(ch, 3 * ch + rnn_channels,
                                    layers=layers_per_stack)
        n_out = sum(v[1] for v in self.output_splits)
        self.dense_out = nn.Dense(n_out, ch)

    def init(self, key):
        ks = jax.random.split(key, 6)
        return {
            'input_stacks': [s.init(k) for s, k in zip(self.input_stacks,
                                                       ks[:3])],
            'model': self.model.init(ks[3]),
            'out_stack': self.out_stack.init(ks[4]),
            'dense_out': self.dense_out.init(ks[5]),
        }

    def apply(self, params, conditioning, extended_pitch, context,
              training=False):
        xp = self.input_stacks[0](params['input_stacks'][0],
                                  extended_pitch / MIDI_NORM)
        xc = self.input_stacks[1](params['input_stacks'][1],
                                  _norm_conditioning(conditioning))
        xz = self.input_stacks[2](params['input_stacks'][2], context)
        x = jnp.concatenate([xp, xc, xz], axis=-1)
        x = self.model(params['model'], x)
        x = jnp.concatenate([xp, xc, xz, x], axis=-1)
        x = self.out_stack(params['out_stack'], x)
        x = self.dense_out(params['dense_out'], x)
        outs = nn.split_to_dict(x, self.output_splits)
        return tuple(outs[k] for k in self.output_keys)


# -----------------------------------------------------------------------------
# Parallelizer
# -----------------------------------------------------------------------------


class Parallelizer:
    """Fold/unfold the polyphony axis into the batch axis.

    Global features (batch, time, ...) are broadcast to every voice and
    per-voice rank-4 features (batch, time, n_synths, c) are transposed so
    everything becomes (n_synths * batch, time, ...) for the monophonic
    networks; mono outputs are unfolded to stacked (n_synths, batch, ...)
    plus per-voice '<key>_<i>' entries for the DAG
    (reference sub_modules.py:527-602).
    """

    def __init__(self,
                 n_synths: int = 16,
                 global_keys: Tuple[str, ...] = ('conditioning', 'context',
                                                 'global_inharm',
                                                 'global_detuning'),
                 mono_keys: Tuple[str, ...] = ('f0_hz', 'inharm_coef',
                                               'amplitudes',
                                               'harmonic_distribution',
                                               'magnitudes'),
                 name: str = 'parallelizer'):
        self.n_synths = n_synths
        self.global_keys = tuple(global_keys)
        self.mono_keys = tuple(mono_keys)
        self.name = name

    def put_polyphony_axis_at_first(self, x: Array) -> Array:
        if 2 <= x.ndim <= 3:
            return jnp.repeat(x[jnp.newaxis], self.n_synths, axis=0)
        if x.ndim == 4:
            return jnp.transpose(x, (2, 0, 1, 3))
        raise ValueError(f"Cannot parallelize rank-{x.ndim} feature")

    def parallelize_feature(self, x: Array) -> Array:
        return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])

    def unparallelize_feature(self, x: Array, batch_size: int) -> Array:
        return x.reshape((self.n_synths, batch_size) + x.shape[1:])

    def parallelize(self, features: dict) -> dict:
        features = dict(features)
        for k in self.global_keys:
            x = self.put_polyphony_axis_at_first(features[k])
            features[k] = self.parallelize_feature(x)
        return features

    def unparallelize(self, features: dict, batch_size: int) -> dict:
        features = dict(features)
        for k in self.mono_keys:
            stacked = self.unparallelize_feature(features[k], batch_size)
            features[k] = stacked
            for i in range(self.n_synths):
                features[f'{k}_{i}'] = stacked[i]
        return features


# -----------------------------------------------------------------------------
# Parametric tuning models
# -----------------------------------------------------------------------------

# Rigaud et al. DAFx-11 two-asymptote initial values
# (reference sub_modules.py:618-651).
_TREBLE_SLOPE = 9.26e-2
_TREBLE_INTERCEPT = -13.64
_BASS_SLOPE = -8.47e-2
_BASS_INTERCEPT = -5.82


class InharmonicityNetwork(nn.DictModule):
    """Physics-initialized inharmonicity-over-tessitura model.

    beta(m) = sum_bridge exp(slope * (m/128 + offset)), with frozen Rigaud
    slopes/offsets, trainable L1-regularized modifiers and a
    model_specific_weight applied to the bass bridge via global_inharm
    (sub_modules.py:610-700).
    """

    input_keys = ('extended_pitch', 'global_inharm?')
    output_keys = ('inharm_coef',)

    def __init__(self, name='inharm_model'):
        self.name = name

    def init(self, key):
        return {
            'model_specific_weight': jnp.zeros((1,), jnp.float32),
            'slopes': jnp.asarray([_TREBLE_SLOPE * MIDI_NORM,
                                   _BASS_SLOPE * MIDI_NORM], jnp.float32),
            'offsets': jnp.asarray(
                [_TREBLE_INTERCEPT / (MIDI_NORM * _TREBLE_SLOPE),
                 _BASS_INTERCEPT / (MIDI_NORM * _BASS_SLOPE)], jnp.float32),
            'slopes_modifier': jnp.zeros((2,), jnp.float32),
            'offsets_modifier': jnp.zeros((2,), jnp.float32),
        }

    def _inharm(self, params, extended_pitch, global_inharm):
        reduced = core.f32(extended_pitch) / MIDI_NORM
        slopes = params['slopes'] + params['slopes_modifier']
        offsets = params['offsets'] + params['offsets_modifier']
        asymptotes = slopes * (reduced + offsets)
        if global_inharm is not None:
            gi = 10.0 * core.f32(global_inharm)
            gi = jnp.concatenate([jnp.zeros_like(gi), gi], axis=-1)
            asymptotes = asymptotes + params['model_specific_weight'] * gi
        return jnp.sum(jnp.exp(asymptotes), axis=-1, keepdims=True)

    def apply(self, params, extended_pitch, global_inharm=None,
              training=False):
        return self._inharm(params, extended_pitch, global_inharm)

    def regularization(self, params):
        return 0.1 * (jnp.sum(jnp.abs(params['slopes_modifier']))
                      + jnp.sum(jnp.abs(params['offsets_modifier'])))


class ParametricTuning(InharmonicityNetwork):
    """Rigaud parametric tuning: inharmonicity + Railsback octave stretch
    (sub_modules.py:703-759)."""

    input_keys = ('extended_pitch', 'global_inharm?')
    output_keys = ('f0_hz', 'inharm_coef')

    def __init__(self, name='inharm_model'):
        super().__init__(name=name)
        self.reference_a = 69.0
        self.pitch_translation = 64.0   # m_0
        self.decrease_slope = 24.0      # alpha
        self.low_bass_asymptote = 4.51 - 1  # K

    def streching_model(self, notes):
        rho = 1.0 - jnp.tanh((notes - self.pitch_translation)
                             / self.decrease_slope)
        return 1.0 + rho * (self.low_bass_asymptote / 2.0)

    def get_deviation_from_ET(self, params, notes, global_inharm=None):
        ref = jnp.full_like(core.f32(notes), self.reference_a)
        ref_inharm = self._inharm(params, ref, global_inharm)
        ratio = core.midi_to_hz(notes) / core.midi_to_hz(self.reference_a)
        rho = self.streching_model(notes)
        detuning = 1.0 + ref_inharm * (ratio * rho) ** 2
        detuning = detuning / (
            1.0 + self._inharm(params, notes, global_inharm) * rho ** 2)
        return jnp.sqrt(detuning)

    def apply(self, params, extended_pitch, global_inharm=None,
              training=False):
        inharm_coef = self._inharm(params, extended_pitch, global_inharm)
        detuning = self.get_deviation_from_ET(params, extended_pitch,
                                              global_inharm)
        f0_hz = core.midi_to_hz(extended_pitch) * detuning
        return f0_hz, inharm_coef


class JointParametricInharmTuning(nn.DictModule):
    """Per-instrument parametric inharmonicity + Railsback detuning, frozen
    pretrained parameters (sub_modules.py:762-870; v2 weights inline in
    maestro-v2.gin:44-115)."""

    input_keys = ('extended_pitch', 'piano_model')
    output_keys = ('f0_hz', 'inharm_coef')

    _WEIGHT_NAMES = ('alpha_b', 'beta_b', 'alpha_t', 'beta_t', 'pitch_ref',
                     'K', 'alpha')

    def __init__(self, n_instruments=10, pretrained_weights=None,
                 name='inharm_model'):
        self.name = name
        self.n_instruments = n_instruments
        self.pretrained_weights = pretrained_weights
        self.embeddings = {w: nn.Embedding(n_instruments, 1)
                           for w in self._WEIGHT_NAMES}

    def init(self, key):
        ks = nn.split_keys(key, self._WEIGHT_NAMES)
        params = {w: self.embeddings[w].init(k) for w, k in ks.items()}
        if self.pretrained_weights is not None:
            for w in self._WEIGHT_NAMES:
                params[w]['embeddings'] = jnp.asarray(
                    self.pretrained_weights[w], jnp.float32)
        return params

    def _lookup(self, params, name, piano_model):
        return self.embeddings[name](params[name], piano_model)

    def get_inharm(self, params, pitch, piano_model):
        bass = (self._lookup(params, 'alpha_b', piano_model) * pitch
                + self._lookup(params, 'beta_b', piano_model))
        treble = (self._lookup(params, 'alpha_t', piano_model) * pitch
                  + self._lookup(params, 'beta_t', piano_model))
        return jnp.exp(bass) + jnp.exp(treble)

    def get_deviation_from_ET(self, params, pitch, piano_model):
        ref = self._lookup(params, 'pitch_ref', piano_model)
        ratio = core.midi_to_hz(pitch) / core.midi_to_hz(ref)
        rho = 1.0 + self._lookup(params, 'K', piano_model) * (
            (1.0 - jnp.tanh((pitch - ref)
                            / self._lookup(params, 'alpha', piano_model)))
            / 2.0)
        detuning = 1.0 + self.get_inharm(params, ref, piano_model) * (
            ratio * rho) ** 2
        detuning = detuning / (
            1.0 + self.get_inharm(params, pitch, piano_model) * rho ** 2)
        return jnp.sqrt(detuning)

    def apply(self, params, extended_pitch, piano_model, training=False):
        extended_pitch = core.f32(extended_pitch)
        inharm_coef = self.get_inharm(params, extended_pitch, piano_model)
        detuning = self.get_deviation_from_ET(params, extended_pitch,
                                              piano_model)
        f0_hz = core.midi_to_hz(extended_pitch) * detuning
        return f0_hz, inharm_coef


class DeepInharmonicity(nn.DictModule):
    """MLP inharmonicity model (sub_modules.py:878-899)."""

    input_keys = ('extended_pitch', 'global_inharm?')
    output_keys = ('inharm_coef',)

    def __init__(self, ch=32, n_layers=4, name='inharm_model'):
        self.name = name
        self.hidden_layers = nn.FcStack(ch, 1, layers=n_layers - 1)
        self.scale_layer = nn.Dense(
            ch, ch, activation=lambda x: core.exp_sigmoid(x, max_value=1.0))
        self.out_layer = nn.Dense(1, ch, activation=lambda x: x / 1000.0)

    def init(self, key):
        ks = nn.split_keys(key, ['hidden_layers', 'scale_layer', 'out_layer'])
        return {n: getattr(self, n).init(k) for n, k in ks.items()}

    def apply(self, params, extended_pitch, global_inharm=None,
              training=False):
        x = self.hidden_layers(params['hidden_layers'],
                               core.f32(extended_pitch) / MIDI_NORM)
        x = self.scale_layer(params['scale_layer'], x)
        x = self.out_layer(params['out_layer'], x)
        if global_inharm is not None:
            x = x + jax.nn.relu(global_inharm)
        return x


# -----------------------------------------------------------------------------
# Detuners
# -----------------------------------------------------------------------------


class Detuner(nn.DictModule):
    """Zero-init frozen linear detuner per substring
    (sub_modules.py:902-942)."""

    input_keys = ('extended_pitch', 'global_detuning?')
    output_keys = ('f0_hz',)

    def __init__(self, n_substrings=2, use_detune=True, name='detuner'):
        self.name = name
        self.n_substrings = n_substrings
        self.use_detune = use_detune
        self.layer = nn.Dense(n_substrings, 1, kernel_init='zeros')

    def init(self, key):
        return {'layer': self.layer.init(key)}

    def apply(self, params, extended_pitch, global_detuning=None,
              training=False):
        extended_pitch = core.f32(extended_pitch)
        if self.use_detune:
            detuning = jnp.tanh(self.layer(params['layer'],
                                           extended_pitch / MIDI_NORM))
            if global_detuning is not None:
                detuning = detuning + jnp.tanh(global_detuning)
            extended_pitch = extended_pitch + detuning
        return core.midi_to_hz(extended_pitch)


class DeepDetuner(nn.DictModule):
    """MLP detuner (sub_modules.py:945-984)."""

    input_keys = ('extended_pitch', 'global_detuning?')
    output_keys = ('f0_hz',)

    def __init__(self, n_substrings=2, use_detune=True, ch=32, n_layers=3,
                 name='detuner'):
        self.name = name
        self.n_substrings = n_substrings
        self.use_detune = use_detune
        self.hidden_layers = nn.FcStack(ch, 1, layers=n_layers)
        self.out_layer = nn.Dense(n_substrings, ch, activation='tanh',
                                  kernel_init='zeros')

    def init(self, key):
        ks = nn.split_keys(key, ['hidden_layers', 'out_layer'])
        return {n: getattr(self, n).init(k) for n, k in ks.items()}

    def apply(self, params, extended_pitch, global_detuning=None,
              training=False):
        extended_pitch = core.f32(extended_pitch)
        if self.use_detune:
            detuning = self.out_layer(
                params['out_layer'],
                self.hidden_layers(params['hidden_layers'],
                                   extended_pitch / MIDI_NORM))
            if global_detuning is not None:
                detuning = detuning + jnp.tanh(global_detuning)
            extended_pitch = extended_pitch + detuning
        return core.midi_to_hz(extended_pitch)


class DictDetuner(nn.DictModule):
    """Per-MIDI-pitch detuning lookup (sub_modules.py:992-1015)."""

    input_keys = ('extended_pitch', 'piano_model?')
    output_keys = ('f0_hz',)

    def __init__(self, n_instruments=1, name='detuner'):
        self.name = name
        self.layer = nn.Embedding(128 * n_instruments, 1,
                                  embeddings_init='zeros')

    def init(self, key):
        return {'layer': self.layer.init(key)}

    def apply(self, params, extended_pitch, piano_model=None, training=False):
        idx = jnp.asarray(extended_pitch[..., 0], jnp.int32)
        return core.midi_to_hz(core.f32(extended_pitch)
                               + self.layer(params['layer'], idx))


class DictInharmonicityModel(nn.DictModule):
    """Per-MIDI-pitch inharmonicity lookup with negative-value penalty
    (sub_modules.py:1024-1046)."""

    input_keys = ('extended_pitch', 'piano_model?')
    output_keys = ('inharm_coef',)

    def __init__(self, n_instruments=1, name='inharm_model'):
        self.name = name
        self.layer = nn.Embedding(128 * n_instruments, 1,
                                  embeddings_init='zeros')

    def init(self, key):
        return {'layer': self.layer.init(key)}

    def apply(self, params, extended_pitch, piano_model=None, training=False):
        idx = jnp.asarray(extended_pitch[..., 0], jnp.int32)
        return self.layer(params['layer'], idx)

    def regularization(self, params):
        w = params['layer']['embeddings']
        return 1e2 * jnp.sum(jax.nn.relu(-w))


# -----------------------------------------------------------------------------
# Surrogate module and RNN utility cells
# -----------------------------------------------------------------------------


class SurrogateModule(nn.DictModule):
    """Per-pitch decay embeddings + frames-since-onset counter for the
    surrogate synth (sub_modules.py:1049-1105).

    The onset counter (reference OnsetLinspaceCell RNN) has the closed form
    t[i] = i - last_onset_index(i), computed here without a scan: a
    cummax over onset positions replaces the sequential reset logic.
    """

    input_keys = ('conditioning', 'extended_pitch')
    output_keys = ('decays', 'decay_time')

    def __init__(self, n_harmonics=96, name='surrogate_module'):
        self.name = name
        self.n_harmonics = n_harmonics
        self.amp_model = nn.Embedding(128, n_harmonics,
                                      embeddings_init='ones')

    def init(self, key):
        return {'amp_model': self.amp_model.init(key)}

    def apply(self, params, conditioning, extended_pitch, training=False,
              initial_state=None, return_state=False):
        """initial_state: (b, 1, 1) frames-since-onset carried across
        streaming chunks (0 = fresh start, matching the reference cell's
        zero initial state); return_state hands back the carry after the
        last frame."""
        decays = self.amp_model(params['amp_model'],
                                jnp.asarray(extended_pitch[..., 0],
                                            jnp.int32))
        onset = conditioning[..., 1:2]  # (b, t, 1)
        b, t, _ = onset.shape
        idx = jnp.arange(t, dtype=jnp.float32)[None, :, None]
        is_onset = (onset > 0).astype(jnp.float32)
        # Index of the most recent onset at or before each frame; frames
        # before any onset continue counting from the carried value (the
        # reference counts from 0 and holds 0 on onset frames:
        #   time[i] = 0 if onset[i] else time[i-1] + 1, time[-1] = 0).
        carry = (jnp.zeros((b, 1, 1), jnp.float32) if initial_state is None
                 else initial_state)
        last_onset = jax.lax.cummax(
            jnp.where(is_onset > 0, idx, -jnp.inf), axis=1)
        decay_time = jnp.where(jnp.isfinite(last_onset), idx - last_onset,
                               carry + idx + 1.0)
        if return_state:
            return decays, decay_time, decay_time[:, -1:]
        return decays, decay_time


class F0ProcessorCell:
    """Note-release state machine (sub_modules.py:1113-1170).

    Holds the previous pitch for release_duration seconds after note-off.
    Expressed as a lax.scan; the cell's single (frozen) variable
    release_duration is a checkpoint parameter.
    """

    def __init__(self, frame_rate=250):
        self.frame_rate = frame_rate

    def init(self, key):
        return {'release_duration': jnp.asarray(1.1, jnp.float32)}

    def step(self, params, state, midi_note):
        """One cell step; state: (batch, 2) = [held note, release count].

        Delegates to kernels.gru_pallas.note_release_reference (the single
        source of the recurrence math, which NoteRelease.apply and the
        Pallas kernel's parity tests also run) on a 1-step sequence.
        """
        from ddsp_piano_tpu.kernels.gru_pallas import note_release_reference
        threshold = jnp.reshape(
            params['release_duration'] * self.frame_rate, (1,))
        ys, new_state = note_release_reference(
            midi_note[None], threshold, state, unroll=1)
        return new_state, ys[0]


class NoteRelease(nn.DictModule):
    """Extend active pitch conditioning through the release
    (sub_modules.py:1173-1187)."""

    input_keys = ('conditioning',)
    output_keys = ('extended_pitch',)

    def __init__(self, frame_rate=250, name='note_release'):
        self.name = name
        self.cell = F0ProcessorCell(frame_rate=frame_rate)

    def init(self, key):
        return {'cell': self.cell.init(key)}

    def apply(self, params, conditioning, initial_state=None,
              return_state=False, training=False):
        from ddsp_piano_tpu.kernels.gru_pallas import note_release_scan

        active_pitch = conditioning[..., 0:1]  # (b, t, 1)
        b, t, _ = active_pitch.shape
        x = jnp.swapaxes(active_pitch, 0, 1)   # (t, b, 1)
        state0 = (jnp.zeros((b, 2), active_pitch.dtype)
                  if initial_state is None else initial_state)
        threshold = jnp.reshape(
            params['cell']['release_duration'] * self.cell.frame_rate, (1,))
        ys, final_state = note_release_scan(x, threshold, state0)
        extended = jnp.swapaxes(ys, 0, 1)
        if return_state:
            return extended, final_state
        return extended


class PartialMasking(nn.DictModule):
    """Zero partials above index n (sub_modules.py:1190-1216)."""

    input_keys = ('harmonic_distribution', 'n_partials?')
    output_keys = ('harmonic_distribution',)

    def __init__(self, n_partials=None, name='harmonic_masking'):
        self.name = name
        self.n_partials = n_partials

    def apply(self, params, harmonic_distribution, n_partials=None,
              training=False):
        n_partials = self.n_partials if n_partials is None else n_partials
        if n_partials is None:
            return harmonic_distribution
        n_harmonics = harmonic_distribution.shape[-1]
        index = jnp.arange(n_harmonics)
        return jnp.where(index < n_partials, harmonic_distribution,
                         -10.0 * jnp.ones_like(harmonic_distribution))
