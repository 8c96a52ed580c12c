"""PianoModel: the MIDI-conditioning -> audio orchestrator (L2 top).

Functional equivalent of /root/reference/ddsp_piano/modules/piano_model.py:
global features -> polyphony fold (Parallelizer) -> monophonic features ->
unfold -> processor group -> losses. The forward pass is one pure function
of (params, features, rng), jit-compiled end to end.

Phase-alternating trainability (reference alternate_training,
piano_model.py:78-105) is expressed as a parameter *mask pytree* consumed by
the optimizer (optax.masked), not by mutating layer state; the detuner's
``use_detune`` gate is a static config flag (models are cheap to rebuild per
phase).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ddsp_piano_tpu import nn
from ddsp_piano_tpu.models.dag import VectorizedPolyphonicProcessorGroup
from ddsp_piano_tpu.models.losses import Loss
from ddsp_piano_tpu.models.sub_modules import Parallelizer


# Sub-modules whose parameters train in the *second* phase only (frequency
# computing modules; reference piano_model.py:83-92).
_SECOND_PHASE_MODULES = ('inharm_model', 'detuner', 'surrogate_module')
_FIRST_PHASE_MODULES = ('note_release', 'context_network',
                        'background_noise_model', 'monophonic_network',
                        'reverb_model')


class PianoModel:
    """Polyphonic differentiable piano synthesizer."""

    GLOBAL_SLOTS = ('z_encoder', 'context_network', 'background_noise_model',
                    'reverb_model')
    MONO_SLOTS = ('note_release', 'inharm_model', 'detuner',
                  'monophonic_network', 'surrogate_module',
                  'harmonic_masking')

    def __init__(self,
                 z_encoder=None,
                 note_release=None,
                 context_network=None,
                 parallelizer: Optional[Parallelizer] = None,
                 monophonic_network=None,
                 surrogate_module=None,
                 inharm_model=None,
                 detuner=None,
                 harmonic_masking=None,
                 background_noise_model=None,
                 reverb_model=None,
                 processor_group=None,
                 losses: Optional[List[Loss]] = None):
        self.z_encoder = z_encoder
        self.note_release = note_release
        self.context_network = context_network
        self.parallelizer = parallelizer
        self.monophonic_network = monophonic_network
        self.surrogate_module = surrogate_module
        self.inharm_model = inharm_model
        self.detuner = detuner
        self.harmonic_masking = harmonic_masking
        self.background_noise_model = background_noise_model
        self.reverb_model = reverb_model
        self.processor_group = processor_group
        self.loss_objs = list(losses) if losses else []

    # -- structure ----------------------------------------------------------

    @property
    def n_synths(self) -> int:
        return self.parallelizer.n_synths if self.parallelizer else 1

    @property
    def sample_rate(self) -> int:
        return self.processor_group.processors[0].sample_rate

    @property
    def frame_rate(self) -> int:
        return self.processor_group.processors[0].frame_rate

    def _module_slots(self):
        for slot in self.GLOBAL_SLOTS + self.MONO_SLOTS:
            module = getattr(self, slot)
            if module is not None:
                yield slot, module

    # -- params -------------------------------------------------------------

    def init(self, key: jax.Array) -> Dict[str, Any]:
        slots = [s for s, _ in self._module_slots()] + ['processor_group']
        keys = nn.split_keys(key, slots)
        params = {slot: module.init(keys[slot])
                  for slot, module in self._module_slots()}
        if self.processor_group is not None:
            params['processor_group'] = self.processor_group.init(
                keys['processor_group'])
        return params

    def trainable_mask(self, params, phase: Optional[int] = None,
                       first_phase: Optional[bool] = None):
        """Boolean pytree marking trainable leaves for the given phase.

        phase=None (or first_phase=None with no phase) -> everything
        trainable except structurally-frozen parameters (NoteRelease's
        release_duration, the frozen Detuner dense layer, frozen
        inharmonicity slopes/offsets, pretrained joint tuning weights).
        """
        from ddsp_piano_tpu.models import sub_modules as sm

        if first_phase is None and phase is not None:
            first_phase = (phase % 2) == 1

        def frozen_structural(slot, module) -> bool:
            # Only *per-weight* freezes survive Keras' recursive trainable
            # propagation in the reference; layer-level ones (Detuner's
            # zero-init dense, NoteRelease's cell) are overwritten by
            # alternate_training and DID train — the released dafx22
            # checkpoint shows nonzero detuner weights and
            # release_duration 1.1 -> 1.0. JointParametricInharmTuning is
            # kept frozen when pretrained (the published-weights design;
            # its gradient-through-oscillator optimization is documented
            # unfeasible, sub_modules.py:768-777).
            if isinstance(module, sm.JointParametricInharmTuning):
                return module.pretrained_weights is not None
            return False

        def slot_trainable(slot, module) -> bool:
            if frozen_structural(slot, module):
                return False
            if first_phase is None:
                return True
            if slot in _SECOND_PHASE_MODULES:
                return not first_phase
            if slot in _FIRST_PHASE_MODULES:
                return first_phase
            return True

        mask = {}
        for slot, module in self._module_slots():
            p = params[slot]
            if slot == 'z_encoder' and first_phase is not None and hasattr(
                    module, 'inharm_embedding'):
                # OneHotZEncoder splits: z embedding follows phase 1,
                # inharm/detune embeddings phase 2 (sub_modules.py:217-227).
                mask[slot] = {
                    'embedding': jax.tree.map(lambda _: first_phase,
                                              p['embedding']),
                    'inharm_embedding': jax.tree.map(
                        lambda _: not first_phase, p['inharm_embedding']),
                    'detune_embedding': jax.tree.map(
                        lambda _: not first_phase, p['detune_embedding']),
                }
                continue
            trainable = slot_trainable(slot, module)
            if (isinstance(module, sm.InharmonicityNetwork)
                    and not isinstance(module,
                                       sm.JointParametricInharmTuning)):
                # slopes/offsets are always frozen; modifiers and the
                # model-specific weight follow the phase.
                mask[slot] = {
                    k: jax.tree.map(
                        lambda _: trainable and k not in ('slopes',
                                                          'offsets'), v)
                    for k, v in p.items()}
                continue
            mask[slot] = jax.tree.map(lambda _: trainable, p)
        if self.processor_group is not None:
            # The reference's alternate_training never touches the
            # processor group: trainable-processor parameters (e.g. the
            # standalone FDN reverb of the ENSTDkCl configs) train in
            # every phase.
            pg = params['processor_group']
            mask['processor_group'] = jax.tree.map(lambda _: True, pg)
        return mask

    # -- forward ------------------------------------------------------------

    def compute_global_features(self, params, features, training):
        for slot in self.GLOBAL_SLOTS:
            module = getattr(self, slot)
            if module is not None:
                features.update(module.apply_features(
                    params[slot], features, training=training))
        return features

    def compute_monophonic_features(self, params, features, training):
        for slot in self.MONO_SLOTS:
            module = getattr(self, slot)
            if module is not None:
                features.update(module.apply_features(
                    params[slot], features, training=training))
        return features

    def regularization_loss(self, params):
        total = 0.0
        for slot, module in self._module_slots():
            reg = getattr(module, 'regularization', None)
            if reg is not None:
                total = total + reg(params[slot])
        return jnp.asarray(total, jnp.float32)

    def get_audio_from_outputs(self, outputs):
        return outputs['audio_synth']

    def apply(self, params, features: Dict[str, Any], training: bool = False,
              rng: Optional[jax.Array] = None,
              use_sequential_dag: bool = False) -> Dict[str, Any]:
        features = dict(features)
        batch_size = features['conditioning'].shape[0]

        features = self.compute_global_features(params, features, training)
        features = self.parallelizer.parallelize(features)
        features = self.compute_monophonic_features(params, features,
                                                    training)
        features = self.parallelizer.unparallelize(features, batch_size)

        pg_params = params.get('processor_group', {})
        if (use_sequential_dag
                or not isinstance(self.processor_group,
                                  VectorizedPolyphonicProcessorGroup)):
            group = (self.processor_group.as_sequential_group()
                     if isinstance(self.processor_group,
                                   VectorizedPolyphonicProcessorGroup)
                     else self.processor_group)
            pg_out = group(pg_params, features, rng=rng)
        else:
            pg_out = self.processor_group(pg_params, features, rng=rng)

        outputs = pg_out['controls']
        outputs['audio_synth'] = pg_out['signal']

        if training:
            losses = {}
            for loss_obj in self.loss_objs:
                losses[loss_obj.name] = loss_obj.compute(outputs)
            losses['regularization_loss'] = self.regularization_loss(params)
            losses['total_loss'] = sum(losses.values())
            outputs['losses'] = losses
        return outputs

    def __call__(self, params, features, **kwargs):
        return self.apply(params, features, **kwargs)

    def loss_keys(self):
        return ([l.name for l in self.loss_objs]
                + ['regularization_loss', 'total_loss'])
