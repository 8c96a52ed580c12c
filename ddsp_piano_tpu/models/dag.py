"""Polyphonic DAG builder + vectorized batched-voice renderer.

The reference builds a ProcessorGroup DAG that loops the 16 voices through
one shared additive + noise synth sequentially
(/root/reference/ddsp_piano/modules/polyphonic_dag.py:5-42) — an artifact of
Keras layer sharing. On TPU the idiomatic form is a single *folded-batch*
render: all (n_synths * batch) voices go through one oscillator/noise call,
then the voice axis is summed. Both are provided; they are numerically
equivalent (same per-voice math, different summation order) and tested
against each other.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ddsp_piano_tpu.processors.base import MultiAdd, Processor, ProcessorGroup


def polyphonic_dag(additive: Processor,
                   noise: Processor,
                   reverb: Optional[Processor] = None,
                   additive_controls: Sequence[str] = (
                       'amplitudes', 'harmonic_distribution', 'inharm_coef',
                       'f0_hz'),
                   noise_controls: Sequence[str] = ('magnitudes',),
                   reverb_controls: Sequence[str] = (),
                   n_synths: int = 16) -> List[Tuple[Processor, List[str]]]:
    """Build the reference-style per-voice DAG for a ProcessorGroup.

    Defaults match this framework's Parallelizer key names and the
    InHarmonic control signature (the reference's gin defaults —
    polyphonic_dag.py:6-9 'amps'/'noise_magnitudes' — are likewise
    unusable without explicit binding; every shipped config binds them)."""
    add = MultiAdd(name='add')
    dag: List[Tuple[Processor, List[str]]] = []
    dag.append((additive, [c + '_0' for c in additive_controls]))
    dag.append((noise, [c + '_0' for c in noise_controls]))
    dag.append((add, [noise.name + '/signal', additive.name + '/signal']))
    for i in range(1, n_synths):
        dag.append((additive, [c + f'_{i}' for c in additive_controls]))
        dag.append((noise, [c + f'_{i}' for c in noise_controls]))
        dag.append((add, ['add/signal', noise.name + '/signal',
                          additive.name + '/signal']))
    if reverb is not None:
        dag.append((reverb, ['add/signal'] + list(reverb_controls)))
    return dag


class VectorizedPolyphonicProcessorGroup:
    """Batched-voice drop-in for the polyphonic ProcessorGroup.

    Evaluates additive and noise synths once over the folded
    (n_synths * batch) axis, sums the voice axis, then applies the reverb.
    Produces the same outputs-dict structure as the DAG interpreter
    (last-voice processor entries, 'add/signal', final 'signal') so entry
    points and losses are agnostic to which path ran.
    """

    def __init__(self,
                 additive: Processor,
                 noise: Processor,
                 reverb: Optional[Processor] = None,
                 additive_controls: Sequence[str] = (
                     'amplitudes', 'harmonic_distribution', 'inharm_coef',
                     'f0_hz'),
                 noise_controls: Sequence[str] = ('magnitudes',),
                 reverb_controls: Sequence[str] = ('reverb_ir',),
                 n_synths: int = 16,
                 name: str = 'processor_group'):
        self.additive = additive
        self.noise = noise
        self.reverb = reverb
        self.additive_controls = tuple(additive_controls)
        self.noise_controls = tuple(noise_controls)
        self.reverb_controls = tuple(reverb_controls)
        self.n_synths = n_synths
        self.name = name
        # The equivalent sequential DAG (for parity testing / export).
        self.dag = polyphonic_dag(additive, noise, reverb,
                                  additive_controls, noise_controls,
                                  reverb_controls, n_synths)

    @property
    def processors(self) -> List[Processor]:
        procs = [self.additive, self.noise]
        if self.reverb is not None:
            procs.append(self.reverb)
        return procs

    def init(self, key):
        group = ProcessorGroup(self.dag, name=self.name)
        return group.init(key)

    def _fold(self, stacked):
        """(n_synths, batch, ...) -> (n_synths * batch, ...)."""
        return stacked.reshape((-1,) + stacked.shape[2:])

    def apply(self, params: dict, features: Dict[str, jax.Array],
              rng: Optional[jax.Array] = None, **kwargs) -> dict:
        """features must hold the *stacked* mono controls
        (n_synths, batch, ...) under their base keys (as produced by
        Parallelizer.unparallelize) plus any reverb controls."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        outputs = dict(features)
        n = self.n_synths
        batch = features[self.additive_controls[0]].shape[1]

        add_args = [self._fold(features[c]) for c in self.additive_controls]
        add_params = params.get(self.additive.name, {}) if params else {}
        add_ctrl = self.additive.get_controls(add_params, *add_args)
        sig_add = self.additive.get_signal(
            add_params, rng=jax.random.fold_in(rng, 0), **add_ctrl)

        noise_args = [self._fold(features[c]) for c in self.noise_controls]
        noise_params = params.get(self.noise.name, {}) if params else {}
        noise_ctrl = self.noise.get_controls(noise_params, *noise_args)
        sig_noise = self.noise.get_signal(
            noise_params, rng=jax.random.fold_in(rng, 1), **noise_ctrl)

        n_samples = sig_add.shape[-1]
        mix = (sig_add + sig_noise).reshape(n, batch, n_samples).sum(axis=0)

        # Populate the outputs dict like the sequential DAG would: the
        # shared processors' entries hold the last voice's outputs.
        last = slice((n - 1) * batch, n * batch)
        outputs[self.additive.name] = {
            'signal': sig_add[last],
            'controls': {k: v[last] for k, v in add_ctrl.items()}}
        outputs[self.noise.name] = {
            'signal': sig_noise[last],
            'controls': {k: v[last] for k, v in noise_ctrl.items()}}
        outputs['add'] = {'signal': mix}

        signal = mix
        if self.reverb is not None:
            rev_params = params.get(self.reverb.name, {}) if params else {}
            rev_args = [mix] + [features[c] for c in self.reverb_controls]
            rev_ctrl = self.reverb.get_controls(rev_params, *rev_args)
            signal = self.reverb.get_signal(
                rev_params, rng=jax.random.fold_in(rng, 2), **rev_ctrl)
            outputs[self.reverb.name] = {'signal': signal,
                                         'controls': rev_ctrl}
        outputs['out'] = {'signal': signal}
        return {'signal': signal, 'controls': outputs}

    def __call__(self, params, features, **kwargs):
        return self.apply(params, features, **kwargs)

    def as_sequential_group(self) -> ProcessorGroup:
        return ProcessorGroup(self.dag, name=self.name)
