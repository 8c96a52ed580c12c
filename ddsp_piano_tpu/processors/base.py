"""Processor protocol and ProcessorGroup DAG runtime (L1).

Functional equivalents of the ``ddsp.processors`` surface the reference
consumes (Processor get_controls/get_signal protocol, ProcessorGroup
evaluating a named-edge DAG over a controls dict with '<name>/signal'
routing, Add; consumed at /root/reference/ddsp_piano/modules/piano_model.py:160
and polyphonic_dag.py:5-42).

Processors are stateless config objects; trainable processors implement
``init``. Randomness (e.g. the noise synth's uniform source) is threaded
explicitly through an optional ``rng`` argument, keeping everything pure for
jit. The generic DAG interpreter is kept for full API parity; the piano
model's hot path uses the vectorized polyphonic render in
ddsp_piano_tpu.models.dag which evaluates all voices as one folded batch.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ddsp_piano_tpu.nn.module import Module, Params

Array = jax.Array


class Processor(Module):
    """get_controls/get_signal protocol."""

    def __init__(self, name: str = 'processor'):
        self.name = name

    def get_controls(self, params: Params, *args, **kwargs) -> Dict[str, Any]:
        raise NotImplementedError

    def get_signal(self, params: Params, **controls) -> Array:
        raise NotImplementedError

    def apply(self, params: Params, *args, return_outputs_dict: bool = False,
              rng: Optional[Array] = None, **kwargs):
        controls = self.get_controls(params, *args, **kwargs)
        signal = self.get_signal(params, rng=rng, **controls)
        if return_outputs_dict:
            return {'signal': signal, 'controls': controls}
        return signal


class Add(Processor):
    """Sum two signals."""

    def __init__(self, name: str = 'add'):
        super().__init__(name=name)

    def get_controls(self, params, signal_one, signal_two):
        return {'signal_one': signal_one, 'signal_two': signal_two}

    def get_signal(self, params, signal_one, signal_two, rng=None):
        return signal_one + signal_two


class MultiAdd(Processor):
    """Sum an arbitrary number of signals (reference inharm_synth.py:296-309)."""

    def __init__(self, name: str = 'add'):
        super().__init__(name=name)

    def get_controls(self, params, *signals):
        return {f'signal_{i}': s for i, s in enumerate(signals)}

    def get_signal(self, params, rng=None, **signals):
        total = None
        for k in sorted(signals, key=lambda s: int(s.split('_')[-1])):
            total = signals[k] if total is None else total + signals[k]
        return total


def nested_lookup(key: str, outputs: Dict[str, Any]):
    """Resolve 'a/b/c' paths into a nested dict."""
    node = outputs
    for part in key.split('/'):
        try:
            node = node[part]
        except (KeyError, TypeError) as e:
            raise KeyError(f"Key {key!r} not found while resolving DAG input "
                           f"(failed at {part!r}).") from e
    return node


DAG = Sequence[Tuple[Processor, Sequence[str]]]


class ProcessorGroup(Module):
    """Evaluate a DAG of processors over a features dict.

    Each node is (processor, input_keys); input keys may reference raw
    features or previous outputs via '<name>/signal' /
    '<name>/controls/<key>' paths. Returns
    ``{'signal': final_audio, 'controls': outputs_dict}`` where the outputs
    dict contains all input features plus per-processor
    ``{'signal', 'controls'}`` entries — the structure the reference's entry
    points rely on (e.g. outs['add']['signal'] at synthesize_midi_file.py:85).
    """

    def __init__(self, dag: DAG, name: str = 'processor_group'):
        self.dag = list(dag)
        self.name = name

    @property
    def processors(self) -> List[Processor]:
        return [node[0] for node in self.dag]

    def init(self, key) -> Params:
        # One param set per distinct processor name (a processor reused
        # across DAG nodes shares parameters, as in the reference).
        params: Dict[str, Any] = {}
        names = []
        for proc, _ in self.dag:
            if proc.name not in params:
                names.append(proc.name)
                params[proc.name] = None
        keys = jax.random.split(key, max(len(names), 1))
        for name, k in zip(names, keys):
            proc = next(p for p, _ in self.dag if p.name == name)
            params[name] = proc.init(k)
        return params

    def apply(self, params: Params, dag_inputs: Dict[str, Any],
              rng: Optional[Array] = None, **kwargs) -> Dict[str, Any]:
        outputs = dict(dag_inputs)
        signal = None
        if rng is None:
            rng = jax.random.PRNGKey(0)
        for i, (processor, input_keys) in enumerate(self.dag):
            args = [nested_lookup(k, outputs) for k in input_keys]
            node_rng = jax.random.fold_in(rng, i)
            proc_params = params.get(processor.name, {}) if params else {}
            controls = processor.get_controls(proc_params, *args, **kwargs)
            signal = processor.get_signal(proc_params, rng=node_rng,
                                          **controls)
            outputs[processor.name] = {'signal': signal, 'controls': controls}
        outputs['out'] = {'signal': signal}
        return {'signal': signal, 'controls': outputs}
