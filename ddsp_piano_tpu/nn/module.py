"""Minimal functional module system.

Modules are *stateless configuration objects*: ``init(key)`` returns a pytree
of parameters (nested dicts/lists of jnp arrays) and ``apply(params, ...)``
is a pure function. This replaces the reference's Keras object graph with a
jit/vmap/grad-friendly design while keeping a layer structure that maps
cleanly onto the released TF checkpoints' object paths (see
ddsp_piano_tpu.training.checkpoints).

The dict-keyed feature routing of the reference's ``nn.DictLayer`` protocol
(named dict I/O; /root/reference/ddsp_piano/modules/sub_modules.py passim) is
provided by :class:`DictModule`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax

Params = Any  # nested dicts / lists of jax arrays


class Module:
    """Base class: static config + pure init/apply."""

    name: Optional[str] = None

    def init(self, key: jax.Array) -> Params:
        """Create parameters. Stateless modules return {}."""
        return {}

    def apply(self, params: Params, *args, **kwargs):
        raise NotImplementedError

    def __call__(self, params: Params, *args, **kwargs):
        return self.apply(params, *args, **kwargs)


class Sequential(Module):
    """Chain of modules applied in order.

    Params are a list aligned with the module list (stateless modules hold
    empty dicts), mirroring Keras Sequential traversal order.
    """

    def __init__(self, layers: Sequence[Module], name: Optional[str] = None):
        self.layers = list(layers)
        self.name = name

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, max(len(self.layers), 1))
        return [layer.init(k) for layer, k in zip(self.layers, keys)]

    def apply(self, params: Params, x, **kwargs):
        for layer, p in zip(self.layers, params):
            x = layer(p, x, **kwargs)
        return x

    def apply_with_state(self, params: Params, x, states=None,
                         norm_stats=None, **kwargs):
        """Apply, threading recurrent state through stateful layers.

        `states` is a list aligned with the layer list (None for stateless
        layers); `norm_stats` optionally maps a Normalize layer index to its
        fixed whole-sequence (mean, var). Used by the streaming-inference
        driver.
        """
        x, new_states, _ = self.apply_stream(params, x, states=states,
                                             norm_stats=norm_stats, **kwargs)
        return x, new_states

    def apply_stream(self, params: Params, x, states=None, norm_stats=None,
                     stop_after=None, **kwargs):
        """Streaming-mode apply.

        Threads GRU states like apply_with_state; Normalize layers listed in
        `norm_stats` ({layer_idx: (mean, var)}) use those fixed whole-file
        statistics (reference semantics — ddsp Normalize pools over the
        whole sequence), others fall back to per-chunk stats. The *input*
        of every Normalize without fixed stats is captured in the returned
        `prenorm` dict so the stats sweeps can accumulate whole-file
        moments; `stop_after` (a layer index) truncates the chain right
        after that layer's input capture — later layers would be discarded
        by the sweep anyway.

        Returns (x, new_states, prenorm).
        """
        from ddsp_piano_tpu.nn.layers import GRU, Normalize
        norm_stats = norm_stats or {}
        new_states = []
        prenorm = {}
        for i, (layer, p) in enumerate(zip(self.layers, params)):
            if isinstance(layer, Normalize) and i not in norm_stats:
                prenorm[i] = x
                if stop_after == i:
                    new_states.extend(
                        [None] * (len(self.layers) - len(new_states)))
                    return x, new_states, prenorm
            if isinstance(layer, GRU):
                s = states[i] if states is not None else None
                x, h = layer(p, x, initial_state=s, return_state=True,
                             **kwargs)
                new_states.append(h)
                continue
            if isinstance(layer, Normalize) and i in norm_stats:
                x = layer.apply_with_stats(p, x, *norm_stats[i])
            else:
                x = layer(p, x, **kwargs)
            new_states.append(None)
        return x, new_states, prenorm


def split_keys(key: jax.Array, names: Sequence[str]) -> Dict[str, jax.Array]:
    """Named RNG split."""
    keys = jax.random.split(key, max(len(names), 1))
    return dict(zip(names, keys))


class DictModule(Module):
    """Module with named dict I/O (the reference's DictLayer protocol).

    Subclasses declare ``input_keys`` (a key ending in '?' is optional and
    passed as None when absent from the features dict) and ``output_keys``;
    :meth:`apply_features` pulls inputs from a features dict and returns a
    dict of named outputs.
    """

    input_keys: Tuple[str, ...] = ()
    output_keys: Tuple[str, ...] = ()

    def apply_features(self, params: Params, features: Dict[str, Any],
                       training: bool = False) -> Dict[str, Any]:
        args = []
        for k in self.input_keys:
            optional = k.endswith('?')
            name = k[:-1] if optional else k
            if name in features and features[name] is not None:
                args.append(features[name])
            elif optional:
                args.append(None)
            else:
                raise KeyError(
                    f"{type(self).__name__} requires feature {name!r}; "
                    f"available: {sorted(features)}")
        outs = self.apply(params, *args, training=training)
        if not isinstance(outs, (tuple, list)):
            outs = (outs,)
        if len(outs) != len(self.output_keys):
            raise ValueError(
                f"{type(self).__name__} returned {len(outs)} outputs for "
                f"output_keys {self.output_keys}")
        return dict(zip(self.output_keys, outs))
