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

    def apply_with_state(self, params: Params, x, states=None, **kwargs):
        """Apply, threading recurrent state through stateful layers.

        `states` is a list aligned with the layer list (None for stateless
        layers). Used by the streaming-inference driver to carry GRU hidden
        states across chunks.
        """
        from ddsp_piano_tpu.nn.layers import GRU
        new_states = []
        for i, (layer, p) in enumerate(zip(self.layers, params)):
            if isinstance(layer, GRU):
                s = states[i] if states is not None else None
                x, h = layer(p, x, initial_state=s, return_state=True,
                             **kwargs)
                new_states.append(h)
            else:
                x = layer(p, x, **kwargs)
                new_states.append(None)
        return x, new_states


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
