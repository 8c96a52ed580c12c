"""Model config registry.

The reference wires its models with gin files
(/root/reference/ddsp_piano/configs/*.gin, SURVEY §2.7). Here each shipped
configuration is an explicit Python builder registered by name — inspectable,
grep-able and jit-friendly — while ddsp_piano_tpu.configs.gin_compat can
parse the original .gin files onto the same builders for drop-in
compatibility.

Every builder accepts the runtime macros the reference overrides at entry
points (``inference``, ``duration``) plus keyword overrides, and returns a
ready PianoModel.
"""

from __future__ import annotations

import importlib
from typing import Callable, Dict

_CONFIGS: Dict[str, Callable] = {}

# Modules registering builders at import time. The 24 kHz / regularized
# variants are registered from inside dafx22.py / maestro_v2.py, so they
# have no module of their own. Imports are NOT exception-swallowed: a
# broken config module must fail loudly, not vanish from the registry.
_CONFIG_MODULES = (
    'ddsp_piano_tpu.configs.dafx22',            # + dafx22_24khz
    'ddsp_piano_tpu.configs.maestro_v2',        # + maestro_v2_regularized
    'ddsp_piano_tpu.configs.enstdkcl_32khz',
    'ddsp_piano_tpu.configs.enstdkcl_8khz',
    'ddsp_piano_tpu.configs.multi_instruments',
    'ddsp_piano_tpu.configs.surrogate',
)


def register(name: str):
    def decorator(fn: Callable):
        _CONFIGS[name] = fn
        return fn
    return decorator


def _ensure_loaded():
    for mod in _CONFIG_MODULES:
        importlib.import_module(mod)


def available_configs():
    _ensure_loaded()
    return sorted(_CONFIGS)


def get_model(config: str, inference: bool = False, duration: float = 3.0,
              **overrides):
    """Build a PianoModel from a registered config name or a .gin path."""
    _ensure_loaded()
    if config.endswith('.gin'):
        from ddsp_piano_tpu.configs import gin_compat
        return gin_compat.build_from_gin(config, inference=inference,
                                         duration=duration, **overrides)
    name = config.replace('-', '_')
    if name not in _CONFIGS:
        raise KeyError(f"Unknown config {config!r}; available: "
                       f"{available_configs()}")
    return _CONFIGS[name](inference=inference, duration=duration, **overrides)
