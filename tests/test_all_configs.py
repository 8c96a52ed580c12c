"""Smoke: every registered config builds, initializes, forwards and has
finite losses (the gin_test.py equivalent, over all model families)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddsp_piano_tpu.configs import available_configs, get_model
from ddsp_piano_tpu.data.pipeline import get_dummy_data

DUR = 0.5


@pytest.mark.parametrize('name', available_configs())
def test_config_forward_and_losses(name):
    model = get_model(name, duration=DUR)
    params = model.init(jax.random.PRNGKey(0))
    feats = get_dummy_data(batch_size=1, duration=DUR,
                           sample_rate=model.sample_rate)
    feats = {k: jnp.asarray(v) for k, v in feats.items()}

    outs = jax.jit(
        lambda p, f: model(p, f, training=True, rng=jax.random.PRNGKey(1)))(
            params, feats)
    n_samples = int(model.sample_rate * DUR)
    assert outs['audio_synth'].shape == (1, n_samples)
    for k, v in outs['losses'].items():
        assert np.isfinite(float(v)), (name, k, float(v))


@pytest.mark.parametrize('name', available_configs())
def test_config_trainable_mask(name):
    model = get_model(name, duration=DUR)
    params = model.init(jax.random.PRNGKey(0))
    for phase in (1, 2):
        mask = model.trainable_mask(params, phase=phase)
        assert jax.tree.structure(mask) == jax.tree.structure(params)
