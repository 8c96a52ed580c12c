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


def test_stretch_config_48khz_polyphony32():
    """Stretch target: dafx22 scaled to 48 kHz / 32-voice polyphony trains
    (config overrides are first-class, no fixed-size assumptions)."""
    import numpy as np

    from ddsp_piano_tpu.parallel import mesh as mesh_lib
    from ddsp_piano_tpu.training.trainer import Trainer

    model = get_model('dafx22', duration=0.2, sample_rate=48000,
                      n_synths=32, n_harmonics=160, n_noise_bands=128)
    assert model.sample_rate == 48000 and model.n_synths == 32
    trainer = Trainer(model, mesh=mesh_lib.get_mesh(1))
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = get_dummy_data(batch_size=1, duration=0.2, sample_rate=48000,
                           n_synths=32)
    state, losses = trainer.train_step(state, batch)
    assert np.isfinite(losses['total_loss'])
