"""Direct unit coverage of sub-modules not exercised by the shipped
configs (BackgroundNoiseFilter, DeepInharmonicity, DictDetuner,
PartialMasking, SimpleContextNet FiLM path) plus FDN solve parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddsp_piano_tpu import nn
from ddsp_piano_tpu.models import sub_modules as sm
from ddsp_piano_tpu.ops import fdn

RNG = np.random.RandomState(7)


def test_background_noise_filter():
    mod = sm.BackgroundNoiseFilter(n_instruments=4, n_filters=8,
                                   duration=1.0, frame_rate=250)
    params = mod.init(jax.random.PRNGKey(0))
    out = mod.apply_features(params, {'piano_model': jnp.asarray([[1]])})
    assert out['background_mag'].shape == (1, 250, 8)
    denoised = sm.BackgroundNoiseFilter(n_instruments=4, n_filters=8,
                                        duration=1.0, frame_rate=250,
                                        denoise=True)
    out2 = denoised.apply(params, jnp.asarray([[1]]))
    np.testing.assert_array_equal(np.asarray(out2), -10.0)


def test_deep_inharmonicity_positive_and_small():
    mod = sm.DeepInharmonicity(ch=8, n_layers=3)
    params = mod.init(jax.random.PRNGKey(0))
    pitch = jnp.asarray(np.linspace(21, 108, 20, dtype=np.float32)
                        ).reshape(1, 20, 1)
    out = np.asarray(mod.apply(params, pitch))
    assert out.shape == (1, 20, 1)
    assert np.abs(out).max() < 1e-2  # /1000 output scaling
    # global_inharm adds only its positive part.
    out2 = np.asarray(mod.apply(params, pitch,
                                jnp.full((1, 20, 1), -5.0)))
    np.testing.assert_allclose(out2, out, atol=1e-7)


def test_dict_detuner_and_inharm():
    det = sm.DictDetuner()
    params = det.init(jax.random.PRNGKey(0))
    pitch = jnp.full((1, 5, 1), 69.0)
    f0 = np.asarray(det.apply(params, pitch))
    np.testing.assert_allclose(f0, 440.0, rtol=1e-4)  # zero-init detuning

    inh = sm.DictInharmonicityModel()
    p2 = inh.init(jax.random.PRNGKey(1))
    out = np.asarray(inh.apply(p2, pitch))
    np.testing.assert_array_equal(out, 0.0)
    # Negative-value penalty is active.
    p2['layer']['embeddings'] = p2['layer']['embeddings'] - 0.01
    assert float(inh.regularization(p2)) > 0


def test_partial_masking():
    mod = sm.PartialMasking(n_partials=3)
    dist = jnp.ones((1, 4, 8))
    out = np.asarray(mod.apply({}, dist))
    np.testing.assert_array_equal(out[..., :3], 1.0)
    np.testing.assert_array_equal(out[..., 3:], -10.0)


def test_simple_context_net_film():
    mod = sm.SimpleContextNet(
        layers=[nn.Dense(16, 4, activation='leaky_relu')],
        out_features=16, output_splits=(('context', 8),))
    params = mod.init(jax.random.PRNGKey(0))
    pedal = jnp.asarray(RNG.rand(1, 10, 4).astype(np.float32))
    base = np.asarray(mod.apply(params, pedal))
    z = jnp.concatenate([2 * jnp.ones((1, 1, 8)), jnp.zeros((1, 1, 8))],
                        axis=-1)
    filmed = np.asarray(mod.apply(params, pedal, z))
    np.testing.assert_allclose(filmed, 2 * base, rtol=1e-5)


def test_parametric_tuning_railsback_shape():
    """Bass stretched flat-ward, treble sharp-ward relative to ET."""
    mod = sm.ParametricTuning()
    params = mod.init(jax.random.PRNGKey(0))
    pitches = jnp.asarray(np.linspace(21, 108, 30, dtype=np.float32)
                          ).reshape(1, 30, 1)
    f0, inharm = mod.apply(params, pitches)
    from ddsp_piano_tpu.ops import core
    cents = 1200 * np.log2(np.asarray(f0)[0, :, 0]
                           / np.asarray(core.midi_to_hz(pitches))[0, :, 0])
    assert cents[0] < -2.0      # low bass pulled flat
    assert cents[-1] > 2.0      # high treble stretched sharp
    assert abs(cents[15]) < 4.0  # near-reference mid-range
    assert (np.asarray(inharm) > 0).all()


def test_surrogate_module_decay_time_closed_form():
    mod = sm.SurrogateModule(n_harmonics=4)
    params = mod.init(jax.random.PRNGKey(0))
    cond = np.zeros((1, 10, 2), np.float32)
    cond[0, 3, 1] = 0.5   # onset at frame 3
    cond[0, 7, 1] = 0.5   # onset at frame 7
    pitch = jnp.full((1, 10, 1), 60.0)
    decays, decay_time = mod.apply(params, jnp.asarray(cond), pitch)
    want = [1, 2, 3, 0, 1, 2, 3, 0, 1, 2]
    np.testing.assert_array_equal(np.asarray(decay_time)[0, :, 0], want)
    assert decays.shape == (1, 10, 4)


def test_fdn_sherman_morrison_matches_dense_solve():
    rng = np.random.RandomState(3)
    params = fdn.FDNParams(
        input_gain=jnp.asarray(rng.randn(8) * 0.2 + 0.25, jnp.float32),
        output_gain=jnp.asarray(rng.randn(8) * 0.2 + 0.25, jnp.float32),
        gain_allpass=jnp.asarray(rng.randn(8, 4) * 0.1 + 0.25, jnp.float32),
        delays_allpass=jnp.asarray(rng.randn(8, 4) * 60 + 400, jnp.float32),
        time_rev_0_sec=jnp.asarray(1.5),
        alpha_tone=jnp.asarray(0.6),
        early_ir=jnp.asarray(rng.randn(200) * 0.1, jnp.float32))
    fast = fdn.fdn_late_ir(params, 2000.0, use_householder_closed_form=True)
    slow = fdn.fdn_late_ir(params, 2000.0, use_householder_closed_form=False)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               atol=1e-6)
