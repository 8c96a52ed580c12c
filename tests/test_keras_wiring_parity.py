"""Independent wiring validation: released dafx22 weights driven through
Keras layers vs this framework's modules on identical inputs.

Complements the per-layer golden tests (random weights) by checking the
checkpoint->pytree mapping and the layer chain with the *actual released
weights* against Keras as an independent implementation. Stops before the
ddsp `Normalize` layer (no independent implementation exists offline); the
normalize semantics are covered by their own unit test.
"""

import os

import numpy as np
import pytest

import jax

DAFX22_CKPT = '/root/reference/ddsp_piano/model_weights/dafx22'
needs_ref = pytest.mark.skipif(not os.path.isdir(DAFX22_CKPT),
                               reason="released checkpoint not mounted")

RNG = np.random.RandomState(11)


@pytest.fixture(scope='module')
def imported():
    from ddsp_piano_tpu.configs import get_model
    from ddsp_piano_tpu.training import checkpoints

    model = get_model('dafx22', duration=1.0, inference=True)
    params = model.init(jax.random.PRNGKey(0))
    params, _ = checkpoints.import_tf_weights(model, params, DAFX22_CKPT)
    return model, params


def _keras_chain(layer_params, specs, x):
    """Apply Keras layers with the given imported weights."""
    import tensorflow as tf

    out = tf.constant(x)
    for p, spec in zip(layer_params, specs):
        kind = spec[0]
        if kind == 'dense':
            layer = tf.keras.layers.Dense(spec[1], activation=spec[2])
            layer.build(out.shape)
            layer.set_weights([np.asarray(p['kernel']),
                               np.asarray(p['bias'])])
        elif kind == 'gru':
            layer = tf.keras.layers.GRU(spec[1], return_sequences=True)
            layer.build(out.shape)
            layer.set_weights([np.asarray(p['kernel']),
                               np.asarray(p['recurrent_kernel']),
                               np.asarray(p['bias'])])
        out = layer(out)
    return out.numpy()


@needs_ref
def test_mono_network_prenorm_chain_matches_keras(imported):
    import tensorflow as tf

    model, params = imported
    x = RNG.randn(3, 40, 35).astype(np.float32)
    mono = model.monophonic_network
    p = params['monophonic_network']['model']

    want = _keras_chain(
        p[:3],
        [('dense', 128, tf.nn.leaky_relu), ('gru', 192, None),
         ('dense', 192, tf.nn.leaky_relu)], x)

    got = x
    for layer, lp in zip(mono.model.layers[:3], p[:3]):
        got = layer(lp, got)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


@needs_ref
def test_context_network_prenorm_chain_matches_keras(imported):
    import tensorflow as tf

    model, params = imported
    x = RNG.randn(2, 30, 52).astype(np.float32)
    ctx = model.context_network
    p = params['context_network']['model']

    want = _keras_chain(
        p[:2], [('dense', 32, tf.nn.leaky_relu), ('gru', 64, None)], x)
    got = x
    for layer, lp in zip(ctx.model.layers[:2], p[:2]):
        got = layer(lp, got)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


@needs_ref
def test_dense_out_split_layout(imported):
    """dense_out kernel splits: [amplitudes | harm(96) | mags(64)]."""
    model, params = imported
    mono = model.monophonic_network
    assert mono.output_splits == (('amplitudes', 1),
                                  ('harmonic_distribution', 96),
                                  ('magnitudes', 64))
    kernel = np.asarray(params['monophonic_network']['dense_out']['kernel'])
    assert kernel.shape == (192, 161)
