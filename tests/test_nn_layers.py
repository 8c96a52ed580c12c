"""Golden tests: nn layers vs Keras equivalents (weight-compatible)."""

import numpy as np
import pytest
import tensorflow as tf

import jax.numpy as jnp
import jax

from ddsp_piano_tpu import nn

RNG = np.random.RandomState(3)


def test_dense_matches_keras():
    x = RNG.randn(4, 7, 5).astype(np.float32)
    keras_layer = tf.keras.layers.Dense(11, activation=tf.nn.leaky_relu)
    want = keras_layer(x).numpy()
    kernel, bias = [w.numpy() for w in keras_layer.weights]

    layer = nn.Dense(11, 5, activation='leaky_relu')
    got = layer({'kernel': jnp.asarray(kernel), 'bias': jnp.asarray(bias)}, x)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_layernorm_matches_keras():
    x = RNG.randn(4, 7, 16).astype(np.float32) * 3 + 1
    keras_layer = tf.keras.layers.LayerNormalization()
    want = keras_layer(x).numpy()
    gamma, beta = [w.numpy() for w in keras_layer.weights]
    layer = nn.LayerNormalization(16)
    got = layer({'gamma': jnp.asarray(gamma), 'beta': jnp.asarray(beta)}, x)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_normalize_pools_over_time_and_channels():
    """ddsp Normalize('layer') semantics: per-batch stats over (time, ch)."""
    x = RNG.randn(3, 10, 8).astype(np.float32) * 2 + 5
    layer = nn.Normalize(8)
    params = layer.init(jax.random.PRNGKey(0))
    got = np.asarray(layer(params, x))
    for b in range(3):
        flat = got[b].ravel()
        assert abs(flat.mean()) < 1e-4
        assert abs(flat.std() - 1.0) < 1e-3


@pytest.mark.parametrize("units,in_dim,steps", [(8, 5, 12), (64, 32, 20)])
def test_gru_matches_keras(units, in_dim, steps):
    x = RNG.randn(3, steps, in_dim).astype(np.float32)
    keras_gru = tf.keras.layers.GRU(units, return_sequences=True)
    want = keras_gru(x).numpy()
    kernel, rec_kernel, bias = [w.numpy() for w in keras_gru.weights]
    assert bias.shape == (2, 3 * units)

    layer = nn.GRU(units, in_dim)
    params = {'kernel': jnp.asarray(kernel),
              'recurrent_kernel': jnp.asarray(rec_kernel),
              'bias': jnp.asarray(bias)}
    got = np.asarray(layer(params, x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_gru_state_carry_matches_full_run():
    units, in_dim = 8, 4
    layer = nn.GRU(units, in_dim)
    params = layer.init(jax.random.PRNGKey(1))
    x = jnp.asarray(RNG.randn(2, 20, in_dim).astype(np.float32))
    full = layer(params, x)
    first, h = layer(params, x[:, :10], return_state=True)
    second = layer(params, x[:, 10:], initial_state=h)
    np.testing.assert_allclose(np.asarray(full),
                               np.concatenate([first, second], axis=1),
                               rtol=1e-5, atol=1e-5)


def test_fc_stack_matches_keras_composition():
    """FcStack == Dense -> LayerNorm(eps 1e-3) -> leaky_relu, stacked."""
    x = RNG.randn(2, 6, 10).astype(np.float32)
    stack = nn.FcStack(16, 10, layers=2)
    params = stack.init(jax.random.PRNGKey(2))

    # Keras composition with copied weights.
    out_tf = tf.constant(x)
    for fc_params in params:
        dense_p, ln_p, _ = fc_params
        d = tf.keras.layers.Dense(16)
        d.build(out_tf.shape)
        d.set_weights([np.asarray(dense_p['kernel']),
                       np.asarray(dense_p['bias'])])
        ln = tf.keras.layers.LayerNormalization()
        ln.build((None, None, 16))
        ln.set_weights([np.asarray(ln_p['gamma']), np.asarray(ln_p['beta'])])
        out_tf = tf.nn.leaky_relu(ln(d(out_tf)))

    got = np.asarray(stack(params, x))
    np.testing.assert_allclose(got, out_tf.numpy(), rtol=1e-4, atol=1e-4)


def test_embedding_lookup():
    layer = nn.Embedding(10, 4)
    params = layer.init(jax.random.PRNGKey(3))
    ids = jnp.asarray([[1], [7]])
    out = layer(params, ids)
    assert out.shape == (2, 1, 4)
    np.testing.assert_allclose(np.asarray(out[0, 0]),
                               np.asarray(params['embeddings'][1]))


def test_split_to_dict():
    x = jnp.ones((2, 5, 10))
    d = nn.split_to_dict(x, (('a', 3), ('b', 7)))
    assert d['a'].shape == (2, 5, 3)
    assert d['b'].shape == (2, 5, 7)


def test_bf16_control_opt_in_close_to_fp32_and_off_by_default():
    """enable_bf16_control casts Dense/GRU matmuls to bf16 (fp32
    accumulate); default numerics stay bit-exact fp32 (golden-pinned)."""
    from ddsp_piano_tpu.nn import layers as L

    assert not L._BF16_MATMUL, "bf16 control must be OFF by default"
    dense = nn.Dense(8, 5)
    gru = nn.GRU(6, 5)
    dp = dense.init(jax.random.PRNGKey(0))
    gp = gru.init(jax.random.PRNGKey(1))
    x = np.random.RandomState(0).randn(2, 10, 5).astype(np.float32)

    ref_d = np.asarray(dense.apply(dp, x))
    ref_g = np.asarray(gru.apply(gp, x))
    try:
        L.enable_bf16_control(True)
        got_d = np.asarray(dense.apply(dp, x))
        got_g = np.asarray(gru.apply(gp, x))
    finally:
        L.enable_bf16_control(False)
    assert got_d.dtype == np.float32 and got_g.dtype == np.float32
    np.testing.assert_allclose(got_d, ref_d, atol=3e-2)
    np.testing.assert_allclose(got_g, ref_g, atol=3e-2)
    assert not np.array_equal(got_d, ref_d), "bf16 flag had no effect"
    # Flag restored: fp32 path is bit-identical again.
    np.testing.assert_array_equal(np.asarray(dense.apply(dp, x)), ref_d)
