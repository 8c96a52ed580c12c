"""Golden-value tests for L0 core ops against TensorFlow references.

The reference implementation delegates these ops to TF kernels (via
ddsp==3.7.0); here each JAX op is validated against the equivalent TF
composition so released-checkpoint numerics carry over.
"""

import numpy as np
import pytest
import tensorflow as tf

import jax
import jax.numpy as jnp

from ddsp_piano_tpu.ops import core


RNG = np.random.RandomState(0)


def test_midi_to_hz_golden():
    notes = np.array([21.0, 60.0, 69.0, 108.0, 69.5], np.float32)
    got = core.midi_to_hz(notes)
    want = 440.0 * 2.0 ** ((notes - 69.0) / 12.0)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    assert abs(float(core.midi_to_hz(69.0)) - 440.0) < 1e-3


def test_hz_to_midi_roundtrip():
    notes = np.linspace(21, 108, 50).astype(np.float32)
    np.testing.assert_allclose(core.hz_to_midi(core.midi_to_hz(notes)), notes,
                               rtol=1e-4, atol=5e-3)


def test_exp_sigmoid_golden_tf():
    x = RNG.randn(4, 7).astype(np.float32) * 3
    want = 2.0 * tf.math.sigmoid(x) ** np.log(10.0) + 1e-7
    np.testing.assert_allclose(core.exp_sigmoid(x), want.numpy(),
                               rtol=1e-5, atol=1e-7)


def test_exp_tanh_golden_tf():
    x = RNG.randn(4, 7).astype(np.float32) * 3
    want = 2.0 * (0.5 * (tf.math.tanh(x) + 1.0)) ** np.log(10.0) + 1e-7
    np.testing.assert_allclose(core.exp_tanh(x), want.numpy(),
                               rtol=1e-5, atol=1e-7)


def test_safe_divide():
    num = np.array([1.0, 2.0, 3.0], np.float32)
    den = np.array([2.0, 0.0, -1.5], np.float32)
    got = core.safe_divide(num, den)
    np.testing.assert_allclose(got, [0.5, 2.0 / 1e-7, -2.0], rtol=1e-5)


def test_remove_above_nyquist():
    freqs = np.array([[[100.0, 7999.0, 8000.0, 9000.0]]], np.float32)
    amps = np.ones_like(freqs)
    got = core.remove_above_nyquist(freqs, amps, 16000)
    np.testing.assert_array_equal(got[0, 0], [1.0, 1.0, 0.0, 0.0])


def test_get_inharmonic_freq():
    f0 = np.full((2, 3, 1), 100.0, np.float32)
    b_coef = np.full((2, 3, 1), 1e-3, np.float32)
    freqs, shifts = core.get_inharmonic_freq(f0, b_coef, 8)
    k = np.arange(1, 9, dtype=np.float32)
    factor = np.sqrt(1 + 1e-3 * k ** 2)
    np.testing.assert_allclose(freqs[0, 0], 100.0 * k * factor, rtol=1e-5)
    np.testing.assert_allclose(shifts[0, 0], factor - 1.0, rtol=1e-5)


def test_hann_window_matches_tf():
    for n in [16, 63, 128, 257]:
        np.testing.assert_allclose(
            core.hann_window(n, periodic=True),
            tf.signal.hann_window(n).numpy(), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("n_in,n_out", [(10, 40), (750, 48000), (7, 21),
                                        (5, 9)])
def test_linear_resample_matches_tf_v1_bilinear(n_in, n_out):
    x = RNG.randn(2, n_in, 3).astype(np.float32)
    want = tf.compat.v1.image.resize(
        x[:, :, np.newaxis, :], [n_out, 1],
        method=tf.image.ResizeMethod.BILINEAR,
        align_corners=False).numpy()[:, :, 0, :]
    got = core.resample(x, n_out, method='linear')
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_nearest_resample_matches_tf_v1():
    x = RNG.randn(2, 10, 3).astype(np.float32)
    want = tf.compat.v1.image.resize(
        x[:, :, np.newaxis, :], [25, 1],
        method=tf.image.ResizeMethod.NEAREST_NEIGHBOR,
        align_corners=False).numpy()[:, :, 0, :]
    got = core.resample(x, 25, method='nearest')
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("n_frames,n_out", [(10, 40), (750, 48000), (3, 96)])
def test_window_resample_matches_tf_overlap_add(n_frames, n_out):
    """'window' method vs an explicit tf.signal.overlap_and_add pipeline."""
    x = RNG.rand(2, n_frames, 4).astype(np.float32)
    # TF reference: append endpoint, window with periodic hann of 2*hop,
    # overlap-add with hop, trim one hop each side.
    xe = np.concatenate([x, x[:, -1:, :]], axis=1)
    hop = n_out // n_frames
    window = tf.signal.hann_window(2 * hop)
    xt = tf.transpose(xe, [0, 2, 1])[:, :, :, tf.newaxis]
    x_windowed = xt * window[tf.newaxis, tf.newaxis, tf.newaxis, :]
    ola = tf.signal.overlap_and_add(x_windowed, hop)
    want = tf.transpose(ola, [0, 2, 1])[:, hop:-hop, :].numpy()
    got = core.resample(x, n_out, method='window')
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_resample_rank_polymorphism():
    x1 = RNG.randn(10).astype(np.float32)
    x2 = RNG.randn(2, 10).astype(np.float32)
    assert core.resample(x1, 20).shape == (20,)
    assert core.resample(x2, 20).shape == (2, 20)


def test_angular_cumsum_matches_plain_mod():
    omega = RNG.rand(2, 2500, 3).astype(np.float32) * 0.5
    got = core.angular_cumsum(omega, chunk_size=1000)
    want = np.cumsum(omega.astype(np.float64), axis=1) % (2 * np.pi)
    # Compare on the circle (angles may differ by ~0 vs ~2pi wrap).
    err = np.abs(np.exp(1j * np.asarray(got, np.float64)) - np.exp(1j * want))
    assert err.max() < 1e-3
    assert float(jnp.max(got)) < 2 * np.pi + 1e-5
    assert float(jnp.min(got)) >= 0.0


def test_pad_or_trim():
    v = np.ones((3, 10), np.float32)
    assert core.pad_or_trim_to_expected_length(v, 8).shape == (3, 8)
    out = core.pad_or_trim_to_expected_length(v, 13)
    assert out.shape == (3, 13)
    np.testing.assert_array_equal(np.asarray(out)[:, 10:], 0.0)
    with pytest.raises(ValueError):
        core.pad_or_trim_to_expected_length(v, 100)


def test_ops_jittable_and_differentiable():
    x = jnp.asarray(RNG.randn(2, 10, 3).astype(np.float32))

    @jax.jit
    def fn(x):
        y = core.resample(x, 40, method='window')
        return jnp.sum(core.exp_sigmoid(y))

    g = jax.grad(lambda x: fn(x))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_resample_rank4():
    x = RNG.randn(2, 5, 3, 2).astype(np.float32)
    out = core.resample(x, 20)
    assert out.shape == (2, 20, 3, 2)
    # Equivalent to resampling the flattened channel dims.
    flat = core.resample(x.reshape(2, 5, 6), 20)
    np.testing.assert_allclose(np.asarray(out).reshape(2, 20, 6),
                               np.asarray(flat), rtol=1e-6)


def test_exp_sigmoid_extreme_inputs_finite():
    x = np.array([-1e4, -100.0, 0.0, 100.0, 1e4], np.float32)
    y = np.asarray(core.exp_sigmoid(x))
    assert np.isfinite(y).all()
    assert y[0] >= 1e-7 and abs(y[-1] - 2.0) < 1e-4


def test_angular_cumsum_short_sequence_no_pad_needed():
    omega = RNG.rand(1, 7, 2).astype(np.float32)
    out = core.angular_cumsum(omega, chunk_size=1000)
    want = np.cumsum(omega, axis=1) % (2 * np.pi)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)
