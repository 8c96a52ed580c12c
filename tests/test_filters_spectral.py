"""Golden tests for FFT filtering ops and spectral ops against TF."""

import numpy as np
import pytest
import tensorflow as tf

import jax.numpy as jnp

from ddsp_piano_tpu.ops import core, filters, spectral

RNG = np.random.RandomState(1)


def test_overlap_and_add_matches_tf():
    for n_frames, frame_len, step in [(5, 8, 4), (3, 10, 10), (7, 12, 5),
                                      (4, 256, 96)]:
        frames = RNG.randn(2, n_frames, frame_len).astype(np.float32)
        want = tf.signal.overlap_and_add(frames, step).numpy()
        got = np.asarray(filters.overlap_and_add(jnp.asarray(frames), step))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fft_convolve_single_ir_matches_numpy():
    audio = RNG.randn(2, 400).astype(np.float32)
    ir = RNG.randn(2, 31).astype(np.float32)
    got = np.asarray(filters.fft_convolve(audio, ir, padding='same',
                                          delay_compensation=0))
    for b in range(2):
        full = np.convolve(audio[b], ir[b])
        np.testing.assert_allclose(got[b], full[:400], rtol=1e-3, atol=1e-4)


def test_fft_convolve_delay_compensation():
    audio = RNG.randn(1, 300).astype(np.float32)
    ir = np.zeros((1, 21), np.float32)
    ir[0, 10] = 1.0  # pure delay of 10 samples (center tap of 21)
    # delay_compensation=-1 -> start = (21-1)//2 - 1 = 9 -> one-sample delay.
    got = np.asarray(filters.fft_convolve(audio, ir, padding='same',
                                          delay_compensation=-1))[0]
    np.testing.assert_allclose(got[1:], audio[0, :-1], rtol=1e-3, atol=1e-4)


def test_fft_convolve_partitioned_matches_numpy():
    """Long single IRs take the uniformly-partitioned path (round 4):
    exact vs direct convolution, same crop semantics as the one-FFT path."""
    rng = np.random.RandomState(3)
    # Shapes straddling both partition-count regimes, incl. a broadcast IR
    # and a non-multiple-of-block audio length.
    for b, n, L, comp in [(2, 40000, 30000, 0), (1, 96001, 48000, -1),
                          (2, 33000, 5000, 0)]:
        audio = rng.randn(b, n).astype(np.float32)
        ir = rng.randn(1, L).astype(np.float32)
        assert filters.get_fft_size(n, L) >= filters._PARTITIONED_MIN_FFT
        got = np.asarray(filters.fft_convolve(
            jnp.asarray(audio), jnp.asarray(ir), padding='same',
            delay_compensation=comp))
        start = (L - 1) // 2 - 1 if comp < 0 else comp
        for i in range(b):
            want = np.convolve(audio[i].astype(np.float64),
                               ir[0].astype(np.float64))[start:start + n]
            scale = np.abs(want).max()
            np.testing.assert_allclose(got[i] / scale, want / scale,
                                       atol=2e-6)


def test_fft_convolve_partitioned_valid_padding():
    """padding='valid' regression (ADVICE r4): the overlap-add output can
    be shorter than the valid-crop window [start, start + n + ir - 1);
    the partitioned path must zero-pad up to it, matching the one-big-FFT
    path's length AND values exactly."""
    rng = np.random.RandomState(7)
    for b, n, L, comp in [(1, 40000, 30000, -1), (2, 40000, 30000, 0),
                          (1, 96001, 48000, -1)]:
        audio = rng.randn(b, n).astype(np.float32)
        ir = rng.randn(1, L).astype(np.float32)
        assert filters.get_fft_size(n, L) >= filters._PARTITIONED_MIN_FFT
        got = np.asarray(filters.fft_convolve(
            jnp.asarray(audio), jnp.asarray(ir), padding='valid',
            delay_compensation=comp))
        assert got.shape[-1] == n + L - 1
        start = (L - 1) // 2 - 1 if comp < 0 else comp
        for i in range(b):
            full = np.convolve(audio[i].astype(np.float64),
                               ir[0].astype(np.float64))
            # The crop window extends past the linear convolution; the
            # one-big-FFT reference is zero there.
            want = np.zeros(start + n + L - 1)
            want[:full.shape[0]] = full
            want = want[start:start + n + L - 1]
            scale = np.abs(want).max()
            np.testing.assert_allclose(got[i] / scale, want / scale,
                                       atol=2e-6)


def test_fft_convolve_partitioned_gradient_finite():
    import jax

    rng = np.random.RandomState(4)
    audio = jnp.asarray(rng.randn(1, 40000).astype(np.float32))
    ir = jnp.asarray(rng.randn(1, 30000).astype(np.float32) * 1e-2)

    def loss(ir):
        return jnp.sum(filters.fft_convolve(audio, ir, padding='same',
                                            delay_compensation=0) ** 2)

    g = jax.grad(loss)(ir)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0.0


def test_fft_convolve_time_varying_framewise():
    """Each audio block is convolved with its own IR then overlap-added."""
    n_frames, frame_size, ir_size = 4, 50, 11
    audio = RNG.randn(1, n_frames * frame_size).astype(np.float32)
    irs = RNG.randn(1, n_frames, ir_size).astype(np.float32)
    got = np.asarray(filters.fft_convolve(audio, irs, padding='same',
                                          delay_compensation=0))[0]
    want = np.zeros(n_frames * frame_size + ir_size - 1)
    for k in range(n_frames):
        block = audio[0, k * frame_size:(k + 1) * frame_size]
        want[k * frame_size:k * frame_size + frame_size + ir_size - 1] += (
            np.convolve(block, irs[0, k]))
    np.testing.assert_allclose(got, want[:n_frames * frame_size],
                               rtol=1e-3, atol=1e-4)


def test_apply_window_zero_phase_roundtrip():
    """Full-size window on an even-symmetric IR keeps symmetry and energy."""
    mags = np.abs(RNG.randn(2, 33)).astype(np.float32)
    ir = np.asarray(filters.frequency_impulse_response(mags))
    assert ir.shape == (2, 64)
    # The causal-form IR of a zero-phase filter should be (near) symmetric
    # around its center.
    mid = 32
    np.testing.assert_allclose(ir[:, mid - 10:mid], ir[:, mid + 10:mid:-1],
                               rtol=1e-2, atol=1e-3)


def test_frequency_filter_bandpass_behavior():
    """Low-pass magnitudes should kill a high-frequency tone."""
    sr = 16000
    t = np.arange(4000) / sr
    lo = np.sin(2 * np.pi * 200 * t).astype(np.float32)
    hi = np.sin(2 * np.pi * 6000 * t).astype(np.float32)
    audio = (lo + hi)[np.newaxis, :]
    n_bands = 65
    mags = np.zeros((1, 10, n_bands), np.float32)
    mags[:, :, :12] = 1.0  # pass below ~1.4 kHz
    out = np.asarray(filters.frequency_filter(audio, mags, window_size=257))
    spec_in = np.abs(np.fft.rfft(audio[0]))
    spec_out = np.abs(np.fft.rfft(out[0]))
    f = np.fft.rfftfreq(4000, 1 / sr)
    band = lambda s, f0: s[(f > f0 - 50) & (f < f0 + 50)].max()
    assert band(spec_out, 200) > 0.3 * band(spec_in, 200)
    assert band(spec_out, 6000) < 0.01 * band(spec_in, 6000)


@pytest.mark.parametrize("size", [64, 256, 2048])
def test_stft_matches_tf(size):
    audio = RNG.randn(2, 16000).astype(np.float32)
    hop = int(size * 0.25)
    want = tf.signal.stft(audio, frame_length=size, frame_step=hop,
                          fft_length=size, pad_end=True).numpy()
    got = np.asarray(spectral.stft(audio, frame_size=size, overlap=0.75,
                                   pad_end=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.abs(got), np.abs(want), rtol=1e-3,
                               atol=1e-3)


def test_multi_scale_spectral_loss_properties():
    a = RNG.randn(2, 8000).astype(np.float32)
    b = RNG.randn(2, 8000).astype(np.float32)
    zero = float(spectral.multi_scale_spectral_loss(a, a, logmag_weight=1.0))
    nonzero = float(spectral.multi_scale_spectral_loss(a, b,
                                                       logmag_weight=1.0))
    assert zero < 1e-5
    assert nonzero > 0.1


def test_loudness_shape_and_monotonicity():
    sr, fr = 16000, 250
    quiet = 0.01 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)
    loud = 0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)
    l_quiet = np.asarray(spectral.compute_loudness(
        quiet.astype(np.float32), sr, fr))
    l_loud = np.asarray(spectral.compute_loudness(
        loud.astype(np.float32), sr, fr))
    assert l_quiet.shape == l_loud.shape
    assert l_loud.mean() > l_quiet.mean() + 20  # ~34 dB apart


def test_frequency_filter_conv_matches_fft():
    """The single-convolution rewrite of the time-varying FIR is exact
    (linear in the magnitudes; every input sample weighted by ITS frame's
    magnitudes)."""
    import jax.numpy as jnp
    from ddsp_piano_tpu.ops import filters
    rng = np.random.RandomState(0)
    for (b, T, K, hop, ws) in [(2, 10, 33, 40, 257), (1, 25, 65, 96, 257),
                               (3, 8, 17, 32, 0), (2, 12, 65, 50, 63)]:
        audio = jnp.asarray(rng.randn(b, T * hop).astype(np.float32))
        mags = jnp.asarray(np.abs(rng.randn(b, T, K)).astype(np.float32))
        a = filters.frequency_filter(audio, mags, window_size=ws,
                                     method='fft')
        c = filters.frequency_filter(audio, mags, window_size=ws,
                                     method='conv')
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), atol=2e-5)


def test_linmap_min_fft_size_matches_pow2(monkeypatch):
    """The mm branch's minimal (conv_size) DFT is the same linear
    convolution as the pow2 one (round 4: 13 % faster on TPU); both env
    settings must agree to float reassociation."""
    from ddsp_piano_tpu.ops import filters

    rng = np.random.RandomState(1)
    audio = rng.randn(2, 4800).astype(np.float32)       # 50 frames x 96
    mags = rng.rand(2, 50, 96).astype(np.float32)
    monkeypatch.setenv('DDSP_PIANO_TPU_NOISE_FFT', 'min')
    lo = np.asarray(filters.frequency_filter(audio, mags, window_size=257,
                                             method='linmap'))
    monkeypatch.setenv('DDSP_PIANO_TPU_NOISE_FFT', 'pow2')
    hi = np.asarray(filters.frequency_filter(audio, mags, window_size=257,
                                             method='linmap'))
    np.testing.assert_allclose(lo, hi, atol=1e-5 * np.abs(hi).max())


def test_linmap_precision_env_knob(monkeypatch):
    """DDSP_PIANO_TPU_NOISE_PREC selects the linmap einsum pass count
    (round-4 measurement knob; default stays HIGHEST per ADVICE r2). On
    CPU all settings are exact — this pins resolution + loud failure."""
    import jax
    from ddsp_piano_tpu.ops import filters

    assert filters._linmap_precision() == jax.lax.Precision.HIGHEST
    monkeypatch.setenv('DDSP_PIANO_TPU_NOISE_PREC', 'high')
    assert filters._linmap_precision() == jax.lax.Precision.HIGH
    monkeypatch.setenv('DDSP_PIANO_TPU_NOISE_PREC', 'default')
    assert filters._linmap_precision() == jax.lax.Precision.DEFAULT

    rng = np.random.RandomState(2)
    audio = rng.randn(1, 960).astype(np.float32)
    mags = rng.rand(1, 10, 65).astype(np.float32)
    got = np.asarray(filters.frequency_filter(audio, mags, window_size=257,
                                              method='linmap'))
    monkeypatch.delenv('DDSP_PIANO_TPU_NOISE_PREC')
    want = np.asarray(filters.frequency_filter(audio, mags, window_size=257,
                                               method='linmap'))
    np.testing.assert_allclose(got, want, atol=1e-6)  # CPU: prec is moot

    monkeypatch.setenv('DDSP_PIANO_TPU_NOISE_PREC', 'bf16')
    with pytest.raises(ValueError, match='DDSP_PIANO_TPU_NOISE_PREC'):
        filters.frequency_filter(audio, mags, window_size=257,
                                 method='linmap')


def test_np_ir_basis_matches_traced_chain():
    """The numpy host-constant basis (round 4: closing over numpy beats
    in-trace jnp.fft constants by ~11 % on TPU) must match the jnp
    frequency_impulse_response chain it mirrors, including the
    window-truncation and the no-padding (window >= ir) branches."""
    from ddsp_piano_tpu.ops import filters

    for n_bands, window in [(96, 257), (65, 257), (65, 0), (33, 64),
                            (17, 1)]:
        got = filters._np_ir_basis(n_bands, window)
        want = np.asarray(filters.frequency_impulse_response(
            jnp.eye(n_bands, dtype=jnp.float32), window_size=window))
        assert got.shape == want.shape, (n_bands, window)
        np.testing.assert_allclose(got, want, atol=1e-6,
                                   err_msg=str((n_bands, window)))


def test_linmap_rejects_bad_noise_fft_env(monkeypatch):
    """An invalid DDSP_PIANO_TPU_NOISE_FFT must fail loudly at trace time,
    not silently take either transform size."""
    from ddsp_piano_tpu.ops import filters

    monkeypatch.setenv('DDSP_PIANO_TPU_NOISE_FFT', '512')
    audio = np.zeros((1, 960), np.float32)
    mags = np.ones((1, 10, 65), np.float32)
    with pytest.raises(ValueError, match='DDSP_PIANO_TPU_NOISE_FFT'):
        filters.frequency_filter(audio, mags, window_size=257,
                                 method='linmap')


def test_linmap_matches_fft_path_with_truncating_window():
    """window_size < 2*(n_bands-1) truncates the basis IRs; the linmap
    path must size fft/crop from the REALIZED IR length (regression:
    it once hardcoded 2*(n_bands-1) and time-shifted the output)."""
    from ddsp_piano_tpu.ops import filters

    rng = np.random.RandomState(0)
    audio = rng.randn(2, 3200).astype(np.float32)
    mags = rng.rand(2, 40, 160).astype(np.float32)   # ir 318 > window 257
    old = np.asarray(filters.frequency_filter(audio, mags, window_size=257,
                                              method='fft'))
    new = np.asarray(filters.frequency_filter(audio, mags, window_size=257,
                                              method='linmap'))
    np.testing.assert_allclose(new, old, atol=1e-5 * np.abs(old).max())


@pytest.mark.parametrize("size", [64, 256, 2048])
def test_compute_mag_mm_matches_fft(size):
    """Windowed-DFT-matmul magnitudes == rfft magnitudes (values + grads).

    The mm path is the MXU-friendly rewrite of the loss STFT
    (DDSP_PIANO_TPU_STFT=mm); it must stay exact up to f32 reassociation.
    """
    import jax
    audio = RNG.randn(2, 16000).astype(np.float32)
    ref = np.asarray(spectral.compute_mag(audio, size=size, method='fft'))
    got = np.asarray(spectral.compute_mag(audio, size=size, method='mm'))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)

    # Gradient parity through an L1-vs-target reduction (the loss shape).
    target = jnp.asarray(RNG.randn(*ref.shape).astype(np.float32))
    g_ref = jax.grad(lambda x: jnp.mean(jnp.abs(
        spectral.compute_mag(x, size=size, method='fft') - target)))(
            jnp.asarray(audio))
    g_mm = jax.grad(lambda x: jnp.mean(jnp.abs(
        spectral.compute_mag(x, size=size, method='mm') - target)))(
            jnp.asarray(audio))
    np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-5)
    assert np.all(np.isfinite(np.asarray(g_mm)))


def test_compute_mag_mm_finite_grad_at_silence():
    """jnp.abs(rfft) has a NaN gradient at zero magnitude; the mm path's
    epsilon-guarded hypot must stay finite on all-zero audio."""
    import jax
    silent = jnp.zeros((1, 4000), dtype=jnp.float32)
    g = jax.grad(lambda x: jnp.sum(
        spectral.compute_mag(x, size=128, method='mm')))(silent)
    assert np.all(np.isfinite(np.asarray(g)))


def test_mel_matrix_matches_tf_signal():
    """compute_mel's HTK filterbank == tf.signal.linear_to_mel_weight_matrix
    (the oracle used by the reference's ddsp.spectral_ops mel path)."""
    ours = np.asarray(spectral._linear_to_mel_matrix(
        64, 1025, 16000, 20.0, 8000.0))
    want = tf.signal.linear_to_mel_weight_matrix(
        64, 1025, 16000, 20.0, 8000.0).numpy()
    assert ours.shape == want.shape
    np.testing.assert_allclose(ours, want, atol=5e-5)


def test_compute_mel_applies_filterbank():
    """compute_mel == |STFT| @ mel matrix, and works across two traces
    (the matrix cache must not capture tracers)."""
    import jax
    audio = RNG.randn(1, 8000).astype(np.float32)
    got = np.asarray(jax.jit(
        lambda x: spectral.compute_mel(x, bins=32, fft_size=512))(
            jnp.asarray(audio)))
    mag = np.asarray(spectral.compute_mag(audio, size=512))
    mel = np.asarray(spectral._linear_to_mel_matrix(
        32, mag.shape[-1], 16000, 0.0, 8000.0))
    np.testing.assert_allclose(got, mag @ mel, rtol=1e-5, atol=1e-5)
    again = jax.jit(lambda x: spectral.compute_mel(
        x, bins=32, fft_size=512) * 2)(jnp.asarray(audio))
    np.testing.assert_allclose(np.asarray(again), 2 * got, rtol=1e-6)


def test_compute_mag_mm_basis_cache_survives_retrace():
    """Regression: _dft_mag_basis is lru_cached across traces. When its
    first call for a size happened INSIDE a jit trace, the cache used to
    capture that trace's tracers and leak them into every later trace of
    the same size (UnexpectedTracerError on the second jit). The cache
    must hold trace-independent (numpy) constants."""
    import jax
    size = 96  # unique to this test so the first call is inside jit
    audio = jnp.asarray(RNG.randn(1, 4000).astype(np.float32))
    first = jax.jit(
        lambda x: spectral.compute_mag(x, size=size, method='mm'))(audio)
    second = jax.jit(jax.grad(lambda x: jnp.sum(
        spectral.compute_mag(x, size=size, method='mm'))))(audio)
    assert np.all(np.isfinite(np.asarray(first)))
    assert np.all(np.isfinite(np.asarray(second)))


def test_compute_mag_rejects_bad_stft_env(monkeypatch):
    """An invalid DDSP_PIANO_TPU_STFT must fail loudly, not silently take
    the fft path (which would corrupt any A/B that believes it set mm)."""
    monkeypatch.setenv('DDSP_PIANO_TPU_STFT', 'matmul')
    audio = jnp.zeros((1, 1000), dtype=jnp.float32)
    with pytest.raises(ValueError, match='DDSP_PIANO_TPU_STFT'):
        spectral.compute_mag(audio, size=128)


def test_compute_mag_rejects_bad_method():
    """An explicit bogus method= must raise, not return fft magnitudes."""
    audio = jnp.zeros((1, 1000), dtype=jnp.float32)
    with pytest.raises(ValueError, match='method'):
        spectral.compute_mag(audio, size=128, method='bogus')


def test_compute_mag_mm_rejects_bad_precision_env(monkeypatch):
    """An invalid DDSP_PIANO_TPU_STFT_PREC must fail loudly at trace time,
    not KeyError deep inside the einsum."""
    monkeypatch.setenv('DDSP_PIANO_TPU_STFT_PREC', 'bf16')
    audio = jnp.zeros((1, 1000), dtype=jnp.float32)
    with pytest.raises(ValueError, match='DDSP_PIANO_TPU_STFT_PREC'):
        spectral.compute_mag(audio, size=128, method='mm')


def test_compute_mag_mm_under_vmap():
    """evaluate_model vmaps the per-segment loss; the mm path must map
    cleanly (plain einsums) and match the unmapped result."""
    import jax
    audio = RNG.randn(3, 8000).astype(np.float32)
    f = lambda x: spectral.compute_mag(x[None], size=256, method='mm')[0]
    got = np.asarray(jax.vmap(f)(jnp.asarray(audio)))
    want = np.asarray(spectral.compute_mag(audio, size=256, method='mm'))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
