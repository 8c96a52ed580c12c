"""Tests for processors: synth controls/signals and the DAG runtime."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddsp_piano_tpu.ops import core
from ddsp_piano_tpu import processors

RNG = np.random.RandomState(4)


def _mono_controls(b=2, t=20, k=16):
    return (RNG.randn(b, t, 1).astype(np.float32),           # amplitudes
            RNG.randn(b, t, k).astype(np.float32),           # harm dist
            np.abs(RNG.randn(b, t, 1)).astype(np.float32) * 1e-4,  # inharm
            np.full((b, t, 1), 220.0, np.float32))           # f0


class TestInHarmonic:
    def test_controls_normalized_and_gated(self):
        synth = processors.InHarmonic(frame_rate=250, sample_rate=16000)
        amps, dist, inharm, f0 = _mono_controls()
        controls = synth.get_controls({}, amps, dist, inharm, f0)
        s = np.asarray(controls['harmonic_distribution']).sum(-1)
        np.testing.assert_allclose(s, 1.0, atol=1e-4)
        # f0 below min_frequency kills amplitude.
        f0_low = np.full_like(f0, 10.0)
        c2 = synth.get_controls({}, amps, dist, inharm, f0_low)
        assert float(np.abs(np.asarray(c2['amplitudes'])).max()) == 0.0

    def test_signal_shape(self):
        synth = processors.InHarmonic(frame_rate=250, sample_rate=16000)
        amps, dist, inharm, f0 = _mono_controls()
        audio = synth({}, amps, dist, inharm, f0)
        assert audio.shape == (2, 20 * 64)

    def test_harmonic_peaks(self):
        """Synthesized spectrum peaks at inharmonic partial positions."""
        b, t = 1, 50
        synth = processors.InHarmonic(frame_rate=250, sample_rate=16000,
                                      scale_fn=None)
        amps = np.ones((b, t, 1), np.float32)
        dist = np.zeros((b, t, 4), np.float32)
        dist[..., 0] = 1.0
        inharm = np.zeros((b, t, 1), np.float32)
        f0 = np.full((b, t, 1), 500.0, np.float32)
        audio = np.asarray(synth({}, amps, dist, inharm, f0))[0]
        spec = np.abs(np.fft.rfft(audio))
        freqs = np.fft.rfftfreq(len(audio), 1 / 16000)
        assert abs(freqs[spec.argmax()] - 500.0) < 10.0


class TestMultiInharmonic:
    def test_substring_fold_matches_loop(self):
        """Batched substring render == summing per-substring renders."""
        b, t, k = 2, 16, 8
        multi = processors.MultiInharmonic(frame_rate=250, sample_rate=16000)
        single = processors.InHarmonic(frame_rate=250, sample_rate=16000)
        amps = RNG.randn(b, t, 1).astype(np.float32)
        dist = RNG.randn(b, t, k).astype(np.float32)
        inharm = np.full((b, t, 1), 1e-4, np.float32)
        f0 = np.stack([np.full((b, t), 220.0), np.full((b, t), 221.5)],
                      axis=-1).astype(np.float32)
        got = np.asarray(multi({}, amps, dist, inharm, f0))

        controls = single.get_controls({}, amps, dist, inharm, f0[..., 0:1])
        want = 0.0
        for i in range(2):
            want = want + np.asarray(single.get_signal(
                {}, controls['amplitudes'] / 2.0,
                controls['harmonic_distribution'],
                controls['harmonic_shifts'], f0[..., i:i + 1]))
        np.testing.assert_allclose(got, want, atol=2e-4)


class TestFilteredNoise:
    def test_dynamic_length(self):
        synth = processors.DynamicSizeFilteredNoise(frame_rate=250,
                                                    sample_rate=16000)
        mags = RNG.randn(2, 30, 65).astype(np.float32)
        audio = synth({}, mags, rng=jax.random.PRNGKey(0))
        assert audio.shape == (2, 30 * 64)

    def test_initial_bias_quietens(self):
        """Default initial_bias=-5 strongly attenuates zero-logit mags."""
        synth = processors.DynamicSizeFilteredNoise(frame_rate=250,
                                                    sample_rate=16000)
        mags = np.zeros((1, 30, 65), np.float32)
        c = synth.get_controls({}, mags)
        got = float(np.asarray(c['magnitudes']).mean())
        want = float(np.asarray(core.exp_sigmoid(-5.0)))
        assert abs(got - want) < 1e-6

    def test_rbg_rng_mode(self, monkeypatch):
        """DDSP_PIANO_TPU_NOISE_RNG=rbg must draw valid uniform(-1,1)
        noise (hardware-RNG path on TPU), deterministic per key, and the
        knob must reject unknown values at trace time."""
        monkeypatch.setenv('DDSP_PIANO_TPU_NOISE_RNG', 'rbg')
        synth = processors.DynamicSizeFilteredNoise(frame_rate=250,
                                                    sample_rate=16000)
        n1 = np.asarray(synth._noise(jax.random.PRNGKey(3), 4, 4096))
        n2 = np.asarray(synth._noise(jax.random.PRNGKey(3), 4, 4096))
        n3 = np.asarray(synth._noise(jax.random.PRNGKey(4), 4, 4096))
        np.testing.assert_array_equal(n1, n2)
        assert np.abs(n1 - n3).max() > 0.1          # key changes the stream
        assert n1.min() >= -1.0 and n1.max() <= 1.0
        assert abs(n1.mean()) < 0.05 and abs(n1.std() - 0.577) < 0.02

        monkeypatch.setenv('DDSP_PIANO_TPU_NOISE_RNG', 'philox')
        with pytest.raises(ValueError, match='DDSP_PIANO_TPU_NOISE_RNG'):
            synth._noise(jax.random.PRNGKey(0), 1, 64)


class TestReverb:
    def test_dry_masking_and_add_dry(self):
        rev = processors.Reverb(add_dry=True)
        audio = RNG.randn(1, 1000).astype(np.float32)
        ir = np.zeros((1, 100), np.float32)
        ir[0, 0] = 5.0   # dry tap - must be masked out
        out = np.asarray(rev({}, audio, ir))
        np.testing.assert_allclose(out, audio, atol=1e-4)

    def test_wet_tail(self):
        rev = processors.Reverb(add_dry=False)
        audio = np.zeros((1, 1000), np.float32)
        audio[0, 0] = 1.0
        ir = np.zeros((1, 200), np.float32)
        ir[0, 50] = 0.7
        out = np.asarray(rev({}, audio, ir))
        assert abs(out[0, 50] - 0.7) < 1e-4
        assert np.abs(out[0, :50]).max() < 1e-5


class TestFDN:
    def test_ir_synthesis_shape_and_decay(self):
        proc = processors.FeedbackDelayNetwork(trainable=True,
                                               sampling_rate=4000.0)
        params = proc.init(jax.random.PRNGKey(0))
        controls = proc.get_controls(params, audio_dry=jnp.zeros((1, 4000)))
        ir = np.asarray(controls['ir'])
        assert ir.shape == (8000,)
        assert np.isfinite(ir).all()
        # Energy decays over the tail.
        head = np.abs(ir[500:1500]).mean()
        tail = np.abs(ir[-1000:]).mean()
        assert tail < head

    def test_signal_is_convolution(self):
        proc = processors.FeedbackDelayNetwork(trainable=True,
                                               sampling_rate=2000.0)
        params = proc.init(jax.random.PRNGKey(1))
        audio = jnp.zeros((1, 2000)).at[0, 0].set(1.0)
        out = proc(params, audio)
        ir = proc.get_controls(params, audio_dry=audio)['ir']
        np.testing.assert_allclose(np.asarray(out)[0, :2000],
                                   np.asarray(ir)[:2000], atol=1e-3)


class TestProcessorGroup:
    def _build_dag(self):
        additive = processors.InHarmonic(frame_rate=250, sample_rate=16000,
                                         name='additive')
        noise = processors.DynamicSizeFilteredNoise(
            frame_rate=250, sample_rate=16000, name='noise')
        add = processors.MultiAdd(name='add')
        dag = [
            (additive, ['amplitudes_0', 'harmonic_distribution_0',
                        'inharm_coef_0', 'f0_hz_0']),
            (noise, ['magnitudes_0']),
            (add, ['noise/signal', 'additive/signal']),
            (additive, ['amplitudes_1', 'harmonic_distribution_1',
                        'inharm_coef_1', 'f0_hz_1']),
            (noise, ['magnitudes_1']),
            (add, ['add/signal', 'noise/signal', 'additive/signal']),
        ]
        return processors.ProcessorGroup(dag)

    def test_dag_routing_and_outputs(self):
        group = self._build_dag()
        b, t = 1, 10
        feats = {}
        for i in range(2):
            amps, dist, inharm, f0 = _mono_controls(b, t, 8)
            feats[f'amplitudes_{i}'] = jnp.asarray(amps)
            feats[f'harmonic_distribution_{i}'] = jnp.asarray(dist)
            feats[f'inharm_coef_{i}'] = jnp.asarray(inharm)
            feats[f'f0_hz_{i}'] = jnp.asarray(f0)
            feats[f'magnitudes_{i}'] = jnp.asarray(
                RNG.randn(b, t, 33).astype(np.float32))
        out = group({}, feats, rng=jax.random.PRNGKey(0))
        assert out['signal'].shape == (1, 640)
        assert 'add' in out['controls']
        assert out['controls']['add']['signal'].shape == (1, 640)
        # Inputs preserved in controls dict.
        assert 'amplitudes_0' in out['controls']

    def test_dag_jit(self):
        group = self._build_dag()
        b, t = 1, 10
        feats = {}
        for i in range(2):
            amps, dist, inharm, f0 = _mono_controls(b, t, 8)
            feats[f'amplitudes_{i}'] = jnp.asarray(amps)
            feats[f'harmonic_distribution_{i}'] = jnp.asarray(dist)
            feats[f'inharm_coef_{i}'] = jnp.asarray(inharm)
            feats[f'f0_hz_{i}'] = jnp.asarray(f0)
            feats[f'magnitudes_{i}'] = jnp.asarray(
                RNG.randn(b, t, 33).astype(np.float32))

        @jax.jit
        def run(feats):
            return group({}, feats, rng=jax.random.PRNGKey(0))['signal']

        out = run(feats)
        assert out.shape == (1, 640)


class TestSurrogate:
    def test_decay_envelope(self):
        """Constant decay < 1 yields decaying partial amplitude."""
        b, t = 1, 40
        synth = processors.SurrogateAdditive(frame_rate=250,
                                             sample_rate=16000,
                                             scale_fn=None)
        amps = np.ones((b, t, 1), np.float32)
        dist = np.ones((b, t, 1), np.float32)
        inharm = np.zeros((b, t, 1), np.float32)
        f0 = np.full((b, t, 1), 400.0, np.float32)
        decays = np.full((b, t, 1), 0.97, np.float32)
        decay_time = np.arange(t, dtype=np.float32).reshape(1, t, 1)
        audio = np.asarray(synth({}, amps, decays, decay_time, dist, inharm,
                                 f0))[0]
        head = np.abs(audio[:320]).max()
        tail = np.abs(audio[-320:]).max()
        assert tail < 0.1 * head


class TestNoiseBandNet:
    def test_forward_shape_and_band_structure(self):
        synth = processors.NoiseBandNetSynth(n_band=16, upsampling=64,
                                             sample_rate=16000,
                                             min_noise_len=2 ** 4)
        # FilterBank emits n_band//2-1 + n_band//2-1 bands + LP + HP + BP
        # edge filters; the amplitude input must match the band count.
        n_bands = synth.noise_bands.shape[-1]
        amps = jnp.asarray(RNG.rand(2, 50, n_bands).astype(np.float32))
        out = synth({}, amps, rng=jax.random.PRNGKey(0))
        assert out.shape == (2, 50 * 64)
        assert np.isfinite(np.asarray(out)).all()

    def test_matches_reference_chunk_loop(self):
        """The vectorized per-chunk resample equals a literal port of the
        reference's Python chunk loop (filtered_noise_synth.py:223-270),
        including the stretched remainder chunk and final truncation."""
        from ddsp_piano_tpu.ops import core as core_ops

        synth = processors.NoiseBandNetSynth(n_band=16, upsampling=64,
                                             sample_rate=16000,
                                             min_noise_len=2 ** 4)
        n_bands = synth.noise_bands.shape[-1]
        frame_len = synth.noise_len // synth.upsampling
        for n_frames in (frame_len * 3,          # exact chunks
                         frame_len * 3 + frame_len // 2 + 1,  # remainder
                         frame_len - 2):         # shorter than one chunk
            amps = jnp.asarray(
                RNG.rand(2, n_frames, n_bands).astype(np.float32))
            rng = jax.random.PRNGKey(3)
            # get_signal directly: __call__ first maps amplitudes through
            # get_controls' exp_sigmoid, which the loop below bypasses.
            got = np.asarray(synth.get_signal({}, amps, rng=rng))

            # Literal reference loop.
            shift = jax.random.randint(rng, (), 0,
                                       synth.noise_bands.shape[1])
            noise = np.asarray(jnp.roll(synth.noise_bands, shift, axis=1))
            n_samples = n_frames * synth.upsampling
            n_chunks = -(-n_frames // frame_len)
            if n_frames < frame_len:
                up = np.asarray(core_ops.resample(amps, n_samples))
                want = (noise[:, :n_samples] * up).sum(-1)
            else:
                segs = []
                for i in range(n_chunks):
                    chunk = amps[:, i * frame_len:(i + 1) * frame_len]
                    up = np.asarray(core_ops.resample(chunk,
                                                      synth.noise_len))
                    segs.append((noise[:, :up.shape[1]] * up).sum(-1))
                want = np.concatenate(segs, axis=1)[:, :n_samples]
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, atol=1e-5)

    def test_short_noise_loop_does_not_crash(self):
        """noise_len < upsampling (frame_len == 0) would divide-by-zero in
        the reference's chunk loop; here it loops the noise globally."""
        synth = processors.NoiseBandNetSynth(n_band=16, upsampling=64,
                                             sample_rate=16000,
                                             min_noise_len=2 ** 4)
        n_bands = synth.noise_bands.shape[-1]
        # Force a pathologically short noise loop.
        synth.noise_len = 32
        synth.noise_bands = synth.noise_bands[:, :32]
        amps = jnp.asarray(RNG.rand(1, 10, n_bands).astype(np.float32))
        out = synth.get_signal({}, amps, rng=jax.random.PRNGKey(0))
        assert out.shape == (1, 640)
        assert np.isfinite(np.asarray(out)).all()

    def test_filterbank_covers_spectrum(self):
        fb = processors.FilterBank(n_filters_linear=8, n_filters_log=8,
                                   sample_rate=16000)
        centers = fb.band_centers
        assert centers[0] < 30
        assert centers[-1] > 7000
        assert (np.diff(centers) > 0).all()


class TestLoudnessLoss:
    def test_loudness_loss_orders_levels(self):
        from ddsp_piano_tpu.models import losses as losses_lib
        sr = 16000
        t = np.arange(sr) / sr
        tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)[None]
        outputs_same = {'a': {'signal': jnp.asarray(tone)},
                        'b': {'signal': jnp.asarray(tone)}}
        outputs_diff = {'a': {'signal': jnp.asarray(tone)},
                        'b': {'signal': jnp.asarray(0.05 * tone)}}
        loss = losses_lib.LoudnessLoss('a', 'b', sample_rate=sr)
        same = float(loss.compute(outputs_same))
        diff = float(loss.compute(outputs_diff))
        assert same < 1e-4
        assert diff > 5.0  # ~26 dB level difference
