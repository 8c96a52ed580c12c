"""Streaming synthesis: chunked render with carried state vs one-shot."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddsp_piano_tpu import nn, processors
from ddsp_piano_tpu.models import (PianoModel, Parallelizer,
                                   VectorizedPolyphonicProcessorGroup)
from ddsp_piano_tpu.models import sub_modules as sm
from ddsp_piano_tpu.models.streaming import StreamingSynthesizer


def build_streamable_model(n_synths=4, sample_rate=16000, frame_rate=250,
                           silent_noise=True, duration=2.0):
    """dafx22-style model with per-timestep LayerNorm (exactly streamable)
    and optionally near-silent noise so additive-path comparisons are
    deterministic."""
    z_dim = 16
    context_in = n_synths * 2 + 4 + z_dim
    context_network = sm.ContextNetwork(
        layers=[nn.Dense(32, context_in, activation='leaky_relu'),
                nn.GRU(64, 32),
                nn.LayerNormalization(64)],
        out_features=64)
    monophonic_network = sm.MonophonicNetwork(
        layers=[nn.Dense(64, 35, activation='leaky_relu'),
                nn.GRU(96, 64),
                nn.LayerNormalization(96)],
        out_features=96,
        output_splits=(('amplitudes', 1),
                       ('harmonic_distribution', 16),
                       ('magnitudes', 17)))
    group = VectorizedPolyphonicProcessorGroup(
        additive=processors.MultiInharmonic(
            name='additive', frame_rate=frame_rate,
            sample_rate=sample_rate),
        noise=processors.DynamicSizeFilteredNoise(
            name='noise', frame_rate=frame_rate, sample_rate=sample_rate,
            initial_bias=-25.0 if silent_noise else -5.0),
        reverb=processors.Reverb(trainable=False),
        additive_controls=('amplitudes', 'harmonic_distribution',
                           'inharm_coef', 'f0_hz'),
        noise_controls=('magnitudes',),
        reverb_controls=('reverb_ir',),
        n_synths=n_synths)
    return PianoModel(
        z_encoder=sm.OneHotZEncoder(n_instruments=4, z_dim=z_dim,
                                    duration=duration,
                                    frame_rate=frame_rate),
        note_release=sm.NoteRelease(frame_rate=frame_rate),
        context_network=context_network,
        parallelizer=Parallelizer(n_synths=n_synths),
        monophonic_network=monophonic_network,
        inharm_model=sm.InharmonicityNetwork(),
        detuner=sm.Detuner(n_substrings=2, use_detune=True),
        reverb_model=sm.MultiInstrumentReverb(
            n_instruments=4, reverb_duration=0.25,
            sample_rate=sample_rate),
        processor_group=group)


def _features(n_frames=500, n_synths=4):
    cond = np.zeros((1, n_frames, n_synths, 2), np.float32)
    # A note crossing chunk boundaries + a short note inside chunk 2.
    cond[:, 20:n_frames - 120, 0, 0] = 60.0
    cond[:, 20:28, 0, 1] = 0.8
    cond[:, 300:340, 1, 0] = 67.0
    cond[:, 300:308, 1, 1] = 0.6
    return {
        'conditioning': jnp.asarray(cond),
        'pedal': jnp.zeros((1, n_frames, 4)),
        'piano_model': jnp.zeros((1, 1), jnp.int32),
    }


class TestStreaming:
    @pytest.fixture(scope='class')
    def setup(self):
        model = build_streamable_model()
        params = model.init(jax.random.PRNGKey(0))
        feats = _features()
        return model, params, feats

    def test_streamed_matches_one_shot(self, setup):
        model, params, feats = setup
        one_shot = np.asarray(jax.jit(
            lambda p, f: model(p, f, rng=jax.random.PRNGKey(0))
        )(params, feats)['audio_synth'])

        streamer = StreamingSynthesizer(model, chunk_frames=125)
        streamed = streamer.synthesize(params, feats,
                                       rng=jax.random.PRNGKey(0))
        assert streamed.shape == one_shot.shape
        # Additive path is deterministic; noise is near-silent; the final
        # flushed frame is approximated -> compare all but the last frame.
        up = one_shot.shape[-1] // feats['conditioning'].shape[1]
        a, b = one_shot[:, :-up], streamed[:, :-up]
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=0.02 * scale)
        # Strong sample-level agreement.
        corr = np.corrcoef(a[0], b[0])[0, 1]
        assert corr > 0.999

    def test_note_release_carries_across_chunks(self, setup):
        """A note ending mid-chunk keeps ringing into the next chunk
        (release state carried)."""
        model, params, feats = setup
        streamer = StreamingSynthesizer(model, chunk_frames=125)
        streamed = streamer.synthesize(params, feats,
                                       rng=jax.random.PRNGKey(0))
        sr = model.sample_rate
        # The long note ends at frame 380 (1.52 s); release extends ~1.1 s.
        post_release = streamed[0, int(1.6 * sr):int(1.9 * sr)]
        assert np.abs(post_release).max() > 1e-3

    def test_chunk_count_invariance(self, setup):
        """Different chunk sizes give the same audio."""
        model, params, feats = setup
        s1 = StreamingSynthesizer(model, chunk_frames=125).synthesize(
            params, feats, rng=jax.random.PRNGKey(0))
        s2 = StreamingSynthesizer(model, chunk_frames=250).synthesize(
            params, feats, rng=jax.random.PRNGKey(0))
        up = s1.shape[-1] // feats['conditioning'].shape[1]
        scale = max(np.abs(s1).max(), 1e-6)
        np.testing.assert_allclose(s1[:, :-up], s2[:, :-up],
                                   atol=0.02 * scale)

    def test_scanned_matches_python_loop(self, setup):
        """Device-resident lax.scan driver == python-loop driver."""
        model, params, feats = setup
        streamer = StreamingSynthesizer(model, chunk_frames=125)
        looped = streamer.synthesize(params, feats,
                                     rng=jax.random.PRNGKey(0))
        scanned = streamer.synthesize_scanned(params, feats,
                                              rng=jax.random.PRNGKey(0))
        assert scanned.shape == looped.shape
        scale = max(np.abs(looped).max(), 1e-6)
        # Same carried-state math; rng folding differs per chunk for the
        # (near-silent) noise, so allow a small absolute budget.
        np.testing.assert_allclose(scanned, looped, atol=0.02 * scale)

    def test_scanned_handles_multiple_lengths(self, setup):
        """One streamer renders files of different lengths correctly (the
        compiled scan must be cached per chunk count, not once)."""
        model, params, feats = setup
        streamer = StreamingSynthesizer(model, chunk_frames=125)
        long = streamer.synthesize_scanned(params, feats,
                                           rng=jax.random.PRNGKey(0))
        short_feats = {
            'conditioning': feats['conditioning'][:, :250],
            'pedal': feats['pedal'][:, :250],
            'piano_model': feats['piano_model'],
        }
        short = streamer.synthesize_scanned(params, short_feats,
                                            rng=jax.random.PRNGKey(0))
        up = long.shape[-1] // feats['conditioning'].shape[1]
        assert short.shape == (1, 250 * up)
        # Prefixes agree except near the short render's flushed tail.
        scale = max(np.abs(long).max(), 1e-6)
        np.testing.assert_allclose(short[:, :-up], long[:, :249 * up],
                                   atol=0.02 * scale)


class TestServing:
    def test_one_jit_serving_graph(self):
        """Raw pianoroll -> audio fully on device == host-allocated path."""
        from ddsp_piano_tpu.data.midi_encoders import MIDIRoll2Conditioning
        from ddsp_piano_tpu.models.serving import make_serving_fn

        model = build_streamable_model(duration=1.0)
        params = model.init(jax.random.PRNGKey(0))
        serve = make_serving_fn(model, params)

        roll = np.zeros((1, 250, 88, 2), np.float32)
        roll[0, 30:180, 60 - 21, 0] = 1.0
        roll[0, 30:38, 60 - 21, 1] = 0.7
        roll[0, 90:200, 67 - 21, 0] = 1.0
        roll[0, 90:98, 67 - 21, 1] = 0.6
        pedal = np.zeros((1, 250, 4), np.float32)
        piano = np.zeros((1, 1), np.int32)

        audio = np.asarray(serve(jnp.asarray(roll), jnp.asarray(pedal),
                                 jnp.asarray(piano)))
        assert audio.shape == (1, 16000)
        assert np.isfinite(audio).all()

        # Same result through the host allocator path.
        cond, _ = MIDIRoll2Conditioning(4)(roll[0].copy())
        feats = {'conditioning': jnp.asarray(cond[None]),
                 'pedal': jnp.asarray(pedal),
                 'piano_model': jnp.asarray(piano)}
        want = np.asarray(jax.jit(
            lambda p, f: model(p, f, rng=jax.random.PRNGKey(0))
        )(params, feats)['audio_synth'])
        np.testing.assert_allclose(audio, want, atol=1e-4)


def build_film_streamable_model(n_synths=4, sample_rate=16000,
                                frame_rate=250):
    """v2-style model (FiLM context + deep mono net, per-step LayerNorm)
    — streams exactly."""
    group = VectorizedPolyphonicProcessorGroup(
        additive=processors.MultiInharmonic(
            name='additive', frame_rate=frame_rate, sample_rate=sample_rate),
        noise=processors.DynamicSizeFilteredNoise(
            name='noise', frame_rate=frame_rate, sample_rate=sample_rate,
            initial_bias=-25.0),
        reverb=processors.Reverb(trainable=False),
        additive_controls=('amplitudes', 'harmonic_distribution',
                           'inharm_coef', 'f0_hz'),
        noise_controls=('magnitudes',),
        reverb_controls=('reverb_ir',),
        n_synths=n_synths)
    return PianoModel(
        note_release=sm.NoteRelease(frame_rate=frame_rate),
        context_network=sm.FiLMContextNetwork(n_instruments=4,
                                              n_synths=n_synths,
                                              layer_dim=32, context_dim=16),
        parallelizer=Parallelizer(
            n_synths=n_synths,
            global_keys=('conditioning', 'context', 'piano_model')),
        monophonic_network=sm.MonophonicDeepNetwork(
            rnn_channels=48, ch=24, layers_per_stack=2, context_dim=16,
            output_splits=(('amplitudes', 1),
                           ('harmonic_distribution', 12),
                           ('magnitudes', 13))),
        inharm_model=sm.JointParametricInharmTuning(
            n_instruments=4,
            pretrained_weights={
                k: v[:4] for k, v in __import__(
                    'ddsp_piano_tpu.configs.maestro_v2',
                    fromlist=['V2_TUNING_WEIGHTS']
                ).V2_TUNING_WEIGHTS.items()}),
        reverb_model=sm.MultiInstrumentReverb(n_instruments=4,
                                              reverb_duration=0.25,
                                              sample_rate=sample_rate),
        processor_group=group)


class TestFilmStreaming:
    def test_v2_style_streams_exactly(self):
        model = build_film_streamable_model()
        params = model.init(jax.random.PRNGKey(3))
        feats = _features()
        one_shot = np.asarray(jax.jit(
            lambda p, f: model(p, f, rng=jax.random.PRNGKey(0))
        )(params, feats)['audio_synth'])
        streamer = StreamingSynthesizer(model, chunk_frames=125)
        streamed = streamer.synthesize(params, feats,
                                       rng=jax.random.PRNGKey(0))
        up = one_shot.shape[-1] // feats['conditioning'].shape[1]
        a, b = one_shot[:, :-up], streamed[:, :-up]
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=0.02 * scale)
        assert np.corrcoef(a[0], b[0])[0, 1] > 0.999


class TestFdnStreaming:
    def test_trainable_fdn_reverb_streams(self):
        """ENSTDkCl-style standalone FDN reverb in the streaming engine:
        the 2*sr-long IR (longer than a chunk) carries across chunks."""
        sr, fr, n = 4000, 250, 2
        group = VectorizedPolyphonicProcessorGroup(
            additive=processors.MultiInharmonic(
                name='additive', frame_rate=fr, sample_rate=sr),
            noise=processors.DynamicSizeFilteredNoise(
                name='noise', frame_rate=fr, sample_rate=sr,
                initial_bias=-25.0),
            reverb=processors.FeedbackDelayNetwork(
                trainable=True, delay_lines=4, sampling_rate=sr),
            additive_controls=('amplitudes', 'harmonic_distribution',
                               'inharm_coef', 'f0_hz'),
            noise_controls=('magnitudes',),
            reverb_controls=(),
            n_synths=n)
        model = PianoModel(
            note_release=sm.NoteRelease(frame_rate=fr),
            context_network=sm.SimpleContextNet(
                layers=[nn.Dense(16, 4, activation='leaky_relu'),
                        nn.GRU(16, 16)],
                out_features=16, output_splits=(('context', 8),)),
            parallelizer=Parallelizer(
                n_synths=n, global_keys=('conditioning', 'context')),
            monophonic_network=sm.MonophonicNetwork(
                layers=[nn.Dense(24, 11, activation='leaky_relu'),
                        nn.GRU(24, 24)],
                out_features=24,
                output_splits=(('amplitudes', 1),
                               ('harmonic_distribution', 6),
                               ('magnitudes', 7))),
            inharm_model=sm.ParametricTuning(),
            processor_group=group)
        params = model.init(jax.random.PRNGKey(0))
        cond = np.zeros((1, 500, n, 2), np.float32)
        cond[:, 20:300, 0, 0] = 60.0
        cond[:, 20:28, 0, 1] = 0.8
        feats = {'conditioning': jnp.asarray(cond),
                 'pedal': jnp.zeros((1, 500, 4)),
                 'piano_model': jnp.zeros((1, 1), jnp.int32)}
        one_shot = np.asarray(jax.jit(
            lambda p, f: model(p, f, rng=jax.random.PRNGKey(0))
        )(params, feats)['audio_synth'])
        streamer = StreamingSynthesizer(model, chunk_frames=125)
        streamed = streamer.synthesize(params, feats,
                                       rng=jax.random.PRNGKey(0))
        up = one_shot.shape[-1] // 500
        a, b = one_shot[:, :-up], streamed[:, :-up]
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=0.03 * scale)


DAFX22_CKPT = '/root/reference/ddsp_piano/model_weights/dafx22'


@pytest.mark.skipif(not __import__('os').path.isdir(DAFX22_CKPT),
                    reason="released checkpoint not mounted")
def test_dafx22_released_weights_exact_normalize_streaming():
    """Streamed dafx22 (whole-sequence Normalize stats via the stats
    sweeps) matches the one-shot render with the RELEASED weights.

    Measured at round 2 introduction: exact mode max waveform error
    ~5e-4 of peak (multi-scale spectral distance 0.009); the per-chunk
    approximation (exact_normalize=False) was off by 23 % of peak
    (spectral 1.5) — which is why exact statistics are the default.
    """
    from ddsp_piano_tpu.configs import get_model
    from ddsp_piano_tpu.ops import spectral
    from ddsp_piano_tpu.training import checkpoints

    T, C = 750, 250
    model = get_model('dafx22', duration=T / 250.0, inference=True)
    params = model.init(jax.random.PRNGKey(0))
    params, _ = checkpoints.import_tf_weights(model, params, DAFX22_CKPT)
    # Silence the noise so waveforms compare sample by sample (one-shot
    # and streaming draw different noise realizations by design).
    model.processor_group.noise._noise = (
        lambda rng, b, n: jnp.zeros((b, n), jnp.float32))

    cond = np.zeros((1, T, 16, 2), np.float32)
    for v, (p, s, e) in enumerate([(48, 10, 500), (60, 10, 400),
                                   (64, 120, 600), (67, 260, 740),
                                   (72, 400, 740)]):
        cond[:, s:e, v, 0] = p
        cond[:, s:s + 8, v, 1] = 0.7
    feats = {'conditioning': jnp.asarray(cond),
             'pedal': jnp.zeros((1, T, 4), jnp.float32),
             'piano_model': jnp.asarray([[2]], np.int32)}

    one = np.asarray(
        jax.jit(lambda p, f: model(p, f)['audio_synth'])(params, feats))
    streamer = StreamingSynthesizer(model, chunk_frames=C,
                                    exact_normalize=True)
    assert streamer._norm_slots == [('context', 2), ('mono', 3)]
    out = np.asarray(streamer.synthesize_scanned(params, feats))

    assert out.shape == one.shape
    rel = np.abs(out - one).max() / np.abs(one).max()
    assert rel < 2e-3, f"exact-normalize streaming drifts: rel={rel}"
    sl = float(spectral.multi_scale_spectral_loss(one, out,
                                                  logmag_weight=1.0))
    assert sl < 0.05, f"spectral distance {sl}"


def test_streaming_dry_stem_matches_one_shot():
    """--unreverbed parity: the streamed dry mix equals the one-shot
    outputs['add']['signal'] (reference synthesize_midi_file.py:76-88
    always exposes the dry stem)."""
    model = build_streamable_model()
    params = model.init(jax.random.PRNGKey(0))
    feats = _features()
    outs = jax.jit(lambda p, f: model(p, f, rng=jax.random.PRNGKey(0)))(
        params, feats)
    one_dry = np.asarray(outs['add']['signal'])

    streamer = StreamingSynthesizer(model, chunk_frames=125)
    audio, dry = streamer.synthesize_scanned(params, feats,
                                             rng=jax.random.PRNGKey(0),
                                             return_dry=True)
    dry = np.asarray(dry)
    assert dry.shape == one_dry.shape
    up = one_dry.shape[-1] // feats['conditioning'].shape[1]
    scale = np.abs(one_dry).max()
    assert np.abs(dry[:, :-up] - one_dry[:, :-up]).max() < 2e-3 * scale


def test_surrogate_streaming_matches_one_shot():
    """Surrogate-model streaming: decay-envelope synthesis with the
    frames-since-onset counter carried across chunks."""
    from ddsp_piano_tpu.configs import get_model

    T = 500
    model = get_model('surrogate', duration=T / 250.0, inference=True,
                      n_synths=4, n_harmonics=16, n_noise_bands=17)
    params = model.init(jax.random.PRNGKey(3))
    # Near-silent noise: exp_tanh has no initial_bias knob, so damp the
    # noise draw itself for a deterministic comparison.
    model.processor_group.noise._noise = (
        lambda rng, b, n: jnp.zeros((b, n), jnp.float32))
    feats = _features(n_frames=T)

    one = np.asarray(jax.jit(
        lambda p, f: model(p, f, rng=jax.random.PRNGKey(0)))(
        params, feats)['audio_synth'])
    streamer = StreamingSynthesizer(model, chunk_frames=125)
    assert ('mono', 1) in streamer._norm_slots  # mid-sequence Normalize
    streamed = np.asarray(streamer.synthesize_scanned(
        params, feats, rng=jax.random.PRNGKey(0)))

    assert streamed.shape == one.shape
    up = one.shape[-1] // T
    scale = np.abs(one).max()
    assert scale > 1e-6
    assert np.abs(streamed[:, :-up] - one[:, :-up]).max() < 5e-3 * scale
