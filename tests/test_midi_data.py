"""Tests for the MIDI parser, sustain semantics, pianoroll, voice
allocator and audio I/O."""

import os

import numpy as np
import pytest

from ddsp_piano_tpu.data import audio_io, io as data_io, midi
from ddsp_piano_tpu.data.midi_encoders import MIDIRoll2Conditioning


def _simple_sequence():
    notes = [
        midi.Note(pitch=60, velocity=80, start_time=0.0, end_time=1.0),
        midi.Note(pitch=64, velocity=100, start_time=0.5, end_time=1.5),
        midi.Note(pitch=67, velocity=60, start_time=2.0, end_time=2.5),
    ]
    ccs = [midi.ControlChange(time=0.25, control=64, value=100),
           midi.ControlChange(time=1.75, control=64, value=0)]
    return notes, ccs


class TestMidiRoundTrip:
    def test_write_parse_roundtrip(self, tmp_path):
        notes, ccs = _simple_sequence()
        path = str(tmp_path / "test.mid")
        midi.write_midi(path, notes, ccs)
        seq = midi.parse_midi(path)
        assert len(seq.notes) == 3
        got = sorted(seq.notes, key=lambda n: (n.start_time, n.pitch))
        for want, have in zip(notes, got):
            assert have.pitch == want.pitch
            assert have.velocity == want.velocity
            assert abs(have.start_time - want.start_time) < 2e-3
            assert abs(have.end_time - want.end_time) < 2e-3
        sustains = [c for c in seq.control_changes if c.control == 64]
        assert len(sustains) == 2

    def test_tempo_change(self, tmp_path):
        """Tempo events change the tick->seconds mapping."""
        path = str(tmp_path / "tempo.mid")
        midi.write_midi(path, [midi.Note(60, 64, 1.0, 2.0)],
                        tempo_us_per_quarter=250000)  # 240 bpm
        seq = midi.parse_midi(path)
        assert abs(seq.notes[0].start_time - 1.0) < 2e-3
        assert abs(seq.notes[0].end_time - 2.0) < 2e-3


class TestSustain:
    def test_pedal_extends_notes(self):
        notes, ccs = _simple_sequence()
        seq = midi.MidiSequence(notes=notes, control_changes=ccs,
                               total_time=2.5)
        out = midi.apply_sustain_control_changes(seq)
        by_pitch = {n.pitch: n for n in out.notes}
        # Notes released while pedal down extend to pedal-up (1.75 s).
        assert abs(by_pitch[60].end_time - 1.75) < 1e-9
        assert abs(by_pitch[64].end_time - 1.75) < 1e-9
        # Note entirely after pedal-up is untouched.
        assert abs(by_pitch[67].end_time - 2.5) < 1e-9

    def test_restrike_truncates_sustained_note(self):
        notes = [midi.Note(60, 80, 0.0, 0.5),
                 midi.Note(60, 90, 1.0, 1.2)]
        ccs = [midi.ControlChange(0.1, 64, 127),
               midi.ControlChange(2.0, 64, 0)]
        seq = midi.MidiSequence(notes, ccs, 2.0)
        out = midi.apply_sustain_control_changes(seq)
        first = min(out.notes, key=lambda n: n.start_time)
        second = max(out.notes, key=lambda n: n.start_time)
        assert abs(first.end_time - 1.0) < 1e-9   # cut at re-strike
        assert abs(second.end_time - 2.0) < 1e-9  # sustained to pedal-up


class TestPianoroll:
    def test_active_and_onset(self):
        seq = midi.MidiSequence(
            [midi.Note(60, 127, 0.1, 0.5)], [], 0.5)
        roll = midi.sequence_to_pianoroll(seq, 250)
        p = 60 - 21
        assert roll.active[30, p] == 1.0   # 0.12 s
        assert roll.active[124, p] == 1.0  # just before 0.5 s
        assert roll.active[125, p] == 0.0
        assert roll.onset_velocities[25, p] == 1.0
        # Onset window is 32 ms -> inactive by 0.2 s.
        assert roll.onset_velocities[50, p] == 0.0

    def test_control_change_forward_fill(self):
        seq = midi.MidiSequence(
            [midi.Note(60, 64, 0.0, 1.0)],
            [midi.ControlChange(0.2, 64, 100),
             midi.ControlChange(0.6, 64, 0)], 1.0)
        roll = midi.sequence_to_pianoroll(seq, 250)
        assert roll.control_changes[49, 64] == 0
        assert roll.control_changes[51, 64] == 100
        assert roll.control_changes[151, 64] == 0


class TestVoiceAllocator:
    def _roll(self, frames):
        """Build (n_frames, 88, 2) roll from {frame: [(pitch, vel)]}."""
        n = max(frames) + 1
        roll = np.zeros((n, 88, 2), np.float32)
        for f, notes in frames.items():
            for pitch, vel in notes:
                roll[f, pitch - 21, 0] = 1.0
                roll[f, pitch - 21, 1] = vel
        return roll

    def test_sustained_notes_keep_channels(self):
        frames = {t: [(60, 0.5)] for t in range(10)}
        for t in range(5, 10):
            frames[t].append((64, 0.7))
        roll = self._roll(frames)
        cond, poly = MIDIRoll2Conditioning(4)(roll)
        # Find channel of pitch 60 at t=0; must not move when 64 arrives.
        ch60 = int(np.argmax(cond[0, :, 0] == 60))
        assert (cond[:10, ch60, 0] == 60).all()
        np.testing.assert_array_equal(poly[:5], 1)
        np.testing.assert_array_equal(poly[5:10], 2)

    def test_round_robin_new_channels(self):
        """Consecutive new notes land on distinct channels."""
        frames = {0: [(60, 1.0)], 1: [(60, 1.0), (62, 1.0)],
                  2: [(60, 1.0), (62, 1.0), (64, 1.0)]}
        roll = self._roll(frames)
        cond, _ = MIDIRoll2Conditioning(4)(roll)
        channels = {}
        for t in range(3):
            for c in range(4):
                p = cond[t, c, 0]
                if p > 0:
                    channels.setdefault(p, set()).add(c)
        for p, chans in channels.items():
            assert len(chans) == 1, f"pitch {p} moved channels: {chans}"
        assert len({list(v)[0] for v in channels.values()}) == 3

    def test_released_channel_reused(self):
        frames = {0: [(60, 1.0)], 1: [], 2: [(72, 1.0)]}
        roll = self._roll(frames)
        cond, poly = MIDIRoll2Conditioning(2)(roll)
        assert poly.tolist() == [1, 0, 1]
        assert (cond[1, :, 0] == 0).all()
        assert 72 in cond[2, :, 0]

    def test_matches_polyphony_count(self):
        rng = np.random.RandomState(0)
        roll = np.zeros((100, 88, 2), np.float32)
        # Random sustained notes.
        for _ in range(20):
            p = rng.randint(0, 88)
            s = rng.randint(0, 90)
            e = s + rng.randint(1, 10)
            roll[s:e, p, 0] = 1.0
            roll[s, p, 1] = rng.rand()
        cond, poly = MIDIRoll2Conditioning(16)(roll)
        active_out = (cond[..., 0] > 0).sum(-1)
        np.testing.assert_array_equal(active_out,
                                      np.minimum(poly, 16).astype(int))


class TestAudioIO:
    def test_wav_roundtrip(self, tmp_path):
        sr = 16000
        t = np.arange(sr) / sr
        audio = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        path = str(tmp_path / "a.wav")
        audio_io.write_wav(path, audio, sr)
        back, rate = audio_io.read_wav(path)
        assert rate == sr
        np.testing.assert_allclose(back[:, 0], audio, atol=1e-3)

    def test_load_audio_resamples(self, tmp_path):
        sr_in, sr_out = 48000, 16000
        t = np.arange(sr_in) / sr_in
        audio = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        path = str(tmp_path / "b.wav")
        audio_io.write_wav(path, audio, sr_in)
        out = audio_io.load_audio_as_signal(path, sr_out)
        assert out.shape == (sr_out,)
        spec = np.abs(np.fft.rfft(out))
        freqs = np.fft.rfftfreq(sr_out, 1 / sr_out)
        assert abs(freqs[spec.argmax()] - 440) < 2

    def test_normalize_dbfs(self, tmp_path):
        sr = 8000
        audio = 0.01 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)
        path = str(tmp_path / "c.wav")
        audio_io.write_wav(path, audio.astype(np.float32), sr)
        audio_io.normalize_audio(path, volume=-20.0)
        data, _ = audio_io.read_wav(path)
        assert abs(audio_io.dbfs(data) - (-20.0)) < 0.5


class TestLoadMidiAsConditioning:
    def test_end_to_end(self, tmp_path):
        notes, ccs = _simple_sequence()
        path = str(tmp_path / "t.mid")
        midi.write_midi(path, notes, ccs)
        inputs = data_io.load_midi_as_conditioning(path, n_synths=16,
                                                   frame_rate=250,
                                                   warm_up_duration=0.5)
        # 2.5 s of music ceil'd to 3 s + 0.5 s warm-up = 3.5 s.
        assert inputs['duration'] == 3.5
        assert inputs['conditioning'].shape == (1, 875, 16, 2)
        assert inputs['pedal'].shape == (1, 875, 4)
        # Warm-up frames are silent.
        assert (inputs['conditioning'][:, :125] == 0).all()
        # Sustained pitch 60 present after warm-up.
        assert 60.0 in inputs['conditioning'][0, 130, :, 0]


class TestNativeAllocator:
    """C++ allocator parity vs the numpy reference implementation."""

    def _random_roll(self, seed, n_frames=400, density=30):
        rng = np.random.RandomState(seed)
        roll = np.zeros((n_frames, 88, 2), np.float32)
        for _ in range(density):
            p = rng.randint(0, 88)
            s = rng.randint(0, n_frames - 5)
            e = s + rng.randint(1, 40)
            roll[s:e, p, 0] = 1.0
            roll[s, p, 1] = rng.rand()
        return roll

    def test_native_matches_numpy(self):
        from ddsp_piano_tpu import native
        if not native.available():
            pytest.skip("native toolchain unavailable")
        from ddsp_piano_tpu.data.midi_encoders import MIDIRoll2Conditioning
        for seed in range(5):
            roll = self._random_roll(seed)
            want_c, want_p = MIDIRoll2Conditioning(16)(roll.copy())
            got_c, got_p = native.allocate_voices(roll, 16)
            np.testing.assert_array_equal(got_p, want_p)
            np.testing.assert_array_equal(got_c, want_c)

    def test_native_matches_numpy_overflow_polyphony(self):
        """Behavior parity also when polyphony exceeds capacity."""
        from ddsp_piano_tpu import native
        if not native.available():
            pytest.skip("native toolchain unavailable")
        from ddsp_piano_tpu.data.midi_encoders import MIDIRoll2Conditioning
        roll = self._random_roll(99, n_frames=200, density=80)
        want_c, want_p = MIDIRoll2Conditioning(4)(roll.copy())
        got_c, got_p = native.allocate_voices(roll, 4)
        np.testing.assert_array_equal(got_c, want_c)


class TestJaxAllocator:
    """jit-able lax.scan voice allocator vs the numpy semantic reference."""

    def _random_roll(self, seed, n_frames=150, density=None):
        rng = np.random.RandomState(seed)
        roll = np.zeros((n_frames, 88, 2), np.float32)
        density = density or rng.randint(10, 60)
        for _ in range(density):
            p = rng.randint(0, 88)
            s = rng.randint(0, n_frames - 5)
            e = s + rng.randint(1, 40)
            roll[s:e, p, 0] = 1.0
            roll[s, p, 1] = rng.rand()
        return roll

    def test_exact_match_within_capacity(self):
        import jax
        from ddsp_piano_tpu.data.midi_encoders_jax import (
            roll_to_conditioning_jax)
        fn = jax.jit(roll_to_conditioning_jax, static_argnums=1)
        checked = 0
        for seed in range(12):
            roll = self._random_roll(seed)
            for n in (4, 16):
                want_c, want_p = MIDIRoll2Conditioning(n)(roll.copy())
                if (want_p > n).any():
                    continue
                got_c, got_p = fn(roll, n)
                np.testing.assert_array_equal(np.asarray(got_c), want_c)
                np.testing.assert_array_equal(np.asarray(got_p), want_p)
                checked += 1
        assert checked >= 8

    def test_overflow_yields_valid_topn_permutation(self):
        import jax
        from ddsp_piano_tpu.data.midi_encoders_jax import (
            roll_to_conditioning_jax)
        roll = self._random_roll(7, density=90)
        want_c, want_p = MIDIRoll2Conditioning(4)(roll.copy())
        assert (want_p > 4).any()
        got_c, _ = jax.jit(roll_to_conditioning_jax, static_argnums=1)(
            roll, 4)
        np.testing.assert_array_equal(
            np.sort(np.asarray(got_c)[..., 0], axis=-1),
            np.sort(want_c[..., 0], axis=-1))


class TestJaxAllocatorOverCapacity:
    """The over-capacity band is EXACT for binary rolls (VERDICT r1 #8).

    The reference's -1-cursor overflow quirk chain is structurally
    unreachable from 0/1 rolls: the top-n window releases and admits
    notes in balanced counts, so post-release free slots always cover the
    new notes. The only divergence between the host and on-device
    allocators is malformed non-binary active values (key*active pitch
    collisions), which make_serving_fn binarizes away.
    """

    def _churn_roll(self, rng, n_synths, n_frames=30):
        """Random walk held persistently ABOVE capacity with churn."""
        roll = np.zeros((n_frames, 88, 2), np.float32)
        lo, hi = n_synths + 1, min(88, 3 * n_synths)
        active = set(rng.choice(88, rng.randint(lo, hi), replace=False))
        for t in range(n_frames):
            for _ in range(rng.randint(0, n_synths)):
                if len(active) > lo and rng.rand() < 0.5:
                    active.discard(rng.choice(sorted(active)))
                elif len(active) < hi:
                    k = rng.randint(0, 88)
                    if k not in active:
                        active.add(k)
                        roll[t, k, 1] = rng.rand()
            roll[t, sorted(active), 0] = 1.0
        return roll

    def test_exact_match_over_capacity(self):
        import jax
        from ddsp_piano_tpu.data.midi_encoders_jax import (
            roll_to_conditioning_jax)
        fn = jax.jit(roll_to_conditioning_jax, static_argnums=1)
        rng = np.random.RandomState(1)
        for trial in range(25):
            n = int(rng.choice([4, 8, 16]))
            roll = self._churn_roll(rng, n)
            want_c, want_p = MIDIRoll2Conditioning(n)(roll.copy())
            assert (want_p > n).any(), "roll must exceed capacity"
            got_c, got_p = fn(roll, n)
            np.testing.assert_array_equal(
                np.asarray(got_c).astype(want_c.dtype), want_c)
            np.testing.assert_array_equal(np.asarray(got_p), want_p)

    def test_nonbinary_active_diverges_and_serving_binarizes(self):
        """Document the one divergent input class, and show the serving
        sanitization removes it."""
        import jax
        import jax.numpy as jnp
        from ddsp_piano_tpu.data.midi_encoders_jax import (
            roll_to_conditioning_jax)

        # key 21 with active=2 collides with key 42's pitch (21*2 == 42).
        roll = np.zeros((6, 88, 2), np.float32)
        roll[:, [0, 21, 5, 9], 0] = 1.0
        roll[2:, 0, 0] = 2.0   # malformed: pitch 21*2 duplicates key 21+21
        roll[:, [0, 21, 5, 9], 1] = 0.5

        binarized = np.stack([(roll[..., 0] > 0).astype(np.float32),
                              roll[..., 1]], axis=-1)
        want_c, _ = MIDIRoll2Conditioning(4)(binarized.copy())
        got_raw = np.asarray(roll_to_conditioning_jax(roll, 4)[0])
        got_bin = np.asarray(roll_to_conditioning_jax(binarized, 4)[0])
        # Binary path matches the host allocator bit-for-bit ...
        np.testing.assert_array_equal(got_bin.astype(want_c.dtype), want_c)
        # ... and the serving-side sanitization is exactly binarization.
        sanitized = jnp.stack([(jnp.asarray(roll)[..., 0] > 0).astype(
            jnp.float32), jnp.asarray(roll)[..., 1]], axis=-1)
        np.testing.assert_array_equal(
            np.asarray(roll_to_conditioning_jax(sanitized, 4)[0]), got_bin)


class TestMidiParserRobustness:
    def test_truncated_file_raises_cleanly(self, tmp_path):
        notes, ccs = _simple_sequence()
        path = str(tmp_path / "t.mid")
        midi.write_midi(path, notes, ccs)
        data = open(path, 'rb').read()
        for cut in (3, 10, len(data) // 2):
            with pytest.raises((ValueError, Exception)):
                midi.parse_midi_bytes(data[:cut])

    def test_not_a_midi_file(self):
        with pytest.raises(ValueError):
            midi.parse_midi_bytes(b'RIFFxxxxWAVE' + b'\x00' * 64)

    def test_empty_sequence(self):
        seq = midi.MidiSequence([], [], 0.0)
        roll = midi.sequence_to_pianoroll(seq, 250)
        assert roll.active.shape[1] == 88
        out = midi.apply_sustain_control_changes(seq)
        assert out.notes == []

    def test_running_status_and_format0(self, tmp_path):
        """Our writer emits format 0 with running-status-free events; the
        parser handles both paths (the roundtrip already covers parsing)."""
        path = str(tmp_path / "r.mid")
        midi.write_midi(path, [midi.Note(60, 100, 0.0, 0.5),
                               midi.Note(62, 90, 0.5, 1.0)])
        seq = midi.parse_midi(path)
        assert [n.pitch for n in seq.notes] == [60, 62]


class TestSingleTrackDataset:
    """Train-on-one-recording dataset (reference data_pipeline.py:270-352)."""

    def _make_track(self, tmp_path, seconds=7.0, sr=16000):
        n_notes = max(1, int((seconds - 1.0) / 0.5))
        notes = [midi.Note(pitch=60 + 2 * i, velocity=80,
                           start_time=0.5 * i, end_time=0.5 * i + 0.4)
                 for i in range(n_notes)]
        midi_path = str(tmp_path / 'track.mid')
        midi.write_midi(midi_path, notes)
        t = np.arange(int(seconds * sr)) / sr
        audio = (0.1 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
        wav_path = str(tmp_path / 'track.wav')
        audio_io.write_wav(wav_path, audio, sr)
        return midi_path, wav_path

    def test_batches_have_canonical_shapes(self, tmp_path):
        from ddsp_piano_tpu.data.pipeline import single_track_dataset
        midi_path, wav_path = self._make_track(tmp_path)
        it = single_track_dataset(midi_path, wav_path, batch_size=1,
                                  duration=3.0, sample_rate=16000,
                                  max_polyphony=4)
        batches = list(it)
        assert len(batches) >= 2   # 7 s track, 3 s segments, 50% overlap
        b = batches[0]
        assert b['audio'].shape == (1, 48000)
        assert b['conditioning'].shape == (1, 750, 4, 2)
        assert b['pedal'].shape == (1, 750, 4)
        # Notes actually landed in the conditioning.
        assert b['conditioning'][..., 0].max() >= 60

    def test_short_track_padded_to_one_segment(self, tmp_path):
        from ddsp_piano_tpu.data.pipeline import single_track_dataset
        midi_path, wav_path = self._make_track(tmp_path, seconds=1.5)
        batches = list(single_track_dataset(midi_path, wav_path,
                                            duration=3.0,
                                            sample_rate=16000,
                                            max_polyphony=4))
        assert len(batches) == 1
        assert batches[0]['audio'].shape == (1, 48000)

    def test_infinite_generator_loops(self, tmp_path):
        from ddsp_piano_tpu.data.pipeline import single_track_dataset
        midi_path, wav_path = self._make_track(tmp_path)
        it = single_track_dataset(midi_path, wav_path, duration=3.0,
                                  sample_rate=16000, max_polyphony=4,
                                  infinite_generator=True)
        finite = len(list(single_track_dataset(
            midi_path, wav_path, duration=3.0, sample_rate=16000,
            max_polyphony=4)))
        for _ in range(finite + 2):   # runs past one epoch without ending
            next(it)


class TestPrefetcher:
    def test_passes_items_through(self):
        from ddsp_piano_tpu.data.pipeline import Prefetcher
        assert list(Prefetcher(iter(range(5)))) == [0, 1, 2, 3, 4]

    def test_worker_errors_propagate(self):
        """A pipeline failure must surface with its cause, not end the
        'infinite' iterator as a bare StopIteration (regression: a bad
        cache made the train loop die with no diagnostic)."""
        from ddsp_piano_tpu.data.pipeline import Prefetcher

        def boom():
            yield 1
            raise ValueError("bad cache")

        it = Prefetcher(boom())
        assert next(it) == 1
        with pytest.raises(RuntimeError, match='pipeline worker failed') \
                as exc:
            next(it)
        assert isinstance(exc.value.__cause__, ValueError)
