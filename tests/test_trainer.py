"""Trainer tests: optimization on dummy data, phase masks, mesh sharding,
checkpoint lifecycle, NaN guard."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddsp_piano_tpu.configs import get_model
from ddsp_piano_tpu.data.pipeline import get_dummy_data
from ddsp_piano_tpu.parallel import mesh as mesh_lib
from ddsp_piano_tpu.training.trainer import NanLossError, Trainer


@pytest.fixture(scope='module')
def env():
    model = get_model('dafx22', duration=0.5, n_synths=4)
    mesh = mesh_lib.get_mesh(4)
    trainer = Trainer(model, learning_rate=1e-3, first_phase=True, mesh=mesh)
    batch = get_dummy_data(batch_size=4, duration=0.5, sample_rate=16000,
                           n_synths=4)
    return model, trainer, batch


@pytest.fixture()
def setup(env):
    model, trainer, batch = env
    # Fresh state AND an empty NaN-guard deque per test (guards now drain
    # every nan_check_interval steps, so they would otherwise leak between
    # tests sharing the module-scoped trainer).
    trainer._pending_guard.clear()
    state = trainer.init_state(jax.random.PRNGKey(0))
    return model, trainer, state, batch


def test_train_step_reduces_loss(setup):
    model, trainer, state, batch = setup
    losses_first = None
    for i in range(8):
        state, losses = trainer.train_step(state, batch)
        if losses_first is None:
            losses_first = losses
    assert int(state.step) == 8
    assert losses['total_loss'] < losses_first['total_loss']


def test_train_steps_scan_matches_sequential(setup):
    """K-step scan dispatch (round 5): train_steps must produce the same
    parameter trajectory and losses as K calls of train_step with the
    default rng (both derive step rngs via fold_in(PRNGKey(17), step))."""
    model, trainer, state, batch = setup
    k = 3
    # Vary the batches across steps so a step-ordering bug can't hide.
    rng = np.random.RandomState(3)
    batches = []
    for _ in range(k):
        b = {kk: (v + rng.randn(*v.shape).astype(v.dtype) * 0.01
                  if np.issubdtype(np.asarray(v).dtype, np.floating) else v)
             for kk, v in batch.items()}
        batches.append(b)

    state_seq = state
    seq_losses = []
    for b in batches:
        state_seq, losses = trainer.train_step(state_seq, b)
        seq_losses.append(float(losses['total_loss']))

    state_scan, scan_losses = trainer.train_steps(state, batches)
    assert int(state_scan.step) == int(state_seq.step)
    np.testing.assert_allclose(
        np.asarray(scan_losses['total_loss']), np.asarray(seq_losses),
        rtol=1e-5, atol=1e-6)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(state_scan.params),
            jax.tree_util.tree_leaves_with_path(state_seq.params)):
        assert str(ka) == str(kb)
        # scan-vs-unrolled compile differences reassociate f32 sums; after
        # 3 Adam steps the trajectories agree to ~2e-5 abs. A step-ordering
        # or rng bug would differ by the Adam update scale (~lr = 1e-3).
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-4, err_msg=str(ka))


def test_train_steps_scan_nan_guard(setup):
    """A non-finite loss inside a scanned block still raises, carrying the
    pre-block state."""
    model, trainer, state, batch = setup
    bad = dict(batch, audio=np.full_like(batch['audio'], np.nan))
    state2, _ = trainer.train_steps(state, [bad, bad])
    with pytest.raises(NanLossError) as ei:
        trainer.check_pending()
    assert ei.value.state is state


def test_phase_mask_freezes_params(setup):
    model, trainer, state, batch = setup
    before = np.asarray(state.params['inharm_model']['slopes_modifier'])
    mono_before = np.asarray(
        state.params['monophonic_network']['dense_out']['kernel'])
    state2, _ = trainer.train_step(state, batch)
    # Phase 1: inharm modifiers frozen, mono net updates.
    np.testing.assert_array_equal(
        np.asarray(state2.params['inharm_model']['slopes_modifier']), before)
    assert not np.allclose(
        np.asarray(state2.params['monophonic_network']['dense_out']['kernel']),
        mono_before)


def test_batch_sharded_over_mesh(setup):
    model, trainer, state, batch = setup
    sharded = trainer.distribute_batch(batch)
    audio = sharded['audio']
    assert len(audio.devices()) == 4
    # Axis 0 split across 4 devices.
    shard_shapes = {s.data.shape for s in audio.addressable_shards}
    assert shard_shapes == {(1,) + audio.shape[1:]}


def test_validation_step(setup):
    model, trainer, state, batch = setup
    losses, audio = trainer.validation_step(state, batch)
    assert np.isfinite(losses['total_loss'])
    assert audio.shape == (4, 8000)


def test_checkpoint_roundtrip(tmp_path, setup):
    model, trainer, state, batch = setup
    state, _ = trainer.train_step(state, batch)
    trainer.save(state, str(tmp_path))
    fresh = trainer.init_state(jax.random.PRNGKey(42))
    restored = trainer.restore(fresh, str(tmp_path))
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_nan_guard(setup):
    """The delayed guard halts within one step and hands back the last
    finite state for the crashed_iter checkpoint."""
    model, trainer, state, batch = setup
    bad = dict(batch)
    bad['audio'] = np.full_like(batch['audio'], np.nan)
    state2, _ = trainer.train_step(state, bad)  # guard checked next call
    with pytest.raises(NanLossError) as exc_info:
        trainer.check_pending()
    good = exc_info.value.state
    assert good is not None
    for leaf in jax.tree.leaves(good.params):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_nan_guard_interval(env):
    """train_step drains the guard deque every nan_check_interval steps,
    raising with the state from before the FIRST non-finite step."""
    model, _, batch = env
    trainer = Trainer(model, learning_rate=1e-3, first_phase=True,
                      mesh=mesh_lib.get_mesh(4), nan_check_interval=3)
    state = trainer.init_state(jax.random.PRNGKey(0))
    bad = dict(batch)
    bad['audio'] = np.full_like(batch['audio'], np.nan)
    state, _ = trainer.train_step(state, bad)        # pending: 1
    with pytest.raises(NanLossError) as exc_info:
        for _ in range(4):                           # drains at 3 pending
            state, _ = trainer.train_step(state, bad)
    err_state = exc_info.value.state
    assert int(err_state.step) == 0                  # before the first bad step
    for leaf in jax.tree.leaves(err_state.params):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_device_prefetch_equivalent(env):
    """Double-buffered device staging consumes every batch in order and
    produces bitwise-identical training to the plain loop."""
    model, trainer, batch = env
    trainer._pending_guard.clear()
    batches = [dict(batch, audio=batch['audio'] + 0.01 * i)
               for i in range(5)]

    state_a = trainer.init_state(jax.random.PRNGKey(0))
    for b in batches:
        state_a, _ = trainer.train_step(state_a, b)
    trainer.check_pending()

    state_b = trainer.init_state(jax.random.PRNGKey(0))
    n = 0
    for b in trainer.device_prefetch(iter(batches)):
        state_b, _ = trainer.train_step(state_b, b)
        n += 1
    trainer.check_pending()

    assert n == len(batches)
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Short and empty iterators terminate cleanly (StopIteration during
    # the initial fill).
    assert len(list(trainer.device_prefetch(iter(batches[:1])))) == 1
    assert list(trainer.device_prefetch(iter([]))) == []


def test_packed_staging_bit_exact(env):
    """Packed staging (one (b, width) device_put, unpack inside the jitted
    step — training/staging.py) must reproduce dict staging bit-for-bit on
    both the single-step and the K-block scan dispatch. Relay measurement:
    dict staging 49.5 ms/batch vs 14.3 ms packed for the same 1.8 MB
    (benchmarks/profile_relay_staging.py)."""
    model, trainer, batch = env
    trainer._pending_guard.clear()
    batches = [dict(batch, audio=batch['audio'] + 0.01 * i)
               for i in range(3)]

    # Single-step: dict vs packed (via device_prefetch(packed=True)).
    state_a = trainer.init_state(jax.random.PRNGKey(0))
    for b in batches:
        state_a, losses_a = trainer.train_step(state_a, b)
    trainer.check_pending()
    state_b = trainer.init_state(jax.random.PRNGKey(0))
    n = 0
    for b in trainer.device_prefetch(iter(batches), packed=True):
        assert not isinstance(b, dict)  # really the packed array path
        state_b, losses_b = trainer.train_step(state_b, b)
        n += 1
    trainer.check_pending()
    assert n == len(batches)
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(losses_a['total_loss']),
                                  np.asarray(losses_b['total_loss']))

    # K-block scan: stack_batches vs pack_block under the same scan
    # program (scan-vs-unrolled is covered with tolerance elsewhere).
    state_c = trainer.init_state(jax.random.PRNGKey(0))
    state_c, _ = trainer.train_steps(state_c, trainer.stack_batches(batches))
    state_d = trainer.init_state(jax.random.PRNGKey(0))
    blocks = list(trainer.block_prefetch(iter(batches), k=3, packed=True))
    assert len(blocks) == 1 and not isinstance(blocks[0], dict)
    state_d, _ = trainer.train_steps(state_d, blocks[0])
    trainer._pending_guard.clear()
    for a, b in zip(jax.tree.leaves(state_c.params),
                    jax.tree.leaves(state_d.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batch_packer_contract():
    """BatchPacker wire format: per-key lane selection from the template,
    bit-exact roundtrip on every lane, per-batch contract enforcement."""
    from ddsp_piano_tpu.training.staging import BatchPacker
    rng = np.random.RandomState(0)
    # Realistic provenance data: 16-bit PCM audio (int16/32768 — what the
    # wav decode produces), MIDI conditioning ([pitch, velocity/127]),
    # 0/1 pedal rolls, small int ids — plus an arbitrary-float key that
    # must fall back to exact f32-split lanes.
    audio = (rng.randint(-32768, 32768, (2, 64)).astype(np.float32)
             / np.float32(32768.0))
    pitch = rng.randint(21, 109, (2, 5, 3, 1)).astype(np.float32)
    vel = (rng.randint(0, 128, (2, 5, 3, 1)).astype(np.float32)
           / np.float32(127.0))
    tmpl = {'audio': audio,
            'conditioning': np.concatenate([pitch, vel], axis=-1),
            'pedal': rng.randint(0, 2, (2, 5)).astype(np.float32),
            'ids': np.array([[3], [116]], np.int32),
            'free': rng.randn(2, 7).astype(np.float32),
            'filename': np.array(['x', 'y'])}
    p = BatchPacker(tmpl)
    enc = p.encodings()
    assert enc['audio'] == 'i16x32768', enc
    assert enc['conditioning'] == 'i16x127', enc
    assert enc['pedal'] == 'u16' and enc['ids'] == 'u16', enc
    assert enc['free'] == 'f32x2', enc
    packed = p.pack(tmpl)
    assert packed.dtype == np.uint16
    # 64 + 30 + 5 + 1 one-lane + 7 two-lane = 114
    assert packed.shape == (2, 114), packed.shape
    out = p.unpack(jnp.asarray(packed))
    for k in ('audio', 'conditioning', 'pedal', 'free'):
        np.testing.assert_array_equal(np.asarray(out[k]), tmpl[k], err_msg=k)
        assert out[k].dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out['ids']), tmpl['ids'])
    assert out['ids'].dtype == jnp.int32
    # Block pack/unpack keeps the leading (K, b) axes.
    blk = p.pack_block([tmpl, tmpl])
    outb = p.unpack(jnp.asarray(blk))
    assert outb['audio'].shape == (2, 2, 64)
    np.testing.assert_array_equal(np.asarray(outb['audio'][1]), audio)
    # A later batch violating the template's lane contract raises.
    with pytest.raises(ValueError, match='i16\\*32768'):
        p.pack(dict(tmpl, audio=audio + np.float32(1e-7)))
    # wire=False forces exact f32-split lanes everywhere.
    p32 = BatchPacker(tmpl, wire=False)
    assert set(p32.encodings().values()) == {'f32x2', 'i32x2'}
    out32 = p32.unpack(jnp.asarray(p32.pack(tmpl)))
    for k in ('audio', 'conditioning', 'pedal', 'free', 'ids'):
        np.testing.assert_array_equal(np.asarray(out32[k]), tmpl[k],
                                      err_msg=k)
    # Scalar keys and non-f32 floats are rejected at template time.
    with pytest.raises(ValueError, match='batch axis'):
        BatchPacker({'s': np.float32(1.0)})
    with pytest.raises(ValueError, match='float32'):
        BatchPacker({'h': np.zeros((2, 3), np.float16)})
    # Negative/large ints fall back to exact i32-split lanes.
    pi = BatchPacker({'ids': np.array([[-5], [2 ** 24 + 1]], np.int32)})
    assert pi.encodings()['ids'] == 'i32x2'
    oi = pi.unpack(jnp.asarray(pi.pack(
        {'ids': np.array([[-5], [2 ** 24 + 1]], np.int32)})))
    np.testing.assert_array_equal(np.asarray(oi['ids']),
                                  [[-5], [2 ** 24 + 1]])


def test_real_pipeline_batch_wire_encodes_compact(tmp_path):
    """The REAL data pipeline's batches (16-bit wav decode + MIDI rolls)
    must hit the compact 16-bit wire lanes — half the staging bytes —
    and round-trip bit-exactly (the production staging contract)."""
    import pandas as pd

    from ddsp_piano_tpu.data import midi, pipeline, audio_io
    from ddsp_piano_tpu.training.staging import BatchPacker

    sr = 16000
    t = np.arange(4 * sr) / sr
    wav = (0.4 * np.sin(2 * np.pi * 261.6 * t)).astype(np.float32)
    audio_io.write_wav(str(tmp_path / 'track.wav'), wav, sr)
    midi.write_midi(str(tmp_path / 'track.mid'),
                    [midi.Note(60, 80, 0.5, 2.0),
                     midi.Note(64, 70, 1.0, 3.0)],
                    [midi.ControlChange(0.2, 64, 90),
                     midi.ControlChange(2.5, 64, 0)])
    pd.DataFrame([{'split': 'train', 'year': 2018,
                   'audio_filename': 'track.wav',
                   'midi_filename': 'track.mid'}]).to_csv(
        str(tmp_path / 'maestro-v3.0.0.csv'), index=False)
    batch = next(iter(pipeline.get_training_dataset(
        str(tmp_path), batch_size=2, duration=1.0, max_polyphony=4,
        sample_rate=sr)))

    p = BatchPacker(batch)
    enc = p.encodings()
    assert enc['audio'] == 'i16x32768', enc          # wav provenance
    assert enc['conditioning'] == 'i16x127', enc     # MIDI provenance
    assert enc['piano_model'] == 'u16', enc
    assert not any(e.endswith('x2') for e in enc.values()), enc
    dict_bytes = sum(np.asarray(v).nbytes for k, v in batch.items()
                     if k != 'filename')
    assert p.wire_bytes(2) * 2 == dict_bytes
    out = p.unpack(jnp.asarray(p.pack(batch)))
    for k in p.keys():
        np.testing.assert_array_equal(
            np.asarray(out[k]), np.asarray(batch[k]), err_msg=k)


def test_nan_guard_blocks_save(setup, tmp_path):
    """save() flushes the pending guard so a NaN state never hits disk."""
    model, trainer, state, batch = setup
    bad = dict(batch)
    bad['audio'] = np.full_like(batch['audio'], np.nan)
    state2, _ = trainer.train_step(state, bad)
    with pytest.raises(NanLossError):
        trainer.save(state2, str(tmp_path))
    import os
    assert not os.path.exists(os.path.join(str(tmp_path), 'checkpoint'))


def test_shard_batch_rejects_scalars_and_indivisible():
    mesh = mesh_lib.get_mesh(4)
    good = {'x': np.zeros((4, 3), np.float32)}
    out = mesh_lib.shard_batch(good, mesh)
    assert out['x'].shape == (4, 3)
    with pytest.raises(ValueError, match='scalar'):
        mesh_lib.shard_batch({'x': np.zeros((4, 3), np.float32),
                              'step': np.float32(1.0)}, mesh)
    with pytest.raises(ValueError, match='not divisible'):
        mesh_lib.shard_batch({'x': np.zeros((6, 3), np.float32)}, mesh)


def test_reference_api_parity(setup):
    """build / run / distribute_dataset exist and behave (ddsp Trainer
    surface; reference train_single_phase.py:127-182)."""
    model, trainer, state, batch = setup
    built = trainer.build(batch)
    assert int(built.step) == 0
    out = trainer.run(lambda x: x + 1, 1)
    assert out == 2
    it = trainer.distribute_dataset([batch])
    sharded = next(it)
    assert sharded['audio'].shape == batch['audio'].shape
    # train_step accepts a pre-distributed batch too.
    state2, losses = trainer.train_step(built, sharded)
    assert int(state2.step) == 1
