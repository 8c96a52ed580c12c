"""Training-CLI behaviors: preemption-safe epoch accounting (--auto_resume).

A relaunch of the same command (the 3-phase recipe relaunches every phase's
command) must run only the REMAINING epochs, and a finished phase must exit
immediately instead of overtraining.
"""

import itertools
import json
import os

import pytest

import jax

from ddsp_piano_tpu import configs as configs_module
from ddsp_piano_tpu.configs import get_model
from ddsp_piano_tpu.data import pipeline
from ddsp_piano_tpu.data.pipeline import get_dummy_data
from ddsp_piano_tpu.training import checkpoints


@pytest.fixture()
def tiny_cli_env(monkeypatch):
    import numpy as np

    batch = get_dummy_data(batch_size=2, duration=0.5, sample_rate=16000,
                           n_synths=4)
    # Realistic playing pitches: get_dummy_data's uniform-[0,1] pitch
    # column puts f0 below the additive synth's min_frequency gate, which
    # zeroes every frequency-path gradient (detuner/inharm/tuning would
    # never move regardless of phase).
    cond = np.zeros_like(batch['conditioning'])
    n_frames = cond.shape[1]
    for v in range(cond.shape[2]):
        cond[:, 5:, v, 0] = 48.0 + 7.0 * v
        cond[:, 5:12, v, 1] = 0.8
    batch['conditioning'] = cond
    monkeypatch.setattr(pipeline, 'get_training_dataset',
                        lambda *a, **k: itertools.repeat(batch))
    monkeypatch.setattr(pipeline, 'get_validation_dataset',
                        lambda *a, **k: [])
    monkeypatch.setattr(pipeline, 'Prefetcher', lambda it: iter(it))
    monkeypatch.setattr(
        configs_module, 'get_model',
        lambda name, **kw: get_model('dafx22', duration=0.5, n_synths=4,
                                     first_phase=kw.get('first_phase',
                                                        True)))
    return batch


def _run(tmp_path, epochs):
    import train_single_phase as tsp

    args = tsp.process_args([
        '--batch_size', '2', '--steps_per_epoch', '2',
        '--epochs', str(epochs), '--auto_resume', '--n_devices', '1',
        '-c', 'tiny', str(tmp_path / 'data'), str(tmp_path / 'exp')])
    tsp.main(args)
    last_iter = str(tmp_path / 'exp' / 'phase_1' / 'last_iter')
    ckpt = checkpoints.latest_checkpoint(last_iter)
    meta = checkpoints.read_meta(last_iter)
    return ckpt, meta


def test_auto_resume_epoch_accounting(tmp_path, tiny_cli_env):
    # Fresh run: 3 epochs x 2 steps.
    ckpt, meta = _run(tmp_path, epochs=3)
    assert ckpt.endswith('ckpt-6')
    assert meta['phase_start_step'] == 0
    assert meta['step'] == 6

    # Relaunch of the SAME finished command: exits without training.
    ckpt, meta = _run(tmp_path, epochs=3)
    assert ckpt.endswith('ckpt-6'), "finished phase was re-trained"

    # Raising the epoch budget resumes with only the remaining epochs.
    ckpt, meta = _run(tmp_path, epochs=5)
    assert ckpt.endswith('ckpt-10')
    assert meta['phase_start_step'] == 0


def test_steps_per_dispatch_cli(tmp_path, tiny_cli_env):
    """K-step scan dispatch through the CLI (-k 2): step accounting and
    checkpoints must match the single-step path's (4 steps -> ckpt-4)."""
    import train_single_phase as tsp

    args = tsp.process_args([
        '--batch_size', '2', '--steps_per_epoch', '4',
        '--steps_per_dispatch', '2', '--epochs', '1', '--n_devices', '1',
        '-c', 'tiny', str(tmp_path / 'data'), str(tmp_path / 'exp')])
    tsp.main(args)
    last_iter = str(tmp_path / 'exp' / 'phase_1' / 'last_iter')
    ckpt = checkpoints.latest_checkpoint(last_iter)
    assert ckpt.endswith('ckpt-4')


def _read_params(ckpt_dir, template):
    restored = checkpoints.restore_checkpoint(
        ckpt_dir, {'params': template, 'opt_state': None, 'step': 0})
    return jax.device_get(restored['params']), restored['step']


def _slot_max_delta(before, after):
    """{top-level slot or slot/subkey: max abs param delta}."""
    import numpy as np

    out = {}
    for slot in before:
        b, a = before[slot], after[slot]
        if isinstance(b, dict) and slot == 'z_encoder':
            for sub in b:
                leaves_b = jax.tree.leaves(b[sub])
                leaves_a = jax.tree.leaves(a[sub])
                out[f'{slot}/{sub}'] = max(
                    (float(np.abs(x - y).max())
                     for x, y in zip(leaves_b, leaves_a)), default=0.0)
        else:
            leaves_b = jax.tree.leaves(b)
            leaves_a = jax.tree.leaves(a)
            out[slot] = max((float(np.abs(x - y).max())
                             for x, y in zip(leaves_b, leaves_a)),
                            default=0.0)
    return out


def test_three_phase_recipe(tmp_path, tiny_cli_env):
    """The full train_ddsp_piano.sh recipe at tiny shapes: phase 1 -> 2 -> 3
    with --restore chaining (reference train_ddsp_piano.sh:8-52), asserting
    per-phase which sub-modules moved (reference alternate_training,
    piano_model.py:78-105) and that steps accumulate across restores."""
    import train_single_phase as tsp

    def run_phase(phase, restore=None):
        argv = ['--batch_size', '2', '--steps_per_epoch', '2',
                '--epochs', '1', '--n_devices', '1',
                '--phase', str(phase), '-c', 'tiny']
        if restore:
            argv += ['--restore', restore]
        argv += [str(tmp_path / 'data'), str(tmp_path / 'exp')]
        tsp.main(tsp.process_args(argv))
        return str(tmp_path / 'exp' / f'phase_{phase}' / 'last_iter')

    template = get_model('dafx22', duration=0.5, n_synths=4).init(
        jax.random.PRNGKey(0))
    init_params = jax.device_get(template)

    # The detuner gate follows the phase (reference piano_model.py:103).
    assert not get_model('dafx22', duration=0.5, n_synths=4,
                         first_phase=True).detuner.use_detune
    assert get_model('dafx22', duration=0.5, n_synths=4,
                     first_phase=False).detuner.use_detune

    # ---- phase 1: control modules train, frequency modules frozen ----
    p1_dir = run_phase(1)
    p1, step1 = _read_params(p1_dir, template)
    assert int(step1) == 2
    d1 = _slot_max_delta(init_params, p1)
    for slot in ('context_network', 'monophonic_network', 'reverb_model',
                 'z_encoder/embedding'):
        assert d1[slot] > 0.0, f'{slot} should train in phase 1: {d1}'
    for slot in ('detuner', 'inharm_model', 'z_encoder/inharm_embedding',
                 'z_encoder/detune_embedding'):
        assert d1[slot] == 0.0, f'{slot} must be frozen in phase 1: {d1}'

    # ---- phase 2 (restores phase 1): the inverse trainability ----
    p2_dir = run_phase(2, restore=p1_dir)
    p2, step2 = _read_params(p2_dir, template)
    assert int(step2) == 4, "phase-2 restore must carry phase-1 steps"
    d2 = _slot_max_delta(p1, p2)
    for slot in ('detuner', 'inharm_model', 'z_encoder/inharm_embedding',
                 'z_encoder/detune_embedding'):
        assert d2[slot] > 0.0, f'{slot} should train in phase 2: {d2}'
    for slot in ('context_network', 'monophonic_network', 'reverb_model',
                 'note_release', 'z_encoder/embedding'):
        assert d2[slot] == 0.0, f'{slot} must be frozen in phase 2: {d2}'

    # ---- phase 3 (restores phase 2): back to the phase-1 split ----
    p3_dir = run_phase(3, restore=p2_dir)
    p3, step3 = _read_params(p3_dir, template)
    assert int(step3) == 6
    d3 = _slot_max_delta(p2, p3)
    for slot in ('context_network', 'monophonic_network', 'reverb_model'):
        assert d3[slot] > 0.0, f'{slot} should train in phase 3: {d3}'
    for slot in ('detuner', 'inharm_model', 'z_encoder/inharm_embedding',
                 'z_encoder/detune_embedding'):
        assert d3[slot] == 0.0, f'{slot} must be frozen in phase 3: {d3}'

    # The inharmonicity physics anchors never move in any phase.
    import numpy as np
    for k in ('slopes', 'offsets'):
        np.testing.assert_array_equal(init_params['inharm_model'][k],
                                      p3['inharm_model'][k])


def test_checkpoint_meta_roundtrip(tmp_path):
    from ddsp_piano_tpu.parallel import mesh as mesh_lib
    from ddsp_piano_tpu.training.trainer import Trainer

    model = get_model('dafx22', duration=0.5, n_synths=4)
    trainer = Trainer(model, mesh=mesh_lib.get_mesh(1))
    state = trainer.init_state(jax.random.PRNGKey(0))
    trainer.save(state, str(tmp_path),
                 meta={'phase_start_step': 7, 'lowest_val_loss': 1.25})
    meta = checkpoints.read_meta(str(tmp_path))
    assert meta == {'step': 0, 'phase_start_step': 7,
                    'lowest_val_loss': 1.25}
