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
    batch = get_dummy_data(batch_size=2, duration=0.5, sample_rate=16000,
                           n_synths=4)
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
