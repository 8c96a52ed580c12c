"""Multi-host distribution smoke tests (SURVEY §2.9; VERDICT round-1 #4).

The reference trains multi-host through tf.distribute's strategy
resolution (/root/reference/train_single_phase.py:123). The TPU-native
equivalent is jax.distributed + a global mesh + per-host batch slices
(parallel/mesh.py). Since the harness has one machine, the cross-process
path is validated by SPAWNING two CPU processes (2 virtual devices each,
gloo collectives) and checking that multi-process training on local batch
slices matches single-process training on the global batch.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import _multihost_common as common

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO_DIR = os.path.dirname(TESTS_DIR)


def _free_port():
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


@pytest.fixture(scope='module')
def two_process_run(tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp('multihost'))
    port = _free_port()
    env = dict(os.environ)
    env['PYTHONPATH'] = os.pathsep.join(
        [REPO_DIR, TESTS_DIR, env.get('PYTHONPATH', '')])
    # The workers pin their own platform/flags; drop the pytest ones.
    env.pop('XLA_FLAGS', None)
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(TESTS_DIR, 'multihost_worker.py'),
         str(pid), '2', str(port), out_dir],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'worker {pid} failed:\n{out}'
    return out_dir


def test_workers_agree_on_global_loss(two_process_run):
    results = [json.load(open(os.path.join(two_process_run,
                                           f'result_{pid}.json')))
               for pid in range(2)]
    # Replicated global scalars: every process sees the same loss/step.
    assert results[0]['final_loss'] == pytest.approx(
        results[1]['final_loss'], rel=1e-6)
    assert results[0]['step'] == results[1]['step'] == common.N_STEPS


def test_multiprocess_matches_single_process(two_process_run):
    """2 processes x local half-batches == 1 process x global batch."""
    import jax

    from ddsp_piano_tpu.parallel import mesh as mesh_lib
    from ddsp_piano_tpu.training.trainer import Trainer

    mesh = mesh_lib.get_mesh_for_batch(common.GLOBAL_BATCH)
    _, state, losses = common.train_toy(Trainer, mesh,
                                        common.make_global_batch())
    ref_w = np.asarray(jax.device_get(state.params['w']))
    ref_loss = float(losses['total_loss'])

    got = np.load(os.path.join(two_process_run, 'worker_params.npz'))
    np.testing.assert_allclose(got['w'], ref_w, rtol=1e-5, atol=1e-6)
    # Frozen leaves must stay frozen through the distributed optimizer.
    np.testing.assert_array_equal(got['frozen'], np.ones(3, np.float32))

    worker = json.load(open(os.path.join(two_process_run,
                                         'result_0.json')))
    assert worker['final_loss'] == pytest.approx(ref_loss, rel=1e-5)

    # Lead-host checkpoint written and restorable.
    from ddsp_piano_tpu.training.checkpoints import latest_checkpoint
    assert latest_checkpoint(os.path.join(two_process_run,
                                          'ckpt')) is not None


def test_validation_allgather_matches_forward(two_process_run):
    """The all-gathered audio from the 2-process validation_step equals the
    single-process forward on the global batch."""
    import jax

    from ddsp_piano_tpu.parallel import mesh as mesh_lib
    from ddsp_piano_tpu.training.trainer import Trainer

    mesh = mesh_lib.get_mesh_for_batch(common.GLOBAL_BATCH)
    _, state, _ = common.train_toy(Trainer, mesh,
                                   common.make_global_batch())
    outs = common.ToyModel()(jax.device_get(state.params),
                             {k: np.asarray(v) for k, v in
                              common.make_global_batch().items()})
    got = np.load(os.path.join(two_process_run, 'worker_params.npz'))
    np.testing.assert_allclose(got['audio'], np.asarray(outs['audio_synth']),
                               rtol=1e-5, atol=1e-6)


def test_slice_local_batch_single_process_noop():
    from ddsp_piano_tpu.parallel import mesh as mesh_lib
    batch = common.make_global_batch()
    out = mesh_lib.slice_local_batch(batch)
    assert out is batch


def test_train_cli_exposes_multihost_flags():
    """The train CLI wires coordinator/process flags to
    mesh.initialize_multihost (argument parity with a launchable
    multi-host run)."""
    import train_single_phase
    args = train_single_phase.process_args(
        ['--coordinator_address', 'h:1234', '--num_processes', '4',
         '--process_id', '2', 'data', 'exp'])
    assert args.coordinator_address == 'h:1234'
    assert args.num_processes == 4
    assert args.process_id == 2


def test_real_model_trains_across_processes(tmp_path):
    """Two dafx22 train steps across a spawned 2-process cluster equal
    single-process training on the global batch — the full model graph
    (GRU scans, oscillator, noise FIR, reverb FFT, losses) under GSPMD
    with per-host shards, not just the toy problem. In the default suite
    since round 3 (VERDICT r2 item 6), budgeted by 0.3 s segments + the
    persistent compile cache."""
    out_dir = str(tmp_path)
    port = _free_port()
    env = dict(os.environ)
    env['PYTHONPATH'] = os.pathsep.join(
        [REPO_DIR, TESTS_DIR, env.get('PYTHONPATH', '')])
    env.pop('XLA_FLAGS', None)
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(TESTS_DIR, 'multihost_worker.py'),
         str(pid), '2', str(port), out_dir, 'model'],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = [p.communicate(timeout=560)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'worker {pid} failed:\n{out}'
    results = [json.load(open(os.path.join(out_dir,
                                           f'model_result_{pid}.json')))
               for pid in range(2)]
    assert results[0] == results[1]

    import jax

    from ddsp_piano_tpu.configs import get_model
    from ddsp_piano_tpu.data.pipeline import get_dummy_data
    from ddsp_piano_tpu.parallel import mesh as mesh_lib
    from ddsp_piano_tpu.training.trainer import Trainer
    from ddsp_piano_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    model = get_model('dafx22', duration=0.3, n_synths=4)
    trainer = Trainer(model, mesh=mesh_lib.get_mesh_for_batch(4))
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = get_dummy_data(batch_size=4, duration=0.3, sample_rate=16000,
                           n_synths=4)
    for _ in range(2):
        state, losses = trainer.train_step(state, batch)
    trainer.check_pending()
    want = float(losses['total_loss'])
    assert results[0]['total_loss'] == pytest.approx(want, rel=1e-4)
