"""Worker process for the 2-process CPU multi-host smoke test.

Usage: python multihost_worker.py <process_id> <num_processes> <port> <out>

Forms a jax.distributed CPU cluster (2 virtual devices per process, gloo
collectives), runs the shared toy training problem with each process
feeding only its LOCAL batch slice, checks cross-process consistency, and
(process 0) dumps the resulting parameters for the in-process reference
comparison.
"""

import json
import os
import sys


def main():
    pid, nproc, port, out_dir = (int(sys.argv[1]), int(sys.argv[2]),
                                 int(sys.argv[3]), sys.argv[4])
    use_real_model = len(sys.argv) > 5 and sys.argv[5] == 'model'
    os.environ['JAX_PLATFORMS'] = 'cpu'

    import jax

    # The axon TPU plugin overrides env platform selection (see
    # tests/conftest.py) — pin CPU via config, then enable the gloo
    # cross-process CPU collectives BEFORE backend initialization.
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_num_cpu_devices', 2)
    jax.config.update('jax_cpu_collectives_implementation', 'gloo')
    jax.config.update('jax_threefry_partitionable', True)
    jax.distributed.initialize(coordinator_address=f'127.0.0.1:{port}',
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 2 * nproc, jax.devices()

    import numpy as np

    import _multihost_common as common
    from ddsp_piano_tpu.parallel import mesh as mesh_lib
    from ddsp_piano_tpu.training.trainer import Trainer

    if use_real_model:
        # Real tiny dafx22 train steps across processes: the full model
        # graph (GRU scans, oscillator, noise FIR, reverb FFT, losses)
        # under GSPMD with per-host batch shards. 0.3 s segments keep this
        # inside the default suite's budget (was DDSP_SLOW_TESTS-gated).
        # NOTE: no persistent compile cache here — when only one worker
        # hits the cache their wall times diverge past the distributed
        # shutdown barrier and the run dies with a barrier timeout
        # (observed; both-compile is slower but deterministic).
        from ddsp_piano_tpu.configs import get_model
        from ddsp_piano_tpu.data.pipeline import get_dummy_data

        model = get_model('dafx22', duration=0.3, n_synths=4)
        mesh = mesh_lib.get_mesh_for_batch(4)
        global_batch = get_dummy_data(batch_size=4, duration=0.3,
                                      sample_rate=16000, n_synths=4)
        local_batch = mesh_lib.slice_local_batch(global_batch)
        trainer = Trainer(model, mesh=mesh)
        state = trainer.init_state(jax.random.PRNGKey(0))
        for _ in range(2):
            state, losses = trainer.train_step(state, local_batch)
        trainer.check_pending()
        with open(os.path.join(out_dir, f'model_result_{pid}.json'),
                  'w') as f:
            json.dump({'total_loss': float(losses['total_loss']),
                       'step': int(state.step)}, f)
        print(f'worker {pid} MODEL OK', flush=True)
        return

    # Global mesh over all processes' devices; each host feeds its slice.
    mesh = mesh_lib.get_mesh_for_batch(common.GLOBAL_BATCH)
    assert mesh.devices.size == 2 * nproc
    global_batch = common.make_global_batch()
    local_batch = mesh_lib.slice_local_batch(global_batch)
    assert local_batch['x'].shape[0] == common.GLOBAL_BATCH // nproc

    trainer, state, losses = common.train_toy(Trainer, mesh, local_batch)

    # Loss is a replicated global scalar — identical on every process.
    final_loss = float(losses['total_loss'])

    # psum multi-process guard: host-local numpy must be refused.
    try:
        trainer.psum({'v': np.ones(3)})
        raise AssertionError('psum accepted host-local numpy input')
    except TypeError:
        pass

    # validation_step sync=True exercises the cross-process all-gather of
    # the sharded audio output back to every host.
    val_losses, audio = trainer.validation_step(state, local_batch)
    assert audio.shape[0] == common.GLOBAL_BATCH, audio.shape

    if pid == 0:
        params = jax.device_get(state.params)
        np.savez(os.path.join(out_dir, 'worker_params.npz'),
                 w=np.asarray(params['w']),
                 frozen=np.asarray(params['frozen']),
                 audio=np.asarray(audio))
        # Checkpoint write path (only the lead host writes).
        trainer.save(state, os.path.join(out_dir, 'ckpt'))
    with open(os.path.join(out_dir, f'result_{pid}.json'), 'w') as f:
        json.dump({'final_loss': final_loss,
                   'val_loss': val_losses['total_loss'],
                   'step': int(state.step)}, f)
    print(f'worker {pid} OK', flush=True)


if __name__ == '__main__':
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    main()
