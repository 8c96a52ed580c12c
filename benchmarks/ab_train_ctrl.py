"""Interleaved A/B: dafx22 train step (b=6, 3 s recipe shapes) with the
control-path Pallas kernels ON vs OFF.

NOTE: under jax.grad the ctrl kernels' custom_jvp rule defers BOTH primal
and tangent to the reference lax.scan (gru_pallas._gru_grad), so the two
arms linearize the *same* program and the expected delta is ZERO. This
script is a double-pay detector, not a speedup measurement: the earlier
custom_vjp routing cost +2 ms/step (kernel forward + full scan recompute
in the backward) and this harness is what caught it. Any nonzero delta
here is either relay noise or a regression in the AD routing.

Env flags are read at TRACE time, so each jitted step is built under its
own env setting (two Trainer instances, traced eagerly before the timing
loop)."""
import os
import time

from ddsp_piano_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

import jax

from ddsp_piano_tpu.configs import get_model
from ddsp_piano_tpu.data.pipeline import get_dummy_data
from ddsp_piano_tpu.parallel import mesh as mesh_lib
from ddsp_piano_tpu.training.trainer import Trainer

N = 30


def build(ctrl: str):
    os.environ['DDSP_PIANO_TPU_PALLAS_CTRL'] = ctrl
    model = get_model('dafx22', duration=3.0)
    trainer = Trainer(model, mesh=mesh_lib.get_mesh_for_batch(1))
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = get_dummy_data(batch_size=6, duration=3.0, sample_rate=16000)
    batch = trainer.distribute_batch(batch)
    state, _ = trainer.train_step(state, batch)   # trace+compile NOW
    jax.block_until_ready(state.tree()['params'])
    return trainer, state, batch


def run(trainer, state, batch):
    t0 = time.perf_counter()
    for _ in range(N):
        state, _ = trainer.train_step(state, batch)
    jax.block_until_ready(state.tree()['params'])
    return (time.perf_counter() - t0) / N * 1e3, state


def main():
    on = build('1')
    off = build('0')
    on_ms = []
    off_ms = []
    for rep in range(6):
        ms, _ = run(*on)
        on_ms.append(ms)
        ms, _ = run(*off)
        off_ms.append(ms)
        print('rep %d: ctrl_on %.1f ms  ctrl_off %.1f ms'
              % (rep, on_ms[-1], off_ms[-1]), flush=True)
    print('median: ctrl_on %.1f ms  ctrl_off %.1f ms'
          % (sorted(on_ms)[len(on_ms) // 2],
             sorted(off_ms)[len(off_ms) // 2]), flush=True)


if __name__ == '__main__':
    main()
