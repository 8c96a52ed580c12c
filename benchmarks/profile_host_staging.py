"""Host-pipeline staging profile (VERDICT r2 item 8).

Where does the ~90 ms/step of host time in the cached-data train loop go?
Phases timed per step over the REAL cached pipeline (npz cache ->
segmentation -> shuffle -> collation -> Prefetcher) on the recipe shapes
(dafx22, b=6, 3 s):

  fetch  = next(prefetcher)                (host: segmentation+stack+GIL)
  stage  = shard_batch + block_until_ready (host->device transfer)
  step   = jitted train_step dispatch      (async; device runs behind)

Variants:
  A. as the CLI runs today: fetch -> stage -> dispatch
  B. double-buffered staging: batch N+1 is staged while step N runs
     on-device (the DevicePrefetcher candidate).

Run on the default (TPU) env. N>=60; first 8 steps discarded.

Usage: python benchmarks/profile_host_staging.py <npz_cache_dir>
(an npz cache produced by preprocess_maestro.py; any few-track cache
works — the round-3 numbers used a 2-track mini cache).
"""
import sys
import time

import numpy as np

from ddsp_piano_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

import jax

from ddsp_piano_tpu.configs import get_model
from ddsp_piano_tpu.data import pipeline
from ddsp_piano_tpu.parallel import mesh as mesh_lib
from ddsp_piano_tpu.training.trainer import Trainer

N_WARM, N = 8, 60
CACHE_DIR = sys.argv[1] if len(sys.argv) > 1 else '/tmp/mini_cache_r3'


def make_iter():
    ds = pipeline.get_training_dataset(
        CACHE_DIR, batch_size=6, duration=3.0,
        sample_rate=16000, frame_rate=250, max_polyphony=16)
    return pipeline.Prefetcher(ds, depth=4)


def main():
    model = get_model('dafx22', duration=3.0)
    mesh = mesh_lib.get_mesh_for_batch(1)
    trainer = Trainer(model, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))

    it = make_iter()

    # -- warmup (compile + prefetch fill)
    for _ in range(N_WARM):
        state, _ = trainer.train_step(state, next(it))
    jax.block_until_ready(state.tree()['params'])

    # -- variant A: today's loop, per-phase
    t_fetch = t_stage = t_step = 0.0
    wall0 = time.perf_counter()
    for _ in range(N):
        t0 = time.perf_counter()
        batch = next(it)
        t1 = time.perf_counter()
        staged = trainer.distribute_batch(batch)
        jax.block_until_ready(staged)
        t2 = time.perf_counter()
        state, _ = trainer.train_step(state, staged)
        t3 = time.perf_counter()
        t_fetch += t1 - t0
        t_stage += t2 - t1
        t_step += t3 - t2
    jax.block_until_ready(state.tree()['params'])
    wall_a = (time.perf_counter() - wall0) / N
    print('A (fetch->stage->dispatch): wall %.1f ms/step | fetch %.1f  '
          'stage %.1f  dispatch %.1f' % (
              1e3 * wall_a, 1e3 * t_fetch / N, 1e3 * t_stage / N,
              1e3 * t_step / N), flush=True)

    # -- variant B: double-buffered staging (stage N+1 while N computes)
    staged = trainer.distribute_batch(next(it))
    wall0 = time.perf_counter()
    for _ in range(N):
        state, _ = trainer.train_step(state, staged)     # async dispatch
        staged = trainer.distribute_batch(next(it))      # overlaps device
    jax.block_until_ready(state.tree()['params'])
    wall_b = (time.perf_counter() - wall0) / N
    print('B (double-buffered staging): wall %.1f ms/step' % (1e3 * wall_b),
          flush=True)

    # -- on-chip reference: same batch re-used, no host work
    batch0 = staged
    state, _ = trainer.train_step(state, batch0)
    jax.block_until_ready(state.tree()['params'])
    wall0 = time.perf_counter()
    for _ in range(N):
        state, _ = trainer.train_step(state, batch0)
    jax.block_until_ready(state.tree()['params'])
    print('C (no host work, steady batch): wall %.1f ms/step' % (
        1e3 * (time.perf_counter() - wall0) / N), flush=True)

    # -- variant D: double-buffered staging + NaN guard deferred to every
    #    16 steps (isolates the per-step check_pending device_get RTT).
    raw = trainer._train_step
    staged = trainer.distribute_batch(next(it))
    pending = None
    wall0 = time.perf_counter()
    for i in range(N):
        rng = jax.random.fold_in(jax.random.PRNGKey(17), state.step)
        new_tree, losses = raw(state.tree(), staged, rng)
        state = type(state).from_tree(new_tree)
        pending = losses
        staged = trainer.distribute_batch(next(it))
        if i % 16 == 15:
            jax.device_get(pending)
    jax.block_until_ready(state.tree()['params'])
    print('D (double-buffered + guard every 16): wall %.1f ms/step' % (
        1e3 * (time.perf_counter() - wall0) / N), flush=True)

    # -- variant F: the shipped implementation — trainer.device_prefetch
    #    feeding train_step with the default nan_check_interval=16 guard.
    it2 = trainer.device_prefetch(make_iter())
    for _ in range(4):
        state, _ = trainer.train_step(state, next(it2))
    jax.block_until_ready(state.tree()['params'])
    wall0 = time.perf_counter()
    for _ in range(N):
        state, _ = trainer.train_step(state, next(it2))
    jax.block_until_ready(state.tree()['params'])
    print('F (shipped: device_prefetch + interval-16 guard): '
          'wall %.1f ms/step' % (
              1e3 * (time.perf_counter() - wall0) / N), flush=True)

    # -- variant E: double-buffered + per-step guard on ONE packed array
    #    (device_get of a single stacked scalar vs a dict of scalars).
    import jax.numpy as jnp
    staged = trainer.distribute_batch(next(it))
    packed_prev = None
    wall0 = time.perf_counter()
    for i in range(N):
        rng = jax.random.fold_in(jax.random.PRNGKey(17), state.step)
        new_tree, losses = raw(state.tree(), staged, rng)
        state = type(state).from_tree(new_tree)
        packed = jnp.stack(list(losses.values()))
        staged = trainer.distribute_batch(next(it))
        if packed_prev is not None:
            jax.device_get(packed_prev)
        packed_prev = packed
    jax.block_until_ready(state.tree()['params'])
    print('E (double-buffered + packed per-step guard): wall %.1f ms/step'
          % (1e3 * (time.perf_counter() - wall0) / N), flush=True)


if __name__ == '__main__':
    main()
