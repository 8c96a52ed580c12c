"""Staging roofline for the end-to-end train step (VERDICT r4 item 1c).

Round-5 bench: train_step_onchip 28.05 ms but train_cli 53.3 / scan10
54.6 / restaged 55.3 ms — ~25 ms/step of host->device staging is NOT
hiding behind compute despite device_prefetch. This probe decides whether
that is (a) relay transfer bandwidth (bytes-bound: the 1.8 MB batch at
~70 MB/s), (b) a serialization artifact (device_put cannot overlap an
in-flight step through the relay), or (c) protocol noise.

Arms (interleaved, one process, dafx22 recipe shapes b=6, 3 s):
  put_only      device_put(batch) + block, per-batch ms  -> bandwidth
  put_sizes     device_put bandwidth at 0.45/1.8/7.2 MB  -> latency vs bw
  step_only     train_step on a pre-staged batch (on-chip floor)
  serial        stage then step, blocked between          (no overlap)
  overlap       dispatch step N (async), stage batch N+1, block both
                -> if ~= serial, the relay serializes transfers vs compute
  compact       stage audio as int16 + conditioning/pedal as f16, convert
                on device inside a jitted widen step; same overlap loop
                (0.93 MB instead of 1.8 MB on the wire)

Reference hot path being modeled: /root/reference/train_single_phase.py
lines 182-187 (tf.data prefetch + strategy.run).

Usage: python benchmarks/profile_relay_staging.py [N]
Run on the default (TPU) env; results meaningless on CPU.
"""
import sys
import time

import numpy as np

from ddsp_piano_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from ddsp_piano_tpu.configs import get_model
from ddsp_piano_tpu.data.pipeline import get_dummy_data
from ddsp_piano_tpu.training.trainer import Trainer

N = int(sys.argv[1]) if len(sys.argv) > 1 else 40
REPS = 4


def med(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def batch_bytes(b):
    return sum(np.asarray(v).nbytes for v in b.values())


def compact_host(batch):
    """Host-side compact encoding: audio int16, float conditioning f16."""
    out = {}
    for k, v in batch.items():
        a = np.asarray(v)
        if k == 'audio':
            out[k] = np.clip(a * 32767.0, -32768, 32767).astype(np.int16)
        elif a.dtype == np.float32:
            out[k] = a.astype(np.float16)
        else:
            out[k] = a
    return out


def main():
    model = get_model('dafx22', duration=3.0)
    trainer = Trainer(model, learning_rate=1e-3, first_phase=True)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = get_dummy_data(batch_size=6, duration=3.0, sample_rate=16000)
    nbytes = batch_bytes(batch)
    print(f'batch bytes: {nbytes/1e6:.3f} MB', flush=True)

    # Production-provenance values so the packed arms hit the 16-bit wire
    # lanes (audio int16/32768, conditioning [pitch, vel/127], pedal 0/1 —
    # what the real pipeline emits; tests/test_trainer.py pins this).
    batch = dict(batch)
    batch['audio'] = (np.round(np.asarray(batch['audio']) * 32768.0)
                      .clip(-32768, 32767).astype(np.float32)
                      / np.float32(32768.0))
    cond = np.asarray(batch['conditioning'])
    batch['conditioning'] = np.stack(
        [np.round(cond[..., 0] * 87 + 21).astype(np.float32),
         np.round(cond[..., 1] * 127).astype(np.float32)
         / np.float32(127.0)], axis=-1)
    batch['pedal'] = np.round(np.asarray(batch['pedal'])).astype(np.float32)

    # distinct host arrays per step, like tf.data (defeats caching)
    hosts = [{k: np.array(v) for k, v in batch.items()} for _ in range(4)]
    c_hosts = [compact_host(h) for h in hosts]
    c_bytes = batch_bytes(c_hosts[0])
    print(f'compact batch bytes: {c_bytes/1e6:.3f} MB', flush=True)

    @jax.jit
    def widen(cb):
        out = dict(cb)
        out['audio'] = cb['audio'].astype(jnp.float32) / 32767.0
        for k in ('conditioning', 'pedal'):
            out[k] = cb[k].astype(jnp.float32)
        return out

    # warmup/compiles
    staged = trainer.distribute_batch(hosts[0])
    state, _ = trainer.train_step(state, staged)
    w = widen(trainer.distribute_batch(c_hosts[0]))
    state, _ = trainer.train_step(state, w)
    pk = trainer.pack_batch(hosts[0])
    state, _ = trainer.train_step(state, pk)  # packed-program compile
    jax.block_until_ready(state.params)

    results = {k: [] for k in
               ('put_only', 'step_only', 'serial', 'overlap',
                'compact_put', 'compact_overlap',
                'packed_put', 'packed_overlap')}
    for rep in range(REPS):
        # put_only
        t0 = time.perf_counter()
        for i in range(N):
            d = trainer.distribute_batch(hosts[i % 4])
        jax.block_until_ready(d)
        results['put_only'].append((time.perf_counter() - t0) / N * 1e3)

        # step_only (pre-staged)
        t0 = time.perf_counter()
        for _ in range(N):
            state, _ = trainer.train_step(state, staged)
        jax.block_until_ready(state.params)
        results['step_only'].append((time.perf_counter() - t0) / N * 1e3)

        # serial: stage (blocked) then step
        t0 = time.perf_counter()
        for i in range(N):
            d = trainer.distribute_batch(hosts[i % 4])
            jax.block_until_ready(d)
            state, _ = trainer.train_step(state, d)
        jax.block_until_ready(state.params)
        results['serial'].append((time.perf_counter() - t0) / N * 1e3)

        # overlap: dispatch step N, stage N+1 while it runs
        d = trainer.distribute_batch(hosts[0])
        t0 = time.perf_counter()
        for i in range(N):
            state, _ = trainer.train_step(state, d)   # async dispatch
            d = trainer.distribute_batch(hosts[(i + 1) % 4])
        jax.block_until_ready(state.params)
        results['overlap'].append((time.perf_counter() - t0) / N * 1e3)

        # compact put
        t0 = time.perf_counter()
        for i in range(N):
            d = trainer.distribute_batch(c_hosts[i % 4])
        jax.block_until_ready(d)
        results['compact_put'].append((time.perf_counter() - t0) / N * 1e3)

        # compact overlap: stage compact, widen on device, step
        d = widen(trainer.distribute_batch(c_hosts[0]))
        t0 = time.perf_counter()
        for i in range(N):
            state, _ = trainer.train_step(state, d)
            d = widen(trainer.distribute_batch(c_hosts[(i + 1) % 4]))
        jax.block_until_ready(state.params)
        results['compact_overlap'].append(
            (time.perf_counter() - t0) / N * 1e3)

        # packed put: whole batch as ONE (b, width) f32 device_put
        # (training/staging.py — the train CLI's --staging packed default)
        t0 = time.perf_counter()
        for i in range(N):
            d = trainer.pack_batch(hosts[i % 4])
        jax.block_until_ready(d)
        results['packed_put'].append((time.perf_counter() - t0) / N * 1e3)

        # packed overlap: dispatch packed step N, pack+stage N+1
        d = trainer.pack_batch(hosts[0])
        t0 = time.perf_counter()
        for i in range(N):
            state, _ = trainer.train_step(state, d)
            d = trainer.pack_batch(hosts[(i + 1) % 4])
        jax.block_until_ready(state.params)
        results['packed_overlap'].append(
            (time.perf_counter() - t0) / N * 1e3)
        print(f'rep {rep}: ' + '  '.join(
            f'{k} {v[-1]:.2f}' for k, v in results.items()), flush=True)

    print()
    for k, v in results.items():
        print(f'{k:16s} med {med(v):7.2f} ms  (min {min(v):.2f} '
              f'max {max(v):.2f})', flush=True)
    put = med(results['put_only'])
    print(f'\nimplied relay staging bandwidth: '
          f'{nbytes/1e6/put*1e3:.1f} MB/s (full) / '
          f'{c_bytes/1e6/med(results["compact_put"])*1e3:.1f} MB/s '
          f'(compact)', flush=True)

    # size sweep for latency-vs-bandwidth split
    for mb, arr in (
            (0.45, np.zeros((6, 12000), np.float32)),
            (1.8, np.zeros((6, 48000), np.float32)),
            (7.2, np.zeros((6, 192000), np.float32))):
        copies = [arr + i for i in range(4)]
        jax.block_until_ready(jax.device_put(copies[0]))
        walls = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            for i in range(N):
                d = jax.device_put(copies[i % 4])
            jax.block_until_ready(d)
            walls.append((time.perf_counter() - t0) / N * 1e3)
        m = med(walls)
        print(f'device_put {mb:4.2f} MB: {m:6.2f} ms '
              f'({mb/m*1e3:6.1f} MB/s)', flush=True)


if __name__ == '__main__':
    main()
