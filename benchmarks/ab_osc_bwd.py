"""Interleaved A/B: oscillator BACKWARD kernel variants (round 5).

The round-5 backward attribution (benchmarks/profile_train_bwd.py, GRU
bwd kernel default-ON) puts the oscillator backward at ~7 ms of the
17.4 ms dafx22 backward — the #1 component. Two attacks, both exact or
gradient-precision (parity: benchmarks/parity_osc_bwd_variants.py):

- reduce='mxu': the five weighted up-axis reductions as two dot_generals
  against constant weight matrices — rides the idle MXU instead of ~10
  VPU ops/cell (the kernel is VPU-bound).
- trig='poly4' (DDSP_PIANO_TPU_TRIG_BWD): degree-4 sincos for gradient
  work only (~4e-5 rel grad delta; audio untouched).

Arms: full dafx22 train step with CHORDAL conditioning (dummy-data
uniform pitches sit below the min_frequency gate and silence the
additive path — profile_train_bwd.py note), plus an isolated bwd-kernel
µbench at the folded train shapes for the roofline attribution.

Protocol: _ab_common (env read at trace time; arms traced under their
own env; interleaved across reps in ONE process).
"""
import os
import time

import numpy as np

from _ab_common import jax, time_steps

import jax.numpy as jnp

from ddsp_piano_tpu.configs import get_model
from ddsp_piano_tpu.data.pipeline import get_dummy_data
from ddsp_piano_tpu.parallel import mesh as mesh_lib
from ddsp_piano_tpu.training.trainer import Trainer

ARMS = {
    'base': {'DDSP_PIANO_TPU_TRIG_BWD': 'poly',
             'DDSP_PIANO_TPU_OSC_BWD_REDUCE': 'vpu'},
    'mxu': {'DDSP_PIANO_TPU_TRIG_BWD': 'poly',
            'DDSP_PIANO_TPU_OSC_BWD_REDUCE': 'mxu'},
    'poly4': {'DDSP_PIANO_TPU_TRIG_BWD': 'poly4',
              'DDSP_PIANO_TPU_OSC_BWD_REDUCE': 'vpu'},
    'both': {'DDSP_PIANO_TPU_TRIG_BWD': 'poly4',
             'DDSP_PIANO_TPU_OSC_BWD_REDUCE': 'mxu'},
}


def chordal_batch(batch_size=6, duration=3.0, sample_rate=16000):
    batch = get_dummy_data(batch_size=batch_size, duration=duration,
                           sample_rate=sample_rate)
    cond = np.zeros_like(batch['conditioning'])
    n_frames = cond.shape[1]
    for v in range(cond.shape[2]):
        if v % 2 == 0:
            cond[:, 10:, v, 0] = 40.0 + 3.0 * v
            cond[:, 10:30, v, 1] = 0.7
    batch['conditioning'] = cond
    return batch


def build_arm(env):
    os.environ.update(env)
    model = get_model('dafx22', duration=3.0)
    trainer = Trainer(model, mesh=mesh_lib.get_mesh_for_batch(1))
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = trainer.distribute_batch(chordal_batch())
    state, _ = trainer.train_step(state, batch)     # trace under env
    jax.block_until_ready(state.tree()['params'])
    return trainer, state, batch


def kernel_controls():
    """Folded dafx22 train-shape controls (96, 750, 192), harmonic-major
    substring fold, half the voices active — the skip distribution the
    real step sees."""
    rng = np.random.RandomState(3)
    b, nf, n_harm, n_sub, up, sr = 96, 750, 96, 2, 64, 16000
    k = n_harm * n_sub
    f_lo = np.zeros((b, nf, k), np.float32)
    for vb in range(b):
        voice = vb % 16
        if voice % 2:
            continue                                 # inactive voice
        midi = 40.0 + 3.0 * voice
        f0 = 440.0 * 2.0 ** ((midi - 69.0) / 12.0)
        harm = np.repeat(np.arange(1, n_harm + 1, dtype=np.float32), n_sub)
        detune = np.tile(np.float32([1.0, 1.003]), n_harm)
        f_lo[vb, 10:] = f0 * harm * detune
    f_hi = f_lo * 1.0005
    a_lo = np.where(f_lo > 0,
                    rng.uniform(0, 0.05, f_lo.shape), 0).astype(np.float32)
    a_hi = np.where(f_lo > 0,
                    rng.uniform(0, 0.05, f_lo.shape), 0).astype(np.float32)
    phase0 = rng.uniform(-np.pi, np.pi, f_lo.shape).astype(np.float32)
    g = rng.randn(b, nf * up).astype(np.float32)
    return tuple(map(jnp.asarray, (f_lo, f_hi, a_lo, a_hi, phase0))), \
        jnp.asarray(g), up, sr


def kernel_bench(n_iters=100, reps=4):
    from ddsp_piano_tpu.kernels.oscillator_pallas import (
        render_framewise_pallas_skip_vjp)
    from ddsp_piano_tpu.ops.oscillator import FramewiseOscControls

    (f_lo, f_hi, a_lo, a_hi, phase0), g, up, sr = kernel_controls()
    controls = FramewiseOscControls(f_lo, f_hi, a_lo, a_hi, phase0)
    variants = {'base': ('poly', 'vpu'), 'mxu': ('poly', 'mxu'),
                'poly4': ('poly4', 'vpu'), 'both': ('poly4', 'mxu')}
    fns = {}
    for name, (trig, red) in variants.items():
        fn = lambda c, gg, t=trig, r=red: render_framewise_pallas_skip_vjp(
            c, gg, up, sr, False, t, r)
        jax.block_until_ready(fn(controls, g))       # compile
        fns[name] = fn
    best = {k: float('inf') for k in fns}
    for _ in range(reps):
        for name, fn in fns.items():
            out = fn(controls, g)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(n_iters):
                out = fn(controls, g)
            jax.block_until_ready(out)
            best[name] = min(best[name],
                             (time.perf_counter() - t0) / n_iters * 1e3)
    print('isolated bwd kernel (ms, best-of, incl ~0.35 dispatch):',
          {k: round(v, 3) for k, v in best.items()}, flush=True)


def main():
    kernel_bench()
    arms = {name: build_arm(env) for name, env in ARMS.items()}
    results = {k: [] for k in arms}
    for rep in range(6):
        line = f'rep {rep}:'
        for name, arm in arms.items():
            ms, _ = time_steps(*arm)
            results[name].append(ms)
            line += f'  {name} {ms:.1f} ms'
        print(line, flush=True)
    print('median:', {k: round(sorted(v)[len(v) // 2], 2)
                      for k, v in results.items()}, flush=True)


if __name__ == '__main__':
    main()
