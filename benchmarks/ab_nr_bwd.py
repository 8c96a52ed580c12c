"""Interleaved A/B: dafx22 train step with the round-4 Pallas NoteRelease
BACKWARD kernel ON vs OFF (off = round-3 custom_jvp routing: jax.grad
linearizes the reference scan natively). Both arms keep the GRU backward
kernel ON (its A/B lives in ab_ctrl_bwd.py).

Also spot-checks NR gradient parity on the real TPU at the folded train
shapes before timing.

Protocol: benchmarks/_ab_common.py (each arm traced under its own env,
arms interleaved across reps in one process)."""
import numpy as np

from _ab_common import build_train_arm, time_steps, jax

import jax.numpy as jnp


def parity_check():
    from ddsp_piano_tpu.kernels import gru_pallas as gp

    rng = np.random.RandomState(9)
    T, B = 750, 96  # folded dafx22 train shapes (16 voices x b=6)
    x = np.zeros((T, B, 1), np.float32)
    for b in range(B):
        for s in range(0, 700, 90 + (b % 7) * 10):
            x[s:s + 40, b, 0] = rng.randint(25, 95)
    x = jnp.asarray(x)
    threshold = jnp.asarray([0.3 * 250.0], jnp.float32)
    s0 = jnp.zeros((B, 2), jnp.float32)
    g_out = jnp.asarray(rng.randn(T, B, 1).astype(np.float32))
    g_state = jnp.asarray(rng.randn(B, 2).astype(np.float32))

    out, final, steps = gp.note_release_scan_pallas_res(x, threshold, s0)
    prev = jnp.concatenate([s0[:, 0][jnp.newaxis], out[:-1, :, 0]], axis=0)
    got = gp.note_release_scan_pallas_bwd(x, threshold, prev, steps,
                                          g_out, g_state)
    want = jax.jit(gp._note_release_reference_vjp)(x, threshold, s0,
                                                   g_out, g_state)
    for name, a, b in zip(('dx', 'dthr', 'ds0'), got, want):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        err = np.abs(a - b).max() / scale
        print(f'parity {name}: rel max err {err:.2e}')


def main():
    parity_check()
    arms = {
        'nr_bwd_on': build_train_arm(
            {'DDSP_PIANO_TPU_PALLAS_CTRL': '1',
             'DDSP_PIANO_TPU_PALLAS_CTRL_BWD': '1',
             'DDSP_PIANO_TPU_PALLAS_NR_BWD': '1'})[:3],
        'nr_bwd_off': build_train_arm(
            {'DDSP_PIANO_TPU_PALLAS_CTRL': '1',
             'DDSP_PIANO_TPU_PALLAS_CTRL_BWD': '1',
             'DDSP_PIANO_TPU_PALLAS_NR_BWD': '0'})[:3],
    }
    results = {k: [] for k in arms}
    for rep in range(6):
        line = f'rep {rep}:'
        for name, arm in arms.items():
            ms, _ = time_steps(*arm)
            results[name].append(ms)
            line += f'  {name} {ms:.1f} ms'
        print(line, flush=True)
    print('median:', {k: round(sorted(v)[len(v) // 2], 1)
                      for k, v in results.items()}, flush=True)


if __name__ == '__main__':
    main()
