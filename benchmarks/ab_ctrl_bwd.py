"""Interleaved A/B: dafx22 train step with the round-4 Pallas GRU
BACKWARD kernel ON vs OFF (off = round-3 custom_jvp routing, where
jax.grad linearizes the reference scan natively) vs all-scan.

Also spot-checks gradient parity on the real TPU at the mono-GRU train
shapes before timing.

Protocol: benchmarks/_ab_common.py (each arm traced under its own env,
arms interleaved across reps in one process)."""
import numpy as np

from _ab_common import build_train_arm, time_steps, jax

import jax.numpy as jnp


def parity_check():
    from ddsp_piano_tpu.kernels import gru_pallas as gp

    rng = np.random.RandomState(5)
    B, T, U = 96, 750, 192
    x_proj = jnp.asarray(rng.randn(T, B, 3 * U).astype(np.float32) * 0.3)
    rec_k = jnp.asarray(rng.randn(U, 3 * U).astype(np.float32) * 0.1)
    rec_b = jnp.asarray(rng.randn(3 * U).astype(np.float32) * 0.1)
    h0 = jnp.zeros((B, U), jnp.float32)
    g = jnp.asarray(rng.randn(T, B, U).astype(np.float32))
    bt = gp._gru_bwd_vmem_bt(B, U)
    print(f'bwd kernel time block at (B={B}, U={U}): {bt}'
          f'{"  (FALLBACK to scan VJP!)" if bt is None else ""}')
    hs = gp.gru_scan_pallas(x_proj, rec_k, rec_b, h0)
    got = gp.gru_scan_pallas_bwd(x_proj, rec_k, rec_b, h0, hs, g)
    want = jax.jit(gp._gru_reference_vjp)(x_proj, rec_k, rec_b, h0, g)
    for name, a, b in zip(('dx', 'dk', 'db', 'dh0'), got, want):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        err = np.abs(a - b).max() / scale
        print(f'parity {name}: rel max err {err:.2e} '
              f'(scan VJP at TPU-default matmul precision)')


def main():
    parity_check()
    arms = {
        'bwd_on': build_train_arm({'DDSP_PIANO_TPU_PALLAS_CTRL': '1',
                                   'DDSP_PIANO_TPU_PALLAS_CTRL_BWD': '1'}
                                  )[:3],
        'bwd_off': build_train_arm({'DDSP_PIANO_TPU_PALLAS_CTRL': '1',
                                    'DDSP_PIANO_TPU_PALLAS_CTRL_BWD': '0'}
                                   )[:3],
        'scan': build_train_arm({'DDSP_PIANO_TPU_PALLAS_CTRL': '0',
                                 'DDSP_PIANO_TPU_PALLAS_CTRL_BWD': '0'}
                                )[:3],
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
