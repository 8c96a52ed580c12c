"""Probe: uniform-noise generation cost by PRNG impl at the v2 shapes.

The round-4 noise-stage decomposition (profile_noise_stage.py) put the
(16, 96000) uniform draw at ~0.2 ms real (0.556 ms isolated minus the
~0.35 ms dispatch floor) — the single largest item in the 0.82 ms noise
stage. Threefry is ~10 VPU rounds per 32-bit word; TPU has a hardware
RNG that `rbg`/`unsafe_rbg` use directly.

Arms (each its own jitted program, interleaved):
  threefry  — jax.random.uniform with the default (partitionable) impl
  rbg       — same draw from an rbg key derived from the threefry key
  none      — zeros_like placeholder (floor reference)

Usage: python benchmarks/profile_noise_rng.py [n_iters] [reps]
"""
import sys
import time

from _ab_common import jax  # noqa: F401

import jax.numpy as jnp
import numpy as np

B, N = 16, 96000


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    base_key = jax.random.PRNGKey(7)

    @jax.jit
    def draw_threefry(key):
        return jax.random.uniform(key, (B, N), jnp.float32, -1.0, 1.0)

    @jax.jit
    def draw_rbg(key):
        data = jax.random.key_data(key)            # (2,) uint32
        rbg_key = jax.random.wrap_key_data(
            jnp.concatenate([data, data]), impl='rbg')
        return jax.random.uniform(rbg_key, (B, N), jnp.float32, -1.0, 1.0)

    @jax.jit
    def draw_none(key):
        return jnp.zeros((B, N), jnp.float32) + key[0].astype(jnp.float32)

    arms = {'threefry': draw_threefry, 'rbg': draw_rbg, 'none': draw_none}
    for name, fn in arms.items():
        out = fn(base_key)
        jax.block_until_ready(out)
        if name != 'none':
            a = np.asarray(out)
            print(f'{name}: mean {a.mean():+.4f} std {a.std():.4f} '
                  f'min {a.min():+.3f} max {a.max():+.3f}')

    best = {k: float('inf') for k in arms}
    for _ in range(reps):
        for name, fn in arms.items():
            out = fn(base_key)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(n_iters):
                out = fn(base_key)
            jax.block_until_ready(out)
            best[name] = min(best[name],
                             (time.perf_counter() - t0) / n_iters * 1e3)
    for k, v in best.items():
        print(f'{k:<9} {v:8.4f} ms  (incl ~0.35 dispatch floor)')


if __name__ == '__main__':
    main()
