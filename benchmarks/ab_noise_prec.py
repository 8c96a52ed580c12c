"""A/B the shipped noise-linmap einsum precision: HIGHEST vs bf16x3 vs bf16.

LINMAP_PRECISION is HIGHEST (exact f32) by default. The VERDICT r3 noise
candidates include a bf16 pass over the DFT-as-matmul chain: the filtered
noise is perceptually noise, so 3 lost digits may be free — but parity is
REPORTED here, not assumed, and any default flip must be golden-safe
(golden runs on CPU where einsum precision is moot).

Each arm patches filters.LINMAP_PRECISION before tracing (trace-time
constant), then the timing blocks interleave in ONE process (CLAUDE.md
protocol). No RNG in the arms so numbers are comparable with
ab_noise_fft_shipped.py / ab_noise_linmap.py (round 4).

Usage: python benchmarks/ab_noise_prec.py [n_iters] [reps]
"""
import sys
import time

from _ab_common import jax  # noqa: F401

import jax.numpy as jnp
import numpy as np

from ddsp_piano_tpu.ops import filters

B, N_FRAMES, N_BANDS = 16, 1000, 96
UP = 96
N = N_FRAMES * UP
WINDOW = 257

PRECS = {
    'highest': jax.lax.Precision.HIGHEST,
    'high': jax.lax.Precision.HIGH,
    'default': jax.lax.Precision.DEFAULT,
}


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.uniform(-1, 1, (B, N)).astype(np.float32))
    mags = jnp.asarray(
        (0.1 * rng.rand(B, N_FRAMES, N_BANDS)).astype(np.float32))

    arms, outs = {}, {}
    orig = filters.LINMAP_PRECISION
    try:
        for name, prec in PRECS.items():
            filters.LINMAP_PRECISION = prec
            fn = jax.jit(lambda a, m: filters.frequency_filter(
                a, m, window_size=WINDOW, method='linmap'))
            out = fn(audio, mags)
            jax.block_until_ready(out)
            arms[name] = fn
            outs[name] = np.asarray(out)
    finally:
        filters.LINMAP_PRECISION = orig

    peak = np.abs(outs['highest']).max()
    for name in ('high', 'default'):
        err = np.abs(outs[name] - outs['highest']).max() / peak
        print(f'parity {name}-vs-highest: {err:.2e} of peak')

    best = {k: float('inf') for k in arms}
    for _ in range(reps):
        for name, fn in arms.items():
            out = fn(audio, mags)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(n_iters):
                out = fn(audio, mags)
            jax.block_until_ready(out)
            best[name] = min(best[name],
                             (time.perf_counter() - t0) / n_iters * 1e3)
    for k, v in best.items():
        print(f'{k:<9} {v:8.4f} ms')


if __name__ == '__main__':
    main()
