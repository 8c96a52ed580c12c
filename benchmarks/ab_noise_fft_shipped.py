"""A/B the SHIPPED noise-filter mm branch: min+fused vs pow2 revert.

ab_noise_linmap.py measured hand-rolled variants; this script times the
real `filters.frequency_filter(..., method='linmap')` under each
DDSP_PIANO_TPU_NOISE_FFT setting (trace-time env read: each arm is traced
under its own env in ONE process, then the timing blocks interleave —
CLAUDE.md protocol). No RNG in the arms, matching ab_noise_linmap.py's
protocol so numbers are directly comparable (base512 0.727 /
compactf288 0.634 ms hand-rolled, round 4).
"""
import os
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


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.uniform(-1, 1, (B, N)).astype(np.float32))
    mags = jnp.asarray(
        (0.1 * rng.rand(B, N_FRAMES, N_BANDS)).astype(np.float32))

    def traced_arm(env_value):
        os.environ['DDSP_PIANO_TPU_NOISE_FFT'] = env_value
        fn = jax.jit(lambda a, m: filters.frequency_filter(
            a, m, window_size=WINDOW, method='linmap'))
        out = fn(audio, mags)              # trace+compile under this env
        jax.block_until_ready(out)
        return fn, np.asarray(out)

    fn_min, out_min = traced_arm('min')
    fn_pow2, out_pow2 = traced_arm('pow2')

    # Isolation arms (round 4): the shipped fused-min measured 0.727 ms
    # vs 0.634 for ab_noise_linmap.py's hand-rolled fused-288 — separate
    # the fft-size effect (285 vs 288, in-trace constants both) from the
    # constant-materialization effect (in-trace jnp.fft constants vs
    # numpy host constants, both at 285).
    orig = filters._mm_fft_size
    filters._mm_fft_size = lambda fs, ir: -(-(fs + ir - 1) // 8) * 8  # 288
    try:
        fn_288, out_288 = traced_arm('min')
    finally:
        filters._mm_fft_size = orig

    def np_fused_285():
        basis = np.asarray(jax.jit(
            lambda: filters.frequency_impulse_response(
                jnp.eye(N_BANDS, dtype=jnp.float32), window_size=WINDOW))())
        ir_size = basis.shape[-1]
        conv = UP + ir_size - 1
        fft_size = conv
        bf = np.fft.rfft(basis, n=fft_size, axis=-1)
        w = np.fft.rfft(np.eye(UP, dtype=np.float32), n=fft_size, axis=-1)
        nf = fft_size // 2 + 1
        inv = np.fft.irfft(np.eye(nf, dtype=np.complex64), n=fft_size,
                           axis=-1)[:, :conv].astype(np.float32)
        inv_im = np.fft.irfft(1j * np.eye(nf, dtype=np.complex64),
                              n=fft_size, axis=-1)[:, :conv].astype(
                                  np.float32)
        w2 = np.concatenate([w.real, w.imag], 1).astype(np.float32)
        b2 = np.concatenate([bf.real, bf.imag], 1).astype(np.float32)
        inv2 = np.concatenate([inv, inv_im], 0)
        hi = filters.LINMAP_PRECISION

        def run(a, m):
            af = a.reshape(B, N_FRAMES, UP)
            a2 = jnp.einsum('btj,jf->btf', af, w2, precision=hi)
            i2 = jnp.einsum('btk,kf->btf', m, b2, precision=hi)
            a_re, a_im = a2[..., :nf], a2[..., nf:]
            ir_re, ir_im = i2[..., :nf], i2[..., nf:]
            p2 = jnp.concatenate([a_re * ir_re - a_im * ir_im,
                                  a_re * ir_im + a_im * ir_re], -1)
            of = jnp.einsum('btf,fm->btm', p2, inv2, precision=hi)
            out = filters.overlap_and_add(of, UP)
            return filters.crop_and_compensate_delay(out, N, ir_size,
                                                     'same', -1)
        return jax.jit(run)

    fn_np285 = np_fused_285()
    out_np285 = np.asarray(fn_np285(audio, mags))
    jax.block_until_ready(out_np285)

    peak = np.abs(out_pow2).max()
    for name, got in [('min', out_min), ('288', np.asarray(out_288)),
                      ('np285', out_np285)]:
        err = np.abs(got - out_pow2).max() / peak
        print(f'parity {name}-vs-pow2: {err:.2e} of peak')
        assert err < 1e-5, (name, err)

    arms = {'shipped_min_fused': fn_min, 'shipped_288': fn_288,
            'np_consts_285': fn_np285, 'pow2_revert': fn_pow2}
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
        print(f'{k:<18} {v:8.4f} ms')


if __name__ == '__main__':
    main()
