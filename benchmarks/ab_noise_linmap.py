"""A/B: noise-path linmap filtering variants at the v2 bench shapes.

The linmap chain is HBM-traffic-bound (round-4 profile: ~0.32 ms in the
matmuls while precision changes are timing-neutral), and its pow2
fft_size=512 carries 257 frequency bins where the 285-sample linear
convolution only needs ceil(288/2)+1 = 145 — the DFT-as-matmul path has no
pow2 constraint, so a compact 288-point transform moves ~45 % less
spectrum traffic. Arms (all exact rewrites up to float reassociation):

  base      — current _frequency_filter_linmap (fft 512, 6 einsums)
  compact   — same chain at fft_size 288 (bins 145)
  compactf  — fft 288 + the 6 einsums fused into 3 (re/im concatenated)

Interleaved best-of-reps in one process, N>=100 (CLAUDE.md protocol).
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


def make_constants(fft_size):
    frame_size = UP
    basis = np.asarray(jax.jit(
        lambda: filters.frequency_impulse_response(
            jnp.eye(N_BANDS, dtype=jnp.float32), window_size=WINDOW))())
    ir_size = basis.shape[-1]
    conv_size = frame_size + ir_size - 1
    assert fft_size >= conv_size, (fft_size, conv_size)
    bf = np.fft.rfft(basis, n=fft_size, axis=-1)
    w = np.fft.rfft(np.eye(frame_size, dtype=np.float32), n=fft_size,
                    axis=-1)
    n_freqs = fft_size // 2 + 1
    inv = np.ascontiguousarray(np.fft.irfft(
        np.eye(n_freqs, dtype=np.complex64), n=fft_size,
        axis=-1)[:, :conv_size].astype(np.float32))
    inv_im = np.ascontiguousarray(np.fft.irfft(
        1j * np.eye(n_freqs, dtype=np.complex64), n=fft_size,
        axis=-1)[:, :conv_size].astype(np.float32))
    return dict(
        b_re=bf.real.astype(np.float32), b_im=bf.imag.astype(np.float32),
        w_re=w.real.astype(np.float32), w_im=w.imag.astype(np.float32),
        inv=inv, inv_im=inv_im, ir_size=ir_size, conv_size=conv_size)


def linmap_variant(consts, fused):
    hi = filters.LINMAP_PRECISION
    ir_size = consts['ir_size']
    if fused:
        w2 = np.concatenate([consts['w_re'], consts['w_im']], axis=1)
        b2 = np.concatenate([consts['b_re'], consts['b_im']], axis=1)
        inv2 = np.concatenate([consts['inv'], consts['inv_im']], axis=0)
        nf = consts['w_re'].shape[1]

    def run(audio, mags):
        af = audio.reshape(B, N_FRAMES, UP)
        if fused:
            a2 = jnp.einsum('btj,jf->btf', af, w2, precision=hi)
            i2 = jnp.einsum('btk,kf->btf', mags, b2, precision=hi)
            a_re, a_im = a2[..., :nf], a2[..., nf:]
            ir_re, ir_im = i2[..., :nf], i2[..., nf:]
            p2 = jnp.concatenate([a_re * ir_re - a_im * ir_im,
                                  a_re * ir_im + a_im * ir_re], axis=-1)
            out_frames = jnp.einsum('btf,fm->btm', p2, inv2, precision=hi)
        else:
            ir_re = jnp.einsum('btk,kf->btf', mags, consts['b_re'],
                               precision=hi)
            ir_im = jnp.einsum('btk,kf->btf', mags, consts['b_im'],
                               precision=hi)
            a_re = jnp.einsum('btj,jf->btf', af, consts['w_re'],
                              precision=hi)
            a_im = jnp.einsum('btj,jf->btf', af, consts['w_im'],
                              precision=hi)
            p_re = a_re * ir_re - a_im * ir_im
            p_im = a_re * ir_im + a_im * ir_re
            out_frames = (
                jnp.einsum('btf,fm->btm', p_re, consts['inv'], precision=hi)
                + jnp.einsum('btf,fm->btm', p_im, consts['inv_im'],
                             precision=hi))
        out = filters.overlap_and_add(out_frames, UP)
        return filters.crop_and_compensate_delay(out, N, ir_size, 'same', -1)

    return run


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.uniform(-1, 1, (B, N)).astype(np.float32))
    mags = jnp.asarray(
        (0.1 * rng.rand(B, N_FRAMES, N_BANDS)).astype(np.float32))

    c512 = make_constants(512)
    c288 = make_constants(288)
    arms = {
        'base512': jax.jit(lambda a, m: filters.frequency_filter(
            a, m, window_size=WINDOW, method='linmap')),
        'compact288': jax.jit(linmap_variant(c288, fused=False)),
        'compactf288': jax.jit(linmap_variant(c288, fused=True)),
        'fused512': jax.jit(linmap_variant(c512, fused=True)),
    }

    ref = np.asarray(arms['base512'](audio, mags))
    peak = np.abs(ref).max()
    for name, fn in arms.items():
        got = np.asarray(fn(audio, mags))
        err = np.abs(got - ref).max() / peak
        print(f'parity {name}: {err:.2e} of peak')
        assert err < 1e-5, (name, err)

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
        print(f'{k:<12} {v:8.4f} ms')


if __name__ == '__main__':
    main()
