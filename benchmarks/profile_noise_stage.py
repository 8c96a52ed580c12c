"""Decompose the noise-synth stage and A/B the DFT-matmul fft_size.

Round-4 follow-up to VERDICT r3 item 1 (noise half): stage_inc_noise_ms
is 0.823 of the 3.162 ms v2 forward and has had no kernel work since the
round-2 linmap matmuls. Two questions, one process:

1. WHERE does the 0.8 ms go? Telescoping cumulative prefixes of the
   linmap chain (noise RNG -> IR-spectrum einsums -> frame DFT einsums ->
   pointwise complex product -> inverse-DFT einsums -> overlap-add+crop),
   every prefix a single jitted program so differences are additive and
   the ~0.35 ms relay dispatch floor cancels (CLAUDE.md round-4 note).

2. Does lane-aligning the DFT size win? `_frequency_filter_linmap` uses
   get_fft_size(..., power_of_2=True) = 512 for the v2 shapes, i.e.
   F = 257 rfft bins -> padded to 384 lanes in every einsum. The matmul
   branch never runs a real FFT, so fft_size only needs to be
   >= conv_size (linear-convolution support): fft_size 510 gives F = 256
   (exactly two 128-lane tiles, ~33 % less padded MXU work) and
   fft_size 285 (= conv_size) is the minimum. All three are the SAME
   linear convolution up to float reassociation — parity is asserted at
   1e-5 of peak before timing.

Protocol per CLAUDE.md: all ops jitted (no eager through the relay),
host constants are numpy closed over by the jit, N=100 iterations per
block, arms interleaved across >=3 blocks in ONE process, medians
reported.

Usage: python benchmarks/profile_noise_stage.py [--quick]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ddsp_piano_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ddsp_piano_tpu.ops import core  # noqa: E402
from ddsp_piano_tpu.ops.filters import (  # noqa: E402
    crop_and_compensate_delay, frequency_impulse_response, get_fft_size,
    overlap_and_add)

# v2 bench-scene folded shapes (16 voices, 4 s @ 24 kHz, 250 fps, 96 bands).
B, T, K = 16, 1000, 96
N_SAMPLES = 96000
WINDOW_SIZE = 257
FRAME = N_SAMPLES // T  # 96

MAGS_RAW = np.random.RandomState(0).randn(B, T, K).astype(np.float32) * 0.5
KEY = jax.random.PRNGKey(7)


def _mags(raw):
    # DynamicSizeFilteredNoise.get_controls: exp_sigmoid(raw + bias).
    return core.exp_sigmoid(raw + (-5.0))


def _consts(fft_size):
    """The linmap constants (traced from literals -> XLA constant-folds)."""
    basis = frequency_impulse_response(jnp.eye(K, dtype=jnp.float32),
                                       window_size=WINDOW_SIZE)
    ir_size = basis.shape[-1]
    conv_size = FRAME + ir_size - 1
    assert fft_size >= conv_size, (fft_size, conv_size)
    basis_fft = jnp.fft.rfft(basis, n=fft_size, axis=-1)
    w = jnp.fft.rfft(jnp.eye(FRAME, dtype=jnp.float32), n=fft_size, axis=-1)
    n_freqs = fft_size // 2 + 1
    inv = jnp.fft.irfft(jnp.eye(n_freqs, dtype=jnp.complex64),
                        n=fft_size, axis=-1)[:, :conv_size]
    inv_im = jnp.fft.irfft(1j * jnp.eye(n_freqs, dtype=jnp.complex64),
                           n=fft_size, axis=-1)[:, :conv_size]
    return basis_fft, w, inv, inv_im, ir_size, conv_size


def linmap_variant(raw, key, fft_size):
    """_frequency_filter_linmap body at the v2 shapes, fft_size free."""
    hi = jax.lax.Precision.HIGHEST
    mags = _mags(raw)
    audio = jax.random.uniform(key, (B, N_SAMPLES), jnp.float32, -1.0, 1.0)
    basis_fft, w, inv, inv_im, ir_size, conv_size = _consts(fft_size)
    ir_re = jnp.einsum('btk,kf->btf', mags, basis_fft.real, precision=hi)
    ir_im = jnp.einsum('btk,kf->btf', mags, basis_fft.imag, precision=hi)
    audio_frames = audio.reshape(B, T, FRAME)
    a_re = jnp.einsum('btj,jf->btf', audio_frames, w.real, precision=hi)
    a_im = jnp.einsum('btj,jf->btf', audio_frames, w.imag, precision=hi)
    p_re = a_re * ir_re - a_im * ir_im
    p_im = a_re * ir_im + a_im * ir_re
    out_frames = (jnp.einsum('btf,fm->btm', p_re, inv, precision=hi)
                  + jnp.einsum('btf,fm->btm', p_im, inv_im, precision=hi))
    out = overlap_and_add(out_frames, FRAME)
    return crop_and_compensate_delay(out, N_SAMPLES, ir_size, 'same', -1)


FFT_POW2 = get_fft_size(FRAME, 2 * (K - 1), power_of_2=True)  # 512


def _prefix(stage):
    """Cumulative prefixes of the pow2 chain; each returns every live
    branch head so no earlier stage is dead-code-eliminated."""
    hi = jax.lax.Precision.HIGHEST

    def fn(raw, key):
        mags = _mags(raw)
        audio = jax.random.uniform(key, (B, N_SAMPLES), jnp.float32,
                                   -1.0, 1.0)
        if stage == 'rng':
            return mags, audio
        basis_fft, w, inv, inv_im, ir_size, conv_size = _consts(FFT_POW2)
        ir_re = jnp.einsum('btk,kf->btf', mags, basis_fft.real, precision=hi)
        ir_im = jnp.einsum('btk,kf->btf', mags, basis_fft.imag, precision=hi)
        if stage == 'ir_mm':
            return audio, ir_re, ir_im
        audio_frames = audio.reshape(B, T, FRAME)
        a_re = jnp.einsum('btj,jf->btf', audio_frames, w.real, precision=hi)
        a_im = jnp.einsum('btj,jf->btf', audio_frames, w.imag, precision=hi)
        if stage == 'a_mm':
            return a_re, a_im, ir_re, ir_im
        p_re = a_re * ir_re - a_im * ir_im
        p_im = a_re * ir_im + a_im * ir_re
        if stage == 'pointwise':
            return p_re, p_im
        out_frames = (jnp.einsum('btf,fm->btm', p_re, inv, precision=hi)
                      + jnp.einsum('btf,fm->btm', p_im, inv_im,
                                   precision=hi))
        if stage == 'inv_mm':
            return (out_frames,)
        out = overlap_and_add(out_frames, FRAME)
        return (crop_and_compensate_delay(out, N_SAMPLES, ir_size,
                                          'same', -1),)
    return fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--quick', action='store_true')
    args = ap.parse_args()
    n_iters = 30 if args.quick else 100
    reps = 2 if args.quick else 4

    print(f"devices: {jax.devices()}", flush=True)
    raw = jnp.asarray(MAGS_RAW)

    # ---- parity of the fft_size variants, on-chip, before timing ----
    arms = {
        'pow2_512': jax.jit(lambda r, k: linmap_variant(r, k, FFT_POW2)),
        'lane_510': jax.jit(lambda r, k: linmap_variant(r, k, 510)),
        'min_285': jax.jit(lambda r, k: linmap_variant(r, k, 285)),
    }
    ref = np.asarray(arms['pow2_512'](raw, KEY))
    peak = np.abs(ref).max()
    for name, fn in arms.items():
        got = np.asarray(fn(raw, KEY))
        delta = np.abs(got - ref).max() / peak
        print(f"parity {name}: max|d|/peak = {delta:.2e}", flush=True)
        assert delta < 1e-5, (name, delta)

    # ---- telescoping decomposition (pow2 chain) ----
    stages = ['rng', 'ir_mm', 'a_mm', 'pointwise', 'inv_mm', 'full']
    pfns = {s: jax.jit(_prefix(s)) for s in stages}
    for s in stages:
        jax.block_until_ready(pfns[s](raw, KEY))
    walls = {s: [] for s in stages}
    for _ in range(reps):
        for s in stages:
            t0 = time.perf_counter()
            for _ in range(n_iters):
                out = pfns[s](raw, KEY)
            jax.block_until_ready(out)
            walls[s].append((time.perf_counter() - t0) / n_iters * 1e3)
    med = {s: sorted(w)[len(w) // 2] for s, w in walls.items()}
    print("\ncumulative prefixes (ms, median; first includes ~0.35 "
          "dispatch floor):")
    prev = 0.0
    for s in stages:
        print(f"  {s:10s} {med[s]:7.3f}  (+{med[s] - prev:6.3f})", flush=True)
        prev = med[s]

    # ---- interleaved fft_size A/B ----
    for fn in arms.values():
        jax.block_until_ready(fn(raw, KEY))
    awalls = {a: [] for a in arms}
    for _ in range(reps):
        for a, fn in arms.items():
            t0 = time.perf_counter()
            for _ in range(n_iters):
                out = fn(raw, KEY)
            jax.block_until_ready(out)
            awalls[a].append((time.perf_counter() - t0) / n_iters * 1e3)
    print("\nfft_size A/B (ms/call, median over interleaved blocks):")
    for a, w in awalls.items():
        ws = sorted(w)
        print(f"  {a:10s} {ws[len(ws) // 2]:7.3f}  "
              f"(min {ws[0]:.3f} max {ws[-1]:.3f})", flush=True)


if __name__ == '__main__':
    main()
