"""Fine-grained TPU attribution of the v2 forward's noise/reverb/ctrl cost.

Round-4 instrumentation (VERDICT r3 items 1 & 4): BENCH_r03 says
stage_noise 0.978 + stage_reverb 0.75 ms together outweigh the oscillator
(1.368 ms) and stage_ctrl is 1.39 ms — but those stage keys are coarse.
This script times the *internals* on the bench scene shapes
(maestro-v2, 4 s, b=1, 16 folded voices, 24 kHz):

- ctrl sub-modules one by one (FiLM context net, FDN-IR synthesis [which
  lives in the ctrl stage, NOT stage_reverb], NoteRelease, joint tuning,
  monophonic GRU192 net);
- noise internals (uniform draw / linmap filter / its einsums / overlap-add);
- reverb internals (fft_convolve at fft_size 2^18 vs a uniformly
  partitioned convolution at several block sizes; raw rfft/irfft timings).

Protocol: all arms interleaved across reps in one process, N>=100 each,
per CLAUDE.md (single relay runs spread +-15%).
"""
import sys
import time

from _ab_common import jax  # noqa: F401  (path + compilation cache setup)

import jax.numpy as jnp
import numpy as np

from ddsp_piano_tpu.configs import get_model
from ddsp_piano_tpu.ops import filters, core

sys.path.insert(0, '/root/repo')
from bench import build_inputs  # noqa: E402


def interleaved(arms, n_iters=100, reps=3):
    """arms: {name: (fn, args)}. Returns {name: best-of-reps ms}."""
    # Compile + warm up every arm first.
    for name, (fn, args) in arms.items():
        jax.block_until_ready(fn(*args))
    best = {name: float('inf') for name in arms}
    for _ in range(reps):
        for name, (fn, args) in arms.items():
            out = fn(*args)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(n_iters):
                out = fn(*args)
            jax.block_until_ready(out)
            ms = (time.perf_counter() - t0) / n_iters * 1e3
            best[name] = min(best[name], ms)
    return best


def main():
    duration = 4.0
    model = get_model('maestro_v2', duration=duration, inference=True)
    params = model.init(jax.random.PRNGKey(0))
    feats = {k: jnp.asarray(v) for k, v in build_inputs(duration).items()}
    rng = jax.random.PRNGKey(0)

    # ---- materialize the ctrl pipeline stages ----
    def ctrl_all(p, f):
        f = dict(f)
        f = model.compute_global_features(p, f, False)
        f = model.parallelizer.parallelize(f)
        f = model.compute_monophonic_features(p, f, False)
        return model.parallelizer.unparallelize(f, 1)

    ctrl_feats = jax.jit(ctrl_all)(params, feats)
    # Inputs for each sub-module, materialized.
    f_global = dict(feats)
    f_global = jax.jit(
        lambda p, f: model.compute_global_features(p, dict(f), False)
    )(params, feats)
    f_par = jax.jit(
        lambda f: model.parallelizer.parallelize(dict(f)))(f_global)
    f_par = {k: jax.device_put(v) for k, v in f_par.items()}

    arms = {}
    # Global modules.
    for slot in model.GLOBAL_SLOTS:
        mod = getattr(model, slot)
        if mod is None:
            continue
        arms[f'ctrl/{slot}'] = (
            jax.jit(lambda p, f, m=mod, s=slot: m.apply_features(
                p[s], dict(f), training=False)),
            (params, feats))
    # Mono modules on the folded features, each timed on its OWN
    # materialized inputs (they form a sequential pipeline: note_release
    # emits extended_pitch for the tuners, etc.).
    f_mono = {k: jax.device_put(v) for k, v in f_par.items()}
    for slot in model.MONO_SLOTS:
        mod = getattr(model, slot)
        if mod is None:
            continue
        step_fn = jax.jit(lambda p, f, m=mod, s=slot: m.apply_features(
            p[s], dict(f), training=False))
        arms[f'ctrl/{slot}'] = (step_fn, (params, dict(f_mono)))
        f_mono.update(step_fn(params, dict(f_mono)))

    # ---- noise internals ----
    pg = model.processor_group
    noise = pg.noise
    mags_raw = ctrl_feats['magnitudes']          # (16, b, 1000, 96)
    mags_fold = jax.jit(
        lambda x: x.reshape((-1,) + x.shape[2:]))(mags_raw)
    noise_ctrl = jax.jit(lambda m: noise.get_controls({}, m))(mags_fold)
    mags = noise_ctrl['magnitudes']
    b, n_frames, n_bands = mags.shape
    n_samples = noise.upsampling * n_frames
    sig_shape = (b, n_samples)
    noise_sig = jax.jit(lambda: jax.random.uniform(
        rng, sig_shape, jnp.float32, -1.0, 1.0))()

    arms['noise/full'] = (
        jax.jit(lambda m: noise.get_signal({}, m, rng=rng)), (mags,))
    arms['noise/uniform_draw'] = (
        jax.jit(lambda: jax.random.uniform(
            rng, sig_shape, jnp.float32, -1.0, 1.0)), ())
    arms['noise/linmap_filter'] = (
        jax.jit(lambda s, m: filters.frequency_filter(
            s, m, window_size=noise.window_size)), (noise_sig, mags))

    # linmap einsums alone (mirror of _frequency_filter_linmap internals).
    # Precomputes in numpy: eager jnp ops dispatch to the axon TPU and some
    # (reshape, fft) hit UNIMPLEMENTED paths through the relay.
    frame_size = -(-n_samples // n_frames)
    basis = np.asarray(jax.jit(
        lambda: filters.frequency_impulse_response(
            jnp.eye(n_bands, dtype=jnp.float32),
            window_size=noise.window_size))())
    ir_size = basis.shape[-1]
    fft_size = filters.get_fft_size(frame_size, ir_size, power_of_2=True)
    # Keep constants as NUMPY and let jit constant-fold them: runtime
    # device_put through the relay intermittently returns UNIMPLEMENTED
    # mid-session even for small contiguous f32 arrays.
    basis_fft = np.fft.rfft(basis, n=fft_size, axis=-1)
    basis_fft_re = basis_fft.real.astype(np.float32)
    basis_fft_im = basis_fft.imag.astype(np.float32)
    w_fft = np.fft.rfft(np.eye(frame_size, dtype=np.float32),
                        n=fft_size, axis=-1)
    w_re = w_fft.real.astype(np.float32)
    w_im = w_fft.imag.astype(np.float32)
    n_freqs = fft_size // 2 + 1
    conv_size = frame_size + ir_size - 1
    inv = np.ascontiguousarray(
        np.fft.irfft(np.eye(n_freqs, dtype=np.complex64),
                     n=fft_size, axis=-1)[:, :conv_size].astype(np.float32))
    inv_im = np.ascontiguousarray(
        np.fft.irfft(1j * np.eye(n_freqs, dtype=np.complex64),
                     n=fft_size, axis=-1)[:, :conv_size].astype(np.float32))
    hi = filters.LINMAP_PRECISION
    audio_frames = jax.jit(
        lambda s: s.reshape(b, n_frames, frame_size))(noise_sig)

    def linmap_matmuls(af, m):
        ir_re = jnp.einsum('btk,kf->btf', m, basis_fft_re, precision=hi)
        ir_im = jnp.einsum('btk,kf->btf', m, basis_fft_im, precision=hi)
        a_re = jnp.einsum('btj,jf->btf', af, w_re, precision=hi)
        a_im = jnp.einsum('btj,jf->btf', af, w_im, precision=hi)
        p_re = a_re * ir_re - a_im * ir_im
        p_im = a_re * ir_im + a_im * ir_re
        return (jnp.einsum('btf,fm->btm', p_re, inv, precision=hi)
                + jnp.einsum('btf,fm->btm', p_im, inv_im, precision=hi))

    out_frames = jax.jit(linmap_matmuls)(audio_frames, mags)
    arms['noise/linmap_matmuls'] = (jax.jit(linmap_matmuls),
                                    (audio_frames, mags))
    arms['noise/overlap_add'] = (
        jax.jit(lambda fr: filters.overlap_and_add(fr, frame_size)),
        (out_frames,))

    # ---- reverb internals ----
    reverb = pg.reverb
    ir = ctrl_feats['reverb_ir']                  # (b, 48000)
    mix = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(1), (1, n_samples)))()
    arms['reverb/full'] = (
        jax.jit(lambda a, i: reverb.get_signal({}, a, i)), (mix, ir))
    arms['reverb/fft_convolve'] = (
        jax.jit(lambda a, i: filters.fft_convolve(
            a, i, padding='same', delay_compensation=0)), (mix, ir))

    # Raw FFT costs at the shapes involved.
    big = filters.get_fft_size(n_samples, ir.shape[-1])   # 262144
    x_big = jax.jit(lambda: jnp.zeros((1, big), jnp.float32))()
    X_big = jax.jit(jnp.fft.rfft)(x_big)
    arms['fft/rfft_262144'] = (jax.jit(lambda x: jnp.fft.rfft(x)), (x_big,))
    arms['fft/irfft_262144'] = (
        jax.jit(lambda X: jnp.fft.irfft(X, n=big)), (X_big,))
    for blk in (4096, 8192, 16384):
        nb = -(-n_samples // blk) + -(-ir.shape[-1] // blk)
        xb = jax.jit(lambda s=(1, nb, 2 * blk): jnp.zeros(s, jnp.float32))()
        arms[f'fft/rfft_batched_{2*blk}x{nb}'] = (
            jax.jit(lambda x: jnp.fft.rfft(x, axis=-1)), (xb,))

    # Partitioned convolution candidate.
    def fft_convolve_partitioned(audio, ir2, block):
        bsz, n = audio.shape
        L = ir2.shape[-1]
        n_a = -(-n // block)
        n_h = -(-L // block)
        fftn = 2 * block
        a = jnp.pad(audio, ((0, 0), (0, n_a * block - n))).reshape(
            bsz, n_a, block)
        h = jnp.pad(ir2, ((0, 0), (0, n_h * block - L))).reshape(
            ir2.shape[0], n_h, block)
        A = jnp.fft.rfft(a, n=fftn, axis=-1)       # (b, n_a, F)
        H = jnp.fft.rfft(h, n=fftn, axis=-1)       # (bh, n_h, F)
        n_out = n_a + n_h - 1
        Y = jnp.zeros((bsz, n_out, A.shape[-1]), A.dtype)
        for j in range(n_h):
            Y = Y.at[:, j:j + n_a].add(A * H[:, j:j + 1])
        y = jnp.fft.irfft(Y, n=fftn, axis=-1)      # (b, n_out, 2*block)
        out = filters.overlap_and_add(y, block)
        return filters.crop_and_compensate_delay(out, n, L, 'same', 0)

    for blk in (4096, 8192, 16384):
        arms[f'reverb/partitioned_{blk}'] = (
            jax.jit(lambda a, i, bl=blk: fft_convolve_partitioned(a, i, bl)),
            (mix, ir))

    # Parity check of the partitioned rewrite before timing it.
    ref = jax.jit(lambda a, i: filters.fft_convolve(
        a, i, padding='same', delay_compensation=0))(mix, ir)
    for blk in (4096, 8192, 16384):
        got = jax.jit(
            lambda a, i, bl=blk: fft_convolve_partitioned(a, i, bl))(mix, ir)
        err = float(jnp.abs(got - ref).max() / jnp.abs(ref).max())
        print(f'parity partitioned_{blk}: rel max err {err:.3e}')
        assert err < 1e-4, err

    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    results = interleaved(arms, n_iters=n_iters, reps=reps)
    width = max(len(k) for k in results)
    for k in sorted(results):
        print(f'{k:<{width}}  {results[k]:8.4f} ms')


if __name__ == '__main__':
    main()
