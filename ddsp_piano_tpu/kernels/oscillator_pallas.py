"""Fused Pallas TPU kernel for the framewise additive oscillator bank.

Consumes the same frame-rate controls as ops.oscillator.render_framewise
(f_lo/f_hi/a_lo/a_hi/phase0, each (B, n_frames, K)) and renders
(B, n_frames * up) audio entirely on-chip:

- grid over (voice-batch, frame blocks); per block, the (FPB, K) control
  slices live in VMEM and the (FPB, up, K) phase/amplitude/cos intermediate
  exists only in registers/VMEM — it is never written to HBM. The reference
  pipeline materializes sample-rate envelopes of that size in main memory
  (inharm_synth.py:116-127), a ~2K-float-per-sample HBM round trip that this
  kernel eliminates.
- the per-sample phase is the closed form
      phase(f, s) = phase0[f] + w * ((s+1) f_lo[f] + df[f] s(s+1)/(2 up))
  so no serial cumsum appears anywhere; the frame-rate cumsum producing
  phase0 was already done (cheaply) by the caller.
- amplitude crossfade (Hann overlap-add closed form) and the Nyquist mask
  are applied in-register before the reduce over partials.

K is padded to a multiple of 128 lanes by the wrapper (zero amplitude =>
silent padding partials).

Two kernels:

- `render_framewise_pallas` — round-1 kernel: partials on lanes, every
  partial computed. Matches XLA's fused jnp path in speed (both sit at the
  VPU transcendental roofline when all partials are live).
- `render_framewise_pallas_skip` — round-2 kernel exploiting the piano's
  dominant sparsity: most (voice, partial) pairs are silent (inactive
  voice) or Nyquist-masked (high notes keep only a handful of partials
  below sr/2; the reference merely zeros them AFTER computing the cosine,
  inharm_synth.py:56-66). Controls are transposed to (B, K, frames) so
  partials sit on SUBLANES; per (voice, frame-block) cell a dynamic
  fori_loop walks 8-partial sublane tiles only up to the last active
  partial (precomputed at frame rate on the host and delivered via
  scalar prefetch). Skipped tiles contribute exact zeros in the full
  kernel, so the output is bit-identical while the VPU transcendental
  work drops by the masked fraction (~3x on chordal piano content).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ddsp_piano_tpu.ops.oscillator import FramewiseOscControls

Array = jax.Array

_2PI = 2.0 * math.pi

# -----------------------------------------------------------------------------
# In-kernel trig: native transcendentals vs a polynomial sin+cos
# -----------------------------------------------------------------------------
#
# The oscillator kernels are VPU-transcendental-bound; the backward kernel
# pays for BOTH cos and sin of every (partial, sample, frame) phase. The
# 'poly' path replaces the two native transcendentals with one shared
# Cody-Waite range reduction (2-part 2*pi, exact for |phase| < 2^12) plus a
# pair of degree-6 least-squares polynomials in x^2 over one period —
# ~19 ordinary VPU ops for BOTH values. Measured end-to-end f32 accuracy:
# max abs error 6.5e-7 (native f32 transcendentals: 6.7e-8); both are far
# below the ~1.2e-5 quantization already present in the f32 closed-form
# phase at the shipped upsampling factors, so swapping trig paths moves the
# rendered audio by less than the phase representation itself does.

_INV_2PI = 0.15915494309189535
_2PI_HI = 6.28125                      # 9 trailing zero bits: n*_2PI_HI exact
_2PI_LO = 0.0019353071795864769        # 2*pi - _2PI_HI
_COS6 = (9.999999875e-01, -1.973920397e+01, 6.493908942e+01,
         -8.544960659e+01, 6.016310858e+01, -2.595008830e+01,
         6.503441062e+00)
_SIN6 = (6.283185302e+00, -4.134170018e+01, 8.160511939e+01,
         -7.670278730e+01, 4.202399178e+01, -1.489235342e+01,
         3.227346678e+00)
# Degree-4 variants for GRADIENT work only (backward kernel opt-in): max
# abs error 1.2e-4 (cos) / 3.7e-5 (sin) — far inside training-gradient
# tolerance (the scan-VJP reference itself differs ~1e-3 rel from the
# kernel through bf16 matmuls), never used for rendered audio.
_COS4 = (9.999681959e-01, -1.973229255e+01, 6.470140570e+01,
         -8.259851900e+01, 4.606319347e+01)
_SIN4 = (6.283166561e+00, -4.133763108e+01, 8.146544324e+01,
         -7.503236765e+01, 3.381005338e+01)


def _poly_eval(coeffs, t):
    acc = jnp.full_like(t, coeffs[-1])
    for c in coeffs[-2::-1]:
        acc = acc * t + c
    return acc


def _range_reduce(phi):
    """phi (radians, any magnitude) -> x = phi/2pi mod 1, in ~[-.505, .505]."""
    n = jnp.round(phi * _INV_2PI)
    xr = phi - n * _2PI_HI
    xr = xr - n * _2PI_LO
    return xr * _INV_2PI


def _check_trig(trig: str, allowed=('native', 'poly')):
    if trig not in allowed:
        raise ValueError(f"trig={trig!r}: expected one of {allowed}")


def _cos(phi, trig: str):
    _check_trig(trig)
    if trig == 'native':
        return jnp.cos(phi)
    x = _range_reduce(phi)
    return _poly_eval(_COS6, x * x)


def _sincos(phi, trig: str):
    """Returns (sin(phi), cos(phi)) under the selected trig path.

    'sqrt' keeps the native cos and reconstructs |sin| = sqrt(1 - cos^2)
    with the sign taken from the range-reduced phase — half the native
    transcendentals, but absolute sin error grows to ~sqrt(eps) near
    sin = 0 (fine for gradients, not for audio).

    'poly4' drops the shared polynomials to degree 4 (~1.2e-4 max abs
    error) — gradient-precision trig for the backward kernel only."""
    _check_trig(trig, ('native', 'poly', 'sqrt', 'poly4'))
    if trig == 'native':
        return jnp.sin(phi), jnp.cos(phi)
    if trig == 'sqrt':
        c = jnp.cos(phi)
        x = _range_reduce(phi)
        s = jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0))
        return jnp.where(x >= 0.0, s, -s), c
    x = _range_reduce(phi)
    t = x * x
    if trig == 'poly4':
        return x * _poly_eval(_SIN4, t), _poly_eval(_COS4, t)
    return x * _poly_eval(_SIN6, t), _poly_eval(_COS6, t)


def _pick_frames_per_block(up: int, k: int,
                           vmem_budget_floats: int = 1 << 20) -> int:
    """Frames per block: a multiple of 8 (TPU sublane tiling) sized so the
    (FPB, up, K) in-register intermediate stays well under VMEM."""
    fpb = 32
    while fpb > 8 and fpb * up * k > vmem_budget_floats:
        fpb //= 2
    return fpb


def _osc_kernel(f_lo_ref, f_hi_ref, a_lo_ref, a_hi_ref, phase0_ref, out_ref,
                *, up: int, fpb: int, k: int, sample_rate: float):
    f_lo = f_lo_ref[0]          # (fpb, k)
    f_hi = f_hi_ref[0]
    a_lo = a_lo_ref[0]
    a_hi = a_hi_ref[0]
    phase0 = phase0_ref[0]

    w_scale = _2PI / sample_rate
    # Intra-frame sample offsets as a (1, up, 1) iota (int on TPU).
    s = jax.lax.broadcasted_iota(jnp.int32, (1, up, 1),
                                 dimension=1).astype(jnp.float32)
    h = jnp.sin((math.pi / (2.0 * up)) * s) ** 2          # raised cosine

    df = (f_hi - f_lo)[:, None, :]                        # (fpb, 1, k)
    f0 = f_lo[:, None, :]
    tri = (s * (s + 1.0)) * (0.5 / up)
    phase = (phase0[:, None, :]
             + w_scale * ((s + 1.0) * f0 + df * tri))     # (fpb, up, k)
    amp = a_lo[:, None, :] * (1.0 - h) + a_hi[:, None, :] * h
    freq = f0 + df * (s * (1.0 / up))
    amp = jnp.where(freq < sample_rate / 2.0, amp, 0.0)

    out_ref[0] = jnp.sum(amp * jnp.cos(phase), axis=-1)   # (fpb, up)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def render_framewise_pallas(controls: FramewiseOscControls,
                            upsampling: int,
                            sample_rate: int,
                            interpret: bool = False) -> Array:
    """Pallas render: (B, n_frames, K) controls -> (B, n_frames * up).

    interpret=True runs the kernel in the Pallas interpreter (any backend;
    used to keep the kernel covered by the CPU test suite).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f_lo, f_hi, a_lo, a_hi, phase0 = controls
    b, n_frames, k = f_lo.shape
    up = upsampling

    # Pad the partial axis to full 128-lane tiles and the frame axis to a
    # multiple of the block size (zero-amplitude padding is silent).
    k_pad = -(-k // 128) * 128
    fpb = _pick_frames_per_block(up, k_pad)
    f_pad = -(-n_frames // fpb) * fpb
    pad = [(0, 0), (0, f_pad - n_frames), (0, k_pad - k)]
    if f_pad != n_frames or k_pad != k:
        f_lo = jnp.pad(f_lo, pad)
        f_hi = jnp.pad(f_hi, pad)
        a_lo = jnp.pad(a_lo, pad)
        a_hi = jnp.pad(a_hi, pad)
        phase0 = jnp.pad(phase0, pad)

    grid = (b, f_pad // fpb)
    in_spec = pl.BlockSpec((1, fpb, k_pad), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, fpb, up), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_osc_kernel, up=up, fpb=fpb, k=k_pad,
                               sample_rate=float(sample_rate))
    audio = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_spec] * 5,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, f_pad, up), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * f_pad * up * k_pad,
            bytes_accessed=4 * (5 * b * f_pad * k_pad + b * f_pad * up),
            transcendentals=2 * b * f_pad * up * k_pad,
        ),
        interpret=interpret,
    )(f_lo, f_hi, a_lo, a_hi, phase0)
    return audio[:, :n_frames].reshape(b, n_frames * up)


# -----------------------------------------------------------------------------
# Round-2 kernel: skip Nyquist-masked / silent partial tiles
# -----------------------------------------------------------------------------

_KT = 8          # partials per skip tile (one f32 sublane tile)
_FPB_SKIP = 128  # frames per block (one full lane tile of the control axis)


def _osc_skip_kernel(kt_ref, f_lo_ref, f_hi_ref, a_lo_ref, a_hi_ref,
                     phase0_ref, out_ref, acc_ref,
                     *, up: int, sample_rate: float, trig: str = 'native'):
    """One (voice, frame-block) cell.

    Control blocks are (1, K_pad, fpb) with partials on sublanes; kt_ref
    (scalar prefetch) holds, per cell, the number of 8-partial tiles up to
    the last active partial. Tiles past it are all exactly zero in the
    full render (zero amplitude or frequency >= Nyquist for every sample
    of every frame in the block), so the loop simply stops early.

    The compute intermediate is laid out (K_tile, up, fpb): FRAMES on the
    128-wide lane axis (fpb == 128, perfectly aligned) and intra-frame
    samples on sublanes — `up` is 64/96 for the shipped rates, a multiple
    of the 8-sublane tile, so no pad lanes are burned (the natural
    (..., up, K) layout would waste 25 % of every lane tile when up=96).
    The (up, fpb) accumulator is transposed once per cell on write-out.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    kt_max = kt_ref[i, j]

    w_scale = _2PI / sample_rate
    s = jax.lax.broadcasted_iota(jnp.int32, (1, up, 1),
                                 dimension=1).astype(jnp.float32)
    h = jnp.sin((math.pi / (2.0 * up)) * s) ** 2
    tri = (s * (s + 1.0)) * (0.5 / up)

    acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(kt, carry):
        sl = pl.ds(kt * _KT, _KT)
        f_lo = f_lo_ref[0, sl, :][:, None, :]       # (8, 1, fpb)
        f_hi = f_hi_ref[0, sl, :][:, None, :]
        a_lo = a_lo_ref[0, sl, :][:, None, :]
        a_hi = a_hi_ref[0, sl, :][:, None, :]
        phase0 = phase0_ref[0, sl, :][:, None, :]
        df = f_hi - f_lo
        phase = phase0 + w_scale * ((s + 1.0) * f_lo + df * tri)
        amp = a_lo * (1.0 - h) + a_hi * h
        freq = f_lo + df * (s * (1.0 / up))
        amp = jnp.where(freq < sample_rate / 2.0, amp, 0.0)
        acc_ref[:, :] += jnp.sum(amp * _cos(phase, trig), axis=0)  # (up, fpb)
        return carry

    jax.lax.fori_loop(0, kt_max, body, 0)
    out_ref[0] = acc_ref[:].T                                   # (fpb, up)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def render_framewise_pallas_skip(controls: FramewiseOscControls,
                                 upsampling: int,
                                 sample_rate: int,
                                 interpret: bool = False,
                                 trig: str = 'native') -> Array:
    """Skipping Pallas render: (B, n_frames, K) controls -> (B, N) audio.

    Numerically equivalent to render_framewise(..., backend='jnp'):
    skipped tiles are exactly zero there too (amplitude zero or
    Nyquist-masked at every interpolated sample, both of which the
    host-side activity predicate reproduces exactly), so the only
    difference is float32 reassociation of the partial-axis sum — measured
    no farther from the float64 ground truth than the jnp path itself.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f_lo, f_hi, a_lo, a_hi, phase0 = controls
    b, n_frames, k = f_lo.shape
    up = upsampling
    nyq = float(sample_rate) / 2.0

    # Last active partial per frame, at frame rate (cheap, fuses into the
    # surrounding XLA program). A (frame, partial) contributes iff some
    # interpolated sample has freq < Nyquist AND the amplitude crossfade is
    # not identically zero; freq is linear in s, so min(f_lo, f_hi) decides.
    active = ((jnp.minimum(f_lo, f_hi) < nyq)
              & ((a_lo != 0.0) | (a_hi != 0.0)))            # (b, nf, k)
    k_idx = jnp.arange(1, k + 1, dtype=jnp.int32)
    k_last = jnp.max(jnp.where(active, k_idx, 0), axis=-1)  # (b, nf)

    fpb = _FPB_SKIP
    k_pad = -(-k // _KT) * _KT
    f_pad = -(-n_frames // fpb) * fpb
    pad = [(0, 0), (0, f_pad - n_frames), (0, k_pad - k)]

    def prep(x):
        if f_pad != n_frames or k_pad != k:
            x = jnp.pad(x, pad)
        return jnp.swapaxes(x, 1, 2)                        # (b, K_pad, F_pad)

    f_lo_t, f_hi_t = prep(f_lo), prep(f_hi)
    a_lo_t, a_hi_t = prep(a_lo), prep(a_hi)
    phase0_t = prep(phase0)

    # Per-(voice, frame-block) tile count: ceil(max k_last in block / 8).
    k_last = jnp.pad(k_last, ((0, 0), (0, f_pad - n_frames)))
    k_last_blk = jnp.max(k_last.reshape(b, f_pad // fpb, fpb), axis=-1)
    kt_counts = -(-k_last_blk // _KT)                       # (b, n_fblocks)

    grid = (b, f_pad // fpb)
    # index maps get the scalar-prefetch ref appended to the grid indices
    in_spec = pl.BlockSpec((1, k_pad, fpb), lambda i, j, *_: (i, 0, j),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, fpb, up), lambda i, j, *_: (i, j, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[in_spec] * 5,
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((up, fpb), jnp.float32)],
    )
    kernel = functools.partial(_osc_skip_kernel, up=up,
                               sample_rate=float(sample_rate), trig=trig)
    audio = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, f_pad, up), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * f_pad * up * k_pad,
            bytes_accessed=4 * (5 * b * f_pad * k_pad + b * f_pad * up),
            transcendentals=2 * b * f_pad * up * k_pad,
        ),
        interpret=interpret,
    )(kt_counts.astype(jnp.int32), f_lo_t, f_hi_t, a_lo_t, a_hi_t, phase0_t)
    return audio[:, :n_frames].reshape(b, n_frames * up)


# -----------------------------------------------------------------------------
# Backward kernel: control gradients with the same tile-skip structure
# -----------------------------------------------------------------------------


def _osc_skip_bwd_kernel(kt_ref, f_lo_ref, f_hi_ref, a_lo_ref, a_hi_ref,
                         phase0_ref, g_ref,
                         d_flo_ref, d_fhi_ref, d_alo_ref, d_ahi_ref,
                         d_p0_ref, *, up: int, sample_rate: float,
                         trig: str = 'native', reduce: str = 'vpu'):
    """Gradients of the framewise render w.r.t. its five control arrays.

    Same cell/tile structure as the forward, but the skip predicate is
    NYQUIST-ONLY: a fully-masked tile has zero gradient for every control
    (the mask multiplies amp, and d(mask)/d(freq) == 0 through jnp.where),
    while a silent-but-audible tile still carries AMPLITUDE gradients —
    training amplitudes come through exp_sigmoid and are never exactly
    zero anyway, but the predicate keeps the kernel exact regardless.

    The jnp backward materializes (batch, frames, up, K) intermediates in
    HBM (~5 GB for the dafx22 training shapes — measured ~60 ms of the
    111 ms step); here they only ever exist tile-by-tile in VMEM.

    reduce='mxu' computes the five weighted up-axis reductions as two
    dot_generals against constant (stream, up) weight matrices — the
    contraction rides the (otherwise idle) MXU instead of adding ~10
    VPU multiply/add chains per cell to the transcendental-bound body.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    kt_max = kt_ref[i, j]

    w_scale = _2PI / sample_rate
    s = jax.lax.broadcasted_iota(jnp.int32, (1, up, 1),
                                 dimension=1).astype(jnp.float32)
    h = jnp.sin((math.pi / (2.0 * up)) * s) ** 2
    tri = (s * (s + 1.0)) * (0.5 / up)
    if reduce == 'mxu':
        su = s[0, :, 0][None, :]                               # (1, up)
        h_row = h[0, :, 0][None, :]
        tri_row = tri[0, :, 0][None, :]
        w_gc = jnp.concatenate([1.0 - h_row, h_row], axis=0)   # (2, up)
        w_gs = jnp.concatenate(
            [jnp.ones_like(su),
             w_scale * ((su + 1.0) - tri_row),
             w_scale * tri_row], axis=0)                       # (3, up)
    elif reduce != 'vpu':
        raise ValueError(f"reduce={reduce!r}: expected 'vpu' or 'mxu'")

    for ref in (d_flo_ref, d_fhi_ref, d_alo_ref, d_ahi_ref, d_p0_ref):
        ref[0] = jnp.zeros_like(ref[0])
    g = g_ref[0][None, :, :]                        # (1, up, fpb)

    def body(kt, carry):
        sl = pl.ds(kt * _KT, _KT)
        f_lo = f_lo_ref[0, sl, :][:, None, :]       # (8, 1, fpb)
        f_hi = f_hi_ref[0, sl, :][:, None, :]
        a_lo = a_lo_ref[0, sl, :][:, None, :]
        a_hi = a_hi_ref[0, sl, :][:, None, :]
        phase0 = phase0_ref[0, sl, :][:, None, :]
        df = f_hi - f_lo
        phase = phase0 + w_scale * ((s + 1.0) * f_lo + df * tri)
        mask = (f_lo + df * (s * (1.0 / up))) < sample_rate / 2.0
        amp = jnp.where(mask, a_lo * (1.0 - h) + a_hi * h, 0.0)
        sin_p, cos_p = _sincos(phase, trig)
        gc = g * jnp.where(mask, cos_p, 0.0)            # (8, up, fpb)
        gs = g * amp * (-sin_p)
        if reduce == 'mxu':
            dn = (((1,), (1,)), ((), ()))
            r_gc = jax.lax.dot_general(
                w_gc, gc, dn, preferred_element_type=jnp.float32)
            r_gs = jax.lax.dot_general(
                w_gs, gs, dn, preferred_element_type=jnp.float32)
            d_alo_ref[0, sl, :] = r_gc[0]               # (8, fpb)
            d_ahi_ref[0, sl, :] = r_gc[1]
            d_p0_ref[0, sl, :] = r_gs[0]
            d_flo_ref[0, sl, :] = r_gs[1]
            d_fhi_ref[0, sl, :] = r_gs[2]
        else:
            d_alo_ref[0, sl, :] = jnp.sum(gc * (1.0 - h), axis=1)
            d_ahi_ref[0, sl, :] = jnp.sum(gc * h, axis=1)
            d_p0_ref[0, sl, :] = jnp.sum(gs, axis=1)
            d_flo_ref[0, sl, :] = jnp.sum(
                gs * (w_scale * ((s + 1.0) - tri)), axis=1)
            d_fhi_ref[0, sl, :] = jnp.sum(gs * (w_scale * tri), axis=1)
        return carry

    jax.lax.fori_loop(0, kt_max, body, 0)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def render_framewise_pallas_skip_vjp(controls: FramewiseOscControls,
                                     g: Array,
                                     upsampling: int,
                                     sample_rate: int,
                                     interpret: bool = False,
                                     trig: str = 'native',
                                     reduce: str = 'vpu'
                                     ) -> FramewiseOscControls:
    """Control gradients for the skipping render; g is the audio
    cotangent (B, n_frames * up). Returns a FramewiseOscControls of
    gradients (matching jax.vjp of the jnp renderer up to float32
    reassociation)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f_lo, f_hi, a_lo, a_hi, phase0 = controls
    b, n_frames, k = f_lo.shape
    up = upsampling
    nyq = float(sample_rate) / 2.0

    fpb = _FPB_SKIP
    k_pad = -(-k // _KT) * _KT
    f_pad = -(-n_frames // fpb) * fpb
    pad = [(0, 0), (0, f_pad - n_frames), (0, k_pad - k)]

    def prep(x):
        if f_pad != n_frames or k_pad != k:
            x = jnp.pad(x, pad)
        return jnp.swapaxes(x, 1, 2)

    args = [prep(x) for x in (f_lo, f_hi, a_lo, a_hi, phase0)]
    g_t = jnp.swapaxes(
        jnp.pad(g.reshape(b, n_frames, up),
                ((0, 0), (0, f_pad - n_frames), (0, 0))), 1, 2)

    # Nyquist-only activity (see kernel docstring).
    audible = jnp.minimum(f_lo, f_hi) < nyq
    k_idx = jnp.arange(1, k + 1, dtype=jnp.int32)
    k_last = jnp.max(jnp.where(audible, k_idx, 0), axis=-1)
    k_last = jnp.pad(k_last, ((0, 0), (0, f_pad - n_frames)))
    kt_counts = -(-jnp.max(k_last.reshape(b, f_pad // fpb, fpb), -1) // _KT)

    in_spec = pl.BlockSpec((1, k_pad, fpb), lambda i, j, *_: (i, 0, j),
                           memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, up, fpb), lambda i, j, *_: (i, 0, j),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, k_pad, fpb), lambda i, j, *_: (i, 0, j),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, f_pad // fpb),
        in_specs=[in_spec] * 5 + [g_spec],
        out_specs=[out_spec] * 5,
    )
    kernel = functools.partial(_osc_skip_bwd_kernel, up=up,
                               sample_rate=float(sample_rate), trig=trig,
                               reduce=reduce)
    out_shape = [jax.ShapeDtypeStruct((b, k_pad, f_pad), jnp.float32)] * 5
    grads = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=24 * b * f_pad * up * k_pad,
            bytes_accessed=4 * (10 * b * f_pad * k_pad + b * f_pad * up),
            transcendentals=4 * b * f_pad * up * k_pad,
        ),
        interpret=interpret,
    )(kt_counts.astype(jnp.int32), *args, g_t)
    unprep = lambda x: jnp.swapaxes(x, 1, 2)[:, :n_frames, :k]
    return FramewiseOscControls(*(unprep(x) for x in grads))
