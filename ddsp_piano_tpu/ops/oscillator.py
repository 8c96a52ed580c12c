"""Additive cosine oscillator bank (L0 hot op).

Re-designs the reference's oscillator pipeline (inharm_synth.py:49-127:
resample envelopes to audio rate -> cumsum phase over n_samples -> cos ->
amp-multiply -> reduce over partials) as a TPU-first *framewise closed form*:

The reference materializes (batch, n_samples, n_partials) frequency and
amplitude envelopes in HBM and runs a serial length-n_samples cumsum. On TPU
that is bandwidth-bound and scan-unfriendly. Instead we exploit that both
resampling methods used by the reference are piecewise-closed-form per frame:

- 'linear' frequency envelopes (legacy bilinear coordinates) are linear in
  the intra-frame sample offset s:  f(k, s) = f_lo[k] + (s/up) * df[k]
- 'window' amplitude envelopes (overlapping Hann) are a raised-cosine
  crossfade:  a(k, s) = a_lo[k] + h[s] * (a_hi[k] - a_lo[k]),
  h[s] = sin^2(pi s / (2 up))

so the inclusive phase cumsum decomposes into a *frame-rate* cumsum of
per-frame phase increments plus an intra-frame closed form:

  phase(k, s) = P[k] + w_scale * ((s+1) f_lo[k] + df[k] s(s+1) / (2 up))
  P[k] = sum_{k'<k} w_scale * (up f_lo[k'] + df[k'] (up-1)/2)   (mod 2pi)

This needs only O(n_frames x n_partials) HBM traffic for controls plus the
O(n_samples) output, a ~2*n_partials reduction in bandwidth, and replaces the
serial n_samples cumsum with an n_frames one. Keeping P mod 2pi also gives
the numerical robustness of the reference's inference-only angular_cumsum
(inharm_synth.py:73-77) in *all* modes.

Both the plain-jnp framewise renderer and the ddsp-exact envelope pipeline
(`oscillator_bank_envelopes`, kept for parity tests) are provided; a Pallas
TPU kernel consuming the same framewise controls lives in
ddsp_piano_tpu.kernels.oscillator_pallas.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ddsp_piano_tpu.ops import core

Array = jax.Array

_2PI = 2.0 * math.pi


# -----------------------------------------------------------------------------
# Reference-exact envelope pipeline (for parity testing / arbitrary envelopes)
# -----------------------------------------------------------------------------


def oscillator_bank_envelopes(frequency_envelopes: Array,
                              amplitude_envelopes: Array,
                              sample_rate: int = 16000,
                              sum_sinusoids: bool = True,
                              use_angular_cumsum: bool = False,
                              initial_phase: Optional[Array] = None) -> Array:
    """Cosine oscillator bank from sample-rate envelopes.

    Mirrors reference cos_oscillator_bank (inharm_synth.py:49-84): Nyquist
    mask, Hz -> rad/sample, cumulative phase (plain or chunked-mod), cos.

    Args:
        frequency_envelopes: (batch, n_samples, n_sins) in Hz.
        amplitude_envelopes: (batch, n_samples, n_sins).
        initial_phase: optional (batch, 1, n_sins) carried phase offset.
    Returns:
        (batch, n_samples) if sum_sinusoids else (batch, n_samples, n_sins).
    """
    frequency_envelopes = core.f32(frequency_envelopes)
    amplitude_envelopes = core.remove_above_nyquist(
        frequency_envelopes, amplitude_envelopes, sample_rate)
    omegas = frequency_envelopes * (_2PI / float(sample_rate))
    if use_angular_cumsum:
        phases = core.angular_cumsum(omegas)
    else:
        phases = jnp.cumsum(omegas, axis=1)
    if initial_phase is not None:
        phases = phases + core.f32(initial_phase)
    audio = amplitude_envelopes * jnp.cos(phases)
    if sum_sinusoids:
        audio = jnp.sum(audio, axis=-1)
    return audio


# -----------------------------------------------------------------------------
# Framewise closed form
# -----------------------------------------------------------------------------


def _blocked_cumsum(x: Array, block: int = 32) -> Array:
    """Inclusive cumsum over axis 1, two-level blocked.

    XLA lowers jnp.cumsum to a reduce-window QUADRATIC in the scanned
    length (470 us of a 6.9 ms forward for (16, 1000, 128) frame-rate
    controls), and lax.associative_scan's log-depth tree is HBM-bound
    (measured worse). Splitting into length-`block` intra-block cumsums
    plus a short cumsum of block totals keeps the reduce-window cost at
    n*block + (n/block)^2 — ~4x less work for n=1000, block=32 — with the
    same memory-light lowering.
    """
    b, n, k = x.shape
    if n <= 2 * block:
        return jnp.cumsum(x, axis=1)
    n_pad = -(-n // block) * block
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
    xb = x.reshape(b, n_pad // block, block, k)
    within = jnp.cumsum(xb, axis=2)
    totals = within[:, :, -1]
    offsets = jnp.cumsum(totals, axis=1) - totals
    out = (within + offsets[:, :, None]).reshape(b, n_pad, k)
    return out[:, :n]


class FramewiseOscControls(NamedTuple):
    """Frame-rate controls fully determining the audio-rate render.

    All fields are (batch, n_frames, n_partials) float32.
    """
    f_lo: Array      # frequency at frame start (Hz)
    f_hi: Array      # frequency at next frame (clamped at the end) (Hz)
    a_lo: Array      # amplitude at frame start
    a_hi: Array      # amplitude at next frame (clamped at the end)
    phase0: Array    # accumulated phase at frame start, mod 2pi (radians)


def framewise_osc_controls(harmonic_frequencies: Array,
                           harmonic_amplitudes: Array,
                           upsampling: int,
                           sample_rate: int,
                           initial_phase: Optional[Array] = None,
                           lookahead: bool = False
                           ) -> FramewiseOscControls:
    """Precompute frame-rate oscillator controls (the cheap part).

    Args:
        harmonic_frequencies: (batch, n_frames, n_partials) Hz.
        harmonic_amplitudes: (batch, n_frames, n_partials).
        upsampling: samples per frame (sample_rate / frame_rate).
        sample_rate: audio sample rate.
        initial_phase: optional (batch, 1, n_partials) carry phase for
            streaming synthesis (radians); defaults to zero.
        lookahead: if True the last input frame is used only as the
            interpolation endpoint (renders n_frames - 1 frames). This is
            the chunk-exact streaming mode: passing chunk [k, k+n+1) with
            the phase carried from the previous chunk reproduces the
            one-shot render bit-for-bit away from float error.
    """
    f = core.f32(harmonic_frequencies)
    a = core.f32(harmonic_amplitudes)
    if lookahead:
        f, f_hi = f[:, :-1], f[:, 1:]
        a, a_hi = a[:, :-1], a[:, 1:]
    else:
        f_hi = jnp.concatenate([f[:, 1:], f[:, -1:]], axis=1)
        a_hi = jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
    up = float(upsampling)
    w_scale = _2PI / float(sample_rate)
    # Per-frame phase increment of the linearly-interpolated frequency ramp:
    # sum_{s=0}^{up-1} w(k, s) = w_scale * (up * f_lo + df * (up - 1) / 2).
    inc = w_scale * (up * f + (f_hi - f) * ((up - 1.0) / 2.0))
    inc = jnp.mod(inc, _2PI)
    phase0 = jnp.mod(_blocked_cumsum(inc) - inc, _2PI)
    if initial_phase is not None:
        phase0 = jnp.mod(phase0 + core.f32(initial_phase), _2PI)
    return FramewiseOscControls(f, f_hi, a, a_hi, phase0)


def framewise_final_phase(controls: FramewiseOscControls,
                          upsampling: int, sample_rate: int) -> Array:
    """Phase carry after the last frame, for streaming synthesis.

    Returns (batch, 1, n_partials) radians, mod 2pi: the phase an
    (exclusive) accumulation would reach at the first sample of the next
    chunk.
    """
    up = float(upsampling)
    w_scale = _2PI / float(sample_rate)
    last_inc = w_scale * (up * controls.f_lo[:, -1:] +
                          (controls.f_hi[:, -1:] - controls.f_lo[:, -1:])
                          * ((up - 1.0) / 2.0))
    return jnp.mod(controls.phase0[:, -1:] + last_inc, _2PI)


def render_framewise(controls: FramewiseOscControls,
                     upsampling: int,
                     sample_rate: int,
                     sum_sinusoids: bool = True,
                     backend: str = 'auto') -> Array:
    """Render audio from framewise controls.

    Backends:
    - 'jnp' — XLA fuses the closed-form compute into the partial-axis
      reduce; computes EVERY partial (Nyquist-masked ones included) and
      sits at the VPU transcendental roofline.
    - 'pallas' — round-1 fused kernel, same all-partials work (kept for
      comparison; measured the same speed as 'jnp').
    - 'pallas_skip' — round-2 kernel that skips 8-partial sublane tiles
      that are entirely silent or Nyquist-masked (piano content masks the
      majority of (voice, partial) pairs). Numerically equivalent to
      'jnp' up to float32 reassociation of the partial sum.
    Under 'auto': 'pallas_skip' on TPU, 'jnp' elsewhere; override with
    DDSP_PIANO_TPU_PALLAS=skip|1|0 (skip = skipping kernel, 1 = round-1
    kernel, 0 = force jnp).

    Returns (batch, n_frames * upsampling) audio, or with a trailing
    n_partials axis if sum_sinusoids=False.
    """
    import os
    if backend == 'auto':
        env = os.environ.get('DDSP_PIANO_TPU_PALLAS', '')
        if sum_sinusoids and jax.default_backend() == 'tpu':
            backend = {'1': 'pallas', '0': 'jnp',
                       'skip': 'pallas_skip'}.get(env, 'pallas_skip')
        else:
            backend = 'jnp'
    if backend in ('pallas', 'pallas_skip') and not sum_sinusoids:
        raise ValueError("The Pallas oscillator kernels reduce over "
                         "partials; use backend='jnp' for per-sinusoid "
                         "output.")
    if backend == 'pallas':
        from ddsp_piano_tpu.kernels.oscillator_pallas import (
            render_framewise_pallas)
        return render_framewise_pallas(controls, upsampling, sample_rate)
    if backend == 'pallas_skip':
        # Differentiable wrapper: pallas forward, matching Pallas VJP
        # (training gradients keep flowing when the kernel is the default).
        return _render_skip_grad(upsampling, sample_rate,
                                 _osc_trig())(*controls)

    f_lo, f_hi, a_lo, a_hi, phase0 = controls
    b, n_frames, n_partials = f_lo.shape
    up = upsampling
    w_scale = _2PI / float(sample_rate)

    s = jnp.arange(up, dtype=jnp.float32)                    # (up,)
    s_col = s[jnp.newaxis, jnp.newaxis, :, jnp.newaxis]      # (1,1,up,1)
    # Intra-frame phase: (s+1) * f_lo + df * s(s+1)/(2*up), scaled to radians.
    df = (f_hi - f_lo)[:, :, jnp.newaxis, :]                 # (b,nf,1,K)
    f0_ = f_lo[:, :, jnp.newaxis, :]
    tri = (s_col * (s_col + 1.0)) * (0.5 / up)
    phase = (phase0[:, :, jnp.newaxis, :]
             + w_scale * ((s_col + 1.0) * f0_ + df * tri))   # (b,nf,up,K)
    # Amplitude crossfade (Hann overlap-add closed form).
    h = jnp.sin((math.pi / (2.0 * up)) * s) ** 2             # (up,)
    h = h[jnp.newaxis, jnp.newaxis, :, jnp.newaxis]
    amp = a_lo[:, :, jnp.newaxis, :] * (1.0 - h) + a_hi[:, :, jnp.newaxis, :] * h
    # Sample-rate Nyquist mask on the interpolated frequency.
    freq = f0_ + df * (s_col * (1.0 / up))
    amp = amp * (freq < sample_rate / 2.0).astype(jnp.float32)

    wav = amp * jnp.cos(phase)                               # (b,nf,up,K)
    if sum_sinusoids:
        audio = jnp.sum(wav, axis=-1)                        # (b,nf,up)
        return audio.reshape(b, n_frames * up)
    return wav.reshape(b, n_frames * up, n_partials)


def _osc_trig() -> str:
    """In-kernel trig path for the skipping oscillator kernels, read at
    trace time: 'poly' (default — shared Cody-Waite range reduction +
    degree-6 sincos polynomials; measured 1.96x on the forward kernel and
    1.6x on the backward vs native transcendentals on TPU v5e, with max
    abs audio delta 1.5e-7 on a 0.44-peak scene — inside the existing
    float32-reassociation budget) or 'native' via DDSP_PIANO_TPU_TRIG."""
    import os
    trig = os.environ.get('DDSP_PIANO_TPU_TRIG', 'poly')
    if trig not in ('poly', 'native'):
        # A silently-misread flag would corrupt every A/B measurement that
        # keys on it ('sqrt' is a bwd-kernel-only experiment, not an
        # end-to-end mode — request it via the kernel API directly).
        raise ValueError(
            f"DDSP_PIANO_TPU_TRIG={trig!r}: expected 'poly' or 'native'")
    return trig


@functools.lru_cache(maxsize=None)
def _render_skip_partitioned(upsampling: int, sample_rate: int,
                             trig: str = 'poly'):
    """Batch-partitionable wrapper for the skipping forward kernel.

    A bare pallas_call has no SPMD partitioning rule, so under a
    multi-chip mesh GSPMD/Shardy would all-gather the controls and
    REPLICATE the oscillator on every chip (verified on the virtual CPU
    mesh: output came back fully replicated). custom_partitioning
    declares the obvious rule — the kernel is embarrassingly parallel
    over the voice-batch axis — so each chip renders only its batch
    shard.
    """
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    def _render(f_lo, f_hi, a_lo, a_hi, phase0):
        from ddsp_piano_tpu.kernels.oscillator_pallas import (
            render_framewise_pallas_skip)
        return render_framewise_pallas_skip(
            FramewiseOscControls(f_lo, f_hi, a_lo, a_hi, phase0),
            upsampling, sample_rate, False, trig)

    render_cp = custom_partitioning(_render)

    def _bspec(named_sharding):
        spec = named_sharding.spec
        return spec[0] if len(spec) > 0 else None

    def infer(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh, PartitionSpec(
            _bspec(arg_shapes[0].sharding)))

    def partition(mesh, arg_shapes, result_shape):
        b = _bspec(arg_shapes[0].sharding)
        ctrl = NamedSharding(mesh, PartitionSpec(b, None, None))
        out = NamedSharding(mesh, PartitionSpec(b))
        return mesh, _render, out, tuple([ctrl] * 5)

    render_cp.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule='b i j, b i j, b i j, b i j, b i j -> b k')
    return render_cp


def _osc_bwd_knobs(trig: str):
    """(trig, reduce) for the BACKWARD kernel, read at trace time.

    DDSP_PIANO_TPU_TRIG_BWD: gradient-only trig override — 'poly4'
    (degree-4 sincos, ~4e-5 rel grad delta; parity:
    benchmarks/parity_osc_bwd_variants.py) or 'sqrt' are valid here even
    though they never are for rendered audio. Default: 'poly4' when the
    forward runs 'poly' (round-5 A/B, benchmarks/ab_osc_bwd.py: dafx22
    train step 28.25 -> 27.30 ms median, 6 interleaved reps); follows the
    forward trig under DDSP_PIANO_TPU_TRIG=native so that remains a full
    native-transcendental revert.
    DDSP_PIANO_TPU_OSC_BWD_REDUCE: 'vpu' (default) or 'mxu' (weighted
    up-axis reductions as dot_generals on the idle MXU — measured
    NEGATIVE, +0.4 ms/step in the same A/B; kept as the measurement
    arm)."""
    import os
    default_bwd = 'poly4' if trig == 'poly' else trig
    bwd_trig = os.environ.get('DDSP_PIANO_TPU_TRIG_BWD', default_bwd)
    if bwd_trig not in ('poly', 'native', 'poly4', 'sqrt'):
        raise ValueError(
            f"DDSP_PIANO_TPU_TRIG_BWD={bwd_trig!r}: expected 'poly', "
            "'native', 'poly4' or 'sqrt'")
    reduce = os.environ.get('DDSP_PIANO_TPU_OSC_BWD_REDUCE', 'vpu')
    if reduce not in ('vpu', 'mxu'):
        raise ValueError(
            f"DDSP_PIANO_TPU_OSC_BWD_REDUCE={reduce!r}: expected "
            "'vpu' or 'mxu'")
    return bwd_trig, reduce


@functools.lru_cache(maxsize=None)
def _render_skip_vjp_partitioned(upsampling: int, sample_rate: int,
                                 trig: str = 'poly',
                                 reduce: str = 'vpu'):
    """Batch-partitionable wrapper for the backward kernel (same story as
    _render_skip_partitioned: grads shard over the voice-batch axis)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    def _vjp(f_lo, f_hi, a_lo, a_hi, phase0, g):
        from ddsp_piano_tpu.kernels.oscillator_pallas import (
            render_framewise_pallas_skip_vjp)
        return tuple(render_framewise_pallas_skip_vjp(
            FramewiseOscControls(f_lo, f_hi, a_lo, a_hi, phase0), g,
            upsampling, sample_rate, False, trig, reduce))

    vjp_cp = custom_partitioning(_vjp)

    def _bspec(named_sharding):
        spec = named_sharding.spec
        return spec[0] if len(spec) > 0 else None

    def infer(mesh, arg_shapes, result_shape):
        b = _bspec(arg_shapes[0].sharding)
        return tuple([NamedSharding(mesh, PartitionSpec(b, None, None))] * 5)

    def partition(mesh, arg_shapes, result_shape):
        b = _bspec(arg_shapes[0].sharding)
        ctrl = NamedSharding(mesh, PartitionSpec(b, None, None))
        gsh = NamedSharding(mesh, PartitionSpec(b))
        return (mesh, _vjp, tuple([ctrl] * 5),
                tuple([ctrl] * 5) + (gsh,))

    vjp_cp.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule=('b i j, b i j, b i j, b i j, b i j, b k -> '
                       'b i j, b i j, b i j, b i j, b i j'))
    return vjp_cp


@functools.lru_cache(maxsize=None)
def _render_skip_batched(upsampling: int, sample_rate: int,
                         trig: str = 'poly'):
    """jax.vmap support for the partitioned skipping kernel.

    The custom_partitioning primitive has no batching rule, so a bare
    jax.vmap over it fails (round-2 this forced evaluate_model.py onto the
    slow jnp renderer for its per-segment-rng vmapped step). The kernel is
    already embarrassingly parallel over its leading voice-batch axis, so
    the vmap rule simply collapses the mapped axis into it and reshapes
    back — the kernel runs once over (V*B, ...) instead of V times.
    """
    from jax.custom_batching import custom_vmap

    render_cp = _render_skip_partitioned(upsampling, sample_rate, trig)

    @custom_vmap
    def render(f_lo, f_hi, a_lo, a_hi, phase0):
        return render_cp(f_lo, f_hi, a_lo, a_hi, phase0)

    @render.def_vmap
    def _vmap_rule(axis_size, in_batched, *args):
        args = [x if batched
                else jnp.broadcast_to(x[None], (axis_size,) + x.shape)
                for x, batched in zip(args, in_batched)]
        v, b = args[0].shape[:2]
        flat = [x.reshape((v * b,) + x.shape[2:]) for x in args]
        out = render(*flat)   # recurse: nested vmaps collapse level by level
        return out.reshape((v, b) + out.shape[1:]), True

    return render


@functools.lru_cache(maxsize=None)
def _render_skip_vjp_batched(upsampling: int, sample_rate: int,
                             trig: str = 'poly',
                             reduce: str = 'vpu'):
    """vmap rule for the backward kernel (jax.vmap of a custom_vjp function
    vmaps its bwd too, so the gradient path needs the same collapse)."""
    from jax.custom_batching import custom_vmap

    vjp_cp = _render_skip_vjp_partitioned(upsampling, sample_rate, trig,
                                          reduce)

    @custom_vmap
    def vjp(f_lo, f_hi, a_lo, a_hi, phase0, g):
        return vjp_cp(f_lo, f_hi, a_lo, a_hi, phase0, g)

    @vjp.def_vmap
    def _vmap_rule(axis_size, in_batched, *args):
        args = [x if batched
                else jnp.broadcast_to(x[None], (axis_size,) + x.shape)
                for x, batched in zip(args, in_batched)]
        v, b = args[0].shape[:2]
        flat = [x.reshape((v * b,) + x.shape[2:]) for x in args]
        outs = vjp(*flat)
        return (tuple(o.reshape((v, b) + o.shape[1:]) for o in outs),
                (True,) * 5)

    return vjp


@functools.lru_cache(maxsize=None)
def _render_skip_grad(upsampling: int, sample_rate: int,
                      trig: str = 'poly'):
    """custom_vjp wrapper for the skipping Pallas kernel.

    Forward: render_framewise_pallas_skip. Backward: a matching Pallas
    kernel computing the five control gradients with the same tile-skip
    structure — the jnp VJP materializes the (batch, frames, up, K)
    intermediates in HBM (~5 GB at the dafx22 training shapes, ~60 ms of
    a 111 ms train step). DDSP_PIANO_TPU_PALLAS_BWD=0 falls back to the
    jnp VJP (reference/debug path).
    """

    def jnp_render(f_lo, f_hi, a_lo, a_hi, phase0):
        return render_framewise(
            FramewiseOscControls(f_lo, f_hi, a_lo, a_hi, phase0),
            upsampling, sample_rate, backend='jnp')

    @jax.custom_vjp
    def render(f_lo, f_hi, a_lo, a_hi, phase0):
        return _render_skip_batched(upsampling, sample_rate, trig)(
            f_lo, f_hi, a_lo, a_hi, phase0)

    def fwd(*controls):
        return render(*controls), controls

    def bwd(controls, g):
        import os
        if os.environ.get('DDSP_PIANO_TPU_PALLAS_BWD', '') == '0':
            _, vjp = jax.vjp(jnp_render, *controls)
            return vjp(g)
        bwd_trig, reduce = _osc_bwd_knobs(trig)
        return _render_skip_vjp_batched(upsampling, sample_rate, bwd_trig,
                                        reduce)(*controls, g)

    render.defvjp(fwd, bwd)
    return render


# -----------------------------------------------------------------------------
# Harmonic synthesis front door
# -----------------------------------------------------------------------------


def harmonic_synthesis(frequencies: Array,
                       amplitudes: Array,
                       harmonic_shifts: Optional[Array] = None,
                       harmonic_distribution: Optional[Array] = None,
                       n_samples: int = 64000,
                       sample_rate: int = 16000,
                       amp_resample_method: str = 'window',
                       sum_sinusoids: bool = True,
                       use_angular_cumsum: bool = False,
                       method: str = 'framewise',
                       initial_phase: Optional[Array] = None,
                       return_final_phase: bool = False,
                       lookahead: bool = False):
    """Frame-rate harmonic controls -> audio.

    Behavioral equivalent of reference harmonic_synthesis
    (inharm_synth.py:87-127). `method='framewise'` (default) uses the fused
    closed-form path; `method='envelopes'` reproduces the reference's
    resample-then-cumsum pipeline exactly (used in parity tests).

    Args:
        frequencies: (batch, n_frames, 1) fundamental in Hz.
        amplitudes: (batch, n_frames, 1) global amplitude.
        harmonic_shifts: optional (batch, n_frames, n_harmonics).
        harmonic_distribution: optional (batch, n_frames, n_harmonics).
        n_samples: output length; the framewise path requires
            n_samples % n_frames == 0.
        initial_phase: optional (batch, 1, n_harmonics) streaming phase carry.
        return_final_phase: if True, also return the end-of-chunk phase.
    """
    frequencies = core.f32(frequencies)
    amplitudes = core.f32(amplitudes)

    if harmonic_distribution is not None:
        harmonic_distribution = core.f32(harmonic_distribution)
        n_harmonics = harmonic_distribution.shape[-1]
    elif harmonic_shifts is not None:
        n_harmonics = harmonic_shifts.shape[-1]
    else:
        n_harmonics = 1

    harmonic_frequencies = core.get_harmonic_frequencies(frequencies,
                                                         n_harmonics)
    if harmonic_shifts is not None:
        harmonic_frequencies = harmonic_frequencies * (1.0 + harmonic_shifts)

    if harmonic_distribution is not None:
        harmonic_amplitudes = amplitudes * harmonic_distribution
    else:
        harmonic_amplitudes = amplitudes

    n_frames = frequencies.shape[1] - (1 if lookahead else 0)
    framewise_ok = (method == 'framewise'
                    and n_samples % n_frames == 0
                    and n_samples // n_frames >= 1
                    and amp_resample_method == 'window')
    if lookahead and not framewise_ok:
        raise ValueError("lookahead streaming requires the framewise path "
                         "(n_samples divisible by n_frames - 1, window amps)")
    if framewise_ok:
        up = n_samples // n_frames
        controls = framewise_osc_controls(harmonic_frequencies,
                                          harmonic_amplitudes,
                                          up, sample_rate,
                                          initial_phase=initial_phase,
                                          lookahead=lookahead)
        audio = render_framewise(controls, up, sample_rate,
                                 sum_sinusoids=sum_sinusoids)
        if return_final_phase:
            return audio, framewise_final_phase(controls, up, sample_rate)
        return audio

    # Fallback: reference-exact envelope pipeline (phase carry honored —
    # a dropped initial_phase would click at every streaming chunk edge).
    frequency_envelopes = core.resample(harmonic_frequencies, n_samples)
    amplitude_envelopes = core.resample(harmonic_amplitudes, n_samples,
                                        method=amp_resample_method)
    audio = oscillator_bank_envelopes(frequency_envelopes,
                                      amplitude_envelopes,
                                      sample_rate=sample_rate,
                                      sum_sinusoids=sum_sinusoids,
                                      use_angular_cumsum=use_angular_cumsum,
                                      initial_phase=initial_phase)
    if return_final_phase:
        omegas = frequency_envelopes * (_2PI / float(sample_rate))
        final = jnp.sum(omegas, axis=1, keepdims=True)
        if initial_phase is not None:
            final = final + core.f32(initial_phase)
        return audio, jnp.mod(final, _2PI)
    return audio
