"""Feedback-Delay-Network reverb IR synthesis (frequency sampling).

Functional JAX equivalent of the reference FeedbackDelayNetwork IR math
(/root/reference/ddsp_piano/modules/fdn_reverb.py:178-360): 8 delay lines
with fixed prime delays, Householder-style mixing matrix, one-pole low-pass
T60 control per line, 4 series allpass decorrelators per line, fractional
delay via first-order allpass interpolation; H(e^jw) is evaluated on the
rfft grid of ``freq_points = 2 * sample_rate`` points and inverse-rFFT'd to
a late IR, to which a short learned early-reflection FIR is added.

TPU design: the reference inverts a dense 8x8 complex matrix per frequency
bin ((sr+1) x 8 x 8 inverses). But the FDN's mixing matrix is the fixed
Householder-style M = -I + 0.5*ones — a rank-1 update of -I — so the system
matrix per bin,

    A = I - diag(lp) M diag(ap * d) = diag(1 + c1*c2) - 0.5 * c1 c2^T,

(c1 = one-pole low-pass transfer, c2 = allpass * delay transfer) is
diagonal-plus-rank-1, and Sherman-Morrison gives A^{-1} g_in in closed form
with only elementwise complex ops and two reductions over the 8 lines. This
removes the batched LU entirely: the whole late-IR evaluation is a fused
elementwise program over (sr+1, 8) followed by one irfft — exactly the kind
of program XLA/TPU executes at HBM speed. A generic real-block batched
solve is kept as a fallback for future non-Householder mixing matrices.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ddsp_piano_tpu.ops import filters

Array = jax.Array

# Fixed delay-line lengths (samples) and allpass delays, as in the reference
# (fdn_reverb.py:96, :102-113) - these are untrained constants of the design.
DEFAULT_DELAY_VALUES = (233.0, 311.0, 421.0, 461.0, 587.0, 613.0, 789.0, 891.0)
DEFAULT_DELAYS_ALLPASS = (
    (131.0, 151.0, 337.0, 353.0),
    (103.0, 173.0, 331.0, 373.0),
    (89.0, 181.0, 307.0, 401.0),
    (79.0, 197.0, 281.0, 419.0),
    (61.0, 211.0, 257.0, 431.0),
    (47.0, 229.0, 251.0, 443.0),
    (81.0, 189.0, 287.0, 407.0),
    (91.0, 203.0, 321.0, 377.0),
)


def householder_mixing_matrix(n: int) -> Array:
    """-I + 0.5 * ones: the reference's fixed mixing matrix."""
    return -jnp.eye(n, dtype=jnp.float32) + 0.5 * jnp.ones((n, n),
                                                           jnp.float32)


def _complex_block_solve(a: Array, b: Array) -> Array:
    """Solve complex a @ x = b via the real 2Nx2N block embedding.

    a: (..., N, N) complex represented as (re, im) pair; b likewise.
    Returns complex solution as a jnp complex64 array.
    """
    ar, ai = jnp.real(a), jnp.imag(a)
    br, bi = jnp.real(b), jnp.imag(b)
    top = jnp.concatenate([ar, -ai], axis=-1)
    bot = jnp.concatenate([ai, ar], axis=-1)
    a_block = jnp.concatenate([top, bot], axis=-2)
    b_block = jnp.concatenate([br, bi], axis=-2)
    x = jnp.linalg.solve(a_block, b_block)
    n = a.shape[-1]
    return jax.lax.complex(x[..., :n, :], x[..., n:, :])


class FDNParams(NamedTuple):
    """Per-instance (trainable or embedded) FDN controls."""
    input_gain: Array       # (n_lines,)
    output_gain: Array      # (n_lines,)
    gain_allpass: Array     # (n_lines, n_allpass)
    delays_allpass: Array   # (n_lines, n_allpass)
    time_rev_0_sec: Array   # () or (1,) reverberation time at DC (s)
    alpha_tone: Array       # () or (1,) in (0, 1): HF/DC decay ratio
    early_ir: Array         # (early_ir_length,)


def fdn_late_ir(params: FDNParams,
                sample_rate: float,
                delay_values: Optional[Array] = None,
                freq_points: Optional[int] = None,
                use_householder_closed_form: bool = True) -> Array:
    """Late-reverb IR of length ``freq_points`` (default 2 * sample_rate)."""
    if delay_values is None:
        delay_values = jnp.asarray(DEFAULT_DELAY_VALUES, jnp.float32)
    delay_values = jnp.asarray(delay_values, jnp.float32)
    n_lines = delay_values.shape[0]
    if freq_points is None:
        freq_points = int(2 * sample_rate)
    n_bins = freq_points // 2 + 1

    mixing = householder_mixing_matrix(n_lines).astype(jnp.complex64)

    wk = (2.0 * math.pi / freq_points) * jnp.arange(n_bins,
                                                    dtype=jnp.float32)
    iwk = jax.lax.complex(jnp.zeros_like(wk), wk)           # (bins,)
    z_inv = jnp.exp(-iwk)                                    # e^{-jw}

    # Integer-sample delay transfer z^{-floor(d)} per line: (bins, lines)
    z_d = jnp.exp(-iwk[:, None]
                  * jnp.floor(delay_values)[None, :].astype(jnp.complex64))
    # Fractional-delay first-order allpass interpolation.
    d_eta = (delay_values - jnp.floor(delay_values)).astype(jnp.complex64)
    eta = (1.0 - d_eta) / (1.0 + d_eta)                      # (lines,)
    allpass_interp = ((eta[None, :] + z_inv[:, None])
                      / (1.0 + eta[None, :] * z_inv[:, None]))
    delay_diag = z_d * allpass_interp                        # (bins, lines)

    # One-pole low-pass per line controlling T60(DC) and T60(Nyquist).
    t60 = jnp.reshape(params.time_rev_0_sec, ())
    alpha = jnp.reshape(params.alpha_tone, ())
    delay_sec = (delay_values
                 + jnp.sum(params.delays_allpass, axis=-1)) / sample_rate
    k = 10.0 ** (-3.0 * delay_sec / t60)
    kpi = 10.0 ** (-3.0 * delay_sec / (alpha * t60))
    g = (2.0 * k * kpi / (k + kpi)).astype(jnp.complex64)    # (lines,)
    p = ((k - kpi) / (k + kpi)).astype(jnp.complex64)
    lp = g[None, :] / (1.0 - p[None, :] * z_inv[:, None] + 1e-8)

    # Series allpass decorrelators per line (positive-exponent convention as
    # in the reference, fdn_reverb.py:300).
    ga = params.gain_allpass.astype(jnp.complex64)           # (lines, n_ap)
    da = params.delays_allpass.astype(jnp.complex64)
    z_ap = jnp.exp(iwk[:, None, None] * da[None, :, :])      # (bins, lines, ap)
    ap = jnp.prod((1.0 + ga[None] * z_ap) / (ga[None] + z_ap), axis=-1)

    g_in = params.input_gain.astype(jnp.complex64)           # (lines,)
    g_out = params.output_gain.astype(jnp.complex64)

    if use_householder_closed_form:
        # A = diag(1 + c1*c2) - 0.5 * c1 c2^T  (see module docstring).
        c1 = lp                                              # (bins, lines)
        c2 = ap * delay_diag
        d_prime = 1.0 + c1 * c2
        g_over = g_in[None, :] / d_prime                     # D'^-1 g
        u_over = c1 / d_prime                                # D'^-1 c1
        vg = jnp.sum(c2 * g_over, axis=-1, keepdims=True)    # c2^T D'^-1 g
        vu = jnp.sum(c2 * u_over, axis=-1, keepdims=True)    # c2^T D'^-1 c1
        x = g_over + 0.5 * u_over * vg / (1.0 - 0.5 * vu)
    else:
        # Generic fallback: batched real-block solve of (I - F D) x = g_in.
        feedback = (lp[:, :, None] * mixing[None, :, :]) * ap[:, None, :]
        eye = jnp.eye(n_lines, dtype=jnp.complex64)[None]
        system = eye - feedback * delay_diag[:, None, :]
        b = jnp.broadcast_to(g_in[None, :, None], (n_bins, n_lines, 1))
        x = _complex_block_solve(system, b)[..., 0]          # (bins, lines)

    h = jnp.sum(g_out[None, :] * delay_diag * x, axis=-1)    # (bins,)
    return jnp.fft.irfft(h, n=freq_points).astype(jnp.float32)


def fdn_ir(params: FDNParams,
           sample_rate: float,
           delay_values: Optional[Array] = None,
           freq_points: Optional[int] = None) -> Array:
    """Full reverb IR: late FDN tail plus zero-padded early FIR."""
    late = fdn_late_ir(params, sample_rate, delay_values, freq_points)
    early = jnp.reshape(params.early_ir, (-1,))
    n = late.shape[0]
    if early.shape[0] < n:
        early = jnp.pad(early, (0, n - early.shape[0]))
    return early[:n] + late


def fdn_reverb_signal(audio: Array, ir: Array) -> Array:
    """Apply the FDN IR by FFT convolution (no dry-masking, no added dry),
    matching the reference's FeedbackDelayNetwork.get_signal
    (fdn_reverb.py:407-410)."""
    if ir.ndim == 1:
        ir = ir[jnp.newaxis, :]
    return filters.fft_convolve(audio, ir, padding='same',
                                delay_compensation=0)
