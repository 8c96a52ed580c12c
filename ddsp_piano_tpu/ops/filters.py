"""FIR filtering ops: frequency-sampled filters and FFT convolution.

JAX equivalents of the ``ddsp.core`` filtering surface consumed by the
reference's noise synth and reverbs (frequency_filter at
/root/reference/ddsp_piano/modules/filtered_noise_synth.py:41-42;
fft_convolve at /root/reference/ddsp_piano/modules/fdn_reverb.py:407-410).

Design notes (TPU): the time-varying FIR path is expressed as batched rfft /
irfft + a windowed overlap-add. XLA lowers these to fused TPU FFTs; the
overlap-add is re-expressed as a pad+reshape+sum (two shifted interleavings)
instead of a scatter, which TPU handles poorly.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ddsp_piano_tpu.ops import core

Array = jax.Array


def get_fft_size(frame_size: int, ir_size: int,
                 power_of_2: bool = True) -> int:
    """Smallest FFT length holding the linear convolution of the two."""
    conv_size = frame_size + ir_size - 1
    if power_of_2:
        return int(2 ** math.ceil(math.log2(conv_size)))
    return conv_size


def overlap_and_add(frames: Array, frame_step: int) -> Array:
    """Overlap-add (..., n_frames, frame_length) -> (..., output_len).

    Equivalent to tf.signal.overlap_and_add, implemented scatter-free:
    each frame is split into segments of frame_step, laid out on a
    (n_frames + n_segments - 1, frame_step) grid diagonally and summed.
    """
    *batch, n_frames, frame_length = frames.shape
    out_len = frame_step * (n_frames - 1) + frame_length
    if frame_length % frame_step != 0:
        # Generic (rare) case: pad frame length up to a multiple of step.
        pad = frame_step - frame_length % frame_step
        frames = jnp.pad(frames, [(0, 0)] * (frames.ndim - 1) + [(0, pad)])
        frame_length += pad
    segments = frame_length // frame_step
    # (..., n_frames, segments, frame_step)
    x = frames.reshape(*batch, n_frames, segments, frame_step)
    out_frames = n_frames + segments - 1
    # Accumulate each segment diagonal at its shifted position.
    out = jnp.zeros((*batch, out_frames, frame_step), dtype=frames.dtype)
    for s in range(segments):
        out = out.at[..., s:s + n_frames, :].add(x[..., :, s, :])
    return out.reshape(*batch, out_frames * frame_step)[..., :out_len]


def crop_and_compensate_delay(audio: Array, audio_size: int, ir_size: int,
                              padding: str = 'same',
                              delay_compensation: int = -1) -> Array:
    """Crop convolution output and compensate filter group delay."""
    if padding == 'valid':
        crop_size = ir_size + audio_size - 1
    elif padding == 'same':
        crop_size = audio_size
    else:
        raise ValueError(f"padding must be 'valid' or 'same', got {padding!r}")
    start = ((ir_size - 1) // 2 - 1 if delay_compensation < 0
             else delay_compensation)
    return audio[..., start:start + crop_size]


# Single-IR convolutions whose one-shot FFT would be at least this long
# take the uniformly-partitioned path instead: one huge 1-D transform is
# the SLOWEST way to run an FFT on TPU (measured 0.34 ms for the v2
# reverb's 2^18 rfft/irfft pair vs ~0.02 ms for the same convolution as
# batched 8192-point transforms + a 12-term block-index MAC;
# benchmarks/profile_synth_stages.py, round 4).
_PARTITIONED_MIN_FFT = 32768
_PARTITION_BLOCK = 4096


def _fft_convolve_partitioned(audio: Array, impulse_response: Array,
                              padding: str, delay_compensation: int,
                              block: int = _PARTITION_BLOCK) -> Array:
    """Uniformly-partitioned convolution of a single (long) IR per batch.

    Exact rewrite of the one-big-FFT path (same linear convolution, float
    reassociation only): both signals split into `block`-sample parts,
    each part FFT'd at 2*block, and output part m = sum_j A[m-j] * H[j]
    (a short static MAC over IR parts), then irfft + overlap-add. All
    transforms are batched pow2 FFTs of moderate size — the shape TPU
    executes well — instead of one giant serial transform.
    """
    bsz, n = audio.shape
    bir, ir_size = impulse_response.shape
    n_a = -(-n // block)
    n_h = -(-ir_size // block)
    fftn = 2 * block
    a = jnp.pad(audio, ((0, 0), (0, n_a * block - n))).reshape(
        bsz, n_a, block)
    h = jnp.pad(impulse_response,
                ((0, 0), (0, n_h * block - ir_size))).reshape(
        bir, n_h, block)
    a_f = jnp.fft.rfft(a, n=fftn, axis=-1)          # (b, n_a, F)
    h_f = jnp.fft.rfft(h, n=fftn, axis=-1)          # (bir, n_h, F)
    n_out = n_a + n_h - 1
    y_f = jnp.zeros((bsz, n_out, a_f.shape[-1]), a_f.dtype)
    for j in range(n_h):
        y_f = y_f.at[:, j:j + n_a].add(a_f * h_f[:, j:j + 1])
    y = jnp.fft.irfft(y_f, n=fftn, axis=-1)         # (b, n_out, 2*block)
    out = overlap_and_add(y, block)
    # The one-big-FFT path this replaces produces fft_size >= conv_size
    # samples (zero beyond the linear convolution), while overlap-add here
    # yields exactly (n_a + n_h) * block. padding='valid' crops
    # [start : start + n + ir - 1], which can extend past that — zero-pad
    # up to the crop window so both paths return identical lengths/values.
    crop_size = n + ir_size - 1 if padding == 'valid' else n
    start = ((ir_size - 1) // 2 - 1 if delay_compensation < 0
             else delay_compensation)
    need = start + crop_size
    if out.shape[-1] < need:
        out = jnp.pad(out, ((0, 0), (0, need - out.shape[-1])))
    return crop_and_compensate_delay(out, n, ir_size, padding,
                                     delay_compensation)


def fft_convolve(audio: Array, impulse_response: Array,
                 padding: str = 'same',
                 delay_compensation: int = -1) -> Array:
    """(Time-varying) FIR filtering of audio via FFT block convolution.

    Args:
        audio: (batch, n_samples).
        impulse_response: (batch, ir_size) for a single IR, or
            (batch, n_frames, ir_size) for a time-varying filter; the audio
            is cut into n_frames equal blocks, each convolved with its IR,
            then overlap-added.
    """
    audio = core.f32(audio)
    impulse_response = core.f32(impulse_response)
    batch_size, audio_size = audio.shape
    if impulse_response.ndim == 2:
        if (get_fft_size(audio_size, impulse_response.shape[-1])
                >= _PARTITIONED_MIN_FFT):
            if impulse_response.shape[0] not in (batch_size, 1):
                raise ValueError(
                    f"Batch size of impulse response "
                    f"({impulse_response.shape[0]}) must match audio "
                    f"({batch_size}) or be 1.")
            return _fft_convolve_partitioned(audio, impulse_response,
                                             padding, delay_compensation)
        impulse_response = impulse_response[:, jnp.newaxis, :]
    batch_size_ir, n_ir_frames, ir_size = impulse_response.shape
    if batch_size_ir not in (batch_size, 1):
        raise ValueError(
            f"Batch size of impulse response ({batch_size_ir}) must match "
            f"audio ({batch_size}) or be 1.")

    frame_size = -(-audio_size // n_ir_frames)
    hop_size = frame_size
    # Non-overlapping framing with end padding.
    pad = n_ir_frames * frame_size - audio_size
    audio_frames = jnp.pad(audio, ((0, 0), (0, pad))).reshape(
        batch_size, n_ir_frames, frame_size)

    fft_size = get_fft_size(frame_size, ir_size, power_of_2=True)
    audio_fft = jnp.fft.rfft(audio_frames, n=fft_size, axis=-1)
    ir_fft = jnp.fft.rfft(impulse_response, n=fft_size, axis=-1)
    audio_frames_out = jnp.fft.irfft(audio_fft * ir_fft, n=fft_size, axis=-1)
    audio_out = overlap_and_add(audio_frames_out, hop_size)
    return crop_and_compensate_delay(audio_out, audio_size, ir_size, padding,
                                     delay_compensation)


def apply_window_to_impulse_response(impulse_response: Array,
                                     window_size: int = 0,
                                     causal: bool = False) -> Array:
    """Window a zero-phase-form IR with a Hann window; return causal form."""
    impulse_response = core.f32(impulse_response)
    if causal:
        impulse_response = jnp.fft.fftshift(impulse_response, axes=-1)
    ir_size = impulse_response.shape[-1]
    if window_size <= 0 or window_size > ir_size:
        window_size = ir_size
    window = core.hann_window(window_size, periodic=True)
    padding = ir_size - window_size
    if padding > 0:
        half_idx = (window_size + 1) // 2
        window = jnp.concatenate(
            [window[half_idx:], jnp.zeros((padding,), jnp.float32),
             window[:half_idx]], axis=0)
    else:
        window = jnp.fft.fftshift(window, axes=-1)
    impulse_response = window * impulse_response
    if padding > 0:
        first_half_start = (ir_size - (half_idx - 1)) + 1
        second_half_end = half_idx + 1
        impulse_response = jnp.concatenate(
            [impulse_response[..., first_half_start:],
             impulse_response[..., :second_half_end]], axis=-1)
    else:
        impulse_response = jnp.fft.fftshift(impulse_response, axes=-1)
    return impulse_response


def frequency_impulse_response(magnitudes: Array,
                               window_size: int = 0) -> Array:
    """Linear-phase FIR from frequency-band magnitudes (zero phase assumed)."""
    impulse_response = jnp.fft.irfft(
        jnp.asarray(magnitudes, dtype=jnp.complex64), axis=-1)
    return apply_window_to_impulse_response(impulse_response.real,
                                            window_size=window_size)


def _frequency_filter_conv(audio: Array, magnitudes: Array,
                           window_size: int, padding: str) -> Array:
    """Time-varying FIR filtering as ONE grouped MXU convolution.

    Exact algebraic rewrite of the block-FFT path: the per-frame IR is
    linear in the magnitudes, h_t = sum_k mags[t, k] * basis_k, and the
    block convolution weights every input sample by the magnitudes of ITS
    frame, so

        out[m] = sum_s x[s] * h_{frame(s)}[m - s]
               = sum_k (u_k * basis_k)[m],   u_k[s] = x[s] * mags[frame(s), k]

    i.e. hold-upsample the magnitudes, multiply into the audio per band,
    and convolve with the K fixed basis IRs (irfft of the identity through
    the same windowing). This trades tens of thousands of small TPU FFTs
    for one matmul-shaped convolution on the MXU.
    """
    batch, n = audio.shape
    _, n_frames, n_bands = magnitudes.shape
    hop = n // n_frames
    basis = frequency_impulse_response(
        jnp.eye(n_bands, dtype=jnp.float32), window_size=window_size)
    ir_size = basis.shape[-1]
    held = jnp.repeat(jnp.swapaxes(core.f32(magnitudes), 1, 2), hop,
                      axis=-1)                       # (b, K, n)
    u = audio[:, jnp.newaxis, :] * held
    # conv_general_dilated correlates; flip the kernel for convolution.
    kernel = jnp.flip(basis, axis=-1)[jnp.newaxis]   # (1, K, ir)
    out = jax.lax.conv_general_dilated(
        u, kernel, window_strides=(1,),
        padding=[(ir_size - 1, ir_size - 1)],
        dimension_numbers=('NCH', 'OIH', 'NCH'),
        precision=jax.lax.Precision.HIGHEST)[:, 0]   # (b, n + ir - 1)
    return crop_and_compensate_delay(out, n, ir_size, padding, -1)


@functools.lru_cache(maxsize=None)
def _np_ir_basis(n_bands: int, window_size: int) -> np.ndarray:
    """``frequency_impulse_response(eye(n_bands))`` as a HOST constant.

    numpy mirror of the jnp chain (irfft of the identity -> Hann window ->
    causal shift), computed in float64 and rounded to float32. The linmap
    paths below close over the result instead of tracing the jnp chain:
    in-trace ``jnp.fft.rfft(jnp.eye(...))`` constants are not fully folded
    by XLA on TPU and cost real runtime (see _linmap_mm_constants).
    """
    ir = np.fft.irfft(np.eye(n_bands), axis=-1)
    ir_size = ir.shape[-1]
    if window_size <= 0 or window_size > ir_size:
        window_size = ir_size
    # core.hann_window(periodic=True): odd lengths share the symmetric
    # denominator (tf.signal bit-convention).
    if window_size == 1:
        window = np.ones((1,))
    else:
        denom = window_size + (1 - window_size % 2) - 1
        window = 0.5 - 0.5 * np.cos(
            2.0 * np.pi * np.arange(window_size) / denom)
    padding = ir_size - window_size
    if padding > 0:
        half_idx = (window_size + 1) // 2
        window = np.concatenate(
            [window[half_idx:], np.zeros((padding,)), window[:half_idx]])
    else:
        window = np.fft.fftshift(window)
    ir = window * ir
    if padding > 0:
        first_half_start = (ir_size - (half_idx - 1)) + 1
        second_half_end = half_idx + 1
        ir = np.concatenate([ir[..., first_half_start:],
                             ir[..., :second_half_end]], axis=-1)
    else:
        ir = np.fft.fftshift(ir, axes=-1)
    return ir.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _linmap_mm_constants(frame_size: int, n_bands: int, window_size: int,
                         fft_size: int):
    """Host-side DFT/basis matrices for the all-matmul linmap branch.

    Returns float32 numpy ``(w2, b2, inv2)``: forward DFT of a
    frame_size-sample real frame, basis-IR spectra, and the inverse DFT
    restricted to the conv_size supported outputs — real/imag concatenated
    on the spectrum axis so each rides ONE einsum. Computed with np.fft on
    host: closing over numpy constants measured 0.698 -> 0.621 ms on the
    shipped v2 noise filtering vs materializing the same matrices with
    in-trace jnp.fft (benchmarks/ab_noise_fft_shipped.py, round 4,
    parity 5.9e-7 of peak).
    """
    basis = _np_ir_basis(n_bands, window_size).astype(np.float64)
    ir_size = basis.shape[-1]
    conv_size = frame_size + ir_size - 1
    n_freqs = fft_size // 2 + 1
    bf = np.fft.rfft(basis, n=fft_size, axis=-1)            # (K, F)
    w = np.fft.rfft(np.eye(frame_size), n=fft_size, axis=-1)  # (fs, F)
    w2 = np.concatenate([w.real, w.imag], axis=1).astype(np.float32)
    b2 = np.concatenate([bf.real, bf.imag], axis=1).astype(np.float32)
    inv = np.fft.irfft(np.eye(n_freqs, dtype=np.complex128),
                       n=fft_size, axis=-1)[:, :conv_size]
    inv_im = np.fft.irfft(1j * np.eye(n_freqs, dtype=np.complex128),
                          n=fft_size, axis=-1)[:, :conv_size]
    inv2 = np.concatenate([inv, inv_im], axis=0).astype(np.float32)
    return w2, b2, inv2


def _mm_fft_size(frame_size: int, ir_size: int) -> int:
    """Transform size for the all-matmul (DFT-as-matmul) branch below.

    The matmul branch never executes a real FFT at runtime, so any size
    >= conv_size = frame + ir - 1 realizes the SAME linear convolution —
    pow2 is only an FFT-algorithm constraint. The minimum size measured
    13 % faster than the pow2 size at the v2 noise shapes (96-in-X
    frames, K=96: pow2-512 1.017 / lane-aligned-510 0.965 / min-285
    0.881 ms — smaller intermediates beat MXU lane alignment;
    benchmarks/profile_noise_stage.py, round 4, parity 4.5e-7 of peak).
    DDSP_PIANO_TPU_NOISE_FFT=pow2 reverts (read at trace time).
    """
    choice = os.environ.get('DDSP_PIANO_TPU_NOISE_FFT', 'min')
    if choice not in ('min', 'pow2'):
        raise ValueError(
            f"DDSP_PIANO_TPU_NOISE_FFT={choice!r}: expected 'min' or 'pow2'")
    if choice == 'pow2':
        return get_fft_size(frame_size, ir_size, power_of_2=True)
    return frame_size + ir_size - 1


# Precision of the linmap/DFT-as-matmul einsums below. HIGHEST keeps the
# rewrite exact-f32 on TPU (default matmul precision there is bf16, which
# would silently cost ~3 digits on the default noise path while the CPU-run
# golden tests stay green). Module-level so benchmarks can A/B it.
LINMAP_PRECISION = jax.lax.Precision.HIGHEST


def _linmap_precision():
    """Resolve the linmap einsum precision (trace-time env override).

    DDSP_PIANO_TPU_NOISE_PREC unset -> LINMAP_PRECISION (HIGHEST: the
    default noise path's contract is exact-f32, ADVICE r2). 'high' /
    'default' select bf16x3 / bf16 MXU passes: measured 0.635 / 0.565 /
    0.525 ms isolated on the v2 noise filtering at parity 3.2e-5 /
    5.3e-3 of peak (benchmarks/ab_noise_prec.py, round 4) — a real ~25 %
    / ~38 % cut of the chain, kept OPT-IN because it trades the exactness
    contract; flip only per-deployment with recorded spectral deltas.
    """
    name = os.environ.get('DDSP_PIANO_TPU_NOISE_PREC')
    if name is None:
        return LINMAP_PRECISION
    table = {'highest': jax.lax.Precision.HIGHEST,
             'high': jax.lax.Precision.HIGH,
             'default': jax.lax.Precision.DEFAULT}
    if name not in table:
        raise ValueError(
            f'DDSP_PIANO_TPU_NOISE_PREC={name!r}: expected one of '
            f'{sorted(table)}')
    return table[name]


def _frequency_filter_linmap(audio: Array, magnitudes: Array,
                             window_size: int, padding: str) -> Array:
    """Framed time-varying filtering with the IR SPECTRA computed as one
    matmul instead of per-frame FFT chains.

    The per-frame filter spectrum is linear in the magnitudes: the chain
    irfft -> Hann window -> causal shift -> zero-pad -> rfft is a fixed
    linear map, so rfft(ir_t) == mags_t @ B where B is the chain applied
    to the identity (a numpy HOST constant closed over the jit;
    (n_bands, fft//2+1) complex). This deletes two of the block-FFT
    path's three batched FFT
    families (the magnitudes irfft and the IR rfft — tens of thousands of
    small TPU FFTs on the hot noise path) and replaces them with one MXU
    matmul. Exact up to float reassociation.
    """
    batch, n = audio.shape
    _, n_frames, n_bands = magnitudes.shape
    frame_size = -(-n // n_frames)
    basis = _np_ir_basis(n_bands, window_size)             # host (K, ir)
    # The window may TRUNCATE the IR (window_size < 2*(n_bands-1)); take
    # the realized length so fft size / crop delay match the 'fft' path.
    ir_size = basis.shape[-1]
    fft_pow2 = get_fft_size(frame_size, ir_size, power_of_2=True)
    conv_size = frame_size + ir_size - 1
    use_mm = frame_size * 4 <= fft_pow2 * 3
    # The matmul branch needs no pow2 (see _mm_fft_size); the real-FFT
    # fallback keeps it (pow2 FFTs are the fast ones).
    fft_size = _mm_fft_size(frame_size, ir_size) if use_mm else fft_pow2
    mags = core.f32(magnitudes)
    hi = _linmap_precision()

    pad = n_frames * frame_size - n
    audio_frames = jnp.pad(audio, ((0, 0), (0, pad))).reshape(
        batch, n_frames, frame_size)

    if use_mm:
        # DFT-as-matmul: the frames are `frame_size` real samples inside a
        # `fft_size` >= conv_size transform, so the forward transform is a
        # (frame_size, fft//2+1) matmul and the inverse only needs the
        # conv_size supported outputs — both MXU matmuls. Measured ~8x
        # faster than the batched small-FFT lowering for the noise synth's
        # (16, 1000) x 96-sample-frame shapes. Real and imaginary parts
        # ride ONE einsum each via a concatenated (…, 2F) spectrum axis —
        # 6 einsums fused into 3 (0.727 -> 0.634 ms at the compact size;
        # the same fusion at pow2 size was a LOSS, 0.780 — bigger concat
        # intermediates; benchmarks/ab_noise_linmap.py). All DFT/basis
        # matrices are numpy HOST constants: 0.698 -> 0.621 ms vs in-trace
        # jnp.fft.rfft(eye) (benchmarks/ab_noise_fft_shipped.py, round 4).
        w2, b2, inv2 = _linmap_mm_constants(frame_size, n_bands,
                                            window_size, fft_size)
        a2 = jnp.einsum('btj,jf->btf', audio_frames, w2, precision=hi)
        i2 = jnp.einsum('btk,kf->btf', mags, b2, precision=hi)
        n_freqs = fft_size // 2 + 1
        a_re, a_im = a2[..., :n_freqs], a2[..., n_freqs:]
        ir_re, ir_im = i2[..., :n_freqs], i2[..., n_freqs:]
        p2 = jnp.concatenate([a_re * ir_re - a_im * ir_im,
                              a_re * ir_im + a_im * ir_re], axis=-1)
        out_frames = jnp.einsum('btf,fm->btm', p2, inv2, precision=hi)
    else:
        basis_fft = np.fft.rfft(basis.astype(np.float64),
                                n=fft_size, axis=-1)        # host (K, F)
        b_re = basis_fft.real.astype(np.float32)
        b_im = basis_fft.imag.astype(np.float32)
        ir_re = jnp.einsum('btk,kf->btf', mags, b_re, precision=hi)
        ir_im = jnp.einsum('btk,kf->btf', mags, b_im, precision=hi)
        ir_fft = jax.lax.complex(ir_re, ir_im)
        audio_fft = jnp.fft.rfft(audio_frames, n=fft_size, axis=-1)
        out_frames = jnp.fft.irfft(audio_fft * ir_fft, n=fft_size,
                                   axis=-1)[..., :conv_size]
    out = overlap_and_add(out_frames, frame_size)
    return crop_and_compensate_delay(out, n, ir_size, padding, -1)


def frequency_filter(audio: Array, magnitudes: Array, window_size: int = 0,
                     padding: str = 'same', method: str = 'auto') -> Array:
    """Time-varying FIR filtering from frame-rate frequency magnitudes.

    Args:
        audio: (batch, n_samples).
        magnitudes: (batch, n_frames, n_bands) strictly-positive filter
            magnitudes sampled on the rfft grid.
        method: 'auto' — the framed multi-frame case takes 'linmap', the
            rest the plain block-FFT path.
            'linmap': IR spectra as one basis matmul (see
            _frequency_filter_linmap) — the TPU hot path for the noise
            synths.
            'fft' (ddsp's literal block-FFT overlap-add chain)
            or 'conv' (exact single-convolution rewrite; equivalent to
            float rounding, but XLA's TPU mapping of a K-channels-in /
            1-channel-out 1-D convolution starves the MXU — measured 45x
            slower than the FFT path — so it is never auto-selected).
    """
    audio = core.f32(audio)
    if method not in ('auto', 'fft', 'conv', 'linmap'):
        raise ValueError(f"unknown method {method!r}")
    framed = (magnitudes.ndim == 3 and magnitudes.shape[1] > 1)
    if method == 'conv' and framed:
        if audio.shape[-1] % magnitudes.shape[1] == 0:
            return _frequency_filter_conv(audio, magnitudes, window_size,
                                          padding)
    if method in ('auto', 'linmap') and framed:
        return _frequency_filter_linmap(audio, magnitudes, window_size,
                                        padding)
    impulse_response = frequency_impulse_response(magnitudes,
                                                  window_size=window_size)
    return fft_convolve(audio, impulse_response, padding=padding,
                        delay_compensation=-1)
