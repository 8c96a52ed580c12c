"""Filtered-noise synthesizers.

- DynamicSizeFilteredNoise: time-varying frequency-sampling FIR on uniform
  noise, output length driven by the input frame count (behavioral
  equivalent of /root/reference/ddsp_piano/modules/filtered_noise_synth.py:12-42
  on top of ddsp.synths.FilteredNoise semantics: scale_fn(magnitudes +
  initial_bias), window_size-windowed IR).
- FilterBank + NoiseBandNetSynth: NoiseBandNet-style precomputed looped
  noise bands modulated by upsampled amplitudes (reference
  filtered_noise_synth.py:51-270). The filterbank is built host-side with
  scipy at construction (init-time, not in the jit path). The reference's
  frequency-band builder has a latent bug when linear_max_f_cutoff_fs == 1
  (undefined variable, filtered_noise_synth.py:108-109); here that case
  returns the linear bands, documented as a fix.
"""

from __future__ import annotations

import math
import os
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ddsp_piano_tpu.ops import core, filters
from ddsp_piano_tpu.processors.base import Processor

Array = jax.Array


def _noise_rng_key(rng: Array) -> Array:
    """Re-wrap the noise key per DDSP_PIANO_TPU_NOISE_RNG (trace-time env).

    'threefry' (default) keeps the global partitionable threefry stream.
    'rbg' derives an rbg-impl key from the same key data, routing the
    uniform draw through XLA's RngBitGenerator (TPU hardware generator
    instead of ~10 VPU rounds/word of threefry). The reference's noise is
    UNSEEDED tf.random.uniform (ddsp FilteredNoise semantics), so any
    well-distributed stream is in-spec; rbg streams are backend-dependent
    but deterministic per (key, backend).

    MEASURED NEGATIVE on TPU v5e (round 4, benchmarks/profile_noise_rng.py,
    interleaved with an empty-program floor arm): the (16, 96000) threefry
    draw costs ~5 us real (0.373 ms isolated vs 0.368 floor) and rbg is
    slightly SLOWER (0.400 — key-rewrap overhead). threefry stays the
    default; the knob is kept as the measurement arm. An earlier ~0.2 ms
    estimate for the draw was relay noise — trust only interleaved A/Bs.
    """
    impl = os.environ.get('DDSP_PIANO_TPU_NOISE_RNG', 'threefry')
    if impl == 'threefry':
        return rng
    if impl != 'rbg':
        raise ValueError(
            f"DDSP_PIANO_TPU_NOISE_RNG={impl!r}: expected 'threefry' or "
            "'rbg'")
    data = jax.random.key_data(rng)              # (2,) uint32
    return jax.random.wrap_key_data(jnp.concatenate([data, data]),
                                    impl='rbg')


class FilteredNoise(Processor):
    """Fixed-length filtered noise (ddsp.synths.FilteredNoise equivalent)."""

    def __init__(self, n_samples: int = 64000, window_size: int = 257,
                 scale_fn: Optional[Callable] = core.exp_sigmoid,
                 initial_bias: float = -5.0, name: str = 'filtered_noise'):
        super().__init__(name=name)
        self.n_samples = n_samples
        self.window_size = window_size
        self.scale_fn = scale_fn
        self.initial_bias = initial_bias

    def get_controls(self, params, magnitudes, **_):
        if self.scale_fn is not None:
            magnitudes = self.scale_fn(magnitudes + self.initial_bias)
        return {'magnitudes': core.f32(magnitudes)}

    def _noise(self, rng, batch_size, n_samples):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        rng = _noise_rng_key(rng)
        return jax.random.uniform(rng, (batch_size, n_samples),
                                  jnp.float32, -1.0, 1.0)

    def get_signal(self, params, magnitudes, rng=None, **_):
        batch_size = magnitudes.shape[0]
        signal = self._noise(rng, batch_size, self.n_samples)
        return filters.frequency_filter(signal, magnitudes,
                                        window_size=self.window_size)


class DynamicSizeFilteredNoise(FilteredNoise):
    """Filtered noise whose length is upsampling * n_frames."""

    def __init__(self, frame_rate: int = 250, sample_rate: int = 16000,
                 name: str = 'noise', **kwargs):
        super().__init__(name=name, **kwargs)
        self.frame_rate = frame_rate
        self.sample_rate = sample_rate

    @property
    def upsampling(self) -> int:
        return int(self.sample_rate / self.frame_rate)

    def get_signal(self, params, magnitudes, rng=None, **_):
        batch_size, n_frames = magnitudes.shape[:2]
        n_samples = self.upsampling * n_frames
        signal = self._noise(rng, batch_size, n_samples)
        return filters.frequency_filter(signal, magnitudes,
                                        window_size=self.window_size)


class FilterBank:
    """Linear+log Kaiser-window FIR filterbank (host-side precompute)."""

    def __init__(self, n_filters_linear: int = 1024, n_filters_log: int = 1024,
                 linear_min_f: float = 20.0, linear_max_f_cutoff_fs: float = 4.0,
                 attenuation: float = 50.0, sample_rate: int = 16000):
        from scipy import signal as sps

        bands = self._frequency_bands(n_filters_linear, n_filters_log,
                                      linear_min_f, linear_max_f_cutoff_fs,
                                      sample_rate)
        self.band_centers = self._band_centers(bands, sample_rate)
        self.filters = self._build(bands, sample_rate, attenuation, sps)
        self.max_filter_len = max(len(f) for f in self.filters)

    @staticmethod
    def _linear_bands(n, linear_min_f, cutoff_fs, sample_rate):
        linear_max_f = (sample_rate / 2) / cutoff_fs
        edges = np.linspace(linear_min_f, linear_max_f, n)
        return np.stack([edges[:-1], edges[1:]], axis=1)

    @staticmethod
    def _log_bands(n, cutoff_fs, sample_rate):
        linear_max_f = (sample_rate / 2) / cutoff_fs
        edges = np.geomspace(linear_max_f, sample_rate / 2, n, endpoint=False)
        return np.stack([edges[:-1], edges[1:]], axis=1)

    def _frequency_bands(self, n_lin, n_log, linear_min_f, cutoff_fs,
                         sample_rate):
        linear = self._linear_bands(n_lin, linear_min_f, cutoff_fs,
                                    sample_rate)
        if cutoff_fs == 1:
            # Whole spectrum covered linearly (reference has an undefined-
            # variable bug here; returning the linear bands is the intent).
            return linear
        return np.concatenate(
            [linear, self._log_bands(n_log, cutoff_fs, sample_rate)])

    @staticmethod
    def _band_centers(bands, sample_rate):
        centers = bands.mean(axis=1)
        lower = bands[0, 0] / 2
        upper = (sample_rate / 2 + bands[-1, -1]) / 2
        return np.concatenate([[lower], centers, [upper]])

    @staticmethod
    def _fir(cutoff, sample_rate, attenuation, pass_zero, sps,
             transition_bandwidth=0.2):
        if isinstance(cutoff, np.ndarray):
            bandwidth = abs(cutoff[1] - cutoff[0])
        elif pass_zero:
            bandwidth = cutoff
        else:
            bandwidth = abs(sample_rate / 2 - cutoff)
        width = bandwidth / (sample_rate / 2) * transition_bandwidth
        numtaps, beta = sps.kaiserord(ripple=attenuation, width=width)
        numtaps = 2 * (numtaps // 2) + 1
        return sps.firwin(numtaps=numtaps, cutoff=cutoff,
                          window=('kaiser', beta), scale=True,
                          fs=sample_rate, pass_zero=pass_zero)

    def _build(self, bands, sample_rate, attenuation, sps):
        out = []
        for i in range(bands.shape[0]):
            if i == 0:
                out.append(self._fir(bands[i, 0], sample_rate, attenuation,
                                     True, sps))
            out.append(self._fir(bands[i], sample_rate, attenuation, False,
                                 sps))
            if i == bands.shape[0] - 1:
                out.append(self._fir(bands[i, -1], sample_rate, attenuation,
                                     False, sps))
        return out


def _next_power_of_2(x: int) -> int:
    return int(2 ** math.ceil(math.log2(max(x, 1))))


def get_noise_bands(fb: FilterBank, min_noise_len: int, normalize: bool,
                    seed: int = 42):
    """Deterministic loopable random-phase noise bands (host precompute)."""
    noise_len = (_next_power_of_2(fb.max_filter_len)
                 if fb.max_filter_len > min_noise_len else min_noise_len)
    filt = np.zeros((len(fb.filters), noise_len))
    for i, h in enumerate(fb.filters):
        filt[i, noise_len - len(h):] = h
    mags = np.abs(np.fft.rfft(filt, axis=-1))
    rng = np.random.RandomState(seed)
    phase = rng.uniform(-math.pi, math.pi, mags.shape)
    phase[:, 0] = 0.0
    phase[:, -1] = 0.0
    bands = np.fft.irfft(mags * np.exp(1j * phase), axis=-1)
    if normalize:
        bands = bands / np.abs(bands).max()
    # (1, noise_len, n_bands)
    return jnp.asarray(bands.T[np.newaxis], jnp.float32), noise_len


class NoiseBandNetSynth(Processor):
    """Looped noise bands x upsampled amplitudes (NoiseBandNet-style).

    Reference-exact (round 2; filtered_noise_synth.py:223-270): the
    reference re-interpolates amplitudes per noise_len chunk in a Python
    loop (a GPU-memory workaround that clamps the interpolation at every
    chunk boundary). Here the full chunks fold into the batch axis for
    ONE batched resample — same per-chunk clamped values, no loop, static
    shapes — with the reference's quirks preserved: the remainder chunk
    is stretched to a full noise_len before the final truncation, and
    sequences shorter than one chunk resample globally.
    """

    def __init__(self, n_band: int = 64, upsampling: int = 64,
                 filterbank_attenuation: float = 50.0,
                 sample_rate: int = 16000, min_noise_len: int = 2 ** 4,
                 linear_min_f: float = 20.0,
                 linear_max_f_cutoff_fs: float = 4.0,
                 normalize_noise_bands: bool = True,
                 scale_fn: Optional[Callable] = core.exp_sigmoid,
                 inference: bool = False, name: str = 'noise'):
        super().__init__(name=name)
        if min_noise_len <= 0 or 2 ** int(math.log2(min_noise_len)) != min_noise_len:
            raise ValueError("min_noise_len must be a positive power of 2")
        self.scale_fn = scale_fn
        self.upsampling = upsampling
        self.sample_rate = sample_rate
        # Accepted for config parity only: the reference stores this flag
        # and never reads it either (filtered_noise_synth.py:199).
        self.inference = inference
        fb = FilterBank(n_filters_linear=n_band // 2,
                        n_filters_log=n_band // 2,
                        linear_min_f=linear_min_f,
                        linear_max_f_cutoff_fs=linear_max_f_cutoff_fs,
                        sample_rate=sample_rate,
                        attenuation=filterbank_attenuation)
        self.center_frequencies = fb.band_centers
        self.noise_bands, self.noise_len = get_noise_bands(
            fb, min_noise_len, normalize_noise_bands)

    def get_controls(self, params, magnitudes, **_):
        if self.scale_fn is not None:
            magnitudes = self.scale_fn(magnitudes)
        return {'amplitudes': core.f32(magnitudes)}

    def get_signal(self, params, amplitudes, rng=None, **_):
        """amplitudes: (batch, n_frames, n_bands+1)."""
        b, n_frames, n_bands = amplitudes.shape
        n_samples = n_frames * self.upsampling
        if rng is None:
            rng = jax.random.PRNGKey(0)
        shift = jax.random.randint(rng, (), 0, self.noise_bands.shape[1])
        noise = jnp.roll(self.noise_bands, shift, axis=1)

        frame_len = self.noise_len // self.upsampling
        # Chunk length in samples: frame_len * upsampling == noise_len when
        # the noise loop divides evenly (the practical case); otherwise the
        # reference reuses only the first frame_len*up noise samples per
        # chunk, which the tiling below reproduces.
        chunk_samples = frame_len * self.upsampling
        if frame_len == 0 or n_frames < frame_len:
            # Shorter than one chunk: global resample against the chunk
            # head (reference filtered_noise_synth.py:238-242). frame_len
            # == 0 (noise loop shorter than one frame of audio) would
            # divide-by-zero in the reference; loop the noise instead.
            reps = -(-n_samples // self.noise_len)
            noise = jnp.tile(noise, (1, reps, 1))[:, :n_samples]
            upsampled = core.resample(amplitudes, n_samples)
            return jnp.sum(noise * upsampled, axis=-1)

        # Per-chunk resample, vectorized: full chunks fold into batch.
        n_full = n_frames // frame_len
        main = amplitudes[:, :n_full * frame_len].reshape(
            b * n_full, frame_len, n_bands)
        up_main = core.resample(main, chunk_samples).reshape(
            b, n_full * chunk_samples, n_bands)
        rem_frames = n_frames - n_full * frame_len
        if rem_frames:
            # The reference stretches the remainder over a FULL chunk and
            # truncates at the end (filtered_noise_synth.py:251-259, 269).
            rem = core.resample(amplitudes[:, n_full * frame_len:],
                                chunk_samples)
            upsampled = jnp.concatenate([up_main, rem], axis=1)
        else:
            upsampled = up_main
        n_chunks = upsampled.shape[1] // chunk_samples
        noise = jnp.tile(noise[:, :chunk_samples], (1, n_chunks, 1))
        return jnp.sum(noise * upsampled, axis=-1)[:, :n_samples]
