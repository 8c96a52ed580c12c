"""Raw-TensorFlow composition of the FULL dafx22 forward pass (test-only).

This is the end-to-end parity oracle demanded by the <1% spectral-loss
north star (BASELINE.md): the complete reference model
(/root/reference/ddsp_piano/modules/piano_model.py:146-169) rebuilt from
first principles with tf / tf.signal / tf.keras primitives only — no ddsp
package, no code from ddsp_piano_tpu's JAX implementation in the compute
path. Weights are read straight from the released TF checkpoint by their
original variable names, so none of this goes through the repo's
checkpoint-import name mapping either.

Composition covered (reference file:line):
- OneHotZEncoder (sub_modules.py:182-250)
- ContextNetwork Dense-GRU-Normalize chain (sub_modules.py:17-64 +
  dafx22.gin context_net bindings) incl. the ddsp nn.Normalize layer with
  whole-sequence statistics.
- Parallelizer fold/unfold (sub_modules.py:527-602)
- NoteRelease / F0ProcessorCell (sub_modules.py:1113-1187)
- InharmonicityNetwork (sub_modules.py:610-700)
- Detuner (sub_modules.py:902-942)
- MonophonicNetwork (sub_modules.py:454-495)
- MultiInharmonic / harmonic_synthesis / cos_oscillator_bank
  (inharm_synth.py:20-293) with ddsp resample (linear + window methods)
  and angular_cumsum.
- DynamicSizeFilteredNoise (filtered_noise_synth.py:12-42) on ddsp
  frequency_filter semantics (windowed frequency-sampling FIR).
- MultiInstrumentReverb with the inference exponential decay mask
  (sub_modules.py:302-365) + ddsp effects.Reverb (mask dry tap, add dry).
- Multi-scale spectral loss (losses.py:7-32, ddsp SpectralLoss L1
  mag+logmag over FFT sizes 2048..64).

White noise is injected by the caller so both implementations can be fed
the identical realization.
"""

import math

import numpy as np
import tensorflow as tf

MIDI_NORM = 128.0
TWO_PI = 2.0 * math.pi


# -----------------------------------------------------------------------------
# Checkpoint reading (by raw TF variable name)
# -----------------------------------------------------------------------------


def load_ckpt_vars(ckpt_path):
    if tf.io.gfile.isdir(ckpt_path):
        ckpt_path = tf.train.latest_checkpoint(ckpt_path)
    reader = tf.train.load_checkpoint(ckpt_path)
    suffix = '/.ATTRIBUTES/VARIABLE_VALUE'
    out = {}
    for name in reader.get_variable_to_shape_map():
        if name.endswith(suffix) and name.startswith('model/'):
            out[name[len('model/'):-len(suffix)]] = reader.get_tensor(name)
    return out


# -----------------------------------------------------------------------------
# ddsp op semantics in raw TF
# -----------------------------------------------------------------------------


def resample_linear(x, n_out):
    """ddsp.core.resample(method='linear'): legacy bilinear image resize."""
    y = tf.compat.v1.image.resize(x[:, :, tf.newaxis, :], [n_out, 1],
                                  method=tf.image.ResizeMethod.BILINEAR,
                                  align_corners=False)
    return y[:, :, 0, :]


def resample_window(x, n_out):
    """ddsp.core.resample(method='window'): overlapping-Hann upsampling."""
    n_frames = x.shape[1]
    hop = n_out // n_frames
    xe = tf.concat([x, x[:, -1:, :]], axis=1)
    window = tf.signal.hann_window(2 * hop)
    xt = tf.transpose(xe, [0, 2, 1])[:, :, :, tf.newaxis]
    ola = tf.signal.overlap_and_add(xt * window, hop)
    return tf.transpose(ola, [0, 2, 1])[:, hop:-hop, :]


def exp_sigmoid(x):
    return 2.0 * tf.math.sigmoid(x) ** math.log(10.0) + 1e-7


def safe_divide(num, den, eps=1e-7):
    return num / tf.where(tf.abs(den) <= 0.0, eps * tf.ones_like(den), den)


def safe_log(x, eps=1e-5):
    return tf.math.log(tf.where(x <= eps, eps * tf.ones_like(x), x))


def midi_to_hz(m):
    return 440.0 * 2.0 ** ((m - 69.0) / 12.0)


def normalize_layer(x, scale, shift, eps=1e-5):
    """ddsp nn.Normalize('layer'): stats pooled over all non-batch axes
    of the 4-D view (time AND channels jointly for a sequence)."""
    mean, var = tf.nn.moments(x, axes=list(range(1, len(x.shape))),
                              keepdims=True)
    xn = (x - mean) / tf.sqrt(var + eps)
    return xn * tf.reshape(scale, [-1]) + tf.reshape(shift, [-1])


def angular_cumsum(omega, chunk_size=1000):
    """ddsp.core.angular_cumsum: chunked mod-2pi phase accumulation."""
    b = tf.shape(omega)[0]
    length = omega.shape[1]
    tail = omega.shape[2:]
    n_chunks = -(-length // chunk_size)
    pad = n_chunks * chunk_size - length
    x = tf.pad(omega, [[0, 0], [0, pad]] + [[0, 0]] * len(tail))
    x = tf.reshape(x, tf.concat([[b, n_chunks, chunk_size], tail], 0))
    chunk_phase = tf.cumsum(x, axis=2) % TWO_PI
    chunk_totals = chunk_phase[:, :, -1]
    offsets = tf.cumsum(chunk_totals, axis=1, exclusive=True) % TWO_PI
    phase = (chunk_phase + offsets[:, :, tf.newaxis]) % TWO_PI
    phase = tf.reshape(phase, tf.concat([[b, n_chunks * chunk_size], tail], 0))
    return phase[:, :length]


def _next_pow2(n):
    return int(2 ** math.ceil(math.log2(max(n, 1))))


def fft_convolve(audio, ir, padding='same', delay_compensation=-1):
    """ddsp.core.fft_convolve: blockwise FFT convolution + overlap-add."""
    if len(ir.shape) == 2:
        ir = ir[:, tf.newaxis, :]
    n = audio.shape[1]
    n_ir_frames, ir_size = ir.shape[1], ir.shape[2]
    frame_size = -(-n // n_ir_frames)
    pad = n_ir_frames * frame_size - n
    frames = tf.reshape(tf.pad(audio, [[0, 0], [0, pad]]),
                        [-1, n_ir_frames, frame_size])
    fft_size = _next_pow2(frame_size + ir_size - 1)
    audio_fft = tf.signal.rfft(frames, [fft_size])
    ir_fft = tf.signal.rfft(ir, [fft_size])
    out_frames = tf.signal.irfft(audio_fft * ir_fft, [fft_size])
    out = tf.signal.overlap_and_add(out_frames, frame_size)
    crop = (ir_size + n - 1) if padding == 'valid' else n
    start = ((ir_size - 1) // 2 - 1 if delay_compensation < 0
             else delay_compensation)
    return out[:, start:start + crop]


def apply_window_to_impulse_response(ir, window_size=0):
    ir_size = int(ir.shape[-1])
    if window_size <= 0 or window_size > ir_size:
        window_size = ir_size
    window = tf.signal.hann_window(window_size)
    padding = ir_size - window_size
    if padding > 0:
        half_idx = (window_size + 1) // 2
        window = tf.concat([window[half_idx:], tf.zeros([padding]),
                            window[:half_idx]], axis=0)
        ir = window * ir
        first_half_start = (ir_size - (half_idx - 1)) + 1
        second_half_end = half_idx + 1
        ir = tf.concat([ir[..., first_half_start:],
                        ir[..., :second_half_end]], axis=-1)
    else:
        window = tf.signal.fftshift(window)
        ir = window * ir
        ir = tf.signal.fftshift(ir, axes=-1)
    return ir


def frequency_filter(audio, magnitudes, window_size=257):
    """ddsp.core.frequency_filter: frequency-sampled time-varying FIR."""
    ir = tf.signal.irfft(tf.cast(magnitudes, tf.complex64))
    ir = apply_window_to_impulse_response(ir, window_size=window_size)
    return fft_convolve(audio, ir, padding='same', delay_compensation=-1)


def multi_scale_spectral_loss(target, synth,
                              fft_sizes=(2048, 1024, 512, 256, 128, 64)):
    """ddsp SpectralLoss, L1 mag + logmag (losses config dafx22.gin)."""
    loss = tf.constant(0.0)
    for size in fft_sizes:
        hop = size // 4
        tm = tf.abs(tf.signal.stft(target, size, hop, size, pad_end=True))
        sm = tf.abs(tf.signal.stft(synth, size, hop, size, pad_end=True))
        loss += tf.reduce_mean(tf.abs(tm - sm))
        loss += tf.reduce_mean(tf.abs(safe_log(tm) - safe_log(sm)))
    return loss


# -----------------------------------------------------------------------------
# Neural sub-modules (Keras layers fed released weights)
# -----------------------------------------------------------------------------


def _dense(x, kernel, bias, activation=None):
    layer = tf.keras.layers.Dense(kernel.shape[1], activation=activation)
    layer.build(x.shape)
    layer.set_weights([kernel, bias])
    return layer(x)


def _gru(x, kernel, recurrent_kernel, bias):
    layer = tf.keras.layers.GRU(recurrent_kernel.shape[0],
                                return_sequences=True)
    layer.build(x.shape)
    layer.set_weights([kernel, recurrent_kernel, bias])
    return layer(x)


def z_encoder(v, piano_model, n_frames):
    ids = tf.cast(piano_model, tf.int32)
    z = tf.gather(v['z_encoder/embedding/embeddings'], ids, axis=0)
    gi = tf.gather(v['z_encoder/inharm_embedding/embeddings'], ids, axis=0)
    gd = tf.gather(v['z_encoder/detune_embedding/embeddings'], ids, axis=0)
    return (resample_linear(z, n_frames), resample_linear(gi, n_frames),
            resample_linear(gd, n_frames))


def context_network(v, conditioning, pedal, z):
    b, f = conditioning.shape[0], conditioning.shape[1]
    x = tf.concat([tf.reshape(conditioning, [b, f, -1]), pedal, z], axis=-1)
    p = 'context_network/model/'
    x = _dense(x, v[p + 'layer_with_weights-0/kernel'],
               v[p + 'layer_with_weights-0/bias'], tf.nn.leaky_relu)
    x = _gru(x, v[p + 'layer_with_weights-1/cell/kernel'],
             v[p + 'layer_with_weights-1/cell/recurrent_kernel'],
             v[p + 'layer_with_weights-1/cell/bias'])
    x = normalize_layer(x, v[p + 'layer_with_weights-2/scale'],
                        v[p + 'layer_with_weights-2/shift'])
    return _dense(x, v['context_network/dense_out/kernel'],
                  v['context_network/dense_out/bias'])


def note_release(v, active_pitch, frame_rate=250):
    """F0ProcessorCell RNN: hold last pitch for release_duration seconds."""
    release_frames = float(v['note_release/layer/cell/release_duration']
                           ) * frame_rate
    sat_relu = lambda x, thr: np.minimum(np.maximum(x - thr, 0.0), 1.0)
    pitch = np.asarray(active_pitch, np.float32)
    bsz, n_frames, _ = pitch.shape
    prev_note = np.zeros((bsz, 1), np.float32)
    release_steps = np.zeros((bsz, 1), np.float32)
    outs = np.zeros_like(pitch)
    for t in range(n_frames):
        note = pitch[:, t]
        activity = sat_relu(note, 0.0)
        release_end = sat_relu(release_steps, release_frames)
        out = (activity * note
               + (1.0 - activity) * prev_note * (1.0 - release_end))
        release_steps = ((release_steps + 1.0) * (1.0 - activity)
                         * (1.0 - release_end))
        prev_note = out
        outs[:, t] = out
    return tf.constant(outs)


def inharmonicity_network(v, extended_pitch, global_inharm):
    reduced = extended_pitch / MIDI_NORM
    slopes = v['inharm_model/slopes'] + v['inharm_model/slopes_modifier']
    offsets = v['inharm_model/offsets'] + v['inharm_model/offsets_modifier']
    asymptotes = slopes * (reduced + offsets)
    gi = global_inharm * 10.0
    gi = tf.concat([tf.zeros_like(gi), gi], axis=-1)
    asymptotes += v['inharm_model/model_specific_weight'] * gi
    return tf.reduce_sum(tf.math.exp(asymptotes), axis=-1, keepdims=True)


def detuner(v, extended_pitch, global_detuning, use_detune=True):
    if use_detune:
        detuning = tf.math.tanh(
            _dense(extended_pitch / MIDI_NORM, v['detuner/layer/kernel'],
                   v['detuner/layer/bias']))
        detuning += tf.math.tanh(global_detuning)
        extended_pitch = extended_pitch + detuning
    return midi_to_hz(extended_pitch)


def monophonic_network(v, conditioning, extended_pitch, context):
    x = tf.concat([extended_pitch / MIDI_NORM,
                   conditioning / tf.constant([MIDI_NORM, 1.0]),
                   context], axis=-1)
    p = 'monophonic_network/model/'
    x = _dense(x, v[p + 'layer_with_weights-0/kernel'],
               v[p + 'layer_with_weights-0/bias'], tf.nn.leaky_relu)
    x = _gru(x, v[p + 'layer_with_weights-1/cell/kernel'],
             v[p + 'layer_with_weights-1/cell/recurrent_kernel'],
             v[p + 'layer_with_weights-1/cell/bias'])
    x = _dense(x, v[p + 'layer_with_weights-2/kernel'],
               v[p + 'layer_with_weights-2/bias'], tf.nn.leaky_relu)
    x = normalize_layer(x, v[p + 'layer_with_weights-3/scale'],
                        v[p + 'layer_with_weights-3/shift'])
    x = _dense(x, v['monophonic_network/dense_out/kernel'],
               v['monophonic_network/dense_out/bias'])
    return tf.split(x, [1, 96, 64], axis=-1)


# -----------------------------------------------------------------------------
# Synthesis chain
# -----------------------------------------------------------------------------


def multi_inharmonic_controls(amplitudes, harmonic_distribution, inharm_coef,
                              f0_hz, sample_rate=16000, min_frequency=20.0):
    inharm_coef = tf.maximum(inharm_coef, 0.0)
    amplitudes = exp_sigmoid(amplitudes)
    harmonic_distribution = exp_sigmoid(harmonic_distribution)
    f0_main = f0_hz[..., 0:1]
    n_harmonics = int(harmonic_distribution.shape[-1])
    ratios = tf.linspace(1.0, float(n_harmonics),
                         n_harmonics)[tf.newaxis, tf.newaxis, :]
    inharm_factor = tf.math.sqrt(ratios ** 2 * inharm_coef + 1.0)
    inharmonic_freq = f0_main * ratios * inharm_factor
    harmonic_shifts = inharm_factor - 1.0
    # Nyquist cut then renormalize (normalize_after_nyquist_cut=True).
    mask = tf.cast(inharmonic_freq < sample_rate / 2.0, tf.float32)
    harmonic_distribution = harmonic_distribution * mask
    amplitudes *= tf.cast(tf.greater(f0_main, min_frequency), tf.float32)
    harmonic_distribution = safe_divide(
        harmonic_distribution,
        tf.reduce_sum(harmonic_distribution, axis=-1, keepdims=True))
    amplitudes /= float(f0_hz.shape[-1])
    return amplitudes, harmonic_distribution, harmonic_shifts, f0_hz


def harmonic_synthesis_one(f0, amplitudes, harmonic_shifts,
                           harmonic_distribution, n_samples,
                           sample_rate=16000, use_angular_cumsum=True):
    n_harmonics = int(harmonic_distribution.shape[-1])
    ratios = tf.linspace(1.0, float(n_harmonics),
                         n_harmonics)[tf.newaxis, tf.newaxis, :]
    harmonic_frequencies = f0 * ratios * (1.0 + harmonic_shifts)
    harmonic_amplitudes = amplitudes * harmonic_distribution
    freq_env = resample_linear(harmonic_frequencies, n_samples)
    amp_env = resample_window(harmonic_amplitudes, n_samples)
    amp_env *= tf.cast(freq_env < sample_rate / 2.0, tf.float32)
    omegas = freq_env * (TWO_PI / sample_rate)
    if use_angular_cumsum:
        phases = angular_cumsum(omegas)
    else:
        phases = tf.cumsum(omegas, axis=1)
    return tf.reduce_sum(amp_env * tf.cos(phases), axis=-1)


def multi_inharmonic_signal(amplitudes, harmonic_distribution,
                            harmonic_shifts, f0_hz, upsampling=64,
                            sample_rate=16000, use_angular_cumsum=True):
    n_samples = upsampling * int(f0_hz.shape[1])
    audio = tf.zeros([f0_hz.shape[0], n_samples])
    for s in range(int(f0_hz.shape[-1])):
        audio += harmonic_synthesis_one(
            f0_hz[..., s:s + 1], amplitudes, harmonic_shifts,
            harmonic_distribution, n_samples, sample_rate,
            use_angular_cumsum)
    return audio


def filtered_noise_signal(magnitudes, noise, initial_bias=-5.0,
                          window_size=257):
    mags = exp_sigmoid(magnitudes + initial_bias)
    return frequency_filter(noise, mags, window_size=window_size)


def reverb_ir(v, piano_model, inference=True, decay_start=16000,
              decay_exponent=4.0):
    ids = tf.cast(piano_model, tf.int32)
    ir = tf.gather(v['reverb_model/reverb_dict/layer_with_weights-0/'
                     'embeddings'], ids, axis=0)
    if len(ir.shape) == 3:
        ir = ir[:, 0]
    if inference:
        length = int(ir.shape[-1])
        time = tf.linspace(0.0, 1.0, length - decay_start)
        mask = tf.concat([tf.ones([decay_start]),
                          tf.exp(-decay_exponent * time)], axis=0)
        ir = ir * mask[tf.newaxis, :]
    return ir


def reverb_apply(audio, ir):
    """ddsp effects.Reverb: mask the dry tap of the IR, convolve, add dry."""
    ir = tf.concat([tf.zeros_like(ir[:, 0:1]), ir[:, 1:]], axis=1)
    wet = fft_convolve(audio, ir, padding='same', delay_compensation=0)
    return wet + audio


# -----------------------------------------------------------------------------
# Full forward
# -----------------------------------------------------------------------------


def parallelize(x, n_synths):
    """Reference Parallelizer.parallelize for one feature."""
    if len(x.shape) <= 3:
        x = tf.repeat(x[tf.newaxis], n_synths, axis=0)
    else:
        x = tf.transpose(x, [2, 0, 1, 3])
    return tf.reshape(x, tf.concat([[-1], tf.shape(x)[2:]], 0))


def dafx22_forward(v, conditioning, pedal, piano_model, noise,
                   sample_rate=16000, frame_rate=250, inference=True):
    """Full dafx22 forward. noise: (n_synths * batch, n_samples), voice-major
    rows matching the Parallelizer fold order. Returns dict with the dry mix,
    the reverberated audio, and controls."""
    conditioning = tf.constant(conditioning, tf.float32)
    pedal = tf.constant(pedal, tf.float32)
    b, n_frames, n_synths, _ = conditioning.shape
    upsampling = sample_rate // frame_rate
    n_samples = upsampling * n_frames

    # Global features.
    z, global_inharm, global_detuning = z_encoder(v, piano_model, n_frames)
    context = context_network(v, conditioning, pedal, z)
    rev_ir = reverb_ir(v, piano_model, inference=inference)

    # Parallelize (fold polyphony into batch).
    cond_p = parallelize(conditioning, n_synths)
    context_p = parallelize(context, n_synths)
    gi_p = parallelize(global_inharm, n_synths)
    gd_p = parallelize(global_detuning, n_synths)

    # Monophonic features.
    extended_pitch = note_release(v, np.asarray(cond_p[..., 0:1]),
                                  frame_rate)
    inharm_coef = inharmonicity_network(v, extended_pitch, gi_p)
    f0_hz = detuner(v, extended_pitch, gd_p, use_detune=True)
    amplitudes, harmonic_distribution, magnitudes = monophonic_network(
        v, cond_p, extended_pitch, context_p)

    # Per-voice synthesis (sequential DAG like the reference).
    def voice(x, i):
        return x[i * b:(i + 1) * b]

    mix = tf.zeros([b, n_samples])
    for i in range(n_synths):
        amps, hd, shifts, f0 = multi_inharmonic_controls(
            voice(amplitudes, i), voice(harmonic_distribution, i),
            voice(inharm_coef, i), voice(f0_hz, i), sample_rate)
        additive = multi_inharmonic_signal(
            amps, hd, shifts, f0, upsampling, sample_rate,
            use_angular_cumsum=inference)
        noisy = filtered_noise_signal(voice(magnitudes, i),
                                      tf.constant(noise[i * b:(i + 1) * b],
                                                  tf.float32))
        mix = mix + additive + noisy

    audio_synth = reverb_apply(mix, rev_ir)
    return {'audio_synth': audio_synth, 'dry': mix,
            'extended_pitch': extended_pitch, 'f0_hz': f0_hz,
            'context': context, 'reverb_ir': rev_ir}
