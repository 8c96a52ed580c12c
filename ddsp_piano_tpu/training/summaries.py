"""TensorBoard observability: scalars, audio, spectrograms, tuning curves.

Equivalents of the reference's summary helpers (train_single_phase.py
tf.summary usage and ddsp_piano/utils/summaries.py:7-61). TensorFlow is
used host-side only, as the event-file writer.
"""

from __future__ import annotations

import io
from typing import Dict, Optional

import numpy as np


class NullWriter:
    """No-op writer for non-lead hosts in a multi-host run: every host
    computes identical replicated summaries, only process 0 writes."""

    def __getattr__(self, name):
        return lambda *a, **k: None


class SummaryWriter:
    """Thin tf.summary wrapper (lazy TF import, host-side only)."""

    def __init__(self, logdir: str):
        import tensorflow as tf
        self._tf = tf
        self._writer = tf.summary.create_file_writer(logdir)

    def scalar(self, tag: str, value: float, step: int):
        with self._writer.as_default():
            self._tf.summary.scalar(tag, value, step=step)

    def scalars(self, prefix: str, values: Dict[str, float], step: int):
        for k, v in values.items():
            self.scalar(f'{prefix}/{k}', v, step)

    def audio(self, tag: str, audio: np.ndarray, sample_rate: int,
              step: int, max_outputs: int = 4):
        """audio: (batch, n_samples)."""
        audio = np.asarray(audio, np.float32)
        peak = np.abs(audio).max() or 1.0
        audio = (audio / max(peak, 1.0))[..., np.newaxis]
        with self._writer.as_default():
            self._tf.summary.audio(tag, audio, sample_rate, step=step,
                                   max_outputs=max_outputs,
                                   encoding='wav')

    def image(self, tag: str, image: np.ndarray, step: int):
        """image: (h, w, c) uint8 or float [0,1]."""
        with self._writer.as_default():
            self._tf.summary.image(tag, image[np.newaxis], step=step)

    def figure(self, tag: str, fig, step: int):
        """Log a matplotlib figure."""
        buf = io.BytesIO()
        fig.savefig(buf, format='png', dpi=100)
        buf.seek(0)
        img = self._tf.image.decode_png(buf.getvalue(), channels=4)
        with self._writer.as_default():
            self._tf.summary.image(tag, img[self._tf.newaxis], step=step)
        import matplotlib.pyplot as plt
        plt.close(fig)

    def spectrogram_summary(self, audio: np.ndarray, audio_synth: np.ndarray,
                            step: int, sample_rate: int = 16000,
                            tag: str = 'spectrogram'):
        """Side-by-side log-mel-style spectrogram images of target vs
        synthesized audio (first batch element)."""
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(2, 1, figsize=(8, 6), sharex=True)
        for ax, (name, a) in zip(axes, [('original', audio),
                                        ('synthesized', audio_synth)]):
            a = np.asarray(a)[0]
            spec = _log_magnitude_spectrogram(a)
            ax.imshow(spec.T, origin='lower', aspect='auto', cmap='magma')
            ax.set_title(name)
            ax.set_ylabel('freq bin')
        axes[-1].set_xlabel('frame')
        fig.tight_layout()
        self.figure(tag, fig, step)

    def flush(self):
        self._writer.flush()


def _log_magnitude_spectrogram(audio: np.ndarray, frame: int = 1024,
                               hop: int = 256) -> np.ndarray:
    n_frames = max((len(audio) - frame) // hop + 1, 1)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame)[None, :]
    idx = np.minimum(idx, len(audio) - 1)
    frames = audio[idx] * np.hanning(frame)
    mag = np.abs(np.fft.rfft(frames, axis=-1))
    return np.log(mag + 1e-6)


def tuning_curve_figures(model, params):
    """Learned inharmonicity / detuning curves over the 88-key range
    (reference utils/summaries.py:7-61). Returns {name: figure}."""
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    figures = {}
    pitches = np.arange(21, 109, dtype=np.float32)
    pitch_in = jnp.asarray(pitches.reshape(1, -1, 1))

    if model.inharm_model is not None:
        try:
            outs = model.inharm_model.apply_features(
                params['inharm_model'],
                {'extended_pitch': pitch_in,
                 'piano_model': jnp.zeros((1, 1), jnp.int32)})
            inharm = np.asarray(outs['inharm_coef'])[0, :, 0]
            fig, ax = plt.subplots(figsize=(6, 4))
            ax.semilogy(pitches, np.maximum(inharm, 1e-8))
            ax.set_xlabel('MIDI pitch')
            ax.set_ylabel('inharmonicity B')
            ax.set_title('Learned inharmonicity over tessitura')
            figures['inharmonicity'] = fig
            if 'f0_hz' in outs:
                from ddsp_piano_tpu.ops import core as ops_core
                f0 = np.asarray(outs['f0_hz'])[0, :, 0]
                et = np.asarray(ops_core.midi_to_hz(pitches))
                cents = 1200.0 * np.log2(np.maximum(f0, 1e-6) / et)
                fig2, ax2 = plt.subplots(figsize=(6, 4))
                ax2.plot(pitches, cents)
                ax2.set_xlabel('MIDI pitch')
                ax2.set_ylabel('deviation from ET (cents)')
                ax2.set_title('Learned tuning (Railsback curve)')
                figures['tuning'] = fig2
        except (KeyError, TypeError):
            pass
    return figures
