"""ENSTDkCl single-instrument 32 kHz configuration.

Mirrors /root/reference/ddsp_piano/configs/ENSTDkCl-32kHz.gin: one
instrument, ParametricTuning (joint inharmonicity + Railsback detuning),
exp_tanh scaling, no Normalize after the mono Dense stack's output layer,
192 harmonics / 128 noise bands, trainable standalone FDN reverb with 6
trainable delay lines.
"""

from __future__ import annotations

from functools import partial

from ddsp_piano_tpu import nn, processors
from ddsp_piano_tpu.configs.registry import register
from ddsp_piano_tpu.models import (PianoModel, Parallelizer,
                                   VectorizedPolyphonicProcessorGroup)
from ddsp_piano_tpu.models import losses as losses_lib
from ddsp_piano_tpu.models import sub_modules as sm
from ddsp_piano_tpu.ops import core


@register('enstdkcl_32khz')
def build(inference: bool = False,
          duration: float = 3.0,
          sample_rate: int = 32000,
          frame_rate: int = 250,
          n_synths: int = 16,
          z_dim: int = 16,
          n_harmonics: int = 192,
          n_noise_bands: int = 128,
          delay_lines: int = 6,
          first_phase: bool = True) -> PianoModel:
    context_in = n_synths * 2 + 4 + z_dim
    context_network = sm.ContextNetwork(
        layers=[
            nn.Dense(32, context_in, activation='leaky_relu'),
            nn.GRU(64, 32),
            nn.Normalize(64),
        ],
        out_features=64,
        normalize_pitch=True,
    )
    monophonic_network = sm.MonophonicNetwork(
        layers=[
            nn.Dense(128, 35, activation='leaky_relu'),
            nn.GRU(192, 128),
            nn.Dense(192, 192, activation='leaky_relu'),
        ],
        out_features=192,
        output_splits=(('amplitudes', 1),
                       ('harmonic_distribution', n_harmonics),
                       ('magnitudes', n_noise_bands)),
    )
    processor_group = VectorizedPolyphonicProcessorGroup(
        additive=processors.MultiInharmonic(
            name='additive', frame_rate=frame_rate, sample_rate=sample_rate,
            inference=inference, scale_fn=core.exp_tanh,
            normalize_after_nyquist_cut=False),
        noise=processors.DynamicSizeFilteredNoise(
            name='noise', frame_rate=frame_rate, sample_rate=sample_rate,
            scale_fn=core.exp_tanh),
        reverb=processors.FeedbackDelayNetwork(
            trainable=True, delay_trainable=True, delay_lines=delay_lines,
            sampling_rate=sample_rate),
        reverb_controls=(),
        n_synths=n_synths,
    )
    return PianoModel(
        z_encoder=sm.OneHotZEncoder(n_instruments=1, z_dim=z_dim,
                                    duration=duration,
                                    frame_rate=frame_rate),
        note_release=sm.NoteRelease(frame_rate=frame_rate),
        context_network=context_network,
        parallelizer=Parallelizer(n_synths=n_synths),
        monophonic_network=monophonic_network,
        inharm_model=sm.ParametricTuning(),
        processor_group=processor_group,
        losses=[
            losses_lib.SpectralLoss(loss_type='L1', mag_weight=1.0,
                                    logmag_weight=1.0,
                                    sample_rate=sample_rate,
                                    name='audio_stft_loss'),
        ],
    )
