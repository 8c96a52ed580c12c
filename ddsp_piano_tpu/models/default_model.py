"""Legacy non-config paper-model assembly (API parity).

Equivalent of /root/reference/ddsp_piano/default_model.py:11-172: build the
DAFx-22 paper model purely in Python (no config system), with the
`build_polyphonic_processor_group` helper kept for users who assembled
models this way. New code should use ddsp_piano_tpu.configs.get_model.
"""

from __future__ import annotations

from typing import Optional

from ddsp_piano_tpu import processors
from ddsp_piano_tpu.models.dag import (VectorizedPolyphonicProcessorGroup,
                                       polyphonic_dag)
from ddsp_piano_tpu.processors.base import ProcessorGroup


def build_polyphonic_processor_group(n_synths: int = 16,
                                     sample_rate: int = 16000,
                                     frame_rate: int = 250,
                                     inference: bool = False,
                                     add_dry: bool = True,
                                     vectorized: bool = True,
                                     name: str = 'processor_group'):
    """Polyphonic additive + filtered-noise + reverb processor group
    (reference default_model.py:20-79)."""
    additive = processors.MultiInharmonic(name='additive',
                                          frame_rate=frame_rate,
                                          sample_rate=sample_rate,
                                          inference=inference)
    noise = processors.DynamicSizeFilteredNoise(name='noise',
                                                frame_rate=frame_rate,
                                                sample_rate=sample_rate)
    reverb = processors.Reverb(trainable=False, add_dry=add_dry)
    controls = ('amplitudes', 'harmonic_distribution', 'inharm_coef',
                'f0_hz')
    if vectorized:
        return VectorizedPolyphonicProcessorGroup(
            additive=additive, noise=noise, reverb=reverb,
            additive_controls=controls, noise_controls=('magnitudes',),
            reverb_controls=('reverb_ir',), n_synths=n_synths, name=name)
    dag = polyphonic_dag(additive, noise, reverb,
                         additive_controls=controls,
                         noise_controls=('magnitudes',),
                         reverb_controls=('reverb_ir',), n_synths=n_synths)
    return ProcessorGroup(dag, name=name)


def get_model(duration: float = 3.0,
              n_synths: int = 16,
              n_substrings: int = 2,
              n_piano_models: int = 10,
              piano_embedding_dim: int = 16,
              n_noise_filter_banks: int = 64,
              frame_rate: int = 250,
              sample_rate: int = 16000,
              reverb_duration: float = 1.5,
              inference: bool = False,
              first_phase: bool = True):
    """Assemble the DAFx-22 paper model (reference default_model.py:82-156)."""
    from ddsp_piano_tpu.configs.dafx22 import build
    return build(inference=inference, duration=duration,
                 sample_rate=sample_rate, frame_rate=frame_rate,
                 n_instruments=n_piano_models, n_synths=n_synths,
                 reverb_duration=reverb_duration,
                 z_dim=piano_embedding_dim,
                 n_noise_bands=n_noise_filter_banks,
                 first_phase=first_phase)


def build_model(model, batch_size: int = 6, duration: float = 3.0,
                sample_rate: int = 16000, first_phase: bool = True,
                seed: int = 0):
    """Initialize parameters by building against a dummy batch shape
    (reference default_model.py:159-172 'build-by-forward'). In JAX no
    forward is needed to create parameters; the dummy batch is only used
    to sanity-check shapes."""
    import jax
    import jax.numpy as jnp

    from ddsp_piano_tpu.data.pipeline import get_dummy_data

    params = model.init(jax.random.PRNGKey(seed))
    feats = {k: jnp.asarray(v)
             for k, v in get_dummy_data(batch_size=batch_size,
                                        duration=duration,
                                        sample_rate=sample_rate,
                                        n_synths=model.n_synths).items()}
    outs = jax.jit(lambda p, f: model(p, f, rng=jax.random.PRNGKey(0)))(
        params, feats)
    assert outs['audio_synth'].shape == (batch_size,
                                         int(duration * sample_rate))
    return params
