"""Differentiable processors and the ProcessorGroup DAG runtime (L1)."""

from ddsp_piano_tpu.processors.base import (  # noqa: F401
    Add,
    MultiAdd,
    Processor,
    ProcessorGroup,
    nested_lookup,
)
from ddsp_piano_tpu.processors.inharm import (  # noqa: F401
    InHarmonic,
    MultiInharmonic,
)
from ddsp_piano_tpu.processors.noise import (  # noqa: F401
    DynamicSizeFilteredNoise,
    FilterBank,
    FilteredNoise,
    NoiseBandNetSynth,
    get_noise_bands,
)
from ddsp_piano_tpu.processors.reverb import (  # noqa: F401
    FeedbackDelayNetwork,
    Reverb,
)
from ddsp_piano_tpu.processors.surrogate import (  # noqa: F401
    SurrogateAdditive,
    surrogate_harmonic_synthesis,
)
