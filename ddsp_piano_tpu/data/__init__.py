"""Host-side data pipeline: MIDI parsing, voice allocation, audio I/O."""

from ddsp_piano_tpu.data import audio_io, io, midi, midi_encoders, pipeline  # noqa: F401
from ddsp_piano_tpu.data.midi_encoders import (  # noqa: F401
    MIDIRoll2Conditioning,
    roll_to_conditioning,
)
from ddsp_piano_tpu.data.midi_encoders_jax import (  # noqa: F401
    roll_to_conditioning_jax,
)
from ddsp_piano_tpu.data.pipeline import get_dummy_data  # noqa: F401
