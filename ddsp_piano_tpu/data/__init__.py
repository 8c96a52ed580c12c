"""Host-side data pipeline: MIDI parsing, voice allocation, audio I/O."""

from ddsp_piano_tpu.data import audio_io, io, midi, midi_encoders, pipeline  # noqa: F401
from ddsp_piano_tpu.data.midi_encoders import MIDIRoll2Conditioning  # noqa: F401
from ddsp_piano_tpu.data.pipeline import get_dummy_data  # noqa: F401
