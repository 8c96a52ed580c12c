"""Track loading: aligned audio + MIDI -> model features.

Equivalents of /root/reference/ddsp_piano/utils/io_utils.py:85-201 built on
the dependency-free MIDI parser and wav reader in this package.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ddsp_piano_tpu.data import audio_io, midi
from ddsp_piano_tpu.data.midi_encoders import (MIDIRoll2Conditioning,
                                                roll_to_conditioning)


def ensure_sequence_length(sequence: np.ndarray, length: int,
                           right: bool = True) -> np.ndarray:
    """Zero-pad or crop axis 0 to `length` (pad/crop at the end if right)."""
    original = sequence.shape[0]
    if original == length:
        return sequence
    if original > length:
        return sequence[:length] if right else sequence[-length:]
    pad = [(0, length - original)] if right else [(length - original, 0)]
    pad += [(0, 0)] * (sequence.ndim - 1)
    return np.pad(sequence, pad)


def load_midi_as_note_sequence(mid_path: str) -> midi.MidiSequence:
    return midi.apply_sustain_control_changes(midi.parse_midi(mid_path))


def midi_roll_from_sequence(note_sequence: midi.MidiSequence,
                            frame_rate: int = 250):
    """(n_frames, 88, 2) active/onset roll + (n_frames, 4) pedals."""
    roll = midi.sequence_to_pianoroll(note_sequence,
                                      frames_per_second=frame_rate,
                                      min_pitch=21, max_pitch=108)
    midi_roll = np.stack([roll.active, roll.onset_velocities], axis=-1)
    pedals = roll.control_changes[:, 64:68].astype(np.float32) / 128.0
    return midi_roll, pedals


def load_midi_as_conditioning(mid_path: str,
                              n_synths: int = 16,
                              frame_rate: int = 250,
                              duration: Optional[float] = None,
                              warm_up_duration: float = 0.0
                              ) -> Dict[str, np.ndarray]:
    """MIDI file -> inference conditioning dict (io_utils.py:85-137).

    Returns conditioning (1, n_frames, n_synths, 2), pedal (1, n_frames, 4)
    and the total duration in seconds (cropped/padded to whole seconds, with
    warm-up silence prepended).
    """
    note_sequence = load_midi_as_note_sequence(mid_path)
    midi_roll, pedals = midi_roll_from_sequence(note_sequence, frame_rate)

    if duration is None:
        target_n_frames = int(np.ceil(note_sequence.total_time) * frame_rate)
    else:
        target_n_frames = int(duration * frame_rate)
    # Crop BEFORE voice allocation: the allocator is causal frame-by-frame
    # (bit-identical on a prefix) and is the sequential host hot-spot, so
    # a --duration 10 request on a 30-minute file must not allocate (and
    # materialize) the whole performance first.
    midi_roll = ensure_sequence_length(midi_roll, target_n_frames)
    conditioning, _ = roll_to_conditioning(midi_roll, n_synths)
    conditioning = ensure_sequence_length(conditioning, target_n_frames)
    pedals = ensure_sequence_length(pedals, target_n_frames)

    if warm_up_duration > 0.0:
        n_frames = target_n_frames + int(warm_up_duration * frame_rate)
        conditioning = ensure_sequence_length(conditioning, n_frames,
                                              right=False)
        pedals = ensure_sequence_length(pedals, n_frames, right=False)

    return {'conditioning': conditioning[np.newaxis].astype(np.float32),
            'pedal': pedals[np.newaxis].astype(np.float32),
            'duration': target_n_frames / frame_rate + warm_up_duration}


def load_data(audio_path: str,
              mid_path: str,
              max_polyphony: Optional[int] = None,
              sample_rate: int = 16000,
              frame_rate: int = 250):
    """Aligned audio + MIDI features for one track (io_utils.py:140-187)."""
    audio = audio_io.load_audio_as_signal(audio_path, sample_rate)
    note_sequence = load_midi_as_note_sequence(mid_path)
    midi_roll, pedals = midi_roll_from_sequence(note_sequence, frame_rate)
    if max_polyphony is not None:
        conditioning, polyphony = roll_to_conditioning(midi_roll,
                                                       max_polyphony)
        return audio, conditioning, pedals, polyphony
    return audio, midi_roll, pedals
