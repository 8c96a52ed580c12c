"""Standard MIDI File parsing and pianoroll extraction (host-side).

A dependency-free replacement for the note_seq functionality the reference
uses (midi_file_to_note_sequence, apply_sustain_control_changes,
sequence_to_pianoroll; /root/reference/ddsp_piano/utils/io_utils.py:77-112):

- parse .mid files (SMF format 0/1, running status, tempo maps),
- extend note offsets through the sustain pedal (CC64),
- rasterize to {active, onset-velocity, control-change} rolls at a fixed
  frame rate over piano pitches 21..108.

Everything here is numpy on the host; the output feeds the voice allocator
(ddsp_piano_tpu.data.midi_encoders) and then the device pipeline.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

MIN_PIANO_PITCH = 21
MAX_PIANO_PITCH = 108
DEFAULT_TEMPO_US_PER_QUARTER = 500000


@dataclasses.dataclass
class Note:
    pitch: int
    velocity: int
    start_time: float
    end_time: float
    channel: int = 0


@dataclasses.dataclass
class ControlChange:
    time: float
    control: int
    value: int
    channel: int = 0


@dataclasses.dataclass
class MidiSequence:
    """Parsed MIDI performance (a minimal NoteSequence equivalent)."""
    notes: List[Note]
    control_changes: List[ControlChange]
    total_time: float


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        out = self.data[self.pos:self.pos + n]
        if len(out) < n:
            raise ValueError("Unexpected end of MIDI data")
        self.pos += n
        return out

    def u8(self) -> int:
        return self.read(1)[0]

    def varint(self) -> int:
        value = 0
        while True:
            b = self.u8()
            value = (value << 7) | (b & 0x7F)
            if not b & 0x80:
                return value

    @property
    def remaining(self) -> int:
        return len(self.data) - self.pos


def _parse_track(data: bytes):
    """Yield (tick, kind, payload) events from one MTrk chunk."""
    r = _Reader(data)
    tick = 0
    running_status = None
    while r.remaining > 0:
        tick += r.varint()
        status = r.u8()
        if status < 0x80:
            if running_status is None:
                raise ValueError("Running status without prior status byte")
            r.pos -= 1
            status = running_status
        if status == 0xFF:                      # meta event
            meta_type = r.u8()
            length = r.varint()
            payload = r.read(length)
            yield tick, 'meta', (meta_type, payload)
            continue
        if status in (0xF0, 0xF7):              # sysex
            length = r.varint()
            r.read(length)
            continue
        running_status = status
        kind = status & 0xF0
        channel = status & 0x0F
        if kind in (0x80, 0x90, 0xA0, 0xB0, 0xE0):
            d1, d2 = r.u8(), r.u8()
            yield tick, 'channel', (kind, channel, d1, d2)
        elif kind in (0xC0, 0xD0):
            d1 = r.u8()
            yield tick, 'channel', (kind, channel, d1, 0)
        else:
            raise ValueError(f"Unhandled MIDI status byte 0x{status:02x}")


class _TempoMap:
    """Piecewise-constant tick -> seconds conversion."""

    def __init__(self, ticks_per_quarter: int,
                 tempo_events: List[Tuple[int, int]]):
        self.tpq = ticks_per_quarter
        events = sorted(tempo_events)
        if not events or events[0][0] > 0:
            events = [(0, DEFAULT_TEMPO_US_PER_QUARTER)] + events
        self.ticks = [t for t, _ in events]
        self.times = []
        acc = 0.0
        for i, (tick, tempo) in enumerate(events):
            if i > 0:
                prev_tick, prev_tempo = events[i - 1]
                acc += (tick - prev_tick) * prev_tempo / (1e6 * self.tpq)
            self.times.append(acc)
        self.tempos = [tempo for _, tempo in events]

    def to_seconds(self, tick: int) -> float:
        import bisect
        i = bisect.bisect_right(self.ticks, tick) - 1
        return (self.times[i]
                + (tick - self.ticks[i]) * self.tempos[i] / (1e6 * self.tpq))


def parse_midi_bytes(data: bytes) -> MidiSequence:
    r = _Reader(data)
    if r.read(4) != b'MThd':
        raise ValueError("Not a Standard MIDI File (missing MThd)")
    header_len = struct.unpack('>I', r.read(4))[0]
    if header_len < 6:
        # read(header_len - 6) would otherwise rewind the stream.
        raise ValueError(f"Corrupt MThd header length {header_len}")
    fmt, ntrks, division = struct.unpack('>HHH', r.read(6))
    r.read(header_len - 6)
    if division & 0x8000:
        # SMPTE time: division = -(fps) << 8 | ticks_per_frame.
        fps = 256 - (division >> 8)
        ticks_per_frame = division & 0xFF
        smpte_seconds_per_tick = 1.0 / (fps * ticks_per_frame)
    else:
        smpte_seconds_per_tick = None

    tracks = []
    while r.remaining >= 8:
        chunk_type = r.read(4)
        length = struct.unpack('>I', r.read(4))[0]
        chunk = r.read(length)
        if chunk_type == b'MTrk':
            tracks.append(list(_parse_track(chunk)))

    tempo_events = []
    for track in tracks:
        for tick, kind, payload in track:
            if kind == 'meta' and payload[0] == 0x51:
                tempo = int.from_bytes(payload[1], 'big')
                tempo_events.append((tick, tempo))
    tempo_map = (None if smpte_seconds_per_tick is not None
                 else _TempoMap(division, tempo_events))

    def tick_time(tick: int) -> float:
        if smpte_seconds_per_tick is not None:
            return tick * smpte_seconds_per_tick
        return tempo_map.to_seconds(tick)

    notes: List[Note] = []
    controls: List[ControlChange] = []
    for track in tracks:
        open_notes: Dict[Tuple[int, int], List[Tuple[int, int]]] = {}
        for tick, kind, payload in track:
            if kind != 'channel':
                continue
            msg, channel, d1, d2 = payload
            if msg == 0x90 and d2 > 0:
                open_notes.setdefault((channel, d1), []).append((tick, d2))
            elif msg == 0x80 or (msg == 0x90 and d2 == 0):
                stack = open_notes.get((channel, d1))
                if stack:
                    start_tick, velocity = stack.pop(0)
                    notes.append(Note(pitch=d1, velocity=velocity,
                                      start_time=tick_time(start_tick),
                                      end_time=tick_time(tick),
                                      channel=channel))
            elif msg == 0xB0:
                controls.append(ControlChange(time=tick_time(tick),
                                              control=d1, value=d2,
                                              channel=channel))
        # Close any dangling notes at their start (zero length).
        for (channel, pitch), stack in open_notes.items():
            for start_tick, velocity in stack:
                t = tick_time(start_tick)
                notes.append(Note(pitch, velocity, t, t, channel))

    notes.sort(key=lambda n: (n.start_time, n.pitch))
    controls.sort(key=lambda c: (c.time, c.control))
    total_time = 0.0
    if notes:
        total_time = max(total_time, max(n.end_time for n in notes))
    if controls:
        total_time = max(total_time, controls[-1].time)
    return MidiSequence(notes=notes, control_changes=controls,
                       total_time=total_time)


def parse_midi(path: str) -> MidiSequence:
    with open(path, 'rb') as f:
        return parse_midi_bytes(f.read())


def apply_sustain_control_changes(sequence: MidiSequence,
                                  sustain_control: int = 64,
                                  threshold: int = 64) -> MidiSequence:
    """Extend note offsets while the sustain pedal is down.

    note_seq-equivalent semantics: while CC64 >= threshold, a released note
    keeps sounding until the pedal rises; a re-strike of the same pitch
    truncates the sustained copy at the new onset; notes still held at the
    end of the sequence keep their offsets.
    """
    events = []  # (time, order, obj)
    _PEDAL, _ONSET, _OFFSET = 0, 1, 2
    for cc in sequence.control_changes:
        if cc.control == sustain_control:
            events.append((cc.time, _PEDAL, cc))
    notes = [Note(**dataclasses.asdict(n)) for n in sequence.notes]
    for n in notes:
        events.append((n.start_time, _ONSET, n))
        events.append((n.end_time, _OFFSET, n))
    events.sort(key=lambda e: (e[0], e[1]))

    pedal_down = {c: False for c in range(16)}
    # Per channel: notes whose offset passed while pedal was down.
    sustained: Dict[int, List[Note]] = {c: [] for c in range(16)}
    # Per channel+pitch: currently sounding (for re-strike truncation).
    for time, order, obj in events:
        if order == _PEDAL:
            down = obj.value >= threshold
            ch = obj.channel
            if pedal_down[ch] and not down:
                for n in sustained[ch]:
                    n.end_time = time
                sustained[ch] = []
            pedal_down[ch] = down
        elif order == _ONSET:
            ch = obj.channel
            still = []
            for n in sustained[ch]:
                if n.pitch == obj.pitch:
                    n.end_time = time
                else:
                    still.append(n)
            sustained[ch] = still
        else:  # _OFFSET
            ch = obj.channel
            if pedal_down[ch] and obj.end_time >= time:
                # Only sustain notes whose natural offset this is (the end
                # time may already have been rewritten by a re-strike).
                sustained[ch].append(obj)
    # Pedal still down at end of sequence: sustained notes ring until the
    # final event time (note_seq behavior for performances without a
    # trailing pedal release).
    end_of_events = max([e[0] for e in events] + [sequence.total_time])
    for ch in range(16):
        for n in sustained[ch]:
            n.end_time = end_of_events
    total_time = max([n.end_time for n in notes] + [sequence.total_time])
    return MidiSequence(notes=notes,
                       control_changes=list(sequence.control_changes),
                       total_time=total_time)


@dataclasses.dataclass
class Pianoroll:
    """Rasterized performance at a fixed frame rate."""
    active: np.ndarray            # (n_frames, 88) float 0/1
    onset_velocities: np.ndarray  # (n_frames, 88) float in [0, 1]
    control_changes: np.ndarray   # (n_frames, 128) int (last value held)


def sequence_to_pianoroll(sequence: MidiSequence,
                          frames_per_second: float,
                          min_pitch: int = MIN_PIANO_PITCH,
                          max_pitch: int = MAX_PIANO_PITCH,
                          onset_window_secs: float = 0.032) -> Pianoroll:
    """Rasterize notes to active/onset/CC rolls.

    Frame conventions follow note_seq: a note occupies frames
    [floor(start * fps), ceil(end * fps)), the onset-velocity roll marks
    frames covering [start, start + onset_window] with velocity / 127
    (note_seq's onset_mode='window' with its 32 ms default onset length),
    and the roll has ceil(total_time * fps) + 1 frames.
    """
    fps = float(frames_per_second)
    n_frames = int(np.ceil(sequence.total_time * fps)) + 1
    n_pitches = max_pitch - min_pitch + 1
    active = np.zeros((n_frames, n_pitches), np.float32)
    onset_velocities = np.zeros((n_frames, n_pitches), np.float32)
    control_changes = np.zeros((n_frames, 128), np.int32)

    for note in sequence.notes:
        if note.pitch < min_pitch or note.pitch > max_pitch:
            continue
        p = note.pitch - min_pitch
        start = int(np.floor(note.start_time * fps))
        end = int(np.ceil(note.end_time * fps))
        end = max(end, start + 1)
        active[start:min(end, n_frames), p] = 1.0
        onset_end = int(np.ceil((note.start_time + onset_window_secs) * fps))
        onset_end = max(onset_end, start + 1)
        onset_velocities[start:min(onset_end, n_frames), p] = (
            note.velocity / 127.0)

    # Forward-fill control-change values: write each event at its frame,
    # then carry values forward with a segment fill per controller
    # (vectorized — a per-frame Python loop with a 128-wide copy took
    # seconds of host time on multi-minute files).
    events: Dict[int, List[tuple]] = {}
    for cc in sequence.control_changes:
        frame = int(np.floor(cc.time * fps))
        if frame < n_frames:
            events.setdefault(cc.control, []).append((frame, cc.value))
    for control, evs in events.items():
        # Stable sort on the frame only: same-frame events keep file
        # order so the LAST event in the file wins, as before.
        evs.sort(key=lambda fv: fv[0])
        frames = [f for f, _ in evs]
        values = [v for _, v in evs]
        # Dedup same-frame events keeping the last.
        frames_u, values_u = [], []
        for f, v in zip(frames, values):
            if frames_u and frames_u[-1] == f:
                values_u[-1] = v
            else:
                frames_u.append(f)
                values_u.append(v)
        bounds = frames_u + [n_frames]
        for (f0, v), f1 in zip(zip(frames_u, values_u), bounds[1:]):
            control_changes[f0:f1, control] = v
    return Pianoroll(active=active, onset_velocities=onset_velocities,
                     control_changes=control_changes)


# -----------------------------------------------------------------------------
# MIDI writing (round-trip support for tests and tooling)
# -----------------------------------------------------------------------------


def write_midi(path: str, notes: List[Note],
               control_changes: Optional[List[ControlChange]] = None,
               ticks_per_quarter: int = 480,
               tempo_us_per_quarter: int = DEFAULT_TEMPO_US_PER_QUARTER):
    """Write a single-track SMF from absolute-time notes/CCs."""
    events = []  # (time, priority, bytes)
    for n in notes:
        events.append((n.start_time, 1,
                       bytes([0x90 | n.channel, n.pitch, n.velocity])))
        events.append((n.end_time, 0,
                       bytes([0x80 | n.channel, n.pitch, 0])))
    for cc in (control_changes or []):
        events.append((cc.time, 0,
                       bytes([0xB0 | cc.channel, cc.control, cc.value])))
    events.sort(key=lambda e: (e[0], e[1]))

    seconds_per_tick = tempo_us_per_quarter / (1e6 * ticks_per_quarter)

    def varint(v: int) -> bytes:
        out = [v & 0x7F]
        v >>= 7
        while v:
            out.append((v & 0x7F) | 0x80)
            v >>= 7
        return bytes(reversed(out))

    track = bytearray()
    track += varint(0) + bytes([0xFF, 0x51, 0x03]) + tempo_us_per_quarter.to_bytes(3, 'big')
    last_tick = 0
    for time, _, msg in events:
        tick = int(round(time / seconds_per_tick))
        track += varint(tick - last_tick) + msg
        last_tick = tick
    track += varint(0) + bytes([0xFF, 0x2F, 0x00])

    with open(path, 'wb') as f:
        f.write(b'MThd' + struct.pack('>IHHH', 6, 0, 1, ticks_per_quarter))
        f.write(b'MTrk' + struct.pack('>I', len(track)) + bytes(track))
