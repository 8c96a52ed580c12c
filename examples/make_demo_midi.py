#!/usr/bin/env python
"""Generate examples/demo.mid: a ~20 s chordal study exercising polyphony,
sustain pedal, re-strikes and the full keyboard range."""

import os

from ddsp_piano_tpu.data import midi


def main():
    notes = []
    ccs = []
    # I - vi - IV - V progression with arpeggios and a walking bass.
    chords = [(48, [60, 64, 67]), (45, [57, 60, 64]),
              (41, [53, 57, 60]), (43, [55, 59, 62])]
    t = 0.25
    for rep in range(2):
        for bass, chord in chords:
            ccs.append(midi.ControlChange(t - 0.05, 64, 127))
            notes.append(midi.Note(bass - 12, 70, t, t + 2.2))
            for i, p in enumerate(chord):
                notes.append(midi.Note(p, 85, t + 0.25 * i, t + 2.0))
            # Melody arpeggio an octave up.
            for i, p in enumerate(chord[::-1] + [chord[0] + 12]):
                notes.append(midi.Note(p + 12, 95 - 6 * i,
                                       t + 1.0 + 0.25 * i,
                                       t + 1.3 + 0.25 * i))
            ccs.append(midi.ControlChange(t + 2.3, 64, 0))
            t += 2.5
    # Final chord, pedal held to the end.
    ccs.append(midi.ControlChange(t - 0.05, 64, 127))
    for p in [36, 48, 55, 60, 64, 67, 72]:
        notes.append(midi.Note(p, 90, t, t + 0.8))
    path = os.path.join(os.path.dirname(__file__), 'demo.mid')
    midi.write_midi(path, notes, ccs)
    print('wrote', path)


if __name__ == '__main__':
    main()
