"""Data pipeline: dummy batches, segmentation, batching, caching.

Host-side numpy equivalents of /root/reference/ddsp_piano/data_pipeline.py.
The heavyweight parts (MIDI decode, voice allocation) live in
ddsp_piano_tpu.data.midi / midi_encoders; this module provides the canonical
batch shapes and the segment/batch/filter machinery feeding the trainer.
"""

from __future__ import annotations

import math
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np


def get_dummy_data(batch_size: int = 6,
                   duration: float = 3.0,
                   sample_rate: int = 16000,
                   frame_rate: int = 250,
                   n_synths: int = 16,
                   n_instruments: int = 10,
                   seed: int = 0) -> Dict[str, np.ndarray]:
    """Random features with the canonical shapes (data_pipeline.py:7-40).

    conditioning (b, t, n_synths, 2), pedal (b, t, 4), audio (b, n_samples),
    piano_model (b, 1) int32.
    """
    rng = np.random.RandomState(seed)
    n_frames = int(duration * frame_rate)
    n_samples = int(duration * sample_rate)
    return {
        'conditioning': rng.uniform(
            0.0, 1.0, (batch_size, n_frames, n_synths, 2)).astype(np.float32),
        'pedal': rng.uniform(
            0.0, 1.0, (batch_size, n_frames, 4)).astype(np.float32),
        'audio': rng.uniform(
            0.0, 1.0, (batch_size, n_samples)).astype(np.float32),
        'piano_model': rng.randint(
            0, n_instruments, (batch_size, 1)).astype(np.int32),
    }


def split_sequence(x: np.ndarray, segment_duration: float, rate: float,
                   overlap: float = 0.5) -> np.ndarray:
    """Overlapping segmentation along axis 0 (io_utils.py:227-242)."""
    n_samples = int(segment_duration * rate)
    hop_size = int(n_samples * (1 - overlap))
    segments = []
    timestep = 0
    while timestep + n_samples <= x.shape[0]:
        segments.append(x[timestep:timestep + n_samples])
        timestep += hop_size
    if not segments:
        return np.zeros((0, n_samples) + x.shape[1:], dtype=x.dtype)
    return np.stack(segments)


def segment_track(track: Dict[str, np.ndarray],
                  duration: float,
                  sample_rate: int,
                  frame_rate: int,
                  overlap: float = 0.5,
                  max_polyphony: Optional[int] = 16,
                  filter_over_polyphony: bool = True
                  ) -> List[Dict[str, np.ndarray]]:
    """Split one loaded track dict into per-segment feature dicts.

    Expects keys audio (n_samples,), conditioning (n_frames, n_synths, 2),
    pedal (n_frames, 4), polyphony (n_frames,), piano_model (1,),
    optionally filename.
    """
    audio = split_sequence(track['audio'], duration, sample_rate, overlap)
    conditioning = split_sequence(track['conditioning'], duration,
                                  frame_rate, overlap)
    pedal = split_sequence(track['pedal'], duration, frame_rate, overlap)
    polyphony = split_sequence(track['polyphony'], duration, frame_rate,
                               overlap)
    n_segments = min(len(audio), len(conditioning))
    segments = []
    for i in range(n_segments):
        if (filter_over_polyphony and max_polyphony is not None
                and polyphony[i].max() > max_polyphony):
            continue
        seg = {
            'audio': audio[i],
            'conditioning': conditioning[i],
            'pedal': pedal[i],
            'piano_model': np.asarray(track['piano_model'],
                                      np.int32).reshape(1),
        }
        if 'filename' in track:
            seg['filename'] = f"{track['filename']}_{i}"
        segments.append(seg)
    return segments


def batch_segments(segments: Sequence[Dict[str, np.ndarray]],
                   batch_size: int,
                   drop_remainder: bool = True
                   ) -> Iterator[Dict[str, np.ndarray]]:
    """Stack segment dicts into batches."""
    n_full = len(segments) // batch_size
    end = n_full * batch_size if drop_remainder else len(segments)
    for start in range(0, end, batch_size):
        group = segments[start:start + batch_size]
        if len(group) < batch_size and drop_remainder:
            return
        batch = {}
        for k in group[0]:
            if k == 'filename':
                batch[k] = np.asarray([[g[k]] for g in group])
            else:
                batch[k] = np.stack([g[k] for g in group])
        yield batch
