"""Batched, mesh-sharded evaluation (VERDICT round-1 #5).

The reference evaluates batch-1 segments (/root/reference/
evaluate_model.py:36-46); this CLI packs segments into mesh-sharded
batches with a vmapped per-element spectral loss. The contract: the
spectral.csv contents must not depend on the batch size.
"""

import itertools
import os

import numpy as np
import pytest

import jax

import evaluate_model
from ddsp_piano_tpu import configs as configs_module
from ddsp_piano_tpu.configs import get_model
from ddsp_piano_tpu.data import pipeline
from ddsp_piano_tpu.data.pipeline import get_dummy_data
from ddsp_piano_tpu.models.losses import SpectralLoss


def test_compute_per_element_matches_singleton_batches():
    rng = np.random.RandomState(0)
    target = rng.randn(3, 4000).astype(np.float32)
    synth = rng.randn(3, 4000).astype(np.float32)
    loss = SpectralLoss(fft_sizes=(512, 256, 64), logmag_weight=1.0)
    per_elem = np.asarray(loss.compute_per_element(target, synth))
    singles = [float(loss._loss(target[i:i + 1], synth[i:i + 1]))
               for i in range(3)]
    np.testing.assert_allclose(per_elem, singles, rtol=1e-5)


def _segments(n, seed0=0):
    """n batch-1 segment dicts in the pipeline's test-split format."""
    segs = []
    for i in range(n):
        seg = get_dummy_data(batch_size=1, duration=0.5, sample_rate=16000,
                             n_synths=4, seed=seed0 + i)
        seg['filename'] = np.asarray([[f'track_{i}']])
        segs.append(seg)
    return segs


def test_batched_segments_pads_remainder():
    segs = _segments(5)
    groups = list(evaluate_model.batched_segments(iter(segs), 4))
    assert len(groups) == 2
    (b0, m0, v0), (b1, m1, v1) = groups
    assert v0 == 4 and v1 == 1
    assert b0['audio'].shape[0] == 4 and b1['audio'].shape[0] == 4
    assert [m['filename'] for m in m0] == [f'track_{i}' for i in range(4)]
    assert [m['filename'] for m in m1] == ['track_4']
    # Pad rows repeat the final segment.
    np.testing.assert_array_equal(b1['audio'][1], b1['audio'][0])
    assert 'filename' not in b1


@pytest.fixture()
def tiny_eval_env(monkeypatch):
    segs = _segments(5)
    monkeypatch.setattr(pipeline, 'get_test_dataset',
                        lambda *a, **k: iter(list(segs)))
    monkeypatch.setattr(
        configs_module, 'get_model',
        lambda name, **kw: get_model('dafx22', duration=0.5, n_synths=4))
    return segs


def _run_eval(tmp_path, batch_size, out_name):
    import pandas as pd
    out_dir = str(tmp_path / out_name)
    args = evaluate_model.process_args(
        ['--batch_size', str(batch_size), '--duration', '0.5',
         '-c', 'tiny', 'data', out_dir])
    evaluate_model.main(args)
    return pd.read_csv(os.path.join(out_dir, 'spectral.csv'))


def test_csv_contents_independent_of_batch_size(tmp_path, tiny_eval_env):
    df1 = _run_eval(tmp_path, 1, 'b1')
    df4 = _run_eval(tmp_path, 4, 'b4')
    assert len(df1) == len(df4) == 5
    assert list(df1['filename']) == list(df4['filename'])
    assert list(df1['piano_model']) == list(df4['piano_model'])
    np.testing.assert_allclose(df4['loss_val'], df1['loss_val'], rtol=1e-4)


def test_get_wav_writes_one_file_per_segment(tmp_path, monkeypatch):
    """Every 10 s segment of a track shares meta['filename']; the writer
    must disambiguate with the global segment index instead of
    overwriting (ADVICE r2: only the last segment's audio survived).
    All five segments here share one filename — the pre-fix writer
    produced a single wav."""
    segs = _segments(5)
    for seg in segs:
        seg['filename'] = np.asarray([['same_track']])
    monkeypatch.setattr(pipeline, 'get_test_dataset',
                        lambda *a, **k: iter(list(segs)))
    monkeypatch.setattr(
        configs_module, 'get_model',
        lambda name, **kw: get_model('dafx22', duration=0.5, n_synths=4))
    out_dir = str(tmp_path / 'wavs')
    args = evaluate_model.process_args(
        ['--batch_size', '2', '--duration', '0.5', '--get_wav',
         '-c', 'tiny', 'data', out_dir])
    evaluate_model.main(args)
    wavs = sorted(os.listdir(os.path.join(out_dir, 'wav')))
    assert wavs == [f'same_track_{i:04d}.wav' for i in range(5)], wavs
