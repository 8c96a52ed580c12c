#!/usr/bin/env python
"""Evaluate a trained model on the MAESTRO test set.

Argument-compatible with /root/reference/evaluate_model.py: forwards the
test split in 10 s segments, records the per-segment multi-scale spectral
loss to spectral_losses.csv / spectral.csv, and optionally dumps the
synthesized wavs.

Unlike the reference (which distributes batch-1 forwards over replicas,
evaluate_model.py:36-46), segments are packed into --batch_size batches
sharded over the device mesh, and the per-segment losses come from a
vmapped per-element spectral loss — identical CSV values, roughly
batch-fold fewer dispatches. The final partial batch is padded (pad rows
are dropped from the CSV), so no segment is skipped.

Note: like the reference (whose validation_step runs with training=True,
evaluate_model.py:40), losses are computed from a training-mode forward; we
keep that protocol so numbers are comparable.
"""

import argparse
import logging
import os

osjoin = os.path.join
logging.basicConfig(level=logging.INFO, format='%(message)s')


def process_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--config', '-c', type=str, default='maestro_v2',
                        help="Model config name or .gin path.")
    parser.add_argument('--ckpt', type=str, default=None,
                        help="Model checkpoint to load (orbax or TF).")
    parser.add_argument('--warm_up', '-wu', type=float, default=0.5,
                        help="Warm-up duration (in s, default: %(default)s)")
    parser.add_argument('--get_wav', '-w', action='store_true',
                        help="Generate wav files.")
    parser.add_argument('--duration', type=float, default=10.0,
                        help="Segment duration (default: %(default)s)")
    parser.add_argument('--batch_size', '-b', type=int, default=4,
                        help="Segments per forward, sharded over the mesh "
                             "(default: %(default)s)")
    parser.add_argument('--n_devices', type=int, default=None,
                        help="Devices in the data-parallel mesh "
                             "(default: all).")
    parser.add_argument('--device', choices=('auto', 'cpu'), default='auto',
                        help="Force evaluation on CPU (useful on hosts "
                             "without an accelerator).")
    parser.add_argument('maestro_dir', type=str,
                        help="Path to the MAESTRO dataset.")
    parser.add_argument('out_dir', type=str,
                        help="Folder for evaluation outputs.")
    return parser.parse_args(argv)


def batched_segments(dataset, batch_size):
    """Group batch-1 segment dicts into padded size-batch_size batches.

    Yields (batch dict without 'filename', per-segment metadata rows,
    n_valid). The last group is padded by repeating its final segment so
    every segment is evaluated with one fixed compiled shape (XLA: no
    dynamic shapes); callers drop the pad rows.
    """
    import numpy as np

    group = []
    for seg in dataset:
        group.append(seg)
        if len(group) < batch_size:
            continue
        yield _concat_group(group, np, batch_size)
        group = []
    if group:
        yield _concat_group(group, np, batch_size)


def _concat_group(group, np, batch_size):
    n_valid = len(group)
    padded = group + [group[-1]] * (batch_size - n_valid)
    batch = {k: np.concatenate([g[k] for g in padded])
             for k in padded[0] if k != 'filename'}
    metas = [{'filename': str(g['filename'][0][0]),
              'piano_model': int(g['piano_model'][0][0])}
             for g in group]
    return batch, metas, n_valid


def main(args):
    import jax

    if getattr(args, 'device', 'auto') == 'cpu':
        # Must happen before the first backend use (some accelerator
        # plugins override JAX_PLATFORMS; same knob as the synthesis CLI).
        jax.config.update('jax_platforms', 'cpu')

    from ddsp_piano_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    import numpy as np
    import pandas as pd

    from ddsp_piano_tpu.configs import get_model
    from ddsp_piano_tpu.data import audio_io, pipeline
    from ddsp_piano_tpu.parallel import mesh as mesh_lib
    from synthesize_midi_file import restore_params

    model = get_model(args.config, inference=True, duration=args.duration)
    params = model.init(jax.random.PRNGKey(0))
    params = restore_params(model, params, args.ckpt)
    mesh = mesh_lib.get_mesh_for_batch(args.batch_size, args.n_devices)
    logging.info("Mesh: %d device(s), batch %d", mesh.devices.size,
                 args.batch_size)
    params = mesh_lib.replicate(params, mesh)

    # One shared definition of the vmapped per-segment protocol — bench.py
    # times exactly this function as eval_segment_ms.
    from ddsp_piano_tpu.training.evaluation import build_segment_eval_fn
    eval_step = jax.jit(build_segment_eval_fn(model))

    test_dataset = pipeline.get_test_dataset(
        args.maestro_dir, duration=args.duration, batch_size=1,
        sample_rate=model.sample_rate, max_polyphony=model.n_synths)

    os.makedirs(args.out_dir, exist_ok=True)
    if args.get_wav:
        os.makedirs(osjoin(args.out_dir, 'wav'), exist_ok=True)

    # Losses stay on device during the sweep: blocking on every batch's
    # scalars would serialize dispatch against compute. They are
    # materialized in bulk at each periodic CSV write.
    def to_rows(evaluations):
        rows = []
        for per_seg, metas in evaluations:
            vals = np.asarray(per_seg)
            rows.extend({**meta, 'loss_val': float(vals[j])}
                        for j, meta in enumerate(metas))
        return rows

    evaluations = []
    n_segments = 0
    for i, (batch, metas, n_valid) in enumerate(
            batched_segments(test_dataset, args.batch_size)):
        seg_indices = np.arange(n_segments,
                                n_segments + args.batch_size)
        # Pad rows reuse the last valid segment's index (rows are dropped).
        seg_indices = np.minimum(seg_indices, n_segments + n_valid - 1)
        sharded = mesh_lib.shard_batch(batch, mesh)
        seg_indices = mesh_lib.shard_batch(
            {'i': seg_indices}, mesh)['i']
        per_seg, audio_synth = eval_step(params, sharded, seg_indices)
        evaluations.append((per_seg, metas))
        n_segments += n_valid
        if i % 32 == 0:
            pd.DataFrame(to_rows(evaluations)).to_csv(
                osjoin(args.out_dir, 'spectral_losses.csv'), index=False)
            logging.info("segment %d: loss %.4f", n_segments,
                         float(per_seg[0]))
        if args.get_wav:
            audio_host = np.asarray(audio_synth)
            for j, meta in enumerate(metas):
                # Segment index in the name: every 10 s segment of a track
                # shares meta['filename'], so a bare name would overwrite.
                base = meta['filename'].split('/')[-1]
                wav_name = f"{base}_{n_segments - n_valid + j:04d}.wav"
                audio_io.write_wav(osjoin(args.out_dir, 'wav', wav_name),
                                   audio_host[j], model.sample_rate)

    rows = to_rows(evaluations)
    pd.DataFrame(rows).to_csv(osjoin(args.out_dir, 'spectral.csv'),
                              index=False)
    if rows:
        mean_loss = float(np.mean([r['loss_val'] for r in rows]))
        logging.info("Evaluated %d segments; mean spectral loss %.4f",
                     len(rows), mean_loss)


if __name__ == '__main__':
    main(process_args())
