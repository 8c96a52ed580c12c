#!/usr/bin/env python
"""Evaluate a trained model on the MAESTRO test set.

Argument-compatible with /root/reference/evaluate_model.py: forwards the
test split in 10 s segments, records the per-segment multi-scale spectral
loss to spectral_losses.csv / spectral.csv, and optionally dumps the
synthesized wavs.

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
    parser.add_argument('maestro_dir', type=str,
                        help="Path to the MAESTRO dataset.")
    parser.add_argument('out_dir', type=str,
                        help="Folder for evaluation outputs.")
    return parser.parse_args(argv)


def main(args):
    import jax

    from ddsp_piano_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    import numpy as np
    import pandas as pd

    from ddsp_piano_tpu.configs import get_model
    from ddsp_piano_tpu.data import audio_io, pipeline
    from ddsp_piano_tpu.training.trainer import Trainer
    from synthesize_midi_file import restore_params

    model = get_model(args.config, inference=True, duration=args.duration)
    params = model.init(jax.random.PRNGKey(0))
    params = restore_params(model, params, args.ckpt)
    from ddsp_piano_tpu.parallel import mesh as mesh_lib
    trainer = Trainer(model, mesh=mesh_lib.get_mesh(1))  # batch_size is 1
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = trainer.state_with_params(state, params)

    test_dataset = pipeline.get_test_dataset(
        args.maestro_dir, duration=args.duration, batch_size=1,
        sample_rate=model.sample_rate, max_polyphony=model.n_synths)

    os.makedirs(args.out_dir, exist_ok=True)
    if args.get_wav:
        os.makedirs(osjoin(args.out_dir, 'wav'), exist_ok=True)

    # Losses stay on device during the sweep (sync=False): blocking on
    # every segment's scalar would serialize dispatch against compute.
    # They are materialized in bulk at each periodic CSV write.
    def to_rows(evaluations):
        return [{**e, 'loss_val': float(e['loss_val'])}
                for e in evaluations]

    evaluations = []
    for i, batch in enumerate(test_dataset):
        losses, audio_synth = trainer.validation_step(state, batch,
                                                      sync=False)
        filename = str(batch['filename'][0][0])
        evaluations.append({
            'filename': filename,
            'piano_model': int(batch['piano_model'][0][0]),
            'loss_val': losses['audio_stft_loss'],
        })
        if i % 100 == 0:
            pd.DataFrame(to_rows(evaluations)).to_csv(
                osjoin(args.out_dir, 'spectral_losses.csv'), index=False)
            logging.info("segment %d: loss %.4f", i,
                         float(losses['audio_stft_loss']))
        if args.get_wav:
            wav_name = filename.split('/')[-1] + '.wav'
            audio_io.write_wav(osjoin(args.out_dir, 'wav', wav_name),
                               np.asarray(audio_synth)[0],
                               model.sample_rate)

    evaluations = to_rows(evaluations)
    pd.DataFrame(evaluations).to_csv(osjoin(args.out_dir, 'spectral.csv'),
                                     index=False)
    if evaluations:
        mean_loss = float(np.mean([e['loss_val'] for e in evaluations]))
        logging.info("Evaluated %d segments; mean spectral loss %.4f",
                     len(evaluations), mean_loss)


if __name__ == '__main__':
    main(process_args())
