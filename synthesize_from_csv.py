#!/usr/bin/env python
"""Batch-synthesize MIDI performances listed in a CSV file.

Argument-compatible with /root/reference/synthesize_from_csv.py: per CSV row
(columns mid_file, piano_model, canonical_composer), load the MIDI, run one
forward pass, save <piano_model><composer>.wav; with --decompose also render
the dry mix and isolated additive / subtractive stems recomputed per voice
from the saved controls.
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
    parser.add_argument('--duration', '-d', type=float, default=10.0,
                        help="Maximum duration of synthesized audio. "
                             "(default: %(default)s)")
    parser.add_argument('--warm_up', '-wu', type=float, default=0.5,
                        help="Warm-up duration (in s, default: %(default)s)")
    parser.add_argument('-n', '--normalize', type=float, default=None,
                        help="Normalize the output audio to the given "
                             "level (dBFS).")
    parser.add_argument('--decompose', '-dc', action='store_true',
                        help="Generate isolated piano elements audio.")
    parser.add_argument('maestro_dir', type=str,
                        help="Path to the maestro dataset directory.")
    parser.add_argument('csv_file', type=str,
                        help=".csv file listing MIDI files to synthesize.")
    parser.add_argument('out_dir', type=str,
                        help="Folder for the synthesized wav files.")
    parser.add_argument('--device', choices=('auto', 'cpu'), default='auto',
                        help="Force synthesis on CPU (useful on hosts "
                             "without an accelerator).")
    return parser.parse_args(argv)


def main(args):
    import jax

    if getattr(args, 'device', 'auto') == 'cpu':
        # Must happen before the first backend use (some accelerator
        # plugins override JAX_PLATFORMS; same knob as the other CLIs).
        jax.config.update('jax_platforms', 'cpu')

    from ddsp_piano_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np
    import pandas as pd

    from ddsp_piano_tpu.configs import get_model
    from ddsp_piano_tpu.data import audio_io
    from ddsp_piano_tpu.data.io import load_midi_as_conditioning
    from synthesize_midi_file import restore_params

    model = get_model(args.config, inference=True,
                      duration=args.duration + args.warm_up)
    params = model.init(jax.random.PRNGKey(0))
    params = restore_params(model, params, args.ckpt)
    sample_rate = model.sample_rate
    crop = int(args.warm_up * sample_rate)

    @jax.jit
    def forward(params, features):
        return model(params, features, rng=jax.random.PRNGKey(0))

    @jax.jit
    def render_stems(outs):
        """Isolated additive and noise stems re-rendered per voice from
        the saved controls (reference synthesize_from_csv.py:99-127).
        One jitted program: eager per-op dispatch through the relayed
        chip both crawls and trips backend ops (eager complex FFTs are
        UNIMPLEMENTED there)."""
        additive = model.processor_group.additive
        noise = model.processor_group.noise
        additive_signal, noise_signal = 0.0, 0.0
        for i in range(model.n_synths):
            additive_signal = additive_signal + additive.apply(
                {}, outs[f'amplitudes_{i}'],
                outs[f'harmonic_distribution_{i}'],
                outs[f'inharm_coef_{i}'], outs[f'f0_hz_{i}'])
            noise_signal = noise_signal + noise.apply(
                {}, outs[f'magnitudes_{i}'], rng=jax.random.PRNGKey(i))
        return additive_signal, noise_signal

    df = pd.read_csv(args.csv_file)
    required = {'mid_file', 'piano_model', 'canonical_composer'}
    missing = required - set(df.columns)
    if missing:
        raise SystemExit(
            f"{args.csv_file} is missing columns {sorted(missing)}; this "
            f"CLI expects a performance listing with columns "
            f"{sorted(required)} (not the MAESTRO metadata csv).")
    piano_models = np.sort(df['piano_model'].unique())
    os.makedirs(args.out_dir, exist_ok=True)

    def save(path, audio):
        audio_io.write_wav(path, audio, sample_rate)
        if args.normalize is not None:
            audio_io.normalize_audio(path, args.normalize)

    for _, row in df.iterrows():
        logging.info("Loading file %s", row['mid_file'])
        inputs = load_midi_as_conditioning(
            osjoin(args.maestro_dir, row['mid_file']),
            duration=args.duration,
            warm_up_duration=args.warm_up)
        piano_model = row['piano_model']
        composer = str(row['canonical_composer']).split(' ')[-1]
        inputs['piano_model'] = np.asarray(
            [[int(np.where(piano_models == piano_model)[0][0])]], np.int32)
        features = {k: jnp.asarray(v) for k, v in inputs.items()
                    if k != 'duration'}

        logging.info("Synthesizing %s%s (%.1f s)...", piano_model, composer,
                     inputs['duration'] - args.warm_up)
        outs = forward(params, features)
        stem = osjoin(args.out_dir, f'{piano_model}{composer}')
        save(stem + '.wav',
             np.asarray(outs['audio_synth'])[0, crop:])

        if args.decompose:
            save(stem + '_unreverbed.wav',
                 np.asarray(outs['add']['signal'])[0, crop:])
            additive_signal, noise_signal = render_stems(outs)
            save(stem + '_additive.wav',
                 np.asarray(additive_signal)[0, crop:])
            save(stem + '_substractive.wav',
                 np.asarray(noise_signal)[0, crop:])


if __name__ == '__main__':
    main(process_args())
