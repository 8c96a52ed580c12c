#!/usr/bin/env python
"""Synthesize a MIDI file to audio with a trained DDSP-Piano TPU model.

Argument-compatible with the reference CLI
(/root/reference/synthesize_midi_file.py): load MIDI as conditioning, build
the model from a config, restore a checkpoint (native orbax checkpoints or
released TF checkpoints, auto-detected), run one jit-compiled forward pass
on the accelerator and write the wav (plus an optional dry stem).
"""

import argparse
import logging
import os

logging.basicConfig(level=logging.INFO, format='%(message)s')


def process_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('-c', '--config', type=str,
                        default='maestro_v2',
                        help="Model config name (e.g. maestro_v2, dafx22) "
                             "or a .gin config path. (default: %(default)s)")
    parser.add_argument('--ckpt', type=str, default=None,
                        help="Model checkpoint to load (orbax dir or TF "
                             "checkpoint dir/prefix).")
    parser.add_argument('--piano_type', type=int, default=9,
                        help="Piano model (from 0 to 9). "
                             "(default: %(default)s)")
    parser.add_argument('-wu', '--warm_up', type=float, default=0.5,
                        help="Warm-up duration (in s, default: %(default)s)")
    parser.add_argument('-d', '--duration', type=float, default=None,
                        help="Maximum duration of synthesized audio. "
                             "(default: %(default)s)")
    parser.add_argument('-n', '--normalize', type=float, default=None,
                        help="Normalize audio to this amount of dBFS. "
                             "(default: %(default)s)")
    parser.add_argument('-u', '--unreverbed', action='store_true',
                        help="Also generate dry piano audio, without reverb.")
    parser.add_argument('--seed', type=int, default=0,
                        help="RNG seed for the noise synthesizer.")
    parser.add_argument('--streaming', action='store_true',
                        help="Render in fixed-size compiled chunks with "
                             "carried state (bounded memory, one compile "
                             "for any file length).")
    parser.add_argument('--chunk_seconds', type=float, default=4.0,
                        help="Streaming chunk length (default: %(default)s; "
                             "4 s measured fastest on TPU for long files — "
                             "larger chunks push the per-chunk reverb FFT "
                             "to the next power of two and regress).")
    parser.add_argument('--device', choices=('auto', 'cpu'), default='auto',
                        help="Force synthesis on CPU (useful on hosts "
                             "without an accelerator).")
    parser.add_argument('midi_file', type=str,
                        help="Piano MIDI file to synthesize.")
    parser.add_argument('out_file', type=str,
                        help="Save audio as wav file.")
    return parser.parse_args(argv)


def is_tf_checkpoint(path: str) -> bool:
    """A TF object checkpoint has .index files (dir or prefix form)."""
    if path is None:
        return False
    if os.path.isfile(path + '.index'):
        return True
    if os.path.isdir(path):
        return any(name.endswith('.index') for name in os.listdir(path))
    return False


def restore_params(model, params, ckpt):
    from ddsp_piano_tpu.training import checkpoints
    if ckpt is None:
        logging.warning("No --ckpt given: synthesizing with random weights.")
        return params
    if is_tf_checkpoint(ckpt):
        logging.info("Restoring released TF checkpoint from %s", ckpt)
        params, report = checkpoints.import_tf_weights(model, params, ckpt)
        logging.info("Imported %d variables.", len(report['matched']))
        return params
    logging.info("Restoring native checkpoint from %s", ckpt)
    state = checkpoints.restore_checkpoint(ckpt, {'params': params})
    return state['params']


def main(args):
    import jax

    if getattr(args, 'device', 'auto') == 'cpu':
        # Must happen before the first backend use (some accelerator
        # plugins override JAX_PLATFORMS).
        jax.config.update('jax_platforms', 'cpu')

    from ddsp_piano_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from ddsp_piano_tpu.configs import get_model
    from ddsp_piano_tpu.data import audio_io
    from ddsp_piano_tpu.data.io import load_midi_as_conditioning

    # Probe the config's rates/polyphony BEFORE rasterizing the MIDI (a
    # gin override of frame_rate or n_synths must shape the conditioning;
    # model construction is weight-free and cheap, so build twice).
    probe = get_model(args.config, inference=True, duration=1.0)
    logging.info("Loading midi file...")
    inputs = load_midi_as_conditioning(args.midi_file,
                                       duration=args.duration,
                                       warm_up_duration=args.warm_up,
                                       frame_rate=probe.frame_rate,
                                       n_synths=probe.n_synths)
    inputs['piano_model'] = np.asarray([[args.piano_type]], np.int32)
    logging.info("Midi file loaded (with duration %s s). "
                 "Now building the piano synthesizer...",
                 inputs['duration'] - args.warm_up)

    model = get_model(args.config, inference=True,
                      duration=inputs['duration'])
    params = model.init(jax.random.PRNGKey(0))
    params = restore_params(model, params, args.ckpt)

    logging.info("Model built. Now synthesizing audio "
                 "(first run compiles, this can take ~1 min)...")
    features = {k: jnp.asarray(v) for k, v in inputs.items()
                if k != 'duration'}
    sample_rate = model.sample_rate
    crop = int(args.warm_up * sample_rate)

    if args.streaming:
        from ddsp_piano_tpu.models.streaming import StreamingSynthesizer
        chunk_frames = int(args.chunk_seconds * model.frame_rate)
        if chunk_frames < 1:
            raise SystemExit(
                f"--chunk_seconds {args.chunk_seconds} is below one frame "
                f"period (1/{model.frame_rate} s).")
        total = features['conditioning'].shape[1]
        if total % chunk_frames:  # right-pad to a whole number of chunks
            pad = chunk_frames - total % chunk_frames
            for k in ('conditioning', 'pedal'):
                widths = [(0, 0), (0, pad)] + [(0, 0)] * (
                    features[k].ndim - 2)
                features[k] = jnp.pad(features[k], widths)
        streamer = StreamingSynthesizer(model, chunk_frames=chunk_frames)
        # Device-resident lax.scan driver: ~6x faster than the python
        # chunk loop on long files (no per-chunk host round trips).
        result = streamer.synthesize_scanned(
            params, features, rng=jax.random.PRNGKey(args.seed),
            return_dry=args.unreverbed)
        n_samples = int(inputs['duration'] * sample_rate)
        if args.unreverbed:
            audio_synth, dry = result
            outs = {'audio_synth': audio_synth[:, :n_samples],
                    'add': {'signal': dry[:, :n_samples]}}
        else:
            outs = {'audio_synth': result[:, :n_samples]}
    else:
        @jax.jit
        def forward(params, features):
            return model(params, features,
                         rng=jax.random.PRNGKey(args.seed))

        outs = forward(params, features)

    audio = np.asarray(outs['audio_synth'])[0, crop:]
    audio_io.write_wav(args.out_file, audio, sample_rate)
    if args.normalize is not None:
        audio_io.normalize_audio(args.out_file, args.normalize)

    if args.unreverbed:
        dry = np.asarray(outs['add']['signal'])[0, crop:]
        dry_file = args.out_file + '_unreverbed.wav'
        audio_io.write_wav(dry_file, dry, sample_rate)
        if args.normalize is not None:
            audio_io.normalize_audio(dry_file, args.normalize)

    logging.info("Audio saved at %s.", args.out_file)


if __name__ == '__main__':
    main(process_args())
