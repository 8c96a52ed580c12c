#!/usr/bin/env python
"""Export a checkpoint to the reference's TF object-checkpoint format.

Write-side interop: a model trained or fine-tuned in this framework (native
orbax checkpoints) — or a released TF checkpoint re-exported unchanged —
becomes loadable by the reference tooling's `trainer.restore`
(/root/reference/train_single_phase.py:153-155,
synthesize_midi_file.py:68), whose TF object-based restore resolves
variables by the same Keras object paths this writer emits.

Usage:
    python export_tf_checkpoint.py --config dafx22 \
        --ckpt exp/phase_1/last_iter --out exported/ckpt-0
"""

import argparse
import logging

logging.basicConfig(level=logging.INFO, format='%(message)s')


def process_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--config', '-c', type=str, default='maestro_v2',
                        help="Model config name or .gin path.")
    parser.add_argument('--ckpt', type=str, required=True,
                        help="Checkpoint to export (orbax dir or TF ckpt).")
    parser.add_argument('--out', type=str, required=True,
                        help="Output TF checkpoint prefix (e.g. .../ckpt-0).")
    return parser.parse_args(argv)


def main(args):
    # Pure host-side work: force CPU before any backend use so the export
    # never touches (or waits on) an accelerator.
    import jax

    jax.config.update('jax_platforms', 'cpu')

    from ddsp_piano_tpu.configs import get_model
    from ddsp_piano_tpu.training import checkpoints
    from synthesize_midi_file import restore_params

    model = get_model(args.config)
    params = model.init(jax.random.PRNGKey(0))
    params = restore_params(model, params, args.ckpt)
    written = checkpoints.export_tf_weights(model, params, args.out)
    n_vars = len(checkpoints.tf_name_map(model, params))
    logging.info("Wrote %d variables to TF checkpoint %s", n_vars, written)
    return written


if __name__ == '__main__':
    main(process_args())
