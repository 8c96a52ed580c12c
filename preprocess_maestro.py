#!/usr/bin/env python
"""Preprocess the MAESTRO dataset into a per-track feature cache.

Equivalent of /root/reference/preprocess_maestro.py (which saves tf.data
snapshots); here tracks are cached as compressed .npz files + a JSON index,
loadable by the data pipeline when the path contains an index file.

The reference's __main__ calls preprocess_data_into_tfrecord(process_args())
instead of main(args) (preprocess_maestro.py:47) — a bug fixed here.
"""

import argparse
import logging
import os

logging.basicConfig(level=logging.INFO, format='%(message)s')


def process_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--sample_rate', '-sr', type=int, default=24000,
                        help="Audio sample rate (default: %(default)s)")
    parser.add_argument('--frame_rate', '-fr', type=int, default=250,
                        help="Conditioning frame rate "
                             "(default: %(default)s)")
    parser.add_argument('--polyphony', '-p', type=int, default=16,
                        help="Polyphonic capacity (default: %(default)s)")
    parser.add_argument('--splits', nargs='+',
                        default=['validation', 'train'],
                        help="Dataset splits to preprocess.")
    parser.add_argument('--num_workers', type=int, default=8)
    parser.add_argument('maestro_path', type=str,
                        help="Path to the maestro-v3.0.0 folder.")
    parser.add_argument('out_dir', type=str,
                        help="Output cache directory.")
    return parser.parse_args(argv)


def main(args):
    from ddsp_piano_tpu.data import pipeline
    os.makedirs(args.out_dir, exist_ok=True)
    for split in args.splits:
        logging.info("Preprocessing split %r ...", split)
        meta = pipeline.preprocess_into_cache(
            args.out_dir, args.maestro_path, split=split,
            sample_rate=args.sample_rate, frame_rate=args.frame_rate,
            max_polyphony=args.polyphony, num_workers=args.num_workers)
        logging.info("Cached %d %s tracks into %s", len(meta['tracks']),
                     split, args.out_dir)


if __name__ == '__main__':
    main(process_args())
