#!/usr/bin/env python
"""Config smoke test CLI (reference ddsp_piano/configs/gin_test.py:8-28):
parse a config (name or .gin path), forward a dummy batch, print the
parameter summary, and run a distributed build check on the device mesh.

Usage: python -m ddsp_piano_tpu.configs.gin_test <config> [--duration D]
"""

import argparse


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('config', type=str,
                        help='Config name or .gin path.')
    parser.add_argument('--duration', type=float, default=1.0)
    parser.add_argument('--batch_size', type=int, default=2)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ddsp_piano_tpu.configs import get_model
    from ddsp_piano_tpu.data.pipeline import get_dummy_data
    from ddsp_piano_tpu.parallel import mesh as mesh_lib
    from ddsp_piano_tpu.training.trainer import Trainer

    model = get_model(args.config, duration=args.duration)
    params = model.init(jax.random.PRNGKey(0))

    n_params = sum(np.prod(x.shape) for x in jax.tree.leaves(params))
    print(f"config {args.config}: sample_rate={model.sample_rate}, "
          f"n_synths={model.n_synths}, parameters={int(n_params):,}")
    for slot, p in params.items():
        n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(p))
        print(f"  {slot:28s} {n:>10,} params")

    feats = {k: jnp.asarray(v)
             for k, v in get_dummy_data(
                 batch_size=args.batch_size, duration=args.duration,
                 sample_rate=model.sample_rate).items()}
    outs = jax.jit(
        lambda p, f: model(p, f, training=True,
                           rng=jax.random.PRNGKey(0)))(params, feats)
    print("forward ok:", outs['audio_synth'].shape)
    print("losses:", {k: round(float(v), 4)
                      for k, v in outs['losses'].items()})

    # Distributed build check (the strategy-scope rebuild equivalent).
    mesh = mesh_lib.get_mesh()
    trainer = Trainer(model, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    _, losses = trainer.train_step(state, {k: np.asarray(v)
                                           for k, v in feats.items()})
    print(f"distributed train step ok on {mesh.devices.size} device(s):",
          round(losses['total_loss'], 4))


if __name__ == '__main__':
    main()
