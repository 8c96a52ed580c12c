"""Attribute the dafx22 train step's BACKWARD cost (VERDICT r3 item 2).

bench.py round 4 splits the step into fwd 8.8 / bwd 28.6 / opt+host; this
script splits the backward further, at the dafx22 recipe shapes (b=6, 3 s,
16 kHz, 16 voices x 2 substrings): value_and_grad of

  loss        — multi-scale spectral loss alone (w.r.t. synth audio)
  osc+loss    — additive processor (controls+signal+voice sum) + loss,
                w.r.t. the folded raw controls (the Pallas bwd kernel path)
  noise+loss  — noise processor + loss, w.r.t. folded magnitudes
  ctrl        — control path (GRUs/NoteRelease/tuners) w.r.t. params via
                jax.vjp with fixed cotangents
  full        — the whole loss w.r.t. params (= bench train_stage fwd+bwd)

Interleaved best-of-reps, one process (CLAUDE.md protocol).
"""
import sys
import time

from _ab_common import jax  # noqa: F401

import jax.numpy as jnp
import numpy as np

from ddsp_piano_tpu.configs import get_model
from ddsp_piano_tpu.data.pipeline import get_dummy_data
from ddsp_piano_tpu.models import losses as losses_lib


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    model = get_model('dafx22', duration=3.0)
    params = model.init(jax.random.PRNGKey(0))
    batch = get_dummy_data(batch_size=6, duration=3.0, sample_rate=16000)
    # Realistic pitches (uniform-[0,1] dummy pitches sit below the
    # min_frequency gate, which silences the additive path; see
    # tests/test_train_cli.py round-4 note). Half the voices active.
    cond = np.zeros_like(batch['conditioning'])
    n_frames = cond.shape[1]
    for v in range(cond.shape[2]):
        if v % 2 == 0:
            cond[:, 10:, v, 0] = 40.0 + 3.0 * v
            cond[:, 10:30, v, 1] = 0.7
    batch['conditioning'] = cond
    feats = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(17)
    pg = model.processor_group
    spectral = model.loss_objs[0]
    audio = feats['audio']

    def ctrl_path(p):
        f = dict(feats)
        f = model.compute_global_features(p, f, True)
        f = model.parallelizer.parallelize(f)
        f = model.compute_monophonic_features(p, f, True)
        f = model.parallelizer.unparallelize(f, audio.shape[0])
        keys = (list(pg.additive_controls) + list(pg.noise_controls)
                + list(pg.reverb_controls))
        return {k: f[k] for k in keys}

    ctrl_feats = jax.jit(ctrl_path)(params)
    fold = lambda x: x.reshape((-1,) + x.shape[2:])
    add_args = tuple(fold(ctrl_feats[c]) for c in pg.additive_controls)
    noise_args = tuple(fold(ctrl_feats[c]) for c in pg.noise_controls)
    n, b = model.n_synths, audio.shape[0]
    pg_params = params.get('processor_group', {})

    def loss_of(synth):
        return spectral.compute({'audio': audio, 'audio_synth': synth})

    def osc_loss(args):
        p = pg_params.get(pg.additive.name, {})
        c = pg.additive.get_controls(p, *args)
        sig = pg.additive.get_signal(p, rng=rng, **c)
        mix = sig.reshape(n, b, sig.shape[-1]).sum(axis=0)
        return loss_of(mix)

    def noise_loss(args):
        p = pg_params.get(pg.noise.name, {})
        c = pg.noise.get_controls(p, *args)
        sig = pg.noise.get_signal(p, rng=rng, **c)
        mix = sig.reshape(n, b, sig.shape[-1]).sum(axis=0)
        return loss_of(mix)

    def full_loss(p):
        outs = model(p, feats, training=True, rng=rng)
        return outs['losses']['total_loss']

    # ctrl backward: vjp with fixed cotangents (ones at control scale).
    cots = jax.tree.map(jnp.ones_like, ctrl_feats)

    def ctrl_vjp(p):
        _, pull = jax.vjp(ctrl_path, p)
        return pull(cots)

    synth0 = jax.jit(lambda a: a + 0.01 * jax.random.normal(
        rng, a.shape))(audio)

    # Optimizer alone (round 4: bench's train_stage_opt_host residue is
    # ~10 ms — find out whether the optax update is any of it).
    from ddsp_piano_tpu.training.trainer import Trainer
    trainer = Trainer(model, learning_rate=1e-3, first_phase=True)
    state = trainer.init_state(jax.random.PRNGKey(0))
    grads = jax.jit(jax.grad(full_loss))(state.params)

    def opt_only(p, opt_state, g):
        import optax
        updates, opt_state = trainer.optimizer.update(g, opt_state, p)
        return optax.apply_updates(p, updates), opt_state

    def full_step(s):
        new_s, _ = trainer.train_step(s, batch)
        return new_s.params

    arms = {
        'opt_only': (jax.jit(opt_only),
                     (state.params, state.opt_state, grads)),
        'full_step': (full_step, (state,)),
        'loss_vg': (jax.jit(jax.value_and_grad(loss_of)), (synth0,)),
        'osc_loss_vg': (jax.jit(jax.value_and_grad(osc_loss)), (add_args,)),
        'noise_loss_vg': (jax.jit(jax.value_and_grad(noise_loss)),
                          (noise_args,)),
        'ctrl_vjp': (jax.jit(ctrl_vjp), (params,)),
        'ctrl_fwd': (jax.jit(ctrl_path), (params,)),
        'full_vg': (jax.jit(jax.value_and_grad(full_loss)), (params,)),
        'full_fwd': (jax.jit(full_loss), (params,)),
    }

    for name, (fn, args) in arms.items():
        jax.block_until_ready(fn(*args))
    best = {k: float('inf') for k in arms}
    for _ in range(reps):
        for name, (fn, args) in arms.items():
            out = fn(*args)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(n_iters):
                out = fn(*args)
            jax.block_until_ready(out)
            best[name] = min(best[name],
                             (time.perf_counter() - t0) / n_iters * 1e3)
    width = max(len(k) for k in best)
    for k in sorted(best):
        print(f'{k:<{width}}  {best[k]:8.3f} ms')


if __name__ == '__main__':
    main()
