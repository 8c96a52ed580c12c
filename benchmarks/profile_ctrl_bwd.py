"""Decompose the dafx22 ctrl-path BACKWARD cost per sub-module.

Round-4 follow-up to profile_train_bwd.py (ctrl_vjp 19.3 ms of the
34.4 ms full value-and-grad) and the GRU-backward-kernel negative result
(benchmarks/ab_ctrl_bwd.py: swapping the scan VJP for a Pallas reverse
recurrence moved the train step 37.7 -> 38.5 ms). If the recurrence VJP
itself is not the cost, something else in the ctrl path is — this script
finds it with ADDITIVE attribution: value_and_grad of cumulative PREFIXES
of the ctrl pipeline (global slots -> parallelize -> mono slots), so
increment k = marginal fwd+bwd cost of module k inside one fused program
(same telescoping idea as bench.py's stage_inc_* keys).

Also times the raw GRU recurrence VJPs at the train shapes (scan vs
Pallas-bwd kernel) and the NoteRelease scan VJP, isolated.

Protocol: all arms interleaved across reps in one process, per CLAUDE.md.
"""
import sys
import time

from _ab_common import jax  # noqa: F401  (path + compilation cache)

import jax.numpy as jnp
import numpy as np

from ddsp_piano_tpu.configs import get_model
from ddsp_piano_tpu.data.pipeline import get_dummy_data
from ddsp_piano_tpu.kernels import gru_pallas as gp


def interleaved(arms, n_iters=50, reps=4):
    for name, (fn, args) in arms.items():
        jax.block_until_ready(fn(*args))
    best = {name: float('inf') for name in arms}
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
    return best


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    duration = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
    b = int(sys.argv[4]) if len(sys.argv) > 4 else 6

    model = get_model('dafx22', duration=duration)
    params = model.init(jax.random.PRNGKey(0))
    batch = get_dummy_data(batch_size=b, duration=duration,
                           sample_rate=16000)
    cond = np.zeros_like(batch['conditioning'])
    for v in range(cond.shape[2]):
        if v % 2 == 0:
            cond[:, 10:, v, 0] = 40.0 + 3.0 * v
            cond[:, 10:30, v, 1] = 0.7
    batch['conditioning'] = cond
    feats = {k: jnp.asarray(v) for k, v in batch.items()}
    b = batch['audio'].shape[0]

    # Pipeline as an ordered list of (name, fn(params, features)->features).
    stages = []
    for slot in model.GLOBAL_SLOTS:
        mod = getattr(model, slot)
        if mod is None:
            continue
        stages.append((slot, lambda p, f, m=mod, s=slot: {
            **f, **m.apply_features(p[s], f, training=True)}))
    stages.append(('parallelize',
                   lambda p, f: model.parallelizer.parallelize(f)))
    for slot in model.MONO_SLOTS:
        mod = getattr(model, slot)
        if mod is None:
            continue
        stages.append((slot, lambda p, f, m=mod, s=slot: {
            **f, **m.apply_features(p[s], f, training=True)}))
    stages.append(('unparallelize',
                   lambda p, f: model.parallelizer.unparallelize(f, b)))

    def scalar_of(f):
        tot = 0.0
        for leaf in jax.tree.leaves(f):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                tot = tot + jnp.sum(leaf)
        return tot

    arms = {}
    for k in range(len(stages)):
        def prefix_loss(p, k=k):
            f = dict(feats)
            for _, fn in stages[:k + 1]:
                f = fn(p, dict(f))
            return scalar_of(f)
        arms[f'vg{k:02d}_{stages[k][0]}'] = (
            jax.jit(jax.value_and_grad(prefix_loss)), (params,))
        # Forward-only prefixes: additive per-module cost of the ctrl
        # *inference* path (VERDICT r3 item 4 — the fusion ceiling).
        arms[f'fw{k:02d}_{stages[k][0]}'] = (
            jax.jit(prefix_loss), (params,))

    # Raw recurrence VJP arms at the train shapes.
    rng = np.random.RandomState(3)
    for tag, B, U in (('mono_gru', 16 * b, 192), ('ctx_gru', b, 64)):
        T = int(250 * duration)  # dafx22 frame rate
        x_proj = jnp.asarray(rng.randn(T, B, 3 * U).astype(np.float32) * .3)
        rec_k = jnp.asarray(rng.randn(U, 3 * U).astype(np.float32) * 0.1)
        rec_b = jnp.asarray(rng.randn(3 * U).astype(np.float32) * 0.1)
        h0 = jnp.zeros((B, U), jnp.float32)
        g = jnp.asarray(rng.randn(T, B, U).astype(np.float32))
        hs = jax.jit(gp.gru_scan_reference)(x_proj, rec_k, rec_b, h0)
        arms[f'raw/{tag}_vjp_scan'] = (
            jax.jit(gp._gru_reference_vjp), (x_proj, rec_k, rec_b, h0, g))
        arms[f'raw/{tag}_vjp_kernel'] = (
            lambda *a: gp.gru_scan_pallas_bwd(*a),
            (x_proj, rec_k, rec_b, h0, hs, g))
        arms[f'raw/{tag}_fwd_scan'] = (
            jax.jit(gp.gru_scan_reference), (x_proj, rec_k, rec_b, h0))

    # NoteRelease reference-scan VJP (the path AD takes via custom_jvp).
    nr = model.note_release
    cond_par = jax.jit(lambda p, f: model.parallelizer.parallelize(
        model.compute_global_features(p, dict(f), True)))(params, feats)

    def nr_loss(p):
        out = nr.apply_features(p, dict(cond_par), training=True)
        return scalar_of(out)
    arms['raw/note_release_vg'] = (
        jax.jit(jax.value_and_grad(nr_loss)), (params['note_release'],))

    results = interleaved(arms, n_iters=n_iters, reps=reps)
    width = max(len(k) for k in results)
    prev = {'vg': None, 'fw': None}
    for k in sorted(results):
        inc = ''
        tag = k[:2]
        if tag in prev and k[2:4].isdigit():
            inc = (f'  (inc {results[k] - prev[tag]:+7.3f} ms)'
                   if prev[tag] is not None else '  (inc    base)')
            prev[tag] = results[k]
        print(f'{k:<{width}}  {results[k]:8.3f} ms{inc}')


if __name__ == '__main__':
    main()
