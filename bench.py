#!/usr/bin/env python
"""Benchmark: the full headline set, ONE JSON line.

Headline metric (matches BASELINE.md's north star): synthesis realtime
factor per chip — flagship maestro-v2 inference model, 16-voice polyphony
at 24 kHz, batch 1, realistic chordal conditioning; steady-state wall time
per jitted forward (post-compile, block_until_ready). {"metric":
"realtime_factor", "value": N, "unit": "audio_s_per_wall_s",
"vs_baseline": N / 200} — 200x is the north-star target.

Additional keys on the same line (the round-2 wins BASELINE.md claims, so
a regression in any of them is driver-visible, VERDICT r2 item 4):
- "aggregate_b8": per-chip audio-seconds/wall-second at batch 8 (serving).
- "train_step_ms": dafx22 recipe-shape training step (b=6, 3 s), 30-step
  steady state on dummy batches.
- "streaming_x" / "streaming_dafx22_x": 180 s file rendered by the
  chunked-scan streaming engine (4 s chunks, the CLI default). Protocol
  per BASELINE.md: compute only — the device->host copy of the 17 MB
  result costs ~1 s through the relayed chip and is excluded (the render
  returns a device array), matching the one-shot timing convention.
- "eval_segment_ms": evaluation-sweep device time per 10 s dafx22 segment
  at batch 8 (the evaluate_model.py protocol, incl. vmapped
  per-segment-rng forward — round 3 re-enabled the Pallas oscillator
  here via its custom_vmap batching rule).
- Per-stage forward breakdown ("stage_*_ms", VERDICT r2 item 9): control
  path (GRU/NoteRelease scans), processor group, and its oscillator /
  noise / reverb components, each timed as an independently-jitted
  program over materialized intermediates. Stages lose cross-stage XLA
  fusion, so their sum can exceed the fused forward slightly — they
  attribute cost, the fused number is the headline.
- Roofline keys from XLA's compiled cost analysis ("flops", "mfu_pct" vs
  bf16 peak, "hbm_util_pct" vs peak HBM bandwidth — this model is
  VPU/HBM-bound, so low MFU with high HBM utilization is the expected
  signature).

Every extra section is individually fault-isolated: a failure prints a
"<key>_error" string on the line instead of killing the headline metric.
"""

import json
import time

import numpy as np


def build_inputs(duration, n_synths=16, frame_rate=250, batch=1):
    """Chordal conditioning exercising all voices."""
    rng = np.random.RandomState(0)
    n_frames = int(duration * frame_rate)
    cond = np.zeros((batch, n_frames, n_synths, 2), np.float32)
    # 8 sustained chord voices + 8 voices with repeated notes.
    for v in range(n_synths):
        pitch = 36.0 + 5 * v
        if v < 8:
            cond[:, 10:, v, 0] = pitch
            cond[:, 10:18, v, 1] = 0.7
        else:
            for start in range(10, n_frames - 50, 125):
                cond[:, start:start + 100, v, 0] = pitch
                cond[:, start:start + 8, v, 1] = 0.9
    pedal = np.zeros((batch, n_frames, 4), np.float32)
    piano_model = np.full((batch, 1), 5, np.int32)
    return {'conditioning': cond, 'pedal': pedal,
            'piano_model': piano_model}


# TPU v5e (lite) public peaks, for the roofline keys. On another chip
# these are conservative labels, not measurement inputs.
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BYTES_PER_S = 819e9


def _time_fn(fn, *args, n_iters=100, reps=3):
    """Steady-state seconds per call (N>=100: relay timings with N<=50
    iterations are unreliable). Blocks on the last in-order output.

    Runs ``reps`` timing blocks and returns the MEDIAN block plus the
    relative spread (max-min)/median — single relay runs spread ~±15 %
    hour-to-hour (BASELINE.md round-3 protocol note), so every headline
    key carries its own spread for round-over-round adjudication.
    """
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = fn(*args)
        jax.block_until_ready(out)
        walls.append((time.perf_counter() - t0) / n_iters)
    med = sorted(walls)[len(walls) // 2]
    spread = (max(walls) - min(walls)) / med if med else 0.0
    return med, spread, out


def _headline(results):
    import jax
    import jax.numpy as jnp

    from ddsp_piano_tpu.configs import get_model

    duration = 4.0
    sample_rate = 24000
    model = get_model('maestro_v2', duration=duration, inference=True)
    params = model.init(jax.random.PRNGKey(0))
    feats = {k: jnp.asarray(v) for k, v in build_inputs(duration).items()}

    @jax.jit
    def forward(params, feats):
        return model(params, feats, rng=jax.random.PRNGKey(0))['audio_synth']

    wall, spread, audio = _time_fn(forward, params, feats)
    assert audio.shape == (1, int(duration * sample_rate))
    assert bool(jnp.isfinite(audio).all())
    results['value'] = round(duration / wall, 2)
    results['vs_baseline'] = round(duration / wall / 200.0, 4)
    results['forward_ms'] = round(wall * 1e3, 3)
    results['forward_ms_spread_pct'] = round(spread * 100, 1)

    # Roofline from the compiled executable's own cost model.
    try:
        cost = forward.lower(params, feats).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get('flops', 0.0))
        hbm_bytes = float(cost.get('bytes accessed', 0.0))
    except Exception:
        flops = hbm_bytes = 0.0
    results['flops'] = flops
    results['mfu_pct'] = round(100 * flops / wall / PEAK_BF16_FLOPS, 2)
    results['hbm_util_pct'] = round(
        100 * hbm_bytes / wall / PEAK_HBM_BYTES_PER_S, 2)

    # Aggregate serving throughput: batch-8 forward on one chip.
    feats8 = {k: jnp.asarray(v)
              for k, v in build_inputs(duration, batch=8).items()}
    wall8, _, _ = _time_fn(forward, params, feats8)
    results['aggregate_b8'] = round(8 * duration / wall8, 2)
    return model, params, feats, duration


def _stage_breakdown(results, model, params, feats):
    """Attribute the forward to control path / oscillator / noise / reverb
    (independently-jitted stages over materialized intermediates)."""
    import jax
    import jax.numpy as jnp

    pg = model.processor_group
    batch = feats['conditioning'].shape[0]

    def control_path(p, f):
        f = dict(f)
        f = model.compute_global_features(p, f, False)
        f = model.parallelizer.parallelize(f)
        f = model.compute_monophonic_features(p, f, False)
        return model.parallelizer.unparallelize(f, batch)

    ctrl_keys = list(pg.additive_controls) + list(pg.noise_controls) \
        + list(pg.reverb_controls)
    def _ctrl(p, f):
        out = control_path(p, f)  # trace once, select after
        return {k: out[k] for k in ctrl_keys}

    ctrl_fn = jax.jit(_ctrl)
    wall_ctrl, _, ctrl_feats = _time_fn(ctrl_fn, params, feats)
    results['stage_ctrl_ms'] = round(wall_ctrl * 1e3, 3)

    rng = jax.random.PRNGKey(0)
    pg_params = params.get('processor_group', {})

    def fold(x):
        return x.reshape((-1,) + x.shape[2:])

    def osc_only(cf):
        args = [fold(cf[c]) for c in pg.additive_controls]
        p = pg_params.get(pg.additive.name, {})
        c = pg.additive.get_controls(p, *args)
        return pg.additive.get_signal(p, rng=rng, **c)

    def noise_only(cf):
        args = [fold(cf[c]) for c in pg.noise_controls]
        p = pg_params.get(pg.noise.name, {})
        c = pg.noise.get_controls(p, *args)
        return pg.noise.get_signal(p, rng=rng, **c)

    wall_osc, _, sig_add = _time_fn(jax.jit(osc_only), ctrl_feats)
    results['stage_osc_ms'] = round(wall_osc * 1e3, 3)
    wall_noise, _, sig_noise = _time_fn(jax.jit(noise_only), ctrl_feats)
    results['stage_noise_ms'] = round(wall_noise * 1e3, 3)

    if pg.reverb is not None:
        n = model.n_synths
        mix = (sig_add + sig_noise).reshape(
            n, batch, sig_add.shape[-1]).sum(axis=0)
        mix = jax.device_put(mix)

        def reverb_only(cf, mix):
            p = pg_params.get(pg.reverb.name, {})
            args = [mix] + [cf[c] for c in pg.reverb_controls]
            c = pg.reverb.get_controls(p, *args)
            return pg.reverb.get_signal(p, rng=rng, **c)

        wall_rev, _, _ = _time_fn(jax.jit(reverb_only), ctrl_feats, mix)
        results['stage_reverb_ms'] = round(wall_rev * 1e3, 3)

    def synth_only(cf):
        return pg(pg_params, dict(feats, **{
            k: v for k, v in cf.items()}), rng=rng)['signal']

    wall_synth, _, _ = _time_fn(jax.jit(synth_only), ctrl_feats)
    results['stage_synth_ms'] = round(wall_synth * 1e3, 3)

    # Additive view (VERDICT r3 item 8): cumulative-PREFIX programs of the
    # real fused forward — ctrl; ctrl+osc; ctrl+osc+noise; full. Each
    # prefix returns every later-consumed intermediate so XLA cannot
    # dead-code-eliminate earlier stages, and the last prefix IS the
    # headline program; successive differences therefore attribute the
    # fused forward additively (they telescope to the full time), unlike
    # the stage_*_ms keys above, which re-jit each stage separately and
    # over-count by lost fusion + dispatch.
    def prefix_ctrl(p, f):
        out = control_path(p, f)
        return {k: out[k] for k in ctrl_keys}

    def prefix_osc(p, f):
        cf = prefix_ctrl(p, f)
        args = [fold(cf[c]) for c in pg.additive_controls]
        ap = pg_params.get(pg.additive.name, {})
        c = pg.additive.get_controls(ap, *args)
        sig = pg.additive.get_signal(
            ap, rng=jax.random.fold_in(rng, 0), **c)
        return sig, {k: cf[k] for k in list(pg.noise_controls)
                     + list(pg.reverb_controls)}

    def prefix_noise(p, f):
        sig_add, rest = prefix_osc(p, f)
        args = [fold(rest[c]) for c in pg.noise_controls]
        np_ = pg_params.get(pg.noise.name, {})
        c = pg.noise.get_controls(np_, *args)
        sig_noise = pg.noise.get_signal(
            np_, rng=jax.random.fold_in(rng, 1), **c)
        n = model.n_synths
        mix = (sig_add + sig_noise).reshape(
            n, batch, sig_add.shape[-1]).sum(axis=0)
        return mix, {k: rest[k] for k in pg.reverb_controls}

    def prefix_full(p, f):
        mix, rest = prefix_noise(p, f)
        if pg.reverb is None:
            return mix
        rp = pg_params.get(pg.reverb.name, {})
        args = [mix] + [rest[c] for c in pg.reverb_controls]
        c = pg.reverb.get_controls(rp, *args)
        return pg.reverb.get_signal(rp, rng=jax.random.fold_in(rng, 2), **c)

    walls = {}
    for name, fn in [('ctrl', prefix_ctrl), ('osc', prefix_osc),
                     ('noise', prefix_noise), ('full', prefix_full)]:
        walls[name], _, _ = _time_fn(jax.jit(fn), params, feats)
    results['stage_inc_ctrl_ms'] = round(walls['ctrl'] * 1e3, 3)
    results['stage_inc_osc_ms'] = round(
        (walls['osc'] - walls['ctrl']) * 1e3, 3)
    results['stage_inc_noise_ms'] = round(
        (walls['noise'] - walls['osc']) * 1e3, 3)
    results['stage_inc_reverb_ms'] = round(
        (walls['full'] - walls['noise']) * 1e3, 3)
    results['stage_inc_total_ms'] = round(walls['full'] * 1e3, 3)


def _train_step(results):
    """dafx22 recipe-shape training step (BASELINE.md row: 53 ms r2).

    Emits the median-of-3 30-step blocks plus spread, and a train_stage_*
    attribution (VERDICT r3 item 2): forward / backward / optimizer+host
    from nested jitted subprograms (loss-only, value_and_grad, full step),
    plus the multi-scale-loss cost in isolation. Same caveat as the
    inference stage_* keys: each stage is a separately-jitted program, so
    stages rank cost centers but are not exactly additive.
    """
    import jax
    import jax.numpy as jnp

    from ddsp_piano_tpu.configs import get_model
    from ddsp_piano_tpu.data.pipeline import get_dummy_data
    from ddsp_piano_tpu.training.trainer import Trainer

    model = get_model('dafx22', duration=3.0)
    trainer = Trainer(model, learning_rate=1e-3, first_phase=True)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = get_dummy_data(batch_size=6, duration=3.0, sample_rate=16000)
    # Quantize the dummy batch to production provenance: audio to 16-bit
    # PCM values (the wav decode emits int16/32768), conditioning to
    # [integer pitch, velocity/127], pedal to 0/1. Same shapes/programs;
    # lets the packed staging keys measure the 16-bit wire lanes real
    # MAESTRO batches get (tests/test_trainer.py pins that contract).
    batch = dict(batch)
    batch['audio'] = (np.round(np.asarray(batch['audio']) * 32768.0)
                      .clip(-32768, 32767).astype(np.float32)
                      / np.float32(32768.0))
    cond = np.asarray(batch['conditioning'])
    batch['conditioning'] = np.stack(
        [np.round(cond[..., 0] * 87 + 21).astype(np.float32),
         np.round(cond[..., 1] * 127).astype(np.float32)
         / np.float32(127.0)], axis=-1)
    batch['pedal'] = np.round(np.asarray(batch['pedal'])).astype(np.float32)

    # Warm-up (compile); blocks of 30 steps, median + spread of 3 blocks.
    # train_step_ms re-stages the numpy batch every step (the historical
    # r1-r3 protocol — includes ~8 ms of serialized relay staging that the
    # train CLI overlaps away via device_prefetch);
    # train_step_onchip_ms loops on a pre-staged device batch (the A/B
    # harness protocol, benchmarks/_ab_common.py) and is the number kernel
    # work moves.
    state, _ = trainer.train_step(state, batch)
    jax.block_until_ready(state.params)
    n = 30

    def steps_ms(b):
        nonlocal state
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                state, _ = trainer.train_step(state, b)
            jax.block_until_ready(state.params)
            walls.append((time.perf_counter() - t0) / n * 1e3)
        med = sorted(walls)[1]
        return med, 100 * (max(walls) - min(walls)) / med

    med, spread = steps_ms(batch)
    results['train_step_ms'] = round(med, 2)
    results['train_step_ms_spread_pct'] = round(spread, 1)
    dbatch = trainer.distribute_batch(batch)
    med_chip, spread_chip = steps_ms(dbatch)
    results['train_step_onchip_ms'] = round(med_chip, 2)
    results['train_step_onchip_ms_spread_pct'] = round(spread_chip, 1)

    # The REAL CLI protocol (VERDICT r4 item 1a): device_prefetch overlaps
    # host->device staging with the in-flight step; deque NaN guard drains
    # every 16 steps. Host batches cycle (distinct arrays, like tf.data),
    # so each step pays a genuine staging that must hide behind compute.
    # packed=True is the CLI default (--staging packed): the whole batch
    # ships as ONE device_put instead of one per key — through the relay
    # the per-put fixed cost dominates (dict 49.5 ms vs packed 14.3 ms for
    # the same 1.8 MB, benchmarks/profile_relay_staging.py).
    def cli_ms(packed):
        import itertools
        walls = []
        host_batches = [
            {k: (np.array(v) if np.issubdtype(np.asarray(v).dtype,
                                              np.floating) else v)
             for k, v in batch.items()} for _ in range(4)]
        for _ in range(3):
            it = trainer.device_prefetch(
                itertools.islice(itertools.cycle(host_batches), n + 1),
                packed=packed)
            first = next(it)   # staged outside the timed window (warm)
            s = None
            t0 = time.perf_counter()
            for db in it:
                s, _ = trainer.train_step(trainer_state[0], db)
                trainer_state[0] = s
            jax.block_until_ready(s.params)
            walls.append((time.perf_counter() - t0) / n * 1e3)
        med = sorted(walls)[1]
        return med, 100 * (max(walls) - min(walls)) / med

    trainer_state = [state]
    med_cli, spread_cli = cli_ms(packed=True)
    results['train_cli_ms'] = round(med_cli, 2)
    results['train_cli_ms_spread_pct'] = round(spread_cli, 1)
    med_cli_d, spread_cli_d = cli_ms(packed=False)
    results['train_cli_dict_ms'] = round(med_cli_d, 2)
    results['train_cli_dict_ms_spread_pct'] = round(spread_cli_d, 1)
    state = trainer_state[0]

    # K-step scan dispatch (VERDICT r4 item 1b): one jitted lax.scan
    # program runs K steps per host round-trip, amortizing the relay
    # dispatch floor AND the staging serialization. Timed end-to-end with
    # packed K-block staging overlapped via block_prefetch (the CLI's
    # --steps_per_dispatch path at its --staging packed default).
    import itertools
    k_scan = 10
    host_blocks = [batch] * k_scan
    state_scan, _ = trainer.train_steps(
        state, trainer.pack_block(host_blocks))  # compile
    jax.block_until_ready(state_scan.params)
    walls = []
    for _ in range(3):
        s = state_scan
        it = trainer.block_prefetch(
            itertools.islice(itertools.cycle([batch]), 4 * k_scan),
            k=k_scan, packed=True)
        next(it)  # first block staged outside the timed window (warm)
        t0 = time.perf_counter()
        for blk in it:
            s, _ = trainer.train_steps(s, blk)
        jax.block_until_ready(s.params)
        walls.append((time.perf_counter() - t0) / (3 * k_scan) * 1e3)
    med_scan = sorted(walls)[1]
    results['train_scan10_ms'] = round(med_scan, 2)
    results['train_scan10_ms_spread_pct'] = round(
        100 * (max(walls) - min(walls)) / med_scan, 1)

    # Batch-scaling curve (VERDICT r4 item 6): samples/s at the recipe
    # batch and 2x/4x, on-chip protocol (pre-staged batches).
    for b_size in (6, 12, 24):
        try:
            bb = get_dummy_data(batch_size=b_size, duration=3.0,
                                sample_rate=16000)
            dbb = trainer.distribute_batch(bb)
            st = trainer.init_state(jax.random.PRNGKey(1))
            st, _ = trainer.train_step(st, dbb)
            jax.block_until_ready(st.params)
            bw = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(10):
                    st, _ = trainer.train_step(st, dbb)
                jax.block_until_ready(st.params)
                bw.append((time.perf_counter() - t0) / 10)
            wall_b = sorted(bw)[1]
            results[f'train_samples_per_s_b{b_size}'] = round(
                b_size / wall_b, 1)
        except Exception as e:
            results[f'train_samples_per_s_b{b_size}_error'] = (
                f'{type(e).__name__}: {e}'[:120])
            break

    # -- stage attribution over the same step -----------------------------
    rng = jax.random.PRNGKey(17)

    def loss_fn(p):
        outs = model(p, dbatch, training=True, rng=rng)
        return outs['losses']['total_loss']

    wall_fwd, _, _ = _time_fn(jax.jit(loss_fn), state.params)
    results['train_stage_fwd_ms'] = round(wall_fwd * 1e3, 2)
    wall_vg, _, grads = _time_fn(jax.jit(jax.grad(loss_fn)), state.params)
    results['train_stage_bwd_ms'] = round((wall_vg - wall_fwd) * 1e3, 2)

    # Optimizer cost measured DIRECTLY (VERDICT r4 item 7): a jitted
    # opt-update-only program, like profile_train_bwd's opt_only arm.
    import optax as _optax

    def opt_only(p, o, g):
        updates, o = trainer.optimizer.update(g, o, p)
        return _optax.apply_updates(p, updates), o

    wall_opt, _, _ = _time_fn(jax.jit(opt_only), state.params,
                              state.opt_state, grads)
    results['train_stage_opt_ms'] = round(wall_opt * 1e3, 2)
    # Residual of the telescoped stages vs the fused on-chip step: lost
    # cross-stage fusion + the ~0.35 ms/program relay dispatch floor each
    # separately-jitted stage pays. NOT a cost center — a bookkeeping
    # remainder (can go negative under relay spread).
    results['train_stage_residual_ms'] = round(
        med_chip - (wall_vg + wall_opt) * 1e3, 2)

    # Multi-scale spectral loss alone (fwd+bwd w.r.t. the synth audio).
    audio = jnp.asarray(batch['audio'])
    synth = jax.jit(lambda a: a + 0.01 * jax.random.normal(rng, a.shape))(
        audio)
    spectral = model.loss_objs[0]
    loss_vg = jax.jit(jax.value_and_grad(
        lambda s: spectral.compute({'audio': audio, 'audio_synth': s})))
    wall_loss, _, _ = _time_fn(loss_vg, synth)
    results['train_stage_loss_ms'] = round(wall_loss * 1e3, 2)


def _streaming(results, key, config, sample_rate):
    """180 s chunked-scan streaming render (4 s chunks, CLI default)."""
    import jax
    import jax.numpy as jnp

    from ddsp_piano_tpu.configs import get_model
    from ddsp_piano_tpu.models.streaming import StreamingSynthesizer

    duration = 180.0
    chunk_seconds = 4.0
    model = get_model(config, duration=chunk_seconds, inference=True)
    params = model.init(jax.random.PRNGKey(0))
    feats = {k: jnp.asarray(v) for k, v in build_inputs(duration).items()}
    synth = StreamingSynthesizer(
        model, chunk_frames=int(chunk_seconds * model.frame_rate))

    wall, spread, audio = _time_fn(
        lambda p, f: synth.synthesize_scanned(p, f), params, feats,
        n_iters=10)
    assert audio.shape[-1] == int(duration * sample_rate), audio.shape
    results[key] = round(duration / wall, 2)
    results[key + '_spread_pct'] = round(spread * 100, 1)


def _soak(results):
    """Bounded teacher-student convergence soak (VERDICT r4 item 3): a
    fresh dafx22 student trains 100 steps against renders of the released
    checkpoint. Emits the loss knee so a gradient-path regression (three
    custom AD routings are live) is driver-visible every round. Protocol =
    benchmarks/soak_teacher_student.py at 100 steps."""
    import os

    import jax
    import jax.numpy as jnp

    ckpt = '/root/reference/ddsp_piano/model_weights/dafx22/ckpt-0'
    if not os.path.exists(ckpt + '.index'):
        results['soak_skipped'] = 'released checkpoint not mounted'
        return

    from ddsp_piano_tpu.configs import get_model
    from ddsp_piano_tpu.training import checkpoints
    from ddsp_piano_tpu.training.trainer import Trainer

    steps, batch_size, duration = 100, 4, 3.0
    teacher = get_model('dafx22', duration=duration)
    t_params = teacher.init(jax.random.PRNGKey(0))
    t_params, _ = checkpoints.import_tf_weights(teacher, t_params, ckpt)
    render = jax.jit(lambda p, f: teacher(
        p, f, rng=jax.random.PRNGKey(7))['audio_synth'])

    rng = np.random.RandomState(0)
    n_frames = int(duration * 250)
    batches = []
    for i in range(4):
        cond = np.zeros((batch_size, n_frames, 16, 2), np.float32)
        for b in range(batch_size):
            for v in range(16):
                if rng.rand() < 0.3:
                    continue
                pitch = float(rng.randint(30, 90))
                start = rng.randint(0, n_frames - 60)
                length = rng.randint(40, n_frames - start)
                cond[b, start:start + length, v, 0] = pitch
                cond[b, start:start + rng.randint(4, 20), v, 1] = (
                    0.3 + 0.6 * rng.rand())
        feats = {'conditioning': cond,
                 'pedal': np.zeros((batch_size, n_frames, 4), np.float32),
                 'piano_model': rng.randint(0, 10, (batch_size, 1)
                                            ).astype(np.int32)}
        audio = render(t_params, {k: jnp.asarray(v)
                                  for k, v in feats.items()})
        batches.append(dict(feats, audio=np.asarray(audio)))

    student = get_model('dafx22', duration=duration, first_phase=True)
    trainer = Trainer(student, learning_rate=1e-3, first_phase=True)
    state = trainer.init_state(jax.random.PRNGKey(123))
    first = last = None
    for step in range(steps):
        state, losses = trainer.train_step(state, batches[step % 4])
        if step == 0:
            trainer.check_pending()
            first = float(losses['total_loss'])
    trainer.check_pending()
    last = float(losses['total_loss'])
    results['soak_loss_step1'] = round(first, 2)
    results['soak_loss_step100'] = round(last, 2)
    results['soak_converged'] = bool(last < first / 3)


def _streaming_lowlat(results):
    """Low-latency LIVE streaming (VERDICT r4 item 8): per-chunk wall
    latency of the stateful chunk program dispatched chunk-by-chunk with a
    block on every chunk — the protocol of real-time use, where each chunk
    must be emitted before the next arrives. This pays the full relay
    round-trip per chunk (unlike the scanned engine, which amortizes it
    over the whole file); the deliverable is a chunk-size -> latency
    guidance table. maestro_v2 has no whole-sequence Normalize layers, so
    its chunk protocol is exactly live-capable."""
    import jax
    import jax.numpy as jnp

    from ddsp_piano_tpu.configs import get_model
    from ddsp_piano_tpu.models.streaming import StreamingSynthesizer

    duration = 8.0
    for chunk_s, tag in ((1.0, '1s'), (0.5, '500ms'), (0.25, '250ms')):
        model = get_model('maestro_v2', duration=chunk_s, inference=True)
        params = model.init(jax.random.PRNGKey(0))
        # Host-side conditioning, sliced in numpy per chunk — the live
        # scenario (MIDI arrives on the host) and avoids eager device ops
        # through the relay.
        np_feats = build_inputs(duration)
        jfeats = {k: jnp.asarray(v) for k, v in np_feats.items()}
        synth = StreamingSynthesizer(
            model, chunk_frames=int(chunk_s * model.frame_rate))
        C = synth.chunk_frames
        static = synth._static_features(params, jfeats)
        rng = jax.random.PRNGKey(0)
        n_chunks = np_feats['conditioning'].shape[1] // C

        def chunk(i, state):
            cf = {'conditioning':
                  np_feats['conditioning'][:, i * C:(i + 1) * C],
                  'pedal': np_feats['pedal'][:, i * C:(i + 1) * C],
                  'piano_model': np_feats['piano_model'], **static}
            return synth._chunk_fn(params, cf, state,
                                   jax.random.fold_in(rng, i))

        # Warm (compile + state shape) then time the live loop: block on
        # EVERY chunk's audio, as a live consumer must.
        state = {}
        (audio, _), state = chunk(0, state)
        jax.block_until_ready(audio)
        warm_state = state
        walls = []
        for _ in range(3):
            state = warm_state
            lat = []
            for i in range(1, n_chunks):
                t0 = time.perf_counter()
                (audio, _), state = chunk(i, state)
                jax.block_until_ready(audio)
                lat.append(time.perf_counter() - t0)
            walls.append(float(np.median(lat)))
        med = sorted(walls)[1]
        results[f'stream_live_{tag}_ms'] = round(med * 1e3, 3)
        results[f'stream_live_{tag}_x'] = round(chunk_s / med, 1)


def _eval_segment(results):
    """Device time per 10 s dafx22 eval segment at b=8 (the
    evaluate_model.py vmapped per-segment-rng protocol; r2: 32.7 ms)."""
    import jax
    import jax.numpy as jnp

    from ddsp_piano_tpu.configs import get_model
    from ddsp_piano_tpu.data.pipeline import get_dummy_data

    from ddsp_piano_tpu.training.evaluation import build_segment_eval_fn

    b = 8
    model = get_model('dafx22', duration=10.0, inference=True)
    params = model.init(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in get_dummy_data(
        batch_size=b, duration=10.0, sample_rate=16000).items()}
    seg_indices = jnp.arange(b)

    # The exact program evaluate_model.py runs (shared definition).
    wall, _, _ = _time_fn(jax.jit(build_segment_eval_fn(model)),
                          params, batch, seg_indices)
    results['eval_segment_ms'] = round(wall / b * 1e3, 2)


def main():
    from ddsp_piano_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()

    results = {'metric': 'realtime_factor', 'value': 0.0,
               'unit': 'audio_s_per_wall_s', 'vs_baseline': 0.0}
    model, params, feats, _ = _headline(results)

    for name, fn, args in [
            ('stage', _stage_breakdown, (model, params, feats)),
            ('train_step', _train_step, ()),
            ('streaming', _streaming,
             ('streaming_x', 'maestro_v2', 24000)),
            ('streaming_dafx22', _streaming,
             ('streaming_dafx22_x', 'dafx22', 16000)),
            ('eval_segment', _eval_segment, ()),
            ('stream_lowlat', _streaming_lowlat, ()),
            ('soak', _soak, ()),
    ]:
        try:
            fn(results, *args)
        except Exception as e:  # fault-isolate: keep the headline line
            results[f'{name}_error'] = f'{type(e).__name__}: {e}'[:200]

    print(json.dumps(results))


if __name__ == '__main__':
    main()
