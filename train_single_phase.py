#!/usr/bin/env python
"""Train a DDSP-Piano TPU model (single training phase).

Argument-compatible with the reference trainer CLI
(/root/reference/train_single_phase.py): epochs x steps of mesh-parallel
gradient descent with phase-dependent trainability, NaN guard, TensorBoard
scalars/audio/spectrograms, and best/last/crashed/stopped checkpoints under
<exp_dir>/phase_<N>/.
"""

import argparse
import logging
import os

osjoin = os.path.join
logging.basicConfig(level=logging.INFO, format='%(message)s')


def process_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--batch_size', '-b', type=int, default=6,
                        help="Number of elements per batch. "
                             "(default: %(default)s)")
    parser.add_argument('--steps_per_epoch', '-s', type=int, default=5000,
                        help="Number of steps of gradient descent per epoch. "
                             "(default: %(default)s)")
    parser.add_argument('--steps_per_dispatch', '-k', type=int, default=1,
                        help="Optimization steps per device dispatch: K>1 "
                             "runs K steps as one jitted lax.scan program "
                             "(Trainer.train_steps), amortizing the host "
                             "round-trip and per-step staging over K — "
                             "worthwhile on relayed/remote chips where the "
                             "per-program dispatch floor is milliseconds. "
                             "The NaN guard's crashed_iter granularity "
                             "coarsens to K steps. steps_per_epoch should "
                             "be divisible by K. (default: %(default)s)")
    parser.add_argument('--staging', choices=('packed', 'packed32', 'dict'),
                        default='packed',
                        help="How batches are staged host->device. "
                             "'packed' (default) ships each batch as ONE "
                             "contiguous 16-bit-wire array and unpacks "
                             "inside the jitted step — bit-identical to "
                             "'dict' by construction (keys that don't "
                             "round-trip the 16-bit lanes use exact "
                             "f32-split lanes), but one transfer instead "
                             "of one per feature and ~half the wire "
                             "bytes, which matters on relayed/remote "
                             "chips. 'packed32' forces f32-split lanes "
                             "for every key.")
    parser.add_argument('--epochs', '-e', type=int, default=128,
                        help="Number of epochs. (default: %(default)s)")
    parser.add_argument('--lr', type=float, default=0.001,
                        help="Learning rate. (default: %(default)s)")
    parser.add_argument('--config', '-c', default='maestro_v2',
                        help="Model config name or .gin path.")
    parser.add_argument('--phase', '-p', type=int, default=1,
                        help="Training phase strategy to apply. Even phases "
                             "fine-tune only the detuner/inharmonicity "
                             "sub-modules. (default: %(default)s)")
    parser.add_argument('--restore', '-r', type=str, default=None,
                        help="Restore training state from a saved folder.")
    parser.add_argument('--auto_resume', action='store_true',
                        help="Resume from <exp_dir>/phase_<N>/last_iter if "
                             "a checkpoint exists there (preemption-safe "
                             "relaunch: the same command continues where "
                             "the interrupted run stopped). Takes "
                             "precedence over --restore once the phase has "
                             "its own checkpoint, so --restore only seeds "
                             "a fresh phase.")
    parser.add_argument('--val_path', type=str, default=None,
                        help="Path to the validation data (if different "
                             "from maestro_path).")
    parser.add_argument('--profile', type=int, default=0, metavar='N',
                        help="Capture a jax.profiler trace of N training "
                             "steps into <exp_dir>/profile (view with "
                             "TensorBoard's profile plugin), then continue "
                             "training normally.")
    parser.add_argument('--debug_nans', action='store_true',
                        help="Trap NaNs at the op level (slower; the "
                             "per-step loss guard is always on).")
    parser.add_argument('--n_devices', type=int, default=None,
                        help="Devices in the data-parallel mesh "
                             "(default: all).")
    parser.add_argument('--coordinator_address', type=str, default=None,
                        help="host:port of process 0 for a multi-host run "
                             "(jax.distributed; the reference reaches "
                             "multi-host via train_util.get_strategy). "
                             "Also read from $JAX_COORDINATOR_ADDRESS. "
                             "--batch_size is the GLOBAL batch; each host "
                             "loads batch_size/num_processes elements.")
    parser.add_argument('--num_processes', type=int, default=None,
                        help="Total number of hosts in the multi-host run "
                             "(default: auto-detected from the TPU "
                             "environment).")
    parser.add_argument('--process_id', type=int, default=None,
                        help="This host's index in [0, num_processes) "
                             "(default: auto-detected).")
    parser.add_argument('maestro_path', type=str,
                        help="Path to the MAESTRO dataset folder (or "
                             "preprocessed cache dir).")
    parser.add_argument('exp_dir', type=str,
                        help="Folder to store experiment results and logs.")
    return parser.parse_args(argv)


def main(args):
    import jax

    from ddsp_piano_tpu.parallel import mesh as mesh_lib

    # Multi-host wiring must come before any device use (SURVEY §2.9; the
    # reference's train_util.get_strategy reach). No-op without a
    # coordinator flag/env.
    mesh_lib.initialize_multihost(args.coordinator_address,
                                  args.num_processes, args.process_id)
    is_lead = jax.process_index() == 0

    from ddsp_piano_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    if args.debug_nans:
        from ddsp_piano_tpu.utils.jax_setup import enable_debug_nans
        enable_debug_nans()
    import numpy as np

    from ddsp_piano_tpu.configs import get_model
    from ddsp_piano_tpu.data import pipeline
    from ddsp_piano_tpu.training import summaries
    from ddsp_piano_tpu.training.trainer import NanLossError, Trainer

    first_phase = (args.phase % 2) == 1

    model = get_model(args.config, first_phase=first_phase)
    mesh = mesh_lib.get_mesh_for_batch(args.batch_size, args.n_devices)
    logging.info("Mesh: %d device(s) / %d host(s), data-parallel",
                 mesh.devices.size, jax.process_count())
    trainer = Trainer(model, learning_rate=args.lr,
                      first_phase=first_phase, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))

    val_path = args.maestro_path if args.val_path is None else args.val_path
    # --batch_size is the global batch; each host loads its share of
    # training segments (per-host pipelines with distinct shuffle seeds =
    # the reference's AutoShardPolicy.DATA). Validation is deterministic:
    # every host reads the same global batches and takes its local slice.
    local_bs = args.batch_size // jax.process_count()
    dataset_kwargs = dict(batch_size=args.batch_size,
                          max_polyphony=model.n_synths,
                          sample_rate=model.sample_rate)
    # Host-side prefetch (segmentation/collation threads) feeding a
    # device-side prefetch: batch N+1 is staged onto the chip while step N
    # computes, so the transfer never serializes with the step (measured
    # 126 -> 81 ms/step through the relayed chip, BASELINE.md round 3).
    host_iterator = pipeline.Prefetcher(
        pipeline.get_training_dataset(
            args.maestro_path, **{**dataset_kwargs,
                                  'batch_size': local_bs,
                                  'seed': jax.process_index()}))
    k_steps = max(1, args.steps_per_dispatch)
    packed = args.staging != 'dict'
    trainer.pack_wire = args.staging != 'packed32'
    if k_steps == 1:
        train_iterator = trainer.device_prefetch(host_iterator,
                                                 packed=packed)
    else:
        # K steps per dispatch: stacked K-batch blocks feed a jitted
        # lax.scan of K optimization steps (one host round-trip per K).
        train_iterator = trainer.block_prefetch(host_iterator, k_steps,
                                                packed=packed)
        if args.steps_per_epoch % k_steps:
            logging.warning(
                "steps_per_epoch=%d is not divisible by "
                "steps_per_dispatch=%d; running %d steps per epoch.",
                args.steps_per_epoch, k_steps,
                (args.steps_per_epoch // k_steps) * k_steps)

    exp_dir = osjoin(args.exp_dir, f'phase_{args.phase}')
    restore_from = args.restore
    resumed_this_phase = False
    if args.auto_resume:
        from ddsp_piano_tpu.training.checkpoints import latest_checkpoint
        if latest_checkpoint(osjoin(exp_dir, 'last_iter')) is not None:
            # The phase already has progress: resume it. An explicit
            # --restore only seeds a phase that has not started yet.
            restore_from = osjoin(exp_dir, 'last_iter')
            resumed_this_phase = True
    if restore_from is not None:
        state = trainer.restore(state, restore_from)
        logging.info("Restored model from %s at step %d", restore_from,
                     int(state.step))

    # Epoch accounting across preemptions: the phase's starting step and
    # best validation loss persist in the checkpoint meta, so a relaunch
    # runs only the REMAINING epochs — and a finished phase exits
    # immediately instead of overtraining (the 3-phase recipe re-runs
    # every phase's command after a relaunch).
    phase_start_step = int(state.step)
    lowest_val_loss = float('inf')
    start_epoch = 0
    if resumed_this_phase:
        from ddsp_piano_tpu.training.checkpoints import read_meta
        meta = read_meta(restore_from)
        phase_start_step = int(meta.get('phase_start_step',
                                        phase_start_step))
        lowest_val_loss = float(meta.get('lowest_val_loss',
                                         lowest_val_loss))
        start_epoch = max(
            0, (int(state.step) - phase_start_step) // args.steps_per_epoch)
        if start_epoch >= args.epochs:
            logging.info(
                "Phase %d already completed %d/%d epochs (step %d); "
                "nothing to do.", args.phase, start_epoch, args.epochs,
                int(state.step))
            return
    phase_meta = lambda: {'phase_start_step': int(phase_start_step),
                          'lowest_val_loss': float(lowest_val_loss)}
    for sub in ('logs', 'last_iter', 'best_iter'):
        os.makedirs(osjoin(exp_dir, sub), exist_ok=True)
    # Multi-host: every host computes identical replicated states/losses;
    # only process 0 writes events and checkpoints (shared-filesystem race
    # otherwise). All hosts still CALL train/validation_step in lockstep —
    # the steps carry cross-host collectives.
    writer = (summaries.SummaryWriter(osjoin(exp_dir, 'logs'))
              if is_lead else summaries.NullWriter())

    # One call = k_steps optimization steps (1 with the default).
    step_fn = trainer.train_step if k_steps == 1 else trainer.train_steps

    if args.profile > 0:
        # Tracing hook (SURVEY §5: the reference has none): capture the
        # steady-state step, so run one untraced step first to compile.
        from ddsp_piano_tpu.utils.jax_setup import profile_trace
        n_profile = -(-args.profile // k_steps)  # ceil, in dispatches
        state, _ = step_fn(state, next(train_iterator))
        if is_lead:
            with profile_trace(osjoin(exp_dir, 'profile')) as logdir:
                for _ in range(n_profile):
                    state, _ = step_fn(state, next(train_iterator))
            logging.info("Profiler trace (%d steps) written to %s",
                         n_profile * k_steps, logdir)
        else:
            for _ in range(n_profile):
                state, _ = step_fn(state, next(train_iterator))

    loss_keys = model.loss_keys()
    try:
        for epoch in range(start_epoch, args.epochs):
            step = int(state.step)  # step != epoch when resuming

            # ----------------- fit training data -----------------
            epoch_losses = {k: 0.0 for k in loss_keys}
            steps_done = (args.steps_per_epoch // k_steps) * k_steps
            for _ in range(args.steps_per_epoch // k_steps):
                state, losses = step_fn(state, next(train_iterator))
                for k in loss_keys:
                    # K>1 yields stacked (K,) device losses; the sum stays
                    # lazy on-device either way (no per-step host sync).
                    epoch_losses[k] += (losses[k] if k_steps == 1
                                        else losses[k].sum())

            logging.info("Epoch %d training loss: %.4f", epoch,
                         epoch_losses['total_loss'] / steps_done)
            writer.scalars('train_loss',
                           {k: v / steps_done
                            for k, v in epoch_losses.items()}, step)
            if is_lead:
                trainer.save(state, osjoin(exp_dir, 'last_iter'),
                             meta=phase_meta())
                logging.info("Last iteration model saved at %s",
                             osjoin(exp_dir, 'last_iter'))
            else:
                trainer.check_pending()  # same NaN-guard flush as save

            # ------------- skip validation early on -------------
            val_dataset = pipeline.get_validation_dataset(val_path,
                                                          **dataset_kwargs)
            if int(state.step) < 3 * args.steps_per_epoch:
                val_batch = next(iter(val_dataset), None)
                if val_batch is not None:
                    _, audio_synth = trainer.validation_step(
                        state, mesh_lib.slice_local_batch(val_batch))
                    writer.audio('synthesized_audio', audio_synth,
                                 model.sample_rate, int(state.step))
                continue

            # ------------- evaluate on validation data -------------
            epoch_val_losses = {k: 0.0 for k in loss_keys}
            val_outs_summary = None
            val_steps = 0
            for val_batch in val_dataset:
                val_losses, audio_synth = trainer.validation_step(
                    state, mesh_lib.slice_local_batch(val_batch))
                for k in loss_keys:
                    epoch_val_losses[k] += val_losses[k]
                if val_steps == 0:
                    val_outs_summary = (val_batch['audio'], audio_synth)
                val_steps += 1
            if val_steps == 0:
                continue

            logging.info("Validation loss: %.4f",
                         epoch_val_losses['total_loss'] / val_steps)
            writer.scalars('val_loss',
                           {k: v / val_steps
                            for k, v in epoch_val_losses.items()}, step)
            writer.audio('synthesized_audio', val_outs_summary[1],
                         model.sample_rate, step)
            writer.spectrogram_summary(val_outs_summary[0],
                                       val_outs_summary[1], step,
                                       sample_rate=model.sample_rate)
            for name, fig in summaries.tuning_curve_figures(
                    model, state.params).items():
                writer.figure(f'tuning/{name}', fig, step)

            if epoch_val_losses['audio_stft_loss'] < lowest_val_loss:
                lowest_val_loss = epoch_val_losses['audio_stft_loss']
                if is_lead:
                    trainer.save(state, osjoin(exp_dir, 'best_iter'),
                                 meta=phase_meta())
            writer.flush()

    except NanLossError as e:
        # e.state is the last finite state (the NaN guard is checked with
        # a one-step delay; the loop-local `state` may already hold the
        # post-NaN parameters).
        if is_lead:
            trainer.save(e.state if e.state is not None else state,
                         osjoin(exp_dir, 'crashed_iter'))
        logging.error("%s", e)
    except KeyboardInterrupt:
        if not is_lead:
            raise
        try:
            trainer.save(state, osjoin(exp_dir, 'stopped_iter'))
        except NanLossError as e:
            trainer.save(e.state, osjoin(exp_dir, 'crashed_iter'))
            logging.error("%s", e)


if __name__ == '__main__':
    main(process_args())
