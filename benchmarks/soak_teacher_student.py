"""Teacher-student convergence soak on the CURRENT kernel stack.

Re-validates end-to-end learning (VERDICT r3 item 5): a fresh dafx22
student trains against renders of the released dafx22 checkpoint
(the teacher), phase-1 recipe, 300 steps. The gradient path exercises the
Pallas backward oscillator kernel + polynomial trig + the custom_jvp ctrl
routing — everything that changed since the last convergence demonstration
(round-2 record: 38.4 -> 6.98 in 300 steps, BASELINE.md).

Usage: python benchmarks/soak_teacher_student.py [steps] [batch]
Prints one JSON line with the loss trajectory.
"""
import json
import sys
import time

from _ab_common import jax  # noqa: F401  (path + compilation cache)

import jax.numpy as jnp
import numpy as np

from ddsp_piano_tpu.configs import get_model
from ddsp_piano_tpu.training.trainer import Trainer

DAFX22_CKPT = ('/root/reference/ddsp_piano/model_weights/dafx22/ckpt-0')


def chordal_inputs(seed, batch, duration=3.0, n_synths=16, frame_rate=250):
    """Random chordal scenes (realistic pitch/onset structure, unlike
    get_dummy_data's uniform noise conditioning)."""
    rng = np.random.RandomState(seed)
    n_frames = int(duration * frame_rate)
    cond = np.zeros((batch, n_frames, n_synths, 2), np.float32)
    for b in range(batch):
        for v in range(n_synths):
            if rng.rand() < 0.3:
                continue
            pitch = float(rng.randint(30, 90))
            start = rng.randint(0, n_frames - 60)
            length = rng.randint(40, n_frames - start)
            cond[b, start:start + length, v, 0] = pitch
            cond[b, start:start + rng.randint(4, 20), v, 1] = (
                0.3 + 0.6 * rng.rand())
    pedal = np.zeros((batch, n_frames, 4), np.float32)
    if rng.rand() < 0.5:
        pedal[:, n_frames // 3:2 * n_frames // 3, 0] = 1.0
    piano_model = rng.randint(0, 10, (batch, 1)).astype(np.int32)
    return {'conditioning': cond, 'pedal': pedal,
            'piano_model': piano_model}


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    duration, sample_rate = 3.0, 16000
    n_scenes = 8

    teacher = get_model('dafx22', duration=duration)
    t_params = teacher.init(jax.random.PRNGKey(0))
    from ddsp_piano_tpu.training import checkpoints
    t_params, _ = checkpoints.import_tf_weights(teacher, t_params,
                                                DAFX22_CKPT)

    render = jax.jit(lambda p, f: teacher(
        p, f, rng=jax.random.PRNGKey(7))['audio_synth'])
    batches = []
    for i in range(n_scenes):
        feats = chordal_inputs(seed=100 + i, batch=batch_size,
                               duration=duration)
        audio = render(t_params, {k: jnp.asarray(v)
                                  for k, v in feats.items()})
        batches.append(dict(feats, audio=np.asarray(audio)))

    student = get_model('dafx22', duration=duration, first_phase=True)
    trainer = Trainer(student, learning_rate=1e-3, first_phase=True)
    state = trainer.init_state(jax.random.PRNGKey(123))

    trajectory = {}
    t0 = time.perf_counter()
    for step in range(steps):
        state, losses = trainer.train_step(state, batches[step % n_scenes])
        if step in (0, 24, 49, 99, 199, steps - 1):
            trainer.check_pending()
            trajectory[step + 1] = round(
                float(losses['total_loss']), 3)
    jax.block_until_ready(state.params)
    wall = time.perf_counter() - t0
    print(json.dumps({
        'metric': 'teacher_student_soak',
        'steps': steps, 'batch': batch_size,
        'loss_trajectory': trajectory,
        'ms_per_step': round(wall / steps * 1e3, 1),
        'converged': trajectory[steps] < trajectory[1] / 3,
    }))


if __name__ == '__main__':
    main()
