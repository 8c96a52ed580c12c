"""Shared train-step A/B measurement harness.

One definition of the build/run protocol (CLAUDE.md: env flags are read
at TRACE time, so each arm's jitted step must be traced eagerly under its
own env before the timing loop; arms are then interleaved across reps in
ONE process — the only relay-noise-proof protocol). Used by
ab_stft_train.py and ab_train_ctrl.py; new A/B scripts should build on
this instead of copying the loop.
"""
import os
import sys
import time

# Runnable as `python benchmarks/ab_*.py` from anywhere: the package
# lives one directory above this file.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ddsp_piano_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

from ddsp_piano_tpu.configs import get_model  # noqa: E402
from ddsp_piano_tpu.data.pipeline import get_dummy_data  # noqa: E402
from ddsp_piano_tpu.parallel import mesh as mesh_lib  # noqa: E402
from ddsp_piano_tpu.training.trainer import Trainer  # noqa: E402


def build_train_arm(env: dict, config: str = 'dafx22', batch_size: int = 6,
                    duration: float = 3.0, sample_rate: int = 16000):
    """Trace + compile one train-step arm under its own env flags.

    Returns (trainer, state, staged batch, first-step losses); the first
    step runs eagerly here so the trace happens under `env`.
    """
    os.environ.update(env)
    model = get_model(config, duration=duration)
    trainer = Trainer(model, mesh=mesh_lib.get_mesh_for_batch(1))
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = get_dummy_data(batch_size=batch_size, duration=duration,
                           sample_rate=sample_rate)
    batch = trainer.distribute_batch(batch)
    state, losses = trainer.train_step(state, batch)   # trace+compile NOW
    jax.block_until_ready(state.tree()['params'])
    return trainer, state, batch, losses


def time_steps(trainer, state, batch, n: int = 30):
    """Steady-state ms/step over n dispatches, blocking once at the end."""
    t0 = time.perf_counter()
    for _ in range(n):
        state, _ = trainer.train_step(state, batch)
    jax.block_until_ready(state.tree()['params'])
    return (time.perf_counter() - t0) / n * 1e3, state
