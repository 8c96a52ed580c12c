"""Shared pieces for the multi-host smoke test.

Imported both by the in-process pytest (single-process reference run) and
by the spawned 2-process CPU workers (tests/multihost_worker.py), so the
two runs train the exact same toy problem.
"""

import numpy as np

GLOBAL_BATCH = 8
N_STEPS = 3
LEARNING_RATE = 0.05


class ToyModel:
    """Minimal PianoModel-protocol model for distribution tests.

    Exercises the full Trainer surface (init / trainable_mask / dict-I/O
    forward with a losses dict + audio_synth) without the compile cost of
    a real config — the subject under test is the multi-process batch
    assembly and the GSPMD gradient all-reduce, not the model.
    """

    sample_rate = 16000
    n_synths = 2

    def init(self, rng):
        import jax.numpy as jnp
        del rng
        return {'w': jnp.full((4,), 0.5, jnp.float32),
                'frozen': jnp.ones((3,), jnp.float32)}

    def trainable_mask(self, params, first_phase=None):
        del params, first_phase
        return {'w': True, 'frozen': False}

    def loss_keys(self):
        return ('total_loss', 'audio_stft_loss')

    def __call__(self, params, batch, training=False, rng=None):
        import jax.numpy as jnp
        del training, rng
        pred = batch['x'] @ params['w'] + jnp.sum(params['frozen']) * 0.0
        loss = jnp.mean((pred - batch['y']) ** 2)
        audio = pred[:, None] * jnp.ones((1, 8), jnp.float32)
        return {'losses': {'total_loss': loss, 'audio_stft_loss': loss},
                'audio_synth': audio}


def make_global_batch():
    """Deterministic global batch every process can reconstruct."""
    x = np.arange(GLOBAL_BATCH * 4, dtype=np.float32).reshape(
        GLOBAL_BATCH, 4) / 10.0
    y = np.sin(np.arange(GLOBAL_BATCH, dtype=np.float32))
    return {'x': x, 'y': y}


def train_toy(trainer_cls, mesh, local_batch):
    """N_STEPS of the shared toy problem; returns (state, last losses)."""
    import jax

    trainer = trainer_cls(ToyModel(), learning_rate=LEARNING_RATE,
                          mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    losses = None
    for _ in range(N_STEPS):
        state, losses = trainer.train_step(state, local_batch)
    trainer.check_pending()
    return trainer, state, losses
