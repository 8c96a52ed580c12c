"""Interleaved A/B: dafx22 train step with the loss STFT as rfft vs
windowed-DFT matmuls (DDSP_PIANO_TPU_STFT=fft vs mm), the mm arm at both
f32 (HIGHEST) and bf16x3 (HIGH, DDSP_PIANO_TPU_STFT_PREC=high) matmul
precision.

The multi-scale spectral loss computes six STFT sizes (2048..64) of both
the target and the synthesized audio, forward and backward; XLA's TPU FFT
lowers to a slow generic radix path, so the mm rewrite rides the MXU
instead (ops/spectral.py _compute_mag_mm). Env flags are read at TRACE
time: each arm's step is traced under its own env before the timing loop,
then the arms are interleaved (CLAUDE.md measurement protocol).

Also prints the one-shot loss values of both arms on the same batch so
the ~1e-7 relative parity is re-checked on TPU numerics.
"""
import os
import time

from ddsp_piano_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

import jax

from ddsp_piano_tpu.configs import get_model
from ddsp_piano_tpu.data.pipeline import get_dummy_data
from ddsp_piano_tpu.parallel import mesh as mesh_lib
from ddsp_piano_tpu.training.trainer import Trainer

N = 30


def build(stft: str, prec: str = 'highest'):
    os.environ['DDSP_PIANO_TPU_STFT'] = stft
    os.environ['DDSP_PIANO_TPU_STFT_PREC'] = prec
    model = get_model('dafx22', duration=3.0)
    trainer = Trainer(model, mesh=mesh_lib.get_mesh_for_batch(1))
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = get_dummy_data(batch_size=6, duration=3.0, sample_rate=16000)
    batch = trainer.distribute_batch(batch)
    state, losses = trainer.train_step(state, batch)   # trace+compile NOW
    jax.block_until_ready(state.tree()['params'])
    print(f'{stft}/{prec}: first-step loss '
          f'{float(losses["total_loss"]):.6f}', flush=True)
    return trainer, state, batch


def run(trainer, state, batch):
    t0 = time.perf_counter()
    for _ in range(N):
        state, _ = trainer.train_step(state, batch)
    jax.block_until_ready(state.tree()['params'])
    return (time.perf_counter() - t0) / N * 1e3, state


def main():
    arms = {name: build(*spec) for name, spec in (
        ('fft', ('fft',)),
        ('mm', ('mm', 'highest')),
        ('mm_high', ('mm', 'high')),
    )}
    best = {name: 1e9 for name in arms}
    for rep in range(6):
        for name, (trainer, state, batch) in arms.items():
            ms, state = run(trainer, state, batch)
            arms[name] = (trainer, state, batch)
            best[name] = min(best[name], ms)
            print(f'rep {rep} {name}: {ms:.2f} ms/step', flush=True)
    print({k: round(v, 2) for k, v in best.items()}, flush=True)


if __name__ == '__main__':
    main()
