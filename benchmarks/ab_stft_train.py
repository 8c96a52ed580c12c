"""Interleaved A/B: dafx22 train step with the loss STFT as rfft vs
windowed-DFT matmuls (DDSP_PIANO_TPU_STFT=fft vs mm), the mm arm at both
f32 (HIGHEST) and bf16x3 (HIGH, DDSP_PIANO_TPU_STFT_PREC=high) matmul
precision.

The multi-scale spectral loss computes six STFT sizes (2048..64) of both
the target and the synthesized audio, forward and backward; XLA's TPU FFT
lowers to a slow generic radix path, so the mm rewrite rides the MXU
instead (ops/spectral.py _compute_mag_mm). Build/run protocol shared with
the other A/B scripts in benchmarks/_ab_common.py.

Also prints the one-shot loss values of all arms on the same batch so the
~1e-7 relative parity is re-checked on TPU numerics.
"""
from _ab_common import build_train_arm, time_steps


def main():
    arms = {}
    for name, env in (
            ('fft', {'DDSP_PIANO_TPU_STFT': 'fft'}),
            ('mm', {'DDSP_PIANO_TPU_STFT': 'mm',
                    'DDSP_PIANO_TPU_STFT_PREC': 'highest'}),
            ('mm_high', {'DDSP_PIANO_TPU_STFT': 'mm',
                         'DDSP_PIANO_TPU_STFT_PREC': 'high'}),
    ):
        trainer, state, batch, losses = build_train_arm(env)
        print(f'{name}: first-step loss '
              f'{float(losses["total_loss"]):.6f}', flush=True)
        arms[name] = (trainer, state, batch)

    best = {name: 1e9 for name in arms}
    for rep in range(6):
        for name, (trainer, state, batch) in arms.items():
            ms, state = time_steps(trainer, state, batch)
            arms[name] = (trainer, state, batch)
            best[name] = min(best[name], ms)
            print(f'rep {rep} {name}: {ms:.2f} ms/step', flush=True)
    print({k: round(v, 2) for k, v in best.items()}, flush=True)


if __name__ == '__main__':
    main()
