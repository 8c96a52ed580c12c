#!/usr/bin/env python
"""Benchmark: synthesis realtime factor per chip (the headline metric).

Protocol: flagship maestro-v2 inference model, 16-voice polyphony at
24 kHz, batch 1, realistic chordal conditioning; steady-state wall time per
jitted forward (post-compile, block_until_ready). Prints ONE JSON line:
{"metric": "realtime_factor", "value": N, "unit": "audio_s_per_wall_s",
 "vs_baseline": N / 200}  -- 200x is the BASELINE.md north-star target --
plus informational keys on the same line: "aggregate_b8" (per-chip
audio-seconds/wall-second with a batch-8 forward, the serving-throughput
number) and a roofline block from XLA's compiled cost analysis ("flops",
"mfu_pct" vs the chip's bf16 peak, "hbm_util_pct" vs peak HBM bandwidth —
this model is VPU/HBM-bound, not MXU-bound, so low MFU with high HBM
utilization is the expected signature).
"""

import json
import time

import numpy as np


def build_inputs(duration, n_synths=16, frame_rate=250):
    """Chordal conditioning exercising all voices."""
    rng = np.random.RandomState(0)
    n_frames = int(duration * frame_rate)
    cond = np.zeros((1, n_frames, n_synths, 2), np.float32)
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
    pedal = np.zeros((1, n_frames, 4), np.float32)
    piano_model = np.asarray([[5]], np.int32)
    return {'conditioning': cond, 'pedal': pedal,
            'piano_model': piano_model}


# TPU v5e (lite) public peaks, for the roofline keys. On another chip
# these are conservative labels, not measurement inputs.
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BYTES_PER_S = 819e9


def _time_forward(forward, params, feats, n_iters=100):
    """Steady-state seconds per forward (N>=100: relay timings with
    N<=50 iterations are unreliable)."""
    audio = forward(params, feats)
    audio.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n_iters):
        audio = forward(params, feats)
    audio.block_until_ready()
    return (time.perf_counter() - t0) / n_iters, audio


def main():
    import jax

    from ddsp_piano_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
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

    wall, audio = _time_forward(forward, params, feats)
    assert audio.shape == (1, int(duration * sample_rate))
    assert bool(jnp.isfinite(audio).all())
    value = duration / wall

    # Roofline from the compiled executable's own cost model.
    try:
        cost = forward.lower(params, feats).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get('flops', 0.0))
        hbm_bytes = float(cost.get('bytes accessed', 0.0))
    except Exception:
        flops = hbm_bytes = 0.0

    # Aggregate serving throughput: batch-8 forward on one chip.
    feats8 = {k: jnp.asarray(np.repeat(v, 8, axis=0))
              for k, v in build_inputs(duration).items()}
    wall8, _ = _time_forward(forward, params, feats8)
    aggregate_b8 = 8 * duration / wall8

    print(json.dumps({
        'metric': 'realtime_factor',
        'value': round(value, 2),
        'unit': 'audio_s_per_wall_s',
        'vs_baseline': round(value / 200.0, 4),
        'aggregate_b8': round(aggregate_b8, 2),
        'flops': flops,
        'mfu_pct': round(100 * flops / wall / PEAK_BF16_FLOPS, 2),
        'hbm_util_pct': round(
            100 * hbm_bytes / wall / PEAK_HBM_BYTES_PER_S, 2),
    }))


if __name__ == '__main__':
    main()
