"""The per-segment evaluation protocol, shared by the CLI and the bench.

One definition of the vmapped per-segment spectral-loss forward so
``evaluate_model.py`` (the sweep the CSVs come from) and ``bench.py``
(which times it as ``eval_segment_ms``) can never drift apart: a change
to the protocol here is both what the CLI runs and what the bench
measures. Mirrors the reference's evaluation semantics
(/root/reference/evaluate_model.py:32-46 — training=True forward,
per-segment multi-scale spectral loss).
"""

from __future__ import annotations

import jax


def build_segment_eval_fn(model, loss_name: str = 'audio_stft_loss'):
    """Build ``eval_fn(params, batch, seg_indices)`` for a model.

    The forward is vmapped so each segment consumes an rng key derived
    from its GLOBAL segment index: the training-mode noise realization —
    and thus the recorded loss — is then independent of how segments are
    packed into batches (b=1 and b=8 sweeps produce the same CSV).

    Returns a function mapping (params, batch dict of (b, ...) arrays,
    (b,) int segment indices) to ((b,) per-segment losses, (b, samples)
    synthesized audio). Jit it at the call site.
    """
    spec_loss = next(l for l in model.loss_objs if l.name == loss_name)

    def eval_fn(p, batch, seg_indices):
        def single(elem, seg_idx):
            elem = jax.tree.map(lambda v: v[None], elem)
            rng = jax.random.fold_in(jax.random.PRNGKey(0), seg_idx)
            outs = model(p, elem, training=True, rng=rng)
            synth = outs[spec_loss.output_key]
            if spec_loss.extract_signal:
                synth = synth['signal']
            return (spec_loss.compute_per_element(elem['audio'], synth)[0],
                    outs['audio_synth'][0])

        return jax.vmap(single)(batch, seg_indices)

    return eval_fn
