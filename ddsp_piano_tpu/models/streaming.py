"""Streaming (chunked) synthesis with carried state.

The reference synthesizes arbitrarily long MIDI files as ONE forward pass
over the whole sequence (synthesize_midi_file.py:73) — memory grows with
file length and each new length triggers a fresh XLA compile. This module
re-designs long-file inference the TPU way: a fixed chunk shape compiled
once, scanned over the file with explicitly carried state:

- GRU hidden states of the context and monophonic networks,
- the NoteRelease cell state (held note + release countdown),
- oscillator phases (per voice x partial, mod 2pi) with one-frame control
  lookahead so chunk boundaries are sample-exact,
- the reverb's convolution tail (ir_len - 1 samples) overlap-added into
  following chunks.

Exactness notes: models whose layer norms are per-timestep (Keras
LayerNormalization — the v2 FcStacks and FiLM context net) stream exactly.
The dafx22-family `Normalize` pools statistics over the *whole sequence*
(ddsp semantics); by default (exact_normalize=True) the driver first runs
one cheap control-path sweep per Normalize layer to accumulate the
whole-file mean/var, then renders every chunk with those fixed values —
measured against the released dafx22 weights this matches the one-shot
render to ~5e-4 of peak (multi-scale spectral distance 0.009) at ~1.5 %
extra wall time, where the per-chunk approximation (exact_normalize=False)
deviates by 23 % of peak. The filtered-noise synth is chunk-local; its
~1-frame FIR edge effects sit at the noise floor.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ddsp_piano_tpu import nn
from ddsp_piano_tpu.models import sub_modules as sm
from ddsp_piano_tpu.models.dag import VectorizedPolyphonicProcessorGroup
from ddsp_piano_tpu.ops import core, oscillator
from ddsp_piano_tpu.processors.reverb import FeedbackDelayNetwork, Reverb


class StreamingSynthesizer:
    """Chunked inference driver for a standard polyphonic PianoModel.

    Args:
        model: a PianoModel built with the vectorized processor group.
        chunk_frames: frames per compiled chunk.
        exact_normalize: ddsp ``Normalize`` layers pool statistics over the
            WHOLE sequence; with True (default) the driver first sweeps the
            file once per Normalize layer to accumulate those statistics
            (control-path cost only — the synthesis path runs once) and then
            renders every chunk with the fixed whole-file values, making
            dafx22-family streaming match the one-shot forward. False falls
            back to per-chunk statistics (faster, approximate).
    """

    def __init__(self, model, chunk_frames: int = 250,
                 exact_normalize: bool = True):
        if not isinstance(model.processor_group,
                          VectorizedPolyphonicProcessorGroup):
            raise ValueError("Streaming requires the vectorized polyphonic "
                             "processor group.")
        self.model = model
        self.chunk_frames = chunk_frames
        self.exact_normalize = exact_normalize
        self._chunk_fn = jax.jit(self._chunk_forward)
        self._scan_fns: Dict[Any, Any] = {}   # keyed by (n_chunks, dry)
        self._stats_fns: Dict[int, Any] = {}  # keyed by n_chunks
        # (ir_len, fft_len, add_dry) of the hoisted reverb operator; static
        # per synthesizer (set by _static_features before any tracing).
        self._reverb_meta = None
        # Normalize layers needing whole-file statistics, in dataflow order.
        self._norm_slots = self._find_norm_slots()

    def _find_norm_slots(self):
        """[('context'|'mono', layer_idx)] of whole-sequence Normalize
        layers inside the streamed Sequentials (dataflow order: all context
        slots feed the mono network)."""
        slots = []
        ctx = self.model.context_network
        if isinstance(ctx, (sm.ContextNetwork, sm.SimpleContextNet)):
            for i, layer in enumerate(ctx.model.layers):
                if isinstance(layer, nn.Normalize):
                    slots.append(('context', i))
        mono = self.model.monophonic_network
        if (isinstance(mono, sm.MonophonicNetwork)
                and not isinstance(mono, sm.MonophonicDeepNetwork)):
            for i, layer in enumerate(mono.model.layers):
                if isinstance(layer, nn.Normalize):
                    slots.append(('mono', i))
        return slots

    # ------------------------------------------------------------------

    def _context_forward(self, params, features, states, norm_stats=None,
                         stop_after=None):
        """Context network with threaded GRU state.

        Returns (context, new_states, prenorm) — `prenorm` captures the
        inputs of Normalize layers without fixed stats (see
        Sequential.apply_stream); with `stop_after` the chain is truncated
        right after that capture and `context` is None.
        """
        model = self.model
        ctx_module = model.context_network
        p = params['context_network']
        if isinstance(ctx_module, sm.FiLMContextNetwork):
            conditioning = sm._collapse_last_axis(
                sm._norm_conditioning(features['conditioning']))
            cond_feat = ctx_module.conditioning_head(
                p['conditioning_head'], conditioning)
            pedal_feat = ctx_module.pedal_head(p['pedal_head'],
                                               features['pedal'])
            piano_feat = ctx_module.piano_id_head(p['piano_id_head'],
                                                  features['piano_model'])
            x = jnp.concatenate([cond_feat, pedal_feat], axis=-1)
            x, new_states = ctx_module.main_model.apply_with_state(
                p['main_model'], x, states)
            piano_feat = ctx_module.film_input_reshape(
                p['film_input_reshape'], piano_feat)
            coef, bias = jnp.split(piano_feat, 2, axis=-1)
            x = x * coef + bias
            context = ctx_module.output_layer(p['output_layer'], x)
            return context, new_states, {}
        if isinstance(ctx_module, sm.SimpleContextNet):
            x, new_states, prenorm = ctx_module.model.apply_stream(
                p['model'], features['pedal'], states,
                norm_stats=norm_stats, stop_after=stop_after)
            if stop_after is not None:
                return None, new_states, prenorm
            context = ctx_module.dense_out(p['dense_out'], x)
            z = features.get('z')
            if z is not None:
                coef, bias = jnp.split(z, 2, axis=-1)
                context = context * coef + bias
            return context, new_states, prenorm
        # ContextNetwork
        conditioning = features['conditioning']
        if ctx_module.normalize_pitch:
            conditioning = sm._norm_conditioning(conditioning)
        x = jnp.concatenate([sm._collapse_last_axis(conditioning),
                             features['pedal'], features['z']], axis=-1)
        x, new_states, prenorm = ctx_module.model.apply_stream(
            p['model'], x, states, norm_stats=norm_stats,
            stop_after=stop_after)
        if stop_after is not None:
            return None, new_states, prenorm
        x = ctx_module.dense_out(p['dense_out'], x)
        outs = nn.split_to_dict(x, ctx_module.output_splits)
        return outs['context'], new_states, prenorm

    def _mono_net_forward(self, params, conditioning, extended_pitch,
                          context, states, norm_stats=None,
                          stop_after=None):
        model = self.model
        mono = model.monophonic_network
        p = params['monophonic_network']
        if isinstance(mono, sm.MonophonicDeepNetwork):
            xp = mono.input_stacks[0](p['input_stacks'][0],
                                      extended_pitch / sm.MIDI_NORM)
            xc = mono.input_stacks[1](p['input_stacks'][1],
                                     sm._norm_conditioning(conditioning))
            xz = mono.input_stacks[2](p['input_stacks'][2], context)
            x = jnp.concatenate([xp, xc, xz], axis=-1)
            state = states[0] if states is not None else None
            x, h = mono.model(p['model'], x, initial_state=state,
                              return_state=True)
            new_states = [h]
            x = jnp.concatenate([xp, xc, xz, x], axis=-1)
            x = mono.out_stack(p['out_stack'], x)
            prenorm = {}
        else:
            x = mono._inputs(conditioning, extended_pitch, context)
            x, new_states, prenorm = mono.model.apply_stream(
                p['model'], x, states, norm_stats=norm_stats,
                stop_after=stop_after)
            if stop_after is not None:
                return None, new_states, prenorm
        x = mono.dense_out(p['dense_out'], x)
        outs = nn.split_to_dict(x, mono.output_splits)
        return outs, new_states, prenorm

    # ------------------------------------------------------------------

    def _chunk_forward(self, params, features, state: Dict[str, Any],
                       rng):
        """One chunk: features (b, C, ...) -> audio (b, C*up) + new state."""
        model = self.model
        group = model.processor_group
        n_synths = model.n_synths
        batch = features['conditioning'].shape[0]
        sample_rate = model.sample_rate
        up = group.additive.upsampling

        feats = dict(features)
        # Global stage.
        self._global_z(params, feats)
        norm_stats = features.get('_norm_stats') or {}
        context, ctx_states, _ = self._context_forward(
            params, feats, state.get('context_states'),
            norm_stats=norm_stats.get('context'))
        feats['context'] = context
        if model.reverb_model is not None and not all(
                k in feats for k in model.reverb_model.output_keys):
            # Skipped when the driver pre-computed the reverb features:
            # they depend only on params + piano_model, so recomputing the
            # (expensive, for the FDN) IR inside every scanned chunk would
            # be pure loop-invariant waste.
            feats.update(model.reverb_model.apply_features(
                params['reverb_model'], feats))
        if model.background_noise_model is not None:
            feats.update(model.background_noise_model.apply_features(
                params['background_noise_model'], feats))

        # Fold polyphony.
        feats = model.parallelizer.parallelize(feats)

        # Note release with carried state.
        extended, nr_state = model.note_release.apply(
            params['note_release'], feats['conditioning'],
            initial_state=state.get('note_release_state'),
            return_state=True)
        feats['extended_pitch'] = extended

        # Tuning models (stateless).
        for slot in ('inharm_model', 'detuner'):
            module = getattr(model, slot)
            if module is not None:
                feats.update(module.apply_features(params[slot], feats))

        # Monophonic network with carried GRU state.
        mono_outs, mono_states, _ = self._mono_net_forward(
            params, feats['conditioning'], extended, feats['context'],
            state.get('mono_states'), norm_stats=norm_stats.get('mono'))
        feats.update(mono_outs)
        new_surrogate_time = None
        if model.surrogate_module is not None:
            # Frames-since-onset counter carried across chunks (the
            # reference's OnsetLinspaceCell state).
            decays, decay_time, new_surrogate_time = (
                model.surrogate_module.apply(
                    params['surrogate_module'], feats['conditioning'],
                    extended, initial_state=state.get('surrogate_time'),
                    return_state=True))
            feats['decays'] = decays
            feats['decay_time'] = decay_time
        if model.harmonic_masking is not None:
            feats.update(model.harmonic_masking.apply_features(
                params['harmonic_masking'], feats))

        # --- synthesis with phase carry + one-frame lookahead -----------
        # Chunk protocol: with a carried previous frame, this chunk renders
        # frames [kC-1, (k+1)C-1) (C frames); the first chunk has no carry
        # and renders [0, C-1) (C-1 frames). Chained with the final flush
        # this reproduces the one-shot render sample-exactly.
        ctrl_keys = tuple(group.additive_controls) + tuple(
            group.noise_controls)
        controls_now = {k: feats[k] for k in ctrl_keys}
        prev = state.get('prev_controls')
        first = state.get('first')  # traced 0/1 scalar in scan mode
        if prev is None and first is None:
            windowed = controls_now        # legacy first chunk: C-1 frames
        else:
            if first is not None:
                # Uniform (scan) mode: on the first chunk, substitute the
                # current first frame as "previous" (the resulting duplicate
                # rendered frame is dropped by the driver and its phase
                # contribution cancelled below).
                now_first = {k: controls_now[k][:, :1] for k in ctrl_keys}
                prev = jax.tree.map(
                    lambda p, n: jnp.where(first > 0, n, p), prev,
                    now_first)
            windowed = {k: jnp.concatenate([prev[k], controls_now[k]],
                                           axis=1) for k in ctrl_keys}
        new_prev = {k: v[:, -1:] for k, v in controls_now.items()}
        add_ctrl_keys = group.additive_controls

        add_params = {}
        controls = group.additive.get_controls(
            add_params, *[windowed[k] for k in add_ctrl_keys])
        from ddsp_piano_tpu.processors.surrogate import (
            SurrogateAdditive, render_framewise_decay)
        surrogate = isinstance(group.additive, SurrogateAdditive)
        if surrogate:
            freqs, amps = group.additive.fold_controls(
                controls['amplitudes'], controls['harmonic_distribution'],
                controls['harmonic_shifts'], controls['f0_hz'])
        else:
            # Fold substrings exactly as the one-shot render does.
            freqs, amps = group.additive.fold_substrings(
                controls['amplitudes'], controls['harmonic_distribution'],
                controls['harmonic_shifts'], controls['f0_hz'])
        osc_controls = oscillator.framewise_osc_controls(
            freqs, amps, up, sample_rate,
            initial_phase=state.get('osc_phase'), lookahead=True)
        if first is not None:
            # Cancel the duplicated frame's phase advance so frame 0 of the
            # real sequence starts at phase zero, exactly like the one-shot
            # render.
            adjust = first * osc_controls.phase0[:, 1:2]
            osc_controls = osc_controls._replace(
                phase0=jnp.mod(osc_controls.phase0 - adjust,
                               2.0 * np.pi))
        if surrogate:
            # The decay envelope is frame-local: align with the rendered
            # frames (drop the lookahead endpoint).
            sig_add = render_framewise_decay(
                osc_controls, controls['decays'][:, :-1],
                controls['decay_time'][:, :-1], up, sample_rate)
        else:
            sig_add = oscillator.render_framewise(osc_controls, up,
                                                  sample_rate)
        new_phase = oscillator.framewise_final_phase(osc_controls, up,
                                                     sample_rate)

        # Noise over the same rendered frame window (chunk-local draws).
        noise_ctrl = group.noise.get_controls(
            {}, *[windowed[k][:, :-1] for k in group.noise_controls])
        sig_noise = group.noise.get_signal({}, rng=rng, **noise_ctrl)

        n_samples = sig_add.shape[-1]
        mix = (sig_add + sig_noise).reshape(n_synths, batch,
                                            n_samples).sum(axis=0)
        if first is not None:
            # Scan mode: the first chunk's leading frame is a duplicate of
            # frame 0 whose dry samples the driver drops — silence it here
            # too so it cannot leak a reverb pre-echo into the wet path or
            # the carried tail.
            keep = jnp.concatenate(
                [jnp.full((up,), 1.0 - first),
                 jnp.ones((n_samples - up,), jnp.float32)])
            mix = mix * keep

        # Reverb with carried tail.
        audio = mix
        new_tail = state.get('reverb_tail')
        if group.reverb is not None:
            rev = group.reverb
            ir_fft = features.get('_reverb_ir_fft')
            if ir_fft is not None:
                # Hoisted path: the IR spectrum is loop-invariant (computed
                # once per render in _static_features); only the chunk's
                # forward/backward FFT runs per chunk.
                ir_len, fft_len, add_dry = self._reverb_meta
            else:
                rev_params = params.get('processor_group',
                                        {}).get(rev.name, {})
                rev_args = [mix] + [feats[c] for c in group.reverb_controls]
                rev_ctrl = rev.get_controls(rev_params, *rev_args)
                ir = core.f32(rev_ctrl['ir'])
                if ir.ndim == 1:
                    ir = ir[None, :]
                add_dry = getattr(rev, 'add_dry', False)
                if isinstance(rev, Reverb):
                    ir = rev._mask_dry_ir(ir)
                ir_len = ir.shape[-1]
                fft_len = int(2 ** np.ceil(np.log2(n_samples + ir_len - 1)))
                ir_fft = jnp.fft.rfft(ir, n=fft_len)
            # Full linear convolution of this chunk (no crop).
            wet = jnp.fft.irfft(
                jnp.fft.rfft(mix, n=fft_len) * ir_fft, n=fft_len
            )[:, :n_samples + ir_len - 1]
            tail_len = ir_len - 1
            tail_in = (jnp.zeros((batch, tail_len), jnp.float32)
                       if new_tail is None else new_tail)
            audio = wet[:, :n_samples]
            if tail_len >= n_samples:
                audio = audio + tail_in[:, :n_samples]
            else:
                audio = audio.at[:, :tail_len].add(tail_in)
            # Carry: unconsumed old tail (shifted) + this chunk's wet spill
            # (the spill length is exactly tail_len).
            carry = jnp.zeros((batch, tail_len), jnp.float32)
            if tail_len > n_samples:
                carry = carry.at[:, :tail_len - n_samples].set(
                    tail_in[:, n_samples:])
            new_tail = carry + wet[:, n_samples:]
            if add_dry:
                audio = audio + mix

        new_state = {
            'context_states': ctx_states,
            'mono_states': mono_states,
            'note_release_state': nr_state,
            'osc_phase': new_phase,
            'prev_controls': new_prev,
            'reverb_tail': new_tail,
        }
        if new_surrogate_time is not None:
            new_state['surrogate_time'] = new_surrogate_time
        if first is not None:
            new_state['first'] = jnp.zeros_like(first)
        return (audio, mix), new_state

    # ------------------------------------------------------------------

    def _global_z(self, params, feats) -> None:
        """Z-encoder stage (in place): constant embeddings resampled to the
        chunk's frame count."""
        model = self.model
        if model.z_encoder is None:
            return
        z, gi, gd = model.z_encoder(params['z_encoder'],
                                    feats['piano_model'])
        n_frames = feats['conditioning'].shape[1]
        feats['z'] = core.resample(z[:, :1], n_frames)
        feats['global_inharm'] = core.resample(gi[:, :1], n_frames)
        feats['global_detuning'] = core.resample(gd[:, :1], n_frames)

    # ------------------------------------------------------------------
    # Whole-file Normalize statistics (exact streaming of the dafx22 family)
    # ------------------------------------------------------------------

    def _stats_chunk(self, params, features, states, stats, net, idx):
        """Control path of one chunk up to Normalize slot (net, idx).

        Returns (per-batch sum, per-batch sum of squares, new states);
        `stats` fixes the statistics of every earlier Normalize slot.
        """
        model = self.model
        feats = dict(features)
        self._global_z(params, feats)
        if net == 'context':
            _, ctx_states, prenorm = self._context_forward(
                params, feats, states['context'],
                norm_stats=stats.get('context'), stop_after=idx)
            new_states = {'context': ctx_states}
        else:
            context, ctx_states, _ = self._context_forward(
                params, feats, states['context'],
                norm_stats=stats.get('context'))
            feats['context'] = context
            feats = model.parallelizer.parallelize(feats)
            extended, nr_state = model.note_release.apply(
                params['note_release'], feats['conditioning'],
                initial_state=states['note_release'], return_state=True)
            _, mono_states, prenorm = self._mono_net_forward(
                params, feats['conditioning'], extended, feats['context'],
                states['mono'], norm_stats=stats.get('mono'),
                stop_after=idx)
            new_states = {'context': ctx_states,
                          'note_release': nr_state,
                          'mono': mono_states}
        x = prenorm[idx]
        # Whole-file first/second moments. Within-chunk sums use XLA's
        # tree reduction; the cross-chunk accumulation adds ~n_chunks f32
        # partials (error ~n_chunks * eps, negligible next to the 1e-3
        # parity budget). GRU/tanh-bounded activations keep E[x^2] and
        # mean^2 the same order, so the var subtraction does not cancel
        # catastrophically.
        s = jnp.sum(x, axis=tuple(range(1, x.ndim)))
        ss = jnp.sum(jnp.square(x), axis=tuple(range(1, x.ndim)))
        return s, ss, new_states

    def _one_stats_sweep(self, params, features, stats, net, idx, n_chunks):
        """Scan the file once, returning (mean, var) for slot (net, idx)."""
        C = self.chunk_frames
        cond = features['conditioning']
        pedal = features['pedal']
        b = cond.shape[0]
        cond_c = cond.reshape(b, n_chunks, C, *cond.shape[2:]).swapaxes(0, 1)
        pedal_c = pedal.reshape(b, n_chunks, C, pedal.shape[-1]
                                ).swapaxes(0, 1)

        def one_chunk(states, cond_i, pedal_i):
            chunk_feats = {'conditioning': cond_i, 'pedal': pedal_i,
                           'piano_model': features['piano_model']}
            return self._stats_chunk(params, chunk_feats, states, stats,
                                     net, idx)

        state_shapes = jax.eval_shape(
            lambda: one_chunk({'context': None, 'note_release': None,
                               'mono': None}, cond_c[0], pedal_c[0])[2])
        zero_states = jax.tree.map(lambda sh: jnp.zeros(sh.shape, sh.dtype),
                                   state_shapes)

        def body(carry, xs):
            states, s_acc, ss_acc = carry
            s, ss, states = one_chunk(states, xs[0], xs[1])
            return (states, s_acc + s, ss_acc + ss), None

        zero = jnp.zeros((b if net == 'context'
                          else b * self.model.n_synths,), jnp.float32)
        (_, s, ss), _ = jax.lax.scan(body, (zero_states, zero, zero),
                                     (cond_c, pedal_c))
        n = self._stats_count(features, net, idx) * n_chunks
        mean = (s / n)[:, None, None]
        var = jnp.maximum(ss / n - jnp.square(s / n), 0.0)[:, None, None]
        return mean, var

    def _stats_count(self, features, net, idx) -> float:
        """Static per-chunk element count of slot (net, idx)'s prenorm."""
        module = (self.model.context_network if net == 'context'
                  else self.model.monophonic_network)
        layer = module.model.layers[idx]
        return float(self.chunk_frames * layer.features)

    def _norm_stats_all(self, params, features, n_chunks):
        """Whole-file (mean, var) for every Normalize slot, in dataflow
        order (each sweep fixes the stats of the previous slots)."""
        stats: Dict[str, Dict[int, Any]] = {}
        for net, idx in self._norm_slots:
            mean, var = self._one_stats_sweep(params, features, stats, net,
                                              idx, n_chunks)
            stats.setdefault(net, {})[idx] = (mean, var)
        return stats

    def _static_features(self, params, features) -> Dict[str, Any]:
        """Loop-invariant per-file features — the reverb IR and its FFT —
        computed once per render instead of once per chunk."""
        model = self.model
        static: Dict[str, Any] = {}
        if model.reverb_model is not None:
            inputs = getattr(model.reverb_model, 'input_keys', ())
            if all(k == 'piano_model' for k in inputs):
                static.update(model.reverb_model.apply_features(
                    params['reverb_model'],
                    {'piano_model': features['piano_model']}))
            # else: time-varying inputs — must stay inside the chunk.
        ir_fft = self._reverb_operator(params, static)
        if ir_fft is not None:
            static['_reverb_ir_fft'] = ir_fft
        return static

    def _reverb_operator(self, params, static: Dict[str, Any]):
        """Precompute the chunk-invariant reverb spectrum, or None.

        Covers both shipped reverb-processor forms: the plain convolution
        Reverb (IR fed as a static feature or held as a trainable param)
        and the standalone trainable FeedbackDelayNetwork (whose expensive
        frequency-domain IR synthesis would otherwise re-run every chunk).
        Side effect: records (ir_len, fft_len, add_dry) in _reverb_meta —
        static Python values baked into the chunk trace.
        """
        group = self.model.processor_group
        rev = group.reverb
        if rev is None:
            return None
        if isinstance(rev, Reverb):
            if rev.trainable:
                ir = params['processor_group'][rev.name]['ir']
            elif len(group.reverb_controls) == 1 and (
                    group.reverb_controls[0] in static):
                ir = static[group.reverb_controls[0]]
            else:
                return None  # time-varying IR: stays inside the chunk
            ir = core.f32(ir)
            if ir.ndim == 1:
                ir = ir[None, :]
            ir = rev._mask_dry_ir(ir)
            add_dry = rev.add_dry
        elif isinstance(rev, FeedbackDelayNetwork) and rev.trainable:
            rev_params = params.get('processor_group', {}).get(rev.name, {})
            ir = core.f32(rev.get_controls(rev_params, None)['ir'])
            if ir.ndim == 1:
                ir = ir[None, :]
            add_dry = False
        else:
            return None
        n_samples = self.chunk_frames * group.additive.upsampling
        ir_len = ir.shape[-1]
        fft_len = int(2 ** np.ceil(np.log2(n_samples + ir_len - 1)))
        self._reverb_meta = (ir_len, fft_len, add_dry)
        return jnp.fft.rfft(ir, n=fft_len)

    def synthesize(self, params, features: Dict[str, Any],
                   rng: Optional[jax.Array] = None,
                   return_dry: bool = False) -> np.ndarray:
        """Render a full-length features dict chunk by chunk.

        features: conditioning (1, T, n_synths, 2), pedal (1, T, 4),
        piano_model (1, 1). Returns (1, T * up) audio, sample-aligned with
        the one-shot forward (the one-frame control lookahead is internal
        to the chunk protocol; it does not delay the output). The final
        frame is flushed with a clamped interpolation endpoint. With
        return_dry, returns (audio, dry_mix) — the pre-reverb sum the
        one-shot forward exposes as outputs['add']['signal'].
        """
        if rng is None:
            rng = jax.random.PRNGKey(0)
        C = self.chunk_frames
        total = features['conditioning'].shape[1]
        if total % C != 0:
            raise ValueError(f"total frames {total} must be divisible by "
                             f"chunk_frames {C}")
        state: Dict[str, Any] = {}
        static = self._static_features(params, features)
        if self.exact_normalize and self._norm_slots:
            n_chunks = total // C
            if n_chunks not in self._stats_fns:
                self._stats_fns[n_chunks] = jax.jit(
                    lambda p, f: self._norm_stats_all(p, f, n_chunks))
            static['_norm_stats'] = self._stats_fns[n_chunks](params,
                                                              features)
        chunks, dry_chunks = [], []
        for i, start in enumerate(range(0, total, C)):
            chunk_feats = {
                'conditioning': features['conditioning'][:, start:start + C],
                'pedal': features['pedal'][:, start:start + C],
                'piano_model': features['piano_model'],
                **static,
            }
            (audio, dry), state = self._chunk_fn(params, chunk_feats, state,
                                                 jax.random.fold_in(rng, i))
            # Keep chunks on device: a per-chunk np.asarray would block
            # dispatch each iteration; one bulk transfer happens at the end.
            chunks.append(audio)
            dry_chunks.append(dry)
        # Flush: a chunk of repeated last frames renders the final frame
        # with a (near-)clamped interpolation endpoint.
        flush_feats = {
            'conditioning': jnp.repeat(
                features['conditioning'][:, -1:], C, axis=1),
            'pedal': jnp.repeat(features['pedal'][:, -1:], C, axis=1),
            'piano_model': features['piano_model'],
            **static,
        }
        (audio, dry), _ = self._chunk_fn(params, flush_feats, state,
                                         jax.random.fold_in(rng, 1 << 20))
        up = audio.shape[-1] // C
        chunks.append(audio[:, :up])
        dry_chunks.append(dry[:, :up])
        out = np.concatenate([np.asarray(c) for c in chunks], axis=1)
        if not return_dry:
            return out
        return out, np.concatenate([np.asarray(c) for c in dry_chunks],
                                   axis=1)

    # ------------------------------------------------------------------

    def _zero_state(self, params, features, rng, static=None):
        """Concrete zero state matching the carried-state pytree (shapes
        discovered abstractly via eval_shape of the first-chunk body)."""
        C = self.chunk_frames
        if static is None:
            static = self._static_features(params, features)
        chunk_feats = {
            'conditioning': features['conditioning'][:, :C],
            'pedal': features['pedal'][:, :C],
            'piano_model': features['piano_model'],
            **static,
        }
        _, state_shapes = jax.eval_shape(
            lambda p, f: self._chunk_forward(p, f, {}, rng),
            params, chunk_feats)
        state = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), state_shapes)
        state['first'] = jnp.ones((), jnp.float32)
        return state

    def synthesize_scanned(self, params, features: Dict[str, Any],
                           rng: Optional[jax.Array] = None,
                           return_dry: bool = False) -> jax.Array:
        """Device-resident long-file render: one jit, lax.scan over chunks.

        Functionally identical to synthesize() but the whole loop lives on
        device (no per-chunk host round trips), which restores one-shot
        throughput for arbitrarily long files at fixed memory. With
        return_dry, returns (audio, dry_mix).

        Returns the audio as a DEVICE array: the device->host copy of a
        multi-minute render costs more than the render itself through a
        relayed chip (measured ~1 s for 180 s of 24 kHz audio vs ~0.5 s of
        compute), so callers that post-process on device (or only need a
        slice) must not pay it eagerly. np.asarray(result) materializes it.
        """
        if rng is None:
            rng = jax.random.PRNGKey(0)
        C = self.chunk_frames
        total = features['conditioning'].shape[1]
        if total % C != 0:
            raise ValueError(f"total frames {total} must be divisible by "
                             f"chunk_frames {C}")
        n_chunks = total // C

        def run(params, features, rng):
            static = self._static_features(params, features)
            if self.exact_normalize and self._norm_slots:
                # Whole-file Normalize statistics: one control-path sweep
                # per Normalize layer, then the render scan uses them
                # fixed (ddsp whole-sequence semantics).
                static['_norm_stats'] = self._norm_stats_all(
                    params, features, n_chunks)
            state = self._zero_state(params, features, rng, static=static)
            cond = features['conditioning']
            pedal = features['pedal']
            b = cond.shape[0]
            cond_c = cond.reshape(b, n_chunks, C, *cond.shape[2:]
                                  ).swapaxes(0, 1)
            pedal_c = pedal.reshape(b, n_chunks, C, pedal.shape[-1]
                                    ).swapaxes(0, 1)
            rngs = jax.random.split(rng, n_chunks)

            def body(state, xs):
                cond_i, pedal_i, rng_i = xs
                chunk_feats = {'conditioning': cond_i, 'pedal': pedal_i,
                               'piano_model': features['piano_model'],
                               **static}
                out, state = self._chunk_forward(params, chunk_feats,
                                                 state, rng_i)
                return state, out

            state, (audio, dry) = jax.lax.scan(body, state,
                                               (cond_c, pedal_c, rngs))
            # (n_chunks, b, C*up) -> (b, total*up)
            audio = jnp.swapaxes(audio, 0, 1).reshape(b, -1)
            dry = jnp.swapaxes(dry, 0, 1).reshape(b, -1)
            # Flush the final frame with repeated last-frame conditioning.
            flush_feats = {
                'conditioning': jnp.repeat(cond[:, -1:], C, axis=1),
                'pedal': jnp.repeat(pedal[:, -1:], C, axis=1),
                'piano_model': features['piano_model'],
                **static,
            }
            (tail_audio, tail_dry), _ = self._chunk_forward(
                params, flush_feats, state, jax.random.fold_in(rng,
                                                               1 << 20))
            up = tail_audio.shape[-1] // C
            # Drop the duplicated first frame; append the flushed frame.
            wet = jnp.concatenate([audio[:, up:], tail_audio[:, :up]],
                                  axis=1)
            if not return_dry:
                # Trace-time flag: without it the scan would stack and
                # return a second full-render-length device array only
                # for the caller to discard.
                return wet
            return wet, jnp.concatenate([dry[:, up:], tail_dry[:, :up]],
                                        axis=1)

        # `run` closes over n_chunks (the scan length) and return_dry, so
        # the compiled fn must be cached per (chunk count, dry) — a single
        # cached jit would replay the first call's shape on later files.
        key = (n_chunks, return_dry)
        if key not in self._scan_fns:
            self._scan_fns[key] = jax.jit(run)
        return self._scan_fns[key](params, features, rng)
