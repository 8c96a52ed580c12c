"""Checkpointing: native (orbax) save/restore + TF-checkpoint import.

The reference ships TF object-based checkpoints (Keras object paths like
``model/monophonic_network/model/layer_with_weights-1/cell/kernel``; see
model_weights/dafx22/ckpt-0). ``import_tf_weights`` walks our module tree,
generates the corresponding TF variable names structurally (Sequential
containers count only weighted layers, GRUs nest under ``cell``, Keras
Embeddings under ``embeddings``), and loads the released weights into our
parameter pytree. TensorFlow is used host-side purely as a checkpoint
reader; it never touches the jit path.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ddsp_piano_tpu import nn
from ddsp_piano_tpu.models import sub_modules as sm


# -----------------------------------------------------------------------------
# Native checkpoints (orbax)
# -----------------------------------------------------------------------------


def save_checkpoint(directory: str, state, step: int,
                    meta: Optional[dict] = None):
    """Save a train state under directory/ckpt-<step>.

    Components are saved as independent orbax items (params / opt_state /
    meta) so restore can take params without the optimizer state: the
    optimizer pytree structure depends on the training phase's trainable
    mask, and inference or cross-phase restores must not be coupled to it.
    The optimizer state is stored as a flax state-dict (plain nested dicts)
    so it round-trips through orbax independent of optax's namedtuples.

    Multi-host: the training CLI gates saves to process 0 (the state is
    host numpy, fully replicated), so orbax's cross-process barriers are
    scoped to the calling process alone — a lead-only save must not wait
    on hosts that never enter save_checkpoint.
    """
    import json

    import jax
    import orbax.checkpoint as ocp
    from flax import serialization

    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f'ckpt-{step}')
    os.makedirs(path, exist_ok=True)
    if jax.process_count() > 1:
        me = jax.process_index()
        mp_options = ocp.options.MultiprocessingOptions(
            primary_host=me, active_processes={me},
            barrier_sync_key_prefix=f'proc{me}')
        ckptr_cm = ocp.Checkpointer(
            ocp.PyTreeCheckpointHandler(
                multiprocessing_options=mp_options),
            multiprocessing_options=mp_options)
    else:
        ckptr_cm = ocp.PyTreeCheckpointer()
    with ckptr_cm as ckptr:
        ckptr.save(os.path.join(path, 'params'), state['params'],
                   force=True)
        if state.get('opt_state') is not None:
            ckptr.save(os.path.join(path, 'opt_state'),
                       serialization.to_state_dict(state['opt_state']),
                       force=True)
    with open(os.path.join(path, 'meta.json'), 'w') as f:
        json.dump({'step': int(state.get('step', step)), **(meta or {})}, f)
    # Track the latest step like TF's 'checkpoint' index file.
    with open(os.path.join(directory, 'checkpoint'), 'w') as f:
        f.write(str(step))
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    marker = os.path.join(directory, 'checkpoint')
    if os.path.exists(marker):
        with open(marker) as f:
            step = f.read().strip()
        path = os.path.join(directory, f'ckpt-{step}')
        if os.path.exists(path):
            return path
    # Fall back to scanning.
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith('ckpt-') and name[5:].isdigit():
            steps.append(int(name[5:]))
    if not steps:
        return None
    return os.path.join(directory, f'ckpt-{max(steps)}')


def read_meta(path_or_dir: str) -> dict:
    """The checkpoint's meta.json ({'step', plus caller extras such as the
    training CLI's 'phase_start_step'/'lowest_val_loss'}); {} if absent."""
    import json

    path = _resolve_ckpt_path(path_or_dir)
    meta_path = os.path.join(path, 'meta.json')
    if not os.path.exists(meta_path):
        return {}
    with open(meta_path) as f:
        return json.load(f)


def _resolve_ckpt_path(path_or_dir: str) -> str:
    path = path_or_dir
    if not os.path.basename(path).startswith('ckpt-'):
        found = latest_checkpoint(path)
        if found is None:
            raise FileNotFoundError(
                f"No checkpoint found under {path_or_dir!r}")
        path = found
    return os.path.abspath(path)


def restore_checkpoint(path_or_dir: str, target):
    """Restore {'params', 'opt_state'?, 'step'} saved by save_checkpoint.

    Components restore independently: params always (against
    target['params']); opt_state only when the target provides one AND the
    stored structure matches (a phase switch changes the optax mask
    structure — the caller reinitializes in that case); step from
    meta.json. Returns a dict with 'opt_state' possibly None.
    """
    import json

    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    from flax import serialization

    path = _resolve_ckpt_path(path_or_dir)
    out = {}
    with ocp.PyTreeCheckpointer() as ckptr:
        out['params'] = ckptr.restore(os.path.join(path, 'params'),
                                      item=target['params'])
        out['opt_state'] = None
        opt_target = target.get('opt_state')
        opt_path = os.path.join(path, 'opt_state')
        if opt_target is not None and os.path.exists(opt_path):
            stored = ckptr.restore(opt_path)
            try:
                out['opt_state'] = serialization.from_state_dict(
                    opt_target, stored)
            except Exception as e:
                # Best-effort by design: a phase switch changes the optax
                # mask structure and the stored moments don't apply. Never
                # silent — losing Adam moments changes training dynamics.
                logging.warning(
                    "Stored opt_state does not match the current optimizer "
                    "structure (%s); optimizer moments will be "
                    "re-initialized.", e)
                out['opt_state'] = None
    meta_path = os.path.join(path, 'meta.json')
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            out['step'] = jnp.asarray(json.load(f)['step'], jnp.int32)
    else:
        out['step'] = target.get('step')
    return out


# -----------------------------------------------------------------------------
# TF checkpoint import
# -----------------------------------------------------------------------------


def read_tf_checkpoint(ckpt_path: str) -> Dict[str, np.ndarray]:
    """Read all model variables of a TF object checkpoint into numpy."""
    import tensorflow as tf  # host-side reader only

    if os.path.isdir(ckpt_path):
        resolved = tf.train.latest_checkpoint(ckpt_path)
        if resolved is None:
            raise FileNotFoundError(f"No TF checkpoint in {ckpt_path!r}")
        ckpt_path = resolved
    reader = tf.train.load_checkpoint(ckpt_path)
    out = {}
    suffix = '/.ATTRIBUTES/VARIABLE_VALUE'
    for name in reader.get_variable_to_shape_map():
        if not name.endswith(suffix):
            continue
        clean = name[:-len(suffix)]
        if not clean.startswith('model/'):
            continue
        out[clean[len('model/'):]] = reader.get_tensor(name)
    return out


def _seq_paths(seq: nn.Sequential, params: List) -> List[Tuple[Tuple, str]]:
    """Paths inside a Keras Sequential: only weighted layers are counted."""
    out = []
    weighted = 0
    for i, (layer, p) in enumerate(zip(seq.layers, params)):
        sub = _module_paths(layer, p)
        if not sub:
            continue
        for rel, tf_rel in sub:
            out.append(((i,) + rel, f'layer_with_weights-{weighted}/{tf_rel}'))
        weighted += 1
    return out


def _module_paths(module, params) -> List[Tuple[Tuple, str]]:
    """(relative param path, relative TF name) pairs for one module."""
    if isinstance(module, nn.GRU):
        return [(('kernel',), 'cell/kernel'),
                (('recurrent_kernel',), 'cell/recurrent_kernel'),
                (('bias',), 'cell/bias')]
    if isinstance(module, nn.Dense):
        out = [(('kernel',), 'kernel')]
        if module.use_bias:
            out.append((('bias',), 'bias'))
        return out
    if isinstance(module, nn.LayerNormalization):
        return [(('gamma',), 'gamma'), (('beta',), 'beta')]
    if isinstance(module, nn.Normalize):
        return [(('scale',), 'scale'), (('shift',), 'shift')]
    if isinstance(module, nn.Embedding):
        return [(('embeddings',), 'embeddings')]
    if isinstance(module, nn.Sequential):  # includes Fc / FcStack
        return _seq_paths(module, params)
    if isinstance(module, nn.Activation):
        return []
    raise NotImplementedError(
        f"No TF path rule for module {type(module).__name__}")


def _submodule_tf_paths(slot: str, module, params
                        ) -> List[Tuple[Tuple, str]]:
    """Full (param path within slot, TF name within model/<slot>) pairs."""
    pairs: List[Tuple[Tuple, str]] = []

    def add(prefix_path, tf_prefix, sub, sub_params):
        for rel, tf_rel in _module_paths(sub, sub_params):
            pairs.append((prefix_path + rel,
                          f'{tf_prefix}/{tf_rel}' if tf_prefix else tf_rel))

    if isinstance(module, (sm.ContextNetwork, sm.SimpleContextNet)):
        add(('model',), 'model', module.model, params['model'])
        add(('dense_out',), 'dense_out', module.dense_out,
            params['dense_out'])
    elif isinstance(module, sm.MonophonicDeepNetwork):
        for i, stack in enumerate(module.input_stacks):
            add(('input_stacks', i), f'input_stacks/{i}', stack,
                params['input_stacks'][i])
        # The reference wraps the GRU in nn.Rnn, a container layer holding
        # the Keras GRU under its 'rnn' attribute (v2 ckpt:
        # model/layer_with_weights-0/rnn/cell/kernel).
        add(('model',), 'model/layer_with_weights-0/rnn', module.model,
            params['model'])
        add(('out_stack',), 'out_stack', module.out_stack,
            params['out_stack'])
        add(('dense_out',), 'dense_out', module.dense_out,
            params['dense_out'])
    elif isinstance(module, sm.MonophonicNetwork):
        add(('model',), 'model', module.model, params['model'])
        add(('dense_out',), 'dense_out', module.dense_out,
            params['dense_out'])
    elif isinstance(module, sm.FiLMContextNetwork):
        for attr in ('conditioning_head', 'pedal_head', 'piano_id_head',
                     'main_model', 'film_input_reshape', 'output_layer'):
            add((attr,), attr, getattr(module, attr), params[attr])
    elif isinstance(module, sm.OneHotZEncoder):
        for attr in ('embedding', 'inharm_embedding', 'detune_embedding'):
            add((attr,), attr, getattr(module, attr), params[attr])
    elif isinstance(module, sm.BackgroundNoiseFilter):
        add(('embedding',), 'embedding', module.embedding,
            params['embedding'])
    elif isinstance(module, sm.MultiInstrumentReverb):
        add(('reverb_dict',), 'reverb_dict/layer_with_weights-0',
            module.reverb_dict, params['reverb_dict'])
    elif isinstance(module, sm.MultiInstrumentFeedbackDelayReverb):
        for attr in module._EMBEDDINGS:
            add((attr,), attr, getattr(module, attr), params[attr])
    elif isinstance(module, (sm.ParametricTuning, sm.InharmonicityNetwork)) \
            and not isinstance(module, sm.JointParametricInharmTuning):
        for leaf in ('model_specific_weight', 'slopes', 'offsets',
                     'slopes_modifier', 'offsets_modifier'):
            pairs.append(((leaf,), leaf))
    elif isinstance(module, sm.JointParametricInharmTuning):
        for w in module._WEIGHT_NAMES:
            add((w,), w, module.embeddings[w], params[w])
    elif isinstance(module, (sm.Detuner,)):
        add(('layer',), 'layer', module.layer, params['layer'])
    elif isinstance(module, sm.DeepDetuner):
        add(('hidden_layers',), 'hidden_layers', module.hidden_layers,
            params['hidden_layers'])
        add(('out_layer',), 'out_layer', module.out_layer,
            params['out_layer'])
    elif isinstance(module, sm.DeepInharmonicity):
        for attr in ('hidden_layers', 'scale_layer', 'out_layer'):
            add((attr,), attr, getattr(module, attr), params[attr])
    elif isinstance(module, (sm.DictDetuner, sm.DictInharmonicityModel)):
        add(('layer',), 'layer', module.layer, params['layer'])
    elif isinstance(module, sm.SurrogateModule):
        add(('amp_model',), 'amp_model', module.amp_model,
            params['amp_model'])
    elif isinstance(module, sm.NoteRelease):
        pairs.append((('cell', 'release_duration'),
                      'layer/cell/release_duration'))
    elif isinstance(module, sm.PartialMasking):
        pass
    else:
        raise NotImplementedError(
            f"No TF mapping for sub-module {type(module).__name__} "
            f"in slot {slot!r}")
    return pairs


def tf_name_map(model, params=None) -> Dict[str, Tuple[str, Tuple]]:
    """TF variable name -> (slot, param path within slot) for a PianoModel.

    Pass `params` when you already have an initialized tree — the map only
    needs its *structure*, so this avoids a redundant model.init.
    """
    if params is None:
        params = jax.eval_shape(model.init, jax.random.PRNGKey(0))
    mapping = {}
    for slot, module in model._module_slots():
        for path, tf_rel in _submodule_tf_paths(slot, module, params[slot]):
            mapping[f'{slot}/{tf_rel}'] = (slot, path)
    return mapping


def _set_path(tree, slot, path, value):
    node = tree[slot]
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def _get_path(tree, slot, path):
    node = tree[slot]
    for p in path:
        node = node[p]
    return node


def export_tf_weights(model, params, ckpt_path: str) -> str:
    """Write a parameter pytree as a reference-compatible TF checkpoint.

    The write-side inverse of import_tf_weights: every variable goes under
    the Keras object path the reference's own `tf.train.Checkpoint(model=
    model)` layout uses (model_weights/dafx22/ckpt-0 names), so a model
    trained or fine-tuned in this framework can be handed back to the
    reference tooling (its restore path:
    /root/reference/train_single_phase.py:153-155,
    synthesize_midi_file.py:68) — TF object-based restore resolves
    variables by these structural paths.

    TensorFlow is used host-side only. Returns the written prefix
    (readable by tf.train.load_checkpoint / import_tf_weights).
    """
    import tensorflow as tf  # host-side writer only

    mapping = tf_name_map(model, params)
    root = tf.train.Checkpoint()
    nodes = {(): root}

    def get_node(parts: Tuple[str, ...]):
        if parts in nodes:
            return nodes[parts]
        parent = get_node(parts[:-1])
        child = tf.train.Checkpoint()
        setattr(parent, parts[-1], child)
        nodes[parts] = child
        return child

    for tf_name, (slot, path) in mapping.items():
        parts = tuple(tf_name.split('/'))
        parent = get_node(parts[:-1])
        value = np.asarray(_get_path(params, slot, path))
        setattr(parent, parts[-1], tf.Variable(value))

    outer = tf.train.Checkpoint(model=root)
    os.makedirs(os.path.dirname(os.path.abspath(ckpt_path)), exist_ok=True)
    return outer.write(ckpt_path)


def import_tf_weights(model, params, ckpt_path: str,
                      strict: bool = True):
    """Load a released TF checkpoint into a PianoModel parameter pytree.

    Returns (new_params, report) where report lists matched/missing/unused
    variables. With strict=True a shape mismatch or missing model variable
    raises.
    """
    tf_vars = read_tf_checkpoint(ckpt_path)
    mapping = tf_name_map(model, params)
    new_params = jax.tree.map(lambda x: x, params)  # deep copy structure

    matched, missing, mismatched = [], [], []
    for tf_name, (slot, path) in mapping.items():
        if tf_name not in tf_vars:
            missing.append(tf_name)
            continue
        value = np.asarray(tf_vars[tf_name])
        current = np.asarray(_get_path(params, slot, path))
        if value.shape != current.shape:
            mismatched.append((tf_name, value.shape, current.shape))
            continue
        _set_path(new_params, slot, path,
                  jnp.asarray(value, jnp.float32))
        matched.append(tf_name)
    unused = sorted(set(tf_vars) - set(matched))

    report = {'matched': sorted(matched), 'missing': sorted(missing),
              'mismatched': mismatched, 'unused': unused}
    if strict and (missing or mismatched):
        raise ValueError(
            f"TF checkpoint import incomplete: missing={missing} "
            f"mismatched={mismatched}")
    return new_params, report
