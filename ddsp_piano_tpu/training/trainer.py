"""Trainer: jit-compiled, mesh-parallel optimization loop.

Functional equivalent of the ddsp Trainer surface the reference consumes
(.build/.restore/.save/.train_step/.run/.psum/.distribute_dataset;
/root/reference/train_single_phase.py:127-182), redesigned for JAX:

- one jitted train step: forward + grads + masked Adam update, with the
  batch sharded over the mesh 'data' axis and parameters replicated;
  GSPMD inserts the gradient all-reduce over ICI (no hand-written psum in
  the step itself),
- phase-alternating trainability as an optax mask from
  PianoModel.trainable_mask,
- NaN guard on losses (reference train_single_phase.py:185-187), checked
  with a one-step delay so the host never blocks on the in-flight step
  (async dispatch keeps the device pipeline full); NanLossError carries
  the last finite state for the 'crashed_iter' checkpoint.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ddsp_piano_tpu.parallel import mesh as mesh_lib
from ddsp_piano_tpu.training import checkpoints


class NanLossError(RuntimeError):
    """A training loss became non-finite.

    `state` carries the last finite TrainState (the parameters *before*
    the step that produced the NaN) so the caller can checkpoint it.
    """

    def __init__(self, message: str, state=None):
        super().__init__(message)
        self.state = state


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array

    def tree(self):
        return {'params': self.params, 'opt_state': self.opt_state,
                'step': self.step}

    @classmethod
    def from_tree(cls, tree):
        return cls(params=tree['params'], opt_state=tree['opt_state'],
                   step=tree['step'])


class Trainer:
    """Mesh-parallel trainer for a PianoModel."""

    def __init__(self,
                 model,
                 learning_rate: float = 1e-3,
                 grad_clip_norm: float = 3.0,
                 first_phase: Optional[bool] = None,
                 mesh=None,
                 restore_checkpoint: bool = True,
                 nan_check_interval: int = 16):
        self.model = model
        self.learning_rate = learning_rate
        self.grad_clip_norm = grad_clip_norm
        self.first_phase = first_phase
        self.mesh = mesh if mesh is not None else mesh_lib.get_mesh()
        self._train_step = None
        self._train_steps_scan = None
        self._eval_step = None
        self._packer = None  # lazy BatchPacker for packed staging
        # 16-bit wire encoding for packed staging (training/staging.py):
        # per-key lanes chosen from the first batch, bit-exact by
        # construction (keys that don't round-trip get f32-split lanes).
        # False forces f32-split for every key (--staging packed32).
        self.pack_wire = True
        # Delayed NaN guard: a bounded deque of (losses, pre-step state)
        # pairs, drained whenever it reaches nan_check_interval entries (and
        # unconditionally by save/validation_step). Each drain costs one
        # host<->device round-trip per pending step; through a relayed chip
        # that round-trip is ~30 ms, so checking every step costs more than
        # half the step itself (measured 126 -> 50 ms/step going to
        # interval 16 + device_prefetch). Training still halts within
        # nan_check_interval steps of a non-finite loss, and the raised
        # NanLossError carries the state from just before the first bad
        # step — the same crashed_iter semantics as checking every step.
        # HBM cost: up to nan_check_interval pre-step TrainStates (params +
        # Adam moments) stay referenced between drains — ~16 x 6.5 MB for
        # dafx22; lower the interval for models where that retention bites.
        self.nan_check_interval = max(1, int(nan_check_interval))
        self._pending_guard = []

    # -- state --------------------------------------------------------------

    def _make_optimizer(self, params):
        tx = optax.adam(self.learning_rate)
        if self.grad_clip_norm:
            tx = optax.chain(optax.clip_by_global_norm(self.grad_clip_norm),
                             tx)
        mask = self.model.trainable_mask(params,
                                         first_phase=self.first_phase)
        self._mask = mask
        labels = jax.tree.map(lambda b: 'train' if b else 'freeze', mask)
        # Frozen leaves get zero updates (optax.masked would pass their raw
        # gradients through as updates).
        return optax.multi_transform(
            {'train': tx, 'freeze': optax.set_to_zero()}, labels)

    def init_state(self, rng: Optional[jax.Array] = None) -> TrainState:
        if rng is None:
            rng = jax.random.PRNGKey(0)
        params = self.model.init(rng)
        self.optimizer = self._make_optimizer(params)
        opt_state = self.optimizer.init(params)
        state = TrainState(params=params, opt_state=opt_state,
                           step=jnp.zeros((), jnp.int32))
        return self.distribute_state(state)

    def state_with_params(self, state: TrainState, params) -> TrainState:
        """Replace parameters (e.g. after a TF-checkpoint import)."""
        self.optimizer = self._make_optimizer(params)
        new = TrainState(params=params,
                         opt_state=self.optimizer.init(params),
                         step=state.step)
        return self.distribute_state(new)

    # -- reference-Trainer API parity (ddsp trainers.Trainer surface;
    # /root/reference/train_single_phase.py:127-182) --------------------

    def build(self, batch=None,
              rng: Optional[jax.Array] = None) -> TrainState:
        """Create model + optimizer variables (the reference builds Keras
        weights by forwarding a batch; here init is shape-free — the batch
        argument is accepted for call-site compatibility)."""
        del batch
        return self.init_state(rng)

    def run(self, fn, *args, **kwargs):
        """strategy.run equivalent: under GSPMD the jitted fn is already
        mesh-distributed, so this just calls it."""
        return fn(*args, **kwargs)

    def distribute_dataset(self, dataset):
        """Shard each host batch of an iterable over the mesh 'data' axis
        (the reference's trainer.distribute_dataset / AutoShardPolicy.DATA;
        train_single_phase.py:143-144). train_step also accepts raw host
        batches, so this wrapper is optional."""
        for batch in dataset:
            yield self.distribute_batch(batch)

    def pack_batch(self, batch):
        """Stage one host batch as a single packed ``(b, width)`` array.

        ONE device transfer instead of one per key, in a 16-bit wire
        format that halves the bytes for production data — through a
        relayed chip the per-put fixed cost AND the wire bandwidth both
        bound staging (measured: dict 49.5 ms vs 14.3 ms for the same
        1.8 MB as one array; wire ~70-126 MB/s hour-to-hour —
        benchmarks/profile_relay_staging.py). train_step/train_steps
        unpack INSIDE the jitted program; numerics are bit-identical to
        dict staging by construction (training/staging.py).
        """
        if self._packer is None:
            from ddsp_piano_tpu.training.staging import BatchPacker
            self._packer = BatchPacker(batch, wire=self.pack_wire)
        return mesh_lib.shard_batch(
            {'packed': self._packer.pack(batch)}, self.mesh)['packed']

    def pack_block(self, batches):
        """Stage K host batches as one packed ``(K, b, width)`` array —
        the packed analogue of stack_batches for train_steps."""
        if self._packer is None:
            from ddsp_piano_tpu.training.staging import BatchPacker
            self._packer = BatchPacker(batches[0], wire=self.pack_wire)
        from jax.sharding import NamedSharding, PartitionSpec as P
        block = self._packer.pack_block(batches)
        sharding = NamedSharding(self.mesh, P(None, self.mesh.axis_names[0]))
        return jax.device_put(block, sharding)

    def _unpack_in_trace(self, batch):
        """Inside-jit branch: a packed array becomes the batch dict.

        Structure is static under tracing, so the dict and packed paths
        compile as separate programs of the same downstream HLO.
        """
        if isinstance(batch, dict):
            return batch
        if self._packer is None:
            raise ValueError(
                "Got a packed batch array but no BatchPacker — stage "
                "batches via pack_batch/pack_block.")
        return self._packer.unpack(batch)

    def device_prefetch(self, iterator, depth: int = 1,
                        packed: bool = False):
        """Yield device-staged batches, staying ``depth`` batches ahead.

        Staging batch N+1 happens right after the consumer dispatched its
        (async) step on batch N, so the host->device transfer overlaps the
        device computing step N instead of serializing with it. Through a
        relayed chip this is worth ~45 ms/step on the dafx22 recipe shapes
        (126 -> 81 ms/step measured); on directly-attached chips transfers
        already overlap, so it is merely free. The reference hides the same
        cost inside tf.data prefetch + tf.distribute's input pipelines.
        """
        import collections
        stage = self.pack_batch if packed else self.distribute_batch
        it = iter(iterator)
        buf = collections.deque()
        depth = max(1, depth)
        try:
            while len(buf) < depth:
                buf.append(stage(next(it)))
        except StopIteration:
            pass
        while buf:
            yield buf.popleft()
            # Control returns here after the consumer dispatched its step
            # on the yielded batch — stage the next one while it runs.
            try:
                buf.append(stage(next(it)))
            except StopIteration:
                pass

    def block_prefetch(self, iterator, k: int, depth: int = 1,
                       packed: bool = False):
        """Yield stacked K-step device blocks for train_steps.

        Groups ``k`` host batches per block, stages each block as ONE
        device transfer (stack_batches), and stays ``depth`` blocks ahead
        so staging overlaps the in-flight scanned dispatch — the K-step
        analogue of device_prefetch. A trailing partial block (< k
        batches) is dropped; pick steps_per_epoch divisible by k.
        """
        import collections
        import itertools
        stage = self.pack_block if packed else self.stack_batches
        it = iter(iterator)
        buf = collections.deque()
        depth = max(1, depth)
        while True:
            while len(buf) < depth:
                blk = list(itertools.islice(it, k))
                if len(blk) < k:
                    break
                buf.append(stage(blk))
            if not buf:
                return
            yield buf.popleft()

    # -- distribution -------------------------------------------------------

    def distribute_state(self, state: TrainState) -> TrainState:
        return TrainState.from_tree(
            mesh_lib.replicate(state.tree(), self.mesh))

    def distribute_batch(self, batch: Dict[str, np.ndarray]):
        batch = {k: v for k, v in batch.items() if k != 'filename'}
        from jax.sharding import NamedSharding
        if all(isinstance(v, jax.Array)
               and isinstance(v.sharding, NamedSharding)
               and v.sharding.mesh == self.mesh for v in batch.values()):
            # Already distributed (e.g. by the distribute_dataset parity
            # wrapper) — re-sharding would np.asarray global arrays, which
            # raises on non-addressable shards in a multi-process run.
            return batch
        return mesh_lib.shard_batch(batch, self.mesh)

    def psum(self, value):
        """Global (cross-replica) sum of a tree (ddsp Trainer.psum parity).

        Under GSPMD a mesh-sharded ``jax.Array`` is a *global* view, so
        ``jnp.sum`` reduces across every device — and in a multi-process
        run, across every host (XLA inserts the collective). Host-local
        numpy values are therefore refused when process_count > 1: summing
        them locally would silently drop the other processes' data.
        """
        if jax.process_count() > 1:
            for leaf in jax.tree.leaves(value):
                if not isinstance(leaf, jax.Array):
                    raise TypeError(
                        "Trainer.psum in a multi-process run requires "
                        "global jax.Array inputs (e.g. from "
                        "distribute_batch / a jit step); got "
                        f"{type(leaf).__name__}, whose local sum would "
                        "silently be wrong.")
        return jax.tree.map(jnp.sum, value)

    # -- steps --------------------------------------------------------------

    def _build_train_step(self):
        model = self.model
        optimizer = self.optimizer
        trainer = self

        def train_step(state_tree, batch, rng):
            batch = trainer._unpack_in_trace(batch)
            params = state_tree['params']

            def loss_fn(p):
                outs = model(p, batch, training=True, rng=rng)
                return outs['losses']['total_loss'], outs['losses']

            grads, losses = jax.grad(loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(
                grads, state_tree['opt_state'], params)
            params = optax.apply_updates(params, updates)
            return ({'params': params, 'opt_state': opt_state,
                     'step': state_tree['step'] + 1}, losses)

        # No buffer donation: on a NaN loss the caller must still be able
        # to save the *pre-step* state as crashed_iter (donation would have
        # deleted it). The states here are a few MB, so donation buys
        # nothing.
        return jax.jit(train_step)

    def _build_train_steps_scan(self):
        """K chained optimization steps as ONE jitted program.

        lax.scan over a stacked batch tree (leading axis = step index):
        one dispatch + one host round-trip per K steps, amortizing the
        relay's per-program dispatch floor and the per-step staging
        serialization that the single-step path pays (VERDICT r4 item 1b).
        Per-step rngs are derived inside the body from the carried step
        counter, so the parameter trajectory is IDENTICAL to K calls of
        train_step with default rng.
        """
        model = self.model
        optimizer = self.optimizer
        trainer = self

        def body(state_tree, batch):
            batch = trainer._unpack_in_trace(batch)
            rng = jax.random.fold_in(jax.random.PRNGKey(17),
                                     state_tree['step'])

            def loss_fn(p):
                outs = model(p, batch, training=True, rng=rng)
                return outs['losses']['total_loss'], outs['losses']

            grads, losses = jax.grad(loss_fn, has_aux=True)(
                state_tree['params'])
            updates, opt_state = optimizer.update(
                grads, state_tree['opt_state'], state_tree['params'])
            params = optax.apply_updates(state_tree['params'], updates)
            return ({'params': params, 'opt_state': opt_state,
                     'step': state_tree['step'] + 1}, losses)

        def steps(state_tree, batches):
            return jax.lax.scan(body, state_tree, batches)

        return jax.jit(steps)

    def stack_batches(self, batches):
        """Stack K host batches into one device tree with a leading step
        axis (replicated) and the batch axis sharded over the mesh —
        the input layout train_steps expects."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        keys = [k for k in batches[0] if k != 'filename']
        stacked = {k: np.stack([np.asarray(b[k]) for b in batches])
                   for k in keys}
        axis = self.mesh.axis_names[0]
        sharding = NamedSharding(self.mesh, P(None, axis))
        return {k: jax.device_put(v, sharding) for k, v in stacked.items()}

    def train_steps(self, state: TrainState, batches
                    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        """Run len(batches) optimization steps in a single dispatch.

        ``batches``: a list of host batch dicts, or a pre-stacked device
        tree from stack_batches (leading axis = step). Returned losses are
        stacked device arrays of shape (K,). The delayed NaN guard treats
        the whole block as one entry: on a non-finite loss anywhere in the
        block, NanLossError carries the state from before the BLOCK (the
        crashed_iter granularity coarsens from 1 step to K steps).
        """
        if self._train_steps_scan is None:
            self._train_steps_scan = self._build_train_steps_scan()
        if isinstance(batches, (list, tuple)):
            batches = self.stack_batches(batches)
        new_tree, losses = self._train_steps_scan(state.tree(), batches)
        if len(self._pending_guard) >= self.nan_check_interval:
            self.check_pending()
        self._pending_guard.append((losses, state))
        return TrainState.from_tree(new_tree), losses

    def _build_eval_step(self):
        model = self.model

        def eval_step(params, batch, rng):
            outs = model(params, batch, training=True, rng=rng)
            return outs['losses'], outs['audio_synth']

        return jax.jit(eval_step)

    def check_pending(self):
        """Flush the delayed NaN guard: materialize every pending step's
        losses (oldest first) and raise NanLossError — carrying the state
        from just before the first non-finite step — if any is bad. Called
        automatically by train_step every nan_check_interval steps, and
        unconditionally by validation_step and save."""
        if not self._pending_guard:
            return
        pending, self._pending_guard = self._pending_guard, []
        # Start all host copies before blocking on any: through a relayed
        # chip each blocking device_get is a full round-trip, so serial
        # fetches would cost len(pending) RTTs instead of ~one.
        for losses, _ in pending:
            for v in losses.values():
                if isinstance(v, jax.Array):
                    v.copy_to_host_async()
        for losses, pre_state in pending:
            vals = jax.device_get(losses)
            for k, v in vals.items():
                if not np.all(np.isfinite(v)):
                    raise NanLossError(
                        f"Nan loss at step {int(pre_state.step)} "
                        f"with loss {k}", state=pre_state)

    def train_step(self, state: TrainState, batch,
                   rng: Optional[jax.Array] = None
                   ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        """One optimization step.

        The NaN guard (reference train_single_phase.py:185-187) is checked
        with a delay of up to nan_check_interval steps: blocking on each
        step's loss would stall JAX's async dispatch and, through a relayed
        chip, cost a ~30 ms round-trip per step. Training still halts
        within nan_check_interval steps of a non-finite loss and the
        raised NanLossError carries the last finite state for the
        crashed_iter checkpoint. Returned losses are device scalars;
        convert with float() only when needed (each conversion syncs).
        """
        if self._train_step is None:
            self._train_step = self._build_train_step()
        if rng is None:
            # fold_in with the device step scalar: stays async (an int()
            # here would block on the previous step every call).
            rng = jax.random.fold_in(jax.random.PRNGKey(17), state.step)
        if isinstance(batch, dict):
            batch = self.distribute_batch(batch)
        new_tree, losses = self._train_step(state.tree(), batch, rng)
        if len(self._pending_guard) >= self.nan_check_interval:
            # Drain BEFORE appending this step's guard: the drained steps
            # have all finished by now (the in-flight step stays unchecked),
            # so the host never blocks on live device work.
            self.check_pending()
        self._pending_guard.append((losses, state))
        return TrainState.from_tree(new_tree), losses

    def validation_step(self, state: TrainState, batch,
                        rng: Optional[jax.Array] = None, sync: bool = True):
        """Losses + synthesized audio without updating parameters.

        With sync=False, returns device values without blocking — callers
        looping over many segments (evaluate_model.py) convert to host
        floats in bulk at the end, keeping dispatch pipelined.
        """
        self.check_pending()
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        if rng is None:
            rng = jax.random.PRNGKey(0)
        batch = self.distribute_batch(batch)
        losses, audio = self._eval_step(state.params, batch, rng)
        if not sync:
            return losses, audio
        if jax.process_count() > 1:
            # audio is sharded across processes (batch axis): np.asarray on
            # a non-fully-addressable array raises, so all-gather it first.
            # Losses are replicated global scalars — float() is valid.
            from jax.experimental import multihost_utils
            audio_host = multihost_utils.process_allgather(audio, tiled=True)
        else:
            audio_host = np.asarray(audio)
        return ({k: float(v) for k, v in losses.items()}, audio_host)

    # -- checkpoints --------------------------------------------------------

    def save(self, state: TrainState, directory: str, meta=None):
        # Flush the delayed NaN guard first: never write an unchecked
        # (possibly NaN) state to disk. Raises before touching the files;
        # the raised error carries the last finite state to save instead.
        self.check_pending()
        host_state = jax.tree.map(np.asarray, state.tree())
        return checkpoints.save_checkpoint(directory, host_state,
                                           step=int(state.step), meta=meta)

    def restore(self, state: TrainState, path_or_dir: str) -> TrainState:
        host_state = jax.tree.map(np.asarray, state.tree())
        restored = checkpoints.restore_checkpoint(path_or_dir, host_state)
        if restored['opt_state'] is None:
            # Cross-phase restore: the optimizer pytree depends on the
            # phase's trainable mask, so a phase-1 checkpoint cannot carry
            # its Adam state into a phase-2 trainer. Fresh moments match
            # the reference recipe's behavior of newly-unfrozen modules.
            import logging
            logging.getLogger(__name__).warning(
                "Optimizer state structure changed (training-phase switch?)"
                " - reinitializing optimizer moments.")
            restored['opt_state'] = self.optimizer.init(restored['params'])
        return self.distribute_state(TrainState.from_tree(restored))

    def restore_tf(self, state: TrainState, ckpt_path: str) -> TrainState:
        params, _ = checkpoints.import_tf_weights(self.model, state.params,
                                                  ckpt_path)
        return self.state_with_params(state, params)

