"""Orbax async checkpointing with best-val tracking and restore-and-continue.

Beyond-parity by design (SURVEY.md §5): the reference Checkpointer
(kvae/train/utils.py:165-209) saves `kvae-best.pt` + periodic epoch
checkpoints but has NO resume path in its trainer. Here the full TrainState
(params, optimizer moments, RNG key, epoch/step/schedule position, best-val)
round-trips through orbax, enabling preemption-safe resume — standard TPU
practice.

Saves are ASYNC: orbax's StandardCheckpointer copies device arrays to host
synchronously (so donated/overwritten device buffers are safe the moment
`save()` returns) and writes to disk on a background thread; training
resumes immediately. A new save first drains any in-flight one, and
`close()` drains at shutdown. Preemption: the trainer installs a SIGTERM
handler (see loop.py) that finishes the epoch, writes `kvae-latest`
synchronously, and exits — `--resume <run>/checkpoints/kvae-latest`
continues bit-exact.
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import jax
import orbax.checkpoint as ocp

from kvae_tpu.train.state import TrainState

logger = logging.getLogger("kvae_tpu")


class Checkpointer:
    def __init__(self, checkpoint_dir: Path, ckpt_every: int = 5):
        self.dir = Path(checkpoint_dir).resolve()
        self.dir.mkdir(parents=True, exist_ok=True)
        self.ckpt_every = ckpt_every
        self.best_val = float("inf")
        self.best_impute = float("inf")
        self.best_pred = float("inf")
        self._ckptr = ocp.StandardCheckpointer()

    def save_checkpoints(self, train_loss: float, val_loss: float, state: TrainState, epoch: int):
        """Best-on-val + periodic (reference utils.py:187-203 semantics)."""
        if val_loss < self.best_val:
            self.best_val = val_loss
            self._save(self.dir / "kvae-best", state)
        if self.ckpt_every > 0 and epoch % self.ckpt_every == 0:
            self._save(self.dir / f"kvae-ckpt-epoch_{epoch:03d}", state)

    def save_impute_best(self, impute_mse: float, state: TrainState, epoch: int):
        """Best-on-val-IMPUTATION checkpoint (`kvae-best-impute`): model
        selection on the task metric instead of the ELBO — the ELBO can
        prefer dynamics-dead basins whose imputation is mediocre (the
        multi-seed study in PARITY.md). Only written when the trainer
        computes the periodic imputation eval (add_imputation_plots)."""
        if impute_mse < self.best_impute:
            self.best_impute = impute_mse
            self._save(self.dir / "kvae-best-impute", state)

    def save_pred_best(
        self, impute_mse: float, pred_beats_naive: bool,
        state: TrainState, epoch: int,
    ):
        """`kvae-best-pred`: best val-imputation checkpoint RESTRICTED to
        epochs whose one-step latent prediction beats the persistence
        baseline. Late KVAE training trades predictive dynamics for
        imputation (both here and in the reference on identical data,
        PARITY.md) — this rule ships a checkpoint where the dynamics still
        predict, at a bounded imputation cost."""
        if pred_beats_naive and impute_mse < self.best_pred:
            self.best_pred = impute_mse
            self._save(self.dir / "kvae-best-pred", state)

    def save_latest(self, state: TrainState, wait: bool = False):
        """Preemption-safe rolling checkpoint. `wait=True` blocks until the
        bytes are on disk (used on the SIGTERM path, where the process exits
        right after)."""
        self._save(self.dir / "kvae-latest", state, wait=wait)

    def _save(self, path: Path, state: TrainState, wait: bool = False):
        # Drain any in-flight async save first (orbax requires one commit at
        # a time per checkpointer); the device->host copy below is the only
        # synchronous part of the new save.
        self._ckptr.wait_until_finished()
        self._ckptr.save(path, state, force=True)
        if wait:
            self._ckptr.wait_until_finished()
        logger.info(f"Saving checkpoint to {path}" + (" (sync)" if wait else " (async)"))

    def close(self):
        """Drain in-flight saves; call once when training ends."""
        self._ckptr.wait_until_finished()

    def restore(self, name: str, target: TrainState) -> TrainState:
        """Restore by checkpoint name ('kvae-best', 'kvae-latest', ...) using
        `target`'s structure/shardings as the abstract template."""
        self._ckptr.wait_until_finished()  # don't read a half-written save
        return restore_train_state(self.dir / name, target)

    def seed_from_state(self, state: TrainState):
        """Initialize the best-so-far trackers from a restored TrainState so
        a resumed (e.g. post-preemption) run can never overwrite kvae-best /
        kvae-best-impute with a checkpoint worse than the pre-restart best."""
        self.best_val = float(state.best_val)
        self.best_impute = float(state.best_impute)
        self.best_pred = float(state.best_pred)


def restore_train_state(checkpoint_path: str | Path, target: TrainState) -> TrainState:
    """Restore a TrainState from an explicit orbax checkpoint directory.

    Tolerates checkpoints written before a scalar bookkeeping field existed
    (e.g. pre-round-4 checkpoints without `best_impute`): missing fields keep
    the target's initial value. A template-free restore is NOT structure-safe
    for that case (orbax returns opt_state as raw lists/dicts that cannot be
    tree-mapped onto optax's NamedTuple pytree), so the fallback instead
    builds a structure-correct template holding only the top-level fields
    that exist on disk — orbax keys dataclass fields and dict entries by the
    same name — restores with it, and fills the rest from the fresh target.
    Regression-gated by tests/test_train.py::test_restore_old_format_checkpoint.
    """
    ckptr = ocp.StandardCheckpointer()
    path = Path(checkpoint_path).resolve()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
    try:
        return ckptr.restore(path, abstract)
    except Exception:
        field_names = list(type(target).__dataclass_fields__)
        # Template-free read ONLY to discover the on-disk top-level key set
        # (its leaf containers are structure-mangled; values are discarded).
        raw = ckptr.restore(path)
        partial_template = {
            name: jax.tree.map(
                ocp.utils.to_shape_dtype_struct, getattr(target, name)
            )
            for name in field_names
            if name in raw
        }
        restored = ckptr.restore(path, partial_template)
        fields = {}
        for name in field_names:
            if name in restored:
                fields[name] = restored[name]
            else:
                logger.warning(
                    f"checkpoint {path} has no '{name}' field (older format); "
                    "keeping the fresh-state value"
                )
                fields[name] = getattr(target, name)
        return type(target)(**fields)


def warm_start_vae(checkpoint_path: str | Path, state: TrainState) -> TrainState:
    """Initialize ONLY the encoder/decoder params from another run's orbax
    checkpoint — the reference's pretrain-VAE -> load-into-KVAE flow
    (kvae/vae/weights.py:13-70), for checkpoints produced by THIS framework
    (train_vae.py or any KVAE run). Restores the raw tree (no template), so
    the source run may differ in dynamics model / optimizer — only the
    encoder/decoder subtrees must match the target architecture."""
    ckptr = ocp.StandardCheckpointer()
    raw = ckptr.restore(Path(checkpoint_path).resolve())
    src = raw["params"] if "params" in raw else raw
    new_params = dict(state.params)
    for name in ("encoder", "decoder"):
        if name not in src:
            raise KeyError(
                f"no '{name}' subtree in {checkpoint_path} "
                f"(found: {sorted(src.keys())})"
            )

        def check(tgt, got, _name=name):
            if tgt.shape != got.shape:
                raise ValueError(
                    f"warm-start shape mismatch in '{_name}': "
                    f"{got.shape} vs expected {tgt.shape} — encoder/decoder "
                    f"architecture must match the checkpoint's"
                )
            return jax.numpy.asarray(got, tgt.dtype)

        new_params[name] = jax.tree.map(check, state.params[name], src[name])
        n = sum(x.size for x in jax.tree.leaves(new_params[name]))
        logger.info(f"warm-started '{name}' from {checkpoint_path} ({n} params)")
    return state.replace(params=type(state.params)(new_params))
