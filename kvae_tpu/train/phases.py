"""Three-phase training schedule via gradient/update masks.

The reference freezes parameters by mutating `requires_grad`
(kvae/train/train.py:142-207). Functionally here: each phase maps to a 0/1
mask pytree over params; both the gradients entering the optimizer and the
final updates are masked, so frozen params neither move nor accumulate
optimizer moments. Phase semantics (reference :151-207):

  "vae":    encoder + decoder only (kf_weight = 0)
  "warmup": + dynamics banks A, B, C, Q (regime/alpha networks still frozen)
  "all":    everything

Phase is a STATIC argument of the jitted train step — at most three compiled
variants over a run.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

PHASES = ("vae", "warmup", "all")

_BANK_LEAVES = {"A", "B", "C", "Q"}


def phase_for_epoch(epoch: int, pretrain_vae_epochs: int, warmup_epochs: int) -> str:
    """Epoch (1-indexed) -> phase label (reference train.py:246-258)."""
    if epoch <= pretrain_vae_epochs:
        return "vae"
    if epoch <= pretrain_vae_epochs + warmup_epochs:
        return "warmup"
    return "all"


def kf_weight_for_phase(phase: str) -> float:
    return 0.0 if phase == "vae" else 1.0


def param_mask(params, phase: str):
    """0/1 float mask pytree matching `params` for the given phase."""
    assert phase in PHASES, phase

    def leaf_mask(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        top = keys[0] if keys else ""
        if top in ("encoder", "decoder"):
            trainable = True  # trainable in every phase
        elif top == "dynamics":
            leaf_name = keys[-1]
            if leaf_name in _BANK_LEAVES:
                trainable = phase in ("warmup", "all")
            else:
                # regime posterior / alpha-LSTM / head weights
                trainable = phase == "all"
        else:
            trainable = phase == "all"
        return jnp.full(jnp.shape(leaf), 1.0 if trainable else 0.0, jnp.float32)

    return jax.tree_util.tree_map_with_path(leaf_mask, params)


def apply_mask(tree, mask):
    return jax.tree.map(lambda t, m: t * m.astype(t.dtype), tree, mask)
