"""Functional train state + the single-XLA-program train/eval steps.

Everything mutable in the reference trainer — model params, Adam moments,
the global torch RNG, epoch counters, beta/tau/LR schedule positions —
lives here as one explicit pytree. The train step (forward, regime chain,
filter+smoother scans, both ELBOs, grad, clip, masked Adam update) compiles
to ONE XLA program; schedules arrive as values derived from the epoch
counter inside the step, so annealing never recompiles.

Optimizer parity with the reference (kvae/train/train.py:236-242,268-269):
Adam(lr) + global-norm grad clip 10.0 + exponential LR decay
lr(e) = lr0 * decay_rate^floor((e-1)/decay_steps), weight_decay optional.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from kvae_tpu.config import KVAEConfig, TrainingConfig
from kvae_tpu.models.kvae import KVAE
from kvae_tpu.models.losses import get_beta, get_tau
from kvae_tpu.train import phases as phases_lib


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    key: jax.Array
    epoch: jax.Array          # int32, 1-indexed (current epoch)
    step: jax.Array           # int32, global step counter
    best_val: jax.Array       # float32 best validation loss so far
    best_impute: jax.Array    # float32 best val imputation MSE so far (inf
    #                           until the periodic imputation eval first runs);
    #                           persisted so a resumed run never overwrites
    #                           kvae-best-impute with a worse checkpoint
    best_pred: jax.Array      # float32 best val imputation MSE among epochs
    #                           whose one-step prediction beats persistence
    #                           (the kvae-best-pred selection rule — a
    #                           checkpoint with FUNCTIONING predictive
    #                           dynamics; late KVAE training trades prediction
    #                           for imputation, see PARITY.md)

    def advance_epoch(self) -> "TrainState":
        return self.replace(epoch=self.epoch + 1)


def make_optimizer(tcfg: TrainingConfig) -> optax.GradientTransformation:
    chain = [optax.clip_by_global_norm(tcfg.grad_clip_norm)]
    chain.append(optax.scale_by_adam())
    if tcfg.weight_decay > 0:
        chain.append(optax.add_decayed_weights(tcfg.weight_decay))
    # final scale by -lr happens in the step (lr is epoch-derived and traced)
    return optax.chain(*chain)


def lr_for_epoch(tcfg: TrainingConfig, epoch: jax.Array) -> jax.Array:
    decays = jnp.floor(
        (jnp.asarray(epoch, jnp.float32) - 1.0) / max(tcfg.decay_steps, 1)
    )
    return tcfg.lr * jnp.power(tcfg.decay_rate, jnp.clip(decays, min=0.0))


def create_train_state(
    cfg: KVAEConfig,
    tcfg: TrainingConfig,
    sample_batch: jax.Array,
    seed: Optional[int] = None,
    seq_mesh=None,
) -> Tuple[KVAE, TrainState, optax.GradientTransformation]:
    """`seq_mesh`: optional (data x time) jax.sharding.Mesh; when given the
    model's filter/smoother run time-sharded over its 'time' axis
    (filter_impl="seqpar", see parallel/seqpar.py)."""
    seed = tcfg.seed if seed is None else seed
    if seq_mesh is not None:
        model = KVAE(
            cfg, seq_mesh=seq_mesh, seq_time_axis="time", seq_batch_axis="data"
        )
    else:
        model = KVAE(cfg)
    root = jax.random.PRNGKey(seed)
    k_params, k_sample, k_gumbel, k_state = jax.random.split(root, 4)
    variables = model.init(
        {"params": k_params, "sample": k_sample, "gumbel": k_gumbel},
        sample_batch, tau=jnp.asarray(cfg.tau_init), train=True,
    )
    tx = make_optimizer(tcfg)
    state = TrainState(
        params=variables["params"],
        opt_state=tx.init(variables["params"]),
        key=k_state,
        epoch=jnp.asarray(1, jnp.int32),
        step=jnp.asarray(0, jnp.int32),
        best_val=jnp.asarray(jnp.inf, jnp.float32),
        best_impute=jnp.asarray(jnp.inf, jnp.float32),
        best_pred=jnp.asarray(jnp.inf, jnp.float32),
    )
    return model, state, tx


def _schedules(cfg: KVAEConfig, tcfg: TrainingConfig, epoch: jax.Array):
    beta = get_beta(cfg, epoch)
    tau_start = max(1, tcfg.pretrain_vae_epochs + tcfg.warmup_epochs + 1)
    tau = get_tau(cfg, epoch, tau_start)
    lr = lr_for_epoch(tcfg, epoch)
    return beta, tau, lr


def noise_scale_for_epoch(
    cfg: KVAEConfig, tcfg: TrainingConfig, epoch: jax.Array
) -> jax.Array:
    """Noise-floor anneal multiplier (config.noise_anneal_init docstring):
    held at `noise_anneal_init` through pretrain+warmup, then log-linear
    decay to 1.0 over `noise_anneal_epochs` all-phase epochs. A traced
    function of the epoch counter — annealing never recompiles."""
    if cfg.noise_anneal_init == 1.0:
        return jnp.asarray(1.0, jnp.float32)
    hold = tcfg.pretrain_vae_epochs + tcfg.warmup_epochs
    frac = (jnp.asarray(epoch, jnp.float32) - hold) / max(
        cfg.noise_anneal_epochs, 1
    )
    frac = jnp.clip(frac, 0.0, 1.0)
    return jnp.power(
        jnp.asarray(cfg.noise_anneal_init, jnp.float32), 1.0 - frac
    )


def make_train_mask(
    key: jax.Array, batch: int, T: int, steps: int, prob: float, t_min: int
) -> jax.Array:
    """Random contiguous-span mask for mask-aware training
    (training.train_mask_prob): per sequence, with probability `prob`, hide
    `steps` frames starting uniformly in [t_min, T - steps]. 1 = observed.
    Static shapes (traced values) — jit/scan safe."""
    k_start, k_use = jax.random.split(key)
    start = jax.random.randint(
        k_start, (batch,), t_min, max(T - steps + 1, t_min + 1)
    )
    t = jnp.arange(T)[None, :]
    in_span = (t >= start[:, None]) & (t < (start + steps)[:, None])
    use = jax.random.bernoulli(k_use, prob, (batch,))[:, None]
    return 1.0 - (in_span & use).astype(jnp.float32)


def make_raw_train_step(model: KVAE, cfg: KVAEConfig, tcfg: TrainingConfig, tx):
    """The un-jitted train-step function (phase static). Jitted directly by
    `make_train_step`, or scanned over a whole epoch by `make_epoch_runner`."""

    def train_step(
        state: TrainState, x: jax.Array, phase: str
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        beta, tau, lr = _schedules(cfg, tcfg, state.epoch)
        noise_scale = noise_scale_for_epoch(cfg, tcfg, state.epoch)
        kf_weight = phases_lib.kf_weight_for_phase(phase)
        if tcfg.kf_weight_ramp and phase != "vae":
            # 1/w, 2/w, ..., 1 over the warmup epochs, then held at 1 — a
            # traced scalar derived from the epoch counter, so the ramp
            # costs no recompiles (phase stays the only static argument).
            w = max(tcfg.warmup_epochs, 1)
            frac = (
                jnp.asarray(state.epoch, jnp.float32) - tcfg.pretrain_vae_epochs
            ) / w
            kf_weight = kf_weight * jnp.clip(frac, 0.0, 1.0)
        key, k_sample, k_gumbel, k_noise, k_mask = jax.random.split(state.key, 5)
        if tcfg.add_noise_std > 0:
            # `transforms: add_noise_std` — the reference's host-side
            # TransformDataset additive noise (kvae/vae/train_vae.py:241-251)
            # applied on device: fresh noise per step, train path only.
            x = x + tcfg.add_noise_std * jax.random.normal(
                k_noise, x.shape, x.dtype
            )
        if (
            tcfg.train_mask_prob > 0 and tcfg.train_mask_steps > 0
            and phase == "all"  # static with phase: no extra compile variants
        ):
            # Mask-aware training (train_mask_prob docstring): the model
            # trains in the imputation regime it will be evaluated in — but
            # only once the dynamics are past warmup. Masking from epoch 1
            # rolls 40-frame gaps through the untrained random-walk banks and
            # the first warmup kf gradient overflows f32 (measured: NaN at
            # warmup epoch 1 with mask, stable without) — curriculum order is
            # observe-then-impute.
            mask = make_train_mask(
                k_mask, x.shape[0], x.shape[1], tcfg.train_mask_steps,
                tcfg.train_mask_prob, tcfg.train_mask_t_min,
            )
            if tcfg.train_mask_end_epoch > 0:  # static; the gate is traced
                # Mask curriculum (train_mask_end_epoch docstring): fully
                # observed again after the end epoch.
                mask = jnp.where(
                    state.epoch <= tcfg.train_mask_end_epoch,
                    mask, jnp.ones_like(mask),
                )
        else:
            mask = None

        def loss_fn(params):
            losses, _ = model.apply(
                {"params": params}, x, mask=mask, tau=tau, beta=beta,
                kf_weight=kf_weight, vae_weight=1.0, train=True,
                noise_scale=noise_scale,
                rngs={"sample": k_sample, "gumbel": k_gumbel},
                method=KVAE.forward_and_loss,
            )
            return losses["loss"], losses

        grads, losses = jax.grad(loss_fn, has_aux=True)(state.params)
        mask = phases_lib.param_mask(state.params, phase)
        grads = phases_lib.apply_mask(grads, mask)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        if tcfg.dynamics_lr_mult != 1.0:
            def dyn_scale(path, u):
                top = getattr(path[0], "key", getattr(path[0], "name", ""))
                return u * tcfg.dynamics_lr_mult if top == "dynamics" else u

            updates = jax.tree_util.tree_map_with_path(dyn_scale, updates)
        updates = phases_lib.apply_mask(updates, mask)
        params = optax.apply_updates(state.params, updates)

        metrics = {
            "loss": losses["loss"],
            "elbo_kf": losses["elbo_kf"],
            "elbo_vae_total": losses["elbo_vae_total"],
            # reference tag names (posterior_collapse.ipynb reads train|val/kl_vae).
            # losses["kl"] is the ELBO regularizer E[log p(a) - log q(a|x)]
            # = -KL; the logged curve is the positive divergence.
            "kl_vae": -losses["kl"],
            "recon": losses["recon"],
            "active_units": losses["active_units"].astype(jnp.float32),
            "grad_norm": optax.global_norm(grads),
            "learning_rate": lr,
            "beta": beta,
            "tau": tau,
            "noise_scale": noise_scale,
            "recon_imp": losses["recon_imp"],
        }
        new_state = state.replace(
            params=params, opt_state=opt_state, key=key, step=state.step + 1
        )
        return new_state, metrics

    return train_step


def make_train_step(model: KVAE, cfg: KVAEConfig, tcfg: TrainingConfig, tx):
    """Build the jitted train step. `phase` is static (<=3 compilations)."""
    raw = make_raw_train_step(model, cfg, tcfg, tx)
    donate = (0,) if tcfg.donate_state else ()
    return partial(jax.jit, static_argnames=("phase",), donate_argnums=donate)(raw)


def make_epoch_runner(model: KVAE, cfg: KVAEConfig, tcfg: TrainingConfig, tx):
    """One XLA program per TRAINING EPOCH: `lax.scan` over batches, each
    gathered on device from the HBM-resident dataset by a shuffled index
    vector. Removes every per-batch host dispatch — on a dispatch-expensive
    backend (e.g. a tunneled TPU, ~1 RPC per op) the epoch rate becomes the
    step rate. The reference's epoch loop is host-side Python over a torch
    DataLoader (reference kvae/train/train.py:32-62).

    Returns epoch_run(state, images [N,...], order [n_batches*bs], phase)
    -> (state, mean-metrics dict). `order` re-uploads per epoch (tiny).
    """
    raw = make_raw_train_step(model, cfg, tcfg, tx)
    bs = tcfg.batch_size
    donate = (0,) if tcfg.donate_state else ()

    @partial(jax.jit, static_argnames=("phase",), donate_argnums=donate)
    def epoch_run(state: TrainState, images: jax.Array, order: jax.Array, phase: str):
        n_batches = order.shape[0] // bs
        # One big contiguous permute per epoch (HBM-bandwidth cheap), then
        # each step is a static-shaped slice — faster than a 32-row gather
        # from the full dataset every step.
        images_perm = jnp.take(images, order, axis=0)

        def body(carry, i):
            st = carry
            x = jax.lax.dynamic_slice_in_dim(images_perm, i * bs, bs)
            st, metrics = raw(st, x, phase)
            return st, metrics

        state, metrics_seq = jax.lax.scan(
            body, state, jnp.arange(n_batches, dtype=jnp.int32)
        )
        return state, jax.tree.map(lambda m: jnp.mean(m, axis=0), metrics_seq)

    return epoch_run


def make_eval_epoch_runner(model: KVAE, cfg: KVAEConfig, tcfg: TrainingConfig):
    """One XLA program per EVAL EPOCH (scan of eval steps over on-device
    batches); returns mean metrics plus the last batch's viz outputs."""
    bs = tcfg.batch_size

    @partial(jax.jit, static_argnames=())
    def epoch_run(state: TrainState, images: jax.Array, order: jax.Array, key: jax.Array):
        beta, tau, _ = _schedules(cfg, tcfg, state.epoch)
        noise_scale = noise_scale_for_epoch(cfg, tcfg, state.epoch)
        n_batches = order.shape[0] // bs

        def body(carry, i):
            _ = carry
            idx = jax.lax.dynamic_slice_in_dim(order, i * bs, bs)
            x = jnp.take(images, idx, axis=0)
            k_sample, k_gumbel = jax.random.split(jax.random.fold_in(key, i))
            losses, outputs = model.apply(
                {"params": state.params}, x, tau=tau, beta=beta, train=False,
                noise_scale=noise_scale,
                rngs={"sample": k_sample, "gumbel": k_gumbel},
                method=KVAE.forward_and_loss,
            )
            metrics = {
                "loss": losses["loss"],
                "elbo_kf": losses["elbo_kf"],
                "elbo_vae_total": losses["elbo_vae_total"],
                "kl_vae": -losses["kl"],
                "recon": losses["recon"],
                "active_units": losses["active_units"].astype(jnp.float32),
                "latent_var_0": losses["latent_variances"][0],
                "latent_var_1": losses["latent_variances"][min(1, cfg.a_dim - 1)],
            }
            # carry (not stack) the viz: only the last batch's survives
            viz = {
                "x": x,
                "x_recon": outputs["x_recon"],
                "state_probs": outputs["state_probs"],
            }
            return viz, metrics

        viz0 = {
            "x": jnp.zeros((bs,) + images.shape[1:], images.dtype),
            "x_recon": jnp.zeros((bs,) + images.shape[1:], images.dtype),
            "state_probs": jnp.zeros(
                (bs, images.shape[1], cfg.num_modes), jnp.float32
            ),
        }
        viz_last, metrics_seq = jax.lax.scan(
            body, viz0, jnp.arange(n_batches, dtype=jnp.int32)
        )
        metrics = jax.tree.map(lambda m: jnp.mean(m, axis=0), metrics_seq)
        return metrics, viz_last

    return epoch_run


def make_eval_step(model: KVAE, cfg: KVAEConfig, tcfg: TrainingConfig):
    """Jitted full-observation evaluation step (reference train.py:79-139)."""

    @jax.jit
    def eval_step(state: TrainState, x: jax.Array, key: jax.Array):
        beta, tau, _ = _schedules(cfg, tcfg, state.epoch)
        noise_scale = noise_scale_for_epoch(cfg, tcfg, state.epoch)
        k_sample, k_gumbel = jax.random.split(key)
        losses, outputs = model.apply(
            {"params": state.params}, x, tau=tau, beta=beta,
            train=False, noise_scale=noise_scale,
            rngs={"sample": k_sample, "gumbel": k_gumbel},
            method=KVAE.forward_and_loss,
        )
        metrics = {
            "loss": losses["loss"],
            "elbo_kf": losses["elbo_kf"],
            "elbo_vae_total": losses["elbo_vae_total"],
            "kl_vae": -losses["kl"],
            "recon": losses["recon"],
            "active_units": losses["active_units"].astype(jnp.float32),
            "latent_var_0": losses["latent_variances"][0],
            "latent_var_1": losses["latent_variances"][
                min(1, cfg.a_dim - 1)
            ],  # guard a_dim==1 (reference hard-indexes [1], model.py:240)
        }
        viz = {
            "x_recon": outputs["x_recon"],
            "state_probs": outputs["state_probs"],
        }
        return metrics, viz

    return eval_step
