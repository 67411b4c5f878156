"""KVAE: the composed Kalman Variational Auto-Encoder.

Composition parity with reference kvae/model/model.py:11-301:
  encoder -> reparameterize -> (dynamics net + Kalman smoother) -> decoder,
  losses = vae_weight * vae_elbo + kf_weight * kf_elbo (negated), and the
  masked-frame imputation path a_hat = C_t z_t decoded from smoothed/filtered
  states (model.py:243-301).

TPU-native differences (by design, not omission):
  - One flax module; `__call__`/`loss`/`impute` are pure and jit the whole
    stack (encode, regime chain, filter+smoother scans, decode, ELBOs) into a
    single XLA program — no per-batch host syncs (the reference syncs on
    `.item()` every batch, model.py:239-240).
  - RNG is explicit: streams 'sample' (encoder reparameterization + KF ELBO
    rsample) and 'gumbel' (regime chain).
  - beta / tau arrive as traced scalars from schedule state, so annealing
    never recompiles.
  - `generate` restores the rollout capability the reference lost
    (see ops/lgssm.py::lgssm_generate).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from kvae_tpu.ops.precision import einsum
from flax import linen as nn

from kvae_tpu.config import KVAEConfig
from kvae_tpu.models.dynamics import LSTMAlphaDynamics, SwitchingDynamics
from kvae_tpu.models.losses import count_active_units, vae_loss
from kvae_tpu.models.vae import Decoder, Encoder, reparameterize
from kvae_tpu.ops.lgssm import (
    LGSSMParams,
    filter_step,
    lgssm_elbo,
    lgssm_generate,
    lgssm_smooth,
)


class KVAE(nn.Module):
    config: KVAEConfig
    # For filter_impl="seqpar": the (data x time) mesh and axis names the
    # smoother shards over. Static module fields — hashing/retracing safe.
    seq_mesh: Optional[object] = None       # jax.sharding.Mesh
    seq_time_axis: str = "time"
    seq_batch_axis: Optional[str] = None

    def setup(self):
        cfg = self.config
        self.encoder = Encoder(cfg)
        self.decoder = Decoder(cfg)
        kind = cfg.dynamics_model.lower()
        if kind == "switching":
            self.dynamics = SwitchingDynamics(
                K=cfg.num_modes, n=cfg.z_dim, m=cfg.u_dim, p=cfg.a_dim,
                hidden=cfg.dynamics_hidden_dim, init_std=cfg.init_kf_matrices,
                p_stay=cfg.sticky_p_stay, noise_transition=cfg.noise_transition,
            )
        elif kind == "lstm":
            self.dynamics = LSTMAlphaDynamics(
                K=cfg.num_modes, n=cfg.z_dim, m=cfg.u_dim, p=cfg.a_dim,
                hidden=cfg.dynamics_hidden_dim, init_std=cfg.init_kf_matrices,
                alpha_bias_init=cfg.alpha_bias_init,
            )
        else:
            raise ValueError(f"Unknown dynamics model: {cfg.dynamics_model}")

    # Fixed (non-learned) LGSSM parameters — the reference registers these as
    # buffers (kalman_filter.py:22-28, model.py:71-76). Config noise values
    # are VARIANCES.
    @property
    def lgssm_params(self) -> LGSSMParams:
        cfg = self.config
        n, p = cfg.z_dim, cfg.a_dim
        return LGSSMParams(
            mu0=jnp.zeros((n,), jnp.float32),
            sigma0=jnp.eye(n, dtype=jnp.float32) * cfg.init_cov,
            R=jnp.eye(p, dtype=jnp.float32) * cfg.noise_emission,
            Q=jnp.eye(n, dtype=jnp.float32) * cfg.noise_transition,
        )

    # ------------------------------------------------------------------
    # encode / decode over sequences (reference model.py:87-131)
    # ------------------------------------------------------------------

    def encode_sequence(self, x: jax.Array):
        b, t = x.shape[:2]
        x_flat = x.reshape((-1,) + x.shape[2:])
        mu, var = self.encoder(jnp.transpose(x_flat, (0, 2, 3, 1)))
        a = reparameterize(self.make_rng("sample"), mu, var)
        unflat = lambda z: z.reshape(b, t, -1)
        return unflat(a), unflat(mu), unflat(var)

    def decode_sequence(self, a: jax.Array) -> jax.Array:
        b, t = a.shape[:2]
        out = self.decoder(a.reshape(-1, a.shape[-1]))
        out = jnp.transpose(out, (0, 3, 1, 2))  # NHWC -> NCHW
        return out.reshape((b, t) + out.shape[1:])

    def _maybe_sigmoid(self, logits: jax.Array) -> jax.Array:
        if self.config.out_distr.lower() == "bernoulli":
            return jax.nn.sigmoid(logits)
        return logits

    def _smooth_seq(self, a, u, mask, params, dyn_seq):
        """Dispatch on config.filter_impl for sequence-dynamics smoothing:
        'scan' (sequential), 'assoc' (O(log T) parallel-in-time),
        'pallas' (fused VMEM kernel filter + scan smoother),
        'pallas_adjoint' (fused forward + hand-derived backward kernels), or
        'auto' (pallas_adjoint on a TPU backend, scan elsewhere)."""
        impl = self.config.filter_impl.lower()
        if impl == "auto":
            impl = "pallas_adjoint" if jax.default_backend() == "tpu" else "scan"
            if impl == "pallas_adjoint":
                from kvae_tpu.ops.pallas_kf import fits_vmem

                cfg = self.config
                if not fits_vmem(cfg.z_dim, cfg.u_dim, cfg.a_dim):
                    # state too wide for the gridded kernels' scoped VMEM
                    # (n=16 OOMs even at chunk length 1) — auto falls back
                    # to the scan engine; an EXPLICIT pallas* request still
                    # surfaces the compile error.
                    impl = "scan"
        if impl == "assoc":
            from kvae_tpu.ops.assoc import lgssm_smooth_assoc

            return lgssm_smooth_assoc(a, u, mask, params, dynamics=dyn_seq)
        if impl == "pallas":
            from kvae_tpu.ops.pallas_kf import lgssm_smooth_pallas

            return lgssm_smooth_pallas(a, u, mask, params, dynamics=dyn_seq)
        if impl == "pallas_adjoint":
            from kvae_tpu.ops.pallas_kf_bwd import lgssm_smooth_pallas_adjoint

            return lgssm_smooth_pallas_adjoint(a, u, mask, params, dyn_seq)
        if impl == "seqpar":
            # Sequence parallelism: the smoother runs time-sharded over
            # seq_mesh (optionally also batch-sharded — 2D data x time).
            from kvae_tpu.parallel.seqpar import lgssm_smooth_seqpar

            if self.seq_mesh is None:
                raise ValueError(
                    "filter_impl='seqpar' requires KVAE(seq_mesh=...)"
                )
            return lgssm_smooth_seqpar(
                a, u, mask, params, dyn_seq, mesh=self.seq_mesh,
                axis=self.seq_time_axis, batch_axis=self.seq_batch_axis,
            )
        return lgssm_smooth(a, u, mask, params, dynamics=dyn_seq)

    # ------------------------------------------------------------------
    # forward (reference model.py:134-186)
    # ------------------------------------------------------------------

    def _scaled_lgssm_params(self, noise_scale) -> LGSSMParams:
        """LGSSM params with R and the fixed Q widened by `noise_scale` — the
        training-time noise-floor anneal (config.noise_anneal_init docstring).
        A traced scalar: annealing never recompiles. scale=1.0 (every eval /
        impute / generate / serve path) is exactly `lgssm_params`."""
        params = self.lgssm_params
        ns = jnp.asarray(noise_scale, jnp.float32)
        return LGSSMParams(
            mu0=params.mu0, sigma0=params.sigma0,
            R=params.R * ns, Q=params.Q * ns,
        )

    def __call__(
        self,
        x: jax.Array,                    # [B,T,C,H,W]
        u: Optional[jax.Array] = None,   # [B,T,u_dim]
        mask: Optional[jax.Array] = None,  # [B,T]
        tau: jax.Array | float = 1.0,
        train: bool = True,
        noise_scale: jax.Array | float = 1.0,
    ) -> Dict[str, jax.Array]:
        cfg = self.config
        b, t = x.shape[:2]
        a, a_mu, a_var = self.encode_sequence(x)
        if u is None:
            u = jnp.zeros((b, t, cfg.u_dim), dtype=x.dtype)
        unmasked = mask is None  # static: all frames observed
        if mask is None:
            mask = jnp.ones((b, t), dtype=x.dtype)

        params = self._scaled_lgssm_params(noise_scale)
        if cfg.dynamics_model.lower() == "switching":
            rng = self.make_rng("gumbel") if cfg.num_modes > 1 else None
            dyn_seq, log_q, log_p, state_probs = self.dynamics(
                a, tau=jnp.asarray(tau, jnp.float32), hard=not train, rng=rng
            )
            sr = self._smooth_seq(a, u, mask, params, dyn_seq)
        else:
            log_q = log_p = jnp.zeros((b, t), dtype=x.dtype)
            if unmasked:
                # All frames observed (the training path): the alpha-LSTM's
                # feedback input reduces to the observed sequence, so the two
                # recursions decouple — precompute per-step dynamics for the
                # whole sequence and use the fused sequence-dynamics engines
                # (LSTMAlphaDynamics.sequence docstring has the derivation).
                dyn_seq, state_probs = self.dynamics.sequence(a, params.Q)
                sr = self._smooth_seq(a, u, mask, params, dyn_seq)
            else:
                # Masked frames couple the LSTM to the filter's own masked
                # prediction feedback (reference kalman_filter.py:159,183-185)
                # — the recursions are inseparable. On the Pallas engines the
                # WHOLE coupled step (LSTM cell + alpha head + bank mixing +
                # masked Kalman update + feedback) is fused into one VMEM
                # kernel (ops/pallas_kf_lstm.py); otherwise step inside the
                # scan.
                impl = self.config.filter_impl.lower()
                if impl == "auto":
                    impl = (
                        "pallas_adjoint"
                        if jax.default_backend() == "tpu" else "scan"
                    )
                    if impl == "pallas_adjoint":
                        # Same scoped-VMEM envelope gate as _smooth_seq:
                        # 'auto' must never resolve to a kernel that cannot
                        # compile for this state width (z_dim >= 16 OOMs the
                        # gridded kernels' scoped VMEM).
                        from kvae_tpu.ops.pallas_kf import fits_vmem

                        cfg_ = self.config
                        if not fits_vmem(cfg_.z_dim, cfg_.u_dim, cfg_.a_dim):
                            impl = "scan"
                if impl in ("pallas", "pallas_adjoint") and self.dynamics.K > 1:
                    from kvae_tpu.ops.pallas_kf_lstm import (
                        MAX_BATCH,
                        fits_vmem_lstm,
                    )

                    # Both gates are silent fallbacks to the coupled scan:
                    # batch beyond the single-tile kernel, or a state width
                    # outside the kernel's probe-validated scoped-VMEM
                    # envelope (z=12/K=9 at T=100 OOMs Mosaic's stack
                    # non-monotonically in T — fits_vmem_lstm docstring).
                    fusible = b <= MAX_BATCH and fits_vmem_lstm(
                        cfg.z_dim, cfg.u_dim, cfg.a_dim, self.dynamics.K,
                    )
                else:
                    fusible = False
                if fusible:
                    from kvae_tpu.ops.pallas_kf_lstm import (
                        lgssm_smooth_lstm_pallas,
                    )

                    sr = lgssm_smooth_lstm_pallas(
                        a, u, mask, params,
                        self.dynamics.A, self.dynamics.B, self.dynamics.C,
                        self.dynamics.lstm, self.dynamics.head_w,
                        self.dynamics.head_b,
                    )
                else:
                    carry0 = self.dynamics.init_carry(b)
                    q_fixed = params.Q

                    def step(carry, y_prev):
                        return self.dynamics.step(carry, y_prev, q_fixed)

                    sr = lgssm_smooth(
                        a, u, mask, params,
                        step_dynamics=step, step_dynamics_carry=carry0,
                    )
                state_probs = sr.filter_result.aux  # alpha weights [B,T,K]

        x_logits = self.decode_sequence(a)
        fr = sr.filter_result
        return {
            "x_recon": self._maybe_sigmoid(x_logits),
            "x_logits": x_logits,
            "a_samples": a,
            "a_mu": a_mu,
            "a_var": a_var,
            "mus_smooth": sr.mu_smooth,
            "Sigmas_smooth": sr.sigma_smooth,
            "mus_filt": fr.mu_filt,
            "Sigmas_filt": fr.sigma_filt,
            "mus_pred": fr.mu_pred,
            "Sigmas_pred": fr.sigma_pred,
            "A": fr.A, "B": fr.B, "C": fr.C, "Q": fr.Q,
            "u": u,
            "state_probs": state_probs,
            "log_q_regime": log_q,
            "log_p_regime": log_p,
        }

    # ------------------------------------------------------------------
    # loss (reference model.py:189-241)
    # ------------------------------------------------------------------

    def loss(
        self,
        x: jax.Array,
        outputs: Dict[str, jax.Array],
        kf_weight: jax.Array | float = 1.0,
        vae_weight: jax.Array | float = 1.0,
        beta: jax.Array | float = 1.0,
        mask: Optional[jax.Array] = None,
        noise_scale: jax.Array | float = 1.0,
    ) -> Dict[str, jax.Array]:
        cfg = self.config
        from kvae_tpu.ops.lgssm import FilterResult, SmoothResult

        vae_elbo, recon, regularization = vae_loss(
            x, outputs["x_logits"], jnp.asarray(cfg.noise_pixel_var, x.dtype),
            outputs["a_samples"], outputs["a_mu"], outputs["a_var"],
            scale_reconstruction=cfg.scale_reconstruction,
            beta=beta, mask=mask, out_distr=cfg.out_distr,
        )

        fr = FilterResult(
            mu_filt=outputs["mus_filt"], sigma_filt=outputs["Sigmas_filt"],
            mu_pred=outputs["mus_pred"], sigma_pred=outputs["Sigmas_pred"],
            A=outputs["A"], B=outputs["B"], C=outputs["C"], Q=outputs["Q"],
            aux=None,
        )
        sr = SmoothResult(
            mu_smooth=outputs["mus_smooth"], sigma_smooth=outputs["Sigmas_smooth"],
            filter_result=fr,
        )
        elbo_params = self._scaled_lgssm_params(noise_scale)

        def one_elbo(key):
            return lgssm_elbo(
                key, sr,
                outputs["a_samples"], outputs["u"], elbo_params,
                mask=mask,
                log_q_extra=outputs["log_q_regime"],
                log_p_extra=outputs["log_p_regime"],
            )

        n_samples = int(getattr(cfg, "kf_elbo_samples", 1) or 1)
        if n_samples <= 1:
            elbo_kf = one_elbo(self.make_rng("sample"))
        else:
            # Multi-sample KF ELBO: the reference rsamples z once
            # (kalman_filter.py:348-351); averaging S reparameterized draws
            # cuts the gradient variance of the KF term (vmapped — the draws
            # share every filter/smoother intermediate).
            keys = jax.random.split(self.make_rng("sample"), n_samples)
            elbo_kf = jnp.mean(jax.vmap(one_elbo)(keys))

        elbo_total = vae_weight * vae_elbo + kf_weight * elbo_kf

        # Explicit imputation supervision (config.impute_loss_weight
        # docstring): the masked frames are excluded from every reference
        # loss term, so the smoothed bridge C_t z_t^smooth is otherwise
        # pixel-unconstrained across a training-time gap. Scored under the
        # same out_distr as the reconstruction; gradient flows through the
        # decoder AND the whole filter/smoother into the dynamics.
        recon_imp = jnp.asarray(0.0, jnp.float32)
        if cfg.impute_loss_weight > 0 and mask is not None:
            from kvae_tpu.models.losses import _bce_with_logits
            from kvae_tpu.ops.gaussian import log_gaussian

            a_imp = einsum(
                "btpn,btn->btp", outputs["C"], outputs["mus_smooth"]
            )
            logits_imp = self.decode_sequence(a_imp)
            if cfg.out_distr.lower() == "bernoulli":
                ll_frame = -jnp.sum(
                    _bce_with_logits(logits_imp, x), axis=(2, 3, 4)
                )
            else:
                ll_frame = jnp.sum(
                    log_gaussian(
                        x, logits_imp, jnp.asarray(cfg.noise_pixel_var, x.dtype)
                    ),
                    axis=(2, 3, 4),
                )
            unobs = 1.0 - mask.astype(x.dtype)
            recon_imp = jnp.sum(ll_frame * unobs) / jnp.clip(
                jnp.sum(unobs), min=1.0
            )
            # kf_weight gates it out of the VAE-pretrain phase and ramps it
            # with the dynamics; scale_reconstruction matches the recon term.
            elbo_total = elbo_total + (
                cfg.impute_loss_weight * kf_weight
                * cfg.scale_reconstruction * recon_imp
            )

        active_units, variances = count_active_units(outputs["a_mu"])
        return {
            "loss": -elbo_total,
            "elbo_total": elbo_total,
            "elbo_kf": elbo_kf,
            "elbo_vae_total": vae_elbo,
            "recon": recon,
            "recon_imp": recon_imp,
            "kl": regularization,
            "active_units": active_units,
            "latent_variances": variances,
        }

    def forward_and_loss(
        self,
        x: jax.Array,
        u: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        tau: jax.Array | float = 1.0,
        beta: jax.Array | float = 1.0,
        kf_weight: jax.Array | float = 1.0,
        vae_weight: jax.Array | float = 1.0,
        train: bool = True,
        noise_scale: jax.Array | float = 1.0,
    ):
        outputs = self(
            x, u=u, mask=mask, tau=tau, train=train, noise_scale=noise_scale
        )
        losses = self.loss(
            x, outputs, kf_weight=kf_weight, vae_weight=vae_weight,
            beta=beta, mask=mask, noise_scale=noise_scale,
        )
        return losses, outputs

    # ------------------------------------------------------------------
    # imputation (reference model.py:243-301)
    # ------------------------------------------------------------------

    def impute(
        self,
        x: jax.Array,
        mask: jax.Array,
        u: Optional[jax.Array] = None,
        tau: jax.Array | float = 1.0,
    ) -> Dict[str, jax.Array]:
        """Masked-frame imputation. The encoder still sees all pixels; the
        mask gates only the Kalman update and loss terms (reference
        semantics, SURVEY.md §3.2). Eval mode: hard gumbel."""
        outputs = self(x, u=u, mask=mask, tau=tau, train=False)
        a_vae = outputs["a_samples"]
        C_seq = outputs["C"]

        x_recon = self._maybe_sigmoid(self.decode_sequence(a_vae))
        a_imputed = einsum("btpn,btn->btp", C_seq, outputs["mus_smooth"])
        x_imputed = self._maybe_sigmoid(self.decode_sequence(a_imputed))
        a_filtered = einsum("btpn,btn->btp", C_seq, outputs["mus_filt"])
        x_filtered = self._maybe_sigmoid(self.decode_sequence(a_filtered))
        return {
            "x_recon": x_recon,
            "x_imputed": x_imputed,
            "x_filtered": x_filtered,
            "a_vae": a_vae,
            "a_imputed": a_imputed,
            "a_filtered": a_filtered,
            "state_probs": outputs["state_probs"],
        }

    # ------------------------------------------------------------------
    # generation (restored capability; reference test_optim.py:211-216)
    # ------------------------------------------------------------------

    def generate(
        self,
        x_warmup: jax.Array,              # [B,Tw,C,H,W] observed warmup frames
        gen_steps: int,
        u_gen: Optional[jax.Array] = None,  # [B,gen_steps,u_dim]
        tau: jax.Array | float = 1.0,
        deterministic: bool = True,
        closed_loop: bool = False,
    ) -> Dict[str, jax.Array]:
        """Warm up the filter posterior on observed frames, then free-run the
        LDS for `gen_steps`, decoding a_t = C z_t to frames.

        closed_loop=False (legacy): the rolled dynamics hold the last warmup
        step's (A,B,C,Q) frozen for the whole free run — a ball generated this
        way can never switch dynamics modes again (never bounce).

        closed_loop=True: the dynamics networks keep evolving exactly as the
        model class defines them without observations —
          * LSTM mode: the alpha-LSTM advances on its own prediction feedback
            a_t = C_t z_t, the same semantics the masked filter applies on
            unobserved frames (ops/lgssm.py:192-205, mirroring reference
            kvae/kalman/kalman_filter.py:183-185). With deterministic=True
            the rollout is bit-identical to running the masked filter with
            mask=0 over the generated span (gated by tests/test_models.py).
          * Switching mode: the regime chain is SAMPLED from the sticky
            generative prior p(s_t|s_{t-1}) (reference
            kvae/kalman/switch_dyn_param.py:98-110) — always sampled, even
            when deterministic=True, because the prior's argmax is the
            diagonal (p_stay > 1/K) and would freeze the regime forever.
            `deterministic` gates only the process noise on z.

        Returns {"z_gen", "a_gen", "x_gen", "state_probs_gen"} (the last is
        alpha weights / sampled regime one-hots over the generated span).
        """
        cfg = self.config
        b = x_warmup.shape[0]
        if u_gen is None:
            u_gen = jnp.zeros((b, gen_steps, cfg.u_dim), dtype=jnp.float32)

        if closed_loop:
            a_warm, _, _ = self.encode_sequence(x_warmup)
            if cfg.dynamics_model.lower() == "lstm":
                z_seq, a_seq, probs, _ = self._closed_loop_roll_lstm(
                    a_warm, u_gen, self.make_rng("sample"), deterministic
                )
            else:
                z_seq, a_seq, probs = self._closed_loop_roll_switching(
                    a_warm, u_gen, tau, deterministic
                )
            x_gen = self._maybe_sigmoid(self.decode_sequence(a_seq))
            return {
                "z_gen": z_seq, "a_gen": a_seq, "x_gen": x_gen,
                "state_probs_gen": probs,
            }

        outputs = self(x_warmup, mask=None, tau=tau, train=False)
        mu_last = outputs["mus_filt"][:, -1]
        sigma_last = outputs["Sigmas_filt"][:, -1]
        tile = lambda m: jnp.repeat(m[:, -1:], gen_steps, axis=1)
        A, Bm, C, Q = (tile(outputs[k]) for k in ("A", "B", "C", "Q"))
        z_seq, a_seq = lgssm_generate(
            self.make_rng("sample"), mu_last, sigma_last,
            A, Bm, C, Q, u_gen,
            R=self.lgssm_params.R, deterministic=deterministic,
        )
        x_gen = self._maybe_sigmoid(self.decode_sequence(a_seq))
        probs = jnp.repeat(outputs["state_probs"][:, -1:], gen_steps, axis=1)
        return {
            "z_gen": z_seq, "a_gen": a_seq, "x_gen": x_gen,
            "state_probs_gen": probs,
        }

    def _closed_loop_roll_lstm(
        self,
        a_warm: jax.Array,     # [B,Tw,p] warmup latents (encoder samples)
        u_gen: jax.Array,      # [B,S,m]
        key: jax.Array,
        deterministic: bool,
    ):
        """Coupled masked filter over the warmup (all observed, returning the
        exact filter carry), then a free-run scan in which the alpha-LSTM
        consumes its own emission feedback. With deterministic=True the
        recursion is identical to the masked filter's mask=0 path: the filter
        there sets mu_filt = mu_pred (gain zeroed) and feeds y_hat = C mu_pred
        to the LSTM — exactly this rollout with z = mu_pred."""
        cfg = self.config
        b, tw, _ = a_warm.shape
        s = u_gen.shape[1]
        params = self.lgssm_params
        q_fixed = params.Q
        u_warm = jnp.zeros((b, tw, cfg.u_dim), jnp.float32)

        def stepfn(carry, y_prev):
            return self.dynamics.step(carry, y_prev, q_fixed)

        from kvae_tpu.ops.lgssm import lgssm_filter

        fr, (mu, sigma, dyn_carry, y_fb) = lgssm_filter(
            a_warm, u_warm, None, params,
            step_dynamics=stepfn,
            step_dynamics_carry=self.dynamics.init_carry(b),
            return_carry=True,
        )

        from kvae_tpu.ops.gaussian import mvn_sample_chol, safe_cholesky

        key_z0, key_roll = jax.random.split(key)
        if deterministic:
            z0 = mu
        else:
            z0 = mvn_sample_chol(key_z0, mu, safe_cholesky(sigma))
        L_Q = jnp.linalg.cholesky(q_fixed)
        keys = jax.random.split(key_roll, s)
        u_t = jnp.swapaxes(u_gen, 0, 1)

        def roll(carry, xs):
            z, dc, fb = carry
            u_s, k = xs
            dc, (A, B, C, _, alpha) = self.dynamics.step(dc, fb, q_fixed)
            z_next = einsum("bij,bj->bi", A, z) + einsum("bij,bj->bi", B, u_s)
            if not deterministic:
                eps = jax.random.normal(k, z.shape, z.dtype)
                z_next = z_next + einsum("ij,bj->bi", L_Q, eps)
            a_t = einsum("bpn,bn->bp", C, z_next)
            return (z_next, dc, a_t), (z_next, a_t, alpha)

        _, (z_seq, a_seq, alpha_seq) = jax.lax.scan(
            roll, (z0, dyn_carry, y_fb), (u_t, keys)
        )
        swap = lambda x: jnp.swapaxes(x, 0, 1)
        return swap(z_seq), swap(a_seq), swap(alpha_seq), fr

    def _closed_loop_roll_switching(
        self,
        a_warm: jax.Array,     # [B,Tw,p]
        u_gen: jax.Array,      # [B,S,m]
        tau: jax.Array | float,
        deterministic: bool,
    ):
        """Regime-posterior warmup, then free-run with the regime chain
        sampled from the sticky generative prior p(s_t|s_{t-1})."""
        from kvae_tpu.models.dynamics import sticky_transition_matrix
        from kvae_tpu.ops.gaussian import mvn_sample_chol, safe_cholesky
        from kvae_tpu.ops.lgssm import lgssm_filter

        cfg = self.config
        b, tw, _ = a_warm.shape
        s = u_gen.shape[1]
        K = cfg.num_modes
        params = self.lgssm_params
        rng = self.make_rng("gumbel") if K > 1 else None
        dyn_seq, _, _, y_seq = self.dynamics(
            a_warm, tau=jnp.asarray(tau, jnp.float32), hard=True, rng=rng
        )
        u_warm = jnp.zeros((b, tw, cfg.u_dim), jnp.float32)
        fr = lgssm_filter(a_warm, u_warm, None, params, dynamics=dyn_seq)
        mu_last, sigma_last = fr.mu_filt[:, -1], fr.sigma_filt[:, -1]

        key = self.make_rng("sample")
        key_z0, key_roll = jax.random.split(key)
        if deterministic:
            z0 = mu_last
        else:
            z0 = mvn_sample_chol(key_z0, mu_last, safe_cholesky(sigma_last))
        trans = sticky_transition_matrix(K, cfg.sticky_p_stay)
        C0 = self.dynamics.C[0]
        keys = jax.random.split(key_roll, s)
        u_t = jnp.swapaxes(u_gen, 0, 1)
        y_prev0 = y_seq[:, -1]  # hard one-hot (eval-mode gumbel)

        def roll(carry, xs):
            z, y_prev = carry
            u_s, k = xs
            k_s, k_z = jax.random.split(k)
            # s_t ~ p(s_t | s_{t-1}): one categorical draw from the sticky row
            probs = einsum("bk,kj->bj", y_prev, trans)
            s_idx = jax.random.categorical(
                k_s, jnp.log(jnp.clip(probs, min=1e-8))
            )
            y_t = jax.nn.one_hot(s_idx, K, dtype=y_prev.dtype)
            A = einsum("bk,kij->bij", y_t, self.dynamics.A)
            Bm = einsum("bk,knm->bnm", y_t, self.dynamics.B)
            z_next = einsum("bij,bj->bi", A, z) + einsum("bij,bj->bi", Bm, u_s)
            if not deterministic:
                Q = einsum("bk,kij->bij", y_t, self.dynamics.Q)
                eps = jax.random.normal(k_z, z.shape, z.dtype)
                z_next = z_next + einsum(
                    "bij,bj->bi", safe_cholesky(Q), eps
                )
            a_t = einsum("pn,bn->bp", C0, z_next)
            return (z_next, y_t), (z_next, a_t, y_t)

        _, (z_seq, a_seq, y_gen) = jax.lax.scan(
            roll, (z0, y_prev0), (u_t, keys)
        )
        swap = lambda x: jnp.swapaxes(x, 0, 1)
        return swap(z_seq), swap(a_seq), swap(y_gen)

    # ------------------------------------------------------------------
    # streaming (online, per-frame) inference
    # ------------------------------------------------------------------

    def stream_init(self, batch: int):
        """Initial carry for `stream_step` — online per-frame filtering.

        Streaming requires CAUSAL dynamics. The LSTM-alpha network is causal
        (its input is the previous step's pseudo-observation), so
        dynamics_model="lstm" streams exactly: a stream of `stream_step`
        calls computes the same filtered posterior as the offline masked
        filter (gated by tests/test_serve.py). The switching variant's
        regime posterior is a BiGRU over the WHOLE sequence (reference
        switch_dyn_param.py:113-129) — acausal by construction — so it
        cannot stream and is rejected here.
        """
        cfg = self.config
        if cfg.dynamics_model.lower() != "lstm":
            raise ValueError(
                "streaming requires causal dynamics (dynamics_model='lstm'); "
                "the switching regime posterior is a bidirectional GRU over "
                "the whole sequence and cannot run online"
            )
        params = self.lgssm_params
        n, p = cfg.z_dim, cfg.a_dim
        mu0 = jnp.broadcast_to(params.mu0, (batch, n))
        sigma0 = jnp.broadcast_to(params.sigma0, (batch, n, n))
        dyn_carry = self.dynamics.init_carry(batch)
        y_for_dyn0 = jnp.zeros((batch, p), jnp.float32)  # reference :142
        return (mu0, sigma0, dyn_carry, y_for_dyn0)

    def stream_step(
        self,
        carry,
        frame: jax.Array,        # [B,C,H,W] the new frame (pixels may be junk
        #                          on unobserved steps — `observed` gates it)
        observed: jax.Array,     # [B] 1.0 = real measurement, 0.0 = missing
        u: Optional[jax.Array] = None,  # [B,u_dim] control input
    ):
        """One online filter step: encode the frame (deterministic encoder
        mean — no sampling on the serving path), advance the alpha-LSTM on
        the pseudo-observation feedback, run one masked predict+update, and
        decode the filtered latent. O(1) work per frame, constant carry.

        Identical semantics to one step of the offline masked filter
        (ops/lgssm.py::lgssm_filter step_dynamics path, itself mirroring
        reference kalman_filter.py:151-185): on unobserved frames the gain is
        zeroed and the dynamics net sees the filter's own prediction.

        Returns (carry', outputs) with:
          a_t        [B,p]  encoder mean of this frame
          a_filt     [B,p]  C_t mu_t|t   (online state estimate)
          x_filt     [B,C,H,W] decoded filtered frame (the online imputation)
          a_pred     [B,p]  C_t mu_t|t-1 (one-step-ahead prediction made
                            BEFORE seeing this frame)
          x_pred     [B,C,H,W] decoded prediction
          mu_filt / sigma_filt / alpha — posterior + mixture diagnostics
        """
        cfg = self.config
        b = frame.shape[0]
        params = self.lgssm_params
        eye_n = jnp.eye(cfg.z_dim, dtype=jnp.float32)
        if u is None:
            u = jnp.zeros((b, cfg.u_dim), jnp.float32)
        observed = observed.astype(jnp.float32)

        a_t, _ = self.encoder(jnp.transpose(frame, (0, 2, 3, 1)))

        mu, sigma, dyn_carry, y_for_dyn = carry
        dyn_carry, (A, B, C, Q, alpha) = self.dynamics.step(
            dyn_carry, y_for_dyn, params.Q
        )
        mu_new, sigma_new, mu_pred, _, y_hat = filter_step(
            mu, sigma, a_t, u, observed, A, B, C, Q, params.R, eye_n
        )
        m_col = observed[:, None]
        y_next = m_col * a_t + (1.0 - m_col) * y_hat

        a_filt = einsum("bpn,bn->bp", C, mu_new)
        decode1 = lambda a: self._maybe_sigmoid(
            jnp.transpose(self.decoder(a), (0, 3, 1, 2))
        )
        outputs = {
            "a_t": a_t,
            "a_filt": a_filt,
            "x_filt": decode1(a_filt),
            "a_pred": y_hat,
            "x_pred": decode1(y_hat),
            "mu_filt": mu_new,
            "sigma_filt": sigma_new,
            "alpha": alpha,
        }
        return (mu_new, sigma_new, dyn_carry, y_next), outputs
