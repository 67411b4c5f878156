"""Attribute the scaling-config (B=128, T=100, z=8) train-step time.

The tunneled backend exposes no device-side profiler xplane (host events
only), so attribution is by ABLATION: each pipeline slice is timed as its
own fused chain (jitted `lax.scan`, one hard sync per window) on the real
chip, exactly how bench.py times the full step. Slices:

  full        the committed train step (fwd + bwd + clip + Adam)
  fwd_loss    forward_and_loss only (no grad)
  vae_grad    encoder -> decoder -> vae_loss, with grad  (conv stack)
  kf_grad     regime chain -> filter+smoother -> KF ELBO, with grad
  dyn_fwd     regime chain alone (BiGRU posterior + gumbel scan), fwd
  smooth_fwd  filter + RTS smoother alone (the Pallas engines), fwd
  elbo_fwd    KF ELBO alone (given smoothed posteriors), fwd

full - (vae_grad + kf_grad) ~ optimizer/clip + slice interaction.
Results print as one JSON line per slice, flushed immediately (a timeout
can only truncate the tail). Used for the PARITY.md breakdown table.

Chain length caveat: each timing window pays ONE hard scalar-fetch RPC
(~25-35 ms on the tunneled backend), amortized over the chain — at
--chain 20 that is a ~1.3 ms/iteration floor that swamps sub-ms slices.
The default 100 keeps the floor near 0.3 ms; read small slices as
"value minus floor".

Run: python tools/profile_scaling.py [--chain 100] [--windows 3]
"""
import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

T0 = time.perf_counter()


def log(msg):
    print(f"[prof {time.perf_counter() - T0:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=100)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--T", type=int, default=100)
    args = ap.parse_args()

    from kvae_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from kvae_tpu.config import KVAEConfig, TrainingConfig
    from kvae_tpu.models.kvae import KVAE
    from kvae_tpu.models.losses import vae_loss
    from kvae_tpu.ops.lgssm import lgssm_elbo
    from kvae_tpu.train.state import create_train_state, make_raw_train_step

    cfg = KVAEConfig(dynamics_model="switching", num_modes=3, a_dim=4,
                     z_dim=8, out_distr="bernoulli", filter_impl="auto",
                     compute_dtype="bfloat16")
    tcfg = TrainingConfig(batch_size=args.batch, T=args.T)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        (rng.uniform(size=(args.batch, args.T, 1, 32, 32)) > 0.5)
        .astype(np.float32)
    )
    log("init state...")
    model, state, tx = create_train_state(cfg, tcfg, x)
    params = state.params
    ks = jax.random.PRNGKey(1)
    kg = jax.random.PRNGKey(2)
    u = jnp.zeros((args.batch, args.T, cfg.u_dim), jnp.float32)
    ones = jnp.ones((args.batch, args.T), jnp.float32)

    def timed_chain(name, body_fn, *chain_args):
        """body_fn(carry_scalar, i) -> carry_scalar; scanned `chain` times."""
        @jax.jit
        def chain(*a):
            def body(c, i):
                return body_fn(c, i, *a), None
            c, _ = jax.lax.scan(
                body, jnp.float32(0.0), jnp.arange(args.chain)
            )
            return c

        log(f"{name}: compiling...")
        float(chain(*chain_args))
        rates = []
        for _ in range(args.windows):
            t0 = time.perf_counter()
            float(chain(*chain_args))
            rates.append((time.perf_counter() - t0) / args.chain * 1000.0)
        ms = sorted(rates)[len(rates) // 2]
        print(json.dumps({"slice": name, "ms": round(ms, 3)}), flush=True)
        return ms

    # ---- full train step (state threaded through the scan, as bench.py) ----
    raw = make_raw_train_step(model, cfg, tcfg, tx)

    @jax.jit
    def full_chain(state, x):
        def body(st, _):
            st, metrics = raw(st, x, "all")
            return st, metrics["loss"]
        st, losses = jax.lax.scan(body, state, None, length=args.chain)
        return st, losses[-1]

    log("full: compiling...")
    state2, last = full_chain(state, x)
    float(last)
    rates = []
    for _ in range(args.windows):
        t0 = time.perf_counter()
        _, last = full_chain(state, x)
        float(last)
        rates.append((time.perf_counter() - t0) / args.chain * 1000.0)
    ms_full = sorted(rates)[len(rates) // 2]
    print(json.dumps({"slice": "full", "ms": round(ms_full, 3)}), flush=True)

    # ---- forward + loss, no grad ----
    def fwd_body(c, i, params, x):
        losses, _ = model.apply(
            {"params": params}, x, tau=jnp.float32(1.0),
            rngs={"sample": jax.random.fold_in(ks, i),
                  "gumbel": jax.random.fold_in(kg, i)},
            method=KVAE.forward_and_loss,
        )
        return c + losses["loss"]

    timed_chain("fwd_loss", fwd_body, params, x)

    # ---- VAE path (conv stack), with grad ----
    def vae_probe(m, x, key):
        a, mu, var = m.encode_sequence(x)
        logits = m.decode_sequence(a)
        elbo, _, _ = vae_loss(
            x, logits, jnp.asarray(cfg.noise_pixel_var, x.dtype), a, mu, var,
            scale_reconstruction=cfg.scale_reconstruction,
            beta=1.0, mask=None, out_distr=cfg.out_distr,
        )
        return elbo

    def vae_grad_body(c, i, params, x):
        def loss_fn(p):
            return model.apply(
                {"params": p}, x, jax.random.fold_in(ks, i),
                rngs={"sample": jax.random.fold_in(ks, i)},
                method=vae_probe,
            )
        g = jax.grad(loss_fn)(params)
        # consume EVERY grad leaf — reading only one lets XLA dead-code-
        # eliminate the rest of the backward and under-time the slice
        return c + sum(jnp.sum(l) for l in jax.tree.leaves(g))

    ms_vae = timed_chain("vae_grad", vae_grad_body, params, x)

    def vae_fwd_body(c, i, params, x):
        return c + model.apply(
            {"params": params}, x, jax.random.fold_in(ks, i),
            rngs={"sample": jax.random.fold_in(ks, i)}, method=vae_probe,
        )

    timed_chain("vae_fwd", vae_fwd_body, params, x)

    # precompute encoder latents once (numeric input for the KF slices)
    a_num = model.apply(
        {"params": params}, x, rngs={"sample": ks},
        method=lambda m, x, *a: m.encode_sequence(x)[0],
    )

    # ---- KF path (dynamics + smoother + ELBO), with grad ----
    def kf_probe(m, a, key_g, key_s):
        p = m.lgssm_params
        dyn, log_q, log_p, _ = m.dynamics(
            a, tau=jnp.float32(1.0), hard=False, rng=key_g
        )
        sr = m._smooth_seq(a, u, ones, p, dyn)
        return lgssm_elbo(key_s, sr, a, u, p, mask=ones,
                          log_q_extra=log_q, log_p_extra=log_p)

    def kf_grad_body(c, i, params, a):
        def loss_fn(p):
            return model.apply(
                {"params": p}, a, jax.random.fold_in(kg, i),
                jax.random.fold_in(ks, i), method=kf_probe,
            )
        g = jax.grad(loss_fn)(params)
        return c + sum(jnp.sum(l) for l in jax.tree.leaves(g))

    ms_kf = timed_chain("kf_grad", kf_grad_body, params, a_num)

    print(json.dumps({
        "slice": "optimizer+interaction",
        "ms": round(ms_full - ms_vae - ms_kf, 3),
        "note": "full - vae_grad - kf_grad",
    }), flush=True)

    # ---- regime chain alone, fwd ----
    def dyn_body(c, i, params, a):
        def probe(m, a, key_g):
            dyn, log_q, log_p, _ = m.dynamics(
                a, tau=jnp.float32(1.0), hard=False, rng=key_g
            )
            return (jnp.sum(dyn.A) + jnp.sum(dyn.B) + jnp.sum(dyn.C)
                    + jnp.sum(dyn.Q) + jnp.sum(log_q) + jnp.sum(log_p))
        return c + model.apply(
            {"params": params}, a, jax.random.fold_in(kg, i), method=probe
        )

    timed_chain("dyn_fwd", dyn_body, params, a_num)

    # ---- filter + smoother alone, fwd (numeric dynamics) ----
    dyn_num, log_q_num, log_p_num, _ = model.apply(
        {"params": params}, method=lambda m: m.dynamics(
            a_num, tau=jnp.float32(1.0), hard=False, rng=kg
        ),
    )

    def smooth_body(c, i, params, a, dyn):
        def probe(m, a, dyn):
            sr = m._smooth_seq(a + 0.0 * c, u, ones, m.lgssm_params, dyn)
            return jnp.sum(sr.mu_smooth) + jnp.sum(sr.sigma_smooth[:, -1])
        return c + model.apply({"params": params}, a, dyn, method=probe)

    timed_chain("smooth_fwd", smooth_body, params, a_num, dyn_num)

    def smooth_grad_body(c, i, params, a, dyn):
        def loss_fn(args):
            a_in, dyn_in = args
            def probe(m, a, dyn):
                sr = m._smooth_seq(a, u, ones, m.lgssm_params, dyn)
                return jnp.sum(sr.mu_smooth) + jnp.sum(sr.sigma_smooth)
            return model.apply({"params": params}, a_in, dyn_in, method=probe)
        g = jax.grad(loss_fn)((a + 0.0 * c, dyn))
        return c + sum(jnp.sum(l) for l in jax.tree.leaves(g))

    timed_chain("smooth_grad", smooth_grad_body, params, a_num, dyn_num)

    # ---- ELBO alone, fwd (numeric smoothed posteriors) ----
    sr_num = model.apply(
        {"params": params},
        method=lambda m: m._smooth_seq(a_num, u, ones, m.lgssm_params, dyn_num),
    )

    def elbo_body(c, i, params, a, sr):
        def probe(m, a, sr):
            return lgssm_elbo(
                jax.random.fold_in(ks, i), sr, a, u, m.lgssm_params,
                mask=ones, log_q_extra=log_q_num, log_p_extra=log_p_num,
            )
        return c + model.apply({"params": params}, a, sr, method=probe)

    timed_chain("elbo_fwd", elbo_body, params, a_num, sr_num)

    def elbo_grad_body(c, i, params, a, sr):
        def loss_fn(args):
            a_in, sr_in = args
            def probe(m, a, sr):
                return lgssm_elbo(
                    jax.random.fold_in(ks, i), sr, a, u, m.lgssm_params,
                    mask=ones, log_q_extra=log_q_num, log_p_extra=log_p_num,
                )
            return model.apply({"params": params}, a_in, sr_in, method=probe)
        g = jax.grad(loss_fn)((a + 0.0 * c, sr))
        return c + sum(jnp.sum(l) for l in jax.tree.leaves(g))

    timed_chain("elbo_grad", elbo_grad_body, params, a_num, sr_num)
    log("done")


if __name__ == "__main__":
    main()
