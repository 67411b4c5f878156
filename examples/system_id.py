"""LGSSM system identification on simulated rockets — the reference's
`kvae/kalman/test_optim.py` demo (fit A,B,C by ELBO gradient ascent, then
track / impute a gap / generate new trajectories), rebuilt TPU-first: the
whole 150-epoch Adam fit runs as ONE jitted XLA program (`lax.scan` over
epochs, kvae_tpu.ops.sysid.fit_lgssm), and the 50-sample Monte-Carlo
generation is a single vmapped rollout rather than a host loop.

Produces, in --out (default runs/sysid):
  sysid_loss.png        −ELBO training curve
  sysid_tracking.png    altitude: truth / observations / KF / RTS ±1σ
  sysid_gap.png         gap imputation via posterior-warmup rollout
  sysid_generation.png  MC free-run generation mean ±1σ vs a fresh rocket

Usage:
    python examples/system_id.py [--batch 2048] [--T 100] [--epochs 150]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

try:  # allow running from a checkout without installing
    import kvae_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from kvae_tpu.data.rocket import rocket_true_matrices, simulate_rocket_batch
from kvae_tpu.ops.lgssm import LGSSMParams, lgssm_generate, lgssm_smooth
from kvae_tpu.ops.sysid import FittedDynamics, broadcast_dynamics, fit_lgssm


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--T", type=int, default=100)
    ap.add_argument("--dt", type=float, default=0.1)
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--std-dyn", type=float, default=0.5)
    ap.add_argument("--std-meas", type=float, default=4.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=Path, default=Path("runs/sysid"))
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    args.out.mkdir(parents=True, exist_ok=True)
    t_axis = np.arange(args.T) * args.dt

    y_np, u_np, x_np = simulate_rocket_batch(
        args.batch, args.T, args.dt, args.std_dyn, args.std_meas, seed=args.seed
    )
    y, u = jnp.asarray(y_np), jnp.asarray(u_np)
    params = LGSSMParams(
        mu0=jnp.zeros(2),
        sigma0=jnp.eye(2) * 4.0,
        R=jnp.eye(1) * args.std_meas**2,
        Q=jnp.eye(2) * args.std_dyn**2,
    )

    # reference-style init (test_optim.py:86-92): C in the measurement gauge
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(args.seed + 1), 3)
    init = FittedDynamics(
        A=jnp.eye(2) + 0.1 * jax.random.normal(k1, (2, 2)),
        B=0.1 * jax.random.normal(k2, (2, 1)),
        C=jnp.asarray([[1.0, 0.0]]) + 0.1 * jax.random.normal(k3, (1, 2)),
    )

    t0 = time.time()
    theta, losses = fit_lgssm(
        jax.random.PRNGKey(args.seed + 2), y, u, params, init,
        epochs=args.epochs, lr=args.lr,
        # cap single-dispatch length: multi-minute single-program executions
        # can trip watchdogs on tunneled TPU backends
        epochs_per_dispatch=150,
    )
    losses = np.asarray(losses)
    print(
        f"fit: {args.epochs} epochs on B={args.batch} T={args.T} in "
        f"{time.time() - t0:.1f}s (fused lax.scan programs); "
        f"-ELBO {losses[0]:.3f} -> {losses[-1]:.3f}"
    )
    A_t, B_t, C_t = rocket_true_matrices(args.dt)
    print("fitted A:\n", np.asarray(theta.A).round(3), "\ntrue A:\n", A_t)
    print("fitted B:", np.asarray(theta.B).ravel().round(3), " true B:", B_t.ravel())
    print("fitted C:", np.asarray(theta.C).ravel().round(3), " true C:", C_t.ravel())

    fig, ax = plt.subplots(figsize=(5, 3))
    ax.plot(losses)
    ax.set_xlabel("epoch"), ax.set_ylabel("-ELBO / frame"), ax.grid(True)
    fig.tight_layout(), fig.savefig(args.out / "sysid_loss.png", dpi=150)

    # --- tracking plot + MSE (reference test_optim.py:136-188) -------------
    dyn = broadcast_dynamics(theta, args.batch, args.T, params.Q)
    sr = jax.jit(lambda y, u: lgssm_smooth(y, u, None, params, dynamics=dyn))(y, u)
    fr = sr.filter_result
    yh_f = np.asarray(jnp.einsum("btpn,btn->btp", fr.C, fr.mu_filt))[..., 0]
    yh_s = np.asarray(jnp.einsum("btpn,btn->btp", fr.C, sr.mu_smooth))[..., 0]
    c0 = np.asarray(fr.C)[:, :, 0, :]
    std_f = np.sqrt(np.einsum("bti,btij,btj->bt", c0, np.asarray(fr.sigma_filt), c0))
    std_s = np.sqrt(np.einsum("bti,btij,btj->bt", c0, np.asarray(sr.sigma_smooth), c0))
    mse_f = float(np.mean((yh_f - x_np[..., 0]) ** 2))
    mse_s = float(np.mean((yh_s - x_np[..., 0]) ** 2))
    print(
        f"altitude tracking MSE: filter {mse_f:.3f}, smoother {mse_s:.3f} "
        f"(observation noise floor {args.std_meas**2:.1f})"
    )

    b = 0
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(t_axis, x_np[b, :, 0], "k--", label="true altitude")
    ax.scatter(t_axis, y_np[b, :, 0], marker="x", alpha=0.4, label="observations")
    ax.plot(t_axis, yh_f[b], color="tab:orange", label="KF")
    ax.fill_between(t_axis, yh_f[b] - std_f[b], yh_f[b] + std_f[b], alpha=0.2, color="tab:orange")
    ax.plot(t_axis, yh_s[b], color="tab:red", label="RTS")
    ax.fill_between(t_axis, yh_s[b] - std_s[b], yh_s[b] + std_s[b], alpha=0.2, color="tab:red")
    ax.set_xlabel("time [s]"), ax.set_ylabel("altitude [m]"), ax.legend(), ax.grid(True)
    fig.tight_layout(), fig.savefig(args.out / "sysid_tracking.png", dpi=150)

    # --- gap imputation: warm up on the observed prefix, free-run the gap
    # (reference test_optim.py:190-238 via the restored generate_sample) ----
    gap_start, gap_end = args.T // 3, 2 * args.T // 3
    zs, a_gen = lgssm_generate(
        jax.random.PRNGKey(7),
        fr.mu_filt[:, gap_start - 1],
        fr.sigma_filt[:, gap_start - 1],
        fr.A[:, gap_start:], fr.B[:, gap_start:], fr.C[:, gap_start:], fr.Q[:, gap_start:],
        u[:, gap_start:],
        deterministic=True,
    )
    a_gen = np.asarray(a_gen)[..., 0]
    gap_mse = float(
        np.mean((a_gen[:, : gap_end - gap_start] - x_np[:, gap_start:gap_end, 0]) ** 2)
    )
    print(f"gap rollout MSE over hidden frames [{gap_start},{gap_end}): {gap_mse:.3f}")

    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(t_axis, x_np[b, :, 0], "k--", label="true altitude")
    obs = np.ones(args.T, bool)
    obs[gap_start:gap_end] = False
    ax.scatter(t_axis[obs], y_np[b, obs, 0], marker="x", alpha=0.5, label="observed")
    ax.plot(t_axis[gap_start:], a_gen[b], color="tab:red", label="free-run from filter posterior")
    ax.axvspan(t_axis[gap_start], t_axis[gap_end - 1], color="grey", alpha=0.15, label="gap")
    ax.set_xlabel("time [s]"), ax.set_ylabel("altitude [m]"), ax.legend(), ax.grid(True)
    fig.tight_layout(), fig.savefig(args.out / "sysid_gap.png", dpi=150)

    # --- Monte-Carlo generation of a brand-new trajectory: one vmapped
    # rollout over 50 chains (reference loops n_mc times on the host) -------
    n_mc = 50
    y2, u2, x2 = simulate_rocket_batch(
        1, args.T, args.dt, args.std_dyn, args.std_meas, seed=args.seed + 100
    )
    u_mc = jnp.broadcast_to(jnp.asarray(u2), (n_mc, args.T, 1))
    dyn_mc = broadcast_dynamics(theta, n_mc, args.T, params.Q)
    mu0_mc = jnp.broadcast_to(params.mu0, (n_mc, 2))
    sig0_mc = jnp.broadcast_to(params.sigma0, (n_mc, 2, 2))
    _, a_mc = lgssm_generate(
        jax.random.PRNGKey(11), mu0_mc, sig0_mc,
        dyn_mc.A, dyn_mc.B, dyn_mc.C, dyn_mc.Q, u_mc,
        R=params.R, deterministic=False,
    )
    a_mc = np.asarray(a_mc)[..., 0]
    mean_y, std_y = a_mc.mean(0), a_mc.std(0)

    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(t_axis, x2[0, :, 0], "k--", label="true altitude (new rocket)")
    ax.plot(t_axis, mean_y, color="tab:purple", label=f"generated mean ({n_mc} MC)")
    ax.fill_between(t_axis, mean_y - std_y, mean_y + std_y, alpha=0.2, color="tab:purple")
    ax.set_xlabel("time [s]"), ax.set_ylabel("altitude [m]"), ax.legend(), ax.grid(True)
    fig.tight_layout(), fig.savefig(args.out / "sysid_generation.png", dpi=150)

    print(f"figures written to {args.out}/")


if __name__ == "__main__":
    main()
