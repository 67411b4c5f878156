"""Headless evaluation of a trained run — the reference's notebooks
(kvae_evaluate / kvae_metrics / kvae_skvae_comparison_metrics) as a script.

Reproduces: full-observation ELBOs, planning-mask imputation MSEs,
FoIP-vs-dropout-rate sweep, one-step prediction test, free-run generation,
and (optionally) trajectory-overlay plots.

Usage:
    python examples/evaluate.py --run runs/<ts> [--config configs/kvae_ball.yaml]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import jax
import numpy as np

try:  # allow running from a checkout without installing
    import kvae_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    from kvae_tpu.utils.platform import apply_env_platform

    apply_env_platform()

    p = argparse.ArgumentParser()
    p.add_argument("--run", required=True, help="runs/<ts> directory")
    p.add_argument("--config", default=None, help="config yaml (default: the run's copy)")
    p.add_argument("--checkpoint", default="kvae-best")
    p.add_argument("--max-batches", type=int, default=8)
    p.add_argument("--plots", action="store_true")
    args = p.parse_args()

    from kvae_tpu.config import load_config
    from kvae_tpu.data.loader import build_dataloaders
    from kvae_tpu.models.kvae import KVAE
    from kvae_tpu.train.checkpoints import Checkpointer
    from kvae_tpu.train.evaluation import dropout_sweep, make_foip_step
    from kvae_tpu.train.imputation import impute_epoch, make_impute_step
    from kvae_tpu.train.state import create_train_state, make_eval_step
    from kvae_tpu.train.testing import kalman_prediction_test, make_prediction_test_step

    run_dir = Path(args.run)
    config = load_config(args.config or run_dir / "config.yaml")
    cfg, tcfg, dcfg = config["kvae"], config["training"], config["dataset"]

    train_loader, val_loader = build_dataloaders(dcfg, tcfg.batch_size, seed=tcfg.seed)
    sample = next(iter(val_loader))["images"]
    model, state, _ = create_train_state(cfg, tcfg, sample)
    ckpt = Checkpointer(run_dir / "checkpoints", 0)
    state = ckpt.restore(args.checkpoint, state)
    print(f"restored {args.checkpoint} at epoch {int(state.epoch)}")

    key = jax.random.PRNGKey(0)
    results = {}

    # full-observation ELBOs
    eval_step = make_eval_step(model, cfg, tcfg)
    key, k = jax.random.split(key)
    metrics, viz = eval_step(state, sample, k)
    results["val_loss"] = float(metrics["loss"])
    results["elbo_vae"] = float(metrics["elbo_vae_total"])
    results["elbo_kf"] = float(metrics["elbo_kf"])
    results["active_units"] = float(metrics["active_units"])

    # planning-mask imputation
    impute_step = make_impute_step(model, cfg)
    key, k = jax.random.split(key)
    imp = impute_epoch(impute_step, state, val_loader, k,
                       t_init_mask=cfg.t_init_mask, t_steps_mask=cfg.t_steps_mask)
    results["imputation"] = {k2: v for k2, v in imp.items() if k2 != "sample"}

    # FoIP dropout sweep
    key, k = jax.random.split(key)
    sweep = dropout_sweep(model, cfg, state, val_loader, k,
                          t_init_mask=cfg.t_init_mask, max_batches=args.max_batches)
    results["dropout_sweep"] = sweep

    # one-step prediction vs persistence
    pred_step = make_prediction_test_step(model)
    key, k = jax.random.split(key)
    kf_mse, naive_mse = kalman_prediction_test(pred_step, state, val_loader, k)
    results["pred_mse_kf"] = kf_mse
    results["pred_mse_naive"] = naive_mse

    # free-run generation from 4 warmup frames
    key, ks, kg = jax.random.split(key, 3)
    gen = model.apply(
        {"params": state.params}, sample[:, :4], 12,
        rngs={"sample": ks, "gumbel": kg}, method=KVAE.generate,
    )
    results["generation_finite"] = bool(np.all(np.isfinite(np.asarray(gen["x_gen"]))))

    results["checkpoint"] = args.checkpoint
    # default selection rule writes the canonical name; alternates keep
    # their own file so evaluating several rules never clobbers
    suffix = "" if args.checkpoint == "kvae-best" else f"_{args.checkpoint.removeprefix('kvae-')}"
    out_path = run_dir / f"evaluation{suffix}.json"
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2, default=float)
    print(json.dumps(results, indent=2, default=float))
    print(f"wrote {out_path}")

    if args.plots:
        from kvae_tpu.utils.plots import plot_sequence_grid, plot_state_probabilities

        fig = plot_sequence_grid(np.asarray(sample[0]), np.asarray(viz["x_recon"][0]))
        fig.savefig(run_dir / "eval_reconstruction.png", dpi=120)
        fig2 = plot_state_probabilities(np.asarray(viz["state_probs"]))
        if fig2 is not None:
            fig2.savefig(run_dir / "eval_state_probs.png", dpi=120)
        print(f"plots saved in {run_dir}")


if __name__ == "__main__":
    main()
