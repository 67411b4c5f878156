"""Multi-seed robustness sweep of the flagship config (PARITY.md study).

Trains the flagship config at several seeds (optionally with overrides such
as --kf-ramp / --lr), then evaluates the best-val checkpoint of each run
with the planning-mask imputation suite, and writes one JSON summary with
the per-seed numbers + median. All runs share one process, so the jitted
train/eval programs compile once and are reused across seeds (identical
shapes).

Run: python tools/seed_sweep.py --config configs/kvae_ball.yaml \
       --seeds 10 11 12 13 14 --tag ramp --kf-ramp --out /tmp/sweep
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def evaluate_run(config, runs_dir: Path) -> dict:
    """Best-checkpoint metrics (both selection rules: best-val-ELBO and, if
    present, best-val-imputation): full-obs ELBO + planning-mask imputation
    + one-step prediction vs persistence."""
    import jax

    from kvae_tpu.data.loader import build_dataloaders
    from kvae_tpu.train.checkpoints import Checkpointer
    from kvae_tpu.train.imputation import impute_epoch, make_impute_step
    from kvae_tpu.train.state import create_train_state, make_eval_step
    from kvae_tpu.train.testing import (
        kalman_prediction_test,
        make_prediction_test_step,
    )

    cfg, tcfg, dcfg = config["kvae"], config["training"], config["dataset"]
    _, val_loader = build_dataloaders(dcfg, tcfg.batch_size, seed=tcfg.seed)
    sample = next(iter(val_loader))["images"]
    model, template, _ = create_train_state(cfg, tcfg, sample)
    ckpt = Checkpointer(runs_dir / "checkpoints", 0)

    eval_step = make_eval_step(model, cfg, tcfg)
    impute_step = make_impute_step(model, cfg)
    pred_step = make_prediction_test_step(model)

    def eval_ckpt(name):
        if not (runs_dir / "checkpoints" / name).exists():
            return None
        state = ckpt.restore(name, template)
        key = jax.random.PRNGKey(0)
        out = {"epoch": int(state.epoch)}
        key, k = jax.random.split(key)
        # Average over the FULL val split (as train/loop.py does) — a single
        # batch's val_loss/elbo_kf is too noisy for a per-seed table.
        from kvae_tpu.train.metrics import MeanAccumulator

        acc = MeanAccumulator()
        for i, batch in enumerate(val_loader):
            metrics, _ = eval_step(state, batch["images"], jax.random.fold_in(k, i))
            acc.update(metrics)
        metrics = acc.result()
        out["val_loss"] = float(metrics["loss"])
        out["elbo_kf"] = float(metrics["elbo_kf"])
        key, k = jax.random.split(key)
        imp = impute_epoch(
            impute_step, state, val_loader, k,
            t_init_mask=cfg.t_init_mask, t_steps_mask=cfg.t_steps_mask,
        )
        out["mse_smooth"] = float(imp["mse_smooth"])
        out["mse_filt"] = float(imp["mse_filt"])
        out["mse_recon"] = float(imp["mse_recon"])
        out["baseline"] = float(imp["baseline"])
        key, k = jax.random.split(key)
        kf_mse, naive_mse = kalman_prediction_test(pred_step, state, val_loader, k)
        out["pred_mse_kf"] = float(kf_mse)
        out["pred_mse_naive"] = float(naive_mse)
        return out

    best_val = eval_ckpt("kvae-best")
    best_imp = eval_ckpt("kvae-best-impute")
    best_pred = eval_ckpt("kvae-best-pred")
    out = dict(best_val)
    out["best_epoch"] = out.pop("epoch")
    if best_imp is not None:
        out["impute_selected"] = best_imp
        # headline number: the task-metric selection rule when available
        out["mse_smooth_sel"] = best_imp["mse_smooth"]
    else:
        out["mse_smooth_sel"] = out["mse_smooth"]
    if best_pred is not None:
        out["pred_selected"] = best_pred
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/kvae_ball.yaml")
    ap.add_argument("--seeds", type=int, nargs="+", default=[10, 11, 12, 13, 14])
    ap.add_argument("--tag", default="sweep")
    ap.add_argument("--out", default="/tmp/seed_sweep")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--kf-ramp", action="store_true")
    ap.add_argument("--dyn-lr-mult", type=float, default=None)
    ap.add_argument("--elbo-samples", type=int, default=None)
    ap.add_argument("--alpha-bias", type=float, default=None)
    ap.add_argument("--warmup-epochs", type=int, default=None)
    args = ap.parse_args()

    from kvae_tpu.utils.platform import apply_env_platform, enable_compilation_cache

    apply_env_platform()
    enable_compilation_cache()

    from kvae_tpu.config import load_config
    from kvae_tpu.train.loop import train

    out_root = Path(args.out) / args.tag
    out_root.mkdir(parents=True, exist_ok=True)
    summary = {"tag": args.tag, "config": args.config, "overrides": {
        "lr": args.lr, "kf_ramp": args.kf_ramp, "epochs": args.epochs,
        "warmup_epochs": args.warmup_epochs, "dyn_lr_mult": args.dyn_lr_mult,
    }, "runs": {}}

    for seed in args.seeds:
        config = load_config(args.config)
        tcfg = config["training"]
        tcfg.seed = seed
        # keep the periodic imputation eval: it drives the kvae-best-impute
        # (task-metric) model selection that evaluate_run also reports
        tcfg.add_imputation_plots = True
        if args.epochs is not None:
            tcfg.max_epochs = args.epochs
        if args.lr is not None:
            tcfg.lr = args.lr
        if args.kf_ramp:
            tcfg.kf_weight_ramp = True
        if args.dyn_lr_mult is not None:
            tcfg.dynamics_lr_mult = args.dyn_lr_mult
        if args.elbo_samples is not None:
            config["kvae"].kf_elbo_samples = args.elbo_samples
        if args.alpha_bias is not None:
            config["kvae"].alpha_bias_init = args.alpha_bias
        if args.warmup_epochs is not None:
            tcfg.warmup_epochs = args.warmup_epochs

        runs_dir = out_root / f"seed{seed}"
        t0 = time.time()
        result = train(config, runs_dir=runs_dir)
        train_s = time.time() - t0
        ev = evaluate_run(config, runs_dir)
        ev["train_seconds"] = round(train_s, 1)
        ev["final_train_steps_per_sec"] = round(result["steps_per_sec"], 1)
        summary["runs"][seed] = ev
        print(f"[{args.tag}] seed {seed}: mse_smooth {ev['mse_smooth']:.4e} "
              f"(sel {ev['mse_smooth_sel']:.4e}) "
              f"mse_filt {ev['mse_filt']:.4e} elbo_kf {ev['elbo_kf']:+.3f} "
              f"pred {ev['pred_mse_kf']:.3e} vs naive {ev['pred_mse_naive']:.3e} "
              f"({train_s:.0f}s)", flush=True)
        with open(out_root / "summary.json", "w") as f:
            json.dump(summary, f, indent=2)

    vals = sorted(r["mse_smooth_sel"] for r in summary["runs"].values())
    med = vals[len(vals) // 2] if len(vals) % 2 else 0.5 * (
        vals[len(vals) // 2 - 1] + vals[len(vals) // 2])
    summary["median_mse_smooth"] = med
    summary["worst_mse_smooth"] = vals[-1]
    with open(out_root / "summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(f"[{args.tag}] median mse_smooth {med:.4e} worst {vals[-1]:.4e}")


if __name__ == "__main__":
    main()
