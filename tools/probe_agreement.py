"""Probe-robustness study for the kvae-best-pred selection rule.

The trainer's periodic prediction probe (train/loop.py) decides
"pred beats persistence" from `kalman_prediction_test` over up to 5 val
batches with one RNG draw. This study measures, over a run's committed
per-epoch checkpoints, whether that probe-level decision agrees with the
FULL-val decision (all val batches), and how noisy the probe is across
RNG draws — the evidence the round-4 verdict asked for (its #7: "a
noise-level probe win can select a checkpoint that loses at eval time").

For each kvae-ckpt-epoch_* checkpoint:
  - full-val: mse_kf / mse_naive over every val batch (one RNG draw; the
    metric is an average over B*T*p latent errors, so draw noise is tiny)
  - probe: the trainer's exact 5-batch estimate, repeated for N rng draws
Reports the per-epoch decisions, the agreement rate, and the probe's
draw-to-draw spread.

Run: python tools/probe_agreement.py runs/proto_seed10 [--draws 5]
"""
import argparse
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", type=str)
    ap.add_argument("--draws", type=int, default=5)
    ap.add_argument("--out", type=str, default=None,
                    help="JSON output path (default <run_dir>/probe_agreement.json)")
    args = ap.parse_args()

    from kvae_tpu.config import load_config
    from kvae_tpu.data.loader import build_dataloaders
    from kvae_tpu.train import checkpoints as ckpt_lib
    from kvae_tpu.train.state import create_train_state
    from kvae_tpu.train.testing import (
        kalman_prediction_test,
        make_prediction_test_step,
    )

    run_dir = Path(args.run_dir)
    config = load_config(run_dir / "config.yaml")
    cfg, tcfg, dcfg = config["kvae"], config["training"], config["dataset"]

    _, val_loader = build_dataloaders(dcfg, tcfg.batch_size, seed=tcfg.seed)
    sample = next(iter(val_loader))["images"]
    model, state, _ = create_train_state(cfg, tcfg, sample)
    pred_step = make_prediction_test_step(model)

    ckpts = sorted(
        p for p in (run_dir / "checkpoints").iterdir()
        if re.match(r"kvae-ckpt-epoch_\d+$", p.name)
    )
    if not ckpts:
        raise SystemExit(f"no per-epoch checkpoints under {run_dir}/checkpoints")

    n_val = len(val_loader)
    rows = []
    for path in ckpts:
        epoch = int(path.name.split("_")[-1])
        st = ckpt_lib.restore_train_state(str(path), state)
        # Full-val decision (all batches)
        full_key = jax.random.PRNGKey(999)
        kf_full, naive_full = kalman_prediction_test(
            pred_step, st, val_loader, full_key, max_batches=n_val
        )
        # Trainer-probe decision for several independent rng draws
        probes = []
        for d in range(args.draws):
            k = jax.random.fold_in(jax.random.PRNGKey(tcfg.seed + 1), 7000 + d)
            kf_p, naive_p = kalman_prediction_test(pred_step, st, val_loader, k)
            probes.append({"kf": kf_p, "naive": naive_p, "wins": kf_p < naive_p})
        full_wins = kf_full < naive_full
        probe_win_votes = sum(p["wins"] for p in probes)
        rows.append({
            "epoch": epoch,
            "full_kf": kf_full, "full_naive": naive_full, "full_wins": full_wins,
            "probe_kf_mean": float(np.mean([p["kf"] for p in probes])),
            "probe_kf_std": float(np.std([p["kf"] for p in probes])),
            "probe_win_votes": int(probe_win_votes),
            "probe_draws": args.draws,
            "agree_all_draws": all(p["wins"] == full_wins for p in probes),
        })
        print(
            f"epoch {epoch:3d}: full {kf_full:.4f} vs {naive_full:.4f} "
            f"({'WIN' if full_wins else 'lose'}) | probe votes "
            f"{probe_win_votes}/{args.draws} (kf {rows[-1]['probe_kf_mean']:.4f}"
            f"±{rows[-1]['probe_kf_std']:.4f})"
        )

    n_agree = sum(r["agree_all_draws"] for r in rows)
    # decision agreement counting each draw separately
    total_votes = sum(r["probe_draws"] for r in rows)
    agree_votes = sum(
        (r["probe_win_votes"] if r["full_wins"]
         else r["probe_draws"] - r["probe_win_votes"])
        for r in rows
    )
    summary = {
        "run_dir": str(run_dir),
        "checkpoints": len(rows),
        "epochs_all_draws_agree": n_agree,
        "per_draw_agreement": agree_votes / max(total_votes, 1),
        "rows": rows,
    }
    out = Path(args.out) if args.out else run_dir / "probe_agreement.json"
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(
        f"\n{n_agree}/{len(rows)} checkpoints: every probe draw matches the "
        f"full-val decision; per-draw agreement "
        f"{100.0 * summary['per_draw_agreement']:.1f}% -> {out}"
    )


if __name__ == "__main__":
    main()
