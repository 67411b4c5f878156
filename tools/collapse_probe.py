"""Search the likelihood balance for a posterior-collapse regime.

The reference demonstrates beta=1 collapse vs annealed-beta rescue on its
own (undistributed) dataset (reference notebooks/posterior_collapse.ipynb
cells 3/9: val 30.279 vs 9.299). On our self-generated data the two arms
tie at the flagship likelihood balance (PARITY.md round 2). This tool
sweeps the balance knobs — scale_reconstruction, additive input noise,
beta ceiling — running SHORT beta-fixed probes, and reports KL / active
units / val loss so a collapsing regime can be identified, then confirmed
with full paired runs (configs/posterior_collapse*.yaml).

Collapse signature: kl_vae -> ~0, active_units -> 0, val loss >> the
annealed arm's at the same epoch.

Run: python tools/collapse_probe.py --out /tmp/collapse_probe
"""
from __future__ import annotations

import argparse
import itertools
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/collapse_probe")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--scales", type=float, nargs="+",
                    default=[0.3, 0.1, 0.05, 0.02])
    ap.add_argument("--noise", type=float, nargs="+", default=[0.0, 0.3])
    ap.add_argument("--seed", type=int, default=10)
    args = ap.parse_args()

    from kvae_tpu.utils.platform import apply_env_platform, enable_compilation_cache

    apply_env_platform()
    enable_compilation_cache()

    from kvae_tpu.config import parse_config_dict
    from kvae_tpu.train.loop import train

    out_root = Path(args.out)
    out_root.mkdir(parents=True, exist_ok=True)
    results = []

    for scale, noise in itertools.product(args.scales, args.noise):
        raw = {
            "dataset": {"type": "bouncing_ball", "val_split": 0.2,
                        "kwargs": {"num_sequences": 5000, "seq_len": 20,
                                   "img_size": 32, "seed": 0}},
            "transforms": {"add_noise_std": noise},
            "training": {"seed": args.seed, "max_epochs": args.epochs,
                         "batch_size": 32, "lr": 0.007,
                         "pretrain_vae_epochs": 5, "warmup_epochs": 10,
                         "ckpt_every": 0, "logdir": str(out_root)},
            "kvae": {"num_modes": 3, "a_dim": 2, "z_dim": 4,
                     "dynamics_model": "lstm", "filter_impl": "auto",
                     "sticky_p_stay": 0.9,
                     "out_distr": "bernoulli",
                     "scale_reconstruction": scale,
                     # beta == 1 from epoch 0 (the collapse arm)
                     "scheduled_beta": False,
                     "dynamics_hidden_dim": 50},
        }
        tag = f"s{scale}_n{noise}"
        runs_dir = out_root / tag
        train(parse_config_dict(raw), runs_dir=runs_dir)
        # last-epoch val stats
        last = {}
        with open(runs_dir / "metrics.jsonl") as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("split") == "val":
                    last = rec
        row = {"scale_reconstruction": scale, "add_noise_std": noise,
               "val_loss": last.get("loss"), "kl_vae": last.get("kl_vae"),
               "active_units": last.get("active_units"),
               "latent_var_0": last.get("latent_var_0"),
               "latent_var_1": last.get("latent_var_1")}
        results.append(row)
        print(json.dumps(row), flush=True)
        with open(out_root / "probe_results.json", "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
