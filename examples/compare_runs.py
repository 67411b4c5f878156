"""Compare two (or more) runs' metric curves — the headless equivalent of the
reference's posterior_collapse / kvae_skvae_comparison notebooks, reading
metrics.jsonl instead of TensorBoard event files.

Usage:
    python examples/compare_runs.py runs/<annealed> runs/<collapsed> \
        --metrics loss elbo_vae_total active_units
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path


def load_curves(run_dir: Path, split: str = "val"):
    curves = {}
    with open(run_dir / "metrics.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("split") != split:
                continue
            for k, v in rec.items():
                if k in ("epoch", "split"):
                    continue
                curves.setdefault(k, []).append((rec["epoch"], v))
    return curves


def main():
    p = argparse.ArgumentParser()
    p.add_argument("runs", nargs="+")
    p.add_argument("--split", default="val")
    p.add_argument("--metrics", nargs="+",
                   default=["loss", "elbo_vae_total", "elbo_kf", "active_units"])
    args = p.parse_args()

    table = {}
    for run in args.runs:
        run_dir = Path(run)
        curves = load_curves(run_dir, args.split)
        row = {}
        for m in args.metrics:
            if m not in curves:
                continue
            vals = [v for _, v in curves[m]]
            row[m] = {"first": vals[0], "best": min(vals), "last": vals[-1]}
        table[run_dir.name] = row

    print(json.dumps(table, indent=2))


if __name__ == "__main__":
    main()
