"""VAE-only trainer CLI (parity with reference kvae/vae/train_vae.py, which
its README marks "not maintained").

Implemented as the same harness pinned to phase "vae": kf_weight = 0, only
encoder/decoder train. Produces the same run artifacts (checkpoints usable
by the full KVAE trainer as VAE pretraining).

Usage:
    python -m kvae_tpu.train.train_vae --config configs/vae_only.yaml
"""
from __future__ import annotations

import argparse

from kvae_tpu.config import load_config
from kvae_tpu.train.loop import train
from kvae_tpu.utils.platform import apply_env_platform


def main():
    apply_env_platform()
    p = argparse.ArgumentParser(description="Train the VAE alone (phase 'vae')")
    p.add_argument("--config", type=str, default="configs/vae_only.yaml")
    args = p.parse_args()
    config = load_config(args.config)
    tcfg = config["training"]
    # pin the whole run to phase "vae"
    tcfg.pretrain_vae_epochs = tcfg.max_epochs
    tcfg.warmup_epochs = 0
    result = train(config)
    print(f"best val loss: {result['best_val']:.6f} ({result['runs_dir']})")


if __name__ == "__main__":
    main()
