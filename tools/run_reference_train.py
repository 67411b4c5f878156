"""Run the REFERENCE torch trainer on an exported identical dataset.

The identical-data parity A/B (PARITY.md): both frameworks train on the
same NPZ (tools/export_dataset.py) with the same hyperparameters; the
val-ELBO curves and imputation MSEs are then directly comparable.

The reference package is import-broken as shipped (kvae/vae/losses.py:4
imports kvae.vae.config, which does not exist); this wrapper aliases the
module, writes a reference-layout YAML, and calls the reference
kvae/train/train.py main() in-process.

Run: python tools/run_reference_train.py --data /tmp/ball5000.npz \
       --epochs 80 --lr 0.007 --seed 10 --logdir /tmp/ref_runs
"""
import argparse
import importlib
import sys
import tempfile
from pathlib import Path

import yaml

REFERENCE = Path("/root/reference")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", type=str, required=True)
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--lr", type=float, default=0.007)
    ap.add_argument("--seed", type=int, default=10)
    ap.add_argument("--dynamics", type=str, default="lstm")
    ap.add_argument("--logdir", type=str, default="/tmp/ref_runs")
    ap.add_argument("--num-workers", type=int, default=0)
    ap.add_argument("--split-file", type=str, default=None,
                    help="npz with train_idx/val_idx (tools/make_split.py): "
                         "pins split membership to match the kvae_tpu arm "
                         "exactly instead of torch random_split")
    args = ap.parse_args()

    config = {
        "dataset": {
            "type": "pymunk",
            "path": args.data,
            "num_workers": args.num_workers,
            "val_split": 0.2,
            "kwargs": {"load_in_memory": True, "normalize": False, "seq_len": 20},
        },
        "transforms": {"add_noise_std": 0.0},
        "training": {
            "seed": args.seed,
            "max_epochs": args.epochs,
            "batch_size": 32,
            "lr": args.lr,
            "grad_clip_norm": 10.0,
            "decay_rate": 0.85,
            "decay_steps": 20,
            "ckpt_every": 20,
            "device": "cpu",
            "logdir": args.logdir,
            "pretrain_vae_epochs": 5,
            "warmup_epochs": 10,
            "add_imputation_plots": True,
        },
        "kvae": {
            "num_modes": 3,
            "a_dim": 2,
            "z_dim": 4,
            "dynamics_model": args.dynamics,
            "sticky_p_stay": 0.9,
            "noise_emission": 0.03,
            "noise_transition": 0.02,
            "init_cov": 20.0,
            "init_kf_matrices": 0.05,
            "out_distr": "bernoulli",
            "scheduled_beta": True,
            "start_epoch": 0,
            "end_epoch": 5,
            "start_val": 0.0,
            "end_val": 1.0,
            "dynamics_hidden_dim": 50,
            "t_init_mask": 4,
            "t_steps_mask": 12,
        },
    }

    cfg_file = Path(tempfile.mkdtemp()) / "ab_config.yaml"
    with open(cfg_file, "w") as f:
        yaml.safe_dump(config, f)
    print(f"config: {cfg_file}", flush=True)

    sys.path.insert(0, str(REFERENCE))
    sys.modules["kvae.vae.config"] = importlib.import_module("kvae.utils.config")

    # pytorch_lightning is not installed in this container; the reference only
    # uses its TensorBoardLogger. Stand in a scalar-capturing stub so the
    # run's curves land in <logdir>/scalars.jsonl (machine-readable for the
    # A/B comparison) and media calls no-op.
    import json
    import types

    class _Experiment:
        def __getattr__(self, name):
            return lambda *a, **k: None

    class _JsonlTBLogger:
        def __init__(self, save_dir=None, name="", version="", **kw):
            self._path = Path(save_dir or ".") / "scalars.jsonl"
            self.experiment = _Experiment()

        def log_metrics(self, metrics, step=None):
            rec = {"step": step}
            rec.update({k: float(v) for k, v in metrics.items()})
            with open(self._path, "a") as f:
                f.write(json.dumps(rec) + "\n")

        def __getattr__(self, name):
            return lambda *a, **k: None

    pl = types.ModuleType("pytorch_lightning")
    pl_loggers = types.ModuleType("pytorch_lightning.loggers")
    pl_loggers.TensorBoardLogger = _JsonlTBLogger
    pl.loggers = pl_loggers
    sys.modules["pytorch_lightning"] = pl
    sys.modules["pytorch_lightning.loggers"] = pl_loggers

    import torch

    torch.set_num_threads(1)  # stay off the TPU dispatch path (1-core host)

    if args.split_file:
        # Pin split membership: replace random_split (as imported into the
        # reference's kvae/train/utils.py) with the explicit index lists, so
        # both frameworks see IDENTICAL train/val sets.
        import numpy as np
        from torch.utils.data import Subset

        with np.load(args.split_file) as z:
            train_idx = z["train_idx"].astype(int).tolist()
            val_idx = z["val_idx"].astype(int).tolist()

        def pinned_split(dataset, lengths, *a, **k):
            assert len(dataset) >= len(train_idx) + len(val_idx)
            print(f"split pinned from {args.split_file}: "
                  f"{len(train_idx)} train / {len(val_idx)} val", flush=True)
            return Subset(dataset, train_idx), Subset(dataset, val_idx)

        ref_utils = importlib.import_module("kvae.train.utils")
        ref_utils.random_split = pinned_split

    sys.argv = ["train.py", "--config", str(cfg_file)]
    train_mod = importlib.import_module("kvae.train.train")
    train_mod.main()


if __name__ == "__main__":
    main()
