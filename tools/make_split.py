"""Export an explicit train/val split as an npz index file.

The identical-data parity A/B (PARITY.md) requires not just the same
sequences but the same SPLIT MEMBERSHIP in both frameworks — otherwise the
val-ELBO curves carry a few percent of sampling noise from different val
sets (the round-3 caveat this retires). The file is consumed by:
  - kvae_tpu: `dataset.split_file` in the YAML (data/loader.py)
  - reference: `tools/run_reference_train.py --split-file` (monkeypatches
    torch.utils.data.random_split with the explicit Subsets)

The indices reproduce kvae_tpu's own deterministic split
(data/loader.py::split_indices) so the kvae_tpu arm's membership is
unchanged vs a run without the file.

Run: python tools/make_split.py --n 5000 --val-split 0.2 --seed 10 \
       --out /tmp/ab_split.npz
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, required=True, help="dataset size")
    ap.add_argument("--val-split", type=float, default=0.2)
    ap.add_argument("--seed", type=int, default=10)
    ap.add_argument("--batch-size", type=int, default=0,
                    help="if >0, truncate both lists to whole batches so a "
                         "framework that trains on final partial batches "
                         "(the reference) sees the exact same sequences as "
                         "one that drops them (kvae_tpu)")
    ap.add_argument("--out", type=str, required=True)
    args = ap.parse_args()

    from kvae_tpu.data.loader import split_indices

    train_idx, val_idx = split_indices(args.n, args.val_split, args.seed)
    if args.batch_size > 0:
        bs = args.batch_size
        train_idx = train_idx[: (len(train_idx) // bs) * bs]
        val_idx = val_idx[: (len(val_idx) // bs) * bs]
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez(out, train_idx=train_idx, val_idx=val_idx)
    print(f"wrote {out}: {len(train_idx)} train / {len(val_idx)} val indices "
          f"(n={args.n}, seed={args.seed})")


if __name__ == "__main__":
    main()
