"""Export the self-generated bouncing-ball dataset to a reference-layout NPZ.

Writes the exact arrays our flagship config trains on (numpy generator,
identical seed/physics) as {'images': (N,T,H,W) float32 in [0,1],
'state': (N,T,4)} — the layout the reference's PymunkNPZDataset consumes
(reference kvae/dataloader/pymunk_dataset.py:40-44). This enables the
identical-data parity A/B: train the reference torch stack and kvae_tpu on
the SAME sequences and compare validation-ELBO curves / imputation MSE.

Run: python tools/export_dataset.py --out /tmp/ball5000.npz \
       [--num-sequences 5000] [--seq-len 20] [--seed 0]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--num-sequences", type=int, default=5000)
    ap.add_argument("--seq-len", type=int, default=20)
    ap.add_argument("--img-size", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from kvae_tpu.data.bouncing_ball import generate_bouncing_ball

    data = generate_bouncing_ball(
        num_sequences=args.num_sequences, seq_len=args.seq_len,
        img_size=args.img_size, seed=args.seed,
    )
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out, images=data["images"], state=data["state"])
    print(f"wrote {out}: images {data['images'].shape} "
          f"state {data['state'].shape} ({out.stat().st_size/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
