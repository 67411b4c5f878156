"""Serving demo: train-once, compile-once, serve-forever.

1. Restores a trained checkpoint (or initializes fresh params if none given).
2. Exports the imputation program to a self-contained artifact
   (StableHLO + params as constants) on disk.
3. Loads the artifact back — as a serving host would, with no model code —
   and serves padded-bucket requests through InferenceSession.

Usage:
    python examples/serve_demo.py [--ckpt runs/<ts>/checkpoints/kvae-best]
"""
import argparse
import time
from pathlib import Path

import jax
import numpy as np

from kvae_tpu.config import KVAEConfig, TrainingConfig, load_config
from kvae_tpu.serve import InferenceSession, export_imputer, load_exported
from kvae_tpu.train.state import create_train_state


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/kvae_ball.yaml")
    p.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    p.add_argument("--out", default="runs/serve_artifact.stablehlo")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--T", type=int, default=20)
    args = p.parse_args()

    config = load_config(args.config)
    cfg: KVAEConfig = config["kvae"]
    tcfg: TrainingConfig = config["training"]

    rng = np.random.default_rng(0)
    sample = rng.uniform(size=(args.batch, args.T, cfg.img_channels,
                               cfg.img_size, cfg.img_size)).astype(np.float32)
    _, state, _ = create_train_state(cfg, tcfg, jax.numpy.asarray(sample))
    if args.ckpt:
        from kvae_tpu.train.checkpoints import restore_train_state

        state = restore_train_state(args.ckpt, state)
        print(f"restored {args.ckpt} (epoch {int(state.epoch)})")

    # -- export a portable artifact --------------------------------------
    blob = export_imputer(cfg, state.params, batch_size=args.batch, T=args.T)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_bytes(blob)
    print(f"exported imputation program: {len(blob)/1e6:.2f} MB -> {out}")

    # -- serving host: load without model code ---------------------------
    fn = load_exported(out.read_bytes())
    mask = np.ones((args.batch, args.T), np.float32)
    mask[:, 4:16] = 0.0  # reference planning mask: observe 4, hide 12
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    outputs = fn(sample, mask, key)
    jax.block_until_ready(outputs)
    print(f"artifact first call (incl. device compile): "
          f"{time.perf_counter() - t0:.2f}s")
    t0 = time.perf_counter()
    outputs = fn(sample, mask, key)
    jax.block_until_ready(outputs)
    dt = time.perf_counter() - t0
    print(f"artifact steady state: {dt*1e3:.1f} ms / {args.batch} sequences "
          f"({args.batch/dt:.0f} seq/s); keys: {sorted(outputs.keys())}")

    # -- padded-bucket session (variable request sizes, no recompiles) ---
    sess = InferenceSession(cfg, state.params, T=args.T,
                            buckets=(1, 8, args.batch))
    for b in (1, 3, 17):
        res = sess.impute(sample[:b], mask[:b])
        print(f"session impute B={b:2d} -> x_imputed {res['x_imputed'].shape}")

    # -- streaming: online per-frame filtering (causal lstm dynamics) ----
    if cfg.dynamics_model.lower() == "lstm":
        from kvae_tpu.serve import StreamingSession

        stream = StreamingSession(cfg, state.params, batch_size=1)
        stream.step(sample[:1, 0])  # first call compiles
        stream.reset()  # the warmup step advanced the carry; start clean
        t0 = time.perf_counter()
        for t in range(args.T):
            out = stream.step(sample[:1, t] if t < 4 else None)  # drop t>=4
        dt = (time.perf_counter() - t0) / args.T
        print(f"streaming step: {dt*1e3:.2f} ms/frame "
              f"(4 observed then free-running prediction; "
              f"last x_pred mean {out['x_pred'].mean():.3f})")


if __name__ == "__main__":
    main()
