"""Long-rollout generation figure: closed-loop vs frozen-dynamics free run.

Renders the evidence that `KVAE.generate(closed_loop=True)` restores the
model class's full generative expressiveness: with the alpha-LSTM advancing
on its own prediction feedback (or the SKVAE regime chain sampled from the
sticky prior), a generated ball keeps SWITCHING dynamics modes — i.e. it
bounces off walls after warmup — where the legacy frozen-(A,B,C,Q) rollout
drifts on one linear mode forever.

Outputs into <out>/:
  rollout.png        warmup + generated frame strips (closed-loop vs frozen),
                     plus the decoded ball's center-of-mass trajectory
  rollout_closed.mp4 the closed-loop generation as video (GIF fallback)
  rollout.json       bounce counts (direction reversals of the decoded
                     center after warmup) for both modes

Run: python tools/rollout_figure.py --run runs/<ts> \
       [--checkpoint kvae-best-impute] [--warmup 8] [--steps 72]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def center_of_mass(frames: np.ndarray):
    """Decoded-frame ball centers. frames [T,1,H,W] in [0,1] -> (cy, cx) [T]."""
    t, _, h, w = frames.shape
    f = np.clip(frames[:, 0], 0.0, 1.0)
    f = np.where(f > 0.3, f, 0.0)  # suppress background haze
    tot = f.sum(axis=(1, 2)) + 1e-8
    ys = (f * np.arange(h)[None, :, None]).sum(axis=(1, 2)) / tot
    xs = (f * np.arange(w)[None, None, :]).sum(axis=(1, 2)) / tot
    return ys, xs


def count_reversals(track: np.ndarray, min_step: float = 0.15) -> int:
    """Sign changes of the per-step velocity, ignoring sub-noise motion."""
    v = np.diff(track)
    v = v[np.abs(v) > min_step]
    if len(v) < 2:
        return 0
    return int(np.sum(np.sign(v[1:]) != np.sign(v[:-1])))


def main():
    from kvae_tpu.utils.platform import apply_env_platform

    apply_env_platform()

    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True)
    ap.add_argument("--config", default=None)
    ap.add_argument("--checkpoint", default="kvae-best-impute")
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--steps", type=int, default=72)
    ap.add_argument("--seq", type=int, default=0, help="val sequence index")
    ap.add_argument("--out", default=None, help="default: <run>/rollout")
    args = ap.parse_args()

    import jax

    from kvae_tpu.config import load_config
    from kvae_tpu.data.loader import build_dataloaders
    from kvae_tpu.models.kvae import KVAE
    from kvae_tpu.train.checkpoints import Checkpointer
    from kvae_tpu.train.state import create_train_state
    from kvae_tpu.utils.plots import save_frames

    run_dir = Path(args.run)
    out_dir = Path(args.out) if args.out else run_dir / "rollout"
    out_dir.mkdir(parents=True, exist_ok=True)
    config = load_config(args.config or run_dir / "config.yaml")
    cfg, tcfg, dcfg = config["kvae"], config["training"], config["dataset"]

    _, val_loader = build_dataloaders(dcfg, tcfg.batch_size, seed=tcfg.seed)
    batch = next(iter(val_loader))["images"]
    model, state, _ = create_train_state(cfg, tcfg, batch)
    ckpt = Checkpointer(run_dir / "checkpoints", 0)
    state = ckpt.restore(args.checkpoint, state)
    print(f"restored {args.checkpoint} at epoch {int(state.epoch)}")

    x_warm = batch[args.seq:args.seq + 1, :args.warmup]
    ks, kg = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    def gen(closed_loop, deterministic):
        return jax.tree.map(np.asarray, model.apply(
            {"params": state.params}, x_warm, args.steps,
            rngs={"sample": ks, "gumbel": kg},
            method=KVAE.generate, closed_loop=closed_loop,
            deterministic=deterministic,
        ))

    closed = gen(True, True)
    frozen = gen(False, True)
    warm_np = np.asarray(x_warm[0])

    results = {}
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    stride = max(1, args.steps // 16)
    fig, axes = plt.subplots(3, 1, figsize=(14, 9), height_ratios=[1, 1, 1.4])
    for row, (name, frames) in enumerate(
        [("closed-loop", closed["x_gen"][0]), ("frozen (legacy)", frozen["x_gen"][0])]
    ):
        strip = np.concatenate(
            [warm_np[:, 0], frames[::stride, 0]], axis=0
        )  # [Nf,H,W]
        axes[row].imshow(
            np.concatenate(list(strip), axis=1), cmap="gray", vmin=0, vmax=1
        )
        n_warm = warm_np.shape[0]
        axes[row].axvline(n_warm * 32, color="tab:orange", lw=2)
        axes[row].set_title(
            f"{name}: warmup frames, then every {stride}th generated frame "
            "(orange line = generation start)"
        )
        axes[row].set_axis_off()

    t_axis = np.arange(args.warmup + args.steps)
    for name, frames, ls in (
        ("closed-loop", closed["x_gen"][0], "-"),
        ("frozen", frozen["x_gen"][0], "--"),
    ):
        full = np.concatenate([warm_np, frames], axis=0)
        cy, cx = center_of_mass(full)
        axes[2].plot(t_axis, cx, ls, label=f"{name} x", lw=2)
        axes[2].plot(t_axis, cy, ls, label=f"{name} y", lw=1, alpha=0.6)
        post = slice(args.warmup, None)
        results[f"bounces_{name.split()[0].replace('-', '_')}"] = (
            count_reversals(cx[post]) + count_reversals(cy[post])
        )
    axes[2].axvline(args.warmup - 0.5, color="tab:orange", lw=2)
    axes[2].set_xlabel("frame")
    axes[2].set_ylabel("decoded ball center (px)")
    axes[2].set_title(
        "decoded center of mass: direction reversals after the orange line "
        "are bounces the rollout generated on its own"
    )
    axes[2].legend(ncol=2, fontsize=9)
    fig.tight_layout()
    fig.savefig(out_dir / "rollout.png", dpi=110)

    video = np.concatenate([warm_np, closed["x_gen"][0]], axis=0)
    results["video"] = save_frames(video, str(out_dir / "rollout_closed.mp4"))
    results["checkpoint"] = args.checkpoint
    results["warmup"] = args.warmup
    results["steps"] = args.steps
    with open(out_dir / "rollout.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
