"""Visual artifacts of a trained run — the figure cells of the reference's
notebooks (kvae_evaluate.ipynb latent/imputation/generation visualization,
kvae_skvae_comparison_states.ipynb regime heatmaps) as a headless script.

Produces, in the run directory:
  viz_imputation.png   masked input / smoothed / filtered / ground truth strips
  viz_latents.png      encoder a_vae vs smoothed C z trajectories in a-space
  viz_state_probs.png  regime (switching) or alpha-mixture (lstm) heatmap
  viz_generation.png   free-run rollout strip + trajectory overlay
  viz_generation.mp4   the rollout as video (GIF fallback without ffmpeg)

Usage:
    python examples/visualize.py --run runs/<ts> [--checkpoint kvae-best]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

try:  # allow running from a checkout without installing
    import kvae_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _strip_figure(rows, labels, mask=None, max_cols=20):
    """Rows of [T,C,H,W] image sequences as one labeled grid; observed frames
    (mask==1) in the first row get a green border like the notebook."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t = min(rows[0].shape[0], max_cols)
    fig, axes = plt.subplots(len(rows), t, figsize=(0.62 * t, 0.75 * len(rows)))
    axes = np.atleast_2d(axes)
    for r, (seq, label) in enumerate(zip(rows, labels)):
        for i in range(t):
            ax = axes[r, i]
            ax.imshow(np.asarray(seq[i]).squeeze(), cmap="gray", vmin=0, vmax=1)
            ax.set_xticks([])
            ax.set_yticks([])
            if mask is not None and r == 0:
                observed = bool(mask[i])
                for spine in ax.spines.values():
                    spine.set_edgecolor("tab:green" if observed else "tab:red")
                    spine.set_linewidth(1.4)
            if i == 0:
                ax.set_ylabel(label, fontsize=6, rotation=0, ha="right", va="center")
    fig.tight_layout(pad=0.15)
    return fig


def _latent_figure(a_vae, a_smooth, a_filt, mask):
    """a-space (a_dim>=2: first two dims) trajectories, observed steps marked
    (reference kvae_evaluate.ipynb latent-visualization cell)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5, 5))
    obs = np.asarray(mask).astype(bool)
    for arr, label, style in (
        (a_vae, "encoder a (q(a|x))", dict(color="k", lw=1.2)),
        (a_smooth, "smoothed C z (offline)", dict(color="tab:blue", lw=1.2)),
        (a_filt, "filtered C z (online)", dict(color="tab:orange", lw=1.0, ls="--")),
    ):
        arr = np.asarray(arr)
        ax.plot(arr[:, 0], arr[:, 1], label=label, **style)
    av = np.asarray(a_vae)
    ax.scatter(av[obs, 0], av[obs, 1], s=18, color="tab:green", zorder=5,
               label="observed steps")
    ax.scatter(av[~obs, 0], av[~obs, 1], s=18, facecolors="none",
               edgecolors="tab:red", zorder=5, label="masked steps")
    ax.set_xlabel("a[0]")
    ax.set_ylabel("a[1]")
    ax.set_title("Latent a-space trajectory (one sequence)")
    ax.legend(fontsize=7)
    fig.tight_layout()
    return fig


def main():
    from kvae_tpu.utils.platform import apply_env_platform

    apply_env_platform()

    p = argparse.ArgumentParser()
    p.add_argument("--run", required=True, help="runs/<ts> directory")
    p.add_argument("--config", default=None)
    p.add_argument("--checkpoint", default="kvae-best")
    p.add_argument("--warmup", type=int, default=4, help="generation warmup frames")
    p.add_argument("--gen-steps", type=int, default=16)
    p.add_argument("--batch", type=int, default=None,
                   help="visualize only the first N sequences (cheap CPU "
                        "compile for big-batch configs)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from kvae_tpu.config import load_config
    from kvae_tpu.data.loader import build_dataloaders
    from kvae_tpu.data.masks import mask_impute_planning
    from kvae_tpu.models.kvae import KVAE
    from kvae_tpu.train.checkpoints import Checkpointer
    from kvae_tpu.train.state import create_train_state
    from kvae_tpu.utils.plots import movie_to_frame, plot_state_probabilities

    run_dir = Path(args.run)
    config = load_config(args.config or run_dir / "config.yaml")
    cfg, tcfg, dcfg = config["kvae"], config["training"], config["dataset"]

    _, val_loader = build_dataloaders(dcfg, tcfg.batch_size, seed=tcfg.seed)
    x = next(iter(val_loader))["images"]
    if args.batch:
        x = x[: args.batch]
    model, state, _ = create_train_state(cfg, tcfg, x)
    state = Checkpointer(run_dir / "checkpoints", 0).restore(args.checkpoint, state)
    print(f"restored {args.checkpoint} at epoch {int(state.epoch)}")

    b, t = x.shape[:2]
    mask = mask_impute_planning(b, t, cfg.t_init_mask, cfg.t_steps_mask)
    rngs = {"sample": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)}

    imp = jax.jit(
        lambda params, x, mask: model.apply(
            {"params": params}, x, mask=mask, rngs=rngs, method=KVAE.impute
        )
    )(state.params, x, mask)

    # --- imputation strips -------------------------------------------------
    i = 0
    fig = _strip_figure(
        [
            np.asarray(x[i]) * np.asarray(mask[i])[:, None, None, None],
            np.asarray(imp["x_imputed"][i]),   # impute() already applies sigmoid
            np.asarray(imp["x_filtered"][i]),
            np.asarray(x[i]),
        ],
        ["input (masked)", "smoothed", "filtered", "truth"],
        mask=np.asarray(mask[i]),
    )
    fig.savefig(run_dir / "viz_imputation.png", dpi=150)
    print(f"wrote {run_dir / 'viz_imputation.png'}")

    # --- latent trajectories ------------------------------------------------
    if cfg.a_dim >= 2:
        fig = _latent_figure(
            imp["a_vae"][i], imp["a_imputed"][i], imp["a_filtered"][i], mask[i]
        )
        fig.savefig(run_dir / "viz_latents.png", dpi=150)
        print(f"wrote {run_dir / 'viz_latents.png'}")

    # --- regime / alpha heatmap ---------------------------------------------
    fig = plot_state_probabilities(np.asarray(imp["state_probs"][i]))
    if fig is not None:
        fig.savefig(run_dir / "viz_state_probs.png", dpi=150)
        print(f"wrote {run_dir / 'viz_state_probs.png'}")

    # --- free-run generation -------------------------------------------------
    gen = jax.jit(
        lambda params, xw: model.apply(
            {"params": params}, xw, args.gen_steps, rngs=rngs,
            method=KVAE.generate,
        )
    )(state.params, x[:, : args.warmup])
    x_gen = np.asarray(gen["x_gen"][i])  # generate() already applies sigmoid

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t_show = x_gen.shape[0]
    fig, axes = plt.subplots(2, t_show, figsize=(0.62 * t_show, 1.6))
    for j in range(t_show):
        axes[0, j].imshow(x_gen[j].squeeze(), cmap="gray", vmin=0, vmax=1)
        axes[0, j].axis("off")
        axes[1, j].axis("off")
    axes[1, 0].imshow(movie_to_frame(x_gen), cmap="gray")
    axes[1, 0].set_title("trajectory overlay", fontsize=6)
    fig.suptitle(f"free-run rollout after {args.warmup} warmup frames", fontsize=8)
    fig.tight_layout(pad=0.15)
    fig.savefig(run_dir / "viz_generation.png", dpi=150)
    print(f"wrote {run_dir / 'viz_generation.png'}")

    try:
        from kvae_tpu.utils.plots import save_frames

        written = save_frames(x_gen, str(run_dir / "viz_generation.mp4"))
        print(f"wrote {written}")
    except ImportError:
        print("imageio not available; skipped video")


if __name__ == "__main__":
    main()
