"""Training loop + CLI entry point.

Parity with reference kvae/train/train.py:210-363 (`main`): config -> runs
dir + logging + TB -> checkpointer -> seeded state -> dataloaders -> epoch
loop with 3-phase schedule, per-epoch beta/tau/LR schedules, periodic
kalman_prediction_test + impute_epoch + media logging, best-val + periodic
checkpoints.

TPU-native differences:
  - the whole train step is ONE jitted XLA program (at most 3 variants, one
    per phase); schedules are epoch-derived inside the step
  - epoch metrics accumulate as lazy device scalars (one sync per epoch)
  - optional data-parallel mesh: batches are sharded over the 'data' axis and
    XLA emits the gradient all-reduce (see parallel/mesh.py)
  - optional jax.profiler trace capture (tcfg.profile_steps)
  - restore-and-continue via --resume

Usage:
    python -m kvae_tpu.train.loop --config configs/kvae_ball.yaml
"""
from __future__ import annotations

import argparse
import signal
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from kvae_tpu.config import load_config
from kvae_tpu.data.loader import build_dataloaders
from kvae_tpu.parallel.mesh import batch_sharding, make_mesh_for_batch
from kvae_tpu.train import checkpoints as ckpt_lib
from kvae_tpu.train import phases as phases_lib
from kvae_tpu.train.imputation import impute_epoch, make_impute_step
from kvae_tpu.train.metrics import (
    MeanAccumulator,
    MetricsWriter,
    create_runs_dir,
    setup_logging,
)
from kvae_tpu.train.state import create_train_state, make_eval_step, make_train_step
from kvae_tpu.train.testing import kalman_prediction_test, make_prediction_test_step


def select_mesh(cfg, tcfg, logger=None):
    """Mesh selection for the trainer: 1D data-parallel by default; with
    `training.time_devices: N > 1` a 2D (data x time) mesh — batch sharded
    over 'data', the sequence axis over 'time', the Kalman filter/smoother
    time-sharded via parallel/seqpar (ppermute prefix exchange,
    O(B n^2) bytes/hop), filter_impl forced to 'seqpar'.

    Returns (cfg, mesh, data_sharding, seq_mesh); cfg may be replaced.
    Unit-tested directly (tests/test_train.py); the end-to-end 2D trainer
    runs are the slow-marked integration tests."""
    if tcfg.time_devices and tcfg.time_devices > 1:
        import dataclasses

        from kvae_tpu.parallel.seqpar import make_data_time_mesh, time_sharding

        n_dev = len(jax.devices())
        d_time = tcfg.time_devices
        if n_dev % d_time != 0:
            raise ValueError(
                f"time_devices={d_time} must divide the device count {n_dev}"
            )
        if tcfg.T % d_time != 0:
            raise ValueError(
                f"time_devices={d_time} must divide the sequence length T={tcfg.T}"
            )
        limit = n_dev // d_time
        if tcfg.num_devices:
            limit = min(limit, tcfg.num_devices)
        d_data = max(d for d in range(1, limit + 1) if tcfg.batch_size % d == 0)
        mesh = make_data_time_mesh(d_data, d_time)
        data_sharding = time_sharding(mesh, batch_axis="data")
        if cfg.filter_impl != "seqpar":
            cfg = dataclasses.replace(cfg, filter_impl="seqpar")
            if logger:
                logger.info(
                    f"time_devices={d_time}: filter_impl forced to 'seqpar' "
                    f"(2D {d_data}x{d_time} data x time mesh)"
                )
        return cfg, mesh, data_sharding, mesh
    mesh = make_mesh_for_batch(tcfg.batch_size, tcfg.num_devices)
    return cfg, mesh, batch_sharding(mesh), None


def first_selection_epoch(tcfg) -> int:
    """First epoch eligible for kvae-best-impute / kvae-best-pred selection:
    `training.select_from_epoch` if set, else the first "all"-phase epoch.
    Pre-gate imputation probes still run and log but cannot claim the
    selected checkpoint (round-4 verdict #2: at T=100 a pretrain-phase probe
    — dynamics untrained, KF ELBO ~ -900 — permanently won kvae-best-impute
    through the smoother's interpolation prior alone)."""
    return tcfg.select_from_epoch or (
        tcfg.pretrain_vae_epochs + tcfg.warmup_epochs + 1
    )


def train(config: dict, runs_dir: Path | None = None) -> dict:
    """Run a training; returns {'best_val', 'best_impute', 'runs_dir', ...}.

    With `training.restart_seeds: N > 1` this dispatches to the parallel-
    restart triage protocol (`train_with_restarts`); otherwise a single run.
    """
    tcfg = config["training"]
    if tcfg.restart_seeds and tcfg.restart_seeds > 1 and not tcfg.resume_from:
        return train_with_restarts(config, runs_dir)
    return _train_single(config, runs_dir)


def train_with_restarts(config: dict, runs_dir: Path | None = None) -> dict:
    """Parallel-restart triage: the shipped answer to the KVAE seed lottery.

    The per-seed outcome variance is a property of the method, not this
    implementation (PARITY.md: the reference torch trainer lands in the same
    weak basins on identical data), and a full run costs only minutes on one
    chip — so restarts ARE the method:

      1. train `restart_seeds` candidates at seeds seed..seed+N-1 for
         `restart_epochs` epochs each (one process: XLA programs are shared),
         each with the periodic val-imputation probe on;
      2. rank candidates by their best val-imputation MSE (the task metric —
         the ELBO can prefer dynamics-dead basins, see Checkpointer
         .save_impute_best);
      3. continue the top `restart_topk` to `max_epochs` via bit-exact
         resume (identical to having run the winning seed full-length);
      4. the protocol's output is the best finalist's `kvae-best-impute`.

    Writes restart_summary.json with every candidate's probe and the
    selection. The final run's artifacts land in `runs_dir` itself (topk=1)
    or `runs_dir/final_seed*`.
    """
    import dataclasses
    import json
    import shutil

    tcfg = config["training"]
    runs_dir = Path(runs_dir) if runs_dir else create_runs_dir(tcfg.logdir)
    runs_dir.mkdir(parents=True, exist_ok=True)
    logger = setup_logging(str(runs_dir / "train.log"))
    n, triage_epochs = tcfg.restart_seeds, tcfg.restart_epochs
    topk = max(1, tcfg.restart_topk)
    base_seed = tcfg.seed
    proto_raw = dict(config.get("raw", {}) or {})
    proto_raw.setdefault("training", {})["seed"] = base_seed
    with open(runs_dir / "protocol_config.yaml", "w") as f:
        yaml.safe_dump(proto_raw, f)
    logger.info(
        f"restart protocol: {n} candidates (seeds {base_seed}..{base_seed + n - 1}) "
        f"x {triage_epochs} triage epochs, top-{topk} continued to "
        f"{tcfg.max_epochs} epochs"
    )
    # Triage ranks on the val-imputation probe, which fires at epoch % 5 == 0
    # AND (phase gate) epoch >= select_from_epoch. If no eligible probe fits
    # inside the triage window every candidate's best_impute stays inf and
    # the "ranking" is insertion order — a config error, not a preference.
    sel_from = first_selection_epoch(tcfg)
    first_probe = ((sel_from + 4) // 5) * 5
    if triage_epochs < first_probe:
        raise ValueError(
            f"restart_epochs={triage_epochs} ends before the first "
            f"selection-eligible imputation probe at epoch {first_probe} "
            f"(probes fire every 5 epochs, selection starts at epoch "
            f"{sel_from} = pretrain+warmup+1 unless training."
            f"select_from_epoch overrides) — triage cannot rank candidates"
        )

    def child_config(**overrides):
        child = dict(config)
        child["training"] = dataclasses.replace(
            tcfg, restart_seeds=0, add_imputation_plots=True, **overrides
        )
        return child

    probes = {}
    for i in range(n):
        seed = base_seed + i
        child_dir = runs_dir / f"triage_seed{seed}"
        res = _train_single(
            child_config(seed=seed, max_epochs=triage_epochs),
            runs_dir=child_dir,
        )
        probes[seed] = res
        logger = setup_logging(str(runs_dir / "train.log"))
        logger.info(
            f"triage seed {seed}: best val-impute {res['best_impute']:.4e} "
            f"best val {res['best_val']:.4f}"
        )

    ranked = sorted(probes, key=lambda s: probes[s]["best_impute"])
    if all(not np.isfinite(probes[s]["best_impute"]) for s in probes):
        raise RuntimeError(
            "restart triage: every candidate's val-imputation probe is inf "
            f"({ {s: probes[s]['best_impute'] for s in probes} }) — either all "
            "candidates diverged or no eligible probe ran; cannot rank"
        )
    finalists = ranked[:topk]
    logger.info(f"triage ranking: {ranked}; continuing {finalists}")

    results = {}
    for seed in finalists:
        child_dir = runs_dir / f"triage_seed{seed}"
        final_dir = runs_dir if topk == 1 else runs_dir / f"final_seed{seed}"
        # Seed the final dir with the triage bests so the continuation only
        # ever replaces them with strictly better checkpoints (the restored
        # state's best_val/best_impute re-seed the Checkpointer trackers).
        (final_dir / "checkpoints").mkdir(parents=True, exist_ok=True)
        for name in ("kvae-best", "kvae-best-impute", "kvae-best-pred"):
            src = child_dir / "checkpoints" / name
            if src.exists():
                shutil.copytree(
                    src, final_dir / "checkpoints" / name, dirs_exist_ok=True
                )
        res = _train_single(
            child_config(
                seed=seed,
                resume_from=str(child_dir / "checkpoints" / "kvae-latest"),
            ),
            runs_dir=final_dir,
        )
        results[seed] = res

    winner = min(results, key=lambda s: results[s]["best_impute"])
    logger = setup_logging(str(runs_dir / "train.log"))
    logger.info(
        f"protocol winner: seed {winner} "
        f"(best val-impute {results[winner]['best_impute']:.4e})"
    )
    summary = {
        "protocol_seed": base_seed,
        "restart_seeds": n,
        "restart_epochs": triage_epochs,
        "restart_topk": topk,
        "triage": {
            str(s): {
                "best_impute": probes[s]["best_impute"],
                "best_val": probes[s]["best_val"],
            } for s in probes
        },
        "finalists": [int(s) for s in finalists],
        "winner_seed": int(winner),
        "final": {
            str(s): {
                "best_impute": results[s]["best_impute"],
                "best_val": results[s]["best_val"],
                "runs_dir": results[s]["runs_dir"],
            } for s in results
        },
    }
    with open(runs_dir / "restart_summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    out = dict(results[winner])
    out["winner_seed"] = int(winner)
    out["runs_dir"] = str(runs_dir)
    return out


def _train_single(config: dict, runs_dir: Path | None = None) -> dict:
    """Run a full training; returns {'best_val': ..., 'runs_dir': ...}."""
    cfg, tcfg, dcfg = config["kvae"], config["training"], config["dataset"]

    if tcfg.debug_nans:
        # Dev mode (SURVEY §5): fail at the op that produced a NaN instead of
        # the reference's silent _safe_cholesky escape hatch.
        jax.config.update("jax_debug_nans", True)

    runs_dir = Path(runs_dir) if runs_dir else create_runs_dir(tcfg.logdir)
    runs_dir.mkdir(parents=True, exist_ok=True)
    logger = setup_logging(str(runs_dir / "train.log"))
    writer = MetricsWriter(runs_dir)
    # Snapshot the config with the EFFECTIVE training seed (CLI --seed and
    # restart-protocol continuations override the YAML value): this dir's
    # artifacts must be reproducible from this dir's config alone. A
    # protocol continuation therefore records the WINNER seed here
    # (restart_seeds: 0 — re-running this file reproduces the winner's
    # straight run); the protocol itself is in restart_summary.json and the
    # parent's protocol_config.yaml.
    import copy as _copy

    raw_snapshot = _copy.deepcopy(config.get("raw", {})) or {}
    raw_snapshot.setdefault("training", {})
    raw_snapshot["training"]["seed"] = tcfg.seed
    raw_snapshot["training"]["restart_seeds"] = 0
    with open(runs_dir / "config.yaml", "w") as f:
        yaml.safe_dump(raw_snapshot, f)
    ckpt = ckpt_lib.Checkpointer(runs_dir / "checkpoints", tcfg.ckpt_every)

    cfg, mesh, data_sharding, seq_mesh = select_mesh(cfg, tcfg, logger)
    logger.info(f"devices: {jax.devices()} mesh: {mesh}")

    train_loader, val_loader = build_dataloaders(
        dcfg, tcfg.batch_size, seed=tcfg.seed, sharding=data_sharding
    )
    logger.info(
        f"dataset: {len(train_loader.dataset)} sequences -> "
        f"{len(train_loader)} train + {len(val_loader)} val batches @ bs={tcfg.batch_size}"
    )
    if len(train_loader) == 0 or len(val_loader) == 0:
        raise ValueError(
            f"empty loader: {len(train_loader)} train / {len(val_loader)} val "
            f"batches — need at least batch_size={tcfg.batch_size} sequences per "
            f"split (val split holds {int(dcfg.val_split * len(train_loader.dataset))})"
        )

    sample_batch = next(iter(train_loader))["images"]
    model, state, tx = create_train_state(cfg, tcfg, sample_batch, seq_mesh=seq_mesh)
    if tcfg.resume_from:
        state = ckpt_lib.restore_train_state(tcfg.resume_from, state)
        ckpt.seed_from_state(state)  # best-so-far survives the restart
        logger.info(f"resumed from {tcfg.resume_from} at epoch {int(state.epoch)}")
    elif tcfg.init_vae_from:
        state = ckpt_lib.warm_start_vae(tcfg.init_vae_from, state)

    if len(mesh.devices.flat) > 1:
        # Pin the TrainState replicated over the data mesh (params stay
        # replicated; XLA all-reduces grads when the step consumes batches
        # sharded by `data_sharding`).
        from kvae_tpu.parallel.mesh import replicate_state

        state = replicate_state(state, mesh)
        logger.info(
            f"data-parallel: state replicated over {len(mesh.devices.flat)} "
            "devices, batches sharded on the 'data' axis"
        )

    train_step = make_train_step(model, cfg, tcfg, tx)
    eval_step = make_eval_step(model, cfg, tcfg)
    impute_step = make_impute_step(model, cfg)
    pred_step = make_prediction_test_step(model)

    # Device-resident data -> fuse each whole epoch into ONE XLA program
    # (scan of train steps + on-device batch gather): no per-batch host
    # dispatches, which dominate once the step itself is ~ms-fast.
    from kvae_tpu.data.loader import DeviceDataLoader
    from kvae_tpu.train.state import make_epoch_runner, make_eval_epoch_runner

    fused_epochs = (
        isinstance(train_loader, DeviceDataLoader)
        and tcfg.profile_steps == 0
        and tcfg.fused_epochs in ("auto", True)
    )
    if fused_epochs:
        epoch_run = make_epoch_runner(model, cfg, tcfg, tx)
        eval_epoch_run = make_eval_epoch_runner(model, cfg, tcfg)
        logger.info("fused-epoch mode: one XLA program per train/eval epoch")
    else:
        logger.info(
            "stepwise mode: per-batch dispatch "
            f"(fused_epochs={tcfg.fused_epochs!r}, "
            f"device_resident={isinstance(train_loader, DeviceDataLoader)})"
        )

    eval_key = jax.random.PRNGKey(tcfg.seed + 1)
    profiled = False
    sel_from_epoch = first_selection_epoch(tcfg)

    # Preemption handling (SURVEY §5): SIGTERM sets a flag; the epoch loop
    # notices at its next boundary, writes `kvae-latest` synchronously, and
    # returns. `--resume <run>/checkpoints/kvae-latest` continues bit-exact.
    # Flag-based (not save-in-handler) so the interrupt never lands mid-RPC.
    preempted = {"flag": False}

    def _on_sigterm(signum, frame):
        preempted["flag"] = True
        logger.warning("SIGTERM received: will checkpoint and exit at the "
                       "next epoch boundary")

    try:
        prev_sigterm = signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:  # not the main thread (e.g. driven from a test runner)
        prev_sigterm = None

    def fetch_scalars(tree):
        """One device->host round trip for a whole dict of device scalars
        (per-scalar float() costs a ~33 ms RPC each on tunneled backends)."""
        leaves, treedef = jax.tree.flatten(tree)
        vals = np.asarray(jnp.stack([jnp.asarray(l, jnp.float32) for l in leaves]))
        return jax.tree.unflatten(treedef, [float(v) for v in vals])

    start_epoch = int(state.epoch)
    for epoch in range(start_epoch, tcfg.max_epochs + 1):
        phase = phases_lib.phase_for_epoch(
            epoch, tcfg.pretrain_vae_epochs, tcfg.warmup_epochs
        )
        if epoch in (
            1, tcfg.pretrain_vae_epochs + 1,
            tcfg.pretrain_vae_epochs + tcfg.warmup_epochs + 1,
        ):
            logger.info(f"=== training phase '{phase}' from epoch {epoch} ===")

        # ---- train epoch ----
        t0 = time.perf_counter()
        if fused_epochs:
            n_steps = len(train_loader)
            order = jnp.asarray(train_loader.epoch_order(epoch))
            state, metrics_dev = epoch_run(state, train_loader.images, order, phase)
            train_metrics = fetch_scalars(metrics_dev)  # one sync
        else:
            acc = MeanAccumulator()
            n_steps = 0
            train_loader.set_epoch(epoch)  # shuffle = f(seed, epoch): resume-pure
            for batch in train_loader:
                if tcfg.profile_steps > 0 and not profiled and n_steps == 1:
                    jax.profiler.start_trace(str(runs_dir / "profile"))
                state, metrics = train_step(state, batch["images"], phase)
                acc.update(metrics)
                n_steps += 1
                if (
                    tcfg.profile_steps > 0 and not profiled
                    and n_steps == 1 + tcfg.profile_steps
                ):
                    jax.tree.leaves(metrics)[0].block_until_ready()
                    jax.profiler.stop_trace()
                    profiled = True
                    logger.info(f"profiler trace written to {runs_dir / 'profile'}")
            train_metrics = acc.result()  # single host sync
        dt = time.perf_counter() - t0
        steps_per_sec = n_steps / dt if dt > 0 else 0.0
        train_metrics["steps_per_sec"] = steps_per_sec

        # ---- eval epoch (fully observed) ----
        # RNG note: all eval keys derive statelessly from (eval_key root,
        # epoch, batch index) — a resumed run reproduces the uninterrupted
        # run's eval stream exactly, and fused and stepwise modes derive the
        # per-batch key IDENTICALLY (fold_in(epoch_key, i), split into
        # sample/gumbel), so eval metrics are bit-comparable across the two
        # dispatch modes (gated by tests/test_train.py).
        epoch_eval_key = jax.random.fold_in(eval_key, epoch)
        if fused_epochs:
            order = jnp.asarray(val_loader.epoch_order(epoch))
            metrics_dev, viz = eval_epoch_run(
                state, val_loader.images, order, epoch_eval_key
            )
            val_metrics = fetch_scalars(metrics_dev)
            last_batch = {"images": viz["x"]}
        else:
            acc = MeanAccumulator()
            viz = None
            last_batch = None
            val_loader.set_epoch(epoch)
            for i, batch in enumerate(val_loader):
                k = jax.random.fold_in(epoch_eval_key, i)
                metrics, viz = eval_step(state, batch["images"], k)
                acc.update(metrics)
                last_batch = batch
            val_metrics = acc.result()

        writer.log_scalars(train_metrics, "train", epoch)
        writer.log_scalars(val_metrics, "val", epoch)
        if cfg.dynamics_model.lower() == "switching":
            writer.log_scalar("train/tau", train_metrics.get("tau", 0.0), epoch)
        if viz is not None and last_batch is not None:
            writer.log_image(np.asarray(last_batch["images"][0]), "val/orig", epoch)
            writer.log_image(np.asarray(viz["x_recon"][0]), "val/recon", epoch)
            writer.log_video(np.asarray(last_batch["images"][0]), "val/seq_orig", epoch)
            writer.log_video(np.asarray(viz["x_recon"][0]), "val/seq_recon", epoch)
            writer.log_state_probs(viz["state_probs"], "val/state_probabilities", epoch)

        impute_msg = ""
        if tcfg.add_imputation_plots and epoch % 5 == 0:
            k1 = jax.random.fold_in(epoch_eval_key, 1000)
            k2 = jax.random.fold_in(epoch_eval_key, 1001)
            kf_mse, naive_mse = kalman_prediction_test(pred_step, state, val_loader, k1)
            writer.log_scalar("val/pred_mse_kf", kf_mse, epoch)
            writer.log_scalar("val/pred_mse_naive", naive_mse, epoch)
            imp = impute_epoch(
                impute_step, state, val_loader, k2,
                t_init_mask=cfg.t_init_mask, t_steps_mask=cfg.t_steps_mask,
            )
            if imp is not None:
                mse_s = float(imp["mse_smooth"])
                pred_ok = float(kf_mse) < float(naive_mse)
                if epoch >= sel_from_epoch:
                    state = state.replace(
                        best_impute=jnp.minimum(state.best_impute, mse_s),
                        best_pred=jnp.minimum(
                            state.best_pred, mse_s if pred_ok else jnp.inf
                        ),
                    )
                    ckpt.save_impute_best(mse_s, state, epoch)
                    ckpt.save_pred_best(mse_s, pred_ok, state, epoch)
                elif mse_s < float(state.best_impute):
                    # Phase gate (round-4 verdict #2): a pretrain/warmup-phase
                    # probe can beat every trained epoch purely through the
                    # smoother's interpolation prior; selection ignores it.
                    logger.warning(
                        f"epoch {epoch} [{phase}] probe mse_smooth {mse_s:.4e} "
                        f"would lead selection but is before select_from_epoch="
                        f"{sel_from_epoch} — ignored for kvae-best-impute/pred"
                    )
                writer.log_scalars(
                    {k: v for k, v in imp.items() if k != "sample"},
                    "val_imputation", epoch,
                )
                sample = imp["sample"]
                for key_name, tag in (
                    ("x_real", "seq_impute_real"), ("x_recon", "seq_impute_recon"),
                    ("x_filtered", "seq_impute_filt"), ("x_imputed", "seq_impute_smooth"),
                ):
                    writer.log_image(
                        np.asarray(sample[key_name][0]), f"val_imputation/{tag}", epoch
                    )
                    writer.log_video(
                        np.asarray(sample[key_name][0]), f"val_imputation/{tag}.mp4", epoch
                    )
                writer.log_state_probs(
                    sample["state_probs"], "val_imputation/seq_impute_states", epoch
                )
                impute_msg = (
                    f"imputation MSE smooth {imp['mse_smooth']:.6e} "
                    f"filt {imp['mse_filt']:.6e} recon {imp['mse_recon']:.6e} "
                    f"| baseline {imp['baseline']:.6e} "
                    f"| pred kf {kf_mse:.6e} vs naive {naive_mse:.6e}"
                )

        logger.info(
            f"epoch {epoch:03d} [{phase}] "
            f"train loss {train_metrics['loss']:.4f} "
            f"(VAE {train_metrics['elbo_vae_total']:.4f} KF {train_metrics['elbo_kf']:.4f}) "
            f"| val loss {val_metrics['loss']:.4f} "
            f"(VAE {val_metrics['elbo_vae_total']:.4f} KF {val_metrics['elbo_kf']:.4f}) "
            f"| {steps_per_sec:.2f} steps/s "
            + (f"| {impute_msg}" if impute_msg else "")
        )

        if not np.isfinite(train_metrics["loss"]):
            # Fail fast on divergence: a NaN loss never recovers (every Adam
            # moment is already NaN) — training on would only burn chip time.
            # The last finite-epoch kvae-latest remains on disk for resume;
            # restart-triage ranks this candidate by its pre-divergence probe
            # (or inf), which is the protocol's divergence handling.
            logger.error(
                f"epoch {epoch} [{phase}]: train loss is not finite "
                f"({train_metrics['loss']}) — aborting this run (diverged)"
            )
            break

        state = state.replace(
            best_val=jnp.minimum(state.best_val, val_metrics["loss"])
        )
        ckpt.save_checkpoints(train_metrics["loss"], val_metrics["loss"], state, epoch)
        state = state.advance_epoch()
        if preempted["flag"]:
            ckpt.save_latest(state, wait=True)
            logger.warning(
                f"preempted after epoch {epoch}: kvae-latest written, exiting "
                f"(resume with --resume {ckpt.dir / 'kvae-latest'})"
            )
            break
        ckpt.save_latest(state)

    ckpt.close()  # drain in-flight async saves
    if prev_sigterm is not None:
        signal.signal(signal.SIGTERM, prev_sigterm)
    writer.close()
    return {
        "best_val": ckpt.best_val,
        "best_impute": ckpt.best_impute,
        "runs_dir": str(runs_dir),
        "steps_per_sec": train_metrics.get("steps_per_sec", 0.0),
    }


def main():
    from kvae_tpu.utils.platform import apply_env_platform

    apply_env_platform()
    p = argparse.ArgumentParser(description="Train a TPU-native KVAE")
    p.add_argument("--config", type=str, default="configs/kvae_ball.yaml")
    p.add_argument("--resume", type=str, default=None,
                   help="orbax checkpoint dir to resume from")
    p.add_argument("--init-vae-from", type=str, default=None,
                   help="orbax checkpoint dir to warm-start encoder/decoder "
                        "from (pretrain-VAE -> KVAE flow)")
    p.add_argument("--seed", type=int, default=None,
                   help="override training.seed (for restart-protocol runs, "
                        "this is the protocol seed)")
    p.add_argument("--runs-dir", type=str, default=None,
                   help="exact output directory (default: timestamped under "
                        "training.logdir)")
    args = p.parse_args()
    config = load_config(args.config)
    if args.resume:
        config["training"].resume_from = args.resume
    if args.init_vae_from:
        config["training"].init_vae_from = args.init_vae_from
    if args.seed is not None:
        config["training"].seed = args.seed
    result = train(config, runs_dir=args.runs_dir)
    print(f"best val loss: {result['best_val']:.6f} ({result['runs_dir']})")


if __name__ == "__main__":
    main()
