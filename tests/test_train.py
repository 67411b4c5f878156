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
