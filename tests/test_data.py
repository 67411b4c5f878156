"""Data-layer tests (mirrors reference tests/test_pymunk_dataset.py:9-34
with a synthetic npz in tmp_path, widened to the generator/masks/loader)."""
import jax
import jax.numpy as jnp
import numpy as np

from kvae_tpu.config import DatasetConfig
from kvae_tpu.data import (
    DataLoader,
    NPZVideoDataset,
    build_dataloaders,
    generate_bouncing_ball,
    make_training_mask,
    mask_impute_planning,
    mask_impute_random,
)
from kvae_tpu.data.loader import build_dataset, split_indices


def test_bouncing_ball_generator():
    data = generate_bouncing_ball(num_sequences=8, seq_len=12, img_size=32, seed=3)
    imgs, state = data["images"], data["state"]
    assert imgs.shape == (8, 12, 32, 32)
    assert state.shape == (8, 12, 4)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    # ball stays in bounds and visible on every frame
    per_frame_mass = imgs.sum(axis=(2, 3))
    assert np.all(per_frame_mass > 5.0)
    # positions move between frames (dynamics are alive)
    assert np.any(np.abs(np.diff(state[..., :2], axis=1)) > 0.5)
    # positions respect walls
    assert np.all(state[..., 0:2] >= 0) and np.all(state[..., 0:2] <= 32)


def test_bouncing_ball_multiball_and_determinism():
    d1 = generate_bouncing_ball(num_sequences=4, seq_len=8, num_balls=3, seed=5)
    d2 = generate_bouncing_ball(num_sequences=4, seq_len=8, num_balls=3, seed=5)
    np.testing.assert_array_equal(d1["images"], d2["images"])
    assert d1["state"].shape == (4, 8, 12)  # 4 dims * 3 balls
    # more balls -> more lit pixels on average than single ball
    single = generate_bouncing_ball(num_sequences=4, seq_len=8, num_balls=1, seed=5)
    assert d1["images"].mean() > single["images"].mean()


def test_bouncing_ball_device_matches_numpy():
    """The XLA generator (default path) must reproduce the numpy reference
    within float32 round-off, single- and multi-ball."""
    from kvae_tpu.data.bouncing_ball import generate_bouncing_ball_device

    for kw in (dict(num_sequences=8, seq_len=10, seed=3),
               dict(num_sequences=4, seq_len=8, num_balls=3, seed=5)):
        ref = generate_bouncing_ball(**kw)
        dev = generate_bouncing_ball_device(**kw)
        np.testing.assert_allclose(ref["images"], dev["images"], atol=1e-4)
        np.testing.assert_allclose(ref["state"], dev["state"], atol=1e-4)


def test_npz_dataset_layouts(tmp_path, rng):
    # (N,T,H,W) uint8 + state — the reference's committed layout
    imgs = (rng.uniform(size=(5, 20, 32, 32)) * 255).astype(np.uint8)
    state = rng.normal(size=(5, 20, 4)).astype(np.float32)
    path = tmp_path / "box.npz"
    np.savez(path, images=imgs, state=state)
    ds = NPZVideoDataset.from_npz(path, seq_len=20, normalize=True)
    assert len(ds) == 5
    item = ds[0]
    assert item["images"].shape == (20, 1, 32, 32)
    assert item["images"].dtype == np.float32
    assert item["state"].shape == (20, 4)
    assert item["images"].max() <= 1.0

    # flat frames (F,H,W) -> sliding windows
    flat = rng.uniform(size=(30, 16, 16)).astype(np.float32)
    np.savez(tmp_path / "flat.npz", images=flat)
    ds2 = NPZVideoDataset.from_npz(tmp_path / "flat.npz", seq_len=10, stride=5)
    assert len(ds2) == 5  # (30-10)/5 + 1
    assert ds2[0]["images"].shape == (10, 1, 16, 16)

    # (N,T,C,H,W) passthrough
    np.savez(tmp_path / "full.npz", images=rng.uniform(size=(3, 4, 2, 8, 8)))
    ds3 = NPZVideoDataset.from_npz(tmp_path / "full.npz", seq_len=4)
    assert ds3[0]["images"].shape == (4, 2, 8, 8)


def test_masks():
    m = mask_impute_planning(3, 20, t_init_mask=4, t_steps_mask=12)
    v = np.asarray(m)
    assert v.shape == (3, 20)
    np.testing.assert_array_equal(v[:, :4], 1.0)
    np.testing.assert_array_equal(v[:, 4:16], 0.0)
    np.testing.assert_array_equal(v[:, 16:], 1.0)

    mr = np.asarray(mask_impute_random(jax.random.PRNGKey(0), 64, 20, 4, drop_prob=0.5))
    np.testing.assert_array_equal(mr[:, :4], 1.0)
    assert 0.3 < mr[:, 4:].mean() < 0.7

    mt = make_training_mask(jax.random.PRNGKey(0), 2, 10, strategy="block",
                            t_init_mask=2, t_steps_mask=3)
    np.testing.assert_array_equal(np.asarray(mt)[:, 2:5], 0.0)
    m_all = make_training_mask(jax.random.PRNGKey(0), 2, 10, drop_prob=0.0)
    np.testing.assert_array_equal(np.asarray(m_all), 1.0)


def test_split_and_loader(rng):
    train_idx, val_idx = split_indices(100, 0.2, seed=1)
    assert len(val_idx) == 20 and len(train_idx) == 80
    assert len(set(train_idx) & set(val_idx)) == 0

    cfg = DatasetConfig(type="bouncing_ball", val_split=0.25,
                        kwargs={"num_sequences": 40, "seq_len": 6, "img_size": 16})
    train, val = build_dataloaders(cfg, batch_size=8, seed=0)
    assert len(train) == 3 and len(val) == 1  # 30//8, 10//8
    batches = list(train)
    assert len(batches) == 3
    b = batches[0]
    assert b["images"].shape == (8, 6, 1, 16, 16)
    assert isinstance(b["images"], jax.Array)

    # shuffling differs across epochs but is seed-deterministic overall
    e1 = [np.asarray(x["images"]).sum() for x in train]
    e2 = [np.asarray(x["images"]).sum() for x in train]
    assert not np.allclose(e1, e2) or len(e1) == 1


def test_build_dataset_npz_route(tmp_path, rng):
    np.savez(tmp_path / "d.npz", images=rng.uniform(size=(6, 5, 8, 8)).astype(np.float32))
    cfg = DatasetConfig(type="pymunk", path=str(tmp_path / "d.npz"), val_split=0.5,
                        kwargs={"seq_len": 5, "load_in_memory": True, "normalize": False})
    ds = build_dataset(cfg)
    assert len(ds) == 6
