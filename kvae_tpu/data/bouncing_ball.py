"""Self-contained bouncing-ball video generator (vectorized numpy).

The reference trains on a PyMunk-generated `box.npz` whose simulator is NOT
in its repo (dataset paths in reference kvae/train/config.yaml:8 point at the
author's machine). This framework must be self-contained, so we generate the
same data layout ourselves: `images` (N,T,H,W) float/uint8 in [0,1] and
`state` (N,T,4) = (x, y, vx, vy) per ball (concatenated for multi-ball).

The simulation is fully vectorized across sequences and balls (no Python loop
over N), with elastic wall bounces; rendering draws anti-aliased discs via a
distance field, chunked to bound memory. Multi-ball supports elastic
pairwise ball-ball collisions (equal mass) for the scaling config
(BASELINE.json config 5).
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _step(pos, vel, radius, size, substeps=2, collide=True):
    """Advance all (N, num_balls) balls one frame with wall reflection."""
    for _ in range(substeps):
        pos = pos + vel / substeps
        # wall bounces: reflect around the boundary
        for axis in (0, 1):
            low = pos[..., axis] < radius
            high = pos[..., axis] > size - radius
            pos[..., axis] = np.where(low, 2 * radius - pos[..., axis], pos[..., axis])
            pos[..., axis] = np.where(
                high, 2 * (size - radius) - pos[..., axis], pos[..., axis]
            )
            vel[..., axis] = np.where(low | high, -vel[..., axis], vel[..., axis])
        if collide and pos.shape[1] > 1:
            pos, vel = _ball_collisions(pos, vel, radius)
    return pos, vel


def _ball_collisions(pos, vel, radius):
    """Equal-mass elastic collisions between every ball pair (vectorized)."""
    nb = pos.shape[1]
    for i in range(nb):
        for j in range(i + 1, nb):
            d = pos[:, i] - pos[:, j]                     # [N,2]
            dist = np.linalg.norm(d, axis=-1)             # [N]
            hit = dist < 2 * radius
            if not np.any(hit):
                continue
            normal = d / np.maximum(dist, 1e-6)[:, None]
            rel = vel[:, i] - vel[:, j]
            # only collide when approaching
            approaching = np.sum(rel * normal, axis=-1) < 0
            m = (hit & approaching)[:, None]
            impulse = np.sum(rel * normal, axis=-1, keepdims=True) * normal
            vel[:, i] = np.where(m, vel[:, i] - impulse, vel[:, i])
            vel[:, j] = np.where(m, vel[:, j] + impulse, vel[:, j])
            # separate overlap
            push = (2 * radius - dist)[:, None] * 0.5 * normal
            pos[:, i] = np.where(m, pos[:, i] + push, pos[:, i])
            pos[:, j] = np.where(m, pos[:, j] - push, pos[:, j])
    return pos, vel


def generate_bouncing_ball(
    num_sequences: int = 5000,
    seq_len: int = 20,
    img_size: int = 32,
    radius: float = 3.0,
    speed: float = 2.0,
    num_balls: int = 1,
    seed: int = 0,
    render_chunk: int = 256,
    dtype=np.float32,
) -> Dict[str, np.ndarray]:
    """Returns {'images': (N,T,H,W) in [0,1], 'state': (N,T,4*num_balls)}."""
    rng = np.random.default_rng(seed)
    N, T, S = num_sequences, seq_len, img_size

    pos = rng.uniform(radius + 1, S - radius - 1, size=(N, num_balls, 2))
    angle = rng.uniform(0, 2 * np.pi, size=(N, num_balls))
    vel = speed * np.stack([np.cos(angle), np.sin(angle)], axis=-1)

    positions = np.empty((N, T, num_balls, 2), np.float32)
    velocities = np.empty((N, T, num_balls, 2), np.float32)
    for t in range(T):
        positions[:, t] = pos
        velocities[:, t] = vel
        pos, vel = _step(pos, vel, radius, S)

    # render: anti-aliased disc per ball via distance field, chunked over N*T
    yy, xx = np.mgrid[0:S, 0:S].astype(np.float32)
    images = np.empty((N, T, S, S), dtype)
    flat_pos = positions.reshape(N * T, num_balls, 2)
    for start in range(0, N * T, render_chunk):
        p = flat_pos[start : start + render_chunk]  # [c,nb,2]
        dx = xx[None, None] - p[:, :, 0, None, None]
        dy = yy[None, None] - p[:, :, 1, None, None]
        dist = np.sqrt(dx * dx + dy * dy)
        disc = np.clip(radius + 0.5 - dist, 0.0, 1.0)  # 1px soft edge
        frame = np.clip(disc.sum(axis=1), 0.0, 1.0)
        images.reshape(N * T, S, S)[start : start + render_chunk] = frame

    state = np.concatenate([positions, velocities], axis=-1).reshape(N, T, -1)
    return {"images": images, "state": state.astype(np.float32)}


def generate_bouncing_ball_device(
    num_sequences: int = 5000,
    seq_len: int = 20,
    img_size: int = 32,
    radius: float = 3.0,
    speed: float = 2.0,
    num_balls: int = 1,
    seed: int = 0,
    dtype=np.float32,
) -> Dict[str, np.ndarray]:
    """On-device (XLA) twin of `generate_bouncing_ball`: identical physics and
    rendering math compiled to one program (`lax.scan` over frames, physics
    and the anti-aliased disc render vectorized over all sequences/balls).
    ~40x faster than the numpy path on a TPU chip and the 'generation on
    device' capability for data-hungry sweeps. Initial conditions come from
    the same numpy RNG stream, so a given seed describes the same episode
    set; frame values may differ from the numpy render in the last float32
    ulp. Returns jax device arrays (host callers: np.asarray)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    N, T, S, nb = num_sequences, seq_len, img_size, num_balls
    pos0 = rng.uniform(radius + 1, S - radius - 1, size=(N, nb, 2)).astype(np.float32)
    angle = rng.uniform(0, 2 * np.pi, size=(N, nb)).astype(np.float32)
    vel0 = speed * np.stack([np.cos(angle), np.sin(angle)], axis=-1)

    def step_physics(pos, vel, substeps=2):
        for _ in range(substeps):
            pos = pos + vel / substeps
            for axis in (0, 1):
                low = pos[..., axis] < radius
                high = pos[..., axis] > S - radius
                p_ax = jnp.where(low, 2 * radius - pos[..., axis], pos[..., axis])
                p_ax = jnp.where(high, 2 * (S - radius) - p_ax, p_ax)
                v_ax = jnp.where(low | high, -vel[..., axis], vel[..., axis])
                pos = pos.at[..., axis].set(p_ax)
                vel = vel.at[..., axis].set(v_ax)
            if nb > 1:
                for i in range(nb):
                    for j in range(i + 1, nb):
                        d = pos[:, i] - pos[:, j]
                        dist = jnp.linalg.norm(d, axis=-1)
                        normal = d / jnp.maximum(dist, 1e-6)[:, None]
                        rel = vel[:, i] - vel[:, j]
                        rn = jnp.sum(rel * normal, axis=-1)
                        m = ((dist < 2 * radius) & (rn < 0))[:, None]
                        impulse = rn[:, None] * normal
                        vel = vel.at[:, i].set(jnp.where(m, vel[:, i] - impulse, vel[:, i]))
                        vel = vel.at[:, j].set(jnp.where(m, vel[:, j] + impulse, vel[:, j]))
                        push = (2 * radius - dist)[:, None] * 0.5 * normal
                        pos = pos.at[:, i].set(jnp.where(m, pos[:, i] + push, pos[:, i]))
                        pos = pos.at[:, j].set(jnp.where(m, pos[:, j] - push, pos[:, j]))
        return pos, vel

    grid = jnp.arange(S, dtype=jnp.float32)
    xx = jnp.broadcast_to(grid[None, :], (S, S))      # column index
    yy = jnp.broadcast_to(grid[:, None], (S, S))      # row index

    def render(pos):
        dx = xx[None, None] - pos[:, :, 0, None, None]
        dy = yy[None, None] - pos[:, :, 1, None, None]
        dist = jnp.sqrt(dx * dx + dy * dy)
        disc = jnp.clip(radius + 0.5 - dist, 0.0, 1.0)
        return jnp.clip(disc.sum(axis=1), 0.0, 1.0)   # [N,S,S]

    @jax.jit
    def run(pos, vel):
        def body(carry, _):
            pos, vel = carry
            img = render(pos)
            st = jnp.concatenate([pos, vel], axis=-1).reshape(N, -1)
            return step_physics(pos, vel), (img, st)

        _, (imgs, states) = jax.lax.scan(body, (pos, vel), None, length=T)
        return jnp.swapaxes(imgs, 0, 1), jnp.swapaxes(states, 0, 1)

    imgs, states = run(jnp.asarray(pos0), jnp.asarray(vel0))
    # Return the device arrays themselves — the dataset/loader stack keeps
    # them in HBM (npz_dataset.materialize gathers on device); np.asarray on
    # the caller side fetches to host when actually needed. A forced host
    # round trip here costs minutes for GB-scale datasets on tunneled TPUs.
    return {
        "images": imgs.astype(dtype),
        "state": states,
    }


def save_npz(path: str, data: Dict[str, np.ndarray]):
    np.savez_compressed(path, **data)
