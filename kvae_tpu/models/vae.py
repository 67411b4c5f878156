"""Convolutional VAE: Encoder / Decoder / VAE wrapper (flax.linen).

Architecture parity with the reference, laid out NHWC (the TPU-native conv
layout — the public API still speaks [B,T,C,H,W] like the reference data):
  - Encoder  <- reference kvae/vae/vae.py:11-64
    Conv stack (channels cfg, k=3, s=2, p=1) + ReLU; flatten; fc_mu linear;
    fc_var = sigmoid(linear) so the emitted VARIANCE is
    noise_emission * sigmoid(.) in (0, noise_emission) — not a log-var.
  - Decoder  <- reference kvae/vae/vae.py:67-116
    Dense a -> (C0, s, s) with s = img_size / 2^len(channels); per stage
    Conv(k3, p1) -> depth-to-space(2) -> ReLU; final Conv -> depth-to-space
    to image channels. Outputs logits (Bernoulli) or means (Gaussian).
  - VAE wrapper <- reference kvae/vae/vae.py:119-242 (sequence forward,
    sample_from_prior).

compute_dtype: convs/matmuls may run in bfloat16 (config.compute_dtype);
outputs and the distribution heads are always float32.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from kvae_tpu.config import KVAEConfig


def depth_to_space(x: jax.Array, r: int) -> jax.Array:
    """NHWC depth-to-space (PixelShuffle): [N,H,W,C*r^2] -> [N,H*r,W*r,C]."""
    n, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(n, h, w, r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * r, w * r, c)


def _dtype(config: KVAEConfig):
    return jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32


class Encoder(nn.Module):
    """Image [N,H,W,C] -> (mu, var) of q(a|x), both [N, a_dim] float32."""

    config: KVAEConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        cfg = self.config
        dt = _dtype(cfg)
        k, s, p = cfg.encoder_kernel_size, cfg.encoder_stride, cfg.encoder_padding
        h = x.astype(dt)
        for ch in cfg.encoder_channels:
            h = nn.Conv(ch, (k, k), strides=(s, s), padding=[(p, p), (p, p)], dtype=dt)(h)
            h = nn.relu(h)
        h = h.reshape(h.shape[0], -1)
        mu = nn.Dense(cfg.a_dim, dtype=dt, name="fc_mu")(h).astype(jnp.float32)
        var_gate = nn.Dense(cfg.a_dim, dtype=dt, name="fc_var")(h).astype(jnp.float32)
        var = cfg.noise_emission * jax.nn.sigmoid(var_gate)
        return mu, var


class Decoder(nn.Module):
    """Latent [N, a_dim] -> image logits/means [N,H,W,C] float32."""

    config: KVAEConfig

    @nn.compact
    def __call__(self, a: jax.Array) -> jax.Array:
        cfg = self.config
        dt = _dtype(cfg)
        channels = list(cfg.decoder_channels)
        r = 2
        init_size = cfg.img_size // (r ** len(channels))
        h = nn.Dense(channels[0] * init_size * init_size, dtype=dt, name="fc")(a.astype(dt))
        h = h.reshape(h.shape[0], init_size, init_size, channels[0])
        for i in range(len(channels) - 1):
            h = nn.Conv(channels[i + 1] * r * r, (3, 3), padding=[(1, 1), (1, 1)], dtype=dt)(h)
            h = depth_to_space(h, r)
            h = nn.relu(h)
        h = nn.Conv(cfg.img_channels * r * r, (3, 3), padding=[(1, 1), (1, 1)], dtype=dt)(h)
        h = depth_to_space(h, r)
        return h.astype(jnp.float32)


def reparameterize(key: jax.Array, mu: jax.Array, var: jax.Array) -> jax.Array:
    """a = mu + sqrt(var + 1e-6) * eps (reference kvae/model/model.py:81-84)."""
    std = jnp.sqrt(var + 1e-6)
    return mu + std * jax.random.normal(key, mu.shape, dtype=mu.dtype)


class VAE(nn.Module):
    """Standalone sequence VAE (reference kvae/vae/vae.py:119-193).

    Input x: [B,T,C,H,W] (reference layout). RNG stream: 'sample'.
    """

    config: KVAEConfig

    def setup(self):
        self.encoder = Encoder(self.config)
        self.decoder = Decoder(self.config)

    def encode_frames(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """x: [N,C,H,W] -> (mu, var) [N,a_dim]."""
        return self.encoder(jnp.transpose(x, (0, 2, 3, 1)))

    def decode_frames(self, a: jax.Array) -> jax.Array:
        """a: [N,a_dim] -> logits/means [N,C,H,W]."""
        out = self.decoder(a)
        return jnp.transpose(out, (0, 3, 1, 2))

    def __call__(self, x: jax.Array) -> dict:
        b, t = x.shape[:2]
        x_flat = x.reshape((-1,) + x.shape[2:])
        mu, var = self.encode_frames(x_flat)
        a = reparameterize(self.make_rng("sample"), mu, var)
        x_mu = self.decode_frames(a)
        if self.config.out_distr.lower() == "bernoulli":
            x_recon = jax.nn.sigmoid(x_mu)
        else:
            x_recon = x_mu
        unflat = lambda z: z.reshape((b, t) + z.shape[1:])
        return {
            "x_recon": unflat(x_recon),
            "x_recon_mu": unflat(x_mu),
            "x_recon_var": jnp.asarray(self.config.noise_pixel_var, jnp.float32),
            "a_vae": unflat(a),
            "a_mu": unflat(mu),
            "a_var": unflat(var),
        }

    def sample_from_prior(self, n: int = 1) -> jax.Array:
        """Draw a ~ N(0, I), decode (reference vae.py:195-204)."""
        a = jax.random.normal(self.make_rng("sample"), (n, self.config.a_dim))
        return self.decode_frames(a)
