"""Pose sequence conv VAE (EmbeddingNet).

Rebuild of the reference's motion_autoencoder
(src/audio2pose_model/motion_autoencoder.py:38-204: PoseEncoderConv /
PoseDecoderConv / EmbeddingNet). Note: the reference never imports this
module anywhere (SURVEY §2.2 marks it dead code); it is provided for
inventory parity and as a usable pose-embedding utility.

(T, D) pose sequences -> 32-d latent -> reconstruction, via 1-D convs
over time.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class PoseEncoderConv(nn.Module):
    latent_dim: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, poses: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """poses (B, T, D) -> (mu, logvar), each (B, latent_dim)."""
        x = poses
        for i, (ch, stride) in enumerate([(32, 1), (64, 2), (64, 1)]):
            x = nn.Conv(ch, (3,), strides=(stride,), dtype=self.dtype,
                        name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, 0.2)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(256, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(128, dtype=self.dtype, name="fc2")(x))
        mu = nn.Dense(self.latent_dim, dtype=self.dtype, name="fc_mu")(x)
        logvar = nn.Dense(self.latent_dim, dtype=self.dtype, name="fc_logvar")(x)
        return mu, logvar


class PoseDecoderConv(nn.Module):
    length: int
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        """(B, latent) -> (B, T, D)."""
        b = z.shape[0]
        x = nn.relu(nn.Dense(64, dtype=self.dtype, name="pre_fc1")(z))
        x = nn.Dense(self.length * 4, dtype=self.dtype, name="pre_fc2")(x)
        x = x.reshape(b, self.length, 4)
        for i, ch in enumerate([32, 32]):
            x = nn.Conv(ch, (3,), dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, 0.2)
        return nn.Conv(self.dim, (3,), dtype=self.dtype, name="conv_out")(x)


class EmbeddingNet(nn.Module):
    """VAE over pose sequences; deterministic at eval (mu)."""

    length: int = 80
    dim: int = 402
    latent_dim: int = 32
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = PoseEncoderConv(self.latent_dim, self.dtype)
        self.decoder = PoseDecoderConv(self.length, self.dim, self.dtype)

    def __call__(
        self, poses: jnp.ndarray, rng: Optional[jax.Array] = None
    ):
        mu, logvar = self.encoder(poses)
        z = mu
        if rng is not None:
            z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mu.shape)
        recon = self.decoder(z)
        return recon, mu, logvar

    def encode(self, poses):
        return self.encoder(poses)[0]
