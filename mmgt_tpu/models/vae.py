"""AutoencoderKL — SD VAE (sd-vae-ft-mse architecture), channel-last.

Replaces the reference's diffusers AutoencoderKL dependency
(scripts/audio2vid.py:194, pipeline VAE encode/decode at
pipeline_pose2vid_long.py:112-125,427-434). Decoding all frames is one
batched call here instead of the reference's per-frame Python loop.

Architecture: 4 down/up stages at channels (128, 256, 512, 512),
2 resnets per encoder stage (3 per decoder stage), single-head mid
attention at 512 channels, latent_channels=4, scaling factor 0.18215.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mmgt_tpu.models.blocks import Downsample, ResnetBlock, Upsample
from mmgt_tpu.nn.layers import Attention, GroupNorm

SD_VAE_SCALE = 0.18215


class VAEAttention(nn.Module):
    """Single-head self-attention over spatial tokens (VAE mid block)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        residual = x
        t = GroupNorm(32, 1e-6, name="group_norm")(x).reshape(n, h * w, c)
        t = Attention(1, c, dtype=self.dtype, name="attn")(t)
        return residual + t.reshape(n, h, w, c)


class Encoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        chans = list(self.block_out_channels)
        h = nn.Conv(chans[0], (3, 3), dtype=self.dtype, name="conv_in")(x)
        for bi, ch in enumerate(chans):
            for li in range(self.layers_per_block):
                h = ResnetBlock(
                    ch, eps=1e-6, dtype=self.dtype, name=f"down_{bi}_res_{li}"
                )(h)
            if bi < len(chans) - 1:
                # diffusers VAE downsampler: padding=0 + F.pad (0,1,0,1) —
                # right/bottom-only, unlike the UNets' symmetric pad 1
                h = Downsample(
                    self.dtype, pad=((0, 1), (0, 1)),
                    name=f"down_{bi}_downsample",
                )(h)
        h = ResnetBlock(chans[-1], eps=1e-6, dtype=self.dtype, name="mid_res_0")(h)
        h = VAEAttention(self.dtype, name="mid_attn")(h)
        h = ResnetBlock(chans[-1], eps=1e-6, dtype=self.dtype, name="mid_res_1")(h)
        h = GroupNorm(32, 1e-6, act="silu", name="conv_norm_out")(h)
        h = nn.Conv(2 * self.latent_channels, (3, 3), dtype=self.dtype, name="conv_out")(h)
        h = nn.Dense(2 * self.latent_channels, dtype=self.dtype, name="quant_conv")(h)
        return h  # (N, h/8, w/8, 8) = concat(mean, logvar)


class Decoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 3
    out_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        chans = list(reversed(self.block_out_channels))  # (512, 512, 256, 128)
        h = nn.Dense(z.shape[-1], dtype=self.dtype, name="post_quant_conv")(z)
        h = nn.Conv(chans[0], (3, 3), dtype=self.dtype, name="conv_in")(h)
        h = ResnetBlock(chans[0], eps=1e-6, dtype=self.dtype, name="mid_res_0")(h)
        h = VAEAttention(self.dtype, name="mid_attn")(h)
        h = ResnetBlock(chans[0], eps=1e-6, dtype=self.dtype, name="mid_res_1")(h)
        for bi, ch in enumerate(chans):
            for li in range(self.layers_per_block):
                h = ResnetBlock(
                    ch, eps=1e-6, dtype=self.dtype, name=f"up_{bi}_res_{li}"
                )(h)
            if bi < len(chans) - 1:
                h = Upsample(self.dtype, name=f"up_{bi}_upsample")(h)
        h = GroupNorm(32, 1e-6, act="silu", name="conv_norm_out")(h)
        return nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """encode(images) -> (mean, logvar); decode(latents) -> images.

    Latents are in the *scaled* space (x SD_VAE_SCALE) at the pipeline
    boundary; `encode_scaled`/`decode_scaled` handle the factor.
    """

    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            self.block_out_channels, 2, self.latent_channels, self.dtype
        )
        self.decoder = Decoder(self.block_out_channels, 3, 3, self.dtype)

    def encode(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(z)

    def encode_scaled(
        self, x: jnp.ndarray, rng: jax.Array = None
    ) -> jnp.ndarray:
        mean, logvar = self.encode(x)
        if rng is not None:
            mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mean.shape, mean.dtype
            )
        return mean * SD_VAE_SCALE

    def decode_scaled(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decode(z / SD_VAE_SCALE)

    def __call__(self, x: jnp.ndarray):
        mean, logvar = self.encode(x)
        return self.decode(mean)
