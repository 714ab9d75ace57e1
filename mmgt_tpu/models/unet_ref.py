"""ReferenceNet: SD1.5-architecture 2D UNet run once per generation on the
reference-image latent; its only useful output is the per-block "bank" of
pre-attention hidden states consumed by the denoising UNet.

Functional re-design of the reference's monkeypatched write-mode
(src/models/unet_2d_condition.py + mutual_self_attention.py:139-148): the
forward returns the 16 bank tensors (6 down + 1 mid + 9 up) as ordinary
outputs, in the same structural order the denoiser consumes them.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from mmgt_tpu.models.blocks import (
    Downsample,
    ResnetBlock,
    SpatialTransformer2D,
    Upsample,
)
from mmgt_tpu.nn.layers import GroupNorm, TimestepEmbedding, timestep_embedding


class ReferenceUNet2D(nn.Module):
    """SD1.5 UNet2DConditionModel used as the reference branch.

    __call__(latent (B, h, w, 4), t (B,), context (B, L, 768))
      -> (sample (B, h, w, 4), banks: list of 16 (B, L_i, C_i))
    """

    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, latent: jnp.ndarray, t: jnp.ndarray, context: jnp.ndarray
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        chans = list(self.block_out_channels)
        n_blocks = len(chans)
        temb = timestep_embedding(t, chans[0])
        temb = TimestepEmbedding(chans[0] * 4, self.dtype, name="time_embedding")(
            temb.astype(self.dtype)
        )

        banks: List[jnp.ndarray] = []
        x = nn.Conv(chans[0], (3, 3), dtype=self.dtype, name="conv_in")(latent)
        res_stack = [x]

        # down: 3 cross-attn blocks + 1 plain block
        for bi in range(n_blocks):
            out_ch = chans[bi]
            has_attn = bi < n_blocks - 1
            for li in range(self.layers_per_block):
                x = ResnetBlock(
                    out_ch, dtype=self.dtype, name=f"down_{bi}_res_{li}"
                )(x, temb)
                if has_attn:
                    x, bank = SpatialTransformer2D(
                        self.heads,
                        out_ch // self.heads,
                        self.dtype,
                        name=f"down_{bi}_attn_{li}",
                    )(x, context)
                    banks.append(bank)
                res_stack.append(x)
            if bi < n_blocks - 1:
                x = Downsample(self.dtype, name=f"down_{bi}_downsample")(x)
                res_stack.append(x)

        # mid
        x = ResnetBlock(chans[-1], dtype=self.dtype, name="mid_res_0")(x, temb)
        x, bank = SpatialTransformer2D(
            self.heads, chans[-1] // self.heads, self.dtype, name="mid_attn"
        )(x, context)
        banks.append(bank)
        x = ResnetBlock(chans[-1], dtype=self.dtype, name="mid_res_1")(x, temb)

        # up: mirrored, layers_per_block+1 resnets each
        rev = list(reversed(chans))
        for bi in range(n_blocks):
            out_ch = rev[bi]
            has_attn = bi > 0
            for li in range(self.layers_per_block + 1):
                skip = res_stack.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = ResnetBlock(out_ch, dtype=self.dtype, name=f"up_{bi}_res_{li}")(
                    x, temb
                )
                if has_attn:
                    x, bank = SpatialTransformer2D(
                        self.heads,
                        out_ch // self.heads,
                        self.dtype,
                        name=f"up_{bi}_attn_{li}",
                    )(x, context)
                    banks.append(bank)
            if bi < n_blocks - 1:
                x = Upsample(self.dtype, name=f"up_{bi}_upsample")(x)

        x = GroupNorm(32, 1e-5, act="silu", name="conv_norm_out")(x)
        x = nn.Conv(latent.shape[-1], (3, 3), dtype=self.dtype, name="conv_out")(x)
        return x, banks
