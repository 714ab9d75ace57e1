"""PoseGuider: ControlNet-lite encoder of the pose skeleton video.

Maps (B, F, H, W, 3) pose frames to (B, F, H/8, W/8, 320) features added to
the UNet's conv_in output (reference src/models/pose_guider.py:12-57;
channels (16, 32, 96, 256) per scripts/audio2vid.py:214). Frames fold into
the batch; conv_out is zero-initialized.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class PoseGuider(nn.Module):
    embedding_channels: int = 320
    block_out_channels: Sequence[int] = (16, 32, 96, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pose: jnp.ndarray) -> jnp.ndarray:
        b, f, h, w, c = pose.shape
        x = pose.reshape(b * f, h, w, c)
        chans = list(self.block_out_channels)
        x = nn.silu(nn.Conv(chans[0], (3, 3), dtype=self.dtype, name="conv_in")(x))
        for i in range(len(chans) - 1):
            x = nn.silu(
                nn.Conv(chans[i], (3, 3), dtype=self.dtype, name=f"block_{i}_conv")(x)
            )
            x = nn.silu(
                nn.Conv(
                    chans[i + 1],
                    (3, 3),
                    strides=(2, 2),
                    # torch pads 1 symmetrically (reference
                    # pose_guider.py:32-35); flax SAME would pad (0,1)
                    padding=((1, 1), (1, 1)),
                    dtype=self.dtype,
                    name=f"block_{i}_down",
                )(x)
            )
        x = nn.Conv(
            self.embedding_channels,
            (3, 3),
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv_out",
        )(x)
        _, h8, w8, c8 = x.shape
        return x.reshape(b, f, h8, w8, c8)
