"""AudioProjModel: per-frame wav2vec feature window -> 32 context tokens.

(B, F, seq_len=5, blocks=12, 768) -> (B, F, 32, 768)
(reference src/models/audio_proj.py:40-124; instantiated with
seq_len=5, blocks=12, channels=768, context_tokens=32 at
scripts/audio2vid.py:222-229).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mmgt_tpu.nn.layers import LayerNorm


class AudioProjModel(nn.Module):
    seq_len: int = 5
    blocks: int = 12
    channels: int = 768
    intermediate_dim: int = 512
    output_dim: int = 768
    context_tokens: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, audio_embeds: jnp.ndarray) -> jnp.ndarray:
        b, f = audio_embeds.shape[:2]
        x = audio_embeds.reshape(b * f, self.seq_len * self.blocks * self.channels)
        x = nn.relu(nn.Dense(self.intermediate_dim, dtype=self.dtype, name="proj1")(x))
        x = nn.relu(nn.Dense(self.intermediate_dim, dtype=self.dtype, name="proj2")(x))
        x = nn.Dense(
            self.context_tokens * self.output_dim, dtype=self.dtype, name="proj3"
        )(x)
        x = x.reshape(b * f, self.context_tokens, self.output_dim)
        x = LayerNorm(name="norm")(x)
        return x.reshape(b, f, self.context_tokens, self.output_dim)
