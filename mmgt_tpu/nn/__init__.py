from mmgt_tpu.nn.layers import (
    Attention,
    FeedForward,
    GroupNorm,
    LayerNorm,
    TimestepEmbedding,
    timestep_embedding,
)
