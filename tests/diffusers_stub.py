"""Minimal plain-torch stand-in for the `diffusers` modules the reference's
Stage-2 attention stack imports, so the reference's OWN torch code
(/root/reference/src/models/attention.py, motion_module.py) can be imported
and parity-tested in this image (diffusers itself is not installed; torch and
einops are).

Each class reproduces the exact numerics and state-dict layout of its
diffusers counterpart (diffusers v0.24-era API, the one the reference pins):

  * Attention / AttnProcessor  — diffusers.models.attention_processor
  * FeedForward (GEGLU)        — diffusers.models.attention
  * AdaLayerNorm               — diffusers.models.attention
  * SinusoidalPositionalEmbedding — diffusers.models.embeddings
  * BaseOutput, is_xformers_available — diffusers.utils

`install()` injects the fake package into sys.modules (idempotent);
`load_reference_module(name)` then imports the real reference file by path.
"""
from __future__ import annotations

import importlib.util
import math
import sys
import types

import torch
from torch import nn

REF_MODELS = "/root/reference/src/models"


class AttnProcessor:
    """diffusers.models.attention_processor.AttnProcessor (the default
    torch bmm/softmax processor)."""

    def __call__(
        self,
        attn: "Attention",
        hidden_states,
        encoder_hidden_states=None,
        attention_mask=None,
        temb=None,
        **kwargs,
    ):
        batch_size, sequence_length, _ = (
            hidden_states.shape
            if encoder_hidden_states is None
            else encoder_hidden_states.shape
        )
        attention_mask = attn.prepare_attention_mask(
            attention_mask, sequence_length, batch_size
        )
        query = attn.to_q(hidden_states)
        if encoder_hidden_states is None:
            encoder_hidden_states = hidden_states
        key = attn.to_k(encoder_hidden_states)
        value = attn.to_v(encoder_hidden_states)
        query = attn.head_to_batch_dim(query)
        key = attn.head_to_batch_dim(key)
        value = attn.head_to_batch_dim(value)
        attention_probs = attn.get_attention_scores(query, key, attention_mask)
        hidden_states = torch.bmm(attention_probs, value)
        hidden_states = attn.batch_to_head_dim(hidden_states)
        hidden_states = attn.to_out[0](hidden_states)
        hidden_states = attn.to_out[1](hidden_states)
        return hidden_states


class Attention(nn.Module):
    """diffusers.models.attention_processor.Attention — multi-head
    attention with biasless q/k/v and a biased `to_out.0` projection."""

    def __init__(
        self,
        query_dim: int,
        cross_attention_dim=None,
        heads: int = 8,
        dim_head: int = 64,
        dropout: float = 0.0,
        bias: bool = False,
        upcast_attention: bool = False,
        upcast_softmax: bool = False,
        out_bias: bool = True,
        scale_qk: bool = True,
        eps: float = 1e-5,
        rescale_output_factor: float = 1.0,
        residual_connection: bool = False,
        processor=None,
        **unused,
    ):
        super().__init__()
        self.inner_dim = dim_head * heads
        self.query_dim = query_dim
        self.cross_attention_dim = (
            cross_attention_dim if cross_attention_dim is not None else query_dim
        )
        self.upcast_attention = upcast_attention
        self.upcast_softmax = upcast_softmax
        self.rescale_output_factor = rescale_output_factor
        self.residual_connection = residual_connection
        self.scale = dim_head**-0.5 if scale_qk else 1.0
        self.heads = heads
        self.group_norm = None
        self.spatial_norm = None
        self.norm_cross = None
        self.to_q = nn.Linear(query_dim, self.inner_dim, bias=bias)
        self.to_k = nn.Linear(self.cross_attention_dim, self.inner_dim, bias=bias)
        self.to_v = nn.Linear(self.cross_attention_dim, self.inner_dim, bias=bias)
        self.to_out = nn.ModuleList(
            [nn.Linear(self.inner_dim, query_dim, bias=out_bias), nn.Dropout(dropout)]
        )
        self.processor = processor if processor is not None else AttnProcessor()

    def set_processor(self, processor):
        self.processor = processor

    def forward(
        self, hidden_states, encoder_hidden_states=None, attention_mask=None, **kw
    ):
        return self.processor(
            self,
            hidden_states,
            encoder_hidden_states=encoder_hidden_states,
            attention_mask=attention_mask,
            **kw,
        )

    def head_to_batch_dim(self, tensor, out_dim: int = 3):
        b, seq, dim = tensor.shape
        tensor = tensor.reshape(b, seq, self.heads, dim // self.heads)
        tensor = tensor.permute(0, 2, 1, 3)
        if out_dim == 3:
            tensor = tensor.reshape(b * self.heads, seq, dim // self.heads)
        return tensor

    def batch_to_head_dim(self, tensor):
        bh, seq, d = tensor.shape
        tensor = tensor.reshape(bh // self.heads, self.heads, seq, d)
        return tensor.permute(0, 2, 1, 3).reshape(bh // self.heads, seq, self.heads * d)

    def get_attention_scores(self, query, key, attention_mask=None):
        dtype = query.dtype
        if self.upcast_attention:
            query = query.float()
            key = key.float()
        if attention_mask is None:
            baddbmm_input = torch.empty(
                query.shape[0], query.shape[1], key.shape[1],
                dtype=query.dtype, device=query.device,
            )
            beta = 0
        else:
            baddbmm_input = attention_mask
            beta = 1
        attention_scores = torch.baddbmm(
            baddbmm_input, query, key.transpose(-1, -2), beta=beta, alpha=self.scale
        )
        if self.upcast_softmax:
            attention_scores = attention_scores.float()
        attention_probs = attention_scores.softmax(dim=-1)
        return attention_probs.to(dtype)

    def prepare_attention_mask(self, attention_mask, target_length, batch_size,
                               out_dim: int = 3):
        if attention_mask is None:
            return None
        head_size = self.heads
        if attention_mask.shape[-1] != target_length:
            attention_mask = torch.nn.functional.pad(
                attention_mask, (0, target_length - attention_mask.shape[-1]), value=0.0
            )
        if out_dim == 3 and attention_mask.shape[0] < batch_size * head_size:
            attention_mask = attention_mask.repeat_interleave(head_size, dim=0)
        return attention_mask


class GEGLU(nn.Module):
    def __init__(self, dim_in: int, dim_out: int):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2)

    def forward(self, hidden_states, scale: float = 1.0):
        hidden_states, gate = self.proj(hidden_states).chunk(2, dim=-1)
        return hidden_states * torch.nn.functional.gelu(gate)


class FeedForward(nn.Module):
    """diffusers.models.attention.FeedForward — state dict keys
    net.0.proj.{weight,bias} / net.2.{weight,bias}."""

    def __init__(
        self,
        dim: int,
        dim_out=None,
        mult: int = 4,
        dropout: float = 0.0,
        activation_fn: str = "geglu",
        final_dropout: bool = False,
    ):
        super().__init__()
        assert activation_fn == "geglu", activation_fn
        inner_dim = int(dim * mult)
        dim_out = dim_out if dim_out is not None else dim
        self.net = nn.ModuleList(
            [GEGLU(dim, inner_dim), nn.Dropout(dropout), nn.Linear(inner_dim, dim_out)]
        )
        if final_dropout:
            self.net.append(nn.Dropout(dropout))

    def forward(self, hidden_states, scale: float = 1.0):
        for module in self.net:
            hidden_states = module(hidden_states)
        return hidden_states


class AdaLayerNorm(nn.Module):
    """diffusers.models.attention.AdaLayerNorm (timestep-conditioned LN);
    present for import completeness — the reference instantiates it only
    when num_embeds_ada_norm is set, which the shipped configs never do."""

    def __init__(self, embedding_dim: int, num_embeddings: int):
        super().__init__()
        self.emb = nn.Embedding(num_embeddings, embedding_dim)
        self.silu = nn.SiLU()
        self.linear = nn.Linear(embedding_dim, embedding_dim * 2)
        self.norm = nn.LayerNorm(embedding_dim, elementwise_affine=False)

    def forward(self, x, timestep):
        emb = self.linear(self.silu(self.emb(timestep)))
        scale, shift = torch.chunk(emb, 2, dim=-1)
        return self.norm(x) * (1 + scale) + shift


class SinusoidalPositionalEmbedding(nn.Module):
    """diffusers.models.embeddings.SinusoidalPositionalEmbedding."""

    def __init__(self, embed_dim: int, max_seq_length: int = 32):
        super().__init__()
        position = torch.arange(max_seq_length).unsqueeze(1)
        div_term = torch.exp(
            torch.arange(0, embed_dim, 2) * (-math.log(10000.0) / embed_dim)
        )
        pe = torch.zeros(1, max_seq_length, embed_dim)
        pe[0, :, 0::2] = torch.sin(position * div_term)
        pe[0, :, 1::2] = torch.cos(position * div_term)
        self.register_buffer("pe", pe)

    def forward(self, x):
        return x + self.pe[:, : x.shape[1]]


class BaseOutput:
    """diffusers.utils.BaseOutput — dataclass base; only subclassed, never
    instantiated on the code paths under test."""


def is_xformers_available() -> bool:
    return False


def install() -> None:
    """Inject the fake `diffusers` package into sys.modules (idempotent;
    refuses to shadow a real install)."""
    if "diffusers" in sys.modules:
        return
    pkg = types.ModuleType("diffusers")
    models = types.ModuleType("diffusers.models")
    attention = types.ModuleType("diffusers.models.attention")
    attention.Attention = Attention
    attention.FeedForward = FeedForward
    attention.AdaLayerNorm = AdaLayerNorm
    attention.GEGLU = GEGLU
    attention_processor = types.ModuleType("diffusers.models.attention_processor")
    attention_processor.Attention = Attention
    attention_processor.AttnProcessor = AttnProcessor
    embeddings = types.ModuleType("diffusers.models.embeddings")
    embeddings.SinusoidalPositionalEmbedding = SinusoidalPositionalEmbedding
    utils = types.ModuleType("diffusers.utils")
    utils.BaseOutput = BaseOutput
    import_utils = types.ModuleType("diffusers.utils.import_utils")
    import_utils.is_xformers_available = is_xformers_available
    utils.is_xformers_available = is_xformers_available
    utils.import_utils = import_utils
    models.attention = attention
    models.attention_processor = attention_processor
    models.embeddings = embeddings
    pkg.models = models
    pkg.utils = utils
    sys.modules["diffusers"] = pkg
    sys.modules["diffusers.models"] = models
    sys.modules["diffusers.models.attention"] = attention
    sys.modules["diffusers.models.attention_processor"] = attention_processor
    sys.modules["diffusers.models.embeddings"] = embeddings
    sys.modules["diffusers.utils"] = utils
    sys.modules["diffusers.utils.import_utils"] = import_utils


def load_reference_module(name: str):
    """Import /root/reference/src/models/<name>.py under the stub."""
    install()
    key = f"_ref_models_{name}"
    if key in sys.modules:
        return sys.modules[key]
    spec = importlib.util.spec_from_file_location(key, f"{REF_MODELS}/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[key] = mod
    spec.loader.exec_module(mod)
    return mod
