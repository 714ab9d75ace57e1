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
    """diffusers.utils.BaseOutput — dataclass base. Subclasses are plain
    @dataclass-es; support tuple-style `out[0]` like the real one."""

    def __getitem__(self, i):
        import dataclasses

        return tuple(
            getattr(self, f.name) for f in dataclasses.fields(self)
        )[i]


def is_xformers_available() -> bool:
    return False


# ==========================================================================
# Infrastructure for importing the reference's FULL UNet stack
# (unet_3d.py + unet_3d_blocks.py + transformer_3d.py + resnet.py and
# unet_2d_condition.py + unet_2d_blocks.py + transformer_2d.py) whole.
# Numerics-exact where the module sits on the forward path
# (Timesteps/TimestepEmbedding/ResnetBlock2D/Down-Upsample2D); minimal
# import-satisfying classes elsewhere (exotic embeddings the shipped
# configs never enable).
# ==========================================================================
import functools
import inspect
import json


class FrozenConfig(dict):
    """diffusers FrozenDict-alike: attribute access over config keys."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)


def register_to_config(init):
    """diffusers.configuration_utils.register_to_config — records the bound
    init arguments (defaults applied) into self._internal_dict."""

    @functools.wraps(init)
    def wrapper(self, *args, **kwargs):
        sig = inspect.signature(init)
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
        self._internal_dict = FrozenConfig(cfg)
        init(self, *args, **kwargs)

    wrapper._is_register_to_config = True
    return wrapper


class ConfigMixin:
    @property
    def config(self):
        return self._internal_dict

    @classmethod
    def load_config(cls, path):
        with open(path) as f:
            return json.load(f)

    @classmethod
    def from_config(cls, config, **kwargs):
        """Instantiate with the signature-expected subset; surplus config
        keys are still recorded on the instance's config (the reference
        forward reads e.g. `config.center_input_sample`, an SD1.5
        config.json key that is NOT an init arg of UNet3DConditionModel)."""
        cfg = dict(config)
        cfg.update(kwargs)
        params = inspect.signature(cls.__init__).parameters
        expected = {
            k: v for k, v in cfg.items() if k in params and k != "self"
        }
        model = cls(**expected)
        for k, v in cfg.items():
            if k not in model._internal_dict and not k.startswith("_"):
                model._internal_dict[k] = v
        return model


class ModelMixin(nn.Module):
    _supports_gradient_checkpointing = False

    def __getattr__(self, name):
        """Like diffusers: attributes not found on the module fall back to
        registered config values (e.g. Transformer3DModel.forward reads
        `self.use_audio_module`, which only exists in the config)."""
        try:
            return super().__getattr__(name)
        except AttributeError:
            d = self.__dict__.get("_internal_dict")
            if d is not None and name in d:
                return d[name]
            raise

    @property
    def dtype(self):
        try:
            return next(self.parameters()).dtype
        except StopIteration:  # pragma: no cover
            return torch.float32

    @property
    def device(self):
        try:
            return next(self.parameters()).device
        except StopIteration:  # pragma: no cover
            return torch.device("cpu")

    def enable_gradient_checkpointing(self):
        self.apply(
            lambda m: setattr(m, "gradient_checkpointing", True)
            if hasattr(m, "gradient_checkpointing")
            else None
        )


def get_activation(name: str) -> nn.Module:
    """diffusers.models.activations.get_activation."""
    return {
        "silu": nn.SiLU, "swish": nn.SiLU, "mish": nn.Mish,
        "gelu": nn.GELU, "relu": nn.ReLU,
    }[name]()


class LoRACompatibleLinear(nn.Linear):
    """diffusers.models.lora.LoRACompatibleLinear — plain Linear whose
    forward tolerates the lora `scale` argument."""

    def forward(self, x, scale: float = 1.0):
        return super().forward(x)


class LoRACompatibleConv(nn.Conv2d):
    def forward(self, x, scale: float = 1.0):
        return super().forward(x)


def get_timestep_embedding(
    timesteps, embedding_dim, flip_sin_to_cos=False,
    downscale_freq_shift=1.0, scale=1.0, max_period=10000,
):
    """diffusers.models.embeddings.get_timestep_embedding (exact)."""
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * torch.arange(
        half_dim, dtype=torch.float32, device=timesteps.device
    )
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = torch.exp(exponent)
    emb = timesteps[:, None].float() * emb[None, :]
    emb = scale * emb
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half_dim:], emb[:, :half_dim]], dim=-1)
    if embedding_dim % 2 == 1:  # pragma: no cover
        emb = torch.nn.functional.pad(emb, (0, 1, 0, 0))
    return emb


class Timesteps(nn.Module):
    def __init__(self, num_channels, flip_sin_to_cos, downscale_freq_shift):
        super().__init__()
        self.num_channels = num_channels
        self.flip_sin_to_cos = flip_sin_to_cos
        self.downscale_freq_shift = downscale_freq_shift

    def forward(self, timesteps):
        return get_timestep_embedding(
            timesteps, self.num_channels,
            flip_sin_to_cos=self.flip_sin_to_cos,
            downscale_freq_shift=self.downscale_freq_shift,
        )


class TimestepEmbedding(nn.Module):
    """state-dict keys linear_1/linear_2 (+ optional cond_proj)."""

    def __init__(self, in_channels, time_embed_dim, act_fn="silu",
                 out_dim=None, post_act_fn=None, cond_proj_dim=None):
        super().__init__()
        self.linear_1 = LoRACompatibleLinear(in_channels, time_embed_dim)
        self.cond_proj = (
            nn.Linear(cond_proj_dim, in_channels, bias=False)
            if cond_proj_dim is not None else None
        )
        self.act = get_activation(act_fn)
        self.linear_2 = LoRACompatibleLinear(
            time_embed_dim, out_dim or time_embed_dim
        )
        self.post_act = get_activation(post_act_fn) if post_act_fn else None

    def forward(self, sample, condition=None):
        if condition is not None:  # pragma: no cover
            sample = sample + self.cond_proj(condition)
        sample = self.linear_1(sample)
        sample = self.act(sample)
        sample = self.linear_2(sample)
        if self.post_act is not None:  # pragma: no cover
            sample = self.post_act(sample)
        return sample


class ResnetBlock2D(nn.Module):
    """diffusers.models.resnet.ResnetBlock2D (v0.24 numerics, default
    time_embedding_norm)."""

    def __init__(self, *, in_channels, out_channels=None, conv_shortcut=False,
                 dropout=0.0, temb_channels=512, groups=32, groups_out=None,
                 pre_norm=True, eps=1e-6, non_linearity="swish",
                 time_embedding_norm="default", output_scale_factor=1.0,
                 use_in_shortcut=None, up=False, down=False,
                 conv_shortcut_bias=True, conv_2d_out_channels=None, **unused):
        super().__init__()
        assert time_embedding_norm == "default", time_embedding_norm
        assert not up and not down
        out_channels = out_channels or in_channels
        self.output_scale_factor = output_scale_factor
        self.norm1 = nn.GroupNorm(groups, in_channels, eps=eps, affine=True)
        self.conv1 = LoRACompatibleConv(in_channels, out_channels, 3, 1, 1)
        self.time_emb_proj = (
            LoRACompatibleLinear(temb_channels, out_channels)
            if temb_channels is not None else None
        )
        self.norm2 = nn.GroupNorm(groups_out or groups, out_channels,
                                  eps=eps, affine=True)
        self.dropout = nn.Dropout(dropout)
        conv_2d_out_channels = conv_2d_out_channels or out_channels
        self.conv2 = LoRACompatibleConv(out_channels, conv_2d_out_channels, 3, 1, 1)
        self.nonlinearity = get_activation(non_linearity)
        self.use_in_shortcut = (
            in_channels != conv_2d_out_channels
            if use_in_shortcut is None else use_in_shortcut
        )
        self.conv_shortcut = (
            LoRACompatibleConv(in_channels, conv_2d_out_channels, 1, 1, 0,
                               bias=conv_shortcut_bias)
            if self.use_in_shortcut else None
        )

    def forward(self, input_tensor, temb, scale: float = 1.0):
        hidden_states = self.norm1(input_tensor)
        hidden_states = self.nonlinearity(hidden_states)
        hidden_states = self.conv1(hidden_states)
        if temb is not None:
            temb = self.time_emb_proj(self.nonlinearity(temb))[:, :, None, None]
            hidden_states = hidden_states + temb
        hidden_states = self.norm2(hidden_states)
        hidden_states = self.nonlinearity(hidden_states)
        hidden_states = self.dropout(hidden_states)
        hidden_states = self.conv2(hidden_states)
        if self.conv_shortcut is not None:
            input_tensor = self.conv_shortcut(input_tensor)
        return (input_tensor + hidden_states) / self.output_scale_factor


class Downsample2D(nn.Module):
    def __init__(self, channels, use_conv=False, out_channels=None,
                 padding=1, name="conv"):
        super().__init__()
        self.channels = channels
        self.out_channels = out_channels or channels
        self.use_conv = use_conv
        self.padding = padding
        if use_conv:
            conv = LoRACompatibleConv(self.channels, self.out_channels, 3,
                                      stride=2, padding=padding)
        else:  # pragma: no cover
            conv = nn.AvgPool2d(kernel_size=2, stride=2)
        self.conv = conv

    def forward(self, hidden_states, scale: float = 1.0):
        assert hidden_states.shape[1] == self.channels
        if self.use_conv and self.padding == 0:  # pragma: no cover
            hidden_states = torch.nn.functional.pad(
                hidden_states, (0, 1, 0, 1), mode="constant", value=0
            )
        return self.conv(hidden_states)


class Upsample2D(nn.Module):
    def __init__(self, channels, use_conv=False, use_conv_transpose=False,
                 out_channels=None, name="conv"):
        super().__init__()
        assert not use_conv_transpose
        self.channels = channels
        self.out_channels = out_channels or channels
        self.use_conv = use_conv
        if use_conv:
            self.conv = LoRACompatibleConv(
                self.channels, self.out_channels, 3, padding=1
            )

    def forward(self, hidden_states, output_size=None, scale: float = 1.0):
        assert hidden_states.shape[1] == self.channels
        if output_size is None:
            hidden_states = torch.nn.functional.interpolate(
                hidden_states, scale_factor=2.0, mode="nearest"
            )
        else:
            hidden_states = torch.nn.functional.interpolate(
                hidden_states, size=output_size, mode="nearest"
            )
        if self.use_conv:
            hidden_states = self.conv(hidden_states)
        return hidden_states


class _UnusedModule(nn.Module):
    """Import-satisfying stand-in for diffusers classes the shipped MMGT
    configs never instantiate (exotic time/text embeddings, dual
    transformer, added-KV processors)."""

    def __init__(self, *a, **k):  # pragma: no cover
        super().__init__()
        raise NotImplementedError(
            f"{type(self).__name__} is not used by the reference configs"
        )


for _name in (
    "GaussianFourierProjection", "ImageHintTimeEmbedding", "ImageProjection",
    "ImageTimeEmbedding", "PositionNet", "TextImageProjection",
    "TextImageTimeEmbedding", "TextTimeEmbedding", "CaptionProjection",
    "AdaLayerNormSingle", "DualTransformer2DModel", "AttnAddedKVProcessor",
):
    globals()[_name] = type(_name, (_UnusedModule,), {})


class AttentionProcessor:  # typing-only in the reference files
    pass


def is_torch_version(op: str, version: str) -> bool:
    cur = tuple(int(p) for p in torch.__version__.split("+")[0].split(".")[:3])
    want = tuple(int(p) for p in version.split(".")[:3])
    return {
        ">=": cur >= want, ">": cur > want, "<=": cur <= want,
        "<": cur < want, "==": cur == want,
    }[op]


def deprecate(*args, **kwargs):
    return None


def scale_lora_layers(model, scale):
    return None


def unscale_lora_layers(model, scale=None):
    return None


def apply_freeu(*args, **kwargs):  # pragma: no cover
    raise NotImplementedError("freeu is not enabled by the reference configs")


class _Logging:
    @staticmethod
    def get_logger(name=None):
        import logging as _pylogging

        return _pylogging.getLogger(name or "diffusers_stub")


class UNet2DConditionLoadersMixin:
    pass


def install() -> None:
    """Inject the fake `diffusers` package into sys.modules (idempotent;
    refuses to shadow a real install)."""
    if "diffusers" in sys.modules:
        return

    def _mod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    pkg = _mod("diffusers")
    configuration_utils = _mod(
        "diffusers.configuration_utils",
        ConfigMixin=ConfigMixin, register_to_config=register_to_config,
        FrozenDict=FrozenConfig,
    )
    loaders = _mod(
        "diffusers.loaders",
        UNet2DConditionLoadersMixin=UNet2DConditionLoadersMixin,
    )
    models = _mod("diffusers.models", ModelMixin=ModelMixin)
    attention = _mod(
        "diffusers.models.attention",
        Attention=Attention, FeedForward=FeedForward,
        AdaLayerNorm=AdaLayerNorm, GEGLU=GEGLU,
    )
    attention_processor = _mod(
        "diffusers.models.attention_processor",
        Attention=Attention, AttnProcessor=AttnProcessor,
        AttentionProcessor=AttentionProcessor,
        AttnAddedKVProcessor=AttnAddedKVProcessor,
        ADDED_KV_ATTENTION_PROCESSORS=(AttnAddedKVProcessor,),
        CROSS_ATTENTION_PROCESSORS=(AttnProcessor,),
    )
    embeddings = _mod(
        "diffusers.models.embeddings",
        SinusoidalPositionalEmbedding=SinusoidalPositionalEmbedding,
        TimestepEmbedding=TimestepEmbedding, Timesteps=Timesteps,
        get_timestep_embedding=get_timestep_embedding,
        GaussianFourierProjection=GaussianFourierProjection,
        ImageHintTimeEmbedding=ImageHintTimeEmbedding,
        ImageProjection=ImageProjection, ImageTimeEmbedding=ImageTimeEmbedding,
        PositionNet=PositionNet, TextImageProjection=TextImageProjection,
        TextImageTimeEmbedding=TextImageTimeEmbedding,
        TextTimeEmbedding=TextTimeEmbedding,
        CaptionProjection=CaptionProjection,
    )
    activations = _mod(
        "diffusers.models.activations", get_activation=get_activation
    )
    resnet = _mod(
        "diffusers.models.resnet",
        ResnetBlock2D=ResnetBlock2D, Downsample2D=Downsample2D,
        Upsample2D=Upsample2D,
    )
    lora = _mod(
        "diffusers.models.lora",
        LoRACompatibleConv=LoRACompatibleConv,
        LoRACompatibleLinear=LoRACompatibleLinear,
    )
    normalization = _mod(
        "diffusers.models.normalization", AdaLayerNormSingle=AdaLayerNormSingle
    )
    dual = _mod(
        "diffusers.models.dual_transformer_2d",
        DualTransformer2DModel=DualTransformer2DModel,
    )
    modeling_utils = _mod(
        "diffusers.models.modeling_utils", ModelMixin=ModelMixin
    )
    utils = _mod(
        "diffusers.utils",
        BaseOutput=BaseOutput, is_xformers_available=is_xformers_available,
        logging=_Logging, deprecate=deprecate,
        is_torch_version=is_torch_version,
        scale_lora_layers=scale_lora_layers,
        unscale_lora_layers=unscale_lora_layers,
        USE_PEFT_BACKEND=False,
        WEIGHTS_NAME="diffusion_pytorch_model.bin",
        SAFETENSORS_WEIGHTS_NAME="diffusion_pytorch_model.safetensors",
    )
    import_utils = _mod(
        "diffusers.utils.import_utils",
        is_xformers_available=is_xformers_available,
    )
    torch_utils = _mod("diffusers.utils.torch_utils", apply_freeu=apply_freeu)
    utils.import_utils = import_utils
    utils.torch_utils = torch_utils
    models.attention = attention
    models.attention_processor = attention_processor
    models.embeddings = embeddings
    models.activations = activations
    models.resnet = resnet
    models.lora = lora
    models.normalization = normalization
    models.dual_transformer_2d = dual
    models.modeling_utils = modeling_utils
    pkg.models = models
    pkg.utils = utils
    pkg.configuration_utils = configuration_utils
    pkg.loaders = loaders
    pkg.ConfigMixin = ConfigMixin
    pkg.ModelMixin = ModelMixin  # audio_proj.py: `from diffusers import ModelMixin`


def load_reference_module(name: str):
    """Import /root/reference/src/models/<name>.py under the stub as part of
    the real `src.models` package (so both the relative imports inside
    unet_3d.py/unet_3d_blocks.py and mutual_self_attention.py's absolute
    `src.models.attention` import resolve to the SAME module objects —
    isinstance checks across reference files depend on that identity)."""
    install()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    return importlib.import_module(f"src.models.{name}")
