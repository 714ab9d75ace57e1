"""Torch/diffusers/HF checkpoint -> mmgt_tpu param-tree converter.

One mechanism replaces the reference's scattered loading paths
(UNet3DConditionModel.from_pretrained_2d merge at
src/models/unet_3d.py:627-718, the .pth loads at scripts/audio2vid.py:
244-272, HF from_pretrained for VAE/CLIP/wav2vec): every model exposes a
name-translation function our_key -> torch_key; `convert` walks our
param-tree structure (from jax.eval_shape, so no device memory needed),
pulls tensors from one or more torch state dicts, applies layout
transforms (OIHW->HWIO convs, transposed linears, packed-qkv splits), and
reports missing/unused keys.

The merged Stage-2 load (SD1.5 UNet + AnimateDiff motion ckpt + audio
module ckpt) is just `convert(tree, [sd_unet, motion_sd, audio_sd], ...)`
— later dicts take precedence, like the reference's state_dict.update.
"""
from __future__ import annotations

import re
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np
from flax import traverse_util


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth/.pt/.ckpt/.safetensors file into numpy arrays."""
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # e.g. the microsoft WavLM release pickles an argparse cfg object
        sd = torch.load(path, map_location="cpu", weights_only=False)
    # unwrap common wrapper layouts: HF/lightning "state_dict", and the
    # microsoft WavLM release format {"model": {...}, "cfg": ...}
    for wrapper in ("state_dict", "model"):
        if (
            isinstance(sd, dict)
            and wrapper in sd
            and isinstance(sd[wrapper], dict)
            and not hasattr(sd[wrapper], "numpy")
        ):
            sd = sd[wrapper]
    return fold_weight_norm(
        {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    )


def fold_weight_norm(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Materialize torch weight-norm parametrizations into plain weights.

    HF wav2vec2's pos_conv (and any torch weight_norm module) checkpoints
    as `X.weight_g` + `X.weight_v` (old API) or
    `X.parametrizations.weight.original0/original1` (new API) instead of
    `X.weight`; mappers address the effective weight
    w = g * v / ||v||, with the norm over every axis where g has size 1.
    (Caught by the synthetic-weights drill, tools/synth_weights.py.)"""
    out = dict(sd)
    pairs = []
    for k in sd:
        m = re.match(r"(.*)\.weight_g$", k)
        if m and f"{m.group(1)}.weight_v" in sd:
            pairs.append((m.group(1), k, f"{m.group(1)}.weight_v", ".weight"))
        m = re.match(r"(.*)\.parametrizations\.weight\.original0$", k)
        if m:
            v_key = f"{m.group(1)}.parametrizations.weight.original1"
            if v_key in sd:
                pairs.append((m.group(1), k, v_key, ".weight"))
    for base, g_key, v_key, leaf in pairs:
        g, v = np.asarray(sd[g_key], np.float32), np.asarray(sd[v_key], np.float32)
        axes = tuple(i for i, s in enumerate(g.shape) if s == 1) or tuple(
            range(v.ndim - 1)
        )
        norm = np.sqrt((v.astype(np.float64) ** 2).sum(axis=axes, keepdims=True))
        out[base + leaf] = (g * (v / norm)).astype(sd[v_key].dtype)
        del out[g_key], out[v_key]
    return out


# ------------------------------------------------------------------ layout
def to_flax_tensor(our_key: str, shape, torch_arr: np.ndarray,
                   dtype=None) -> np.ndarray:
    """Torch layout -> flax layout for one tensor, validated against the
    expected flax shape; cast to the target leaf dtype (the reference's
    published checkpoints are fp16 — animation.yaml `weight_dtype: fp16` —
    while our param trees are f32/bf16)."""
    a = torch_arr
    leaf = our_key.rsplit("/", 1)[-1]
    if leaf == "kernel":
        if a.ndim == 4:                      # conv OIHW -> HWIO
            a = a.transpose(2, 3, 1, 0)
        elif a.ndim == 3:                    # conv1d OIW -> WIO
            a = a.transpose(2, 1, 0)
        elif a.ndim == 2:                    # linear (O,I) -> (I,O)
            a = a.T
        if a.shape != tuple(shape) and a.ndim == 4 and a.shape[:2] == (1, 1):
            a = a.reshape(a.shape[2], a.shape[3])  # 1x1 conv -> dense
    if a.shape != tuple(shape):
        # dense <- 1x1 conv stored as (O,I,1,1)
        if torch_arr.ndim == 4 and torch_arr.shape[2:] == (1, 1):
            a = torch_arr[:, :, 0, 0].T
    if a.shape != tuple(shape) and a.size == int(np.prod(shape)):
        a = a.reshape(shape)  # e.g. scalar () <-> (1,) params
    assert a.shape == tuple(shape), (our_key, a.shape, tuple(shape))
    a = np.asarray(a)
    if dtype is not None and a.dtype != dtype:
        a = a.astype(dtype)
    return a


# --------------------------------------------------------- name translation
def _tx_block_suffix(s: str) -> str:
    """Transformer-block-internal names (shared by 2D/3D/audio blocks)."""
    s = s.replace("ff/proj_geglu", "ff.net.0.proj")
    s = s.replace("ff/proj_out", "ff.net.2")
    s = re.sub(r"(attn[\w]*)/to_out", r"\1.to_out.0", s)
    s = re.sub(r"zero_conv_0$", "zero_conv_full", s)
    s = re.sub(r"zero_conv_1$", "zero_conv_face", s)
    s = re.sub(r"zero_conv_2$", "zero_conv_lip", s)
    return s.replace("/", ".")


def _leaf(s: str) -> Tuple[str, str]:
    if "/" not in s:
        return "", s
    path, leaf = s.rsplit("/", 1)
    torch_leaf = {"kernel": "weight", "scale": "weight"}.get(leaf, leaf)
    return path, torch_leaf


def map_unet2d(key: str) -> str:
    """our ReferenceUNet2D key -> diffusers UNet2DConditionModel key."""
    path, leaf = _leaf(key)
    s = path
    s = re.sub(r"^down_(\d+)_res_(\d+)", r"down_blocks.\1.resnets.\2", s)
    s = re.sub(r"^down_(\d+)_attn_(\d+)/block", r"down_blocks.\1.attentions.\2.transformer_blocks.0", s)
    s = re.sub(r"^down_(\d+)_attn_(\d+)", r"down_blocks.\1.attentions.\2", s)
    s = re.sub(r"^down_(\d+)_downsample", r"down_blocks.\1.downsamplers.0", s)
    s = re.sub(r"^up_(\d+)_res_(\d+)", r"up_blocks.\1.resnets.\2", s)
    s = re.sub(r"^up_(\d+)_attn_(\d+)/block", r"up_blocks.\1.attentions.\2.transformer_blocks.0", s)
    s = re.sub(r"^up_(\d+)_attn_(\d+)", r"up_blocks.\1.attentions.\2", s)
    s = re.sub(r"^up_(\d+)_upsample", r"up_blocks.\1.upsamplers.0", s)
    s = re.sub(r"^mid_res_(\d+)", r"mid_block.resnets.\1", s)
    s = re.sub(r"^mid_attn/block", r"mid_block.attentions.0.transformer_blocks.0", s)
    s = re.sub(r"^mid_attn", r"mid_block.attentions.0", s)
    s = _tx_block_suffix(s)
    return f"{s}.{leaf}"


def map_unet3d(key: str) -> str:
    """our DenoisingUNet3D key -> merged reference UNet3D state-dict key
    (SD1.5 names + motion_modules + audio_modules, unet_3d_blocks.py)."""
    path, leaf = _leaf(key)
    s = path
    # motion modules: layer-indexed per block; mid has a single one
    s = re.sub(
        r"^(down|up)_(\d+)_motion_(\d+)",
        r"\1_blocks.\2.motion_modules.\3.temporal_transformer",
        s,
    )
    s = re.sub(r"^mid_motion", r"mid_block.motion_modules.0.temporal_transformer", s)
    s = re.sub(r"/block/attn_(\d+)", r".transformer_blocks.0.attention_blocks.\1", s)
    # motion VersatileAttention wraps its out proj in ModuleList [Linear,
    # Dropout] like every diffusers Attention -> .to_out.0 (the generic
    # `attn*/to_out` rewrite in _tx_block_suffix can't see it once the
    # path segment is `attention_blocks.N`)
    s = re.sub(r"(attention_blocks\.\d+)/to_out", r"\1.to_out.0", s)
    s = re.sub(r"/block/norm_(\d+)", r".transformer_blocks.0.norms.\1", s)
    s = re.sub(r"/block/ff_norm", r".transformer_blocks.0.ff_norm", s)
    s = re.sub(
        r"(temporal_transformer)/block/ff", r"\1.transformer_blocks.0.ff", s
    )
    # audio modules
    s = re.sub(
        r"^down_(\d+)_audio_(\d+)/block",
        r"down_blocks.\1.audio_modules.\2.transformer_blocks.0",
        s,
    )
    s = re.sub(r"^down_(\d+)_audio_(\d+)", r"down_blocks.\1.audio_modules.\2", s)
    return _finish_unet3d(s, leaf, key)


def _finish_unet3d(s: str, leaf: str, key: str) -> str:
    s = re.sub(r"^down_(\d+)_res_(\d+)", r"down_blocks.\1.resnets.\2", s)
    s = re.sub(r"^down_(\d+)_attn_(\d+)/block", r"down_blocks.\1.attentions.\2.transformer_blocks.0", s)
    s = re.sub(r"^down_(\d+)_attn_(\d+)", r"down_blocks.\1.attentions.\2", s)
    s = re.sub(r"^down_(\d+)_downsample", r"down_blocks.\1.downsamplers.0", s)
    s = re.sub(r"^up_(\d+)_res_(\d+)", r"up_blocks.\1.resnets.\2", s)
    s = re.sub(r"^up_(\d+)_attn_(\d+)/block", r"up_blocks.\1.attentions.\2.transformer_blocks.0", s)
    s = re.sub(r"^up_(\d+)_attn_(\d+)", r"up_blocks.\1.attentions.\2", s)
    s = re.sub(r"^up_(\d+)_upsample", r"up_blocks.\1.upsamplers.0", s)
    s = re.sub(r"^mid_res_(\d+)", r"mid_block.resnets.\1", s)
    s = re.sub(r"^mid_attn/block", r"mid_block.attentions.0.transformer_blocks.0", s)
    s = re.sub(r"^mid_attn", r"mid_block.attentions.0", s)
    s = _tx_block_suffix(s)
    return f"{s}.{leaf}"


def map_vae(key: str) -> str:
    path, leaf = _leaf(key)
    s = path
    s = re.sub(r"^(encoder|decoder)/down_(\d+)_res_(\d+)", r"\1.down_blocks.\2.resnets.\3", s)
    s = re.sub(r"^(encoder|decoder)/down_(\d+)_downsample", r"\1.down_blocks.\2.downsamplers.0", s)
    s = re.sub(r"^(encoder|decoder)/up_(\d+)_res_(\d+)", r"\1.up_blocks.\2.resnets.\3", s)
    s = re.sub(r"^(encoder|decoder)/up_(\d+)_upsample", r"\1.up_blocks.\2.upsamplers.0", s)
    s = re.sub(r"^(encoder|decoder)/mid_res_(\d+)", r"\1.mid_block.resnets.\2", s)
    s = re.sub(r"^(encoder|decoder)/mid_attn/attn", r"\1.mid_block.attentions.0", s)
    s = re.sub(r"^(encoder|decoder)/mid_attn", r"\1.mid_block.attentions.0", s)
    s = re.sub(r"^encoder/quant_conv", "quant_conv", s)
    s = re.sub(r"^decoder/post_quant_conv", "post_quant_conv", s)
    s = re.sub(r"/to_out$", ".to_out.0", s)
    s = s.replace("/", ".")
    return f"{s}.{leaf}"


def map_pose_guider(key: str) -> str:
    """our PoseGuider -> reference pose_guider .pth (pose_guider.py:12-57):
    blocks list interleaves [conv, down] pairs as indices 0..5."""
    path, leaf = _leaf(key)
    m = re.match(r"^block_(\d+)_(conv|down)$", path)
    if m:
        i, kind = int(m.group(1)), m.group(2)
        idx = 2 * i + (1 if kind == "down" else 0)
        return f"blocks.{idx}.{leaf}"
    return f"{path.replace('/', '.')}.{leaf}"


def map_audio_proj(key: str) -> str:
    path, leaf = _leaf(key)
    return f"{path.replace('/', '.')}.{leaf}"


def map_clip_vision(key: str) -> str:
    """our CLIPVisionModel -> HF CLIPVisionModelWithProjection."""
    pre = "vision_model."
    if key == "class_embedding":
        return pre + "embeddings.class_embedding"
    if key == "position_embedding":
        return pre + "embeddings.position_embedding.weight"
    path, leaf = _leaf(key)
    s = path
    table = {
        "patch_embed": pre + "embeddings.patch_embedding",
        "pre_norm": pre + "pre_layrnorm",
        "post_norm": pre + "post_layernorm",
        "visual_projection": "visual_projection",
    }
    if s in table:
        return f"{table[s]}.{leaf}"
    m = re.match(r"^layer_(\d+)/(.*)$", s)
    if m:
        i, rest = m.group(1), m.group(2)
        rest = {
            "ln1": "layer_norm1",
            "ln2": "layer_norm2",
            "q_proj": "self_attn.q_proj",
            "k_proj": "self_attn.k_proj",
            "v_proj": "self_attn.v_proj",
            "out_proj": "self_attn.out_proj",
            "fc1": "mlp.fc1",
            "fc2": "mlp.fc2",
        }[rest]
        return f"{pre}encoder.layers.{i}.{rest}.{leaf}"
    raise KeyError(key)


def map_wav2vec2(key: str) -> str:
    """our Wav2Vec2Model -> HF Wav2Vec2Model state dict."""
    path, leaf = _leaf(key)
    s = path
    m = re.match(r"^feature_extractor/conv_(\d+)$", s)
    if m:
        return f"feature_extractor.conv_layers.{m.group(1)}.conv.{leaf}"
    if key.startswith("feature_extractor/gn_0"):
        l = "weight" if key.endswith("scale") else "bias"
        return f"feature_extractor.conv_layers.0.layer_norm.{l}"
    table = {
        "fp_norm": "feature_projection.layer_norm",
        "fp_proj": "feature_projection.projection",
        "encoder_norm": "encoder.layer_norm",
        "pos_conv/conv": "encoder.pos_conv_embed.conv",
    }
    if s in table:
        return f"{table[s]}.{leaf}"
    m = re.match(r"^layer_(\d+)/(.*)$", s)
    if m:
        i, rest = m.group(1), m.group(2)
        rest = {
            "q_proj": "attention.q_proj",
            "k_proj": "attention.k_proj",
            "v_proj": "attention.v_proj",
            "out_proj": "attention.out_proj",
            "attn_norm": "layer_norm",
            "ff_in": "feed_forward.intermediate_dense",
            "ff_out": "feed_forward.output_dense",
            "ff_norm": "final_layer_norm",
        }[rest]
        return f"encoder.layers.{i}.{rest}.{leaf}"
    raise KeyError(key)


def map_wavlm(key: str) -> str:
    """our WavLMModel -> microsoft WavLM checkpoint ['model'] keys."""
    m = re.match(r"^layer_(\d+)/attn/grep_a$", key)
    if m:
        return f"encoder.layers.{m.group(1)}.self_attn.grep_a"
    path, leaf = _leaf(key)
    s = path
    m = re.match(r"^feature_extractor/conv_(\d+)$", s)
    if m:
        return f"feature_extractor.conv_layers.{m.group(1)}.0.{leaf}"
    m = re.match(r"^feature_extractor/ln_(\d+)$", s)
    if m:
        return f"feature_extractor.conv_layers.{m.group(1)}.2.1.{leaf}"
    table = {
        "post_extract_norm": "layer_norm",
        "post_extract_proj": "post_extract_proj",
        "pos_conv/conv": "encoder.pos_conv.0",
        "final_norm": "encoder.layer_norm",
    }
    if s in table:
        return f"{table[s]}.{leaf}"
    if key == "layer_0/attn/rel_attn_embed":
        return "encoder.layers.0.self_attn.relative_attention_bias.weight"
    m = re.match(r"^layer_(\d+)/(.*)$", s)
    if m:
        i, rest = m.group(1), m.group(2)
        rest = {
            "attn/q_proj": "self_attn.q_proj",
            "attn/k_proj": "self_attn.k_proj",
            "attn/v_proj": "self_attn.v_proj",
            "attn/out_proj": "self_attn.out_proj",
            "attn/grep_linear": "self_attn.grep_linear",
            "attn/grep_a": "self_attn.grep_a",
            "attn_norm": "self_attn_layer_norm",
            "ff_in": "fc1",
            "ff_out": "fc2",
            "ff_norm": "final_layer_norm",
        }[rest]
        out_leaf = "" if rest.endswith("grep_a") else f".{leaf}"
        return f"encoder.layers.{i}.{rest}{out_leaf}"
    raise KeyError(key)


def split_packed_qkv(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Split torch nn.MultiheadAttention packed in_proj_weight/bias into
    synthetic {base}.q_proj/.k_proj/.v_proj keys so mappers can address the
    three projections independently (rows [0:d], [d:2d], [2d:3d])."""
    out = dict(sd)
    for k in list(sd):
        m = re.match(r"(.*)\.in_proj_(weight|bias)$", k)
        if not m:
            continue
        base, kind = m.groups()
        a = sd[k]
        d = a.shape[0] // 3
        for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
            out[f"{base}.{name}.{kind}"] = a[i * d : (i + 1) * d]
        del out[k]
    return out


def load_smga_state_dict(path: str, ema: bool = True) -> Dict[str, np.ndarray]:
    """Load a reference Stage-1 checkpoint (SMGA.py:305-313: dict with
    ema_state_dict/model_state_dict/optimizer_state_dict/normalizer) and
    return the GestureDecoder state dict with packed qkv pre-split."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and ("ema_state_dict" in ckpt or "model_state_dict" in ckpt):
        key = "ema_state_dict" if ema and "ema_state_dict" in ckpt else "model_state_dict"
        ckpt = ckpt[key]
    sd = {
        k.replace("module.", "", 1) if k.startswith("module.") else k: v.numpy()
        for k, v in ckpt.items()
        if hasattr(v, "numpy")
    }
    return split_packed_qkv(sd)


def map_smga(key: str) -> str:
    """our GestureDecoder (models/smga.py) -> reference Stage-1 checkpoint
    keys (src/audio2pose_model/model.py:324-490), after split_packed_qkv.

    The reference module declares several params its forward never uses
    (per-layer merged `self_attn`, `norm_face_3/norm_body_3`,
    `film_face_3/film_body_3`) — those stay unmapped and show up only in
    report["unexpected"].
    """
    if key in ("null_cond_embed", "null_cond_hidden"):
        return key
    path, leaf = _leaf(key)
    s = path
    # sequential-wrapped singles
    s = re.sub(r"^time_mlp$", "time_mlp.1", s)
    s = re.sub(r"^to_time_cond$", "to_time_cond.0", s)
    s = re.sub(r"^to_time_tokens$", "to_time_tokens.0", s)
    s = re.sub(r"^non_attn_norm$", "non_attn_cond_projection.0", s)
    s = re.sub(r"^non_attn_proj1$", "non_attn_cond_projection.1", s)
    s = re.sub(r"^non_attn_proj2$", "non_attn_cond_projection.3", s)
    # audio cond encoder layers
    s = re.sub(r"^cond_encoder_(\d+)", r"cond_encoder.\1", s)
    # split face/body decoder layers
    s = re.sub(r"^decoder_(\d+)", r"seqTransDecoder.stack.\1", s)
    # attention: our to_q/to_k/to_v/to_out -> synthetic q_proj/... + out_proj
    s = re.sub(r"(self_attn|cross_attn)/to_q$", r"\1.q_proj", s)
    s = re.sub(r"(self_attn|cross_attn)/to_k$", r"\1.k_proj", s)
    s = re.sub(r"(self_attn|cross_attn)/to_v$", r"\1.v_proj", s)
    s = re.sub(r"(self_attn|cross_attn)/to_out$", r"\1.out_proj", s)
    # FiLM generators: our film_x/proj -> block.1 (Sequential[Mish, Linear])
    s = re.sub(r"(film_\w+)/proj$", r"\1.block.1", s)
    return f"{s.replace('/', '.')}.{leaf}"


# ------------------------------------------------------- DWPose (ONNX nets)
def _dwpose_leaf(key: str) -> Tuple[str, str]:
    """Split key into (path, torch leaf) with BatchNorm-stat awareness.

    flax ConvBnAct stores conv/kernel + bn/{scale,bias} in params and
    bn/{mean,var} in batch_stats — torch ConvModule uses .conv.weight,
    .bn.{weight,bias,running_mean,running_var}."""
    key = key.replace("batch_stats/", "", 1) if key.startswith("batch_stats/") else key
    path, leaf = key.rsplit("/", 1) if "/" in key else ("", key)
    leaf = {
        "kernel": "weight", "scale": "weight",
        "mean": "running_mean", "var": "running_var",
    }.get(leaf, leaf)
    return path, leaf


def _map_csp_inner(s: str) -> str:
    """CSPLayer/CSPNeXt internals: our names -> mmdet/mmpose names."""
    s = re.sub(r"/main(/|$)", r"/main_conv\1", s)
    s = re.sub(r"/short(/|$)", r"/short_conv\1", s)
    s = re.sub(r"/final(/|$)", r"/final_conv\1", s)
    s = re.sub(r"/block_(\d+)", r"/blocks.\1", s)
    s = re.sub(r"/attn/fc", "/attention.fc", s)
    s = re.sub(r"/dw(/|$)", r"/conv2.depthwise_conv\1", s)
    s = re.sub(r"/pw(/|$)", r"/conv2.pointwise_conv\1", s)
    return s


def map_yolox(key: str) -> str:
    """our YOLOXL (models/dwpose.py) -> mmdet YOLOX state-dict keys, the
    naming the reference's yolox_l.onnx initializers carry (mmdeploy export
    of mmdet YOLOX-L; reference runs it via onnxruntime,
    src/dwpose/wholebody.py:14-27)."""
    path, leaf = _dwpose_leaf(key)
    s = "/" + path
    # backbone: our dark{n}_* -> mmdet stage{n-1}.{idx}
    s = re.sub(r"/backbone/stem/conv", "/backbone.stem.conv", s)
    for n in (2, 3, 4):
        s = s.replace(f"/backbone/dark{n}_conv", f"/backbone.stage{n - 1}.0")
        s = s.replace(f"/backbone/dark{n}_csp", f"/backbone.stage{n - 1}.1")
    s = s.replace("/backbone/dark5_conv", "/backbone.stage4.0")
    s = s.replace("/backbone/dark5_spp", "/backbone.stage4.1")
    s = s.replace("/backbone/dark5_csp", "/backbone.stage4.2")
    # PAFPN neck
    s = s.replace("/lateral5", "/neck.reduce_layers.0")
    s = s.replace("/lateral4", "/neck.reduce_layers.1")
    s = s.replace("/fpn_c4", "/neck.top_down_blocks.0")
    s = s.replace("/fpn_c3", "/neck.top_down_blocks.1")
    s = s.replace("/down3", "/neck.downsamples.0")
    s = s.replace("/down4", "/neck.downsamples.1")
    s = s.replace("/pan_c4", "/neck.bottom_up_blocks.0")
    s = s.replace("/pan_c5", "/neck.bottom_up_blocks.1")
    s = re.sub(r"/head_stem_(\d+)", r"/neck.out_convs.\1", s)
    # decoupled head
    s = re.sub(r"/head_cls(\d)_(\d+)", r"/bbox_head.multi_level_cls_convs.\2.\1", s)
    s = re.sub(r"/head_reg(\d)_(\d+)", r"/bbox_head.multi_level_reg_convs.\2.\1", s)
    s = re.sub(r"/cls_pred_(\d+)", r"/bbox_head.multi_level_conv_cls.\1", s)
    s = re.sub(r"/reg_pred_(\d+)", r"/bbox_head.multi_level_conv_reg.\1", s)
    s = re.sub(r"/obj_pred_(\d+)", r"/bbox_head.multi_level_conv_obj.\1", s)
    s = _map_csp_inner(s)
    return f"{s[1:].replace('/', '.')}.{leaf}"


def map_rtmpose(key: str) -> str:
    """our RTMPose (models/dwpose.py) -> mmpose RTMPose-L state-dict keys,
    the naming the reference's dw-ll_ucoco_384.onnx initializers carry."""
    # bare params of the RTMCC head
    if key.endswith("gau/gamma") or key.endswith("gau/beta"):
        return f"head.gau.{key.rsplit('/', 1)[-1]}"
    if key.endswith("gau/res_scale"):
        return "head.gau.res_scale.scale"
    path, leaf = _dwpose_leaf(key)
    s = "/" + path
    s = re.sub(r"/stem(\d)", r"/backbone.stem.\1", s)
    s = re.sub(r"/stage(\d)_down", lambda m: f"/backbone.stage{int(m.group(1)) + 1}.0", s)
    s = s.replace("/stage3_spp", "/backbone.stage4.1")
    s = s.replace("/stage3_csp", "/backbone.stage4.2")
    s = re.sub(r"/stage(\d)_csp", lambda m: f"/backbone.stage{int(m.group(1)) + 1}.1", s)
    s = s.replace("/final_layer", "/head.final_layer")
    s = s.replace("/mlp_norm", "/head.mlp.0")
    s = s.replace("/mlp", "/head.mlp.1")  # mlp_norm already rewritten above
    s = s.replace("/gau/ln", "/head.gau.ln")
    s = s.replace("/gau/uv", "/head.gau.uv")
    s = s.replace("/gau/out", "/head.gau.o")
    s = s.replace("/cls_x", "/head.cls_x")
    s = s.replace("/cls_y", "/head.cls_y")
    s = _map_csp_inner(s)
    return f"{s[1:].replace('/', '.')}.{leaf}"


MAPPERS: Dict[str, Callable[[str], str]] = {
    "unet2d": map_unet2d,
    "unet3d": lambda k: map_unet3d(k),
    "vae": map_vae,
    "pose_guider": map_pose_guider,
    "audio_proj": map_audio_proj,
    "clip_vision": map_clip_vision,
    "wav2vec2": map_wav2vec2,
    "wavlm": map_wavlm,
    "smga": map_smga,
    "yolox": map_yolox,
    "rtmpose": map_rtmpose,
}


def load_dwpose_weights(onnx_path: str, target_tree: Any, which: str):
    """Fill a YOLOXL/RTMPose param tree from a DWPose .onnx file.

    Reads initializers with the built-in protobuf wire parser
    (utils/onnx_reader.py), folds any explicit BatchNormalization nodes
    into synthetic running-stat keys, and converts via map_yolox /
    map_rtmpose. `which` is "yolox" or "rtmpose"."""
    from mmgt_tpu.utils.onnx_reader import load_onnx

    inits, _nodes = load_onnx(onnx_path)
    # strip common exporter prefixes (mmdeploy wraps the model)
    sd = {}
    for k, v in inits.items():
        k = re.sub(r"^(model|module)\.", "", k)
        sd[k] = v
    return convert(target_tree, [sd], MAPPERS[which])


def split_net_checkpoint(
    sd: Dict[str, np.ndarray],
) -> Dict[str, Dict[str, np.ndarray]]:
    """Split a reference Net-wrapper state dict into per-module dicts.

    The trained stage-2 checkpoint `net-*.pth` is the state dict of
    Net(reference_unet, denoising_unet, pose_guider, audioproj)
    (reference scripts/audio2vid.py:39-61, train_stage_2.py) — every key
    is prefixed with the wrapper attribute name. Returns
    {"reference_unet": {...}, "denoising_unet": {...}, "pose_guider":
    {...}, "audioproj": {...}} with prefixes stripped (unprefixed keys are
    ignored)."""
    out: Dict[str, Dict[str, np.ndarray]] = {
        "reference_unet": {},
        "denoising_unet": {},
        "pose_guider": {},
        "audioproj": {},
    }
    for k, v in sd.items():
        for prefix, d in out.items():
            if k.startswith(prefix + "."):
                d[k[len(prefix) + 1 :]] = v
                break
    return out


# ----------------------------------------------------------------- convert
def convert(
    target_tree: Any,
    state_dicts: Sequence[Dict[str, np.ndarray]],
    mapper: Callable[[str], str],
    missing_ok: Sequence[str] = (),
) -> Tuple[Any, Dict[str, List[str]]]:
    """Fill a param tree (shapes from eval_shape or a real tree) from torch
    state dicts (later dicts win). Returns (tree, report).

    Missing params fail loudly (KeyError) unless their flat key matches one
    of the `missing_ok` regexes — an explicit allowlist for modules the
    checkpoint legitimately lacks (e.g. motion/audio modules when loading a
    bare SD1.5 UNet, reference unet_3d.py:627-718). Allowed-missing keys
    keep the target tree's existing value (its real init) when the tree
    holds arrays; eval_shape trees (no values) get zeros. Both are listed
    in report["missing"] so callers can warn.
    """
    merged: Dict[str, np.ndarray] = {}
    for sd in state_dicts:
        merged.update(sd)
    ok_res = [re.compile(p) for p in missing_ok]
    flat = traverse_util.flatten_dict(target_tree, sep="/")
    out = {}
    missing, refused, used = [], [], set()
    for our_key, leaf in flat.items():
        tk = mapper(our_key.replace("params/", "", 1) if our_key.startswith("params/") else our_key)
        if tk not in merged:
            if any(r.search(our_key) for r in ok_res):
                missing.append(f"{our_key} <- {tk}")
                out[our_key] = (
                    leaf
                    if hasattr(leaf, "__array__") or hasattr(leaf, "device")
                    else np.zeros(leaf.shape, leaf.dtype)
                )
            else:
                refused.append(f"{our_key} <- {tk}")
            continue
        used.add(tk)
        out[our_key] = to_flax_tensor(
            our_key, leaf.shape, merged[tk], getattr(leaf, "dtype", None)
        )
    if refused:
        raise KeyError(
            f"{len(refused)} params missing from checkpoint and not covered "
            f"by missing_ok, e.g. {refused[:5]}. Pass missing_ok=[regex,...] "
            "only for modules the checkpoint legitimately lacks."
        )
    unexpected = [k for k in merged if k not in used]
    report = {"missing": missing, "unexpected": unexpected}
    tree = traverse_util.unflatten_dict(out, sep="/")
    return tree, report
