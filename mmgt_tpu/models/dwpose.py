"""DWPose networks in flax: YOLOX-L person detector + RTMPose(DW-LL)
whole-body 133-keypoint SimCC estimator.

Native replacement for the reference's onnxruntime sessions
(src/dwpose/wholebody.py:14-27: yolox_l.onnx + dw-ll_ucoco_384.onnx).
Pre/post-processing lives in `mmgt_tpu.data.dwpose_infer`; these modules
produce the same tensors the ONNX graphs emit:
  YOLOX:   (B, 8400, 85)  raw grid predictions (obj/cls sigmoided)
  RTMPose: simcc_x (B, 133, 576), simcc_y (B, 133, 768)

Structure follows the published YOLOX-L (CSPDarknet + PAFPN + decoupled
head) and RTMPose-L (CSPNeXt + RTMCC/GAU head) configurations; ONNX
weight conversion is wired through mmgt_tpu.utils.convert-style mapping
once an ONNX reader is available (no onnxruntime in this image).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mmgt_tpu.nn.layers import LayerNorm


class ConvBnAct(nn.Module):
    out: int
    k: int = 3
    stride: int = 1
    groups: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # mmdet/mmpose ConvModule pads k//2 SYMMETRICALLY; for stride 2 on
        # even extents flax SAME pads (0,1) instead — explicit padding
        # keeps the sampling grid torch-exact (same bug class as
        # blocks.Downsample, tests/test_unet_full_torch_parity.py)
        p = self.k // 2
        x = nn.Conv(
            self.out, (self.k, self.k), strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            feature_group_count=self.groups, use_bias=False,
            dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn")(x)
        return nn.silu(x)


class Focus(nn.Module):
    """Space-to-depth stem (YOLOX)."""

    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        tl = x[:, ::2, ::2]
        bl = x[:, 1::2, ::2]
        tr = x[:, ::2, 1::2]
        br = x[:, 1::2, 1::2]
        x = jnp.concatenate([tl, bl, tr, br], -1)
        return ConvBnAct(self.out, 3, dtype=self.dtype, name="conv")(x)


class Bottleneck(nn.Module):
    out: int
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = ConvBnAct(self.out, 1, dtype=self.dtype, name="conv1")(x)
        h = ConvBnAct(self.out, 3, dtype=self.dtype, name="conv2")(h)
        return x + h if self.shortcut and x.shape[-1] == self.out else h


class CSPLayer(nn.Module):
    out: int
    n: int = 1
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = self.out // 2
        a = ConvBnAct(mid, 1, dtype=self.dtype, name="main")(x)
        b = ConvBnAct(mid, 1, dtype=self.dtype, name="short")(x)
        for i in range(self.n):
            a = Bottleneck(mid, self.shortcut, self.dtype, name=f"block_{i}")(a)
        return ConvBnAct(self.out, 1, dtype=self.dtype, name="final")(
            jnp.concatenate([a, b], -1)
        )


class SPPBottleneck(nn.Module):
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = ConvBnAct(self.out // 2, 1, dtype=self.dtype, name="conv1")(x)
        pools = [h]
        for k in (5, 9, 13):
            pools.append(
                nn.max_pool(h, (k, k), strides=(1, 1), padding="SAME")
            )
        return ConvBnAct(self.out, 1, dtype=self.dtype, name="conv2")(
            jnp.concatenate(pools, -1)
        )


class CSPDarknet(nn.Module):
    """YOLOX-L backbone (width 1.0, depth 1.0)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Focus(64, self.dtype, name="stem")(x)
        x = ConvBnAct(128, 3, 2, dtype=self.dtype, name="dark2_conv")(x)
        x = CSPLayer(128, 3, dtype=self.dtype, name="dark2_csp")(x)
        x = ConvBnAct(256, 3, 2, dtype=self.dtype, name="dark3_conv")(x)
        c3 = CSPLayer(256, 9, dtype=self.dtype, name="dark3_csp")(x)
        x = ConvBnAct(512, 3, 2, dtype=self.dtype, name="dark4_conv")(c3)
        c4 = CSPLayer(512, 9, dtype=self.dtype, name="dark4_csp")(x)
        x = ConvBnAct(1024, 3, 2, dtype=self.dtype, name="dark5_conv")(c4)
        x = SPPBottleneck(1024, self.dtype, name="dark5_spp")(x)
        c5 = CSPLayer(1024, 3, shortcut=False, dtype=self.dtype,
                      name="dark5_csp")(x)
        return c3, c4, c5


def _upsample2(x):
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h * 2, w * 2, c), "nearest")


class YOLOXL(nn.Module):
    """Full YOLOX-L: (B, 640, 640, 3) raw-pixel RGB -> (B, 8400, 85)."""

    num_classes: int = 80
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c3, c4, c5 = CSPDarknet(self.dtype, name="backbone")(x)
        # PAFPN
        p5 = ConvBnAct(512, 1, dtype=self.dtype, name="lateral5")(c5)
        f4 = CSPLayer(512, 3, False, self.dtype, name="fpn_c4")(
            jnp.concatenate([_upsample2(p5), c4], -1)
        )
        p4 = ConvBnAct(256, 1, dtype=self.dtype, name="lateral4")(f4)
        f3 = CSPLayer(256, 3, False, self.dtype, name="fpn_c3")(
            jnp.concatenate([_upsample2(p4), c3], -1)
        )
        d3 = ConvBnAct(256, 3, 2, dtype=self.dtype, name="down3")(f3)
        f4b = CSPLayer(512, 3, False, self.dtype, name="pan_c4")(
            jnp.concatenate([d3, p4], -1)
        )
        d4 = ConvBnAct(512, 3, 2, dtype=self.dtype, name="down4")(f4b)
        f5b = CSPLayer(1024, 3, False, self.dtype, name="pan_c5")(
            jnp.concatenate([d4, p5], -1)
        )

        outs = []
        for i, feat in enumerate((f3, f4b, f5b)):
            h = ConvBnAct(256, 1, dtype=self.dtype, name=f"head_stem_{i}")(feat)
            cls = ConvBnAct(256, 3, dtype=self.dtype, name=f"head_cls0_{i}")(h)
            cls = ConvBnAct(256, 3, dtype=self.dtype, name=f"head_cls1_{i}")(cls)
            reg = ConvBnAct(256, 3, dtype=self.dtype, name=f"head_reg0_{i}")(h)
            reg = ConvBnAct(256, 3, dtype=self.dtype, name=f"head_reg1_{i}")(reg)
            cls_out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                              name=f"cls_pred_{i}")(cls)
            reg_out = nn.Conv(4, (1, 1), dtype=self.dtype,
                              name=f"reg_pred_{i}")(reg)
            obj_out = nn.Conv(1, (1, 1), dtype=self.dtype,
                              name=f"obj_pred_{i}")(reg)
            out = jnp.concatenate(
                [reg_out, jax.nn.sigmoid(obj_out), jax.nn.sigmoid(cls_out)], -1
            )
            outs.append(out.reshape(out.shape[0], -1, out.shape[-1]))
        return jnp.concatenate(outs, 1)


# --------------------------------------------------------------- RTMPose
class CSPNeXtBlock(nn.Module):
    """mmpose CSPNeXtBlock: 3x3 conv to out//2, then a depthwise-separable
    5x5 (depthwise + pointwise ConvModules, each with its own BN+SiLU)."""

    out: int
    add_identity: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = self.out // 2
        h = ConvBnAct(hidden, 3, dtype=self.dtype, name="conv1")(x)
        h = ConvBnAct(hidden, 5, groups=hidden, dtype=self.dtype, name="dw")(h)
        h = ConvBnAct(self.out, 1, dtype=self.dtype, name="pw")(h)
        if self.add_identity and x.shape[-1] == self.out:
            return x + h
        return h


class ChannelAttention(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = jnp.mean(x, axis=(1, 2), keepdims=True)
        w = nn.Conv(c, (1, 1), dtype=self.dtype, name="fc")(w)
        return x * jax.nn.hard_sigmoid(w)


class CSPNeXtLayer(nn.Module):
    out: int
    n: int
    add_identity: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = self.out // 2
        a = ConvBnAct(mid, 1, dtype=self.dtype, name="main")(x)
        b = ConvBnAct(mid, 1, dtype=self.dtype, name="short")(x)
        for i in range(self.n):
            a = CSPNeXtBlock(mid, self.add_identity, self.dtype,
                             name=f"block_{i}")(a)
        h = jnp.concatenate([a, b], -1)
        h = ChannelAttention(self.dtype, name="attn")(h)
        return ConvBnAct(self.out, 1, dtype=self.dtype, name="final")(h)


class ScaleNorm(nn.Module):
    """x / (||x|| * d**-0.5) * g — RTMCC head norm (mmpose ScaleNorm)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (1,), jnp.float32)
        scale = x.shape[-1] ** -0.5
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True) * scale
        return x / jnp.maximum(norm, self.eps) * g


def _rope_half(x: jnp.ndarray) -> jnp.ndarray:
    """Half-split rotary over the token axis (mmpose rtmcc_block.rope)."""
    n, d = x.shape[-3], x.shape[-1]
    half = d // 2
    freqs = 10000.0 ** (-jnp.arange(half, dtype=jnp.float32) / half)
    ang = jnp.arange(n, dtype=jnp.float32)[:, None] * freqs[None]
    sin = jnp.sin(ang)[:, None, :].astype(x.dtype)
    cos = jnp.cos(ang)[:, None, :].astype(x.dtype)
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)


class GAU(nn.Module):
    """Gated attention unit, self-attention mode (mmpose RTMCCBlock).

    SiLU on the whole uv projection before splitting, q/k from a shared
    base via per-head gamma/beta, relu^2 kernel scaled by sqrt(s), learned
    scalar residual scale. RTMPose configs ship pos_enc=False (no rope).
    """

    hidden: int = 256
    expansion: int = 2
    s: int = 128
    pos_enc: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, K, hidden)
        e = self.hidden * self.expansion
        h = ScaleNorm(name="ln")(x)
        uv = nn.Dense(2 * e + self.s, use_bias=False, dtype=self.dtype,
                      name="uv")(h)
        uv = nn.silu(uv)
        u, v, base = jnp.split(uv, [e, 2 * e], axis=-1)
        gamma = self.param("gamma", nn.initializers.normal(1.0), (2, self.s))
        beta = self.param("beta", nn.initializers.zeros, (2, self.s))
        qk = base[..., None, :] * gamma + beta        # (B, K, 2, s)
        if self.pos_enc:
            qk = _rope_half(qk)
        q, k = qk[..., 0, :], qk[..., 1, :]
        attn = jnp.einsum("bnd,bmd->bnm", q, k) / (self.s**0.5)
        attn = jnp.square(nn.relu(attn))
        o = u * jnp.einsum("bnm,bme->bne", attn, v)
        o = nn.Dense(self.hidden, use_bias=False, dtype=self.dtype,
                     name="out")(o)
        res_scale = self.param("res_scale", nn.initializers.ones, (1,),
                               jnp.float32)
        return x * res_scale + o


class RTMPose(nn.Module):
    """DW-LL whole-body: (B, 384, 288, 3) normalized crops ->
    (simcc_x (B, 133, 576), simcc_y (B, 133, 768)).

    CSPNeXt-L backbone (arch P5: stages 128/3, 256/6, 512/6, 1024/3; the
    last stage has no block identity and inserts an SPP) + RTMCC/GAU head.
    """

    num_keypoints: int = 133
    input_wh: Tuple[int, int] = (288, 384)
    split_ratio: float = 2.0
    gau_hidden: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # CSPNeXt-L backbone
        h = ConvBnAct(32, 3, 2, dtype=self.dtype, name="stem0")(x)
        h = ConvBnAct(32, 3, dtype=self.dtype, name="stem1")(h)
        h = ConvBnAct(64, 3, dtype=self.dtype, name="stem2")(h)
        stages = ((128, 3, True, False), (256, 6, True, False),
                  (512, 6, True, False), (1024, 3, False, True))
        for i, (ch, n, ident, spp) in enumerate(stages):
            h = ConvBnAct(ch, 3, 2, dtype=self.dtype, name=f"stage{i}_down")(h)
            if spp:
                h = SPPBottleneck(ch, self.dtype, name=f"stage{i}_spp")(h)
            h = CSPNeXtLayer(ch, n, ident, self.dtype, name=f"stage{i}_csp")(h)

        # RTMCC head: 7x7 conv to K channels, flatten spatial, ScaleNorm+fc,
        # GAU, SimCC fcs
        h = nn.Conv(self.num_keypoints, (7, 7), dtype=self.dtype,
                    name="final_layer")(h)
        b, hh, ww, k = h.shape
        tokens = h.transpose(0, 3, 1, 2).reshape(b, k, hh * ww)
        tokens = ScaleNorm(name="mlp_norm")(tokens)
        tokens = nn.Dense(self.gau_hidden, use_bias=False, dtype=self.dtype,
                          name="mlp")(tokens)
        tokens = GAU(self.gau_hidden, dtype=self.dtype, name="gau")(tokens)
        wx = int(self.input_wh[0] * self.split_ratio)
        wy = int(self.input_wh[1] * self.split_ratio)
        simcc_x = nn.Dense(wx, dtype=self.dtype, name="cls_x")(tokens)
        simcc_y = nn.Dense(wy, dtype=self.dtype, name="cls_y")(tokens)
        return simcc_x, simcc_y
