"""Denoising video UNet: SD1.5 inflated to video with reference-bank
self-attention, MM-HAA masked audio cross-attention, and AnimateDiff-style
temporal motion modules.

TPU-native re-design of the reference UNet3DConditionModel
(src/models/unet_3d.py:33-625 + unet_3d_blocks.py). Key mapping:
  * "inflated" conv/GN  -> frames folded into batch via reshape (NHWC)
  * ReferenceAttentionControl read-mode -> `banks` passed as inputs
  * audio modules: ONLY the three CrossAttn down blocks carry MM-HAA
    3-way masked attention (in this reference revision `get_up_block`/mid
    are never given `use_audio_module`, unet_3d.py:230-256,175-196 — the
    yaml's "up"/"mid" entries are dead config), at mask pyramid levels
    matching their spatial size (64^2/32^2/16^2 for 512^2 input)
  * motion modules: every block incl. mid (motion_module_mid_block=true,
    animation.yaml:58), two temporal self-attns each
  * the audio transformer width quirk (inner dim from block INPUT channels,
    unet_3d_blocks.py:466-470) is reproduced for weight parity.
  * motion_scale quirk: the reference's EVAL path never forwards
    motion_scale into its audio blocks (only the training checkpoint call
    passes it, unet_3d_blocks.py:560-598), so the reference CLI's
    pose/face/lip weights are inert at inference (effective (1,1,1), which
    InferenceConfig defaults to). Ours honors the knob in both modes.

Forward signature (all channel-last):
  latents      (B, F, h, w, 4)
  t            (B,) int32
  context      (B, L_ctx, 768)   CLIP image embedding tokens
  audio_tokens (B, F, 32, 768)   AudioProj context tokens
  pose_feat    (B, F, h, w, 320) PoseGuider output (added after conv_in)
  masks        3 levels x (full, face, lip), each (B, F, L_level)
  banks        list of 16 (B, L_i, C_i) from ReferenceUNet2D
  motion_scale (pose, face, lip) python floats
  n_uncond     static int: first n_uncond batch rows are the CFG uncond
               half — self-only reference attention, and their
               audio_tokens/context MUST be zeroed (as the pipeline
               does): the audio branch is then computed in closed form
               for those rows (blocks.AudioTransformerBlock)
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from mmgt_tpu.models.blocks import (
    Downsample,
    MotionModule,
    ResnetBlock,
    SpatialTransformerAudio,
    SpatialTransformerRef,
    Upsample,
)
from mmgt_tpu.nn.layers import GroupNorm, TimestepEmbedding, timestep_embedding


def _fold(x):
    """(B, F, H, W, C) -> (B*F, H, W, C)"""
    b, f, h, w, c = x.shape
    return x.reshape(b * f, h, w, c)


class DenoisingUNet3D(nn.Module):
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    heads: int = 8
    use_audio_module: bool = True
    use_motion_module: bool = True
    motion_max_len: int = 32
    # activation checkpointing for training memory (the reference's
    # enable_gradient_checkpointing, unet_3d_blocks.py:539-581)
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        latents: jnp.ndarray,
        t: jnp.ndarray,
        context: jnp.ndarray,
        audio_tokens: Optional[jnp.ndarray] = None,
        pose_feat: Optional[jnp.ndarray] = None,
        masks: Optional[Sequence[Tuple[jnp.ndarray, ...]]] = None,
        banks: Optional[List[jnp.ndarray]] = None,
        motion_scale: Sequence[float] = (1.0, 1.0, 1.0),
        n_uncond: int = 0,
        bank_gate: Optional[jnp.ndarray] = None,
        banks_kv: Optional[List[Tuple[jnp.ndarray, jnp.ndarray]]] = None,
    ) -> jnp.ndarray:
        b, f, hh, ww, cin = latents.shape
        if self.remat:
            import functools as _ft

            RB = nn.remat(ResnetBlock, static_argnums=())
            ST = nn.remat(SpatialTransformerRef, static_argnums=(4,))
            MM = nn.remat(MotionModule, static_argnums=(2,))
        else:
            RB, ST, MM = ResnetBlock, SpatialTransformerRef, MotionModule
        if banks is not None and bank_gate is None:
            # first n_uncond batch rows (CFG uncond half) ignore the bank
            bank_gate = (jnp.arange(b) >= n_uncond).astype(jnp.int32)
        chans = list(self.block_out_channels)
        n_blocks = len(chans)

        temb = timestep_embedding(t, chans[0])
        temb = TimestepEmbedding(chans[0] * 4, self.dtype, name="time_embedding")(
            temb.astype(self.dtype)
        )
        temb_f = jnp.repeat(temb, f, axis=0)  # (B*F, 1280)
        context = jnp.repeat(context, f, axis=0)  # (B*F, L_ctx, 768)

        if audio_tokens is not None:
            bf, la = b * f, audio_tokens.shape[2]
            audio_ctx = audio_tokens.reshape(bf, la, audio_tokens.shape[-1])
        else:
            audio_ctx = None

        bank_iter = iter(banks) if banks is not None else None
        bank_kv_iter = iter(banks_kv) if banks_kv is not None else None

        def next_bank():
            return next(bank_iter) if bank_iter is not None else None

        def next_bank_kv():
            return next(bank_kv_iter) if bank_kv_iter is not None else None

        def level_masks(level):
            if masks is None:
                return None
            full, face, lip = masks[level]
            return tuple(m.reshape(b * f, m.shape[-1]) for m in (full, face, lip))

        x = nn.Conv(chans[0], (3, 3), dtype=self.dtype, name="conv_in")(_fold(latents))
        if pose_feat is not None:
            x = x + _fold(pose_feat)

        res_stack = [x]

        # ---------------------------------------------------------- down
        for bi in range(n_blocks):
            in_ch = chans[bi - 1] if bi > 0 else chans[0]
            out_ch = chans[bi]
            has_attn = bi < n_blocks - 1
            for li in range(self.layers_per_block):
                layer_in_ch = in_ch if li == 0 else out_ch
                x = RB(out_ch, dtype=self.dtype, name=f"down_{bi}_res_{li}")(
                    x, temb_f
                )
                if has_attn:
                    x = ST(
                        self.heads,
                        out_ch // self.heads,
                        self.dtype,
                        name=f"down_{bi}_attn_{li}",
                    )(x, context, next_bank(), f, bank_gate, next_bank_kv())
                    if self.use_audio_module and audio_ctx is not None:
                        x = SpatialTransformerAudio(
                            self.heads,
                            layer_in_ch,  # reference width quirk
                            self.dtype,
                            name=f"down_{bi}_audio_{li}",
                        )(x, audio_ctx, level_masks(bi), motion_scale,
                          n_uncond * f)
                if self.use_motion_module:
                    x = MM(
                        self.heads,
                        self.motion_max_len,
                        self.dtype,
                        fuse_kernels=not self.remat,
                        name=f"down_{bi}_motion_{li}",
                    )(x, f)
                res_stack.append(x)
            if bi < n_blocks - 1:
                x = Downsample(self.dtype, name=f"down_{bi}_downsample")(x)
                res_stack.append(x)

        # ----------------------------------------------------------- mid
        x = RB(chans[-1], dtype=self.dtype, name="mid_res_0")(x, temb_f)
        x = ST(
            self.heads, chans[-1] // self.heads, self.dtype, name="mid_attn"
        )(x, context, next_bank(), f, bank_gate, next_bank_kv())
        if self.use_motion_module:
            x = MM(
                self.heads, self.motion_max_len, self.dtype,
                fuse_kernels=not self.remat, name="mid_motion",
            )(x, f)
        x = RB(chans[-1], dtype=self.dtype, name="mid_res_1")(x, temb_f)

        # ------------------------------------------------------------ up
        rev = list(reversed(chans))
        for bi in range(n_blocks):
            out_ch = rev[bi]
            has_attn = bi > 0
            for li in range(self.layers_per_block + 1):
                skip = res_stack.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = RB(out_ch, dtype=self.dtype, name=f"up_{bi}_res_{li}")(
                    x, temb_f
                )
                if has_attn:
                    x = ST(
                        self.heads,
                        out_ch // self.heads,
                        self.dtype,
                        name=f"up_{bi}_attn_{li}",
                    )(x, context, next_bank(), f, bank_gate, next_bank_kv())
                if self.use_motion_module:
                    x = MM(
                        self.heads,
                        self.motion_max_len,
                        self.dtype,
                        fuse_kernels=not self.remat,
                        name=f"up_{bi}_motion_{li}",
                    )(x, f)
            if bi < n_blocks - 1:
                x = Upsample(self.dtype, name=f"up_{bi}_upsample")(x)

        x = GroupNorm(32, 1e-5, act="silu", name="conv_norm_out")(x)
        x = nn.Conv(cin, (3, 3), dtype=self.dtype, name="conv_out")(x)
        return x.reshape(b, f, hh, ww, cin)


def bank_attn_names(
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280),
    layers_per_block: int = 2,
) -> List[Tuple[str, int]]:
    """(module name, channels) of every reference-bank self-attention, in
    the exact order `DenoisingUNet3D.__call__` consumes the `banks` list
    (== `Pose2VideoPipeline._bank_shapes` order)."""
    chans = list(block_out_channels)
    n = len(chans)
    names: List[Tuple[str, int]] = []
    for bi in range(n - 1):
        for li in range(layers_per_block):
            names.append((f"down_{bi}_attn_{li}", chans[bi]))
    names.append(("mid_attn", chans[-1]))
    rev = list(reversed(chans))
    for bi in range(1, n):
        for li in range(layers_per_block + 1):
            names.append((f"up_{bi}_attn_{li}", rev[bi]))
    return names


def precompute_bank_kv(unet: DenoisingUNet3D, params, banks):
    """Project every reference bank through its block's attn1 to_k/to_v
    ONCE per generation, in the lane-packed operand layout.

    The banks are per-generation constants (the ReferenceNet runs once;
    reference mutual_self_attention.py re-reads them every denoising
    step), so their K/V never change across steps — the two-segment flash
    kernel (`ops.attention.packed_attention_2seg`) consumes these batch-1
    operands directly. `params`: the denoising UNet's variables dict;
    `banks`: list of (1, L_i, C_i) tensors. Uses the same
    `pack_qkv_weight` scatter as `_PackedQKV`, so results are
    bit-identical to in-block projection."""
    from mmgt_tpu.nn.layers import pack_qkv_weight
    from mmgt_tpu.ops.attention import packed_slab

    p = params["params"] if "params" in params else params
    out = []
    names = bank_attn_names(unet.block_out_channels, unet.layers_per_block)
    assert len(names) == len(banks), (len(names), len(banks))
    for (name, ch), bank in zip(names, banks):
        attn = p[name]["block"]["attn1"]
        d = ch // unet.heads
        slab = packed_slab(d)
        wk = pack_qkv_weight(attn["to_k"]["kernel"], unet.heads, d, slab, unet.dtype)
        wv = pack_qkv_weight(attn["to_v"]["kernel"], unet.heads, d, slab, unet.dtype)
        bank_d = bank.astype(unet.dtype)
        out.append((bank_d @ wk, bank_d @ wv))
    return out
