"""FULL-network torch parity for the Stage-2 UNets vs the reference's OWN
importable code (VERDICT r4 missing #2).

Block-level parity (test_stage2_torch_parity.py) can't catch a wiring
transposition: block ORDER (reference src/models/unet_3d_blocks.py:344-377),
time-embedding plumbing, `sample += pose_cond_fea` (unet_3d.py:517-519),
down/up skip routing (unet_3d.py:521-615), the ReferenceNet write path and
bank pairing (mutual_self_attention.py:270-345), and the
`from_pretrained_2d` merge (unet_3d.py:627-718). Here the reference's whole
`src.models.unet_3d` / `src.models.unet_2d_condition` stack is imported
under tests/diffusers_stub.py and compared against the flax rebuild through
the converter, with perturbed weights at reduced width — the real 4-level
topology (3 CrossAttn + 1 plain down block, mirrored up), unequal channels
so the audio-module width quirk (unet_3d_blocks.py:466-470) is load-bearing.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import diffusers_stub as ds
from mmgt_tpu.utils import convert as cv

CHANS = (32, 64, 64, 64)
HEADS = 8
B, F, H, W = 2, 2, 16, 16

MOTION_KWARGS = dict(
    num_attention_heads=8,
    num_transformer_block=1,
    attention_block_types=("Temporal_Self", "Temporal_Self"),
    temporal_position_encoding=True,
    temporal_position_encoding_max_len=32,
    temporal_attention_dim_div=1,
)

# the reference inference config (config/prompts/animation.yaml:44-76)
UNET3D_EXTRA = dict(
    use_inflated_groupnorm=True,
    unet_use_cross_frame_attention=False,
    unet_use_temporal_attention=False,
    use_motion_module=True,
    motion_module_resolutions=(1, 2, 4, 8),
    motion_module_mid_block=True,
    motion_module_decoder_only=False,
    motion_module_type="Vanilla",
    motion_module_kwargs=MOTION_KWARGS,
    use_audio_module=True,
    audio_attention_dim=768,
    stack_enable_blocks_name=("up", "down", "mid"),
    stack_enable_blocks_depth=(0, 1, 2, 3),
)


def _perturb(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.add_(torch.randn(p.shape, generator=g) * 0.05)
    return module.eval()


def _sd(tm):
    return {k: v.numpy() for k, v in tm.state_dict().items()}


def _ref_unet3d(use_audio=True, use_motion=True, seed=0):
    u3 = ds.load_reference_module("unet_3d")
    cfg = dict(
        sample_size=None,
        in_channels=4,
        out_channels=4,
        center_input_sample=False,
        flip_sin_to_cos=True,
        freq_shift=0,
        down_block_types=(
            "CrossAttnDownBlock3D",
            "CrossAttnDownBlock3D",
            "CrossAttnDownBlock3D",
            "DownBlock3D",
        ),
        mid_block_type="UNetMidBlock3DCrossAttn",
        up_block_types=(
            "UpBlock3D",
            "CrossAttnUpBlock3D",
            "CrossAttnUpBlock3D",
            "CrossAttnUpBlock3D",
        ),
        block_out_channels=CHANS,
        layers_per_block=2,
        act_fn="silu",
        norm_num_groups=32,
        norm_eps=1e-5,
        cross_attention_dim=768,
        attention_head_dim=HEADS,
        **{**UNET3D_EXTRA, "use_audio_module": use_audio,
           "use_motion_module": use_motion},
    )
    tm = u3.UNet3DConditionModel.from_config(cfg)
    return _perturb(tm, seed=seed)


def _our_unet3d(use_audio=True, use_motion=True):
    from mmgt_tpu.models.unet3d import DenoisingUNet3D

    return DenoisingUNet3D(
        block_out_channels=CHANS,
        heads=HEADS,
        use_audio_module=use_audio,
        use_motion_module=use_motion,
    )


def _inputs(seed=0, zero_uncond=0):
    """Shared forward inputs; first `zero_uncond` batch rows get zeroed
    audio + context (the CFG contract both sides assume)."""
    rng = np.random.default_rng(seed)
    lat = rng.standard_normal((B, F, H, W, 4)).astype(np.float32)
    t = np.array([3, 977][:B], np.int64)
    ctx = rng.standard_normal((B, 1, 768)).astype(np.float32)
    audio = rng.standard_normal((B, F, 32, 768)).astype(np.float32)
    pose = rng.standard_normal((B, F, H, W, CHANS[0])).astype(np.float32) * 0.1
    masks = []
    for l in range(3):
        ll = (H >> l) * (W >> l)
        masks.append(
            tuple(
                (rng.uniform(size=(B, F, ll)) > 0.4).astype(np.float32)
                for _ in range(3)
            )
        )
    if zero_uncond:
        ctx[:zero_uncond] = 0.0
        audio[:zero_uncond] = 0.0
    return lat, t, ctx, audio, pose, masks


def _torch_masks(masks):
    """ours (B, F, L) per level -> reference depth-indexed (B*F, L) lists."""
    out = [[], [], []]
    for k in range(3):  # full / face / lip(body)
        for l in range(3):
            m = masks[l][k]
            out[k].append(torch.from_numpy(m.reshape(B * F, -1)))
        out[k].append(torch.zeros(0))  # depth 3: plain down block, unused
    return out


def _torch_fwd3d(tm, lat, t, ctx, audio, pose, masks, motion_scale):
    fm, fam, bm = _torch_masks(masks)
    with torch.no_grad():
        out = tm(
            torch.from_numpy(lat).permute(0, 4, 1, 2, 3),  # B C F H W
            torch.from_numpy(t),
            encoder_hidden_states=torch.from_numpy(
                ctx.reshape(B, 1, 768)
            ),
            audio_embedding=torch.from_numpy(audio),
            pose_cond_fea=torch.from_numpy(pose).permute(0, 4, 1, 2, 3),
            full_mask=fm,
            face_mask=fam,
            body_mask=bm,
            motion_scale=list(motion_scale),
        ).sample
    return out.permute(0, 2, 3, 4, 1).numpy()  # B F H W C


def _convert3d(ours, sd, *args, **kw):
    tree = jax.eval_shape(lambda: ours.init(jax.random.PRNGKey(0), *args, **kw))
    params, report = cv.convert(tree, [sd], cv.map_unet3d)
    assert not report["missing"], report["missing"][:5]
    # non-param torch buffers (sinusoidal PEs) are the only tolerated leftovers
    bad = [k for k in report["unexpected"] if "pos_encoder.pe" not in k]
    assert not bad, bad[:8]
    return jax.tree.map(jnp.asarray, params)


@pytest.mark.slow
def test_unet3d_full_forward_matches_reference():
    """Whole-net forward (no banks): block order, skip routing, time
    embedding, pose_cond add, audio width quirk, motion placement."""
    tm = _ref_unet3d(seed=1)
    ours = _our_unet3d()
    lat, t, ctx, audio, pose, masks = _inputs(seed=1)
    # motion_scale quirk: the reference's EVAL path never forwards
    # motion_scale into the audio blocks (CrossAttnDownBlock3D
    # non-checkpoint call, unet_3d_blocks.py:590-598 — only the training/
    # gradient-checkpoint path passes it, :560-571), so the yaml's
    # pose/face/lip weights are inert at inference and the effective scale
    # is (1,1,1). Ours honors the knob; scale 1 reproduces reference eval.
    ms = (1.0, 1.0, 1.0)

    jargs = (
        jnp.asarray(lat), jnp.asarray(t.astype(np.int32)), jnp.asarray(ctx),
        jnp.asarray(audio), jnp.asarray(pose),
        [tuple(jnp.asarray(m) for m in lvl) for lvl in masks],
    )
    params = _convert3d(ours, _sd(tm), *jargs)
    got = np.asarray(
        ours.apply(params, *jargs, None, ms)
    )
    want = _torch_fwd3d(tm, lat, t, ctx, audio, pose, masks, (1.3, 0.7, 0.4))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)

    # the knob actually works on our side (unlike reference eval)
    got2 = np.asarray(ours.apply(params, *jargs, None, (1.3, 0.7, 0.25)))
    assert np.abs(got2 - got).max() > 1e-4


def _collect_sorted_blocks(tm, cls_names):
    mods = [
        m
        for m in _torch_dfs(tm)
        if type(m).__name__ in cls_names
    ]
    return sorted(mods, key=lambda x: -x.norm1.normalized_shape[0])


def _torch_dfs(model):
    result = [model]
    for child in model.children():
        result += _torch_dfs(child)
    return result


def _our_bank_order(widths):
    """Indices mapping the reference's width-sorted module order to our
    structural bank order.

    Subtlety: torch_dfs visits the reference nets' blocks in MODULE
    REGISTRATION order, which is down_blocks, up_blocks, mid_block — both
    UNets assign `self.mid_block` only after creating both ModuleLists
    (unet_2d_condition.py:455-531; unet_3d.py:118 assigns None before
    nn.Module registration, :176 registers it last). Since reader and
    writer share this order, the reference still pairs down<->down,
    up<->up, mid<->mid — the same bijection as our structural order — but
    a width-sorted torch module list has mid at the END of its width
    group, not between down and up."""
    # our structural order: [6 down banks, mid, 9 up banks]
    mid = 2 * (len(CHANS) - 1)
    torch_visit = (
        list(range(mid)) + list(range(mid + 1, len(widths))) + [mid]
    )
    return sorted(torch_visit, key=lambda i: -widths[i])


def _ref_unet2d(seed=3):
    u2 = ds.load_reference_module("unet_2d_condition")
    cfg = dict(
        sample_size=None,
        in_channels=4,
        out_channels=4,
        center_input_sample=False,
        flip_sin_to_cos=True,
        freq_shift=0,
        down_block_types=(
            "CrossAttnDownBlock2D",
            "CrossAttnDownBlock2D",
            "CrossAttnDownBlock2D",
            "DownBlock2D",
        ),
        mid_block_type="UNetMidBlock2DCrossAttn",
        up_block_types=(
            "UpBlock2D",
            "CrossAttnUpBlock2D",
            "CrossAttnUpBlock2D",
            "CrossAttnUpBlock2D",
        ),
        only_cross_attention=False,
        block_out_channels=CHANS,
        layers_per_block=2,
        downsample_padding=1,
        mid_block_scale_factor=1,
        act_fn="silu",
        norm_num_groups=32,
        norm_eps=1e-5,
        cross_attention_dim=768,
        attention_head_dim=HEADS,
    )
    tm = u2.UNet2DConditionModel.from_config(cfg)
    return _perturb(tm, seed=seed)


@pytest.mark.slow
def test_reference_unet2d_write_matches_reference():
    """ReferenceNet whole-net parity on every bank tensor in the
    reference's own write order (mutual_self_attention.py write mode +
    width-sorted pairing, :270-345). The banks are the ReferenceNet's ONLY
    consumed output — the reference's modified unet_2d_condition.py even
    comments out the conv_norm_out/conv_out post-process (:1295-1299), so
    its `sample` is an unused un-post-processed feature and is not
    compared."""
    msa = ds.load_reference_module("mutual_self_attention")
    tm = _ref_unet2d()
    writer = msa.ReferenceAttentionControl(
        tm, mode="write", fusion_blocks="full", batch_size=B
    )
    rng = np.random.default_rng(11)
    lat = rng.standard_normal((B, H, W, 4)).astype(np.float32)
    t = np.zeros((B,), np.int64)  # the reference runs its ReferenceNet at t=0
    ctx = rng.standard_normal((B, 1, 768)).astype(np.float32)
    with torch.no_grad():
        tm(
            torch.from_numpy(lat).permute(0, 3, 1, 2),
            torch.from_numpy(t),
            encoder_hidden_states=torch.from_numpy(ctx),
        )

    wmods = _collect_sorted_blocks(tm, {"BasicTransformerBlock"})
    want_banks_sorted = [m.bank[0].numpy() for m in wmods]

    from mmgt_tpu.models.unet_ref import ReferenceUNet2D

    ours = ReferenceUNet2D(block_out_channels=CHANS, heads=HEADS)
    jargs = (jnp.asarray(lat), jnp.asarray(t.astype(np.int32)), jnp.asarray(ctx))
    tree = jax.eval_shape(lambda: ours.init(jax.random.PRNGKey(0), *jargs))
    # the reference DELETES the ReferenceNet's output head (conv_norm_out
    # = None, conv_out commented out — unet_2d_condition.py:645-653): its
    # state dict legitimately lacks those; ours keep init (sample unused)
    params, report = cv.convert(
        tree, [_sd(tm)], cv.map_unet2d,
        missing_ok=(r"^params/conv_(norm_)?out",),
    )
    assert len(report["missing"]) == 4, report["missing"]
    assert not report["unexpected"], report["unexpected"][:8]
    _, banks = ours.apply(jax.tree.map(jnp.asarray, params), *jargs)

    order = _our_bank_order([b.shape[-1] for b in banks])
    assert len(order) == len(want_banks_sorted) == 16
    for rank, i in enumerate(order):
        np.testing.assert_allclose(
            np.asarray(banks[i]),
            want_banks_sorted[rank],
            atol=5e-4, rtol=1e-3,
            err_msg=f"bank {i} (width {banks[i].shape[-1]})",
        )


@pytest.mark.slow
def test_full_two_net_cfg_matches_reference():
    """The complete composition under CFG: reference 2D writer -> bank
    update -> 3D reader with uc-mask recompute (mutual_self_attention.py
    read mode) vs our ReferenceUNet2D banks + DenoisingUNet3D(n_uncond)."""
    msa = ds.load_reference_module("mutual_self_attention")
    tm2 = _ref_unet2d(seed=5)
    tm3 = _ref_unet3d(seed=6)
    writer = msa.ReferenceAttentionControl(
        tm2, mode="write", do_classifier_free_guidance=True,
        fusion_blocks="full", batch_size=B // 2,
    )
    reader = msa.ReferenceAttentionControl(
        tm3, mode="read", do_classifier_free_guidance=True,
        fusion_blocks="full", batch_size=B // 2,
    )
    n_uncond = B // 2  # first batch half is the uncond stream
    lat, t, ctx, audio, pose, masks = _inputs(seed=7, zero_uncond=n_uncond)
    t[:] = t[0]  # one shared timestep, as in the real denoise loop
    ms = (1.0, 1.0, 1.0)
    rng = np.random.default_rng(12)
    ref_lat = rng.standard_normal((B, H, W, 4)).astype(np.float32)

    with torch.no_grad():
        tm2(
            torch.from_numpy(ref_lat).permute(0, 3, 1, 2),
            torch.zeros(B, dtype=torch.long),
            encoder_hidden_states=torch.from_numpy(ctx),
        )
    reader.update(writer, dtype=torch.float32)
    want = _torch_fwd3d(tm3, lat, t, ctx, audio, pose, masks, ms)

    from mmgt_tpu.models.unet_ref import ReferenceUNet2D

    ours2 = ReferenceUNet2D(block_out_channels=CHANS, heads=HEADS)
    jref = (
        jnp.asarray(ref_lat),
        jnp.zeros((B,), jnp.int32),
        jnp.asarray(ctx),
    )
    tree2 = jax.eval_shape(lambda: ours2.init(jax.random.PRNGKey(0), *jref))
    params2, _ = cv.convert(
        tree2, [_sd(tm2)], cv.map_unet2d,
        missing_ok=(r"^params/conv_(norm_)?out",),  # deleted in the reference
    )
    _, banks = ours2.apply(jax.tree.map(jnp.asarray, params2), *jref)

    ours3 = _our_unet3d()
    jargs = (
        jnp.asarray(lat), jnp.asarray(t.astype(np.int32)), jnp.asarray(ctx),
        jnp.asarray(audio), jnp.asarray(pose),
        [tuple(jnp.asarray(m) for m in lvl) for lvl in masks],
    )
    params3 = _convert3d(ours3, _sd(tm3), *jargs, banks=list(banks))
    got = np.asarray(
        ours3.apply(params3, *jargs, list(banks), ms, n_uncond)
    )
    np.testing.assert_allclose(got, want, atol=1.5e-3, rtol=1.5e-3)


@pytest.mark.slow
def test_from_pretrained_2d_merge_matches_converter(tmp_path):
    """`from_pretrained_2d` semantics (unet_3d.py:627-718): vanilla 2D
    weights + motion-module ckpt merged with update-precedence and
    strict=False — vs our convert([sd_vanilla, sd_motion], map_unet3d)."""
    u3 = ds.load_reference_module("unet_3d")
    # vanilla "SD1.5" weights: a bare net (no motion/audio) has exactly the
    # 2D checkpoint key layout (InflatedConv3d state == Conv2d state)
    vanilla = _ref_unet3d(use_audio=False, use_motion=False, seed=8)
    motion_src = _ref_unet3d(use_audio=False, use_motion=True, seed=9)
    motion_sd = {
        k: v for k, v in motion_src.state_dict().items()
        if "motion_modules." in k
    }

    d = tmp_path / "sd15" ; d.mkdir()
    import json

    cfg2d = {
        "in_channels": 4, "out_channels": 4, "center_input_sample": False,
        "flip_sin_to_cos": True, "freq_shift": 0,
        "down_block_types": ["CrossAttnDownBlock2D"] * 3 + ["DownBlock2D"],
        "up_block_types": ["UpBlock2D"] + ["CrossAttnUpBlock2D"] * 3,
        "block_out_channels": list(CHANS), "layers_per_block": 2,
        "act_fn": "silu", "norm_num_groups": 32, "norm_eps": 1e-5,
        "cross_attention_dim": 768, "attention_head_dim": HEADS,
    }
    (d / "config.json").write_text(json.dumps(cfg2d))
    torch.save(vanilla.state_dict(), d / "diffusion_pytorch_model.bin")
    mm_path = tmp_path / "mm.pth"
    torch.save(motion_sd, mm_path)

    tm = u3.UNet3DConditionModel.from_pretrained_2d(
        d, mm_path,
        unet_additional_kwargs={**UNET3D_EXTRA, "use_audio_module": False},
    )
    tm = tm.eval()

    lat, t, ctx, audio, pose, masks = _inputs(seed=10)
    ms = (1.0, 1.0, 1.0)
    want = _torch_fwd3d(tm, lat, t, ctx, audio, pose, masks, ms)

    ours = _our_unet3d(use_audio=False)
    jargs = (
        jnp.asarray(lat), jnp.asarray(t.astype(np.int32)), jnp.asarray(ctx),
        jnp.asarray(audio), jnp.asarray(pose),
        [tuple(jnp.asarray(m) for m in lvl) for lvl in masks],
    )
    tree = jax.eval_shape(lambda: ours.init(jax.random.PRNGKey(0), *jargs))
    params, report = cv.convert(
        tree, [_sd(vanilla), {k: v.numpy() for k, v in motion_sd.items()}],
        cv.map_unet3d,
    )
    assert not report["missing"], report["missing"][:5]
    got = np.asarray(
        ours.apply(jax.tree.map(jnp.asarray, params), *jargs, None, ms)
    )
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
