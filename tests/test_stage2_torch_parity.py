"""Stage-2 attention-stack parity vs the reference's OWN torch code.

The paper's core mechanisms — MM-HAA (reference src/models/attention.py:486-771),
the AnimateDiff motion module (motion_module.py:34-388) and the
bank-augmented temporal block with CFG uc-mask semantics
(attention.py:298-481, mutual_self_attention.py:160-188) — are imported
from /root/reference via a plain-torch diffusers stub (tests/diffusers_stub.py)
and compared against the flax rebuild through the converter, with perturbed
(non-default) weights so every projection, zero-conv and norm is exercised.
"""
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import diffusers_stub as ds
from mmgt_tpu.utils import convert as cv


def _perturb(module, seed=0):
    """Shift every param off its default init (zero convs become non-zero,
    LN scales non-one) so parity failures can't hide behind zeros."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.add_(torch.randn(p.shape, generator=g) * 0.05)
    return module.eval()


def _map_block(key: str) -> str:
    """Standalone transformer-block param name -> torch state-dict key."""
    path, leaf = cv._leaf(key)
    return f"{cv._tx_block_suffix(path)}.{leaf}"


def _convert(block, sd, mapper, *init_args, method=None):
    tree = jax.eval_shape(
        lambda: block.init(jax.random.PRNGKey(0), *init_args, method=method)
        if method
        else block.init(jax.random.PRNGKey(0), *init_args)
    )
    params, report = cv.convert(tree, [sd], mapper)
    return jax.tree.map(jnp.asarray, params), report


def _sd(tm):
    return {k: v.numpy() for k, v in tm.state_dict().items()}


# --------------------------------------------------------------------------
# (a) MM-HAA: AudioTemporalBasicTransformerBlock (attention.py:486-771)
# --------------------------------------------------------------------------
def _make_audio_pair(depth=1, dim=64, heads=4):
    att = ds.load_reference_module("attention")
    from mmgt_tpu.models.blocks import AudioTransformerBlock

    tm = _perturb(
        att.AudioTemporalBasicTransformerBlock(
            dim=dim,
            num_attention_heads=heads,
            attention_head_dim=dim // heads,
            cross_attention_dim=768,
            unet_block_name="down",
            depth=depth,
            stack_enable_blocks_name=["up", "down", "mid"],
            stack_enable_blocks_depth=[0, 1, 2, 3],
        ),
        seed=depth,
    )
    ours = AudioTransformerBlock(heads=heads, head_dim=dim // heads)
    return att, tm, ours


def _audio_inputs(b=6, l=64, dim=64, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((b, l, dim)).astype(np.float32)
    audio = rng.standard_normal((b, 32, 768)).astype(np.float32)
    masks = tuple(
        (rng.uniform(size=(b, l)) > 0.4).astype(np.float32) for _ in range(3)
    )
    return x, audio, masks


@pytest.mark.parametrize("depth", [0, 1])
@pytest.mark.parametrize("motion_scale", [None, (1.3, 0.6, 0.25)])
def test_mmhaa_block_matches_reference(depth, motion_scale):
    _, tm, ours = _make_audio_pair(depth=depth)
    x, audio, masks = _audio_inputs(seed=depth)
    params, report = _convert(
        ours,
        _sd(tm),
        _map_block,
        jnp.asarray(x), jnp.asarray(audio),
        tuple(jnp.asarray(m) for m in masks),
    )
    assert not report["missing"], report["missing"][:5]
    assert not report["unexpected"], report["unexpected"][:5]

    # reference indexes the mask pyramids by block depth
    mask_lists = [[torch.zeros(0)] * 4 for _ in range(3)]
    for i in range(3):
        mask_lists[i][depth] = torch.from_numpy(masks[i])
    with torch.no_grad():
        want = tm(
            torch.from_numpy(x),
            encoder_hidden_states=torch.from_numpy(audio),
            full_mask=mask_lists[0],
            face_mask=mask_lists[1],
            body_mask=mask_lists[2],
            motion_scale=list(motion_scale) if motion_scale else None,
        ).numpy()
    got = ours.apply(
        params,
        jnp.asarray(x),
        jnp.asarray(audio),
        tuple(jnp.asarray(m) for m in masks),
        motion_scale or (1.0, 1.0, 1.0),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


def test_mmhaa_uncond_closed_form_matches_reference():
    """The CFG uncond half (audio tokens zeroed by the pipeline,
    pipelines/pose2vid.py) must equal the reference block fed zero audio —
    our closed-form skip path vs the reference's full computation."""
    _, tm, ours = _make_audio_pair(depth=2)
    x, audio, masks = _audio_inputs(seed=7)
    nu = 3
    audio[:nu] = 0.0
    params, _ = _convert(
        ours,
        _sd(tm),
        _map_block,
        jnp.asarray(x), jnp.asarray(audio),
        tuple(jnp.asarray(m) for m in masks),
    )
    mask_lists = [[torch.zeros(0)] * 4 for _ in range(3)]
    for i in range(3):
        mask_lists[i][2] = torch.from_numpy(masks[i])
    with torch.no_grad():
        want = tm(
            torch.from_numpy(x),
            encoder_hidden_states=torch.from_numpy(audio),
            full_mask=mask_lists[0],
            face_mask=mask_lists[1],
            body_mask=mask_lists[2],
            motion_scale=[1.1, 0.8, 0.5],
        ).numpy()
    got = ours.apply(
        params,
        jnp.asarray(x),
        jnp.asarray(audio),
        tuple(jnp.asarray(m) for m in masks),
        (1.1, 0.8, 0.5),
        nu,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


# --------------------------------------------------------------------------
# (b) Motion module: VanillaTemporalModule (motion_module.py:44-388)
# --------------------------------------------------------------------------
def _map_motion(key: str) -> str:
    path, leaf = cv._leaf(key)
    s = cv._tx_block_suffix(path)
    s = re.sub(r"^block\.attn_(\d+)", r"transformer_blocks.0.attention_blocks.\1", s)
    s = re.sub(r"^block\.norm_(\d+)", r"transformer_blocks.0.norms.\1", s)
    s = re.sub(r"^block\.ff_norm", r"transformer_blocks.0.ff_norm", s)
    s = re.sub(r"^block\.ff\.", r"transformer_blocks.0.ff.", s)
    return f"temporal_transformer.{s}.{leaf}"


@pytest.mark.parametrize("f", [2, 6])
def test_motion_module_matches_reference(f):
    mm = ds.load_reference_module("motion_module")
    from mmgt_tpu.models.blocks import MotionModule

    c, h, w, b = 64, 8, 8, 2
    tm = _perturb(
        mm.VanillaTemporalModule(
            in_channels=c,
            num_attention_heads=8,
            num_transformer_block=1,
            attention_block_types=("Temporal_Self", "Temporal_Self"),
            temporal_position_encoding=True,
            temporal_position_encoding_max_len=32,
        ),
        seed=f,
    )
    ours = MotionModule(heads=8, max_len=32)
    rng = np.random.default_rng(f)
    x = rng.standard_normal((b * f, h, w, c)).astype(np.float32)

    tree = jax.eval_shape(
        lambda: ours.init(jax.random.PRNGKey(0), jnp.zeros_like(x), f)
    )
    params, report = cv.convert(tree, [_sd(tm)], _map_motion)
    assert not report["missing"], report["missing"][:5]
    # only the (non-param) sinusoidal PE buffers may be unexpected
    assert all("pos_encoder.pe" in k for k in report["unexpected"]), report[
        "unexpected"
    ]

    got = ours.apply(jax.tree.map(jnp.asarray, params), jnp.asarray(x), f)
    # reference layout: (b, c, f, h, w)
    xt = torch.from_numpy(x).reshape(b, f, h, w, c).permute(0, 4, 1, 2, 3)
    with torch.no_grad():
        want = tm(xt, None, None)
    want = want.permute(0, 2, 3, 4, 1).reshape(b * f, h, w, c).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


# --------------------------------------------------------------------------
# (c) Bank-augmented temporal block + uc-mask CFG semantics
#     (attention.py:298-481, mutual_self_attention.py:160-188)
# --------------------------------------------------------------------------
def _make_temporal_pair(dim=64, heads=4):
    att = ds.load_reference_module("attention")
    from mmgt_tpu.models.blocks import TemporalBasicTransformerBlock

    tm = _perturb(
        att.TemporalBasicTransformerBlock(
            dim=dim,
            num_attention_heads=heads,
            attention_head_dim=dim // heads,
            cross_attention_dim=768,
            unet_use_cross_frame_attention=False,
            unet_use_temporal_attention=False,
            name="blk",
        ),
        seed=3,
    )
    ours = TemporalBasicTransformerBlock(heads=heads, head_dim=dim // heads)
    return tm, ours


@pytest.mark.parametrize("n_ctx", [1, 4])
def test_temporal_block_with_bank_matches_reference(n_ctx):
    """mode='read' with a reference bank concatenated into self-attn K/V
    for every row (attention.py:397-431); n_ctx=1 additionally exercises
    our single-KV-token cross-attention shortcut."""
    tm, ours = _make_temporal_pair()
    b, f, l, l_ref, dim = 2, 3, 16, 16, 64
    rng = np.random.default_rng(4)
    x = rng.standard_normal((b * f, l, dim)).astype(np.float32)
    ctx = rng.standard_normal((b * f, n_ctx, 768)).astype(np.float32)
    bank = rng.standard_normal((b, l_ref, dim)).astype(np.float32)

    params, report = _convert(
        ours,
        _sd(tm),
        _map_block,
        jnp.asarray(x), jnp.asarray(ctx), jnp.asarray(bank), f,
    )
    assert not report["missing"], report["missing"][:5]
    with torch.no_grad():
        want = tm(
            torch.from_numpy(x),
            encoder_hidden_states=torch.from_numpy(ctx),
            video_length=f,
            self_attention_additional_feats={"blk": torch.from_numpy(bank)},
            mode="read",
        ).numpy()
    got = ours.apply(
        params, jnp.asarray(x), jnp.asarray(ctx), jnp.asarray(bank), f
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


def test_temporal_block_uc_mask_matches_reference():
    """CFG route: the reference recomputes the uncond rows (uc_mask=1, the
    FIRST batch half) WITHOUT the bank (mutual_self_attention.py:160-188);
    ours expresses that as bank_gate=0 rows of one variable-KV attention."""
    tm, ours = _make_temporal_pair()
    b, f, l, l_ref, dim = 2, 3, 16, 12, 64
    rng = np.random.default_rng(5)
    x = rng.standard_normal((b * f, l, dim)).astype(np.float32)
    ctx = rng.standard_normal((b * f, 1, 768)).astype(np.float32)
    bank = rng.standard_normal((b, l_ref, dim)).astype(np.float32)

    params, _ = _convert(
        ours,
        _sd(tm),
        _map_block,
        jnp.asarray(x), jnp.asarray(ctx), jnp.asarray(bank), f,
    )
    # torch side: replicate the hacked forward — attn1 with bank for all
    # rows, then overwrite the uncond half with bank-less attn1; the rest
    # of the block (cross-attn + ff) then runs on the combined stream.
    xt = torch.from_numpy(x)
    with torch.no_grad():
        normed = tm.norm1(xt)
        bank_f = (
            torch.from_numpy(bank)
            .unsqueeze(1)
            .repeat(1, f, 1, 1)
            .reshape(b * f, l_ref, dim)
        )
        h_c = tm.attn1(
            normed, encoder_hidden_states=torch.cat([normed, bank_f], dim=1)
        ) + xt
        nu = (b // 2) * f  # first batch half = uncond
        h_c[:nu] = tm.attn1(normed[:nu], encoder_hidden_states=normed[:nu]) + xt[:nu]
        h_c = tm.attn2(
            tm.norm2(h_c), encoder_hidden_states=torch.from_numpy(ctx)
        ) + h_c
        want = (tm.ff(tm.norm3(h_c)) + h_c).numpy()

    gate = jnp.asarray([0] * (b // 2) + [1] * (b - b // 2), jnp.int32)
    got = ours.apply(
        params, jnp.asarray(x), jnp.asarray(ctx), jnp.asarray(bank), f, gate
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


# --------------------------------------------------------------------------
# ReferenceNet-side write block (diffusers BasicTransformerBlock semantics,
# attention.py:12-295 + mutual_self_attention.py write mode)
# --------------------------------------------------------------------------
def test_reference_write_block_matches_stub():
    att = ds.load_reference_module("attention")
    from mmgt_tpu.models.blocks import BasicTransformerBlock

    dim, heads = 64, 4
    tm = _perturb(
        att.BasicTransformerBlock(
            dim=dim,
            num_attention_heads=heads,
            attention_head_dim=dim // heads,
            cross_attention_dim=768,
        ),
        seed=9,
    )
    ours = BasicTransformerBlock(heads=heads, head_dim=dim // heads)
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 16, dim)).astype(np.float32)
    ctx = rng.standard_normal((2, 4, 768)).astype(np.float32)
    params, report = _convert(
        ours, _sd(tm), _map_block, jnp.asarray(x), jnp.asarray(ctx)
    )
    assert not report["missing"], report["missing"][:5]
    with torch.no_grad():
        want = tm(
            torch.from_numpy(x), encoder_hidden_states=torch.from_numpy(ctx)
        ).numpy()
        want_bank = tm.norm1(torch.from_numpy(x)).numpy()
    got, bank = ours.apply(params, jnp.asarray(x), jnp.asarray(ctx))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(bank), want_bank, atol=2e-4, rtol=1e-3)
