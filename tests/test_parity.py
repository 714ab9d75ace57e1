"""Numerical parity vs HuggingFace torch implementations (random weights
exported through our converter) — validates both the flax architectures
and the converter name/layout mappings end-to-end."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mmgt_tpu.utils import convert as cv


@pytest.fixture(autouse=True)
def _seed_torch():
    torch.manual_seed(0)


@pytest.mark.slow
def test_wav2vec2_matches_hf():
    from transformers import Wav2Vec2Config, Wav2Vec2Model as HFWav2Vec2

    from mmgt_tpu.models.wav2vec2 import Wav2Vec2Model

    cfg = Wav2Vec2Config(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=(512,) * 7,
        do_stable_layer_norm=False,
        feat_extract_norm="group",
        num_conv_pos_embeddings=128,
        num_conv_pos_embedding_groups=16,
        layerdrop=0.0,
    )
    hf = HFWav2Vec2(cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    # HF stores the pos-conv kernel weight-normalized
    if "encoder.pos_conv_embed.conv.weight_g" in sd:
        g = sd["encoder.pos_conv_embed.conv.weight_g"]
        v = sd["encoder.pos_conv_embed.conv.weight_v"]
        norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
        sd["encoder.pos_conv_embed.conv.weight"] = g * v / np.maximum(norm, 1e-12)
    elif "encoder.pos_conv_embed.conv.parametrizations.weight.original0" in sd:
        g = sd["encoder.pos_conv_embed.conv.parametrizations.weight.original0"]
        v = sd["encoder.pos_conv_embed.conv.parametrizations.weight.original1"]
        norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
        sd["encoder.pos_conv_embed.conv.weight"] = g * v / np.maximum(norm, 1e-12)

    ours = Wav2Vec2Model(hidden_dim=32, num_layers=2, heads=4, ff_dim=64)
    wav = np.random.default_rng(0).standard_normal(8000).astype(np.float32)
    with torch.no_grad():
        hf_out = hf(
            torch.from_numpy(wav)[None], output_hidden_states=True
        ).hidden_states
    t_out = hf_out[-1].shape[1]  # natural conv length -> interp is identity

    tree = jax.eval_shape(
        lambda: ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 8000)), t_out)
    )
    params, report = cv.convert(tree, [sd], cv.map_wav2vec2)
    out = ours.apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(wav)[None], t_out
    )  # (1, T, 2, 32): per-layer stack
    for layer in range(2):
        np.testing.assert_allclose(
            np.asarray(out[0, :, layer]),
            hf_out[layer + 1][0].numpy(),
            atol=2e-4,
            rtol=1e-3,
        )


@pytest.mark.slow
def test_clip_vision_matches_hf():
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    from mmgt_tpu.models.clip_vision import CLIPVisionModel

    cfg = CLIPVisionConfig(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        image_size=32,
        patch_size=16,
        projection_dim=16,
    )
    hf = CLIPVisionModelWithProjection(cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    ours = CLIPVisionModel(
        hidden_dim=32, num_layers=2, heads=4, patch=16, image_size=32,
        proj_dim=16, mlp_dim=64,
    )
    img = np.random.default_rng(1).standard_normal((1, 32, 32, 3)).astype(
        np.float32
    )
    tree = jax.eval_shape(
        lambda: ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    )
    params, report = cv.convert(tree, [sd], cv.map_clip_vision)
    out = ours.apply(jax.tree.map(jnp.asarray, params), jnp.asarray(img))
    with torch.no_grad():
        ref = hf(torch.from_numpy(img).permute(0, 3, 1, 2)).image_embeds
    np.testing.assert_allclose(
        np.asarray(out[:, 0]), ref.numpy(), atol=2e-4, rtol=1e-3
    )


@pytest.mark.slow
def test_wavlm_matches_hf():
    """HF WavLM (same architecture as the vendored Microsoft WavLM the
    reference uses) vs our flax model; HF keys renamed to the MS layout
    map_wavlm expects."""
    from transformers import WavLMConfig, WavLMModel as HFWavLM

    from mmgt_tpu.models.wavlm import WavLMModel

    cfg = WavLMConfig(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=(512,) * 7,
        do_stable_layer_norm=True,
        feat_extract_norm="layer",
        num_buckets=32,
        max_bucket_distance=16,
        num_conv_pos_embeddings=128,
        num_conv_pos_embedding_groups=16,
        layerdrop=0.0,
    )
    hf = HFWavLM(cfg).eval()
    sd = {}
    for k, v in hf.state_dict().items():
        a = v.numpy()
        k = k.replace("feature_projection.layer_norm", "layer_norm")
        k = k.replace("feature_projection.projection", "post_extract_proj")
        k = k.replace("encoder.pos_conv_embed.conv", "encoder.pos_conv.0")
        k = k.replace(".attention.q_proj", ".self_attn.q_proj")
        k = k.replace(".attention.k_proj", ".self_attn.k_proj")
        k = k.replace(".attention.v_proj", ".self_attn.v_proj")
        k = k.replace(".attention.out_proj", ".self_attn.out_proj")
        k = k.replace(".attention.rel_attn_embed", ".self_attn.relative_attention_bias")
        k = k.replace(".attention.gru_rel_pos_linear", ".self_attn.grep_linear")
        k = k.replace(".attention.gru_rel_pos_const", ".self_attn.grep_a")
        k = k.replace(".feed_forward.intermediate_dense", ".fc1")
        k = k.replace(".feed_forward.output_dense", ".fc2")
        import re as _re

        # conv-extractor renames FIRST (they also contain ".layer_norm.")
        k = _re.sub(
            r"feature_extractor\.conv_layers\.(\d+)\.layer_norm",
            r"feature_extractor.conv_layers.\1.2.1",
            k,
        )
        k = _re.sub(
            r"feature_extractor\.conv_layers\.(\d+)\.conv",
            r"feature_extractor.conv_layers.\1.0",
            k,
        )
        k = _re.sub(
            r"encoder\.layers\.(\d+)\.layer_norm\.",
            r"encoder.layers.\1.self_attn_layer_norm.",
            k,
        )
        sd[k] = a
    # weight-norm'd pos conv
    for gk, vk in (
        ("encoder.pos_conv.0.weight_g", "encoder.pos_conv.0.weight_v"),
        (
            "encoder.pos_conv.0.parametrizations.weight.original0",
            "encoder.pos_conv.0.parametrizations.weight.original1",
        ),
    ):
        if gk in sd:
            g, v = sd[gk], sd[vk]
            norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
            sd["encoder.pos_conv.0.weight"] = g * v / np.maximum(norm, 1e-12)

    ours = WavLMModel(hidden_dim=32, num_layers=2, heads=4, ff_dim=64,
                      num_buckets=32, max_distance=16)
    wav = np.random.default_rng(2).standard_normal(8000).astype(np.float32)
    tree = jax.eval_shape(
        lambda: ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 8000)))
    )

    from mmgt_tpu.utils.convert import convert, map_wavlm

    params, report = convert(tree, [sd], map_wavlm)
    assert not report["missing"], report["missing"][:5]
    out = ours.apply(jax.tree.map(jnp.asarray, params), jnp.asarray(wav)[None])
    with torch.no_grad():
        ref = hf(torch.from_numpy(wav)[None]).last_hidden_state
    # our model appends a final encoder layer_norm; HF stable-layer-norm
    # applies encoder.layer_norm at the END too (do_stable_layer_norm=True).
    # (The r1 5e-4 tolerance was root-caused in r3: the rel-pos gate was
    # computed from the q projection instead of the raw per-head hidden
    # states — the reference's fast path. Fixed; plain float noise now.)
    np.testing.assert_allclose(
        np.asarray(out[0]), ref[0].numpy(), atol=3e-5, rtol=1e-4
    )


# --------------------------------------------------------------------------
# Stage-1 SMGA vs the reference torch implementation (/root/reference/src is
# importable with the in-image torch — no external assets needed).
def _ref_src_path():
    import sys

    p = "/root/reference/src"
    if p not in sys.path:
        sys.path.insert(0, p)


@pytest.mark.slow
def test_smga_decoder_matches_reference():
    """GestureDecoder forward (cond kept AND dropped) matches the reference
    torch module through the map_smga converter (model.py:324-490)."""
    _ref_src_path()
    ref = pytest.importorskip("audio2pose_model.model")
    from mmgt_tpu.models.smga import GestureDecoder

    T, d = 16, 64
    tm = ref.GestureDecoder(
        nfeats=402, seq_len=T, latent_dim=d, ff_size=128, num_layers=2,
        num_heads=4, dropout=0.0, cond_feature_dim=35,
    ).eval()
    sd = cv.split_packed_qkv(
        {k: v.numpy() for k, v in tm.state_dict().items()}
    )

    ours = GestureDecoder(seq_len=T, latent_dim=d, ff_size=128, num_layers=2,
                          num_heads=4, cond_feature_dim=35)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, T, 402)).astype(np.float32)
    cf = rng.standard_normal((2, 402)).astype(np.float32)
    cond = rng.standard_normal((2, T, 35)).astype(np.float32)
    t = np.array([7, 531], np.int64)

    tree = jax.eval_shape(
        lambda: ours.init(
            jax.random.PRNGKey(0), jnp.zeros_like(x), jnp.zeros_like(cf),
            jnp.zeros_like(cond), jnp.zeros((2,), jnp.int32),
        )
    )
    params, report = cv.convert(tree, [sd], cv.map_smga)
    assert not report["missing"], report["missing"][:5]
    # only the reference's declared-but-unused params may be unexpected
    for k in report["unexpected"]:
        assert (
            "rotary.freqs" in k
            or ".self_attn." in k.replace("face_", "").replace("body_", "")
            or "_3." in k
        ), k
    params = jax.tree.map(jnp.asarray, params)

    for drop_prob, keep in ((0.0, True), (1.0, False)):
        with torch.no_grad():
            want = tm(
                torch.from_numpy(x), torch.from_numpy(cf),
                torch.from_numpy(cond), torch.from_numpy(t),
                cond_drop_prob=drop_prob,
            ).numpy()
        got = ours.apply(
            params, jnp.asarray(x), jnp.asarray(cf), jnp.asarray(cond),
            jnp.asarray(t, jnp.int32), jnp.full((2,), keep, bool),
        )
        np.testing.assert_allclose(
            np.asarray(got), want, atol=2e-4, rtol=1e-3,
            err_msg=f"cond_drop_prob={drop_prob}",
        )


@pytest.mark.slow
def test_gesture_diffusion_tables_match_reference():
    """Cosine DDPM buffers match the reference GestureDiffusion exactly
    (src/audio2pose_model/diffusion.py:63-126)."""
    _ref_src_path()
    import sys
    import types

    if "p_tqdm" not in sys.modules:  # not installed; only p_map is imported
        fake = types.ModuleType("p_tqdm")
        fake.p_map = lambda fn, *it, **kw: list(map(fn, *it))
        sys.modules["p_tqdm"] = fake
    ref_diff = pytest.importorskip("audio2pose_model.diffusion")
    import torch.nn as tnn

    from mmgt_tpu.diffusion.gesture import GestureDiffusionSchedule

    gd = ref_diff.GestureDiffusion(
        tnn.Linear(1, 1), horizon=80, repr_dim=402, schedule="cosine",
        n_timestep=1000, predict_epsilon=False, loss_type="l2", use_p2=False,
        cond_drop_prob=0.25, guidance_weight=2,
    )
    ours = GestureDiffusionSchedule()
    for name in (
        "betas", "alphas_cumprod", "alphas_cumprod_prev",
        "sqrt_alphas_cumprod", "sqrt_one_minus_alphas_cumprod",
        "sqrt_recip_alphas_cumprod", "sqrt_recipm1_alphas_cumprod",
        "posterior_variance", "posterior_log_variance_clipped",
        "posterior_mean_coef1", "posterior_mean_coef2",
    ):
        # reference computes buffers in f32, ours in f64-then-cast; f32
        # cancellation in (1 - alphas_cumprod) near t=0 costs ~5e-4 relative
        # there (e.g. posterior_mean_coef1[0]: exact 1.0 vs f32 0.999472) —
        # ours is the more accurate of the two.
        np.testing.assert_allclose(
            np.asarray(getattr(ours.tables, name)),
            getattr(gd, name).numpy(),
            atol=1e-5, rtol=1e-3, err_msg=name,
        )


@pytest.mark.slow
def test_smga_decoder_matches_reference_full_size():
    """Full production config (latent 512, 8 layers, 8 heads, wavlm 1059-d
    cond, horizon 80) — the converter and architecture at real scale."""
    _ref_src_path()
    ref = pytest.importorskip("audio2pose_model.model")
    from mmgt_tpu.models.smga import GestureDecoder

    T = 80
    tm = ref.GestureDecoder(
        nfeats=402, seq_len=T, latent_dim=512, ff_size=1024, num_layers=8,
        num_heads=8, dropout=0.0, cond_feature_dim=1024 + 35,
    ).eval()
    sd = cv.split_packed_qkv(
        {k: v.numpy() for k, v in tm.state_dict().items()}
    )
    ours = GestureDecoder()  # defaults == production config
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, T, 402)).astype(np.float32)
    cf = rng.standard_normal((1, 402)).astype(np.float32)
    cond = rng.standard_normal((1, T, 1059)).astype(np.float32)
    t = np.array([421], np.int64)

    tree = jax.eval_shape(
        lambda: ours.init(
            jax.random.PRNGKey(0), jnp.zeros_like(x), jnp.zeros_like(cf),
            jnp.zeros_like(cond), jnp.zeros((1,), jnp.int32),
        )
    )
    params, report = cv.convert(tree, [sd], cv.map_smga)
    assert not report["missing"], report["missing"][:5]
    got = ours.apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(x), jnp.asarray(cf),
        jnp.asarray(cond), jnp.asarray(t, jnp.int32),
    )
    with torch.no_grad():
        want = tm(
            torch.from_numpy(x), torch.from_numpy(cf), torch.from_numpy(cond),
            torch.from_numpy(t), cond_drop_prob=0.0,
        ).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)
