"""High-level weight loading: a directory of reference checkpoints -> all
framework param trees.

Expected layout (mirrors the reference's pretrained_weights/ +
config/prompts/animation.yaml:1-7):
  stable-diffusion-v1-5/unet/diffusion_pytorch_model.(bin|safetensors)
  sd-vae-ft-mse/diffusion_pytorch_model.(bin|safetensors)
  image_encoder/model.(bin|safetensors)           (CLIP ViT-L)
  wav2vec2-base-960h/pytorch_model.bin
  wavlm/WavLM-Large.pt
  denoising_unet-*.pth / reference_unet-*.pth / pose_guider-*.pth
  net-*.pth                                        (motion+audio modules)
  mm_sd_v15_v2.ckpt                                (AnimateDiff motion)
  smga.pt                                          (Stage-1 ckpt)

Any missing file is skipped with a warning and that model keeps random
init — the framework stays runnable end-to-end either way.
"""
from __future__ import annotations

import sys
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from mmgt_tpu.utils import convert as cv


def _find(root: Path, *patterns) -> Optional[Path]:
    for pat in patterns:
        hits = sorted(root.glob(pat))
        if hits:
            return hits[-1]
    return None


def _warn(msg):
    print(f"[weights] {msg}", file=sys.stderr)


def load_all_weights(weights_dir: str, pose2vid, smga) -> Dict[str, Any]:
    """Best-effort load of every model from a reference-style weights dir.

    Works on SHAPE-ONLY trees (jax.eval_shape): no flax init program ever
    compiles — the r5 release-check drill showed the old real-init path
    spending minutes on five full-size remote init compiles before the
    first checkpoint byte was read. Models whose checkpoint is absent or
    rejected get deterministic non-degenerate random fill
    (utils/testing.fill_params) instead of a real init."""
    from mmgt_tpu.utils.testing import fill_params

    root = Path(weights_dir)
    rng = jax.random.PRNGKey(0)
    out: Dict[str, Any] = {}
    dt = pose2vid.denoising_unet.dtype

    params = jax.eval_shape(lambda: pose2vid.init_params(rng, 64, 64))

    def try_convert(name, tree, sd_paths, mapper, missing_ok=(),
                    cast_f32=None):
        sds = []
        for p in sd_paths:
            if p is None:
                continue
            if isinstance(p, dict):  # pre-loaded/pre-split state dict
                if p:
                    sds.append(p)
                continue
            try:
                sds.append(cv.load_torch_state_dict(str(p)))
            except Exception as e:  # pragma: no cover
                _warn(f"{name}: failed to read {p}: {e}")
        def fill():
            t = fill_params(tree, mode="random")
            if cast_f32 is None:
                return t
            return jax.tree.map(
                lambda x: x.astype(cast_f32)
                if x.dtype == jnp.float32 else x, t,
            )

        if not sds:
            _warn(f"{name}: no checkpoint found, using random fill")
            return fill()
        try:
            new, report = cv.convert(tree, sds, mapper, missing_ok=missing_ok)
        except KeyError as e:
            # partially-matched checkpoint: loading it would silently break
            # the model (VERDICT r1) — refuse, keep a full random fill.
            _warn(f"{name}: checkpoint does not cover the model, using "
                  f"random fill ({e})")
            return fill()
        if report["missing"]:
            _warn(f"{name}: {len(report['missing'])} allowed-missing params "
                  "keep zeros")
        if cast_f32 is not None:
            # cast HOST-side so the f32 copy never occupies HBM
            new = jax.tree.map(
                lambda x: x.astype(cast_f32)
                if getattr(x, "dtype", None) == jnp.float32 else x,
                new,
            )
        return jax.tree.map(jnp.asarray, new)

    # net-*.pth is the Net-wrapper checkpoint: split it into per-module
    # state dicts (reference audio2vid.py:266-272 loads it with strict
    # prefixed keys).
    net_ckpt = _find(root, "net-*.pth", "modules/net-*.pth")
    net_parts = {}
    if net_ckpt is not None:
        try:
            net_parts = cv.split_net_checkpoint(
                cv.load_torch_state_dict(str(net_ckpt))
            )
        except Exception as e:  # pragma: no cover
            _warn(f"net ckpt: failed to read {net_ckpt}: {e}")

    params["vae"] = try_convert(
        "vae",
        params["vae"],
        [_find(root, "sd-vae-ft-mse/diffusion_pytorch_model.*")],
        cv.map_vae,
        cast_f32=dt,
    )
    params["reference_unet"] = try_convert(
        "reference_unet",
        params["reference_unet"],
        [
            _find(root, "stable-diffusion-v1-5/unet/diffusion_pytorch_model.*"),
            _find(root, "reference_unet-*.pth"),
            net_parts.get("reference_unet"),
        ],
        cv.map_unet2d,
        # the reference deleted the ReferenceNet's unused output head
        # (unet_2d_condition.py:645-653): trained ckpts lack
        # conv_norm_out/conv_out; the banks are the only consumed output
        missing_ok=(r"^(params/)?conv_(norm_)?out",),
        cast_f32=dt,
    )
    params["denoising_unet"] = try_convert(
        "denoising_unet",
        params["denoising_unet"],
        [
            _find(root, "stable-diffusion-v1-5/unet/diffusion_pytorch_model.*"),
            _find(root, "mm_sd_v15_v2.ckpt"),
            _find(root, "denoising_unet-*.pth"),
            net_parts.get("denoising_unet"),
        ],
        cv.map_unet3d,
        # bare-SD1.5 loads legitimately lack the motion/audio modules
        # (reference from_pretrained_2d merge, unet_3d.py:627-718) — those
        # keep their init instead of failing the whole load.
        missing_ok=(r"_(audio|motion)_", r"^mid_(audio|motion)",
                    r"audio_cross|zero_conv|motion_pe"),
        cast_f32=dt,
    )
    params["pose_guider"] = try_convert(
        "pose_guider",
        params["pose_guider"],
        [_find(root, "pose_guider-*.pth"), net_parts.get("pose_guider")],
        cv.map_pose_guider,
        cast_f32=dt,
    )
    params["audio_proj"] = try_convert(
        "audio_proj", params["audio_proj"],
        [_find(root, "audio_proj*.pth"), net_parts.get("audioproj")],
        cv.map_audio_proj,
        cast_f32=dt,
    )
    out["pose2vid"] = params  # every subtree already cast + device-put

    smga_ckpt = _find(root, "smga*.pt*", "a2p*.pt*", "train-*.pt")

    def smga_shapes(mod):
        return jax.eval_shape(lambda: mod.init_state(rng, 1)).ema_params

    smga_params = None
    out["smga_feature_type"] = smga.feature_type
    if smga_ckpt is not None:
        sd = None
        try:
            sd = cv.load_smga_state_dict(str(smga_ckpt), ema=True)
            smga_params, report = cv.convert(
                smga_shapes(smga), [sd], cv.map_smga
            )
            _warn(f"smga: loaded {smga_ckpt}")
        except Exception as e:  # noqa: BLE001 - best-effort loader
            # the ckpt may be the OTHER feature width (wavlm 1059 vs
            # baseline 35, reference SMGA.py:66) — retry before giving up
            other = "baseline" if smga.feature_type == "wavlm" else "wavlm"
            try:
                if sd is None:
                    raise e
                from mmgt_tpu.training.stage1 import SMGA as _SMGA

                smga_params, report = cv.convert(
                    smga_shapes(_SMGA(feature_type=other)), [sd], cv.map_smga
                )
                out["smga_feature_type"] = other
                _warn(f"smga: loaded {smga_ckpt} as feature_type={other} "
                      f"(caller asked for {smga.feature_type})")
            except Exception:  # noqa: BLE001
                _warn(f"smga: failed to convert {smga_ckpt}: {e}; random fill")
    if smga_params is None:
        if smga_ckpt is None:
            _warn("smga: no checkpoint found, using random fill")
        smga_params = fill_params(smga_shapes(smga), mode="random")
    out["smga"] = jax.tree.map(jnp.asarray, smga_params)

    # aux encoders ride along in the pipeline dtype: keeping CLIP +
    # wav2vec + WavLM at f32 costs ~3.3 GiB of HBM and OOMs the degraded
    # ~7.75 GiB relay chip next to the 4.8 GiB UNet stack
    clip_ckpt = _find(root, "image_encoder/model.*", "image_encoder/pytorch_model.*")
    if clip_ckpt is not None:
        from mmgt_tpu.models.clip_vision import CLIPVisionModel

        model = CLIPVisionModel(dtype=dt)
        tree = jax.eval_shape(
            lambda: model.init(rng, jnp.zeros((1, 224, 224, 3), dt))
        )
        out["clip_model"] = model
        out["clip_params"] = try_convert(
            "clip", tree, [clip_ckpt], cv.map_clip_vision, cast_f32=dt
        )

    w2v_ckpt = _find(root, "wav2vec2-base-960h/pytorch_model.bin",
                     "wav2vec/*/pytorch_model.bin")
    if w2v_ckpt is not None:
        from mmgt_tpu.data.audio import AudioProcessor
        from mmgt_tpu.models.wav2vec2 import Wav2Vec2Model

        model = Wav2Vec2Model()
        tree = jax.eval_shape(lambda: model.init(rng, jnp.zeros((1, 16000)), 25))
        w2v_params = try_convert("wav2vec2", tree, [w2v_ckpt],
                                 cv.map_wav2vec2, cast_f32=dt)
        out["audio_processor"] = AudioProcessor(model, w2v_params)

    wavlm_ckpt = _find(root, "wavlm/WavLM-Large.pt", "WavLM-Large.pt")
    if wavlm_ckpt is not None:
        from mmgt_tpu.data.audio import WavLMFeatureExtractor
        from mmgt_tpu.models.wavlm import WavLMModel

        model = WavLMModel()
        tree = jax.eval_shape(lambda: model.init(rng, jnp.zeros((1, 16000))))
        wl_params = try_convert("wavlm", tree, [wavlm_ckpt],
                                cv.map_wavlm, cast_f32=dt)
        out["wavlm"] = WavLMFeatureExtractor(model, wl_params)

    return out
