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
    """Best-effort load of every model from a reference-style weights dir."""
    root = Path(weights_dir)
    rng = jax.random.PRNGKey(0)
    out: Dict[str, Any] = {}

    params = pose2vid.init_params(rng, 64, 64)

    def try_convert(name, tree, sd_paths, mapper, missing_ok=()):
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
        if not sds:
            _warn(f"{name}: no checkpoint found, keeping random init")
            return tree
        try:
            new, report = cv.convert(tree, sds, mapper, missing_ok=missing_ok)
        except KeyError as e:
            # partially-matched checkpoint: loading it would silently break
            # the model (VERDICT r1) — refuse, keep the full random init.
            _warn(f"{name}: checkpoint does not cover the model, keeping "
                  f"random init ({e})")
            return tree
        if report["missing"]:
            _warn(f"{name}: {len(report['missing'])} allowed-missing params "
                  "keep their init")
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
    )
    params["pose_guider"] = try_convert(
        "pose_guider",
        params["pose_guider"],
        [_find(root, "pose_guider-*.pth"), net_parts.get("pose_guider")],
        cv.map_pose_guider,
    )
    params["audio_proj"] = try_convert(
        "audio_proj", params["audio_proj"],
        [_find(root, "audio_proj*.pth"), net_parts.get("audioproj")],
        cv.map_audio_proj,
    )
    dt = pose2vid.denoising_unet.dtype
    out["pose2vid"] = jax.tree.map(
        lambda x: x.astype(dt) if x.dtype == jnp.float32 else x, params
    )

    smga_ckpt = _find(root, "smga*.pt*", "a2p*.pt*", "train-*.pt")
    smga_params = smga.init_state(rng, 1).ema_params
    if smga_ckpt is not None:
        try:
            sd = cv.load_smga_state_dict(str(smga_ckpt), ema=True)
            smga_params, report = cv.convert(smga_params, [sd], cv.map_smga)
            _warn(f"smga: loaded {smga_ckpt}")
        except Exception as e:  # noqa: BLE001 - best-effort loader
            _warn(f"smga: failed to convert {smga_ckpt}: {e}; random init")
    else:
        _warn("smga: no checkpoint found, keeping random init")
    out["smga"] = jax.tree.map(jnp.asarray, smga_params)

    clip_ckpt = _find(root, "image_encoder/model.*", "image_encoder/pytorch_model.*")
    if clip_ckpt is not None:
        from mmgt_tpu.models.clip_vision import CLIPVisionModel

        model = CLIPVisionModel(dtype=dt)
        tree = jax.eval_shape(
            lambda: model.init(rng, jnp.zeros((1, 224, 224, 3), dt))
        )
        out["clip_model"] = model
        out["clip_params"] = try_convert(
            "clip", tree, [clip_ckpt], cv.map_clip_vision
        )

    w2v_ckpt = _find(root, "wav2vec2-base-960h/pytorch_model.bin",
                     "wav2vec/*/pytorch_model.bin")
    if w2v_ckpt is not None:
        from mmgt_tpu.data.audio import AudioProcessor
        from mmgt_tpu.models.wav2vec2 import Wav2Vec2Model

        model = Wav2Vec2Model()
        tree = jax.eval_shape(lambda: model.init(rng, jnp.zeros((1, 16000)), 25))
        w2v_params = try_convert("wav2vec2", tree, [w2v_ckpt], cv.map_wav2vec2)
        out["audio_processor"] = AudioProcessor(model, w2v_params)

    wavlm_ckpt = _find(root, "wavlm/WavLM-Large.pt", "WavLM-Large.pt")
    if wavlm_ckpt is not None:
        from mmgt_tpu.data.audio import WavLMFeatureExtractor
        from mmgt_tpu.models.wavlm import WavLMModel

        model = WavLMModel()
        tree = jax.eval_shape(lambda: model.init(rng, jnp.zeros((1, 16000))))
        wl_params = try_convert("wavlm", tree, [wavlm_ckpt], cv.map_wavlm)
        out["wavlm"] = WavLMFeatureExtractor(model, wl_params)

    return out
