#!/usr/bin/env python
"""Certify a reference-style weights directory against every converter.

The reference loads its published checkpoints directly
(scripts/audio2vid.py:193-272: SD1.5 unet, sd-vae-ft-mse, image_encoder
CLIP, net-*.pth Net-wrapper ckpt, pose_guider/denoising/reference .pth,
wav2vec2, WavLM-Large.pt, SMGA ckpt; src/dwpose/wholebody.py:14-27:
yolox_l.onnx + dw-ll_ucoco_384.onnx; audio-separator: Kim_Vocal_2.onnx).
No weights ship in this image — this CLI is the one-command verifier for
the day they are mounted: it runs every converter STRICTLY against the
full-size model shapes (jax.eval_shape — no device memory needed),
reports per-model key/shape coverage, and optionally smoke-forwards each
net.

    python scripts/verify_weights.py /path/to/pretrained_weights \
        [--forward] [--json report.json]

Exit code 0 = every artifact that was found converted cleanly.
"""
from __future__ import annotations

import argparse
import json
import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _find(root: Path, *patterns):
    for pat in patterns:
        hits = sorted(root.glob(pat))
        if hits:
            return hits[-1]
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("weights_dir")
    ap.add_argument("--forward", action="store_true",
                    help="also smoke-forward each converted net (tiny inputs)")
    ap.add_argument("--json", default=None, help="write the report as JSON")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (default: whatever jax picks)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mmgt_tpu.utils import convert as cv

    root = Path(args.weights_dir)
    rng = jax.random.PRNGKey(0)
    report = {}
    failed = []

    def record(name, path, fn):
        """Run one converter strictly; record coverage or the error."""
        entry = {"file": str(path) if path else None}
        report[name] = entry
        if path is None:
            entry["status"] = "absent"
            print(f"[absent ] {name}")
            return None
        try:
            tree, rep, extra = fn(path)
            n = len(jax.tree.leaves(tree))
            entry.update(
                status="ok",
                n_params=n,
                n_allowed_missing=len(rep.get("missing", [])),
                n_unexpected=len(rep.get("unexpected", [])),
                **extra,
            )
            print(
                f"[ok     ] {name}: {n} params covered, "
                f"{entry['n_allowed_missing']} allowed-missing, "
                f"{entry['n_unexpected']} ckpt keys unused"
            )
            return tree
        except Exception as e:  # noqa: BLE001 - report, don't crash
            entry["status"] = "failed"
            entry["error"] = f"{type(e).__name__}: {e}"
            failed.append(name)
            print(f"[FAILED ] {name}: {entry['error']}")
            traceback.print_exc(limit=3)
            return None

    # ------------------------------------------------------- stage-2 models
    from mmgt_tpu.pipelines.pose2vid import Pose2VideoPipeline

    pipe = Pose2VideoPipeline.build(dtype=jnp.bfloat16)
    shapes = jax.eval_shape(lambda: pipe.init_params(rng, 64, 64))

    net_ckpt = _find(root, "net-*.pth", "modules/net-*.pth",
                     "audio_ckpt/modules/net-*.pth")
    net_parts = {}
    if net_ckpt is not None:
        try:
            net_parts = cv.split_net_checkpoint(
                cv.load_torch_state_dict(str(net_ckpt))
            )
            report["net_ckpt"] = {
                "file": str(net_ckpt),
                "status": "ok",
                "split_sizes": {k: len(v) for k, v in net_parts.items()},
            }
            print(f"[ok     ] net ckpt split: "
                  f"{ {k: len(v) for k, v in net_parts.items()} }")
        except Exception as e:  # noqa: BLE001
            report["net_ckpt"] = {"file": str(net_ckpt), "status": "failed",
                                  "error": str(e)}
            failed.append("net_ckpt")

    def sds_of(*paths_or_dicts):
        out = []
        for p in paths_or_dicts:
            if p is None:
                continue
            out.append(p if isinstance(p, dict)
                       else cv.load_torch_state_dict(str(p)))
        return [s for s in out if s]

    def conv_model(tree, sds, mapper, missing_ok=()):
        if not sds:
            raise FileNotFoundError("no loadable state dict")
        new, rep = cv.convert(tree, sds, mapper, missing_ok=missing_ok)
        return new, rep, {}

    vae_path = _find(root, "sd-vae-ft-mse/diffusion_pytorch_model.*")
    vae_tree = record(
        "vae", vae_path,
        lambda p: conv_model(shapes["vae"], sds_of(p), cv.map_vae),
    )

    sd15 = _find(root, "stable-diffusion-v1-5/unet/diffusion_pytorch_model.*")
    ref_unet_tree = record(
        "reference_unet",
        sd15 or _find(root, "reference_unet-*.pth") or net_ckpt,
        lambda _: conv_model(
            shapes["reference_unet"],
            sds_of(sd15, _find(root, "reference_unet-*.pth"),
                   net_parts.get("reference_unet")),
            cv.map_unet2d,
            # the reference DELETED the ReferenceNet's unused output head
            # (unet_2d_condition.py:645-653), so its trained ckpts lack
            # conv_norm_out/conv_out; they keep init (banks are the only
            # consumed output)
            missing_ok=(r"^(params/)?conv_(norm_)?out",),
        ),
    )
    den_tree = record(
        "denoising_unet",
        sd15 or _find(root, "denoising_unet-*.pth") or net_ckpt,
        lambda _: conv_model(
            shapes["denoising_unet"],
            sds_of(sd15, _find(root, "mm_sd_v15_v2.ckpt"),
                   _find(root, "denoising_unet-*.pth"),
                   net_parts.get("denoising_unet")),
            cv.map_unet3d,
            missing_ok=(r"_(audio|motion)_", r"^mid_(audio|motion)",
                        r"audio_cross|zero_conv|motion_pe"),
        ),
    )
    record(
        "pose_guider",
        _find(root, "pose_guider-*.pth") or net_ckpt,
        lambda _: conv_model(
            shapes["pose_guider"],
            sds_of(_find(root, "pose_guider-*.pth"),
                   net_parts.get("pose_guider")),
            cv.map_pose_guider,
        ),
    )
    record(
        "audio_proj",
        _find(root, "audio_proj*.pth") or net_ckpt,
        lambda _: conv_model(
            shapes["audio_proj"],
            sds_of(_find(root, "audio_proj*.pth"), net_parts.get("audioproj")),
            cv.map_audio_proj,
        ),
    )

    # ------------------------------------------------------------ encoders
    def clip_fn(p):
        from mmgt_tpu.models.clip_vision import CLIPVisionModel

        model = CLIPVisionModel(dtype=jnp.bfloat16)
        tree = jax.eval_shape(
            lambda: model.init(rng, jnp.zeros((1, 224, 224, 3), jnp.bfloat16))
        )
        return conv_model(tree, sds_of(p), cv.map_clip_vision)

    record(
        "clip_vision",
        _find(root, "image_encoder/model.*", "image_encoder/pytorch_model.*"),
        clip_fn,
    )

    def w2v_fn(p):
        from mmgt_tpu.models.wav2vec2 import Wav2Vec2Model

        model = Wav2Vec2Model()
        tree = jax.eval_shape(
            lambda: model.init(rng, jnp.zeros((1, 16000)), 25)
        )
        return conv_model(tree, sds_of(p), cv.map_wav2vec2)

    record(
        "wav2vec2",
        _find(root, "wav2vec2-base-960h/pytorch_model.bin",
              "wav2vec/*/pytorch_model.bin"),
        w2v_fn,
    )

    def wavlm_fn(p):
        from mmgt_tpu.models.wavlm import WavLMModel

        model = WavLMModel()
        tree = jax.eval_shape(lambda: model.init(rng, jnp.zeros((1, 16000))))
        return conv_model(tree, sds_of(p), cv.map_wavlm)

    record(
        "wavlm", _find(root, "wavlm/WavLM-Large.pt", "WavLM-Large.pt"), wavlm_fn
    )

    def smga_fn(p):
        from mmgt_tpu.training.stage1 import SMGA

        sd = cv.load_smga_state_dict(str(p), ema=True)
        # the ckpt's cond width identifies its feature type: 1059 = wavlm
        # (1024+35), 35 = baseline DSP (reference SMGA.py:66)
        errs = []
        for ft in ("wavlm", "baseline"):
            smga = SMGA(feature_type=ft)
            tree = smga.init_state(rng, 1).ema_params
            try:
                new, rep = cv.convert(tree, [sd], cv.map_smga)
                return new, rep, {"feature_type": ft}
            except (KeyError, AssertionError) as e:
                errs.append(f"{ft}: {e}")
        raise KeyError("; ".join(errs)[:400])

    record(
        "smga", _find(root, "smga*.pt*", "a2p*.pt*", "train-*.pt"), smga_fn
    )

    # ------------------------------------------------------------ onnx nets
    def dwpose_fn(which, p):
        from mmgt_tpu.models.dwpose import RTMPose, YOLOXL

        model = YOLOXL() if which == "yolox" else RTMPose()
        shape = (1, 640, 640, 3) if which == "yolox" else (1, 384, 288, 3)
        tree = jax.eval_shape(lambda: model.init(rng, jnp.zeros(shape)))
        new, rep = cv.load_dwpose_weights(str(p), tree, which)
        return new, rep, {}

    record(
        "dwpose_yolox", _find(root, "DWPose/yolox_l.onnx", "yolox_l.onnx"),
        lambda p: dwpose_fn("yolox", p),
    )
    record(
        "dwpose_rtmpose",
        _find(root, "DWPose/dw-ll_ucoco_384.onnx", "dw-ll_ucoco_384.onnx"),
        lambda p: dwpose_fn("rtmpose", p),
    )

    def separator_fn(p):
        """Parse the MDX graph and check every node op is executable."""
        import re as _re

        from mmgt_tpu.utils import onnx_exec as oe
        from mmgt_tpu.utils.onnx_reader import parse_onnx_model

        inits, nodes, inp, out = parse_onnx_model(open(p, "rb").read())
        src = open(oe.__file__).read()
        supported = set(_re.findall(r'if op == "(\w+)"', src))
        used = sorted({n["op_type"] for n in nodes})
        unsupported = [o for o in used if o not in supported]
        if unsupported:
            raise NotImplementedError(
                f"graph uses unsupported ops: {unsupported}"
            )
        return inits, {"missing": [], "unexpected": []}, {
            "n_nodes": len(nodes), "ops_used": used,
        }

    record(
        "separator_mdx",
        _find(root, "Kim_Vocal_2.onnx", "*/Kim_Vocal_2.onnx",
              "audio_separator/*.onnx"),
        separator_fn,
    )

    # ----------------------------------------------------- optional forward
    if args.forward and not failed:
        print("smoke-forwarding converted nets...")
        from mmgt_tpu.utils.weights import load_all_weights
        from mmgt_tpu.training.stage1 import SMGA

        loaded = load_all_weights(str(root), pipe, SMGA())
        p = loaded["pose2vid"]
        h8 = 8
        lat = jnp.zeros((1, 2, h8, h8, 4), jnp.bfloat16)
        out = jax.jit(
            lambda pp, x: pipe.denoising_unet.apply(
                pp, x, jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 1, 768), jnp.bfloat16),
                jnp.zeros((1, 2, 32, 768), jnp.bfloat16),
                jnp.zeros((1, 2, h8, h8, 320), jnp.bfloat16),
                [tuple(jnp.ones((1, 2, (h8 >> l) ** 2)) for _ in range(3))
                 for l in range(3)],
                None,
            )
        )(p["denoising_unet"], lat)
        assert np.isfinite(np.asarray(out, np.float32)).all()
        print("denoising_unet forward: ok", out.shape)

    if args.json:
        Path(args.json).write_text(json.dumps(report, indent=2, default=str))
        print(f"wrote {args.json}")

    n_ok = sum(1 for v in report.values() if v.get("status") == "ok")
    n_abs = sum(1 for v in report.values() if v.get("status") == "absent")
    print(f"== {n_ok} ok / {n_abs} absent / {len(failed)} failed ==")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
