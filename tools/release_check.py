#!/usr/bin/env python
"""One-command weights-day release check (VERDICT r4 next #5).

Chains, in one process tree:
  1. (optional) synthesize a full reference-layout weights dir
     (tools/synth_weights.py) — the in-image drill for the converters,
     loaders and this orchestration itself;
  2. scripts/verify_weights.py — strict converter/shape certification,
     JSON report;
  3. real-weight audio2vid forward on the reference demo fixture
     (/root/reference/config/cases/oliver#103842_slice18.* when present,
     else a synthetic wav + gray portrait — the reference's own acceptance
     artifact, scripts/audio2vid.py:244-272,509-530) -> one mp4 + metrics;
  4. (--fewstep) tools/fewstep_quality.py on the same weights.

Outputs <out>/release_check.json + <out>/release_check.mp4. Exit 0 only if
every stage passed.

Drill (tiny sizes, synthetic weights):
    python tools/release_check.py --synthetic --out /tmp/rc \
        --size 64 --frames 8 --steps 2
Weights-day (full flagship on the TPU):
    python tools/release_check.py /path/to/pretrained_weights --out rc \
        --size 512 --frames 80 --steps 15 --sampler dpm --fewstep
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("weights_dir", nargs="?", default=None)
    ap.add_argument("--synthetic", action="store_true",
                    help="generate synthetic full-layout weights first")
    ap.add_argument("--out", default="/tmp/release_check")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--steps", type=int, default=15)
    ap.add_argument("--sampler", choices=("ddim", "dpm"), default="dpm")
    ap.add_argument("--microbatch", type=int, default=5)
    ap.add_argument("--fewstep", action="store_true",
                    help="also run tools/fewstep_quality.py on these weights")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    report = {"stages": {}, "ok": False}
    t_all = time.time()

    def stage(name, fn):
        t0 = time.time()
        try:
            info = fn() or {}
            report["stages"][name] = {"ok": True, "s": round(time.time() - t0, 1),
                                      **info}
            print(f"[ok] {name} ({report['stages'][name]['s']}s)")
            return True
        except Exception as e:  # noqa: BLE001 - recorded, run continues
            report["stages"][name] = {
                "ok": False, "s": round(time.time() - t0, 1),
                "error": f"{type(e).__name__}: {e}",
            }
            print(f"[FAILED] {name}: {e}")
            return False

    # ---------------------------------------------------------- 1. weights
    weights = args.weights_dir
    if args.synthetic:
        weights = weights or "/tmp/synth_weights"

        def synth():
            if (Path(weights) / "net-32500.pth").exists():
                return {"reused": True, "dir": weights}
            rc = subprocess.run(
                [sys.executable, str(REPO / "tools" / "synth_weights.py"),
                 weights],
                capture_output=True, text=True,
            )
            if rc.returncode != 0:
                raise RuntimeError(rc.stderr[-1500:])
            return {"dir": weights}

        if not stage("synth_weights", synth):
            _finish(report, out, t_all)
    if not weights:
        ap.error("weights_dir or --synthetic required")

    # ----------------------------------------------------------- 2. verify
    def verify():
        rc = subprocess.run(
            [sys.executable, str(REPO / "scripts" / "verify_weights.py"),
             weights, "--cpu", "--json", str(out / "verify.json")],
            capture_output=True, text=True,
        )
        info = {}
        vj = out / "verify.json"
        if vj.exists():
            info["report"] = json.loads(vj.read_text())
        if rc.returncode != 0:
            raise RuntimeError(
                f"verify_weights rc={rc.returncode}: {rc.stdout[-800:]}"
            )
        return info

    if not stage("verify_weights", verify):
        _finish(report, out, t_all)

    # ----------------------------------------------- 3. fixture generation
    def generate():
        import jax

        if args.cpu:
            jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp
        import numpy as np

        from mmgt_tpu.config import InferenceConfig
        from mmgt_tpu.diffusion.dpm import DPMSolverPlusPlus2M
        from mmgt_tpu.pipelines.audio2vid import Audio2VideoPipeline
        from mmgt_tpu.pipelines.pose2vid import Pose2VideoPipeline
        from mmgt_tpu.training.stage1 import SMGA
        from mmgt_tpu.utils.cache import enable_compilation_cache
        from mmgt_tpu.utils.media import save_video
        from mmgt_tpu.utils.weights import load_all_weights

        enable_compilation_cache()
        pipe = Pose2VideoPipeline.build(
            dtype=jnp.bfloat16, window_microbatch=args.microbatch,
            output_uint8=True, profile_phases=True,
        )
        if args.sampler == "dpm":
            pipe.scheduler = DPMSolverPlusPlus2M()
        smga = SMGA(feature_type="baseline")
        w = load_all_weights(weights, pipe, smga)
        if w.get("smga_feature_type", "baseline") != smga.feature_type:
            smga = SMGA(feature_type=w["smga_feature_type"])

        a2v = Audio2VideoPipeline(
            smga=smga, smga_params=w["smga"],
            pose2vid=pipe, pose2vid_params=w["pose2vid"],
            clip_model=w.get("clip_model"), clip_params=w.get("clip_params"),
            audio_processor=w.get("audio_processor"),
            wavlm_extractor=w.get("wavlm"),
            config=InferenceConfig(
                width=args.size, height=args.size, video_length=args.frames,
                num_inference_steps=args.steps,
                window_microbatch=args.microbatch,
            ),
        )

        fixture = "/root/reference/config/cases/oliver#103842_slice18"
        if Path(fixture + ".wav").exists():
            from mmgt_tpu.utils.media import load_image

            wav_path, src = fixture + ".wav", "oliver_fixture"
            ref_img = load_image(fixture + ".png", args.size)
        else:
            import wave

            wav_path, src = str(out / "synthetic.wav"), "synthetic"
            sr = 16000
            t = np.arange(int(sr * args.frames / 25.0)) / sr
            sig = 0.3 * np.sin(2 * np.pi * 220 * t) * (
                1 + 0.5 * np.sin(2 * np.pi * 3 * t)
            )
            with wave.open(wav_path, "w") as f:
                f.setnchannels(1)
                f.setsampwidth(2)
                f.setframerate(sr)
                f.writeframes((sig * 32767).astype(np.int16).tobytes())
            ref_img = np.full((args.size, args.size, 3), 0.5, np.float32)

        rng_np = np.random.default_rng(0)
        kp = np.zeros((134, 3), np.float32)
        kp[:, 0] = rng_np.uniform(0.3 * args.size, 0.7 * args.size, 134)
        kp[:, 1] = rng_np.uniform(0.2 * args.size, 0.9 * args.size, 134)
        kp[:, 2] = 1.0

        t0 = time.time()
        res = a2v(jax.random.PRNGKey(0), wav_path, ref_img, kp.reshape(-1),
                  video_length=args.frames)
        wall = time.time() - t0
        frames = np.asarray(res["frames"])
        assert np.isfinite(frames.astype(np.float32)).all(), "non-finite frames"
        assert frames.any(), "all-zero frames"
        if frames.ndim == 5:  # (1, F, H, W, 3) -> (F, H, W, 3)
            frames = frames[0]
        mp4 = out / "release_check.mp4"
        save_video(frames, str(mp4), fps=25)
        assert mp4.stat().st_size > 0
        return {
            "source": src, "wall_s": round(wall, 2),
            "timings": {k: round(v, 2) for k, v in a2v.timings.items()},
            "mp4": str(mp4), "mp4_bytes": mp4.stat().st_size,
            "frames": list(frames.shape),
        }

    gen_ok = stage("generate_fixture", generate)

    # ------------------------------------------------------- 4. fewstep ---
    if args.fewstep and gen_ok:
        def fewstep():
            env = dict(FEWSTEP_WEIGHTS=weights)
            import os

            rc = subprocess.run(
                [sys.executable, str(REPO / "tools" / "fewstep_quality.py")],
                capture_output=True, text=True,
                env={**os.environ, **env},
            )
            if rc.returncode != 0:
                raise RuntimeError(rc.stderr[-1200:])
            return {"tail": rc.stdout[-400:]}

        stage("fewstep_quality", fewstep)

    _finish(report, out, t_all)


def _finish(report, out, t_all):
    report["ok"] = all(s.get("ok") for s in report["stages"].values())
    report["total_s"] = round(time.time() - t_all, 1)
    p = out / "release_check.json"
    p.write_text(json.dumps(report, indent=2))
    print(json.dumps({"ok": report["ok"], "total_s": report["total_s"],
                      "report": str(p)}))
    sys.exit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
