"""Flagship benchmark: the full audio2vid path — audio + portrait ->
3.2 s (80-frame) 512x512 clip.

Runs the real call stack (reference scripts/audio2vid.py:185-530): Stage-1
SMGA DDIM sampling (50 steps x CFG) on host-DSP audio features, keypoint
rasterization to pose/mask videos, and the Stage-2 context-windowed CFG
video diffusion (25 steps) + batched VAE decode. Prints ONE JSON line:

  {"metric": "audio2vid_e2e_...", "value": seconds, "unit": "s",
   "vs_baseline": value/10, "components": {...}, "mfu": {...}}

vs_baseline is value / 10.0 — the north-star target from BASELINE.md is
<10 s on a v5e-8 slice (lower is better; <1 beats the target). The
reference publishes no wall-clock numbers (BASELINE.md), so the target is
the comparison row. `components` carries the per-phase seconds (stage1 =
SMGA sampling + host features; stage2 = rasterize + diffusion + VAE) and
the equivalent pose2vid_e2e row; `mfu` is useful-FLOP utilization of one
v5e chip (197 bf16 TFLOP/s peak).

Env overrides: BENCH_STEPS (25), BENCH_FRAMES (80), BENCH_SIZE (512),
BENCH_MICROBATCH (5), BENCH_REPEATS (1), BENCH_MODE (audio2vid|pose2vid).
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

STEPS = int(os.environ.get("BENCH_STEPS", "25"))
FRAMES = int(os.environ.get("BENCH_FRAMES", "80"))
SIZE = int(os.environ.get("BENCH_SIZE", "512"))
MICROBATCH = int(os.environ.get("BENCH_MICROBATCH", "5"))
REPEATS = int(os.environ.get("BENCH_REPEATS", "1"))
MODE = os.environ.get("BENCH_MODE", "audio2vid")

V5E_PEAK = 197e12  # bf16 FLOP/s, one chip


def zeros_params(tree_fn):
    """Param tree with the right shapes without compiling init programs
    (random values don't change timing; remote-compile of init fns does)."""
    shapes = jax.eval_shape(tree_fn)
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def useful_flops():
    """Closed-form useful-FLOP estimates for the MFU rows (per 80f clip)."""
    evals = STEPS * 2 * (FRAMES // 8)  # steps x CFG x ~10 windows x 12f / 12
    # SD1.5 UNet ~0.68 TFLOP per 64^2-latent frame eval; audio+motion+bank
    # modules add ~55% (PERF.md component table)
    unet = 0.68e12 * 1.55 * STEPS * 2 * int(FRAMES * 1.5)
    vae = 1.24e12 * FRAMES * (SIZE / 512) ** 2      # decoder ~0.62 TMAC/frame
    smga = 2 * 50 * 2 * (80 * 512 * 512 * 2 * 10)   # 8 layers, rough
    return {"stage2": unet + vae, "stage1": float(smga)}


def build_pose2vid(**kw):
    from mmgt_tpu.pipelines.pose2vid import Pose2VideoPipeline

    dt = jnp.bfloat16
    pipe = Pose2VideoPipeline.build(dtype=dt, window_microbatch=MICROBATCH, **kw)
    rng = jax.random.PRNGKey(0)
    params = zeros_params(lambda: pipe.init_params(rng, 64, 64))
    params = jax.tree.map(
        lambda x: x.astype(dt) if x.dtype == jnp.float32 else x, params
    )
    return pipe, params


def bench_pose2vid():
    pipe, params = build_pose2vid()
    dt = jnp.bfloat16
    h8 = SIZE // 8
    rng = jax.random.PRNGKey(0)
    ref = jnp.zeros((1, SIZE, SIZE, 3), dt)
    pose = jnp.zeros((1, FRAMES, SIZE, SIZE, 3), dt)
    clip = jnp.zeros((1, 1, 768), dt)
    masks = [
        tuple(jnp.ones((1, FRAMES, (h8 >> l) * (h8 >> l)), dt) for _ in range(3))
        for l in range(3)
    ]
    audio = jnp.zeros((1, FRAMES, 5, 12, 768), dt)

    def run():
        out = pipe(
            params, rng, ref, pose, clip, masks, audio,
            num_inference_steps=STEPS, guidance_scale=3.5,
        )
        np.asarray(out)  # block_until_ready does not drain the relay

    t0 = time.time()
    run()
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.time()
        run()
        best = min(best, time.time() - t0)
    return best, {"pose2vid_e2e_s": round(best, 2)}, compile_s


def bench_audio2vid(fixture: bool = False):
    import wave

    from mmgt_tpu.pipelines.audio2vid import Audio2VideoPipeline
    from mmgt_tpu.training.stage1 import SMGA

    # uint8 frames (the deliverable is pixels; 4x smaller relay fetch) and
    # per-phase sync points so `components` sums to the total
    pipe, params = build_pose2vid(output_uint8=True, profile_phases=True)
    # baseline (35-d DSP) features: the full host feature path runs for
    # real; the wavlm variant only widens the cond projection
    smga = SMGA(feature_type="baseline")
    smga_params = zeros_params(lambda: smga.init_state(jax.random.PRNGKey(0), 1)).params

    from mmgt_tpu.config import InferenceConfig

    a2v = Audio2VideoPipeline(
        smga=smga,
        smga_params=smga_params,
        pose2vid=pipe,
        pose2vid_params=params,
        config=InferenceConfig(
            width=SIZE, height=SIZE, video_length=FRAMES,
            num_inference_steps=STEPS, window_microbatch=MICROBATCH,
        ),
    )

    fixture_stem = "/root/reference/config/cases/oliver#103842_slice18"
    if fixture and os.path.exists(fixture_stem + ".wav"):
        # the reference's own demo assets (README.md:49): real speech wav
        # + real 512^2 portrait through every host decode path
        from mmgt_tpu.utils.media import load_image

        wav_path = fixture_stem + ".wav"
        ref_img = load_image(fixture_stem + ".png", SIZE)
    else:
        # synthetic 3.2 s wav + gray portrait
        wav_path = "/tmp/bench_a2v.wav"
        sr, dur = 16000, FRAMES / 25.0
        t = np.arange(int(sr * dur)) / sr
        sig = (0.3 * np.sin(2 * np.pi * 220 * t) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t)))
        with wave.open(wav_path, "w") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes((sig * 32767).astype(np.int16).tobytes())
        ref_img = np.full((SIZE, SIZE, 3), 0.5, np.float32)

    rng = np.random.default_rng(0)
    kp = np.zeros((134, 3), np.float32)  # synthetic portrait keypoints
    kp[:, 0] = rng.uniform(0.3 * SIZE, 0.7 * SIZE, 134)  # (no DWPose weights
    kp[:, 1] = rng.uniform(0.2 * SIZE, 0.9 * SIZE, 134)  # ship in-image)
    kp[:, 2] = 1.0

    def run():
        out = a2v(jax.random.PRNGKey(0), wav_path, ref_img, kp.reshape(-1),
                  video_length=FRAMES)
        return out

    t0 = time.time()
    run()
    compile_s = time.time() - t0
    best, comp = float("inf"), {}
    for _ in range(REPEATS):
        t0 = time.time()
        run()
        tot = time.time() - t0
        if tot < best:
            best = tot
            comp = dict(a2v.timings)

    if STEPS == 25 and not fixture:
        # Proposed fidelity-relaxed row toward the <10 s north star
        # (PERF.md): 15 trailing DDIM steps. The step count is *config* in
        # the reference (animation.yaml:28-29 ships 30); the trailing
        # zero-SNR schedule subsamples, so fewer steps is a quality knob,
        # not an algorithm change. Mutating the config on the SAME pipeline
        # instance reuses every compiled program (identical 5-step chunk
        # shapes) — no extra compile.
        import dataclasses as _dc

        a2v.config = _dc.replace(a2v.config, num_inference_steps=15)
        t0 = time.time()
        a2v(jax.random.PRNGKey(0), wav_path, ref_img, kp.reshape(-1),
            video_length=FRAMES)
        comp["audio2vid_fast15_s"] = time.time() - t0
        a2v.config = _dc.replace(a2v.config, num_inference_steps=STEPS)
    return best, comp, compile_s


def bench_train_stage2():
    """One full-size Stage-2 train step (bs 1, 12-frame clip at SIZE^2,
    selective trainability, remat) — the reference's training unit
    (train_stage_2.py:720-962, bs 1/device)."""
    from mmgt_tpu.models.audio_proj import AudioProjModel
    from mmgt_tpu.models.pose_guider import PoseGuider
    from mmgt_tpu.models.unet3d import DenoisingUNet3D
    from mmgt_tpu.models.unet_ref import ReferenceUNet2D
    from mmgt_tpu.models.vae import AutoencoderKL
    from mmgt_tpu.pipelines.pose2vid import Pose2VideoPipeline
    from mmgt_tpu.training.stage2 import Stage2Trainer

    dt = jnp.bfloat16
    pipe = Pose2VideoPipeline(
        vae=AutoencoderKL(dtype=dt),
        reference_unet=ReferenceUNet2D(dtype=dt),
        denoising_unet=DenoisingUNet3D(dtype=dt, remat=True),
        pose_guider=PoseGuider(dtype=dt),
        audio_proj=AudioProjModel(dtype=dt),
    )
    trainer = Stage2Trainer(pipe)
    params = zeros_params(lambda: pipe.init_params(jax.random.PRNGKey(0), 64, 64))
    params = jax.tree.map(
        lambda x: x.astype(dt) if x.dtype == jnp.float32 else x, params
    )
    state = trainer.init_state(params)
    batch = trainer.make_example_batch(b=1, f=12, height=SIZE, width=SIZE)
    batch = jax.tree.map(lambda x: jnp.asarray(x, dt), batch)
    step = jax.jit(trainer.train_step, donate_argnums=(0,))

    t0 = time.time()
    state, m = step(state, batch, jax.random.PRNGKey(1))
    np.asarray(m["loss"])
    compile_s = time.time() - t0
    best = float("inf")
    for i in range(max(REPEATS, 2)):
        t0 = time.time()
        state, m = step(state, batch, jax.random.PRNGKey(2 + i))
        np.asarray(m["loss"])
        best = min(best, time.time() - t0)
    return best, {"loss_finite": bool(np.isfinite(float(m["loss"])))}, compile_s


def main():
    if MODE == "train_stage2":
        best, comp, compile_s = bench_train_stage2()
        print(
            json.dumps(
                {
                    "metric": f"train_stage2_step_12f_{SIZE}px_bs1_1chip",
                    "value": round(best, 2),
                    "unit": "s",
                    "vs_baseline": round(best / 10.0, 3),
                    "components": comp,
                }
            )
        )
        print(f"# compile={compile_s:.0f}s", file=sys.stderr)
        return
    if MODE == "pose2vid":
        best, comp, compile_s = bench_pose2vid()
        metric = f"pose2vid_e2e_{FRAMES}f_{SIZE}px_{STEPS}steps_1chip"
        mfu = {"stage2": round(useful_flops()["stage2"] / best / V5E_PEAK, 4)}
    else:
        best, comp, compile_s = bench_audio2vid(fixture=(MODE == "fixture"))
        metric = f"audio2vid_e2e_{FRAMES}f_{SIZE}px_{STEPS}steps_1chip"
        if MODE == "fixture":
            metric += "_fixture"
        fl = useful_flops()
        mfu = {}
        if "stage2_s" in comp:
            # stage2 phase == the pose2vid_e2e workload (rasterize incl.)
            comp["pose2vid_e2e_s"] = round(comp["stage2_s"], 2)
            mfu["stage2"] = round(fl["stage2"] / comp["stage2_s"] / V5E_PEAK, 4)
        if "stage1_s" in comp:
            mfu["stage1"] = round(fl["stage1"] / comp["stage1_s"] / V5E_PEAK, 6)
        comp = {k: round(v, 2) for k, v in comp.items()}

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(best, 2),
                "unit": "s",
                "vs_baseline": round(best / 10.0, 3),
                "components": comp,
                "mfu": mfu,
            }
        )
    )
    print(
        f"# devices={jax.devices()} compile={compile_s:.0f}s steps={STEPS} "
        f"frames={FRAMES} microbatch={MICROBATCH} mode={MODE}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
