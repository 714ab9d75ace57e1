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
BENCH_MICROBATCH (5), BENCH_REPEATS (1; >1 reports the median),
BENCH_MODE (audio2vid|pose2vid|fixture|long|train_stage2),
BENCH_PARAMS (zeros|random — random asserts finite frames),
BENCH_WEIGHTS (dir — run verify_weights then the real-weight flagship),
BENCH_DPM (1 — adds the audio2vid_dpm{N}_s row, the quality-evidenced
<10 s configuration; see PERF.md / tools/fewstep_quality.py),
BENCH_DPM_STEPS (15; 12 = the measured "matches DDIM-25" point),
BENCH_LONG (1 — adds the audio2vid_long{3*FRAMES}_s row: slice chaining +
candidate selection + seam splines, reusing every compiled program),
BENCH_TRAIN (1 — runs BENCH_MODE=train_stage2 in a subprocess FIRST and
records train_stage2_step_s as a standing component).
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mmgt_tpu.utils.cache import cache_stats, enable_compilation_cache

# deferred to main(): enable_compilation_cache queries the backend, which
# would initialize this process's TPU client before the training-row
# subprocess gets its exclusive window
_CACHE_DIR = None
_CACHE_BEFORE = None


def _enable_cache():
    global _CACHE_DIR, _CACHE_BEFORE
    _CACHE_DIR = enable_compilation_cache()
    _CACHE_BEFORE = cache_stats(_CACHE_DIR) if _CACHE_DIR else None


def _train_row_subprocess(timeout_s: int = 1500):
    """Run BENCH_MODE=train_stage2 in a SUBPROCESS and return its value.

    Gives the driver bench a standing training-throughput row (VERDICT r4
    next #6) without sharing HBM with the inference pipeline. Must run
    BEFORE this process touches the TPU (one TPU process at a time on the
    relay)."""
    import subprocess

    env = {**os.environ, "BENCH_MODE": "train_stage2", "BENCH_TRAIN": "0"}
    try:
        rc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=timeout_s,
        )
        for line in reversed(rc.stdout.strip().splitlines()):
            if line.startswith("{"):
                row = json.loads(line)
                return {
                    "train_stage2_step_s": row["value"],
                    "train_loss_finite": row["components"].get("loss_finite"),
                }
        return {"train_stage2_step_s": f"failed: rc={rc.returncode}"}
    except Exception as e:  # pragma: no cover - relay-dependent
        return {"train_stage2_step_s": f"failed: {type(e).__name__}"}

STEPS = int(os.environ.get("BENCH_STEPS", "25"))
FRAMES = int(os.environ.get("BENCH_FRAMES", "80"))
SIZE = int(os.environ.get("BENCH_SIZE", "512"))
MICROBATCH = int(os.environ.get("BENCH_MICROBATCH", "5"))
REPEATS = int(os.environ.get("BENCH_REPEATS", "1"))
MODE = os.environ.get("BENCH_MODE", "audio2vid")
PARAMS = os.environ.get("BENCH_PARAMS", "zeros")
WEIGHTS = os.environ.get("BENCH_WEIGHTS", "")
WITH_DPM = os.environ.get("BENCH_DPM", "1") == "1"
# 15 reuses the fast15 row's compiled 5-step chunks; 12 is the measured
# "matches DDIM-25" point (PERF_FEWSTEP.json) but compiles a 6-step chunk
DPM_STEPS = int(os.environ.get("BENCH_DPM_STEPS", "15"))
if MODE == "long":
    # long-clip stress: 3 audio slices -> 240 frames, slice chaining +
    # candidate selection + seam splines + 30 fused context windows/step
    FRAMES = int(os.environ.get("BENCH_FRAMES", "240"))

V5E_PEAK = 197e12  # bf16 FLOP/s, one chip


def zeros_params(tree_fn):
    """Param tree with the right shapes without compiling init programs
    (random values don't change timing; remote-compile of init fns does).

    BENCH_PARAMS=random fills kernels with N(0, 0.02) (norm scales 1,
    biases 0) so the flagship numerics are exercised at full scale and the
    finite-frames assertion is meaningful (VERDICT r3 weak #5)."""
    from mmgt_tpu.utils.testing import fill_params

    return fill_params(
        jax.eval_shape(tree_fn),
        mode="random" if PARAMS == "random" else "zeros",
    )


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
    clip_model = clip_params = audio_proc = wavlm_ext = None
    if WEIGHTS:
        # real-checkpoint flagship (VERDICT r3 #7): certify the converters
        # against the mounted assets, then run the real-weight pipeline
        import subprocess

        rc = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__),
                                          "scripts/verify_weights.py"), WEIGHTS],
            capture_output=True, text=True,
        )
        print(f"# verify_weights rc={rc.returncode}\n{rc.stdout[-2000:]}",
              file=sys.stderr)
        if rc.returncode != 0:
            print(rc.stderr[-2000:], file=sys.stderr)
            raise SystemExit("verify_weights failed; not benching bad weights")
        from mmgt_tpu.utils.weights import load_all_weights

        smga = SMGA(feature_type="baseline")
        w = load_all_weights(WEIGHTS, pipe, smga)
        if w.get("smga_feature_type", "baseline") != smga.feature_type:
            smga = SMGA(feature_type=w["smga_feature_type"])
        params, smga_params = w["pose2vid"], w["smga"]
        clip_model, clip_params = w.get("clip_model"), w.get("clip_params")
        audio_proc, wavlm_ext = w.get("audio_processor"), w.get("wavlm")
    else:
        # baseline (35-d DSP) features: the full host feature path runs for
        # real; the wavlm variant only widens the cond projection
        smga = SMGA(feature_type="baseline")
        smga_params = zeros_params(
            lambda: smga.init_state(jax.random.PRNGKey(0), 1)
        ).params

    from mmgt_tpu.config import InferenceConfig

    a2v = Audio2VideoPipeline(
        smga=smga,
        smga_params=smga_params,
        pose2vid=pipe,
        pose2vid_params=params,
        clip_model=clip_model,
        clip_params=clip_params,
        audio_processor=audio_proc,
        wavlm_extractor=wavlm_ext,
        config=InferenceConfig(
            width=SIZE, height=SIZE, video_length=FRAMES,
            num_inference_steps=STEPS, window_microbatch=MICROBATCH,
            # long mode exercises the reference's full long-clip machinery
            # (scripts/audio2vid.py:300-374): per-slice candidate sampling
            # + continuity selection + seam splines
            use_motion_selection=(MODE == "long"),
            motion_candidates=3,
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
        if PARAMS == "random" or WEIGHTS:
            fr = out["frames"]
            assert np.isfinite(np.asarray(fr, np.float32)).all(), "non-finite frames"
            assert np.asarray(fr).any(), "all-zero frames"
        return out

    t0 = time.time()
    run()
    compile_s = time.time() - t0
    samples, comps = [], []
    for _ in range(REPEATS):
        t0 = time.time()
        run()
        samples.append(time.time() - t0)
        comps.append(dict(a2v.timings))
    best = float(np.median(samples))
    comp = comps[samples.index(sorted(samples)[len(samples) // 2])]
    if REPEATS > 1:
        comp["repeat_samples_s"] = [round(s, 2) for s in samples]

    if STEPS == 25 and not fixture and MODE != "long":
        # Secondary rows must never lose the already-measured flagship row:
        # each is wrapped so a failure records an error string instead of
        # propagating (the relay occasionally faults under prolonged load).
        import dataclasses as _dc

        if os.environ.get("BENCH_LONG", "1") == "1":
            # Standing long-clip row (VERDICT r4 #7): 240 frames = 3 audio
            # slices through the reference's full long-video machinery
            # (slice chaining + candidate selection + seam splines,
            # scripts/audio2vid.py:300-374). Stage-2 runs ONE 240-frame
            # context-windowed generation exactly like the reference's
            # single pipe(...) call — that needs fresh 240-frame compiles
            # (prepare/denoise-chunk/decode, ~350 s measured solo), so
            # this row runs FIRST among the secondaries: the remote
            # compile helper degrades late in a long session (two HTTP
            # 500s at minute ~45 in the r5 validation runs, while the
            # same programs compile fine early).
            try:
                import wave as _wave

                long_frames = 3 * FRAMES
                wav_long = "/tmp/bench_a2v_long.wav"
                sr = 16000
                tt = np.arange(int(sr * long_frames / 25.0)) / sr
                sig = (0.3 * np.sin(2 * np.pi * 220 * tt)
                       * (1 + 0.5 * np.sin(2 * np.pi * 3 * tt)))
                with _wave.open(wav_long, "w") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(sr)
                    w.writeframes((sig * 32767).astype(np.int16).tobytes())
                a2v.config = _dc.replace(
                    a2v.config, video_length=long_frames,
                    use_motion_selection=True, motion_candidates=3,
                )
                for attempt in (0, 1):
                    try:
                        t0 = time.time()
                        a2v(jax.random.PRNGKey(0), wav_long, ref_img,
                            kp.reshape(-1), video_length=long_frames)
                        comp[f"audio2vid_long{long_frames}_compile_s"] = round(
                            time.time() - t0, 2)
                        t0 = time.time()
                        a2v(jax.random.PRNGKey(0), wav_long, ref_img,
                            kp.reshape(-1), video_length=long_frames)
                        comp[f"audio2vid_long{long_frames}_s"] = time.time() - t0
                        break
                    except Exception:
                        if attempt:
                            raise
                        print("# long row retrying once after cool-down",
                              file=sys.stderr)
                        time.sleep(60)
            except Exception as e:  # pragma: no cover - relay-dependent
                comp[f"audio2vid_long{3 * FRAMES}_s"] = f"failed: {type(e).__name__}"
                import traceback

                print(f"# long row failed: {e}", file=sys.stderr)
                traceback.print_exc(limit=12, file=sys.stderr)
            finally:
                a2v.config = _dc.replace(
                    a2v.config, video_length=FRAMES,
                    use_motion_selection=False,
                )

        try:
            # Proposed fidelity-relaxed row toward the <10 s north star
            # (PERF.md): 15 trailing DDIM steps. The step count is *config*
            # in the reference (animation.yaml:28-29 ships 30); the trailing
            # zero-SNR schedule subsamples, so fewer steps is a quality
            # knob, not an algorithm change. Mutating the config on the SAME
            # pipeline instance reuses every compiled program (identical
            # 5-step chunk shapes) — no extra compile.
            a2v.config = _dc.replace(a2v.config, num_inference_steps=15)
            t0 = time.time()
            a2v(jax.random.PRNGKey(0), wav_path, ref_img, kp.reshape(-1),
                video_length=FRAMES)
            comp["audio2vid_fast15_s"] = time.time() - t0
        except Exception as e:  # pragma: no cover - relay-dependent
            comp["audio2vid_fast15_s"] = f"failed: {type(e).__name__}"
            print(f"# fast15 row failed: {e}", file=sys.stderr)
        finally:
            a2v.config = _dc.replace(a2v.config, num_inference_steps=STEPS)

        if WITH_DPM:
            # The quality-evidenced <10 s configuration: DPM-Solver++(2M)
            # at 15 steps tracks the 200-step trajectory 1.5x closer than
            # DDIM-25 (rel latent err 0.039 vs 0.057; even DPM-12 matches
            # DDIM-25 — PERF_FEWSTEP.json, measured on the real full-width
            # architecture). Since r5 the denoise chunk is scheduler-
            # agnostic (diffusion/solver.py): swapping DDIM -> DPM reuses
            # the SAME compiled programs, so the *_compile_s row should be
            # ~0 (it was 184.7 s of pure retrace in r4).
            from mmgt_tpu.diffusion.dpm import DPMSolverPlusPlus2M

            old = pipe.scheduler
            row = f"audio2vid_dpm{DPM_STEPS}_s"
            try:
                pipe.scheduler = DPMSolverPlusPlus2M()
                a2v.config = _dc.replace(
                    a2v.config, num_inference_steps=DPM_STEPS)
                t0 = time.time()
                a2v(jax.random.PRNGKey(0), wav_path, ref_img, kp.reshape(-1),
                    video_length=FRAMES)
                comp[f"audio2vid_dpm{DPM_STEPS}_compile_s"] = round(
                    time.time() - t0, 2)
                t0 = time.time()
                a2v(jax.random.PRNGKey(0), wav_path, ref_img, kp.reshape(-1),
                    video_length=FRAMES)
                comp[row] = time.time() - t0
            except Exception as e:  # pragma: no cover - relay-dependent
                comp[row] = f"failed: {type(e).__name__}"
                print(f"# {row} failed: {e}", file=sys.stderr)
            finally:
                pipe.scheduler = old
                a2v.config = _dc.replace(a2v.config, num_inference_steps=STEPS)

    return best, comp, compile_s


def _oom_kind(msg: str) -> str:
    """"strong": definitely memory (retry the full ladder). "weak": a fault
    that is *often* memory on this relay but can also be a transient relay/
    compile error — worth exactly one retry, not three ~5-min recompiles.
    "device error" stays strong: the >2-min-dispatch fault shrinks with the
    window microbatch, so smaller microbatch is the right response."""
    strong = ("RESOURCE_EXHAUSTED", "Out of memory", "out of memory", "OOM",
              "device error")
    weak = ("Allocator", "INTERNAL")
    if any(n in msg for n in strong):
        return "strong"
    if any(n in msg for n in weak):
        return "weak"
    return "no"


def _audio2vid_with_oom_fallback():
    """Run the flagship; on an OOM/device fault retry at a smaller window
    microbatch so the driver bench always records a number.

    The shared relay chip's usable HBM has been observed degraded to
    ~7.75 GiB (of 16) by earlier OOM-crashed processes (PERF.md round-4
    note); the default window_microbatch=5 was sized for the full 16 GiB.
    Non-memory failures re-raise immediately; ambiguous faults (INTERNAL,
    which also covers relay HTTP 500s) get a single retry. The ladder
    descends from the starting microbatch by halving, then 3/2/1."""
    global MICROBATCH
    ladder = sorted({m for m in (MICROBATCH // 2, 3, 2, 1) if 0 < m < MICROBATCH},
                    reverse=True)
    tried = [MICROBATCH] + ladder
    pending_gc = False
    for i, mb in enumerate(tried):
        if pending_gc:
            # Deferred from the previous iteration's except block: collecting
            # there cannot free the failed attempt's device buffers because
            # the live exception's traceback still pins bench_audio2vid's
            # frame (and with it pipe/params). Here the except block has
            # exited and the frame chain is collectable.
            import gc

            gc.collect()
            pending_gc = False
        MICROBATCH = mb
        try:
            best, comp, compile_s = bench_audio2vid(fixture=(MODE == "fixture"))
            if i:
                comp["microbatch_fallback"] = mb
            return best, comp, compile_s
        except Exception as e:
            msg = f"{type(e).__name__}: {e}"
            print(f"# microbatch={mb} failed: {msg[:600]}", file=sys.stderr)
            kind = _oom_kind(msg)
            if i == len(tried) - 1 or kind == "no" or (kind == "weak" and i > 0):
                raise
            e.__traceback__ = None
            pending_gc = True


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
    train_row = None
    if (
        MODE == "audio2vid"
        and STEPS == 25
        and not WEIGHTS
        and os.environ.get("BENCH_TRAIN", "1") == "1"
    ):
        # before any jax use in THIS process (TPU exclusivity)
        train_row = _train_row_subprocess()
    _enable_cache()
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
        best, comp, compile_s = _audio2vid_with_oom_fallback()
        metric = f"audio2vid_e2e_{FRAMES}f_{SIZE}px_{STEPS}steps_1chip"
        if MODE == "fixture":
            metric += "_fixture"
        elif MODE == "long":
            metric += "_long"
        if WEIGHTS:
            metric += "_realweights"
        if train_row:
            comp.update(train_row)
        fl = useful_flops()
        mfu = {}
        if "stage2_s" in comp:
            # stage2 phase == the pose2vid_e2e workload (rasterize incl.)
            comp["pose2vid_e2e_s"] = round(comp["stage2_s"], 2)
            mfu["stage2"] = round(fl["stage2"] / comp["stage2_s"] / V5E_PEAK, 4)
        if "stage1_s" in comp:
            mfu["stage1"] = round(fl["stage1"] / comp["stage1_s"] / V5E_PEAK, 6)
        comp = {k: round(v, 2) if isinstance(v, float) else v
                for k, v in comp.items()}

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
    if _CACHE_DIR:
        after = cache_stats(_CACHE_DIR)
        cache_note = (
            f" xla_cache={_CACHE_DIR} entries={_CACHE_BEFORE['entries']}->"
            f"{after['entries']} ({after['bytes'] // 2**20} MiB)"
        )
    else:
        cache_note = " xla_cache=disabled"
    print(
        f"# devices={jax.devices()} compile={compile_s:.0f}s steps={STEPS} "
        f"frames={FRAMES} microbatch={MICROBATCH} mode={MODE} params={PARAMS} "
        f"weights={'present:' + WEIGHTS if WEIGHTS else 'absent (set BENCH_WEIGHTS to run the real-checkpoint flagship)'}"
        + cache_note,
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
