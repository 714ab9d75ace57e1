"""Quantify sampler/step-count configurations on the REAL Stage-2
architecture: latent-trajectory error vs a long-DDIM reference plus pixel
metrics — the evidence behind the <10 s serving configuration (the step
count is config in the reference, config/prompts/animation.yaml:28-29;
the reference publishes no sampler-accuracy numbers at all).

Protocol (VERDICT r3 #2/#3): full-width UNet/VAE, deterministic random
weights, one fixed initial noise + conditioning. A 200-step trailing DDIM
run is quasi-ground-truth; candidates {DDIM-25, DDIM-15, DPM-12, DPM-15,
DPM-25} are scored by
  * rel_latent_err = ||x - x_gt|| / ||x_gt||   (final denoised latents)
  * PSNR / SSIM / temporal-flicker delta / CLIP identity drift on decoded
    frames vs the ground-truth decode (mmgt_tpu.utils.metrics).

Usage:  python tools/fewstep_quality.py [--out PERF_FEWSTEP.json]
Env:    FSQ_SIZE (512) FSQ_FRAMES (16) FSQ_REF_STEPS (200) FSQ_CPU (0)
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("FSQ_CPU", "0") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp
import numpy as np

SIZE = int(os.environ.get("FSQ_SIZE", "512"))
FRAMES = int(os.environ.get("FSQ_FRAMES", "16"))
REF_STEPS = int(os.environ.get("FSQ_REF_STEPS", "200"))


def random_params(pipe, seed: int = 0):
    """Deterministic non-degenerate random weights from shapes only — no
    init-program compile (norm scales 1, biases 0, kernels N(0, 0.02); the
    trajectories need a non-linear model, not a trained one)."""
    shapes = jax.eval_shape(lambda: pipe.init_params(jax.random.PRNGKey(0), 64, 64))
    flat = jax.tree_util.tree_flatten_with_path(shapes)
    leaves, treedef = flat[0], flat[1]

    @jax.jit
    def fill(key):
        out = []
        for i, (path, s) in enumerate(leaves):
            name = str(path[-1])
            if "scale" in name:
                out.append(jnp.ones(s.shape, s.dtype))
            elif "bias" in name:
                out.append(jnp.zeros(s.shape, s.dtype))
            else:
                out.append(
                    0.02
                    * jax.random.normal(
                        jax.random.fold_in(key, i), s.shape, jnp.float32
                    ).astype(s.dtype)
                )
        return jax.tree_util.tree_unflatten(treedef, out)

    return fill(jax.random.PRNGKey(seed))


def build(scheduler):
    from mmgt_tpu.pipelines.pose2vid import Pose2VideoPipeline

    return Pose2VideoPipeline.build(
        dtype=jnp.bfloat16,
        scheduler=scheduler,
        window_microbatch=2,
        output_uint8=False,
    )


def run_latents(pipe, params, steps: int, inputs) -> jnp.ndarray:
    """The pipeline's denoise path, stopping at final latents."""
    from mmgt_tpu.pipelines.context import compute_context_schedule
    from mmgt_tpu.pipelines.pose2vid import _largest_divisor_at_most

    rng, ref, pose, clip, masks, audio = inputs
    state = pipe.scheduler.init(steps)
    windows = jnp.asarray(
        compute_context_schedule(
            steps, FRAMES, pipe.context_size, 1, pipe.context_overlap
        )
    )
    cond, latents = pipe._prepare(params, rng, ref, pose, clip, masks, audio)
    aux = pipe.scheduler.init_carry(latents)
    k = _largest_divisor_at_most(steps, pipe.steps_per_launch or steps)
    for o in range(0, steps, k):
        chunk = type(state)(*[x[o : o + k] for x in state])
        latents, aux = pipe._denoise_chunk(
            params, latents, aux, cond, chunk, windows[o : o + k], 3.5,
            (1.0, 1.0, 1.0),
        )
    return latents


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from mmgt_tpu.diffusion.ddim import DDIMScheduler
    from mmgt_tpu.diffusion.dpm import DPMSolverPlusPlus2M
    from mmgt_tpu.utils import metrics as M

    dt = jnp.bfloat16
    h8 = SIZE // 8
    rng = jax.random.PRNGKey(7)
    r_in = np.random.default_rng(0)
    inputs = (
        rng,
        jnp.asarray(r_in.normal(0, 0.5, (1, SIZE, SIZE, 3)), dt),
        jnp.asarray(r_in.uniform(0, 1, (1, FRAMES, SIZE, SIZE, 3)), dt),
        jnp.asarray(r_in.normal(0, 0.5, (1, 1, 768)), dt),
        tuple(
            tuple(jnp.ones((1, FRAMES, (h8 >> l) ** 2), dt) for _ in range(3))
            for l in range(3)
        ),
        jnp.asarray(r_in.normal(0, 0.5, (1, FRAMES, 5, 12, 768)), dt),
    )

    ddim_pipe = build(DDIMScheduler())
    dpm_pipe = build(DPMSolverPlusPlus2M())
    # identical param values for both pipelines (same shapes/tree)
    params = random_params(ddim_pipe)

    def decode(pipe, lat):
        return np.asarray(pipe._decode(params, lat)[None][0], np.float32)

    t0 = time.time()
    gt_lat = run_latents(ddim_pipe, params, REF_STEPS, inputs)
    gt_lat_np = np.asarray(gt_lat, np.float32)
    gt_norm = float(np.linalg.norm(gt_lat_np))
    gt_frames = decode(ddim_pipe, gt_lat)
    print(f"# ground truth DDIM-{REF_STEPS}: {time.time()-t0:.0f}s "
          f"|x|={gt_norm:.1f}", file=sys.stderr)

    from mmgt_tpu.models.clip_vision import CLIPVisionModel

    clip_model = CLIPVisionModel(dtype=dt)
    clip_params = jax.jit(clip_model.init)(
        jax.random.PRNGKey(3), jnp.zeros((1, 224, 224, 3), dt)
    )

    configs = [
        ("ddim", ddim_pipe, 25),
        ("ddim", ddim_pipe, 15),
        ("dpm++2m", dpm_pipe, 25),
        ("dpm++2m", dpm_pipe, 15),
        ("dpm++2m", dpm_pipe, 12),
    ]
    rows = []
    for name, pipe, steps in configs:
        t0 = time.time()
        lat = run_latents(pipe, params, steps, inputs)
        lat_np = np.asarray(lat, np.float32)
        frames = decode(pipe, lat)
        row = {
            "sampler": name,
            "steps": steps,
            "rel_latent_err": round(
                float(np.linalg.norm(lat_np - gt_lat_np)) / gt_norm, 5
            ),
            "psnr_vs_gt_db": round(M.psnr(frames, gt_frames), 2),
            "ssim_vs_gt": round(M.ssim(frames, gt_frames), 4),
            "flicker": round(M.temporal_flicker(frames[0]), 5),
            "clip_drift_vs_gt": round(
                M.clip_identity_drift(frames[0], gt_frames[0], clip_model,
                                      clip_params), 5
            ),
            "wall_s": round(time.time() - t0, 1),
        }
        rows.append(row)
        print(json.dumps(row))

    result = {
        "protocol": {
            "size": SIZE, "frames": FRAMES, "ref": f"ddim-{REF_STEPS}",
            "gt_flicker": round(M.temporal_flicker(gt_frames[0]), 5),
            "weights": "random_params(seed=0)", "guidance": 3.5,
        },
        "rows": rows,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps(result["protocol"]))


if __name__ == "__main__":
    main()
