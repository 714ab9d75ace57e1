"""Flagship benchmark: Stage-2 pose2vid — 3.2 s (80-frame) 512x512 clip.

Measures the end-to-end jitted pipeline (reference branch + 25-step
context-windowed CFG denoising + batched VAE decode) on the available
accelerator and prints ONE JSON line:

  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": ratio}

vs_baseline is value / 10.0 — the north-star target from BASELINE.md is
<10 s on a v5e-8 slice for this exact workload (lower is better; <1 beats
the target). The reference PyTorch repo publishes no wall-clock numbers
(BASELINE.md), so the target is the comparison row.

Env overrides: BENCH_STEPS (25), BENCH_FRAMES (80), BENCH_SIZE (512),
BENCH_MICROBATCH (5), BENCH_REPEATS (1).
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


def zeros_params(pipe, height, width):
    """Param tree with the right shapes without compiling init programs
    (random values don't change timing; remote-compile of 5 init fns does)."""
    rng = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(lambda: pipe.init_params(rng, height, width))
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def main():
    from mmgt_tpu.pipelines.pose2vid import Pose2VideoPipeline

    dt = jnp.bfloat16
    pipe = Pose2VideoPipeline.build(dtype=dt, window_microbatch=MICROBATCH)
    params = zeros_params(pipe, 64, 64)
    params = jax.tree.map(
        lambda x: x.astype(dt) if x.dtype == jnp.float32 else x, params
    )

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
        out.block_until_ready()
        return out

    t0 = time.time()
    run()  # compile + first run
    compile_s = time.time() - t0

    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.time()
        run()
        best = min(best, time.time() - t0)

    print(
        json.dumps(
            {
                "metric": f"pose2vid_e2e_{FRAMES}f_{SIZE}px_{STEPS}steps_1chip",
                "value": round(best, 2),
                "unit": "s",
                "vs_baseline": round(best / 10.0, 3),
            }
        )
    )
    print(
        f"# devices={jax.devices()} compile={compile_s:.0f}s steps={STEPS} "
        f"frames={FRAMES} microbatch={MICROBATCH}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
