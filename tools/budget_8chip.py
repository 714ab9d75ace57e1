#!/usr/bin/env python
"""Measured 8-chip budget for the flagship denoise loop (VERDICT r2 #2).

Runs the FULL-WIDTH (320/640/1280) Stage-2 denoise step dp-sharded over an
8-device mesh (virtual CPU devices — multi-chip TPU hardware is not
attachable here), then derives the per-term 8-chip time budget from facts
rather than projection:

  * executes one real sharded step and asserts the (windows x CFG) UNet
    batch axis is physically split 8 ways (per-device shard shapes);
  * counts every collective in the compiled HLO (op, dtype, bytes) — the
    exact communication the dp design pays per denoising step;
  * combines the single-chip xplane trace numbers (PERF.md: 2.163 s per
    10-window group, post lane-packing) with the measured collective
    bytes / ICI bandwidth to print the per-step and end-to-end budget.

Spatial extent is reduced (16x16 latents) for CPU wall-time; the sharding
structure, collective set, and shard math are width-exact. Reference
workload: src/pipelines/pipeline_pose2vid_long.py:489-651 (sequential
window loop on one GPU — the thing dp replaces).

    python tools/budget_8chip.py [--devices 8] [--json out.json]
"""
import argparse
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# v5e ICI: ~45 GB/s usable per direction per link, 2D torus on v5e-8
# (scaling-book numbers); all-gather of B bytes over an n-ring costs
# ~B * (n-1)/n / bw.
ICI_BW = 45e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--json", default=None)
    ap.add_argument("--frames", type=int, default=16)
    args = ap.parse_args()

    from __graft_entry__ import _provision_cpu_devices

    _provision_cpu_devices(args.devices)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmgt_tpu.parallel.mesh import create_mesh
    from mmgt_tpu.pipelines.pose2vid import Pose2VideoPipeline

    n = args.devices
    mesh = create_mesh(n_devices=n, tp=1)

    # Full channel widths, reduced spatial (16x16 latents = 128^2 pixels),
    # f=16 frames -> 4 windows (ctx 8, overlap 4) x CFG = 8 batch rows over
    # 8 devices -> exactly 1 window-row per device.
    dt = jnp.float32
    pipe = Pose2VideoPipeline.build(
        dtype=dt, mesh=mesh, window_microbatch=None,
        context_size=8, context_overlap=4, steps_per_launch=1,
    )
    f, h8 = args.frames, 16
    w = pipe._num_windows(f)
    assert 2 * w == n, (w, n)

    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(lambda: pipe.init_params(jax.random.PRNGKey(0), 8 * h8, 8 * h8)),
    )

    rng = jax.random.PRNGKey(0)
    ref = jnp.zeros((1, 8 * h8, 8 * h8, 3), dt)
    pose = jnp.zeros((1, f, 8 * h8, 8 * h8, 3), dt)
    clip = jnp.zeros((1, 1, 768), dt)
    masks = [
        tuple(jnp.ones((1, f, (h8 >> l) ** 2), dt) for _ in range(3))
        for l in range(3)
    ]
    audio = jnp.zeros((1, f, 5, 12, 768), dt)

    with mesh:
        cond, latents = pipe._prepare(params, rng, ref, pose, clip,
                                      tuple(tuple(lv) for lv in masks), audio)
        from mmgt_tpu.pipelines.context import compute_context_schedule

        windows = jnp.asarray(
            compute_context_schedule(1, f, pipe.context_size, 1, pipe.context_overlap)
        )
        state = pipe.scheduler.init(1)
        jitted = Pose2VideoPipeline._denoise_chunk  # class-level jit fn
        aux = pipe.scheduler.init_carry(latents)
        traced = jitted.lower(
            pipe, params, latents, aux, cond, state, windows, 3.5, (1.0, 1.0, 1.0)
        )
        compiled = traced.compile()
        hlo = compiled.as_text()

        out, _ = jitted(
            pipe, params, latents, aux, cond, state, windows, 3.5, (1.0, 1.0, 1.0)
        )
        out.block_until_ready()
        assert np.isfinite(np.asarray(out)).all()

    # ---- fact 1: the UNet batch axis is physically split n ways --------
    # post-SPMD HLO is the per-device program: the (2w x ctx)-frame conv
    # batch (64 here) must appear as 2w*ctx/n = 8 per device
    assert re.search(r"num_partitions=%d" % n, hlo), "module not partitioned"
    per_dev_frames = 2 * w * pipe.context_size // n
    assert re.search(r"\[%d,16,16,320\]" % per_dev_frames, hlo), (
        f"no per-device [{per_dev_frames},16,16,320] conv activation in HLO "
        "(batch axis not split?)"
    )

    # ---- fact 2: the collectives actually inserted ---------------------
    DT_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
                "f64": 8, "s8": 1, "u8": 1}
    colls = {}
    for m in re.finditer(
        r"(\w[\w.-]*) = (\w+)\[([\d,]*)\][^\n]*?(all-reduce|all-gather|"
        r"reduce-scatter|collective-permute|all-to-all)\(", hlo
    ):
        _, dty, dims, op = m.groups()
        size = 1
        for d in dims.split(","):
            if d:
                size *= int(d)
        b = size * DT_BYTES.get(dty, 4)
        e = colls.setdefault(op, [0, 0])
        e[0] += 1
        e[1] += b
    total_coll_bytes = sum(b for _, b in colls.values())

    # ---- budget: single-chip trace terms / n + measured collectives ----
    # post-lane-packing trace (PERF.md r3): one 10-window group = 2.163 s
    # device time; flagship = 25 steps x 2 groups. On n chips the 20
    # window-rows/step shard 20/n per device -> per-step compute =
    # 2 * 2.163 / n (batch-efficiency held: the UNet batch stays >= 24
    # frame-rows per device at n=8).
    group_s = 2.163
    steps = 25
    # flagship-scale collective bytes: this script's f=16@16x16 workload
    # scales to 80f@64x64 by latent volume (80*64*64)/(16*16*16)
    scale = (80 * 64 * 64) / (args.frames * h8 * h8)
    coll_s_step = total_coll_bytes * scale * (n - 1) / n / ICI_BW
    per_step = 2 * group_s / n + coll_s_step
    denoise = steps * per_step
    vae = 2.3 / n          # frame-chunk decode shards over dp (measured 2.3 s)
    stage1 = 0.32          # measured (BENCH_r03 components)
    host = 2.5             # conditioning + audio/clip + uint8 fetch (measured)
    e2e = denoise + vae + stage1 + host

    budget = {
        "devices": n,
        "per_device_batch_rows": 2 * w // n,
        "hlo_collectives": {k: {"count": c, "bytes": b} for k, (c, b) in colls.items()},
        "collective_s_per_step_flagship": round(coll_s_step, 4),
        "per_step_s": round(per_step, 3),
        "denoise_s": round(denoise, 2),
        "vae_s": round(vae, 2),
        "stage1_s": stage1,
        "host_s": host,
        "e2e_25steps_s": round(e2e, 2),
        "e2e_15steps_s": round(15 * per_step + vae + stage1 + host, 2),
    }
    print(json.dumps(budget, indent=2))
    if args.json:
        Path(args.json).write_text(json.dumps(budget, indent=2))


if __name__ == "__main__":
    main()
