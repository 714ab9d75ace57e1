#!/usr/bin/env python
"""Trace ONE denoising group (the flagship hot loop) and print the device
op table — the ground-truth breakdown PERF.md's kernel work plans from.

Runs the full-size DenoisingUNet3D forward at the bench shapes
(2*window_microbatch=10 CFG-batched windows x 12 frames, 64^2 latents,
banks + audio + motion) on the real TPU, captures an xplane trace, and
aggregates per-HLO device time via mmgt_tpu.utils.xplane (no tensorboard).

    python tools/profile_group.py [--top 40] [--csv out.csv]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--csv", default=None)
    ap.add_argument("--mb", type=int, default=5, help="window microbatch")
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--no-bank-cache", action="store_true",
                    help="skip the precomputed two-segment bank K/V")
    ap.add_argument("--temporal-layout", default=None,
                    choices=("tokens", "lanes"),
                    help="force the motion-module attention formulation")
    ap.add_argument("--no-uncond", action="store_true",
                    help="run with n_uncond=0 (full CFG batch everywhere)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmgt_tpu.pipelines.pose2vid import Pose2VideoPipeline
    from mmgt_tpu.utils import xplane
    from mmgt_tpu.utils.profiling import trace

    if args.temporal_layout:
        from mmgt_tpu.models import blocks as _B
        from mmgt_tpu.ops import motion_attention as _MA

        _B.FORCE_TEMPORAL_LAYOUT = args.temporal_layout
        # forcing an XLA formulation must also bypass the fused motion
        # kernel, which otherwise wins the route on all kernel-eligible
        # shapes and makes the A/B meaningless
        _MA.use_motion_kernel = lambda *a: False

    dt = jnp.bfloat16
    pipe = Pose2VideoPipeline.build(dtype=dt)
    model = pipe.denoising_unet
    b, f, h8 = 2 * args.mb, args.frames, 64

    shapes = jax.eval_shape(lambda: pipe.init_params(jax.random.PRNGKey(0), 512, 512))
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, dt if s.dtype == jnp.float32 else s.dtype),
        shapes["denoising_unet"],
    )

    latents = jnp.zeros((b, f, h8, h8, 4), dt)
    t = jnp.zeros((b,), jnp.int32)
    ctx = jnp.zeros((b, 1, 768), dt)
    audio = jnp.zeros((b, f, 32, 768), dt)
    pose = jnp.zeros((b, f, h8, h8, 320), dt)
    masks = [
        tuple(jnp.ones((b, f, (h8 >> l) ** 2), dt) for _ in range(3))
        for l in range(3)
    ]
    banks1 = [
        jax.random.normal(jax.random.PRNGKey(i), (1, l, c), dt) * 0.1
        for i, (l, c) in enumerate(pipe._bank_shapes(h8, h8))
    ]
    banks = [jnp.repeat(bk, b, axis=0) for bk in banks1]
    n_uncond = 0 if args.no_uncond else args.mb

    banks_kv = None
    if not args.no_bank_cache:
        from mmgt_tpu.models.unet3d import precompute_bank_kv

        banks_kv = jax.jit(
            lambda p, bs: precompute_bank_kv(model, p, bs)
        )(params, banks1)

    fn = jax.jit(
        lambda p, x, bkv: model.apply(
            p, x, t, ctx, audio, pose, masks, banks, (1.0, 2.0, 3.0),
            n_uncond=n_uncond, banks_kv=bkv,
        )
    )
    out = fn(params, latents, banks_kv)
    np.asarray(out.ravel()[0])  # compile + settle
    import time

    t0 = time.time()
    out = fn(params, latents, banks_kv)
    np.asarray(out.ravel()[0])
    print(f"# one group forward: {time.time() - t0:.3f}s (chained wall)")

    with trace("/tmp/mmgt_group_trace") as d:
        out = fn(params, latents, banks_kv)
        np.asarray(out.ravel()[0])
    rows = xplane.device_op_table(d)
    total = sum(ms for _, ms, _ in rows)
    print(f"# device total {total:.1f} ms across {len(rows)} distinct HLOs")
    print(f"{'ms':>9}  {'calls':>5}  op")
    for nm, ms, n in rows[: args.top]:
        print(f"{ms:9.2f}  {n:5d}  {nm[:110]}")
    if args.csv:
        with open(args.csv, "w") as fh:
            for nm, ms, n in rows:
                fh.write(f"{ms:.3f}\t{n}\t{nm}\n")
        print(f"wrote {args.csv}")


if __name__ == "__main__":
    main()
