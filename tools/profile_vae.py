#!/usr/bin/env python
"""Trace the full-size VAE decoder on one decode chunk (the flagship's
8-frame 64^2->512^2 dispatch) and print the device op table — A/B for the
4-phase upsample decomposition (blocks.Upsample, PERF.md backlog #2).

    python tools/profile_vae.py [--frames 8] [--plain] [--top 30]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--plain", action="store_true",
                    help="literal nearest-x2 -> 3x3 conv composition")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmgt_tpu.models import blocks as B
    from mmgt_tpu.models.vae import AutoencoderKL
    from mmgt_tpu.utils import xplane
    from mmgt_tpu.utils.profiling import trace

    B.PHASE_DECOMPOSED_UPSAMPLE = not args.plain
    dt = jnp.bfloat16
    vae = AutoencoderKL(dtype=dt)
    h8 = args.size // 8
    lat = jnp.zeros((args.frames, h8, h8, 4), dt)
    shapes = jax.eval_shape(
        lambda: vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), dt))
    )
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, dt if s.dtype == jnp.float32 else s.dtype),
        shapes,
    )
    fn = jax.jit(
        lambda p, z: vae.apply(p, z, method=AutoencoderKL.decode_scaled)
    )
    out = fn(params, lat)
    np.asarray(out.ravel()[0])
    t0 = time.time()
    out = fn(params, lat)
    np.asarray(out.ravel()[0])
    print(f"# decode chunk ({args.frames}f {args.size}^2, "
          f"{'plain' if args.plain else 'phase-decomposed'}): "
          f"{time.time() - t0:.3f}s chained wall")

    with trace("/tmp/mmgt_vae_trace") as d:
        out = fn(params, lat)
        np.asarray(out.ravel()[0])
    rows = xplane.device_op_table(d)
    total = sum(ms for _, ms, _ in rows)
    print(f"# device total {total:.1f} ms across {len(rows)} distinct HLOs")
    print(f"{'ms':>9}  {'calls':>5}  op")
    for nm, ms, n in rows[: args.top]:
        print(f"{ms:9.2f}  {n:5d}  {nm[:110]}")


if __name__ == "__main__":
    main()
