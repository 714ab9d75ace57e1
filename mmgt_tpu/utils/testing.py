"""Shape-only parameter materialization for benches/gates/tools.

Real checkpoints don't exist in this image (BASELINE.md), and compiling
flax init programs over the remote relay (or on CPU for the multichip
gate) costs minutes. These helpers build a parameter tree from
`jax.eval_shape` of an init fn — zero compile beyond one trivial
elementwise fill — with values that keep the numerics non-degenerate:
norm scales 1, biases 0, kernels N(0, 0.02).

Used by bench.py (BENCH_PARAMS=random), tools/fewstep_quality.py and
__graft_entry__.dryrun_multichip.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def fill_params(shapes, seed: int = 0, mode: str = "random"):
    """Materialize a `jax.eval_shape` tree.

    mode="zeros": all zeros (cheapest; timing-valid — MXU work is
    data-independent). mode="random": deterministic N(0, 0.02) kernels
    with unit norm scales and zero biases, so forward passes produce
    finite, non-trivial activations without a single module-init compile.
    """
    leaves, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    if mode == "zeros":
        return jax.tree_util.tree_unflatten(
            treedef, [jnp.zeros(s.shape, s.dtype) for _, s in leaves]
        )

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
