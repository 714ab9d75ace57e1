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
import numpy as np


def fill_params(shapes, seed: int = 0, mode: str = "random"):
    """Materialize a `jax.eval_shape` tree WITHOUT compiling anything.

    mode="zeros": all zeros (cheapest; timing-valid — MXU work is
    data-independent). mode="random": deterministic N(0, 0.02) kernels
    with unit norm scales and zero biases, so forward passes produce
    finite, non-trivial activations without a single module-init compile.

    Values are drawn HOST-SIDE (numpy `default_rng`) and device_put as
    constants. The previous implementation wrapped one fold_in+normal
    subgraph per leaf in a single `@jax.jit`; XLA CPU compile of that
    program is superlinear in leaf count (multi-minute at pipeline scale)
    and timed out the driver's multichip gate in r4 (MULTICHIP_r04
    rc=124). Guarded by tests/test_training.py::test_fill_params_fast.
    """
    leaves, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    if mode == "zeros":
        return jax.tree_util.tree_unflatten(
            treedef, [jnp.zeros(s.shape, s.dtype) for _, s in leaves]
        )

    rng = np.random.default_rng(seed)
    out = []
    for path, s in leaves:
        name = str(path[-1])
        if "scale" in name:
            a = np.ones(s.shape, np.float32)
        elif "bias" in name:
            a = np.zeros(s.shape, np.float32)
        else:
            a = 0.02 * rng.standard_normal(s.shape, dtype=np.float32)
        # jax dtypes (incl. bfloat16) are ml_dtypes-backed numpy dtypes,
        # so the cast happens on host; jnp.asarray is a pure transfer.
        out.append(jnp.asarray(a.astype(s.dtype)))
    return jax.tree_util.tree_unflatten(treedef, out)
