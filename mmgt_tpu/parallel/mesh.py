"""Device mesh + sharding rules — the framework's entire distributed layer.

Replaces the reference's Accelerate/DDP/NCCL stack (train_stage_2.py:400-407,
SMGA.py:53-58) with `jax.sharding`: one Mesh, NamedShardings, and XLA
collectives compiled onto ICI. Axes:

  * "dp" — data parallel: batch dimension of training; gradient psum rides
    ICI automatically via jit + sharded batch.
  * "tp" — tensor parallel: attention-head / FFN-column sharding of the big
    UNet weights (regex rules below); XLA inserts the all-gathers/
    reduce-scatters.

At inference the context-window batch axis shards over "dp" too (windows
x CFG are independent), which is the TPU-native replacement for the
reference's sequential window loop (SURVEY §5.7).
"""
from __future__ import annotations

import re
from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_devices: Optional[int] = None,
    dp: Optional[int] = None,
    tp: int = 1,
    devices=None,
) -> Mesh:
    """Create a ("dp", "tp") mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"create_mesh: asked for n_devices={n_devices} but only "
                f"{len(devices)} jax device(s) are visible on backend "
                f"'{jax.default_backend()}'. For a virtual multi-device CPU "
                "mesh, provision devices BEFORE any jax computation runs: "
                "set XLA_FLAGS=--xla_force_host_platform_device_count=N and "
                'jax.config.update("jax_platforms", "cpu") (see '
                "tests/conftest.py), or use __graft_entry__."
                "_provision_cpu_devices."
            )
        devices = devices[:n_devices]
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp < 1 or dp * tp != n:
        raise ValueError(
            f"create_mesh: dp*tp must equal the device count, got dp={dp} "
            f"tp={tp} over {n} device(s). Pick tp dividing {n} (dp is then "
            f"inferred as {n}//tp) or pass dp explicitly."
        )
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    spec = [None] * ndim
    spec[axis] = "dp"
    return NamedSharding(mesh, P(*spec))


# Tensor-parallel rules: (path regex, partition spec builder by ndim).
# Attention q/k/v and FFN-in kernels shard their OUTPUT dim over "tp";
# attention-out and FFN-out kernels shard their INPUT dim (row parallel),
# so each attention/FFN block is a classic Megatron column->row pair and
# XLA only needs one reduce per block.
_TP_COL = re.compile(r"(to_q|to_k|to_v|proj_geglu|proj1|proj2)$")
_TP_ROW = re.compile(r"(to_out|proj_out|proj3)$")


def _spec_for(path: Tuple[str, ...], shape: Tuple[int, ...], tp_enabled: bool):
    if not tp_enabled or len(shape) < 2:
        return P()
    *parents, leaf = path
    parent = parents[-1] if parents else ""
    if leaf == "kernel":
        if _TP_COL.search(parent):
            return P(*([None] * (len(shape) - 1) + ["tp"]))
        if _TP_ROW.search(parent):
            return P(*(["tp"] + [None] * (len(shape) - 1)))
    return P()


def opt_state_shardings(mesh: Mesh, opt_state: Any, params: Any) -> Any:
    """Sharding pytree for an optax state matching `params`' shardings.

    Any subtree of the optimizer state that mirrors the param tree
    (Adam/Adan moments, MultiSteps grad accumulators) gets the params'
    TP shardings; scalar leaves (counts) are replicated. Moments are
    2-3x param bytes — replicating them under TP forfeits exactly the
    memory headroom TP exists to buy.
    """
    pdef = jax.tree_util.tree_structure(params)
    p_sh = param_shardings(mesh, params)
    rep = replicated(mesh)

    def match(x):
        try:
            return jax.tree_util.tree_structure(x) == pdef
        except Exception:
            return False

    flat, treedef = jax.tree_util.tree_flatten(opt_state, is_leaf=match)
    out = [p_sh if match(x) else rep for x in flat]
    return jax.tree_util.tree_unflatten(treedef, out)


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """NamedSharding pytree for a param tree: TP rules + replication."""
    tp_enabled = mesh.shape.get("tp", 1) > 1
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def to_sharding(path, leaf):
        keys = tuple(
            k.key if hasattr(k, "key") else str(k) for k in path
        )
        return NamedSharding(mesh, _spec_for(keys, leaf.shape, tp_enabled))

    shardings = [to_sharding(p, l) for p, l in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, shardings)
