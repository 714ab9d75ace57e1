"""Tensor-parallel correctness at REAL model widths (VERDICT r1 item 8).

Two claims proven here:
  1. the TP regex rules in parallel/mesh.py actually hit the intended
     kernels of the real 320/640-wide attention/FFN blocks (not just toy
     names), with column-parallel outputs and row-parallel inputs;
  2. a tp=2 train step computes the same loss and the same updated params
     as tp=1 (XLA inserts the collectives; math must be unchanged).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util
from jax.sharding import NamedSharding, PartitionSpec as P

from mmgt_tpu.models.audio_proj import AudioProjModel
from mmgt_tpu.models.pose_guider import PoseGuider
from mmgt_tpu.models.unet3d import DenoisingUNet3D
from mmgt_tpu.models.unet_ref import ReferenceUNet2D
from mmgt_tpu.models.vae import AutoencoderKL
from mmgt_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    opt_state_shardings,
    param_shardings,
)
from mmgt_tpu.pipelines.pose2vid import Pose2VideoPipeline
from mmgt_tpu.training.stage2 import Stage2Trainer


def _real_width_pipe():
    """Real 320/640 channel widths (SD1.5's first two levels: head_dim 40
    and 80, GEGLU 2560/5120) at tiny spatial extent."""
    return Pose2VideoPipeline(
        vae=AutoencoderKL(block_out_channels=(16, 16, 32, 32)),
        reference_unet=ReferenceUNet2D(block_out_channels=(320, 640), heads=8),
        denoising_unet=DenoisingUNet3D(block_out_channels=(320, 640), heads=8),
        pose_guider=PoseGuider(
            embedding_channels=320, block_out_channels=(4, 8, 8, 16)
        ),
        audio_proj=AudioProjModel(intermediate_dim=32),
        context_size=4,
    )


def test_tp_rules_hit_real_width_kernels():
    mesh = create_mesh(n_devices=8, tp=2)
    pipe = _real_width_pipe()
    params = jax.eval_shape(
        lambda: pipe.init_params(jax.random.PRNGKey(0), 64, 64)
    )
    sh = param_shardings(mesh, params)
    flat_p = traverse_util.flatten_dict(params, sep="/")
    flat_s = traverse_util.flatten_dict(sh, sep="/")

    col = [k for k, s in flat_s.items() if s.spec == P(None, "tp")]
    row = [k for k, s in flat_s.items() if s.spec == P("tp", None)]
    assert len(col) > 0 and len(row) > 0

    # the intended kernels, at the real widths
    def has(keys, pattern, in_dim=None, out_dim=None):
        hits = [k for k in keys if pattern in k]
        assert hits, f"no sharded kernel matching {pattern!r}"
        for k in hits:
            shp = flat_p[k].shape
            if in_dim:
                assert shp[0] in in_dim, (k, shp)
            if out_dim:
                assert shp[-1] in out_dim, (k, shp)

    # column-parallel: qkv + FFN-in, output dim sharded
    has(col, "attn1/to_q/kernel", out_dim={320, 640})
    has(col, "attn1/to_k/kernel", out_dim={320, 640})
    has(col, "attn1/to_v/kernel", out_dim={320, 640})
    has(col, "ff/proj_geglu/kernel", out_dim={2560, 5120})
    # row-parallel: attention-out + FFN-out, input dim sharded
    has(row, "attn1/to_out/kernel", in_dim={320, 640})
    has(row, "ff/proj_out/kernel", in_dim={1280, 2560})

    # every sharded dim must divide tp
    for k in col:
        assert flat_p[k].shape[-1] % 2 == 0, k
    for k in row:
        assert flat_p[k].shape[0] % 2 == 0, k


def test_opt_state_shardings_mirror_params():
    """Adam moments get the params' TP shardings; counts stay replicated
    (VERDICT r2 weak #3: opt state is 2-3x param bytes)."""
    from mmgt_tpu.training.stage2 import partition_params

    mesh = create_mesh(n_devices=8, tp=2)
    pipe = _real_width_pipe()
    trainer = Stage2Trainer(pipe)
    params = jax.eval_shape(
        lambda: pipe.init_params(jax.random.PRNGKey(0), 64, 64)
    )
    trainable, _ = partition_params(params)
    opt_state = jax.eval_shape(trainer.tx.init, trainable)
    sh = opt_state_shardings(mesh, opt_state, trainable)
    assert jax.tree_util.tree_structure(
        jax.tree.map(lambda _: 0, sh)
    ) == jax.tree_util.tree_structure(jax.tree.map(lambda _: 0, opt_state))
    n_tp = sum(1 for s in jax.tree.leaves(sh) if "tp" in str(s.spec))
    assert n_tp > 0
    # the moments' shardings equal the corresponding param shardings
    p_sh = traverse_util.flatten_dict(
        param_shardings(mesh, trainable), sep="/"
    )
    mu_sh = traverse_util.flatten_dict(sh[1][0].mu, sep="/")
    assert mu_sh.keys() == p_sh.keys()
    for k in p_sh:
        assert mu_sh[k].spec == p_sh[k].spec, k


def _one_step(tp: int):
    mesh = create_mesh(n_devices=2 * tp, dp=2, tp=tp)
    pipe = _real_width_pipe()
    trainer = Stage2Trainer(pipe)
    rng = jax.random.PRNGKey(0)
    params = pipe.init_params(rng, 64, 64)
    state = trainer.init_state(params)
    batch = trainer.make_example_batch(b=2, f=2, height=64, width=64)
    # non-trivial inputs so grads are informative
    batch["pixel_values"] = jax.random.normal(
        jax.random.PRNGKey(1), batch["pixel_values"].shape
    ) * 0.5
    batch["audio_embeds"] = jax.random.normal(
        jax.random.PRNGKey(2), batch["audio_embeds"].shape
    ) * 0.5

    state_sh = type(state)(
        step=NamedSharding(mesh, P()),
        trainable=param_shardings(mesh, state.trainable),
        frozen=param_shardings(mesh, state.frozen),
        opt_state=opt_state_shardings(mesh, state.opt_state, state.trainable),
    )
    if tp > 1:
        n_tp_sharded_opt_leaves = sum(
            1 for s in jax.tree.leaves(state_sh.opt_state)
            if "tp" in str(s.spec)
        )
        assert n_tp_sharded_opt_leaves > 0
    batch_sh = jax.tree.map(lambda x: batch_sharding(mesh, x.ndim), batch)
    state = jax.device_put(state, state_sh)
    batch = jax.device_put(batch, batch_sh)
    step = jax.jit(
        trainer.train_step,
        in_shardings=(state_sh, batch_sh, None),
        out_shardings=(state_sh, None),
    )
    with mesh:
        new_state, metrics = step(state, batch, jax.random.PRNGKey(3))
        jax.block_until_ready(new_state.trainable)
    return float(metrics["loss"]), jax.tree.map(np.asarray, new_state.trainable)


@pytest.mark.slow
def test_tp2_matches_tp1_train_step():
    loss1, tr1 = _one_step(tp=1)
    loss2, tr2 = _one_step(tp=2)
    assert np.isfinite(loss1)
    np.testing.assert_allclose(loss1, loss2, rtol=2e-5)
    flat1 = traverse_util.flatten_dict(tr1, sep="/")
    flat2 = traverse_util.flatten_dict(tr2, sep="/")
    assert flat1.keys() == flat2.keys()
    for k in flat1:
        np.testing.assert_allclose(
            flat1[k], flat2[k], atol=2e-5, rtol=2e-4, err_msg=k
        )


@pytest.mark.slow
def test_tp_sharded_inference_matches_replicated():
    """Full Pose2VideoPipeline inference with TP-sharded UNet params on a
    (dp=2, tp=2) mesh matches the unsharded run — tensor-parallel
    multi-chip inference beyond the reference's DP-only story."""
    from mmgt_tpu.models.audio_proj import AudioProjModel
    from mmgt_tpu.models.pose_guider import PoseGuider
    from mmgt_tpu.models.unet3d import DenoisingUNet3D
    from mmgt_tpu.models.unet_ref import ReferenceUNet2D
    from mmgt_tpu.models.vae import AutoencoderKL

    tiny = dict(block_out_channels=(16, 32, 32, 32), heads=4)

    def build():
        return Pose2VideoPipeline(
            vae=AutoencoderKL(block_out_channels=(16, 16, 32, 32)),
            reference_unet=ReferenceUNet2D(**tiny),
            denoising_unet=DenoisingUNet3D(**tiny),
            pose_guider=PoseGuider(
                embedding_channels=16, block_out_channels=(4, 8, 8, 16)
            ),
            audio_proj=AudioProjModel(intermediate_dim=32),
            context_size=4,
            context_overlap=2,
            window_microbatch=None,
        )

    H = W = 64
    F = 6
    rng = jax.random.PRNGKey(0)
    pipe = build()
    params = pipe.init_params(rng, H, W)
    h8 = H // 8
    masks = [
        tuple(jnp.ones((1, F, (h8 >> l) * (h8 >> l))) for _ in range(3))
        for l in range(3)
    ]
    args = (
        jnp.zeros((1, H, W, 3)), jnp.zeros((1, F, H, W, 3)),
        jnp.zeros((1, 1, 768)), masks, None,
    )
    ref_out = np.asarray(
        pipe(params, rng, *args, num_inference_steps=2)
    )

    mesh = create_mesh(n_devices=4, dp=2, tp=2)
    sh = param_shardings(mesh, params)
    n_tp = sum(
        1
        for s in jax.tree.leaves(sh)
        if "tp" in str(s.spec)
    )
    assert n_tp > 0  # params really are tensor-sharded
    sharded = jax.device_put(params, sh)
    pipe2 = build()
    pipe2.mesh = mesh
    with mesh:
        tp_out = np.asarray(
            pipe2(sharded, rng, *args, num_inference_steps=2)
        )
    np.testing.assert_allclose(tp_out, ref_out, atol=2e-4, rtol=1e-3)
