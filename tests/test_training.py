import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from mmgt_tpu.models.audio_proj import AudioProjModel
from mmgt_tpu.models.pose_guider import PoseGuider
from mmgt_tpu.models.unet3d import DenoisingUNet3D
from mmgt_tpu.models.unet_ref import ReferenceUNet2D
from mmgt_tpu.models.vae import AutoencoderKL
from mmgt_tpu.pipelines.pose2vid import Pose2VideoPipeline
from mmgt_tpu.training.stage2 import (
    Stage2Trainer,
    merge_params,
    partition_params,
)


def _tiny_pipeline():
    tiny = dict(block_out_channels=(16, 32, 32, 32), heads=4)
    return Pose2VideoPipeline(
        vae=AutoencoderKL(block_out_channels=(16, 16, 32, 32)),
        reference_unet=ReferenceUNet2D(**tiny),
        denoising_unet=DenoisingUNet3D(**tiny),
        pose_guider=PoseGuider(embedding_channels=16, block_out_channels=(4, 8, 8, 16)),
        audio_proj=AudioProjModel(intermediate_dim=32),
        context_size=4,
    )


def test_partition_params_selects_audio_motion():
    pipe = _tiny_pipeline()
    params = pipe.init_params(jax.random.PRNGKey(0), 64, 64)
    train, frozen = partition_params(params)
    tflat = traverse_util.flatten_dict(train, sep="/")
    assert tflat, "no trainable params found"
    for k in tflat:
        assert "_audio_" in k or "_motion_" in k or "audio_proj" in k, k
    fflat = traverse_util.flatten_dict(frozen, sep="/")
    # vae + reference unet fully frozen
    assert any(k.startswith("vae/") for k in fflat)
    assert not any("_motion_" in k for k in fflat)
    # round trip
    merged = merge_params(train, frozen)
    orig = traverse_util.flatten_dict(params, sep="/")
    back = traverse_util.flatten_dict(merged, sep="/")
    assert set(orig) == set(back)


@pytest.mark.slow
def test_train_step_updates_only_trainable():
    pipe = _tiny_pipeline()
    trainer = Stage2Trainer(pipe)
    rng = jax.random.PRNGKey(0)
    params = pipe.init_params(rng, 64, 64)
    state = trainer.init_state(params)
    batch = trainer.make_example_batch(b=2, f=2, height=64, width=64)
    batch = jax.tree.map(
        lambda x: x + 0.1 * np.random.default_rng(0).standard_normal(x.shape).astype(np.float32),
        batch,
    )
    new_state, metrics = jax.jit(trainer.train_step)(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    # trainable params moved, frozen identical
    t_delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(
            lambda a, b: float(jnp.sum(jnp.abs(a - b))),
            state.trainable,
            new_state.trainable,
        ),
    )
    assert t_delta > 0
    f_delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(
            lambda a, b: float(jnp.sum(jnp.abs(a - b))),
            state.frozen,
            new_state.frozen,
        ),
    )
    assert f_delta == 0.0


def test_fill_params_fast():
    """fill_params must never compile — MULTICHIP_r04 rc=124 regression.

    The r4 implementation jitted one fold_in+normal subgraph per leaf in a
    single program; XLA CPU compile is superlinear in leaf count and timed
    out the driver gate. Guard: a >=1000-leaf tree materializes in <10 s.
    """
    import time

    from mmgt_tpu.utils.testing import fill_params

    shapes = {
        f"m{i}": {
            "kernel": jax.ShapeDtypeStruct((8, 8), jnp.float32),
            "bias": jax.ShapeDtypeStruct((8,), jnp.float32),
            "norm_scale": jax.ShapeDtypeStruct((8,), jnp.bfloat16),
        }
        for i in range(400)
    }
    t0 = time.monotonic()
    params = fill_params(shapes, seed=0, mode="random")
    dt = time.monotonic() - t0
    assert dt < 10.0, f"fill_params took {dt:.1f}s on a 1200-leaf tree"
    assert float(jnp.abs(params["m0"]["kernel"]).sum()) > 0
    assert float(jnp.abs(params["m0"]["bias"]).sum()) == 0
    np.testing.assert_array_equal(
        np.asarray(params["m1"]["norm_scale"], np.float32), 1.0
    )
    # deterministic across calls
    again = fill_params(shapes, seed=0, mode="random")
    np.testing.assert_array_equal(
        np.asarray(params["m3"]["kernel"]), np.asarray(again["m3"]["kernel"])
    )


@pytest.mark.slow
def test_dryrun_multichip_8dev():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
