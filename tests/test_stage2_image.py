import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from mmgt_tpu.models.pose_guider import PoseGuider
from mmgt_tpu.models.unet3d import DenoisingUNet3D
from mmgt_tpu.models.unet_ref import ReferenceUNet2D
from mmgt_tpu.models.vae import AutoencoderKL
from mmgt_tpu.pipelines.pose2img import Pose2ImagePipeline
from mmgt_tpu.training.stage2_image import (
    Stage2ImageTrainer,
    partition_params_image,
)

TINY = dict(block_out_channels=(16, 32, 32, 32), heads=4)


def _trainer():
    return Stage2ImageTrainer(
        vae=AutoencoderKL(block_out_channels=(16, 16, 32, 32)),
        reference_unet=ReferenceUNet2D(**TINY),
        denoising_unet=DenoisingUNet3D(
            use_motion_module=False, use_audio_module=False, **TINY
        ),
        pose_guider=PoseGuider(embedding_channels=16,
                               block_out_channels=(4, 8, 8, 16)),
    )


def test_partition_image_trainables():
    tr = _trainer()
    params = tr.init_params(jax.random.PRNGKey(0), 64, 64)
    train, frozen = partition_params_image(params)
    tflat = traverse_util.flatten_dict(train, sep="/")
    fflat = traverse_util.flatten_dict(frozen, sep="/")
    assert any(k.startswith("denoising_unet/") for k in tflat)
    assert any(k.startswith("pose_guider/") for k in tflat)
    # reference unet trainable except its last up block
    assert any(k.startswith("reference_unet/params/down_0") for k in tflat)
    assert not any("/up_3_" in k for k in tflat if k.startswith("reference_unet"))
    assert any(k.startswith("reference_unet/params/up_3_") for k in fflat)
    assert all(not k.startswith("vae/") for k in tflat)


@pytest.mark.slow
def test_stage2_image_train_step():
    tr = _trainer()
    rng = jax.random.PRNGKey(0)
    params = tr.init_params(rng, 64, 64)
    state = tr.init_state(params)
    b = 2
    batch = {
        "tgt_image": jnp.zeros((b, 64, 64, 3)),
        "ref_image": jnp.zeros((b, 64, 64, 3)),
        "tgt_pose": jnp.zeros((b, 64, 64, 3)),
        "clip_embed": jnp.zeros((b, 1, 768)),
    }
    new_state, metrics = jax.jit(tr.train_step)(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


@pytest.mark.slow
def test_pose2img_pipeline():
    tr = _trainer()
    rng = jax.random.PRNGKey(0)
    params = tr.init_params(rng, 64, 64)
    pipe = Pose2ImagePipeline(
        vae=tr.vae,
        reference_unet=tr.reference_unet,
        denoising_unet=tr.denoising_unet,
        pose_guider=tr.pose_guider,
    )
    out = pipe(
        params, rng,
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, 1, 768)),
        num_inference_steps=2,
    )
    assert out.shape == (1, 64, 64, 3)
    o = np.asarray(out)
    assert np.isfinite(o).all() and o.min() >= 0 and o.max() <= 1
