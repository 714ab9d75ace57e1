import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmgt_tpu.utils.metrics import MetricsLogger
from mmgt_tpu.utils.profiling import StepTimer, device_time


def test_metrics_logger(tmp_path):
    log = MetricsLogger(str(tmp_path), echo_every=1000)
    log.log(1, {"loss": jnp.asarray(0.5), "lr": 1e-4})
    log.log(2, {"loss": 0.4})
    log.close()
    lines = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert lines[0]["step"] == 1 and abs(lines[0]["loss"] - 0.5) < 1e-6
    assert lines[1]["loss"] == 0.4


def test_step_timer():
    t = StepTimer()
    t.mark("step")
    t.lap("step")
    t.lap("step")
    assert "step" in t.means()
    assert t.means()["step"] >= 0


def test_device_time_runs():
    f = jax.jit(lambda x: x * 2.0 + 1.0)
    x = jnp.ones((128, 128))
    dt = device_time(f, x, iters=3)
    assert dt >= 0


@pytest.mark.slow
def test_lmks2vid_pipeline_tiny():
    from mmgt_tpu.models.audio_proj import AudioProjModel
    from mmgt_tpu.models.pose_guider import PoseGuider
    from mmgt_tpu.models.unet3d import DenoisingUNet3D
    from mmgt_tpu.models.unet_ref import ReferenceUNet2D
    from mmgt_tpu.models.vae import AutoencoderKL
    from mmgt_tpu.pipelines.lmks2vid import Lmks2VideoPipeline
    from mmgt_tpu.pipelines.pose2vid import Pose2VideoPipeline

    tiny = dict(block_out_channels=(16, 32, 32, 32), heads=4)
    pg = lambda: PoseGuider(embedding_channels=16, block_out_channels=(4, 8, 8, 16))
    base = Pose2VideoPipeline(
        vae=AutoencoderKL(block_out_channels=(16, 16, 32, 32)),
        reference_unet=ReferenceUNet2D(**tiny),
        denoising_unet=DenoisingUNet3D(**tiny),
        pose_guider=pg(),
        audio_proj=AudioProjModel(intermediate_dim=32),
        context_size=4,
        context_overlap=2,
    )
    pipe = Lmks2VideoPipeline(base=base, guider_a=pg(), guider_b=pg())
    rng = jax.random.PRNGKey(0)
    params = pipe.init_params(rng, 64, 64)
    F, H = 4, 64
    masks = [
        tuple(jnp.ones((1, F, (8 >> l) * (8 >> l))) for _ in range(3))
        for l in range(3)
    ]
    out = pipe(
        params, rng,
        jnp.zeros((1, H, H, 3)),
        jnp.zeros((1, F, H, H, 3)),
        jnp.zeros((1, F, H, H, 3)),
        jnp.zeros((1, 1, 768)),
        masks,
        num_inference_steps=2,
    )
    assert out.shape == (1, F, H, H, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_motion_autoencoder():
    from mmgt_tpu.models.motion_autoencoder import EmbeddingNet

    net = EmbeddingNet(length=16, dim=12, latent_dim=8)
    rng = jax.random.PRNGKey(0)
    poses = jnp.zeros((2, 16, 12))
    params = net.init(rng, poses)
    recon, mu, logvar = net.apply(params, poses)
    assert recon.shape == (2, 16, 12)
    assert mu.shape == (2, 8) and logvar.shape == (2, 8)
    z = net.apply(params, poses, method=EmbeddingNet.encode)
    np.testing.assert_allclose(np.asarray(z), np.asarray(mu))


def test_grad_accumulation_trainer():
    import optax

    from mmgt_tpu.training.stage2 import Stage2Trainer
    from tests.test_training import _tiny_pipeline

    tr = Stage2Trainer(_tiny_pipeline(), gradient_accumulation_steps=4)
    assert isinstance(tr.tx, optax.GradientTransformation) or hasattr(
        tr.tx, "update"
    )


def test_slerp_interpolation():
    from mmgt_tpu.pipelines.interp import interpolate_latents, slerp

    a = jnp.ones((2, 2, 2))
    b = 3.0 * jnp.ones((2, 2, 2))
    mid = slerp(a, b, 0.5)  # parallel -> lerp
    np.testing.assert_allclose(np.asarray(mid), 2.0, rtol=1e-5)
    lat = jnp.stack([a, b])
    out = interpolate_latents(lat, 2)
    assert out.shape == (3, 2, 2, 2)
    np.testing.assert_allclose(np.asarray(out[1]), 2.0, rtol=1e-5)
    # orthogonal vectors: slerp stays on the arc (non-lerp path)
    v0 = jnp.asarray([1.0, 0.0])
    v1 = jnp.asarray([0.0, 1.0])
    m = slerp(v0, v1, 0.5)
    np.testing.assert_allclose(np.asarray(m), [0.7071, 0.7071], atol=1e-3)


@pytest.mark.slow
def test_unet3d_remat_matches():
    from mmgt_tpu.models.unet3d import DenoisingUNet3D

    tiny = dict(block_out_channels=(16, 32, 32, 32), heads=4)
    rng = jax.random.PRNGKey(0)
    lat = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 2, 8, 8, 4)), jnp.float32
    )
    ctx = jnp.zeros((1, 1, 768))
    t = jnp.zeros((1,), jnp.int32)
    m0 = DenoisingUNet3D(**tiny)
    m1 = DenoisingUNet3D(remat=True, **tiny)
    params = m0.init(rng, lat, t, ctx, None, None, None, None)
    o0 = m0.apply(params, lat, t, ctx, None, None, None, None)
    o1 = m1.apply(params, lat, t, ctx, None, None, None, None)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=1e-5)
    # grads flow through the remat path
    g = jax.grad(
        lambda p: jnp.sum(m1.apply(p, lat, t, ctx, None, None, None, None) ** 2)
    )(params)
    assert np.isfinite(
        float(jnp.sum(jnp.abs(jax.tree.leaves(g)[0])))
    )


def test_fill_params_modes():
    """Shape-only param materialization (utils.testing.fill_params): right
    shapes/dtypes, scales 1 / biases 0 / kernels non-degenerate, and
    deterministic in the seed."""
    import flax.linen as fnn

    from mmgt_tpu.utils.testing import fill_params

    mod = fnn.Sequential([fnn.Dense(8), fnn.LayerNorm(), fnn.Dense(4)])
    shapes = jax.eval_shape(
        lambda: mod.init(jax.random.PRNGKey(0), jnp.zeros((2, 8)))
    )
    z = fill_params(shapes, mode="zeros")
    assert all(not np.asarray(x).any() for x in jax.tree.leaves(z))
    r1 = fill_params(shapes, seed=1)
    r2 = fill_params(shapes, seed=1)
    flat = {
        "/".join(str(k.key) for k in path): np.asarray(v)
        for path, v in jax.tree_util.tree_flatten_with_path(r1)[0]
    }
    for name, v in flat.items():
        if name.endswith("scale"):
            assert (v == 1.0).all(), name
        elif name.endswith("bias"):
            assert (v == 0.0).all(), name
        else:
            assert v.std() > 0.001, name
    for a, b in zip(jax.tree.leaves(r1), jax.tree.leaves(r2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
