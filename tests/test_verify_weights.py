"""Weights-ingest verifier: scripts/verify_weights.py + the Net-wrapper
checkpoint split (reference scripts/audio2vid.py:39-61, 266-272).

Real checkpoints don't exist in this image; synthetic torch state dicts
built by the inverse layout mapping stand in, proving the CLI will
certify (or reject) real weights the day they are mounted.
"""
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from mmgt_tpu.models.pose_guider import PoseGuider
from mmgt_tpu.utils import convert as cv

REPO = Path(__file__).resolve().parents[1]


def _torch_sd_for(tree, mapper, prefix=""):
    """Inverse-layout torch state dict covering `tree` exactly."""
    sys.path.insert(0, str(REPO / "tests"))
    from test_convert import _inverse_tensor

    flat = traverse_util.flatten_dict(tree, sep="/")
    sd = {}
    for k, leaf in flat.items():
        key = k.replace("params/", "", 1)
        _, tv = _inverse_tensor(k, leaf.shape)
        sd[prefix + mapper(key)] = tv
    return sd


def test_split_net_checkpoint():
    sd = {
        "reference_unet.conv_in.weight": np.zeros((4, 4, 3, 3)),
        "denoising_unet.conv_in.weight": np.ones((4, 4, 3, 3)),
        "pose_guider.conv_in.weight": np.zeros((2, 3, 3, 3)),
        "audioproj.proj1.weight": np.zeros((8, 4)),
        "unprefixed.thing": np.zeros(3),
    }
    parts = cv.split_net_checkpoint(sd)
    assert set(parts) == {
        "reference_unet", "denoising_unet", "pose_guider", "audioproj"
    }
    assert list(parts["denoising_unet"]) == ["conv_in.weight"]
    assert parts["denoising_unet"]["conv_in.weight"].sum() == 4 * 4 * 3 * 3
    assert list(parts["audioproj"]) == ["proj1.weight"]


def test_load_all_weights_reads_net_wrapper_ckpt(tmp_path):
    """pose_guider weights delivered ONLY inside a net-*.pth land in the
    pipeline params (the audio2vid.py Net-checkpoint path)."""
    torch = pytest.importorskip("torch")

    from mmgt_tpu.utils.weights import load_all_weights
    from mmgt_tpu.pipelines.pose2vid import Pose2VideoPipeline
    from mmgt_tpu.models.unet3d import DenoisingUNet3D
    from mmgt_tpu.models.unet_ref import ReferenceUNet2D
    from mmgt_tpu.models.vae import AutoencoderKL
    from mmgt_tpu.models.audio_proj import AudioProjModel
    from mmgt_tpu.training.stage1 import SMGA

    tiny = dict(block_out_channels=(16, 32, 32, 32), heads=4)
    pipe = Pose2VideoPipeline(
        vae=AutoencoderKL(block_out_channels=(16, 16, 32, 32)),
        reference_unet=ReferenceUNet2D(**tiny),
        denoising_unet=DenoisingUNet3D(**tiny),
        pose_guider=PoseGuider(
            embedding_channels=16, block_out_channels=(4, 8, 8, 16)
        ),
        audio_proj=AudioProjModel(intermediate_dim=32),
        context_size=4,
    )
    shapes = jax.eval_shape(
        lambda: pipe.init_params(jax.random.PRNGKey(0), 64, 64)
    )
    sd = {}
    sd.update(_torch_sd_for(shapes["pose_guider"], cv.map_pose_guider,
                            "pose_guider."))
    sd.update(_torch_sd_for(shapes["audio_proj"], cv.map_audio_proj,
                            "audioproj."))
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, tmp_path / "net-30000.pth")

    loaded = load_all_weights(str(tmp_path), pipe, SMGA())
    got = traverse_util.flatten_dict(
        loaded["pose2vid"]["pose_guider"], sep="/"
    )
    from test_convert import _inverse_tensor

    k = next(k for k in got if k.endswith("conv_in/kernel"))
    fv, _ = _inverse_tensor(k, got[k].shape)
    np.testing.assert_allclose(
        np.asarray(got[k], np.float32), fv, atol=1e-2
    )


@pytest.mark.slow
def test_verify_weights_cli(tmp_path):
    """The CLI certifies a dir holding a synthetic full-size pose_guider
    .pth (ok), reports everything else absent, and exits 0; a corrupted
    ckpt flips it to failed + exit 1."""
    torch = pytest.importorskip("torch")

    from mmgt_tpu.models.pose_guider import PoseGuider as PG

    m = PG()  # full size: embedding 320, blocks (16, 32, 96, 256)
    tree = jax.eval_shape(
        lambda: m.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 64, 64, 3)))
    )
    sd = _torch_sd_for(tree, cv.map_pose_guider)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, tmp_path / "pose_guider-3.pth")

    def run():
        return subprocess.run(
            [sys.executable, str(REPO / "scripts/verify_weights.py"),
             str(tmp_path), "--cpu", "--json", str(tmp_path / "r.json")],
            capture_output=True, text=True, timeout=600,
        )

    r = run()
    assert "[ok     ] pose_guider" in r.stdout, r.stdout + r.stderr
    assert r.returncode == 0, r.stdout + r.stderr

    # shape-corrupted checkpoint must fail loudly
    bad = dict(sd)
    key = next(iter(bad))
    bad[key] = np.zeros((3, 3), np.float32)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in bad.items()}, tmp_path / "pose_guider-4.pth")
    r = run()
    assert r.returncode == 1
    assert "[FAILED ] pose_guider" in r.stdout
