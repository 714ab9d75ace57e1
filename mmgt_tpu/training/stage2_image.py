"""Stage-2 process-1: single-image pretrain of the spatial nets.

Rebuilds train_stage_1.py (reference :283-615, SURVEY §3.4): the denoising
UNet is built WITHOUT motion/audio modules and sees single frames (f=1);
trainable = denoising UNet + reference UNet (except its last up block,
train_stage_1.py:323-329) + PoseGuider; scaled-linear zero-SNR v-pred
target with min-SNR-gamma(5), uncond_ratio 0.1, noise_offset 0.05
(config/train/stage1.yaml).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

from mmgt_tpu.diffusion.ddim import DDIMScheduler
from mmgt_tpu.diffusion.losses import min_snr_weight
from mmgt_tpu.models.pose_guider import PoseGuider
from mmgt_tpu.models.unet3d import DenoisingUNet3D
from mmgt_tpu.models.unet_ref import ReferenceUNet2D
from mmgt_tpu.models.vae import AutoencoderKL
from mmgt_tpu.training.stage2 import TrainState, merge_params


def partition_params_image(params: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """Trainable: denoising_unet, pose_guider, reference_unet minus the
    final (full-res) up block; frozen: vae (+ anything else)."""
    flat = traverse_util.flatten_dict(params, sep="/")
    train, frozen = {}, {}
    for k, v in flat.items():
        trainable = (
            k.startswith("denoising_unet/")
            or k.startswith("pose_guider/")
            or (
                k.startswith("reference_unet/")
                and "/up_3_" not in k
            )
        )
        (train if trainable else frozen)[k] = v
    un = lambda d: traverse_util.unflatten_dict(d, sep="/")
    return un(train), un(frozen)


@dataclasses.dataclass(eq=False)
class Stage2ImageTrainer:
    vae: AutoencoderKL
    reference_unet: ReferenceUNet2D
    denoising_unet: DenoisingUNet3D  # built with use_motion/audio=False
    pose_guider: PoseGuider
    learning_rate: float = 1e-5
    weight_decay: float = 1e-2
    max_grad_norm: float = 1.0
    snr_gamma: float = 5.0
    noise_offset: float = 0.05
    uncond_ratio: float = 0.1

    @classmethod
    def build(cls, dtype=jnp.bfloat16, **tiny) -> "Stage2ImageTrainer":
        return cls(
            vae=AutoencoderKL(dtype=dtype),
            reference_unet=ReferenceUNet2D(dtype=dtype),
            denoising_unet=DenoisingUNet3D(
                dtype=dtype, use_motion_module=False, use_audio_module=False
            ),
            pose_guider=PoseGuider(dtype=dtype),
        )

    def __post_init__(self):
        # scaled_linear + zero-SNR v-pred (config/train/stage1.yaml:33-41)
        self.scheduler = DDIMScheduler(beta_schedule="scaled_linear")
        self.tx = optax.chain(
            optax.clip_by_global_norm(self.max_grad_norm),
            optax.adamw(
                self.learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                weight_decay=self.weight_decay,
            ),
        )

    # ------------------------------------------------------------------
    def init_params(self, rng, height=256, width=256):
        dtype = self.denoising_unet.dtype
        h8, w8 = height // 8, width // 8
        r = jax.random.split(rng, 4)
        ctx = jnp.zeros((1, 1, 768), dtype)
        return {
            "vae": jax.jit(self.vae.init)(
                r[0], jnp.zeros((1, height, width, 3), dtype)
            ),
            "reference_unet": jax.jit(self.reference_unet.init)(
                r[1], jnp.zeros((1, h8, w8, 4), dtype),
                jnp.zeros((1,), jnp.int32), ctx,
            ),
            "denoising_unet": jax.jit(self.denoising_unet.init)(
                r[2],
                jnp.zeros((1, 1, h8, w8, 4), dtype),
                jnp.zeros((1,), jnp.int32),
                ctx,
                None,
                jnp.zeros(
                    (1, 1, h8, w8, self.denoising_unet.block_out_channels[0]),
                    dtype,
                ),
                None,
                None,  # banks add no params (same attn weights either way)
            ),
            "pose_guider": jax.jit(self.pose_guider.init)(
                r[3], jnp.zeros((1, 1, height, width, 3), dtype)
            ),
        }

    def init_state(self, params) -> TrainState:
        trainable, frozen = partition_params_image(params)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            trainable=trainable,
            frozen=frozen,
            opt_state=self.tx.init(trainable),
        )

    # ------------------------------------------------------------------
    def loss_fn(self, trainable, frozen, batch, rng):
        params = merge_params(trainable, frozen)
        dtype = self.denoising_unet.dtype
        tgt = batch["tgt_image"]      # (B, H, W, 3) in [-1, 1]
        ref = batch["ref_image"]      # (B, H, W, 3)
        pose = batch["tgt_pose"]      # (B, H, W, 3) in [0, 1]
        clip_embed = batch["clip_embed"]  # (B, 1, 768)
        b = tgt.shape[0]
        r_t, r_n, r_off, r_u = jax.random.split(rng, 4)

        enc = lambda x: self.vae.apply(
            params["vae"], x.astype(dtype), method=AutoencoderKL.encode_scaled
        )
        latents = jax.lax.stop_gradient(enc(tgt)).astype(jnp.float32)
        ref_latent = jax.lax.stop_gradient(enc(ref))

        noise = jax.random.normal(r_n, latents.shape, jnp.float32)
        noise = noise + self.noise_offset * jax.random.normal(
            r_off, (b, 1, 1, latents.shape[-1]), jnp.float32
        )
        t = jax.random.randint(r_t, (b,), 0, self.scheduler.num_train_timesteps)
        noisy = self.scheduler.add_noise(latents, noise, t[:, None])
        target = self.scheduler.get_velocity(latents, noise, t[:, None])

        keep = jax.random.uniform(r_u, (b,)) >= self.uncond_ratio
        clip_ctx = clip_embed.astype(dtype) * keep[:, None, None].astype(dtype)

        _, banks = self.reference_unet.apply(
            params["reference_unet"], ref_latent, jnp.zeros((b,), jnp.int32),
            clip_ctx,
        )
        pose_feat = self.pose_guider.apply(
            params["pose_guider"], pose[:, None].astype(dtype)
        )
        pred = self.denoising_unet.apply(
            params["denoising_unet"],
            noisy[:, None].astype(dtype),
            t,
            clip_ctx,
            None,
            pose_feat,
            None,
            banks,
            bank_gate=keep.astype(jnp.int32),
        )[:, 0].astype(jnp.float32)

        per_example = jnp.mean((pred - target) ** 2, axis=(1, 2, 3))
        w = min_snr_weight(self.scheduler.tables, t, self.snr_gamma,
                           "v_prediction")
        loss = jnp.mean(w * per_example)
        return loss, {"loss": loss, "mse": jnp.mean(per_example)}

    def train_step(self, state: TrainState, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
            state.trainable, state.frozen, batch, rng
        )
        updates, opt_state = self.tx.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        return (
            TrainState(state.step + 1, trainable, state.frozen, opt_state),
            metrics,
        )
