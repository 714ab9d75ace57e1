"""Pose2Image pipeline — Stage-2 process-1 validation: single-frame
generation from (ref image, target pose) (reference
src/pipelines/pipeline_pose2img.py:31-360).

A thin specialization of the video engine: f=1, no audio/motion modules,
single window; one jitted program.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from mmgt_tpu.diffusion.ddim import DDIMScheduler, DDIMState
from mmgt_tpu.models.pose_guider import PoseGuider
from mmgt_tpu.models.unet3d import DenoisingUNet3D
from mmgt_tpu.models.unet_ref import ReferenceUNet2D
from mmgt_tpu.models.vae import AutoencoderKL


@dataclasses.dataclass(eq=False)
class Pose2ImagePipeline:
    vae: AutoencoderKL
    reference_unet: ReferenceUNet2D
    denoising_unet: DenoisingUNet3D  # motion/audio disabled
    pose_guider: PoseGuider
    scheduler: DDIMScheduler = dataclasses.field(
        default_factory=lambda: DDIMScheduler(beta_schedule="scaled_linear")
    )

    def __call__(
        self,
        params: Dict[str, Any],
        rng: jax.Array,
        ref_image: jnp.ndarray,   # (B, H, W, 3) in [-1, 1]
        pose_image: jnp.ndarray,  # (B, H, W, 3) in [0, 1]
        clip_embed: jnp.ndarray,  # (B, 1, 768)
        num_inference_steps: int = 20,
        guidance_scale: float = 3.5,
    ) -> jnp.ndarray:
        state = self.scheduler.init(num_inference_steps)
        return self._generate(
            params, rng, ref_image, pose_image, clip_embed, state,
            guidance_scale,
        )

    @functools.partial(
        jax.jit, static_argnums=(0,), static_argnames=("guidance_scale",)
    )
    def _generate(
        self, params, rng, ref_image, pose_image, clip_embed,
        state: DDIMState, guidance_scale: float,
    ) -> jnp.ndarray:
        dtype = self.denoising_unet.dtype
        b = ref_image.shape[0]

        ref_latent = self.vae.apply(
            params["vae"], ref_image.astype(dtype),
            method=AutoencoderKL.encode_scaled,
        )
        _, banks = self.reference_unet.apply(
            params["reference_unet"], ref_latent, jnp.zeros((b,), jnp.int32),
            clip_embed.astype(dtype),
        )
        banks = [jnp.concatenate([bk, bk], 0) for bk in banks]
        pose_feat = self.pose_guider.apply(
            params["pose_guider"], pose_image[:, None].astype(dtype)
        )
        pose_cfg = jnp.concatenate([pose_feat, pose_feat], 0)
        ctx_cfg = jnp.concatenate(
            [jnp.zeros_like(clip_embed), clip_embed], 0
        ).astype(dtype)

        h8, w8 = ref_latent.shape[1], ref_latent.shape[2]
        rng, nrng = jax.random.split(rng)
        latents = jax.random.normal(nrng, (b, h8, w8, 4), jnp.float32)
        num_steps = state.timesteps.shape[0]

        def step_fn(latents, s):
            lat = jnp.concatenate([latents, latents], 0)[:, None].astype(dtype)
            t = jnp.full((2 * b,), state.timesteps[s], jnp.int32)
            pred = self.denoising_unet.apply(
                params["denoising_unet"], lat, t, ctx_cfg, None, pose_cfg,
                None, banks, n_uncond=b,
            )[:, 0].astype(jnp.float32)
            uncond, cond = pred[:b], pred[b:]
            noise_pred = uncond + guidance_scale * (cond - uncond)
            return self.scheduler.step(state, noise_pred, s, latents), None

        latents, _ = jax.lax.scan(step_fn, latents, jnp.arange(num_steps))
        img = self.vae.apply(
            params["vae"], latents.astype(dtype),
            method=AutoencoderKL.decode_scaled,
        )
        return jnp.clip(img.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
