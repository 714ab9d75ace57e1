"""Lmks2Video pipeline variant: TWO landmark guiders (e.g. upper/lower
face-landmark streams) whose features sum into the denoiser, mirroring the
reference's alternate conditioning experiment
(src/pipelines/pipeline_lmks2vid_long.py:53-90,400-489: dual PoseGuiders;
the optional IP-Adapter text+image branch reduces to the CLIP context
tokens our pipeline already consumes).

Implementation: a thin wrapper around the jitted Pose2VideoPipeline — the
two guider features are combined in `_prepare`-equivalent fashion and the
denoising/decoding path is shared unchanged.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from mmgt_tpu.models.pose_guider import PoseGuider
from mmgt_tpu.pipelines.pose2vid import Pose2VideoPipeline


@dataclasses.dataclass(eq=False)
class Lmks2VideoPipeline:
    base: Pose2VideoPipeline
    guider_a: PoseGuider  # e.g. upper landmarks
    guider_b: PoseGuider  # e.g. lower landmarks

    @classmethod
    def build(cls, dtype=jnp.bfloat16, **kwargs) -> "Lmks2VideoPipeline":
        return cls(
            base=Pose2VideoPipeline.build(dtype=dtype, **kwargs),
            guider_a=PoseGuider(dtype=dtype),
            guider_b=PoseGuider(dtype=dtype),
        )

    def init_params(self, rng: jax.Array, height=512, width=512) -> Dict[str, Any]:
        params = self.base.init_params(rng, height, width)
        f = self.base.context_size
        r1, r2 = jax.random.split(rng)
        dt = self.base.denoising_unet.dtype
        dummy = jnp.zeros((1, f, height, width, 3), dt)
        params["guider_a"] = jax.jit(self.guider_a.init)(r1, dummy)
        params["guider_b"] = jax.jit(self.guider_b.init)(r2, dummy)
        return params

    def __call__(
        self,
        params: Dict[str, Any],
        rng: jax.Array,
        ref_image: jnp.ndarray,
        lmks_a_video: jnp.ndarray,   # (1, F, H, W, 3)
        lmks_b_video: jnp.ndarray,   # (1, F, H, W, 3)
        clip_embed: jnp.ndarray,
        masks: Sequence[Tuple[jnp.ndarray, ...]],
        audio_embeds: Optional[jnp.ndarray] = None,
        **kwargs,
    ) -> jnp.ndarray:
        dt = self.base.denoising_unet.dtype
        fa = jax.jit(self.guider_a.apply)(params["guider_a"], lmks_a_video.astype(dt))
        fb = jax.jit(self.guider_b.apply)(params["guider_b"], lmks_b_video.astype(dt))
        summed = fa + fb

        # Route the summed guider features through the base pipeline by
        # substituting its pose_guider with an identity-on-precomputed
        # features: encode via a passthrough pseudo-video. The base
        # pipeline's pose_guider consumes raw (1,F,H,W,3) video, so we
        # instead call the shared jitted stages directly.
        from mmgt_tpu.diffusion.solver import solver_tables_for

        steps = kwargs.get("num_inference_steps", 30)
        state = solver_tables_for(self.base.scheduler, steps)
        if state is None:
            state = self.base.scheduler.init(steps)
        from mmgt_tpu.pipelines.context import compute_context_schedule

        f = lmks_a_video.shape[1]
        windows = jnp.asarray(
            compute_context_schedule(
                state.timesteps.shape[0], f,
                self.base.context_size, 1, self.base.context_overlap,
            )
        )
        masks = tuple(tuple(lv) for lv in masks)
        # pose_feat=summed: the base PoseGuider forward is skipped, the
        # dual-guider features flow straight into the shared conditioning
        cond, latents = self.base._prepare(
            params, rng, ref_image, lmks_a_video, clip_embed, masks, audio_embeds,
            pose_feat=summed,
        )
        k = self.base.steps_per_launch or state.timesteps.shape[0]
        from mmgt_tpu.pipelines.pose2vid import _largest_divisor_at_most

        k = _largest_divisor_at_most(state.timesteps.shape[0], k)
        from mmgt_tpu.diffusion.solver import SolverTables, init_solver_carry

        aux = (
            init_solver_carry(latents)
            if isinstance(state, SolverTables)
            else self.base.scheduler.init_carry(latents)
        )
        for o in range(0, state.timesteps.shape[0], k):
            chunk = type(state)(*[x[o : o + k] for x in state])
            latents, aux = self.base._denoise_chunk(
                params,
                latents,
                aux,
                cond,
                chunk,
                windows[o : o + k],
                kwargs.get("guidance_scale", 3.5),
                tuple(kwargs.get("motion_scale", (1.0, 1.0, 1.0))),
                prediction_type=self.base.scheduler.prediction_type,
            )
        return self.base._decode(params, latents)
