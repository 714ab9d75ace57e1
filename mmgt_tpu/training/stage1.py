"""Stage-1 (SMGA) training/inference driver: audio -> pose diffusion.

TPU-native replacement of the reference SMGA/LMDM driver
(SMGA.py:44-341, src/audio2pose_model/SMGA.py:48): GestureDecoder + cosine
DDPM (predict-x0) + Adan + EMA(0.9999), with the whole train step as one
jitted function over a dp-sharded batch, and DDIM(50, eta=1) sampling as a
single scanned program via `GestureDiffusionSchedule`.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from mmgt_tpu.diffusion.gesture import GestureDiffusionSchedule
from mmgt_tpu.models.smga import NFEATS, GestureDecoder
from mmgt_tpu.training.adan import adan

HORIZON = 80  # 3.2 s x 25 fps (SMGA.py:64-66)


def transform_if_no_negative(x: jnp.ndarray) -> jnp.ndarray:
    """[0,1] -> [-1,1] only when the tensor has no negatives
    (SMGA.py:30-42); traced-value-safe via where."""
    has_neg = jnp.any(x < 0)
    return jnp.where(has_neg, x, x * 2.0 - 1.0)


class SMGATrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    ema_params: Any
    opt_state: Any


@dataclasses.dataclass(eq=False)
class SMGA:
    """Stage-1 system bundle."""

    feature_type: str = "wavlm"          # "wavlm" (1024+35) or "baseline" (35)
    learning_rate: float = 2e-4
    weight_decay: float = 0.02
    ema_decay: float = 0.9999
    guidance_weight: float = 2.0
    cond_drop_prob: float = 0.25
    horizon: int = HORIZON
    dtype: jnp.dtype = jnp.float32

    def __post_init__(self):
        self.cond_dim = 1024 + 35 if self.feature_type == "wavlm" else 35
        self.model = GestureDecoder(
            nfeats=NFEATS,
            seq_len=self.horizon,
            latent_dim=512,
            ff_size=1024,
            num_layers=8,
            num_heads=8,
            cond_feature_dim=self.cond_dim,
            dtype=self.dtype,
        )
        self.schedule = GestureDiffusionSchedule(
            n_timestep=1000,
            schedule="cosine",
            predict_epsilon=False,
            clip_denoised=True,
            guidance_weight=self.guidance_weight,
        )
        self.tx = adan(
            self.learning_rate, weight_decay=self.weight_decay
        )

    # ------------------------------------------------------------------
    def init_state(self, rng: jax.Array, batch_size: int = 2) -> SMGATrainState:
        x = jnp.zeros((batch_size, self.horizon, NFEATS))
        cf = jnp.zeros((batch_size, NFEATS))
        cond = jnp.zeros((batch_size, self.horizon, self.cond_dim))
        t = jnp.zeros((batch_size,), jnp.int32)
        params = self.model.init(rng, x, cf, cond, t)
        return SMGATrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            ema_params=params,
            opt_state=self.tx.init(params),
        )

    # ------------------------------------------------------------------
    def loss_fn(self, params, batch: Dict[str, jnp.ndarray], rng):
        x0 = transform_if_no_negative(batch["keypoints"])      # (B, T, 402)
        cond_frame = batch["cond_frame"]                        # (B, 402)
        cond = batch["audio_features"]                          # (B, T, Dc)

        def model_fn(x_noisy, cf, c, t, keep_mask):
            return self.model.apply(params, x_noisy, cf, c, t, keep_mask)

        total, comps = self.schedule.training_loss(
            model_fn, rng, x0, cond_frame, cond, self.cond_drop_prob
        )
        return total, comps

    def train_step(self, state: SMGATrainState, batch, rng):
        (loss, comps), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        d = self.ema_decay
        ema = jax.tree.map(
            lambda e, p: e * d + p * (1.0 - d), state.ema_params, params
        )
        new_state = SMGATrainState(state.step + 1, params, ema, opt_state)
        metrics = {"loss": loss, **comps}
        return new_state, metrics

    # ------------------------------------------------------------------
    def sample(
        self,
        params,
        rng: jax.Array,
        cond_frame: jnp.ndarray,   # (B, 402)
        cond: jnp.ndarray,         # (B, T, Dc)
        sampling_timesteps: int = 50,
    ) -> jnp.ndarray:
        """DDIM(eta=1) sampling with CFG and timestep-clipped guidance
        (reference render_sample -> ddim_sample path)."""
        b, T = cond.shape[0], cond.shape[1]

        def denoise_fn(x, t, w):
            return self.model.apply(
                params,
                x,
                cond_frame,
                cond,
                t,
                w,
                method=GestureDecoder.guided_forward,
            )

        return self.schedule.ddim_sample(
            denoise_fn, rng, (b, T, NFEATS), sampling_timesteps
        )
