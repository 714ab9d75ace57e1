"""DDIM sampler — pure-jnp, table-driven, scan-friendly.

Matches the semantics of the diffusers DDIMScheduler configuration the MMGT
reference uses for Stage 2 (config/prompts/animation.yaml:80-90):
v-prediction, zero-terminal-SNR rescaled betas, "trailing" spacing,
clip_sample=False, eta=0 — while also supporting epsilon / sample prediction,
leading/linspace spacing and eta>0 (Stage-1 SMGA uses eta=1, see
`mmgt_tpu.diffusion.gesture`).

Everything is precomputed into per-inference-step gather tables so `step`
can be called inside `lax.scan` with a traced step index and static shapes.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mmgt_tpu.diffusion.schedules import (
    ScheduleTables,
    ddim_timesteps,
    make_beta_schedule,
    rescale_zero_terminal_snr,
)


class DDIMState(NamedTuple):
    """Per-run sampler tables (pytree; safe to close over or pass into jit)."""

    timesteps: jnp.ndarray       # (S,) int32, descending
    alpha_prod: jnp.ndarray      # (S,) alpha_cumprod[t]
    alpha_prod_prev: jnp.ndarray  # (S,) alpha_cumprod[t_prev] (1.0 past the end)
    sigma: jnp.ndarray           # (S,) DDIM sigma_t (0 when eta=0)


@dataclasses.dataclass(frozen=True)
class DDIMScheduler:
    """Stateless DDIM sampler; `init(num_steps)` builds the gather tables."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "linear"
    prediction_type: str = "v_prediction"  # "epsilon" | "sample" | "v_prediction"
    rescale_betas_zero_snr: bool = True
    timestep_spacing: str = "trailing"
    steps_offset: int = 1
    clip_sample: bool = False
    clip_sample_range: float = 1.0
    set_alpha_to_one: bool = True
    eta: float = 0.0

    def __post_init__(self):
        betas = make_beta_schedule(
            self.beta_schedule,
            self.num_train_timesteps,
            self.beta_start,
            self.beta_end,
        )
        if self.rescale_betas_zero_snr:
            betas = rescale_zero_terminal_snr(betas)
        object.__setattr__(self, "tables", ScheduleTables(betas))

    # ------------------------------------------------------------------ setup
    def init(self, num_inference_steps: int) -> DDIMState:
        ts = ddim_timesteps(
            self.num_train_timesteps,
            num_inference_steps,
            self.timestep_spacing,
            self.steps_offset,
        )
        ac = np.asarray(self.tables.alphas_cumprod)
        step = self.num_train_timesteps // num_inference_steps
        prev_ts = ts - step
        final_alpha = 1.0 if self.set_alpha_to_one else float(ac[0])
        alpha_prod = ac[ts]
        alpha_prod_prev = np.where(prev_ts >= 0, ac[np.maximum(prev_ts, 0)], final_alpha)
        if self.eta > 0:
            var = (1 - alpha_prod_prev) / (1 - alpha_prod) * (
                1 - alpha_prod / alpha_prod_prev
            )
            sigma = self.eta * np.sqrt(np.maximum(var, 0.0))
        else:
            sigma = np.zeros_like(alpha_prod)
        return DDIMState(
            timesteps=jnp.asarray(ts, jnp.int32),
            alpha_prod=jnp.asarray(alpha_prod, jnp.float32),
            alpha_prod_prev=jnp.asarray(alpha_prod_prev, jnp.float32),
            sigma=jnp.asarray(sigma, jnp.float32),
        )

    # ------------------------------------------------------------------- step
    def step(
        self,
        state: DDIMState,
        model_output: jnp.ndarray,
        step_index: jnp.ndarray,
        sample: jnp.ndarray,
        noise: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """One reverse-process step; all math in float32.

        `step_index` indexes into the inference-step tables (0 = most noisy),
        NOT the raw train timestep — this keeps gathers O(1) inside scan.
        """
        dtype = sample.dtype
        x = sample.astype(jnp.float32)
        out = model_output.astype(jnp.float32)

        a_t = state.alpha_prod[step_index]
        a_prev = state.alpha_prod_prev[step_index]
        sigma = state.sigma[step_index]
        sqrt_a_t = jnp.sqrt(a_t)
        sqrt_1m_a_t = jnp.sqrt(1.0 - a_t)

        if self.prediction_type == "epsilon":
            x0 = (x - sqrt_1m_a_t * out) / sqrt_a_t
            eps = out
        elif self.prediction_type == "sample":
            x0 = out
            eps = (x - sqrt_a_t * x0) / sqrt_1m_a_t
        elif self.prediction_type == "v_prediction":
            x0 = sqrt_a_t * x - sqrt_1m_a_t * out
            eps = sqrt_a_t * out + sqrt_1m_a_t * x
        else:
            raise ValueError(self.prediction_type)

        if self.clip_sample:
            x0 = jnp.clip(x0, -self.clip_sample_range, self.clip_sample_range)
            eps = (x - jnp.sqrt(a_t) * x0) / sqrt_1m_a_t

        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma**2, 0.0)) * eps
        prev = jnp.sqrt(a_prev) * x0 + dir_xt
        if noise is not None:
            prev = prev + sigma * noise.astype(jnp.float32)
        return prev.astype(dtype)

    # ------------------------------------------------------------------ carry
    # Uniform sampler interface shared with the multistep solvers
    # (diffusion/dpm.py): DDIM is single-step, so the carry is empty.
    def init_carry(self, latents: jnp.ndarray):
        return ()

    def step_carry(self, state, model_output, step_index, sample, carry):
        return self.step(state, model_output, step_index, sample), ()

    # -------------------------------------------------------------- training
    def add_noise(self, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray):
        sa = self.tables.sqrt_alphas_cumprod[t].reshape(
            t.shape + (1,) * (x0.ndim - t.ndim)
        )
        s1a = self.tables.sqrt_one_minus_alphas_cumprod[t].reshape(
            t.shape + (1,) * (x0.ndim - t.ndim)
        )
        return sa * x0 + s1a * noise

    def get_velocity(self, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray):
        sa = self.tables.sqrt_alphas_cumprod[t].reshape(
            t.shape + (1,) * (x0.ndim - t.ndim)
        )
        s1a = self.tables.sqrt_one_minus_alphas_cumprod[t].reshape(
            t.shape + (1,) * (x0.ndim - t.ndim)
        )
        return sa * noise - s1a * x0

    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    def scale_model_input(self, sample: jnp.ndarray, t=None) -> jnp.ndarray:
        return sample
