"""Diffusion noise schedules — pure numpy/jnp, table-driven.

Covers every schedule the MMGT reference relies on:
  * Stage 2 (video UNet): linear / scaled-linear betas with zero-terminal-SNR
    rescale + "trailing" timestep spacing + v-prediction
    (reference: config/prompts/animation.yaml:80-90).
  * Stage 1 (SMGA): cosine schedule, T=1000, predict-x0
    (reference: src/audio2pose_model/utils.py:61-99, SMGA.py:95-106).

All tables are computed once in float64 on host and stored as float32
jnp arrays; samplers index them with integer timesteps (no recomputation
inside jit).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    beta_start: float = 1e-4,
    beta_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Return betas[T] (float64 numpy).

    Naming follows the diffusers convention:
      - "linear":        linspace(beta_start, beta_end)
      - "scaled_linear": linspace(sqrt(beta_start), sqrt(beta_end))**2
        (this is what the reference's Stage-1 `make_beta_schedule("linear")`
        computes, src/audio2pose_model/utils.py:69-76)
      - "cosine":        Nichol & Dhariwal cosine alphas-cumprod schedule
    """
    if schedule == "linear":
        betas = np.linspace(beta_start, beta_end, n_timestep, dtype=np.float64)
    elif schedule == "scaled_linear":
        betas = (
            np.linspace(beta_start**0.5, beta_end**0.5, n_timestep, dtype=np.float64)
            ** 2
        )
    elif schedule == "cosine":
        steps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(steps / (1 + cosine_s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1.0 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0.0, 0.999)
    else:
        raise ValueError(f"unknown beta schedule: {schedule!r}")
    return betas


def alphas_cumprod_from_betas(betas: np.ndarray) -> np.ndarray:
    return np.cumprod(1.0 - betas, axis=0)


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Rescale betas so the terminal SNR is exactly zero.

    Implements Lin et al., "Common Diffusion Noise Schedules and Sample Steps
    are Flawed" (the `rescale_betas_zero_snr` option the reference enables at
    config/prompts/animation.yaml:89). Operates on sqrt(alphas_cumprod):
    shift so the last value is 0, scale so the first is preserved.
    """
    alphas_cumprod = alphas_cumprod_from_betas(betas)
    sqrt_ac = np.sqrt(alphas_cumprod)

    sqrt_ac_0 = sqrt_ac[0]
    sqrt_ac_T = sqrt_ac[-1]
    sqrt_ac = sqrt_ac - sqrt_ac_T
    sqrt_ac = sqrt_ac * sqrt_ac_0 / (sqrt_ac_0 - sqrt_ac_T)

    alphas_cumprod = sqrt_ac**2
    alphas = alphas_cumprod[1:] / alphas_cumprod[:-1]
    alphas = np.concatenate([alphas_cumprod[:1], alphas])
    return 1.0 - alphas


def ddim_timesteps(
    num_train_timesteps: int,
    num_inference_steps: int,
    spacing: str = "trailing",
    steps_offset: int = 0,
) -> np.ndarray:
    """Integer timesteps (descending) for DDIM sampling.

    "trailing" (used by the zero-SNR config) guarantees the first sampled
    timestep is T-1 so sampling starts from pure noise; "leading" is the
    classic DDIM spacing; "linspace" rounds a linspace.
    """
    T, S = num_train_timesteps, num_inference_steps
    if spacing == "trailing":
        ts = np.round(np.arange(T, 0, -T / S)).astype(np.int64) - 1
    elif spacing == "leading":
        step = T // S
        ts = (np.arange(S) * step).round().astype(np.int64)[::-1] + steps_offset
    elif spacing == "linspace":
        ts = np.linspace(0, T - 1, S).round().astype(np.int64)[::-1]
    else:
        raise ValueError(f"unknown timestep spacing: {spacing!r}")
    return ts.astype(np.int32)


class ScheduleTables:
    """Precomputed per-timestep tables shared by the samplers/trainers."""

    def __init__(self, betas: np.ndarray):
        betas = betas.astype(np.float64)
        alphas = 1.0 - betas
        ac = np.cumprod(alphas)
        ac_prev = np.concatenate([[1.0], ac[:-1]])
        self.num_train_timesteps = len(betas)
        self.betas = jnp.asarray(betas, jnp.float32)
        self.alphas = jnp.asarray(alphas, jnp.float32)
        self.alphas_cumprod = jnp.asarray(ac, jnp.float32)
        self.alphas_cumprod_prev = jnp.asarray(ac_prev, jnp.float32)
        self.sqrt_alphas_cumprod = jnp.asarray(np.sqrt(ac), jnp.float32)
        self.sqrt_one_minus_alphas_cumprod = jnp.asarray(np.sqrt(1 - ac), jnp.float32)
        # guard: zero-terminal-SNR schedules have ac[-1] == 0
        with np.errstate(divide="ignore"):
            self.sqrt_recip_alphas_cumprod = jnp.asarray(np.sqrt(1.0 / ac), jnp.float32)
            self.sqrt_recipm1_alphas_cumprod = jnp.asarray(
                np.sqrt(1.0 / ac - 1.0), jnp.float32
            )
        post_var = betas * (1.0 - ac_prev) / (1.0 - ac)
        self.posterior_variance = jnp.asarray(post_var, jnp.float32)
        self.posterior_log_variance_clipped = jnp.asarray(
            np.log(np.clip(post_var, 1e-20, None)), jnp.float32
        )
        self.posterior_mean_coef1 = jnp.asarray(
            betas * np.sqrt(ac_prev) / (1.0 - ac), jnp.float32
        )
        self.posterior_mean_coef2 = jnp.asarray(
            (1.0 - ac_prev) * np.sqrt(alphas) / (1.0 - ac), jnp.float32
        )
        snr = ac / (1.0 - ac)
        self.snr = jnp.asarray(snr, jnp.float32)
