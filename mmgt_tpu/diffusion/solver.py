"""Scheduler-agnostic denoising step: one compiled program for every
sampler (VERDICT r4 next #4).

DDIM with eta=0 IS the first-order case of DPM-Solver++(2M): writing the
DDIM update x_prev = sqrt(a_prev) x0 + sqrt(1-a_prev) eps in (x, x0) form
gives x_prev = (s_p/s_t) x + (a_p - s_p a_t/s_t) x0, and
a_p (1 - e^{-h}) == a_p - s_p a_t / s_t exactly (h = lambda_prev-lambda_t).
So both samplers share ONE data-driven step

    x0   = predict(x, model_output)                    # static pred type
    d    = x0 + (use2 * cm) * (x0 - carry)             # 2nd-order correction
    prev = c_xt * x + c_x0 * d ;  carry' = x0

parameterized entirely by per-step gather TABLES (DDIM: use2 == 0). The
pipeline's compiled denoise chunk takes the tables as data, so
DDIM-25 / DDIM-15 / DPM-15 with equal chunk lengths reuse one XLA program
— r4's `audio2vid_dpm15_compile_s` was 184.7 s of pure re-trace.

The reference has no analogue (eager torch swaps diffusers scheduler
objects per call, src/pipelines/pipeline_pose2vid_long.py:554-636).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np


class SolverTables(NamedTuple):
    """Per-inference-step gather tables, each (S,); sliceable per chunk."""

    timesteps: jnp.ndarray  # int32 descending train timesteps
    alpha_t: jnp.ndarray    # sqrt(alpha_prod[t])
    sigma_t: jnp.ndarray    # sqrt(1 - alpha_prod[t])
    c_xt: jnp.ndarray       # sigma_prev / sigma_t
    c_x0: jnp.ndarray       # alpha_prev * (1 - exp(-h))
    cm: jnp.ndarray         # h / (2 h_prev) second-order coefficient
    use2: jnp.ndarray       # float 0/1 gate on the multistep correction


def ddim_tables(timesteps, alpha_prod, alpha_prod_prev) -> SolverTables:
    """Exact DDIM(eta=0) as SolverTables (f64 host math).

    c_x0 is computed directly as a_p - s_p a_t / s_t — algebraically equal
    to the DPM form a_p (1 - exp(-h)) and finite at both zero-SNR
    boundaries without going through infinite lambdas."""
    ap = np.asarray(alpha_prod, np.float64)
    app = np.asarray(alpha_prod_prev, np.float64)
    a_t, s_t = np.sqrt(ap), np.sqrt(1.0 - ap)
    a_p, s_p = np.sqrt(app), np.sqrt(1.0 - app)
    c_xt = s_p / s_t
    c_x0 = a_p - s_p * a_t / s_t
    S = len(ap)
    return SolverTables(
        timesteps=jnp.asarray(timesteps, jnp.int32),
        alpha_t=jnp.asarray(a_t, jnp.float32),
        sigma_t=jnp.asarray(s_t, jnp.float32),
        c_xt=jnp.asarray(c_xt, jnp.float32),
        c_x0=jnp.asarray(c_x0, jnp.float32),
        cm=jnp.zeros((S,), jnp.float32),
        use2=jnp.zeros((S,), jnp.float32),
    )


def solver_tables_for(scheduler, num_inference_steps: int) -> Optional[SolverTables]:
    """SolverTables for any supported scheduler config, else None (caller
    falls back to the scheduler's own step_carry path)."""
    from mmgt_tpu.diffusion.ddim import DDIMScheduler
    from mmgt_tpu.diffusion.dpm import DPMSolverPlusPlus2M

    if isinstance(scheduler, DPMSolverPlusPlus2M):
        s = scheduler.init(num_inference_steps)
        return SolverTables(
            timesteps=s.timesteps, alpha_t=s.alpha_t, sigma_t=s.sigma_t,
            c_xt=s.c_xt, c_x0=s.c_x0, cm=s.cm, use2=s.use2,
        )
    if isinstance(scheduler, DDIMScheduler):
        if scheduler.eta != 0.0 or scheduler.clip_sample:
            return None  # stochastic/clipped DDIM keeps the legacy path
        s = scheduler.init(num_inference_steps)
        return ddim_tables(
            np.asarray(s.timesteps),
            np.asarray(s.alpha_prod, np.float64),
            np.asarray(s.alpha_prod_prev, np.float64),
        )
    return None


def predict_x0(tables: SolverTables, model_output, step_index, sample,
               prediction_type: str):
    x = sample.astype(jnp.float32)
    out = model_output.astype(jnp.float32)
    a_t = tables.alpha_t[step_index]
    s_t = tables.sigma_t[step_index]
    if prediction_type == "epsilon":
        return (x - s_t * out) / a_t
    if prediction_type == "sample":
        return out
    if prediction_type == "v_prediction":
        return a_t * x - s_t * out
    raise ValueError(prediction_type)


def solver_step(
    tables: SolverTables,
    model_output: jnp.ndarray,
    step_index: jnp.ndarray,
    sample: jnp.ndarray,
    carry: jnp.ndarray,
    prediction_type: str = "v_prediction",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One generic reverse step; returns (prev_sample, new_carry=x0)."""
    dtype = sample.dtype
    x = sample.astype(jnp.float32)
    x0 = predict_x0(tables, model_output, step_index, sample, prediction_type)
    d = x0 + (tables.use2[step_index] * tables.cm[step_index]) * (x0 - carry)
    prev = tables.c_xt[step_index] * x + tables.c_x0[step_index] * d
    return prev.astype(dtype), x0


def init_solver_carry(latents: jnp.ndarray) -> jnp.ndarray:
    """Multistep history (previous x0; zeros are never read: use2[0]=0)."""
    return jnp.zeros(latents.shape, jnp.float32)
