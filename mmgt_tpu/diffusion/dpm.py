"""DPM-Solver++(2M) — pure-jnp, table-driven, scan-friendly few-step sampler.

A second-order multistep solver for the probability-flow ODE in the
data-prediction (x0) formulation (Lu et al., "DPM-Solver++", 2022). The
reference samples Stage 2 with plain DDIM at 25-30 steps
(reference src/pipelines/pipeline_pose2vid_long.py:633-635,
config/prompts/animation.yaml:28-29,78-89); this solver reaches DDIM-25's
trajectory accuracy in ~half the steps — measured on the real full-width
architecture vs a 200-step DDIM reference (tools/fewstep_quality.py,
PERF_FEWSTEP.json): rel latent err DPM-15 0.039 / DPM-12 0.055 vs DDIM-25
0.057 — the main lever on the <10 s serving target.

Design mirrors `mmgt_tpu.diffusion.ddim`: every per-step coefficient is
precomputed on host into (S,) gather tables so `step` runs inside `lax.scan`
with a traced step index, static shapes, and O(1) gathers. The multistep
history (previous step's x0 prediction) is an explicit carry so the
pipeline's chunked-launch loop can thread it across device programs.

Zero-terminal-SNR + "trailing" spacing (the reference's Stage-2 config) make
two lambda values infinite (lambda = log(alpha/sigma) is -inf at the first
sampled timestep where alpha==0, and +inf at the final boundary where
sigma_prev==0). All coefficients remain finite in the limit and are computed
inf-safely in float64 on host:

  c_xt   = sigma_prev / sigma_t          (0 at the final zero-SNR boundary)
  c_x0   = alpha_prev * (1 - exp(-h))    (alpha_prev when h == +inf)
  cm     = h / (2 h_prev)                (0 when h_prev == +inf -> the step
                                          after the pure-noise step degrades
                                          to first order automatically)
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from mmgt_tpu.diffusion.schedules import (
    ScheduleTables,
    ddim_timesteps,
    make_beta_schedule,
    rescale_zero_terminal_snr,
)


class DPMState(NamedTuple):
    """Per-run gather tables (each (S,); sliceable per launch chunk)."""

    timesteps: jnp.ndarray  # int32, descending train timesteps
    alpha_t: jnp.ndarray    # sqrt(alpha_prod[t])
    sigma_t: jnp.ndarray    # sqrt(1 - alpha_prod[t])
    c_xt: jnp.ndarray       # sigma_prev / sigma_t
    c_x0: jnp.ndarray       # alpha_prev * (1 - exp(-h))
    cm: jnp.ndarray         # second-order correction 1/(2 r) = h/(2 h_prev)
    use2: jnp.ndarray       # float 0/1 — apply the multistep correction


@dataclasses.dataclass(frozen=True)
class DPMSolverPlusPlus2M:
    """Stateless DPM-Solver++(2M); drop-in for DDIMScheduler in the
    Pose2Video pipeline via the carry-threaded `init_carry`/`step_carry`
    interface (deterministic; the ODE solver has no eta)."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "linear"
    prediction_type: str = "v_prediction"  # "epsilon" | "sample" | "v_prediction"
    rescale_betas_zero_snr: bool = True
    timestep_spacing: str = "trailing"
    steps_offset: int = 1
    lower_order_final: bool = True  # first-order closing step (diffusers default)

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
    def init(self, num_inference_steps: int) -> DPMState:
        S = num_inference_steps
        ts = ddim_timesteps(
            self.num_train_timesteps, S, self.timestep_spacing, self.steps_offset
        )
        ac = np.asarray(self.tables.alphas_cumprod, np.float64)
        ap = ac[ts]
        # prev of step i is the NEXT table entry (the timestep the model is
        # actually evaluated at next) — NOT DDIM's uniform `t - T//S`, which
        # drifts off the trailing grid when S doesn't divide T and wrecks a
        # multistep solver's lambda gaps; the closing step integrates to the
        # exact alpha=1/sigma=0 boundary (diffusers final_sigmas_type="zero").
        ap_prev = np.concatenate([ap[1:], [1.0]])

        a_t, s_t = np.sqrt(ap), np.sqrt(1.0 - ap)
        a_p, s_p = np.sqrt(ap_prev), np.sqrt(1.0 - ap_prev)
        with np.errstate(divide="ignore"):
            lam_t = np.log(a_t) - np.log(s_t)     # -inf where alpha == 0
            lam_p = np.log(a_p) - np.log(s_p)     # +inf where sigma_prev == 0
        h = lam_p - lam_t                          # > 0, possibly +inf
        c_xt = s_p / s_t                           # finite: s_t > 0 everywhere
        c_x0 = a_p * (1.0 - np.exp(-h))            # exp(-inf) == 0 -> a_p
        h_prev = np.concatenate([[np.inf], h[:-1]])
        # the multistep correction needs BOTH lambda gaps finite: h_prev is
        # +inf after the pure-noise first step (correction -> 0 is exact),
        # and h is +inf at the final sigma_prev==0 boundary, where the
        # update already collapses to the exact x_0 = x0-hat (c_xt=0,
        # c_x0=alpha_prev) and any correction coefficient would be inf.
        ok = np.isfinite(h_prev) & np.isfinite(h)
        with np.errstate(invalid="ignore"):
            cm = np.where(ok, h / (2.0 * np.where(ok, h_prev, 1.0)), 0.0)
        use2 = ok.astype(np.float64)
        use2[0] = 0.0
        if self.lower_order_final and S > 1:
            use2[-1] = 0.0
        return DPMState(
            timesteps=jnp.asarray(ts, jnp.int32),
            alpha_t=jnp.asarray(a_t, jnp.float32),
            sigma_t=jnp.asarray(s_t, jnp.float32),
            c_xt=jnp.asarray(c_xt, jnp.float32),
            c_x0=jnp.asarray(c_x0, jnp.float32),
            cm=jnp.asarray(cm, jnp.float32),
            use2=jnp.asarray(use2, jnp.float32),
        )

    # ------------------------------------------------------------------ carry
    def init_carry(self, latents: jnp.ndarray) -> jnp.ndarray:
        """Multistep history: previous step's x0 prediction (f32)."""
        return jnp.zeros(latents.shape, jnp.float32)

    def step_carry(
        self,
        state: DPMState,
        model_output: jnp.ndarray,
        step_index: jnp.ndarray,
        sample: jnp.ndarray,
        carry: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One solver step. `step_index` indexes the inference-step tables
        (0 = most noisy); `carry` is the previous x0 (ignored via the use2
        table on first-order steps, so the zero init is never read)."""
        dtype = sample.dtype
        x = sample.astype(jnp.float32)
        out = model_output.astype(jnp.float32)
        a_t = state.alpha_t[step_index]
        s_t = state.sigma_t[step_index]

        if self.prediction_type == "epsilon":
            x0 = (x - s_t * out) / a_t
        elif self.prediction_type == "sample":
            x0 = out
        elif self.prediction_type == "v_prediction":
            x0 = a_t * x - s_t * out
        else:
            raise ValueError(self.prediction_type)

        d = x0 + (state.use2[step_index] * state.cm[step_index]) * (x0 - carry)
        prev = state.c_xt[step_index] * x + state.c_x0[step_index] * d
        return prev.astype(dtype), x0

    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    def scale_model_input(self, sample: jnp.ndarray, t=None) -> jnp.ndarray:
        return sample
