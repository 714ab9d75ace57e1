from mmgt_tpu.diffusion.schedules import (
    make_beta_schedule,
    alphas_cumprod_from_betas,
    rescale_zero_terminal_snr,
    ddim_timesteps,
)
from mmgt_tpu.diffusion.ddim import DDIMScheduler, DDIMState
from mmgt_tpu.diffusion.dpm import DPMSolverPlusPlus2M, DPMState
from mmgt_tpu.diffusion.losses import min_snr_weight
from mmgt_tpu.diffusion.gesture import GestureDiffusionSchedule


def make_scheduler(cfg):
    """Build the Stage-2 sampler from a `config.SchedulerConfig`."""
    common = dict(
        num_train_timesteps=cfg.num_train_timesteps,
        beta_start=cfg.beta_start,
        beta_end=cfg.beta_end,
        beta_schedule=cfg.beta_schedule,
        prediction_type=cfg.prediction_type,
        rescale_betas_zero_snr=cfg.rescale_betas_zero_snr,
        timestep_spacing=cfg.timestep_spacing,
        steps_offset=cfg.steps_offset,
    )
    solver = getattr(cfg, "solver", "ddim")
    if solver == "ddim":
        return DDIMScheduler(clip_sample=cfg.clip_sample, **common)
    if solver in ("dpm++2m", "dpm"):
        return DPMSolverPlusPlus2M(**common)
    raise ValueError(f"unknown solver: {solver!r}")
