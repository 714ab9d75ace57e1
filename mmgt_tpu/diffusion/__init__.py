from mmgt_tpu.diffusion.schedules import (
    make_beta_schedule,
    alphas_cumprod_from_betas,
    rescale_zero_terminal_snr,
    ddim_timesteps,
)
from mmgt_tpu.diffusion.ddim import DDIMScheduler, DDIMState
from mmgt_tpu.diffusion.losses import min_snr_weight
from mmgt_tpu.diffusion.gesture import GestureDiffusionSchedule
