"""Stage-1 (SMGA) motion-diffusion numerics: cosine DDPM, predict-x0,
50-step eta=1 DDIM sampling with timestep-dependent guidance clipping, and
the 6-term pose/velocity/acceleration loss.

Reference semantics: src/audio2pose_model/diffusion.py:38-384 (cosine
schedule T=1000, predict_epsilon=False i.e. the network predicts x0
directly, loss_type=l2, guidance_weight=2, cond_drop_prob=0.25; DDIM
sampling at diffusion.py:242-274; loss at :290-372).

The denoise function is supplied by the caller as
``denoise_fn(x, t, guidance_weight) -> x0_hat`` so the whole sampling loop is
one `lax.scan` under jit; classifier-free guidance batching lives in the
model wrapper (`mmgt_tpu.models.smga`), not here.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mmgt_tpu.diffusion.schedules import ScheduleTables, make_beta_schedule

# keypoint layout: 134 keypoints x (x, y, score) = 402 dims; face/head block is
# keypoints 24..92 -> flat dims 72:276 (reference diffusion.py:332-333)
HEAD_SLICE = (72, 276)


class GestureDiffusionSchedule:
    def __init__(
        self,
        n_timestep: int = 1000,
        schedule: str = "cosine",
        predict_epsilon: bool = False,
        clip_denoised: bool = True,
        guidance_weight: float = 2.0,
        head_loss_weight: float = 3.0,
    ):
        self.n_timestep = n_timestep
        self.predict_epsilon = predict_epsilon
        self.clip_denoised = clip_denoised
        self.guidance_weight = guidance_weight
        self.head_loss_weight = head_loss_weight
        self.tables = ScheduleTables(make_beta_schedule(schedule, n_timestep))

    # ---------------------------------------------------------------- helpers
    def guidance_weight_at(self, t: jnp.ndarray) -> jnp.ndarray:
        """Clip CFG weight near the ends of the chain (diffusion.py:169-176)."""
        w = jnp.asarray(self.guidance_weight, jnp.float32)
        w = jnp.where(t < 0.1 * self.n_timestep, jnp.minimum(w, 1.0), w)
        return w

    def q_sample(self, x0, noise, t):
        sa = self.tables.sqrt_alphas_cumprod[t][:, None, None]
        s1a = self.tables.sqrt_one_minus_alphas_cumprod[t][:, None, None]
        return sa * x0 + s1a * noise

    def predict_noise_from_start(self, x_t, t, x0):
        a = self.tables.sqrt_recip_alphas_cumprod[t][:, None, None]
        b = self.tables.sqrt_recipm1_alphas_cumprod[t][:, None, None]
        return (a * x_t - x0) / b

    # --------------------------------------------------------------- sampling
    def ddim_sample(
        self,
        denoise_fn: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray],
        rng: jax.Array,
        shape: Tuple[int, ...],
        sampling_timesteps: int = 50,
        eta: float = 1.0,
    ) -> jnp.ndarray:
        """DDIM sampling loop as a single `lax.scan`.

        Matches diffusion.py:242-274: times = linspace(-1, T-1, S+1) reversed,
        x0 clipped to [-1, 1] each step, eta=1 ancestral noise.
        """
        T = self.n_timestep
        times = np.linspace(-1, T - 1, sampling_timesteps + 1).astype(np.int64)
        times = list(reversed(times.tolist()))
        pairs = np.asarray(list(zip(times[:-1], times[1:])), np.int32)  # (S, 2)

        ac = self.tables.alphas_cumprod
        rng, init_rng = jax.random.split(rng)
        x = jax.random.normal(init_rng, shape, jnp.float32)
        step_rngs = jax.random.split(rng, sampling_timesteps)

        def body(x, inp):
            (t, t_next), step_rng = inp
            tb = jnp.full((shape[0],), t, jnp.int32)
            w = self.guidance_weight_at(jnp.asarray(t, jnp.float32))
            x0 = denoise_fn(x, tb, w)
            if self.clip_denoised:
                x0 = jnp.clip(x0, -1.0, 1.0)
            eps = self.predict_noise_from_start(x, tb, x0)

            alpha = ac[t]
            alpha_next = jnp.where(t_next >= 0, ac[jnp.maximum(t_next, 0)], 1.0)
            sigma = eta * jnp.sqrt(
                jnp.maximum((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha), 0.0)
            )
            c = jnp.sqrt(jnp.maximum(1 - alpha_next - sigma**2, 0.0))
            noise = jax.random.normal(step_rng, shape, jnp.float32)
            x_next = x0 * jnp.sqrt(alpha_next) + c * eps + sigma * noise
            # final step (t_next < 0) returns x0 directly (diffusion.py:259-260)
            x_next = jnp.where(t_next < 0, x0, x_next)
            return x_next, None

        x, _ = jax.lax.scan(body, x, (jnp.asarray(pairs), step_rngs))
        return x

    # --------------------------------------------------------------- training
    def losses(
        self, model_out: jnp.ndarray, target: jnp.ndarray
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """6-term l2 loss: {pos, vel, acc} x {full, head(x3)}.

        (p2 weighting is identity in the reference config - use_p2=False.)
        """

        def mse(a, b):
            return jnp.mean((a - b) ** 2)

        def three_terms(out, tgt):
            pos = mse(out, tgt)
            ov, tv = out[:, 1:] - out[:, :-1], tgt[:, 1:] - tgt[:, :-1]
            vel = mse(ov, tv)
            acc = mse(ov[:, 1:] - ov[:, :-1], tv[:, 1:] - tv[:, :-1])
            return pos, vel, acc

        pos, vel, acc = three_terms(model_out, target)
        h0, h1 = HEAD_SLICE
        hpos, hvel, hacc = three_terms(model_out[:, :, h0:h1], target[:, :, h0:h1])
        hw = self.head_loss_weight
        comps = {
            "pos": pos,
            "vel": vel,
            "acc": acc,
            "head_pos": hpos,
            "head_vel": hvel,
            "head_acc": hacc,
        }
        total = pos + vel + acc + hw * (hpos + hvel + hacc)
        return total, comps

    def training_loss(
        self,
        model_fn: Callable,
        rng: jax.Array,
        x0: jnp.ndarray,
        cond_frame: jnp.ndarray,
        cond: jnp.ndarray,
        cond_drop_prob: float = 0.25,
    ):
        """Sample t, noise, run the denoiser, return (loss, components)."""
        b = x0.shape[0]
        t_rng, n_rng, d_rng = jax.random.split(rng, 3)
        t = jax.random.randint(t_rng, (b,), 0, self.n_timestep)
        noise = jax.random.normal(n_rng, x0.shape, x0.dtype)
        x_noisy = self.q_sample(x0, noise, t)
        keep_mask = jax.random.uniform(d_rng, (b,)) >= cond_drop_prob
        model_out = model_fn(x_noisy, cond_frame, cond, t, keep_mask)
        target = noise if self.predict_epsilon else x0
        return self.losses(model_out, target)
