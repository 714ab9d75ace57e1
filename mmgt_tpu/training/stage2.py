"""Stage-2 trainer: temporal/audio fine-tune of the denoising UNet.

TPU-native re-design of the reference's train_stage_2.py (§3.3 of SURVEY):
  * Accelerate/DDP/NCCL  -> jit over a ("dp", "tp") Mesh; the gradient
    all-reduce is the psum XLA inserts for the dp-sharded batch
  * 8-bit Adam           -> optax adamw (f32 states; bf16 compute)
  * selective trainability (audio_modules + motion_modules + audio_proj,
    config/train/stage2.yaml:44-47) -> param-tree partition by path;
    frozen params never enter the optimizer
  * CFG dropout: uncond_ratio 0.1 zeroes the CLIP context AND gates off the
    reference bank (the reference skips the ReferenceNet forward,
    train_stage_2.py:151-166); uncond_audio_ratio 0.05 zeroes audio —
    implemented per-example via bank_gate / multiplicative masks
  * v-prediction target with zero-SNR schedule + min-SNR-gamma(5) weighting
    (train_stage_2.py:814-870) + noise_offset 0.05
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

from mmgt_tpu.diffusion.ddim import DDIMScheduler
from mmgt_tpu.diffusion.losses import min_snr_weight
from mmgt_tpu.models.vae import AutoencoderKL
from mmgt_tpu.pipelines.pose2vid import Pose2VideoPipeline

TRAINABLE_KEYWORDS = ("_audio_", "_motion_", "audio_proj")


def partition_params(params: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """Split the full param dict into (trainable, frozen) by path.

    Trainable: audio modules, motion modules (denoiser) and the whole
    audio_proj model — the reference's `trainable_para` selection plus
    audioproj (train_stage_2.py:521-537).
    """
    flat = traverse_util.flatten_dict(params, sep="/")
    train, frozen = {}, {}
    for k, v in flat.items():
        (train if any(kw in k for kw in TRAINABLE_KEYWORDS) else frozen)[k] = v
    unflatten = lambda d: traverse_util.unflatten_dict(d, sep="/")
    return unflatten(train), unflatten(frozen)


def merge_params(trainable: Dict, frozen: Dict) -> Dict:
    flat = dict(traverse_util.flatten_dict(frozen, sep="/"))
    flat.update(traverse_util.flatten_dict(trainable, sep="/"))
    return traverse_util.unflatten_dict(flat, sep="/")


def encode_clip_batch(clip_model, clip_params, images) -> jnp.ndarray:
    """(B, H, W, 3) images in [0, 1] -> (B, 1, 768) CLIP image embeddings.

    The glue between dataset `clip_image` and the trainers' `clip_embed`
    input (reference train_stage_2.py:793-812). Falls back to zeros when no
    CLIP weights are available so training stays runnable (equivalent to
    permanent uncond-image dropout).
    """
    b = images.shape[0]
    if clip_model is None or clip_params is None:
        return jnp.zeros((b, 1, 768), jnp.float32)
    from mmgt_tpu.models.clip_vision import clip_preprocess

    x = clip_preprocess(jnp.asarray(images, jnp.float32))
    emb = clip_model.apply(clip_params, x.astype(clip_model.dtype))
    return emb.astype(jnp.float32)  # (B, 1, 768)


class TrainState(NamedTuple):
    step: jnp.ndarray
    trainable: Any
    frozen: Any
    opt_state: Any


@dataclasses.dataclass(eq=False)
class Stage2Trainer:
    pipeline: Pose2VideoPipeline
    learning_rate: float = 1e-5
    weight_decay: float = 1e-2
    max_grad_norm: float = 1.0
    snr_gamma: float = 5.0
    noise_offset: float = 0.05
    uncond_img_ratio: float = 0.1
    uncond_audio_ratio: float = 0.05
    motion_scale: Tuple[float, float, float] = (1.0, 2.0, 3.0)
    gradient_accumulation_steps: int = 1

    def __post_init__(self):
        # training scheduler: zero-SNR v-prediction (train_stage_2.py:453-462)
        self.scheduler = DDIMScheduler()
        tx = optax.chain(
            optax.clip_by_global_norm(self.max_grad_norm),
            optax.adamw(
                self.learning_rate,
                b1=0.9,
                b2=0.999,
                eps=1e-8,
                weight_decay=self.weight_decay,
            ),
        )
        if self.gradient_accumulation_steps > 1:
            # accelerate.accumulate equivalent (train_stage_2.py:725)
            tx = optax.MultiSteps(tx, self.gradient_accumulation_steps)
        self.tx = tx

    # ------------------------------------------------------------------
    def init_state(self, params: Dict[str, Any]) -> TrainState:
        trainable, frozen = partition_params(params)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            trainable=trainable,
            frozen=frozen,
            opt_state=self.tx.init(trainable),
        )

    # ------------------------------------------------------------------
    def loss_fn(self, trainable, frozen, batch, rng):
        pipe = self.pipeline
        params = merge_params(trainable, frozen)
        dtype = pipe.denoising_unet.dtype

        pixels = batch["pixel_values"]        # (B, F, H, W, 3) in [-1, 1]
        ref_img = batch["ref_image"]          # (B, H, W, 3)
        clip_embed = batch["clip_embed"]      # (B, 1, 768)
        audio_embeds = batch["audio_embeds"]  # (B, F, 5, 12, 768)
        pose = batch["pose_video"]            # (B, F, H, W, 3)
        masks = batch["masks"]                # 3 x (full, face, lip) (B, F, L)
        b, f = pixels.shape[:2]

        r_t, r_n, r_off, r_img, r_aud = jax.random.split(rng, 5)

        # --- targets (frozen VAE; keep out of the grad graph)
        def enc(x):
            return pipe.vae.apply(
                params["vae"], x.astype(dtype), method=AutoencoderKL.encode_scaled
            )

        latents = jax.lax.stop_gradient(
            enc(pixels.reshape(b * f, *pixels.shape[2:]))
        )
        h8, w8 = latents.shape[1:3]
        latents = latents.reshape(b, f, h8, w8, 4).astype(jnp.float32)
        ref_latent = jax.lax.stop_gradient(enc(ref_img))

        noise = jax.random.normal(r_n, latents.shape, jnp.float32)
        if self.noise_offset > 0:
            # per-(example, channel) offset (train_stage_2.py:757-763)
            noise = noise + self.noise_offset * jax.random.normal(
                r_off, (b, 1, 1, 1, latents.shape[-1]), jnp.float32
            )
        t = jax.random.randint(r_t, (b,), 0, self.scheduler.num_train_timesteps)
        noisy = self.scheduler.add_noise(latents, noise, t[:, None])
        target = self.scheduler.get_velocity(latents, noise, t[:, None])

        # --- CFG dropout
        keep_img = (
            jax.random.uniform(r_img, (b,)) >= self.uncond_img_ratio
        )
        keep_aud = (
            jax.random.uniform(r_aud, (b,)) >= self.uncond_audio_ratio
        )
        clip_ctx = clip_embed.astype(dtype) * keep_img[:, None, None].astype(dtype)

        # --- conditioning branches
        _, banks = pipe.reference_unet.apply(
            params["reference_unet"],
            ref_latent,
            jnp.zeros((b,), jnp.int32),
            clip_ctx,
        )
        pose_feat = pipe.pose_guider.apply(params["pose_guider"], pose.astype(dtype))
        audio_tokens = pipe.audio_proj.apply(
            params["audio_proj"], audio_embeds.astype(dtype)
        )
        audio_tokens = audio_tokens * keep_aud[:, None, None, None].astype(dtype)

        pred = pipe.denoising_unet.apply(
            params["denoising_unet"],
            noisy.astype(dtype),
            t,
            clip_ctx,
            audio_tokens,
            pose_feat,
            masks,
            banks,
            self.motion_scale,
            bank_gate=keep_img.astype(jnp.int32),
        ).astype(jnp.float32)

        per_example = jnp.mean(
            (pred - target) ** 2, axis=tuple(range(1, pred.ndim))
        )
        w = min_snr_weight(self.scheduler.tables, t, self.snr_gamma, "v_prediction")
        loss = jnp.mean(w * per_example)
        return loss, {"loss": loss, "mse": jnp.mean(per_example)}

    # ------------------------------------------------------------------
    def train_step(self, state: TrainState, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
            state.trainable, state.frozen, batch, rng
        )
        updates, opt_state = self.tx.update(
            grads, state.opt_state, state.trainable
        )
        trainable = optax.apply_updates(state.trainable, updates)
        new_state = TrainState(
            step=state.step + 1,
            trainable=trainable,
            frozen=state.frozen,
            opt_state=opt_state,
        )
        return new_state, metrics

    # ------------------------------------------------------------------
    def make_example_batch(self, b=1, f=12, height=512, width=512):
        """Zero batch with the right structure (for init/compile checks)."""
        h8, w8 = height // 8, width // 8
        return {
            "pixel_values": jnp.zeros((b, f, height, width, 3)),
            "ref_image": jnp.zeros((b, height, width, 3)),
            "clip_embed": jnp.zeros((b, 1, 768)),
            "audio_embeds": jnp.zeros((b, f, 5, 12, 768)),
            "pose_video": jnp.zeros((b, f, height, width, 3)),
            "masks": [
                tuple(
                    jnp.ones((b, f, (h8 >> l) * (w8 >> l))) for _ in range(3)
                )
                for l in range(3)
            ],
        }
