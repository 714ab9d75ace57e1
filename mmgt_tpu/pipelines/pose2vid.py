"""Pose2Video pipeline: the Stage-2 inference engine as ONE jitted program.

Replaces the reference Pose2VideoPipeline
(src/pipelines/pipeline_pose2vid_long.py:338-660). Re-design highlights:

  * the 30-step denoising loop is a `lax.scan`; each step's context windows
    are gathered with a precomputed (S, W, 12) index array and denoised in
    ONE batched UNet call (windows x CFG on the batch axis) instead of a
    Python per-window loop;
  * overlap-averaged noise fusion is a `segment_sum` scatter, numerically
    identical to the reference's counter-normalized accumulation
    (pipeline_pose2vid_long.py:614-631);
  * ReferenceNet runs once, batch-1 (cond only) — the reference wastes an
    uncond forward whose bank the uncond half never reads;
  * CFG batching: [uncond windows ; cond windows], with the uncond half
    attending self-only (n_uncond=W) and zeroed audio/CLIP context;
  * VAE decode is batched over frames in fixed-size chunks via `lax.map`
    (the reference decodes frames one by one in Python).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mmgt_tpu.diffusion.ddim import DDIMScheduler, DDIMState
from mmgt_tpu.models.audio_proj import AudioProjModel
from mmgt_tpu.models.pose_guider import PoseGuider
from mmgt_tpu.models.unet3d import DenoisingUNet3D
from mmgt_tpu.models.unet_ref import ReferenceUNet2D
from mmgt_tpu.models.vae import AutoencoderKL
from mmgt_tpu.pipelines.context import compute_context_schedule


def _largest_divisor_at_most(n: int, cap: int) -> int:
    for d in range(min(cap, n), 0, -1):
        if n % d == 0:
            return d
    return 1


@dataclasses.dataclass(eq=False)  # hash by id so `self` can be a jit static
class Pose2VideoPipeline:
    """Bundles the Stage-2 models + scheduler into a jitted generate fn.

    Models are flax modules; `params` is a dict with keys
    {vae, reference_unet, denoising_unet, pose_guider, audio_proj}.
    """

    vae: AutoencoderKL
    reference_unet: ReferenceUNet2D
    denoising_unet: DenoisingUNet3D
    pose_guider: PoseGuider
    audio_proj: Optional[AudioProjModel] = None
    scheduler: DDIMScheduler = dataclasses.field(default_factory=DDIMScheduler)
    context_size: int = 12
    context_overlap: int = 4
    decode_chunk_cap: int = 8
    # max windows denoised per UNet call; None = all windows at once.
    # On a single chip this bounds activation memory; on a mesh the window
    # batch axis shards over "dp" instead.
    window_microbatch: Optional[int] = None
    # denoising scan steps per device launch (one jit dispatch each);
    # bounds per-execution runtime for remote-attached TPUs
    steps_per_launch: int = 8
    # optional jax.sharding.Mesh: shards the (windows x CFG) UNet batch
    # axis over "dp" — the TPU-native replacement for the reference's
    # sequential window loop at multi-chip scale (SURVEY §5.7)
    mesh: Optional[Any] = None
    # return frames as uint8 (0..255) instead of float32 [0,1]: pixels are
    # the final product (the reference writes mp4), and a float32 fetch of
    # an 80-frame 512^2 clip is 251 MB over the remote relay vs 63 MB
    output_uint8: bool = False
    # when True, __call__ syncs after prepare/denoise/decode and fills
    # self.timings with per-phase seconds (each sync costs one ~25 ms tiny
    # fetch on the remote relay; leave off when not profiling)
    profile_phases: bool = False

    @classmethod
    def build(cls, dtype=jnp.bfloat16, **kwargs) -> "Pose2VideoPipeline":
        return cls(
            vae=AutoencoderKL(dtype=dtype),
            reference_unet=ReferenceUNet2D(dtype=dtype),
            denoising_unet=DenoisingUNet3D(dtype=dtype),
            pose_guider=PoseGuider(dtype=dtype),
            audio_proj=AudioProjModel(dtype=dtype),
            **kwargs,
        )

    # ------------------------------------------------------------------
    def __call__(
        self,
        params: Dict[str, Any],
        rng: jax.Array,
        ref_image: jnp.ndarray,        # (1, H, W, 3) in [-1, 1]
        pose_video: jnp.ndarray,       # (1, F, H, W, 3) in [0, 1]
        clip_embed: jnp.ndarray,       # (1, 1, 768) CLIP image embedding
        masks: Sequence[Tuple[jnp.ndarray, ...]],  # 3 levels x (full, face, lip), (1, F, L)
        audio_embeds: Optional[jnp.ndarray] = None,  # (1, F, 5, 12, 768) wav2vec window
        num_inference_steps: int = 30,
        guidance_scale: float = 3.5,
        motion_scale: Sequence[float] = (1.0, 1.0, 1.0),
        to_host: bool = False,
    ) -> jnp.ndarray:
        """Returns (1, F, H, W, 3) frames in [0, 1] — a device array, or
        (with `to_host=True`) a numpy array produced by the overlapped
        chunked decode+fetch path (`decode_to_host`).

        The denoising loop is launched in chunks of `steps_per_launch`
        scan steps: each launch is one device program, the conditioning
        tensors stay resident on device between launches. (Besides
        progress visibility, this bounds single-execution runtime, which
        remote-attached TPU transports cap.)
        """
        import time as _time

        def _sync(x):
            # the remote relay ignores block_until_ready; a 1-element fetch
            # is the only reliable completion barrier
            np.asarray(jax.tree.leaves(x)[0].ravel()[0])

        f = pose_video.shape[1]
        # scheduler-agnostic tables: DDIM(eta=0) and DPM++(2M) share ONE
        # compiled chunk program (diffusion/solver.py); schedulers outside
        # the generic family fall back to their own step_carry
        from mmgt_tpu.diffusion.solver import solver_tables_for

        state = solver_tables_for(self.scheduler, num_inference_steps)
        if state is None:
            state = self.scheduler.init(num_inference_steps)
        windows = jnp.asarray(
            compute_context_schedule(
                num_inference_steps, f, self.context_size, 1, self.context_overlap
            )
        )
        masks = tuple(tuple(lv) for lv in masks)
        t0 = _time.time()
        cond, latents = self._prepare(
            params, rng, ref_image, pose_video, clip_embed, masks, audio_embeds
        )
        self.timings: Dict[str, float] = {}
        if self.profile_phases:
            _sync(latents)
            self.timings["prepare_s"] = _time.time() - t0
            t0 = _time.time()
        k = _largest_divisor_at_most(
            num_inference_steps, self.steps_per_launch or num_inference_steps
        )
        from mmgt_tpu.diffusion.solver import SolverTables, init_solver_carry

        aux = (
            init_solver_carry(latents)  # x0 history (shared across samplers)
            if isinstance(state, SolverTables)
            else self.scheduler.init_carry(latents)
        )
        for o in range(0, num_inference_steps, k):
            chunk_state = type(state)(*[x[o : o + k] for x in state])
            latents, aux = self._denoise_chunk(
                params,
                latents,
                aux,
                cond,
                chunk_state,
                windows[o : o + k],
                guidance_scale,
                tuple(motion_scale),
                prediction_type=self.scheduler.prediction_type,
            )
        if self.profile_phases:
            _sync(latents)
            self.timings["denoise_s"] = _time.time() - t0
            t0 = _time.time()
        if to_host:
            out = self.decode_to_host(params, latents)
            if self.profile_phases:
                self.timings["decode_fetch_s"] = _time.time() - t0
            return out
        frames = self._decode(params, latents)
        if self.profile_phases:
            _sync(frames)
            self.timings["decode_s"] = _time.time() - t0
        return frames

    @functools.partial(jax.jit, static_argnums=(0,))
    def _prepare(
        self,
        params,
        rng,
        ref_image,
        pose_video,
        clip_embed,
        masks,
        audio_embeds,
        pose_feat=None,
    ):
        """Reference branch + conditioning features + initial noise.

        `pose_feat` overrides the PoseGuider features (already at latent
        resolution) — used by pipeline variants with their own guiders
        (lmks2vid's dual-guider sum) so the default guider forward is
        skipped entirely, not computed and discarded."""
        dtype = self.denoising_unet.dtype
        f = pose_video.shape[1]
        w = self._num_windows(f)
        mb = _largest_divisor_at_most(w, self.window_microbatch or w)

        ref_latent = self.vae.apply(
            params["vae"], ref_image.astype(dtype), method=AutoencoderKL.encode_scaled
        )
        _, banks = self.reference_unet.apply(
            params["reference_unet"],
            ref_latent,
            jnp.zeros((1,), jnp.int32),
            clip_embed.astype(dtype),
        )
        # banks are per-generation constants: on the packed (TPU) route,
        # project each through its block's attn1 to_k/to_v ONCE here —
        # the denoising scan then runs the two-segment flash kernel with
        # these batch-1 operands instead of re-projecting and re-concating
        # the bank every step (reference mutual_self_attention.py re-reads
        # the bank per step)
        banks_kv = None
        from mmgt_tpu.ops.attention import packed_backend

        if packed_backend():
            from mmgt_tpu.models.unet3d import precompute_bank_kv

            banks_kv = precompute_bank_kv(
                self.denoising_unet, params["denoising_unet"], banks
            )
        # tile banks to the (2*mb,) CFG batch; first mb rows (uncond) unread
        banks = [jnp.repeat(b, 2 * mb, axis=0) for b in banks]

        if pose_feat is None:
            pose_feat = self.pose_guider.apply(
                params["pose_guider"], pose_video.astype(dtype)
            )  # (1, F, h, w, 320)
        if audio_embeds is not None:
            audio_tokens = self.audio_proj.apply(
                params["audio_proj"], audio_embeds.astype(dtype)
            )  # (1, F, 32, 768)
        else:
            audio_tokens = jnp.zeros((1, f, 32, 768), dtype)

        ctx_cond = clip_embed.astype(dtype)
        ctx_uncond = jnp.zeros_like(ctx_cond)
        ctx_cfg = jnp.concatenate(
            [jnp.repeat(ctx_uncond, mb, axis=0), jnp.repeat(ctx_cond, mb, axis=0)], 0
        )  # (2*mb, 1, 768)

        h8, w8 = ref_latent.shape[1], ref_latent.shape[2]
        rng, noise_rng = jax.random.split(rng)
        latents = jax.random.normal(noise_rng, (f, h8, w8, 4), jnp.float32)
        masks_full = tuple(
            tuple(m[0].astype(dtype) for m in lv) for lv in masks
        )  # 3 levels x 3 kinds, (F, L)
        cond = {
            "banks": banks,
            "banks_kv": banks_kv,
            "pose_feat": pose_feat,
            "audio_tokens": audio_tokens,
            "ctx_cfg": ctx_cfg,
            "masks": masks_full,
        }
        return cond, latents

    def _num_windows(self, f: int) -> int:
        if f <= self.context_size:
            return 1
        stride = self.context_size - self.context_overlap
        return -(-f // stride)

    @functools.partial(
        jax.jit,
        static_argnums=(0,),
        static_argnames=("guidance_scale", "motion_scale", "prediction_type"),
    )
    def _denoise_chunk(
        self,
        params,
        latents,
        aux,
        cond,
        state,  # SolverTables (generic) | DDIMState — per-chunk table slices
        windows: jnp.ndarray,
        guidance_scale: float,
        motion_scale: Tuple[float, float, float],
        prediction_type: str = "v_prediction",
    ) -> jnp.ndarray:
        dtype = self.denoising_unet.dtype
        f = latents.shape[0]
        h8, w8 = latents.shape[1], latents.shape[2]
        num_steps, num_windows, ctx_len = windows.shape
        w = num_windows
        mb = _largest_divisor_at_most(w, self.window_microbatch or w)
        groups = w // mb
        banks = cond["banks"]
        pose_feat = cond["pose_feat"]
        audio_tokens = cond["audio_tokens"]
        ctx_cfg = cond["ctx_cfg"]
        masks_full = cond["masks"]

        def denoise_group(latents_d, step_t, idx_g):
            """Denoise `mb` windows (one CFG-batched UNet call)."""
            flat = idx_g.reshape(-1)  # (mb*ctx,)
            lat_w = latents_d[flat].reshape(mb, ctx_len, h8, w8, 4)
            pose_w = pose_feat[0][flat].reshape(mb, ctx_len, *pose_feat.shape[2:])
            audio_w = audio_tokens[0][flat].reshape(mb, ctx_len, 32, 768)

            lat_cfg = jnp.concatenate([lat_w, lat_w], 0)  # (2mb, ctx, h, w, 4)
            pose_cfg = jnp.concatenate([pose_w, pose_w], 0)
            audio_cfg = jnp.concatenate([jnp.zeros_like(audio_w), audio_w], 0)
            mask_cfg = [
                tuple(
                    jnp.concatenate([mm[flat].reshape(mb, ctx_len, -1)] * 2, 0)
                    for mm in lv
                )
                for lv in masks_full
            ]
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                shard = lambda x: jax.lax.with_sharding_constraint(
                    x, NamedSharding(self.mesh, P("dp"))
                )
                lat_cfg = shard(lat_cfg)
                pose_cfg = shard(pose_cfg)
                audio_cfg = shard(audio_cfg)
                mask_cfg = [tuple(shard(m) for m in lv) for lv in mask_cfg]
            t = jnp.full((2 * mb,), step_t, jnp.int32)
            pred = self.denoising_unet.apply(
                params["denoising_unet"],
                lat_cfg,
                t,
                ctx_cfg,
                audio_cfg,
                pose_cfg,
                mask_cfg,
                banks,
                motion_scale,
                n_uncond=mb,
                banks_kv=cond.get("banks_kv"),
            )  # (2mb, ctx, h, w, 4)
            return pred.astype(jnp.float32)

        def step_fn(carry, s):
            latents, aux = carry
            idx = windows[s]                      # (W, ctx_len)
            flat = idx.reshape(-1)                # (W*ctx,)
            lat_d = latents.astype(dtype)
            step_t = state.timesteps[s]
            if groups == 1:
                pred = denoise_group(lat_d, step_t, idx)
            else:
                pred = jax.lax.map(
                    lambda ig: denoise_group(lat_d, step_t, ig),
                    idx.reshape(groups, mb, ctx_len),
                )  # (G, 2mb, ctx, h, w, 4)
            pred = pred.reshape(groups, 2, mb, ctx_len, h8, w8, 4)
            uncond = pred[:, 0].reshape(w * ctx_len, h8, w8, 4)
            cond_p = pred[:, 1].reshape(w * ctx_len, h8, w8, 4)
            seg = lambda x: jax.ops.segment_sum(x, flat, num_segments=f)
            count = jax.ops.segment_sum(
                jnp.ones((w * ctx_len,), jnp.float32), flat, num_segments=f
            )[:, None, None, None]
            u = seg(uncond) / count
            c = seg(cond_p) / count
            noise_pred = u + guidance_scale * (c - u)
            from mmgt_tpu.diffusion.solver import SolverTables, solver_step

            if isinstance(state, SolverTables):
                latents, aux = solver_step(
                    state, noise_pred, s, latents, aux, prediction_type
                )
            else:
                latents, aux = self.scheduler.step_carry(
                    state, noise_pred, s, latents, aux
                )
            return (latents, aux), None

        (latents, aux), _ = jax.lax.scan(
            step_fn, (latents, aux), jnp.arange(num_steps)
        )
        return latents, aux

    @functools.partial(jax.jit, static_argnums=(0,))
    def _decode_chunk(self, params, lat) -> jnp.ndarray:
        """(n, h8, w8, 4) latents -> (n, H, W, 3) frames (one dispatch)."""
        dtype = self.denoising_unet.dtype
        frames = self.vae.apply(
            params["vae"], lat.astype(dtype), method=AutoencoderKL.decode_scaled
        )
        frames = jnp.clip(frames.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
        if self.output_uint8:
            return jnp.round(frames * 255.0).astype(jnp.uint8)
        return frames

    def decode_to_host(self, params, latents) -> np.ndarray:
        """Chunked VAE decode with overlapped, CONCURRENT host fetches:
        every chunk's decode program is dispatched up front (async on the
        remote relay), then all chunks stream to the host from a thread
        pool while the device is still executing. Measured on the relay
        (80f 512^2 uint8): serial decode-then-fetch 4.4 s -> 2.0 s with
        10 concurrent chunk fetches (transfers pipeline; one fetch alone
        never saturates the link). Returns (1, F, H, W, 3) numpy."""
        from concurrent.futures import ThreadPoolExecutor

        f = latents.shape[0]
        chunk = _largest_divisor_at_most(f, self.decode_chunk_cap)
        parts = [
            self._decode_chunk(params, latents[o : o + chunk])
            for o in range(0, f, chunk)
        ]
        with ThreadPoolExecutor(max(1, min(len(parts), 16))) as ex:
            outs = list(ex.map(np.asarray, parts))
        return np.concatenate(outs, axis=0)[None]

    @functools.partial(jax.jit, static_argnums=(0,))
    def _decode(self, params, latents) -> jnp.ndarray:
        """Batched VAE decode in fixed chunks."""
        dtype = self.denoising_unet.dtype
        f, h8, w8 = latents.shape[0], latents.shape[1], latents.shape[2]
        chunk = _largest_divisor_at_most(f, self.decode_chunk_cap)
        lat_chunks = latents.astype(dtype).reshape(f // chunk, chunk, h8, w8, 4)
        decode = lambda z: self.vae.apply(
            params["vae"], z, method=AutoencoderKL.decode_scaled
        )
        frames = jax.lax.map(decode, lat_chunks)
        frames = frames.reshape(1, f, *frames.shape[2:])
        frames = jnp.clip(frames.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
        if self.output_uint8:
            return jnp.round(frames * 255.0).astype(jnp.uint8)
        return frames

    # ------------------------------------------------------------------
    def init_params(self, rng: jax.Array, height: int = 512, width: int = 512
                    ) -> Dict[str, Any]:
        """Random-init all model params (for tests / before weight loading)."""
        dtype = self.denoising_unet.dtype
        f = self.context_size
        h8, w8 = height // 8, width // 8
        r = jax.random.split(rng, 5)
        ctx = jnp.zeros((1, 1, 768), dtype)
        # jit every init: eager (op-by-op) init is pathologically slow on
        # remote TPU backends
        vae_p = jax.jit(self.vae.init)(
            r[0], jnp.zeros((1, height, width, 3), dtype)
        )
        ref_p = jax.jit(self.reference_unet.init)(
            r[1], jnp.zeros((1, h8, w8, 4), dtype), jnp.zeros((1,), jnp.int32), ctx
        )
        latents = jnp.zeros((1, f, h8, w8, 4), dtype)
        masks = [
            tuple(
                jnp.zeros((1, f, (h8 >> l) * (w8 >> l)), dtype) for _ in range(3)
            )
            for l in range(3)
        ]
        banks_shapes = self._bank_shapes(h8, w8)
        banks = [jnp.zeros((1, l, c), dtype) for l, c in banks_shapes]
        den_p = jax.jit(self.denoising_unet.init)(
            r[2],
            latents,
            jnp.zeros((1,), jnp.int32),
            ctx,
            jnp.zeros((1, f, 32, 768), dtype),
            jnp.zeros(
                (1, f, h8, w8, self.denoising_unet.block_out_channels[0]), dtype
            ),
            masks,
            banks,
        )
        pg_p = jax.jit(self.pose_guider.init)(
            r[3], jnp.zeros((1, f, height, width, 3), dtype)
        )
        ap_p = jax.jit(self.audio_proj.init)(
            r[4], jnp.zeros((1, f, 5, 12, 768), dtype)
        )
        return {
            "vae": vae_p,
            "reference_unet": ref_p,
            "denoising_unet": den_p,
            "pose_guider": pg_p,
            "audio_proj": ap_p,
        }

    def _bank_shapes(self, h8: int, w8: int):
        chans = list(self.denoising_unet.block_out_channels)
        n = len(chans)
        layers = self.denoising_unet.layers_per_block
        shapes = []
        # down: `layers` banks per cross-attn block (blocks 0..n-2)
        for bi in range(n - 1):
            l = (h8 >> bi) * (w8 >> bi)
            shapes += [(l, chans[bi])] * layers
        # mid (at the deepest level)
        shapes.append(((h8 >> (n - 1)) * (w8 >> (n - 1)), chans[-1]))
        # up: layers+1 banks per cross-attn block (up blocks 1..n-1)
        rev = list(reversed(chans))
        for bi in range(1, n):
            l = (h8 >> (n - 1 - bi)) * (w8 >> (n - 1 - bi))
            shapes += [(l, rev[bi])] * (layers + 1)
        return shapes
