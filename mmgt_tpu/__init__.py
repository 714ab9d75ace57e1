"""MMGT-TPU: a TPU-native co-speech gesture video generation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the MMGT
(Motion Mask Guided Two-stage) co-speech gesture video generation system:

* Stage 1 (SMGA): audio -> whole-body keypoint motion diffusion
  (`mmgt_tpu.models.smga`, `mmgt_tpu.diffusion.gesture`).
* Stage 2: pose + audio + motion-mask conditioned latent video diffusion
  (`mmgt_tpu.models.unet3d`, `mmgt_tpu.pipelines.pose2vid`).

Design principles (TPU-first):
  - pure functions + pytrees; every hot path is a single jitted program
  - `lax.scan` over diffusion steps; context windows and CFG are batch
    dimensions, sharded over a `jax.sharding.Mesh` instead of Python loops
  - Pallas flash-attention kernels for the self/cross/temporal attention
  - bf16 compute / f32 params + f32 softmax and accumulation
"""

__version__ = "0.1.0"
