"""Training-loss weightings for Stage-2 diffusion."""
from __future__ import annotations

import jax.numpy as jnp

from mmgt_tpu.diffusion.schedules import ScheduleTables


def min_snr_weight(
    tables: ScheduleTables,
    t: jnp.ndarray,
    gamma: float = 5.0,
    prediction_type: str = "v_prediction",
) -> jnp.ndarray:
    """Min-SNR-gamma loss weight (reference train_stage_2.py:848-870).

    For v-prediction the weight is min(snr, gamma) / (snr + 1); for epsilon
    it is min(snr, gamma) / snr.
    """
    snr = tables.snr[t]
    clipped = jnp.minimum(snr, gamma)
    if prediction_type == "v_prediction":
        return clipped / (snr + 1.0)
    return clipped / jnp.maximum(snr, 1e-8)
