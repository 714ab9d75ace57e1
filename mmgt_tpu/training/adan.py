"""Adan optimizer as an optax GradientTransformation.

Matches the reference's lucidrains-style implementation
(src/audio2pose_model/adan.py:9-121) exactly: `betas` are the (1-decay)
mixing factors (0.02, 0.08, 0.01), moments are NOT updated on the first
step, bias correction uses 1/(1-(1-beta)^step), and weight decay is the
Adan-style division p <- (p - lr*update) / (1 + lr*wd).

Used by Stage-1 SMGA training with lr=2e-4, wd=0.02 (SMGA.py:110-114).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class AdanState(NamedTuple):
    step: jnp.ndarray
    prev_grad: optax.Updates
    m: optax.Updates
    v: optax.Updates
    n: optax.Updates


def adan(
    learning_rate: float = 1e-3,
    betas=(0.02, 0.08, 0.01),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    b1, b2, b3 = betas

    def init_fn(params):
        z = lambda: jax.tree.map(jnp.zeros_like, params)
        return AdanState(jnp.zeros((), jnp.int32), z(), z(), z(), z())

    def update_fn(grads, state, params):
        assert params is not None, "adan requires params (weight decay)"
        first = state.step == 0

        def upd_m(m, g):
            return jnp.where(first, m, m * (1 - b1) + b1 * g)

        def upd_v(v, g, pg):
            return jnp.where(first, v, v * (1 - b2) + b2 * (g - pg))

        def upd_n(n, g, pg):
            nx = (g + (1 - b2) * (g - pg)) ** 2
            return jnp.where(first, n, n * (1 - b3) + b3 * nx)

        m = jax.tree.map(upd_m, state.m, grads)
        v = jax.tree.map(upd_v, state.v, grads, state.prev_grad)
        n = jax.tree.map(upd_n, state.n, grads, state.prev_grad)

        step = state.step + 1
        cm = 1.0 / (1.0 - (1.0 - b1) ** step)
        cv = 1.0 / (1.0 - (1.0 - b2) ** step)
        cn = 1.0 / (1.0 - (1.0 - b3) ** step)
        denom = 1.0 + weight_decay * learning_rate

        def delta(p, m_, v_, n_):
            step_size = learning_rate / (jnp.sqrt(n_ * cn) + eps)
            new_p = (p - step_size * (m_ * cm + (1 - b2) * v_ * cv)) / denom
            return new_p - p

        updates = jax.tree.map(delta, params, m, v, n)
        return updates, AdanState(step, grads, m, v, n)

    return optax.GradientTransformation(init_fn, update_fn)
