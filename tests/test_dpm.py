"""DPM-Solver++(2M) correctness: analytic probability-flow toys, DDIM
equivalence, zero-SNR table safety, and pipeline integration.

The reference samples with plain DDIM (src/pipelines/
pipeline_pose2vid_long.py:633-635); the few-step solver is a beyond-reference
quality/latency lever, so it is verified against mathematics instead of a
reference implementation: on a Gaussian data distribution the probability-flow
ODE has the closed-form solution x(t) = C(t)·w with C(t)² = a_t²s² + σ_t²
(exact posterior mean E[x0|x_t] = a s² x / (a²s² + σ²)), which exposes the
solver's discretization order directly.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from mmgt_tpu.diffusion.ddim import DDIMScheduler
from mmgt_tpu.diffusion.dpm import DPMSolverPlusPlus2M

S2 = 6.25  # toy data variance s^2 (s = 2.5) — far from 1 so DDIM has error


def _run_toy(sched, steps: int, x_T: np.ndarray) -> np.ndarray:
    """Sample the Gaussian-data PF-ODE with the exact v-prediction model."""
    st = sched.init(steps)
    ac = np.asarray(sched.tables.alphas_cumprod)[np.asarray(st.timesteps)]
    x = jnp.asarray(x_T, jnp.float32)
    carry = sched.init_carry(x)
    for i in range(steps):
        a, s = np.sqrt(ac[i]), np.sqrt(1.0 - ac[i])
        x0 = a * S2 * x / (a * a * S2 + s * s)
        v = (a * x - x0) / s  # exact model in v-parametrization
        x, carry = sched.step_carry(st, jnp.asarray(v), i, x, carry)
    return np.asarray(x)


def _exact(x_T: np.ndarray) -> np.ndarray:
    # start: zero-SNR trailing => a=0, s=1 => C(T)=1; end boundary: C(0)=s
    return np.sqrt(S2) * x_T


@pytest.fixture(scope="module")
def x_T():
    return np.random.default_rng(0).standard_normal((8,)).astype(np.float32)


def _err(sched, steps, x_T):
    return float(np.abs(_run_toy(sched, steps, x_T) - _exact(x_T)).max())


def test_dpm_beats_ddim_at_equal_steps(x_T):
    ddim = DDIMScheduler()
    dpm = DPMSolverPlusPlus2M()
    for steps in (10, 15, 25):
        e_ddim, e_dpm = _err(ddim, steps, x_T), _err(dpm, steps, x_T)
        assert e_dpm < e_ddim / 4, (steps, e_dpm, e_ddim)


def test_dpm_second_order_convergence(x_T):
    """Doubling steps must shrink the error ~4x (2nd order); DDIM ~2x."""
    dpm = DPMSolverPlusPlus2M()
    e = {s: _err(dpm, s, x_T) for s in (10, 20, 40)}
    assert e[10] / e[20] > 3.0, e
    assert e[20] / e[40] > 2.4, e  # f32 floor creeps in below ~6e-3
    ddim = DDIMScheduler()
    d = {s: _err(ddim, s, x_T) for s in (10, 20, 40)}
    assert 1.5 < d[10] / d[20] < 2.8, d  # first order, for contrast


def test_dpm_12_matches_ddim_25_budget(x_T):
    """The serving claim behind the <10 s configuration: DPM++ at ~half the
    steps is at least as accurate as DDIM at the full step count."""
    assert _err(DPMSolverPlusPlus2M(), 12, x_T) < _err(DDIMScheduler(), 25, x_T)
    assert _err(DPMSolverPlusPlus2M(), 15, x_T) < _err(DDIMScheduler(), 30, x_T)


def test_both_converge_to_exact_at_many_steps(x_T):
    # DPM is 2nd order -> much tighter than DDIM's O(1/S) at S=500
    got = _run_toy(DPMSolverPlusPlus2M(), 500, x_T)
    np.testing.assert_allclose(got, _exact(x_T), atol=1e-3)
    got = _run_toy(DDIMScheduler(), 500, x_T)
    np.testing.assert_allclose(got, _exact(x_T), atol=2e-2)


def test_first_order_step_equals_ddim():
    """DPM-Solver++(1) IS the DDIM (eta=0) update — step 0 of both samplers
    must agree bit-for-bit-ish on identical inputs."""
    # S=25 divides T=1000, so DDIM's uniform step-back and DPM's
    # next-table-entry prev coincide and the updates are identical
    ddim, dpm = DDIMScheduler(), DPMSolverPlusPlus2M()
    std, stp = ddim.init(25), dpm.init(25)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 6)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((4, 6)), jnp.float32)
    a = ddim.step(std, v, 0, x)
    b, _ = dpm.step_carry(stp, v, 0, x, dpm.init_carry(x))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.parametrize("steps", [1, 2, 12, 15, 25])
def test_zero_snr_tables_finite(steps):
    """Trailing zero-SNR spacing puts lambda at ±inf on both ends; every
    gathered coefficient must still be finite (inf-safe host precompute)."""
    st = DPMSolverPlusPlus2M().init(steps)
    for name, arr in st._asdict().items():
        assert np.isfinite(np.asarray(arr)).all(), name
    # closing step hits the exact boundary: c_xt=0 (sigma_prev=0), c_x0=1
    np.testing.assert_allclose(float(st.c_xt[-1]), 0.0, atol=1e-7)
    np.testing.assert_allclose(float(st.c_x0[-1]), 1.0, atol=1e-6)
    # first step is forced first-order (no history yet)
    assert float(st.use2[0]) == 0.0


def test_epsilon_and_sample_predictions():
    """Same toy, driven through the epsilon- and sample-prediction paths
    (finite-SNR leading spacing so epsilon conversion is well-posed)."""
    x_T = np.random.default_rng(2).standard_normal((6,)).astype(np.float32)

    for kind in ("epsilon", "sample"):
        dpm = DPMSolverPlusPlus2M(
            prediction_type=kind,
            rescale_betas_zero_snr=False,
            timestep_spacing="leading",
        )
        st = dpm.init(30)
        ac = np.asarray(dpm.tables.alphas_cumprod)[np.asarray(st.timesteps)]
        x = jnp.asarray(x_T * np.sqrt(ac[0] * S2 + 1 - ac[0]), jnp.float32)
        carry = dpm.init_carry(x)
        for i in range(30):
            a, s = np.sqrt(ac[i]), np.sqrt(1.0 - ac[i])
            x0 = a * S2 * x / (a * a * S2 + s * s)
            out = x0 if kind == "sample" else (x - a * x0) / s
            x, carry = dpm.step_carry(st, jnp.asarray(out), i, x, carry)
        # endpoint C(0)=s·x_T (up to the finite-SNR start approximation)
        np.testing.assert_allclose(
            np.asarray(x), _exact(x_T), rtol=0.05, atol=0.05
        )


# ---------------------------------------------------------------- pipeline
@pytest.mark.slow
def test_pose2vid_with_dpm_scheduler():
    """Drop-in swap: the pipeline threads the multistep carry across its
    chunked launches (steps_per_launch=2 over 4 steps forces a chunk
    boundary mid-history)."""
    import jax

    from tests.test_pipeline import _tiny_pipeline

    pipe = _tiny_pipeline()
    pipe.scheduler = DPMSolverPlusPlus2M()
    pipe.steps_per_launch = 2
    rng = jax.random.PRNGKey(0)
    H = W = 64
    F = 6
    params = pipe.init_params(rng, H, W)
    h8 = H // 8
    masks = [
        tuple(jnp.ones((1, F, (h8 >> l) * (h8 >> l))) for _ in range(3))
        for l in range(3)
    ]
    out = pipe(
        params, rng,
        jnp.zeros((1, H, W, 3)), jnp.zeros((1, F, H, W, 3)),
        jnp.zeros((1, 1, 768)), masks, jnp.zeros((1, F, 5, 12, 768)),
        num_inference_steps=4, guidance_scale=3.5,
    )
    assert out.shape == (1, F, H, W, 3)
    o = np.asarray(out)
    assert np.isfinite(o).all() and o.min() >= 0.0 and o.max() <= 1.0
