import jax
import jax.numpy as jnp
import numpy as np

from mmgt_tpu.models.vae import SD_VAE_SCALE, AutoencoderKL


def test_vae_shapes_roundtrip():
    vae = AutoencoderKL(block_out_channels=(16, 16, 32, 32))
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 64, 64, 3))
    params = vae.init(rng, x)
    mean, logvar = vae.apply(params, x, method=AutoencoderKL.encode)
    assert mean.shape == (2, 8, 8, 4) and logvar.shape == (2, 8, 8, 4)
    out = vae.apply(params, mean, method=AutoencoderKL.decode)
    assert out.shape == (2, 64, 64, 3)


def test_vae_scaled_consistency():
    vae = AutoencoderKL(block_out_channels=(16, 16, 32, 32))
    rng = jax.random.PRNGKey(1)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 64, 64, 3)), jnp.float32
    )
    params = vae.init(rng, x)
    z = vae.apply(params, x, method=AutoencoderKL.encode_scaled)
    mean, _ = vae.apply(params, x, method=AutoencoderKL.encode)
    np.testing.assert_allclose(
        np.asarray(z), np.asarray(mean) * SD_VAE_SCALE, atol=1e-6
    )
    # decode_scaled(encode_scaled(x)) == decode(encode(x).mean)
    d1 = vae.apply(params, z, method=AutoencoderKL.decode_scaled)
    d2 = vae.apply(params, mean, method=AutoencoderKL.decode)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)


def test_vae_param_count_full_size():
    """Full-size VAE should match SD VAE scale (~83.7M params)."""
    vae = AutoencoderKL()
    rng = jax.random.PRNGKey(0)
    params = jax.eval_shape(
        lambda: vae.init(rng, jnp.zeros((1, 64, 64, 3)))
    )
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    assert 82e6 < n < 86e6, n


def test_upsample_phase_decomposition_exact():
    """The 4-phase coarse-grid upsample (blocks.Upsample) must equal the
    literal nearest-x2 -> 3x3 SAME conv composition on identical params,
    including all borders (zero padding folds identically)."""
    import jax
    import jax.numpy as jnp

    from mmgt_tpu.models.blocks import Upsample

    rng = np.random.default_rng(0)
    for h, w, c in ((5, 7, 8), (8, 8, 16), (1, 1, 4)):
        x = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
        ref_mod = Upsample(phase_decomposed=False)
        params = ref_mod.init(jax.random.PRNGKey(1), x)
        want = ref_mod.apply(params, x)
        got = Upsample(phase_decomposed=True).apply(params, x)
        assert got.shape == (2, 2 * h, 2 * w, c)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-6, rtol=1e-5
        )
