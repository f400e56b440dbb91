"""Fused VAE block kernel (gtax.kernels.vae_block) vs the XLA path.

Same fp32-LN / fp32-softmax / fp32-accumulation contract as the XLA blocks;
fusion only reorders bf16 roundings, so fp32 inputs agree to tight
tolerance. Reference block: /root/reference/model/vae.py:115-157."""

import jax
import jax.numpy as jnp
import pytest

from gtax.models.vae import VAE_debug, vae_decode, vae_encode, vae_init
from tests.conftest import assert_close


@pytest.fixture(scope="module")
def vae():
    cfg = VAE_debug()
    params = jax.jit(lambda k: vae_init(k, cfg))(jax.random.PRNGKey(0))
    # xavier weights + zero biases leave biases untested; randomize them
    params = jax.tree.map(
        lambda l: l + 0.01 if l.ndim == 1 else l, params)
    return cfg, params


def test_fused_decode_matches_xla(vae):
    cfg, params = vae
    z = jax.random.normal(jax.random.PRNGKey(1), (3, cfg.seq_len,
                                                  cfg.latent_dim))
    ref = vae_decode(params, cfg, z, jnp.float32)
    got = vae_decode(params, cfg, z, jnp.float32, fused=True)
    assert_close(got, ref, atol=5e-4, rtol=1e-3)


def test_fused_encode_matches_xla(vae):
    cfg, params = vae
    x = jax.random.uniform(
        jax.random.PRNGKey(2), (2, 3, cfg.input_height, cfg.input_width),
        minval=-1.0, maxval=1.0)
    ref_mean, ref_lv = vae_encode(params, cfg, x, jnp.float32)
    got_mean, got_lv = vae_encode(params, cfg, x, jnp.float32, fused=True)
    assert_close(got_mean, ref_mean, atol=5e-4, rtol=1e-3)
    assert_close(got_lv, ref_lv, atol=5e-4, rtol=1e-3)


def test_fused_decode_matches_xla_bf16(vae):
    """bf16 compute: fusion keeps intermediates in fp32 where the XLA path
    rounds to bf16 between ops, so agreement is bf16-resolution."""
    cfg, params = vae
    z = jax.random.normal(jax.random.PRNGKey(3), (2, cfg.seq_len,
                                                  cfg.latent_dim))
    ref = vae_decode(params, cfg, z, jnp.bfloat16)
    got = vae_decode(params, cfg, z, jnp.bfloat16, fused=True)
    assert_close(got, ref, atol=5e-2, rtol=5e-2)
