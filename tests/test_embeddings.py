"""Unit tests for the sinusoidal fallback embeddings and the VAE posterior
object (spare API-parity components; reference model/embeddings.py and
model/vae.py:19-45)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from gtax.nn import embeddings as emb
from gtax.models.vae import DiagonalGaussian
from tests.conftest import assert_close


def reference_formula(timesteps, dim, flip, shift):
    """Closed-form re-derivation of the diffusers sinusoid for verification."""
    half = dim // 2
    exponent = -math.log(10000.0) * np.arange(half, dtype=np.float64)
    freqs = np.exp(exponent / (half - shift))
    args = np.asarray(timesteps, np.float64)[..., None] * freqs
    out = np.concatenate([np.sin(args), np.cos(args)], axis=-1)
    if flip:
        out = np.concatenate([out[..., half:], out[..., :half]], axis=-1)
    return out


def test_get_timestep_embedding_matches_formula():
    t = jnp.asarray([0.0, 1.0, 7.0, 999.0])
    for flip in (False, True):
        for shift in (0.0, 1.0):
            got = emb.get_timestep_embedding(
                t, 32, flip_sin_to_cos=flip, downscale_freq_shift=shift
            )
            want = reference_formula(np.asarray(t), 32, flip, shift)
            assert_close(got, want, atol=1e-4)


def test_positions_2d_split_half():
    out = emb.positions_2d_embedding(jnp.arange(3), jnp.arange(4), 16)
    assert out.shape == (3, 4, 16)
    # first half varies with H only, second half with W only
    np.testing.assert_allclose(
        np.asarray(out[:, 0, :8]), np.asarray(out[:, 3, :8]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out[0, :, 8:]), np.asarray(out[2, :, 8:]), atol=1e-6
    )
    # and each half genuinely VARIES along its own axis (a constant
    # embedding satisfies the invariance checks above trivially)
    assert not np.allclose(np.asarray(out[0, 0, :8]),
                           np.asarray(out[2, 0, :8]))
    assert not np.allclose(np.asarray(out[0, 0, 8:]),
                           np.asarray(out[0, 3, 8:]))


def test_fallback_pos_emb_shapes():
    key = jax.random.PRNGKey(0)
    params = emb.timestep_embedding_mlp_init(key, 16, 64, out_dim=16)
    te = emb.temporal_pos_emb_fallback(params, 5, 16)
    assert te.shape == (5, 16)
    se = emb.spatial_pos_emb_fallback(params, 3, 4, 16)
    assert se.shape == (3, 4, 16)


def test_diagonal_gaussian():
    mean = jnp.zeros((2, 4, 8))
    logvar = jnp.full((2, 4, 8), -2.0)
    post = DiagonalGaussian(mean=mean, logvar=logvar)
    assert_close(post.std, np.exp(-1.0) * np.ones((2, 4, 8)), atol=1e-6)
    assert_close(post.var, np.exp(-2.0) * np.ones((2, 4, 8)), atol=1e-6)
    assert (np.asarray(post.mode()) == 0).all()
    s = post.sample(jax.random.PRNGKey(0))
    assert np.abs(np.asarray(s)).mean() > 0.1  # actually stochastic
    det = DiagonalGaussian(mean=mean, logvar=logvar, deterministic=True)
    assert (np.asarray(det.sample(jax.random.PRNGKey(0))) == 0).all()
