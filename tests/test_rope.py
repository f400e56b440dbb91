"""Golden-value parity of rotary embeddings against the vendored lucidrains
implementation in the reference."""

import jax
import jax.numpy as jnp
import numpy as np

from gtax.core import rope
from tests.conftest import assert_close


def test_lang_freqs(golden):
    g = golden("rope.npz")
    assert_close(rope.lang_freqs(64), g["temporal_freqs"], atol=1e-7)


def test_pixel_freqs(golden):
    g = golden("rope.npz")
    assert_close(rope.pixel_freqs(32, 256.0), g["spatial_freqs_param"], atol=1e-4)


def test_temporal_rotation(golden):
    g = golden("rope.npz")
    freqs = rope.temporal_rope_freqs(jnp.arange(5), rope.lang_freqs(64))
    out = rope.apply_rotary_emb(freqs, jnp.asarray(g["temporal_in"]))
    assert_close(out, g["temporal_out"], atol=1e-5)


def test_spatial_axial_freqs_and_rotation(golden):
    g = golden("rope.npz")
    freqs = rope.axial_freqs(rope.pixel_freqs(32, 256.0), (9, 16), pixel=True)
    assert_close(freqs, g["spatial_axial_freqs"], atol=2e-3, rtol=1e-5)
    out = rope.apply_rotary_emb(jnp.asarray(g["spatial_axial_freqs"]),
                                jnp.asarray(g["spatial_in"]))
    assert_close(out, g["spatial_out"], atol=1e-5)


def test_vae_partial_rotation(golden):
    g = golden("rope.npz")
    freqs = rope.axial_freqs(rope.pixel_freqs(16, 48.0), (6, 8), pixel=True)
    assert_close(freqs, g["vae_axial_freqs"], atol=1e-4, rtol=1e-5)
    out = rope.apply_rotary_emb(freqs, jnp.asarray(g["vae_in"]))
    # fp32 sin/cos of args up to ~150*pi: transcendental noise
    assert_close(out, g["vae_out"], atol=2e-4)
    # partial rotation: trailing head dims pass through untouched
    rot_dim = freqs.shape[-1]
    np.testing.assert_array_equal(
        np.asarray(out)[..., rot_dim:], g["vae_in"][..., rot_dim:]
    )


def test_rope_is_relative():
    """Left-padding shifts absolute positions; attention scores must not move.
    This property justifies the fixed padded rollout window."""
    freqs = rope.lang_freqs(16)
    q = jnp.array(np.random.default_rng(0).normal(size=(2, 3, 16)), jnp.float32)
    k = jnp.array(np.random.default_rng(1).normal(size=(2, 3, 16)), jnp.float32)
    f0 = rope.temporal_rope_freqs(jnp.arange(3), freqs)
    f2 = rope.temporal_rope_freqs(jnp.arange(2, 5), freqs)
    hi = jax.lax.Precision.HIGHEST
    s0 = jnp.einsum("bqd,bkd->bqk", rope.apply_rotary_emb(f0, q),
                    rope.apply_rotary_emb(f0, k), precision=hi)
    s2 = jnp.einsum("bqd,bkd->bqk", rope.apply_rotary_emb(f2, q),
                    rope.apply_rotary_emb(f2, k), precision=hi)
    assert_close(s0, s2, atol=1e-4)
    # guard against the trivial pass: a no-op rotary is also
    # "shift-invariant" — rotated scores must differ from unrotated ones
    s_plain = jnp.einsum("bqd,bkd->bqk", q, k, precision=hi)
    assert not np.allclose(np.asarray(s0), np.asarray(s_plain))
