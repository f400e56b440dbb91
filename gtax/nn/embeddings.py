"""Sinusoidal position-embedding utilities (attention fallback path).

Parity target: /root/reference/model/embeddings.py — `get_timestep_embedding`
with flip_sin_to_cos (diffusers convention: sin-first, optionally flipped),
`Timesteps`, `Positions2d` (split-half H/W sinusoids), and the diffusers
`TimestepEmbedding` MLP (Linear -> SiLU -> Linear).

These feed the learned absolute-position fallback the reference's attention
layers use when constructed WITHOUT rotary embeddings
(model/attention.py:31-38, 90-97). The shipped configs always pass rotary, so
this path is functionally a spare — implemented for full API parity.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from gtax.nn.layers import linear


def get_timestep_embedding(
    timesteps: jnp.ndarray,
    embedding_dim: int,
    flip_sin_to_cos: bool = False,
    downscale_freq_shift: float = 1.0,
    scale: float = 1.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """DDPM-style sinusoid, sin-first then optionally flipped
    (reference model/embeddings.py:64-103). timesteps: (...,) -> (..., dim)."""
    half = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[..., None] * freqs * scale
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[..., half:], emb[..., :half]], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return emb


def timesteps_embedding(positions: jnp.ndarray, num_channels: int) -> jnp.ndarray:
    """`Timesteps` module equivalent: flip_sin_to_cos=True, shift=0
    (reference model/embeddings.py:14-33)."""
    return get_timestep_embedding(
        positions, num_channels, flip_sin_to_cos=True, downscale_freq_shift=0.0
    )


def positions_2d_embedding(grid_h, grid_w, num_channels: int) -> jnp.ndarray:
    """`Positions2d` equivalent: half-channels for H sinusoid, half for W,
    concatenated (reference model/embeddings.py:35-61). Returns (H, W, C)."""
    hh, ww = jnp.meshgrid(grid_h, grid_w, indexing="ij")
    h_emb = timesteps_embedding(hh, num_channels // 2)
    w_emb = timesteps_embedding(ww, num_channels // 2)
    return jnp.concatenate([h_emb, w_emb], axis=-1)


def timestep_embedding_mlp_init(key, in_channels: int, time_embed_dim: int,
                                out_dim: int | None = None):
    """Params for the diffusers `TimestepEmbedding` MLP:
    Linear(in, hidden) -> SiLU -> Linear(hidden, out)."""
    out_dim = out_dim or time_embed_dim
    k1, k2 = jax.random.split(key)

    def lin(k, din, dout):
        scale = 1.0 / (din**0.5)
        return {
            "kernel": jax.random.uniform(k, (din, dout), jnp.float32,
                                         -scale, scale),
            "bias": jnp.zeros((dout,), jnp.float32),
        }

    return {"fc1": lin(k1, in_channels, time_embed_dim),
            "fc2": lin(k2, time_embed_dim, out_dim)}


def timestep_embedding_mlp(params, x, compute_dtype=jnp.float32):
    h = linear(params["fc1"], x, compute_dtype)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(compute_dtype)
    return linear(params["fc2"], h, compute_dtype)


def temporal_pos_emb_fallback(params, T: int, dim: int, compute_dtype=jnp.float32):
    """Learned temporal position embedding used when temporal attention has no
    rotary (reference model/attention.py:31-38, 44-48). Returns (T, dim)."""
    sin = timesteps_embedding(jnp.arange(T), dim)
    return timestep_embedding_mlp(params, sin, compute_dtype)


def spatial_pos_emb_fallback(params, H: int, W: int, dim: int,
                             compute_dtype=jnp.float32):
    """Learned 2-D position embedding used when spatial attention has no
    rotary (reference model/attention.py:90-97, 102-107). Returns (H, W, dim)."""
    sin = positions_2d_embedding(jnp.arange(H), jnp.arange(W), dim)
    return timestep_embedding_mlp(params, sin, compute_dtype)
