"""Axial attention for the spatiotemporal DiT and the ViT VAE.

Parity targets:
  - SpatialAxialAttention   /root/reference/model/attention.py:73-136
  - TemporalAxialAttention  /root/reference/model/attention.py:13-71
  - VAE Attention           /root/reference/model/vae.py:47-112

Design notes (TPU-first):
  - Sequences are tiny (T<=5, 144 or 576 spatial tokens), so attention here is
    a dense batched-GEMM problem, not a flash-tiling problem. QK^T and AV run
    on the MXU in the compute dtype with float32 accumulation; the softmax is
    float32 on the VPU.
  - The temporal path takes an optional per-slot validity mask so a fixed
    5-slot window (padded on the left) can serve every step of an
    autoregressive rollout under one jit compilation. RoPE is relative, so
    left-padding does not change attention among the valid frames.
  - A Pallas fused kernel (gtax.kernels.attention) can be swapped in via
    `set_backend("pallas")`; the XLA path is the reference semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gtax.core import rope

_BACKEND = "xla"


def set_backend(name: str) -> None:
    global _BACKEND
    assert name in ("xla", "pallas"), name
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


def sdpa(q, k, v, mask=None, causal=False):
    """Scaled dot-product attention over the second-to-last axis.

    q,k,v: (..., S, d). mask: broadcastable to (..., S, S), True = attend.
    Softmax in float32; matmuls accumulate float32. Matches
    torch.nn.functional.scaled_dot_product_attention semantics with
    scale = 1/sqrt(d).
    """
    if _BACKEND == "pallas":
        from gtax.kernels import attention as kattn

        out = kattn.fused_sdpa(q, k, v, mask=mask, causal=causal)
        if out is not None:
            return out
    from gtax.nn.layers import matmul_precision

    d = q.shape[-1]
    scale = 1.0 / (d**0.5)
    precision = matmul_precision(q.dtype)
    logits = (
        jnp.einsum(
            "...qd,...kd->...qk", q, k,
            preferred_element_type=jnp.float32, precision=precision,
        )
        * scale
    )
    S = q.shape[-2]
    if causal:
        causal_mask = jnp.tril(jnp.ones((S, S), dtype=bool))
        mask = causal_mask if mask is None else jnp.logical_and(mask, causal_mask)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.float32(-1e30))
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "...qk,...kd->...qd",
        probs.astype(q.dtype),
        v,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return out.astype(q.dtype)


def _split_heads(x, num_heads):
    """(..., S, h*d) -> (..., h, S, d)"""
    *lead, S, hd = x.shape
    d = hd // num_heads
    x = x.reshape(*lead, S, num_heads, d)
    return jnp.moveaxis(x, -2, -3)


def _merge_heads(x):
    """(..., h, S, d) -> (..., S, h*d)"""
    x = jnp.moveaxis(x, -3, -2)
    *lead, S, h, d = x.shape
    return x.reshape(*lead, S, h * d)


def spatial_axial_attention(
    params, x, rope_freqs, num_heads: int, compute_dtype=jnp.bfloat16
):
    """Full attention over each frame's HxW token grid independently.

    x: (B, T, H, W, D). rope_freqs: (H, W, rot_dim) pixel axial table applied
    to q/k before flattening the grid (reference model/attention.py:109-129).
    qkv has no bias; the output projection does (model/attention.py:86-87).
    """
    from gtax.nn.layers import linear

    B, T, H, W, D = x.shape
    qkv = linear(params["qkv"], x, compute_dtype)  # (B,T,H,W,3D)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads_grid(t):  # (B,T,H,W,D) -> (B,T,h,H,W,d)
        t = t.reshape(B, T, H, W, num_heads, D // num_heads)
        return t.transpose(0, 1, 4, 2, 3, 5)

    q, k, v = heads_grid(q), heads_grid(k), heads_grid(v)
    q = rope.apply_rotary_emb(rope_freqs, q)
    k = rope.apply_rotary_emb(rope_freqs, k)
    hw = H * W
    q = q.reshape(B, T, num_heads, hw, D // num_heads)
    k = k.reshape(B, T, num_heads, hw, D // num_heads)
    v = v.reshape(B, T, num_heads, hw, D // num_heads)
    out = sdpa(q, k, v)
    out = out.reshape(B, T, num_heads, H, W, D // num_heads)
    out = out.transpose(0, 1, 3, 4, 2, 5).reshape(B, T, H, W, D)
    return linear(params["out"], out, compute_dtype)


def temporal_axial_attention(
    params,
    x,
    rope_freqs,
    num_heads: int,
    valid=None,
    compute_dtype=jnp.bfloat16,
):
    """Causal attention over T at each spatial location independently.

    x: (B, T, H, W, D). rope_freqs: (T, rot_dim) 1-D table over slot positions
    (relative ==> equivalent to the reference's arange(T) positions even when
    the window is left-padded). `valid`: optional (T,) or (B, T) bool — False
    marks padding slots whose keys must be masked out; the diagonal stays
    enabled so padded queries (whose outputs are discarded) never softmax over
    an empty row. Reference: model/attention.py:41-71 with SDPA is_causal.
    """
    from gtax.nn.layers import linear

    B, T, H, W, D = x.shape
    qkv = linear(params["qkv"], x, compute_dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads_time(t):  # (B,T,H,W,D) -> (B,H,W,h,T,d)
        t = t.reshape(B, T, H, W, num_heads, D // num_heads)
        return t.transpose(0, 2, 3, 4, 1, 5)

    q, k, v = heads_time(q), heads_time(k), heads_time(v)
    q = rope.apply_rotary_emb(rope_freqs, q)
    k = rope.apply_rotary_emb(rope_freqs, k)

    mask = None
    if valid is not None:
        key_ok = valid[..., None, :]  # (..., 1, T)
        mask = jnp.logical_or(key_ok, jnp.eye(T, dtype=bool))
        if valid.ndim == 2:  # (B, T) -> (B, 1, 1, 1, T, T)
            mask = mask.reshape(B, 1, 1, 1, T, T)
    out = sdpa(q, k, v, mask=mask, causal=True)
    out = out.transpose(0, 4, 1, 2, 3, 5).reshape(B, T, H, W, D)
    return linear(params["out"], out, compute_dtype)


def vae_frame_attention(
    params, x, rope_freqs, num_heads: int, grid_hw, compute_dtype=jnp.bfloat16
):
    """Per-frame ViT self-attention with partial pixel-axial RoPE.

    x: (N, S, D) with S = H*W. rope_freqs: (H, W, rot_dim) where
    rot_dim = 2 * (head_dim//4) * 2 — only the first rot_dim head dims rotate,
    the rest pass through (reference model/vae.py:71-99). qkv and proj both
    carry biases (qkv_bias=True, model/vae.py:203).
    """
    from gtax.nn.layers import linear

    N, S, D = x.shape
    H, W = grid_hw
    qkv = linear(params["qkv"], x, compute_dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (_split_heads(t, num_heads) for t in (q, k, v))  # (N,h,S,d)
    d = D // num_heads
    q = rope.apply_rotary_emb(rope_freqs, q.reshape(N, num_heads, H, W, d))
    k = rope.apply_rotary_emb(rope_freqs, k.reshape(N, num_heads, H, W, d))
    q = q.reshape(N, num_heads, S, d)
    k = k.reshape(N, num_heads, S, d)
    out = sdpa(q, k, v)
    out = _merge_heads(out)
    return linear(params["out"], out, compute_dtype)
