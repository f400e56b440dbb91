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

import contextlib

import jax
import jax.numpy as jnp

from gtax.core import rope

_BACKEND = "xla"


def set_backend(name: str) -> None:
    """xla: reference-semantics einsum path. pallas: fused attention kernels.
    fused: whole-branch Pallas attention megakernels. fused_mlp: Pallas MLP
    branches only. fused_all: attention AND MLP branches fused (inference
    fast path)."""
    global _BACKEND
    assert name in ("xla", "pallas", "fused", "fused_mlp", "fused_all"), name
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


@contextlib.contextmanager
def backend_scope(name: str):
    """Set the backend for the duration of a block, then restore. The
    backend is consulted at TRACE time only, so holders of long-lived jitted
    callables (gtax.serving.VideoGenerator) wrap their compute calls in this
    scope instead of mutating the global once — two instances with different
    backends then can't corrupt each other's first-call traces."""
    global _BACKEND
    prev = _BACKEND
    set_backend(name)
    try:
        yield
    finally:
        _BACKEND = prev


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


def _sdpa_heads_last(q, k, v, mask=None, causal=False):
    """Attention with layout (..., S, h, d) — heads kept TRAILING so the
    surrounding reshapes are free (no materialised transposes; the profiler
    showed head-major transposes costing ~2.5ms/forward on v5e). The einsums
    carry the head axis as a dot_general batch dim and XLA assigns layouts
    inside the fused matmuls."""
    from gtax.nn.layers import matmul_precision

    d = q.shape[-1]
    S = q.shape[-3]
    scale = 1.0 / (d**0.5)
    precision = matmul_precision(q.dtype)
    logits = (
        jnp.einsum(
            "...qhd,...khd->...hqk", q, k,
            preferred_element_type=jnp.float32, precision=precision,
        )
        * scale
    )
    if causal:
        causal_mask = jnp.tril(jnp.ones((S, S), dtype=bool))
        mask = causal_mask if mask is None else jnp.logical_and(mask, causal_mask)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.float32(-1e30))
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "...hqk,...khd->...qhd",
        probs.astype(q.dtype),
        v,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return out.astype(q.dtype)


def spatial_axial_attention(
    params, x, rope_freqs, num_heads: int, compute_dtype=jnp.bfloat16
):
    """Full attention over each frame's HxW token grid independently.

    x: (B, T, H, W, D). rope_freqs: (H, W, rot_dim) pixel axial table applied
    to q/k before flattening the grid (reference model/attention.py:109-129).
    qkv has no bias; the output projection does (model/attention.py:86-87).
    Heads stay trailing end-to-end — only free reshapes around the einsums.
    """
    from gtax.nn.layers import linear

    B, T, H, W, D = x.shape
    d = D // num_heads
    qkv = linear(params["qkv"], x, compute_dtype)  # (B,T,H,W,3D)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    # (B,T,H,W,h,d): pure reshape; rope broadcasts over the head axis
    q = q.reshape(B, T, H, W, num_heads, d)
    k = k.reshape(B, T, H, W, num_heads, d)
    v = v.reshape(B, T, H, W, num_heads, d)
    rf = rope_freqs[:, :, None, :]  # (H, W, 1, rot)
    q = rope.apply_rotary_emb(rf, q)
    k = rope.apply_rotary_emb(rf, k)
    hw = H * W
    if get_backend() == "pallas":
        from gtax.kernels.attention import fused_mha_token_major

        out = fused_mha_token_major(
            q.reshape(B, T, hw, D), k.reshape(B, T, hw, D),
            v.reshape(B, T, hw, D), num_heads,
        )
        if out is None:
            out = _sdpa_heads_last(
                q.reshape(B, T, hw, num_heads, d),
                k.reshape(B, T, hw, num_heads, d),
                v.reshape(B, T, hw, num_heads, d),
            )
    else:
        out = _sdpa_heads_last(
            q.reshape(B, T, hw, num_heads, d),
            k.reshape(B, T, hw, num_heads, d),
            v.reshape(B, T, hw, num_heads, d),
        )
    out = out.reshape(B, T, H, W, D)
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

    Layout: T stays at axis 1 and heads trailing; attention runs as
    "bqshd,bkshd->bshqk" einsums so no activation transpose materialises.
    """
    from gtax.nn.layers import linear, matmul_precision

    B, T, H, W, D = x.shape
    d = D // num_heads
    S = H * W
    qkv = linear(params["qkv"], x, compute_dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, T, S, num_heads, d)
    k = k.reshape(B, T, S, num_heads, d)
    v = v.reshape(B, T, S, num_heads, d)
    # rope over the T axis (axis 1): freqs (T, rot) -> (T, 1, 1, rot)
    rf = rope_freqs[:, None, None, :]
    q = rope.apply_rotary_emb(rf, q)
    k = rope.apply_rotary_emb(rf, k)

    causal = jnp.tril(jnp.ones((T, T), dtype=bool))
    if valid is not None:
        key_ok = jnp.logical_or(valid[..., None, :], jnp.eye(T, dtype=bool))
        mask = jnp.logical_and(causal, key_ok)  # (T,T) or (B,T,T)
    else:
        mask = causal

    if get_backend() == "pallas" and mask.ndim == 2:
        # token-major kernel over (B, S, T, h*d): one cheap large-lane
        # transpose instead of per-head sub-lane transposes
        from gtax.kernels.attention import fused_mha_token_major

        qt = q.reshape(B, T, S, D).transpose(0, 2, 1, 3)
        kt = k.reshape(B, T, S, D).transpose(0, 2, 1, 3)
        vt = v.reshape(B, T, S, D).transpose(0, 2, 1, 3)
        out = fused_mha_token_major(qt, kt, vt, num_heads, mask=mask)
        if out is not None:
            out = out.transpose(0, 2, 1, 3).reshape(B, T, H, W, D)
            return linear(params["out"], out, compute_dtype)

    if mask.ndim == 3:
        mask = mask[:, None, None]  # (B,1,1,T,T)
    precision = matmul_precision(jnp.dtype(compute_dtype))
    logits = (
        jnp.einsum(
            "bqshd,bkshd->bshqk", q, k,
            preferred_element_type=jnp.float32, precision=precision,
        )
        * (1.0 / d**0.5)
    )
    logits = jnp.where(mask, logits, jnp.float32(-1e30))
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bshqk,bkshd->bqshd", probs.astype(q.dtype), v,
        preferred_element_type=jnp.float32, precision=precision,
    ).astype(q.dtype)
    out = out.reshape(B, T, H, W, D)
    return linear(params["out"], out, compute_dtype)


def vae_frame_attention(
    params, x, rope_freqs, num_heads: int, grid_hw, compute_dtype=jnp.bfloat16
):
    """Per-frame ViT self-attention with partial pixel-axial RoPE.

    x: (N, S, D) with S = H*W. rope_freqs: (H, W, rot_dim) where
    rot_dim = 2 axes * 2 * (head_dim//8 freqs) = head_dim//2 — only the
    first rot_dim head dims rotate, the rest pass through (the reference's
    RotaryEmbedding(dim=head_dim//4), model/vae.py:71-99). qkv and proj both
    carry biases (qkv_bias=True, model/vae.py:203). Heads-last layout: free
    reshapes only.
    """
    from gtax.nn.layers import linear

    N, S, D = x.shape
    H, W = grid_hw
    d = D // num_heads
    qkv = linear(params["qkv"], x, compute_dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(N, H, W, num_heads, d)
    k = k.reshape(N, H, W, num_heads, d)
    v = v.reshape(N, S, num_heads, d)
    rf = rope_freqs[:, :, None, :]
    q = rope.apply_rotary_emb(rf, q)
    k = rope.apply_rotary_emb(rf, k)
    if get_backend() == "pallas":
        from gtax.kernels.attention import fused_mha_token_major

        out = fused_mha_token_major(
            q.reshape(N, S, D), k.reshape(N, S, D), v.reshape(N, S, D),
            num_heads,
        )
        if out is not None:
            return linear(params["out"], out, compute_dtype)
    out = _sdpa_heads_last(
        q.reshape(N, S, num_heads, d), k.reshape(N, S, num_heads, d), v
    )
    out = out.reshape(N, S, D)
    return linear(params["out"], out, compute_dtype)
