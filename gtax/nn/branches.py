"""Flat-argument DiT branch functions: XLA reference implementations and
TRAINABLE fused wrappers.

The Pallas whole-branch megakernels (gtax.kernels.block) are forward-only —
pallas_call has no autodiff. Each trainable wrapper pairs the kernel forward
with an XLA-autodiff backward over a numerically-equivalent flat-argument XLA
implementation (jax.custom_vjp): the backward recomputes the branch forward
in XLA from the saved inputs and differentiates it — the flash-attention
recipe, and memory-wise the same recompute-from-boundary behaviour as
per-block remat.

This makes `attention_backend: fused` legal for TRAINING: the forward scan
runs the fused kernels (~2x faster than XLA at flagship size) while gradients
are bit-identical to XLA-backward-of-XLA-forward up to the fwd-activation
difference between the kernel and XLA paths (tested <= 5e-4 fp32).

Branch semantics parity target: SpatioTemporalDiTBlock
(/root/reference/model/dit.py:200-225).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gtax.core import rope
from gtax.nn.attention import _sdpa_heads_last
from gtax.nn.layers import (
    gate,
    gelu_tanh,
    layer_norm,
    matmul_precision,
    modulate,
)


def _linear(x, w, b, dtype):
    y = jnp.dot(
        x.astype(dtype), w.astype(dtype),
        preferred_element_type=jnp.float32,
        precision=matmul_precision(jnp.dtype(dtype)),
    )
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(dtype)


def xla_spatial_branch(x, shift, scale, g, qkv_w, out_w, out_b, rope_freqs,
                       num_heads, dtype):
    """x: (N, S, D) per-frame token tiles; shift/scale/g: (N, D);
    rope_freqs: (S, rot). Returns x + g * SpatialAttn(modulate(LN(x)))."""
    N, S, D = x.shape
    d = D // num_heads
    mod = modulate(layer_norm(x), shift, scale)
    qkv = _linear(mod, qkv_w, None, dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(N, S, num_heads, d)
    k = k.reshape(N, S, num_heads, d)
    v = v.reshape(N, S, num_heads, d)
    rf = rope_freqs[:, None, :]  # (S, 1, rot) broadcast over heads
    q = rope.apply_rotary_emb(rf, q)
    k = rope.apply_rotary_emb(rf, k)
    out = _sdpa_heads_last(q, k, v).reshape(N, S, D)
    out = _linear(out, out_w, out_b, dtype)
    return x + gate(out, g)


def xla_temporal_branch(x, shift, scale, g, qkv_w, out_w, out_b, rope_freqs,
                        valid, num_heads, n_frames, dtype):
    """x: (N = B*T, S, D) frame-major tiles; rope_freqs: (T, rot);
    valid: (T,) bool or None. Causal attention over T at each location."""
    N, S, D = x.shape
    T = n_frames
    B = N // T
    d = D // num_heads
    mod = modulate(layer_norm(x), shift, scale)
    qkv = _linear(mod, qkv_w, None, dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, T, S, num_heads, d)
    k = k.reshape(B, T, S, num_heads, d)
    v = v.reshape(B, T, S, num_heads, d)
    rf = rope_freqs[:, None, None, :]  # (T, 1, 1, rot)
    q = rope.apply_rotary_emb(rf, q)
    k = rope.apply_rotary_emb(rf, k)

    causal = jnp.tril(jnp.ones((T, T), dtype=bool))
    if valid is not None:
        key_ok = jnp.logical_or(valid[None, :], jnp.eye(T, dtype=bool))
        mask = jnp.logical_and(causal, key_ok)
    else:
        mask = causal
    precision = matmul_precision(jnp.dtype(dtype))
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
    out = out.reshape(N, S, D)
    out = _linear(out, out_w, out_b, dtype)
    return x + gate(out, g)


def xla_mlp_branch(x, shift, scale, g, w1, b1, w2, b2, dtype):
    """x + g * MLP(modulate(LN(x))) with tanh-GELU (reference dit.py:161)."""
    mod = modulate(layer_norm(x), shift, scale)
    h = _linear(mod, w1, b1, dtype)
    h = gelu_tanh(h)
    out = _linear(h, w2, b2, dtype)
    return x + gate(out, g)


# ------------------------------------------------- trainable fused wrappers


@functools.lru_cache(maxsize=None)
def trainable_spatial_branch(num_heads: int, dtype_name: str):
    dtype = jnp.dtype(dtype_name)
    from gtax.kernels.block import fused_spatial_branch

    def xla_fn(x, shift, scale, g, qkv_w, out_w, out_b, rope_freqs):
        return xla_spatial_branch(x, shift, scale, g, qkv_w, out_w, out_b,
                                  rope_freqs, num_heads, dtype)

    @jax.custom_vjp
    def f(x, shift, scale, g, qkv_w, out_w, out_b, rope_freqs):
        return fused_spatial_branch(x, shift, scale, g, qkv_w, out_w, out_b,
                                    rope_freqs, num_heads)

    def fwd(*args):
        return f(*args), args

    def bwd(res, ct):
        return jax.vjp(xla_fn, *res)[1](ct)

    f.defvjp(fwd, bwd)
    return f


@functools.lru_cache(maxsize=None)
def trainable_temporal_branch(num_heads: int, n_frames: int, has_valid: bool,
                              dtype_name: str):
    dtype = jnp.dtype(dtype_name)
    from gtax.kernels.block import fused_temporal_branch

    if has_valid:
        def xla_fn(x, shift, scale, g, qkv_w, out_w, out_b, rope_freqs,
                   valid):
            return xla_temporal_branch(x, shift, scale, g, qkv_w, out_w,
                                       out_b, rope_freqs, valid, num_heads,
                                       n_frames, dtype)

        @jax.custom_vjp
        def f(x, shift, scale, g, qkv_w, out_w, out_b, rope_freqs, valid):
            return fused_temporal_branch(x, shift, scale, g, qkv_w, out_w,
                                         out_b, rope_freqs, valid, num_heads,
                                         n_frames)
    else:
        def xla_fn(x, shift, scale, g, qkv_w, out_w, out_b, rope_freqs):
            return xla_temporal_branch(x, shift, scale, g, qkv_w, out_w,
                                       out_b, rope_freqs, None, num_heads,
                                       n_frames, dtype)

        @jax.custom_vjp
        def f(x, shift, scale, g, qkv_w, out_w, out_b, rope_freqs):
            return fused_temporal_branch(x, shift, scale, g, qkv_w, out_w,
                                         out_b, rope_freqs, None, num_heads,
                                         n_frames)

    def fwd(*args):
        return f(*args), args

    def bwd(res, ct):
        return jax.vjp(xla_fn, *res)[1](ct)

    f.defvjp(fwd, bwd)
    return f


@functools.lru_cache(maxsize=None)
def trainable_mlp_branch(dtype_name: str):
    dtype = jnp.dtype(dtype_name)
    from gtax.kernels.block import fused_mlp_branch

    def xla_fn(x, shift, scale, g, w1, b1, w2, b2):
        return xla_mlp_branch(x, shift, scale, g, w1, b1, w2, b2, dtype)

    @jax.custom_vjp
    def f(x, shift, scale, g, w1, b1, w2, b2):
        return fused_mlp_branch(x, shift, scale, g, w1, b1, w2, b2)

    def fwd(*args):
        return f(*args), args

    def bwd(res, ct):
        return jax.vjp(xla_fn, *res)[1](ct)

    f.defvjp(fwd, bwd)
    return f
