"""Primitive layers as pure functions over parameter pytrees.

Conventions:
  - Parameters are stored float32 ("param dtype"); activations flow in a
    caller-chosen compute dtype (bfloat16 on TPU). Matmuls run with the MXU in
    the compute dtype and accumulate float32 (`preferred_element_type`),
    mirroring torch autocast semantics in the reference
    (/root/reference/train_dit.py:102-107).
  - Normalisation/softmax/rope/sinusoid math runs in float32 — the ops torch
    autocast keeps in fp32.
  - Linear kernels are stored (in_features, out_features) — i.e. transposed
    from the torch state_dict layout; gtax.io.safetensors_port handles the
    mapping.

Layer parity targets are cited per function.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def matmul_precision(compute_dtype):
    """MXU input precision matched to the compute dtype.

    JAX's DEFAULT precision truncates float32 matmul inputs (bf16 passes);
    that is correct for bf16 production compute but breaks float32 parity
    mode, so float32 compute forces HIGHEST.
    """
    return (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def linear(params, x, compute_dtype=jnp.bfloat16):
    """y = x @ kernel + bias. kernel: (in, out); bias optional.

    W8A8 serving params (gtax.models.dit.quantize_for_inference) carry
    "kernel_q" int8 kernels with per-output-channel "scale"; activations are
    dynamically quantized per row and the dot runs on the MXU's int8 path
    (2x bf16 rate on v5e) with fp32 rescale — the weight stays int8 in HBM,
    so streaming also halves."""
    if "kernel_q" in params:
        x32 = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
        sa = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
        q = jnp.round(x32 * (1.0 / sa)).astype(jnp.int8)
        acc = jax.lax.dot_general(
            q, params["kernel_q"],
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * sa * params["scale"]
        if "bias" in params:
            y = y + params["bias"].astype(jnp.float32)
        return y.astype(compute_dtype)
    kernel = params["kernel"].astype(compute_dtype)
    y = jnp.dot(
        x.astype(compute_dtype),
        kernel,
        preferred_element_type=jnp.float32,
        precision=matmul_precision(compute_dtype),
    )
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(compute_dtype)


def layer_norm(x, eps=1e-6, weight=None, bias=None, compute_dtype=None):
    """LayerNorm over the last dim in float32.

    weight/bias None reproduces torch `elementwise_affine=False`
    (reference model/dit.py:133,163). Output cast to compute_dtype
    (defaults to x.dtype).
    """
    out_dtype = compute_dtype if compute_dtype is not None else x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def gelu_tanh(x):
    """GELU with tanh approximation — DiT MLPs (reference model/dit.py:161)."""
    return jax.nn.gelu(x, approximate=True)


def gelu_exact(x):
    """Exact (erf) GELU — VAE MLPs use torch's default nn.GELU
    (reference model/vae.py:128)."""
    return jax.nn.gelu(x, approximate=False)


def mlp(params, x, act=gelu_tanh, compute_dtype=jnp.bfloat16):
    """fc1 -> act -> fc2, the timm `Mlp` shape consumed by the reference
    (model/dit.py:171-176, model/vae.py:147-152)."""
    h = linear(params["fc1"], x, compute_dtype)
    h = act(h)
    return linear(params["fc2"], h, compute_dtype)


def patchify_embed(params, x, patch_size: int, compute_dtype=jnp.bfloat16):
    """Patch embedding as a reshaped GEMM (TPU-native form of the reference's
    Conv2d with kernel=stride=patch, model/dit.py:38-76).

    x: (B, C, H, W) -> (B, H/p, W/p, D). The per-patch feature vector is
    flattened in (C, ph, pw) order to match the torch conv weight layout
    (D, C, p, p).reshape(D, -1); the port transposes that to our
    (C*p*p, D) kernel.
    """
    B, C, H, W = x.shape
    p = patch_size
    gh, gw = H // p, W // p
    x = x.reshape(B, C, gh, p, gw, p)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # (B, gh, gw, C, p, p)
    x = x.reshape(B, gh, gw, C * p * p)
    return linear(params, x, compute_dtype)


def timestep_embedding(t, dim: int, max_period: float = 10000.0):
    """Sinusoidal timestep features, cos-first ordering, float32.

    Parity: DiT TimestepEmbedder.timestep_embedding (model/dit.py:95-118) —
    note cat([cos, sin]), unlike the sin-first convention elsewhere.
    t: (...,) -> (..., dim).
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[..., None] * freqs
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[..., :1])], axis=-1)
    return emb


def timestep_embedder(params, t, freq_dim: int = 256, compute_dtype=jnp.bfloat16):
    """Sinusoid -> Linear -> SiLU -> Linear (reference model/dit.py:79-123)."""
    h = timestep_embedding(t, freq_dim)
    h = linear(params["fc1"], h, compute_dtype)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(compute_dtype)
    return linear(params["fc2"], h, compute_dtype)


def modulate(x, shift, scale):
    """adaLN FiLM: x * (1 + scale + 1e-6) + shift, with shift/scale of shape
    (..., D) broadcast over the token axes of x.

    The +1e-6 reproduces the reference's quirk (model/dit.py:26), which is
    load-bearing for bit-parity with shipped checkpoints.

    x: (B, T, *tokens, D); shift/scale: (B, T, D).
    """
    extra = x.ndim - shift.ndim
    shape = shift.shape[:-1] + (1,) * extra + shift.shape[-1:]
    shift = shift.reshape(shape)
    scale = scale.reshape(shape)
    return x * (1.0 + scale + 1e-6) + shift


def gate(x, g):
    """Gated residual branch: g broadcast over token axes (model/dit.py:30-35)."""
    extra = x.ndim - g.ndim
    shape = g.shape[:-1] + (1,) * extra + g.shape[-1:]
    return x * g.reshape(shape)


def adaln(params, c, n_chunks: int, compute_dtype=jnp.bfloat16):
    """SiLU -> Linear -> split into n_chunks along the feature dim.

    Parity: the reference's `nn.Sequential(SiLU, Linear(D, n*D))` adaLN heads
    (model/dit.py:137-139, 177-179, 196-198).
    """
    h = jax.nn.silu(c.astype(jnp.float32)).astype(compute_dtype)
    out = linear(params, h, compute_dtype)
    return jnp.split(out, n_chunks, axis=-1)
