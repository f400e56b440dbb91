"""Pallas fused attention kernel for the framework's three attention shapes.

Replaces the CUDA fused-attention capability the reference consumes through
torch SDPA (/root/reference/model/attention.py:62,127, model/vae.py:101-107;
SURVEY.md §2.4). The sequences here are tiny by flash-attention standards —
temporal T<=5, spatial 144 tokens, VAE 576 tokens — so the win is keeping the
whole score matrix in VMEM and fusing QK^T -> mask -> softmax -> AV into one
kernel with zero HBM round-trips for intermediates, not flash-style tiling
(SURVEY.md §7 step 7).

The kernel processes BLOCK_N attention rows (flattened batch x heads) per grid
step; BLOCK_N is chosen per sequence length to keep the fp32 score tile under
the VMEM budget. Causal/validity masking arrives as a precomputed additive
(S, S) bias so one kernel serves all three patterns.

`fused_sdpa` returns None for patterns the kernel doesn't cover (per-batch
masks); callers fall back to the XLA path, which is semantics-identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = None  # None = auto (interpret iff default backend is CPU)


def set_interpret(value: bool | None) -> None:
    """Pin Pallas interpret mode (tests) or None = auto. The flag is read at
    TRACE time, so flipping it must invalidate every cached executable —
    otherwise a warm jit silently keeps running the old mode."""
    global _INTERPRET
    value = value if value is None else bool(value)
    if value != _INTERPRET:
        _INTERPRET = value
        jax.clear_caches()


def interpret_mode() -> bool:
    """Pallas kernels are Mosaic-lowered (TPU only); on CPU they must run in
    interpret mode. Auto-detect so `attention_backend: fused` configs work
    everywhere; tests pin via set_interpret."""
    if _INTERPRET is None:
        return jax.default_backend() == "cpu"
    return _INTERPRET


def _block_rows(S: int, d: int, dtype_bytes: int = 2) -> int:
    """Rows per grid step such that q/k/v tiles + the fp32 score tile stay
    well under the ~16MB VMEM budget."""
    per_row = 3 * S * d * dtype_bytes + S * S * 4 + S * d * dtype_bytes
    budget = 8 * 1024 * 1024
    return max(1, min(256, budget // per_row))


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    q = q_ref[:]
    scores = jax.lax.dot_general(
        q, k_ref[:], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    scores = scores + bias_ref[:][None, :, :]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
    out = jax.lax.dot_general(
        probs, v_ref[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = out.astype(o_ref.dtype)


@jax.jit
def _fused_sdpa_flat(q, k, v, bias):
    """q, k, v: (N, S, d); bias: (S, S) additive fp32 (causality/masking
    pre-baked by _build_bias). Returns (N, S, d)."""
    N, S, d = q.shape
    bn = _block_rows(S, d, q.dtype.itemsize)
    n_pad = (-N) % bn
    if n_pad:
        pad = [(0, n_pad), (0, 0), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    grid = (q.shape[0] // bn,)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=1.0 / (d**0.5)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, S, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, S, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, S, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, S, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret_mode(),
    )(q, k, v, bias)
    return out[:N] if n_pad else out


def _build_bias(S: int, mask, causal: bool) -> jnp.ndarray:
    """Additive (S, S) fp32 bias from causal flag + optional (S,)/(S,S) mask
    (True = attend). Mirrors gtax.nn.attention.sdpa mask semantics exactly:
    a 1-D mask broadcasts as key validity over every query row (callers that
    want the open diagonal for padded temporal queries pass the (S, S)
    `valid | eye` mask they build — gtax/nn/attention.py:240)."""
    if causal:
        causal_m = jnp.tril(jnp.ones((S, S), dtype=bool))
    else:
        causal_m = jnp.ones((S, S), dtype=bool)
    if mask is not None:
        mask = jnp.asarray(mask)
        if mask.ndim == 1:  # key-validity vector, same rule for every row
            mask = jnp.broadcast_to(mask[None, :], (S, S))
        full = jnp.logical_and(causal_m, mask)
    else:
        full = causal_m
    return jnp.where(full, 0.0, -1e30).astype(jnp.float32)


def fused_sdpa(q, k, v, mask=None, causal=False):
    """Drop-in for gtax.nn.attention.sdpa on supported patterns.

    q/k/v: (..., S, d). mask: None, (S,) validity, or (S, S) boolean. Returns
    None (caller falls back to XLA) when the mask carries batch dimensions.
    """
    S, d = q.shape[-2], q.shape[-1]
    if mask is not None:
        mask = jnp.asarray(mask)
        if mask.ndim > 2:
            return None  # per-batch masks -> XLA fallback
        if mask.ndim == 2 and mask.shape != (S, S):
            return None
    lead = q.shape[:-2]
    qf = q.reshape(-1, S, d)
    kf = k.reshape(-1, S, d)
    vf = v.reshape(-1, S, d)
    bias = _build_bias(S, mask, causal)
    out = _fused_sdpa_flat(qf, kf, vf, bias)
    return out.reshape(*lead, S, d)


# --------------------------------------------------- token-major MHA kernel

def _mha_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, num_heads, scale):
    """Multi-head attention on TOKEN-MAJOR (BN, S, h*d) tiles.

    The head split happens on VMEM-resident data, so the (S, h) transposes
    that cost ~2.6ms/forward in HBM on the XLA path (profiled on v5e: d=64
    sub-lane transposes run at ~11GB/s) never touch HBM at all.
    """
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    BN, S, HD = q.shape
    d = HD // num_heads
    bias = bias_ref[:]
    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        qh, kh, vh = q[:, :, sl], k[:, :, sl], v[:, :, sl]
        scores = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        scores = scores + bias[None, :, :]
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
        o_ref[:, :, sl] = jax.lax.dot_general(
            probs, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads",))
def _mha_token_major_flat(q, k, v, bias, num_heads):
    """q,k,v: (N, S, h*d) token-major; bias (S, S) additive fp32
    (causality/masking pre-baked by _build_bias). Returns (N, S, h*d)."""
    N, S, HD = q.shape
    d = HD // num_heads
    # VMEM: 4 tensors of BN*S*HD*2B + BN fp32 scores S*S*4
    per_row = 4 * S * HD * q.dtype.itemsize + S * S * 4
    bn = max(1, min(128, (8 * 1024 * 1024) // per_row))
    n_pad = (-N) % bn
    if n_pad:
        pad = [(0, n_pad), (0, 0), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    grid = (q.shape[0] // bn,)
    out = pl.pallas_call(
        functools.partial(
            _mha_kernel, num_heads=num_heads, scale=1.0 / (d**0.5)
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, S, HD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, S, HD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, S, HD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, S, HD), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret_mode(),
    )(q, k, v, bias)
    return out[:N] if n_pad else out


def fused_mha_token_major(q, k, v, num_heads, mask=None, causal=False):
    """Multi-head attention over token-major (..., S, h*d) tensors.

    Equivalent to splitting the last dim into (h, d) heads and attending per
    head over axis -2; the split never leaves VMEM. mask: None, (S,) validity,
    or (S, S) boolean; returns None for unsupported patterns (caller falls
    back to XLA).
    """
    S, HD = q.shape[-2], q.shape[-1]
    if mask is not None:
        mask = jnp.asarray(mask)
        if mask.ndim > 2 or (mask.ndim == 2 and mask.shape != (S, S)):
            return None
    lead = q.shape[:-2]
    bias = _build_bias(S, mask, causal)
    out = _mha_token_major_flat(
        q.reshape(-1, S, HD), k.reshape(-1, S, HD), v.reshape(-1, S, HD),
        bias, num_heads,
    )
    return out.reshape(*lead, S, HD)
