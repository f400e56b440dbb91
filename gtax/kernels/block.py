"""Fused DiT spatial-attention branch as one Pallas kernel.

Replaces the XLA op chain
    LN -> modulate -> qkv GEMM -> rope -> attention -> out GEMM -> gate -> +x
for one spatiotemporal block's spatial half with a single VMEM-resident
kernel. Profiling the XLA path on v5e showed ~45% of forward time in layout
copies and LN/modulate elementwise chains bouncing through HBM; here the
intermediates never leave VMEM:

  - per grid step the kernel processes one frame's 144-token tile;
  - rotate_half is a constant (d, d) signed-permutation MATMUL instead of
    sub-lane shuffles (the TPU-slow part of standard rope);
  - qkv (D x 3D) and out (D x D) weights are VMEM-resident across grid steps
    (~8 MB bf16);
  - LN statistics, softmax, and both GEMM accumulations run in fp32.

Inference path only (the training step keeps the XLA graph, which autodiff
handles); enabled via attention backend "pallas" + DiTConfig.fused_blocks or
directly through `fused_spatial_branch`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gtax.kernels.attention import _INTERPRET


def rotate_half_matrix(d: int) -> np.ndarray:
    """R such that x @ R == rotate_half(x) for interleaved pairs
    (gtax.core.rope.rotate_half)."""
    R = np.zeros((d, d), np.float32)
    for i in range(d // 2):
        R[2 * i + 1, 2 * i] = -1.0
        R[2 * i, 2 * i + 1] = 1.0
    return R


def _kernel(x_ref, shift_ref, scale_ref, gate_ref, qkvw_ref, outw_ref,
            outb_ref, cos_ref, sin_ref, rot_ref, o_ref, *, num_heads,
            ln_eps, mod_eps):
    x = x_ref[0]  # (S, D) bf16
    S, D = x.shape
    d = D // num_heads

    # LayerNorm (no affine) in fp32
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    ln = (x32 - mean) * jax.lax.rsqrt(var + ln_eps)

    # adaLN modulate (scale/shift per frame): x*(1+s+eps)+b
    scale = scale_ref[0, 0].astype(jnp.float32)
    shift = shift_ref[0, 0].astype(jnp.float32)
    mod = (ln * (1.0 + scale + mod_eps) + shift).astype(x.dtype)

    # fused qkv GEMM
    qkv = jnp.dot(mod, qkvw_ref[:], preferred_element_type=jnp.float32)
    q, k, v = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]

    # rope via signed-permutation matmul on per-head lane slices (Mosaic has
    # no lane-dim reshape, so heads are processed as 64-lane slices of D)
    cos = cos_ref[:]  # (S, d) fp32
    sin = sin_ref[:]
    R = rot_ref[:]    # (d, d) fp32

    scale_attn = 1.0 / (d**0.5)
    head_outs = []
    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        qs32, ks32 = q[:, sl], k[:, sl]
        qs = (qs32 * cos + jnp.dot(
            qs32, R, preferred_element_type=jnp.float32) * sin).astype(x.dtype)
        ks = (ks32 * cos + jnp.dot(
            ks32, R, preferred_element_type=jnp.float32) * sin).astype(x.dtype)
        vs = v[:, sl].astype(x.dtype)
        scores = jax.lax.dot_general(
            qs, ks, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale_attn
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        head_outs.append(
            jnp.dot(probs, vs, preferred_element_type=jnp.float32)
        )
    # heads are contiguous d-slices of D in (h, d) order
    attn_out = jnp.concatenate(head_outs, axis=-1).astype(x.dtype)

    # output projection + bias
    y = jnp.dot(attn_out, outw_ref[:], preferred_element_type=jnp.float32)
    y = y + outb_ref[0, 0].astype(jnp.float32)

    # gated residual
    g = gate_ref[0, 0].astype(jnp.float32)
    o_ref[0] = (x32 + g * y).astype(o_ref.dtype)


def _mlp_kernel(x_ref, shift_ref, scale_ref, gate_ref, w1_ref, b1_ref,
                w2_ref, b2_ref, o_ref, acc_ref, *, n_chunks, N, S,
                ln_eps, mod_eps, approx_gelu):
    """Fused LN -> modulate -> fc1 -> gelu -> fc2 -> gate -> residual over the
    FULL token batch per grid step; only the MLP hidden dim is chunked on the
    grid so each weight byte streams from HBM exactly once per call. LN and
    modulate are recomputed per chunk (cheap VPU work; a scratch copy would
    blow the VMEM budget); fc2 partials accumulate in fp32 scratch."""
    c = pl.program_id(0)
    x = x_ref[:]  # (N*S, D)

    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    ln = (x32 - mean) * jax.lax.rsqrt(var + ln_eps)
    scale = scale_ref[:].astype(jnp.float32)
    shift = shift_ref[:].astype(jnp.float32)
    mod = (ln * (1.0 + scale + mod_eps) + shift).astype(x.dtype)

    h = jnp.dot(mod, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[0].astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=approx_gelu).astype(x.dtype)
    partial = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)

    @pl.when(c == 0)
    def _():
        acc_ref[:] = partial

    @pl.when(c > 0)
    def _():
        acc_ref[:] = acc_ref[:] + partial

    @pl.when(c == n_chunks - 1)
    def _():
        y = acc_ref[:] + b2_ref[0].astype(jnp.float32)
        g = gate_ref[:].astype(jnp.float32)
        o_ref[:] = (x32 + g * y).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("approx_gelu",))
def fused_mlp_branch(x, shift, scale, gate, w1, b1, w2, b2,
                     approx_gelu=True):
    """x: (N, S, D); shift/scale/gate: (N, D); w1: (D, H); w2: (H, D).
    Returns x + gate * MLP(modulate(LN(x)))."""
    N, S, D = x.shape
    H = w1.shape[1]
    chunk = H
    while chunk * D * 2 * x.dtype.itemsize > 3 * 1024 * 1024 and chunk % 2 == 0:
        chunk //= 2
    n_chunks = H // chunk
    xf = x.reshape(N * S, D)
    # per-frame vectors pre-broadcast to token rows (XLA fuses this into the
    # producers; avoids unsupported in-kernel sublane repeats)
    expand = lambda v: jnp.repeat(v, S, axis=0)  # noqa: E731
    shift, scale, gate = expand(shift), expand(scale), expand(gate)
    b1 = b1.reshape(1, H)
    b2 = b2.reshape(1, D)
    out = pl.pallas_call(
        functools.partial(
            _mlp_kernel, n_chunks=n_chunks, N=N, S=S, ln_eps=1e-6,
            mod_eps=1e-6, approx_gelu=approx_gelu,
        ),
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((N * S, D), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # shift (N, D)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gate
            pl.BlockSpec((D, chunk), lambda c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, D), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda c: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N * S, D), lambda c: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((N * S, D), jnp.float32),  # fc2 accumulator
        ],
        interpret=_INTERPRET,
    )(xf, shift, scale, gate, w1, b1, w2, b2)
    return out.reshape(N, S, D)


@functools.partial(jax.jit, static_argnames=("num_heads",))
def fused_spatial_branch(x, shift, scale, gate, qkv_w, out_w, out_b,
                         rope_freqs, num_heads):
    """x: (N, S, D) per-frame token tiles; shift/scale/gate: (N, D);
    qkv_w: (D, 3D); out_w: (D, D); out_b: (D,);
    rope_freqs: (S, rot_dim) pixel-axial table (rot_dim == head_dim).
    Returns x + gate * SpatialAttention(modulate(LN(x))).
    """
    N, S, D = x.shape
    d = D // num_heads
    cos = jnp.cos(rope_freqs.astype(jnp.float32))
    sin = jnp.sin(rope_freqs.astype(jnp.float32))
    R = jnp.asarray(rotate_half_matrix(d))
    out_b = out_b.reshape(1, 1, -1)
    shift = shift.reshape(N, 1, D)
    scale = scale.reshape(N, 1, D)
    gate = gate.reshape(N, 1, D)
    grid = (N,)
    return pl.pallas_call(
        functools.partial(
            _kernel, num_heads=num_heads, ln_eps=1e-6, mod_eps=1e-6
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, S, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # per-frame vectors as (N,1,D), one (1,1,D) block per step —
            # dynamic sublane indexing is not provably aligned for Mosaic
            pl.BlockSpec((1, 1, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_INTERPRET,
    )(x, shift, scale, gate, qkv_w, out_w, out_b, cos, sin, R)
