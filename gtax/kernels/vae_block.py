"""Fused ViT-VAE block as one Pallas kernel (serving/decode acceleration).

One call = one encoder/decoder AttentionBlock (reference model/vae.py:115-157)
over all N frames: LN1(affine) -> qkv(+bias) -> partial pixel-axial rope ->
576-token attention -> out proj(+bias) -> +x -> LN2(affine) -> fc1 -> exact
GELU -> fc2 -> +x. Frames stream over the pallas grid (576 rows each) while
the block's ~25 MB of bf16 weights use constant index maps, so they are
DMA'd exactly once per call and stay VMEM-resident across the frame sweep.

Why: the XLA decode path ran at ~14% of bf16 peak (docs/vae_bench.json,
156 imgs/s at B=32) — per-op profiling shows roughly half the time in
elementwise/softmax chains bouncing through HBM (the fp32 (N, 16, 576, 576)
score tensor alone is 21 MB/frame of traffic each way) and the GEMMs
running at ~50% peak between them. In-VMEM fusion is the same recipe the
DiT block kernels used (gtax/kernels/block.py).

Precision contract matches the XLA path (gtax.nn.layers / gtax.nn.attention):
LN and softmax fp32; GEMMs take bf16 inputs with fp32 accumulation; rope in
fp32 on the first head_dim//2 dims of each head; residual adds in the
compute dtype. Equivalence is tolerance-tested (tests/test_vae_kernel.py) —
fusion reorders roundings, it does not change the math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gtax.kernels.attention import interpret_mode
from gtax.kernels.block import rotate_half_matrix

_VAE_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("arbitrary",),
    vmem_limit_bytes=100 * 1024 * 1024,
)


def _gelu_erf(x32):
    """Exact (erf) GELU for Mosaic, which has no erf/erfc lowering: erf via
    Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7 — over an order of
    magnitude below bf16 resolution, so this matches the XLA path's
    jax.nn.gelu(approximate=False) to working precision)."""
    z = x32 * 0.7071067811865476
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf = jnp.sign(z) * (1.0 - poly * jnp.exp(-az * az))
    return 0.5 * x32 * (1.0 + erf)


def _vae_block_kernel(x_ref, ln1w_ref, ln1b_ref, qkvw_ref, qkvb_ref,
                      outw_ref, outb_ref, ln2w_ref, ln2b_ref, w1_ref, b1_ref,
                      w2_ref, b2_ref, cos_ref, sin_ref, rot_ref, o_ref, *,
                      num_heads, ln_eps):
    x = x_ref[:]  # (S, D) one frame's tokens
    S, D = x.shape
    d = D // num_heads
    rot = rot_ref.shape[0]
    dtype = x.dtype
    # match gtax.nn.layers.matmul_precision: fp32 parity mode must not let
    # the MXU truncate inputs to one bf16 pass (production bf16 uses DEFAULT)
    prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def ln(v32, w_ref, b_ref):
        mean = jnp.mean(v32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(v32 - mean), axis=-1, keepdims=True)
        y = (v32 - mean) * jax.lax.rsqrt(var + ln_eps)
        return y * w_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)

    x32 = x.astype(jnp.float32)
    h = ln(x32, ln1w_ref, ln1b_ref).astype(dtype)
    qkv = jnp.dot(h, qkvw_ref[:], preferred_element_type=jnp.float32,
                  precision=prec)
    qkv = (qkv + qkvb_ref[0].astype(jnp.float32)).astype(dtype)
    q, k, v = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]

    cos, sin, R = cos_ref[:], sin_ref[:], rot_ref[:]
    scale_attn = 1.0 / (d**0.5)
    head_outs = []
    for hd in range(num_heads):
        sl = slice(hd * d, (hd + 1) * d)
        qs, ks = q[:, sl], k[:, sl]
        # partial rope: rotate the first `rot` dims in fp32, pass the rest
        qr32, kr32 = qs[:, :rot].astype(jnp.float32), ks[:, :rot].astype(
            jnp.float32)
        qr = (qr32 * cos + jnp.dot(
            qr32, R, preferred_element_type=jnp.float32) * sin).astype(dtype)
        kr = (kr32 * cos + jnp.dot(
            kr32, R, preferred_element_type=jnp.float32) * sin).astype(dtype)
        qs = jnp.concatenate([qr, qs[:, rot:]], axis=-1)
        ks = jnp.concatenate([kr, ks[:, rot:]], axis=-1)
        scores = jax.lax.dot_general(
            qs, ks, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ) * scale_attn
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
        head_outs.append(jnp.dot(
            probs, v[:, sl], preferred_element_type=jnp.float32,
            precision=prec,
        ).astype(dtype))
    attn_out = jnp.concatenate(head_outs, axis=-1)

    y = jnp.dot(attn_out, outw_ref[:], preferred_element_type=jnp.float32,
                precision=prec)
    y = (y + outb_ref[0].astype(jnp.float32)).astype(dtype)
    xm = x + y  # residual in the compute dtype (XLA path: h = h + attn(...))

    h2 = ln(xm.astype(jnp.float32), ln2w_ref, ln2b_ref).astype(dtype)
    hh = jnp.dot(h2, w1_ref[:], preferred_element_type=jnp.float32,
                 precision=prec)
    hh = (hh + b1_ref[0].astype(jnp.float32)).astype(dtype)
    hh = _gelu_erf(hh.astype(jnp.float32)).astype(dtype)
    y2 = jnp.dot(hh, w2_ref[:], preferred_element_type=jnp.float32,
                 precision=prec)
    y2 = (y2 + b2_ref[0].astype(jnp.float32)).astype(dtype)
    o_ref[:] = xm + y2


@functools.partial(jax.jit, static_argnames=("num_heads",))
def fused_vae_block(x, ln1_w, ln1_b, qkv_w, qkv_b, out_w, out_b, ln2_w,
                    ln2_b, w1, b1, w2, b2, rope_freqs, num_heads):
    """x: (N, S, D) tokens of N frames; rope_freqs: (S, rot) partial pixel
    table (rot = head_dim//2); weights in the compute dtype, biases fp32.
    Returns the block output, (N, S, D)."""
    N, S, D = x.shape
    rot = rope_freqs.shape[-1]
    cos = jnp.cos(rope_freqs.astype(jnp.float32))
    sin = jnp.sin(rope_freqs.astype(jnp.float32))
    R = jnp.asarray(rotate_half_matrix(rot))
    xf = x.reshape(N * S, D)
    row_spec = pl.BlockSpec((S, D), lambda n: (n, 0),
                            memory_space=pltpu.VMEM)

    def const(a):  # whole-array block, constant over the frame grid
        shape = a.shape
        return pl.BlockSpec(shape, lambda n: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    vecs = [v.reshape(1, -1) for v in
            (ln1_w, ln1_b, qkv_b, out_b, ln2_w, ln2_b, b1, b2)]
    (ln1_w, ln1_b, qkv_b, out_b, ln2_w, ln2_b, b1, b2) = vecs
    out = pl.pallas_call(
        functools.partial(_vae_block_kernel, num_heads=num_heads,
                          ln_eps=1e-6),
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        grid=(N,),
        in_specs=[
            row_spec,
            const(ln1_w), const(ln1_b),
            const(qkv_w), const(qkv_b),
            const(out_w), const(out_b),
            const(ln2_w), const(ln2_b),
            const(w1), const(b1), const(w2), const(b2),
            const(cos), const(sin), const(R),
        ],
        out_specs=row_spec,
        interpret=interpret_mode(),
        compiler_params=_VAE_PARAMS,
    )(xf, ln1_w, ln1_b, qkv_w, qkv_b, out_w, out_b, ln2_w, ln2_b, w1, b1,
      w2, b2, cos, sin, R)
    return out.reshape(N, S, D)
