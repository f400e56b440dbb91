"""Paired int8 serving kernels: one Pallas dispatch per (attention branch +
MLP branch) half-block instead of two.

Why: at incremental-serving shapes the per-call cost of the int8 branch
kernels is dominated by a FIXED overhead (dispatch + weight-DMA rampup +
VPU preamble), not the MXU GEMMs — scripts/kernel_bench.py measures the
fused_*_q kernels at 80-130 us/call against int8-GEMM floors of 3-50 us
across B=1..8. A denoise step dispatches 64 branch kernels (16 blocks x
{s_attn, s_mlp, t_attn, t_mlp}); pairing each block's attention with its
following MLP halves that to 32, paying the fixed cost half as often
(VERDICT r2 #6; batched-scaling #2 benefits identically since the fixed
cost is batch-independent).

Semantics: bit-identical to running gtax.kernels.quant's branch kernels
back-to-back — the attention result is cast to the compute dtype into a
VMEM scratch exactly where the sequential pair crossed HBM, and the MLP
half reuses the same _mlp_kernel_q chunk math (same fp32 contract, same
per-row dynamic int8). tests/test_pair.py asserts equality.

Structure: the MLP's hidden-dim chunks iterate on the LAST grid axis (the
weight-DMA pipelining trick from quant._mlp_kernel_q); the attention branch
runs under pl.when(chunk == 0), so chunk 1's weight slabs prefetch DURING
the attention compute. The attention weights use constant index maps and
stream exactly once per call.

Reference semantics target: SpatioTemporalDiTBlock
(/root/reference/model/dit.py:200-225) — one spatial pair + one temporal
pair = one reference block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gtax.kernels.attention import interpret_mode
from gtax.kernels.block import (
    _frames_per_tile,
    _ln_modulate32,
    _pad_frame_rows,
    _rows_from_frames,
    _spatial_attention_core,
    _temporal_step_core,
    rotate_half_matrix,
    temporal_preamble,
)
from gtax.kernels.quant import _mlp_chunks, _qdot, _quant_rows


def _pair_chunks(h: int) -> int:
    '''Hidden-dim chunk count for the pair kernels (env-overridable for
    experiments: GTAX_PAIR_CHUNKS).'''
    import os

    env = os.environ.get("GTAX_PAIR_CHUNKS")
    if env:
        return int(env)
    return _mlp_chunks(h)

# attention intermediates (fp32 qkv slabs) grow the Mosaic stack well past
# the branch kernels' 64 MB budget at paired working sets; v5e has 128 MB
_PAIR_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("arbitrary", "arbitrary"),
    vmem_limit_bytes=100 * 1024 * 1024,
)


def _attn_into_mlp(xm, sh2_ref, sc2_ref, qmod_ref, qs_ref, acc_ref,
                   xmid_ref, ln_eps, mod_eps, seq_len):
    """Store the attention half's output and precompute the MLP half's
    LN/modulate/quantize into scratch (chunk-0 prologue)."""
    xmid_ref[:] = xm
    _, mod2 = _ln_modulate32(xm, sh2_ref, sc2_ref, ln_eps, mod_eps, seq_len)
    q2, s2 = _quant_rows(mod2)
    qmod_ref[:] = q2
    qs_ref[:] = s2
    acc_ref[:] = jnp.zeros_like(acc_ref)


def _mlp_chunk(qmod_ref, qs_ref, acc_ref, w1q_ref, w1s_ref, b1_ref,
               w2q_ref, approx_gelu):
    """One hidden-dim chunk of the int8 MLP (same math as
    quant._mlp_kernel_q's per-chunk body)."""
    acc1 = jax.lax.dot_general(
        qmod_ref[:], w1q_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    h = (acc1.astype(jnp.float32) * qs_ref[:] * w1s_ref[:]
         + b1_ref[0].astype(jnp.float32))
    # same gelu + dynamic-requant epilogue as quant._mlp_kernel_q so the
    # paired (B<=2) and sequential (B>2) MLP paths can never drift
    h = jax.nn.gelu(h, approximate=approx_gelu)
    hq, hs = _quant_rows(h)
    part = jax.lax.dot_general(
        hq, w2q_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc_ref[:] += part.astype(jnp.float32) * hs


def _mlp_epilogue(xmid_ref, g2_ref, acc_ref, w2s_ref, b2_ref, o_ref,
                  seq_len):
    x32 = xmid_ref[:].astype(jnp.float32)
    y = acc_ref[:] * w2s_ref[:] + b2_ref[0].astype(jnp.float32)
    g = _rows_from_frames(g2_ref[:].astype(jnp.float32), seq_len,
                          x32.shape[0])
    o_ref[:] = (x32 + g * y).astype(o_ref.dtype)


def _spatial_pair_kernel_q(x_ref, sh1_ref, sc1_ref, g1_ref, sh2_ref, sc2_ref,
                           g2_ref, qkvq_ref, qkvs_ref, outq_ref, outs_ref,
                           outb_ref, w1q_ref, w1s_ref, b1_ref, w2q_ref,
                           w2s_ref, b2_ref, cos_ref, sin_ref, rot_ref, o_ref,
                           qmod_ref, qs_ref, acc_ref, xmid_ref, *, num_heads,
                           n_frames, seq_len, ln_eps, mod_eps, approx_gelu,
                           n_chunks):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        x = x_ref[:]
        D = x.shape[-1]
        x32, mod = _ln_modulate32(x_ref, sh1_ref, sc1_ref, ln_eps, mod_eps,
                                  seq_len)
        qkv = _qdot(mod, qkvq_ref, qkvs_ref)
        q, k, v = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]
        attn_out = _spatial_attention_core(
            q, k, v, cos_ref[:], sin_ref[:], rot_ref[:], x.dtype, num_heads,
            n_frames, seq_len,
        )
        y = _qdot(attn_out, outq_ref, outs_ref)
        y = y + outb_ref[0].astype(jnp.float32)
        g = _rows_from_frames(g1_ref[:].astype(jnp.float32), seq_len,
                              x32.shape[0])
        xm = (x32 + g * y).astype(x.dtype)  # the sequential kernels' seam
        _attn_into_mlp(xm, sh2_ref, sc2_ref, qmod_ref, qs_ref, acc_ref,
                       xmid_ref, ln_eps, mod_eps, seq_len)

    _mlp_chunk(qmod_ref, qs_ref, acc_ref, w1q_ref, w1s_ref, b1_ref, w2q_ref,
               approx_gelu)

    @pl.when(c == n_chunks - 1)
    def _():
        _mlp_epilogue(xmid_ref, g2_ref, acc_ref, w2s_ref, b2_ref, o_ref,
                      seq_len)


def _temporal_pair_kernel_q(x_ref, sh1_ref, sc1_ref, g1_ref, sh2_ref,
                            sc2_ref, g2_ref, qkvq_ref, qkvs_ref, outq_ref,
                            outs_ref, outb_ref, w1q_ref, w1s_ref, b1_ref,
                            w2q_ref, w2s_ref, b2_ref, kctx_ref, vctx_ref,
                            cos_ref, sin_ref, rot_ref, seg_ref, bias_ref,
                            o_ref, qmod_ref, qs_ref, acc_ref, xmid_ref, *,
                            num_heads, n_ctx, n_batches, seq_len, ln_eps,
                            mod_eps, approx_gelu, n_chunks, n_live):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        x = x_ref[:]
        D = x.shape[-1]
        x32, mod = _ln_modulate32(x_ref, sh1_ref, sc1_ref, ln_eps, mod_eps,
                                  seq_len)
        qkv = _qdot(mod, qkvq_ref, qkvs_ref)
        q, k, v = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]
        attn_out = _temporal_step_core(
            q, k, v, kctx_ref[:], vctx_ref[:],
            _rows_from_frames(cos_ref[:], seq_len, x32.shape[0]),
            _rows_from_frames(sin_ref[:], seq_len, x32.shape[0]),
            rot_ref[:], seg_ref[:], bias_ref, x.dtype, num_heads, n_ctx,
            n_batches, seq_len, n_live=n_live,
        )
        y = _qdot(attn_out, outq_ref, outs_ref)
        y = y + outb_ref[0].astype(jnp.float32)
        g = _rows_from_frames(g1_ref[:].astype(jnp.float32), seq_len,
                              x32.shape[0])
        xm = (x32 + g * y).astype(x.dtype)
        _attn_into_mlp(xm, sh2_ref, sc2_ref, qmod_ref, qs_ref, acc_ref,
                       xmid_ref, ln_eps, mod_eps, seq_len)

    _mlp_chunk(qmod_ref, qs_ref, acc_ref, w1q_ref, w1s_ref, b1_ref, w2q_ref,
               approx_gelu)

    @pl.when(c == n_chunks - 1)
    def _():
        _mlp_epilogue(xmid_ref, g2_ref, acc_ref, w2s_ref, b2_ref, o_ref,
                      seq_len)


@functools.partial(jax.jit, static_argnames=("num_heads", "approx_gelu"))
def fused_spatial_pair_q(x, sh1, sc1, g1, sh2, sc2, g2, qkv_q, qkv_s, out_q,
                         out_s, out_b, w1_q, w1_s, b1, w2_q, w2_s, b2,
                         rope_freqs, num_heads, approx_gelu=True):
    """Spatial attention branch + spatial MLP branch as ONE kernel call.
    Equals fused_spatial_branch_q followed by fused_mlp_branch_q."""
    N, S, D = x.shape
    H = w1_q.shape[1]
    d = D // num_heads
    # same 768-row tile budget as the branch kernels: a bigger tile would
    # stream weights once per call, but the attention core's per-(head,
    # frame) unroll grows with the tile and 8 frames/tile blew Mosaic
    # compile time past 10 min at flagship size (4/tile compiles in ~1 min)
    fpt = _frames_per_tile(N, S)
    n_tiles = N // fpt
    tile_rows = fpt * S
    nc = _pair_chunks(H)
    hc = H // nc
    cos = jnp.tile(jnp.cos(rope_freqs.astype(jnp.float32)), (N, 1))
    sin = jnp.tile(jnp.sin(rope_freqs.astype(jnp.float32)), (N, 1))
    R = jnp.asarray(rotate_half_matrix(d))
    xf = x.reshape(N * S, D)
    rot = rope_freqs.shape[-1]
    row_spec = pl.BlockSpec((tile_rows, D), lambda t, c: (t, 0),
                            memory_space=pltpu.VMEM)
    (sh1, sc1, g1, sh2, sc2, g2), fpt_pad = _pad_frame_rows(
        (sh1, sc1, g1, sh2, sc2, g2), fpt, n_tiles)
    frame_spec = pl.BlockSpec((fpt_pad, D), lambda t, c: (t, 0),
                              memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    rope_spec = pl.BlockSpec((tile_rows, rot), lambda t, c: (t, 0),
                             memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(
            _spatial_pair_kernel_q, num_heads=num_heads, n_frames=fpt,
            seq_len=S, ln_eps=1e-6, mod_eps=1e-6, approx_gelu=approx_gelu,
            n_chunks=nc,
        ),
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        grid=(n_tiles, nc),
        in_specs=[
            row_spec,                                  # x
            frame_spec, frame_spec, frame_spec,        # sh1, sc1, g1
            frame_spec, frame_spec, frame_spec,        # sh2, sc2, g2
            full, full, full, full, full,              # qkv_q/s, out_q/s/b
            pl.BlockSpec((D, hc), lambda t, c: (0, c),
                         memory_space=pltpu.VMEM),     # w1_q chunk
            pl.BlockSpec((1, hc), lambda t, c: (0, c),
                         memory_space=pltpu.VMEM),     # w1_s chunk
            pl.BlockSpec((1, hc), lambda t, c: (0, c),
                         memory_space=pltpu.VMEM),     # b1 chunk
            pl.BlockSpec((hc, D), lambda t, c: (c, 0),
                         memory_space=pltpu.VMEM),     # w2_q chunk
            pl.BlockSpec((1, D), lambda t, c: (0, 0),
                         memory_space=pltpu.VMEM),     # w2_s
            pl.BlockSpec((1, D), lambda t, c: (0, 0),
                         memory_space=pltpu.VMEM),     # b2
            rope_spec, rope_spec,                      # cos, sin
            full,                                      # R
        ],
        out_specs=row_spec,
        scratch_shapes=[
            pltpu.VMEM((tile_rows, D), jnp.int8),      # quantized LN2 out
            pltpu.VMEM((tile_rows, 1), jnp.float32),   # its per-row scales
            pltpu.VMEM((tile_rows, D), jnp.float32),   # fc2 accumulator
            pltpu.VMEM((tile_rows, D), x.dtype),       # attention-half out
        ],
        interpret=interpret_mode(),
        compiler_params=_PAIR_PARAMS,
    )(xf, sh1, sc1, g1, sh2, sc2, g2, qkv_q, qkv_s.reshape(1, -1), out_q,
      out_s.reshape(1, -1), out_b.reshape(1, -1), w1_q, w1_s.reshape(1, -1),
      b1.reshape(1, -1), w2_q, w2_s.reshape(1, -1), b2.reshape(1, -1),
      cos, sin, R)
    return out.reshape(N, S, D)


@functools.partial(jax.jit, static_argnames=("num_heads", "n_ctx", "n_live",
                                             "approx_gelu"))
def fused_temporal_pair_q(x, sh1, sc1, g1, sh2, sc2, g2, qkv_q, qkv_s, out_q,
                          out_s, out_b, w1_q, w1_s, b1, w2_q, w2_s, b2,
                          k_ctx, v_ctx, rope_freqs, valid, num_heads, n_ctx,
                          n_live=1, approx_gelu=True):
    """Incremental temporal step + temporal MLP as ONE kernel call.
    Equals fused_temporal_step_q followed by fused_mlp_branch_q."""
    N, S, D = x.shape
    B = N // n_live
    T = n_ctx + n_live
    H = w1_q.shape[1]
    d = D // num_heads
    _, _, R, seg, bias = temporal_preamble(
        rope_freqs, valid, B, S, T, num_heads, d, x.dtype
    )
    cos_t = jnp.cos(rope_freqs.astype(jnp.float32))
    sin_t = jnp.sin(rope_freqs.astype(jnp.float32))
    cos = jnp.tile(cos_t[n_ctx:T], (B, num_heads))
    sin = jnp.tile(sin_t[n_ctx:T], (B, num_heads))
    xf = x.reshape(N * S, D)
    nc = _pair_chunks(H)
    hc = H // nc
    # UNSHAPED full specs for every grid-constant operand: a shaped block
    # with a constant index map still enters the grid pipeline and gets a
    # second (double-buffer) VMEM allocation — for the 2x (B*n_ctx*S, D)
    # K/V cache that alone is ~38 MB of dead VMEM at B=8 and measured +70
    # us/call; an unshaped spec is a one-shot bulk copy outside the
    # pipeline (same mechanism as the gridless fused_temporal_step_q).
    # Only the w1/w2 hidden-dim chunks ride the pipeline.
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    rows = xf.shape[0]
    out = pl.pallas_call(
        functools.partial(
            _temporal_pair_kernel_q, num_heads=num_heads, n_ctx=n_ctx,
            n_batches=B, seq_len=S, ln_eps=1e-6, mod_eps=1e-6,
            approx_gelu=approx_gelu, n_chunks=nc, n_live=n_live,
        ),
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        grid=(nc,),
        in_specs=[
            full,                                      # x
            full, full, full,                          # sh1, sc1, g1
            full, full, full,                          # sh2, sc2, g2
            full, full,                                # qkv_q/s
            full, full, full,                          # out_q/s/b
            pl.BlockSpec((D, hc), lambda c: (0, c),
                         memory_space=pltpu.VMEM),     # w1_q chunk
            pl.BlockSpec((1, hc), lambda c: (0, c),
                         memory_space=pltpu.VMEM),     # w1_s chunk
            pl.BlockSpec((1, hc), lambda c: (0, c),
                         memory_space=pltpu.VMEM),     # b1 chunk
            pl.BlockSpec((hc, D), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),     # w2_q chunk
            full, full,                                # w2_s, b2
            full, full,                                # context K/V
            full, full,                                # rope slot tables
            full, full,                                # R, seg
            pl.BlockSpec(memory_space=pltpu.SMEM),     # bias (T, T)
        ],
        out_specs=full,
        scratch_shapes=[
            pltpu.VMEM((rows, D), jnp.int8),
            pltpu.VMEM((rows, 1), jnp.float32),
            pltpu.VMEM((rows, D), jnp.float32),
            pltpu.VMEM((rows, D), x.dtype),
        ],
        interpret=interpret_mode(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(xf, sh1, sc1, g1, sh2, sc2, g2, qkv_q, qkv_s.reshape(1, -1), out_q,
      out_s.reshape(1, -1), out_b.reshape(1, -1), w1_q, w1_s.reshape(1, -1),
      b1.reshape(1, -1), w2_q, w2_s.reshape(1, -1), b2.reshape(1, -1),
      k_ctx, v_ctx, cos, sin, R, seg, bias)
    return out.reshape(N, S, D)
