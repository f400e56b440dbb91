"""W8A8 (int8 weights x int8 activations) variants of the fused DiT branch
kernels — inference-only serving acceleration.

Why int8: at B=1 serving shapes the DiT forward is COMPUTE-bound on the MXU
(docs/PERF.md: the token GEMMs run at ~96% of bf16 peak), and the v5e MXU
runs int8 at 2x the bf16 rate (measured on this chip: 422 vs 173 TFLOP/s
for a 768x1024x4096 GEMM). Weight streaming also halves.

Scheme (standard dynamic per-token W8A8, cf. LLM.int8/SmoothQuant lineage):
  - weights: symmetric per-OUTPUT-channel int8, scales precomputed once by
    gtax.models.dit.quantize_for_inference;
  - activations: symmetric per-ROW (per-token) int8, quantized dynamically
    INSIDE the kernel from the fp32 LN/modulate output — the quantize step
    is VPU work that is tiny next to the MXU savings;
  - GEMMs accumulate int32 on the MXU, then rescale to fp32 with
    (row_scale x col_scale) before bias/rope/softmax — so everything outside
    the GEMMs (LN statistics, rope, softmax, gated residuals) is bit-identical
    to the bf16 kernels' fp32 math.

The attention score/PV dots stay bf16: they are a small fraction of branch
FLOPs and are accuracy-sensitive.

Branch semantics parity target: SpatioTemporalDiTBlock
(/root/reference/model/dit.py:200-225); the quantization is an approximation
of it, quality-gated by tests/test_quant.py and scripts/quant_quality.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gtax.kernels.attention import interpret_mode
from gtax.kernels.block import (
    _BRANCH_PARAMS,
    _frames_per_tile,
    _ln_modulate32,
    _pad_frame_rows,
    _rows_from_frames,
    _spatial_attention_core,
    _temporal_attention_core,
    _temporal_step_core,
    rotate_half_matrix,
    temporal_preamble,
)


def quantize_weight(w):
    """Symmetric per-output-channel int8: w ~= q * s with s: (..., 1, dout).
    Works on single (din, dout) kernels and stacked (L, din, dout) arrays."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)
    s = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.round(w32 / s).astype(jnp.int8)
    return q, s


def _quant_rows(a32):
    """Dynamic symmetric per-row int8 of an fp32 activation block.
    Returns (q int8, s fp32 (rows, 1)) with a ~= q * s."""
    amax = jnp.max(jnp.abs(a32), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    q = jnp.round(a32 * (1.0 / s)).astype(jnp.int8)
    return q, s


def _qdot(a32, wq_ref, ws_ref):
    """fp32 activations -> dynamic int8 -> MXU int8 GEMM -> fp32 rescale."""
    q, sa = _quant_rows(a32)
    acc = jax.lax.dot_general(
        q, wq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * sa * ws_ref[:]


# Round-5 negative result (docs/PERF.md "Round-5 serving"): deriving the
# hidden requant scale from the PRE-gelu row max (exact via gelu
# monotonicity above -0.7518, |gelu| <= 0.17004 below) saved one VPU
# scan per MLP call in ISOLATED microbenchmarks (78.0 -> 70.6 us/call at
# B=8, scripts/r5_serving_exp.py) but measured NEUTRAL-to-negative in the
# full rollout graph (16.93 -> 16.78 f/s aggregate at B=8) — the abs-max
# scan it removes overlaps with MXU work there. Kept out; the two-pass
# gelu + _quant_rows epilogue below is the shipped form.


def _spatial_kernel_q(x_ref, shift_ref, scale_ref, gate_ref, qkvq_ref,
                      qkvs_ref, outq_ref, outs_ref, outb_ref, cos_ref,
                      sin_ref, rot_ref, o_ref, q_ref=None, k_ref=None,
                      v_ref=None, y_ref=None, *, num_heads, n_frames,
                      seq_len, ln_eps, mod_eps):
    """W8A8 twin of gtax.kernels.block._kernel: the LN/modulate and the
    attention core are the SAME code (imported); only the qkv and out GEMMs
    go through the dynamic-int8 path.

    q/k/v/y_ref (emit_train): post-rope q/k, cast v, and the pre-gate branch
    output — the residuals the training backward consumes (int8-forward
    training, gtax.nn.branches)."""
    x = x_ref[:]
    NS, D = x.shape

    x32, mod = _ln_modulate32(x_ref, shift_ref, scale_ref, ln_eps, mod_eps,
                              seq_len)
    qkv = _qdot(mod, qkvq_ref, qkvs_ref)  # (NS, 3D) fp32
    q, k, v = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]

    attn_out = _spatial_attention_core(
        q, k, v, cos_ref[:], sin_ref[:], rot_ref[:], x.dtype, num_heads,
        n_frames, seq_len,
        qkv_out=None if q_ref is None else (q_ref, k_ref, v_ref),
    )

    y = _qdot(attn_out, outq_ref, outs_ref)
    y = y + outb_ref[0].astype(jnp.float32)
    if y_ref is not None:
        y_ref[:] = y.astype(y_ref.dtype)

    g = _rows_from_frames(gate_ref[:].astype(jnp.float32), seq_len,
                          x32.shape[0])
    o_ref[:] = (x32 + g * y).astype(o_ref.dtype)


def _temporal_kernel_q(x_ref, shift_ref, scale_ref, gate_ref, qkvq_ref,
                       qkvs_ref, outq_ref, outs_ref, outb_ref, cos_ref,
                       sin_ref, rot_ref, seg_ref, bias_ref, o_ref,
                       k_ref=None, v_ref=None, q_ref=None, y_ref=None, *,
                       num_heads, n_frames, n_batches, seq_len, ln_eps,
                       mod_eps):
    """W8A8 twin of gtax.kernels.block._temporal_kernel (shared attention
    core; int8 qkv/out GEMMs). k_ref/v_ref: optional post-rope K/V outputs
    (prefill for incremental decoding); + q_ref/y_ref: the emit_train
    residual set for int8-forward training (gtax.nn.branches)."""
    x = x_ref[:]
    NS, D = x.shape

    x32, mod = _ln_modulate32(x_ref, shift_ref, scale_ref, ln_eps, mod_eps,
                              seq_len)
    qkv = _qdot(mod, qkvq_ref, qkvs_ref)
    q, k, v = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]

    attn_out = _temporal_attention_core(
        q, k, v, _rows_from_frames(cos_ref[:], seq_len, x32.shape[0]),
        _rows_from_frames(sin_ref[:], seq_len, x32.shape[0]),
        rot_ref[:], seg_ref[:],
        bias_ref, x.dtype, num_heads, n_frames, n_batches, seq_len,
        kv_out=None if k_ref is None else (k_ref, v_ref),
        q_out=q_ref,
    )

    y = _qdot(attn_out, outq_ref, outs_ref)
    y = y + outb_ref[0].astype(jnp.float32)
    if y_ref is not None:
        y_ref[:] = y.astype(y_ref.dtype)
    g = _rows_from_frames(gate_ref[:].astype(jnp.float32), seq_len,
                          x32.shape[0])
    o_ref[:] = (x32 + g * y).astype(o_ref.dtype)


def _temporal_step_kernel_q(x_ref, shift_ref, scale_ref, gate_ref, qkvq_ref,
                            qkvs_ref, outq_ref, outs_ref, outb_ref, kctx_ref,
                            vctx_ref, cos_ref, sin_ref, rot_ref, seg_ref,
                            bias_ref, o_ref, *, num_heads, n_ctx, n_batches,
                            seq_len, ln_eps, mod_eps, n_live=1):
    """W8A8 twin of gtax.kernels.block._temporal_step_kernel (incremental
    decoding: live-frame rows against cached context K/V)."""
    x = x_ref[:]
    NS, D = x.shape
    x32, mod = _ln_modulate32(x_ref, shift_ref, scale_ref, ln_eps, mod_eps,
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
    g = _rows_from_frames(gate_ref[:].astype(jnp.float32), seq_len,
                          x32.shape[0])
    o_ref[:] = (x32 + g * y).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "n_ctx", "n_live",
                                    "batch_tile"))
def fused_temporal_step_q(x, shift, scale, gate, qkv_q, qkv_s, out_q, out_s,
                          out_b, k_ctx, v_ctx, rope_freqs, valid, num_heads,
                          n_ctx, n_live=1, batch_tile=None):
    """int8 twin of gtax.kernels.block.fused_temporal_step."""
    N, S, D = x.shape
    B = N // n_live
    T = n_ctx + n_live
    d = D // num_heads
    _, _, R, seg, bias = temporal_preamble(
        rope_freqs, valid, B, S, T, num_heads, d, x.dtype
    )
    cos_t = jnp.cos(rope_freqs.astype(jnp.float32))
    sin_t = jnp.sin(rope_freqs.astype(jnp.float32))
    # per-live-frame (N, D) slot tables; the kernel broadcasts to token rows
    cos = jnp.tile(cos_t[n_ctx:T], (B, num_heads))
    sin = jnp.tile(sin_t[n_ctx:T], (B, num_heads))
    xf = x.reshape(N * S, D)
    out_b = out_b.reshape(1, -1)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    from gtax.kernels.block import _step_batches_per_tile

    b_pt = batch_tile or _step_batches_per_tile(B, n_live, n_ctx, S)
    if b_pt == B:
        out = pl.pallas_call(
            functools.partial(
                _temporal_step_kernel_q, num_heads=num_heads, n_ctx=n_ctx,
                n_batches=B, seq_len=S, ln_eps=1e-6, mod_eps=1e-6,
                n_live=n_live,
            ),
            out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
            in_specs=[full] * 15 + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=full,
            interpret=interpret_mode(),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        )(xf, shift, scale, gate, qkv_q, qkv_s.reshape(1, -1), out_q,
          out_s.reshape(1, -1), out_b, k_ctx, v_ctx, cos, sin, R, seg, bias)
        return out.reshape(N, S, D)
    # batch-tiled twin of gtax.kernels.block.fused_temporal_step's tiled
    # form (see _step_batches_per_tile: lifts the B=16 VMEM ceiling)
    n_tiles = B // b_pt
    row_spec = pl.BlockSpec((b_pt * n_live * S, D), lambda t: (t, 0),
                            memory_space=pltpu.VMEM)
    ctx_spec = pl.BlockSpec((b_pt * n_ctx * S, D), lambda t: (t, 0),
                            memory_space=pltpu.VMEM)
    (shift, scale, gate, cos, sin), fpt_pad = _pad_frame_rows(
        (shift, scale, gate, cos, sin), b_pt * n_live, n_tiles)
    frame_spec = pl.BlockSpec((fpt_pad, D), lambda t: (t, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _temporal_step_kernel_q, num_heads=num_heads, n_ctx=n_ctx,
            n_batches=b_pt, seq_len=S, ln_eps=1e-6, mod_eps=1e-6,
            n_live=n_live,
        ),
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        grid=(n_tiles,),
        in_specs=[
            row_spec, frame_spec, frame_spec, frame_spec,  # x + adaLN vecs
            full, full, full, full, full,            # qkv_q/s, out_q/s/b
            ctx_spec, ctx_spec,                      # k_ctx, v_ctx
            frame_spec, frame_spec,                  # cos, sin
            full, full,                              # R, seg
            pl.BlockSpec(memory_space=pltpu.SMEM),   # bias
        ],
        out_specs=row_spec,
        interpret=interpret_mode(),
        compiler_params=_BRANCH_PARAMS,
    )(xf, shift, scale, gate, qkv_q, qkv_s.reshape(1, -1), out_q,
      out_s.reshape(1, -1), out_b, k_ctx, v_ctx, cos, sin, R, seg, bias)
    return out.reshape(N, S, D)


def _mlp_kernel_q(*refs, seq_len, ln_eps, mod_eps, approx_gelu, n_chunks,
                  chunk_axis=1, emit_train=False):
    """W8A8 twin of gtax.kernels.block._mlp_kernel (shared LN/modulate):
    both MLP GEMMs int8; the hidden activation re-quantizes per row after
    the fp32 GELU.

    The hidden dim H is chunked over the LAST grid axis so the Pallas
    pipeline double-buffers the next chunk's w1/w2 slabs during the current
    chunk's compute: a gridless call serialises its whole weight DMA before
    the body, which measured 2x the int8-DMA floor at B=1 serving shapes
    (docs/PERF.md round 2). LN/modulate/quantize run ONCE (chunk 0) into
    VMEM scratch — round 1's chunked-MLP mistake was recomputing them per
    chunk — and fc2 partials accumulate fp32 in scratch. n_chunks=1
    degenerates to the unchunked single-pass kernel (training row-tiles,
    interpret tests, H too small to split).

    The grid is 1-D (H chunks; chunk_axis=0) when the rows fit one tile —
    skipping the 2-D grid machinery at small serving shapes — else 2-D
    (row tiles, H chunks; chunk_axis=1) with chunks iterating fast.

    emit_train adds (h1, y) outputs — the pre-gelu fc1 activation (written
    per H-chunk) and the pre-gate branch output, the residual set the
    int8-forward training backward consumes (gtax.nn.branches). Refs are
    unpacked explicitly because pallas passes scratch refs positionally
    AFTER the (emit-dependent) output refs."""
    if emit_train:
        (x_ref, shift_ref, scale_ref, gate_ref, w1q_ref, w1s_ref, b1_ref,
         w2q_ref, w2s_ref, b2_ref, o_ref, h1_ref, y_ref, qmod_ref, qs_ref,
         acc_ref) = refs
    else:
        (x_ref, shift_ref, scale_ref, gate_ref, w1q_ref, w1s_ref, b1_ref,
         w2q_ref, w2s_ref, b2_ref, o_ref, qmod_ref, qs_ref, acc_ref) = refs
        h1_ref = y_ref = None
    c = pl.program_id(chunk_axis)

    @pl.when(c == 0)
    def _():
        x32, mod = _ln_modulate32(x_ref, shift_ref, scale_ref, ln_eps,
                                  mod_eps, seq_len)
        q, s = _quant_rows(mod)
        qmod_ref[:] = q
        qs_ref[:] = s
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # per-chunk fc1 -> gelu -> re-quantize -> fc2 partial (int8 MXU, fp32
    # rescale; per-chunk hidden row scales are at least as fine as the
    # whole-row scale the unchunked kernel used)
    acc1 = jax.lax.dot_general(
        qmod_ref[:], w1q_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    h = (acc1.astype(jnp.float32) * qs_ref[:] * w1s_ref[:]
         + b1_ref[0].astype(jnp.float32))
    if h1_ref is not None:
        h1_ref[:] = h.astype(h1_ref.dtype)  # this chunk's H columns
    h = jax.nn.gelu(h, approximate=approx_gelu)
    hq, hs = _quant_rows(h)
    part = jax.lax.dot_general(
        hq, w2q_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc_ref[:] += part.astype(jnp.float32) * hs

    @pl.when(c == n_chunks - 1)
    def _():
        x32 = x_ref[:].astype(jnp.float32)
        y = acc_ref[:] * w2s_ref[:] + b2_ref[0].astype(jnp.float32)
        if y_ref is not None:
            y_ref[:] = y.astype(y_ref.dtype)
        g = _rows_from_frames(gate_ref[:].astype(jnp.float32), seq_len,
                              x32.shape[0])
        o_ref[:] = (x32 + g * y).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "emit_train"))
def fused_spatial_branch_q(x, shift, scale, gate, qkv_q, qkv_s, out_q, out_s,
                           out_b, rope_freqs, num_heads, emit_train=False):
    """int8 twin of gtax.kernels.block.fused_spatial_branch; qkv_q/out_q are
    int8 kernels with per-column scales qkv_s (1, 3D) / out_s (1, D).
    emit_train=True additionally returns (q, k, v, y) — the same residual
    set as the bf16 kernel, for int8-forward training."""
    N, S, D = x.shape
    d = D // num_heads
    fpt = _frames_per_tile(N, S)
    n_tiles = N // fpt
    tile_rows = fpt * S
    cos = jnp.tile(jnp.cos(rope_freqs.astype(jnp.float32)), (N, 1))
    sin = jnp.tile(jnp.sin(rope_freqs.astype(jnp.float32)), (N, 1))
    R = jnp.asarray(rotate_half_matrix(d))
    out_b = out_b.reshape(1, -1)
    xf = x.reshape(N * S, D)
    row_spec = pl.BlockSpec((tile_rows, D), lambda c: (c, 0),
                            memory_space=pltpu.VMEM)
    (shift, scale, gate), fpt_pad = _pad_frame_rows(
        (shift, scale, gate), fpt, n_tiles)
    frame_spec = pl.BlockSpec((fpt_pad, D), lambda c: (c, 0),
                              memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    rot = rope_freqs.shape[-1]
    one = jax.ShapeDtypeStruct(xf.shape, x.dtype)
    n_out = 5 if emit_train else 1
    out = pl.pallas_call(
        functools.partial(
            _spatial_kernel_q, num_heads=num_heads, n_frames=fpt, seq_len=S,
            ln_eps=1e-6, mod_eps=1e-6,
        ),
        out_shape=(one,) * n_out if emit_train else one,
        grid=(n_tiles,),
        in_specs=[
            row_spec, frame_spec, frame_spec, frame_spec,  # x + adaLN vecs
            full, full, full, full, full,            # qkv_q/s, out_q/s, out_b
            pl.BlockSpec((tile_rows, rot), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),   # cos
            pl.BlockSpec((tile_rows, rot), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),   # sin
            full,                                    # R
        ],
        out_specs=(row_spec,) * n_out if emit_train else row_spec,
        interpret=interpret_mode(),
        compiler_params=_BRANCH_PARAMS,
    )(xf, shift, scale, gate, qkv_q, qkv_s.reshape(1, -1), out_q,
      out_s.reshape(1, -1), out_b, cos, sin, R)
    if emit_train:
        o, qq, kk, vv, yy = (a.reshape(N, S, D) for a in out)
        return o, qq, kk, vv, yy
    return out.reshape(N, S, D)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "n_frames", "emit_kv",
                                    "emit_train"))
def fused_temporal_branch_q(x, shift, scale, gate, qkv_q, qkv_s, out_q,
                            out_s, out_b, rope_freqs, valid, num_heads,
                            n_frames, emit_kv=False, emit_train=False):
    """int8 twin of gtax.kernels.block.fused_temporal_branch (emit_kv=True
    additionally returns the post-rope (k, v) context cache; emit_train=True
    returns (o, q, k, v, y) — the training-backward residual set)."""
    N, S, D = x.shape
    T = n_frames
    B = N // T
    d = D // num_heads
    cos, sin, R, seg, bias = temporal_preamble(
        rope_freqs, valid, B, S, T, num_heads, d, x.dtype
    )

    xf = x.reshape(N * S, D)
    out_b = out_b.reshape(1, -1)
    b_pt = _frames_per_tile(B, T * S)
    n_tiles = B // b_pt
    tile_rows = b_pt * T * S
    row_spec = pl.BlockSpec((tile_rows, D), lambda c: (c, 0),
                            memory_space=pltpu.VMEM)
    (shift, scale, gate, cos, sin), fpt_pad = _pad_frame_rows(
        (shift, scale, gate, cos, sin), b_pt * T, n_tiles)
    frame_spec = pl.BlockSpec((fpt_pad, D), lambda c: (c, 0),
                              memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    one = jax.ShapeDtypeStruct(xf.shape, x.dtype)
    assert not (emit_kv and emit_train)
    n_out = 5 if emit_train else (3 if emit_kv else 1)
    out = pl.pallas_call(
        functools.partial(
            _temporal_kernel_q, num_heads=num_heads, n_frames=T,
            n_batches=b_pt, seq_len=S, ln_eps=1e-6, mod_eps=1e-6,
        ),
        out_shape=(one,) * n_out if n_out > 1 else one,
        grid=(n_tiles,),
        in_specs=[
            row_spec, frame_spec, frame_spec, frame_spec,  # x + adaLN vecs
            full, full, full, full, full,            # qkv_q/s, out_q/s, out_b
            frame_spec, frame_spec,                  # cos, sin (per-frame)
            full, full,                              # R, seg
            pl.BlockSpec(memory_space=pltpu.SMEM),   # bias (T, T)
        ],
        out_specs=(row_spec,) * n_out if n_out > 1 else row_spec,
        interpret=interpret_mode(),
        compiler_params=_BRANCH_PARAMS,
    )(xf, shift, scale, gate, qkv_q, qkv_s.reshape(1, -1), out_q,
      out_s.reshape(1, -1), out_b, cos, sin, R, seg, bias)
    if emit_train:
        # kernel output order: (o, k, v, q, y) -> return (o, q, k, v, y)
        o, kk, vv, qq, yy = (a.reshape(N, S, D) for a in out)
        return o, qq, kk, vv, yy
    if emit_kv:
        o, kk, vv = out
        return (o.reshape(N, S, D), kk.reshape(N, S, D), vv.reshape(N, S, D))
    return out.reshape(N, S, D)


def _mlp_chunks(h: int, rows: int = 0) -> int:
    """Largest H split in {8, 4, 2, 1} whose chunk width stays a lane-tile
    multiple (128): measured on v5e, 8 chunks of the flagship H=4096 run the
    kernel at ~15.5 us/call vs 20.6 unchunked (int8-DMA floor ~10.4).

    Round-5 negative result: nc=4 at batched rows (>=576) won ISOLATED
    microbenchmarks (70.6 vs 72.5 us/call at B=8, scripts/r5_serving_exp.py)
    but lost ~8% aggregate f/s in the full rollout together with the
    single-row-tile form — coarser chunks shrink the per-call latency yet
    starve the cross-kernel DMA overlap the rollout graph lives on
    (docs/PERF.md round-5 serving). nc=8 everywhere is the shipped form."""
    prefer = (8, 4, 2)
    for nc in prefer:
        if h % nc == 0 and (h // nc) % 128 == 0:
            return nc
    return 1


@functools.partial(jax.jit, static_argnames=("approx_gelu", "emit_train"))
def fused_mlp_branch_q(x, shift, scale, gate, w1_q, w1_s, b1, w2_q, w2_s,
                       b2, approx_gelu=True, emit_train=False):
    """int8 twin of gtax.kernels.block.fused_mlp_branch. Weights stream in
    H-chunks over the grid (see _mlp_kernel_q). emit_train=True additionally
    returns (h1, y) — the training-backward residual set."""
    N, S, D = x.shape
    H = w1_q.shape[1]
    xf = x.reshape(N * S, D)
    b1 = b1.reshape(1, H)
    b2 = b2.reshape(1, D)
    # row tiles stay at the 768-row guard: forcing batched shapes (B=8,
    # 1152 rows) into ONE tile won microbenchmarks (72.5 vs 78.0 us/call)
    # but cost ~8% aggregate f/s in the rollout graph (round-5 negative
    # result, docs/PERF.md) — same overlap-starvation story as nc=4
    fpt = _frames_per_tile(N, S)
    n_tiles = N // fpt
    tile_rows = fpt * S
    nc = _mlp_chunks(H, tile_rows)
    hc = H // nc
    # 1-D grid (H chunks only) when a single row tile covers the call —
    # drops the ~3 us/call of 2-D (1, nc) grid machinery measured at
    # one-tile shapes (round 5); 2-D otherwise.
    one_tile = n_tiles == 1
    (shift, scale, gate), fpt_pad = _pad_frame_rows(
        (shift, scale, gate), fpt, n_tiles)
    if one_tile:
        tix = lambda c: (0, 0)          # noqa: E731 — row blocks
        cix = lambda c: (0, c)          # noqa: E731 — chunk-indexed cols
        w2ix = lambda c: (c, 0)         # noqa: E731
        fix = lambda c: (0, 0)          # noqa: E731
        grid = (nc,)
        semantics = ("arbitrary",)
    else:
        tix = lambda t, c: (t, 0)       # noqa: E731
        cix = lambda t, c: (0, c)       # noqa: E731
        w2ix = lambda t, c: (c, 0)      # noqa: E731
        fix = lambda t, c: (t, 0)       # noqa: E731
        grid = (n_tiles, nc)
        semantics = ("arbitrary", "arbitrary")
    row_spec = pl.BlockSpec((tile_rows, D), tix, memory_space=pltpu.VMEM)
    frame_spec = pl.BlockSpec((fpt_pad, D), fix, memory_space=pltpu.VMEM)

    def hchunk(rows, cols):  # rows x (H chunk) slabs, chunk-indexed
        return pl.BlockSpec((rows, cols), cix, memory_space=pltpu.VMEM)

    one = jax.ShapeDtypeStruct(xf.shape, x.dtype)
    if emit_train:
        # h1 blocks are (row tile, H chunk)-indexed: every grid step writes
        # its own chunk's pre-gelu columns
        hx = (lambda c: (0, c)) if one_tile else (lambda t, c: (t, c))
        h1_spec = pl.BlockSpec((tile_rows, hc), hx, memory_space=pltpu.VMEM)
        out_shape = (one, jax.ShapeDtypeStruct((N * S, H), x.dtype), one)
        out_specs = (row_spec, h1_spec, row_spec)
    else:
        out_shape, out_specs = one, row_spec
    out = pl.pallas_call(
        functools.partial(
            _mlp_kernel_q, seq_len=S, ln_eps=1e-6, mod_eps=1e-6,
            approx_gelu=approx_gelu, n_chunks=nc,
            chunk_axis=0 if one_tile else 1, emit_train=emit_train,
        ),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            row_spec, frame_spec, frame_spec, frame_spec,
            hchunk(D, hc),                            # w1_q
            hchunk(1, hc),                            # w1_s
            hchunk(1, hc),                            # b1
            pl.BlockSpec((hc, D), w2ix,
                         memory_space=pltpu.VMEM),    # w2_q
            pl.BlockSpec((1, D),
                         (lambda c: (0, 0)) if one_tile
                         else (lambda t, c: (0, 0)),
                         memory_space=pltpu.VMEM),    # w2_s
            pl.BlockSpec((1, D),
                         (lambda c: (0, 0)) if one_tile
                         else (lambda t, c: (0, 0)),
                         memory_space=pltpu.VMEM),    # b2
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((tile_rows, D), jnp.int8),     # quantized LN/modulate
            pltpu.VMEM((tile_rows, 1), jnp.float32),  # its per-row scales
            pltpu.VMEM((tile_rows, D), jnp.float32),  # fc2 fp32 accumulator
        ],
        interpret=interpret_mode(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(xf, shift, scale, gate, w1_q, w1_s.reshape(1, -1), b1, w2_q,
      w2_s.reshape(1, -1), b2)
    if emit_train:
        o, h1, y = out
        return (o.reshape(N, S, D), h1.reshape(N, S, H),
                y.reshape(N, S, D))
    return out.reshape(N, S, D)
