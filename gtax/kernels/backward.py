"""Fused Pallas TRAINING BACKWARD kernels for the DiT branches.

Round-2 measured the unstacked fused_all train step at 198 ms (36% MFU) with
the backward running as hand-derived XLA (gtax.nn.branches): the transpose
GEMMs hit ~73% of peak but ~50 ms/step went to the unfused glue around them —
LN/modulate/gelu vjp recomputes, gate backward, per-frame reductions, dtype
converts, and reshape/copy data formatting (docs/PERF.md round-3 profile).
These kernels fuse one branch's ENTIRE backward — weight grads included —
into a single VMEM-resident pallas_call, mirroring how the forward kernels
(gtax.kernels.block) fuse the branch forward.

Structure shared by all branch backwards:
  - token rows tile over a sequential grid (same frame-major layout as the
    forward kernels); weight-gradient accumulators live in VMEM outputs with
    a constant index_map, zeroed on the first tile and accumulated across
    tiles ("arbitrary" dimension semantics);
  - elementwise math (LN stats, modulate, gelu', gate) runs in fp32; GEMM
    operands are cast to the compute dtype with fp32 accumulation — the
    same contract as gtax.nn.branches' _wgrad/_dmat XLA helpers;
  - per-frame vectors (shift/scale/gate and their grads) stay per-frame,
    broadcast/reduced inside the kernel (no HBM repeat materialisation).

Gradient parity vs the pure-XLA autodiff path is asserted in
tests/test_kernels.py (the fused_all-vs-xla gradient tests now cover this
path). Branch semantics target: SpatioTemporalDiTBlock backward through
/root/reference/model/dit.py:200-225 (the reference trains with plain torch
autograd; there is no kernel counterpart to mirror — this is the TPU-native
design).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gtax.kernels.attention import interpret_mode
from gtax.kernels.block import (
    _frames_per_tile,
    _pad_frame_rows,
    _rows_from_frames,
)

# sequential grid: weight-grad outputs are revisited (accumulated) across
# tiles, so tiles must run in order
_BWD_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("arbitrary",),
    vmem_limit_bytes=121 * 1024 * 1024,
)

# backward tiles carry ~2x the forward's live tensors (residuals + grads +
# fp32 weight-grad accumulators); smaller row tiles keep VMEM bounded.
# Round 4: 576 rows (4 frames) halves the weight-grad accumulators'
# revisit traffic (~32 MB fp32 read-modify-written per tile) vs the 320-row
# form's 20 tiles at flagship B=8 — measured step win. The 576-row tile's
# live set needed the scoped-VMEM budget raised from 110 to the 121 MB in
# _BWD_PARAMS above (fits the real chip's 128 MB VMEM with headroom).
# GTAX_BWD_ROWS overrides for experiments; values below the per-frame
# seq_len degrade to 1-frame tiles (see _frames_per_tile). Read at import
# time; a non-integer value fails the import loudly on purpose.
try:
    _BWD_MAX_ROWS = max(1, int(os.environ.get("GTAX_BWD_ROWS", "576")))
except ValueError as _e:  # pragma: no cover - config error path
    raise ValueError(
        f"GTAX_BWD_ROWS must be an integer, got "
        f"{os.environ.get('GTAX_BWD_ROWS')!r}") from _e


def _seg_sum_frames(rows32, seq_len, n_frames_pad):
    """(F*S, D) fp32 token rows -> (F_pad, D) per-frame sums (zero-padded).
    Inverse of block._rows_from_frames' broadcast."""
    FS, D = rows32.shape
    F = FS // seq_len
    per_frame = jnp.sum(rows32.reshape(F, seq_len, D), axis=1)
    if n_frames_pad > F:
        per_frame = jnp.concatenate(
            [per_frame, jnp.zeros((n_frames_pad - F, D), jnp.float32)],
            axis=0,
        )
    return per_frame


def _ln_mod_fwd32(x32, shift32, scale32, ln_eps, mod_eps):
    """fp32 LN (no affine) + modulate forward, returning the internals the
    vjp needs. Matches gtax.nn.layers.layer_norm/modulate run in fp32."""
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + ln_eps)
    ln = (x32 - mean) * r
    mod = ln * (1.0 + scale32 + mod_eps) + shift32
    return ln, r, mod


def _ln_mod_bwd32(dmod32, ln, r, scale32, mod_eps):
    """fp32 vjp of modulate(layer_norm(x)). Returns (dx32, dshift_rows,
    dscale_rows) with the per-frame reductions left to the caller."""
    dln = dmod32 * (1.0 + scale32 + mod_eps)
    # LayerNorm (no affine) backward: dx = r * (dln - mean(dln)
    #                                           - ln * mean(dln * ln))
    m1 = jnp.mean(dln, axis=-1, keepdims=True)
    m2 = jnp.mean(dln * ln, axis=-1, keepdims=True)
    dx32 = r * (dln - m1 - ln * m2)
    return dx32, dmod32, dmod32 * ln


def _gelu_tanh_grad32(h32):
    """d/dx gelu(x, approximate=True) in fp32."""
    _, grad = _gelu_tanh_val_grad32(h32)
    return grad


def _gelu_tanh_val_grad32(h32):
    """(gelu(x), gelu'(x)) with ONE tanh evaluation — the transcendental is
    the MLP backward's dominant VPU cost (the tile recomputes gelu(h1) for
    the fc2 weight grad AND needs gelu' for the fc1 grad; evaluating
    jax.nn.gelu and the grad separately ran tanh twice over (rows, H)).
    Same tanh-approx formula as jax.nn.gelu(approximate=True)."""
    c = 0.7978845608028654  # sqrt(2/pi)
    a = 0.044715
    u = c * (h32 + a * h32 * h32 * h32)
    t = jnp.tanh(u)
    val = 0.5 * h32 * (1.0 + t)
    du = c * (1.0 + 3.0 * a * h32 * h32)
    grad = 0.5 * (1.0 + t) + 0.5 * h32 * (1.0 - t * t) * du
    return val, grad


def _mlp_bwd_kernel(x_ref, shift_ref, scale_ref, gate_ref, w1_ref, w2_ref,
                    h1_ref, y_ref, ct_ref,
                    dx_ref, dshift_ref, dscale_ref, dg_ref,
                    dw1_ref, db1_ref, dw2_ref, db2_ref, *,
                    seq_len, ln_eps, mod_eps, dtype):
    """One tile of the MLP-branch backward. Forward (block._mlp_kernel):
        out = x + g * (gelu(mod @ w1 + b1) @ w2 + b2),  mod = modulate(LN(x))
    Residuals: h1 (pre-gelu fc1 activation), y (pre-gate output)."""
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _zero():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    x32 = x_ref[:].astype(jnp.float32)
    rows, D = x32.shape
    F_pad = gate_ref.shape[0]
    ct32 = ct_ref[:].astype(jnp.float32)
    y32 = y_ref[:].astype(jnp.float32)

    # gate backward: out = x + g_rows * y
    g_rows = _rows_from_frames(gate_ref[:].astype(jnp.float32), seq_len,
                               rows)
    dg_ref[:] = _seg_sum_frames(ct32 * y32, seq_len, F_pad).astype(
        dg_ref.dtype)
    dy32 = ct32 * g_rows
    dy = dy32.astype(dtype)

    # fc2 backward: y = gelu(h1) @ w2 + b2 — gelu value and derivative from
    # ONE tanh evaluation (the separate jax.nn.gelu + grad ran it twice
    # over (rows, H); round-4 profile had this kernel at 1.51 ms/call, the
    # step's largest single op)
    h32 = h1_ref[:].astype(jnp.float32)
    ha32, gp32 = _gelu_tanh_val_grad32(h32)
    ha = ha32.astype(dtype)
    dw2_ref[:] += jax.lax.dot_general(
        ha, dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db2_ref[:] += jnp.sum(dy32, axis=0, keepdims=True)
    dha32 = jax.lax.dot_general(
        dy, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # gelu' and fc1 backward: h1 = mod @ w1 + b1
    dh132 = gp32 * dha32
    dh1 = dh132.astype(dtype)
    shift_rows = _rows_from_frames(shift_ref[:].astype(jnp.float32), seq_len,
                                   rows)
    scale_rows = _rows_from_frames(scale_ref[:].astype(jnp.float32), seq_len,
                                   rows)
    ln, r, mod = _ln_mod_fwd32(x32, shift_rows, scale_rows, ln_eps, mod_eps)
    dw1_ref[:] += jax.lax.dot_general(
        mod.astype(dtype), dh1, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1_ref[:] += jnp.sum(dh132, axis=0, keepdims=True)
    dmod32 = jax.lax.dot_general(
        dh1, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # modulate + LN backward, residual add
    dx32, dsh_rows, dsc_rows = _ln_mod_bwd32(dmod32, ln, r, scale_rows,
                                             mod_eps)
    dshift_ref[:] = _seg_sum_frames(dsh_rows, seq_len, F_pad).astype(
        dshift_ref.dtype)
    dscale_ref[:] = _seg_sum_frames(dsc_rows, seq_len, F_pad).astype(
        dscale_ref.dtype)
    dx_ref[:] = (ct32 + dx32).astype(dx_ref.dtype)


def _spatial_bwd_kernel(x_ref, shift_ref, scale_ref, gate_ref, qkvw_ref,
                        outw_ref, cos_ref, sin_ref, rot_ref,
                        q_ref, k_ref, v_ref, y_ref, ct_ref,
                        dx_ref, dshift_ref, dscale_ref, dg_ref,
                        dqkvw_ref, doutw_ref, doutb_ref, *,
                        num_heads, seq_len, ln_eps, mod_eps, dtype):
    """One tile of the spatial-attention-branch backward. Forward
    (block._kernel):
        out = x + g * (SpatialAttn(rope(qkv(modulate(LN(x))))) @ W_out + b)
    Residuals: post-rope q/k, cast v (q_ref/k_ref/v_ref), pre-gate y."""
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _zero():
        dqkvw_ref[:] = jnp.zeros_like(dqkvw_ref)
        doutw_ref[:] = jnp.zeros_like(doutw_ref)
        doutb_ref[:] = jnp.zeros_like(doutb_ref)

    x32 = x_ref[:].astype(jnp.float32)
    rows, D = x32.shape
    d = D // num_heads
    S = seq_len
    F = rows // S
    F_pad = gate_ref.shape[0]
    scale_attn = 1.0 / (d**0.5)
    ct32 = ct_ref[:].astype(jnp.float32)
    y32 = y_ref[:].astype(jnp.float32)

    # gate backward
    g_rows = _rows_from_frames(gate_ref[:].astype(jnp.float32), S, rows)
    dg_ref[:] = _seg_sum_frames(ct32 * y32, S, F_pad).astype(dg_ref.dtype)
    dy32 = ct32 * g_rows
    dy = dy32.astype(dtype)

    # recompute attention probs + output from the emitted post-rope q/k, v —
    # per-head 3D dots with the frame axis as a batch dim (same trick as the
    # forward core: 2*H*F small k=64 dots pay MXU issue latency each;
    # batching over frames measured -20% on the forward kernel at 8 frames)
    qr, kr, vr = q_ref[:], k_ref[:], v_ref[:]
    probs_all = []           # [h] fp32 (F, S, S)
    head_outs = []
    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        q3 = qr[:, sl].reshape(F, S, d)
        k3 = kr[:, sl].reshape(F, S, d)
        v3 = vr[:, sl].reshape(F, S, d)
        scores = jax.lax.dot_general(
            q3, k3, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale_attn
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p32 = e / jnp.sum(e, axis=-1, keepdims=True)
        probs_all.append(p32)
        head_outs.append(jax.lax.dot_general(
            p32.astype(dtype), v3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).reshape(F * S, d))
    ao = jnp.concatenate(head_outs, axis=-1).astype(dtype)

    # out-projection backward: y = ao @ W_out + b
    doutw_ref[:] += jax.lax.dot_general(
        ao, dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    doutb_ref[:] += jnp.sum(dy32, axis=0, keepdims=True)
    dao = jax.lax.dot_general(
        dy, outw_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype)

    # attention backward per head (frames batched in 3D dots), then rope
    # transpose
    cos32 = cos_ref[:].astype(jnp.float32)
    sin32 = sin_ref[:].astype(jnp.float32)
    R = rot_ref[:]
    dq_heads, dk_heads, dv_heads = [], [], []
    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        q3 = qr[:, sl].reshape(F, S, d)
        k3 = kr[:, sl].reshape(F, S, d)
        v3 = vr[:, sl].reshape(F, S, d)
        p32 = probs_all[h]
        p = p32.astype(dtype)
        dao3 = dao[:, sl].reshape(F, S, d)
        dv3 = jax.lax.dot_general(
            p, dao3, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dtype)
        dp32 = jax.lax.dot_general(
            dao3, v3, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ds = (p32 * (dp32 - jnp.sum(dp32 * p32, axis=-1, keepdims=True))
              * scale_attn).astype(dtype)
        dqr_h = jax.lax.dot_general(
            ds, k3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).reshape(F * S, d)
        dkr_h = jax.lax.dot_general(
            ds, q3, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).reshape(F * S, d)
        # rope transpose F^T(u) = u*cos - rotate_half(u*sin); rotate_half
        # via lane rolls on the (rows, d) head slab (pairs stay inside the
        # slab) instead of a (d, d) signed-permutation dot per head
        dq_heads.append(_rope_transpose_rows(dqr_h, cos32, sin32, R))
        dk_heads.append(_rope_transpose_rows(dkr_h, cos32, sin32, R))
        dv_heads.append(dv3.reshape(F * S, d))
    dqkv = jnp.concatenate(
        [jnp.concatenate(dq_heads, axis=-1),
         jnp.concatenate(dk_heads, axis=-1),
         jnp.concatenate(dv_heads, axis=-1)], axis=-1).astype(dtype)

    # qkv-projection backward: qkv = mod @ W_qkv
    shift_rows = _rows_from_frames(shift_ref[:].astype(jnp.float32), S, rows)
    scale_rows = _rows_from_frames(scale_ref[:].astype(jnp.float32), S, rows)
    ln, r, mod = _ln_mod_fwd32(x32, shift_rows, scale_rows, ln_eps, mod_eps)
    dqkvw_ref[:] += jax.lax.dot_general(
        mod.astype(dtype), dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dmod32 = jax.lax.dot_general(
        dqkv, qkvw_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    dx32, dsh_rows, dsc_rows = _ln_mod_bwd32(dmod32, ln, r, scale_rows,
                                             mod_eps)
    dshift_ref[:] = _seg_sum_frames(dsh_rows, S, F_pad).astype(
        dshift_ref.dtype)
    dscale_ref[:] = _seg_sum_frames(dsc_rows, S, F_pad).astype(
        dscale_ref.dtype)
    dx_ref[:] = (ct32 + dx32).astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads",))
def fused_spatial_branch_bwd(x, shift, scale, g, qkv_w, out_w, rope_freqs,
                             qr, kr, vr, y, ct, num_heads):
    """Whole spatial-attention-branch backward as one pallas_call.

    x/ct/y/qr/kr/vr: (N, S, D); shift/scale/g: (N, D); qkv_w: (D, 3D);
    out_w: (D, D); rope_freqs: (S, d).
    Returns (dx, dshift, dscale, dg, dW_qkv, dW_out, db_out) — the rope
    table's zero cotangent is the caller's (gtax.nn.branches)."""
    from gtax.kernels.block import rotate_half_matrix

    N, S, D = x.shape
    d = D // num_heads
    dtype = x.dtype
    fpt = _frames_per_tile(N, S, max_rows=_BWD_MAX_ROWS)
    n_tiles = N // fpt
    tile_rows = fpt * S

    cos = jnp.tile(jnp.cos(rope_freqs.astype(jnp.float32)), (N, 1))
    sin = jnp.tile(jnp.sin(rope_freqs.astype(jnp.float32)), (N, 1))
    R = jnp.asarray(rotate_half_matrix(d))

    (shift_p, scale_p, g_p), fpt_pad = _pad_frame_rows(
        (shift, scale, g), fpt, n_tiles)

    def flat(a):
        return a.reshape(N * S, a.shape[-1])

    row_spec = pl.BlockSpec((tile_rows, D), lambda c: (c, 0),
                            memory_space=pltpu.VMEM)
    rope_spec = pl.BlockSpec((tile_rows, d), lambda c: (c, 0),
                             memory_space=pltpu.VMEM)
    frame_spec = pl.BlockSpec((fpt_pad, D), lambda c: (c, 0),
                              memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    accw_spec = pl.BlockSpec(qkv_w.shape, lambda c: (0, 0),
                             memory_space=pltpu.VMEM)
    acco_spec = pl.BlockSpec(out_w.shape, lambda c: (0, 0),
                             memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, D), lambda c: (0, 0),
                            memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((N * S, D), dtype),                    # dx
        jax.ShapeDtypeStruct((n_tiles * fpt_pad, D), jnp.float32),  # dshift
        jax.ShapeDtypeStruct((n_tiles * fpt_pad, D), jnp.float32),  # dscale
        jax.ShapeDtypeStruct((n_tiles * fpt_pad, D), jnp.float32),  # dg
        jax.ShapeDtypeStruct(qkv_w.shape, jnp.float32),             # dW_qkv
        jax.ShapeDtypeStruct(out_w.shape, jnp.float32),             # dW_out
        jax.ShapeDtypeStruct((1, D), jnp.float32),                  # db_out
    )
    outs = pl.pallas_call(
        functools.partial(
            _spatial_bwd_kernel, num_heads=num_heads, seq_len=S,
            ln_eps=1e-6, mod_eps=1e-6, dtype=dtype,
        ),
        out_shape=out_shapes,
        grid=(n_tiles,),
        in_specs=[row_spec, frame_spec, frame_spec, frame_spec,
                  full, full, rope_spec, rope_spec, full,
                  row_spec, row_spec, row_spec, row_spec, row_spec],
        out_specs=(row_spec, frame_spec, frame_spec, frame_spec,
                   accw_spec, acco_spec, vec_spec),
        interpret=interpret_mode(),
        compiler_params=_BWD_PARAMS,
    )(flat(x), shift_p, scale_p, g_p, qkv_w, out_w, cos, sin, R,
      flat(qr), flat(kr), flat(vr), flat(y), flat(ct))
    dx, dshift_p, dscale_p, dg_p, dqkvw, doutw, doutb = outs

    def unpad(a):
        return a.reshape(n_tiles, fpt_pad, D)[:, :fpt].reshape(N, D)

    return (dx.reshape(N, S, D), unpad(dshift_p), unpad(dscale_p),
            unpad(dg_p), dqkvw, doutw, doutb.reshape(D))


def _rope_transpose_rows(u32, cos32, sin32, R):
    """Adjoint of block._rope_rotate over full-width (rows, D) fp32 slabs:
    F^T(u) = u*cos - rotate_half(u*sin). rotate_half runs as full-width
    lane rolls (block._rotate_half_lanes — pairs never straddle head
    boundaries), replacing D/d per-head (d, d) signed-permutation dots; R
    stays in the signature for call-site symmetry. Bit-identical: pure
    permutation + negate either way."""
    del R
    from gtax.kernels.block import _rotate_half_lanes

    return u32 * cos32 - _rotate_half_lanes(u32 * sin32)


def _temporal_bwd_kernel(x_ref, shift_ref, scale_ref, gate_ref, qkvw_ref,
                         outw_ref, cos_ref, sin_ref, rot_ref, seg_ref,
                         bias_ref, q_ref, k_ref, v_ref, y_ref, ct_ref,
                         dx_ref, dshift_ref, dscale_ref, dg_ref,
                         dqkvw_ref, doutw_ref, doutb_ref, *,
                         num_heads, n_frames, n_batches, seq_len, ln_eps,
                         mod_eps, dtype):
    """One tile of the temporal-attention-branch backward. Forward
    (block._temporal_kernel): causal frame-pair segment-sum attention on
    frame-contiguous token rows. Residuals: post-rope q/k, cast v, pre-gate
    y. The additive bias (causal + validity, SMEM) zeroes masked pairs'
    gradients through probs ~= 0."""
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _zero():
        dqkvw_ref[:] = jnp.zeros_like(dqkvw_ref)
        doutw_ref[:] = jnp.zeros_like(doutw_ref)
        doutb_ref[:] = jnp.zeros_like(doutb_ref)

    x32 = x_ref[:].astype(jnp.float32)
    rows, D = x32.shape
    d = D // num_heads
    S = seq_len
    T = n_frames
    F_pad = gate_ref.shape[0]
    scale_attn = 1.0 / (d**0.5)
    ct32 = ct_ref[:].astype(jnp.float32)
    y32 = y_ref[:].astype(jnp.float32)
    seg = seg_ref[:]
    segT = seg.T

    g_rows = _rows_from_frames(gate_ref[:].astype(jnp.float32), S, rows)
    dg_ref[:] = _seg_sum_frames(ct32 * y32, S, F_pad).astype(dg_ref.dtype)
    dy32 = ct32 * g_rows
    dy = dy32.astype(dtype)

    qr, kr, vr = q_ref[:], k_ref[:], v_ref[:]

    # recompute probs + attention output from the emitted post-rope q/k, v
    probs_all = [[[None] * T for _ in range(T)] for _ in range(n_batches)]
    out_rows = []
    for b in range(n_batches):
        base = b * T * S

        def frame(t, arr, base=base):
            return arr[base + t * S: base + (t + 1) * S]

        scores = [[None] * T for _ in range(T)]
        for i in range(T):
            qi = frame(i, qr)
            for j in range(i + 1):
                scores[i][j] = jnp.dot(
                    (qi * frame(j, kr)).astype(dtype), seg,
                    preferred_element_type=jnp.float32,
                ) * scale_attn + bias_ref[i, j]
        for i in range(T):
            row = [scores[i][j] for j in range(i + 1)]
            m = row[0]
            for s_ij in row[1:]:
                m = jnp.maximum(m, s_ij)
            exps = [jnp.exp(s_ij - m) for s_ij in row]
            denom = exps[0]
            for e in exps[1:]:
                denom = denom + e
            acc = None
            for j, e in enumerate(exps):
                p32 = e / denom
                probs_all[b][i][j] = p32
                pexp = jnp.dot(p32.astype(dtype), segT,
                               preferred_element_type=jnp.float32)
                term = pexp * frame(j, vr).astype(jnp.float32)
                acc = term if acc is None else acc + term
            out_rows.append(acc)
    ao = jnp.concatenate(out_rows, axis=0).astype(dtype)

    doutw_ref[:] += jax.lax.dot_general(
        ao, dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    doutb_ref[:] += jnp.sum(dy32, axis=0, keepdims=True)
    dao = jax.lax.dot_general(
        dy, outw_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype)

    # attention backward per (batch, query frame, key frame)
    dq_f = [[None] * T for _ in range(n_batches)]
    dk_f = [[None] * T for _ in range(n_batches)]
    dv_f = [[None] * T for _ in range(n_batches)]
    for b in range(n_batches):
        base = b * T * S

        def frame(t, arr, base=base):
            return arr[base + t * S: base + (t + 1) * S]

        for i in range(T):
            dao_i32 = frame(i, dao).astype(jnp.float32)
            # dp for every causal pair, then the softmax-row correction
            dps = []
            dsum = None
            for j in range(i + 1):
                dp = jnp.dot(
                    (dao_i32 * frame(j, vr).astype(jnp.float32)
                     ).astype(dtype), seg,
                    preferred_element_type=jnp.float32)
                dps.append(dp)
                contrib = dp * probs_all[b][i][j]
                dsum = contrib if dsum is None else dsum + contrib
            for j in range(i + 1):
                p32 = probs_all[b][i][j]
                pexp = jnp.dot(p32.astype(dtype), segT,
                               preferred_element_type=jnp.float32)
                dv_term = pexp * dao_i32
                dv_f[b][j] = (dv_term if dv_f[b][j] is None
                              else dv_f[b][j] + dv_term)
                ds = (p32 * (dps[j] - dsum)) * scale_attn
                dsk = jnp.dot(ds.astype(dtype), segT,
                              preferred_element_type=jnp.float32)
                kj32 = frame(j, kr).astype(jnp.float32)
                qi32 = frame(i, qr).astype(jnp.float32)
                dq_term = dsk * kj32
                dq_f[b][i] = (dq_term if dq_f[b][i] is None
                              else dq_f[b][i] + dq_term)
                dk_term = dsk * qi32
                dk_f[b][j] = (dk_term if dk_f[b][j] is None
                              else dk_f[b][j] + dk_term)

    dqr = jnp.concatenate([dq_f[b][t] for b in range(n_batches)
                           for t in range(T)], axis=0)
    dkr = jnp.concatenate([dk_f[b][t] for b in range(n_batches)
                           for t in range(T)], axis=0)
    dvr = jnp.concatenate([dv_f[b][t] for b in range(n_batches)
                           for t in range(T)], axis=0)

    cos32 = _rows_from_frames(cos_ref[:], S, rows).astype(jnp.float32)
    sin32 = _rows_from_frames(sin_ref[:], S, rows).astype(jnp.float32)
    R = rot_ref[:]
    dq = _rope_transpose_rows(dqr, cos32, sin32, R)
    dk = _rope_transpose_rows(dkr, cos32, sin32, R)
    dqkv = jnp.concatenate([dq, dk, dvr], axis=-1).astype(dtype)

    shift_rows = _rows_from_frames(shift_ref[:].astype(jnp.float32), S, rows)
    scale_rows = _rows_from_frames(scale_ref[:].astype(jnp.float32), S, rows)
    ln, r, mod = _ln_mod_fwd32(x32, shift_rows, scale_rows, ln_eps, mod_eps)
    dqkvw_ref[:] += jax.lax.dot_general(
        mod.astype(dtype), dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dmod32 = jax.lax.dot_general(
        dqkv, qkvw_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    dx32, dsh_rows, dsc_rows = _ln_mod_bwd32(dmod32, ln, r, scale_rows,
                                             mod_eps)
    dshift_ref[:] = _seg_sum_frames(dsh_rows, S, F_pad).astype(
        dshift_ref.dtype)
    dscale_ref[:] = _seg_sum_frames(dsc_rows, S, F_pad).astype(
        dscale_ref.dtype)
    dx_ref[:] = (ct32 + dx32).astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "n_frames"))
def fused_temporal_branch_bwd(x, shift, scale, g, qkv_w, out_w, rope_freqs,
                              valid, qr, kr, vr, y, ct, num_heads, n_frames):
    """Whole temporal-attention-branch backward as one pallas_call.

    x/ct/y/qr/kr/vr: (N=B*T, S, D) frame-major; shift/scale/g: (N, D);
    rope_freqs: (T, d); valid: (T,) bool or None.
    Returns (dx, dshift, dscale, dg, dW_qkv, dW_out, db_out)."""
    from gtax.kernels.block import temporal_preamble

    N, S, D = x.shape
    T = n_frames
    B = N // T
    d = D // num_heads
    dtype = x.dtype
    cos, sin, R, seg, bias = temporal_preamble(
        rope_freqs, valid, B, S, T, num_heads, d, dtype)

    b_pt = _frames_per_tile(B, T * S, max_rows=_BWD_MAX_ROWS)
    n_tiles = B // b_pt
    tile_rows = b_pt * T * S

    (shift_p, scale_p, g_p, cos_p, sin_p), fpt_pad = _pad_frame_rows(
        (shift, scale, g, cos, sin), b_pt * T, n_tiles)

    def flat(a):
        return a.reshape(N * S, a.shape[-1])

    row_spec = pl.BlockSpec((tile_rows, D), lambda c: (c, 0),
                            memory_space=pltpu.VMEM)
    frame_spec = pl.BlockSpec((fpt_pad, D), lambda c: (c, 0),
                              memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    accw_spec = pl.BlockSpec(qkv_w.shape, lambda c: (0, 0),
                             memory_space=pltpu.VMEM)
    acco_spec = pl.BlockSpec(out_w.shape, lambda c: (0, 0),
                             memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, D), lambda c: (0, 0),
                            memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((N * S, D), dtype),                    # dx
        jax.ShapeDtypeStruct((n_tiles * fpt_pad, D), jnp.float32),  # dshift
        jax.ShapeDtypeStruct((n_tiles * fpt_pad, D), jnp.float32),  # dscale
        jax.ShapeDtypeStruct((n_tiles * fpt_pad, D), jnp.float32),  # dg
        jax.ShapeDtypeStruct(qkv_w.shape, jnp.float32),             # dW_qkv
        jax.ShapeDtypeStruct(out_w.shape, jnp.float32),             # dW_out
        jax.ShapeDtypeStruct((1, D), jnp.float32),                  # db_out
    )
    outs = pl.pallas_call(
        functools.partial(
            _temporal_bwd_kernel, num_heads=num_heads, n_frames=T,
            n_batches=b_pt, seq_len=S, ln_eps=1e-6, mod_eps=1e-6,
            dtype=dtype,
        ),
        out_shape=out_shapes,
        grid=(n_tiles,),
        in_specs=[row_spec, frame_spec, frame_spec, frame_spec,
                  full, full, frame_spec, frame_spec, full, full,
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  row_spec, row_spec, row_spec, row_spec, row_spec],
        out_specs=(row_spec, frame_spec, frame_spec, frame_spec,
                   accw_spec, acco_spec, vec_spec),
        interpret=interpret_mode(),
        compiler_params=_BWD_PARAMS,
    )(flat(x), shift_p, scale_p, g_p, qkv_w, out_w, cos_p, sin_p, R, seg,
      bias, flat(qr), flat(kr), flat(vr), flat(y), flat(ct))
    dx, dshift_p, dscale_p, dg_p, dqkvw, doutw, doutb = outs

    def unpad(a):
        return a.reshape(n_tiles, fpt_pad, D)[:, :b_pt * T].reshape(N, D)

    return (dx.reshape(N, S, D), unpad(dshift_p), unpad(dscale_p),
            unpad(dg_p), dqkvw, doutw, doutb.reshape(D))


@functools.partial(jax.jit, static_argnames=())
def fused_mlp_branch_bwd(x, shift, scale, g, w1, w2, h1, y, ct):
    """Whole MLP-branch backward as one pallas_call.

    x/ct/y: (N, S, D); h1: (N, S, H); shift/scale/g: (N, D);
    w1: (D, H); w2: (H, D).
    Returns (dx, dshift, dscale, dg, dW1, db1, dW2, db2) with dW*/db* fp32
    and the rest in the input dtypes — the exact pytree
    gtax.nn.branches.trainable_mlp_branch's bwd returns."""
    N, S, D = x.shape
    H = w1.shape[1]
    dtype = x.dtype
    fpt = _frames_per_tile(N, S, max_rows=_BWD_MAX_ROWS)
    n_tiles = N // fpt
    tile_rows = fpt * S

    xf = x.reshape(N * S, D)
    ctf = ct.reshape(N * S, D)
    yf = y.reshape(N * S, D)
    h1f = h1.reshape(N * S, H)

    (shift_p, scale_p, g_p), fpt_pad = _pad_frame_rows(
        (shift, scale, g), fpt, n_tiles)

    row_spec = pl.BlockSpec((tile_rows, D), lambda c: (c, 0),
                            memory_space=pltpu.VMEM)
    hid_spec = pl.BlockSpec((tile_rows, H), lambda c: (c, 0),
                            memory_space=pltpu.VMEM)
    frame_spec = pl.BlockSpec((fpt_pad, D), lambda c: (c, 0),
                              memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec(w1.shape, lambda c: (0, 0),
                            memory_space=pltpu.VMEM)
    acc2_spec = pl.BlockSpec(w2.shape, lambda c: (0, 0),
                             memory_space=pltpu.VMEM)
    vec1_spec = pl.BlockSpec((1, H), lambda c: (0, 0),
                             memory_space=pltpu.VMEM)
    vec2_spec = pl.BlockSpec((1, D), lambda c: (0, 0),
                             memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((N * S, D), dtype),               # dx
        jax.ShapeDtypeStruct((n_tiles * fpt_pad, D), jnp.float32),  # dshift
        jax.ShapeDtypeStruct((n_tiles * fpt_pad, D), jnp.float32),  # dscale
        jax.ShapeDtypeStruct((n_tiles * fpt_pad, D), jnp.float32),  # dg
        jax.ShapeDtypeStruct((D, H), jnp.float32),             # dW1
        jax.ShapeDtypeStruct((1, H), jnp.float32),             # db1
        jax.ShapeDtypeStruct((H, D), jnp.float32),             # dW2
        jax.ShapeDtypeStruct((1, D), jnp.float32),             # db2
    )
    outs = pl.pallas_call(
        functools.partial(
            _mlp_bwd_kernel, seq_len=S, ln_eps=1e-6, mod_eps=1e-6,
            dtype=dtype,
        ),
        out_shape=out_shapes,
        grid=(n_tiles,),
        in_specs=[row_spec, frame_spec, frame_spec, frame_spec,
                  full, full, hid_spec, row_spec, row_spec],
        out_specs=(row_spec, frame_spec, frame_spec, frame_spec,
                   acc_spec, vec1_spec, acc2_spec, vec2_spec),
        interpret=interpret_mode(),
        compiler_params=_BWD_PARAMS,
    )(xf, shift_p, scale_p, g_p, w1, w2, h1f, yf, ctf)
    dx, dshift_p, dscale_p, dg_p, dw1, db1, dw2, db2 = outs

    def unpad(a):
        return a.reshape(n_tiles, fpt_pad, D)[:, :fpt].reshape(N, D)

    return (dx.reshape(N, S, D), unpad(dshift_p), unpad(dscale_p),
            unpad(dg_p), dw1, db1.reshape(H), dw2, db2.reshape(D))
