"""Flat-argument DiT branch functions: XLA reference implementations and
TRAINABLE fused wrappers.

The Pallas whole-branch megakernels (gtax.kernels.block) are forward-only —
pallas_call has no autodiff. Each trainable wrapper is a jax.custom_vjp:

- the PRIMAL path (inference) runs the plain fused kernel — no extra
  outputs, so serving rollouts pay nothing;
- under differentiation, the forward runs the kernel with emit_train=True,
  which ALSO writes out the branch's internal residuals (post-rope q/k,
  cast v, and the pre-gate output for attention; the pre-gelu fc1
  activation and pre-gate output for the MLP);
- the BACKWARD is hand-derived XLA that consumes those residuals: every
  forward GEMM's output is already in hand, so the backward runs exactly
  the ~2x-forward transpose GEMMs plus cheap elementwise recomputes
  (LN/modulate/gelu/softmax re-derived via jax.vjp over the same
  gtax.nn.layers helpers — one implementation, no drift).

Round-2 history: the first trainable wrappers recomputed the WHOLE branch
forward in XLA inside bwd (jax.vjp(xla_fn, *inputs)) — flash-attention
style, but it made a train step spend ~4x forward FLOPs, and the XLA branch
forward is ~2x slower than the fused kernel on v5e (docs/PERF.md MFU
attribution). Emitting residuals cuts the recompute GEMMs out of the step.

Gradient parity vs the pure-XLA path is tested (tests/test_kernels.py,
<= 5e-4 fp32). The rope FREQUENCY tables get a zero cotangent by
construction — the reference keeps them frozen (learned_freq=False,
rotary_embedding_torch.py:138-144) and gtax stop_gradients them at the
call site (gtax/models/dit.py), so nothing downstream ever consumes a
nonzero value.

Branch semantics parity target: SpatioTemporalDiTBlock
(/root/reference/model/dit.py:200-225).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

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

# The branch backwards run as fused Pallas kernels (gtax.kernels.backward)
# by default; GTAX_XLA_BWD=1 falls back to the hand-derived XLA backward
# below (the round-2 path — kept as the parity reference and escape hatch).
_PALLAS_BWD = os.environ.get("GTAX_XLA_BWD") != "1"


def use_pallas_bwd() -> bool:
    return _PALLAS_BWD


def set_pallas_bwd(value: bool) -> None:
    """Toggle the fused Pallas branch backwards (tests compare both paths)."""
    global _PALLAS_BWD
    _PALLAS_BWD = bool(value)


# int8 TRAINING forward: the branch primal runs the W8A8 kernels (v5e MXU
# int8 = 2x bf16) while the backward stays bf16 over the int8 forward's
# actual residuals. Off by default — quality-gated by the loss-trajectory
# overlay in docs/train_int8_fwd.json (scripts/train_mfu.py --int8-fwd,
# scripts/dummy_convergence.py).
_INT8_FWD = os.environ.get("GTAX_INT8_FWD") == "1"


def use_int8_fwd() -> bool:
    return _INT8_FWD


def set_int8_fwd(value: bool) -> None:
    """Toggle int8-forward training (read at trace time by gtax.models.dit)."""
    global _INT8_FWD
    _INT8_FWD = bool(value)


def _wgrad(a, b, dtype, out_dtype):
    """Weight gradient a^T @ b contracted over the (N, S) token axes, MXU
    operands in the compute dtype, fp32 accumulation (matches _linear's AD
    transpose)."""
    return jnp.einsum(
        "nsd,nse->de", a.astype(dtype), b.astype(dtype),
        preferred_element_type=jnp.float32,
        precision=matmul_precision(jnp.dtype(dtype)),
    ).astype(out_dtype)


def _dmat(a, w, dtype, out_dtype):
    """Input gradient a @ w^T (activation cotangent through a linear)."""
    return jnp.einsum(
        "nse,de->nsd", a.astype(dtype), w.astype(dtype),
        preferred_element_type=jnp.float32,
        precision=matmul_precision(jnp.dtype(dtype)),
    ).astype(out_dtype)


def _gate_bwd(ct, g, y):
    """out = x + g[:, None, :] * y -> (ct32, dg, dy) in fp32."""
    ct32 = ct.astype(jnp.float32)
    dg = jnp.sum(ct32 * y.astype(jnp.float32), axis=1).astype(g.dtype)
    dy = ct32 * g.astype(jnp.float32)[:, None, :]
    return ct32, dg, dy


def _rope_transpose(freqs, u):
    """Adjoint of apply_rotary_emb for FULL-width rotation: the forward is
    t -> t*cos(f) + rotate_half(t)*sin(f) and rotate_half's transpose is
    w -> -rotate_half(w), so F^T(u) = u*cos(f) - rotate_half(u*sin(f)) —
    exact for any frequency table (not just pairwise-duplicated ones)."""
    f32 = freqs.astype(jnp.float32)
    u32 = u.astype(jnp.float32)
    out = u32 * jnp.cos(f32) - rope.rotate_half(u32 * jnp.sin(f32))
    return out.astype(u.dtype)


@functools.lru_cache(maxsize=None)
def trainable_spatial_branch(num_heads: int, dtype_name: str,
                             quant: bool = False):
    dtype = jnp.dtype(dtype_name)
    from gtax.kernels.block import fused_spatial_branch

    if quant:
        # int8-forward training (W8A8 GEMMs in the primal; the backward is
        # the UNCHANGED bf16 path over the int8 forward's actual residuals —
        # a straight-through estimator over the quantization, standard for
        # quantized training). Weights quantize per call from the live bf16
        # values; XLA hoists the (loop-invariant) quantization out of the
        # grad-accumulation scan.
        from gtax.kernels.quant import fused_spatial_branch_q, quantize_weight

        def branch_fwd(x, shift, scale, g, qkv_w, out_w, out_b, rope_freqs,
                       emit):
            qkv_q, qkv_s = quantize_weight(qkv_w)
            out_q, out_s = quantize_weight(out_w)
            return fused_spatial_branch_q(
                x, shift, scale, g, qkv_q, qkv_s, out_q, out_s, out_b,
                rope_freqs, num_heads, emit_train=emit)
    else:
        def branch_fwd(x, shift, scale, g, qkv_w, out_w, out_b, rope_freqs,
                       emit):
            return fused_spatial_branch(
                x, shift, scale, g, qkv_w, out_w, out_b, rope_freqs,
                num_heads, emit_train=emit)

    @jax.custom_vjp
    def f(x, shift, scale, g, qkv_w, out_w, out_b, rope_freqs):
        return branch_fwd(x, shift, scale, g, qkv_w, out_w, out_b,
                          rope_freqs, False)

    def fwd(x, shift, scale, g, qkv_w, out_w, out_b, rope_freqs):
        out, qr, kr, vr, y = branch_fwd(
            x, shift, scale, g, qkv_w, out_w, out_b, rope_freqs, True)
        return out, (x, shift, scale, g, qkv_w, out_w, out_b, rope_freqs,
                     qr, kr, vr, y)

    def bwd(res, ct):
        (x, shift, scale, g, qkv_w, out_w, out_b, rope_freqs,
         qr, kr, vr, y) = res
        if use_pallas_bwd():
            from gtax.kernels.backward import fused_spatial_branch_bwd

            dx, dshift, dscale, dg, dW_qkv, dW_out, db_out = (
                fused_spatial_branch_bwd(x, shift, scale, g, qkv_w, out_w,
                                         rope_freqs, qr, kr, vr, y, ct,
                                         num_heads=num_heads))
            return (dx, dshift.astype(shift.dtype),
                    dscale.astype(scale.dtype), dg.astype(g.dtype),
                    dW_qkv.astype(qkv_w.dtype), dW_out.astype(out_w.dtype),
                    db_out.astype(out_b.dtype), jnp.zeros_like(rope_freqs))
        N, S, D = x.shape
        d = D // num_heads
        ct32, dg, dy = _gate_bwd(ct, g, y)

        # proj: y = ao @ out_w + out_b; ao recomputed from the emitted
        # post-rope q/k and v via the same sdpa helper the XLA path uses
        # (2 small MXU dots fwd + their AD — no large-GEMM recompute)
        def sdpa_fn(q_, k_, v_):
            q4 = q_.reshape(N, S, num_heads, d)
            k4 = k_.reshape(N, S, num_heads, d)
            v4 = v_.reshape(N, S, num_heads, d)
            return _sdpa_heads_last(q4, k4, v4).reshape(N, S, D)

        ao, sdpa_vjp = jax.vjp(sdpa_fn, qr, kr, vr)
        dW_out = _wgrad(ao, dy, dtype, out_w.dtype)
        db_out = jnp.sum(dy, axis=(0, 1)).astype(out_b.dtype)
        dao = _dmat(dy, out_w, dtype, ao.dtype)
        dqr, dkr, dvr = sdpa_vjp(dao)

        rf = rope_freqs[:, None, :]
        dq = _rope_transpose(
            rf, dqr.reshape(N, S, num_heads, d)).reshape(N, S, D)
        dk = _rope_transpose(
            rf, dkr.reshape(N, S, num_heads, d)).reshape(N, S, D)
        dqkv = jnp.concatenate([dq, dk, dvr], axis=-1)

        def pre_fn(x_, sh_, sc_):
            return modulate(layer_norm(x_), sh_, sc_)

        mod, pre_vjp = jax.vjp(pre_fn, x, shift, scale)
        dW_qkv = _wgrad(mod, dqkv, dtype, qkv_w.dtype)
        dmod = _dmat(dqkv, qkv_w, dtype, mod.dtype)
        dx_pre, dshift, dscale = pre_vjp(dmod)
        dx = (ct32 + dx_pre.astype(jnp.float32)).astype(x.dtype)
        return (dx, dshift, dscale, dg, dW_qkv, dW_out, db_out,
                jnp.zeros_like(rope_freqs))

    f.defvjp(fwd, bwd)
    return f


@functools.lru_cache(maxsize=None)
def trainable_temporal_branch(num_heads: int, n_frames: int, has_valid: bool,
                              dtype_name: str, quant: bool = False):
    dtype = jnp.dtype(dtype_name)
    from gtax.kernels.block import fused_temporal_branch

    if quant:
        # int8-forward training; see trainable_spatial_branch
        from gtax.kernels.quant import (
            fused_temporal_branch_q,
            quantize_weight,
        )

        def branch_fwd(x, shift, scale, g, qkv_w, out_w, out_b, rope_freqs,
                       valid, emit):
            qkv_q, qkv_s = quantize_weight(qkv_w)
            out_q, out_s = quantize_weight(out_w)
            return fused_temporal_branch_q(
                x, shift, scale, g, qkv_q, qkv_s, out_q, out_s, out_b,
                rope_freqs, valid, num_heads, n_frames, emit_train=emit)
    else:
        def branch_fwd(x, shift, scale, g, qkv_w, out_w, out_b, rope_freqs,
                       valid, emit):
            return fused_temporal_branch(
                x, shift, scale, g, qkv_w, out_w, out_b, rope_freqs, valid,
                num_heads, n_frames, emit_train=emit)

    def bwd_core(res, ct, valid):
        (x, shift, scale, g, qkv_w, out_w, out_b, rope_freqs,
         qr, kr, vr, y) = res
        if use_pallas_bwd():
            from gtax.kernels.backward import fused_temporal_branch_bwd

            dx, dshift, dscale, dg, dW_qkv, dW_out, db_out = (
                fused_temporal_branch_bwd(x, shift, scale, g, qkv_w, out_w,
                                          rope_freqs, valid, qr, kr, vr, y,
                                          ct, num_heads=num_heads,
                                          n_frames=n_frames))
            return (dx, dshift.astype(shift.dtype),
                    dscale.astype(scale.dtype), dg.astype(g.dtype),
                    dW_qkv.astype(qkv_w.dtype), dW_out.astype(out_w.dtype),
                    db_out.astype(out_b.dtype), jnp.zeros_like(rope_freqs))
        N, S, D = x.shape
        T = n_frames
        B = N // T
        d = D // num_heads
        ct32, dg, dy = _gate_bwd(ct, g, y)

        causal = jnp.tril(jnp.ones((T, T), dtype=bool))
        if valid is not None:
            key_ok = jnp.logical_or(valid[None, :], jnp.eye(T, dtype=bool))
            mask = jnp.logical_and(causal, key_ok)
        else:
            mask = causal
        precision = matmul_precision(jnp.dtype(dtype))

        def sdpa_fn(q_, k_, v_):
            # the post-rope half of xla_temporal_branch, verbatim semantics
            q5 = q_.reshape(B, T, S, num_heads, d)
            k5 = k_.reshape(B, T, S, num_heads, d)
            v5 = v_.reshape(B, T, S, num_heads, d)
            logits = (
                jnp.einsum(
                    "bqshd,bkshd->bshqk", q5, k5,
                    preferred_element_type=jnp.float32, precision=precision,
                )
                * (1.0 / d**0.5)
            )
            logits = jnp.where(mask, logits, jnp.float32(-1e30))
            probs = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum(
                "bshqk,bkshd->bqshd", probs.astype(q5.dtype), v5,
                preferred_element_type=jnp.float32, precision=precision,
            ).astype(q5.dtype)
            return out.reshape(N, S, D)

        ao, sdpa_vjp = jax.vjp(sdpa_fn, qr, kr, vr)
        dW_out = _wgrad(ao, dy, dtype, out_w.dtype)
        db_out = jnp.sum(dy, axis=(0, 1)).astype(out_b.dtype)
        dao = _dmat(dy, out_w, dtype, ao.dtype)
        dqr, dkr, dvr = sdpa_vjp(dao)

        rf = rope_freqs[:, None, None, :]  # (T, 1, 1, rot)
        dq = _rope_transpose(
            rf, dqr.reshape(B, T, S, num_heads, d)).reshape(N, S, D)
        dk = _rope_transpose(
            rf, dkr.reshape(B, T, S, num_heads, d)).reshape(N, S, D)
        dqkv = jnp.concatenate([dq, dk, dvr], axis=-1)

        def pre_fn(x_, sh_, sc_):
            return modulate(layer_norm(x_), sh_, sc_)

        mod, pre_vjp = jax.vjp(pre_fn, x, shift, scale)
        dW_qkv = _wgrad(mod, dqkv, dtype, qkv_w.dtype)
        dmod = _dmat(dqkv, qkv_w, dtype, mod.dtype)
        dx_pre, dshift, dscale = pre_vjp(dmod)
        dx = (ct32 + dx_pre.astype(jnp.float32)).astype(x.dtype)
        return (dx, dshift, dscale, dg, dW_qkv, dW_out, db_out,
                jnp.zeros_like(rope_freqs))

    if has_valid:
        @jax.custom_vjp
        def f(x, shift, scale, g, qkv_w, out_w, out_b, rope_freqs, valid):
            return branch_fwd(x, shift, scale, g, qkv_w, out_w, out_b,
                              rope_freqs, valid, False)

        def fwd(x, shift, scale, g, qkv_w, out_w, out_b, rope_freqs, valid):
            out, qr, kr, vr, y = branch_fwd(
                x, shift, scale, g, qkv_w, out_w, out_b, rope_freqs, valid,
                True)
            return out, ((x, shift, scale, g, qkv_w, out_w, out_b,
                          rope_freqs, qr, kr, vr, y), valid)

        def bwd(res_valid, ct):
            res, valid = res_valid
            return bwd_core(res, ct, valid) + (
                np.zeros(valid.shape, dtype=jax.dtypes.float0),
            )
    else:
        @jax.custom_vjp
        def f(x, shift, scale, g, qkv_w, out_w, out_b, rope_freqs):
            return branch_fwd(x, shift, scale, g, qkv_w, out_w, out_b,
                              rope_freqs, None, False)

        def fwd(x, shift, scale, g, qkv_w, out_w, out_b, rope_freqs):
            out, qr, kr, vr, y = branch_fwd(
                x, shift, scale, g, qkv_w, out_w, out_b, rope_freqs, None,
                True)
            return out, (x, shift, scale, g, qkv_w, out_w, out_b,
                         rope_freqs, qr, kr, vr, y)

        def bwd(res, ct):
            return bwd_core(res, ct, None)

    f.defvjp(fwd, bwd)
    return f


@functools.lru_cache(maxsize=None)
def trainable_mlp_branch(dtype_name: str, quant: bool = False):
    dtype = jnp.dtype(dtype_name)
    from gtax.kernels.block import fused_mlp_branch

    if quant:
        # int8-forward training; see trainable_spatial_branch
        from gtax.kernels.quant import fused_mlp_branch_q, quantize_weight

        def branch_fwd(x, shift, scale, g, w1, b1, w2, b2, emit):
            w1_q, w1_s = quantize_weight(w1)
            w2_q, w2_s = quantize_weight(w2)
            return fused_mlp_branch_q(x, shift, scale, g, w1_q, w1_s, b1,
                                      w2_q, w2_s, b2, emit_train=emit)
    else:
        def branch_fwd(x, shift, scale, g, w1, b1, w2, b2, emit):
            return fused_mlp_branch(x, shift, scale, g, w1, b1, w2, b2,
                                    emit_train=emit)

    @jax.custom_vjp
    def f(x, shift, scale, g, w1, b1, w2, b2):
        return branch_fwd(x, shift, scale, g, w1, b1, w2, b2, False)

    def fwd(x, shift, scale, g, w1, b1, w2, b2):
        out, h1, y = branch_fwd(x, shift, scale, g, w1, b1, w2, b2, True)
        return out, (x, shift, scale, g, w1, b1, w2, b2, h1, y)

    def bwd(res, ct):
        x, shift, scale, g, w1, b1, w2, b2, h1, y = res
        if use_pallas_bwd():
            from gtax.kernels.backward import fused_mlp_branch_bwd

            dx, dshift, dscale, dg, dW1, db1, dW2, db2 = (
                fused_mlp_branch_bwd(x, shift, scale, g, w1, w2, h1, y, ct))
            return (dx, dshift.astype(shift.dtype),
                    dscale.astype(scale.dtype), dg.astype(g.dtype),
                    dW1.astype(w1.dtype), db1.astype(b1.dtype),
                    dW2.astype(w2.dtype), db2.astype(b2.dtype))
        ct32, dg, dy = _gate_bwd(ct, g, y)

        # fc2: y = gelu(h1) @ w2 + b2, with h1 the emitted pre-gelu fc1
        # activation — gelu/gelu' recompute is elementwise VPU work
        ha, gelu_vjp = jax.vjp(gelu_tanh, h1)
        dW2 = _wgrad(ha, dy, dtype, w2.dtype)
        db2 = jnp.sum(dy, axis=(0, 1)).astype(b2.dtype)
        dha = _dmat(dy, w2, dtype, ha.dtype)
        (dh1,) = gelu_vjp(dha)

        def pre_fn(x_, sh_, sc_):
            return modulate(layer_norm(x_), sh_, sc_)

        mod, pre_vjp = jax.vjp(pre_fn, x, shift, scale)
        dW1 = _wgrad(mod, dh1, dtype, w1.dtype)
        db1 = jnp.sum(dh1, axis=(0, 1)).astype(b1.dtype)
        dmod = _dmat(dh1, w1, dtype, mod.dtype)
        dx_pre, dshift, dscale = pre_vjp(dmod)
        dx = (ct32 + dx_pre.astype(jnp.float32)).astype(x.dtype)
        return dx, dshift, dscale, dg, dW1, db1, dW2, db2

    f.defvjp(fwd, bwd)
    return f
