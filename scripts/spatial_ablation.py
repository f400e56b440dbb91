"""Ablation micro-bench for the fused int8 spatial-branch kernel: where do
the ~37us/call above GEMM ideal go? Times kernel variants with pieces
removed (attention, rope, dynamic activation quant) on the real chip.

SUPERSEDED (round 4): this harness's kernel copy predates the lane-roll
rope, stacked softmax, and frame-batched 3D dots — use
scripts/b8_ablation.py, which mirrors the CURRENT cores, for new
measurements. Kept because docs/PERF.md's round-2/3 records cite it.

Context (docs/PERF.md): the int8 forward carries ~0.59 ms/fwd of spatial
overhead vs its int8-GEMM floor; the frame-batched masked big-dot variant
made it WORSE (0.84 -> 1.05 ms/fwd), so the small per-(head, frame) dots are
not dispatch-bound — this pins down what actually costs.

Usage: python scripts/spatial_ablation.py [--calls 200]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gtax.utils.platform import honor_env_platform

honor_env_platform()  # an explicit JAX_PLATFORMS=cpu must win over axon

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gtax.kernels.attention import interpret_mode
from gtax.kernels.block import (_BRANCH_PARAMS, _ln_modulate32,
                                rotate_half_matrix)
from gtax.kernels.quant import _qdot, quantize_weight


def _kernel_abl(x_ref, shift_ref, scale_ref, gate_ref, qkvq_ref, qkvs_ref,
                outq_ref, outs_ref, outb_ref, cos_ref, sin_ref, rot_ref,
                o_ref, *, num_heads, n_frames, seq_len, ln_eps, mod_eps,
                do_rope, do_attn, do_softmax):
    """_spatial_kernel_q with switchable pieces (experiment-only copy)."""
    x = x_ref[:]
    NS, D = x.shape
    S = seq_len
    d = D // num_heads

    x32, mod = _ln_modulate32(x_ref, shift_ref, scale_ref, ln_eps, mod_eps,
                              seq_len)
    qkv = _qdot(mod, qkvq_ref, qkvs_ref)
    q, k, v = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]

    if not do_attn:
        attn_out = q  # fp32 passthrough: GEMMs + LN + quant only
    else:
        cos, sin, R = cos_ref[:], sin_ref[:], rot_ref[:]
        scale_attn = 1.0 / (d**0.5)
        head_outs = []
        for h in range(num_heads):
            sl = slice(h * d, (h + 1) * d)
            qs32, ks32 = q[:, sl], k[:, sl]
            if do_rope:
                qs = (qs32 * cos + jnp.dot(
                    qs32, R, preferred_element_type=jnp.float32
                ) * sin).astype(x.dtype)
                ks = (ks32 * cos + jnp.dot(
                    ks32, R, preferred_element_type=jnp.float32
                ) * sin).astype(x.dtype)
            else:
                qs, ks = qs32.astype(x.dtype), ks32.astype(x.dtype)
            vs = v[:, sl].astype(x.dtype)
            frame_outs = []
            for n in range(n_frames):
                fr = slice(n * S, (n + 1) * S)
                scores = jax.lax.dot_general(
                    qs[fr], ks[fr], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale_attn
                if do_softmax:
                    m = jnp.max(scores, axis=-1, keepdims=True)
                    e = jnp.exp(scores - m)
                    probs = (e / jnp.sum(e, axis=-1, keepdims=True)
                             ).astype(x.dtype)
                else:
                    probs = scores.astype(x.dtype)
                frame_outs.append(jnp.dot(
                    probs, vs[fr], preferred_element_type=jnp.float32))
            head_outs.append(jnp.concatenate(frame_outs, axis=0))
        attn_out = jnp.concatenate(head_outs, axis=-1)

    y = _qdot(attn_out, outq_ref, outs_ref)
    y = y + outb_ref[0].astype(jnp.float32)
    from gtax.kernels.block import _rows_from_frames
    g = _rows_from_frames(gate_ref[:].astype(jnp.float32), seq_len)
    o_ref[:] = (x32 + g * y).astype(o_ref.dtype)


def build(variant, N, S, D, num_heads):
    do_rope = variant in ("full", "no_softmax")
    do_attn = variant != "no_attn"
    do_softmax = variant in ("full", "no_rope")

    @jax.jit
    def call(xf, shift, scale, gate, qkv_q, qkv_s, out_q, out_s, out_b,
             cos, sin, R):
        row = pl.BlockSpec((N * S, D), lambda c: (c, 0),
                           memory_space=pltpu.VMEM)
        frame = pl.BlockSpec((N, D), lambda c: (c, 0),
                             memory_space=pltpu.VMEM)
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        rot = cos.shape[-1]
        return pl.pallas_call(
            functools.partial(
                _kernel_abl, num_heads=num_heads, n_frames=N, seq_len=S,
                ln_eps=1e-6, mod_eps=1e-6, do_rope=do_rope, do_attn=do_attn,
                do_softmax=do_softmax,
            ),
            out_shape=jax.ShapeDtypeStruct(xf.shape, xf.dtype),
            grid=(1,),
            in_specs=[row, frame, frame, frame, full, full, full, full, full,
                      pl.BlockSpec((N * S, rot), lambda c: (c, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((N * S, rot), lambda c: (c, 0),
                                   memory_space=pltpu.VMEM),
                      full],
            out_specs=row,
            interpret=interpret_mode(),
            compiler_params=_BRANCH_PARAMS,
        )(xf, shift, scale, gate, qkv_q, qkv_s, out_q, out_s, out_b,
          cos, sin, R)

    return call


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--calls", type=int, default=200)
    p.add_argument("--frames", type=int, default=5)
    args = p.parse_args()

    N, S, D, H = args.frames, 144, 1024, 16
    d = D // H
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    xf = jax.random.normal(ks[0], (N * S, D), jnp.bfloat16)
    shift = jax.random.normal(ks[1], (N, D), jnp.bfloat16)
    scale = jax.random.normal(ks[2], (N, D), jnp.bfloat16)
    gate = jax.random.normal(ks[3], (N, D), jnp.bfloat16)
    qkv_q, qkv_s = quantize_weight(
        jax.random.normal(ks[4], (D, 3 * D)) * 0.02)
    out_q, out_s = quantize_weight(jax.random.normal(ks[5], (D, D)) * 0.02)
    out_b = jnp.zeros((1, D), jnp.float32)
    cos = jnp.tile(jnp.cos(jax.random.normal(ks[6], (S, d))), (N, 1))
    sin = jnp.tile(jnp.sin(jax.random.normal(ks[7], (S, d))), (N, 1))
    R = jnp.asarray(rotate_half_matrix(d))
    operands = (xf, shift, scale, gate, qkv_q, qkv_s.reshape(1, -1),
                out_q, out_s.reshape(1, -1), out_b, cos, sin, R)

    results = {}
    for variant in ("full", "no_softmax", "no_rope", "no_attn"):
        call = build(variant, N, S, D, H)

        # K dependent calls in ONE program, timed via a host fetch of a
        # reduced scalar — through the axon tunnel block_until_ready returns
        # without waiting (same harness as scripts/fwd_bench.py)
        def mk(length):
            @jax.jit
            def chain(x0, ops):
                def body(c, _):
                    y = call(c, *ops[1:])
                    return y, ()
                y, _ = jax.lax.scan(body, x0, None, length=length)
                return jnp.sum(y.astype(jnp.float32))
            return chain

        # chain-length differencing cancels the tunnel's per-program
        # fetch+dispatch constant (~26-29 ms measured 2026-08-20)
        short, long_ = mk(args.calls), mk(4 * args.calls)
        float(short(xf, operands)), float(long_(xf, operands))
        ts, tl = [], []
        for _ in range(2):
            t0 = time.perf_counter(); float(short(xf, operands))
            ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(long_(xf, operands))
            tl.append(time.perf_counter() - t0)
        per = (min(tl) - min(ts)) / (3 * args.calls) * 1e6
        results[variant] = round(per, 1)
        print(f"{variant:12s} {per:8.1f} us/call", flush=True)

    print({"device": jax.devices()[0].device_kind, "us_per_call": results})


if __name__ == "__main__":
    main()
