"""Experiment: int8 MLP kernel with TWO hidden chunks per grid body.

The serial per-chunk chain fc1 -> rescale/gelu/requant -> fc2 leaves the
VPU work unoverlapped with the MXU (B=8: 78 us/call vs 49 floor); the
round-4 cross-grid-step software pipeline made it WORSE (+14 us — scratch
round-trips). This variant processes chunk pairs inside ONE body as two
independent dataflow chains, letting Mosaic's in-body scheduler interleave
GEMM(2c+1) with VPU(2c) without any scratch traffic.

Usage: python scripts/mlp2_exp.py [--batch 8] [--calls 100]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gtax.utils.platform import enable_compile_cache, honor_env_platform

honor_env_platform()
enable_compile_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gtax.kernels.attention import interpret_mode
from gtax.kernels.block import _ln_modulate32, _rows_from_frames
from gtax.kernels.quant import (
    _quant_rows,
    fused_mlp_branch_q,
    quantize_weight,
)

S, D, HID = 144, 1024, 4096


def _mlp2_kernel(x_ref, shift_ref, scale_ref, gate_ref, w1q_ref, w1s_ref,
                 b1_ref, w2q_ref, w2s_ref, b2_ref, o_ref, qmod_ref, qs_ref,
                 acc_ref, *, seq_len, ln_eps, mod_eps, approx_gelu,
                 n_steps, sub):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        x32, mod = _ln_modulate32(x_ref, shift_ref, scale_ref, ln_eps,
                                  mod_eps, seq_len)
        q, s = _quant_rows(mod)
        qmod_ref[:] = q
        qs_ref[:] = s
        acc_ref[:] = jnp.zeros_like(acc_ref)

    hc = w1q_ref.shape[1] // sub
    qmod = qmod_ref[:]
    qs = qs_ref[:]
    # `sub` independent sub-chunk chains inside one body: fc1(a), fc1(b)
    # issue back-to-back on the MXU while gelu(a) runs on the VPU, etc.
    parts = []
    for i in range(sub):
        sl = slice(i * hc, (i + 1) * hc)
        acc1 = jax.lax.dot_general(
            qmod, w1q_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        h = (acc1.astype(jnp.float32) * qs * w1s_ref[:, sl]
             + b1_ref[0, sl].astype(jnp.float32))
        h = jax.nn.gelu(h, approximate=approx_gelu)
        hq, hs = _quant_rows(h)
        part = jax.lax.dot_general(
            hq, w2q_ref[sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        parts.append(part.astype(jnp.float32) * hs)
    total = parts[0]
    for p in parts[1:]:
        total = total + p
    acc_ref[:] += total

    @pl.when(c == n_steps - 1)
    def _():
        x32 = x_ref[:].astype(jnp.float32)
        y = acc_ref[:] * w2s_ref[:] + b2_ref[0].astype(jnp.float32)
        g = _rows_from_frames(gate_ref[:].astype(jnp.float32), seq_len,
                              x32.shape[0])
        o_ref[:] = (x32 + g * y).astype(o_ref.dtype)


def build(N, sub, nsteps):
    hc_big = HID // nsteps

    @jax.jit
    def call(x, sh, sc, g, w1q, w1s, b1, w2q, w2s, b2):
        xf = x.reshape(N * S, D)
        out = _call_flat(xf, sh, sc, g, w1q, w1s, b1, w2q, w2s, b2)
        return out.reshape(N, S, D)

    def _call_flat(xf, sh, sc, g, w1q, w1s, b1, w2q, w2s, b2):
        row = pl.BlockSpec((N * S, D), lambda t, c: (t, 0),
                           memory_space=pltpu.VMEM)
        frame = pl.BlockSpec((N, D), lambda t, c: (t, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(
                _mlp2_kernel, seq_len=S, ln_eps=1e-6, mod_eps=1e-6,
                approx_gelu=True, n_steps=nsteps, sub=sub,
            ),
            out_shape=jax.ShapeDtypeStruct(xf.shape, xf.dtype),
            grid=(1, nsteps),
            in_specs=[
                row, frame, frame, frame,
                pl.BlockSpec((D, hc_big), lambda t, c: (0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hc_big), lambda t, c: (0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hc_big), lambda t, c: (0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hc_big, D), lambda t, c: (c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D), lambda t, c: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D), lambda t, c: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=row,
            scratch_shapes=[
                pltpu.VMEM((N * S, D), jnp.int8),
                pltpu.VMEM((N * S, 1), jnp.float32),
                pltpu.VMEM((N * S, D), jnp.float32),
            ],
            interpret=interpret_mode(),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        )(xf, sh, sc, g, w1q, w1s.reshape(1, -1), b1.reshape(1, -1), w2q,
          w2s.reshape(1, -1), b2.reshape(1, -1))

    return call


def time_chain_diff(call, x, calls):
    def make(length):
        @jax.jit
        def chain(x0):
            def body(c, _):
                return call(c), ()
            y, _ = jax.lax.scan(body, x0, None, length=length)
            return jnp.sum(y.astype(jnp.float32))
        return chain
    short, long_ = make(calls), make(4 * calls)
    float(short(x)), float(long_(x))
    ts, tl = [], []
    for _ in range(2):
        t0 = time.perf_counter(); float(short(x))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(long_(x))
        tl.append(time.perf_counter() - t0)
    return (min(tl) - min(ts)) / (3 * calls) * 1e6


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--calls", type=int, default=100)
    args = p.parse_args()
    N = args.batch
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(ks[0], (N, S, D), jnp.bfloat16)
    sh = jax.random.normal(ks[1], (N, D), jnp.bfloat16)
    sc = jax.random.normal(ks[2], (N, D), jnp.bfloat16)
    g = jax.random.normal(ks[3], (N, D), jnp.bfloat16)
    w1q, w1s = quantize_weight(jax.random.normal(ks[4], (D, HID)) * .02)
    w2q, w2s = quantize_weight(jax.random.normal(ks[5], (HID, D)) * .02)
    b1 = jnp.zeros((HID,), jnp.float32)
    b2 = jnp.zeros((D,), jnp.float32)

    base = lambda c: fused_mlp_branch_q(c, sh, sc, g, w1q, w1s, b1, w2q,
                                        w2s, b2)
    us = time_chain_diff(base, x, args.calls)
    print(f"production (8 serial chunks): {us:8.1f} us/call", flush=True)
    for nsteps, sub in ((4, 2), (2, 4), (4, 4)):
        if HID % (nsteps * sub):
            continue
        fn = build(N, sub, nsteps)
        f2 = lambda c, fn=fn: fn(c, sh, sc, g, w1q, w1s, b1, w2q, w2s, b2)
        us = time_chain_diff(f2, x, args.calls)
        print(f"steps={nsteps} x sub={sub}:      {us:8.1f} us/call",
              flush=True)

    # parity
    a = base(x)
    b = build(N, 2, 4)(x, sh, sc, g, w1q, w1s, b1, w2q, w2s, b2)
    import numpy as np
    print("max abs diff vs production:",
          float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                - b.astype(jnp.float32)))))


if __name__ == "__main__":
    main()
