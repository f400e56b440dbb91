"""Per-kernel latency of the int8 serving kernels vs batch size.

Times fused_spatial_branch_q / fused_mlp_branch_q / fused_temporal_step_q at
incremental-serving shapes (N = B live frames, S=144, D=1024) for
B in {1, 2, 4, 8, 16}, with the analytic int8-MXU floor for each — the
"does batched serving scale" microscope for VERDICT r2 #2. Same
scan-chain + scalar-fetch harness as scripts/spatial_ablation.py (the axon
tunnel returns from block_until_ready early, so we time a K-call chained
program via a reduced host fetch).

Usage: python scripts/kernel_bench.py [--calls 200] [--batches 1,2,4,8,16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gtax.utils.platform import enable_compile_cache, honor_env_platform

honor_env_platform()
enable_compile_cache()

import jax
import jax.numpy as jnp

from gtax.core import rope
from gtax.kernels.quant import (
    fused_mlp_branch_q,
    fused_spatial_branch_q,
    fused_temporal_step_q,
    quantize_weight,
)

S, D, HEADS, HID, N_CTX = 144, 1024, 16, 4096, 4
INT8_TOPS = 394e12  # v5e MXU int8 peak


def time_chain(call, x, calls):
    """us/call of `call` (x -> same-shape y) via a K-long dependent chain."""

    @jax.jit
    def chain(x0):
        def body(c, _):
            return call(c), ()

        y, _ = jax.lax.scan(body, x0, None, length=calls)
        return jnp.sum(y.astype(jnp.float32))

    float(chain(x))  # compile + warm
    t0 = time.perf_counter()
    float(chain(x))
    t1 = time.perf_counter()
    float(chain(x))
    return min(t1 - t0, time.perf_counter() - t1) / calls * 1e6


def time_chain_diff(call, x, calls):
    """us/call via chain-length differencing: times K- and 4K-call chains and
    takes the slope, cancelling the tunnel's per-program fetch+dispatch
    constant (measured ~26-29 ms on 2026-08-20 — at K=100-200 that constant
    alone is 130-290 us/call of pure measurement artifact)."""

    def make(length):
        @jax.jit
        def chain(x0):
            def body(c, _):
                return call(c), ()
            y, _ = jax.lax.scan(body, x0, None, length=length)
            return jnp.sum(y.astype(jnp.float32))
        return chain

    short, long_ = make(calls), make(4 * calls)
    float(short(x)), float(long_(x))  # compile + warm
    ts, tl = [], []
    for _ in range(2):
        t0 = time.perf_counter()
        float(short(x))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(long_(x))
        tl.append(time.perf_counter() - t0)
    return (min(tl) - min(ts)) / (3 * calls) * 1e6


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--calls", type=int, default=200)
    p.add_argument("--batches", default="1,2,4,8,16")
    args = p.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    d = D // HEADS
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)
    qkv_q, qkv_s = quantize_weight(jax.random.normal(ks[0], (D, 3 * D)) * 0.02)
    out_q, out_s = quantize_weight(jax.random.normal(ks[1], (D, D)) * 0.02)
    out_b = jnp.zeros((D,), jnp.float32)
    w1_q, w1_s = quantize_weight(jax.random.normal(ks[2], (D, HID)) * 0.02)
    w2_q, w2_s = quantize_weight(jax.random.normal(ks[3], (HID, D)) * 0.02)
    b1 = jnp.zeros((HID,), jnp.float32)
    b2 = jnp.zeros((D,), jnp.float32)
    spatial_freqs = rope.axial_freqs(
        rope.pixel_freqs(d // 2, 256.0), (9, 16), pixel=True
    ).reshape(S, -1)
    T = N_CTX + 1
    temporal_freqs = rope.temporal_rope_freqs(
        jnp.arange(T), rope.lang_freqs(d)
    )
    valid = jnp.ones((T,), bool)

    print(f"{'kernel':26s} " + " ".join(f"B={b:<3d}" for b in batches)
          + "   (us/call; [floor])")
    results = {}
    for name in ("spatial_q", "mlp_q", "temporal_step_q"):
        row = []
        for B in batches:
            N = B  # one live frame per stream
            rows = N * S
            x = jax.random.normal(ks[4], (N, S, D), jnp.bfloat16)
            sh = jax.random.normal(ks[5], (N, D), jnp.bfloat16)
            sc = jax.random.normal(ks[6], (N, D), jnp.bfloat16)
            g = jax.random.normal(ks[7], (N, D), jnp.bfloat16)
            if name == "spatial_q":
                floor = rows * D * 4 * D * 2 / INT8_TOPS * 1e6
                fn = lambda c: fused_spatial_branch_q(
                    c, sh, sc, g, qkv_q, qkv_s, out_q, out_s, out_b,
                    spatial_freqs, HEADS)
            elif name == "mlp_q":
                floor = rows * D * HID * 2 * 2 / INT8_TOPS * 1e6
                fn = lambda c: fused_mlp_branch_q(
                    c, sh, sc, g, w1_q, w1_s, b1, w2_q, w2_s, b2)
            else:
                floor = rows * D * 4 * D * 2 / INT8_TOPS * 1e6
                k_ctx = jax.random.normal(
                    ks[8], (B * N_CTX * S, D), jnp.bfloat16)
                v_ctx = jax.random.normal(
                    ks[9], (B * N_CTX * S, D), jnp.bfloat16)
                fn = lambda c: fused_temporal_step_q(
                    c, sh, sc, g, qkv_q, qkv_s, out_q, out_s, out_b,
                    k_ctx, v_ctx, temporal_freqs, valid, HEADS, N_CTX)
            if name == "temporal_step_q" and B > 8:
                continue  # gridless full-VMEM kernel OOMs past B=8
            us = time_chain_diff(fn, x, args.calls)
            row.append((B, round(us, 1), round(floor, 1)))
            print(f"{name:20s} B={B:<3d} {us:8.1f} us/call "
                  f"(int8-GEMM floor {floor:.1f})", flush=True)
        results[name] = row
    print({"device": jax.devices()[0].device_kind, "results": results})


if __name__ == "__main__":
    main()
