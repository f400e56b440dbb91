"""Per-forward latency of the flagship DiT under each attention backend, plus
an optional jax.profiler trace (VERDICT r1 next-#3 measurement harness).

Usage:  python scripts/fwd_bench.py [--dtype bfloat16] [--repeats 20]
            [--profile DIR] [--backends xla,fused,fused_all]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gtax.utils.platform import honor_env_platform

honor_env_platform()  # an explicit JAX_PLATFORMS=cpu must win over axon


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--repeats", type=int, default=20)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--profile", default=None)
    p.add_argument("--unstack", action="store_true",
                   help="per-block weight pytrees (the serving layout)")
    p.add_argument("--backends", default="xla,pallas,fused,fused_mlp,fused_all")
    p.add_argument("--incremental", action="store_true",
                   help="time the incremental-decoding step (last-frame "
                        "forward over a prefilled context K/V cache)")
    p.add_argument("--quantize", choices=["none", "int8"], default="none",
                   help="int8 = W8A8 serving params (backend list is "
                        "ignored; the quantized path always takes the int8 "
                        "Pallas kernels)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gtax.models.dit import (DiT_MODELS, cast_params_for_inference,
                                 dit_apply, dit_init)
    from gtax.nn import attention as attention_mod
    from gtax.utils.profiling import dit_forward_flops, trace

    cfg = DiT_MODELS["DiT-S/2"]()
    dtype = jnp.dtype(args.dtype)
    params = jax.jit(lambda k: dit_init(k, cfg))(jax.random.PRNGKey(0))
    if dtype != jnp.float32:
        params = jax.jit(lambda p: cast_params_for_inference(p, dtype))(params)
    if args.unstack or args.incremental:  # incremental needs per-block trees
        from gtax.models.dit import unstack_for_inference

        params = unstack_for_inference(params, cfg)
    if args.quantize == "int8":
        from gtax.models.dit import quantize_for_inference

        params = quantize_for_inference(params, cfg)
        args.backends = "int8"  # label only; quant params force int8 kernels

    B = args.batch
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 5, 16, 18, 32))
    t = jnp.full((B, 5), 15, jnp.int32)
    a = jax.random.normal(jax.random.PRNGKey(2), (B, 5, 25))

    flops = dit_forward_flops(cfg, B, 5)
    K = args.repeats  # forwards per timed program

    if args.incremental:
        # incremental-decoding step latency: chain K last-frame steps over a
        # fixed prefilled context cache (the rollout's hot loop)
        from gtax.models.dit import dit_apply_step, dit_cond, dit_prefill

        attention_mod.set_backend("fused")
        mods = jax.jit(
            lambda p, tt, aa: dit_cond(p, cfg, tt, aa, dtype)
        )(params, t, a)
        mods_ctx = jax.tree.map(lambda m: m[:, :-1], mods)
        mods_last = jax.tree.map(lambda m: m[:, -1:], mods)
        kv = jax.jit(
            lambda p, xc, mc: dit_prefill(p, cfg, xc, mc, None, dtype)
        )(params, x[:, :-1], mods_ctx)

        def chain(p, x_last, kv, ml):
            def body(xc, _):
                v = dit_apply_step(p, cfg, xc, kv, ml, None, dtype)
                return v.astype(xc.dtype), ()

            out, _ = jax.lax.scan(body, x_last, None, length=K)
            return out

        jchain = jax.jit(
            lambda p, xl, kv, ml: jnp.sum(chain(p, xl, kv, ml))
        )
        xl = x[:, -1:]
        float(jchain(params, xl, kv, mods_last))
        t0 = time.perf_counter()
        float(jchain(params, xl, kv, mods_last))
        t1 = time.perf_counter()
        float(jchain(params, xl, kv, mods_last))
        dt = min(t1 - t0, time.perf_counter() - t1) / K
        print(json.dumps({"device": jax.devices()[0].device_kind,
                          "incremental_step_ms": round(dt * 1e3, 3),
                          "quantize": args.quantize}))
        if args.profile:
            with trace(os.path.join(args.profile, "incremental")):
                jchain(params, xl, kv, mods_last).block_until_ready()
        return

    results = {}
    for backend in args.backends.split(","):
        if backend != "int8":
            attention_mod.set_backend(backend)

        # K chained forwards inside ONE program (device-side scan, each
        # iteration's input depends on the previous output) — per-call host
        # timing through the remote tunnel is unreliable (block_until_ready
        # returns early on small programs), and chaining defeats dead-code
        # elimination and input caching.
        def chain(p, x, t, a):
            def body(xc, _):
                v = dit_apply(p, cfg, xc, t, a, None, compute_dtype=dtype)
                return v.astype(xc.dtype), ()

            out, _ = jax.lax.scan(body, x, None, length=K)
            return out

        # NOTE: time via a host FETCH of a reduced result — through the axon
        # tunnel block_until_ready returns without waiting, so only a
        # round-trip of real bytes bounds the execution.
        jchain = jax.jit(
            lambda p, x, t, a: jnp.sum(chain(p, x, t, a))
        )
        float(jchain(params, x, t, a))  # compile + fetch
        t0 = time.perf_counter()
        float(jchain(params, x, t, a))
        t1 = time.perf_counter()
        float(jchain(params, x, t, a))
        dt = min(t1 - t0, time.perf_counter() - t1) / K
        results[backend] = {
            "fwd_ms": round(dt * 1e3, 2),
            "tflops": round(flops / dt / 1e12, 1),
        }
        print(backend, json.dumps(results[backend]), flush=True)
        if args.profile:
            with trace(os.path.join(args.profile, backend)):
                jchain(params, x, t, a).block_until_ready()
    attention_mod.set_backend("xla")
    print(json.dumps({"device": jax.devices()[0].device_kind,
                      "dtype": dtype.name, "batch": B,
                      "fwd_tflop": round(flops / 1e12, 3),
                      "results": results}))


if __name__ == "__main__":
    main()
