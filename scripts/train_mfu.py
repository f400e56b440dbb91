"""Measure train-step MFU for the DiT on the current accelerator.

The step is the production trainer's math on latents: diffusion-forcing loss
(gtax.sampling.diffusion.diffusion_forcing_loss, reference _shared_step at
/root/reference/train_dit.py:554-682), value_and_grad, global-norm clip,
AdamW update — one jitted, donated program. The frozen-VAE encode is excluded
here to isolate DiT MFU (the BASELINE.md target is "DiT training >= 40% MFU");
with it included the reported number would only go down in the denominator.

MFU = 3 x analytic-forward-FLOPs / (step_time x peak). The 3x fwd+bwd factor
undercounts bwd slightly (it is ~2x fwd for matmuls + recompute under remat),
so the printed number is conservative.

Usage (real chip):
  python scripts/train_mfu.py [--batch 8] [--hidden 1024] [--depth 16]
      [--steps 8] [--remat] [--mu-bf16] [--profile DIR]

Known env limit (docs/PERF.md): the tunnel's remote-compile helper can crash
(HTTP 500) on flagship-sized TRAIN programs; if that happens, ladder down
with --hidden and extrapolate (results at each size are printed as JSON).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gtax.utils.platform import enable_compile_cache, honor_env_platform

honor_env_platform()  # an explicit JAX_PLATFORMS=cpu must win over axon
enable_compile_cache()  # flagship train compiles are minutes; start warm


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--hidden", type=int, default=1024)
    p.add_argument("--depth", type=int, default=16)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--remat-policy", default="full",
                   choices=["full", "dots", "dots_nb"],
                   help="with --remat: 'dots' saves matmul outputs "
                        "(checkpoint_dots) so backward recomputes only "
                        "elementwise work — ~3x-FLOP steps, bounded memory")
    p.add_argument("--unstack", action="store_true",
                   help="per-block weight pytrees + Python block loop instead "
                        "of lax.scan over stacked weights (the serving-layout "
                        "experiment, applied to the TRAIN step: no weight "
                        "slicing or residual dynamic-update-slice in the HLO)")
    p.add_argument("--scan-unroll", type=int, default=1)
    p.add_argument("--mu-bf16", action="store_true",
                   help="store Adam's first moment in bfloat16")
    p.add_argument("--accum", type=int, default=1,
                   help="gradient-accumulation micro-steps per optimizer "
                        "update (accum-as-scan, Trainer semantics): "
                        "amortises the fixed AdamW HBM sweep over "
                        "accum x batch FLOPs at B=8 memory")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--backend", default="xla",
                   help="attention backend; 'fused'/'fused_all' use the "
                        "trainable Pallas kernels (custom_vjp)")
    p.add_argument("--fwd-only", action="store_true",
                   help="time the loss forward alone (no grad/optimizer) — "
                        "diagnostic for attributing step time to fwd vs bwd")
    p.add_argument("--int8-fwd", action="store_true",
                   help="W8A8 train-forward GEMMs (fused backends only); "
                        "backward stays bf16 over the int8 residuals")
    p.add_argument("--profile", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from gtax.models.dit import DiTConfig, dit_apply, dit_init
    from gtax.nn import attention as attention_mod
    from gtax.sampling.diffusion import LossConfig, diffusion_forcing_loss
    from gtax.core import schedules
    from gtax.train.optim import make_optimizer
    from gtax.utils.profiling import MFUCounter, dit_forward_flops, trace

    from gtax.models.dit import unstack_for_inference

    attention_mod.set_backend(args.backend)
    if args.int8_fwd:
        from gtax.nn import branches

        assert args.backend in ("fused", "fused_all")
        branches.set_int8_fwd(True)
    cfg = DiTConfig(hidden_size=args.hidden, depth=args.depth,
                    num_heads=args.heads, block_remat=args.remat,
                    remat_policy=args.remat_policy,
                    scan_unroll=args.scan_unroll)
    dtype = jnp.dtype(args.dtype)
    B, T = args.batch, cfg.max_frames

    params = jax.jit(lambda k: dit_init(k, cfg))(jax.random.PRNGKey(0))
    if args.unstack:
        # per-block pytrees: dit_apply takes its Python-loop path; grads and
        # optax updates flow through the tuple-of-dicts layout unchanged
        params = unstack_for_inference(params, cfg)
    n_params = sum(x.size for x in jax.tree.leaves(params))

    tx, _ = make_optimizer(
        1e-4, 1e-4, 10, 1000, weight_decay=0.0, max_grad_norm=1.0,
        mu_dtype=jnp.bfloat16 if args.mu_bf16 else None,
    )
    opt_state = jax.jit(tx.init)(params)

    betas = schedules.sigmoid_beta_schedule(1000, clamp_min=1e-6)
    abar = schedules.alphas_cumprod_from_betas(betas)
    noise_range = schedules.ddim_noise_range(50)
    loss_cfg = LossConfig(ddim_noise_steps=50, ctx_max_noise_idx=40,
                          n_prompt_frames=4, max_frames=T)

    def dit_fn(prm):
        # remat is per-block inside dit_apply (cfg.block_remat)
        return lambda x, t, a, valid: dit_apply(
            prm, cfg, x, t, a, valid, compute_dtype=dtype
        )

    accum = args.accum

    def loss_for(prm, latents, actions, key):
        mean_loss, sum_loss = diffusion_forcing_loss(
            dit_fn(prm), latents, actions, key, loss_cfg, abar, noise_range
        )
        return sum_loss, mean_loss

    grad_fn = jax.value_and_grad(loss_for, has_aux=True)

    def step(params, opt_state, latents, actions, rng):
        if accum == 1:
            (_, mean_loss), grads = grad_fn(params, latents, actions, rng)
        else:
            # accum-as-scan (Trainer semantics): same micro batch re-fed —
            # the FLOPs and memory behaviour match production accumulation
            def micro(carry, key):
                grads_acc, loss_acc = carry
                (_, mean_loss), grads = grad_fn(params, latents, actions, key)
                return (jax.tree.map(jnp.add, grads_acc, grads),
                        loss_acc + mean_loss), None

            zero = jax.tree.map(jnp.zeros_like, params)
            (grads, loss_sum), _ = jax.lax.scan(
                micro, (zero, 0.0), jax.random.split(rng, accum))
            grads = jax.tree.map(lambda g: g / accum, grads)
            mean_loss = loss_sum / accum
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, mean_loss

    if args.fwd_only:
        def step(params, opt_state, latents, actions, rng):  # noqa: F811
            mean_loss, _ = diffusion_forcing_loss(
                dit_fn(params), latents, actions, rng, loss_cfg, abar,
                noise_range,
            )
            return params, opt_state, mean_loss

    jstep = jax.jit(step, donate_argnums=(0, 1))

    latents = jax.random.normal(
        jax.random.PRNGKey(1), (B, T, cfg.in_channels, cfg.input_h, cfg.input_w)
    )
    actions = jax.random.normal(jax.random.PRNGKey(2), (B, T, 25))

    print(f"compiling: {n_params/1e6:.0f}M params, B={B}, remat={args.remat}, "
          f"mu_bf16={args.mu_bf16}, dtype={dtype.name}", flush=True)
    t0 = time.time()
    key = jax.random.PRNGKey(3)
    params, opt_state, loss = jstep(params, opt_state, latents, actions, key)
    # fetch, don't block_until_ready: through the device tunnel
    # block_until_ready returns without waiting (scripts/fwd_bench.py)
    loss0 = float(loss)
    compile_s = time.time() - t0
    print(f"compiled+step0 in {compile_s:.0f}s, loss={loss0:.4f}", flush=True)

    # warmup WITH a per-step fetch (drains the pipeline), then time a chain
    # of steps dispatched back-to-back with ONE fetch at the end: a real
    # training loop never syncs per step, and through the remote-device
    # tunnel a per-step dispatch+fetch round trip costs ~30 ms that is not
    # device time (docs/PERF.md round-2 measurement)
    for i in range(args.warmup):
        key = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        params, opt_state, loss = jstep(params, opt_state, latents, actions,
                                        key)
        loss_v = float(loss)
        print(f"warmup {i}: {(time.perf_counter()-t0)*1e3:.1f} ms "
              f"loss={loss_v:.4f}", flush=True)

    with trace(args.profile):
        t0 = time.perf_counter()
        for i in range(args.steps):
            key = jax.random.fold_in(key, args.warmup + i)
            params, opt_state, loss = jstep(params, opt_state, latents,
                                            actions, key)
        loss_v = float(loss)  # one sync for the whole chain
        dt = time.perf_counter() - t0
    print(f"{args.steps}-step chain: {dt*1e3:.1f} ms "
          f"({dt*1e3/args.steps:.1f} ms/step)  final loss={loss_v:.4f}",
          flush=True)

    mean_s = dt / args.steps
    n_gen = T - loss_cfg.n_prompt_frames
    flops = 3.0 * dit_forward_flops(cfg, B, T) * n_gen * accum
    mfu = MFUCounter(flops, 1)
    result = {
        "params_m": round(n_params / 1e6, 1),
        "batch": B,
        "accum": accum,
        "hidden": args.hidden,
        "depth": args.depth,
        "remat": args.remat,
        "backend": args.backend,
        "mu_bf16": args.mu_bf16,
        "int8_fwd": args.int8_fwd,
        "device": jax.devices()[0].device_kind,
        "step_ms": round(mean_s * 1e3, 2),
        "flops_per_step": flops,
        "mfu": round(mfu.mfu(mean_s), 4),
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
