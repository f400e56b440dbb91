"""FULL-SIZE pipelined-decoding trajectory check on the real chip (VERDICT
r1 next-#7, at-scale leg).

The dummy-TRAINED probe (scripts/pipelined_quality.py) is the quality
instrument — it has an unambiguous correct output per action. This script
adds the missing SCALE leg: the flagship DiT-S/2 + ViT-L/20 full-size
checkpoints (the gen_golden_full.py fixtures; swap in the shipped
dit.safetensors when network exists), serving config (bf16, fused kernels,
unstacked layout), on the real TPU. For each pipeline depth / broadcast
combo it rolls out the same prompt+rng and reports per-frame decoded PSNR
and latent RMSE against the exact reference-scheme rollout — certifying at
full scale that the approximate schemes track the exact trajectory instead
of diverging (random weights => drift numbers are a numerics/scheme check,
not a perceptual-quality claim).

Usage:  python scripts/fullsize_depth_quality.py [--frames 16] [--steps 20]
Writes: docs/fullsize_depth_quality.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

SCRIPTS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(SCRIPTS)
FULL = os.path.join(REPO, "tests", "golden_full")
sys.path.insert(0, REPO)

from gtax.utils.platform import honor_env_platform

honor_env_platform()  # an explicit JAX_PLATFORMS=cpu must win over axon


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--dit", default=os.path.join(FULL, "dit_full.safetensors"))
    p.add_argument("--vae", default=os.path.join(FULL, "vae_full.safetensors"))
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gtax.io import safetensors_port as port
    from gtax.models.dit import (DiT_MODELS, cast_params_for_inference,
                                 dit_apply, make_pab_fns,
                                 unstack_for_inference)
    from gtax.models.vae import VAE_MODELS
    from gtax.nn import attention as attention_mod
    from gtax.sampling.diffusion import (SamplerConfig, make_pipelined_rollout,
                                         make_rollout)
    from gtax.train.trainer import decode_frames, encode_frames
    from gtax.utils.metrics import per_frame_psnr
    from scripts.parity_rollout_gate import load_prompt

    attention_mod.set_backend("fused")
    dtype = jnp.bfloat16
    dit_cfg = DiT_MODELS["DiT-S/2"]()
    vae_cfg = VAE_MODELS["vit-l-20-shallow-encoder"]()
    dit_params = port.load_dit(args.dit, dit_cfg, verbose=False)
    vae_params = port.load_vae(args.vae, vae_cfg, verbose=False)
    dit_params = jax.jit(
        lambda p: cast_params_for_inference(p, dtype)
    )(dit_params)
    dit_params = unstack_for_inference(dit_params, dit_cfg)

    prompt = load_prompt()
    lat = encode_frames(vae_params, vae_cfg, jnp.asarray(prompt), dtype)

    def dit_fn(params, x, t, a, valid):
        return dit_apply(params, dit_cfg, x, t, a, valid, compute_dtype=dtype)

    num_gen = args.frames - 1
    key = jax.random.PRNGKey(0)

    def run(depth, K):
        cfg = SamplerConfig(ddim_noise_steps=args.steps,
                            stabilization_level=15, attn_broadcast=K)
        pab = make_pab_fns(dit_cfg, dtype) if K > 1 else None
        if depth == 1:
            ro = make_rollout(dit_fn, dit_cfg.max_frames, cfg, pab=pab)
        else:
            ro = make_pipelined_rollout(dit_fn, dit_cfg.max_frames, cfg,
                                        pipeline_depth=depth, pab=pab)
        t0 = time.time()
        out = ro(dit_params, lat, None, key, num_gen_frames=num_gen)
        out.block_until_ready()
        compile_s = time.time() - t0
        t0 = time.time()
        out = ro(dit_params, lat, None, key, num_gen_frames=num_gen)
        out.block_until_ready()
        run_s = time.time() - t0
        vid = np.asarray(
            decode_frames(vae_params, vae_cfg, out.astype(jnp.float32),
                          jnp.float32)[0]
        )
        return np.asarray(out, np.float32), vid, compile_s, run_s

    print("=== exact (depth 1) ===", flush=True)
    lat1, vid1, c1, r1 = run(1, 1)
    print(f"compile {c1:.0f}s run {r1:.2f}s", flush=True)

    results = {
        "device": jax.devices()[0].device_kind,
        "dtype": "bfloat16",
        "frames": args.frames,
        "noise_steps": args.steps,
        "checkpoint": os.path.basename(args.dit),
        "exact_run_s": round(r1, 2),
        "configs": {},
    }
    for depth, K in [(2, 1), (4, 1), (4, 2)]:
        tag = f"depth{depth}" + (f"_K{K}" if K > 1 else "")
        print(f"=== {tag} ===", flush=True)
        latP, vidP, cP, rP = run(depth, K)
        # score GENERATED frames only — the prompt frame is identical by
        # construction (PSNR inf) and would skew the mean
        psnr = per_frame_psnr(vidP[1:], vid1[1:])
        results["configs"][tag] = {
            "psnr_vs_exact_min": round(float(min(psnr)), 1),
            "psnr_vs_exact_mean": round(float(np.mean(psnr)), 1),
            "latent_rmse_vs_exact": round(
                float(np.sqrt(np.mean((latP - lat1) ** 2))), 4
            ),
            "latent_rms_exact": round(float(np.sqrt(np.mean(lat1 ** 2))), 4),
            "run_s": round(rP, 2),
            "speedup_vs_exact": round(r1 / rP, 2),
        }
        print(json.dumps(results["configs"][tag]), flush=True)

    out_path = os.path.join(REPO, "docs", "fullsize_depth_quality.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
