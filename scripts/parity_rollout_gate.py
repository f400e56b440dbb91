"""End-to-end sampler PSNR gate: gtax rollout vs the torch reference rollout,
same full-size checkpoint, same prompt, same injected noise (BASELINE.md
correctness gate; VERDICT r1 next-#1).

Runs the reference's OWN generate.py scheme (frame loop + denoise_step,
/root/reference/generate.py:192-235) in torch fp32 on CPU, then the gtax
jitted rollout (gtax.sampling.diffusion.make_rollout) with identical noise,
decodes both through the same full-size VAE, and gates per-frame PSNR.

Because no network access exists in the build environment, the checkpoint is
the full-size random-weight fixture from scripts/gen_golden_full.py — the
exact shipped layout and geometry, just different values. The gate therefore
certifies model+port+sampler parity at full scale; swap in the shipped
dit.safetensors/vit-l-20.safetensors paths to certify against the real
weights when network is available.

Also measures torch-CPU and gtax-CPU per-forward latency (the baseline
methodology input for BASELINE.md).

Usage:  JAX_PLATFORMS=cpu python scripts/parity_rollout_gate.py
          [--frames 8] [--steps 20] [--dit ckpt] [--vae ckpt] [--min-psnr 25]
Writes: tests/golden_full/parity_gate_result.json, ours.mp4 / ref.mp4
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
REFERENCE = "/root/reference"
FULL = os.path.join(REPO, "tests", "golden_full")
sys.path.insert(0, REPO)
sys.path.insert(0, SCRIPTS)

LATENT_SHAPE = (16, 18, 32)
NOISE_ABS_MAX = 20.0
STABILIZATION = 15  # generate.py:138


def load_prompt() -> np.ndarray:
    """Start image -> (1, 1, 3, 360, 640) float32 in [0,1] (the reference's
    custom-image path, generate.py:150-162; same preprocessed array feeds
    both frameworks so resize filter choice cancels out)."""
    from PIL import Image

    img = Image.open(os.path.join(REFERENCE, "images", "start_image_1.jpg"))
    img = img.convert("RGB").resize((640, 360), Image.BILINEAR)
    arr = np.asarray(img, np.float32) / 255.0
    return arr.transpose(2, 0, 1)[None, None]


def torch_rollout(prompt, noise, total_frames, steps):
    """The reference's generate.py rollout, verbatim semantics, fp32 CPU."""
    import torch

    from gen_golden import install_stubs

    install_stubs()
    sys.path.insert(0, REFERENCE)
    from safetensors.torch import load_model

    import utils as ref_utils
    from model.dit import DiT_models
    from model.vae import VAE_models
    from train_dit import denoise_step

    dit = DiT_models["DiT-S/2"]().eval()
    load_model(dit, args.dit)
    vae = VAE_models["vit-l-20-shallow-encoder"]().eval()
    load_model(vae, args.vae)

    scale = 0.07843137255
    with torch.no_grad():
        px = torch.from_numpy(prompt[0])  # (1,3,360,640)
        lat = vae.encode(px * 2 - 1).mean * scale  # (1,576,16)
        x = lat.reshape(1, 1, 18, 32, 16).permute(0, 1, 4, 2, 3).contiguous()

        betas = ref_utils.sigmoid_beta_schedule(1000).float()
        abar = torch.cumprod(1.0 - betas, dim=0).reshape(-1, 1, 1, 1)
        noise_range = torch.linspace(0, 999, steps + 1)

        fwd_times = []
        t0 = time.time()
        for i in range(1, total_frames):
            chunk = torch.from_numpy(noise[:, i - 1 : i])
            x = torch.cat([x, chunk], dim=1)
            start_frame = max(0, i + 1 - 5)
            for noise_idx in reversed(range(0, steps + 1)):
                tf = time.time()
                x_pred, _ = denoise_step(
                    dit_model=dit, x_noisy=x, actions=None,
                    noise_idx=noise_idx, stabilization_level=STABILIZATION,
                    noise_range=noise_range, alphas_cumprod=abar,
                    start_frame=start_frame, dtype=torch.float32,
                )
                fwd_times.append(time.time() - tf)
                x[:, -1:] = x_pred[:, -1:]
            print(f"[torch] frame {i}/{total_frames - 1} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        rollout_s = time.time() - t0

        flat = x.permute(0, 1, 3, 4, 2).reshape(-1, 576, 16)
        dec = (vae.decode(flat / scale) + 1) / 2
        video = torch.clamp(dec * 255, 0, 255).to(torch.uint8)
        video = video.permute(0, 2, 3, 1).numpy()  # (T, H, W, 3)
    return video, np.asarray(x), rollout_s, float(np.mean(fwd_times))


def gtax_rollout(prompt, noise, total_frames, steps):
    import jax

    # the axon site package re-pins JAX_PLATFORMS to the TPU tunnel at import
    # time; honour an explicit cpu request (conftest does the same)
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gtax.core.constants import LATENT_SCALE
    from gtax.io import safetensors_port as port
    from gtax.models.dit import DiT_MODELS, dit_apply
    from gtax.models.vae import VAE_MODELS
    from gtax.sampling.diffusion import SamplerConfig, make_rollout
    from gtax.train.trainer import decode_frames, encode_frames

    dit_cfg = DiT_MODELS["DiT-S/2"]()
    vae_cfg = VAE_MODELS["vit-l-20-shallow-encoder"]()
    dit_params = port.load_dit(args.dit, dit_cfg, verbose=False)
    vae_params = port.load_vae(args.vae, vae_cfg, verbose=False)
    if getattr(args, "quantize", "none") == "int8":
        # W8A8 serving path at FULL SIZE vs the torch fp32 rollout — gates
        # the quantization itself, not just the port/sampler
        from gtax.models.dit import (quantize_for_inference,
                                     unstack_for_inference)

        dit_params = quantize_for_inference(
            unstack_for_inference(dit_params, dit_cfg), dit_cfg)
    elif getattr(args, "incremental", False):
        from gtax.models.dit import unstack_for_inference

        dit_params = unstack_for_inference(dit_params, dit_cfg)

    lat = encode_frames(vae_params, vae_cfg, jnp.asarray(prompt), jnp.float32)
    assert abs(LATENT_SCALE - 0.07843137255) < 1e-12

    cfg = SamplerConfig(ddim_noise_steps=steps,
                        stabilization_level=STABILIZATION,
                        noise_abs_max=NOISE_ABS_MAX,
                        schedule_clamp_min=1e-4)  # generate.py default

    def dit_fn(params, x, t, a, valid):
        return dit_apply(params, dit_cfg, x, t, a, valid,
                         compute_dtype=jnp.float32)

    cond = incremental = None
    if getattr(args, "incremental", False):
        # the SHIPPED SERVING DEFAULT: conditioning cache + incremental
        # decoding (context prefill + last-frame-only steps) — gate it
        # against the same torch fp32 rollout
        from gtax.models.dit import make_cond_fns, make_incremental_fns

        cond = make_cond_fns(dit_cfg, jnp.float32)
        incremental = make_incremental_fns(dit_cfg, jnp.float32)
    rollout = make_rollout(dit_fn, dit_cfg.max_frames, cfg, cond=cond,
                           incremental=incremental)
    key = jax.random.PRNGKey(0)  # unused: noise injected
    t0 = time.time()
    lat_out = rollout(dit_params, lat, None, key,
                      num_gen_frames=total_frames - 1,
                      noise=jnp.asarray(noise))
    lat_out.block_until_ready()
    compile_and_run_s = time.time() - t0

    # steady-state per-forward latency (jitted, post-compile)
    fwd = jax.jit(lambda p, x, t, a: dit_fn(p, x, t, a, None))
    x5 = lat_out[:, :5]
    tt = jnp.full((1, 5), 15, jnp.int32)
    fwd(dit_params, x5, tt, None).block_until_ready()
    t0 = time.time()
    n = 3
    for _ in range(n):
        fwd(dit_params, x5, tt, None).block_until_ready()
    fwd_s = (time.time() - t0) / n

    video = decode_frames(vae_params, vae_cfg, lat_out, jnp.float32)
    device = jax.devices()[0].device_kind
    return (np.asarray(video[0]), np.asarray(lat_out), compile_and_run_s,
            fwd_s, device)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--dit", default=os.path.join(FULL, "dit_full.safetensors"))
    p.add_argument("--vae", default=os.path.join(FULL, "vae_full.safetensors"))
    p.add_argument("--min-psnr", type=float, default=25.0)
    p.add_argument("--quantize", choices=["none", "int8"], default="none",
                   help="int8 = gate the W8A8 serving path at full size")
    p.add_argument("--incremental", action="store_true",
                   help="gate the incremental-decoding serving path "
                        "(conditioning cache + context K/V prefill)")
    p.add_argument("--out", default="parity_gate_result.json",
                   help="result filename under tests/golden_full/")
    args = p.parse_args()

    prompt = load_prompt()
    rng = np.random.default_rng(0)
    noise = np.clip(
        rng.standard_normal(
            (1, args.frames - 1, *LATENT_SHAPE), dtype=np.float32
        ),
        -NOISE_ABS_MAX, NOISE_ABS_MAX,
    )

    tag = "int8 W8A8" if args.quantize == "int8" else "fp32, xla backend"
    if args.incremental:
        tag += " + incremental decoding"
    print(f"=== gtax rollout ({tag}) ===", flush=True)
    ours, ours_lat, gtax_s, gtax_fwd, gtax_dev = gtax_rollout(
        prompt, noise, args.frames, args.steps
    )
    print(f"gtax[{gtax_dev}]: rollout+compile {gtax_s:.0f}s, "
          f"per-forward {gtax_fwd*1e3:.0f}ms", flush=True)

    # the torch rollout is deterministic in (prompt, noise, frames, steps,
    # checkpoint) and costs ~13 min on CPU — cache it for repeat gates
    # (e.g. the int8 gate re-checks a different gtax path vs the SAME ref)
    ref_cache = os.path.join(
        FULL, f"ref_rollout_f{args.frames}_s{args.steps}.npz")
    if os.path.exists(ref_cache):
        print(f"=== torch reference rollout (cached: {ref_cache}) ===",
              flush=True)
        z = np.load(ref_cache)
        ref, ref_lat = z["ref"], z["ref_lat"]
        torch_s, torch_fwd = float(z["torch_s"]), float(z["torch_fwd"])
    else:
        print("=== torch reference rollout (CPU, fp32) ===", flush=True)
        ref, ref_lat, torch_s, torch_fwd = torch_rollout(
            prompt, noise, args.frames, args.steps
        )
        np.savez_compressed(ref_cache, ref=ref, ref_lat=ref_lat,
                            torch_s=torch_s, torch_fwd=torch_fwd)
    print(f"torch: rollout {torch_s:.0f}s, per-forward {torch_fwd*1e3:.0f}ms",
          flush=True)

    from gtax.utils.metrics import per_frame_psnr, per_frame_ssim

    scores = per_frame_psnr(ours, ref)
    ssim_scores = per_frame_ssim(ours, ref)
    lat_rmse = float(np.sqrt(np.mean((ours_lat - ref_lat) ** 2)))
    n_fwd = (args.frames - 1) * (args.steps + 1)
    result = {
        "frames": args.frames,
        "noise_steps": args.steps,
        "dit_forwards": n_fwd,
        "psnr_per_frame": [round(float(s), 2) for s in scores],
        "psnr_min": round(float(min(scores)), 2),
        "psnr_mean": round(float(np.mean(scores)), 2),
        # secondary signal; the gate itself stays PSNR (BASELINE.md)
        "ssim_min": round(float(min(ssim_scores)), 4),
        "ssim_mean": round(float(np.mean(ssim_scores)), 4),
        "latent_rmse": lat_rmse,
        "pass": float(min(scores)) >= args.min_psnr,
        "torch_cpu_rollout_s": round(torch_s, 1),
        "torch_cpu_fwd_ms": round(torch_fwd * 1e3, 1),
        "gtax_device": gtax_dev,
        "gtax_fwd_ms": round(gtax_fwd * 1e3, 1),
        "fwd_speedup_gtax_vs_torch_cpu": round(torch_fwd / gtax_fwd, 2),
        "checkpoint": os.path.basename(args.dit),
        "quantize": args.quantize,
        "incremental": bool(args.incremental),
    }
    os.makedirs(FULL, exist_ok=True)
    with open(os.path.join(FULL, args.out), "w") as f:
        json.dump(result, f, indent=1)
    try:
        from gtax.io.video import write_video

        suffix = "_int8" if args.quantize == "int8" else ""
        write_video(os.path.join(FULL, f"ours{suffix}.mp4"), ours, fps=10)
        write_video(os.path.join(FULL, "ref.mp4"), ref, fps=10)
    except Exception as e:  # mp4s are a convenience artifact only
        print("mp4 write skipped:", e)
    print(json.dumps(result))
    sys.exit(0 if result["pass"] else 1)
