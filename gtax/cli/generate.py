"""Autoregressive video generation CLI.

Parity target: /root/reference/generate.py — same flags, same defaults, same
rollout semantics (stabilization 15, noise_abs_max 20, window 5, DDIM over
noise_steps+1, test-set or custom start frame, mp4 at 10 fps). The whole
frames x noise-steps loop nest runs as ONE jitted nested lax.scan on device;
the only host work is VAE IO at the ends and the mp4 mux.

Fixed vs reference: the --start_frame + --use_actions path works (the
reference's inverted `if not not args.use_actions` at generate.py:155 made it
crash; SURVEY.md quirk 3).

Usage:
  python -m gtax.cli.generate --total-frames 32 --noise_steps 100 \
      --dit_model_path dit.safetensors --vae_model_path vit-l-20.safetensors \
      [--use_actions] [--start_frame img.jpg] [--output_path video1.mp4]
"""

from __future__ import annotations

import argparse
import json
import os
import time

from gtax.utils.platform import enable_compile_cache, honor_env_platform

honor_env_platform()  # must precede any jax device use
enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from gtax.data.actions import forward_actions
from gtax.io import safetensors_port as port
from gtax.io.video import read_image, write_video
from gtax.models.dit import DiT_MODELS, dit_apply
from gtax.models.vae import VAE_MODELS
from gtax.nn import attention as attention_mod
from gtax.sampling.diffusion import SamplerConfig, make_rollout
from gtax.train.trainer import decode_frames, encode_frames


def build_parser():
    p = argparse.ArgumentParser(description="Video generation (gtax)")
    p.add_argument("--total-frames", type=int, default=32)
    p.add_argument("--dit_model_path", type=str,
                   default="checkpoints/dit.safetensors")
    p.add_argument("--vae_model_path", type=str,
                   default="checkpoints/vit-l-20.safetensors")
    p.add_argument("--noise_steps", type=int, default=100)
    p.add_argument("--use_actions", action="store_true")
    p.add_argument("--output_path", type=str, default="video1.mp4")
    p.add_argument("--batch", type=int, default=1,
                   help="batched serving: generate N videos of the same "
                        "prompt in ONE rollout (independent noise per "
                        "stream; weights/compile amortised — throughput "
                        "mode, docs/PERF.md). N>1 writes "
                        "<output_path stem>_i.<ext> per stream")
    p.add_argument("--start_frame", type=str, default=None)
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--attention_backend", type=str, default="fused",
                   choices=["xla", "pallas", "fused", "fused_mlp",
                            "fused_all"],
                   help="fused = whole-branch Pallas megakernels (numerically "
                        "equivalent to xla, ~2.2x faster forward on v5e)")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument(
        "--pipeline_depth", type=int, default=1,
        help="frames denoised concurrently at staggered noise levels; 1 = "
             "reference-equivalent scheme, 4 = ~3.5x fewer DiT calls",
    )
    p.add_argument(
        "--attn_broadcast", type=int, default=1,
        help="recompute attention every K-th denoise step, reuse cached "
             "residual deltas in between (Pyramid Attention Broadcast); "
             "1 = exact reference scheme",
    )
    p.add_argument("--benchmark_json", action="store_true",
                   help="print a timing JSON line at the end")
    p.add_argument("--quantize", choices=["none", "int8"], default="none",
                   help="int8 = W8A8 serving quantization of the DiT block "
                        "GEMMs (2x MXU rate on v5e, ~lossless PSNR; "
                        "docs/PERF.md)")
    p.add_argument("--no_incremental", action="store_true",
                   help="disable incremental decoding (per-frame context "
                        "prefill + last-frame-only denoise steps over a "
                        "temporal K/V cache; reference-exact semantics, on "
                        "by default with the fused backends)")
    p.add_argument("--no_cond_cache", action="store_true",
                   help="disable the per-frame conditioning cache (bit-exact "
                        "adaLN precompute; on by default with the unstacked "
                        "layout on the exact sampling path)")
    p.add_argument("--no_unstack", action="store_true",
                   help="keep the stacked-weight block scan (shorter compile,"
                        " ~25%% slower forward)")
    p.add_argument("--mesh_model", type=int, default=1,
                   help="tensor-parallel serving over N devices: DiT block "
                        "weights shard over a 1xN 'model' mesh and GSPMD "
                        "partitions the jitted rollout (collectives over "
                        "ICI). Forces the xla attention backend — the Pallas "
                        "megakernels are single-chip. Incompatible with "
                        "--quantize int8.")
    p.add_argument("--mesh_data", type=int, default=1,
                   help="data-parallel BATCHED serving over N devices: "
                        "shard_map runs one full single-chip rollout per "
                        "device over its slice of --batch (which must "
                        "divide by N) — the fastest single-chip path (int8 "
                        "+ fused + incremental) scales to ~N x aggregate "
                        "frames/sec. Mutually exclusive with --mesh_model.")
    p.add_argument("--dit_model", type=str, default="DiT-S/2",
                   help="model preset (gtax.models.dit.DiT_MODELS); "
                        "'DiT-debug' + empty --dit_model_path gives a "
                        "checkpoint-free smoke path on any hardware")
    p.add_argument("--vae_model", type=str,
                   default="vit-l-20-shallow-encoder",
                   help="VAE preset (gtax.models.vae.VAE_MODELS)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    attention_mod.set_backend(args.attention_backend)
    dtype = jnp.dtype(args.dtype)

    dit_cfg = DiT_MODELS[args.dit_model]()
    vae_cfg = VAE_MODELS[args.vae_model]()
    if args.dit_model_path:
        dit_params = port.load_dit(args.dit_model_path, dit_cfg)
    else:  # checkpoint-free smoke path (random weights)
        from gtax.models.dit import dit_init

        dit_params = jax.jit(lambda k: dit_init(k, dit_cfg))(
            jax.random.PRNGKey(0))
    if args.vae_model_path:
        vae_params = port.load_vae(args.vae_model_path, vae_cfg)
    else:
        from gtax.models.vae import vae_init

        vae_params = jax.jit(lambda k: vae_init(k, vae_cfg))(
            jax.random.PRNGKey(1))
    if dtype != jnp.float32:
        from gtax.models.dit import cast_params_for_inference

        dit_params = jax.jit(
            lambda p: cast_params_for_inference(p, dtype)
        )(dit_params)
    if not args.no_unstack:
        # serving layout: per-block weight pytrees eliminate the block scan's
        # weight slice copies (~25% faster forward; docs/PERF.md) at the cost
        # of a longer first compile
        from gtax.models.dit import unstack_for_inference

        dit_params = unstack_for_inference(dit_params, dit_cfg)
    if args.quantize == "int8":
        # W8A8 serving: int8 block GEMMs on the MXU (2x bf16 rate on v5e);
        # quality-gated in docs/quant_quality.json
        from gtax.models.dit import quantize_for_inference

        dit_params = quantize_for_inference(dit_params, dit_cfg)

    assert not (args.mesh_model > 1 and args.mesh_data > 1), (
        "--mesh_model and --mesh_data are mutually exclusive serving modes")
    assert args.batch % max(args.mesh_data, 1) == 0, (
        f"--batch {args.batch} must divide over --mesh_data {args.mesh_data}")
    mesh = None
    if args.mesh_model > 1:
        # multi-chip tensor-parallel serving: shard block weights over
        # 'model', replicate everything else; the existing jitted rollout is
        # partitioned by GSPMD (computation follows the param placement)
        assert args.quantize != "int8", (
            "--mesh_model: the int8 Pallas kernels are single-chip; "
            "use the bf16 xla path for TP serving"
        )
        attention_mod.set_backend("xla")
        from gtax.parallel import mesh as meshlib

        mesh = meshlib.make_mesh(
            meshlib.MeshConfig(data=1, model=args.mesh_model),
            devices=jax.devices()[: args.mesh_model],
        )
        dit_params = jax.device_put(
            dit_params, meshlib.param_sharding(mesh, dit_params)
        )

    total_frames = args.total_frames
    n_prompt = 4 if args.start_frame is None else 1
    sampler = SamplerConfig(
        ddim_noise_steps=args.noise_steps,
        stabilization_level=15,          # reference generate.py:138
        schedule_clamp_min=1e-4,         # reference uses the default here
        attn_broadcast=args.attn_broadcast,
    )
    print(f"We will generate {total_frames} frames, starting with "
          f"{n_prompt} frames.")
    print(f"Noise steps: {args.noise_steps}; stabilization 15; "
          f"window {dit_cfg.max_frames}; actions={args.use_actions}")

    if args.start_frame is not None:
        frame = read_image(
            args.start_frame, (vae_cfg.input_height, vae_cfg.input_width))
        video = frame[None, None]  # (1, 1, 3, H, W)
        actions = (
            jnp.asarray(forward_actions(1, total_frames))
            if args.use_actions else None
        )
    else:
        from gtax.data.loader import make_dataset

        test_ds = make_dataset("webdataset", "test", args.use_actions)
        sample = next(iter(test_ds))
        video = np.asarray(sample["video"], np.float32)[None, :n_prompt]
        if args.use_actions:
            acts = np.asarray(sample["actions"], np.float32)[None]
            if acts.shape[1] < total_frames:
                acts = np.concatenate(
                    [acts, forward_actions(1, total_frames - acts.shape[1])],
                    axis=1,
                )
            actions = jnp.asarray(acts)
        else:
            actions = None

    if args.batch > 1:
        # batched serving: replicate the prompt across streams; each stream
        # draws independent rollout noise via the batch dimension
        video = np.tile(np.asarray(video), (args.batch, 1, 1, 1, 1))
        if actions is not None:
            actions = jnp.tile(actions, (args.batch, 1, 1))

    def dit_fn(params, x, t, a, valid):
        return dit_apply(params, dit_cfg, x, t, a, valid, compute_dtype=dtype)

    seed = args.seed if args.seed is not None else int(time.time())
    rng = jax.random.PRNGKey(seed)

    encode = jax.jit(lambda vp, v: encode_frames(vp, vae_cfg, v, dtype))
    decode = jax.jit(lambda vp, lat: decode_frames(vp, vae_cfg, lat, dtype))
    latents = encode(vae_params, jnp.asarray(video))
    if mesh is not None:
        from gtax.parallel.mesh import replicated

        latents = jax.device_put(latents, replicated(mesh))
        if actions is not None:
            actions = jax.device_put(actions, replicated(mesh))
    pab = None
    if args.attn_broadcast > 1:
        from gtax.models.dit import make_pab_fns

        pab = make_pab_fns(dit_cfg, dtype)
    if args.pipeline_depth > 1:
        from gtax.sampling.diffusion import make_pipelined_rollout

        rollout = make_pipelined_rollout(
            dit_fn, dit_cfg.max_frames, sampler,
            pipeline_depth=args.pipeline_depth, pab=pab,
        )
    else:
        cond = None
        incremental = None
        if (args.attn_broadcast == 1 and not args.no_unstack
                and not args.no_cond_cache and mesh is None):
            from gtax.models.dit import make_cond_fns

            cond = make_cond_fns(dit_cfg, dtype)
            if not args.no_incremental and args.attention_backend in (
                    "fused", "fused_all"):
                from gtax.models.dit import make_incremental_fns

                incremental = make_incremental_fns(dit_cfg, dtype)
        rollout = make_rollout(dit_fn, dit_cfg.max_frames, sampler, pab=pab,
                               cond=cond, incremental=incremental)

    if args.mesh_data > 1:
        # data-parallel batched serving: one full single-chip rollout per
        # device over its batch slice (shard_map; Pallas kernels unchanged)
        from gtax.parallel import mesh as meshlib

        dp_mesh = meshlib.make_mesh(
            meshlib.MeshConfig(data=args.mesh_data, model=1),
            devices=jax.devices()[: args.mesh_data],
        )
        run = meshlib.data_parallel_rollout(
            rollout, dp_mesh, num_gen_frames=total_frames - n_prompt)
        lat_fn = lambda: run(dit_params, latents, actions, rng)  # noqa: E731
    else:
        lat_fn = lambda: rollout(  # noqa: E731
            dit_params, latents, actions, rng,
            num_gen_frames=total_frames - n_prompt)

    t0 = time.perf_counter()
    lat = lat_fn()
    lat.block_until_ready()
    gen_seconds = time.perf_counter() - t0

    pixels = decode(vae_params, lat)
    if args.batch == 1:
        pixels = np.asarray(pixels[0])
        write_video(args.output_path, pixels, fps=10)
        print(f"generation saved to {args.output_path}.")
    else:
        stem, ext = os.path.splitext(args.output_path)
        pixels = np.asarray(pixels)
        for i in range(args.batch):
            write_video(f"{stem}_{i}{ext}", pixels[i], fps=10)
        print(f"{args.batch} generations saved to {stem}_*{ext}.")
    if args.benchmark_json:
        gen = (total_frames - n_prompt) * args.batch
        print(json.dumps({
            "generated_frames": gen,
            "noise_steps": args.noise_steps,
            "seconds": gen_seconds,
            "frames_per_sec": gen / gen_seconds,
        }))
    return pixels


if __name__ == "__main__":
    main()
