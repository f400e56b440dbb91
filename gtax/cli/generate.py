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

import jax.numpy as jnp
import numpy as np

from gtax.data.actions import forward_actions
from gtax.io.video import read_image, write_video


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
    p.add_argument("--batch_distinct", action="store_true",
                   help="with --batch N and the test-set prompt path: use N "
                        "DIFFERENT test-set prompts (request-queue batching) "
                        "instead of replicating one")
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
    p.add_argument("--decode_chunk", type=int, default=None,
                   help="decode at most N frames per VAE call (bounds "
                        "decoder memory for long rollouts; bit-identical "
                        "output)")
    p.add_argument("--aot_dir", type=str, default=None,
                   help="directory of AOT-serialized executables (gtax.aot):"
                        " the first run compiles and saves; later runs load "
                        "the compiled executable and skip the ~4-minute "
                        "serving-layout compile (cold start in seconds)")
    p.add_argument("--no_prewarm", action="store_true",
                   help="with --aot_dir: skip the background dummy "
                        "execution that pre-uploads loaded executables to "
                        "the chip during prompt preparation")
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
    assert not (args.batch_distinct and args.start_frame), (
        "--batch_distinct draws prompts from the test set; it cannot be "
        "combined with a single --start_frame")
    from gtax.serving import ServingConfig, VideoGenerator

    cfg = ServingConfig(
        dtype=args.dtype,
        attention_backend=args.attention_backend,
        quantize=args.quantize,
        unstack=not args.no_unstack,
        cond_cache=not args.no_cond_cache,
        incremental=not args.no_incremental,
        pipeline_depth=args.pipeline_depth,
        attn_broadcast=args.attn_broadcast,
        noise_steps=args.noise_steps,
        mesh_data=args.mesh_data,
        mesh_model=args.mesh_model,
        decode_chunk=args.decode_chunk,
        aot_dir=args.aot_dir,
        dit_model=args.dit_model,
        vae_model=args.vae_model,
    )
    gen = VideoGenerator.load(args.dit_model_path, args.vae_model_path, cfg)
    dit_cfg, vae_cfg = gen.dit_cfg, gen.vae_cfg

    if args.aot_dir and not args.no_prewarm:
        # dispatch dummy executions of the loaded AOT executables in the
        # background NOW: on tunnelled chips the first execution pays a
        # one-time upload/link (docs/SERVING.md), which this overlaps with
        # the prompt IO below instead of the user's first generate()
        gen.prewarm(num_frames=args.total_frames, batch_size=args.batch,
                    n_prompt=4 if args.start_frame is None else 1,
                    use_actions=args.use_actions)

    total_frames = args.total_frames
    n_prompt = 4 if args.start_frame is None else 1
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
        it = iter(test_ds)
        # --batch_distinct: one DIFFERENT test-set prompt per stream
        # (request-queue batching); default replicates one prompt
        n_prompts = args.batch if args.batch_distinct else 1
        vids, acts_list = [], []
        for _ in range(n_prompts):
            sample = next(it)
            vids.append(np.asarray(sample["video"], np.float32)[:n_prompt])
            if args.use_actions:
                acts_list.append(np.asarray(sample["actions"], np.float32))
        video = np.stack(vids)
        if args.use_actions:
            acts = np.stack(acts_list)
            if acts.shape[1] < total_frames:
                acts = np.concatenate(
                    [acts, forward_actions(n_prompts,
                                           total_frames - acts.shape[1])],
                    axis=1,
                )
            actions = jnp.asarray(acts)
        else:
            actions = None

    if args.batch > 1 and video.shape[0] == 1:
        # batched serving: replicate the prompt across streams; each stream
        # draws independent rollout noise via the batch dimension
        video = np.tile(np.asarray(video), (args.batch, 1, 1, 1, 1))
        if actions is not None:
            actions = jnp.tile(actions, (args.batch, 1, 1))

    seed = args.seed if args.seed is not None else int(time.time())

    t0 = time.perf_counter()
    pixels = gen.generate(video, actions, num_frames=total_frames, seed=seed)
    total_seconds = time.perf_counter() - t0
    # rollout-only time: the benchmark number comparable to bench.py and
    # docs/PERF.md (VAE encode/decode run once per video, not per step)
    gen_seconds = gen.last_timings["rollout_s"]

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
        n_gen = (total_frames - n_prompt) * args.batch
        print(json.dumps({
            "generated_frames": n_gen,
            "noise_steps": args.noise_steps,
            "seconds": gen_seconds,
            "frames_per_sec": n_gen / gen_seconds,
            "total_seconds_with_vae": total_seconds,
        }))
    return pixels


if __name__ == "__main__":
    main()
