"""Long-horizon serving demo: 300+ frames at product scale, O(1) memory.

VERDICT r4 next #5: the fixed-window O(1)-memory design (SURVEY §5
long-context: sliding window max_frames=5, causal temporal attention,
per-frame VAE) is built and tested at 32 frames; this demonstrates it at
product scale on the real chip:

  - a 320-frame rollout with the default serving stack (int8 + fused +
    cond-cache + incremental), `--decode_chunk` bounding decoder memory;
  - steady-state frames/sec vs the 32-frame headline number (the window
    is fixed-shape, so per-frame cost must NOT grow with rollout length);
  - device memory high-water mark for chunked vs one-shot decode.

Anchor: /root/reference/generate.py:200-235 — `--total-frames N` is
unbounded there too, but its one-shot decode holds O(N) decoder
activations and its per-frame latency is ~10x ours.

Usage: python scripts/long_rollout.py [--frames 320] [--chunk 16]
       [--short 32] [--out docs/long_rollout.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gtax.utils.platform import enable_compile_cache, honor_env_platform

honor_env_platform()
enable_compile_cache()

import jax
import numpy as np


def mem_stats():
    try:
        s = jax.devices()[0].memory_stats() or {}
        return {k: s.get(k) for k in ("bytes_in_use", "peak_bytes_in_use")}
    except Exception:
        return {}


def run(gen, prompt, actions, frames, seed):
    t0 = time.perf_counter()
    pix = gen.generate(prompt, actions, num_frames=frames, seed=seed)
    wall = time.perf_counter() - t0
    return pix, wall, dict(gen.last_timings)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=320)
    p.add_argument("--short", type=int, default=32)
    p.add_argument("--chunk", type=int, default=16)
    p.add_argument("--noise_steps", type=int, default=100)
    p.add_argument("--out", default="")
    args = p.parse_args()

    from gtax.serving import ServingConfig, VideoGenerator

    cfg = ServingConfig(quantize="int8", noise_steps=args.noise_steps,
                        decode_chunk=args.chunk)
    gen = VideoGenerator.load("", "", cfg)  # random flagship weights
    rng = np.random.default_rng(0)
    prompt = rng.random((1, 4, 3, gen.vae_cfg.input_height,
                         gen.vae_cfg.input_width), np.float32)
    actions = rng.random((1, args.frames, 25), np.float32)

    # short (headline-config) run first — compile + reference f/s
    _, _, _ = run(gen, prompt, actions, args.short, seed=0)  # compile
    _, wall_s, t_s = run(gen, prompt, actions, args.short, seed=1)
    fps_short = (args.short - 4) / t_s["rollout_s"]
    print(f"short {args.short}f: rollout {t_s['rollout_s']:.2f}s "
          f"({fps_short:.2f} f/s), decode {t_s['decode_s']:.2f}s", flush=True)

    # long run, chunked decode (O(1) decoder memory). num_gen_frames is a
    # STATIC arg, so the long length compiles its own executable — warm it
    # first or ~30-45 s of (cache-assisted) compile lands in the
    # steady-state number
    _ = run(gen, prompt, actions, args.frames, seed=0)
    _, wall_l, t_l = run(gen, prompt, actions, args.frames, seed=1)
    m_chunked = mem_stats()
    fps_long = (args.frames - 4) / t_l["rollout_s"]
    print(f"long {args.frames}f: rollout {t_l['rollout_s']:.2f}s "
          f"({fps_long:.2f} f/s), chunked decode {t_l['decode_s']:.2f}s, "
          f"mem {m_chunked}", flush=True)

    result = {
        "frames": args.frames,
        "noise_steps": args.noise_steps,
        "decode_chunk": args.chunk,
        "short_frames": args.short,
        "short_rollout_fps": round(fps_short, 2),
        "long_rollout_fps": round(fps_long, 2),
        "steady_state_ratio": round(fps_long / fps_short, 4),
        "long_wall_s": round(wall_l, 2),
        "long_stage_s": {k: round(v, 3) for k, v in t_l.items()},
        "memory_after_long_chunked": m_chunked,
        "device": jax.devices()[0].device_kind,
        "weights": "random flagship (real ckpts network-blocked; the "
                   "systems claim — fixed-shape window, O(1) decode "
                   "memory, flat f/s — is weight-independent)",
    }

    # one-shot decode comparison at the long length (O(N) decoder
    # activations — may not even fit; guarded)
    try:
        import dataclasses

        gen2 = VideoGenerator.load(
            "", "", dataclasses.replace(cfg, decode_chunk=None))
        _, _, t2 = run(gen2, prompt, actions, args.frames, seed=1)
        result["oneshot_decode_s"] = round(t2["decode_s"], 3)
        result["memory_after_long_oneshot"] = mem_stats()
    except Exception as e:
        result["oneshot_decode"] = f"failed: {e!r}"[:300]
    print(json.dumps(result, indent=1), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
