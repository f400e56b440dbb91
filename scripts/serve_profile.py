"""Capture a jax.profiler trace of the shipped serving rollout.

Usage: python scripts/serve_profile.py [outdir]
Env: GTAX_PROF_BATCH (default 8), GTAX_PROF_FRAMES (8), GTAX_PROF_STEPS (20),
     GTAX_BENCH_* knobs as in bench.py (quant/incremental/... defaults same).

Feed the outdir to scripts/trace_ops.py for the per-op rollup. Kept small
(frames x steps) so the on-device program stays well under the tunnel's
~60 s worker limit (docs/PERF.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gtax.utils.platform import enable_compile_cache, honor_env_platform

honor_env_platform()
enable_compile_cache()


def main():
    import jax
    import numpy as np

    from gtax.data.actions import forward_actions
    from gtax.serving import ServingConfig, VideoGenerator

    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/serve_prof"
    batch = int(os.environ.get("GTAX_PROF_BATCH", 8))
    frames = int(os.environ.get("GTAX_PROF_FRAMES", 8))
    steps = int(os.environ.get("GTAX_PROF_STEPS", 20))
    cfg = ServingConfig(
        dtype=os.environ.get("GTAX_BENCH_DTYPE", "bfloat16"),
        attention_backend=os.environ.get("GTAX_BENCH_BACKEND", "fused"),
        quantize=os.environ.get("GTAX_BENCH_QUANT", "int8"),
        unstack=os.environ.get("GTAX_BENCH_UNSTACK", "1") == "1",
        cond_cache=os.environ.get("GTAX_BENCH_CONDCACHE", "1") == "1",
        incremental=os.environ.get("GTAX_BENCH_INCREMENTAL", "1") == "1",
        pipeline_depth=int(os.environ.get("GTAX_BENCH_PIPELINE", 1)),
        attn_broadcast=int(os.environ.get("GTAX_BENCH_BROADCAST", 1)),
        noise_steps=steps,
    )
    gen = VideoGenerator.load("", "", cfg)
    n_prompt = 4
    vae_cfg = gen.vae_cfg
    video = np.asarray(jax.random.uniform(
        jax.random.PRNGKey(1),
        (batch, n_prompt, 3, vae_cfg.input_height, vae_cfg.input_width),
    ))
    actions = np.asarray(forward_actions(batch, frames))

    gen.generate(video, actions, num_frames=frames, seed=2)  # warmup/compile
    t0 = time.perf_counter()
    with jax.profiler.trace(outdir):
        gen.generate(video, actions, num_frames=frames, seed=2)
    wall = time.perf_counter() - t0
    t = gen.last_timings
    print({"batch": batch, "frames": frames, "steps": steps,
           "rollout_s": round(t["rollout_s"], 3),
           "decode_s": round(t["decode_s"], 3),
           "agg_fps": round(batch * (frames - n_prompt)
                            / (t["rollout_s"] + t["decode_s"]), 2),
           "wall_s": round(wall, 2), "trace": outdir})


if __name__ == "__main__":
    main()
