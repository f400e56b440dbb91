"""Headline benchmark: frames/sec of 32-frame, 100-step action-conditioned
generation on the flagship DiT-S/2 + ViT-L/20 pipeline (the BASELINE.json
config; reference workload at /root/reference/generate.py:192-246 — 28x101
DiT window forwards + one 32-frame VAE decode).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is null until a measured torch-reference number exists
(BASELINE.md: the reference publishes none; its README disclaims performance).

Env knobs:
  GTAX_BENCH_FRAMES (default 32), GTAX_BENCH_STEPS (default 100),
  GTAX_BENCH_DTYPE (bfloat16), GTAX_BENCH_BACKEND (xla|pallas),
  GTAX_BENCH_REPEATS (default 2 timed runs after 1 warmup),
  GTAX_BENCH_BATCH (default 1 = the reference workload; >1 = batched-serving
  throughput mode, reports AGGREGATE frames/sec over all streams),
  GTAX_BENCH_PIPELINE (default 1 = reference-equivalent scheme; >1 enables
  pyramid-pipelined decoding, ~P-fold fewer DiT calls per frame),
  GTAX_BENCH_BROADCAST (default 1 = exact; K>1 recomputes attention every
  K-th denoise step — Pyramid Attention Broadcast, docs/PERF.md),
  GTAX_BENCH_UNSTACK (default 1 = per-block serving weight layout),
  GTAX_BENCH_QUANT (int8|none, default int8 = W8A8 serving quantization of
  the DiT block GEMMs — MXU int8 runs at 2x bf16 on v5e. ~Lossless and
  certified at FULL SIZE: 69.5 dB min PSNR vs the torch fp32 rollout on the
  same checkpoint + noise, tests/golden_full/parity_gate_int8.json; probe
  record docs/quant_quality.json. GTAX_BENCH_QUANT=none measures the exact
  bf16 path).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gtax.utils.platform import enable_compile_cache, honor_env_platform

honor_env_platform()  # an explicit JAX_PLATFORMS=cpu must win over axon
enable_compile_cache()  # repeat runs start warm (compile lands in warmup)


def main():
    import jax
    import numpy as np

    from gtax.data.actions import forward_actions
    from gtax.serving import ServingConfig, VideoGenerator

    frames = int(os.environ.get("GTAX_BENCH_FRAMES", 32))
    steps = int(os.environ.get("GTAX_BENCH_STEPS", 100))
    dtype = os.environ.get("GTAX_BENCH_DTYPE", "bfloat16")
    # "fused" = whole-branch Pallas megakernels; numerically equivalent to the
    # xla path (tested) and ~28% faster on v5e
    backend = os.environ.get("GTAX_BENCH_BACKEND", "fused")
    repeats = int(os.environ.get("GTAX_BENCH_REPEATS", 2))
    pipeline = int(os.environ.get("GTAX_BENCH_PIPELINE", 1))
    batch = int(os.environ.get("GTAX_BENCH_BATCH", 1))
    broadcast = int(os.environ.get("GTAX_BENCH_BROADCAST", 1))
    unstack = os.environ.get("GTAX_BENCH_UNSTACK", "1") == "1"
    cond_cache = os.environ.get("GTAX_BENCH_CONDCACHE", "1") == "1"
    incremental = os.environ.get("GTAX_BENCH_INCREMENTAL", "1") == "1"
    quant = os.environ.get("GTAX_BENCH_QUANT", "int8")

    # the benchmark drives the EXACT shipped serving assembly — feature
    # gating (cond cache, incremental, unstack, quantize, PAB, pipelining)
    # lives in ONE place, gtax.serving.VideoGenerator
    cfg = ServingConfig(
        dtype=dtype, attention_backend=backend, quantize=quant,
        unstack=unstack, cond_cache=cond_cache, incremental=incremental,
        pipeline_depth=pipeline, attn_broadcast=broadcast, noise_steps=steps,
        dit_model=os.environ.get("GTAX_BENCH_DIT_MODEL", "DiT-S/2"),
        vae_model=os.environ.get("GTAX_BENCH_VAE_MODEL",
                                 "vit-l-20-shallow-encoder"),
    )
    gen = VideoGenerator.load("", "", cfg)  # random flagship-size weights

    n_prompt = 4
    vae_cfg = gen.vae_cfg
    video = np.asarray(jax.random.uniform(
        jax.random.PRNGKey(1),
        (batch, n_prompt, 3, vae_cfg.input_height, vae_cfg.input_width),
    ))
    actions = np.asarray(forward_actions(batch, frames))
    num_gen = frames - n_prompt

    def run():
        gen.generate(video, actions, num_frames=frames, seed=2)
        # rollout + the one batched VAE decode — the reference generate.py
        # workload; the prompt encode is excluded (input prep, not serving)
        # and so is fetch_s (the device->host pixel download: ~2 ms over a
        # TPU-VM PCIe link, but minutes-scale noise through this dev env's
        # remote-device tunnel at ~10 MB/s — it is reported alongside)
        t = gen.last_timings
        return t["rollout_s"] + t["decode_s"]

    run()  # warmup/compile
    best = min(run() for _ in range(repeats))
    fetch_s = gen.last_timings["fetch_s"]
    fps = batch * num_gen / best

    pipe_tag = f", pipeline_depth={pipeline}" if pipeline > 1 else ""
    if broadcast > 1:
        pipe_tag += f", attn_broadcast={broadcast}"
    if quant == "int8":
        pipe_tag += ", int8 W8A8"
    if batch > 1:
        pipe_tag += f", batch={batch} streams (aggregate)"

    # vs_baseline: ratio to the torch-reference A100 estimate recorded in
    # BASELINE_MEASURED.json (methodology in BASELINE.md: measured torch-CPU
    # per-forward anchors the model cost; the A100 eager band converts it;
    # the CONSERVATIVE high end of the band is used, so vs_baseline is a
    # lower bound on the true speedup).
    vs_baseline = None
    baseline_fps = None
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_MEASURED.json")
    baseline_workload = (frames == 32 and steps == 100
                         and cfg.dit_model == "DiT-S/2")
    if baseline_workload and os.path.exists(base_path):
        with open(base_path) as f:
            measured = json.load(f)
        baseline_fps = measured.get("torch_a100_est_fps", {}).get("high")
        if baseline_fps:
            # aggregate fps over `batch` streams must compare against the
            # baseline running the same `batch` independent jobs
            vs_baseline = round(fps / (baseline_fps * batch), 2)

    result = {
        "metric": (
            f"frames/sec, {frames}-frame {steps}-step action-conditioned "
            f"generation ({cfg.dit_model} {dtype}, {backend} attention, "
            f"{jax.devices()[0].device_kind}{pipe_tag})"
        ),
        "value": round(fps, 4),
        "unit": "frames/sec",
        "vs_baseline": vs_baseline,
        "baseline_fps": baseline_fps,
        "baseline_note": "torch A100 eager estimate (high end), BASELINE.md",
        "host_fetch_s": round(fetch_s, 3),
    }
    default_workload = (
        pipeline == 1 and broadcast == 1 and batch == 1 and quant == "int8"
        and frames == 32 and steps == 100 and dtype == "bfloat16"
        and backend == "fused" and unstack and cond_cache and incremental
    )
    if default_workload:
        # the default run measures the reference-equivalent scheme (int8
        # W8A8, full-size-certified at 69.5 dB min vs the torch fp32
        # rollout); carry the exact-bf16 and fastest quality-validated
        # approximate modes (measured on the same chip; docs/PERF.md)
        result["exact_bf16_mode"] = {
            "fps": 5.03,
            "config": "GTAX_BENCH_QUANT=none",
            "quality": "reference-exact sampling, bf16 compute (93.97 dB "
                       "min vs torch fp32 at full size, "
                       "tests/golden_full/parity_gate_result.json; "
                       "incremental decoding gated at "
                       "parity_gate_int8_incremental.json)",
        }
        result["fast_mode"] = {
            "fps": 12.32,
            "config": "GTAX_BENCH_QUANT=int8 GTAX_BENCH_PIPELINE=4 "
                      "GTAX_BENCH_BROADCAST=2",
            "vs_baseline": 12.57,
            "quality": "approximate sampling (causality probe 8/8; "
                       "22.6/36.6 dB min/mean PSNR vs exact, "
                       "docs/quant_quality.json); the default incremental "
                       "mode reaches 9.08 f/s with EXACT sampling "
                       "(round-4 measurement, docs/PERF.md)",
        }
    print(json.dumps(result))
    return result


def _wait_for_backend(attempts=8, delay_s=30, probe_timeout_s=180):
    """The tunnelled TPU backend can be transiently unavailable (the relay
    worker restarts after crashes) and its init can HANG rather than raise,
    so probe jax.devices() in a SUBPROCESS with a hard timeout, retrying,
    before the real run — a flake shouldn't turn the benchmark into a
    traceback or a silent hang."""
    import subprocess

    err = "unknown"
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "from gtax.utils.platform import honor_env_platform\n"
                 "honor_env_platform()\n"
                 "import jax; jax.devices()"],
                cwd=os.path.dirname(os.path.abspath(__file__)),
                capture_output=True, text=True, timeout=probe_timeout_s,
            )
            if r.returncode == 0:
                return None
            err = (r.stderr or r.stdout).strip().splitlines()[-1:] or ["?"]
            err = err[0]
        except subprocess.TimeoutExpired:
            err = f"jax.devices() probe hung > {probe_timeout_s}s"
        if i + 1 < attempts:
            time.sleep(delay_s)
    return err


if __name__ == "__main__":
    _err = _wait_for_backend()
    if _err is not None:
        print(json.dumps({
            "metric": "generation_throughput", "value": None,
            "unit": "frames/sec", "vs_baseline": None,
            "error": f"accelerator backend unavailable: {_err[:200]}",
            "last_measured_on_v5e": {
                "fps": 9.08, "vs_baseline": 9.27,
                "config": "default (int8 W8A8 + fused + incremental + "
                          "paired kernels + fused VAE, reference-EXACT "
                          "sampling)",
                "source": "docs/PERF.md round-4 measurement; exact bf16 "
                          "5.03 f/s, fastest approximate 12.32 f/s, "
                          "B=8 aggregate 16.93 f/s",
            },
        }))
        sys.exit(1)
    sys.exit(0 if main() else 1)
