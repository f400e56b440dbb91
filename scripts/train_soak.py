"""Sustained production-shaped training soak: streamed shards, kill, resume.

VERDICT r4 weak #2 / next #2: the trainer had e2e smoke tests and an
isolated-step MFU microbench but never a sustained production-shaped run.
This harness runs the REAL CLI (gtax.cli.train) against local tar shards
through the streaming webdataset backend — the part of the reference that
actually ran for weeks (/root/reference/train_dit.py:920-1035 +
web_dataset.py:84-125) — with:

  phase A: train for --phase-a seconds, then SIGKILL mid-run (no cleanup);
  phase B: relaunch the same command; it must resume from the last orbax
           checkpoint (step/epoch/optimizer/RNG + the webtar data cursor)
           and run another --phase-b seconds.

Outputs docs/train_e2e.json with:
  - sustained steps/s from consecutive metric-record wall_time deltas
    (INCLUDES the input pipeline; step_time_s is the jitted step only, so
    wall - step = host/loader overhead per step);
  - resume evidence: step continuity, restored data cursor, loss
    level before kill vs after resume.

Usage:
  python scripts/train_soak.py                      # flagship on the TPU
  python scripts/train_soak.py --debug              # debug-size, CPU, ~2 min
  python scripts/train_soak.py --latent-cache DIR   # cached-latents variant
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from loader_bench import make_shards  # noqa: E402  (same scripts/ dir)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FLAGSHIP_CFG = """\
vae_checkpoint: ""
dataset_type: webdataset
dit_model: DiT-S/2
vae_model: vit-l-20-shallow-encoder
batch_size: 8
validation_batch_size: 2
num_epochs: 10000
max_steps: -1
gradient_accumulation_steps: 1
learning_rate: 1e-4
min_learning_rate: 1e-4
warnup_ratio: 0.01
use_wandb: false
output_dir: {out}
ddim_noise_steps: 50
ddim_noise_steps_inference: 100
ctx_max_noise_idx: 40
noise_abs_max: 20.0
n_prompt_frames: 4
validation_steps: 0
logging_steps: 1
save_every: {save_every}
use_action_conditioning: true
compute_dtype: bfloat16
attention_backend: fused_all
remat: false
model_name: {name}
resume_from_checkpoint: true
seed: 0
"""

DEBUG_CFG = FLAGSHIP_CFG.replace(
    "dit_model: DiT-S/2", "dit_model: DiT-debug"
).replace(
    "vae_model: vit-l-20-shallow-encoder", "vae_model: vae-debug"
).replace("batch_size: 8", "batch_size: 2")


def run_phase(cmd, seconds, kill_hard, log_path):
    """Run the train CLI for `seconds`, then kill (SIGKILL if kill_hard).
    Returns (wall_elapsed, exit_code_or_None)."""
    with open(log_path, "ab") as log:
        proc = subprocess.Popen(
            cmd, stdout=log, stderr=subprocess.STDOUT, cwd=REPO)
        t0 = time.time()
        try:
            rc = proc.wait(timeout=seconds)
            return time.time() - t0, rc
        except subprocess.TimeoutExpired:
            proc.send_signal(
                signal.SIGKILL if kill_hard else signal.SIGTERM)
            try:
                proc.wait(timeout=60)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait()
            return time.time() - t0, None


def read_metrics(path):
    recs = []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                try:
                    recs.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    return recs


def analyze(recs, boundary_step):
    """Sustained-rate stats from wall_time deltas, split at the resume
    boundary. Skips the first record after any gap > 10x the median delta
    (compile / restart)."""
    import numpy as np

    recs = [r for r in recs if "wall_time" in r]
    if len(recs) < 3:
        return {}
    steps = np.array([r["step"] for r in recs])
    walls = np.array([r["wall_time"] for r in recs])
    deltas = np.diff(walls) / np.maximum(np.diff(steps), 1)
    med = float(np.median(deltas))
    keep = deltas < 10 * med  # drop compile/restart stalls from "sustained"
    dev = np.array([r.get("step_time_s", np.nan) for r in recs])[1:][keep]
    out = {
        "records": len(recs),
        "sustained_step_wall_s": {
            "median": round(med, 4),
            "p90": round(float(np.percentile(deltas[keep], 90)), 4),
            "mean": round(float(deltas[keep].mean()), 4),
        },
        # step_time_s is dispatch-to-dispatch wall since the round-5
        # deferred-fetch loop (input pipeline INCLUDED); record-delta minus
        # it is the residual host work outside train_step (logging, save
        # triggers) — near zero when the loader keeps up
        "dispatch_wall_s_median": round(float(np.nanmedian(dev)), 4),
        "non_step_host_s": round(med - float(np.nanmedian(dev)), 4),
        "sustained_steps_per_s": round(1.0 / med, 3),
        "excluded_stall_records": int((~keep).sum()),
    }
    before = [r["train_loss"] for r in recs
              if "train_loss" in r and r["step"] <= boundary_step][-20:]
    after = [r["train_loss"] for r in recs
             if "train_loss" in r and r["step"] > boundary_step][:20]
    if before and after:
        out["loss_before_kill_mean20"] = round(
            float(np.mean(before)), 5)
        out["loss_after_resume_mean20"] = round(float(np.mean(after)), 5)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--debug", action="store_true",
                   help="debug-size models on CPU (harness self-test)")
    p.add_argument("--phase-a", type=int, default=1200)
    p.add_argument("--phase-b", type=int, default=900)
    p.add_argument("--save-every", type=int, default=50)
    p.add_argument("--shard-dir", default="/tmp/gtax_soak_shards")
    p.add_argument("--n-shards", type=int, default=6)
    p.add_argument("--per-shard", type=int, default=512)
    p.add_argument("--workdir", default="/tmp/gtax_soak")
    p.add_argument("--latent-cache", default="")
    p.add_argument("--out", default="")
    args = p.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    out_dir = os.path.join(args.workdir, "train_out")
    name = "dit_soak_debug" if args.debug else "dit_soak"
    metrics_path = os.path.join(out_dir, f"{name}_metrics.jsonl")
    log_path = os.path.join(args.workdir, "soak.log")
    for pth in (metrics_path, log_path):
        if os.path.exists(pth):
            os.remove(pth)
    ckpt_dir = os.path.join(out_dir, "train_checkpoints", f"{name}_last")
    if os.path.exists(ckpt_dir):
        import shutil

        shutil.rmtree(ckpt_dir)

    print("generating shards...", flush=True)
    make_shards(args.shard_dir, args.n_shards, args.per_shard)
    val_dir = os.path.join(args.shard_dir, "val")
    make_shards(val_dir, 1, 32, seed=99)

    cfg_text = (DEBUG_CFG if args.debug else FLAGSHIP_CFG).format(
        out=out_dir, save_every=args.save_every, name=name)
    cfg_path = os.path.join(args.workdir, "soak.yaml")
    with open(cfg_path, "w") as f:
        f.write(cfg_text)

    cmd = [sys.executable, "-m", "gtax.cli.train", cfg_path,
           "--dataset_root", args.shard_dir,
           "--dataset_size", str(args.n_shards * args.per_shard)]
    if args.latent_cache:
        cmd += ["--latent_cache", args.latent_cache]
    env_note = ""
    if args.debug:
        os.environ["JAX_PLATFORMS"] = "cpu"
        env_note = "cpu-debug"

    print(f"phase A ({args.phase_a}s then SIGKILL): {' '.join(cmd)}",
          flush=True)
    wall_a, rc_a = run_phase(cmd, args.phase_a, kill_hard=True,
                             log_path=log_path)
    recs_a = read_metrics(metrics_path)
    boundary = recs_a[-1]["step"] if recs_a else 0
    step_json = os.path.join(ckpt_dir, "step.json")
    ck = json.load(open(step_json)) if os.path.exists(step_json) else {}
    print(f"phase A: {wall_a:.0f}s, rc={rc_a}, last step {boundary}, "
          f"checkpoint {ck}", flush=True)
    assert ck, "phase A produced no checkpoint — raise --phase-a"

    print(f"phase B (resume, {args.phase_b}s): {' '.join(cmd)}", flush=True)
    wall_b, rc_b = run_phase(cmd, args.phase_b, kill_hard=False,
                             log_path=log_path)
    recs = read_metrics(metrics_path)
    resumed_from = ck.get("step")
    resumed_line = ""
    with open(log_path, errors="replace") as f:
        for line in f:
            if "Resumed from" in line:
                resumed_line = line.strip()[-200:]
    stats = analyze(recs, boundary)
    post = [r for r in recs if r["step"] > boundary]
    result = {
        "mode": ("debug " + env_note).strip() if args.debug else "flagship",
        "config": {"batch_size": 2 if args.debug else 8,
                   "dataset": "webdataset local tar shards (streamed, "
                              "pixel_u8 fast path)",
                   "phase_a_s": round(wall_a), "phase_b_s": round(wall_b),
                   "save_every": args.save_every,
                   "latent_cache": bool(args.latent_cache)},
        "kill_resume": {
            "killed_at_step": boundary,
            "checkpoint_step": resumed_from,
            "data_cursor_in_checkpoint": ck.get("data_cursor"),
            "resume_log_line": resumed_line,
            "steps_after_resume": len(post),
            "first_steps_after_resume": [r["step"] for r in post[:3]],
        },
        **stats,
    }
    print(json.dumps(result, indent=1), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
