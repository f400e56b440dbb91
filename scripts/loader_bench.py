"""Host data-pipeline benchmark: can the loader feed the flagship step?

VERDICT r4 weak #3: the trainer hits 56.5% MFU but nothing proved the host
side can sustain it. The flagship B=8 step is 144.7 ms and consumes
8 clips x 5 frames = 40 frames/step => ~277 imgs/s (~55 clips/s) of JPEG
strip decode + split + resize (the reference pipeline decodes the same
270x2400 strips, /root/reference/web_dataset.py:105-125).

This script:
  1. generates local .tar shards in the HF dataset layout (270x2400 JPEG
     strip + .json actions_int per sample — web_dataset.py:41-57);
  2. times the stages in isolation (tar read, JPEG decode, resize);
  3. times WebTarDataset -> DataLoader end to end, sweeping decode threads,
     and reports clips/s + imgs/s against the flagship requirement.

Usage:
  python scripts/loader_bench.py [--shard-dir /tmp/gtax_shards]
      [--n-shards 4] [--per-shard 256] [--batches 40] [--out docs/...]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import tarfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FLAGSHIP_STEP_S = 0.1447   # measured B=8 accum=1 train step (docs/PERF.md)
FLAGSHIP_CLIPS_PER_STEP = 8
STRIP_H, STRIP_W, N_FRAMES = 270, 2400, 5


def make_shards(dest: str, n_shards: int, per_shard: int, seed: int = 0):
    """Local tar shards shaped like the HF dataset: each sample is a JPEG
    strip of 5 frames + a .json with actions_int. Content is band-limited
    noise + gradients so JPEG entropy (and decode cost) is realistic —
    constant-color frames would compress to nothing and decode far faster
    than GTA footage."""
    from PIL import Image

    os.makedirs(dest, exist_ok=True)
    rng = np.random.default_rng(seed)
    paths = []
    base = rng.integers(
        0, 255, (-(-STRIP_H // 8), -(-STRIP_W // 8), 3), np.uint8)
    base = np.kron(base, np.ones((8, 8, 1), np.uint8))[:STRIP_H, :STRIP_W]
    for s in range(n_shards):
        path = os.path.join(dest, f"{s:05d}.tar")
        paths.append(path)
        if os.path.exists(path):
            continue
        tmp = path + ".tmp"
        with tarfile.open(tmp, "w") as tar:
            for i in range(per_shard):
                noise = rng.integers(0, 64, (STRIP_H, STRIP_W, 3), np.uint8)
                strip = (base.astype(np.int16) + noise - 32).clip(0, 255)
                buf = io.BytesIO()
                Image.fromarray(strip.astype(np.uint8)).save(
                    buf, format="JPEG", quality=85)
                key = f"{s:05d}_{i:06d}"
                ti = tarfile.TarInfo(f"{key}.jpg")
                ti.size = buf.getbuffer().nbytes
                buf.seek(0)
                tar.addfile(ti, buf)
                meta = json.dumps(
                    {"actions_int": rng.integers(0, 25, 5).tolist()}
                ).encode()
                tj = tarfile.TarInfo(f"{key}.json")
                tj.size = len(meta)
                tar.addfile(tj, io.BytesIO(meta))
        os.replace(tmp, path)
    return paths


def bench_stages(shard: str, n: int = 64):
    """Per-stage times over n samples of one shard (single thread)."""
    from PIL import Image

    from gtax.data.common import ClipTransform
    from gtax.data.webtar import iter_tar_samples

    raws = []
    t0 = time.perf_counter()
    with open(shard, "rb") as f:
        for raw in iter_tar_samples(f):
            raws.append(raw)
            if len(raws) >= n:
                break
    t_tar = (time.perf_counter() - t0) / len(raws)

    t0 = time.perf_counter()
    imgs = [
        np.asarray(Image.open(io.BytesIO(r["jpg"])).convert("RGB"))
        for r in raws
    ]
    t_dec = (time.perf_counter() - t0) / len(raws)

    tf = ClipTransform()
    t0 = time.perf_counter()
    for img in imgs:
        tf(img)
    t_tx = (time.perf_counter() - t0) / len(raws)
    return {"tar_read_ms": round(t_tar * 1e3, 2),
            "jpeg_decode_ms": round(t_dec * 1e3, 2),
            "split_resize_ms": round(t_tx * 1e3, 2),
            "serial_total_ms": round((t_tar + t_dec + t_tx) * 1e3, 2)}


def bench_loader(shards, batch_size: int, n_batches: int,
                 decode_workers: int):
    from gtax.data.loader import DataLoader
    from gtax.data.webtar import WebTarDataset

    ds = WebTarDataset(
        split="train", return_actions=True, shards=shards,
        shuffle_buffer=100, resampled=True, size=10**6,
        decode_workers=decode_workers,
    )
    dl = DataLoader(ds, batch_size=batch_size, num_workers=1, prefetch=4)
    it = iter(dl)
    for _ in range(4):  # warm the shuffle buffer + thread pool
        next(it)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        b = next(it)
    dt = time.perf_counter() - t0
    clips_s = n_batches * batch_size / dt
    return {"decode_workers": decode_workers,
            "clips_per_s": round(clips_s, 1),
            "imgs_per_s": round(clips_s * N_FRAMES, 1),
            "batches_per_s": round(n_batches / dt, 2),
            "batch_ms": round(dt / n_batches * 1e3, 1)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shard-dir", default="/tmp/gtax_shards")
    p.add_argument("--n-shards", type=int, default=4)
    p.add_argument("--per-shard", type=int, default=256)
    p.add_argument("--batches", type=int, default=40)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--workers", default="0,2,4,8,16")
    p.add_argument("--out", default="")
    args = p.parse_args()

    print("generating shards...", flush=True)
    shards = make_shards(args.shard_dir, args.n_shards, args.per_shard)
    sz = sum(os.path.getsize(s) for s in shards) / 1e6
    print(f"{len(shards)} shards, {sz:.0f} MB total", flush=True)

    stages = bench_stages(shards[0])
    print("per-sample stage times (1 thread):", stages, flush=True)

    need = FLAGSHIP_CLIPS_PER_STEP / FLAGSHIP_STEP_S
    sweep = []
    for w in (int(x) for x in args.workers.split(",")):
        r = bench_loader(shards, args.batch_size, args.batches, w)
        r["vs_flagship_need"] = round(r["clips_per_s"] / need, 2)
        sweep.append(r)
        print(r, flush=True)

    result = {
        "flagship_need_clips_per_s": round(need, 1),
        "flagship_need_imgs_per_s": round(need * N_FRAMES, 1),
        "flagship_step_ms": FLAGSHIP_STEP_S * 1e3,
        "stage_times_1thread": stages,
        "sweep": sweep,
        "note": ("local tar shards, realistic-entropy JPEG strips; "
                 "decode_workers parallelises the PIL decode+resize stage "
                 "inside WebTarDataset (order-preserving, cursor-exact)"),
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
