"""Download the reference's shipped artifacts from the HuggingFace hub.

Checkpoints (HF `Iker/AI-Generated-GTA-V`, reference README.md:71-105):
    dit.safetensors, dit_action.safetensors, vit-l-20.safetensors
Optionally dataset shards (HF `Iker/GTAV-Driving-Dataset`) for local
training via `--dataset_root` / the tar streamer.

Usage:
  python scripts/fetch_artifacts.py [--dest checkpoints]
      [--dataset-shards N]   # also fetch the first N train tar shards
      [--splits dev]         # and the dev (validation) shards

Requires network + (for the dataset) an HF token (`huggingface-cli login`).
The build environment this framework was developed in is offline
(BASELINE.md) — this script is for real deployments.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gtax.utils.platform import honor_env_platform

honor_env_platform()  # an explicit JAX_PLATFORMS=cpu must win over axon

CKPT_REPO = "Iker/AI-Generated-GTA-V"
DATA_REPO = "Iker/GTAV-Driving-Dataset"
CHECKPOINTS = ["dit.safetensors", "dit_action.safetensors",
               "vit-l-20.safetensors"]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dest", default="checkpoints")
    p.add_argument("--dataset-shards", type=int, default=0,
                   help="also fetch the first N train tar shards")
    p.add_argument("--dataset-dest", default="data")
    p.add_argument("--splits", nargs="*", default=[],
                   help="extra dataset splits to fetch whole (e.g. dev)")
    args = p.parse_args(argv)

    from huggingface_hub import hf_hub_download, list_repo_files

    os.makedirs(args.dest, exist_ok=True)
    for name in CHECKPOINTS:
        path = hf_hub_download(CKPT_REPO, name, local_dir=args.dest)
        print(f"fetched {path}")

    if args.dataset_shards or args.splits:
        files = list_repo_files(DATA_REPO, repo_type="dataset")
        train = sorted(f for f in files
                       if "/train/" in f and f.endswith(".tar"))
        wanted = train[: args.dataset_shards]
        for split in args.splits:
            wanted += sorted(f for f in files
                             if f.startswith(f"{split}/")
                             and f.endswith(".tar"))
        for f in wanted:
            path = hf_hub_download(DATA_REPO, f, repo_type="dataset",
                                   local_dir=args.dataset_dest)
            print(f"fetched {path}")
        print(f"{len(wanted)} shards under {args.dataset_dest}; train with "
              f"--dataset_root {args.dataset_dest}")


if __name__ == "__main__":
    main()
