"""Per-frame PSNR parity gate between a gtax generation and a reference
(torch) generation of the same seed/config (BASELINE.md correctness gate).

Usage:
  python scripts/parity_gate.py ours.mp4 reference.mp4 [--min-psnr 25]

With the shipped pretrained checkpoints and identical noise draws, per-frame
PSNR quantifies sampler/model parity; without identical RNG the comparison is
only indicative (diffusion sampling is chaotic in its noise input).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gtax.utils.platform import honor_env_platform

honor_env_platform()  # an explicit JAX_PLATFORMS=cpu must win over axon

import argparse
import json
import sys

from gtax.io.video import read_video
from gtax.utils.metrics import per_frame_psnr


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("ours")
    p.add_argument("reference")
    p.add_argument("--min-psnr", type=float, default=25.0)
    args = p.parse_args(argv)

    a = read_video(args.ours)
    b = read_video(args.reference)
    n = min(len(a), len(b))
    if n == 0:
        print("ERROR: empty video(s)")
        return 2
    scores = per_frame_psnr(a[:n], b[:n])
    result = {
        "frames": n,
        "psnr_per_frame": [round(s, 2) for s in scores],
        "psnr_min": round(min(scores), 2),
        "psnr_mean": round(sum(scores) / n, 2),
        "pass": min(scores) >= args.min_psnr,
    }
    print(json.dumps(result))
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
