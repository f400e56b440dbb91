"""Measure the tunneled chip's host<->device transfer rates.

The train-soak step time (docs/train_e2e.json) includes a per-step
host->device put of the (8, 5, 360, 640, 3) uint8 pixel batch (27.6 MB) and
a metrics fetch; on a directly-attached TPU-VM host both are PCIe-class.
This probe measures what they cost through the development tunnel, so the
soak numbers can be decomposed into device time vs tunnel artifacts.

Usage: python scripts/tunnel_probe.py [--mb 27.6] [--iters 5]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    out = {"device": jax.devices()[0].device_kind}

    # IMPORTANT: block_until_ready returns without waiting through the
    # tunnel (docs/PERF.md), so every timing below forces the transfer with
    # a DEPENDENT device computation + scalar fetch. The reported rate
    # therefore includes one ~25 ms round trip — subtract the smallest
    # payload's time for pure bandwidth.
    s = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    for name, arr in (
        ("h2d_27mb_u8_batch",  # the soak's per-step pixel batch
         np.random.randint(0, 255, (8, 5, 360, 640, 3), np.uint8)),
        ("h2d_2mb_latents",    # the latent-cache per-step batch
         np.random.randn(8, 5, 16, 18, 32).astype(np.float32)),
        ("h2d_small",          # round-trip floor
         np.random.randn(100, 75).astype(np.float32)),
    ):
        float(s(jax.device_put(arr)))  # compile + warm
        ts = []
        for _ in range(args.iters):
            fresh = arr.copy()  # defeat buffer caching
            t0 = time.perf_counter()
            float(s(jax.device_put(fresh)))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        out[name] = {"ms": round(1e3 * med, 1),
                     "payload_mb": round(arr.nbytes / 1e6, 2),
                     "MBps": round(arr.nbytes / 1e6 / med, 1)}

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
